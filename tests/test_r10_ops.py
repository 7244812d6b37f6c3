"""Round-10 fixes: the blocked_pairs hot-block guard (r9 verdict weak #1),
the four r9 ADVICE findings (evalmetrics __all__, fleiss_kappa empty input,
conformal null residuals, cooccurrence_recs hub-pruned frequencies)."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- blocked_pairs


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, blk string, name string")


def test_blocked_pairs_normal_blocks_unchanged(spark):
    from stackstac_spark.operators.linkage import blocked_pairs

    df = _names(
        spark,
        [(1, "a", "x"), (2, "a", "y"), (3, "a", "z"), (4, "b", "p"), (5, "b", "q")],
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in blocked_pairs(df, ["blk"], "id", ["name"]).collect()
    )
    assert got == [(1, 2), (1, 3), (2, 3), (4, 5)]


def test_blocked_pairs_hot_block_fails_fast(spark):
    from stackstac_spark.operators.linkage import blocked_pairs

    # adversarial one-hot-block fixture: every row lands in block "hot"
    df = _names(spark, [(i, "hot", f"n{i}") for i in range(30)])
    with pytest.raises(ValueError, match="max_block"):
        blocked_pairs(df, ["blk"], "id", ["name"], max_block=10)
    # raising the bound (or disabling) restores the exact all-pairs plan
    n = blocked_pairs(df, ["blk"], "id", ["name"], max_block=None).count()
    assert n == 30 * 29 // 2
    n2 = blocked_pairs(df, ["blk"], "id", ["name"], max_block=1000).count()
    assert n2 == n


def test_blocked_pairs_auto_subblock_caps_hot_block(spark):
    from stackstac_spark.operators.linkage import blocked_pairs

    # one hot block (60 rows) + one normal block (4 rows)
    rows = [(i, "hot", f"n{i:03d}") for i in range(60)] + [
        (100 + i, "cold", f"c{i}") for i in range(4)
    ]
    df = _names(spark, rows)
    w = 5
    out = blocked_pairs(
        df, ["blk"], "id", ["name"], max_block=10, auto_subblock=w
    ).collect()
    cold = [(r["id_a"], r["id_b"]) for r in out if r["blk"] == "cold"]
    hot = [r for r in out if r["blk"] == "hot"]
    # cold block keeps exact all-pairs semantics
    assert sorted(cold) == [
        (a, b) for a in range(100, 104) for b in range(a + 1, 104)
    ]
    # hot block: exactly the sorted-neighborhood pairs — names sort as ids,
    # so the windowed pairs are |i-j| < w, each emitted once, id_a < id_b
    expect = {(i, j) for i in range(60) for j in range(i + 1, min(i + w, 60))}
    got = {(r["id_a"], r["id_b"]) for r in hot}
    assert got == expect
    # the quadratic count never materializes: n*(w-1) - sum bound
    assert len(hot) == len(expect) < 60 * 59 // 2
    # payloads stay aligned with their ids after re-orientation
    for r in hot:
        assert r["name_a"] == f"n{r['id_a']:03d}"
        assert r["name_b"] == f"n{r['id_b']:03d}"


def test_edit_distance_pairs_guard_passthrough(spark):
    from stackstac_spark.operators.linkage import edit_distance_pairs

    df = _names(spark, [(i, "hot", f"n{i}") for i in range(25)])
    with pytest.raises(ValueError, match="max_block"):
        edit_distance_pairs(df, "name", ["blk"], "id", max_block=5)
    # auto_subblock path still scores pairs (distinct-pair scoring intact)
    out = edit_distance_pairs(
        df, "name", ["blk"], "id", max_block=5, auto_subblock=4
    )
    assert out.count() > 0
    assert {"id_a", "id_b", "distance"} <= set(out.columns)


def test_jaro_winkler_pairs_guard_passthrough(spark):
    from stackstac_spark.operators.linkage import jaro_winkler_pairs

    df = _names(spark, [(i, "hot", f"name{i}") for i in range(25)])
    with pytest.raises(ValueError, match="max_block"):
        jaro_winkler_pairs(df, "name", ["blk"], "id", max_block=5)


# ---------------------------------------------------------------- evalmetrics


def test_evalmetrics_all_exports():
    import stackstac_spark.operators.evalmetrics as m

    assert m.__all__ == ["roc_auc", "ndcg_at_k", "wilson_rank", "fleiss_kappa"]
    for name in m.__all__:
        assert hasattr(m, name), name


def test_fleiss_kappa_empty_input_raises(spark):
    from stackstac_spark.operators.evalmetrics import fleiss_kappa

    empty = spark.createDataFrame([], "item long, category string")
    with pytest.raises(ValueError, match="non-empty"):
        fleiss_kappa(empty, "item", "category")


# ---------------------------------------------------------------- conformal


def test_conformal_null_rows_excluded(spark):
    from stackstac_spark.operators.mlfit import conformal_interval

    clean = spark.createDataFrame(
        [(float(i), float(i) + (1.0 if i % 2 else -1.0)) for i in range(20)],
        "y double, yhat double",
    )
    test = spark.createDataFrame([(5.0,)], "yhat double")
    base = conformal_interval(clean, test, alpha=0.2).first()
    # nulls in y or yhat must not occupy order-statistic slots nor count
    # toward n_cal — with the old code they sorted FIRST and shrank qhat
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, 1.0), (1.0, None), (None, None)] * 4, "y double, yhat double"
        )
    )
    got = conformal_interval(dirty, test, alpha=0.2).first()
    assert got["qhat"] == base["qhat"]
    assert got["pi_lo"] == base["pi_lo"] and got["pi_hi"] == base["pi_hi"]


def test_conformal_all_null_raises(spark):
    from stackstac_spark.operators.mlfit import conformal_interval

    cal = spark.createDataFrame([(None, 1.0)], "y double, yhat double")
    test = spark.createDataFrame([(5.0,)], "yhat double")
    with pytest.raises(ValueError, match="non-null"):
        conformal_interval(cal, test)


# ---------------------------------------------------------------- cooccurrence


def test_cooccurrence_freq_uses_pruned_incidence(spark):
    from stackstac_spark.operators.graph import cooccurrence_recs

    # basket H is a hub (4 items > max_basket_size=3) and must contribute
    # to NEITHER co-counts NOR frequencies; baskets b1/b2 carry the signal
    rows = (
        [("H", i) for i in [1, 2, 3, 4]]
        + [("b1", 1), ("b1", 2)]
        + [("b2", 1), ("b2", 2)]
    )
    df = spark.createDataFrame(rows, "basket string, item long")
    out = cooccurrence_recs(
        df, basket_col="basket", item_col="item", k=5, max_basket_size=3
    ).collect()
    by_pair = {(r["item"], r["rec_item"]): r for r in out}
    # items 3,4 exist only in the dropped hub basket -> no recs at all
    assert all(k[0] in (1, 2) and k[1] in (1, 2) for k in by_pair)
    r = by_pair[(1, 2)]
    # freq over PRUNED incidence: item1 in {b1,b2} -> 2 (not 3 with hub);
    # weight 2 shared baskets -> cosine 2/sqrt(2*2) = 1.0 exactly
    assert r["weight"] == 2
    assert r["score"] == 1.0


def test_fleiss_kappa_single_category_null_not_error(spark):
    """Universal agreement on ONE category: p_e = 1 and kappa is the
    undefined 0/0 — must emit NULL, not an ANSI divide-by-zero."""
    from stackstac_spark.operators.evalmetrics import fleiss_kappa

    labels = spark.createDataFrame(
        [(i, "yes") for i in range(4) for _ in range(3)], "item long, category string"
    )
    row = fleiss_kappa(labels, "item", "category").first()
    assert row["p_e"] == 1.0 and row["p_bar"] == 1.0
    assert row["kappa"] is None
