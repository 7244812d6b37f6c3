"""Known-value tests for the r12 fourth sub-wave: t-closeness (privacy.py),
winsorized mean (sketch.py), Simpson's-paradox screen (drift.py), RRF rank
fusion (similarity.py)."""

import pytest
from pyspark.sql import functions as F


def test_t_closeness_known(spark):
    from stackstac_spark.operators.privacy import t_closeness_report

    rows = (
        [("q1", "x")] * 6 + [("q1", "y")] * 2
        + [("q2", "x")] * 2 + [("q2", "y")] * 6
    )
    df = spark.createDataFrame(rows, "qi string, s string")
    # global: x 0.5, y 0.5; q1: (0.75, 0.25) -> TV = 0.25 (symmetric for q2)
    got = {r["qi"]: r for r in t_closeness_report(df, ["qi"], "s", t=0.2).collect()}
    assert got["q1"]["distance"] == pytest.approx(0.25, abs=1e-6)
    assert got["q1"]["above_t"] is True and got["q1"]["class_size"] == 8
    assert got["q2"]["distance"] == pytest.approx(0.25, abs=1e-6)
    # a class missing a category entirely: absent mass folds in closed form
    rows2 = rows + [("q3", "x")] * 4
    got2 = {
        r["qi"]: r
        for r in t_closeness_report(
            spark.createDataFrame(rows2, "qi string, s string"), ["qi"], "s"
        ).collect()
    }
    # global x 0.6 / y 0.4; q3 all-x -> (|1-0.6| + |0-0.4|)/2 = 0.4
    assert got2["q3"]["distance"] == pytest.approx(0.4, abs=1e-6)
    # uniform class matches global -> 0; null sensitive excluded
    mono = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("b", None)],
        "qi string, s string",
    )
    g3 = {r["qi"]: r for r in t_closeness_report(mono, ["qi"], "s").collect()}
    assert g3["a"]["distance"] == 0.0 and g3["b"]["distance"] == 0.0
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_report(df, ["qi"], "s", t=1.5)


def test_winsorized_mean_known(spark):
    from stackstac_spark.operators.sketch import winsorized_mean

    V = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    k = 1
    sv = sorted(V)
    wv = [sv[k]] * k + sv[k:-k] + [sv[-k - 1]] * k
    df = spark.createDataFrame([(v,) for v in V], "x double")
    r = winsorized_mean(df, "x", trim=0.1).first()
    assert r["winsorized_mean"] == pytest.approx(sum(wv) / len(wv), abs=1e-6)
    assert (r["n"], r["n_clamped"]) == (10, 2)
    # trim = 0 -> the plain mean
    assert winsorized_mean(df, "x", trim=0.0).first()[
        "winsorized_mean"
    ] == pytest.approx(sum(V) / len(V), abs=1e-6)
    # duplicates straddling the clamp boundary
    V2 = [1.0, 1.0, 1.0, 5.0, 5.0, 9.0, 9.0, 9.0]
    k2 = 2
    sv2 = sorted(V2)
    wv2 = [sv2[k2]] * k2 + sv2[k2:-k2] + [sv2[-k2 - 1]] * k2
    r2 = winsorized_mean(
        spark.createDataFrame([(v,) for v in V2], "x double"), "x", trim=0.25
    ).first()
    assert r2["winsorized_mean"] == pytest.approx(sum(wv2) / len(wv2), abs=1e-6)
    # grouped; guard; bad trim
    grp = spark.createDataFrame(
        [("g", v) for v in V] + [("h", 1.0), ("h", 2.0)], "g string, x double"
    )
    got = {r["g"]: r for r in winsorized_mean(grp, "x", ["g"], trim=0.1).collect()}
    assert got["g"]["winsorized_mean"] == pytest.approx(sum(wv) / len(wv), abs=1e-6)
    assert got["h"]["n_clamped"] == 0  # k = floor(2*0.1) = 0
    with pytest.raises(ValueError, match="trim"):
        winsorized_mean(df, "x", trim=0.5)


def test_simpson_check_reversal(spark):
    from stackstac_spark.operators.drift import simpson_check

    rows = []
    # easy stratum: A 9/10, B 80/100 — A better (+0.1)
    rows += [("S1", "A", 1.0)] * 9 + [("S1", "A", 0.0)] * 1
    rows += [("S1", "B", 1.0)] * 80 + [("S1", "B", 0.0)] * 20
    # hard stratum: A 30/100, B 2/10 — A better (+0.1)
    rows += [("S2", "A", 1.0)] * 30 + [("S2", "A", 0.0)] * 70
    rows += [("S2", "B", 1.0)] * 2 + [("S2", "B", 0.0)] * 8
    df = spark.createDataFrame(rows, "st string, side string, y double")
    r = simpson_check(df, "y", "side", "A", "B", "st").first()
    # pooled: A 39/110 vs B 82/110 — B looks better; every stratum says A
    pooled = 39 / 110 - 82 / 110
    d1, w1 = 0.9 - 0.8, 110
    d2, w2 = 0.3 - 0.2, 110
    strat = (d1 * w1 + d2 * w2) / (w1 + w2)
    assert r["pooled_diff"] == pytest.approx(pooled, abs=1e-6)
    assert r["strata_diff"] == pytest.approx(strat, abs=1e-6)
    assert r["reversed"] is True
    assert r["n_flipped"] == 2  # both strata oppose the pooled sign
    # no-paradox case
    flat = spark.createDataFrame(
        [("S1", "A", 1.0), ("S1", "A", 0.0), ("S1", "B", 0.0), ("S1", "B", 0.0)],
        "st string, side string, y double",
    )
    assert simpson_check(flat, "y", "side", "A", "B", "st").first()["reversed"] is False
    # a stratum with only one side joins n but not strata_diff
    extra = df.unionByName(
        spark.createDataFrame([("S3", "A", 1.0)], "st string, side string, y double")
    )
    r2 = simpson_check(extra, "y", "side", "A", "B", "st").first()
    assert r2["n"] == 221 and r2["n_strata"] == 3
    assert r2["strata_diff"] == pytest.approx(strat, abs=1e-6)


def test_rrf_fuse_known(spark):
    from stackstac_spark.operators.similarity import rrf_fuse

    run1 = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0), ("q", "c", 1.0)],
        "query_id string, doc_id string, score double",
    )
    run2 = spark.createDataFrame(
        [("q", "b", 9.0), ("q", "c", 8.0), ("q", "d", 7.0)],
        "query_id string, doc_id string, score double",
    )
    out = {r["doc_id"]: r for r in rrf_fuse([run1, run2], k=60, top_n=4).collect()}
    assert out["b"]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert out["b"]["fused_rank"] == 1 and out["b"]["n_runs"] == 2
    assert out["c"]["rrf_score"] == pytest.approx(1 / 63 + 1 / 62, abs=1e-6)
    assert out["c"]["fused_rank"] == 2
    # single-run docs fuse with one term; deterministic rank for a vs d
    assert out["a"]["n_runs"] == 1 and out["a"]["fused_rank"] == 3
    assert out["d"]["fused_rank"] == 4
    # top_n truncation
    assert rrf_fuse([run1, run2], top_n=2).count() == 2
    # NaN score rows excluded from that run's ranking
    dirty = run1.unionByName(
        spark.createDataFrame(
            [("q", "z", float("nan"))], "query_id string, doc_id string, score double"
        )
    )
    out2 = {r["doc_id"]: r for r in rrf_fuse([dirty], top_n=10).collect()}
    assert "z" not in out2 and out2["a"]["fused_rank"] == 1
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
