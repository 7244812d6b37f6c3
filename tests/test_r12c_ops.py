"""Known-value tests for the r12 third sub-wave: MRR, top-k retrieval eval
(evalmetrics.py); quantile matching, dataset cartography (mlfit.py)."""

import pytest
from pyspark.sql import functions as F


def test_mrr_known(spark):
    from stackstac_spark.operators.evalmetrics import mrr

    rows = [
        ("q1", 5.0, 0), ("q1", 4.0, 1), ("q1", 3.0, 1),
        ("q2", 9.0, 1), ("q2", 8.0, 0),
        ("q3", 2.0, 0), ("q3", 1.0, 0),
    ]
    df = spark.createDataFrame(rows, "q string, s double, y int")
    r = mrr(df, "q", "s", "y").first()
    # q1 first relevant at rank 2, q2 at rank 1, q3 none -> (1/2 + 1 + 0)/3
    assert r["n_queries"] == 3
    assert r["mrr"] == pytest.approx((0.5 + 1.0 + 0.0) / 3, abs=1e-6)
    # k-truncation drops q1's rank-2 hit
    assert mrr(df, "q", "s", "y", k=1).first()["mrr"] == pytest.approx(
        1 / 3, abs=1e-6
    )
    with pytest.raises(ValueError, match="k must be"):
        mrr(df, "q", "s", "y", k=0)
    # NaN scores excluded (would otherwise rank first)
    dirty = df.unionByName(
        spark.createDataFrame([("q3", float("nan"), 1)], "q string, s double, y int")
    )
    assert mrr(dirty, "q", "s", "y").first()["mrr"] == pytest.approx(
        0.5, abs=1e-6
    )


def test_topk_eval_known(spark):
    from stackstac_spark.operators.evalmetrics import topk_eval

    rows = [
        ("q1", 5.0, 0), ("q1", 4.0, 1), ("q1", 3.0, 1),
        ("q2", 9.0, 1), ("q2", 8.0, 0),
        ("q3", 2.0, 0), ("q3", 1.0, 0),
    ]
    df = spark.createDataFrame(rows, "q string, s double, y int")
    t = topk_eval(df, "q", "s", "y", k=2).first()
    # q1: top2 hits 1 of 2 rel; q2: hits 1, rel 1; q3: hits 0, rel 0
    assert t["n_queries"] == 3
    assert t["p_at_k"] == pytest.approx((0.5 + 0.5 + 0.0) / 3, abs=1e-6)
    # zero-relevant queries excluded from recall's average (trec_eval)
    assert t["r_at_k"] == pytest.approx((0.5 + 1.0) / 2, abs=1e-6)
    assert t["hit_rate"] == pytest.approx(2 / 3, abs=1e-6)
    # k larger than any candidate list: P@k uses actual candidates
    t2 = topk_eval(df, "q", "s", "y", k=100).first()
    assert t2["p_at_k"] == pytest.approx((2 / 3 + 1 / 2 + 0.0) / 3, abs=1e-6)
    assert t2["r_at_k"] == pytest.approx(1.0, abs=1e-6)


def test_quantile_match_known(spark):
    from stackstac_spark.operators.mlfit import quantile_match

    ref = [float(x) for x in range(1, 11)]
    grp = [100.0, 200.0, 200.0, 300.0]
    df = spark.createDataFrame(
        [("ref", x) for x in ref] + [("g", x) for x in grp], "g string, x double"
    )
    out = {r["x"]: r for r in quantile_match(df, "x", "g", "ref").collect()}
    # p(100)=0.25 -> smallest ref value with cdf >= 0.25 is 3 (cdf 0.3);
    # p(200)=0.75 -> 8 (0.8); p(300)=1.0 -> 10 (exact boundary step taken)
    assert {k: v["x_matched"] for k, v in out.items()} == {
        100.0: 3.0,
        200.0: 8.0,
        300.0: 10.0,
    }
    assert out[200.0]["n"] == 2
    # identical distribution maps to itself (fixed point)
    same = spark.createDataFrame(
        [("ref", x) for x in ref] + [("g", x) for x in ref], "g string, x double"
    )
    fixed = quantile_match(same, "x", "g", "ref").collect()
    assert all(r["x"] == r["x_matched"] for r in fixed)
    # guard
    import pyspark.sql.functions as F

    big = spark.range(0, 3000).select(
        F.when(F.col("id") % 2 == 0, "ref").otherwise("g").alias("g"),
        F.rand(5).alias("x"),
    )
    with pytest.raises(ValueError, match="max_distinct"):
        quantile_match(big, "x", "g", "ref", max_distinct=100)


def test_dataset_cartography_known(spark):
    from stackstac_spark.operators.mlfit import dataset_cartography

    rows = []
    for i, ps in enumerate([[0.9, 0.9, 0.8], [0.1, 0.2, 0.1], [0.2, 0.9, 0.5]]):
        for ep, p in enumerate(ps):
            rows.append((f"e{i}", ep, p))
    df = spark.createDataFrame(rows, "ex string, ep int, p double")
    got = {r["region"]: r for r in dataset_cartography(df, "ex", "ep", "p").collect()}
    assert {k: v["n_examples"] for k, v in got.items()} == {
        "easy_to_learn": 1,
        "hard_to_learn": 1,
        "ambiguous": 1,
    }
    assert got["easy_to_learn"]["avg_confidence"] == pytest.approx(
        sum([0.9, 0.9, 0.8]) / 3, abs=1e-6
    )
    # population std of the ambiguous example
    import math

    ps = [0.2, 0.9, 0.5]
    m = sum(ps) / 3
    want = math.sqrt(sum((x - m) ** 2 for x in ps) / 3)
    assert got["ambiguous"]["avg_variability"] == pytest.approx(want, abs=1e-6)
    # null/NaN probs excluded
    dirty = df.unionByName(
        spark.createDataFrame([("e0", 9, float("nan"))], "ex string, ep int, p double")
    )
    got2 = {r["region"]: r for r in dataset_cartography(dirty, "ex", "ep", "p").collect()}
    assert got2["easy_to_learn"]["avg_confidence"] == got["easy_to_learn"]["avg_confidence"]
