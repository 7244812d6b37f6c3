"""Known-value tests for the r11 second sub-wave: l_diversity_report,
rbo_overlap, theil_index, bh_fdr, association_rules."""

import math

import pytest
from pyspark.sql import functions as F


def test_l_diversity_known(spark):
    from stackstac_spark.operators.privacy import l_diversity_report

    rows = (
        # class (a,1): 3 records, sensitive {x, y} -> l=2
        [("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y")]
        # class (b,2): 2 records, sensitive {z} -> l=1 (below l=2)
        + [("b", 2, "z"), ("b", 2, "z")]
        # null sensitive excluded entirely
        + [("c", 3, None)]
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    got = {r["l_distinct"]: r for r in l_diversity_report(df, ["q1", "q2"], "s").collect()}
    assert got[1]["n_classes"] == 1 and got[1]["n_records"] == 2 and got[1]["below_l"] is True
    assert got[2]["n_classes"] == 1 and got[2]["n_records"] == 3 and got[2]["below_l"] is False
    assert set(got) == {1, 2}
    with pytest.raises(ValueError):
        l_diversity_report(df, ["q1"], "s", l=0)


def test_rbo_known_values(spark):
    from stackstac_spark.operators.evalmetrics import rbo_overlap

    d, p = 3, 0.9
    # identical rankings -> RBO@d = (1-p)·Σ p^(k-1) truncated (overlap k/k)
    run = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0), ("q", "c", 1.0)],
        "query_id string, doc_id string, score double",
    )
    r = rbo_overlap(run, run, depth=d, p=p).first()
    want = (1 - p) * sum(p ** (k - 1) for k in range(1, d + 1))
    assert r["n_common"] == 3
    assert r["rbo"] == pytest.approx(want, abs=2e-6)
    # disjoint rankings -> RBO is DEFINED as 0 (r11 ADVICE): the query
    # still emits one row with n_common=0, rbo=0.0
    other = spark.createDataFrame(
        [("q", "x", 3.0), ("q", "y", 2.0), ("q", "z", 1.0)],
        "query_id string, doc_id string, score double",
    )
    disjoint = rbo_overlap(run, other, depth=d, p=p).collect()
    assert len(disjoint) == 1
    assert disjoint[0]["n_common"] == 0 and disjoint[0]["rbo"] == 0.0
    # a query present only in run_b also emits (union of query sets)
    extra = other.unionByName(
        spark.createDataFrame(
            [("q2", "a", 1.0)], "query_id string, doc_id string, score double"
        )
    )
    got = {r["query_id"]: r for r in rbo_overlap(run, extra, depth=d, p=p).collect()}
    assert set(got) == {"q", "q2"}
    assert got["q2"]["n_common"] == 0 and got["q2"]["rbo"] == 0.0
    # hand-computed partial overlap: A=[a,b,c], B=[b,a,z]
    runb = spark.createDataFrame(
        [("q", "b", 3.0), ("q", "a", 2.0), ("q", "z", 1.0)],
        "query_id string, doc_id string, score double",
    )
    r = rbo_overlap(run, runb, depth=d, p=p).first()
    # overlaps: k=1: 0, k=2: {a,b} = 2, k=3: {a,b} = 2
    want = (1 - p) * (0 / 1 + p * 2 / 2 + p * p * 2 / 3)
    assert r["rbo"] == pytest.approx(want, abs=2e-6)
    # NaN scores excluded from the prefix
    dirty = run.unionByName(
        spark.createDataFrame(
            [("q", "w", float("nan"))], "query_id string, doc_id string, score double"
        )
    )
    assert rbo_overlap(dirty, run, depth=d, p=p).first()["rbo"] == pytest.approx(
        (1 - p) * sum(p ** (k - 1) for k in range(1, d + 1)), abs=2e-6
    )


def test_theil_known(spark):
    from stackstac_spark.operators.sampling import theil_index

    # equal values -> T = 0
    eq = spark.createDataFrame([("g", 5.0)] * 8, "g string, x double")
    assert theil_index(eq, "x", ["g"]).first()["theil"] == 0.0
    # hand-computed two-value case + dirty rows excluded
    vals = [1.0, 3.0]
    mu = sum(vals) / 2
    want = sum((x / mu) * math.log(x / mu) for x in vals) / 2
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 3.0), ("g", None), ("g", float("nan")), ("g", -2.0), ("g", 0.0)],
        "g string, x double",
    )
    r = theil_index(df, "x", ["g"]).first()
    assert r["n"] == 2
    assert r["theil"] == pytest.approx(want, abs=2e-6)


def test_bh_fdr_step_up(spark):
    from stackstac_spark.operators.drift import bh_fdr

    # classic example: m=5, alpha=0.25; p = .01 .02 .03 .20 .90
    # thresholds k*alpha/m = .05 .10 .15 .20 .25 -> largest k with
    # p<=thr is k=4 -> reject first FOUR (including p=.20) even though
    # p_3=.03 < p_4's threshold gap (step-up, not step-down)
    df = spark.createDataFrame(
        [("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.20), ("t5", 0.90)],
        "test string, p double",
    )
    rows = {r["test"]: r for r in bh_fdr(df, "p", alpha=0.25).collect()}
    assert [rows[f"t{i}"]["rejected"] for i in range(1, 6)] == [True, True, True, True, False]
    # adjusted p: p_adj(i) = min_{j>=i} m*p_j/j, clamped
    m = 5
    ps = [0.01, 0.02, 0.03, 0.20, 0.90]
    adj = [min(min(m * ps[j] / (j + 1) for j in range(i, m)), 1.0) for i in range(m)]
    for i in range(1, 6):
        assert rows[f"t{i}"]["p_adj"] == pytest.approx(adj[i - 1], abs=2e-6)
    # null p rows dropped (not ranked, not counted in m)
    dirty = df.unionByName(spark.createDataFrame([("tn", None)], "test string, p double"))
    assert bh_fdr(dirty, "p", alpha=0.25).count() == 5


def test_association_rules_known(spark):
    from stackstac_spark.operators.graph import association_rules

    # baskets: {1:(a,b), 2:(a,b), 3:(a,c), 4:(b,)} -> n_baskets=4
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "b"),
            (2, "a")]  # duplicate incidence deduped
    df = spark.createDataFrame(rows, "b int, i string")
    got = {(r["antecedent"], r["consequent"]): r
           for r in association_rules(df, "b", "i", min_support=2).collect()}
    ab = got[("a", "b")]
    assert ab["n_both"] == 2 and ab["n_ant"] == 3 and ab["n_cons"] == 3
    assert ab["support"] == pytest.approx(0.5)
    assert ab["confidence"] == pytest.approx(2 / 3, abs=2e-6)
    assert ab["lift"] == pytest.approx((2 / 3) / (3 / 4), abs=2e-6)
    # reverse orientation present with its own confidence
    ba = got[("b", "a")]
    assert ba["confidence"] == pytest.approx(2 / 3, abs=2e-6)
    # (a,c) co-support 1 < min_support -> absent
    assert ("a", "c") not in got and ("c", "a") not in got
    # hub guard
    with pytest.raises(ValueError, match="max_item_baskets"):
        association_rules(df, "b", "i", max_item_baskets=2)
