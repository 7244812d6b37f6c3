"""Known-value tests for the r12 fifteenth sub-wave: Benjamini-Yekutieli
FDR + relative risk (drift.py), diversity profile (sampling.py)."""

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


def test_by_fdr_known(spark):
    from stackstac_spark.operators.drift import bh_fdr, by_fdr

    random.seed(70)
    tests = [("t%02d" % i, round(random.random() ** 2, 4)) for i in range(15)]
    df = spark.createDataFrame(tests, "test string, p double")
    got = [
        (r["test"], r["by_rank"], r["p_adj"], r["rejected"])
        for r in by_fdr(df, "p").collect()
    ]
    m = len(tests)
    cm = sum(1 / i for i in range(1, m + 1))
    srt = sorted(tests, key=lambda t: (t[1], t[0]))
    raw = [min(1.0, cm * m * p / (i + 1)) for i, (_, p) in enumerate(srt)]
    adj, run = [0.0] * m, 1.0
    for i in range(m - 1, -1, -1):
        run = min(run, raw[i])
        adj[i] = run
    rej_k = 0
    for i, (_, p) in enumerate(srt, 1):
        if p <= i * 0.05 / (m * cm):
            rej_k = i
    exp = [(srt[i][0], i + 1, round(adj[i], 6), (i + 1) <= rej_k) for i in range(m)]
    assert got == exp
    # BY is uniformly more conservative than BH: rejections are a subset
    # and adjusted p's are >= BH's
    bh = {r["test"]: (r["p_adj"], r["rejected"]) for r in bh_fdr(df, "p").collect()}
    for t, _, padj, rej in got:
        assert padj >= bh[t][0] - 1e-9
        assert not rej or bh[t][1]
    # a tiny p does get rejected under BY too
    strong = df.union(spark.createDataFrame([("t99", 0.00001)], "test string, p double"))
    rs = {r["test"]: r["rejected"] for r in by_fdr(strong, "p").collect()}
    assert rs["t99"]


def test_risk_ratio_known(spark):
    from stackstac_spark.operators.drift import risk_ratio

    rows = [(1, 1)] * 30 + [(1, 0)] * 70 + [(0, 1)] * 10 + [(0, 0)] * 90
    df = spark.createDataFrame(rows, "e int, o int")
    r = risk_ratio(df, "e", "o").first()
    a, b, c, d = 30, 70, 10, 90
    rr = (a / (a + b)) / (c / (c + d))
    se = math.sqrt(1 / a - 1 / (a + b) + 1 / c - 1 / (c + d))
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    assert r["rr_est"] == pytest.approx(rr, abs=1e-6)
    assert r["ci_low"] == pytest.approx(rr * math.exp(-1.959964 * se), abs=1e-5)
    assert r["ci_high"] == pytest.approx(rr * math.exp(1.959964 * se), abs=1e-5)
    # zero unexposed-outcome cell -> continuity correction applied
    z = spark.createDataFrame(
        [(1, 1)] * 5 + [(1, 0)] * 5 + [(0, 0)] * 10, "e int, o int"
    )
    rz = risk_ratio(z, "e", "o").first()
    a2, b2, c2, d2 = 5.5, 5.5, 0.5, 10.5
    assert rz["rr_est"] == pytest.approx((a2 / (a2 + b2)) / (c2 / (c2 + d2)), abs=1e-6)
    # equal risks -> RR 1 inside its CI
    flat = [(e, o) for e in (0, 1) for o in (0, 1) for _ in range(25)]
    rf = risk_ratio(spark.createDataFrame(flat, "e int, o int"), "e", "o").first()
    assert rf["rr_est"] == 1.0 and rf["ci_low"] < 1.0 < rf["ci_high"]


def test_diversity_profile_known(spark):
    from stackstac_spark.operators.sampling import diversity_profile

    random.seed(71)
    cats = [random.choice("aabbbcdde") for _ in range(500)]
    df = spark.createDataFrame([(c,) for c in cats], "cat string")
    r = diversity_profile(df, "cat").first()
    cnt = Counter(cats)
    n, k = len(cats), len(cnt)
    ps = [v / n for v in cnt.values()]
    H = -sum(p * math.log(p) for p in ps)
    assert (r["n"], r["richness"]) == (n, k)
    assert r["shannon_h"] == pytest.approx(H, abs=1e-6)
    assert r["evenness"] == pytest.approx(H / math.log(k), abs=1e-6)
    assert r["simpson"] == pytest.approx(1 - sum(p * p for p in ps), abs=1e-6)
    assert r["dominance"] == pytest.approx(max(ps), abs=1e-6)
    # single-category group: H = 0, evenness NULL, dominance 1
    one = spark.createDataFrame([("x",)] * 5, "cat string")
    ro = diversity_profile(one, "cat").first()
    assert ro["shannon_h"] == 0.0 and ro["evenness"] is None and ro["dominance"] == 1.0
    # perfectly even mix -> evenness 1
    ev = spark.createDataFrame([(c,) for c in "abcd" * 25], "cat string")
    assert diversity_profile(ev, "cat").first()["evenness"] == 1.0
