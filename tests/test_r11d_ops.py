"""Known-value tests for the r11 fourth sub-wave: kaplan_meier,
kendall_tau_b, cochran_q, anova_f."""

import math

import pytest
from pyspark.sql import functions as F


def test_kaplan_meier_textbook(spark):
    from stackstac_spark.operators.survival import kaplan_meier

    # classic: durations (event=1 unless noted): 6, 6, 6, 7, 10(c), 13, 16(c)
    rows = [
        (6.0, 1), (6.0, 1), (6.0, 1), (7.0, 1), (10.0, 0), (13.0, 1), (16.0, 0),
    ]
    df = spark.createDataFrame(rows, "d double, e int")
    out = {r["t"]: r for r in kaplan_meier(df, "d", "e").collect()}
    # t=6: n_risk 7, d 3 -> S = 4/7
    assert out[6.0]["n_risk"] == 7 and out[6.0]["n_events"] == 3
    assert out[6.0]["survival"] == pytest.approx(4 / 7, abs=1e-6)
    # t=7: n_risk 4, d 1 -> S = 4/7 * 3/4 = 3/7
    assert out[7.0]["n_risk"] == 4
    assert out[7.0]["survival"] == pytest.approx(3 / 7, abs=1e-6)
    # t=13: n_risk 2 (censored-at-10 left), d 1 -> S = 3/7 * 1/2
    assert out[13.0]["n_risk"] == 2
    assert out[13.0]["survival"] == pytest.approx(3 / 14, abs=1e-6)
    # censored-only times produce no KM step rows
    assert 10.0 not in out and 16.0 not in out
    # everyone dies at the last event time -> exact 0.0
    alldie = spark.createDataFrame([(1.0, 1), (2.0, 1)], "d double, e int")
    r = {x["t"]: x for x in kaplan_meier(alldie, "d", "e").collect()}
    assert r[2.0]["survival"] == 0.0
    # null rows excluded
    dirty = spark.createDataFrame(rows + [(None, 1), (3.0, None)], "d double, e int")
    assert kaplan_meier(dirty, "d", "e").count() == 3


def test_kendall_tau_b_vs_bruteforce(spark):
    from stackstac_spark.operators.drift import kendall_tau_b

    x = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 5.0, 6.0]
    y = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 6.0, 6.0]
    df = spark.createDataFrame(list(zip(x, y)), "a double, b double")
    got = kendall_tau_b(df, "a", "b").first()
    # brute force
    n = len(x)
    C = D = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (x[i] - x[j]) * (y[i] - y[j])
            if s > 0:
                C += 1
            elif s < 0:
                D += 1
    n0 = n * (n - 1) / 2
    ta = sum(t * (t - 1) / 2 for t in [x.count(v) for v in set(x)])
    tb = sum(t * (t - 1) / 2 for t in [y.count(v) for v in set(y)])
    want = (C - D) / math.sqrt((n0 - ta) * (n0 - tb))
    assert (got["concordant"], got["discordant"]) == (C, D)
    assert got["tau_b"] == pytest.approx(want, abs=2e-6)
    # constant column -> NULL
    const = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0)], "a double, b double")
    assert kendall_tau_b(const, "a", "b").first()["tau_b"] is None
    # guard
    cont = spark.range(0, 2000).select(F.rand(1).alias("a"), F.rand(2).alias("b"))
    with pytest.raises(ValueError, match="max_cells"):
        kendall_tau_b(cont, "a", "b", max_cells=100)
    # GROUPED constant-a group is emitted with tau_b NULL, not dropped
    # (r11 ADVICE: the inner n_tab-cd join removed it)
    grp = spark.createDataFrame(
        [("g1", 1.0, 2.0), ("g1", 1.0, 3.0), ("g2", 1.0, 1.0), ("g2", 2.0, 2.0)],
        "g string, a double, b double",
    )
    got = {r["g"]: r for r in kendall_tau_b(grp, "a", "b", ["g"]).collect()}
    assert set(got) == {"g1", "g2"}
    assert got["g1"]["tau_b"] is None
    assert (got["g1"]["concordant"], got["g1"]["discordant"]) == (0, 0)
    assert got["g2"]["tau_b"] == pytest.approx(1.0, abs=1e-6)


def test_cochran_q_known(spark):
    from stackstac_spark.operators.evalmetrics import cochran_q

    # 3 classifiers, 6 items; label always 1, preds are right/wrong flags
    rows = [
        (1, 1, 1, 1),
        (1, 1, 0, 1),
        (1, 0, 0, 1),
        (1, 1, 1, 1),
        (0, 0, 0, 1),
        (1, 0, 1, 1),
    ]
    df = spark.createDataFrame(rows, "p1 int, p2 int, p3 int, y int")
    got = cochran_q(df, ["p1", "p2", "p3"], "y").first()
    k = 3
    G = [5, 3, 3]
    L = [3, 2, 1, 3, 0, 2]
    T = sum(L)
    num = sum((g - T / k) ** 2 for g in G)
    den = k * T - sum(v * v for v in L)
    assert got["n"] == 6 and got["k"] == 3
    assert got["q_stat"] == pytest.approx(k * (k - 1) * num / den, abs=2e-6)
    # all agree everywhere -> denominator 0 -> NULL
    same = spark.createDataFrame([(1, 1, 1, 1)] * 4, "p1 int, p2 int, p3 int, y int")
    assert cochran_q(same, ["p1", "p2", "p3"], "y").first()["q_stat"] is None
    # null rows excluded
    dirty = spark.createDataFrame(rows + [(None, 1, 1, 1), (1, 1, 1, None)],
                                  "p1 int, p2 int, p3 int, y int")
    assert cochran_q(dirty, ["p1", "p2", "p3"], "y").first()["n"] == 6


def test_anova_f_vs_numpy(spark):
    import numpy as np
    from stackstac_spark.operators.drift import anova_f

    rng = np.random.default_rng(3)
    data = {"a": rng.normal(10, 2, 30), "b": rng.normal(12, 2, 25), "c": rng.normal(10.5, 2, 40)}
    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x double")
    got = anova_f(df, "x", "g").first()
    allv = np.concatenate(list(data.values()))
    gm = allv.mean()
    ssb = sum(len(v) * (v.mean() - gm) ** 2 for v in data.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in data.values())
    k, n = 3, len(allv)
    assert got["k"] == k and got["n"] == n
    assert got["ss_between"] == pytest.approx(ssb, abs=1e-4)
    assert got["ss_within"] == pytest.approx(ssw, abs=1e-4)
    assert got["f_stat"] == pytest.approx((ssb / (k - 1)) / (ssw / (n - k)), abs=1e-4)
    assert got["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-6)
    # identical within-group values -> SSW 0 -> NULL F
    flat = spark.createDataFrame([("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)], "g string, x double")
    assert anova_f(flat, "x", "g").first()["f_stat"] is None
