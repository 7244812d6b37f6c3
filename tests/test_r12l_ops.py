"""Known-value tests for the r12 twelfth sub-wave: Bartlett's variance
test (nonparam.py), odds ratio with Woolf CI (drift.py), CUPED
adjustment and delta-method ratio-metric CI (abexp.py)."""

import math
import random
import statistics

import pytest
from pyspark.sql import functions as F


def test_bartlett_known(spark):
    from stackstac_spark.operators.nonparam import bartlett_test

    random.seed(40)
    rows = [
        (g, float(random.gauss(0, 1 + 0.5 * gi)))
        for gi, g in enumerate("abc")
        for _ in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    r = bartlett_test(df, "x", "g").first()
    data = {g: [x for gg, x in rows if gg == g] for g in "abc"}
    k, N = 3, 150
    s2 = {g: statistics.variance(v) for g, v in data.items()}
    sp2 = sum((len(v) - 1) * s2[g] for g, v in data.items()) / (N - k)
    T = (N - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(s2[g]) for g, v in data.items()
    )
    C = 1 + (sum(1 / (len(v) - 1) for v in data.values()) - 1 / (N - k)) / (
        3 * (k - 1)
    )
    assert (r["k"], r["n"]) == (3, 150)
    assert r["chi2"] == pytest.approx(T / C, abs=1e-6)
    # built-in variance spread -> significant
    assert r["chi2"] > 5.99
    # a constant arm -> NULL (no log of 0)
    c = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)], "g string, x double"
    )
    assert bartlett_test(c, "x", "g").first()["chi2"] is None
    # single-member arm -> NULL
    s = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("b", 2.0)], "g string, x double"
    )
    assert bartlett_test(s, "x", "g").first()["chi2"] is None


def test_odds_ratio_known(spark):
    from stackstac_spark.operators.drift import odds_ratio

    rows = [(1, 1)] * 30 + [(1, 0)] * 70 + [(0, 1)] * 10 + [(0, 0)] * 90
    df = spark.createDataFrame(rows, "e int, o int")
    r = odds_ratio(df, "e", "o").first()
    a, b, c, d = 30, 70, 10, 90
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    assert r["or_est"] == pytest.approx(orr, abs=1e-6)
    assert r["ci_low"] == pytest.approx(orr * math.exp(-1.959964 * se), abs=1e-5)
    assert r["ci_high"] == pytest.approx(orr * math.exp(1.959964 * se), abs=1e-5)
    # zero cell -> Haldane +0.5 on ALL cells (raw counts still reported)
    z = spark.createDataFrame(
        [(1, 1)] * 5 + [(1, 0)] * 5 + [(0, 0)] * 10, "e int, o int"
    )
    rz = odds_ratio(z, "e", "o").first()
    assert rz["c"] == 0
    assert rz["or_est"] == pytest.approx(5.5 * 10.5 / (5.5 * 0.5), abs=1e-6)
    # no-association table -> OR ~ 1 inside its own CI
    flat = [(e, o) for e in (0, 1) for o in (0, 1) for _ in range(25)]
    rf = odds_ratio(spark.createDataFrame(flat, "e int, o int"), "e", "o").first()
    assert rf["or_est"] == 1.0 and rf["ci_low"] < 1.0 < rf["ci_high"]


def test_cuped_known(spark):
    from stackstac_spark.operators.abexp import cuped_adjust

    random.seed(41)
    rows = []
    for i in range(2000):
        arm = "t" if i % 2 else "c"
        x = random.gauss(10, 3)
        y = 0.8 * x + random.gauss(0, 2) + (0.5 if arm == "t" else 0.0)
        rows.append((arm, float(y), float(x)))
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    got = {r["arm"]: r for r in cuped_adjust(df, "y", "x", "arm").collect()}
    ys = [y for _, y, _ in rows]
    xs = [x for _, _, x in rows]
    my, mx = statistics.mean(ys), statistics.mean(xs)
    cxy = sum((y - my) * (x - mx) for _, y, x in rows) / (len(rows) - 1)
    vx, vy = statistics.variance(xs), statistics.variance(ys)
    theta, rho2 = cxy / vx, cxy * cxy / (vx * vy)
    for arm in ("c", "t"):
        sub = [(y, x) for a, y, x in rows if a == arm]
        mya = statistics.mean([y for y, _ in sub])
        mxa = statistics.mean([x for _, x in sub])
        assert got[arm]["mean_raw"] == pytest.approx(mya, abs=1e-6)
        assert got[arm]["mean_adj"] == pytest.approx(
            mya - theta * (mxa - mx), abs=1e-6
        )
        assert got[arm]["theta"] == pytest.approx(theta, abs=1e-6)
        assert got[arm]["rho2"] == pytest.approx(rho2, abs=1e-6)
    # the strong covariate removes >50% of variance, and the adjusted
    # lift recovers the planted +0.5 treatment effect
    assert got["t"]["var_reduction"] > 0.5
    assert got["t"]["mean_adj"] - got["c"]["mean_adj"] == pytest.approx(0.5, abs=0.3)


def test_ratio_metric_ci_known(spark):
    from stackstac_spark.operators.abexp import ratio_metric_ci

    random.seed(42)
    ev = []
    for u in range(500):
        arm = "t" if u % 2 else "c"
        for _ in range(random.randint(1, 20)):
            p = 0.3 if arm == "t" else 0.25
            ev.append((arm, u, 1.0 if random.random() < p else 0.0, 1.0))
    df = spark.createDataFrame(ev, "arm string, u int, clicks double, views double")
    got = {
        r["arm"]: r
        for r in ratio_metric_ci(df, "clicks", "views", "u", "arm").collect()
    }
    for arm in ("c", "t"):
        units = {}
        for a, u, cl, v in ev:
            if a == arm:
                nu, du = units.get(u, (0.0, 0.0))
                units[u] = (nu + cl, du + v)
        ns = [x for x, _ in units.values()]
        ds = [y for _, y in units.values()]
        R = sum(ns) / sum(ds)
        n = len(units)
        mn, md = statistics.mean(ns), statistics.mean(ds)
        cnd = sum((a2 - mn) * (b2 - md) for a2, b2 in units.values()) / (n - 1)
        varr = (
            statistics.variance(ns) - 2 * R * cnd + R * R * statistics.variance(ds)
        ) / (n * md * md)
        assert got[arm]["n_units"] == n
        assert got[arm]["ratio"] == pytest.approx(R, abs=1e-6)
        assert got[arm]["se"] == pytest.approx(math.sqrt(varr), abs=1e-6)
    # the true rates sit inside their arms' intervals
    assert got["c"]["ci_low"] < 0.25 < got["c"]["ci_high"]
    assert got["t"]["ci_low"] < 0.30 < got["t"]["ci_high"]
    # single-unit arm -> NULL interval
    one = spark.createDataFrame(
        [("x", 1, 1.0, 2.0)], "arm string, u int, clicks double, views double"
    )
    r1 = ratio_metric_ci(one, "clicks", "views", "u", "arm").first()
    assert r1["ratio"] == 0.5 and r1["se"] is None
