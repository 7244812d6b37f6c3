"""Known-value tests for the r11 fifth sub-wave: lift_deciles, g_test,
cohens_d, page_hinkley."""

import math

import pytest
from pyspark.sql import functions as F


def test_lift_deciles_known(spark):
    from stackstac_spark.operators.evalmetrics import lift_deciles

    # 20 rows, scores 20..1 descending; positives are the top 5 scores
    rows = [(float(21 - i), 1 if i <= 5 else 0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["bucket"]: r for r in lift_deciles(df, "s", "y", n_buckets=10).collect()}
    # each bucket holds exactly 2 rows; buckets 0-1 hold 2 pos each, bucket 2 one
    assert all(out[b]["n"] == 2.0 for b in range(10))
    assert out[0]["n_pos"] == 2.0 and out[1]["n_pos"] == 2.0
    assert out[2]["n_pos"] == 1.0 and out[3]["n_pos"] == 0.0
    # cumulative gain at bucket 1 = 4/5; lift there = (4/4)/(5/20) = 4
    assert out[1]["gain"] == pytest.approx(0.8)
    assert out[1]["lift"] == pytest.approx((4 / 4) / (5 / 20))
    assert out[9]["gain"] == pytest.approx(1.0) and out[9]["lift"] == pytest.approx(1.0)
    # tied scores straddling a boundary split proportionally
    tied = spark.createDataFrame(
        [(2.0, 1)] * 3 + [(1.0, 0)] * 1, "s double, y int"
    )
    o = {r["bucket"]: r for r in lift_deciles(tied, "s", "y", n_buckets=2).collect()}
    # n=4 -> band sizes 2/2; the 3 tied rows (2 pos... all 3 pos) overlap:
    # bucket0 takes 2 of the tied rows -> pos = 1*2*3/3? pos share = 3*2/3 = 2
    assert o[0]["n"] == 2.0 and o[0]["n_pos"] == pytest.approx(2.0)
    assert o[1]["n"] == 2.0 and o[1]["n_pos"] == pytest.approx(1.0)


def test_g_test_known(spark):
    from stackstac_spark.operators.drift import g_test

    # 2x2 with known counts: [[10, 20], [30, 40]]
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = g_test(df, "a", "b").first()
    n = 100
    obs = {("x", "u"): 10, ("x", "v"): 20, ("y", "u"): 30, ("y", "v"): 40}
    ra = {"x": 30, "y": 70}
    cb = {"u": 40, "v": 60}
    g = 2 * sum(o * math.log(o * n / (ra[a] * cb[b])) for (a, b), o in obs.items())
    assert got["n"] == n and got["dof"] == 1
    assert got["g_stat"] == pytest.approx(g, abs=2e-6)
    # perfectly independent -> G = 0
    indep = spark.createDataFrame(
        [("x", "u")] * 6 + [("x", "v")] * 6 + [("y", "u")] * 6 + [("y", "v")] * 6,
        "a string, b string",
    )
    assert g_test(indep, "a", "b").first()["g_stat"] == pytest.approx(0.0, abs=1e-9)


def test_cohens_d_vs_numpy(spark):
    import numpy as np
    from stackstac_spark.operators.drift import cohens_d

    rng = np.random.default_rng(5)
    ga = rng.normal(10, 2, 40)
    gb = rng.normal(13, 2, 60)
    rows = [("a", float(v)) for v in ga] + [("b", float(v)) for v in gb]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in cohens_d(df, "x", "g").collect()}
    # group a vs rest (= b)
    sp = math.sqrt(
        ((len(ga) - 1) * ga.var(ddof=1) + (len(gb) - 1) * gb.var(ddof=1))
        / (len(ga) + len(gb) - 2)
    )
    want_a = (ga.mean() - gb.mean()) / sp
    assert got["a"]["d"] == pytest.approx(want_a, abs=1e-4)
    assert got["b"]["d"] == pytest.approx(-want_a, abs=1e-4)
    # single group -> rest empty -> NULL
    solo = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, x double")
    assert cohens_d(solo, "x", "g").first()["d"] is None


def test_page_hinkley_shift_detected(spark):
    from stackstac_spark.operators.timeseries import page_hinkley

    # flat at 0 for 20 points, then jump to 10: PH must alarm after the jump
    rows = [(float(t), 0.0) for t in range(20)] + [
        (float(t), 10.0) for t in range(20, 40)
    ]
    df = spark.createDataFrame(rows, "t double, x double")
    r = page_hinkley(df, "t", "x", lam=10.0).first()
    assert r["alarm"] is True and r["alarm_t"] is not None and r["alarm_t"] >= 20.0
    # flat series never alarms, PH stays 0
    flat = spark.createDataFrame([(float(t), 5.0) for t in range(30)], "t double, x double")
    r = page_hinkley(flat, "t", "x", lam=1.0).first()
    assert r["alarm"] is False and r["ph_stat"] == 0.0 and r["alarm_t"] is None
    # hand replay on a tiny series
    xs = [1.0, 2.0, 6.0]
    df3 = spark.createDataFrame([(float(i), x) for i, x in enumerate(xs)], "t double, x double")
    m, run, mn, ph_max = 0.0, [], None, 0.0
    cum = 0.0
    for i, x in enumerate(xs, 1):
        cum += x
        m += x - cum / i
        mn = m if mn is None else min(mn, m)
        ph_max = max(ph_max, m - mn)
    r = page_hinkley(df3, "t", "x", lam=100.0).first()
    assert r["ph_stat"] == pytest.approx(ph_max, abs=1e-6)
    # guards
    dup = spark.createDataFrame([(1.0, 1.0), (1.0, 2.0)], "t double, x double")
    with pytest.raises(ValueError, match="duplicate"):
        page_hinkley(dup, "t", "x")
