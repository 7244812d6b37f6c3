"""Known-value tests for the r12 second sub-wave: Lin's CCC, Cronbach's
alpha, Gwet's AC1 (evalmetrics.py); Grubbs statistic, Hellinger+TV
categorical drift, Cohen's h (drift.py). Brute-force textbook oracles
computed inline."""

import math

import pytest
from pyspark.sql import functions as F


def test_lin_ccc_known(spark):
    from stackstac_spark.operators.evalmetrics import lin_ccc

    A = [1.0, 2.0, 3.0, 4.0, 5.0]
    B = [1.5, 2.1, 3.3, 3.8, 5.4]
    n = len(A)
    ma, mb = sum(A) / n, sum(B) / n
    sxx = sum((a - ma) ** 2 for a in A) / n
    syy = sum((b - mb) ** 2 for b in B) / n
    sxy = sum((a - ma) * (b - mb) for a, b in zip(A, B)) / n
    want = 2 * sxy / (sxx + syy + (ma - mb) ** 2)
    df = spark.createDataFrame(list(zip(A, B)), "a double, b double")
    r = lin_ccc(df, "a", "b").first()
    assert r["n"] == 5 and r["ccc"] == pytest.approx(want, abs=1e-6)
    # identity -> 1; pure 2x scale inflation is punished (Pearson r stays 1)
    assert lin_ccc(df, "a", "a").first()["ccc"] == 1.0
    scaled = spark.createDataFrame([(a, 2 * a) for a in A], "a double, b double")
    assert lin_ccc(scaled, "a", "b").first()["ccc"] < 0.8
    # both constant -> NULL (denominator 0); NaN pairs dropped
    const = spark.createDataFrame([(1.0, 1.0), (1.0, 1.0)], "a double, b double")
    assert lin_ccc(const, "a", "b").first()["ccc"] is None
    dirty = df.unionByName(
        spark.createDataFrame([(float("nan"), 1.0)], "a double, b double")
    )
    assert lin_ccc(dirty, "a", "b").first()["n"] == 5


def test_cronbach_alpha_known(spark):
    from stackstac_spark.operators.evalmetrics import cronbach_alpha

    rows = [
        (1.0, 2.0, 2.0),
        (2.0, 3.0, 4.0),
        (3.0, 3.0, 5.0),
        (4.0, 5.0, 5.0),
        (5.0, 5.0, 6.0),
        (1.0, 1.0, 2.0),
    ]
    k = 3

    def var(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / len(v)

    items = list(zip(*rows))
    sums = [sum(r) for r in rows]
    want = k / (k - 1) * (1 - sum(var(list(i)) for i in items) / var(sums))
    df = spark.createDataFrame(rows, "i1 double, i2 double, i3 double")
    r = cronbach_alpha(df, ["i1", "i2", "i3"]).first()
    assert (r["n"], r["k"]) == (6, 3)
    assert r["alpha"] == pytest.approx(want, abs=1e-6)
    # incomplete rows excluded; < 2 items raises; zero total variance NULL
    dirty = df.unionByName(
        spark.createDataFrame([(1.0, None, 2.0)], "i1 double, i2 double, i3 double")
    )
    assert cronbach_alpha(dirty, ["i1", "i2", "i3"]).first()["n"] == 6
    with pytest.raises(ValueError, match=">= 2 items"):
        cronbach_alpha(df, ["i1"])
    const = spark.createDataFrame([(1.0, 2.0), (1.0, 2.0)], "i1 double, i2 double")
    assert cronbach_alpha(const, ["i1", "i2"]).first()["alpha"] is None


def test_gwet_ac1_known(spark):
    from stackstac_spark.operators.evalmetrics import gwet_ac1

    ra = ["x", "x", "x", "x", "y", "x", "x", "y", "x", "x"]
    rb = ["x", "x", "x", "x", "y", "x", "y", "y", "x", "x"]
    n = len(ra)
    po = sum(1 for a, b in zip(ra, rb) if a == b) / n
    cats = sorted(set(ra) | set(rb))
    pe = sum(
        ((ra.count(c) / n + rb.count(c) / n) / 2)
        * (1 - (ra.count(c) / n + rb.count(c) / n) / 2)
        for c in cats
    ) / (len(cats) - 1)
    want = (po - pe) / (1 - pe)
    df = spark.createDataFrame(list(zip(ra, rb)), "a string, b string")
    r = gwet_ac1(df, "a", "b").first()
    assert r["po"] == pytest.approx(po, abs=1e-6)
    assert r["pe"] == pytest.approx(pe, abs=1e-6)
    assert r["ac1"] == pytest.approx(want, abs=1e-5)
    # the kappa paradox case: 95%-prevalent category, high agreement —
    # AC1 stays high where kappa collapses
    skew = spark.createDataFrame(
        [("c", "c")] * 95 + [("c", "d")] * 2 + [("d", "c")] * 2 + [("d", "d")],
        "a string, b string",
    )
    from stackstac_spark.operators.evalmetrics import cohens_kappa

    ac1 = gwet_ac1(skew, "a", "b").first()["ac1"]
    kap = cohens_kappa(skew, "a", "b").first()["kappa"]
    assert ac1 > 0.9 and kap < 0.4
    # single shared category: pe = 0 (C = 1), po = 1 -> ac1 = 1
    mono = spark.createDataFrame([("c", "c")] * 3, "a string, b string")
    assert gwet_ac1(mono, "a", "b").first()["ac1"] == 1.0


def test_grubbs_stat_known(spark):
    from stackstac_spark.operators.drift import grubbs_stat

    V = [10.0, 11.0, 10.5, 9.8, 10.2, 25.0]
    m = sum(V) / len(V)
    s = math.sqrt(sum((x - m) ** 2 for x in V) / (len(V) - 1))
    want = max(abs(min(V) - m), abs(max(V) - m)) / s
    df = spark.createDataFrame([(v,) for v in V], "x double")
    r = grubbs_stat(df, "x").first()
    assert r["g_stat"] == pytest.approx(want, abs=1e-6)
    assert r["extreme_value"] == 25.0
    # low-side extreme picked when further from the mean
    lo = spark.createDataFrame([(v,) for v in [10.0, 11.0, 10.5, -20.0]], "x double")
    assert grubbs_stat(lo, "x").first()["extreme_value"] == -20.0
    # n < 3 and zero-sd -> NULL
    assert grubbs_stat(
        spark.createDataFrame([(1.0,), (2.0,)], "x double"), "x"
    ).first()["g_stat"] is None
    assert grubbs_stat(
        spark.createDataFrame([(5.0,)] * 4, "x double"), "x"
    ).first()["g_stat"] is None


def test_hellinger_tv_brute(spark):
    from stackstac_spark.operators.drift import hellinger_tv

    refc = {"a": 5, "b": 3, "c": 2}
    gc = {"a": 2, "b": 5, "d": 3}
    nr, ng = sum(refc.values()), sum(gc.values())
    cats = set(refc) | set(gc)
    hell = math.sqrt(
        max(
            0.0,
            1
            - sum(
                math.sqrt((refc.get(c, 0) / nr) * (gc.get(c, 0) / ng)) for c in cats
            ),
        )
    )
    tv = sum(abs(refc.get(c, 0) / nr - gc.get(c, 0) / ng) for c in cats) / 2
    rows = [("ref", c) for c, v in refc.items() for _ in range(v)] + [
        ("g1", c) for c, v in gc.items() for _ in range(v)
    ]
    df = spark.createDataFrame(rows, "g string, c string")
    r = hellinger_tv(df, "c", "g", "ref").first()
    assert r["hellinger"] == pytest.approx(hell, abs=1e-6)
    assert r["tv"] == pytest.approx(tv, abs=1e-6)
    # identical distribution -> exactly (0, 0); disjoint -> (1, 1)
    same = [("ref", c) for c in "aab"] + [("g1", c) for c in "aab"]
    r0 = hellinger_tv(
        spark.createDataFrame(same, "g string, c string"), "c", "g", "ref"
    ).first()
    assert r0["hellinger"] == 0.0 and r0["tv"] == 0.0
    disj = [("ref", "a")] * 3 + [("g1", "b")] * 3
    r1 = hellinger_tv(
        spark.createDataFrame(disj, "g string, c string"), "c", "g", "ref"
    ).first()
    assert r1["hellinger"] == 1.0 and r1["tv"] == 1.0


def test_cohens_h_known(spark):
    from stackstac_spark.operators.drift import cohens_h

    want = 2 * math.asin(math.sqrt(0.25)) - 2 * math.asin(math.sqrt(0.1))
    rows = (
        [("ref", 1.0)] * 10
        + [("ref", 0.0)] * 90
        + [("g1", 1.0)] * 25
        + [("g1", 0.0)] * 75
    )
    df = spark.createDataFrame(rows, "g string, f double")
    r = cohens_h(df, "f", "g", "ref").first()
    assert (r["p_ref"], r["p_grp"]) == (0.1, 0.25)
    assert r["h"] == pytest.approx(want, abs=1e-6)
    # equal small-rate vs equal mid-rate absolute deltas: h differs
    # (the arcsine stabilization is the point of the metric)
    small = [("ref", 1.0)] * 1 + [("ref", 0.0)] * 99 + [("g", 1.0)] * 2 + [("g", 0.0)] * 98
    mid = [("ref", 1.0)] * 50 + [("ref", 0.0)] * 50 + [("g", 1.0)] * 51 + [("g", 0.0)] * 49
    h_small = cohens_h(
        spark.createDataFrame(small, "g string, f double"), "f", "g", "ref"
    ).first()["h"]
    h_mid = cohens_h(
        spark.createDataFrame(mid, "g string, f double"), "f", "g", "ref"
    ).first()["h"]
    assert abs(h_small) > 3 * abs(h_mid)
