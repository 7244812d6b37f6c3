"""Known-value tests for the r12 fourteenth sub-wave: entropy-optimal
split (mlfit.py) and the experiment-health trio — SRM check, minimum
detectable effect, UCB1 allocation (abexp.py)."""

import math
import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F


def test_info_split_known(spark):
    from stackstac_spark.operators.mlfit import info_split

    random.seed(60)
    xs = [float(random.randint(0, 100)) for _ in range(500)]
    data = [
        (x, 1 if x > 50 and random.random() < 0.9 else (1 if random.random() < 0.1 else 0))
        for x in xs
    ]
    df = spark.createDataFrame(data, "x double, y int")
    r = info_split(df, "x", "y").first()
    pv = defaultdict(lambda: [0, 0])
    for x, y in data:
        pv[x][y] += 1
    P = sum(v[1] for v in pv.values())
    Q = sum(v[0] for v in pv.values())
    N = P + Q

    def H(p, q):
        t, h = p + q, 0.0
        if p > 0:
            h -= p / t * math.log(p / t)
        if q > 0:
            h -= q / t * math.log(q / t)
        return h

    best, pl, ql = None, 0, 0
    svals = sorted(pv)
    for x in svals[:-1]:
        ql += pv[x][0]
        pl += pv[x][1]
        hs = (pl + ql) / N * H(pl, ql) + (N - pl - ql) / N * H(P - pl, Q - ql)
        if best is None or hs < best[0] - 1e-12:
            best = (hs, x)
    assert r["threshold"] == best[1]  # recovers the planted x=50 boundary
    assert r["h_parent"] == pytest.approx(H(P, Q), abs=1e-6)
    assert r["h_split"] == pytest.approx(best[0], abs=1e-6)
    assert r["info_gain"] == pytest.approx(H(P, Q) - best[0], abs=1e-6)
    assert r["info_gain"] > 0.2
    # single-class input -> NULL split
    sc = spark.createDataFrame([(1.0, 1), (2.0, 1)], "x double, y int")
    assert info_split(sc, "x", "y").first()["info_gain"] is None
    with pytest.raises(ValueError, match="max_distinct"):
        info_split(df, "x", "y", max_distinct=3)


def test_srm_check_known(spark):
    from stackstac_spark.operators.abexp import srm_check

    rows = [("a",)] * 5200 + [("b",)] * 4800
    df = spark.createDataFrame(rows, "arm string")
    got = {r["arm"]: (r["n"], r["expected_n"], r["chi2"]) for r in srm_check(df, "arm").collect()}
    chi2 = (5200 - 5000) ** 2 / 5000 + (4800 - 5000) ** 2 / 5000
    assert got["a"] == (5200, 5000.0, pytest.approx(chi2, abs=1e-6))
    assert got["b"][0] == 4800
    # the DESIGNED 52/48 split reads clean
    assert srm_check(df, "arm", expected={"a": 0.52, "b": 0.48}).first()["chi2"] == 0.0
    # an arm missing from `expected` is itself a bug -> raise
    with pytest.raises(ValueError, match="not in expected"):
        srm_check(df, "arm", expected={"a": 1.0})
    # an expected-but-unobserved arm contributes its full expected mass
    g3 = {r["arm"]: r["n"] for r in srm_check(
        df, "arm", expected={"a": 0.5, "b": 0.4, "ghost": 0.1}
    ).collect()}
    assert g3["ghost"] == 0


def test_mde_report_known(spark):
    from stackstac_spark.operators.abexp import mde_report

    rows = (
        [("c", 1)] * 250 + [("c", 0)] * 4750 + [("t", 1)] * 300 + [("t", 0)] * 4700
    )
    df = spark.createDataFrame(rows, "arm string, conv int")
    r = mde_report(df, "conv", "arm").first()
    pp = 550 / 10000
    mde = (1.959964 + 0.841621) * math.sqrt(pp * (1 - pp) * (2 / 5000))
    assert (r["arm_a"], r["arm_b"], r["n_a"], r["n_b"]) == ("c", "t", 5000, 5000)
    assert r["p_pool"] == pytest.approx(pp, abs=1e-6)
    assert r["mde_abs"] == pytest.approx(mde, abs=1e-6)
    assert r["mde_rel"] == pytest.approx(mde / pp, abs=1e-6)
    # all-converted arms -> degenerate pooled rate -> NULL MDE
    deg = spark.createDataFrame([("a", 1), ("b", 1)], "arm string, conv int")
    assert mde_report(deg, "conv", "arm").first()["mde_abs"] is None
    # three arms -> three pairs
    three = df.union(spark.createDataFrame([("x", 1)] * 10, "arm string, conv int"))
    assert mde_report(three, "conv", "arm").count() == 3


def test_ucb_scores_known(spark):
    from stackstac_spark.operators.abexp import ucb_scores

    random.seed(61)
    rows = [("a", 1.0 if random.random() < 0.5 else 0.0) for _ in range(100)]
    rows += [("b", 1.0 if random.random() < 0.6 else 0.0) for _ in range(20)]
    rows += [("c", 1.0 if random.random() < 0.4 else 0.0) for _ in range(5)]
    df = spark.createDataFrame(rows, "arm string, r double")
    got = {
        r["arm"]: (r["n_pulls"], r["mean_reward"], r["ucb"], r["play_next"])
        for r in ucb_scores(df, "arm", "r").collect()
    }
    N = 125
    cnt = Counter(a for a, _ in rows)
    means = {a: sum(r for aa, r in rows if aa == a) / cnt[a] for a in cnt}
    ucbs = {a: means[a] + 1.414214 * math.sqrt(math.log(N) / cnt[a]) for a in cnt}
    for a in cnt:
        assert got[a][0] == cnt[a]
        assert got[a][1] == pytest.approx(means[a], abs=1e-6)
        assert got[a][2] == pytest.approx(ucbs[a], abs=1e-6)
    # exactly one arm marked, and it's the under-explored one here
    winners = [a for a, v in got.items() if v[3]]
    assert winners == ["c"]
