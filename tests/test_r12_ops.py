"""Known-value tests for the r12 wave: Kruskal-Wallis, Friedman, Wilcoxon
signed-rank, Cliff's delta, Somers' D (nonparam.py); 1-D Wasserstein
(drift.py); Theil-Sen, Durbin-Watson, runs test (timeseries.py); Brier
decomposition, Krippendorff's alpha (evalmetrics.py); Herfindahl index
(sampling.py). Oracles are brute-force Python replicas of the textbook
formulas, computed inline."""

import math

import pytest
from pyspark.sql import functions as F


def _median(v):
    v = sorted(v)
    m = len(v)
    return v[m // 2] if m % 2 else (v[m // 2 - 1] + v[m // 2]) / 2


def test_kruskal_wallis_known(spark):
    from stackstac_spark.operators.nonparam import kruskal_wallis

    # no ties: H([1,2,3],[4,5,6],[7,8,9]) = 7.2 exactly
    rows = (
        [("a", x) for x in [1.0, 2.0, 3.0]]
        + [("b", x) for x in [4.0, 5.0, 6.0]]
        + [("c", x) for x in [7.0, 8.0, 9.0]]
    )
    df = spark.createDataFrame(rows, "j string, x double")
    r = kruskal_wallis(df, "x", "j").first()
    assert (r["k"], r["n"]) == (3, 9)
    assert r["h_stat"] == pytest.approx(7.2, abs=1e-6)
    # with ties, hand-computed: ranks 1.5,1.5,3.5,3.5,5.5,5.5 ->
    # R_a=6.5, R_b=14.5, H_raw=3.047619, C=1-18/210 -> H=3.333333
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0), ("b", 3.0)],
        "j string, x double",
    )
    assert kruskal_wallis(df2, "x", "j").first()["h_stat"] == pytest.approx(
        3.333333, abs=1e-5
    )
    # single treatment -> NULL; all-tied -> NULL (C = 0)
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "j string, x double")
    assert kruskal_wallis(one, "x", "j").first()["h_stat"] is None
    tied = spark.createDataFrame([("a", 1.0), ("b", 1.0)], "j string, x double")
    assert kruskal_wallis(tied, "x", "j").first()["h_stat"] is None
    # null/NaN excluded
    dirty = df.unionByName(
        spark.createDataFrame([("a", float("nan")), (None, 1.0)], "j string, x double")
    )
    assert dirty.count() == 11
    assert kruskal_wallis(dirty, "x", "j").first()["n"] == 9
    # guard
    cont = spark.range(0, 2000).select(
        (F.col("id") % 2).cast("string").alias("j"), F.rand(7).alias("x")
    )
    with pytest.raises(ValueError, match="max_distinct"):
        kruskal_wallis(cont, "x", "j", max_distinct=100)


def test_friedman_known(spark):
    from stackstac_spark.operators.nonparam import friedman_test

    # every block ranks t1<t2<t3 -> chi2 = 6.0 (scipy friedmanchisquare)
    rows = []
    for bi, (v1, v2, v3) in enumerate(zip([1.0, 2.0, 3.0], [2.0, 3.0, 4.0], [3.0, 4.0, 5.0])):
        rows += [(f"b{bi}", "t1", v1), (f"b{bi}", "t2", v2), (f"b{bi}", "t3", v3)]
    df = spark.createDataFrame(rows, "b string, j string, x double")
    r = friedman_test(df, "b", "j", "x").first()
    assert (r["k"], r["n_blocks"]) == (3, 3)
    assert r["chi2"] == pytest.approx(6.0, abs=1e-6)
    # incomplete block is excluded relationally
    incomplete = df.unionByName(
        spark.createDataFrame([("b9", "t1", 1.0)], "b string, j string, x double")
    )
    r2 = friedman_test(incomplete, "b", "j", "x").first()
    assert r2["n_blocks"] == 3 and r2["chi2"] == pytest.approx(6.0, abs=1e-6)
    # duplicate (block, treatment) raises
    dup = df.unionByName(
        spark.createDataFrame([("b0", "t1", 9.0)], "b string, j string, x double")
    )
    with pytest.raises(ValueError, match="duplicate"):
        friedman_test(dup, "b", "j", "x")
    # fully tied blocks -> NULL (C = 0)
    tied = spark.createDataFrame(
        [("b0", "t1", 1.0), ("b0", "t2", 1.0), ("b1", "t1", 2.0), ("b1", "t2", 2.0)],
        "b string, j string, x double",
    )
    assert friedman_test(tied, "b", "j", "x").first()["chi2"] is None


def test_wilcoxon_known(spark):
    from stackstac_spark.operators.nonparam import wilcoxon_signed_rank

    # d = [-1,1,-2,1,1]: |d| ranks 2.5 x4, 5; W+ = 7.5, W- = 7.5, z = 0
    df = spark.createDataFrame(
        list(zip([1.0, 2.0, 3.0, 4.0, 5.0], [2.0, 1.0, 5.0, 3.0, 4.0])),
        "a double, b double",
    )
    r = wilcoxon_signed_rank(df, "a", "b").first()
    assert r["n"] == 5
    assert (r["w_plus"], r["w_minus"]) == (7.5, 7.5)
    assert r["z"] == pytest.approx(0.0, abs=1e-9)
    # one-sided shift, no ties: d = [1,2,3] -> ranks 1,2,3, W+ = 6, W- = 0
    # z = (6 - 3*4/4)/sqrt(3*4*7/24) = 3/sqrt(3.5)
    up = spark.createDataFrame(
        [(2.0, 1.0), (4.0, 2.0), (7.0, 4.0)], "a double, b double"
    )
    r2 = wilcoxon_signed_rank(up, "a", "b").first()
    assert (r2["w_plus"], r2["w_minus"]) == (6.0, 0.0)
    assert r2["z"] == pytest.approx(3 / math.sqrt(3.5), abs=1e-6)
    # zero differences dropped (n = 0 -> NULL z)
    z = spark.createDataFrame([(1.0, 1.0), (2.0, 2.0)], "a double, b double")
    rz = wilcoxon_signed_rank(z, "a", "b").first()
    assert rz["n"] == 0 and rz["z"] is None


def test_cliffs_delta_brute(spark):
    from stackstac_spark.operators.nonparam import cliffs_delta

    A = [1.0, 2.0, 2.0, 5.0]
    B = [2.0, 3.0, 4.0]
    gt = sum(1 for a in A for b in B if a > b)
    lt = sum(1 for a in A for b in B if a < b)
    want = (gt - lt) / (len(A) * len(B))
    df = spark.createDataFrame(
        [("a", x) for x in A] + [("b", x) for x in B] + [("other", 9.0)],
        "s string, x double",
    )
    r = cliffs_delta(df, "x", "s", "a", "b").first()
    assert (r["n_a"], r["n_b"]) == (4, 3)  # 'other' side excluded
    assert r["delta"] == pytest.approx(want, abs=1e-6)
    # empty side -> NULL
    only_a = spark.createDataFrame([("a", 1.0)], "s string, x double")
    assert cliffs_delta(only_a, "x", "s", "a", "b").first()["delta"] is None
    # identical samples -> 0
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)], "s string, x double"
    )
    assert cliffs_delta(same, "x", "s", "a", "b").first()["delta"] == 0.0


def test_somers_d_brute(spark):
    from stackstac_spark.operators.nonparam import somers_d

    X = [1.0, 1.0, 2.0, 3.0, 3.0, 4.0]
    Y = [2.0, 1.0, 2.0, 3.0, 1.0, 4.0]
    C = D = TX = 0
    n = len(X)
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = X[i] - X[j], Y[i] - Y[j]
            if dx == 0:
                TX += 1
                continue
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
    want = (C - D) / (n * (n - 1) / 2 - TX)
    df = spark.createDataFrame(list(zip(X, Y)), "x double, y double")
    r = somers_d(df, "x", "y").first()
    assert (r["concordant"], r["discordant"]) == (C, D)
    assert r["d_yx"] == pytest.approx(want, abs=1e-6)
    # Gini identity: x = binary LABEL, y = score -> D_yx = 2*AUC - 1
    # (pairs tied on the label drop, leaving the n0*n1 cross-pairs).
    # Perfect separation -> 1; with score order flipped on one pair,
    # AUC = 3/4 -> D = 0.5
    sep = spark.createDataFrame(
        [(0.0, 0.1), (0.0, 0.2), (1.0, 0.8), (1.0, 0.9)], "x double, y double"
    )
    assert somers_d(sep, "x", "y").first()["d_yx"] == 1.0
    part = spark.createDataFrame(
        [(0.0, 0.1), (0.0, 0.85), (1.0, 0.8), (1.0, 0.9)], "x double, y double"
    )
    assert somers_d(part, "x", "y").first()["d_yx"] == pytest.approx(0.5, abs=1e-6)
    # constant x (all pairs tied on x) -> NULL; grouped keeps the group
    grp = spark.createDataFrame(
        [("g1", 1.0, 2.0), ("g1", 1.0, 3.0), ("g2", 1.0, 1.0), ("g2", 2.0, 2.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in somers_d(grp, "x", "y", ["g"]).collect()}
    assert set(got) == {"g1", "g2"}
    assert got["g1"]["d_yx"] is None and got["g2"]["d_yx"] == 1.0


def test_wasserstein_brute(spark):
    from stackstac_spark.operators.drift import wasserstein_1d

    A = [1.0, 2.0, 2.0, 4.0]
    B = [1.0, 3.0, 5.0, 5.0, 6.0]

    def w1(u, v):
        allv = sorted(set(u) | set(v))
        tot = 0.0
        for i in range(len(allv) - 1):
            fu = sum(1 for x in u if x <= allv[i]) / len(u)
            fv = sum(1 for x in v if x <= allv[i]) / len(v)
            tot += abs(fu - fv) * (allv[i + 1] - allv[i])
        return tot

    df = spark.createDataFrame(
        [("ref", x) for x in A] + [("g1", x) for x in B] + [("g2", x) for x in A],
        "g string, x double",
    )
    got = {r["group"]: r for r in wasserstein_1d(df, "x", "g", "ref").collect()}
    assert got["g1"]["w1"] == pytest.approx(w1(A, B), abs=1e-6)
    assert got["g2"]["w1"] == 0.0  # identical to reference
    with pytest.raises(ValueError, match="max_distinct"):
        big = spark.range(0, 3000).select(
            F.when(F.col("id") % 2 == 0, "ref").otherwise("g").alias("g"),
            F.rand(3).alias("x"),
        )
        wasserstein_1d(big, "x", "g", "ref", max_distinct=100)


def test_theil_sen_brute(spark):
    from stackstac_spark.operators.timeseries import theil_sen

    T = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    X = [2.0, 4.0, 5.0, 4.0, 8.0, 12.0]
    slopes = [
        (X[j] - X[i]) / (T[j] - T[i])
        for i in range(len(T))
        for j in range(i + 1, len(T))
    ]
    ws = _median(slopes)
    wi = _median([x - ws * t for t, x in zip(T, X)])
    df = spark.createDataFrame(list(zip(T, X)), "t double, x double")
    r = theil_sen(df, "t", "x").first()
    assert r["n_pairs"] == 15
    assert r["slope"] == pytest.approx(ws, abs=1e-6)
    assert r["intercept"] == pytest.approx(wi, abs=1e-6)
    # outlier robustness: one wild point doesn't move the slope
    Xo = list(X)
    Xo[3] = 1000.0
    ro = theil_sen(
        spark.createDataFrame(list(zip(T, Xo)), "t double, x double"), "t", "x"
    ).first()
    assert abs(ro["slope"]) < 10  # OLS slope would be ~ +60
    # duplicate timestamps raise; max_points raises
    dup = spark.createDataFrame([(1.0, 1.0), (1.0, 2.0)], "t double, x double")
    with pytest.raises(ValueError, match="duplicate"):
        theil_sen(dup, "t", "x")
    with pytest.raises(ValueError, match="max_points"):
        theil_sen(df, "t", "x", max_points=3)


def test_durbin_watson_brute(spark):
    from stackstac_spark.operators.timeseries import durbin_watson

    X = [2.0, 4.0, 5.0, 4.0, 8.0, 12.0]
    e = [x - sum(X) / len(X) for x in X]
    want = sum((e[i] - e[i - 1]) ** 2 for i in range(1, len(e))) / sum(
        v * v for v in e
    )
    df = spark.createDataFrame(
        list(zip([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], X)), "t double, x double"
    )
    assert durbin_watson(df, "t", "x").first()["dw"] == pytest.approx(want, abs=1e-6)
    # constant series -> NULL (zero variance); alternating -> dw near 4
    const = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "t double, x double")
    assert durbin_watson(const, "t", "x").first()["dw"] is None
    alt = spark.createDataFrame(
        [(float(i), float(1 if i % 2 else -1)) for i in range(20)],
        "t double, x double",
    )
    assert durbin_watson(alt, "t", "x").first()["dw"] > 3.5


def test_runs_test_brute(spark):
    from stackstac_spark.operators.timeseries import runs_test

    V = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.3, 5.0, 8.0, 7.0]
    mv = _median(V)
    sgn = [v > mv for v in V if v != mv]
    n1 = sum(sgn)
    n2 = len(sgn) - n1
    R = 1 + sum(1 for i in range(1, len(sgn)) if sgn[i] != sgn[i - 1])
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    df = spark.createDataFrame(
        [(float(i), v) for i, v in enumerate(V)], "t double, x double"
    )
    r = runs_test(df, "t", "x").first()
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, R)
    assert r["z"] == pytest.approx((R - mu) / math.sqrt(var), abs=1e-6)
    # perfectly alternating -> max runs, strongly positive z
    alt = spark.createDataFrame(
        [(float(i), float(10 if i % 2 else 1)) for i in range(12)],
        "t double, x double",
    )
    ra = runs_test(alt, "t", "x").first()
    assert ra["n_runs"] == 12 and ra["z"] > 3


def test_brier_decomposition_brute(spark):
    from stackstac_spark.operators.evalmetrics import brier_decomposition

    P = [0.1, 0.15, 0.8, 0.85, 0.4, 0.45, 0.9, 0.05]
    Y = [0, 1, 1, 1, 0, 1, 1, 0]
    bins = 5
    bidx = [min(bins - 1, int(p * bins)) for p in P]
    N = len(P)
    brier = sum((p - y) ** 2 for p, y in zip(P, Y)) / N
    obar = sum(Y) / N
    rel = res = 0.0
    for b in set(bidx):
        idx = [i for i in range(N) if bidx[i] == b]
        nb = len(idx)
        pb = sum(P[i] for i in idx) / nb
        ob = sum(Y[i] for i in idx) / nb
        rel += nb * (pb - ob) ** 2 / N
        res += nb * (ob - obar) ** 2 / N
    df = spark.createDataFrame(
        list(zip(P, [float(y) for y in Y])), "p double, y double"
    )
    r = brier_decomposition(df, "p", "y", bins=5).first()
    assert r["brier"] == pytest.approx(brier, abs=1e-6)
    assert r["reliability"] == pytest.approx(rel, abs=1e-6)
    assert r["resolution"] == pytest.approx(res, abs=1e-6)
    assert r["uncertainty"] == pytest.approx(obar * (1 - obar), abs=1e-6)
    # out-of-range scores excluded
    dirty = df.unionByName(spark.createDataFrame([(1.5, 1.0)], "p double, y double"))
    assert brier_decomposition(dirty, "p", "y", bins=5).first()["n"] == 8
    # binned identity: brier(binned) = REL - RES + UNC when p constant per bin
    Pc = [0.1, 0.1, 0.5, 0.5, 0.9, 0.9]
    Yc = [0.0, 1.0, 0.0, 1.0, 1.0, 1.0]
    rc = brier_decomposition(
        spark.createDataFrame(list(zip(Pc, Yc)), "p double, y double"), "p", "y", bins=10
    ).first()
    assert rc["brier"] == pytest.approx(
        rc["reliability"] - rc["resolution"] + rc["uncertainty"], abs=1e-6
    )


def test_krippendorff_brute(spark):
    from stackstac_spark.operators.evalmetrics import krippendorff_alpha

    ratings = (
        [(1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "a"), (3, "b")]
        + [(4, "a"), (4, "a"), (4, "a")]
        + [(5, "b")]  # unpairable
    )
    pair = [
        (u, v)
        for u, v in ratings
        if sum(1 for uu, _ in ratings if uu == u) >= 2
    ]
    n = len(pair)
    units = sorted(set(u for u, _ in pair))
    cats = sorted(set(v for _, v in pair))
    do_sum = 0.0
    for u in units:
        vals = [v for uu, v in pair if uu == u]
        nu = len(vals)
        for c in cats:
            nuc = vals.count(c)
            do_sum += nuc * (nu - nuc) / (nu - 1)
    d_o = do_sum / n
    de = sum(
        sum(1 for _, v in pair if v == c) * (n - sum(1 for _, v in pair if v == c))
        for c in cats
    ) / (n * (n - 1))
    want = 1 - d_o / de
    df = spark.createDataFrame(ratings, "u int, v string")
    r = krippendorff_alpha(df, "u", "v").first()
    assert (r["n_units"], r["n_pairable"]) == (4, n)
    assert r["alpha"] == pytest.approx(want, abs=1e-6)
    # perfect agreement -> 1
    perf = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "u int, v string"
    )
    assert krippendorff_alpha(perf, "u", "v").first()["alpha"] == 1.0
    # single-category data -> NULL (D_e = 0)
    mono = spark.createDataFrame([(1, "a"), (1, "a")], "u int, v string")
    assert krippendorff_alpha(mono, "u", "v").first()["alpha"] is None


def test_herfindahl_brute(spark):
    from stackstac_spark.operators.sampling import herfindahl_index

    cnt = {"a": 5, "b": 3, "c": 2}
    tot = sum(cnt.values())
    hhi = sum((v / tot) ** 2 for v in cnt.values())
    hnorm = (hhi - 1 / 3) / (1 - 1 / 3)
    df = spark.createDataFrame(
        [(c,) for c, v in cnt.items() for _ in range(v)], "c string"
    )
    r = herfindahl_index(df, "c").first()
    assert r["k"] == 3
    assert r["hhi"] == pytest.approx(hhi, abs=1e-6)
    assert r["hhi_norm"] == pytest.approx(hnorm, abs=1e-6)
    # weighted mass gives the same answer as replicated rows
    hw = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0), ("c", 2.0)], "c string, w double"
    )
    assert herfindahl_index(hw, "c", weight_col="w").first()["hhi"] == pytest.approx(
        hhi, abs=1e-6
    )
    # monopoly -> hhi 1, norm 1; k = 1 -> norm NULL
    mono = spark.createDataFrame([("a",), ("a",)], "c string")
    rm = herfindahl_index(mono, "c").first()
    assert rm["hhi"] == 1.0 and rm["hhi_norm"] is None
