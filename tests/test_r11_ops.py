"""Known-value tests for the r11 operator wave: average_precision,
cohens_kappa, mcnemar_test, spearman_rho, js_divergence, cramers_v,
chao1_richness, good_turing_counts, degree_assortativity, plus the
roc_auc scale controls (bins= / max_distinct=)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _pearson(x, y):
    x, y = np.asarray(x, float), np.asarray(y, float)
    n = len(x)
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = math.sqrt(
        (n * (x * x).sum() - x.sum() ** 2) * (n * (y * y).sum() - y.sum() ** 2)
    )
    return num / den


def _avg_ranks(v):
    """Tie-averaged ranks, 1-based (scipy rankdata 'average')."""
    v = np.asarray(v, float)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    i = 0
    sv = v[order]
    while i < len(v):
        j = i
        while j + 1 < len(v) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


# --- roc_auc scale controls -------------------------------------------------


def test_roc_auc_guard_and_binned(spark):
    from stackstac_spark.operators.evalmetrics import roc_auc

    cont = spark.range(0, 4000).select(
        F.rand(7).alias("score"), (F.col("id") % 2).cast("int").alias("label")
    )
    with pytest.raises(ValueError, match="max_distinct"):
        roc_auc(cont, "score", "label", max_distinct=500)
    exact = roc_auc(cont, "score", "label", max_distinct=None).first()["auc"]
    binned = roc_auc(cont, "score", "label", bins=512).first()["auc"]
    assert abs(exact - binned) < 0.01
    # discrete scores pass the guard untouched
    disc = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0), (0.5, 1), (0.3, 0), (0.1, 0)],
        "score double, label int",
    )
    assert roc_auc(disc, "score", "label").first()["auc"] == 0.84375


def test_average_precision_vs_numpy(spark):
    from stackstac_spark.operators.evalmetrics import average_precision

    scores = [0.9, 0.8, 0.8, 0.6, 0.5, 0.5, 0.3, 0.1]
    labels = [1, 0, 1, 1, 0, 1, 0, 0]
    df = spark.createDataFrame(list(zip(scores, labels)), "s double, y int")
    got = average_precision(df, "s", "y").first()

    # sklearn step formula over distinct thresholds descending
    thr = sorted(set(scores), reverse=True)
    npos = sum(labels)
    ap, prev_r = 0.0, 0.0
    for t in thr:
        tp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 1)
        fp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 0)
        p, r = tp / (tp + fp), tp / npos
        ap += (r - prev_r) * p
        prev_r = r
    assert got["n_pos"] == npos and got["n_neg"] == len(labels) - npos
    assert got["ap"] == pytest.approx(ap, abs=2e-6)
    # no positives -> NULL
    neg = spark.createDataFrame([(0.4, 0), (0.2, 0)], "s double, y int")
    assert average_precision(neg, "s", "y").first()["ap"] is None


def test_cohens_kappa_known(spark):
    from stackstac_spark.operators.evalmetrics import cohens_kappa

    # classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohens_kappa(df, "a", "b").first()
    n = 50
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / n**2
    assert got["n"] == n
    assert got["po"] == pytest.approx(po, abs=1e-6)
    assert got["pe"] == pytest.approx(pe, abs=1e-6)
    assert got["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=2e-6)
    # degenerate: both raters constant and equal -> pe=1 -> NULL
    const = spark.createDataFrame([("y", "y")] * 4, "a string, b string")
    assert cohens_kappa(const, "a", "b").first()["kappa"] is None
    # null ratings excluded
    dirty = spark.createDataFrame(rows + [(None, "y"), ("y", None)], "a string, b string")
    assert cohens_kappa(dirty, "a", "b").first()["n"] == n


def test_mcnemar_known(spark):
    from stackstac_spark.operators.evalmetrics import mcnemar_test

    # A right/B wrong: 8; A wrong/B right: 2; both right: 5; both wrong: 3
    rows = (
        [(1, 0, 1)] * 8 + [(0, 1, 1)] * 2 + [(1, 1, 1)] * 5 + [(0, 0, 1)] * 3
    )
    df = spark.createDataFrame(rows, "pa int, pb int, y int")
    got = mcnemar_test(df, "pa", "pb", "y").first()
    assert (got["n"], got["a_only"], got["b_only"]) == (18, 8, 2)
    assert got["chi2"] == pytest.approx((abs(8 - 2) - 1) ** 2 / 10, abs=1e-6)
    # never disagree -> NULL
    same = spark.createDataFrame([(1, 1, 1), (0, 0, 1)], "pa int, pb int, y int")
    assert mcnemar_test(same, "pa", "pb", "y").first()["chi2"] is None


def test_spearman_rho_vs_numpy(spark):
    from stackstac_spark.operators.drift import spearman_rho

    x = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    y = [5.0, 6.0, 7.0, 7.0, 4.0, 9.0]  # ties in y
    df = spark.createDataFrame(list(zip(x, y)), "a double, b double")
    got = spearman_rho(df, "a", "b").first()
    want = _pearson(_avg_ranks(x), _avg_ranks(y))
    assert got["n"] == 6
    assert got["rho"] == pytest.approx(want, abs=2e-6)
    # constant column -> NULL; null/NaN rows dropped
    dirty = spark.createDataFrame(
        list(zip(x, y)) + [(None, 1.0), (float("nan"), 2.0), (7.0, None)],
        "a double, b double",
    )
    assert spearman_rho(dirty, "a", "b").first()["n"] == 6
    const = spark.createDataFrame([(1.0, 2.0), (1.0, 5.0)], "a double, b double")
    assert spearman_rho(const, "a", "b").first()["rho"] is None
    # guard
    cont = spark.range(0, 3000).select(
        F.rand(3).alias("a"), F.rand(4).alias("b")
    )
    with pytest.raises(ValueError, match="max_distinct"):
        spearman_rho(cont, "a", "b", max_distinct=100)


def test_js_divergence_vs_numpy(spark):
    from stackstac_spark.operators.drift import js_divergence

    rows = (
        [("s1", "a")] * 4 + [("s1", "b")] * 2
        + [("s2", "b")] * 3 + [("s2", "c")] * 3
    )
    df = spark.createDataFrame(rows, "src string, tok string")
    got = {r["src"]: r for r in js_divergence(df, "src", "tok").collect()}

    from collections import Counter

    toks = [t for _, t in rows]
    vocab = sorted(set(toks))
    gq = np.array([Counter(toks)[t] / len(toks) for t in vocab])
    for src in ("s1", "s2"):
        mine = [t for s, t in rows if s == src]
        p = np.array([Counter(mine)[t] / len(mine) for t in vocab])
        m = (p + gq) / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            jsd = 0.5 * np.nansum(np.where(p > 0, p * np.log2(p / m), 0)) + \
                  0.5 * np.nansum(np.where(gq > 0, gq * np.log2(gq / m), 0))
        assert got[src]["jsd"] == pytest.approx(jsd, abs=2e-6), src
        assert got[src]["n_tokens"] == len(mine)
    # identical distribution to global -> jsd 0
    same = spark.createDataFrame([("s", "a"), ("s", "b")], "src string, tok string")
    assert js_divergence(same, "src", "tok").first()["jsd"] == 0.0


def test_cramers_v_known(spark):
    from stackstac_spark.operators.drift import cramers_v

    # perfectly associated 2x2 -> V = 1; independent -> V ~ 0
    assoc = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, "a string, b string"
    )
    r = cramers_v(assoc, "a", "b").first()
    assert r["v"] == pytest.approx(1.0, abs=1e-6)
    indep = spark.createDataFrame(
        [("x", "u")] * 5 + [("x", "v")] * 5 + [("y", "u")] * 5 + [("y", "v")] * 5,
        "a string, b string",
    )
    r = cramers_v(indep, "a", "b").first()
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6) and r["v"] == pytest.approx(0.0, abs=1e-6)
    # constant column -> NULL v
    const = spark.createDataFrame([("x", "u"), ("x", "v")], "a string, b string")
    assert cramers_v(const, "a", "b").first()["v"] is None


def test_chao1_known(spark):
    from stackstac_spark.operators.textstats import chao1_richness

    # tokens: a a a b b c d  -> V=4, f1=2 (c,d), f2=1 (b)
    df = spark.createDataFrame([("g", "a a a b b c d")], "g string, text string")
    r = chao1_richness(df, group_cols=["g"]).first()
    assert (r["v_obs"], r["f1"], r["f2"]) == (4, 2, 1)
    assert r["chao1"] == pytest.approx(4 + 2 * 1 / (2 * 2), abs=1e-6)
    # f2 = 0 stays defined (bias-corrected form)
    df2 = spark.createDataFrame([("g", "a b c")], "g string, text string")
    r2 = chao1_richness(df2, group_cols=["g"]).first()
    assert r2["chao1"] == pytest.approx(3 + 3 * 2 / 2, abs=1e-6)


def test_good_turing_known(spark):
    from stackstac_spark.operators.textstats import good_turing_counts

    # counts: a:3, b:2, c:2, d:1, e:1, f:1 -> N1=3, N2=2, N3=1; N=10
    df = spark.createDataFrame(
        [("a a a b b c c d e f",)], "text string"
    )
    rows = {r["r"]: r for r in good_turing_counts(df, max_r=3).collect()}
    assert rows[1]["n_r"] == 3 and rows[2]["n_r"] == 2 and rows[3]["n_r"] == 1
    assert rows[1]["r_star"] == pytest.approx(2 * 2 / 3, abs=1e-6)
    assert rows[2]["r_star"] == pytest.approx(3 * 1 / 2, abs=1e-6)
    assert rows[3]["r_star"] is None  # N4 = 0
    assert rows[1]["p_r"] == pytest.approx((2 * 2 / 3) / 10, abs=1e-6)
    # trigram mode: "a b c d" has trigrams "a b c","b c d"; doc2 repeats one
    tri = spark.createDataFrame([("a b c d",), ("a b c",)], "text string")
    rows3 = {r["r"]: r for r in good_turing_counts(tri, max_r=3, ngram=3).collect()}
    assert rows3[1]["n_r"] == 1 and rows3[2]["n_r"] == 1  # "b c d":1, "a b c":2
    assert rows3[1]["r_star"] == pytest.approx(2 * 1 / 1, abs=1e-6)
    # first_k mode: the K smallest frequency classes regardless of
    # magnitude — scale-robust on N×-replicated corpora (r12 fix). With
    # counts {30, 20, 10} an absolute max_r=8 filter is empty; first_k=2
    # keeps the two rarest classes.
    big = spark.createDataFrame(
        [(" ".join(["a"] * 30 + ["b"] * 20 + ["c"] * 10),)], "text string"
    )
    assert good_turing_counts(big, max_r=8).count() == 0
    fk = {r["r"]: r for r in good_turing_counts(big, first_k=2).collect()}
    assert set(fk) == {10, 20} and fk[10]["n_r"] == 1
    with pytest.raises(ValueError, match="first_k"):
        good_turing_counts(big, first_k=0)


def test_degree_assortativity_known(spark):
    from stackstac_spark.operators.graph import degree_assortativity

    # star K1,3: every edge joins deg-3 to deg-1 -> r = -1
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a int, id_b int"
    )
    r = degree_assortativity(star).first()
    assert r["n_edges"] == 3
    assert r["assortativity"] == pytest.approx(-1.0, abs=1e-6)
    # cycle: all degrees equal -> zero variance -> NULL
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "id_a int, id_b int"
    )
    assert degree_assortativity(cyc).first()["assortativity"] is None
    # path P4 vs numpy Pearson over both orientations
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a int, id_b int")
    deg = {1: 1, 2: 2, 3: 2, 4: 1}
    ends = [(1, 2), (2, 3), (3, 4)]
    dx = [deg[u] for u, v in ends] + [deg[v] for u, v in ends]
    dy = [deg[v] for u, v in ends] + [deg[u] for u, v in ends]
    want = _pearson(dx, dy)
    assert degree_assortativity(path).first()["assortativity"] == pytest.approx(
        want, abs=2e-6
    )
