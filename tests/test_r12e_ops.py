"""Known-value tests for the r12 fifth sub-wave: Welch's t-test,
Brown-Forsythe variance homogeneity, Dunn's post-hoc (nonparam.py)."""

import collections
import math

import pytest
from pyspark.sql import functions as F


def _median(v):
    v = sorted(v)
    m = len(v)
    return v[m // 2] if m % 2 else (v[m // 2 - 1] + v[m // 2]) / 2


def test_welch_ttest_known(spark):
    from stackstac_spark.operators.nonparam import welch_ttest

    A = [1.0, 2.0, 3.0, 4.0, 10.0]
    B = [2.0, 2.5, 3.0, 3.5]
    na, nb = len(A), len(B)
    ma, mb = sum(A) / na, sum(B) / nb
    va = sum((x - ma) ** 2 for x in A) / (na - 1)
    vb = sum((x - mb) ** 2 for x in B) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    df = spark.createDataFrame(
        [("a", x) for x in A] + [("b", x) for x in B] + [("other", 99.0)],
        "s string, x double",
    )
    r = welch_ttest(df, "x", "s", "a", "b").first()
    assert (r["n_a"], r["n_b"]) == (5, 4)  # 'other' excluded
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["dof"] == pytest.approx(dof, abs=1e-5)
    assert r["mean_a"] == pytest.approx(ma, abs=1e-6)
    # n < 2 on a side, or zero variance on both -> NULL
    small = spark.createDataFrame([("a", 1.0), ("b", 1.0), ("b", 2.0)], "s string, x double")
    assert welch_ttest(small, "x", "s", "a", "b").first()["t_stat"] is None
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)], "s string, x double"
    )
    assert welch_ttest(const, "x", "s", "a", "b").first()["t_stat"] is None
    # grouped path
    grp = df.withColumn("g", F.lit("g1"))
    rg = welch_ttest(grp, "x", "s", "a", "b", ["g"]).first()
    assert rg["g"] == "g1" and rg["t_stat"] == pytest.approx(t, abs=1e-6)


def test_levene_bf_known(spark):
    from stackstac_spark.operators.nonparam import levene_bf

    G = {
        "a": [1.0, 2.0, 3.0, 4.0, 10.0],
        "b": [2.0, 2.5, 3.0, 3.5],
        "c": [0.0, 5.0, 10.0, 15.0],
    }
    Z = {j: [abs(x - _median(v)) for x in v] for j, v in G.items()}
    N = sum(len(v) for v in G.values())
    k = len(G)
    zbar = sum(sum(z) for z in Z.values()) / N
    num = sum(len(z) * (sum(z) / len(z) - zbar) ** 2 for z in Z.values())
    den = sum(sum((x - sum(z) / len(z)) ** 2 for x in z) for z in Z.values())
    W = (N - k) / (k - 1) * num / den
    df = spark.createDataFrame(
        [(j, x) for j, v in G.items() for x in v], "j string, x double"
    )
    r = levene_bf(df, "x", "j").first()
    assert (r["k"], r["n"]) == (3, N)
    assert r["w_stat"] == pytest.approx(W, abs=1e-5)
    # single treatment -> NULL; identical spreads -> W = 0
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "j string, x double")
    assert levene_bf(one, "x", "j").first()["w_stat"] is None
    eq = spark.createDataFrame(
        [("a", 0.0), ("a", 2.0), ("b", 10.0), ("b", 12.0)], "j string, x double"
    )
    # both groups have |z| = (1, 1): SSW = 0 -> NULL (degenerate, not W=inf)
    assert levene_bf(eq, "x", "j").first()["w_stat"] is None
    with pytest.raises(ValueError, match="max_distinct"):
        big = spark.range(0, 3000).select(
            (F.col("id") % 2).cast("string").alias("j"), F.rand(11).alias("x")
        )
        levene_bf(big, "x", "j", max_distinct=100)


def test_dunn_posthoc_known(spark):
    from stackstac_spark.operators.nonparam import dunn_posthoc

    vals = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0),
        ("b", 4.0), ("b", 5.0), ("b", 6.0),
        ("c", 2.0), ("c", 5.0),
    ]
    allv = [x for _, x in vals]
    cnt = collections.Counter(allv)
    rk, cum = {}, 0
    for val in sorted(cnt):
        c = cnt[val]
        rk[val] = cum + (c + 1) / 2
        cum += c
    R = collections.defaultdict(list)
    for j, x in vals:
        R[j].append(rk[x])
    N = len(vals)
    ties = sum(c**3 - c for c in cnt.values())
    var0 = N * (N + 1) / 12 - ties / (12 * (N - 1))
    df = spark.createDataFrame(vals, "j string, x double")
    got = {(r["treat_a"], r["treat_b"]): r for r in dunn_posthoc(df, "x", "j").collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ja, jb), r in got.items():
        ra = sum(R[ja]) / len(R[ja])
        rb = sum(R[jb]) / len(R[jb])
        z = (ra - rb) / math.sqrt(var0 * (1 / len(R[ja]) + 1 / len(R[jb])))
        assert r["z"] == pytest.approx(z, abs=1e-6), (ja, jb)
        assert r["mean_rank_a"] == pytest.approx(ra, abs=1e-6)
    # all-tied values -> variance term 0 -> NULL z
    tied = spark.createDataFrame([("a", 1.0), ("b", 1.0)], "j string, x double")
    assert dunn_posthoc(tied, "x", "j").first()["z"] is None
