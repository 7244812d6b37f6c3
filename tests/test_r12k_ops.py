"""Known-value tests for the r12 eleventh sub-wave: binary-segmentation
changepoint + Gumbel extreme-value fit (timeseries.py), Chapman
capture-recapture (dedup.py), uniform goodness-of-fit (sampling.py),
transition entropy (graph.py)."""

import math
import random
import statistics
from collections import Counter

import pytest
from pyspark.sql import functions as F


def test_binary_segment_known(spark):
    from stackstac_spark.operators.timeseries import binary_segment

    random.seed(30)
    xs = [random.gauss(0, 1) for _ in range(60)] + [
        random.gauss(3, 1) for _ in range(40)
    ]
    df = spark.createDataFrame(
        [("a", i, float(x)) for i, x in enumerate(xs)], "g string, t int, x double"
    )
    r = binary_segment(df, "t", "x", ["g"]).first()
    n = len(xs)
    S, Q = [0.0], [0.0]
    for x in xs:
        S.append(S[-1] + x)
        Q.append(Q[-1] + x * x)
    best = None
    for k in range(1, n):
        sse = (Q[k] - S[k] ** 2 / k) + (
            (Q[n] - Q[k]) - (S[n] - S[k]) ** 2 / (n - k)
        )
        if best is None or sse < best[0] - 1e-12:
            best = (sse, k - 1)
    sse_tot = Q[n] - S[n] ** 2 / n
    assert r["split_t"] == best[1]  # the planted break at index 59
    assert r["sse_split"] == pytest.approx(best[0], abs=1e-5)
    assert r["sse_total"] == pytest.approx(sse_tot, abs=1e-5)
    assert r["reduction"] == pytest.approx(1 - best[0] / sse_tot, abs=1e-6)
    assert r["reduction"] > 0.5
    # single-point group emits NULL split, not a crash
    one = spark.createDataFrame([("b", 0, 1.0)], "g string, t int, x double")
    r1 = binary_segment(one, "t", "x", ["g"]).first()
    assert r1["n"] == 1 and r1["split_t"] is None
    with pytest.raises(ValueError, match="max_points"):
        binary_segment(df, "t", "x", ["g"], max_points=5)


def test_gumbel_fit_known(spark):
    from stackstac_spark.operators.timeseries import gumbel_fit

    random.seed(31)
    maxima = [max(random.gauss(10, 2) for _ in range(50)) for _ in range(200)]
    df = spark.createDataFrame([(float(m),) for m in maxima], "x double")
    r = gumbel_fit(df, "x").first()
    m, s = statistics.mean(maxima), statistics.stdev(maxima)
    beta = s * math.sqrt(6) / math.pi
    mu = m - 0.5772156649015329 * beta
    assert r["n"] == 200
    assert r["loc"] == pytest.approx(mu, abs=1e-6)
    assert r["scale"] == pytest.approx(beta, abs=1e-6)
    assert r["q_ret"] == pytest.approx(
        mu - beta * math.log(-math.log(0.99)), abs=1e-6
    )
    # constant input -> NULL fit
    const = spark.createDataFrame([(1.0,), (1.0,)], "x double")
    assert gumbel_fit(const, "x").first()["scale"] is None
    with pytest.raises(ValueError, match="quantile"):
        gumbel_fit(df, "x", quantile=1.5)


def test_capture_recapture_known(spark):
    from stackstac_spark.operators.dedup import capture_recapture

    pop = list(range(1000))
    random.seed(32)
    A, B = set(random.sample(pop, 300)), set(random.sample(pop, 250))
    m = len(A & B)
    dfa = spark.createDataFrame([(k,) for k in A], "k int")
    dfb = spark.createDataFrame([(k,) for k in B], "k int")
    r = capture_recapture(dfa, dfb, "k").first()
    assert (r["n_a"], r["n_b"], r["n_both"]) == (300, 250, m)
    assert r["n_hat"] == pytest.approx(301 * 251 / (m + 1) - 1, abs=1e-6)
    var = 301 * 251 * (300 - m) * (250 - m) / ((m + 1) ** 2 * (m + 2))
    assert r["se_hat"] == pytest.approx(math.sqrt(var), abs=1e-6)
    assert 800 < r["n_hat"] < 1300  # recovers the true 1000 within ~2 SE
    # duplicates inside a sample don't inflate the counts
    dup = spark.createDataFrame([(k,) for k in list(A) * 3], "k int")
    assert capture_recapture(dup, dfb, "k").first()["n_a"] == 300
    # empty side -> NULL estimate
    empty = spark.createDataFrame([], "k int")
    assert capture_recapture(empty, dfb, "k").first()["n_hat"] is None


def test_uniformity_gof_known(spark):
    from stackstac_spark.operators.sampling import uniformity_gof

    random.seed(33)
    bk = [random.randint(0, 9) for _ in range(1000)]
    df = spark.createDataFrame([(b,) for b in bk], "b int")
    r = uniformity_gof(df, "b").first()
    cnt = Counter(bk)
    e = len(bk) / len(cnt)
    chi2 = sum((c - e) ** 2 / e for c in cnt.values())
    assert (r["k"], r["n"]) == (len(cnt), len(bk))
    assert r["chi2"] == pytest.approx(chi2, abs=1e-5)
    # a healthy 10-bucket hash: chi2 well under, say, 3x the dof
    assert r["chi2"] < 27
    # a grossly biased bucketing scores far above dof
    biased = spark.createDataFrame([(b % 2 * b % 3,) for b in range(1000)], "b int")
    rb = uniformity_gof(biased, "b").first()
    assert rb["chi2"] > 100
    # single bucket -> NULL
    one = spark.createDataFrame([(1,), (1,)], "b int")
    assert uniformity_gof(one, "b").first()["chi2"] is None


def test_transition_entropy_known(spark):
    from stackstac_spark.operators.graph import transition_entropy

    ev = []
    random.seed(34)
    for s in range(50):
        cur = random.choice("ab")
        for j in range(10):
            ev.append((s, j, cur))
            cur = cur if random.random() < 0.8 else ("b" if cur == "a" else "a")
    df = spark.createDataFrame(ev, "s int, o int, it string")
    r = transition_entropy(df, "s", ["o"], "it").first()
    seqs = {}
    for s, o, it in sorted(ev):
        seqs.setdefault(s, []).append(it)
    cij = Counter()
    for items in seqs.values():
        for a, b in zip(items, items[1:]):
            cij[(a, b)] += 1
    N = sum(cij.values())
    ci, cj = Counter(), Counter()
    for (a, b), c in cij.items():
        ci[a] += c
        cj[b] += c
    hc = -sum(c / N * math.log(c / ci[a]) for (a, b), c in cij.items())
    hm = -sum(c / N * math.log(c / N) for c in cj.values())
    assert r["n_transitions"] == N
    assert r["h_cond"] == pytest.approx(hc, abs=1e-6)
    assert r["h_marginal"] == pytest.approx(hm, abs=1e-6)
    assert r["predictability"] == pytest.approx(1 - hc / hm, abs=1e-6)
    # a deterministic cycle is perfectly predictable
    det = spark.createDataFrame(
        [(0, j, "ab"[j % 2]) for j in range(20)], "s int, o int, it string"
    )
    rd = transition_entropy(det, "s", ["o"], "it").first()
    assert rd["h_cond"] == 0.0 and rd["predictability"] == 1.0
