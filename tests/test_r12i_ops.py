"""Known-value tests for the r12 ninth sub-wave: Ljung-Box portmanteau
(timeseries.py), Page's L ordered-block trend (nonparam.py), Burrows'
Delta + TF-IDF domain cosine (textstats.py), Moran's I spatial
autocorrelation (spatial.py)."""

import math
import random
import statistics
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F


def test_ljung_box_known(spark):
    from stackstac_spark.operators.timeseries import ljung_box

    random.seed(9)
    series, rows = {}, []
    for g in ("s1", "s2"):
        xs = [random.gauss(0, 1) for _ in range(40)]
        for i in range(1, 40):
            xs[i] = 0.5 * xs[i - 1] + xs[i]
        series[g] = xs
        rows += [(g, i, float(xs[i])) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    got = {
        (r["g"], r["lag"]): (r["r"], r["q"])
        for r in ljung_box(df, "t", "x", ["g"]).collect()
    }
    exp = {}
    for g, xs in series.items():
        n, m = len(xs), sum(xs) / len(xs)
        ss = sum((v - m) ** 2 for v in xs)
        qacc = 0.0
        for k in (1, 2, 3):
            r = sum((xs[i] - m) * (xs[i - k] - m) for i in range(k, n)) / ss
            qacc += r * r / (n - k)
            exp[(g, k)] = (round(r, 6), round(n * (n + 2) * qacc, 6))
    assert got == exp
    # the AR(1) fixture has real autocorrelation -> large Q at lag 3
    assert all(q > 7.8 for (_, lag), (_, q) in got.items() if lag == 3)
    # duplicate timestamps raise
    dup = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0)], "g string, t int, x double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        ljung_box(dup, "t", "x", ["g"])
    with pytest.raises(ValueError, match="max_lag"):
        ljung_box(df, "t", "x", ["g"], max_lag=0)


def test_page_l_known(spark):
    from stackstac_spark.operators.nonparam import page_l_test

    random.seed(10)
    blocks, k = 30, 4
    rows, data = [], {}
    for b in range(blocks):
        vals = [random.random() + 0.3 * j for j in range(k)]
        data[b] = vals
        for j in range(k):
            rows.append((b, "trt%d" % j, float(vals[j])))
    df = spark.createDataFrame(rows, "b int, trt string, x double")
    r = page_l_test(df, "b", "trt", "x").first()
    R = [0.0] * k
    for vals in data.values():
        order = sorted(range(k), key=lambda j: vals[j])
        for rank, j in enumerate(order, 1):
            R[j] += rank
    L = sum((j + 1) * R[j] for j in range(k))
    meanL = blocks * k * (k + 1) ** 2 / 4
    varL = blocks * (k**3 - k) ** 2 / (144 * (k - 1))
    assert (r["n_blocks"], r["n_treatments"]) == (blocks, k)
    assert r["l_stat"] == pytest.approx(L, abs=1e-6)
    assert r["l_mean"] == pytest.approx(meanL, abs=1e-6)
    assert r["z"] == pytest.approx((L - meanL) / math.sqrt(varL), abs=1e-6)
    assert r["z"] > 3  # the fixture builds in an upward trend
    # incomplete blocks are dropped: removing one treatment from one
    # block reduces n_blocks by exactly 1
    df2 = df.filter(~((F.col("b") == 0) & (F.col("trt") == "trt0")))
    assert page_l_test(df2, "b", "trt", "x").first()["n_blocks"] == blocks - 1
    with pytest.raises(ValueError, match="2 treatments"):
        page_l_test(df.filter(F.col("trt") == "trt0"), "b", "trt", "x")


def _style_docs():
    random.seed(11)
    words = ["the", "of", "and", "to", "a", "in", "is", "it"]
    docs = []
    for i in range(90):
        g = "g%d" % (i % 3)
        bias = i % 3
        ws = [
            words[min(7, max(0, int(random.gauss(bias * 1.2 + 2, 2))))]
            for _ in range(40)
        ]
        docs.append((i, g, " ".join(ws)))
    return docs


def test_burrows_delta_known(spark):
    from stackstac_spark.operators.textstats import burrows_delta

    docs = _style_docs()
    df = spark.createDataFrame(docs, "doc_id long, g string, text string")
    got = {
        (r["group_a"], r["group_b"]): (r["n_terms"], r["delta"])
        for r in burrows_delta(df, "g", top_k=8).collect()
    }
    cnt = defaultdict(Counter)
    for _, g, t in docs:
        cnt[g].update(t.split())
    gtot = {g: sum(c.values()) for g, c in cnt.items()}
    gl = Counter()
    for c in cnt.values():
        gl.update(c)
    vocab = [w for w, _ in sorted(gl.items(), key=lambda kv: (-kv[1], kv[0]))[:8]]
    freq = {(g, w): cnt[g][w] / gtot[g] for g in cnt for w in vocab}
    zs, kept = {}, []
    for w in vocab:
        fs = [freq[(g, w)] for g in sorted(cnt)]
        mu, sd = statistics.mean(fs), statistics.stdev(fs)
        if sd > 0:
            kept.append(w)
            for g in cnt:
                zs[(g, w)] = (freq[(g, w)] - mu) / sd
    gs = sorted(cnt)
    exp = {}
    for i in range(3):
        for j in range(i + 1, 3):
            ds = [abs(zs[(gs[i], w)] - zs[(gs[j], w)]) for w in kept]
            exp[(gs[i], gs[j])] = (len(kept), round(sum(ds) / len(ds), 6))
    assert got == exp
    # a group's delta to itself-in-disguise is near 0: duplicate g0 as g9
    dup = docs + [(1000 + i, "g9", t) for i, g, t in docs if g == "g0"]
    d2 = spark.createDataFrame(dup, "doc_id long, g string, text string")
    r2 = {
        (r["group_a"], r["group_b"]): r["delta"]
        for r in burrows_delta(d2, "g", top_k=8).collect()
    }
    assert r2[("g0", "g9")] == min(r2.values())


def test_tfidf_domain_cosine_known(spark):
    from stackstac_spark.operators.textstats import tfidf_domain_cosine

    docs = _style_docs()
    df = spark.createDataFrame(docs, "doc_id long, g string, text string")
    got = {
        (r["domain_a"], r["domain_b"]): r["cosine"]
        for r in tfidf_domain_cosine(df, "g", top_k=8).collect()
    }
    cnt = defaultdict(Counter)
    for _, g, t in docs:
        cnt[g].update(t.split())
    gl = Counter()
    for c in cnt.values():
        gl.update(c)
    vocab = [w for w, _ in sorted(gl.items(), key=lambda kv: (-kv[1], kv[0]))[:8]]
    N = len(docs)
    dfreq = Counter()
    for _, _, t in docs:
        for w in set(t.split()):
            dfreq[w] += 1
    idf = {w: math.log(N / dfreq[w]) for w in vocab}
    vecs = {
        g: {w: cnt[g][w] * idf[w] for w in vocab if cnt[g][w] > 0} for g in cnt
    }
    gs = sorted(cnt)
    for i in range(3):
        for j in range(i + 1, 3):
            a, b = vecs[gs[i]], vecs[gs[j]]
            dot = sum(a[w] * b.get(w, 0) for w in a)
            na = math.sqrt(sum(v * v for v in a.values()))
            nb = math.sqrt(sum(v * v for v in b.values()))
            assert got[(gs[i], gs[j])] == pytest.approx(dot / (na * nb), abs=1e-6)


def test_morans_i_known(spark):
    from stackstac_spark.operators.spatial import morans_i

    random.seed(12)
    cells = [
        (y, x, float(y // 3 + random.random() * 0.3))
        for y in range(10)
        for x in range(10)
    ]
    df = spark.createDataFrame(cells, "y int, x int, v double")
    r = morans_i(df, "y", "x", "v").first()
    m = sum(v for _, _, v in cells) / len(cells)
    zmap = {(y, x): v - m for y, x, v in cells}
    num, W = 0.0, 0
    for (y, x), zi in zmap.items():
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if (y + dy, x + dx) in zmap:
                num += zi * zmap[(y + dy, x + dx)]
                W += 1
    ss = sum(z * z for z in zmap.values())
    assert (r["n_cells"], r["n_neighbor_pairs"]) == (100, W)
    assert r["morans_i"] == pytest.approx(len(cells) / W * num / ss, abs=1e-6)
    assert r["morans_i"] > 0.5  # banded fixture -> strong autocorrelation
    assert r["expected_i"] == pytest.approx(-1 / 99, abs=1e-6)
    # checkerboard -> strongly NEGATIVE I
    chk = spark.createDataFrame(
        [(y, x, float((y + x) % 2)) for y in range(8) for x in range(8)],
        "y int, x int, v double",
    )
    assert morans_i(chk, "y", "x", "v").first()["morans_i"] == -1.0
    # duplicate cells raise
    with pytest.raises(ValueError, match="duplicate"):
        morans_i(
            spark.createDataFrame(
                [(0, 0, 1.0), (0, 0, 2.0), (0, 1, 1.0)], "y int, x int, v double"
            ),
            "y",
            "x",
            "v",
        )


def test_burrows_delta_degenerate_pair_row(spark):
    from stackstac_spark.operators.textstats import burrows_delta

    # two groups with IDENTICAL texts: every word's cross-group frequency
    # sd is 0, no word survives -> the pair row still appears as (0, NULL)
    docs = [(0, "a", "x y z x"), (1, "b", "x y z x")]
    df = spark.createDataFrame(docs, "doc_id long, g string, text string")
    r = burrows_delta(df, "g", top_k=5).collect()
    assert len(r) == 1
    assert r[0]["n_terms"] == 0 and r[0]["delta"] is None


def test_tfidf_domain_cosine_disjoint_zero(spark):
    from stackstac_spark.operators.textstats import tfidf_domain_cosine

    docs = [(0, "a", "aa bb aa"), (1, "b", "cc dd cc")]
    df = spark.createDataFrame(docs, "doc_id long, g string, text string")
    r = tfidf_domain_cosine(df, "g", top_k=10).collect()
    assert len(r) == 1 and r[0]["cosine"] == 0.0
