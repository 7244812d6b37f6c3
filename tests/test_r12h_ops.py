"""Known-value tests for the r12 eighth sub-wave: Holm-Bonferroni
step-down (drift.py), two-sample Cramér-von Mises (drift.py),
Jonckheere-Terpstra ordered trend (nonparam.py), pairwise vocabulary
overlap and OOV rate (textstats.py)."""

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


def test_holm_bonferroni_known(spark):
    from stackstac_spark.operators.drift import holm_bonferroni

    random.seed(1)
    tests = [("t%02d" % i, round(random.random() ** 2, 4)) for i in range(15)]
    df = spark.createDataFrame(tests, "test string, p double")
    got = [
        (r["test"], r["holm_rank"], r["p_adj"], r["rejected"])
        for r in holm_bonferroni(df, "p").collect()
    ]
    m = len(tests)
    srt = sorted(tests, key=lambda t: (t[1], t[0]))
    run, rejall, exp = 0.0, True, []
    for i, (name, p) in enumerate(srt, 1):
        run = max(run, min(1.0, (m - i + 1) * p))
        rejall = rejall and (p <= 0.05 / (m - i + 1))
        exp.append((name, i, round(run, 6), rejall))
    assert got == exp
    # p_adj is monotone nondecreasing in rank (the step-down invariant)
    adjs = [x[2] for x in got]
    assert adjs == sorted(adjs)
    # Holm rejects a subset of what plain Bonferroni at alpha would
    bonf = {name for name, p in tests if p <= 0.05 / m}
    holm_rej = {x[0] for x in got if x[3]}
    assert bonf <= holm_rej
    with pytest.raises(ValueError, match="alpha"):
        holm_bonferroni(df, "p", alpha=1.5)


def test_cvm_two_sample_known(spark):
    from stackstac_spark.operators.drift import cvm_two_sample

    random.seed(2)
    rows = [("A", round(random.gauss(0, 1), 2)) for _ in range(200)] + [
        ("B", round(random.gauss(0.3, 1.2), 2)) for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    r = cvm_two_sample(df, "x", "g", "A", "B").first()
    na, nb = 200, 150
    N = na + nb
    ca = Counter(x for g, x in rows if g == "A")
    cb = Counter(x for g, x in rows if g == "B")
    fa = fb = 0
    s = 0.0
    for v in sorted(set(ca) | set(cb)):
        fa += ca[v]
        fb += cb[v]
        s += (ca[v] + cb[v]) * (fa / na - fb / nb) ** 2
    t = na * nb / N**2 * s
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["cvm_t"] == pytest.approx(t, abs=1e-6)
    assert r["t_mean"] == pytest.approx((1 + 1 / N) / 6, abs=1e-6)
    # identical samples -> T = 0
    same = [("A", float(i % 5)) for i in range(50)] + [
        ("B", float(i % 5)) for i in range(50)
    ]
    r0 = cvm_two_sample(
        spark.createDataFrame(same, "g string, x double"), "x", "g", "A", "B"
    ).first()
    assert r0["cvm_t"] == 0.0
    # empty group -> NULL statistic
    ra = cvm_two_sample(
        spark.createDataFrame([("A", 1.0)], "g string, x double"), "x", "g", "A", "B"
    ).first()
    assert ra["cvm_t"] is None


def test_jonckheere_known(spark):
    from stackstac_spark.operators.nonparam import jonckheere_trend

    random.seed(4)
    rows = [
        (g, float(random.randint(0, 20) + 3 * gi))
        for gi, g in enumerate(["g1", "g2", "g3"])
        for _ in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    r = jonckheere_trend(df, "x", "g").first()
    groups = ["g1", "g2", "g3"]
    data = {g: [x for gg, x in rows if gg == g] for g in groups}
    J = 0.0
    for i in range(3):
        for j in range(i + 1, 3):
            for x in data[groups[i]]:
                for y in data[groups[j]]:
                    J += 1.0 if x < y else (0.5 if x == y else 0.0)
    N = len(rows)
    s2 = sum(len(v) ** 2 for v in data.values())
    s3 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in data.values())
    meanJ = (N * N - s2) / 4
    varJ = (N * N * (2 * N + 3) - s3) / 72
    assert (r["n"], r["n_groups"]) == (N, 3)
    assert r["j_stat"] == pytest.approx(J, abs=1e-6)
    assert r["j_mean"] == pytest.approx(meanJ, abs=1e-6)
    assert r["z"] == pytest.approx((J - meanJ) / math.sqrt(varJ), abs=1e-6)
    # the fixture has an upward shift -> significantly positive z
    assert r["z"] > 3
    with pytest.raises(ValueError, match="max_cells"):
        jonckheere_trend(df, "x", "g", max_cells=5)


def _vocab_docs():
    random.seed(4)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    return [
        (i, "dom%d" % (i % 3), " ".join(random.choice(words) for _ in range(30)))
        for i in range(60)
    ]


def test_vocab_overlap_known(spark):
    from stackstac_spark.operators.textstats import vocab_overlap

    docs = _vocab_docs()
    df = spark.createDataFrame(docs, "doc_id long, dom string, text string")
    got = [
        (r["domain_a"], r["domain_b"], r["size_a"], r["size_b"], r["common"], r["jaccard"])
        for r in vocab_overlap(df, "dom", top_k=5).collect()
    ]
    pc = {}
    for _, d, t in docs:
        pc.setdefault(d, Counter()).update(w for w in t.lower().split() if w)
    tops = {
        d: set(w for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
        for d, c in pc.items()
    }
    ds = sorted(tops)
    exp = []
    for i in range(len(ds)):
        for j in range(i + 1, len(ds)):
            A, B = tops[ds[i]], tops[ds[j]]
            c = len(A & B)
            exp.append((ds[i], ds[j], len(A), len(B), c, round(c / len(A | B), 6)))
    assert got == exp
    # disjoint vocabularies still emit their pair row with jaccard 0
    dj = spark.createDataFrame(
        [(1, "a", "xx yy"), (2, "b", "zz ww")], "doc_id long, dom string, text string"
    )
    r = vocab_overlap(dj, "dom", top_k=5).collect()
    assert len(r) == 1 and r[0]["common"] == 0 and r[0]["jaccard"] == 0.0


def test_oov_rate_known(spark):
    from stackstac_spark.operators.textstats import oov_rate

    docs = _vocab_docs()
    df = spark.createDataFrame(docs, "doc_id long, dom string, text string")
    got = {
        r["domain"]: (r["total_tokens"], r["oov_tokens"], r["oov_rate"])
        for r in oov_rate(df, "dom", ref_top_k=4).collect()
    }
    pc = {}
    for _, d, t in docs:
        pc.setdefault(d, Counter()).update(w for w in t.lower().split() if w)
    gc = Counter()
    for c in pc.values():
        gc.update(c)
    vocab = set(w for w, _ in sorted(gc.items(), key=lambda kv: (-kv[1], kv[0]))[:4])
    exp = {}
    for d, c in pc.items():
        tot = sum(c.values())
        oov = sum(v for w, v in c.items() if w not in vocab)
        exp[d] = (tot, oov, round(oov / tot, 6))
    assert got == exp
    # a vocab covering everything -> oov_rate 0 everywhere
    full = oov_rate(df, "dom", ref_top_k=100).collect()
    assert all(r["oov_rate"] == 0.0 for r in full)


def test_oov_rate_tokenless_domain_row(spark):
    from stackstac_spark.operators.textstats import oov_rate

    docs = [(0, "a", "xx yy"), (1, "b", "   ")]
    df = spark.createDataFrame(docs, "doc_id long, dom string, text string")
    got = {r["domain"]: (r["total_tokens"], r["oov_tokens"], r["oov_rate"])
           for r in oov_rate(df, "dom", ref_top_k=10).collect()}
    assert got["a"] == (2, 0, 0.0)
    assert got["b"] == (0, 0, None)
