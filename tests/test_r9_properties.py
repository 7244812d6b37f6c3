"""Property tests for the r9 operators: random inputs vs brute-force
replays — the Hypothesis-style rigor layer above the closed-form unit
tests (deterministic seeds, no flakiness)."""

import itertools
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _brute_triangles(edges):
    """Per-node triangle counts by explicit enumeration."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts = {}
    for u, v, w in itertools.combinations(nodes, 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_count_random_graphs_vs_brute_force(spark):
    from stackstac_spark.operators.graph import triangle_count

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.randint(6, 14)
        p = rng.choice([0.25, 0.4, 0.6])
        edges = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < p
        ]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "id_a INT, id_b INT")
        got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}
        dist = {
            r["node"]: r["n_tri"]
            for r in triangle_count(df, broadcast_threshold=0).collect()
        }
        expect = _brute_triangles(edges)
        assert got == expect, (trial, n, p)
        assert dist == expect, (trial, n, p)


def test_hll_estimate_accuracy_sweep(spark):
    from stackstac_spark.operators.sketch import hll_distinct

    for n in (50, 500, 3000):
        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(n)], "v STRING"
        ).repartition(6)
        r = hll_distinct(df, "v", p=6).collect()[0]
        # m=64: ~13% stddev; allow generous 4-sigma plus linear-counting zone
        assert abs(r["est_distinct"] - n) / n < 0.55, (n, r["est_distinct"])


def test_kmv_set_ops_jaccard_sweep(spark):
    from stackstac_spark.operators.sketch import kmv_set_ops

    rng = random.Random(7)
    n = 600
    overlap = 200
    rows = [("a", f"u{i}") for i in range(n)] + [
        ("b", f"u{i}") for i in range(n - overlap, 2 * n - overlap)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g STRING, v STRING").repartition(5)
    r = kmv_set_ops(df, "v", "g", k=256).collect()[0]
    true_union = 2 * n - overlap
    true_j = overlap / true_union
    assert abs(r["est_union"] - true_union) / true_union < 0.25
    assert abs(r["est_jaccard"] - true_j) < 0.15


def test_naive_bayes_agrees_with_python_replay(spark):
    from stackstac_spark.operators.mlfit import naive_bayes_classify

    rng = random.Random(99)
    vocab_a = ["alpha", "beta", "gamma"]
    vocab_b = ["delta", "epsilon", "zeta"]
    shared = ["common", "word"]
    rows = []
    for i in range(40):
        cls = "a" if i % 2 == 0 else "b"
        pool = (vocab_a if cls == "a" else vocab_b) * 3 + shared
        text = " ".join(rng.choice(pool) for _ in range(rng.randint(3, 9)))
        rows.append((i, text, cls))
    df = spark.createDataFrame(rows, "doc_id INT, text STRING, lang STRING")
    got = {r["doc_id"]: r for r in naive_bayes_classify(df).collect()}

    # python replay of the sparse formulation
    from collections import Counter, defaultdict

    ctab = defaultdict(Counter)
    nc = Counter()
    for i, text, cls in rows:
        nc[cls] += 1
        ctab[cls].update(text.split())
    vocab = {t for c in ctab.values() for t in c}
    V, N = len(vocab), len(rows)
    for i, text, cls in rows:
        toks = text.split()
        best = None
        for c in sorted(nc):
            tot = sum(ctab[c].values())
            s = math.log(nc[c] / N) + len(toks) * math.log(1.0 / (tot + V))
            for t in toks:
                s += math.log(ctab[c].get(t, 0) + 1.0)
            key = (-round(s, 6), c)
            if best is None or key < best[0]:
                best = (key, c, s)
        assert got[i]["pred"] == best[1], i
        assert got[i]["logp"] == round(best[2], 4), i
