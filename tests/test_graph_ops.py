"""operators/graph.py: PageRank vs a pure-Python replay of the same fixed
synchronous iteration."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _py_pagerank(edges, iters=5, d=0.85):
    adj, deg = {}, {}
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    for s, t in und:
        adj.setdefault(t, []).append(s)
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted(deg)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        r = {
            v: (1 - d) / n + d * sum(r[s] / deg[s] for s in adj.get(v, []))
            for v in nodes
        }
    return {v: round(x, 6) for v, x in r.items()}


def test_pagerank_matches_python(spark):
    from stackstac_spark.operators.graph import pagerank

    # star (hub 0) + triangle + isolated pair
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    # both physical strategies must agree with the replay and each other
    got = {r["node"]: r["rank"] for r in pagerank(pairs, iters=5).collect()}
    got_loop = {
        r["node"]: r["rank"]
        for r in pagerank(pairs, iters=5, driver_threshold=0).collect()
    }
    expect = _py_pagerank(edges)
    assert got == expect
    assert got_loop == expect
    # hub of the star outranks its leaves; triangle members are symmetric
    assert got[0] > got[1] and got[1] == got[2] == got[3] == got[4]
    assert got[10] == got[11] == got[12]
    assert abs(sum(got.values()) - 1.0) < 1e-4  # ranks ≈ probability mass


def test_pagerank_validation(spark):
    from stackstac_spark.operators.graph import pagerank

    pairs = spark.createDataFrame([(1, 2)], "id_a LONG, id_b LONG")
    with pytest.raises(ValueError):
        pagerank(pairs, iters=0)
    with pytest.raises(ValueError):
        pagerank(pairs, damping=1.5)
    assert pagerank(pairs.filter("id_a < 0")).count() == 0  # empty graph


def _py_label_prop(edges, iters=4):
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    adj = {}
    for s, t in und:
        adj.setdefault(t, []).append(s)
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, nbrs in adj.items():
            counts = {}
            for s in nbrs:
                counts[labels[s]] = counts.get(labels[s], 0) + 1
            new[v] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = new
    return labels


def test_label_propagation_matches_python(spark):
    from stackstac_spark.operators.graph import label_propagation

    # two triangles joined by ONE bridge (3-13) + two disjoint triangles +
    # an isolated pair — both physical paths must equal the Python replay
    edges = [
        (1, 2), (2, 3), (1, 3),
        (11, 12), (12, 13), (11, 13),
        (3, 13),
        (30, 31), (31, 32), (30, 32),
        (40, 41), (41, 42), (40, 42),
        (20, 21),
    ]
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    got = {r["node"]: r["community"]
           for r in label_propagation(pairs, iters=4).collect()}
    got_loop = {r["node"]: r["community"]
                for r in label_propagation(pairs, iters=4, driver_threshold=0).collect()}
    expect = _py_label_prop(edges, iters=4)
    assert got == expect
    assert got_loop == expect
    # disjoint triangles converge to distinct min-id communities
    assert got[30] == got[31] == got[32] == 30
    assert got[40] == got[41] == got[42] == 40
    # isolated pair: synchronous LP swaps labels each round (the classic
    # 2-cycle oscillation) — after an EVEN number of rounds each node is
    # back to its own label; the replay must reproduce that artifact too
    assert got[20] == 20 and got[21] == 21
    # each triangle of the bridged barbell is internally uniform
    assert got[1] == got[2] == got[3]
    assert got[11] == got[12]


def test_label_propagation_validation(spark):
    from stackstac_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame([(1, 2)], "id_a LONG, id_b LONG")
    with pytest.raises(ValueError):
        label_propagation(pairs, iters=0)
