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
