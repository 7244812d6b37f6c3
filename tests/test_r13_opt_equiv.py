"""Equivalence guards for the round-13 optimization restructures.

The wedge-scoring kernel (`graph._wedge_kernel_route`) replaces the
distributed [sym union → deg agg → wedge self-join → groupBy → degree
joins → anti join] pipeline for bounded integer-id graphs. These tests pin
the kernel row-for-row against the distributed path on adversarial
fixtures (hubs, duplicate/reversed edges, max_degree guards), and pin the
fallback routing (non-integer ids, over-threshold graphs) so the
distributed path stays reachable and correct.
"""

import math
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _random_edges(seed, n_nodes=40, n_draw=120):
    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_draw)]
    return [(a, b) for a, b in edges if a != b]


def _force_distributed(monkeypatch):
    import stackstac_spark.operators.graph as G

    monkeypatch.setattr(G, "_wedge_kernel_route", lambda *a, **k: None)


@pytest.mark.parametrize("seed", [3, 11])
@pytest.mark.parametrize("max_degree", [None, 6])
def test_adamic_adar_dual_path_agreement(spark, monkeypatch, seed, max_degree):
    from stackstac_spark.operators.graph import adamic_adar

    df = spark.createDataFrame(_random_edges(seed), ["id_a", "id_b"])
    fast = adamic_adar(df, max_degree=max_degree)
    rows_fast = sorted(map(tuple, fast.collect()))
    _force_distributed(monkeypatch)
    slow = adamic_adar(df, max_degree=max_degree)
    rows_slow = sorted(map(tuple, slow.collect()))
    assert fast.schema.fieldNames() == slow.schema.fieldNames()
    assert [r[:2] for r in rows_fast] == [r[:2] for r in rows_slow]
    # aa is a float sum whose operand order neither path pins; both agree
    # to well below the operator's round_to=6 output rounding
    for rf, rs in zip(rows_fast, rows_slow):
        assert rf[2] == pytest.approx(rs[2], abs=1e-9)


@pytest.mark.parametrize("seed", [5, 19])
@pytest.mark.parametrize("max_degree", [None, 5])
def test_neighbor_jaccard_dual_path_agreement(spark, monkeypatch, seed, max_degree):
    from stackstac_spark.operators.graph import neighbor_jaccard

    df = spark.createDataFrame(_random_edges(seed), ["id_a", "id_b"])
    fast = neighbor_jaccard(df, max_degree=max_degree)
    rows_fast = sorted(map(tuple, fast.collect()))
    _force_distributed(monkeypatch)
    slow = neighbor_jaccard(df, max_degree=max_degree)
    rows_slow = sorted(map(tuple, slow.collect()))
    assert fast.schema.fieldNames() == slow.schema.fieldNames()
    # n_common / degrees are integers: the rows must match EXACTLY
    assert rows_fast == rows_slow


def test_wedge_kernel_falls_back_on_string_ids(spark):
    # non-integer ids must route to the distributed path and still score
    from stackstac_spark.operators.graph import neighbor_jaccard

    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c")], ["id_a", "id_b"]
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in neighbor_jaccard(df).collect()
    }
    # a and d share neighbors {b, c}: J = 2 / (2 + 2 - 2) = 1.0
    assert got[("a", "d")] == (2, 1.0)
    assert got[("b", "c")] == (2, 1.0)


def test_wedge_kernel_falls_back_over_threshold(spark, monkeypatch):
    # an over-threshold edge list routes to the distributed path
    import stackstac_spark.operators.graph as G

    calls = {}
    orig = G._wedge_kernel_route

    def spy(und, max_degree, mode, round_to, id_a, id_b, threshold=8):
        calls["threshold"] = threshold
        return orig(und, max_degree, mode, round_to, id_a, id_b, threshold=8)

    monkeypatch.setattr(G, "_wedge_kernel_route", spy)
    edges = _random_edges(7, n_nodes=30, n_draw=60)  # >8 distinct edges
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = G.adamic_adar(df).collect()
    assert calls, "kernel route was not consulted"
    # distributed result must equal brute force
    adj = {}
    und = {(min(a, b), max(a, b)) for a, b in edges}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {}
    for u in sorted(adj):
        for v in sorted(adj):
            if u >= v or (u, v) in und:
                continue
            common = adj[u] & adj[v]
            if common:
                exp[(u, v)] = round(
                    sum(1.0 / math.log(len(adj[w])) for w in common), 6
                )
    got = {(r["id_a"], r["id_b"]): r["aa"] for r in out}
    assert got == pytest.approx(exp, abs=1e-6)


def test_wedge_kernel_empty_and_selfloop_only(spark):
    from pyspark.sql import types as T

    from stackstac_spark.operators.graph import adamic_adar, neighbor_jaccard

    schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )
    empty = spark.createDataFrame([], schema)
    assert adamic_adar(empty).collect() == []
    assert neighbor_jaccard(empty).collect() == []
    loops = spark.createDataFrame([(1, 1), (2, 2)], schema)
    assert adamic_adar(loops).collect() == []
    assert neighbor_jaccard(loops).collect() == []
