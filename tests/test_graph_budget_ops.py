"""r9 wave-2 operators: Adamic-Adar link prediction, HITS hub/authority,
bipartite one-mode projection, largest-remainder token budgeting — brute
Python oracles, dual-strategy agreement, and the hub/degeneracy guards."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _brute_aa(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if common:
                out[(u, v)] = round(sum(1.0 / math.log(len(adj[w])) for w in common), 6)
    return out


def test_adamic_adar_vs_brute(spark):
    import random

    from stackstac_spark.operators.graph import adamic_adar

    rng = random.Random(17)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(50)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["id_a"], r["id_b"]): r["aa"] for r in adamic_adar(df).collect()}
    assert got == pytest.approx(_brute_aa(edges), abs=1e-6)


def test_adamic_adar_excludes_existing_edges_and_hubs(spark):
    from stackstac_spark.operators.graph import adamic_adar

    # star around 0 plus edge (1,2): (1,2) is an edge -> excluded;
    # (3,4) share hub 0 -> scored 1/ln(4)
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["id_a"], r["id_b"]): r["aa"] for r in adamic_adar(df).collect()}
    assert (1, 2) not in got
    assert got[(3, 4)] == pytest.approx(round(1 / math.log(4), 6), abs=1e-9)
    # hub guard: capping degree below the hub's removes all its wedges
    got2 = adamic_adar(df, max_degree=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in got2} == set()


def _brute_hits(edges, iters):
    outs, ins, nodes = {}, {}, set()
    for s, t in set(edges):
        outs.setdefault(s, []).append(t)
        ins.setdefault(t, []).append(s)
        nodes.update((s, t))
    h = {v: 1.0 for v in nodes}
    for _ in range(iters):
        a = {v: sum(h[u] for u in ins.get(v, ())) for v in nodes}
        sa = sum(a.values()) or 1.0
        a = {v: x / sa for v, x in a.items()}
        h = {v: sum(a[t] for t in outs.get(v, ())) for v in nodes}
        sh = sum(h.values()) or 1.0
        h = {v: x / sh for v, x in h.items()}
    return h, a


def test_hits_vs_brute_and_dual_strategy(spark):
    import random

    from stackstac_spark.operators.graph import hits_scores

    rng = random.Random(23)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(45)})
    edges = [(s, t) for s, t in edges if s != t]
    df = spark.createDataFrame(edges, ["src", "dst"])
    want_h, want_a = _brute_hits(edges, 5)
    for thr in (200_000, 0):  # driver path AND distributed path
        got = {r["node"]: (r["hub"], r["authority"])
               for r in hits_scores(df, iters=5, driver_threshold=thr).collect()}
        assert set(got) == set(want_h), thr
        for v in want_h:
            assert got[v][0] == pytest.approx(want_h[v], abs=1e-6), (thr, v)
            assert got[v][1] == pytest.approx(want_a[v], abs=1e-6), (thr, v)


def test_hits_pure_hub_and_authority(spark):
    from stackstac_spark.operators.graph import hits_scores

    # 1,2,3 all point at 9: 9 is the only authority, 1-3 equal hubs
    df = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], ["src", "dst"])
    got = {r["node"]: r for r in hits_scores(df, iters=3).collect()}
    assert got[9]["authority"] == pytest.approx(1.0)
    assert got[9]["hub"] == 0.0
    for v in (1, 2, 3):
        assert got[v]["hub"] == pytest.approx(1 / 3, abs=1e-6)
        assert got[v]["authority"] == 0.0


def test_bipartite_projection_brute_and_hub_guard(spark):
    from stackstac_spark.operators.graph import bipartite_projection

    rows = [
        ("a", "x"), ("b", "x"), ("c", "x"),        # x shared by a,b,c
        ("a", "y"), ("b", "y"),                    # y shared by a,b
        ("c", "z"),                                # z only c
        ("a", "x"),                                # duplicate incidence ignored
    ]
    df = spark.createDataFrame(rows, ["l", "r"])
    got = {(r["l_a"], r["l_b"]): r["weight"]
           for r in bipartite_projection(df, "l", "r").collect()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    # dropping rights with degree > 2 removes x entirely
    got2 = {(r["l_a"], r["l_b"]): r["weight"]
            for r in bipartite_projection(df, "l", "r", max_right_degree=2).collect()}
    assert got2 == {("a", "b"): 1}
    # min_weight prunes the tail
    got3 = {(r["l_a"], r["l_b"]): r["weight"]
            for r in bipartite_projection(df, "l", "r", min_weight=2).collect()}
    assert got3 == {("a", "b"): 2}


def test_token_budget_sums_exactly_and_is_proportional(spark):
    from stackstac_spark.operators.sampling import token_budget

    rows = [("a", 10), ("a", 5), ("b", 30), ("c", 7), ("d", 0)]
    df = spark.createDataFrame(rows, ["g", "w"])
    out = {r["group"]: r["alloc"] for r in token_budget(df, "g", "w", 1000).collect()}
    assert "d" not in out  # zero weight gets nothing
    assert sum(out.values()) == 1000
    # Hamilton quotas: 15/52, 30/52, 7/52 of 1000 = 288.46, 576.92, 134.61
    # floors 288+576+134 = 998, two seats by remainder: .92 (b) and .61 (c)
    assert out == {"a": 288, "b": 577, "c": 135}


def test_token_budget_hand_tie_break(spark):
    from stackstac_spark.operators.sampling import token_budget

    # equal weights, budget not divisible: remainders tie -> smallest
    # group ids win the leftover seats
    rows = [("g1", 1), ("g2", 1), ("g3", 1)]
    df = spark.createDataFrame(rows, ["g", "w"])
    out = {r["group"]: r["alloc"] for r in token_budget(df, "g", "w", 10).collect()}
    assert out == {"g1": 4, "g2": 3, "g3": 3}
    with pytest.raises(ValueError):
        token_budget(df, "g", "w", -1)
