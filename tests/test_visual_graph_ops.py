"""r8 wave-5 operators: perceptual average-hash near-dup, k-core peeling."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _media_rows(ids, perturb=()):
    from stackstac_spark.operators.multimodal import fake_payload

    rows = []
    for i in ids:
        rows.append((i, "image", "image/fake", 32, 24, 1, fake_payload(i)))
    for i in perturb:
        base = bytearray(fake_payload(i))
        for k in range(0, 997, 151):
            base[k] = (base[k] + 32) % 256
        rows.append((1000 + i, "image", "image/fake", 32, 24, 1, bytes(base)))
    return rows


def test_average_hash_identical_and_perturbed(spark):
    from stackstac_spark.operators.multimodal import MEDIA_SCHEMA, average_hash
    from stackstac_spark.session import local_df

    media = local_df(spark, _media_rows(range(6), perturb=[2]), MEDIA_SCHEMA)
    h = {r["media_id"]: (r["w0"], r["w1"], r["w2"], r["w3"]) for r in average_hash(media).collect()}
    assert all(0 <= w < 65536 for ws in h.values() for w in ws)
    # deterministic
    h2 = {r["media_id"]: (r["w0"], r["w1"], r["w2"], r["w3"]) for r in average_hash(media).collect()}
    assert h == h2

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    # perturbed variant is much closer to its source than to others
    d_same = ham(h[2], h[1002])
    d_other = min(ham(h[i], h[1002]) for i in h if i not in (2, 1002))
    assert d_same < d_other
    assert d_same <= 8


def test_average_hash_grid_param(spark):
    # Regression (r9 ADVICE): grid used to be accepted but the output was
    # hardcoded to four 16-bit words, so any grid != 8 crashed inside
    # mapInPandas. The word-column count must follow grid²/16, invalid
    # grids must be rejected UP FRONT, and near-dup detection must consume
    # any accepted grid's words.
    import pytest as _pytest

    from stackstac_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        average_hash,
        hamming_near_dups,
    )
    from stackstac_spark.session import local_df

    media = local_df(spark, _media_rows(range(4), perturb=[1]), MEDIA_SCHEMA)
    for grid, n_words in ((4, 1), (8, 4), (12, 9)):
        out = average_hash(media, grid=grid)
        assert out.columns == ["media_id"] + [f"w{i}" for i in range(n_words)]
        rows = out.collect()
        assert len(rows) == 5
        assert all(0 <= rows[0][f"w{i}"] < 65536 for i in range(n_words))

    # grid*grid % 16 != 0 would silently drop bits — rejected eagerly
    for bad in (3, 6, 10, 0):
        with _pytest.raises(ValueError):
            average_hash(media, grid=bad)

    # hamming_near_dups derives the word set from the input columns
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_near_dups(average_hash(media, grid=12), max_hamming=12).collect()
    }
    assert (1, 1001) in pairs


def test_hamming_near_dups_finds_planted_only(spark):
    from stackstac_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        average_hash,
        hamming_near_dups,
    )
    from stackstac_spark.session import local_df

    media = local_df(spark, _media_rows(range(8), perturb=[0, 4]), MEDIA_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dups(average_hash(media), max_hamming=8).collect()
    }
    assert (0, 1000) in pairs and (4, 1004) in pairs
    assert all(b - a == 1000 for a, b in pairs)  # no unrelated pair sneaks in


def test_kcore_peels_cascading_chain(spark):
    from stackstac_spark.operators.graph import kcore

    # triangle 0-1-2 plus a 4-node tail 2-10-11-12 (peels one per round)
    edges = [(0, 1), (1, 2), (0, 2), (2, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r["node"]: r["core_deg"] for r in kcore(df, k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_kcore_whole_graph_survives_or_dies(spark):
    from stackstac_spark.operators.graph import kcore

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cycle, ["id_a", "id_b"])
    assert kcore(df, k=2).count() == 6  # cycle IS its own 2-core
    assert kcore(df, k=3).count() == 0  # and vanishes at k=3
    with pytest.raises(ValueError):
        kcore(df, k=0)


def test_kcore_matches_networkx_style_brute(spark):
    import random

    from stackstac_spark.operators.graph import kcore

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]

    # brute-force peel
    def brute(k):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return {n: len(v) for n, v in adj.items() if v}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    for k in (2, 3):
        got = {r["node"]: r["core_deg"] for r in kcore(df, k=k).collect()}
        assert got == brute(k), k
