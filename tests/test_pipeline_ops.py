"""Tests for the training-data pipeline operators: dedup, similarity, text
stats, multimodal plumbing, streaming ingest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "The  quick brown fox jumps over the lazy dog"),  # dup after normalize
    (3, "the quick brown fox jumps over the lazy cat"),  # near-dup
    (4, "completely different text about spark engines and data"),
    (5, "el rapido zorro marron salta sobre el perro la que de los"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_exact_dedup(spark, docs_df):
    from stackstac_spark.operators.dedup import duplicate_mapping, exact_duplicates

    groups = exact_duplicates(docs_df, sample_ids=2).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.canonical_id == 0 and g.n_copies == 3 and g.id_sample == [0, 1]
    # default output is bounded: no per-group id array
    assert "ids" not in exact_duplicates(docs_df).columns
    # the full mapping comes back as a join, one row per dropped duplicate
    mapping = sorted(
        (r.doc_id, r.canonical_id) for r in duplicate_mapping(docs_df).collect()
    )
    assert mapping == [(1, 0), (2, 0)]


def test_exact_dedup_viral_group_stays_bounded(spark):
    """A fingerprint with 1e5 copies: groups row stays O(1), the mapping has
    n-1 rows — nothing materializes a 1e5-element array."""
    from stackstac_spark.operators.dedup import duplicate_mapping, exact_duplicates

    n = 100_000
    viral = spark.range(n).selectExpr("id AS doc_id", "'boiler plate text' AS text")
    groups = exact_duplicates(viral, sample_ids=3).collect()
    assert len(groups) == 1
    assert groups[0].n_copies == n
    assert groups[0].canonical_id == 0
    assert groups[0].id_sample == [0, 1, 2]
    assert duplicate_mapping(viral).count() == n - 1


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    from stackstac_spark.operators.dedup import jaccard_similarity, minhash_lsh_candidates

    cands = minhash_lsh_candidates(docs_df, num_hashes=16, bands=8)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (0, 1) in pairs and (0, 2) in pairs  # exact dups always collide
    assert (0, 3) in pairs or (1, 3) in pairs  # near-dup should band-collide
    verified = jaccard_similarity(docs_df, cands, threshold=0.5)
    vd = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert vd[(0, 1)] == 1.0
    assert 0.5 <= vd[(0, 3)] < 1.0
    assert not any(4 in p or 5 in p for p in vd)


def test_span_dedup_matches_python_oracle(spark, docs_df):
    """span_dedup vs a brute-force interval-union oracle: every k-window
    string that occurs in >=2 docs marks its k token positions covered."""
    from stackstac_spark.operators.dedup import span_dedup

    k = 4
    toks = {d: t.lower().split(" ") for d, t in DOCS}
    wins: dict[str, set[int]] = {}
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            wins.setdefault(" ".join(t[i : i + k]), set()).add(d)
    covered = {d: set() for d in toks}
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            if len(wins[" ".join(t[i : i + k])]) >= 2:
                covered[d].update(range(i, i + k))
    got = {r.doc_id: r for r in span_dedup(docs_df, k=k).collect()}
    assert set(got) == set(toks)
    for d, t in toks.items():
        assert got[d].n_tokens == len(t)
        assert got[d].n_dup_tokens == len(covered[d]), d
        assert got[d].dup_frac == pytest.approx(
            round(len(covered[d]) / max(len(t), 1), 6)
        )
    # sanity on the fixture itself: the exact dups cover fully, the unique
    # doc not at all
    assert got[0].dup_frac == 1.0 and got[1].dup_frac == 1.0
    assert got[4].n_dup_tokens == 0


def test_span_dedup_short_docs_score_zero(spark):
    from stackstac_spark.operators.dedup import span_dedup

    df = spark.createDataFrame([(0, "too short"), (1, "too short")], "doc_id LONG, text STRING")
    rows = {r.doc_id: r for r in span_dedup(df, k=8).collect()}
    # both docs are below the window length: present in the output, zero dup
    assert rows[0].n_tokens == 2 and rows[0].n_dup_tokens == 0 and rows[0].dup_frac == 0.0


def test_canonical_docs_selection_and_singletons(spark):
    from stackstac_spark.operators.dedup import canonical_docs

    docs = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 30), (3, 5), (4, 99)],
        "doc_id LONG, n_chars LONG",
    )
    # cluster {0,1,2}: 1 and 2 tie on n_chars=30 -> min id 1 wins; 3 and 4
    # are singletons
    comps = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "node LONG, component LONG"
    )
    rows = {r.doc_id: r for r in canonical_docs(docs, comps, score_col="n_chars").collect()}
    assert len(rows) == 5
    assert [rows[i].canonical_id for i in range(3)] == [1, 1, 1]
    assert rows[1].is_canonical and not rows[0].is_canonical
    for i in (3, 4):
        assert rows[i].cluster == i and rows[i].canonical_id == i and rows[i].is_canonical
    # score_col=None keeps the smallest id
    by_id = {r.doc_id: r for r in canonical_docs(docs, comps).collect()}
    assert by_id[2].canonical_id == 0


def test_pii_scrub_sequential_counts(spark):
    """Counts are taken before each replacement in email→ip→phone order:
    digits inside a redacted email never double-count as a phone."""
    from stackstac_spark.operators.textstats import pii_scrub

    df = spark.createDataFrame(
        [
            (0, "mail me at john.doe+spam@corp.example.com thanks"),
            (1, "host 192.168.0.1 and 10.0.0.255 are up"),
            (2, "call +1 555-0123-456 or 555 0123 9999 now"),
            (3, "mixed: a@b.io on 8.8.8.8 dial 555-0100-222"),
            (4, "clean text with no sensitive content at all"),
            (5, "digits12345678999@example.org only an email"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (rows[0].n_email, rows[0].n_ipv4, rows[0].n_phone) == (1, 0, 0)
    assert "<EMAIL>" in rows[0].scrubbed and "@" not in rows[0].scrubbed
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (0, 2, 0)
    assert rows[1].scrubbed.count("<IP>") == 2
    assert rows[2].n_phone == 2 and "<PHONE>" in rows[2].scrubbed
    assert (rows[3].n_email, rows[3].n_ipv4, rows[3].n_phone) == (1, 1, 1)
    assert (rows[4].n_email, rows[4].n_ipv4, rows[4].n_phone) == (0, 0, 0)
    assert rows[4].scrubbed == "clean text with no sensitive content at all"
    # the long digit run sits INSIDE the email: email is redacted first, so
    # no phone is counted
    assert (rows[5].n_email, rows[5].n_phone) == (1, 0)


def test_pack_sequences_hand_checked(spark):
    from stackstac_spark.operators.packing import pack_sequences

    rows = [
        # shard a: lengths 6, 6, 3 with capacity 8 -> doc 1 straddles 0/1
        ("a", 0, 6),
        ("a", 1, 6),
        ("a", 2, 3),
        # shard b packs independently from offset 0
        ("b", 3, 8),
        ("b", 4, 1),
        # zero-length doc: occupies no window, pinned to its start chunk
        ("b", 5, 0),
        ("b", 6, 2),
    ]
    df = spark.createDataFrame(rows, "source STRING, doc_id LONG, n LONG")
    got = {
        r.doc_id: r
        for r in pack_sequences(df, capacity=8, len_col="n").collect()
    }
    expect = {
        0: (0, 0, 0, 1),
        1: (6, 0, 1, 2),
        2: (12, 1, 1, 1),
        3: (0, 0, 0, 1),
        4: (8, 1, 1, 1),
        5: (9, 1, 1, 1),
        6: (9, 1, 1, 1),
    }
    for d, (off, sc, ec, nc) in expect.items():
        r = got[d]
        assert (r.start_offset, r.start_chunk, r.end_chunk, r.n_chunks) == (off, sc, ec, nc), d


def test_pack_sequences_no_global_sort(spark):
    """The running sum must be windowed per shard — a global (empty
    partitionBy) window would serialize the corpus through one task."""
    from stackstac_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [("a", 0, "x y z"), ("b", 1, "w v")], "source STRING, doc_id LONG, text STRING"
    )
    plan = pack_sequences(df, capacity=4)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(shard" in plan, plan
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, capacity=0)


def test_vocab_topk_counts_and_tiebreak(spark, docs_df):
    from stackstac_spark.operators.textstats import vocab_topk

    rows = vocab_topk(docs_df, k=3).collect()
    py_counts: dict[str, int] = {}
    py_docs: dict[str, set] = {}
    for d, t in DOCS:
        for tok in t.lower().split(" "):
            py_counts[tok] = py_counts.get(tok, 0) + 1
            py_docs.setdefault(tok, set()).add(d)
    expect = sorted(py_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r.term, r.cnt) for r in rows] == expect
    assert [r.rank for r in rows] == [1, 2, 3]
    for r in rows:
        assert r.doc_freq == len(py_docs[r.term])


def test_vocab_topk_uses_take_ordered(spark, docs_df):
    """orderBy+limit over the vocabulary must compile to TakeOrdered (per-
    partition top-k + driver merge), not a full sort shuffle."""
    from stackstac_spark.operators.textstats import vocab_topk

    plan = vocab_topk(docs_df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, plan


def test_truncate_embeddings_matches_numpy(spark):
    from stackstac_spark.operators.similarity import truncate_embeddings

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = {r.vec_id: r.embedding for r in truncate_embeddings(df, dims=4).collect()}
    for i in range(20):
        sl = vecs[i][:4].astype("float64")
        want = sl / np.sqrt((sl * sl).sum())
        np.testing.assert_allclose(out[i], want, rtol=1e-6)
    raw = {
        r.vec_id: r.embedding
        for r in truncate_embeddings(df, dims=4, renormalize=False).collect()
    }
    np.testing.assert_allclose(raw[3], vecs[3][:4].astype("float64"), rtol=1e-6)
    with pytest.raises(ValueError, match="dims"):
        truncate_embeddings(df, dims=0)


def test_simhash_hamming(spark, docs_df):
    from stackstac_spark.operators.dedup import simhash, simhash_candidates

    fp = {r.doc_id: r.simhash for r in simhash(docs_df).collect()}
    assert fp[0] == fp[1] == fp[2]  # token-identical after lowering
    # short docs flip many bits per changed token → use fine banding (16×4-bit
    # bands) so a 1-token edit still collides somewhere
    cands = {(r.id_a, r.id_b): r.hamming for r in simhash_candidates(docs_df, bands=16).collect()}
    assert cands[(0, 1)] == 0
    near = cands.get((0, 3))
    assert near is not None and 0 < near < 40
    # unrelated docs are farther than the near-dup
    far = bin((fp[0] ^ fp[4]) & (2**64 - 1)).count("1")
    assert far > near


def test_cosine_topk_exact_vs_numpy(spark):
    from stackstac_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = cosine_topk(df, df.filter(F.col("vec_id") < 3), k=4).collect()
    v = vecs.astype("float64")
    sims = (v @ v.T) / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    for q in range(3):
        order = [i for i in np.argsort(-sims[q]) if i != q][:4]
        got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank) if r.query_id == q]
        assert got == order


def test_lsh_topk_subset_of_bucket(spark):
    from stackstac_spark.operators.similarity import cosine_topk, lsh_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    q = df.filter(F.col("vec_id") < 2)
    approx = lsh_topk(df, q, k=3, bits=2, dim=8).collect()
    exact = cosine_topk(df, q, k=60).collect()
    exact_sims = {(r.query_id, r.neighbor_id): r.sim for r in exact}
    # every approx result must carry the true cosine value
    for r in approx:
        assert exact_sims[(r.query_id, r.neighbor_id)] == pytest.approx(r.sim)


def test_ivf_assign_covers_all(spark):
    from stackstac_spark.operators.similarity import ivf_assign

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    assigned, centroids = ivf_assign(df, n_lists=4, sample_fraction=1.0)
    rows = assigned.collect()
    assert len(rows) == 100
    assert {r.list_id for r in rows} <= set(range(len(centroids)))
    # assignment is the argmin centroid, verified in numpy
    cent = np.asarray(centroids)
    for r in rows[:10]:
        d = ((np.asarray(r.embedding, dtype="float64") - cent) ** 2).sum(1)
        assert r.list_id == int(d.argmin())


def test_ivf_assign_realistic_n_lists_bounded(spark):
    """n_lists=256 must plan + run in bounded time: the assignment is ONE
    HOF argmin over an array<array<double>> literal, not an O(n_lists)-deep
    WHEN chain (which blew up Catalyst analysis at realistic IVF sizes)."""
    import time

    from stackstac_spark.operators.similarity import ivf_assign

    rng = np.random.default_rng(7)
    n, dim = 512, 16
    vecs = rng.standard_normal((n, dim)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    t0 = time.time()
    assigned, centroids = ivf_assign(df, n_lists=256, sample_fraction=1.0)
    rows = assigned.collect()
    elapsed = time.time() - t0
    assert len(rows) == n and len(centroids) == 256
    assert elapsed < 60, f"ivf_assign at n_lists=256 took {elapsed:.1f}s"
    cent = np.asarray(centroids)
    for r in rows[:20]:
        d = ((np.asarray(r.embedding, dtype="float64") - cent) ** 2).sum(1)
        assert r.list_id == int(d.argmin())


def test_token_stats_and_quality(spark, docs_df):
    from stackstac_spark.operators.textstats import quality_score, token_stats

    s = {r.doc_id: r for r in token_stats(docs_df).collect()}
    assert s[0].n_tokens == 9
    assert s[0].n_distinct == 8  # 'the' twice
    assert s[0].stopword_ratio == pytest.approx(2 / 9)
    q = {r.doc_id: r.quality for r in quality_score(docs_df).collect()}
    assert 0 <= min(q.values()) and max(q.values()) <= 1


def test_language_id(spark, docs_df):
    from stackstac_spark.operators.textstats import language_id

    pred = {r.doc_id: r.pred_lang for r in language_id(docs_df).collect()}
    assert pred[0] == "en"
    assert pred[5] == "es"


def test_fingerprint_order_sensitivity(spark):
    from stackstac_spark.operators.textstats import fingerprint

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha")], "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r for r in fingerprint(df).collect()}
    assert rows[0].md5_fp != rows[1].md5_fp
    assert rows[0].rolling_hash != rows[1].rolling_hash  # order-sensitive


def test_multimodal_plumbing(spark):
    from stackstac_spark.operators.multimodal import (
        decode_image,
        extract_features,
        make_fake_media,
        media_repartition_hint,
        resize_images,
        sample_frames,
    )

    media = make_fake_media(spark, n=6, width=32, height=24)
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 6 and all(len(r.feature) == 16 for r in feats)
    assert all(abs(sum(r.feature) - 1.0) < 1e-5 for r in feats)

    frames = resize_images(media, 8, 8, fake=True).collect()
    assert len(frames) == 6
    arr = np.frombuffer(frames[0].pixels, dtype="uint8").reshape(8, 8, 3)
    assert arr.shape == (8, 8, 3)

    video = make_fake_media(spark, n=2).withColumn("n_frames", F.lit(6))
    sampled = sample_frames(video, every_n=2, fake=True).collect()
    assert sorted({r.frame_idx for r in sampled}) == [0, 2, 4]

    with pytest.raises(NotImplementedError):
        decode_image(b"payload", 4, 4, fake=False)

    # The fake codec is raw RGB24: payload bytes tile cyclically into pixels.
    img = decode_image(bytes(range(5)), 2, 2, fake=True)
    assert img.shape == (2, 2, 3)
    assert img.ravel().tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1]

    assert media_repartition_hint(8 << 20) == 8


def test_decode_image_routes_to_pil_when_importable(monkeypatch):
    """Round 6: decode_image prefers Pillow when importable — same
    import-gate policy as rasterio in sources/raster.py. Mocked here
    (Pillow is absent in this container); the real-PIL test below
    activates in richer deployments."""
    from stackstac_spark.operators import multimodal as MM

    opened = []

    class _FakeIm:
        def convert(self, mode):
            assert mode == "RGB"
            return np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _FakeImageModule:
        @staticmethod
        def open(fh):
            opened.append(fh.read())
            return _FakeIm()

    monkeypatch.setattr(MM, "_HAVE_PIL", True)
    monkeypatch.setattr(MM, "_PILImage", _FakeImageModule, raising=False)
    out = MM.decode_image(b"\x89PNG-ish", 999, 999, fake=False)
    assert out.shape == (2, 3, 3)  # decoded dims win over metadata hints
    assert opened == [b"\x89PNG-ish"]  # payload reached the codec verbatim

    class _GrayIm(_FakeIm):
        def convert(self, mode):
            return np.zeros((2, 3), dtype=np.uint8)  # not RGB

    monkeypatch.setattr(
        _FakeImageModule, "open", staticmethod(lambda fh: _GrayIm())
    )
    with pytest.raises(ValueError, match="not RGB"):
        MM.decode_image(b"x", 2, 3, fake=False)


def test_decode_image_real_pil_roundtrip():
    PIL = pytest.importorskip("PIL.Image")
    import io

    from stackstac_spark.operators.multimodal import decode_image

    arr = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    buf = io.BytesIO()
    PIL.fromarray(arr).save(buf, format="PNG")
    out = decode_image(buf.getvalue(), 5, 4, fake=False)
    np.testing.assert_array_equal(out, arr)


def test_streaming_ingest(spark, tmp_path):
    import json

    from stackstac_spark.streaming.ingest import (
        run_to_memory,
        stream_items,
        windowed_item_counts,
    )

    p = tmp_path / "items"
    p.mkdir()
    items = [
        {"id": f"i{k}", "collection": "c1" if k % 2 else "c2",
         "properties": {"datetime": f"2024-01-{k + 1:02d}T12:00:00Z"},
         "bbox": [0.0, 0.0, 1.0, 1.0]}
        for k in range(6)
    ]
    with open(p / "batch1.jsonl", "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")

    stream = stream_items(spark, str(p))
    assert stream.isStreaming
    run_to_memory(windowed_item_counts(stream, every="1 day"), "item_counts")
    rows = spark.sql("select * from item_counts").collect()
    assert sum(r.n_items for r in rows) == 6
    assert {r.collection for r in rows} == {"c1", "c2"}


def test_ivf_topk_matches_bruteforce_recall(spark):
    """IVF probe search: with nprobe == n_lists it must equal brute force;
    with fewer probes it returns a subset ranked identically."""
    import numpy as np

    from stackstac_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(120)]
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>").coalesce(4)
    queries = corpus.filter("vec_id < 3")

    assigned, cents = ivf_assign(corpus, n_lists=4, sample_fraction=1.0)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    full_probe = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(assigned, cents, queries, k=5, nprobe=4).collect()
    }
    assert full_probe == exact  # nprobe = n_lists degenerates to brute force

    # fewer probes: a valid (possibly partial-recall) result, ranked desc
    partial = ivf_topk(assigned, cents, queries, k=5, nprobe=2).collect()
    assert partial
    by_q: dict = {}
    for r in partial:
        assert -1.0 - 1e-9 <= r.sim <= 1.0 + 1e-9
        by_q.setdefault(r.query_id, []).append((r.rank, r.sim))
    for ranked in by_q.values():
        sims = [s for _, s in sorted(ranked)]
        assert sims == sorted(sims, reverse=True)


def test_viewport_prefetch_populates_cache(spark):
    from stackstac_spark.streaming import show as show_mod
    from stackstac_spark.streaming.show import register, update_viewport
    from tests.conftest import make_item

    from stackstac_spark.stack import stack

    items = [make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 32.0, 32.0))]
    st = stack(spark, items, assets=["red"], chunksize=32)
    token = register(st, range=(0.0, 100.0))
    n = update_viewport(token, [(5, 0, 0), (5, 1, 0)])
    assert n == 2
    # drain the pool so futures complete
    for fut in list(show_mod._PREFETCH_FUTURES.values()):
        fut.result(timeout=120)
    layer = show_mod._LAYERS[token]
    assert (5, 0, 0) in layer.tile_cache and (5, 1, 0) in layer.tile_cache
    # re-request: everything cached, nothing scheduled
    assert update_viewport(token, [(5, 0, 0)]) == 0


def test_visible_tiles_slippy_math():
    from stackstac_spark.streaming.show import visible_tiles

    # whole world at z=0/1
    assert visible_tiles((-180, -85, 180, 85), 0) == [(0, 0, 0)]
    assert len(visible_tiles((-180, -85, 180, 85), 1)) == 4
    # a point viewport maps to exactly one tile; (0, 0) at z=2 is tile (2, 2)
    assert visible_tiles((0.1, 0.1, 0.2, 0.2), 2) == [(2, 2, 1)]
    # out-of-range latitudes clamp instead of exploding
    assert visible_tiles((0.0, -89.0, 0.1, 89.0), 1) == [(1, 1, 0), (1, 1, 1)]
    # antimeridian crossing (west > east) wraps through the last column
    tiles = visible_tiles((170.0, 0.1, -170.0, 10.0), 3)
    assert {t[1] for t in tiles} == {7, 0}


def test_map_observer_pan_zoom_sequences(spark, monkeypatch):
    """The widget-free MapObserver (reference show.py:523-634): pan/zoom
    events drive update_viewport — new tiles submitted, pending off-screen
    tiles cancelled. Deterministic by blocking the prefetch pool."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from stackstac_spark.stack import stack
    from stackstac_spark.streaming import show as show_mod
    from stackstac_spark.streaming.show import MapObserver, register
    from tests.conftest import make_item

    items = [make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 32.0, 32.0))]
    st = stack(spark, items, assets=["red"], chunksize=32)
    token = register(st, range=(0.0, 100.0))

    with pytest.raises(KeyError):
        MapObserver("no-such-layer")

    gate = threading.Event()
    computed = []

    def fake_compute(layer, z, x, y, tilesize=256):
        gate.wait(timeout=60)
        computed.append((z, x, y))
        return b"png"

    monkeypatch.setattr(show_mod, "compute_tile", fake_compute)
    # fresh 1-worker pool: the first submitted tile occupies the worker
    # (blocked on the gate), every later tile stays PENDING → cancellable
    monkeypatch.setattr(
        show_mod, "_PREFETCH_POOL", ThreadPoolExecutor(max_workers=1)
    )
    show_mod._PREFETCH_FUTURES.clear()

    obs = MapObserver(token, max_tiles=4)
    r1 = obs.bounds_changed((0.1, 0.1, 0.2, 0.2), 6)  # one-tile viewport
    assert r1["scheduled"] == 1 and len(r1["tiles"]) == 1
    r2 = obs.bounds_changed((0.1, 0.1, 12.0, 12.0), 6)  # viewport grows
    assert r2["scheduled"] >= 1
    pending_before = set(show_mod._PREFETCH_FUTURES)
    # pan far away: every pending (not-yet-running) tile must be cancelled
    r3 = obs.bounds_changed((100.0, 40.0, 100.4, 40.4), 6)
    still = set(show_mod._PREFETCH_FUTURES)
    gone = pending_before - still
    assert gone, "off-screen pending tiles were not cancelled"
    assert all(k[0] == token for k in gone)
    # the new viewport's tiles are now tracked
    assert {(token, *t) for t in r3["tiles"]} <= still | {
        k for k in pending_before if k in still
    }
    gate.set()  # release the worker; surviving futures drain
    for fut in list(show_mod._PREFETCH_FUTURES.values()):
        try:
            fut.result(timeout=60)
        except Exception:
            pass
    # max_tiles truncation: a whole-world viewport at z=6 is 4096 tiles
    r4 = obs.bounds_changed((-180, -85, 180, 85), 6)
    assert len(r4["tiles"]) == 4


def test_connected_components_chain_and_clique(spark):
    """A 6-node chain (worst case for plain propagation), a triangle, and an
    isolated pair — all labeled with their min member in few rounds."""
    from stackstac_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(10, 15)]  # chain 10..15
    edges += [(20, 21), (21, 22), (20, 22)]  # triangle
    edges += [(30, 31)]
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    expect = {
        **{n: 10 for n in range(10, 16)},
        **{n: 20 for n in (20, 21, 22)},
        30: 30,
        31: 30,
    }
    # distributed loop (driver_threshold=0) and driver union-find fastpath
    # are alternate physical strategies for the same operator — both must
    # produce the identical min-label components
    got_loop = {
        r.node: r.component
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    got_fast = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got_loop == expect
    assert got_fast == expect


def test_connected_components_long_chain_converges_fast(spark):
    """Pointer doubling: a 64-node chain must close in O(log n) rounds, so
    max_iter=10 is plenty (plain propagation would need 63)."""
    from stackstac_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a LONG, id_b LONG"
    )
    comps = connected_components(pairs, max_iter=10, driver_threshold=0).collect()
    assert {r.component for r in comps} == {0}
    assert len(comps) == 64


def test_connected_components_paths_agree_on_random_graph(spark):
    """Fastpath vs distributed loop on a pseudo-random graph: identical
    labelings (the fastpath is a physical strategy, not a semantic fork)."""
    from stackstac_spark.operators.dedup import connected_components

    edges = [((i * 37) % 150, (i * 91 + 13) % 150) for i in range(120)]
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    fast = {r.node: r.component for r in connected_components(pairs).collect()}
    loop = {
        r.node: r.component
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == loop and len(fast) > 0


def test_hash_sample_deterministic_and_disjoint(spark, docs_df):
    from stackstac_spark.operators.sampling import hash_sample

    a = {r.doc_id for r in hash_sample(docs_df, 0.5).collect()}
    b = {r.doc_id for r in hash_sample(docs_df, 0.5).collect()}
    assert a == b  # reproducible
    # monotone in fraction: p=1 keeps all, p=0 keeps none
    assert {r.doc_id for r in hash_sample(docs_df, 1.0).collect()} == set(range(6))
    assert hash_sample(docs_df, 0.0).count() == 0
    # different salts give different (independent) splits of a bigger corpus
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in hash_sample(big, 0.5, salt="a").collect()}
    s2 = {r.doc_id for r in hash_sample(big, 0.5, salt="b").collect()}
    assert s1 != s2
    assert 400 < len(s1) < 600  # roughly Bernoulli(0.5)
    with pytest.raises(ValueError):
        hash_sample(docs_df, 1.5)


def test_stratified_topk_quota_and_determinism(spark):
    from stackstac_spark.operators.sampling import stratified_topk

    rows = [(i, "en" if i % 3 else "fr") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    got = stratified_topk(df, "lang", 4).collect()
    from collections import Counter

    counts = Counter(r.lang for r in got)
    assert counts == {"en": 4, "fr": 4}
    # deterministic across runs
    again = stratified_topk(df, "lang", 4).collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)
    # small groups kept whole
    tiny = stratified_topk(df.filter(F.col("doc_id") < 2), "lang", 4)
    assert tiny.count() == 2


def test_repetition_stats(spark):
    from stackstac_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(0, "a b c a b c a b c"), (1, "w x y z"), (2, "t u")],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in repetition_stats(df, n=3).collect()}
    # doc 0: 7 3-grams, 3 distinct ("a b c" x3, "b c a" x2, "c a b" x2)
    assert rows[0].n_ngrams == 7 and rows[0].n_distinct_ngrams == 3
    assert rows[0].dup_ngram_ratio == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert rows[0].top_ngram_frac == pytest.approx(3 / 7, abs=1e-6)
    # doc 1: 2 unique 3-grams, no repeats
    assert rows[1].n_ngrams == 2 and rows[1].dup_ngram_ratio == 0.0
    assert 2 not in rows  # < n tokens -> no n-grams -> absent


def test_ngram_contamination(spark):
    from stackstac_spark.operators.textstats import ngram_contamination

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "dogs bark at night always")],
        "doc_id LONG, text STRING",
    )
    probe = spark.createDataFrame(
        [(100, "the cat sat quietly")], "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r for r in ngram_contamination(docs, probe, n=3).collect()}
    # doc 0 grams: "the cat sat","cat sat on","sat on the","on the mat";
    # probe grams: "the cat sat","cat sat quietly" -> 1 of 4 contaminated
    assert rows[0].n_grams == 4 and rows[0].n_contaminated == 1
    assert rows[0].contamination == pytest.approx(0.25)
    assert rows[1].n_contaminated == 0 and rows[1].contamination == 0.0


def test_tfidf_top_terms(spark):
    from stackstac_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "cherry date date")],
        "doc_id LONG, text STRING",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    # 'apple' appears only in doc 0, twice: tfidf = 2 * ln(3/1)
    top0 = sorted(by_doc[0])[0]
    assert top0[1] == "apple"
    assert top0[2] == pytest.approx(2 * np.log(3.0), abs=1e-6)
    # every doc has at most k=2 ranked terms, ranks are 1..k
    assert all(sorted(r for r, _, _ in v) == list(range(1, len(v) + 1)) for v in by_doc.values())


def test_kmeans_two_blobs(spark):
    from stackstac_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(11)
    a = rng.standard_normal((30, 4)) * 0.1 + np.array([5, 5, 5, 5])
    b = rng.standard_normal((30, 4)) * 0.1 - np.array([5, 5, 5, 5])
    vecs = np.vstack([a, b]).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    assigned, cents = kmeans_fit(df, k=2, iters=3)
    lab = {r.vec_id: r.cluster for r in assigned.collect()}
    blob_a = {lab[i] for i in range(30)}
    blob_b = {lab[i] for i in range(30, 60)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    # centroids land on the blob means
    means = sorted(round(sum(c) / len(c)) for c in cents)
    assert means == [-5, 5]
    # deterministic: a second run reproduces the labels exactly
    assigned2, cents2 = kmeans_fit(df, k=2, iters=3)
    assert cents2 == cents
    assert {r.vec_id: r.cluster for r in assigned2.collect()} == lab


def test_streaming_dedup(spark, tmp_path):
    import json

    from stackstac_spark.streaming.ingest import dedup_stream, run_to_memory, stream_items

    p = tmp_path / "dedup_items"
    p.mkdir()
    rows = [
        {"id": "a", "collection": "c", "properties": {"datetime": "2024-01-01T00:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
        {"id": "a", "collection": "c", "properties": {"datetime": "2024-01-01T01:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},  # dup id
        {"id": "b", "collection": "c", "properties": {"datetime": "2024-01-01T02:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
        {"id": "c", "collection": "c", "properties": {"datetime": "2024-01-01T03:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
        {"id": "b", "collection": "c", "properties": {"datetime": "2024-01-01T04:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},  # dup id
    ]
    with open(p / "b1.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = stream_items(spark, str(p))
    deduped = dedup_stream(stream, keys="id", watermark="1 day")
    run_to_memory(deduped, "dedup_out", output_mode="append")
    got = spark.sql("select id from dedup_out").collect()
    assert sorted(r.id for r in got) == ["a", "b", "c"]


def test_stream_enrich_static_join(spark, tmp_path):
    """Real streaming run: a file-source stream left-joins a static
    dimension; unmatched stream rows keep flowing with nulls."""
    import json

    from stackstac_spark.streaming.ingest import enrich_stream, run_to_memory

    p = tmp_path / "enrich_events"
    p.mkdir()
    rows = [
        {"event_id": 1, "user_id": 10, "value": 1.5},
        {"event_id": 2, "user_id": 20, "value": 2.5},
        {"event_id": 3, "user_id": 99, "value": 3.5},  # no dim match
    ]
    with open(p / "b1.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema("event_id LONG, user_id LONG, value DOUBLE").json(str(p))
    dim = spark.createDataFrame([(10, "AUTO"), (20, "HOME")], "user_id LONG, segment STRING")
    out = enrich_stream(stream, dim, on="user_id")
    assert out.isStreaming
    run_to_memory(out, "enrich_out", output_mode="append")
    got = {r.event_id: r.segment for r in spark.sql("select * from enrich_out").collect()}
    assert got == {1: "AUTO", 2: "HOME", 3: None}
    with pytest.raises(ValueError, match="stream-static"):
        enrich_stream(stream, dim, on="user_id", how="full")


def test_quantize_embeddings_matches_numpy(spark):
    from stackstac_spark.operators.similarity import quantize_embeddings

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((20, 8)).astype("float32")
    vecs[3] = 0.0  # zero vector edge case
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for i in range(20):
        v = vecs[i].astype("float64")
        scale = np.abs(v).max() / 127.0
        if scale == 0:
            q = np.zeros_like(v)
            assert rows[i].scale == 0.0 and list(rows[i].qvec) == [0] * 8
            assert rows[i].rel_err == 0.0
            continue
        # numpy rounds half-to-even; the engine rounds half-away — values at
        # exact .5 boundaries are measure-zero for float data, so floor(+0.5)
        q = np.floor(np.abs(v / scale) + 0.5) * np.sign(v)
        assert list(rows[i].qvec) == [int(x) for x in q]
        assert abs(rows[i].scale - scale) < 1e-12
        l2 = np.sqrt(((v - q * scale) ** 2).sum())
        assert rows[i].rel_err == pytest.approx(round(l2 / np.sqrt((v**2).sum()), 6), abs=1e-9)
        assert max(abs(x) for x in rows[i].qvec) <= 127


def test_unigram_lm_scoring(spark):
    import math

    from stackstac_spark.operators.textstats import fit_unigram_lm, unigram_logprob_score

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b"), (2, "zz zz")], "doc_id LONG, text STRING"
    )
    # self-fit: counts a=5? no: a:4? tokens: doc0 a,a,a,b doc1 a,b doc2 zz,zz
    # -> a:4, b:2, zz:2 ; total=8, vocab=3 ; denom = 8 + 0.5*4 = 10
    rows = {r.doc_id: r for r in unigram_logprob_score(docs, alpha=0.5).collect()}
    p = {"a": 4.5 / 10, "b": 2.5 / 10, "zz": 2.5 / 10}
    want0 = -(3 * math.log(p["a"]) + math.log(p["b"])) / 4
    assert rows[0].n_tokens == 4
    assert rows[0].avg_nll == pytest.approx(round(want0, 6), abs=1e-9)
    # rarer tokens => higher NLL: doc2 (zz zz) scores above doc0 (a-heavy)
    assert rows[2].avg_nll > rows[0].avg_nll

    # external LM: unseen tokens get the smoothed floor
    lm = fit_unigram_lm(spark.createDataFrame([(0, "a b")], "doc_id LONG, text STRING"))
    ext = {r.doc_id: r for r in unigram_logprob_score(docs, lm=lm, alpha=0.5).collect()}
    # lm: a:1, b:1, total=2, vocab=2, denom = 2 + 0.5*3 = 3.5; unseen p=0.5/3.5
    want2 = -math.log(0.5 / 3.5)
    assert ext[2].avg_nll == pytest.approx(round(want2, 6), abs=1e-9)


def test_dsir_weights_prefers_target_like_docs(spark):
    import math

    from stackstac_spark.operators.textstats import dsir_weights

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta"),   # target-like
            (1, "gamma delta gamma delta"), # off-target
            (2, "alpha gamma"),             # mixed
        ],
        "doc_id LONG, text STRING",
    )
    target = docs.filter("doc_id = 0")
    rows = {r.doc_id: r for r in dsir_weights(docs, target).collect()}
    # target-like text must get the highest log-ratio, off-target the lowest
    assert rows[0].log_ratio > rows[2].log_ratio > rows[1].log_ratio
    # exact value for doc 1 against the closed-form unigram math:
    # source LM: alpha:3 beta:2 gamma:3 delta:2, total=10, vocab=4, denom=12.5
    # target LM: alpha:2 beta:2, total=4, vocab=2, denom=5.5
    nll_s = -(2 * math.log(3.5 / 12.5) + 2 * math.log(2.5 / 12.5)) / 4
    nll_t = -math.log(0.5 / 5.5)  # every doc-1 token unseen by the target LM
    assert rows[1].nll_source == pytest.approx(round(nll_s, 6), abs=1e-9)
    assert rows[1].nll_target == pytest.approx(round(nll_t, 6), abs=1e-9)
    assert rows[1].log_ratio == pytest.approx(round(nll_s - nll_t, 6), abs=1e-6)


def test_importance_sample_deterministic_and_bounded(spark):
    from stackstac_spark.operators.sampling import importance_sample

    df = spark.range(2000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 4 = 0 THEN 0.0 WHEN id % 4 = 1 THEN 0.5 ELSE 10.0 END AS w",
    )
    kept = importance_sample(df, "w", rate=1.0)
    ids = {r.doc_id for r in kept.collect()}
    # weight 0 -> never kept; weight 10 (p clamped to 1) -> always kept
    assert not any(i % 4 == 0 for i in ids)
    assert all(i in ids for i in range(2000) if i % 4 >= 2)
    # weight 0.5 -> ~half kept, and the draw is deterministic across runs
    half = [i for i in ids if i % 4 == 1]
    assert 150 < len(half) < 350
    ids2 = {r.doc_id for r in importance_sample(df, "w", rate=1.0).collect()}
    assert ids == ids2
    # a different salt gives a different (but still deterministic) draw
    ids3 = {r.doc_id for r in importance_sample(df, "w", rate=1.0, salt="v2").collect()}
    assert ids3 != ids
    with pytest.raises(ValueError, match="rate"):
        importance_sample(df, "w", rate=-1)


def test_paragraph_dedup_global_first_occurrence(spark):
    from stackstac_spark.operators.dedup import paragraph_dedup

    # 4-token blocks; doc 1 repeats doc 0's first block, doc 2 repeats its
    # own block (intra-doc dup), doc 3 is unique, doc 4 is fully duplicated
    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),          # blocks: [a b c d] [e f g h]
            (1, "a b c d x y z w"),          # first block dropped
            (2, "p q r s p q r s"),          # second copy of own block dropped
            (3, "unique words only here"),
            (4, "a b c d"),                  # entirely dropped
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, block_tokens=4).collect()}
    assert out[0].n_blocks == 2 and out[0].n_kept == 2
    assert out[0].clean_text == "a b c d e f g h"
    assert out[1].n_kept == 1 and out[1].clean_text == "x y z w"
    assert out[2].n_kept == 1 and out[2].clean_text == "p q r s"
    assert out[3].n_kept == 1
    assert out[4].n_kept == 0 and out[4].clean_text == ""
    # tail blocks shorter than block_tokens survive as their own unit
    df2 = spark.createDataFrame([(0, "a b c d e")], "doc_id LONG, text STRING")
    r = paragraph_dedup(df2, block_tokens=4).collect()[0]
    assert r.n_blocks == 2 and r.clean_text == "a b c d e"


def test_paragraph_dedup_delim_mode(spark):
    from stackstac_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(0, "para one\n\npara two"), (1, "para one\n\npara three")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, delim=r"\n\n").collect()}
    assert out[0].clean_text == "para one para two"
    assert out[1].n_kept == 1 and out[1].clean_text == "para three"
    # structural round-trip: join_delim restores paragraph boundaries, so an
    # untouched doc's clean_text equals its original text
    rt = {
        r.doc_id: r
        for r in paragraph_dedup(df, delim=r"\n\n", join_delim="\n\n").collect()
    }
    assert rt[0].clean_text == "para one\n\npara two"


def test_cdc_chunks_shift_robust(spark):
    from stackstac_spark.operators.dedup import cdc_chunks

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    shifted = "PREFIX " + base  # one token inserted at the front
    df = spark.createDataFrame(
        [(0, base.strip()), (1, shifted.strip()), (2, "totally different words")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in cdc_chunks(df, boundary_mod=4).collect()}
    # content-defined boundaries realign after the insertion: most of doc 0's
    # chunks reappear verbatim in doc 1, so both score high dup fractions
    assert out[0].dup_frac > 0.5
    assert out[1].dup_frac > 0.5
    assert out[2].n_dup_chunks == 0
    # sanity: chunk counts are positive and bounded by token counts
    assert 0 < out[0].n_chunks <= len(base.split())


def test_mixture_sample_budgets_and_determinism(spark):
    from stackstac_spark.operators.sampling import mixture_sample

    rows = [(i, f"d{i % 3}", "tok " * 10) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    # ~11 tokens/doc ("tok"*10 split -> 10 toks + trailing ''), budget 100 per
    # domain except d2 (weight 0 -> dropped)
    out = mixture_sample(df, {"d0": 1.0, "d1": 1.0}, total_tokens=200)
    rows_out = out.collect()
    assert {r.source for r in rows_out} == {"d0", "d1"}
    # every kept doc had cum_before under its 100-token budget; each domain
    # overshoots by at most one doc
    per = {}
    for r in rows_out:
        per.setdefault(r.source, []).append(r)
    for d, rs in per.items():
        assert all(r.cum_before < 100 for r in rs)
        assert sum(r.n_tokens for r in rs) < 100 + max(r.n_tokens for r in rs) + 1
    # pure function of (salt, ids): identical second run
    again = sorted((r.doc_id for r in out.collect()))
    assert again == sorted(r.doc_id for r in rows_out)
    with pytest.raises(ValueError):
        mixture_sample(df, {}, total_tokens=100)


def test_semantic_dedup_drops_within_cluster_only(spark):
    from stackstac_spark.operators.similarity import semantic_dedup

    # two tight blobs; identical-direction vectors inside each blob
    rows = []
    for i in range(4):
        rows.append((i, [1.0 + 0.001 * i, 0.0, 0.0, 0.0]))          # blob A
    for i in range(4, 8):
        rows.append((i, [0.0, 1.0 + 0.001 * i, 0.0, 0.0]))          # blob B
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r.vec_id: r for r in semantic_dedup(df, k=2, iters=2, threshold=0.999).collect()}
    # every blob keeps exactly its smallest id
    kept = sorted(i for i, r in out.items() if r.is_kept)
    assert kept == [0, 4]
    # cluster labels are consistent within blob
    assert len({out[i].cluster for i in range(4)}) == 1
    assert len({out[i].cluster for i in range(4, 8)}) == 1


def test_corpus_clean_all_reasons(spark):
    from stackstac_spark.operators.pipeline import corpus_clean

    long_diverse = " ".join(f"w{i}" for i in range(30))          # kept
    repetitive = "dup " * 29 + "dup"                             # low diversity
    contaminated = " ".join(f"bench{i}" for i in range(30))      # matches probe
    corpus = spark.createDataFrame(
        [
            (0, long_diverse),
            (1, long_diverse),        # exact dup of 0 -> dropped
            (2, "too short"),
            (3, repetitive),
            (4, contaminated),
        ],
        "doc_id LONG, text STRING",
    )
    probe = spark.createDataFrame([(100, contaminated)], "doc_id LONG, text STRING")
    out = {
        r.doc_id: r
        for r in corpus_clean(
            corpus, probe, min_tokens=5, min_diversity=0.3, contamination_max=0.5
        ).collect()
    }
    assert len(out) == 5  # one verdict row per input doc
    assert out[0].reason == "kept" and out[0].keep
    assert out[1].reason == "exact_dup" and not out[1].keep
    assert out[2].reason == "too_short"
    assert out[3].reason == "low_diversity"
    assert out[4].reason == "contaminated" and out[4].contamination == 1.0
    # no probe -> contamination stage disabled, doc 4 survives
    out2 = {
        r.doc_id: r
        for r in corpus_clean(
            corpus, None, min_tokens=5, min_diversity=0.3
        ).collect()
    }
    assert out2[4].reason == "kept" and out2[4].contamination == 0.0


def test_pq_matches_numpy_adc(spark):
    from stackstac_spark.operators.similarity import pq_adc_topk, pq_encode, pq_fit

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    books = pq_fit(df, m=2, k=4, iters=2)
    assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 4
    enc = {r.vec_id: r.codes for r in pq_encode(df, books).collect()}
    assert all(0 <= c < 4 for codes in enc.values() for c in codes)

    # numpy replication: float32-cast vectors (the stored dtype), same argmin
    V = {i: np.array(v, dtype=np.float32).astype(float) for i, v in rows}
    B = [np.array(b) for b in books]
    def adc(q, cid):
        c = enc[cid]
        return round(sum(float(np.sum((q[j*4:(j+1)*4] - B[j][c[j]])**2)) for j in range(2)), 6)
    top = pq_adc_topk(enc_df := pq_encode(df, books), books, df.filter("vec_id < 2"), k=5)
    got = {(r.query_id, r.rank): r.neighbor_id for r in top.collect()}
    for q in (0, 1):
        want = [i for _, i in sorted((adc(V[q], i), i) for i in V if i != q)[:5]]
        assert [got[(q, r)] for r in range(1, 6)] == want

    with pytest.raises(ValueError):
        pq_fit(df, m=3)  # 8 dims not divisible by 3


def test_pq_encode_is_scan_only(spark):
    from stackstac_spark.operators.similarity import pq_encode, pq_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_fit(emb, m=4, k=4, iters=1)
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    # compression is a pure per-row expression: no shuffle, no Python worker
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_incremental_dedup_statuses(spark):
    from stackstac_spark.operators.dedup import incremental_dedup

    batch = spark.createDataFrame(
        [
            (10, "already in the store"),
            (11, "fresh content one"),
            (12, "fresh content two"),
            (13, "fresh content two"),     # in-batch dup of 12
            (14, "Already  in the STORE"), # store dup after normalize
        ],
        "doc_id LONG, text STRING",
    )
    from pyspark.sql import functions as F
    store = spark.createDataFrame(
        [("already in the store",)], "text STRING"
    ).select(F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fingerprint"))
    out = {r.doc_id: r.status for r in incremental_dedup(batch, store).collect()}
    assert out == {
        10: "dup_of_store",
        11: "new",
        12: "new",
        13: "dup_in_batch",
        14: "dup_of_store",
    }


def test_minhash_bands_must_divide_hashes(spark):
    from stackstac_spark.operators.dedup import minhash_lsh_candidates

    df = spark.createDataFrame([(0, "a b c")], "doc_id LONG, text STRING")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide"):
        minhash_lsh_candidates(df, num_hashes=16, bands=5)


def test_ivf_topk_string_ids(spark):
    from stackstac_spark.operators.similarity import ivf_assign, ivf_topk

    rows = [(f"doc-{i}", [float((i * 7 + j) % 5) for j in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id STRING, embedding ARRAY<DOUBLE>")
    assigned, cents = ivf_assign(df, n_lists=2, sample_fraction=1.0)
    out = ivf_topk(assigned, cents, df.limit(3), k=2, nprobe=2)
    got = out.collect()
    assert got and all(isinstance(r["query_id"], str) for r in got)
    assert all(r["query_id"] != r["neighbor_id"] for r in got)


def test_cosine_near_duplicates_operator(spark):
    from stackstac_spark.operators.similarity import cosine_near_duplicates

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),  # identical to 0 → sim 1.0
            (2, [0.0, 1.0]),  # orthogonal
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = cosine_near_duplicates(emb, top_pairs=3).collect()
    assert (got[0]["ida"], got[0]["idb"], got[0]["sim"]) == (0, 1, 1.0)
    assert all(r["ida"] < r["idb"] for r in got) and len(got) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cosine_near_duplicates(emb, top_pairs=0)
    # the bounded-subset contract self-enforces: above max_rows the O(n^2)
    # broadcast self-join refuses loudly (mirrors ivf_topk's MAX_QUERY_SIDE)
    with _pytest.raises(ValueError, match="BOUNDED"):
        cosine_near_duplicates(emb, top_pairs=3, max_rows=2)


def test_audio_features_match_numpy(spark):
    """PCM16 fake decode + RMS/peak/zero-cross vs a direct numpy replay,
    incl. the real-codec NotImplementedError stub."""
    import numpy as np
    import pytest as _pytest

    from stackstac_spark.operators.multimodal import (
        decode_audio,
        extract_audio_features,
        fake_payload,
        make_fake_media,
    )

    media = make_fake_media(spark, n=4)
    got = {r.media_id: r for r in extract_audio_features(media, fake=True).collect()}
    for mid in range(4):
        buf = np.frombuffer(fake_payload(mid), dtype=np.uint8)
        s = buf[: (buf.size // 2) * 2].view("<i2").astype(np.int64)
        r = got[mid]
        assert r.n_samples == s.size
        assert r.peak == int(np.abs(s).max())
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(s.astype(float) ** 2))), rel=1e-9)
        sign = np.sign(s)
        nz = sign != 0
        assert r.n_zero_cross == int(np.count_nonzero(np.diff(sign[nz]) != 0))
    with _pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01", fake=False)
    with _pytest.raises(ValueError):
        decode_audio(b"\x00", fake=True)


def test_frame_kernels_honor_decoded_dims(spark, monkeypatch):
    """r6 review fix: resize_images / sample_frames must index and label by
    the DECODED image dims, not the metadata hints (a real codec can
    disagree — decode_image's documented contract)."""
    from stackstac_spark.operators import multimodal as MM

    small = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    monkeypatch.setattr(MM, "decode_image", lambda payload, w, h, fake=False: small)
    media = MM.make_fake_media(spark, n=1, width=999, height=999)
    frames = MM.resize_images(media, 4, 4, fake=False).collect()
    arr = np.frombuffer(frames[0].pixels, dtype="uint8").reshape(4, 4, 3)
    assert arr.shape == (4, 4, 3)  # no IndexError from 999-row gather
    vid = media.withColumn("n_frames", F.lit(2))
    sampled = MM.sample_frames(vid, every_n=1, fake=False).collect()
    for r in sampled:
        assert (r.height, r.width) == (2, 3)  # decoded dims in the schema
        assert len(r.pixels) == r.height * r.width * 3


def test_quality_buckets_approx_empty_and_all_null(spark):
    """r6 review fix: zero scored rows must yield an empty frame (like
    exact mode), not a TypeError from NULL percentile cutoffs."""
    from stackstac_spark.operators.textstats import quality_buckets

    empty = spark.createDataFrame([], "doc_id LONG, s DOUBLE")
    assert quality_buckets(empty, "s", 3, approx=True).collect() == []
    allnull = spark.createDataFrame([(1, None), (2, None)], "doc_id LONG, s DOUBLE")
    assert quality_buckets(allnull, "s", 3, approx=True).collect() == []


def test_map_observer_wrap_truncation_keeps_seam_center():
    """r6 review fix: center-out truncation must work in viewport order —
    an antimeridian-crossing viewport keeps the tiles at the seam (the
    visual center), not the viewport edges."""
    from stackstac_spark.streaming import show as show_mod
    from stackstac_spark.streaming.show import MapObserver

    calls = []
    layer_token = "wrap-test"
    show_mod._LAYERS[layer_token] = object()  # observer only checks membership
    try:
        orig = show_mod.update_viewport
        show_mod.update_viewport = lambda token, tiles: calls.append(tiles) or 0
        try:
            obs = MapObserver(layer_token, max_tiles=6)
            # z=6: lon 170→-170 wraps through x=63→0; lat band picks 1 row
            r = obs.bounds_changed((160.0, 20.0, -160.0, 24.0), 6)
            kept_x = sorted(t[1] for t in r["tiles"])
            # viewport columns: 60..63, 0..3 (8 cols); the seam (63, 0) is
            # the visual center and MUST survive a 6-tile truncation
            assert 63 in kept_x and 0 in kept_x, kept_x
            assert 60 not in kept_x or 3 not in kept_x  # an edge was dropped
        finally:
            show_mod.update_viewport = orig
    finally:
        del show_mod._LAYERS[layer_token]


def test_kcenter_select_matches_python(spark):
    """Greedy k-center vs a pure-Python replay (same seed, rounding, and
    tie-break) on a tiny planted geometry: 3 far-apart cluster centers must
    be selected before any same-cluster point."""
    import numpy as np

    from stackstac_spark.operators.similarity import kcenter_select

    rng = np.random.default_rng(3)
    centers = {0: (0.0, 0.0), 1: (100.0, 0.0), 2: (0.0, 100.0)}
    rows = []
    for i in range(30):
        cx, cy = centers[i % 3]
        rows.append((i, [float(cx + rng.normal(0, 0.5)), float(cy + rng.normal(0, 0.5))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [(r["rank"], r["vec_id"], r["dist2"]) for r in kcenter_select(df, k=5).orderBy("rank").collect()]

    # python replay with the exact same arithmetic shape
    vecs = {i: [float(np.float32(x)) for x in v] for i, v in rows}
    norms = {i: sum(x * x for x in v) for i, v in vecs.items()}
    sel = [min(vecs)]
    md = {}
    expect = [(0, sel[0], None)]
    for rank in range(1, 5):
        s = sel[-1]
        for i, v in vecs.items():
            d = round(max(0.0, norms[i] + norms[s] - 2 * sum(x * y for x, y in zip(v, vecs[s]))), 6)
            md[i] = d if rank == 1 else min(md[i], d)
        best = min(vecs, key=lambda i: (-md[i], i))
        expect.append((rank, best, md[best]))
        sel.append(best)
    assert got == [(r, v, pytest.approx(d) if d is not None else None) for r, v, d in expect]
    # the three planted clusters are covered by the first three selections
    assert {v % 3 for _, v, _ in got[:3]} == {0, 1, 2}


def test_kcenter_select_validates(spark):
    from stackstac_spark.operators.similarity import kcenter_select

    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kcenter_select(df, k=0)
    assert kcenter_select(df, k=1).collect()[0]["vec_id"] == 0
