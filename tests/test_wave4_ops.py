"""Wave-4 operators: winnowing fingerprints, sorted-neighborhood blocking,
event-time interval join (batch + stream-stream), raster temporal
forward-fill — checked against pure-Python oracles and plan properties."""

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- winnowing -------------------------------------------------------------


def _py_winnow(text: str, k: int, w: int) -> set:
    toks = text.lower().split()
    if len(toks) < k + w - 1:
        return set()
    hs = [
        int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:8], 16)
        for i in range(len(toks) - k + 1)
    ]
    return {min(hs[s : s + w]) for s in range(len(hs) - w + 1)}


def test_winnow_fingerprints_match_python(spark):
    from stackstac_spark.operators.dedup import winnow_fingerprints

    texts = [
        (0, "a b c d e f g h i j"),
        (1, "x y a b c d e f q r"),  # shares the run "a b c d e f" with doc 0
        (2, "one two three"),  # too short: < k+w-1 tokens
        (3, "z z z z z z z z"),  # degenerate repeats
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {}
    for r in winnow_fingerprints(df, k=4, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in texts:
        expect = _py_winnow(t, 4, 4)
        assert got.get(i, set()) == expect, (i, got.get(i), expect)


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    from stackstac_spark.operators.dedup import winnow_pairs

    # docs 0/1 share a 7-token run (≥ w+k-1 = 7) → guaranteed shared fp
    df = spark.createDataFrame(
        [
            (0, "p q r common run of seven shared tokens here end"),
            (1, "common run of seven shared tokens here totally different tail"),
            (2, "nothing in common with the others at all whatsoever"),
        ],
        "doc_id LONG, text STRING",
    )
    pairs = winnow_pairs(df, k=4, w=4, min_shared=1, max_df=None).collect()
    assert any(r["doc_a"] == 0 and r["doc_b"] == 1 for r in pairs)
    assert not any(2 in (r["doc_a"], r["doc_b"]) for r in pairs)


def test_winnow_max_df_drops_boilerplate(spark):
    from stackstac_spark.operators.dedup import winnow_pairs

    # the same boilerplate in every doc; max_df=2 < 4 docs kills those fps
    boiler = "this license header appears in every single document verbatim"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(4)], "doc_id LONG, text STRING"
    )
    assert winnow_pairs(df, k=4, w=4, min_shared=1, max_df=2).count() == 0
    assert winnow_pairs(df, k=4, w=4, min_shared=1, max_df=None).count() == 6


# --- sorted neighborhood ---------------------------------------------------


def test_sorted_neighborhood_matches_naive(spark):
    from stackstac_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(i, float((i * 37) % 50)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id LONG, key DOUBLE")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in sorted_neighborhood_pairs(df, "key", window=4).collect()
    }
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    expect = {
        (order[p], order[p + j], j)
        for p in range(len(order))
        for j in range(1, 4)
        if p + j < len(order)
    }
    assert got == expect


def test_sorted_neighborhood_no_global_window(spark):
    from stackstac_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).cast("double").alias("key")
    )
    out = sorted_neighborhood_pairs(df, "key", window=3)
    plan = _plan(out)
    # the global order comes from the range repartition (pinned behind the
    # localCheckpoint) + per-__pid windows — every window spec must be
    # partitioned (a partition-less window would be the single-task plan)
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(s.lstrip().startswith("__pid") for s in specs), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "key", window=1)


# --- interval join ---------------------------------------------------------


def test_interval_join_batch_matches_naive(spark):
    from stackstac_spark.streaming.ingest import interval_join

    left = spark.createDataFrame(
        [(u, 1_700_000_000 + off) for u in range(5) for off in (0, 1000, 5000)],
        "user_id LONG, ts_s LONG",
    ).withColumn("ts", F.timestamp_seconds("ts_s"))
    right = spark.createDataFrame(
        [(u, 1_700_000_000 + off) for u in range(5) for off in (500, 1500, 9999)],
        "user_id LONG, ts_s LONG",
    ).withColumn("ts", F.timestamp_seconds("ts_s"))
    j = interval_join(
        left.select("user_id", "ts", F.col("ts_s").alias("l_s")),
        right.select("user_id", "ts", F.col("ts_s").alias("r_s")),
        on="user_id",
        lower="0 seconds",
        upper="1000 seconds",
    )
    got = {(r["user_id"], r["l_s"], r["r_s"]) for r in j.collect()}
    expect = {
        (u, 1_700_000_000 + lo, 1_700_000_000 + ro)
        for u in range(5)
        for lo in (0, 1000, 5000)
        for ro in (500, 1500, 9999)
        if 0 <= ro - lo <= 1000
    }
    assert got == expect
    with pytest.raises(ValueError):
        interval_join(left, right, on="user_id", how="full")


def test_interval_join_is_hash_join_on_key(spark):
    from stackstac_spark.streaming.ingest import interval_join

    l = spark.range(100).select(
        F.col("id").alias("user_id"), F.timestamp_seconds(F.col("id") * 60).alias("ts")
    )
    r = spark.range(100).select(
        F.col("id").alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60 + 30).alias("ts"),
    )
    plan = _plan(interval_join(l, r, on="user_id"))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_interval_join_stream_stream(spark, tmp_path):
    import json
    import time

    from stackstac_spark.streaming.ingest import interval_join

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    base = 1_700_000_000
    with open(ldir / "a.json", "w") as f:
        for u in range(4):
            f.write(json.dumps({"user_id": u, "ts_s": base + u}) + "\n")
    with open(rdir / "a.json", "w") as f:
        for u in range(4):
            # u-th right row lands u*40s after the left row → only u<=2 match 100s
            f.write(json.dumps({"user_id": u, "ts_s": base + u + u * 40}) + "\n")
    mk = lambda d: (
        spark.readStream.schema("user_id LONG, ts_s LONG")
        .json(str(d))
        .withColumn("ts", F.timestamp_seconds("ts_s"))
    )
    j = interval_join(
        mk(ldir).select("user_id", "ts"),
        mk(rdir).select("user_id", "ts"),
        on="user_id",
        lower="0 seconds",
        upper="100 seconds",
        watermark="10 minutes",
    )
    q = (
        j.select("user_id")
        .writeStream.format("memory")
        .queryName("ivj_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        users = set()
        while time.time() < deadline:
            q.processAllAvailable()
            users = {
                r["user_id"] for r in spark.sql("SELECT user_id FROM ivj_test").collect()
            }
            if users == {0, 1, 2}:
                break
            time.sleep(0.5)
        assert users == {0, 1, 2}
    finally:
        q.stop()


# --- bm25 -----------------------------------------------------------------


def test_bm25_matches_python(spark):
    import math

    from stackstac_spark.operators.textstats import bm25_topk

    texts = [
        (0, "spark table join spark spark"),
        (1, "table sort merge"),
        (2, "nothing relevant here at all"),
        (3, "spark"),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, ["spark", "table"], k=10).collect()}

    docs = {i: t.split() for i, t in texts}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {
        q: sum(1 for t in docs.values() if q in t) for q in ("spark", "table")
    }
    expect = {}
    for i, t in docs.items():
        s = 0.0
        for q in ("spark", "table"):
            tf = t.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(t) / avgdl))
        if s:
            expect[i] = round(s, 6)
    assert got == expect
    # ranking: doc 0 (3×spark + table) must beat doc 3 (1×spark)
    assert got[0] > got[3]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_topk(df, [])
    with _pytest.raises(ValueError):
        bm25_topk(df, ["spark"], k=0)


def test_bm25_plan_take_ordered_and_broadcasts(spark):
    from stackstac_spark.operators.textstats import bm25_topk

    df = spark.createDataFrame(
        [(i, f"w{i % 11} spark table") for i in range(300)], "doc_id LONG, text STRING"
    )
    plan = _plan(bm25_topk(df, ["spark", "table"], k=5))
    assert "TakeOrderedAndProject" in plan, plan


# --- raster ffill ----------------------------------------------------------


def test_ffill_time_dense_forward_fill(spark):
    from stackstac_spark.operators.composite import ffill_time

    # one pixel observed at t=0 and t=2 (NaN at t=2 → missing), another at t=1
    px = spark.createDataFrame(
        [
            (0, 0, 0, 0, 10.0),
            (2, 0, 0, 0, float("nan")),
            (1, 0, 0, 1, 20.0),
        ],
        "item_idx INT, band_idx INT, row INT, col INT, value DOUBLE",
    )
    got = {
        (r["item_idx"], r["row"], r["col"]): r["value"]
        for r in ffill_time(px, [0, 1, 2, 3]).collect()
    }
    assert got[(0, 0, 0)] == 10.0
    assert got[(1, 0, 0)] == 10.0  # gap filled forward
    assert got[(2, 0, 0)] == 10.0  # NaN observation treated as missing
    assert got[(3, 0, 0)] == 10.0
    assert got[(0, 0, 1)] is None  # nothing before the first observation
    assert got[(1, 0, 1)] == 20.0
    assert got[(3, 0, 1)] == 20.0
    assert len(got) == 8  # dense: 2 pixels × 4 steps
    with pytest.raises(ValueError):
        ffill_time(px, [])


# --- wave 5: minhash estimate / char entropy / vocab encode ----------------


def test_minhash_jaccard_estimate_bounds_and_exact_dup(spark):
    from stackstac_spark.operators.dedup import minhash_jaccard_estimate

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),  # exact dup → est 1.0
            (2, "alpha beta gamma delta other words here"),
            (3, "completely unrelated text payload entirely"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_jaccard_estimate(df, num_hashes=8, bands=4).collect()
    }
    assert got[(0, 1)] == 1.0  # identical shingle sets agree on every hash
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert (0, 3) not in got and (1, 3) not in got  # no shared bucket


def test_char_entropy_matches_python(spark):
    import math
    from collections import Counter

    from stackstac_spark.operators.textstats import char_entropy

    texts = [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, "a"), (4, "")]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {r["doc_id"]: (r["n_chars"], r["entropy"]) for r in char_entropy(df).collect()}
    for i, t in texts:
        if not t:
            assert i not in got  # empty text absent
            continue
        c = Counter(t)
        n = len(t)
        ent = round(-sum(v / n * math.log2(v / n) for v in c.values()), 6)
        assert got[i][0] == n
        assert abs(got[i][1] - ent) < 1e-9, (i, got[i], ent)
    assert got[0][1] == 0.0 and got[2][1] == 2.0  # degenerate / uniform


def test_encode_with_vocab_roundtrip(spark):
    from stackstac_spark.operators.textstats import encode_with_vocab, vocab_topk

    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the the dog"), (2, "rare token xyzzy")],
        "doc_id LONG, text STRING",
    )
    vocab = vocab_topk(df, k=3)  # the(3), cat/dog/rare/sat/token/xyzzy tie → cat, dog
    v = {r["term"]: r["rank"] for r in vocab.collect()}
    assert v["the"] == 1
    got = {r["doc_id"]: r for r in encode_with_vocab(df, vocab).collect()}
    assert got[0]["ids"] == [v["the"], v.get("cat", 0), v.get("sat", 0)]
    assert got[1]["ids"][:2] == [v["the"], v["the"]]
    assert got[2]["n_oov"] >= 1  # xyzzy can't be in a k=3 vocab with 'the' ×3
    assert all(r["n_tokens"] == len(r["ids"]) for r in got.values())


# --- gopher filter / sliding chunks ----------------------------------------


def test_gopher_quality_filter_rules(spark):
    from stackstac_spark.operators.textstats import gopher_quality_filter

    long_good = " ".join(
        ["the quick brown fox and the lazy dog in open field is here"] * 5
    )
    df = spark.createDataFrame(
        [
            (0, long_good),  # 60 words, stopwords, all alpha → keep
            (1, "too short to pass the word count rule"),  # < 50 words
            (2, " ".join(["####"] * 60)),  # no alpha, no stopwords
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["word_count"] == 8
    assert got[2]["keep"] is False
    assert got[2]["alpha_word_frac"] == 0.0 and got[2]["symbol_ratio"] == 4.0
    assert got[0]["stopword_hits"] >= 2


def test_sliding_chunks_matches_python(spark):
    from stackstac_spark.operators.packing import sliding_chunks

    texts = [
        (0, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
        (1, "a b c"),  # shorter than one chunk
        (2, " ".join(f"x{i}" for i in range(8))),  # exactly 2 windows at 4/4
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {}
    for r in sliding_chunks(df, chunk_tokens=4, stride=3).collect():
        got[(r["doc_id"], r["chunk_idx"])] = (r["chunk_text"], r["n_chunk_tokens"])
    import math

    for i, t in texts:
        toks = t.split()
        n_win = 1 + math.ceil(max(len(toks) - 4, 0) / 3)
        for w in range(n_win):
            chunk = toks[w * 3 : w * 3 + 4]
            assert got[(i, w)] == (" ".join(chunk), len(chunk)), (i, w)
        assert (i, n_win) not in got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_chunks(df, chunk_tokens=0)


def test_sentence_stats_segmentation(spark):
    from stackstac_spark.operators.textstats import sentence_stats

    df = spark.createDataFrame(
        [
            (0, "One two three. Four five! Six seven eight?"),
            (1, "No terminal punctuation here"),
            (2, "Trailing spaces after stop.   "),
            (3, "Multi!!! punctuation?! runs... collapse."),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in sentence_stats(df).collect()}
    assert got[0]["n_sentences"] == 3 and got[0]["c4_min_sentences"] is True
    assert got[0]["mean_sentence_tokens"] == 8 / 3 or abs(got[0]["mean_sentence_tokens"] - round(8 / 3, 6)) < 1e-9
    assert got[1]["n_sentences"] == 1 and got[1]["ends_terminal"] is False
    assert got[2]["n_sentences"] == 1 and got[2]["ends_terminal"] is True
    assert got[3]["n_sentences"] == 4 and got[3]["c4_min_sentences"] is True


def test_cube_agg_shape(spark):
    # cube over 2 cols → 4 grouping levels; exercised end-to-end by the
    # cube_agg gate query vs DuckDB; here just the Expand-node presence
    df = spark.createDataFrame([("a", "x", 1), ("a", "y", 2)], "f STRING, s STRING, v INT")
    out = df.cube("f", "s").count()
    assert out.count() == 6  # (a,x),(a,y),(a,*),(*,x),(*,y),(*,*)


def test_interval_join_rejects_ambiguous_columns(spark):
    from stackstac_spark.streaming.ingest import interval_join

    l = spark.createDataFrame([(1, 100, 5.0)], "user_id LONG, ts_s LONG, value DOUBLE")
    r = spark.createDataFrame([(1, 150, 9.0)], "user_id LONG, ts_s LONG, value DOUBLE")
    mk = lambda d: d.withColumn("ts", F.timestamp_seconds("ts_s"))
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join(mk(l), mk(r), on="user_id")  # ts_s + value shared


def test_sliding_chunks_rejects_stride_gt_chunk(spark):
    from stackstac_spark.operators.packing import sliding_chunks

    df = spark.createDataFrame([(0, "a b c d e")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="stride"):
        sliding_chunks(df, chunk_tokens=4, stride=10)


def test_session_window_exact_gap_merges(spark):
    """Pin Spark's session_window boundary: an event EXACTLY gap after the
    previous one MERGES into the session (next_start <= prev_end is
    inclusive). The SQL_SESSION_WINDOWS oracle replays this with
    `gap > 1800000000 -> new session`, i.e. exact gap merges — this test
    guards that both engines agree on the boundary (verified empirically
    against Spark 4.1; an exclusive-merge change would break the gate)."""
    df = spark.createDataFrame(
        [(1, 0), (1, 1_800_000_000), (1, 3_600_000_001)],
        "user_id INT, ts_us LONG",
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # events 0 and 1800s merge (exact gap); 3600.000001s starts a new session
    assert sorted(r.n for r in out) == [1, 2]


def test_vocab_tokenization_whitespace_runs(spark):
    """vocab_topk / encode_with_vocab split on \\s+ like bm25/gopher: tabs,
    newlines and space runs are separators — no empty-string OOV tokens."""
    from stackstac_spark.operators.textstats import encode_with_vocab, vocab_topk

    docs = spark.createDataFrame(
        [(0, "aa\tbb\naa  bb"), (1, "aa bb cc")], "doc_id LONG, text STRING"
    )
    vocab = vocab_topk(docs, k=10)
    terms = {r["term"] for r in vocab.collect()}
    assert terms == {"aa", "bb", "cc"}  # no '' term from the runs
    enc = {r["doc_id"]: r for r in encode_with_vocab(docs, vocab).collect()}
    assert enc[0]["n_tokens"] == 4 and enc[0]["n_oov"] == 0
    assert enc[1]["n_tokens"] == 3
