"""Wave-3 operators: weighted sampling, skew-safe grouped top-k, text
normalization, quality bucketing, sliding windows, Bloom pre-filter, PCA —
each checked against a pure-Python/numpy oracle, plus the physical-plan
properties that make them scale."""

import hashlib
import math
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --- weighted_sample (A-ES) ------------------------------------------------


def test_weighted_sample_matches_python_oracle(spark):
    from stackstac_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id LONG, w DOUBLE")
    got = weighted_sample(df, "w", k=20).select("doc_id", "sample_key").collect()

    def key(i, w):
        u = (_u32(f":{i}") + 0.5) / 2**32
        return -math.log(u) / w

    expect = sorted(((key(i, w), i) for i, w in rows))[:20]
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["sample_key"])] == [
        i for _, i in expect
    ]
    for r in got:
        k, _ = next(e for e in expect if e[1] == r["doc_id"])
        assert abs(r["sample_key"] - k) < 1e-9


def test_weighted_sample_drops_nonpositive_and_validates(spark):
    from stackstac_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "doc_id LONG, w DOUBLE"
    )
    got = weighted_sample(df, "w", k=10).select("doc_id").collect()
    assert [r["doc_id"] for r in got] == [3]
    with pytest.raises(ValueError):
        weighted_sample(df, "w", k=0)


def test_weighted_sample_null_safety(spark):
    from stackstac_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(None, 100.0), (1, None), (2, 1.0)], "doc_id LONG, w DOUBLE"
    )
    got = weighted_sample(df, "w", k=5).select("doc_id").collect()
    # null id and null weight both dropped, never occupying top-k slots
    assert [r["doc_id"] for r in got] == [2]


def test_bloom_null_key_ignored(spark):
    from stackstac_spark.operators.bloom import bloom_build, bloom_predicate

    keys = spark.createDataFrame([("a",), (None,), ("b",)], "k STRING")
    words = bloom_build(keys, "k", m_bits=512)
    probe = spark.createDataFrame([("a",), ("b",), (None,)], "k STRING")
    hits = {
        r["k"] for r in probe.filter(bloom_predicate(F.col("k"), words)).collect()
    }
    assert hits == {"a", "b"}  # null probe never matches, null key never crashes


def test_weighted_sample_plan_is_take_ordered(spark):
    from stackstac_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = _plan(weighted_sample(df, "w", k=5))
    assert "TakeOrderedAndProject" in plan, plan


# --- grouped_topk ----------------------------------------------------------


def test_grouped_topk_matches_naive_window(spark):
    from stackstac_spark.operators.skew import grouped_topk

    # skewed: group 'hot' holds 80% of rows
    rows = [(i, "hot" if i % 5 else f"g{i % 17}", float((i * 31) % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "id LONG, grp STRING, score DOUBLE")
    got = {
        (r["grp"], r["rank"]): r["id"]
        for r in grouped_topk(df, "grp", "score", k=3, tiebreak_col="id").collect()
    }
    import itertools

    expect = {}
    for grp, grp_rows in itertools.groupby(
        sorted(rows, key=lambda r: r[1]), key=lambda r: r[1]
    ):
        best = sorted(grp_rows, key=lambda r: (-r[2], r[0]))[:3]
        for rank, r in enumerate(best, 1):
            expect[(grp, rank)] = r[0]
    assert got == expect


def test_grouped_topk_ascending_and_validation(spark):
    from stackstac_spark.operators.skew import grouped_topk

    df = spark.createDataFrame(
        [(1, "a", 9.0), (2, "a", 1.0), (3, "a", 5.0)], "id LONG, grp STRING, s DOUBLE"
    )
    got = grouped_topk(df, "grp", "s", k=1, ascending=True, tiebreak_col="id").collect()
    assert [r["id"] for r in got] == [2]
    with pytest.raises(ValueError):
        grouped_topk(df, "grp", "s", k=0)


# --- normalize_text --------------------------------------------------------


def test_normalize_text_cases(spark):
    import re

    from stackstac_spark.operators.textstats import normalize_text

    texts = [
        (0, "Hello,   World! 42"),
        (1, "...!!!"),
        (2, ""),
        (3, "already clean text"),
        (4, "Tabs\tand\nnewlines? no: SPACES"),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in normalize_text(df).collect()}
    for i, t in texts:
        norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip()
        n_tok = len(norm.split(" ")) if norm else 0
        assert got[i]["norm_text"] == norm, (i, got[i]["norm_text"], norm)
        assert got[i]["norm_key"] == hashlib.md5(norm.encode()).hexdigest()
        assert got[i]["n_norm_tokens"] == n_tok
    # whitespace chars like \t\n are non-[a-z0-9 ] → become spaces → collapse
    assert got[4]["norm_text"] == "tabs and newlines no spaces"


# --- quality_buckets -------------------------------------------------------


def test_quality_buckets_quantiles(spark):
    from stackstac_spark.operators.textstats import quality_buckets

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(12)], "doc_id LONG, score DOUBLE"
    )
    got = quality_buckets(df, "score", n_buckets=3).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r["score"])
    assert {b: len(v) for b, v in by_bucket.items()} == {1: 4, 2: 4, 3: 4}
    # bucket 1 holds the lowest scores
    assert max(by_bucket[1]) < min(by_bucket[2]) < max(by_bucket[2]) < min(by_bucket[3])
    with pytest.raises(ValueError):
        quality_buckets(df, "score", n_buckets=0)


def test_quality_buckets_approx_mode(spark):
    """The scale path (round 6): percentile_approx cutoffs + broadcast CASE.
    Must (a) contain NO window at all in the physical plan, (b) agree with
    exact ntile on ≥99% of distinct-score rows, (c) keep bucket counts
    near-equal."""
    from stackstac_spark.operators.textstats import quality_buckets

    # distinct scores (md5-scrambled order) so ntile tie-splitting can't
    # create legitimate disagreements
    rows = [(i, float((i * 7919) % 4001)) for i in range(4001)]
    df = spark.createDataFrame(rows, "doc_id LONG, score DOUBLE")
    exact = {r["doc_id"]: r["bucket"] for r in quality_buckets(df, "score", 4).collect()}
    ap = quality_buckets(df, "score", 4, approx=True)
    plan = ap._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan  # no WindowExec, partitioned or not
    got = {r["doc_id"]: r["bucket"] for r in ap.collect()}
    assert set(got) == set(exact)
    agree = sum(got[k] == exact[k] for k in got) / len(got)
    assert agree >= 0.99, agree
    from collections import Counter

    counts = Counter(got.values())
    assert set(counts) == {1, 2, 3, 4}
    assert max(counts.values()) - min(counts.values()) <= 0.02 * len(rows)


def test_quality_buckets_approx_null_and_single_bucket(spark):
    from stackstac_spark.operators.textstats import quality_buckets

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 1.0)], "doc_id LONG, s DOUBLE"
    )
    got = {r["doc_id"]: r["bucket"] for r in quality_buckets(df, "s", 2, approx=True).collect()}
    assert 2 not in got  # unscored dropped, same as exact mode
    assert got[3] == 1 and got[1] == 2
    one = quality_buckets(df, "s", 1, approx=True).collect()
    assert {r["bucket"] for r in one} == {1}


# --- sliding_window_agg ----------------------------------------------------


def test_sliding_window_agg_expansion(spark):
    from stackstac_spark.streaming.ingest import sliding_window_agg

    base = 1_700_000_000_000_000  # µs, arbitrary epoch offset
    rows = [
        (i, base + i * 421_000_000, "a" if i % 3 else "b", float(i)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id LONG, ts_us LONG, event_type STRING, value DOUBLE")
    out = sliding_window_agg(
        df.withColumn("ts", F.timestamp_micros("ts_us")), "1 hour", "15 minutes"
    )
    got = {
        (r["ws_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out.select(
            F.unix_micros("window_start").alias("ws_us"), "*"
        ).collect()
    }
    expect = {}
    slide = 900_000_000
    for _i, ts, et, v in rows:
        for j in range(4):
            ws = (ts // slide) * slide - j * slide
            n, s = expect.get((ws, et), (0, 0.0))
            expect[(ws, et)] = (n + 1, s + v)
    expect = {k: (n, round(s, 4)) for k, (n, s) in expect.items()}
    assert got == expect


def test_sliding_window_agg_streaming_incremental(spark, tmp_path):
    import json
    import time

    from stackstac_spark.streaming.ingest import sliding_window_agg

    src = tmp_path / "ev"
    src.mkdir()
    base = 1_700_000_000
    with open(src / "batch0.json", "w") as f:
        for i in range(8):
            f.write(json.dumps({"ts_s": base + i * 600, "event_type": "x", "value": 1.0}) + "\n")
    stream = (
        spark.readStream.schema("ts_s LONG, event_type STRING, value DOUBLE")
        .json(str(src))
        .withColumn("ts", F.timestamp_seconds("ts_s"))
    )
    out = sliding_window_agg(stream, "1 hour", "15 minutes", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        want = None
        while time.time() < deadline:
            q.processAllAvailable()
            want = spark.sql("SELECT sum(n_events) AS n FROM slide_test").collect()[0]["n"]
            if want == 32:
                break
            time.sleep(0.5)
        assert want == 32  # 8 events × 4 overlapping windows each
    finally:
        q.stop()


# --- bloom ----------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from stackstac_spark.operators.bloom import bloom_build, bloom_predicate

    keys = spark.createDataFrame([(f"key-{i}",) for i in range(100)], "k STRING")
    words = bloom_build(keys, "k", m_bits=4096, n_hashes=3)
    probe = spark.createDataFrame(
        [(f"key-{i}",) for i in range(100)] + [(f"other-{i}",) for i in range(1000)],
        "k STRING",
    )
    hits = {
        r["k"]
        for r in probe.filter(bloom_predicate(F.col("k"), words, 3)).collect()
    }
    assert all(f"key-{i}" in hits for i in range(100))  # zero false negatives
    fp = sum(1 for i in range(1000) if f"other-{i}" in hits)
    # 300 bits set of 4096 → fill ≈ 7%; fp ≈ fill³ ≈ 4e-4 — allow generous slack
    assert fp <= 20, fp


def test_bloom_predicate_is_map_only(spark):
    from stackstac_spark.operators.bloom import bloom_build, bloom_predicate

    keys = spark.createDataFrame([(f"key-{i}",) for i in range(10)], "k STRING")
    words = bloom_build(keys, "k", m_bits=512, n_hashes=3)
    big = spark.range(1000).select(F.concat(F.lit("key-"), F.col("id")).alias("k"))
    plan = _plan(big.filter(bloom_predicate(F.col("k"), words, 3)))
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_bloom_build_validation(spark):
    from stackstac_spark.operators.bloom import bloom_build

    keys = spark.createDataFrame([("a",)], "k STRING")
    with pytest.raises(ValueError):
        bloom_build(keys, "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(keys, "k", m_bits=512, n_hashes=0)


def test_bloom_matches_python_bit_math(spark):
    from stackstac_spark.operators.bloom import bloom_build

    keys = [f"key-{i}" for i in range(37)]
    kdf = spark.createDataFrame([(k,) for k in keys], "k STRING")
    words = bloom_build(kdf, "k", m_bits=512, n_hashes=3, salt="s")
    expect = [0] * 8
    for k in keys:
        for i in range(3):
            pos = _u32(f"s{i}:{k}") % 512
            expect[pos // 64] |= 1 << (pos % 64)
    # to signed 64-bit
    expect = [w - (1 << 64) if w >= (1 << 63) else w for w in expect]
    assert words == expect


# --- pca_power -------------------------------------------------------------


def test_pca_power_matches_numpy_eigh(spark):
    from stackstac_spark.operators.similarity import pca_power

    rng = np.random.default_rng(7)
    # anisotropic cloud: dominant direction along a fixed random axis
    d, n = 16, 400
    axis = rng.standard_normal(d)
    axis /= np.linalg.norm(axis)
    x = rng.standard_normal((n, d)) + np.outer(rng.standard_normal(n) * 5, axis)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    eigval, vec, ratio, cnt = pca_power(df, "embedding", n_iters=40)
    assert cnt == n
    cov = np.cov(x.T, bias=True)
    w, v = np.linalg.eigh(cov)
    top_val, top_vec = w[-1], v[:, -1]
    assert abs(eigval - top_val) / top_val < 1e-6
    assert abs(abs(np.dot(vec, top_vec)) - 1.0) < 1e-6
    assert 0 < ratio <= 1
    # partition-count invariance (modulo float-sum order)
    eigval2, vec2, _, _ = pca_power(df.repartition(7), "embedding", n_iters=40)
    assert abs(eigval2 - eigval) < 1e-8
    assert np.allclose(vec, vec2, atol=1e-9)


def test_pca_power_validation(spark):
    from stackstac_spark.operators.similarity import pca_power

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError):
        pca_power(df, "embedding", n_iters=0)
    with pytest.raises(ValueError):
        pca_power(df.filter("vec_id < 0"), "embedding")


def test_output_column_collision_guards(spark):
    from stackstac_spark.operators.sampling import weighted_sample
    from stackstac_spark.operators.skew import grouped_topk

    df = spark.createDataFrame([(1, 2.0, 0.5)], "doc_id LONG, w DOUBLE, sample_key DOUBLE")
    with pytest.raises(ValueError, match="sample_key"):
        weighted_sample(df, "w", k=1)
    df2 = spark.createDataFrame([(1, "a", 2.0, 3)], "id LONG, grp STRING, s DOUBLE, rank INT")
    with pytest.raises(ValueError, match="rank"):
        grouped_topk(df2, "grp", "s", k=1)


def test_grouped_topk_nulls_never_win(spark):
    from stackstac_spark.operators.skew import grouped_topk

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, "a", 1.0)], "id LONG, grp STRING, s DOUBLE"
    )
    asc = grouped_topk(df, "grp", "s", k=1, ascending=True, tiebreak_col="id").collect()
    assert [r["id"] for r in asc] == [3]  # not the NULL-score row
    desc = grouped_topk(df, "grp", "s", k=1, tiebreak_col="id").collect()
    assert [r["id"] for r in desc] == [2]


def test_quality_buckets_drops_null_scores(spark):
    from stackstac_spark.operators.textstats import quality_buckets

    df = spark.createDataFrame(
        [(0, None), (1, 1.0), (2, 2.0), (3, 9.0), (4, 4.0)], "doc_id LONG, s DOUBLE"
    )
    got = {r["doc_id"]: r["bucket"] for r in quality_buckets(df, "s", n_buckets=2).collect()}
    assert 0 not in got  # unscored doc is dropped, not promoted to "best"
    assert got == {1: 1, 2: 1, 4: 2, 3: 2}
