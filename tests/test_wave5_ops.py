"""r5 wave-2 operators: two-stage ANN rerank, recall eval, hash split,
script stats, dedup health."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )


def test_rerank_topk_matches_bruteforce_when_refine_covers(spark):
    """With a shortlist big enough to contain the true top-k, the rerank
    output must equal exact full-dimension cosine top-k."""
    from stackstac_spark.operators.similarity import cosine_topk, rerank_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 8))
    emb = _emb_df(spark, vecs)
    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in rerank_topk(emb, queries, k=3, prefilter_dims=4, refine=8).collect()
    }
    # exact reference via numpy
    for q in range(3):
        sims = []
        for j in range(30):
            if j == q:
                continue
            s = vecs[q] @ vecs[j] / (np.linalg.norm(vecs[q]) * np.linalg.norm(vecs[j]))
            sims.append((round(float(s), 6), j))
        top = sorted(sims, key=lambda t: (-t[0], t[1]))[:3]
        for rank, (_, j) in enumerate(top, 1):
            assert got[(q, rank)] == j, (q, rank, got[(q, rank)], j)


def test_rerank_prefilter_actually_prunes(spark):
    """A vector that wins on the truncated dims but loses on the full ones
    must still be beaten by the exact rerank; a vector invisible in the
    truncated dims (zeros there, huge later) can be MISSED — that is the
    ANN tradeoff the recall metric measures."""
    from stackstac_spark.operators.similarity import rerank_topk

    # query 0: [1,0,0,0]; decoy 1 matches in dim 0 only; true best 2 matches
    # fully but its first-dims are weaker than the decoy's
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 9.0],   # prefilter-similar (dims 1-2), exact-poor
        [0.9, 0.1, 0.0, 0.0],   # exact-best
        [0.0, 0.0, 5.0, 5.0],   # prefilter-invisible
    ]
    emb = _emb_df(spark, vecs)
    queries = emb.filter(F.col("vec_id") == 0)
    out = rerank_topk(emb, queries, k=1, prefilter_dims=2, refine=2).collect()
    assert len(out) == 1 and out[0].neighbor_id == 2

    with pytest.raises(ValueError, match="positive"):
        rerank_topk(emb, queries, k=0)


def test_ann_recall_counts_hits_and_zero(spark):
    from stackstac_spark.operators.similarity import ann_recall

    approx = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 99, 1)],
        "query_id LONG, neighbor_id LONG, rank INT",
    )
    exact = spark.createDataFrame(
        [(0, 10, 1), (0, 12, 2), (1, 10, 1), (2, 11, 1)],
        "query_id LONG, neighbor_id LONG, rank INT",
    )
    got = {r.query_id: r for r in ann_recall(approx, exact, k=2).collect()}
    assert got[0].n_hit == 1 and got[0].n_true == 2 and got[0].recall == 0.5
    assert got[1].n_hit == 0 and got[1].recall == 0.0  # wrong neighbor
    assert got[2].n_hit == 0 and got[2].recall == 0.0  # no approx rows at all


def test_hash_split_partition_properties(spark):
    from stackstac_spark.operators.sampling import hash_split

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 1000  # fractions sum to 1 → every row assigned
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, set()).add(r.doc_id)
    # disjoint + roughly proportional
    assert sum(len(v) for v in by_split.values()) == 1000
    assert 700 < len(by_split["train"]) < 900
    # deterministic across invocations
    again = {(r.doc_id, r.split) for r in hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == {(r.doc_id, r.split) for r in rows}
    # remainder dropped when fractions sum < 1
    part = hash_split(df, {"a": 0.5}).count()
    assert 400 < part < 600
    with pytest.raises(ValueError, match="sum"):
        hash_split(df, {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError, match="negative"):
        hash_split(df, {"a": -0.1})
    with pytest.raises(ValueError, match="at least one"):
        hash_split(df, {})


def test_hash_split_agrees_with_hash_sample(spark):
    """The first split's membership equals hash_sample at the same fraction
    and salt — one consistent bucketing across both primitives."""
    from stackstac_spark.operators.sampling import hash_sample, hash_split

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_split(df, {"train": 0.3}).collect()}
    b = {r.doc_id for r in hash_sample(df, 0.3).collect()}
    assert a == b


def test_script_stats_counts(spark):
    from stackstac_spark.operators.textstats import script_stats

    docs = spark.createDataFrame(
        [(0, "Ab1 ,x"), (1, ""), (2, "日本語abc")],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r for r in script_stats(docs).collect()}
    r0 = got[0]
    assert (r0.n_chars, r0.n_latin, r0.n_digit, r0.n_space, r0.n_punct, r0.n_other) == (6, 3, 1, 1, 1, 0)
    assert r0.latin_ratio == 0.5
    r1 = got[1]
    assert r1.n_chars == 0 and r1.latin_ratio == 0.0 and r1.digit_ratio == 0.0
    r2 = got[2]
    assert r2.n_latin == 3 and r2.n_other == 3


def test_script_stats_map_only(spark):
    from stackstac_spark.operators.textstats import script_stats

    docs = spark.createDataFrame([(0, "abc")], "doc_id LONG, text STRING")
    plan = script_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_stats_counts_and_nulls(spark):
    from stackstac_spark.operators.dedup import dedup_stats, exact_duplicates

    docs = spark.createDataFrame(
        [
            (0, "hello  world", "a"),   # normalizes same as 1
            (1, "hello world", "a"),
            (2, "other", "a"),
            (3, None, "a"),             # NULL text: a doc, not a content
            (4, "unique", "b"),
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {r["group"]: r for r in dedup_stats(docs, group_col="source").collect()}
    a = got["a"]
    assert (a.n_docs, a.n_contents, a.n_dupes) == (4, 2, 1)
    assert a.dup_ratio == round(1 - 2 / 3, 6)
    b = got["b"]
    assert (b.n_docs, b.n_contents, b.n_dupes, b.dup_ratio) == (1, 1, 0, 0.0)
    # consistency with exact_duplicates: total surplus copies match n_dupes
    surplus = sum(
        r.n_copies - 1
        for r in exact_duplicates(docs.filter(F.col("source") == "a")).collect()
    )
    assert surplus == a.n_dupes


def test_pool_embeddings_modes(spark):
    from stackstac_spark.operators.similarity import pool_embeddings

    df = spark.createDataFrame(
        [(0, "a", [1.0, 5.0]), (1, "a", [3.0, 1.0]), (2, "b", [2.0, 2.0])],
        "vec_id LONG, doc STRING, embedding ARRAY<DOUBLE>",
    )
    for mode, expect_a in (
        ("mean", [2.0, 3.0]),
        ("sum", [4.0, 6.0]),
        ("max", [3.0, 5.0]),
    ):
        got = {r.doc: (r.n_chunks, r.pooled) for r in pool_embeddings(df, "doc", mode=mode).collect()}
        assert got["a"] == (2, expect_a), (mode, got)
        assert got["b"] == (1, [2.0, 2.0])
    with pytest.raises(ValueError, match="mode"):
        pool_embeddings(df, "doc", mode="min")


def test_pool_embeddings_deterministic_fold_order(spark):
    """mean pooling folds in order_col order — same result across runs and
    partitionings even where float addition is not associative."""
    from stackstac_spark.operators.similarity import pool_embeddings

    rng = np.random.default_rng(0)
    rows = [(i, "d", [float(x) for x in rng.normal(size=4)]) for i in range(40)]
    df1 = spark.createDataFrame(rows, "vec_id LONG, doc STRING, embedding ARRAY<DOUBLE>")
    df8 = df1.repartition(8)
    a = pool_embeddings(df1, "doc", mode="mean").collect()[0].pooled
    b = pool_embeddings(df8, "doc", mode="mean").collect()[0].pooled
    assert a == b  # bit-identical, not approximately


def test_score_normalize_zscore_and_zero_variance(spark):
    from stackstac_spark.operators.textstats import score_normalize

    df = spark.createDataFrame(
        [(0, "a", 10.0), (1, "a", 20.0), (2, "a", 30.0), (3, "b", 5.0), (4, "b", 5.0)],
        "doc_id LONG, source STRING, score DOUBLE",
    )
    got = {r.doc_id: r.z for r in score_normalize(df, "score").collect()}
    sd = float(np.std([10, 20, 30]))  # population std
    assert got[0] == round((10 - 20) / sd, 4)
    assert got[2] == round((30 - 20) / sd, 4)
    # zero-variance group: z = 0, not a division error
    assert got[3] == 0.0 and got[4] == 0.0


def test_boilerplate_lines_drops_from_all_docs(spark):
    """min_df=2: a block shared by two docs vanishes from BOTH (unlike
    paragraph_dedup, which keeps the first occurrence)."""
    from stackstac_spark.operators.dedup import boilerplate_lines

    docs = spark.createDataFrame(
        [
            (0, "cookie banner\nreal content zero"),
            (1, "cookie banner\nreal content one"),
            (2, "only unique text here"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: r
        for r in boilerplate_lines(docs, min_df=2, delim=r"\n", join_delim="\n").collect()
    }
    assert got[0].n_blocks == 2 and got[0].n_kept == 1
    assert got[0].clean_text == "real content zero"
    assert got[1].clean_text == "real content one"
    assert got[2].n_kept == 1 and got[2].clean_text == "only unique text here"
    # repeated WITHIN one doc but in no other: df counts DISTINCT docs
    solo = spark.createDataFrame(
        [(0, "x\nx\ny")], "doc_id LONG, text STRING"
    )
    r = boilerplate_lines(solo, min_df=2, delim=r"\n", join_delim="\n").collect()[0]
    assert r.n_kept == 3  # 'x' appears twice but only in one doc — kept
    with pytest.raises(ValueError, match="min_df"):
        boilerplate_lines(docs, min_df=0)


def test_remove_top_component_matches_numpy(spark):
    """All-but-the-Top: coef/residual match a numpy replay of the same
    moments + unnormalized power iteration; residuals are orthogonal to
    the learned component."""
    from stackstac_spark.operators.similarity import remove_top_component

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 6))
    base[:, 0] += 4.0 * rng.normal(size=40)  # dominant direction
    emb = _emb_df(spark, base)
    got = {r.vec_id: r for r in remove_top_component(emb, n_iters=6).collect()}
    mu = base.mean(0)
    cov = (base.T @ base) / len(base) - np.outer(mu, mu)
    v = np.ones(6)
    for _ in range(6):
        v = cov @ v
    u = v / np.linalg.norm(v)
    for i in range(40):
        c = float((base[i] - mu) @ u)
        resid = (base[i] - mu) - c * u
        assert got[i].coef == pytest.approx(round(c, 6), abs=1e-6)
        assert got[i].resid_norm == pytest.approx(round(float(np.linalg.norm(resid)), 6), abs=1e-6)
        assert abs(np.asarray(got[i].resid) @ u) < 1e-8  # orthogonality


# --- Hypothesis fuzz -------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**16),
    min_df=st.integers(1, 3),
    n_docs=st.integers(2, 8),
)
def test_boilerplate_lines_fuzz_vs_python(spark, seed, min_df, n_docs):
    from stackstac_spark.operators.dedup import boilerplate_lines

    rng = np.random.default_rng(seed)
    lines = [f"l{i}" for i in range(5)]
    docs = [
        (i, "\n".join(rng.choice(lines, size=rng.integers(1, 6)).tolist()))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r.doc_id: (r.n_blocks, r.n_kept, r.clean_text)
        for r in boilerplate_lines(df, min_df=min_df, delim=r"\n", join_delim="\n").collect()
    }
    # python oracle
    from collections import defaultdict
    df_count: dict = defaultdict(set)
    for i, text in docs:
        for ln in text.split("\n"):
            df_count[ln].add(i)
    for i, text in docs:
        blocks = text.split("\n")
        kept = [b for b in blocks if len(df_count[b]) < min_df]
        assert got[i] == (len(blocks), len(kept), "\n".join(kept)), (i, text)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fracs=st.lists(st.floats(0.05, 0.5), min_size=1, max_size=4),
    salt=st.sampled_from(["", "a", "b"]),
)
def test_hash_split_fuzz_partition(spark, fracs, salt):
    """Any fraction list (sum <= 1): splits are disjoint, deterministic,
    and every assigned row's bucket lies in its split's range."""
    from stackstac_spark.operators.sampling import hash_split

    total = sum(fracs)
    if total > 1.0:
        fracs = [f / total for f in fracs]
    names = [f"s{i}" for i in range(len(fracs))]
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = hash_split(df, dict(zip(names, fracs)), salt=salt).collect()
    seen = {}
    for r in out:
        assert r.doc_id not in seen  # one split per row
        seen[r.doc_id] = r.split
    import hashlib
    bounds = []
    cum = 0.0
    for n, f in zip(names, fracs):
        lo, cum = cum, cum + f
        bounds.append((n, int(round(lo, 12) * 16**8), int(round(cum, 12) * 16**8)))
    for doc_id, split in seen.items():
        b = int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8], 16)
        expect = next((n for n, lo, hi in bounds if lo <= b < hi), None)
        assert split == expect, (doc_id, split, expect)
