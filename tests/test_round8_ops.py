"""Round-8 operators: corpus diagnostics (Zipf fit, keyness, readability,
Gini), fuzzy matching (Levenshtein / Jaro-Winkler blocked joins), MMR
selection, margin-based bitext mining, RLE layout audit, and the streaming
upsert sink — exact-regime checks vs hand values / Python oracles plus the
determinism properties the DuckDB gates rely on."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ------------------------------------------------------------ jaro-winkler


def test_jaro_winkler_matches_duckdb_cell_for_cell():
    """The gate replays DuckDB's jaro_winkler_similarity — pin our pure-
    Python implementation to it on deterministic pseudo-random strings
    (several hundred pairs across lengths, incl. empties and equals)."""
    import duckdb

    from stackstac_spark.operators.linkage import jaro_winkler

    import hashlib

    def pseudo_word(seed: str, n: int) -> str:
        h = hashlib.md5(seed.encode()).hexdigest()
        return "".join(chr(ord("a") + int(c, 16) % 13) for c in h)[:n]

    con = duckdb.connect()
    pairs = [("", ""), ("", "abc"), ("abc", "abc"), ("martha", "marhta"),
             ("dixon", "dicksonx"), ("jellyfish", "smellyfish")]
    for i in range(300):
        a = pseudo_word(f"a{i}", 1 + i % 11)
        b = pseudo_word(f"b{i}", 1 + (i * 7) % 11)
        pairs.append((a, b))
        # high-overlap variants (the regime the threshold gate lives in)
        pairs.append((a, a[:-1] + "z" if len(a) > 1 else a))
    for a, b in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        got = jaro_winkler(a, b)
        assert got == pytest.approx(want, abs=1e-12), (a, b, got, want)


def test_jw_vectorized_equals_scalar_hypothesis():
    """The numpy batch scorer must agree with the scalar reference (which
    is itself pinned to DuckDB above) on arbitrary strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stackstac_spark.operators.linkage import _jw_batch, jaro_winkler

    alpha = st.text(alphabet="abcde", max_size=14)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(alpha, alpha), min_size=1, max_size=8))
    def prop(pairs):
        sa = [p[0] for p in pairs]
        sb = [p[1] for p in pairs]
        got = _jw_batch(sa, sb)
        for i, (a, b) in enumerate(pairs):
            assert got[i] == pytest.approx(jaro_winkler(a, b), abs=1e-12), (a, b)

    prop()


def test_jw_bound_is_sound_hypothesis():
    """Prune-only guarantee: the prefilter bound can NEVER fall below the
    true Jaro-Winkler score — a dropped pair would silently corrupt the
    fuzzy join. Checked on arbitrary strings, including the adversarial
    high-overlap regime."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stackstac_spark.operators.linkage import _jw_bound_py, jaro_winkler

    alpha = st.text(alphabet="abcdef", max_size=16)

    @settings(max_examples=500, deadline=None)
    @given(alpha, alpha)
    def prop(a, b):
        assert _jw_bound_py(a, b) >= jaro_winkler(a, b) - 1e-12, (a, b)

    prop()


def test_jw_bound_column_matches_python(spark):
    """Chain the Hypothesis property to the Catalyst expression: the SQL
    bound equals the pure-Python mirror on a deterministic sample."""
    import hashlib

    from pyspark.sql import functions as F

    from stackstac_spark.operators.linkage import _jw_bound_py, jaro_winkler_bound

    def w(seed, n):
        h = hashlib.md5(seed.encode()).hexdigest()
        return "".join(chr(ord("a") + int(c, 16) % 9) for c in h)[:n]

    rows = [(w(f"x{i}", 1 + i % 12), w(f"y{i}", 1 + (i * 5) % 12)) for i in range(120)]
    rows += [("", ""), ("", "abc"), ("same", "same"), ("ab", "ab")]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select("a", "b", jaro_winkler_bound(F.col("a"), F.col("b")).alias("ub")).collect()
    for r in got:
        assert r["ub"] == pytest.approx(_jw_bound_py(r["a"], r["b"]), abs=1e-9), (
            r["a"], r["b"],
        )


def test_jw_pairs_prefilter_never_drops_matches(spark):
    """End-to-end: jaro_winkler_pairs (prefilter + vectorized scorer) on
    clustered strings returns EXACTLY the brute-force qualifying pair set."""
    import itertools

    from stackstac_spark.operators.linkage import jaro_winkler, jaro_winkler_pairs

    names = [
        "martha stewart", "marhta stewart", "martha stewwart",
        "jonathan smith", "jonathon smith", "jon smith",
        "xylophone corp", "zzz unrelated",
    ]
    rows = [(i, "blk", nm) for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, ["rid", "blk", "nm"])
    for thr in (0.8, 0.9, 0.95):
        got = {
            (r["id_a"], r["id_b"])
            for r in jaro_winkler_pairs(df, "nm", ["blk"], "rid", threshold=thr).collect()
        }
        want = {
            (i, j)
            for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
            if round(jaro_winkler(a, b), 6) >= thr
        }
        assert got == want, thr


def test_edit_distance_pairs_blocked(spark):
    from stackstac_spark.operators.linkage import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "g1", "kitten"), (2, "g1", "sitting"), (3, "g1", "kitten"),
         (4, "g2", "kitten")],  # g2: different block, never paired with g1
        "id LONG, blk STRING, s STRING",
    )
    rows = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in edit_distance_pairs(df, "s", ["blk"], "id", max_distance=3).collect()
    }
    assert rows == {(1, 2): 3, (1, 3): 0, (2, 3): 3}


# ------------------------------------------------------------ text stats


def test_zipf_fit_perfect_powerlaw(spark):
    """Text with count(term_i) = 2^(10-i) gives ln c = ln(2^10) - s·ln r
    only approximately (ranks aren't log-spaced) — instead check the exact
    -1 slope case: counts proportional to 1/rank."""
    from stackstac_spark.operators.textstats import zipf_fit

    words = []
    base = 120
    for i in range(1, 7):
        words += [f"w{i:02d}"] * (base // i)
    df = spark.createDataFrame([(1, "x", " ".join(words))], "doc_id LONG, lang STRING, text STRING")
    row = zipf_fit(df, by="lang", top_n=10).collect()[0]
    assert row["n_terms"] == 6
    # counts 120,60,40,30,24,20 = 120/r exactly -> slope -1, r2 1
    assert row["slope"] == pytest.approx(-1.0, abs=1e-6)
    assert row["r2"] == pytest.approx(1.0, abs=1e-6)


def test_keyness_planted_keyword(spark):
    from stackstac_spark.operators.textstats import keyness_llr

    rows = []
    for i in range(10):
        filler = "common words shared by every source here"
        rows.append((i, "srcA", filler + " zebra zebra zebra"))
        rows.append((i + 10, "srcB", filler))
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    out = keyness_llr(df, group="source", k=3, min_count=3).collect()
    top_a = [r for r in out if r["source"] == "srcA"][0]
    assert top_a["term"] == "zebra" and top_a["rank"] == 1
    assert top_a["llr"] > 0
    # zebra never appears in srcB, so it can't be srcB's keyword
    assert all(r["term"] != "zebra" for r in out if r["source"] == "srcB")


def test_flesch_hand_value(spark):
    from stackstac_spark.operators.textstats import flesch_readability

    # "the cat sat. it ran!" -> words=5, sents=2, syllables: the(1) cat(1)
    # sat.(1) it(1) ran!(1) = 5  (punctuation carries no vowel groups)
    df = spark.createDataFrame(
        [(7, "the cat sat. it ran!")], "doc_id LONG, text STRING"
    )
    r = flesch_readability(df).collect()[0]
    assert (r["n_words"], r["n_sents"], r["n_syll"]) == (5, 2, 5)
    want = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert r["fre"] == pytest.approx(round(want, 4), abs=1e-9)


def test_flesch_no_vowel_token_counts_one_syllable(spark):
    from stackstac_spark.operators.textstats import flesch_readability

    df = spark.createDataFrame([(1, "xkcd 42")], "doc_id LONG, text STRING")
    r = flesch_readability(df).collect()[0]
    assert (r["n_words"], r["n_sents"], r["n_syll"]) == (2, 1, 2)


def test_token_gini_uniform_and_skewed(spark):
    from stackstac_spark.operators.textstats import token_gini

    uni = spark.createDataFrame(
        [(1, "en", "a b c d")], "doc_id LONG, lang STRING, text STRING"
    )
    g = token_gini(uni, by="lang").collect()[0]
    # equal frequencies: G = 2*(1+2+3+4)/(4*4) - 5/4 = 0
    assert g["gini"] == pytest.approx(0.0, abs=1e-9)
    skew = spark.createDataFrame(
        [(1, "en", " ".join(["z"] * 98) + " a b")],
        "doc_id LONG, lang STRING, text STRING",
    )
    g2 = token_gini(skew, by="lang").collect()[0]
    # f=(1,1,98): G = 2*(1*1+2*1+3*98)/(3*100) - 4/3
    want = 2.0 * (1 + 2 + 3 * 98) / (3 * 100) - 4.0 / 3.0
    assert g2["gini"] == pytest.approx(round(want, 6), abs=1e-9)
    assert g2["gini"] > 0.6


# ------------------------------------------------------------ mmr


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )


def test_mmr_lambda_one_is_pure_relevance(spark):
    from stackstac_spark.operators.similarity import mmr_select

    # query = e0; relevance order: v1 (cos 1.0), v2 (~0.89), v3 (0.0)
    df = _emb_df(spark, [[1, 0], [2, 0], [2, 1], [0, 3]])
    out = mmr_select(df, query_id=0, k=3, lam=1.0).collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert out[0]["rel"] == pytest.approx(1.0)


def test_mmr_diversity_flips_second_pick(spark):
    from stackstac_spark.operators.similarity import mmr_select

    # v1 parallel to the query, v2 a near-duplicate of v1, v3 orthogonal
    # and less relevant. lam=0.3 must pick the diverse v3 second.
    df = _emb_df(spark, [[1.0, 0.2], [2.0, 0.4], [0.98, 0.21], [-0.2, 1.0]])
    out = mmr_select(df, query_id=0, k=2, lam=0.3)
    ids = [r["vec_id"] for r in out.collect()]
    assert ids[0] == 1  # most relevant first
    assert ids[1] == 3  # diversity beats the near-duplicate v2


def test_mmr_rejects_missing_query(spark):
    from stackstac_spark.operators.similarity import mmr_select

    df = _emb_df(spark, [[1, 0]])
    with pytest.raises(ValueError, match="query id"):
        mmr_select(df, query_id=99, k=1)


# ------------------------------------------------------------ bitext


def test_bitext_mutual_pair_found(spark):
    from stackstac_spark.operators.similarity import bitext_margin_pairs

    # s0<->t0 near-parallel (the true pair); s1,t1 point elsewhere
    src = _emb_df(spark, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    tgt = _emb_df(spark, [[0.99, 0.1, 0.0], [0.0, 0.0, 1.0]])
    out = bitext_margin_pairs(src, tgt, knn=2, threshold=1.0).collect()
    pairs = {(r["src_id"], r["tgt_id"]) for r in out}
    assert (0, 0) in pairs
    for r in out:
        assert r["margin"] >= 1.0


def test_bitext_mutuality_is_enforced(spark):
    from stackstac_spark.operators.similarity import bitext_margin_pairs

    # both sources' best target is t0 -> only one of them can be mutual
    src = _emb_df(spark, [[1.0, 0.0], [0.9, 0.1]])
    tgt = _emb_df(spark, [[1.0, 0.05]])
    out = bitext_margin_pairs(src, tgt, knn=1, threshold=0.0).collect()
    assert len(out) <= 1


def test_hamming_candidates_recover_planted_pairs(spark):
    import random

    from stackstac_spark.operators.similarity import hamming_candidate_pairs

    # 20 random src vectors; tgt = slightly perturbed copies (planted
    # translations) + 10 unrelated vectors. Banding must surface every
    # planted (i, i) pair; unrelated ids only survive if they happen to
    # share a band AND make a shortlist.
    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(20)]
    src = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    tgt_rows = [
        (i, [x + rng.uniform(-0.02, 0.02) for x in v]) for i, v in enumerate(base)
    ] + [
        (100 + j, [rng.uniform(-1, 1) for _ in range(64)]) for j in range(10)
    ]
    tgt = spark.createDataFrame(tgt_rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    cand = hamming_candidate_pairs(src, tgt, per_side=4, dim=64, band_bits=8)
    pairs = {(r["src_id"], r["tgt_id"]) for r in cand.collect()}
    for i in range(20):
        assert (i, i) in pairs, f"planted pair {i} missed by banding"


def test_bitext_ann_path_matches_exact_on_planted(spark):
    import random

    from stackstac_spark.operators.similarity import (
        bitext_margin_pairs,
        hamming_candidate_pairs,
    )

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(15)]
    src = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    tgt_rows = [
        (i, [x + rng.uniform(-0.01, 0.01) for x in v]) for i, v in enumerate(base)
    ]
    tgt = spark.createDataFrame(tgt_rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    exact = {
        (r["src_id"], r["tgt_id"])
        for r in bitext_margin_pairs(src, tgt, knn=4, threshold=1.0).collect()
    }
    cand = hamming_candidate_pairs(src, tgt, per_side=8, dim=64, band_bits=8)
    ann = {
        (r["src_id"], r["tgt_id"])
        for r in bitext_margin_pairs(
            src, tgt, knn=4, threshold=1.0, candidates=cand
        ).collect()
    }
    planted = {(i, i) for i in range(15)}
    # every planted translation the exact miner finds, the ANN path finds
    assert planted & exact <= ann
    assert planted <= ann


def test_bitext_ann_plan_has_no_cross_join(spark):
    from stackstac_spark.operators.similarity import (
        bitext_margin_pairs,
        hamming_candidate_pairs,
    )
    from stackstac_spark.plans import audit

    src = _emb_df(spark, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    tgt = _emb_df(spark, [[0.99, 0.1, 0.0], [0.0, 0.0, 1.0]])
    cand = hamming_candidate_pairs(src, tgt, per_side=2, dim=3, band_bits=8)
    df = bitext_margin_pairs(src, tgt, knn=2, threshold=0.0, candidates=cand)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rep = audit.report(df)
    assert not rep["has_cartesian"]


def test_hamming_candidates_max_bucket_guard(spark):
    from stackstac_spark.operators.similarity import hamming_candidate_pairs

    # all-identical vectors: every band bucket holds every row — a
    # max_bucket of 1 must empty the candidate set instead of going
    # quadratic
    vecs = [(i, [1.0] * 64) for i in range(6)]
    src = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<DOUBLE>")
    tgt = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<DOUBLE>")
    n = hamming_candidate_pairs(src, tgt, max_bucket=1).count()
    assert n == 0
    full = hamming_candidate_pairs(src, tgt, per_side=10).count()
    assert full == 36


# ------------------------------------------------------------ rle


def test_rle_run_stats_hand_case(spark):
    from stackstac_spark.operators.storage import rle_run_stats

    rows = [
        # page 1 ordered: a a b  -> 2 runs
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"),
        # page 2 ordered: b b    -> 1 run (page boundary restarts the run)
        (2, 1, "b"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "pg LONG, pos LONG, c STRING")
    r = rle_run_stats(df, ["c"], page_col="pg", order_col="pos").collect()[0]
    assert r["n_rows"] == 5
    assert r["runs_paged"] == 3
    assert r["runs_clustered"] == 2
    assert r["recluster_gain"] == pytest.approx(1.5)


def test_rle_run_stats_tie_rows_are_order_invariant(spark):
    from stackstac_spark.operators.storage import rle_run_stats

    # duplicate (pg, pos) rows with DIFFERENT values: the value tie-break
    # makes the run count well-defined (a,b at the same pos -> sorted a,b)
    rows = [(1, 1, "b"), (1, 1, "a"), (1, 2, "a")]
    df = spark.createDataFrame(rows, "pg LONG, pos LONG, c STRING")
    r = rle_run_stats(df, ["c"], page_col="pg", order_col="pos").collect()[0]
    # order a, b, a -> 3 runs under (pos, value) ordering: a | b | a
    assert r["runs_paged"] == 3


# ------------------------------------------------------------ streaming


def test_upsert_sink_merge_and_idempotent_replay(spark, tmp_path):
    import json

    from stackstac_spark.streaming.ingest import upsert_sink

    in_dir = tmp_path / "in"
    (in_dir / "a").mkdir(parents=True)
    (in_dir / "b").mkdir(parents=True)
    out = str(tmp_path / "out")
    schema = "k LONG, seq INT, val STRING"
    with open(in_dir / "a" / "f.json", "w") as fh:
        for k in range(4):
            fh.write(json.dumps({"k": k, "seq": 1, "val": f"v1-{k}"}) + "\n")
        # stale high-seq row arriving EARLY: must survive the later batch
        fh.write(json.dumps({"k": 0, "seq": 9, "val": "pinned"}) + "\n")
    with open(in_dir / "b" / "f.json", "w") as fh:
        fh.write(json.dumps({"k": 0, "seq": 2, "val": "late-lower-seq"}) + "\n")
        fh.write(json.dumps({"k": 1, "seq": 2, "val": "v2-1"}) + "\n")

    def run():
        q = upsert_sink(
            spark, f"{in_dir}/*", schema, out, keys="k", seq_col="seq",
            checkpoint=str(tmp_path / ("ck%d" % run.n)), max_files_per_trigger=1,
        )
        q.awaitTermination()
        run.n += 1

    run.n = 0
    run()
    state = {r["k"]: (r["seq"], r["val"]) for r in spark.read.parquet(f"{out}/state").collect()}
    assert state == {0: (9, "pinned"), 1: (2, "v2-1"), 2: (1, "v1-2"), 3: (1, "v1-3")}
    # replay the whole feed from a fresh checkpoint: same final state
    run()
    state2 = {r["k"]: (r["seq"], r["val"]) for r in spark.read.parquet(f"{out}/state").collect()}
    assert state2 == state


# ------------------------------------------------------------ gates e2e


def test_round8_gate_shapes(spark):
    """Every r8 gate runs at sf0.001 and returns its contracted columns
    (value equality vs DuckDB lives in scripts/check_correctness.py and
    the driver's CORRECTNESS gate)."""
    import __spark_entry__ as e

    sfd = "/root/testdata/sf0.001"
    qs = e.queries()
    want_cols = {
        "zipf_slope": ["lang", "n_terms", "slope", "intercept", "r2"],
        "keyness_llr": ["source", "rank", "term", "a", "tot", "llr"],
        "readability": ["doc_id", "n_words", "n_sents", "n_syll", "fre"],
        "token_gini": ["lang", "n_terms", "total_tokens", "gini"],
        "edit_distance_pairs": ["id_a", "id_b", "distance"],
        "jaro_winkler_pairs": ["id_a", "id_b", "jw"],
        "mmr_select": ["rank", "vec_id", "rel", "score"],
        "bitext_mine": ["src_id", "tgt_id", "sim", "margin"],
        "rle_runs": ["col_name", "n_rows", "runs_paged", "runs_clustered", "recluster_gain"],
        "geo_knn": ["query_id", "neighbor_id", "dist_km", "rank"],
    }
    for name, cols in want_cols.items():
        df = qs[name](spark, sfd)
        assert df.columns == cols, name
        assert df.count() > 0, name
