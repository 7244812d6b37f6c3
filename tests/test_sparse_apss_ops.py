"""r8 wave-4 operators: sparse APSS top-k, phrase blocklist, Neyman
stratified sampling."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_sparse_cosine_topk_identical_docs_rank_first(spark):
    from stackstac_spark.operators.textstats import sparse_cosine_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # identical to 1
            (3, "alpha beta zeta eta"),  # half overlap
            (4, "completely different words here"),
        ],
        ["doc_id", "text"],
    )
    out = sparse_cosine_topk(docs, k=2, max_df=None)
    top = {
        r["query_id"]: r["match_id"] for r in out.filter("rank = 1").collect()
    }
    assert top[1] == 2 and top[2] == 1
    sims = {(r["query_id"], r["match_id"]): r["sim"] for r in out.collect()}
    assert sims[(1, 2)] == 1.0
    assert (4, 1) not in sims  # disjoint vocab -> no pair at all


def test_sparse_cosine_topk_max_df_prunes_stopwords(spark):
    from stackstac_spark.operators.textstats import sparse_cosine_topk

    # "the" is in every doc; with max_df=2 it can't create pairs
    docs = spark.createDataFrame(
        [(1, "the aaa bbb"), (2, "the ccc ddd"), (3, "the eee fff")],
        ["doc_id", "text"],
    )
    assert sparse_cosine_topk(docs, k=2, max_df=2).count() == 0
    assert sparse_cosine_topk(docs, k=2, max_df=None).count() > 0


def test_phrase_blocklist_counts_overlaps(spark):
    from stackstac_spark.operators.webtext import phrase_blocklist_hits

    docs = spark.createDataFrame(
        [
            (1, "click here to click here now"),
            (2, "all rights reserved"),
            (3, "nothing to see"),
        ],
        ["doc_id", "text"],
    )
    phrases = spark.createDataFrame(
        [("click here",), ("all rights reserved",)], ["phrase"]
    )
    out = {r["doc_id"]: r for r in phrase_blocklist_hits(docs, phrases).collect()}
    assert out[1]["n_phrase_hits"] == 2 and out[1]["n_distinct_phrases"] == 1
    assert out[2]["n_phrase_hits"] == 1 and out[2]["n_distinct_phrases"] == 1
    assert out[3]["n_phrase_hits"] == 0  # zero-hit doc survives


def test_phrase_blocklist_rejects_degenerate_phrase(spark):
    from stackstac_spark.operators.webtext import phrase_blocklist_hits

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    phrases = spark.createDataFrame([("a " * 39 + "b",)], ["phrase"])
    with pytest.raises(ValueError, match="max_phrase_words"):
        phrase_blocklist_hits(docs, phrases)


def test_neyman_allocates_by_spread(spark):
    from stackstac_spark.operators.sampling import neyman_sample

    # stratum A: constant (sd 0, but same size) -> gets the floor of 1;
    # stratum B: high spread -> gets nearly the whole budget
    rows = [(i, "A", 100) for i in range(50)] + [
        (100 + i, "B", (i * 37) % 1000) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = neyman_sample(df, budget=20, value_col="n_chars")
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["A"] == 1  # sd = 0 -> floor allocation of 1
    assert per["B"] >= 15  # spread stratum absorbs the budget
    # never exceeds stratum size and is deterministic
    again = neyman_sample(df, budget=20, value_col="n_chars")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_neyman_alloc_caps_at_stratum_size(spark):
    from stackstac_spark.operators.sampling import neyman_sample

    rows = [(i, "A", i) for i in range(5)] + [(10 + i, "B", 7) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = neyman_sample(df, budget=1000, value_col="n_chars")
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["A"] == 5  # capped at N_h even with a huge budget
