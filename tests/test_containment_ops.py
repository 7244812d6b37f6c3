"""operators/dedup.py r8 additions: containment pairs, cross-corpus LSH
decontamination, pair-confusion evaluation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_containment_catches_snippet_jaccard_misses(spark):
    from stackstac_spark.operators.dedup import containment_pairs, jaccard_similarity

    long = "w%d " * 40
    docs = spark.createDataFrame(
        [
            (1, (" ".join("w%d" % i for i in range(40)))),
            (2, (" ".join("w%d" % i for i in range(10)))),  # prefix snippet
            (3, "totally different content here entirely"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): (r["c_a_in_b"], r["c_b_in_a"])
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert (1, 2) in got
    # snippet fully contained in source
    assert got[(1, 2)][1] == 1.0
    # symmetric jaccard for the same pair is far below a dedup threshold
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_similarity(docs).collect()
    }
    assert j[(1, 2)] < 0.5


def test_containment_boilerplate_prune(spark):
    from stackstac_spark.operators.dedup import containment_pairs

    # every doc shares one hyper-common shingle; cap at 2 docs -> pruned,
    # so no pair survives
    docs = spark.createDataFrame(
        [(i, "click here x%d" % i) for i in range(6)],
        ["doc_id", "text"],
    )
    out = containment_pairs(docs, threshold=0.4, max_shingle_docs=2)
    assert out.count() == 0
    # without the cap the shared shingle creates pairs
    assert containment_pairs(docs, threshold=0.4, max_shingle_docs=None).count() > 0


def test_cross_lsh_matches_finds_planted(spark):
    from stackstac_spark.operators.dedup import cross_lsh_matches

    corpus = spark.createDataFrame(
        [
            (1, " ".join("tok%d" % i for i in range(30))),
            (2, "unrelated words entirely different body text here now"),
        ],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame(
        [(101, " ".join("tok%d" % i for i in range(30)))], ["ref_id", "text"]
    )
    out = cross_lsh_matches(corpus, ref, min_est_jaccard=0.5).collect()
    assert [(r["doc_id"], r["ref_id"], r["est_jaccard"]) for r in out] == [
        (1, 101, 1.0)
    ]


def test_cross_lsh_broadcast_plan(spark):
    from stackstac_spark.operators.dedup import cross_lsh_matches

    corpus = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    ref = spark.createDataFrame([(9, "a b c d e")], ["ref_id", "text"])
    plan = cross_lsh_matches(corpus, ref)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pair_confusion_counts(spark):
    from stackstac_spark.operators.dedup import pair_confusion

    detected = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 6)], ["id_a", "id_b"]  # (2,1) dup orientation
    )
    truth = spark.createDataFrame([(1, 2), (3, 4), (7, 8)], ["id_a", "id_b"])
    row = pair_confusion(detected, truth).collect()[0]
    assert (row["n_truth"], row["n_detected"], row["tp"], row["fp"], row["fn"]) == (
        3,
        3,
        2,
        1,
        1,
    )
    assert abs(row["precision"] - 2 / 3) < 1e-15
    assert abs(row["recall"] - 2 / 3) < 1e-15
