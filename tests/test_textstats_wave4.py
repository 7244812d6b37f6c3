"""r9 wave-4 operators: Kneser-Ney scoring, n-gram novelty, chi2 term
selection, term burstiness, blocking evaluation — hand-computed oracles
and the invariants each statistic must satisfy."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_kneser_ney_hand_case(spark):
    from stackstac_spark.operators.textstats import kneser_ney_score

    # corpus: "a b", "a b", "a c" -> bigrams: (a,b)x2, (a,c)x1
    # c(a,.) = 3, N1+(a.) = 2, B = 2 distinct bigrams
    # Pcont(b) = 1/2, Pcont(c) = 1/2, D = 0.75
    # P(b|a) = (2-0.75)/3 + (0.75/3)*2*(1/2) = 0.416667 + 0.25 = 0.666667
    # P(c|a) = (1-0.75)/3 + 0.25 = 0.333333
    df = _docs(spark, ["a b", "a b", "a c"])
    out = {r["doc_id"]: r for r in kneser_ney_score(df).collect()}
    p_b = (2 - 0.75) / 3 + (0.75 / 3) * 2 * 0.5
    p_c = (1 - 0.75) / 3 + (0.75 / 3) * 2 * 0.5
    assert out[0]["ppl_kn"] == pytest.approx(round(1 / p_b, 4), abs=1e-3)
    assert out[2]["ppl_kn"] == pytest.approx(round(1 / p_c, 4), abs=1e-3)
    # KN probabilities over a context sum to <= 1 (discount mass conserved)
    assert p_b + p_c == pytest.approx(1.0, abs=1e-9)


def test_kneser_ney_rejects_bad_discount(spark):
    from stackstac_spark.operators.textstats import kneser_ney_score

    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        kneser_ney_score(df, discount=1.5)


def test_ngram_novelty_bounds_and_known_split(spark):
    from stackstac_spark.operators.textstats import ngram_novelty

    texts = [f"w{i} w{i + 1} w{i + 2} w{i + 3} shared tail tokens" for i in range(40)]
    df = _docs(spark, texts)
    out = ngram_novelty(df, n=3).collect()
    assert len(out) > 0  # some docs land in the test split
    for r in out:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_unseen"] <= r["n_ngrams"]
    # a doc identical to a train doc has novelty 0 iff its grams are all
    # in train; replicate every text so every test gram is covered
    df2 = _docs(spark, ["x y z q r"] * 50)
    for r in ngram_novelty(df2, n=3).collect():
        assert r["novelty"] == 0.0


def test_chi2_hand_case(spark):
    from stackstac_spark.operators.textstats import chi2_terms

    # 4 docs: classes A, A, B, B; "hot" appears only in A docs
    rows = [
        (0, "A", "hot common"),
        (1, "A", "hot common"),
        (2, "B", "cold common"),
        (3, "B", "cold common"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "cls", "text"])
    out = chi2_terms(df, "cls", min_df=1, k=5).collect()
    got = {(r["cls"], r["term"]): r["chi2"] for r in out}
    # hot in A: n11=2 n10=0 n01=0 n00=2 -> chi2 = 4*(2*2-0)^2/(2*2*2*2) = 4
    assert got[("A", "hot")] == pytest.approx(4.0)
    assert got[("B", "cold")] == pytest.approx(4.0)
    # 'common' is independent of class: chi2 denominator zero -> 0
    assert got[("A", "common")] == 0.0


def test_burstiness_content_vs_glue(spark):
    from stackstac_spark.operators.textstats import term_burstiness

    # 'the' once per doc (VMR -> 0 variance/mean small);
    # 'topic' 10x in one doc only (bursty)
    texts = ["the filler words here"] * 9 + ["the " + "topic " * 10]
    df = _docs(spark, texts)
    out = {r["term"]: r for r in term_burstiness(df, min_df=1, k=50).collect()}
    # the: count 1 in all 10 docs -> var 0 -> vmr 0
    assert out["the"]["vmr"] == pytest.approx(0.0, abs=1e-9)
    # topic: mean 1, E[x^2] = 10 -> var 9 -> vmr 9
    assert out["topic"]["vmr"] == pytest.approx(9.0, abs=1e-6)
    assert out["topic"]["rank"] < out["the"]["rank"]


def test_blocking_eval_hand_case(spark):
    from stackstac_spark.operators.linkage import blocking_eval

    # 6 records, blocks {b1: 3 rows, b2: 2 rows, b3: 1 row}
    rows = [(1, "b1"), (2, "b1"), (3, "b1"), (4, "b2"), (5, "b2"), (6, "b3")]
    df = spark.createDataFrame(rows, ["rid", "blk"])
    # truth: (1,2) same block, (1,4) cross block, (5,6) cross block
    truth = spark.createDataFrame([(1, 2), (1, 4), (5, 6)], ["id_a", "id_b"])
    out = blocking_eval(df, truth, ["blk"], "rid").collect()[0]
    assert out["total_pairs"] == 15
    assert out["cand_pairs"] == 3 + 1  # C(3,2) + C(2,2)
    assert out["n_blocks"] == 3
    assert out["matched"] == 1
    assert out["reduction_ratio"] == pytest.approx(1 - 4 / 15, abs=1e-6)
    assert out["completeness"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["quality"] == pytest.approx(1 / 4, abs=1e-6)


def test_blocking_eval_requires_blocks(spark):
    from stackstac_spark.operators.linkage import blocking_eval

    df = spark.createDataFrame([(1, "x"), (2, "y")], ["rid", "blk"])
    truth = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with pytest.raises(ValueError):
        blocking_eval(df, truth, [], "rid")
