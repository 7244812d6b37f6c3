"""r8 wave-6 operators: prefix-filtered set-similarity join, SCD2 history."""

import itertools
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _brute_jaccard_pairs(texts, t, n=1):
    def elems(s):
        toks = s.lower().split()
        if n == 1:
            return set(toks)
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(texts.items()), 2):
        a, b = elems(ta), elems(tb)
        if not a or not b:
            continue
        j = len(a & b) / len(a | b)
        if j >= t:
            out[(ia, ib)] = (len(a & b), j)
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_filter_exact_vs_brute(spark, threshold):
    from stackstac_spark.operators.dedup import prefix_filter_pairs

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon eta",  # 5/7 overlap
        3: "alpha beta gamma delta epsilon zeta",  # identical to 1
        4: "one two three four five six",
        5: "one two three four five seven",
        6: "totally different text body here",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["jaccard"])
        for r in prefix_filter_pairs(df, threshold=threshold).collect()
    }
    want = _brute_jaccard_pairs(texts, threshold)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12


def test_prefix_filter_bigram_elements(spark):
    from stackstac_spark.operators.dedup import prefix_filter_pairs

    # unigram SETS identical (same vocab, different order) -> unigram join
    # pairs them; bigram elements tell them apart
    texts = {1: "a b c d e", 2: "e d c b a", 3: "a b c d e"}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    uni = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_pairs(df, threshold=0.9).collect()
    }
    assert uni == {(1, 2), (1, 3), (2, 3)}
    bi = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_pairs(df, threshold=0.9, shingle_n=2).collect()
    }
    assert bi == {(1, 3)}
    with pytest.raises(ValueError):
        prefix_filter_pairs(df, threshold=0.0)


def test_prefix_filter_exact_boundary_pair(spark):
    # regression: J exactly == t with t·n integral. The old
    # floor((1-t)*n)+1 prefix came up one short ((1-t) rounds DOWN in
    # binary) and silently missed this pair.
    from stackstac_spark.operators.dedup import prefix_filter_pairs

    # |A|=10, |B|=8, inter=8 -> J = 8/10 = 0.8 exactly
    a = " ".join("w%d" % i for i in range(10))
    b = " ".join("w%d" % i for i in range(8))
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    got = prefix_filter_pairs(df, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"], r["inter"], r["jaccard"]) for r in got] == [
        (1, 2, 8, 0.8)
    ]


def test_scd2_history_intervals(spark):
    from stackstac_spark.operators.storage import scd2_history

    rows = [
        # key 1: changes at snap 2
        (1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"),
        # key 2: never changes
        (2, 0, "x"), (2, 1, "x"), (2, 2, "x"), (2, 3, "x"),
        # key 3: changes every snapshot
        (3, 0, "p"), (3, 1, "q"), (3, 2, "r"), (3, 3, "s"),
    ]
    df = spark.createDataFrame(rows, ["key", "snap_id", "attr"])
    out = sorted(
        (r["key"], r["valid_from"], r["valid_to"], r["attr"], r["is_current"])
        for r in scd2_history(df, "key", ["attr"]).collect()
    )
    assert out == [
        (1, 0, 2, "a", False),
        (1, 2, None, "b", True),
        (2, 0, None, "x", True),
        (3, 0, 1, "p", False),
        (3, 1, 2, "q", False),
        (3, 2, 3, "r", False),
        (3, 3, None, "s", True),
    ]


def test_scd2_multi_attr_change_on_either(spark):
    from stackstac_spark.operators.storage import scd2_history

    rows = [(1, 0, "a", 10), (1, 1, "a", 20), (1, 2, "a", 20)]
    df = spark.createDataFrame(rows, ["key", "snap_id", "s", "n"])
    out = scd2_history(df, "key", ["s", "n"]).orderBy("valid_from").collect()
    assert [(r["valid_from"], r["valid_to"], r["n"]) for r in out] == [
        (0, 1, 10),
        (1, None, 20),
    ]


def test_scd2_null_shift_detected(spark):
    # Regression (r9 ADVICE): concat_ws skips NULLs, so (a='x', b=NULL) and
    # (a=NULL, b='x') used to hash identically and collapse into ONE version
    # with the stale attrs marked current. NULL-protected hashing must emit
    # two versions with the new attrs current.
    from stackstac_spark.operators.storage import scd2_history

    rows = [(1, 0, "x", None), (1, 1, None, "x")]
    df = spark.createDataFrame(rows, ["key", "snap_id", "a", "b"])
    out = scd2_history(df, "key", ["a", "b"]).orderBy("valid_from").collect()
    assert [(r["valid_from"], r["valid_to"], r["a"], r["b"], r["is_current"]) for r in out] == [
        (0, 1, "x", None, False),
        (1, None, None, "x", True),
    ]


def test_scd2_null_to_value_and_back(spark):
    from stackstac_spark.operators.storage import scd2_history

    rows = [(7, 0, None), (7, 1, "v"), (7, 2, None), (7, 3, None)]
    df = spark.createDataFrame(rows, ["key", "snap_id", "a"])
    out = scd2_history(df, "key", ["a"]).orderBy("valid_from").collect()
    assert [(r["valid_from"], r["valid_to"], r["a"]) for r in out] == [
        (0, 1, None),
        (1, 2, "v"),
        (2, None, None),
    ]
