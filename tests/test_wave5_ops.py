"""r9 wave-5 operators: kNN / nearest-centroid embedding classifiers,
DDSketch quantiles (relative-error bound), lexical JSON schema profiling,
Wilson lower-bound ranking."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _clusters(spark, n_per=20, noise=0.05):
    import random

    rng = random.Random(41)
    centers = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}
    rows = []
    i = 0
    for lab, c in centers.items():
        for _ in range(n_per):
            rows.append((i, [x + rng.uniform(-noise, noise) for x in c], lab))
            i += 1
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")


def test_knn_classify_separable_clusters(spark):
    from stackstac_spark.operators.similarity import knn_classify

    emb = _clusters(spark)
    train = emb.filter(F.col("vec_id") % 4 != 0)
    test = emb.filter(F.col("vec_id") % 4 == 0)
    out = knn_classify(train, test, k=3).collect()
    assert len(out) == test.count()
    assert all(r["correct"] for r in out)  # trivially separable
    assert all(r["pred"] == r["label"] for r in out)


def test_knn_classify_majority_vote_tiebreak(spark):
    from stackstac_spark.operators.similarity import knn_classify

    # two train vectors equidistant from the query with different labels,
    # k=2 -> 1-1 vote tie -> smaller label wins
    train = spark.createDataFrame(
        [(1, [1.0, 0.1], 5), (2, [1.0, -0.1], 3)],
        "vec_id LONG, embedding ARRAY<DOUBLE>, label INT",
    )
    test = spark.createDataFrame(
        [(10, [1.0, 0.0], 5)], "vec_id LONG, embedding ARRAY<DOUBLE>, label INT"
    )
    out = knn_classify(train, test, k=2).collect()[0]
    assert out["pred"] == 3  # smaller label on tie


def test_centroid_classify_matches_brute(spark):
    from stackstac_spark.operators.similarity import centroid_classify

    emb = _clusters(spark, n_per=15)
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = emb.filter(F.col("vec_id") % 5 == 0)
    out = centroid_classify(train, test).collect()
    assert len(out) == test.count()
    assert all(r["correct"] for r in out)

    # brute: centroids + cosine argmax in python
    tr = train.collect()
    cents = {}
    for lab in (0, 1, 2):
        vs = [r["embedding"] for r in tr if r["label"] == lab]
        cents[lab] = [round(sum(col) / len(vs), 6) for col in zip(*vs)]
    for r in test.collect():
        best = max(
            cents,
            key=lambda lb: (
                round(
                    sum(a * b for a, b in zip(r["embedding"], cents[lb]))
                    / (
                        math.sqrt(sum(x * x for x in r["embedding"]))
                        * math.sqrt(sum(x * x for x in cents[lb]))
                    ),
                    6,
                ),
                -lb,
            ),
        )
        got = next(o for o in out if o["vec_id"] == r["vec_id"])
        assert got["pred"] == best


def test_ddsketch_relative_error_bound(spark):
    from stackstac_spark.operators.sketch import ddsketch_quantiles

    import random

    rng = random.Random(8)
    vals = [rng.lognormvariate(3, 1.2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    alpha = 0.02
    out = ddsketch_quantiles(df, "x", qs=(0.5, 0.9, 0.99), alpha=alpha).collect()
    svals = sorted(vals)
    for r in out:
        exact = svals[int(math.floor(r["q"] * (len(vals) - 1)))]
        assert abs(r["est"] - exact) / exact <= alpha + 1e-6, (r["q"], r["est"], exact)
        assert r["n"] == 5000


def test_ddsketch_rejects_bad_alpha(spark):
    from stackstac_spark.operators.sketch import ddsketch_quantiles

    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError):
        ddsketch_quantiles(df, "x", alpha=1.5)


def test_json_schema_infer_hand_case(spark):
    from stackstac_spark.operators.webtext import json_schema_infer

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "c": true, "d": null}',),
        ('{"a": "notnum", "e": [1], "f": {"g": 7}}',),
    ]
    df = spark.createDataFrame(rows, ["payload"])
    out = {(r["key"], r["value_type"]): (r["n"], r["coverage"])
           for r in json_schema_infer(df, "payload").collect()}
    assert out[("a", "number")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert out[("a", "string")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert out[("b", "string")][0] == 1
    assert out[("c", "boolean")][0] == 1
    assert out[("d", "null")][0] == 1
    assert out[("e", "array")][0] == 1
    assert out[("f", "object")][0] == 1
    assert out[("g", "number")][0] == 1  # nested keys counted (documented)


def test_wilson_rank_small_sample_honesty(spark):
    from stackstac_spark.operators.evalmetrics import wilson_rank

    # 2/2 perfect small sample must rank BELOW 95/100
    rows = [("tiny", 1)] * 2 + [("big", 1)] * 95 + [("big", 0)] * 5
    df = spark.createDataFrame(rows, ["g", "ok"])
    out = wilson_rank(df, "g", "ok").collect()
    assert [r["group"] for r in out] == ["big", "tiny"]
    big = out[0]
    # closed-form check for 95/100 at z=1.96
    p, n, z2 = 0.95, 100, 1.96 * 1.96
    want = (p + z2 / (2 * n) - 1.96 * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (1 + z2 / n)
    assert big["wilson_lb"] == pytest.approx(round(want, 6), abs=1e-9)
    assert big["rate"] == pytest.approx(0.95)
