"""r8 wave-7 operators: consecutive global ids, bisection quantiles,
feature hashing."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_consecutive_ids_match_global_rank(spark):
    from stackstac_spark.operators.storage import consecutive_ids

    rows = [(i, (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "key"]).repartition(13)
    out = consecutive_ids(df, ["key", "doc_id"]).collect()
    got = {r["doc_id"]: r["row_id"] for r in out}
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    want = {doc: pos for pos, doc in enumerate(order)}
    assert got == want
    # dense 0..N-1
    assert sorted(got.values()) == list(range(500))
    with pytest.raises(ValueError):
        consecutive_ids(df, [])


def test_consecutive_ids_plan_has_no_global_window(spark):
    from stackstac_spark.operators.storage import consecutive_ids
    from stackstac_spark.plans import audit

    df = spark.range(100).select(F.col("id").alias("doc_id"), (F.col("id") % 7).alias("key"))
    rep = audit.report(consecutive_ids(df, ["key", "doc_id"]))
    assert not rep["partitionless_windows"]
    assert not rep["has_cartesian"]


def test_quantile_bisect_exact(spark):
    import random

    from stackstac_spark.operators.sketch import quantile_bisect

    rng = random.Random(3)
    vals = [rng.randrange(-500, 5000) for _ in range(777)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = quantile_bisect(df, "v", qs=(0.0, 0.25, 0.5, 0.9, 1.0))
    s = sorted(vals)
    import math

    for q, value, rank in got:
        k = int(math.floor(q * (len(vals) - 1) + 1e-9)) + 1
        assert rank == k
        assert value == s[k - 1], (q, value, s[k - 1])


def test_quantile_bisect_errors(spark):
    from pyspark.sql import types as T

    from stackstac_spark.operators.sketch import quantile_bisect

    empty = spark.createDataFrame([], T.StructType([T.StructField("v", T.LongType())]))
    with pytest.raises(ValueError):
        quantile_bisect(empty, "v")
    df = spark.createDataFrame([(1,)], ["v"])
    with pytest.raises(ValueError):
        quantile_bisect(df, "v", qs=(1.5,))


def test_feature_hash_deterministic_and_signed(spark):
    from stackstac_spark.operators.textstats import feature_hash

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b a b c"), (3, "z z z")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in feature_hash(df, dim=16).collect()}
    # identical docs -> identical vectors
    assert out[1]["vec"] == out[2]["vec"]
    assert len(out[1]["vec"]) == 16
    # doc 3: one token 3x -> one bucket with |v| = 3, l2 = 9
    assert out[3]["nnz"] == 1 and out[3]["l2_sq"] == 9
    assert sorted(out[3]["vec"])[0] in (-3, 0) and sorted(out[3]["vec"])[-1] in (0, 3)
    with pytest.raises(ValueError):
        feature_hash(df, dim=0)
