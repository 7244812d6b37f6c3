"""stackstac_spark.plans.audit: the plan-invariant API the per-operator
guards use ad hoc, exposed as a library — verified against plans with known
structure."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_report_counts_shuffles_and_joins(spark):
    from stackstac_spark.plans import audit

    a = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    b = spark.range(50).select(F.col("id").alias("k2"), F.lit(1).alias("v"))
    joined = a.join(F.broadcast(b), a.k == b.k2).groupBy("k").count()
    rep = audit.report(joined)
    assert rep["n_joins"] == 1 and rep["join_kinds"] == ["BroadcastHashJoin"]
    assert rep["n_broadcasts"] >= 1
    assert not rep["has_cartesian"] and not rep["has_nested_loop"]
    assert rep["n_exchanges"] >= 1  # the groupBy shuffle
    # AQE wraps the plan pre-execution, so codegen spans may print as 0 here
    assert rep["wholestage_codegen_spans"] >= 0


def test_report_flags_cartesian_and_partitionless_window(spark):
    from pyspark.sql import Window

    from stackstac_spark.plans import audit

    a = spark.range(10)
    b = spark.range(10).select(F.col("id").alias("jd"))
    # a small cross join broadcasts → BNLJ; has_cartesian is reserved for
    # the true CartesianProduct node (both sides big)
    rep = audit.report(a.crossJoin(b))
    assert rep["has_nested_loop"] and not rep["has_cartesian"]

    w_bad = Window.orderBy("id")
    bad = spark.range(10).withColumn("rn", F.row_number().over(w_bad))
    assert audit.report(bad)["partitionless_windows"] == 1

    w_ok = Window.partitionBy(F.col("id") % 3).orderBy("id")
    ok = spark.range(10).withColumn("rn", F.row_number().over(w_ok))
    assert audit.report(ok)["partitionless_windows"] == 0


def test_report_python_eval_classification(spark):
    from stackstac_spark.plans import audit

    @F.udf("long")
    def slow_udf(x):
        return x + 1

    rep = audit.report(spark.range(10).select(slow_udf("id")))
    assert rep["python_eval_nodes"]["row_at_a_time"] == 1

    import pandas as pd

    def k(it):
        for pdf in it:
            yield pdf

    rep2 = audit.report(spark.range(10).mapInPandas(k, "id long"))
    assert rep2["python_eval_nodes"]["arrow_batched"] == 1
    assert rep2["python_eval_nodes"]["row_at_a_time"] == 0


def test_expect_raises_with_named_violation(spark):
    from stackstac_spark.plans import audit

    df = spark.range(100).crossJoin(spark.range(3).select(F.col("id").alias("j")))
    with pytest.raises(AssertionError, match="nested-loop"):
        audit.expect(df, forbid_nested_loop=True)
    top = spark.range(100).orderBy(F.desc("id")).limit(5)
    rep = audit.expect(top, forbid_cartesian=True)
    assert rep["has_take_ordered"]


def test_expect_on_engine_operators(spark):
    """The API gates real engine ops: bloom predicate is map-only; bm25 is
    TakeOrdered with no cartesian and no row-at-a-time Python."""
    from stackstac_spark.operators.bloom import bloom_build, bloom_predicate
    from stackstac_spark.operators.textstats import bm25_topk
    from stackstac_spark.plans import audit

    keys = spark.createDataFrame([(f"k{i}",) for i in range(10)], "t STRING")
    words = bloom_build(keys, "t", m_bits=512)
    big = spark.range(100).select(F.concat(F.lit("k"), F.col("id")).alias("t"))
    rep = audit.expect(
        big.filter(bloom_predicate(F.col("t"), words)),
        max_exchanges=0,
        forbid_cartesian=True,
        forbid_python_eval=True,
    )
    assert rep["n_joins"] == 0

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} spark table") for i in range(100)], "doc_id LONG, text STRING"
    )
    rep2 = audit.expect(
        bm25_topk(docs, ["spark"], k=3),
        forbid_cartesian=True,
        forbid_python_eval=True,
        forbid_partitionless_windows=True,
    )
    assert rep2["has_take_ordered"]


def test_report_counts_single_partition_exchange(spark):
    from stackstac_spark.plans import audit

    rep = audit.report(spark.range(100).repartition(1))
    assert rep["n_exchanges"] == 1 and rep["n_single_partition"] == 1
    with pytest.raises(AssertionError, match="n_exchanges"):
        audit.expect(spark.range(100).repartition(1), max_exchanges=0)
