"""Range joins, skew salting, bucketed sinks — correctness vs the naive
plan, plus the physical-plan properties that make them scale."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- range join -----------------------------------------------------------


@pytest.fixture(scope="module")
def points_intervals(spark):
    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], "pid LONG, ts LONG"
    )
    ivs = spark.createDataFrame(
        [(0, 5, 30), (1, 25, 26), (2, 90, 180), (3, -20, -3), (4, 40, 40)],
        "iid LONG, start LONG, end LONG",
    )
    return pts, ivs


def test_point_in_interval_matches_naive(spark, points_intervals):
    from stackstac_spark.operators.rangejoin import point_in_interval_join

    pts, ivs = points_intervals
    naive = pts.join(
        ivs, (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    )
    for bw in (1, 7, 64, 1000):
        got = point_in_interval_join(pts, ivs, "ts", "start", "end", bin_width=bw)
        assert sorted(got.collect()) == sorted(naive.collect()), f"bin_width={bw}"


def test_point_in_interval_left_keeps_unmatched(spark, points_intervals):
    from stackstac_spark.operators.rangejoin import point_in_interval_join

    pts, ivs = points_intervals
    got = point_in_interval_join(pts, ivs, "ts", "start", "end", bin_width=16, how="left")
    naive = pts.join(
        ivs, (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")), "left"
    )
    assert sorted(
        (r.pid, r.ts, r.iid) for r in got.collect()
    ) == sorted((r.pid, r.ts, r.iid) for r in naive.collect())


def test_interval_overlap_matches_naive_no_dups(spark):
    from stackstac_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(0, 0, 50), (1, 10, 12), (2, 100, 200), (3, -30, -10)],
        "lid LONG, ls LONG, le LONG",
    )
    right = spark.createDataFrame(
        [(0, 40, 120), (1, -15, 5), (2, 11, 11), (3, 300, 400)],
        "rid LONG, rs LONG, re LONG",
    )
    naive = left.join(
        right, (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    for bw in (4, 17, 1000):
        got = interval_join(left, right, "ls", "le", "rs", "re", bin_width=bw)
        assert sorted(got.collect()) == sorted(naive.collect()), f"bin_width={bw}"


def test_range_join_is_equi_hash_not_nested_loop(spark, points_intervals):
    """The whole point: the bin turns a BETWEEN theta-join into a hash
    equi-join — no BroadcastNestedLoopJoin / CartesianProduct in the plan."""
    from stackstac_spark.operators.rangejoin import point_in_interval_join

    pts, ivs = points_intervals
    plan = _plan(point_in_interval_join(pts, ivs, "ts", "start", "end", bin_width=16))
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# --- salted join ----------------------------------------------------------


def test_salted_join_matches_plain(spark):
    from stackstac_spark.operators.skew import salted_join

    # 90% of the big side lands on one hot key
    big = spark.createDataFrame(
        [(0 if i % 10 else i, f"p{i}", i * 1.5) for i in range(1000)],
        "k LONG, payload STRING, v DOUBLE",
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(0, 1000, 10)], "k LONG, label STRING"
    )
    for how in ("inner", "left"):
        got = salted_join(big, small, "k", n_salts=8, how=how)
        want = big.join(small, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), how


def test_salted_join_spreads_hot_key(spark):
    from stackstac_spark.operators.skew import salted_join, _SALT  # noqa: F401

    big = spark.createDataFrame(
        [(7, f"p{i}") for i in range(500)], "k LONG, payload STRING"
    )
    small = spark.createDataFrame([(7, "hot")], "k LONG, label STRING")
    keys = [on] if isinstance((on := "k"), str) else on
    non_key = [c for c in big.columns if c not in keys]
    n_distinct_salts = (
        big.withColumn("_salt", F.pmod(F.hash(*non_key), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_distinct_salts == 8  # the hot key fans out over every salt
    assert salted_join(big, small, "k", n_salts=8).count() == 500


# --- bucketed sink --------------------------------------------------------


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge-join straight off
    the scan: zero Exchange nodes — the co-located-join contract."""
    from stackstac_spark.sources.sinks import read_table, write_bucketed

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("length")
    )
    embs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("cluster")
    )
    write_bucketed(docs, "t_docs_b", "doc_id", 4, sort_cols="doc_id",
                   path=str(tmp_path / "docs"))
    write_bucketed(embs, "t_embs_b", "doc_id", 4, sort_cols="doc_id",
                   path=str(tmp_path / "embs"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_table(spark, "t_docs_b").join(
                read_table(spark, "t_embs_b"), "doc_id"
            )
            plan = _plan(joined)
            assert "Exchange" not in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_embs_b")


def test_partitioned_write_prunes(spark, tmp_path):
    from stackstac_spark.sources.sinks import write_partitioned

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 5).alias("day")
    )
    write_partitioned(df, str(tmp_path / "p"), "day")
    rd = spark.read.parquet(str(tmp_path / "p")).filter(F.col("day") == 3)
    plan = _plan(rd)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:80]
    assert rd.count() == 20
