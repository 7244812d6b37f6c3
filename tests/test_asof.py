"""Sort-based asof join (operators/asof.py): semantics vs a brute-force
range-join oracle, plus the edge modes (exact-match toggle, forward
direction, left vs inner)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackstac_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "p1"),
            ("u1", 20, "p2"),
            ("u1", 5, "p0"),   # before any right row
            ("u2", 15, "p3"),  # u2 has no right rows at all
            ("u3", 30, "p4"),  # exact-ts match case (right at 30)
        ],
        "key string, ts long, pid string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 8, 1.0),
            ("u1", 10, 2.0),   # exact tie with p1
            ("u1", 18, 3.0),
            ("u3", 30, 9.0),
            ("u3", 40, 10.0),
        ],
        "key string, rts long, val double",
    )
    return left, right


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_backward_inner_matches_bruteforce(spark, frames):
    left, right = frames
    got = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_cols=["val"], how="inner", matched_ts="mts",
    ).select("pid", "mts", "val")
    # oracle: classic range join + max_by
    brute = (
        left.join(right, (left.key == right.key) & (F.col("rts") <= F.col("ts")))
        .groupBy("pid")
        .agg(F.max("rts").alias("mts"), F.max_by("val", "rts").alias("val"))
    )
    assert _rows(got) == _rows(brute)
    # spot-check the exact-tie: p1 at ts=10 sees the rts=10 row
    assert ("p1", 10, 2.0) in _rows(got)


def test_left_keeps_unmatched(spark, frames):
    left, right = frames
    got = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_cols=["val"], how="left", matched_ts="mts",
    ).select("pid", "mts", "val")
    rows = _rows(got)
    assert ("p0", None, None) in rows  # before any right row
    assert ("p3", None, None) in rows  # key with no right rows
    assert len(rows) == 5


def test_exact_match_toggle(spark, frames):
    left, right = frames
    got = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_cols=["val"], how="left", allow_exact_matches=False, matched_ts="mts",
    ).select("pid", "mts", "val")
    rows = _rows(got)
    assert ("p1", 8, 1.0) in rows   # rts=10 now invisible to ts=10
    assert ("p4", None, None) in rows  # u3's only earlier row was the exact one


def test_forward_direction(spark, frames):
    left, right = frames
    got = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_cols=["val"], how="inner", direction="forward", matched_ts="mts",
    ).select("pid", "mts", "val")
    rows = _rows(got)
    assert ("p0", 8, 1.0) in rows    # earliest right at-or-after ts=5
    assert ("p2", None, None) not in rows and not any(r[0] == "p2" for r in rows)
    assert ("p4", 30, 9.0) in rows   # exact match counts forward too


def test_null_right_value_stays_with_matched_ts(spark):
    """A null right VALUE must not make the match skip to an older row —
    the payload struct is matched atomically."""
    left = spark.createDataFrame([("k", 100, "p")], "key string, ts long, pid string")
    right = spark.createDataFrame(
        [("k", 50, 1.0), ("k", 90, None)], "key string, rts long, val double"
    )
    got = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_cols=["val"], how="inner", matched_ts="mts",
    ).select("pid", "mts", "val")
    assert _rows(got) == {("p", 90, None)}


def test_plan_is_window_not_join(spark, frames):
    left, right = frames
    df = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        right_cols=["val"], how="inner",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct", "BroadcastHashJoin"):
        assert bad not in plan, f"asof plan must not contain {bad}"


def test_null_ordering_key_raises(spark):
    """Null ts keys are rejected in-plan (pandas.merge_asof raises too):
    without this, a null right_ts sorts first under backward-asc and becomes
    every unmatched left row's silent 'match'."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    left = spark.createDataFrame([("k", 100, "p")], "key string, ts long, pid string")
    right_null = spark.createDataFrame(
        [("k", None, 1.0), ("k", 50, 2.0)], "key string, rts long, val double"
    )
    with pytest.raises((Py4JJavaError, PySparkException), match="null right_ts"):
        asof_join(
            left, right_null, on="key", left_ts="ts", right_ts="rts",
            right_cols=["val"], how="left", matched_ts="mts",
        ).collect()

    left_null = spark.createDataFrame(
        [("k", None, "p")], "key string, ts long, pid string"
    )
    right = spark.createDataFrame([("k", 50, 2.0)], "key string, rts long, val double")
    with pytest.raises((Py4JJavaError, PySparkException), match="null left_ts"):
        asof_join(
            left_null, right, on="key", left_ts="ts", right_ts="rts",
            right_cols=["val"], how="left", matched_ts="mts",
        ).collect()


def test_reserved_dunder_columns_rejected(spark):
    left = spark.createDataFrame([("k", 1, 5)], "key string, ts long, __ts long")
    right = spark.createDataFrame([("k", 1, 1.0)], "key string, rts long, val double")
    with pytest.raises(ValueError, match="__"):
        asof_join(left, right, on="key", left_ts="ts", right_ts="rts")
    with pytest.raises(ValueError, match="__"):
        asof_join(
            right.withColumnRenamed("val", "ok"),
            left.withColumnRenamed("__ts", "__match"),
            on="key", left_ts="rts", right_ts="ts",
        )
