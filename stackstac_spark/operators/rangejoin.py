"""Range (interval) joins — `point BETWEEN start AND end` — as bin-bucketed
equality joins.

Spark has no native range-join optimization: a plain BETWEEN join plans as
BroadcastNestedLoopJoin (O(|L|·|R|) comparisons) or, with no equality key,
a cartesian product — both collapse at scale. The standard fix (used by
Databricks' range-join hint and by kdb/Flink temporal joins) is to quantize
the range dimension into fixed-width bins: each interval row is exploded to
every bin it covers, each point row maps to exactly ONE bin, and the join
becomes an ordinary hash equi-join on the bin id, refined by the exact
BETWEEN predicate afterwards.

Why each matching pair appears exactly once (no dedup pass needed): the
point side carries a single bin, so a (point, interval) pair can only meet
in the point's own bin, which the exploded interval side contains at most
once.

Scale properties:
- shuffle is a hash partition on bin id — embarrassingly parallel, and
  AQE's skew-join split handles hot bins;
- interval blowup is bounded by `ceil(span / bin_width) + 1` rows per
  interval — pick `bin_width` near the median interval span so the
  expansion factor stays O(1);
- the refine predicate is a cheap JVM-side filter, fully codegen'd.

There is no analogue in the reference (a raster engine); this serves the
event-analytics plane of the gate's `events` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "point_in_interval_join", "interval_union_length"]


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join `points` to `intervals` where
    ``start_col <= point_col <= end_col`` (inclusive ends).

    All three columns must be numeric on a shared axis (e.g. epoch
    microseconds). ``bin_width`` is in the same unit; intervals spanning
    many bins are exploded, so choose it near the typical interval span.

    ``how`` may be ``inner`` or ``left`` (left keeps unmatched points with
    nulls for the interval columns, like a SQL LEFT JOIN on the BETWEEN
    predicate).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    bw = int(bin_width)
    if bw <= 0:
        raise ValueError("bin_width must be a positive integer")

    def _bin(c: str):
        # floor division on longs, exact for the full 64-bit range (a double
        # division would lose precision past 2^53 — epoch-nanos territory);
        # pmod is non-negative, so subtracting it lands on the floor multiple
        return F.expr(f"(CAST({c} AS BIGINT) - pmod(CAST({c} AS BIGINT), {bw})) div {bw}")

    binned_iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(_bin(start_col), _bin(end_col)))
    )
    binned_pt = points.withColumn("_bin", _bin(point_col))
    within = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    if how == "inner":
        return binned_pt.join(binned_iv, "_bin").filter(within).drop("_bin")
    # left join: equi-join on bin with the refine predicate INSIDE the join
    # condition so non-matching points survive with nulls exactly once each
    joined = binned_pt.alias("p").join(
        binned_iv.alias("i"),
        (F.col("p._bin") == F.col("i._bin")) & within,
        "left",
    )
    # a point can match in its own bin only, but an unmatched point emits one
    # null row per... no: left equi-join emits the point row once per bin
    # match; the bin is unique on the point side, so unmatched points emit
    # exactly one null row. Drop both bin columns.
    return joined.drop("_bin")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval-overlap join: rows where
    ``[left_start, left_end]`` ∩ ``[right_start, right_end]`` ≠ ∅.

    Both sides are exploded to bins; a pair meeting in k shared bins would
    appear k times, so the match is restricted to the FIRST shared bin —
    the bin of ``greatest(left_start, right_start)`` — making each pair
    appear exactly once without a distinct pass.
    """
    bw = int(bin_width)
    if bw <= 0:
        raise ValueError("bin_width must be a positive integer")

    def _bin_expr(sql: str):
        return F.expr(
            f"(CAST({sql} AS BIGINT) - pmod(CAST({sql} AS BIGINT), {bw})) div {bw}"
        )

    def bins(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn("_bin", F.explode(F.sequence(_bin_expr(s), _bin_expr(e))))

    l_b = bins(left, left_start, left_end)
    r_b = bins(right, right_start, right_end)
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_shared_bin = F.col("_bin") == _bin_expr(
        f"greatest({left_start}, {right_start})"
    )
    return l_b.join(r_b, "_bin").filter(overlap & first_shared_bin).drop("_bin")


def interval_union_length(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key total length covered by a set of possibly-overlapping
    [start, end) intervals, plus island/gap counts — the gaps-and-islands
    problem (billed machine-seconds from overlapping job intervals, user
    active time from overlapping sessions; naive SUM(end-start) double-
    counts every overlap).

    Sweep formulation, one key-partitioned window pass: order intervals by
    (start, end), carry the running max end over all PRECEDING intervals;
    an interval opens a new island iff its start exceeds that running max.
    covered = Σ per-island (max end − island start) computed as
    Σ (new_max − max(prev_max, start)) over extending intervals — pure
    column algebra on the lag/running-max columns, no island subquery.
    Returns (key, n_intervals, n_islands, covered).

    Scale shape: ONE window partitioned by the key + one key agg — the
    same co-keyed pass every sessionizer pays; nothing global. Degenerate
    end < start intervals raise rather than silently contributing negative
    coverage.
    """
    from pyspark.sql import Window

    bad = df.filter(F.col(end_col) < F.col(start_col)).count()
    if bad:
        raise ValueError(
            f"interval_union_length: {bad} intervals have {end_col} < {start_col}"
        )
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    run_max = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    marked = df.select(key_col, start_col, end_col).withColumn(
        "__prev", prev_max
    ).withColumn("__run", run_max)
    is_new = F.col("__prev").isNull() | (F.col(start_col) > F.col("__prev"))
    # contribution = run_max - max(prev_max, start), floored at 0 for
    # intervals entirely inside the running coverage
    contrib = F.greatest(
        F.col("__run")
        - F.when(is_new, F.col(start_col)).otherwise(
            F.greatest(F.col("__prev"), F.col(start_col))
        ),
        F.lit(0),
    )
    return (
        marked.withColumn("__new", is_new.cast("int"))
        .withColumn("__c", contrib)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("__new").alias("n_islands"),
            F.sum("__c").alias("covered"),
        )
    )
