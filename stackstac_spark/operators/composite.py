"""Temporal resample + reductions + band arithmetic — the delegated xarray
surface (SURVEY §2.6) as native DataFrame aggregations.

Reference usages these mirror:
- ``.resample(time="MS").median("time")`` (docs/basic.ipynb cell 10)
- ``.mean/.median/.min/.max(dim=...)`` (README.md:55, examples/show.ipynb)
- NDVI ``(nir - red) / (nir + red)`` (README.md:53-54)
- display percentile range (show.py:484-497)

All are single hash aggregates (partial + final) or a pivot; the band
arithmetic deliberately pivots bands to columns instead of self-joining on
(time, y, x) — one shuffle instead of a join of two huge sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "mean": F.avg,
    "median": F.median,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": F.count,
    "std": F.stddev,
}


_UNIT_MONTHS = {"month": 1, "quarter": 3, "year": 12}


def resample_time(
    pixels_with_time: DataFrame,
    every: str = "1 month",
    agg: str = "median",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time window + per-pixel reduction: the Spark-native
    ``.resample(time=...).agg(...)``. ``pixels_with_time`` must carry a
    ``time`` timestamp column (pixels ⋈ items_df on item_idx).

    Calendar units (``"N month/quarter/year"`` — pandas offset-style
    resampling, the reference delegates arbitrary offsets to xarray) bucket
    by integer epoch-month arithmetic anchored at 1970-01, so "3 months"
    and "2 quarters" work like pandas "3MS"/"2QS"; fixed durations
    (minutes/hours/days/weeks) use ``window()``. Either way it is a single
    hash aggregate."""
    fn = _AGGS[agg]
    if keys is None:
        keys = [c for c in ("band_idx", "row", "col") if c in pixels_with_time.columns]
    parts = every.split()
    head, unit = (parts[0], parts[-1]) if len(parts) > 1 else ("1", parts[0])
    unit = unit.rstrip("s").lower()
    if unit in _UNIT_MONTHS:
        n = int(head) if head.isdigit() else 1
        step = _UNIT_MONTHS[unit] * n
        # months since 1970-01, floored to the period start — pure integer
        # column arithmetic, TZ-immune, still one hash agg
        m = (F.year("time") - F.lit(1970)) * 12 + F.month("time") - F.lit(1)
        b = (F.floor(m / F.lit(step)) * step).cast("int")
        period = (
            F.make_date(
                F.lit(1970) + F.floor(b / F.lit(12)).cast("int"),
                F.pmod(b, F.lit(12)) + F.lit(1),
                F.lit(1),
            )
            .cast("timestamp")
            .alias("period_start")
        )
    else:
        period = F.window("time", every).start.alias("period_start")
    return (
        pixels_with_time.groupBy(period, *keys)
        .agg(fn(value_col).alias(agg))
        .select("period_start", *keys, agg)
    )


def reduce_dims(
    pixels: DataFrame, dims: tuple[str, ...] = ("item_idx",), agg: str = "median"
) -> DataFrame:
    """``.median("time")`` / ``.mean(dim=("time","x","y"))`` etc.: drop the
    given dims, aggregate over them, keep the rest."""
    fn = _AGGS[agg]
    dimmap = {"time": "item_idx", "y": "row", "x": "col", "band": "band_idx"}
    drop = {dimmap.get(d, d) for d in dims}
    keys = [c for c in ("item_idx", "band_idx", "row", "col") if c in pixels.columns and c not in drop]
    return pixels.groupBy(*keys).agg(fn("value").alias(agg))


def ffill_time(
    pixels: DataFrame,
    dim_values: list,
    dim_col: str = "item_idx",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Temporal forward-fill — xarray's ``.ffill("time")`` on the sparse
    pixel table (the cloud-gap-filling composite: each missing observation
    takes the most recent earlier one). ``dim_values`` is the full ordered
    time index (the stack's item list — driver-known and small); output is
    DENSE over keys × dim: one row per (pixel, time step), ``value`` null
    where no earlier observation exists.

    Plan: distinct pixel keys (one shuffle) × exploded time index (JVM
    generator, no join), left join back to observations (co-keyed), then
    ONE window per pixel ordered by time with ``last(ignorenulls)``. The
    join and the window share the pixel-key partitioning, so it is two
    exchanges total. The T× row inflation is the *semantic* output of
    ffill (dense gap-filled series), not overhead — at 100 TB you run it
    after spatial/temporal slicing, like the reference's users do with
    xarray. NaN observations (errors-as-nodata fills) count as missing.
    """
    if not dim_values:
        raise ValueError("ffill_time: dim_values must be non-empty")
    if keys is None:
        keys = [c for c in ("band_idx", "row", "col") if c in pixels.columns]
    obs = pixels.select(
        *keys,
        F.col(dim_col),
        F.when(~F.isnan(F.col(value_col)), F.col(value_col)).alias("__v")
        if dict(pixels.dtypes)[value_col] in ("double", "float")
        else F.col(value_col).alias("__v"),
    )
    grid = (
        pixels.select(*keys)
        .distinct()
        .select(*keys, F.explode(F.array(*[F.lit(v) for v in dim_values])).alias(dim_col))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(dim_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, [*keys, dim_col], "left")
        .withColumn(value_col, F.last("__v", ignorenulls=True).over(w))
        .drop("__v")
    )


def band_pivot(pixels: DataFrame, band_names: list[str]) -> DataFrame:
    """Pivot band_idx → one column per band, per (item_idx, row, col).

    The preferred physical plan for band arithmetic (NDVI etc.): one
    groupBy-pivot shuffle with map-side partial aggregation, instead of a
    self-join of the pixel table against itself.
    """
    return (
        pixels.groupBy("item_idx", "row", "col")
        .pivot("band_idx", list(range(len(band_names))))
        .agg(F.first("value"))
        .select(
            "item_idx",
            "row",
            "col",
            *[F.col(str(i)).alias(n) for i, n in enumerate(band_names)],
        )
    )


def normalized_difference(df: DataFrame, a: str, b: str, out: str = "nd") -> DataFrame:
    """(a - b) / (a + b) — NDVI and friends, pure column arithmetic."""
    return df.withColumn(out, (F.col(a) - F.col(b)) / (F.col(a) + F.col(b)))


def display_range(pixels: DataFrame, p_low: float = 0.02, p_high: float = 0.98) -> tuple[float, float]:
    """show.py:484-497: 2nd/98th percentile of the whole array for display
    normalization — ``percentile_approx`` so it's one pass at any scale."""
    row = pixels.agg(
        F.percentile_approx("value", F.array(F.lit(p_low), F.lit(p_high)), 10000).alias("p")
    ).collect()[0]
    return (row.p[0], row.p[1])
