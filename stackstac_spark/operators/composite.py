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
