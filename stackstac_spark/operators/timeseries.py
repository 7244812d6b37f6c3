"""Classical time-series decomposition over regular per-key series.

The iterative STL fit doesn't relationalize, but the classical
moving-average decomposition (the `seasonal_decompose` of statsmodels,
Macaulay 1931) is pure windows + aggregates — exactly the shape Spark
executes well at any scale: every window is key-partitioned (one shuffle
by series key), the seasonal means are one grouped aggregate, and nothing
is iterative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seasonal_decompose"]


def seasonal_decompose(
    df: DataFrame,
    period: int,
    t_col: str = "t",
    value_col: str = "value",
    keys: list[str] | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Additive classical decomposition value = trend + seasonal + resid.

    - ``trend``: centered moving average of length ``period`` — for even
      periods the textbook 2×p MA (half weight on both window endpoints),
      for odd a plain centered MA; only rows with a FULL window get a
      trend (ends are null, statsmodels semantics).
    - ``seasonal``: per-phase (t mod period) mean of the detrended series,
      centered so the seasonal component sums to ~0 over one period.
    - ``resid``: value − trend − seasonal (null where trend is null).

    Requires a REGULAR series per key (consecutive integer ``t``; gaps
    shift phases — resample/gap-fill first; see ``gap_fill``). Plan: two
    key-partitioned windows (the centered sum + the full-window count)
    + one (key, phase) aggregate broadcast back — no iteration, no
    driver state. At 100 TB the shuffle key is the series key; a single
    very long series is the skew case, and splitting it means chunked
    windows with halo rows, which this deliberately does not do (series
    length ~1e6 rows per key is still a single-task window Spark
    handles).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    keys = keys or []
    h = period // 2
    w_full = (
        Window.partitionBy(*keys)
        .orderBy("__t")
        .rowsBetween(-h, h)
    )
    base = df.select(
        *keys, F.col(t_col).alias("__t"), F.col(value_col).cast("double").alias("__v")
    )
    if period % 2 == 0:
        # 2xp MA: (0.5*v[-h] + v[-h+1..h-1] + 0.5*v[h]) / p, needs 2h+1 rows
        first_v = F.first("__v").over(w_full)
        last_v = F.last("__v").over(w_full)
        trend = (F.sum("__v").over(w_full) - 0.5 * first_v - 0.5 * last_v) / float(
            period
        )
    else:
        trend = F.sum("__v").over(w_full) / float(period)
    n_in_win = F.count("__v").over(w_full)
    with_trend = base.withColumn(
        "__trend", F.when(n_in_win == 2 * h + 1, trend)
    )
    detrended = with_trend.withColumn("__d", F.col("__v") - F.col("__trend"))
    phase = (F.col("__t") % period).alias("__phase")
    seas_raw = (
        detrended.filter(F.col("__d").isNotNull())
        .groupBy(*keys, phase)
        .agg(F.avg("__d").alias("__s_raw"))
    )
    # center the seasonal component per key (mean over the period ~ 0)
    seas_mean = seas_raw.groupBy(*keys).agg(F.avg("__s_raw").alias("__s_mean"))
    # literal-key equi-join when ungrouped (a 1-row crossJoin would plan
    # as a nested-loop/cartesian node, which the suite-wide audit rejects)
    jk = keys or ["__k"]
    if not keys:
        seas_raw = seas_raw.withColumn("__k", F.lit(1))
        seas_mean = seas_mean.withColumn("__k", F.lit(1))
    seas = seas_raw.join(F.broadcast(seas_mean), jk).select(
        *keys, "__phase", (F.col("__s_raw") - F.col("__s_mean")).alias("__seas")
    )
    out = (
        detrended.withColumn("__phase", F.col("__t") % period)
        .join(seas, [*keys, "__phase"], "left")
    )
    t_c = F.col("__trend")
    s_c = F.col("__seas")
    r_c = F.col("__v") - F.col("__trend") - F.col("__seas")
    if round_to is not None:
        t_c, s_c, r_c = (F.round(e, round_to) for e in (t_c, s_c, r_c))
    return out.select(
        *keys,
        F.col("__t").alias(t_col),
        F.col("__v").alias(value_col),
        t_c.alias("trend"),
        s_c.alias("seasonal"),
        r_c.alias("resid"),
    )
