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

__all__ = [
    "seasonal_decompose",
    "sax_symbols",
    "mann_kendall",
    "page_hinkley",
    "theil_sen",
    "durbin_watson",
    "runs_test",
    "ljung_box",
    "binary_segment",
    "gumbel_fit",
    "cross_correlation",
]


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


# Gaussian equiprobable breakpoints for SAX alphabets 3..6 (Lin et al. 2003
# Table 3) — literal constants so any engine replays the symbolization.
_SAX_BREAKPOINTS = {
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
}


def sax_symbols(
    df: DataFrame,
    word_len: int,
    t_col: str = "t",
    value_col: str = "value",
    keys: list[str] | None = None,
    alphabet: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """PAA + SAX symbolization of per-key series (Lin/Keogh et al. 2003)
    → (keys..., seg, n_pts, paa, symbol): each key's series z-normalizes
    against its OWN mean/std, collapses to ``word_len`` equal-count
    segments (Piecewise Aggregate Approximation — the mean per segment),
    and each segment maps to a letter by the Gaussian equiprobable
    breakpoints — the discretization behind symbolic similarity search,
    motif/anomaly discovery, and cheap series fingerprints (two series
    with the same SAX word are candidate near-duplicates: the dedup
    blocking key for time series).

    Segment index is ``⌊rank·w/n⌋`` from the per-key (t, order) rank —
    equal-count segments regardless of gaps. Plan: one per-key moments
    aggregate broadcast back (exact Σv/Σv² — the cusum contract), one
    key-partitioned rank window, one (key, seg) aggregate; z and paa are
    rounded so an external engine replays the letter choice (breakpoint
    comparisons run on the ROUNDED paa). Constant series (sd = 0)
    z-score to 0 → the middle letter, matching the degenerate-series
    convention.
    """
    if word_len < 1:
        raise ValueError(f"word_len must be >= 1, got {word_len}")
    if alphabet not in _SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet must be one of {sorted(_SAX_BREAKPOINTS)}, got {alphabet}"
        )
    keys = keys or []
    v = F.col(value_col).cast("double")
    # Null-value rows are ranked by the row_number window but skipped by
    # count(v), so seg = floor((rn-1)*w/n) could reach or exceed word_len
    # (phantom segments) and shift boundaries for the real points. Null-t
    # rows have no defined rank position. Drop both so rn and __n count
    # the same row set.
    df = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(t_col).isNotNull()
    )
    stats = df.groupBy(*keys).agg(
        F.sum(v).alias("__s1"),
        F.sum(v * v).alias("__s2"),
        F.count(v).alias("__n"),
    )
    mu = F.col("__s1") / F.col("__n")
    sd = F.sqrt(F.greatest(F.col("__s2") / F.col("__n") - mu * mu, F.lit(0.0)))
    z = F.when(sd > 0, F.round((v - mu) / sd, round_to)).otherwise(F.lit(0.0))
    if keys:
        zed = df.join(F.broadcast(stats), keys)
        w_rank = Window.partitionBy(*keys).orderBy(F.col(t_col))
    else:
        zed = df.withColumn("__k", F.lit(1)).join(
            F.broadcast(stats.withColumn("__k", F.lit(1))), "__k"
        )
        w_rank = Window.partitionBy("__k").orderBy(F.col(t_col))
    seg = F.floor(
        (F.row_number().over(w_rank) - 1) * word_len / F.col("__n")
    ).cast("int")
    paa = (
        zed.select(*keys, z.alias("__z"), seg.alias("seg"))
        .groupBy(*keys, "seg")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(F.avg("__z"), round_to).alias("paa"),
        )
    )
    bps = _SAX_BREAKPOINTS[alphabet]
    sym = F.lit(chr(ord("a") + len(bps)))
    for i in range(len(bps) - 1, -1, -1):
        sym = F.when(F.col("paa") < F.lit(bps[i]), F.lit(chr(ord("a") + i))).otherwise(sym)
    return paa.select(*keys, "seg", "n_pts", "paa", sym.alias("symbol")).orderBy(
        *keys, "seg"
    )


def mann_kendall(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_points: int = 5_000,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per series (Mann 1945; Kendall
    1975) → group_cols + (n, s_stat, var_s, z): S = Σ_{i<j} sign(x_j − x_i)
    over time order, tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18, and the
    continuity-corrected normal score Z — the nonparametric "is this
    metric actually trending?" screen the drift monitor runs on its DAILY
    aggregates (no distribution assumption, robust to outliers, exactly
    what a seasonal-Kendall rollup composes from).

    Contract: the input is an already-aggregated series (one row per
    (group, t) — day/hour buckets), NOT the raw corpus; the pairwise
    S-statistic is a within-group self-join, so ``max_points`` fail-fasts
    above the per-series cap rather than quietly joining a million-row
    group with itself (aggregate first — that is what the test means
    statistically anyway). Null/NaN values and null times are excluded;
    duplicate timestamps within a group raise (S is undefined without a
    total time order).
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(t_col).isNotNull()
    ).select(*groups, F.col(t_col).alias("__t"), v.alias("__x"))
    # materialize the series before the guard job: the guard and the main
    # plan (both self-join sides + the final agg) would otherwise each
    # re-evaluate the caller's upstream series aggregation. The series is
    # ≤ max_points per group when the guard passes (optimization r12, the
    # _per_score_counts pattern).
    base = base.localCheckpoint(eager=False)
    sizes = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("__t").alias("__nt"),
    )
    bad = sizes.filter(
        (F.col("__n") > max_points) | (F.col("__nt") < F.col("__n"))
    ).limit(1).collect()
    if bad:
        r = bad[0]
        if r["__nt"] < r["__n"]:
            raise ValueError(
                "mann_kendall: a group has duplicate timestamps — aggregate "
                "to one observation per (group, t) first."
            )
        raise ValueError(
            f"mann_kendall: a group has {r['__n']} points "
            f"(> max_points={max_points}); the pairwise S join would "
            "square it. Aggregate to coarser time buckets first."
        )
    a = base.select(*groups, F.col("__t").alias("__ti"), F.col("__x").alias("__xi"))
    b = base.select(*groups, F.col("__t").alias("__tj"), F.col("__x").alias("__xj"))
    if groups:
        pairs = a.join(b, groups)
    else:
        # literal-key broadcast join (≤ max_points rows on the broadcast
        # side) — a crossJoin would plan as a cartesian node, which the
        # suite-wide plan audit rejects
        pairs = a.withColumn("__k", F.lit(1)).join(
            F.broadcast(b.withColumn("__k", F.lit(1))), "__k"
        )
    pairs = pairs.filter(F.col("__ti") < F.col("__tj"))
    s_tab = pairs.groupBy(*groups).agg(
        F.sum(F.signum(F.col("__xj") - F.col("__xi"))).cast("long").alias("s_stat")
    )
    ties = (
        base.groupBy(*groups, "__x")
        .agg(F.count(F.lit(1)).alias("__tg"))
        .groupBy(*groups)
        .agg(
            F.sum(
                F.col("__tg") * (F.col("__tg") - 1) * (2 * F.col("__tg") + 5)
            ).alias("__tie_term"),
            F.sum("__tg").cast("long").alias("n"),
        )
    )
    if groups:
        j = ties.join(s_tab, groups)
    else:
        j = ties.withColumn("__k", F.lit(1)).join(
            F.broadcast(s_tab.withColumn("__k", F.lit(1))), "__k"
        )
    n = F.col("n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("__tie_term")) / 18.0
    s = F.col("s_stat")
    z = F.when(var_s <= 0, F.lit(0.0)).otherwise(
        F.when(s > 0, (s - 1) / F.sqrt(var_s))
        .when(s < 0, (s + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        *groups,
        "n",
        "s_stat",
        F.round(var_s, round_to).alias("var_s"),
        F.round(z, round_to).alias("z"),
    )


def page_hinkley(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    delta: float = 0.0,
    lam: float = 10.0,
    round_to: int = 6,
    max_points: int = 100_000,
) -> DataFrame:
    """Page-Hinkley mean-shift detector per series (Page 1954; the
    sequential drift test river/MOA popularized for data streams) →
    group_cols + (n, ph_stat, alarm, alarm_t):

        m_t = Σ_{i≤t} (x_i − x̄_i − δ),   PH_t = m_t − min_{j≤t} m_j,

    with x̄_i the running mean of the prefix — the detector fires
    (``alarm``) at the first t where PH_t > λ, and ``ph_stat`` is the
    series' max PH (how close a quiet series came). The batch replay of
    the streaming upward-shift monitor: run it over each day's metric
    series to ask "did the mean jump, and when?".

    Contract: input is a pre-aggregated series (the mann_kendall policy —
    ``max_points`` fail-fast, duplicate timestamps raise), so the three
    chained per-group ordered windows (running mean → cumulative m_t →
    running min) ride bounded partitions. Null/NaN excluded.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(t_col).isNotNull()
    ).select(*groups, F.col(t_col).alias("__t"), v.alias("__x"))
    # materialize the series before the guard job (optimization r12; see
    # mann_kendall) — guard and main plan share one upstream evaluation
    base = base.localCheckpoint(eager=False)
    sizes = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"), F.count_distinct("__t").alias("__nt")
    )
    bad = sizes.filter(
        (F.col("__n") > max_points) | (F.col("__nt") < F.col("__n"))
    ).limit(1).collect()
    if bad:
        r = bad[0]
        if r["__nt"] < r["__n"]:
            raise ValueError(
                "page_hinkley: a group has duplicate timestamps — aggregate "
                "to one observation per (group, t) first."
            )
        raise ValueError(
            f"page_hinkley: a group has {r['__n']} points "
            f"(> max_points={max_points}); aggregate to coarser buckets."
        )
    w = (
        Window.partitionBy(*groups)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    )
    stepped = base.select(
        *groups,
        "__t",
        (
            F.col("__x")
            - F.sum("__x").over(w) / F.count(F.lit(1)).over(w)
            - F.lit(float(delta))
        ).alias("__term"),
    )
    m = stepped.select(
        *groups, "__t", F.sum("__term").over(w).alias("__m")
    )
    ph = m.select(
        *groups,
        "__t",
        (F.col("__m") - F.min("__m").over(w)).alias("__ph"),
    )
    return ph.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.max("__ph"), round_to).alias("ph_stat"),
        (F.max("__ph") > lam).alias("alarm"),
        F.min(F.when(F.col("__ph") > lam, F.col("__t"))).alias("alarm_t"),
    )


def _series_guard(
    base: DataFrame, groups: list[str], max_points: int, op: str
) -> DataFrame:
    """The mann_kendall series contract, shared: the input must be an
    already-aggregated series (one row per (group, t)); fail fast above
    ``max_points`` per series and on duplicate timestamps. NOTE (eager
    guard): runs one small Spark job at construction time.

    Returns the series localCheckpoint-ed (optimization r12): the guard
    job materializes it, so the caller's main plan re-reads the bounded
    series instead of re-evaluating its upstream aggregation — guard and
    plan share one evaluation (the _per_score_counts pattern)."""
    base = base.localCheckpoint(eager=False)
    sizes = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("__t").alias("__nt"),
    )
    bad = sizes.filter(
        (F.col("__n") > max_points) | (F.col("__nt") < F.col("__n"))
    ).limit(1).collect()
    if bad:
        r = bad[0]
        if r["__nt"] < r["__n"]:
            raise ValueError(
                f"{op}: a group has duplicate timestamps — aggregate to one "
                "observation per (group, t) first."
            )
        raise ValueError(
            f"{op}: a group has {r['__n']} points (> max_points="
            f"{max_points}); aggregate to coarser time buckets first."
        )
    return base


def theil_sen(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_points: int = 2_000,
) -> DataFrame:
    """Theil-Sen robust trend estimator per series (Theil 1950; Sen 1968)
    → group_cols + (n, n_pairs, slope, intercept): slope = MEDIAN of all
    pairwise slopes (x_j−x_i)/(t_j−t_i), intercept = median of
    (x_i − slope·t_i) — the outlier-immune line fit (up to ~29% arbitrary
    corruption) that pairs with ``mann_kendall``: MK says "is it
    trending?", Theil-Sen says "at what rate?". The estimate OLS
    (``ols_trend``) should be sanity-checked against when a crawl has
    heavy-tailed daily metrics. Medians interpolate (average the two
    middle order statistics at even counts — the DuckDB/NumPy
    ``median`` convention). NULL slope when n < 2.

    Contract: pre-aggregated series input (the mann_kendall contract —
    one row per (group, t), ``max_points`` fail-fast, duplicate
    timestamps raise), so the pairwise table is ≤ max_points²/2 per
    series by construction and the per-series median windows ride
    bounded partitions. Null/NaN values and null times are excluded.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    t = F.col(t_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(t_col).isNotNull()
    ).select(*groups, t.alias("__t"), v.alias("__x"))
    base = _series_guard(base, groups, max_points, "theil_sen")

    def _median(d: DataFrame, col: str, out: str) -> DataFrame:
        """Exact interpolated per-group median over a bounded table."""
        wo = (
            Window.partitionBy(*groups).orderBy(col)
            if groups
            else Window.orderBy(col)
        )
        wt = Window.partitionBy(*groups) if groups else Window.partitionBy()
        ranked = d.select(
            *groups,
            F.col(col),
            F.row_number().over(wo).alias("__rn"),
            F.count(F.lit(1)).over(wt).alias("__m"),
        )
        # odd m: the single middle row floor((m+1)/2) = floor(m/2)+1;
        # even m: BOTH middles m/2 and m/2+1 (averaged = interpolation)
        mid = ranked.filter(
            (F.col("__rn") == F.floor((F.col("__m") + 1) / 2))
            | (F.col("__rn") == F.floor(F.col("__m") / 2) + 1)
        )
        return mid.groupBy(*groups).agg(F.avg(col).alias(out))

    a = base.select(*groups, F.col("__t").alias("__ti"), F.col("__x").alias("__xi"))
    b = base.select(*groups, F.col("__t").alias("__tj"), F.col("__x").alias("__xj"))
    if groups:
        pairs = a.join(b, groups)
    else:
        pairs = a.withColumn("__k", F.lit(1)).join(
            F.broadcast(b.withColumn("__k", F.lit(1))), "__k"
        )
    slopes = pairs.filter(F.col("__ti") < F.col("__tj")).select(
        *groups,
        (
            (F.col("__xj") - F.col("__xi")) / (F.col("__tj") - F.col("__ti"))
        ).alias("__s"),
    )
    n_pairs = slopes.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    med_slope = _median(slopes, "__s", "slope")
    n_tab = base.groupBy(*groups).agg(F.count(F.lit(1)).cast("long").alias("n"))
    if groups:
        with_slope = base.join(med_slope, groups)
    else:
        with_slope = base.withColumn("__k", F.lit(1)).join(
            F.broadcast(med_slope.withColumn("__k", F.lit(1))), "__k"
        ).drop("__k")
    resid = with_slope.select(
        *groups, (F.col("__x") - F.col("slope") * F.col("__t")).alias("__r")
    )
    med_int = _median(resid, "__r", "intercept")
    if groups:
        out = (
            n_tab.join(n_pairs, groups, "left")
            .join(med_slope, groups, "left")
            .join(med_int, groups, "left")
        )
    else:
        out = n_tab
        for other in (n_pairs, med_slope, med_int):
            out = out.withColumn("__k", F.lit(1)).join(
                F.broadcast(other.withColumn("__k", F.lit(1))), "__k", "left"
            ).drop("__k")
    return out.select(
        *groups,
        "n",
        F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
        F.round("slope", round_to).alias("slope"),
        F.round("intercept", round_to).alias("intercept"),
    )


def durbin_watson(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_points: int = 100_000,
) -> DataFrame:
    """Durbin-Watson autocorrelation statistic per series (Durbin & Watson
    1950) over the DEMEANED values → group_cols + (n, dw):

        DW = Σ_{t=2..n} (e_t − e_{t−1})² / Σ e_t²,   e_t = x_t − x̄

    — in [0, 4]; ≈2 means no lag-1 autocorrelation, →0 positive, →4
    negative. The one-number "are these residuals actually independent?"
    check to run after ``ols_trend``/``ewma_smooth``, and the screen that
    tells you whether a metric's daily noise is really i.i.d. before
    trusting an A/B variance estimate. NULL when n < 2 or all values
    are identical (zero variance).

    Contract: pre-aggregated series input (one row per (group, t),
    duplicate timestamps raise; generous ``max_points`` since the plan is
    linear — one lag window per series + one aggregate, no pair join).
    Null/NaN values and null times are excluded.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(t_col).isNotNull()
    ).select(*groups, F.col(t_col).alias("__t"), v.alias("__x"))
    base = _series_guard(base, groups, max_points, "durbin_watson")
    wt = Window.partitionBy(*groups) if groups else Window.partitionBy()
    wo = (
        Window.partitionBy(*groups).orderBy("__t")
        if groups
        else Window.orderBy("__t")
    )
    # the lag rides the same time order as the demeaning's partition
    e = base.select(
        *groups,
        F.col("__t"),
        (F.col("__x") - F.avg("__x").over(wt)).alias("__e"),
    ).select(*groups, "__e", F.lag("__e").over(wo).alias("__ep"))
    agg = e.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("__ep").isNotNull(),
                (F.col("__e") - F.col("__ep")) * (F.col("__e") - F.col("__ep")),
            ).otherwise(0.0)
        ).alias("__num"),
        F.sum(F.col("__e") * F.col("__e")).alias("__den"),
    )
    return agg.select(
        *groups,
        "n",
        F.when(
            (F.col("n") >= 2) & (F.col("__den") > 0),
            F.round(F.col("__num") / F.col("__den"), round_to),
        ).alias("dw"),
    )


def runs_test(
    df: DataFrame,
    t_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_points: int = 100_000,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness per series (Wald &
    Wolfowitz 1940, the runs-about-the-MEDIAN form) → group_cols +
    (n_above, n_below, n_runs, z): dichotomize each value against its
    series median (values EQUAL to the median are dropped — the standard
    convention), count the maximal same-sign runs R in time order, and

        z = (R − μ) / σ,  μ = 2·n₁n₂/(n₁+n₂) + 1,
        σ² = 2n₁n₂(2n₁n₂ − n₁ − n₂) / ((n₁+n₂)²(n₁+n₂−1))

    — too FEW runs = clustering/trend, too MANY = oscillation; the
    distribution-free "is this metric's day-to-day sequence random?"
    screen that complements ``mann_kendall`` (monotone trend) and
    ``durbin_watson`` (linear lag-1). NULL z when either side is empty
    or σ = 0.

    Contract: pre-aggregated series (one row per (group, t), duplicate
    timestamps raise, ``max_points`` fail-fast). The median is the exact
    interpolated one over the bounded series partition. Null/NaN
    excluded.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(t_col).isNotNull()
    ).select(*groups, F.col(t_col).alias("__t"), v.alias("__x"))
    base = _series_guard(base, groups, max_points, "runs_test")
    wt = Window.partitionBy(*groups) if groups else Window.partitionBy()
    wv = (
        Window.partitionBy(*groups).orderBy("__x")
        if groups
        else Window.orderBy("__x")
    )
    ranked = base.select(
        *groups,
        "__t",
        "__x",
        F.row_number().over(wv).alias("__rn"),
        F.count(F.lit(1)).over(wt).alias("__m"),
    )
    med = (
        ranked.filter(
            (F.col("__rn") == F.floor((F.col("__m") + 1) / 2))
            | (F.col("__rn") == F.floor(F.col("__m") / 2) + 1)
        )
        .groupBy(*groups)
        .agg(F.avg("__x").alias("__med"))
    )
    if groups:
        signed = base.join(med, groups)
    else:
        signed = base.withColumn("__k", F.lit(1)).join(
            F.broadcast(med.withColumn("__k", F.lit(1))), "__k"
        ).drop("__k")
    signed = signed.filter(F.col("__x") != F.col("__med")).select(
        *groups, "__t", (F.col("__x") > F.col("__med")).alias("__up")
    )
    wo = (
        Window.partitionBy(*groups).orderBy("__t")
        if groups
        else Window.orderBy("__t")
    )
    runs = signed.select(
        *groups,
        "__up",
        F.when(
            F.lag("__up").over(wo).isNull()
            | (F.lag("__up").over(wo) != F.col("__up")),
            1,
        )
        .otherwise(0)
        .alias("__new_run"),
    )
    agg = runs.groupBy(*groups).agg(
        F.sum(F.col("__up").cast("int")).cast("long").alias("n_above"),
        F.sum((~F.col("__up")).cast("int")).cast("long").alias("n_below"),
        F.sum("__new_run").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nn = n1 + n2
    mu = 2.0 * n1 * n2 / nn + 1.0
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1.0))
    return agg.select(
        *groups,
        "n_above",
        "n_below",
        "n_runs",
        F.when(
            (F.col("n_above") > 0) & (F.col("n_below") > 0) & (var > 0),
            F.round((F.col("n_runs") - mu) / F.sqrt(var), round_to),
        ).alias("z"),
    )


def ljung_box(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    max_lag: int = 3,
    round_to: int = 6,
    max_points: int | None = 100_000,
) -> DataFrame:
    """Ljung-Box portmanteau test on a PRE-AGGREGATED series per group
    (Ljung & Box 1978) → one row per (group, lag ≤ ``max_lag``):
    (group_cols..., lag, r, q) with

        r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²
        Q_k = n(n+2) Σ_{j≤k} r_j² / (n − j)

    — "is anything left in the residuals?" after a trend/seasonal fit
    ([seasonal_decompose], [ols_trend]): Q_k ~ χ²(k) under whiteness, so
    a large Q at small lag means structure remains. Lags are ROW lags
    over the time-ordered series (a dense re-index — gaps in the
    timestamp axis do not create phantom zero products).

    Same input contract as [mann_kendall]: the caller aggregates the
    corpus to (group, t, value) FIRST (daily totals, hourly means);
    ``max_points`` fail-fasts (eager, one count job at build time) when
    a group's series would funnel one window task, and duplicate
    timestamps in a group raise (lag algebra needs one x per t).

    Plan: one per-group row_number window (partitioned — parallel across
    groups), ONE lag self-equi-join against the offsets 1..max_lag
    (explode on the small side), per-(group, lag) aggregates, and a
    ≤max_lag-row cumulative window per group for Q.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    groups = list(group_cols or [])
    x = F.col(value_col).cast("double")
    base = df.filter(
        F.col(time_col).isNotNull() & x.isNotNull() & ~F.isnan(x)
    ).select(*groups, F.col(time_col).alias("__t"), x.alias("__x"))
    stats = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("__t").alias("__nt"),
        F.avg("__x").alias("__m"),
    ).localCheckpoint()
    guard = stats.agg(
        F.max("__n").alias("mx"), F.min((F.col("__nt") == F.col("__n")).cast("int")).alias("uniq")
    ).first()
    if guard["mx"] is not None and guard["uniq"] == 0:
        raise ValueError(
            "ljung_box: duplicate timestamps within a group — aggregate "
            "to one value per (group, t) first."
        )
    if max_points is not None and guard["mx"] is not None and guard["mx"] > max_points:
        raise ValueError(
            f"ljung_box: a group has {guard['mx']} points "
            f"(> max_points={max_points}); aggregate to a coarser grain."
        )
    w_idx = (
        Window.partitionBy(*groups).orderBy("__t")
        if groups
        else Window.orderBy("__t")
    )
    idx = base.select(*groups, "__x", F.row_number().over(w_idx).alias("__i"))
    centered = idx.join(F.broadcast(stats), groups) if groups else idx.crossJoin(
        F.broadcast(stats)
    )
    centered = centered.select(
        *groups, "__i", (F.col("__x") - F.col("__m")).alias("__z"), "__n"
    ).localCheckpoint()
    ss = centered.groupBy(*groups).agg(
        F.sum(F.col("__z") * F.col("__z")).alias("__ss")
    )
    lags = centered.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("__lag")
    )
    # constant-key equi-join against the tiny lag axis (BroadcastHashJoin,
    # never a nested-loop plan — the kendall_tau_b pattern)
    b = (
        centered.select(
            *groups, F.col("__i").alias("__ib"), F.col("__z").alias("__zb")
        )
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(lags.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    keys = groups + ["__i"]
    a = centered.select(*groups, "__i", "__z", "__n")
    paired = a.join(
        b.withColumnRenamed("__ib", "__i_from").withColumn(
            "__i", F.col("__i_from") + F.col("__lag")
        ),
        keys,
    )
    per_lag = paired.groupBy(*groups, "__lag").agg(
        F.sum(F.col("__z") * F.col("__zb")).alias("__num"),
        F.max("__n").alias("__n"),
    )
    r_tab = per_lag.join(ss, groups) if groups else per_lag.crossJoin(
        F.broadcast(ss)
    )
    r_tab = r_tab.select(
        *groups, "__lag", "__n", F.try_divide("__num", "__ss").alias("__r")
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__lag")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__lag").rowsBetween(Window.unboundedPreceding, 0)
    )
    nn = F.col("__n").cast("double")
    q = nn * (nn + 2.0) * F.sum(
        F.col("__r") * F.col("__r") / (nn - F.col("__lag"))
    ).over(w_cum)
    return r_tab.select(
        *groups,
        F.col("__lag").alias("lag"),
        F.round("__r", round_to).alias("r"),
        F.round(q, round_to).alias("q"),
    ).orderBy(*groups, "lag")


def binary_segment(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_points: int | None = 100_000,
) -> DataFrame:
    """Optimal single changepoint per group by binary segmentation
    (Scott & Knott 1974; the recursion step of ruptures' BinSeg) → one
    row per group: (group_cols..., n, split_t, sse_total, sse_split,
    reduction) where split_t is the LAST timestamp of the left segment
    at the split k minimizing

        SSE(k) = [Q_k − S_k²/k] + [(Q−Q_k) − (S−S_k)²/(n−k)]

    (prefix count/sum/sum-of-squares algebra — each candidate split is
    O(1) given the cumulative sums, so the full scan of n−1 candidate
    splits is ONE window pass). ``reduction`` = 1 − sse_split/sse_total,
    the variance explained by the break.

    The offline complement to the sequential detectors ([cusum],
    [page_hinkley]): those flag "something changed, roughly here" while
    streaming; this pins the single best break exactly, for audit and
    for recursing into sub-segments. Ties → earliest split.

    Same pre-aggregated-series contract as [ljung_box] /
    [mann_kendall]: aggregate the corpus to (group, t, value) first;
    ``max_points`` fail-fasts (eager count job) on series that would
    funnel one window task. Groups with n < 2 emit NULL split columns.
    """
    groups = list(group_cols or [])
    x = F.col(value_col).cast("double")
    base = df.filter(
        F.col(time_col).isNotNull() & x.isNotNull() & ~F.isnan(x)
    ).select(*groups, F.col(time_col).alias("__t"), x.alias("__x"))
    if max_points is not None:
        # materialize the (≤ max_points/group when the guard passes) series
        # so the guard count and the main plan share one upstream
        # evaluation (the _per_score_counts pattern; optimization r12)
        base = base.localCheckpoint(eager=False)
        worst = (
            base.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_points:
            raise ValueError(
                f"binary_segment: a group has {worst} points "
                f"(> max_points={max_points}); aggregate to a coarser grain."
            )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*groups) if groups else Window.partitionBy()
    pre = base.select(
        *groups,
        "__t",
        F.count(F.lit(1)).over(w_cum).alias("__k"),
        F.sum("__x").over(w_cum).alias("__sk"),
        F.sum(F.col("__x") * F.col("__x")).over(w_cum).alias("__qk"),
        F.count(F.lit(1)).over(w_tot).alias("__n"),
        F.sum("__x").over(w_tot).alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).over(w_tot).alias("__q"),
    )
    kk = F.col("__k").cast("double")
    nn = F.col("__n").cast("double")
    sse_l = F.col("__qk") - F.col("__sk") * F.col("__sk") / kk
    sse_r = (F.col("__q") - F.col("__qk")) - (
        (F.col("__s") - F.col("__sk")) * (F.col("__s") - F.col("__sk"))
    ) / (nn - kk)
    cand = pre.filter(F.col("__k") < F.col("__n")).select(
        *groups,
        "__t",
        "__n",
        "__s",
        "__q",
        (sse_l + sse_r).alias("__sse"),
    )
    best = cand.groupBy(*groups).agg(
        F.max("__n").alias("__n"),
        F.max("__q").alias("__qq"),
        F.max("__s").alias("__ss"),
        F.min(F.struct(F.col("__sse").alias("s"), F.col("__t").alias("t"))).alias(
            "__b"
        ),
    )
    sse_tot = F.col("__qq") - F.col("__ss") * F.col("__ss") / F.col("__n").cast(
        "double"
    )
    # groups with a single point have no candidate split and drop out of
    # `cand`; re-attach them with NULL split columns via the totals table
    totals = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__tn"),
        F.sum("__x").alias("__ts"),
        F.sum(F.col("__x") * F.col("__x")).alias("__tq"),
    )
    out = totals.join(best, groups, "left") if groups else _one_row_left(
        totals, best
    )
    tot_expr = F.col("__tq") - F.col("__ts") * F.col("__ts") / F.col(
        "__tn"
    ).cast("double")
    return out.select(
        *groups,
        F.col("__tn").cast("long").alias("n"),
        F.col("__b.t").alias("split_t"),
        F.round(tot_expr, round_to).alias("sse_total"),
        F.round(F.col("__b.s"), round_to).alias("sse_split"),
        F.when(
            tot_expr > 0,
            F.round(1.0 - F.col("__b.s") / tot_expr, round_to),
        ).alias("reduction"),
    ).orderBy(*groups)


def _one_row_left(a: DataFrame, b: DataFrame) -> DataFrame:
    """Ungrouped left join of two ≤1-row aggregates via a literal key
    (BroadcastHashJoin, never a nested-loop node)."""
    return (
        a.withColumn("__jk", F.lit(1))
        .join(F.broadcast(b.withColumn("__jk", F.lit(1))), "__jk", "left")
        .drop("__jk")
    )


_EULER_GAMMA = 0.5772156649015329


def gumbel_fit(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    quantile: float = 0.99,
    round_to: int = 6,
) -> DataFrame:
    """Gumbel (EV-I) extreme-value fit by the method of moments per
    group → (group_cols..., n, loc, scale, q_ret): given block maxima
    (daily max latency, per-crawl max doc length),

        scale β = s·√6/π,  loc μ = x̄ − γβ   (γ = Euler-Mascheroni)
        q_ret   = μ − β·ln(−ln(p))           (the p return level)

    — the tail-risk read: "what max should we provision for?" The
    Fisher-Tippett theorem says block maxima of light-tailed inputs
    converge to exactly this family; pair with [hill_tail_index] (which
    reads the raw tail instead of block maxima) and [grubbs_stat].
    Moment estimators are one aggregate — the 100 TB shape; MLE's
    iteration buys ~nothing at monitoring sample sizes. The caller
    supplies the block maxima (one groupBy ahead of this call); NULL fit
    when n < 2 or s = 0.
    """
    if not 0.0 < quantile < 1.0:
        raise ValueError(f"quantile must be in (0,1), got {quantile}")
    groups = list(group_cols or [])
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        *groups, x.alias("__x")
    )
    mom = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__x").alias("__m"),
        F.stddev_samp("__x").alias("__s"),
    )
    import math

    beta = F.col("__s") * F.lit(math.sqrt(6.0) / math.pi)
    mu = F.col("__m") - F.lit(_EULER_GAMMA) * beta
    qret = mu - beta * F.lit(math.log(-math.log(quantile)))
    ok = (F.col("__n") >= 2) & (F.col("__s") > 0)
    out = mom.select(
        *groups,
        F.col("__n").cast("long").alias("n"),
        F.when(ok, F.round(mu, round_to)).alias("loc"),
        F.when(ok, F.round(beta, round_to)).alias("scale"),
        F.when(ok, F.round(qret, round_to)).alias("q_ret"),
    )
    return out.orderBy(*groups) if groups else out


def cross_correlation(
    df: DataFrame,
    time_col: str,
    a_col: str,
    b_col: str,
    group_cols: list[str] | None = None,
    max_lag: int = 3,
    round_to: int = 6,
    max_points: int | None = 100_000,
) -> DataFrame:
    """Cross-correlation function between two aligned series per group →
    one row per (group, lag ∈ [−max_lag, max_lag]):
    (group_cols..., lag, r) with

        r(ℓ) = Σ_t (a_t − ā)(b_{t−ℓ} − b̄) / √(Σ(a−ā)² · Σ(b−b̄)²)

    — positive ℓ means b LEADS a by ℓ steps (b's past correlates with
    a's present): does crawler error rate lead ingest latency? does
    view volume lead purchase volume, and by how many days? The
    two-series companion to [ljung_box] (auto-correlation of one
    series); the lag of the peak |r| is the lead-lag estimate.

    Both series must share the (group, t) axis: rows where EITHER side
    is null/NaN are dropped (listwise — means/variances and products
    all come from the common support, so r(0) equals Pearson on the
    paired rows). Row lags over the dense re-index, the ljung_box
    contract, with the same ``max_points`` / duplicate-t guards.

    Plan: one per-group row_number window, ONE lag self-equi-join
    against the exploded −max_lag..max_lag axis, per-(group, lag)
    aggregates. No global sort, no Python.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    groups = list(group_cols or [])
    a = F.col(a_col).cast("double")
    b = F.col(b_col).cast("double")
    base = df.filter(
        F.col(time_col).isNotNull()
        & a.isNotNull() & ~F.isnan(a)
        & b.isNotNull() & ~F.isnan(b)
    ).select(*groups, F.col(time_col).alias("__t"), a.alias("__a"), b.alias("__b"))
    stats = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("__t").alias("__nt"),
        F.avg("__a").alias("__ma"),
        F.avg("__b").alias("__mb"),
    ).localCheckpoint()
    guard = stats.agg(
        F.max("__n").alias("mx"),
        F.min((F.col("__nt") == F.col("__n")).cast("int")).alias("uniq"),
    ).first()
    if guard["mx"] is not None and guard["uniq"] == 0:
        raise ValueError(
            "cross_correlation: duplicate timestamps within a group — "
            "aggregate to one row per (group, t) first."
        )
    if max_points is not None and guard["mx"] is not None and guard["mx"] > max_points:
        raise ValueError(
            f"cross_correlation: a group has {guard['mx']} points "
            f"(> max_points={max_points}); aggregate to a coarser grain."
        )
    w_idx = (
        Window.partitionBy(*groups).orderBy("__t")
        if groups
        else Window.orderBy("__t")
    )
    idx = base.select(*groups, "__a", "__b", F.row_number().over(w_idx).alias("__i"))
    centered = idx.join(F.broadcast(stats), groups) if groups else (
        idx.withColumn("__jk", F.lit(1)).join(
            F.broadcast(stats.withColumn("__jk", F.lit(1))), "__jk"
        ).drop("__jk")
    )
    centered = centered.select(
        *groups,
        "__i",
        (F.col("__a") - F.col("__ma")).alias("__za"),
        (F.col("__b") - F.col("__mb")).alias("__zb"),
    ).localCheckpoint()
    denom = centered.groupBy(*groups).agg(
        F.sqrt(
            F.sum(F.col("__za") * F.col("__za"))
            * F.sum(F.col("__zb") * F.col("__zb"))
        ).alias("__den")
    )
    lags = centered.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("__lag")
    )
    bshift = (
        centered.select(
            *groups, F.col("__i").alias("__ib"), "__zb"
        )
        .withColumn("__jk", F.lit(1))
        .join(F.broadcast(lags.withColumn("__jk", F.lit(1))), "__jk")
        .drop("__jk")
        .select(*groups, "__lag", (F.col("__ib") + F.col("__lag")).alias("__i"), "__zb")
    )
    prods = centered.select(*groups, "__i", "__za").join(
        bshift, groups + ["__i"]
    )
    per_lag = prods.groupBy(*groups, "__lag").agg(
        F.sum(F.col("__za") * F.col("__zb")).alias("__num")
    )
    r_tab = per_lag.join(denom, groups) if groups else (
        per_lag.withColumn("__jk", F.lit(1)).join(
            F.broadcast(denom.withColumn("__jk", F.lit(1))), "__jk"
        ).drop("__jk")
    )
    return r_tab.select(
        *groups,
        F.col("__lag").alias("lag"),
        F.round(F.try_divide("__num", "__den"), round_to).alias("r"),
    ).orderBy(*groups, "lag")
