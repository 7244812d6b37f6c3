"""Mergeable sketches for approximate aggregation at scale.

SpaceSaving heavy hitters (Metwally/Agrawal/El Abbadi, ICDT 2005; merge
per "Mergeable Summaries", Agarwal et al., PODS 2012): each partition
maintains ``capacity`` counters in one streaming pass; partial sketches are
tiny (capacity rows per partition) and merge by summing matched counters —
the canonical two-phase shape for "top domains / hottest tokens over 100 TB"
where an exact global groupBy would shuffle the full corpus.

Error contract: a partial's reported count overestimates the true partition
count by at most that partial's ``err`` (the count the item inherited when
it evicted another); after merging, every surviving item's TRUE count lies
in ``[count − err, count]``, and any item with true frequency >
Σ_partitions (n_p / capacity) is guaranteed to survive. With ``capacity ≥``
the number of distinct items per partition the sketch degenerates to exact
counting (err = 0) — which is what the gate query exploits so DuckDB can
value-check the whole machinery (the nprobe=n_lists ⇒ exact trick from the
IVF gate).

Scale shape: one ``mapInPandas`` scan (Arrow-batched, dict-based counters —
no per-row Python function calls against Spark rows), then a groupBy over
≤ P·capacity partial rows — the shuffle carries sketches, not data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "hll_distinct", "kmv_distinct", "kmv_set_ops", "ddsketch_quantiles", "weighted_quantiles"]

# 2^55 — the fixed-point scale for HLL register sums (see hll_distinct)
_HLL_SCALE = 1 << 55


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    group_cols: list[str] | str | None = None,
) -> DataFrame:
    """K-minimum-values distinct-count estimation (Bar-Yossef et al. 2002;
    Beyer et al., SIGMOD 2007 unbiased estimator): hash every value to a
    uniform in (0, 1), keep the k smallest; if the k-th smallest is h_k,
    the unbiased estimate is ``(k − 1) / h_k``. Unlike HLL, the sketch is
    a pure function of the value SET under a deterministic hash (md5
    here), so an external SQL engine replays the ESTIMATE exactly — the
    approximate answer itself is oracle-checkable, not just an exact
    degenerate regime. Mergeable: min-k of a union is the min-k of the
    merged min-k sets, so partial aggregation applies.

    With fewer than k distinct values the count is exact (returns the
    distinct count itself, flagged ``exact = true``).

    Returns (group_cols..., est_distinct DOUBLE rounded 4, n_kept, exact).
    Plan: distinct hashes (one agg with map-side combine — the shuffle
    carries hashes, not values), then per-group k smallest via a window
    rank (WindowGroupLimit pushes the filter down) or a global TakeOrdered
    when ungrouped.
    """
    if k < 2:
        raise ValueError(f"k must be ≥ 2, got {k}")
    groups = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols or [])
    )
    h = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / float(16**15)
    hashed = (
        df.filter(F.col(col).isNotNull())
        .select(*groups, h.alias("__h"))
        .groupBy(*groups, "__h")
        .agg(F.lit(1))
        .select(*groups, "__h")
    )
    from pyspark.sql import Window

    if groups:
        w = Window.partitionBy(*groups).orderBy("__h")
        kept = (
            hashed.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .groupBy(*groups)
            .agg(F.max("__h").alias("__hk"), F.count(F.lit(1)).alias("n_kept"))
        )
    else:
        kept = (
            hashed.orderBy("__h")
            .limit(k)
            .agg(F.max("__h").alias("__hk"), F.count(F.lit(1)).alias("n_kept"))
        )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (k - 1) / F.col("__hk")
    )
    return kept.select(
        *groups,
        F.round(est, 4).alias("est_distinct"),
        "n_kept",
        (F.col("n_kept") < k).alias("exact"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 6,
    group_cols: list[str] | str | None = None,
) -> DataFrame:
    """HyperLogLog distinct-count estimation (Flajolet et al., AofA 2007)
    with fully engine-replayable arithmetic. Each value's md5 is split into
    a register index (low ``p`` bits of a 60-bit prefix) and a 54-bit
    remainder ``w``; the register stores max ρ(w) (position of the highest
    set bit counted from the MSB of the 54-bit word — computed EXACTLY as
    ``55 − p − length(bin(w))`` + 1 via the binary-string length, no
    floating log2). The harmonic-mean denominator Σ 2^−M_j is kept as a
    SCALED INTEGER Σ 2^(55−M_j) (a bigint — exact, order-insensitive, so
    Spark's and an external engine's partial-aggregation orders cannot
    diverge the way a float sum could); one final double division produces
    the estimate, with the standard small-range linear-counting correction
    when E ≤ 2.5m and empty registers remain.

    Scale shape: groupBy (groups, register) max-agg — map-side combine
    reduces every partition to ≤ m rows per group before the shuffle, the
    defining property of the HLL sketch (state = m 6-bit registers
    regardless of input size; union-mergeable by register-wise max).
    Complements :func:`kmv_distinct`: KMV's estimate is replayable from the
    k-min set; HLL's is replayable from the register table and costs O(m)
    state instead of O(k) hashes with better accuracy per byte.

    Returns (group_cols..., est_distinct DOUBLE rounded 4, n_regs, zeros,
    s_scaled BIGINT) — ``s_scaled`` is the exact integer sketch sum, so a
    value-check on the output verifies the full register table, not just
    the rounded estimate.
    """
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    m = 1 << p
    rem_bits = 60 - p
    rho_max = rem_bits + 1  # ρ when the remainder is all zeros
    alpha = 0.7213 / (1.0 + 1.079 / m)
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols or [])
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    regs = (
        df.filter(F.col(col).isNotNull())
        .select(*groups, h.alias("__h"))
        .select(
            *groups,
            (F.col("__h") % m).alias("__reg"),
            F.expr(f"__h div {m}").alias("__w"),
        )
        .select(
            *groups,
            "__reg",
            F.when(
                F.col("__w") > 0, F.lit(rho_max) - F.length(F.bin(F.col("__w")))
            )
            .otherwise(F.lit(rho_max))
            .alias("__rho"),
        )
        .groupBy(*groups, "__reg")
        .agg(F.max("__rho").alias("__M"))
    )
    grp = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("int").alias("n_regs"),
        F.sum(F.expr(f"CAST(1 AS BIGINT) << ({rho_max} - __M)")).alias("__s_present"),
    )
    zeros = F.lit(m) - F.col("n_regs")
    s = F.col("__s_present") + zeros.cast("long") * F.lit(_HLL_SCALE)
    e_raw = F.lit(alpha * m * m * float(_HLL_SCALE)) / s.cast("double")
    est = F.when(
        (zeros > 0) & (e_raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(m) / zeros),
    ).otherwise(e_raw)
    return grp.select(
        *groups,
        F.round(est, 4).alias("est_distinct"),
        "n_regs",
        zeros.cast("int").alias("zeros"),
        s.alias("s_scaled"),
    )


def _space_saving(values: Iterator, capacity: int) -> dict:
    """One streaming SpaceSaving pass: item -> (count, err)."""
    counters: dict = {}
    for v in values:
        if v in counters:
            c, e = counters[v]
            counters[v] = (c + 1, e)
        elif len(counters) < capacity:
            counters[v] = (1, 0)
        else:
            # evict the min counter; the newcomer inherits its count as err
            victim = min(counters, key=lambda k: counters[k][0])
            c_min, _ = counters.pop(victim)
            counters[v] = (c_min + 1, c_min)
    return counters


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 1000,
) -> DataFrame:
    """Approximate top-``k`` most frequent values of ``col``.

    Returns (value, count, err, count_lo): ``count`` is an upper bound on
    the true frequency, ``count − err = count_lo`` a lower bound; rows are
    the top-k by ``count`` with value as the deterministic tiebreak. Null
    values are ignored (no frequency, matching count/groupBy-of-non-null
    semantics).
    """
    if k <= 0 or capacity <= 0:
        raise ValueError(f"k and capacity must be positive, got k={k}, capacity={capacity}")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        # one sketch per TASK (not per Arrow batch): feed all batches
        # through a single SpaceSaving state for the partition
        def gen():
            for pdf in batches:
                for v in pdf[col]:
                    if v is not None and v == v:  # skip null/NaN
                        yield v

        counters = _space_saving(gen(), capacity)
        if counters:
            yield pd.DataFrame(
                [(v, c, e) for v, (c, e) in counters.items()],
                columns=["value", "cnt", "err"],
            )

    schema = f"value {dict(df.dtypes)[col]}, cnt long, err long"
    partials = df.select(col).mapInPandas(partial, schema)
    merged = partials.groupBy("value").agg(
        F.sum("cnt").alias("count"), F.sum("err").alias("err")
    )
    return (
        merged.select(
            "value",
            "count",
            "err",
            (F.col("count") - F.col("err")).alias("count_lo"),
        )
        .orderBy(F.desc("count"), "value")
        .limit(k)
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) → (i, j, cnt):
    ``depth`` rows of ``width`` counters; row i buckets a value by an
    md5-derived hash (salted with i), so the WHOLE sketch is a pure
    deterministic function of the multiset — an external engine replays it
    bucket for bucket (same property as :func:`kmv_distinct`).

    Relationally the build is ONE groupBy: explode each value into its
    ``depth`` (row, bucket) cells, hash agg on (i, j). Shuffle carries at
    most depth*width cells after map-side combine — the sketch IS the
    partial aggregate, which is what makes CMS mergeable across partitions
    / days / shards for free. Completes the deterministic sketch family
    here: KMV (distinct count), SpaceSaving (top-k), CMS (point frequency).
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}, {width}")
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    cells = df.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), i -> struct(i AS i, "
                f"CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', "
                f"CAST({col} AS STRING))), 1, 15), 16, 10) AS BIGINT) % {width} AS j))"
            )
        ).alias("c"),
        w.alias("__w"),
    )
    return (
        cells.groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_build` sketch:
    est(x) = min over rows i of counter[i][h_i(x)] (never under-counts;
    over-counts by collisions, bounded by N·e/width w.p. ``1 - e^-depth``).

    The keys side is hashed with the SAME md5 bucket math and equi-joined
    to the sketch on (i, j) — the sketch is tiny (depth × width cells), so
    Spark broadcasts it and the probe is a map-side lookup join + one
    min-agg per key. Absent (i, j) cells mean counter 0 → estimate 0
    (left join + coalesce)."""
    probes = keys.select(
        F.col(col).alias("key"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), i -> struct(i AS i, "
                f"CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', "
                f"CAST({col} AS STRING))), 1, 15), 16, 10) AS BIGINT) % {width} AS j))"
            )
        ).alias("c"),
    ).select("key", F.col("c.i").alias("i"), F.col("c.j").alias("j"))
    joined = probes.join(F.broadcast(cms), ["i", "j"], "left")
    return (
        joined.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def kmv_set_ops(
    df: DataFrame,
    col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Set-operation estimates between every pair of groups from their KMV
    sketches (Beyer et al., SIGMOD 2007 §4): build one k-minimum-values
    sketch per group, then for each group pair combine the two sketches —
    the k smallest hashes of the UNION are the k smallest of the merged
    min-k sets, K∩ = how many of those k appear in both sketches, and

        |A∪B| ≈ (k−1)/h_k,   J(A,B) ≈ K∩/k,   |A∩B| ≈ J·|A∪B|

    This is the whole point of mergeable sketches at 100 TB: overlap /
    Jaccard between two multi-TB key sets (users active in two periods,
    tokens of two corpus slices) from two k-row summaries, no join of the
    raw sets. md5-deterministic like :func:`kmv_distinct`, so even the
    APPROXIMATE estimates replay exactly in an external engine.

    Plan: one distinct-hash pass + per-group window top-k (the sketch
    build), then the pair combine runs on G·k rows — driver-scale for any
    real group count. Exact regime: if the union sketch holds fewer than
    k hashes, the estimates are exact (flagged ``exact``).

    Returns (g_a, g_b, est_union, est_jaccard, est_intersection,
    k_inter, exact) for g_a < g_b.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / float(16**15)
    from pyspark.sql import Window

    hashed = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("__h")
    sk = (
        hashed.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select("g", "__h")
    )
    a = sk.select(F.col("g").alias("g_a"), F.col("__h").alias("ha"))
    b = sk.select(F.col("g").alias("g_b"), F.col("__h").alias("hb"))
    # union sketch per pair: all hashes from both sides, deduped, k smallest
    pairs = (
        a.select("g_a").distinct()
        .join(b.select("g_b").distinct(), F.col("g_a") < F.col("g_b"))
    )
    both = pairs.join(a, "g_a").select("g_a", "g_b", F.col("ha").alias("h")).unionAll(
        pairs.join(b, "g_b").select("g_a", "g_b", F.col("hb").alias("h"))
    )
    wp = Window.partitionBy("g_a", "g_b").orderBy("h")
    union_k = (
        both.groupBy("g_a", "g_b", "h")
        .agg(F.count(F.lit(1)).alias("__sides"))
        .withColumn("__r", F.row_number().over(wp))
        .filter(F.col("__r") <= k)
    )
    agg = union_k.groupBy("g_a", "g_b").agg(
        F.max("h").alias("hk"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.when(F.col("__sides") == 2, 1).otherwise(0)).alias("k_inter"),
    )
    est_union = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((k - 1) / F.col("hk"))
    est_j = F.col("k_inter") / F.col("n_kept")
    return agg.select(
        "g_a",
        "g_b",
        F.round(est_union, 4).alias("est_union"),
        F.round(est_j, 6).alias("est_jaccard"),
        F.round(est_union * est_j, 4).alias("est_intersection"),
        F.col("k_inter").cast("long").alias("k_inter"),
        (F.col("n_kept") < k).alias("exact"),
    )


def quantile_bisect(
    df,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    max_iter: int = 64,
):
    """EXACT order statistics over an integer column via rank bisection —
    no sort, no shuffle: O(log range) full scans, each one map-side
    aggregate (the BigQuery/Presto "exact percentile without a sort"
    strategy; at 100 TB a global sort is the thing you never do, while a
    counting scan is embarrassingly parallel and combinable).

    For each q the target rank is k = ⌊q·(N−1) + 1e-9⌋ + 1 (1-indexed
    k-th smallest; the ε absorbs binary rounding of q·(N−1), same guard
    as the prefix-filter bound). Bisection invariant: answer = min v with
    count(≤ v) ≥ k. ALL unconverged quantiles share each round's scan —
    one conditional-sum aggregate computes every count(≤ mid_i) at once,
    so the pass count is log(range), not len(qs)·log(range).

    Returns a LOCAL list of (q, value, rank) tuples (driver-side result,
    like any aggregate) — callers wanting a DataFrame wrap it with
    ``session.local_df``. Raises on a null-only/empty column.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count(value_col).alias("n"),
    ).collect()[0]
    lo0, hi0, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0 or lo0 is None:
        raise ValueError(f"quantile_bisect: no non-null values in {value_col!r}")
    import math

    targets = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile q must be in [0, 1], got {q}")
        targets.append((q, int(math.floor(q * (n - 1) + 1e-9)) + 1))
    state = {q: (int(lo0), int(hi0)) for q, _ in targets}
    ks = dict(targets)
    for _ in range(max_iter):
        open_qs = [q for q, (a, b) in state.items() if a < b]
        if not open_qs:
            break
        mids = {q: (state[q][0] + state[q][1]) // 2 for q in open_qs}
        aggs = [
            F.sum(
                F.when(F.col(value_col) <= F.lit(mids[q]), 1).otherwise(0)
            ).alias(f"c{i}")
            for i, q in enumerate(open_qs)
        ]
        row = df.agg(*aggs).collect()[0]
        for i, q in enumerate(open_qs):
            a, b = state[q]
            if row[f"c{i}"] >= ks[q]:
                state[q] = (a, mids[q])
            else:
                state[q] = (mids[q] + 1, b)
    unconverged = [q for q, (a, b) in state.items() if a < b]
    if unconverged:
        raise RuntimeError(f"quantile_bisect: no convergence for {unconverged}")
    return [(q, state[q][0], ks[q]) for q, _ in targets]


def ddsketch_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
    round_to: int = 6,
) -> DataFrame:
    """DDSketch quantile estimates (Masson et al., VLDB 2019) — the
    RELATIVE-error quantile sketch: positive values land in log buckets
    ``ceil(ln(x)/ln(γ))`` with γ = (1+α)/(1−α), so every estimate is
    within α of the true value MULTIPLICATIVELY (q99 of a latency column
    is off by ≤ 1%, not by a fixed absolute amount like equal-width
    histograms). → (q, rank, bucket, est, n) per requested quantile.

    The whole sketch is one bucket aggregate (mergeable across partitions
    by construction — this is why DDSketch is the datacenter-standard
    distributed quantile) + one cumulative window over the BUCKET table
    (≤ ln(max/min)/ln γ rows — ~2.3k buckets for a 10¹⁰ dynamic range at
    α=0.01, never the data). The bucket ratio is rounded to 9 dp before
    ``ceil`` in both engines so a libm last-ulp difference at a bucket
    boundary cannot flip the bucket id. Non-positive values are excluded
    (the standard positive-store; add an offset upstream for signed
    data)."""
    import math

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from ..session import local_df

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lng = math.log(gamma)
    vals = df.select(F.col(value_col).cast("double").alias("x")).filter(F.col("x") > 0)
    buckets = (
        vals.select(
            F.ceil(F.round(F.log("x") / F.lit(lng), 9)).cast("long").alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        # the bucket table (≤ ~2.3k rows for a 10¹⁰ range) is consumed by
        # the N total AND the cumulative window — concurrent branches of
        # one job, so eager: lazy would let the branches race and run the
        # corpus scan twice (previously N came from a separate vals.count()
        # job, a full second pass over the data).
        .localCheckpoint()
    )
    # N = Σ bucket counts — exactly the positive-value count the sketch
    # covers; deriving it from the materialized bucket table keeps the
    # whole operator at ONE corpus scan. rank = floor(q·(N−1)) + 1 in
    # double arithmetic, identical to the former driver-side math.floor.
    total = buckets.agg(F.sum("c").alias("__n"))
    qdf = local_df(df.sparkSession, [(float(q),) for q in qs], "q DOUBLE")
    ranked = qdf.crossJoin(F.broadcast(total)).select(
        "q",
        (
            F.floor(F.col("q") * (F.col("__n") - F.lit(1)).cast("double")) + F.lit(1)
        ).cast("long").alias("rank"),
        "__n",
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.withColumn("cum", F.sum("c").over(w))
    hit = (
        cum.withColumn("__k", F.lit(1))
        .join(F.broadcast(ranked.withColumn("__k", F.lit(1))), "__k")
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("q", "rank", "__n")
        .agg(F.min("b").alias("bucket"))
    )
    est = F.round(
        F.lit(2.0) * F.pow(F.lit(gamma), F.col("bucket")) / F.lit(gamma + 1.0),
        round_to,
    )
    return hit.select(
        "q", "rank", "bucket", est.alias("est"), F.col("__n").cast("long").alias("n")
    ).orderBy("q")


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    trim: float = 0.1,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """EXACT trimmed mean per group (the robust location estimate —
    discard the lowest and highest ⌊trim·n⌋ observations, average the
    rest) → group_cols + (n, n_trimmed, trimmed_mean): the metric-stream
    aggregate that survives the fat tails and sentinel values MAD flags
    but a plain mean swallows.

    No global sort: per-(group, distinct value) counts + one in-group
    cumulative window give each distinct value a rank interval
    [cum_prev+1, cum]; its surviving weight is the interval's overlap with
    the kept band [k+1, n−k] (k = ⌊trim·n⌋), so the mean is one weighted
    agg over the distinct-value table — the quantile_bisect philosophy
    applied to interior means. ``max_distinct`` fail-fasts when a group's
    distinct-value count would funnel one window task (pre-round/bin raw
    continuous inputs, the roc_auc contract). Null/NaN excluded. NULL mean
    when trimming removes everything (n ≤ 2k).
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    v = F.col(value_col).cast("double")
    groups = list(group_cols or [])
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *groups, v.alias("__v")
    )
    per = base.groupBy(*groups, "__v").agg(F.count(F.lit(1)).alias("__c"))
    if max_distinct is not None:
        # materialize the distinct-value table before the guard job so the
        # guard count and the main plan share ONE corpus scan (the
        # _per_score_counts pattern; optimization r12 — the guard
        # previously re-scanned the corpus). Distinct-value-bounded when
        # the guard passes.
        per = per.localCheckpoint(eager=False)
        worst = (
            per.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"trimmed_mean: a group has {worst} distinct values "
                f"(> max_distinct={max_distinct}); pre-round/bin the input "
                "or raise/disable the guard."
            )
    w = (
        Window.partitionBy(*groups)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*groups) if groups else Window.partitionBy()
    ranked = per.select(
        *groups,
        "__v",
        "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wn).alias("__n"),
    )
    k = F.floor(F.col("__n") * trim)
    lo, hi = k, F.col("__n") - k  # kept ranks are (lo, hi]
    wt = F.greatest(
        F.lit(0),
        F.least(F.col("__cum"), hi) - F.greatest(F.col("__cum") - F.col("__c"), lo),
    )
    agg = ranked.groupBy(*groups).agg(
        F.max("__n").cast("long").alias("n"),
        F.max(F.col("__n") - 2 * k).cast("long").alias("__kept"),
        F.sum(F.col("__v") * wt).alias("__s"),
    )
    return agg.select(
        *groups,
        "n",
        F.greatest(F.lit(0), F.col("__kept")).cast("long").alias("n_kept"),
        F.when(
            F.col("__kept") > 0,
            F.round(F.col("__s") / F.col("__kept"), round_to),
        ).alias("trimmed_mean"),
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    trim: float = 0.1,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """EXACT winsorized mean per group → group_cols + (n, n_clamped,
    winsorized_mean): CLAMP (don't drop) the lowest and highest ⌊trim·n⌋
    observations to the nearest kept order statistics x_(k+1) / x_(n−k),
    then average all n — ``trimmed_mean``'s sibling that keeps the sample
    size (the estimator behind winsorized variance and robust z-scores;
    preferred when downstream wants a mean over exactly n observations).

    Same no-global-sort plan as trimmed_mean: distinct-value rank
    intervals from one in-group cumulative window; the interior
    contribution is the interval overlap with the kept band, and the two
    boundary order statistics come from the SAME aggregate via
    interval-containment conditionals — one window + one agg, no second
    pass. ``max_distinct`` fail-fasts raw continuous inputs. Null/NaN
    excluded. NULL when clamping covers everything (n ≤ 2k would leave
    an empty interior only when n = 0; k < n/2 always holds for
    trim < 0.5).
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    v = F.col(value_col).cast("double")
    groups = list(group_cols or [])
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *groups, v.alias("__v")
    )
    per = base.groupBy(*groups, "__v").agg(F.count(F.lit(1)).alias("__c"))
    if max_distinct is not None:
        # share one corpus scan between guard and main plan (the
        # _per_score_counts pattern; optimization r12)
        per = per.localCheckpoint(eager=False)
        worst = (
            per.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"winsorized_mean: a group has {worst} distinct values "
                f"(> max_distinct={max_distinct}); pre-round/bin the input "
                "or raise/disable the guard."
            )
    w = (
        Window.partitionBy(*groups)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*groups) if groups else Window.partitionBy()
    ranked = per.select(
        *groups,
        "__v",
        "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wn).alias("__n"),
    )
    k = F.floor(F.col("__n") * trim)
    lo, hi = k, F.col("__n") - k  # kept ranks are (lo, hi]
    prev = F.col("__cum") - F.col("__c")
    interior_wt = F.greatest(
        F.lit(0), F.least(F.col("__cum"), hi) - F.greatest(prev, lo)
    )
    contains = lambda r: (prev < r) & (F.col("__cum") >= r)  # noqa: E731
    agg = ranked.groupBy(*groups).agg(
        F.max("__n").cast("long").alias("n"),
        F.max(k).cast("long").alias("__k"),
        F.sum(F.col("__v") * interior_wt).alias("__s"),
        # boundary order statistics x_(k+1) and x_(n-k) via containment
        F.max(F.when(contains(lo + 1), F.col("__v"))).alias("__xlo"),
        F.max(F.when(contains(hi), F.col("__v"))).alias("__xhi"),
    )
    total = (
        F.col("__s")
        + F.col("__k") * F.col("__xlo")
        + F.col("__k") * F.col("__xhi")
    )
    return agg.select(
        *groups,
        "n",
        (2 * F.col("__k")).cast("long").alias("n_clamped"),
        F.when(
            F.col("n") > 0, F.round(total / F.col("n"), round_to)
        ).alias("winsorized_mean"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    group_cols: list[str] | None = None,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Exact WEIGHTED quantiles per group → one row per (group, prob):
    (group_cols..., prob, quantile) where the p-quantile is the smallest
    value whose cumulative weight reaches p · total weight (the
    left-continuous inverse-CDF convention; negative/zero/null weights
    are excluded).

    The duplication-aware corpus statistic: after dedup assigns each
    canonical document its cluster size as weight, the UNWEIGHTED median
    length describes unique texts while the weighted one describes the
    corpus a model would actually train on — these differ exactly when
    duplication correlates with the measured property (boilerplate is
    short AND viral).

    Plan: the trimmed_mean machinery — one (group, value) weight-sum
    aggregate, one cumulative window over the bounded distinct-value
    axis (``max_distinct`` fail-fast), then a probs-keyed min aggregate.
    The probs axis joins as a broadcast literal table; no per-row work
    after the first aggregate.
    """
    from pyspark.sql import Window

    if not probs or not all(0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in (0, 1], got {probs}")
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & w.isNotNull() & ~F.isnan(w) & (w > 0)
    ).select(*groups, v.alias("__v"), w.alias("__w"))
    per_v = base.groupBy(*groups, "__v").agg(F.sum("__w").alias("__wv"))
    if max_distinct is not None:
        # share one corpus scan between guard and main plan (the
        # _per_score_counts pattern; optimization r12)
        per_v = per_v.localCheckpoint(eager=False)
        worst = (
            per_v.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"weighted_quantiles: a group has {worst} distinct values "
                f"(> max_distinct={max_distinct}); pre-bin the inputs."
            )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*groups) if groups else Window.partitionBy()
    cum = per_v.select(
        *groups,
        "__v",
        F.sum("__wv").over(w_cum).alias("__cw"),
        F.sum("__wv").over(w_tot).alias("__tw"),
    )
    ptab = base.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "prob double"
    )
    hit = (
        cum.withColumn("__k", F.lit(1))
        .join(F.broadcast(ptab.withColumn("__k", F.lit(1))), "__k")
        .filter(F.col("__cw") >= F.col("prob") * F.col("__tw"))
    )
    return (
        hit.groupBy(*groups, "prob")
        .agg(F.min("__v").alias("quantile"))
        .orderBy(*groups, "prob")
    )
