"""Deterministic sampling for training-data pipelines.

Random sampling is unusable in a reproducible data pipeline (and
un-oracle-able); both operators here are pure functions of the data:

- ``hash_sample``:     keep rows whose md5(id) falls under a threshold —
  a deterministic Bernoulli(p) that is stable across runs, engines and
  partitionings (the standard trick for held-out splits of a crawl).
- ``stratified_topk``: per-key quota by deterministic hash order — the
  "at most K docs per domain/language" balancing step. One window per key;
  Spark's WindowGroupLimit pushes the rank filter below the sort at scale.

Both are single column expressions / one window — no UDFs, no shuffles
beyond the required per-key partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on md5(salt:id).

    Uses the first 8 hex digits as a uniform 32-bit integer; different
    ``salt`` values give independent splits (train/val/test from one
    corpus without materializing assignments).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return df.filter(bucket < int(fraction * (16**8)))


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the held-out-split
    primitive of every training pipeline: each row lands in exactly one
    named split, by cumulative md5-bucket ranges, stable across runs,
    engines, partitionings and table growth (a doc keeps its split when
    the corpus around it changes — the property random splits lack).

    ``fractions`` maps split name → fraction; they must sum to ≤ 1 (any
    remainder is dropped, e.g. {"train": .8, "val": .1, "test": .1}).
    Pure column expression (one md5 + a CASE ladder over contiguous
    ranges): map-only, fuses into the scan, no shuffle at any scale.
    """
    if not fractions:
        raise ValueError("fractions must name at least one split")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"negative fraction in {fractions}")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        lo, cum = cum, cum + frac
        # round the cumulative fraction before scaling: float accumulation
        # makes 0.8+0.1+0.1 = 0.9999999999999999, whose truncated bucket
        # bound (2^32 - 1) would silently drop the top bucket; rounding at
        # 12 decimals restores the intended boundary (and matches the
        # DuckDB oracle's floor(frac * 2^32) over decimal literals)
        cond = (bucket >= int(round(lo, 12) * (16**8))) & (
            bucket < int(round(cum, 12) * (16**8))
        )
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr).filter(F.col(split_col).isNotNull())


def stratified_topk(
    df: DataFrame, key_col: str, k: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """At most ``k`` rows per ``key_col`` value, chosen by deterministic
    hash order (so the quota is an unbiased-ish, reproducible subset rather
    than "first K in storage order")."""
    order = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(order, id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Token-budgeted domain mixture sampling — the "data mixing" step of a
    pretraining pipeline (The Pile's per-source weights; DoReMi's reweighted
    sampling): given target ``weights`` per domain and a ``total_tokens``
    budget, keep documents domain-by-domain in deterministic hash order
    until each domain's token budget ``total_tokens * w_d / Σw`` is filled.

    A doc is kept iff the cumulative token count of the docs *before* it
    (in md5 order within its domain) is still under the domain budget — so
    every domain overshoots by at most one document, and the selection is a
    pure function of (salt, ids): reproducible and engine-replayable.
    Domains absent from ``weights`` get weight 0 (dropped entirely).

    Returns kept rows as (id, domain, n_tokens, cum_before). Scale shape:
    one window per domain (shuffle keyed by domain; skew note — a domain
    holding half the corpus makes one partition hot, so at 100 TB either
    pre-aggregate per (domain, hash-prefix) or split hot domains into
    salted sub-windows and merge budgets). No joins, no driver state: the
    per-domain budget is a literal CASE expression.
    """
    if total_tokens < 0:
        raise ValueError(f"total_tokens must be non-negative, got {total_tokens}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    # per-domain budget as one CASE chain over the (small) weights dict —
    # a literal expression, not a join; realistic pipelines have O(10²) domains
    budget = F.lit(0.0)
    for d, wt in sorted(weights.items()):
        budget = F.when(
            F.col(domain_col) == d, F.lit(float(total_tokens) * float(wt) / wsum)
        ).otherwise(budget)
    n_tokens = (
        F.col(token_count_col)
        if token_count_col
        else F.size(F.split(F.col(text_col), " "))
    )
    order = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(order, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = df.select(
        F.col(id_col),
        F.col(domain_col),
        n_tokens.cast("long").alias("n_tokens"),
        budget.alias("__budget"),
    ).withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return scored.filter(F.col("cum_before") < F.col("__budget")).drop("__budget")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling without replacement via the Efraimidis–Spirakis
    A-ES scheme (Inf. Process. Lett. 97(5), 2006): each row draws a
    deterministic uniform ``u`` from md5(salt:id) and gets the exponential
    race key ``-ln(u) / w``; the ``k`` smallest keys are a weighted sample
    without replacement. Keying on md5 makes the draw a pure function of
    (salt, id) — reproducible and engine-replayable.

    Scale shape: one column expression plus a global ``orderBy(...).limit(k)``,
    which Spark executes as TakeOrderedAndProject — a per-partition top-k
    heap merged on the driver, **no full sort, no shuffle**. At 100 TB each
    task returns at most ``k`` rows; the driver merges P·k candidates. For
    k beyond driver memory, swap the limit for a window-rank over a single
    range-partitioned sort (documented tradeoff).

    Rows with non-positive weight are dropped (zero weight ⇒ never sampled,
    matching A-ES as w→0 since the key diverges).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if "sample_key" in df.columns:
        raise ValueError(
            "weighted_sample: input column 'sample_key' collides with the "
            "output key column; rename it first"
        )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / float(16**8)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        # null ids would get a null key, and nulls sort FIRST ascending —
        # they would silently occupy the top-k; null weight is "no weight"
        df.filter(F.col(weight_col) > 0)
        .filter(F.col(id_col).isNotNull())
        .withColumn("sample_key", key)
        .orderBy("sample_key", id_col)
        .limit(k)
    )


def importance_sample(
    df: DataFrame,
    weight_col: str,
    rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic importance resampling — the 'R' of DSIR (Xie et al.
    2023): keep each row with probability min(1, rate · weight), decided by
    the same md5 coin as :func:`hash_sample` so the draw is a pure function
    of (salt, id) — reproducible across runs, engines, and partitionings,
    and independent draws come from different salts.

    ``weight_col`` is any non-negative weight (e.g. ``exp(log_ratio)`` from
    ``textstats.dsir_weights``); ``rate`` scales the overall acceptance to
    hit a target corpus size. One filter expression — no shuffle, no UDF,
    survives whole-stage codegen.
    """
    if rate < 0:
        raise ValueError(f"rate must be non-negative, got {rate}")
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / float(16**8)
    )
    p = F.least(F.lit(1.0), F.lit(float(rate)) * F.col(weight_col))
    return df.filter(coin < p)


def neyman_sample(
    df: DataFrame,
    budget: int,
    value_col: str,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    round_sd_to: int = 6,
) -> DataFrame:
    """Neyman-allocation stratified sampling: the ``budget`` is split across
    strata proportionally to N_h·σ_h (stratum size × score spread), the
    allocation that minimizes the variance of the stratified mean estimator
    (Neyman 1934) — where proportional allocation oversamples homogeneous
    strata and starves variable ones.

    n_h = min(N_h, max(1, ⌊budget · N_hσ_h / Σ N_hσ_h⌋)) — floor, never
    round-half, so the arithmetic is engine-exact; σ is population stddev
    ROUNDED to ``round_sd_to`` before the allocation for the same reason
    (float-sum order must not flip an allocation). Within each stratum the
    survivors are the first n_h rows by deterministic md5(id) order.

    Scale shape: one tiny per-stratum moments aggregate (count + stddev_pop,
    map-side combinable) broadcast back, one global Σ N_hσ_h (a one-row
    cross join), one stratum-keyed window for the rank — the same single
    wide exchange every stratified sampler pays. Output keeps all input
    columns plus (n_stratum, sd, alloc, strat_rank).
    """
    from pyspark.sql import Window

    stats = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_stratum"),
        F.round(
            F.coalesce(F.stddev_pop(value_col), F.lit(0.0)), round_sd_to
        ).alias("sd"),
    )
    tot = stats.agg(
        F.sum(F.col("n_stratum") * F.col("sd")).alias("__tot")
    )
    alloc = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "alloc",
            F.when(F.col("__tot") > 0,
                F.least(
                    F.col("n_stratum"),
                    F.greatest(
                        F.lit(1),
                        F.floor(
                            F.lit(float(budget))
                            * (F.col("n_stratum") * F.col("sd"))
                            / F.col("__tot")
                        ),
                    ),
                ),
            ).otherwise(F.lit(0)),
        )
        .drop("__tot")
    )
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.join(F.broadcast(alloc), stratum_col)
        .withColumn("strat_rank", F.row_number().over(w))
        .filter(F.col("strat_rank") <= F.col("alloc"))
    )


def token_budget(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer token
    budget across groups proportional to their weights → (group, weight,
    alloc) with Σ alloc = ``total_budget`` EXACTLY — the mixture-budget
    step of a training run ("3 T tokens across these domains at these
    ratios") where naive rounding of quotas over- or under-shoots and
    downstream shard writers need the totals to close.

    Each group's quota is budget·w/Σw; everyone gets ⌊quota⌋; the
    leftover seats go one each to the largest fractional remainders
    (ties → group id, so the result is a pure function of the inputs).
    Plan: one weight aggregate, one sum (constant-key broadcast back),
    one remainder-rank window over the GROUP table (bounded: one row per
    group, not per token/doc). Groups with weight ≤ 0 are dropped —
    a zero-weight domain gets nothing by definition.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    w = (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(F.sum(F.col(weight_col)).alias("weight"))
        .filter(F.col("weight") > 0)
    )
    tot = w.agg(F.sum("weight").alias("tw"))
    quota = w.withColumn("__k", F.lit(1)).join(
        F.broadcast(tot.withColumn("__k", F.lit(1))), "__k"
    ).select(
        "group",
        "weight",
        (F.lit(float(total_budget)) * F.col("weight") / F.col("tw")).alias("q"),
    )
    based = quota.select(
        "group",
        "weight",
        F.floor("q").cast("long").alias("base"),
        (F.col("q") - F.floor("q")).alias("rem"),
    )
    wleft = Window.orderBy(F.desc("rem"), F.asc("group"))
    # the remainder-rank window is partition-less BY DESIGN: it orders one
    # row PER GROUP (domains/languages — thousands, not rows of the corpus)
    extra = based.withColumn("__r", F.row_number().over(wleft))
    leftover = F.lit(total_budget) - F.sum("base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        extra.withColumn("__left", leftover)
        .select(
            "group",
            "weight",
            (F.col("base") + F.when(F.col("__r") <= F.col("__left"), 1).otherwise(0))
            .cast("long")
            .alias("alloc"),
        )
    )


POISSON1_CDF_HEX = (
    "5e2d58d8",
    "bc5ab1b1",
    "eb715e1d",
    "fb239797",
    "ff1025f5",
    "ffd90f3b",
    "fffa8b71",
    "ffff540c",
    "ffffed1f",
    "fffffe21",
)
"""Cumulative CDF of Poisson(1) at k=0..9, scaled to 32-bit hex — the
inverse-CDF lookup table for deterministic Poisson bootstrap weights.
P(K > 9) ≈ 1.1e-7; the tail is clamped to 10."""


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    n_boot: int = 100,
    level: float = 0.95,
    keys: list[str] | None = None,
    salt: str = "boot",
    round_to: int = 6,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean of ``value_col``
    (per ``keys`` group if given) — the SINGLE-PASS bootstrap that works
    at any scale (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams"): classical resampling needs n draws per
    replicate from a dataset whose n you'd have to know and shuffle;
    instead each row independently enters replicate b with weight
    w ~ Poisson(1), which converges to the multinomial bootstrap and
    needs only a map-side explode.

    Determinism: w is the inverse CDF of Poisson(1) applied to the
    md5(salt:b:id) hex uniform (first 8 hex chars compared against the
    precomputed ``POISSON1_CDF_HEX`` thresholds — a string comparison any
    engine replays bit-for-bit). The CI is EXACT order statistics of the
    B replicate means: rank ⌊α/2·B⌋+1 from each end — no interpolation
    to disagree on.

    Plan: one explode to B weight rows per input row (map-only), one
    grouped aggregate to replicate means, one bounded sorted array
    (exactly B values per group) for the order statistics. Returns keys +
    (mean, ci_lo, ci_hi, n_boot).

    Tiny-group caveat: a group so small that a replicate draws ALL-zero
    weights (P ≈ 0.37^n_rows) yields a null replicate mean; collect_list
    drops it and the affected bound surfaces as NULL rather than a
    silently-shifted rank — bootstrap CIs on 1-2-row groups are
    statistically meaningless anyway.
    """
    if not 0.0 < level < 1.0:
        raise ValueError(f"level must be in (0,1), got {level}")
    if n_boot < 10:
        raise ValueError(f"n_boot must be >= 10, got {n_boot}")
    keys = keys or []
    alpha = 1.0 - level
    k_lo = int(alpha / 2.0 * n_boot) + 1  # 1-based rank from the bottom
    k_hi = n_boot - k_lo + 1
    u = F.substring(
        F.md5(
            F.concat_ws(
                ":", F.lit(salt), F.col("__b").cast("string"), F.col(id_col).cast("string")
            )
        ),
        1,
        8,
    )
    w = sum(
        (u >= F.lit(t)).cast("int") for t in POISSON1_CDF_HEX
    )
    rep = (
        df.select(*keys, id_col, F.col(value_col).cast("double").alias("__v"))
        .withColumn("__b", F.explode(F.sequence(F.lit(1), F.lit(int(n_boot)))))
        .withColumn("__w", w)
        .groupBy(*keys, "__b")
        .agg(
            (F.sum(F.col("__w") * F.col("__v")) / F.sum("__w")).alias("__mean_b")
        )
    )
    point = df.groupBy(*keys).agg(F.avg(F.col(value_col).cast("double")).alias("mean"))
    # order statistics via a bounded sorted array (exactly n_boot values
    # per group — no window, no extra shuffle beyond the replicate agg)
    bounds = rep.groupBy(*keys).agg(
        F.sort_array(F.collect_list("__mean_b")).alias("__ms")
    ).select(
        *keys,
        F.element_at("__ms", k_lo).alias("ci_lo"),
        F.element_at("__ms", k_hi).alias("ci_hi"),
    )
    # equi-join on a literal key when ungrouped: a 1x1 crossJoin would
    # plan as a cartesian/nested-loop node, which the suite-wide plan
    # audit (rightly) rejects everywhere
    jk = keys or ["__k"]
    if not keys:
        point = point.withColumn("__k", F.lit(1))
        bounds = bounds.withColumn("__k", F.lit(1))
    joined = point.join(bounds, jk).drop("__k")
    return joined.select(
        *keys,
        F.round("mean", round_to).alias("mean"),
        F.round("ci_lo", round_to).alias("ci_lo"),
        F.round("ci_hi", round_to).alias("ci_hi"),
        F.lit(int(n_boot)).alias("n_boot"),
    )


def negative_samples(
    positives: DataFrame,
    n_items: int,
    k: int = 2,
    user_col: str = "user_id",
    item_col: str = "item_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training
    (the word2vec/BPR recipe): for every (user, positive item) pair,
    draw ``k`` candidate items uniformly from [1, n_items] by md5 hash
    and keep those the user has NOT interacted with — reproducible
    across runs/engines (the md5 draw is a pure function of
    (salt, user, item, j)), so the training set is a deterministic
    artifact, not a run-dependent one.

    Plan: one explode to k candidates per positive (map-only) + ONE
    left-anti join against the user's positive set keyed on
    (user, item) — the collision check never collects per-user item
    sets. Collisions with positives are DROPPED, not resampled (resample
    loops don't relationalize; at real n_items the loss is k·|I_u|/n —
    negligible, and the oracle replays the same convention).
    Returns (user, pos_item, j, neg_item).
    """
    if n_items < 2:
        raise ValueError(f"n_items must be >= 2, got {n_items}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = positives.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("pos_item")
    ).distinct()
    cand = pos.withColumn(
        "j", F.explode(F.sequence(F.lit(1), F.lit(int(k))))
    ).withColumn(
        "neg_item",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(salt),
                            F.col("u").cast("string"),
                            F.col("pos_item").cast("string"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % n_items
            + 1
        ),
    )
    return cand.join(
        pos.select(F.col("u"), F.col("pos_item").alias("neg_item")),
        ["u", "neg_item"],
        "left_anti",
    ).select(
        F.col("u").alias(user_col),
        "pos_item",
        "j",
        "neg_item",
    )


def split_leakage_audit(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    split_col: str = "split",
    train: str = "train",
    test: str = "test",
) -> DataFrame:
    """Temporal-leakage audit of a train/test split → one row per group
    present on BOTH sides: (group, n_train, n_test, max_train_ts,
    min_test_ts, leaked) with ``leaked`` true when the group's training
    window reaches into (or past) its test window — the forecasting /
    user-modeling failure a hash split silently causes (the model has
    seen this entity's FUTURE). The audit every time-sensitive pipeline
    should run before trusting offline metrics; `leaked` count 0 is the
    invariant a time-based split must satisfy.

    Plan: one (group, split) min/max aggregate (map-side combined) +
    one self-join-free pivot via conditional aggregation — a single
    shuffle keyed on the group regardless of corpus size.
    """
    agg = (
        df.filter(F.col(split_col).isin([train, test]))
        .groupBy(group_col)
        .agg(
            F.sum(F.when(F.col(split_col) == train, 1).otherwise(0)).alias("n_train"),
            F.sum(F.when(F.col(split_col) == test, 1).otherwise(0)).alias("n_test"),
            F.max(F.when(F.col(split_col) == train, F.col(ts_col))).alias(
                "max_train_ts"
            ),
            F.min(F.when(F.col(split_col) == test, F.col(ts_col))).alias(
                "min_test_ts"
            ),
        )
    )
    return agg.filter((F.col("n_train") > 0) & (F.col("n_test") > 0)).select(
        group_col,
        "n_train",
        "n_test",
        "max_train_ts",
        "min_test_ts",
        (F.col("max_train_ts") >= F.col("min_test_ts")).alias("leaked"),
    )


def effective_sample_size(
    df: DataFrame,
    weight_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Kish effective sample size of an importance-weighted dataset →
    (groups..., n, sum_w, ess, ess_ratio) with ESS = (Σw)²/Σw² (Kish
    1965) — the honesty check on any reweighted corpus (DSIR weights,
    domain mixtures, propensity reweighting): n rows at ESS ≪ n means
    a few heavy rows dominate and downstream estimates carry far less
    evidence than the row count suggests. ``ess_ratio`` = ESS/n.

    One grouped aggregate (map-side combined); rows with null, NaN, or
    negative weights are excluded (a negative weight has no ESS
    semantics and would silently corrupt both sums).
    """
    w = F.col(weight_col).cast("double")
    base = df.filter(w.isNotNull() & ~F.isnan(w) & (w >= 0))
    groups = list(group_cols or [])
    agg = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(w).alias("__s1"),
        F.sum(w * w).alias("__s2"),
    )
    ess = F.when(
        F.col("__s2") > 0, F.col("__s1") * F.col("__s1") / F.col("__s2")
    ).otherwise(F.lit(0.0))
    return agg.select(
        *groups,
        "n",
        F.round("__s1", round_to).alias("sum_w"),
        F.round(ess, round_to).alias("ess"),
        F.round(ess / F.col("n"), round_to).alias("ess_ratio"),
    )


def theil_index(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Theil T inequality index per group (Theil 1967) →
    group_cols + (n, mean_value, theil):

        T = (1/n) Σ (x/μ)·ln(x/μ)  =  Σ x·ln x / (n·μ) − ln μ

    over POSITIVE values — the decomposable concentration metric for
    "how unevenly is the token/byte/weight budget spread across
    sources/domains/shards?" (T = 0 perfectly even, ln n maximal: one
    member holds everything). The companion to ``effective_sample_size``:
    ESS says how many samples the weights are worth, Theil says where the
    mass went. Null/NaN/non-positive values are excluded (ln undefined;
    a zero-mass member contributes nothing in the x→0 limit).

    Plan: one grouped aggregate of exact sums (n, Σx, Σx·ln x) — map-side
    combined, no shuffle beyond the group keys, closed form from the
    moments. NULL when the group is empty after filtering.
    """
    v = F.col(value_col).cast("double")
    groups = list(group_cols or [])
    base = df.filter(v.isNotNull() & ~F.isnan(v) & (v > 0)).select(
        *groups, v.alias("__x")
    )
    agg = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.log("__x")).alias("__sxlx"),
    )
    mu = F.col("__s") / F.col("n")
    return agg.select(
        *groups,
        "n",
        F.round(mu, round_to).alias("mean_value"),
        F.round(F.col("__sxlx") / F.col("__s") - F.log(mu), round_to).alias(
            "theil"
        ),
    )


def herfindahl_index(
    df: DataFrame,
    category_col: str,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group → group_cols +
    (k, total, hhi, hhi_norm): HHI = Σ_c share_c² over the categories'
    mass shares (row counts, or ``weight_col`` mass — bytes, tokens),
    and the size-adjusted HHI* = (HHI − 1/k)/(1 − 1/k) ∈ [0, 1] (NULL
    when k = 1, where concentration is vacuous). 1/HHI is the "effective
    number of sources" — the one-number companion to ``theil_index``
    (decomposable inequality) and ``domain_mix`` (the full table) that
    answers "is this corpus really diverse, or three domains in a trench
    coat?". The antitrust thresholds (0.15 / 0.25 for moderate / high
    concentration) transfer directly to source-mix review. Null
    categories and null/NaN/negative weights are excluded.

    Plan: one (group, category) aggregate + one group aggregate — the
    share denominator folds in algebraically (Σ m_c² / (Σ m_c)²), so one
    linear pass, no window, no second scan.
    """
    groups = list(group_cols or [])
    if weight_col is None:
        m = F.lit(1.0)
        base = df.filter(F.col(category_col).isNotNull())
    else:
        wv = F.col(weight_col).cast("double")
        base = df.filter(
            F.col(category_col).isNotNull() & wv.isNotNull() & ~F.isnan(wv) & (wv >= 0)
        )
        m = wv
    per_cat = base.groupBy(*groups, F.col(category_col).alias("__c")).agg(
        F.sum(m).alias("__m")
    )
    agg = per_cat.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__m").alias("__tot"),
        F.sum(F.col("__m") * F.col("__m")).alias("__sq"),
    )
    k = F.col("k").cast("double")
    hhi = F.col("__sq") / (F.col("__tot") * F.col("__tot"))
    return agg.select(
        *groups,
        "k",
        F.round("__tot", round_to).alias("total"),
        F.when(F.col("__tot") > 0, F.round(hhi, round_to)).alias("hhi"),
        F.when(
            (F.col("__tot") > 0) & (F.col("k") > 1),
            F.round((hhi - 1.0 / k) / (1.0 - 1.0 / k), round_to),
        ).alias("hhi_norm"),
    )


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.3,
    weight_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled domain mixing weights (the multilingual-corpus
    sampling rule of mC4/T5 and XLM-R: p_i ∝ share_i^α) → one row per
    domain: (domain, mass, share, adj_share, boost):

        adj_share_i = share_i^α / Σ_j share_j^α,
        boost_i     = adj_share_i / share_i

    — α = 1 reproduces natural sampling, α → 0 approaches uniform; the
    standard knob for up-sampling tail languages/domains without flat
    repetition of the head. ``boost`` is the per-domain sampling factor a
    pipeline multiplies into its per-row keep probability (compose with
    ``hash_sample``'s deterministic thresholding) or into per-domain
    epoch counts. ``weight_col`` measures mass in bytes/tokens instead of
    rows. Null domains and null/NaN/negative weights are excluded.

    Plan: one (domain) aggregate + one scalar rollup broadcast back —
    domain-bounded state, no window, one corpus scan.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if weight_col is None:
        m = F.lit(1.0)
        base = df.filter(F.col(domain_col).isNotNull())
    else:
        wv = F.col(weight_col).cast("double")
        base = df.filter(
            F.col(domain_col).isNotNull() & wv.isNotNull() & ~F.isnan(wv) & (wv >= 0)
        )
        m = wv
    per = base.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(m).alias("__m")
    )
    tot = per.agg(
        F.sum("__m").alias("__tot"),
    )
    j = per.withColumn("__k", F.lit(1)).join(
        F.broadcast(tot.withColumn("__k", F.lit(1))), "__k"
    )
    share = F.col("__m") / F.col("__tot")
    powed = j.select("domain", "__m", share.alias("__share"),
                     F.pow(share, F.lit(float(alpha))).alias("__pow"))
    ptot = powed.agg(F.sum("__pow").alias("__ptot"))
    out = powed.withColumn("__k", F.lit(1)).join(
        F.broadcast(ptot.withColumn("__k", F.lit(1))), "__k"
    )
    adj = F.col("__pow") / F.col("__ptot")
    return out.select(
        "domain",
        F.round("__m", round_to).alias("mass"),
        F.round("__share", round_to).alias("share"),
        F.round(adj, round_to).alias("adj_share"),
        F.round(adj / F.col("__share"), round_to).alias("boost"),
    )


def uniformity_gof(
    df: DataFrame,
    bucket_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Chi-square goodness-of-fit against the UNIFORM distribution over
    the observed buckets, per group → (group_cols..., k, n, chi2):

        χ² = Σ_buckets (o_b − n/k)² / (n/k)        ~ χ²(k−1) under H0

    The hash-quality audit for everything keyed by a hash residue in
    this engine ([hash_split] folds, salting shards, [rendezvous_shards]
    assignments, LSH bands): a biased residue silently skews every
    downstream split ratio and shard load. χ² near k−1 is healthy; tens
    of times that means the bucketing expression is eating entropy.
    NULL when k < 2. (One-way GOF; [g_independence] / [cramers_v] are
    the two-way companions.)

    Plan: one (group, bucket) count + one grouped roll-up — two
    map-side-combined aggregates, nothing else.
    """
    groups = list(group_cols or [])
    base = df.filter(F.col(bucket_col).isNotNull()).select(
        *groups, F.col(bucket_col).alias("__b")
    )
    per_b = base.groupBy(*groups, "__b").agg(F.count(F.lit(1)).alias("__o"))
    agg = per_b.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__kk"),
        F.sum("__o").alias("__n"),
        F.sum(F.col("__o").cast("double") * F.col("__o")).alias("__o2"),
    )
    # Σ(o − n/k)²/(n/k) = k/n·Σo² − n   (algebraic — one pass, no join-back)
    kd = F.col("__kk").cast("double")
    nd = F.col("__n").cast("double")
    chi2 = kd / nd * F.col("__o2") - nd
    out = agg.select(
        *groups,
        F.col("__kk").cast("long").alias("k"),
        F.col("__n").cast("long").alias("n"),
        F.when(F.col("__kk") >= 2, F.round(chi2, round_to)).alias("chi2"),
    )
    return out.orderBy(*groups) if groups else out


def count_dispersion(
    df: DataFrame,
    count_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Overdispersion diagnosis + negative-binomial moment fit for count
    data per group → (group_cols..., n, mean, variance, dispersion,
    chi2, nb_r, nb_p):

        dispersion = s²/x̄           (1 under Poisson)
        chi2       = (n−1)·s²/x̄      (the dispersion test statistic,
                                      ~χ²(n−1) under Poisson)
        NB fit     = r = x̄²/(s²−x̄),  p = x̄/s²   (method of moments,
                     only when s² > x̄ — NULL otherwise)

    The model-choice read on any event-count column (events per user,
    dups per document, tokens per line): Poisson assumptions silently
    understate variance everywhere counts cluster — dispersion ≫ 1 says
    switch the sampling/power math to negative binomial, and (r, p) are
    the plug-in parameters. One moment aggregate per group, nothing
    else.
    """
    groups = list(group_cols or [])
    c = F.col(count_col).cast("double")
    base = df.filter(c.isNotNull() & ~F.isnan(c) & (c >= 0)).select(
        *groups, c.alias("__c")
    )
    mom = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__c").alias("__m"),
        F.var_samp("__c").alias("__s2"),
    )
    m, s2, n = F.col("__m"), F.col("__s2"), F.col("__n").cast("double")
    disp = F.try_divide(s2, m)
    chi2 = F.when(m > 0, (n - 1.0) * s2 / m)
    over = (s2 > m) & (m > 0)
    out = mom.select(
        *groups,
        F.col("__n").cast("long").alias("n"),
        F.round(m, round_to).alias("mean"),
        F.round(s2, round_to).alias("variance"),
        F.round(disp, round_to).alias("dispersion"),
        F.round(chi2, round_to).alias("chi2"),
        F.when(over, F.round(m * m / (s2 - m), round_to)).alias("nb_r"),
        F.when(over, F.round(m / s2, round_to)).alias("nb_p"),
    )
    return out.orderBy(*groups) if groups else out


def diversity_profile(
    df: DataFrame,
    category_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Ecology-style diversity profile of a categorical mix per group →
    (group_cols..., n, richness, shannon_h, evenness, simpson, dominance):

        shannon_h = −Σ p_i ln p_i          (nats)
        evenness  = H / ln(richness)        (Pielou; NULL if k = 1)
        simpson   = 1 − Σ p_i²              (Gini-Simpson)
        dominance = max p_i                 (Berger-Parker)

    The one-aggregate answer to "how concentrated is this domain /
    language / source mix?" — the same question [herfindahl_mix] answers
    with 1/Σp² and [l_diversity] with a privacy floor, profiled across
    the standard indices at once so a mix report needs one operator.

    Plan: one (group, category) count + one grouped roll-up — two
    map-side-combined aggregates, nothing else. Null categories are
    excluded (make them explicit upstream if meaningful).
    """
    groups = list(group_cols or [])
    base = df.filter(F.col(category_col).isNotNull()).select(
        *groups, F.col(category_col).alias("__cat")
    )
    per = base.groupBy(*groups, "__cat").agg(F.count(F.lit(1)).alias("__c"))
    tot = per.groupBy(*groups).agg(F.sum("__c").alias("__n"))
    j = per.join(tot, groups) if groups else (
        per.withColumn("__k", F.lit(1)).join(
            F.broadcast(tot.withColumn("__k", F.lit(1))), "__k"
        ).drop("__k")
    )
    pi = F.col("__c") / F.col("__n").cast("double")
    agg = j.groupBy(*groups).agg(
        F.max("__n").alias("__nn"),
        F.count(F.lit(1)).alias("__k"),
        (-F.sum(pi * F.log(pi))).alias("__h"),
        F.sum(pi * pi).alias("__p2"),
        F.max(pi).alias("__dom"),
    )
    out = agg.select(
        *groups,
        F.col("__nn").cast("long").alias("n"),
        F.col("__k").cast("long").alias("richness"),
        F.round("__h", round_to).alias("shannon_h"),
        F.when(
            F.col("__k") >= 2,
            F.round(F.col("__h") / F.log(F.col("__k").cast("double")), round_to),
        ).alias("evenness"),
        F.round(1.0 - F.col("__p2"), round_to).alias("simpson"),
        F.round("__dom", round_to).alias("dominance"),
    )
    return out.orderBy(*groups) if groups else out
