"""Distribution-drift detection and rank tests — the monitoring layer of a
training-data pipeline: "did this month's crawl shift against the reference
corpus?" (PSI — the industry-standard scorecard metric), "is the shift
statistically real?" (two-sample Kolmogorov-Smirnov, Mann-Whitney U).

All three are pure aggregation/window plans keyed on the comparison group:
no collects in the data path, no cross joins (the reference distribution is
replicated to comparison groups through a constant-key broadcast hash join —
the reference side is an already-aggregated distinct-value table, orders of
magnitude smaller than the corpus). Every emitted statistic is rounded so a
SQL engine replays it hash-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ks_statistic",
    "psi",
    "mann_whitney_u",
    "mutual_information",
    "spearman_rho",
    "js_divergence",
    "cramers_v",
    "bh_fdr",
    "kendall_tau_b",
    "anova_f",
    "g_test",
    "cohens_d",
    "wasserstein_1d",
    "grubbs_stat",
    "hellinger_tv",
    "cohens_h",
    "simpson_check",
    "holm_bonferroni",
    "cvm_two_sample",
    "odds_ratio",
    "by_fdr",
    "risk_ratio",
]


def _const_key_broadcast(small: DataFrame, big: DataFrame) -> DataFrame:
    """small × big as a constant-key BroadcastHashJoin (equi-join on a
    literal) — the replicate-tiny-side pattern that keeps CartesianProduct
    / BroadcastNestedLoopJoin out of the plan."""
    return big.withColumn("__k", F.lit(1)).join(
        F.broadcast(small.withColumn("__k", F.lit(1))), "__k"
    ).drop("__k")


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ref_group,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic of every non-reference group
    against the reference group → (group, n_ref, n_grp, ks_d).

    D = sup_x |F_ref(x) − F_g(x)|; for step CDFs the sup is attained at a
    data point, so it is the max over the MERGED distinct values of both
    samples of the right-continuous CDF gap. Plan: per-(group, value)
    counts, reference counts replicated to each comparison group via a
    constant-key broadcast join (ref side is the aggregated distinct-value
    table), one group-partitioned ordered window for the two cumulative
    sums, one max agg. Everything is co-keyed on the comparison group —
    at 100 TB the only wide exchange is the initial per-(group, value)
    count, which is map-side combined.
    """
    vals = df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("x"))
    ref_counts = (
        vals.filter(F.col("grp") == ref_group)
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    grp_counts = (
        vals.filter(F.col("grp") != ref_group)
        .groupBy("grp", "x")
        .agg(F.count(F.lit(1)).alias("cg"))
    )
    groups = grp_counts.select("grp").distinct()
    ref_rep = _const_key_broadcast(ref_counts, groups).select(
        "grp", "x", "cr", F.lit(0).alias("cg")
    )
    merged = (
        grp_counts.select("grp", "x", F.lit(0).alias("cr"), "cg")
        .unionByName(ref_rep)
        .groupBy("grp", "x")
        .agg(F.sum("cr").alias("cr"), F.sum("cg").alias("cg"))
    )
    w = Window.partitionBy("grp").orderBy("x")
    wtot = Window.partitionBy("grp")
    cum = merged.select(
        "grp",
        F.sum("cr").over(w).alias("ccr"),
        F.sum("cg").over(w).alias("ccg"),
        F.sum("cr").over(wtot).alias("n_ref"),
        F.sum("cg").over(wtot).alias("n_grp"),
    )
    return (
        cum.filter((F.col("n_ref") > 0) & (F.col("n_grp") > 0))
        .groupBy("grp")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_grp").alias("n_grp"),
            F.round(
                F.max(
                    F.abs(
                        F.col("ccr").cast("double") / F.col("n_ref")
                        - F.col("ccg").cast("double") / F.col("n_grp")
                    )
                ),
                round_to,
            ).alias("ks_d"),
        )
        .withColumnRenamed("grp", "group")
    )


def psi(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ref_group,
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index of every non-reference group against the
    reference → (group, psi_value): Σ_i (p_i − q_i)·ln(p_i/q_i) over
    ``bins`` equal-width bins anchored on the REFERENCE min/max (values
    outside clamp into the edge bins — the standard scorecard convention),
    with empty-bin shares floored at ``eps`` so the logs stay finite and
    deterministic. PSI < 0.1 ⇒ stable, 0.1-0.25 ⇒ drifting, > 0.25 ⇒
    shifted (the conventional gates).

    Plan: one 2-scalar reference aggregate broadcast onto the rows
    (constant-key), per-(group, bin) counts, a bins-per-group dense grid
    (sequence + explode — bins is a literal) left-joined so EMPTY bins
    contribute, one group agg.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    vals = df.select(F.col(group_col).alias("grp"), F.col(value_col).cast("double").alias("x"))
    ref_stats = vals.filter(F.col("grp") == ref_group).agg(
        F.min("x").alias("rmin"), F.max("x").alias("rmax")
    )
    binned = _const_key_broadcast(ref_stats, vals).select(
        "grp",
        F.when(
            F.col("rmax") == F.col("rmin"), F.lit(0)
        )
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("x") - F.col("rmin"))
                        / ((F.col("rmax") - F.col("rmin")) / bins)
                    ).cast("int"),
                ),
            )
        )
        .alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        counts.select("grp")
        .distinct()
        .select("grp", F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"))
    )
    dense = grid.join(counts, ["grp", "bin"], "left").fillna(0, ["c"])
    wtot = Window.partitionBy("grp")
    shares = dense.select(
        "grp",
        "bin",
        F.greatest(
            F.col("c").cast("double") / F.sum("c").over(wtot), F.lit(float(eps))
        ).alias("share"),
    )
    ref_shares = shares.filter(F.col("grp") == ref_group).select(
        "bin", F.col("share").alias("q")
    )
    return (
        shares.filter(F.col("grp") != ref_group)
        .join(F.broadcast(ref_shares), "bin")
        .groupBy("grp")
        .agg(
            F.round(
                F.sum((F.col("share") - F.col("q")) * F.log(F.col("share") / F.col("q"))),
                round_to,
            ).alias("psi_value")
        )
        .withColumnRenamed("grp", "group")
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two groups → one row
    (n_a, n_b, u_a, z): U from tie-averaged ranks, z from the normal
    approximation WITH the tie-corrected variance
    σ² = n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1))) — the standard
    large-sample form (every real corpus has ties; the uncorrected
    variance overstates σ and hides real shifts).

    Average ranks come from per-distinct-value counts + one ordered
    cumulative window (avg_rank = rank_before + (t+1)/2), never a per-row
    global row_number — the whole test is one distinct-value aggregate
    regardless of corpus size.
    """
    vals = df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("x")).filter(
        F.col("grp").isin([group_a, group_b])
    )
    per_val = vals.groupBy("x").agg(
        F.sum(F.when(F.col("grp") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == group_b, 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    # the single-partition ordered window runs over DISTINCT VALUES of the
    # measured column (bounded, typically ≪ rows); the row stream never
    # funnels through one task
    ranked = per_val.select(
        "x",
        "ca",
        "cb",
        (F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
         + (F.col("ca") + F.col("cb") + 1) / 2.0).alias("avg_rank"),
        ((F.col("ca") + F.col("cb")) * (F.col("ca") + F.col("cb"))
         * (F.col("ca") + F.col("cb")) - (F.col("ca") + F.col("cb"))).alias("tie3"),
    )
    agg = ranked.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * F.col("avg_rank")).alias("r_a"),
        F.sum("tie3").alias("t3"),
    )
    var = (
        F.col("n_a") * F.col("n_b") / 12.0
        * (
            (F.col("n_a") + F.col("n_b") + 1)
            - F.col("t3")
            / F.greatest(
                (F.col("n_a") + F.col("n_b")) * (F.col("n_a") + F.col("n_b") - 1),
                F.lit(1),
            )  # N<2 ⇒ t3=0, the clamp only dodges ANSI 0/0
        )
    )
    # z is undefined when either group is empty or EVERY value is tied
    # (variance 0) — emit NULL rather than an ANSI divide-by-zero
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0, round_to).alias("u_a"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0),
            F.round(
                (F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
                 - F.col("n_a") * F.col("n_b") / 2.0)
                / F.sqrt(var),
                round_to,
            ),
        ).alias("z"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information between two categorical columns → one row
    (n, n_x, n_y, h_x, h_y, mi, nmi): MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))
    in nats, NMI = MI/√(H(x)·H(y)) (Strehl & Ghosh 2002's normalization)
    — the dependence audit of a training pipeline: "does this feature
    leak the label?", "is the domain column confounded with language?".
    NMI is NULL when either marginal entropy is 0 (a constant column
    carries no information to normalize by).

    Plan: one (x, y) count aggregate (map-side combined — the only pass
    over the corpus), marginals derived FROM it (tiny), broadcast back on
    each key, one scalar aggregate. Rows with a NULL in either column are
    excluded up front (SQL NULL keys don't equi-join; a null category
    should be made explicit upstream with coalesce if it is meaningful).
    """
    pairs = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    mx = pairs.groupBy("x").agg(F.sum("cxy").alias("cx"))
    my = pairs.groupBy("y").agg(F.sum("cxy").alias("cy"))
    tot = pairs.agg(F.sum("cxy").alias("nn")).withColumn("__k", F.lit(1))
    j = (
        pairs.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
    )
    c = F.col("cxy").cast("double")
    n = F.col("nn").cast("double")
    agg = j.agg(
        F.max("nn").alias("n"),
        F.count_distinct("x").alias("n_x"),
        F.count_distinct("y").alias("n_y"),
        F.sum((c / n) * F.log(c * n / (F.col("cx") * F.col("cy")))).alias("__mi"),
        (-F.sum((c / n) * F.log(F.col("cx").cast("double") / n))).alias("__hx_w"),
        (-F.sum((c / n) * F.log(F.col("cy").cast("double") / n))).alias("__hy_w"),
    )
    # H(x) summed over the JOINT rows with p(x,y) weights equals the
    # marginal entropy Σ p(x)·ln p(x) exactly in math; summation order
    # noise is absorbed by the rounding, same contract as ks/psi above
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_x").cast("long").alias("n_x"),
        F.col("n_y").cast("long").alias("n_y"),
        F.round("__hx_w", round_to).alias("h_x"),
        F.round("__hy_w", round_to).alias("h_y"),
        F.round("__mi", round_to).alias("mi"),
        F.when(
            (F.col("__hx_w") > 0) & (F.col("__hy_w") > 0),
            F.round(F.col("__mi") / F.sqrt(F.col("__hx_w") * F.col("__hy_w")), round_to),
        ).alias("nmi"),
    )


def spearman_rho(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Spearman rank correlation per group (tie-AVERAGED ranks — exactly
    scipy's ``spearmanr``) → group_cols + (n, rho): the monotone-drift
    companion to ``corr_stats``'s Pearson — "did the ORDERING relationship
    between two metrics shift?", robust to any monotone rescaling and to
    heavy tails that dominate a product-moment estimate.

    Ranks come from per-(group, distinct value) counts + one ordered
    cumulative window per column (the roc_auc rank pattern), joined back to
    the rows on the value — the corpus itself is never globally sorted;
    the window input is distinct-value-bounded. ``max_distinct`` is the
    exact-mode fail-fast for raw continuous inputs (distinct ≈ rows would
    funnel a group through one window task at 100 TB); rho is then Pearson
    over the ranks via exact sums, NULL when either column is constant
    within the group. Null/NaN in EITHER column drops the row (a rank
    needs both coordinates).
    """
    groups = list(group_cols or [])
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    base = df.select(*groups, a.alias("__a"), b.alias("__b")).filter(
        F.col("__a").isNotNull()
        & ~F.isnan("__a")
        & F.col("__b").isNotNull()
        & ~F.isnan("__b")
    )

    # one corpus scan total (optimization r12): collapse the corpus to the
    # per-(group, a, b) CELL table once, materialize it, and derive
    # everything — the guard, both tie-averaged rank tables, and the final
    # Pearson-over-ranks sums — from the cells. Previously the guard, each
    # rank_table's value-count aggregate, AND the two corpus-wide
    # join-backs each re-scanned/re-shuffled `base` (~5 corpus passes; the
    # join-back alone shuffled every row twice). The rank of a distinct
    # value and all sums are exact dyadic rationals (ranks are halves,
    # counts integers), so Σ_rows ra·rb ≡ Σ_cells c·ra·rb bit-for-bit.
    cells = base.groupBy(*groups, "__a", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint(eager=False)

    def rank_table(col: str, out: str) -> DataFrame:
        per = cells.groupBy(*groups, col).agg(F.sum("__c").alias("__c"))
        w = (
            Window.partitionBy(*groups)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
            if groups
            else Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        )
        return per.select(
            *groups,
            col,
            (
                F.coalesce(F.sum("__c").over(w), F.lit(0))
                + (F.col("__c") + 1) / 2.0
            ).alias(out),
        )

    if max_distinct is not None:
        worst = (
            cells.groupBy(*groups)
            .agg(
                F.count_distinct("__a").alias("__da"),
                F.count_distinct("__b").alias("__db"),
            )
            .agg(F.max(F.greatest("__da", "__db")).alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"spearman_rho: a group has {worst} distinct values "
                f"(> max_distinct={max_distinct}); the per-group rank window "
                "would funnel them through one task. Pre-bin/round the "
                "inputs, or raise/disable max_distinct if they are "
                "genuinely discrete."
            )
    ranked = cells.join(rank_table("__a", "__ra"), [*groups, "__a"]).join(
        rank_table("__b", "__rb"), [*groups, "__b"]
    )
    c = F.col("__c")
    agg = ranked.groupBy(*groups).agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(c * F.col("__ra")).alias("__sx"),
        F.sum(c * F.col("__rb")).alias("__sy"),
        F.sum(c * F.col("__ra") * F.col("__ra")).alias("__sxx"),
        F.sum(c * F.col("__rb") * F.col("__rb")).alias("__syy"),
        F.sum(c * F.col("__ra") * F.col("__rb")).alias("__sxy"),
    )
    num = F.col("n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = F.col("n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = F.col("n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        *groups,
        "n",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(num / F.sqrt(varx * vary), round_to),
        ).alias("rho"),
    )


def js_divergence(
    df: DataFrame,
    group_col: str,
    token_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Jensen-Shannon divergence (base 2, so JSD ∈ [0, 1]) of each group's
    token distribution against the GLOBAL corpus distribution →
    (group, n_tokens, jsd) — the symmetric, always-finite drift metric for
    comparing source/crawl vocabularies (KL explodes on unseen tokens; PSI
    needs binning; JSD needs neither).

    Input is the exploded (group, token) occurrence table. Scale shape:
    one per-(group, token) count + one per-token global count, equi-joined
    on the token (co-keyed shuffle; AQE broadcasts the global side when the
    vocabulary fits). Tokens ABSENT from a group are never materialized:
    with p = in-group prob and q = global prob, every absent token
    contributes 0.5·q·log2(2q/q) = 0.5·q, so their total is
    0.5·(1 − Σ_present q) — closed form from the present rows alone, no
    vocab × groups blowup at any scale.
    """
    g, t = F.col(group_col), F.col(token_col)
    base = df.select(g.alias("__g"), t.alias("__t")).filter(
        F.col("__g").isNotNull() & F.col("__t").isNotNull()
    )
    # ONE corpus pass (optimization r12): the (group, token) count table
    # is the sufficient statistic — the global per-token counts and the
    # corpus total are exact integer roll-ups of it, so the (usually
    # exploded-upstream) token table is scanned once and only the
    # vocabulary-sized count table is materialized (guide §5: never cache
    # the stream when a bounded aggregate carries the same information).
    per = base.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint(eager=False)
    gtot = per.groupBy("__t").agg(F.sum("__c").alias("__gc"))
    n_all = per.agg(F.sum("__c")).first()[0]
    grp = per.groupBy("__g").agg(F.sum("__c").alias("__ng"))
    j = per.join(gtot, "__t").join(F.broadcast(grp), "__g")
    p = F.col("__c") / F.col("__ng")
    q = F.col("__gc") / F.lit(float(n_all))
    m2 = p + q  # 2m
    term = 0.5 * p * F.log2(2.0 * p / m2) + 0.5 * q * F.log2(2.0 * q / m2)
    agg = j.groupBy("__g").agg(
        F.max("__ng").alias("__n"),
        F.sum(term).alias("__present"),
        F.sum(q).alias("__q_present"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("long").alias("n_tokens"),
        F.round(
            F.col("__present") + 0.5 * (1.0 - F.col("__q_present")), round_to
        ).alias("jsd"),
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Cramér's V association between two categorical columns (Cramér
    1946) → one row (n, levels_a, levels_b, chi2, v): the χ² statistic of
    the contingency table normalized to [0, 1] by n·min(r−1, c−1) — the
    "are these two metadata fields redundant / is the label leaking from a
    feature?" screen a labeling pipeline runs across column pairs.

    χ² over the FULL r×c grid (empty cells contribute their expectation)
    collapses algebraically to Σ_observed o²/e − n, so only observed cells
    ever materialize: one (a, b) contingency aggregate + two category-
    bounded marginal aggregates broadcast back onto it. Null in either
    column drops the row. NULL v when either column is constant.
    """
    a, b = F.col(col_a), F.col(col_b)
    base = df.select(
        a.cast("string").alias("__a"), b.cast("string").alias("__b")
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    cont = base.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__o"))
    ma = cont.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    mb = cont.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    j = cont.join(F.broadcast(ma), "__a").join(F.broadcast(mb), "__b")
    stats = j.agg(
        F.sum("__o").cast("long").alias("n"),
        F.count_distinct("__a").cast("long").alias("levels_a"),
        F.count_distinct("__b").cast("long").alias("levels_b"),
        F.sum(
            F.col("__o") * F.col("__o")
            / (F.col("__ra").cast("double") * F.col("__cb"))
        ).alias("__s"),
    )
    chi2 = (F.col("__s") * F.col("n")) - F.col("n")
    mindim = F.least(F.col("levels_a") - 1, F.col("levels_b") - 1)
    return stats.select(
        "n",
        "levels_a",
        "levels_b",
        F.round(chi2, round_to).alias("chi2"),
        F.when(
            mindim > 0, F.round(F.sqrt(chi2 / (F.col("n") * mindim)), round_to)
        ).alias("v"),
    )


def bh_fdr(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a TABLE OF TESTS (Benjamini
    & Hochberg 1995) → the input columns + (bh_rank, p_adj, rejected):
    with m tests ranked by ascending p (ties stabilized by the remaining
    columns' values), p_adj(i) = min_{j≥i}(m·p_(j)/j) clamped to 1,
    and ``rejected`` marks every rank ≤ the largest k with
    p_(k) ≤ k·α/m — the step-up rule. The multiple-testing companion to
    the drift family: a monitor running ks/psi/mann-whitney/mcnemar across
    hundreds of segments MUST correct before paging anyone.

    Plan note: the input is a test-results table — one row per
    (metric, segment) pair, bounded by the monitoring configuration, never
    by the corpus (the corpus was reduced to p-values upstream). The two
    global windows here ride that bounded table, the same exemption as
    zipf_fit's rank window; null/NaN p rows are excluded (an unrun test is
    not a discovery candidate).
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    p = F.col(p_col).cast("double")
    base = df.filter(p.isNotNull() & ~F.isnan(p))
    others = [c for c in base.columns if c != p_col]
    order = [F.col(p_col).asc()] + [F.col(c).asc() for c in others]
    w_rank = Window.orderBy(*order)  # bounded: tests table, config-sized
    m = Window.partitionBy()
    ranked = base.select(
        "*",
        F.row_number().over(w_rank).alias("bh_rank"),
        F.count(F.lit(1)).over(m).alias("__m"),
    )
    w_rev = Window.orderBy(F.col("bh_rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = ranked.select(
        "*",
        F.least(
            F.lit(1.0),
            F.min(F.col("__m") * p / F.col("bh_rank")).over(w_rev),
        ).alias("__adj"),
        # step-up: rejected iff some k >= rank has p_(k) <= k*alpha/m;
        # equivalently the running max over ranks >= i of the indicator
        F.max(
            (p <= F.col("bh_rank") * alpha / F.col("__m")).cast("int")
        ).over(w_rev).alias("__rej"),
    )
    return adj.select(
        *[F.col(c) for c in base.columns],
        "bh_rank",
        F.round("__adj", round_to).alias("p_adj"),
        (F.col("__rej") == 1).alias("rejected"),
    ).orderBy("bh_rank")


def kendall_tau_b(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_cells: int | None = 10_000,
) -> DataFrame:
    """Kendall τ-b rank correlation per group (Kendall 1945, the
    tie-adjusted form scipy's ``kendalltau`` computes) → group_cols +
    (n, concordant, discordant, tau_b):

        τ-b = (C − D) / √((N₀ − T_a)(N₀ − T_b))

    with N₀ = n(n−1)/2 and T the within-column tie-pair counts — the
    concordance companion to ``spearman_rho`` (τ weights every pair
    equally; ρ weights by rank distance), standard for ordinal metadata
    (ratings, quality buckets, severity levels).

    Plan: the corpus collapses to the (a, b) CONTINGENCY CELL table per
    group, and C/D come from one cell×cell join restricted to a₁ < a₂ —
    pair counts multiply out of cell weights, so cost is cells², never
    rows². ``max_cells`` fail-fasts on high-cardinality inputs (τ over
    continuous doubles wants pre-binning — ordinal data is the contract;
    the guard is the roc_auc policy). Tie terms come from the two
    marginals. Null/NaN rows are excluded.
    """
    groups = list(group_cols or [])
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    base = df.filter(
        a.isNotNull() & ~F.isnan(a) & b.isNotNull() & ~F.isnan(b)
    ).select(*groups, a.alias("__a"), b.alias("__b"))
    # one corpus scan total (optimization r12): the contingency-cell table
    # is materialized once and EVERYTHING below — the guard, both sides of
    # the concordance join, n, and both tie marginals — derives from it.
    # Previously the guard, n_tab, ta and tb each re-scanned `base` (the
    # raw corpus) and c1/c2 re-evaluated `cells`: ~6 corpus passes. The
    # checkpoint is cell-bounded (≤ max_cells per group when the guard
    # passes) — the table the concordance join needs materialized anyway.
    # All derived quantities are exact-integer identical: n = Σc, tie
    # t-counts per value = Σc over the value's cells.
    cells = base.groupBy(*groups, "__a", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint(eager=False)
    if max_cells is not None:
        worst = (
            cells.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_cells:
            raise ValueError(
                f"kendall_tau_b: a group has {worst} distinct (a, b) cells "
                f"(> max_cells={max_cells}); the cell×cell concordance join "
                "would square it. Pre-bin the inputs (τ is an ordinal "
                "statistic), or raise/disable the guard."
            )
    c1 = cells.select(
        *groups,
        F.col("__a").alias("__a1"),
        F.col("__b").alias("__b1"),
        F.col("__c").alias("__c1"),
    )
    c2 = cells.select(
        *groups,
        F.col("__a").alias("__a2"),
        F.col("__b").alias("__b2"),
        F.col("__c").alias("__c2"),
    )
    if groups:
        pj = c1.join(c2, groups)
    else:
        pj = c1.withColumn("__k", F.lit(1)).join(
            c2.withColumn("__k", F.lit(1)), "__k"
        )
    pj = pj.filter(F.col("__a1") < F.col("__a2"))
    cd = pj.groupBy(*groups).agg(
        F.sum(
            F.when(F.col("__b1") < F.col("__b2"), F.col("__c1") * F.col("__c2")).otherwise(F.lit(0))
        ).cast("long").alias("concordant"),
        F.sum(
            F.when(F.col("__b1") > F.col("__b2"), F.col("__c1") * F.col("__c2")).otherwise(F.lit(0))
        ).cast("long").alias("discordant"),
    )
    n_tab = cells.groupBy(*groups).agg(F.sum("__c").cast("long").alias("n"))
    ta = (
        cells.groupBy(*groups, "__a")
        .agg(F.sum("__c").alias("__t"))
        .groupBy(*groups)
        .agg(F.sum(F.col("__t") * (F.col("__t") - 1) / 2).alias("__ta"))
    )
    tb = (
        cells.groupBy(*groups, "__b")
        .agg(F.sum("__c").alias("__t"))
        .groupBy(*groups)
        .agg(F.sum(F.col("__t") * (F.col("__t") - 1) / 2).alias("__tb"))
    )
    if groups:
        # LEFT join: a group where col_a is constant yields no a1<a2 pair
        # rows, so cd has no row for it — an inner join would silently
        # drop the group (r11 ADVICE). Coalesce C/D to 0; the denom>0
        # guard then emits the group with tau_b NULL, consistent with
        # spearman_rho/anova_f on degenerate groups.
        j = (
            n_tab.join(cd, groups, "left")
            .withColumn("concordant", F.coalesce("concordant", F.lit(0).cast("long")))
            .withColumn("discordant", F.coalesce("discordant", F.lit(0).cast("long")))
            .join(ta, groups)
            .join(tb, groups)
        )
    else:
        j = n_tab
        for other in (cd, ta, tb):
            j = j.withColumn("__k", F.lit(1)).join(
                F.broadcast(other.withColumn("__k", F.lit(1))), "__k"
            ).drop("__k")
    n0 = F.col("n") * (F.col("n") - 1) / 2.0
    denom = F.sqrt((n0 - F.col("__ta")) * (n0 - F.col("__tb")))
    return j.select(
        *groups,
        "n",
        "concordant",
        "discordant",
        F.when(
            denom > 0,
            F.round((F.col("concordant") - F.col("discordant")) / denom, round_to),
        ).alias("tau_b"),
    )


def anova_f(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA F over the groups of ``group_col`` → one row
    (k, n, ss_between, ss_within, f_stat, eta_sq): the parametric "do
    these k segments have the same mean?" omnibus test (the mean-based
    complement to the rank tests here), plus η² = SSB/SST — how much of
    the metric's variance the segmentation explains.

        F = (SSB / (k−1)) / (SSW / (n−k))

    computed entirely from per-group exact sums (n_g, Σx, Σx²) via
    SSB = Σ n_g(x̄_g − x̄)², SSW = Σ(Σx²_g − n_g·x̄_g²) — one grouped
    aggregate + one k-row scalar aggregate, no second data pass. NULL F
    when k < 2, n ≤ k, or SSW = 0 (all within-group values identical).
    Null/NaN values and null groups are excluded.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), v.alias("__x"))
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__s2"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__n").cast("long").alias("n"),
        F.sum("__s").alias("__gs"),
        # SSW = Σ_g (Σx² − (Σx)²/n_g)
        F.sum(F.col("__s2") - F.col("__s") * F.col("__s") / F.col("__n")).alias("__ssw"),
        # Σ_g (Σx)²/n_g, for SSB = that − (ΣΣx)²/n
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias("__sb_raw"),
    )
    ssb = F.col("__sb_raw") - F.col("__gs") * F.col("__gs") / F.col("n")
    ssw = F.col("__ssw")
    f_ok = (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0)
    return agg.select(
        "k",
        "n",
        F.round(ssb, round_to).alias("ss_between"),
        F.round(ssw, round_to).alias("ss_within"),
        F.when(
            f_ok,
            F.round(
                (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))),
                round_to,
            ),
        ).alias("f_stat"),
        F.when(
            ssb + ssw > 0, F.round(ssb / (ssb + ssw), round_to)
        ).alias("eta_sq"),
    )


def g_test(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """G-test of independence between two categorical columns (the
    log-likelihood-ratio alternative to Pearson's χ²; Sokal & Rohlf) →
    one row (n, levels_a, levels_b, dof, g_stat):

        G = 2 Σ_observed o · ln(o·n / (r_a·c_b))

    — additive across partitions of the table (χ² is not), which is why
    corpus-linguistics keyness and hierarchical drill-downs prefer it.
    Empty cells contribute 0 (lim x→0 x·ln x = 0), so only observed cells
    ever materialize — same contingency + broadcast-marginal plan as
    ``cramers_v``. G ~ χ²((r−1)(c−1)) under independence.
    """
    a, b = F.col(col_a), F.col(col_b)
    base = df.select(
        a.cast("string").alias("__a"), b.cast("string").alias("__b")
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    cont = base.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__o"))
    ma = cont.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    mb = cont.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    j = cont.join(F.broadcast(ma), "__a").join(F.broadcast(mb), "__b")
    stats = j.agg(
        F.sum("__o").cast("long").alias("n"),
        F.count_distinct("__a").cast("long").alias("levels_a"),
        F.count_distinct("__b").cast("long").alias("levels_b"),
        F.sum(
            F.col("__o")
            * F.log(
                F.col("__o")
                / (F.col("__ra").cast("double") * F.col("__cb"))
            )
        ).alias("__partial"),  # Σ o·ln(o/(ra·cb)); the +ln(n) term needs n
    )
    g = 2.0 * (F.col("__partial") + F.col("n") * F.log(F.col("n")))
    return stats.select(
        "n",
        "levels_a",
        "levels_b",
        ((F.col("levels_a") - 1) * (F.col("levels_b") - 1)).alias("dof"),
        F.round(g, round_to).alias("g_stat"),
    )


def cohens_d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's d standardized effect size of every group AGAINST THE REST
    of the corpus (Cohen 1988, pooled-SD form) → one row per group:
    (group, n, mean_value, d) with

        d = (μ_g − μ_rest) / s_pooled,
        s_pooled² = ((n_g−1)s_g² + (n_r−1)s_r²) / (n_g + n_r − 2)

    — the "is this segment's shift big enough to CARE about?" companion to
    the significance tests (anova_f/mann_whitney say real, d says large).

    The rest-of-corpus moments come algebraically from (global − group)
    sums, so the plan is ONE grouped moments aggregate + a 1-row global
    aggregate broadcast back — the corpus is scanned once. Sample
    variances (n−1); NULL d when either side has < 2 rows or the pooled
    variance is 0. Null/NaN values and null groups are excluded.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), v.alias("__x"))
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__s2"),
    )
    glob = per.agg(
        F.sum("__n").alias("__gn"),
        F.sum("__s").alias("__gs"),
        F.sum("__s2").alias("__gs2"),
    ).withColumn("__k", F.lit(1))
    j = per.withColumn("__k", F.lit(1)).join(F.broadcast(glob), "__k")
    n1, s1, q1 = F.col("__n"), F.col("__s"), F.col("__s2")
    n2 = F.col("__gn") - n1
    s2 = F.col("__gs") - s1
    q2 = F.col("__gs2") - q1
    mu1, mu2 = s1 / n1, s2 / n2
    ss1 = q1 - s1 * s1 / n1  # Σ(x−μ)² per side
    ss2 = q2 - s2 * s2 / n2
    pooled = (ss1 + ss2) / (n1 + n2 - 2)
    ok = (n1 >= 2) & (n2 >= 2) & (pooled > 0)
    return j.select(
        F.col("__g").alias(group_col),
        n1.cast("long").alias("n"),
        F.round(mu1, round_to).alias("mean_value"),
        # + 0.0 normalizes IEEE signed zero: a tiny negative difference
        # rounds to -0.0 in one engine and 0.0 in the other
        F.when(
            ok, F.round((mu1 - mu2) / F.sqrt(pooled), round_to) + 0.0
        ).alias("d"),
    )


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ref_group,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """1-D Wasserstein (earth-mover's) distance of every non-reference
    group against the reference group → (group, n_ref, n_grp, w1):

        W₁ = ∫ |F_ref(x) − F_g(x)| dx
           = Σ over merged distinct values of |F_ref(xᵢ) − F_g(xᵢ)|·(xᵢ₊₁−xᵢ)

    (scipy's ``wasserstein_distance``) — the drift metric that reports
    "HOW FAR did the distribution move, in the metric's own units", where
    ``ks_statistic`` reports only the worst CDF gap and ``psi``/``js_*``
    need binning. The right alarm for "mean token-length crept up 40
    tokens" class shifts that KS under-weights.

    Plan: the exact ks_statistic plan (per-(group, value) counts, constant
    key broadcast of the aggregated reference, ONE group-partitioned
    ordered window for both cumulative sums) + a lead(x) for the step
    width and a weighted-sum agg instead of max. The window input is the
    merged DISTINCT-value table, so ``max_distinct`` fail-fasts raw
    continuous inputs (the spearman_rho contract: pre-round/bin them or
    lift the guard for genuinely discrete data). Null/NaN values excluded.
    """
    v = F.col(value_col).cast("double")
    vals = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("grp"), v.alias("x")
    )
    ref_counts = (
        vals.filter(F.col("grp") == ref_group)
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    grp_counts = (
        vals.filter(F.col("grp") != ref_group)
        .groupBy("grp", "x")
        .agg(F.count(F.lit(1)).alias("cg"))
    )
    if max_distinct is not None:
        # eager guard (the spearman_rho policy: fail at build, not
        # mid-pipeline). Materialize both distinct-value count tables
        # first (optimization r12): the guard jobs AND the main plan's
        # consumers (grp_counts feeds the group list and the merge;
        # ref_counts feeds the constant-key replication) otherwise each
        # re-scan the corpus — ~5 passes. Distinct-value-bounded when the
        # guard passes.
        grp_counts = grp_counts.localCheckpoint(eager=False)
        ref_counts = ref_counts.localCheckpoint(eager=False)
        worst = (
            grp_counts.groupBy("grp")
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        ref_n = ref_counts.count()
        worst = max(worst or 0, ref_n)
        if worst > max_distinct:
            raise ValueError(
                f"wasserstein_1d: a group has {worst} distinct values "
                f"(> max_distinct={max_distinct}); the merged-CDF window "
                "would funnel them through one task. Pre-round/bin the "
                "values, or raise/disable the guard for discrete data."
            )
    groups = grp_counts.select("grp").distinct()
    ref_rep = _const_key_broadcast(ref_counts, groups).select(
        "grp", "x", "cr", F.lit(0).alias("cg")
    )
    merged = (
        grp_counts.select("grp", "x", F.lit(0).alias("cr"), "cg")
        .unionByName(ref_rep)
        .groupBy("grp", "x")
        .agg(F.sum("cr").alias("cr"), F.sum("cg").alias("cg"))
    )
    w = Window.partitionBy("grp").orderBy("x")
    wtot = Window.partitionBy("grp")
    cum = merged.select(
        "grp",
        "x",
        F.sum("cr").over(w).alias("ccr"),
        F.sum("cg").over(w).alias("ccg"),
        F.lead("x").over(w).alias("x_next"),
        F.sum("cr").over(wtot).alias("n_ref"),
        F.sum("cg").over(wtot).alias("n_grp"),
    )
    return (
        cum.filter((F.col("n_ref") > 0) & (F.col("n_grp") > 0))
        .groupBy("grp")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_grp").alias("n_grp"),
            F.round(
                F.sum(
                    F.when(
                        F.col("x_next").isNotNull(),
                        F.abs(
                            F.col("ccr").cast("double") / F.col("n_ref")
                            - F.col("ccg").cast("double") / F.col("n_grp")
                        )
                        * (F.col("x_next") - F.col("x")),
                    ).otherwise(0.0)
                ),
                round_to,
            ).alias("w1"),
        )
        .withColumnRenamed("grp", "group")
    )


def grubbs_stat(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Grubbs outlier statistic per group (Grubbs 1950) → group_cols +
    (n, mean, sd, g_stat, extreme_value): G = max_i |x_i − x̄| / s over the
    sample-form (n−1) standard deviation, plus the value attaining it —
    "how extreme is the single most extreme observation, in sigmas?".
    Emitted as the raw statistic (comparing against the t-based critical
    value is the caller's policy layer); the single-worst-point companion
    to ``mad_outliers``'s bulk screen. NULL when n < 3 (Grubbs is
    undefined) or s = 0. Null/NaN values are excluded.

    Plan: ONE grouped aggregate carries n/Σx/Σx²/min/max; G is then
    max(|min − x̄|, |max − x̄|)/s algebraically — no second pass, no window
    (the most extreme point is always the min or the max).
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *groups, v.alias("__x")
    )
    agg = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__q"),
        F.min("__x").alias("__lo"),
        F.max("__x").alias("__hi"),
    )
    n = F.col("n").cast("double")
    mean = F.col("__s") / n
    var = (F.col("__q") - n * mean * mean) / (n - 1.0)
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    dev_lo = F.abs(F.col("__lo") - mean)
    dev_hi = F.abs(F.col("__hi") - mean)
    g = F.greatest(dev_lo, dev_hi) / sd
    extreme = F.when(dev_hi >= dev_lo, F.col("__hi")).otherwise(F.col("__lo"))
    ok = (F.col("n") >= 3) & (sd > 0)
    return agg.select(
        *groups,
        "n",
        F.round(mean, round_to).alias("mean"),
        F.when(F.col("n") >= 2, F.round(sd, round_to)).alias("sd"),
        F.when(ok, F.round(g, round_to)).alias("g_stat"),
        F.when(ok, extreme).alias("extreme_value"),
    )


def hellinger_tv(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ref_group,
    round_to: int = 6,
) -> DataFrame:
    """Hellinger distance and total-variation distance of every
    non-reference group's CATEGORICAL distribution against the reference →
    (group, n_ref, n_grp, hellinger, tv):

        H = sqrt(1 − Σ_c sqrt(p_c·q_c)),   TV = ½ Σ_c |p_c − q_c|

    — the two bounded-[0, 1] categorical drift metrics that need no
    binning and no epsilon smoothing (unlike ``psi``, whose log blows up
    on empty bins; unlike ``js_divergence``, H is a true metric and TV has
    the coupling interpretation "the minimum fraction of mass that
    moved"). Right screen for language / source / label mix shift.
    Categories absent from one side contribute sqrt(0) and |p| exactly —
    handled by the full outer union of the two count tables. Null
    categories are excluded.

    Plan: the ks_statistic replication pattern — per-(group, category)
    counts, aggregated reference broadcast to each comparison group, one
    group aggregate. No window at all (no ordering needed).
    """
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("c")
    )
    ref_counts = (
        vals.filter(F.col("grp") == ref_group)
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    grp_counts = (
        vals.filter(F.col("grp") != ref_group)
        .groupBy("grp", "c")
        .agg(F.count(F.lit(1)).alias("cg"))
    )
    groups = grp_counts.select("grp").distinct()
    ref_rep = _const_key_broadcast(ref_counts, groups).select(
        "grp", "c", "cr", F.lit(0).alias("cg")
    )
    merged = (
        grp_counts.select("grp", "c", F.lit(0).alias("cr"), "cg")
        .unionByName(ref_rep)
        .groupBy("grp", "c")
        .agg(F.sum("cr").alias("cr"), F.sum("cg").alias("cg"))
    )
    wtot = Window.partitionBy("grp")
    shares = merged.select(
        "grp",
        (F.col("cr").cast("double") / F.sum("cr").over(wtot)).alias("p"),
        (F.col("cg").cast("double") / F.sum("cg").over(wtot)).alias("q"),
        F.sum("cr").over(wtot).alias("n_ref"),
        F.sum("cg").over(wtot).alias("n_grp"),
    )
    return (
        shares.filter((F.col("n_ref") > 0) & (F.col("n_grp") > 0))
        .groupBy("grp")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_grp").alias("n_grp"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.lit(0.0),
                        1.0 - F.sum(F.sqrt(F.col("p") * F.col("q"))),
                    )
                ),
                round_to,
            ).alias("hellinger"),
            F.round(F.sum(F.abs(F.col("p") - F.col("q"))) / 2.0, round_to).alias(
                "tv"
            ),
        )
        .withColumnRenamed("grp", "group")
    )


def cohens_h(
    df: DataFrame,
    flag_col: str,
    group_col: str,
    ref_group,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's h proportion effect size of every non-reference group
    against the reference → (group, n_ref, n_grp, p_ref, p_grp, h):

        h = 2·arcsin(√p_grp) − 2·arcsin(√p_ref)

    (Cohen 1988's arcsine-stabilized difference of proportions) — the
    "HOW BIG is the rate shift?" companion to a proportions z-test, with
    the same |h| ≈ 0.2/0.5/0.8 small/medium/large conventions as
    ``cohens_d``. The right report when an error/spam/dup RATE moved:
    0.01 → 0.02 and 0.50 → 0.51 are the same absolute delta but h = 0.09
    vs 0.02. ``flag_col`` is a boolean/0-1 column; null flags are
    excluded. NULL h when either side is empty.

    Plan: one conditional grouped aggregate + the one-row reference
    aggregate broadcast back — two scans of the filter column, no window.
    """
    flag = F.col(flag_col).cast("double")
    vals = df.filter(flag.isNotNull() & ~F.isnan(flag)).select(
        F.col(group_col).alias("grp"), flag.alias("f")
    )
    ref = vals.filter(F.col("grp") == ref_group).agg(
        F.count(F.lit(1)).cast("long").alias("n_ref"),
        F.avg("f").alias("p_ref"),
    )
    grp = (
        vals.filter(F.col("grp") != ref_group)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grp"),
            F.avg("f").alias("p_grp"),
        )
    )
    j = _const_key_broadcast(ref, grp)
    h = 2.0 * F.asin(F.sqrt(F.col("p_grp"))) - 2.0 * F.asin(
        F.sqrt(F.col("p_ref"))
    )
    return j.select(
        F.col("grp").alias("group"),
        "n_ref",
        "n_grp",
        F.round("p_ref", round_to).alias("p_ref"),
        F.round("p_grp", round_to).alias("p_grp"),
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_grp") > 0), F.round(h, round_to)
        ).alias("h"),
    )


def simpson_check(
    df: DataFrame,
    outcome_col: str,
    side_col: str,
    side_a,
    side_b,
    stratum_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Simpson's-paradox screen for a binary outcome rate compared between
    two sides across strata → one row (n, n_strata, pooled_diff,
    strata_diff, n_flipped, reversed): pooled_diff = rate_A − rate_B over
    everything; strata_diff = the size-weighted average of the
    per-stratum rate differences (strata missing either side are
    excluded from it, counted in n only); n_flipped = strata whose
    difference opposes the pooled sign; ``reversed`` = the pooled and
    stratified conclusions DISAGREE in sign — the aggregation artifact
    every A/B readout and "crawl B is cleaner" comparison must be
    screened for before shipping the headline number (the stratified
    estimate is a crude direct-standardization adjustment; a flag here
    means the mix, not the treatment, drives the pooled difference).
    Null outcomes/strata and other sides are excluded.

    Plan: one (stratum) conditional aggregate + one scalar rollup over
    the strata table — two keyed shuffles, stratum-bounded state, no
    window.
    """
    y = F.col(outcome_col).cast("double")
    base = df.filter(
        y.isNotNull()
        & ~F.isnan(y)
        & F.col(side_col).isin([side_a, side_b])
        & F.col(stratum_col).isNotNull()
    ).select(
        F.col(stratum_col).alias("__st"),
        (F.col(side_col) == F.lit(side_a)).alias("__is_a"),
        y.alias("__y"),
    )
    per = base.groupBy("__st").agg(
        F.sum(F.when(F.col("__is_a"), 1).otherwise(0)).alias("__na"),
        F.sum(F.when(F.col("__is_a"), F.col("__y")).otherwise(0.0)).alias("__sa"),
        F.sum(F.when(~F.col("__is_a"), 1).otherwise(0)).alias("__nb"),
        F.sum(F.when(~F.col("__is_a"), F.col("__y")).otherwise(0.0)).alias("__sb"),
    )
    both = (F.col("__na") > 0) & (F.col("__nb") > 0)
    # try_divide, not a CASE guard: whole-stage codegen can evaluate a
    # branch's subexpressions before the branch test, and under ANSI a
    # one-sided stratum's 0-denominator then throws even inside when()
    diff = F.try_divide("__sa", "__na") - F.try_divide("__sb", "__nb")
    wt = F.col("__na") + F.col("__nb")
    agg = per.agg(
        F.sum(F.col("__na") + F.col("__nb")).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("__na").alias("__NA"),
        F.sum("__sa").alias("__SA"),
        F.sum("__nb").alias("__NB"),
        F.sum("__sb").alias("__SB"),
        F.sum(F.when(both, diff * wt)).alias("__wd"),
        F.sum(F.when(both, wt)).alias("__w"),
        F.sum(F.when(both, F.lit(1)).otherwise(F.lit(0))).cast("long").alias("__nboth"),
        # sign counts against the pooled direction are resolved below;
        # carry the per-stratum signed diffs as conditional counts
        F.sum(F.when(both & (diff > 0), 1).otherwise(0)).cast("long").alias("__npos"),
        F.sum(F.when(both & (diff < 0), 1).otherwise(0)).cast("long").alias("__nneg"),
    )
    pooled = F.try_divide("__SA", "__NA") - F.try_divide("__SB", "__NB")
    strat = F.try_divide("__wd", "__w")
    n_flipped = F.when(pooled > 0, F.col("__nneg")).when(
        pooled < 0, F.col("__npos")
    ).otherwise(F.lit(0))
    return agg.select(
        "n",
        "n_strata",
        F.round(pooled, round_to).alias("pooled_diff"),
        F.round(strat, round_to).alias("strata_diff"),
        n_flipped.cast("long").alias("n_flipped"),
        (pooled * strat < 0).alias("reversed"),
    )


def holm_bonferroni(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Holm-Bonferroni step-down correction over a TABLE OF TESTS (Holm
    1979) → the input columns + (holm_rank, p_adj, rejected): with m
    tests ranked by ascending p (ties stabilized by the remaining
    columns), p_adj(i) = max_{j ≤ i} min(1, (m − j + 1)·p_(j)) and the
    step-down rule rejects ranks 1..k−1 where k is the FIRST rank with
    p_(k) > α/(m − k + 1) — every rejection requires all smaller-p tests
    to have been rejected too.

    Controls the family-wise error rate (any false positive at all),
    strictly stronger than [bh_fdr]'s false-discovery-rate control —
    use it when one false alarm is expensive (pausing an ingest
    pipeline), BH when discoveries are cheap to triage.

    Plan note: same contract as bh_fdr — the input is a config-sized
    test-results table, never the corpus, so the two ordered windows are
    bounded; null/NaN p rows are excluded.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    p = F.col(p_col).cast("double")
    base = df.filter(p.isNotNull() & ~F.isnan(p))
    others = [c for c in base.columns if c != p_col]
    order = [F.col(p_col).asc()] + [F.col(c).asc() for c in others]
    w_rank = Window.orderBy(*order)  # bounded: tests table, config-sized
    ranked = base.select(
        "*",
        F.row_number().over(w_rank).alias("holm_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__m"),
    )
    w_fwd = Window.orderBy("holm_rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = ranked.select(
        "*",
        F.max(
            F.least(
                F.lit(1.0), (F.col("__m") - F.col("holm_rank") + 1) * p
            )
        ).over(w_fwd).alias("__adj"),
        # step-down: rejected iff EVERY rank j <= i passes its own
        # threshold — the running min of the pass indicator
        F.min(
            (p <= alpha / (F.col("__m") - F.col("holm_rank") + 1)).cast("int")
        ).over(w_fwd).alias("__rej"),
    )
    return adj.select(
        *[F.col(c) for c in base.columns],
        "holm_rank",
        F.round("__adj", round_to).alias("p_adj"),
        (F.col("__rej") == 1).alias("rejected"),
    ).orderBy("holm_rank")


def cvm_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Cramér-von Mises statistic (Anderson 1962, in the
    tie-weighted ECDF functional form) → one row (n_a, n_b, cvm_t,
    t_mean):

        T = n_a·n_b/N² · Σ_z w_z (F_a(z) − F_b(z))²

    summed over the pooled DISTINCT values z with multiplicity weight
    w_z (= pooled count at z; on tie-free data this is exactly
    Anderson's rank form). ``t_mean`` = (1 + 1/N)/6, the null
    expectation — T ≫ t_mean is evidence of distribution change.

    The integrated-distance cousin of [ks_statistic]: KS reads the single
    worst ECDF gap (sensitive to one sharp local shift), CvM integrates
    every gap (sensitive to broad, small shifts KS misses) — monitors
    typically watch both.

    Plan: the mann_whitney_u shape — one distinct-value aggregate with
    per-group counts, one ordered cumulative window over the bounded
    distinct-value axis, one scalar aggregate. NULL statistic when either
    group is empty.
    """
    vals = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("double").alias("x")
    ).filter(
        F.col("grp").isin([group_a, group_b])
        & F.col("x").isNotNull()
        & ~F.isnan("x")
    )
    per_val = vals.groupBy("x").agg(
        F.sum(F.when(F.col("grp") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == group_b, 1).otherwise(0)).alias("cb"),
    )
    # bounded: the window runs over DISTINCT VALUES, never corpus rows
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy()
    cum = per_val.select(
        "ca",
        "cb",
        F.sum("ca").over(w).alias("__fa"),
        F.sum("cb").over(w).alias("__fb"),
        F.sum("ca").over(w_tot).alias("__na"),
        F.sum("cb").over(w_tot).alias("__nb"),
    )
    na, nb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    # try_divide: an empty group yields NULL gaps (and a NULL statistic
    # via the `ok` gate below) instead of an ANSI divide-by-zero
    gap = F.try_divide(F.col("__fa"), na) - F.try_divide(F.col("__fb"), nb)
    agg = cum.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.sum((F.col("ca") + F.col("cb")) * gap * gap).alias("__s"),
    )
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    t = F.col("n_a") * F.col("n_b") / (nn * nn) * F.col("__s")
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.when(ok, F.round(t, round_to)).alias("cvm_t"),
        F.when(ok, F.round((1.0 + 1.0 / nn) / 6.0, round_to)).alias("t_mean"),
    )


def odds_ratio(
    df: DataFrame,
    exposure_col: str,
    outcome_col: str,
    group_cols: list[str] | None = None,
    z: float = 1.959964,
    round_to: int = 6,
) -> DataFrame:
    """Odds ratio of a binary outcome by binary exposure per group, with
    the Woolf log-normal confidence interval → (group_cols..., a, b, c,
    d, or_est, ci_low, ci_high):

        OR = (a·d)/(b·c)          (a = exposed∧outcome, b = exposed∧¬,
                                   c = ¬exposed∧outcome, d = neither)
        CI = exp(ln OR ± z·√(1/a + 1/b + 1/c + 1/d))

    with the Haldane-Anscombe +0.5 applied to ALL FOUR cells when any
    cell is 0 (the standard continuity correction — documented so the
    corrected estimate isn't mistaken for the raw one). The epidemiology
    view of a 2×2 that [cohens_h] reads as a proportion difference and
    [rate_effect] as a risk difference: OR is the one that transfers to
    case-control sampling and logistic-regression coefficients
    (ln OR = the logit slope).

    Plan: one grouped aggregate of four conditional counts + algebra.
    Rows with NULL exposure/outcome are excluded; values are coerced by
    ``!= 0`` so 0/1, boolean, and count-like inputs all work.
    """
    groups = list(group_cols or [])
    e = (F.col(exposure_col).cast("double") != 0).cast("int")
    o = (F.col(outcome_col).cast("double") != 0).cast("int")
    base = df.filter(
        F.col(exposure_col).isNotNull() & F.col(outcome_col).isNotNull()
    ).select(*groups, e.alias("__e"), o.alias("__o"))
    agg = base.groupBy(*groups).agg(
        F.sum((F.col("__e") * F.col("__o"))).alias("__a"),
        F.sum((F.col("__e") * (1 - F.col("__o")))).alias("__b"),
        F.sum(((1 - F.col("__e")) * F.col("__o"))).alias("__c"),
        F.sum(((1 - F.col("__e")) * (1 - F.col("__o")))).alias("__d"),
    )
    any_zero = (
        (F.col("__a") == 0) | (F.col("__b") == 0)
        | (F.col("__c") == 0) | (F.col("__d") == 0)
    )
    corr = F.when(any_zero, F.lit(0.5)).otherwise(F.lit(0.0))
    a = F.col("__a") + corr
    b = F.col("__b") + corr
    c = F.col("__c") + corr
    d = F.col("__d") + corr
    lnor = F.log(a * d / (b * c))
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    out = agg.select(
        *groups,
        F.col("__a").cast("long").alias("a"),
        F.col("__b").cast("long").alias("b"),
        F.col("__c").cast("long").alias("c"),
        F.col("__d").cast("long").alias("d"),
        F.round(F.exp(lnor), round_to).alias("or_est"),
        F.round(F.exp(lnor - z * se), round_to).alias("ci_low"),
        F.round(F.exp(lnor + z * se), round_to).alias("ci_high"),
    )
    return out.orderBy(*groups) if groups else out


def by_fdr(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Benjamini-Yekutieli FDR correction over a TABLE OF TESTS
    (Benjamini & Yekutieli 2001) → the input columns + (by_rank, p_adj,
    rejected): [bh_fdr] with the harmonic penalty c(m) = Σ_{i≤m} 1/i —
    p_adj(i) = min_{j≥i}(c(m)·m·p_(j)/j) clamped to 1, step-up rejection
    at p_(k) ≤ k·α/(m·c(m)).

    BH assumes independent (or positively dependent) tests; BY holds
    the FDR under ARBITRARY dependence — the honest choice when the
    tests are the same metric sliced many overlapping ways (a drift
    monitor's segments share users), at a ~ln(m) power cost.

    Same bounded-tests-table contract and window shapes as bh_fdr;
    null/NaN p excluded.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    p = F.col(p_col).cast("double")
    base = df.filter(p.isNotNull() & ~F.isnan(p))
    others = [c for c in base.columns if c != p_col]
    order = [F.col(p_col).asc()] + [F.col(c).asc() for c in others]
    w_rank = Window.orderBy(*order)  # bounded: tests table
    ranked = base.select(
        "*",
        F.row_number().over(w_rank).alias("by_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__m"),
    )
    # c(m) = Σ 1/i over the rank axis itself — one more bounded window
    cm = F.sum(1.0 / F.col("by_rank")).over(
        Window.orderBy("by_rank").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ranked = ranked.withColumn("__cm", cm)
    w_rev = Window.orderBy(F.col("by_rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = ranked.select(
        "*",
        F.least(
            F.lit(1.0),
            F.min(F.col("__cm") * F.col("__m") * p / F.col("by_rank")).over(w_rev),
        ).alias("__adj"),
        F.max(
            (p <= F.col("by_rank") * alpha / (F.col("__m") * F.col("__cm"))).cast(
                "int"
            )
        ).over(w_rev).alias("__rej"),
    )
    return adj.select(
        *[F.col(c) for c in base.columns],
        "by_rank",
        F.round("__adj", round_to).alias("p_adj"),
        (F.col("__rej") == 1).alias("rejected"),
    ).orderBy("by_rank")


def risk_ratio(
    df: DataFrame,
    exposure_col: str,
    outcome_col: str,
    group_cols: list[str] | None = None,
    z: float = 1.959964,
    round_to: int = 6,
) -> DataFrame:
    """Relative risk of a binary outcome by binary exposure per group,
    with the Katz log-normal CI → (group_cols..., a, b, c, d, rr_est,
    ci_low, ci_high):

        RR = [a/(a+b)] / [c/(c+d)]
        CI = exp(ln RR ± z·√(1/a − 1/(a+b) + 1/c − 1/(c+d)))

    (+0.5 on all four cells when any of a/c is 0 — the same
    Haldane-style continuity convention as [odds_ratio]). RR is the
    number product/incident reviews actually want ("exposed users are
    2.1× as likely to churn") — the odds ratio only approximates it when
    the outcome is rare; for cohort-style data report RR directly.

    Plan: identical to odds_ratio — one 4-cell aggregate + algebra.
    """
    groups = list(group_cols or [])
    e = (F.col(exposure_col).cast("double") != 0).cast("int")
    o = (F.col(outcome_col).cast("double") != 0).cast("int")
    base = df.filter(
        F.col(exposure_col).isNotNull() & F.col(outcome_col).isNotNull()
    ).select(*groups, e.alias("__e"), o.alias("__o"))
    agg = base.groupBy(*groups).agg(
        F.sum(F.col("__e") * F.col("__o")).alias("__a"),
        F.sum(F.col("__e") * (1 - F.col("__o"))).alias("__b"),
        F.sum((1 - F.col("__e")) * F.col("__o")).alias("__c"),
        F.sum((1 - F.col("__e")) * (1 - F.col("__o"))).alias("__d"),
    )
    any_zero = (F.col("__a") == 0) | (F.col("__c") == 0)
    corr = F.when(any_zero, F.lit(0.5)).otherwise(F.lit(0.0))
    a = F.col("__a") + corr
    b = F.col("__b") + corr
    c = F.col("__c") + corr
    d = F.col("__d") + corr
    lnrr = F.log((a / (a + b)) / (c / (c + d)))
    se = F.sqrt(1.0 / a - 1.0 / (a + b) + 1.0 / c - 1.0 / (c + d))
    out = agg.select(
        *groups,
        F.col("__a").cast("long").alias("a"),
        F.col("__b").cast("long").alias("b"),
        F.col("__c").cast("long").alias("c"),
        F.col("__d").cast("long").alias("d"),
        F.round(F.exp(lnrr), round_to).alias("rr_est"),
        F.round(F.exp(lnrr - z * se), round_to).alias("ci_low"),
        F.round(F.exp(lnrr + z * se), round_to).alias("ci_high"),
    )
    return out.orderBy(*groups) if groups else out
