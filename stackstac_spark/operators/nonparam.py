"""Nonparametric omnibus tests and ordinal effect sizes — the rank-based
companions to drift.py's two-sample screens, for the questions a data-quality
review asks next: "do these k segments differ at all?" (Kruskal-Wallis),
"did any of the k pipeline variants rank differently across the SAME blocks?"
(Friedman), "did the paired before/after metric actually move?" (Wilcoxon
signed-rank), and "by how much, in rank terms?" (Cliff's delta, Somers' D).

Same scale contract as spearman_rho / kendall_tau_b (drift.py): ranks come
from per-(group, distinct value) counts + one ordered cumulative window over
the DISTINCT-value table (never a global sort of the corpus), guarded by a
``max_distinct`` fail-fast for raw continuous inputs; pair statistics ride
distinct-value cell joins (cells², never rows²) under ``max_cells``. Every
emitted statistic is rounded so a SQL engine replays it hash-identically.

No reference-counterpart note: gjoseph92/stackstac has no statistics layer
(its query surface is xarray delegation, SURVEY.md §2.6); this module is
part of the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kruskal_wallis",
    "friedman_test",
    "wilcoxon_signed_rank",
    "cliffs_delta",
    "somers_d",
    "welch_ttest",
    "levene_bf",
    "dunn_posthoc",
    "jonckheere_trend",
    "page_l_test",
    "bartlett_test",
]


def _avg_rank_table(
    base: DataFrame,
    groups: list[str],
    value_col: str,
    out: str,
    max_distinct: int | None = None,
    op: str | None = None,
    count_out: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Tie-AVERAGED ranks of ``value_col`` within each group: per-(group,
    distinct value) counts + one cumulative window over the distinct-value
    table (the spearman_rho / roc_auc rank pattern — the corpus itself is
    never sorted).

    When ``max_distinct`` is set, the distinct-value count table is
    localCheckpoint-ed and the fail-fast guard rides it (optimization r12:
    the guard previously ran ``_guard_distinct`` as a SEPARATE corpus
    scan; now guard and rank table share one evaluation — the
    _per_score_counts pattern). Same eager-at-construction contract and
    the same error, raised via :func:`_raise_distinct`.

    ``count_out`` additionally exposes the per-value tie-group size t as a
    column (optimization r12, second pass): callers that need the tie
    correction Σ(t³−t) fold it into their main aggregate via the row-level
    identity Σ_rows(t²−1) = Σ_values t(t²−1), instead of re-scanning the
    corpus for a separate tie aggregate.

    ``weight_col``: when ``base`` is already a pre-aggregated cell table
    (one row per distinct key combination carrying a row count), the rank
    table derives the per-value count t as Σ weight instead of a row
    count — so callers can rank over the SAME aggregate their main plan
    consumes and the corpus is scanned exactly once (the spearman cell
    algebra, generalized to the rank-test family)."""
    cnt = F.sum(weight_col) if weight_col else F.count(F.lit(1))
    per = base.groupBy(*groups, value_col).agg(cnt.alias("__c"))
    if max_distinct is not None:
        per = per.localCheckpoint(eager=False)
        worst = (
            per.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            _raise_distinct(op or "rank", worst, max_distinct)
    w = (
        Window.partitionBy(*groups)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
        if groups
        else Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
    )
    return per.select(
        *groups,
        value_col,
        (F.coalesce(F.sum("__c").over(w), F.lit(0)) + (F.col("__c") + 1) / 2.0).alias(
            out
        ),
        *([F.col("__c").alias(count_out)] if count_out else []),
    )


def _raise_distinct(op: str, worst: int, max_distinct: int) -> None:
    """The spearman_rho-policy fail-fast error, shared so the message stays
    byte-identical across the rank-based operators."""
    raise ValueError(
        f"{op}: a group has {worst} distinct values "
        f"(> max_distinct={max_distinct}); the per-group rank window "
        "would funnel them through one task. Pre-bin/round the inputs, "
        "or raise/disable max_distinct if they are genuinely discrete."
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    treatment_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Kruskal-Wallis H test per group (Kruskal & Wallis 1952; scipy's
    ``kruskal`` incl. its tie correction) → group_cols + (k, n, h_stat):
    "do these k segments draw from the same distribution?" — the rank-based
    (outlier-robust, no-normality) omnibus that pairs with ``anova_f``:

        H = [12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1)] / C,
        C = 1 − Σ(t³−t)/(N³−N)

    with R_j = rank sum of treatment j over the COMBINED tie-averaged
    ranking and t the tie-group sizes. H ~ χ²(k−1) under H0. NULL when
    k < 2 or every value is tied (C = 0). Null/NaN values and null
    treatments are excluded.

    Plan: one distinct-value rank window per group (``max_distinct``
    fail-fast, the spearman_rho contract) + join-back + two grouped
    aggregates — the corpus is never globally sorted.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(treatment_col).isNotNull()
    ).select(*groups, F.col(treatment_col).alias("__j"), v.alias("__x"))
    # ONE corpus scan total (optimization r12, second pass — the spearman
    # cell algebra): collapse to per-(group, treatment, value) cells first;
    # the rank table derives from the cells (t = Σ cell counts per value)
    # and every row-level sum becomes a cell-count-weighted sum. All terms
    # are exact dyadic rationals (tie-averaged ranks are half-integers,
    # counts are integers), so the results are bit-identical to the
    # row-level join-back this replaces. Lazy checkpoint: the max_distinct
    # guard inside _avg_rank_table is the materializing action; with the
    # guard disabled the join sides would race, so checkpoint eagerly.
    cells = base.groupBy(*groups, "__j", "__x").agg(
        F.count(F.lit(1)).alias("__cj")
    ).localCheckpoint(eager=max_distinct is None)
    ranked = cells.join(
        _avg_rank_table(
            cells, groups, "__x", "__rk", max_distinct, "kruskal_wallis",
            count_out="__t", weight_col="__cj",
        ),
        [*groups, "__x"],
    )
    # the tie correction rides the SAME aggregate as the rank sums:
    # Σ_rows(t²−1) = Σ_cells c·(t²−1) = Σ_values(t³−t) exactly (integer
    # arithmetic) — no separate corpus re-scan.
    per_treat = ranked.groupBy(*groups, "__j").agg(
        F.sum("__cj").alias("__nj"),
        F.sum(F.col("__cj") * F.col("__rk")).alias("__rj"),
        F.sum(F.col("__cj") * (F.col("__t") * F.col("__t") - 1)).alias("__tiej"),
    )
    j = per_treat.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__nj").cast("long").alias("n"),
        F.sum(F.col("__rj") * F.col("__rj") / F.col("__nj")).alias("__ssr"),
        F.sum("__tiej").alias("__tie"),
    )
    n = F.col("n").cast("double")
    h_raw = 12.0 / (n * (n + 1)) * F.col("__ssr") - 3.0 * (n + 1)
    c = 1.0 - F.col("__tie") / (n * n * n - n)
    return j.select(
        *groups,
        "k",
        "n",
        F.when((F.col("k") >= 2) & (c > 0), F.round(h_raw / c, round_to)).alias(
            "h_stat"
        ),
    )


def _cross_one(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join two single-row (ungrouped-aggregate) frames via a literal-key
    BroadcastHashJoin — never a CartesianProduct node (the mann_kendall
    pattern; both sides are one row by construction)."""
    return (
        a.withColumn("__k", F.lit(1))
        .join(F.broadcast(b.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Friedman rank test per group (Friedman 1937; scipy's
    ``friedmanchisquare`` incl. its tie correction) → group_cols +
    (k, n_blocks, chi2): "across the SAME n blocks (queries, days,
    documents), do the k treatments (model variants, pipeline configs)
    rank differently?" — the repeated-measures companion to
    ``kruskal_wallis`` and the ordinal generalization of ``cochran_q``:

        χ² = [12/(nk(k+1)) · Σ_j R_j² − 3n(k+1)] / C,
        C = 1 − Σ_blocks Σ(t³−t) / (n·k·(k²−1))

    with ranks tie-averaged WITHIN each block. χ² ~ χ²(k−1) under H0.
    Only COMPLETE blocks count (a block must observe every treatment of
    its group — incomplete blocks are excluded relationally, no eager
    job); duplicate (block, treatment) observations raise. NULL when
    k < 2 or all blocks are fully tied (C = 0). Null/NaN excluded.

    Plan: the rank window is PARTITIONED BY block (k rows per partition —
    never a scale concern); completeness is one distinct-count join.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull()
        & ~F.isnan(v)
        & F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
    ).select(
        *groups,
        F.col(block_col).alias("__b"),
        F.col(treatment_col).alias("__j"),
        v.alias("__x"),
    )
    dup = (
        base.groupBy(*groups, "__b", "__j")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            "friedman_test: duplicate (block, treatment) observation — "
            "aggregate to one value per cell first."
        )
    k_tab = base.groupBy(*groups).agg(
        F.count_distinct("__j").cast("long").alias("k")
    )
    per_block = base.groupBy(*groups, "__b").agg(
        F.count(F.lit(1)).alias("__kb")
    )
    complete = per_block.join(k_tab, groups) if groups else _cross_one(per_block, k_tab)
    complete = complete.filter(F.col("__kb") == F.col("k")).select(*groups, "__b")
    obs = base.join(complete, [*groups, "__b"])
    # within-block tie-averaged ranks: k rows per partition, bounded
    wb = Window.partitionBy(*groups, "__b").orderBy("__x")
    cells = obs.groupBy(*groups, "__b", "__x").agg(F.count(F.lit(1)).alias("__t"))
    rk_tab = cells.select(
        *groups,
        "__b",
        "__x",
        (
            F.coalesce(
                F.sum("__t").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            + (F.col("__t") + 1) / 2.0
        ).alias("__rk"),
    )
    ranked = obs.join(rk_tab, [*groups, "__b", "__x"])
    rj = ranked.groupBy(*groups, "__j").agg(F.sum("__rk").alias("__rj"))
    ssr = rj.groupBy(*groups).agg(
        F.sum(F.col("__rj") * F.col("__rj")).alias("__ssr")
    )
    nb = complete.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks")
    )
    ties = cells.groupBy(*groups).agg(
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias("__tie")
    )
    if groups:
        j = k_tab.join(nb, groups).join(ssr, groups).join(ties, groups)
    else:
        j = _cross_one(_cross_one(_cross_one(k_tab, nb), ssr), ties)
    k = F.col("k").cast("double")
    n = F.col("n_blocks").cast("double")
    chi_raw = 12.0 / (n * k * (k + 1)) * F.col("__ssr") - 3.0 * n * (k + 1)
    c = 1.0 - F.col("__tie") / (n * k * (k * k - 1.0))
    return j.select(
        *groups,
        "k",
        "n_blocks",
        F.when(
            (F.col("k") >= 2) & (F.col("n_blocks") >= 1) & (c > 0),
            F.round(chi_raw / c, round_to),
        ).alias("chi2"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Wilcoxon signed-rank test per group (Wilcoxon 1945; scipy's
    ``wilcoxon`` with the normal approximation, ``zero_method='wilcox'``,
    no continuity correction) → group_cols + (n, w_plus, w_minus, z):
    "did the PAIRED before/after metric move?" — the nonparametric paired
    t-test for A/B reruns, re-crawl deltas, model-v2-vs-v1 per-document
    scores. Zero differences are dropped (Wilcoxon's own rule); |d| is
    tie-average-ranked; W± are the signed rank sums and

        z = (W⁺ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48)

    NULL z when n = 0 or the variance is 0 (all |d| tied in one sign).
    Null/NaN in either column drops the pair.

    Plan: ranks from the distinct-|d| table (``max_distinct`` fail-fast,
    spearman contract) + join-back + one grouped aggregate.
    """
    groups = list(group_cols or [])
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    base = (
        df.filter(a.isNotNull() & ~F.isnan(a) & b.isNotNull() & ~F.isnan(b))
        .select(*groups, (a - b).alias("__d"))
        .filter(F.col("__d") != 0.0)
        .select(*groups, F.abs("__d").alias("__ad"), F.signum("__d").alias("__sg"))
    )
    # ONE corpus scan total (optimization r12, second pass — the spearman
    # cell algebra, same as kruskal_wallis): per-(group, sign, |d|) cells;
    # ranks derive from the cells (t = Σ cell counts per |d| across signs)
    # and the W± sums weight each cell's rank by its count. Exact dyadic
    # arithmetic → bit-identical to the row-level join-back.
    cells = base.groupBy(*groups, "__sg", "__ad").agg(
        F.count(F.lit(1)).alias("__cj")
    ).localCheckpoint(eager=max_distinct is None)
    ranked = cells.join(
        _avg_rank_table(
            cells, groups, "__ad", "__rk", max_distinct, "wilcoxon_signed_rank",
            count_out="__t", weight_col="__cj",
        ),
        [*groups, "__ad"],
    )
    # tie correction folded into the main aggregate via Σ_rows(t²−1) =
    # Σ_cells c·(t²−1) = Σ_values(t³−t) — exact integer arithmetic
    j = ranked.groupBy(*groups).agg(
        # coalesce: the ungrouped aggregate over an empty frame must keep
        # emitting n = 0 (the old F.count semantics), not NULL
        F.coalesce(F.sum("__cj"), F.lit(0)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("__sg") > 0, F.col("__cj") * F.col("__rk")).otherwise(0.0)
        ).alias("__wp"),
        F.sum(
            F.when(F.col("__sg") < 0, F.col("__cj") * F.col("__rk")).otherwise(0.0)
        ).alias("__wm"),
        F.sum(F.col("__cj") * (F.col("__t") * F.col("__t") - 1)).alias("__tie"),
    )
    n = F.col("n").cast("double")
    var = n * (n + 1) * (2 * n + 1) / 24.0 - F.col("__tie") / 48.0
    return j.select(
        *groups,
        "n",
        F.round("__wp", round_to).alias("w_plus"),
        F.round("__wm", round_to).alias("w_minus"),
        F.when(
            (F.col("n") > 0) & (var > 0),
            F.round((F.col("__wp") - n * (n + 1) / 4.0) / F.sqrt(var), round_to),
        ).alias("z"),
    )


def cliffs_delta(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Cliff's delta ordinal effect size per group (Cliff 1993) →
    group_cols + (n_a, n_b, delta): δ = P(a > b) − P(a < b) over all
    cross-pairs of the two samples — the assumption-free "HOW MUCH bigger
    is side A?" that belongs next to a Mann-Whitney p-value (and the
    rank-world sibling of ``cohens_d``), in [−1, 1], ties contributing 0.

    Computed WITHOUT pair enumeration via the rank identity
    δ = 2·U_a/(n_a·n_b) − 1 with U_a = R_a − n_a(n_a+1)/2 from tie-averaged
    ranks over the combined sample (tie-averaging makes ties split half
    each way — exactly Cliff's 0 contribution). NULL when either side is
    empty. Rows whose side is neither ``side_a`` nor ``side_b``, and
    null/NaN values, are excluded.

    Plan: one distinct-value rank window (``max_distinct`` fail-fast) +
    join-back + one grouped aggregate — O(distinct values), never n_a·n_b.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(side_col).isin([side_a, side_b])
    ).select(
        *groups,
        (F.col(side_col) == F.lit(side_a)).alias("__is_a"),
        v.alias("__x"),
    )
    # ONE corpus scan total (optimization r12, second pass — the spearman
    # cell algebra): per-(group, side, value) cells; ranks derive from the
    # cells and the side sums weight each cell's rank by its count. Exact
    # dyadic arithmetic → bit-identical to the row-level join-back.
    cells = base.groupBy(*groups, "__is_a", "__x").agg(
        F.count(F.lit(1)).alias("__cj")
    ).localCheckpoint(eager=max_distinct is None)
    ranked = cells.join(
        _avg_rank_table(
            cells, groups, "__x", "__rk", max_distinct, "cliffs_delta",
            weight_col="__cj",
        ),
        [*groups, "__x"],
    )
    agg = ranked.groupBy(*groups).agg(
        F.sum(F.when(F.col("__is_a"), F.col("__cj")).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("__is_a"), F.col("__cj")).otherwise(0)).cast("long").alias("n_b"),
        F.sum(
            F.when(F.col("__is_a"), F.col("__cj") * F.col("__rk")).otherwise(0.0)
        ).alias("__ra"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    u_a = F.col("__ra") - na * (na + 1) / 2.0
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(2.0 * u_a / (na * nb) - 1.0, round_to),
        ).alias("delta"),
    )


def somers_d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_cells: int | None = 100_000,
) -> DataFrame:
    """Somers' D_yx per group (Somers 1962) → group_cols + (n, concordant,
    discordant, d_yx): the ASYMMETRIC ordinal association of y on x,

        D_yx = (C − D) / (n(n−1)/2 − T_x)

    — Kendall's numerator over only the pairs NOT tied on x (the
    conditioning variable). The standard asymmetric ordinal-association
    measure and the directional complement to the symmetric
    ``kendall_tau_b``; with x = a binary LABEL and y = a score,
    D_yx IS the Gini coefficient 2·AUC−1 (pairs tied on the label drop,
    leaving exactly the n₀·n₁ cross-pairs AUC counts). NULL when every
    pair is tied on x.

    Plan: identical distinct-(x, y) cell join as kendall_tau_b
    (drift.py::kendall_tau_b — cells², never rows², ``max_cells``
    fail-fast eagerly at construction), different denominator (only T_x
    subtracted). Null/NaN rows are excluded.
    """
    groups = list(group_cols or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    ).select(*groups, x.alias("__x"), y.alias("__y"))
    # one corpus scan total (optimization r12, the kendall_tau_b fix): the
    # cell table is materialized once; the guard, both concordance-join
    # sides, n, and the x-tie marginal all derive from it (exact-integer
    # identical: n = Σc, tie t per x = Σc over x's cells).
    cells = base.groupBy(*groups, "__x", "__y").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint(eager=False)
    if max_cells is not None:
        worst = (
            cells.groupBy(*groups).count().agg(F.max("count").alias("m")).first()["m"]
        )
        if worst is not None and worst > max_cells:
            raise ValueError(
                f"somers_d: a group has {worst} distinct (x, y) cells "
                f"(> max_cells={max_cells}); the cell×cell concordance join "
                "would square it. Pre-bin the inputs (D is an ordinal "
                "statistic), or raise/disable the guard."
            )
    c1 = cells.select(
        *groups,
        F.col("__x").alias("__x1"),
        F.col("__y").alias("__y1"),
        F.col("__c").alias("__c1"),
    )
    c2 = cells.select(
        *groups,
        F.col("__x").alias("__x2"),
        F.col("__y").alias("__y2"),
        F.col("__c").alias("__c2"),
    )
    if groups:
        pj = c1.join(c2, groups)
    else:
        pj = c1.withColumn("__k", F.lit(1)).join(
            c2.withColumn("__k", F.lit(1)), "__k"
        )
    pj = pj.filter(F.col("__x1") < F.col("__x2"))
    cd = pj.groupBy(*groups).agg(
        F.sum(
            F.when(F.col("__y1") < F.col("__y2"), F.col("__c1") * F.col("__c2")).otherwise(F.lit(0))
        ).cast("long").alias("concordant"),
        F.sum(
            F.when(F.col("__y1") > F.col("__y2"), F.col("__c1") * F.col("__c2")).otherwise(F.lit(0))
        ).cast("long").alias("discordant"),
    )
    n_tab = cells.groupBy(*groups).agg(F.sum("__c").cast("long").alias("n"))
    tx = (
        cells.groupBy(*groups, "__x")
        .agg(F.sum("__c").alias("__t"))
        .groupBy(*groups)
        .agg(F.sum(F.col("__t") * (F.col("__t") - 1) / 2).alias("__tx"))
    )
    if groups:
        # LEFT join cd (a constant-x group yields no pair rows — the
        # kendall_tau_b degenerate-group contract)
        j = (
            n_tab.join(cd, groups, "left")
            .withColumn("concordant", F.coalesce("concordant", F.lit(0).cast("long")))
            .withColumn("discordant", F.coalesce("discordant", F.lit(0).cast("long")))
            .join(tx, groups)
        )
    else:
        j = _cross_one(_cross_one(n_tab, cd), tx)
        j = j.withColumn(
            "concordant", F.coalesce("concordant", F.lit(0).cast("long"))
        ).withColumn("discordant", F.coalesce("discordant", F.lit(0).cast("long")))
    n0 = F.col("n") * (F.col("n") - 1) / 2.0
    denom = n0 - F.col("__tx")
    return j.select(
        *groups,
        "n",
        "concordant",
        "discordant",
        F.when(
            denom > 0,
            F.round((F.col("concordant") - F.col("discordant")) / denom, round_to),
        ).alias("d_yx"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test per group (Welch 1947 —
    the default two-sample t; the pooled-variance Student form is only
    safe when variances match) → group_cols + (n_a, n_b, mean_a, mean_b,
    t_stat, dof):

        t = (x̄_a − x̄_b) / sqrt(s²_a/n_a + s²_b/n_b),
        ν = (s²_a/n_a + s²_b/n_b)² / [ (s²_a/n_a)²/(n_a−1) + (s²_b/n_b)²/(n_b−1) ]

    with SAMPLE (n−1) variances — the parametric mean-shift companion to
    ``mann_whitney_u``/``cliffs_delta``; report them together. NULL
    t/dof when either side has n < 2 or both variances are 0. Rows whose
    side is neither ``side_a`` nor ``side_b``, and null/NaN values, are
    excluded.

    Plan: ONE grouped conditional-moments aggregate — no window, no join,
    one corpus scan.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(side_col).isin([side_a, side_b])
    ).select(
        *groups,
        (F.col(side_col) == F.lit(side_a)).alias("__is_a"),
        v.alias("__x"),
    )
    a = F.col("__is_a")
    agg = base.groupBy(*groups).agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(a, F.col("__x")).otherwise(0.0)).alias("__sa"),
        F.sum(F.when(a, F.col("__x") * F.col("__x")).otherwise(0.0)).alias("__qa"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(~a, F.col("__x")).otherwise(0.0)).alias("__sb"),
        F.sum(F.when(~a, F.col("__x") * F.col("__x")).otherwise(0.0)).alias("__qb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.try_divide("__sa", na)
    mb = F.try_divide("__sb", nb)
    va = F.try_divide(F.col("__qa") - na * ma * ma, na - 1.0)
    vb = F.try_divide(F.col("__qb") - nb * mb * mb, nb - 1.0)
    va = F.greatest(va, F.lit(0.0))
    vb = F.greatest(vb, F.lit(0.0))
    se2 = F.try_divide(va, na) + F.try_divide(vb, nb)
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        F.try_divide(F.try_divide(va, na) * F.try_divide(va, na), na - 1.0)
        + F.try_divide(F.try_divide(vb, nb) * F.try_divide(vb, nb), nb - 1.0)
    )
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.round(ma, round_to).alias("mean_a"),
        F.round(mb, round_to).alias("mean_b"),
        F.when(ok, F.round(t, round_to)).alias("t_stat"),
        F.when(ok, F.round(dof, round_to)).alias("dof"),
    )


def levene_bf(
    df: DataFrame,
    value_col: str,
    treatment_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Brown-Forsythe test of variance homogeneity per group (Levene 1960
    with Brown & Forsythe 1974's MEDIAN centering — scipy's
    ``levene(center='median')``, the robust default) → group_cols +
    (k, n, w_stat): one-way ANOVA F computed on the absolute deviations
    z = |x − median_treatment|,

        W = (N−k)/(k−1) · Σ_j n_j(z̄_j − z̄)² / Σ_ij (z_ij − z̄_j)²

    — the "are these segments' SPREADS equal?" gate to run before
    trusting ``anova_f`` (which assumes them equal). W ~ F(k−1, N−k)
    under H0. NULL when k < 2 or all deviations are identical. Null/NaN
    values and null treatments excluded.

    Plan: exact interpolated per-treatment medians from distinct-value
    rank intervals (one in-treatment cumulative window over the distinct
    table, ``max_distinct`` fail-fast), medians joined back (aggregated,
    treatment-sized, broadcastable), then ONE moments aggregate on the
    deviations — the anova_f algebra.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(treatment_col).isNotNull()
    ).select(*groups, F.col(treatment_col).alias("__j"), v.alias("__x"))
    keys = [*groups, "__j"]
    per = base.groupBy(*keys, "__x").agg(F.count(F.lit(1)).alias("__c"))
    if max_distinct is not None:
        # share one corpus scan between guard and main plan (the
        # _per_score_counts pattern; optimization r12)
        per = per.localCheckpoint(eager=False)
        worst = (
            per.groupBy(*keys).count().agg(F.max("count").alias("m")).first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"levene_bf: a treatment has {worst} distinct values "
                f"(> max_distinct={max_distinct}); pre-round/bin the input "
                "or raise/disable the guard."
            )
    w = Window.partitionBy(*keys).orderBy("__x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy(*keys)
    ranked = per.select(
        *keys,
        "__x",
        "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wn).alias("__n"),
    )
    prev = F.col("__cum") - F.col("__c")
    contains = lambda r: (prev < r) & (F.col("__cum") >= r)  # noqa: E731
    lo_r = F.floor((F.col("__n") + 1) / 2)
    hi_r = F.floor(F.col("__n") / 2) + 1
    med = ranked.groupBy(*keys).agg(
        (
            (
                F.max(F.when(contains(lo_r), F.col("__x")))
                + F.max(F.when(contains(hi_r), F.col("__x")))
            )
            / 2.0
        ).alias("__med")
    )
    z = base.join(F.broadcast(med), keys).select(
        *groups, "__j", F.abs(F.col("__x") - F.col("__med")).alias("__z")
    )
    per_j = z.groupBy(*groups, "__j").agg(
        F.count(F.lit(1)).alias("__nj"),
        F.sum("__z").alias("__sj"),
        F.sum(F.col("__z") * F.col("__z")).alias("__qj"),
    )
    agg = per_j.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__nj").cast("long").alias("n"),
        F.sum("__sj").alias("__s"),
        F.sum("__qj").alias("__q"),
        F.sum(F.col("__sj") * F.col("__sj") / F.col("__nj")).alias("__sbar"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    ssb = F.col("__sbar") - F.col("__s") * F.col("__s") / n
    ssw = F.col("__q") - F.col("__sbar")
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0)
    return agg.select(
        *groups,
        "k",
        "n",
        F.when(
            ok, F.round((n - k) / (k - 1.0) * ssb / ssw, round_to)
        ).alias("w_stat"),
    )


def dunn_posthoc(
    df: DataFrame,
    value_col: str,
    treatment_col: str,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Dunn's post-hoc pairwise rank test after Kruskal-Wallis (Dunn
    1964, tie-corrected) → one row per unordered treatment pair (a < b by
    name): (treat_a, treat_b, n_a, n_b, mean_rank_a, mean_rank_b, z):

        z = (R̄_a − R̄_b) / sqrt( (N(N+1)/12 − Σ(t³−t)/(12(N−1))) · (1/n_a + 1/n_b) )

    over the COMBINED tie-averaged ranking — "WHICH segments differ?"
    once ``kruskal_wallis`` rejects. The z's are the caller's to correct
    (``drift.bh_fdr`` composes directly on a (pair, p) table; emitting
    raw z keeps the operator engine-replayable — Spark has no normal
    CDF built-in). NULL z when the variance term is 0 (all values tied).

    Plan: the kruskal rank machinery (distinct-value window +
    ``max_distinct`` fail-fast) + one per-treatment aggregate + a
    treatment×treatment self-join on the AGGREGATED k-row table — pairs
    of summaries, never pairs of rows.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(treatment_col).isNotNull()
    ).select(F.col(treatment_col).alias("__j"), v.alias("__x"))
    # ONE corpus scan total (optimization r12, second pass — the spearman
    # cell algebra): per-(treatment, value) cells; ranks derive from the
    # cells, and every per-treatment sum weights the cell's rank by its
    # count. R̄_j = Σ(c·rk)/Σc equals the row-level mean exactly (both
    # divide the same exact dyadic numerator by the same integer).
    cells = base.groupBy("__j", "__x").agg(
        F.count(F.lit(1)).alias("__cj")
    ).localCheckpoint(eager=max_distinct is None)
    ranked = cells.join(
        _avg_rank_table(
            cells, [], "__x", "__rk", max_distinct, "dunn_posthoc",
            count_out="__t", weight_col="__cj",
        ),
        ["__x"],
    )
    per_j = ranked.groupBy("__j").agg(
        F.sum("__cj").cast("long").alias("__nj"),
        (F.sum(F.col("__cj") * F.col("__rk")) / F.sum("__cj")).alias("__rbar"),
        F.sum(F.col("__cj") * (F.col("__t") * F.col("__t") - 1)).alias("__tiej"),
    ).localCheckpoint()  # k rows; feeds a, b AND the totals — one corpus
    # pass instead of three (the old code re-scanned the corpus for each
    # pair side and once more for the tie aggregate)
    ties = per_j.agg(
        F.sum("__tiej").alias("__tie"),
        F.sum("__nj").alias("__N"),
    )
    a = per_j.select(
        F.col("__j").alias("treat_a"),
        F.col("__nj").alias("n_a"),
        F.col("__rbar").alias("__ra"),
    )
    b = per_j.select(
        F.col("__j").alias("treat_b"),
        F.col("__nj").alias("n_b"),
        F.col("__rbar").alias("__rb"),
    )
    pairs = (
        a.withColumn("__k", F.lit(1))
        .join(F.broadcast(b.withColumn("__k", F.lit(1))), "__k")
        .filter(F.col("treat_a") < F.col("treat_b"))
        .join(F.broadcast(ties.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    N = F.col("__N").cast("double")
    var_term = (N * (N + 1) / 12.0 - F.col("__tie") / (12.0 * (N - 1))) * (
        1.0 / F.col("n_a") + 1.0 / F.col("n_b")
    )
    return pairs.select(
        "treat_a",
        "treat_b",
        "n_a",
        "n_b",
        F.round("__ra", round_to).alias("mean_rank_a"),
        F.round("__rb", round_to).alias("mean_rank_b"),
        F.when(
            var_term > 0,
            F.round((F.col("__ra") - F.col("__rb")) / F.sqrt(var_term), round_to),
        ).alias("z"),
    ).orderBy("treat_a", "treat_b")


def jonckheere_trend(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int = 6,
    max_cells: int | None = 10_000,
) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative (Jonckheere
    1954): do the group distributions shift monotonically as the group
    label increases? → one row (n, n_groups, j_stat, j_mean, z):

        J      = Σ_{g_i < g_j} U_ij,  U_ij = #{x∈g_i < y∈g_j} + ½·ties
        E[J]   = (N² − Σ n_k²) / 4
        Var[J] = (N²(2N+3) − Σ n_k²(2n_k+3)) / 72   (tie-free form —
                 conservative under ties)
        z      = (J − E[J]) / √Var[J]

    Sharper than [kruskal_wallis] when the hypothesis is directional
    (quality rises with each pipeline stage, latency grows with payload
    bucket) — KW spends power on every permutation of group means; JT
    spends it all on the monotone ordering.

    Plan: the kendall_tau_b cell algebra across groups — one
    (group, value) count aggregate, one ordered-group-pair cell join
    (cells², never rows²; ``max_cells`` fail-fast), group sizes from the
    same aggregate. Groups are ordered by their natural sort order.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__x"),
    ).filter(
        F.col("__g").isNotNull() & F.col("__x").isNotNull() & ~F.isnan("__x")
    )
    cells = base.groupBy("__g", "__x").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint()
    if max_cells is not None:
        n_cells = cells.count()
        if n_cells > max_cells:
            raise ValueError(
                f"jonckheere_trend: {n_cells} (group, value) cells "
                f"(> max_cells={max_cells}); bucket values first."
            )
    a = cells.select(
        F.col("__g").alias("__ga"), F.col("__x").alias("__xa"),
        F.col("__c").alias("__cca"),
    )
    b = cells.select(
        F.col("__g").alias("__gb"), F.col("__x").alias("__xb"),
        F.col("__c").alias("__ccb"),
    )
    # ordered group pairs x value comparison — cells x cells, bounded;
    # constant-key equi-join + filter (the kendall_tau_b pattern) keeps
    # this a BroadcastHashJoin, never a nested-loop/cartesian plan
    pairs = (
        a.withColumn("__k", F.lit(1))
        .join(b.withColumn("__k", F.lit(1)), "__k")
        .filter(F.col("__ga") < F.col("__gb"))
    )
    contrib = pairs.select(
        F.when(F.col("__xa") < F.col("__xb"), F.col("__cca") * F.col("__ccb"))
        .when(F.col("__xa") == F.col("__xb"),
              F.col("__cca") * F.col("__ccb") / 2.0)
        .otherwise(F.lit(0.0)).alias("__u")
    )
    j_stat = contrib.agg(F.sum("__u").alias("__j"))
    sizes = cells.groupBy("__g").agg(F.sum("__c").alias("__n"))
    moments = sizes.agg(
        F.sum("__n").alias("__nn"),
        F.count(F.lit(1)).alias("__k"),
        F.sum(F.col("__n") * F.col("__n")).alias("__s2"),
        F.sum(
            F.col("__n") * F.col("__n") * (2 * F.col("__n") + 3)
        ).alias("__s3"),
    )
    nn = F.col("__nn").cast("double")
    mean_j = (nn * nn - F.col("__s2")) / 4.0
    var_j = (nn * nn * (2 * nn + 3) - F.col("__s3")) / 72.0
    out = moments.crossJoin(F.broadcast(j_stat))
    return out.select(
        F.col("__nn").cast("long").alias("n"),
        F.col("__k").cast("long").alias("n_groups"),
        F.round("__j", round_to).alias("j_stat"),
        F.round(mean_j, round_to).alias("j_mean"),
        F.when(
            var_j > 0, F.round((F.col("__j") - mean_j) / F.sqrt(var_j), round_to)
        ).alias("z"),
    )


def page_l_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Page's L test for an ORDERED alternative in a randomized block
    design (Page 1963) → one row (n_blocks, n_treatments, l_stat,
    l_mean, z):

        L      = Σ_j j · R_j      (R_j = rank sum of treatment j across
                                   blocks; j = the treatment's position
                                   in natural sort order)
        E[L]   = b·k(k+1)²/4
        Var[L] = b·(k³ − k)² / (144(k − 1))   (tie-free form —
                 conservative under ties, which get average ranks)
        z      = (L − E[L]) / √Var[L]

    The repeated-measures cousin of [jonckheere_trend]: same directional
    hypothesis ("quality rises stage by stage"), but each block (user,
    document, day) contributes its own within-block ranking, so
    between-block level differences cancel — [friedman_test] without the
    direction, Page WITH it. Blocks missing any treatment are dropped
    (the complete-block requirement).

    Plan: one per-block rank window (partitioned by block — parallel,
    width = k treatments), a broadcast treatment→position map (distinct
    treatments, dimension-sized), two scalar aggregates. The corpus is
    expected pre-aggregated to one value per (block, treatment), the
    friedman_test contract. NOTE (eager): the treatment count and the
    complete-block count run small Spark jobs at construction time (the
    E[L]/Var[L] constants need them as Python scalars).
    """
    base = df.select(
        F.col(block_col).alias("__b"),
        F.col(treatment_col).cast("string").alias("__trt"),
        F.col(value_col).cast("double").alias("__x"),
    ).filter(
        F.col("__b").isNotNull()
        & F.col("__trt").isNotNull()
        & F.col("__x").isNotNull()
        & ~F.isnan("__x")
    )
    trts = base.select("__trt").distinct()
    k_row = trts.count()
    if k_row < 2:
        raise ValueError(f"page_l_test: need >= 2 treatments, got {k_row}")
    w_pos = Window.orderBy("__trt")  # bounded: distinct treatments
    pos = trts.select("__trt", F.row_number().over(w_pos).alias("__j"))
    # complete blocks only: every treatment present exactly once
    sizes = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.count_distinct("__trt").alias("__ntrt"),
    )
    complete = sizes.filter(
        (F.col("__cnt") == k_row) & (F.col("__ntrt") == k_row)
    ).select("__b")
    kept = base.join(complete, "__b")
    w_rank = Window.partitionBy("__b").orderBy("__x")
    # average ranks for ties: rank + (ties-1)/2 via cume machinery ==
    # (rank() + rank() + count(same) - 1) / 2; use the standard
    # avg-rank identity from two window functions over the k-row block
    ranked = kept.select(
        "__b",
        "__trt",
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(
                Window.partitionBy("__b", "__x")
            ) - 1) / 2.0
        ).alias("__r"),
    )
    rsums = ranked.join(F.broadcast(pos), "__trt").groupBy("__j").agg(
        F.sum("__r").alias("__rj")
    )
    b_cnt = complete.count()
    l_agg = rsums.agg(F.sum(F.col("__j") * F.col("__rj")).alias("__l"))
    kk = float(k_row)
    bb = float(b_cnt)
    mean_l = bb * kk * (kk + 1.0) ** 2 / 4.0
    var_l = bb * (kk**3 - kk) ** 2 / (144.0 * (kk - 1.0))
    z = (
        F.round((F.col("__l") - F.lit(mean_l)) / F.lit(var_l**0.5), round_to)
        if var_l > 0
        else F.lit(None).cast("double")
    )
    return l_agg.select(
        F.lit(b_cnt).cast("long").alias("n_blocks"),
        F.lit(k_row).cast("long").alias("n_treatments"),
        F.round("__l", round_to).alias("l_stat"),
        F.round(F.lit(mean_l), round_to).alias("l_mean"),
        z.alias("z"),
    )


def bartlett_test(
    df: DataFrame,
    value_col: str,
    treatment_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Bartlett's test of equal variances across k treatments per group
    (Bartlett 1937) → (group_cols..., k, n, chi2):

        s_p² = Σ(n_i−1)s_i² / (N−k)
        T    = [(N−k)·ln s_p² − Σ(n_i−1)·ln s_i²] / C
        C    = 1 + [Σ 1/(n_i−1) − 1/(N−k)] / (3(k−1))      T ~ χ²(k−1)

    The classical, maximum-power-under-normality companion to
    [levene_bf] (which trades power for robustness): run Bartlett when
    the metric is known near-normal (means of large per-unit samples),
    Levene/Brown-Forsythe when it is raw and heavy-tailed — a variance
    shift between arms with equal means is exactly what the t-test
    family silently ignores.

    NULL when k < 2, any treatment has n_i < 2, or any s_i² = 0 (the
    log is undefined — a constant arm needs investigating, not
    averaging over). Plan: one (group, treatment) moment aggregate +
    one grouped roll-up; nothing touches the corpus twice.
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(treatment_col).isNotNull()
    ).select(*groups, F.col(treatment_col).alias("__j"), v.alias("__x"))
    per = base.groupBy(*groups, "__j").agg(
        F.count(F.lit(1)).alias("__ni"), F.var_samp("__x").alias("__s2"),
    )
    agg = per.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__kk"),
        F.sum("__ni").alias("__n"),
        F.sum((F.col("__ni") - 1) * F.col("__s2")).alias("__num"),
        F.sum(
            F.when(
                (F.col("__ni") >= 2) & (F.col("__s2") > 0),
                (F.col("__ni") - 1) * F.log("__s2"),
            )
        ).alias("__sumlog"),
        # guard the ANSI division: a 1-member arm contributes no term
        # (the minn gate below nullifies the whole statistic anyway)
        F.sum(
            F.when(F.col("__ni") >= 2, 1.0 / (F.col("__ni") - 1))
        ).alias("__sinv"),
        F.min(F.col("__ni")).alias("__minn"),
        F.min(F.when(F.col("__s2") > 0, 1).otherwise(0)).alias("__allpos"),
    )
    kd = F.col("__kk").cast("double")
    nd = F.col("__n").cast("double")
    sp2 = F.col("__num") / (nd - kd)
    t_raw = (nd - kd) * F.log(sp2) - F.col("__sumlog")
    c = 1.0 + (F.col("__sinv") - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0))
    ok = (
        (F.col("__kk") >= 2)
        & (F.col("__minn") >= 2)
        & (F.col("__allpos") == 1)
    )
    out = agg.select(
        *groups,
        F.col("__kk").cast("long").alias("k"),
        F.col("__n").cast("long").alias("n"),
        F.when(ok, F.round(t_raw / c, round_to)).alias("chi2"),
    )
    return out.orderBy(*groups) if groups else out
