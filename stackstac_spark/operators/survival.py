"""Survival / retention estimation — the time-to-event layer of the
product-analytics family (funnel and cohort-retention gates are the
discrete cousins): how long until a user churns, a document is taken down,
a crawl URL dies.

Everything is distinct-event-time aggregates + one bounded cumulative
window per group — the corpus collapses to its event-time table before any
window runs, the same contract as the drift tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kaplan_meier", "nelson_aalen", "log_rank"]


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 100_000,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator per group (Kaplan &
    Meier 1958) → one row per distinct EVENT time t: (group_cols..., t,
    n_risk, n_events, n_censored, survival) with

        S(t) = Π_{t_j ≤ t} (1 − d_j / n_j)

    d_j = events at t_j, n_j = subjects still at risk entering t_j
    (censored subjects leave the risk set AFTER their censoring time — the
    standard right-censoring convention). The retention curve behind
    "how long do users/documents/URLs survive?", with censoring done
    honestly instead of dropping still-alive subjects.

    Plan: one (group, duration) aggregate splits the corpus into the
    distinct-time table (events + censorings per time), one in-group
    cumulative window derives the at-risk counts, and the running product
    rides exp(Σ ln(1 − d/n)) over the same window — with an exact-zero
    override once any prefix time has d = n (ln(0) never evaluates).
    ``max_distinct`` fail-fasts when a group's distinct-duration count
    would funnel one window task (bucket durations first — day/hour
    granularity is the analytics contract anyway). Null durations/events
    are excluded.
    """
    groups = list(group_cols or [])
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    base = df.filter(
        t.isNotNull() & ~F.isnan(t) & e.isNotNull()
    ).select(*groups, t.alias("__t"), e.alias("__e"))
    per_t = base.groupBy(*groups, "__t").agg(
        F.sum("__e").alias("__d"),
        F.sum(F.lit(1) - F.col("__e")).alias("__c"),
    )
    if max_distinct is not None:
        # share one corpus scan between guard and main plan (the
        # _per_score_counts pattern; optimization r12)
        per_t = per_t.localCheckpoint(eager=False)
        worst = (
            per_t.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"kaplan_meier: a group has {worst} distinct durations "
                f"(> max_distinct={max_distinct}); bucket durations to "
                "coarser granularity first, or raise/disable the guard."
            )
    w_prev = (
        Window.partitionBy(*groups)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, -1)
        if groups
        else Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*groups) if groups else Window.partitionBy()
    risked = per_t.select(
        *groups,
        "__t",
        "__d",
        "__c",
        (
            F.sum(F.col("__d") + F.col("__c")).over(w_tot)
            - F.coalesce(F.sum(F.col("__d") + F.col("__c")).over(w_prev), F.lit(0))
        ).alias("__n_risk"),
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    )
    # ln(1 - d/n) only where the factor is strictly positive; a d = n time
    # kills the whole suffix exactly (the __dead flag), so ln(0) is never
    # evaluated and survival is an exact 0.0 rather than exp(-inf)
    step = F.when(
        F.col("__d") < F.col("__n_risk"),
        F.log(1.0 - F.col("__d") / F.col("__n_risk")),
    ).otherwise(F.lit(0.0))
    dead = F.max((F.col("__d") >= F.col("__n_risk")).cast("int")).over(w_cum)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(step).over(w_cum))
    )
    return (
        risked.select(
            *groups,
            "__t",
            "__d",
            "__c",
            "__n_risk",
            surv.alias("__s"),
        )
        .filter(F.col("__d") > 0)  # KM steps only at event times
        .select(
            *groups,
            F.col("__t").alias("t"),
            F.col("__n_risk").cast("long").alias("n_risk"),
            F.col("__d").cast("long").alias("n_events"),
            F.col("__c").cast("long").alias("n_censored"),
            F.round("__s", round_to).alias("survival"),
        )
        .orderBy(*groups, "t")
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 100_000,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group (Nelson 1972,
    Aalen 1978) → one row per distinct EVENT time t: (group_cols..., t,
    n_risk, n_events, cum_hazard, hazard_var) with

        H(t)      = Σ_{t_j ≤ t} d_j / n_j
        Var[H(t)] = Σ_{t_j ≤ t} d_j (n_j − d_j) / n_j³

    — the additive cousin of [kaplan_meier] (S(t) ≈ exp(−H(t))); the
    hazard scale is what's compared/modelled (log-rank, Cox) because sums
    are easier to reason about than products. Same right-censoring
    convention: censored subjects stay in the risk set through their
    censoring time.

    Plan: identical shape to kaplan_meier — one (group, duration)
    aggregate to the distinct-time table, one bounded in-group cumulative
    window (``max_distinct`` fail-fast) for both the at-risk counts and
    the running sums. No log/exp gymnastics needed: the hazard increments
    are plain ratios, so the window sums them directly.
    """
    groups = list(group_cols or [])
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    base = df.filter(
        t.isNotNull() & ~F.isnan(t) & e.isNotNull()
    ).select(*groups, t.alias("__t"), e.alias("__e"))
    per_t = base.groupBy(*groups, "__t").agg(
        F.sum("__e").alias("__d"),
        F.sum(F.lit(1) - F.col("__e")).alias("__c"),
    )
    if max_distinct is not None:
        # share one corpus scan between guard and main plan (the
        # _per_score_counts pattern; optimization r12)
        per_t = per_t.localCheckpoint(eager=False)
        worst = (
            per_t.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"nelson_aalen: a group has {worst} distinct durations "
                f"(> max_distinct={max_distinct}); bucket durations first."
            )
    w_prev = (
        Window.partitionBy(*groups)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, -1)
        if groups
        else Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*groups) if groups else Window.partitionBy()
    risked = per_t.select(
        *groups,
        "__t",
        "__d",
        "__c",
        (
            F.sum(F.col("__d") + F.col("__c")).over(w_tot)
            - F.coalesce(F.sum(F.col("__d") + F.col("__c")).over(w_prev), F.lit(0))
        ).alias("__n"),
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    )
    nd, dd = F.col("__n").cast("double"), F.col("__d").cast("double")
    haz = F.sum(dd / nd).over(w_cum)
    hvar = F.sum(dd * (nd - dd) / F.pow(nd, F.lit(3.0))).over(w_cum)
    return (
        risked.select(*groups, "__t", "__d", "__n", haz.alias("__h"), hvar.alias("__v"))
        .filter(F.col("__d") > 0)
        .select(
            *groups,
            F.col("__t").alias("t"),
            F.col("__n").cast("long").alias("n_risk"),
            F.col("__d").cast("long").alias("n_events"),
            F.round("__h", round_to).alias("cum_hazard"),
            F.round("__v", round_to).alias("hazard_var"),
        )
        .orderBy(*groups, "t")
    )


def log_rank(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    round_to: int = 6,
    max_distinct: int | None = 100_000,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966): do two survival curves
    differ? → one row per group: (group, n_subjects, observed, expected,
    chi2) where, over the POOLED distinct event times t_j (d_j total
    events, n_j total at risk, n_gj at risk in group g, d_gj events in g),

        E_g   = Σ_j d_j · n_gj / n_j
        V     = Σ_{j: n_j > 1} d_j (n_1j/n_j)(1 − n_1j/n_j)(n_j − d_j)/(n_j − 1)
        chi2  = (O_1 − E_1)² / V        (1 dof; identical for either group)

    The standard A/B read on [kaplan_meier] curves (did the retention
    intervention shift time-to-churn?). Exactly two groups are required —
    the k-sample generalisation needs a matrix inverse; run pairwise.

    Plan: one (group, t) aggregate; the pooled event-time grid (bounded by
    ``max_distinct``, fail-fast) is crossed with the 2 groups and the
    per-group at-risk count at each pooled time comes from one bounded
    cumulative window over the union of grid markers and the group's own
    removal times — removals strictly before t, the same risk-set
    convention as kaplan_meier. Everything after is one aggregate.
    NOTE (eager): the two-group check and the ``max_distinct`` guard run
    small Spark jobs at DataFrame-construction time (fail at build, not
    mid-pipeline — the spearman_rho policy).
    """
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    base = df.filter(
        t.isNotNull() & ~F.isnan(t) & e.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).cast("string").alias("__g"), t.alias("__t"), e.alias("__e"))
    # one corpus scan total (optimization r12): the (group, t) aggregate is
    # materialized FIRST; the two-group check, the max_distinct guard, and
    # the pooled grid all derive from the checkpointed bounded table
    # (previously the group-list collect and the grid each re-scanned the
    # corpus).
    per_gt = base.groupBy("__g", "__t").agg(
        F.sum("__e").alias("__d"),
        F.sum(F.lit(1) - F.col("__e")).alias("__c"),
    ).localCheckpoint(eager=False)
    glist = [r["__g"] for r in per_gt.select("__g").distinct().orderBy("__g").collect()]
    if len(glist) != 2:
        raise ValueError(
            f"log_rank: need exactly 2 groups, got {len(glist)} ({glist[:5]}); "
            "run pairwise for k-sample comparisons."
        )
    if max_distinct is not None:
        worst = per_gt.select("__t").distinct().count()
        if worst > max_distinct:
            raise ValueError(
                f"log_rank: {worst} distinct pooled durations "
                f"(> max_distinct={max_distinct}); bucket durations first."
            )
    # pooled event times (where anything happened, d > 0 across groups)
    ev_times = (
        per_gt.groupBy("__t").agg(F.sum("__d").alias("__dj")).filter(F.col("__dj") > 0)
    )
    grid = ev_times.select("__t").crossJoin(
        F.broadcast(per_gt.select("__g").distinct())
    )
    # at-risk entering t = N_g − removals strictly before t: union grid
    # markers (sorted BEFORE same-time removal rows) with removal rows,
    # one cumulative window per group over the bounded distinct-time axis
    marks = grid.select(
        "__g", "__t", F.lit(0).alias("__rem"), F.lit(0).alias("__isrow")
    )
    rems = per_gt.select(
        "__g", "__t", (F.col("__d") + F.col("__c")).alias("__rem"),
        F.lit(1).alias("__isrow"),
    )
    u = marks.unionByName(rems)
    w_tot = Window.partitionBy("__g")
    w_before = (
        Window.partitionBy("__g")
        .orderBy("__t", "__isrow")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    atrisk = (
        u.select(
            "__g", "__t", "__isrow",
            (
                F.sum("__rem").over(w_tot)
                - F.coalesce(F.sum("__rem").over(w_before), F.lit(0))
            ).alias("__n_g"),
        )
        .filter(F.col("__isrow") == 0)
        .drop("__isrow")
    )
    cells = (
        atrisk.join(
            per_gt.select("__g", "__t", "__d"), ["__g", "__t"], "left"
        )
        .fillna(0, ["__d"])
        .join(ev_times.select("__t"), "__t")  # keep pooled event times only
    )
    g1 = glist[0]
    per_j = cells.groupBy("__t").agg(
        F.sum("__n_g").alias("__nj"),
        F.sum("__d").alias("__dj"),
        F.sum(F.when(F.col("__g") == g1, F.col("__n_g")).otherwise(0)).alias("__n1j"),
        F.sum(F.when(F.col("__g") == g1, F.col("__d")).otherwise(0)).alias("__d1j"),
    )
    nj = F.col("__nj").cast("double")
    dj = F.col("__dj").cast("double")
    n1 = F.col("__n1j").cast("double")
    stat = per_j.agg(
        F.sum("__d1j").alias("__o1"),
        F.sum(dj * n1 / nj).alias("__e1"),
        F.sum(
            F.when(
                F.col("__nj") > 1,
                dj * (n1 / nj) * (1.0 - n1 / nj) * (nj - dj) / (nj - 1.0),
            ).otherwise(0.0)
        ).alias("__v"),
    )
    counts = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_subjects"), F.sum("__e").alias("__obs")
    )
    chi2 = F.when(
        F.col("__v") > 0,
        F.pow(F.col("__o1") - F.col("__e1"), F.lit(2.0)) / F.col("__v"),
    )
    exp_g = F.when(F.col("__g") == g1, F.col("__e1")).otherwise(
        # total events − E_1: expectations sum to the observed total
        F.lit(None)
    )
    tot_ev = per_j.agg(F.sum("__dj").alias("__totd"))
    out = (
        counts.crossJoin(F.broadcast(stat))
        .crossJoin(F.broadcast(tot_ev))
        .select(
            F.col("__g").alias("group"),
            F.col("n_subjects").cast("long").alias("n_subjects"),
            F.when(F.col("__g") == g1, F.col("__o1"))
            .otherwise(F.col("__totd") - F.col("__o1"))
            .cast("long")
            .alias("observed"),
            F.round(
                F.when(F.col("__g") == g1, F.col("__e1")).otherwise(
                    F.col("__totd") - F.col("__e1")
                ),
                round_to,
            ).alias("expected"),
            F.round(chi2, round_to).alias("chi2"),
        )
        .orderBy("group")
    )
    return out
