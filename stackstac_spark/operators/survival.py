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

__all__ = ["kaplan_meier"]


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
