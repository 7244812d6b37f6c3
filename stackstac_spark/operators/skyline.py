"""Skyline (Pareto-dominance) queries — the classic "maximal vectors"
operator (Börzsönyi, Kossmann & Stocker, ICDE 2001): the set of points no
other point dominates in every criterion. The multi-objective shortlist
primitive of a data pipeline: best (quality, brevity) documents, best
(recall, latency) configs, best (support, confidence) rules — anywhere a
single score would force an arbitrary trade-off weighting.

No reference counterpart (gjoseph92/stackstac has no relational layer);
part of the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Two-criteria MAXIMIZING skyline per group → (group_cols..., x, y):
    the points (x, y) such that no other point has x' ≥ x AND y' ≥ y
    with at least one strict — i.e. the upper-right Pareto frontier.
    To minimize a criterion, negate it on the way in.

    2-D makes the classic O(n²) dominance test collapse to sorted-order
    algebra: reduce to one candidate per distinct x (the max y — anything
    below is dominated in place), then a point survives iff its y
    strictly exceeds every y at larger x. That is ONE cumulative-max
    window over the distinct-x axis, descending.

    Plan: one (group, x) max aggregate (map-side combined — the corpus
    pass), one bounded window over distinct x (``max_distinct``
    fail-fast), one filter. The skyline-specific property that makes
    this scale: dominance only needs the suffix maximum, never the
    pairwise comparison matrix.
    """
    groups = list(group_cols or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    ).select(*groups, x.alias("__x"), y.alias("__y"))
    per_x = base.groupBy(*groups, "__x").agg(F.max("__y").alias("__my"))
    if max_distinct is not None:
        # share one corpus scan between guard and main plan (the
        # _per_score_counts pattern; optimization r12)
        per_x = per_x.localCheckpoint(eager=False)
        worst = (
            per_x.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"skyline_2d: a group has {worst} distinct x values "
                f"(> max_distinct={max_distinct}); pre-bin the inputs "
                "(binning only thins the frontier, it cannot widen it)."
            )
    w_suffix = (
        Window.partitionBy(*groups)
        .orderBy(F.desc("__x"))
        .rowsBetween(Window.unboundedPreceding, -1)
        if groups
        else Window.orderBy(F.desc("__x")).rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    flagged = per_x.select(
        *groups,
        "__x",
        "__my",
        F.max("__my").over(w_suffix).alias("__suf"),
    )
    return (
        flagged.filter(
            F.col("__suf").isNull() | (F.col("__my") > F.col("__suf"))
        )
        .select(*groups, F.col("__x").alias("x"), F.col("__my").alias("y"))
        .orderBy(*groups, F.desc("x"))
    )
