"""Privacy screens for training-data release — the audits a dataset goes
through before leaving the pipeline. k-anonymity (equivalence-class sizes
over quasi-identifiers) ships as the `k_anonymity` gate; this module adds
the distinct-sensitive-value refinements. All plans are grouped aggregates
whose state is bounded by quasi-identifier cardinality, never record
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["l_diversity_report", "t_closeness_report"]


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, distinct-l form):
    k-anonymity's blind spot is a large equivalence class whose SENSITIVE
    attribute is constant — re-identification isn't needed when every
    matching record says the same thing. Group records by the
    quasi-identifier combination, count distinct sensitive values per
    class, and report the diversity histogram → one row per observed
    distinct-count d: (l_distinct, n_classes, n_records, below_l) —
    ``below_l`` marks classes an l-diverse release must generalize or
    suppress.

    Plan: one (QI..., sensitive) pre-aggregate (so the distinct count is
    an exact count over an already-deduped set — no count_distinct sketch
    ambiguity), one QI-class aggregate, one histogram aggregate; every
    post-scan table is bounded by QI×sensitive cardinality. Null sensitive
    values are excluded (an unknown value discloses nothing).
    """
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    base = df.filter(F.col(sensitive_col).isNotNull())
    pairs = base.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    classes = pairs.groupBy(*qi_cols).agg(
        F.sum("__n").alias("__cls_size"),
        F.count(F.lit(1)).alias("__l"),
    )
    return (
        classes.groupBy(F.col("__l").alias("l_distinct"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("__cls_size").cast("long").alias("n_records"),
        )
        .select(
            F.col("l_distinct").cast("long").alias("l_distinct"),
            "n_classes",
            "n_records",
            (F.col("l_distinct") < l).alias("below_l"),
        )
        .orderBy("l_distinct")
    )


def t_closeness_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """t-closeness audit for CATEGORICAL sensitive attributes (Li, Li &
    Venkatasubramanian 2007, variational-distance form) — the third rung
    of the release-audit ladder after ``k_anonymity`` and
    ``l_diversity_report``: an equivalence class can be k-large and
    l-diverse yet still leak when its sensitive DISTRIBUTION departs from
    the corpus-wide one (90% of one disease in a class discloses plenty).
    Per QI class, the total-variation distance between the class's
    sensitive distribution and the global distribution:

        d(class) = ½ Σ_c |p_class(c) − p_global(c)|

    → one row per class: qi_cols + (class_size, distance, above_t), with
    ``above_t`` marking classes a t-close release must generalize or
    suppress. (For ORDERED sensitive attributes the paper uses 1-D EMD —
    compose ``drift.wasserstein_1d`` with the QI class as the group
    instead.) Null sensitive values are excluded.

    Plan: one (QI..., sensitive) pre-aggregate; the global distribution
    is the pre-aggregate's second-level rollup BROADCAST back onto the
    (class, category) table; one class aggregate. Every post-scan table
    is bounded by QI×sensitive cardinality; absent-category mass folds in
    closed-form (Σ_absent p_global = 1 − Σ_present p_global — the
    js_divergence trick), so the plan never densifies the class×category
    grid.
    """
    if not 0.0 <= t <= 1.0:
        raise ValueError(f"t must be in [0, 1], got {t}")
    base = df.filter(F.col(sensitive_col).isNotNull())
    pairs = base.groupBy(*qi_cols, F.col(sensitive_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    glob = pairs.groupBy("__s").agg(F.sum("__n").alias("__gn"))
    # eager scalar (QI×sensitive-bounded aggregate — the l_diversity
    # plan family; fails at build on an empty input, which is correct)
    gtot = glob.agg(F.sum("__gn").alias("__gt")).first()["__gt"]
    if not gtot:
        raise ValueError("t_closeness_report: no non-null sensitive values")
    sizes = pairs.groupBy(*qi_cols).agg(F.sum("__n").alias("__cs"))
    dist = (
        pairs.join(sizes, qi_cols)
        .join(F.broadcast(glob), "__s")
        .groupBy(*qi_cols)
        .agg(
            F.max("__cs").cast("long").alias("class_size"),
            F.sum(
                F.abs(
                    F.col("__n") / F.col("__cs")
                    - F.col("__gn") / F.lit(float(gtot))
                )
            ).alias("__present"),
            # global mass of categories present in this class
            F.sum(F.col("__gn") / F.lit(float(gtot))).alias("__gpresent"),
        )
    )
    # categories ABSENT from the class contribute |0 − p_global| = their
    # global mass = 1 − Σ_present p_global
    d = (F.col("__present") + (1.0 - F.col("__gpresent"))) / 2.0
    return dist.select(
        *qi_cols,
        "class_size",
        F.round(d, round_to).alias("distance"),
        (d > t).alias("above_t"),
    )
