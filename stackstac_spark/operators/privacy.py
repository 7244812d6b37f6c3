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

__all__ = ["l_diversity_report"]


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
