"""End-to-end corpus cleaning — the composition a training-data team runs
over a raw crawl, expressed as ONE DataFrame pipeline so Catalyst sees the
whole plan (shared scans, pushdown across stages) instead of N separate jobs.

Stages (each reusing the standalone operator family), first failing reason
wins, every input doc gets exactly one verdict row:

1. ``exact_dup``     — non-canonical exact duplicate (md5 of whitespace-
                       normalized lowercase text; canonical = smallest id) —
                       the :mod:`dedup` exact family.
2. ``too_short``     — fewer than ``min_tokens`` whitespace tokens (C4 rule).
3. ``low_diversity`` — distinct/total token ratio under ``min_diversity``
                       (Gopher repetition family).
4. ``contaminated``  — more than ``contamination_max`` of the doc's distinct
                       n-grams appear in the benchmark ``probe`` corpus
                       (decontamination; :func:`textstats.ngram_contamination`).
5. ``kept``          — survives all filters.

Scale shape: one fingerprint-keyed window (the only corpus-wide shuffle
besides the per-doc gram aggregate), the probe side broadcasts (it is a
benchmark suite — small by definition), token stats are pure column
expressions fused into the same scan. Nothing collects to the driver; output
rows == input rows, so the verdict table joins back to the corpus by id for
the actual drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_clean(
    docs: DataFrame,
    probe: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_diversity: float = 0.3,
    contamination_max: float = 0.5,
    ngram_n: int = 3,
) -> DataFrame:
    """(id, n_tokens, diversity, contamination, reason, keep) per input doc.

    ``probe=None`` skips the contamination stage (reason never fires).
    Thresholds are compared with rounded values (6 dp) so a replay on
    another engine cannot flip a borderline doc.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("diversity"),
        F.md5(norm).alias("__fp"),
    )
    w = Window.partitionBy("__fp")
    base = base.withColumn("__canon", F.min(id_col).over(w))

    if probe is not None:
        from stackstac_spark.operators.textstats import ngram_contamination

        cont = ngram_contamination(docs, probe, id_col, text_col, ngram_n).select(
            id_col, "contamination"
        )
        base = base.join(cont, id_col, "left")
    else:
        base = base.withColumn("contamination", F.lit(None).cast("double"))

    contamination = F.coalesce("contamination", F.lit(0.0))
    reason = (
        F.when(F.col(id_col) != F.col("__canon"), "exact_dup")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("diversity") < float(min_diversity), "low_diversity")
        .when(contamination > float(contamination_max), "contaminated")
        .otherwise("kept")
    )
    return base.select(
        id_col,
        "n_tokens",
        "diversity",
        contamination.alias("contamination"),
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    )
