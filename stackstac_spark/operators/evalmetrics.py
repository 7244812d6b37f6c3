"""Ranking-quality evaluation metrics — the measurement layer for the
similarity/retrieval family (ANN recall lives in similarity.py; these are
the label-aware metrics): ROC-AUC for binary quality classifiers and
nDCG@k for graded retrieval runs.

Both are window/aggregate plans keyed on the evaluation group (model
segment, query id): tie-averaged ranks from per-distinct-score counts, no
global sorts, no Python. Outputs rounded for cross-engine hash equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["roc_auc", "ndcg_at_k", "wilson_rank", "fleiss_kappa", "calibration_error"]


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """ROC-AUC per group via the rank-sum identity
    AUC = (R⁺ − P(P+1)/2) / (P·N) with tie-AVERAGED ranks (the
    Mann-Whitney formulation — exactly what sklearn computes), where R⁺ is
    the positive-label rank sum over scores ascending. → group_cols +
    (n_pos, n_neg, auc).

    Ranks come from per-(group, distinct score) counts + one ordered
    cumulative window inside each group — the corpus never funnels into a
    single ordered partition, and ties are handled exactly rather than by
    row_number arbitrariness.
    """
    groups = list(group_cols or [])
    lab = F.col(label_col).cast("int")
    per_score = (
        df.select(*groups, F.col(score_col).alias("s"), lab.alias("y"))
        .groupBy(*groups, "s")
        .agg(
            F.sum("y").alias("p"),
            F.sum(F.lit(1) - F.col("y")).alias("n"),
        )
    )
    w = (
        Window.partitionBy(*groups).orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        if groups
        else Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_score.select(
        *groups,
        "p",
        (F.coalesce(F.sum(F.col("p") + F.col("n")).over(w), F.lit(0))
         + (F.col("p") + F.col("n") + 1) / 2.0).alias("avg_rank"),
        "n",
    )
    # a group with no positives or no negatives has UNDEFINED AUC — emit
    # NULL (sklearn raises; NULL keeps the metric total and ANSI-safe)
    return ranked.groupBy(*groups).agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
        F.when(
            (F.sum("p") > 0) & (F.sum("n") > 0),
            F.round(
                (F.sum(F.col("p") * F.col("avg_rank"))
                 - F.sum("p") * (F.sum("p") + 1) / 2.0)
                / (F.sum("p") * F.sum("n")),
                round_to,
            ),
        ).alias("auc"),
    )


def ndcg_at_k(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
    round_to: int = 6,
) -> DataFrame:
    """nDCG@k per query (Järvelin & Kekäläinen 2002, the exponential-gain
    form used by TREC/BEIR): DCG@k = Σ_{i≤k} (2^rel_i − 1)/log2(i+1) over
    the run ranked by (score desc, doc id), IDCG@k from the query's rels
    ranked by (rel desc, doc id), nDCG = DCG/IDCG (0 when the query has no
    relevant docs). → (query, dcg, idcg, ndcg).

    Plan: two query-partitioned top-k windows (run ranking; ideal
    ranking), one left join of run@k onto qrels (unjudged docs gain 0 —
    the TREC convention), two query aggs. Co-keyed on the query
    throughout; k bounds every per-query sum.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, d = F.col(query_col).alias("q"), F.col(doc_col).alias("d")
    run_n = run.select(q, d, F.col(score_col).alias("s"))
    rel_n = qrels.select(
        F.col(query_col).alias("q"), F.col(doc_col).alias("d"), F.col(rel_col).alias("r")
    )
    w_run = Window.partitionBy("q").orderBy(F.desc("s"), F.asc("d"))
    topk = (
        run_n.withColumn("rank", F.row_number().over(w_run))
        .filter(F.col("rank") <= k)
        .join(rel_n, ["q", "d"], "left")
        .fillna(0, ["r"])
    )
    dcg = topk.groupBy("q").agg(
        F.round(
            F.sum((F.pow(F.lit(2.0), F.col("r")) - 1.0) / F.log2(F.col("rank") + 1.0)),
            round_to,
        ).alias("dcg")
    )
    w_ideal = Window.partitionBy("q").orderBy(F.desc("r"), F.asc("d"))
    idcg = (
        rel_n.withColumn("rank", F.row_number().over(w_ideal))
        .filter((F.col("rank") <= k) & (F.col("r") > 0))
        .groupBy("q")
        .agg(
            F.round(
                F.sum((F.pow(F.lit(2.0), F.col("r")) - 1.0) / F.log2(F.col("rank") + 1.0)),
                round_to,
            ).alias("idcg")
        )
    )
    return (
        dcg.join(idcg, "q", "left")
        .fillna(0.0, ["idcg"])
        .select(
            F.col("q").alias(query_col),
            "dcg",
            "idcg",
            F.round(
                F.when(F.col("idcg") > 0.0, F.col("dcg") / F.col("idcg")).otherwise(0.0),
                round_to,
            ).alias("ndcg"),
        )
    )


def wilson_rank(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """Rank groups by the Wilson score LOWER bound of their success rate
    (Wilson 1927; Evan Miller's "how not to sort by average rating") →
    (group, n, pos, rate, wilson_lb) ordered by the bound — the
    small-sample-honest ranking: a 2/2 domain ranks BELOW a 95/100 one
    because its interval is wide, which naive rate sorting gets wrong.

        lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)

    One group aggregate + arithmetic; ``success_col`` is boolean/0-1."""
    g = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(success_col).cast("int")).cast("long").alias("pos"),
    )
    p = F.col("pos").cast("double") / F.col("n")
    z2 = z * z
    lb = (
        p
        + F.lit(z2) / (2.0 * F.col("n"))
        - F.lit(z)
        * F.sqrt((p * (1.0 - p) + F.lit(z2) / (4.0 * F.col("n"))) / F.col("n"))
    ) / (1.0 + F.lit(z2) / F.col("n"))
    return g.select(
        "group",
        "n",
        "pos",
        F.round(p, round_to).alias("rate"),
        F.round(lb, round_to).alias("wilson_lb"),
    ).orderBy(F.desc("wilson_lb"), "group")


def fleiss_kappa(
    labels: DataFrame,
    item_col: str = "item_id",
    category_col: str = "category",
    round_to: int = 6,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected inter-annotator
    agreement for n raters per item over k categories, THE quality gate
    for crowdsourced / multi-model labeling pipelines before labels are
    trusted for training:

        κ = (P̄ − P̄_e) / (1 − P̄_e)

    with P_i = (Σ_j n_ij² − n) / (n(n−1)) per item and P̄_e = Σ_j p_j²
    over global category shares. Requires the same rater count n per
    item (the classic formulation) — validated with one tiny aggregate.

    Plan: one (item, category) count, one per-item agreement aggregate,
    one global category-share aggregate, all hash aggregations — no
    windows, no joins except two literal-key scalar attaches. Returns
    one row: (n_items, n_raters, p_bar, p_e, kappa).
    """
    counts = labels.groupBy(item_col, category_col).agg(
        F.count(F.lit(1)).alias("__n_ij")
    )
    per_item = counts.groupBy(item_col).agg(
        F.sum("__n_ij").alias("__n"),
        F.sum(F.col("__n_ij") * F.col("__n_ij")).alias("__sq"),
    )
    n_check = per_item.agg(
        F.min("__n").alias("lo"), F.max("__n").alias("hi")
    ).first()
    if n_check["lo"] is None:
        raise ValueError("fleiss_kappa needs a non-empty labels frame")
    if n_check["lo"] != n_check["hi"]:
        raise ValueError(
            f"fleiss_kappa needs a constant rater count per item, got "
            f"[{n_check['lo']}, {n_check['hi']}]"
        )
    n = int(n_check["lo"])
    if n < 2:
        raise ValueError(f"need >= 2 raters per item, got {n}")
    p_bar = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(
            (F.col("__sq") - n) / F.lit(float(n * (n - 1)))
        ).alias("p_bar"),
    )
    cat = counts.groupBy(category_col).agg(F.sum("__n_ij").alias("__cat"))
    tot = cat.agg(F.sum("__cat").alias("__tot")).withColumn("__k", F.lit(1))
    p_e = (
        cat.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
        .agg(
            F.sum(
                (F.col("__cat") / F.col("__tot")) * (F.col("__cat") / F.col("__tot"))
            ).alias("p_e")
        )
    )
    a = p_bar.withColumn("__k", F.lit(1))
    b = p_e.withColumn("__k", F.lit(1))
    return (
        a.join(F.broadcast(b), "__k")
        .select(
            "n_items",
            F.lit(n).alias("n_raters"),
            F.round("p_bar", round_to).alias("p_bar"),
            F.round("p_e", round_to).alias("p_e"),
            # one universal category ⇒ p_e = 1 and κ is the undefined 0/0 —
            # emit NULL instead of an ANSI divide-by-zero
            F.when(
                F.col("p_e") < 1.0,
                F.round(
                    (F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e")), round_to
                ),
            ).alias("kappa"),
        )
    )


def calibration_error(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Scalar calibration quality of a probabilistic classifier → one row
    (n, brier, ece, mce): the Brier score mean((p−y)²) (Brier 1950), the
    Expected Calibration Error Σ (n_b/N)·|acc_b − conf_b| over ``bins``
    equal-width probability bins, and the Maximum Calibration Error
    max_b |acc_b − conf_b| (Naeini et al. 2015; Guo et al. 2017's
    standard reporting pair) — the one-number companions to the
    reliability-diagram gate: "is this quality/toxicity filter's 0.9
    actually a 0.9?".

    Bins are FIXED [0,1] equal-width (probability domain — no data-
    dependent range), p = 1.0 clamps into the top bin. Plan: one per-bin
    aggregate over the corpus (map-side combined) + one ≤``bins``-row
    scalar aggregate; acc/conf are ratios of exact sums per bin, so an
    external engine replays every term.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("double")
    # Null/NaN p or y rows are unscorable: floor(null*bins) is null and
    # greatest/least SKIP nulls, so a null p would land in the TOP bin
    # (inflating its n while contributing nothing to conf/pos), and a null
    # y would count toward __n while sum(__y) skips it — silently skewing
    # brier/ece/mce. Calibration is defined over scored rows only; drop
    # the rest up front (the conformal_interval contract).
    scored = df.filter(
        p.isNotNull() & ~F.isnan(p) & y.isNotNull() & ~F.isnan(y)
    )
    binned = scored.select(
        # clamp BOTH ends (the psi pattern): p outside [0,1] is caller
        # error, but it should land in an edge bin, not a phantom one
        F.greatest(
            F.lit(0), F.least(F.lit(bins - 1), F.floor(p * bins).cast("int"))
        ).alias("__b"),
        p.alias("__p"),
        y.alias("__y"),
        ((p - y) * (p - y)).alias("__sq"),
    )
    per_bin = binned.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__pos"),
        F.sum("__p").alias("__conf"),
        F.sum("__sq").alias("__sqs"),
    )
    gap = F.abs(F.col("__pos") / F.col("__n") - F.col("__conf") / F.col("__n"))
    return per_bin.agg(
        F.sum("__n").cast("long").alias("n"),
        F.round(F.sum("__sqs") / F.sum("__n"), round_to).alias("brier"),
        F.round(F.sum(gap * F.col("__n")) / F.sum("__n"), round_to).alias("ece"),
        F.round(F.max(gap), round_to).alias("mce"),
    )
