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

__all__ = [
    "roc_auc",
    "average_precision",
    "cohens_kappa",
    "mcnemar_test",
    "rbo_overlap",
    "cochran_q",
    "lift_deciles",
    "ndcg_at_k",
    "wilson_rank",
    "fleiss_kappa",
    "calibration_error",
    "brier_decomposition",
    "krippendorff_alpha",
    "lin_ccc",
    "cronbach_alpha",
    "gwet_ac1",
    "mrr",
    "topk_eval",
    "classifier_report",
    "log_loss",
    "youden_threshold",
    "bland_altman",
]


def _per_score_counts(
    df: DataFrame,
    score_col: str,
    label_col: str,
    groups: list[str],
    bins: int | None,
    max_distinct: int | None,
    op_name: str,
) -> DataFrame:
    """Shared threshold-metric base (roc_auc / average_precision):
    per-(group, distinct score) positive/negative counts, with the two
    scale controls — equal-width score binning (``bins``: the window input
    becomes ≤ bins rows per group at any data size; binning is a monotone
    coarsening, it can merge ties but never reorder) and the exact-mode
    distinct-score fail-fast (``max_distinct``: raise instead of silently
    funneling an O(rows) group through one window task at 100 TB).

    NOTE (eager guard): when ``max_distinct`` is set and ``bins`` is not,
    the guard runs a small Spark job at DataFrame-CONSTRUCTION time — a
    deliberate break from the otherwise lazy operator API so misuse fails
    at build, not mid-pipeline. The per-score aggregate is
    localCheckpoint-ed first, so the guard count and the main plan share
    ONE corpus scan (r11 ADVICE closed). Callers that want full laziness
    should pass ``bins=`` (no guard job, no checkpoint) or
    ``max_distinct=None``. Surfaced in the public docstrings of roc_auc /
    average_precision / lift_deciles via this shared contract."""
    lab = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    # unscorable rows are not threshold observations: a null/NaN score
    # would form its own rank group (NaN sorts ABOVE every number in
    # Spark), and a null label would count toward the group totals while
    # sum(y) skips it — silently deflating AUC/AP (the calibration_error
    # contract)
    base = df.filter(
        s.isNotNull() & ~F.isnan(s) & lab.isNotNull()
    ).select(*groups, s.alias("s"), lab.alias("y"))
    if bins is not None:
        if bins < 1:
            raise ValueError(f"bins must be >= 1, got {bins}")
        # per-group observed range, broadcast back
        if groups:
            rng = base.groupBy(*groups).agg(
                F.min("s").alias("__lo"), F.max("s").alias("__hi")
            )
            base = base.join(F.broadcast(rng), groups)
        else:
            rng = base.agg(
                F.min("s").alias("__lo"), F.max("s").alias("__hi")
            ).withColumn("__k", F.lit(1))
            base = base.withColumn("__k", F.lit(1)).join(
                F.broadcast(rng), "__k"
            )
        span = F.col("__hi") - F.col("__lo")
        b = F.when(
            span > 0,
            F.least(
                F.lit(bins - 1),
                F.floor((F.col("s") - F.col("__lo")) / span * bins),
            ),
        ).otherwise(F.lit(0))
        base = base.select(*groups, b.cast("double").alias("s"), "y")
    per_score = base.groupBy(*groups, "s").agg(
        F.sum("y").alias("p"),
        F.sum(F.lit(1) - F.col("y")).alias("n"),
    )
    if bins is None and max_distinct is not None:
        # runtime guard on the window's actual input size. The aggregated
        # per-score table is localCheckpoint-ed FIRST, so the guard count
        # and the main plan share ONE corpus scan (r11 ADVICE: the
        # recompute cost roc_auc +0.23 s at sf0.1); eager=True runs the
        # materialization job here, which is also where a pathological
        # input fails. The checkpoint is distinct-score-sized when the
        # guard passes — the table the plan needs materialized anyway.
        per_score = per_score.localCheckpoint()
        worst = (
            per_score.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"{op_name} exact mode: a group has {worst} distinct scores "
                f"(> max_distinct={max_distinct}); the per-group cumulative "
                "window would funnel them through one task. Pass bins= for "
                "the binned estimator, or raise/disable max_distinct if the "
                "scores are genuinely discrete."
            )
    return per_score


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    bins: int | None = None,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """ROC-AUC per group via the rank-sum identity
    AUC = (R⁺ − P(P+1)/2) / (P·N) with tie-AVERAGED ranks (the
    Mann-Whitney formulation — exactly what sklearn computes), where R⁺ is
    the positive-label rank sum over scores ascending. → group_cols +
    (n_pos, n_neg, auc).

    Ranks come from per-(group, distinct score) counts + one ordered
    cumulative window inside each group — the corpus never funnels into a
    single ordered partition... PROVIDED distinct scores per group stay
    bounded. For raw continuous float scores distinct ≈ rows, and the
    exact cumulative window would stream a whole group through one task.
    Two scale controls:

    - ``bins``: approximate mode — scores collapse to ``bins`` equal-width
      bins over each group's observed [min, max] (ties tie-averaged within
      a bin; the standard binned-AUC estimator, error O(1/bins)). The
      window input is then ≤ ``bins`` rows per group at any data size.
    - ``max_distinct``: exact-mode fail-fast — raises when any group's
      distinct-score count exceeds it, instead of silently hanging a task
      at scale. ``None`` disables the guard (callers who KNOW scores are
      discrete).
    """
    groups = list(group_cols or [])
    per_score = _per_score_counts(
        df, score_col, label_col, groups, bins, max_distinct, "roc_auc"
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


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    bins: int | None = None,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Average precision (area under the precision-recall curve, the
    step-function form sklearn's ``average_precision_score`` computes) per
    group → group_cols + (n_pos, n_neg, ap):

        AP = Σ_i (R_i − R_{i−1}) · P_i

    over distinct score thresholds descending, where P_i / R_i are
    precision / recall at threshold i. Since R_i − R_{i−1} = p_i / n_pos
    (p_i = positives AT score i), AP reduces to Σ p_i·P_i / n_pos — one
    per-(group, distinct score) aggregate + one in-group cumulative window
    (inclusive, descending) + one final agg. The PR-curve companion to
    ``roc_auc`` for imbalanced label sets, with the same two scale
    controls (``bins`` binned estimator / ``max_distinct`` fail-fast;
    binning merges ties but never reorders). NULL when the group has no
    positives.
    """
    groups = list(group_cols or [])
    per_score = _per_score_counts(
        df, score_col, label_col, groups, bins, max_distinct, "average_precision"
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_score.select(
        *groups,
        "p",
        "n",
        F.sum("p").over(w).alias("cum_p"),
        F.sum(F.col("p") + F.col("n")).over(w).alias("cum_t"),
    )
    return cum.groupBy(*groups).agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
        F.when(
            F.sum("p") > 0,
            F.round(
                F.sum(F.col("p") * F.col("cum_p") / F.col("cum_t")) / F.sum("p"),
                round_to,
            ),
        ).alias("ap"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's kappa inter-rater agreement for TWO raters (Cohen 1960) per
    group → group_cols + (n, po, pe, kappa): observed agreement
    po = Σ 1[a=b]/n against chance agreement pe = Σ_k pA(k)·pB(k) from the
    raters' marginal category distributions, κ = (po − pe)/(1 − pe) —
    the two-annotator complement to ``fleiss_kappa`` (which needs
    per-(item, category) count matrices; pairwise double-annotation audits
    are the far more common labeling-pipeline shape). NULL when pe = 1
    (both raters constant and equal — agreement is undefined, matching
    fleiss_kappa's degenerate convention).

    Plan: one pairwise aggregate (n, agree) + two marginal aggregates
    joined on the category — every table is category-bounded; the row set
    never funnels anywhere. Null ratings are excluded (an unrated item is
    not an agreement observation).
    """
    groups = list(group_cols or [])
    a, b = F.col(rater_a), F.col(rater_b)
    base = df.filter(a.isNotNull() & b.isNotNull()).select(
        *groups, a.cast("string").alias("__a"), b.cast("string").alias("__b")
    )
    totals = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("__a") == F.col("__b")).cast("int")).alias("__agree"),
    )
    ma = base.groupBy(*groups, "__a").agg(F.count(F.lit(1)).alias("__na"))
    mb = base.groupBy(*groups, "__b").agg(F.count(F.lit(1)).alias("__nb"))
    on = [*groups, "__k"] if groups else ["__k"]
    cross = ma.withColumnRenamed("__a", "__k").join(
        mb.withColumnRenamed("__b", "__k"), on
    )
    chance = cross.groupBy(*groups).agg(
        F.sum(F.col("__na") * F.col("__nb")).alias("__prod")
    )
    if groups:
        j = totals.join(chance, groups)
    else:
        # constant-key broadcast join of two 1-row frames — keeps
        # CartesianProduct out of the plan (suite-wide plan-net contract)
        j = (
            totals.withColumn("__j", F.lit(1))
            .join(F.broadcast(chance.withColumn("__j", F.lit(1))), "__j")
            .drop("__j")
        )
    po = F.col("__agree") / F.col("n")
    pe = F.col("__prod") / (F.col("n") * F.col("n"))
    return j.select(
        *groups,
        F.col("n").cast("long").alias("n"),
        F.round(po, round_to).alias("po"),
        F.round(pe, round_to).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), round_to)).alias(
            "kappa"
        ),
    )


def mcnemar_test(
    df: DataFrame,
    pred_a: str,
    pred_b: str,
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """McNemar's test for comparing two classifiers on the SAME examples
    (McNemar 1947, the continuity-corrected form statsmodels/Dietterich
    1998 use) per group → group_cols + (n, a_only, b_only, chi2):
    a_only = examples A got right and B got wrong, b_only the reverse,
    χ² = (|a_only − b_only| − 1)² / (a_only + b_only) — the standard
    "is model A actually better than model B on this eval set?" paired
    test (concordant examples carry no information and drop out). NULL
    when the classifiers never disagree (a_only + b_only = 0).

    Plan: one conditional aggregate over the corpus — map-side combined,
    no shuffle beyond the group keys.
    """
    groups = list(group_cols or [])
    # a row with a null prediction or label is not a paired observation:
    # null == x is SQL NULL, so it would inflate n while contributing to
    # neither disagreement count — drop it up front
    df = df.filter(
        F.col(pred_a).isNotNull()
        & F.col(pred_b).isNotNull()
        & F.col(label_col).isNotNull()
    )
    ok_a = F.col(pred_a) == F.col(label_col)
    ok_b = F.col(pred_b) == F.col(label_col)
    agg = df.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((ok_a & ~ok_b).cast("int")).cast("long").alias("a_only"),
        F.sum((~ok_a & ok_b).cast("int")).cast("long").alias("b_only"),
    )
    disc = F.col("a_only") + F.col("b_only")
    diff = F.abs(F.col("a_only") - F.col("b_only"))
    return agg.select(
        *groups,
        "n",
        "a_only",
        "b_only",
        F.when(
            disc > 0, F.round((diff - 1) * (diff - 1) / disc, round_to)
        ).alias("chi2"),
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


def rbo_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    depth: int = 10,
    p: float = 0.9,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    round_to: int = 6,
) -> DataFrame:
    """Rank-Biased Overlap between two rankings per query (Webber, Moffat
    & Zobel 2010, the truncated prefix form) → (query, n_common, rbo):

        RBO@d = (1−p) · Σ_{k=1..d} p^{k−1} · |A_k ∩ B_k| / k

    — the top-weighted "how much did the ranking change?" metric for
    comparing retrieval runs / ANN configs / re-ranker versions, where
    Kendall/Spearman over-weight the tail nobody reads. Ties break by doc
    id (the nDCG convention here), NULL-scored docs are excluded.

    Rearrangement that keeps the plan join-shaped: a doc first enters both
    prefixes at k = max(rank_a, rank_b), so
    RBO@d = (1−p) · Σ_docs W[max(ra, rb)] with W[m] = Σ_{k=m..d} p^{k−1}/k
    — a d-entry literal lookup. Plan: two query-partitioned top-d windows
    + one (query, doc) equi-join + one agg; every per-query table is
    ≤ depth rows, so the metric is O(queries·depth) at any corpus size.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0,1), got {p}")
    # W[m] = sum_{k=m..d} p^(k-1)/k, 1-indexed; python-computed literals so
    # an external engine replays the exact same doubles
    weights = [0.0] * (depth + 2)
    for k in range(depth, 0, -1):
        weights[k] = weights[k + 1] + (p ** (k - 1)) / k

    def topd(run: DataFrame, rank_name: str) -> DataFrame:
        s = F.col(score_col).cast("double")
        w = Window.partitionBy("q").orderBy(F.desc("s"), F.asc("d"))
        return (
            run.filter(s.isNotNull() & ~F.isnan(s))
            .select(
                F.col(query_col).alias("q"),
                F.col(doc_col).alias("d"),
                s.alias("s"),
            )
            .withColumn(rank_name, F.row_number().over(w))
            .filter(F.col(rank_name) <= depth)
            .drop("s")
        )

    ta, tb = topd(run_a, "ra"), topd(run_b, "rb")
    j = ta.join(tb, ["q", "d"])
    m = F.greatest("ra", "rb")
    wexpr = F.element_at(
        F.array(*[F.lit(float(weights[k])) for k in range(1, depth + 1)]), m
    )
    per_q = j.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.round((1.0 - p) * F.sum(wexpr), round_to).alias("rbo"),
    )
    # RBO of DISJOINT prefixes is defined as 0, not "no row": left-join
    # from the union of queries present in either run so a query whose
    # top-d sets share nothing still emits (q, 0, 0.0) — r11 ADVICE; the
    # inner-join form silently dropped such queries (the rbo_eval gate
    # graded an empty frame at sf1).
    qs = ta.select("q").union(tb.select("q")).distinct()
    return qs.join(per_q, "q", "left").select(
        F.col("q").alias(query_col),
        F.coalesce("n_common", F.lit(0).cast("long")).alias("n_common"),
        F.coalesce("rbo", F.lit(0.0)).alias("rbo"),
    )


def cochran_q(
    df: DataFrame,
    pred_cols: list[str],
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Cochran's Q test for comparing k ≥ 2 classifiers on the SAME
    examples (Cochran 1950; the k-way generalization of McNemar) per group
    → group_cols + (n, k, q_stat):

        Q = k(k−1) · Σ_j (G_j − T/k)² / (k·T − Σ_i L_i²)

    with G_j = examples classifier j got right, L_i = classifiers right on
    example i, T = Σ L_i — "is ANY of these k models actually different?"
    before pairwise McNemars. Q ~ χ²(k−1) under H0. NULL when the
    denominator is 0 (all classifiers agree on every example — no
    information). Rows with a null label or any null prediction are
    excluded (not a complete k-tuple observation).

    Plan: L_i is a map-only expression over the k prediction columns, then
    ONE grouped aggregate carries every term (k per-classifier conditional
    sums + ΣL + ΣL²) — no shuffle beyond the group keys.
    """
    if len(pred_cols) < 2:
        raise ValueError(f"need >= 2 classifiers, got {len(pred_cols)}")
    k = len(pred_cols)
    groups = list(group_cols or [])
    cond = F.col(label_col).isNotNull()
    for c in pred_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond)
    oks = [
        (F.col(c) == F.col(label_col)).cast("int").alias(f"__ok{i}")
        for i, c in enumerate(pred_cols)
    ]
    li = sum(F.col(f"__ok{i}") for i in range(k))
    rows = base.select(*groups, *oks).withColumn("__L", li)
    agg = rows.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__L").alias("__T"),
        F.sum(F.col("__L") * F.col("__L")).alias("__L2"),
        *[F.sum(f"__ok{i}").alias(f"__G{i}") for i in range(k)],
    )
    gbar = F.col("__T") / k
    num = sum(
        (F.col(f"__G{i}") - gbar) * (F.col(f"__G{i}") - gbar) for i in range(k)
    )
    den = k * F.col("__T") - F.col("__L2")
    return agg.select(
        *groups,
        "n",
        F.lit(k).alias("k"),
        F.when(den > 0, F.round(k * (k - 1) * num / den, round_to)).alias(
            "q_stat"
        ),
    )


def lift_deciles(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Cumulative-gains / lift table (the model-quality report every
    scored rollout ships next to AUC) → one row per score decile,
    highest scores first: (bucket, n, n_pos, cum_n, cum_pos, gain, lift)
    with gain = cum_pos/total_pos and lift = (cum_pos/cum_n)/(base rate) —
    "the top 20% of scores capture X% of the positives".

    No per-row ranking: distinct scores carry rank INTERVALS from one
    descending cumulative window (the trimmed_mean machinery); each
    interval's overlap with a bucket's rank band apportions its rows, and
    ties straddling a boundary split PROPORTIONALLY (positives distribute
    as pos·overlap/count — the standard indistinguishable-ties convention
    for gains charts, engine-exact because the fractions are ratios of
    integers). Plan: one per-distinct-score aggregate, one bounded window,
    one buckets-literal explode (≤ n_buckets rows per distinct score), one
    bucket aggregate. Same null/NaN exclusions and ``max_distinct``
    fail-fast as roc_auc.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    per_score = _per_score_counts(
        df, score_col, label_col, [], None, max_distinct, "lift_deciles"
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    ranked = per_score.select(
        "p",
        "n",
        (F.col("p") + F.col("n")).alias("__cnt"),
        F.sum(F.col("p") + F.col("n")).over(w).alias("__cum"),
        F.sum(F.col("p") + F.col("n")).over(wt).alias("__N"),
        F.sum("p").over(wt).alias("__P"),
    )
    burst = ranked.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket")
    )
    lo = F.floor(F.col("bucket") * F.col("__N") / n_buckets)
    hi = F.floor((F.col("bucket") + 1) * F.col("__N") / n_buckets)
    ov = F.greatest(
        F.lit(0),
        F.least(F.col("__cum"), hi) - F.greatest(F.col("__cum") - F.col("__cnt"), lo),
    )
    per_bucket = burst.groupBy("bucket").agg(
        # cast: the overlap weights are integral, but the oracle column is
        # a rounded DOUBLE (proportional pos splits are fractional) — the
        # hash renders 20 and 20.0 differently
        F.round(F.sum(ov).cast("double"), round_to).alias("__n_b"),
        F.round(F.sum(F.col("p") * ov / F.col("__cnt")), round_to).alias("__pos_b"),
        F.max("__N").alias("__N"),
        F.max("__P").alias("__P"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    out = per_bucket.select(
        "bucket",
        F.col("__n_b").alias("n"),
        F.col("__pos_b").alias("n_pos"),
        F.sum("__n_b").over(w_cum).alias("__cn"),
        F.sum("__pos_b").over(w_cum).alias("__cp"),
        "__N",
        "__P",
    )
    return out.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        "n_pos",
        F.round("__cn", round_to).alias("cum_n"),
        F.round("__cp", round_to).alias("cum_pos"),
        F.when(
            F.col("__P") > 0, F.round(F.col("__cp") / F.col("__P"), round_to)
        ).alias("gain"),
        F.when(
            (F.col("__P") > 0) & (F.col("__cn") > 0),
            F.round(
                (F.col("__cp") / F.col("__cn")) / (F.col("__P") / F.col("__N")),
                round_to,
            ),
        ).alias("lift"),
    ).orderBy("bucket")


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score per group →
    group_cols + (n, brier, reliability, resolution, uncertainty):

        brier       = mean (p − y)²                      (exact, unbinned)
        reliability = Σ_b n_b (p̄_b − ō_b)² / N           (miscalibration)
        resolution  = Σ_b n_b (ō_b − ō)² / N             (discrimination)
        uncertainty = ō(1 − ō)

    over ``bins`` equal-width probability bins — the standard "WHY is the
    Brier score what it is?" reading: binned_brier = REL − RES + UNC
    (exact when scores are constant within bins), so a model can be bad
    because it is miscalibrated (high REL — fix with ``isotonic``/Platt)
    or because it cannot separate (low RES — fix the model). The
    decomposed companion to ``calibration_error``'s ECE. Scores must be
    probabilities: rows with score outside [0, 1], null/NaN score, or
    null label are excluded. NULL components when the group is empty.

    Plan: one map-side bin assignment + one (group, bin) aggregate + one
    group aggregate — linear, no windows, no second pass (the global
    mean ō folds in algebraically via Σy).
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    groups = list(group_cols or [])
    p = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.filter(
        p.isNotNull() & ~F.isnan(p) & (p >= 0.0) & (p <= 1.0) & y.isNotNull()
    ).select(
        *groups,
        p.alias("__p"),
        y.cast("double").alias("__y"),
        F.least(F.lit(bins - 1), F.floor(p * bins)).cast("int").alias("__b"),
    )
    per_bin = base.groupBy(*groups, "__b").agg(
        F.count(F.lit(1)).alias("__nb"),
        F.avg("__p").alias("__pb"),
        F.avg("__y").alias("__ob"),
        F.sum("__y").alias("__sy"),
        F.sum((F.col("__p") - F.col("__y")) * (F.col("__p") - F.col("__y"))).alias(
            "__se"
        ),
    )
    # ō folds in algebraically: Σ_b n_b(ō_b − ō)² = Σ n_b ō_b² − N·ō²
    agg = per_bin.groupBy(*groups).agg(
        F.sum("__nb").cast("long").alias("n"),
        F.sum("__se").alias("__sse"),
        F.sum("__sy").alias("__sy"),
        F.sum(
            F.col("__nb") * (F.col("__pb") - F.col("__ob")) * (F.col("__pb") - F.col("__ob"))
        ).alias("__rel"),
        F.sum(F.col("__nb") * F.col("__ob") * F.col("__ob")).alias("__sob2"),
    )
    n = F.col("n").cast("double")
    obar = F.col("__sy") / n
    return agg.select(
        *groups,
        "n",
        F.when(F.col("n") > 0, F.round(F.col("__sse") / n, round_to)).alias("brier"),
        F.when(F.col("n") > 0, F.round(F.col("__rel") / n, round_to)).alias(
            "reliability"
        ),
        F.when(
            F.col("n") > 0,
            F.round((F.col("__sob2") - n * obar * obar) / n, round_to),
        ).alias("resolution"),
        F.when(F.col("n") > 0, F.round(obar * (1.0 - obar), round_to)).alias(
            "uncertainty"
        ),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data per group (Krippendorff 1970,
    the coincidence-matrix form) → group_cols + (n_units, n_pairable,
    alpha):

        α = 1 − D_o/D_e,
        D_o = Σ_u Σ_c n_uc(n_u − n_uc)/(n_u − 1) / n,
        D_e = Σ_c n_c(n − n_c) / (n(n−1))

    over the PAIRABLE values (units rated at least twice; n = their
    count, n_uc = ratings of category c in unit u, n_c = Σ_u n_uc) — the
    agreement coefficient that, unlike ``cohens_kappa``/``fleiss_kappa``,
    needs NO fixed rater panel and tolerates missing ratings: exactly the
    shape of crowdsourced labeling tables (each row = one (item, label)
    rating, raters anonymous/variable). α = 1 is perfect agreement, 0 is
    chance, < 0 systematic disagreement. NULL when no unit is pairable or
    every pairable rating is the same category (D_e = 0: agreement is
    vacuous, Krippendorff leaves it undefined). Null units/values are
    excluded.

    Plan: one (group, unit, category) count, one (group, unit) rollup,
    one (group, category) rollup, one group aggregate — all linear, keyed
    shuffles only, no windows.
    """
    groups = list(group_cols or [])
    base = df.filter(
        F.col(unit_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(*groups, F.col(unit_col).alias("__u"), F.col(value_col).alias("__c"))
    uc = base.groupBy(*groups, "__u", "__c").agg(F.count(F.lit(1)).alias("__nuc"))
    u_tot = uc.groupBy(*groups, "__u").agg(F.sum("__nuc").alias("__nu"))
    # pairable = units with >= 2 ratings
    uc_p = uc.join(
        u_tot.filter(F.col("__nu") >= 2), [*groups, "__u"]
    )
    do_tab = uc_p.groupBy(*groups).agg(
        F.count_distinct("__u").cast("long").alias("n_units"),
        F.sum(
            F.col("__nuc") * (F.col("__nu") - F.col("__nuc")) / (F.col("__nu") - 1)
        ).alias("__do_sum"),
    )
    cat = uc_p.groupBy(*groups, "__c").agg(F.sum("__nuc").alias("__nc"))
    n_tab = cat.groupBy(*groups).agg(F.sum("__nc").cast("long").alias("n_pairable"))
    de_tab = (
        cat.join(n_tab, groups)
        if groups
        else cat.withColumn("__k", F.lit(1))
        .join(F.broadcast(n_tab.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    ).groupBy(*groups).agg(
        F.first("n_pairable").alias("n_pairable"),
        F.sum(F.col("__nc") * (F.col("n_pairable") - F.col("__nc"))).alias("__de_sum"),
    )
    if groups:
        j = do_tab.join(de_tab, groups)
    else:
        j = do_tab.withColumn("__k", F.lit(1)).join(
            F.broadcast(de_tab.withColumn("__k", F.lit(1))), "__k"
        ).drop("__k")
    n = F.col("n_pairable").cast("double")
    d_o = F.col("__do_sum") / n
    d_e = F.col("__de_sum") / (n * (n - 1.0))
    return j.select(
        *groups,
        "n_units",
        "n_pairable",
        F.when((n > 1) & (d_e > 0), F.round(1.0 - d_o / d_e, round_to)).alias(
            "alpha"
        ),
    )


def lin_ccc(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Lin's concordance correlation coefficient per group (Lin 1989) →
    group_cols + (n, ccc):

        CCC = 2·s_xy / (s_x² + s_y² + (x̄ − ȳ)²)

    (population-form moments, matching the common implementations) — "do
    the two CONTINUOUS measurements agree?", which Pearson alone cannot
    answer: r measures linear association, CCC additionally punishes
    scale and location shift, so a re-scored metric that is perfectly
    correlated but 2× inflated scores CCC ≈ 0.4, not 1.0. The continuous
    companion to ``cohens_kappa`` for before/after pipeline rescoring
    audits. NULL when n = 0 or the denominator is 0 (both columns
    constant AND equal-mean). Null/NaN in either column drops the pair.

    Plan: ONE grouped exact-moments aggregate — no window, no join.
    """
    groups = list(group_cols or [])
    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    base = df.filter(
        a.isNotNull() & ~F.isnan(a) & b.isNotNull() & ~F.isnan(b)
    ).select(*groups, a.alias("__a"), b.alias("__b"))
    agg = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__a").alias("__sa"),
        F.sum("__b").alias("__sb"),
        F.sum(F.col("__a") * F.col("__a")).alias("__saa"),
        F.sum(F.col("__b") * F.col("__b")).alias("__sbb"),
        F.sum(F.col("__a") * F.col("__b")).alias("__sab"),
    )
    n = F.col("n").cast("double")
    ma = F.col("__sa") / n
    mb = F.col("__sb") / n
    sxx = F.col("__saa") / n - ma * ma
    syy = F.col("__sbb") / n - mb * mb
    sxy = F.col("__sab") / n - ma * mb
    den = sxx + syy + (ma - mb) * (ma - mb)
    return agg.select(
        *groups,
        "n",
        F.when((F.col("n") > 0) & (den > 0), F.round(2.0 * sxy / den, round_to)).alias(
            "ccc"
        ),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols: list[str],
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient per group
    (Cronbach 1951) → group_cols + (n, k, alpha):

        α = k/(k−1) · (1 − Σ_i σ²_item_i / σ²_total)

    with σ²_total the variance of the per-row item SUM (population-form
    variances) — "do these k quality sub-scores measure one underlying
    thing?", the standard reliability check before collapsing k rubric
    columns into a single label. α ≥ 0.7 is the conventional bar. Rows
    with any null/NaN item are excluded (a complete k-tuple observation,
    the cochran_q contract). NULL when n < 2 or the total variance is 0.

    Plan: ONE grouped aggregate carrying 2k+2 exact moments (Σx_i, Σx_i²
    per item, Σs, Σs² for the row sum) — no window, no second pass.
    """
    if len(item_cols) < 2:
        raise ValueError(f"need >= 2 items, got {len(item_cols)}")
    k = len(item_cols)
    groups = list(group_cols or [])
    cols = [F.col(c).cast("double") for c in item_cols]
    cond = F.lit(True)
    for c in cols:
        cond = cond & c.isNotNull() & ~F.isnan(c)
    total = sum(cols[1:], cols[0])
    base = df.filter(cond).select(
        *groups,
        *[c.alias(f"__x{i}") for i, c in enumerate(cols)],
        total.alias("__s"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(k):
        aggs.append(F.sum(f"__x{i}").alias(f"__s{i}"))
        aggs.append(F.sum(F.col(f"__x{i}") * F.col(f"__x{i}")).alias(f"__q{i}"))
    aggs.append(F.sum("__s").alias("__ss"))
    aggs.append(F.sum(F.col("__s") * F.col("__s")).alias("__qq"))
    agg = base.groupBy(*groups).agg(*aggs)
    n = F.col("n").cast("double")
    var_items = sum(
        (
            F.col(f"__q{i}") / n
            - (F.col(f"__s{i}") / n) * (F.col(f"__s{i}") / n)
        )
        for i in range(k)
    )
    var_total = F.col("__qq") / n - (F.col("__ss") / n) * (F.col("__ss") / n)
    return agg.select(
        *groups,
        "n",
        F.lit(k).cast("long").alias("k"),
        F.when(
            (F.col("n") >= 2) & (var_total > 0),
            F.round(k / (k - 1.0) * (1.0 - var_items / var_total), round_to),
        ).alias("alpha"),
    )


def gwet_ac1(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Gwet's AC1 agreement coefficient for two raters per group (Gwet
    2008) → group_cols + (n, po, pe, ac1): same (po − pe)/(1 − pe) shape
    as ``cohens_kappa`` but with chance agreement

        pe = Σ_c π_c(1 − π_c) / (C − 1),   π_c = (pA(c) + pB(c))/2

    — the prevalence-robust alternative: kappa collapses toward 0 when
    one category dominates (the "kappa paradox" on a 95%-clean corpus
    where both raters agree 96% of the time); AC1 stays interpretable.
    Labeling-audit practice is to report both. C = categories observed by
    either rater in the group. NULL when pe = 1. Rows with either rating
    null are excluded.

    Plan: the cohens_kappa plan — one agreement aggregate + two
    category-bounded marginal tables joined back; everything after the
    first aggregate is category-sized.
    """
    groups = list(group_cols or [])
    base = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(*groups, F.col(rater_a).alias("__a"), F.col(rater_b).alias("__b"))
    n_po = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg((F.col("__a") == F.col("__b")).cast("double")).alias("__po"),
    )
    ma = base.groupBy(*groups, F.col("__a").alias("__c")).agg(
        F.count(F.lit(1)).alias("__ca")
    )
    mb = base.groupBy(*groups, F.col("__b").alias("__c")).agg(
        F.count(F.lit(1)).alias("__cb")
    )
    marg = ma.join(mb, [*groups, "__c"], "full").select(
        *groups,
        "__c",
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    pe_tab = marg.join(n_po.select(*groups, "n"), groups) if groups else (
        marg.withColumn("__k", F.lit(1))
        .join(F.broadcast(n_po.select("n").withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    nn = F.col("n").cast("double")
    pi_c = (F.col("__ca") / nn + F.col("__cb") / nn) / 2.0
    pe = pe_tab.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("__ncat"),
        F.sum(pi_c * (1.0 - pi_c)).alias("__pe_raw"),
    )
    j = n_po.join(pe, groups) if groups else (
        n_po.withColumn("__k", F.lit(1))
        .join(F.broadcast(pe.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    pe_val = F.when(
        F.col("__ncat") > 1, F.col("__pe_raw") / (F.col("__ncat") - 1.0)
    ).otherwise(F.lit(0.0))
    return j.select(
        *groups,
        "n",
        F.round("__po", round_to).alias("po"),
        F.round(pe_val, round_to).alias("pe"),
        F.when(
            pe_val < 1.0,
            F.round((F.col("__po") - pe_val) / (1.0 - pe_val), round_to),
        ).alias("ac1"),
    )


def mrr(
    df: DataFrame,
    query_col: str,
    score_col: str,
    label_col: str,
    k: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Mean reciprocal rank over queries → one row (n_queries, mrr):
    1/rank of the FIRST relevant document per query, averaged over all
    queries (0 for a query with no relevant doc in the (optionally
    ``k``-truncated) ranking — the trec_eval convention). THE first-answer
    retrieval metric; nDCG grades the whole list, MRR grades "how fast do
    I hit one good result". Ties break by document score order with a
    deterministic fallback on the row's remaining columns being absent —
    callers should pre-disambiguate ties if exact cross-engine replay
    matters (the gate fixture uses distinct scores). Null/NaN scores and
    null labels are excluded.

    Plan: one QUERY-PARTITIONED rank window (row_number — partitioned by
    construction, any corpus size) + one min-aggregate per query + one
    global average. No unpartitioned window anywhere.
    """
    lab = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    base = df.filter(
        s.isNotNull() & ~F.isnan(s) & lab.isNotNull()
    ).select(F.col(query_col).alias("__q"), s.alias("__s"), lab.alias("__y"))
    w = Window.partitionBy("__q").orderBy(F.desc("__s"))
    ranked = base.withColumn("__rk", F.row_number().over(w))
    if k is not None:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        ranked = ranked.filter(F.col("__rk") <= k)
    per_q = ranked.groupBy("__q").agg(
        F.min(F.when(F.col("__y") == 1, F.col("__rk"))).alias("__first")
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(
            F.avg(
                F.when(
                    F.col("__first").isNotNull(), 1.0 / F.col("__first")
                ).otherwise(0.0)
            ),
            round_to,
        ).alias("mrr"),
    )


def topk_eval(
    df: DataFrame,
    query_col: str,
    score_col: str,
    label_col: str,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Precision@k / recall@k / hit-rate@k macro-averaged over queries →
    one row (n_queries, p_at_k, r_at_k, hit_rate): per query, take the
    top ``k`` by score and count relevant docs among them; P@k divides by
    min(k, candidates), R@k by the query's total relevant count (queries
    with NO relevant docs are excluded from R@k's average but count in
    P@k and hit_rate — the trec_eval convention), hit_rate is the share
    of queries with ≥ 1 relevant in the top k. The retrieval trio a
    recall-oriented ANN rollout reports next to ``ndcg_at_k``/``mrr``.
    Null/NaN scores and null labels are excluded.

    Plan: one query-partitioned top-k window (WindowGroupLimit pushes the
    rank filter below the sort) + per-query aggregates + one global
    average — partitioned everywhere, any corpus size.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lab = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    base = df.filter(
        s.isNotNull() & ~F.isnan(s) & lab.isNotNull()
    ).select(F.col(query_col).alias("__q"), s.alias("__s"), lab.alias("__y"))
    totals = base.groupBy("__q").agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("__y").alias("__n_rel"),
    )
    w = Window.partitionBy("__q").orderBy(F.desc("__s"))
    top = (
        base.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .groupBy("__q")
        .agg(F.sum("__y").alias("__hits"), F.count(F.lit(1)).alias("__kq"))
    )
    per_q = totals.join(top, "__q")
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg(F.col("__hits") / F.col("__kq")), round_to).alias("p_at_k"),
        F.round(
            F.avg(
                F.when(
                    F.col("__n_rel") > 0, F.col("__hits") / F.col("__n_rel")
                )
            ),
            round_to,
        ).alias("r_at_k"),
        F.round(
            F.avg((F.col("__hits") > 0).cast("double")), round_to
        ).alias("hit_rate"),
    )


def classifier_report(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Binary-classifier confusion report per group → group_cols + (n, tp,
    fp, fn, tn, precision, recall, f1, balanced_accuracy, mcc): the basics
    every eval harness prints —

        MCC = (TP·TN − FP·FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN))

    (the single-number summary that, unlike accuracy or F1, stays honest
    on imbalanced labels), balanced accuracy = (TPR + TNR)/2, and the
    P/R/F1 trio. NULL for a ratio whose denominator is 0 (e.g. precision
    with no positive predictions) — the sklearn zero_division=NaN
    convention, kept NULL rather than 0 so a degenerate group is visible.
    Predictions/labels are 0/1-castable; null rows excluded.

    Plan: ONE conditional grouped aggregate; every derived metric is
    map-side algebra on the four cells. MCC's product is computed in
    DOUBLE from the start (the integer product overflows BIGINT near
    n ≈ 10⁵ per group — at 100 TB the cells are ~10¹⁰ and the product
    ~10⁴⁰).
    """
    groups = list(group_cols or [])
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    base = df.filter(y.isNotNull() & p.isNotNull()).select(
        *groups, p.alias("__p"), y.alias("__y")
    )
    agg = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(((F.col("__p") == 1) & (F.col("__y") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("__p") == 1) & (F.col("__y") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("__p") == 0) & (F.col("__y") == 1)).cast("long")).alias("fn"),
        F.sum(((F.col("__p") == 0) & (F.col("__y") == 0)).cast("long")).alias("tn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    tn = F.col("tn").cast("double")
    prec = F.try_divide(tp, tp + fp)
    rec = F.try_divide(tp, tp + fn)
    tnr = F.try_divide(tn, tn + fp)
    f1 = F.try_divide(2.0 * tp, 2.0 * tp + fp + fn)
    mcc_den = F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    mcc = F.when(mcc_den > 0, (tp * tn - fp * fn) / mcc_den)
    return agg.select(
        *groups,
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
        F.round((rec + tnr) / 2.0, round_to).alias("balanced_accuracy"),
        F.round(mcc, round_to).alias("mcc"),
    )


def log_loss(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    eps: float = 1e-15,
    round_to: int = 6,
) -> DataFrame:
    """Binary cross-entropy / log-loss per group → group_cols + (n,
    logloss): mean of −[y·ln(p) + (1−y)·ln(1−p)] with probabilities
    clamped to [eps, 1−eps] (sklearn's convention — an unclamped p = 0
    against y = 1 is infinite and poisons the mean) — THE proper scoring
    rule to track next to ``brier_decomposition``: Brier is bounded and
    decomposable, log-loss punishes confident wrongness hardest (what a
    quality-classifier regression actually costs downstream). Rows with
    score outside [0, 1], null/NaN score, or null label are excluded.

    Plan: one map-side clamp + ONE grouped average — no window, no join.
    """
    if not 0.0 < eps < 0.5:
        raise ValueError(f"eps must be in (0, 0.5), got {eps}")
    groups = list(group_cols or [])
    p = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(
        p.isNotNull() & ~F.isnan(p) & (p >= 0.0) & (p <= 1.0) & y.isNotNull()
    ).select(
        *groups,
        F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps)).alias("__p"),
        y.alias("__y"),
    )
    return base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            -F.avg(
                F.col("__y") * F.log("__p")
                + (1.0 - F.col("__y")) * F.log(1.0 - F.col("__p"))
            ),
            round_to,
        ).alias("logloss"),
    )


def youden_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    bins: int | None = None,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Optimal decision threshold per group by Youden's J (Youden 1950) →
    group_cols + (n_pos, n_neg, threshold, j_stat, tpr, fpr): the score
    cut maximizing J = TPR − FPR over all distinct thresholds — where to
    SET the quality-filter knob once ``roc_auc`` says the scores rank
    well (J is the ROC point farthest above the diagonal; prevalence-free
    where an accuracy-maximizing cut is not). Threshold semantics:
    predict positive when score ≥ threshold. Deterministic tie-break:
    the LOWEST threshold attaining the maximal J (keeps more recall).
    NULL when the group lacks both classes. Same scale controls as
    roc_auc (``bins`` / ``max_distinct`` via the shared per-score base).

    Plan: the roc_auc per-score table + one descending cumulative window
    (TP/FP at each cut) + one max-struct aggregate — no per-row ranking.
    """
    groups = list(group_cols or [])
    per_score = _per_score_counts(
        df, score_col, label_col, groups, bins, max_distinct, "youden_threshold"
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*groups) if groups else Window.partitionBy()
    cum = per_score.select(
        *groups,
        "s",
        F.sum("p").over(w).alias("__ctp"),
        F.sum("n").over(w).alias("__cfp"),
        F.sum("p").over(wt).alias("__P"),
        F.sum("n").over(wt).alias("__N"),
    )
    j = F.try_divide("__ctp", "__P") - F.try_divide("__cfp", "__N")
    scored = cum.select(
        *groups,
        "__P",
        "__N",
        # max_by over (J, then LOWEST threshold): struct ordering compares
        # fields in sequence, so negate s to prefer the smaller threshold
        F.struct(
            j.alias("j"),
            (-F.col("s")).alias("neg_s"),
            F.col("s").alias("s"),
            F.try_divide("__ctp", "__P").alias("tpr"),
            F.try_divide("__cfp", "__N").alias("fpr"),
        ).alias("__cand"),
    )
    agg = scored.groupBy(*groups).agg(
        F.max("__P").cast("long").alias("n_pos"),
        F.max("__N").cast("long").alias("n_neg"),
        F.max("__cand").alias("__best"),
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        *groups,
        "n_pos",
        "n_neg",
        F.when(ok, F.round(F.col("__best.s"), round_to)).alias("threshold"),
        F.when(ok, F.round(F.col("__best.j"), round_to)).alias("j_stat"),
        F.when(ok, F.round(F.col("__best.tpr"), round_to)).alias("tpr"),
        F.when(ok, F.round(F.col("__best.fpr"), round_to)).alias("fpr"),
    )


def bland_altman(
    df: DataFrame,
    score_a: str,
    score_b: str,
    group_cols: list[str] | None = None,
    agreement_z: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """Bland-Altman agreement analysis between two raters/scorers (Bland
    & Altman 1986) per group → (group_cols..., n, bias, sd_diff, loa_low,
    loa_high, within_loa):

        d_i        = a_i − b_i                 (per item)
        bias       = mean(d),  sd_diff = stddev_samp(d)
        LoA        = bias ± z · sd_diff        (z = 1.96 → 95% limits)
        within_loa = fraction of items inside [loa_low, loa_high]

    The method-comparison read for two quality scorers / two annotation
    models: correlation ([lin_ccc], Pearson) can be high while the
    scorers disagree systematically; bias + limits-of-agreement show the
    disagreement in the score's own units.

    Plan: one grouped aggregate for the moments; the within-LoA coverage
    is algebra over the SAME aggregate — d is inside bias ± z·sd iff
    |d − mean| ≤ z·sd, and counting that without a second corpus pass
    rides sum((d − mean)² ≤ (z·sd)²)… which needs d per row again, so the
    coverage count is ONE more grouped aggregate over a broadcast join of
    the per-group moments — two corpus scans total, no window, no Python.
    Null/NaN pairs are excluded.
    """
    groups = list(group_cols or [])
    a = F.col(score_a).cast("double")
    b = F.col(score_b).cast("double")
    base = df.filter(
        a.isNotNull() & b.isNotNull() & ~F.isnan(a) & ~F.isnan(b)
    ).select(*groups, (a - b).alias("__d"))
    mom = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__d").alias("__mean"),
        F.stddev_samp("__d").alias("__sd"),
    )
    lo = F.col("__mean") - agreement_z * F.col("__sd")
    hi = F.col("__mean") + agreement_z * F.col("__sd")
    lim = mom.select(*groups, "__n", "__mean", "__sd", lo.alias("__lo"), hi.alias("__hi"))
    joined = (
        base.join(F.broadcast(lim), groups)
        if groups
        else base.crossJoin(F.broadcast(lim))
    )
    cov = joined.groupBy(*groups).agg(
        F.avg(
            (
                (F.col("__d") >= F.col("__lo")) & (F.col("__d") <= F.col("__hi"))
            ).cast("double")
        ).alias("__cov")
    )
    out = lim.join(cov, groups) if groups else lim.crossJoin(F.broadcast(cov))
    return out.select(
        *groups,
        F.col("__n").cast("long").alias("n"),
        F.round("__mean", round_to).alias("bias"),
        F.round("__sd", round_to).alias("sd_diff"),
        F.round("__lo", round_to).alias("loa_low"),
        F.round("__hi", round_to).alias("loa_high"),
        F.round("__cov", round_to).alias("within_loa"),
    ).orderBy(*groups) if groups else out.select(
        F.col("__n").cast("long").alias("n"),
        F.round("__mean", round_to).alias("bias"),
        F.round("__sd", round_to).alias("sd_diff"),
        F.round("__lo", round_to).alias("loa_low"),
        F.round("__hi", round_to).alias("loa_high"),
        F.round("__cov", round_to).alias("within_loa"),
    )
