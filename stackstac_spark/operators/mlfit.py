"""Distributed model fitting with engine-replayable arithmetic.

Training-data pipelines train small models ON the corpus as pipeline
steps — the canonical example is a fastText/logistic quality classifier
(GPT-3's WebText-vs-CommonCrawl filter; CCNet's LM filter). This module
fits such models Spark-first:

- :func:`logistic_fit` — batch-gradient-descent logistic regression with a
  FIXED iteration count and per-step rounding. Each step is ONE map-side-
  combined aggregate over the corpus producing the d-dimensional gradient
  (d small — the weights live on the driver, like k-means centroids); no
  per-row Python, no MLlib dependency. The fixed order + rounding make
  every step exactly replayable by an external SQL engine as an unrolled
  CTE chain — the same verification contract as k-means / PageRank /
  PCA-power / label propagation / k-center here.

At 100 TB: one gradient pass is a full corpus scan with a d-wide partial
aggregate (bytes shuffled = d doubles per partition); k steps = k scans.
That IS batch GD's cost model — for fewer passes use fewer, larger steps
or fit on a uniform sample (the quality-classifier corpora in the papers
are samples anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "logistic_fit",
    "naive_bayes_classify",
    "cusum_changepoints",
    "conformal_interval",
    "target_encode",
    "isotonic_calibrate",
    "label_noise_flags",
    "quantile_match",
    "dataset_cartography",
    "ols_multi",
    "mahalanobis_outliers",
    "one_rule",
    "info_split",
]


def logistic_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.1,
    grad_round: int = 6,
    w_round: int = 6,
) -> list[tuple]:
    """Fit ``sigmoid(w · [1, features...])`` to a 0/1 label by batch GD.

    Returns the per-step weight history
    ``[(step, w_0 .. w_d), ...]`` (step 0 = the all-zero init; the last
    entry is the fitted model). Gradients are averaged over the corpus,
    rounded to ``grad_round`` BEFORE the update, and weights rounded to
    ``w_round`` after it — both in this engine and in any replaying
    engine, so cross-engine float drift cannot compound across steps.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    feats = ["__one"] + list(feature_cols)
    base = df.select(
        F.lit(1.0).alias("__one"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    d = len(feats)
    w = [0.0] * d
    history = [(0, *w)]
    n = None
    for step in range(1, iters + 1):
        z: Column = sum(
            (F.col(c) * F.lit(w[j]) for j, c in enumerate(feats)),
            F.lit(0.0),
        )
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("__y")).alias("__r")
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(F.col("__r") * F.col(c)).alias(f"g{j}") for j, c in enumerate(feats)
        ]
        row = base.select(*feats, "__y", resid).agg(*aggs).first()
        n = n or int(row["__n"])
        if n == 0:
            raise ValueError("logistic_fit: empty input")
        grads = [round(float(row[f"g{j}"]) / n, grad_round) for j in range(d)]
        w = [round(w[j] - lr * grads[j], w_round) for j in range(d)]
        history.append((step, *w))
    return history


def logistic_fit_df(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.1,
    grad_round: int = 6,
    w_round: int = 6,
) -> DataFrame:
    """:func:`logistic_fit` with the weight history as a DataFrame
    (step, w0..wd) — the shape the correctness gate consumes."""
    hist = logistic_fit(
        df, feature_cols, label_col, iters=iters, lr=lr,
        grad_round=grad_round, w_round=w_round,
    )
    d = len(feature_cols) + 1
    schema = "step int, " + ", ".join(f"w{j} double" for j in range(d))
    from stackstac_spark.session import local_df
    from pyspark.sql import types as T

    st = T.StructType(
        [T.StructField("step", T.IntegerType())]
        + [T.StructField(f"w{j}", T.DoubleType()) for j in range(d)]
    )
    return local_df(df.sparkSession, hist, st)


def naive_bayes_classify(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """Multinomial Naive Bayes over whitespace tokens: train per-class
    token likelihoods with Laplace smoothing ``alpha`` and score every
    document, returning (id, label, pred, logp) — the classic supervised
    companion to the logistic quality filter (a fastText-style label
    classifier trained ON the corpus as a pipeline step).

    Sparse formulation (the 100 TB shape): with L_c = ln(α/(tot_c+αV))
    the per-class score is

        score(d, c) = ln(N_c/N) + T_d·L_c + Σ_{t∈d} tf_t·ln((cnt_{c,t}+α)/α)

    so the only corpus-sized join is (doc, token)⋈(class, token) on the
    token counts that EXIST — no dense vocab×class table is ever built
    (missing (class, token) pairs contribute exactly through the T_d·L_c
    term). Shuffles: one token-keyed count (train), one token-keyed join +
    (doc, class) agg (score), one per-doc argmax window. Every ln() input
    is a ratio of exact integers, so an external engine replays the
    arithmetic; the argmax tie-breaks on (round(score, 6) desc, class asc)
    to pin fp-order ambiguity.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("y"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    )
    # materialize the two COUNT tables once (optimization r12): doctok
    # feeds the scoring join AND the per-doc totals; ctab feeds the
    # vocabulary count (eager), the class totals, and the scoring join —
    # each consumer otherwise re-ran the corpus explode (~5 passes; now
    # exactly two, one per count table). The raw token stream itself is
    # deliberately not cached (guide §5 — the aggregates are the compact
    # sufficient statistics).
    doctok = toks.groupBy("id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint()  # EAGER (second pass): the scoring join and the
    # per-doc totals consume it concurrently in one job; ctab below stays
    # lazy because the v_size count materializes it sequentially first
    ctab = toks.groupBy("y", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=False)
    v_size = ctab.select("tok").distinct().count()
    stats = (
        ctab.groupBy("y")
        .agg(F.sum("cnt").alias("tot"))
        .join(
            df.groupBy(F.col(label_col).alias("y")).agg(
                F.count(F.lit(1)).alias("n_docs")
            ),
            "y",
        )
    )
    n_total = df.count()
    stats = stats.select(
        "y",
        F.log(F.col("n_docs") / F.lit(float(n_total))).alias("prior"),
        F.log(
            F.lit(alpha) / (F.col("tot").cast("double") + F.lit(alpha * v_size))
        ).alias("base_ll"),
    )
    contrib = (
        doctok.join(ctab, "tok")
        .groupBy("id", "y")
        .agg(
            F.sum(
                F.col("tf")
                * F.log((F.col("cnt").cast("double") + F.lit(alpha)) / F.lit(alpha))
            ).alias("s")
        )
    )
    t_doc = doctok.groupBy("id").agg(F.sum("tf").alias("t_d"))
    scored = (
        t_doc.crossJoin(F.broadcast(stats))
        .join(contrib, ["id", "y"], "left")
        .select(
            "id",
            "y",
            (
                F.col("prior")
                + F.col("t_d") * F.col("base_ll")
                + F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("y")
    )
    best = scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        best.select(
            F.col("id").alias(id_col),
            F.col("y").alias("pred"),
            F.round("score", round_to).alias("logp"),
        )
        .join(df.select(id_col, F.col(label_col).alias("actual")), id_col)
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 5.0,
    round_to: int = 6,
) -> DataFrame:
    """Two-sided CUSUM change-point screening (Page 1954) per stream:
    standardized deviations accumulate in upper/lower sums that reset at
    zero; a point is flagged when either exceeds ``h`` — the classic
    streaming drift detector (data-quality monitors, metric regression
    alarms) with per-key state of exactly two floats.

    Standardization uses the stream's OWN (mean, stddev) from exact
    Σv/Σv² sums — one tiny per-key moments aggregate broadcast back (the
    score_normalize shape, made engine-exact for integral inputs);
    ``k`` is the slack in σ units, ``h`` the decision threshold. The
    recursive sums S⁺/S⁻ ride ONE key-partitioned ordered window via a
    native ``aggregate`` fold over the collected per-key series — per-key
    series are window-frame-sized (a monitor tracks per-entity metrics,
    not the corpus; the fold is the applyInPandasWithState batch shape
    without Python). z-scores are rounded BEFORE the fold so the
    recursion is engine-replayable.

    Returns one row per flagged point: (key, order, value, z, s_hi, s_lo).
    """
    from pyspark.sql import Window

    # moments from raw Σv / Σv² — NOT stddev_pop: single-pass M2 updates are
    # partition-order-dependent in the last ulp, while plain sums of
    # INTEGRAL values are exact in double (< 2^53), making mu/sd — and the
    # whole recursion below — bit-identical on any engine. For non-integral
    # inputs this is the textbook formula with the usual cancellation
    # caveat; the rounded z then absorbs last-ulp noise as elsewhere.
    v = F.col(value_col).cast("double")
    stats = df.groupBy(key_col).agg(
        F.sum(v).alias("__s1"),
        F.sum(v * v).alias("__s2"),
        F.count(v).alias("__n"),
    )
    mu = F.col("__s1") / F.col("__n")
    sd = F.sqrt(F.greatest(F.col("__s2") / F.col("__n") - mu * mu, F.lit(0.0)))
    z = F.when(
        sd > 0, F.round((F.col(value_col) - mu) / sd, round_to)
    ).otherwise(F.lit(0.0))
    zed = df.join(F.broadcast(stats), key_col).withColumn("__z", z)
    # The recursion runs in INTEGER micro-units (z scaled by 1e6): the
    # rounded z is a 6-decimal multiple, so each fold step's ideal state is
    # one too — but re-rounding the float sum puts EVERY step exactly on a
    # .5e-6 decimal tie, where engines' round() disagree (the bitext
    # sum-vs-avg lesson, compounding per step here). Integers make every
    # step exact; there is nothing left to round.
    scale = 1_000_000
    ki, hi = int(round(k * scale)), int(round(h * scale))
    seq = (
        zed.groupBy(key_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(order_col).cast("long").alias("o"),
                        F.round(F.col("__z") * scale, 0).cast("long").alias("zi"),
                        F.col("__z").alias("z"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("pts")
        )
    )
    # a flagged point resets both sums (Page's restart-after-alarm
    # convention). Lambdas can't bind local names, so nh/nl appear inline
    # (the optimizer CSEs the repeats).
    nh = f"greatest(0L, acc.s_hi + p.zi - {ki}L)"
    nl = f"least(0L, acc.s_lo + p.zi + {ki}L)"
    alarm = f"({nh} > {hi}L OR {nl} < -{hi}L)"
    fold = F.expr(
        f"""
        aggregate(
          pts,
          named_struct(
            's_hi', 0L, 's_lo', 0L,
            'hits', CAST(array() AS array<struct<o:bigint,v:double,z:double,
                                                 s_hi:bigint,s_lo:bigint>>)),
          (acc, p) -> named_struct(
            's_hi', IF({alarm}, 0L, {nh}),
            's_lo', IF({alarm}, 0L, {nl}),
            'hits', IF({alarm},
                       array_append(acc.hits,
                                    named_struct('o', p.o, 'v', p.v, 'z', p.z,
                                                 's_hi', {nh}, 's_lo', {nl})),
                       acc.hits)),
          acc -> acc.hits
        )
        """
    )
    return seq.select(key_col, F.explode(fold).alias("hit")).select(
        key_col,
        F.col("hit.o").alias("order_val"),
        F.col("hit.v").alias("value"),
        F.col("hit.z").alias("z"),
        (F.col("hit.s_hi") / F.lit(float(scale))).alias("s_hi"),
        (F.col("hit.s_lo") / F.lit(float(scale))).alias("s_lo"),
    )


def conformal_interval(
    cal: DataFrame,
    test: DataFrame,
    y_col: str = "y",
    yhat_col: str = "yhat",
    alpha: float = 0.1,
    round_to: int = 6,
) -> DataFrame:
    """Split-conformal prediction intervals (Papadopoulos et al. 2002;
    Lei et al. 2018): given a CALIBRATION frame carrying actuals and
    predictions and a TEST frame carrying predictions, attach the
    distribution-free interval ``yhat ± q̂`` with finite-sample coverage
    ≥ 1−α, where q̂ is the ⌈(n_cal+1)(1−α)⌉-th smallest absolute
    calibration residual — an EXACT order statistic, not an interpolated
    quantile, so any engine replays it bit-for-bit (and the classic
    guarantee holds exactly).

    Plan: residuals are one map-only projection; the order statistic is
    a global sort LIMIT k + a 1-row tail (TakeOrdered — no full-sort
    materialization); the scalar q̂ broadcast-joins onto the test rows
    via a literal key. The calibration set is the only sorted thing, and
    at 100 TB calibration sets are samples by construction — the test
    side stays map-only.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    import math as _math

    # Null/NaN y or yhat yields a null/NaN residual; Spark sorts nulls FIRST
    # ascending, so without this filter they would occupy limit(k) slots
    # while inflating n_cal — q̂ silently computed from a wrong order
    # statistic. Conformal coverage is defined over scored calibration rows
    # only, so drop the unscorable ones before counting.
    resid = cal.select(
        F.abs(F.col(y_col).cast("double") - F.col(yhat_col).cast("double")).alias("__r")
    ).filter(F.col("__r").isNotNull() & ~F.isnan("__r"))
    n_cal = resid.count()
    if n_cal < 1:
        raise ValueError("calibration frame has no rows with non-null y and yhat")
    k = _math.ceil((n_cal + 1) * (1.0 - alpha))
    if k > n_cal:
        raise ValueError(
            f"alpha={alpha} needs more calibration rows: rank {k} > n_cal={n_cal}"
        )
    qhat = (
        resid.orderBy("__r")
        .limit(k)
        .agg(F.max("__r").alias("__qhat"))
        .withColumn("__k", F.lit(1))
    )
    return (
        test.withColumn("__k", F.lit(1))
        .join(F.broadcast(qhat), "__k")
        .drop("__k")
        .withColumn(
            "pi_lo", F.round(F.col(yhat_col).cast("double") - F.col("__qhat"), round_to)
        )
        .withColumn(
            "pi_hi", F.round(F.col(yhat_col).cast("double") + F.col("__qhat"), round_to)
        )
        .withColumn("qhat", F.round("__qhat", round_to))
        .drop("__qhat")
    )


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    fold_col: str,
    smoothing: float = 20.0,
    round_to: int = 6,
) -> DataFrame:
    """Leakage-free (out-of-fold) target encoding — the standard
    high-cardinality categorical feature for tabular models (Micci-
    Barreca 2001): each row's encoding is the SMOOTHED target mean of its
    category computed WITHOUT the row's own fold,

        enc = (s_cat − s_fold + m·prior) / (n_cat − n_fold + m)

    where prior is the global out-of-fold target mean and ``m`` the
    smoothing pseudo-count (categories unseen outside the fold collapse
    to the prior rather than NaN).

    Plan: one (category, fold) aggregate (the only pass over the data),
    one category rollup and one fold rollup derived FROM it (tiny), and
    two broadcast joins back onto the row stream — the encoding never
    shuffles the fact table. At 100 TB this is the textbook
    pre-aggregate-then-broadcast shape; nothing is per-row except the
    final map-side expression.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be positive, got {smoothing}")
    cf = (
        df.groupBy(category_col, fold_col)
        .agg(
            F.sum(F.col(target_col).cast("double")).alias("__s"),
            F.count(F.col(target_col)).alias("__n"),
        )
    )
    cat = cf.groupBy(category_col).agg(
        F.sum("__s").alias("__s_cat"), F.sum("__n").alias("__n_cat")
    )
    fold = cf.groupBy(fold_col).agg(
        F.sum("__s").alias("__s_fold_tot"), F.sum("__n").alias("__n_fold_tot")
    )
    tot = cf.agg(F.sum("__s").alias("__s_all"), F.sum("__n").alias("__n_all"))
    # out-of-fold prior per fold: (total - fold) means
    prior = (
        fold.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot.withColumn("__k", F.lit(1))), "__k")
        .select(
            fold_col,
            (
                (F.col("__s_all") - F.col("__s_fold_tot"))
                / (F.col("__n_all") - F.col("__n_fold_tot"))
            ).alias("__prior"),
        )
    )
    enc = (
        cf.join(F.broadcast(cat), category_col)
        .join(F.broadcast(prior), fold_col)
        .select(
            category_col,
            fold_col,
            F.round(
                (
                    F.col("__s_cat") - F.col("__s")
                    + F.lit(float(smoothing)) * F.col("__prior")
                )
                / (F.col("__n_cat") - F.col("__n") + F.lit(float(smoothing))),
                round_to,
            ).alias("target_enc"),
        )
    )
    return df.join(F.broadcast(enc), [category_col, fold_col], "left")


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 32,
    round_to: int = 6,
) -> DataFrame:
    """Isotonic (monotone) probability calibration via pool-adjacent-
    violators over equal-width score bins (Zadrozny & Elkan 2002 — the
    standard non-parametric calibrator when Platt's sigmoid is too rigid)
    → one row per NON-EMPTY bin: (bin, n, pos, mean_score, rate_raw,
    rate_iso) with rate_iso the isotonic fit of the per-bin positive
    rates weighted by bin counts.

    Scale shape: binning first is what makes isotonic regression a
    100 TB operator — the corpus pass is ONE global (min, max) aggregate
    broadcast back plus ONE per-bin aggregate (≤ ``bins`` rows); PAV then
    runs on the driver over that bounded table (the kmeans-centroid /
    quantile-bisect driver-plane pattern — state is O(bins), never
    O(rows)). Exact-replay contract: for 0/1 labels the pooled rates are
    ratios of exact integer sums, and PAV's pooled block averages equal
    the minimax identity max_{j<=i} min_{k>=i} avg(y[j..k]) — so an
    external SQL engine replays rate_iso bit-for-bit from the same bins
    without implementing PAV.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    rng = base.agg(F.min("__s").alias("lo"), F.max("__s").alias("hi"))
    binned = (
        base.withColumn("__k", F.lit(1))
        .join(F.broadcast(rng.withColumn("__k", F.lit(1))), "__k")
        .select(
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("__s") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / bins)
                    ).cast("int"),
                )
            )
            .alias("bin"),
            "__s",
            "__y",
        )
    )
    stats = (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("pos"),
            F.round(F.avg("__s"), round_to).alias("mean_score"),
        )
        .orderBy("bin")
        .collect()
    )
    if not stats:
        raise ValueError("isotonic_calibrate: no rows with non-null score and label")
    # PAV over the bounded bin table: pooled blocks carry exact (pos, n)
    # sums; a block merges with its left neighbor while its rate is lower
    blocks: list[list] = []  # [pos_sum, n_sum, members]
    for r in stats:
        blocks.append([float(r["pos"]), int(r["n"]), [r]])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):  # rate[-2] >= rate[-1] via cross-multiplication (exact for ints)
            p2, n2, m2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2].extend(m2)
    out = []
    for pos_sum, n_sum, members in blocks:
        for r in members:
            out.append(
                (
                    int(r["bin"]),
                    int(r["n"]),
                    float(r["pos"]),
                    float(r["mean_score"]),
                    pos_sum,
                    n_sum,
                )
            )
    from stackstac_spark.session import local_df

    raw = local_df(
        df.sparkSession,
        sorted(out),
        "bin INT, n BIGINT, pos DOUBLE, mean_score DOUBLE, "
        "pos_blk DOUBLE, n_blk BIGINT",
    )
    # final division + rounding ENGINE-side (Spark round = HALF_UP =
    # DuckDB; Python's round() is banker's and diverges at half-boundary
    # dyadics like 1/128) — the driver only pools exact sums
    return raw.select(
        "bin",
        "n",
        "pos",
        "mean_score",
        F.round(F.col("pos") / F.col("n"), round_to).alias("rate_raw"),
        F.round(F.col("pos_blk") / F.col("n_blk"), round_to).alias("rate_iso"),
    )


def label_noise_flags(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Confident-learning label-noise screen for a binary task (Northcutt
    et al. 2021, the class-conditional threshold form): with t₁ = mean
    P(y=1) over rows LABELED 1 and t₀ = mean P(y=0) over rows labeled 0,
    a row is flagged when the model is confidently out-of-class —
    labeled 0 with p ≥ t₁, or labeled 1 with (1−p) ≥ t₀. The standard
    pre-training sweep for mislabeled examples in a quality/toxicity/
    language label set; the flagged set is what goes to re-annotation.

    Returns the input columns + (t_hi, t_lo, noise_margin, flagged).
    ``noise_margin`` is how far past the class threshold the confident
    wrong-class probability sits (0 when not flagged).

    Plan: one 2-scalar aggregate over the corpus (the class-conditional
    means), broadcast back via a literal key, one map-only flag
    expression — no shuffle of the fact table at any scale.
    """
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("int")
    # thresholds ROUNDED before any comparison: the class-conditional
    # means carry last-ulp summation-order noise, and an unrounded
    # boundary compare could flag a row in one engine and not another
    thr = df.agg(
        F.round(F.avg(F.when(y == 1, p)), round_to).alias("t_hi"),
        F.round(F.avg(F.when(y == 0, 1.0 - p)), round_to).alias("t_lo"),
    ).withColumn("__k", F.lit(1))
    out = df.withColumn("__k", F.lit(1)).join(F.broadcast(thr), "__k").drop("__k")
    flagged = (
        ((y == 0) & (p >= F.col("t_hi"))) | ((y == 1) & ((1.0 - p) >= F.col("t_lo")))
    )
    margin = F.when(
        (y == 0) & (p >= F.col("t_hi")), p - F.col("t_hi")
    ).when(
        (y == 1) & ((1.0 - p) >= F.col("t_lo")), (1.0 - p) - F.col("t_lo")
    ).otherwise(F.lit(0.0))
    return out.select(
        "*",
        # When one class is absent from the calibration set (or p is null)
        # t_hi/t_lo is NULL and the comparison yields SQL NULL, not false —
        # three-valued logic that breaks consumers using ~flagged or
        # treating the column as boolean-complete. A row that cannot be
        # judged is not flagged: coalesce to false.
        F.coalesce(flagged, F.lit(False)).alias("flagged"),
        F.round(margin, round_to).alias("noise_margin"),
    )


def quantile_match(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ref_group,
    round_to: int = 6,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """Quantile normalization of every non-reference group onto the
    reference group's distribution → (group, x, n, x_matched): each
    distinct value x of a comparison group maps to the smallest reference
    value whose CDF reaches x's within-group CDF (the inverse-CDF /
    quantile-matching transform, right-continuous convention) — the
    classical cross-batch normalizer (microarray quantile normalization;
    histogram matching) for "make crawl B's quality scores comparable to
    crawl A's" without assuming a parametric shape. Output is the
    distinct-value mapping TABLE (join it back to rows to transform a
    corpus — the mapping, not the corpus, is the reusable artifact).
    Null/NaN values are excluded.

    Plan: per-(group, distinct value) counts + one cumulative window per
    group → group CDF; reference CDF replicated to each group
    (constant-key broadcast — the aggregated distinct table); the inverse
    lookup is the MERGE trick, not an inequality join: union the group's
    (p, x) points with the replicated reference (cdf, value) steps on the
    shared percentile axis, one ordered window per group takes the first
    reference value at or after each p — no BroadcastNestedLoopJoin, no
    cartesian. ``max_distinct`` fail-fasts raw continuous inputs (the
    spearman_rho contract).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    vals = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(group_col).alias("grp"), v.alias("x")
    )
    grp_counts = (
        vals.filter(F.col("grp") != ref_group)
        .groupBy("grp", "x")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ref_counts = (
        vals.filter(F.col("grp") == ref_group)
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if max_distinct is not None:
        # eager guard at construction (the spearman_rho policy); both
        # distinct-value tables are materialized first so the guard jobs
        # and the CDF windows share one corpus scan (optimization r12)
        grp_counts = grp_counts.localCheckpoint(eager=False)
        ref_counts = ref_counts.localCheckpoint(eager=False)
        worst = (
            grp_counts.groupBy("grp").count().agg(F.max("count").alias("m")).first()["m"]
        )
        worst = max(worst or 0, ref_counts.count())
        if worst > max_distinct:
            raise ValueError(
                f"quantile_match: a group has {worst} distinct values "
                f"(> max_distinct={max_distinct}); pre-round/bin the values "
                "or raise/disable the guard for discrete data."
            )
    wg = Window.partitionBy("grp").orderBy("x")
    wgt = Window.partitionBy("grp")
    g_cdf = grp_counts.select(
        "grp",
        "x",
        F.col("c").alias("n"),
        (F.sum("c").over(wg) / F.sum("c").over(wgt)).alias("p"),
    )
    wr = Window.orderBy("x")
    r_cdf = ref_counts.select(
        F.col("x").alias("ref_x"),
        (
            F.sum("c").over(wr.rowsBetween(Window.unboundedPreceding, 0))
            / F.sum("c").over(Window.partitionBy())
        ).alias("p"),
    )
    groups = grp_counts.select("grp").distinct()
    r_rep = groups.withColumn("__k", F.lit(1)).join(
        F.broadcast(r_cdf.withColumn("__k", F.lit(1))), "__k"
    ).drop("__k")
    # merge trick on the percentile axis: group points carry p and NULL
    # ref_x; reference steps carry (cdf, ref_x). Ordered by (p, is_ref
    # ASC) the group point sorts BEFORE a reference step at exactly its p,
    # so the forward-looking window (current row included) takes that step
    # (right-continuous inverse CDF); first non-null ref_x from here
    # forward is the matched value.
    merged = g_cdf.select(
        "grp", "x", "n", "p", F.lit(None).cast("double").alias("ref_x"),
        F.lit(0).alias("is_ref"),
    ).unionByName(
        r_rep.select(
            "grp",
            F.lit(None).cast("double").alias("x"),
            F.lit(None).cast("long").alias("n"),
            "p",
            "ref_x",
            F.lit(1).alias("is_ref"),
        )
    )
    order = [F.col("p").asc(), F.col("is_ref").asc()]
    w_fwd = (
        Window.partitionBy("grp")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # fallback for a group percentile ABOVE the reference max cdf (only
    # reachable through float round-off at p ≈ 1): the last reference
    # step behind it is the reference max — computed BEFORE the filter so
    # the backward window still sees reference rows
    w_bwd = (
        Window.partitionBy("grp")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = merged.withColumn(
        "x_matched",
        F.coalesce(
            F.first("ref_x", ignorenulls=True).over(w_fwd),
            F.last("ref_x", ignorenulls=True).over(w_bwd),
        ),
    ).filter(F.col("is_ref") == 0)
    return matched.select(
        F.col("grp").alias("group"),
        "x",
        F.col("n").cast("long").alias("n"),
        F.round("x_matched", round_to).alias("x_matched"),
    )


def dataset_cartography(
    df: DataFrame,
    example_col: str,
    epoch_col: str,
    prob_col: str,
    conf_hi: float = 0.7,
    conf_lo: float = 0.3,
    var_hi: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Dataset-cartography training-dynamics summary (Swayamdipta et al.
    2020) from a (example, epoch, P(true label)) table → one row per
    region: (region, n_examples, avg_confidence, avg_variability):
    confidence = mean over epochs of the true-label probability,
    variability = its population std; regions —

        easy_to_learn : confidence ≥ conf_hi and variability < var_hi
        hard_to_learn : confidence ≤ conf_lo and variability < var_hi
        ambiguous     : everything else (the high-variability band)

    — THE data-map triage for what to keep (ambiguous trains best), what
    to re-label (hard often = label noise; cross-check with
    ``label_noise_flags``), what to down-sample (easy). Input is the
    per-epoch prediction log a training run already writes. Null/NaN
    probabilities and null ids are excluded; an example needs ≥ 1 epoch.

    Plan: one (example) moments aggregate + one region rollup — two keyed
    shuffles, no window, embarrassingly scalable.
    """
    p = F.col(prob_col).cast("double")
    base = df.filter(
        p.isNotNull() & ~F.isnan(p)
        & F.col(example_col).isNotNull() & F.col(epoch_col).isNotNull()
    ).select(F.col(example_col).alias("__ex"), p.alias("__p"))
    per_ex = base.groupBy("__ex").agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__p").alias("__conf"),
        F.sum(F.col("__p") * F.col("__p")).alias("__q"),
    )
    var = F.col("__q") / F.col("__n") - F.col("__conf") * F.col("__conf")
    per_ex = per_ex.withColumn(
        "__var", F.sqrt(F.greatest(var, F.lit(0.0)))
    ).withColumn(
        "__region",
        F.when(
            (F.col("__conf") >= conf_hi) & (F.col("__var") < var_hi),
            F.lit("easy_to_learn"),
        )
        .when(
            (F.col("__conf") <= conf_lo) & (F.col("__var") < var_hi),
            F.lit("hard_to_learn"),
        )
        .otherwise(F.lit("ambiguous")),
    )
    return per_ex.groupBy(F.col("__region").alias("region")).agg(
        F.count(F.lit(1)).cast("long").alias("n_examples"),
        F.round(F.avg("__conf"), round_to).alias("avg_confidence"),
        F.round(F.avg("__var"), round_to).alias("avg_variability"),
    )


def ols_multi(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Two-feature OLS with intercept per group, solved in closed form
    from covariance aggregates → (group_cols..., n, b0, b1, b2, r2):

        [b1 b2]ᵀ = Σ⁻¹ c   with Σ = [[v11, v12], [v12, v22]],
                           c = [cov(x1,y), cov(x2,y)]
        b0 = ȳ − b1·x̄1 − b2·x̄2,
        R² = (b1·cov(x1,y) + b2·cov(x2,y)) / var(y)

    — the multivariate step past [ols_trend] (one regressor): length AND
    punctuation rate against quality, time AND payload against latency.
    This is THE scalable regression shape: the corpus collapses to nine
    moments in ONE aggregate (Spark's single-pass centered covariance
    update — numerically stable, no raw-power-sum cancellation) and the
    2×2 solve is closed-form algebra. NULL coefficients when the design
    is collinear (det ≤ 0 within float) or n < 3.

    For d ≫ 2 features the same pattern holds (d² covariance aggregates
    + a driver-side solve); the two-feature closed form is what an
    external SQL engine can replay exactly.
    """
    groups = list(group_cols or [])
    y = F.col(y_col).cast("double")
    x1 = F.col(x1_col).cast("double")
    x2 = F.col(x2_col).cast("double")
    base = df.filter(
        y.isNotNull() & ~F.isnan(y)
        & x1.isNotNull() & ~F.isnan(x1)
        & x2.isNotNull() & ~F.isnan(x2)
    ).select(*groups, y.alias("__y"), x1.alias("__x1"), x2.alias("__x2"))
    mom = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__y").alias("__my"),
        F.avg("__x1").alias("__m1"),
        F.avg("__x2").alias("__m2"),
        F.var_samp("__x1").alias("__v11"),
        F.var_samp("__x2").alias("__v22"),
        F.covar_samp("__x1", "__x2").alias("__v12"),
        F.covar_samp("__x1", "__y").alias("__c1"),
        F.covar_samp("__x2", "__y").alias("__c2"),
        F.var_samp("__y").alias("__vy"),
    )
    det = F.col("__v11") * F.col("__v22") - F.col("__v12") * F.col("__v12")
    b1 = (F.col("__v22") * F.col("__c1") - F.col("__v12") * F.col("__c2")) / det
    b2 = (F.col("__v11") * F.col("__c2") - F.col("__v12") * F.col("__c1")) / det
    b0 = F.col("__my") - b1 * F.col("__m1") - b2 * F.col("__m2")
    r2 = F.try_divide(b1 * F.col("__c1") + b2 * F.col("__c2"), F.col("__vy"))
    ok = (F.col("__n") >= 3) & (det > 0)
    out = mom.select(
        *groups,
        F.col("__n").cast("long").alias("n"),
        F.when(ok, F.round(b0, round_to)).alias("b0"),
        F.when(ok, F.round(b1, round_to)).alias("b1"),
        F.when(ok, F.round(b2, round_to)).alias("b2"),
        F.when(ok, F.round(r2, round_to)).alias("r2"),
    )
    return out.orderBy(*groups) if groups else out


def mahalanobis_outliers(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 13.815511,
    round_to: int = 6,
) -> DataFrame:
    """Bivariate Mahalanobis-distance outlier screen per group → the
    input columns + (mahal_d2), filtered to d² ≥ ``threshold`` (default
    = the χ²(2) 0.999 quantile):

        d²(x, y) = [ (x−x̄)²·v22 − 2(x−x̄)(y−ȳ)·v12 + (y−ȳ)²·v11 ] / det

    — the correlation-aware generalization of the per-column z-score
    screens ([grubbs_stat], [mad_outliers]): a point can be ordinary in
    x and in y yet wildly off the joint ellipse (long doc with tiny
    vocabulary; heavy user with zero purchases) — exactly the rows a
    univariate audit misses.

    Plan: one covariance aggregate per group (the ols_multi moments),
    broadcast back, one filter — two corpus scans, no window, no Python.
    Degenerate groups (det ≤ 0: constant or collinear columns) emit no
    rows (there is no joint ellipse to be outside of).
    """
    groups = list(group_cols or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    )
    mom = base.groupBy(*groups).agg(
        F.avg(x).alias("__mx"),
        F.avg(y).alias("__my"),
        F.var_samp(x).alias("__vxx"),
        F.var_samp(y).alias("__vyy"),
        F.covar_samp(x, y).alias("__vxy"),
    )
    joined = (
        base.join(F.broadcast(mom), groups)
        if groups
        else base.crossJoin(F.broadcast(mom))
    )
    det = F.col("__vxx") * F.col("__vyy") - F.col("__vxy") * F.col("__vxy")
    dx = x - F.col("__mx")
    dy = y - F.col("__my")
    d2 = (
        dx * dx * F.col("__vyy")
        - 2.0 * dx * dy * F.col("__vxy")
        + dy * dy * F.col("__vxx")
    ) / det
    return (
        joined.filter(det > 0)
        .select(*df.columns, F.round(d2, round_to).alias("mahal_d2"))
        .filter(F.col("mahal_d2") >= threshold)
    )


def one_rule(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """OneR baseline classifier (Holte 1993: "very simple classification
    rules perform surprisingly well") → one row per candidate feature:
    (feature, n_values, correct, accuracy, best) where each feature's
    rule predicts the majority label per feature value (ties → smallest
    label) and ``best`` marks the highest-accuracy feature (ties →
    feature name order).

    The sanity floor every trained quality classifier must beat — if
    [quality_logreg] barely outperforms the best single-feature rule,
    the extra features are not pulling weight. Also a leakage tripwire:
    a feature whose OneR accuracy is ~1.0 IS the label in disguise
    (the [leakage_audit] companion).

    Plan: per feature, one (value, label) count aggregate (map-side
    combined) + a value-keyed max_by majority pick — all |values|-sized
    after the scan; the per-feature passes union into one result. Null
    feature values form their own stratum (a real classifier must route
    them somewhere); null labels are excluded.
    """
    if not feature_cols:
        raise ValueError("one_rule: need at least one feature column")
    lbl = F.col(label_col)
    parts = []
    for feat in feature_cols:
        base = df.filter(lbl.isNotNull()).select(
            F.coalesce(F.col(feat).cast("string"), F.lit("__NULL__")).alias("__v"),
            lbl.cast("string").alias("__y"),
        )
        counts = base.groupBy("__v", "__y").agg(F.count(F.lit(1)).alias("__c"))
        parts.append((feat, counts))
    outs = []
    for feat, counts in parts:
        w_sum = counts.groupBy().agg(F.sum("__c").alias("__tot"))
        # deterministic majority per value: min_by over (-count, label)
        # — highest count wins, ties go to the smallest label
        best_per_v = counts.groupBy("__v").agg(
            F.min_by(
                F.struct(F.col("__c").alias("c"), F.col("__y").alias("y")),
                F.struct((-F.col("__c")).alias("nc"), F.col("__y").alias("y")),
            ).alias("__pick")
        )
        correct = best_per_v.agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum(F.col("__pick.c")).cast("long").alias("correct"),
        )
        row = (
            correct.withColumn("__k", F.lit(1))
            .join(F.broadcast(w_sum.withColumn("__k", F.lit(1))), "__k")
            .select(
                F.lit(feat).alias("feature"),
                "n_values",
                "correct",
                F.round(
                    F.col("correct") / F.col("__tot").cast("double"), round_to
                ).alias("accuracy"),
            )
        )
        outs.append(row)
    from pyspark.sql import Window

    allf = outs[0]
    for o in outs[1:]:
        allf = allf.unionByName(o)
    w = Window.orderBy(F.desc("accuracy"), F.asc("feature"))  # bounded: |features|
    return (
        allf.select("*", (F.row_number().over(w) == 1).alias("best"))
        .orderBy(F.desc("accuracy"), "feature")
    )


def info_split(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
    max_distinct: int | None = 100_000,
) -> DataFrame:
    """Entropy-optimal binary split of a numeric feature against a
    binary label per group (the MDLP/C4.5 threshold step, Fayyad &
    Irani 1993) → (group_cols..., n, threshold, h_parent, h_split,
    info_gain): the cut t maximizing

        gain(t) = H(label) − [w_≤·H(label | x ≤ t) + w_>·H(label | x > t)]

    (entropies in nats; threshold = the LARGEST feature value of the
    left side; ties → smallest threshold). The decision-stump
    discretizer: where to cut a quality score into keep/drop, a length
    into short/long — the information-optimal answer rather than a
    quantile guess, and the one_rule companion for numeric features.

    Plan: the binary_segment shape with entropy instead of SSE — one
    (group, value) class-count aggregate, one cumulative window over
    the bounded distinct-value axis (``max_distinct`` fail-fast), every
    candidate cut O(1) given prefix class counts, one min-pick. NULL
    columns when a group has < 2 distinct values or a single class.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    x = F.col(feature_col).cast("double")
    y = (F.col(label_col).cast("double") != 0).cast("int")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & F.col(label_col).isNotNull()
    ).select(*groups, x.alias("__x"), y.alias("__y"))
    per_v = base.groupBy(*groups, "__x").agg(
        F.sum("__y").alias("__p"),
        F.sum(1 - F.col("__y")).alias("__q"),
    )
    if max_distinct is not None:
        # share one corpus scan between guard and main plan (the
        # _per_score_counts pattern; optimization r12)
        per_v = per_v.localCheckpoint(eager=False)
        worst = (
            per_v.groupBy(*groups)
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_distinct:
            raise ValueError(
                f"info_split: a group has {worst} distinct feature values "
                f"(> max_distinct={max_distinct}); pre-bin the feature."
            )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, 0)
        if groups
        else Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*groups) if groups else Window.partitionBy()
    pre = per_v.select(
        *groups,
        "__x",
        F.sum("__p").over(w_cum).alias("__pl"),
        F.sum("__q").over(w_cum).alias("__ql"),
        F.sum("__p").over(w_tot).alias("__pt"),
        F.sum("__q").over(w_tot).alias("__qt"),
        F.count(F.lit(1)).over(w_tot).alias("__nv"),
    )

    def _h(p, q):
        # binary entropy of a (p, q) count pair in nats; 0-count terms
        # contribute 0 (the 0·ln 0 := 0 convention)
        tot = (p + q).cast("double")
        hp = F.when(p > 0, -(p / tot) * F.log(p / tot)).otherwise(F.lit(0.0))
        hq = F.when(q > 0, -(q / tot) * F.log(q / tot)).otherwise(F.lit(0.0))
        return hp + hq

    nl = (F.col("__pl") + F.col("__ql")).cast("double")
    nr = (F.col("__pt") - F.col("__pl") + F.col("__qt") - F.col("__ql")).cast(
        "double"
    )
    nt = (F.col("__pt") + F.col("__qt")).cast("double")
    h_left = _h(F.col("__pl"), F.col("__ql"))
    h_right = _h(
        F.col("__pt") - F.col("__pl"), F.col("__qt") - F.col("__ql")
    )
    h_split = (nl / nt) * h_left + (nr / nt) * h_right
    cand = pre.filter(nr > 0).select(
        *groups, "__x", "__pt", "__qt", "__nv", h_split.alias("__hs")
    )
    best = cand.groupBy(*groups).agg(
        F.max("__pt").alias("__pt"),
        F.max("__qt").alias("__qt"),
        F.max("__nv").alias("__nv"),
        F.min(F.struct(F.col("__hs").alias("h"), F.col("__x").alias("t"))).alias(
            "__b"
        ),
    )
    h_parent = _h(F.col("__pt"), F.col("__qt"))
    ok = (F.col("__nv") >= 2) & (F.col("__pt") > 0) & (F.col("__qt") > 0)
    out = best.select(
        *groups,
        (F.col("__pt") + F.col("__qt")).cast("long").alias("n"),
        F.when(ok, F.col("__b.t")).alias("threshold"),
        F.round(h_parent, round_to).alias("h_parent"),
        F.when(ok, F.round(F.col("__b.h"), round_to)).alias("h_split"),
        F.when(ok, F.round(h_parent - F.col("__b.h"), round_to)).alias(
            "info_gain"
        ),
    )
    return out.orderBy(*groups) if groups else out
