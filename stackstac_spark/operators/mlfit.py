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

__all__ = ["logistic_fit", "naive_bayes_classify"]


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
    doctok = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    ctab = toks.groupBy("y", "tok").agg(F.count(F.lit(1)).alias("cnt"))
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
