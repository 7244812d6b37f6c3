"""Experimentation analytics — the variance-reduction and ratio-metric
layer on top of the assignment/readout gates (ab_test, abtt, hash_split):
CUPED covariate adjustment (Deng, Xu, Kohavi & Walker, WSDM 2013) and the
delta-method confidence interval for ratio metrics (clicks/views per user,
revenue/session), the two techniques every mature A/B platform applies
before reading a result.

Both are closed-form moment algebra: the corpus collapses to per-unit
sums, then to per-arm covariance aggregates — the same
moments-then-algebra shape as ols_multi, and the right one at any scale.

No reference counterpart (gjoseph92/stackstac has no analytics layer);
part of the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cuped_adjust", "ratio_metric_ci", "srm_check", "mde_report", "ucb_scores"]


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    arm_col: str,
    round_to: int = 6,
) -> DataFrame:
    """CUPED-adjusted arm means (Deng et al. 2013) → one row per arm:
    (arm, n, mean_raw, mean_adj, theta, rho2, var_reduction):

        θ        = cov(y, x) / var(x)           (pooled, all arms)
        ŷ_arm    = ȳ_arm − θ·(x̄_arm − x̄_pool)
        ρ²       = cor(y, x)²  = var_reduction   (the fraction of metric
                                                  variance the covariate
                                                  removes)

    x is a PRE-experiment covariate (last month's activity, pre-period
    value of the same metric) — uncorrelated with assignment by
    construction, so the adjustment shrinks variance without biasing the
    arm contrast. A ρ² of 0.3 cuts the needed sample size by 30%; the
    same experiment reads significant a week earlier.

    Plan: one pooled covariance aggregate + one per-arm moment aggregate
    + broadcast algebra — two passes over the unit table (which is
    already an aggregate of the corpus), no window, no Python. Units
    with NULL/NaN metric or covariate are excluded from both passes.
    """
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    base = df.filter(
        y.isNotNull() & ~F.isnan(y) & x.isNotNull() & ~F.isnan(x)
        & F.col(arm_col).isNotNull()
    ).select(F.col(arm_col).alias("__arm"), y.alias("__y"), x.alias("__x"))
    pooled = base.agg(
        F.covar_samp("__y", "__x").alias("__cxy"),
        F.var_samp("__x").alias("__vx"),
        F.var_samp("__y").alias("__vy"),
        F.avg("__x").alias("__mx_pool"),
    )
    per_arm = base.groupBy("__arm").agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__y").alias("__my"),
        F.avg("__x").alias("__mx"),
    )
    j = (
        per_arm.withColumn("__k", F.lit(1))
        .join(F.broadcast(pooled.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    theta = F.try_divide(F.col("__cxy"), F.col("__vx"))
    rho2 = F.try_divide(
        F.col("__cxy") * F.col("__cxy"), F.col("__vx") * F.col("__vy")
    )
    adj = F.col("__my") - theta * (F.col("__mx") - F.col("__mx_pool"))
    return j.select(
        F.col("__arm").alias("arm"),
        F.col("__n").cast("long").alias("n"),
        F.round("__my", round_to).alias("mean_raw"),
        F.round(adj, round_to).alias("mean_adj"),
        F.round(theta, round_to).alias("theta"),
        F.round(rho2, round_to).alias("rho2"),
        F.round(rho2, round_to).alias("var_reduction"),
    ).orderBy("arm")


def ratio_metric_ci(
    df: DataFrame,
    num_col: str,
    den_col: str,
    unit_col: str,
    arm_col: str,
    z: float = 1.959964,
    round_to: int = 6,
) -> DataFrame:
    """Delta-method confidence interval for a per-arm RATIO metric
    (clicks/views, revenue/sessions) with the unit of randomization as
    the unit of analysis → one row per arm: (arm, n_units, ratio, se,
    ci_low, ci_high):

        R       = Σ_units num / Σ_units den
        Var(R) ≈ [var(n_u) − 2R·cov(n_u, d_u) + R²·var(d_u)]
                 / (n · d̄²)                     (delta method)

    The fix for the classic experimentation bug: averaging per-event
    rates (or treating events as independent) understates the variance
    whenever events cluster within users — which they always do. Summing
    to the randomization unit FIRST and delta-methoding the ratio of
    sums is the standard correction (Deng, Knoblich & Lu, KDD 2018).

    Plan: one (unit, arm) sum aggregate (the corpus pass), one per-arm
    moment aggregate, closed-form algebra. NULL interval when an arm has
    < 2 units or a zero denominator mean.
    """
    n_ = F.col(num_col).cast("double")
    d_ = F.col(den_col).cast("double")
    per_unit = (
        df.filter(
            F.col(unit_col).isNotNull() & F.col(arm_col).isNotNull()
        )
        .groupBy(F.col(arm_col).alias("__arm"), F.col(unit_col).alias("__u"))
        .agg(
            F.sum(F.coalesce(n_, F.lit(0.0))).alias("__nu"),
            F.sum(F.coalesce(d_, F.lit(0.0))).alias("__du"),
        )
    )
    mom = per_unit.groupBy("__arm").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__nu").alias("__sn"),
        F.sum("__du").alias("__sd"),
        F.avg("__du").alias("__md"),
        F.var_samp("__nu").alias("__vn"),
        F.var_samp("__du").alias("__vd"),
        F.covar_samp("__nu", "__du").alias("__cnd"),
    )
    r = F.try_divide(F.col("__sn"), F.col("__sd"))
    var_r = F.try_divide(
        F.col("__vn") - 2.0 * r * F.col("__cnd") + r * r * F.col("__vd"),
        F.col("__n") * F.col("__md") * F.col("__md"),
    )
    ok = (F.col("__n") >= 2) & (F.col("__md") != 0) & (var_r >= 0)
    se = F.sqrt(var_r)
    return mom.select(
        F.col("__arm").alias("arm"),
        F.col("__n").cast("long").alias("n_units"),
        F.round(r, round_to).alias("ratio"),
        F.when(ok, F.round(se, round_to)).alias("se"),
        F.when(ok, F.round(r - z * se, round_to)).alias("ci_low"),
        F.when(ok, F.round(r + z * se, round_to)).alias("ci_high"),
    ).orderBy("arm")


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected: dict | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Sample-ratio-mismatch check (the first health gate of every A/B
    readout) → one row per arm + the shared χ² statistic: (arm, n,
    expected_n, chi2) with

        χ² = Σ_arms (o_a − e_a)² / e_a        ~ χ²(k−1) under the design

    where e_a comes from ``expected`` ({arm: weight}, normalized) or
    equal split when omitted. A significant SRM means the assignment or
    logging pipeline is dropping users NON-randomly — every downstream
    metric read is invalid until it's explained (Fabijan et al. 2019's
    diagnosis taxonomy). Distinct from [uniformity_gof]: arms carry
    DESIGNED unequal weights (90/10 holdouts), and the per-arm
    observed-vs-expected rows are the diagnostic payload.

    Plan: one arm-count aggregate joined against the broadcast expected
    table; the χ² scalar is folded back onto every row. Unknown arms
    (observed but not in ``expected``) raise — a typo'd arm label IS an
    SRM bug.
    """
    base = df.filter(F.col(arm_col).isNotNull()).select(
        F.col(arm_col).cast("string").alias("__arm")
    )
    counts = base.groupBy("__arm").agg(F.count(F.lit(1)).alias("__o")).localCheckpoint()
    arms = [r["__arm"] for r in counts.select("__arm").collect()]
    if expected is None:
        weights = {a: 1.0 for a in arms}
    else:
        weights = {str(k): float(v) for k, v in expected.items()}
        unknown = sorted(set(arms) - set(weights))
        if unknown:
            raise ValueError(
                f"srm_check: observed arms not in expected: {unknown} — "
                "a mislabeled arm is itself a sample-ratio bug."
            )
    wtot = sum(weights.values())
    spark = df.sparkSession
    from stackstac_spark.session import local_df
    from pyspark.sql import types as T

    wdf = local_df(
        spark,
        [(a, w / wtot) for a, w in weights.items()],
        T.StructType(
            [T.StructField("__arm", T.StringType()), T.StructField("__w", T.DoubleType())]
        ),
    )
    j = F.broadcast(wdf).join(counts, "__arm", "left").select(
        "__arm", F.coalesce("__o", F.lit(0)).alias("__o"), "__w"
    ).localCheckpoint()
    tot = j.groupBy().agg(F.sum("__o").alias("__n"))
    with_e = (
        j.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
        .select(
            "__arm", "__o", (F.col("__w") * F.col("__n")).alias("__e")
        )
    )
    chi = with_e.groupBy().agg(
        F.sum(
            F.pow(F.col("__o") - F.col("__e"), F.lit(2.0)) / F.col("__e")
        ).alias("__chi2")
    )
    out = (
        with_e.withColumn("__k", F.lit(1))
        .join(F.broadcast(chi.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    return out.select(
        F.col("__arm").alias("arm"),
        F.col("__o").cast("long").alias("n"),
        F.round("__e", round_to).alias("expected_n"),
        F.round("__chi2", round_to).alias("chi2"),
    ).orderBy("arm")


def mde_report(
    df: DataFrame,
    converted_col: str,
    arm_col: str,
    alpha_z: float = 1.959964,
    power_z: float = 0.841621,
    round_to: int = 6,
) -> DataFrame:
    """Minimum detectable effect of the RUNNING experiment, per arm pair
    → one row per unordered arm pair: (arm_a, arm_b, n_a, n_b, p_pool,
    mde_abs, mde_rel):

        mde_abs = (z_{α/2} + z_power) · √(p̄(1−p̄)(1/n_a + 1/n_b))

    (the standard two-proportion approximation at 80% power / 5% two-
    sided α by default; p̄ = pooled conversion). The "is this test even
    capable of seeing what we care about?" readout — an experiment whose
    MDE is 5% relative cannot adjudicate a 1% hypothesis no matter how
    long you stare at its p-value.

    Plan: one arm aggregate, one broadcast self-pair of the k-row arm
    table, closed-form algebra. NULL when a pooled rate is 0 or 1.
    """
    c = (F.col(converted_col).cast("double") != 0).cast("int")
    base = df.filter(
        F.col(arm_col).isNotNull() & F.col(converted_col).isNotNull()
    ).select(F.col(arm_col).cast("string").alias("__arm"), c.alias("__c"))
    arms = base.groupBy("__arm").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__c").alias("__x")
    )
    a = arms.select(
        F.col("__arm").alias("__aa"), F.col("__n").alias("__na"),
        F.col("__x").alias("__xa"),
    )
    b = arms.select(
        F.col("__arm").alias("__ab"), F.col("__n").alias("__nb"),
        F.col("__x").alias("__xb"),
    )
    pairs = (
        a.withColumn("__k", F.lit(1))
        .join(F.broadcast(b.withColumn("__k", F.lit(1))), "__k")
        .filter(F.col("__aa") < F.col("__ab"))
        .drop("__k")
    )
    na, nb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    pp = (F.col("__xa") + F.col("__xb")) / (na + nb)
    mde = (alpha_z + power_z) * F.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    ok = (pp > 0) & (pp < 1)
    return pairs.select(
        F.col("__aa").alias("arm_a"),
        F.col("__ab").alias("arm_b"),
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        F.round(pp, round_to).alias("p_pool"),
        F.when(ok, F.round(mde, round_to)).alias("mde_abs"),
        F.when(ok, F.round(F.try_divide(mde, pp), round_to)).alias("mde_rel"),
    ).orderBy("arm_a", "arm_b")


def ucb_scores(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    c: float = 1.414214,
    round_to: int = 6,
) -> DataFrame:
    """UCB1 allocation scores over logged arm rewards (Auer,
    Cesa-Bianchi & Fischer 2002) → one row per arm: (arm, n_pulls,
    mean_reward, bonus, ucb, play_next):

        UCB(a) = x̄_a + c·√(ln N / n_a)          (c = √2 classically)

    ``play_next`` marks the argmax — the arm a UCB1 bandit would pull
    next given exactly this history. The deterministic adaptive-
    allocation companion to the fixed-split readouts ([ab_test],
    [mde_report]): when arms are many and traffic is scarce (prompt
    variants, ranker configs), UCB spends samples where the confidence
    bonus says uncertainty still pays. Ties → arm name order.

    Plan: one arm aggregate + a broadcast total; the argmax rides a
    k-row window. Null rewards are excluded (an unlogged reward is not
    a zero reward).
    """
    r = F.col(reward_col).cast("double")
    base = df.filter(
        F.col(arm_col).isNotNull() & r.isNotNull() & ~F.isnan(r)
    ).select(F.col(arm_col).cast("string").alias("__arm"), r.alias("__r"))
    arms = base.groupBy("__arm").agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__r").alias("__m")
    )
    tot = arms.groupBy().agg(F.sum("__n").alias("__nn"))
    j = (
        arms.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    bonus = F.lit(c) * F.sqrt(
        F.log(F.col("__nn").cast("double")) / F.col("__n").cast("double")
    )
    scored = j.select(
        "__arm",
        "__n",
        "__m",
        bonus.alias("__b"),
        (F.col("__m") + bonus).alias("__u"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(F.round(F.col("__u"), round_to)), F.asc("__arm"))
    return scored.select(
        F.col("__arm").alias("arm"),
        F.col("__n").cast("long").alias("n_pulls"),
        F.round("__m", round_to).alias("mean_reward"),
        F.round("__b", round_to).alias("bonus"),
        F.round("__u", round_to).alias("ucb"),
        (F.row_number().over(w) == 1).alias("play_next"),
    ).orderBy("arm")
