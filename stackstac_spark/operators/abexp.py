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

__all__ = ["cuped_adjust", "ratio_metric_ci"]


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
