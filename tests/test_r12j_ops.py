"""Known-value tests for the r12 tenth sub-wave: two-feature OLS,
bivariate Mahalanobis outliers, OneR baseline (mlfit.py), weighted
quantiles (sketch.py), 2-D skyline (skyline.py)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_ols_multi_known(spark):
    from stackstac_spark.operators.mlfit import ols_multi

    random.seed(20)
    rows = []
    for _ in range(400):
        x1, x2 = random.gauss(0, 2), random.gauss(1, 3)
        yv = 1.5 + 2.0 * x1 - 0.7 * x2 + random.gauss(0, 0.5)
        rows.append((float(x1), float(x2), float(yv)))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = ols_multi(df, "y", "x1", "x2").first()
    X = np.column_stack(
        [np.ones(len(rows)), [a for a, _, _ in rows], [b for _, b, _ in rows]]
    )
    Y = np.array([c for _, _, c in rows])
    beta, _, _, _ = np.linalg.lstsq(X, Y, rcond=None)
    yhat = X @ beta
    r2 = 1 - ((Y - yhat) ** 2).sum() / ((Y - Y.mean()) ** 2).sum()
    assert r["n"] == 400
    assert r["b0"] == pytest.approx(beta[0], abs=1e-5)
    assert r["b1"] == pytest.approx(beta[1], abs=1e-5)
    assert r["b2"] == pytest.approx(beta[2], abs=1e-5)
    assert r["r2"] == pytest.approx(r2, abs=1e-5)
    # collinear design -> NULL coefficients, not garbage
    col = spark.createDataFrame(
        [(float(i), float(2 * i), float(i)) for i in range(10)],
        "x1 double, x2 double, y double",
    )
    rc = ols_multi(col, "y", "x1", "x2").first()
    assert rc["b1"] is None and rc["r2"] is None
    # grouped path agrees with per-group filtering
    g = df.withColumn("g", (F.col("x1") > 0).cast("string"))
    gr = {r["g"]: r["b1"] for r in ols_multi(g, "y", "x1", "x2", ["g"]).collect()}
    solo = ols_multi(g.filter(F.col("g") == "true"), "y", "x1", "x2").first()
    assert gr["true"] == solo["b1"]


def test_mahalanobis_outliers_known(spark):
    from stackstac_spark.operators.mlfit import mahalanobis_outliers

    random.seed(20)
    pts = [(random.gauss(0, 1), random.gauss(0, 1)) for _ in range(500)] + [
        (8.0, -8.0)
    ]
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "a double, b double"
    )
    out = mahalanobis_outliers(df, "a", "b").collect()
    A = np.array(pts)
    mu, S = A.mean(axis=0), np.cov(A.T, ddof=1)
    inv = np.linalg.inv(S)
    d2 = [float((p - mu) @ inv @ (p - mu)) for p in A]
    exp = sorted(round(d, 6) for d in d2 if d >= 13.815511)
    got = sorted(r["mahal_d2"] for r in out)
    assert len(got) == len(exp)
    assert all(abs(g - e) < 1e-4 for g, e in zip(got, exp))
    # the planted outlier is flagged, and input columns pass through
    assert any(r["a"] == 8.0 and r["b"] == -8.0 for r in out)
    # constant column -> degenerate ellipse -> no rows (not an error)
    const = spark.createDataFrame(
        [(1.0, float(i)) for i in range(10)], "a double, b double"
    )
    assert mahalanobis_outliers(const, "a", "b").count() == 0


def test_one_rule_known(spark):
    from stackstac_spark.operators.mlfit import one_rule

    data = [
        ("red", "round", 1),
        ("red", "square", 1),
        ("blue", "round", 0),
        ("blue", "square", 0),
        ("red", "round", 1),
        ("blue", "round", 1),
    ]
    df = spark.createDataFrame(data, "color string, shape string, y int")
    got = {
        r["feature"]: (r["n_values"], r["correct"], r["accuracy"], r["best"])
        for r in one_rule(df, "y", ["color", "shape"]).collect()
    }
    # color: red->1 (3/3), blue->0 (2/3, tie-free) = 5/6
    # shape: round->1 (3/4); square ties 1-1 -> smallest label '0' = 4/6
    assert got["color"] == (2, 5, round(5 / 6, 6), True)
    assert got["shape"] == (2, 4, round(4 / 6, 6), False)
    # a leaky feature (the label itself) scores accuracy 1.0 and wins
    leak = df.withColumn("leak", F.col("y").cast("string"))
    top = one_rule(leak, "y", ["color", "shape", "leak"]).first()
    assert top["feature"] == "leak" and top["accuracy"] == 1.0
    with pytest.raises(ValueError, match="at least one"):
        one_rule(df, "y", [])


def test_weighted_quantiles_known(spark):
    from stackstac_spark.operators.sketch import weighted_quantiles

    random.seed(21)
    vw = [(float(random.randint(0, 50)), float(random.randint(1, 9))) for _ in range(300)]
    df = spark.createDataFrame(vw, "v double, w double")
    got = {r["prob"]: r["quantile"] for r in weighted_quantiles(df, "v", "w").collect()}
    tot = sum(w for _, w in vw)
    exp = {}
    for p in (0.25, 0.5, 0.75):
        cum = 0.0
        for v in sorted({v for v, _ in vw}):
            cum += sum(w for vv, w in vw if vv == v)
            if cum >= p * tot:
                exp[p] = v
                break
    assert got == exp
    # unit weights reduce to the plain left-continuous quantile
    u = df.withColumn("w", F.lit(1.0))
    med = weighted_quantiles(u, "v", "w", probs=(0.5,)).first()["quantile"]
    vals = sorted(v for v, _ in vw)
    assert med == vals[(len(vals) + 1) // 2 - 1]
    with pytest.raises(ValueError, match="probs"):
        weighted_quantiles(df, "v", "w", probs=(1.5,))
    with pytest.raises(ValueError, match="max_distinct"):
        weighted_quantiles(df, "v", "w", max_distinct=3)


def test_skyline_2d_known(spark):
    from stackstac_spark.operators.skyline import skyline_2d

    random.seed(22)
    pts = [(float(random.randint(0, 100)), float(random.randint(0, 100))) for _ in range(400)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    sky = {
        p
        for p in pts
        if not any(q[0] >= p[0] and q[1] >= p[1] and q != p for q in pts)
    }
    assert got == sorted(sky)
    # frontier is strictly monotone: x increasing -> y strictly decreasing
    ys = [y for _, y in got]
    assert ys == sorted(ys, reverse=True) and len(set(ys)) == len(ys)
    # a totally ordered set collapses to its single maximum
    chain = spark.createDataFrame(
        [(float(i), float(i)) for i in range(20)], "x double, y double"
    )
    assert [(r["x"], r["y"]) for r in skyline_2d(chain, "x", "y").collect()] == [
        (19.0, 19.0)
    ]
    with pytest.raises(ValueError, match="max_distinct"):
        skyline_2d(df, "x", "y", max_distinct=3)
