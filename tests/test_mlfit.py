"""operators/mlfit.py: batch-GD logistic regression vs a numpy replay of
the identical fixed-step, per-step-rounded iteration."""

import math

import numpy as np
import pytest

from stackstac_spark.operators.mlfit import logistic_fit, logistic_fit_df


def _replay(X, y, iters, lr, r=6):
    n, d = X.shape
    w = np.zeros(d)
    hist = [(0, *w.tolist())]
    for step in range(1, iters + 1):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = np.array([round(float(v), r) for v in (X.T @ (p - y)) / n])
        w = np.array([round(float(v), r) for v in w - lr * g])
        hist.append((step, *w.tolist()))
    return hist


def _data(seed=5, n=400):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    # separable-ish: y depends on x1 - x2
    y = (x1 - x2 + rng.normal(0, 0.3, n) > 0).astype(float)
    X = np.column_stack([np.ones(n), x1, x2])
    return X, y


def test_logistic_fit_matches_numpy_replay(spark):
    X, y = _data()
    rows = [(float(a), float(b), float(t)) for (_, a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    hist = logistic_fit(df, ["x1", "x2"], "y", iters=4, lr=0.4)
    want = _replay(X, y, iters=4, lr=0.4)
    for got, exp in zip(hist, want):
        assert got[0] == exp[0]
        assert got[1:] == pytest.approx(exp[1:], abs=2e-6), got[0]


def test_logistic_fit_learns_the_signal(spark):
    X, y = _data()
    rows = [(float(a), float(b), float(t)) for (_, a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    hist = logistic_fit(df, ["x1", "x2"], "y", iters=8, lr=0.4)
    w = np.array(hist[-1][1:])
    # y ~ x1 - x2: the fitted direction must have positive x1 and negative
    # x2 weight, and the training loss must be below the chance loss
    assert w[1] > 0 and w[2] < 0
    p = 1.0 / (1.0 + np.exp(-(X @ w)))
    loss = -np.mean(y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12))
    assert loss < math.log(2)


def test_logistic_fit_df_shape_and_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    out = logistic_fit_df(df, ["x"], "y", iters=2, lr=0.4)
    assert out.columns == ["step", "w0", "w1"]
    assert out.count() == 3
    with pytest.raises(ValueError):
        logistic_fit(df, ["x"], "y", iters=0)
    empty = spark.createDataFrame([], "x double, y double")
    with pytest.raises(ValueError):
        logistic_fit(empty, ["x"], "y", iters=1)
