"""Known-value tests for the r11 third sub-wave: trimmed_mean,
mann_kendall, rake_keywords."""

import math

import pytest
from pyspark.sql import functions as F


def test_trimmed_mean_known(spark):
    from stackstac_spark.operators.sketch import trimmed_mean

    # 1..10, trim 0.2 -> k=2 -> mean(3..8) = 5.5
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "x double")
    r = trimmed_mean(df, "x", trim=0.2).first()
    assert (r["n"], r["n_kept"]) == (10, 6)
    assert r["trimmed_mean"] == pytest.approx(5.5)
    # ties straddling the cut: weights split exactly
    tied = spark.createDataFrame(
        [(1.0,), (1.0,), (1.0,), (5.0,), (9.0,), (9.0,), (9.0,)], "x double"
    )
    # n=7, trim=0.2 -> k=1 -> keep ranks 2..6 = [1,1,5,9,9] -> mean 5.0
    r = trimmed_mean(tied, "x", trim=0.2).first()
    assert r["n_kept"] == 5 and r["trimmed_mean"] == pytest.approx(5.0)
    # trim=0 is the plain mean; dirty rows excluded
    dirty = spark.createDataFrame(
        [(2.0,), (4.0,), (None,), (float("nan"),)], "x double"
    )
    r = trimmed_mean(dirty, "x", trim=0.0).first()
    assert r["n"] == 2 and r["trimmed_mean"] == pytest.approx(3.0)
    # over-trim -> NULL
    two = spark.createDataFrame([(1.0,), (100.0,)], "x double")
    assert trimmed_mean(two, "x", trim=0.49).first()["trimmed_mean"] is not None
    with pytest.raises(ValueError):
        trimmed_mean(df, "x", trim=0.5)
    # guard
    cont = spark.range(0, 3000).select(F.rand(5).alias("x"))
    with pytest.raises(ValueError, match="max_distinct"):
        trimmed_mean(cont, "x", max_distinct=100)


def test_trimmed_mean_matches_numpy_sorted_slice(spark):
    import numpy as np
    from stackstac_spark.operators.sketch import trimmed_mean

    rng = np.random.default_rng(11)
    vals = np.round(rng.normal(50, 20, 200), 1)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    for trim in (0.05, 0.1, 0.25):
        k = int(math.floor(len(vals) * trim))
        want = float(np.sort(vals)[k : len(vals) - k].mean())
        got = trimmed_mean(df, "x", trim=trim).first()["trimmed_mean"]
        assert got == pytest.approx(want, abs=1e-6), trim


def test_mann_kendall_known(spark):
    from stackstac_spark.operators.timeseries import mann_kendall

    # strictly increasing: S = n(n-1)/2, no ties
    n = 8
    inc = spark.createDataFrame(
        [(float(t), float(t * 2)) for t in range(n)], "t double, x double"
    )
    r = mann_kendall(inc, "t", "x").first()
    assert r["s_stat"] == n * (n - 1) // 2
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert r["var_s"] == pytest.approx(var, abs=1e-6)
    assert r["z"] == pytest.approx((r["s_stat"] - 1) / math.sqrt(var), abs=1e-6)
    # constant series: one tie group of size n -> var_s = 0, z = 0
    const = spark.createDataFrame(
        [(float(t), 3.0) for t in range(5)], "t double, x double"
    )
    r = mann_kendall(const, "t", "x").first()
    assert r["s_stat"] == 0 and r["var_s"] == 0.0 and r["z"] == 0.0
    # hand case with a tie: x = [1, 2, 2, 0]
    hand = spark.createDataFrame(
        [(0.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 0.0)], "t double, x double"
    )
    r = mann_kendall(hand, "t", "x").first()
    # pairs: (1,2)+1 (1,2)+1 (1,0)-1 (2,2)0 (2,0)-1 (2,0)-1 -> S = -1
    assert r["s_stat"] == -1
    n4, t2 = 4, 2
    var = (n4 * 3 * 13 - t2 * 1 * 9) / 18.0
    assert r["var_s"] == pytest.approx(var, abs=1e-6)
    assert r["z"] == pytest.approx((-1 + 1) / math.sqrt(var), abs=1e-6)
    # duplicate timestamps raise
    dup = spark.createDataFrame([(1.0, 1.0), (1.0, 2.0)], "t double, x double")
    with pytest.raises(ValueError, match="duplicate timestamps"):
        mann_kendall(dup, "t", "x")
    with pytest.raises(ValueError, match="max_points"):
        mann_kendall(inc, "t", "x", max_points=4)


def test_rake_keywords_known(spark):
    from stackstac_spark.operators.textstats import rake_keywords

    # "deep learning" appears twice (deg rewards the pair), "models" alone
    docs = spark.createDataFrame(
        [
            ("deep learning models are the future of deep learning",),
            ("models",),
        ],
        "text string",
    )
    got = {r["phrase"]: r for r in rake_keywords(docs, k=10, stopwords=["are", "the", "of"]).collect()}
    # phrases: "deep learning models" (1x), "future" (1x), "deep learning" (1x), "models" (1x)
    # freq: deep 2, learning 2, models 2, future 1
    # deg:  deep 3+2=5, learning 5, models 3+1=4, future 1
    assert got["deep learning models"]["score"] == pytest.approx(5 / 2 + 5 / 2 + 4 / 2, abs=1e-6)
    assert got["deep learning"]["score"] == pytest.approx(5.0, abs=1e-6)
    assert got["future"]["score"] == pytest.approx(1.0, abs=1e-6)
    assert got["models"]["cnt"] == 1 and got["models"]["score"] == pytest.approx(2.0, abs=1e-6)
    # ranking: highest score first
    ranks = {r["rank"]: r["phrase"] for r in got.values()}
    assert ranks[1] == "deep learning models"
