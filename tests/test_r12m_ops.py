"""Known-value tests for the r12 thirteenth sub-wave: cross-correlation
lead-lag (timeseries.py), Getis-Ord Gi* hot spots (spatial.py),
count overdispersion + negative-binomial moment fit (sampling.py)."""

import math
import random
import statistics

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_cross_correlation_known(spark):
    from stackstac_spark.operators.timeseries import cross_correlation

    random.seed(50)
    bsig = [random.gauss(0, 1) for _ in range(60)]
    asig = [0.0, 0.0] + [
        0.9 * bsig[i - 2] + random.gauss(0, 0.3) for i in range(2, 60)
    ]
    rows = [("g", i, float(asig[i]), float(bsig[i])) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, t int, a double, b double")
    got = {r["lag"]: r["r"] for r in cross_correlation(df, "t", "a", "b", ["g"]).collect()}
    n = 60
    ma, mb = statistics.mean(asig), statistics.mean(bsig)
    za = [x - ma for x in asig]
    zb = [x - mb for x in bsig]
    den = math.sqrt(sum(z * z for z in za) * sum(z * z for z in zb))
    for lag in range(-3, 4):
        s = sum(za[i] * zb[i - lag] for i in range(n) if 0 <= i - lag < n)
        assert got[lag] == pytest.approx(s / den, abs=1e-6)
    # the planted b-leads-a-by-2 structure peaks at lag +2
    assert max(got, key=lambda l: abs(got[l])) == 2
    assert got[2] > 0.9
    # r(0) equals Pearson on the paired rows
    pear = df.agg(F.corr("a", "b")).first()[0]
    assert got[0] == pytest.approx(pear, abs=1e-4)
    with pytest.raises(ValueError, match="duplicate"):
        cross_correlation(
            spark.createDataFrame(
                [("g", 1, 1.0, 1.0), ("g", 1, 2.0, 2.0)],
                "g string, t int, a double, b double",
            ),
            "t",
            "a",
            "b",
            ["g"],
        )


def test_getis_ord_known(spark):
    from stackstac_spark.operators.spatial import getis_ord

    random.seed(51)
    cells = [
        (y, x, (5.0 if y < 3 and x < 3 else 0.0) + random.random() * 0.1)
        for y in range(10)
        for x in range(10)
    ]
    df = spark.createDataFrame(cells, "y int, x int, v double")
    out = getis_ord(df, "y", "x", "v", min_z=2.575829).collect()
    n = 100
    vals = {(y, x): v for y, x, v in cells}
    mean = sum(vals.values()) / n
    s = math.sqrt(sum(v * v for v in vals.values()) / n - mean * mean)
    exp = []
    for (y, x), v in vals.items():
        hood = [(y, x)] + [
            (y + dy, x + dx) for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1))
        ]
        present = [p for p in hood if p in vals]
        w = len(present)
        sn = sum(vals[p] for p in present)
        z = (sn - mean * w) / (s * math.sqrt((n * w - w * w) / (n - 1)))
        if abs(z) >= 2.575829:
            exp.append((y, x, round(z, 6)))
    got = sorted((r["y"], r["x"], r["gi_z"]) for r in out)
    assert got == sorted(exp)
    # every flagged HOT cell sits in or adjacent to the planted block
    assert all(y < 4 and x < 4 for y, x, z in exp if z > 0)
    with pytest.raises(ValueError, match="duplicate"):
        getis_ord(
            spark.createDataFrame(
                [(0, 0, 1.0), (0, 0, 2.0), (0, 1, 1.0)], "y int, x int, v double"
            ),
            "y",
            "x",
            "v",
        )


def test_count_dispersion_known(spark):
    from stackstac_spark.operators.sampling import count_dispersion

    rng = np.random.default_rng(0)
    counts = rng.negative_binomial(3, 0.3, 500).tolist()
    df = spark.createDataFrame([(float(c),) for c in counts], "c double")
    r = count_dispersion(df, "c").first()
    m, s2 = statistics.mean(counts), statistics.variance(counts)
    assert r["n"] == 500
    assert r["mean"] == pytest.approx(m, abs=1e-6)
    assert r["variance"] == pytest.approx(s2, abs=1e-6)
    assert r["dispersion"] == pytest.approx(s2 / m, abs=1e-6)
    assert r["chi2"] == pytest.approx(499 * s2 / m, abs=1e-4)
    assert r["nb_r"] == pytest.approx(m * m / (s2 - m), abs=1e-6)
    assert r["nb_p"] == pytest.approx(m / s2, abs=1e-6)
    # moments roughly recover the generating (r=3, p=0.3)
    assert 1.5 < r["nb_r"] < 6 and 0.15 < r["nb_p"] < 0.5
    # under-dispersed data -> NULL NB parameters, dispersion < 1
    under = spark.createDataFrame([(float(i % 2),) for i in range(100)], "c double")
    ru = count_dispersion(under, "c").first()
    assert ru["nb_r"] is None and ru["dispersion"] < 1.2
    # grouped path agrees with per-group filtering
    g = spark.createDataFrame(
        [("a", float(c)) for c in counts[:250]]
        + [("b", float(c)) for c in counts[250:]],
        "g string, c double",
    )
    gg = {r["g"]: r["mean"] for r in count_dispersion(g, "c", ["g"]).collect()}
    assert gg["a"] == pytest.approx(statistics.mean(counts[:250]), abs=1e-6)
