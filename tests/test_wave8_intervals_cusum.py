"""r8 wave-8 operators: interval-union coverage, CUSUM change points."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _brute_union(intervals):
    ivs = sorted(intervals)
    covered = islands = 0
    cur_s = cur_e = None
    for s, e in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
            islands += 1
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    return len(ivs), islands, covered


@pytest.mark.parametrize("seed", [0, 1])
def test_interval_union_matches_brute(spark, seed):
    from stackstac_spark.operators.rangejoin import interval_union_length

    rng = random.Random(seed)
    rows = []
    per_key = {}
    for k in range(8):
        ivs = []
        for _ in range(40):
            s = rng.randrange(1000)
            e = s + rng.randrange(0, 60)
            ivs.append((s, e))
            rows.append((k, s, e))
        per_key[k] = _brute_union(ivs)
    df = spark.createDataFrame(rows, ["key", "s", "e"])
    got = {
        r["key"]: (r["n_intervals"], r["n_islands"], r["covered"])
        for r in interval_union_length(df, "key", "s", "e").collect()
    }
    assert got == per_key


def test_interval_union_rejects_negative(spark):
    from stackstac_spark.operators.rangejoin import interval_union_length

    df = spark.createDataFrame([(1, 10, 5)], ["key", "s", "e"])
    with pytest.raises(ValueError, match="intervals have"):
        interval_union_length(df, "key", "s", "e")


def _brute_cusum(series, k=0.5, h=5.0):
    n = len(series)
    mu = sum(series) / n
    var = sum(v * v for v in series) / n - mu * mu
    sd = max(var, 0.0) ** 0.5
    zs = [round((v - mu) / sd, 6) if sd > 0 else 0.0 for v in series]
    zi = [int(round(z * 1_000_000)) for z in zs]
    ki, hi = 500_000, 5_000_000
    s_hi = s_lo = 0
    hits = []
    for idx, z in enumerate(zi):
        nh = max(0, s_hi + z - ki)
        nl = min(0, s_lo + z + ki)
        if nh > hi or nl < -hi:
            hits.append((idx, nh / 1e6, nl / 1e6))
            s_hi = s_lo = 0
        else:
            s_hi, s_lo = nh, nl
    return hits


def test_cusum_matches_python_replay(spark):
    from stackstac_spark.operators.mlfit import cusum_changepoints

    rng = random.Random(5)
    series = [10 + rng.randrange(0, 3) for _ in range(80)] + [
        18 + rng.randrange(0, 3) for _ in range(40)
    ]
    df = spark.createDataFrame(
        [("s", i, float(v)) for i, v in enumerate(series)], ["key", "t", "v"]
    )
    got = [
        (r["order_val"], r["s_hi"], r["s_lo"])
        for r in cusum_changepoints(df, "key", "t", "v").orderBy("order_val").collect()
    ]
    assert got == _brute_cusum([float(v) for v in series])
    assert got, "shifted series must alarm"


def test_cusum_flat_series_never_alarms(spark):
    from stackstac_spark.operators.mlfit import cusum_changepoints

    df = spark.createDataFrame([("s", i, 7.0) for i in range(50)], ["key", "t", "v"])
    assert cusum_changepoints(df, "key", "t", "v").count() == 0


def test_cusum_downward_shift_uses_lower_sum(spark):
    from stackstac_spark.operators.mlfit import cusum_changepoints

    series = [20.0] * 60 + [5.0] * 30
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(series)], ["key", "t", "v"]
    )
    hits = cusum_changepoints(df, "key", "t", "v").collect()
    assert hits and all(r["s_lo"] < 0 for r in hits if r["order_val"] >= 60)
