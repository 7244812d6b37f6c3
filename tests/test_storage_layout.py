"""Contracts for stackstac_spark.operators.storage (Z-order clustering).

The bucketed/partitioned sink contracts live in tests/test_scale_ops.py
(sources/sinks.py); this file pins the z-order claims:

1. zorder_key is exact Morton interleaving (bit-for-bit vs a Python
   reference implementation) under both data-derived and caller-supplied
   ranges.
2. The key is fully native — no BatchEvalPython / ArrowEvalPython in the
   plan (whole-stage codegen keeps it JVM-side at 100 TB).
3. zorder_write produces files whose per-file min/max are tight on BOTH
   clustered columns — the property a plain single-column sort cannot give.
"""

import itertools
import math
import os

import pytest
from pyspark.sql import functions as F

from stackstac_spark.operators.storage import zorder_key, zorder_write


def _plan(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def _morton_ref(vals, mins, maxs, bits):
    """Reference Morton encode of one row (floor-quantize + interleave)."""
    k = len(vals)
    key = 0
    n = (1 << bits) - 1
    for j, (v, mn, mx) in enumerate(zip(vals, mins, maxs)):
        span = (mx - mn) or 1.0
        q = min(n, max(0, math.floor((float(v) - mn) / span * (n + 1))))
        for i in range(bits):
            key |= ((q >> i) & 1) << (i * k + j)
    return key


def test_zorder_key_matches_reference_bit_math(spark):
    df = spark.createDataFrame(
        [(float(x), float(y)) for x in range(16) for y in range(16)],
        "x double, y double",
    )
    out = zorder_key(df, ["x", "y"], bits=4).collect()
    for row in out:
        assert row["zorder"] == _morton_ref(
            (row["x"], row["y"]), (0.0, 0.0), (15.0, 15.0), 4
        ), row


def test_zorder_key_three_columns_and_explicit_ranges(spark):
    rows = [(float(x), float(y), float(z))
            for x, y, z in itertools.product(range(4), repeat=3)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    ranges = {"x": (0.0, 3.0), "y": (0.0, 3.0), "z": (0.0, 3.0)}
    out = zorder_key(df, ["x", "y", "z"], bits=2, ranges=ranges).collect()
    for row in out:
        assert row["zorder"] == _morton_ref(
            (row["x"], row["y"], row["z"]), (0, 0, 0), (3, 3, 3), 2
        ), row
    # explicit ranges keep the op fully lazy: same values as data-derived
    out2 = zorder_key(df, ["x", "y", "z"], bits=2).collect()
    assert {(r.x, r.y, r.z, r.zorder) for r in out} == {
        (r.x, r.y, r.z, r.zorder) for r in out2
    }


def test_zorder_key_native_plan(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 10).cast("double").alias("y"),
    )
    plan = _plan(zorder_key(df, ["x", "y"], bits=8, ranges={"x": (0, 99), "y": (0, 9)}))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # formatted mode marks whole-stage-codegen operators with [codegen id : N]
    assert "[codegen id" in plan


def test_zorder_key_validates(spark):
    df = spark.range(4).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=0)


def test_zorder_key_constant_column_no_div_zero(spark):
    df = spark.range(8).select(
        F.lit(5.0).alias("x"), F.col("id").cast("double").alias("y")
    )
    out = zorder_key(df, ["x", "y"], bits=3).collect()
    # constant column quantizes to 0 everywhere; y still spreads the key
    assert len({r.zorder for r in out}) == 8


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """After zorder_write on (x, y), per-file min/max ranges must be tight on
    BOTH columns — the whole point vs a plain sort by x (where y's per-file
    range stays ~full-width)."""
    path = os.path.join(str(tmp_path), "zordered")
    rows = [(float(x), float(y)) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x double, y double").repartition(8)
    zorder_write(df, path, ["x", "y"], bits=6, n_files=16)
    back = spark.read.parquet(path)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    # 4096 rows over >=16 z-runs: average per-file span must be well under
    # the full 63-wide domain on BOTH axes (plain x-sort gives yr ~= 63
    # for every file)
    avg_xr = sum(r.xr for r in per_file) / len(per_file)
    avg_yr = sum(r.yr for r in per_file) / len(per_file)
    assert avg_xr < 40 and avg_yr < 40, (avg_xr, avg_yr)
    assert back.count() == 4096
