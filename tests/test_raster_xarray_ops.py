"""Delegated-xarray-surface raster ops added in r4: focal (rolling) mean,
linear temporal gap interpolation, zonal statistics — each vs a dense numpy
replay of the xarray semantics."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_focal_mean_matches_numpy_rolling(spark):
    from stackstac_spark.operators.composite import focal_mean

    h, w = 6, 7
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 100, (h, w)).astype(float)
    mask = rng.random((h, w)) < 0.7  # sparse: ~30% missing
    rows = [
        (int(r), int(c), float(grid[r, c]))
        for r in range(h)
        for c in range(w)
        if mask[r, c]
    ]
    df = spark.createDataFrame(rows, "row INT, col INT, value DOUBLE")
    got = {
        (r["row"], r["col"]): (r["focal_mean"], r["n_samples"])
        for r in focal_mean(df, radius=1, grid_shape=(h, w)).collect()
    }
    for r in range(h):
        for c in range(w):
            vals = [
                grid[rr, cc]
                for rr in range(max(0, r - 1), min(h, r + 2))
                for cc in range(max(0, c - 1), min(w, c + 2))
                if mask[rr, cc]
            ]
            if not vals:
                assert (r, c) not in got
                continue
            fm, n = got[(r, c)]
            assert n == len(vals)
            assert abs(fm - round(float(np.mean(vals)), 6)) < 1e-9
    with pytest.raises(ValueError):
        focal_mean(df, radius=0)


def test_interp_na_time_linear_and_edges(spark):
    from stackstac_spark.operators.composite import interp_na_time

    # pixel A observed at t=0 (10.0) and t=3 (40.0) → t=1: 20, t=2: 30
    # pixel B observed only at t=2 → edges stay null except t=2
    px = spark.createDataFrame(
        [
            (0, 0, 0, 0, 10.0),
            (3, 0, 0, 0, 40.0),
            (2, 0, 1, 1, 7.0),
            (1, 0, 1, 1, float("nan")),  # NaN observation = missing
        ],
        "item_idx INT, band_idx INT, row INT, col INT, value DOUBLE",
    )
    got = {
        (r["item_idx"], r["row"], r["col"]): r["value"]
        for r in interp_na_time(px, [0, 1, 2, 3]).collect()
    }
    assert got[(0, 0, 0)] == 10.0 and got[(3, 0, 0)] == 40.0
    assert got[(1, 0, 0)] == 20.0 and got[(2, 0, 0)] == 30.0
    assert got[(2, 1, 1)] == 7.0
    assert got[(0, 1, 1)] is None and got[(1, 1, 1)] is None and got[(3, 1, 1)] is None
    assert len(got) == 8
    with pytest.raises(ValueError):
        interp_na_time(px, [])


def test_zonal_stats_overlapping_zones(spark):
    from stackstac_spark.operators.composite import zonal_stats

    px = spark.createDataFrame(
        [(r, c, float(r * 10 + c)) for r in range(4) for c in range(4)],
        "row INT, col INT, value DOUBLE",
    )
    zones = spark.createDataFrame(
        [(0, 0, 1, 0, 1), (1, 1, 2, 1, 2), (2, 0, 3, 0, 3)],
        "zone_id INT, row_min INT, row_max INT, col_min INT, col_max INT",
    )
    got = {r["zone_id"]: r for r in zonal_stats(px, zones).collect()}
    assert got[0]["n_pixels"] == 4 and got[0]["mean_value"] == np.mean([0, 1, 10, 11])
    assert got[1]["n_pixels"] == 4 and got[1]["min_value"] == 11.0
    assert got[2]["n_pixels"] == 16 and got[2]["max_value"] == 33.0
    # pixel (1,1) counted in all three zones (overlap semantics)
