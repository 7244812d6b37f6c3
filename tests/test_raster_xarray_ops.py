"""Delegated-xarray-surface raster ops added in r4: focal (rolling) mean,
linear temporal gap interpolation, zonal statistics — each vs a dense numpy
replay of the xarray semantics."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _round_half_up(x: float, nd: int = 6) -> float:
    """Replay Spark's F.round (HALF_UP over the shortest decimal repr,
    matching the DuckDB oracles). Python's built-in round is banker's
    HALF_EVEN, which diverges on exact .5 ties (e.g. 0.7265625 at nd=6) —
    a latent Hypothesis flake when used as the expectation here."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
        )
    )


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
            assert abs(fm - _round_half_up(float(np.mean(vals)))) < 1e-9
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


def test_focal_mean_skips_nan(spark):
    """NaN pixels are nodata: they must not poison neighboring means,
    must not count toward n_samples, and an all-NaN neighborhood yields a
    null mean with n_samples=0 (xarray rolling min_periods=1 semantics)."""
    from stackstac_spark.operators.composite import focal_mean

    # 1-D strip: values 1, NaN, 3 — plus an isolated NaN far away at col 10
    px = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, float("nan")), (0, 2, 3.0), (0, 10, float("nan"))],
        "row INT, col INT, value DOUBLE",
    )
    got = {
        (r["row"], r["col"]): (r["focal_mean"], r["n_samples"])
        for r in focal_mean(px, radius=1).collect()
    }
    assert got[(0, 1)] == (2.0, 2)  # mean(1, 3); NaN neighbor skipped
    assert got[(0, 0)] == (1.0, 1)
    assert got[(0, 2)] == (3.0, 1)
    # neighborhood of the isolated NaN: row exists, null mean, 0 samples
    fm, n = got[(0, 10)]
    assert fm is None and n == 0


def test_zonal_stats_skips_nan(spark):
    """rasterstats skipna: NaN pixels excluded from count/mean/min/max."""
    from stackstac_spark.operators.composite import zonal_stats

    px = spark.createDataFrame(
        [(0, 0, 2.0), (0, 1, float("nan")), (1, 0, 4.0), (1, 1, float("nan"))],
        "row INT, col INT, value DOUBLE",
    )
    zones = spark.createDataFrame(
        [(0, 0, 1, 0, 1), (1, 0, 0, 1, 1)],
        "zone_id INT, row_min INT, row_max INT, col_min INT, col_max INT",
    )
    got = {r["zone_id"]: r for r in zonal_stats(px, zones).collect()}
    assert got[0]["n_pixels"] == 2
    assert got[0]["mean_value"] == 3.0
    assert got[0]["min_value"] == 2.0 and got[0]["max_value"] == 4.0
    # zone 1 covers only NaN pixels: present with 0 valid pixels, null stats
    assert got[1]["n_pixels"] == 0 and got[1]["mean_value"] is None


# --- Hypothesis fuzz -------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=2**16),
    density=st.floats(min_value=0.1, max_value=1.0),
    radius=st.integers(min_value=1, max_value=2),
)
def test_focal_mean_fuzz_vs_numpy(spark, seed, density, radius):
    from stackstac_spark.operators.composite import focal_mean

    h, w = 5, 6
    rng = np.random.default_rng(seed)
    grid = rng.integers(0, 50, (h, w)).astype(float)
    mask = rng.random((h, w)) < density
    rows = [
        (int(r), int(c), float(grid[r, c]))
        for r in range(h)
        for c in range(w)
        if mask[r, c]
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "row INT, col INT, value DOUBLE")
    got = {
        (r["row"], r["col"]): (r["focal_mean"], r["n_samples"])
        for r in focal_mean(df, radius=radius, grid_shape=(h, w)).collect()
    }
    for r in range(h):
        for c in range(w):
            vals = [
                grid[rr, cc]
                for rr in range(max(0, r - radius), min(h, r + radius + 1))
                for cc in range(max(0, c - radius), min(w, c + radius + 1))
                if mask[rr, cc]
            ]
            if not vals:
                assert (r, c) not in got
            else:
                fm, n = got[(r, c)]
                assert n == len(vals)
                assert abs(fm - _round_half_up(float(np.mean(vals)))) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(obs=st.lists(st.tuples(st.integers(0, 5), st.floats(0, 100)), min_size=1, max_size=6, unique_by=lambda t: t[0]))
def test_interp_na_time_fuzz_vs_numpy(spark, obs):
    from stackstac_spark.operators.composite import interp_na_time

    dim = list(range(6))
    px = spark.createDataFrame(
        [(t, 0, 0, 0, float(v)) for t, v in obs],
        "item_idx INT, band_idx INT, row INT, col INT, value DOUBLE",
    )
    got = {
        r["item_idx"]: r["value"] for r in interp_na_time(px, dim).collect()
    }
    ts = sorted(t for t, _ in obs)
    vals = dict(obs)
    for t in dim:
        if t in vals:
            assert got[t] == pytest.approx(vals[t])
            continue
        prev = max((x for x in ts if x <= t), default=None)
        nxt = min((x for x in ts if x >= t), default=None)
        if prev is None or nxt is None:
            assert got[t] is None
        else:
            expect = vals[prev] + (vals[nxt] - vals[prev]) * (t - prev) / (nxt - prev)
            assert got[t] == pytest.approx(_round_half_up(expect), abs=1e-9)


def test_temporal_diff_sparse_and_nan(spark):
    """diff("time") semantics on the sparse plane: consecutive OBSERVATIONS
    difference (absent rows skipped); NaN observations skipped entirely, so
    the diff spans across them; first observation has no row."""
    from stackstac_spark.operators.composite import temporal_diff

    px = spark.createDataFrame(
        [
            # pixel (0,0): t0=10, t1=NaN, t3=40 → diff row t3 vs t0
            (0, 0, 0, 10.0), (1, 0, 0, float("nan")), (3, 0, 0, 40.0),
            # pixel (0,1): single obs → no rows
            (2, 0, 1, 7.0),
        ],
        "item_idx INT, row INT, col INT, value DOUBLE",
    )
    got = temporal_diff(px).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.row, r.col, r.item_idx, r.prev_item_idx, r.value_diff) == (0, 0, 3, 0, 30.0)


def test_focal_gradient_horn_vs_numpy(spark):
    """Horn 3x3 gradient vs a direct numpy stencil on a random full grid;
    edge pixels (incomplete stencil) and neighborhoods broken by a NaN are
    absent (gdaldem edge semantics)."""
    from stackstac_spark.operators.composite import focal_gradient

    h, w = 6, 7
    rng = np.random.default_rng(11)
    grid = rng.integers(0, 100, (h, w)).astype(float)
    grid[2, 3] = np.nan
    rows = [(r, c, float(grid[r, c])) for r in range(h) for c in range(w)]
    df = spark.createDataFrame(rows, "row INT, col INT, value DOUBLE")
    got = {(r.row, r.col): (r.dzdx, r.dzdy, r.slope)
           for r in focal_gradient(df, cellsize_x=2.0).collect()}
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            n = grid[r - 1:r + 2, c - 1:c + 2]
            if np.isnan(n).any():
                assert (r, c) not in got
                continue
            a, b, cc2, d, _, f, g, hh, i = n.ravel()
            gx = ((cc2 + 2 * f + i) - (a + 2 * d + g)) / (8 * 2.0)
            gy = ((g + 2 * hh + i) - (a + 2 * b + cc2)) / 8.0
            ex = (round(gx, 9), round(gy, 9), round(float(np.hypot(gx, gy)), 9))
            assert got[(r, c)] == pytest.approx(ex, abs=1e-9), (r, c)
    # no edge rows/cols in the output
    assert all(0 < r < h - 1 and 0 < c < w - 1 for r, c in got)


def test_hillshade_vs_numpy(spark):
    """Horn hillshade vs a direct numpy replay of the gdaldem formula
    (slope=atan(z·|∇|), aspect=atan2(gy,-gx), Lambertian cang, 1+254·cang
    clamped at 1) — same random grid as the gradient test, plus a flat
    grid whose shade must be exactly round(1+254·sin(alt), 4) everywhere."""
    import math

    from stackstac_spark.operators.composite import hillshade

    h, w = 6, 7
    rng = np.random.default_rng(11)
    grid = rng.integers(0, 100, (h, w)).astype(float)
    rows = [(r, c, float(grid[r, c])) for r in range(h) for c in range(w)]
    df = spark.createDataFrame(rows, "row INT, col INT, value DOUBLE")
    az, alt = math.radians(315.0), math.radians(45.0)
    got = {(r.row, r.col): r.shade
           for r in hillshade(df, z_factor=2.0, cellsize_x=2.0).collect()}
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            n = grid[r - 1:r + 2, c - 1:c + 2]
            a, b, cc2, d, _, f, g, hh, i = n.ravel()
            gx = ((cc2 + 2 * f + i) - (a + 2 * d + g)) / (8 * 2.0)
            gy = ((g + 2 * hh + i) - (a + 2 * b + cc2)) / 8.0
            slope = math.atan(2.0 * math.hypot(gx, gy))
            aspect = math.atan2(gy, -gx)
            cang = (math.sin(alt) * math.cos(slope)
                    + math.cos(alt) * math.sin(slope)
                    * math.cos(az - math.pi / 2 - aspect))
            want = 1.0 if cang <= 0 else 1.0 + 254.0 * cang
            assert got[(r, c)] == pytest.approx(round(want, 4), abs=1e-4), (r, c)
    # flat surface: zero gradient everywhere → shade = 1 + 254·sin(alt)
    flat = spark.createDataFrame(
        [(r, c, 5.0) for r in range(4) for c in range(4)],
        "row INT, col INT, value DOUBLE",
    )
    vals = {r.shade for r in hillshade(flat).collect()}
    assert vals == {round(1.0 + 254.0 * math.sin(alt), 4)}
