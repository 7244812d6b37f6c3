"""Property-based scan correctness — the reference's core test idea
(tests/test_to_dask.py:69-186): random asset tables (random integer bboxes,
random missing assets, random chunksizes), oracle = a dense numpy array
painted per asset window from the same deterministic value function the
fake reader serves; the engine's ``compute()`` must reproduce it
pixel-exactly, including fill in uncovered/missing cells.

Two generators (r4 scale-up of the r2-era 1-4 item / single-CRS draw):

- ``stack_cases``: up to 16 same-CRS items, chunksizes spanning
  many-tiny-tiles (7) through multi-tile windows (33) to
  whole-grid-in-one-chunk (256), random missing assets — exercises tile
  assembly, empty-chunk elision, and all-empty row/col drop under fuzz.
- ``mixed_crs_cases``: per-item source CRS drawn from {32613, 32614, 4326}
  (adjacent UTM zones + lat/lon) with footprints anchored near one lon/lat
  point — exercises the 4-corner cross-CRS bounds path end to end; the
  oracle reprojects each asset bbox with the same pure-numpy
  ``reproject_bounds`` the engine uses, then paints on the output grid
  (the fake reader serves output-grid values, like a WarpedVRT would).
"""

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stackstac_spark.functions.proj import transform_xy
from stackstac_spark.stack import stack
from tests.conftest import make_item
from tests.test_stack_e2e import paint_oracle


@st.composite
def stack_cases(draw):
    n_items = draw(st.integers(1, 16))
    items = []
    for i in range(n_items):
        minx = draw(st.integers(-40, 40))
        miny = draw(st.integers(-40, 40))
        w = draw(st.integers(1, 60))
        h = draw(st.integers(1, 60))
        items.append(
            make_item(
                i,
                f"2024-01-{(i % 27) + 1:02d}T00:00:00Z",
                (float(minx), float(miny), float(minx + w), float(miny + h)),
            )
        )
    # randomly drop assets (missing cells in the asset table)
    for i in range(n_items):
        if n_items > 1 and draw(st.booleans()):
            del items[i]["assets"][draw(st.sampled_from(["red", "nir"]))]
    chunksize = draw(st.sampled_from([7, 16, 33, 256]))
    # dtype draw (reference testing/strategies.py:26-31 draws dtypes too);
    # float32 exercises the non-float64 payload path end to end — the
    # oracle is cast with the same numpy rounding the scan applies
    dtype = draw(st.sampled_from(["float64", "float32"]))
    return items, chunksize, dtype


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=stack_cases())
def test_scan_fuzz_matches_painted_oracle(spark, case):
    items, chunksize, dtype = case
    st_ = stack(spark, items, assets=["red", "nir"], chunksize=chunksize, dtype=dtype)
    # a band missing from EVERY item is dropped (all-empty column semantics,
    # reference prepare.py:384-393) — paint the oracle for surviving bands
    oracle = paint_oracle(items, st_.asset_ids, st_.spec).astype(dtype)
    got = st_.compute()
    assert got.dtype == np.dtype(dtype)
    assert got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)


# Anchor all mixed-CRS footprints near one lon/lat point so the inferred
# union stays a few hundred pixels at 100 m resolution.
_ANCHOR_LON, _ANCHOR_LAT = -105.0, 39.7
_OUT_EPSG = 32613


@st.composite
def mixed_crs_cases(draw):
    n_items = draw(st.integers(2, 8))
    items = []
    for i in range(n_items):
        src_epsg = draw(st.sampled_from([32613, 32614, 4326]))
        lon = _ANCHOR_LON + draw(st.floats(-0.05, 0.05, allow_nan=False))
        lat = _ANCHOR_LAT + draw(st.floats(-0.04, 0.04, allow_nan=False))
        half_m = draw(st.integers(500, 3000))  # half-size in meters
        if src_epsg == 4326:
            half_lat = half_m / 111_000.0
            half_lon = half_m / (111_000.0 * math.cos(math.radians(lat)))
            bbox = (lon - half_lon, lat - half_lat, lon + half_lon, lat + half_lat)
            res = 0.001
        else:
            cx, cy = transform_xy(4326, src_epsg, np.array([lon]), np.array([lat]))
            bbox = (
                float(cx[0] - half_m),
                float(cy[0] - half_m),
                float(cx[0] + half_m),
                float(cy[0] + half_m),
            )
            res = 100.0
        items.append(
            make_item(
                i,
                f"2024-02-{(i % 27) + 1:02d}T00:00:00Z",
                bbox,
                epsg=src_epsg,
                res=res,
            )
        )
    for i in range(n_items):
        if draw(st.booleans()):
            del items[i]["assets"][draw(st.sampled_from(["red", "nir"]))]
    chunksize = draw(st.sampled_from([16, 256]))
    return items, chunksize


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=mixed_crs_cases())
def test_scan_fuzz_mixed_crs_matches_painted_oracle(spark, case):
    items, chunksize = case
    st_ = stack(
        spark,
        items,
        assets=["red", "nir"],
        epsg=_OUT_EPSG,
        resolution=100.0,
        chunksize=chunksize,
    )
    oracle = paint_oracle(items, st_.asset_ids, st_.spec)
    got = st_.compute()
    assert got.shape == oracle.shape
    np.testing.assert_array_equal(got, oracle)
