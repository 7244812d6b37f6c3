"""Fast unit tests (no Spark): grid math, projections, mimetype matching,
PNG, STAC normalization. Property-based where the reference's own tests are
(SURVEY §5) — hypothesis over bbox/resolution space for the rounding rules."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stackstac_spark.functions.proj import reproject_bounds, transform_xy
from stackstac_spark.prepare import Mimetype
from stackstac_spark.raster_spec import (
    RasterSpec,
    Window,
    bounds_overlap,
    snapped_bounds,
    union_bounds,
)
from stackstac_spark.sources.stac import items_to_plain


# --- RasterSpec rounding (reference raster_spec.py:42-53) -------------------

def test_shape_gdal_rounding_exact():
    spec = RasterSpec(4326, (0.0, 0.0, 10.0, 10.0), (1.0, 1.0))
    assert spec.shape == (10, 10)
    # the GDAL +res/2 snap: 10.4 px → 10, 10.6 px → 11
    assert RasterSpec(4326, (0.0, 0.0, 10.4, 10.6), (1.0, 1.0)).shape == (11, 10)


@given(
    minx=st.integers(-100, 99),
    miny=st.integers(-100, 99),
    w=st.integers(1, 50),
    h=st.integers(1, 50),
    res=st.sampled_from([0.25, 0.5, 1.0, 2.0]),
)
@settings(max_examples=200, deadline=None)
def test_shape_matches_reference_formula(minx, miny, w, h, res):
    bounds = (minx, miny, minx + w, miny + h)
    spec = RasterSpec(4326, bounds, (res, res))
    exp_w = int((bounds[2] - bounds[0] + res / 2) / res)
    exp_h = int((bounds[3] - bounds[1] + res / 2) / res)
    assert spec.shape == (exp_h, exp_w)
    # x labels reproduce np.linspace(min, max, n, endpoint=False)
    np.testing.assert_allclose(
        spec.x_labels(), np.linspace(bounds[0], bounds[2], exp_w, endpoint=False)
    )


@given(
    minx=st.floats(-100, 100, allow_nan=False),
    miny=st.floats(-100, 100, allow_nan=False),
    w=st.floats(0.1, 50),
    h=st.floats(0.1, 50),
    res=st.sampled_from([0.25, 0.5, 1.0]),
)
@settings(max_examples=200, deadline=None)
def test_snapped_bounds_contains_and_aligns(minx, miny, w, h, res):
    b = (minx, miny, minx + w, miny + h)
    s = snapped_bounds(b, (res, res))
    assert s[0] <= b[0] and s[1] <= b[1] and s[2] >= b[2] and s[3] >= b[3]
    for v in s:
        assert abs(v / res - round(v / res)) < 1e-9


def test_union_and_overlap():
    assert union_bounds((0, 0, 2, 2), (1, 1, 3, 3)) == (0, 0, 3, 3)
    assert bounds_overlap((0, 0, 2, 2), (1, 1, 3, 3))
    assert not bounds_overlap((0, 0, 1, 1), (1, 1, 2, 2))  # strict: touching ≠ overlap


def test_window_math():
    spec = RasterSpec(4326, (0.0, 0.0, 10.0, 10.0), (1.0, 1.0))
    w = spec.pixel_window_from_bounds((2.0, 3.0, 5.0, 7.0))
    assert w == Window(row_off=3, col_off=2, height=4, width=3)
    assert w.intersects(Window(0, 0, 4, 3))
    assert not w.intersects(Window(0, 0, 3, 2))


# --- projections ------------------------------------------------------------

@given(
    lon=st.floats(-179, 179, allow_nan=False),
    lat=st.floats(-80, 80, allow_nan=False),
)
@settings(max_examples=100, deadline=None)
def test_mercator_roundtrip(lon, lat):
    x, y = transform_xy(4326, 3857, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform_xy(3857, 4326, x, y)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


@given(
    lon=st.floats(-107.9, -102.1, allow_nan=False),
    lat=st.floats(0.1, 83.9, allow_nan=False),
)
@settings(max_examples=100, deadline=None)
def test_utm_roundtrip_zone13(lon, lat):
    x, y = transform_xy(4326, 32613, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform_xy(32613, 4326, x, y)
    assert abs(lon2[0] - lon) < 1e-8 and abs(lat2[0] - lat) < 1e-8


def test_utm_known_point():
    # Denver-ish: published UTM13N coordinates
    x, y = transform_xy(4326, 32613, np.array([-105.0]), np.array([39.7392]))
    assert abs(x[0] - 500000.0) < 0.5  # -105 is the zone-13 central meridian
    assert 4395000 < y[0] < 4405000


def test_reproject_bounds_uses_4_corners():
    # A UTM box straddling the central meridian: naive 2-corner reprojection
    # would miss the bulge; 4-corner must widen it
    b = reproject_bounds((-106.0, 39.0, -104.0, 41.0), 4326, 32613)
    assert b[0] < 420000 and b[2] > 580000


def test_unsupported_crs_raises():
    with pytest.raises(NotImplementedError):
        transform_xy(4326, 27700, np.array([0.0]), np.array([51.0]))


# --- polar stereographic (EPSG 9829 variant B; Snyder §21) — r7 -------------


def test_polar_stereographic_epsg_worked_example():
    """EPSG Guidance Note 7-2's published worked example for EPSG:3032
    (Australian Antarctic, lat_ts 71°S, lon0 70°E, FE=FN=6000000):
    75°S 120°E → E 7255380.79 m, N 7053389.56 m."""
    x, y = transform_xy(4326, 3032, np.array([120.0]), np.array([-75.0]))
    assert abs(x[0] - 7255380.79) < 0.01
    assert abs(y[0] - 7053389.56) < 0.01
    lon, lat = transform_xy(3032, 4326, x, y)
    assert abs(lon[0] - 120.0) < 1e-9 and abs(lat[0] + 75.0) < 1e-9


def test_polar_stereographic_poles_and_standard_parallel():
    # both poles map to the (FE, FN) origin
    x, y = transform_xy(4326, 3031, np.array([37.0]), np.array([-90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    x, y = transform_xy(4326, 3413, np.array([12.0]), np.array([90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    # at the standard parallel on the origin meridian, N = ±a·mF (variant B
    # scale: t/tF = 1 there); for 3031 (71°S, λ0=0) that is ~2082760.11 m
    x, y = transform_xy(4326, 3031, np.array([0.0]), np.array([-71.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0] - 2082760.1085) < 0.01
    # grid orientation: for the south aspect, +y points along λ0 away from
    # the pole; 180°E lands on -y, 90°E on +x
    x, y = transform_xy(4326, 3031, np.array([180.0, 90.0]), np.array([-71.0, -71.0]))
    assert abs(y[0] + 2082760.1085) < 0.01 and abs(x[0]) < 1e-6
    assert abs(x[1] - 2082760.1085) < 0.01 and abs(y[1]) < 1e-6


def test_polar_stereographic_north_south_symmetry():
    """The north formulas must mirror the south ones: 3995 (71°N, λ0 0) vs
    3031 (71°S, λ0 0) — E equal, N negated, for mirrored latitudes."""
    lon = np.array([-150.0, -45.0, 0.0, 33.0, 179.0])
    lat = np.array([75.0, 71.0, 82.5, 66.0, 89.0])
    xn, yn = transform_xy(4326, 3995, lon, lat)
    xs, ys = transform_xy(4326, 3031, lon, -lat)
    np.testing.assert_allclose(xn, xs, atol=1e-6)
    np.testing.assert_allclose(yn, -ys, atol=1e-6)


@given(
    lon=st.floats(-180, 180),
    lat=st.floats(-89.99, -55.0),
)
@settings(max_examples=100, deadline=None)
def test_polar_stereographic_roundtrip_3031(lon, lat):
    x, y = transform_xy(4326, 3031, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform_xy(3031, 4326, x, y)
    dlon = abs((lon2[0] - lon + 180.0) % 360.0 - 180.0)
    assert dlon < 1e-8 and abs(lat2[0] - lat) < 1e-8


@given(
    lon=st.floats(-180, 180),
    lat=st.floats(55.0, 89.99),
)
@settings(max_examples=100, deadline=None)
def test_polar_stereographic_roundtrip_3413(lon, lat):
    x, y = transform_xy(4326, 3413, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform_xy(3413, 4326, x, y)
    dlon = abs((lon2[0] - lon + 180.0) % 360.0 - 180.0)
    assert dlon < 1e-8 and abs(lat2[0] - lat) < 1e-8


def test_polar_crs_composes_with_utm_and_mercator():
    # chain through the lon/lat hub: 3031 → 3857 → 3031
    x = np.array([100000.0, -250000.0])
    y = np.array([1800000.0, 2300000.0])
    mx, my = transform_xy(3031, 3857, x, y)
    x2, y2 = transform_xy(3857, 3031, mx, my)
    np.testing.assert_allclose(x2, x, atol=1e-5)
    np.testing.assert_allclose(y2, y, atol=1e-5)


def test_reproject_bounds_polar():
    """4-corner bbox reprojection into 3031 (same corner semantics as the
    reference's geom_utils.py:42-53): bounds must equal the min/max over
    the four transformed corners of an Antarctic quadrant box."""
    minx, miny, maxx, maxy = -60.0, -80.0, -30.0, -70.0
    b = reproject_bounds((minx, miny, maxx, maxy), 4326, 3031)
    cx = np.array([minx, maxx, minx, maxx])
    cy = np.array([miny, miny, maxy, maxy])
    tx, ty = transform_xy(4326, 3031, cx, cy)
    np.testing.assert_allclose(b, (tx.min(), ty.min(), tx.max(), ty.max()))
    assert b[0] < b[2] and b[1] < b[3]


# --- mimetype matching (reference prepare.py:35-56) -------------------------

def test_mimetype_matching():
    full = Mimetype.from_str("image/tiff; application=geotiff; profile=cloud-optimized")
    assert Mimetype.from_str("image").matches("image/tiff; application=geotiff")
    assert Mimetype.from_str("image/tiff").matches("image/tiff; application=geotiff")
    assert full.matches("image/tiff; application=geotiff; profile=cloud-optimized; extra=1")
    assert not full.matches("image/tiff; application=geotiff")  # missing param
    assert not Mimetype.from_str("image/png").matches("image/tiff")
    assert not Mimetype.from_str("image").matches(None)


# --- STAC input normalization (reference stac_types.py:136-200) -------------

def test_items_to_plain_matrix():
    item = {"type": "Feature", "id": "a", "assets": {}}
    fc = {"type": "FeatureCollection", "features": [item, {**item, "id": "b"}]}

    class FakePystacItem:
        def to_dict(self):
            return dict(item)

    class FakeCatalog:
        def items(self):
            return [FakePystacItem(), FakePystacItem()]

    assert items_to_plain(item) == [item]
    assert [i["id"] for i in items_to_plain(fc)] == ["a", "b"]
    assert items_to_plain([item, item]) == [item, item]
    assert items_to_plain(FakePystacItem()) == [item]
    assert len(items_to_plain(FakeCatalog())) == 2
    with pytest.raises(TypeError):
        items_to_plain(42)
    with pytest.raises(TypeError):
        items_to_plain(None)


def test_raster_spec_validation():
    with pytest.raises(ValueError):
        RasterSpec(4326, (1.0, 0.0, 0.0, 1.0), (1.0, 1.0))
    with pytest.raises(ValueError):
        RasterSpec(4326, (0.0, 0.0, 1.0, 1.0), (0.0, 1.0))


def test_tuple_chunksize_and_center_labels(spark):
    from stackstac_spark.grid import tile_grid
    from stackstac_spark.raster_spec import RasterSpec

    spec = RasterSpec(32633, (0.0, 0.0, 100.0, 60.0), (10.0, 10.0))  # 6x10 px
    g = tile_grid(spark, spec, chunksize=(4, 5)).collect()
    assert {(r.tile_y, r.tile_x) for r in g} == {(ty, tx) for ty in range(2) for tx in range(2)}
    last = next(r for r in g if r.tile_y == 1 and r.tile_x == 1)
    assert (last.tile_h, last.tile_w) == (2, 5)

    assert spec.x_labels()[0] == 0.0 and spec.x_labels(center=True)[0] == 5.0
    assert spec.y_labels()[0] == 60.0 and spec.y_labels(center=True)[0] == 55.0


def test_stack_surfaces_xy_coords_toggle(spark):
    """Reference stack.py:216: xy_coords='topleft'|'center' on the façade."""
    import numpy as np
    import pytest as _pytest

    from stackstac_spark.stack import stack
    from tests.conftest import make_item

    items = [make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 8.0, 8.0))]
    st_tl = stack(spark, items, assets=["red"], chunksize=8)
    st_c = stack(spark, items, assets=["red"], chunksize=8, xy_coords="center")
    xs_tl = [r.x for r in st_tl.xy_coord_tables()[0].orderBy("col").collect()]
    xs_c = [r.x for r in st_c.xy_coord_tables()[0].orderBy("col").collect()]
    # reference semantics: linspace of top-left corners, center = +res/2
    np.testing.assert_allclose(xs_tl, np.arange(8) * 1.0)
    np.testing.assert_allclose(xs_c, np.arange(8) * 1.0 + 0.5)
    ys_c = [r.y for r in st_c.xy_coord_tables()[1].orderBy("row").collect()]
    np.testing.assert_allclose(ys_c, 8.0 - np.arange(8) * 1.0 - 0.5)
    with _pytest.raises(ValueError, match="xy_coords"):
        stack(spark, items, assets=["red"], xy_coords="corner")


def test_exception_matches_subclasses():
    """A subclass of a named exception type still matches its pattern
    (reference nodata_reader.py uses isinstance; we match over the MRO)."""
    from stackstac_spark.sources.raster import _exception_matches

    class RasterioIOError(IOError):
        pass

    class CurlError(RasterioIOError):
        pass

    pats = (("RasterioIOError", r"HTTP response code: 404"),)
    assert _exception_matches(RasterioIOError("HTTP response code: 404"), pats)
    assert _exception_matches(CurlError("HTTP response code: 404"), pats)
    assert not _exception_matches(CurlError("HTTP response code: 500"), pats)
    assert not _exception_matches(ValueError("HTTP response code: 404"), pats)


def test_bbox2d_handles_3d_stac_bbox():
    from stackstac_spark.sources.stac import _bbox2d

    assert _bbox2d([1.0, 2.0, 3.0, 4.0]) == [1.0, 2.0, 3.0, 4.0]
    # 3-D bbox [w, s, minz, e, n, maxz] → [w, s, e, n], NOT first-4
    assert _bbox2d([1.0, 2.0, -10.0, 3.0, 4.0, 99.0]) == [1.0, 2.0, 3.0, 4.0]
    assert _bbox2d([1.0, 2.0, 3.0]) is None
    assert _bbox2d(None) is None


def test_trans_bounds_includes_rotation_terms(spark):
    """A 90°-rotated geotransform (a=e=0, b/d carry the scale) must still
    produce the correct 4-corner bounds, not a degenerate zero-width box."""
    from stackstac_spark.stack import stack as _stack

    item = {
        "id": "rot-0",
        "bbox": [0.0, 0.0, 1.0, 1.0],
        "properties": {"datetime": "2024-01-01T00:00:00Z", "proj:epsg": 32613},
        "assets": {
            "b1": {
                "href": "fake://0/0",
                "type": "image/tiff",
                # x = 10*row + 100, y = -10*col + 300: a=e=0, rotation only
                "proj:transform": [0.0, 10.0, 100.0, -10.0, 0.0, 300.0],
                "proj:shape": [10, 10],
            }
        },
    }
    st = _stack(
        spark, [item], assets=["b1"], epsg=32613, resolution=10.0, chunksize=32
    )
    minx, miny, maxx, maxy = st.spec.bounds
    # corners: x ∈ [100, 100+10*10], y ∈ [300-10*10, 300]
    assert (minx, maxy) == (100.0, 300.0)
    assert (maxx, miny) == (200.0, 200.0)
