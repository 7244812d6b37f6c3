"""Parameterized-projection kernels (LCC / Albers / LAEA / CEA / UPS / TM).

The reference delegates all CRS math to pyproj (geom_utils.py:15-53);
these tests pin our built-in kernels to the published EPSG Guidance Note
7-2 worked examples and to projection *properties* that hold by
construction (equal-area Jacobian, conformal scale at standard
parallels, grid-origin anchors, round-trips) — fixtures that cannot
drift with the implementation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stackstac_spark.functions import proj as P
from stackstac_spark.functions.proj import reproject_bounds, transform_xy

# (epsg, lon-lat sampling domain, ellipsoid) for every table entry
DOMAINS = {
    2154: ((-4, 9, 41.5, 51), "GRS80"),
    3978: ((-140, -55, 42, 83), "GRS80"),
    5070: ((-124, -67, 24, 49), "GRS80"),
    3577: ((112, 154, -44, -9), "GRS80"),
    3035: ((-10, 35, 34, 71), "GRS80"),
    6931: ((-180, 180, 45, 89.5), "WGS84"),
    6932: ((-180, 180, -89.5, -45), "WGS84"),
    6933: ((-179, 179, -85, 85), "WGS84"),
    5041: ((-180, 180, 60, 89.9), "WGS84"),
    5042: ((-180, 180, -89.9, -60), "WGS84"),
    32661: ((-180, 180, 60, 89.9), "WGS84"),
    32761: ((-180, 180, -89.9, -60), "WGS84"),
    2193: ((166, 179, -47.5, -34), "GRS80"),
}


# --- published EPSG worked examples (Guidance Note 7-2) ---------------------


def test_laea_epsg_worked_example():
    """ETRS89 / LAEA Europe (EPSG:3035): 50°N 5°E → E 3962799.45, N 2999718.85."""
    x, y = transform_xy(4326, 3035, np.array([5.0]), np.array([50.0]))
    assert abs(x[0] - 3962799.45) < 0.01
    assert abs(y[0] - 2999718.85) < 0.01


def test_ups_epsg_worked_example():
    """Polar Stereographic variant A (WGS84 / UPS North, EPSG:5041):
    73°N 44°E → E 3320416.75, N 632668.43."""
    x, y = transform_xy(4326, 5041, np.array([44.0]), np.array([73.0]))
    assert abs(x[0] - 3320416.75) < 0.01
    assert abs(y[0] - 632668.43) < 0.01
    # 32661 is the same projection with (N,E) axis order; values identical
    x2, y2 = transform_xy(4326, 32661, np.array([44.0]), np.array([73.0]))
    assert x2[0] == x[0] and y2[0] == y[0]


def test_lcc_epsg_worked_example_clarke1866():
    """LCC 2SP worked example (NAD27 / Texas South Central, Clarke 1866 in
    US survey feet): 28°30'N 96°W → E 2963503.91, N 254759.80 ft — exercises
    the kernel's any-ellipsoid path."""
    a, e2 = P._ELLIPSOIDS["CLARKE1866_USFT"]
    lat1, lat2, lat0 = 28 + 23 / 60, 30 + 17 / 60, 27 + 50 / 60
    x, y = P._ll_to_lcc(
        np.array([-96.0]), np.array([28.5]), a, e2, lat1, lat2, lat0, -99.0, 2000000.0, 0.0
    )
    assert abs(x[0] - 2963503.91) < 0.02
    assert abs(y[0] - 254759.80) < 0.02
    lon, lat = P._lcc_to_ll(x, y, a, e2, lat1, lat2, lat0, -99.0, 2000000.0, 0.0)
    assert abs(lon[0] - -96.0) < 1e-9 and abs(lat[0] - 28.5) < 1e-9


# --- grid-origin anchors (exact by definition of the false origin) ----------


@pytest.mark.parametrize(
    "epsg,lonlat,expect",
    [
        (2154, (3.0, 46.5), (700000.0, 6600000.0)),
        (3978, (-95.0, 49.0), (0.0, 0.0)),
        (5070, (-96.0, 23.0), (0.0, 0.0)),
        (3577, (132.0, 0.0), (0.0, 0.0)),
        (3035, (10.0, 52.0), (4321000.0, 3210000.0)),
        (6931, (0.0, 90.0), (0.0, 0.0)),
        (6932, (0.0, -90.0), (0.0, 0.0)),
        (6933, (0.0, 0.0), (0.0, 0.0)),
        (5041, (0.0, 90.0), (2000000.0, 2000000.0)),
        (5042, (0.0, -90.0), (2000000.0, 2000000.0)),
        (2193, (173.0, 0.0), (1600000.0, 10000000.0)),
    ],
)
def test_grid_origin_anchor(epsg, lonlat, expect):
    x, y = transform_xy(4326, epsg, np.array([lonlat[0]]), np.array([lonlat[1]]))
    assert abs(x[0] - expect[0]) < 1e-6
    assert abs(y[0] - expect[1]) < 1e-6


# --- round-trips over each CRS's real-world domain --------------------------


@pytest.mark.parametrize("epsg", sorted(DOMAINS))
def test_roundtrip_domain(epsg):
    (lo1, lo2, la1, la2), _ = DOMAINS[epsg]
    rng = np.random.default_rng(epsg)
    lon = rng.uniform(lo1, lo2, 400)
    lat = rng.uniform(la1, la2, 400)
    x, y = transform_xy(4326, epsg, lon, lat)
    lon2, lat2 = transform_xy(epsg, 4326, x, y)
    # sub-µm: conformal series + Newton-refined authalic inverse
    assert np.max(np.abs(lon2 - lon)) < 1e-10
    assert np.max(np.abs(lat2 - lat)) < 1e-10


# --- projection properties ---------------------------------------------------


def _area_scale(epsg, lon, lat, ell):
    """|det J| of (lon,lat)→(x,y) divided by the ellipsoid area element —
    identically 1 for an equal-area projection."""
    a, e2 = P._ELLIPSOIDS[ell]
    h = 1e-6
    x0, y0 = transform_xy(4326, epsg, lon, lat)
    xl, yl = transform_xy(4326, epsg, lon + h, lat)
    xp, yp = transform_xy(4326, epsg, lon, lat + h)
    det = np.abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / h**2 * (180 / np.pi) ** 2
    phi = np.radians(lat)
    d_a = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
    return det / d_a


@pytest.mark.parametrize("epsg,dom", [(5070, (-124, -67, 25, 48)), (3577, (113, 153, -43, -10)), (3035, (-8, 32, 36, 70)), (6931, (-170, 170, 50, 85)), (6932, (-170, 170, -85, -50)), (6933, (-170, 170, -80, 80))])
def test_equal_area_jacobian(epsg, dom):
    _, ell = DOMAINS[epsg]
    rng = np.random.default_rng(epsg)
    lon = rng.uniform(dom[0], dom[1], 200)
    lat = rng.uniform(dom[2], dom[3], 200)
    r = _area_scale(epsg, lon, lat, ell)
    assert np.max(np.abs(r - 1)) < 1e-5


def _k_along_parallel(epsg, lon, lat, ell):
    a, e2 = P._ELLIPSOIDS[ell]
    h = 1e-6
    x0, y0 = transform_xy(4326, epsg, lon, lat)
    xl, yl = transform_xy(4326, epsg, lon + h, lat)
    dist = np.hypot(xl - x0, yl - y0) / h * 180 / np.pi
    phi = np.radians(lat)
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    return dist / (nu * np.cos(phi))


def _k_along_meridian(epsg, lon, lat, ell):
    a, e2 = P._ELLIPSOIDS[ell]
    h = 1e-6
    x0, y0 = transform_xy(4326, epsg, lon, lat)
    xp, yp = transform_xy(4326, epsg, lon, lat + h)
    dist = np.hypot(xp - x0, yp - y0) / h * 180 / np.pi
    phi = np.radians(lat)
    rho = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    return dist / rho


@pytest.mark.parametrize("epsg,sps,lons", [(2154, (44.0, 49.0), (-2, 8)), (3978, (49.0, 77.0), (-130, -60))])
def test_lcc_unit_scale_at_standard_parallels(epsg, sps, lons):
    _, ell = DOMAINS[epsg]
    rng = np.random.default_rng(epsg)
    for sp in sps:
        lon = rng.uniform(lons[0], lons[1], 50)
        lat = np.full(50, sp)
        k = _k_along_parallel(epsg, lon, lat, ell)
        assert np.max(np.abs(k - 1)) < 1e-7


def test_lcc_conformal_isotropy():
    """Conformal ⇒ scale along parallel == scale along meridian everywhere."""
    _, ell = DOMAINS[2154]
    rng = np.random.default_rng(42)
    lon = rng.uniform(-2, 8, 100)
    lat = rng.uniform(42, 50.5, 100)
    kp = _k_along_parallel(2154, lon, lat, ell)
    km = _k_along_meridian(2154, lon, lat, ell)
    assert np.max(np.abs(kp / km - 1)) < 1e-5


def test_ups_scale_at_pole_is_k0():
    """Variant A fixes k0=0.994 at the pole (vs variant B's k=1 at lat_ts).
    Measured at 89.9° where the finite difference is well-conditioned; the
    k(φ) deviation from k0 there is ~1e-6, far under the tolerance."""
    _, ell = DOMAINS[5041]
    lon = np.array([0.0, 45.0, 135.0])
    lat = np.full(3, 89.9)
    k = _k_along_parallel(5041, lon, lat, ell)
    assert np.max(np.abs(k - 0.994)) < 1e-4


def test_nztm_matches_utm_kernel_shape():
    """NZTM is TM with a different false origin: at the central meridian the
    easting is exactly FE and northings track the (shared) meridian-arc
    kernel used by the UTM zones."""
    lat = np.array([-34.0, -41.0, -47.0])
    x, y = transform_xy(4326, 2193, np.full(3, 173.0), lat)
    assert np.allclose(x, 1600000.0, atol=1e-6)
    # UTM zone 59S has CM 171°E and FN 1e7 — same kernel, different origin:
    xu, yu = transform_xy(4326, 32759, np.full(3, 171.0), lat)
    assert np.allclose(y, yu, atol=1e-6)


def test_ease_grid_cea_row_spacing_symmetry():
    """EASE-Grid 2.0 global (6933) is equal-area cylindrical: northings are
    odd-symmetric in latitude and eastings depend only on longitude."""
    lon = np.array([10.0, 10.0, -120.0])
    lat = np.array([35.0, -35.0, 35.0])
    x, y = transform_xy(4326, 6933, lon, lat)
    assert abs(y[0] + y[1]) < 1e-6
    assert abs(x[0] - x[1]) < 1e-9
    assert abs(y[0] - y[2]) < 1e-9


def test_polar_laea_azimuthal_geometry():
    """The polar LAEA branch (6931) is azimuthal: ρ depends on latitude only,
    the grid azimuth equals the longitude, and (with the equal-area Jacobian
    test above) that uniquely pins ρ(φ) = a·sqrt(qp − q). Together these
    replace a numerically-degenerate 'oblique kernel in the polar limit'
    comparison (D = a·m0/(Rq·cosβ0) diverges as lat0 → 90)."""
    lons = np.array([0.0, 60.0, -135.0, 178.0])
    lat = np.full(4, 71.0)
    x, y = transform_xy(4326, 6931, lons, lat)
    rho = np.hypot(x, y)
    assert np.max(np.abs(rho - rho[0])) < 1e-6
    az = np.degrees(np.arctan2(x, -y))
    assert np.max(np.abs(((az - lons) + 180) % 360 - 180)) < 1e-9


def test_reproject_bounds_laea():
    """4-corner bbox reprojection into 3035 hits the envelope of the corner
    transforms (same contract the polar test pins for 3031)."""
    minx, miny, maxx, maxy = 4.0, 45.0, 12.0, 52.0
    b = reproject_bounds((minx, miny, maxx, maxy), 4326, 3035)
    cx = np.array([minx, maxx, minx, maxx])
    cy = np.array([miny, miny, maxy, maxy])
    tx, ty = transform_xy(4326, 3035, cx, cy)
    assert b == (tx.min(), ty.min(), tx.max(), ty.max())


@settings(max_examples=40, deadline=None)
@given(
    lon=st.floats(min_value=-3.5, max_value=8.5),
    lat=st.floats(min_value=41.5, max_value=50.9),
)
def test_lambert93_roundtrip_fuzz(lon, lat):
    x, y = transform_xy(4326, 2154, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform_xy(2154, 4326, x, y)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


def test_crs_chain_through_hub():
    """Cross-CRS chains compose through the lon/lat hub: 2154 → 3035 → 2154."""
    lon = np.array([2.35, 5.4])
    lat = np.array([48.85, 43.3])
    x, y = transform_xy(4326, 2154, lon, lat)
    ex, ey = transform_xy(2154, 3035, x, y)
    x2, y2 = transform_xy(3035, 2154, ex, ey)
    assert np.max(np.abs(x2 - x)) < 1e-5
    assert np.max(np.abs(y2 - y)) < 1e-5


def test_unsupported_crs_error_names_families():
    with pytest.raises(NotImplementedError, match="LCC/Albers/LAEA/CEA/UPS/oblique-"):
        transform_xy(27700, 4326, np.array([0.0]), np.array([0.0]))
