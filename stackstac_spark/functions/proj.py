"""Coordinate reprojection — pure-Python/numpy, pyproj-compatible subset.

The reference leans on pyproj (geom_utils.py:15,42-53) for two things:
(1) reprojecting asset bboxes into the output CRS during prepare, and
(2) inverse-transforming output pixel grids during ``reproject_array``.
pyproj is not in this container, so this module implements the projections
the STAC ecosystem actually uses — EPSG:4326 (lon/lat), EPSG:3857
(Web Mercator), the UTM zones (326xx/327xx, Transverse Mercator on
WGS84), and the polar stereographic grids (3031/3032/3413/3976/3995 —
EPSG method 9829 "variant B") — from the published formulas
(Karney/Krüger series and Snyder, *Map Projections — A Working Manual*,
§21). If pyproj IS importable it is preferred, transparently.

All kernels are numpy-vectorized so they slot into Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

try:  # pragma: no cover - environment-dependent
    from pyproj import Transformer as _PyprojTransformer

    _HAVE_PYPROJ = True
except Exception:  # pragma: no cover
    _HAVE_PYPROJ = False

# WGS84
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)
_K0 = 0.9996  # UTM scale factor
_MERC_MAX_LAT = 85.06


def _utm_zone(epsg: int) -> tuple[int, bool] | None:
    """(zone, is_north) for EPSG:326xx/327xx, else None."""
    if 32601 <= epsg <= 32660:
        return epsg - 32600, True
    if 32701 <= epsg <= 32760:
        return epsg - 32700, False
    return None


# Polar Stereographic (EPSG method 9829, "variant B") parameter sets for the
# common polar grids — (standard_parallel_deg, lon_origin_deg, FE, FN). The
# most common non-UTM real-world CRSs on STAC items (Antarctic / Arctic
# collections); the reference handles them via pyproj (geom_utils.py:15-53).
_PS_PARAMS: dict[int, tuple[float, float, float, float]] = {
    3031: (-71.0, 0.0, 0.0, 0.0),  # WGS84 / Antarctic Polar Stereographic
    3032: (-71.0, 70.0, 6000000.0, 6000000.0),  # Australian Antarctic
    3413: (70.0, -45.0, 0.0, 0.0),  # NSIDC Sea Ice Polar Stereographic North
    3976: (-70.0, 0.0, 0.0, 0.0),  # NSIDC Sea Ice Polar Stereographic South
    3995: (71.0, 0.0, 0.0, 0.0),  # WGS84 / Arctic Polar Stereographic
}


def _supported(epsg: int) -> bool:
    return (
        epsg in (4326, 3857) or epsg in _PS_PARAMS or _utm_zone(epsg) is not None
    )


# --- Web Mercator ---------------------------------------------------------


def _ll_to_merc(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = np.clip(lat, -_MERC_MAX_LAT, _MERC_MAX_LAT)
    x = _A * np.radians(lon)
    y = _A * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def _merc_to_ll(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.degrees(x / _A)
    lat = np.degrees(2 * np.arctan(np.exp(y / _A)) - np.pi / 2)
    return lon, lat


# --- Transverse Mercator (UTM) -------------------------------------------
# Krüger series, 6th-order in n (same expansion pyproj/GeographicLib use to
# ~nm accuracy); coefficients from the published Karney 2011 paper.

_N = _F / (2 - _F)
_N2, _N3, _N4, _N5, _N6 = _N**2, _N**3, _N**4, _N**5, _N**6
# meridian-arc scale
_A1 = _A / (1 + _N) * (1 + _N2 / 4 + _N4 / 64 + _N6 / 256)
# forward (alpha) and reverse (beta) series
_ALPHA = (
    _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288 + 7891 * _N6 / 37800,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630 - 1983433 * _N6 / 1935360,
    61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880 + 167603 * _N6 / 181440,
    49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
    34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
    212378941 * _N6 / 319334400,
)
_BETA = (
    _N / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360 - 81 * _N5 / 512 + 96199 * _N6 / 604800,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105 - 1118711 * _N6 / 3870720,
    17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480 + 5569 * _N6 / 90720,
    4397 * _N4 / 161280 - 11 * _N5 / 504 - 830251 * _N6 / 7257600,
    4583 * _N5 / 161280 - 108847 * _N6 / 3991680,
    20648693 * _N6 / 638668800,
)


def _ll_to_utm(lon: np.ndarray, lat: np.ndarray, zone: int, north: bool) -> tuple[np.ndarray, np.ndarray]:
    lon0 = math.radians(zone * 6 - 183)
    phi = np.radians(lat)
    lam = np.radians(lon) - lon0
    # conformal latitude
    t = np.sinh(np.arctanh(np.sin(phi)) - _E * np.arctanh(_E * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = _K0 * _A1 * eta + 500000.0
    y = _K0 * _A1 * xi + (0.0 if north else 10000000.0)
    return x, y


def _utm_to_ll(x: np.ndarray, y: np.ndarray, zone: int, north: bool) -> tuple[np.ndarray, np.ndarray]:
    lon0 = math.radians(zone * 6 - 183)
    xi = (y - (0.0 if north else 10000000.0)) / (_K0 * _A1)
    eta = (x - 500000.0) / (_K0 * _A1)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # fixed-point iteration: conformal -> geodetic latitude
    phi = chi.copy()
    for _ in range(6):
        s = np.sin(phi)
        phi = np.arctan(np.sinh(np.arcsinh(np.tan(chi)) + _E * np.arctanh(_E * s)))
    return np.degrees(lam + lon0), np.degrees(phi)


# --- Polar Stereographic (EPSG 9829 variant B; Snyder 1987 §21) ------------
# Ellipsoidal formulas from the published EPSG Guidance Note 7-2 / Snyder.
# Validated against the EPSG worked example for EPSG:3032 (75°S 120°E →
# E 7255380.79, N 7053389.56) in tests/test_units.py.


def _ps_t(phi: np.ndarray, south: bool) -> np.ndarray:
    """Isometric-latitude half-angle function t(φ) (Snyder eq. 15-9)."""
    s = np.sin(phi)
    es = ((1 + _E * s) / (1 - _E * s)) ** (_E / 2)
    if south:
        return np.tan(np.pi / 4 + phi / 2) / es
    return np.tan(np.pi / 4 - phi / 2) * es


def _ps_consts(epsg: int) -> tuple[float, float, float, float, float, bool]:
    lat_ts, lon0, fe, fn = _PS_PARAMS[epsg]
    south = lat_ts < 0
    phi_f = math.radians(lat_ts)
    s = math.sin(phi_f)
    m_f = math.cos(phi_f) / math.sqrt(1 - _E2 * s * s)
    t_f = float(_ps_t(np.array(phi_f), south))
    return math.radians(lon0), fe, fn, m_f, t_f, south


def _ll_to_ps(lon: np.ndarray, lat: np.ndarray, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    lon0, fe, fn, m_f, t_f, south = _ps_consts(epsg)
    phi = np.radians(lat)
    theta = np.radians(lon) - lon0
    rho = _A * m_f * _ps_t(phi, south) / t_f
    x = fe + rho * np.sin(theta)
    y = fn + (rho if south else -rho) * np.cos(theta)
    return x, y


def _ps_to_ll(x: np.ndarray, y: np.ndarray, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    lon0, fe, fn, m_f, t_f, south = _ps_consts(epsg)
    dx = np.asarray(x, dtype="float64") - fe
    dy = np.asarray(y, dtype="float64") - fn
    rho = np.hypot(dx, dy)
    t = rho * t_f / (_A * m_f)
    if south:
        chi = 2 * np.arctan(t) - np.pi / 2
        lam = np.arctan2(dx, dy)
    else:
        chi = np.pi / 2 - 2 * np.arctan(t)
        lam = np.arctan2(dx, -dy)
    # conformal → geodetic latitude, Snyder eq. 3-5 series in e²
    e2, e4, e6, e8 = _E2, _E2**2, _E2**3, _E2**4
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
        + (4279 * e8 / 161280) * np.sin(8 * chi)
    )
    # the pole itself has no defined longitude; pin it to λ0 like pyproj
    lam = np.where(rho == 0, 0.0, lam)
    return np.degrees(lam + lon0), np.degrees(phi)


# --- public API ------------------------------------------------------------


@lru_cache(maxsize=64)
def _pyproj_transformer(src: int, dst: int):  # pragma: no cover
    return _PyprojTransformer.from_crs(src, dst, always_xy=True)


def transform_xy(
    src_epsg: int, dst_epsg: int, xs: np.ndarray, ys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized coordinate transform between two EPSG CRSs."""
    xs = np.asarray(xs, dtype="float64")
    ys = np.asarray(ys, dtype="float64")
    if src_epsg == dst_epsg:
        return xs, ys
    if _HAVE_PYPROJ:  # pragma: no cover
        return _pyproj_transformer(src_epsg, dst_epsg).transform(xs, ys)
    if not (_supported(src_epsg) and _supported(dst_epsg)):
        raise NotImplementedError(
            f"CRS pair {src_epsg}->{dst_epsg} needs pyproj (not installed); "
            "built-in support covers 4326, 3857, UTM 326xx/327xx and the "
            f"polar stereographic grids {sorted(_PS_PARAMS)}"
        )
    # go through lon/lat
    if src_epsg == 4326:
        lon, lat = xs, ys
    elif src_epsg == 3857:
        lon, lat = _merc_to_ll(xs, ys)
    elif src_epsg in _PS_PARAMS:
        lon, lat = _ps_to_ll(xs, ys, src_epsg)
    else:
        zone, north = _utm_zone(src_epsg)  # type: ignore[misc]
        lon, lat = _utm_to_ll(xs, ys, zone, north)
    if dst_epsg == 4326:
        return lon, lat
    if dst_epsg == 3857:
        return _ll_to_merc(lon, lat)
    if dst_epsg in _PS_PARAMS:
        return _ll_to_ps(lon, lat, dst_epsg)
    zone, north = _utm_zone(dst_epsg)  # type: ignore[misc]
    return _ll_to_utm(lon, lat, zone, north)


def reproject_bounds(
    bounds: tuple[float, float, float, float], src_epsg: int, dst_epsg: int
) -> tuple[float, float, float, float]:
    """4-corner bbox reprojection, exactly as the reference does it
    (geom_utils.py:42-53) — NOT the naive 2-corner version, which is wrong
    whenever the transform rotates/curves the box."""
    minx, miny, maxx, maxy = bounds
    xs = np.array([minx, maxx, minx, maxx])
    ys = np.array([miny, miny, maxy, maxy])
    tx, ty = transform_xy(src_epsg, dst_epsg, xs, ys)
    return (float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max()))
