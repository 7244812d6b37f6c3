"""RasterSpec — the common output grid every asset is projected onto.

Semantics match the reference's ``raster_spec.py`` (/root/reference/
stackstac/raster_spec.py:12-63): a north-up rectilinear grid defined by an
EPSG code, bounds ``(minx, miny, maxx, maxy)`` and per-axis resolutions.
``shape`` uses GDAL's snap-rounding ``int((max - min + res/2) / res)``
(raster_spec.py:42-53) and ``snapped_bounds`` reproduces GDAL ``-tap``
(geom_utils.py:71-80). These roundings are load-bearing — the reference's own
changelog records off-by-half-pixel bugs — so they live here, in one place,
and the tile grid, window math and coordinate labels all derive from them.

The spec is a tiny immutable value: on a cluster it travels inside closures /
literal columns (broadcast by value), never as a shuffled row.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

Bbox = tuple[float, float, float, float]


class Window(NamedTuple):
    """A pixel-space window on the output grid (row/col offsets + size)."""

    row_off: int
    col_off: int
    height: int
    width: int

    def intersects(self, other: "Window") -> bool:
        return (
            self.row_off < other.row_off + other.height
            and other.row_off < self.row_off + self.height
            and self.col_off < other.col_off + other.width
            and other.col_off < self.col_off + self.width
        )


@dataclass(frozen=True)
class RasterSpec:
    epsg: int
    bounds: Bbox  # (minx, miny, maxx, maxy)
    resolutions_xy: tuple[float, float]

    def __post_init__(self) -> None:
        minx, miny, maxx, maxy = self.bounds
        if minx >= maxx or miny >= maxy:
            raise ValueError(f"Bounds must be non-empty, got {self.bounds}")
        xres, yres = self.resolutions_xy
        if xres <= 0 or yres <= 0:
            raise ValueError(f"Resolutions must be positive, got {self.resolutions_xy}")

    @property
    def transform(self) -> tuple[float, float, float, float, float, float]:
        """North-up affine (a, b, c, d, e, f): x = a*col + c ; y = e*row + f."""
        xres, yres = self.resolutions_xy
        return (xres, 0.0, self.bounds[0], 0.0, -yres, self.bounds[3])

    @property
    def shape(self) -> tuple[int, int]:
        """(height, width) with GDAL rounding: int((max-min+res/2)/res)."""
        minx, miny, maxx, maxy = self.bounds
        xres, yres = self.resolutions_xy
        width = int((maxx - minx + xres / 2) / xres)
        height = int((maxy - miny + yres / 2) / yres)
        return (height, width)

    def snapped(self) -> "RasterSpec":
        """Snap bounds outward to whole multiples of the resolution (-tap)."""
        return RasterSpec(self.epsg, snapped_bounds(self.bounds, self.resolutions_xy), self.resolutions_xy)

    # -- pixel <-> world -------------------------------------------------
    def window_from_bounds(self, bounds: Bbox) -> tuple[float, float, float, float]:
        """Fractional (row_off, col_off, height, width) of ``bounds`` on this
        grid — the analogue of rasterio ``windows.from_bounds`` the reference
        uses at to_dask.py:116-124."""
        minx, miny, maxx, maxy = bounds
        xres, yres = self.resolutions_xy
        gminx, _, _, gmaxy = self.bounds
        col_off = (minx - gminx) / xres
        row_off = (gmaxy - maxy) / yres
        return (row_off, col_off, (maxy - miny) / yres, (maxx - minx) / xres)

    def pixel_window_from_bounds(self, bounds: Bbox) -> Window:
        """Integer window covering ``bounds``, outward-rounded."""
        row_off, col_off, h, w = self.window_from_bounds(bounds)
        r0 = math.floor(row_off + 1e-9)
        c0 = math.floor(col_off + 1e-9)
        r1 = math.ceil(row_off + h - 1e-9)
        c1 = math.ceil(col_off + w - 1e-9)
        return Window(r0, c0, max(r1 - r0, 0), max(c1 - c0, 0))

    def x_labels(self, center: bool = False) -> list[float]:
        """x labels: linspace(min, max, n, endpoint=False) top-left corners,
        optionally shifted by half a pixel to centers — the reference's
        ``xy_coords="topleft"|"center"`` (prepare.py:445-461)."""
        h, w = self.shape
        minx, _, maxx, _ = self.bounds
        step = (maxx - minx) / w
        off = step / 2 if center else 0.0
        return [minx + off + i * step for i in range(w)]

    def y_labels(self, center: bool = False) -> list[float]:
        h, w = self.shape
        _, miny, _, maxy = self.bounds
        step = (maxy - miny) / h
        off = step / 2 if center else 0.0
        return [maxy - off - i * step for i in range(h)]


def snapped_bounds(bounds: Bbox, resolutions_xy: tuple[float, float]) -> Bbox:
    """GDAL -tap: floor mins / ceil maxes to multiples of the resolution
    (reference geom_utils.py:71-80)."""
    minx, miny, maxx, maxy = bounds
    xres, yres = resolutions_xy
    return (
        math.floor(minx / xres) * xres,
        math.floor(miny / yres) * yres,
        math.ceil(maxx / xres) * xres,
        math.ceil(maxy / yres) * yres,
    )


def union_bounds(*bounds: Bbox) -> Bbox:
    """Bbox union (reference geom_utils.py:56-63)."""
    minxs, minys, maxxs, maxys = zip(*bounds)
    return (min(minxs), min(minys), max(maxxs), max(maxys))


def bounds_overlap(a: Bbox, b: Bbox) -> bool:
    """Strict interior overlap (reference geom_utils.py:66-68)."""
    aminx, aminy, amaxx, amaxy = a
    bminx, bminy, bmaxx, bmaxy = b
    return aminx < bmaxx and bminx < amaxx and aminy < bmaxy and bminy < amaxy
