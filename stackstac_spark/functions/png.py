"""PNG tile encoding — pure stdlib (zlib) re-expression of the reference's
``arr_to_png`` (show.py:915-967): normalize by a display range, apply a
colormap or greyscale→RGB, alpha from the NaN mask, optional checkerboard
for missing data, encode RGBA PNG bytes.

PIL is not available in this container, so the PNG container format is
written directly (signature + IHDR + IDAT(zlib) + IEND — the format is an
open W3C standard). Colormaps are embedded anchor tables (matplotlib's
published viridis/magma endpoints), linearly interpolated.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# anchor colors (RGB 0-255) sampled from the published colormap definitions
_CMAPS = {
    "viridis": [
        (68, 1, 84), (71, 44, 122), (59, 81, 139), (44, 113, 142), (33, 144, 141),
        (39, 173, 129), (92, 200, 99), (170, 220, 50), (253, 231, 37),
    ],
    "magma": [
        (0, 0, 4), (40, 11, 84), (101, 21, 110), (159, 42, 99), (212, 72, 66),
        (245, 125, 21), (250, 193, 39), (252, 253, 191),
    ],
    "greys": [(0, 0, 0), (255, 255, 255)],
}


def _apply_cmap(norm: np.ndarray, cmap: str) -> np.ndarray:
    """norm in [0,1] (h, w) → uint8 RGB (h, w, 3) by linear interpolation."""
    anchors = np.asarray(_CMAPS[cmap], dtype="float64")
    pos = norm * (len(anchors) - 1)
    lo = np.clip(np.floor(pos).astype(int), 0, len(anchors) - 2)
    frac = (pos - lo)[..., None]
    rgb = anchors[lo] * (1 - frac) + anchors[lo + 1] * frac
    return rgb.astype("uint8")


def make_checkerboard(shape: tuple[int, int], size: int = 8) -> np.ndarray:
    """Boolean checkerboard for missing data (show.py:973-978) — True on the
    cells that get the faint alpha-30 overlay."""
    h, w = shape
    yy, xx = np.meshgrid(np.arange(h) // size, np.arange(w) // size, indexing="ij")
    return ((yy + xx) % 2).astype(bool)


def encode_png_rgba(rgba: np.ndarray) -> bytes:
    """uint8 (h, w, 4) → PNG bytes. Pure zlib; one IDAT chunk."""
    h, w, c = rgba.shape
    assert c == 4 and rgba.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype="uint8"), rgba.reshape(h, w * 4)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def arr_to_png(
    arr: np.ndarray,
    range: tuple[float, float],
    cmap: str | None = None,
    checkerboard: bool = True,
) -> bytes:
    """(band, h, w) float array → PNG bytes (reference show.py:915-967).

    1 band → colormap (or greyscale); 2-3 bands → RGB (3rd band zero-filled
    if absent); NaN → transparent (optionally over a checkerboard).
    """
    vmin, vmax = range
    nb = arr.shape[0]
    mask = np.isnan(arr).any(axis=0)
    denom = (vmax - vmin) or 1.0
    norm = np.clip((arr - vmin) / denom, 0.0, 1.0)
    norm = np.where(np.isnan(norm), 0.0, norm)
    if nb == 1:
        rgb = _apply_cmap(norm[0], cmap or "viridis")
    else:
        if nb == 2:
            # reference show.py:957-960: 2-band input duplicates band 0 as
            # the blue channel ([b0, b1, b0]), not zero-fill
            norm = np.concatenate([norm, norm[:1]], axis=0)
        rgb = (norm[:3] * 255).astype("uint8").transpose(1, 2, 0)
    alpha = np.where(mask, 0, 255).astype("uint8")
    if checkerboard:
        # reference show.py:951-953: checker cells over missing data become
        # FAINTLY visible (alpha 30), the rest stay fully transparent
        checkers = make_checkerboard(mask.shape)
        alpha[(alpha == 0) & checkers] = 30
    rgba = np.concatenate([rgb, alpha[..., None]], axis=2)
    return encode_png_rgba(np.ascontiguousarray(rgba))


_EMPTY_CACHE: dict[tuple, bytes] = {}


def empty_tile(shape: tuple[int, int] = (256, 256), checkerboard: bool = True) -> bytes:
    """All-NaN PNG, cached (show.py:981-984)."""
    key = (shape, checkerboard)
    if key not in _EMPTY_CACHE:
        _EMPTY_CACHE[key] = arr_to_png(
            np.full((1, *shape), np.nan), (0.0, 1.0), checkerboard=checkerboard
        )
    return _EMPTY_CACHE[key]
