"""Dense export: re-synthesize fill values from the sparse tile table.

The engine never materializes dense 4-D data distributed-side (SURVEY §7's
representation decision); density is an *export* concern, like the
reference's final xr.DataArray assembly (stack.py:314-326). Only for small
AOIs / tests — the driver-side array is O(time × band × h × w).
"""

from __future__ import annotations

import numpy as np

from stackstac_spark.raster_spec import RasterSpec


def to_dense_array(stack) -> np.ndarray:
    """RasterStack → dense (time, band, y, x) float64 ndarray, NaN-filled.

    Missing tiles (absent rows) become fill — identical semantics to the
    reference's empty-chunk broadcast trick (to_dask.py:168-175) without ever
    shipping fill tiles over the network.
    """
    spec: RasterSpec = stack.spec
    h, w = spec.shape
    item_rows = stack.items_df.select("item_idx").distinct().collect()
    item_idxs = sorted(r.item_idx for r in item_rows)
    pos = {idx: k for k, idx in enumerate(item_idxs)}
    n_t = len(item_idxs)
    n_b = len(stack.asset_ids)
    out = np.full((n_t, n_b, h, w), np.nan, dtype="float64")
    for row in stack.tiles.collect():
        if row.item_idx not in pos:
            continue
        arr = np.frombuffer(row.data, dtype="float64").reshape(row.tile_h, row.tile_w)
        out[
            pos[row.item_idx],
            row.band_idx,
            row.row_off : row.row_off + row.tile_h,
            row.col_off : row.col_off + row.tile_w,
        ] = arr
    return out
