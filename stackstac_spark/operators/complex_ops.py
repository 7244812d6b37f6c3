"""Complex-dtype stacks (reference testing/strategies.py:26-31 fuzzes
complex64/128 rasters).

Spark SQL has no complex type, so the representation is:

- the TILE plane stores complex dtypes natively — ``data`` is raw C-order
  bytes of whatever ``np.dtype`` the stack declares, and every byte-opaque
  path (scan, compute/dense export, tile checkpointing) works unchanged;
- the RELATIONAL plane (pixel view, mosaics, reductions) is served by
  ``split_complex``, which reinterprets a complex tile table as two float
  tile tables (real, imag) — the struct-of-two-doubles representation
  flattened to the existing schema, so every float operator composes with
  complex data with zero new operator code.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stackstac_spark.sources.raster import TILE_SCHEMA

COMPLEX_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("item_idx", T.IntegerType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("re", T.DoubleType()),
        T.StructField("im", T.DoubleType()),
    ]
)


def _part_udf(dtype: str, part: str):
    def take_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["data"] = [
                np.ascontiguousarray(
                    getattr(np.frombuffer(b, dtype=dtype), part).astype("float64")
                ).tobytes()
                for b in pdf["data"]
            ]
            yield out

    return take_part


def split_complex(
    tiles: DataFrame, dtype: str = "complex128"
) -> tuple[DataFrame, DataFrame]:
    """Complex tile table → (real, imag) float64 tile tables.

    A mapInPandas reinterpretation per part — no shuffle, no driver data.
    Feed either part to ``explode_pixels``/``mosaic``/``resample_time``/...
    exactly like a float stack.
    """
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        raise ValueError(f"split_complex expects a complex dtype, got {dtype!r}")
    re = tiles.mapInPandas(_part_udf(dtype, "real"), TILE_SCHEMA)
    im = tiles.mapInPandas(_part_udf(dtype, "imag"), TILE_SCHEMA)
    return re, im


def combine_complex(
    re_tiles: DataFrame, im_tiles: DataFrame, dtype: str = "complex128"
) -> DataFrame:
    """Inverse of :func:`split_complex`: two float64 tile tables →
    one complex tile table (``re + 1j*im``), e.g. composing a SAR SLC's
    i/q bands into the complex stack the reference fuzzes natively
    (testing/strategies.py:26-31).

    Scale shape: one equi-join on the tile key (item_idx, band_idx,
    tile_y, tile_x) — the inherent cost of zipping two tile streams; both
    sides shuffle-partition on the same key, no skew (keys are unique), and
    the combine itself is a map-only Arrow pass.
    """
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        raise ValueError(f"combine_complex expects a complex dtype, got {dtype!r}")
    keys = ["item_idx", "band_idx", "tile_y", "tile_x"]
    joined = re_tiles.join(
        im_tiles.select(*keys, F.col("data").alias("im_data")), keys
    )

    def to_cx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[[f.name for f in TILE_SCHEMA.fields]].copy()
            out["data"] = [
                (
                    np.frombuffer(r, dtype="float64")
                    + 1j * np.frombuffer(i, dtype="float64")
                )
                .astype(dtype)
                .tobytes()
                for r, i in zip(pdf["data"], pdf["im_data"])
            ]
            yield out

    return joined.mapInPandas(to_cx, TILE_SCHEMA)


def complex_pixels(
    tiles: DataFrame, dtype: str = "complex128", drop_fill: bool = True
) -> DataFrame:
    """Complex tile table → relational (item_idx, band_idx, row, col, re, im)
    — the struct-of-two-doubles pixel view, produced in ONE Arrow pass (no
    split + re-join). ``drop_fill`` drops cells where BOTH components are
    NaN (the complex-NaN fill), keeping the plane sparse like
    ``explode_pixels``."""
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        raise ValueError(f"complex_pixels expects a complex dtype, got {dtype!r}")

    def to_px(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.data, dtype=dtype).reshape(
                    row.tile_h, row.tile_w
                )
                if drop_fill:
                    invalid = np.isnan(arr.real) & np.isnan(arr.imag)
                    rr, cc = np.nonzero(~invalid)
                    vals = arr[rr, cc]
                else:
                    rr, cc = np.meshgrid(
                        np.arange(row.tile_h), np.arange(row.tile_w), indexing="ij"
                    )
                    rr, cc = rr.ravel(), cc.ravel()
                    vals = arr.ravel()
                if len(rr) == 0:
                    continue
                frames.append(
                    pd.DataFrame(
                        {
                            "item_idx": np.full(len(rr), row.item_idx, dtype="int32"),
                            "band_idx": np.full(len(rr), row.band_idx, dtype="int32"),
                            "row": (rr + row.row_off).astype("int32"),
                            "col": (cc + row.col_off).astype("int32"),
                            "re": vals.real.astype("float64"),
                            "im": vals.imag.astype("float64"),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return tiles.mapInPandas(to_px, COMPLEX_PIXEL_SCHEMA)
