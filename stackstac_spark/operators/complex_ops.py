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

from stackstac_spark.sources.raster import TILE_SCHEMA


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
