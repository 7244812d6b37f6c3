"""Tile-grid generation and the asset×tile overlap join.

The reference materializes the chunk grid implicitly through dask's
``blockwise`` over ``ArraySliceDep`` (to_dask.py:88-101) and prunes
non-overlapping (asset, chunk) pairs *at task runtime* with
``windows.intersect`` (to_dask.py:183). Here the chunk grid is a generated
DataFrame — ``sequence`` + ``explode``, so a 100 TB stack's multi-million-tile
grid is produced executor-side, never on the driver — and the pruning is a
plan-time Catalyst range predicate on the asset×tile join, which is strictly
earlier than the reference can prune.

The join itself broadcasts the tile grid (tiles are O(grid-area/chunk²) tiny
rows) against the potentially huge asset table, so no shuffle occurs on the
scan path at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stackstac_spark.raster_spec import RasterSpec


def tile_grid(
    spark: SparkSession,
    spec: RasterSpec,
    chunksize: int | tuple[int, int] = 1024,
    bounds: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """DataFrame of output tiles: one row per (tile_y, tile_x) chunk.

    Columns: tile_y, tile_x, row_off, col_off, tile_h, tile_w and the tile's
    world bounds (minx..maxy). An optional AOI ``bounds`` is applied as a
    range predicate so Catalyst prunes tiles before any join. ``chunksize``
    may be an int or a (chunk_h, chunk_w) pair (the reference accepts
    per-axis chunk specs, stack.py:171-192 / to_dask.py:219-231).
    """
    chunk_h, chunk_w = (
        (int(chunksize), int(chunksize))
        if isinstance(chunksize, int)
        else (int(chunksize[0]), int(chunksize[1]))
    )
    height, width = spec.shape
    n_ty = -(-height // chunk_h)
    n_tx = -(-width // chunk_w)
    xres, yres = spec.resolutions_xy
    gminx, _, _, gmaxy = spec.bounds

    df = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(n_ty - 1))).alias("tile_y"),
            F.lit(height).alias("_h"),
            F.lit(width).alias("_w"),
        )
        .select(
            "tile_y",
            F.explode(F.sequence(F.lit(0), F.lit(n_tx - 1))).alias("tile_x"),
            "_h",
            "_w",
        )
        .select(
            "tile_y",
            "tile_x",
            (F.col("tile_y") * chunk_h).alias("row_off"),
            (F.col("tile_x") * chunk_w).alias("col_off"),
            F.least(F.lit(chunk_h), F.col("_h") - F.col("tile_y") * chunk_h).alias("tile_h"),
            F.least(F.lit(chunk_w), F.col("_w") - F.col("tile_x") * chunk_w).alias("tile_w"),
        )
        .select(
            "*",
            (F.lit(gminx) + F.col("col_off") * F.lit(xres)).alias("tminx"),
            (F.lit(gmaxy) - (F.col("row_off") + F.col("tile_h")) * F.lit(yres)).alias("tminy"),
            (F.lit(gminx) + (F.col("col_off") + F.col("tile_w")) * F.lit(xres)).alias("tmaxx"),
            (F.lit(gmaxy) - F.col("row_off") * F.lit(yres)).alias("tmaxy"),
        )
    )
    if bounds is not None:
        bminx, bminy, bmaxx, bmaxy = bounds
        df = df.filter(
            (F.col("tminx") < bmaxx)
            & (F.col("tmaxx") > bminx)
            & (F.col("tminy") < bmaxy)
            & (F.col("tmaxy") > bminy)
        )
    return df


def overlap_predicate(
    a_prefix: str = "", t_prefix: str = "t"
) -> Column:
    """Strict bbox-overlap predicate between asset bounds columns
    (``minx..maxy``) and tile bounds columns (``tminx..tmaxy``) — the
    plan-time analogue of the reference's runtime windows.intersect check
    (to_dask.py:183)."""
    a = lambda c: F.col(f"{a_prefix}{c}")  # noqa: E731
    t = lambda c: F.col(f"{t_prefix}{c}")  # noqa: E731
    return (
        (a("minx") < t("maxx"))
        & (a("maxx") > t("minx"))
        & (a("miny") < t("maxy"))
        & (a("maxy") > t("miny"))
    )


def join_assets_to_tiles(asset_table: DataFrame, tiles: DataFrame) -> DataFrame:
    """asset_table ⋈ tile_grid with overlap pruning.

    The tile side is broadcast: the asset table is the big side (items ×
    bands can be billions of rows at 100 TB) and stays shuffle-free. The
    result carries, per (item, band, tile), the asset's read window clipped
    to the tile — everything the scan UDF needs.
    """
    a = asset_table.select(
        "item_idx",
        "band_idx",
        "url",
        F.col("bounds")[0].alias("minx"),
        F.col("bounds")[1].alias("miny"),
        F.col("bounds")[2].alias("maxx"),
        F.col("bounds")[3].alias("maxy"),
        "scale",
        "offset",
    )
    cond = (
        (F.col("minx") < F.col("tmaxx"))
        & (F.col("maxx") > F.col("tminx"))
        & (F.col("miny") < F.col("tmaxy"))
        & (F.col("maxy") > F.col("tminy"))
    )
    return a.join(F.broadcast(tiles), cond, "inner")
