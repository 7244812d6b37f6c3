"""Warping: reproject a stacked raster onto a new RasterSpec, and slice it to
XYZ web-map tiles — the reference's ``reproject_array`` (geom_utils.py:206-304)
and ``xyztile_of_array`` (geom_utils.py:307-383) re-expressed for the tile
DataFrame.

Physical strategy: the OUTPUT grid is tiled; for each output tile we compute
(inverse-transform) the source-pixel footprint it needs, fetch exactly those
source tiles (an overlap join — the bounded-halo exchange SURVEY §7 calls
for), and interpolate per output tile in an Arrow-batched kernel. Nearest,
bilinear, and cubic (Keys a=-0.5, the rasterio Resampling.cubic kernel)
interpolation are implemented in numpy directly (scipy is not in this
container; interpn on a regular grid reduces to index arithmetic).

The reference collapses spatial chunks to warp whole arrays at once
(geom_utils.py:245-248 admits this doesn't scale); the per-output-tile
halo join here is the 100 TB-safe version: work and memory stay O(tile).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stackstac_spark.functions.proj import transform_xy
from stackstac_spark.raster_spec import Bbox, RasterSpec
from stackstac_spark.sources.raster import TILE_SCHEMA

WEB_MERCATOR_EXTENT = 20037508.342789244  # EPSG:3857 half-extent, from the spec


def xyz_tile_bounds(z: int, x: int, y: int) -> Bbox:
    """EPSG:3857 bounds of slippy-map tile (z, x, y) — mercantile.xy_bounds
    semantics from the published tiling scheme."""
    n = 2**z
    size = 2 * WEB_MERCATOR_EXTENT / n
    minx = -WEB_MERCATOR_EXTENT + x * size
    maxy = WEB_MERCATOR_EXTENT - y * size
    return (minx, maxy - size, minx + size, maxy)


def _interp_tile(
    src: np.ndarray,
    src_spec: RasterSpec,
    src_origin: tuple[int, int],
    dst_spec: RasterSpec,
    dst_window: tuple[int, int, int, int],
    method: str,
) -> np.ndarray:
    """Interpolate one output window from a (padded) source block.

    src is a dense block whose [0,0] pixel is global (row, col) = src_origin
    on the SOURCE grid. Output pixel centers are inverse-projected into
    source fractional pixel coords; nearest or bilinear gather follows
    (the numpy reduction of the reference's interp/interpn calls,
    geom_utils.py:276-304).
    """
    r0, c0, h, w = dst_window
    dxres, dyres = dst_spec.resolutions_xy
    dminx, _, _, dmaxy = dst_spec.bounds
    # output pixel centers in dst CRS
    xs = dminx + (np.arange(c0, c0 + w) + 0.5) * dxres
    ys = dmaxy - (np.arange(r0, r0 + h) + 0.5) * dyres
    xx, yy = np.meshgrid(xs, ys)
    sx, sy = transform_xy(dst_spec.epsg, src_spec.epsg, xx.ravel(), yy.ravel())
    sxres, syres = src_spec.resolutions_xy
    sminx, _, _, smaxy = src_spec.bounds
    # fractional source pixel coords (pixel-center convention)
    fc = (sx.reshape(h, w) - sminx) / sxres - 0.5 - src_origin[1]
    fr = (smaxy - sy.reshape(h, w)) / syres - 0.5 - src_origin[0]
    sh, sw = src.shape
    out = np.full((h, w), np.nan)
    if method == "nearest":
        # round-half-up, not np.round's half-even: a dst center exactly on a
        # src boundary must pick the same pixel on every engine
        rr = np.floor(fr + 0.5).astype("int64")
        cc = np.floor(fc + 0.5).astype("int64")
        ok = (rr >= 0) & (rr < sh) & (cc >= 0) & (cc < sw)
        out[ok] = src[rr[ok], cc[ok]]
    elif method == "cubic":
        # Keys (1981) cubic convolution, a = -0.5 (the GDAL/rasterio
        # Resampling.cubic kernel): separable 4x4 gather around floor(f),
        # taps at offsets -1..2. Third-order accurate — reproduces linear
        # (and quadratic) surfaces exactly, which the gate exploits.
        r0f = np.floor(fr).astype("int64")
        c0f = np.floor(fc).astype("int64")
        tr = fr - r0f
        tc = fc - c0f
        ok = (r0f - 1 >= 0) & (r0f + 2 < sh) & (c0f - 1 >= 0) & (c0f + 2 < sw)
        rok, cok, trk, tck = r0f[ok], c0f[ok], tr[ok], tc[ok]

        def _keys(t: np.ndarray) -> list[np.ndarray]:
            a = -0.5
            d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t
            return [
                a * d0**3 - 5 * a * d0**2 + 8 * a * d0 - 4 * a,
                (a + 2) * d1**3 - (a + 3) * d1**2 + 1.0,
                (a + 2) * d2**3 - (a + 3) * d2**2 + 1.0,
                a * d3**3 - 5 * a * d3**2 + 8 * a * d3 - 4 * a,
            ]

        wr = _keys(trk)
        wc = _keys(tck)
        acc = np.zeros(rok.shape)
        for i in range(4):
            for j in range(4):
                acc += wr[i] * wc[j] * src[rok + i - 1, cok + j - 1]
        out[ok] = acc
    else:  # bilinear
        r0f = np.floor(fr).astype("int64")
        c0f = np.floor(fc).astype("int64")
        tr = fr - r0f
        tc = fc - c0f
        ok = (r0f >= 0) & (r0f + 1 < sh) & (c0f >= 0) & (c0f + 1 < sw)
        rok, cok, trk, tck = r0f[ok], c0f[ok], tr[ok], tc[ok]
        v00 = src[rok, cok]
        v01 = src[rok, cok + 1]
        v10 = src[rok + 1, cok]
        v11 = src[rok + 1, cok + 1]
        out[ok] = (
            v00 * (1 - trk) * (1 - tck)
            + v01 * (1 - trk) * tck
            + v10 * trk * (1 - tck)
            + v11 * trk * tck
        )
    return out


_DST_TILES_SCHEMA = (
    "dty int, dtx int, dr0 int, dc0 int, dh int, dw int, "
    "sr0 int, sc0 int, sr1 int, sc1 int"
)


def _bounds_9pt_udf(out_epsg: int):
    """Arrow-batched kernel: (bounds, src_epsg) → bounds in out CRS via
    3x3 boundary-point sampling (corners + edge midpoints + center).

    The warp-footprint variant of prepare's 4-corner
    ``_bounds_to_out_epsg_udf``: mid-edge samples capture graticule
    curvature extrema (a tile straddling a UTM central meridian has its
    max northing mid-edge, not at a corner), so the source footprint
    covers what ``_interp_tile`` will actually gather. prepare keeps the
    4-corner form (reference ``geom_utils.reproject_bounds`` parity)."""
    import pandas as pd
    from pyspark.sql import types as T

    from stackstac_spark.functions.proj import install_user_crs, user_crs_snapshot

    _crs_snap = user_crs_snapshot()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _reproject(bounds: pd.Series, epsg: pd.Series) -> pd.Series:
        install_user_crs(_crs_snap)
        out = pd.Series([None] * len(bounds), index=bounds.index, dtype=object)
        valid = bounds.notna() & epsg.notna()
        if not valid.any():
            return out
        b = np.stack(bounds[valid].to_numpy())  # (n, 4)
        e = epsg[valid].to_numpy().astype("int64")
        res = np.empty_like(b)
        midx = (b[:, 0] + b[:, 2]) / 2.0
        midy = (b[:, 1] + b[:, 3]) / 2.0
        for code in np.unique(e):
            m = e == code
            if int(code) == out_epsg:
                res[m] = b[m]
                continue
            px = [b[m, 0], midx[m], b[m, 2]]
            py = [b[m, 1], midy[m], b[m, 3]]
            xs = np.concatenate([px[i] for _ in range(3) for i in range(3)])
            ys = np.concatenate([py[j] for j in range(3) for _ in range(3)])
            tx, ty = transform_xy(int(code), out_epsg, xs, ys)
            n = int(m.sum())
            txc = tx.reshape(9, n)
            tyc = ty.reshape(9, n)
            res[m, 0] = txc.min(axis=0)
            res[m, 1] = tyc.min(axis=0)
            res[m, 2] = txc.max(axis=0)
            res[m, 3] = tyc.max(axis=0)
        vals = np.empty(len(res), dtype=object)
        vals[:] = [list(map(float, r)) for r in res]
        out.iloc[np.flatnonzero(valid.to_numpy())] = vals
        return out

    return _reproject


def _dst_tiles_driver(
    spark, src_spec: RasterSpec, dst_spec: RasterSpec, chunksize: int, halo: int
) -> DataFrame:
    """Small-grid fastpath: build the dst tile table with vectorized numpy on
    the driver — zero Spark jobs, no Python workers. Same arithmetic as the
    executor-side path (4-corner reprojection, 1e-9 outward rounding) so
    results are identical; only used when the grid is a few thousand tiles
    (one XYZ tile, a single-raster resample — the common interactive case)."""
    dh, dw = dst_spec.shape
    n_ty = -(-dh // chunksize)
    n_tx = -(-dw // chunksize)
    sxres, syres = src_spec.resolutions_xy
    dxres, dyres = dst_spec.resolutions_xy
    dminx, _, _, dmaxy = dst_spec.bounds
    sminx, _, _, smaxy = src_spec.bounds

    dty, dtx = np.meshgrid(np.arange(n_ty), np.arange(n_tx), indexing="ij")
    dty = dty.ravel()
    dtx = dtx.ravel()
    dr0 = dty * chunksize
    dc0 = dtx * chunksize
    th = np.minimum(chunksize, dh - dr0)
    tw = np.minimum(chunksize, dw - dc0)
    # dst tile bounds → src CRS via the same 4-corner min/max the
    # _bounds_to_out_epsg_udf kernel uses
    bminx = dminx + dc0 * dxres
    bminy = dmaxy - (dr0 + th) * dyres
    bmaxx = dminx + (dc0 + tw) * dxres
    bmaxy = dmaxy - dr0 * dyres
    if int(dst_spec.epsg) == int(src_spec.epsg):
        s0, s1, s2, s3 = bminx, bminy, bmaxx, bmaxy
    else:
        # 3x3 boundary sampling (corners + edge midpoints + center), not the
        # 4 corners alone: curved graticules (e.g. a UTM parallel) reach
        # their extremum MID-EDGE when a tile straddles the central
        # meridian — a corner-only bbox under-covers there and the fixed
        # halo can't absorb it at coarse zooms (edge-NaN risk).
        bmidx = (bminx + bmaxx) / 2.0
        bmidy = (bminy + bmaxy) / 2.0
        xs = np.concatenate([bminx, bmidx, bmaxx] * 3)
        ys = np.concatenate(
            [bminy, bminy, bminy, bmidy, bmidy, bmidy, bmaxy, bmaxy, bmaxy]
        )
        tx_, ty_ = transform_xy(int(dst_spec.epsg), int(src_spec.epsg), xs, ys)
        n = len(dty)
        txc = tx_.reshape(9, n)
        tyc = ty_.reshape(9, n)
        s0, s1 = txc.min(axis=0), tyc.min(axis=0)
        s2, s3 = txc.max(axis=0), tyc.max(axis=0)
    col_off = (s0 - sminx) / sxres
    row_off = (smaxy - s3) / syres
    height = (s3 - s1) / syres
    width = (s2 - s0) / sxres
    pdf = pd.DataFrame(
        {
            "dty": dty.astype("int32"),
            "dtx": dtx.astype("int32"),
            "dr0": dr0.astype("int32"),
            "dc0": dc0.astype("int32"),
            "dh": th.astype("int32"),
            "dw": tw.astype("int32"),
            "sr0": (np.floor(row_off + 1e-9) - halo).astype("int32"),
            "sc0": (np.floor(col_off + 1e-9) - halo).astype("int32"),
            "sr1": (np.ceil(row_off + height - 1e-9) + halo).astype("int32"),
            "sc1": (np.ceil(col_off + width - 1e-9) + halo).astype("int32"),
        }
    )
    return spark.createDataFrame(pdf, schema=_DST_TILES_SCHEMA)


def reproject_tiles(
    tiles: DataFrame,
    src_spec: RasterSpec,
    dst_spec: RasterSpec,
    chunksize: int = 256,
    method: str = "nearest",
    halo: int = 2,
    grid_on_driver_max: int = 4096,
    dtype: str = "float64",
    broadcast_dst_max: int = 65536,
    bin_px: int | None = None,
) -> DataFrame:
    """Warp the tile DataFrame onto ``dst_spec``.

    Plan shape: generate the destination tile grid, compute each dst tile's
    source-pixel footprint, range-join source tiles to dst tiles they
    overlap (+halo), groupBy dst tile assembling the padded source block,
    interpolate. One shuffle (the groupBy); every kernel is O(tile²).

    The dst grid has two physical strategies:

    - ``<= grid_on_driver_max`` tiles: vectorized numpy on the driver
      (zero Spark jobs, no Python-worker spin-up). One XYZ tile or a
      single-raster resample is 1-few hundred tiles; launching an
      Arrow-batched reprojection job for that costs ~5s of pure overhead.
    - larger: EXECUTOR-SIDE ``sequence``+``explode`` + the same
      Arrow-batched 4-corner reprojection kernel prepare uses — a
      full-raster cross-CRS reproject has millions of dst tiles, so a
      driver loop would serialize the job before it starts (plan-guarded by
      tests/test_plan_quality.py).
    """
    if method not in ("nearest", "linear", "bilinear", "cubic"):
        raise ValueError(
            f"interpolation must be nearest/linear/cubic, got {method!r}"
        )
    meth = {"nearest": "nearest", "cubic": "cubic"}.get(method, "bilinear")
    spark = tiles.sparkSession
    dh, dw = dst_spec.shape
    n_ty = -(-dh // chunksize)
    n_tx = -(-dw // chunksize)
    sxres, syres = src_spec.resolutions_xy
    dxres, dyres = dst_spec.resolutions_xy
    dminx, _, _, dmaxy = dst_spec.bounds
    sminx, _, _, smaxy = src_spec.bounds

    if n_ty * n_tx <= grid_on_driver_max:
        dst_tiles = _dst_tiles_driver(spark, src_spec, dst_spec, chunksize, halo)
    else:
        reproj = _bounds_9pt_udf(src_spec.epsg)

        # destination tile table with its source-pixel footprint — all column
        # arithmetic plus one vectorized reprojection UDF; nothing iterates on
        # the driver regardless of grid size
        dst_grid = (
            spark.range(1)
            .select(F.explode(F.sequence(F.lit(0), F.lit(n_ty - 1))).alias("dty"))
            .select("dty", F.explode(F.sequence(F.lit(0), F.lit(n_tx - 1))).alias("dtx"))
            .select(
                "dty",
                "dtx",
                (F.col("dty") * chunksize).cast("int").alias("dr0"),
                (F.col("dtx") * chunksize).cast("int").alias("dc0"),
            )
            .select(
                "*",
                F.least(F.lit(chunksize), F.lit(dh) - F.col("dr0")).cast("int").alias("dh"),
                F.least(F.lit(chunksize), F.lit(dw) - F.col("dc0")).cast("int").alias("dw"),
            )
            .select(
                "*",
                F.array(
                    F.lit(dminx) + F.col("dc0") * F.lit(dxres),
                    F.lit(dmaxy) - (F.col("dr0") + F.col("dh")) * F.lit(dyres),
                    F.lit(dminx) + (F.col("dc0") + F.col("dw")) * F.lit(dxres),
                    F.lit(dmaxy) - F.col("dr0") * F.lit(dyres),
                ).alias("dbounds"),
            )
            .withColumn("sb", reproj(F.col("dbounds"), F.lit(int(dst_spec.epsg))))
        )
        # fractional source window (raster_spec.window_from_bounds as columns),
        # outward-rounded with the same 1e-9 epsilon, then ± halo
        col_off = (F.col("sb")[0] - F.lit(sminx)) / F.lit(sxres)
        row_off = (F.lit(smaxy) - F.col("sb")[3]) / F.lit(syres)
        height = (F.col("sb")[3] - F.col("sb")[1]) / F.lit(syres)
        width = (F.col("sb")[2] - F.col("sb")[0]) / F.lit(sxres)
        dst_tiles = dst_grid.select(
            "dty",
            "dtx",
            "dr0",
            "dc0",
            "dh",
            "dw",
            (F.floor(row_off + 1e-9) - halo).cast("int").alias("sr0"),
            (F.floor(col_off + 1e-9) - halo).cast("int").alias("sc0"),
            (F.ceil(row_off + height - 1e-9) + halo).cast("int").alias("sr1"),
            (F.ceil(col_off + width - 1e-9) + halo).cast("int").alias("sc1"),
        )

    # source tiles ⋈ dst tiles on pixel-window overlap. Two physical
    # strategies on the same predicate:
    #
    # - dst grid <= broadcast_dst_max tiles: broadcast nested-loop — a dst
    #   grid of 64k rows of 10 ints is ~3 MB, and AOI/viz warps (one XYZ
    #   tile, a resample) are far below that.
    # - larger: binned 2-D equi-join (the rangejoin.py shape in two
    #   dimensions) — both sides emit the source-pixel bins their window
    #   covers and equi-join on (bin_r, bin_c), so a full-corpus cross-CRS
    #   reproject with millions of tiles on BOTH sides shuffles on bin
    #   keys instead of broadcasting an unbounded grid. The src side joins
    #   METADATA only (payload bytes never duplicate across bins); matched
    #   pairs pull the payload back with one hash join on the tile key.
    #   Pairs dedupe via the canonical-bin trick (keep the pair only in
    #   the top-left bin of the window intersection), not a distinct.
    overlap = (
        (F.col("row_off") < F.col("sr1"))
        & (F.col("row_off") + F.col("tile_h") > F.col("sr0"))
        & (F.col("col_off") < F.col("sc1"))
        & (F.col("col_off") + F.col("tile_w") > F.col("sc0"))
    )
    if n_ty * n_tx <= broadcast_dst_max:
        joined = tiles.join(F.broadcast(dst_tiles), overlap)
    else:
        if bin_px is None:
            # bins sized so a typical window on either side covers O(1)
            # bins: at least 256 src px, scaled up when dst pixels are
            # coarser than src (a dst tile's footprint is ~chunksize *
            # res_ratio src px wide)
            res_ratio = max(dxres / sxres, dyres / syres, 1.0)
            bin_px = 1 << max(8, math.ceil(math.log2(chunksize * res_ratio + 1)))
        B = float(bin_px)
        src_meta = tiles.select(
            "item_idx", "band_idx", "row_off", "col_off", "tile_h", "tile_w"
        ).withColumn(
            "__br",
            F.explode(
                F.sequence(
                    F.floor(F.col("row_off") / B).cast("int"),
                    F.greatest(
                        F.floor((F.col("row_off") + F.col("tile_h") - 1) / B),
                        F.floor(F.col("row_off") / B),
                    ).cast("int"),
                )
            ),
        ).withColumn(
            "__bc",
            F.explode(
                F.sequence(
                    F.floor(F.col("col_off") / B).cast("int"),
                    F.greatest(
                        F.floor((F.col("col_off") + F.col("tile_w") - 1) / B),
                        F.floor(F.col("col_off") / B),
                    ).cast("int"),
                )
            ),
        )
        dst_binned = dst_tiles.withColumn(
            "__br",
            F.explode(
                F.sequence(
                    F.floor(F.col("sr0") / B).cast("int"),
                    F.greatest(
                        F.floor((F.col("sr1") - 1) / B), F.floor(F.col("sr0") / B)
                    ).cast("int"),
                )
            ),
        ).withColumn(
            "__bc",
            F.explode(
                F.sequence(
                    F.floor(F.col("sc0") / B).cast("int"),
                    F.greatest(
                        F.floor((F.col("sc1") - 1) / B), F.floor(F.col("sc0") / B)
                    ).cast("int"),
                )
            ),
        )
        pairs = (
            src_meta.join(dst_binned, ["__br", "__bc"])
            .filter(overlap)
            .filter(
                (
                    F.col("__br")
                    == F.floor(F.greatest(F.col("sr0"), F.col("row_off")) / B).cast("int")
                )
                & (
                    F.col("__bc")
                    == F.floor(F.greatest(F.col("sc0"), F.col("col_off")) / B).cast("int")
                )
            )
            .drop("__br", "__bc")
        )
        joined = tiles.join(
            pairs, ["item_idx", "band_idx", "row_off", "col_off", "tile_h", "tile_w"]
        )

    src_spec_b = src_spec
    dst_spec_b = dst_spec
    from stackstac_spark.functions.proj import install_user_crs, user_crs_snapshot

    _crs_snap = user_crs_snapshot()

    def warp_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        install_user_crs(_crs_snap)
        item_idx, band_idx, dty, dtx = (int(k) for k in key)
        first = pdf.iloc[0]
        sr0, sc0 = int(first.sr0), int(first.sc0)
        block = np.full((int(first.sr1) - sr0, int(first.sc1) - sc0), np.nan)
        for row in pdf.itertuples(index=False):
            # tile payload dtype is a stack parameter (RasterStack.dtype) —
            # hardcoding float64 here crashed (or silently misread) any
            # non-float64 stack; the warp OUTPUT stays float64 (interpolation)
            arr = np.frombuffer(row.data, dtype=dtype).reshape(
                row.tile_h, row.tile_w
            ).astype("float64", copy=False)
            rr0 = max(row.row_off, sr0)
            rr1 = min(row.row_off + row.tile_h, int(first.sr1))
            cc0 = max(row.col_off, sc0)
            cc1 = min(row.col_off + row.tile_w, int(first.sc1))
            if rr1 > rr0 and cc1 > cc0:
                block[rr0 - sr0 : rr1 - sr0, cc0 - sc0 : cc1 - sc0] = arr[
                    rr0 - row.row_off : rr1 - row.row_off, cc0 - row.col_off : cc1 - row.col_off
                ]
        out = _interp_tile(
            block,
            src_spec_b,
            (sr0, sc0),
            dst_spec_b,
            (int(first.dr0), int(first.dc0), int(first.dh), int(first.dw)),
            meth,
        )
        return pd.DataFrame(
            [
                (
                    item_idx, band_idx, dty, dtx,
                    int(first.dr0), int(first.dc0), int(first.dh), int(first.dw),
                    out.tobytes(),
                )
            ],
            columns=[f.name for f in TILE_SCHEMA.fields],
        )

    return joined.groupBy("item_idx", "band_idx", "dty", "dtx").applyInPandas(
        warp_group, TILE_SCHEMA
    )


def xyztile_of_tiles(
    tiles: DataFrame,
    src_spec: RasterSpec,
    z: int,
    x: int,
    y: int,
    tilesize: int = 256,
    method: str = "linear",
    dtype: str = "float64",
) -> DataFrame | None:
    """Warp the stack to one OSM tile (geom_utils.py:307-383): returns a tile
    DataFrame with one (tilesize×tilesize) EPSG:3857 tile per (item, band),
    or None if the tile doesn't overlap the stack."""
    bounds = xyz_tile_bounds(z, x, y)
    from stackstac_spark.functions.proj import reproject_bounds
    from stackstac_spark.raster_spec import bounds_overlap

    stack_in_3857 = reproject_bounds(src_spec.bounds, src_spec.epsg, 3857)
    if not bounds_overlap(bounds, stack_in_3857):
        return None
    res = (bounds[2] - bounds[0]) / tilesize
    dst_spec = RasterSpec(3857, bounds, (res, res))
    return reproject_tiles(tiles, src_spec, dst_spec, chunksize=tilesize, method=method, dtype=dtype)
