"""Metadata preparation: items/assets DataFrames → asset_table + RasterSpec.

Re-expresses the reference's ``prepare_items`` (prepare.py:59-395 in
/root/reference/stackstac) as DataFrame transformations:

- asset-id selection by explicit list, by mimetype (universal quantifier over
  items = ``bool_and`` aggregate; prepare.py:83-122), or default = assets of
  the item with most assets (``max_by(map_keys, size)``),
- per-asset CRS resolution: asset ``proj:epsg`` falls back to item level
  (prepare.py:146-149); without an explicit ``epsg=`` every asset must agree
  (prepare.py:187-206) — checked with one ``countDistinct`` aggregate,
- asset bbox in the output CRS with the reference's priority chain
  (prepare.py:214-266): proj:bbox → corners of shape×transform → item lat/lon
  bbox, all through 4-corner reprojection (geom_utils.py:42-53),
- resolution inference = per-asset resolution then a global ``min`` aggregate
  (prepare.py:268-333); bounds inference = union aggregate (prepare.py:335-354),
- out-of-bounds drop (prepare.py:355-361), GDAL -tap snapping
  (geom_utils.py:71-80), all-empty row/col drop (prepare.py:384-393).

Scale notes: all O(n_items × n_assets) work stays in DataFrame land (the
reprojection is an Arrow-batched pandas UDF); only O(1) scalars (distinct
EPSG, min resolution, union bounds) are collected to the driver. An asset
table for millions of items never materializes driver-side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stackstac_spark.functions.proj import reproject_bounds, transform_xy
from stackstac_spark.raster_spec import Bbox, RasterSpec, snapped_bounds


@dataclass
class Prepared:
    """The prepared IR: sparse asset table + grid spec + coordinate tables."""

    asset_table: DataFrame  # item_idx, band_idx, asset_id, url, bounds[4], scale, offset
    spec: RasterSpec
    asset_ids: list[str]
    items_df: DataFrame  # item_idx, item_id, datetime, properties, ...
    band_fields: DataFrame | None = None  # asset_id-level constant fields


# --- mimetype matching (reference prepare.py:35-56) -------------------------


class Mimetype:
    """'image/tiff; application=geotiff' → subset-matchable mimetype.

    ``Mimetype.from_str("image")`` matches any image/*; parameters given by
    the user must be a subset of the asset's (prepare.py:35-56)."""

    def __init__(self, type_: str, subtype: str | None, params: dict[str, str]):
        self.type = type_
        self.subtype = subtype
        self.params = params

    @classmethod
    def from_str(cls, s: str) -> "Mimetype":
        parts = [p.strip() for p in s.split(";")]
        full = parts[0]
        params = {}
        for p in parts[1:]:
            if "=" in p:
                k, v = p.split("=", 1)
                params[k.strip()] = v.strip()
        if "/" in full:
            type_, subtype = full.split("/", 1)
        else:
            type_, subtype = full, None
        return cls(type_, subtype or None, params)

    def matches(self, other_str: str | None) -> bool:
        if other_str is None:
            return False
        other = Mimetype.from_str(other_str)
        if self.type != other.type:
            return False
        if self.subtype is not None and self.subtype != other.subtype:
            return False
        return all(other.params.get(k) == v for k, v in self.params.items())


# --- asset selection ---------------------------------------------------------


def select_asset_ids(
    items_df: DataFrame, assets_df: DataFrame, assets: list[str] | str | None
) -> list[str]:
    """Resolve which asset ids (bands) participate in the stack."""
    if isinstance(assets, (list, tuple)):
        return list(assets)
    if isinstance(assets, str):  # mimetype filter
        return _select_by_mimetype(assets_df, assets)[0]
    # default: asset ids of the item with the most assets, order-preserving
    # (prepare.py:83-85)
    row = (
        assets_df.groupBy("item_id")
        .agg(F.collect_list("asset_id").alias("ids"))
        .orderBy(F.size("ids").desc(), "item_id")
        .limit(1)
        .collect()
    )
    return list(dict.fromkeys(row[0].ids)) if row else []


def _select_by_mimetype(
    assets_df: DataFrame, assets: str, items_df: DataFrame | None = None
) -> tuple[list[str], set | None]:
    """Mimetype selection, optionally fused with CRS-code collection.

    Universal quantifier: asset id kept iff its type matches on EVERY item
    carrying it (reference prepare.py:86-120); untyped assets drop. The
    match runs driver-side over the DISTINCT (asset_id, type) pairs — a
    native dedup job, metadata-plane tiny at any corpus scale.

    Optimization r13 (one driver round-trip instead of two): when
    ``items_df`` is given, the SAME distinct job also carries each pair's
    effective EPSG (asset ``proj:epsg`` with item-level fallback —
    reference prepare.py:146-149), so the caller's distinct-CRS check
    (prepare.py:187-206) needs no second job; the codes for the SELECTED
    ids are filtered out of the collected pairs driver-side. Returns
    (selected_ids, epsg_codes_or_None).
    """
    mt = Mimetype.from_str(assets)
    if items_df is not None:
        # LEFT join: the selection quantifier sees EVERY asset row (as the
        # unfused path does), while the codes filter below keeps only rows
        # whose item exists — matching the downstream asset⋈item INNER join
        # that defines the CRS-check population
        pairs = (
            assets_df.join(
                F.broadcast(
                    items_df.select(
                        "item_id",
                        F.col("proj_epsg").alias("__i_epsg"),
                        F.lit(True).alias("__has_item"),
                    )
                ),
                "item_id",
                "left",
            )
            .select(
                "asset_id",
                "type",
                F.coalesce("proj_epsg", "__i_epsg").alias("__eff_epsg"),
                "__has_item",
            )
            .distinct()
            .collect()
        )
    else:
        pairs = assets_df.select("asset_id", "type").distinct().collect()
    by_id: dict[str, bool] = {}
    for r in pairs:
        ok = mt.matches(r.type) if r.type is not None else False
        by_id[r.asset_id] = by_id.get(r.asset_id, True) and ok
    selected = sorted(aid for aid, ok in by_id.items() if ok)
    codes = None
    if items_df is not None:
        keep = set(selected)
        # Row.__getattr__ refuses dunder names — use item access
        codes = {
            r["__eff_epsg"]
            for r in pairs
            if r.asset_id in keep
            and r["__has_item"]
            and r["__eff_epsg"] is not None
        }
    return selected, codes


# --- reprojection UDF --------------------------------------------------------


def _pixel_res_udf(out_epsg: int):
    """Arrow-batched kernel for cross-CRS resolution inference: reproject the
    (0,0) pixel's 1-px box into the output CRS and return [width, height] in
    output-CRS units — exactly the reference's approach (prepare.py:287-301),
    which builds ``asset_affine * [(0,0),(0,1),(1,1),(1,0)]`` and reprojects
    the four corners. Dividing native bounds by shape instead would yield a
    resolution in NATIVE units, wrong by orders of magnitude when the units
    differ (UTM meters vs 4326 degrees)."""
    from stackstac_spark.functions.proj import install_user_crs, user_crs_snapshot

    _crs_snap = user_crs_snapshot()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _pxres(transform: pd.Series, epsg: pd.Series) -> pd.Series:
        install_user_crs(_crs_snap)
        out = pd.Series([None] * len(transform), index=transform.index, dtype=object)
        valid = transform.notna() & epsg.notna()
        if not valid.any():
            return out
        t = np.stack(transform[valid].to_numpy())  # (n, >=6): a,b,c,d,e,f
        e = epsg[valid].to_numpy().astype("int64")
        # unit-pixel corners as (col, row) pairs
        corners = np.array([(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)])
        xs = np.outer(corners[:, 0], t[:, 0]) + np.outer(corners[:, 1], t[:, 1]) + t[:, 2]
        ys = np.outer(corners[:, 0], t[:, 3]) + np.outer(corners[:, 1], t[:, 4]) + t[:, 5]
        res = np.empty((len(t), 2))
        for code in np.unique(e):
            m = e == code
            cx, cy = xs[:, m], ys[:, m]
            if int(code) != out_epsg:
                tx, ty = transform_xy(int(code), out_epsg, cx.ravel(), cy.ravel())
                cx = tx.reshape(4, -1)
                cy = ty.reshape(4, -1)
            res[m, 0] = cx.max(axis=0) - cx.min(axis=0)
            res[m, 1] = cy.max(axis=0) - cy.min(axis=0)
        vals = np.empty(len(res), dtype=object)
        vals[:] = [list(map(float, r)) for r in res]
        out.iloc[np.flatnonzero(valid.to_numpy())] = vals
        return out

    return _pxres


def _bounds_to_out_epsg_udf(out_epsg: int):
    """Arrow-batched kernel: (bounds, src_epsg) → bounds in out CRS via
    4-corner reprojection. Batched per Arrow chunk; groups rows by src_epsg
    so each distinct CRS transforms as one vectorized call."""
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
        for code in np.unique(e):
            m = e == code
            if int(code) == out_epsg:
                res[m] = b[m]
                continue
            xs = np.concatenate([b[m, 0], b[m, 2], b[m, 0], b[m, 2]])
            ys = np.concatenate([b[m, 1], b[m, 1], b[m, 3], b[m, 3]])
            tx, ty = transform_xy(int(code), out_epsg, xs, ys)
            n = int(m.sum())
            txc = tx.reshape(4, n)
            tyc = ty.reshape(4, n)
            res[m, 0] = txc.min(axis=0)
            res[m, 1] = tyc.min(axis=0)
            res[m, 2] = txc.max(axis=0)
            res[m, 3] = tyc.max(axis=0)
        vals = np.empty(len(res), dtype=object)
        vals[:] = [list(map(float, r)) for r in res]
        out.iloc[np.flatnonzero(valid.to_numpy())] = vals
        return out

    return _reproject


# --- main entry --------------------------------------------------------------


def prepare(
    items_df: DataFrame,
    assets_df: DataFrame,
    assets: list[str] | str | None = None,
    epsg: int | None = None,
    resolution: float | tuple[float, float] | None = None,
    bounds: Bbox | None = None,
    bounds_latlon: Bbox | None = None,
    snap_bounds: bool = True,
    rescale: bool = True,
    dtype: str = "float64",
    sortby_date: str = "asc",
    persist: bool = True,
) -> Prepared:
    if bounds is not None and bounds_latlon is not None:
        raise ValueError("Cannot give both bounds and bounds_latlon")

    spark = items_df.sparkSession

    # 1. sort items by datetime, assign item_idx (stack.py:283-288: missing
    #    datetime sorts as ""). Items metadata is small next to pixel data, so
    #    a global row_number window is acceptable even at catalog scale.
    order = F.coalesce(F.col("datetime"), F.lit(""))
    if sortby_date not in (None, False):
        order = order.desc() if sortby_date == "desc" else order.asc()
        w = Window.orderBy(order, "item_id")
    else:
        w = Window.orderBy("item_id")
    items_idx = items_df.withColumn("item_idx", F.row_number().over(w) - 1)

    # 2. asset-id selection (mimetype selection with epsg=None fuses the
    #    distinct-CRS collection into the same metadata job — optimization
    #    r13, one driver round-trip instead of two)
    fused_codes: set | None = None
    if isinstance(assets, str) and epsg is None:
        asset_ids, fused_codes = _select_by_mimetype(assets_df, assets, items_df)
    else:
        asset_ids = select_asset_ids(items_df, assets_df, assets)
    if not asset_ids:
        raise ValueError("No assets selected")
    if isinstance(assets, (list, tuple)):
        present = set(
            assets_df.agg(F.collect_set("asset_id").alias("ids")).collect()[0].ids
        )
        unknown = [a for a in asset_ids if a not in present]
        if unknown:
            # reference semantics: an asset id empty on EVERY item is an
            # all-empty column and is dropped (prepare.py:384-393), not an
            # error — unless nothing survives.
            asset_ids = [a for a in asset_ids if a in present]
            if not asset_ids:
                raise ValueError(
                    f"Asset ids {unknown} not found on any item; available: {sorted(present)}"
                )
            import warnings

            warnings.warn(
                f"Dropping asset ids not present on any item: {unknown}", stacklevel=3
            )
    from stackstac_spark.session import local_df

    band_idx_df = local_df(
        spark, [(a, i) for i, a in enumerate(asset_ids)], "asset_id STRING, band_idx INT"
    )

    # the items side is ~n_bands× smaller than the asset table; broadcast it
    # so the asset table is never shuffled during prepare (python-created DFs
    # have no stats, so Catalyst would otherwise pick a sort-merge join and
    # exchange BOTH sides). For catalogs beyond broadcast capacity, drop the
    # hint and AQE's shuffle join takes over.
    at = (
        assets_df.join(F.broadcast(band_idx_df), "asset_id")
        .join(
            F.broadcast(items_idx).select(
                "item_id",
                F.col("item_idx"),
                F.col("proj_epsg").alias("i_epsg"),
                F.col("proj_bbox").alias("i_proj_bbox"),
                F.col("proj_shape").alias("i_shape"),
                F.col("proj_transform").alias("i_transform"),
                F.col("bbox").alias("i_bbox"),
            ),
            "item_id",
        )
        .withColumn("asset_epsg", F.coalesce("proj_epsg", "i_epsg"))
        .withColumn("eff_bbox", F.coalesce("proj_bbox", "i_proj_bbox"))
        .withColumn("eff_shape", F.coalesce("proj_shape", "i_shape"))
        .withColumn("eff_transform", F.coalesce("proj_transform", "i_transform"))
    )

    if not rescale:
        at = at.withColumn("scale", F.lit(1.0)).withColumn("offset", F.lit(0.0))

    # 3. output CRS (prepare.py:187-206)
    if epsg is None:
        if fused_codes is not None:
            codes = sorted(fused_codes)
        else:
            codes = [
                r.asset_epsg
                for r in at.select("asset_epsg").distinct().collect()
            ]
            codes = [c for c in codes if c is not None]
        if len(set(codes)) != 1:
            raise ValueError(
                f"Cannot pick a common CRS: assets have EPSG codes {sorted(set(codes))}; "
                "pass epsg= explicitly"
            )
        out_epsg = int(codes[0])
    else:
        out_epsg = int(epsg)

    if bounds_latlon is not None:
        bounds = reproject_bounds(bounds_latlon, 4326, out_epsg)

    # 4. asset bbox in output CRS, priority chain (prepare.py:214-266):
    #    proj:bbox → shape×transform corners → item lat/lon bbox.
    reproj = _bounds_to_out_epsg_udf(out_epsg)
    # full-affine 4-corner bounds (reference geom_utils.py:18-37,
    # bounds_from_affine): the rotation terms b (t[1]) and d (t[3]) MUST
    # participate — dropping them under-estimates bounds for skewed
    # transforms and degenerates to zero width for 90°-rotated ones
    # (for rectilinear transforms b = d = 0 and this reduces to the
    # axis-aligned min/max exactly)
    _a, _b, _c = (F.col("eff_transform")[i] for i in (0, 1, 2))
    _d, _e, _f = (F.col("eff_transform")[i] for i in (3, 4, 5))
    _h, _w = F.col("eff_shape")[0], F.col("eff_shape")[1]
    _xs = (_c, _c + _a * _w, _c + _b * _h, _c + _a * _w + _b * _h)
    _ys = (_f, _f + _d * _w, _f + _e * _h, _f + _d * _w + _e * _h)
    trans_bounds = F.array(
        F.least(*_xs), F.least(*_ys), F.greatest(*_xs), F.greatest(*_ys)
    )
    at = at.withColumn(
        "native_bounds",
        F.coalesce(
            "eff_bbox",
            F.when(F.col("eff_shape").isNotNull() & F.col("eff_transform").isNotNull(), trans_bounds),
        ),
    ).withColumn(
        "out_bounds",
        F.when(
            F.col("native_bounds").isNotNull() & F.col("asset_epsg").isNotNull(),
            reproj(F.col("native_bounds"), F.col("asset_epsg")),
        ).otherwise(
            F.when(F.col("i_bbox").isNotNull(), reproj(F.col("i_bbox"), F.lit(4326)))
        ),
    )
    # The prepared table is read again by the scan join; cache it so the
    # reprojection UDF runs once (it is metadata-sized: O(items × bands)).
    # Callers that prepare repeatedly in one session (e.g. the streaming
    # foreachBatch sink) pass persist=False so caches don't accumulate.
    if persist:
        at = at.persist()

    # 5+6. guards + resolution (prepare.py:268-333) + bounds union
    #      (prepare.py:335-354) in ONE aggregate pass over the asset table —
    #      every check/inference is a conditional min/max, so a catalog of
    #      millions of assets costs exactly one map-side-combined job here.
    #      Resolution branches mirror the reference exactly:
    #        transform + same CRS   → |a|, |e| of the geotransform
    #        transform + cross CRS  → 1-px box reprojected to out CRS (UDF)
    #        no transform           → out-CRS bbox extent / proj:shape
    ob = lambda i: F.col("out_bounds")[i]  # noqa: E731
    has_trans = F.col("eff_transform").isNotNull() & F.col("asset_epsg").isNotNull()
    same_crs = has_trans & (F.col("asset_epsg") == F.lit(out_epsg))
    cross_crs = has_trans & (F.col("asset_epsg") != F.lit(out_epsg))
    no_trans = F.col("eff_transform").isNull() | F.col("asset_epsg").isNull()
    if resolution is None:
        pxres = _pixel_res_udf(out_epsg)
        at = at.withColumn(
            "px_res",
            pxres(F.when(cross_crs, F.col("eff_transform")), F.col("asset_epsg")),
        )
    else:
        at = at.withColumn("px_res", F.lit(None).cast("array<double>"))
    g = at.agg(
        # multi-band raster:bands guard (prepare.py:152-159; NaN scale flag)
        F.max(F.when(F.isnan("scale"), F.struct("asset_id", "item_id"))).alias("bad_scale"),
        # no-geometry guard (prepare.py:214-266 fallthrough)
        F.max(F.when(F.col("out_bounds").isNull(), F.struct("asset_id", "item_id"))).alias(
            "no_geom"
        ),
        # rescale castability witness (prepare.py:166-183)
        F.max(
            F.when(
                (F.col("scale") != 1.0) | (F.col("offset") != 0.0),
                F.struct("scale", "offset"),
            )
        ).alias("rescale_witness"),
        # non-rectilinear same-CRS geotransform witness (reference raises
        # NotImplementedError in auto-resolution mode, prepare.py:276-284)
        F.max(
            F.when(
                same_crs
                & ((F.col("eff_transform")[1] != 0.0) | (F.col("eff_transform")[3] != 0.0)),
                F.struct("asset_id", "item_id"),
            )
        ).alias("non_rect"),
        # same-CRS resolution = min |a|,|e| of the geotransform
        F.min(F.when(same_crs, F.abs(F.col("eff_transform")[0]))).alias("same_rx"),
        F.min(F.when(same_crs, F.abs(F.col("eff_transform")[4]))).alias("same_ry"),
        # cross-CRS: 1-px box reprojected into the output CRS (output units)
        F.min(F.when(cross_crs, F.col("px_res")[0])).alias("cross_rx"),
        F.min(F.when(cross_crs, F.col("px_res")[1])).alias("cross_ry"),
        # no geotransform: out-CRS bbox extent / proj:shape — out_bounds is
        # ALREADY reprojected, so this is in output units (the reference's
        # asset_bbox_proj / asset_shape quotient, prepare.py:305-325)
        F.min(
            F.when(
                no_trans & F.col("eff_shape").isNotNull(),
                (ob(2) - ob(0)) / F.col("eff_shape")[1],
            )
        ).alias("shape_rx"),
        F.min(
            F.when(
                no_trans & F.col("eff_shape").isNotNull(),
                (ob(3) - ob(1)) / F.col("eff_shape")[0],
            )
        ).alias("shape_ry"),
        # resolution-inference failure witness: no transform AND no shape
        F.max(
            F.when(
                no_trans & F.col("eff_shape").isNull(), F.struct("asset_id", "item_id")
            )
        ).alias("no_res"),
        # bounds union
        F.min(ob(0)).alias("minx"),
        F.min(ob(1)).alias("miny"),
        F.max(ob(2)).alias("maxx"),
        F.max(ob(3)).alias("maxy"),
    ).collect()[0]

    if g.bad_scale is not None:
        raise ValueError(
            f"Assets with multi-band raster:bands are unsupported (asset "
            f"{g.bad_scale.asset_id!r} on item {g.bad_scale.item_id!r})"
        )
    if g.no_geom is not None:
        raise ValueError(
            f"No geometry information (proj:bbox / proj:shape+transform / bbox) "
            f"for asset {g.no_geom.asset_id!r} of item {g.no_geom.item_id!r}"
        )
    if rescale and not np.issubdtype(np.dtype(dtype), np.floating) and g.rescale_witness:
        sc, of = g.rescale_witness.scale, g.rescale_witness.offset
        if not (np.can_cast(np.min_scalar_type(sc), dtype) and np.can_cast(np.min_scalar_type(of), dtype)):
            raise ValueError(
                f"scale/offset ({sc}, {of}) can't be cast to output dtype {dtype}"
            )

    if resolution is not None:
        res_xy = (
            (float(resolution), float(resolution))
            if np.isscalar(resolution)
            else (float(resolution[0]), float(resolution[1]))
        )
    else:
        if g.non_rect is not None:
            raise NotImplementedError(
                f"Cannot automatically compute the resolution: asset "
                f"{g.non_rect.asset_id!r} on item {g.non_rect.item_id!r} has a "
                "non-rectilinear geotrans (its data is not axis-aligned). "
                "Please specify the `resolution=` argument."
            )
        if g.no_res is not None:
            raise ValueError(
                f"Cannot automatically compute the resolution: asset "
                f"{g.no_res.asset_id!r} on item {g.no_res.item_id!r} provides "
                "neither proj:transform+proj:epsg nor proj:shape. "
                "Please specify the `resolution=` argument."
            )
        cand = []
        if g.same_rx is not None:
            cand.append((float(g.same_rx), float(g.same_ry)))
        if g.cross_rx is not None:
            cand.append((float(g.cross_rx), float(g.cross_ry)))
        if g.shape_rx is not None:
            cand.append((float(g.shape_rx), float(g.shape_ry)))
        if not cand:
            raise ValueError("Cannot infer resolution; pass resolution=")
        res_xy = (min(c[0] for c in cand), min(c[1] for c in cand))

    if bounds is None:
        out_bounds: Bbox = (g.minx, g.miny, g.maxx, g.maxy)
    else:
        out_bounds = bounds
        bminx, bminy, bmaxx, bmaxy = bounds
        at = at.filter(
            (ob(0) < bmaxx) & (ob(2) > bminx) & (ob(1) < bmaxy) & (ob(3) > bminy)
        )

    if snap_bounds:
        out_bounds = snapped_bounds(out_bounds, res_xy)
    spec = RasterSpec(out_epsg, out_bounds, res_xy)

    # 7. final sparse asset table; empty rows/cols are simply absent
    #    (prepare.py:384-393's dense row/col drop is a no-op in sparse form —
    #    we additionally drop items that lost all assets from the coord table).
    asset_table = at.select(
        "item_idx",
        "band_idx",
        "asset_id",
        F.col("href").alias("url"),
        F.col("out_bounds").alias("bounds"),
        "scale",
        "offset",
    )
    surviving = asset_table.select("item_idx").distinct()
    items_out = items_idx.join(surviving, "item_idx", "left_semi")

    # band-level constant fields (accumulate_metadata.py:101-131 semantics)
    band_fields = (
        assets_df.join(F.broadcast(band_idx_df), "asset_id")
        .select("asset_id", "band_idx", F.explode_outer("fields").alias("key", "value"))
        .groupBy("band_idx", "asset_id", "key")
        .agg(
            F.count_distinct("value").alias("nvals"),
            # ignorenulls: a key carried as {null, "x"} has one distinct
            # non-null value and must deterministically surface "x" — plain
            # first() could return the null depending on row order, diverging
            # from prepare_local.py:359's next-non-null pick
            F.first("value", ignorenulls=True).alias("value"),
        )
        .filter((F.col("nvals") == 1) & F.col("key").isNotNull())
        .select("band_idx", "asset_id", "key", "value")
    )

    return Prepared(asset_table, spec, asset_ids, items_out, band_fields)
