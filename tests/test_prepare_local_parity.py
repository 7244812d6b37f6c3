"""prepare_local (driver fast path) vs prepare (DataFrame path): the two
implementations must be observationally identical — same spec, same asset
table, same item/band coordinate tables, same errors — across the branch
matrix (asset selection modes, CRS inference, every resolution branch,
bounds modes, sorting, rescale guards). stack() routes small item lists to
the local path, so this parity IS the correctness argument for it."""

import numpy as np
import pytest

from stackstac_spark.prepare import prepare
from stackstac_spark.prepare_local import prepare_local
from stackstac_spark.sources.stac import items_to_dataframes


def _item(
    i,
    dt="2024-01-05T00:00:00Z",
    epsg=32633,
    bbox=None,
    shape=(40, 40),
    res=10.0,
    origin=(500000.0, 4000640.0),
    assets=("red", "nir"),
    asset_epsg=None,
    no_transform=False,
    scale=None,
    fields=None,
    item_bbox=(15.0, 36.0, 15.1, 36.1),
    rotated=False,
):
    minx, maxy = origin
    h, w = shape
    pbbox = bbox or [minx, maxy - h * res, minx + w * res, maxy]
    trans = [res, 0.0, minx, 0.0, -res, maxy]
    if rotated:
        trans = [res, 0.5, minx, 0.25, -res, maxy]
    props = {"datetime": dt, "eo:cloud_cover": i * 10}
    if epsg is not None:
        props["proj:epsg"] = epsg
    item = {
        "id": f"it-{i:02d}",
        "bbox": list(item_bbox),
        "properties": props,
        "assets": {},
    }
    for j, aid in enumerate(assets):
        a = {
            "href": f"fake://{i}/{j}",
            "type": "image/tiff; application=geotiff" if aid != "meta" else "application/json",
        }
        if not no_transform:
            a["proj:transform"] = trans
        a["proj:bbox"] = pbbox
        a["proj:shape"] = [h, w]
        if asset_epsg is not None:
            a["proj:epsg"] = asset_epsg
        if scale is not None:
            a["raster:bands"] = [{"scale": scale[0], "offset": scale[1]}]
        if fields:
            a.update(fields)
        item["assets"][aid] = a
    return item


def _both(spark, items, **kw):
    loc = prepare_local(spark, items, **kw)
    items_df, assets_df = items_to_dataframes(spark, items)
    dist = prepare(items_df, assets_df, persist=False, **kw)
    return loc, dist


def _assert_same(loc, dist):
    assert loc.asset_ids == dist.asset_ids
    assert loc.spec.epsg == dist.spec.epsg
    np.testing.assert_allclose(loc.spec.bounds, dist.spec.bounds, rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        loc.spec.resolutions_xy, dist.spec.resolutions_xy, rtol=0, atol=1e-12
    )

    def table(p):
        rows = p.asset_table.collect()
        return sorted(
            (r.item_idx, r.band_idx, r.asset_id, r.url, tuple(np.round(r.bounds, 6)), r.scale, r.offset)
            for r in rows
        )

    assert table(loc) == table(dist)

    def items_tbl(p):
        return sorted(
            (r.item_idx, r.item_id, r.datetime, dict(r.properties))
            for r in p.items_df.collect()
        )

    li, di = items_tbl(loc), items_tbl(dist)
    assert [x[:3] for x in li] == [x[:3] for x in di]
    assert [x[3] for x in li] == [x[3] for x in di]

    def bands(p):
        if p.band_fields is None:
            return set()
        return {(r.band_idx, r.asset_id, r.key, r.value) for r in p.band_fields.collect()}

    assert bands(loc) == bands(dist)


def test_parity_basic_inferred_everything(spark):
    items = [
        _item(0),
        _item(1, dt="2024-01-02T00:00:00Z", origin=(500120.0, 4000560.0)),
        _item(2, dt="2024-01-09T00:00:00Z", origin=(500240.0, 4000480.0), res=20.0, shape=(20, 20)),
    ]
    loc, dist = _both(spark, items)  # epsg, resolution, bounds all inferred
    _assert_same(loc, dist)
    assert loc.spec.resolutions_xy == (10.0, 10.0)  # min over assets


def test_parity_explicit_bounds_filter_and_no_snap(spark):
    items = [_item(0), _item(1, origin=(510000.0, 4000640.0))]  # item 1 far east
    kw = dict(bounds=(500000.0, 4000240.0, 500403.0, 4000640.0), snap_bounds=False,
              epsg=32633, resolution=10.0)
    loc, dist = _both(spark, items, **kw)
    _assert_same(loc, dist)
    # the far item dropped by the overlap filter in BOTH paths
    assert loc.items_df.count() == dist.items_df.count() == 1
    assert loc.spec.bounds == (500000.0, 4000240.0, 500403.0, 4000640.0)


def test_parity_bounds_latlon_and_snap(spark):
    items = [_item(0, epsg=32633)]
    kw = dict(bounds_latlon=(14.99, 36.0, 15.06, 36.07), epsg=32633, resolution=10.0)
    loc, dist = _both(spark, items, **kw)
    _assert_same(loc, dist)


def test_parity_cross_crs_resolution_inference(spark):
    # 4326 asset on a UTM spec: resolution comes from the reprojected 1-px box
    items = [
        _item(0, epsg=32633),
        _item(1, epsg=4326, origin=(15.0, 36.2), res=0.0001, shape=(100, 100),
              item_bbox=(15.0, 36.19, 15.01, 36.2)),
    ]
    loc, dist = _both(spark, items, epsg=32633)
    _assert_same(loc, dist)


def test_parity_no_transform_shape_quotient(spark):
    items = [_item(0, no_transform=True)]
    loc, dist = _both(spark, items, epsg=32633)
    _assert_same(loc, dist)


def test_parity_mimetype_and_default_selection(spark):
    items = [
        _item(0, assets=("red", "nir", "meta")),
        _item(1, assets=("red", "nir", "meta")),
    ]
    for kw in (dict(assets="image/tiff"), dict(assets=None), dict(assets="image")):
        loc, dist = _both(spark, items, epsg=32633, resolution=10.0, **kw)
        _assert_same(loc, dist)
    loc, _ = _both(spark, items, assets="image/tiff", epsg=32633, resolution=10.0)
    assert loc.asset_ids == ["nir", "red"]  # sorted; meta (json) excluded


def test_parity_unknown_asset_warns_and_drops(spark):
    items = [_item(0)]
    with pytest.warns(UserWarning, match="Dropping asset ids"):
        loc = prepare_local(spark, items, assets=["red", "blue"], epsg=32633, resolution=10.0)
    items_df, assets_df = items_to_dataframes(spark, items)
    with pytest.warns(UserWarning, match="Dropping asset ids"):
        dist = prepare(items_df, assets_df, assets=["red", "blue"], epsg=32633,
                       resolution=10.0, persist=False)
    _assert_same(loc, dist)
    assert loc.asset_ids == ["red"]


def test_parity_sort_desc_and_missing_datetime(spark):
    items = [
        _item(0, dt="2024-03-01T00:00:00Z"),
        _item(1, dt=None),
        _item(2, dt="2024-01-01T00:00:00Z"),
    ]
    for item in items:
        if item["properties"]["datetime"] is None:
            del item["properties"]["datetime"]
    for order in ("asc", "desc", None):
        loc, dist = _both(spark, items, epsg=32633, resolution=10.0, sortby_date=order)
        _assert_same(loc, dist)


def test_parity_band_fields_constancy(spark):
    items = [
        _item(0, fields={"eo:bands": [{"common_name": "red"}], "roles": ["data"]}),
        _item(1, fields={"eo:bands": [{"common_name": "red"}], "roles": ["reflectance"]}),
    ]
    loc, dist = _both(spark, items, epsg=32633, resolution=10.0)
    _assert_same(loc, dist)
    keys = {r.key for r in loc.band_fields.collect()}
    assert "eo:bands" in keys and "roles" not in keys  # varying field dropped


def test_band_fields_null_mixed_value(spark):
    # ADVICE r6: a key carried as {NULL, "x"} across an asset's rows has ONE
    # distinct non-null value (count_distinct ignores nulls) — the
    # distributed path must deterministically surface "x", not a
    # row-order-dependent NULL from a plain first(). The dict-ingestion path
    # stringifies None to "null", so inject genuine SQL NULL map values by
    # rewriting assets_df directly.
    from pyspark.sql import functions as F

    items = [_item(0), _item(1)]
    items_df, assets_df = items_to_dataframes(spark, items)
    assets_df = assets_df.withColumn(
        "fields",
        F.map_from_arrays(
            F.array(F.lit("gsd"), F.lit("all_null")),
            F.array(
                F.when(F.col("item_id") == "it-01", F.lit("10")).otherwise(
                    F.lit(None).cast("string")
                ),
                F.lit(None).cast("string"),
            ),
        ),
    )
    dist = prepare(items_df, assets_df, persist=False, epsg=32633, resolution=10.0)
    vals = {(r.asset_id, r.key): r.value for r in dist.band_fields.collect()}
    assert vals[("red", "gsd")] == "10"
    assert vals[("nir", "gsd")] == "10"
    assert ("red", "all_null") not in vals  # no non-null value → dropped


def test_parity_rescale_guard_and_disable(spark):
    items = [_item(0, scale=(2.0, 1.5))]
    loc, dist = _both(spark, items, epsg=32633, resolution=10.0)
    _assert_same(loc, dist)
    assert {r.scale for r in loc.asset_table.collect()} == {2.0}
    loc2, dist2 = _both(spark, items, epsg=32633, resolution=10.0, rescale=False)
    _assert_same(loc2, dist2)
    assert {r.scale for r in loc2.asset_table.collect()} == {1.0}
    with pytest.raises(ValueError, match="can't be cast"):
        prepare_local(spark, [_item(0, scale=(2.5, 0.0))], epsg=32633,
                      resolution=10.0, dtype="uint16")


def test_parity_errors(spark):
    # mixed CRS without epsg=
    items = [_item(0, epsg=32633), _item(1, epsg=4326, origin=(15.0, 36.2), res=0.0001)]
    with pytest.raises(ValueError, match="Cannot pick a common CRS"):
        prepare_local(spark, items)
    items_df, assets_df = items_to_dataframes(spark, items)
    with pytest.raises(ValueError, match="Cannot pick a common CRS"):
        prepare(items_df, assets_df, persist=False)
    # non-rectilinear + auto resolution
    with pytest.raises(NotImplementedError, match="non-rectilinear"):
        prepare_local(spark, [_item(0, rotated=True)], epsg=32633)
    # both bounds forms
    with pytest.raises(ValueError, match="both bounds"):
        prepare_local(spark, [_item(0)], bounds=(0, 0, 1, 1), bounds_latlon=(0, 0, 1, 1))


def test_stack_routes_small_lists_to_local_path(spark, monkeypatch):
    """stack() with a small item list must not launch ANY Spark job during
    planning (the whole point of the fast path)."""
    from stackstac_spark.stack import stack

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    st = stack(spark, [_item(0), _item(1)], epsg=32633, resolution=10.0, chunksize=32)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, f"planning launched Spark jobs: {sorted(after - before)}"
    # and the stack still computes correctly through the normal scan
    dense = st.compute()
    assert dense.shape[0] == 2 and not np.isnan(dense).all()


# ---------------------------------------------------------------------------
# randomized parity fuzz
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def catalogs(draw):
    n = draw(st.integers(1, 5))
    kw = {"epsg": 32633}
    items = []
    pool = ["red", "nir", "green"]
    for i in range(n):
        n_assets = draw(st.integers(1, 3))
        no_trans = draw(st.booleans())
        cross = (not no_trans) and draw(st.booleans())
        if cross:
            items.append(
                _item(i, dt=f"2024-02-{draw(st.integers(1, 28)):02d}T00:00:00Z",
                      epsg=4326, origin=(15.0 + i * 0.002, 36.2),
                      res=draw(st.sampled_from([0.0001, 0.0002])),
                      shape=(draw(st.integers(20, 60)), draw(st.integers(20, 60))),
                      assets=tuple(pool[:n_assets]),
                      item_bbox=(15.0, 36.1, 15.05, 36.2))
            )
        else:
            items.append(
                _item(i, dt=f"2024-01-{draw(st.integers(1, 28)):02d}T00:00:00Z",
                      origin=(500000.0 + i * draw(st.sampled_from([0.0, 80.0, 130.0])),
                              4000640.0 - i * draw(st.sampled_from([0.0, 40.0]))),
                      res=draw(st.sampled_from([10.0, 20.0])),
                      shape=(draw(st.integers(20, 64)), draw(st.integers(20, 64))),
                      assets=tuple(pool[:n_assets]),
                      no_transform=no_trans)
            )
    if draw(st.booleans()):
        kw["resolution"] = draw(st.sampled_from([10.0, (10.0, 20.0)]))
    if draw(st.booleans()):
        kw["bounds"] = (500000.0, 4000100.0, 500500.0, 4000640.0)
        if "resolution" not in kw:
            kw["resolution"] = 10.0  # bounds filter can drop the res source
    kw["snap_bounds"] = draw(st.booleans())
    kw["sortby_date"] = draw(st.sampled_from(["asc", "desc"]))
    kw["assets"] = draw(st.sampled_from([None, ["red"], "image/tiff"]))
    return items, kw


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=catalogs())
def test_parity_fuzz_random_catalogs(spark, case):
    items, kw = case
    try:
        loc = prepare_local(spark, items, **kw)
        loc_err = None
    except Exception as e:  # noqa: BLE001
        loc, loc_err = None, e
    items_df, assets_df = items_to_dataframes(spark, items)
    try:
        dist = prepare(items_df, assets_df, persist=False, **kw)
        dist_err = None
    except Exception as e:  # noqa: BLE001
        dist, dist_err = None, e
    if loc_err or dist_err:
        assert type(loc_err) is type(dist_err), (loc_err, dist_err)
        assert str(loc_err) == str(dist_err)
        return
    _assert_same(loc, dist)


# ---------------------------------------------------------------------------
# degenerate-input parity (r6 review fixes)
# ---------------------------------------------------------------------------


def test_parity_duplicate_item_ids_fan_out(spark):
    """Two items sharing an id: the distributed path's assets⋈items join
    fans each asset row out to BOTH item indices — the local path must
    reproduce that, not last-id-wins."""
    a = _item(0, dt="2024-01-01T00:00:00Z")
    b = _item(0, dt="2024-02-01T00:00:00Z", origin=(500080.0, 4000560.0))
    loc, dist = _both(spark, [a, b], epsg=32633, resolution=10.0)
    _assert_same(loc, dist)
    # 2 item rows x 2 join partners x 2 bands = 8 asset rows in BOTH paths
    assert loc.asset_table.count() == dist.asset_table.count() == 8


def test_parity_duplicate_explicit_assets(spark):
    """assets=['red','red']: one band per occurrence (the band_idx_df join
    fan-out), identically in both paths."""
    loc, dist = _both(spark, [_item(0)], assets=["red", "red"], epsg=32633, resolution=10.0)
    _assert_same(loc, dist)
    assert loc.asset_ids == ["red", "red"]
    assert sorted(r.band_idx for r in loc.asset_table.collect()) == [0, 1]


def test_parity_error_witness_with_two_offenders(spark):
    """Two no-geometry assets: both paths must name the SAME one (the
    max-by-(asset_id, item_id) witness) in the full error string."""
    bad = []
    for i in range(2):
        it = _item(i, no_transform=True)
        for a in it["assets"].values():
            del a["proj:bbox"], a["proj:shape"]
        del it["bbox"]
        bad.append(it)
    with pytest.raises(ValueError) as loc_err:
        prepare_local(spark, bad, epsg=32633, resolution=10.0)
    items_df, assets_df = items_to_dataframes(spark, bad)
    with pytest.raises(ValueError) as dist_err:
        prepare(items_df, assets_df, epsg=32633, resolution=10.0, persist=False)
    assert str(loc_err.value) == str(dist_err.value)


def test_parity_items_df_column_order(spark):
    """Both paths expose the same items_df schema ORDER (positional
    consumers of create_views' item_coords must see one layout)."""
    loc, dist = _both(spark, [_item(0)], epsg=32633, resolution=10.0)
    assert loc.items_df.columns == dist.items_df.columns
    assert loc.asset_table.columns == dist.asset_table.columns
    assert loc.band_fields.columns == dist.band_fields.columns
