"""RasterStack.where / mask_band (reference examples/show.ipynb:36012 usage)
and calendar climatology grouping (xarray .groupby("time.month") idiom)."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackstac_spark.stack import stack
from tests.conftest import make_item


@pytest.fixture(scope="module")
def two_band_stack(spark):
    items = [
        make_item(0, "2022-01-05T00:00:00Z", (0.0, 0.0, 32.0, 24.0)),
        make_item(1, "2022-07-05T00:00:00Z", (0.0, 0.0, 32.0, 24.0)),
        make_item(2, "2023-01-05T00:00:00Z", (0.0, 0.0, 32.0, 24.0)),
    ]
    return stack(spark, items, assets=["red", "nir"], chunksize=16)


def test_where_masks_elementwise(spark, two_band_stack):
    st = two_band_stack.sel_bands(["red"])
    dense = st.compute()
    masked = st.where(lambda v: v > 1000.0).compute()
    expect = np.where(dense > 1000.0, dense, np.nan)
    np.testing.assert_array_equal(masked, expect)


def test_where_keeps_nan_masked(spark, two_band_stack):
    # NaN input pixels stay NaN even under a tautological predicate —
    # numpy NaN comparisons are False (xarray: missing stays missing)
    st = two_band_stack.sel_bands(["red"])
    out = st.where(lambda v: v == v).compute()
    np.testing.assert_array_equal(out, st.compute())


def test_where_is_map_only(spark, two_band_stack):
    """Plan guard: where() adds no shuffle — the mask kernel fuses into the
    scan stage (map-only at any corpus size)."""
    st = two_band_stack.sel_bands(["red"])
    base = st.tiles._jdf.queryExecution().executedPlan().toString().count("Exchange")
    w = st.where(lambda v: v > 0)
    after = w.tiles._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert after == base


def test_where_rejects_nan_fill_for_int(spark, two_band_stack):
    from stackstac_spark.operators.mask import where_tiles

    with pytest.raises(ValueError, match="not representable"):
        where_tiles(two_band_stack.tiles, lambda v: v > 0, dtype="int16")


def test_mask_band_scl_idiom(spark, two_band_stack):
    """Mask red by a predicate on nir (values item*1000+1+frac): keep only
    pixels where nir's fractional part < 0.01 (global row < 10)."""
    st = two_band_stack
    dense = st.compute()  # (time, band, y, x); band 0 red, band 1 nir
    masked_st = st.mask_band("nir", keep=lambda m: (m - np.floor(m)) < 0.01)
    assert masked_st.asset_ids == ["red"]
    got = masked_st.compute()
    keep = (dense[:, 1] - np.floor(dense[:, 1])) < 0.01
    expect = np.where(keep, dense[:, 0], np.nan)[:, None]
    np.testing.assert_array_equal(got, expect)


def test_mask_band_keep_values(spark, two_band_stack):
    """keep as an explicit value list (np.isin) — the literal SCL shape."""
    st = two_band_stack
    dense = st.compute()
    # keep exactly the nir values of item 0 row 0 col 0..2
    vals = [float(dense[0, 1, 0, c]) for c in range(3)]
    got = st.mask_band("nir", keep=vals).compute()
    keep = np.isin(dense[:, 1], np.asarray(vals))
    expect = np.where(keep, dense[:, 0], np.nan)[:, None]
    np.testing.assert_array_equal(got, expect)


def test_mask_band_unknown_band(spark, two_band_stack):
    with pytest.raises(ValueError, match="not in stack"):
        two_band_stack.mask_band("scl", keep=[4.0])


def test_climatology_month_across_years(spark, two_band_stack):
    """Items span 2022-01, 2022-07, 2023-01 → month-of-year groups {1: two
    years, 7: one} — the across-years grouping resample_time cannot do."""
    from stackstac_spark.operators.composite import climatology

    st = two_band_stack.sel_bands(["red"])
    out = climatology(st.pixels_with_time(), period="month", agg="mean")
    got = {(r["month"], r["row"], r["col"]): (r["mean"], r["n_obs"]) for r in out.collect()}
    px = {
        (r["item_idx"], r["row"], r["col"]): r["value"]
        for r in st.pixels().collect()
    }
    months = {0: 1, 1: 7, 2: 1}
    expect: dict = {}
    for (it, row, col), v in px.items():
        expect.setdefault((months[it], row, col), []).append(v)
    assert set(got) == set(expect)
    for k, vals in expect.items():
        m, n = got[k]
        assert n == len(vals)
        assert abs(m - round(float(np.mean(vals)), 6)) < 1e-9


def test_climatology_season_and_bad_period(spark, two_band_stack):
    from stackstac_spark.operators.composite import climatology

    st = two_band_stack.sel_bands(["red"])
    out = climatology(st.pixels_with_time(), period="season", agg="count")
    seasons = {r["season"] for r in out.select("season").distinct().collect()}
    assert seasons == {"DJF", "JJA"}  # january + july items
    with pytest.raises(ValueError, match="period"):
        climatology(st.pixels_with_time(), period="fortnight")


def test_climatology_anomaly_matches_groupmean(spark, two_band_stack):
    from stackstac_spark.operators.composite import climatology_anomaly

    st = two_band_stack.sel_bands(["red"])
    out = climatology_anomaly(st.pixels_with_time(), period="month")
    rows = out.collect()
    px = {}
    months = {0: 1, 1: 7, 2: 1}
    for r in st.pixels().collect():
        px.setdefault((months[r["item_idx"]], r["row"], r["col"]), []).append(
            (r["item_idx"], r["value"])
        )
    for r in rows:
        group = px[(months[r["item_idx"]], r["row"], r["col"])]
        mean = float(np.mean([v for _, v in group]))
        v = dict(group)[r["item_idx"]]
        assert abs(r["anomaly"] - round(v - mean, 6)) < 1e-9


def test_climatology_single_shuffle(spark, two_band_stack):
    """Plan guard: climatology is ONE hash aggregate (partial+final) over
    the pixel view — exactly one extra Exchange beyond the pixel plan."""
    st = two_band_stack.sel_bands(["red"])
    from stackstac_spark.operators.composite import climatology

    base = st.pixels_with_time()._jdf.queryExecution().executedPlan().toString().count("Exchange")
    out = climatology(st.pixels_with_time(), period="month")
    after = out._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert after == base + 1


def test_band_selection_composes(spark, two_band_stack):
    """sel_bands keeps ORIGINAL band_idx values: selecting nir (idx 1),
    re-selecting, and dense-exporting all compose — previously the export
    indexed out[:, 1] into a 1-band array (IndexError) and a chained
    sel_bands silently filtered on the wrong index."""
    st = two_band_stack
    nir = st.sel_bands(["nir"])
    assert nir.band_idxs == [1]
    again = nir.sel_bands(["nir"])  # chained re-select must stay band 1
    assert again.band_idxs == [1]
    dense_all = st.compute()
    dense_nir = again.compute()
    assert dense_nir.shape[1] == 1
    np.testing.assert_array_equal(dense_nir[:, 0], dense_all[:, 1])
    # mask_band then sel_bands: consume nir as mask, re-select red
    masked = st.mask_band("nir", keep=lambda m: m == m)
    sel = masked.sel_bands(["red"])
    assert sel.band_idxs == [0]
    np.testing.assert_array_equal(sel.compute()[:, 0], dense_all[:, 0])


def test_band_pivot_respects_band_idxs(spark, two_band_stack):
    """band_pivot over a subset stack must pivot the ORIGINAL band_idx
    values — a positional pivot would silently null the shifted bands."""
    from stackstac_spark.operators.composite import band_pivot

    st = two_band_stack.sel_bands(["nir"])  # band_idx 1, single name
    px = band_pivot(st.pixels(), st.asset_ids, st.band_idxs)
    row = px.orderBy("item_idx", "row", "col").first()
    assert row["nir"] is not None
    dense = two_band_stack.compute()
    assert row["nir"] == dense[row["item_idx"], 1, row["row"], row["col"]]
    with pytest.raises(ValueError, match="entries"):
        band_pivot(st.pixels(), ["a", "b"], [0])


def test_crop_exact_aoi(spark, two_band_stack):
    """crop(): the dense export of the cropped stack equals the numpy slice
    of the parent export; grid stays aligned; boundary tiles sliced."""
    st = two_band_stack.sel_bands(["red"])
    dense = st.compute()
    # spec: epsg from make_item (32613), res 1.0, bounds (0,0,32,24) → 24x32
    # crop an interior, non-tile-aligned box: x 5..21, y 3..19
    cropped = st.crop((5.0, 5.0, 21.0, 21.0))
    h, w = cropped.spec.shape
    assert (h, w) == (16, 16)
    assert cropped.spec.bounds == (5.0, 5.0, 21.0, 21.0)
    got = cropped.compute()
    # grid row r of the crop = parent row (ymax_parent - ymax_crop) + r
    r0 = int(round(st.spec.bounds[3] - 21.0))
    c0 = 5
    np.testing.assert_array_equal(got[:, 0], dense[:, 0, r0:r0 + 16, c0:c0 + 16])
    # pixels view offsets are rebased
    mx = cropped.pixels().agg(
        F.max("row").alias("mr"), F.max("col").alias("mc"),
        F.min("row").alias("nr"), F.min("col").alias("nc"),
    ).collect()[0]
    assert mx.nr >= 0 and mx.nc >= 0 and mx.mr < 16 and mx.mc < 16
    # non-overlapping crop errors loudly
    with pytest.raises(ValueError, match="do not overlap"):
        st.crop((1000.0, 1000.0, 1001.0, 1001.0))


def test_crop_is_map_only(spark, two_band_stack):
    st = two_band_stack.sel_bands(["red"])
    base = st.tiles._jdf.queryExecution().executedPlan().toString().count("Exchange")
    after = st.crop((5.0, 5.0, 21.0, 21.0)).tiles._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert after == base


@pytest.mark.parametrize(
    "box",
    [
        (0.0, 0.0, 32.0, 24.0),      # full raster
        (0.0, 23.0, 1.0, 24.0),      # single top-left pixel
        (15.0, 7.0, 17.0, 9.0),      # tile-corner straddle (chunksize 16)
        (-5.0, -5.0, 3.0, 3.0),      # partially outside: clamped
        (31.0, 0.0, 40.0, 24.0),     # right-edge overhang
    ],
)
def test_crop_windows_match_numpy_slice(spark, two_band_stack, box):
    st = two_band_stack.sel_bands(["red"])
    dense = st.compute()
    cropped = st.crop(box)
    h, w = cropped.spec.shape
    got = cropped.compute()
    # parent-grid window of the cropped spec
    r0 = int(round(st.spec.bounds[3] - cropped.spec.bounds[3]))
    c0 = int(round(cropped.spec.bounds[0] - st.spec.bounds[0]))
    np.testing.assert_array_equal(got[:, 0], dense[:, 0, r0:r0 + h, c0:c0 + w])
    # cropped spec never exceeds the parent raster
    pb, cb = st.spec.bounds, cropped.spec.bounds
    assert cb[0] >= pb[0] and cb[1] >= pb[1] and cb[2] <= pb[2] and cb[3] <= pb[3]
