"""RasterStack.create_views — the pure-SQL query surface (round 6).

The reference exposes its stack through xarray method chaining
(README.md:49-57); our SQL-first equivalent registers the stack's lazy
DataFrames as temp views so the whole workflow can be written in
``spark.sql``. These tests pin the view inventory, the georeferencing
joins (x/y label views), result parity between the SQL and DataFrame
routes, and that Catalyst still prunes/pushes through the views.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from stackstac_spark.stack import stack
from tests.conftest import make_item


@pytest.fixture(scope="module")
def viewed_stack(spark):
    items = [
        make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 32.0, 32.0)),
        make_item(1, "2024-02-05T00:00:00Z", (0.0, 0.0, 32.0, 32.0)),
    ]
    st = stack(spark, items, assets=["red", "nir"], chunksize=16)
    names = st.create_views(prefix="tv_")
    return st, names


def test_view_inventory(spark, viewed_stack):
    st, names = viewed_stack
    expected = {
        "tv_tiles",
        "tv_pixels",
        "tv_item_coords",
        "tv_band_coords",
        "tv_x_coords",
        "tv_y_coords",
    }
    assert expected.issubset(set(names))
    for name in names:
        assert spark.catalog.tableExists(name), name
    assert spark.table("tv_band_coords").count() == 2
    assert spark.table("tv_item_coords").count() == 2


def test_sql_matches_dataframe_route(spark, viewed_stack):
    st, _ = viewed_stack
    via_sql = spark.sql(
        """
        SELECT p.row, p.col, round(avg(p.value), 6) AS mean_red
        FROM tv_pixels p JOIN tv_band_coords b ON p.band_idx = b.band_idx
        WHERE b.band = 'red'
        GROUP BY p.row, p.col ORDER BY p.row, p.col
        """
    ).collect()
    via_df = (
        st.sel_bands(["red"])
        .pixels()
        .groupBy("row", "col")
        .agg(F.round(F.avg("value"), 6).alias("mean_red"))
        .orderBy("row", "col")
        .collect()
    )
    assert via_sql == via_df


def test_georeferenced_sql_join(spark, viewed_stack):
    """The x/y label views turn (row, col) into CRS coordinates — the SQL
    analogue of xarray's coordinate arrays. Spot-check the affine: spec
    origin (0, 32), res 1, topleft convention → x = col, y = 32 - row."""
    st, _ = viewed_stack
    rows = spark.sql(
        """
        SELECT p.row, p.col, x.x, y.y
        FROM tv_pixels p JOIN tv_x_coords x ON p.col = x.col
                         JOIN tv_y_coords y ON p.row = y.row
        WHERE p.row IN (0, 5) AND p.col IN (0, 7) AND p.band_idx = 0
          AND p.item_idx = 0
        ORDER BY p.row, p.col
        """
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.x == float(r.col)
        assert r.y == float(32 - r.row)


def test_views_keep_catalyst_pruning(spark, viewed_stack):
    """A filtered single-band SQL query through the views must still reach
    the tile scan with the band filter applied BEFORE the pixel explode —
    i.e. the view is the same lazy plan, not a materialization."""
    plan = spark.sql(
        "SELECT row, col, value FROM tv_pixels WHERE band_idx = 0"
    )._jdf.queryExecution().optimizedPlan().toString()
    # the band predicate must appear below/alongside the scan, not only at
    # the top: the explode UDF emits band_idx, so Catalyst keeps the filter
    # above mapInPandas but below any further ops — presence of the filter
    # in the optimized plan (not a post-collect filter) is the contract
    assert "band_idx" in plan and "Filter" in plan


def test_monthly_median_ndvi_sql_workflow(spark):
    """The full README workflow in one SQL statement (monthly median NDVI)
    against the painted closed-form oracle — the in-repo twin of the
    raster_sql_ndvi driver gate."""
    items = [
        make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 16.0, 16.0)),
        make_item(1, "2024-01-20T00:00:00Z", (0.0, 0.0, 16.0, 16.0)),
        make_item(2, "2024-02-03T00:00:00Z", (0.0, 0.0, 16.0, 16.0)),
    ]
    st = stack(spark, items, assets=["red", "nir"], chunksize=16)
    st.create_views(prefix="mm_")
    out = spark.sql(
        """
        WITH nd AS (
          SELECT p.item_idx, p.row, p.col,
                 max(CASE WHEN b.band = 'red' THEN p.value END) AS red,
                 max(CASE WHEN b.band = 'nir' THEN p.value END) AS nir
          FROM mm_pixels p JOIN mm_band_coords b ON p.band_idx = b.band_idx
          GROUP BY p.item_idx, p.row, p.col
        )
        SELECT substring(i.datetime, 1, 7) AS month, n.row, n.col,
               median((n.nir - n.red) / (n.nir + n.red)) AS nd_med
        FROM nd n JOIN mm_item_coords i ON n.item_idx = i.item_idx
        GROUP BY month, n.row, n.col ORDER BY month, n.row, n.col
        """
    ).collect()
    # fake painted value: item*1000 + band + r*1e-3 + c*1e-6 → ndvi = 1/(red+nir)
    def nd(i, r, c):
        red = i * 1000 + r * 1e-3 + c * 1e-6
        return 1.0 / (2 * red + 1)

    got = {(x.month, x.row, x.col): x.nd_med for x in out}
    assert got[("2024-01", 3, 4)] == pytest.approx(
        np.median([nd(0, 3, 4), nd(1, 3, 4)]), abs=1e-12
    )
    assert got[("2024-02", 3, 4)] == pytest.approx(nd(2, 3, 4), abs=1e-12)
    assert len(got) == 2 * 16 * 16


# ---------------------------------------------------------------------------
# xarray-style .sel / .isel dispatchers (round 6)
# ---------------------------------------------------------------------------


def test_sel_dispatcher_band_time_item(spark):
    from tests.conftest import make_item

    items = [
        make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 16.0, 16.0)),
        make_item(1, "2024-02-05T00:00:00Z", (0.0, 0.0, 16.0, 16.0)),
        make_item(2, "2024-02-20T00:00:00Z", (0.0, 0.0, 16.0, 16.0)),
    ]
    st = stack(spark, items, assets=["red", "nir"], chunksize=16)
    one = st.sel(band="red", time=slice("2024-02-01", "2024-02-10"))
    assert one.asset_ids == ["red"]
    assert [r.item_id for r in one.items_df.collect()] == ["item-0001"]
    feb = st.sel(time="2024-02")  # prefix match keeps both February items
    assert feb.items_df.count() == 2
    byid = st.sel(item="item-0002")
    assert [r.item_idx for r in byid.items_df.collect()] == [2]
    with pytest.raises(ValueError, match="step"):
        st.sel(time=slice("2024-01", "2024-02", 2))
    # chained: sel returns a stack, so compute still works
    dense = one.compute()
    assert dense.shape[:2] == (1, 1)


def test_isel_time_positions_after_filtering(spark):
    from tests.conftest import make_item

    items = [
        make_item(i, f"2024-01-{i+1:02d}T00:00:00Z", (0.0, 0.0, 16.0, 16.0))
        for i in range(4)
    ]
    st = stack(spark, items, assets=["red"], chunksize=16)
    assert [r.item_idx for r in st.isel_time(0).items_df.collect()] == [0]
    assert [r.item_idx for r in st.isel_time(-1).items_df.collect()] == [3]
    assert sorted(r.item_idx for r in st.isel_time([1, 2]).items_df.collect()) == [1, 2]
    # positions address the FILTERED stack: drop item 0, position 0 -> item 1
    sub = st.filter_items(F.col("item_id") != "item-0000")
    assert [r.item_idx for r in sub.isel_time(0).items_df.collect()] == [1]
    assert [r.item_idx for r in sub.isel_time(-1).items_df.collect()] == [3]
    with pytest.raises(IndexError, match="out of range"):
        sub.isel_time(3)


def test_stack_properties_and_band_coords_params(spark):
    """Reference stack() parity (stack.py:45-46): properties= picks which
    item-property fields survive as time metadata; band_coords=False drops
    the per-band metadata table."""
    from tests.conftest import make_item

    items = [make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 16.0, 16.0))]
    full = stack(spark, items, assets=["red"], chunksize=16)
    assert len(full.items_df.first().properties) > 1
    assert full.band_fields is not None and full.band_fields.count() > 0

    none = stack(spark, items, assets=["red"], chunksize=16, properties=False,
                 band_coords=False)
    assert none.items_df.first().properties == {}
    assert none.band_fields is None
    # the data plane is untouched: pixels still compute
    assert not np.isnan(none.compute()).all()

    one = stack(spark, items, assets=["red"], chunksize=16,
                properties="eo:cloud_cover")
    assert set(one.items_df.first().properties) == {"eo:cloud_cover"}
    some = stack(spark, items, assets=["red"], chunksize=16,
                 properties=["eo:cloud_cover", "constant_prop"])
    assert set(some.items_df.first().properties) == {"eo:cloud_cover", "constant_prop"}
    # create_views omits the band_fields view when band_coords=False
    names = none.create_views(prefix="nb_")
    assert "nb_band_fields" not in names
