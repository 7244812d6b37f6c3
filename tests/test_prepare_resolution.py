"""Resolution-inference parity with the reference (prepare.py:268-333).

Three branches, mirrored exactly:
- transform present, same CRS  → |a|, |e| straight off the geotransform
- transform present, cross CRS → a 1-pixel box reprojected into the output
  CRS (reference prepare.py:287-301) — NOT native-bounds/shape, which would
  be off by orders of magnitude when units differ (UTM meters vs degrees)
- no transform                 → out-CRS bbox extent / proj:shape
"""

import numpy as np
import pytest

from stackstac_spark.functions.proj import transform_xy
from stackstac_spark.stack import stack
from tests.conftest import make_item


def _utm_item(i=0, res=10.0, origin=(500000.0, 4000000.0), size=32):
    minx, miny = origin
    return make_item(
        i,
        "2024-01-01T00:00:00Z",
        (minx, miny, minx + size * res, miny + size * res),
        epsg=32613,
        res=res,
    )


def test_cross_crs_resolution_is_in_output_units(spark):
    """10 m UTM pixels stacked to EPSG:4326 must infer a resolution of
    ~1e-4 degrees, not 10 (meters)."""
    item = _utm_item(res=10.0)
    st = stack(spark, item, epsg=4326, chunksize=32)
    rx, ry = st.spec.resolutions_xy

    # expected: the asset's (0,0) unit-pixel box through the same transform
    a = item["assets"]["red"]["proj:transform"]  # (10, 0, minx, 0, -10, maxy)
    cols = np.array([0.0, 0.0, 1.0, 1.0])
    rows = np.array([0.0, 1.0, 1.0, 0.0])
    xs = a[0] * cols + a[1] * rows + a[2]
    ys = a[3] * cols + a[4] * rows + a[5]
    tx, ty = transform_xy(32613, 4326, xs, ys)
    assert rx == pytest.approx(float(tx.max() - tx.min()), rel=1e-9)
    assert ry == pytest.approx(float(ty.max() - ty.min()), rel=1e-9)
    # the actual point of the fix: degrees, not meters
    assert rx < 1e-3 and ry < 1e-3


def test_same_crs_resolution_from_geotransform(spark):
    st = stack(spark, _utm_item(res=10.0), chunksize=32)
    assert st.spec.resolutions_xy == (10.0, 10.0)


def test_transformless_resolution_divides_projected_bbox(spark):
    """proj:shape + proj:bbox but no transform: out-CRS bbox / shape."""
    item = _utm_item(res=10.0, size=32)
    for asset in item["assets"].values():
        del asset["proj:transform"]
    st = stack(spark, item, epsg=32613, chunksize=32)
    # same-CRS: bbox extent 320 / shape 32 = 10
    assert st.spec.resolutions_xy == (10.0, 10.0)

    item2 = _utm_item(res=10.0, size=32)
    for asset in item2["assets"].values():
        del asset["proj:transform"]
    st2 = stack(spark, item2, epsg=4326, chunksize=32)
    rx, ry = st2.spec.resolutions_xy
    # cross-CRS: quotient of the REPROJECTED bbox → degrees
    b = item2["assets"]["red"]["proj:bbox"]
    xs = np.array([b[0], b[2], b[0], b[2]])
    ys = np.array([b[1], b[1], b[3], b[3]])
    tx, ty = transform_xy(32613, 4326, xs, ys)
    assert rx == pytest.approx(float(tx.max() - tx.min()) / 32, rel=1e-9)
    assert ry == pytest.approx(float(ty.max() - ty.min()) / 32, rel=1e-9)
    assert rx < 1e-3


def test_non_rectilinear_transform_raises(spark):
    item = _utm_item()
    for asset in item["assets"].values():
        t = asset["proj:transform"]
        asset["proj:transform"] = [t[0], 0.5, t[2], 0.5, t[4], t[5]]
    with pytest.raises(NotImplementedError, match="non-rectilinear"):
        stack(spark, item, chunksize=32)
    # explicit resolution= bypasses the guard, like the reference
    st = stack(spark, item, resolution=10.0, chunksize=32)
    assert st.spec.resolutions_xy == (10.0, 10.0)


def test_no_metadata_for_resolution_raises(spark):
    item = _utm_item()
    for asset in item["assets"].values():
        del asset["proj:transform"]
        del asset["proj:shape"]
    with pytest.raises(ValueError, match="resolution"):
        stack(spark, item, chunksize=32)
    st = stack(spark, item, resolution=10.0, chunksize=32)
    assert st.spec.resolutions_xy == (10.0, 10.0)
