import pytest

from stackstac_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("stackstac-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


def make_item(i, dt, bbox_proj, epsg=32613, assets=("red", "nir"), cloud=10.0, res=1.0):
    """A synthetic STAC item dict with fake:// asset hrefs, in the style of the
    reference's test strategies (tests/test_to_dask.py:23-66)."""
    minx, miny, maxx, maxy = bbox_proj
    h = int(round((maxy - miny) / res))
    w = int(round((maxx - minx) / res))
    return {
        "type": "Feature",
        "id": f"item-{i:04d}",
        "collection": "synthetic",
        "bbox": [-105.5, 39.5, -104.5, 40.5],
        "properties": {
            "datetime": dt,
            "proj:epsg": epsg,
            "eo:cloud_cover": cloud,
            "constant_prop": "same-everywhere",
            "varying_prop": f"v{i}",
        },
        "assets": {
            aid: {
                "href": f"fake://{i}/{j}",
                "type": "image/tiff; application=geotiff; profile=cloud-optimized",
                "proj:bbox": list(bbox_proj),
                "proj:shape": [h, w],
                "proj:transform": [res, 0.0, minx, 0.0, -res, maxy],
                "eo:bands": [{"common_name": aid}],
            }
            for j, aid in enumerate(assets)
        },
    }
