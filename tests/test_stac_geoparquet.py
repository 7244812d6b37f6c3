"""STAC-GeoParquet ingest (sources/stac.py::items_from_geoparquet).

Fixtures follow the public stac-geoparquet layout (properties flattened to
top-level columns, assets as struct-of-structs or map, bbox as struct in
v1.x / 4-list in v0.x, geometry as WKB). Parity contract: the geoparquet
path must produce byte-identical items_df/assets_df rows to the plain-dict
path for the same catalog, because both run the one `_item_to_rows` kernel.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stackstac_spark.sources.stac import (
    items_from_geoparquet,
    items_to_dataframes,
)

UTC = dt.timezone.utc


def _dict_items():
    out = []
    for i in range(3):
        minx = 100.0 + i * 10
        bounds = [minx, 0.0, minx + 32.0, 32.0]
        it = {
            "id": f"gp{i}",
            "collection": "c1",
            "bbox": [5.0 + i, 40.0, 5.5 + i, 40.5],
            "properties": {
                "datetime": f"2024-06-0{i + 1}T12:30:00Z",
                "proj:epsg": 32633,
                "eo:cloud_cover": 12.5 + i,
            },
            "assets": {
                "red": {
                    "href": f"fake://{i}/0",
                    "type": "image/tiff; application=geotiff",
                    "proj:bbox": bounds,
                    "proj:transform": [2.0, 0.0, minx, 0.0, -2.0, 32.0],
                },
            },
        }
        out.append(it)
    return out


def _write_gpq_v1(path, items):
    """v1.x shape: bbox struct, assets struct-of-structs, tz-aware ts,
    geometry WKB present (must be ignored), one all-null property column."""
    n = len(items)
    asset_t = pa.struct(
        [
            ("href", pa.string()),
            ("type", pa.string()),
            ("proj:bbox", pa.list_(pa.float64())),
            ("proj:transform", pa.list_(pa.float64())),
        ]
    )
    cols = {
        "type": pa.array(["Feature"] * n),
        "stac_version": pa.array(["1.0.0"] * n),
        "id": pa.array([it["id"] for it in items]),
        "collection": pa.array([it["collection"] for it in items]),
        "geometry": pa.array([b"\x01\x03\x00\x00\x00" for _ in items], pa.binary()),
        "bbox": pa.array(
            [dict(zip(("xmin", "ymin", "xmax", "ymax"), it["bbox"])) for it in items]
        ),
        "datetime": pa.array(
            [
                dt.datetime(2024, 6, i + 1, 12, 30, 0, tzinfo=UTC)
                for i in range(n)
            ],
            pa.timestamp("us", tz="UTC"),
        ),
        "proj:epsg": pa.array([32633] * n, pa.int32()),
        "eo:cloud_cover": pa.array([12.5 + i for i in range(n)], pa.float64()),
        "mission": pa.array([None] * n, pa.string()),  # all-null property
        "assets": pa.array(
            [{"red": it["assets"]["red"]} for it in items], pa.struct([("red", asset_t)])
        ),
    }
    pq.write_table(pa.table(cols), path)


def _write_gpq_v0(path, items):
    """v0.x shape: bbox as 4-list, assets as MAP<string, struct>."""
    n = len(items)
    asset_t = pa.struct(
        [
            ("href", pa.string()),
            ("type", pa.string()),
            ("proj:bbox", pa.list_(pa.float64())),
            ("proj:transform", pa.list_(pa.float64())),
        ]
    )
    cols = {
        "id": pa.array([it["id"] for it in items]),
        "collection": pa.array([it["collection"] for it in items]),
        "bbox": pa.array([it["bbox"] for it in items], pa.list_(pa.float64())),
        "datetime": pa.array(
            [dt.datetime(2024, 6, i + 1, 12, 30, 0, tzinfo=UTC) for i in range(n)],
            pa.timestamp("us", tz="UTC"),
        ),
        "proj:epsg": pa.array([32633] * n, pa.int32()),
        "eo:cloud_cover": pa.array([12.5 + i for i in range(n)], pa.float64()),
        "assets": pa.array(
            [[("red", it["assets"]["red"])] for it in items],
            pa.map_(pa.string(), asset_t),
        ),
    }
    pq.write_table(pa.table(cols), path)


def _rows(df, key):
    return sorted([r.asDict(recursive=True) for r in df.collect()], key=lambda r: r[key])


@pytest.mark.parametrize("writer", [_write_gpq_v1, _write_gpq_v0])
def test_geoparquet_matches_dict_path(spark, tmp_path, writer):
    items = _dict_items()
    p = str(tmp_path / "catalog.parquet")
    writer(p, items)
    gi, ga = items_from_geoparquet(spark, p)
    di, da = items_to_dataframes(spark, items)
    g_items, d_items = _rows(gi, "item_id"), _rows(di, "item_id")
    # the dict path has no stac_version/type/mission columns; drop the extra
    # properties the geoparquet fixture adds before comparing, then compare
    # the shared keys exactly (incl. the datetime string form)
    for g, d in zip(g_items, d_items):
        g["properties"] = {
            k: v for k, v in g["properties"].items() if k in d["properties"]
        }
        assert g == d
    assert _rows(ga, "item_id") == _rows(da, "item_id")


def test_geoparquet_stack_e2e(spark, tmp_path):
    """stack(path.parquet) end-to-end: same pixels as stack(list-of-dicts)."""
    from stackstac_spark.stack import stack

    items = _dict_items()
    p = str(tmp_path / "catalog.parquet")
    _write_gpq_v1(p, items)
    st_gpq = stack(spark, p, assets=["red"], chunksize=16)
    st_ref = stack(spark, items, assets=["red"], chunksize=16)
    assert st_gpq.spec == st_ref.spec
    ga = sorted(
        [(r.item_idx, r.band_idx, r.row, r.col, r.value) for r in st_gpq.pixels().collect()]
    )
    ra = sorted(
        [(r.item_idx, r.band_idx, r.row, r.col, r.value) for r in st_ref.pixels().collect()]
    )
    assert ga == ra and len(ga) == 3 * 16 * 16
    # time coordinates parsed from the parquet timestamps match the dict path
    gt = [r.datetime for r in st_gpq.items_df.select("datetime").collect()]
    rt = [r.datetime for r in st_ref.items_df.select("datetime").collect()]
    assert gt == rt


def test_geoparquet_plan_prunes_geometry(spark, tmp_path):
    """`geometry`/`links` are dropped before the scan: the parquet
    ReadSchema must not contain them (column pruning at the source)."""
    items = _dict_items()
    p = str(tmp_path / "catalog.parquet")
    _write_gpq_v1(p, items)
    gi, _ = items_from_geoparquet(spark, p)
    plan = gi._jdf.queryExecution().executedPlan().toString()
    assert "geometry" not in plan


class _Routed(Exception):
    pass


@pytest.mark.parametrize("path,fmt,expect", [
    # routing is by the FINAL component's extension, not a substring match:
    # a JSONL file inside a 'geoparquet_export' dir must go to JSONL (r7 advice)
    ("s3a://bucket/geoparquet_export/items.jsonl", None, "jsonl"),
    ("/data/catalog/items.parquet", None, "geoparquet"),
    ("/data/catalog/*.pq", None, "geoparquet"),
    ("/data/catalog/items.geoparquet", None, "geoparquet"),
    ("/data/catalog/items.GeoParquet", None, "geoparquet"),
    ("/data/geoparquet_parts/", None, "jsonl"),  # extensionless → JSONL default
    ("/data/geoparquet_parts/", "geoparquet", "geoparquet"),  # explicit override
    ("/data/catalog/items.parquet", "jsonl", "jsonl"),  # explicit override wins
])
def test_catalog_path_routing(spark, monkeypatch, path, fmt, expect):
    import stackstac_spark.sources.stac as stac_mod
    from stackstac_spark.stack import stack

    called = {}

    def _gpq(*a, **k):
        called["fmt"] = "geoparquet"
        raise _Routed()

    def _jsonl(*a, **k):
        called["fmt"] = "jsonl"
        raise _Routed()

    monkeypatch.setattr(stac_mod, "items_from_geoparquet", _gpq)
    monkeypatch.setattr(stac_mod, "items_from_jsonl", _jsonl)
    with pytest.raises(_Routed):
        stack(spark, path, catalog_format=fmt)
    assert called["fmt"] == expect


def test_catalog_format_validated(spark):
    from stackstac_spark.stack import stack

    with pytest.raises(ValueError, match="catalog_format"):
        stack(spark, "/tmp/x.jsonl", catalog_format="csv")


def test_items_to_geoparquet_round_trip(spark, tmp_path):
    """Writer → reader round trip: items exported by items_to_geoparquet
    re-ingest to byte-identical items/assets rows as the dict path — the
    catalog export loop closed (search → process → derived catalog)."""
    from stackstac_spark.sources.stac import items_to_geoparquet

    items = _dict_items()
    p = str(tmp_path / "derived.parquet")
    items_to_geoparquet(items, p)
    gi, ga = items_from_geoparquet(spark, p)
    di, da = items_to_dataframes(spark, items)
    assert _rows(gi, "item_id") == _rows(di, "item_id")
    assert _rows(ga, "item_id") == _rows(da, "item_id")


def test_items_to_geoparquet_heterogeneous_assets(spark, tmp_path):
    """Items with DIFFERENT asset keys / property sets: the unified Arrow
    schema unions them with nulls, and the reader drops the null slots."""
    from stackstac_spark.sources.stac import items_to_geoparquet
    from tests.conftest import make_item

    a = make_item(0, "2024-01-01T00:00:00Z", (0.0, 0.0, 8.0, 8.0), assets=("red",))
    b = make_item(1, "2024-01-02T00:00:00Z", (0.0, 0.0, 8.0, 8.0), assets=("red", "nir"))
    b["properties"]["only_on_b"] = "x"
    p = str(tmp_path / "hetero.parquet")
    items_to_geoparquet([a, b], p)
    gi, ga = items_from_geoparquet(spark, p)
    rows = _rows(ga, "item_id")
    by_item = {}
    for r in rows:
        by_item.setdefault(r["item_id"], set()).add(r["asset_id"])
    assert by_item == {"item-0000": {"red"}, "item-0001": {"red", "nir"}}
    props = {r["item_id"]: r["properties"] for r in _rows(gi, "item_id")}
    assert props["item-0001"]["only_on_b"] == "x"
    assert "only_on_b" not in props["item-0000"]


def test_items_to_geoparquet_empty_raises(tmp_path):
    from stackstac_spark.sources.stac import items_to_geoparquet

    with pytest.raises(ValueError):
        items_to_geoparquet([], str(tmp_path / "x.parquet"))
