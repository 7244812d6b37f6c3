"""Tile-table Parquet checkpoint roundtrip + custom stateful streaming op."""

import json

import numpy as np
from pyspark.sql import functions as F

from stackstac_spark.operators.export import read_tiles, write_tiles
from stackstac_spark.stack import stack
from tests.conftest import make_item


def test_tile_checkpoint_roundtrip(spark, tmp_path):
    items = [
        make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 40.0, 30.0)),
        make_item(1, "2024-02-05T00:00:00Z", (10.0, 5.0, 50.0, 40.0)),
    ]
    st = stack(spark, items, assets=["red", "nir"], chunksize=16)
    dense_before = st.compute()

    path = str(tmp_path / "ckpt")
    write_tiles(st, path)
    st2 = read_tiles(spark, path)

    assert st2.spec == st.spec
    assert st2.asset_ids == st.asset_ids
    np.testing.assert_array_equal(st2.compute(), dense_before)

    # band select on the restored stack = partition pruning on band_idx
    red = st2.sel_bands(["red"])
    assert red.tiles.filter(F.col("band_idx") != 0).count() == 0
    plan = red.tiles._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "band_idx" in plan


def test_stateful_sessionized_counts(spark, tmp_path):
    from stackstac_spark.streaming.ingest import (
        run_to_memory,
        sessionized_item_counts,
        stream_items,
    )

    p = tmp_path / "items"
    p.mkdir()
    # two files => two micro-batches (maxFilesPerTrigger=1); the session gap
    # (7 days) splits c1 into two sessions, and state must carry across
    # micro-batches for c2's single session to stay one
    batch1 = [
        {"id": "a", "collection": "c1",
         "properties": {"datetime": "2024-01-01T00:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
        {"id": "b", "collection": "c1",
         "properties": {"datetime": "2024-01-02T00:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
        {"id": "c", "collection": "c2",
         "properties": {"datetime": "2024-01-01T00:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
    ]
    batch2 = [
        {"id": "d", "collection": "c1",
         "properties": {"datetime": "2024-02-01T00:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
        {"id": "e", "collection": "c2",
         "properties": {"datetime": "2024-01-03T00:00:00Z"}, "bbox": [0.0, 0.0, 1.0, 1.0]},
    ]
    with open(p / "b1.jsonl", "w") as f:
        for it in batch1:
            f.write(json.dumps(it) + "\n")
    with open(p / "b2.jsonl", "w") as f:
        for it in batch2:
            f.write(json.dumps(it) + "\n")

    stream = stream_items(spark, str(p), max_files_per_trigger=1)
    run_to_memory(sessionized_item_counts(stream, gap="7 days"), "sessions", "update")
    rows = spark.sql("select * from sessions").collect()
    final = {}
    for r in rows:  # update mode appends one row per (batch, key); keep last
        final[r.collection] = (r.n_sessions, r.n_items)
    assert final["c1"] == (2, 3)  # Jan 1-2 session, then Feb 1 after the gap
    assert final["c2"] == (1, 2)  # Jan 1 + Jan 3 stay one session across batches


def test_items_from_jsonl_matches_list_path(spark, tmp_path):
    """The distributed JSONL ingest must be byte-identical to the driver-side
    list path: same schemas, same prepared stack, same pixels."""
    items = [
        make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 16.0, 16.0)),
        make_item(1, "2024-02-05T00:00:00Z", (8.0, 8.0, 24.0, 24.0)),
    ]
    p = tmp_path / "catalog"
    p.mkdir()
    with open(p / "items.jsonl", "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")

    st_list = stack(spark, items, assets=["red"], chunksize=16)
    st_path = stack(spark, str(p / "*.jsonl"), assets=["red"], chunksize=16)
    assert st_path.spec == st_list.spec
    np.testing.assert_array_equal(st_path.compute(), st_list.compute())


def test_incremental_stack_sink(spark, tmp_path):
    """Streaming scenes → append-only tile table; new files become new tile
    rows without rewriting old ones, and the result matches the batch scan."""
    from stackstac_spark.raster_spec import RasterSpec
    from stackstac_spark.streaming.ingest import incremental_stack_sink

    spec = RasterSpec(32613, (0.0, 0.0, 32.0, 32.0), (1.0, 1.0))
    src = tmp_path / "stream"
    src.mkdir()
    items1 = [make_item(0, "2024-01-05T00:00:00Z", (0.0, 0.0, 16.0, 16.0))]
    with open(src / "b1.jsonl", "w") as f:
        f.write(json.dumps(items1[0]) + "\n")

    out = str(tmp_path / "stack")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_stack_sink(
        spark, str(src), spec, out, assets=["red"], chunksize=16, checkpoint=ckpt
    )
    q.awaitTermination()
    n1 = spark.read.parquet(f"{out}/tiles").count()
    assert n1 > 0

    # second batch: a new scene lands; old rows untouched, new rows appended
    items2 = [make_item(1, "2024-02-05T00:00:00Z", (16.0, 16.0, 32.0, 32.0))]
    with open(src / "b2.jsonl", "w") as f:
        f.write(json.dumps(items2[0]) + "\n")
    q = incremental_stack_sink(
        spark, str(src), spec, out, assets=["red"], chunksize=16, checkpoint=ckpt
    )
    q.awaitTermination()
    tiles = spark.read.parquet(f"{out}/tiles")
    assert tiles.count() > n1
    assert {r.batch_id for r in tiles.select("batch_id").distinct().collect()} == {0, 1}

    # batch-path equivalence: same items through stack() give the same pixels
    from stackstac_spark.sources.raster import explode_pixels
    from stackstac_spark.stack import stack as batch_stack

    st = batch_stack(spark, items1 + items2, assets=["red"], chunksize=16,
                     epsg=32613, resolution=1.0, bounds=spec.bounds)
    batch_px = {
        (r.row, r.col, r.value)
        for r in st.pixels().collect()
    }
    stream_px = {
        (r.row, r.col, r.value)
        for r in explode_pixels(tiles.drop("batch_id")).collect()
    }
    assert stream_px == batch_px
