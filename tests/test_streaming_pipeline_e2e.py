"""End-to-end composed streaming pipeline: file stream → watermark-bounded
dedup → stream-static enrichment → sliding-window aggregation → memory sink.
Each stage is individually tested elsewhere; this verifies they COMPOSE into
one incremental query (one state store for dedup, one for the windows, a
stateless broadcast enrich in between) and that a second micro-batch with
duplicates and late rows lands correctly."""

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_streaming_pipeline_dedup_enrich_window(spark, tmp_path):
    from stackstac_spark.streaming.ingest import (
        dedup_stream,
        enrich_stream,
        sliding_window_agg,
    )

    src = tmp_path / "stream"
    src.mkdir()
    base = 1_700_000_000  # epoch seconds; 15-min-grid aligned windows below

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # batch 0: 6 events, one in-batch duplicate id
    write_batch(
        "b0.json",
        [
            {"event_id": i, "sensor": f"s{i % 2}", "ts_s": base + i * 60, "value": 1.0}
            for i in range(5)
        ]
        + [{"event_id": 0, "sensor": "s0", "ts_s": base, "value": 1.0}],  # dup
    )

    stream = (
        spark.readStream.schema("event_id LONG, sensor STRING, ts_s LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_seconds("ts_s"))
    )
    dim = spark.createDataFrame(
        [("s0", "building-a"), ("s1", "building-b")], "sensor STRING, site STRING"
    )
    deduped = dedup_stream(stream, keys="event_id", ts_col="ts", watermark="1 hour")
    enriched = enrich_stream(deduped, dim, on="sensor")
    # the watermark set by dedup_stream flows through the (stateless)
    # enrichment; redefining it at the window stage is disallowed when
    # multiple stateful operators share a query — inherit it instead
    out = sliding_window_agg(enriched, "1 hour", "15 minutes", key_col="site")
    q = (
        out.writeStream.format("memory")
        .queryName("pipe_e2e")
        .outputMode("complete")
        .start()
    )
    try:
        def total():
            return (
                spark.sql("SELECT sum(n_events) AS n FROM pipe_e2e").collect()[0]["n"]
                or 0
            )

        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            if total() == 20:  # 5 unique events × 4 sliding windows each
                break
            time.sleep(0.5)
        assert total() == 20

        # batch 1: replays event 2 (cross-batch dup, inside watermark) and
        # adds one new event — only the new one lands
        write_batch(
            "b1.json",
            [
                {"event_id": 2, "sensor": "s0", "ts_s": base + 120, "value": 1.0},
                {"event_id": 9, "sensor": "s1", "ts_s": base + 600, "value": 2.0},
            ],
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            if total() == 24:  # +1 unique event × 4 windows
                break
            time.sleep(0.5)
        assert total() == 24

        sites = {
            r["site"]
            for r in spark.sql("SELECT DISTINCT site FROM pipe_e2e").collect()
        }
        assert sites == {"building-a", "building-b"}  # enrichment applied
    finally:
        q.stop()


def test_stateless_curation_ops_run_on_streams(spark, tmp_path):
    """hash_split and script_stats are pure column expressions, so the SAME
    operator code runs unchanged in a Structured Streaming query — the
    batch/stream unification a curation ingest relies on (assign splits and
    score documents as they arrive, no batch re-pass)."""
    import json as _json

    from stackstac_spark.operators.sampling import hash_split
    from stackstac_spark.operators.textstats import script_stats

    src = tmp_path / "docs"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for i in range(50):
            f.write(_json.dumps({"doc_id": i, "text": f"doc {i} text {i%7}"}) + "\n")

    stream = spark.readStream.schema("doc_id LONG, text STRING").json(str(src))
    split = hash_split(stream, {"train": 0.8, "val": 0.2})
    scored = script_stats(split, id_col="doc_id")  # stateless: composes on the stream
    assert scored.isStreaming
    q = (
        split.writeStream.format("memory").queryName("stream_split").outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stream_split").collect()
        assert len(rows) == 50  # fractions sum to 1
        # identical assignment to the batch operator (unified semantics)
        batch = {
            (r.doc_id, r.split)
            for r in hash_split(
                spark.read.schema("doc_id LONG, text STRING").json(str(src)),
                {"train": 0.8, "val": 0.2},
            ).collect()
        }
        assert {(r.doc_id, r.split) for r in rows} == batch
    finally:
        q.stop()
