"""Structured Streaming ingest of STAC items.

The reference has no streaming (SURVEY §2.7) — its closest analogue is the
temporal ``resample`` and the tile server's incremental recompute. Here the
natural Spark extension: a stream of STAC item JSON (files / Kafka) becomes
an incrementally maintained catalog with watermarked, windowed rollups.

``stream_items`` reads item JSONL with the same typed schema the batch path
uses (sources/stac.ITEM_SCHEMA's JSON shape), so every downstream metadata
operator works unchanged on the stream. ``windowed_item_counts`` shows the
watermark + tumbling-window aggregation pattern; arbitrary stateful logic
(e.g. per-collection session gaps) would go through
``applyInPandasWithState`` with the same DataFrame contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STREAM_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("collection", T.StringType()),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
    ]
)


def stream_items(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    """readStream over a directory of STAC item JSONL."""
    return (
        spark.readStream.schema(STREAM_ITEM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
        .withColumn("datetime", F.to_timestamp(F.col("properties")["datetime"]))
    )


def windowed_item_counts(
    items: DataFrame, every: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Tumbling window counts per collection with late-data watermark."""
    return (
        items.withWatermark("datetime", watermark)
        .groupBy(F.window("datetime", every).alias("w"), "collection")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .select(F.col("w.start").alias("window_start"), "collection", "n_items")
    )


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain the stream with availableNow into an in-memory table (tests /
    backfills); production sinks are parquet/Delta via writeStream."""
    (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
