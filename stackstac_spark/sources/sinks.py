"""Catalog-backed Parquet sinks: hash-bucketed and value-partitioned tables.

These are the write-side half of the 100 TB story:

- ``write_bucketed`` persists a table hash-bucketed (and optionally sorted)
  on its join/dedup key. Two tables bucketed the same way equi-join with NO
  exchange on either side — the single biggest shuffle eliminated in a
  recurring pipeline (e.g. documents ⋈ embeddings on doc_id, or repeated
  self-joins of an LSH candidate table). Bucketing metadata lives in the
  session catalog, so this writes via ``saveAsTable`` (plain
  ``.parquet(path)`` cannot record bucket info).
- ``write_partitioned`` persists value-partitioned Parquet (date, band,
  tile row, …): readers filtering on the partition column scan only the
  matching directories (partition pruning — visible as ``PartitionFilters``
  in the plan).

Bucket-count choice: buckets are fixed at write time and every writing task
opens a file per bucket it touches; aim for buckets ≈ cluster parallelism
× small integer, and repartition by the bucket key first so each task
writes few buckets (done here by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "write_partitioned", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int,
    sort_cols: str | list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed Parquet table named ``table``.

    ``path`` overrides the warehouse location (external table). The frame is
    pre-repartitioned on the bucket columns so each task writes one bucket
    file instead of up to ``num_buckets`` small files.
    """
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.repartition(num_buckets, *bcols)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bcols)
    )
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*scols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Persist ``df`` as value-partitioned Parquet at ``path``."""
    pcols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    writer = df.write.mode(mode).partitionBy(*pcols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata intact, unlike a path read)."""
    return spark.table(table)
