"""Z-order (Morton) clustering — the layout move bucketing can't make.

The reference engine reads whatever layout the catalog hands it; at the
100 TB scale this repo targets, the LAYOUT is an operator too. The
write-side layout primitives already live in
:mod:`stackstac_spark.sources.sinks` (``write_bucketed`` — co-located
joins with zero Exchange; ``write_partitioned`` — file-listing-level
pruning; both re-exported here for discoverability). This module adds the
third lakehouse layout move, multi-column clustering:

- :func:`zorder_key` — Morton (Z-order) interleaving of 2-3 quantized
  columns, the clustering key behind Delta/Iceberg ``OPTIMIZE ZORDER``:
  sort-writing by the interleaved key makes parquet row-group min/max
  stats selective on EVERY interleaved column at once, not just the
  leading sort column (a plain ``sortBy(x)`` leaves y's per-file range at
  full domain width). Pure column math (shiftleft/or/cast, JVM codegen) —
  no UDF, no shuffle beyond the final range-partition.
- :func:`zorder_write` — key → ``repartitionByRange`` →
  ``sortWithinPartitions`` → parquet: the write side of
  ``OPTIMIZE ZORDER BY``. The range partitioner samples the key
  distribution, so skewed inputs still produce balanced files.

Plan + value contracts are pinned in tests/test_storage_layout.py
(bit-for-bit Morton parity with a Python reference; per-file min/max
tightness on both clustered columns; no Python eval nodes in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stackstac_spark.sources.sinks import (  # noqa: F401 (re-exports)
    read_table,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "zorder_key",
    "zorder_write",
    "hilbert_key",
    "write_bucketed",
    "write_partitioned",
    "read_table",
]


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zorder",
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append a Morton (Z-order) interleaved key over 2-3 numeric columns.

    Each column is min-max quantized to ``bits`` bits (range computed in one
    tiny agg unless supplied via ``ranges``, then folded into the expression
    as literals), and the bit patterns are interleaved: bit i of column j
    lands at position ``i*len(cols)+j``. Sorting/range-partitioning by the
    result clusters rows so that parquet row-group min/max stats stay tight
    on EVERY input column — the property ``OPTIMIZE ZORDER BY`` buys in
    Delta/Iceberg.

    Entirely native column expressions (shiftleft/or/cast) → whole-stage
    codegen; the only action is the 1-row min/max agg (skipped when
    ``ranges`` provides the bounds — pass them when the domain is known,
    e.g. lon/lat, to keep the op fully lazy).
    """
    if not 2 <= len(cols) <= 3:
        raise ValueError(f"zorder_key interleaves 2-3 columns, got {len(cols)}")
    if not 1 <= bits <= 20:
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    if ranges is None:
        # one scan for all ranges (driver-side scalar fetch: 1 row)
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
        row = df.agg(*aggs).first()
        ranges = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}
    nlevels = (1 << bits) - 1
    quant = []
    for c in cols:
        mn, mx = ranges[c]
        span = (mx - mn) or 1.0
        # floor() then clamp: the max value quantizes to nlevels, not nlevels+1
        q = F.least(
            F.lit(nlevels),
            F.floor(((F.col(c).cast("double") - F.lit(mn)) / F.lit(span)) * F.lit(nlevels + 1)).cast("long"),
        )
        quant.append(F.greatest(F.lit(0).cast("long"), q))
    # interleave: bit i of column j → position i*k + j
    k = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quant):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return df.withColumn(out_col, key)


def _hilbert_xy2d_py(bits: int, x: int, y: int) -> int:
    """Pure-Python Hilbert xy→d reference (Wikipedia's iterative form with
    per-level reflection) — what the Catalyst unroll and the oracle SQL
    replay; property-tested for bijectivity AND step-adjacency (the
    defining Hilbert invariant Z-order lacks)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "hilbert",
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append a Hilbert-curve clustering key over exactly 2 numeric columns
    — the locality-preserving alternative to :func:`zorder_key`: every
    curve step moves ONE grid cell (no Z-order "seams"), so range scans on
    either column touch ~√2× fewer row groups in the worst case (the
    reason Databricks moved liquid clustering off Morton keys).

    Same min-max quantization contract as ``zorder_key`` (``bits`` bits
    per column, one tiny range agg unless ``ranges`` pins the domain),
    then the standard iterative xy→d transform UNROLLED per bit. Each
    level's (x, y, d) rewrite lands in its own projection (``withColumns``
    per level) — the rewrites reference x and y multiple times, so
    collapsing them into one expression would grow the tree exponentially
    in ``bits``; the stage-per-level shape keeps it linear and
    codegen-friendly. Pure bit/CASE arithmetic → replayed exactly by the
    oracle's chained-CTE unroll.
    """
    if len(cols) != 2:
        raise ValueError(f"hilbert_key interleaves exactly 2 columns, got {len(cols)}")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
        row = df.agg(*aggs).first()
        ranges = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}
    nlevels = (1 << bits) - 1
    quant = []
    for c in cols:
        mn, mx = ranges[c]
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit(nlevels),
            F.floor(((F.col(c).cast("double") - F.lit(mn)) / F.lit(span)) * F.lit(nlevels + 1)).cast("long"),
        )
        quant.append(F.greatest(F.lit(0).cast("long"), q))
    out = df.withColumns(
        {"__hx": quant[0], "__hy": quant[1], out_col: F.lit(0).cast("long")}
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        x, y = F.col("__hx"), F.col("__hy")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d_next = F.col(out_col) + F.lit(s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
        )
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        ).otherwise(x)
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        ).otherwise(y)
        out = out.withColumns({"__hx": nx, "__hy": ny, out_col: d_next})
    return out.drop("__hx", "__hy")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 32,
    mode: str = "errorifexists",
) -> None:
    """Z-order-cluster and write: key → range-repartition → sort within
    partitions → parquet (the write-side of ``OPTIMIZE ZORDER BY``)."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(int(n_files), "zorder")
        .sortWithinPartitions("zorder")
        .drop("zorder")
        .write.mode(mode)
        .parquet(path)
    )


def rle_run_stats(
    df: DataFrame,
    value_cols: list[str],
    page_col: str,
    order_col: str,
) -> DataFrame:
    """Page-local run-length statistics: for each column, how many RLE
    runs the physical layout produces — (a) as laid out today (rows
    grouped in pages by ``page_col``, ordered by ``order_col`` within a
    page — runs never cross page boundaries, exactly like Parquet data
    pages) vs (b) re-clustered on the column itself (lower bound =
    #distinct values). The ratio is the sort-before-write win a layout
    job (zorder_write / ORDER BY in the sink) would buy — the cheap
    "should we re-cluster this table?" report at 100 TB, where a 10×
    run-count drop is a 10× smaller RLE-encoded column.

    Scale shape: per-column one lag window PARTITIONED BY the page key
    (no global sort, no single-task window — pages are independent) and
    one distinct-count agg; output is one row per audited column.
    """
    from functools import reduce

    from pyspark.sql import Window

    outs = []
    for c in value_cols:
        # tie-break the in-page order with the value itself: if
        # (page, order) isn't unique, permutations of tied rows must not
        # move the run count — and with equal-ordered rows also
        # value-sorted, adjacent ties compare equal, so they can't
        w = Window.partitionBy(page_col).orderBy(order_col, F.col(c))
        changed = F.when(
            F.lag(F.col(c)).over(w).isNull()  # first row of its page
            | (F.col(c) != F.lag(F.col(c)).over(w)),
            1,
        ).otherwise(0)
        per_page = df.select(F.lit(c).alias("column"), changed.alias("chg"), F.col(c).alias("v"))
        outs.append(
            per_page.groupBy("column").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("chg").alias("runs_paged"),
                F.count_distinct("v").alias("runs_clustered"),
                F.round(
                    F.sum("chg").cast("double") / F.count_distinct("v"), 6
                ).alias("recluster_gain"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def scd2_history(
    snapshots: DataFrame,
    key_col: str,
    attr_cols: list[str],
    snap_col: str = "snap_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an ordered snapshot
    series: consecutive snapshots where a key's attributes are unchanged
    collapse into one validity interval → (key, attrs, valid_from,
    valid_to, is_current) — the warehouse dimension-history build
    (Kimball SCD2; Delta/Iceberg MERGE pipelines materialize exactly this).

    Change detection is an md5 over the attribute tuple — each attribute
    NULL-protected with ``coalesce(cast(c as string), '\\x00NULL\\x00')``
    before the ``\\x1f``-separated concat, because ``concat_ws`` SKIPS
    nulls and would otherwise collide tuples that differ only by a NULL
    shifting position (standard SCD2 hash-diff practice; the ``\\x00``
    framing keeps the sentinel from colliding with the separator or any
    plausible attribute string) — compared against the per-key previous
    snapshot (one lag window); a running change-count
    window assigns version numbers; one agg per (key, version) yields
    ``valid_from``; a lead window supplies ``valid_to`` (the next
    version's start; NULL ⇒ current). ``snap_col`` must be orderable;
    keys absent from intermediate snapshots are treated as unchanged
    across the gap (deletion tracking needs a tombstone snapshot row —
    out of scope here, stated not hidden).

    Scale shape: three key-partitioned windows + one (key, version) agg —
    all co-keyed on the dimension key, no corpus-wide ordering anywhere.
    """
    from pyspark.sql import Window

    fp = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
                for c in attr_cols
            ],
        )
    )
    w = Window.partitionBy(key_col).orderBy(snap_col)
    marked = snapshots.select(key_col, snap_col, *attr_cols).withColumn(
        "__fp", fp
    ).withColumn(
        "__chg",
        F.when(
            F.lag("__fp").over(w).isNull() | (F.lag("__fp").over(w) != F.col("__fp")),
            1,
        ).otherwise(0),
    ).withColumn("__ver", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    versions = marked.groupBy(key_col, "__ver").agg(
        F.min(snap_col).alias("valid_from"),
        *[F.first(c).alias(c) for c in attr_cols],
    )
    wv = Window.partitionBy(key_col).orderBy("valid_from")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def consecutive_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_id",
) -> DataFrame:
    """Dense 0-based GLOBAL row ids consistent with a total order — the
    "number every row at scale" primitive (training-shard offsets, stable
    export ordering, join-free position features) that neither
    ``monotonically_increasing_id`` (non-consecutive, partition-encoded)
    nor a partition-less ``row_number`` window (single-task, the audit-
    flagged shape) provides.

    The sorted-neighborhood trick (``dedup.sorted_neighborhood_pairs``)
    as a standalone operator: range-repartition by the order columns,
    per-partition ``row_number``, then add per-partition offsets computed
    from ONE P-row count collect (driver-side metadata, P = partition
    count). Ids depend only on the total order — the range sampler's
    boundary placement cannot change them. ``order_cols`` must be a total
    order (append a unique id as the last column); ties would make ids
    nondeterministic, so the column list is used as given for BOTH the
    partitioner and the in-partition sort.
    """
    from pyspark.sql import Window

    if not order_cols:
        raise ValueError("order_cols must be non-empty (a total order)")
    keyed = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # pin partitioning; counted + reused below
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_parts = keyed.rdd.getNumPartitions()
    offsets, acc = [], 0
    for pid in range(n_parts):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    off_col = F.element_at(
        F.array(*[F.lit(o).cast("long") for o in offsets]), F.col("__pid") + 1
    )
    w_in = Window.partitionBy("__pid").orderBy(*order_cols)
    return keyed.withColumn(
        out_col, F.row_number().over(w_in) - 1 + off_col
    ).drop("__pid")


def dataset_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Merkle-style dataset version id: per-row content hashes → per-shard
    hashes (md5 over the shard's SORTED row hashes) → one root hash — the
    reproducibility primitive that answers "is this EXACTLY the corpus the
    model trained on?" and, on mismatch, "which shards changed?" without
    re-reading anything but the changed shards' row hashes.

    Shards are assigned by row-hash prefix (content-addressed, so shard
    membership is stable under repartitioning/reordering of the physical
    files); per-shard aggregation sorts the row hashes before hashing, so
    the fingerprint is ORDER-INVARIANT — two byte-identical corpora laid
    out differently fingerprint identically. Returns one row per shard
    (shard, n_rows, shard_hash) plus a shard = −1 root row
    (root = md5 over the byte-sorted 'shard:hash' strings).

    Scale shape: one map (row md5) + one shard-keyed agg with a
    ``sort_array(collect_list)`` of hashes — per-shard row counts are
    corpus/n_shards, so size shards (or add a second tree level) to keep
    the collected hash list partition-sized; the root is a 1-row agg over
    n_shards rows.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    rows = df.select(
        F.md5(
            F.concat_ws("\x1f", F.col(id_col).cast("string"), F.col(text_col))
        ).alias("h")
    ).withColumn(
        "shard",
        (F.conv(F.substring("h", 1, 4), 16, 10).cast("long") % n_shards).cast("int"),
    )
    shards = rows.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list("h")))).alias("shard_hash"),
    )
    root = shards.agg(
        F.sum("n_rows").alias("n_rows"),
        F.md5(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(":", F.col("shard").cast("string"), "shard_hash")
                    )
                ),
            )
        ).alias("shard_hash"),
    ).select(F.lit(-1).alias("shard"), "n_rows", "shard_hash")
    return shards.unionByName(root)
