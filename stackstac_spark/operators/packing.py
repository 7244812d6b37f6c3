"""Sequence packing for LLM training-data pipelines.

GPT-style packing concatenates documents in a deterministic order and cuts
the token stream into fixed-capacity context windows ("chunks"); a document
may straddle a chunk boundary. This operator computes, per document, its
byte-offset-style token offset and the chunk span it lands in — the
assignment a downstream tokenize-and-pack writer needs to emit shards
deterministically and in parallel.

Scale shape: ONE shuffle, on the shard key, then a single running-sum window
ordered by doc id WITHIN each shard — never a global sort (a single global
token stream would serialize 100 TB through one task; real pipelines pack
per input shard/file, which is exactly the semantics here). Skew note: one
pathological shard still packs in one task — split oversized shards upstream
(e.g. re-shard by hash(doc_id) % k into synthetic sub-shards) because
sub-sharding changes chunk assignment and must be a caller decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = None,
) -> DataFrame:
    """Assign each document to training chunks of ``capacity`` tokens.

    Documents are packed per ``shard_col`` in ascending ``id_col`` order.
    ``len_col`` supplies a precomputed token count; when None, tokens are
    whitespace words of ``text_col``.

    Returns (shard, id, n_tokens, start_offset, start_chunk, end_chunk,
    n_chunks): ``start_offset`` is the doc's first token position in its
    shard's concatenated stream; chunks are ``floor(position / capacity)``
    so a doc spans end_chunk - start_chunk + 1 windows.
    """
    if capacity <= 0:
        raise ValueError(f"pack_sequences: capacity must be positive, got {capacity}")
    n = (
        F.col(len_col)
        if len_col is not None
        else F.size(F.split(F.lower(F.col(text_col)), " "))
    )
    base = df.select(F.col(shard_col).alias("shard"), F.col(id_col), n.alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    withoff = base.select(
        "shard",
        id_col,
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    )
    start_chunk = F.floor(F.col("start_offset") / capacity).cast("bigint")
    # a zero-token doc occupies no window; pin its end to its start
    end_chunk = F.greatest(
        F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / capacity).cast("bigint"),
        start_chunk,
    )
    return withoff.select(
        "shard",
        id_col,
        "n_tokens",
        "start_offset",
        start_chunk.alias("start_chunk"),
        end_chunk.alias("end_chunk"),
        (end_chunk - start_chunk + 1).alias("n_chunks"),
    )


def sliding_chunks(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-stride sliding-window chunking — the RAG-ingestion splitter:
    token windows of ``chunk_tokens`` starting every ``stride`` tokens
    (overlap = chunk_tokens − stride), last window ragged, documents
    shorter than one stride yield a single chunk.

    Returns (id, chunk_idx, chunk_text, n_chunk_tokens). One generator
    expression per doc (JVM ``transform`` over a sequence — no Python, no
    shuffle: chunking is map-only and fuses into the scan; the output is
    ~chunk/stride× the corpus, which is the operator's semantics, not
    overhead).
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError(
            f"chunk_tokens and stride must be positive, got {chunk_tokens}, {stride}"
        )
    if stride > chunk_tokens:
        raise ValueError(
            f"stride ({stride}) must not exceed chunk_tokens ({chunk_tokens}): "
            "a larger stride would skip tokens and emit phantom empty chunks "
            "(overlap = chunk_tokens - stride must be >= 0)"
        )
    t = df.select(
        id_col, F.split(F.lower(F.col(text_col)), r"\s+").alias("__t")
    ).filter(F.size("__t") >= 1)
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    n_win = F.lit(1) + F.ceil(
        F.greatest(F.size("__t") - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = t.withColumn("__nw", n_win).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, __nw - 1), "
                f"i -> concat_ws(' ', slice(__t, i * {stride} + 1, {chunk_tokens})))"
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    return chunks.withColumn(
        "n_chunk_tokens", F.size(F.split("chunk_text", " "))
    )
