"""Deterministic Bloom filters for join pre-filtering.

The classic 100 TB pattern: before an expensive semi-join of a huge corpus
against a smallish key set (a blocklist, an eval-set fingerprint table, a
previously-seen-URL set), build a Bloom filter over the key set once and
apply it map-side to the big table — the shuffle then carries only the
~fp-rate fraction of rows that *might* match, and the exact join confirms.
Spark's own runtime row-level filtering does this opportunistically
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, via the internal
`bloom_filter_agg`/`might_contain` pair); this module is the explicit,
engine-replayable version: every bit position is a pure function of
(salt, hash index, key) via md5, so an external SQL engine can rebuild the
exact same filter and replay every membership decision — which makes the
whole candidate set oracle-checkable, false positives included.

Layout: ``m_bits`` bits packed into ``ceil(m/64)`` signed 64-bit words;
hash ``i`` of key ``x`` sets bit ``int(md5("{salt}{i}:" + x)[:8], 16) % m``.

Scale notes: the build is one explode + one ``bit_or`` aggregate over
``m/64`` groups — the shuffle is O(filter size), not O(keys). The apply
side embeds the words as a literal array (Catalyst broadcasts plan
literals to every task), so it is a map-only predicate with zero shuffle
and zero joins; that caps sensible ``m_bits`` at ~10⁷ (a few MB of plan).
Beyond that, keep the words as a table and use the join form — or Spark's
native bloom functions, at the price of replayability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_predicate", "bloom_prefilter"]


def _bit_position(col: Column, hash_idx: int, m_bits: int, salt: str) -> Column:
    """Bit position of hash ``hash_idx`` for ``col``: md5-derived 32-bit
    uniform mod m — identical arithmetic is replayable in any SQL engine."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}{hash_idx}:"), col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return h32 % m_bits


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    n_hashes: int = 3,
    salt: str = "bloom",
) -> list[int]:
    """Aggregate the key set into a packed bit array (``ceil(m/64)`` longs).

    Distributed: k positions per key are exploded, packed into
    ``(word_idx, mask)`` and combined with one ``bit_or`` aggregate over at
    most ``m/64`` groups; only the finished words (tiny) reach the driver.
    """
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if n_hashes <= 0:
        raise ValueError(f"n_hashes must be positive, got {n_hashes}")
    col = F.col(key_col)
    # null keys have no md5 → null positions → a null word group that the
    # packing loop can't place; a null is "no key", so drop it up front
    # (the predicate side agrees: a null probe value never matches)
    positions = keys.filter(col.isNotNull()).select(
        F.explode(
            F.array(*[_bit_position(col, i, m_bits, salt) for i in range(n_hashes)])
        ).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for row in words:
        out[row["word_idx"]] = row["bits"]
    return out


def bloom_predicate(
    col: Column,
    words: list[int],
    n_hashes: int = 3,
    salt: str = "bloom",
) -> Column:
    """Membership test as a pure column expression: all ``n_hashes`` bits
    set. Map-only — fuses into the scan under whole-stage codegen."""
    m_bits = 64 * len(words)
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    # shiftleft() needs a literal shift amount; a 64-entry literal mask array
    # indexed by (pos % 64) keeps the whole predicate a column expression
    # (bit 63 is the signed-long sign bit: 1<<63 - 1<<64)
    masks = F.array(
        *[
            F.lit((1 << b) - (1 << 64 if b == 63 else 0)).cast("bigint")
            for b in range(64)
        ]
    )
    cond = F.lit(True)
    for i in range(n_hashes):
        pos = _bit_position(col, i, m_bits, salt)
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        mask = F.element_at(masks, (pos % 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) == mask)
    return cond


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    key_col: str | None = None,
    m_bits: int = 4096,
    n_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Filter ``big`` to rows whose ``on`` value *might* be in ``keys`` —
    the map-side pre-filter to run before an exact semi-join. Returns
    ``big``'s rows (superset of the true matches, by the Bloom fp rate).
    """
    words = bloom_build(keys, key_col or on, m_bits, n_hashes, salt)
    return big.filter(bloom_predicate(F.col(on), words, n_hashes, salt))
