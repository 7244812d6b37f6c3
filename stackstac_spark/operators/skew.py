"""Skew-mitigated joins: key salting.

A hash join shuffles both sides on the join key; one pathologically hot key
(a viral document, a null-ish sentinel id, a mega-customer) lands an entire
key's rows on ONE reduce task and the stage runs at the speed of that
straggler. AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`,
on in `session.get_spark`) already handles sort-merge cases at runtime by
splitting oversized partitions; salting is the plan-level fallback that
also works for hash joins, for deterministic tests, and on engines where
AQE cannot see the skew (e.g. skew created inside a preceding UDF stage).

Mechanics: the big side gets a deterministic pseudo-random salt in
[0, n_salts) derived from a hash of its OTHER columns (never the join key —
that would put all hot-key rows in one salt again); the small side is
replicated n_salts times. The join key becomes (key, salt): the hot key now
spreads over n_salts reduce tasks, at the cost of an n_salts× blowup of the
small side — so keep the small side genuinely small or n_salts modest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "grouped_topk"]

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, spreading each of big's keys over
    `n_salts` shuffle partitions. Semantics match ``big.join(small, on,
    how)`` for ``inner``/``left`` (the supported modes: the replicated side
    must be the preserved-duplicate side for outer semantics to hold).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"{_SALT} column already present")

    non_key = [c for c in big.columns if c not in keys]
    if not non_key:
        # degenerate: key-only rows have nothing to salt on; spread uniformly
        # by a per-partition row number surrogate
        salted_big = big.withColumn(
            _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
        )
    else:
        salted_big = big.withColumn(
            _SALT, F.pmod(F.hash(*non_key), F.lit(n_salts)).cast("int")
        )

    replicated = small.withColumn(
        _SALT, F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, keys + [_SALT], how).drop(_SALT)


def grouped_topk(
    df: DataFrame,
    group_cols: str | list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe per-group top-k: the "best K docs per domain" primitive.

    The naive plan — one ``row_number`` window partitioned by group — sends
    EVERY row of a group to one reduce task; a group holding half the corpus
    makes the window stage a single-task straggler (Spark's WindowGroupLimit
    pushdown trims *after* the shuffle, not before it). This runs two
    phases instead:

    1. local: window over ``(group, salt)`` with a deterministic salt from
       the tiebreak column → each salt keeps its own top-k, so at most
       ``n_salts · k`` rows per group survive — a map-heavy stage whose
       reduce keys are ``n_salts×`` finer than the group;
    2. final: the real window over ``group`` on the ≤ ``n_salts·k`` survivors.

    This is the same partial/final shape Spark uses for ``TakeOrdered``,
    applied per group. Output = input rows plus ``rank`` (1-based). Ordering
    is total — (order_col, tiebreak) — so results are deterministic and
    engine-replayable.
    """
    from pyspark.sql import Window

    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    for reserved in ("rank", "_salt", "_lr"):
        if reserved in df.columns:
            raise ValueError(
                f"grouped_topk: input column {reserved!r} collides with an "
                "output/internal column; rename it first"
            )
    tiebreak = tiebreak_col or order_col
    # nulls always LAST: Spark's ASC default is NULLS FIRST, which would let
    # unscored rows displace real winners from the top-k
    direction = (
        F.col(order_col).asc_nulls_last()
        if ascending
        else F.col(order_col).desc_nulls_last()
    )
    order = [direction, F.col(tiebreak).asc()]

    salt = F.pmod(F.hash(F.col(tiebreak).cast("string")), F.lit(n_salts)).cast("int")
    local_w = Window.partitionBy(*keys, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
        .drop("_lr")
    )
    final_w = Window.partitionBy(*keys).orderBy(*order)
    return (
        survivors.drop("_salt")
        .withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= k)
    )
