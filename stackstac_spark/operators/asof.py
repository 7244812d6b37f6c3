"""Sort-based as-of join.

The reference engine (stackstac) has no as-of join, but any event-analytics
user of this engine hits the shape immediately: "for each left row, the
latest right row at-or-before it, per key". The naive Spark plan is a range
join — ``left ⋈ right ON same key AND r.ts <= l.ts`` — which produces
O(Σ_key |L_k| × |R_k|) intermediate rows before the per-left-row aggregate.
One heavy key (10⁵ right rows × 10⁴ left rows) is 10⁹ pairs on a single
task; partial aggregation bounds memory but not CPU. This module ships the
scale-safe plan instead:

    union(left, right) per key
      → one Window: last(right_value, ignorenulls)
        OVER (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING)
      → filter to left rows

O(n log n) in the per-key row count, exactly one shuffle (the window's
partitionBy), no join at all. At 100 TB a skewed key costs one big sort
partition rather than a quadratic pair blow-up, and AQE can split the sort.

Tie semantics: with ``allow_exact_matches=True`` (the default, matching
pandas.merge_asof), a right row at exactly the left row's timestamp is
visible — the union's secondary sort key places right rows before left rows
at equal ts. With ``False`` the order flips.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    how: str = "inner",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    matched_ts: str = "asof_ts",
) -> DataFrame:
    """Match each ``left`` row to the nearest ``right`` row per key.

    Parameters
    ----------
    on : key column name(s) shared by both sides.
    left_ts / right_ts : ordering column on each side (numeric or timestamp).
    right_cols : right-side value columns to carry over (default: every
        right column that is not a key and not ``right_ts``).
    how : ``"inner"`` drops left rows with no match; ``"left"`` keeps them
        with nulls.
    direction : ``"backward"`` (latest right at-or-before left, the default)
        or ``"forward"`` (earliest right at-or-after left).
    matched_ts : output column name holding the matched right timestamp.

    Returns: all ``left`` columns + ``matched_ts`` + ``right_cols``.

    The right side must be unique per ``(key, right_ts)`` for deterministic
    values — pre-aggregate ties upstream (e.g. ``max_by``), as any asof
    engine requires.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        skip = set(keys) | {right_ts}
        right_cols = [c for c in right.columns if c not in skip]
    right_cols = list(right_cols)

    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    if matched_ts in left.columns or matched_ts in right_cols:
        raise ValueError(f"matched_ts {matched_ts!r} collides with an output column")
    # '__'-prefixed names are reserved for the union/window internals
    # (__ts/__side/__is_left/__r/__match and the __r struct's fields); an
    # input column named like them would silently shadow or duplicate.
    dunder = sorted({c for c in (*left.columns, *right.columns) if c.startswith("__")})
    if dunder:
        raise ValueError(
            f"asof_join reserves '__'-prefixed column names internally; "
            f"rename input columns: {dunder}"
        )

    # left_ts travels as __ts and is re-aliased on output, so exclude it here
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    # Null ordering keys are rejected (pandas.merge_asof raises on them too):
    # under the backward (asc) ordering a null right_ts would sort first and
    # silently become every unmatched left row's "match", and forward (desc)
    # would behave differently. The check is IN-PLAN (when(null, raise_error))
    # so it stays lazy and free when no nulls exist — no eager count() pass.
    def _nn(c: Column, what: str) -> Column:
        return F.when(
            c.isNull(),
            F.raise_error(
                F.lit(
                    f"asof_join: null {what} ordering key "
                    "(pandas.merge_asof also rejects null keys); filter nulls upstream"
                )
            ).cast(left.schema[left_ts].dataType if what == "left_ts" else right.schema[right_ts].dataType),
        ).otherwise(c)

    # Secondary sort key: at equal ts, the side that must be *visible* to the
    # other sorts first (ROWS frame ending at CURRENT ROW looks backward).
    #   backward + exact:  right(0) before left(1) — left sees same-ts right
    #   backward + !exact: left(0) before right(1)
    #   forward mirrors via a negated/descending ts ordering below.
    right_rank = 0 if allow_exact_matches else 1
    left_rank = 1 - right_rank

    # The right payload travels as ONE nullable struct so the matched
    # timestamp and value columns can never desync (a per-column
    # last(ignorenulls) would skip past a legitimately-null right value to an
    # older row; last of the struct is atomic).
    r_payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    r_payload_type = (
        right.select(r_payload.alias("__r")).schema["__r"].dataType
    )

    l_side = left.select(
        *[F.col(k) for k in keys],
        _nn(F.col(left_ts), "left_ts").alias("__ts"),
        F.lit(left_rank).alias("__side"),
        F.lit(True).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_payload_type).alias("__r"),
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        _nn(F.col(right_ts), "right_ts").alias("__ts"),
        F.lit(right_rank).alias("__side"),
        F.lit(False).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        r_payload.alias("__r"),
    )
    unioned = l_side.unionByName(r_side)

    if direction == "backward":
        order: list[Column] = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__match")
    )
    out = filled.filter(F.col("__is_left")).select(
        *keys,
        F.col("__ts").alias(left_ts),
        *left_payload,
        F.col("__match.__ts").alias(matched_ts),
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col(matched_ts).isNotNull())
    return out
