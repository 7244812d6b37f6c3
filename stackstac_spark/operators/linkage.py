"""Probabilistic record linkage (entity resolution) — Fellegi & Sunter 1969.

The missing relative of the dedup family: near-duplicate detection over
STRUCTURED records instead of text. Candidate pairs come from BLOCKING
(equi-join on coarse keys — the only thing standing between linkage and an
O(N²) cross join at 100 TB); each pair gets a log-likelihood match score
Σ_f w_f where the field weight is ln(m_f/u_f) on agreement and
ln((1−m_f)/(1−u_f)) on disagreement. m_f (P(agree | true match)) is a
supplied prior; u_f (P(agree | random pair)) is ESTIMATED FROM THE DATA as
the exact collision probability Σ_v n_v(n_v−1) / (N(N−1)) — an integer
computation an external engine replays bit-for-bit, which keeps the whole
scorer value-checkable.

Scale shape: u-estimation is one value-keyed count per field (map-side
combined); blocking is a self-equi-join on the block key (shuffle keyed on
the block — skewed blocks respond to AQE or a salted block key); scoring is
pure per-row arithmetic on the pair stream. Nothing is driver-sized except
the F field weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["field_u_probabilities", "linkage_score"]


def field_u_probabilities(df: DataFrame, fields: list[str]) -> dict[str, float]:
    """Exact random-pair agreement probability per field:
    u = Σ_v n_v(n_v−1) / (N(N−1)) over non-null values (unordered pairs
    cancel the factor 2). One grouped count per field; returns plain
    floats for embedding into the scorer (driver-sized: one double per
    field)."""
    n = df.count()
    if n < 2:
        raise ValueError(f"need >= 2 records to estimate u, got {n}")
    out = {}
    for f in fields:
        agg = (
            df.filter(F.col(f).isNotNull())
            .groupBy(f)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.expr("c * (c - 1)")).alias("s"))
            .collect()[0]["s"]
        )
        out[f] = float(agg or 0) / float(n * (n - 1))
    return out


def linkage_score(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    field_m: dict[str, float],
    round_to: int = 4,
) -> DataFrame:
    """Score blocked candidate pairs with Fellegi-Sunter log-likelihood
    weights. ``field_m`` maps field column → m prior (P(agree | match));
    u per field is estimated from ``df`` via
    :func:`field_u_probabilities`. Returns
    (id_a, id_b, agree_<field>..., score) for every within-block pair
    with id_a < id_b; callers threshold or top-k downstream.

    Fields where u ∈ {0, 1} are degenerate (always/never agreeing) and
    rejected — their weights would be ±inf.
    """
    import math

    fields = list(field_m)
    u = field_u_probabilities(df, fields)
    for f in fields:
        if not 0.0 < u[f] < 1.0:
            raise ValueError(
                f"field {f!r} has degenerate u={u[f]} (constant or all-"
                f"distinct column) — drop it or fix the field definition"
            )
        if not 0.0 < field_m[f] < 1.0:
            raise ValueError(f"m for field {f!r} must be in (0,1), got {field_m[f]}")
    a = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"ba_{c}") for c in block_cols],
        *[F.col(f).alias(f"fa_{f}") for f in fields],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"bb_{c}") for c in block_cols],
        *[F.col(f).alias(f"fb_{f}") for f in fields],
    )
    cond = [F.col(f"ba_{c}") == F.col(f"bb_{c}") for c in block_cols]
    pairs = a.join(b, cond).filter(F.col("id_a") < F.col("id_b"))
    score = F.lit(0.0)
    outs = []
    for f in fields:
        agree = F.col(f"fa_{f}").eqNullSafe(F.col(f"fb_{f}"))
        w_a = math.log(field_m[f] / u[f])
        w_d = math.log((1.0 - field_m[f]) / (1.0 - u[f]))
        score = score + F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d))
        outs.append(agree.alias(f"agree_{f}"))
    return pairs.select(
        "id_a", "id_b", *outs, F.round(score, round_to).alias("score")
    )
