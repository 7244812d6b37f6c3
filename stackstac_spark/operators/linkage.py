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

__all__ = [
    "field_u_probabilities",
    "linkage_score",
    "blocked_pairs",
    "edit_distance_pairs",
    "jaro_winkler",
    "jaro_winkler_pairs",
]


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


def blocked_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Within-block unordered candidate pairs (id_a < id_b): the standard
    blocking step shared by every fuzzy matcher below. An equi-join on the
    block key — the ONLY thing standing between string comparison and an
    O(N²) cross join; at scale the shuffle is keyed on the block columns,
    so skewed blocks respond to AQE skew-join splitting (or a salted
    sub-block key when one block dominates)."""
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    return a.join(b, block_cols).filter(F.col("id_a") < F.col("id_b"))


def edit_distance_pairs(
    df: DataFrame,
    string_col: str,
    block_cols: list[str],
    id_col: str,
    max_distance: int = 10,
    prefix_len: int | None = None,
) -> DataFrame:
    """Levenshtein fuzzy join: within-block pairs with edit distance ≤
    ``max_distance`` on ``string_col`` (optionally truncated to
    ``prefix_len`` chars to bound the O(len²) DP). Uses Catalyst's
    built-in ``levenshtein`` — JVM-side, whole-stage-codegen'd; no Python
    in the pair stream."""
    work = df
    if prefix_len is not None:
        work = df.withColumn(string_col, F.substring(F.col(string_col), 1, prefix_len))
    pairs = blocked_pairs(work, block_cols, id_col, [string_col])
    return pairs.withColumn(
        "distance", F.levenshtein(F.col(f"{string_col}_a"), F.col(f"{string_col}_b"))
    ).filter(F.col("distance") <= max_distance)


def _jaro(a: str, b: str) -> float:
    """Classic Jaro similarity (Jaro 1989): match window
    ⌊max(|a|,|b|)/2⌋−1, transpositions = half the out-of-order matches.
    Empty-string convention follows DuckDB's jaro_similarity: 0.0."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and b[j] == a[i]:
                a_match[i] = True
                b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity (Winkler 1990): the Jaro score boosted by
    l·p·(1−jaro) for a common prefix of l ≤ 4 chars, applied only when
    jaro > ``boost_threshold``. Semantics verified cell-for-cell against
    DuckDB's ``jaro_winkler_similarity`` (tests/test_round8_ops.py), which
    is what the oracle gate replays."""
    j = _jaro(a, b)
    if j > boost_threshold:
        l = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            l += 1
        j += l * p * (1.0 - j)
    return j


def jaro_winkler_pairs(
    df: DataFrame,
    string_col: str,
    block_cols: list[str],
    id_col: str,
    threshold: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """Jaro-Winkler fuzzy join: within-block pairs scoring ≥ ``threshold``.

    Spark has no built-in JW, so the score is an Arrow-batched pandas UDF
    over the ALREADY-BLOCKED pair stream — the expensive O(N²) avoidance
    happens relationally (blocking join) before any Python runs, and the
    UDF is pure per-row arithmetic with no state, so it scales linearly
    with surviving pairs."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jw_fn(sa, sb):
        return pd.Series(
            [jaro_winkler(x if x is not None else "", y if y is not None else "")
             for x, y in zip(sa, sb)]
        )

    # set annotations at runtime: this module uses `from __future__ import
    # annotations`, which would hand pandas_udf unresolvable STRING hints
    _jw_fn.__annotations__ = {"sa": pd.Series, "sb": pd.Series, "return": pd.Series}
    _jw_udf = pandas_udf(_jw_fn, "double")

    pairs = blocked_pairs(df, block_cols, id_col, [string_col])
    return pairs.withColumn(
        "jw", F.round(_jw_udf(F.col(f"{string_col}_a"), F.col(f"{string_col}_b")), round_to)
    ).filter(F.col("jw") >= threshold)
