"""Vector-geometry companions to the raster engine — geohash cell keys and
a grid-bucketed point-in-rectangle join.

Both are pure Catalyst expression plans. The geohash is the classic base32
interleave (even bits longitude, odd bits latitude, MSB first), computed by
CLOSED-FORM quantization rather than the textbook bisection loop — floor
((lon+180)/360 · 2^bits) yields exactly the bisection bits, so a SQL engine
replays the cell id bit-for-bit. The spatial join is the standard
grid-bucket decomposition: points key to their cell, rectangles explode to
the cells they overlap, one equi-join on the cell key + an exact
containment filter — never a geometry cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GEOHASH_ALPHABET", "geohash_encode", "grid_spatial_join"]

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat, lon, precision: int = 5):
    """Base32 geohash of (lat, lon) columns at ``precision`` chars, as a
    Catalyst expression — the spatial bucketing key (neighbor search,
    per-cell rollups, dedup blocking) with the property that a shared
    prefix bounds distance.

    5·precision bits total: even bit positions (MSB first) take longitude
    bits, odd take latitude — longitude gets ⌈total/2⌉ bits. Quantization
    ``clamp(floor((lon+180)/360 · 2^n), 0, 2^n−1)`` IS the n-step binary
    subdivision of the textbook algorithm (each halving emits one bit of
    the scaled fraction), property-tested against a bisection reference.
    One map-only projection: two floors, 5p shift/mask terms, p alphabet
    lookups — no UDF, no shuffle.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    qlon = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit((1 << lon_bits) - 1).cast("long"),
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))).cast("long"),
        ),
    )
    qlat = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit((1 << lat_bits) - 1).cast("long"),
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))).cast("long"),
        ),
    )

    def hash_bit(j: int):
        # bit j of the hash, MSB first: even j -> lon, odd j -> lat
        if j % 2 == 0:
            return F.shiftright(qlon, lon_bits - 1 - j // 2).bitwiseAND(F.lit(1).cast("long"))
        return F.shiftright(qlat, lat_bits - 1 - j // 2).bitwiseAND(F.lit(1).cast("long"))

    alpha = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    chars = []
    for k in range(precision):
        idx = F.lit(0).cast("long")
        for m in range(5):
            idx = idx + F.shiftleft(hash_bit(5 * k + m), 4 - m)
        chars.append(F.element_at(alpha, (idx + 1).cast("int")))
    return F.concat(*chars)


def grid_spatial_join(
    points: DataFrame,
    rects: DataFrame,
    cell_size: float,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    rect_id: str = "rect_id",
    max_cells_per_rect: int = 4096,
) -> DataFrame:
    """Point-in-rectangle join via grid bucketing → (rect_id, point_id)
    for every point INSIDE (edges inclusive) a rectangle — the spatial
    join primitive (tile membership, AOI filters, label-box assignment)
    without a geometry library and without a cross join.

    Points key to cell (⌊x/cell⌋, ⌊y/cell⌋); each rectangle explodes to
    every cell it overlaps (two ``sequence`` explodes); ONE equi-join on
    the cell key, then the exact containment predicate. Join volume =
    points-per-cell × rects-per-cell — ``cell_size`` is the knob, and a
    rectangle spanning more than ``max_cells_per_rect`` cells fails fast
    (one tiny driver-side agg) rather than silently exploding the build
    side. At 100 TB: the cell key is the shuffle key; skewed cells
    respond to AQE like any hot join key.
    """
    if cell_size <= 0:
        raise ValueError(f"cell_size must be positive, got {cell_size}")
    r = rects.select(
        F.col(rect_id).alias("rid"),
        F.col("xmin").cast("double").alias("xmin"),
        F.col("ymin").cast("double").alias("ymin"),
        F.col("xmax").cast("double").alias("xmax"),
        F.col("ymax").cast("double").alias("ymax"),
    )
    worst = r.agg(
        F.max(
            (F.floor(F.col("xmax") / cell_size) - F.floor(F.col("xmin") / cell_size) + 1)
            * (F.floor(F.col("ymax") / cell_size) - F.floor(F.col("ymin") / cell_size) + 1)
        ).alias("cells"),
        F.sum(F.when((F.col("xmin") > F.col("xmax")) | (F.col("ymin") > F.col("ymax")), 1).otherwise(0)).alias("bad"),
    ).first()
    if worst["bad"]:
        raise ValueError(f"{worst['bad']} rectangles have min > max")
    if worst["cells"] is not None and worst["cells"] > max_cells_per_rect:
        raise ValueError(
            f"a rectangle spans {worst['cells']} grid cells (> {max_cells_per_rect}); "
            f"raise cell_size or max_cells_per_rect"
        )
    rc = r.select(
        "rid",
        "xmin",
        "ymin",
        "xmax",
        "ymax",
        F.explode(
            F.sequence(
                F.floor(F.col("xmin") / cell_size).cast("long"),
                F.floor(F.col("xmax") / cell_size).cast("long"),
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("ymin") / cell_size).cast("long"),
                F.floor(F.col("ymax") / cell_size).cast("long"),
            )
        ).alias("cy"),
    )
    p = points.select(
        F.col(point_id).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    ).withColumns(
        {
            "cx": F.floor(F.col("px") / cell_size).cast("long"),
            "cy": F.floor(F.col("py") / cell_size).cast("long"),
        }
    )
    return (
        p.join(rc, ["cx", "cy"])
        .filter(
            (F.col("px") >= F.col("xmin"))
            & (F.col("px") <= F.col("xmax"))
            & (F.col("py") >= F.col("ymin"))
            & (F.col("py") <= F.col("ymax"))
        )
        .select(F.col("rid").alias(rect_id), F.col("pid").alias(point_id))
    )
