"""Vector-geometry companions to the raster engine — geohash cell keys, a
grid-bucketed point-in-rectangle join, and grid-blocked DBSCAN clustering.

The first two are pure Catalyst expression plans. The geohash is the classic base32
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

__all__ = ["GEOHASH_ALPHABET", "geohash_encode", "grid_spatial_join", "grid_cluster", "morans_i", "getis_ord"]

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


def grid_cluster(
    points: DataFrame,
    eps: float,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    min_pts: int = 1,
    max_cell_count: int | None = 100_000,
) -> DataFrame:
    """Density clustering of 2-D points (DBSCAN, Ester et al. 1996) →
    (point_id, cluster, is_core) where ``cluster`` is the MIN *core*
    point id in the cluster (deterministic label — a border point with a
    smaller id than every core still carries the cores' label), border
    points attach to their smallest-labeled core neighbor, and noise
    points get cluster NULL.

    The scale architecture is the whole point — no pairwise distance
    matrix ever exists:

    1. every point keys to its ε-grid cell ``(⌊x/ε⌋, ⌊y/ε⌋)``; any pair
       within ε is in the same or an adjacent cell, so candidate pairs
       come from ONE equi-join of points against the 3×3 neighbor-cell
       expansion (9 rows/point, the standard grid-blocked spatial join),
       then the exact ``dx²+dy² ≤ ε²`` filter;
    2. core points are those with ≥ ``min_pts`` ε-neighbors (self
       included) — one aggregate over the pair stream;
    3. core–core edges feed :func:`~stackstac_spark.operators.graph.
       connected_components_star` (Kiveris 2014) — per-round shuffle
       volume shrinks toward the star forest, the 100 TB-correct CC;
    4. border points (non-core with a core neighbor) take the min
       component among their core neighbors — one join + min agg.

    ``max_cell_count`` fails fast if one ε-cell holds more points than
    the bound (the pair join would go quadratic in that cell) — the same
    guard policy as ``minhash_lsh_pairs``'s ``max_bucket``: at scale the
    right response to a pathological cell is to shrink ε, not to let one
    task own a billion-row self-join.
    """
    from .graph import connected_components_star

    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    p = points.select(
        F.col(point_id).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    ).withColumns(
        {
            "cx": F.floor(F.col("px") / eps).cast("long"),
            "cy": F.floor(F.col("py") / eps).cast("long"),
        }
        # consumed by the pair join (twice) and the label joins. Lazy when
        # the cell-count guard runs: its .first() right below is the
        # materializing action (fuses the old checkpoint job + guard job
        # into one — optimization r12, second pass); eager when the guard
        # is disabled, because the first consumers are then the pair
        # join's two concurrent sides.
    ).localCheckpoint(eager=max_cell_count is None)
    if max_cell_count is not None:
        worst = (
            p.groupBy("cx", "cy").count().agg(F.max("count").alias("m")).first()
        )
        if worst["m"] is not None and worst["m"] > max_cell_count:
            raise ValueError(
                f"an eps-cell holds {worst['m']} points (> {max_cell_count}); "
                f"shrink eps or raise max_cell_count"
            )
    # candidate pairs: left point joins the 3x3 neighborhood of cells;
    # emitting each unordered pair once (pid_a < pid_b) via the cell walk
    # would need orientation bookkeeping, so generate directed pairs and
    # keep a < b after the distance filter — same join volume either way
    probe = p.select(
        F.col("pid").alias("pid_b"),
        F.col("px").alias("qx"),
        F.col("py").alias("qy"),
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    ).select(
        "pid_b",
        "qx",
        "qy",
        F.explode(F.array(F.col("bx") - 1, F.col("bx"), F.col("bx") + 1)).alias("cx"),
        "by",
    ).select(
        "pid_b",
        "qx",
        "qy",
        "cx",
        F.explode(F.array(F.col("by") - 1, F.col("by"), F.col("by") + 1)).alias("cy"),
    )
    pairs = (
        p.join(probe, ["cx", "cy"])
        .filter(F.col("pid") != F.col("pid_b"))
        .filter(
            (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
            + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
            <= F.lit(float(eps) * float(eps))
        )
        .select(F.col("pid").alias("a"), F.col("pid_b").alias("b"))
        # consumed by the core agg, the CC, and border attach. Lazy: the
        # first consumer is the neighbor-count aggregate inside `core`'s
        # eager materialization (a single sequential chain), which fuses
        # the pair join into that job; the CC and border joins then read
        # the cache (optimization r12, second pass)
        .localCheckpoint(eager=False)
    )
    # directed pairs contain (u,v) AND (v,u): neighbor count is a plain agg
    nbrs = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("n_nbrs"))
    core = (
        p.join(nbrs, p["pid"] == nbrs["a"], "left")
        .select("pid", (F.coalesce(F.col("n_nbrs"), F.lit(0)) + 1 >= min_pts).alias("is_core"))
        .localCheckpoint()
    )
    core_ids = core.filter("is_core").select("pid")
    cc_edges = (
        pairs.join(core_ids.withColumnRenamed("pid", "a"), "a")
        .join(core_ids.withColumnRenamed("pid", "b"), "b")
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    )
    comp = connected_components_star(cc_edges).select(
        F.col("node").alias("pid"), F.col("component").alias("cluster")
    )
    # isolated core points (no core neighbor) form singleton clusters
    core_lbl = (
        core_ids.join(comp, "pid", "left")
        .select("pid", F.coalesce(F.col("cluster"), F.col("pid")).alias("cluster"))
    )
    border_lbl = (
        pairs.join(core.filter("is_core").select(F.col("pid").alias("a")), "a")
        .join(core.filter("NOT is_core").select(F.col("pid").alias("b")), "b")
        .join(core_lbl.withColumnRenamed("pid", "a"), "a")
        .groupBy("b")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("b").alias("pid"), "cluster")
    )
    labels = core_lbl.unionByName(border_lbl)
    return (
        p.select("pid")
        .join(labels, "pid", "left")
        .join(core.withColumnRenamed("pid", "pid_"), F.col("pid") == F.col("pid_"))
        .select(F.col("pid").alias(point_id), "cluster", "is_core")
    )


def morans_i(
    cells: DataFrame,
    y_col: str,
    x_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Global Moran's I spatial autocorrelation over a PRE-AGGREGATED
    cell table (Moran 1950, binary rook weights) → one row (n_cells,
    n_neighbor_pairs, morans_i, expected_i):

        I = (N / W) · Σ_{i~j} z_i z_j / Σ_i z_i²     (z = x − x̄)

    summed over DIRECTED rook-neighbor pairs (each undirected adjacency
    counts twice, the symmetric-weights convention; W = the directed
    pair count). E[I] = −1/(N − 1) under spatial randomness — I above
    it means hot spots cluster, below means checkerboard dispersion.
    The spatial autocorrelation read on any gridded statistic: per-cell
    event counts, zonal raster means, per-tile quality scores.

    Input contract: one row per (y, x) cell — aggregate the corpus to
    its grid FIRST (the [grid_cluster] / kaplan_meier pre-aggregation
    convention). Duplicate cells raise.

    Plan: neighbor discovery is one self-equi-join on the 4 shifted
    integer keys (explode of a 4-element literal array — never a
    distance cross join), plus two scalar aggregates. Linear in cells.
    NOTE (eager): the duplicate-cell check and the grand mean run small
    Spark jobs at construction time (the mean is folded in as a literal
    so the z-column stays a pure map expression).
    """
    base = cells.select(
        F.col(y_col).cast("long").alias("__y"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(
        F.col("__y").isNotNull() & F.col("__x").isNotNull()
        & F.col("__v").isNotNull() & ~F.isnan("__v")
    ).localCheckpoint()
    n_tot = base.count()
    n_dist = base.select("__y", "__x").distinct().count()
    if n_tot != n_dist:
        raise ValueError(
            f"morans_i: {n_tot - n_dist} duplicate (y, x) cells — "
            "aggregate to one value per cell first."
        )
    if n_tot < 2:
        raise ValueError(f"morans_i: need >= 2 cells, got {n_tot}")
    mean_row = base.agg(F.avg("__v").alias("m")).first()
    m = float(mean_row["m"])
    z = base.select("__y", "__x", (F.col("__v") - F.lit(m)).alias("__z"))
    # each cell emits its 4 rook-neighbor addresses; the equi-join keeps
    # the addresses that exist — boundary cells simply match fewer
    offs = F.array(
        F.struct(F.lit(1).alias("dy"), F.lit(0).alias("dx")),
        F.struct(F.lit(-1).alias("dy"), F.lit(0).alias("dx")),
        F.struct(F.lit(0).alias("dy"), F.lit(1).alias("dx")),
        F.struct(F.lit(0).alias("dy"), F.lit(-1).alias("dx")),
    )
    probes = z.select(
        "__z", F.explode(offs).alias("__o"), "__y", "__x"
    ).select(
        (F.col("__y") + F.col("__o.dy")).alias("__y"),
        (F.col("__x") + F.col("__o.dx")).alias("__x"),
        F.col("__z").alias("__zi"),
    )
    pairs = probes.join(
        z.select("__y", "__x", F.col("__z").alias("__zj")), ["__y", "__x"]
    )
    cross = pairs.agg(
        F.count(F.lit(1)).alias("__w"),
        F.sum(F.col("__zi") * F.col("__zj")).alias("__num"),
    )
    ss = z.agg(F.sum(F.col("__z") * F.col("__z")).alias("__ss"))
    j = (
        cross.withColumn("__k", F.lit(1))
        .join(F.broadcast(ss.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    i_val = F.when(
        (F.col("__w") > 0) & (F.col("__ss") > 0),
        F.lit(float(n_tot)) / F.col("__w") * F.col("__num") / F.col("__ss"),
    )
    return j.select(
        F.lit(n_tot).cast("long").alias("n_cells"),
        F.col("__w").cast("long").alias("n_neighbor_pairs"),
        F.round(i_val, round_to).alias("morans_i"),
        F.round(F.lit(-1.0 / (n_tot - 1)), round_to).alias("expected_i"),
    )


def getis_ord(
    cells: DataFrame,
    y_col: str,
    x_col: str,
    value_col: str,
    min_z: float = 2.575829,
    round_to: int = 6,
) -> DataFrame:
    """Getis-Ord Gi* hot/cold-spot detection over a pre-aggregated cell
    table (Getis & Ord 1992; Ord & Getis 1995) → one row per cell whose
    |z| ≥ ``min_z`` (default = the two-sided 0.01 normal quantile):
    (y, x, value, n_neighbors, gi_z) with the self-inclusive rook
    neighborhood (the cell + its 4 rook neighbors, binary weights):

        Gi* = [Σ_{j∈N(i)} x_j − x̄·W_i]
              / [S·√((n·W_i − W_i²)/(n − 1))],
        S   = √(Σx²/n − x̄²)

    — WHERE the clustering is, where [morans_i] says only WHETHER it
    exists globally: the hot tiles / hot user-regions / hot shards worth
    drilling into, each with a z-score attached. Same input contract as
    morans_i (one row per cell — pre-aggregate first; duplicates raise).

    Plan: the morans_i machinery with the neighborhood sum gathered by
    the same 5-offset explode + equi-join (boundary cells simply match
    fewer neighbors, W_i adjusts per cell), global moments folded in as
    literals from one eager aggregate. Linear in cells; the |z| filter
    keeps the output report-sized.
    """
    base = cells.select(
        F.col(y_col).cast("long").alias("__y"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(
        F.col("__y").isNotNull() & F.col("__x").isNotNull()
        & F.col("__v").isNotNull() & ~F.isnan("__v")
    ).localCheckpoint()
    n_tot = base.count()
    n_dist = base.select("__y", "__x").distinct().count()
    if n_tot != n_dist:
        raise ValueError(
            f"getis_ord: {n_tot - n_dist} duplicate (y, x) cells — "
            "aggregate to one value per cell first."
        )
    if n_tot < 3:
        raise ValueError(f"getis_ord: need >= 3 cells, got {n_tot}")
    mom = base.agg(
        F.avg("__v").alias("m"), F.avg(F.col("__v") * F.col("__v")).alias("m2")
    ).first()
    mean = float(mom["m"])
    s = (float(mom["m2"]) - mean * mean) ** 0.5
    offs = F.array(
        F.struct(F.lit(0).alias("dy"), F.lit(0).alias("dx")),
        F.struct(F.lit(1).alias("dy"), F.lit(0).alias("dx")),
        F.struct(F.lit(-1).alias("dy"), F.lit(0).alias("dx")),
        F.struct(F.lit(0).alias("dy"), F.lit(1).alias("dx")),
        F.struct(F.lit(0).alias("dy"), F.lit(-1).alias("dx")),
    )
    probes = base.select(
        F.col("__y").alias("__cy"), F.col("__x").alias("__cx"),
        F.explode(offs).alias("__o"),
    ).select(
        "__cy", "__cx",
        (F.col("__cy") + F.col("__o.dy")).alias("__y"),
        (F.col("__cx") + F.col("__o.dx")).alias("__x"),
    )
    hood = probes.join(base, ["__y", "__x"]).groupBy("__cy", "__cx").agg(
        F.count(F.lit(1)).alias("__w"),
        F.sum("__v").alias("__sumn"),
    )
    w = F.col("__w").cast("double")
    num = F.col("__sumn") - F.lit(mean) * w
    den = F.lit(s) * F.sqrt(
        (F.lit(float(n_tot)) * w - w * w) / F.lit(float(n_tot - 1))
    )
    z = F.try_divide(num, den)
    out = (
        hood.join(
            base.select(
                F.col("__y").alias("__cy"), F.col("__x").alias("__cx"), "__v"
            ),
            ["__cy", "__cx"],
        )
        .select(
            F.col("__cy").alias("y"),
            F.col("__cx").alias("x"),
            F.col("__v").alias("value"),
            (F.col("__w") - 1).cast("long").alias("n_neighbors"),
            F.round(z, round_to).alias("gi_z"),
        )
        .filter(F.abs(F.col("gi_z")) >= min_z)
        .orderBy(F.desc("gi_z"), "y", "x")
    )
    return out
