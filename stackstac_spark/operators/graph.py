"""Iterative graph algorithms over edge-list DataFrames.

Connected components lives in ``operators/dedup.py`` (it is the dedup
clustering step); this module holds the general-purpose iterative ops.
PageRank here is the third iterative-algorithm pattern in the engine
(alongside k-means in ``similarity.py`` and pointer-doubling components):
a driver-side loop of joins/aggregates with one ``localCheckpoint`` per
iteration to truncate the growing plan — the Pregel-without-Pregel shape
Spark executes well when iteration counts are small and fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "label_propagation",
    "triangle_count",
    "connected_components_star",
    "kcore",
    "adamic_adar",
    "clustering_coefficient",
    "neighbor_jaccard",
    "hits_scores",
    "bipartite_projection",
    "modularity",
    "cooccurrence_recs",
    "personalized_pagerank",
    "degree_assortativity",
    "association_rules",
    "sequential_patterns",
]


def _pagerank_driver(edges: DataFrame, iters: int, damping: float, round_to: int) -> DataFrame:
    """Driver-side iteration over a collected symmetric edge list — the
    small-graph physical strategy. Dedupes locally (a Python set), so the
    caller may hand it the RAW pre-distinct union: LSH pair lists emit the
    same pair once per colliding band, and degree counts must not inflate."""
    from pyspark.sql import types as T

    rows = edges.collect()
    adj: dict = {}
    deg: dict = {}
    for s, t in {(r["src"], r["dst"]) for r in rows}:
        adj.setdefault(t, []).append(s)
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted(deg)
    n = len(nodes)
    node_type = edges.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("rank", T.DoubleType())]
    )
    spark = edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], schema)
    base = (1.0 - damping) / n
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        rank = {
            v: base + damping * sum(rank[s] / deg[s] for s in adj.get(v, ()))
            for v in nodes
        }
    from stackstac_spark.session import local_df

    return local_df(spark, [(v, round(rank[v], round_to)) for v in nodes], schema)


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 5,
    damping: float = 0.85,
    round_to: int = 6,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each pair contributes both
    directions) — e.g. centrality over the near-duplicate candidate graph,
    where high-rank documents are cluster hubs (an alternative canonical-
    doc policy to min-id/best-score).

    Fixed ``iters`` synchronous iterations of
    ``r = (1 − d)/N + d · Σ_in r_src / deg_src`` over the node set defined
    by the edges (no dangling nodes in an undirected graph). Fixed-count,
    fixed-order arithmetic → an external SQL engine replays it exactly
    with an unrolled CTE chain.

    Scale shape: degrees are ONE aggregate; each iteration is one
    edge⋈ranks equi-join + one destination-keyed aggregate, both shuffling
    on the node id (co-partitioned round to round), with a
    ``localCheckpoint`` per iteration to stop logical-plan doubling —
    identical hygiene to ``connected_components``. Ranks sum to ~1 and are
    rounded to ``round_to`` on output only.
    """
    if iters <= 0:
        raise ValueError(f"iters must be positive, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e1 = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges_raw = e1.union(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # dual physical strategy (the connected_components/warp precedent):
    # below the threshold, collect the edge list and iterate on the driver
    # — identical arithmetic, one job instead of ~4 jobs per round; a
    # billion-edge graph never triggers it (driver_threshold=0 forces the
    # distributed loop; tests pin both paths and assert agreement).
    # Same raw-count routing as connected_components: the driver path
    # dedupes locally, so the common small-graph case skips the distinct
    # exchange entirely; a duplicate-heavy graph overshooting the raw
    # count gets the exact re-check after the distinct it needs anyway.
    if edges_raw.count() <= driver_threshold:
        return _pagerank_driver(edges_raw, iters, damping, round_to)
    edges = edges_raw.distinct().localCheckpoint()
    if edges.count() <= driver_threshold:
        return _pagerank_driver(edges, iters, damping, round_to)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    if n == 0:
        return deg.select(F.col("src").alias("node"), F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n
    ranks = deg.select("src", F.lit(1.0 / n).alias("r")).localCheckpoint()
    # pre-join degree once: contribution = r / deg
    for _ in range(iters):
        contrib = (
            edges.join(ranks, "src")
            .join(deg, "src")
            .select(F.col("dst").alias("src"), (F.col("r") / F.col("deg")).alias("c"))
        )
        ranks = (
            contrib.groupBy("src")
            .agg((F.lit(base) + F.lit(damping) * F.sum("c")).alias("r"))
            .localCheckpoint()
        )
    return ranks.select(
        F.col("src").alias("node"), F.round("r", round_to).alias("rank")
    )


def _label_prop_driver(edges: DataFrame, iters: int) -> DataFrame:
    """Driver-side synchronous label propagation over a collected symmetric
    edge list (dedupes locally, like _pagerank_driver)."""
    from pyspark.sql import types as T

    rows = {(r["src"], r["dst"]) for r in edges.collect()}
    adj: dict = {}
    for s, t in rows:
        adj.setdefault(t, []).append(s)
    nodes = sorted(adj)
    labels = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            counts: dict = {}
            for s in adj[v]:
                lb = labels[s]
                counts[lb] = counts.get(lb, 0) + 1
            # most frequent neighbor label, ties -> smallest label
            new[v] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = new
    node_type = edges.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("community", node_type)]
    )
    from stackstac_spark.session import local_df

    return local_df(edges.sparkSession, [(v, labels[v]) for v in nodes], schema)


def label_propagation(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 4,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    UNDIRECTED edge list → (node, community).

    Each node starts labeled with its own id; per iteration every node
    adopts the most frequent label among its neighbors (ties → smallest
    label). Fixed ``iters`` synchronous rounds with a deterministic
    tie-break make the result exactly replayable by an external SQL engine
    (unrolled count/row_number CTE chain) — unlike the asynchronous,
    randomized formulation. Communities can be finer than connected
    components (dense clusters keep their own majority label where CC
    would merge anything touching), giving the dedup pipeline a middle
    ground between CC and per-pair verdicts — though a small-id label can
    still flood across a bridge when the min-label tie-break keeps
    winning, so structure matters.

    Scale shape: per iteration one edge⋈labels equi-join + one
    (node, label) count + one per-node argmax — all shuffles keyed on the
    node id (co-partitioned round to round), ``localCheckpoint`` per
    round. Same dual physical strategy as :func:`pagerank`: small graphs
    collect and iterate on the driver (identical arithmetic, one job);
    ``driver_threshold=0`` forces the distributed loop.
    """
    if iters <= 0:
        raise ValueError(f"iters must be positive, got {iters}")
    e1 = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges_raw = e1.union(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    if edges_raw.count() <= driver_threshold:
        return _label_prop_driver(edges_raw, iters)
    edges = edges_raw.distinct().localCheckpoint()
    if edges.count() <= driver_threshold:
        return _label_prop_driver(edges, iters)
    labels = edges.select("dst").distinct().select(
        F.col("dst").alias("node"), F.col("dst").alias("label")
    ).localCheckpoint()
    for _ in range(iters):
        counts = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (cnt desc, label asc) == min of struct(-cnt, label)
        labels = (
            counts.groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("lb"))
                ).getField("lb").alias("label")
            )
            .select(F.col("dst").alias("node"), "label")
            .localCheckpoint()
        )
    return labels.select("node", F.col("label").alias("community"))


_INT_TYPES = ("bigint", "int", "smallint", "tinyint")
def triangle_count(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """Per-node triangle counting over an UNDIRECTED edge list → (node,
    n_tri) for every node in ≥1 triangle.

    Degree-ordered orientation (Cohen 2009; the MapReduce/Spark-standard
    "node-iterator++"): orient each edge from the lower-(degree, id)
    endpoint to the higher, which bounds every node's out-degree by
    O(√E) on any graph — the step count becomes Σ out_deg² ≤ E·√E instead
    of Σ deg² (which a hub-heavy graph would make quadratic). Each
    triangle u<v<w (orientation order) is then found EXACTLY ONCE, so no
    /3 correction and no distinct.

    Dual physical strategy on the oriented graph:

    - ``E ≤ broadcast_threshold`` (edge-iterator): build each node's
      out-neighbor list once, broadcast the adjacency table, and for every
      oriented edge (u, v) emit ``array_intersect(N+(u), N+(v))`` — the
      closing w's. No wedge row is ever materialized and the probe is a
      map-side broadcast join: measured ~40% faster than the wedge join on
      a dense 1.2M-edge basket graph (avg degree 120 ⇒ 41M wedges avoided).
    - larger graphs (wedge join): oriented self-join on the wedge apex +
      shuffle equi-join against the edge list to close — everything
      node-keyed, AQE-replannable, nothing driver-sized or broadcast.

    Both paths share the same orientation and arithmetic; tests pin their
    agreement (``broadcast_threshold=0`` forces the distributed path).
    """
    und = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        # consumed by the degree agg (twice, via the union), the
        # orientation join, and the strategy-routing count: materialize
        # once or the edge-build (often a self-join + distinct upstream)
        # re-executes per consumer. Lazy: the strategy-routing count below
        # is the materializing action (one job, not checkpoint + count).
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    lo_first = F.struct(F.col("da").alias("d"), F.col("a").alias("n")) < F.struct(
        F.col("db").alias("d"), F.col("b").alias("n")
    )
    oriented = withdeg.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(
            lo_first, F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
        )
        .otherwise(F.struct(F.col("da").alias("d"), F.col("a").alias("n")))
        .alias("dst"),
    ).localCheckpoint(eager=False)  # reused by the adjacency/wedge build AND
    # the probe; materialized by whichever runs first (the broadcast build
    # precedes the probe stage, so evaluation is effectively sequential)
    if und.count() <= broadcast_threshold:
        # edge-iterator: out-neighbor lists in orientation order, broadcast
        # (optimization r13 note: a NumPy mapInArrow intersection kernel was
        # built and A/B-measured against this path at the bench shape —
        # JVM 6.3-7.8s vs kernel 11.8-15s warm, clean probes; the binary-
        # search membership probe is cache-miss-bound where the JVM hash
        # intersect streams. Kept the JVM expression; see OPTIMIZATION_r13.md)
        adj = oriented.groupBy("src").agg(
            F.expr("transform(sort_array(collect_list(dst)), s -> s.n)").alias(
                "nbrs"
            )
        )
        eu = oriented.select("src", F.col("dst.n").alias("v"))
        j = (
            eu.join(
                F.broadcast(adj.withColumnRenamed("src", "u_")),
                F.col("src") == F.col("u_"),
            )
            .drop("u_")
            .withColumnRenamed("nbrs", "nu")
            .join(
                F.broadcast(adj.withColumnRenamed("src", "v_")),
                F.col("v") == F.col("v_"),
            )
            .drop("v_")
            .withColumnRenamed("nbrs", "nv")
        )
        # per-edge contribution algebra instead of exploding every triangle
        # corner (optimization r12, second pass): edge (u, v) closes
        # c = |N+(u) ∩ N+(v)| triangles, contributing c to u, c to v and 1
        # to each closing w — so the aggregate input shrinks from 3T corner
        # rows to E edge rows + T w-rows (T = triangle count; on the dense
        # bench graph avg |ws| ≈ 8, a ~2.5x cut in rows through the hash
        # aggregate). Σ of the same addends — n_tri is bit-identical.
        ws = F.array_intersect("nu", "nv")
        contrib = (
            j.select(F.col("src").alias("u"), F.col("v").alias("v"), ws.alias("ws"))
            .select(
                F.explode(
                    F.concat(
                        F.array(
                            F.struct(
                                F.col("u").alias("node"),
                                F.size("ws").cast("long").alias("c"),
                            ),
                            F.struct(
                                F.col("v").alias("node"),
                                F.size("ws").cast("long").alias("c"),
                            ),
                        ),
                        F.transform(
                            "ws",
                            lambda w: F.struct(
                                w.alias("node"), F.lit(1).cast("long").alias("c")
                            ),
                        ),
                    )
                ).alias("e")
            )
            .select(F.col("e.node").alias("node"), F.col("e.c").alias("c"))
            .filter(F.col("c") > 0)
        )
        return contrib.groupBy("node").agg(F.sum("c").cast("long").alias("n_tri"))
    else:
        # the wedge join consumes `oriented` from three concurrent branches;
        # materialize it first so the orientation joins run exactly once
        # (the count doubles as the checkpoint's materializing action)
        oriented.count()
        o1 = oriented.select(F.col("src"), F.col("dst").alias("v"))
        o2 = oriented.select(F.col("src"), F.col("dst").alias("w"))
        wedges = o1.join(o2, "src").filter(F.col("v") < F.col("w"))
        closer = oriented.select(
            F.col("src").alias("v_id"), F.col("dst.n").alias("w_id")
        )
        tris = wedges.join(
            closer,
            (F.col("v.n") == F.col("v_id")) & (F.col("w.n") == F.col("w_id")),
        ).select(
            F.col("src").alias("u"), F.col("v.n").alias("v"), F.col("w.n").alias("w")
        )
    corners = tris.select(
        F.explode(F.array("u", "v", "w")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def _cc_driver(edges: DataFrame) -> DataFrame:
    """Driver-side min-label union-find over a collected (a, b) edge list —
    the small-graph physical strategy (the ``_pagerank_driver`` /
    ``_label_prop_driver`` precedent). Output is bit-identical to the star
    rounds' fixed point: every node labeled with its component's MINIMUM id
    (union-by-min keeps every tree root equal to its set's minimum, and the
    star forest's root IS that minimum). Dedupes locally, so the caller may
    hand it the raw pre-distinct pair list (LSH candidate lists emit a pair
    once per colliding band)."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edges.collect():
        a, b = r[0], r[1]
        if a == b:
            continue
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # larger root hangs under the smaller: root = min
    node_type = edges.schema[0].dataType
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("component", node_type)]
    )
    from stackstac_spark.session import local_df

    return local_df(
        edges.sparkSession, [(v, find(v)) for v in sorted(parent)], schema
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
    → (node, component) with component = the component's minimum node id.

    The web-scale alternative to min-label pointer doubling
    (``operators/dedup.py::connected_components``): instead of propagating
    labels over a FIXED edge list, each round REWRITES the edge list toward
    a star forest, so the working set shrinks as components collapse —
    on a 100 TB dup graph the per-round shuffle volume decays instead of
    staying |E|-sized, which is why this is the published algorithm of
    choice for MapReduce/Spark components at billions of edges
    (O(log² n) rounds worst-case, ~5 in practice).

    Edges are kept directed from the LARGER endpoint to the smaller
    (``hi > lo`` invariant; both rewrites preserve it and strictly reduce
    the potential Σ depth, which is the paper's termination argument):

    - **large-star**: per center c over the symmetric neighborhood, every
      neighbor n > c re-attaches to m = min(Γ(c) ∪ {c}). Computed as one
      per-center ``min`` agg + one equi-join back onto the symmetric edge
      view — no ``collect_set`` neighborhood lists, so a hub node never
      materializes a giant row.
    - **small-star**: per center c over its SMALLER neighbors (the
      directed edge list grouped by ``hi``), every neighbor and c itself
      attach to m = min(Γ≤(c) ∪ {c}). Same agg+join shape.

    Convergence = the edge set IS a star forest, which needs BOTH checks:
    (a) no node appears both as a parent (``lo``) and as a child (``hi``)
    — one semi-join count per round — AND (b) every child has exactly ONE
    parent — one ``groupBy(hi)`` count. (a) alone is insufficient: a node
    can end a round attached to two distinct pure roots (e.g. pairs
    (10,3),(10,1),(11,3),(11,2) leave 3 → {1,2} with 1 and 2 both
    root-only), which would stop early, split the component, and emit
    duplicate node rows; requiring unique parents is exactly the
    functional-forest condition the paper's fixed point implies. Both
    counts run on the just-checkpointed, already-shrunken set, and the
    pair is still strictly cheaper than the edge-set-equality check
    (two ``exceptAll``s), which also burns one extra confirming round.
    Each round ends in one ``localCheckpoint`` to truncate the
    self-referential plan; on a real cluster swap for reliable
    ``checkpoint()``. Raises after ``max_iter`` rather than returning
    unconverged labels.

    Output matches ``connected_components``: every node that appears in
    ``pairs`` (self-loops dropped) gets a row; component roots label
    themselves.
    """
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # dual physical strategy (the pagerank/label_prop precedent, extended to
    # CC in optimization r12): below the threshold, collect the edge list
    # and union-find on the driver — identical min-label output, ONE job
    # instead of ~1 aggregate job per star round (each of which AQE splits
    # into several sub-jobs; the cc_star/grid_dbscan/modularity gates
    # measured 51-107 jobs, mostly scheduling overhead at this size). A
    # billion-edge graph never routes here; driver_threshold=0 forces the
    # distributed loop (tests pin both paths and assert agreement). Raw
    # count first — the driver path dedupes locally, so the common
    # small-graph case skips the distinct exchange entirely.
    if driver_threshold:
        e = e.localCheckpoint(eager=False)
        if e.count() <= driver_threshold:
            return _cc_driver(e)
    edges = (
        e.select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
        .distinct()
        # lazy: round 1's convergence aggregate materializes it inside the
        # same job as the first rewrite (the distinct's exchange is shared
        # by both sym branches either way)
        .localCheckpoint(eager=False)
    )
    if driver_threshold and edges.count() <= driver_threshold:
        return _cc_driver(edges.select(F.col("hi").alias("a"), F.col("lo").alias("b")))

    def _large_star(ed: DataFrame) -> DataFrame:
        sym = ed.select(F.col("hi").alias("c"), F.col("lo").alias("n")).union(
            ed.select(F.col("lo").alias("c"), F.col("hi").alias("n"))
        )
        mins = sym.groupBy("c").agg(
            F.least(F.min("n"), F.first("c")).alias("m")
        )
        # NO distinct here: the small-star that always follows is
        # duplicate-insensitive (its min-aggregate collapses dup rows and
        # its own output is distinct'd), so deduping the intermediate
        # would pay an extra full-size exchange per round for nothing
        return (
            sym.join(mins, "c")
            .filter(F.col("n") > F.col("c"))
            .select(F.col("n").alias("hi"), F.col("m").alias("lo"))
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # directed edges already point hi -> lo, so Γ≤(c) is just the lo's
        # grouped by hi; m = min(lo) < hi always.
        mins = ed.groupBy("hi").agg(F.min("lo").alias("m"))
        re_lo = (
            ed.join(mins, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        )
        re_hi = mins.select(F.col("hi"), F.col("m").alias("lo"))
        return re_lo.union(re_hi).distinct()

    converged = False
    for _ in range(max_iter):
        # ONE job per round (optimization r12, second pass): the rewritten
        # edge set is localCheckpoint-ed lazily and the convergence
        # aggregate below is the action that materializes it — rewrite +
        # star-forest test run inside a single DAG (was: an eager
        # checkpoint job, then a separate count job re-reading the fresh
        # blocks). The union's two branches reference the SAME persisted
        # RDD, so its shuffle stages are shared and only the final narrow
        # map can (benignly, deterministically) compute a partition twice
        # before the cache fills.
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        # star-forest test, one aggregate job (optimization r12; was two
        # jobs/round, one of them a semi-join): classify every node's role
        # counts in a single pass over the endpoint stream — a node that is
        # a child more than once violates unique-parent, a node that is
        # both a child and a parent violates depth-1. Exactly equivalent to
        # the old (depth2 == 0 AND multi_parent == 0) pair:
        # depth2 > 0  ⟺ some node has n_child ≥ 1 and n_parent ≥ 1;
        # multi_parent > 0 ⟺ some node has n_child > 1.
        violations = (
            edges.select(
                F.col("hi").alias("id"),
                F.lit(1).alias("__child"),
                F.lit(0).alias("__parent"),
            )
            .unionAll(
                edges.select(
                    F.col("lo").alias("id"),
                    F.lit(0).alias("__child"),
                    F.lit(1).alias("__parent"),
                )
            )
            .groupBy("id")
            .agg(
                F.sum("__child").alias("nc"),
                F.sum("__parent").alias("np"),
            )
            .filter(
                (F.col("nc") > 1) | ((F.col("nc") >= 1) & (F.col("np") >= 1))
            )
            .count()
        )
        if violations == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    roots = (
        edges.select(F.col("lo").alias("node"))
        .distinct()
        .join(edges.select(F.col("hi").alias("node")).distinct(), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return edges.select(
        F.col("hi").alias("node"), F.col("lo").alias("component")
    ).union(roots)


def clustering_coefficient(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_to: int = 6,
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """Local clustering coefficient per node over an undirected edge list →
    (node, deg, n_tri, cc) for every node with degree ≥ 2, where
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) (Watts & Strogatz 1998).

    Pure composition: one degree aggregate + :func:`triangle_count` (which
    carries the degree-ordered orientation and its dual broadcast/shuffle
    strategy — the Σ out-deg² bound is what keeps the wedge volume sane on
    hub-heavy graphs at scale), joined back with a left join so
    triangle-free nodes score 0.0 rather than dropping out.
    """
    und = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()  # consumed by the degree agg AND triangle_count
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_count(und, "a", "b", broadcast_threshold=broadcast_threshold)
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
            F.round(
                2.0
                * F.coalesce(F.col("n_tri"), F.lit(0))
                / (F.col("deg").cast("double") * (F.col("deg") - F.lit(1))),
                round_to,
            ).alias("cc"),
        )
    )


_WEDGE_COLLECT_THRESHOLD = 200_000
_WEDGE_PAIR_CAP = 20_000_000


def _wedge_kernel_route(
    und: DataFrame,
    max_degree: int | None,
    mode: str,
    round_to: int,
    id_a: str,
    id_b: str,
    threshold: int = _WEDGE_COLLECT_THRESHOLD,
) -> DataFrame | None:
    """Bounded-graph NumPy route shared by :func:`adamic_adar` and
    :func:`neighbor_jaccard` (optimization r13, guide §4.2 — the
    ``_dense_sims`` precedent): collect the canonical edge list once (one
    ``limit(threshold+1)`` job — the same action is the routing decision
    AND the data), build the symmetric adjacency CSR + degree table +
    sorted edge keys on the driver, and score every wedge pair in a
    ``mapInArrow`` kernel over ``spark.range(n_centers)``. Each task
    pre-aggregates its pairs with one ``np.unique`` + ``bincount`` and
    drops ADJACENT pairs against the broadcast edge keys, so the plan
    collapses from [sym union → deg agg → two-sided wedge self-join →
    groupBy → 2 degree-decoration joins → left-anti join] to
    [Range → MapInArrow → one groupBy]. Common-neighbor counts and
    degrees are integers (bit-identical scores for ``jaccard``); the AA
    weight sum is a float reduction whose operand order the JVM partial
    aggregate never pinned either — both paths agree through
    ``round(round_to)``, pinned by the dual-path test and the oracle.

    Returns None (callers keep the distributed wedge join) when ids are
    not integers / nulls appear, the edge list exceeds ``threshold``, no
    center survives the degree guards, or Σ d·(d−1)/2 over surviving
    centers exceeds the pair cap (hub-heavy graph: the shuffled join's
    spill robustness wins at that volume).
    """
    node_dt = und.schema[0].dataType
    if node_dt.simpleString() not in _INT_TYPES:
        return None
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    try:
        from pyspark.sql.pandas.types import to_arrow_type

        node_at = to_arrow_type(node_dt)
    except Exception:
        return None
    pdf = und.limit(threshold + 1).toPandas()
    if len(pdf) == 0 or len(pdf) > threshold:
        return None
    a = pdf.iloc[:, 0].to_numpy()
    b = pdf.iloc[:, 1].to_numpy()
    if not (np.issubdtype(a.dtype, np.integer) and np.issubdtype(b.dtype, np.integer)):
        return None
    both = np.concatenate([a, b])
    # NOT unique(return_inverse=True): that path is pathologically slow on
    # this NumPy (measured 9.3 s on 2.4M int64 vs 0.5 s for the
    # unique + searchsorted pair, which is exactly equivalent)
    nodes = np.unique(both)
    inv = np.searchsorted(nodes, both)
    ai = inv[: len(a)].astype(np.int64)
    bi = inv[len(a) :].astype(np.int64)
    n = int(len(nodes))
    ctr = np.concatenate([ai, bi])
    nbr = np.concatenate([bi, ai])
    deg = np.bincount(ctr, minlength=n).astype(np.int64)
    cmask = deg >= 2
    if max_degree is not None:
        cmask &= deg <= int(max_degree)
    centers = np.flatnonzero(cmask)
    if len(centers) == 0:
        return None  # distributed path emits the empty frame + exact schema
    cd = deg[centers].astype(np.float64)
    if float((cd * (cd - 1)).sum() / 2.0) > _WEDGE_PAIR_CAP:
        return None
    order = np.argsort(ctr, kind="stable")
    nbrs = nbr[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    # und is canonical (a < b in id space); node factorization is order-
    # preserving, so the keys below are canonical in index space too
    ekeys = np.sort(ai * n + bi)
    spark = und.sparkSession
    bc = spark.sparkContext.broadcast((indptr, nbrs, deg, ekeys, nodes, centers))

    is_aa = mode == "aa"
    fields = [T.StructField("u", node_dt), T.StructField("v", node_dt)]
    if is_aa:
        fields.append(T.StructField("w", T.DoubleType()))
    else:
        fields += [
            T.StructField("c", T.LongType()),
            T.StructField("du", T.LongType()),
            T.StructField("dv", T.LongType()),
        ]
    out_schema = T.StructType(fields)

    def kernel(batches):
        indptr, nbrs, deg, ekeys, nodes, centers = bc.value
        n = len(nodes)
        ne = len(ekeys)
        triu_cache: dict = {}
        key_chunks: list = []
        w_chunks: list = []
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            for ci in centers[ids]:
                s, e = indptr[ci], indptr[ci + 1]
                m = int(e - s)
                if m < 2:
                    continue
                idx = np.sort(nbrs[s:e])
                rc = triu_cache.get(m)
                if rc is None:
                    rc = np.triu_indices(m, k=1)
                    triu_cache[m] = rc
                keys = idx[rc[0]] * n + idx[rc[1]]
                key_chunks.append(keys)
                if is_aa:
                    w_chunks.append(np.full(len(keys), 1.0 / np.log(float(deg[ci]))))
        if not key_chunks:
            return
        keys = np.concatenate(key_chunks)
        uk = np.unique(keys)  # see the return_inverse note above
        kinv = np.searchsorted(uk, keys)
        if is_aa:
            agg = np.bincount(kinv, weights=np.concatenate(w_chunks))
        else:
            agg = np.bincount(kinv).astype(np.int64)
        # drop pairs that are existing edges (the left-anti join, in-kernel)
        loc = np.minimum(np.searchsorted(ekeys, uk), ne - 1)
        keep = ekeys[loc] != uk
        uk, agg = uk[keep], agg[keep]
        if len(uk) == 0:
            return
        pu = (uk // n).astype(np.int64)
        pv = (uk % n).astype(np.int64)
        cols = [
            pa.array(nodes[pu], type=node_at),
            pa.array(nodes[pv], type=node_at),
        ]
        if is_aa:
            cols.append(pa.array(agg, type=pa.float64()))
        else:
            cols += [
                pa.array(agg, type=pa.int64()),
                pa.array(deg[pu], type=pa.int64()),
                pa.array(deg[pv], type=pa.int64()),
            ]
        yield pa.RecordBatch.from_arrays(cols, names=[f.name for f in fields])

    par = spark.sparkContext.defaultParallelism
    base = spark.range(len(centers), numPartitions=min(par, len(centers)))
    part = base.mapInArrow(kernel, out_schema)
    if is_aa:
        return (
            part.groupBy("u", "v")
            .agg(F.round(F.sum("w"), round_to).alias("aa"))
            .select(F.col("u").alias(id_a), F.col("v").alias(id_b), "aa")
        )
    return (
        part.groupBy("u", "v")
        .agg(
            F.sum("c").alias("n_common"),
            F.max("du").alias("du"),
            F.max("dv").alias("dv"),
        )
        .select(
            F.col("u").alias(id_a),
            F.col("v").alias(id_b),
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("du") + F.col("dv") - F.col("n_common")).cast("double"),
                round_to,
            ).alias("jaccard"),
        )
    )


def neighbor_jaccard(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_degree: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Neighborhood-Jaccard link prediction over an undirected edge list →
    NON-adjacent node pairs scored J(u,v) = |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)|
    (the unweighted sibling of :func:`adamic_adar`; Liben-Nowell &
    Kleinberg 2003). On a near-dup candidate graph this ranks pairs two
    hops apart by how much of their dup-neighborhood they share.

    Plan mirrors ``adamic_adar``: symmetric edges + one degree aggregate;
    common-neighbor counts from a center-keyed wedge self equi-join
    (u < v); the union size is inclusion-exclusion deg(u)+deg(v)−common,
    so no second set op is needed; existing edges removed with one
    left-anti join. ``max_degree`` drops hub centers BEFORE the wedge
    join — the same Σ deg² guard as ``triangle_count``, which is what
    bounds the wedge shuffle at 100 TB.
    """
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # lazy checkpoint: the kernel route's limit-collect is the materializing
    # action when it fires; the distributed fallback materializes explicitly
    # below before its racing consumers (optimization r13)
    und = (
        e.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    route = _wedge_kernel_route(und, max_degree, "jaccard", round_to, id_a, id_b)
    if route is not None:
        return route
    und.count()
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # deg feeds the hub filter and BOTH per-endpoint decoration joins;
    # centers feeds both wedge sides. EAGER materialization (optimization
    # r12, second pass): both tables' first consumers are concurrent
    # branches of ONE job (the wedge self-join sides / the two decoration
    # joins) — a lazy checkpoint there lets the branches race and compute
    # the aggregate twice before the cache fills (measured: +45% on
    # neighbor_jaccard in the full-bench context). deg rides centers'
    # materialization when the hub filter consumes it; otherwise it is
    # materialized itself.
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=max_degree is None
    )
    centers = sym.select(F.col("b").alias("w"), F.col("a").alias("n"))
    if max_degree is not None:
        cdeg = centers.join(deg.select(F.col("a").alias("w"), "deg"), "w")
        centers = cdeg.filter(F.col("deg") <= max_degree).select("w", "n")
        centers = centers.localCheckpoint()
    common = (
        centers.select("w", F.col("n").alias("u"))
        .join(centers.select("w", F.col("n").alias("v")), "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    withdeg = (
        common.join(deg.select(F.col("a").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("a").alias("v"), F.col("deg").alias("dv")), "v")
    )
    return (
        withdeg.join(
            und.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"],
            "left_anti",
        )
        .select(
            F.col("u").alias(id_a),
            F.col("v").alias(id_b),
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("du") + F.col("dv") - F.col("n_common")).cast("double"),
                round_to,
            ).alias("jaccard"),
        )
    )


def _kcore_driver(e: DataFrame, k: int) -> DataFrame:
    """Driver-side cascade peel over a collected edge list — the small-graph
    physical strategy (the ``_cc_driver`` precedent). Bit-identical to the
    distributed rounds' fixed point: the k-core is the UNIQUE maximal
    subgraph with min degree ≥ k (peel order never changes it), and
    ``core_deg`` is each survivor's degree inside it. Dedupes and
    symmetrizes locally, so the caller hands it the raw pre-distinct pair
    list."""
    from collections import deque

    from pyspark.sql import types as T

    adj: dict = {}
    for r in e.collect():
        a, b = r[0], r[1]
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    doomed = deque(v for v, ns in adj.items() if len(ns) < k)
    dead = set(doomed)
    while doomed:
        v = doomed.popleft()
        for n in adj[v]:
            if n in dead:
                continue
            adj[n].discard(v)
            if len(adj[n]) < k:
                dead.add(n)
                doomed.append(n)
    node_type = e.schema[0].dataType
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("core_deg", T.LongType())]
    )
    from stackstac_spark.session import local_df

    return local_df(
        e.sparkSession,
        [(v, len(adj[v])) for v in sorted(adj) if v not in dead],
        schema,
    )


def kcore(
    pairs: DataFrame,
    k: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 60,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """k-core decomposition: iteratively peel nodes of degree < k until the
    remainder is the k-core → (node, core_deg) for every surviving node
    (Seidman 1983; the standard "dense enough to matter" subgraph filter —
    e.g. keep only dup-graph regions with real cluster structure, or prune
    the long tail of a co-occurrence graph before community detection).

    Each round: one degree aggregate over the CURRENT symmetric edge set +
    two semi-joins keeping edges whose BOTH endpoints survive, then a
    ``localCheckpoint`` (the loop is self-referential; lineage must be
    cut). The peel CASCADES — removing a chain's endpoint exposes its
    neighbor — so rounds are data-dependent and bounded by the graph's
    degeneracy ordering depth, not by one pass; the removed-count check
    (one job on the just-aggregated degrees) stops the loop at the fixed
    point. Per-round shuffle volume shrinks with the surviving edge set —
    the same decay property as :func:`connected_components_star`.

    Raises after ``max_iter`` rounds rather than returning a non-core.

    Dual physical strategy (the ``connected_components_star`` precedent,
    optimization r12 second pass): below ``driver_threshold`` raw edges the
    list is collected and cascade-peeled on the driver — ONE job instead of
    ~3 jobs per peel round (the kcore gate measured 31 jobs / 3697 tasks of
    mostly scheduling overhead at bench scale). The k-core is unique, so
    both paths emit identical rows; ``driver_threshold=0`` forces the
    distributed loop (tests pin both paths and assert agreement).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    if driver_threshold:
        e = e.localCheckpoint(eager=False)
        if e.count() <= driver_threshold:
            return _kcore_driver(e, k)
    sym = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        # lazy: round 1's cnts.first() materializes it through the degree
        # aggregate (single consumer at that point); the survivor semi-joins
        # read the cache afterwards
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        # the degree table is materialized once per round (optimization
        # r12): the survivor filter, BOTH convergence counts (now one
        # aggregate job instead of two), and the converged-round return
        # all read it — previously the degree aggregate re-ran for
        # n_all, and keep carried its own checkpoint job. 4 jobs/round
        # → 3, and the degree agg runs once instead of up to three times.
        deg = sym.groupBy("src").agg(
            F.count(F.lit(1)).alias("deg")
        ).localCheckpoint(eager=False)
        cnts = deg.agg(
            F.count(F.lit(1)).alias("n_all"),
            F.sum((F.col("deg") >= k).cast("int")).alias("n_keep"),
        ).first()
        n_all = cnts["n_all"]
        n_keep = cnts["n_keep"] or 0
        if n_keep == n_all:
            return deg.select(
                F.col("src").alias("node"), F.col("deg").alias("core_deg")
            )
        if n_keep == 0:
            return sym.sparkSession.createDataFrame(
                [], "node {}, core_deg long".format(sym.schema["src"].dataType.simpleString())
            )
        keep = deg.filter(F.col("deg") >= k).select("src")
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            # lazy: the next round's cnts.first() (or the caller's action on
            # the converged round) materializes the peeled set — one job per
            # round instead of checkpoint-job + convergence-job
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(f"kcore did not converge in {max_iter} rounds")


def adamic_adar(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_degree: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Adamic-Adar link prediction over an undirected edge list →
    NON-adjacent node pairs scored AA(u,v) = Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg w)
    (Adamic & Adar 2003) — "which near-duplicate pairs did the candidate
    generator probably MISS?" when run on a dup graph, the classic
    common-neighbor heuristic weighted against promiscuous hubs.

    Plan: symmetric edges + one degree aggregate; wedges from a
    center-keyed self equi-join (u < v); existing edges removed with one
    left-anti join; per-pair sum. Every common neighbor has degree ≥ 2 by
    construction, so 1/ln(deg) is always finite. ``max_degree`` drops
    hub centers BEFORE the wedge join (the Σ deg² guard — same policy as
    ``triangle_count``); at 100 TB that cap is what bounds the wedge
    shuffle, and dropped hubs remove only low-information 1/ln(huge)
    terms.
    """
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # lazy checkpoint: the kernel route's limit-collect is the materializing
    # action when it fires; the distributed fallback materializes explicitly
    # below before its racing consumers (optimization r13)
    und = (
        e.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    route = _wedge_kernel_route(und, max_degree, "aa", round_to, id_a, id_b)
    if route is not None:
        return route
    und.count()
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    centers = sym.select(F.col("b").alias("w"), F.col("a").alias("n")).join(
        deg.select(F.col("a").alias("w"), "deg"), "w"
    )
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)
    # both wedge sides consume `centers`; EAGER materialization so the
    # degree aggregate + decoration join run exactly once — the wedge
    # self-join's two branches are concurrent stages of one job, so a lazy
    # checkpoint lets them race and compute the decoration twice before
    # the cache fills (optimization r12, second pass)
    centers = centers.localCheckpoint()
    wedges = (
        centers.select("w", F.col("n").alias("u"), "deg")
        .join(
            centers.select(F.col("w").alias("w"), F.col("n").alias("v")),
            "w",
        )
        .filter(F.col("u") < F.col("v"))
    )
    scored = wedges.groupBy("u", "v").agg(
        F.round(F.sum(1.0 / F.log(F.col("deg").cast("double"))), round_to).alias("aa")
    )
    return (
        scored.join(
            und.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"],
            "left_anti",
        )
        .select(F.col("u").alias(id_a), F.col("v").alias(id_b), "aa")
    )


def _hits_driver(edges: DataFrame, iters: int, round_to: int) -> DataFrame:
    """Driver-side HITS for small graphs (the pagerank dual-strategy
    precedent): identical arithmetic to the distributed loop, one job."""
    from pyspark.sql import types as T

    from stackstac_spark.session import local_df

    rows = {(r["src"], r["dst"]) for r in edges.collect()}
    outs: dict = {}
    ins: dict = {}
    nodes = set()
    for s, t in rows:
        outs.setdefault(s, []).append(t)
        ins.setdefault(t, []).append(s)
        nodes.update((s, t))
    nodes = sorted(nodes)
    node_type = edges.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField("hub", T.DoubleType()),
            T.StructField("authority", T.DoubleType()),
        ]
    )
    spark = edges.sparkSession
    if not nodes:
        return spark.createDataFrame([], schema)
    h = {v: 1.0 for v in nodes}
    a = {v: 1.0 for v in nodes}
    for _ in range(iters):
        a = {v: sum(h[u] for u in ins.get(v, ())) for v in nodes}
        sa = sum(a.values()) or 1.0
        a = {v: x / sa for v, x in a.items()}
        h = {v: sum(a[t] for t in outs.get(v, ())) for v in nodes}
        sh = sum(h.values()) or 1.0
        h = {v: x / sh for v, x in h.items()}
    return local_df(
        spark,
        [(v, round(h[v], round_to), round(a[v], round_to)) for v in nodes],
        schema,
    )


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    round_to: int = 6,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """HITS hub/authority scores over a DIRECTED edge list (Kleinberg
    1999) → (node, hub, authority): ``iters`` synchronous rounds of
    a ← Lᵀh, h ← La with L1 (sum) normalization after each half-step —
    the sum norm keeps every operation a plain aggregate an external SQL
    engine replays exactly (the classic L2 norm differs only by a
    per-round positive scalar, so rankings are identical).

    Same dual physical strategy as :func:`pagerank`: small edge lists
    iterate on the driver (one job); at scale each half-round is one
    edge⋈score equi-join + one node-keyed aggregate, co-shuffled on the
    node id, with a per-round ``localCheckpoint`` to stop plan doubling.
    Nodes appearing only as sources (or only as destinations) keep score
    0 on the missing side — Kleinberg's base set keeps them, so we do.
    """
    if iters <= 0:
        raise ValueError(f"iters must be positive, got {iters}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    e = e.distinct().localCheckpoint()
    if e.count() <= driver_threshold:
        return _hits_driver(e, iters, round_to)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    h = nodes.select("node", F.lit(1.0).alias("h"))
    for _ in range(iters):
        a_raw = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        a_tot = a_raw.agg(F.sum("a")).collect()[0][0] or 1.0
        a = nodes.join(
            a_raw.withColumnRenamed("dst", "node"), "node", "left"
        ).select("node", (F.coalesce(F.col("a"), F.lit(0.0)) / F.lit(a_tot)).alias("a"))
        h_raw = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
        )
        h_tot = h_raw.agg(F.sum("h")).collect()[0][0] or 1.0
        h = nodes.join(
            h_raw.withColumnRenamed("src", "node"), "node", "left"
        ).select("node", (F.coalesce(F.col("h"), F.lit(0.0)) / F.lit(h_tot)).alias("h"))
        h = h.localCheckpoint()
        a = a.localCheckpoint()
    return (
        h.join(a, "node")
        .select(
            "node", F.round("h", round_to).alias("hub"), F.round("a", round_to).alias("authority")
        )
    )


def bipartite_projection(
    df: DataFrame,
    left_col: str,
    right_col: str,
    max_right_degree: int = 10_000,
    min_weight: int = 1,
) -> DataFrame:
    """One-mode projection of a bipartite relation → left-node pairs
    (l_a < l_b) weighted by the number of DISTINCT right nodes they share
    — the co-occurrence graph builder (docs sharing domains, users
    sharing sessions, cohorts sharing active days) that feeds the
    community/components family.

    Plan: distinct (left, right) incidence, right-node degree aggregate,
    hub rights with degree > ``max_right_degree`` dropped BEFORE the
    self-join (the Σ deg² wedge-explosion guard — a right node shared by
    a million lefts creates 5·10¹¹ pairs and says nothing about affinity;
    the cap is the standard projection policy and part of the operator's
    CONTRACT, replayed by the oracle), then one right-keyed self
    equi-join + pair count. ``min_weight`` prunes the long tail at the
    aggregate.
    """
    pruned = _pruned_incidence(df, left_col, right_col, max_right_degree)
    pairs = (
        pruned.select("r", F.col("l").alias("l_a"))
        .join(pruned.select("r", F.col("l").alias("l_b")), "r")
        .filter(F.col("l_a") < F.col("l_b"))
    )
    return (
        pairs.groupBy("l_a", "l_b")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def _pruned_incidence(
    df: DataFrame, left_col: str, right_col: str, max_right_degree: int
) -> DataFrame:
    """Distinct (l, r) incidence with hub right-nodes dropped, materialized
    once (optimization r12): the incidence feeds the degree aggregate AND
    both sides of the projection self-join AND (in cooccurrence_recs) the
    item-frequency aggregate — without the checkpoints each consumer
    re-executes the corpus scan + the distinct's exchange (~8 evaluations
    in cooccurrence_recs, 48 Exchange nodes in its physical plan). Guide
    §1.2/§2.4: evaluate once, share the exchange."""
    inc = (
        df.select(F.col(left_col).alias("l"), F.col(right_col).alias("r"))
        .distinct()
        # lazy: materialized inside the pruned table's eager job below (the
        # degree aggregate runs before the semi-join probes it, so the two
        # in-job consumers are effectively sequential)
        .localCheckpoint(eager=False)
    )
    keep = (
        inc.groupBy("r")
        .agg(F.count(F.lit(1)).alias("rdeg"))
        .filter(F.col("rdeg") <= max_right_degree)
        .select("r")
    )
    # EAGER: the pruned incidence's first consumers are both sides of the
    # projection self-join — concurrent stages of one job, which race and
    # re-evaluate a lazy checkpoint (optimization r12, second pass:
    # interleaved A/B at sf0.1 read eager 3.8 s vs lazy 4.1 s vs
    # unmaterialized 5.7 s for copurchase_recs)
    return inc.join(keep, "r", "left_semi").localCheckpoint()


def modularity(
    pairs: DataFrame,
    communities: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "node",
    community_col: str = "community",
    round_to: int = 6,
) -> DataFrame:
    """Newman modularity of a given node partition over an undirected
    edge list (Newman & Girvan 2004):

        Q = Σ_c [ e_c/m − (d_c/(2m))² ]

    where m = |edges|, e_c = edges with both endpoints in community c,
    d_c = Σ degree over c's nodes. Returns one row per community
    (community, n_nodes, e_in, d_tot, q_c) — total Q is ``sum(q_c)``;
    per-community terms are the useful diagnostic (which clusters are
    denser than chance).

    Plan: dedup edges once, one degree aggregate, two broadcast-or-
    shuffle joins of edges against the (node → community) map, one
    grouped aggregate. Nothing iterative: this SCORES a partition (from
    :func:`label_propagation`, :func:`connected_components_star`, or any
    external assignment); it does not search for one.

    The community map must cover every node that appears in ``pairs``:
    unlabeled nodes drop out of the inner joins, silently shrinking
    d_tot/e_in for their communities — pass a complete assignment (CC
    and label propagation emit one by construction).
    """
    und = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        # reused: m count, degree agg, two label joins. Lazy: the m count
        # right below is the materializing action (fuses the old eager
        # checkpoint job with the count job)
        .localCheckpoint(eager=False)
    )
    m = und.count()
    if m == 0:
        raise ValueError("modularity needs at least one edge")
    lab = communities.select(
        F.col(node_col).alias("__n"), F.col(community_col).alias("__c")
    )
    deg = (
        und.select(F.col("a").alias("__n"))
        .unionAll(und.select(F.col("b").alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d_tot = (
        deg.join(lab, "__n")
        .groupBy("__c")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("d_tot"),
        )
    )
    e_in = (
        und.join(lab.withColumnRenamed("__n", "a").withColumnRenamed("__c", "ca"), "a")
        .join(lab.withColumnRenamed("__n", "b").withColumnRenamed("__c", "cb"), "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("__c"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    two_m = 2.0 * m
    return (
        d_tot.join(e_in, "__c", "left")
        .select(
            F.col("__c").alias(community_col),
            "n_nodes",
            F.coalesce(F.col("e_in"), F.lit(0)).alias("e_in"),
            "d_tot",
            F.round(
                F.coalesce(F.col("e_in"), F.lit(0)) / F.lit(float(m))
                - (F.col("d_tot") / two_m) * (F.col("d_tot") / two_m),
                round_to,
            ).alias("q_c"),
        )
    )


def cooccurrence_recs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    max_basket_size: int = 10_000,
    round_to: int = 6,
) -> DataFrame:
    """Item-to-item co-occurrence recommendations (the Amazon
    item-based CF shape, Linden 2003; the covisitation-matrix candidate
    generator of modern recsys): for every item, the top-``k`` other
    items by cosine-normalized basket co-occurrence

        score(a, b) = #baskets{a, b} / sqrt(#baskets{a} · #baskets{b})

    (ties → higher raw co-count, then smaller item id).

    Plan: the co-count graph IS :func:`bipartite_projection` of the
    (basket, item) incidence — basket-keyed self-join bounded by
    ``max_basket_size`` (the Σ deg² guard); item frequencies are counted
    over the SAME hub-pruned incidence the projection uses (a basket
    dropped by the guard contributes to neither numerator nor
    denominator, keeping the cosine a true cosine over the pruned
    incidence — counting dropped baskets in freq would deflate scores
    for items appearing in hub baskets); top-k per item is a rank window
    over the symmetrized pairs (co-occurrence is symmetric, so each
    undirected pair fans into both directions). Never an item×item
    matrix.
    """
    # one materialized hub-pruned incidence feeds the projection self-join
    # AND the item-frequency aggregate (optimization r12: this function
    # previously rebuilt inc/keep a second time next to the projection's
    # own, ~8 evaluations of the distinct incidence in the physical plan);
    # the projection result is materialized because `sym` fans it into
    # both directions (two consumers of the basket self-join, the
    # operator's dominant cost), and `freq` because the cosine joins it
    # twice. Identical arithmetic — the cosine still counts over the SAME
    # pruned incidence the projection uses.
    pruned = _pruned_incidence(df, item_col, basket_col, max_basket_size)
    raw_pairs = (
        pruned.select("r", F.col("l").alias("l_a"))
        .join(pruned.select("r", F.col("l").alias("l_b")), "r")
        .filter(F.col("l_a") < F.col("l_b"))
    )
    # EAGER (optimization r12, second pass): `pairs` first feeds the two
    # concurrent branches of the sym union and `freq` the two cosine joins
    # — lazy checkpoints race there (same A/B as _pruned_incidence)
    pairs = (
        raw_pairs.groupBy("l_a", "l_b")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .localCheckpoint()
    )
    freq = (
        pruned.groupBy("l")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.col("l").alias("item"), "freq")
        .localCheckpoint()
    )
    sym = pairs.select(
        F.col("l_a").alias("item"), F.col("l_b").alias("rec"), "weight"
    ).unionByName(
        pairs.select(
            F.col("l_b").alias("item"), F.col("l_a").alias("rec"), "weight"
        )
    )
    scored = (
        sym.join(freq.withColumnRenamed("item", "item").withColumnRenamed("freq", "f_i"), "item")
        .join(
            freq.select(F.col("item").alias("rec"), F.col("freq").alias("f_r")),
            "rec",
        )
        .withColumn(
            "score",
            F.round(
                F.col("weight") / F.sqrt(F.col("f_i").cast("double") * F.col("f_r")),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("score"), F.desc("weight"), F.asc("rec")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("item").alias(item_col),
            F.col("rec").alias(f"rec_{item_col}"),
            "weight",
            "score",
            "rank",
        )
    )


def personalized_pagerank(
    pairs: DataFrame,
    seeds: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed_col: str = "node",
    iters: int = 5,
    damping: float = 0.85,
    round_to: int = 6,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Personalized PageRank over an undirected edge list (Haveliwala
    2002; the random walk restarts at the SEED set instead of uniformly):

        r = (1 − d)·e_S + d · Σ_in r_src / deg_src,   e_S = 1/|S| on seeds

    — "how close is every node to THIS set", the topic-conditioned
    relevance / seed-expansion primitive (find docs related to a curated
    seed list, users related to a cohort). Fixed synchronous iterations,
    fixed-order arithmetic: an external engine replays it exactly with an
    unrolled CTE chain.

    Same dual physical strategy and per-round hygiene as
    :func:`pagerank`: driver loop below ``driver_threshold`` edges,
    otherwise one edge⋈ranks join + one node-keyed aggregate per round
    with a ``localCheckpoint`` each — the restart vector rides a seed
    flag joined ONCE onto the node table, never per-iteration. Seeds
    outside the graph are ignored; an empty effective seed set raises.
    """
    if iters <= 0:
        raise ValueError(f"iters must be positive, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e1 = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges_raw = e1.union(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    seed_set = seeds.select(F.col(seed_col).alias("src")).distinct()
    if edges_raw.count() <= driver_threshold:
        return _ppr_driver(edges_raw, seed_set, iters, damping, round_to)
    edges = edges_raw.distinct().localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.join(seed_set, "src", "left_semi").select("src").withColumn(
        "__seed", F.lit(True)
    )
    node_tbl = deg.join(nodes, "src", "left").select(
        "src", "deg", F.coalesce(F.col("__seed"), F.lit(False)).alias("__seed")
    ).localCheckpoint()
    n_seed = node_tbl.filter("__seed").count()
    if n_seed == 0:
        raise ValueError("no seed intersects the graph's node set")
    base = (1.0 - damping) / n_seed
    node_tbl = node_tbl.withColumn(
        "__base", F.when(F.col("__seed"), F.lit(base)).otherwise(F.lit(0.0))
    )
    ranks = node_tbl.select(
        "src",
        F.when(F.col("__seed"), F.lit(1.0 / n_seed)).otherwise(F.lit(0.0)).alias("r"),
    ).localCheckpoint()
    for _ in range(iters):
        contrib = (
            edges.join(ranks, "src")
            .join(node_tbl.select("src", "deg"), "src")
            .select(F.col("dst").alias("src"), (F.col("r") / F.col("deg")).alias("c"))
        )
        ranks = (
            contrib.groupBy("src")
            .agg(F.sum("c").alias("__c"))
            .join(node_tbl.select("src", "__base"), "src", "right")
            .select(
                "src",
                (
                    F.col("__base")
                    + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        F.col("src").alias("node"), F.round("r", round_to).alias("rank")
    )


def _ppr_driver(
    edges: DataFrame, seed_set: DataFrame, iters: int, damping: float, round_to: int
) -> DataFrame:
    """Driver-side personalized-PageRank loop (small-graph strategy, same
    contract as ``_pagerank_driver``: dedupes the raw symmetric list
    locally)."""
    from pyspark.sql import types as T

    rows = edges.collect()
    adj: dict = {}
    deg: dict = {}
    for s, t in {(r["src"], r["dst"]) for r in rows}:
        adj.setdefault(t, []).append(s)
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted(deg)
    seeds = {r["src"] for r in seed_set.collect()} & set(nodes)
    if not seeds:
        raise ValueError("no seed intersects the graph's node set")
    node_type = edges.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("rank", T.DoubleType())]
    )
    spark = edges.sparkSession
    base = (1.0 - damping) / len(seeds)
    rank = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    for _ in range(iters):
        rank = {
            v: (base if v in seeds else 0.0)
            + damping * sum(rank[s] / deg[s] for s in adj.get(v, ()))
            for v in nodes
        }
    from stackstac_spark.session import local_df

    return local_df(spark, [(v, round(rank[v], round_to)) for v in nodes], schema)


def degree_assortativity(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_to: int = 6,
) -> DataFrame:
    """Degree assortativity coefficient of an undirected graph (Newman
    2002) → one row (n_edges, assortativity): the Pearson correlation of
    the degrees at the two ends of each edge, computed over BOTH
    orientations of every edge (the symmetric convention networkx's
    ``degree_assortativity_coefficient`` uses) — positive means hubs link
    to hubs (social-network shape), negative means hubs link to leaves
    (the star/template shape a near-dup candidate graph takes when one
    boilerplate page pairs with everything; a drift of this sign is a
    crawl-health signal).

    Plan: canonicalize + dedupe the edge list, one degree aggregate, two
    node-keyed equi-joins to decorate each edge end with its degree, one
    scalar moment aggregate — no pair enumeration beyond the edges that
    already exist, so there is no hub blowup to guard. NULL when all
    degrees are equal (zero variance, e.g. a perfect matching or cycle).
    """
    und = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()  # consumed by the degree agg AND the edge join
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
    )
    # both orientations: Pearson over the symmetrized endpoint-degree pairs
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    dd = (
        sym.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "dx"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "dy"), "b")
    )
    agg = dd.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    num = F.col("m2") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("m2") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("m2") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        (F.col("m2") / 2).cast("long").alias("n_edges"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(num / F.sqrt(varx * vary), round_to),
        ).alias("assortativity"),
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_item_baskets: int | None = 5_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise association rules over a (basket, item) incidence table
    (Agrawal & Srikant 1994's support/confidence plus Brin 1997's lift) →
    one row per ordered rule a→b with co-support ≥ ``min_support``:
    (antecedent, consequent, n_both, n_ant, n_cons, support, confidence,
    lift) — support = n_both/n_baskets, confidence = n_both/n_ant,
    lift = confidence / (n_cons/n_baskets). The classic "users who do X
    also do Y" mining, and in a data pipeline the co-occurrence screen for
    correlated quality flags / template co-appearance.

    Plan: dedupe to distinct (basket, item), self-equi-join on the basket
    with item_a < item_b (never a cross product), count pairs, broadcast
    the item-support dimension back, emit both rule orientations from the
    one canonical pair table. ``max_item_baskets`` is the hub guard: one
    item present in B baskets contributes O(B·items-per-basket) join rows,
    so an item above the cap fails fast (the max_bucket policy) rather
    than silently fanning out — drop stopword-like items upstream or raise
    the cap deliberately. Null baskets/items are excluded.

    NOTE (eager guard): when ``max_item_baskets`` is set, the hub check
    runs a small Spark job at DataFrame-construction time (fail at build,
    not mid-pipeline). The deduped incidence table is localCheckpoint-ed
    first, so the guard, the support dimension, and the pair join all
    reuse one materialization — no double scan of the input.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    inc = (
        df.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        )
        .filter(F.col("b").isNotNull() & F.col("i").isNotNull())
        .distinct()
        .localCheckpoint()  # consumed by supports, the guard, AND the pair join
    )
    supp = inc.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    if max_item_baskets is not None:
        hot = supp.filter(F.col("n_i") > max_item_baskets).limit(1).collect()
        if hot:
            raise ValueError(
                f"association_rules: item {hot[0]['i']!r} appears in "
                f"{hot[0]['n_i']} baskets (> max_item_baskets="
                f"{max_item_baskets}); the basket self-join would fan out. "
                "Filter ubiquitous items first or raise the cap."
            )
    n_baskets = inc.select("b").distinct().count()
    a = inc.select("b", F.col("i").alias("ia"))
    b = inc.select("b", F.col("i").alias("ib"))
    pairs = (
        a.join(b, "b")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_support)
    )
    both = pairs.unionByName(
        pairs.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "n_both"
        )
    )
    dim = F.broadcast(supp)
    out = (
        both.join(dim.withColumnRenamed("i", "ia").withColumnRenamed("n_i", "n_ant"), "ia")
        .join(dim.withColumnRenamed("i", "ib").withColumnRenamed("n_i", "n_cons"), "ib")
    )
    conf = F.col("n_both") / F.col("n_ant")
    return out.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        F.col("n_both").cast("long").alias("n_both"),
        F.col("n_ant").cast("long").alias("n_ant"),
        F.col("n_cons").cast("long").alias("n_cons"),
        F.round(F.col("n_both") / F.lit(float(n_baskets)), round_to).alias("support"),
        F.round(conf, round_to).alias("confidence"),
        F.round(conf * n_baskets / F.col("n_cons"), round_to).alias("lift"),
    )


def sequential_patterns(
    df: DataFrame,
    seq_col: str,
    order_cols: list[str],
    item_col: str,
    lengths: tuple[int, ...] = (2, 3),
    min_support: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Frequent contiguous sequential patterns (the depth-limited,
    contiguous core of PrefixSpan, Pei et al. 2001) → one row per
    surviving pattern: (length, pattern, support, support_frac) where
    support counts DISTINCT sequences containing the pattern at least
    once (the sequential-mining convention — repeats inside one sequence
    don't inflate support) and pattern is the '>'-joined item run.

    The behavioral-motif miner over event streams: which 2- and 3-step
    event runs recur across users/sessions? Complements
    [markov_transitions] (per-step conditional probabilities) with
    set-level support — a rare-but-deterministic 3-step run shows up here
    and is invisible in the pairwise transition matrix.

    Plan: one lead() window per sequence (shuffle keyed on seq_col — each
    sequence lands on one task, the standard sessionization shape; no
    global window), distinct-(seq, pattern) projection, one pattern-keyed
    count against the distinct-sequence total. Pattern cardinality is
    bounded by |item vocabulary|^max(lengths), so the result is
    dimension-table sized; nothing quadratic in sequences.
    """
    w = Window.partitionBy(seq_col).orderBy(*order_cols)
    base = df.filter(F.col(item_col).isNotNull()).select(
        F.col(seq_col).alias("__s"),
        *[F.col(c) for c in order_cols],
        F.col(item_col).cast("string").alias("__i0"),
    )
    # one lead-window pass, materialized EAGERLY (optimization r12): each
    # length's projection and the distinct-sequence total would otherwise
    # re-run the sequence-keyed window shuffle per consumer — and they are
    # concurrent union branches of one job, so a lazy checkpoint races
    with_leads = base.select(
        "__s",
        "__i0",
        *[
            F.lead("__i0", k).over(
                Window.partitionBy("__s").orderBy(*order_cols)
            ).alias(f"__i{k}")
            for k in range(1, max(lengths))
        ],
    ).localCheckpoint()
    parts = []
    for n in lengths:
        cols = [F.col(f"__i{k}") for k in range(n)]
        pat = F.concat_ws(">", *cols)
        parts.append(
            with_leads.filter(F.col(f"__i{n-1}").isNotNull()).select(
                "__s", F.lit(n).alias("length"), pat.alias("pattern")
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    # same row set as base (lead() drops nothing) — read the checkpoint
    # instead of re-scanning the corpus for the total
    n_seqs = with_leads.select("__s").distinct().count()
    sup = (
        allp.distinct()
        .groupBy("length", "pattern")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return sup.select(
        F.col("length").cast("int").alias("length"),
        "pattern",
        F.col("support").cast("long").alias("support"),
        F.round(F.col("support") / F.lit(float(n_seqs)), round_to).alias(
            "support_frac"
        ),
    ).orderBy("length", F.desc("support"), "pattern")


def transition_entropy(
    df: DataFrame,
    seq_col: str,
    order_cols: list[str],
    item_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Empirical conditional entropy of the first-order transition model
    over per-sequence item streams → one row (n_transitions, n_states,
    h_cond, h_marginal, predictability) in nats:

        H(next|prev) = −Σ_ij (c_ij/N)·ln(c_ij/c_i·)
        H(next)      = −Σ_j (c_·j/N)·ln(c_·j/N)
        predictability = 1 − H(next|prev)/H(next)

    — how much does knowing the previous event tell you about the next?
    The summary number over the [markov_transitions] matrix: near-0
    predictability means the chain adds nothing over the marginal (drop
    the model), near-1 means sessions are near-deterministic scripts
    (bot signature). NULL predictability when H(next) = 0.

    Plan: one per-sequence lag window (sessionization shuffle), one
    transition-count aggregate, marginals derived from it — everything
    after the window is |states|²-sized.
    """
    w = Window.partitionBy(seq_col).orderBy(*order_cols)
    steps = (
        df.filter(F.col(item_col).isNotNull())
        .select(
            F.col(seq_col).alias("__s"),
            F.col(item_col).cast("string").alias("__cur"),
            *[F.col(c) for c in order_cols],
        )
        .select(
            "__s",
            F.lag("__cur").over(
                Window.partitionBy("__s").orderBy(*order_cols)
            ).alias("__prev"),
            "__cur",
        )
        .filter(F.col("__prev").isNotNull())
    )
    cij = steps.groupBy("__prev", "__cur").agg(F.count(F.lit(1)).alias("__c"))
    ci = cij.groupBy("__prev").agg(F.sum("__c").alias("__ci"))
    tot = cij.agg(F.sum("__c").alias("__n"))
    joined = (
        cij.join(F.broadcast(ci), "__prev")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(tot.withColumn("__k", F.lit(1))), "__k")
    )
    c = F.col("__c").cast("double")
    n = F.col("__n").cast("double")
    agg = joined.agg(
        F.max("__n").alias("n_transitions"),
        F.count_distinct("__prev").alias("__np"),
        (-F.sum((c / n) * F.log(c / F.col("__ci")))).alias("__hc"),
    )
    marg = (
        cij.groupBy("__cur")
        .agg(F.sum("__c").alias("__cj"))
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(tot.withColumn("__k", F.lit(1))), "__k")
        .agg(
            (
                -F.sum(
                    (F.col("__cj") / F.col("__n"))
                    * F.log(F.col("__cj") / F.col("__n"))
                )
            ).alias("__hm"),
            F.count_distinct("__cur").alias("__ns"),
        )
    )
    out = (
        agg.withColumn("__k", F.lit(1))
        .join(F.broadcast(marg.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    return out.select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.greatest(F.col("__np"), F.col("__ns")).cast("long").alias("n_states"),
        F.round("__hc", round_to).alias("h_cond"),
        F.round("__hm", round_to).alias("h_marginal"),
        F.when(
            F.col("__hm") > 0,
            F.round(1.0 - F.col("__hc") / F.col("__hm"), round_to),
        ).alias("predictability"),
    )
