"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k as the exact baseline; sign-LSH (random-hyperplane)
bucketing and a centroid-based IVF variant as the scale paths.

Scale design:
- brute force broadcasts the (small) query set against the corpus — one
  scan, no shuffle of the corpus, per-row JVM-side fold (``aggregate`` /
  ``zip_with``, whole-stage-codegen'd, no Python);
- sign-LSH maps every vector to a b-bit bucket with deterministic
  hyperplanes (seeded md5 coefficients), then joins only within buckets;
- IVF: k centroids learned by a few midpoint iterations on a sample,
  vectors assigned to nearest centroid (broadcast), queries probe
  ``nprobe`` nearest lists — corpus shuffles once by centroid id.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(F.expr(f"aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"))


# Bounded-side rows above this are never collected: the dense-sims Arrow
# route stays strictly a physical strategy for the "one side is small"
# contract the JVM path already assumes (broadcast / bounded-slice).
_DENSE_COLLECT_THRESHOLD = 100_000


def _fold_norms(mat):
    """L2 norms with the JVM fold's exact operation order: one add per
    dimension, left to right (``aggregate(v, 0D, (a, x) -> a + x * x)``),
    so the result is bit-identical to ``_norm`` on the same doubles."""
    n = np.zeros(len(mat), dtype=np.float64)
    for k in range(mat.shape[1]):
        n += mat[:, k] * mat[:, k]
    return np.sqrt(n)


def _collect_bounded_matrix(side: DataFrame, pass_cols: list, vec_col: str, threshold: int):
    """``take(threshold + 1)`` the bounded side once (one job — the same
    action doubles as the routing decision and the data). Returns
    ``(pass_values, matrix)`` or None when the side is over the threshold,
    empty, or not a dense fixed-dimension double/float matrix (null vector,
    null element, ragged lengths) — callers then keep the JVM pair path,
    whose null semantics stay authoritative for such inputs."""
    rows = side.select(*pass_cols, vec_col).take(threshold + 1)
    if not rows or len(rows) > threshold:
        return None
    nv = len(pass_cols)
    vecs = [r[nv] for r in rows]
    d = len(vecs[0]) if vecs[0] is not None else 0
    if d == 0:
        return None
    for v in vecs:
        if v is None or len(v) != d or any(x is None for x in v):
            return None
    mat = np.array(vecs, dtype=np.float64)
    if mat.shape != (len(rows), d):
        return None
    vals = [[r[i] for r in rows] for i in range(nv)]
    return vals, mat


def _dense_sims(
    big: DataFrame,
    big_cols: list,
    big_vec: str,
    small: DataFrame,
    small_cols: list,
    small_vec: str,
    sim_name: str = "sim",
    threshold: int = _DENSE_COLLECT_THRESHOLD,
) -> DataFrame | None:
    """Raw cosine sims of every (big, small) pair with the small side
    collected+broadcast and the per-pair arithmetic done in NumPy inside one
    ``mapInArrow`` pass over the big side → columns ``[*big_cols,
    *small_cols, sim_name]`` (sim UNROUNDED), or None when the small side
    isn't routable (over ``threshold``, empty, or not dense fixed-d).

    This is a physical rewrite of ``big.crossJoin(broadcast(small))`` +
    the ``aggregate``/``zip_with`` fold (guide §4.2: HOF lambdas are
    interpreted per element — measured ~12x slower than handing whole Arrow
    batches to NumPy at the bench shapes). Bit-identical by construction:
    the kernel folds dimension-by-dimension in the same left-to-right order
    (IEEE doubles on both sides, no FMA fusion in either), norms use the
    same fold, and the division is ``dot / (norm_big * norm_small)`` exactly
    as the JVM expression — pinned by tests/test_r12_opt_equiv.py against
    the JVM path row-for-row. Big-side rows that are not dense fixed-d
    (null vector, null element, ragged) emit NULL sims, matching the JVM
    fold's null propagation.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    got = _collect_bounded_matrix(small, small_cols, small_vec, threshold)
    if got is None:
        return None
    small_vals, smat = got
    snorm = _fold_norms(smat)
    m, d = smat.shape

    big_proj = big.select(*big_cols, F.col(big_vec).alias("__vec"))
    big_schema = big_proj.schema
    small_schema = small.select(*small_cols).schema
    try:
        from pyspark.sql.pandas.types import to_arrow_type

        small_arrays = [
            pa.array(small_vals[i], type=to_arrow_type(small_schema[i].dataType))
            for i in range(len(small_cols))
        ]
    except Exception:
        return None

    out_schema = T.StructType(
        [big_schema[i] for i in range(len(big_cols))]
        + list(small_schema)
        + [T.StructField(sim_name, T.DoubleType(), True)]
    )

    sc = big.sparkSession.sparkContext
    bc = sc.broadcast((smat, snorm))
    n_big = len(big_cols)
    # bound the per-chunk sim block (chunk_rows x m doubles) to ~32 MB
    max_cells = 4_000_000

    def kernel(batches):
        import pyarrow.compute as pc

        smat, snorm = bc.value
        m, d = smat.shape
        tnorm = snorm[None, :]
        for batch in batches:
            nb = batch.num_rows
            if nb == 0:
                continue
            vec = batch.column(n_big)
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            offs = vec.offsets.to_numpy()
            lengths = np.diff(offs)
            elem = vec.values
            # dense fast path: fixed-d, no nulls anywhere
            dense = (
                vec.null_count == 0
                and elem.null_count == 0
                and bool(np.all(lengths == d))
            )
            if dense:
                flat = elem.to_numpy(zero_copy_only=False).astype(
                    np.float64, copy=False
                )
                sv = flat[offs[0] : offs[-1]].reshape(nb, d)
                null_rows = None
            else:
                # JVM null semantics: any non-dense row gets sim NULL
                sv = np.zeros((nb, d), dtype=np.float64)
                null_rows = np.zeros(nb, dtype=bool)
                py = vec.to_pylist()
                for i, v in enumerate(py):
                    if v is None or len(v) != d or any(x is None for x in v):
                        null_rows[i] = True
                    else:
                        sv[i] = v
            chunk = max(1, max_cells // max(m, 1))
            for c0 in range(0, nb, chunk):
                sb = sv[c0 : c0 + chunk]
                cb = len(sb)
                acc = np.zeros((cb, m), dtype=np.float64)
                bn = np.zeros(cb, dtype=np.float64)
                for k in range(d):  # the JVM fold's exact order
                    acc += sb[:, k : k + 1] * smat[None, :, k]
                    bn += sb[:, k] * sb[:, k]
                denom = np.sqrt(bn)[:, None] * tnorm
                live = (
                    np.ones(cb, dtype=bool)
                    if null_rows is None
                    else ~null_rows[c0 : c0 + cb]
                )
                if np.any((denom == 0.0) & live[:, None]):
                    # ANSI mode (Spark 4 default): the JVM division raises
                    # on a zero divisor — a zero-norm vector must fail the
                    # same way here, not silently become NaN
                    raise ArithmeticError(
                        "[DIVIDE_BY_ZERO] zero-norm vector in dense-sims "
                        "cosine (matches the JVM path's ANSI division error)"
                    )
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = acc / denom
                sim_arr = pa.array(sims.ravel())
                if null_rows is not None and null_rows[c0 : c0 + cb].any():
                    mask = pa.array(np.repeat(null_rows[c0 : c0 + cb], m))
                    sim_arr = pc.if_else(mask, pa.scalar(None, pa.float64()), sim_arr)
                rep = pa.array(np.repeat(np.arange(c0, c0 + cb, dtype=np.int64), m))
                til_idx = np.tile(np.arange(m, dtype=np.int64), cb)
                yield pa.RecordBatch.from_arrays(
                    [batch.column(i).take(rep) for i in range(n_big)]
                    + [arr.take(pa.array(til_idx)) for arr in small_arrays]
                    + [sim_arr],
                    names=[f.name for f in out_schema],
                )

    return big_proj.mapInArrow(kernel, out_schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dense_collect_threshold: int = _DENSE_COLLECT_THRESHOLD,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, sim, rank). Queries broadcast.

    Physical routing (optimization r12): when the query side is a bounded
    dense matrix it is collected once and the sims come from the NumPy
    ``mapInArrow`` kernel (:func:`_dense_sims` — bit-identical fold, ~12x
    less per-pair cost than the interpreted HOF lambdas); otherwise the
    original broadcast-join + JVM fold runs. ``dense_collect_threshold=0``
    forces the JVM path (tests pin the two paths' row-for-row agreement)."""
    # sim = dot / (qn * cn), qv/cv cast to double element-wise exactly as
    # _dot/_norm do — pre-casting the arrays is fold-order-equivalent
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("qv"),
    )
    cd = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("cv"),
    )
    routed = _dense_sims(
        cd, ["neighbor_id"], "cv", qd, ["query_id"], "qv",
        threshold=dense_collect_threshold,
    )
    if routed is not None:
        sims = routed.filter(F.col("neighbor_id") != F.col("query_id")).select(
            "query_id", "neighbor_id", "sim"
        )
    else:
        # norms once per ROW before the join — computing them inside the
        # pair-level select would redo the O(d) fold once per (query, corpus)
        # pair, tripling the dominant stage's arithmetic
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ).withColumn("__qn", _norm("qv"))
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ).withColumn("__cn", _norm("cv"))
        sims = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                (_dot("qv", "cv") / (F.col("__qn") * F.col("__cn"))).alias("sim"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def truncate_embeddings(
    df: DataFrame, dims: int, vec_col: str = "embedding", renormalize: bool = True
) -> DataFrame:
    """Matryoshka-style dimensionality reduction ("Matryoshka Representation
    Learning", Kusupati et al. 2022): keep the first ``dims`` coordinates of
    an MRL-trained embedding, optionally L2-renormalizing — the standard
    cheap-retrieval trick (search at d/4, rerank at d).

    Pure JVM higher-order functions over the array column — no shuffle, no
    Python; the narrowed vector shrinks every downstream shuffle/broadcast
    by dims/d, which is the entire point at 100 TB.
    """
    if dims <= 0:
        raise ValueError(f"truncate_embeddings: dims must be positive, got {dims}")
    v = f"transform(slice({vec_col}, 1, {dims}), x -> CAST(x AS DOUBLE))"
    if renormalize:
        # norm computed ONCE per row into an intermediate column — nesting
        # the aggregate inside the per-element transform lambda would
        # re-evaluate the full O(dims) fold for every element (O(dims²)/row;
        # HOF lambdas get no loop-invariant hoisting)
        return (
            df.withColumn("__tv", F.expr(v))
            .withColumn(
                "__tn", F.expr("sqrt(aggregate(__tv, 0D, (a, y) -> a + y * y))")
            )
            .withColumn(vec_col, F.expr("transform(__tv, x -> x / __tn)"))
            .drop("__tv", "__tn")
        )
    return df.withColumn(vec_col, F.expr(v))


def rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefilter_dims: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_round: int | None = 6,
) -> DataFrame:
    """Two-stage ANN: cheap low-dimensional prefilter → exact rerank — the
    standard production retrieval stack (Matryoshka coarse search at d/4,
    exact cosine on the shortlist; Kusupati et al. 2022 §4 usage).

    Stage A scores every corpus vector against the broadcast queries using
    only the first ``prefilter_dims`` coordinates (O(n·d') arithmetic — the
    full-d scan is the dominant cost at corpus scale, and d'/d is the
    speedup) and keeps ``k·refine`` candidates per query. Stage B joins
    ONLY those candidates back to the full vectors (|Q|·k·refine rows — a
    semi-join-sized equi-join, never a second corpus scan) and reranks by
    exact full-dimension cosine.

    Ranking at both stages uses round-to-``sim_round`` + id tiebreak so the
    candidate CUT and the final order are engine-portable (the proven
    matryoshka_topk recipe). Returns (query_id, neighbor_id, sim, rank)
    with rank ≤ k by exact similarity.
    """
    if k <= 0 or refine <= 0:
        raise ValueError(f"k and refine must be positive, got k={k} refine={refine}")
    def trunc_expr(col: str) -> str:
        return f"transform(slice({col}, 1, {prefilter_dims}), x -> CAST(x AS DOUBLE))"

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("qfull"),
        F.expr(trunc_expr(vec_col)).alias("qv"),
    ).withColumn("__qn", _norm("qv")).withColumn("__qfn", _norm("qfull"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv_src")
    ).withColumn("cv", F.expr(trunc_expr("cv_src"))).withColumn(
        "__cn", _norm("cv")
    )
    a_sim = _dot("qv", "cv") / (F.col("__qn") * F.col("__cn"))
    if sim_round is not None:
        a_sim = F.round(a_sim, sim_round)
    # zero-norm guard (ANSI mode divides loudly): a vector with no mass in
    # the prefilter dims is invisible to stage A — exactly the ANN recall
    # tradeoff; ann_recall() measures it
    stage_a = (
        c.filter(F.col("__cn") > 0)
        .crossJoin(F.broadcast(q.filter(F.col("__qn") > 0).select("query_id", "qv", "__qn")))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", a_sim.alias("a_sim"))
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("a_sim"), "neighbor_id")
    cand = (
        stage_a.withColumn("a_rank", F.row_number().over(wa))
        .filter(F.col("a_rank") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    # stage B: candidates ⋈ full vectors (equi-join, candidate-sized), exact
    full_c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("cfull"),
    ).withColumn("__cfn", _norm("cfull"))
    b = (
        cand.join(full_c.filter(F.col("__cfn") > 0), "neighbor_id")
        .join(F.broadcast(q.filter(F.col("__qfn") > 0).select("query_id", "qfull", "__qfn")), "query_id")
    )
    b_sim = _dot("qfull", "cfull") / (F.col("__qfn") * F.col("__cfn"))
    if sim_round is not None:
        b_sim = F.round(b_sim, sim_round)
    wb = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        b.select("query_id", "neighbor_id", b_sim.alias("sim"))
        .withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= k)
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
) -> DataFrame:
    """Recall@k evaluation of an ANN result against brute-force ground
    truth — the metric every ANN deployment (LSH/IVF/PQ ladder) is tuned
    by. Both inputs carry (query_id, neighbor_id, rank); rows with
    rank ≤ k are compared.

    Plan: one inner equi-join on (query_id, neighbor_id) counting hits +
    one groupBy on the exact side for the denominator, joined back —
    everything is top-k-sized (|Q|·k rows), negligible next to the search
    itself. Queries with no approx hits still appear (recall 0.0).

    Returns (query_id, n_hit, n_true, recall) with recall rounded to 4.
    """
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    truth = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_true"))
    hits = (
        e.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        truth.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            "n_true",
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_true"), 4
            ).alias("recall"),
        )
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    mode: str = "mean",
    order_col: str | None = "vec_id",
) -> DataFrame:
    """Pool chunk embeddings into one vector per group — the standard
    long-document embedding recipe (embed chunks, mean/max-pool to a doc
    vector; Sentence-BERT pooling heads do exactly this). Modes: ``mean``,
    ``sum``, ``max``.

    Plan: ONE hash aggregate — ``collect_list`` per group (bounded by
    chunks-per-doc, tens not millions; this is a per-document contract
    like exact_duplicates' id_sample, NOT a corpus-wide array), then a
    JVM ``aggregate``+``zip_with`` element-wise fold. The shuffle carries
    each vector exactly once. ``order_col`` sorts the collected chunks so
    the floating-point fold order is deterministic across runs and
    partitionings (max pooling is order-free, but mean/sum are not at the
    last ulp).

    Returns (group_col, n_chunks, pooled array<double>).
    """
    if mode not in ("mean", "sum", "max"):
        raise ValueError(f"mode must be mean/sum/max, got {mode!r}")
    v = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    if order_col is not None:
        collected = F.expr(
            f"transform(array_sort(collect_list(struct({order_col} AS o, {v} AS v)),"
            " (a, b) -> CASE WHEN a.o < b.o THEN -1 WHEN a.o > b.o THEN 1 ELSE 0 END),"
            " s -> s.v)"
        )
    else:
        collected = F.expr(f"collect_list({v})")
    op = "greatest(x, y)" if mode == "max" else "x + y"
    fold = (
        "aggregate(slice(__vs, 2, size(__vs) - 1), __vs[0],"
        f" (acc, vv) -> zip_with(acc, vv, (x, y) -> {op}))"
    )
    out = f"CASE WHEN size(__vs) > 0 THEN {fold} END"
    pooled = F.expr(out)
    if mode == "mean":
        pooled = F.expr(f"transform({out}, x -> x / size(__vs))")
    return (
        df.groupBy(group_col)
        .agg(collected.alias("__vs"))
        .select(
            group_col,
            F.size("__vs").alias("n_chunks"),
            pooled.alias("pooled"),
        )
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from a seeded RNG."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((bits, dim))
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    return h.tolist()


def lsh_bucket_column(vec_col: str, dim: int, bits: int = 8, seed: int = 42):
    """Column: b-bit sign-LSH bucket id of the vector."""
    planes = _hyperplanes(dim, bits, seed)
    bucket = None
    for i, plane in enumerate(planes):
        arr = ", ".join(f"{v!r}D" for v in plane)
        proj = F.expr(
            f"aggregate(zip_with({vec_col}, array({arr}), (x, p) -> CAST(x AS DOUBLE) * p), "
            f"0D, (acc, v) -> acc + v)"
        )
        bit = F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    bcol = lsh_bucket_column(vec_col, dim, bits)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), bcol.alias("bucket")
    ).withColumn("__cn", _norm("cv"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), bcol.alias("bucket")
    ).withColumn("__qn", _norm("qv"))
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("qv", "cv") / (F.col("__qn") * F.col("__cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float = 0.1,
    iters: int = 2,
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: learn ``n_lists`` centroids (mini k-means on a
    driver-side sample — centroids are tiny and broadcast back), assign each
    vector to its nearest list. Returns (corpus + list_id, centroids)."""
    sample = [
        list(map(float, r[0]))
        for r in corpus.select(vec_col).sample(sample_fraction, seed=seed).limit(50 * n_lists).collect()
    ]
    if not sample:
        raise ValueError(
            "ivf_assign: the centroid-training sample is empty — corpus too "
            "small for sample_fraction; raise sample_fraction (or pass 1.0)"
        )
    arr = np.asarray(sample)
    rng = np.random.default_rng(seed)
    cent = arr[rng.choice(len(arr), size=min(n_lists, len(arr)), replace=False)]
    for _ in range(iters):
        d = ((arr[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        lbl = d.argmin(1)
        for j in range(len(cent)):
            m = lbl == j
            if m.any():
                cent[j] = arr[m].mean(0)
    centroids = cent.tolist()

    assign = nearest_centroid_column(vec_col, centroids)
    return corpus.withColumn("list_id", assign), centroids


def nearest_centroid_column(
    vec_col: str, centroids: list[list[float]], d2_round: int | None = None
):
    """Nearest-centroid argmin as ONE higher-order-function expression over a
    single array<array<double>> literal: per-centroid d², paired with its
    index in a struct, then array_min picks (min d², then min index — same
    tie-break as a strict `<` scan). Expression depth is O(1) in n_lists
    (the r3 nested-WHEN chain was O(n_lists) deep and broke Catalyst
    analysis/codegen at realistic IVF sizes like n_lists=1024-4096).

    ``d2_round``: round d² to this many decimals before comparing — used by
    cross-engine oracles so fp summation-order noise can't flip near-ties.
    """
    cent_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{v!r}D" for v in cvec) + ")" for cvec in centroids
    ) + ")"
    d2 = (
        f"aggregate(zip_with({vec_col}, c, (x, cc) -> "
        f"(CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)), 0D, (acc, v) -> acc + v)"
    )
    if d2_round is not None:
        d2 = f"round({d2}, {d2_round})"
    return F.expr(
        f"array_min(transform({cent_sql}, (c, i) -> named_struct("
        f"'d2', {d2}, 'idx', i))).idx"
    ).cast("int")


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d2_round: int | None = 6,
    cent_round: int | None = 6,
) -> tuple[DataFrame, list[list[float]]]:
    """Distributed Lloyd's k-means over the FULL corpus (vs ``ivf_assign``'s
    sample-based quantizer): ``iters`` rounds of (assign via one HOF-argmin
    scan, update via posexplode + per-(cluster, dim) avg), then a final
    assignment with the converged centroids.

    Deterministic and cross-engine replayable by construction: seeds are the
    vectors of the ``k`` smallest ids; every d² and every updated centroid
    coordinate are rounded (``d2_round`` / ``cent_round``), so a SQL engine
    replaying the same rounds gets bit-identical assignments (fp
    summation-order noise is absorbed by the rounding).

    Scale shape: each round is one full-corpus scan (no shuffle — the argmin
    is a per-row expression) plus one posexplode + (cluster, dim)-keyed agg
    whose result is k×dim rows — tiny, collected to the driver and shipped
    back as the next round's literal. Empty clusters keep their previous
    centroid. Returns (corpus + ``cluster`` column, final centroids).
    """
    # All rounding happens ENGINE-side (Spark round = HALF_UP = DuckDB's
    # half-away-from-zero); Python's round() is banker's and would diverge
    # exactly at half-boundaries.
    seed_vec = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    if cent_round is not None:
        seed_vec = f"transform({seed_vec}, x -> round(x, {cent_round}))"
    seeds = corpus.orderBy(id_col).limit(k).select(F.expr(seed_vec).alias("cv")).collect()
    if len(seeds) < k:
        raise ValueError(f"kmeans_fit: corpus has fewer than k={k} rows")
    cents = [[float(v) for v in r[0]] for r in seeds]

    avg_cv = F.avg("v")
    if cent_round is not None:
        avg_cv = F.round(avg_cv, cent_round)
    for _ in range(iters):
        assigned = corpus.withColumn(
            "cluster", nearest_centroid_column(vec_col, cents, d2_round)
        )
        upd = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(avg_cv.alias("cv"))
            .collect()  # k x dim rows — tiny by construction
        )
        for row in upd:
            cents[row["cluster"]][row["pos"]] = float(row["cv"])
    assigned = corpus.withColumn(
        "cluster", nearest_centroid_column(vec_col, cents, d2_round)
    )
    return assigned, cents


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_round: int | None = None,
) -> DataFrame:
    """IVF probe search: each query scans only its ``nprobe`` nearest
    inverted lists — the ANN scale path completing ``ivf_assign``.

    Physical plan: queries are assigned their nprobe candidate list_ids
    driver-free (numpy on the broadcast query set is unnecessary — the query
    side is small, so we explode (query × probe_list) and broadcast it);
    the corpus, already shuffled once by ``ivf_assign``'s list_id, is joined
    on list_id — each task touches ~nprobe/n_lists of the corpus. Recall is
    tunable via nprobe; nprobe = n_lists degrades to exact brute force.

    ``sim_round``: round the cosine to this many decimals BEFORE ranking —
    makes tie-breaking reproducible across engines (a cross-engine oracle
    ranks rounded sims; unrounded fp noise could flip near-ties).
    """
    cents = np.asarray(centroids)

    def probe_lists(vec) -> list[int]:
        d = ((cents - np.asarray(vec)[None, :]) ** 2).sum(1)
        return [int(i) for i in np.argsort(d)[:nprobe]]

    # the query side is collected to the driver BY DESIGN (broadcast-sized:
    # an online ANN lookup has 1..10^4 queries, not a corpus). Guard the
    # contract so a mistaken corpus-as-queries call fails loudly instead of
    # OOMing the driver; for corpus×corpus jobs use the LSH/bucketed path.
    MAX_QUERY_SIDE = 100_000
    q_rows = queries.select(id_col, vec_col).limit(MAX_QUERY_SIDE + 1).collect()
    if len(q_rows) > MAX_QUERY_SIDE:
        raise ValueError(
            f"ivf_topk collects the query side to the driver; got more than "
            f"{MAX_QUERY_SIDE} query vectors. For corpus-scale query sets "
            "use lsh_topk / cosine near-dup (bucketed joins) instead."
        )
    # keep the query id's ORIGINAL type (string/UUID corpora are valid for
    # every other operator here; int() would crash or silently retype)
    probe = [
        (r[0], list(map(float, r[1])), pl)
        for r in q_rows
        for pl in probe_lists(r[1])
    ]
    spark = assigned.sparkSession
    from stackstac_spark.session import local_df

    qid_type = queries.schema[id_col].dataType.simpleString()
    q_df = local_df(
        spark, probe, f"query_id {qid_type}, qv ARRAY<DOUBLE>, list_id INT"
    )

    # norms once per ROW, not once per pair: the corpus-side norm would
    # otherwise be recomputed for every probed query it meets
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "list_id"
    ).withColumn("__cn", _norm("cv"))
    q_df = q_df.withColumn("__qn", _norm("qv"))
    sim_expr = _dot("qv", "cv") / (F.col("__qn") * F.col("__cn"))
    if sim_round is not None:
        sim_expr = F.round(sim_expr, sim_round)
    sims = (
        c.join(F.broadcast(q_df), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim_expr.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the standard
    vector-store ingest transform (4x storage + bandwidth for ANN shards):
    ``scale = max|v| / 127``, ``q_i = round(v_i / scale)`` (clamped by
    construction), dequant ``q_i * scale``.

    Pure column expressions (whole-stage codegen, no shuffle, no Python).
    Zero vectors quantize to zeros with scale 0. Returns ``id_col``,
    ``qvec array<tinyint>``, ``scale double``, and the reconstruction
    diagnostics ``l2_err`` / ``rel_err`` (rounded to 6) a quantization
    monitor alerts on.
    """
    v = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    scale = f"array_max(transform({v}, x -> abs(x))) / 127.0D"
    q = (
        f"transform({v}, x -> CAST(CASE WHEN __scale = 0D THEN 0D "
        f"ELSE round(x / __scale) END AS TINYINT))"
    )
    l2 = (
        "sqrt(aggregate(zip_with({v}, qvec, (x, qq) -> "
        "(x - CAST(qq AS DOUBLE) * __scale) * (x - CAST(qq AS DOUBLE) * __scale)), "
        "0D, (acc, e) -> acc + e))"
    ).format(v=v)
    norm = f"sqrt(aggregate({v}, 0D, (acc, x) -> acc + x * x))"
    return (
        df.select(id_col, F.col(vec_col), F.expr(scale).alias("__scale"))
        .select(id_col, vec_col, "__scale", F.expr(q).alias("qvec"))
        .select(
            id_col,
            "qvec",
            F.col("__scale").alias("scale"),
            F.round(F.expr(l2), 6).alias("l2_err"),
            F.round(
                F.when(F.expr(norm) == 0, F.lit(0.0)).otherwise(F.expr(l2) / F.expr(norm)), 6
            ).alias("rel_err"),
        )
    )


def cosine_near_duplicates(
    emb: DataFrame,
    top_pairs: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_round: int = 6,
    max_rows: int = 100_000,
) -> DataFrame:
    """Top near-duplicate pairs by embedding cosine over a BOUNDED subset:
    self-join (id_a < id_b) with the smaller side broadcast, ranked by
    similarity — the exact-verification endpoint of the near-dup pipeline
    (run it on LSH/SemDeDup candidate clusters or a bounded slice, never
    corpus×corpus). Norms computed once per row before the join.

    The bounded-subset contract is SELF-ENFORCING (same policy as
    ivf_topk's MAX_QUERY_SIDE): the input must have at most ``max_rows``
    rows — above that, the broadcast non-equi self-join is O(n²) compute
    and would OOM the broadcast; the call fails loudly instead. For
    corpus-scale near-dup use minhash_lsh / semdedup to generate bounded
    candidate clusters first. The count() guard is one cheap agg over the
    (usually already-filtered) input, negligible next to the O(n²) join
    it protects.

    Returns (ida, idb, sim) — the ``top_pairs`` highest-similarity pairs.
    """
    if top_pairs <= 0:
        raise ValueError(f"top_pairs must be positive, got {top_pairs}")
    n = emb.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"cosine_near_duplicates is an exact O(n²) verification endpoint "
            f"for BOUNDED candidate sets; got more than {max_rows} rows. "
            "Run minhash_lsh / semdedup first and call this on the candidate "
            "clusters, or raise max_rows explicitly if you accept the cost."
        )
    a = emb.select(
        F.col(id_col).alias("ida"), F.col(vec_col).alias("va")
    ).withColumn("__an", _norm("va"))
    b = emb.select(
        F.col(id_col).alias("idb"), F.col(vec_col).alias("vb")
    ).withColumn("__bn", _norm("vb"))
    return (
        a.join(F.broadcast(b), F.col("ida") < F.col("idb"))
        .select(
            "ida",
            "idb",
            F.round(
                _dot("va", "vb") / (F.col("__an") * F.col("__bn")), sim_round
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), "ida", "idb")
        .limit(top_pairs)
    )


def pca_power(
    df: DataFrame,
    vec_col: str = "embedding",
    n_iters: int = 8,
    center: bool = True,
    return_mu: bool = False,
) -> tuple:
    """Top principal component of an embedding column by distributed moment
    aggregation + driver-side power iteration — the whitening / drift-check
    step of an embedding pipeline (and the building block of PCA-based
    dimensionality reduction à la latent semantic indexing).

    Distributed part (the only part that sees data): each partition
    computes its (count, Σx, XᵀX) in one numpy pass via ``mapInPandas``
    — BLAS does the d×d Gram locally, and only ``numPartitions`` rows of
    size O(d²) cross the wire. That is the exact partial/final shape MLlib
    uses for ``RowMatrix.computeCovariance``; at 100 TB it is one scan, no
    shuffle (a ≤P-row collect). Driver part: covariance from the moments,
    then ``n_iters`` *unnormalized* power-iteration steps from the all-ones
    vector — unnormalized on purpose: every operation is a fixed-order
    polynomial in the input moments, so an external SQL engine can replay
    it exactly (normalizing each step would still be replayable but costs
    nothing to skip at these iteration counts; doubles hold λ^8 easily).

    Returns ``(eigval, eigvec, explained_ratio, n)`` — plus ``mu`` as a
    fifth element when ``return_mu=True``: the Rayleigh-quotient
    top eigenvalue, the L2-normalized eigenvector, eigval / trace(cov)
    (fraction of variance explained), and the row count.
    """
    import pandas as pd

    if n_iters <= 0:
        raise ValueError(f"n_iters must be positive, got {n_iters}")

    def partial(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n += m.shape[0]
            s = m.sum(0) if s is None else s + m.sum(0)
            gg = m.T @ m
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                [(n, s.tolist(), g.reshape(-1).tolist())], columns=["n", "s", "g"]
            )

    parts = df.select(vec_col).mapInPandas(
        partial, "n long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("pca_power: empty input")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(p["g"]).reshape(d, d) for p in parts], axis=0)
    mu = s / n
    cov = g / n - (np.outer(mu, mu) if center else 0.0)
    v = np.ones(d)
    for _ in range(n_iters):
        v = cov @ v
    av = cov @ v
    vv = float(v @ v)
    eigval = float(v @ av) / vv if vv else 0.0
    trace = float(np.trace(cov))
    vec = (v / math.sqrt(vv)).tolist() if vv else [0.0] * d
    explained = eigval / trace if trace else 0.0
    if return_mu:
        # the mean falls out of the same moments — callers that also need
        # it (remove_top_component) must not pay a second corpus scan
        return eigval, vec, explained, int(n), mu.tolist()
    return eigval, vec, explained, int(n)


def remove_top_component(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 8,
    round_to: int | None = 6,
) -> DataFrame:
    """All-but-the-Top embedding post-processing (Mu & Viswanath, ICLR
    2018): subtract the mean and the projection onto the top principal
    component — the standard fix for anisotropic embedding spaces (the
    dominant direction carries frequency, not semantics, and drowns
    cosine similarities).

    Plan: :func:`pca_power`'s distributed-moments fit (one scan, no
    shuffle) gives μ and the top component u driver-side; the transform
    is then a MAP-ONLY column expression with μ and u inlined as array
    literals — ``c = (v-μ)·u``, ``v' = (v-μ) - c·u`` — that fuses into
    the scan at any corpus size. Returns (id, coef, resid array<double>,
    resid_norm).
    """
    # ONE scan: the moments fit yields both u and mu (a second
    # posexplode-aggregate for the mean would re-read the corpus)
    _eigval, u, _ratio, _n, mu = pca_power(
        df, vec_col, n_iters=n_iters, center=True, return_mu=True
    )
    d = len(u)
    u_lit = "array(" + ", ".join(f"{x!r}D" for x in u) + ")"
    mu_lit = "array(" + ", ".join(f"{x!r}D" for x in mu) + ")"
    v = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    centered = f"zip_with({v}, {mu_lit}, (x, m) -> x - m)"
    out = (
        df.select(id_col, F.col(vec_col))
        .withColumn("__c", F.expr(centered))
        .withColumn(
            "__coef",
            F.expr(f"aggregate(zip_with(__c, {u_lit}, (x, uu) -> x * uu), 0D, (a, y) -> a + y)"),
        )
        .withColumn("__r", F.expr(f"zip_with(__c, {u_lit}, (x, uu) -> x - __coef * uu)"))
    )
    coef = F.col("__coef")
    rn = F.expr("sqrt(aggregate(__r, 0D, (a, y) -> a + y * y))")
    if round_to is not None:
        coef = F.round(coef, round_to)
        rn = F.round(rn, round_to)
    return out.select(
        id_col,
        coef.alias("coef"),
        F.col("__r").alias("resid"),
        rn.alias("resid_norm"),
    )


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cos_round: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-level
    semantic deduplication — cluster the corpus with k-means, compare pairs
    ONLY within a cluster, and drop all but one of any group of
    semantically-identical items (pairwise cosine ≥ ``threshold``).

    Keep policy: an item is dropped iff a SMALLER-id item in its cluster is
    within the threshold (the paper keeps the item farthest from the
    centroid; any one-per-group policy is admissible — smallest-id is
    deterministic and join-shaped, so the decision is a semi-join instead
    of a per-group argmax). Cosines are rounded to ``cos_round`` before the
    comparison so a replay on another engine can't flip a borderline pair.

    Returns (id, cluster, is_kept) for every input row. Scale shape: the
    k-means is :func:`kmeans_fit` (per-round: one scan + one k×dim agg);
    the pair stage is a self-equi-join ON THE CLUSTER KEY — cost
    Σ|cluster|², the paper's own trade (k controls the quadratic bound;
    at 100 TB pick k so clusters are ~10⁵ rows), never corpus-wide O(n²).
    The drop decision is one aggregate over the pair list per id — no
    connected components needed because "similar to ANY smaller id" is
    already a deterministic canonical choice.
    """
    assigned, _cents = kmeans_fit(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    # three consumers (both pair-join sides + the output join) — without
    # this the nearest-centroid assignment scan re-runs per consumer
    # (optimization r12). EAGER (second pass): the pair-join sides are
    # concurrent branches of one job, so a lazy cache lets them race and
    # recompute the assignment scan before it fills.
    assigned = assigned.localCheckpoint()
    side = assigned.select(
        F.col(id_col).alias("__id"), F.col("cluster"), F.col(vec_col).alias("__v")
    )
    a, b = side.alias("a"), side.alias("b")
    cos = F.round(
        _dot("a.__v", "b.__v") / (_norm("a.__v") * _norm("b.__v")), cos_round
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("a.__id") > F.col("b.__id"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= float(threshold))
        .select(F.col("a.__id").alias(id_col))
        .distinct()
    )
    return (
        assigned.select(id_col, "cluster")
        .join(dropped.withColumn("__drop", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("is_kept"),
        )
    )


def pq_fit(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011, the PQ half of
    FAISS's IVF-PQ): split the ``dim`` dimensions into ``m`` contiguous
    subspaces and train an independent ``k``-centroid codebook per subspace
    with the SAME engine-replayable Lloyd's recipe as :func:`kmeans_fit`
    (smallest-id seeds, rounded d² and centroid updates) — so a SQL engine
    can replay the entire fit bit-identically.

    Returns ``codebooks[m][k][dim/m]``. Cost: m small k-means fits, each
    per-round one corpus scan + a k×(dim/m) driver-collected agg — at 100 TB
    you fit on a sample (pass ``corpus.sample(...)``); encode/search below
    are the full-corpus paths.
    """
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sliced = corpus.select(
            F.col(id_col), F.expr(f"slice({vec_col}, {j * sub + 1}, {sub})").alias(vec_col)
        )
        _assigned, cents = kmeans_fit(sliced, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
        books.append(cents)
    return books


def _pq_books_sql(codebooks: list[list[list[float]]]) -> str:
    return "array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(f"{v!r}D" for v in cvec) + ")" for cvec in book
        ) + ")"
        for book in codebooks
    ) + ")"


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d2_round: int | None = 6,
) -> DataFrame:
    """(id, codes array<int>) — each vector compressed to m byte-ish codes
    (32× smaller at m=8/dim=64): per subspace, the argmin codebook entry.

    One scan, zero shuffles, no Python: the codebooks ship as a single
    array<array<array<double>>> literal and each subspace's argmin is the
    same O(1)-depth min-struct HOF as :func:`nearest_centroid_column` —
    expression depth is constant in both m and k.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = _pq_books_sql(codebooks)
    d2 = (
        f"aggregate(zip_with(slice({vec_col}, j * {sub} + 1, {sub}), c, "
        f"(x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)), "
        f"0D, (acc, v) -> acc + v)"
    )
    if d2_round is not None:
        d2 = f"round({d2}, {d2_round})"
    # NB: bracket indexing on Spark SQL arrays is 0-based
    codes = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"array_min(transform({books}[j], (c, i) -> "
        f"named_struct('d2', {d2}, 'idx', i))).idx)"
    )
    return corpus.select(F.col(id_col), F.expr(codes).cast("array<int>").alias("codes"))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int | None = 6,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: approximate
    ``||q - v||² ≈ Σ_j ||q_j - codebook[j][codes[j]]||²`` — the query stays
    exact, the corpus side is its code words. This is the search shape that
    makes 10⁹-vector ANN fit in RAM (FAISS ADC).

    Physical plan: queries broadcast (same driver-guard philosophy as
    :func:`ivf_topk` — query sides are small by contract); the corpus scan
    computes the ADC sum as one HOF expression over the codebook literal
    (depth O(1) in m and k), then per-query top-k via the rank window
    (WindowGroupLimit pushes the limit below the sort). The uncompressed
    corpus vectors are never touched — at scale they live in cold storage.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = _pq_books_sql(codebooks)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("qv"),
    )
    c = encoded.select(F.col(id_col).alias("neighbor_id"), "codes")
    adc = (
        f"aggregate(sequence(0, {m - 1}), 0D, (acc, j) -> acc + "
        f"aggregate(zip_with(slice(qv, j * {sub} + 1, {sub}), "
        f"{books}[j][codes[j]], "
        f"(x, cc) -> (x - cc) * (x - cc)), 0D, (a2, v) -> a2 + v))"
    )
    dist = F.expr(adc)
    if dist_round is not None:
        dist = F.round(dist, dist_round)
    sims = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dist.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kcenter_select(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d2_round: int = 6,
) -> DataFrame:
    """Greedy k-center selection (Gonzalez 1985, the classic 2-approximation;
    the coreset / diverse-subset policy in training-data curation): seed
    with the smallest id, then ``k-1`` times pick the point FARTHEST from
    the selected set → (rank, vec_id, dist2).

    Deterministic and engine-replayable: squared distances use the
    ``|a|² + |b|² − 2·a·b`` form clamped at 0 and rounded to ``d2_round``
    BEFORE the running min and the argmax (fp noise can't flip a near-tie),
    argmax ties break on the smaller id; an external SQL engine unrolls the
    selection as a CTE chain. ``dist2`` is the point's distance² to the
    previously selected set at selection time (NULL for the seed).

    Scale shape: per selection one full corpus scan — a JVM fold against
    the newest center's array literal updating the running min — plus a
    TakeOrdered top-1; ``localCheckpoint`` per round keeps the plan flat.
    k scans total is the canonical greedy algorithm; at 100 TB run it over
    a uniform pre-sample (coreset-of-a-sample, the standard move) or with
    a larger batch per round.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("n", F.expr("aggregate(v, 0D, (a, x) -> a + x * x)"))
    seed = e.orderBy("vec_id").limit(1).collect()
    if not seed:
        raise ValueError("kcenter_select: empty corpus")
    seed = seed[0]
    selected: list[tuple] = [(0, seed["vec_id"], None)]
    cur_vec, cur_n = list(seed["v"]), float(seed["n"])
    df = e
    have_md = False
    for rank in range(1, k):
        lit = "array(" + ", ".join(f"{x!r}D" for x in cur_vec) + ")"
        d2 = (
            f"round(greatest(0D, n + {cur_n!r}D - 2D * "
            f"aggregate(zip_with(v, {lit}, (x, y) -> x * y), 0D, (a, z) -> a + z)"
            f"), {d2_round})"
        )
        df = df.withColumn(
            "md", F.expr(d2) if not have_md else F.least(F.col("md"), F.expr(d2))
        ).localCheckpoint()
        have_md = True
        best = df.orderBy(F.desc("md"), F.asc("vec_id")).limit(1).collect()[0]
        selected.append((rank, best["vec_id"], float(best["md"])))
        cur_vec, cur_n = list(best["v"]), float(best["n"])
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("vec_id", corpus.schema[id_col].dataType),
            T.StructField("dist2", T.DoubleType()),
        ]
    )
    from stackstac_spark.session import local_df

    return local_df(corpus.sparkSession, selected, schema)


def sign_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Binary (sign-bit) embedding quantization: bit i = 1 iff v[i] > 0,
    packed into ⌈dim/32⌉ bigint words of 32 bits each (32 per word keeps
    every partial sum far from the signed-64 boundary, so the packing is a
    plain exact integer SUM an external engine replays verbatim — no
    sign-bit wraparound cases). 64 float dims → 8 bytes of code: the 32×
    compression that makes billion-vector first-stage retrieval RAM-
    resident; cosine survives sign quantization well when vectors are
    roughly isotropic (Charikar 2002 — SimHash with axis-aligned
    hyperplanes).

    One scan, one native aggregate-lambda per word, no shuffle. Returns
    (id, w0, w1, ...).
    """
    if dim < 1:
        raise ValueError(f"dim must be positive, got {dim}")
    words = []
    for w in range((dim + 31) // 32):
        lo = 32 * w + 1
        hi = min(32 * w + 32, dim)
        words.append(
            F.expr(
                f"aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT), "
                f"(acc, i) -> acc + CASE WHEN element_at({vec_col}, i) > 0 "
                f"THEN CAST(1 AS BIGINT) << (i - {lo}) ELSE CAST(0 AS BIGINT) END)"
            ).alias(f"w{w}")
        )
    return df.select(F.col(id_col).alias("id"), *words)


def hamming_topk(
    df: DataFrame,
    query_ids: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 5,
    shortlist: int = 16,
) -> DataFrame:
    """Two-stage binary ANN: Hamming distance over :func:`sign_codes`
    (bit_count(xor) per word — pure integer ops, no float math touches the
    corpus) prefilters a per-query ``shortlist``, then exact cosine
    reranks it to top ``k``. The binary complement of the int8/PQ/
    Matryoshka quantization family: coarsest codes, cheapest distance,
    biggest memory win.

    Plan: codes built once (one scan); the query-side codes+vectors
    broadcast (|Q| rows); candidate scoring is a broadcast nested-loop of
    integer XORs; the shortlist window bounds the float rerank to
    |Q|·shortlist rows. Deterministic end to end (hamming ties →
    neighbor id; final ties → (sim desc, neighbor id)).

    Returns (query_id, neighbor_id, hamming, sim, rank).
    """
    from pyspark.sql import Window

    codes = sign_codes(df, vec_col, id_col, dim)
    n_words = (dim + 31) // 32
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cand = codes.join(vecs, "id").select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        *[F.col(f"w{i}").alias(f"cw{i}") for i in range(n_words)],
    )
    q = (
        codes.join(vecs, "id")
        .filter(F.col("id").isin(query_ids))
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            *[F.col(f"w{i}").alias(f"qw{i}") for i in range(n_words)],
        )
    )
    ham = None
    for i in range(n_words):
        t = F.bit_count(F.col(f"cw{i}").bitwiseXOR(F.col(f"qw{i}")))
        ham = t if ham is None else ham + t
    sims = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv", ham.alias("hamming"))
    )
    w1 = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    short = sims.withColumn("__r", F.row_number().over(w1)).filter(
        F.col("__r") <= shortlist
    )
    dot = F.expr("aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, x) -> a + x)")
    nq = F.sqrt(F.expr("aggregate(transform(qv, x -> CAST(x AS DOUBLE) * x), 0D, (a, x) -> a + x)"))
    nc = F.sqrt(F.expr("aggregate(transform(cv, x -> CAST(x AS DOUBLE) * x), 0D, (a, x) -> a + x)"))
    scored = short.select(
        "query_id",
        "neighbor_id",
        "hamming",
        F.round(dot / (nq * nc), 6).alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hamming_candidate_pairs(
    src: DataFrame,
    tgt: DataFrame,
    per_side: int = 8,
    dim: int = 64,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Cross-corpus ANN candidate pairs from sign-bit codes — the first
    stage that makes :func:`bitext_margin_pairs` linear-ish at corpus
    scale (the LASER/CCMatrix shape: FAISS shortlists feeding the margin
    rule; here the shortlist comes from :func:`sign_codes` Hamming
    banding, everything relational).

    Three bounded stages, no cross join anywhere:

    1. **Band join**: each side's sign codes split into ``band_bits``-bit
       bands (dim/band_bits bands; default 8×8 over 64 bits); candidate =
       any src/tgt pair agreeing EXACTLY on ≥1 band — a (band, key)
       equi-join, the same pigeonhole banding as MinHash LSH (a pair
       within Hamming distance < n_bands always shares a band; higher
       distances survive with the S-curve probability).
    2. **Skew guard** (``max_bucket``): optionally drop (band, key)
       buckets where either side exceeds ``max_bucket`` rows — the
       hyper-common-code guard (e.g. an all-zeros band from centered
       dims), mirroring the MinHash ``max_bucket`` policy. Off by default
       so small gates stay parameter-free.
    3. **Per-side shortlist**: exact Hamming (bit_count of word XORs —
       integer only) on the banded pairs, keep each src's ``per_side``
       best and each tgt's ``per_side`` best (ties → partner id), union.

    Returns distinct (src_id, tgt_id) — feed straight into
    ``bitext_margin_pairs(candidates=...)``. Scale shape: two scans for
    codes, one banded equi-join whose volume is controlled by band_bits ×
    max_bucket, two partitioned top-k windows. Every step is replayable
    integer arithmetic, so the oracle pins the exact candidate set.
    """
    if band_bits < 1 or 32 % band_bits != 0:
        raise ValueError(f"band_bits must divide 32, got {band_bits}")
    n_words = (dim + 31) // 32
    per_word = 32 // band_bits
    mask = (1 << band_bits) - 1
    s_codes = sign_codes(src, vec_col, id_col, dim)
    t_codes = sign_codes(tgt, vec_col, id_col, dim)

    def _bands(codes: DataFrame, out_id: str) -> DataFrame:
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(wi * per_word + b).alias("band"),
                    F.shiftright(F.col(f"w{wi}"), b * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                )
                for wi in range(n_words)
                for b in range(per_word)
            ]
        )
        out = codes.select(F.col("id").alias(out_id), F.explode(band_arr).alias("bk"))
        return out.select(out_id, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    sb, tb = _bands(s_codes, "src_id"), _bands(t_codes, "tgt_id")
    if max_bucket is not None:
        for side, idc in ((0, "src_id"), (1, "tgt_id")):
            df = sb if side == 0 else tb
            keep = (
                df.groupBy("band", "key")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") <= max_bucket)
                .select("band", "key")
            )
            if side == 0:
                sb = sb.join(keep, ["band", "key"], "left_semi")
            else:
                tb = tb.join(keep, ["band", "key"], "left_semi")
    cand = sb.join(tb, ["band", "key"]).select("src_id", "tgt_id").distinct()
    sw = s_codes.select(
        F.col("id").alias("src_id"), *[F.col(f"w{i}").alias(f"sw{i}") for i in range(n_words)]
    )
    tw = t_codes.select(
        F.col("id").alias("tgt_id"), *[F.col(f"w{i}").alias(f"tw{i}") for i in range(n_words)]
    )
    ham = None
    for i in range(n_words):
        t = F.bit_count(F.col(f"sw{i}").bitwiseXOR(F.col(f"tw{i}")))
        ham = t if ham is None else ham + t
    scored = (
        cand.join(sw, "src_id").join(tw, "tgt_id").select("src_id", "tgt_id", ham.alias("hamming"))
    )
    w_s = Window.partitionBy("src_id").orderBy("hamming", "tgt_id")
    w_t = Window.partitionBy("tgt_id").orderBy("hamming", "src_id")
    keep_s = scored.withColumn("__r", F.row_number().over(w_s)).filter(
        F.col("__r") <= per_side
    )
    keep_t = scored.withColumn("__r", F.row_number().over(w_t)).filter(
        F.col("__r") <= per_side
    )
    return keep_s.select("src_id", "tgt_id").union(
        keep_t.select("src_id", "tgt_id")
    ).distinct()


def mmr_select(
    corpus: DataFrame,
    query_id,
    k: int = 6,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_round: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    greedily pick ``k`` items maximizing λ·rel(i) − (1−λ)·max_{s∈S}
    sim(i, s) — relevance-weighted DIVERSE retrieval, the standard
    context-packing / dedup-at-retrieval policy in RAG pipelines. The
    query is the corpus row with id ``query_id``; rel and sim are cosine.

    Deterministic and engine-replayable (same contract as
    :func:`kcenter_select`): every cosine is rounded to ``sim_round``
    BEFORE the running max and the argmax; score is rounded again after
    the λ-combine; argmax ties break on the smaller id. The oracle unrolls
    the k selection rounds as a CTE chain.

    Scale shape: one corpus scan per round — a JVM fold against the newest
    pick's array literal updating the running max-sim — plus TakeOrdered
    top-1; ``localCheckpoint`` keeps the plan flat. k is user-facing small
    (a context window), so k scans is the canonical algorithm.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("nn", F.sqrt(F.expr("aggregate(v, 0D, (a, x) -> a + x * x)")))
    qrow = e.filter(F.col("vec_id") == query_id).collect()
    if not qrow:
        raise ValueError(f"mmr_select: query id {query_id!r} not in corpus")
    qv, qn = list(qrow[0]["v"]), float(qrow[0]["nn"])

    def cos_expr(vec: list, n: float) -> str:
        lit = "array(" + ", ".join(f"{x!r}D" for x in vec) + ")"
        return (
            f"round(aggregate(zip_with(v, {lit}, (x, y) -> x * y), 0D, "
            f"(a, z) -> a + z) / (nn * {n!r}D), {sim_round})"
        )

    cand = e.filter(F.col("vec_id") != query_id).withColumn(
        "rel", F.expr(cos_expr(qv, qn))
    )
    selected: list[tuple] = []
    df, have_ms = cand, False
    for rank in range(k):
        if not have_ms:
            score = F.col("rel")
        else:
            score = F.round(
                F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("ms"), sim_round
            )
        best = (
            df.withColumn("score", score)
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        selected.append((rank, best["vec_id"], float(best["rel"]), float(best["score"])))
        if rank == k - 1:
            break
        sim_new = F.expr(cos_expr(list(best["v"]), float(best["nn"])))
        df = (
            df.filter(F.col("vec_id") != best["vec_id"])
            .withColumn("ms", sim_new if not have_ms else F.greatest(F.col("ms"), sim_new))
            .localCheckpoint()
        )
        have_ms = True
    from pyspark.sql import types as T

    from stackstac_spark.session import local_df

    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("vec_id", corpus.schema[id_col].dataType),
            T.StructField("rel", T.DoubleType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return local_df(corpus.sparkSession, selected, schema)


def bitext_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    knn: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_round: int = 6,
    candidates: DataFrame | None = None,
    dense_collect_threshold: int = _DENSE_COLLECT_THRESHOLD,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the LASER /
    CCMatrix pairing rule): score every cross-lingual pair by
    ratio-margin sim(x,y) / ((avg_knn(x) + avg_knn(y)) / 2), keep pairs
    that are each other's best margin match (mutual argmax) above
    ``threshold``. The standard parallel-corpus miner for translation
    training data.

    Relational shape: a sim matrix, two window top-k passes for the kNN
    averages, two argmax windows, one self-join for mutuality. Every sim
    and margin is rounded before ranking, ties break on the partner id,
    so an external engine replays the exact pair set.

    ``candidates=None`` scores the FULL src × tgt matrix — exact
    semantics, quadratic by construction, only for bounded slices (it is
    this module's semantic anchor, not the production path).
    ``candidates=`` a (src_id, tgt_id) DataFrame — e.g.
    :func:`hamming_candidate_pairs`'s banded sign-bit shortlists —
    restricts scoring to those pairs via two equi-joins (NO cross join in
    the plan), and the kNN sums / mutual argmax run over the candidate
    set: exactly the LASER/CCMatrix production shape, where margins are
    shortlist-relative (Artetxe & Schwenk compute the kNN average over
    the FAISS shortlist, not the full matrix). This is the path that
    holds at 100 TB: candidate volume is bounded by the generator, and
    everything downstream is windows over per-id groups.
    """
    s = src.select(
        F.col(id_col).alias("src_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("sv"),
    ).withColumn("sn", F.sqrt(F.expr("aggregate(sv, 0D, (a, x) -> a + x * x)")))
    t = tgt.select(
        F.col(id_col).alias("tgt_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("tv"),
    ).withColumn("tn", F.sqrt(F.expr("aggregate(tv, 0D, (a, x) -> a + x * x)")))
    sim_expr = F.round(
        F.expr("aggregate(zip_with(sv, tv, (x, y) -> x * y), 0D, (a, z) -> a + z)")
        / (F.col("sn") * F.col("tn")),
        sim_round,
    ).alias("sim")
    if candidates is None:
        # full-matrix path: when the tgt side is a bounded dense matrix
        # (the documented bounded-slice contract of this exact path), the
        # sims come from the NumPy mapInArrow kernel — same fold order,
        # bit-identical, ~12x less per-pair cost than the interpreted HOF
        # lambdas (optimization r12; _dense_sims docstring has the
        # equivalence argument). Otherwise the original cross join runs.
        routed = _dense_sims(
            s.select("src_id", "sv"), ["src_id"], "sv",
            t.select("tgt_id", "tv"), ["tgt_id"], "tv",
            threshold=dense_collect_threshold,
        )
        if routed is not None:
            sims = routed.select(
                "src_id", "tgt_id", F.round(F.col("sim"), sim_round).alias("sim")
            )
        else:
            sims = s.crossJoin(t).select("src_id", "tgt_id", sim_expr)
    else:
        cand = candidates.select("src_id", "tgt_id").distinct()
        sims = cand.join(s, "src_id").join(t, "tgt_id").select(
            "src_id", "tgt_id", sim_expr
        )
    # Single-pass shape (optimization r12): the sim matrix — the dominant
    # cost (cross join or candidate join + a dim-length dot product per
    # pair) — is evaluated ONCE. The old shape aggregated the kNN sums in
    # two groupBy branches and joined them back onto a third evaluation of
    # `sims` (Spark re-executes a subtree per DataFrame consumer), i.e.
    # 3 full sim-matrix evaluations + 2 joins + 6 exchanges. Here the kNN
    # sums ride the SAME window partitioning that computes the ranks
    # (full-partition frame, no extra exchange), and the mutual-argmax
    # windows are ordered so consecutive window operators share their
    # exchange: src → tgt → src = 3 exchanges total, 0 joins, 1 sim-matrix
    # evaluation (guide §2.4: two operations keyed the same way share one
    # exchange; §1.2: fix the distributed algorithm first).
    #
    # carry the rounded SUM of the top-k sims, not their average: the sims
    # are 6-decimal multiples, so their ideal sum is too — round(sum, 6) is
    # boundary-stable across engines, whereas round(sum/k, 6) lands exactly
    # on a .5e-6 rounding boundary for ~1/k of all keys (fp noise then
    # flips the 6th decimal between engines). The /2k moves into the
    # margin denominator. The window SUM adds the same ≤ knn addends as the
    # old groupBy sum (order-insensitive under round(,6), the contract the
    # oracle already relies on), so the pair set is unchanged.
    ord_s = Window.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("tgt_id"))
    ord_t = Window.partitionBy("tgt_id").orderBy(F.desc("sim"), F.asc("src_id"))
    part_s = Window.partitionBy("src_id")
    part_t = Window.partitionBy("tgt_id")
    scored = (
        sims.withColumn("rk_s", F.row_number().over(ord_s))
        .withColumn(
            "sum_s",
            F.round(
                F.sum(F.when(F.col("rk_s") <= knn, F.col("sim"))).over(part_s),
                sim_round,
            ),
        )
        .withColumn("rk_t", F.row_number().over(ord_t))
        .withColumn(
            "sum_t",
            F.round(
                F.sum(F.when(F.col("rk_t") <= knn, F.col("sim"))).over(part_t),
                sim_round,
            ),
        )
        .withColumn(
            "margin",
            F.round(
                F.col("sim") / ((F.col("sum_s") + F.col("sum_t")) / F.lit(2.0 * knn)),
                sim_round,
            ),
        )
    )
    # rk_b first: it shares the tgt_id partitioning just established by the
    # sum_t window (sort-only, no exchange); rk_f then pays the one
    # remaining exchange back to src_id.
    w_fwd = Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    w_bwd = Window.partitionBy("tgt_id").orderBy(F.desc("margin"), F.asc("src_id"))
    best = (
        scored.withColumn("rk_b", F.row_number().over(w_bwd))
        .withColumn("rk_f", F.row_number().over(w_fwd))
    )
    return (
        best.filter((F.col("rk_f") == 1) & (F.col("rk_b") == 1))
        .filter(F.col("margin") >= threshold)
        .select("src_id", "tgt_id", "sim", "margin")
    )


def knn_classify(
    train: DataFrame,
    test: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    sim_round: int = 6,
    dense_collect_threshold: int = _DENSE_COLLECT_THRESHOLD,
) -> DataFrame:
    """k-nearest-neighbor classification of ``test`` vectors against a
    labeled ``train`` corpus → (id, label, pred, correct) — the standard
    "are these embeddings any good?" probe (kNN accuracy is THE linear-
    probe-free embedding benchmark).

    The test side BROADCASTS (same bounded-query contract as
    :func:`hamming_topk` — evaluation probes are thousands of rows, the
    train corpus is the big side and streams); scoring is rounded cosine,
    the vote is majority with ties → (more votes, smaller label), and the
    neighbor ordering ties on (sim desc, train id) so an external engine
    replays the exact prediction set. Two windows: neighbor top-k per
    query, vote argmax per query."""
    t = train.select(
        F.col(id_col).alias("tid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("tv"),
        F.col(label_col).alias("tlabel"),
    ).withColumn("tn", F.sqrt(F.expr("aggregate(tv, 0D, (a, x) -> a + x * x)")))
    q = test.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("qv"),
        F.col(label_col).alias("label"),
    ).withColumn("qn", F.sqrt(F.expr("aggregate(qv, 0D, (a, x) -> a + x * x)")))
    # bounded test side -> NumPy mapInArrow sims (bit-identical fold; see
    # _dense_sims) instead of the broadcast join + interpreted HOF lambdas
    routed = _dense_sims(
        t.select("tid", "tlabel", "tv"), ["tid", "tlabel"], "tv",
        q.select("id", "label", "qv"), ["id", "label"], "qv",
        threshold=dense_collect_threshold,
    )
    if routed is not None:
        sims = routed.select(
            "id", "label", "tid", "tlabel",
            F.round(F.col("sim"), sim_round).alias("sim"),
        )
    else:
        sims = t.crossJoin(F.broadcast(q)).select(
            "id",
            "label",
            "tid",
            "tlabel",
            F.round(
                F.expr("aggregate(zip_with(tv, qv, (x, y) -> x * y), 0D, (a, z) -> a + z)")
                / (F.col("tn") * F.col("qn")),
                sim_round,
            ).alias("sim"),
        )
    w_nn = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("tid"))
    nn = sims.withColumn("__r", F.row_number().over(w_nn)).filter(F.col("__r") <= k)
    votes = nn.groupBy("id", "label", "tlabel").agg(F.count(F.lit(1)).alias("v"))
    w_vote = Window.partitionBy("id").orderBy(F.desc("v"), F.asc("tlabel"))
    return (
        votes.withColumn("__r", F.row_number().over(w_vote))
        .filter(F.col("__r") == 1)
        .select(
            F.col("id").alias(id_col),
            "label",
            F.col("tlabel").alias("pred"),
            (F.col("label") == F.col("tlabel")).alias("correct"),
        )
    )


def centroid_classify(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    sim_round: int = 6,
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification → (id, label, pred,
    correct): per-label mean vectors from the train side, each test
    vector assigned to the max-cosine centroid (ties → smaller label).
    The O(labels) companion to :func:`knn_classify` — at corpus scale the
    centroid table is tiny no matter how big train is, so the scoring
    join is a broadcast by construction.

    Fully relational dot products: train vectors explode to (label, dim,
    value) for the per-label per-dim mean (rounded before scoring so an
    external engine replays the argmax), test vectors explode once and
    equi-join on dim — never a vector cross join."""
    tl = train.select(
        F.col(label_col).alias("tlabel"),
        F.posexplode(F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")),
    ).select("tlabel", F.col("pos").alias("dim"), F.col("col").alias("v"))
    # the centroid table (labels × dims — bounded, tiny at any scale) is
    # consumed by TWO broadcast builds (the scoring join and the norm
    # join); without a checkpoint each build re-runs the train explode +
    # aggregate. Eager: broadcast builds race as driver-side jobs.
    cent = (
        tl.groupBy("tlabel", "dim")
        .agg(F.round(F.avg("v"), sim_round).alias("c"))
        .localCheckpoint()
    )
    cnorm = cent.groupBy("tlabel").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn"))
    ql = test.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.posexplode(F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")),
    ).select("id", "label", F.col("pos").alias("dim"), F.col("col").alias("q"))
    qnorm = ql.groupBy("id").agg(F.sqrt(F.sum(F.col("q") * F.col("q"))).alias("qn"))
    dots = (
        ql.join(F.broadcast(cent), "dim")
        .groupBy("id", "label", "tlabel")
        .agg(F.sum(F.col("q") * F.col("c")).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(cnorm), "tlabel")
        .join(qnorm, "id")
        .select(
            "id",
            "label",
            "tlabel",
            F.round(F.col("dot") / (F.col("cn") * F.col("qn")), sim_round).alias("sim"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("tlabel"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            F.col("id").alias(id_col),
            "label",
            F.col("tlabel").alias("pred"),
            (F.col("label") == F.col("tlabel")).alias("correct"),
        )
    )


def silhouette_centroid(
    assigned: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    round_to: int = 6,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per point → (id, cluster,
    a, b, s): a = distance to the OWN centroid, b = min distance to any
    OTHER centroid, s = (b − a)/max(a, b) (Rousseeuw 1987's silhouette
    with the O(N²) pairwise means replaced by centroid distances — the
    standard large-N variant, sklearn's "simplified silhouette"). The
    clustering-quality gate after :func:`kmeans_fit`: s near 1 = well
    separated, near 0 = boundary, negative = probably mis-assigned.

    Plan: the k centroids ride as ONE array<array<double>> literal (the
    :func:`nearest_centroid_column` pattern); all k distances per point
    come from a single map-only higher-order expression — a fixed
    left-to-right fold per centroid, so the IEEE summation order is
    pinned and an external engine (list_sum over generate_series)
    replays every rounded distance bit-for-bit. Never a point×point
    pair, never a shuffle: per-point cost is k·dim inside one projection.
    """
    if not centroids:
        raise ValueError("centroids must be non-empty")
    cent_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{float(v)!r}D" for v in cvec) + ")"
        for cvec in centroids
    ) + ")"
    dsum = (
        f"aggregate(zip_with({vec_col}, c, (x, cc) -> "
        f"(CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)), 0D, (acc, v) -> acc + v)"
    )
    ds = (
        f"transform({cent_sql}, (c, i) -> named_struct("
        f"'d', round(sqrt({dsum}), {round_to}), 'idx', i))"
    )
    per_pt = assigned.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).cast("int").alias("own"),
        F.expr(ds).alias("__ds"),
    ).select(
        "id",
        "own",
        F.expr("element_at(__ds, own + 1).d").alias("a"),
        F.expr(
            "array_min(transform(filter(__ds, s -> s.idx != own), s -> s.d))"
        ).alias("b"),
    )
    return per_pt.select(
        F.col("id").alias(id_col),
        F.col("own").alias(cluster_col),
        "a",
        "b",
        # identical distances (a=b=0: point ON two coincident centroids)
        # score 0 by convention; k=1 leaves b NULL and s NULL
        F.when(
            F.greatest("a", "b") > 0,
            F.round((F.col("b") - F.col("a")) / F.greatest("a", "b"), round_to),
        ).otherwise(
            F.when(F.col("b").isNotNull(), F.lit(0.0))
        ).alias("s"),
    )


def rrf_fuse(
    runs: list[DataFrame],
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    top_n: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval runs (Cormack, Clarke &
    Büttcher 2009) → per query the fused top-``top_n``:
    (query, doc, n_runs, rrf_score, fused_rank) with

        RRF(d) = Σ_runs 1 / (k + rank_run(d))

    (k = 60, the paper's constant) — THE standard zero-training way to
    combine a BM25 run with an ANN run (hybrid search), or several ANN
    configs, into one ranking; rank-based, so wildly different score
    scales fuse without calibration. A doc absent from a run contributes
    nothing for that run (the standard convention). Ties in the fused
    score break by doc id for determinism. Null/NaN scores are excluded
    from a run's ranking.

    Plan: one query-partitioned rank window PER RUN (row_number with a
    doc-id tiebreak — deterministic), a union + one (query, doc)
    aggregate, one query-partitioned top-n window (WindowGroupLimit).
    Everything is query-partitioned — any corpus size.
    """
    if not runs:
        raise ValueError("need at least one run")
    if k < 1 or top_n < 1:
        raise ValueError(f"k and top_n must be >= 1, got k={k}, top_n={top_n}")
    ranked = []
    for run in runs:
        s = F.col(score_col).cast("double")
        w = Window.partitionBy("__q").orderBy(F.desc("__s"), F.asc("__d"))
        ranked.append(
            run.filter(s.isNotNull() & ~F.isnan(s))
            .select(
                F.col(query_col).alias("__q"),
                F.col(doc_col).alias("__d"),
                s.alias("__s"),
            )
            .withColumn("__rk", F.row_number().over(w))
            .select("__q", "__d", (1.0 / (F.lit(k) + F.col("__rk"))).alias("__c"))
        )
    allruns = ranked[0]
    for r in ranked[1:]:
        allruns = allruns.unionByName(r)
    fused = allruns.groupBy("__q", "__d").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum("__c").alias("__rrf"),
    )
    wf = Window.partitionBy("__q").orderBy(F.desc("__rrf"), F.asc("__d"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= top_n)
        .select(
            F.col("__q").alias(query_col),
            F.col("__d").alias(doc_col),
            "n_runs",
            F.round("__rrf", round_to).alias("rrf_score"),
            "fused_rank",
        )
    )
