"""Deduplication operators for large-scale text corpora.

Beyond the reference's surface (per BASELINE.json's north star): exact,
MinHash+LSH, SimHash and n-gram-Jaccard dedup as reusable DataFrame
transformations over a ``(id, text)`` corpus.

Scale design notes (the point of doing this in Spark):
- exact dedup is one hash aggregate — map-side partial combine, no sort;
- MinHash signatures are a single groupBy over exploded shingles (shuffle
  keyed by doc — size O(corpus tokens), the unavoidable lower bound);
- LSH banding turns all-pairs comparison into an equi-join on
  (band, band_key) — the only join is bucket-local, never O(n²); skewed
  buckets (boilerplate text) are handled by AQE skew-join + an optional
  bucket-size cap;
- SimHash is one aggregate with 64 bitplane sums, then Hamming-ball
  candidate pairs via band rotation (here: 4×16-bit bands).

Portable hashing: md5 (identical in every engine) instead of engine-native
hash functions, so results are reproducible across Spark/DuckDB/anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(id_col, F.split(F.lower(F.col(text_col)), r"\s+").alias("toks"))


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2) -> DataFrame:
    """(id, shingle) — distinct word n-grams per document."""
    t = _tokens(df, id_col, text_col).filter(F.size("toks") >= n)
    return t.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - {n}), "
                f"i -> concat_ws(' ', slice(toks, i + 1, {n})))"
            )
        ).alias("shingle"),
    ).distinct()


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS algorithm), set variant: hash every token k-gram, slide
    a w-hash window over the hash sequence, keep each window's minimum;
    the distinct minima are the document's fingerprints. The winnowing
    guarantee carries over: two documents sharing any token run of length
    ≥ w + k − 1 share at least one fingerprint, while the fingerprint
    density is ~2/(w+1) of the grams — the local-selection property that
    makes it robust where "every n-th gram" sampling is alignment-fragile.

    Scale shape: one posexplode + ONE doc-keyed window (the per-doc hash
    partition is the shuffle lower bound for position-aware selection) +
    a distinct. Gram hashes are md5-derived, so any engine replays them.
    """
    if k <= 0 or w <= 0:
        raise ValueError(f"k and w must be positive, got k={k} w={w}")
    t = _tokens(df, id_col, text_col).filter(F.size("toks") >= k + w - 1)
    grams = t.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}), "
                f"i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ).alias("pos", "gram"),
    ).select(
        id_col,
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint").alias("h"),
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    full = Window.partitionBy(id_col)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .withColumn("__ng", F.count("h").over(full))
        .filter(F.col("pos") <= F.col("__ng") - w)  # complete windows only
        .select(id_col, "fp")
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 100,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs by shared winnowing fingerprints:
    (doc_a < doc_b, n_shared). ``max_df`` drops fingerprints present in
    more than that many docs before the self-join — the boilerplate /
    skew guard that keeps a viral license-header fingerprint from creating
    a quadratic bucket (same role as LSH's ``max_bucket``).

    ``fingerprints`` accepts a previously persisted
    :func:`winnow_fingerprints` table (``id_col``, ``fp``) — the artifact a
    real MOSS pipeline stores once and joins against on every run (the
    same persisted-signature pattern as ``minhash_jaccard_estimate``);
    when omitted the table is computed here and pinned for this plan."""
    # fingerprints computed ONCE and pinned: the df-guard aggregate, its
    # semi-join, and both sides of the pair self-join otherwise repeat the
    # posexplode + doc-window + distinct subtree four times in one plan.
    # The fingerprint table is ~2/(w+1) hashes per gram — the artifact a
    # real MOSS pipeline persists anyway.
    fps = (
        fingerprints
        if fingerprints is not None
        else winnow_fingerprints(df, id_col, text_col, k, w).localCheckpoint()
    )
    if max_df is not None:
        freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        fps = fps.join(
            freq.filter(F.col("df") <= max_df).drop("df"), "fp", "left_semi"
        )
    a = fps.select(F.col(id_col).alias("doc_a"), "fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    window: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted Neighborhood Method blocking (Hernández & Stolfo, SIGMOD
    1995): order the corpus by a blocking key and emit each record paired
    with its ``window − 1`` successors — the classic entity-resolution
    candidate generator when records lack a clean equi-join key.

    Scale shape — global order WITHOUT a single-partition window: one
    range repartition by (key, id) + in-partition sort, per-partition
    ``row_number`` turned into a global position by adding per-partition
    offsets (one P-row collect of partition counts), then successors via
    an explode of j∈[1, window) and an equi-join on position — a hash
    join on an integer key, never a cartesian. Total order is (key, id),
    so positions (and pairs) are deterministic regardless of where the
    range sampler places partition boundaries.

    Returns (id_a, id_b, key_a, key_b, dist) with dist = position gap in
    [1, window).
    """
    if window < 2:
        raise ValueError(f"window must be ≥ 2, got {window}")
    keyed = (
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
        .repartitionByRange("key", "id")
        .sortWithinPartitions("key", "id")
        .withColumn("__pid", F.spark_partition_id())
    )
    keyed = keyed.localCheckpoint()  # pin partitioning; counted + reused below
    counts = {
        r["__pid"]: r["cnt"]
        for r in keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # flat offset lookup: element_at over one array literal indexed by pid —
    # an O(P)-deep WHEN chain here would be the Catalyst expression-depth
    # hazard nearest_centroid_column documents (blew up at ~1024 branches)
    n_parts = keyed.rdd.getNumPartitions()
    offsets, acc = [], 0
    for pid in range(n_parts):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    off_col = F.element_at(
        F.array(*[F.lit(o).cast("long") for o in offsets]), F.col("__pid") + 1
    )
    w_in = Window.partitionBy("__pid").orderBy("key", "id")
    pos = keyed.select(
        "id", "key", (F.row_number().over(w_in) - 1 + off_col).alias("pos")
    )
    left = pos.select(
        F.col("id").alias("id_a"),
        F.col("key").alias("key_a"),
        "pos",
        F.explode(F.array(*[F.lit(j) for j in range(1, window)])).alias("dist"),
    ).withColumn("__tgt", F.col("pos") + F.col("dist"))
    right = pos.select(
        F.col("id").alias("id_b"), F.col("key").alias("key_b"), F.col("pos").alias("__tgt")
    )
    return left.join(right, "__tgt").select("id_a", "id_b", "key_a", "key_b", "dist")


def _exact_fingerprint(text_col: str, normalize: bool):
    key = F.col(text_col)
    if normalize:
        key = F.regexp_replace(F.lower(key), r"\s+", " ")
    return F.md5(key)


def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    sample_ids: int = 0,
) -> DataFrame:
    """Exact dedup via hash-groupBy: (fingerprint, canonical_id, n_copies).

    Deliberately does NOT materialize the full id list per group: at corpus
    scale a viral duplicate (10⁷ copies of boilerplate) would put a
    10⁷-element array in one row and OOM the task. ``sample_ids=K`` adds a
    bounded ``id_sample`` column (first K ids in sort order); for the full
    id → canonical mapping use :func:`duplicate_mapping`, which is a join,
    not a per-group array."""
    aggs = [
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ]
    if sample_ids > 0:
        # bounded: collect_list is capped by slice AFTER sort, so worst-case
        # memory per group is O(group) during the agg — cap the sample small
        # and prefer duplicate_mapping for anything downstream
        aggs.append(
            F.slice(F.sort_array(F.collect_list(id_col)), 1, sample_ids).alias("id_sample")
        )
    # NULL text has a NULL fingerprint: groupBy would lump all contentless
    # docs into one phantom "duplicate group" that duplicate_mapping's
    # equi-join (NULL = NULL is never true) could then never resolve —
    # contentless docs are not copies of each other, so drop them here
    return (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(_exact_fingerprint(text_col, normalize).alias("fingerprint"))
        .agg(*aggs)
        .filter(F.col("n_copies") > 1)
    )


def dedup_stats(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Per-group duplication health report — the corpus-QA dashboard
    number every crawl ingest is monitored by (a source whose dup_ratio
    jumps is re-crawling itself; C4/RefinedWeb report exactly this per
    dump): documents, distinct contents, duplicate ratio.

    One hash aggregate: ``count_distinct`` over the same md5 fingerprint
    :func:`exact_duplicates` groups by (so the two agree by construction).
    The shuffle carries (group, fingerprint) partials — at 100 TB this is
    the same O(distinct) bound as exact dedup itself, with map-side
    partial aggregation collapsing each group's duplicates before the
    exchange. NULL-text docs are counted in ``n_docs`` but are not
    contents (consistent with exact_duplicates dropping them).

    Returns (group, n_docs, n_contents, n_dupes, dup_ratio) with
    dup_ratio = 1 - n_contents/n_docs_with_text, rounded to 6.
    """
    fp = _exact_fingerprint(text_col, normalize)
    withfp = df.select(F.col(group_col).alias("group"), F.col(id_col), fp.alias("__fp"))
    return (
        withfp.groupBy("group")
        .agg(
            F.count(id_col).alias("n_docs"),
            F.count_distinct("__fp").alias("n_contents"),
            (F.count("__fp") - F.count_distinct("__fp")).alias("n_dupes"),
            F.round(
                F.lit(1.0)
                - F.count_distinct("__fp")
                / F.when(F.count("__fp") > 0, F.count("__fp").cast("double")),
                6,
            ).alias("dup_ratio"),
        )
    )


def duplicate_mapping(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalize: bool = True
) -> DataFrame:
    """(id, canonical_id) for every NON-canonical duplicate — the drop list.

    Shaped as a fingerprint equi-join back to the corpus instead of a
    per-group array, so a group with 10⁷ members is 10⁷ ordinary rows
    spread across partitions, never one giant row."""
    groups = exact_duplicates(df, id_col, text_col, normalize).select(
        "fingerprint", "canonical_id"
    )
    fp = _exact_fingerprint(text_col, normalize)
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .join(groups, "fingerprint")
        .filter(F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "canonical_id")
    )


def _components_driver(edges: DataFrame) -> DataFrame:
    """Driver union-find over a collected edge list — the small-graph
    physical strategy (same dual-strategy pattern as ``operators/warp.py``'s
    small-grid fastpath). Labels are identical to the distributed loop's:
    each node gets the min id of its component."""
    spark = edges.sparkSession
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the representative IS the min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = sorted((n, find(n)) for n in parent)
    node_type = edges.schema["src"].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("component", node_type)]
    )
    if not out:
        return spark.createDataFrame([], schema)
    from stackstac_spark.session import local_df

    return local_df(spark, out, schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(node, component) labels over the near-duplicate pair graph — the
    clustering step that turns LSH candidate pairs into dedup groups
    (keep one doc per component).

    Algorithm: min-label propagation with pointer doubling. Each round every
    node takes the min label among {itself, its neighbors' labels, its
    label's label}; the last term (pointer jump) makes chains converge in
    O(log diameter) rounds instead of O(diameter) — near-dup graphs DO
    contain long chains (doc i ≈ doc i+1 ≈ ...), and at corpus scale each
    round costs a fixed number of shuffles, so rounds are the thing to
    minimize. Per round: two equi-joins + one hash agg; the only driver-side
    state is the convergence counter. ``max_iter`` bounds pathological
    graphs; hitting it raises rather than returning unconverged labels.

    Each round ends in ONE ``localCheckpoint()``: without truncation the
    logical plan doubles every round (the pointer jump is a self-join) and
    the driver OOMs on plan analysis long before the data is big. The
    intermediate ``l1`` is consumed twice within the round (both sides of
    the pointer-jump self-join) but is NOT checkpointed — the round-end
    checkpoint truncates it anyway, and AQE's exchange reuse covers the
    recompute. The convergence count is join-free — the old label travels
    as a column of the checkpointed result, so the check is one scan of
    cached partitions. Checking every round is deliberate: a skipped check
    costs a full extra propagation round (many stage jobs) to notice
    convergence, while the check itself is one cheap job. On a cluster
    where executor loss matters, swap for reliable ``checkpoint()`` with a
    checkpoint dir — same shape, durable lineage cut.

    Shuffle sizing: graphs small enough for the session default to be
    per-task overhead take the driver union-find fastpath instead (below
    ``driver_threshold`` edges); the loop therefore always runs at
    corpus-graph scale where the session's ``spark.sql.shuffle.partitions``
    is the right sizing, and never mutates session-global configuration.
    """
    e1 = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges_raw = e1.union(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    n_raw = edges_raw.count()

    # Dual physical strategy (the operators/warp.py small-grid precedent):
    # an LSH candidate graph is usually tiny relative to the corpus — the
    # iterative loop's ~10 fixed-cost jobs/round dwarf the work. Below the
    # threshold, collect the edges and run driver union-find (identical
    # min-label output, one job + one LocalRelation). Union-find tolerates
    # duplicate edges, so the common small-graph path skips the distinct
    # entirely — one less exchange + hash agg on the materialization path
    # (the r4 bench's dedup_components floor was exactly these fixed
    # costs). The raw (pre-distinct) count keeps the driver-collect
    # ceiling IDENTICAL to the distinct-count threshold for dup-free
    # input; a duplicate-heavy graph that overshoots it falls through to
    # the distinct below and gets a second, exact routing check — so
    # dup-heavy LSH pair lists still reach the fastpath, at the cost of
    # the same distinct the old code always paid. At 100 TB edge counts
    # are billions and neither branch triggers; `driver_threshold=0`
    # forces the distributed loop (the tests pin both paths).
    if n_raw <= driver_threshold:
        return _components_driver(edges_raw)

    # the loop wants distinct edges anyway (the per-round neighbor join is
    # sized by |E|, and LSH emits the same pair once per colliding band)
    edges = edges_raw.distinct().localCheckpoint()
    if edges.count() <= driver_threshold:
        return _components_driver(edges)

    # NOTE: graphs reaching the loop exceed driver_threshold edges, where
    # the session's shuffle-partition default is the right sizing. (An
    # earlier revision shrank spark.sql.shuffle.partitions for small
    # graphs — that mutated SESSION-GLOBAL state mid-loop, mis-sizing any
    # concurrent query on a shared session; the driver union-find fastpath
    # replaced that need entirely.)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("minl"))
            .withColumnRenamed("src", "node")
        )
        l1 = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce("minl", "label")).alias("label"),
        )
        # pointer doubling: follow my (new) label's label. This is a
        # self-join of l1, so both sides must be alias-qualified or Spark
        # rejects the plan as ambiguous.
        new_labels = (
            l1.alias("a")
            .join(
                l1.select("node", "label").alias("p"),
                F.col("a.label") == F.col("p.node"),
                "left",
            )
            .select(
                F.col("a.node").alias("node"),
                F.col("a.old").alias("old"),
                F.least(
                    F.col("a.label"), F.coalesce(F.col("p.label"), F.col("a.label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        labels = new_labels
        # join-free: old label is a column of the checkpointed result
        if new_labels.filter(F.col("label") != F.col("old")).count() == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 2,
) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature columns.

    hash_i(shingle) = md5(i ':' shingle); the signature entry is the
    lexicographic min — a valid min-wise hash family and bit-identical on
    any engine."""
    sh = shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    max_bucket: int | None = 1000,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    ``max_bucket`` drops degenerate buckets (e.g. empty-ish boilerplate that
    would otherwise produce quadratic pairs) — the documented guard for
    skew at 100 TB; dropped buckets should be handled by a dedicated
    boilerplate rule instead. ``sig_df`` supplies a precomputed (usually
    persisted) signature table so a pipeline that also scores candidates
    computes the signatures ONCE (minhash_jaccard_estimate does this).
    """
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}); trailing "
            "hashes would be silently dropped, shifting the LSH S-curve"
        )
    rows_per_band = num_hashes // bands
    sig = sig_df if sig_df is not None else minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_n
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("key"),
        )
        for b in range(bands)
    ]
    # materialize the banded signature table once (optimization r12): the
    # bucket-size aggregate, the semi-join, and BOTH sides of the pair
    # self-join would otherwise each re-execute the signature pipeline
    # (tokenize + explode + per-doc min-hash aggregate — the operator's
    # dominant cost, ~4 evaluations). The table is docs × bands rows —
    # far smaller than the shingle stream it derives from.
    banded = sig.select(id_col, F.explode(F.array(*band_structs)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    ).localCheckpoint()  # EAGER (second pass): the bucket-size aggregate and
    # the semi-join probe are concurrent branches of one job — a lazy cache
    # lets them race and re-run the signature pipeline before it fills
    if max_bucket is not None:
        sizes = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bn"))
        banded = banded.join(
            sizes.filter(F.col("bn") <= max_bucket).drop("bn"), ["band", "key"], "left_semi"
        ).localCheckpoint()  # feeds both sides of the pair self-join (eager —
        # same race argument)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
    max_bucket: int | None = 1000,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """Estimated Jaccard similarity for LSH candidate pairs (Broder 1997:
    P[minhash agrees] = J(A,B), so the fraction of agreeing signature
    components is an unbiased estimate with σ = √(J(1−J)/k)) — the cheap
    scoring step between LSH candidate generation and an exact verify,
    which at 100 TB prunes most candidates without touching shingle sets.

    Returns (id_a, id_b, est_jaccard). Plan: LSH candidates (bucket join)
    + two id-keyed hash joins against the signature table — never touches
    the shingle sets of a pair.

    ``sig_df``: a precomputed ``minhash_signatures(df, id_col, text_col,
    num_hashes, shingle_n)`` table. Real pipelines persist signatures once
    and score many candidate batches against them; pass that table here to
    skip the per-call signature job (the caller owns its persistence —
    no localCheckpoint is taken on a provided table).
    """
    # validate BEFORE the eager signature job below — a bad bands value
    # must not cost a full corpus scan before raising
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}); trailing "
            "hashes would be silently dropped, shifting the LSH S-curve"
        )
    # signatures computed ONCE and pinned: the candidate join and both
    # scoring joins share the same table — without the checkpoint the
    # shingle-explode + k-hash aggregate subtree appears three times in
    # the plan. Signatures are k fixed-width hashes per doc (a ~1e-4
    # fraction of the corpus), the table every real pipeline persists.
    if sig_df is not None:
        sig = sig_df
    else:
        sig = minhash_signatures(
            df, id_col, text_col, num_hashes, shingle_n
        ).localCheckpoint()
    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_n, max_bucket, sig_df=sig
    )
    a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"__a{i}") for i in range(num_hashes)],
    )
    b = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"__b{i}") for i in range(num_hashes)],
    )
    agree = sum(
        (F.col(f"__a{i}") == F.col(f"__b{i}")).cast("int") for i in range(num_hashes)
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
    )


def span_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """Exact-substring duplication signal (the ExactSubstr family from
    "Deduplicating Training Data Makes Language Models Better", Lee et al.
    2022): per document, the fraction of word tokens covered by at least one
    length-``k`` token window that also appears verbatim in ANOTHER document.

    Returns (id, n_tokens, n_dup_tokens, dup_frac) for every input doc; docs
    shorter than ``k`` tokens score 0.

    Scale shape: the window table is computed ONCE and shuffles ONCE, keyed
    on a 128-bit md5 of the window text (32 hex chars regardless of k — the
    k-token string never crosses the wire); "window appears in >=2 docs" is
    min(doc) != max(doc) over that one hash partition — a Window aggregate,
    not a groupBy + join-back, so the corpus-scale explode subtree is never
    evaluated twice (an aggregate+semi-join formulation re-scans and
    re-explodes the corpus on the join side). The k-times coverage explode
    runs only on windows already known to be duplicated — clean corpora pay
    nearly nothing. Interval union is exact via distinct (doc, position),
    not an approximation.
    """
    from pyspark.sql import Window

    toks = df.select(id_col, F.split(F.lower(F.col(text_col)), " ").alias("t"))
    base = toks.select(id_col, F.size("t").alias("n_tokens"))
    wins = toks.filter(F.size("t") >= k).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) - {k}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {k}))))"
            )
        ).alias("pos", "gh"),
    )
    w_gh = Window.partitionBy("gh")
    cov = (
        wins.withColumn("__dup", F.min(id_col).over(w_gh) != F.max(id_col).over(w_gh))
        .filter(F.col("__dup"))
        .select(id_col, F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("p"))
        .distinct()
    )
    per_doc = cov.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_tokens"))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_tokens", F.lit(0)).alias("n_dup_tokens"),
        F.round(
            F.coalesce("n_dup_tokens", F.lit(0)) / F.greatest("n_tokens", F.lit(1)), 6
        ).alias("dup_frac"),
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 16,
    delim: str | None = None,
    join_delim: str = " ",
) -> DataFrame:
    """C4-style global paragraph dedup (Raffel et al. 2020 §2.2: discard all
    but one occurrence of any three-sentence span corpus-wide): split every
    document into paragraphs, keep only the globally-FIRST occurrence of each
    distinct paragraph (first = smallest ``(doc_id, position)``), and
    reassemble the surviving paragraphs in document order.

    ``delim`` splits on a literal delimiter (``"\\n\\n"`` for real corpora);
    ``delim=None`` falls back to fixed non-overlapping ``block_tokens``-token
    blocks (the synthetic corpus has no paragraph structure). Surviving
    blocks are rejoined with ``join_delim`` (default single space — right
    for token blocks; for paragraph mode pass the structural separator,
    e.g. ``join_delim="\\n\\n"``, so paragraph boundaries survive the
    round-trip — ``delim`` is a REGEX, so it cannot double as the joiner).
    Returns one row per input doc: (id, n_blocks, n_kept, clean_text) —
    ``clean_text`` is ``''`` when every block already appeared earlier.

    Scale shape: exactly two shuffles — one keyed on the 128-bit paragraph
    hash (a Window min-aggregate decides the global first occurrence; the
    paragraph text itself never needs to leave its partition twice), one
    keyed on doc id for the ordered reassembly (``array_sort`` over
    (pos, block) structs — no driver collect, no per-corpus array). At
    100 TB the hash shuffle is the unavoidable lower bound of global dedup;
    viral paragraphs (10⁷ copies of boilerplate) are 10⁷ rows spread across
    the hash partition's tasks, never one giant group, because the winner is
    a min-aggregate, not a collected list.
    """
    from pyspark.sql import Window

    if delim is not None:
        # delim is a Java regex (e.g. r"\n\n")
        blocks = df.select(
            id_col, F.posexplode(F.split(F.col(text_col), delim, -1)).alias("pos", "block")
        )
    else:
        bt = int(block_tokens)
        blocks = df.select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST(ceil(size(split({text_col}, ' ')) / {bt}.0) AS INT) - 1), "
                    f"i -> concat_ws(' ', slice(split({text_col}, ' '), i * {bt} + 1, {bt})))"
                )
            ).alias("pos", "block"),
        )
    w = Window.partitionBy(F.md5("block"))
    first = F.min(F.struct(F.col(id_col), F.col("pos"))).over(w)
    flagged = blocks.withColumn(
        "__keep",
        (F.col(f"{id_col}") == first[id_col]) & (F.col("pos") == first["pos"]),
    )
    # single pass: dropped blocks still flow to the doc-keyed aggregate (so
    # fully-deduped docs keep their row with n_kept=0) — no base/join-back,
    # exactly two exchanges: block-hash window + doc-keyed agg
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort("
                "collect_list(CASE WHEN __keep THEN struct(pos, block) END)"
                "), x -> x.block)"
            ),
            join_delim,
        ).alias("clean_text"),
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    block_tokens: int = 16,
    delim: str | None = None,
    join_delim: str = " ",
) -> DataFrame:
    """Global boilerplate removal by document frequency — the C4/RefinedWeb
    line-cleaning rule (Raffel et al. 2020 §2.2 drops any line occurring
    ≥3 times corpus-wide; Penedo et al. 2023 §3.2 the same per dump):
    remove every block that appears in ``min_df`` or more DISTINCT
    documents, from ALL of them. Complements :func:`paragraph_dedup`,
    which keeps the first occurrence — navigation chrome and cookie
    banners should survive nowhere, not once.

    ``delim`` splits on a regex (``r"\\n"`` for real line-based corpora);
    ``delim=None`` uses fixed ``block_tokens``-token blocks (the synthetic
    corpus has no line structure). Returns one row per input doc:
    (id, n_blocks, n_kept, clean_text).

    Scale shape: three co-keyed exchanges — block-hash aggregate for the
    per-block distinct-doc count (the stats side is distinct-block-sized,
    a doc-frequency table, NOT the corpus), a hash-keyed join of blocks
    to their df (reuses the same key), and the doc-keyed ordered
    reassembly. A viral block (10⁷ copies) is one stats row and 10⁷
    independently-partitioned block rows — no per-group collection
    anywhere except the per-DOC reassembly, which is document-sized.
    """
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if delim is not None:
        blocks = df.select(
            id_col, F.posexplode(F.split(F.col(text_col), delim, -1)).alias("pos", "block")
        )
    else:
        bt = int(block_tokens)
        blocks = df.select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST(ceil(size(split({text_col}, ' ')) / {bt}.0) AS INT) - 1), "
                    f"i -> concat_ws(' ', slice(split({text_col}, ' '), i * {bt} + 1, {bt})))"
                )
            ).alias("pos", "block"),
        )
    blocks = blocks.withColumn("__h", F.md5("block"))
    stats = blocks.groupBy("__h").agg(F.count_distinct(F.col(id_col)).alias("__df"))
    flagged = blocks.join(stats, "__h").withColumn("__keep", F.col("__df") < min_df)
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort("
                "collect_list(CASE WHEN __keep THEN struct(pos, block) END)"
                "), x -> x.block)"
            ),
            join_delim,
        ).alias("clean_text"),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 8,
) -> DataFrame:
    """Content-defined chunking + chunk-level duplication signal: cut each
    document into variable-size chunks at CONTENT-derived boundaries (after
    any token whose hash ≡ 0 mod ``boundary_mod`` — the Rabin/gear-hash CDC
    family used by storage dedup and incremental corpus diffing), then score
    each doc by the fraction of its chunks that also appear verbatim in
    another document.

    Unlike fixed blocks (:func:`paragraph_dedup`) or sliding windows
    (:func:`span_dedup`), CDC boundaries are *shift-robust*: inserting one
    token early in a doc moves every fixed-block boundary but only the one
    CDC chunk containing the edit — so near-identical docs still share most
    chunk hashes. Expected chunk length is ``boundary_mod`` tokens.

    Returns (id, n_chunks, n_dup_chunks, dup_frac). Scale shape: one
    per-doc window cumsum (shuffle keyed by doc id) to number chunks, one
    groupBy (doc, chunk) that stays in the same partitioning, then the
    cross-doc signal is a Window min≠max over the chunk-hash partition —
    the same single-shuffle shape as :func:`span_dedup`, never a self-join.
    """
    from pyspark.sql import Window

    toks = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    # boundary AFTER token i when md5's last nibble ≡ 0 (mod boundary_mod ≤ 16);
    # chunk index = number of boundaries strictly before this token
    bflag = (
        F.instr(F.lit("0123456789abcdef"), F.substring(F.md5("tok"), 32, 1)) - 1
    ) % boundary_mod == 0
    w_doc = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = toks.withColumn(
        "chunk", F.coalesce(F.sum(bflag.cast("int")).over(w_doc), F.lit(0))
    )
    chunks = chunked.groupBy(id_col, "chunk").agg(
        F.md5(F.concat_ws(" ", F.expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))).alias("ch")
    )
    w_ch = Window.partitionBy("ch")
    dup = chunks.withColumn(
        "__dup", F.min(id_col).over(w_ch) != F.max(id_col).over(w_ch)
    )
    return dup.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("__dup").cast("int")).alias("n_dup_chunks"),
        F.round(
            F.sum(F.col("__dup").cast("int")) / F.count(F.lit(1)), 6
        ).alias("dup_frac"),
    )


def jaccard_similarity(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate ``pairs`` (id_a, id_b) — or all
    shingle-sharing pairs when pairs is None (verification stage after LSH;
    never run pairless at full scale)."""
    # materialized once: the size aggregate and both self-join sides would
    # otherwise each re-run tokenize + explode + distinct (optimization
    # r12). EAGER (second pass): the consumers are concurrent branches of
    # one job, so a lazy cache lets them race and recompute the pipeline
    # before it fills.
    sh = shingles(df, id_col, text_col, shingle_n).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    if pairs is not None:
        # prune BOTH shingle sides to candidate docs BEFORE the co-shingle
        # self-join: a post-join semi-join on (id_a, id_b) references both
        # sides, so Catalyst cannot push it down and the quadratic
        # all-pairs work would run anyway — defeating the LSH stage
        a = a.join(pairs.select("id_a").distinct(), "id_a", "left_semi")
        b = b.join(pairs.select("id_b").distinct(), "id_b", "left_semi")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if pairs is not None:
        # exact pair filter still applies (doc-level pruning is a superset)
        inter = inter.join(pairs, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, simhash) — ``bits``-bit SimHash over word tokens (frequency-
    weighted), bits drawn from md5 nibbles. One explode + one aggregate."""
    toks = df.select(id_col, F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"))
    toks = toks.withColumn("h", F.md5("tok"))
    nib = lambda p: F.instr(F.lit("0123456789abcdef"), F.substring("h", p, 1)) - 1  # noqa: E731
    bit_sums = [
        F.sum(
            (F.shiftright(nib(b // 4 + 1), 3 - b % 4).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*bit_sums)
    fp = None
    for b in range(bits):
        # bit 63 is the sign bit of a long: its weight is -(2^63) in two's
        # complement (1 << 63 overflows a signed literal)
        weight = -(1 << 63) if b == 63 else (1 << b)
        term = F.when(F.col(f"s{b}") > 0, F.lit(weight)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(id_col, fp.cast("long").alias("simhash"))


def simhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64, bands: int = 4
) -> DataFrame:
    """Hamming-near pairs by banding the simhash: two docs within
    (bands-1)-bit Hamming distance share at least one identical band."""
    bw = bits // bands
    sh = simhash(df, id_col, text_col, bits)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * bw).bitwiseAND(F.lit((1 << bw) - 1)).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sh.select(id_col, "simhash", F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )


def canonical_docs(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    score_col: str | None = None,
    node_col: str = "node",
    comp_col: str = "component",
) -> DataFrame:
    """Final dedup stage: pick ONE representative per near-duplicate cluster
    and emit the full keep/drop mapping — (id, cluster, canonical_id,
    is_canonical) for every input doc. ``components`` is the
    (node, component) labeling from :func:`connected_components`; docs absent
    from the pair graph are singleton clusters and their own canonical.
    Canonical = highest ``score_col`` (e.g. a quality score or length),
    tie-broken by smallest id; ``score_col=None`` keeps the smallest id.

    Scale shape: one id-keyed equi-join (the components table holds only
    docs that belong to some cluster — usually a small fraction of the
    corpus, so AQE broadcasts it) and one per-cluster window. No
    per-cluster arrays, no driver collect; output rows == input rows.
    """
    from pyspark.sql import Window

    labeled = docs.join(
        components.select(
            F.col(node_col).alias(id_col), F.col(comp_col).alias("__comp")
        ),
        id_col,
        "left",
    ).select(
        id_col,
        *( [F.col(score_col)] if score_col else [] ),
        F.coalesce("__comp", F.col(id_col)).alias("cluster"),
    )
    order = (
        [F.desc(score_col), F.asc(id_col)] if score_col else [F.asc(id_col)]
    )
    w = Window.partitionBy("cluster").orderBy(*order)
    with_canon = labeled.withColumn("canonical_id", F.first(id_col).over(w))
    return with_canon.select(
        id_col,
        "cluster",
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    )


def incremental_dedup(
    batch: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Incremental exact dedup of a NEW batch against a persistent
    fingerprint ``store`` — the shape of a daily crawl increment: the corpus
    already ingested lives as a (bucketed) fingerprint table; each new batch
    is checked against it AND against itself, never re-scanning the corpus.

    Returns (id, fingerprint, status) for every batch row, with
    ``status`` ∈ {'dup_of_store', 'dup_in_batch', 'new'} (store precedence:
    a doc that matches the store is 'dup_of_store' even if also duplicated
    within the batch; within-batch the smallest id is the 'new' one).
    The 'new' rows' fingerprints are what the caller appends to the store.

    Scale shape: one fingerprint-keyed window over the BATCH (small — one
    increment) + one equi-join against the store on the fingerprint key.
    With the store bucketed by fingerprint (``sources/sinks.py``) the join
    is co-located and shuffle-free on the store side; at extreme scale put
    a bloom filter of store fingerprints in front (the join then touches
    only probable-duplicate rows) — the exact join stays as the confirm
    step, so the result is still exact.
    """
    from pyspark.sql import Window

    fp = _exact_fingerprint(text_col, normalize)
    w = Window.partitionBy("fingerprint")
    b = batch.select(F.col(id_col), fp.alias("fingerprint")).withColumn(
        "__min_id", F.min(id_col).over(w)
    )
    seen = store.select("fingerprint").distinct().withColumn("__seen", F.lit(True))
    status = (
        F.when(F.col("__seen"), "dup_of_store")
        .when(F.col(id_col) != F.col("__min_id"), "dup_in_batch")
        .otherwise("new")
    )
    return (
        b.join(seen, "fingerprint", "left")
        .select(id_col, "fingerprint", status.alias("status"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    threshold: float = 0.8,
    max_shingle_docs: int | None = 1000,
) -> DataFrame:
    """Shingle-CONTAINMENT near-duplicate pairs — catches a document whose
    shingle set is mostly a subset of another's (quote pages, snippet
    scrapes, partial mirrors), which symmetric Jaccard structurally misses:
    a 50-word snippet inside a 500-word page has containment ≈ 1.0 but
    Jaccard ≈ 0.1, below any sane dedup threshold (Broder 1997 defines both
    resemblance AND containment for exactly this reason).

    Emits each unordered pair once: (id_a < id_b, inter, c_a_in_b =
    |A∩B|/|A|, c_b_in_a = |A∩B|/|B|), kept when max(c1, c2) ≥ threshold.
    Ratios are raw IEEE division — oracle-replayable bit-for-bit.

    Scale shape: pair generation is the co-shingle equi-join (shingle-keyed
    shuffle, never an all-pairs product). ``max_shingle_docs`` drops
    shingles appearing in more documents than the cap BEFORE the join —
    the boilerplate guard that keeps a hyper-common shingle ("click here
    to") from emitting a quadratic bucket, same spirit as
    ``minhash_lsh_candidates``'s ``max_bucket``; genuinely boilerplate-
    dominated corpora should run ``boilerplate_lines`` first. Sizes join
    back by doc id (two hash joins on the already-aggregated pair list).
    """
    # materialize the shingle table once (optimization r12): the size
    # aggregate, the df aggregate, and BOTH sides of the co-shingle
    # self-join would otherwise each re-execute tokenize + explode +
    # distinct (4 full corpus scans + 4 distinct exchanges). One
    # evaluation, cheap re-reads (guide §1.2 / §2.4). EAGER (second pass):
    # the consumers are concurrent branches of one job — a lazy cache lets
    # them race and recompute the pipeline before it fills.
    sh = shingles(df, id_col, text_col, shingle_n).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    if max_shingle_docs is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        # the filtered stream feeds both join sides: checkpoint it too, so
        # the semi-join runs once instead of twice (eager — same race
        # argument as above)
        sh = sh.join(
            freq.filter(F.col("df") <= max_shingle_docs).drop("df"),
            "shingle",
            "left_semi",
        ).localCheckpoint()
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("inter") / F.col("na")).alias("c_a_in_b"),
            (F.col("inter") / F.col("nb")).alias("c_b_in_a"),
        )
        .filter(F.greatest("c_a_in_b", "c_b_in_a") >= threshold)
    )


def cross_lsh_matches(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    ref_id_col: str = "ref_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
    min_est_jaccard: float = 0.0,
    broadcast_reference: bool = True,
) -> DataFrame:
    """Fuzzy CROSS-corpus matches: corpus documents whose MinHash signature
    collides with a REFERENCE set (eval benchmarks, a blocklist of known
    texts, an already-trained corpus) in ≥1 LSH band — decontamination by
    near-duplicate rather than exact 13-gram overlap (the fuzzy
    complement to ``textstats.ngram_contamination``; Brown et al. 2020
    dedup eval sets against training data exactly this way).

    Returns (id, ref_id, est_jaccard) where est_jaccard = fraction of the
    ``num_hashes`` signature entries that agree (the unbiased MinHash
    estimator), filtered to ≥ ``min_est_jaccard``.

    Scale shape: signatures are computed per side (shingle-keyed agg);
    the band join is corpus × reference on (band, key). The reference set
    is a dimension table by construction (eval suites are thousands of
    docs, the corpus is billions) — ``broadcast_reference`` pins a
    broadcast hash join so NO corpus-side shuffle happens at all: banding
    is a map-side explode and the collision check is a map-side probe.
    The estimator join back to the two signature tables is id-keyed.
    """
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    # each signature table feeds its banded view AND the estimator join —
    # materialize so the per-side shingle + min-hash pipeline runs once
    # per side instead of twice (optimization r12). EAGER (second pass):
    # both consumers sit in one job, so a lazy cache lets the branches
    # race and recompute the pipeline before it fills.
    sig_c = minhash_signatures(
        corpus, id_col, text_col, num_hashes, shingle_n
    ).localCheckpoint()
    sig_r = minhash_signatures(
        reference, ref_id_col, text_col, num_hashes, shingle_n
    ).localCheckpoint()

    def _banded(sig: DataFrame, key: str) -> DataFrame:
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
        return sig.select(key, F.explode(F.array(*band_structs)).alias("bk")).select(
            key, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )

    bc = _banded(sig_c, id_col)
    br = _banded(sig_r, ref_id_col)
    if broadcast_reference:
        br = F.broadcast(br)
    cand = (
        bc.join(br, ["band", "key"])
        .select(id_col, ref_id_col)
        .distinct()
    )
    agree = sum(
        F.when(F.col(f"c.h{i}") == F.col(f"r.h{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        cand.join(sig_c.alias("c"), id_col)
        .join(
            F.broadcast(sig_r.alias("r")) if broadcast_reference else sig_r.alias("r"),
            ref_id_col,
        )
        .select(
            id_col,
            ref_id_col,
            (agree / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


def pair_confusion(
    detected: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """One-row confusion summary of a pair detector against ground-truth
    pairs: (n_truth, n_detected, tp, fp, fn, precision, recall) — the
    evaluation harness for any candidate generator (LSH banding, SimHash,
    winnowing, blocking keys), e.g. for tuning (bands, rows) against a
    planted-duplicates sample before committing to a full-corpus run.

    Both inputs are canonicalized to unordered distinct pairs first, so
    orientation and emission multiplicity don't skew the counts. Shape:
    two distincts + one full outer join on the pair key + one global agg —
    everything pair-keyed; the output is a single row. Ratios are raw
    IEEE division (bit-exact for the oracle); an empty side yields NULL
    precision/recall rather than a fake 0.0.
    """
    def _canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("pa"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("pb"),
        ).distinct()

    d = _canon(detected).withColumn("is_d", F.lit(1))
    t = _canon(truth).withColumn("is_t", F.lit(1))
    joined = d.join(t, ["pa", "pb"], "full_outer")
    return joined.agg(
        F.coalesce(F.sum("is_t"), F.lit(0)).alias("n_truth"),
        F.coalesce(F.sum("is_d"), F.lit(0)).alias("n_detected"),
        F.coalesce(F.sum(F.col("is_d") * F.col("is_t")), F.lit(0)).alias("tp"),
    ).select(
        "n_truth",
        "n_detected",
        "tp",
        (F.col("n_detected") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        (F.col("tp") / F.col("n_detected")).alias("precision"),
        (F.col("tp") / F.col("n_truth")).alias("recall"),
    )


def lsh_tuning_curve(
    df: DataFrame,
    truth_pairs: DataFrame,
    num_hashes: int = 8,
    configs: tuple[tuple[int, int], ...] = ((8, 1), (4, 2), (2, 4)),
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Empirical vs analytic LSH detection rates per (bands, rows) config
    over labeled ground-truth pairs — the S-curve tuner run before
    committing a (b, r) choice to a full-corpus dedup pass (Leskovec/
    Rajaraman/Ullman ch. 3: P(detect | jaccard j) = 1 − (1 − j^r)^b).

    For each config sharing ONE ``num_hashes``-entry signature table
    (b · r must equal num_hashes for every config — signatures are the
    expensive artifact; the whole point is re-slicing them instead of
    re-hashing), each truth pair is scored
    detected = OR over bands of (all r signature entries agree), bucketed
    by its EXACT shingle Jaccard (floor(j·10), an integer key — no float
    group-by), and aggregated to (config, sim_bucket, n_pairs, n_detected,
    emp_rate, mean_analytic) where mean_analytic averages the closed-form
    curve at each pair's exact j.

    Scale shape: one signature agg + one exact-Jaccard pass RESTRICTED to
    the labeled pairs (id-keyed semi-joins — the label set is a sample,
    never the corpus), two id-keyed joins to attach signatures, then a
    per-config map + one small agg. Nothing pairwise beyond the labels.
    """
    for b, r in configs:
        if b * r != num_hashes:
            raise ValueError(
                f"config ({b},{r}): b*r must equal num_hashes ({num_hashes}) "
                "so every config re-slices the same signature table"
            )
    # EAGER materialization (optimization r12, second pass): both join
    # sides below consume the signature table concurrently inside one job —
    # the corpus-wide shingle + min-hash aggregate runs exactly once.
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n).localCheckpoint()
    sa = sig.select(
        F.col(id_col).alias("id_a"), *[F.col(f"h{i}").alias(f"ha{i}") for i in range(num_hashes)]
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"), *[F.col(f"h{i}").alias(f"hb{i}") for i in range(num_hashes)]
    )
    jac = jaccard_similarity(
        df, pairs=truth_pairs, id_col=id_col, text_col=text_col, shingle_n=shingle_n
    )
    base = (
        truth_pairs.select("id_a", "id_b")
        .join(jac, ["id_a", "id_b"])
        .join(sa, "id_a")
        .join(sb, "id_b")
    )
    # one pass over the labeled pairs for ALL configs (optimization r12,
    # second pass): each config's (detected, analytic) is a struct in a
    # per-row array that one explode fans out — same row multiset as the
    # previous union-of-3-selects, but the signature + exact-Jaccard
    # pipeline is a SINGLE consumer subtree now, so no checkpoint (and no
    # chance of the union branches racing to re-evaluate it inside one
    # job). The plan shrinks ~3×.
    cfg_structs = []
    for b, r in configs:
        band_ok = [
            _all_of([F.col(f"ha{bi * r + k}") == F.col(f"hb{bi * r + k}") for k in range(r)])
            for bi in range(b)
        ]
        detected = F.when(_any_of(band_ok), 1).otherwise(0)
        j = F.col("jaccard")
        analytic = 1.0 - F.pow(1.0 - F.pow(j, F.lit(float(r))), F.lit(float(b)))
        cfg_structs.append(
            F.struct(
                F.lit(f"b{b}r{r}").alias("config"),
                detected.alias("det"),
                analytic.alias("analytic"),
            )
        )
    allc = base.select(
        F.floor(F.col("jaccard") * 10).cast("int").alias("sim_bucket"),
        F.explode(F.array(*cfg_structs)).alias("__cfg"),
    ).select(
        F.col("__cfg.config").alias("config"),
        "sim_bucket",
        F.col("__cfg.det").alias("det"),
        F.col("__cfg.analytic").alias("analytic"),
    )
    return allc.groupBy("config", "sim_bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("det").alias("n_detected"),
        (F.sum("det") / F.count(F.lit(1))).alias("emp_rate"),
        F.round(F.avg("analytic"), round_to).alias("mean_analytic"),
    )


def _all_of(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _any_of(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def prefix_filter_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
) -> DataFrame:
    """Exact set-similarity join with PREFIX FILTERING (PPJoin family:
    Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008) — all pairs with token
    Jaccard ≥ ``threshold``, generating candidates from only each
    document's PREFIX instead of all its tokens.

    The pruning theorem: order every document's distinct tokens by one
    GLOBAL order (ascending document frequency, rarest first — ties by
    token); if Jaccard(A, B) ≥ t then A and B must share a token within
    the first ⌊(1−t)·|A|⌋ + 1 tokens of A's ordering (otherwise the
    overlap can't reach t·|A| even if everything after matches). So the
    inverted index is built over prefixes only — at t = 0.8 that's ~20% of
    each doc's tokens, and the rarest 20% at that: the candidate join's
    fan-out collapses from quadratic-in-df(common words) to near-linear,
    which is the difference between APSS running and not at corpus scale.
    The survivors are verified with the exact full-set Jaccard, so the
    result is EXACT — the filter only skips pairs it can prove are below
    t (contrast MinHash-LSH, which trades exactness for probability).

    Plan: one token-df aggregate, one per-doc window for the global-order
    rank (doc-keyed), the prefix equi-join, the SIZE filter (the second
    SSJoin prune: Jaccard ≥ t forces t·|A| ≤ |B| ≤ |A|/t, applied before
    any verify work), then a pair-keyed verify that joins each candidate
    pair to the two docs' sorted element ARRAYS and intersects per pair —
    NOT a second corpus-wide co-token join, whose fan-out on shared-rare-
    element candidates would reintroduce the very quadratic the prefix
    filter removed (measured 10× on the sf0.1 gate). Element arrays are
    bounded by a single document's distinct-element count — document-
    sized, not corpus-sized rows. Returns (id_a < id_b, inter, jaccard).

    ``shingle_n > 1`` uses word n-grams as the set elements instead of
    unigrams — on small-vocabulary corpora unigram SETS of different docs
    are near-identical (every doc contains most of the vocabulary), which
    both inflates the result and defeats the prefix prune; n-gram element
    spaces are quadratically larger and behave like real-corpus sets.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from pyspark.sql import Window

    if shingle_n > 1:
        toks = shingles(df, id_col, text_col, shingle_n).withColumnRenamed(
            "shingle", "tok"
        )
    else:
        toks = df.select(
            F.col(id_col),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
            ).alias("tok"),
        ).distinct()
    # materialize the element table once (optimization r12): its consumers
    # — the df aggregate, the global-order rank join, the size aggregate,
    # and the verify-array build — would otherwise each re-execute the
    # tokenize + explode + distinct pipeline (a full corpus scan plus the
    # distinct's exchange, ~7 evaluations total counting both sides of the
    # candidate self-join). Guide §1.2: don't compute things you throw
    # away; §2.4: share the exchange. One evaluation, many cheap re-reads.
    # EAGER (second pass): the consumers are concurrent branches of one
    # job — a lazy cache lets them race and recompute the pipeline.
    toks = toks.localCheckpoint()
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(dfreq, "tok").withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy("df", "tok")
        ),
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    with_n = ranked.join(sizes, id_col)
    # prefix length p = n − ⌈t·n − ε⌉ + 1. NOT ⌊(1−t)·n⌋+1: (1−t) rounds
    # DOWN in binary for t = 0.8 (0.19999999999999996), so ⌊(1−t)·n⌋ loses
    # a whole element exactly when t·n is an integer — the prefix comes up
    # one short and the "exact" join silently misses boundary pairs (found
    # by the oracle diff: a J = 0.8 pair with disjoint too-short prefixes).
    # The ε (1e-9, far above double error ~1e-15, far below the 1/n gap
    # between legal thresholds) makes the ceil conservative under either
    # rounding direction — a too-LONG prefix only costs candidates, never
    # correctness.
    prefix = with_n.filter(
        F.col("__r")
        <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)) + 1
    ).select(id_col, "tok")
    # both sides of the candidate self-join consume `prefix`; without this
    # the rank window + two joins above run twice (optimization r12). The
    # prefix table is the SMALL proxy (~(1−t) of the distinct elements,
    # the rarest ones at that), so this is the cheap side to materialize.
    # EAGER (second pass): the self-join sides are concurrent in one job.
    prefix = prefix.localCheckpoint()
    a = prefix.select(F.col(id_col).alias("id_a"), "tok")
    b = prefix.select(F.col(id_col).alias("id_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    arrs = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_list("tok")).alias("elems"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = arrs.select(
        F.col(id_col).alias("id_a"), F.col("elems").alias("ea"), F.col("n").alias("na")
    )
    ab = arrs.select(
        F.col(id_col).alias("id_b"), F.col("elems").alias("eb"), F.col("n").alias("nb")
    )
    paired = (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        # size filter: J ≥ t ⇒ min(|A|,|B|)/max(|A|,|B|) ≥ t. Division form,
        # NOT `nb >= t*na`: t·na rounds UP for most na (0.8 isn't binary-
        # exact), silently dropping exact-boundary pairs (min/max == t),
        # while the ratio division rounds to the same double the verify's
        # Jaccard division does — boundary-consistent by construction.
        .filter(
            (F.least("na", "nb") / F.greatest("na", "nb")) >= threshold
        )
    )
    inter = F.size(F.array_intersect("ea", "eb")).cast("long")
    return (
        paired.select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            (inter / (F.col("na") + F.col("nb") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def capture_recapture(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Chapman capture-recapture population estimate from two overlapping
    samples (Chapman 1951, the bias-corrected Lincoln-Petersen) → one row
    (n_a, n_b, n_both, n_hat, se_hat):

        N̂  = (n_a + 1)(n_b + 1)/(m + 1) − 1        (m = |A ∩ B|)
        SE = √[(n_a+1)(n_b+1)(n_a−m)(n_b−m) / ((m+1)²(m+2))]

    over DISTINCT keys per sample. The "how big is the web corpus we
    can't enumerate?" estimator: two independent crawls (or two hash
    partitions of a feed) act as the two captures, their key overlap
    calibrates total population — the same trick ecologists use on fish.
    Assumes independent samples with equal catchability; correlated
    crawls bias N̂ low. NULL estimate when either sample is empty.

    Plan: two distinct projections, one equi-join for the overlap, three
    scalar counts — no window, no Python, linear in keys.
    """
    a = df_a.select(F.col(key_col).alias("__key")).filter(
        F.col("__key").isNotNull()
    ).distinct().localCheckpoint()
    b = df_b.select(F.col(key_col).alias("__key")).filter(
        F.col("__key").isNotNull()
    ).distinct().localCheckpoint()
    n_a = a.count()
    n_b = b.count()
    m = a.join(b, "__key").count()
    spark = df_a.sparkSession
    if n_a == 0 or n_b == 0:
        n_hat = None
        se = None
    else:
        n_hat = round((n_a + 1) * (n_b + 1) / (m + 1) - 1, round_to)
        var = (
            (n_a + 1) * (n_b + 1) * (n_a - m) * (n_b - m)
            / ((m + 1) ** 2 * (m + 2))
        )
        se = round(var**0.5, round_to)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n_a", T.LongType()),
            T.StructField("n_b", T.LongType()),
            T.StructField("n_both", T.LongType()),
            T.StructField("n_hat", T.DoubleType()),
            T.StructField("se_hat", T.DoubleType()),
        ]
    )
    from stackstac_spark.session import local_df

    return local_df(spark, [(n_a, n_b, m, n_hat, se)], schema)
