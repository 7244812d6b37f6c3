"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all JVM-side column expressions (no Python UDFs in
the hot path; every function here survives whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword sets per language for the n-gram/marker heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}

_DEFAULT_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is"]


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts and basic shape features."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    # BPE-ish: alphanumeric runs and single punctuation marks as tokens
    bpe = F.expr(rf"regexp_extract_all(lower({text_col}), '[a-z0-9]+|[^a-z0-9\\s]', 0)")
    stop_arr = ", ".join(f"'{s}'" for s in _DEFAULT_STOPWORDS)
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
        (F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)) / F.size(toks)).alias(
            "avg_tok_len"
        ),
        (
            F.size(F.expr(f"filter(split(lower({text_col}), '\\\\s+'), x -> x IN ({stop_arr}))"))
            / F.size(toks)
        ).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1] from length / punctuation / stopword
    / repetition signals (the C4/Gopher-style rule family, simplified)."""
    stats = token_stats(df, id_col, text_col)
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", "")) / F.greatest(F.length(text_col), F.lit(1))
    )
    base = df.select(id_col, punct_ratio.alias("punct_ratio"))
    j = stats.join(base, id_col)
    length_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.0)
    diversity = F.least(F.col("n_distinct") / F.greatest(F.col("n_tokens"), F.lit(1)) * 2, F.lit(1.0))
    stop_ok = F.when(F.col("stopword_ratio").between(0.01, 0.6), 1.0).otherwise(0.5)
    punct_ok = F.when(F.col("punct_ratio") < 0.2, 1.0).otherwise(0.3)
    return j.select(
        id_col,
        "n_tokens",
        "stopword_ratio",
        "punct_ratio",
        ((length_ok + diversity + stop_ok + punct_ok) / 4).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-token language ID: score = count of language-specific stopword
    hits; argmax with deterministic tie-break. (A real system plugs a model
    here; the operator shape — per-language score columns + greatest —
    stays.)"""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scored = df.select(id_col, toks.alias("t"))
    for lang, markers in _LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        scored = scored.withColumn(
            f"score_{lang}", F.size(F.expr(f"filter(t, x -> x IN ({arr}))"))
        )
    langs = list(_LANG_MARKERS)
    best: Column = F.lit("unk")
    best_score: Column = F.lit(0)
    for lang in reversed(langs):  # earlier langs win ties
        s = F.col(f"score_{lang}")
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return scored.select(id_col, *[f"score_{lang}" for lang in langs], best.alias("pred_lang"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized text plus an
    order-sensitive positional rolling hash (Σ (pos+1)·val(tok) mod 1e9+7)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    toks = df.select(id_col, F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "tok"))
    tokval = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5("tok"), 1, 1)) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), F.substring(F.md5("tok"), 2, 1)) - 1)
    ).cast("bigint")
    roll = toks.groupBy(id_col).agg(
        (F.sum((F.col("pos") + 1) * tokval) % F.lit(1000000007)).alias("rolling_hash")
    )
    return df.select(id_col, F.md5(norm).alias("md5_fp")).join(roll, id_col)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Intra-document repetition (boilerplate) signals — the C4/Gopher rule
    family: of a doc's word ``n``-grams, what fraction are repeats, and what
    fraction the single most frequent n-gram claims.

    Scale shape: explode n-grams → groupBy (doc, gram) with map-side combine
    (collapses repeats before the shuffle) → one per-doc agg. O(m log m) per
    doc, never the O(m²) in-array recount a HOF-only version would cost on
    long documents. Docs with fewer than ``n`` tokens drop out (no n-grams).
    """
    toks = df.select(id_col, F.split(F.lower(F.col(text_col)), " ").alias("t")).filter(
        F.size("t") >= n
    )
    gram = F.expr(
        f"transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', slice(t, i + 1, {n})))"
    )
    grams = toks.select(id_col, F.explode(gram).alias("g"))
    gc = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return gc.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct_ngrams"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_ngram_ratio"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_frac"),
    )


def ngram_contamination(
    docs: DataFrame,
    probe: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per doc, the fraction of its distinct word
    ``n``-grams that appear anywhere in ``probe`` (a benchmark/eval corpus
    with a ``text_col``).

    Scale shape: the probe side is a benchmark suite — small — so its
    distinct n-gram set broadcasts and the corpus is scored with a broadcast
    left-semi-style join + per-doc agg: the 100 TB side never shuffles on
    the gram key.
    """

    def _grams(d: DataFrame, cols):
        t = d.select(*cols, F.split(F.lower(F.col(text_col)), " ").alias("t")).filter(
            F.size("t") >= n
        )
        g = F.expr(
            f"transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', slice(t, i + 1, {n})))"
        )
        return t.select(*cols, F.explode(g).alias("g")).distinct()

    doc_grams = _grams(docs, [id_col])
    probe_grams = _grams(probe, []).select("g").distinct()
    hit = F.when(F.col("pg").isNotNull(), 1).otherwise(0)
    joined = doc_grams.join(
        F.broadcast(probe_grams.withColumn("pg", F.lit(1))), "g", "left"
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(hit).alias("n_contaminated"),
        F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("contamination"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` terms by tf·idf (idf = ln(N/df), the classic
    form). Deterministic tie-break: higher rounded score first, then term.

    Scale shape: one (doc, term) count with map-side combine, one term-level
    doc-frequency agg, one window for top-k. The corpus shuffles on
    (doc, term) once — the lower bound for exact tf — and never on raw
    tokens. The tf⋈df join keys on term with NO forced broadcast: the
    vocabulary is corpus-scale at 100 TB (a forced broadcast would OOM the
    driver); AQE picks broadcast by itself when the vocab is actually small.
    """
    from pyspark.sql import Window

    toks = df.select(id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.count_distinct(id_col).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tfidf")
    )


def unigram_logprob_score(
    df: DataFrame,
    lm: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """LM-based quality scoring, CCNet/KenLM shape with a unigram stand-in:
    score = mean negative log-probability of the doc's tokens under an
    add-alpha-smoothed unigram model (high score = surprising/low-quality
    text under the reference corpus; real deployments swap in a KenLM
    n-gram table — the operator shape, a token⋈LM join + per-doc mean,
    is identical).

    ``lm``: a (term, cnt) DataFrame fit elsewhere (``fit_unigram_lm``), or
    None to fit on ``df`` itself (self-scoring). Unseen tokens get the
    smoothed floor alpha / (total + alpha·(V+1)).

    Scale shape: LM fit is one token groupBy (vocab-sized result); scoring
    joins tokens to the LM on term with no forced broadcast (vocabulary is
    corpus-scale at 100 TB; AQE broadcasts when it is actually small), then
    one per-doc agg.
    """
    toks = df.select(id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
    if lm is None:
        lm = fit_unigram_lm(df, text_col=text_col)
    totals = lm.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    scored = (
        toks.join(lm, "term", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                    / (F.col("total") + F.lit(alpha) * (F.col("vocab") + 1))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )


def vocab_topk(
    df: DataFrame, k: int = 50, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-``k`` vocabulary: (rank, term, cnt, doc_freq) —
    the seed step of BPE/WordPiece vocabulary building and of stopword
    mining. Deterministic tiebreak: higher count first, then term.

    Scale shape: one token groupBy with map-side combine (the shuffle
    carries the vocabulary, not the corpus), then orderBy+limit which Spark
    executes as TakeOrdered — per-partition top-k merged on the driver, no
    full sort shuffle of the vocabulary.
    """
    from pyspark.sql import Window

    # whitespace-run tokenization, consistent with bm25/gopher/dedup (a
    # vocab learned here must match their tokens); the EXPLICIT class (not
    # \s) because Java \s includes \x0B while RE2 — the DuckDB oracle —
    # does not; leading-whitespace empty tokens dropped
    toks = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt"), F.count_distinct(F.col(id_col)).alias("doc_freq")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "cnt", "doc_freq"
    )


# PII patterns restricted to syntax shared verbatim by Java regex (Spark)
# and RE2 (DuckDB/Go): char classes, \d, \b, bounded repetition.
_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical text normalization for dedup keys (the C4/Gopher cleanup
    convention): lowercase → strip everything but ``[a-z0-9 ]`` → collapse
    whitespace runs → trim. Emits the normalized text, its md5 (the usual
    dedup key), and the post-normalization token count.

    Pure column expressions (three regexp passes + md5), whole-stage
    codegen'd, zero shuffles — at 100 TB this is a map-only stage that
    fuses into whatever scan precedes it.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.select(
        id_col,
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_key"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .alias("n_norm_tokens"),
    )


def quality_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020 §4.3: head /
    middle / tail by LM perplexity). Bucket 1 = best (lowest score —
    CCNet convention: lower perplexity is better). Unscored rows are
    dropped, not bucketed.

    Two modes:

    - ``approx=False`` (default, the oracle target): exact equal-count
      buckets via a global ``ntile`` — intentionally a total order
      (CCNet's cutoffs are corpus-wide quantiles), which means ONE
      single-partition window. Fine to tens of millions of rows; wrong
      shape at 100 TB.
    - ``approx=True`` (the scale path): one ``percentile_approx`` pass
      computes the n-1 corpus-wide cutoffs (mergeable partial aggregate —
      no row ever leaves its partition), then a broadcast CASE assigns
      buckets map-side. ZERO window, ZERO per-row shuffle. Differences vs
      exact, by construction: cutoff placement is within the sketch's
      rank error (≤ total_rows/accuracy), and every tie at a cutoff value
      lands in the same bucket (ntile splits ties to keep counts exactly
      equal; quantile cutoffs cannot).
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    # NULLS dropped in both modes: ASC sorts NULLS FIRST, which would
    # otherwise promote every unscored doc into bucket 1 ("best")
    scored = df.filter(F.col(score_col).isNotNull())
    if approx:
        if n_buckets == 1:
            return scored.select(id_col, score_col, F.lit(1).alias("bucket"))
        qs = [i / n_buckets for i in range(1, n_buckets)]
        (cuts,) = scored.select(
            F.percentile_approx(score_col, qs, accuracy).alias("c")
        ).first()
        if cuts is None:  # zero scored rows → empty result, same as exact mode
            return scored.select(id_col, score_col, F.lit(1).alias("bucket"))
        # driver pull is the n-1 cutoff floats only, never rows; the CASE
        # broadcasts with the plan. score <= cut_i → bucket i+1 at most.
        bucket = F.lit(n_buckets)
        for i in range(n_buckets - 2, -1, -1):
            bucket = F.when(F.col(score_col) <= F.lit(cuts[i]), i + 1).otherwise(
                bucket
            )
        return scored.select(id_col, score_col, bucket.alias("bucket"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    return scored.select(
        id_col,
        F.col(score_col),
        F.ntile(n_buckets).over(w).alias("bucket"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon character entropy (bits/char) — the classic
    gibberish / base64-blob / repeated-filler quality signal (low entropy =
    repetition, ≈ uniform-random = encoded binary). Computed as
    ``log2(n) − Σ c·log2(c) / n`` over character counts.

    Map-only: the per-char counts come from higher-order functions over
    the char array (distinct chars → count each via ``filter``), entirely
    inside whole-stage codegen — ZERO shuffle, fuses into the scan. That is
    O(n·distinct) per doc vs the exploded (doc, char) groupBy's O(n) rows
    through a full shuffle; for natural text (distinct ≈ alphabet size)
    the map-only form wins at any corpus size, and at 100 TB it removes
    the largest shuffle of the text-quality stage. Empty texts are absent
    from the output (no characters → entropy undefined).

    Returns (id, n_chars, entropy) with entropy rounded to 6.
    """
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an empty
    # array — hence the explicit empty-text filter (empty → absent, as the
    # docstring states and as generate_series-based engines behave)
    chars = f"transform(sequence(1, length({text_col})), i -> substring({text_col}, i, 1))"
    counts = (
        f"transform(array_distinct({chars}), "
        f"c -> size(filter({chars}, x -> x = c)))"
    )
    ent = (
        f"log2(CAST(length({text_col}) AS DOUBLE)) - "
        f"aggregate({counts}, 0D, (a, c) -> a + c * log2(CAST(c AS DOUBLE))) "
        f"/ length({text_col})"
    )
    return df.filter(F.length(text_col) > 0).select(
        id_col,
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(F.expr(ent), 6).alias("entropy"),
    )


def encode_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary encoding — the tokenize step of a training pipeline: map
    each whitespace token to its vocabulary id (``vocab`` is (rank, term),
    e.g. from :func:`vocab_topk`; id = rank, OOV → 0), reassembling ids in
    document order.

    Returns (id, n_tokens, n_oov, ids array<int>). Plan: one positional
    explode, a term-keyed join against the vocabulary with NO forced
    broadcast (a BPE vocab is small and AQE will broadcast it; a
    billion-term vocab shuffles — same policy as tfidf), then one doc-keyed
    aggregate reassembling via sort_array over (pos, id) structs.
    """
    # whitespace-run tokenization matching vocab_topk (explicit class for
    # Java/RE2 portability — see vocab_topk); positions keep document
    # order even after the empty-token filter
    toks = df.select(
        id_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    v = vocab.select(F.col("term"), F.col("rank").cast("int").alias("__vid"))
    enc = toks.join(v, "term", "left").select(
        id_col, "pos", F.coalesce("__vid", F.lit(0)).alias("tid")
    )
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("int")).cast("int").alias("n_oov"),
        F.expr("transform(sort_array(collect_list(struct(pos, tid))), x -> x.tid)").alias(
            "ids"
        ),
    )


def score_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Per-group z-score normalization — make quality scores comparable
    ACROSS domains before a global threshold (CCNet's per-language
    perplexity buckets generalize exactly this way: a raw score cut would
    keep whole easy domains and drop whole hard ones).

    Plan: group stats via ONE hash aggregate (mean + population stddev —
    group count is domain-sized, tiny), broadcast-joined back; no window
    over the corpus. Null scores pass through with null z. A zero-variance
    group normalizes to z=0 (every doc is average), not a division error.

    Returns the input columns + ``z`` rounded to ``round_to``.
    """
    stats = df.groupBy(group_col).agg(
        F.avg(score_col).alias("__mu"),
        F.stddev_pop(score_col).alias("__sd"),
    )
    z = F.when(
        F.col(score_col).isNotNull() & (F.col("__sd") > 0),
        F.round((F.col(score_col) - F.col("__mu")) / F.col("__sd"), round_to),
    ).otherwise(
        F.when(F.col(score_col).isNotNull(), F.lit(0.0))
    )
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn("z", z)
        .drop("__mu", "__sd")
    )


def script_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-class composition — the script/garbage mix
    signal multilingual curation filters on (CCNet buckets by it; a doc
    that is 40% digits or 30% punctuation is navigation boilerplate, and a
    Latin-ratio collapse flags mis-identified languages).

    Counts per class via ``length(text) - length(regexp_replace(text,
    class, ''))`` — classes restricted to explicit ranges shared verbatim
    by Java regex and RE2 ([A-Za-z], [0-9], whitespace, [.,;:!?'\"-]), the
    same portability rule as the PII patterns above. Map-only column
    expressions: zero shuffle, fuses into the scan. Empty docs report zero
    ratios. Returns (id, n_chars, n_latin, n_digit, n_space, n_punct,
    n_other, latin_ratio, digit_ratio) with ratios rounded to 6.
    """
    t = F.col(text_col)
    n = F.length(t)

    def cls(pattern: str):
        return n - F.length(F.regexp_replace(t, pattern, ""))

    n_latin = cls("[A-Za-z]")
    n_digit = cls("[0-9]")
    n_space = cls(r"[ \t\n\r]")
    n_punct = cls("[.,;:!?'\"-]")
    safe = F.when(n > 0, n.cast("double")).otherwise(F.lit(1.0))
    return df.select(
        id_col,
        n.cast("long").alias("n_chars"),
        n_latin.cast("long").alias("n_latin"),
        n_digit.cast("long").alias("n_digit"),
        n_space.cast("long").alias("n_space"),
        n_punct.cast("long").alias("n_punct"),
        (n - n_latin - n_digit - n_space - n_punct).cast("long").alias("n_other"),
        F.round(n_latin / safe, 6).alias("latin_ratio"),
        F.round(n_digit / safe, 6).alias("digit_ratio"),
    )


def gopher_quality_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1 — the deterministic subset):
    per document, the rule measurements and a combined keep flag:

    - ``word_count`` ∈ [50, 100_000]
    - ``mean_word_len`` ∈ [3, 10]
    - ``alpha_word_frac`` ≥ 0.8 (words containing ≥1 alphabetic char)
    - ``symbol_ratio`` ≤ 0.1 (# and … per word)
    - ``stopword_hits`` ≥ 2 distinct stop words present

    Pure column expressions over one token split — map-only, fused into
    the scan under whole-stage codegen; the verdict-table shape (all rows
    kept, ``keep`` boolean) matches ``pipeline.corpus_clean``.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    ) / n
    alpha_frac = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / n
    symbols = F.length(F.regexp_replace(F.col(text_col), "[^#…]", ""))
    stop_arr = ", ".join(f"'{s}'" for s in _DEFAULT_STOPWORDS)
    stop_hits = F.size(
        F.expr(
            f"array_intersect(split(lower({text_col}), '\\\\s+'), array({stop_arr}))"
        )
    )
    out = df.select(
        id_col,
        n.alias("word_count"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(symbols / n, 6).alias("symbol_ratio"),
        stop_hits.alias("stopword_hits"),
    )
    keep = (
        F.col("word_count").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("stopword_hits") >= 2)
    )
    return out.withColumn("keep", keep)


def sentence_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sentence segmentation stats — the C4 "at least 3 sentences" rule's
    measurement step: split on terminal punctuation runs ([.!?]+ followed
    by whitespace or end), count sentences, mean sentence token length,
    and the fraction ending with terminal punctuation. Regex is restricted
    to syntax shared by Java regex and RE2 so any engine replays it.
    Map-only column expressions.
    """
    # sentences = non-empty segments after splitting on terminal runs
    segs = F.expr(
        rf"filter(transform(split({text_col}, '[.!?]+(\\s+|$)'), x -> trim(x)), x -> x != '')"
    )
    n_sent = F.size(segs)
    mean_toks = F.when(
        n_sent > 0,
        F.round(
            F.expr(
                rf"aggregate(filter(transform(split({text_col}, '[.!?]+(\\s+|$)'), x -> trim(x)), x -> x != ''), "
                rf"0L, (a, s) -> a + size(split(s, '\\s+')))"
            )
            / n_sent,
            6,
        ),
    )
    ends_terminal = F.col(text_col).rlike(r"[.!?]\s*$")
    return df.select(
        id_col,
        n_sent.alias("n_sentences"),
        mean_toks.alias("mean_sentence_tokens"),
        ends_terminal.alias("ends_terminal"),
        (n_sent >= 3).alias("c4_min_sentences"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval over the corpus (Robertson & Zaragoza 2009; idf in
    the Lucene form ``ln(1 + (N − df + 0.5)/(df + 0.5))``) — the "find
    corpus docs closest to this eval set / seed query" curation step.

    score(d) = Σ_t idf_t · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·|d|/avgdl))

    Scale shape: tokens are filtered to the query terms BEFORE any shuffle
    (tf table is O(|corpus ∩ q|), not O(tokens)); per-term df is a
    query-sized aggregate joined back broadcast; N and avgdl are one-row
    aggregates cross-joined (Catalyst broadcasts single-row relations);
    the final top-k is a TakeOrdered, not a full sort. Scores are rounded
    to 6 so the ranking is engine-portable.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term")
    )
    dl = df.select(
        id_col, F.size(F.split(F.lower(F.col(text_col)), r"\s+")).alias("dl")
    )
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qt = toks.filter(F.col("term").isin(list(query_terms)))
    tf = qt.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), id_col).limit(k)


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII redaction: sequentially replace emails, IPv4 addresses, and
    phone-like digit runs with typed placeholders, counting matches per
    class BEFORE each replacement (so an IP inside an already-redacted
    email is not double-counted; order is email → ip → phone).

    Returns (id, n_email, n_ipv4, n_phone, scrubbed). Pure JVM column
    expressions — three regexp passes, no shuffle, no Python in the hot
    path; survives whole-stage codegen and scales embarrassingly.
    """
    cur = F.col(text_col)
    cols: list[Column] = [F.col(id_col)]
    for name, pat, repl in _PII_PATTERNS:
        cols.append(F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    cols.append(cur.alias("scrubbed"))
    return df.select(*cols)


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Data selection via importance resampling (DSIR, Xie et al. 2023,
    hashed-n-gram variant simplified to unigrams): score every corpus doc by
    log p_target(x) - log p_source(x) under two smoothed unigram LMs — one
    fit on the (small, curated) ``target`` set, one on the corpus itself.
    High ``log_ratio`` = looks like the target distribution; downstream,
    sample proportionally (e.g. with :mod:`sampling`'s hash sampler over a
    weight-derived threshold).

    Returns (id, n_tokens, nll_source, nll_target, log_ratio) with
    log_ratio = n_tokens-normalized log-likelihood ratio = nll_source -
    nll_target (both are mean NLLs, so the ratio is per-token).

    Scale shape: both LM fits are vocabulary-sized groupBys; scoring is two
    term-keyed joins over ONE tokenization of the corpus (the exploded
    token table is built once and joined to both LMs in a single pass —
    not two separate explode pipelines), then one per-doc agg. No forced
    broadcasts: vocabularies are corpus-scale at 100 TB, AQE broadcasts
    the target LM when it is actually small.
    """
    toks = df.select(id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
    lm_s = fit_unigram_lm(df, text_col=text_col)
    lm_t = fit_unigram_lm(target, text_col=text_col)
    tot_s = lm_s.agg(F.sum("cnt").alias("total_s"), F.count(F.lit(1)).alias("vocab_s"))
    tot_t = lm_t.agg(F.sum("cnt").alias("total_t"), F.count(F.lit(1)).alias("vocab_t"))

    def _nll(cnt_col: str, total: str, vocab: str) -> Column:
        return -F.log(
            (F.coalesce(F.col(cnt_col), F.lit(0)) + F.lit(alpha))
            / (F.col(total) + F.lit(alpha) * (F.col(vocab) + 1))
        )

    scored = (
        toks.join(lm_s.withColumnRenamed("cnt", "cnt_s"), "term", "left")
        .join(lm_t.withColumnRenamed("cnt", "cnt_t"), "term", "left")
        .crossJoin(F.broadcast(tot_s))
        .crossJoin(F.broadcast(tot_t))
        .select(
            id_col,
            _nll("cnt_s", "total_s", "vocab_s").alias("nll_s"),
            _nll("cnt_t", "total_t", "vocab_t").alias("nll_t"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("nll_s"), 6).alias("nll_source"),
        F.round(F.avg("nll_t"), 6).alias("nll_target"),
        F.round(F.avg("nll_s") - F.avg("nll_t"), 6).alias("log_ratio"),
    )


def fit_unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, cnt) unigram counts — the reference-corpus side of
    ``unigram_logprob_score``."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs (collocation
    mining, the word2vec-era association statistic):

        pmi(l, r) = ln( c(l,r) · N / (c(l,·) · c(·,r)) )

    over all adjacent bigram positions N in the corpus, with the marginals
    counted over bigram SLOTS (left occurrences / right occurrences), so
    the three counts live in one distribution and the estimate is exact.
    High-PMI pairs are multiword expressions ("new york"); a tokenizer
    step merges them (the phrases pass of word2vec; Mikolov et al. 2013).

    Plan: one pass explodes each document's bigram positions via a native
    ``transform(sequence(...))`` lambda (no Python UDF), one pair-keyed
    count, two broadcast-joined marginal counts (each ≤ vocab rows),
    tie-broken top-k. Every count is an exact bigint; the single ln() per
    surviving pair is replayed by the oracle.

    Returns (left, right, n_pair, pmi) — top ``top_k`` by
    (n_pair·pmi desc, left, right): ranking by raw PMI alone surfaces
    hapax noise, so the score weights association by evidence (the
    "salience" variant).
    """
    toks = df.select(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ts")
    ).filter(F.size("ts") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(element_at(ts, i) AS l, element_at(ts, i + 1) AS r))"
            )
        ).alias("p")
    ).select(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
    # ONE corpus pass total (optimization r12): the pair-count table is
    # the sufficient statistic — both marginals and the N-slot total are
    # exact integer roll-ups of it (n_left = Σ_right n_pair etc.), so the
    # tokenize + explode runs once and everything else is type-table
    # algebra (previously 4 corpus passes).
    pc = pairs.groupBy("left", "right").agg(
        F.count(F.lit(1)).alias("n_pair")
    ).localCheckpoint(eager=False)
    lm = pc.groupBy("left").agg(F.sum("n_pair").alias("n_left"))
    rm = pc.groupBy("right").agg(F.sum("n_pair").alias("n_right"))
    n_slots = pc.agg(F.sum("n_pair")).first()[0]
    scored = (
        pc.filter(F.col("n_pair") >= min_count)
        .join(F.broadcast(lm), "left")
        .join(F.broadcast(rm), "right")
        .select(
            "left",
            "right",
            "n_pair",
            F.round(
                F.log(
                    F.col("n_pair").cast("double")
                    * F.lit(float(n_slots))
                    / (F.col("n_left").cast("double") * F.col("n_right"))
                ),
                round_to,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc(F.round(F.col("n_pair") * F.col("pmi"), 6)), "left", "right"
    ).limit(top_k)


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    round_to: int = 4,
) -> DataFrame:
    """Interpolated bigram language-model scoring (the CCNet/KenLM-style
    perplexity filter, with the LM trained ON the corpus as a pipeline
    step): per document the cross-entropy over its bigram transitions

        H(d) = −(1/T_d) Σ ln[ λ·c(prev,w)/c(prev,·) + (1−λ)·(c(w)+1)/(N+V) ]

    — Jelinek-Mercer interpolation of the bigram MLE with a Laplace
    unigram backoff, so unseen transitions stay finite. High-perplexity
    docs are LM-unlike (boilerplate, tables, other languages) and get
    filtered; this pairs with :func:`unigram_logprob_score` one model
    order up.

    Plan shape: the bigram/unigram count tables are token-keyed aggregates
    of ONE corpus pass (the same explode the PMI/collocation op uses); the
    scoring join is (doc, prev, w) ⋈ counts on the bigram key — sparse,
    never a dense vocab² table. All counts exact bigints; ln() per
    surviving term; per-doc sum order pinned by rounding only at output.

    Returns (id, n_big, ppl) with ppl = exp(H) rounded to ``round_to``.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ts"),
    ).filter(F.size("ts") >= 2)
    bigs = toks.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(element_at(ts, i) AS p, element_at(ts, i + 1) AS w))"
            )
        ).alias("b"),
    ).select("id", F.col("b.p").alias("p"), F.col("b.w").alias("w"))
    # One corpus pass for ALL model tables (optimization r12): the bigram
    # count table is the sufficient statistic — the context totals, the
    # unigram (second-slot) totals, the N-slot total, and V all derive
    # from it by exact integer aggregation (c_p = Σ_w c_pw, c_w = Σ_p
    # c_pw, N = Σ c_pw, V = |distinct w|), identical to counting over the
    # raw stream. Previously each table re-ran the tokenize + explode
    # (5 corpus passes); the materialized table is distinct-bigram-sized
    # (a type table, far smaller than the token stream — deliberately NOT
    # the stream itself, per guide §5: cache only what is cheaper than
    # the memory pressure it creates). The scoring join below is the one
    # remaining corpus pass, so the operator reads the corpus twice.
    bc = bigs.groupBy("p", "w").agg(
        F.count(F.lit(1)).alias("c_pw")
    ).localCheckpoint(eager=False)
    pc = bc.groupBy("p").agg(F.sum("c_pw").alias("c_p"))
    uni = bc.groupBy("w").agg(F.sum("c_pw").alias("c_w"))
    tot = bc.agg(
        F.sum("c_pw").alias("__n"), F.count(F.lit(1)).alias("__types")
    )
    n_slots = tot.first()["__n"]
    v_size = uni.count()
    prob = (
        F.lit(lam) * F.col("c_pw").cast("double") / F.col("c_p")
        + F.lit(1.0 - lam)
        * (F.col("c_w").cast("double") + F.lit(1.0))
        / F.lit(float(n_slots + v_size))
    )
    scored = (
        bigs.join(bc, ["p", "w"])
        .join(F.broadcast(pc), "p")
        .join(F.broadcast(uni), "w")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            F.sum(F.log(prob)).alias("__ll"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_big",
        F.round(F.exp(-F.col("__ll") / F.col("n_big")), round_to).alias("ppl"),
    )


_WS = r"[ \t\n\r\f]+"  # explicit class: Java \s ⊃ RE2 \s (\x0B), see vocab_topk


def zipf_fit(
    df: DataFrame,
    by: str = "lang",
    top_n: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Zipf's-law fit per group: OLS of ln(count) on ln(rank) over the
    ``top_n`` most frequent terms — the slope (~ -1 for natural language)
    is a cheap corpus-health screen (synthetic/boilerplate corpora bend
    the curve). One token groupBy (map-side combined), a per-group rank
    window over the vocabulary (small), then Catalyst's built-in
    ``regr_slope``/``regr_intercept``/``regr_r2`` — no Python in the
    token path, so the corpus-sized stage stays in whole-stage codegen.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(by).alias("grp"),
        F.explode(F.split(F.lower(F.col(text_col)), _WS)).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.expr("regr_slope(ln(cast(cnt as double)), ln(cast(rank as double)))"), round_to).alias("slope"),
            F.round(F.expr("regr_intercept(ln(cast(cnt as double)), ln(cast(rank as double)))"), round_to).alias("intercept"),
            F.round(F.expr("regr_r2(ln(cast(cnt as double)), ln(cast(rank as double)))"), round_to).alias("r2"),
        )
        .withColumnRenamed("grp", by)
    )


def keyness_llr(
    df: DataFrame,
    group: str = "source",
    k: int = 5,
    min_count: int = 5,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Dunning log-likelihood keyness (Dunning 1993): for each group, the
    ``k`` terms most over-represented vs the rest of the corpus by the
    G² statistic 2·(a·ln(a/E1) + b·ln(b/E2)). The workhorse of
    domain-vocabulary drift reports and per-source boilerplate discovery.

    Scale shape: ONE corpus-sized token groupBy; everything after runs on
    the (group × vocabulary) table, which is bounded, and the per-group
    totals / corpus totals join back via broadcast.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(group).alias("grp"),
        F.explode(F.split(F.lower(F.col(text_col)), _WS)).alias("term"),
    ).filter(F.col("term") != "")
    a_tab = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("a"))
    n1_tab = a_tab.groupBy("grp").agg(F.sum("a").alias("n1"))
    tot_tab = a_tab.groupBy("term").agg(F.sum("a").alias("tot"))
    n_all = a_tab.agg(F.sum("a").alias("n_all"))
    j = (
        a_tab.join(F.broadcast(n1_tab), "grp")
        .join(tot_tab, "term")
        .crossJoin(F.broadcast(n_all))
        .withColumn("b", F.col("tot") - F.col("a"))
        .withColumn("n2", F.col("n_all") - F.col("n1"))
    )
    e1 = F.col("n1").cast("double") * F.col("tot") / F.col("n_all")
    e2 = F.col("n2").cast("double") * F.col("tot") / F.col("n_all")
    term_a = F.col("a").cast("double") * F.log(F.col("a") / e1)
    term_b = F.when(
        F.col("b") > 0, F.col("b").cast("double") * F.log(F.col("b") / e2)
    ).otherwise(F.lit(0.0))
    scored = (
        j.filter(F.col("a") >= min_count)
        # keyword = over-represented in the group (rate above corpus rate)
        .filter(F.col("a").cast("double") / F.col("n1") > F.col("tot").cast("double") / F.col("n_all"))
        .withColumn("llr", F.round(F.lit(2.0) * (term_a + term_b), round_to))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("llr"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group),
            F.col("rank").cast("int").alias("rank"),
            "term",
            "a",
            "tot",
            "llr",
        )
    )


def flesch_readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948): 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with the standard
    cheap proxies — sentences = runs of ``[.!?]``, syllables = vowel-group
    runs per word (min 1). A readability band is a routine quality-mix
    feature in pretraining-data curation.

    All column expressions (regexp_extract_all + higher-order aggregate);
    no Python, no shuffle — embarrassingly parallel per document.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), _WS), lambda t: t != F.lit(""))
    syl = F.aggregate(
        F.transform(
            toks,
            lambda t: F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0))),
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s,
    )
    n_words = F.size(toks).cast("long")
    n_sents = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), F.lit(0))).cast("long"),
    )
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * n_words.cast("double") / n_sents.cast("double")
        - F.lit(84.6) * syl.cast("double") / n_words.cast("double")
    )
    return df.filter(n_words > 0).select(
        id_col,
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        syl.alias("n_syll"),
        F.round(fre, round_to).alias("fre"),
    )


def token_gini(
    df: DataFrame,
    by: str = "lang",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Gini coefficient of the term-frequency distribution per group —
    0 = perfectly uniform vocabulary use, →1 = a few terms dominate
    (template/boilerplate smell). Computed from the exact integer
    identity G = 2·Σᵢ i·fᵢ / (n·Σf) − (n+1)/n over frequencies sorted
    ascending, so every engine that sums the same integers gets the same
    double. One corpus token groupBy; the window runs on the vocabulary.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(by).alias("grp"),
        F.explode(F.split(F.lower(F.col(text_col)), _WS)).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("grp").orderBy(F.asc("f"), F.asc("term"))
    ranked = counts.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("f").alias("total_tokens"),
            F.round(
                F.lit(2.0) * F.sum(F.col("i").cast("long") * F.col("f")).cast("double")
                / (F.count(F.lit(1)).cast("double") * F.sum("f").cast("double"))
                - (F.count(F.lit(1)) + F.lit(1)).cast("double") / F.count(F.lit(1)).cast("double"),
                round_to,
            ).alias("gini"),
        )
        .withColumnRenamed("grp", by)
        .orderBy(by)
    )


def histogram_cdf(
    df: DataFrame,
    score_col: str,
    bins: int = 32,
    out_col: str = "pct_est",
) -> DataFrame:
    """Approximate global percentile of every row's score via a fixed-K
    equi-width histogram — cross-domain score CALIBRATION (map raw quality
    scores onto one comparable 0..1 scale) without the global sort/window
    that an exact percent_rank needs and that no 100 TB plan survives.

    pct_est(v) = (count strictly below v's bin + within-bin linear
    interpolation · bin count) / N — the classic histogram-CDF estimate;
    max error is bounded by the largest bin's mass. All raw IEEE
    arithmetic (oracle-replayable bit-for-bit).

    Plan shape, deliberately window- and nested-loop-free: one global
    (min, max, N) aggregate broadcast back; one K-row bin-count aggregate;
    the cumulative-below table via an ``explode(sequence(bin+1, K-1))``
    re-aggregation of the K-row histogram (NOT a triangle non-equi
    self-join, which would plan as BroadcastNestedLoopJoin, and NOT a
    partition-less window — both are audit-flagged shapes); then one
    broadcast equi-join back onto the rows. Null scores pass through with
    a null estimate; a constant column (hi == lo) maps everything to bin 0
    with pct_est = 1.0 · row fraction below-or-at = N-weighted 1.0.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    v = F.col(score_col).cast("double")
    stats = df.agg(
        F.min(v).alias("__lo"),
        F.max(v).alias("__hi"),
        F.count(v).alias("__n"),
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    binned = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__bin",
            F.when(v.isNull(), F.lit(None).cast("int"))
            .when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor((v - F.col("__lo")) / w).cast("int"),
                )
            ),
        )
    )
    hist = (
        binned.filter(F.col("__bin").isNotNull())
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    # cum_below[t] = Σ cnt over bins < t, via explode of each bin's
    # "I am below t" targets — K·K/2 tiny rows, all equi-keyed
    cum = (
        # the < bins-1 filter matters: Spark's sequence(start, stop) REVERSES
        # when start > stop, so the last bin would otherwise emit itself
        hist.filter(F.col("__bin") < bins - 1)
        .select(
            F.explode(F.sequence(F.col("__bin") + 1, F.lit(bins - 1))).alias("__bin"),
            F.col("__cnt").alias("__below"),
        )
        .groupBy("__bin")
        .agg(F.sum("__below").alias("__cum_below"))
    )
    enriched = (
        binned.join(F.broadcast(hist), "__bin", "left")
        .join(F.broadcast(cum), "__bin", "left")
        .fillna({"__cum_below": 0})
    )
    frac = F.when(
        F.col("__hi") == F.col("__lo"), F.lit(1.0)
    ).otherwise((v - (F.col("__lo") + F.col("__bin") * w)) / w)
    pct = F.when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise((F.col("__cum_below") + frac * F.col("__cnt")) / F.col("__n"))
    return enriched.withColumn(out_col, pct).drop(
        "__lo", "__hi", "__n", "__bin", "__cnt", "__cum_below"
    )


def sparse_cosine_topk(
    df: DataFrame,
    k: int = 5,
    top_terms: int = 20,
    max_df: int | None = 10_000,
    max_df_frac: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """All-pairs sparse-vector similarity search (APSS) over TF-IDF document
    vectors via an inverted-index join — top-k most similar documents per
    document WITHOUT embeddings: the classic Bayardo et al. 2007 shape, and
    the lexical complement to ``similarity.cosine_topk``'s dense path.

    Pipeline (all relational):

    1. token counts → per-term document frequency → smoothed IDF
       ``ln(N / df)``; terms with df > ``max_df`` (absolute) or
       df > ``max_df_frac``·N (corpus-RELATIVE — the form that survives a
       10× scale-up: an absolute cap silently empties the index once every
       term's df outgrows it, measured at the sf1 probe) are dropped — stopword-
       class terms contribute near-zero IDF weight but QUADRATIC join
       fan-out, the classic APSS explosion (at web scale this prune is the
       difference between feasible and not),
    2. L2-normalize each doc's TF-IDF vector, keep only its ``top_terms``
       heaviest coordinates (weight desc, term asc — deterministic) — the
       standard index-truncation bound on per-term posting fan-out,
    3. term-keyed self-join accumulates partial dot products per pair
       (sim of the TRUNCATED vectors — a documented lower bound on the
       full cosine), then per-doc top-k by (rounded sim desc, other id):
       partial sums arrive in arbitrary order, so the score is rounded
       BEFORE ranking and the id tiebreak makes top-k reproducible
       bit-for-bit on any engine.

    Emits both directions (query_id, match_id, sim) — each doc gets its
    own top-k list, like a kNN index lookup.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("term"),
    )
    # materialized once (optimization r12): the df table, the weight
    # projection (consumed by norms AND wn), all otherwise re-run the
    # tokenize + explode + (doc, term) aggregate per consumer. EAGER
    # (second pass): those consumers are concurrent branches of one job
    # (tf joins dfreq, which itself derives from tf), so a lazy cache lets
    # them race and recompute the aggregate before it fills.
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint()
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    if max_df_frac is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df_frac * n_docs)
    w = tf.join(dfreq, "term").select(
        id_col,
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    norms = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    from pyspark.sql import Window

    wn = w.join(norms, id_col).select(
        id_col, "term", (F.col("w") / F.col("nrm")).alias("wn")
    )
    rk = Window.partitionBy(id_col).orderBy(F.desc("wn"), "term")
    trunc = (
        wn.withColumn("__r", F.row_number().over(rk))
        .filter(F.col("__r") <= top_terms)
        .drop("__r")
        # ≤ top_terms rows/doc, feeds both sides of the posting self-join
        # (eager — the join sides are concurrent branches of one job)
        .localCheckpoint()
    )
    a = trunc.select(F.col(id_col).alias("query_id"), "term", F.col("wn").alias("wa"))
    b = trunc.select(F.col(id_col).alias("match_id"), "term", F.col("wn").alias("wb"))
    sims = (
        a.join(b, "term")
        .filter(F.col("query_id") != F.col("match_id"))
        .groupBy("query_id", "match_id")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), round_to).alias("sim"))
    )
    topw = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")
    return (
        sims.withColumn("__r", F.row_number().over(topw))
        .filter(F.col("__r") <= k)
        .select("query_id", "match_id", "sim", F.col("__r").alias("rank"))
    )


def feature_hash(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick text vectorizer (Weinberger et al. 2009): token →
    bucket md5(token) mod ``dim``, SIGNED by a second hash bit so hash
    collisions cancel in expectation instead of biasing counts upward —
    the fixed-dimension, vocabulary-free featurizer (no vocab table to
    build, broadcast, or keep in sync across corpus versions, which is
    the operational win over ``encode_with_vocab`` at 100 TB).

    Bucket = first 8 md5 hex digits as an integer mod dim; sign = +1/−1
    by the parity of the 9th hex digit. Pure integer/string expressions —
    engine-exact. Output: (id, nnz, l2_sq, vec) where vec is the dense
    ``dim``-length signed-count array (map + one (id, bucket) aggregate +
    one per-doc reassembly agg — co-keyed shuffles only).
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    )
    h = F.md5(F.col("tok"))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0, 1
    ).otherwise(-1)
    per_bucket = (
        toks.select(id_col, bucket.alias("b"), sign.alias("s"))
        .groupBy(id_col, "b")
        .agg(F.sum("s").alias("v"))
        .filter(F.col("v") != 0)
    )
    # dense reassembly: (bucket, value) entries → map → one transform lookup
    # per output index (no per-element array fold)
    ent = (
        per_bucket.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct(F.col("b"), F.col("v"))))
            ).alias("m"),
            F.count(F.lit(1)).alias("nnz"),
            F.sum(F.col("v") * F.col("v")).alias("l2_sq"),
        )
    )
    vec = F.expr(f"transform(sequence(0, {dim - 1}), i -> coalesce(element_at(m, i), 0L))")
    return ent.select(id_col, "nnz", "l2_sq", vec.alias("vec"))


def kneser_ney_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    smoothing KenLM actually ships) — per document the KN cross-entropy

        P_KN(w|p) = max(c(p,w) − D, 0)/c(p·)
                    + (D/c(p·)) · N₁₊(p·) · N₁₊(·w)/B

    with absolute discount D, continuation probability
    Pcont(w) = N₁₊(·w)/B over B distinct bigram types — the upgrade over
    :func:`bigram_lm_score`'s Jelinek-Mercer mix that stops "francisco"
    from looking probable outside "san francisco" (continuation counts
    ask "how many contexts?" not "how often?").

    Same one-pass count-table plan as the JM scorer: bigram counts, left/
    right distinct-neighbor counts (two more aggregates of the SAME
    exploded stream), sparse per-doc scoring join. Every count is an
    exact bigint; docs score over their own corpus-attested bigrams, so
    P > 0 always. Returns (id, n_big, ppl_kn = exp(−mean ln P))."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("ts"),
    ).filter(F.size("ts") >= 2)
    bigs = toks.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(element_at(ts, i) AS p, element_at(ts, i + 1) AS w))"
            )
        ).alias("b"),
    ).select("id", F.col("b.p").alias("p"), F.col("b.w").alias("w"))
    # One materialized type table (optimization r12): bc is the sufficient
    # statistic for the context totals, both continuation counts, and the
    # B-types count — without the checkpoint each consumer re-ran the
    # corpus explode (~5 passes). The scoring join is the one remaining
    # corpus pass (the stream itself is deliberately NOT cached — type
    # table only, guide §5).
    bc = bigs.groupBy("p", "w").agg(
        F.count(F.lit(1)).alias("c_pw")
    ).localCheckpoint(eager=False)
    ctx = bc.groupBy("p").agg(
        F.sum("c_pw").alias("c_p"), F.count(F.lit(1)).alias("n1_right")
    )
    cont = bc.groupBy("w").agg(F.count(F.lit(1)).alias("n1_left"))
    b_types = bc.count()
    p_kn = (
        F.greatest(F.col("c_pw").cast("double") - F.lit(discount), F.lit(0.0))
        / F.col("c_p")
        + (F.lit(discount) / F.col("c_p"))
        * F.col("n1_right")
        * (F.col("n1_left").cast("double") / F.lit(float(b_types)))
    )
    scored = (
        bigs.join(bc, ["p", "w"])
        .join(F.broadcast(ctx), "p")
        .join(F.broadcast(cont), "w")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_big"), F.sum(F.log(p_kn)).alias("__ll"))
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_big",
        F.round(F.exp(-F.col("__ll") / F.col("n_big")), round_to).alias("ppl_kn"),
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    train_mod: int = 10,
    train_under: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Held-out n-gram novelty — the memorization/coverage metric: hash-
    split docs into train (md5(id) mod ``train_mod`` < ``train_under``)
    and test, then per TEST doc the fraction of its n-gram OCCURRENCES
    whose n-gram never appears in any train doc → (id, n_ngrams,
    n_unseen, novelty). Low novelty ⇒ the doc is reconstructible from the
    train slice (dedup leak / templated text); high ⇒ genuinely new
    content. The per-doc relative of ngram_contamination's corpus-level
    screen.

    Plan: one explode to (doc, ngram), the train side collapsed to a
    DISTINCT ngram set (the only extra aggregate), one left join + null
    count per test doc. The split is a pure md5 function of the id —
    stable across engines and partitionings."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    is_train = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long") % train_mod < train_under
    )
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
            ).alias("ts"),
        )
        .filter(F.size("ts") >= n)
        .select(
            "id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ts) - {n} + 1), "
                    f"i -> array_join(slice(ts, i, {n}), ' '))"
                )
            ).alias("g"),
        )
        .withColumn("__train", is_train)
    )
    train_set = grams.filter(F.col("__train")).select("g").distinct()
    test = grams.filter(~F.col("__train"))
    joined = test.join(
        train_set.withColumn("__seen", F.lit(1)), "g", "left"
    )
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0)).alias("n_unseen"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_ngrams",
            F.col("n_unseen").cast("long").alias("n_unseen"),
            F.round(F.col("n_unseen").cast("double") / F.col("n_ngrams"), round_to).alias("novelty"),
        )
    )


def chi2_terms(
    df: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 3,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """χ² term-class association (the classic supervised feature-selection
    statistic; Manning/Schütze ch. 5): per (term, class) the chi-square of
    the 2×2 document-presence contingency table, top-``k`` terms per class
    → (class, rank, term, df, chi2). What "which words mark this
    language/domain?" asks; the significance-flavored complement of
    keyness_llr.

    Counts are document PRESENCE (distinct (doc, term)), the standard
    convention. All four cells derive from three aggregates (term df,
    class sizes, per-(term, class) df) + the corpus total — no dense
    vocab × class table, and ``min_df`` prunes the hapax tail before the
    window."""
    docterm = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(class_col).alias("cls"),
            F.explode(
                F.array_distinct(
                    F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
                )
            ).alias("term"),
        )
    )
    n_docs = df.count()
    cls_sizes = df.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_cls")
    )
    term_df = (
        docterm.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    tc = docterm.groupBy("term", "cls").agg(F.count(F.lit(1)).alias("n11"))
    cells = (
        tc.join(term_df, "term")
        .join(F.broadcast(cls_sizes), "cls")
        .select(
            "cls",
            "term",
            "df",
            F.col("n11").cast("double").alias("n11"),
            (F.col("df") - F.col("n11")).cast("double").alias("n10"),
            (F.col("n_cls") - F.col("n11")).cast("double").alias("n01"),
            (F.lit(n_docs) - F.col("df") - F.col("n_cls") + F.col("n11"))
            .cast("double")
            .alias("n00"),
        )
    )
    denom = (
        (F.col("n11") + F.col("n10"))
        * (F.col("n01") + F.col("n00"))
        * (F.col("n11") + F.col("n01"))
        * (F.col("n10") + F.col("n00"))
    )
    chi2 = F.when(
        denom > 0,
        F.lit(float(n_docs))
        * F.pow(F.col("n11") * F.col("n00") - F.col("n10") * F.col("n01"), 2)
        / denom,
    ).otherwise(F.lit(0.0))
    from pyspark.sql import Window

    w = Window.partitionBy("cls").orderBy(F.desc("chi2"), F.asc("term"))
    return (
        cells.select("cls", "term", "df", F.round(chi2, round_to).alias("chi2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("cls").alias(class_col), "rank", "term", "df", "chi2")
    )


def term_burstiness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Term burstiness as the variance-to-mean ratio of per-document
    occurrence counts, zeros included (Church & Gale 1995: content words
    are bursty — they cluster in few docs; function words are Poisson-ish
    with VMR ≈ 1) → top-``k`` (term, df, mean_tf, vmr). The corpus
    diagnostic that separates topical vocabulary from glue without any
    labels.

    Population moments over ALL N docs come free from the present-doc
    aggregate (absent docs contribute zero to both Σx and Σx²), so the
    plan is one (doc, term) count + one term aggregate + one top-k
    window — no densification."""
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
            ).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = float(df.count())
    stats = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("s1"),
            F.sum(F.col("tf") * F.col("tf")).alias("s2"),
        )
        .filter(F.col("df") >= min_df)
    )
    mean = F.col("s1").cast("double") / F.lit(n_docs)
    var = F.col("s2").cast("double") / F.lit(n_docs) - mean * mean
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("vmr"), F.asc("term"))
    return (
        stats.select(
            "term",
            "df",
            F.round(mean, round_to).alias("mean_tf"),
            F.round(var / mean, round_to).alias("vmr"),
        )
        # the rank window is partition-less over the min_df-pruned TERM
        # table (bounded vocabulary), not the corpus
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "term", "df", "mean_tf", "vmr")
    )


def token_fertility(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Tokenizer fertility / efficiency profile per corpus slice — the
    standard multilingual-tokenizer diagnostic (fertility = subword
    tokens per whitespace word; Ács 2019, BLOOM/XGLM tokenizer reports):
    a slice whose fertility is high pays proportionally more sequence
    length for the same text, and chars-per-token says how much raw text
    each token "buys".

    Uses the engine's BPE-ish regex tokenizer (alphanumeric runs +
    single punctuation — the same segmentation as :func:`token_stats`)
    against whitespace words. Per group emits:

    - n_docs, n_words, n_tokens
    - fertility          = n_tokens / n_words
    - chars_per_token    = Σ chars / n_tokens
    - token_type_ratio   = distinct token types / n_tokens (per-group
      lexical diversity of the tokenized stream)

    Plan: one map-only projection of per-doc counts + ONE grouped
    aggregate; the type count explodes tokens but aggregates before any
    join. All JVM regexp/array expressions — no Python in the path.
    """
    bpe = F.expr(
        rf"regexp_extract_all(lower({text_col}), '[a-z0-9]+|[^a-z0-9\\s]', 0)"
    )
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col),
        F.size(words).alias("__w"),
        F.size(bpe).alias("__t"),
        F.length(text_col).alias("__c"),
    )
    base = per_doc.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").alias("n_words"),
        F.sum("__t").alias("n_tokens"),
        F.sum("__c").alias("__chars"),
    )
    types = (
        df.select(F.col(group_col).alias("grp"), F.explode(bpe).alias("tok"))
        .groupBy("grp")
        .agg(F.count_distinct("tok").alias("__types"))
    )
    return (
        base.join(types, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_words",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("n_words"), round_to).alias("fertility"),
            F.round(F.col("__chars") / F.col("n_tokens"), round_to).alias(
                "chars_per_token"
            ),
            F.round(F.col("__types") / F.col("n_tokens"), round_to).alias(
                "token_type_ratio"
            ),
        )
    )


def boolean_retrieval(
    df: DataFrame,
    query_terms: list[str],
    mode: str = "and",
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean retrieval over the corpus — the exact-match complement of
    :func:`bm25_topk` (same inverted-index shape Lucene executes):
    ``mode="and"`` returns docs containing EVERY query term, ``"or"``
    docs containing ANY, ranked by total query-term frequency then id.

    Scale shape identical to ``bm25_topk``: tokens are filtered to the
    query terms BEFORE any shuffle (the postings stream is
    O(|corpus ∩ q|), not O(tokens)); the AND is one grouped aggregate
    asserting distinct-term count == |q| — never a per-term self-join
    chain (q terms would mean q−1 joins); top-k is a TakeOrdered, not a
    global sort. Returns (id, n_terms_hit, total_tf).
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(rf"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("tok"),
    ).filter(F.col("tok").isin(terms))
    hits = toks.groupBy(id_col).agg(
        F.count_distinct("tok").alias("n_terms_hit"),
        F.count(F.lit(1)).alias("total_tf"),
    )
    if mode == "and":
        hits = hits.filter(F.col("n_terms_hit") == len(terms))
    return hits.orderBy(F.desc("total_tf"), id_col).limit(k)


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Hill estimator of the power-law tail index over a positive value
    column (Hill 1975) → one row (k, x_tail, hill_alpha):

        α̂ = k / Σ_{i=1..k} ln(x_(i) / x_(k+1))

    over the k+1 largest values — the quantitative companion to
    ``zipf_slope``: does this token/degree/doc-length distribution have
    the heavy tail real corpora do (α ≈ 1-2), or did a generator/bug
    flatten it? A changed tail index between crawls is a strong drift
    signal the mean never shows.

    Plan: top-(k+1) by value is one TakeOrdered (no global sort
    materializes — Spark's sort+limit physical rewrite), then one scalar
    aggregate over k+1 rows. Ties at the cut are harmless by
    construction: any top-(k+1) MULTISET is identical when tied values
    straddle the boundary, and the estimator depends only on the
    multiset. α is NULL when all k+1 values are equal (zero denominator —
    no tail to estimate).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.col(value_col).cast("double")
    top = (
        df.select(v.alias("__x"))
        # Spark's total ordering puts NaN ABOVE every number, so NaN passes
        # __x > 0 AND sorts to the top of the descending limit — poisoning
        # slog and x_tail (denom NaN, and NaN > 0 is true under Spark NaN
        # ordering, so hill_alpha would be NaN instead of NULL). Exclude it.
        .filter((F.col("__x") > 0) & ~F.isnan("__x"))
        .orderBy(F.desc("__x"))
        .limit(k + 1)
    )
    agg = top.agg(
        F.count(F.lit(1)).alias("__m"),
        F.min("__x").alias("__xk1"),
        F.sum(F.log("__x")).alias("__slog"),
    )
    # Σ_{i<=k} ln x_i − k·ln x_{k+1} = slog − (k+1)·ln(x_{k+1})
    denom = F.col("__slog") - (k + 1) * F.log("__xk1")
    return agg.select(
        F.lit(k).alias("k"),
        F.round("__xk1", round_to).alias("x_tail"),
        F.when(
            (F.col("__m") == k + 1) & (denom > 0),
            F.round(F.lit(float(k)) / denom, round_to),
        ).alias("hill_alpha"),
    )


def chao1_richness(
    df: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Chao1 vocabulary-richness estimate per group (Chao 1984, the
    bias-corrected form) → group_cols + (v_obs, f1, f2, chao1):

        chao1 = V + f1·(f1 − 1) / (2·(f2 + 1))

    from the observed vocabulary size V and the singleton/doubleton counts
    f1/f2 — "how much vocabulary does this source have that the crawl
    hasn't seen yet?", the coverage companion to ``zipf_slope``: a crawl
    whose chao1 ≈ V is vocabulary-saturated; chao1 ≫ V means the corpus is
    an undersample. The bias-corrected form is used unconditionally so the
    estimate is defined when f2 = 0 (the classic f1²/(2f2) is not).

    Plan: one token groupBy (map-side combined, vocabulary-sized shuffle)
    + one frequency-class aggregate per group. Whitespace-run
    tokenization, consistent with vocab_topk/bm25.
    """
    groups = list(group_cols or [])
    toks = df.select(
        *groups,
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+")
        ).alias("__term"),
    ).filter(F.col("__term") != "")
    counts = toks.groupBy(*groups, "__term").agg(F.count(F.lit(1)).alias("__c"))
    agg = counts.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum((F.col("__c") == 1).cast("int")).cast("long").alias("f1"),
        F.sum((F.col("__c") == 2).cast("int")).cast("long").alias("f2"),
    )
    return agg.select(
        *groups,
        "v_obs",
        "f1",
        "f2",
        F.round(
            F.col("v_obs")
            + F.col("f1") * (F.col("f1") - 1) / (2.0 * (F.col("f2") + 1)),
            round_to,
        ).alias("chao1"),
    )


def good_turing_counts(
    df: DataFrame,
    text_col: str = "text",
    max_r: int = 10,
    ngram: int = 1,
    round_to: int = 6,
    first_k: int | None = None,
) -> DataFrame:
    """Good-Turing frequency-of-frequencies smoothing table (Good 1953)
    over the corpus vocabulary → one row per raw count r in [1, max_r]:
    (r, n_r, r_star, p_r) with n_r = number of token types seen exactly r
    times, the adjusted count r* = (r+1)·N_{r+1}/N_r, and the smoothed
    per-type probability p_r = r*/N (N = corpus token total) — the
    classical unseen-mass estimator behind Katz backoff and the standard
    "how much probability mass belongs to tokens we haven't crawled yet?"
    diagnostic (that unseen mass is N_1/N, the r = 0 row's total). r* is
    NULL where N_{r+1} = 0 (Good-Turing is undefined without smoothing the
    N_r sequence; the low-r rows a pipeline acts on are never sparse).
    ``ngram`` > 1 counts word n-gram types instead of unigrams — the type
    space Katz backoff actually smooths, and the one with real singleton
    mass on template-heavy corpora whose unigram vocabulary is saturated.
    ``first_k`` (when set, overrides ``max_r``) keeps the K SMALLEST
    frequency classes whatever their magnitude — the scale-robust cutoff:
    an absolute ``r <= max_r`` filter goes empty when the corpus is a
    verbatim N× replication (every count is a multiple of N, so the
    smallest class is r = N·min_count), while "the K rarest classes" is
    the low-count head Good-Turing smooths at any corpus size.

    Plan: one token groupBy (vocabulary-sized shuffle) + one
    frequency-class aggregate; the N_r table is at most max(count) rows —
    sketch-sized — so the single lead window over it is bounded by
    construction (the same bounded-table exemption as zipf_fit's rank
    window). N-grams are built per document with native array transforms
    (no self-join).
    """
    if max_r < 1:
        raise ValueError(f"max_r must be >= 1, got {max_r}")
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+"),
        lambda x: x != "",
    )
    if ngram == 1:
        toks = df.select(F.explode(arr).alias("__term"))
    else:
        toks = df.select(arr.alias("__a")).select(
            F.explode(
                F.expr(
                    f"CASE WHEN size(__a) >= {ngram} THEN "
                    f"transform(sequence(0, size(__a) - {ngram}), "
                    f"i -> concat_ws(' ', slice(__a, i + 1, {ngram}))) "
                    "ELSE cast(array() as array<string>) END"
                )
            ).alias("__term")
        )
    counts = toks.groupBy("__term").agg(F.count(F.lit(1)).alias("__c"))
    # frequency of frequencies: bounded by the max per-type count
    fof = counts.groupBy(F.col("__c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r"),
        F.sum("__c").alias("__mass"),
    ).localCheckpoint(eager=False)  # sketch-sized; the eager N total and the lead
    # window below would otherwise each re-run the corpus token explode
    # + vocabulary aggregate (optimization r12)
    n_total = fof.agg(F.sum("__mass")).first()[0]
    from pyspark.sql import Window

    w = Window.orderBy("r")  # bounded: ≤ max(count) rows, sketch-sized
    nxt = fof.select(
        "r",
        "n_r",
        F.lead("n_r").over(w).alias("__n_next"),
        F.lead("r").over(w).alias("__r_next"),
        F.row_number().over(w).alias("__rn"),
    )
    if first_k is not None:
        if first_k < 1:
            raise ValueError(f"first_k must be >= 1, got {first_k}")
        nxt = nxt.filter(F.col("__rn") <= first_k)
    else:
        nxt = nxt.filter(F.col("r") <= max_r)
    r_star = F.when(
        F.col("__r_next") == F.col("r") + 1,
        (F.col("r") + 1) * F.col("__n_next") / F.col("n_r"),
    )
    return nxt.select(
        F.col("r").cast("long").alias("r"),
        "n_r",
        F.round(r_star, round_to).alias("r_star"),
        F.round(r_star / F.lit(float(n_total)), round_to).alias("p_r"),
    ).orderBy("r")


# RAKE's default delimiter set, trimmed to the high-frequency function
# words the synthetic corpus actually contains — literal so the DuckDB
# oracle replays phrase segmentation exactly.
RAKE_STOPWORDS = (
    "the of and a an in to is on for with as by at or be this that it "
    "from are was were has have had not but they you we he she its their"
).split()


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    k: int = 25,
    stopwords: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """RAKE keyword extraction over the corpus (Rose et al. 2010) → the
    top-``k`` candidate phrases by score: (rank, phrase, n_words, cnt,
    score) where a phrase's score is Σ_{w ∈ phrase} deg(w)/freq(w) with
    freq(w) = occurrences of w inside candidate phrases and deg(w) =
    Σ |phrase| over its phrase occurrences — the classic unsupervised
    "what is this corpus about" screen (multi-word technical terms
    outrank bare frequent words because degree rewards co-occurrence).

    Phrase segmentation is fully relational (no regex-split semantics to
    disagree on across engines): tokens explode with position, stopwords
    mark segment boundaries, a per-doc running stopword count assigns each
    surviving token its phrase id, and one (doc, phrase-id) ordered
    aggregate rebuilds the phrase string. Plan: the per-doc window is
    bounded by document length (the sentence_stats contract); word stats
    and phrase scores are vocabulary-sized aggregates; top-k is a
    TakeOrdered. Ties break (score desc, cnt desc, phrase asc).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    sw = sorted({w.lower() for w in (stopwords or RAKE_STOPWORDS)})
    # doc id FIRST, in its own projection: fused with posexplode it would
    # be evaluated per generated token row, giving every token its own
    # "document" (nondeterministic exprs don't collapse past Generate, so
    # the two-step select pins the per-document evaluation)
    docs_ids = df.select(
        F.monotonically_increasing_id().alias("__doc"),
        F.col(text_col).alias("__text"),
    )
    toks = docs_ids.select(
        "__doc",
        F.posexplode(
            F.split(F.lower(F.col("__text")), r"[ \t\n\r\f]+")
        ).alias("__pos", "__w"),
    ).filter(F.col("__w") != "")
    is_stop = F.col("__w").isin(sw)
    w_doc = Window.partitionBy("__doc").orderBy("__pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = toks.select(
        "__doc",
        "__pos",
        "__w",
        F.sum(is_stop.cast("int")).over(w_doc).alias("__seg"),
        is_stop.alias("__stop"),
    ).filter(~F.col("__stop"))
    phrases = seg.groupBy("__doc", "__seg").agg(
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(__pos, __w))), x -> x.__w)"),
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n_words"),
    ).localCheckpoint()
    # ^ materialized once (optimization r12): the word-stats aggregate and
    # the scoring explode would otherwise each re-run the posexplode +
    # per-doc window + phrase-rebuild pipeline; the checkpoint also pins
    # the plan-dependent monotonically_increasing_id doc keys (the
    # bleu2_corpus precedent). EAGER (second pass): the scoring join
    # consumes the phrase table on BOTH sides (directly and via the word
    # stats) in one job — a lazy cache lets the branches race.
    # word stats over phrase occurrences: freq = count, deg = Σ |phrase|
    words = phrases.select(
        "n_words", F.explode(F.split("phrase", " ")).alias("__w")
    )
    stats = words.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("n_words").alias("__deg"),
    )
    scored = (
        phrases.select("phrase", "n_words", F.explode(F.split("phrase", " ")).alias("__w"))
        .join(stats, "__w")
        .groupBy("phrase", "n_words")
        .agg(
            # Σ deg/freq over the phrase's word INSTANCES, then divided by
            # the phrase's occurrence count later — aggregate per distinct
            # phrase string instead: score is identical for every
            # occurrence, so compute per occurrence-set directly
            F.sum(F.col("__deg") / F.col("__freq")).alias("__score_total"),
            F.count(F.lit(1)).alias("__word_instances"),
        )
    )
    # __score_total summed over ALL occurrences of the phrase; per-phrase
    # score = per-occurrence sum = total / cnt, with cnt = instances/n_words
    per = scored.select(
        "phrase",
        F.col("n_words").cast("long").alias("n_words"),
        (F.col("__word_instances") / F.col("n_words")).cast("long").alias("cnt"),
        F.round(
            F.col("__score_total") / (F.col("__word_instances") / F.col("n_words")),
            round_to,
        ).alias("score"),
    )
    top = per.orderBy(F.desc("score"), F.desc("cnt"), F.asc("phrase")).limit(k)
    w_rank = Window.orderBy(F.desc("score"), F.desc("cnt"), F.asc("phrase"))
    return top.select(
        F.row_number().over(w_rank).alias("rank"),
        "phrase",
        "n_words",
        "cnt",
        "score",
    )


def bleu2_corpus(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Corpus-level BLEU-2 over (candidate, reference) text pairs
    (Papineni et al. 2002, uniform weights over 1- and 2-gram modified
    precisions, corpus brevity penalty) → one row (n_pairs, cand_len,
    ref_len, p1, p2, bp, bleu2):

        p_n   = Σ_pairs clipped n-gram matches / Σ_pairs candidate n-grams
        BP    = min(1, e^(1 − ref_len/cand_len))       (corpus totals)
        BLEU2 = BP · exp(½(ln p₁ + ln p₂))

    — the standard QC number for machine-translated / back-translated /
    paraphrased training pairs (a bitext pipeline reports it next to its
    margin scores). Clipping counts each candidate n-gram at most as
    often as the reference contains it. NULL BLEU when either precision
    is 0 (the log is undefined — report the p_n's and fix the pairs) or
    no candidate tokens. Pairs with a null side are excluded.
    Tokenization: lowercase whitespace (the corpus convention here).

    Plan: per-(pair, n, gram) counts for both sides via native array
    transforms (no self-joins), ONE (pair, n, gram) equi-join for
    clipping, two n-keyed totals — no window, no Python. The input is
    localCheckpoint-ed once so the plan-dependent pair ids
    (monotonically_increasing_id) are IDENTICAL across the gram sides
    and the length totals.
    """

    def _toks(col: str):
        return F.filter(
            F.split(F.lower(F.col(col)), r"[ \t\n\r\f]+"), lambda x: x != ""
        )

    def _ngrams(col: str, n: int):
        if n == 1:
            return _toks(col)
        toks = f"filter(split(lower({col}), '[ \\t\\n\\r\\f]+'), x -> x != '')"
        return F.expr(
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(0, size({toks}) - {n}), "
            f"i -> concat_ws(' ', slice({toks}, i + 1, {n}))) "
            "ELSE cast(array() as array<string>) END"
        )

    base = (
        df.filter(F.col(cand_col).isNotNull() & F.col(ref_col).isNotNull())
        .select(
            F.monotonically_increasing_id().alias("__pid"),
            F.col(cand_col).alias("__c"),
            F.col(ref_col).alias("__r"),
        )
        .localCheckpoint()
    )

    def _gram_counts(col: str, out: str) -> DataFrame:
        parts = [
            base.select(
                "__pid", F.lit(n).alias("__n"), F.explode(_ngrams(col, n)).alias("__g")
            )
            for n in (1, 2)
        ]
        allg = parts[0].unionByName(parts[1])
        return allg.groupBy("__pid", "__n", "__g").agg(
            F.count(F.lit(1)).alias(out)
        )

    cand = _gram_counts("__c", "__cc")
    ref = _gram_counts("__r", "__rr")
    clipped = cand.join(ref, ["__pid", "__n", "__g"]).select(
        "__n", F.least("__cc", "__rr").alias("__m")
    )
    match_tot = clipped.groupBy("__n").agg(F.sum("__m").alias("__matches"))
    cand_tot = cand.groupBy("__n").agg(F.sum("__cc").alias("__total"))
    prec = cand_tot.join(match_tot, "__n", "left").select(
        "__n",
        F.try_divide(F.coalesce("__matches", F.lit(0)), "__total").alias("__p"),
    )
    pv = prec.groupBy().pivot("__n", [1, 2]).agg(F.first("__p"))
    lens = base.select(
        F.size(_toks("__c")).alias("__cl"), F.size(_toks("__r")).alias("__rl")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__cl").cast("long").alias("cand_len"),
        F.sum("__rl").cast("long").alias("ref_len"),
    )
    j = (
        lens.withColumn("__k", F.lit(1))
        .join(F.broadcast(pv.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    p1 = F.col("1").cast("double")
    p2 = F.col("2").cast("double")
    bp = F.least(
        F.lit(1.0),
        F.exp(1.0 - F.try_divide(F.col("ref_len"), F.col("cand_len"))),
    )
    ok = (p1 > 0) & (p2 > 0) & (F.col("cand_len") > 0)
    return j.select(
        "n_pairs",
        "cand_len",
        "ref_len",
        F.round(p1, round_to).alias("p1"),
        F.round(p2, round_to).alias("p2"),
        F.when(F.col("cand_len") > 0, F.round(bp, round_to)).alias("bp"),
        F.when(
            ok, F.round(bp * F.exp(0.5 * (F.log(p1) + F.log(p2))), round_to)
        ).alias("bleu2"),
    )


def chrf_corpus(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    max_n: int = 6,
    beta: float = 2.0,
    round_to: int = 6,
) -> DataFrame:
    """Corpus-level chrF over (candidate, reference) text pairs (Popović
    2015: character n-gram F-score, the MT metric that correlates with
    human judgment better than BLEU for morphologically rich languages)
    → one row (n_pairs, prec, recall, chrf):

        P_n  = Σ_pairs clipped char-n-gram matches / Σ_pairs cand n-grams
        R_n  = same / Σ_pairs ref n-grams            (micro over corpus)
        P, R = mean over n = 1..max_n (an order with no n-grams scores 0)
        chrF = (1 + β²) P R / (β² P + R)             (0 when P + R = 0)

    Whitespace is removed before n-gramming (the chrF convention — word
    boundaries carry no signal at the character level); case is kept.
    Clipping counts each candidate n-gram at most as often as the
    reference contains it, per pair.

    Plan: the bleu2_corpus machinery on the character axis — per-(pair,
    n, gram) counts from native array transforms, ONE (pair, n, gram)
    equi-join for clipping, n-keyed totals, no window, no Python. Input
    localCheckpoint-ed once so plan-dependent pair ids agree across
    subplans. ~max_n × total_chars intermediate rows — linear in corpus
    size, shuffled only on (pair, n, gram).
    """
    orders = list(range(1, max_n + 1))

    def _stripped(col: str):
        return F.regexp_replace(F.col(col), r"\s+", "")

    def _char_ngrams(col: str, n: int):
        s = f"regexp_replace({col}, '\\\\s+', '')"
        return F.expr(
            f"CASE WHEN length({s}) >= {n} THEN "
            f"transform(sequence(1, length({s}) - {n} + 1), "
            f"i -> substring({s}, i, {n})) "
            "ELSE cast(array() as array<string>) END"
        )

    base = (
        df.filter(F.col(cand_col).isNotNull() & F.col(ref_col).isNotNull())
        .select(
            F.monotonically_increasing_id().alias("__pid"),
            F.col(cand_col).alias("__c"),
            F.col(ref_col).alias("__r"),
        )
        .localCheckpoint()
    )

    def _gram_counts(col: str, out: str) -> DataFrame:
        parts = [
            base.select(
                "__pid", F.lit(n).alias("__n"),
                F.explode(_char_ngrams(col, n)).alias("__g"),
            )
            for n in orders
        ]
        allg = parts[0]
        for p in parts[1:]:
            allg = allg.unionByName(p)
        return allg.groupBy("__pid", "__n", "__g").agg(F.count(F.lit(1)).alias(out))

    cand = _gram_counts("__c", "__cc")
    ref = _gram_counts("__r", "__rr")
    matches = (
        cand.join(ref, ["__pid", "__n", "__g"])
        .groupBy("__n")
        .agg(F.sum(F.least("__cc", "__rr")).alias("__m"))
    )
    ctot = cand.groupBy("__n").agg(F.sum("__cc").alias("__ct"))
    rtot = ref.groupBy("__n").agg(F.sum("__rr").alias("__rt"))
    # dense order axis so empty orders score 0 instead of vanishing
    grid = base.sparkSession.range(1, max_n + 1).select(F.col("id").alias("__n"))
    per_n = (
        grid.join(ctot, "__n", "left")
        .join(rtot, "__n", "left")
        .join(matches, "__n", "left")
        .select(
            "__n",
            F.coalesce(
                F.try_divide(F.coalesce("__m", F.lit(0)), "__ct"), F.lit(0.0)
            ).alias("__p"),
            F.coalesce(
                F.try_divide(F.coalesce("__m", F.lit(0)), "__rt"), F.lit(0.0)
            ).alias("__r"),
        )
    )
    pr = per_n.agg(F.avg("__p").alias("__P"), F.avg("__r").alias("__R"))
    n_pairs = base.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    b2 = beta * beta
    chrf = F.when(
        (F.col("__P") + F.col("__R")) > 0,
        (1.0 + b2) * F.col("__P") * F.col("__R")
        / (b2 * F.col("__P") + F.col("__R")),
    ).otherwise(F.lit(0.0))
    return n_pairs.crossJoin(F.broadcast(pr)).select(
        "n_pairs",
        F.round("__P", round_to).alias("prec"),
        F.round("__R", round_to).alias("recall"),
        F.round(chrf, round_to).alias("chrf"),
    )


def rouge_n_corpus(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    orders: tuple[int, ...] = (1, 2),
    round_to: int = 6,
) -> DataFrame:
    """Corpus-level ROUGE-N over (candidate, reference) pairs (Lin 2004)
    → one row per order n: (n, matches, cand_total, ref_total, rouge_p,
    rouge_r, rouge_f) with micro-aggregated totals:

        rouge_r = Σ clipped matches / Σ reference n-grams   (the headline)
        rouge_p = Σ clipped matches / Σ candidate n-grams
        rouge_f = 2PR/(P+R)

    The summarization-QC twin of [bleu2_corpus] (which is precision-
    oriented with a brevity penalty; ROUGE is recall-oriented — did the
    summary keep the reference's content?). Same lowercase-whitespace
    tokenization and per-pair clipping; NULL metric where the
    denominator is 0.

    Plan: identical shape — per-(pair, n, gram) counts, one clipping
    equi-join, n-keyed totals. No window, no Python.
    """

    def _ngrams(col: str, n: int):
        toks = f"filter(split(lower({col}), '[ \\t\\n\\r\\f]+'), x -> x != '')"
        if n == 1:
            return F.expr(toks)
        return F.expr(
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(0, size({toks}) - {n}), "
            f"i -> concat_ws(' ', slice({toks}, i + 1, {n}))) "
            "ELSE cast(array() as array<string>) END"
        )

    base = (
        df.filter(F.col(cand_col).isNotNull() & F.col(ref_col).isNotNull())
        .select(
            F.monotonically_increasing_id().alias("__pid"),
            F.col(cand_col).alias("__c"),
            F.col(ref_col).alias("__r"),
        )
        .localCheckpoint()
    )

    def _gram_counts(col: str, out: str) -> DataFrame:
        parts = [
            base.select(
                "__pid", F.lit(n).alias("__n"),
                F.explode(_ngrams(col, n)).alias("__g"),
            )
            for n in orders
        ]
        allg = parts[0]
        for p in parts[1:]:
            allg = allg.unionByName(p)
        return allg.groupBy("__pid", "__n", "__g").agg(F.count(F.lit(1)).alias(out))

    cand = _gram_counts("__c", "__cc")
    ref = _gram_counts("__r", "__rr")
    matches = (
        cand.join(ref, ["__pid", "__n", "__g"])
        .groupBy("__n")
        .agg(F.sum(F.least("__cc", "__rr")).alias("__m"))
    )
    ctot = cand.groupBy("__n").agg(F.sum("__cc").alias("__ct"))
    rtot = ref.groupBy("__n").agg(F.sum("__rr").alias("__rt"))
    # dense order axis so an order with zero n-grams still emits its row
    # (0 totals, NULL metrics) instead of vanishing from the report
    grid = base.sparkSession.createDataFrame(
        [(int(n),) for n in orders], "__n int"
    )
    per_n = (
        grid.join(ctot, "__n", "left")
        .join(rtot, "__n", "left")
        .join(matches, "__n", "left")
        .select(
            "__n",
            F.coalesce("__m", F.lit(0)).alias("__mm"),
            F.coalesce("__ct", F.lit(0)).alias("__ctt"),
            F.coalesce("__rt", F.lit(0)).alias("__rtt"),
        )
    )
    p = F.try_divide("__mm", "__ctt")
    r = F.try_divide("__mm", "__rtt")
    f1 = F.when((p + r) > 0, 2.0 * p * r / (p + r))
    return per_n.select(
        F.col("__n").cast("int").alias("n"),
        F.col("__mm").cast("long").alias("matches"),
        F.col("__ctt").cast("long").alias("cand_total"),
        F.col("__rtt").cast("long").alias("ref_total"),
        F.round(p, round_to).alias("rouge_p"),
        F.round(r, round_to).alias("rouge_r"),
        F.round(f1, round_to).alias("rouge_f"),
    ).orderBy("n")


def vocab_overlap(
    df: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise top-``top_k`` vocabulary overlap between domains → one
    row per unordered domain pair (domain_a < domain_b): (domain_a,
    domain_b, size_a, size_b, common, jaccard) with Jaccard =
    |A∩B| / |A∪B| over each domain's top-K token set (count desc, term
    asc tiebreak — deterministic).

    The set-based companion to the distributional mixes
    ([hellinger_langmix] compares token FREQUENCY vectors; this asks
    whether the domains even share their head vocabulary) — the quick
    read on "can these domains share one tokenizer/vocab budget?".

    Plan: one (domain, term) count aggregate (map-side combined — the
    only corpus pass), a per-domain rank window over that vocab table
    (partitioned by domain — parallel across domains, bounded by each
    domain's vocabulary), then a term-keyed self-join of the K-row-per-
    domain survivors (≤ K·|domains| rows — dimension-sized). The domain-
    pair result is |domains|² rows of scalars.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(domain_col).alias("__dom"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+")
        ).alias("__t"),
    ).filter(F.col("__t") != "")
    counts = toks.filter(F.col("__dom").isNotNull()).groupBy(
        "__dom", "__t"
    ).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("__dom").orderBy(F.desc("__c"), F.asc("__t"))
    top = (
        counts.select("*", F.row_number().over(w).alias("__r"))
        .filter(F.col("__r") <= top_k)
        .select("__dom", "__t")
        .localCheckpoint()
    )
    sizes = top.groupBy("__dom").agg(F.count(F.lit(1)).alias("__sz"))
    inter = (
        top.select(F.col("__dom").alias("__da"), "__t")
        .join(top.select(F.col("__dom").alias("__db"), "__t"), "__t")
        .filter(F.col("__da") < F.col("__db"))
        .groupBy("__da", "__db")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    # dense pair grid so disjoint-vocab pairs emit jaccard 0, not no row
    grid = (
        sizes.select(F.col("__dom").alias("__da"), F.col("__sz").alias("__sa"))
        .withColumn("__k", F.lit(1))
        .join(
            F.broadcast(
                sizes.select(
                    F.col("__dom").alias("__db"), F.col("__sz").alias("__sb")
                ).withColumn("__k", F.lit(1))
            ),
            "__k",
        )
        .filter(F.col("__da") < F.col("__db"))
        .drop("__k")
    )
    out = grid.join(inter, ["__da", "__db"], "left").select(
        F.col("__da").alias("domain_a"),
        F.col("__db").alias("domain_b"),
        F.col("__sa").cast("long").alias("size_a"),
        F.col("__sb").cast("long").alias("size_b"),
        F.coalesce("__common", F.lit(0)).cast("long").alias("common"),
        F.round(
            F.coalesce("__common", F.lit(0))
            / (F.col("__sa") + F.col("__sb") - F.coalesce("__common", F.lit(0))).cast(
                "double"
            ),
            round_to,
        ).alias("jaccard"),
    )
    return out.orderBy("domain_a", "domain_b")


def oov_rate(
    df: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_top_k: int = 500,
    round_to: int = 6,
) -> DataFrame:
    """Out-of-vocabulary rate per domain against the corpus-global
    top-``ref_top_k`` vocabulary → (domain, total_tokens, oov_tokens,
    oov_rate): the fraction of a domain's token OCCURRENCES not covered
    by the shared head vocabulary (count desc, term asc tiebreak).

    The tokenizer-budget diagnostic: a domain with a high OOV rate
    against the global head vocab will fragment into subwords/bytes and
    eat the token budget — raise its vocab share or normalize its text
    before training.

    Plan: one (domain, term) count aggregate feeds BOTH the global vocab
    (a second small aggregate over it + TakeOrdered limit — no window,
    no vocabulary sort shuffle) and the per-domain totals; coverage is a
    broadcast left-join of the per-(domain, term) counts against the
    K-row vocab. Two corpus-free joins after the single corpus pass.
    """
    toks = df.select(
        F.col(domain_col).alias("__dom"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+")
        ).alias("__t"),
    ).filter((F.col("__t") != "") & F.col("__dom").isNotNull())
    counts = toks.groupBy("__dom", "__t").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint()
    vocab = (
        counts.groupBy("__t")
        .agg(F.sum("__c").alias("__g"))
        .orderBy(F.desc("__g"), F.asc("__t"))
        .limit(ref_top_k)
        .select("__t", F.lit(1).alias("__in"))
    )
    cov = counts.join(F.broadcast(vocab), "__t", "left").groupBy("__dom").agg(
        F.sum("__c").alias("__tot"),
        F.sum(F.when(F.col("__in").isNull(), F.col("__c")).otherwise(0)).alias(
            "__oov"
        ),
    )
    # dense domain axis (the rbo_overlap lesson): a domain whose documents
    # tokenize to nothing still shows up, as (0, 0, NULL), instead of
    # silently vanishing from the coverage report
    doms = (
        df.filter(F.col(domain_col).isNotNull())
        .select(F.col(domain_col).alias("__dom"))
        .distinct()
    )
    return (
        doms.join(cov, "__dom", "left")
        .select(
            F.col("__dom").alias("domain"),
            F.coalesce(F.col("__tot"), F.lit(0)).cast("long").alias("total_tokens"),
            F.coalesce(F.col("__oov"), F.lit(0)).cast("long").alias("oov_tokens"),
            F.round(
                F.try_divide(F.col("__oov"), F.col("__tot").cast("double")),
                round_to,
            ).alias("oov_rate"),
        )
        .orderBy("domain")
    )


def burrows_delta(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_k: int = 150,
    round_to: int = 6,
) -> DataFrame:
    """Burrows' Delta stylometric distance between author/source groups
    (Burrows 2002, the standard attribution measure) → one row per
    unordered group pair: (group_a, group_b, n_terms, delta) with

        f_gw  = count of word w in group g / group g's token total
        z_gw  = (f_gw − mean_g' f_g'w) / stddev_g' f_g'w
        Delta = mean over the top-``top_k`` corpus words |z_aw − z_bw|

    over the corpus's most frequent words (the classic function-word
    proxy — style lives in 'the/of/and' rates, content in the tail).
    Words whose frequency is CONSTANT across groups (sd = 0) carry no
    stylometric signal and are excluded from the mean; ``n_terms`` is
    the per-pair surviving word count. The provenance/contamination
    screen: a "new" source whose Delta to an existing one is near 0 is
    the same pipeline wearing a different label.

    Plan: one (group, term) corpus aggregate, TakeOrdered global top-K
    (no vocabulary sort shuffle), a dense group×word grid (missing word
    → frequency 0), per-word moments ACROSS groups (word-keyed
    aggregate over |groups| rows), and a word-keyed pair join over
    K·|groups| rows — everything after the first aggregate is
    dimension-sized.
    """
    from pyspark.sql import Window  # noqa: F401  (module convention)

    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+")
        ).alias("__t"),
    ).filter((F.col("__t") != "") & F.col("__g").isNotNull())
    counts = toks.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint()
    vocab = (
        counts.groupBy("__t")
        .agg(F.sum("__c").alias("__tot"))
        .orderBy(F.desc("__tot"), F.asc("__t"))
        .limit(top_k)
        .select("__t")
    )
    gtot = counts.groupBy("__g").agg(F.sum("__c").alias("__gt"))
    grid = (
        gtot.withColumn("__k", F.lit(1))
        .join(F.broadcast(vocab.withColumn("__k", F.lit(1))), "__k")
        .drop("__k")
    )
    freq = (
        grid.join(counts, ["__g", "__t"], "left")
        .select(
            "__g",
            "__t",
            (F.coalesce("__c", F.lit(0)) / F.col("__gt").cast("double")).alias("__f"),
        )
        .localCheckpoint()
    )
    moments = freq.groupBy("__t").agg(
        F.avg("__f").alias("__mu"), F.stddev_samp("__f").alias("__sd")
    )
    zs = (
        freq.join(F.broadcast(moments), "__t")
        .filter(F.col("__sd") > 0)
        .select(
            "__g", "__t", ((F.col("__f") - F.col("__mu")) / F.col("__sd")).alias("__z")
        )
    )
    pairs = (
        zs.select(F.col("__g").alias("__ga"), "__t", F.col("__z").alias("__za"))
        .join(
            zs.select(F.col("__g").alias("__gb"), "__t", F.col("__z").alias("__zb")),
            "__t",
        )
        .filter(F.col("__ga") < F.col("__gb"))
    )
    agg = pairs.groupBy("__ga", "__gb").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(F.avg(F.abs(F.col("__za") - F.col("__zb"))), round_to).alias(
            "delta"
        ),
    )
    # dense pair grid (the rbo_overlap lesson): a pair with NO surviving
    # word (all top-K frequencies constant across groups — pathological
    # but possible with verbatim-duplicate corpora) emits (0, NULL)
    # instead of silently vanishing from the report
    doms = gtot.select("__g")
    grid = (
        doms.select(F.col("__g").alias("__ga"))
        .withColumn("__k", F.lit(1))
        .join(
            F.broadcast(
                doms.select(F.col("__g").alias("__gb")).withColumn("__k", F.lit(1))
            ),
            "__k",
        )
        .filter(F.col("__ga") < F.col("__gb"))
        .drop("__k")
    )
    return (
        grid.join(agg, ["__ga", "__gb"], "left")
        .select(
            F.col("__ga").alias("group_a"),
            F.col("__gb").alias("group_b"),
            F.coalesce("n_terms", F.lit(0).cast("long")).alias("n_terms"),
            "delta",
        )
        .orderBy("group_a", "group_b")
    )


def tfidf_domain_cosine(
    df: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 200,
    round_to: int = 6,
) -> DataFrame:
    """TF-IDF cosine similarity between domain centroid vectors → one
    row per unordered domain pair: (domain_a, domain_b, cosine) with
    each domain represented by the vector (count of w in domain) ·
    ln(N_docs / df_w) over the top-``top_k`` corpus words.

    The frequency-weighted companion to [vocab_overlap] (which reads
    set membership only) and the sparse-lexical analogue of
    [embedding_centroids]: high cosine = candidates for merging a
    mixture bucket; near-zero = distinct registers that need their own
    quality thresholds.

    Plan: one (domain, term) corpus aggregate + one (term, doc) distinct
    projection for df (the second corpus pass — IDF needs document
    frequency, not collection frequency), TakeOrdered top-K vocab,
    broadcast IDF join, norm aggregates, and a term-keyed pair join over
    K·|domains| rows.
    """
    toks = df.select(
        F.col(domain_col).alias("__dom"),
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f]+")
        ).alias("__t"),
    ).filter((F.col("__t") != "") & F.col("__dom").isNotNull())
    counts = toks.groupBy("__dom", "__t").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint()
    n_docs = df.filter(F.col(domain_col).isNotNull()).select(id_col).distinct().count()
    dfreq = toks.select("__t", "__id").distinct().groupBy("__t").agg(
        F.count(F.lit(1)).alias("__df")
    )
    vocab = (
        counts.groupBy("__t")
        .agg(F.sum("__c").alias("__tot"))
        .orderBy(F.desc("__tot"), F.asc("__t"))
        .limit(top_k)
        .select("__t")
        .join(dfreq, "__t")
        .select("__t", F.log(F.lit(float(n_docs)) / F.col("__df")).alias("__idf"))
    )
    vec = counts.join(F.broadcast(vocab), "__t").select(
        "__dom", "__t", (F.col("__c") * F.col("__idf")).alias("__w")
    ).localCheckpoint()
    norms = vec.groupBy("__dom").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__nrm")
    )
    dots = (
        vec.select(F.col("__dom").alias("__da"), "__t", F.col("__w").alias("__wa"))
        .join(
            vec.select(F.col("__dom").alias("__db"), "__t", F.col("__w").alias("__wb")),
            "__t",
        )
        .filter(F.col("__da") < F.col("__db"))
        .groupBy("__da", "__db")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    # dense pair grid (the rbo_overlap lesson): domains sharing NO vocab
    # term have cosine exactly 0 — emit it rather than dropping the pair
    grid = (
        norms.select(F.col("__dom").alias("__da"), F.col("__nrm").alias("__na"))
        .withColumn("__k", F.lit(1))
        .join(
            F.broadcast(
                norms.select(
                    F.col("__dom").alias("__db"), F.col("__nrm").alias("__nb")
                ).withColumn("__k", F.lit(1))
            ),
            "__k",
        )
        .filter(F.col("__da") < F.col("__db"))
        .drop("__k")
    )
    out = grid.join(dots, ["__da", "__db"], "left").select(
        F.col("__da").alias("domain_a"),
        F.col("__db").alias("domain_b"),
        F.round(
            F.try_divide(
                F.coalesce("__dot", F.lit(0.0)), F.col("__na") * F.col("__nb")
            ),
            round_to,
        ).alias("cosine"),
    )
    return out.orderBy("domain_a", "domain_b")
