"""Web-corpus preparation operators: URL canonicalization, registered-domain
extraction, per-domain caps, HTML boilerplate stripping, and blocklist
filtering.

These are the CommonCrawl-style normalization steps that run BEFORE dedup in
a web-scale training-data pipeline (C4 / RefinedWeb / FineWeb all start
here): a corpus keyed by raw URL double-counts every tracking-parameter
variant, and per-domain caps are the standard defense against a single host
dominating the mixture.

Everything in this module is pure Catalyst expression composition —
``regexp_replace`` / ``regexp_extract`` / array lambdas, all JVM-side inside
whole-stage codegen, no Python UDFs — so the ops are map-only and scale
linearly with input splits. The only shuffle in the module is
``domain_cap``'s per-domain window (hash-partitioned by registered domain,
the natural key; a pathological single-domain corpus is exactly the case the
cap exists to cut, and the window's TopK state is ``cap`` rows per task).

Reference scope note: the stackstac reference has no web-text surface; this
module belongs to the training-data-pipeline suite (SURVEY.md §6) alongside
operators/dedup.py and operators/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "registered_domain",
    "domain_cap",
    "strip_html",
    "blocklist_hits",
    "phrase_blocklist_hits",
    "json_schema_infer",
    "TRACKING_PARAM_RE",
    "TWO_LEVEL_SUFFIXES",
]

# query parameters that never change page identity (the usual analytics set)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)="

# minimal embedded public-suffix table: two-level suffixes under which the
# registered domain is the LAST THREE labels (full PSL is ~9k rows; callers
# with one can pass their own via the `two_level` argument)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za", "co.nz",
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a raw URL, as a Catalyst expression.

    Deterministic rewrite chain (every step a JVM regexp/array op):

    1. drop the fragment (``#…``),
    2. lowercase the scheme and authority (path/query case is preserved —
       paths ARE case-sensitive),
    3. drop a leading ``www.`` label,
    4. drop the explicit default port for the URL's OWN scheme — ``:80``
       for http, ``:443`` for https — with the rewrite anchored to the
       authority (a literal ``:443`` inside a path or query is data, and
       ``http://host:443/`` is a distinct resource from ``http://host/``,
       so neither is touched),
    5. drop tracking query parameters (:data:`TRACKING_PARAM_RE`) and sort
       the survivors byte-wise (param order never changes page identity),
    6. strip trailing slashes from the path.

    The chain is pure string algebra — replayable verbatim by any engine
    with RE2-compatible regexps, which is what the correctness oracle does.
    """
    u = F.regexp_replace(url, "#.*", "")
    # lowercase scheme://authority only
    prefix = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, F.lit(1 << 30)))
    u = F.regexp_replace(u, r"^(https?://)www\.", "$1")
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?#]|$)", "$1$2")
    path = F.split_part(u, F.lit("?"), F.lit(1))
    query = F.when(u.contains("?"), F.split_part(u, F.lit("?"), F.lit(2))).otherwise(
        F.lit("")
    )
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    path = F.regexp_replace(path, "/+$", "")
    return F.concat(
        path,
        F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))).otherwise(F.lit("")),
    )


def registered_domain(
    url_or_host: Column, two_level: tuple[str, ...] = TWO_LEVEL_SUFFIXES
) -> Column:
    """Registered (pay-level) domain of a URL or bare host, as an expression.

    Last two host labels, or last three when the host ends in a known
    two-level public suffix (``example.co.uk`` → ``example.co.uk``, not
    ``co.uk``). The suffix check is an ``array_contains`` over a literal
    array — constant-folded by Catalyst, no join.
    """
    host = F.when(
        url_or_host.contains("://"),
        F.regexp_extract(url_or_host, r"^[a-z]+://([^/:?#]+)", 1),
    ).otherwise(F.split_part(url_or_host, F.lit(":"), F.lit(1)))
    host = F.lower(host)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.array_join(F.slice(parts, n - 2, 3), ".")
    suffixes = F.array(*[F.lit(s) for s in two_level])
    return F.when(
        (n >= 3) & F.array_contains(suffixes, last2), last3
    ).otherwise(F.when(n >= 2, last2).otherwise(host))


def domain_cap(
    df: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    cap: int = 10,
) -> DataFrame:
    """Keep at most ``cap`` rows per registered domain, chosen by a
    deterministic per-row hash (md5 of the id) so the survivors are an
    unbiased, reproducible sample — the standard guard against one host
    dominating a web corpus.

    One window, hash-partitioned by domain; rank state per task is ``cap``
    rows. Skew note: the very domains the cap targets are the skewed keys,
    but the window's running state is O(1) per row, so a hot domain costs
    one fat task of pure streaming rank — no buffering of the partition.
    Output keeps all input columns plus ``domain_rank``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
    )


def strip_html(html: Column) -> Column:
    """Plain text from an HTML payload: drop ``<script>``/``<style>``
    elements wholesale (their CONTENT is code, not prose), drop comments,
    drop remaining tags, decode the six common entities, collapse
    whitespace. The extraction step of a C4-style web pipeline, as one
    JVM regexp chain (RE2-compatible patterns; ``(?s)`` makes ``.`` span
    newlines for the block elements)."""
    t = F.regexp_replace(html, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def blocklist_hits(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_col: str = "word",
    max_ratio: float = 0.05,
) -> DataFrame:
    """Per-document blocklist hit statistics + keep/drop verdict.

    Tokenizes (lowercased whitespace split), counts tokens matching the
    blocklist, and flags documents whose hit ratio exceeds ``max_ratio`` —
    the standard bad-words screen.

    Scale shape: the blocklist is a dimension table (thousands of rows at
    most) — the token⋈blocklist equi-join is explicitly ``broadcast()``,
    so the only wide exchange is the doc-keyed count aggregation, which is
    partial-aggregated map-side. Docs with zero hits survive via the left
    join back onto the input ids (an inner join would silently drop them
    from the verdict table).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    )
    totals = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    hits = (
        toks.join(
            F.broadcast(blocklist.select(F.col(word_col).alias("tok"))), "tok"
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        totals.join(hits, id_col, "left")
        .fillna({"n_hits": 0})
        .select(
            id_col,
            "n_tokens",
            "n_hits",
            # raw IEEE division (no rounding): bit-identical across engines,
            # so the correctness oracle hash-matches without tolerance
            (F.col("n_hits") / F.col("n_tokens")).alias("hit_ratio"),
            (F.col("n_hits") / F.col("n_tokens") <= max_ratio).alias("keep"),
        )
    )


def phrase_blocklist_hits(
    df: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
    max_phrase_words: int = 4,
) -> DataFrame:
    """Multi-word phrase screening — the phrase-level counterpart to
    :func:`blocklist_hits` (single tokens can't express "click here" or
    "all rights reserved", the phrases that actually mark boilerplate/spam).

    Matching is by word n-gram equality per phrase LENGTH: documents emit
    n-grams only for the lengths that actually occur in the phrase table
    (computed from the broadcast table itself), each n-gram stream joins
    the equal-length phrase subset, and hits aggregate per doc. Occurrences
    are counted positionally (overlaps included), like a scanning matcher
    would.

    Scale shape: the phrase table is a dimension — broadcast join per
    length; the n-gram explode is the only data-sized cost (Σ lengths ×
    tokens), and lengths absent from the table cost nothing. Zero-hit docs
    survive via the left join back onto input ids. ``max_phrase_words``
    guards against a degenerate table exploding the corpus (a 40-word
    "phrase" would 40× the scan) — longer entries raise.
    """
    plen = phrases.select(
        F.col(phrase_col).alias("p"),
        F.size(F.split(F.col(phrase_col), " ")).alias("n"),
    )
    lengths = sorted(
        r["n"] for r in plen.select("n").distinct().collect()
    )
    if lengths and lengths[-1] > max_phrase_words:
        raise ValueError(
            f"phrase table contains a {lengths[-1]}-word phrase; "
            f"max_phrase_words={max_phrase_words} (each extra word multiplies "
            "the corpus-side n-gram explode)"
        )
    toks = df.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("t")
    )
    hits = None
    for n in lengths:
        grams = toks.filter(F.size("t") >= n).select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {n}), "
                    f"i -> concat_ws(' ', slice(t, i + 1, {n})))"
                )
            ).alias("p"),
        )
        h = grams.join(
            F.broadcast(plen.filter(F.col("n") == n).select("p")), "p"
        ).select(id_col, "p")
        hits = h if hits is None else hits.unionAll(h)
    base = df.select(id_col)
    if hits is None:
        return base.select(
            id_col,
            F.lit(0).cast("long").alias("n_phrase_hits"),
            F.lit(0).cast("long").alias("n_distinct_phrases"),
        )
    agg = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_phrase_hits"),
        F.countDistinct("p").alias("n_distinct_phrases"),
    )
    return (
        base.join(agg, id_col, "left")
        .fillna({"n_phrase_hits": 0, "n_distinct_phrases": 0})
        .select(id_col, "n_phrase_hits", "n_distinct_phrases")
    )


def json_schema_infer(
    df: DataFrame,
    json_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Lexical JSON schema profile of a payload column → one row per
    (key, value_type) with occurrence count and row coverage — the "what
    is actually in these crawl/event payloads?" report that precedes any
    typed extraction.

    Keys and value tokens come from ONE regexp_extract_all over the raw
    text (RE2-compatible, no backrefs), classified by the value token's
    first characters: string / object / array / boolean / null / number.
    LEXICAL by design and documented as such: nested objects' inner keys
    are counted too (every ``"key":`` pair in the text), and a string
    that lexically looks like a number is still a string (the quote
    decides). Map-only expressions + one (key, type) aggregate — no JSON
    parser, no UDF, no shuffle beyond the count."""
    pat = r'"((?:[^"\\]|\\.)*)"\s*:\s*("(?:[^"\\]|\\.)*"|\{|\[|true|false|null|-?[0-9][-+.eE0-9]*)'
    n_rows = df.count()
    pairs = df.select(
        F.explode(F.regexp_extract_all(F.col(json_col), F.lit(pat), F.lit(0))).alias("m")
    ).select(
        F.regexp_extract(F.col("m"), r'^"((?:[^"\\]|\\.)*)"', 1).alias("key"),
        F.regexp_replace(F.col("m"), r'^"(?:[^"\\]|\\.)*"\s*:\s*', "").alias("v"),
    )
    vtype = (
        F.when(F.col("v").startswith('"'), "string")
        .when(F.col("v") == "{", "object")
        .when(F.col("v") == "[", "array")
        .when(F.col("v").isin("true", "false"), "boolean")
        .when(F.col("v") == "null", "null")
        .otherwise("number")
    )
    return (
        pairs.select("key", vtype.alias("value_type"))
        .groupBy("key", "value_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "coverage", F.round(F.col("n").cast("double") / F.lit(float(n_rows)), round_to)
        )
        .orderBy("key", "value_type")
    )
