"""Byte-pair-encoding vocabulary induction, Spark-first.

Training-data pipelines induce tokenizer vocabularies from the corpus
itself (BPE — Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"). The classic algorithm is a driver loop over a
tiny state (the merge table) with all heavy statistics distributed:

1. Collapse the corpus to a WORD-FREQUENCY table once (``groupBy word``) —
   all later passes run over distinct words weighted by count, which is
   orders of magnitude smaller than the corpus (Heaps' law), the same
   move the reference tokenizers make.
2. Per merge step: count adjacent symbol pairs (one weighted groupBy →
   2-row-ish top-1), pick the most frequent pair (lexicographic
   tie-break for determinism), and rewrite every word's symbol array with
   a NATIVE leftmost-greedy fold (``F.aggregate`` lambda — no Python UDF:
   the merge pass stays in whole-stage codegen).

Each iteration is one shuffle (the pair-count groupBy) plus a 1-row
driver fetch — the same shape as k-means/PageRank here (operators/graph.py)
and the only driver-side state is the merge list itself.
``localCheckpoint`` every few steps cuts the lineage so step N's plan
doesn't replay steps 1..N-1.

At 100 TB: the word-frequency table for a web corpus is ~10^7-10^8 rows
(bounded by vocabulary, not corpus size), so every per-step pass is small;
the single corpus-wide pass is step 0's word count, which is a plain
map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_freqs", "pair_counts", "bpe_train", "bpe_merge_pass"]

# end-of-word marker, as in the original BPE formulation (distinguishes
# "est</w>" in "newest" from "est" in "estimate")
EOW = "▁"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq, syms) with syms the initial char-level symbol
    sequence (end-of-word marker appended). The ONE corpus-wide pass."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    wf = words.groupBy("word").agg(F.count("*").alias("freq"))
    return wf.withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ),
    )


def pair_counts(wf: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the word-frequency table:
    (left, right, cnt). Native transform+explode, map-side combined."""
    # sequence(0, -1) DESCENDS in Spark, so single-symbol words (fully merged)
    # need the explicit empty-array guard
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) < 2 THEN cast(array() as array<struct<left:string,right:string>>) "
                "ELSE transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS left, syms[i+1] AS right)) END"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_merge_pass(wf: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every syms array replacing adjacent (left, right) with the
    concatenated token — leftmost-greedy, single pass, fully native.

    The fold carries (out, pend): ``pend`` is the previous symbol not yet
    emitted; when (pend, sym) matches the pair they fuse, which also blocks
    the fused token from re-merging with the NEXT symbol within this pass
    (classic BPE: counts are recomputed between passes).
    """
    merged = left + right
    expr = (
        "aggregate(syms, "
        "struct(cast(array() as array<string>) AS out, cast(NULL as string) AS pend), "
        "(acc, s) -> CASE "
        "WHEN acc.pend IS NULL THEN struct(acc.out AS out, s AS pend) "
        f"WHEN acc.pend = {_sq(left)} AND s = {_sq(right)} "
        f"THEN struct(array_append(acc.out, {_sq(merged)}) AS out, cast(NULL as string) AS pend) "
        "ELSE struct(array_append(acc.out, acc.pend) AS out, s AS pend) END, "
        "acc -> CASE WHEN acc.pend IS NULL THEN acc.out "
        "ELSE array_append(acc.out, acc.pend) END)"
    )
    return wf.withColumn("syms", F.expr(expr))


def _sq(s: str) -> str:
    """SQL single-quoted string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 4,
):
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, wf)``: ``merges`` is a list of
    ``(step, left, right, cnt)`` in learned order (the tokenizer's merge
    table — the thing you ship), ``wf`` the final word-frequency table with
    post-merge symbol arrays (for inspection / encoding).

    Stops early when the best pair's weighted count drops below
    ``min_count``.
    """
    spark = docs.sparkSession
    wf = word_freqs(docs, text_col=text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        best = (
            pair_counts(wf)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
        merges.append((step, left, right, cnt))
        wf = bpe_merge_pass(wf, left, right)
        if (step + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint()
    return merges, wf


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Merge list → DataFrame (step, left, right, merged, cnt)."""
    return spark.createDataFrame(
        [(s, l, r, l + r, c) for (s, l, r, c) in merges],
        "step int, left string, right string, merged string, cnt bigint",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "tokens",
    id_cols: list[str] | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenize a corpus with a learned merge table → (id_cols..., tokens).

    Scale shape: the merge replay runs over the DISTINCT-WORD dictionary
    (vocabulary-bounded, like training), then the per-document token
    sequence is assembled by a word-keyed join + one ordered re-aggregation
    — the corpus text is never folded row-by-row. At 100 TB that keeps the
    k merge passes over ~10^7 dictionary rows instead of 10^11 documents,
    and the single corpus-scale join is an equi-join on the word (AQE
    broadcasts the dictionary when it fits).

    ``merges`` is the list returned by :func:`bpe_train` (order matters);
    ``id_cols`` defaults to every non-text column of ``docs``.
    """
    if id_cols is None:
        id_cols = [c for c in docs.columns if c != text_col]
    words = docs.select(
        *id_cols,
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    vocab = words.select("word").distinct().withColumn(
        "syms", F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    )
    for i, (_step, left, right, _cnt) in enumerate(merges):
        vocab = bpe_merge_pass(vocab, left, right)
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    joined = words.join(vocab, "word")
    return (
        joined.groupBy(*id_cols)
        .agg(
            F.flatten(
                F.expr("transform(array_sort(collect_list(struct(pos, syms))), x -> x.syms)")
            ).alias(out_col)
        )
    )
