"""BPE vocabulary induction vs a pure-Python reference implementation."""

import re
from collections import Counter

from pyspark.sql import functions as F

from stackstac_spark.operators.bpe import (
    EOW,
    bpe_merge_pass,
    bpe_train,
    pair_counts,
    word_freqs,
)


def _ref_bpe(texts, n_merges, min_count=2):
    """Sennrich-style reference: word-freq table, greedy merges, leftmost
    single-pass rewrite, (count desc, pair lexicographic) selection."""
    wf = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wf[w] += 1
    syms = {w: list(w) + [EOW] for w in wf}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, freq in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += freq
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < min_count:
            break
        merges.append((step, l, r, cnt))
        for w in syms:
            s, out, pend = syms[w], [], None
            for tok in s:
                if pend is None:
                    pend = tok
                elif pend == l and tok == r:
                    out.append(l + r)
                    pend = None
                else:
                    out.append(pend)
                    pend = tok
            if pend is not None:
                out.append(pend)
            syms[w] = out
    return merges, syms


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the newest low lower the the",
]


def test_word_freqs_and_pair_counts(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string")
    wf = word_freqs(docs)
    got = {r["word"]: (r["freq"], r["syms"]) for r in wf.collect()}
    assert got["low"] == (6, ["l", "o", "w", EOW])
    assert got["newest"][0] == 7
    pc = {(r["left"], r["right"]): r["cnt"] for r in pair_counts(wf).collect()}
    # 'lo' appears in low(6) + lower(3) = 9
    assert pc[("l", "o")] == 9
    assert pc[("e", "s")] == pc[("s", "t")] == 9  # newest(7) + widest(2)


def test_merge_pass_leftmost_greedy(spark):
    df = spark.createDataFrame(
        [("aaa", 1, ["a", "a", "a", EOW])], "word string, freq long, syms array<string>"
    )
    out = bpe_merge_pass(df, "a", "a").collect()[0]["syms"]
    # leftmost-first, no overlap: [aa, a, EOW] not [a, aa, EOW]
    assert out == ["aa", "a", EOW]


def test_merge_pass_is_native(spark):
    df = spark.createDataFrame(
        [("ab", 1, ["a", "b", EOW])], "word string, freq long, syms array<string>"
    )
    plan = bpe_merge_pass(df, "a", "b")._sc._jvm.PythonSQLUtils.explainString(
        bpe_merge_pass(df, "a", "b")._jdf.queryExecution(), "simple"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string")
    merges, wf = bpe_train(docs, n_merges=8, min_count=2)
    ref_merges, ref_syms = _ref_bpe(TEXTS, 8, min_count=2)
    assert merges == ref_merges
    got_syms = {r["word"]: list(r["syms"]) for r in wf.collect()}
    assert got_syms == ref_syms


def test_bpe_train_early_stop(spark):
    docs = spark.createDataFrame([(0, "x y z")], "doc_id int, text string")
    merges, _ = bpe_train(docs, n_merges=10, min_count=2)
    assert merges == []  # every pair count is 1 < min_count


def test_bpe_train_quote_safe(spark):
    # symbols containing quotes/backslashes must survive the SQL-literal path
    docs = spark.createDataFrame(
        [(0, "don't don't don't can't")], "doc_id int, text string"
    )
    merges, wf = bpe_train(docs, n_merges=6, min_count=2)
    ref_merges, ref_syms = _ref_bpe(["don't don't don't can't"], 6, min_count=2)
    assert merges == ref_merges
    assert {r["word"]: list(r["syms"]) for r in wf.collect()} == ref_syms


def test_bpe_encode_matches_reference(spark):
    from stackstac_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string")
    merges, _ = bpe_train(docs, n_merges=8, min_count=2)
    enc = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(docs, merges).collect()}
    _, ref_syms = _ref_bpe(TEXTS, 8, min_count=2)
    for i, t in enumerate(TEXTS):
        want = []
        for w in re.split(r"\s+", t.lower()):
            if w:
                want += ref_syms[w]
        assert enc[i] == want, (i, enc[i], want)


def test_bpe_encode_empty_merges_is_char_level(spark):
    from stackstac_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(0, "ab ba")], "doc_id int, text string")
    enc = bpe_encode(docs, []).collect()[0]["tokens"]
    assert enc == ["a", "b", EOW, "b", "a", EOW]
