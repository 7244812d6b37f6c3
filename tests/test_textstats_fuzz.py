"""Property-based checks for the r4 text operators: random token corpora,
oracle = a direct pure-Python recount of the same definition. Catches
off-by-one n-gram windows, distinct-vs-total confusions, and tie-break
drift that a fixed example would miss."""

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.sampled_from(["a", "b", "c", "dd", "eee", "fg"])
doc = st.lists(words, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


def _grams(text: str, n: int = 3) -> list[str]:
    t = text.lower().split(" ")
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)] if len(t) >= n else []


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_repetition_stats_matches_python(spark, texts):
    from stackstac_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in repetition_stats(df, n=3).collect()}
    for i, t in enumerate(texts):
        grams = _grams(t)
        if not grams:
            assert i not in got
            continue
        c = Counter(grams)
        assert got[i].n_ngrams == len(grams)
        assert got[i].n_distinct_ngrams == len(c)
        assert got[i].dup_ngram_ratio == pytest.approx(
            round(1 - len(c) / len(grams), 6), abs=1e-9
        )
        assert got[i].top_ngram_frac == pytest.approx(
            round(max(c.values()) / len(grams), 6), abs=1e-9
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus, probe_texts=st.lists(doc, min_size=1, max_size=4))
def test_contamination_matches_python(spark, texts, probe_texts):
    from stackstac_spark.operators.textstats import ngram_contamination

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    probe = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(probe_texts)], "doc_id LONG, text STRING"
    )
    got = {r.doc_id: r for r in ngram_contamination(docs, probe, n=3).collect()}
    probe_set = {g for t in probe_texts for g in _grams(t)}
    for i, t in enumerate(texts):
        grams = set(_grams(t))
        if not grams:
            assert i not in got
            continue
        hits = len(grams & probe_set)
        assert got[i].n_grams == len(grams)
        assert got[i].n_contaminated == hits
        assert got[i].contamination == pytest.approx(round(hits / len(grams), 6), abs=1e-9)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(doc.filter(lambda t: t.strip() != ""), min_size=1, max_size=6))
def test_tfidf_matches_python(spark, texts):
    from stackstac_spark.operators.textstats import tfidf_top_terms

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {}
    for r in tfidf_top_terms(df, k=3).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    n_docs = len(texts)
    tf = {i: Counter(t.lower().split(" ")) for i, t in enumerate(texts)}
    dfreq = Counter(term for c in tf.values() for term in c)
    for i in range(n_docs):
        scored = sorted(
            ((round(c * math.log(n_docs / dfreq[term]), 6), term) for term, c in tf[i].items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        want = [(rk + 1, term, s) for rk, (s, term) in enumerate(scored)]
        have = sorted(got.get(i, []))
        assert [(rk, t) for rk, t, _ in have] == [(rk, t) for rk, t, _ in want]
        for (_, _, a), (_, _, b) in zip(have, want):
            assert a == pytest.approx(b, abs=1e-9)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus, k=st.integers(min_value=2, max_value=4))
def test_span_dedup_matches_python(spark, texts, k):
    from stackstac_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in span_dedup(df, k=k).collect()}
    toks = {i: t.lower().split(" ") for i, t in enumerate(texts)}
    owners: dict[str, set] = {}
    for i, t in toks.items():
        for p in range(len(t) - k + 1):
            owners.setdefault(" ".join(t[p : p + k]), set()).add(i)
    for i, t in toks.items():
        covered = set()
        for p in range(len(t) - k + 1):
            if len(owners[" ".join(t[p : p + k])]) >= 2:
                covered.update(range(p, p + k))
        assert got[i].n_tokens == len(t)
        assert got[i].n_dup_tokens == len(covered)
        assert got[i].dup_frac == pytest.approx(
            round(len(covered) / max(len(t), 1), 6), abs=1e-9
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=12),
    shards=st.lists(st.sampled_from(["s0", "s1", "s2"]), min_size=1, max_size=12),
    cap=st.integers(min_value=1, max_value=9),
)
def test_pack_sequences_matches_python(spark, lens, shards, cap):
    from stackstac_spark.operators.packing import pack_sequences

    n = min(len(lens), len(shards))
    rows = [(shards[i], i, lens[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "source STRING, doc_id LONG, n LONG")
    got = {r.doc_id: r for r in pack_sequences(df, capacity=cap, len_col="n").collect()}
    offsets: dict[str, int] = {}
    for shard, i, ln in sorted(rows, key=lambda r: (r[0], r[1])):
        off = offsets.get(shard, 0)
        sc = off // cap
        ec = max((off + ln - 1) // cap, sc)
        r = got[i]
        assert (r.start_offset, r.start_chunk, r.end_chunk, r.n_chunks) == (
            off,
            sc,
            ec,
            ec - sc + 1,
        ), (i, shard, ln, cap)
        offsets[shard] = off + ln
    # packing is gap-free per shard: total tokens == final offset
    for shard in set(s for s, _, _ in rows):
        assert offsets[shard] == sum(ln for s, _, ln in rows if s == shard)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus, bt=st.sampled_from([2, 4]))
def test_paragraph_dedup_matches_python(spark, texts, bt):
    from stackstac_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in paragraph_dedup(df, block_tokens=bt).collect()}

    # python oracle: global first occurrence by (doc_id, pos)
    blocks = {}  # (doc, pos) -> block
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for p in range(0, math.ceil(len(toks) / bt)):
            blocks[(i, p)] = " ".join(toks[p * bt : (p + 1) * bt])
    first = {}
    for (i, p), b in sorted(blocks.items()):
        first.setdefault(b, (i, p))
    for i, t in enumerate(texts):
        toks = t.split(" ")
        nb = math.ceil(len(toks) / bt)
        kept = [
            blocks[(i, p)] for p in range(nb) if first[blocks[(i, p)]] == (i, p)
        ]
        assert got[i].n_blocks == nb
        assert got[i].n_kept == len(kept)
        assert got[i].clean_text == " ".join(kept)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus, mod=st.sampled_from([2, 4, 8]))
def test_cdc_chunks_matches_python(spark, texts, mod):
    import hashlib

    from stackstac_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in cdc_chunks(df, boundary_mod=mod).collect()}

    def nib(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[31], 16)

    chunks_by_doc = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        chunks, cur = [], []
        for tok in toks:
            cur.append(tok)
            if nib(tok) % mod == 0:
                chunks.append(" ".join(cur)); cur = []
        if cur:
            chunks.append(" ".join(cur))
        chunks_by_doc[i] = chunks
    owners = {}
    for i, cs in chunks_by_doc.items():
        for c in cs:
            owners.setdefault(c, set()).add(i)
    for i, cs in chunks_by_doc.items():
        dup = sum(1 for c in cs if len(owners[c]) > 1)
        assert got[i].n_chunks == len(cs)
        assert got[i].n_dup_chunks == dup
        assert got[i].dup_frac == pytest.approx(round(dup / len(cs), 6), abs=1e-9)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(doc, min_size=1, max_size=10),
    budget=st.sampled_from([0, 5, 20, 10**6]),
)
def test_mixture_sample_matches_python(spark, texts, budget):
    import hashlib

    from stackstac_spark.operators.sampling import mixture_sample

    rows = [(i, f"d{i % 2}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    weights = {"d0": 1.0, "d1": 3.0}
    got = sorted(r.doc_id for r in mixture_sample(df, weights, budget).collect())

    per = {"d0": [], "d1": []}
    for i, d, t in rows:
        per[d].append((hashlib.md5(f":{i}".encode()).hexdigest(), i, len(t.split(" "))))
    want = []
    for d, items in per.items():
        b = budget * weights[d] / 4.0
        cum = 0
        for _, i, n in sorted(items):
            if cum < b:
                want.append(i)
            cum += n
    assert got == sorted(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(st.lists(words, min_size=0, max_size=20).map(" ".join), min_size=1, max_size=6))
def test_winnow_fingerprints_match_python_fuzz(spark, texts):
    """Winnowing set-variant vs a direct Python replay: k-gram md5 hashes,
    per-window minima over complete windows only, distinct per doc."""
    import hashlib as _hl

    from stackstac_spark.operators.dedup import winnow_fingerprints

    k, w = 3, 3
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        toks = t.lower().split(" ") if t else [""]
        if len(toks) < k + w - 1:
            assert i not in got
            continue
        hs = [
            int(_hl.md5(" ".join(toks[j : j + k]).encode()).hexdigest()[:8], 16)
            for j in range(len(toks) - k + 1)
        ]
        expect = {min(hs[s : s + w]) for s in range(len(hs) - w + 1)}
        assert got.get(i, set()) == expect, (i, t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=30),
    k=st.integers(min_value=1, max_value=8),
)
def test_weighted_sample_matches_python_fuzz(spark, weights, k):
    """A-ES weighted sampling vs the Python replay of key = -ln(u)/w with
    u from md5 — including zero-weight drops and k > n."""
    import hashlib as _hl
    import math as _m

    from stackstac_spark.operators.sampling import weighted_sample

    rows = [(i, float(wt)) for i, wt in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id LONG, w DOUBLE")
    got = [r.doc_id for r in weighted_sample(df, "w", k=k).collect()]

    keyed = []
    for i, wt in rows:
        if wt <= 0:
            continue
        u = (int(_hl.md5(f":{i}".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        keyed.append((-_m.log(u) / wt, i))
    expect = [i for _, i in sorted(keyed)[:k]]
    assert sorted(got) == sorted(expect)
