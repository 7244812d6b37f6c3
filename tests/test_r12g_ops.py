"""Known-value tests for the r12 seventh sub-wave: Nelson-Aalen cumulative
hazard + two-sample log-rank (survival.py), corpus chrF + ROUGE-N
(textstats.py), Bland-Altman agreement (evalmetrics.py), sequential
pattern support mining (graph.py)."""

import math
import random
import statistics
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _surv_fixture():
    random.seed(11)
    return [
        (float(random.randint(1, 10)), random.randint(0, 1), "A" if i % 3 else "B")
        for i in range(120)
    ]


def test_nelson_aalen_known(spark):
    from stackstac_spark.operators.survival import nelson_aalen

    rows = _surv_fixture()
    df = spark.createDataFrame(rows, "dur double, ev int, grp string")
    got = {
        r["t"]: (r["n_risk"], r["n_events"], r["cum_hazard"], r["hazard_var"])
        for r in nelson_aalen(df, "dur", "ev").collect()
    }
    H = V = 0.0
    exp = {}
    for t in sorted({t for t, e, _ in rows if e == 1}):
        n = sum(1 for d, e, _ in rows if d >= t)
        d = sum(1 for dd, e, _ in rows if dd == t and e == 1)
        H += d / n
        V += d * (n - d) / n**3
        exp[t] = (n, d, round(H, 6), round(V, 6))
    assert got == exp
    # S(t) ~ exp(-H(t)) sanity: hazard is monotone nondecreasing
    hs = [v[2] for _, v in sorted(exp.items())]
    assert hs == sorted(hs)


def test_nelson_aalen_grouped_and_guard(spark):
    from stackstac_spark.operators.survival import nelson_aalen

    rows = _surv_fixture()
    df = spark.createDataFrame(rows, "dur double, ev int, grp string")
    g = nelson_aalen(df, "dur", "ev", group_cols=["grp"]).collect()
    assert {r["grp"] for r in g} == {"A", "B"}
    # per-group rows match running the estimator on the filtered subset
    only_a = nelson_aalen(
        df.filter(F.col("grp") == "A"), "dur", "ev"
    ).collect()
    got_a = [r for r in g if r["grp"] == "A"]
    assert [(r["t"], r["cum_hazard"]) for r in got_a] == [
        (r["t"], r["cum_hazard"]) for r in only_a
    ]
    with pytest.raises(ValueError, match="max_distinct"):
        nelson_aalen(df, "dur", "ev", max_distinct=3)


def test_log_rank_known(spark):
    from stackstac_spark.operators.survival import log_rank

    rows = _surv_fixture()
    df = spark.createDataFrame(rows, "dur double, ev int, grp string")
    res = {r["group"]: r for r in log_rank(df, "dur", "ev", "grp").collect()}
    O1 = E1 = V = 0.0
    for t in sorted({t for t, e, _ in rows if e == 1}):
        nj = sum(1 for d, e, _ in rows if d >= t)
        dj = sum(1 for d, e, _ in rows if d == t and e == 1)
        n1 = sum(1 for d, e, g in rows if d >= t and g == "A")
        d1 = sum(1 for d, e, g in rows if d == t and e == 1 and g == "A")
        O1 += d1
        E1 += dj * n1 / nj
        if nj > 1:
            V += dj * (n1 / nj) * (1 - n1 / nj) * (nj - dj) / (nj - 1)
    chi2 = round((O1 - E1) ** 2 / V, 6)
    totd = sum(e for _, e, _ in rows)
    assert res["A"]["observed"] == int(O1)
    assert res["A"]["expected"] == pytest.approx(E1, abs=1e-6)
    assert res["B"]["observed"] == totd - int(O1)
    assert res["B"]["expected"] == pytest.approx(totd - E1, abs=1e-6)
    assert res["A"]["chi2"] == res["B"]["chi2"] == chi2
    # expectations sum to observed total (log-rank invariant)
    assert res["A"]["expected"] + res["B"]["expected"] == pytest.approx(totd, abs=1e-5)


def test_log_rank_identical_groups_near_zero(spark):
    from stackstac_spark.operators.survival import log_rank

    # same survival experience in both groups -> chi2 ~ 0
    rows = [(float(t), 1, g) for t in range(1, 11) for g in ("A", "B")]
    df = spark.createDataFrame(rows, "dur double, ev int, grp string")
    res = log_rank(df, "dur", "ev", "grp").collect()
    assert all(r["chi2"] == 0.0 for r in res)
    with pytest.raises(ValueError, match="exactly 2"):
        log_rank(
            spark.createDataFrame([(1.0, 1, "A")], "dur double, ev int, grp string"),
            "dur",
            "ev",
            "grp",
        )


_PAIRS = [
    ("the cat sat on the mat", "the cat is on the mat"),
    ("a quick brown fox", "the quick brown fox jumps"),
    ("hello world", "goodbye world"),
    ("xyz", "abc"),
]


def test_chrf_known(spark):
    from stackstac_spark.operators.textstats import chrf_corpus

    df = spark.createDataFrame(_PAIRS, "cand string, ref string")

    def chargrams(s, n):
        s = "".join(s.split())
        return (
            Counter(s[i : i + n] for i in range(len(s) - n + 1))
            if len(s) >= n
            else Counter()
        )

    N, beta = 6, 2.0
    Ps, Rs = [], []
    for n in range(1, N + 1):
        m = ct = rt = 0
        for c, r in _PAIRS:
            cc, rc = chargrams(c, n), chargrams(r, n)
            m += sum(min(v, rc[g]) for g, v in cc.items())
            ct += sum(cc.values())
            rt += sum(rc.values())
        Ps.append(m / ct if ct else 0.0)
        Rs.append(m / rt if rt else 0.0)
    P, R = sum(Ps) / N, sum(Rs) / N
    chrf = (1 + beta**2) * P * R / (beta**2 * P + R)
    got = chrf_corpus(df, "cand", "ref").first()
    assert got["n_pairs"] == 4
    assert got["prec"] == pytest.approx(P, abs=1e-6)
    assert got["recall"] == pytest.approx(R, abs=1e-6)
    assert got["chrf"] == pytest.approx(chrf, abs=1e-6)
    # identical pairs -> chrf = 1
    same = spark.createDataFrame([("abc def", "abc def")], "cand string, ref string")
    assert chrf_corpus(same, "cand", "ref").first()["chrf"] == 1.0
    # fully disjoint -> 0, not NULL/NaN
    disj = spark.createDataFrame([("aaaa", "bbbb")], "cand string, ref string")
    assert chrf_corpus(disj, "cand", "ref").first()["chrf"] == 0.0


def test_rouge_known(spark):
    from stackstac_spark.operators.textstats import rouge_n_corpus

    df = spark.createDataFrame(_PAIRS, "cand string, ref string")

    def wgrams(s, n):
        t = s.lower().split()
        return (
            Counter(" ".join(t[i : i + n]) for i in range(len(t) - n + 1))
            if len(t) >= n
            else Counter()
        )

    rows = {r["n"]: r for r in rouge_n_corpus(df, "cand", "ref").collect()}
    for n in (1, 2):
        m = ct = rt = 0
        for c, r in _PAIRS:
            cc, rc = wgrams(c, n), wgrams(r, n)
            m += sum(min(v, rc[g]) for g, v in cc.items())
            ct += sum(cc.values())
            rt += sum(rc.values())
        p, rr = m / ct, m / rt
        assert rows[n]["matches"] == m
        assert rows[n]["rouge_p"] == pytest.approx(p, abs=1e-6)
        assert rows[n]["rouge_r"] == pytest.approx(rr, abs=1e-6)
        assert rows[n]["rouge_f"] == pytest.approx(2 * p * rr / (p + rr), abs=1e-6)
    # single-token pairs have no bigrams: n=2 row present with 0 totals
    one = spark.createDataFrame([("hi", "hi")], "cand string, ref string")
    r2 = {r["n"]: r for r in rouge_n_corpus(one, "cand", "ref").collect()}
    assert r2[1]["rouge_f"] == 1.0
    assert r2[2]["cand_total"] == 0 and r2[2]["rouge_f"] is None


def test_bland_altman_known(spark):
    from stackstac_spark.operators.evalmetrics import bland_altman

    random.seed(3)
    rows = [
        ("g%d" % (i % 2), random.random() * 10, random.random() * 10 + 0.5)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, a double, b double")
    got = {
        r["grp"]: r for r in bland_altman(df, "a", "b", ["grp"]).collect()
    }
    for g in ("g0", "g1"):
        ds = [a - b for gg, a, b in rows if gg == g]
        m, sd = statistics.mean(ds), statistics.stdev(ds)
        lo, hi = m - 1.96 * sd, m + 1.96 * sd
        cov = sum(1 for d in ds if lo <= d <= hi) / len(ds)
        assert got[g]["n"] == len(ds)
        assert got[g]["bias"] == pytest.approx(m, abs=1e-6)
        assert got[g]["sd_diff"] == pytest.approx(sd, abs=1e-6)
        assert got[g]["loa_low"] == pytest.approx(lo, abs=1e-6)
        assert got[g]["loa_high"] == pytest.approx(hi, abs=1e-6)
        assert got[g]["within_loa"] == pytest.approx(cov, abs=1e-6)
    # ungrouped emits one row over everything
    u = bland_altman(df, "a", "b").collect()
    assert len(u) == 1 and u[0]["n"] == 300
    # identical scorers -> zero bias, zero sd, full coverage
    same = spark.createDataFrame([(1.0, 1.0), (2.0, 2.0)], "a double, b double")
    s = bland_altman(same, "a", "b").first()
    assert s["bias"] == 0.0 and s["sd_diff"] == 0.0 and s["within_loa"] == 1.0


def test_sequential_patterns_known(spark):
    from stackstac_spark.operators.graph import sequential_patterns

    ev = []
    random.seed(5)
    for s in range(40):
        for j in range(random.randint(1, 8)):
            ev.append((s, j, random.choice("abc")))
    df = spark.createDataFrame(ev, "s int, o int, it string")
    got = [
        (r["length"], r["pattern"], r["support"], r["support_frac"])
        for r in sequential_patterns(df, "s", ["o"], "it").collect()
    ]
    seqs = {}
    for s, o, it in sorted(ev):
        seqs.setdefault(s, []).append(it)
    pats = Counter()
    for items in seqs.values():
        seen = set()
        for n in (2, 3):
            for i in range(len(items) - n + 1):
                seen.add((n, ">".join(items[i : i + n])))
        for p in seen:
            pats[p] += 1
    nseq = len(seqs)
    exp = sorted(
        [(n, p, c, round(c / nseq, 6)) for (n, p), c in pats.items() if c >= 2],
        key=lambda x: (x[0], -x[2], x[1]),
    )
    assert got == exp
    # support counts distinct sequences: a repeat inside one sequence
    # contributes once
    rep = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "b"), (2, 0, "a"), (2, 1, "b")],
        "s int, o int, it string",
    )
    r = {
        (x["length"], x["pattern"]): x["support"]
        for x in sequential_patterns(rep, "s", ["o"], "it", min_support=1).collect()
    }
    assert r[(2, "a>b")] == 2
