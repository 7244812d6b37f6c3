"""r9 wave-1 operators: drift detection (KS / PSI / Mann-Whitney) and
ranking evaluation (ROC-AUC / nDCG@k) — brute-force Python oracles and
hand-computed cases, incl. the tie paths the rank identities depend on."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ks_brute(ref, grp):
    pts = sorted(set(ref) | set(grp))
    return max(
        abs(
            sum(1 for v in ref if v <= x) / len(ref)
            - sum(1 for v in grp if v <= x) / len(grp)
        )
        for x in pts
    )


def test_ks_statistic_vs_brute(spark):
    import random

    from stackstac_spark.operators.drift import ks_statistic

    rng = random.Random(5)
    rows = [("ref", rng.randrange(0, 40)) for _ in range(120)]
    rows += [("a", rng.randrange(10, 50)) for _ in range(80)]   # shifted
    rows += [("b", rng.randrange(0, 40)) for _ in range(60)]    # same law
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["group"]: r for r in ks_statistic(df, "v", "g", "ref").collect()}
    ref = [v for g, v in rows if g == "ref"]
    for g in ("a", "b"):
        grp = [v for gg, v in rows if gg == g]
        assert out[g]["ks_d"] == pytest.approx(_ks_brute(ref, grp), abs=1e-6)
        assert out[g]["n_ref"] == 120 and out[g]["n_grp"] == len(grp)
    assert out["a"]["ks_d"] > out["b"]["ks_d"]  # the shifted group drifts more


def test_psi_identical_is_zero_and_shift_is_large(spark):
    from stackstac_spark.operators.drift import psi

    rows = [("ref", float(v)) for v in range(100)]
    rows += [("same", float(v)) for v in range(100)]
    rows += [("shift", float(v) + 80.0) for v in range(100)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["group"]: r["psi_value"] for r in psi(df, "v", "g", "ref").collect()}
    assert out["same"] == pytest.approx(0.0, abs=1e-9)
    assert out["shift"] > 0.25  # conventional "shifted" gate


def test_psi_brute_match(spark):
    import random

    from stackstac_spark.operators.drift import psi

    rng = random.Random(9)
    ref = [rng.uniform(0, 10) for _ in range(200)]
    grp = [rng.uniform(2, 12) for _ in range(150)]
    rows = [("ref", v) for v in ref] + [("g", v) for v in grp]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = psi(df, "v", "g", "ref", bins=10).collect()[0]["psi_value"]

    rmin, rmax = min(ref), max(ref)
    w = (rmax - rmin) / 10

    def hist(vals):
        h = [0] * 10
        for v in vals:
            h[max(0, min(9, int((v - rmin) // w)))] += 1
        return [max(c / len(vals), 1e-6) for c in h]

    p, q = hist(grp), hist(ref)
    want = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    assert got == pytest.approx(want, abs=1e-6)


def test_mann_whitney_hand_case_with_ties(spark):
    from stackstac_spark.operators.drift import mann_whitney_u

    # A = [1, 2, 2, 5], B = [2, 3, 3]; ranks: 1->1, 2s->(2+3+4)/3=3, 3s->5.5, 5->7
    rows = [("A", 1), ("A", 2), ("A", 2), ("A", 5), ("B", 2), ("B", 3), ("B", 3)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = mann_whitney_u(df, "v", "g", "A", "B").collect()[0]
    r_a = 1 + 3 + 3 + 7
    u_a = r_a - 4 * 5 / 2
    assert out["n_a"] == 4 and out["n_b"] == 3
    assert out["u_a"] == pytest.approx(u_a, abs=1e-9)
    # tie-corrected z
    t3 = (3**3 - 3) + (2**3 - 2)  # value 2 has t=3, value 3 has t=2
    var = 4 * 3 / 12 * ((7 + 1) - t3 / (7 * 6))
    want_z = (u_a - 4 * 3 / 2) / math.sqrt(var)
    assert out["z"] == pytest.approx(want_z, abs=1e-6)


def _auc_brute(pairs):
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_roc_auc_vs_pair_counting(spark):
    import random

    from stackstac_spark.operators.evalmetrics import roc_auc

    rng = random.Random(3)
    data = []
    for g in ("m1", "m2"):
        for _ in range(150):
            y = rng.random() < 0.4
            s = round(rng.random() + (0.3 if y else 0.0), 2)  # coarse -> ties
            data.append((g, s, int(y)))
    df = spark.createDataFrame(data, ["g", "s", "y"])
    out = {r["g"]: r["auc"] for r in roc_auc(df, "s", "y", ["g"]).collect()}
    for g in ("m1", "m2"):
        pairs = [(s, y) for gg, s, y in data if gg == g]
        assert out[g] == pytest.approx(_auc_brute(pairs), abs=1e-6), g


def test_roc_auc_perfect_and_random(spark):
    from stackstac_spark.operators.evalmetrics import roc_auc

    perfect = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(perfect, ["s", "y"])
    assert roc_auc(df, "s", "y").collect()[0]["auc"] == pytest.approx(1.0)
    const = [(1.0, i % 2) for i in range(100)]
    df2 = spark.createDataFrame(const, ["s", "y"])
    assert roc_auc(df2, "s", "y").collect()[0]["auc"] == pytest.approx(0.5)


def test_roc_auc_degenerate_group_is_null(spark):
    # single-class groups have undefined AUC: NULL, never an ANSI
    # divide-by-zero (caught live by the verify drive on tiny groups)
    from stackstac_spark.operators.evalmetrics import roc_auc

    rows = [("allpos", 1.0, 1), ("allpos", 2.0, 1), ("ok", 1.0, 0), ("ok", 2.0, 1)]
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    out = {r["g"]: r["auc"] for r in roc_auc(df, "s", "y", ["g"]).collect()}
    assert out["allpos"] is None
    assert out["ok"] == pytest.approx(1.0)


def test_mann_whitney_degenerate_is_null(spark):
    from stackstac_spark.operators.drift import mann_whitney_u

    # all values tied -> variance 0 -> z NULL, u still defined
    rows = [("A", 5), ("A", 5), ("B", 5)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = mann_whitney_u(df, "v", "g", "A", "B").collect()[0]
    assert out["z"] is None
    assert out["u_a"] == pytest.approx(2 * 3 / 2.0 - 0.0 + 0.0, abs=10)  # finite
    # one empty side
    out2 = mann_whitney_u(df.filter("g = 'A'"), "v", "g", "A", "B").collect()[0]
    assert out2["z"] is None


def test_ndcg_hand_case(spark):
    from stackstac_spark.operators.evalmetrics import ndcg_at_k

    # query q1: ranked docs d1(s=9), d2(s=8), d3(s=7); rels d2=3, d3=1, d9=2
    run = spark.createDataFrame(
        [("q1", "d1", 9.0), ("q1", "d2", 8.0), ("q1", "d3", 7.0)],
        ["query_id", "doc_id", "score"],
    )
    rels = spark.createDataFrame(
        [("q1", "d2", 3), ("q1", "d3", 1), ("q1", "d9", 2)],
        ["query_id", "doc_id", "rel"],
    )
    out = ndcg_at_k(run, rels, k=3).collect()[0]
    dcg = (2**0 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert out["dcg"] == pytest.approx(dcg, abs=1e-6)
    assert out["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert out["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_ndcg_no_relevant_docs_is_zero(spark):
    from stackstac_spark.operators.evalmetrics import ndcg_at_k

    run = spark.createDataFrame([("q", "d", 1.0)], ["query_id", "doc_id", "score"])
    rels = spark.createDataFrame([("q", "d", 0)], ["query_id", "doc_id", "rel"])
    out = ndcg_at_k(run, rels, k=5).collect()[0]
    assert out["ndcg"] == 0.0 and out["idcg"] == 0.0


def test_ndcg_rejects_bad_k(spark):
    from stackstac_spark.operators.evalmetrics import ndcg_at_k

    run = spark.createDataFrame([("q", "d", 1.0)], ["query_id", "doc_id", "score"])
    with pytest.raises(ValueError):
        ndcg_at_k(run, run.withColumnRenamed("score", "rel"), k=0)
