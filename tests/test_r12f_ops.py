"""Known-value tests for the r12 sixth sub-wave: classifier confusion
report (P/R/F1/balanced-accuracy/MCC), log-loss, Youden-J optimal
threshold (evalmetrics.py)."""

import math

import pytest
from pyspark.sql import functions as F


def test_classifier_report_known(spark):
    from stackstac_spark.operators.evalmetrics import classifier_report

    P = [1, 1, 1, 0, 0, 0, 1, 0]
    Y = [1, 1, 0, 0, 0, 1, 1, 0]
    tp = sum(1 for p, y in zip(P, Y) if p == 1 and y == 1)
    fp = sum(1 for p, y in zip(P, Y) if p == 1 and y == 0)
    fn = sum(1 for p, y in zip(P, Y) if p == 0 and y == 1)
    tn = sum(1 for p, y in zip(P, Y) if p == 0 and y == 0)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    df = spark.createDataFrame(list(zip(P, Y)), "p int, y int")
    r = classifier_report(df, "p", "y").first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert r["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
    assert r["recall"] == pytest.approx(tp / (tp + fn), abs=1e-6)
    assert r["f1"] == pytest.approx(2 * tp / (2 * tp + fp + fn), abs=1e-6)
    assert r["balanced_accuracy"] == pytest.approx(
        (tp / (tp + fn) + tn / (tn + fp)) / 2, abs=1e-6
    )
    assert r["mcc"] == pytest.approx(mcc, abs=1e-6)
    # no positive predictions -> precision NULL, recall 0, mcc NULL
    deg = spark.createDataFrame([(0, 1), (0, 0)], "p int, y int")
    rd = classifier_report(deg, "p", "y").first()
    assert rd["precision"] is None and rd["recall"] == 0.0 and rd["mcc"] is None
    # perfect classifier -> all 1.0
    perf = spark.createDataFrame([(1, 1), (0, 0), (1, 1)], "p int, y int")
    rp = classifier_report(perf, "p", "y").first()
    assert rp["f1"] == 1.0 and rp["mcc"] == 1.0


def test_log_loss_known(spark):
    from stackstac_spark.operators.evalmetrics import log_loss

    Ps = [0.9, 0.1, 0.8, 0.35]
    Ys = [1.0, 0.0, 0.0, 1.0]
    want = -sum(
        y * math.log(p) + (1 - y) * math.log(1 - p) for p, y in zip(Ps, Ys)
    ) / len(Ps)
    df = spark.createDataFrame(list(zip(Ps, Ys)), "p double, y double")
    assert log_loss(df, "p", "y").first()["logloss"] == pytest.approx(
        want, abs=1e-6
    )
    # p = 0 against y = 1 clamps to eps — finite, huge
    ext = spark.createDataFrame([(0.0, 1.0), (1.0, 0.0)], "p double, y double")
    le = log_loss(ext, "p", "y").first()["logloss"]
    assert le is not None and 30 < le < 40  # -ln(1e-15) ≈ 34.5
    # out-of-range scores excluded
    dirty = df.unionByName(
        spark.createDataFrame([(1.5, 1.0)], "p double, y double")
    )
    assert log_loss(dirty, "p", "y").first()["n"] == 4
    with pytest.raises(ValueError, match="eps"):
        log_loss(df, "p", "y", eps=0.7)


def test_youden_threshold_known(spark):
    from stackstac_spark.operators.evalmetrics import youden_threshold

    S = [0.9, 0.8, 0.7, 0.6, 0.4, 0.3, 0.2, 0.1]
    Y = [1, 1, 0, 1, 0, 0, 1, 0]
    Pn, Nn = sum(Y), len(Y) - sum(Y)
    best = None
    for thr in sorted(set(S)):
        tpr = sum(1 for s, y in zip(S, Y) if s >= thr and y == 1) / Pn
        fpr = sum(1 for s, y in zip(S, Y) if s >= thr and y == 0) / Nn
        j = tpr - fpr
        if best is None or j > best[0] + 1e-12 or (
            abs(j - best[0]) < 1e-12 and thr < best[1]
        ):
            best = (j, thr, tpr, fpr)
    df = spark.createDataFrame(list(zip(S, Y)), "s double, y int")
    r = youden_threshold(df, "s", "y").first()
    assert r["j_stat"] == pytest.approx(best[0], abs=1e-6)
    assert r["threshold"] == pytest.approx(best[1], abs=1e-9)
    assert r["tpr"] == pytest.approx(best[2], abs=1e-6)
    assert r["fpr"] == pytest.approx(best[3], abs=1e-6)
    # perfect separation: threshold at the lowest positive, J = 1
    sep = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "s double, y int"
    )
    rs = youden_threshold(sep, "s", "y").first()
    assert rs["j_stat"] == 1.0 and rs["threshold"] == pytest.approx(0.8)
    # single class -> NULL; grouped keeps groups
    one = spark.createDataFrame([(0.5, 1), (0.6, 1)], "s double, y int")
    assert youden_threshold(one, "s", "y").first()["threshold"] is None
    grp = df.withColumn("g", F.lit("a")).unionByName(
        one.withColumn("g", F.lit("b"))
    )
    got = {r["g"]: r for r in youden_threshold(grp, "s", "y", ["g"]).collect()}
    assert got["a"]["j_stat"] == pytest.approx(best[0], abs=1e-6)
    assert got["b"]["threshold"] is None


def test_temperature_mix_known(spark):
    from stackstac_spark.operators.sampling import temperature_mix

    cnt = {"en": 70, "de": 20, "zh": 10}
    alpha = 0.3
    tot = sum(cnt.values())
    shares = {d: v / tot for d, v in cnt.items()}
    ptot = sum(s**alpha for s in shares.values())
    adj = {d: s**alpha / ptot for d, s in shares.items()}
    df = spark.createDataFrame(
        [(d,) for d, v in cnt.items() for _ in range(v)], "d string"
    )
    got = {r["domain"]: r for r in temperature_mix(df, "d", alpha=0.3).collect()}
    for d in cnt:
        assert got[d]["share"] == pytest.approx(shares[d], abs=1e-6)
        assert got[d]["adj_share"] == pytest.approx(adj[d], abs=1e-6)
        assert got[d]["boost"] == pytest.approx(adj[d] / shares[d], abs=1e-6)
    # the tail is boosted, the head damped; adj shares still sum to 1
    assert got["zh"]["boost"] > 1 > got["en"]["boost"]
    assert sum(r["adj_share"] for r in got.values()) == pytest.approx(1.0, abs=1e-5)
    # alpha = 1 reproduces natural sampling exactly
    g1 = {r["domain"]: r for r in temperature_mix(df, "d", alpha=1.0).collect()}
    for d in cnt:
        assert g1[d]["boost"] == pytest.approx(1.0, abs=1e-6)
    # weight-column mass equals replicated rows; bad alpha raises
    w = spark.createDataFrame(
        [("en", 70.0), ("de", 20.0), ("zh", 10.0)], "d string, w double"
    )
    gw = {r["domain"]: r for r in temperature_mix(w, "d", alpha=0.3, weight_col="w").collect()}
    assert gw["zh"]["adj_share"] == pytest.approx(adj["zh"], abs=1e-6)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "d", alpha=0.0)


def test_bleu2_corpus_known(spark):
    import collections

    from stackstac_spark.operators.textstats import bleu2_corpus

    pairs = [
        ("the cat sat on the mat", "the cat is on the mat"),
        ("a quick brown fox", "the quick brown fox jumps"),
        ("hello world", "hello there world"),
    ]
    m = {1: 0, 2: 0}
    t = {1: 0, 2: 0}
    cl = rl = 0
    for c, r in pairs:
        ct, rt = c.lower().split(), r.lower().split()
        cl += len(ct)
        rl += len(rt)
        for n in (1, 2):
            cg = collections.Counter(
                tuple(ct[i : i + n]) for i in range(len(ct) - n + 1)
            )
            rg = collections.Counter(
                tuple(rt[i : i + n]) for i in range(len(rt) - n + 1)
            )
            t[n] += sum(cg.values())
            m[n] += sum(min(v, rg[g]) for g, v in cg.items())
    p1, p2 = m[1] / t[1], m[2] / t[2]
    bp = min(1.0, math.exp(1 - rl / cl))
    want = bp * math.exp(0.5 * (math.log(p1) + math.log(p2)))
    df = spark.createDataFrame(pairs, "c string, r string")
    r = bleu2_corpus(df, "c", "r").first()
    assert (r["cand_len"], r["ref_len"]) == (cl, rl)
    assert r["p1"] == pytest.approx(p1, abs=1e-6)
    assert r["p2"] == pytest.approx(p2, abs=1e-6)
    assert r["bp"] == pytest.approx(bp, abs=1e-6)
    assert r["bleu2"] == pytest.approx(want, abs=1e-6)
    # identical -> 1; disjoint -> NULL bleu with p1 = 0 reported
    same = spark.createDataFrame([("a b c", "a b c")], "c string, r string")
    assert bleu2_corpus(same, "c", "r").first()["bleu2"] == 1.0
    dis = spark.createDataFrame([("a b", "x y")], "c string, r string")
    rd = bleu2_corpus(dis, "c", "r").first()
    assert rd["bleu2"] is None and rd["p1"] == 0.0
    # clipping: candidate repeating a word gets credit at most ref count
    rep = spark.createDataFrame([("the the the", "the cat")], "c string, r string")
    assert bleu2_corpus(rep, "c", "r").first()["p1"] == pytest.approx(
        1 / 3, abs=1e-6
    )
