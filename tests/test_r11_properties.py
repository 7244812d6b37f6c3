"""Invariant/property tests for the r11 wave: metric bounds, permutation
invariances, and null-hygiene (unscorable rows must not move any metric)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=400):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("g"),
        ((F.col("id") * 37) % 199 / 199.0).alias("s"),
        (F.col("id") % 3 == 0).cast("int").alias("y"),
    )


def test_threshold_metrics_null_rows_inert(spark):
    from stackstac_spark.operators.evalmetrics import average_precision, roc_auc

    clean = _docs(spark)
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(9001, "0", None, 1), (9002, "1", float("nan"), 0), (9003, "2", 0.5, None)],
            "doc_id long, g string, s double, y int",
        )
    )
    for op in (roc_auc, average_precision):
        rc = {r["g"]: r for r in op(clean, "s", "y", ["g"]).collect()}
        rd = {r["g"]: r for r in op(dirty, "s", "y", ["g"]).collect()}
        assert rc.keys() == rd.keys()
        for g in rc:
            assert rc[g].asDict() == rd[g].asDict(), (op.__name__, g)


def test_ap_and_auc_bounds_and_perfect_ranking(spark):
    from stackstac_spark.operators.evalmetrics import average_precision, roc_auc

    d = _docs(spark)
    for op, col in ((roc_auc, "auc"), (average_precision, "ap")):
        for r in op(d, "s", "y", ["g"]).collect():
            assert 0.0 <= r[col] <= 1.0, (op.__name__, r)
    # perfectly separating score -> AUC = AP = 1
    perfect = d.select("g", F.col("y").cast("double").alias("s"), "y")
    assert all(r["auc"] == 1.0 for r in roc_auc(perfect, "s", "y", ["g"]).collect())
    assert all(r["ap"] == 1.0 for r in average_precision(perfect, "s", "y", ["g"]).collect())


def test_mcnemar_null_rows_inert_and_symmetry(spark):
    from stackstac_spark.operators.evalmetrics import mcnemar_test

    rows = [(1, 0, 1)] * 7 + [(0, 1, 1)] * 3 + [(1, 1, 1)] * 5
    clean = spark.createDataFrame(rows, "pa int, pb int, y int")
    dirty = spark.createDataFrame(
        rows + [(None, 1, 1), (1, None, 1), (1, 1, None)], "pa int, pb int, y int"
    )
    rc = mcnemar_test(clean, "pa", "pb", "y").first()
    rd = mcnemar_test(dirty, "pa", "pb", "y").first()
    assert rc.asDict() == rd.asDict()
    # swapping the classifiers swaps a_only/b_only, chi2 invariant
    sw = mcnemar_test(clean, "pb", "pa", "y").first()
    assert (sw["a_only"], sw["b_only"]) == (rc["b_only"], rc["a_only"])
    assert sw["chi2"] == rc["chi2"]


def test_spearman_invariances(spark):
    from stackstac_spark.operators.drift import spearman_rho

    d = _docs(spark).select("g", F.col("s").alias("a"), (F.col("doc_id") % 7).cast("double").alias("b"))
    base = {r["g"]: r["rho"] for r in spearman_rho(d, "a", "b", ["g"]).collect()}
    # monotone transform of either column leaves rho unchanged
    mono = d.select("g", (F.exp("a") * 3 + 1).alias("a"), "b")
    trans = {r["g"]: r["rho"] for r in spearman_rho(mono, "a", "b", ["g"]).collect()}
    assert base == trans
    # rho(a, a) = 1; swapping args is symmetric
    self_ = spark.createDataFrame([(float(i), float(i)) for i in range(10)], "a double, b double")
    assert spearman_rho(self_, "a", "b").first()["rho"] == 1.0
    sw = {r["g"]: r["rho"] for r in spearman_rho(d.select("g", F.col("b").alias("a"), F.col("a").alias("b")), "a", "b", ["g"]).collect()}
    assert base == sw


def test_jsd_bounds_and_disjoint_max(spark):
    from stackstac_spark.operators.drift import js_divergence

    d = _docs(spark).select("g", F.concat(F.lit("t"), (F.col("doc_id") % 11).cast("string")).alias("tok"))
    for r in js_divergence(d, "g", "tok").collect():
        assert 0.0 <= r["jsd"] <= 1.0
    # a group with tokens disjoint from everything else still stays < 1
    # against the GLOBAL mix (which contains itself); sanity: bigger overlap
    # with global -> smaller jsd than a rare disjoint group
    rows = [("big", "x")] * 90 + [("rare", f"r{i}") for i in range(10)]
    got = {r["g"]: r["jsd"] for r in js_divergence(
        spark.createDataFrame(rows, "g string, tok string"), "g", "tok").collect()}
    assert got["rare"] > got["big"]


def test_chao1_lower_bound_is_v_obs(spark):
    from stackstac_spark.operators.textstats import chao1_richness

    docs = spark.createDataFrame(
        [(f"g{i % 3}", f"w{i % 17} w{i % 5} common") for i in range(60)],
        "g string, text string",
    )
    for r in chao1_richness(docs, group_cols=["g"]).collect():
        assert r["chao1"] >= r["v_obs"]


def test_assortativity_bounds(spark):
    from stackstac_spark.operators.graph import degree_assortativity

    import random

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a int, id_b int"
    )
    r = degree_assortativity(df).first()
    if r["assortativity"] is not None:
        assert -1.0 <= r["assortativity"] <= 1.0


def test_cohens_kappa_perfect_and_random(spark):
    from stackstac_spark.operators.evalmetrics import cohens_kappa

    # perfect agreement with 2 categories present -> kappa = 1
    rows = [("y", "y")] * 5 + [("n", "n")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    assert cohens_kappa(df, "a", "b").first()["kappa"] == 1.0
    # independent raters -> kappa ~ 0 (exactly 0 on a balanced grid)
    grid = [(a, b) for a in ("y", "n") for b in ("y", "n")] * 5
    gdf = spark.createDataFrame(grid, "a string, b string")
    assert cohens_kappa(gdf, "a", "b").first()["kappa"] == 0.0
