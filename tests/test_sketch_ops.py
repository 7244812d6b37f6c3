"""operators/sketch.py: SpaceSaving heavy hitters — exact regime vs a
Python count oracle, approximate regime error bounds, and the guaranteed-
retention property."""

import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _values(n=3000):
    # Zipf-ish: item i appears ~ n / (i+1) times, plus a long tail
    out = []
    for i in range(40):
        out += [f"hot{i}"] * (n // (i + 1) // 10)
    out += [f"tail{j}" for j in range(500)]
    # deterministic interleave so partitions see mixed traffic
    out.sort(key=lambda s: hash(s) % 7919)
    return out


def test_heavy_hitters_exact_when_capacity_suffices(spark):
    from stackstac_spark.operators.sketch import heavy_hitters

    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "v STRING").repartition(8)
    got = heavy_hitters(df, "v", k=10, capacity=10_000).collect()
    truth = Counter(vals)
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["value"], r["count"]) for r in got] == expect
    assert all(r["err"] == 0 and r["count_lo"] == r["count"] for r in got)


def test_heavy_hitters_bounds_in_approximate_regime(spark):
    from stackstac_spark.operators.sketch import heavy_hitters

    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "v STRING").repartition(4)
    got = heavy_hitters(df, "v", k=15, capacity=64).collect()
    truth = Counter(vals)
    for r in got:
        true = truth[r["value"]]
        # reported count is an upper bound; count_lo a lower bound
        assert r["count_lo"] <= true <= r["count"], (r, true)
    # the top few true heavy hitters must survive a capacity-64 sketch
    top_true = [v for v, _ in sorted(truth.items(), key=lambda kv: -kv[1])[:3]]
    surviving = {r["value"] for r in got}
    assert set(top_true) <= surviving


def test_heavy_hitters_nulls_and_validation(spark):
    from stackstac_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "v STRING")
    got = heavy_hitters(df, "v", k=5, capacity=10).collect()
    assert [(r["value"], r["count"]) for r in got] == [("a", 2), ("b", 1)]
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", k=0)


def test_kmv_distinct_accuracy_and_exact_regime(spark):
    import math

    from stackstac_spark.operators.sketch import kmv_distinct

    # 2000 distinct values with duplicates → approximate regime at k=128
    df = spark.createDataFrame(
        [(f"v{i % 2000}",) for i in range(6000)], "v STRING"
    ).repartition(8)
    r = kmv_distinct(df, "v", k=128).collect()[0]
    assert not r["exact"] and r["n_kept"] == 128
    # KMV std error ≈ 1/sqrt(k-2) ≈ 8.9%; allow 4σ
    assert abs(r["est_distinct"] - 2000) / 2000 < 4 / math.sqrt(126)

    # fewer distinct than k → exact
    small = spark.createDataFrame([(f"u{i}",) for i in range(10)], "v STRING")
    r2 = kmv_distinct(small, "v", k=64).collect()[0]
    assert r2["exact"] and r2["est_distinct"] == 10.0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_distinct(df, "v", k=1)


def test_kmv_distinct_grouped_and_deterministic(spark):
    from stackstac_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(500)] + [("b", f"x{i}") for i in range(30)],
        "g STRING, v STRING",
    )
    got = {r["g"]: r for r in kmv_distinct(df, "v", k=64, group_cols="g").collect()}
    assert got["b"]["exact"] and got["b"]["est_distinct"] == 30.0
    assert not got["a"]["exact"]
    # determinism across partitionings (pure function of the value set)
    got2 = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(df.repartition(7), "v", k=64, group_cols="g").collect()
    }
    assert got2 == {g: r["est_distinct"] for g, r in got.items()}


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """CMS guarantees: est >= true always; with depth=4,width=256 over a
    small stream, expected overcount is tiny. Exact-regime check: when
    width >> #distinct, every estimate is exact."""
    from collections import Counter

    from stackstac_spark.operators.sketch import cms_build, cms_estimate

    import numpy as np
    rng = np.random.default_rng(9)
    vals = [f"k{int(v)}" for v in rng.zipf(1.5, 2000) % 50]
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    keys = spark.createDataFrame([(k,) for k in truth], "k string")

    cms = cms_build(df, "k", depth=4, width=64)
    est = {r["key"]: r["est"] for r in cms_estimate(cms, keys, "k", depth=4, width=64).collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)  # never undercounts
    # exact regime: width far above distinct-count -> zero collisions w.h.p.
    cms2 = cms_build(df, "k", depth=4, width=4096)
    est2 = {r["key"]: r["est"] for r in cms_estimate(cms2, keys, "k", depth=4, width=4096).collect()}
    assert est2 == dict(truth)


def test_cms_weighted_and_unknown_key(spark):
    from stackstac_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "k string, w long")
    cms = cms_build(df, "k", depth=3, width=128, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",), ("zz-not-present",)], "k string")
    est = {r["key"]: r["est"] for r in cms_estimate(cms, keys, "k", depth=3, width=128).collect()}
    assert est["a"] == 12 and est["b"] == 1
    assert est["zz-not-present"] >= 0  # collisions may overcount, never error


def test_cms_validates(spark):
    from stackstac_spark.operators.sketch import cms_build

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        cms_build(df, "k", depth=0)
    with pytest.raises(ValueError):
        cms_build(df, "k", width=1)


def test_cms_sketch_is_mergeable(spark):
    """Build on two halves, SUM the cells, estimate — must equal the
    single-pass sketch (the partial-aggregate property that makes CMS
    shard/day-mergeable for free)."""
    from pyspark.sql import functions as F

    from stackstac_spark.operators.sketch import cms_build, cms_estimate

    rows = [(i, f"v{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string")
    h1, h2 = df.filter("id < 100"), df.filter("id >= 100")
    full = cms_build(df, "k", depth=3, width=32)
    merged = (
        cms_build(h1, "k", depth=3, width=32)
        .unionByName(cms_build(h2, "k", depth=3, width=32))
        .groupBy("i", "j").agg(F.sum("cnt").alias("cnt"))
    )
    keys = spark.createDataFrame([(f"v{i}",) for i in range(7)], "k string")
    a = {r["key"]: r["est"] for r in cms_estimate(full, keys, "k", depth=3, width=32).collect()}
    b = {r["key"]: r["est"] for r in cms_estimate(merged, keys, "k", depth=3, width=32).collect()}
    assert a == b
