"""r8 wave-9: Merkle dataset fingerprinting."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _root(df):
    return [r for r in df.collect() if r["shard"] == -1][0]


def test_fingerprint_order_invariant(spark):
    from stackstac_spark.operators.storage import dataset_fingerprint

    rows = [(i, "text %d" % i) for i in range(200)]
    a = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), ["doc_id", "text"]).repartition(3)
    fa, fb = dataset_fingerprint(a), dataset_fingerprint(b)
    assert _root(fa)["shard_hash"] == _root(fb)["shard_hash"]
    assert _root(fa)["n_rows"] == 200


def test_fingerprint_blames_changed_shard(spark):
    from stackstac_spark.operators.storage import dataset_fingerprint

    rows = [(i, "text %d" % i) for i in range(200)]
    base = spark.createDataFrame(rows, ["doc_id", "text"])
    mutated = spark.createDataFrame(
        [(i, t if i != 77 else t + " CHANGED") for i, t in rows], ["doc_id", "text"]
    )
    ha = {r["shard"]: r["shard_hash"] for r in dataset_fingerprint(base).collect()}
    hb = {r["shard"]: r["shard_hash"] for r in dataset_fingerprint(mutated).collect()}
    assert ha[-1] != hb[-1]  # root detects the change
    diff = [s for s in ha if s != -1 and ha[s] != hb.get(s)]
    # one row changed content: it either stays in its shard (1 differing
    # shard) or moves shards (2 differing) — never more
    assert 1 <= len(diff) <= 2


def test_fingerprint_rejects_bad_shards(spark):
    from stackstac_spark.operators.storage import dataset_fingerprint

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dataset_fingerprint(df, n_shards=0)
