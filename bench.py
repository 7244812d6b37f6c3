"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() drains the plan) after a
warm-up of the session; per-query wall time includes planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))

    import __spark_entry__ as e
    from stackstac_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + python workers so the first query doesn't pay startup:
    # one JVM aggregate, plus one Arrow-batched python stage per core so
    # mapInPandas queries measure steady-state, not worker fork+import
    spark.range(1000000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401

    def _noop(batches):
        import numpy  # noqa: F401  (preload the heavy imports in each worker)

        for pdf in batches:
            yield pdf

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _noop, "id LONG"
    ).count()

    # scalar pandas UDFs run under a different eval type than mapInPandas —
    # warm that worker path too (prepare's reprojection UDF uses it)
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _noop_scalar(s):
        return s

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).select(
        _noop_scalar(col("id"))
    ).count()

    # warm the parquet reader + whole-stage-codegen + shuffle machinery with
    # an untimed scan-agg over the biggest table, so the first timed query
    # measures steady-state rather than one-time JVM JIT/classloading
    try:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
            "l_returnflag"
        ).count().collect()
        # also touch the other scan-heavy tables once (footers + page cache),
        # so per-query timings measure compute, not first-read IO
        for t in ("documents", "events", "embeddings", "orders"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in e.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_wall_sec_all_queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
