"""Job-count audit: how many Spark jobs does each query trigger?

Job/stage COUNTS are deterministic (unlike wall time on a shared box), so
this is the right instrument for spotting redundant evaluation — a query
that should be one action but fires N jobs is paying N-1 eager
constructions (guards, checkpoints, strategy-routing counts).

Usage: PYTHONPATH=/root/repo python scripts/job_audit.py [sf_dir] [only...]
Prints per query: jobs, total tasks, wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from stackstac_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    spark = get_spark("job_audit", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm (mirrors bench.py's scan warmup so first query isn't penalized)
    try:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    except Exception:
        pass

    out = {}
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        group = f"audit_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        jids = list(tracker.getJobIdsForGroup(group))
        ntasks = 0
        nstages = 0
        for j in jids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    nstages += 1
                    ntasks += si.numTasks
        out[name] = {
            "jobs": len(jids),
            "stages": nstages,
            "tasks": ntasks,
            "wall_s": round(wall, 2),
            "rows": n,
        }
        print(
            f"{name}: jobs={len(jids)} stages={nstages} tasks={ntasks} "
            f"wall={wall:.2f}s rows={n}",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
