"""Capture .explain("formatted") for named registry queries into plans/r12/.

Usage:
  PYTHONPATH=/root/repo python scripts/opt_plans.py <suffix> <query> [query...]

Writes plans/r12/<query>_<suffix>.txt for each query (suffix = "before" /
"after"). Also prints a one-line job/physical summary (Exchange count,
join strategies, Python eval nodes) per query so plan deltas are visible
at a glance without opening the files.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from stackstac_spark.session import get_spark

    spark = get_spark("opt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    outdir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"!! unknown query: {name}")
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))", plan))
        )
        pyev = sorted(
            set(
                re.findall(
                    r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)",
                    plan,
                )
            )
        )
        n_win = len(re.findall(r"\bWindow\b", plan))
        print(
            f"{name}: Exchange={n_ex} Window={n_win} joins={joins or '-'} "
            f"python={pyev or '-'} -> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
