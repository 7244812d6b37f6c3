"""Physical-plan auditing: programmatic access to the invariants this
engine cares about at 100 TB — shuffle count, join strategies, Python
boundaries, whole-stage-codegen coverage.

The test suite asserts these properties query-by-query (tests/
test_plan_quality.py and the per-wave plan guards); this module exposes the
same checks as a library API so users can gate their own pipelines, e.g.::

    from stackstac_spark.plans import audit
    rep = audit.report(df)
    assert rep["n_exchanges"] <= 2 and not rep["has_cartesian"]

or, in CI::

    audit.expect(df, max_exchanges=2, forbid_cartesian=True,
                 forbid_python_eval=True)

Everything reads the *executed* plan string (post-AQE re-planning is not
visible before execution; these are plan-time checks, which is where the
structural hazards — cartesian products, partition-less windows,
row-at-a-time Python — live).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["plan_string", "report", "expect"]


def plan_string(df: DataFrame) -> str:
    """The physical plan as a string (executedPlan — includes AQE wrapper)."""
    return df._jdf.queryExecution().executedPlan().toString()


def report(df: DataFrame) -> dict:
    """Structural summary of the physical plan.

    Keys:
    - ``n_exchanges``: shuffle boundaries (every Exchange that is not a
      broadcast — including ``SinglePartition`` exchanges, which ARE
      shuffles and the single-task hazard this module exists to catch)
    - ``n_single_partition``: the subset of exchanges collapsing to one
      partition (global sort/limit/agg funnels)
    - ``n_broadcasts``: broadcast exchanges (cheap, but count the memory)
    - ``n_joins`` / ``join_kinds``: join nodes and their physical strategies
    - ``has_cartesian``: CartesianProduct or BroadcastNestedLoopJoin present
    - ``partitionless_windows``: window specs with an empty PARTITION BY —
      the single-task-sort hazard
    - ``python_eval_nodes``: BatchEvalPython (row-at-a-time UDF — the slow
      path) vs ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
      (Arrow-batched — acceptable where built-ins can't express the op)
    - ``has_take_ordered``: global top-k runs as TakeOrderedAndProject
    - ``wholestage_codegen_spans``: number of codegen regions
    """
    plan = plan_string(df)
    exchanges = re.findall(r"Exchange (\w+)", plan)
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    # a partitioned spec leads with partition columns (no ASC/DESC) before
    # the ordering tokens; a partition-less one starts at an ordering token
    partitionless = [
        s for s in specs if re.search(r"\b(ASC|DESC)\b", s.split(",")[0])
    ]
    return {
        "n_exchanges": len(exchanges) - plan.count("BroadcastExchange"),
        "n_single_partition": sum(1 for e in exchanges if e == "SinglePartition"),
        "n_broadcasts": plan.count("BroadcastExchange"),
        "n_joins": len(joins),
        "join_kinds": sorted(set(joins)),
        "has_cartesian": "CartesianProduct" in plan,
        # BNLJ is reported separately: a one-row broadcast cross join (the
        # scalar-aggregate pattern, e.g. bm25's (N, avgdl)) compiles to a
        # benign BroadcastNestedLoopJoin — only a BNLJ with a big build side
        # is a hazard, which a plan string alone can't distinguish
        "has_nested_loop": "BroadcastNestedLoopJoin" in plan,
        "partitionless_windows": len(partitionless),
        "python_eval_nodes": {
            "row_at_a_time": plan.count("BatchEvalPython"),
            "arrow_batched": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
        },
        "has_take_ordered": "TakeOrderedAndProject" in plan,
        "wholestage_codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def expect(
    df: DataFrame,
    max_exchanges: int | None = None,
    forbid_cartesian: bool = False,
    forbid_nested_loop: bool = False,
    forbid_python_eval: bool = False,
    forbid_partitionless_windows: bool = False,
) -> dict:
    """Assert structural properties; returns the report on success, raises
    AssertionError naming the violated property (and the plan) otherwise."""
    rep = report(df)
    problems = []
    if max_exchanges is not None and rep["n_exchanges"] > max_exchanges:
        problems.append(f"n_exchanges {rep['n_exchanges']} > {max_exchanges}")
    if forbid_cartesian and rep["has_cartesian"]:
        problems.append("cartesian product present")
    if forbid_nested_loop and rep["has_nested_loop"]:
        problems.append("nested-loop join present")
    if forbid_python_eval and rep["python_eval_nodes"]["row_at_a_time"]:
        problems.append("row-at-a-time Python UDF in plan")
    if forbid_partitionless_windows and rep["partitionless_windows"]:
        problems.append("partition-less window (single-task sort)")
    if problems:
        raise AssertionError("; ".join(problems) + "\n" + plan_string(df))
    return rep
