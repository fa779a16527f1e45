"""Physical-plan introspection for scale review.

The engine's design contract is "the plan you'd want at 100 TB":
broadcast every small side, one shuffle per logical wide dependency,
filters pushed into the scan, Python only where semantics demand it.
These helpers make that contract CHECKABLE — in a notebook
(:func:`plan_summary`) and in CI (:func:`assert_scale_safe`), the same
counters ``tools/plan_audit.py`` snapshots into ``PLANS.md``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_JOIN_KINDS = (
    "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    "BroadcastNestedLoopJoin|CartesianProduct"
)


def plan_summary(df: DataFrame) -> dict:
    """Summarize a DataFrame's physical plan for scale review.

    Returns::

        {"joins": [...],            # distinct join strategies in the plan
         "shuffles": int,           # Exchange (hash/range/round-robin) count
         "broadcasts": int,         # BroadcastExchange count
         "python_stages": int,      # MapInPandas / grouped-pandas / UDF evals
         "codegen_spans": int,      # distinct [codegen id : N] regions
         "cartesian": bool,
         "pushed_filters": [...],   # per-scan PushedFilters payloads
         "plan": str}               # the explain text the counts came from

    The counts come from the UNEXECUTED plan in ``formatted`` explain
    mode — the counters are anchored to that mode's layout, which is why
    no mode parameter is exposed.  AQE may improve the executed plan
    further (e.g. convert a sort-merge join to broadcast) but never adds
    shuffles, so these numbers are the worst-case shape — the right
    thing to gate on.  ``codegen_spans`` is 0 under AQE's pre-execution
    plan (codegen ids are assigned when stages materialize).
    """
    jvm_mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(jvm_mode.fromString("formatted"))
    return {
        "joins": sorted(set(re.findall(f"({_JOIN_KINDS})", plan))),
        "shuffles": len(
            re.findall(
                r"Arguments: (?:hashpartitioning|rangepartitioning|"
                r"RoundRobinPartitioning)",
                plan,
            )
        ),
        # Formatted explain prints every node twice — once in the tree and
        # once as a "(N) NodeName" detail header — so anchor counts to the
        # detail headers to get true node counts.
        "broadcasts": len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M)),
        "python_stages": len(
            re.findall(
                r"^\(\d+\) (?:MapInPandas|FlatMapGroupsInPandas"
                r"|FlatMapGroupsInPandasWithState|ArrowEvalPython|BatchEvalPython)",
                plan,
                re.M,
            )
        ),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "cartesian": "CartesianProduct" in plan,
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "plan": plan,
    }


def assert_scale_safe(
    df: DataFrame,
    max_shuffles: int | None = None,
    max_python_stages: int | None = None,
    forbid_cartesian: bool = True,
) -> dict:
    """CI guard: raise ``AssertionError`` (with the offending plan) when a
    DataFrame's plan violates the given scale budget.  Returns the
    :func:`plan_summary` on success so callers can log it.
    """
    s = plan_summary(df)
    problems = []
    if forbid_cartesian and s["cartesian"]:
        problems.append("plan contains a CartesianProduct")
    if max_shuffles is not None and s["shuffles"] > max_shuffles:
        problems.append(f"{s['shuffles']} shuffles > budget {max_shuffles}")
    if max_python_stages is not None and s["python_stages"] > max_python_stages:
        problems.append(
            f"{s['python_stages']} Python stages > budget {max_python_stages}"
        )
    if problems:
        raise AssertionError(
            "assert_scale_safe: " + "; ".join(problems) + "\n" + s["plan"]
        )
    return s
