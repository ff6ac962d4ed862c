"""Physical-plan introspection — the 'did Catalyst do what we want' checks.

SURVEY.md §4: the engine writes no custom optimizer rules; instead it
asserts that the stock optimizations actually fired (pushdown, pruning,
broadcast, no accidental cartesian). Used by tests/test_plans.py and handy
interactively:

    from popelines_spark.plans.inspect import plan_report
    plan_report(df)  # {'broadcast_joins': 2, 'pushed_filters': [...], ...}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict:
    plan = formatted_plan(df)

    def n(op: str) -> int:
        # the formatted plan shows each node twice (tree + numbered detail
        # section); count only the numbered detail entries
        return len(re.findall(rf"\(\d+\) {op}\b", plan))

    codegen = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    return {
        "broadcast_joins": n("BroadcastHashJoin"),
        "sortmerge_joins": n("SortMergeJoin"),
        "shuffled_hash_joins": n("ShuffledHashJoin"),
        "cartesian": bool(re.search(r"CartesianProduct", plan)),
        "bcast_nested_loop": bool(re.search(r"BroadcastNestedLoopJoin", plan)),
        "exchanges": n("Exchange"),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", plan),
        "wholestage_codegen": "WholeStageCodegen" in codegen,
        "python_udf_stages": n("ArrowEvalPython")
        + n("BatchEvalPython")
        + n("MapInPandas")
        + n("FlatMapGroupsInPandas"),
    }


def assert_scan_pruned(df: DataFrame, table_cols: dict[str, int]) -> None:
    """Assert each ReadSchema reads no more columns than expected:
    ``table_cols`` maps a distinguishing column name to the max allowed
    width of the scan that contains it."""
    for schema in plan_report(df)["read_schemas"]:
        fields = schema.count(":")
        for marker, max_cols in table_cols.items():
            if f"{marker}:" in schema:
                assert fields <= max_cols, (
                    f"scan containing {marker} reads {fields} cols "
                    f"(> {max_cols}): {schema}"
                )


def assert_no_cartesian(df: DataFrame) -> None:
    rep = plan_report(df)
    assert not rep["cartesian"], "plan contains CartesianProduct"
    assert not rep["bcast_nested_loop"], "plan contains BroadcastNestedLoopJoin"
