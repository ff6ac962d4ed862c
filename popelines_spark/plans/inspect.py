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


def _top_level_cols(read_schema: str) -> int:
    """Count TOP-LEVEL fields of a ``struct<...>`` ReadSchema string.
    A bare ``count(':')`` overcounts nested struct/map fields — a scan of
    ``struct<a:int,b:struct<x:int,y:int>>`` reads 2 columns, not 3
    (review r12)."""
    inner = read_schema
    if inner.startswith("struct<") and inner.endswith(">"):
        inner = inner[len("struct<"):-1]
    if not inner:
        return 0
    depth, n = 0, 1
    for ch in inner:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


def assert_scan_pruned(df: DataFrame, table_cols: dict[str, int]) -> None:
    """Assert each ReadSchema reads no more columns than expected:
    ``table_cols`` maps a distinguishing column name to the max allowed
    width of the scan that contains it."""
    for schema in plan_report(df)["read_schemas"]:
        fields = _top_level_cols(schema)
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


# First argument inside windowspecdefinition(...).  Catalyst's
# ExtractWindowExpressions rewrites complex partition/order expressions into
# projected attributes, so each spec argument is a bare attribute ref
# (`shard#12L`), an order spec (`doc_id#3L ASC NULLS FIRST`), or the frame.
_WSPEC_FIRST_ARG = re.compile(r"windowspecdefinition\(([^,)]*)[,)]")


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Return the window specs in ``df``'s physical plan that have an EMPTY
    partition clause — the 'all rows through one partition' shape Spark
    itself warns about (``WindowExec: No Partition Defined``).

    A spec is unpartitioned iff its first argument is already the ordering
    (contains ``ASC``/``DESC``) or the frame (no partition columns at all).
    """
    plan = formatted_plan(df)
    bad = []
    for m in _WSPEC_FIRST_ARG.finditer(plan):
        first = m.group(1).strip()
        if (
            " ASC" in first
            or " DESC" in first
            or first.startswith("specifiedwindowframe")
            or first == ""
        ):
            bad.append(plan[m.start() : m.end() + 60])
    return bad


def audit_side_plan(df: DataFrame, what: str = "") -> DataFrame:
    """Execution-time twin of :func:`assert_no_global_window` for EAGERLY
    EXECUTED side plans — ``localCheckpoint`` inputs, at-rest index builds,
    convergence probes — which truncate or bypass the caller's plan and are
    therefore invisible to ``unpartitioned_windows()`` on the returned frame
    (VERDICT r4 "what's wrong" #1: five unattributed WindowExec WARNs).

    Every library choke point that eagerly executes a side plan calls this
    immediately before executing. Modes via ``POPELINES_PLAN_AUDIT``:
    ``strict`` (raise — set by tests/conftest.py and tools/parity.py),
    ``warn`` (default: Python RuntimeWarning), ``off``.
    Returns ``df`` unchanged so call sites can wrap inline.
    """
    import os
    import warnings

    mode = os.environ.get("POPELINES_PLAN_AUDIT", "warn")
    if mode == "off":
        return df
    bad = unpartitioned_windows(df)
    if bad:
        msg = (
            f"unpartitioned window in eagerly-executed side plan "
            f"{what or '<unnamed>'}: {bad[0]}"
        )
        if mode == "strict":
            raise AssertionError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=3)
    return df


def checkpoint(df: DataFrame, what: str, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` with the side-plan window audit applied first.
    The library's lineage barriers all route through here so the plan that
    is about to execute (and then vanish from caller-visible lineage) is
    still checked for single-partition windows."""
    return audit_side_plan(df, what).localCheckpoint(eager=eager)


def assert_no_global_window(df: DataFrame) -> None:
    """SURVEY.md §4 scale rule: no registered query may funnel its input
    through a partition-less window (single-partition bottleneck at 100 TB).
    Enforced over the whole registry by tools/parity.py and
    tests/test_plans.py (allowlist: none)."""
    bad = unpartitioned_windows(df)
    assert not bad, f"unpartitioned window(s) in plan: {bad}"
