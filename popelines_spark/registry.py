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


# Round-10 rotation: the driver scores a bounded 50-entry prefix of the
# registry per round.  This round's window = the 30 entries that have
# never been driver-scored (28 staged in round 8 + round-9's
# ``b_join_bloom`` + round-10's ``b_join_star_planned``; the first 29
# verified green by the round-9 judge's tools/parity.py runs at sf0.01
# and sf0.001, the last by this round's), plus the 20 stalest
# driver-green entries (round-2/3 cohort, computed from the latest green
# round per id across CORRECTNESS_r01..r09) — 30+20 = 50.  After
# CORRECTNESS_r10 every registered query except the post-rotation tail
# is driver-proven.
#
# ROTATION IS MECHANIZED: `python tools/rotate_window.py` prints the
# canonical tuple for the current scoring history, and
# tests/test_driver_window.py FAILS at each round start until it is
# pasted here (the round-9 forgot-to-rotate failure mode, made
# impossible to miss).  (tools/parity.py still covers the full registry
# every round at sf{0.001,0.01,0.1}.)
_DRIVER_WINDOW_FIRST: tuple[str, ...] = (
    # -- round-13 window: the 45-entry round-5 stalest cohort plus the
    # 5 stalest round-6 entries, emitted verbatim by
    # tools/rotate_window.py (no never-scored ids this round).
    "b_agg_collect",
    "b_agg_count_distinct",
    "b_agg_cube",
    "b_agg_distinct_rows",
    "b_agg_group",
    "b_agg_grouping_sets",
    "b_agg_having",
    "b_agg_rollup",
    "b_agg_scalar_max",
    "b_ctas",
    "b_filter_range_dates",
    "b_fn_date",
    "b_fn_date_seq",
    "b_join_anti",
    "b_join_asof",
    "b_join_broadcast",
    "b_join_cross",
    "b_join_full",
    "b_join_inner",
    "b_join_left",
    "b_join_right",
    "b_join_semi",
    "b_join_theta",
    "b_project_drop",
    "b_project_nested",
    "b_project_rename_nested",
    "b_sketch_cms_merge",
    "b_unnest",
    "b_unnest_inner",
    "c_attribution",
    "c_brand_affinity",
    "c_containment",
    "c_dataset_card",
    "c_dp_counts",
    "c_ewma_daily",
    "c_moving_monthly",
    "c_nation_share",
    "c_pagerank_nations",
    "c_repetition_stats",
    "c_sample_weighted",
    "c_scd2_track",
    "c_skew_sessionize",
    "c_yoy_brand",
    "flagship_star_revenue",
    "s_sliding",
    "b_join_range",
    "b_sketch_hist_quantile",
    "b_snapshot_diff",
    "c_ab_srm",
    "c_activity_heatmap",
)


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS: the driver's correctness gate scores a bounded prefix of
    the registry (50 entries per round), so after importing every module the
    registry is rotated to put ``_DRIVER_WINDOW_FIRST`` — the queries that
    have never been scored by a driver round — at the front.  The judge
    independently re-runs whatever the driver window misses
    (tools/parity.py covers the full registry either way).
    """
    # Imports are inside the function so `import popelines_spark.registry`
    # stays cheap and circular-import-free.
    from popelines_spark.queries import (  # noqa: F401
        approx,
        ext_analytics,
        ext_analytics2,
        ext_analytics3,
        ext_analytics4,
        ext_analytics5,
        ext_analytics6,
        ext_analytics7,
        ext_analytics8,
        ext_curation,
        ext_dedup,
        ext_graph,
        ext_similarity,
        ext_text,
        ext_text2,
        ext_multimodal,
        streaming_queries,
        sketches,
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
        manifest_queries,
    )

    front = [n for n in _DRIVER_WINDOW_FIRST if n in SPARK_QUERIES]
    rest = [n for n in SPARK_QUERIES if n not in _DRIVER_WINDOW_FIRST]
    rotated = {n: SPARK_QUERIES[n] for n in front + rest}
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(rotated)
