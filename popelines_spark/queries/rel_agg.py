"""SURVEY.md §2 B.4 — aggregation.

Reference basis: the one aggregate the library literally ships is
``SELECT MAX({col})`` (popelines/main.py:229, find_last_entry); everything
else is the delegated SQL surface reachable via bq_query
(popelines/main.py:236-243).

Scale notes: all groupBys here hash-aggregate with map-side partials
(Spark's default partial+final HashAggregate); MAX(col) over parquet reads
row-group stats, not data. collect_list is bounded by group cardinality —
at 100 TB collect only per bounded dimension groups, never per fact key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.registry import query
from popelines_spark.queries._util import T, davg, dsum, sql_davg, sql_dsum


@query(
    "b_agg_scalar_max",
    oracle="SELECT max(o_orderdate) AS last_entry FROM orders",
)
def b_agg_scalar_max(spark, sf_dir):
    """find_last_entry (popelines/main.py:225-234): ungrouped MAX — served
    from parquet footer min/max statistics."""
    return T(spark, sf_dir, "orders").agg(F.max("o_orderdate").alias("last_entry"))


@query(
    "b_agg_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           min(l_quantity) AS min_qty,
           max(l_extendedprice) AS max_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b_agg_group(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: the canonical partial+final hash agg.

    r13: spread_by(l_orderkey) parallelizes the scan-fused decimal
    partial agg across the cores (single-row-group input = one task
    otherwise); hash spread avoids round-robin's sort. 0.77 s → 0.63 s
    interleaved; no-op at cluster scale."""
    from popelines_spark.operators.par import spread_by

    li = spread_by(T(spark, sf_dir, "lineitem"), "l_orderkey").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "b_agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_custs
    FROM customer GROUP BY c_mktsegment
    """,
)
def b_agg_count_distinct(spark, sf_dir):
    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.countDistinct("c_custkey").alias("n_custs"),
        )
    )


@query(
    "b_agg_distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def b_agg_distinct_rows(spark, sf_dir):
    return T(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "b_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def b_agg_rollup(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "b_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def b_agg_cube(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "b_agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def b_agg_grouping_sets(spark, sf_dir):
    T(spark, sf_dir, "customer").createOrReplaceTempView("pls_customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
        FROM pls_customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "b_agg_collect",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_name)), '|') AS names
    FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    """,
)
def b_agg_collect(spark, sf_dir):
    """ARRAY_AGG per group; array_sort + join for cross-engine determinism
    (collect_list order is partition-dependent — SURVEY.md §5 rule 1)."""
    return (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias(
                "names"
            )
        )
    )


@query(
    "b_agg_having",
    oracle=f"""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spent
    FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    """,
)
def b_agg_having(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 12)
    )
