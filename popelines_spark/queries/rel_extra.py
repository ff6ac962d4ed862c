"""Beyond-SURVEY extras: pivot/unpivot, exact moment statistics, correlated
subqueries. All reachable through the reference's arbitrary-SQL passthrough
(popelines/main.py:236-243) and standard BigQuery SQL usage; included to
round out the delegated surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.registry import query
from popelines_spark.queries._util import DEC, T, sql_dsum


@query(
    "b_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS "O",
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b_pivot(spark, sf_dir):
    """Pivot = groupBy + pivot + agg; Catalyst rewrites to conditional
    aggregation (exactly the oracle's form) — one shuffle."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
    )


@query(
    "b_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    """,
)
def b_unpivot(spark, sf_dir):
    """Unpivot/melt: wide → long without a shuffle (pure projection+union)."""
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ["c_custkey"], ["acctbal", "nationkey"], "metric", "value"
    )


@query(
    "b_agg_stats",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
             AS s2,
           CAST(count(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
            - CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
              * CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
              / count(*))
           / (count(*) - 1) AS var_samp
    FROM customer GROUP BY c_mktsegment
    """,
)
def b_agg_stats(spark, sf_dir):
    """Exact sample variance from decimal-accumulated moments: both engines
    derive var from bit-identical doubles, sidestepping their different
    internal stddev accumulation orders."""
    c = T(spark, sf_dir, "customer")
    s1 = F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
    s2 = F.sum(
        (F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(30,4)")
    ).cast("double")
    n = F.count("*")
    return c.groupBy("c_mktsegment").agg(
        s1.alias("s1"),
        s2.alias("s2"),
        n.alias("n"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("var_samp"),
    )


@query(
    "b_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) >= 6
    """,
)
def b_subquery_scalar(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate +
    join (no per-row re-execution)."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("pls_orders_sq")
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("pls_lineitem_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM pls_orders_sq
        WHERE (SELECT count(*) FROM pls_lineitem_sq
               WHERE l_orderkey = o_orderkey) >= 6
        """
    )


@query(
    "b_subquery_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = 2)
    """,
)
def b_subquery_in(spark, sf_dir):
    """IN subquery → left-semi join under the hood."""
    T(spark, sf_dir, "customer").createOrReplaceTempView("pls_customer_sq")
    T(spark, sf_dir, "nation").createOrReplaceTempView("pls_nation_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM pls_customer_sq
        WHERE c_nationkey IN (SELECT n_nationkey FROM pls_nation_sq
                              WHERE n_regionkey = 2)
        """
    )


@query(
    "b_agg_corr",
    oracle="""
    SELECT l_returnflag,
           (count(*) * CAST(SUM(CAST(l_quantity * l_extendedprice
                                     AS DECIMAL(30,4))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
              * CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE))
           / sqrt((count(*) * CAST(SUM(CAST(l_quantity * l_quantity
                                            AS DECIMAL(30,4))) AS DOUBLE)
                   - CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
                     * CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE))
                  * (count(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice
                                              AS DECIMAL(30,4))) AS DOUBLE)
                     - CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
                       * CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)))
             AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b_agg_corr(spark, sf_dir):
    """Pearson correlation from decimal-accumulated moments (not the
    builtin corr(), whose accumulation order differs between engines):
    exact sums -> bit-identical doubles -> identical per-row arithmetic."""
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count("*")
    sq = F.sum(q.cast(DEC)).cast("double")
    sp = F.sum(p.cast(DEC)).cast("double")
    sqq = F.sum((q * q).cast("decimal(30,4)")).cast("double")
    spp = F.sum((p * p).cast("decimal(30,4)")).cast("double")
    sqp = F.sum((q * p).cast("decimal(30,4)")).cast("double")
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            (
                (n * sqp - sq * sp)
                / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))
            ).alias("corr_qty_price")
        )
    )
