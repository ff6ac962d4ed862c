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
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
                    * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s2,
           CAST(count(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
                     * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
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
    internal stddev accumulation orders. The square multiplies IN DECIMAL
    (2-decimal input -> exact), never double-then-round (see b_agg_corr)."""
    c = T(spark, sf_dir, "customer")
    b2 = F.col("c_acctbal").cast("decimal(18,2)")
    s1 = F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
    s2 = F.sum(b2 * b2).cast("double")
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
    WITH c AS (SELECT l_returnflag,
                      CAST(l_quantity AS BIGINT) AS q,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
               FROM lineitem),
    m AS (SELECT l_returnflag,
                 count(*) AS n,
                 CAST(SUM(q) AS BIGINT) AS sq,
                 CAST(SUM(pc) AS BIGINT) AS sp,
                 CAST(SUM(q * q) AS BIGINT) AS sqq,
                 CAST(SUM(q * pc) AS BIGINT) AS sqp,
                 SUM(CAST(pc AS DECIMAL(19,0)) * CAST(pc AS DECIMAL(19,0)))
                   AS spp
          FROM c GROUP BY l_returnflag)
    SELECT l_returnflag,
           (n * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
           / sqrt((n * CAST(sqq AS DOUBLE)
                   - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                  * (n * CAST(spp AS DOUBLE)
                     - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
             AS corr_qty_price
    FROM m
    """,
)
def b_agg_corr(spark, sf_dir):
    """Pearson correlation from EXACT INTEGER moments (not the builtin
    corr(), whose accumulation order differs between engines).

    Why cents, not decimals: correlation is scale-invariant, so prices map
    to integer cents and every moment accumulates exactly in BIGINT (the
    squared-cents sum in DECIMAL(38,0) — still scale 0). The subtle trap
    this sidesteps: DuckDB converts a scaled decimal to double as
    unscaled-int -> double -> / 10^scale (TWO roundings), while Spark's
    BigDecimal conversion rounds once — for sums whose unscaled value
    exceeds 2^53 the engines can land one ulp apart (observed at sf0.001).
    Scale-0 decimals and bigints convert in a single correctly-rounded
    step on both engines, and the remaining arithmetic is identical
    per-value double math."""
    q = F.col("l_quantity").cast("long")
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    base = T(spark, sf_dir, "lineitem").select("l_returnflag", q.alias("q"), pc.alias("pc"))
    n = F.count("*")
    sq = F.sum("q").cast("double")
    sp = F.sum("pc").cast("double")
    sqq = F.sum(F.col("q") * F.col("q")).cast("double")
    sqp = F.sum(F.col("q") * F.col("pc")).cast("double")
    pdec = F.col("pc").cast("decimal(19,0)")
    spp = F.sum(pdec * pdec).cast("double")
    return base.groupBy("l_returnflag").agg(
        (
            (n * sqp - sq * sp)
            / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))
        ).alias("corr_qty_price")
    )
