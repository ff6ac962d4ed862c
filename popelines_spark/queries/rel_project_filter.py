"""SURVEY.md §2 B.2 — projection, nested access/rename, filters.

Reference basis: SELECT-list emission (popelines/copy_table.py:89,95), dotted
paths (copy_table.py:46), deep rename (popelines/main.py:288-310), falsy-name
column drop (copy_table.py:87-89), date-bounded extraction
(popelines/main.py:208-223).

All projections/filters here are expressed declaratively so Catalyst pushes
them into the parquet scan (PushedFilters / ReadSchema) — at 100 TB these
queries read only the referenced columns and row groups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "b_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
)
def b_project(spark, sf_dir):
    """Per-row double arithmetic is IEEE-deterministic → no rounding."""
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@query(
    "b_project_nested",
    oracle="""
    SELECT c_custkey, c_name AS cust_name, c_acctbal AS bal
    FROM customer
    """,
)
def b_project_nested(spark, sf_dir):
    """Build a nested struct, then read it back via dotted-path access
    (copy_table.py:46 semantics: `parent.child` projection)."""
    cust = T(spark, sf_dir, "customer")
    nested = cust.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.struct(F.col("c_acctbal").alias("bal")).alias("acct"),
        ).alias("cust"),
    )
    return nested.select(
        "c_custkey",
        F.col("cust.name").alias("cust_name"),
        F.col("cust.acct.bal").alias("bal"),
    )


@query(
    "b_project_rename_nested",
    oracle="""
    SELECT s_suppkey, s_name AS supp_name, s_acctbal AS acct_bal
    FROM supplier
    """,
)
def b_project_rename_nested(spark, sf_dir):
    """Deep struct-field rename via schema transform + cast (no SQL text —
    replaces the whole copy_table.py codegen; popelines/main.py:288-310)."""
    from popelines_spark.nested import rename_fields
    from popelines_spark.schemas import sanitize_identifier

    supp = T(spark, sf_dir, "supplier")
    nested = supp.select(
        "s_suppkey",
        F.struct(
            F.col("s_name").alias("supp name"),
            F.col("s_acctbal").alias("acct.bal"),
        ).alias("info"),
    )
    renamed = rename_fields(nested, sanitize_identifier)
    return renamed.select(
        "s_suppkey",
        F.col("info.supp_name").alias("supp_name"),
        F.col("info.acct_bal").alias("acct_bal"),
    )


@query(
    "b_project_drop",
    oracle="SELECT doc_id, lang, n_chars FROM documents",
)
def b_project_drop(spark, sf_dir):
    """Column drop = projection pruning (copy_table.py:87-89 falsy-name drop;
    main.py:141-142 unknown-field drop)."""
    return T(spark, sf_dir, "documents").drop("text", "source")


@query(
    "b_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus <> 'P'
      AND o_totalprice BETWEEN 100000 AND 300000
      AND (o_orderpriority IN ('1-URGENT', '2-HIGH')
           OR o_orderpriority LIKE '5%')
      AND o_custkey IS NOT NULL
    """,
)
def b_filter(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "P")
        & F.col("o_totalprice").between(100000, 300000)
        & (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            | F.col("o_orderpriority").like("5%")
        )
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "b_filter_range_dates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-04-01'
    """,
)
def b_filter_range_dates(spark, sf_dir):
    """Half-open date interval — chunk semantics of popelines/main.py:214-223.
    The predicate pushes into parquet row-group stats (min/max pruning)."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate")
