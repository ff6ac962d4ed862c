"""SURVEY.md §2 B.6 sort/limit/top-k + B.7 set operations.

Reference basis: delegated SQL surface; append semantics for UNION ALL
(popelines/main.py:137-139); add-only schema merge for union-by-name with
missing columns (popelines/main.py:77-98 + :139).

Determinism: every LIMIT sits under an ORDER BY whose key chain is unique,
so the selected row SET is engine-independent (the hash compare is
order-insensitive; the set must not be).

Scale notes: orderBy().limit(n) compiles to TakeOrderedAndProject — each
partition keeps n rows, driver merges n·p rows; never a global sort. Full
sorts (b_sort) use range partitioning (exchange on sampled range bounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "b_sort",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey
    LIMIT 200
    """,
)
def b_sort(spark, sf_dir):
    """Multi-key sort, asc/desc + null placement. The limit makes row choice
    value-checkable (unique final key)."""
    return (
        T(spark, sf_dir, "customer")
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .limit(200)
    )


@query(
    "b_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def b_limit(spark, sf_dir):
    """Top-n: TakeOrderedAndProject (per-partition heads + driver merge)."""
    return (
        T(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@query(
    "b_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
    WHERE rn <= 3
    """,
)
def b_topk_per_group(spark, sf_dir):
    """Top-k per group — 'latest entry per key' generalization of
    find_last_entry (popelines/main.py:225-234). Shares the keyed
    survivor-selection implementation with exact_dedup and upsert
    (operators/keyed.keep_first): one shuffle on the group key; rank prune
    happens within partitions."""
    from popelines_spark.operators.keyed import keep_first

    return keep_first(
        T(spark, sf_dir, "orders"),
        keys=["o_custkey"],
        order=[F.col("o_totalprice").desc(), "o_orderkey"],
        n=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice")


@query(
    "b_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def b_union_all(spark, sf_dir):
    """Schema-aligned UNION ALL (append semantics, popelines/main.py:137-139).
    Overlapping subsets on purpose: duplicates must survive."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
    a = o.filter(F.col("o_totalprice") > 400000)
    b = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return a.unionByName(b).select("o_orderkey", "o_totalprice")


@query(
    "b_union_evolve",
    oracle="""
    SELECT c_custkey, c_name, NULL AS c_acctbal FROM customer WHERE c_nationkey < 5
    UNION ALL BY NAME
    SELECT c_custkey, c_acctbal FROM customer WHERE c_nationkey >= 20
    """,
)
def b_union_evolve(spark, sf_dir):
    """Union across evolved schemas: missing columns null-fill
    (merge_schemas + ALLOW_FIELD_ADDITION, popelines/main.py:77-98,139)."""
    c = T(spark, sf_dir, "customer")
    v1 = c.filter(F.col("c_nationkey") < 5).select("c_custkey", "c_name")
    v2 = c.filter(F.col("c_nationkey") >= 20).select("c_custkey", "c_acctbal")
    return v1.unionByName(v2, allowMissingColumns=True)


@query(
    "b_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def b_union_distinct(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.union(b).distinct()


@query(
    "b_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def b_intersect(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "b_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def b_except(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.exceptAll(b)
