"""SURVEY.md §2 B.3 — joins, plus the flagship star query.

Reference basis: arbitrary SQL via ``bq_query`` (popelines/main.py:236-243);
``LEFT JOIN`` emitted at popelines/copy_table.py:64; cross-join list built at
popelines/main.py:296,302; the as-of shape generalizes the incremental
watermark pattern (popelines/main.py:225-234).

Scale notes: region/nation are broadcast explicitly (fixed 5/25 rows at any
sf). customer/orders/lineitem joins are left to Catalyst + AQE — at 100 TB
they become shuffled sort-merge joins on the join key, which is the right
plan; AQE converts to broadcast at runtime when a side is small and splits
skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import T, dsum, sql_dsum


@query(
    "flagship_star_revenue",
    oracle=f"""
    SELECT c_mktsegment, o_orderpriority,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {sql_dsum('l_quantity')} AS sum_qty,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderpriority
    """,
)
def flagship_star_revenue(spark, sf_dir):
    """3-way star join + grouped agg: revenue by (mktsegment, priority).

    scan → join(lineitem⋈orders on orderkey) → join(⋈customer on custkey)
    → partial+final hash agg. Exercises the whole relational spine.

    r13: the fact scan is spread_by(l_orderkey) — the single-row-group
    testdata file pinned the scan-fused broadcast joins + countDistinct
    partial agg to a handful of tasks (plans/r13: 1.75 s of the query in
    a 3-task stage). Hash spread skips round-robin's sort-before-
    repartition AND co-locates each orderkey, so the distinct partial
    agg dedups fully before its exchange. Measured 2.6 s → 1.1 s
    interleaved; no-op on multi-file tables at cluster scale.
    """
    from popelines_spark.operators.par import spread_by

    li = spread_by(T(spark, sf_dir, "lineitem"), "l_orderkey")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            dsum("l_quantity").alias("sum_qty"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "b_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def b_join_inner(spark, sf_dir):
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = T(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "b_join_broadcast",
    oracle="""
    SELECT n_name, r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def b_join_broadcast(spark, sf_dir):
    """Dim joins with explicit broadcast — plan-invariant result.

    nation(25)/region(5) are broadcast at ANY scale factor: no shuffle of the
    fact side, map-side hash join (the 100 TB-correct plan).
    """
    cust = T(spark, sf_dir, "customer")
    nation = F.broadcast(T(spark, sf_dir, "nation"))
    region = F.broadcast(T(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "b_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    """,
)
def b_join_left(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000)
    return cust.join(orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "b_join_right",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM nation RIGHT JOIN supplier ON s_nationkey = n_nationkey
    """,
)
def b_join_right(spark, sf_dir):
    nation = T(spark, sf_dir, "nation")
    supp = T(spark, sf_dir, "supplier")
    return nation.join(supp, supp.s_nationkey == nation.n_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@query(
    "b_join_full",
    oracle="""
    WITH big_cust AS (SELECT * FROM customer WHERE c_acctbal > 9000),
         big_ord  AS (SELECT * FROM orders   WHERE o_totalprice > 450000)
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM big_cust FULL JOIN big_ord ON c_custkey = o_custkey
    """,
)
def b_join_full(spark, sf_dir):
    cust = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    orders = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "b_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def b_join_semi(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    urgent = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "b_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def b_join_anti(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "b_join_cross",
    oracle="""
    SELECT r_name, s_name FROM region CROSS JOIN supplier
    """,
)
def b_join_cross(spark, sf_dir):
    region = T(spark, sf_dir, "region")
    supp = T(spark, sf_dir, "supplier")
    return region.crossJoin(supp).select("r_name", "s_name")


@query(
    "b_join_theta",
    oracle="""
    SELECT s_suppkey, s_name, c_custkey
    FROM supplier JOIN customer
      ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal * 2
    """,
)
def b_join_theta(spark, sf_dir):
    """Equi + range predicate: Catalyst keeps the equi key for the hash/SMJ
    join and applies the theta term as a post-join filter — no BNLJ needed."""
    supp = T(spark, sf_dir, "supplier")
    cust = T(spark, sf_dir, "customer")
    cond = (cust.c_nationkey == supp.s_nationkey) & (
        cust.c_acctbal > supp.s_acctbal * 2
    )
    return supp.join(cust, cond).select("s_suppkey", "s_name", "c_custkey")


@query(
    "b_join_asof",
    oracle="""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
         pur AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT err.event_id, err.user_id,
           CAST(max(pur.ts) AS TIMESTAMP) AS last_purchase_ts
    FROM err LEFT JOIN pur
      ON err.user_id = pur.user_id AND pur.ts <= err.ts
    GROUP BY err.event_id, err.user_id
    """,
)
def b_join_asof(spark, sf_dir):
    """As-of join: for each error event, the latest purchase at ts <= error ts.

    Test-scale plan: equi-join on user_id + range predicate, then max() per
    left row — all stock primitives. 100 TB path: repartition both sides by
    user_id and use applyInPandas merge_asof per key-bucket, or bucketize ts
    into coarse ranges to bound the join fan-out (documented in
    operators/asof.py which this calls).
    """
    from popelines_spark.operators.asof import asof_join

    ev = T(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    return asof_join(
        err,
        pur,
        left_on="user_id",
        right_on="p_user_id",
        left_ts="ts",
        right_ts="p_ts",
    ).select(
        "event_id", "user_id", F.col("p_ts").alias("last_purchase_ts")
    )


@query(
    "b_unnest",
    oracle="""
    SELECT doc_id, u.word
    FROM documents
    LEFT JOIN LATERAL UNNEST(CASE WHEN n_chars < 60 THEN NULL
                             ELSE str_split(text, ' ')[1:3] END) AS u(word)
      ON TRUE
    WHERE doc_id <= 100
    """,
)
def b_unnest(spark, sf_dir):
    """LEFT JOIN UNNEST semantics (popelines/copy_table.py:63-65):
    explode_outer keeps parents whose array is NULL/empty."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    arr = F.when(
        F.col("n_chars") < 60, F.lit(None).cast("array<string>")
    ).otherwise(F.slice(F.split(F.col("text"), " "), 1, 3))
    return docs.select("doc_id", arr.alias("words")).select(
        "doc_id", F.explode_outer("words").alias("word")
    )


@query(
    "b_unnest_inner",
    oracle="""
    SELECT doc_id, u.word
    FROM documents, UNNEST(str_split(text, ' ')[1:5]) AS u(word)
    WHERE doc_id <= 50
    """,
)
def b_unnest_inner(spark, sf_dir):
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    return docs.select(
        "doc_id",
        F.explode(F.slice(F.split(F.col("text"), " "), 1, 5)).alias("word"),
    )


@query(
    "b_join_asof_strict",
    oracle="""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
         pur AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT err.event_id, CAST(max(pur.ts) AS TIMESTAMP) AS prev_purchase_ts
    FROM err JOIN pur
      ON err.user_id = pur.user_id AND pur.ts < err.ts
    GROUP BY err.event_id
    """,
)
def b_join_asof_strict(spark, sf_dir):
    """Strict (<) inner as-of: latest purchase STRICTLY before each error,
    unmatched errors dropped — the other half of the as-of contract
    (operators/asof.py strict/how parameters), same no-join union+window
    plan."""
    from popelines_spark.operators.asof import asof_join

    ev = T(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    return asof_join(
        err, pur, left_on="user_id", right_on="p_user_id",
        left_ts="ts", right_ts="p_ts", how="inner", strict=True,
    ).select("event_id", F.col("p_ts").alias("prev_purchase_ts"))
