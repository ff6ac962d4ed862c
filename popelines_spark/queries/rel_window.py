"""SURVEY.md §2 B.5 — window functions.

Reference basis: delegated SQL surface (popelines/main.py:236-243); the
"latest entry per key" shape generalizes find_last_entry
(popelines/main.py:225-234).

Determinism: every window ordering ends in a unique key (orderkey/event_id)
so rank/ntile/lag assignments are total (SURVEY.md §5). Windowed double sums
accumulate in DECIMAL (see queries/_util.py).

Scale notes: window partitions shuffle once on the partition key; no global
(unpartitioned) windows are used anywhere — those serialize to one task.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import DEC, T


@query(
    "b_win_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
    FROM orders
    """,
)
def b_win_row_number(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
    )


@query(
    "b_win_rank",
    oracle="""
    SELECT o_orderkey,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank()    OVER w            AS prnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           cume_dist()       OVER w            AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def b_win_rank(spark, sf_dir):
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "b_win_lag_lead",
    oracle="""
    SELECT event_id,
           lag(value)       OVER w AS prev_value,
           lead(event_type) OVER w AS next_type,
           lag(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def b_win_lag_lead(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return T(spark, sf_dir, "events").select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@query(
    "b_win_running",
    oracle="""
    SELECT o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(20,4))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def b_win_running(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@query(
    "b_win_moving",
    oracle="""
    SELECT event_id,
           CAST(sum(CAST(value AS DECIMAL(20,4))) OVER w AS DOUBLE)
             / count(*) OVER w AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def b_win_moving(spark, sf_dir):
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, W.currentRow)
    )
    return T(spark, sf_dir, "events").select(
        "event_id",
        (
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg"),
    )


@query(
    "b_win_first_last",
    oracle="""
    SELECT event_id,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def b_win_first_last(spark, sf_dir):
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return T(spark, sf_dir, "events").select(
        "event_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
    )


@query(
    "b_win_ntile_dist",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def b_win_ntile_dist(spark, sf_dir):
    """Distribution window functions: ntile / percent_rank / cume_dist are
    integer-rank-derived (deterministic given the total order); nth_value
    pinned to the full-partition frame on both engines."""
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_key"),
    )
