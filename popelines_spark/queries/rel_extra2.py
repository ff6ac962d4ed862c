"""Third widening wave: exact order statistics, boolean aggregates, RANGE
window frames, batch sessionization (the batch twin of s_session).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import DEC, T


@query(
    "b_agg_median",
    oracle="""
    SELECT c_mktsegment,
           median(c_acctbal) AS med_bal,
           quantile_cont(c_acctbal, 0.25) AS q25_bal,
           bool_and(c_acctbal > -2000.0) AS all_above_floor,
           bool_or(c_acctbal > 10000.0) AS any_rich
    FROM customer GROUP BY c_mktsegment
    """,
)
def b_agg_median(spark, sf_dir):
    """Exact median / continuous quantile + boolean aggregates. Both
    engines linearly interpolate sorted neighbors; inputs are raw doubles
    so the interpolation arithmetic is bit-identical."""
    c = T(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.median("c_acctbal").alias("med_bal"),
        F.percentile("c_acctbal", F.lit(0.25)).alias("q25_bal"),
        F.bool_and(F.col("c_acctbal") > -2000.0).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 10000.0).alias("any_rich"),
    )


@query(
    "b_win_range_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(20,4))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def b_win_range_frame(spark, sf_dir):
    """RANGE frame over a time axis: trailing-30-day spend per customer —
    value-based framing (every row whose orderdate is within 30 days), not
    row-count framing. Decimal-exact so ties in o_orderdate don't matter
    (RANGE includes all peers)."""
    o = T(spark, sf_dir, "orders")
    # Order the RANGE frame on microseconds since epoch (NTZ timestamps
    # don't cast to long directly; unix_micros after a UTC-session cast is
    # exact and matches DuckDB's native interval frame).
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400 * 1_000_000, 0)
    )
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "trailing_30d_spend"
        ),
    )


@query(
    "c_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM flagged)
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(ts) AS TIMESTAMP) AS session_last
    FROM numbered GROUP BY user_id, sess
    """,
)
def c_sessionize(spark, sf_dir):
    """Batch sessionization (gaps-and-islands): lag → gap flag → running
    session number → group. The batch twin of s_session; one shuffle on
    user_id shared by both windows and the final groupBy."""
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        # gap compared in MICROSECONDS (unix_micros): a seconds-cast would
        # truncate sub-second parts and disagree with the oracle's exact
        # interval comparison at the boundary.
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
        "event_id",
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("sess"),
    )
    return (
        numbered.groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.max("ts").alias("session_last"),
        )
        .drop("sess")
    )
