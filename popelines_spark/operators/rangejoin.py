"""Batch range join via bucket expansion — the scale-safe form of a
non-equi time/number interval join.

A plain theta join ``p.ts BETWEEN e.ts - R AND e.ts + R`` has no equi key,
so Spark plans BroadcastNestedLoopJoin (fine only while one side is
broadcastable) or a cartesian. The bucketed rewrite restores a shuffle
key: quantize time into buckets of width >= the radius, expand each LEFT
row to the buckets its window overlaps (<= 3 when bucket == radius), give
each RIGHT row its single home bucket, equi-join on the bucket id, and
re-check the exact predicate. Every pair is seen at most once (the right
row has exactly one bucket), the join is a keyed shuffle, and fan-out is
bounded by the expansion factor — the same trick Databricks' range-join
optimization and KDB's window joins apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def count_within_radius(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_ts: str,
    right_ts: str,
    radius_us: int = US_PER_HOUR,
    out: str = "n_nearby",
) -> DataFrame:
    """For each left row, count right rows with
    ``|right_ts - left_ts| <= radius_us`` (inclusive). Returns
    (left_id, left_ts, out BIGINT), zero-count rows included.

    Bucket width == radius, so each left window [ts-R, ts+R] overlaps at
    most 3 buckets; per-(bucket) shuffle key, exact |Δ| <= R re-check
    after the equi-join. Integer microsecond arithmetic end-to-end.

    Duplicate left rows are safe: counting runs over the DISTINCT
    (left_id, left_ts) pairs and each input row — including exact
    duplicates — receives that pair's correct count via the final keyed
    join-back (ADVICE r6: the previous shape silently doubled the count
    for fully-duplicated rows).
    """
    lu = left.select(
        F.col(left_id), F.col(left_ts), F.unix_micros(left_ts).alias("__lu")
    )
    expanded = lu.select(left_id, "__lu").distinct().select(
        left_id,
        "__lu",
        F.explode(
            F.sequence(
                F.floor((F.col("__lu") - radius_us) / F.lit(radius_us)),
                F.floor((F.col("__lu") + radius_us) / F.lit(radius_us)),
            )
        ).alias("__bk"),
    )
    ru = right.select(
        F.unix_micros(right_ts).alias("__ru"),
        F.floor(F.unix_micros(right_ts) / F.lit(radius_us)).alias("__bk"),
    )
    # Grouping and joining back on (left_id, timestamp) — not left_id alone
    # — so a left_id that recurs with different timestamps gets each row's
    # own count (ADVICE r5).
    matched = (
        expanded.join(ru, "__bk")
        .filter(F.abs(F.col("__ru") - F.col("__lu")) <= radius_us)
        .groupBy(left_id, "__lu")
        .agg(F.count("*").cast("long").alias(out))
    )
    return (
        lu.join(matched, [left_id, "__lu"], "left")
        .select(
            left_id,
            left_ts,
            F.coalesce(out, F.lit(0).cast("long")).alias(out),
        )
    )
