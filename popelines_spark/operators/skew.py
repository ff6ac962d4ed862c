"""Skew-mitigation operators for hot keys at scale.

AQE's skew-join splitting (on by default, session.py) handles most runtime
skew; these helpers cover the cases AQE can't: pre-aggregation under a
skewed high-cardinality distinct, and joins where one key dominates so badly
that even a split partition's build side is hot.

All salting is DETERMINISTIC (xxhash64 of row content, not rand()) so plans
stay replayable and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_cols: list[str], buckets: int, col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) derived from row content."""
    return df.withColumn(
        col, F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(buckets))
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on``: the skewed side
    salts each row into one of ``buckets`` sub-keys; ``small`` replicates
    ×buckets (explode). The shuffle key becomes (on, salt) — a hot key's
    rows spread over ``buckets`` reducers instead of one.

    Use when ``small`` is too big to broadcast but ≪ the skewed side;
    replication cost = |small| × buckets rows.
    """
    salt_from = salt_from or skewed.columns
    s = with_salt(skewed, salt_from, buckets)
    r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return s.join(r, [on, "__salt"]).drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, buckets: int = 16
) -> DataFrame:
    """COUNT(DISTINCT x) per group under group-key skew, in two exact
    phases: distinct on (group, salt, x) spreads a hot group across
    ``buckets`` reducers, then per-group sum of partial distinct counts.
    Exact because the salt is derived from x itself — equal values always
    land in the same bucket."""
    partial = (
        df.select(
            F.col(group_col),
            F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets)).alias("__salt"),
            F.col(distinct_col),
        )
        .groupBy(group_col, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__partial"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("__partial").cast("long").alias(f"n_distinct_{distinct_col}")
    )
