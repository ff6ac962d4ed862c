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


def _salt_col_for(*dfs: DataFrame) -> str:
    """A salt column name absent from every input — a user column named
    ``__salt`` used to be silently overwritten and then dropped from the
    join output (review r12; same guard as bloom._bitmap_col_for)."""
    name = "__salt"
    existing = {c for df in dfs for c in df.columns}
    while name in existing:
        name += "_"
    return name


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
    salt = _salt_col_for(skewed, small)
    s = with_salt(skewed, salt_from, buckets, col=salt)
    r = small.withColumn(
        salt, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return s.join(r, [on, salt]).drop(salt)


#: Salt-bucket bounds for the planner: 2 is the smallest split that
#: helps; 64 caps the small side's replication cost at 64×.
_MIN_BUCKETS = 2
_MAX_BUCKETS = 64


def plan_skew_salt(
    big_stats: dict | None,
    on: str,
    how: str = "inner",
    shuffle_partitions: int = 32,
    min_skew_ratio: float = 4.0,
) -> dict | None:
    """Decide FROM AT-REST STATS (io.analyze_table ``key_columns=``)
    whether ``big JOIN small ON on`` needs a salted rewrite.

    Returns ``None`` (leave the join to Catalyst/AQE) or
    ``{"buckets": .., "reason": ..}`` for ``salted_join``. The planner
    half of skew mitigation, symmetric with ``bloom.plan_runtime_filter``:
    the reference's engine (BigQuery) re-plans hot keys transparently
    (popelines delegates via bq_query — main.py:240).

    Apply only when ALL hold:
      - ``how`` is inner: ``salted_join`` replicates the small side
        ×buckets, which any outer/semi/anti variant would double-count;
      - the big side's stats carry a ``keys[on]`` skew profile;
      - the hottest key overflows one reducer's even share
        (``max_key_rows > rows / shuffle_partitions``) — below that a
        single task absorbs it and salting only adds replication cost;
      - ``skew_ratio ≥ min_skew_ratio`` — near-uniform overflow means
        EVERY key is big and AQE's skew-join splitting already handles
        oversized partitions; salting pays only for outlier keys.

    ``buckets`` = smallest power of two spreading the hottest key back
    under the even share, clamped to [2, 64].
    """
    if how.lower().replace("_", "") != "inner":
        return None
    try:
        key = (big_stats or {})["keys"][on]
        rows = int(big_stats["rows"])
        max_key_rows = int(key["max_key_rows"])
        skew_ratio = float(key["skew_ratio"])
    except (KeyError, TypeError, ValueError):
        return None
    if rows <= 0 or max_key_rows <= 0:
        return None
    even_share = rows / max(1, shuffle_partitions)
    if max_key_rows <= even_share or skew_ratio < min_skew_ratio:
        return None
    buckets = _MIN_BUCKETS
    while buckets < _MAX_BUCKETS and max_key_rows / buckets > even_share:
        buckets <<= 1
    return {
        "buckets": buckets,
        "reason": (
            f"hottest key holds {max_key_rows} rows = "
            f"{max_key_rows / even_share:.1f}× a reducer's even share "
            f"(skew_ratio {skew_ratio}); salting ×{buckets}"
        ),
    }


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, buckets: int = 16
) -> DataFrame:
    """COUNT(DISTINCT x) per group under group-key skew, in two exact
    phases: distinct on (group, salt, x) spreads a hot group across
    ``buckets`` reducers, then per-group sum of partial distinct counts.
    Exact because the salt is derived from x itself — equal values always
    land in the same bucket."""
    salt = _salt_col_for(df)
    partial = (
        df.select(
            F.col(group_col),
            F.pmod(
                F.xxhash64(F.col(distinct_col)), F.lit(buckets)
            ).alias(salt),
            F.col(distinct_col),
        )
        .groupBy(group_col, salt)
        .agg(F.countDistinct(distinct_col).alias("__partial"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("__partial").cast("long").alias(f"n_distinct_{distinct_col}")
    )
