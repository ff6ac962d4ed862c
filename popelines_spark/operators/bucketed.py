"""Bucketed tables: pre-shuffled layout for repeated co-located joins.

Reference basis: BigQuery gives the reference's tables server-side
clustering (`popelines/main.py:100-155` loads into clustered tables and
every join runs inside BigQuery); the Spark-native equivalent a user
controls is catalog-level bucketing — pay the shuffle ONCE at write
time, then every subsequent equi-join / groupBy on the bucket key reads
both sides already hash-partitioned and plans with NO Exchange.

This matters most exactly where 100 TB hurts: a fact-fact join
(lineitem ⋈ orders on orderkey) re-shuffles both sides on EVERY query in
the path-based layout; bucketed on the join key with the same bucket
count, the scan itself reports the hash partitioning and Catalyst elides
both exchanges (and with ``sortBy`` the sort too). The write-side cost
is one extra shuffle per ingest batch — amortized over every downstream
query.

Caveats encoded here rather than discovered at scale:
 - both sides must share bucket COUNT and KEY (else Spark re-shuffles
   the mismatched side; Spark 3.1+ can coalesce power-of-two ratios via
   spark.sql.bucketing.coalesceBucketedTableScan.enabled);
 - bucket pruning applies to equality predicates on the bucket key
   (``WHERE o_orderkey = k`` reads 1/n of the files);
 - one file per bucket per write task — write with a prior
   ``repartition(n_buckets, key)`` so each task owns whole buckets and
   small-file explosion is bounded (n_buckets files total per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and bucket-sorted) by
    ``key``. The pre-repartition keeps the output at n_buckets files per
    write instead of n_buckets × n_tasks."""
    w = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.mode(mode).saveAsTable(table_name)


#: Bucket sizing: aim ~256 MiB of on-disk data per bucket (one healthy
#: parquet file), clamped so tiny pairs don't over-split and huge ones
#: don't exceed the catalog's comfort.
_TARGET_BUCKET_BYTES = 256 << 20
_MIN_BUCKETS = 8
_MAX_BUCKETS = 4096


def plan_bucketing(
    left_stats: dict | None,
    right_stats: dict | None,
    on: str,
    target_bucket_bytes: int = _TARGET_BUCKET_BYTES,
) -> dict | None:
    """Decide FROM AT-REST STATS whether a join pair should be
    co-bucketed, and at what bucket count — the planner leg for
    REPEATED big⋈big joins (broadcast/bloom/salt cover the asymmetric
    cases; this one pays one write-time shuffle to delete the per-query
    exchange on BOTH sides).

    Returns ``None`` or ``{"n_buckets": .., "reason": ..}``. Apply only
    when ALL hold:
      - both stats exist and carry the key column (else the join can't
        co-locate on it);
      - NEITHER side is broadcastable — a broadcastable side makes the
        join exchange-free already, bucketing would be pure write cost.

    ``n_buckets``: power of two (so Spark's
    coalesceBucketedTableScan can still mate a future table at a 2^k
    ratio) putting the LARGER side near ``target_bucket_bytes`` per
    bucket, clamped to [8, 4096].
    """
    if not left_stats or not right_stats:
        return None
    for s in (left_stats, right_stats):
        if s.get("suggest_broadcast", False):
            return None
        if on not in (s.get("columns") or {}):
            return None
    biggest = max(
        int(left_stats.get("total_bytes") or 0),
        int(right_stats.get("total_bytes") or 0),
    )
    if biggest <= 0:
        return None
    n = _MIN_BUCKETS
    while n < _MAX_BUCKETS and biggest / n > target_bucket_bytes:
        n <<= 1
    return {
        "n_buckets": n,
        "reason": (
            f"both sides non-broadcastable; larger side {biggest}B → "
            f"{n} buckets ≈ {biggest // n}B/bucket "
            f"(target {target_bucket_bytes}B)"
        ),
    }


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables on their bucket key.

    With matching bucket specs this plans as a SortMergeJoin whose BOTH
    children are bare bucketed scans — no Exchange, no per-query
    shuffle (asserted in tests/test_bucketed_join.py). The function is
    deliberately thin: the capability lives in the table layout, and any
    groupBy(key) on one table gets the same exchange elision for free.
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
