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
