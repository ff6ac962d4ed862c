"""Hive-style partitioned layout: directory pruning + per-partition
idempotent backfill.

Reference basis: the reference ingests date-chunked REST extracts
(`popelines/main.py:208-223` chunk_date_range feeding `write_to_bq`
append jobs) into BigQuery tables that are date-partitioned server-side.
The Spark-native equivalent is the `partitionBy` write layout:

 - **pruning**: a `WHERE day = X` / range predicate on the partition
   column resolves against the DIRECTORY listing (PartitionFilters in
   the scan node), so a 100 TB table with 3,000 day partitions reads
   only the matching directories — zero data touched outside the range,
   before any row-group or footer is opened;
 - **dynamic overwrite**: re-running a chunk's extract with
   ``partitionOverwriteMode=dynamic`` replaces ONLY the partitions the
   new batch contains — the idempotent-backfill contract a scheduler
   needs (a failed day re-runs without truncating the table and without
   duplicate rows), which the reference gets from BigQuery's
   WRITE_TRUNCATE-per-partition load jobs.

Partition-column cardinality is the sizing rule: day/month/region-grade
columns (10²-10⁴ directories) prune beautifully; high-cardinality keys
belong in bucketing (operators/bucketed.py) or z-order
(operators/zorder.py), never in the directory tree (one dir per value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Write ``df`` partitioned by ``partition_cols``. With ``dynamic``
    (and mode="overwrite"), only partitions present in ``df`` are
    replaced — the idempotent chunk-backfill write."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(
        partition_cols
    )
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode",
            "dynamic" if dynamic else "static",
        )
        df.write.partitionBy(*cols).mode(mode).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partition_range(
    spark: SparkSession,
    path: str,
    partition_col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Read a partitioned dataset restricted to [lo, hi] on the
    partition column. The predicate is expressed on the partition column
    so Catalyst turns it into PartitionFilters (directory pruning) —
    asserted in tests/test_partitioned_layout.py."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if lo is not None:
        df = df.where(F.col(partition_col) >= lo)
    if hi is not None:
        df = df.where(F.col(partition_col) <= hi)
    return df
