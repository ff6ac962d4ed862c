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


#: Directory-partitioning cardinality band: below _MIN the pruning is
#: too coarse to matter; above _MAX the directory tree explodes into a
#: small-files problem (one dir per value).
_MIN_PARTITIONS = 2
_MAX_PARTITIONS = 4096


def plan_layout(
    stats: dict | None,
    filter_columns: list[str],
    max_partitions: int = _MAX_PARTITIONS,
) -> dict | None:
    """Recommend an at-rest layout for a table FROM ITS STATS
    (io.analyze_table ``_stats.json``) and its workload's filter
    columns — the engine-native analog of BigQuery's partitioning +
    clustering recommendations (the reference's tables get this
    server-side; popelines/main.py:240 delegates).

    Returns ``None`` (no filter column is layout-eligible) or::

        {"partition_by": col | None,   # directory partitioning
         "cluster_by": [col, ...],     # sort/z-order within files
         "zorder": bool,               # True when len(cluster_by) == 2
         "reason": str}

    Rules (the sizing law from this module's docstring):
      - ``partition_by``: the filter column with the LARGEST NDV still
        inside [2, max_partitions] — finest directory pruning that
        cannot explode into small files. Mostly-null columns (> 10%)
        are not DIRECTORY candidates (their rows concentrate in one
        ``__HIVE_DEFAULT_PARTITION__`` dir) but still cluster fine —
        nulls sort together and don't hurt row-group min/max stats.
      - ``cluster_by``: remaining filter columns with NDV >
        max_partitions, highest first — too fine for directories, ideal
        for min/max row-group pruning via sort; exactly two INTEGER
        columns → Z-order (zorder_key interleaves long bits; string/
        date/float columns get the plain multi-column sort, which still
        prunes on the leading column).
    """
    if not stats:
        return None
    cols = stats.get("columns") or {}
    rows = max(1, int(stats.get("rows") or 1))
    part_cands: list[tuple[int, str]] = []
    cluster: list[tuple[int, str]] = []
    for c in filter_columns:
        cs = cols.get(c)
        if not cs:
            continue
        try:
            ndv = int(cs["approx_ndv"])
            nulls = int(cs.get("nulls") or 0)
        except (KeyError, TypeError, ValueError):
            continue
        mostly_null = nulls / rows > 0.10
        if _MIN_PARTITIONS <= ndv <= max_partitions and not mostly_null:
            part_cands.append((ndv, c))
        elif ndv > max_partitions or (mostly_null and ndv >= _MIN_PARTITIONS):
            cluster.append((ndv, c))
    if not part_cands and not cluster:
        return None
    partition_by = max(part_cands)[1] if part_cands else None
    cluster_by = [c for _, c in sorted(cluster, reverse=True)]
    # columns that lost the partition race still prune via sort order
    cluster_by += [
        c for _, c in sorted(part_cands, reverse=True) if c != partition_by
    ]
    integral = {"tinyint", "smallint", "int", "bigint"}
    zorder = len(cluster_by) == 2 and all(
        (cols[c].get("type") or "") in integral for c in cluster_by
    )
    return {
        "partition_by": partition_by,
        "cluster_by": cluster_by,
        "zorder": zorder,
        "reason": (
            f"partition_by={partition_by} "
            f"(NDV {dict((c, n) for n, c in part_cands).get(partition_by)}) "
            f"within [{_MIN_PARTITIONS}, {max_partitions}]; "
            f"cluster_by={cluster_by} for row-group min/max pruning"
        ),
    }


def apply_layout(df: DataFrame, path: str, layout: dict) -> None:
    """Rewrite ``df`` at ``path`` with a ``plan_layout`` recommendation:
    directory-partition on ``partition_by``, cluster the data files on
    ``cluster_by`` (Z-order for two columns, range + sort otherwise) so
    parquet min/max stats prune on every filter column.

    The shuffle ranges over (partition_by, cluster key) TOGETHER: each
    write task then holds one contiguous slice of one directory's data —
    without the partition column in the range, every task would spray a
    file into every directory it touches (the classic partitioned-write
    small-files bug)."""
    from pyspark.sql import functions as F

    cluster = layout.get("cluster_by") or []
    pcol = layout.get("partition_by")
    drop_after = []
    if layout.get("zorder") and len(cluster) == 2:
        from popelines_spark.operators.zorder import zorder_key

        df = df.withColumn(
            "__z", zorder_key(F.col(cluster[0]), F.col(cluster[1]))
        )
        sort_cols = ["__z"]
        drop_after = ["__z"]
    else:
        sort_cols = list(cluster)
    range_cols = ([pcol] if pcol else []) + sort_cols
    if range_cols:
        df = df.repartitionByRange(*range_cols).sortWithinPartitions(
            *range_cols
        )
    for c in drop_after:
        df = df.drop(c)  # projection after the sort keeps row order
    if pcol:
        write_partitioned(df, path, pcol, mode="overwrite", dynamic=False)
    else:
        df.write.mode("overwrite").parquet(path)


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
