"""Partitioned-layout evidence: directory pruning and idempotent
per-partition backfill (operators/partitioned.py)."""

from pyspark.sql import functions as F

from popelines_spark.operators.partitioned import (
    read_partition_range,
    write_partitioned,
)
from popelines_spark.plans.inspect import physical_plan

SF_DIR = "/root/testdata/sf0.001"


def _daily(spark):
    from popelines_spark.tables import load

    return load(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )


def test_partition_filter_reaches_directory_listing(spark, tmp_path):
    """An equality/range predicate on the partition column must show up
    as PartitionFilters on the scan (directory pruning), NOT as a data
    filter evaluated per row after reading everything."""
    path = str(tmp_path / "orders_pt")
    df = _daily(spark)
    write_partitioned(df, path, "month")
    months = sorted(r.month for r in df.select("month").distinct().collect())
    target = months[len(months) // 2]
    got = read_partition_range(spark, path, "month", lo=target, hi=target)
    plan = physical_plan(got)
    assert "PartitionFilters" in plan and "month" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    assert got.count() == df.where(F.col("month") == target).count()


def test_dynamic_overwrite_replaces_only_touched_partitions(
    spark, tmp_path
):
    """Re-writing ONE month's batch (the failed-chunk re-run) must leave
    every other partition byte-identical and replace that month without
    duplicating rows — the idempotent backfill contract."""
    path = str(tmp_path / "orders_dyn")
    df = _daily(spark)
    write_partitioned(df, path, "month")
    months = sorted(r.month for r in df.select("month").distinct().collect())
    target = months[0]
    before_other = (
        spark.read.parquet(path).where(F.col("month") != target).count()
    )
    # re-run the chunk, doubled prices (a corrected extract)
    batch = df.where(F.col("month") == target).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    write_partitioned(batch, path, "month")
    after = spark.read.parquet(path)
    assert after.where(F.col("month") != target).count() == before_other
    assert after.where(F.col("month") == target).count() == batch.count()
    # corrected values landed; no stale duplicates survived
    exp = batch.agg(F.sum(F.col("o_totalprice").cast("decimal(20,4)"))).collect()[0][0]
    got = (
        after.where(F.col("month") == target)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(20,4)")))
        .collect()[0][0]
    )
    assert got == exp


def test_static_overwrite_truncates_table(spark, tmp_path):
    """dynamic=False is the reference's WRITE_TRUNCATE analog: the whole
    table is replaced by the batch."""
    path = str(tmp_path / "orders_static")
    df = _daily(spark)
    write_partitioned(df, path, "month")
    months = sorted(r.month for r in df.select("month").distinct().collect())
    batch = df.where(F.col("month") == months[0])
    write_partitioned(batch, path, "month", dynamic=False)
    assert spark.read.parquet(path).count() == batch.count()


def test_write_table_partition_by_prunes(spark, tmp_path):
    """The facade path: io.write_table(partition_by=...) lays out
    directories and a partition-column predicate prunes on read —
    including across an evolved append."""
    from popelines_spark import io as pio

    df = _daily(spark)
    wh = str(tmp_path / "wh")
    pio.write_table(df, wh, "orders_p", append=True, partition_by="month")
    # evolved append (new column) keeps the layout
    pio.write_table(
        df.withColumn("flag", F.lit(1)), wh, "orders_p",
        append=True, partition_by="month",
    )
    months = sorted(r.month for r in df.select("month").distinct().collect())
    got = pio.read_table_evolved(spark, wh, "orders_p").where(
        F.col("month") == months[0]
    )
    assert "PartitionFilters" in physical_plan(got)
    assert got.count() == 2 * df.where(F.col("month") == months[0]).count()
