"""Bucketed-table evidence: the write-once shuffle buys exchange-free
joins and aggregations — the layout play that keeps repeated fact-fact
joins viable at 100 TB (operators/bucketed.py)."""

import pytest
from pyspark.sql import functions as F

from popelines_spark.operators.bucketed import cobucketed_join, write_bucketed
from popelines_spark.plans.inspect import physical_plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    from popelines_spark.tables import load

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    od = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "bt_lineitem", "l_orderkey", 8)
    write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders", "l_orderkey", 8,
    )
    yield "bt_lineitem", "bt_orders"
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    """Same key, same bucket count, broadcast disabled → SortMergeJoin
    with ZERO Exchange operators: both sides stream straight from the
    bucketed scans. This is the plan a path-based layout can never
    produce — it re-shuffles both facts on every query."""
    lt, rt = bucketed_tables
    with _no_broadcast(spark):
        df = cobucketed_join(spark, lt, rt, "l_orderkey")
        plan = physical_plan(df)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the answer matches the shuffled path-based join
        n = df.count()
    from popelines_spark.tables import load

    li = load(spark, SF_DIR, "lineitem")
    od = load(spark, SF_DIR, "orders")
    assert n == li.join(od, li.l_orderkey == od.o_orderkey).count()


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key rides the same layout: partial+final
    hash agg collapse into one exchange-free pass over the scan."""
    lt, _ = bucketed_tables
    df = spark.table(lt).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert "Exchange" not in physical_plan(df)


def test_mismatched_bucket_count_still_correct(spark, bucketed_tables):
    """A 4-bucket side joined to the 8-bucket table must still answer
    correctly (Spark re-shuffles or coalesces the mismatch) — layout is
    an optimization, never a correctness contract."""
    lt, _ = bucketed_tables
    from popelines_spark.tables import load

    od = load(spark, SF_DIR, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(od, "bt_orders4", "l_orderkey", 4)
    try:
        with _no_broadcast(spark):
            n = cobucketed_join(spark, lt, "bt_orders4", "l_orderkey").count()
        li = load(spark, SF_DIR, "lineitem")
        assert n == li.join(
            od, li.l_orderkey == od["l_orderkey"]
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders4")


def test_bucket_file_count_is_bounded(spark, bucketed_tables):
    """write_bucketed's pre-repartition keeps the layout at ~1 file per
    bucket (not n_buckets × n_write_tasks small files)."""
    import os

    lt, _ = bucketed_tables
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .where(F.col("col_name") == "Location")
        .collect()[0][1]
    )
    path = loc.removeprefix("file:")
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert 0 < len(files) <= 8, files


class _no_broadcast:
    """Temporarily disable auto-broadcast so small test tables exercise
    the SortMergeJoin path the layout is built for."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", self.prev
        )
        return False


def test_partitioned_and_bucketed_compose(spark, tmp_path):
    """The standard lakehouse fact layout: directory-partitioned by date
    grain AND bucketed by join key. A date-filtered equi-join must show
    BOTH behaviors at once — PartitionFilters on the scan (directory
    pruning) and no Exchange (co-located buckets)."""
    from pyspark.sql import functions as F

    from popelines_spark.tables import load

    od = load(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    li = load(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    try:
        (
            od.repartition(4, "o_orderkey")
            .write.format("parquet")
            .partitionBy("month")
            .bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bt_orders_pm")
        )
        (
            li.repartition(4, "o_orderkey")
            .write.format("parquet")
            .bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bt_lineitem_pm")
        )
        months = sorted(
            r.month for r in od.select("month").distinct().collect()
        )
        target = months[0]
        with _no_broadcast(spark):
            df = (
                spark.table("bt_orders_pm")
                .where(F.col("month") == target)
                .join(spark.table("bt_lineitem_pm"), "o_orderkey")
            )
            plan = physical_plan(df)
            assert "PartitionFilters" in plan, plan
            assert "Exchange" not in plan, plan
            n = df.count()
        exp = (
            od.where(F.col("month") == target).join(li, "o_orderkey").count()
        )
        assert n == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders_pm")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem_pm")


def test_plan_bucketing_decision_table():
    from popelines_spark.operators.bucketed import plan_bucketing

    def _s(total_bytes, broadcastable=False, key="k"):
        return {
            "total_bytes": total_bytes,
            "suggest_broadcast": broadcastable,
            "columns": {key: {"approx_ndv": 1000}},
        }

    gb = 1 << 30
    # two big sides -> bucket, power of two, sized to the larger side
    plan = plan_bucketing(_s(40 * gb), _s(10 * gb), "k")
    n = plan["n_buckets"]
    assert (n & (n - 1)) == 0
    assert 40 * gb / n <= (256 << 20)
    # a broadcastable side -> the join is exchange-free already
    assert plan_bucketing(_s(40 * gb), _s(1 << 20, broadcastable=True), "k") is None
    # key missing from one side's stats -> can't co-locate
    assert plan_bucketing(_s(40 * gb), _s(10 * gb, key="other"), "k") is None
    # missing stats -> no recommendation
    assert plan_bucketing(None, _s(10 * gb), "k") is None
    # floor / cap
    assert plan_bucketing(_s(1 << 20), _s(1 << 20), "k")["n_buckets"] == 8
    assert plan_bucketing(_s(1 << 50), _s(1 << 20), "k")["n_buckets"] == 4096


def test_bucketize_pair_facade(spark, tmp_path):
    """Stats-driven co-bucketing end-to-end: the rewritten pair joins
    with no Exchange and matches the path-table join."""
    from popelines_spark import io
    from popelines_spark.operators.bucketed import cobucketed_join
    from popelines_spark.pipeline import Popeline
    import json

    p = Popeline(warehouse=str(tmp_path), spark=spark)
    left = spark.range(0, 5_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(0, 2_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("rv")
    )
    io.write_table(left, str(tmp_path), "lt")
    io.write_table(right, str(tmp_path), "rt")
    for t in ("lt", "rt"):
        stats = p.analyze_table(t)
        # tiny test tables are always broadcastable; simulate at-scale
        stats["suggest_broadcast"] = False
        (tmp_path / t / "_stats.json").write_text(json.dumps(stats))
        (tmp_path / t / f"._stats.json.crc").unlink(missing_ok=True)
    names = p.bucketize_pair("lt", "rt", on="k")
    assert names == ("lt_by_k", "rt_by_k")
    try:
        with _no_broadcast(spark):
            joined = cobucketed_join(spark, *names, key="k")
            plan = physical_plan(joined)
            assert "Exchange" not in plan
        plain = left.join(right, "k")
        assert joined.exceptAll(plain).count() == 0
        assert plain.exceptAll(joined).count() == 0
    finally:
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketize_pair_noop_when_broadcastable(spark, tmp_path):
    from popelines_spark import io
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path), spark=spark)
    io.write_table(spark.range(10).select(F.col("id").alias("k")), str(tmp_path), "a1")
    io.write_table(spark.range(10).select(F.col("id").alias("k")), str(tmp_path), "b1")
    p.analyze_table("a1"); p.analyze_table("b1")
    assert p.bucketize_pair("a1", "b1", on="k") is None


def test_bucketize_pair_reads_manifest_tip(spark, tmp_path):
    """bucketize_pair on a manifest (ACID) table must read the live tip
    — a plain parquet glob would double-count dead pre-GC copy-on-write
    files and trip over versions/ JSON."""
    from popelines_spark import io
    from popelines_spark.manifest import append_manifest_table
    from popelines_spark.manifest_dml import delete_manifest_rows
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path), spark=spark)
    rows = spark.range(0, 1_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    append_manifest_table(spark, str(tmp_path), "ml", rows)
    # copy-on-write DML: dead pre-GC files now sit beside live ones
    delete_manifest_rows(spark, str(tmp_path), "ml", "v < 100")
    io.write_table(
        spark.range(0, 500).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("rv")
        ),
        str(tmp_path), "mr",
    )
    names = p.bucketize_pair("ml", "mr", on="k", n_buckets=4)
    assert names == ("ml_by_k", "mr_by_k")
    try:
        bucketed = spark.table("ml_by_k")
        assert bucketed.count() == 900  # tip rows only, no double-count
        assert bucketed.agg(F.min("v")).collect()[0][0] == 100
    finally:
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
