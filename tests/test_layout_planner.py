"""Stats-driven layout advisor (operators/partitioned.plan_layout /
apply_layout + the Pipeline facade).

Contract: plan_layout picks directory partitioning for filter columns in
the [2, max_partitions] NDV band (finest eligible wins), demotes
too-fine columns to file clustering (sort / Z-order), and apply_layout's
rewrite changes bytes-on-disk layout ONLY — the table's row set is
untouched and the promised pruning shows up in the scan plan.
"""

from pyspark.sql import functions as F

from popelines_spark import io
from popelines_spark.operators.partitioned import apply_layout, plan_layout
from popelines_spark.pipeline import Popeline
from popelines_spark.plans.inspect import physical_plan


def _col(ndv, nulls=0, typ="int"):
    return {"type": typ, "nulls": nulls, "min": "0", "max": "9", "approx_ndv": ndv}


def _stats(rows=100_000, **cols):
    return {"rows": rows, "columns": cols}


def test_plan_layout_decision_table():
    stats = _stats(
        day=_col(60, typ="date"),
        region=_col(5),
        user_id=_col(50_000),
        item_id=_col(9_000),
        mostly_null=_col(40, nulls=60_000),
    )
    # finest in-band NDV wins the directory; finer-than-band clusters
    plan = plan_layout(stats, ["day", "user_id"])
    assert plan["partition_by"] == "day"
    assert plan["cluster_by"] == ["user_id"] and plan["zorder"] is False
    # two in-band candidates: larger NDV partitions, loser clusters
    plan = plan_layout(stats, ["region", "day"])
    assert plan["partition_by"] == "day" and plan["cluster_by"] == ["region"]
    # two too-fine columns -> no directory, Z-order pair
    plan = plan_layout(stats, ["user_id", "item_id"])
    assert plan["partition_by"] is None
    assert plan["cluster_by"] == ["user_id", "item_id"] and plan["zorder"]
    # max_partitions is tunable: 9k fits a 16k budget
    plan = plan_layout(stats, ["item_id"], max_partitions=16_384)
    assert plan["partition_by"] == "item_id"
    # mostly-null column is never the directory key (it may still
    # cluster — test_plan_layout_null_heavy_column_still_clusters)
    assert plan_layout(stats, ["mostly_null"])["partition_by"] is None
    # no stats / unknown columns -> no recommendation
    assert plan_layout(None, ["day"]) is None
    assert plan_layout(stats, ["nope"]) is None


def _events_table(spark, tmp_path, name="ev"):
    df = spark.range(0, 20_000).select(
        F.date_add(F.lit("2024-01-01"), (F.col("id") % 60).cast("int")).alias("day"),
        (F.xxhash64("id") % 50_000).alias("user_id"),
        F.col("id").alias("payload"),
    )
    io.write_table(df, str(tmp_path), name)
    return df


def test_relayout_table_partitions_and_prunes(spark, tmp_path):
    p = Popeline(warehouse=str(tmp_path), spark=spark)
    orig = _events_table(spark, tmp_path).collect()
    p.analyze_table("ev")
    layout = p.relayout_table("ev", filter_columns=["day", "user_id"])
    assert layout["partition_by"] == "day"
    # directory layout on disk
    assert any(d.name.startswith("day=") for d in (tmp_path / "ev").iterdir())
    # row set unchanged by the rewrite (column ORDER may move: the
    # partition column goes last in the on-disk schema)
    after = io.read_table_evolved(spark, str(tmp_path), "ev")
    key = lambda r: (str(r["day"]), r["user_id"], r["payload"])  # noqa: E731
    assert sorted(key(r) for r in after.collect()) == sorted(
        key(r) for r in orig
    )
    # a day predicate resolves at the directory listing
    plan = physical_plan(after.where(F.col("day") == "2024-01-15"))
    assert "PartitionFilters" in plan and "day" in plan


def test_apply_layout_zorder_pair(spark, tmp_path):
    df = spark.range(0, 5_000).select(
        (F.col("id") % 997).alias("a"),
        F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)).alias("b"),
        F.col("id").alias("payload"),
    )
    layout = plan_layout(
        _stats(5_000, a=_col(997), b=_col(5_000)),
        ["a", "b"],
        max_partitions=64,
    )
    assert layout["zorder"] and layout["partition_by"] is None
    path = str(tmp_path / "zt")
    apply_layout(df, path, layout)
    back = spark.read.parquet(path)
    assert back.count() == 5_000
    assert "__z" not in back.columns
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_layout_rewrites_carry_stats_forward(spark, tmp_path):
    """compact_table and relayout_table move bytes, not rows: the
    ANALYZE stats survive the rewrite with byte-derived fields
    refreshed (they used to vanish with the replaced directory)."""
    p = Popeline(warehouse=str(tmp_path), spark=spark)
    _events_table(spark, tmp_path, "t")
    before = p.analyze_table("t", key_columns=["user_id"])
    p.compact_table("t")
    after = p.table_stats("t")
    assert after is not None
    assert after["rows"] == before["rows"]
    assert after["keys"]["user_id"] == before["keys"]["user_id"]
    assert after["total_bytes"] > 0
    p.relayout_table("t", filter_columns=["day", "user_id"])
    after = p.table_stats("t")
    assert after is not None and after["rows"] == before["rows"]


def test_plan_layout_zorder_needs_integer_pair():
    """zorder_key interleaves LONG bits: a non-integer cluster pair gets
    the plain multi-column sort, never a crashing cast."""
    stats = _stats(
        u1=_col(50_000, typ="string"),
        u2=_col(60_000, typ="string"),
        a=_col(50_000),
        b=_col(60_000),
    )
    plan = plan_layout(stats, ["u1", "u2"])
    assert plan["cluster_by"] == ["u2", "u1"] and plan["zorder"] is False
    assert plan_layout(stats, ["a", "b"])["zorder"] is True
    # mixed pair: still no zorder
    assert plan_layout(stats, ["a", "u1"])["zorder"] is False


def test_plan_layout_null_heavy_column_still_clusters():
    """>10% nulls disqualifies the DIRECTORY (one giant
    __HIVE_DEFAULT_PARTITION__), not the sort — nulls sort together and
    row-group min/max pruning still works."""
    stats = _stats(fk=_col(1_000_000, nulls=50_000), day=_col(60))
    plan = plan_layout(stats, ["fk", "day"])
    assert plan["partition_by"] == "day"
    assert "fk" in plan["cluster_by"]
    # null-heavy IN-BAND column: clusters instead of partitioning
    stats = _stats(tag=_col(40, nulls=50_000))
    plan = plan_layout(stats, ["tag"])
    assert plan["partition_by"] is None and plan["cluster_by"] == ["tag"]


def test_append_to_partitioned_table_inherits_layout(spark, tmp_path):
    """A flat append into a directory-partitioned table would break
    partition discovery for every reader; write_table inherits the live
    layout (and refuses a conflicting explicit one)."""
    import pytest as _pytest

    df = spark.range(0, 100).select(
        (F.col("id") % 3).cast("string").alias("day"),
        F.col("id").alias("v"),
    )
    io.write_table(df, str(tmp_path), "pt", partition_by="day")
    io.write_table(df, str(tmp_path), "pt", append=True)  # no partition_by
    back = io.read_table_evolved(spark, str(tmp_path), "pt")
    assert back.count() == 200
    assert any(d.name.startswith("day=") for d in (tmp_path / "pt").iterdir())
    assert not any(
        f.name.startswith("part-") for f in (tmp_path / "pt").iterdir()
    )
    with _pytest.raises(ValueError):
        io.write_table(df, str(tmp_path), "pt", append=True, partition_by="v")


def test_compact_preserves_partition_layout(spark, tmp_path):
    df = spark.range(0, 1_000).select(
        (F.col("id") % 5).cast("string").alias("day"),
        F.col("id").alias("v"),
    )
    io.write_table(df, str(tmp_path), "pt", partition_by="day")
    io.write_table(df, str(tmp_path), "pt", append=True)
    before, after = io.compact_table(spark, str(tmp_path), "pt")
    assert after <= before
    dirs = [d.name for d in (tmp_path / "pt").iterdir() if d.is_dir()]
    assert sum(1 for d in dirs if d.startswith("day=")) == 5
    assert io.read_table_evolved(spark, str(tmp_path), "pt").count() == 2_000


def test_reanalyze_refreshes_key_profile(spark, tmp_path):
    """analyze_table() after appends re-profiles the PREVIOUS key
    columns instead of silently dropping the skew profile (which would
    deactivate skew='auto')."""
    df = spark.range(0, 1_000).select(
        F.when(F.col("id") < 500, F.lit(1)).otherwise(F.col("id")).alias("k")
    )
    io.write_table(df, str(tmp_path), "t")
    io.analyze_table(spark, str(tmp_path), "t", key_columns=["k"])
    io.write_table(df, str(tmp_path), "t", append=True)
    stats = io.analyze_table(spark, str(tmp_path), "t")  # no key_columns
    assert stats["keys"]["k"]["max_key_rows"] == 1_000
    assert "stale" not in stats


def test_corrupt_stats_never_fails_an_append(spark, tmp_path):
    io.write_table(spark.range(5), str(tmp_path), "t")
    (tmp_path / "t" / "_stats.json").write_text("{not json")
    (tmp_path / "t" / "._stats.json.crc").unlink(missing_ok=True)
    # the data append must succeed despite the broken metadata file
    io.write_table(spark.range(5), str(tmp_path), "t", append=True)
    assert io.read_table_evolved(spark, str(tmp_path), "t").count() == 10
