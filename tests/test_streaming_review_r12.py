"""Pins for the round-12 streaming review findings: sink batch-id
namespacing, changefeed reconciliation/retraction handling, runner conf
hygiene on start failure, grouped-op watermark floors, NULL-tolerant
stateful totals."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from popelines_spark.manifest import (
    append_manifest_table,
    heal_manifest_table,
    read_manifest_table,
)
from popelines_spark.streaming.changefeed import read_changefeed
from popelines_spark.streaming.manifest_sink import write_stream_to_manifest


def _mk(spark, lo, n, tag):
    return spark.range(lo, lo + n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def _stream_from(spark, path):
    return spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)


def _drain_feed(spark, feed, ckpt, out):
    q = (
        feed.writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.read.parquet(out)


def test_two_streams_same_table_do_not_false_dedup(spark, scratch, tmp_path):
    """Review r12: the bare foreachBatch epoch restarts from 0 per
    checkpoint, so two different queries writing one table silently
    no-op'd each other's batches. Checkpoint-derived namespacing keeps
    both."""
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    _mk(spark, 0, 30, "a").coalesce(1).write.parquet(src1)
    _mk(spark, 100, 20, "b").coalesce(1).write.parquet(src2)
    q1 = write_stream_to_manifest(
        _stream_from(spark, src1), scratch, "2q", str(tmp_path / "ck1")
    )
    q1.awaitTermination()
    # second, DIFFERENT query (fresh checkpoint) — its batch 0 must land
    q2 = write_stream_to_manifest(
        _stream_from(spark, src2), scratch, "2q", str(tmp_path / "ck2")
    )
    q2.awaitTermination()
    got = read_manifest_table(spark, scratch, "2q")
    assert got.count() == 50
    assert got.agg(F.countDistinct("tag")).collect()[0][0] == 2


def test_changefeed_skips_heal_reconciliation_commits(spark, scratch, tmp_path):
    """Review r12: heal's reconciliation commit re-adds an orphan's
    files; the feed already emits them at the orphan's own version, so
    the reconciliation must contribute zero rows (like compaction)."""
    import popelines_spark.manifest as m

    append_manifest_table(spark, scratch, "hf", _mk(spark, 0, 10, "a"))
    # fabricate the racing-appends shape the linearized protocol's
    # residual window allows: v2 and v3 BOTH parented on v1
    root = f"{scratch}/hf"
    fs, _, jvm = __import__(
        "popelines_spark.io", fromlist=["_hadoop_fs"]
    )._hadoop_fs(spark, root)
    vroot = f"{root}/versions"
    for v, lo, tag in ((2, 10, "b"), (3, 20, "c")):
        ddir = f"{root}/data/v{v}"
        _mk(spark, lo, 10, tag).coalesce(1).write.parquet(ddir)
        files = m._list_parquet(fs, ddir, jvm)
        parent = m._read_manifest_or_none(fs, vroot, 1, jvm)
        m._commit_manifest(
            spark, fs, vroot, v, parent["files"] + files,
            parent["schema"], jvm, parent=1, op="append",
            batch_ids=[f"fab-{v}"], enforce_linear=False,
            own_dir=f"/data/v{v}/",
        )
    assert heal_manifest_table(spark, scratch, "hf") >= 1
    # reconciliation landed: tip holds all 30 rows exactly once
    assert read_manifest_table(spark, scratch, "hf").count() == 30
    # full-history replay emits each row exactly once — the orphan's
    # rows come from its own version, NOT again from the reconciliation
    got = _drain_feed(
        spark, read_changefeed(spark, scratch, "hf"),
        str(tmp_path / "ck"), str(tmp_path / "out"),
    )
    rows = got.collect()
    assert len(rows) == 30
    assert len({r["id"] for r in rows}) == 30


def test_changefeed_planner_skips_retracted_hole_raises_on_gcd_floor(
    spark, scratch, monkeypatch
):
    """Review r12: a version vanishing between the offset listing and
    the manifest read with an older survivor is a racing writer's
    self-retract (retracted versions are childless under the linearized
    protocol) — contribution zero, the stream must not brick. A missing
    version with no older survivor is the GC shape and still fails
    loud."""
    import shutil

    import popelines_spark.streaming.changefeed as cf
    from pyspark.sql import types as T

    for lo, tag in ((0, "a"), (10, "b"), (20, "c")):
        append_manifest_table(spark, scratch, "rt", _mk(spark, lo, 10, tag))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tag", T.StringType()),
            T.StructField(cf._META_COL, T.IntegerType()),
        ]
    )
    reader = cf.ManifestChangefeedReader(
        schema, {"warehouse": scratch, "table": "rt"}
    )
    # the race: the offset window listed v3, then its writer
    # self-retracted — simulate with a stale listing + removed dir
    monkeypatch.setattr(cf, "_committed_versions", lambda vroot: [1, 2, 3])
    shutil.rmtree(f"{scratch}/rt/versions/3")
    parts = reader.partitions({"version": 1}, {"version": 3})
    emitted = [p for p in parts if p.path]
    assert emitted and all(p.version == 2 for p in emitted)
    # GC shape: the OLDEST listed version is gone — no older survivor,
    # replay would silently lose rows, so planning fails loud
    shutil.rmtree(f"{scratch}/rt/versions/1")
    with pytest.raises(RuntimeError, match="GC'd"):
        reader.partitions({"version": 0}, {"version": 3})


def test_runner_restores_confs_when_start_fails(spark, scratch):
    """Review r12: a start-time AnalysisException (append mode without a
    watermark) must not leak the shuffle-partition override."""
    from popelines_spark.streaming.runner import run_to_completion

    src = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    src.write.parquet(f"{scratch}/ev")
    stream = spark.readStream.schema(src.schema).parquet(f"{scratch}/ev")
    bad = stream.groupBy("user_id").count()  # no watermark
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(Exception):
        run_to_completion(bad, "append")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_grouped_ops_watermark_floor():
    from popelines_spark.streaming.ops import _default_watermark

    assert _default_watermark("1 day") == "1 day"
    assert _default_watermark("2 hours") == "2 hours"
    assert _default_watermark("30 minutes") == "1 hour"
    assert _default_watermark("1 hour") == "1 hour"


def test_stateful_totals_tolerate_null_values(spark, scratch):
    """Review r12: one NULL value row crashed the whole query
    (astype(int64) on NaN); NULLs must contribute 0 like SQL SUM."""
    from popelines_spark.streaming.runner import run_to_completion
    from popelines_spark.streaming.stateful import running_user_totals

    src = spark.createDataFrame(
        [
            (1, dt.datetime(2020, 1, 1, 0, 0), 2.5),
            (1, dt.datetime(2020, 1, 1, 0, 1), None),
            (1, dt.datetime(2020, 1, 1, 0, 2), 1.5),
        ],
        "user_id long, ts timestamp, value double",
    )
    src.write.parquet(f"{scratch}/ev")
    stream = spark.readStream.schema(src.schema).parquet(f"{scratch}/ev")
    out = run_to_completion(running_user_totals(stream), "update")
    rows = {r.user_id: r for r in out.collect()}
    assert rows[1].n_events == 3
    assert rows[1].total_cents == 400
