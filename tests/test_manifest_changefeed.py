"""Manifest changefeed source (streaming/changefeed.py): version-diff
incremental reads, checkpointed restart without duplication, compaction
invisibility, replace commits surfacing as updates."""

import itertools
import os

from pyspark.sql import functions as F

from popelines_spark.manifest import (
    append_manifest_table,
    compact_manifest_table,
)
from popelines_spark.manifest_dml import update_manifest_rows
from popelines_spark.streaming.changefeed import read_changefeed

_N = itertools.count()


def _mk(spark, lo, n, tag):
    return spark.range(lo, lo + n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def _drain(spark, feed, ckpt, out):
    """Drain into a parquet sink (recoverable across restarts, unlike
    memory) and return the CUMULATIVE sink contents."""
    q = (
        feed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.read.parquet(out)


def test_changefeed_streams_appends_and_restarts_without_dups(
    spark, scratch, tmp_path
):
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    append_manifest_table(spark, scratch, "cf", _mk(spark, 0, 10, "a"))
    append_manifest_table(spark, scratch, "cf", _mk(spark, 10, 5, "b"))
    got = _drain(spark, read_changefeed(spark, scratch, "cf"), ckpt, out)
    rows = got.collect()
    assert len(rows) == 15
    assert {r["_change_version"] for r in rows} == {1, 2}
    # restart mid-stream: a new append lands, the SAME checkpoint resumes
    # and emits ONLY the new version's rows — 22 cumulative, no dups
    append_manifest_table(spark, scratch, "cf", _mk(spark, 15, 7, "c"))
    got2 = _drain(spark, read_changefeed(spark, scratch, "cf"), ckpt, out)
    rows2 = got2.collect()
    assert len(rows2) == 22
    assert sum(1 for r in rows2 if r["_change_version"] == 3) == 7
    assert len({r["id"] for r in rows2}) == 22  # every row exactly once


def test_changefeed_skips_compaction(spark, scratch, tmp_path):
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    append_manifest_table(spark, scratch, "cfc", _mk(spark, 0, 10, "a"))
    _drain(spark, read_changefeed(spark, scratch, "cfc"), ckpt, out)
    compact_manifest_table(spark, scratch, "cfc", n_files=1)
    got = _drain(spark, read_changefeed(spark, scratch, "cfc"), ckpt, out)
    assert got.count() == 10  # compaction moves bytes, not rows


def test_changefeed_surfaces_replace_as_updates(spark, scratch, tmp_path):
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    append_manifest_table(spark, scratch, "cfu", _mk(spark, 0, 10, "a"))
    _drain(spark, read_changefeed(spark, scratch, "cfu"), ckpt, out)
    update_manifest_rows(
        spark, scratch, "cfu", {"tag": "'UPD'"}, "id < 3"
    )
    got = _drain(spark, read_changefeed(spark, scratch, "cfu"), ckpt, out)
    new = [r for r in got.collect() if r["_change_version"] == 2]
    # the rewritten file's SURVIVING rows re-emit (updates as new rows)
    assert {r["tag"] for r in new} == {"UPD", "a"}
    assert sum(1 for r in new if r["tag"] == "UPD") == 3


def test_changefeed_start_version_skips_history(spark, scratch, tmp_path):
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    append_manifest_table(spark, scratch, "cfs", _mk(spark, 0, 10, "a"))
    append_manifest_table(spark, scratch, "cfs", _mk(spark, 10, 5, "b"))
    got = _drain(
        spark, read_changefeed(spark, scratch, "cfs", start_version=1),
        ckpt, out,
    )
    rows = got.collect()
    assert len(rows) == 5 and {r["tag"] for r in rows} == {"b"}
