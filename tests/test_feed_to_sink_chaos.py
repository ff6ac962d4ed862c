"""End-to-end exactly-once across a crash for the COMPOSED pipeline
changefeed → transform → exactly-once sink (VERDICT r12 next #6).

Both halves were proven separately (changefeed replay across
compact+GC; sink exactly-once across the commit/checkpoint window).
The production shape is a streaming pipeline BETWEEN two manifest
tables: ``read_changefeed(src) → filter/project →
write_stream_to_manifest(dst)``, with the writer SIGKILL'd mid-commit
(``POPELINES_MANIFEST_CRASH_POINT`` — os._exit, no cleanup) and blindly
restarted on the same checkpoint. Pinned invariant: dst ends at exactly
``transform(src)``, no row lost, no row doubled, heal converges, across
BOTH fault points (after_flip: commit durable but checkpoint never
recorded → the restart's replay must dedup; after_reserve: nothing
durable → the restart must re-run the batch in full).
"""

import os
import subprocess
import sys

import pytest

PIPE_CHILD = """
import os, sys
from pyspark.sql import functions as F
from popelines_spark.session import get_spark
from popelines_spark.streaming.changefeed import read_changefeed
from popelines_spark.streaming.manifest_sink import write_stream_to_manifest
wh, ckpt = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="feed_sink_chaos", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
feed = read_changefeed(spark, wh, "src")
tx = feed.where(F.col("k") % 2 == 0).select(
    "k", (F.col("v") * 2).cast("long").alias("v2")
)
q = write_stream_to_manifest(tx, wh, "dst", ckpt)
q.awaitTermination()
os._exit(7)  # reaching here means the crash point never fired
"""


def _append_src(spark, wh, b):
    from pyspark.sql import functions as F

    from popelines_spark.manifest import append_manifest_table

    df = spark.range(b * 100, (b + 1) * 100).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("long").alias("v")
    )
    append_manifest_table(spark, wh, "src", df, batch_id=f"src{b}")


def _run_child(wh, ckpt, crash_point=None, timeout=600):
    env = dict(os.environ)
    env.pop("POPELINES_MANIFEST_CRASH_POINT", None)
    if crash_point:
        env["POPELINES_MANIFEST_CRASH_POINT"] = crash_point
    # a SIGKILL'd holder leaks the dst commit lock; the drill (like
    # chaos_concurrent.py) shortens the presumed-dead lease so the
    # restarted writer's takeover is wall-clock bounded
    env["POPELINES_LOCK_STALE_SEC"] = "3"
    env["POPELINES_LOCK_TIMEOUT_SEC"] = "120"
    p = subprocess.run(
        [sys.executable, "-c", PIPE_CHILD, wh, ckpt],
        env=env, capture_output=True, timeout=timeout,
    )
    return p


def _check_dst(spark, wh, n_src_batches):
    """dst must equal transform(src) exactly: even k, v doubled."""
    from popelines_spark.manifest import (
        heal_manifest_table,
        read_manifest_table,
    )

    dst = read_manifest_table(spark, wh, "dst")
    n_expect = n_src_batches * 50  # half of each 100-row batch is even
    assert dst.count() == n_expect, "row count drifted"
    assert dst.select("k").distinct().count() == n_expect, "duplicates"
    bad = dst.where("k % 2 != 0 OR v2 != (k % 10) * 2").count()
    assert bad == 0, f"{bad} rows transformed wrongly"
    # same short presumed-dead lease as the children: a crashed child's
    # leaked commit lock must not make heal wait out the 300 s default
    old = os.environ.get("POPELINES_LOCK_STALE_SEC")
    os.environ["POPELINES_LOCK_STALE_SEC"] = "3"
    try:
        assert heal_manifest_table(spark, wh, "dst") == 0
    finally:
        if old is None:
            os.environ.pop("POPELINES_LOCK_STALE_SEC", None)
        else:
            os.environ["POPELINES_LOCK_STALE_SEC"] = old


@pytest.mark.parametrize("crash_point", ["after_flip", "after_reserve"])
def test_feed_transform_sink_exactly_once_across_crash(
    spark, scratch, tmp_path, crash_point
):
    ckpt = str(tmp_path / "ckpt")
    for b in range(3):
        _append_src(spark, scratch, b)

    # first run dies at the fault point while committing to dst
    p = _run_child(scratch, ckpt, crash_point=crash_point)
    assert p.returncode == 42, (p.returncode, p.stderr.decode()[-2000:])

    # blind restart on the same checkpoint completes the drain
    p = _run_child(scratch, ckpt)
    assert p.returncode == 7, (p.returncode, p.stderr.decode()[-2000:])
    _check_dst(spark, scratch, 3)

    # the pipeline continues incrementally: new src batches, one more
    # crash-and-restart cycle on the SAME checkpoint
    for b in range(3, 5):
        _append_src(spark, scratch, b)
    p = _run_child(scratch, ckpt, crash_point=crash_point)
    assert p.returncode == 42, (p.returncode, p.stderr.decode()[-2000:])
    p = _run_child(scratch, ckpt)
    assert p.returncode == 7, (p.returncode, p.stderr.decode()[-2000:])
    _check_dst(spark, scratch, 5)


def test_feed_transform_sink_idempotent_rerun(spark, scratch, tmp_path):
    """A re-run with NOTHING new to process adds nothing (the quiesced
    steady state of the composed pipeline)."""
    ckpt = str(tmp_path / "ckpt")
    for b in range(2):
        _append_src(spark, scratch, b)
    p = _run_child(scratch, ckpt)
    assert p.returncode == 7, p.stderr.decode()[-2000:]
    _check_dst(spark, scratch, 2)
    p = _run_child(scratch, ckpt)
    assert p.returncode == 7, p.stderr.decode()[-2000:]
    _check_dst(spark, scratch, 2)
