"""Crash recovery on REAL debris: a writer killed (``os._exit``, no
Python cleanup, no JVM shutdown hooks) at each fault point of the
manifest append path (manifest.py::_crash_point) leaves exactly the
on-disk state a SIGKILL / OOM-kill would — and the protocol provably
survives it: readers never see torn state, the table stays writable
(after the documented lease windows), and maintenance honors its
safety rules over the debris.

Each test spawns a SUBPROCESS writer so the death is a process death,
not a caught exception — fabricated-debris tests (test_commit_lock,
test_manifest_tables) pin the same rules, these pin that the real code
path produces the debris those tests fabricate.
"""

import os
import subprocess
import sys
import time

from pyspark.sql import functions as F

from popelines_spark.manifest import (
    append_manifest_table,
    cleanup_orphan_files,
    heal_manifest_table,
    read_manifest_table,
)

CHILD = """
import os, sys
from popelines_spark.session import get_spark
from popelines_spark.manifest import append_manifest_table
from popelines_spark.manifest_dml import delete_manifest_rows
wh, op = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="crash_child", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
if op == "append":
    append_manifest_table(
        spark, wh, "t",
        spark.range(20).selectExpr("id", "'crash' AS tag"),
    )
else:
    delete_manifest_rows(spark, wh, "t", "id >= 5")
os._exit(7)  # reaching here means the crash point never fired
"""


def _base(spark, scratch, n=10):
    append_manifest_table(
        spark, scratch, "t",
        spark.range(n).selectExpr("id", "'base' AS tag"),
    )


def _crash_append(scratch, point, op="append"):
    env = dict(os.environ, POPELINES_MANIFEST_CRASH_POINT=point)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, scratch, op],
        env=env, capture_output=True, timeout=600,
    )
    assert p.returncode == 42, (
        point, p.returncode, p.stderr.decode()[-2000:],
    )


def _age(path, sec=7200):
    past = time.time() - sec
    os.utime(path, (past, past))


def _vroot(scratch):
    return f"{scratch}/t/versions"


def test_crash_after_reserve(spark, scratch):
    """Death right after winning a version number: the bare marker must
    not block reads or later writers (they reserve past it)."""
    _base(spark, scratch)
    _crash_append(scratch, "after_reserve")
    assert os.path.exists(f"{_vroot(scratch)}/2.__reserved")
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 10 and got.where("tag = 'crash'").count() == 0
    append_manifest_table(
        spark, scratch, "t", spark.range(5).selectExpr("id", "'after' AS tag")
    )
    assert read_manifest_table(spark, scratch, "t").count() == 15


def test_crash_after_data_write(spark, scratch):
    """Death after the batch's parquet landed but before any commit:
    the orphan data dir is invisible, and cleanup honors its documented
    safety rule — an ABANDONED reservation's own dir is skipped
    (presumed-dead is not proven-dead), so the sweep removes nothing."""
    _base(spark, scratch)
    _crash_append(scratch, "after_data_write")
    assert os.path.isdir(f"{scratch}/t/data/v2")
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 10 and got.where("tag = 'crash'").count() == 0
    _age(f"{_vroot(scratch)}/2.__reserved")
    assert cleanup_orphan_files(
        spark, scratch, "t", reservation_timeout_sec=3600
    ) == 0
    assert os.path.isdir(f"{scratch}/t/data/v2")  # skipped, not swept
    # ... until the PROVEN-dead horizon: with abandoned_reclaim_sec the
    # partial write is reclaimed — files first, marker last
    import glob

    for f in glob.glob(f"{scratch}/t/data/v2/**/*.parquet", recursive=True):
        _age(f)
    assert cleanup_orphan_files(
        spark, scratch, "t",
        reservation_timeout_sec=3600, abandoned_reclaim_sec=3600,
    ) >= 1
    assert not glob.glob(f"{scratch}/t/data/v2/**/*.parquet", recursive=True)
    assert not os.path.exists(f"{_vroot(scratch)}/2.__reserved")
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 10 and got.where("tag = 'crash'").count() == 0
    append_manifest_table(
        spark, scratch, "t", spark.range(5).selectExpr("id", "'after' AS tag")
    )
    assert read_manifest_table(spark, scratch, "t").count() == 15


def test_crash_after_manifest_write_holding_the_lock(spark, scratch):
    """Death INSIDE the commit lock, manifest written, _COMMITTED not:
    the torn version is invisible, heal does not resurrect it, and the
    leaked lock is taken over once stale — the full takeover path
    exercised on genuine crash debris."""
    _base(spark, scratch)
    _crash_append(scratch, "after_manifest_write")
    vroot = _vroot(scratch)
    assert os.path.exists(f"{vroot}/2/manifest.json")
    assert not os.path.exists(f"{vroot}/2/_COMMITTED")
    assert os.path.exists(f"{vroot}/.__commit_lock")
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 10 and got.where("tag = 'crash'").count() == 0
    assert heal_manifest_table(spark, scratch, "t") == 0
    got = read_manifest_table(spark, scratch, "t")
    assert got.where("tag = 'crash'").count() == 0, "torn rows resurrected"
    _age(f"{vroot}/.__commit_lock")
    _age(f"{vroot}/2.__reserved")
    append_manifest_table(
        spark, scratch, "t", spark.range(5).selectExpr("id", "'after' AS tag")
    )
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 15
    assert got.where("tag = 'crash'").count() == 0
    assert not os.path.exists(f"{vroot}/.__commit_lock")


def test_crash_delete_after_rewrite_write(spark, scratch):
    """A DELETE's writer dies after the survivor rewrite landed but
    before the commit: the DELETE never happened (all rows intact), the
    rewrite is invisible debris, a re-issued DELETE succeeds, and the
    proven-dead horizon reclaims the orphan rewrite."""
    import glob

    from popelines_spark.manifest_dml import delete_manifest_rows

    _base(spark, scratch)
    _crash_append(scratch, "after_rewrite_write", op="delete")
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 10, "crashed DELETE partially applied"
    assert os.path.isdir(f"{scratch}/t/data/v2")  # orphan rewrite
    _age(f"{_vroot(scratch)}/2.__reserved")
    delete_manifest_rows(spark, scratch, "t", "id >= 5")
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 5
    assert got.agg(F.max("id")).collect()[0][0] == 4
    for f in glob.glob(f"{scratch}/t/data/v2/**/*.parquet", recursive=True):
        _age(f)
    cleanup_orphan_files(
        spark, scratch, "t",
        reservation_timeout_sec=3600, abandoned_reclaim_sec=3600,
    )
    assert not glob.glob(f"{scratch}/t/data/v2/**/*.parquet", recursive=True)
    assert read_manifest_table(spark, scratch, "t").count() == 5


def test_crash_delete_after_flip(spark, scratch):
    """A DELETE's writer dies right after the commit marker landed: the
    DELETE is durable (exactly-once — a cautious client re-issuing it
    matches zero rows and no-ops), leases age out as usual."""
    _base(spark, scratch)
    _crash_append(scratch, "after_flip", op="delete")
    vroot = _vroot(scratch)
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 5 and got.agg(F.max("id")).collect()[0][0] == 4
    _age(f"{vroot}/.__commit_lock")
    _age(f"{vroot}/2.__reserved")
    append_manifest_table(
        spark, scratch, "t", spark.range(3).selectExpr("id", "'after' AS tag")
    )
    assert read_manifest_table(spark, scratch, "t").count() == 8


def test_reclaim_keeps_marker_guarding_referenced_dir_above_tip(
    spark, scratch
):
    """The reclaim's reuse guard: a not-committed number ABOVE the tip
    whose dir holds files a committed manifest references (heal-replay
    adoption debris) keeps its marker — deleting it would let a new
    claimant parquet-overwrite live data."""
    import glob
    import json
    import shutil

    from popelines_spark.manifest import _commit_manifest
    from popelines_spark.io import _hadoop_fs

    _base(spark, scratch)
    vroot = _vroot(scratch)
    man1 = json.load(open(f"{vroot}/1/manifest.json"))
    src = glob.glob(f"{scratch}/t/data/v1/*.parquet")[0]
    os.makedirs(f"{scratch}/t/data/v9", exist_ok=True)
    adopted = f"{scratch}/t/data/v9/adopted.parquet"
    shutil.copy(src, adopted)
    fs, root, jvm = _hadoop_fs(spark, f"{scratch}/t")
    adopted_uri = f"file:{adopted}"
    _commit_manifest(
        spark, fs, vroot, 2,
        man1["files"] + [adopted_uri], man1["schema"], jvm,
        parent=1, op="append",
    )
    open(f"{vroot}/9.__reserved", "w").close()
    _age(f"{vroot}/9.__reserved")
    _age(adopted)
    before = read_manifest_table(spark, scratch, "t").count()
    cleanup_orphan_files(
        spark, scratch, "t",
        reservation_timeout_sec=3600, abandoned_reclaim_sec=3600,
    )
    assert os.path.exists(f"{vroot}/9.__reserved"), "reuse guard removed"
    assert os.path.exists(adopted)
    assert read_manifest_table(spark, scratch, "t").count() == before


STREAM_CHILD = """
import os, sys
from popelines_spark.session import get_spark
from popelines_spark.streaming.manifest_sink import write_stream_to_manifest
wh, src, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(app_name="crash_stream", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
q = write_stream_to_manifest(stream, wh, "t", ckpt)
q.awaitTermination()
os._exit(7)  # reaching here means the crash point never fired
"""


def test_streaming_sink_survives_crash_between_commit_and_checkpoint(
    spark, scratch, tmp_path
):
    """The REAL at-least-once window: the sink's writer dies after the
    manifest commit flipped but before foreachBatch returned, so the
    streaming checkpoint never recorded batch 0. The restarted query
    genuinely replays it — and the batch_id short-circuit turns the
    replay into a no-op WITHOUT even needing the crashed writer's
    leaked commit lock to age out (the idempotency check runs before
    any reservation). Exactly one committed version, zero duplicates."""
    src = str(tmp_path / "src")
    spark.range(40).selectExpr("id", "'s' AS tag").coalesce(1) \
        .write.parquet(src)
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ, POPELINES_MANIFEST_CRASH_POINT="after_flip")
    p = subprocess.run(
        [sys.executable, "-c", STREAM_CHILD, scratch, src, ckpt],
        env=env, capture_output=True, timeout=600,
    )
    assert p.returncode == 42, (p.returncode, p.stderr.decode()[-2000:])
    vroot = _vroot(scratch)
    # the commit is durable; the lock + reservation leaked with the crash
    assert read_manifest_table(spark, scratch, "t").count() == 40
    assert os.path.exists(f"{vroot}/.__commit_lock")
    # the streaming commit log must NOT have batch 0 (offsets are logged
    # before the batch runs, commits only after foreachBatch returns) —
    # this is what FORCES the restart to replay, not skip
    assert os.path.exists(f"{ckpt}/offsets/0")
    assert not os.path.exists(f"{ckpt}/commits/0")
    # restart over the same checkpoint WITHOUT touching the leaked lease
    from popelines_spark.streaming.manifest_sink import (
        write_stream_to_manifest,
    )

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = write_stream_to_manifest(stream, scratch, "t", ckpt)
    q.awaitTermination()
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 40, "replayed micro-batch duplicated"
    committed = [
        d for d in os.listdir(vroot)
        if d.isdigit() and os.path.exists(f"{vroot}/{d}/_COMMITTED")
    ]
    assert committed == ["1"], committed
    assert os.path.exists(f"{vroot}/.__commit_lock"), (
        "replay should short-circuit before ever taking the lock"
    )


def test_crash_after_flip(spark, scratch):
    """Death after _COMMITTED landed but before releasing reservation
    and lock: the commit IS durable (the client just never heard), and
    both leaked lease files age out without operator surgery."""
    _base(spark, scratch)
    _crash_append(scratch, "after_flip")
    vroot = _vroot(scratch)
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 30 and got.where("tag = 'crash'").count() == 20
    _age(f"{vroot}/.__commit_lock")
    _age(f"{vroot}/2.__reserved")
    # reclaim removes only the lease marker — version 2 is COMMITTED, so
    # its files are live and must survive untouched
    assert cleanup_orphan_files(
        spark, scratch, "t",
        reservation_timeout_sec=3600, abandoned_reclaim_sec=3600,
    ) == 0
    assert not os.path.exists(f"{vroot}/2.__reserved")
    assert read_manifest_table(spark, scratch, "t").count() == 30
    append_manifest_table(
        spark, scratch, "t", spark.range(5).selectExpr("id", "'after' AS tag")
    )
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 35
    assert {r["tag"] for r in got.select("tag").distinct().collect()} == {
        "base", "crash", "after",
    }
