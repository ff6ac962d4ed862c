"""Snapshot-layout crash drills on REAL debris (io._snapshot_crash_point).

A subprocess writer is killed (``os._exit`` — SIGKILL semantics, no
Python/JVM cleanup) at each fault point of the snapshot commit path:

- ``after_reserve``   → bare ``.__reserved`` marker;
- ``after_data_write``→ marker + a TORN data dir without ``_COMMITTED``;
- ``after_flip``      → a committed version still holding its marker.

Pinned invariants over that debris:
- readers only ever see committed versions (torn dirs invisible);
- the idempotent retry client (``incremental_append`` — the watermark
  filter makes a replay of a secretly-committed batch a no-op) converges
  to exactly-once for every fault point;
- ``vacuum_snapshot_debris`` reclaims each debris class under its
  safety rules (presumed-dead horizon for reservations, any-age for
  unreachable dirs) and never touches live versions.

The unit pins in test_snapshot_tables.py fabricate this debris by hand;
these prove the real code path produces exactly the debris those rules
were written for.
"""

import os
import subprocess
import sys
import time

from popelines_spark import io

CHILD = """
import os, sys
from popelines_spark.session import get_spark
from popelines_spark.incremental import incremental_append
from popelines_spark.io import write_table_snapshot
wh, b = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="snap_chaos_child", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
batch = spark.range(b * 100, (b + 1) * 100).selectExpr(
    "id", "CAST(id AS timestamp) AS ts", "%d AS batch" % b)
if b == 0:
    # seed the SNAPSHOT layout explicitly: incremental_append on an
    # empty table would create a plain path table and the drill would
    # silently test the wrong protocol
    write_table_snapshot(spark, wh, "t", batch)
else:
    incremental_append(batch, wh, "t", "ts")
os._exit(0)
"""

FAULTS = ("after_reserve", "after_data_write", "after_flip")


def _run_batch(scratch, b, crash_point=None):
    env = dict(os.environ)
    env.pop("POPELINES_SNAPSHOT_CRASH_POINT", None)
    if crash_point:
        env["POPELINES_SNAPSHOT_CRASH_POINT"] = crash_point
    p = subprocess.run(
        [sys.executable, "-c", CHILD, scratch, str(b)],
        env=env, capture_output=True, timeout=600,
    )
    want = 42 if crash_point else 0
    assert p.returncode == want, (
        crash_point, p.returncode, p.stderr.decode()[-2000:],
    )


def _versions_dir(scratch):
    return os.path.join(scratch, "t", "_versions")


def _age_markers(scratch, sec=7200):
    past = time.time() - sec
    for name in os.listdir(_versions_dir(scratch)):
        if name.endswith(".__reserved"):
            p = os.path.join(_versions_dir(scratch), name)
            os.utime(p, (past, past))


def test_snapshot_chaos_retry_converges_exactly_once(spark, scratch):
    """Drive 7 batches; batches 1/3/5 die at the three fault points and
    are blindly re-run by the client. Quiesce: every batch's rows
    present exactly once, and the debris classes are exactly as
    documented."""
    # seed (batch 0) + alternating crash/clean batches
    _run_batch(scratch, 0)
    for b, fault in ((1, "after_reserve"), (2, None),
                     (3, "after_data_write"), (4, None),
                     (5, "after_flip"), (6, None)):
        if fault:
            _run_batch(scratch, b, crash_point=fault)
            # the client's blind retry of the dead batch
            _run_batch(scratch, b)
        else:
            _run_batch(scratch, b)

    live = io.read_table_snapshot(spark, scratch, "t")
    assert live.count() == 7 * 100
    per_batch = {
        r["batch"]: r["n"]
        for r in live.groupBy("batch").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert per_batch == {b: 100 for b in range(7)}, per_batch

    # debris audit: the three fault points left exactly their classes
    names = set(os.listdir(_versions_dir(scratch)))
    markers = {n for n in names if n.endswith(".__reserved")}
    torn = {
        n for n in names
        if n.startswith("v") and "." not in n
        and not os.path.exists(
            os.path.join(_versions_dir(scratch), n, "_COMMITTED")
        )
    }
    assert markers, "crash points left no reservation debris?"
    assert torn, "after_data_write left no torn dir?"

    # vacuum under the presumed-dead horizon: age the markers past it,
    # then everything reclaims and the live rows are untouched
    _age_markers(scratch)
    cleaned = io.vacuum_snapshot_debris(spark, scratch, "t")
    assert cleaned["markers"] and cleaned["torn_dirs"]
    names = set(os.listdir(_versions_dir(scratch)))
    assert not any(n.endswith(".__reserved") for n in names)
    for n in names:
        assert os.path.exists(
            os.path.join(_versions_dir(scratch), n, "_COMMITTED")
        ), f"uncommitted dir {n} survived vacuum"
    assert io.read_table_snapshot(spark, scratch, "t").count() == 7 * 100


def test_vacuum_respects_live_writer_lease(spark, scratch):
    """A FRESH reservation (and its torn dir) is a maybe-live writer:
    vacuum must leave both alone until the horizon passes. A committed
    version's leftover marker is debris at any age."""
    _run_batch(scratch, 0)
    _run_batch(scratch, 1, crash_point="after_data_write")  # fresh torn
    _run_batch(scratch, 2, crash_point="after_flip")  # committed+marker
    before = set(os.listdir(_versions_dir(scratch)))
    cleaned = io.vacuum_snapshot_debris(spark, scratch, "t")
    # the after_flip marker goes (any age); the fresh torn write stays
    assert cleaned["markers"] and not cleaned["torn_dirs"]
    assert not cleaned["orphan_dirs"]
    after = set(os.listdir(_versions_dir(scratch)))
    removed = {n for n in before - after if not n.endswith(".crc")}
    assert removed == {
        n for n in removed if n.endswith(".__reserved")
    }, removed
    torn_dirs = [
        n for n in after
        if n.startswith("v") and "." not in n
        and not os.path.exists(
            os.path.join(_versions_dir(scratch), n, "_COMMITTED")
        )
    ]
    assert torn_dirs, "fresh torn dir must survive until the horizon"
    # past the horizon it reclaims
    _age_markers(scratch)
    cleaned = io.vacuum_snapshot_debris(spark, scratch, "t")
    assert cleaned["torn_dirs"]


def test_vacuum_never_deletes_a_committed_dir_on_a_stale_scan(
    spark, scratch, monkeypatch
):
    """The data-loss hole the claim-based delete closes: a version that
    COMMITS between vacuum's committed-versions scan and its delete
    must survive. Simulated by pinning the scan to a stale empty view —
    the commit marker is re-read under the claim, so the committed dir
    is kept in BOTH branches (aged leftover marker, and no marker at
    all)."""
    _run_batch(scratch, 0)  # v1 committed, no reservation left
    # aged leftover marker on the committed version (after_flip debris)
    marker = os.path.join(_versions_dir(scratch), "v00000001.__reserved")
    open(marker, "w").close()
    _age_markers(scratch)
    monkeypatch.setattr(io, "_committed_versions", lambda fs, root, jvm: [])
    cleaned = io.vacuum_snapshot_debris(spark, scratch, "t")
    # the stale scan saw nothing committed, yet the dir survived both
    # the torn-dir branch (marker broken, then _COMMITTED re-read under
    # the claim) and the orphan sweep
    assert cleaned["torn_dirs"] == [] and cleaned["orphan_dirs"] == []
    assert not os.path.exists(marker)  # the leftover marker is debris
    monkeypatch.undo()
    assert io.read_table_snapshot(spark, scratch, "t").count() == 100


APPENDER = """
import os, sys, time
from popelines_spark.session import get_spark
from popelines_spark.incremental import incremental_append
wh, n = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="snap_race_appender", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
for b in range(1, n + 1):
    batch = spark.range(b * 100, (b + 1) * 100).selectExpr(
        "id", "CAST(id AS timestamp) AS ts", "%d AS batch" % b)
    # the documented client contract: a writer whose lease was broken
    # (or whose base was superseded) retracts and RETRIES; the watermark
    # filter makes a replay of a secretly-committed batch a no-op
    for attempt in range(40):
        try:
            incremental_append(batch, wh, "t", "ts")
            break
        except Exception:
            time.sleep(0.2)
    else:
        os._exit(3)
os._exit(0)
"""

COMPACTOR = """
import os, sys, time
from popelines_spark.session import get_spark
from popelines_spark.io import (
    compact_table_snapshot, ConcurrentSnapshotWriteError)
wh, stop_flag = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="snap_race_compactor", cpus=2,
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
retracts = commits = 0
while not os.path.exists(stop_flag):
    try:
        compact_table_snapshot(spark, wh, "t", keep_versions=3)
        commits += 1
    except ConcurrentSnapshotWriteError:
        retracts += 1  # lost the race to the appender: by design
    except FileNotFoundError:
        pass
    time.sleep(0.1)
print("RESULT compactor commits=%d retracts=%d" % (commits, retracts))
os._exit(0)
"""


def test_append_vs_compaction_race_loses_no_batch(spark, scratch):
    """The snapshot layout's supported concurrency: ONE appender racing
    a compaction loop (plus retention GC at keep_versions=3). The
    rebase/retract protocol must lose no appended batch: a compaction
    that raced an in-flight append retracts itself and retries; an
    append whose lease broke retracts and the client retries. Quiesce:
    every batch present exactly once in the live view."""
    import subprocess as sp

    _run_batch(scratch, 0)  # seed the snapshot layout
    stop_flag = os.path.join(scratch, "stop")
    n_batches = 8
    compactor = sp.Popen(
        [sys.executable, "-c", COMPACTOR, scratch, stop_flag],
        stdout=sp.PIPE, stderr=sp.PIPE,
    )
    try:
        appender = sp.run(
            [sys.executable, "-c", APPENDER, scratch, str(n_batches)],
            capture_output=True, timeout=900,
        )
        assert appender.returncode == 0, appender.stderr.decode()[-2000:]
    finally:
        open(stop_flag, "w").close()
        out, err = compactor.communicate(timeout=600)
    assert compactor.returncode == 0, err.decode()[-2000:]
    # the drill is vacuous unless the compactor actually ran loops
    result = [
        l for l in out.decode().splitlines() if l.startswith("RESULT")
    ]
    assert result, out.decode()[-500:]
    commits = int(result[0].split("commits=")[1].split()[0])
    assert commits >= 1, result[0]

    live = io.read_table_snapshot(spark, scratch, "t")
    assert live.count() == (n_batches + 1) * 100
    per_batch = {
        r["batch"]: r["n"]
        for r in live.groupBy("batch").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert per_batch == {b: 100 for b in range(n_batches + 1)}, per_batch


REPLACER = """
import os, sys
from popelines_spark.session import get_spark
from popelines_spark.io import write_table_snapshot
wh, tag = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="snap_claim_racer", cpus=2,
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(100).selectExpr("id", "%d AS tag" % tag)
v = write_table_snapshot(spark, wh, "t", df)
print("RESULT version=%d tag=%d" % (v, tag))
os._exit(0)
"""


def test_concurrent_replaces_claim_distinct_versions(spark, scratch):
    """The arbiter-claim path under a real process race: N writers
    replacing the table simultaneously must win N DISTINCT version ids
    (the local-FS claim is POSIX O_CREAT|O_EXCL via the arbiter — the
    raw create(overwrite=False) it replaced was exists-check-then-create
    and could hand one id to two writers), every version fully
    committed, and the tip internally consistent."""
    import subprocess as sp

    _run_batch(scratch, 0)  # seed v1
    procs = [
        sp.Popen(
            [sys.executable, "-c", REPLACER, scratch, str(tag)],
            stdout=sp.PIPE, stderr=sp.PIPE,
        )
        for tag in range(1, 5)
    ]
    versions = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err.decode()[-2000:]
        line = [l for l in out.decode().splitlines() if l.startswith("RESULT")]
        versions.append(int(line[0].split("version=")[1].split()[0]))
    assert len(set(versions)) == len(versions), versions  # all distinct
    # every raced version is fully committed and reads whole
    for v in versions:
        df = io.read_table_snapshot(spark, scratch, "t", version=v)
        assert df.count() == 100
        assert df.select("tag").distinct().count() == 1
    # the live tip is the highest version, internally consistent
    live = io.read_table_snapshot(spark, scratch, "t")
    assert live.count() == 100
    assert live.select("tag").distinct().count() == 1


VACUUMER = """
import os, sys, time
from popelines_spark.session import get_spark
from popelines_spark.io import vacuum_snapshot_debris
wh, stop_flag = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="snap_race_vacuum", cpus=2,
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
loops = 0
while not os.path.exists(stop_flag):
    try:
        # AGGRESSIVELY low horizon (2 s vs ~1 s writes): slow appends
        # get their lease broken mid-write and must retract + retry —
        # the worst case the docstring's "safe on a live table" claim
        # must survive; committed data is never touched either way.
        # (horizon 0 at a 50 ms cadence is a designed LIVELOCK — every
        # write's lease breaks before it can flip — so the drill uses
        # the harshest setting that still lets writes land.)
        vacuum_snapshot_debris(spark, wh, "t", horizon_sec=2.0)
        loops += 1
    except FileNotFoundError:
        pass
    time.sleep(0.5)
print("RESULT vacuum loops=%d" % loops)
os._exit(0)
"""


def test_vacuum_racing_live_appender_loses_no_batch(spark, scratch):
    """vacuum_snapshot_debris's 'safe on a live table' contract at its
    worst survivable case: a 2 s horizon under ~1 s writes presumes a
    slow in-flight writer dead and breaks its lease mid-write; the
    writer retracts at its flip and the client retries (never a
    half-commit), and the claim-based delete plus under-claim commit
    re-read keep every committed version intact — exactly-once holds
    with an adversarial vacuum running the whole time."""
    import subprocess as sp

    _run_batch(scratch, 0)
    stop_flag = os.path.join(scratch, "stop")
    n_batches = 6
    vac = sp.Popen(
        [sys.executable, "-c", VACUUMER, scratch, stop_flag],
        stdout=sp.PIPE, stderr=sp.PIPE,
    )
    try:
        appender = sp.run(
            [sys.executable, "-c", APPENDER, scratch, str(n_batches)],
            capture_output=True, timeout=900,
        )
        assert appender.returncode == 0, appender.stderr.decode()[-2000:]
    finally:
        open(stop_flag, "w").close()
        out, err = vac.communicate(timeout=600)
    assert vac.returncode == 0, err.decode()[-2000:]
    result = [
        l for l in out.decode().splitlines() if l.startswith("RESULT")
    ]
    assert result, out.decode()[-500:]
    loops = int(result[0].split("loops=")[1])
    assert loops >= 1, result[0]

    live = io.read_table_snapshot(spark, scratch, "t")
    assert live.count() == (n_batches + 1) * 100
    per_batch = {
        r["batch"]: r["n"]
        for r in live.groupBy("batch").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert per_batch == {b: 100 for b in range(n_batches + 1)}, per_batch


def test_torn_dirs_never_visible_and_table_stays_writable(spark, scratch):
    """After every fault the table reads ONLY committed rows and accepts
    the next write without any manual repair."""
    _run_batch(scratch, 0)
    for fault in FAULTS:
        _run_batch(scratch, 90 + FAULTS.index(fault), crash_point=fault)
        live = io.read_table_snapshot(spark, scratch, "t")
        # every visible row belongs to a fully-committed batch
        assert live.count() % 100 == 0
    # next clean write lands fine over all that debris
    _run_batch(scratch, 99)
    assert (
        io.read_table_snapshot(spark, scratch, "t")
        .filter("batch = 99").count() == 100
    )
