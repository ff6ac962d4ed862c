"""Concurrent chaos drill: RACING subprocess writers, some of which die
at fault points MID-COMMIT (including while holding the commit lock),
with blind per-writer retries — the table must still converge to
exactly-once.

This composes the two existing harnesses' axes: stress_manifest.py has
contention without process death (threads, one JVM); chaos_manifest.py
has process death without contention (sequential writers). Here W
writer subprocesses run in PARALLEL, each appending B batches; a batch's
first attempt may be killed at a fault point cycled from its global
index. Survivors meanwhile contend for the commit lock — a peer dying
WHILE HOLDING IT forces the stale-holder takeover path under real
concurrency (short lease via POPELINES_LOCK_STALE_SEC so the drill is
wall-clock bounded). Each writer's client loop just re-runs its dead
batch with the same batch id.

Quiesce invariants: every batch present exactly once; heal converges;
no duplicate ids.

Run: python tools/chaos_concurrent.py [writers=3] [batches=2]
Evidence recorded in BASELINE.md §Round 11 (chaos drills).

READERS MODE (round 12, VERDICT r11 next #5): N reader subprocesses
race a GC loop AND a continuing append stream over a multi-thousand-
version SEGMENTED history (POPELINES_SEGMENT_THRESHOLD forced to 1 so
every manifest is segmented; low POPELINES_SEGMENT_TARGET so each
manifest spans many chunks). Appends reuse most chunks each commit
(content-defined boundaries), so the vacuum-lease refresh of reused
chunks races the GC segment sweep continuously, while readers exercise
the per-process chunk cache and the SegmentLossError surface. History
is fabricated through the REAL metadata pipeline (_reserve_version →
_commit_manifest under the commit lock, StaleParentError rebase) with
pyarrow data files, so thousands of versions commit in minutes without
thousands of Spark jobs. Invariants: every reader read is internally
consistent (count == max(batch) * rows-per-batch — a manifest pins its
file list, so a torn read shows as a count/batch mismatch) and NO
reader ever sees SegmentLossError.

Run: python tools/chaos_concurrent.py readers [n_readers=3] [versions=2000]
"""

import os
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 50

CHILD = """
import os, sys
from popelines_spark.session import get_spark
from popelines_spark.manifest import append_manifest_table
wh, b = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name=f"chaosw{b}", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
append_manifest_table(
    spark, wh, "t",
    spark.range(b * %(rows)d, (b + 1) * %(rows)d).selectExpr(
        "id", "%%d AS batch" %% b),
    batch_id=f"batch-{b}",
)
os._exit(0)
""" % {"rows": ROWS}

POINTS = [
    None,
    "after_manifest_write",  # dies HOLDING the commit lock
    "after_data_write",
    "after_flip",
    "after_reserve",
]


READER_CHILD = """
import os, sys, time
from pyspark.sql import functions as F
from popelines_spark.session import get_spark
from popelines_spark.manifest import SegmentLossError, read_manifest_table
wh, rows, dur = sys.argv[1], int(sys.argv[2]), float(sys.argv[3])
spark = get_spark(app_name="chaosreader%d" % os.getpid(), cpus=2,
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
end = time.time() + dur
reads = 0
while time.time() < end:
    try:
        df = read_manifest_table(spark, wh, "t")
        r = df.agg(F.count("*").alias("n"),
                   F.max("batch").alias("mb")).collect()[0]
    except SegmentLossError as exc:
        print("SEGMENT_LOSS", exc, flush=True); os._exit(3)
    except Exception as exc:
        print("READ_FAIL", type(exc).__name__, exc, flush=True); os._exit(4)
    n, mb = r["n"], r["mb"]
    # a manifest pins its file list: whatever tip this read resolved,
    # count must equal max-batch * rows — anything else is a torn read
    if mb is None or n != mb * rows:
        print("TORN_READ n=%s max_batch=%s" % (n, mb), flush=True)
        os._exit(5)
    reads += 1
print("OK", reads, flush=True)
os._exit(0)
"""


def _fast_append(spark, fs, jvm, wh: str, rows: int) -> None:
    """One REAL manifest commit (reserve → rebase → linearized flip)
    whose O(batch) data write is pyarrow instead of a Spark job — the
    metadata pipeline under test is exercised verbatim, thousands of
    times, in minutes."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from popelines_spark.manifest import (
        StaleParentError,
        _commit_manifest,
        _committed_manifest_versions,
        _paths,
        _read_manifest_or_none,
        _release_reservation,
        _reserve_version,
    )

    root, vroot, droot = _paths(wh, "t")
    version = _reserve_version(fs, vroot, jvm)
    try:
        for _ in range(60):
            versions = _committed_manifest_versions(fs, vroot, jvm)
            parent = versions[-1] if versions else None
            prev_files: list[str] = []
            schema_json = _json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": "id", "type": "long",
                         "nullable": True, "metadata": {}},
                        {"name": "batch", "type": "long",
                         "nullable": True, "metadata": {}},
                    ],
                }
            )
            if parent is not None:
                man = _read_manifest_or_none(fs, vroot, parent, jvm)
                if man is None:
                    continue
                prev_files = man["files"]
                schema_json = man["schema"]
            batch = len(prev_files) + 1  # one file per batch by design
            ddir = f"{droot}/v{version}"
            os.makedirs(ddir.replace("file:", ""), exist_ok=True)
            fpath = f"{ddir}/part-00000.parquet"
            pq.write_table(
                pa.table(
                    {
                        "id": list(range((batch - 1) * rows, batch * rows)),
                        "batch": [batch] * rows,
                    }
                ),
                fpath.replace("file:", ""),
            )
            try:
                _commit_manifest(
                    spark, fs, vroot, version,
                    prev_files + [fpath], schema_json, jvm,
                    parent=parent, op="append",
                    own_dir=f"/data/v{version}/",
                )
                return
            except StaleParentError:
                versions = _committed_manifest_versions(fs, vroot, jvm)
                if versions and version <= versions[-1]:
                    _release_reservation(fs, vroot, version, jvm)
                    version = _reserve_version(fs, vroot, jvm)
        raise RuntimeError("fast_append: tip kept moving")
    except Exception:
        _release_reservation(fs, vroot, version, jvm)
        raise


def readers_main() -> int:
    n_readers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_versions = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    rows = 10
    wh = tempfile.mkdtemp(prefix="chaos_readers_")
    os.environ["POPELINES_SEGMENT_THRESHOLD"] = "1"
    os.environ["POPELINES_SEGMENT_TARGET"] = "100"
    t0 = time.time()

    from popelines_spark.io import _hadoop_fs
    from popelines_spark.manifest import _paths, gc_manifest_table
    from popelines_spark.session import get_spark

    spark = get_spark(app_name="chaos_readers", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root, vroot, _ = _paths(wh, "t")
    fs, _, jvm = _hadoop_fs(spark, root)

    # seed enough history that readers never find an empty table
    for _ in range(50):
        _fast_append(spark, fs, jvm, wh, rows)

    # window scales with the requested history depth (appends run
    # ~6-8/s against the GC loop's lock contention)
    dur = max(90.0, n_versions / 6.0)
    env = dict(
        os.environ,
        POPELINES_SEGMENT_THRESHOLD="1",
        POPELINES_SEGMENT_TARGET="100",
    )
    readers = [
        subprocess.Popen(
            [sys.executable, "-c", READER_CHILD, wh, str(rows), str(dur)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
        for _ in range(n_readers)
    ]

    stop = threading.Event()
    gc_stats = {"cycles": 0, "dropped": 0}

    def gc_loop() -> None:
        while not stop.is_set():
            # aggressive retention + tiny vacuum age floor: the sweep
            # actually deletes cold chunks DURING the race, yet reused
            # chunks are lease-refreshed at every commit — the exact
            # contention surface under test
            d, _f = gc_manifest_table(
                spark, wh, "t", keep_versions=5, min_file_age_sec=2.0
            )
            gc_stats["cycles"] += 1
            gc_stats["dropped"] += d
            time.sleep(0.2)

    gct = threading.Thread(target=gc_loop)
    gct.start()

    appended = 50
    deadline = t0 + dur + 30
    while appended < n_versions and time.time() < deadline:
        _fast_append(spark, fs, jvm, wh, rows)
        appended += 1
    stop.set()
    gct.join()

    fails = []
    for i, p in enumerate(readers):
        out, _ = p.communicate(timeout=dur + 120)
        tail = out.decode().strip().splitlines()[-1] if out else ""
        if p.returncode != 0:
            fails.append(f"reader {i} rc={p.returncode}: {tail}")
        else:
            print(f"reader {i}: {tail}")
    ok = not fails
    print(
        f"{'PASS' if ok else 'FAIL'}: {n_readers} readers x {appended} "
        f"segmented versions, {gc_stats['cycles']} GC cycles "
        f"({gc_stats['dropped']} versions dropped), "
        f"{time.time() - t0:.1f}s"
    )
    for f in fails:
        print(" ", f)
    return 0 if ok else 1


def main() -> int:
    writers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    wh = tempfile.mkdtemp(prefix="chaos_concurrent_")
    t0 = time.time()
    deaths = [0]
    fails: list[str] = []
    lock_env = {
        # short leases so takeover of a dead holder happens in seconds
        "POPELINES_LOCK_STALE_SEC": "10",
        "POPELINES_LOCK_TIMEOUT_SEC": "60",
    }

    def writer(w: int) -> None:
        for i in range(batches):
            b = w * batches + i
            point = POINTS[(b * 3 + 1) % len(POINTS)]
            for attempt in range(4):
                env = dict(os.environ, **lock_env)
                env.pop("POPELINES_MANIFEST_CRASH_POINT", None)
                if point and attempt == 0:
                    env["POPELINES_MANIFEST_CRASH_POINT"] = point
                p = subprocess.run(
                    [sys.executable, "-c", CHILD, wh, str(b)],
                    env=env, capture_output=True, timeout=600,
                )
                if p.returncode == 0:
                    break
                if p.returncode == 42:
                    deaths[0] += 1
                else:  # e.g. ConcurrentWriteError while a corpse held
                    # the lock: a real client's retry-after-backoff
                    time.sleep(2)
            else:
                fails.append(f"writer {w} batch {b} never committed: "
                             + p.stderr.decode()[-800:])

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if fails:
        print("FAIL:", *fails, sep="\n  ")
        return 1
    from pyspark.sql import functions as F

    from popelines_spark.manifest import (
        heal_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.session import get_spark

    os.environ.update(lock_env)
    spark = get_spark(app_name="chaos_concurrent_verify", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_batches = writers * batches
    got = read_manifest_table(spark, wh, "t")
    total = got.count()
    per = {
        r["batch"]: r["n"]
        for r in got.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    dup_ids = got.groupBy("id").count().where("count > 1").count()
    healed = heal_manifest_table(spark, wh, "t")
    ok = (
        total == n_batches * ROWS
        and dup_ids == 0
        and healed == 0
        and all(per.get(b) == ROWS for b in range(n_batches))
    )
    print(
        f"{'PASS' if ok else 'FAIL'}: {writers} concurrent writers x "
        f"{batches} batches, {deaths[0]} mid-commit deaths, {total} rows "
        f"exactly-once, heal={healed}, {time.time() - t0:.1f}s"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "readers":
        sys.exit(readers_main())
    sys.exit(main())
