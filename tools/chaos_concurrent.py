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
    sys.exit(main())
