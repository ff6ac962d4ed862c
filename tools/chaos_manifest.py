"""Chaos drill: writer PROCESSES dying at random fault points, blind
client retries, and the table still converges to exactly-once.

Each logical batch is driven by a subprocess writer that may be killed
(``manifest._crash_point`` → ``os._exit``, SIGKILL semantics) at a
fault point drawn deterministically from the batch number. The parent
plays the real-world client: on writer death it simply RE-RUNS the
batch with the same ``batch_id`` and no fault — the idempotency check
makes a replay of a batch that secretly committed (death after the
flip) a no-op, while a batch that died earlier commits normally. Leaked
commit locks are aged out (the presumed-dead lease) rather than
hand-deleted.

Quiesce invariants:
  - every batch's rows present EXACTLY once (count + per-batch count);
  - heal converges (0 repairs);
  - cleanup with the proven-dead horizon removes crash debris without
    touching live data.

Run: python tools/chaos_manifest.py [n_batches=12]
Evidence recorded in BASELINE.md §Round 11 (chaos drill).
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 100

CHILD = """
import os, sys
from popelines_spark.session import get_spark
from popelines_spark.manifest import append_manifest_table
wh, b = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="chaos_child", cpus=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
append_manifest_table(
    spark, wh, "t",
    spark.range(b * %(rows)d, (b + 1) * %(rows)d).selectExpr(
        "id", "%%d AS batch" %% b),
    batch_id=f"batch-{b}",
    stats_cols=["id"],
)
os._exit(0)
""" % {"rows": ROWS}

# batch number -> fault point (deterministic chaos; None = clean run)
POINTS = [
    None,
    "after_reserve",
    "after_data_write",
    "after_manifest_write",
    "after_flip",
]


def _age_leases(vroot: str) -> None:
    past = time.time() - 7200
    for n in (".__commit_lock", ".__commit_lock_break"):
        p = os.path.join(vroot, n)
        if os.path.exists(p):
            os.utime(p, (past, past))
    for n in os.listdir(vroot) if os.path.isdir(vroot) else []:
        if n.endswith(".__reserved"):
            p = os.path.join(vroot, n)
            os.utime(p, (past, past))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    wh = tempfile.mkdtemp(prefix="chaos_manifest_")
    vroot = f"{wh}/t/versions"
    t0 = time.time()
    deaths = 0
    for b in range(n_batches):
        point = POINTS[(b * 7 + 3) % len(POINTS)]
        for attempt in range(3):
            env = dict(os.environ)
            env.pop("POPELINES_MANIFEST_CRASH_POINT", None)
            inject = point if attempt == 0 else None
            if inject:
                env["POPELINES_MANIFEST_CRASH_POINT"] = inject
            p = subprocess.run(
                [sys.executable, "-c", CHILD, wh, str(b)],
                env=env, capture_output=True, timeout=600,
            )
            if p.returncode == 0:
                break
            if p.returncode != 42:
                print(p.stderr.decode()[-3000:])
                print(f"FAIL: batch {b} died rc={p.returncode}")
                return 1
            deaths += 1
            # the blind client's only remedy: wait out the lease window
            # (simulated by aging) and retry the same batch id
            _age_leases(vroot)
        else:
            print(f"FAIL: batch {b} never committed")
            return 1
    # quiesce: verify exactly-once with an in-process session
    from pyspark.sql import functions as F

    from popelines_spark.manifest import (
        cleanup_orphan_files,
        heal_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.session import get_spark

    spark = get_spark(app_name="chaos_verify", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    got = read_manifest_table(spark, wh, "t")
    total = got.count()
    per = {
        r["batch"]: r["n"]
        for r in got.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    dup_ids = got.groupBy("id").count().where("count > 1").count()
    healed = heal_manifest_table(spark, wh, "t")
    _age_leases(vroot)
    removed = cleanup_orphan_files(
        spark, wh, "t",
        reservation_timeout_sec=3600, abandoned_reclaim_sec=3600,
    )
    after = read_manifest_table(spark, wh, "t").count()
    ok = (
        total == n_batches * ROWS
        and after == total
        and dup_ids == 0
        and healed == 0
        and all(per.get(b) == ROWS for b in range(n_batches))
    )
    status = "PASS" if ok else "FAIL"
    print(
        f"{status}: {n_batches} batches, {deaths} writer deaths, "
        f"{total} rows exactly-once, heal=0, cleanup removed {removed} "
        f"debris files, {time.time() - t0:.1f}s"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
