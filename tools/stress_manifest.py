"""N-writer manifest OCC stress — the unit suite's 4-writer races
(tests/test_manifest_tables.py) scaled up and run for many rounds.

Workload: A appender threads each committing R disjoint idempotent
batches (batch_id per batch, so a retried append can never
double-land), one DELETE and one UPDATE over ranges fully present
before the race, and a maintenance thread looping heal → compact → GC →
cleanup_orphan_files the whole time. Replace-commits may lose the
optimistic race repeatedly (ConcurrentWriteError is the documented
client-retry signal); what must NEVER happen is a lost update, a
double-applied DML, a torn append, or a wedged table.

Invariants checked at quiesce:
  rows   = N_BASE − DEL_LIM + A·R·100 (exact)
  k<DEL_LIM gone; DEL_LIM≤k<UPD_LIM all updated; every appended range
  complete (100 rows each, no tears, no duplicates)
  heal_manifest_table == 0 (history convergent)
  cleanup_orphan_files idempotent-zero on the second call
  no reservation markers left behind

Usage: python tools/stress_manifest.py [appenders] [rounds]
Exit 0 = all invariants held.
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_BASE = 1_000
DEL_LIM = 300
UPD_LIM = 600


def main() -> int:
    appenders = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from popelines_spark.manifest import (
        ConcurrentWriteError,
        append_manifest_table,
        cleanup_orphan_files,
        compact_manifest_table,
        gc_manifest_table,
        heal_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.manifest_dml import (
        delete_manifest_rows,
        update_manifest_rows,
    )
    from popelines_spark.session import get_spark

    spark = get_spark(app_name="stress_manifest", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="stress_manifest_")
    t0 = time.time()

    base = spark.range(N_BASE).selectExpr("id AS k", "CAST(1 AS LONG) AS v")
    append_manifest_table(spark, wh, "t", base)

    errs: list[Exception] = []
    done = threading.Event()

    def retrying(fn, attempts=60):
        def run():
            for _ in range(attempts):
                try:
                    fn()
                    return
                except ConcurrentWriteError:
                    continue
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
                    return
            errs.append(RuntimeError("retries exhausted"))

        return run

    def appender(i: int):
        for r in range(rounds):
            lo = 10_000 + i * 10_000 + r * 100
            df = spark.range(lo, lo + 100).selectExpr(
                "id AS k", "CAST(2 AS LONG) AS v"
            )
            for _ in range(60):
                try:
                    append_manifest_table(
                        spark, wh, "t", df, batch_id=f"a{i}r{r}"
                    )
                    break
                except ConcurrentWriteError:
                    continue
            else:
                errs.append(RuntimeError(f"appender {i} round {r} stuck"))
                return

    def maintenance():
        # loops the whole run; every op must tolerate concurrent writers
        while not done.is_set():
            for op in (
                lambda: heal_manifest_table(spark, wh, "t"),
                lambda: compact_manifest_table(spark, wh, "t", n_files=4),
                lambda: gc_manifest_table(spark, wh, "t", keep_versions=3),
                lambda: cleanup_orphan_files(spark, wh, "t"),
            ):
                if done.is_set():
                    return
                try:
                    op()
                except (ConcurrentWriteError, FileNotFoundError):
                    continue
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
                    return

    threads = [
        threading.Thread(target=appender, args=(i,))
        for i in range(appenders)
    ] + [
        threading.Thread(target=retrying(
            lambda: delete_manifest_rows(spark, wh, "t", f"k < {DEL_LIM}"))),
        threading.Thread(target=retrying(
            lambda: update_manifest_rows(
                spark, wh, "t", {"v": "-1"},
                f"k >= {DEL_LIM} AND k < {UPD_LIM}"))),
    ]
    maint = threading.Thread(target=maintenance)
    maint.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    done.set()
    maint.join()
    if errs:
        print(f"FAIL: worker errors: {errs[:3]}")
        return 1

    # quiesce: converge and verify every invariant
    assert heal_manifest_table(spark, wh, "t") == 0, "history not convergent"
    final = read_manifest_table(spark, wh, "t").cache()
    want = N_BASE - DEL_LIM + appenders * rounds * 100
    got = final.count()
    assert got == want, f"row count {got} != {want} (lost/torn/dup)"
    assert final.filter(F.col("k") < DEL_LIM).count() == 0, "delete lost"
    assert (
        final.filter((F.col("k") >= DEL_LIM) & (F.col("k") < UPD_LIM))
        .filter(F.col("v") != -1).count() == 0
    ), "update lost"
    dups = (
        final.groupBy("k").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0, f"{dups} duplicated keys"
    cleanup_orphan_files(spark, wh, "t")
    assert cleanup_orphan_files(spark, wh, "t") == 0, "cleanup not idempotent"
    import glob

    markers = glob.glob(f"{wh}/t/versions/*.__reserved")
    assert not markers, f"leaked reservations: {markers}"
    print(
        f"PASS: {appenders} appenders x {rounds} rounds + DELETE + UPDATE "
        f"+ maintenance loop -> {got} rows, convergent, "
        f"{round(time.time() - t0, 1)}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
