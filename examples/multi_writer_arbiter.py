"""Plugging a store-native commit arbiter into the manifest layout.

The manifest protocol needs exactly ONE primitive from the storage
layer: an atomic "create this object only if it does not exist". On
file:// and hdfs:// the default LockFileArbiter gets it from the
filesystem; a raw object store without conditional create must plug the
store's compare-and-set instead (S3 `If-None-Match: *` PUT, GCS
`ifGenerationMatch=0`). This example runs the whole multi-writer
DML+append lifecycle under the SQLiteCASArbiter — the contract-tested
stand-in whose `_txn` block is exactly where the store's conditional
PUT would go — and verifies the exactly-once invariants hold.

Two selection styles:
  - in-process:    set_commit_arbiter(SQLiteCASArbiter(db))
  - by environment: POPELINES_COMMIT_ARBITER=sqlite:<db>  (inherited by
    subprocess writers — how the chaos drills run every racer under one
    external CAS)

Run:  python examples/multi_writer_arbiter.py [n_writers]
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main() -> int:
    n_writers = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from popelines_spark.arbiters import SQLiteCASArbiter
    from popelines_spark.manifest import (
        append_manifest_table,
        heal_manifest_table,
        read_manifest_table,
        set_commit_arbiter,
    )
    from popelines_spark.manifest_dml import update_manifest_rows
    from popelines_spark.session import get_spark

    spark = get_spark(app_name="multi_writer_arbiter", cpus=4,
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="arbiter_example_")
    wh = os.path.join(tmp, "wh")

    prev = set_commit_arbiter(SQLiteCASArbiter(os.path.join(tmp, "cas.db")))
    try:
        base = spark.range(1000).select(
            F.col("id").alias("k"), F.lit(0).cast("long").alias("hits")
        )
        append_manifest_table(spark, wh, "t", base, batch_id="base")

        errors: list = []

        def writer(w: int) -> None:
            df = spark.range(10_000 + w * 100, 10_000 + w * 100 + 100).select(
                F.col("id").alias("k"), F.lit(0).cast("long").alias("hits")
            )
            for _ in range(8):  # ConcurrentWriteError = documented retry
                try:
                    append_manifest_table(
                        spark, wh, "t", df, batch_id=f"w{w}"
                    )
                    return
                except Exception as exc:
                    if "Concurrent" not in type(exc).__name__:
                        errors.append(exc)
                        return
            errors.append(RuntimeError(f"writer {w} starved"))

        threads = [
            threading.Thread(target=writer, args=(w,))
            for w in range(n_writers)
        ]
        [t.start() for t in threads]
        # a racing copy-on-write UPDATE while appends are in flight
        for _ in range(8):
            try:
                update_manifest_rows(
                    spark, wh, "t", {"hits": "hits + 1"}, "k < 100"
                )
                break
            except Exception as exc:
                if "Concurrent" not in type(exc).__name__:
                    raise
        [t.join() for t in threads]
        assert not errors, errors

        got = read_manifest_table(spark, wh, "t")
        n = got.count()
        assert n == 1000 + n_writers * 100, n
        assert got.where("k < 100 AND hits = 1").count() == 100
        assert heal_manifest_table(spark, wh, "t") == 0
        print(
            f"PASS: {n_writers} racing appenders + 1 CoW UPDATE under "
            f"SQLiteCASArbiter -> {n} rows exactly-once, heal=0"
        )
        return 0
    finally:
        set_commit_arbiter(prev)


if __name__ == "__main__":
    sys.exit(main())
