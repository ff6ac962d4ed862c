"""Lakehouse lifecycle on popelines_spark manifest tables (round-8 ops).

Walks the full table lifecycle a governed lakehouse runs, on the ACID
manifest layout (popelines_spark/manifest.py, manifest_dml.py,
streaming/changefeed.py):

  1. chunked incremental appends with scan-planning stats
     (exactly-once batch ids);
  2. the table at the SQL surface (register_table(manifest=True));
  3. a downstream consumer tailing the CHANGEFEED stream;
  4. copy-on-write DELETE/UPDATE/MERGE — proving untouched files are
     carried by reference (same bytes on disk);
  5. time travel across the DML commits;
  6. compaction + GC with replay detection surviving both.

Run:  python examples/lakehouse_dml.py [sf_dir] [warehouse_dir]
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def _sha(path: str) -> str:
    p = path[len("file:"):] if path.startswith("file:") else path
    return hashlib.sha256(open(p, "rb").read()).hexdigest()[:12]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="pls_lakehouse_"
    )
    shutil.rmtree(wh, ignore_errors=True)

    from popelines_spark.manifest import (
        append_manifest_table,
        compact_manifest_table,
        gc_manifest_table,
        manifest_file_list,
        read_manifest_table,
    )
    from popelines_spark.manifest_dml import (
        delete_manifest_rows,
        update_manifest_rows,
        upsert_manifest_table,
    )
    from popelines_spark.pipeline import Popeline
    from popelines_spark.session import get_spark
    from popelines_spark.streaming.changefeed import read_changefeed
    from popelines_spark.tables import load

    spark = get_spark(app_name="lakehouse_dml_example", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    p = Popeline(warehouse=wh, spark=spark)

    # 1. land events as 3 stats-stamped incremental appends
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    hi = ev.agg(F.max("event_id")).collect()[0][0]
    step = (hi + 3) // 3
    for i in range(3):
        v = append_manifest_table(
            spark, wh, "ev",
            ev.where(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            stats_cols=["event_id"], batch_id=f"day{i}",
        )
        print(f"append day{i} -> version {v}")
    # replay of day1 is a no-op (exactly-once)
    assert append_manifest_table(
        spark, wh, "ev", ev.limit(0), batch_id="day1"
    ) == 2

    # 2. SQL surface
    p.register_table("ev", manifest=True)
    print("SQL rows:", p.query("SELECT count(*) AS n FROM ev")[0]["n"])

    # 3. changefeed consumer: drain everything committed so far
    ckpt, out = os.path.join(wh, "_ckpt"), os.path.join(wh, "_feed")
    q = (
        read_changefeed(spark, wh, "ev")
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    print("changefeed rows:", spark.read.parquet(out).count())

    # 4. copy-on-write DML: only hit files rewrite
    before = manifest_file_list(spark, wh, "ev")
    spared = manifest_file_list(
        spark, wh, "ev", prune=[("event_id", 0, step - 1)]
    )
    untouched = [f for f in before if f not in spared]
    digests = {f: _sha(f) for f in untouched}
    v_del, n_del = delete_manifest_rows(
        spark, wh, "ev", f"event_id < {step} AND value < 1.0",
        prune=[("event_id", 0, step - 1)],
    )
    v_upd, n_upd = update_manifest_rows(
        spark, wh, "ev", {"value": "value * 1.1"},
        f"event_type = 'purchase' AND event_id < {step}",
        prune=[("event_id", 0, step - 1)],
    )
    upsert_manifest_table(
        spark, wh, "ev",
        spark.createDataFrame(
            [(hi + 1, None, "backfill", 0.0)],
            "event_id long, user_id long, event_type string, value double",
        ),
        keys=["event_id"],
    )
    after = set(manifest_file_list(spark, wh, "ev"))
    assert all(f in after and _sha(f) == digests[f] for f in untouched)
    print(f"deleted {n_del}, updated {n_upd}; "
          f"{len(untouched)} files carried by reference, bytes identical")

    # changefeed picks up only the DML deltas
    q = (
        read_changefeed(spark, wh, "ev")
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable(); q.stop(); q.awaitTermination()

    # 5. time travel: pre-DML version still answers exactly
    p.register_table("ev", manifest=True, version=3)
    print("time-travel rows @v3:",
          p.query("SELECT count(*) AS n FROM ev")[0]["n"])

    # 6. compact + GC; replay detection survives both
    compact_manifest_table(spark, wh, "ev", n_files=2)
    dropped, deleted = gc_manifest_table(spark, wh, "ev", keep_versions=1)
    print(f"gc: dropped {dropped} manifests, deleted {deleted} files")
    n_now = read_manifest_table(spark, wh, "ev").count()
    assert append_manifest_table(
        spark, wh, "ev", ev.limit(5), batch_id="day0"
    )  # no-op: id remembered through compact+GC
    assert read_manifest_table(spark, wh, "ev").count() == n_now
    print("exactly-once replay detection survived compact + GC")
    print(f"warehouse at {wh}")


if __name__ == "__main__":
    main()
