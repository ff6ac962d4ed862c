"""r14: profile the changefeed drain (the slowest write-path row,
VERDICT r13 next #5) — micro-batch count, per-batch durations, partition
counts, and the driver-side phase breakdown from StreamingQueryProgress.

Usage: python tools/exp_changefeed_profile.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from popelines_spark.session import get_spark
    from popelines_spark.manifest import append_manifest_table
    from popelines_spark.manifest_dml import update_manifest_rows
    from popelines_spark.streaming.changefeed import read_changefeed

    spark = get_spark(app_name="changefeed_profile")
    spark.range(1000).count()

    def batch(lo: int):
        return spark.range(lo, lo + 100_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("long").alias("g"),
            (F.col("id") % 10_000).cast("double").alias("v"),
        )

    wh = tempfile.mkdtemp(prefix="cf_profile_")
    try:
        for i in range(6):
            append_manifest_table(spark, wh, "m", batch(i * 100_000), batch_id=f"b{i}")
        for i in range(3):
            lo = i * 1000
            update_manifest_rows(
                spark, wh, "m", {"v": "v + 1.0"},
                f"k BETWEEN {lo} AND {lo + 999}",
            )

        for run in range(3):
            t0 = time.time()
            q = (
                read_changefeed(spark, wh, "m")
                .writeStream.format("noop")
                .option(
                    "checkpointLocation",
                    os.path.join(wh, f"_feed_ckpt_{run}"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.time() - t0
            prog = [json.loads(p.json) for p in q.recentProgress]
            print(f"run {run}: wall={wall:.2f}s batches={len(prog)}")
            for p in prog:
                d = p.get("durationMs", {})
                src = (p.get("sources") or [{}])[0]
                print(
                    "  batch", p.get("batchId"),
                    "rows", p.get("numInputRows"),
                    "durationMs", {k: d.get(k) for k in sorted(d)},
                )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
