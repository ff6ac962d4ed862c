"""Default-threshold activation check: drive a manifest table across
the 4096-file segmentation threshold through the NORMAL append API (no
env overrides) and record per-commit wall time and manifest encodings
on both sides of the crossing.

Run: python tools/bench_segment_activation.py
Evidence recorded in BASELINE.md §Round 11 (segmented manifests).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from popelines_spark.manifest import (
        append_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.session import get_spark

    from popelines_spark.manifest import manifest_file_list

    spark = get_spark(app_name="segment_activation", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    # AQE would coalesce the tiny repartitioned batches well below
    # n_files — this drill is about FILE COUNT, so pin the fan-out
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                   "false")
    wh = tempfile.mkdtemp(prefix="segment_activation_")
    vroot = f"{wh}/t/versions"
    n_files = 700
    rows = []
    rows_per_batch = n_files * 10  # empty partitions write no file
    for b in range(8):
        df = spark.range(
            b * rows_per_batch, (b + 1) * rows_per_batch
        ).selectExpr("id", f"{b} AS batch")
        t0 = time.time()
        v = append_manifest_table(spark, wh, "t", df, n_files=n_files,
                                  stats_cols=["id"])
        dt = time.time() - t0
        raw = json.load(open(f"{vroot}/{v}/manifest.json"))
        enc = "segmented" if "files_segments" in raw else "inline"
        total = len(manifest_file_list(spark, wh, "t"))
        msize = os.path.getsize(f"{vroot}/{v}/manifest.json")
        rows.append((v, total, enc, dt, msize))
        print(f"v{v}: {total} files, {enc}, commit {dt:.2f}s, "
              f"manifest {msize:,} B", flush=True)
    t0 = time.time()
    n = read_manifest_table(spark, wh, "t").count()
    dt_read = time.time() - t0
    ok = (
        n == 8 * rows_per_batch
        and any(enc == "segmented" for _, _, enc, _, _ in rows)
        and all(enc == "inline" for _, tot, enc, _, _ in rows if tot < 4096)
        and all(enc == "segmented" for _, tot, enc, _, _ in rows
                if tot >= 4096)
    )
    print(f"{'PASS' if ok else 'FAIL'}: read {n} rows in {dt_read:.1f}s; "
          "inline below threshold, segmented above")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
