"""Measure the manifest METADATA cost curve — the O(live files) term.

A manifest version lists every live file (plus optional per-file
min/max stats), and every commit rewrites that list. Data cost per
append is O(batch) — this tool measures the metadata term that grows
with TABLE size instead: JSON encode + write + read + parse for
fabricated manifests of N files, N up to the 100-TB design point
(~800k files at the 128 MiB target file size).

Run: python tools/bench_manifest_meta.py
Results recorded in BASELINE.md §Round 11 (manifest metadata).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate(n: int, stats: str) -> dict:
    """``stats``: 'none' | 'perfile' (pre-pool encoding, one dict per
    file) | 'pooled' (the shipped encoding — one dict per BATCH of 200
    files, int references per file; manifest._expand_stats inflates)."""
    files = [
        f"file:/warehouse/t/data/v{1 + i // 200}/part-{i % 200:05d}-"
        f"{i:032x}-c000.snappy.parquet"
        for i in range(n)
    ]
    doc = {
        "version": 7,
        "files": files,
        "schema": json.dumps({"type": "struct", "fields": []}),
        "parent": 6,
        "op": "append",
        "batch_ids": [str(b) for b in range(64)],
    }
    if stats == "perfile":
        doc["file_stats"] = {
            f: {"id": [i * 1000, i * 1000 + 999],
                "ts": ["2026-01-01T00:00:00", "2026-01-01T23:59:59"]}
            for i, f in enumerate(files)
        }
    elif stats == "pooled":
        doc["stats_pool"] = [
            {"id": [b * 1000, b * 1000 + 999],
             "ts": ["2026-01-01T00:00:00", "2026-01-01T23:59:59"]}
            for b in range(max(1, n // 200))
        ]
        doc["stats_idx"] = [i // 200 for i in range(n)]
    return doc


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="manifest_meta_")
    print(f"{'N files':>10} {'stats':>8} {'bytes':>12} {'encode+write':>12}"
          f" {'read+parse':>10}")
    for n in (10_000, 100_000, 800_000):
        for stats in ("none", "perfile", "pooled"):
            doc = fabricate(n, stats)
            path = os.path.join(tmp, f"manifest_{n}_{stats}.json")
            t0 = time.time()
            body = json.dumps(doc).encode()
            with open(path, "wb") as f:
                f.write(body)
                f.flush()
                os.fsync(f.fileno())
            t1 = time.time()
            with open(path, "rb") as f:
                parsed = json.loads(f.read())
            if stats == "pooled":
                from popelines_spark.manifest import _expand_stats

                parsed = _expand_stats(parsed)
            t2 = time.time()
            assert len(parsed["files"]) == n
            print(f"{n:>10} {stats:>8} {len(body):>12,}"
                  f" {t1 - t0:>11.3f}s {t2 - t1:>9.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
