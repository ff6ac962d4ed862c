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
        doc["stats_idx_rle"] = [[b, 200] for b in range(max(1, n // 200))]
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
    # --- structural sharing: bytes actually WRITTEN per commit --------
    # chunk the parent's sorted list and the parent+batch list with the
    # shipped content-defined boundary; a commit writes only the chunks
    # whose hash the parent did not already persist, plus the manifest
    # doc (segment refs + stats pool/idx).
    import hashlib
    import zlib

    def chunks(paths, target=2048):
        out, cur = [], []
        for p in paths:
            cur.append(p)
            if zlib.crc32(p.encode()) % target == 0:
                out.append(cur)
                cur = []
        if cur:
            out.append(cur)
        return {
            hashlib.sha256(json.dumps(c).encode()).hexdigest()[:32]:
            len(json.dumps(c).encode())
            for c in out
        }

    n = 800_000
    parent = sorted(fabricate(n, "none")["files"])
    batch = sorted(
        f"file:/warehouse/t/data/v9999/part-{i:05d}-x-c000.snappy.parquet"
        for i in range(200)
    )
    child = sorted(parent + batch)
    pc, cc = chunks(parent), chunks(child)
    new = {h: b for h, b in cc.items() if h not in pc}
    refs_bytes = len(json.dumps(list(cc)).encode())
    print(f"\nsharing at N={n:,}, batch=200 new files:")
    print(f"  parent chunks {len(pc):,}; child chunks {len(cc):,}; "
          f"reused {len(cc) - len(new):,}; NEW chunks {len(new)}")
    print(f"  bytes written per commit: {sum(new.values()):,} (new chunks)"
          f" + {refs_bytes:,} (manifest refs) "
          f"vs {sum(pc.values()):,} inline rewrite")
    return 0


if __name__ == "__main__":
    sys.exit(main())
