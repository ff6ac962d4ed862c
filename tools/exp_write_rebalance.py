"""A/B: REBALANCE-sized default writes (r13 batch 5) vs legacy
carry-input-partitioning, on the bench's own write-path workload
(bench.bench_write_paths — manifest append / CoW UPDATE / snapshot
append / changefeed drain at a fixed 100k-row batch).

The variant toggle is POPELINES_WRITE_REBALANCE (read per call inside
operators/par.py:rebalance_output), so both variants run INTERLEAVED in
one session under the ab_harness calm-gate discipline. Also records the
file-count + metadata-bytes deltas — the 100 TB story is the metadata
slope, not just the local latency.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from popelines_spark.session import get_spark

    import bench
    from tools.ab_harness import wait_calm

    spark = get_spark(app_name="exp_write_rebalance")
    spark.range(1000).count()  # warm

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out: dict = {"rebalance": [], "legacy": [], "_spin": []}
    for r in range(rounds):
        out["_spin"].append(round(wait_calm(), 2))
        order = [("rebalance", "1"), ("legacy", "0")]
        if r % 2:
            order.reverse()
        for name, flag in order:
            os.environ["POPELINES_WRITE_REBALANCE"] = flag
            spark.sparkContext.setJobDescription(f"write_paths {name} r{r}")
            out[name].append(bench.bench_write_paths(spark))
    os.environ.pop("POPELINES_WRITE_REBALANCE", None)

    def best(rows: list[dict], key: str) -> float:
        return min(row[key] for row in rows)

    summary = {
        v: {
            k: best(out[v], k)
            for k in (
                "manifest_append_ms",
                "manifest_update_ms",
                "snapshot_append_ms",
                "changefeed_drain_ms",
            )
        }
        | {"meta_bytes_per_commit": [row["meta_bytes_per_commit"] for row in out[v]]}
        for v in ("rebalance", "legacy")
    }
    summary["_spin"] = out["_spin"]
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
