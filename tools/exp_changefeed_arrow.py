"""A/B: Arrow RecordBatch emission vs legacy row tuples in the
manifest-changefeed Python DataSource (r13 batch 5, guide §4).

POPELINES_CHANGEFEED_ARROW is read inside the executor-side Python
DataSource worker, which inherits its environment from the JVM at
launch — so the toggle cannot flip mid-session. Each timing therefore
runs in a FRESH subprocess (env set before session creation), variants
interleaved across rounds with the 32-core spin calm-gate between
rounds. The drained table is built ONCE (fixed layout: 8 x 100k-row
commits, legacy 32-files-per-commit layout so both variants read the
same files), so the only difference is the emission path.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from popelines_spark.session import get_spark
from popelines_spark.streaming.changefeed import read_changefeed

spark = get_spark(app_name="exp_changefeed_arrow_child")
spark.range(10).count()
wh = %(wh)r
t0 = time.time()
(
    read_changefeed(spark, wh, "m")
    .writeStream.format("noop")
    .option("checkpointLocation", %(ckpt)r)
    .trigger(availableNow=True)
    .start()
    .awaitTermination()
)
print("DRAIN_SEC", round(time.time() - t0, 3))
"""


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from tools.ab_harness import wait_calm

    wh = tempfile.mkdtemp(prefix="exp_cf_arrow_")
    # Build the fixture table once, in-process.
    from popelines_spark.manifest import append_manifest_table
    from popelines_spark.session import get_spark
    from pyspark.sql import functions as F

    os.environ["POPELINES_WRITE_REBALANCE"] = "0"  # fixed legacy layout
    spark = get_spark(app_name="exp_changefeed_arrow_build")
    for i in range(8):
        batch = spark.range(i * 100_000, (i + 1) * 100_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("long").alias("g"),
            (F.col("id") % 10_000).cast("double").alias("v"),
        )
        append_manifest_table(spark, wh, "m", batch, batch_id=f"b{i}")
    spark.stop()
    os.environ.pop("POPELINES_WRITE_REBALANCE", None)

    out: dict = {"arrow": [], "rows": [], "_spin": []}
    ckpt_n = 0
    for r in range(rounds):
        out["_spin"].append(round(wait_calm(), 2))
        order = [("arrow", "1"), ("rows", "0")]
        if r % 2:
            order.reverse()
        for name, flag in order:
            ckpt_n += 1
            env = dict(
                os.environ,
                POPELINES_CHANGEFEED_ARROW=flag,
            )
            child = CHILD % {
                "repo": REPO,
                "wh": wh,
                "ckpt": f"{wh}/_ckpt{ckpt_n}",
            }
            p = subprocess.run(
                [sys.executable, "-c", child],
                env=env,
                capture_output=True,
                timeout=900,
                text=True,
            )
            secs = None
            for line in p.stdout.splitlines():
                if line.startswith("DRAIN_SEC"):
                    secs = float(line.split()[1])
            if secs is None:
                print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"child {name} r{r} produced no timing")
            out[name].append(secs)
    print(
        json.dumps(
            {
                "arrow_min": min(out["arrow"]),
                "rows_min": min(out["rows"]),
                "arrow": out["arrow"],
                "rows": out["rows"],
                "_spin": out["_spin"],
            }
        )
    )


if __name__ == "__main__":
    main()
