"""Product-analytics mart on popelines_spark.

Composes the round-4 event-sequence operators the way a 100 TB events
warehouse would build its daily mart:

  multi-grain rollup (hour→day, decimal partials) →
  signup→click→purchase funnel →
  weekly cohort retention →
  z-score anomaly surfacing + PSI drift monitoring →
  z-ordered fact layout (user_id × value-bucket Morton key) so BOTH
  per-user and per-range scans prune files.

Every stage is a keyed shuffle or a broadcast of a tiny stats frame;
nothing collects to the driver (the returned counts are the only
actions, and each is a scalar aggregate).

Run:  python examples/product_analytics.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def build_mart(spark, sf_dir: str, out_dir: str):
    from popelines_spark.operators import eventseq, zorder
    from popelines_spark.tables import load

    ev = load(spark, sf_dir, "events")

    # 1. rollup mart: hour + day grains, one raw scan (checkpointed partials)
    rollup = eventseq.time_rollup(ev, "ts", "value", grains=("hour", "day"))
    rollup.write.mode("overwrite").partitionBy("grain").parquet(
        os.path.join(out_dir, "rollup")
    )

    # 2. activation funnel
    funnel = eventseq.funnel(
        ev, "user_id", "ts", "event_type", ("signup", "click", "purchase")
    )
    funnel_rows = {r.step: r.n_users for r in funnel.collect()}  # 3 rows

    # 3. weekly retention cohorts
    retention = eventseq.retention(ev, "user_id", "ts")
    retention.write.mode("overwrite").parquet(os.path.join(out_dir, "retention"))

    # 4. monitoring: outliers to a review queue, drift terms to a report
    outliers = eventseq.zscore_outliers(ev, "event_type", "value", threshold=2.5)
    drift = eventseq.psi_terms(
        ev, "event_type", "value", split=F.col("event_id") % 2 == 1
    )

    # 5. fact layout: Morton-clustered write — min/max stats prune on both
    # user_id and the value dimension for downstream scans
    fact = ev.withColumn("vbucket", F.floor(F.col("value") / 10).cast("long"))
    zorder.layout_by_zorder(fact, "user_id", "vbucket", n_files=8).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "events_zordered"))

    back = spark.read.parquet(os.path.join(out_dir, "events_zordered"))
    return {
        "events": ev.count(),
        "rollup_rows": spark.read.parquet(os.path.join(out_dir, "rollup")).count(),
        "funnel": funnel_rows,
        "cohort_cells": retention.count(),
        "outliers": outliers.count(),
        "drift_buckets": drift.count(),
        "zordered_events": back.count(),
    }


if __name__ == "__main__":
    from popelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/popelines_mart"
    stats = build_mart(get_spark(), sf_dir, out_dir)
    print(stats)
