"""Metrics-observability daily close on popelines_spark (round-5 second
batch).

Composes the second-batch operators the way a metrics platform closes its
day — every step a registered, hash-checked engine query doubling as a
library call:

  gap-filled per-user daily revenue (LOCF)            c_gap_fill
  weekly p50/p90 from merged DAILY histogram sketches b_sketch_hist_quantile
  robust per-metric outlier screen (median/MAD)       c_mad_outliers
  Benford first-digit fraud screen                    c_benford
  error blast-radius: purchases within ±1 h           b_join_range

The composition point: the quantile step never rescans raw rows (daily
counter tables merge by addition), the gap-fill grid is generated beside
the data, and the range join is a keyed shuffle — the whole close is
broadcast scalars + keyed exchanges, nothing driver-side.

Run:  python examples/metrics_observability.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def daily_close(spark, sf_dir: str) -> dict:
    from popelines_spark.queries.ext_analytics3 import (
        c_benford,
        c_gap_fill,
        c_mad_outliers,
    )
    from popelines_spark.queries.rel_extra3 import b_join_range
    from popelines_spark.queries.sketches import b_sketch_hist_quantile

    filled = c_gap_fill(spark, sf_dir)
    weekly = b_sketch_hist_quantile(spark, sf_dir)
    outliers = c_mad_outliers(spark, sf_dir)
    benford = c_benford(spark, sf_dir)
    blast = b_join_range(spark, sf_dir)

    synth = filled.filter(F.col("is_filled")).count()
    spread = weekly.agg(
        F.max(F.col("p90_est") - F.col("p50_est")).alias("s")
    ).collect()[0]["s"]
    flagged = outliers.agg(F.sum("n_out").alias("s")).collect()[0]["s"]
    digit_one = {r["digit"]: r["frac"] for r in benford.collect()}["1"]
    isolated_errors = blast.filter(F.col("n_nearby") == 0).count()

    return {
        "grid_rows": filled.count(),
        "synthesized_rows": synth,
        "weeks": weekly.count(),
        "p90_p50_spread_max": round(spread, 4),
        "mad_flagged": flagged,
        "benford_digit1_frac": round(digit_one, 4),
        "errors_total": blast.count(),
        "errors_isolated": isolated_errors,
    }


if __name__ == "__main__":
    from popelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="metrics_observability", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in daily_close(spark, sf_dir).items():
        print(f"{k}: {v}")
