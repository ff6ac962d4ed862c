"""Statistical quality gate on popelines_spark (round-7 statistics
batches).

Composes the round-7 statistics operators the way a data-platform team
runs its weekly "is the data still healthy" review — every step a
registered, hash-checked engine query doubling as a library call:

  per-source distribution drift (exact KS, no bins)   c_ks_source
  categorical independence screen (χ² partials)       c_chi2_independence
  segment spend difference (Mann-Whitney AUC)         c_mannwhitney
  uncertainty on the headline mean (Poisson bootstrap) c_bootstrap_ci
  does BUILDING spend differently (randomization test) c_permutation_test
  concentration review (Lorenz curve + deciles)       c_lorenz_points
  exact frequent values w/o a vocab shuffle           c_heavy_hitters
  trend sanity (robust Theil-Sen slope)               c_theilsen_trend

The composition point: every statistic collapses the corpus to a bounded
frame (length grain / contingency table / value cells / B resample means
/ decile bands / MG candidates / day grain) in its first keyed pass, so
the whole review is one scan-heavy stage per input table plus
broadcast-sized statistics work — and every number is deterministic and
DuckDB-replayable (the CI bounds included, via Lehmer-seeded resample
weights).

Run:  python examples/statistical_quality_gate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def weekly_review(spark, sf_dir: str) -> dict:
    from popelines_spark.queries.ext_analytics6 import (
        c_bootstrap_ci,
        c_chi2_independence,
        c_heavy_hitters,
        c_ks_source,
        c_lorenz_points,
        c_mannwhitney,
        c_permutation_test,
        c_theilsen_trend,
    )

    drift = c_ks_source(spark, sf_dir)
    chi2 = c_chi2_independence(spark, sf_dir)
    mw = c_mannwhitney(spark, sf_dir)
    ci = c_bootstrap_ci(spark, sf_dir)
    lorenz = c_lorenz_points(spark, sf_dir)
    hh = c_heavy_hitters(spark, sf_dir)
    trend = c_theilsen_trend(spark, sf_dir).collect()[0]
    perm = c_permutation_test(spark, sf_dir).collect()[0]

    worst_drift = drift.orderBy(F.col("ks").desc(), "source").first()
    chi2_total = chi2.agg(F.sum("chi2_part").alias("s")).collect()[0]["s"]
    # AUC far from 0.5 = a segment that spends visibly differently
    auc_extreme = mw.select(
        "seg", F.abs(F.col("auc") - 0.5).alias("d")
    ).orderBy(F.col("d").desc(), "seg").first()
    ci_rows = {r["seg"]: (r["ci_lo"], r["ci_hi"]) for r in ci.collect()}
    widest_seg = max(ci_rows, key=lambda s: ci_rows[s][1] - ci_rows[s][0])
    # bottom half's revenue share per segment, from the Lorenz points
    bottom_half = lorenz.where(F.col("decile") == 4).select(
        "seg", "cum_share"
    )
    min_share = bottom_half.agg(F.min("cum_share").alias("m")).collect()[0][
        "m"
    ]

    return {
        "sources_screened": drift.count(),
        "worst_drift_source": worst_drift["source"],
        "worst_drift_ks": round(worst_drift["ks"], 4),
        "chi2_total": round(chi2_total, 2),
        "most_distinct_segment": auc_extreme["seg"],
        "auc_deviation": round(auc_extreme["d"], 4),
        "widest_ci_segment": widest_seg,
        "widest_ci_width": round(
            ci_rows[widest_seg][1] - ci_rows[widest_seg][0], 2
        ),
        "bottom_half_min_share": round(min_share, 4),
        "frequent_terms": hh.count(),
        "theil_slope": trend["theil_slope"],
        "trend_days": trend["n_days"],
        "building_diff": perm["diff_obs"],
        "building_p_two": perm["p_two"],
    }


if __name__ == "__main__":
    from popelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="statistical_quality_gate", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in weekly_review(spark, sf_dir).items():
        print(f"{k}: {v}")
