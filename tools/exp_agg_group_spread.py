"""Experiment: is batch 3's spread_by(l_orderkey) still a win for
b_agg_group on a CALM host?

Motivation: the round's final calm-window bench (inflation 0.95) read
b_agg_group at 1.14 s — 1.4x its re-recorded baseline and 1.18x its r12
time — while every other query improved. Unlike flagship_star_revenue
(whose countDistinct key IS l_orderkey, so the spread's exchange
co-locates the distinct and is reused), b_agg_group aggregates by
(l_returnflag, l_linestatus): the spread shuffles EVERY projected
lineitem column just to widen the scan-fused partial agg from 3 tasks
to 32 — the exchange buys parallelism only, nothing downstream reuses
it.

Variants (interleaved, calm-gated, per-variant minima):
  spread   — code as shipped (spread_by(lineitem, l_orderkey))
  plain    — spread_by patched to identity (the pre-batch-3 shape)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from popelines_spark.operators import par  # noqa: E402
from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="exp_agg_group_spread")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    qs["b_agg_group"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()

    real_spread_by = par.spread_by

    def make(patched: bool):
        def run():
            par.spread_by = real_spread_by if patched else (
                lambda df, *k, **kw: df
            )
            try:
                return qs["b_agg_group"](spark, SF)
            finally:
                par.spread_by = real_spread_by

        return run

    res = run_ab(
        spark,
        {"spread": make(True), "plain": make(False)},
        rounds=4,
    )
    print(summarize(res))


if __name__ == "__main__":
    main()
