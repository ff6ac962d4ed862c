"""Experiment: scan-parallelism repair (spread) for the remaining
single-row-group fact scans — flagship_star_revenue, b_agg_group,
b_join_bloom, b_join_star_planned, c_triangle_count, c_pit_join,
c_funnel, c_skew_sessionize.

Variant mechanism: per-module monkeypatch of the table loader T so the
named fact tables come back spread() across the default parallelism;
everything else identical. Interleaved rounds, minima reported.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from popelines_spark.operators.par import spread  # noqa: E402
from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: query -> (module name, fact tables to spread)
CASES = {
    "flagship_star_revenue": ("rel_joins", {"lineitem"}),
    "b_agg_group": ("rel_agg", {"lineitem"}),
    "b_join_bloom": ("rel_extra3", {"lineitem"}),
    "b_join_star_planned": ("rel_extra3", {"lineitem"}),
    "c_triangle_count": ("ext_graph", {"lineitem"}),
    "c_pit_join": ("ext_analytics2", {"lineitem"}),
    "c_funnel": ("ext_analytics", {"events"}),
    "c_skew_sessionize": ("ext_analytics2", {"events"}),
}


def main() -> None:
    spark = get_spark(app_name="exp_spread2")
    import importlib

    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    for q in CASES:
        qs[q](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop").save()

    def make(q, patched):
        modname, tabs = CASES[q]
        mod = importlib.import_module(f"popelines_spark.queries.{modname}")
        orig_T = mod.T

        def spread_T(spark, sf_dir, name):
            df = orig_T(spark, sf_dir, name)
            return spread(df) if name in tabs else df

        def run():
            mod.T = spread_T if patched else orig_T
            try:
                return qs[q](spark, SF)
            finally:
                mod.T = orig_T
        return run

    variants = {}
    for q in CASES:
        variants[f"{q}|base"] = make(q, False)
        variants[f"{q}|spread"] = make(q, True)
    res = run_ab(spark, variants, rounds=3)
    print(summarize(res))


if __name__ == "__main__":
    main()
