"""Experiment: HASH spread (spread_by) for the cheap-per-row fact scans
where round-robin spread measured SLOWER (tools/exp_spread2.py): the
keyless repartition's sort-before-repartition ate the win. spread_by
skips that sort and, when keyed on the column a downstream join /
window / agg needs, lets the exchange be REUSED (guide §2.4).

Keys:
  b_join_bloom        lineitem by l_suppkey  (the join key)
  b_join_star_planned lineitem by l_partkey  (first planned leg key)
  c_triangle_count    lineitem by l_orderkey (the orders-join key)
  c_funnel            events   by user_id    (the funnel window key)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from popelines_spark.operators.par import spread_by  # noqa: E402
from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: query -> (module name, {table: key})
CASES = {
    "b_join_bloom": ("rel_extra3", {"lineitem": "l_suppkey"}),
    "b_join_star_planned": ("rel_extra3", {"lineitem": "l_partkey"}),
    "c_triangle_count": ("ext_graph", {"lineitem": "l_orderkey"}),
    "c_funnel": ("ext_analytics", {"events": "user_id"}),
}


def main() -> None:
    spark = get_spark(app_name="exp_spread3")
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

        def by_T(spark, sf_dir, name):
            df = orig_T(spark, sf_dir, name)
            return spread_by(df, tabs[name]) if name in tabs else df

        def run():
            mod.T = by_T if patched else orig_T
            try:
                return qs[q](spark, SF)
            finally:
                mod.T = orig_T
        return run

    variants = {}
    for q in CASES:
        variants[f"{q}|base"] = make(q, False)
        variants[f"{q}|by"] = make(q, True)
    res = run_ab(spark, variants, rounds=3)
    print(summarize(res))


if __name__ == "__main__":
    main()
