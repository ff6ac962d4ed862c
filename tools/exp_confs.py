"""Experiment: session-conf candidates, interleaved per query.

 - AQE coalescePartitions.minPartitionSize: 1m (default) vs 64k — the
   post-shuffle stages of CPU-dense small-byte plans were coalesced to
   ~10 tasks on 32 cores (bytes are a bad proxy for compute when rows
   carry arrays the codegen loops over).
 - preferSortMergeJoin true (default) vs false (guide §9/§3.1).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = ["c_dedup_ngram", "c_triangle_count", "flagship_star_revenue",
           "c_containment", "c_heavy_hitters", "c_pit_join"]

CONFS = {
    "default": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
                "spark.sql.join.preferSortMergeJoin": "true"},
    "mps64k": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
               "spark.sql.join.preferSortMergeJoin": "true"},
    "shj": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
            "spark.sql.join.preferSortMergeJoin": "false"},
    "both": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
             "spark.sql.join.preferSortMergeJoin": "false"},
}


def main() -> None:
    spark = get_spark(app_name="exp_confs")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()

    def make(q, cname):
        def run():
            for k, v in CONFS[cname].items():
                spark.conf.set(k, v)
            try:
                return qs[q](spark, SF)
            finally:
                pass  # confs reset by the next variant
        return run

    variants = {}
    for q in QUERIES:
        for cname in CONFS:
            variants[f"{q}|{cname}"] = make(q, cname)
    res = run_ab(spark, variants, rounds=3)
    print(summarize(res))


if __name__ == "__main__":
    main()
