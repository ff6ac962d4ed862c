"""Experiment: cross-cutting micro-batch constants for the replay harness.

Levers, interleaved per query (contention-aware):
  - state shuffle partitions: 8 (current) vs 4 vs 2
  - transient checkpoint dir: Spark temp default (/tmp) vs tmpfs (/dev/shm)

Queries: the stateful replay set that dominates the bench's streaming
family (join_interval, session, tumbling, cdc_latest, custom_state).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from popelines_spark.session import get_spark  # noqa: E402
from popelines_spark.streaming import runner  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = ["s_join_interval", "s_session", "s_tumbling", "s_cdc_latest",
           "s_custom_state"]


def main() -> None:
    spark = get_spark(app_name="exp_stream_constants")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop").save()

    ckpt_conf = "spark.sql.streaming.checkpointLocation"

    def make(q, nparts, shm):
        def run():
            runner.STREAM_SHUFFLE_PARTITIONS = nparts
            if shm:
                os.makedirs("/dev/shm/pls_ckpt", exist_ok=True)
                spark.conf.set(ckpt_conf, "/dev/shm/pls_ckpt")
                spark.conf.set(
                    "spark.sql.streaming.forceDeleteTempCheckpointLocation",
                    "true",
                )
            try:
                return qs[q](spark, SF)
            finally:
                runner.STREAM_SHUFFLE_PARTITIONS = 8
                try:
                    spark.conf.unset(ckpt_conf)
                except Exception:
                    pass
        return run

    variants = {}
    for q in QUERIES:
        variants[f"{q}|p8"] = make(q, 8, False)
        variants[f"{q}|p2"] = make(q, 2, False)
        variants[f"{q}|p8shm"] = make(q, 8, True)
        variants[f"{q}|p2shm"] = make(q, 2, True)
    res = run_ab(spark, variants, rounds=3)
    print(summarize(res))


if __name__ == "__main__":
    main()
