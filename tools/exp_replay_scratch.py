"""Experiment: replay stage files on tmpfs vs disk (the stage-file twin
of the checkpoint-to-/dev/shm change, commit fbf57d1).

Variants flip runner.REPLAY_SCRATCH_BASE between /dev/shm and /tmp for
the three multi-stage replay queries.
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

QUERIES = ["s_watermark_late", "s_join_interval_left", "s_dedup_watermarked"]


def main() -> None:
    spark = get_spark(app_name="exp_replay_scratch")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop").save()

    def make(q, base):
        default = runner.REPLAY_SCRATCH_BASE

        def run():
            runner.REPLAY_SCRATCH_BASE = base
            try:
                return qs[q](spark, SF)
            finally:
                runner.REPLAY_SCRATCH_BASE = default
        return run

    variants = {}
    for q in QUERIES:
        variants[f"{q}|disk"] = make(q, "/tmp/popelines_spark_scratch")
        variants[f"{q}|shm"] = make(q, "/dev/shm/popelines_replay_scratch")
    res = run_ab(spark, variants, rounds=3)
    print(summarize(res))


if __name__ == "__main__":
    main()
