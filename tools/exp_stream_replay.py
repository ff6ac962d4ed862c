"""Experiment: did the r13 replay-writer consolidation regress the
sentinel-replay streaming queries?

A/B (interleaved, contention-aware): current write_replay_stages (one
union + dynamic-partition job) vs the legacy 3x coalesce(1) writer, on
s_join_interval_left and s_watermark_late. Plus conf sensitivity of
s_custom_state (default vs the r13 session confs) since it drifted in
the contended bench runs.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def legacy_write_replay_stages(spark, scratch, stages):
    shutil.rmtree(scratch, ignore_errors=True)
    for i, df in enumerate(stages):
        tmp = os.path.join(scratch, f"_stage{i}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(scratch, f"{i}.parquet")
        os.rename(part, dest)
        shutil.rmtree(tmp)
        os.utime(dest, (1600000000 + i * 10,) * 2)


CONFS = {
    "r13": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
            "spark.sql.join.preferSortMergeJoin": "false"},
    "default": {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
                "spark.sql.join.preferSortMergeJoin": "true"},
}


def main() -> None:
    spark = get_spark(app_name="exp_stream_replay")
    import __spark_entry__ as entry
    from popelines_spark.streaming import runner

    qs = entry.queries()
    new_writer = runner.write_replay_stages
    spark.range(1000).count()
    # warm both code paths once at sf0.001
    for q in ("s_join_interval_left", "s_watermark_late", "s_custom_state"):
        qs[q](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop").save()

    def make(q, writer, cname="r13"):
        def run():
            runner.write_replay_stages = writer
            for k, v in CONFS[cname].items():
                spark.conf.set(k, v)
            try:
                return qs[q](spark, SF)
            finally:
                runner.write_replay_stages = new_writer
        return run

    variants = {
        "sjil|new": make("s_join_interval_left", new_writer),
        "sjil|legacy": make("s_join_interval_left", legacy_write_replay_stages),
        "swl|new": make("s_watermark_late", new_writer),
        "swl|legacy": make("s_watermark_late", legacy_write_replay_stages),
        "scs|r13confs": make("s_custom_state", new_writer, "r13"),
        "scs|default": make("s_custom_state", new_writer, "default"),
        "sji|plain": make("s_join_interval", new_writer),
    }
    res = run_ab(spark, variants, rounds=3)
    print(summarize(res))


if __name__ == "__main__":
    main()
