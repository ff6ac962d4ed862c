"""Experiment (r13): per-operator-type stream shuffle partitions.

Batch 2 kept POPELINES_STREAM_SHUFFLE_PARTITIONS at a uniform 8 because
2 was "mildly faster for JVM-only operators but 1.3 s slower for
applyInPandasWithState" (s_custom_state is the only Python-stateful
query). This measures the JVM-only side properly: interleaved,
calm-gated, order-alternated, per-variant minima, patching
runner.STREAM_SHUFFLE_PARTITIONS (read at run_to_completion call time).
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
QUERIES = ["s_join_interval", "s_session", "s_cdc_latest", "s_topk_windowed"]


def main() -> None:
    spark = get_spark(app_name="exp_stream_parts2")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()

    def make(q, parts):
        def run():
            runner.STREAM_SHUFFLE_PARTITIONS = parts
            try:
                # streaming drains materialize inside the query fn; the
                # returned frame is the drained memory table
                return qs[q](spark, SF)
            finally:
                runner.STREAM_SHUFFLE_PARTITIONS = 8

        return run

    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()
        res = run_ab(
            spark,
            {f"{q}:p8": make(q, 8), f"{q}:p2": make(q, 2)},
            rounds=3,
        )
        print(summarize(res))


if __name__ == "__main__":
    main()
