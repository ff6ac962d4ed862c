"""Where does a micro-batch drain spend its time? Phase-instrumented runs
of s_join_interval (1 data batch) and s_join_interval_left (3 batches),
plus shuffle-partition sensitivity of the interval-join state stores."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from popelines_spark.session import get_spark  # noqa: E402
from popelines_spark.streaming import ops, runner  # noqa: E402
from popelines_spark.streaming.runner import (  # noqa: E402
    events_stream,
    run_to_completion,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed_inner(spark, n_shuffle):
    t0 = time.time()
    err = events_stream(spark, SF).filter(
        F.col("event_type") == "error"
    ).select(F.col("event_id").alias("err_id"), "user_id", "ts")
    pur = events_stream(spark, SF).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("event_id").alias("pur_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pur_ts"),
    )
    joined = ops.stream_interval_join(
        err, pur, "user_id", "p_user_id", "ts", "pur_ts", lookback="1 hour"
    )
    t1 = time.time()
    out = run_to_completion(
        joined.select("err_id", "pur_id", "pur_ts"), "append",
        shuffle_partitions=n_shuffle,
    )
    t2 = time.time()
    out.write.mode("overwrite").format("noop").save()
    t3 = time.time()
    print(
        f"  inner p={n_shuffle}: build={t1-t0:.3f} drain={t2-t1:.3f} "
        f"noop={t3-t2:.3f} metrics={runner.LAST_STATE_METRICS}"
    )
    return t2 - t1


def main() -> None:
    spark = get_spark(app_name="exp_stream_anatomy")
    spark.range(1000).count()
    import __spark_entry__ as entry

    qs = entry.queries()
    # warm
    qs["s_join_interval"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite").format("noop").save()
    for rnd in range(2):
        print(f"round {rnd}")
        for p in (8, 4, 2, 1):
            timed_inner(spark, p)
    # left-outer: phase split of the registered query at sf0.1
    for rnd in range(2):
        t0 = time.time()
        df = qs["s_join_interval_left"](spark, SF)
        t1 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.time()
        print(
            f"sjil: build+drain={t1-t0:.3f} noop={t2-t1:.3f} "
            f"metrics={runner.LAST_STATE_METRICS}"
        )


if __name__ == "__main__":
    main()
