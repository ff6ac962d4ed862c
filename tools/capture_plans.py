"""Capture .explain("formatted") for bench queries into plans/<round>/
(round dir from $POPELINES_PLANS_ROUND, default r14).

Usage:
    python tools/capture_plans.py before            # all BENCH_QUERIES
    python tools/capture_plans.py after q1,q2,...   # just the named ones

Streaming queries (s_*) drain to a memory sink inside the query callable,
so their returned frame's plan is a trivial memory scan; they are captured
anyway (the artifact records that fact) but the real evidence for them is
the micro-batch metrics in BASELINE.md / OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def formatted_plan(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from popelines_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="popelines_plan_capture")
    qs = entrymod.queries()
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("POPELINES_PLANS_ROUND", "r14")
    )
    os.makedirs(out_dir, exist_ok=True)

    names = only or bench.BENCH_QUERIES
    for name in names:
        fn = bench.BENCH_EXTRA.get(name) or qs[name]
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # capture must not die on one query
            plan = f"ERROR capturing plan: {e!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
