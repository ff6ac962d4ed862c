"""Per-stage profiling of bench queries via the Spark UI REST API.

Runs the named bench queries (default: the big ones) in a session with the
UI enabled, labels each query's jobs with setJobDescription, then dumps
per-job / per-stage wall times and shuffle bytes so the expensive stage of
each query is attributable (guide section 1/7.1 — empirical first).

Usage:
    python tools/profile_bench.py [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT = [
    "c_dedup_ngram",
    "s_join_interval_left",
    "c_dedup_fuzzy",
    "c_label_margin",
    "c_pagerank_nations",
    "s_join_interval",
    "flagship_star_revenue",
    "c_permutation_test",
    "c_triangle_count",
    "c_bootstrap_ci",
]


def get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from popelines_spark.session import _RUNTIME_CONFS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("popelines_profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .config("spark.sql.warehouse.dir", "/tmp/popelines_spark_warehouse")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as entrymod
    import bench

    qs = entrymod.queries()

    # same warmup as bench.py
    spark.range(1000).count()
    from popelines_spark.tables import load

    for t in ("lineitem", "orders", "customer", "documents", "embeddings", "events"):
        load(spark, sf_dir, t).limit(1).count()
    qs["flagship_star_revenue"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    from popelines_spark.queries.ext_similarity import (
        ensure_exact_topk,
        ensure_ivf_index,
        ensure_lsh_index,
    )

    ensure_ivf_index(spark, sf_dir)
    ensure_lsh_index(spark, sf_dir)
    ensure_exact_topk(spark, sf_dir)

    timings = {}
    for name in names:
        fn = bench.BENCH_EXTRA.get(name) or qs[name]
        spark.sparkContext.setJobDescription(f"Q:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        if df.isStreaming:
            df = df.sparkSession.createDataFrame(df.collect())
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4055/api/v1/applications/{app_id}"
    jobs = get(f"{base}/jobs")
    stages = {s["stageId"]: s for s in get(f"{base}/stages?status=complete")}

    per_query: dict[str, list] = {}
    for j in jobs:
        desc = j.get("description") or ""
        if not desc.startswith("Q:"):
            continue
        per_query.setdefault(desc[2:], []).append(j)

    report = {"timings": timings, "queries": {}, "jobs": {}}
    for qname, qjobs in per_query.items():
        # r14: per-job wall times too — iterative queries (pagerank) pay
        # per-JOB scheduling constants that stage rows alone can't show
        report["jobs"][qname] = [
            {
                "job": j["jobId"],
                "submitted": j.get("submissionTime"),
                "completed": j.get("completionTime"),
                "stages": len(j.get("stageIds", [])),
                "tasks": j.get("numTasks"),
            }
            for j in sorted(qjobs, key=lambda x: x["jobId"])
        ]
        rows = []
        for j in sorted(qjobs, key=lambda x: x["jobId"]):
            for sid in j.get("stageIds", []):
                s = stages.get(sid)
                if not s:
                    continue
                dur = None
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    # ISO strings; fall back to executorRunTime
                    pass
                rows.append(
                    {
                        "job": j["jobId"],
                        "stage": sid,
                        "name": s["name"].split("\n")[0][:80],
                        "tasks": s.get("numCompleteTasks"),
                        "exec_run_ms": s.get("executorRunTime"),
                        "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                        "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                        "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
                        "sh_write_mb": round(
                            (s.get("shuffleWriteBytes") or 0) / 1e6, 1
                        ),
                        "fetch_wait_ms": s.get("shuffleFetchWaitTime"),
                    }
                )
        report["queries"][qname] = rows

    out = os.path.join(
        REPO, "plans",
        os.environ.get("POPELINES_PLANS_ROUND", "r14"),
        os.environ.get("POPELINES_PROFILE_NAME", "profile_report.json"),
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(timings, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
