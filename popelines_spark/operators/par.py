"""Scan-parallelism repair: spread unsplittable inputs across the cores.

The optimization guide's input-skew rule (§2.5 last bullet: "one huge
unsplittable file … repartition immediately after the read") hits this
engine's local shape exactly: the testdata parquet files are written as a
SINGLE row group each, and Spark cannot split a parquet file below row-group
granularity, so every scan stage — and everything whole-stage-codegen fuses
into it (shingle explodes, MinHash partial aggregates, Monte-Carlo
fan-outs, decimal dot products) — runs on ONE core regardless of
`local[32]`. Measured before/after in OPTIMIZATION_r13.md: the fused
compute was the dominant stage of c_label_margin, c_dedup_fuzzy,
c_bootstrap_ci, c_permutation_test and the kNN family.

``spread`` is scale-adaptive, not a local constant: the target is the
session's default parallelism (executor cores on a cluster, N of
``local[N]`` here) and it is a NO-OP whenever the plan already yields at
least that many partitions — i.e. on any real multi-file table at cluster
scale it does nothing, while a pathological single-giant-file input gets
the same repair there too. The exchange it inserts is round-robin
(deterministic: Spark sorts before round-robin repartition since
SPARK-23207), carries only the operator's projected columns, and every
call site feeds keyed aggregations / joins whose results are
partitioning-insensitive (exact decimal sums, keyed windows) — results are
bit-identical, which tools/parity.py re-proves per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition to ``factor``x the session's default
    parallelism — but only when the frame's physical plan produces fewer
    partitions than that (unsplittable/few-file scans); otherwise the
    frame is returned unchanged (no exchange added at cluster scale).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        # defensive: planning for inspection failed (e.g. unresolved
        # plan quirk) — fall back to not touching the frame
        return df
    return df if n >= target else df.repartition(target)


def spread_by(df: DataFrame, *keys, factor: int = 1) -> DataFrame:
    """``spread`` with HASH partitioning on ``keys`` instead of
    round-robin. Round-robin repartition first pays a full local sort of
    its input (spark.sql.execution.sortBeforeRepartition, required so
    retried tasks reproduce the row→partition assignment); hash
    partitioning is deterministic by construction and skips that sort —
    measured 2.3x on a 600k-row fact spread whose per-row downstream
    work is cheap (OPTIMIZATION_r13.md flagship_star_revenue). Prefer
    this whenever the frame has a high-cardinality key; bonus: a partial
    aggregate keyed by (or prefixed by) ``keys`` dedups perfectly within
    each partition before the next exchange. Same no-op contract as
    ``spread``: untouched when the scan already fills the cores."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df if n >= target else df.repartition(target, *keys)
