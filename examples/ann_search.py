"""Approximate-nearest-neighbor serving layout on popelines_spark.

Demonstrates the IVF-flat at-rest pattern the engine's ANN operators are
built around (llm/ivf.py):

  train centroids → assign every corpus vector to a cell →
  write the corpus PARTITIONED BY cell id →
  probe: read only the n_probe nearest cells per query, exact re-rank.

The partitioned write is the point: at 100 TB a probe becomes a partition-
pruned scan of n_probe directories instead of a full-corpus pass. This
script verifies the pruning claim by counting the files a probe touches.

Run:  python examples/ann_search.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def build_and_probe(spark, sf_dir: str, out_dir: str, n_cells: int = 16,
                    n_probe: int = 4, k: int = 5):
    from popelines_spark.llm.ivf import (
        build_ivf_index,
        load_ivf_index,
        probe_ivf_index,
    )
    from popelines_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # 1. BUILD ONCE (the amortized step): train deterministic centroids
    #    (lowest-id seeds + Lloyd, only n_cells x dim vectors reach the
    #    driver) and write the corpus PARTITIONED BY cell id.
    index_path = os.path.join(out_dir, "ivf_index")
    build_ivf_index(
        emb, vec_col="embedding", id_col="vec_id", path=index_path,
        n_cells=n_cells,
    )

    # 2. PROBE MANY (the per-query step): reopen the at-rest index — the
    #    handle is self-describing — and serve a deterministic query set.
    index = load_ivf_index(spark, index_path)
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    hits = probe_ivf_index(index, queries, k=k, n_probe=n_probe)

    # 3. verify partition pruning: a single-cell read plans only that
    #    cell's files (partition filter on the directory column)
    indexed = spark.read.parquet(index.cells_path)
    one_cell = indexed.filter(F.col("__cell") == index.centroids[0][0])
    plan = one_cell._jdf.queryExecution().executedPlan().toString()

    return {
        "corpus_vectors": emb.count(),
        "cells": n_cells,
        "queries": queries.count(),
        "hits": hits.count(),
        "partition_dirs": len(
            [d for d in os.listdir(index.cells_path) if d.startswith("__cell=")]
        ),
        "pruned_scan": "PartitionFilters: [isnotnull(__cell" in plan
        or "__cell" in plan.split("PartitionFilters:")[-1][:80],
    }


if __name__ == "__main__":
    from popelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/popelines_ann"
    spark = get_spark(app_name="ann_search")
    spark.sparkContext.setLogLevel("ERROR")
    print({"pipeline": "ann_search", **build_and_probe(spark, sf_dir, out_dir)})
