"""SURVEY.md §2 Part C — similarity search over `embeddings`.

Brute-force cosine top-k (exact, oracle-checked on neighbor ranks) and the
LSH-bucketed approximate variant (rows-only — bucket membership is
algorithm-specific). Implementations: popelines_spark/llm/similarity.py.

Rank output only (no raw cosine column) in the hash-checked query: DuckDB's
list_cosine_similarity and Spark's fold can differ in the last float ulp;
ranks are stable because random 64-dim vectors have well-separated
similarities.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.llm import similarity as S
from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "c_knn_cosine",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
               FROM embeddings WHERE vec_id % 50 = 0)
    SELECT q_id, CAST(rn AS BIGINT) AS rank, neighbor_id
    FROM (SELECT q_id, e.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY list_cosine_similarity(q_vec, e.embedding) DESC,
                            e.vec_id) AS rn
          FROM q, embeddings e
          WHERE e.vec_id <> q_id)
    WHERE rn <= 5
    """,
)
def c_knn_cosine(spark, sf_dir):
    """Exact brute-force cosine top-5 for every 50th vector. Queries are
    broadcast; the corpus streams through in one narrow pass (the 100 TB
    plan for bounded query sets)."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    out = S.knn_bruteforce(
        queries, corpus, k=5, c_id="neighbor_id", exclude_self=True
    )
    return out.select("q_id", "rank", "neighbor_id")


@query("c_knn_lsh")  # rows-only: approximate (bucketed candidates)
def c_knn_lsh(spark, sf_dir):
    """Approximate top-5 via random-hyperplane LSH buckets (4 planes →
    16 buckets ≈ 30 candidates each at sf0.01; candidates share the query's
    bucket). The 100 TB path: corpus pre-partitioned by bucket id, a query
    probes one partition; more planes as the corpus grows."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    out = S.knn_lsh(
        queries, corpus, k=5, c_id="neighbor_id", n_planes=4, dim=64
    )
    return out.select(
        "q_id", "rank", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim")
    )


@query("c_knn_ivf")  # rows-only: approximate (probed cells)
def c_knn_ivf(spark, sf_dir):
    """IVF-flat ANN: deterministic centroid training (lowest-id seeds + 2
    Lloyd iterations, pure DataFrame), corpus partitioned into 8 cells, each
    query probes its 2 nearest cells with exact re-rank. The 100 TB layout
    writes the corpus partitioned by cell id so probes read n_probe
    partitions."""
    from popelines_spark.llm.ivf import knn_ivf, train_centroids

    emb = T(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = train_centroids(
        corpus, "c_vec", n_cells=8, iterations=2, id_col="neighbor_id"
    )
    out = knn_ivf(
        queries, corpus, k=5, centroids=cents, n_probe=2, c_id="neighbor_id"
    )
    return out.select(
        "q_id", "rank", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim")
    )
