"""IVF (inverted-file) approximate nearest neighbor — pure DataFrame ops.

The scale path for ANN beyond hyperplane LSH (llm/similarity.py): partition
the corpus into n_cells Voronoi cells around learned centroids; a query
probes only the n_probe nearest cells. At 100 TB the corpus is written
partitioned by cell id, so a probe reads n_probe partitions — the classic
IVF-flat layout, expressed entirely in joins/aggregations.

Training is deterministic: centroids initialize from the corpus rows with
the lowest ids (no RNG) and refine with a fixed number of Lloyd iterations;
every step is a broadcast join + groupBy of per-component means. The only
driver-side data is the n_cells × dim centroid table (bounded, small).

Design note: cell assignment is a broadcast JOIN against the centroid
table + per-row top-1 window — NOT a fold of per-centroid CASE expressions
(a when-chain embeds each comparison twice per level, doubling the
expression tree per centroid: measured 44s vs ~4s at 8 cells / 500 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.llm.similarity import cosine

Centroids = list[tuple[int, list[float]]]


def _centroid_df(spark, centroids: Centroids) -> DataFrame:
    return spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "__cell int, __cvec array<double>",
    )


def assign_cells(
    df: DataFrame, vec_col: str, id_col: str, centroids: Centroids
) -> DataFrame:
    """df + __cell = argmax-cosine centroid (broadcast join + top-1)."""
    cents = F.broadcast(_centroid_df(df.sparkSession, centroids))
    scored = df.crossJoin(cents).withColumn(
        "__csim", cosine(F.col(vec_col), F.col("__cvec"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("__csim").desc(), F.col("__cell"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r", "__csim", "__cvec")
    )


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    iterations: int = 2,
    id_col: str | None = None,
) -> Centroids:
    """Deterministic k-means-lite: seed = lowest-id rows, then ``iterations``
    Lloyd steps. Collects only n_cells small vectors per step."""
    order = [F.col(id_col)] if id_col else [F.col(vec_col).cast("string")]
    seed_rows = corpus.orderBy(*order).limit(n_cells).select(vec_col).collect()
    centroids: Centroids = [
        (i, [float(x) for x in r[0]]) for i, r in enumerate(seed_rows)
    ]
    dim = len(centroids[0][1])
    rid = id_col or "__rid"
    base = (
        corpus
        if id_col
        else corpus.withColumn("__rid", F.monotonically_increasing_id())
    )
    for _ in range(iterations):
        assigned = assign_cells(base, vec_col, rid, centroids)
        means = assigned.groupBy("__cell").agg(
            *[
                F.avg(F.element_at(vec_col, i + 1)).alias(f"c{i}")
                for i in range(dim)
            ]
        )
        centroids = sorted(
            (
                (int(r["__cell"]), [float(r[f"c{i}"]) for i in range(dim)])
                for r in means.collect()
            ),
            key=lambda t: t[0],
        )
    return centroids


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    centroids: Centroids,
    n_probe: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Probe the n_probe nearest cells per query; exact cosine re-rank on
    the candidates (equi-join on cell id — candidate count is bounded by
    the probed cells' population, never the corpus)."""
    corpus_cells = assign_cells(corpus, c_vec, c_id, centroids)
    cents = F.broadcast(_centroid_df(queries.sparkSession, centroids))
    probe_scored = queries.crossJoin(cents).withColumn(
        "__csim", cosine(F.col(q_vec), F.col("__cvec"))
    )
    wp = W.partitionBy(q_id).orderBy(F.col("__csim").desc(), F.col("__cell"))
    probe_cells = (
        probe_scored.withColumn("__pr", F.row_number().over(wp))
        .filter(F.col("__pr") <= n_probe)
        .select(q_id, q_vec, "__cell")
    )
    cand = probe_cells.join(corpus_cells, "__cell").filter(
        F.col(q_id) != F.col(c_id)
    )
    scored = cand.select(
        q_id, c_id, cosine(F.col(q_vec), F.col(c_vec)).alias("cos_sim")
    )
    wr = W.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "cos_sim")
    )
