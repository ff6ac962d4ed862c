"""Similarity search over embedding columns (SURVEY.md §2 Part C).

Two paths:
 - brute-force cosine top-k: exact; crossJoin(queries × corpus). Correct
   baseline at any scale where |queries|·|corpus| fits the cluster — at
   100 TB use it only with a bounded query set (broadcast the queries, the
   corpus streams through: one narrow pass, no corpus shuffle).
 - LSH-bucketed (random-hyperplane sign bits): approximate; candidates are
   corpus rows sharing the query's bucket (equi-join on bucket id). The
   hyperplanes are pseudo-random from fixed hashes — deterministic across
   runs/machines, no stored model needed.

Vector math is F.zip_with/F.aggregate — JVM codegen over the array columns,
no Python. PAPERS.md [1]/[3]-style distributed top-k: per-partition heads
then global TakeOrdered via the row_number window on the bounded candidate
set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    exclude_self: bool = True,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k by cosine. Queries are broadcast (bounded set) so the
    corpus is read in one narrow pass — no corpus shuffle; the only wide
    stage is the per-query top-k window over |q|·k candidates."""
    # Precompute norms once per row (not per pair): cuts the per-pair work
    # to one dot product + one multiply.
    queries = queries.withColumn("__qn", norm(F.col(q_vec)))
    corpus = corpus.withColumn("__cn", norm(F.col(c_vec)))
    q = F.broadcast(queries) if broadcast_queries else queries
    pairs = corpus.crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col(q_id) != F.col(c_id))
    scored = pairs.select(
        q_id,
        c_id,
        (dot(F.col(q_vec), F.col(c_vec)) / (F.col("__qn") * F.col("__cn"))).alias(
            "cos_sim"
        ),
    )
    w = W.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "cos_sim")
    )


def hyperplane_bucket(vec, n_planes: int = 12, dim: int = 64, salt: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (sign-bit concatenation).

    Plane p, component i = deterministic pseudo-random in [-1, 1) derived
    from xxhash64(salt:p:i) — identical on every executor with no broadcast
    state."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(
            *[
                (
                    F.pmod(
                        F.xxhash64(F.lit(f"{salt}:{p}:{i}")), F.lit(2_000_000)
                    ).cast("double")
                    / 1_000_000.0
                    - 1.0
                )
                for i in range(dim)
            ]
        )
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket (equi-join on
    bucket), exact cosine re-rank inside the bucket. At 100 TB the corpus is
    pre-bucketed and written partitioned by bucket id, so a query probes one
    partition — this function computes buckets on the fly for parity with
    that design.

    ``n_tables`` is the standard recall lever: each extra hash table draws
    its hyperplanes from a different salt, candidates are the UNION of the
    per-table bucket matches (dedup on (q, c) before the re-rank), and
    recall rises roughly linearly in tables while the probed fraction stays
    n_tables / 2^n_planes. The join stays keyed: (table, bucket) is one
    composite equi-join key, never a cross join."""
    if n_tables == 1:
        qb = queries.withColumn(
            "__bucket", hyperplane_bucket(F.col(q_vec), n_planes, dim)
        )
        cb = corpus.withColumn(
            "__bucket", hyperplane_bucket(F.col(c_vec), n_planes, dim)
        )
        pairs = qb.join(cb, "__bucket").filter(F.col(q_id) != F.col(c_id))
    else:
        # each row fans out once per table, bucketed under that table's own
        # hyperplane family (salt = 42 + t); (table, bucket) is the join key
        def fan(df, vec_col):
            per_table = F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            hyperplane_bucket(
                                F.col(vec_col), n_planes, dim, salt=42 + t
                            ).alias("b"),
                        )
                        for t in range(n_tables)
                    ]
                )
            )
            return df.select("*", per_table.alias("__tb")).select(
                "*",
                F.col("__tb.t").alias("__t"),
                F.col("__tb.b").alias("__bucket"),
            ).drop("__tb")

        pairs = (
            fan(queries, q_vec)
            .join(fan(corpus, c_vec), ["__t", "__bucket"])
            .filter(F.col(q_id) != F.col(c_id))
            .dropDuplicates([q_id, c_id])
        )
    scored = pairs.select(
        q_id, c_id, cosine(F.col(q_vec), F.col(c_vec)).alias("cos_sim")
    )
    w = W.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "cos_sim")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-bucketed
    (near-identical vectors land in the same sign-bit bucket with high
    probability; no cross join)."""
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("__bucket"),
    )
    a = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "__bucket"
    )
    c = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "__bucket"
    )
    return (
        a.join(c, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("va", "vb").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
