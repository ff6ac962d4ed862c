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

from popelines_spark.operators.par import spread
from popelines_spark.plans.inspect import audit_side_plan, checkpoint


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
    # r13: the |q|·k dot products per corpus row fuse into the corpus scan
    # stage; spread repairs single-split inputs (operators/par.py).
    queries = queries.withColumn("__qn", norm(F.col(q_vec)))
    corpus = spread(corpus).withColumn("__cn", norm(F.col(c_vec)))
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


#: (salt, n_planes, dim) -> [[component float]]; see _plane_values.
_PLANE_CACHE: dict[tuple[int, int, int], list[list[float]]] = {}


def _plane_values(salt: int, n_planes: int, dim: int) -> list[list[float]]:
    """Materialized hyperplane components, memoized per plane family.

    Component (p, i) = pmod(xxhash64('salt:p:i'), 2e6)/1e6 - 1 — evaluated
    by ONE tiny Spark job over n_planes*dim ROWS (one expression), then
    reused as plain literals. The naive inline form (n_planes*dim xxhash64
    sub-expressions per referencing query) cost ~2-4 s of OPTIMIZER time on
    every query that touched a bucket column — measured 2.5 s vs 0.55 s for
    the identical 2000-row bucket job at sf0.1, bit-identical outputs."""
    key = (salt, n_planes, dim)
    if key not in _PLANE_CACHE:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        rows = (
            spark.createDataFrame(
                [(p, i, f"{salt}:{p}:{i}") for p in range(n_planes)
                 for i in range(dim)],
                "p int, i int, s string",
            )
            .select(
                "p", "i",
                (
                    F.pmod(F.xxhash64("s"), F.lit(2_000_000)).cast("double")
                    / 1_000_000.0
                    - 1.0
                ).alias("c"),
            )
            .collect()
        )
        comp = {(r["p"], r["i"]): r["c"] for r in rows}
        _PLANE_CACHE[key] = [
            [comp[(p, i)] for i in range(dim)] for p in range(n_planes)
        ]
    return _PLANE_CACHE[key]


def hyperplane_bucket(vec, n_planes: int = 12, dim: int = 64, salt: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (sign-bit concatenation).

    Plane p, component i = deterministic pseudo-random in [-1, 1) derived
    from xxhash64(salt:p:i) — identical on every executor (and every
    session: the hash is fixed-seed) with no broadcast state. Components
    enter the plan as plain literals (_plane_values) so the optimizer sees
    a flat array literal, not n_planes*dim hash sub-trees; the dot-product
    fold order matches the original inline form, so bucket ids are
    bit-identical to indexes built before the memoization."""
    planes = _plane_values(salt, n_planes, dim)
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(c)) for c in planes[p]])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit)
    # A vector whose length differs from ``dim`` used to bucket SILENTLY
    # to 0: zip_with null-pads the shorter side, the null propagates
    # through the dot fold, when(null>=0) falls to otherwise(0) for every
    # plane — and the bucketed self-join degenerates to all-pairs inside
    # one giant bucket (review r12). Fail loud per row instead.
    if isinstance(vec, str):
        vec = F.col(vec)
    msg = (
        f"hyperplane_bucket: vector length != dim={dim} — pass the "
        "embedding dimension explicitly (a mismatched vector would "
        "silently land in bucket 0 and collapse the LSH join)"
    )
    return F.when(
        F.assert_true(F.size(vec) == dim, F.lit(msg)).isNull(), bucket
    )


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


class LSHIndex:
    """Handle to an at-rest hyperplane-LSH index (the 100 TB layout the
    knn_lsh docstring promises: corpus pre-bucketed and written PARTITIONED
    BY bucket id, so a probe reads only the query's bucket directory).

    Layout under ``path``:
      - ``buckets/``  corpus rows + ``__bucket``, parquet PARTITIONED BY
                      ``__bucket``;
      - ``meta/``     one row: n_planes/dim/salt plus the corpus id/vec
                      column names, so the index is self-describing on load.
    """

    def __init__(
        self, path: str, id_col: str, vec_col: str,
        n_planes: int, dim: int, salt: int,
    ):
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_planes = n_planes
        self.dim = dim
        self.salt = salt

    @property
    def buckets_path(self) -> str:
        return f"{self.path}/buckets"

    @property
    def meta_path(self) -> str:
        return f"{self.path}/meta"


def build_lsh_index(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    salt: int = 42,
) -> LSHIndex:
    """Build-once entry point (mirrors llm/ivf.py build_ivf_index): stamp
    every corpus vector with its hyperplane bucket and WRITE the corpus
    partitioned by bucket id. Amortized once per corpus version; every probe
    afterwards computes buckets only for the (bounded) query set and reads
    matching bucket directories. Buckets are pseudo-random from fixed
    hashes, so a rebuilt index bit-matches the previous one."""
    index = LSHIndex(path, id_col, vec_col, n_planes, dim, salt)
    audit_side_plan(
        corpus.withColumn(
            "__bucket", hyperplane_bucket(F.col(vec_col), n_planes, dim, salt)
        ),
        "lsh-index-build",
    ).write.mode("overwrite").partitionBy("__bucket").parquet(index.buckets_path)
    corpus.sparkSession.createDataFrame(
        [(id_col, vec_col, n_planes, dim, salt)],
        "id_col string, vec_col string, n_planes int, dim int, salt int",
    ).coalesce(1).write.mode("overwrite").parquet(index.meta_path)
    return index


def load_lsh_index(spark, path: str) -> LSHIndex:
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    index = LSHIndex(
        path, m["id_col"], m["vec_col"],
        int(m["n_planes"]), int(m["dim"]), int(m["salt"]),
    )
    # warm the plane-literal cache now (one tiny job) so the first probe's
    # timed path doesn't pay it — a fresh build warms it as a side effect,
    # and load-vs-build should not change probe latency
    _plane_values(index.salt, index.n_planes, index.dim)
    return index


def probe_lsh_index(
    index: LSHIndex,
    queries: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """Probe the at-rest index: bucket the query set (bounded — the only
    rows that pay the hyperplane math), equi-join on the bucket partition
    column, exact cosine re-rank. Identical output to the on-the-fly
    knn_lsh at the same planes/salt — the index just moves the corpus-side
    bucket computation to build time."""
    spark = queries.sparkSession
    qb = queries.withColumn(
        "__bucket",
        hyperplane_bucket(F.col(q_vec), index.n_planes, index.dim, index.salt),
    )
    cb = spark.read.parquet(index.buckets_path)
    pairs = qb.join(cb, "__bucket").filter(
        F.col(q_id) != F.col(index.id_col)
    )
    scored = pairs.select(
        q_id, index.id_col,
        cosine(F.col(q_vec), F.col(index.vec_col)).alias("cos_sim"),
    )
    w = W.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(index.id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", index.id_col, "cos_sim")
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
    # the bucketed frame feeds both self-join sides — checkpoint so the
    # corpus scan + bucket computation runs once, not twice
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("__bucket"),
    )
    b = checkpoint(b, "lsh-bucketed-self", eager=False)
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


def class_centroids(
    emb: DataFrame, label_col: str, id_col: str, vec_col: str
) -> DataFrame:
    """Per-class mean vector (nearest-class-mean / prototype classifier
    primitive), emitted as (label, pos, mean_val) rows — one per dimension.

    Determinism: per (label, dimension) the float values are folded in
    id order (sort_array of (id, val) structs + HOF aggregate in double),
    so the sum is bit-identical across partitionings, retries, and the
    DuckDB oracle's ``list(... ORDER BY id)`` mirror. At 100 TB-per-class
    cardinalities the ordered fold (which collects per-cell lists) swaps
    for a fixed-shape two-level tree sum or a decimal-quantized plain
    ``sum`` — the row-form output and shuffle profile stay identical.

    Shuffle profile: posexplode (narrow, ×dim) then ONE shuffle keyed on
    (label, pos) — cell count = |classes|·dim, independent of corpus size.
    """
    ex = emb.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col)).alias("pos", "__v"),
        F.col(id_col),
    )
    return (
        ex.groupBy(label_col, "pos")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("__v").alias("v")))
            ).alias("__vs"),
            F.count("*").cast("long").alias("n_vecs"),
        )
        .select(
            label_col,
            F.col("pos").cast("long").alias("pos"),
            "n_vecs",
            F.round(
                F.aggregate(
                    "__vs", F.lit(0.0), lambda a, x: a + x["v"].cast("double")
                )
                / F.col("n_vecs"),
                6,
            ).alias("mean_val"),
        )
    )


def label_margin_fast(
    em: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Fan-out-free prototype-margin screen — the scale path promised by
    the registered `c_label_margin` (queries/ext_analytics6.py).

    The oracle-checked form explodes every vector ×dim and joins the
    centroid long table — exactly mirrorable in SQL, but it ships
    N·dim·K rows through a shuffle. This form follows the
    assign_cells literal-projection pattern (llm/ivf.py): centroids are
    computed in ONE keyed agg, collected (K×dim doubles — the same
    driver-resident ceiling as IVF centroids, documented in
    ARCHITECTURE.md), and embedded as array<struct> literals; each row
    then scores all K prototypes inside a single Project via
    zip_with + aggregate folds — no explode, no join, no per-row
    shuffle. The only exchange left is the final K-row label rollup.

    Results match the registered query to ≤1e-9 (the registered form
    folds 9dp-rounded terms in DECIMAL; this one folds doubles in fixed
    array order — both deterministic, bit-identical per engine, within
    rounding distance of each other; asserted in
    tests/test_statistics_props.py)."""
    import math

    ex = em.select(
        id_col,
        F.col(label_col).alias("own"),
        F.posexplode(vec_col).alias("pos", "x"),
    )
    cent_rows = (
        ex.groupBy("own", "pos")
        .agg((F.sum(F.col("x").cast("double")) / F.count("*")).alias("c"))
        .groupBy("own")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "c"))
            ).alias("cv")
        )
        .collect()
    )
    cents = []
    for r in cent_rows:
        vec = [float(p["c"]) for p in r["cv"]]
        n2c = sum(v * v for v in vec)
        cents.append((int(r["own"]), vec, n2c))

    def dot(vec, cvec_lits):
        return F.aggregate(
            F.zip_with(
                F.col(vec).cast("array<double>"),
                F.array(*[F.lit(c) for c in cvec_lits]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda a, t: a + t,
        )

    n2v = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col(vec_col).cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda a, t: a + t,
    )
    scored = F.array(*[
        F.struct(
            (dot(vec_col, vec) / F.sqrt(F.col("__n2v") * F.lit(n2c))).alias(
                "cs"
            ),
            F.lit(lbl).alias("clabel"),
        )
        for lbl, vec, n2c in cents
    ])
    rows = (
        em.withColumn("__n2v", n2v)
        .withColumn("__scored", scored)
        .select(
            F.col(label_col).alias("own"),
            F.expr(
                "filter(__scored, s -> s.clabel = own)[0].cs"
            ).alias("cs_own"),
            F.expr(
                "array_max(transform(filter(__scored, s -> s.clabel != own),"
                " s -> s.cs))"
            ).alias("cs_other"),
        )
        .select(
            "own", (F.col("cs_own") - F.col("cs_other")).alias("margin")
        )
    )
    return rows.groupBy(F.col("own").cast("long").alias(label_col)).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("margin") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_mislabel_candidates"),
        F.round(F.avg("margin"), 6).alias("avg_margin"),
    )


#: The PUBLIC operator name (VERDICT r7 #6): consumers screening labeled
#: embeddings get the fan-out-free projection form by default — measured
#: 6.4x faster at sf1.0 (BASELINE.md) with results within rounding
#: distance of the oracle-checked explode-join twin, which stays
#: registered as `c_label_margin` for the DuckDB gate (the equivalence
#: itself is gated by `c_label_margin_fast`).
label_margin = label_margin_fast
