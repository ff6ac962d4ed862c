"""Scale-up generator for the scale-slope bench (VERDICT r4 #3).

The driver ships deterministic testdata at sf0.001/0.01/0.1 only
(TESTDATA.md) and its generator is not in the repo, so sf1.0 is produced
HERE by key-shifted replication of the driver's sf0.1 tables: every row
set is replicated K times (default 10) with all join/entity keys shifted
by ``replica * KEYSPAN``.  That preserves the properties the slope
measurement needs:

 - per-key fanouts (lines/order, orders/customer, events/user) are
   IDENTICAL to sf0.1, so grouped/windowed work per key is constant and
   total work should scale ~linearly with K;
 - join selectivity is preserved (shifted keys still match across fact
   and dimension replicas); the fixed dims (region/nation) stay fixed,
   exactly like TPC-H scaling;
 - duplicate/near-duplicate DENSITY in ``documents`` stays constant:
   each replica's text is passed through a replica-specific alphabet
   rotation (a Caesar map over [a-zA-Z] via ``F.translate``), which is a
   shingle-set isomorphism — within-replica Jaccard structure is exactly
   preserved while cross-replica shingles are disjoint, so LSH/PPJoin
   candidate pairs scale ~K, not K²;
 - embeddings get a small deterministic per-replica offset so replicas
   are not bit-identical vectors (keeps ANN top-k ties honest) while the
   space's scale is unchanged.

Not a claim of distribution-identity with the driver's true sf1.0 —
this measures how OUR plans' cost scales with row count, which is what
the 100 TB argument needs.

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1]
                                 [--dst .scratch/sf1.0] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import string
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F

#: Key shift per replica — far above any sf0.1 key (max observed ~600k).
KEYSPAN = 1 << 33

#: (table, [key columns to shift]) — dims region/nation stay fixed, like
#: TPC-H, where nation/region cardinality is scale-factor-independent.
SHIFT_KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: Output files per table at k=10 (~6M-row lineitem → a handful of
#: ~16-32 MB files; small tables stay single-file).
OUT_FILES = {"lineitem": 8, "orders": 4, "events": 4, "documents": 2}

_LOWER = string.ascii_lowercase
_UPPER = string.ascii_uppercase


def _rotated_alphabet(r: int) -> tuple[str, str]:
    """Caesar source/target strings for replica ``r`` (r=0 → identity)."""
    s = r % 26
    return (
        _LOWER + _UPPER,
        _LOWER[s:] + _LOWER[:s] + _UPPER[s:] + _UPPER[:s],
    )


def _replicate(df: DataFrame, table: str, k: int) -> DataFrame:
    """K key-shifted copies of ``df`` (replica 0 is the original rows)."""
    if not SHIFT_KEYS[table] and table in ("region", "nation"):
        return df  # fixed dims: cardinality does not scale with sf
    rep = df.withColumn(
        "__r", F.explode(F.array(*[F.lit(i) for i in range(k)]))
    )
    for key in SHIFT_KEYS[table]:
        rep = rep.withColumn(
            key, (F.col(key) + F.col("__r").cast("long") * F.lit(KEYSPAN)).alias(key)
        )
    if table == "documents":
        # Per-replica alphabet rotation: length-preserving shingle-set
        # isomorphism → constant duplicate density (module docstring).
        src, _ = _rotated_alphabet(0)
        branches = None
        for r in range(k):
            _, dst = _rotated_alphabet(r)
            cond = F.col("__r") == r
            expr = F.translate(F.col("text"), src, dst)
            branches = (
                F.when(cond, expr) if branches is None else branches.when(cond, expr)
            )
        rep = rep.withColumn("text", branches)
    if table == "embeddings":
        # Direction-CHANGING per-replica perturbation. A uniform +r*eps
        # shift preserves the vector's direction almost exactly, which
        # makes the 10 replicas of each base vector near-tie in cosine
        # against any query — and near-ties surface spurious cross-engine
        # rank swaps (independent double-sum orders differ in the last
        # ulp). Alternating signs by component index rotates each replica
        # measurably instead.
        rep = rep.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + F.col("__r").cast("float")
                    * F.lit(0.03)
                    * ((i % 2) * 2 - 1).cast("float")
                    * ((i % 5) + 1).cast("float")
                ).cast("float"),
            ),
        )
    if table in ("supplier", "customer"):
        # Replica-unique entity names with cross-replica edit distance >= 2
        # (a doubled replica digit prefix): verbatim name replication gave
        # every name 10 exact copies, exploding edit-distance<=1 entity
        # resolution quadratically — realistic corpora have replica-unique
        # entities. Within-replica pairwise distances are preserved (the
        # prefix is common), so fuzzy-match density scales linearly.
        name_col = "s_name" if table == "supplier" else "c_name"
        rep = rep.withColumn(
            name_col,
            F.when(F.col("__r") == 0, F.col(name_col)).otherwise(
                F.concat(
                    F.col("__r").cast("string"),
                    F.col("__r").cast("string"),
                    F.lit("x"),
                    F.col(name_col),
                )
            ),
        )
    return rep.drop("__r")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(REPO, ".scratch", "sf1.0"))
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from popelines_spark.session import get_spark
    from popelines_spark.tables import load

    spark = get_spark(app_name="popelines_spark_gen_scale")
    os.makedirs(args.dst, exist_ok=True)
    for table in SHIFT_KEYS:
        out = os.path.join(args.dst, f"{table}.parquet")
        df = _replicate(load(spark, args.src, table), table, args.k)
        n = OUT_FILES.get(table, 1)
        (df.repartition(n) if n > 1 else df.coalesce(1)).write.mode(
            "overwrite"
        ).parquet(out)
        print(f"{table}: wrote {args.k}x -> {out}")


if __name__ == "__main__":
    main()
