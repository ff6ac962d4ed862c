"""End-to-end training-data curation pipeline on popelines_spark.

Composes the engine's operators the way a 100 TB curation job would:

  profile → language/quality filter → PII redaction → exact dedup →
  MinHash-LSH near-dedup → stratified sampling → sequence packing →
  partitioned parquet sink

Run:  python examples/training_data_pipeline.py [sf_dir] [out_dir]

Every stage is a lazy DataFrame transform; the only actions are the final
writes and the stage-count report. At scale the same script runs unchanged
with the paths pointed at an object store.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def curate(spark, sf_dir: str, out_dir: str, tokens_per_bin: int = 2048):
    from popelines_spark.llm import text as X
    from popelines_spark.llm.dedup import exact_dedup, minhash_lsh_pairs
    from popelines_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality + language gate (pure expressions, pushed to the scan)
    gated = docs.filter(
        F.col("lang").isin("en", "es", "de", "fr")
        & (X.quality_score("text") > 0.5)
        & (X.n_tokens("text") >= 10)
    )

    # 2. PII scrub
    email_re = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    phone_re = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
    scrubbed = gated.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ),
    )

    # 3. exact dedup (deterministic survivor)
    kept_ids = exact_dedup(scrubbed, keys=["text"], id_col="doc_id").select(
        "doc_id"
    )
    exact_deduped = scrubbed.join(kept_ids, "doc_id")

    # 4. fuzzy dedup: drop the higher id of each near-dup pair
    pairs = minhash_lsh_pairs(
        exact_deduped, id_col="doc_id", text_col="text", threshold=0.7
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = exact_deduped.join(losers, "doc_id", "left_anti")

    # 5. stratified cap per language (deterministic)
    w = W.partitionBy("lang").orderBy("doc_id")
    sampled = (
        deduped.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 100_000)
        .drop("__rn")
    )

    # 6. sequence packing into fixed-token bins, per source shard
    sized = sampled.withColumn("n_toks", X.n_tokens("text"))
    wp = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = sized.withColumn(
        "bin_id",
        F.floor(
            F.coalesce(F.sum("n_toks").over(wp), F.lit(0)) / tokens_per_bin
        ).cast("long"),
    )

    # 7. partitioned sink (lang-partitioned; at scale also bucket by bin)
    packed.write.mode("overwrite").partitionBy("lang").parquet(
        os.path.join(out_dir, "curated")
    )
    out = spark.read.parquet(os.path.join(out_dir, "curated"))
    return {
        "input_docs": n0,
        "after_gate": gated.count(),
        "after_exact_dedup": exact_deduped.count(),
        "after_fuzzy_dedup": deduped.count(),
        "curated": out.count(),
        "bins": out.select("source", "bin_id").distinct().count(),
    }


if __name__ == "__main__":
    from popelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/popelines_curated"
    spark = get_spark(app_name="training_data_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    stats = curate(spark, sf_dir, out_dir)
    print({"pipeline": "training_data_curation", **stats})
