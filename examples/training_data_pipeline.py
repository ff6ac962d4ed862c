"""End-to-end training-data curation pipeline on popelines_spark.

Composes the engine's operators the way a 100 TB curation job would:

  profile → language/quality filter → repetition filter → PII redaction →
  exact dedup → MinHash-LSH near-dedup (cluster-collapsed via large-star/
  small-star contraction — O(log n) rounds at any diameter) → benchmark
  decontamination → mixture sampling → sequence packing → partitioned
  parquet sink

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
    from popelines_spark.llm.decontam import decontaminate
    from popelines_spark.llm.dedup import (
        connected_components_star,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from popelines_spark.llm.mix import sample_to_mixture
    from popelines_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality + language gate (pure expressions, pushed to the scan)
    gated = docs.filter(
        F.col("lang").isin("en", "es", "de", "fr")
        & (X.quality_score("text") > 0.5)
        & (X.n_tokens("text") >= 10)
    )

    # 1b. repetition gate (Gopher-style): drop degenerate/boilerplate docs
    # whose top bigram dominates the text
    rep = X.repetition_stats(gated, id_col="doc_id", text_col="text")
    rep_ok = rep.filter(F.col("top_bigram_frac") <= 0.2).select("doc_id")
    gated = gated.join(rep_ok, "doc_id")

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

    # 4. fuzzy dedup: near-dup pairs → connected components → keep the
    # min-id survivor per cluster (chains a-b-c collapse to one doc even
    # when a and c never matched directly). Star contraction converges in
    # O(log n) rounds no matter how long the chains get — the web-scale
    # choice for an unknown dup-graph shape.
    pairs = minhash_lsh_pairs(
        exact_deduped, id_col="doc_id", text_col="text", threshold=0.7
    )
    comp = connected_components_star(
        exact_deduped.select("doc_id"), pairs, id_col="doc_id"
    )
    survivors = comp.filter(F.col("doc_id") == F.col("component")).select("doc_id")
    deduped = exact_deduped.join(survivors, "doc_id")

    # 4b. benchmark decontamination: drop training docs overlapping the
    # eval set (stand-in: every 97th doc plays the benchmark)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    contaminated = decontaminate(
        deduped, bench, id_col="doc_id", text_col="text", min_overlap=2
    ).select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti")

    # 4c. leakage-safe holdout split: assigned per SOURCE (near-dups within
    # a domain can never straddle train/eval), append-stable min-id anchor
    from popelines_spark.llm.split import assign_split

    split = assign_split(clean, group_col="source", id_col="doc_id")
    train = split.filter(F.col("split") == "train").drop("split")

    # 5. mixture sampling: per-language keep-rates, deterministic id-hash
    # (plus a per-language cap as a guard rail)
    mixed = sample_to_mixture(
        train, group_col="lang", id_col="doc_id",
        keep_rates={"en": 1.0, "es": 0.8, "de": 0.6, "fr": 0.5},
    )
    w = W.partitionBy("lang").orderBy("doc_id")
    sampled = (
        mixed.withColumn("__rn", F.row_number().over(w))
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
        "after_decontam": clean.count(),
        "after_split_train": train.count(),
        "after_mix": sampled.count(),
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
