"""Experiment: ngram_jaccard_pairs — checkpoint the duplicated prefix /
sets subtrees WITH explicit broadcast hints.

The plain-checkpoint variant was examined and rejected (comment at
llm/dedup.py:498): the barrier feeds Catalyst the true ~20 MB sizes and
the candidate/verify joins demote from broadcast to shuffle, costing
more than the de-duplicated pipeline saves. This experiment re-tests the
same barrier with F.broadcast() hints pinning the join strategy, so the
only change vs the shipped plan is single-computation of the prefix
pipeline (Exchange->Window->Window->freq-join x2 -> x1) and of the
collect_list sets aggregate (x2 -> x1).

Variants:
  A: shipped ngram_jaccard_pairs
  B: ckpt(prefix)+ckpt(sets) + broadcast hints on the b/sets sides
  C: ckpt(sets) only + broadcast hints (prefix stays duplicated)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from popelines_spark.llm.dedup import _shingle_hash_rows  # noqa: E402
from popelines_spark.plans.inspect import checkpoint  # noqa: E402
from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ngram_variant(df, id_col, text_col, block_cols, shingle_k, threshold,
                  ckpt_prefix=True, ckpt_sets=True):
    block_cols = list(block_cols or [])
    sh_rows = _shingle_hash_rows(
        df, id_col, text_col, shingle_k, carry_cols=block_cols
    )
    sh_rows = checkpoint(sh_rows, "exp-shingle-hashes", eager=False)
    freq = sh_rows.groupBy("__h").agg(F.count("*").alias("__f"))
    wid = W.partitionBy(id_col)
    prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    prefix = (
        sh_rows.join(freq, "__h")
        .withColumn("__n", F.count("*").over(wid))
        .withColumn("__rk", F.row_number().over(wid.orderBy("__f", "__h")))
        .filter(F.col("__rk") <= prefix_len)
    )
    if ckpt_prefix:
        prefix = checkpoint(prefix, "exp-prefix", eager=False)
    a = prefix.select(
        *block_cols, F.col(id_col).alias("id_a"),
        F.col("__n").alias("__na"), F.col("__rk").alias("__rka"), "__h",
    )
    b = prefix.select(
        *block_cols, F.col(id_col).alias("id_b"),
        F.col("__n").alias("__nb"), F.col("__rk").alias("__rkb"), "__h",
    )
    overlap_ub = F.lit(1) + F.least(
        F.col("__na") - F.col("__rka"), F.col("__nb") - F.col("__rkb")
    )
    overlap_req = (
        F.lit(threshold / (1.0 + threshold)) * (F.col("__na") + F.col("__nb"))
    )
    cand = (
        a.join(F.broadcast(b) if ckpt_prefix else b, [*block_cols, "__h"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("__na", "__nb").cast("double")
                >= F.lit(threshold) * F.greatest("__na", "__nb")
            )
            & (overlap_ub.cast("double") >= overlap_req)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = sh_rows.groupBy(id_col).agg(F.collect_list("__h").alias("__sh"))
    if ckpt_sets:
        sets = checkpoint(sets, "exp-sets", eager=False)
    sets_a = sets.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    sets_b = sets.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    if ckpt_sets:
        sets_a, sets_b = F.broadcast(sets_a), F.broadcast(sets_b)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    )
    return (
        cand.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    spark = get_spark(app_name="exp_ngram2")
    import __spark_entry__ as entry

    from popelines_spark.queries.ext_dedup import _corpus

    qs = entry.queries()
    spark.range(1000).count()
    qs["c_dedup_ngram"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite").format("noop").save()

    kw = dict(id_col="doc_id", text_col="text", block_cols=["lang"],
              shingle_k=3, threshold=0.3)

    variants = {
        "ngram_A": lambda: qs["c_dedup_ngram"](spark, SF),
        "ngram_B": lambda: ngram_variant(
            _corpus(spark, SF), ckpt_prefix=True, ckpt_sets=True, **kw),
        "ngram_C": lambda: ngram_variant(
            _corpus(spark, SF), ckpt_prefix=False, ckpt_sets=True, **kw),
    }
    res = run_ab(spark, variants, rounds=4)
    print(summarize(res))

    pa = (qs["c_dedup_ngram"](spark, SF).toPandas()
          .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    for v in ("ngram_B", "ngram_C"):
        pv = (variants[v]().toPandas()
              .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        print(v, "identical:", pa.equals(pv), "rows:", len(pa), len(pv))


if __name__ == "__main__":
    main()
