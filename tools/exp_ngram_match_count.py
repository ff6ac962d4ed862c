"""r14 experiment record (VERDICT r13 next #2): MATCH-COUNT candidate
bound for the PPJoin pipeline — built, proven complete, measured, and
REJECTED. Self-contained: both candidate variants are constructed inline
below (no toggle in the shipped operator — the exp_verify_once.py lesson
from ADVICE r13: an experiment must run the code it claims to compare).

The bound: aggregate the matched prefix rows per pair instead of
distinct()-ing them — m = number of prefix-prefix matches, (ra, rb) =
ranks of the LAST match (both docs' shingle lists are sorted by the one
global (freq, hash) order, so the max rank on both sides is attained by
the same shingle; any common shingle not matched in both prefixes orders
strictly after it). Then overlap <= m + min(|A|-ra, |B|-rb), strictly
tighter than the shipped per-row bound when m > 1, at the same exchange
shape (groupBy on the pair replaces distinct on the pair).

Completeness: tests/test_llm_ops.py::test_ngram_match_count_bound_is_complete
(randomized high-collision corpora, 3 thresholds, vs brute force) — the
harness passed with the bound shipped as default during the experiment.

MEASURED on the sf0.1 corpus (this script reproduces all three numbers):
  - pruning: 0.0% at every threshold — verify-join candidates
    704,708 / 281,120 / 85,859 at t=0.3/0.5/0.7, identical with and
    without the bound;
  - output: bit-identical (exceptAll both ways, 15,711 rows);
  - wall (interleaved minima, calm-gated, 4 rounds): 1.934 s distinct
    vs 1.942 s match-count — identical within noise.

Root cause of the 0%: candidate pairs on real near-dup text always share
a very-early-rank rare shingle, so min(|A|-ra, |B|-rb) alone clears the
overlap requirement; the bound only bites pairs whose first shared rare
shingle sits late in both prefixes. REJECTED — kept as the recorded
ceiling for suffix-filtering-style candidate tightening on this corpus
family (full PPJoin+ suffix probes would add interpreted per-pair HOF
work on top of a candidate set they cannot shrink here).

Usage: python tools/exp_ngram_match_count.py [rounds]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _candidates(spark, sf_dir: str, t: float, variant: str):
    """The PPJoin candidate frame, with the pair-dedup stage built per
    ``variant``: 'distinct' (shipped) or 'matchcount' (the experiment)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    import popelines_spark.llm.dedup as dd
    from popelines_spark.queries.ext_dedup import _corpus

    corpus = _corpus(spark, sf_dir)
    sh_rows = dd._shingle_hash_rows(
        corpus, "doc_id", "text", 3, carry_cols=["lang"]
    )
    sh_rows = dd.checkpoint(sh_rows, f"exp-shingles-{variant}", eager=False)
    freq = sh_rows.groupBy("__h").agg(F.count("*").alias("__f"))
    wid = W.partitionBy("doc_id")
    plen = F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1
    prefix = (
        sh_rows.join(freq, "__h")
        .withColumn("__n", F.count("*").over(wid))
        .withColumn("__rk", F.row_number().over(wid.orderBy("__f", "__h")))
        .filter(F.col("__rk") <= plen)
    )
    a = prefix.select(
        "lang", F.col("doc_id").alias("id_a"),
        F.col("__n").alias("__na"), F.col("__rk").alias("__rka"), "__h",
    )
    b = prefix.select(
        "lang", F.col("doc_id").alias("id_b"),
        F.col("__n").alias("__nb"), F.col("__rk").alias("__rkb"), "__h",
    )
    ub = F.lit(1) + F.least(
        F.col("__na") - F.col("__rka"), F.col("__nb") - F.col("__rkb")
    )
    req = F.lit(t / (1 + t)) * (F.col("__na") + F.col("__nb"))
    matched = a.join(b, ["lang", "__h"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & (
            F.least("__na", "__nb").cast("double")
            >= F.lit(t) * F.greatest("__na", "__nb")
        )
        & (ub.cast("double") >= req)
    )
    if variant == "distinct":
        return matched.select("id_a", "id_b").distinct()
    agg_ub = F.col("__m") + F.least(
        F.col("__na") - F.col("__rka"), F.col("__nb") - F.col("__rkb")
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("__m"),
            F.max("__rka").alias("__rka"),
            F.max("__rkb").alias("__rkb"),
            F.max("__na").alias("__na"),
            F.max("__nb").alias("__nb"),
        )
        .filter(agg_ub.cast("double") >= req)
        .select("id_a", "id_b")
    )


def _full_pipeline(spark, sf_dir: str, variant: str):
    """ngram_jaccard_pairs at t=0.3 with the candidate stage swapped:
    candidates from _candidates + the shipped verify join."""
    from pyspark.sql import functions as F

    import popelines_spark.llm.dedup as dd
    from popelines_spark.queries.ext_dedup import _corpus

    corpus = _corpus(spark, sf_dir)
    sh_rows = dd._shingle_hash_rows(
        corpus, "doc_id", "text", 3, carry_cols=["lang"]
    )
    sh_rows = dd.checkpoint(sh_rows, f"exp-verify-{variant}", eager=False)
    cand = _candidates(spark, sf_dir, 0.3, variant)
    sets = sh_rows.groupBy("doc_id").agg(F.collect_list("__h").alias("__sh"))
    sa = sets.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from popelines_spark.session import get_spark
    from tools.ab_harness import run_ab, summarize

    spark = get_spark(app_name="exp_ngram_match_count")
    spark.range(1000).count()

    # identity gate on full outputs
    old = _full_pipeline(spark, sf_dir, "distinct").cache()
    new = _full_pipeline(spark, sf_dir, "matchcount").cache()
    n_old, n_new = old.count(), new.count()
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print(f"rows old={n_old} new={n_new} exceptAll-diff={diff}")
    assert diff == 0 and n_old == n_new, "variants disagree — DO NOT SHIP"
    old.unpersist(), new.unpersist()

    # candidate counts per threshold
    for t in (0.3, 0.5, 0.7):
        c_old = _candidates(spark, sf_dir, t, "distinct").count()
        c_new = _candidates(spark, sf_dir, t, "matchcount").count()
        print(f"t={t}: candidates distinct={c_old} matchcount={c_new} "
              f"pruned={100 * (1 - c_new / max(c_old, 1)):.1f}%")

    # interleaved wall times of the full pipeline
    res = run_ab(
        spark,
        {
            "distinct": lambda: _full_pipeline(spark, sf_dir, "distinct"),
            "matchcount": lambda: _full_pipeline(spark, sf_dir, "matchcount"),
        },
        rounds=rounds,
    )
    print(summarize(res))


if __name__ == "__main__":
    main()
