"""Experiment: spread() on the scan-fused heavy operators (guide §2.5).

Interleaved A/B per operator: registered form vs the same form with the
input spread across cores right after the narrow read. Variants patch the
shared helper for the B run and restore it afterwards, so both run in one
session and host noise hits both alike.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from popelines_spark.session import get_spark  # noqa: E402
from popelines_spark.operators.par import spread  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="exp_spread")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    # warm codegen paths once at tiny sf
    for q in ("c_label_margin", "c_bootstrap_ci", "c_knn_cosine",
              "c_dedup_fuzzy", "c_tfidf_topk"):
        qs[q](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()

    import popelines_spark.llm.dedup as D
    import popelines_spark.llm.rank as R

    orig_minhash = D.minhash_signatures
    orig_shingle = D._shingle_hash_rows
    orig_tf = R._term_freqs

    def patched_minhash(df, id_col, text_col, num_hashes=64, shingle_k=3):
        return orig_minhash(spread(df), id_col, text_col, num_hashes, shingle_k)

    def patched_shingle(df, id_col, text_col, shingle_k, carry_cols=None):
        return orig_shingle(spread(df), id_col, text_col, shingle_k, carry_cols)

    def patched_tf(docs, id_col, text_col):
        return orig_tf(spread(docs), id_col, text_col)

    def with_patch(mod, attr, repl, fn):
        def run():
            setattr(mod, attr, repl)
            try:
                return fn()
            finally:
                setattr(mod, attr, {"minhash_signatures": orig_minhash,
                                    "_shingle_hash_rows": orig_shingle,
                                    "_term_freqs": orig_tf}[attr])
        return run

    from popelines_spark.queries.ext_similarity import _queries_and_corpus
    from popelines_spark.llm import similarity as S

    def knn_spread():
        q, c = _queries_and_corpus(spark, SF)
        return S.knn_bruteforce(
            q, spread(c), k=5, c_id="neighbor_id", exclude_self=True
        ).select("q_id", "rank", "neighbor_id")

    variants = {
        "label_margin_A": lambda: qs["c_label_margin"](spark, SF),
        "bootstrap_A": lambda: qs["c_bootstrap_ci"](spark, SF),
        "knn_cosine_A": lambda: qs["c_knn_cosine"](spark, SF),
        "dedup_fuzzy_A": lambda: qs["c_dedup_fuzzy"](spark, SF),
        "dedup_fuzzy_B": with_patch(
            D, "minhash_signatures", patched_minhash,
            lambda: qs["c_dedup_fuzzy"](spark, SF)),
        "knn_cosine_B": knn_spread,
        "tfidf_A": lambda: qs["c_tfidf_topk"](spark, SF),
        "tfidf_B": with_patch(
            R, "_term_freqs", patched_tf,
            lambda: qs["c_tfidf_topk"](spark, SF)),
        "ngram_A": lambda: qs["c_dedup_ngram"](spark, SF),
        "ngram_B": with_patch(
            D, "_shingle_hash_rows", patched_shingle,
            lambda: qs["c_dedup_ngram"](spark, SF)),
    }
    res = run_ab(spark, variants, rounds=3)
    print(summarize(res))


if __name__ == "__main__":
    main()
