"""Experiment: minhash verification agreement — interpreted HOF
(zip_with + aggregate) vs a 64-term codegen'd comparison chain.

The signature-agreement count is sum_i [sig_a[i] == sig_b[i]]. The
shipped form expresses it as zip_with(..).aggregate(..) — higher-order
functions run in interpreted expression mode (the same measured trade
minhash_signatures' docstring documents for the shingle transforms).
The chain form is 64 plain element_at equality casts added together —
fully codegen, arithmetic identical (integer adds of the same 0/1
terms).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from functools import reduce  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from popelines_spark.llm.dedup import minhash_signatures  # noqa: E402
from popelines_spark.plans.inspect import checkpoint  # noqa: E402
from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def lsh_pairs_chain(df, id_col, text_col, num_hashes=64, bands=16,
                    shingle_k=3, threshold=0.5):
    r = num_hashes // bands
    sig = checkpoint(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_k),
        "exp-minhash-signatures", eager=False,
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * r + i + 1).cast("string")
                                    for i in range(r)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sig_a = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    cand = cand.join(sig_a, "id_a").join(sig_b, "id_b")
    agree = reduce(
        lambda acc, i: acc
        + (F.element_at("sig_a", i) == F.element_at("sig_b", i)).cast("int"),
        range(1, num_hashes + 1),
        F.lit(0),
    )
    return (
        cand.withColumn(
            "est_jaccard", agree.cast("double") / F.lit(float(num_hashes))
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def main() -> None:
    spark = get_spark(app_name="exp_fuzzy_agree")
    import __spark_entry__ as entry

    from popelines_spark.llm.dedup import minhash_lsh_pairs
    from popelines_spark.queries.ext_dedup import _corpus

    qs = entry.queries()
    spark.range(1000).count()
    qs["c_dedup_fuzzy"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite").format("noop").save()

    kw = dict(id_col="doc_id", text_col="text", num_hashes=64, bands=16,
              threshold=0.4)

    variants = {
        # compare the PAIR PIPELINES head-to-head (the registered query
        # wraps the planted-pair invariant around this)
        "fuzzy_hof": lambda: minhash_lsh_pairs(_corpus(spark, SF), **kw),
        "fuzzy_chain": lambda: lsh_pairs_chain(_corpus(spark, SF), **kw),
        "fuzzy_query": lambda: qs["c_dedup_fuzzy"](spark, SF),
    }
    res = run_ab(spark, variants, rounds=4)
    print(summarize(res))

    pa = (minhash_lsh_pairs(_corpus(spark, SF), **kw).toPandas()
          .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pb = (lsh_pairs_chain(_corpus(spark, SF), **kw).toPandas()
          .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    print("identical:", pa.equals(pb), "rows:", len(pa), len(pb))


if __name__ == "__main__":
    main()
