"""Experiment (r13 batch 7): single-evaluation set-overlap verify.

The PPJoin verify in ngram_jaccard_pairs / containment_pairs wrote the
similarity as withColumn(...)+filter(...), which the optimizer rewrites
into (a) the verify join's non-equi CONDITION and (b) a second copy in
the output Project. Join-condition codegen performs no subexpression
elimination, so the O(|A|+|B|) array_intersect ran twice per candidate
pair (~704k candidates for c_dedup_ngram at sf0.1; plan evidence in
plans/r13/c_dedup_ngram_after.txt lines 324/327).

Variants (interleaved, calm-gated, order-alternated, per-variant minima):
  once   — POPELINES_VERIFY_SINGLE_EVAL=1 (barrier + scalar rebuild)
  inline — POPELINES_VERIFY_SINGLE_EVAL=0 (the shipped r12 shape)

Identity: before timing, both variants' full outputs are compared
(exceptAll both ways) for c_dedup_ngram and c_containment — the rewrite
claims BIT-IDENTICAL results, not just equal cardinality.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from popelines_spark.session import get_spark  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["c_dedup_ngram", "c_containment"]


def main() -> None:
    spark = get_spark(app_name="exp_verify_once")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()

    # --- identity gate (sf0.01 keeps it quick; full-column compare) ---
    for q in QUERIES:
        outs = {}
        for flag in ("1", "0"):
            os.environ["POPELINES_VERIFY_SINGLE_EVAL"] = flag
            outs[flag] = qs[q](spark, "/root/testdata/sf0.01")
        a, b = outs["1"], outs["0"]
        extra = a.exceptAll(b).count()
        missing = b.exceptAll(a).count()
        print(f"identity {q}: extra={extra} missing={missing}")
        assert extra == 0 and missing == 0, f"{q} results differ!"

    # --- timing ---
    def make(q, flag):
        def run():
            os.environ["POPELINES_VERIFY_SINGLE_EVAL"] = flag
            try:
                return qs[q](spark, SF)
            finally:
                os.environ["POPELINES_VERIFY_SINGLE_EVAL"] = "1"

        return run

    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()
        res = run_ab(
            spark,
            {f"{q}:once": make(q, "1"), f"{q}:inline": make(q, "0")},
            rounds=4,
        )
        print(summarize(res))


if __name__ == "__main__":
    main()
