"""Benchmark decontamination for LLM training corpora.

The standard eval-leak check: flag training documents whose k-token
shingle sets overlap a benchmark/eval set. Shingle membership (not
sequence match) is the usual operating point (cf. the n-gram-overlap
decontamination used by public LM training pipelines).

Scale shape: benchmark sets are small (10^3-10^5 docs) while the corpus is
the 100 TB side — so the benchmark's distinct shingle set is broadcast and
the corpus streams through one explode + broadcast-hash semi-join +
keyed count. No shuffle of corpus text, no state beyond the hash map of
benchmark shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from popelines_spark.llm.text import shingles


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """(id, n_overlap) for corpus docs sharing at least ``min_overlap``
    distinct k-shingles with the union of the benchmark's shingles.
    Callers drop (or audit) the returned ids."""
    bench_sh = F.broadcast(
        benchmark.select(
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_k))
            ).alias("__s")
        ).distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), shingle_k))
        ).alias("__s"),
    )
    return (
        corpus_sh.join(bench_sh, "__s")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
