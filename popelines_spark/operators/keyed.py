"""Keyed survivor selection — the one "keep the first n rows per key by
order" implementation shared by exact dedup (llm/dedup.py), MERGE-upsert
source pre-dedup (operators/upsert.py) and top-k-per-group
(queries/rel_sort_setops.py), per VERDICT r1 #6.

Reference basis: generalizes find_last_entry's latest-row-per-key idiom
(popelines/main.py:225-234).

Scale: one hash shuffle on ``keys``; the row_number prune happens inside
the window partition (no second pass), and the rank filter drops rows
before anything downstream shuffles again. Deterministic iff ``order`` is
a total order within each key group — callers pass a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_RN = "__keep_first_rn"


def keep_first(
    df: DataFrame,
    keys: list[str | Column],
    order: list[str | Column],
    n: int = 1,
) -> DataFrame:
    """Keep the first ``n`` rows of each ``keys`` group under ``order``.
    All input columns survive (no projection)."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= n)
        .drop(_RN)
    )
