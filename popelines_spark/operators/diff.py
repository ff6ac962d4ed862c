"""Snapshot diff — keyed reconciliation of two table versions.

The validation step between pipeline runs ("what changed since
yesterday's load?") and the input to CDC backfills: classify every key as
insert / delete / update by full-outer-joining two snapshots on the key
and comparing the tracked columns.

Scale shape: ONE keyed full-outer join (SMJ/shuffled-hash on the key;
AQE splits skew) plus a per-row classification expression — no windows,
no driver state. At 100 TB both snapshots usually live partitioned or
bucketed by the same key, making the join co-located; comparing a
precomputed row hash (xxhash64 of the tracked columns) instead of N
column equalities keeps the shuffled payload narrow — both spellings are
one line here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Rows that differ between ``old`` and ``new``:
    (key_cols..., status in {'insert','delete','update'}). Unchanged keys
    are dropped. NULL-safe on BOTH sides of the comparison: column structs
    compare via eqNullSafe (a NULL→value transition is an update, not a
    silent equality) and the key join itself is eqNullSafe, so a row whose
    key contains NULL matches its counterpart instead of being reported as
    both an insert and a delete (ADVICE r5)."""
    import functools
    import operator

    o = old.select(
        *key_cols,
        F.struct(*[F.col(c) for c in compare_cols]).alias("__old"),
        F.lit(True).alias("__in_old"),
    ).alias("__dl")
    n = new.select(
        *key_cols,
        F.struct(*[F.col(c) for c in compare_cols]).alias("__new"),
        F.lit(True).alias("__in_new"),
    ).alias("__dr")
    cond = functools.reduce(
        operator.and_,
        [
            F.col(f"__dl.{k}").eqNullSafe(F.col(f"__dr.{k}"))
            for k in key_cols
        ],
    )
    j = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(
            ~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update")
        )
    )
    keys_out = [
        F.coalesce(F.col(f"__dl.{k}"), F.col(f"__dr.{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.select(*keys_out, status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
