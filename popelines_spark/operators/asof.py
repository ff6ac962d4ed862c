"""As-of join — latest right row with right_ts <= left_ts per left row.

Reference basis: generalizes the incremental high-water-mark pattern
(popelines/main.py:225-234). Spark has no native as-of join (SURVEY.md §7
hard-part 5); this implements it with stock primitives.

Test-scale plan: equi-join on the key + range predicate, then keep the
newest match per left row via a row_number window partitioned by a synthetic
left-row id.

100 TB scale path (documented, selectable): the equi+range join can fan out
badly when a key has many right rows. Options, in preference order:
 1. ``coarse_bucket`` — additionally equi-join on a coarse time bucket of
    the ts (e.g. day) plus the previous bucket, bounding fan-out to ~2
    buckets of right rows per left row before the window dedup.
 2. ``applyInPandas`` per key-group using ``pandas.merge_asof`` after
    repartitioning both sides by key (right side sorted within group).
Both keep the shuffle keyed on the join key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_LID = "__asof_lid"
_RN = "__asof_rn"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    how: str = "left",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_ts`` satisfying ``right_ts <= left_ts`` (``<`` when
    ``strict``) and key equality. Unmatched left rows keep NULL right
    columns when ``how='left'``; are dropped when ``how='inner'``.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be left|inner, got {how!r}")
    lid = left.withColumn(_LID, F.monotonically_increasing_id())
    ts_pred = (
        (F.col(right_ts) < F.col(left_ts))
        if strict
        else (F.col(right_ts) <= F.col(left_ts))
    )
    cond = (lid[left_on] == right[right_on]) & ts_pred
    joined = lid.join(right, cond, "left" if how == "left" else "inner")
    w = W.partitionBy(_LID).orderBy(F.col(right_ts).desc_nulls_last())
    return (
        joined.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_LID, _RN)
    )
