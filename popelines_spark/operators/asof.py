"""As-of join — latest right row with right_ts <= left_ts per left row.

Reference basis: generalizes the incremental high-water-mark pattern
(popelines/main.py:225-234). Spark has no native as-of join (SURVEY.md §7
hard-part 5); this implements it with stock primitives.

Plan — the 100 TB-safe shape (replaces round 1's equi+range join, whose
fan-out was unbounded: a key with 10^5 right rows shuffled 10^5 candidates
PER left row before the window dedup):

  1. union both sides into one relation keyed on (key, ts, side), each row
     carrying its origin as a struct (left payload or right payload);
  2. one hash shuffle on the key, sort within partition by
     (ts, side, tiebreak);
  3. a single running ``last(right_struct, ignorenulls=true)`` window — at
     each left row that is exactly "the most recent right row seen so far";
  4. keep left rows, project both structs flat.

No join node at all (tests/test_plans.py asserts it): every row is shuffled
exactly once, per-key state is O(1) (the running struct), and the frame
UNBOUNDED PRECEDING..CURRENT ROW is evaluated incrementally by Spark's
window exec. Skew bound = total rows of the hottest key (inherent to any
sort-based as-of), never |left_key| x |right_key|.

Determinism: no monotonically_increasing_id (nondeterministic under task
retries — ADVICE r1); ties between right rows at the same (key, ts) are
broken by xxhash64 of the right payload, so retries and partitionings
always pick the same survivor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    how: str = "left",
    strict: bool = False,
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``direction='backward'`` (default): for each left row,
    the right row with the greatest ``right_ts`` satisfying
    ``right_ts <= left_ts`` (``<`` when ``strict``).
    ``direction='forward'``: the SMALLEST ``right_ts`` with
    ``right_ts >= left_ts`` (``>`` when ``strict``) — the traversal simply
    runs in descending ts order, same single-shuffle union+running-last
    plan. Unmatched left rows keep NULL right columns when ``how='left'``;
    are dropped when ``how='inner'``.

    ``tolerance_us`` bounds the lookback (backward) / lookahead (forward):
    a winning candidate further than ``tolerance_us`` microseconds from
    ``left_ts`` is treated as no match (the pandas
    ``merge_asof(tolerance=...)`` semantics). Implemented as a post-window
    predicate on the winning candidate — plan shape unchanged.

    Left and right column names must be disjoint (rename before joining) —
    the output carries both sides flat, like a join would.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be left|inner, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be backward|forward, got {direction!r}"
        )
    overlap = sorted(set(left.columns) & set(right.columns))
    if overlap:
        raise ValueError(f"asof_join: overlapping column names {overlap}")

    l_type = T.StructType(left.schema.fields)
    r_type = T.StructType(right.schema.fields)
    # Sort position of right vs left rows at EQUAL ts decides inclusivity:
    # right before left (0 < 1) -> right row at ts == left_ts matches (<=);
    # right after left (2 > 1) -> it does not (strict <).
    r_side = 2 if strict else 0
    lu = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    # Right rows with NULL key or NULL ts can never match (join-predicate
    # NULL semantics); drop them so the NULL-key window partition stays
    # left-only instead of null-safe-matching.
    ru = (
        right.filter(F.col(right_on).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(right_on).alias("__k"),
            F.col(right_ts).alias("__ts"),
            F.lit(r_side).alias("__side"),
            F.xxhash64(F.struct(*[F.col(c) for c in right.columns])).alias("__tb"),
            F.lit(None).cast(l_type).alias("__l"),
            F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
        )
    )
    # Backward walks ts ascending (running-last = greatest rts <= lts);
    # forward walks ts DESCENDING (running-last = smallest rts >= lts).
    # The __side ordering is unchanged: at equal ts the inclusive right row
    # still sorts before the left row it may match.
    # Forward order must be desc_nulls_first: plain desc puts NULLs LAST, so
    # a left row with NULL ts would sort after every right row in its key
    # partition and the running last() would hand it the earliest right row —
    # a match no SQL predicate (right_ts >= NULL) would ever produce. With
    # NULLS FIRST the NULL-ts left rows see zero right rows (right rows with
    # NULL ts were already filtered), matching backward mode's asc NULLS FIRST.
    ts_order = (
        F.col("__ts") if direction == "backward" else F.col("__ts").desc_nulls_first()
    )
    w = (
        W.partitionBy("__k")
        .orderBy(ts_order, "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        lu.unionByName(ru)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__l").isNotNull())
    )
    if tolerance_us is not None:
        # Null out a winner beyond the bound; the window already guaranteed
        # the correct side of left_ts, so one signed comparison suffices.
        gap = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m")[right_ts])
        if direction == "forward":
            gap = -gap
        within = gap <= F.lit(tolerance_us)
        matched = matched.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & within, F.col("__m"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in right.columns],
    )
