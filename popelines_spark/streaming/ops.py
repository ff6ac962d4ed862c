"""Streaming operators (SURVEY.md §2 B.9) as composable functions.

Each takes the streaming events DataFrame and returns the transformed
streaming DataFrame; the runner drains it for tests, production attaches a
real sink. Watermarks bound state at scale: every grouped operator here
carries one so state stores don't grow unboundedly on a 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from popelines_spark.queries._util import DEC


def _default_watermark(span: str, floor: str = "1 hour") -> str:
    """Default watermark = max(window span, the legacy 1-hour floor):
    a watermark NARROWER than the window finalized windows before they
    closed and dropped in-window late data (review r12), while narrowing
    the floor below 1 hour would silently change the lateness tolerance
    existing callers were proven against."""
    import pandas as pd

    return span if pd.Timedelta(span) > pd.Timedelta(floor) else floor


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Tumbling-window count+sum (the chunked fixed windows of
    popelines/main.py:214-217, as a stream). ``watermark`` defaults to
    max(width, 1 hour) — a fixed 1-hour watermark under a wider window
    dropped in-window late data, the exact bug windowed_type_counts was
    fixed for (review r12)."""
    return (
        events.withWatermark("ts", watermark or _default_watermark(width))
        .groupBy(F.window("ts", width).alias("win"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """``watermark`` defaults to max(width, 1 hour) (see tumbling_counts)."""
    return (
        events.withWatermark("ts", watermark or _default_watermark(width))
        .groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-user session windows (gap-merged). ``watermark`` defaults to
    max(gap, 1 hour) — an event later than the watermark but inside an
    open session must still merge (review r12)."""
    return (
        events.withWatermark("ts", watermark or _default_watermark(gap))
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id", F.col("win.start").alias("session_start"), "n_events"
        )
    )


def windowed_type_counts(
    events: DataFrame, width: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Per-(tumbling window, event_type) counts — the streaming half of a
    windowed top-k: the stream maintains the grouped counts (state = one
    row per live (window, type), bounded by the watermark); ranking runs
    as a batch window over the drained/served table, where the per-window
    group is tiny. Streaming can't rank over its own running aggregate
    (no windowed rank over an updating sink) — splitting agg(stream) from
    rank(serve) is the standard production shape.

    ``watermark`` defaults to max(width, 1 hour) so append/update-mode
    windows are never finalized before they close (a fixed 1-hour
    watermark under a wider window would drop in-window late data —
    ADVICE r5; floor-maxed round 12 in step with the other grouped ops)."""
    return (
        events.withWatermark("ts", watermark or _default_watermark(width))
        .groupBy(F.window("ts", width).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def stream_distinct(events: DataFrame, cols: list[str]) -> DataFrame:
    """Stateful stream dedup on a key set (append-only loads re-running
    safely — popelines/main.py:137). Unbounded state on a finite replay;
    production pairs it with a watermark via dropDuplicatesWithinWatermark."""
    return events.select(*cols).dropDuplicates(cols)


def stream_dedup_within_watermark(
    events: DataFrame, cols: list[str], delay: str = "1 hour"
) -> DataFrame:
    """Watermark-bounded stream dedup — state evicts as the watermark
    advances (the 100 TB-safe variant)."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(cols)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right rows within ``lookback``
    BEFORE each left row, equi on the key. Both sides carry a watermark and
    the join condition bounds event time on both — Spark's requirement for
    state cleanup, so per-key join state is O(rows in the lookback window)
    at any stream length (the 100 TB-stream-safe shape). Column names must
    be disjoint (rename before joining).

    how="left_outer" additionally emits each unmatched left row (right
    columns NULL) — but only once the watermark passes its join bound, so
    a finite replay must push the watermark past the data with sentinel
    rows on BOTH input streams or the unmatched tail never flushes
    (s_join_interval_left carries the replay recipe)."""
    l = left.withWatermark(left_ts, delay)
    r = right.withWatermark(right_ts, delay)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts] - F.expr(f"interval {lookback}"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, how)


def running_max(events: DataFrame, col: str = "ts") -> DataFrame:
    """find_last_entry (popelines/main.py:229) as streaming state: the
    high-water mark maintained incrementally instead of re-queried."""
    return events.agg(F.max(col).alias(f"max_{col}"))
