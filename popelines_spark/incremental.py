"""Incremental-extraction helpers: date chunking + high-water marks.

Reference parity:
 - ``chunk_date_range`` ports popelines/main.py:208-223 exactly (n-day
   windows, final window end-clamped to end_datetime).
 - ``date_series`` is its distributed form: F.sequence + explode, so a
   million-chunk backfill plan is a DataFrame, not a driver loop.
 - ``max_watermark`` is ``find_last_entry`` (popelines/main.py:225-234):
   SELECT MAX(col) — on parquet this reads footer statistics, not data.
 - ``incremental_append`` composes watermark → bounded filter → append, the
   reference's whole incremental loop in one call.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def chunk_date_range(
    start_datetime: dt.datetime, end_datetime: dt.datetime, chunk_size: int
) -> Iterator[tuple[dt.datetime, dt.datetime]]:
    """Driver-side generator, exact port of popelines/main.py:208-223."""
    for n in range(int((end_datetime - start_datetime).days) + 1):
        if n % chunk_size == 0:
            start = start_datetime + dt.timedelta(n)
            end = start_datetime + dt.timedelta(n + chunk_size)
            yield (start, end) if end < end_datetime else (start, end_datetime)


def date_series(
    spark: SparkSession, start: str, end: str, step_days: int = 1
) -> DataFrame:
    """Distributed date sequence: one row per chunk start (b_fn_date_seq).
    An empty range (end < start) yields zero rows, matching the driver
    twin chunk_date_range — F.sequence would otherwise throw at
    execution on the distributed path only (review r11)."""
    seq = F.sequence(
        F.to_date(F.lit(start)),
        F.to_date(F.lit(end)),
        F.expr(f"interval {int(step_days)} days"),
    )
    guarded = F.when(
        F.to_date(F.lit(end)) >= F.to_date(F.lit(start)), seq
    ).otherwise(F.array().cast("array<date>"))
    return spark.range(1).select(
        F.explode(guarded).alias("chunk_start")
    )


def max_watermark(df: DataFrame, column: str):
    """find_last_entry (popelines/main.py:225-234): scalar MAX(column).
    The single sanctioned driver-side materialization — one scalar row."""
    return df.agg(F.max(column).alias("w")).collect()[0]["w"]


def incremental_append(
    new_data: DataFrame,
    warehouse: str,
    table_name: str,
    ts_column: str,
) -> int:
    """Append only rows newer than the live table's watermark; returns the
    number of appended rows.

    SINGLE WRITER PER TABLE: the watermark-read → filter → append
    sequence is not serialized, so two concurrent callers would both
    read watermark W and append the same rows twice — route concurrent
    incremental feeds through the manifest layout's idempotent
    ``batch_id`` appends instead (review r11).

    The filtered batch is materialized ONCE (localCheckpoint) before
    counting: count-then-write re-executed the whole lineage — double
    REST fetches for API sources, and a count that need not match the
    rows actually persisted under nondeterministic lineages (the
    re-execution hazard io.write_table documents). The increment is
    O(batch) by definition, so the materialization is too."""
    from popelines_spark.io import (
        _path_exists,
        append_table_snapshot,
        is_snapshot_table,
        read_table_evolved,
        read_table_snapshot,
        table_path,
        write_table,
    )
    from popelines_spark.manifest import (
        append_manifest_table,
        is_manifest_table,
        read_manifest_table,
    )

    spark = new_data.sparkSession
    # Detect the layout ONCE and use the SAME verdict for both the read
    # and the write — not read_table_auto, whose independent re-probe
    # could diverge from ours if the first layout commit lands in the
    # gap: reading the manifest tip while appending to the table ROOT
    # left new parquet invisible to every layout reader, so the
    # watermark never advanced and each run re-appended the same rows
    # as unreachable debris — a silent duplication loop (review r12).
    layout = "path"
    if is_manifest_table(spark, warehouse, table_name):
        layout = "manifest"
    elif is_snapshot_table(spark, warehouse, table_name):
        layout = "snapshot"
    if layout == "manifest":
        live = read_manifest_table(spark, warehouse, table_name)
    elif layout == "snapshot":
        live = read_table_snapshot(spark, warehouse, table_name)
    elif _path_exists(spark, table_path(warehouse, table_name)):
        # evolved read: a single-footer sample can predate ts_column
        # (review r11)
        live = read_table_evolved(spark, warehouse, table_name)
    else:
        live = None
    if live is not None:
        wm = max_watermark(live, ts_column)
        if wm is not None:
            new_data = new_data.filter(F.col(ts_column) > F.lit(wm))
    new_data = new_data.localCheckpoint(eager=True)
    n = new_data.count()
    if n:
        if layout == "manifest":
            append_manifest_table(spark, warehouse, table_name, new_data)
        elif layout == "snapshot":
            append_table_snapshot(spark, warehouse, table_name, new_data)
        else:
            write_table(new_data, warehouse, table_name, append=True)
    return n
