"""Exactly-once streaming sink into a manifest table.

Structured Streaming's foreachBatch gives at-least-once delivery: after a
crash between "batch written" and "offsets checkpointed", the restarted
query REPLAYS the last batch. The manifest layout turns that into
exactly-once with no distributed transaction: every append carries the
micro-batch id, and ``append_manifest_table(batch_id=...)`` is a no-op
when any committed manifest already recorded that id — the replayed
batch short-circuits instead of duplicating (the same idempotent-sink
recipe Delta's ``txnAppId``/``txnVersion`` option encodes).

At 100 TB the sink cost per trigger is O(micro-batch) data + one
manifest object — the append never rewrites the table — and readers see
each batch atomically via the commit-marker flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from popelines_spark.manifest import append_manifest_table


def manifest_sink_writer(warehouse: str, table_name: str):
    """Build the foreachBatch callable:
    ``df.writeStream.foreachBatch(manifest_sink_writer(wh, "t"))``."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        append_manifest_table(
            batch_df.sparkSession,
            warehouse,
            table_name,
            batch_df,
            batch_id=batch_id,
        )

    return write


def write_stream_to_manifest(
    df: DataFrame,
    warehouse: str,
    table_name: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start (and return) the streaming query draining ``df`` into the
    manifest table exactly-once. ``trigger_available_now`` processes the
    currently-available data and stops — the batch-boundary replay shape
    used by incremental pipelines."""
    w = df.writeStream.foreachBatch(
        manifest_sink_writer(warehouse, table_name)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
