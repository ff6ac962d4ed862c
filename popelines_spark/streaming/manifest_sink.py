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

from popelines_spark.manifest import (
    append_manifest_table,
    manifest_batch_version,
)


def manifest_sink_writer(warehouse: str, table_name: str,
                         app_id: str | None = None,
                         dedup_legacy_epoch: bool | None = None):
    """Build the foreachBatch callable:
    ``df.writeStream.foreachBatch(manifest_sink_writer(wh, "t"))``.

    ``app_id`` NAMESPACES the dedup ids (the ``txnAppId`` half of
    Delta's recipe): the bare foreachBatch epoch restarts from 0 for a
    fresh checkpoint, so two DIFFERENT queries writing the same table
    would silently no-op each other's batches 0..N (review r12).
    ``write_stream_to_manifest`` passes a checkpoint-derived app_id
    automatically — stable across restarts of the same checkpoint (the
    replayed epoch still dedups), distinct across checkpoints (no
    cross-query false dedup). Like Delta's txnAppId, REUSING a
    checkpoint path for a logically new pipeline keeps the namespace:
    point the new pipeline at a new checkpoint dir (or pass a fresh
    explicit app_id). ``app_id=None`` keeps the legacy bare-epoch ids
    for single-query tables written before this round.

    ``dedup_legacy_epoch`` (default: on whenever ``app_id`` is set)
    closes the UPGRADE replay hole (ADVICE r12): a pipeline whose table
    was written with bare-epoch ids and that restarts on its existing
    checkpoint AFTER app_id namespacing landed replays its last epoch
    under the NEW ``app:N`` id — the recorded bare ``N`` no longer
    matches and the batch would be re-appended once. The FIRST
    micro-batch this writer instance sees (the only one that can be a
    restart replay) therefore also checks the legacy bare id in the
    tip's lineage (dual lookup) and no-ops on a hit. Scoped to the
    first batch so a genuinely new pipeline (fresh checkpoint, epochs
    from 0) is exposed to at most one cross-query bare-id collision —
    the pre-namespacing default for every batch — and that only on
    tables carrying legacy ids; pass ``dedup_legacy_epoch=False`` for
    a brand-new pipeline writing into a legacy table."""
    if dedup_legacy_epoch is None:
        dedup_legacy_epoch = app_id is not None
    state = {"first": True}

    def write(batch_df: DataFrame, batch_id: int) -> None:
        first, state["first"] = state["first"], False
        if app_id and dedup_legacy_epoch and first and manifest_batch_version(
            batch_df.sparkSession, warehouse, table_name, batch_id
        ) is not None:
            return  # upgrade replay: epoch committed under its bare id
        append_manifest_table(
            batch_df.sparkSession,
            warehouse,
            table_name,
            batch_df,
            batch_id=f"{app_id}:{batch_id}" if app_id else batch_id,
        )

    return write


def write_stream_to_manifest(
    df: DataFrame,
    warehouse: str,
    table_name: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    app_id: str | None = None,
    dedup_legacy_epoch: bool | None = None,
):
    """Start (and return) the streaming query draining ``df`` into the
    manifest table exactly-once. ``trigger_available_now`` processes the
    currently-available data and stops — the batch-boundary replay shape
    used by incremental pipelines. Dedup ids are namespaced by a
    checkpoint-derived ``app_id`` (see manifest_sink_writer) unless one
    is supplied; ``dedup_legacy_epoch`` is forwarded (see
    manifest_sink_writer — the pre-namespacing upgrade migration)."""
    import hashlib

    if app_id is None:
        app_id = hashlib.sha256(
            checkpoint_dir.encode("utf-8")
        ).hexdigest()[:16]
    w = df.writeStream.foreachBatch(
        manifest_sink_writer(
            warehouse, table_name, app_id=app_id,
            dedup_legacy_epoch=dedup_legacy_epoch,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
