"""Custom stateful streaming operator via applyInPandasWithState.

The reference's incremental loop keeps its "state" in a BigQuery table
(max-watermark re-queried every run, popelines/main.py:225-234). The Spark
form keeps per-key state in the state store: here, a per-user running
aggregate (count + sum + high-water ts) updated per micro-batch and emitted
on every update.

Scale: state is partitioned by the group key across executors; with a
watermark the store evicts idle keys via the timeout. Arrow moves batches,
pandas computes — the same plumbing as any production
applyInPandasWithState operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value, last_ts), emitted each time
    the key appears in a micro-batch."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total, last_us = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                us = int(pd.Timestamp(batch_max).value // 1000)
                last_us = max(last_us, us)
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "last_ts_us": [last_us],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double, "
        "last_ts_us long",
        stateStructType="n long, total double, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
