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
    """Per-user running (n_events, total_cents, last_ts), emitted each time
    the key appears in a micro-batch.

    The money total accumulates in INTEGER CENTS, not float: float
    accumulation across micro-batches makes the final state depend on how
    the stream happened to be batched (and on pandas' summation order) —
    the exact nondeterminism-under-re-batching this engine's ground rules
    exclude. With integer state every emission, including the final one,
    is a pure function of the event SET, so the final state equals the
    batch rollup bit-for-bit (that equality is hash-checked by the
    s_custom_state oracle)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, cents, last_us = (
            state.get if state.exists else (0, 0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            # per-row cents are exact for 2-decimal values; Python-int sum
            # is associative — no accumulation-order dependence. NULL
            # values contribute 0, matching SQL SUM's ignore-NULL — the
            # bare astype("int64") raised on NaN and failed the whole
            # query on one null row (review r12)
            cents += int(
                pdf["value"].mul(100).round().fillna(0).astype("int64").sum()
            )
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                us = int(pd.Timestamp(batch_max).value // 1000)
                last_us = max(last_us, us)
        state.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "last_ts_us": [last_us],
            }
        )

    # Project BEFORE the Python boundary: applyInPandasWithState is
    # opaque to Catalyst, so column pruning stops here — without this
    # select every events column (event_id, event_type, props, ...)
    # rides the Arrow transfer into Python just to be ignored.
    events = events.select("user_id", "value", "ts")
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_cents long, "
        "last_ts_us long",
        stateStructType="n long, cents long, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
