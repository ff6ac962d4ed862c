"""Watermark late-data semantics, pinned to exact drop/keep/emit sets.

VERDICT r1 #10: the ±1-tick behavior around the watermark is the streaming
semantics most likely to silently drift across Spark upgrades, so this test
replays a 4-file micro-batch sequence and asserts, batch by batch, exactly
which rows merge, which are dropped (numRowsDroppedByWatermark), and which
windows the append sink finalizes.

Pinned behavior (Spark 4.x file-source replay, 10-min tumbling windows,
10-min watermark delay):
 - the watermark computed from batch N's max event time takes effect in
   batch N+1, and state eviction for a batch runs at its END — so a
   straggler arriving in the FIRST batch after the watermark advanced
   still merges into its (not-yet-evicted) window state;
 - one batch later the window state is gone and the same-lateness
   straggler is dropped, whether its window ever had state or not;
 - a row timestamped exactly AT the watermark keeps (window end > wm);
 - append emits each finalized window exactly once.
"""

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import functions as F


def _ts(h, m, s=0):
    return dt.datetime(2021, 1, 1, h, m, s)


#: micro-batch files: (id, event time) rows, replayed in order.
_FILES = [
    # A — bulk: max ts 12:00 pushes the watermark to 11:50 for batch 1
    [(1, _ts(11, 35)), (2, _ts(11, 44)), (3, _ts(12, 0))],
    # B — straddles the 11:50 watermark by ±1 tick
    [(11, _ts(11, 39, 59)),   # below wm, window state alive -> merges
     (12, _ts(11, 40, 0)),    # window [11:40,11:50) -> merges
     (13, _ts(11, 49, 59)),   # 1 tick below wm, same window -> merges
     (14, _ts(11, 50, 0)),    # exactly AT wm -> keeps (window end > wm)
     (15, _ts(11, 50, 1))],   # 1 tick above wm -> keeps
    # C — same lateness, one batch later: states evicted -> dropped
    [(21, _ts(11, 39, 58)),   # window already emitted -> dropped
     (22, _ts(11, 29, 0)),    # window never seen, end < wm -> dropped
     (23, _ts(11, 55, 0))],   # window [11:50,12:00) active -> merges
    # D — advances wm to 12:20, finalizing the 11:50 and 12:00 windows
    [(31, _ts(12, 30, 0))],
]


def test_watermark_boundary_exact_drop_keep_emit(spark, tmp_path):
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    for i, rows in enumerate(_FILES):
        df = spark.createDataFrame(rows, "id long, ts timestamp")
        stage = f"{src}/_stage{i}"
        df.coalesce(1).write.parquet(stage)
        os.rename(glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/{i}.parquet")
        shutil.rmtree(stage)
        # file-source trigger order is by modification time
        os.utime(f"{src}/{i}.parquet", (1600000000 + i * 10,) * 2)

    schema = spark.read.parquet(f"{src}/0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_boundary")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
        q.awaitTermination()

    dropped = {
        p["batchId"]: p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in progress
        if p["stateOperators"]
    }
    # only batch 2 (file C) drops, and exactly its two sub-watermark rows
    assert {b: n for b, n in dropped.items() if n} == {2: 2}

    out = {r.ws: r.n for r in spark.table("wm_boundary").collect()}
    assert out == {
        _ts(11, 30): 2,  # a1 + late-but-state-alive b11
        _ts(11, 40): 3,  # a2 + b12 + b13 (1 tick below wm, state alive)
        _ts(11, 50): 3,  # b14 (exactly at wm) + b15 + c23
        _ts(12, 0): 1,   # a3
        # NO _ts(11, 20) row: straggler to a never-seen window was dropped
        # and exactly ONE _ts(11, 30) row: straggler to an evicted window
        # was dropped instead of re-opening it (dict equality covers both)
    }
    rows = spark.table("wm_boundary").collect()
    assert len(rows) == 4  # each finalized window emitted exactly once
