"""Operator-level semantics: upsert MERGE guards, keyed survivor selection."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from popelines_spark.operators.keyed import keep_first
from popelines_spark.operators.upsert import upsert


def _t(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, s string, v long"
    )


def test_upsert_raises_on_duplicate_source_keys(spark):
    """ADVICE r1: BigQuery/Delta MERGE raises on multiple source matches;
    the emulation must not silently fan target rows out."""
    src = spark.createDataFrame(
        [(1, "x", 11), (1, "y", 12)], "k long, s string, v long"
    )
    out = upsert(_t(spark), src, keys=["k"])
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "duplicate source rows" in str(ei.value)


def test_upsert_dedup_source_order_keeps_first(spark):
    src = spark.createDataFrame(
        [(1, "x", 11), (1, "y", 12), (3, "c", 30)], "k long, s string, v long"
    )
    out = {
        r.k: (r.s, r.v)
        for r in upsert(
            _t(spark), src, keys=["k"], dedup_source_order=["v"]
        ).collect()
    }
    assert out == {1: ("x", 11), 2: ("b", 20), 3: ("c", 30)}


def test_upsert_unique_source_passes_guard(spark):
    src = spark.createDataFrame([(2, "B", 21)], "k long, s string, v long")
    out = {r.k: r.s for r in upsert(_t(spark), src, keys=["k"]).collect()}
    assert out == {1: "a", 2: "B"}


def test_keep_first_n(spark):
    df = spark.createDataFrame(
        [(1, i) for i in range(5)] + [(2, 9)], "g long, x long"
    )
    out = sorted(
        (r.g, r.x) for r in keep_first(df, ["g"], [F.col("x").desc()], n=2).collect()
    )
    assert out == [(1, 3), (1, 4), (2, 9)]


def test_range_join_boundary_inclusive(spark):
    """count_within_radius includes matches exactly AT the radius on both
    sides and spans bucket boundaries."""
    import datetime as dt

    from popelines_spark.operators.rangejoin import count_within_radius

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base)], "event_id long, ts timestamp"
    )
    H = dt.timedelta(hours=1)
    right = spark.createDataFrame(
        [
            (base - H,),                       # exactly -radius: included
            (base + H,),                       # exactly +radius: included
            (base - H - dt.timedelta(microseconds=1),),  # just outside
            (base + H + dt.timedelta(microseconds=1),),  # just outside
            (base + dt.timedelta(minutes=59),),          # inside, other bucket
        ],
        "pts timestamp",
    )
    got = count_within_radius(
        left, right, left_id="event_id", left_ts="ts", right_ts="pts"
    ).collect()
    assert got[0]["n_nearby"] == 3

    # left row with zero matches still appears
    far = spark.createDataFrame([(dt.datetime(2030, 1, 1),)], "pts timestamp")
    got0 = count_within_radius(
        left, far, left_id="event_id", left_ts="ts", right_ts="pts"
    ).collect()
    assert got0[0]["n_nearby"] == 0


def test_snapshot_diff_classification(spark):
    """insert/delete/update classification including NULL transitions;
    unchanged keys dropped."""
    from popelines_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),      # unchanged -> dropped
         (2, 21.0, "B"),      # price changed -> update
         (3, 30.0, "C"),      # NULL -> value: update, not silent equality
         (5, 50.0, "E")],     # new key -> insert; key 4 -> delete
        "k long, price double, status string",
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(
        old, new, ["k"], ["price", "status"]).collect()}
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}


def test_spread_contract(spark):
    """r13 scan-parallelism repair: spread/spread_by fan a narrow frame
    out to the session's default parallelism, are a NO-OP when the plan
    already fills the cores, and never change results."""
    from popelines_spark.operators.par import spread, spread_by

    par = spark.sparkContext.defaultParallelism
    few = spark.range(0, 1000).coalesce(1)

    assert spread(few).rdd.getNumPartitions() == par
    assert spread_by(few, "id").rdd.getNumPartitions() == par

    # no-op contract: already at/above target -> same frame, no exchange
    many = spark.range(0, 1000, numPartitions=par)
    assert spread(many) is many
    assert spread_by(many, "id") is many

    # spread_by hash-partitions on the key (no round-robin sort barrier);
    # spread is round-robin
    plan_by = spread_by(few, "id")._jdf.queryExecution().executedPlan().toString()
    plan_rr = spread(few)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(id" in plan_by
    assert "roundrobinpartitioning" in plan_rr.lower()

    # results identical either way
    base = {r.id for r in few.collect()}
    assert {r.id for r in spread(few).collect()} == base
    assert {r.id for r in spread_by(few, "id").collect()} == base
