"""Pins for the round-12 operators/planner/plans review findings."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_time_rollup_rejects_week_before_calendar_grains(spark):
    """Review r12: ISO weeks straddle month boundaries, so cascading a
    calendar grain over week buckets mis-assigns boundary days (Feb 1-4
    of a Jan-29 week counted into January). Must raise."""
    from popelines_spark.operators.eventseq import time_rollup

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 2, 1), 1.0)], "ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="week"):
        time_rollup(ev, "ts", "value", grains=("week", "month"))
    # week as the LAST grain stays valid
    out = time_rollup(ev, "ts", "value", grains=("day", "week"))
    assert out.count() == 2


def test_scd2_runs_null_safe_attr_transitions(spark):
    """Review r12: X->NULL merged two runs under one island id and
    NULL->NULL fragmented into per-row versions."""
    from popelines_spark.operators.eventseq import scd2_runs

    df = spark.createDataFrame(
        [
            ("k", dt.datetime(2020, 1, 1), 1, "A"),
            ("k", dt.datetime(2020, 1, 2), 2, None),
            ("k", dt.datetime(2020, 1, 3), 3, None),
            ("k", dt.datetime(2020, 1, 4), 4, "B"),
        ],
        "key string, ts timestamp, seq long, attr string",
    )
    runs = scd2_runs(df, "key", "ts", "attr", "seq").orderBy("version")
    rows = runs.collect()
    assert [r["attr"] for r in rows] == ["A", None, "B"]
    assert [r["n_obs"] for r in rows] == [1, 2, 1]
    assert [r["version"] for r in rows] == [1, 2, 3]
    # contiguous validity: each run ends where the next begins
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert rows[2]["valid_to"] is None


def test_star_join_rejects_unplanned_dims(spark):
    from popelines_spark.operators.star import star_join

    fact = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("k1"), (F.col("id") % 2).alias("k2")
    )
    d1 = spark.range(3).select(F.col("id").alias("k1"), F.lit("x").alias("a"))
    d2 = spark.range(2).select(F.col("id").alias("k2"), F.lit("y").alias("b"))
    plan = {"order": ["d1"], "legs": {"d1": {}}}
    with pytest.raises(ValueError, match="not in the plan"):
        star_join(
            fact,
            [
                {"name": "d1", "df": d1, "on": "k1"},
                {"name": "d2", "df": d2, "on": "k2"},
            ],
            plan,
        )


def test_salted_join_survives_user_salt_column(spark):
    """Review r12: a user column named __salt was overwritten and then
    dropped from the output."""
    from popelines_spark.operators.skew import salted_join

    skewed = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("payload"),
        F.lit("user-data").alias("__salt"),
    )
    small = spark.range(5).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
    out = salted_join(skewed, small, "k", buckets=4)
    assert out.count() == 100
    assert "__salt" in out.columns
    assert out.select("__salt").distinct().collect()[0][0] == "user-data"


def test_plan_shuffle_partitions_zero_bytes_is_not_missing():
    from popelines_spark.planner import plan_shuffle_partitions

    got = plan_shuffle_partitions(
        {"est_memory_bytes": 0}, {"est_memory_bytes": 1 << 30}
    )
    assert "no stats" not in got["reason"]
    got2 = plan_shuffle_partitions(None, {"est_memory_bytes": 1 << 30})
    assert "no stats" in got2["reason"]


def test_plan_join_broadcast_short_circuits_forced_bloom():
    from popelines_spark.planner import plan_join

    small = {"est_memory_bytes": 1 << 20, "suggest_broadcast": True,
             "columns": {"k": {"approx_ndv": 100}}}
    big = {"est_memory_bytes": 1 << 40, "columns": {"k": {"approx_ndv": 10_000}}}
    d = plan_join(big, small, "k", runtime_filter=True)
    assert d["broadcast"] is True
    assert d["bloom_m_bits"] is None
    assert any("map-side" in r for r in d["reasons"])


def test_top_level_cols_ignores_nested_fields():
    from popelines_spark.plans.inspect import _top_level_cols

    assert _top_level_cols("struct<a:int>") == 1
    assert _top_level_cols("struct<a:int,b:struct<x:int,y:int>>") == 2
    assert _top_level_cols(
        "struct<m:map<string,struct<p:int,q:int>>,arr:array<struct<z:int>>>"
    ) == 2
    assert _top_level_cols("struct<>") == 0
