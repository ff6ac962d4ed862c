"""Stats-driven skew planning (operators/skew.plan_skew_salt + the
join_tables wiring).

Semantic contract: the salted rewrite is invisible — results equal the
plain join exactly (each big-side row gets exactly one deterministic
salt; the small side replicates over ALL salts, so key matches are
preserved 1:1). Plan contract: the join's shuffle key becomes
(key, __salt), spreading a hot key over `buckets` reducers.
"""

import json

import pytest
from pyspark.sql import functions as F

from popelines_spark import io
from popelines_spark.operators.skew import plan_skew_salt
from popelines_spark.pipeline import Popeline
from popelines_spark.plans.inspect import physical_plan


def _stats(rows, max_key_rows=None, skew_ratio=None, key="k"):
    s = {"rows": rows, "columns": {key: {"approx_ndv": 100}}}
    if max_key_rows is not None:
        s["keys"] = {
            key: {
                "max_key_rows": max_key_rows,
                "mean_key_rows": rows / 100,
                "skew_ratio": skew_ratio
                if skew_ratio is not None
                else max_key_rows / (rows / 100),
            }
        }
    return s


def test_plan_skew_salt_decision_table():
    # hot key = 40% of a 100k-row table, 32 reducers -> salt, power of two
    plan = plan_skew_salt(_stats(100_000, 40_000), "k", shuffle_partitions=32)
    assert plan is not None
    b = plan["buckets"]
    assert (b & (b - 1)) == 0 and 2 <= b <= 64
    # hottest key under a reducer's even share -> one task absorbs it
    assert plan_skew_salt(_stats(100_000, 2_000), "k", shuffle_partitions=32) is None
    # uniform-heavy (every key big, ratio < 4): AQE skew split handles it
    assert (
        plan_skew_salt(_stats(100_000, 4_000, skew_ratio=1.2), "k", shuffle_partitions=8)
        is None
    )
    # salted_join replicates the small side -> inner only
    assert plan_skew_salt(_stats(100_000, 40_000), "k", how="left") is None
    # no stats / no skew profile for the key -> leave the join alone
    assert plan_skew_salt(None, "k") is None
    assert plan_skew_salt(_stats(100_000), "k") is None
    assert plan_skew_salt(_stats(100_000, 40_000, key="other"), "k") is None


def test_plan_skew_salt_buckets_scale_with_heat():
    # 50% hot key over 32 partitions needs ~16 sub-splits
    big = plan_skew_salt(_stats(1_000_000, 500_000), "k", shuffle_partitions=32)
    mild = plan_skew_salt(_stats(1_000_000, 70_000), "k", shuffle_partitions=32)
    assert big["buckets"] > mild["buckets"]
    # replication cost cap
    extreme = plan_skew_salt(_stats(10_000_000, 10_000_000), "k", shuffle_partitions=256)
    assert extreme["buckets"] == 64


def test_analyze_table_key_skew_profile(spark, tmp_path):
    # 60% of rows on key 7, the rest uniform over 0..99
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") < 6_000, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    io.write_table(df, str(tmp_path), "fact")
    stats = io.analyze_table(spark, str(tmp_path), "fact", key_columns=["k"])
    prof = stats["keys"]["k"]
    assert prof["top_keys"][0]["value"] == "7"
    assert prof["max_key_rows"] == 6_000 + 40  # key 7 also hit by id%100==7
    assert prof["skew_ratio"] > 4
    # profile persists to _stats.json for the planner
    on_disk = io.read_table_stats(spark, str(tmp_path), "fact")
    assert on_disk["keys"]["k"]["max_key_rows"] == prof["max_key_rows"]
    # unknown / nested key columns are an explicit error, not silence
    with pytest.raises(ValueError):
        io.analyze_table(spark, str(tmp_path), "fact", key_columns=["nope"])


def _skewed_warehouse(spark, tmp_path, dim_rows=60):
    """fact: 20k rows, half on key 3; dim: `dim_rows` keys, stats doctored
    to the non-broadcastable regime (tiny test tables always fit)."""
    p = Popeline(warehouse=str(tmp_path), spark=spark)
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") < 10_000, F.lit(3))
        .otherwise(F.col("id") % 5_000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, dim_rows).select(
        (F.col("id") * 3).alias("k"), F.col("id").alias("attr")
    )
    io.write_table(fact, str(tmp_path), "fact")
    io.write_table(dim, str(tmp_path), "dim")
    p.analyze_table("fact", key_columns=["k"])
    stats = p.analyze_table("dim")
    stats["suggest_broadcast"] = False
    (tmp_path / "dim" / "_stats.json").write_text(json.dumps(stats))
    (tmp_path / "dim" / "._stats.json.crc").unlink(missing_ok=True)
    return p


def test_join_tables_auto_salts_skewed_fact(spark, tmp_path):
    p = _skewed_warehouse(spark, tmp_path)
    auto = p.join_tables("fact", "dim", on="k", skew="auto")
    plan = physical_plan(auto)
    assert "__salt" in plan  # shuffle key is (k, __salt)
    plain = p.join_tables("fact", "dim", on="k")
    assert "__salt" not in physical_plan(plain)
    assert auto.exceptAll(plain).count() == 0
    assert plain.exceptAll(auto).count() == 0
    assert "__salt" not in auto.columns  # rewrite leaves no residue


def test_join_tables_composes_bloom_and_salt(spark, tmp_path):
    p = _skewed_warehouse(spark, tmp_path)
    both = p.join_tables(
        "fact", "dim", on="k", runtime_filter="auto", skew="auto"
    )
    plan = physical_plan(both)
    assert "__salt" in plan and "xxhash64" in plan
    plain = p.join_tables("fact", "dim", on="k")
    assert both.exceptAll(plain).count() == 0
    assert plain.exceptAll(both).count() == 0


def test_join_tables_skew_auto_skips_uniform_fact(spark, tmp_path):
    """A uniform fact key must NOT salt — replication is pure cost."""
    p = Popeline(warehouse=str(tmp_path), spark=spark)
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 5_000).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 60).select((F.col("id") * 3).alias("k"))
    io.write_table(fact, str(tmp_path), "fact")
    io.write_table(dim, str(tmp_path), "dim")
    p.analyze_table("fact", key_columns=["k"])
    stats = p.analyze_table("dim")
    stats["suggest_broadcast"] = False
    (tmp_path / "dim" / "_stats.json").write_text(json.dumps(stats))
    (tmp_path / "dim" / "._stats.json.crc").unlink(missing_ok=True)
    assert "__salt" not in physical_plan(
        p.join_tables("fact", "dim", on="k", skew="auto")
    )


def test_join_tables_broadcastable_dim_short_circuits_salt(spark, tmp_path):
    """Broadcast-hash join never shuffles the fact by key: skew='auto'
    must prefer the broadcast and skip salting even with a hot key."""
    p = _skewed_warehouse(spark, tmp_path)
    # restore honest (broadcastable) dim stats
    p.analyze_table("dim")
    plan = physical_plan(p.join_tables("fact", "dim", on="k", skew="auto"))
    assert "BroadcastHashJoin" in plan and "__salt" not in plan


def test_join_tables_skew_true_rejects_outer(spark, tmp_path):
    p = _skewed_warehouse(spark, tmp_path)
    with pytest.raises(ValueError):
        p.join_tables("fact", "dim", on="k", how="left", skew=True)


def test_append_marks_stats_stale(spark, tmp_path):
    """Appends age ANALYZE stats: the planner inputs gain "stale": true
    until analyze_table reruns (overwrite clears the file wholesale)."""
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    io.write_table(df, str(tmp_path), "t")
    io.analyze_table(spark, str(tmp_path), "t")
    assert "stale" not in io.read_table_stats(spark, str(tmp_path), "t")
    io.write_table(df, str(tmp_path), "t", append=True)
    assert io.read_table_stats(spark, str(tmp_path), "t")["stale"] is True
    # re-analyze refreshes
    io.analyze_table(spark, str(tmp_path), "t")
    assert "stale" not in io.read_table_stats(spark, str(tmp_path), "t")
    # overwrite removes the file entirely (directory truncation)
    io.write_table(df, str(tmp_path), "t", append=False)
    assert io.read_table_stats(spark, str(tmp_path), "t") is None


def test_explain_join_reports_without_executing(spark, tmp_path):
    """plan_join is the single source of truth: explain_join's decision
    matches what join_tables applies, leg by leg."""
    p = _skewed_warehouse(spark, tmp_path)
    d = p.explain_join("fact", "dim", on="k", runtime_filter="auto", skew="auto")
    assert d["broadcast"] is False
    assert d["bloom_m_bits"] is not None and d["salt_buckets"] is not None
    assert any("salt" in r for r in d["reasons"])
    # broadcastable regime: both auto legs short-circuit
    p.analyze_table("dim")
    d = p.explain_join("fact", "dim", on="k", runtime_filter="auto", skew="auto")
    assert d["broadcast"] is True
    assert d["bloom_m_bits"] is None and d["salt_buckets"] is None
    # no stats at all -> plain join, says so
    io.write_table(spark.range(3), str(tmp_path), "bare")
    d = p.explain_join("bare", "bare", on="id")
    assert d == {
        "broadcast": False, "bloom_m_bits": None, "salt_buckets": None,
        "reasons": ["no rewrite: left to Catalyst/AQE"],
    }


def test_plan_join_forced_salt_overrides_broadcast():
    """The decision record must describe what executes: forced salt
    takes the salted_join path, so broadcast reads False."""
    from popelines_spark.planner import plan_join

    small = {
        "suggest_broadcast": True,
        "est_memory_bytes": 1024,
        "columns": {"k": {"approx_ndv": 10}},
    }
    d = plan_join(None, small, "k", skew=True)
    assert d["salt_buckets"] == 16 and d["broadcast"] is False
    assert any("overrides broadcast" in r for r in d["reasons"])
    # without the forced salt the same stats broadcast
    assert plan_join(None, small, "k")["broadcast"] is True
