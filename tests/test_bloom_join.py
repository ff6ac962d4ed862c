"""Bloom-filter join pre-filtering (operators/bloom.py).

Semantic contract: the rewrite is invisible — bloom_filter_join equals the
plain join exactly (false positives removed by the join, false negatives
impossible). Plan contract: the probe filter sits on the big side BELOW the
join's exchange, so the shuffle carries only surviving rows.
"""

import pytest
from pyspark.sql import functions as F

from popelines_spark.operators.bloom import (
    bloom_bitmap,
    bloom_filter_join,
    bloom_might_contain,
    plan_runtime_filter,
    size_bitmap,
)
from popelines_spark.plans.inspect import physical_plan
from tests.conftest import SF_DIR


def _sides(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 40).select((F.col("id") * 13).alias("k"))
    return big, small


def test_bitmap_has_no_false_negatives(spark):
    _, small = _sides(spark)
    bitmap = bloom_bitmap(small, "k")
    probe = small.crossJoin(F.broadcast(bitmap))
    hits = probe.filter(
        bloom_might_contain(F.col("k"), F.col("__bloom_bitmap__"))
    ).count()
    assert hits == small.count()  # every true key must pass


def test_bloom_join_equals_plain_inner_join(spark):
    big, small = _sides(spark)
    got = bloom_filter_join(big, small, on="k")
    want = big.join(small, "k")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == want.count() > 0


def test_bloom_join_left_semi(spark):
    big, small = _sides(spark)
    got = bloom_filter_join(big, small, on="k", how="left_semi")
    want = big.join(small, "k", "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_join_rejects_outer_joins(spark):
    big, small = _sides(spark)
    for how in ("left", "right", "full", "left_anti"):
        with pytest.raises(ValueError, match="unmatched big-side"):
            bloom_filter_join(big, small, on="k", how=how)


def test_bloom_join_survives_user_bloom_column(spark):
    big, small = _sides(spark)
    big = big.withColumn("bloom", F.col("payload") * 2)
    got = bloom_filter_join(big, small, on="k")
    want = big.join(small, "k")
    assert "bloom" in got.columns  # the user's column is preserved
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_join_survives_bitmap_name_collision(spark):
    """A big side that already carries ``__bloom_bitmap__`` must not make
    the crossJoin ambiguous — bloom_filter_join picks an unused name."""
    big, small = _sides(spark)
    big = big.withColumn("__bloom_bitmap__", F.col("payload") + 1)
    got = bloom_filter_join(big, small, on="k")
    want = big.join(small, "k")
    assert "__bloom_bitmap__" in got.columns  # user's column preserved
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_registered_query_filters_below_exchange(spark):
    """b_join_bloom's plan: the xxhash64 bitmap probe must appear on the
    fact side BELOW the SMJ exchange — that ordering is the whole point
    (the shuffle moves only rows that might join)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["b_join_bloom"](spark, SF_DIR)
    plan = physical_plan(df)
    lines = plan.splitlines()
    # locate the big-side exchange: the hashpartitioning exchange whose
    # subtree contains the bloom probe (xxhash64 against the bitmap map)
    probe_idx = next(
        i for i, ln in enumerate(lines) if "__bloom_bitmap__" in ln
    )
    exch_above = [
        i
        for i, ln in enumerate(lines[:probe_idx])
        if "Exchange hashpartitioning(k" in ln
    ]
    assert exch_above, "no join exchange above the bloom probe"
    # and the probe row must cover the lineitem scan (it filters the scan
    # output, not the join output)
    scan_idx = next(
        i for i, ln in enumerate(lines) if "lineitem" in ln
    )
    assert probe_idx < scan_idx, "bloom probe must sit between exchange and scan"


# --- stats-driven planner (plan_runtime_filter / Pipeline.join_tables) ---


def _stats(ndv, rows=None, broadcastable=False, key="k"):
    return {
        "rows": rows if rows is not None else ndv,
        "suggest_broadcast": broadcastable,
        "columns": {key: {"approx_ndv": ndv, "nulls": 0,
                          "min": "0", "max": str(ndv)}},
    }


def test_plan_runtime_filter_decision_table():
    big = _stats(100_000)
    # selective non-broadcastable dim -> apply, bitmap sized from dim NDV
    plan = plan_runtime_filter(big, _stats(2_000), "k")
    assert plan is not None and plan["m_bits"] == size_bitmap(2_000)
    # broadcastable dim -> broadcast join already filters map-side
    assert plan_runtime_filter(big, _stats(2_000, broadcastable=True), "k") is None
    # unselective dim (NDV ratio > 0.5) -> filter won't pay for itself
    assert plan_runtime_filter(big, _stats(80_000), "k") is None
    # join type that keeps unmatched big rows -> never
    assert plan_runtime_filter(big, _stats(2_000), "k", how="left") is None
    # missing stats / missing key column -> leave the join alone
    assert plan_runtime_filter(None, _stats(2_000), "k") is None
    assert plan_runtime_filter(big, _stats(2_000, key="other"), "k") is None


def test_size_bitmap_bounds():
    assert size_bitmap(1) == 1 << 20            # floor: 128 KiB broadcast
    assert size_bitmap(1 << 24) == 1 << 27      # cap: 16 MiB broadcast
    m = size_bitmap(200_000)                    # ~16 bits/key, power of two
    assert m >= 16 * 200_000 and (m & (m - 1)) == 0


def test_join_tables_auto_picks_bloom_from_stats(spark, tmp_path):
    """End-to-end: analyze both tables, doctor the dim's at-rest stats to
    the non-broadcastable regime, and check join_tables(auto) applies the
    bloom probe (visible in the plan) while matching the plain join."""
    import json

    from popelines_spark.pipeline import Popeline
    from popelines_spark import io

    p = Popeline(warehouse=str(tmp_path), spark=spark)
    big = spark.range(0, 20_000).select(
        (F.col("id") % 5_000).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 60).select(
        (F.col("id") * 7).alias("k"), F.col("id").alias("attr")
    )
    io.write_table(big, str(tmp_path), "fact")
    io.write_table(small, str(tmp_path), "dim")
    p.analyze_table("fact")
    stats = p.analyze_table("dim")
    # tiny test tables are always broadcastable — simulate the at-scale
    # regime (dim too big to broadcast) in the at-rest metadata
    stats["suggest_broadcast"] = False
    (tmp_path / "dim" / "_stats.json").write_text(json.dumps(stats))
    # drop the Hadoop-LocalFS checksum sidecar the direct rewrite broke
    (tmp_path / "dim" / "._stats.json.crc").unlink(missing_ok=True)

    auto = p.join_tables("fact", "dim", on="k", runtime_filter="auto")
    assert "xxhash64" in physical_plan(auto)
    plain = p.join_tables("fact", "dim", on="k")  # default: rewrite off
    assert "xxhash64" not in physical_plan(plain)
    assert auto.exceptAll(plain).count() == 0
    assert plain.exceptAll(auto).count() == 0


def test_join_tables_default_broadcasts_small_dim(spark, tmp_path):
    """With stats present and the dim under the broadcast threshold, the
    default path hints broadcast (no bloom, no sort-merge exchange)."""
    from popelines_spark.pipeline import Popeline
    from popelines_spark import io

    p = Popeline(warehouse=str(tmp_path), spark=spark)
    io.write_table(
        spark.range(0, 1000).select(F.col("id").alias("k")),
        str(tmp_path), "fact",
    )
    io.write_table(
        spark.range(0, 10).select(F.col("id").alias("k")),
        str(tmp_path), "dim",
    )
    p.analyze_table("fact")
    assert p.analyze_table("dim")["suggest_broadcast"] is True
    plan = physical_plan(p.join_tables("fact", "dim", on="k"))
    assert "BroadcastHashJoin" in plan
