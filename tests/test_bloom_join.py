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
