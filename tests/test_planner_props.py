"""Property tests for the pure planner functions (no Spark session).

The planner matrix's decision functions are pure dict→dict maps; these
pin their invariants over the whole input space so a future threshold
tweak can't silently produce a plan that explodes replication cost or
recommends an illegal layout.
"""

from hypothesis import given, strategies as st

from popelines_spark.operators.bloom import size_bitmap
from popelines_spark.operators.bucketed import plan_bucketing
from popelines_spark.operators.partitioned import plan_layout
from popelines_spark.operators.skew import plan_skew_salt


def _skew_stats(rows, max_key_rows, ndv=100):
    mean = rows / max(ndv, 1)
    return {
        "rows": rows,
        "columns": {"k": {"approx_ndv": ndv}},
        "keys": {
            "k": {
                "max_key_rows": max_key_rows,
                "mean_key_rows": mean,
                "skew_ratio": max_key_rows / max(mean, 1e-9),
            }
        },
    }


@given(
    rows=st.integers(1, 10**12),
    hot_frac=st.floats(0.0, 1.0),
    parts=st.integers(1, 100_000),
)
def test_plan_skew_salt_invariants(rows, hot_frac, parts):
    hot = int(rows * hot_frac)
    plan = plan_skew_salt(_skew_stats(rows, hot), "k", shuffle_partitions=parts)
    if plan is None:
        return
    b = plan["buckets"]
    # power of two within the replication bound
    assert (b & (b - 1)) == 0 and 2 <= b <= 64
    # only fires when the hot key overflows a reducer's even share
    assert hot > rows / parts
    # bucket count either restores the even share or hit the cap
    assert hot / b <= rows / parts or b == 64


@given(
    rows=st.integers(1, 10**12),
    hot_a=st.integers(0, 10**12),
    hot_b=st.integers(0, 10**12),
    parts=st.integers(1, 100_000),
)
def test_plan_skew_salt_monotone_in_heat(rows, hot_a, hot_b, parts):
    """More heat never salts LESS (None orders below any plan)."""
    lo, hi = sorted((min(hot_a, rows), min(hot_b, rows)))
    p_lo = plan_skew_salt(_skew_stats(rows, lo), "k", shuffle_partitions=parts)
    p_hi = plan_skew_salt(_skew_stats(rows, hi), "k", shuffle_partitions=parts)
    if p_lo is not None:
        assert p_hi is not None
        assert p_hi["buckets"] >= p_lo["buckets"]


@given(n=st.integers(1, 1 << 40))
def test_size_bitmap_envelope(n):
    m = size_bitmap(n)
    assert (m & (m - 1)) == 0
    assert 1 << 20 <= m <= 1 << 27
    # below the cap the bitmap keeps ≥16 bits/key
    assert m >= min(16 * n, 1 << 27)


@given(
    left=st.integers(0, 1 << 50),
    right=st.integers(0, 1 << 50),
)
def test_plan_bucketing_envelope(left, right):
    def _s(b):
        return {
            "total_bytes": b,
            "suggest_broadcast": False,
            "columns": {"k": {"approx_ndv": 10}},
        }

    plan = plan_bucketing(_s(left), _s(right), "k")
    if plan is None:
        assert max(left, right) == 0
        return
    n = plan["n_buckets"]
    assert (n & (n - 1)) == 0 and 8 <= n <= 4096
    # at the cap the per-bucket size may exceed target; below it, never
    if n < 4096:
        assert max(left, right) / n <= (256 << 20)


@given(
    ndvs=st.lists(st.integers(0, 10**9), min_size=1, max_size=6),
    rows=st.integers(1, 10**9),
)
def test_plan_layout_partitions_stay_in_band(ndvs, rows):
    cols = {f"c{i}": {"nulls": 0, "approx_ndv": v} for i, v in enumerate(ndvs)}
    plan = plan_layout({"rows": rows, "columns": cols}, list(cols))
    if plan is None:
        return
    p = plan["partition_by"]
    if p is not None:
        assert 2 <= int(cols[p]["approx_ndv"]) <= 4096
    # every filter column with usable stats lands somewhere exactly once
    placed = ([p] if p else []) + plan["cluster_by"]
    assert len(placed) == len(set(placed))
    for c in placed:
        assert c in cols


# --- plan_shuffle_partitions (round 10) --------------------------------

from hypothesis import given as _given  # noqa: E402
from popelines_spark.planner import plan_join, plan_shuffle_partitions  # noqa: E402


@_given(
    bytes_a=st.integers(0, 10**15),
    bytes_b=st.integers(0, 10**15),
    target=st.integers(1 << 20, 1 << 32),
)
def test_plan_shuffle_partitions_invariants(bytes_a, bytes_b, target):
    p = plan_shuffle_partitions(
        {"est_memory_bytes": bytes_a},
        {"est_memory_bytes": bytes_b},
        target_partition_bytes=target,
    )
    n, total = p["partitions"], p["est_bytes"]
    assert total == bytes_a + bytes_b
    assert 1 <= n <= 100_000
    # enough partitions that each stays under target (unless clamped)
    assert n * target >= total or n == 100_000
    # never more than one partition of headroom (unless clamped to 1)
    assert (n - 1) * target < total or n == 1


@_given(lo=st.integers(0, 10**15), hi=st.integers(0, 10**15))
def test_plan_shuffle_partitions_monotone(lo, hi):
    lo, hi = sorted((lo, hi))
    p_lo = plan_shuffle_partitions({"est_memory_bytes": lo})
    p_hi = plan_shuffle_partitions({"est_memory_bytes": hi})
    assert p_lo["partitions"] <= p_hi["partitions"]


def test_plan_shuffle_partitions_missing_stats_flagged():
    p = plan_shuffle_partitions({"est_memory_bytes": 1 << 30}, None)
    assert p["partitions"] == 8
    assert "lower bound" in p["reason"]


def test_plan_join_flags_stale_stats():
    stale = {"suggest_broadcast": True, "est_memory_bytes": 10,
             "stale": True, "columns": {}}
    d = plan_join({"columns": {}, "stale": True}, stale, "k")
    assert d["broadcast"] is True  # stale stats still decide
    assert sum("stale" in r for r in d["reasons"]) == 2


def test_estimate_stats_concurrent_matches_sequential(spark):
    """r13: the overlapped multi-relation stats pass returns the exact
    dicts sequential estimate_stats calls produce, in input order."""
    from popelines_spark.planner import (
        estimate_stats,
        estimate_stats_concurrent,
    )

    a = spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS STRING) AS s")
    b = spark.range(0, 10).selectExpr("id AS k")
    c = spark.range(0, 0).selectExpr("id AS k")  # empty frame
    specs = [(a, ["k"]), (b, ["k"]), (c, None)]
    seq = [estimate_stats(df, keys=k) for df, k in specs]
    conc = estimate_stats_concurrent(specs)
    assert conc == seq
