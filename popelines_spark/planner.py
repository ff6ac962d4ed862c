"""The stats-driven join planner — one decision function for the whole
rewrite matrix.

The reference's engine (BigQuery) chooses broadcast vs shuffled joins,
applies runtime semi-join filters, and re-plans hot keys transparently
on the server (every reference join goes through bq_query —
popelines/main.py:240). This module is that chooser made explicit and
inspectable: ``plan_join`` reads ONLY at-rest ``_stats.json`` metadata
(io.analyze_table) — two JSON files, never the tables, which is what
lets the decision run in constant time at 100 TB — and returns the full
decision with reasons, so callers can EXPLAIN a join before paying for
it. ``Popeline.join_tables`` applies whatever this returns.

Decision order (each leg individually unit/plan/equivalence-tested):
  1. broadcastable small side → broadcast hint; bloom and salt are
     short-circuited (a broadcast-hash join never shuffles the big side
     by key: no shuffle volume to cut, no hot reducer to split);
  2. ``runtime_filter`` → bloom prefilter below the big side's exchange
     (operators/bloom.plan_runtime_filter sizes the bitmap);
  3. ``skew`` → deterministic salted join for outlier hot keys
     (operators/skew.plan_skew_salt sizes the buckets);
  2+3 compose: the bloom filter drops non-matching rows at the scan,
  the salt spreads what survives.
"""

from __future__ import annotations

from popelines_spark.operators.bloom import (
    DEFAULT_M_BITS,
    ensure_prefilter_safe,
    plan_runtime_filter,
    size_bitmap,
)
from popelines_spark.operators.skew import plan_skew_salt


def plan_join(
    big_stats: dict | None,
    small_stats: dict | None,
    on: str,
    how: str = "inner",
    runtime_filter: bool | str = False,
    skew: bool | str = False,
    shuffle_partitions: int = 200,
) -> dict:
    """Choose the physical strategy for ``big JOIN small ON on``.

    Returns ``{"broadcast": bool, "bloom_m_bits": int | None,
    "salt_buckets": int | None, "reasons": [str, ...]}`` — everything
    ``False``/``None`` means: leave the join to Catalyst/AQE.

    ``runtime_filter``/``skew``: False (off), "auto" (stats decide), or
    True (forced; still refused — ValueError — for join types the
    rewrite would corrupt).
    """
    decision = {
        "broadcast": False,
        "bloom_m_bits": None,
        "salt_buckets": None,
        "reasons": [],
    }
    broadcastable = bool(small_stats and small_stats.get("suggest_broadcast"))
    if broadcastable:
        decision["broadcast"] = True
        decision["reasons"].append(
            "small side under the broadcast threshold "
            f"(est_memory_bytes={small_stats.get('est_memory_bytes')})"
        )

    if runtime_filter is True:
        ensure_prefilter_safe(how)
        key_ndv = ((small_stats or {}).get("columns", {}).get(on) or {}).get(
            "approx_ndv"
        )
        decision["bloom_m_bits"] = (
            size_bitmap(int(key_ndv)) if key_ndv else DEFAULT_M_BITS
        )
        decision["reasons"].append("bloom prefilter forced")
    elif runtime_filter == "auto" and not broadcastable:
        plan = plan_runtime_filter(big_stats, small_stats, on, how)
        if plan is not None:
            decision["bloom_m_bits"] = plan["m_bits"]
            decision["reasons"].append(f"bloom: {plan['reason']}")

    if skew is True:
        if how.lower().replace("_", "") != "inner":
            raise ValueError(
                f"plan_join: skew=True salts via salted_join, which is "
                f"inner-only (small side replicates ×buckets); how={how!r}"
            )
        decision["salt_buckets"] = 16
        decision["reasons"].append("salted join forced (buckets=16)")
    elif skew == "auto" and not broadcastable:
        plan = plan_skew_salt(
            big_stats, on, how, shuffle_partitions=shuffle_partitions
        )
        if plan is not None:
            decision["salt_buckets"] = plan["buckets"]
            decision["reasons"].append(f"salt: {plan['reason']}")

    if decision["salt_buckets"] is not None and decision["broadcast"]:
        # forced salt takes the salted_join path, which never broadcasts
        # — keep the decision record truthful about what will execute
        decision["broadcast"] = False
        decision["reasons"].append(
            "forced salt overrides broadcast (salted_join path)"
        )
    if not decision["reasons"]:
        decision["reasons"].append("no rewrite: left to Catalyst/AQE")
    return decision
