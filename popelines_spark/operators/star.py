"""Star-schema multi-way join executor — runs a ``plan_star_join`` plan.

A star join is one fact table joined to N dimension tables, each on its
own fact column. Two physical decisions dominate its cost at scale and
both are made by ``planner.plan_star_join`` from at-rest statistics,
never a live scan:

  1. LEG ORDER — every selective INNER leg shrinks the fact rows that
     all later legs must shuffle or probe, so the most selective legs
     (smallest dim-key-NDV / fact-key-NDV ratio) go first; LEFT legs
     never filter, so they run last over the smallest surviving fact.
  2. PER-LEG STRATEGY — broadcast hint for under-threshold dims, bloom
     prefilter below the fact's exchange for selective non-broadcastable
     dims (``planner.plan_join`` legs, unchanged semantics).

The reference delegates every join to BigQuery (popelines/main.py:240),
whose optimizer reorders joins by selectivity estimates and injects
runtime semi-join filters transparently; this module is those two moves
made explicit, inspectable, and plan-testable.

Result-invariance: reordering is restricted to shapes where it cannot
change the result — INNER legs commute with each other and with later
LEFT legs *in a star* (each leg joins on a fact column key; a LEFT leg
only appends columns and preserves fact multiplicity when its key is
unique — the planner does not verify dim-key uniqueness, same contract
as a plain sequential join). RIGHT/FULL legs are refused at plan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from popelines_spark.operators.bloom import bloom_prefilter


def star_join(
    fact: DataFrame,
    dims: list[dict],
    plan: dict,
) -> DataFrame:
    """Execute ``fact ⋈ dim₁ ⋈ … ⋈ dimₙ`` in the planned order.

    ``dims``: ``[{"name": str, "df": DataFrame, "on": str,
    "how": "inner"|"left"}, ...]`` — the same legs that were described
    to ``planner.plan_star_join`` (by stats), now carrying the actual
    DataFrames. ``plan``: what ``plan_star_join`` returned.

    Each leg applies its planned rewrite: bloom prefilter on the fact
    side first (cut the shuffle volume before the exchange), then the
    join with an explicit broadcast hint when planned. Legs the planner
    left alone go to Catalyst/AQE untouched.
    """
    from popelines_spark.operators.skew import salted_join

    by_name = {d["name"]: d for d in dims}
    missing = [n for n in plan["order"] if n not in by_name]
    if missing:
        raise ValueError(f"star_join: plan orders unknown legs {missing}")
    unplanned = [n for n in by_name if n not in set(plan["order"])]
    if unplanned:
        # the symmetric check: a dim handed to the executor but absent
        # from the plan would be SILENTLY never joined (review r12)
        raise ValueError(
            f"star_join: dims {unplanned} are not in the plan's order — "
            "re-plan with every leg, or drop them from dims"
        )
    out = fact
    for name in plan["order"]:
        leg = plan["legs"][name]
        dim = by_name[name]
        side = dim["df"]
        if leg.get("bloom_m_bits") is not None:
            out = bloom_prefilter(
                out, side, dim["on"], m_bits=leg["bloom_m_bits"]
            )
        if leg.get("salt_buckets") is not None:
            # same composition as join_tables: prefilter cut the volume,
            # the salt spreads the surviving hot key's shuffle
            out = salted_join(out, side, dim["on"],
                              buckets=leg["salt_buckets"])
            continue
        if leg.get("broadcast"):
            side = F.broadcast(side)
        out = out.join(side, dim["on"], dim.get("how", "inner"))
    return out
