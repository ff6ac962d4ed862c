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

``plan_star_join`` lifts the same decisions to N-dimension star joins
and adds the one decision a 2-way planner can't make: LEG ORDER
(most-selective inner dims first, non-filtering left legs last).
``estimate_stats`` produces the same stats shape from a live DataFrame
in one aggregation pass, for frames with no at-rest ``_stats.json``.
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
    for label, s in (("big", big_stats), ("small", small_stats)):
        if s and s.get("stale"):
            # stale stats still beat none (appends only grow a table, so
            # NDV/size are lower bounds) — but the decision record must
            # say so, or explain_join silently plans on old numbers
            decision["reasons"].append(
                f"warning: {label}-side stats are stale (appends since "
                "ANALYZE) — re-run analyze_table"
            )
    broadcastable = bool(small_stats and small_stats.get("suggest_broadcast"))
    if broadcastable:
        decision["broadcast"] = True
        decision["reasons"].append(
            "small side under the broadcast threshold "
            f"(est_memory_bytes={small_stats.get('est_memory_bytes')})"
        )

    if runtime_filter is True and decision["broadcast"]:
        # the module contract: a broadcastable small side short-circuits
        # bloom — the broadcast-hash join filters map-side for free, so
        # building a bitmap duplicates that work (review r12: the forced
        # flag used to leave BOTH set and join_tables built a pointless
        # bitmap plus a per-row hash over the whole fact scan)
        decision["reasons"].append(
            "bloom prefilter skipped: broadcast join filters map-side"
        )
    elif runtime_filter is True:
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
    if not (
        decision["broadcast"]
        or decision["bloom_m_bits"] is not None
        or decision["salt_buckets"] is not None
    ):
        decision["reasons"].append("no rewrite: left to Catalyst/AQE")
    return decision


_STAR_HOW = {"inner", "left", "leftouter"}


def plan_star_join(
    fact_stats: dict | None,
    dims: list[dict],
    runtime_filter: bool | str = False,
    skew: bool | str = False,
    shuffle_partitions: int = 200,
) -> dict:
    """Order and strategize ``fact ⋈ dim₁ ⋈ … ⋈ dimₙ`` from at-rest stats.

    ``dims``: ``[{"name": str, "on": str, "how": "inner"|"left",
    "stats": dict | None}, ...]`` — one leg per dimension, ``on`` naming
    the shared join column, ``stats`` from ``io.analyze_table`` /
    ``estimate_stats`` (or None: no information).

    Returns ``{"order": [leg names, planned order], "legs": {name:
    plan_join decision + "selectivity"}, "reasons": [...]}`` for
    ``operators/star.star_join``.

    Ordering rule (the cost model, in one line): an INNER leg keeps
    ≈ ``dim_key_NDV / fact_key_NDV`` of the fact's rows (uniform-keys
    estimate, the same one ``plan_runtime_filter`` uses), so inner legs
    run most-selective-first — every later leg shuffles/probes only the
    survivors — and LEFT legs, which never filter, run last in user
    order. Legs without NDV stats assume selectivity 1.0 and keep their
    user order after the estimated ones (stable sort). RIGHT/FULL legs
    raise: they change the fact row set in order-dependent ways.

    Per-leg strategy is ``plan_join`` unchanged: broadcast for
    under-threshold dims; ``runtime_filter="auto"`` adds the bloom
    prefilter for selective non-broadcastable INNER legs (never LEFT —
    the prefilter would drop unmatched fact rows a left join must keep).
    OFF by default, same opt-in contract as ``join_tables``: the probe
    costs O(fact rows) of pure-CPU xxhash64 per leg, which pays when the
    exchange's network/disk volume is the constraint (measured at sf1.0:
    one bloom leg cuts the first exchange 6.0M → 0.58M rows, both legs
    → 0.23M — see BASELINE.md round-10 star-join evidence) and costs
    when the shuffle is in-memory-local.

    ``skew="auto"`` (also opt-in, INNER legs only — ``salted_join``
    replicates the dim ×buckets, which a left leg would double-count)
    salts a leg when the fact's ``keys[on]`` profile from
    ``analyze_table(key_columns=[...])`` shows a hot key overflowing one
    reducer's even share — the same ``plan_skew_salt`` gate as
    ``join_tables``. Note ``estimate_stats`` does not build key
    profiles; skew legs need at-rest ANALYZE stats.
    """
    fact_cols = (fact_stats or {}).get("columns", {})
    legs: dict[str, dict] = {}
    inner_order: list[tuple[float, int, str]] = []
    left_order: list[str] = []
    reasons: list[str] = []
    for i, d in enumerate(dims):
        name, on = d["name"], d["on"]
        if name in legs:
            raise ValueError(f"plan_star_join: duplicate leg name {name!r}")
        how = d.get("how", "inner")
        hnorm = how.lower().replace("_", "")
        if hnorm not in _STAR_HOW:
            raise ValueError(
                f"plan_star_join: leg {name!r} has how={how!r}; only "
                "inner/left legs commute safely in a star — join "
                "right/full shapes explicitly in the order you mean"
            )
        is_inner = hnorm == "inner"
        fact_ndv = (fact_cols.get(on) or {}).get("approx_ndv")
        dim_ndv = (
            ((d.get("stats") or {}).get("columns", {}).get(on) or {})
        ).get("approx_ndv")
        # `is not None`, not truthiness: dim NDV 0 (empty / filtered-to-
        # empty dim) is the MOST selective leg there is — a falsy check
        # would misfile it as "no stats" and order it last
        if (
            is_inner
            and fact_ndv is not None
            and dim_ndv is not None
            and int(fact_ndv) > 0
        ):
            sel = min(1.0, int(dim_ndv) / int(fact_ndv))
            sel_why = (
                f"≈{sel:.0%} of fact keys survive "
                f"(dim NDV {dim_ndv} / fact NDV {fact_ndv})"
            )
        elif is_inner:
            sel = 1.0
            sel_why = "no key NDV stats: assume non-selective"
        else:
            sel = 1.0
            sel_why = "left join keeps every fact row"
        leg = plan_join(
            fact_stats,
            d.get("stats"),
            on,
            how,
            runtime_filter=runtime_filter if is_inner else False,
            skew=skew if is_inner else False,
            shuffle_partitions=shuffle_partitions,
        )
        leg["selectivity"] = sel
        leg["how"] = how
        legs[name] = leg
        if is_inner:
            inner_order.append((sel, i, name))
        else:
            left_order.append(name)
        reasons.append(f"{name}: {sel_why}; {'; '.join(leg['reasons'])}")
    order = [name for _, _, name in sorted(inner_order)] + left_order
    reasons.insert(
        0,
        "order: inner legs most-selective-first, left legs last "
        f"→ {' → '.join(order) if order else '(no legs)'}",
    )
    return {"order": order, "legs": legs, "reasons": reasons}


def estimate_stats(
    df,
    keys: list[str] | None = None,
    broadcast_threshold_bytes: int = 10 << 20,
) -> dict:
    """A stats dict in the ``io.analyze_table`` shape, computed from a
    live DataFrame in ONE aggregation pass — for planning joins over
    frames that have no at-rest ``_stats.json`` (mid-pipeline results,
    ad-hoc scans). Collects exactly one row regardless of table size.

    ``keys``: columns to record ``approx_ndv`` for (default: none —
    rows/size only). ``est_memory_bytes`` is rows × an in-memory row
    width from the schema (fixed widths per primitive; strings use the
    measured average length + object overhead) — the same decoded-size
    framing ``analyze_table`` documents for broadcast decisions.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    keys = keys or []
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for k in keys:
        aggs.append(F.approx_count_distinct(k).alias(f"__ndv_{k}"))
    fixed = {
        T.BooleanType: 1,
        T.ByteType: 1,
        T.ShortType: 2,
        T.IntegerType: 4,
        T.FloatType: 4,
        T.DateType: 4,
        T.LongType: 8,
        T.DoubleType: 8,
        T.TimestampType: 8,
        T.TimestampNTZType: 8,
    }
    str_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
    ]
    for c in str_cols:
        aggs.append(
            F.coalesce(F.avg(F.length(c)), F.lit(0.0)).alias(f"__len_{c}")
        )
    row = df.agg(*aggs).collect()[0].asDict()
    rows = int(row["__rows"])
    width = 0.0
    for f in df.schema.fields:
        w = fixed.get(type(f.dataType))
        if w is not None:
            width += w
        elif isinstance(f.dataType, T.StringType):
            width += float(row[f"__len_{f.name}"]) + 20  # object overhead
        elif isinstance(f.dataType, T.DecimalType):
            width += 16
        else:
            width += 32  # struct/array/map/binary: coarse floor
    est = int(rows * width)
    return {
        "rows": rows,
        "est_memory_bytes": est,
        # est == 0 (empty frame) IS broadcastable — an empty build side
        # costs nothing to ship and short-circuits the join map-side
        "suggest_broadcast": est <= broadcast_threshold_bytes,
        "columns": {
            k: {"approx_ndv": int(row[f"__ndv_{k}"])} for k in keys
        },
    }


def estimate_stats_concurrent(
    specs: list[tuple], broadcast_threshold_bytes: int = 10 << 20
) -> list[dict]:
    """Run :func:`estimate_stats` for several frames CONCURRENTLY and
    return their stats dicts in input order. Each spec is ``(df, keys)``.

    A multi-leg star plan needs one stats pass per relation; issued
    sequentially each tiny one-row-collect job leaves the cluster idle
    while the driver round-trips (optimization guide §2.6 "overlap
    independent jobs"). A small thread pool overlaps them — the values
    are byte-identical to sequential calls (each pass is an isolated
    aggregation; r13 A/B: the 4-relation b_join_star_planned planning
    pass 1.15 s -> 0.94 s warm, more when the scheduler is cold).
    FIFO scheduling keeps later jobs back-filling the earlier jobs'
    stragglers, exactly the guide's pattern."""
    from concurrent.futures import ThreadPoolExecutor

    if len(specs) <= 1:
        return [
            estimate_stats(
                df, keys=keys,
                broadcast_threshold_bytes=broadcast_threshold_bytes,
            )
            for df, keys in specs
        ]
    with ThreadPoolExecutor(max_workers=min(4, len(specs))) as pool:
        return list(
            pool.map(
                lambda fk: estimate_stats(
                    fk[0], keys=fk[1],
                    broadcast_threshold_bytes=broadcast_threshold_bytes,
                ),
                specs,
            )
        )


def plan_shuffle_partitions(
    *all_stats: dict | None,
    target_partition_bytes: int = 128 << 20,
    max_partitions: int = 100_000,
) -> dict:
    """Recommend ``spark.sql.shuffle.partitions`` for an exchange over
    the given tables' at-rest stats — the "size your shuffle so
    partitions fit in executor memory" knob, made a decision function.

    The estimate: every listed table's decoded bytes
    (``est_memory_bytes``) transit the exchange, so partitions =
    ⌈total / target⌉, clamped to [1, ``max_partitions``]. 128 MiB
    default keeps a partition comfortably under typical executor task
    memory with room for the hash/sort structures on top. This is the
    PRE-AQE upper bound: with AQE on (the engine default) oversizing is
    self-correcting — ``coalescePartitions`` merges small outputs after
    the map stage — while undersizing is not (a too-big partition spills
    or OOMs and AQE can only split it for skew joins, not for aggs). So
    the advisor deliberately errs high; set it BEFORE the job, e.g.
    ``spark.conf.set("spark.sql.shuffle.partitions", plan["partitions"])``.

    Tables with no stats contribute 0 bytes and flag the estimate as a
    lower bound in ``reason``.
    """
    total = 0
    unknown = 0
    for s in all_stats:
        # `is not None`, not truthiness: a legitimately EMPTY table's
        # stats carry est_memory_bytes=0, which is an exact contribution,
        # not a missing one (review r12)
        if s and s.get("est_memory_bytes") is not None:
            total += int(s["est_memory_bytes"])
        else:
            unknown += 1
    n = max(1, min(max_partitions, -(-total // target_partition_bytes)))
    reason = (
        f"{total / (1 << 20):.0f} MiB estimated through the exchange / "
        f"{target_partition_bytes >> 20} MiB target = {n} partitions"
        " (pre-AQE upper bound; AQE coalesces down)"
    )
    if unknown:
        reason += f"; {unknown} input(s) had no stats — treat as a lower bound"
    return {"partitions": n, "est_bytes": total, "reason": reason}
