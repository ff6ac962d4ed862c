"""Event-sequence analytics: funnel, cohort retention, time rollup,
per-group deterministic sampling, and distribution monitoring (z-score
outliers, PSI drift).

Reference basis: the reference's users compose these from its delegated SQL
surface (popelines/main.py:236-243 ``bq_query``); here they are first-class
operators with 100 TB-safe plans.

Scale shapes (the one-line audit per operator):
 - ``funnel``       — per-step keyed agg + equi-join on the user key; each
   step's input is the (shrinking) survivor set of the previous step, so
   shuffle volume is monotonically decreasing down the funnel.
 - ``retention``    — two keyed shuffles (first-touch agg, cohort-cell agg);
   no window, no driver data.
 - ``time_rollup``  — coarse grains aggregate the FINER grain's partials,
   never rescanning the raw table (classic rollup reuse); exactness kept by
   carrying decimal accumulators between grains.
 - ``sample_per_group`` — one keyed window; survivor choice is a
   multiplicative id-hash (no RNG) so retries/AQE re-runs keep identical
   rows (ARCHITECTURE.md ground rule 4).
 - ``zscore_outliers`` / ``psi_terms`` — tiny per-group stats frame
   broadcast back against the full table: one shuffle for stats, zero for
   the scoring pass.

Cross-engine float rule (tools/parity.py): all multi-row accumulation is
decimal-exact, then cast to double; per-row arithmetic after that is IEEE
and bit-identical in Spark and DuckDB (queries/_util.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.plans.inspect import checkpoint

# Single source of the fixed-salt multiplicative-hash constants (their SQL
# literals appear in the c_sample_per_group / mixture / split oracles —
# importing keeps every consumer in lockstep).
from popelines_spark.llm.mix import _FOLD, _KNUTH  # noqa: E402

#: Exact accumulator for 2dp metric doubles ≤ ~1e7 (events.value).
_DEC = "decimal(12,4)"


def id_hash(col: Column) -> Column:
    """Deterministic pseudo-random BIGINT in [0, 1e9+7) from an id column.

    No RNG and no xxhash64: this exact arithmetic is mirrorable in any
    ANSI engine, so oracles and retried tasks agree bit-for-bit.
    """
    folded = F.pmod(col.cast("long"), F.lit(_FOLD))
    return F.pmod(folded * F.lit(_KNUTH), F.lit(1000000007))


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered-funnel counts: one row per step with the number of users who
    completed steps[0..i] in strictly increasing event-time order.

    Semantics: a user reaches step i when they have an event of type
    ``steps[i]`` STRICTLY after their earliest completion time of step i-1
    (the standard min-time funnel chaining — earliest completion is optimal,
    so this is exact, not greedy).

    Plan: step 0 is a keyed min-agg; each later step is a pushed-down type
    filter joined to the previous survivor set (shrinking), re-aggregated on
    the same key — AQE reuses the hash partitioning across the chain. The
    per-step count rows are unioned lazily; nothing is collected.
    """
    if not steps:
        raise ValueError("funnel: need at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    cur = checkpoint(cur, "funnel-stage0", eager=False)
    out = []
    for i, step in enumerate(steps):
        if i:
            # Each stage feeds BOTH its count branch and the next stage —
            # barrier it (|survivors| rows) or the count union re-executes
            # the whole prefix chain per step.
            cur = checkpoint(
                events.filter(F.col(type_col) == step)
                .join(cur.select(user_col, "__t"), user_col)
                .filter(F.col(ts_col) > F.col("__t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t")),
                "funnel-stage", eager=False,
            )
        out.append(
            cur.agg(F.count("*").cast("long").alias("n_users")).select(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def retention(events: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset) → distinct users.

    cohort_week = ISO-week truncation of the user's first event;
    week_offset = whole 7-day periods between first event and the activity
    event (exact integer microsecond math — no calendar ambiguity).
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first"))
    usec_week = 7 * 86400 * 1_000_000
    return (
        events.join(first, user_col)
        .select(
            F.col(user_col),
            F.date_trunc("week", F.col("__first")).alias("cohort_week"),
            F.floor(
                (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__first")))
                / usec_week
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("n_users"))
    )


def time_rollup(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    grains: Sequence[str] = ("hour", "day"),
) -> DataFrame:
    """Multi-resolution time rollup: one output row per (grain, bucket_ts)
    with event count and exact value sum.

    ``grains`` must be ordered fine → coarse; each coarser grain aggregates
    the PREVIOUS grain's partial aggregates (hypertable-style rollup reuse):
    the raw table is scanned once, and every coarser level runs over
    |buckets| rows, not |events|. Decimal accumulators flow between levels
    so the double emitted at the end is bit-exact at every grain.
    """
    if not grains:
        raise ValueError("time_rollup: need at least one grain")
    order = {g: i for i, g in enumerate(
        ("second", "minute", "hour", "day", "week", "month", "quarter", "year")
    )}
    unknown = [g for g in grains if g not in order]
    if unknown:
        raise ValueError(f"time_rollup: unknown grain(s) {unknown}")
    if any(order[a] >= order[b] for a, b in zip(grains, grains[1:])):
        # out-of-order grains would silently mislabel: date_trunc('hour')
        # over day-truncated buckets is a no-op, not an hourly rollup.
        raise ValueError(f"time_rollup: grains must be fine→coarse, got {grains}")
    if "week" in grains[:-1]:
        # ISO weeks do not NEST inside months/quarters/years: the
        # cascading coarsen maps a whole week to date_trunc(coarser,
        # week_start), so events from Feb 1-4 in a week starting Jan 29
        # would be counted into JANUARY's monthly row — silent wrong
        # output (review r12). Weeks may only terminate a chain.
        raise ValueError(
            "time_rollup: 'week' can only be the LAST grain — ISO weeks "
            "straddle month/quarter/year boundaries, so no coarser grain "
            "nests them; run a separate rollup for calendar grains"
        )
    level = (
        events.groupBy(F.date_trunc(grains[0], F.col(ts_col)).alias("bucket_ts"))
        .agg(
            F.count("*").cast("long").alias("__n"),
            F.sum(F.col(value_col).cast(_DEC)).alias("__s"),
        )
    )
    if len(grains) > 1:
        # The finest grain feeds BOTH its own output branch and every
        # coarser level; Spark does not CSE across union branches, so
        # without a barrier the raw scan+agg would re-execute per grain.
        # |buckets| rows — the checkpoint is tiny.
        level = checkpoint(level, "rollup-finest-grain", eager=False)
    outs = [
        level.select(
            F.lit(grains[0]).alias("grain"),
            "bucket_ts",
            F.col("__n").alias("n_events"),
            F.col("__s").cast("double").alias("sum_value"),
        )
    ]
    for g in grains[1:]:
        level = (
            level.groupBy(F.date_trunc(g, F.col("bucket_ts")).alias("bucket_ts"))
            .agg(F.sum("__n").cast("long").alias("__n"), F.sum("__s").alias("__s"))
        )
        outs.append(
            level.select(
                F.lit(g).alias("grain"),
                "bucket_ts",
                F.col("__n").alias("n_events"),
                F.col("__s").cast("double").alias("sum_value"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def sample_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-group sample: keep the k rows with the smallest
    multiplicative id-hash in each group (ties broken by the id itself).

    The distributed form of reservoir sampling with a fixed seed: hash
    order is a uniform pseudo-random permutation, identical across retries,
    partitionings, and engines. One keyed window shuffle; no RNG state.
    """
    from popelines_spark.operators.keyed import keep_first

    return keep_first(
        df, [group_col], [id_hash(F.col(id_col)), F.col(id_col)], k
    )


def time_to_convert(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
) -> DataFrame:
    """Conversion-latency distribution per weekly cohort: for users whose
    earliest ``to_type`` event follows their earliest ``from_type`` event,
    the median and p90 of the gap in seconds, grouped by the cohort week of
    the ``from_type`` event.

    Exact (not approximate) percentiles: both engines linearly interpolate
    between the two neighboring order statistics of exact integer
    microsecond gaps — the arithmetic is two BIGINTs and one IEEE division,
    so cross-engine hashes match. Exact grouped percentiles sort within the
    (small) cohort groups only — no global sort; at extreme per-cohort
    cardinalities the same query runs with approx_percentile and a widened
    tolerance oracle (the b_agg_approx_quantile pattern).
    """
    first_from = (
        events.filter(F.col(type_col) == from_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t0"))
    )
    first_to = (
        events.filter(F.col(type_col) == to_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t1"))
    )
    gaps = (
        first_from.join(first_to, user_col)
        .filter(F.col("__t1") > F.col("__t0"))
        .select(
            F.date_trunc("week", F.col("__t0")).alias("cohort_week"),
            (
                (F.unix_micros("__t1") - F.unix_micros("__t0")) / 1e6
            ).alias("__gap_s"),
        )
    )
    return gaps.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.expr("percentile(__gap_s, 0.5)"), 6).alias("median_s"),
        F.round(F.expr("percentile(__gap_s, 0.9)"), 6).alias("p90_s"),
    )


def zscore_outliers(
    df: DataFrame, group_col: str, value_col: str, threshold: float
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` standard deviations
    from their group mean; emits the z-score.

    Population moments from decimal-exact sums (sum, sum-of-squares, count)
    so mean/std are bit-identical cross-engine; the per-row z is then plain
    IEEE arithmetic. Stats frame is |groups| rows → broadcast join back.
    """
    vq = F.col(value_col).cast(_DEC)
    stats = df.groupBy(group_col).agg(
        F.sum(vq).cast("double").alias("__s"),
        F.sum(vq * vq).cast("double").alias("__s2"),
        F.count(value_col).cast("double").alias("__n"),
    )
    mean = F.col("__s") / F.col("__n")
    var = F.col("__s2") / F.col("__n") - mean * mean
    # One-pass variance can land an ulp BELOW zero for constant or
    # single-row groups (float(v·v) - float(v)·float(v) ≈ -1e-11): sqrt
    # would be NaN, and NaN > threshold is TRUE under Spark's NaN-high
    # ordering — every row of the group would emit as an "outlier". Guard
    # the whole z expression on var > 0 (identical IEEE bits on both
    # engines, so the boundary decision matches the oracle); a zero-
    # variance group has no deviation and therefore no outliers.
    z = F.when(var > 0, (F.col(value_col) - mean) / F.sqrt(var))
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn("zscore", z)
        .filter(F.col("zscore").isNotNull() & (F.abs(F.col("zscore")) > threshold))
        .drop("__s", "__s2", "__n")
    )


def ab_test(
    events: DataFrame,
    user_col: str,
    type_col: str,
    convert_type: str,
    variant: Column,
) -> DataFrame:
    """Two-proportion z-test between two experiment arms: per-user
    conversion (any ``convert_type`` event), arms assigned by ``variant``
    (a boolean column over the user grain — deterministic splits only, e.g.
    ``user_id % 2 = 1``, never RNG).

    One row: arm sizes, conversions, rates, and the pooled two-proportion
    z statistic. Everything is exact integer counts + IEEE division/sqrt,
    so the statistic is bit-identical cross-engine; the degenerate pooled
    rates (0 or 1 — zero variance) yield NULL z on both engines via an
    identical guarded branch.

    Plan: one keyed agg to the user grain, then a single conditional
    aggregate — two shuffles total, output is one row.
    """
    per_user = (
        events.groupBy(user_col)
        .agg(
            F.max(F.when(F.col(type_col) == convert_type, 1).otherwise(0)).alias(
                "__conv"
            )
        )
        .withColumn("__b", variant)
    )
    agg = per_user.agg(
        F.count_if(~F.col("__b")).cast("long").alias("n_a"),
        F.count_if(F.col("__b")).cast("long").alias("n_b"),
        F.sum(F.when(~F.col("__b"), F.col("__conv"))).cast("long").alias("conv_a"),
        F.sum(F.when(F.col("__b"), F.col("__conv"))).cast("long").alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        F.round(
            F.when((pool > 0) & (pool < 1), (p_a - p_b) / se), 6
        ).alias("z"),
    )


def psi_terms(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split: Column,
    n_buckets: int = 10,
    bucket_width: float = 50.0,
) -> DataFrame:
    """Population-stability-index terms per (group, value bucket) between
    the two halves of ``split`` (a boolean column: False = reference
    population, True = comparison population).

    Emits one row per (group, bucket) with both distributions' proportions
    and the PSI contribution (p-q)·ln(p/q) — per-bucket terms rather than a
    blind total so drift is attributable. Laplace-style +1 smoothing keeps
    empty buckets finite. Proportions come from exact integer counts; the
    single ln per row is per-row IEEE arithmetic.

    The smoothing runs over the FULL declared bucket grid (every group ×
    all ``n_buckets``): a bucket empty in BOTH halves still carries mass
    1/(n+n_buckets) on each side, and its term is nonzero whenever the
    halves' sizes differ — counting only observed buckets both dropped
    those terms and skewed every present bucket's denominator (review
    r12: caught by an independent numpy third engine; the DuckDB oracle
    mirrored the same observed-only logic, so parity never saw it).

    Plan: one groupBy over (group, bucket, side) left-joined onto the
    groups × buckets grid (|groups|·n_buckets rows, broadcast) — a
    single data shuffle sized |groups|·|buckets|.
    """
    bucket = F.least(
        F.greatest(F.floor(F.col(value_col) / bucket_width), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("long")
    observed = (
        df.select(F.col(group_col), bucket.alias("bucket"), split.alias("__cmp"))
        .groupBy(group_col, "bucket")
        .agg(
            F.count_if(~F.col("__cmp")).cast("long").alias("n_ref"),
            F.count_if(F.col("__cmp")).cast("long").alias("n_cmp"),
        )
    )
    spark = df.sparkSession
    grid = observed.select(group_col).distinct().crossJoin(
        spark.range(n_buckets).select(F.col("id").cast("long").alias("bucket"))
    )
    counted = (
        grid.join(F.broadcast(observed), [group_col, "bucket"], "left")
        .withColumn("n_ref", F.coalesce("n_ref", F.lit(0)))
        .withColumn("n_cmp", F.coalesce("n_cmp", F.lit(0)))
    )
    totals = W.partitionBy(group_col)
    p = (F.col("n_ref") + 1) / (F.sum(F.col("n_ref") + 1).over(totals))
    q = (F.col("n_cmp") + 1) / (F.sum(F.col("n_cmp") + 1).over(totals))
    return counted.select(
        group_col,
        "bucket",
        "n_ref",
        "n_cmp",
        p.alias("p_ref"),
        q.alias("p_cmp"),
        ((p - q) * F.log(p / q)).alias("psi_term"),
    )


def scd2_runs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 history from an observation stream:
    collapse each key's consecutive run of identical ``attr_col`` values
    into one versioned validity interval ``[valid_from, valid_to)`` —
    ``valid_to`` is NULL for the current (open) interval.  This is the
    dimension-history builder the reference's users hand-write in delegated
    SQL over change feeds (popelines/main.py:236).

    Classic gaps-and-islands: a ``lag`` marks rows where the attribute
    changed, a running ``sum`` of change markers numbers the islands, and a
    group-by per (key, island) collapses each run; ``lead`` of the island's
    start supplies the exclusive end.  Two windows and one aggregation, all
    partitioned by ``key_col`` — per-key work is bounded by that key's
    rows, so the shuffle profile matches c_sessionize and survives the
    scale-up (hot keys: operators/skew.py salting applies unchanged).

    Determinism: ordering is (ts, tiebreak) — unique by construction — on
    both engines, so island numbering and interval bounds are exact.
    """
    w = W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # NULL-safe change detection (review r12): the old
    # ``lag.isNull() | lag != attr`` form conflated "first row" with
    # "previous value NULL" — an X→NULL transition produced a NULL
    # marker (sum skips it, merging two distinct runs under one island
    # id) and NULL→NULL rows each started a new island. eqNullSafe
    # treats NULL as a value; the explicit first-row test starts every
    # key's numbering at 1.
    changed = (
        (F.row_number().over(w) == 1)
        | ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col))
    ).cast("int")
    islands = df.select(
        key_col, ts_col, attr_col, F.sum(changed).over(w).alias("__island")
    )
    runs = islands.groupBy(key_col, "__island", attr_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_obs"),
    )
    nxt = W.partitionBy(key_col).orderBy("__island")
    return runs.select(
        F.col(key_col),
        F.col(attr_col),
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        F.col("__island").cast("long").alias("version"),
        "n_obs",
    )


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
    n_lags: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key: over the
    ``n_lags`` most recent points (current + n_lags-1 lags), weights
    ``alpha * (1-alpha)^i`` renormalized over the lags that exist.

    Truncation is what makes this an exact, SQL-checkable window operator:
    the untruncated recurrence needs per-row sequential state (a stream
    fold), while the truncated form is ``n_lags`` ``lag()`` reads inside
    ONE keyed window — stays in whole-stage codegen, shuffles once on
    ``key_col``. Weights are Python-float literals injected into the plan,
    and the weighted sum is accumulated in ascending lag order on both
    engines, so the IEEE arithmetic matches bit-for-bit.

    ``round_dp`` caveat (found by the sf1.0 parity spot-check): pick it so
    magnitude × 10^round_dp stays well under ~12 significant digits.
    Rounding a double whose exact decimal expansion sits within one ulp of
    a .5·10^-dp boundary diverges between engines (Spark rounds the exact
    BigDecimal expansion, DuckDB rounds after float scaling); the per-row
    probability is ≈ ulp(x)·10^dp, i.e. ~5e-4 at 4e6 magnitude with dp=6 —
    real divergence observed at sf1.0 — but ~5e-8 with dp=2.
    """
    w = W.partitionBy(key_col).orderBy(order_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(n_lags):
        wt = alpha * (1.0 - alpha) ** i
        x = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        num = num + F.when(x.isNotNull(), F.lit(wt) * x).otherwise(F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return df.select(
        key_col,
        order_col,
        F.round(num / den, round_dp).alias(f"ewma_{value_col}"),
    )
