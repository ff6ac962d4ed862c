"""Bloom-filter join pre-filtering — cut the big side's shuffle volume
before a selective equi-join.

The reference delegates joins to BigQuery, whose engine applies runtime
semi-join ("bloom") filters transparently; Spark only injects its own
runtime filters in narrow cases (`spark.sql.optimizer.runtimeFilter.*`).
This operator is the explicit, always-available form: build a bloom
bitmap from the SMALL side's join keys executor-side, broadcast it (it
is bounded by the bitmap size, NOT the dim row count), and pre-filter
the BIG side with pure JVM expressions before the real join runs.

Why it matters at 100 TB: a fact-to-filtered-dim join shuffles the whole
fact table even when only 1% of fact rows survive the join. The bloom
pre-filter drops non-matching fact rows at the SCAN (map side), so the
shuffle carries ~(hit rate + false-positive rate) of the fact table.
False positives are removed by the join itself — the rewrite is
semantically invisible (the registered query's oracle is the plain
join), false negatives are impossible (every true key sets its bits).

The rewrite is only valid for join types that cannot keep unmatched
big-side rows: pre-filtering the big side of a LEFT join silently drops
rows whose key misses the small side (they belong in the output with
NULLs). ``bloom_filter_join`` therefore refuses anything but
inner/left_semi/cross.

Plan shape: the bitmap build is one keyed aggregation of the dim side's
bit positions into ≤ m/64 (word, bits) rows, folded to a single
map<long,long> row; the probe is a broadcast of that one row plus
per-row xxhash64 — no Python, no driver collect, whole-stage codegen
throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default bitmap size: 2^20 bits = 16 Ki words = 128 KiB broadcast.
DEFAULT_M_BITS = 1 << 20

#: Hash-seed family for the k probes (any distinct ints work; fixed so
#: results are deterministic across runs and engines).
DEFAULT_SEEDS = (0x9E37, 0x85EB, 0xC2B2, 0x27D4, 0x1656)

#: Join types for which dropping unmatched big-side rows pre-join cannot
#: change the result set.
_SAFE_HOW = {"inner", "left_semi", "leftsemi", "semi", "cross"}

#: Name for the broadcast bitmap column while it rides along the big
#: side (user columns can legitimately be called "bloom"; a big side
#: that already has THIS name is detected and worked around by
#: ``bloom_filter_join`` picking a longer unused name).
_BITMAP_COL = "__bloom_bitmap__"


def _bitmap_col_for(big: DataFrame) -> str:
    """A bitmap column name guaranteed absent from ``big``.

    Deterministic (no randomness): extend the default name with
    underscores until it no longer collides, so a big side that already
    carries ``__bloom_bitmap__`` can't produce a duplicate-column
    crossJoin / ambiguous reference."""
    name = _BITMAP_COL
    existing = set(big.columns)
    while name in existing:
        name += "_"
    return name


def _positions(key: Column, m_bits: int, seeds) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(int(s))), F.lit(m_bits))
        for s in seeds
    ]


def _one_shl(pos: Column) -> Column:
    """``1L << (pos % 64)`` as a Column.

    ``F.shiftleft`` in PySpark 4.x type-checks numBits as a Python int,
    so the column-shift form must go through the SQL function registry.
    """
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def bloom_bitmap(
    small: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    seeds=DEFAULT_SEEDS,
    out_col: str = _BITMAP_COL,
) -> DataFrame:
    """1-row DataFrame ``{out_col: map<long,long>}`` — the OR of
    every key's k bit positions, grouped into 64-bit words. Build cost:
    one shuffle of k·|small| ints into ≤ m/64 groups."""
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, seeds))).alias(
        "pos"
    )
    # distinct (word, bit) first so the SUM below is an exact bitwise OR
    distinct_bits = (
        small.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            _one_shl(F.col("pos")).alias("bit"),
        )
        .distinct()
        .groupBy("word")
        .agg(F.sum("bit").cast("long").alias("bits"))
    )
    return distinct_bits.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias(out_col)
    )


def bloom_might_contain(
    key: Column, bloom: Column, m_bits: int = DEFAULT_M_BITS,
    seeds=DEFAULT_SEEDS,
) -> Column:
    """True iff every probe bit for ``key`` is set in ``bloom``."""
    cond = F.lit(True)
    for p in _positions(key, m_bits, seeds):
        word = (p / 64).cast("long")
        bit = _one_shl(p)
        cond = cond & (
            F.coalesce(F.element_at(bloom, word), F.lit(0)).bitwiseAND(bit)
            != 0
        )
    return cond


#: Bitmap sizing: ~16 bits per expected key keeps the k=5 false-positive
#: rate ≈ 1% (p = (1 - e^(-k·n/m))^k); clamped so the broadcast payload
#: stays between 128 KiB and 16 MiB.
_BITS_PER_KEY = 16
_MIN_M_BITS = 1 << 20
_MAX_M_BITS = 1 << 27


def size_bitmap(expected_keys: int) -> int:
    """Power-of-two bitmap size (bits) for ``expected_keys`` distinct keys."""
    want = max(_MIN_M_BITS, _BITS_PER_KEY * max(1, int(expected_keys)))
    m = _MIN_M_BITS
    while m < want and m < _MAX_M_BITS:
        m <<= 1
    return m


def plan_runtime_filter(
    big_stats: dict | None,
    small_stats: dict | None,
    on: str,
    how: str = "inner",
    max_key_ratio: float = 0.5,
) -> dict | None:
    """Decide FROM AT-REST STATS (io.analyze_table ``_stats.json``)
    whether a bloom pre-filter pays for itself on ``big JOIN small``.

    Returns ``None`` (leave the join alone) or ``{"m_bits": ..,
    "reason": ..}`` — the parameters ``bloom_filter_join`` should use.
    The reference's engine (BigQuery) applies this runtime semi-join
    filter transparently; this is the planner half of that behavior,
    driven by the same statistics ANALYZE collects (popelines delegates
    the decision to BigQuery via bq_query — main.py:240).

    Apply only when ALL hold:
      - ``how`` cannot keep unmatched big-side rows (inner/semi/cross);
      - both stats exist and carry NDV for the key column;
      - the small side is NOT broadcastable (``suggest_broadcast`` False)
        — a broadcast-hash join already filters map-side for free, the
        bitmap would only duplicate it;
      - the small side's key NDV ≤ ``max_key_ratio`` × the big side's key
        NDV — i.e. the filter is SELECTIVE: expected surviving fraction
        of the big shuffle ≈ ndv_small/ndv_big under uniform keys, so
        below 0.5 the prefilter at least halves the shuffle volume.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SAFE_HOW
    }:
        return None
    if not big_stats or not small_stats:
        return None
    try:
        big_ndv = int(big_stats["columns"][on]["approx_ndv"])
        small_ndv = int(small_stats["columns"][on]["approx_ndv"])
    except (KeyError, TypeError, ValueError):
        return None
    if small_stats.get("suggest_broadcast", False):
        return None
    if big_ndv <= 0 or small_ndv <= 0:
        return None
    ratio = small_ndv / big_ndv
    if ratio > max_key_ratio:
        return None
    return {
        "m_bits": size_bitmap(small_ndv),
        "reason": (
            f"key NDV {small_ndv}/{big_ndv} = {ratio:.3f} ≤ "
            f"{max_key_ratio} and dim not broadcastable"
        ),
    }


def bloom_filter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int = DEFAULT_M_BITS,
    seeds=DEFAULT_SEEDS,
    final_join_hint: str | None = None,
) -> DataFrame:
    """``big JOIN small ON big[on] = small[on]`` with a bloom pre-filter
    on the big side. Results are identical to the plain join (the join
    removes bloom false positives; false negatives cannot occur).

    Only inner/left_semi/cross are accepted: any join type that keeps
    unmatched big-side rows (left/full/anti/...) would lose those rows
    to the pre-filter.

    ``final_join_hint`` (e.g. ``"merge"``) is applied to the small side
    of the FINAL join only — never to the bitmap-build subtree, where it
    would be overridden by the bitmap's own broadcast hint (Spark logs a
    HintErrorLogger warning for every overridden hint)."""
    ensure_prefilter_safe(how)
    pre = bloom_prefilter(big, small, on, m_bits, seeds)
    if final_join_hint is not None:
        small = small.hint(final_join_hint)
    return pre.join(small, on, how)


def ensure_prefilter_safe(how: str) -> None:
    """Raise unless ``how`` is a join type for which dropping unmatched
    big-side rows pre-join cannot change the result set."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SAFE_HOW
    }:
        raise ValueError(
            f"bloom pre-filter: how={how!r} can keep unmatched big-side "
            "rows, which the pre-filter would drop; use one of "
            f"{sorted(_SAFE_HOW)} or a plain join"
        )


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = DEFAULT_M_BITS,
    seeds=DEFAULT_SEEDS,
) -> DataFrame:
    """``big`` minus rows whose ``on`` key definitely misses ``small`` —
    the filter half of ``bloom_filter_join``, exposed so other rewrites
    (e.g. a salted join on a skewed fact) can compose with it. May keep
    bloom false positives: only follow with an operation that removes
    non-matching keys anyway (an inner/semi join on ``on``)."""
    bitmap_col = _bitmap_col_for(big)
    bitmap = bloom_bitmap(small.select(on), on, m_bits, seeds, bitmap_col)
    return big.crossJoin(F.broadcast(bitmap)).filter(
        bloom_might_contain(F.col(on), F.col(bitmap_col), m_bits, seeds)
    ).drop(bitmap_col)
