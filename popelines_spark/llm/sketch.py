"""Frequency / membership sketches as plain keyed DataFrame ops.

Two classic 100 TB primitives, built DIY so they are deterministic and
value-replayable in ANSI SQL (the builtin `count_min_sketch` aggregate has
no SQL-side estimator, and `bloom_filter_agg`/`might_contain` are
Catalyst-internal runtime-filter expressions, not user functions):

 - **Count-min sketch**: d×w counter grid; counters are SUMS, so the
   merge is commutative — the sketch is partitioning- and retry-invariant
   with no extra care. `estimate = min_j grid[j][h_j(x)]` never
   undercounts (every counter is count(x) + nonneg collision mass).
 - **Bloom filter**: m-bit bitmap packed 32 bits per BIGINT word (DuckDB
   raises on `1::BIGINT << 63`, so 32-bit packing keeps the oracle
   replayable); `bit_or` is likewise commutative. A key passes iff all k
   probe bits are set — no false negatives by construction. This is the
   DIY spelling of what Catalyst's runtime bloom-filter join injects
   automatically: build on the small/selective side, broadcast the
   bitmap, drop fact rows BEFORE they reach the shuffle.

Hashing is md5-derived (`conv(substring(md5(salt:key),1,8),16,10)`) —
slower than xxhash64 but EXACTLY mirrorable in DuckDB
(`('0x'||substring(md5(...),1,8))::BIGINT`), which is what turns these
sketches from rows-only demos into hash-checked queries. Pipelines that
never need SQL replay can swap `_bucket` for xxhash64 wholesale.

Scale shape:
 - build: one explode (×d or ×k salts) + one groupBy over AT MOST d·w or
   m/32 distinct keys — the aggregate output is a few hundred rows no
   matter the corpus size, and map-side partial aggregation collapses
   the exploded stream before it ships.
 - probe: broadcast-join the tiny sketch table; the probed relation
   streams through one narrow pass, no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits packed per BIGINT bitmap word (see module docstring).
WORD_BITS = 32


def _bucket(col: Column, salt: int, m: int) -> Column:
    """md5-derived hash of ``salt:key`` folded into [0, m) — bit-identical
    in Spark and DuckDB (both emit lowercase md5 hex and identical
    integer-to-string casts)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m))


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of the values in ``col`` → (j, bucket, c) counter
    rows (≤ depth·width of them). One explode(×depth) + one groupBy whose
    partial aggregates collapse map-side; the shuffled stream is bounded
    by depth·width per input partition, not by the corpus."""
    c = F.col(col)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _bucket(c, j, width).alias("bucket")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.bucket")
    return rows.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "cms_est",
) -> DataFrame:
    """Attach ``out_col`` = min_j counters[j][h_j(probe)] to ``probes``.
    The counter table is broadcast (≤ depth·width rows); estimates never
    undercount the true frequency. An absent counter row means nothing ever
    hashed there → that counter is 0, so the join is LEFT and a miss pins
    the estimate to 0 (never-seen keys estimate 0 unless every one of
    their depth buckets collides)."""
    from popelines_spark.plans.inspect import checkpoint

    c = F.col(col)
    # pin a per-row id and regroup on IT, not on probes' own columns —
    # grouping on the full row collapsed duplicate probe rows and failed
    # outright on map-typed columns (review r12); the explode now carries
    # only the id, and the id assignment is checkpointed so the final
    # self-join sees the same ids on both branches
    base = checkpoint(
        probes.withColumn("__probe_row", F.monotonically_increasing_id()),
        "cms-probe-rows",
        eager=False,
    )
    ppos = base.select(
        "__probe_row",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _bucket(c, j, width).alias("bucket")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb"),
    ).select("__probe_row", "jb.j", "jb.bucket")
    est = (
        ppos.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy("__probe_row")
        .agg(F.min(F.coalesce("c", F.lit(0).cast("long"))).alias(out_col))
    )
    return base.join(est, "__probe_row").drop("__probe_row")


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 16384, k: int = 3
) -> DataFrame:
    """Bloom bitmap of the values in ``col`` → (word, bits) rows
    (≤ m_bits/32 of them). bit_or partial aggregates collapse map-side;
    the result is a broadcastable few-KB table."""
    c = F.col(col)
    pos = df.select(
        F.explode(
            F.array(*[_bucket(c, j, m_bits) for j in range(k)])
        ).alias("pos")
    )
    return pos.select(
        (F.col("pos") / WORD_BITS).cast("long").alias("word"),
        F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))").alias("w1"),
    ).groupBy("word").agg(F.bit_or("w1").alias("bits"))


def bloom_probe(
    bitmap: DataFrame,
    df: DataFrame,
    col: str,
    m_bits: int = 16384,
    k: int = 3,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Attach ``out_col`` (true iff every probe bit is set) to ``df``.

    The bitmap is broadcast; the probed side streams through one narrow
    explode(×k) + left-join + groupBy-its-own-columns pass. A missing
    bitmap word means those bits were never set → the coalesce(FALSE).
    No false negatives: members set exactly these bits at build time."""
    from popelines_spark.plans.inspect import checkpoint

    c = F.col(col)
    # per-row id instead of grouping on the full row — see cms_estimate
    # (review r12: duplicate probe rows collapsed; map columns failed)
    base = checkpoint(
        df.withColumn("__probe_row", F.monotonically_increasing_id()),
        "bloom-probe-rows",
        eager=False,
    )
    ppos = base.select(
        "__probe_row",
        F.explode(
            F.array(*[_bucket(c, j, m_bits) for j in range(k)])
        ).alias("pos"),
    )
    hit = (
        ppos.withColumn("word", (F.col("pos") / WORD_BITS).cast("long"))
        .join(F.broadcast(bitmap), "word", "left")
        .withColumn(
            "__bit_set",
            F.coalesce(
                F.expr(
                    f"(bits & shiftleft(1L, cast(pos % {WORD_BITS} as int))) != 0"
                ),
                F.lit(False),
            ),
        )
    )
    est = hit.groupBy("__probe_row").agg(F.min("__bit_set").alias(out_col))
    return base.join(est, "__probe_row").drop("__probe_row")


# --- Misra-Gries heavy hitters (two-pass, mergeable candidates) ----------


def misra_gries_candidates(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``df[col]`` → one
    bounded candidate-term frame (``term`` column, ≤ capacity rows per
    input partition).

    The classic streaming frequent-items sketch as an Arrow-batched
    partition fold: each partition keeps ≤ ``capacity`` counters; on
    overflow every counter is decremented (at most n_p/(capacity+1)
    decrement rounds), so any item with partition count
    > n_p/(capacity+1) is guaranteed to survive. Union-of-candidates
    across partitions therefore contains every item with GLOBAL count
    > N/(capacity+1) (averaging argument: an item below that bar in
    every partition is below it globally).

    The candidate SET depends on partitioning — callers must treat it as
    a superset and re-count exactly (see ``heavy_hitters``); that second
    pass is what makes the operator's OUTPUT partitioning-invariant and
    oracle-checkable.

    The fold is VECTORIZED: each Arrow batch collapses to per-term
    counts in C (``value_counts``), then merges into the running
    counters at vocabulary granularity; on overflow the
    (capacity+1)-largest count is subtracted from every counter and
    non-positives drop — the Misra-Gries MERGE of the mergeable-
    summaries construction (Agarwal et al., PODS'12), whose deficit
    bound telescopes to ≤ n_p/(capacity+1) exactly like the one-at-a-
    time decrement. Python cost is per distinct-term-per-batch, never
    per token — at 100 TB the per-token loop is the difference between
    an Arrow-speed pass and a Python-speed one.

    Scale shape: one mapInPandas pass (no shuffle), output bounded by
    capacity × n_partitions rows regardless of corpus size."""
    import pandas as pd

    def fold(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for term, c in vc.items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > capacity:
                # subtract the (capacity+1)-th largest count everywhere;
                # ≥ capacity+1 counters hit zero or below and drop, so
                # ≤ capacity survive (MG merge, error adds telescopically)
                sub = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - sub for k, v in counters.items() if v > sub
                }
        yield pd.DataFrame({"term": list(counters.keys())})

    # cast at the boundary: the declared schema is 'term string', and a
    # numeric column's native values crash the Arrow conversion
    # (review r12); heavy_hitters compares on the same cast
    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        fold, schema="term string"
    )


def heavy_hitters(
    df: DataFrame, col: str, denom: int, capacity: int | None = None
) -> DataFrame:
    """Exact heavy hitters: terms with count·denom > N (frequency above
    1/denom of the stream), found WITHOUT a full-vocabulary shuffle.

    Pass 1 (misra_gries_candidates, capacity defaults to 2·denom ≥ the
    guarantee bar) yields a bounded candidate superset with no shuffle;
    pass 2 exact-counts ONLY the broadcast candidates and applies the
    integer cross-multiplied threshold (no float division), so the
    result is exactly the true heavy-hitter set — the sketch bounds the
    work, not the answer.

    At 100 TB this is the only viable shape: the full-vocab groupBy that
    an exact one-pass answer needs shuffles billions of distinct terms,
    while this shuffles ≤ capacity × n_partitions candidate rows."""
    capacity = capacity or 2 * denom
    if capacity < denom - 1:
        raise ValueError(
            f"heavy_hitters: capacity={capacity} voids the guarantee — "
            f"Misra-Gries with k counters only preserves items above "
            f"N/(k+1), so catching every item above N/{denom} needs "
            f"capacity >= {denom - 1} (review r12)"
        )
    cand = misra_gries_candidates(df, col, capacity).distinct()
    total = df.where(F.col(col).isNotNull()).agg(
        F.count(col).cast("long").alias("total")
    )
    return (
        df.join(
            F.broadcast(cand),
            df[col].cast("string") == cand.term,
            "left_semi",
        )
        .groupBy(F.col(col).alias("term"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * denom > F.col("total"))
        .select("term", "cnt", "total")
    )
