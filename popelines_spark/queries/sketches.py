"""SURVEY.md §2 B.4 — frequency / membership sketches (count-min, bloom).

Reference basis: the reference exposes sketch-backed frequency and
membership primitives on its delegated aggregate surface; here they are
rebuilt as plain keyed DataFrame ops (popelines_spark/llm/sketch.py) so the
whole computation — hashing included — replays bit-identically in DuckDB.
That is what lets the ESTIMATES themselves be hash-checked rather than
wrapped in a within-ε invariant: both engines run the same md5-derived
bucket function, the counter/bitmap merges are commutative integer
aggregates, and `min` over counters / `all bits set` over probes are
order-insensitive.

Scale shape (100 TB): the sketch tables are bounded by the sketch geometry
(depth·width counters, m/32 bitmap words) no matter the corpus size, so the
build is one map-side-collapsing groupBy and every probe is a broadcast
join — the big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.llm.sketch import (
    _bucket,
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)
from popelines_spark.registry import query
from popelines_spark.queries._util import T

# DuckDB spelling of sketch._bucket (md5 of "salt:key", first 8 hex digits
# as an integer, modulo m — all operands nonnegative so % == pmod).
_BUCKET = (
    "('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST({key} AS VARCHAR)), 1, 8))"
    "::BIGINT % {m}"
)


@query(
    "b_sketch_cms",
    oracle=f"""
    WITH js AS (SELECT unnest(range(4)) AS j),
    grid AS (
        SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT j, {_BUCKET.format(key="l_suppkey", m=1024)} AS bucket
            FROM lineitem, js
        )
        GROUP BY j, bucket
    ),
    probe AS (
        SELECT s_suppkey, j, {_BUCKET.format(key="s_suppkey", m=1024)} AS bucket
        FROM supplier, js
    ),
    est AS (
        SELECT s_suppkey, MIN(COALESCE(c, 0)) AS cms_est
        FROM probe LEFT JOIN grid USING (j, bucket)
        GROUP BY s_suppkey
    ),
    exact AS (
        SELECT l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey,
           CAST(cms_est AS BIGINT) AS cms_est,
           COALESCE(exact_cnt, 0) AS exact_cnt,
           cms_est >= COALESCE(exact_cnt, 0) AS never_undercounts
    FROM est LEFT JOIN exact USING (s_suppkey)
    """,
)
def b_sketch_cms(spark, sf_dir):
    """Count-min sketch of lineitem.l_suppkey frequencies, probed with every
    supplier key. The estimate column hash-matches the oracle because both
    engines compute the identical md5 grid; `never_undercounts` states the
    CMS guarantee (each counter = true count + nonnegative collision mass).

    Plan shape: build is explode(×4)+groupBy collapsing to ≤4096 counter
    rows map-side; the probe side broadcast-joins that grid — at 100 TB the
    lineitem stream is touched once, shuffle bounded by depth·width per
    input partition."""
    li = T(spark, sf_dir, "lineitem")
    sup = T(spark, sf_dir, "supplier").select("s_suppkey")
    grid = cms_build(li, "l_suppkey", depth=4, width=1024)
    est = cms_estimate(grid, sup, "s_suppkey", depth=4, width=1024)
    exact = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    return est.join(exact, "s_suppkey", "left").select(
        "s_suppkey",
        F.col("cms_est").cast("long").alias("cms_est"),
        F.coalesce("exact_cnt", F.lit(0).cast("long")).alias("exact_cnt"),
        (F.col("cms_est") >= F.coalesce("exact_cnt", F.lit(0))).alias(
            "never_undercounts"
        ),
    )


@query(
    "b_sketch_bloom",
    oracle=f"""
    WITH js AS (SELECT unnest(range(3)) AS j),
    member AS (
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bitmap AS (
        SELECT pos // 32 AS word,
               bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
        FROM (
            SELECT {_BUCKET.format(key="k", m=16384)} AS pos FROM member, js
        )
        GROUP BY word
    ),
    probe AS (
        SELECT DISTINCT o_custkey FROM orders
    ),
    ppos AS (
        SELECT o_custkey, {_BUCKET.format(key="o_custkey", m=16384)} AS pos
        FROM probe, js
    ),
    hit AS (
        SELECT o_custkey,
               MIN(COALESCE((bits & (1::BIGINT << CAST(pos % 32 AS INT))) != 0,
                            FALSE)) AS bloom_pass
        FROM ppos LEFT JOIN bitmap ON bitmap.word = ppos.pos // 32
        GROUP BY o_custkey
    )
    SELECT o_custkey,
           bloom_pass,
           EXISTS (SELECT 1 FROM member WHERE k = o_custkey) AS is_member,
           (NOT EXISTS (SELECT 1 FROM member WHERE k = o_custkey))
               OR bloom_pass AS no_false_negative
    FROM hit
    """,
)
def b_sketch_bloom(spark, sf_dir):
    """Bloom membership of 'customer in BUILDING segment', probed with every
    distinct ordering customer. Rebuilds Catalyst's runtime bloom-join
    pruning as an explicit, replayable operator: build the bitmap on the
    selective dim side, broadcast it, and gate fact keys before they reach
    a shuffle. `no_false_negative` is the bloom guarantee, rowwise TRUE.

    Plan shape: bitmap is ≤512 BIGINT words (bit_or collapses map-side);
    the probe pass is explode(×3) + broadcast-join + re-group on the probe
    key — the fact side shuffles only on its own key, never on the dim."""
    cust = T(spark, sf_dir, "customer")
    member = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    probe = T(spark, sf_dir, "orders").select("o_custkey").distinct()
    bitmap = bloom_build(member, "k", m_bits=16384, k=3)
    passed = bloom_probe(bitmap, probe, "o_custkey", m_bits=16384, k=3)
    return (
        passed.join(
            F.broadcast(member.withColumn("is_member", F.lit(True))),
            passed.o_custkey == F.col("k"),
            "left",
        )
        .select(
            "o_custkey",
            "bloom_pass",
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
            (
                ~F.coalesce("is_member", F.lit(False)) | F.col("bloom_pass")
            ).alias("no_false_negative"),
        )
    )


@query(
    "b_sketch_hll_merge",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_5pct
    FROM events GROUP BY 1
    """,
)
def b_sketch_hll_merge(spark, sf_dir):
    """MERGEABLE distinct-count sketches — the rollup pattern approx_count_
    distinct can't express: daily HLL sketches built once (the stored
    partial aggregate), then UNIONED up to weekly without rescanning raw
    events (hll_sketch_agg → hll_union_agg → hll_sketch_estimate).

    At 100 TB this is how distinct-user rollups actually run: per-partition
    sketch tables are bounded by sketch geometry, re-aggregate at any grain
    with a tiny merge, and never re-expand the raw table. The exact
    countDistinct here exists only for the hash-checkable invariant
    (estimate within ±5% — Spark's datasketches binary can't be replayed
    in DuckDB, same reasoning as b_agg_approx_distinct).
    """
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("__sk")
    )
    weekly_est = daily.groupBy(F.date_trunc("week", "day").alias("week")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est")
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    return exact.join(weekly_est, "week").select(
        "week",
        "exact_users",
        (
            F.abs(F.col("__est").cast("double") - F.col("exact_users"))
            <= F.col("exact_users") * 0.05
        ).alias("merged_within_5pct"),
    )


@query(
    "b_sketch_cms_merge",
    oracle=f"""
    WITH js AS (SELECT unnest(range(4)) AS j),
    grid AS (
        SELECT week, j, bucket, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, j,
                   {_BUCKET.format(key="event_type", m=1024)} AS bucket
            FROM events, js
        )
        GROUP BY week, j, bucket
    ),
    probe AS (
        SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               event_type, j,
               {_BUCKET.format(key="event_type", m=1024)} AS bucket
        FROM events, js
    ),
    est AS (
        SELECT week, event_type, MIN(COALESCE(c, 0)) AS cms_est
        FROM probe LEFT JOIN grid USING (week, j, bucket)
        GROUP BY week, event_type
    ),
    exact AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, event_type,
               CAST(count(*) AS BIGINT) AS exact_cnt
        FROM events GROUP BY 1, 2
    )
    SELECT week, event_type, CAST(cms_est AS BIGINT) AS cms_est, exact_cnt,
           cms_est >= exact_cnt AS never_undercounts
    FROM est JOIN exact USING (week, event_type)
    """,
)
def b_sketch_cms_merge(spark, sf_dir):
    """MERGEABLE count-min rollup — the frequency twin of
    b_sketch_hll_merge: DAILY CMS counter tables built once (the stored
    partial aggregate), merged up to weekly by summing counters, probed
    for per-week event-type frequencies WITHOUT rescanning raw events.

    Counter addition commutes exactly, so the merged weekly sketch is
    bit-identical to one built directly at week grain — which is what the
    oracle builds, making merge-exactness itself the hash-checked
    property. At 100 TB the daily ≤4096-row counter tables are the only
    state that crosses days; any grain re-aggregates with a tiny sum.
    """
    ev = T(spark, sf_dir, "events")
    c = F.col("event_type")
    daily = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _bucket(c, j, 1024).alias("bucket"),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("jb"),
        )
        .groupBy("day", "jb.j", "jb.bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    weekly = daily.groupBy(
        F.date_trunc("week", "day").alias("week"), "j", "bucket"
    ).agg(F.sum("c").cast("long").alias("c"))
    probes = ev.select(
        F.date_trunc("week", "ts").alias("week"), "event_type"
    ).distinct()
    ppos = probes.select(
        "week",
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _bucket(c, j, 1024).alias("bucket")
                    )
                    for j in range(4)
                ]
            )
        ).alias("jb"),
    ).select("week", "event_type", "jb.j", "jb.bucket")
    est = (
        ppos.join(F.broadcast(weekly), ["week", "j", "bucket"], "left")
        .groupBy("week", "event_type")
        .agg(
            F.min(F.coalesce("c", F.lit(0).cast("long"))).alias("cms_est")
        )
    )
    exact = ev.groupBy(
        F.date_trunc("week", "ts").alias("week"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    return est.join(exact, ["week", "event_type"]).select(
        "week",
        "event_type",
        F.col("cms_est").cast("long").alias("cms_est"),
        "exact_cnt",
        (F.col("cms_est") >= F.col("exact_cnt")).alias("never_undercounts"),
    )


@query(
    "b_sketch_hist_quantile",
    oracle="""
    WITH pur AS (SELECT date_trunc('week', ts) AS week,
                        date_trunc('day', ts) AS day, value
                 FROM events WHERE event_type = 'purchase'),
    b AS (SELECT min(value) AS mn, max(value) AS mx FROM pur),
    daily AS (SELECT week, day,
                     CAST(least(floor((value - mn) * 100.0 / (mx - mn)),
                                99.0) AS BIGINT) AS bin,
                     CAST(count(*) AS BIGINT) AS n
              FROM pur CROSS JOIN b GROUP BY 1, 2, 3),
    weekly AS (SELECT week, bin, CAST(sum(n) AS BIGINT) AS n_bin
               FROM daily GROUP BY 1, 2),
    tot AS (SELECT week, CAST(sum(n_bin) AS BIGINT) AS tot
            FROM weekly GROUP BY 1),
    cum AS (SELECT w.week, w.bin, w.n_bin, t.tot,
                   SUM(w.n_bin) OVER (PARTITION BY w.week ORDER BY w.bin)
                     AS cum
            FROM weekly w JOIN tot t ON t.week = w.week),
    q50 AS (SELECT week, bin, n_bin, tot, cum,
                   row_number() OVER (PARTITION BY week ORDER BY bin) AS rk
            FROM cum WHERE cum >= CAST(0.5 AS DOUBLE) * tot),
    q90 AS (SELECT week, bin, n_bin, tot, cum,
                   row_number() OVER (PARTITION BY week ORDER BY bin) AS rk
            FROM cum WHERE cum >= CAST(0.9 AS DOUBLE) * tot),
    est AS (SELECT a.week, a.tot AS n,
                   mn + (a.bin + (CAST(0.5 AS DOUBLE) * a.tot - (a.cum - a.n_bin)) / a.n_bin)
                        * ((mx - mn) / 100.0) AS p50_est,
                   mn + (b2.bin + (CAST(0.9 AS DOUBLE) * b2.tot - (b2.cum - b2.n_bin))
                         / b2.n_bin) * ((mx - mn) / 100.0) AS p90_est
            FROM q50 a JOIN q90 b2 ON a.week = b2.week
                 AND a.rk = 1 AND b2.rk = 1
            CROSS JOIN b)
    SELECT week, n, p50_est, p90_est FROM est
    """,
)
def b_sketch_hist_quantile(spark, sf_dir):
    """Mergeable quantile summaries: per-DAY equi-width histograms (100
    fixed bins over broadcast global bounds) merge by counter addition
    into weekly histograms, from which p50/p90 are read by cumulative
    interpolation — the histogram stand-in for t-digest/KLL, completing
    the mergeable-rollup family (HLL distinct, CMS frequency, histogram
    quantile). The daily sketch is what a 100 TB pipeline stores: the
    weekly quantile never rescans raw rows, and counter addition commutes
    exactly, so merge-exactness is the hash-checked property itself.

    Determinism: bins and interpolation are per-row IEEE expressions with
    identical association on both engines; counters are BIGINT; the
    cumulative window orders by the (unique) bin id within each week."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
        "value",
    )
    b = pur.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    daily = (
        pur.crossJoin(F.broadcast(b))
        .select(
            "week",
            "day",
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    * F.lit(100.0)
                    / (F.col("mx") - F.col("mn"))
                ).cast("double"),
                F.lit(99.0),
            )
            .cast("long")
            .alias("bin"),
        )
        .groupBy("week", "day", "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )
    weekly = daily.groupBy("week", "bin").agg(
        F.sum("n").cast("long").alias("n_bin")
    )
    tot = weekly.groupBy("week").agg(F.sum("n_bin").cast("long").alias("tot"))
    cum = weekly.join(tot, "week").withColumn(
        "cum",
        F.sum("n_bin").over(W.partitionBy("week").orderBy("bin")),
    )

    def pick(q, out):
        wq = W.partitionBy("week").orderBy("bin")
        return (
            cum.filter(F.col("cum") >= F.lit(q) * F.col("tot"))
            .withColumn("rk", F.row_number().over(wq))
            .filter(F.col("rk") == 1)
            .select(
                "week",
                "tot",
                (
                    F.col("bin")
                    + (
                        F.lit(q) * F.col("tot")
                        - (F.col("cum") - F.col("n_bin"))
                    )
                    / F.col("n_bin")
                ).alias(out),
            )
        )

    p50 = pick(0.5, "_f50")
    p90 = pick(0.9, "_f90").drop("tot")
    return (
        p50.join(p90, "week")
        .crossJoin(F.broadcast(b))
        .select(
            "week",
            F.col("tot").alias("n"),
            (
                F.col("mn")
                + F.col("_f50") * ((F.col("mx") - F.col("mn")) / F.lit(100.0))
            ).alias("p50_est"),
            (
                F.col("mn")
                + F.col("_f90") * ((F.col("mx") - F.col("mn")) / F.lit(100.0))
            ).alias("p90_est"),
        )
    )
