"""Round-5 warehouse-analytics additions (second batch).

Five operators a reference user would otherwise hand-write in delegated
SQL (popelines/main.py:236), each with a shuffle-audited scale shape:

 - ``c_pit_join``        — point-in-time lookup of facts into SCD2
   dimension intervals (the temporal-join half of c_scd2_track)
 - ``c_incremental_agg`` — mergeable partial-aggregate view maintenance:
   combine a stored partial with a delta partial, never rescan the base
 - ``c_mode_per_group``  — deterministic per-group mode
 - ``c_hist_equiwidth``  — fixed-bin equi-width histogram with
   broadcast-scalar bounds
 - ``c_skyline``         — Pareto frontier via a broadcast staircase dim

Float determinism per SURVEY.md §5: exact integer/decimal accumulation,
per-row IEEE double expressions with identical literal association on
both engines, no double→int narrowing without an exact floor first.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import T

#: SCD2 intervals of each user's non-purchase event_type "state", with
#: zero-duration runs dropped so valid_from is unique per user (two runs
#: can only share a start instant when the earlier one is empty).
_SCD_CTE = """
    src AS (SELECT user_id, ts, event_type, event_id FROM events
            WHERE event_type <> 'purchase'),
    ord AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM src
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    isl AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS island
      FROM ord),
    runs AS (
      SELECT user_id, island, event_type, min(ts) AS valid_from
      FROM isl GROUP BY 1, 2, 3),
    scd AS MATERIALIZED (
      SELECT * FROM (
        SELECT user_id, event_type AS state, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
                 AS valid_to,
               CAST(island AS BIGINT) AS version
        FROM runs)
      WHERE valid_to IS NULL OR valid_to > valid_from)
"""


@query(
    "c_pit_join",
    oracle=f"""
    WITH {_SCD_CTE}
    SELECT p.event_id, p.user_id, p.ts,
           COALESCE(s.state, 'none') AS state,
           CAST(COALESCE(s.version, 0) AS BIGINT) AS version,
           s.valid_from
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN scd s
      ON s.user_id = p.user_id AND s.valid_from <= p.ts
         AND (s.valid_to IS NULL OR p.ts < s.valid_to)
    """,
)
def c_pit_join(spark, sf_dir):
    """Point-in-time join: each purchase looked up into the SCD2 interval
    ([valid_from, valid_to)) covering its timestamp — the temporal
    dimension lookup every SCD2 warehouse needs (c_scd2_track builds the
    intervals; this consumes them).

    Plan: NOT the oracle's interval range join (whose fan-out is
    |facts| × |intervals-per-key| before the filter). Because non-empty
    intervals tile each key's timeline, "the covering interval" ==
    "the latest interval starting at or before ts" — a backward as-of
    join, which operators/asof.py runs as one union + one keyed
    sort + a running last(): every row shuffled exactly once, no join
    node, O(1) per-key state."""
    from popelines_spark.operators.asof import asof_join
    from popelines_spark.operators import eventseq

    ev = T(spark, sf_dir, "events")
    scd = eventseq.scd2_runs(
        ev.filter(F.col("event_type") != "purchase"),
        "user_id", "ts", "event_type", "event_id",
    ).filter(
        F.col("valid_to").isNull()
        | (F.col("valid_to") > F.col("valid_from"))
    ).select(
        F.col("user_id").alias("s_user_id"),
        F.col("event_type").alias("s_state"),
        "valid_from",
        F.col("version").alias("s_version"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        pur, scd,
        left_on="user_id", right_on="s_user_id",
        left_ts="ts", right_ts="valid_from",
    )
    return joined.select(
        "event_id", "user_id", "ts",
        F.coalesce("s_state", F.lit("none")).alias("state"),
        F.coalesce("s_version", F.lit(0)).cast("long").alias("version"),
        "valid_from",
    )


@query(
    "c_incremental_agg",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
             AS sum_price,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_partkey
    """,
)
def c_incremental_agg(spark, sf_dir):
    """Incremental materialized-view maintenance: the per-part sales
    rollup is computed as partial aggregates of the OLD slice (shipdate
    < 1999-01-01 — in production, read back from the stored MV) merged
    with partial aggregates of the DELTA slice, then combined by
    re-aggregation — the base slice is never rescanned on refresh. The
    oracle recomputes from scratch; matching hashes prove the
    merge is lossless.

    This is the mergeable-aggregate pattern every 100 TB rollup needs
    (same algebra as b_sketch_hll_merge, in exact decimals): partials
    are (sum DECIMAL, count) — both engine-exact and order-independent,
    so partial+final hash aggregation commutes with the slice split."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    split = F.lit("1999-01-01").cast("timestamp")

    def partial(df):
        return df.groupBy("l_partkey").agg(
            F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("_q"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).alias("_p"),
            F.count("*").alias("_n"),
        )

    base = partial(li.filter(F.col("l_shipdate") < split))
    delta = partial(li.filter(F.col("l_shipdate") >= split))
    return (
        base.unionByName(delta)
        .groupBy("l_partkey")
        .agg(
            F.sum("_q").cast("double").alias("sum_qty"),
            F.sum("_p").cast("double").alias("sum_price"),
            F.sum("_n").cast("long").alias("n_items"),
        )
    )


@query(
    "c_mode_per_group",
    oracle="""
    WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    r AS (SELECT user_id, event_type, n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rk
          FROM c)
    SELECT user_id, event_type AS mode_type, n FROM r WHERE rk = 1
    """,
)
def c_mode_per_group(spark, sf_dir):
    """Per-user modal event type (most frequent; ties broken
    lexicographically — deterministic on both engines). Two keyed
    shuffles: count per (user, type), then a user-partitioned top-1
    window over the already-aggregated (small) relation."""
    ev = T(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@query(
    "c_hist_equiwidth",
    oracle="""
    WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
               FROM orders),
    binned AS (
      SELECT CAST(least(floor((o_totalprice - mn) * 20.0 / (mx - mn)),
                        19.0) AS BIGINT) AS bin,
             mn, mx
      FROM orders CROSS JOIN b)
    SELECT bin,
           mn + bin * ((mx - mn) / 20.0) AS lo,
           mn + (bin + 1) * ((mx - mn) / 20.0) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY bin, mn, mx
    """,
)
def c_hist_equiwidth(spark, sf_dir):
    """20-bin equi-width histogram of order totals: data-driven [min, max]
    bounds attach as a broadcast scalar (the sanctioned single-row
    pattern), then binning is a shuffle-free per-row expression and the
    histogram one keyed aggregation over ≤ 20 groups.

    Float notes: bin = floor((x-mn)·20/(mx-mn)) and the bin edges are
    per-row IEEE expressions with identical association on both engines;
    floor()'s value is exactly representable, so the BIGINT cast is
    narrowing-safe (the "never cast raw doubles to int" rule)."""
    orders = T(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = orders.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                * F.lit(20.0)
                / (F.col("mx") - F.col("mn"))
            ).cast("double"),
            F.lit(19.0),
        )
        .cast("long")
        .alias("bin"),
        "mn",
        "mx",
    )
    return binned.groupBy("bin", "mn", "mx").agg(
        F.count("*").cast("long").alias("n")
    ).select(
        "bin",
        (F.col("mn") + F.col("bin") * ((F.col("mx") - F.col("mn")) / F.lit(20.0))).alias("lo"),
        (F.col("mn") + (F.col("bin") + 1) * ((F.col("mx") - F.col("mn")) / F.lit(20.0))).alias("hi"),
        "n",
    )


@query(
    "c_skyline",
    oracle="""
    SELECT p_partkey, p_size, p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
    )
    """,
)
def c_skyline(spark, sf_dir):
    """Skyline (Pareto frontier): parts not dominated under
    (maximize size, minimize price). The oracle is the quadratic
    NOT EXISTS; the engine side is the staircase reduction — dominance
    only depends on the per-size minimum price, so:

      1. one keyed agg → per-size min price (|distinct sizes| rows);
      2. a broadcast theta self-join of that tiny dim computes, per size,
         the best (lowest) price at any STRICTLY larger size;
      3. each part probes the staircase by equi-join on its size and
         survives iff no strictly-larger size matches its price or
         better, and no same-size part beats it strictly.

    The fact table is touched twice (agg + probe), both shuffle-free on
    the probe side (broadcast staircase); nothing quadratic anywhere.
    Price comparisons are raw-double equality/order — exact operations
    (no accumulation), identical on both engines."""
    part = T(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    sizes = part.groupBy("p_size").agg(F.min("p_retailprice").alias("_mp"))
    gt = (
        sizes.alias("s")
        .join(
            F.broadcast(sizes.alias("t")),
            F.col("t.p_size") > F.col("s.p_size"),
        )
        .groupBy(F.col("s.p_size").alias("p_size"))
        .agg(F.min(F.col("t._mp")).alias("_best_gt"))
    )
    stair = sizes.join(gt, "p_size", "left").select(
        F.col("p_size").alias("_sz"), "_mp", "_best_gt"
    )
    return (
        part.join(F.broadcast(stair), part.p_size == F.col("_sz"))
        .filter(
            (
                F.col("_best_gt").isNull()
                | (F.col("_best_gt") > F.col("p_retailprice"))
            )
            & (F.col("_mp") == F.col("p_retailprice"))
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )


@query(
    "c_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    b AS (SELECT date_trunc('day', min(ts)) AS d0,
                 date_trunc('day', max(ts)) AS d1
          FROM events),
    u AS (SELECT DISTINCT user_id FROM daily),
    grid AS (SELECT user_id,
                    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
             FROM u CROSS JOIN b),
    j AS (SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day, d.rev
          FROM grid g LEFT JOIN daily d
            ON d.user_id = g.user_id AND d.day = g.day)
    SELECT user_id, day,
           COALESCE(last_value(rev IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW),
                    0.0) AS rev_filled,
           rev IS NULL AS is_filled
    FROM j
    """,
)
def c_gap_fill(spark, sf_dir):
    """Time-series gap filling with forward fill (LOCF): densify each
    purchasing user's daily revenue onto the corpus-wide day grid, carry
    the last observed value across missing days (0.0 before the first
    observation), flag synthesized rows. The regularization step every
    downstream window/forecast operator assumes.

    Plan: the day grid attaches per user via a broadcast one-row bounds
    scalar + sequence/explode (rows generated where the user's data
    lives, never on the driver); fill is one user-partitioned running
    last(ignorenulls) — the same O(1)-state incremental window as the
    as-of join. Fill copies values (no accumulation): the only sums are
    the per-day decimal-exact revenue totals."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("double")
            .alias("rev")
        )
    )
    b = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = (
        daily.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.coalesce(
            F.last("rev", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("rev_filled"),
        F.col("rev").isNull().alias("is_filled"),
    )


@query(
    "c_benford",
    oracle="""
    WITH d AS (SELECT left(CAST(CAST(floor(o_totalprice) AS BIGINT)
                            AS VARCHAR), 1) AS digit
               FROM orders),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
    SELECT digit, n,
           CAST(n AS DOUBLE) / total AS frac,
           log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS benford_expected
    FROM c CROSS JOIN t
    """,
)
def c_benford(spark, sf_dir):
    """Benford's-law first-digit screen over order totals — the classic
    forensic data-quality check (frac vs log10(1+1/d) per leading
    digit). floor() before the BIGINT cast keeps the double→int
    narrowing exact; the total attaches as a broadcast scalar; log10 is
    a per-row transcendental of the small integer digits 1-9 —
    correctly-rounded on both engines."""
    orders = T(spark, sf_dir, "orders")
    c = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).alias("digit")
    ).groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("frac"),
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")).alias(
            "benford_expected"
        ),
    )


@query(
    "c_mad_outliers",
    oracle="""
    WITH med AS (SELECT event_type, median(value) AS med
                 FROM events GROUP BY 1),
    dev AS (SELECT e.event_type, abs(e.value - m.med) AS ad, m.med
            FROM events e JOIN med m USING (event_type)),
    mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.ad > m2.mad * 4.4478 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out,
           min(d.med) AS med, min(m2.mad) AS mad
    FROM dev d JOIN mad m2 USING (event_type)
    GROUP BY d.event_type
    """,
)
def c_mad_outliers(spark, sf_dir):
    """Robust outlier screen per event type: |x - median| > 3σ-equivalent
    · MAD (3·1.4826 = 4.4478) — the median/MAD twin of c_anomaly_zscore
    for heavy-tailed metrics where mean/stddev are themselves dragged by
    the outliers.

    Plan: two grouped exact medians (both engines interpolate sorted
    neighbors of raw doubles — bit-identical), each broadcast back as a
    per-group scalar dim; flagging is a shuffle-free per-row compare.
    Exact medians sort within groups — at extreme group sizes swap in
    approx_percentile partials; the registered form is the exact one."""
    ev = T(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(F.median("ad").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                (F.col("ad") > F.col("mad") * F.lit(4.4478)).cast("long")
            ).alias("n_out"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
        )
    )


def _autocorr_sql() -> str:
    ks = ", ".join(str(k) for k in (1, 2, 3))
    return f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DECIMAL(18,4)) AS x
      FROM events GROUP BY 1, 2),
    pairs AS (
      SELECT d.event_type, ks.k, d.x,
             lag(d.x, ks.k) OVER (PARTITION BY d.event_type, ks.k
                                  ORDER BY d.day) AS y
      FROM daily d CROSS JOIN (SELECT unnest([{ks}]) AS k) ks),
    m AS (
      SELECT event_type, k, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)))
               AS sxx,
             sum(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)))
               AS syy,
             sum(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(19,4)))
               AS sxy
      FROM pairs WHERE y IS NOT NULL GROUP BY 1, 2),
    r AS (
      SELECT event_type, CAST(k AS BIGINT) AS k, n,
             (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE)) AS vx,
             (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                * CAST(sy AS DOUBLE)) AS vy,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE)) AS cxy
      FROM m)
    SELECT event_type, k, n, round(cxy / sqrt(vx * vy), 6) AS r
    FROM r WHERE vx > 0.0 AND vy > 0.0
    """


@query("c_autocorr", oracle=_autocorr_sql())
def c_autocorr(spark, sf_dir):
    """Lag-1/2/3 autocorrelation of each event type's daily revenue
    series — the seasonality/trend diagnostic run before any forecast.
    Semantics: observation-lag over the OBSERVED daily series ordered by
    day (a calendar gap pairs with the previous observed day — compose
    with c_gap_fill first for strict calendar lags).

    Determinism: daily revenues are exact DECIMAL(18,4); all five moments
    accumulate as exact decimals (products widen to (37,8) — order-free;
    the oracle casts multiplicands to DECIMAL(19,4) because DuckDB
    multiplies DECIMAL(18)s in their INT64 physical type and overflows
    at sf1.0 magnitudes — precision 19 forces INT128, values unchanged),
    and r is one final double expression, 6dp. Windows partition by
    (event_type, k); zero-variance series are filtered on the exact>0
    double compare, not left to NaN."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(20,4)"))
        .cast("decimal(18,4)")
        .alias("x")
    )
    frames = []
    for k in (1, 2, 3):
        w = W.partitionBy("event_type").orderBy("day")
        frames.append(
            daily.select(
                "event_type",
                F.lit(k).cast("long").alias("k"),
                "x",
                F.lag("x", k).over(w).alias("y"),
            )
        )
    pairs = frames[0].unionByName(frames[1]).unionByName(frames[2])
    m = (
        pairs.filter(F.col("y").isNotNull())
        .groupBy("event_type", "k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    r = m.select(
        "event_type",
        "k",
        "n",
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        ).alias("vx"),
        (
            F.col("n") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        ).alias("vy"),
        (
            F.col("n") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        ).alias("cxy"),
    )
    return r.filter((F.col("vx") > 0.0) & (F.col("vy") > 0.0)).select(
        "event_type",
        "k",
        "n",
        F.round(F.col("cxy") / F.sqrt(F.col("vx") * F.col("vy")), 6).alias(
            "r"
        ),
    )


@query(
    "c_streaks",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                  FROM events),
    numbered AS (
      SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM days),
    islands AS (
      SELECT user_id, day - INTERVAL (rn) DAY AS anchor FROM numbered),
    runs AS (SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
             FROM islands GROUP BY 1, 2)
    SELECT user_id, max(len) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def c_streaks(spark, sf_dir):
    """Longest consecutive-active-day streak per user (plus streak
    count) — the engagement metric behind "N-day streak" features. The
    classic gaps-and-islands reduction: distinct active days, day minus
    row_number is constant within a consecutive run, group on that
    anchor. Two keyed shuffles + one user-partitioned window."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        (
            F.col("day")
            - F.make_interval(days=F.row_number().over(w))
        ).alias("anchor"),
    )
    runs = islands.groupBy("user_id", "anchor").agg(
        F.count("*").cast("long").alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
    )


@query(
    "c_key_skew_profile",
    oracle="""
    WITH per_key AS (SELECT event_type, user_id,
                            CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, user_id) AS rk
      FROM per_key),
    tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(n) AS BIGINT) AS max_key
            FROM per_key GROUP BY 1),
    top5 AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t5
             FROM ranked WHERE rk <= 5 GROUP BY 1)
    SELECT t.event_type, t.n_keys, t.total, t.max_key,
           CAST(p.t5 AS DOUBLE) / t.total AS top5_share,
           CAST(t.max_key AS DOUBLE) * t.n_keys / t.total AS skew_factor
    FROM tot t JOIN top5 p USING (event_type)
    """,
)
def c_key_skew_profile(spark, sf_dir):
    """Join-key skew diagnostic — the profiler you run BEFORE choosing
    salting/AQE strategy (operators/skew.py): per event type, key count,
    hottest-key share, top-5 concentration, and skew factor
    (max/mean — 1.0 = uniform). Everything the 100 TB shuffle-planning
    story needs, computed with keyed shuffles only: per-key counts, a
    type-partitioned top-5 window over the aggregated (small) relation,
    two grouped rollups."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    w = W.partitionBy("event_type").orderBy(F.col("n").desc(), "user_id")
    ranked = per_key.withColumn("rk", F.row_number().over(w))
    tot = per_key.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("max_key"),
    )
    top5 = (
        ranked.filter(F.col("rk") <= 5)
        .groupBy("event_type")
        .agg(F.sum("n").cast("long").alias("t5"))
    )
    return tot.join(top5, "event_type").select(
        "event_type",
        "n_keys",
        "total",
        "max_key",
        (F.col("t5").cast("double") / F.col("total")).alias("top5_share"),
        (
            F.col("max_key").cast("double")
            * F.col("n_keys")
            / F.col("total")
        ).alias("skew_factor"),
    )


@query(
    "c_first_touch",
    oracle="""
    WITH pur AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
    src AS (SELECT user_id AS u, ts AS st, event_type AS stype FROM events
            WHERE event_type IN ('click', 'view')),
    best AS (SELECT p.event_id, p.user_id, p.ts, min(s.st) AS mt
             FROM pur p LEFT JOIN src s
               ON s.u = p.user_id AND s.st <= p.ts
                  AND s.st >= p.ts - INTERVAL 7 DAY
             GROUP BY 1, 2, 3),
    att AS (SELECT b.event_id, s.stype
            FROM best b LEFT JOIN src s
              ON s.u = b.user_id AND s.st = b.mt)
    SELECT COALESCE(stype, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM att GROUP BY 1
    """,
)
def c_first_touch(spark, sf_dir):
    """First-touch marketing attribution: each purchase credits the
    EARLIEST click/view in its 7-day lookback (the mirror of
    c_attribution's last-touch; the pair brackets multi-touch models).
    Purchases with no source in window credit 'direct'.

    Plan: the user-keyed join bounds candidates per purchase to that
    user's window; argmin resolves via min + equi-join back on the
    (unique per user) timestamp — keyed shuffles only."""
    ev = T(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    src = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("st"),
        F.col("event_type").alias("stype"),
    )
    best = (
        pur.join(
            src,
            (F.col("u") == F.col("user_id"))
            & (F.col("st") <= F.col("ts"))
            & (F.col("st") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
            "left",
        )
        .groupBy("event_id", "user_id", "ts")
        .agg(F.min("st").alias("mt"))
    )
    att = best.join(
        src,
        (F.col("u") == F.col("user_id")) & (F.col("st") == F.col("mt")),
        "left",
    )
    return att.groupBy(
        F.coalesce("stype", F.lit("direct")).alias("channel")
    ).agg(F.count("*").cast("long").alias("n_purchases"))


@query(
    "c_also_bought",
    oracle="""
    WITH ob AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                     CAST(count(*) AS BIGINT) AS n
              FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                                 AND a.l_partkey <> b.l_partkey
              GROUP BY 1, 2),
    ranked AS (SELECT part_a, part_b, n,
                      row_number() OVER (PARTITION BY part_a
                                         ORDER BY n DESC, part_b) AS rk
               FROM pairs)
    SELECT part_a, CAST(rk AS BIGINT) AS rk, part_b, n
    FROM ranked WHERE rk <= 3
    """,
)
def c_also_bought(spark, sf_dir):
    """Item-item collaborative filtering, count form: per part, the top-3
    most co-ordered parts ("customers also bought"). The co-occurrence
    self-join fans out C(parts-per-order, 2) — bounded by order size, so
    work scales with orders, never |parts|²; ranking is a
    part_a-partitioned top-3 over the aggregated pair counts with a
    deterministic (n desc, part_b) tie-break. The count-ranked sibling of
    c_brand_affinity's lift ranking."""
    from pyspark.sql.window import Window as W

    ob = (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = ob.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = ob.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = W.partitionBy("part_a").orderBy(F.col("n").desc(), "part_b")
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("part_a", "rk", "part_b", "n")
    )


@query(
    "c_seq_pattern",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
           CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3
                AS BIGINT) AS n_vcp
    FROM ordered
    """,
)
def c_seq_pattern(spark, sf_dir):
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite): compress
    each user's time-ordered event stream to an initial-letter string
    (s/e/c/v/p) and count adjacent view→click→purchase triples by the
    replace-length trick — exact, overlap-free, pure JVM string ops.
    Richer regex patterns drop into the same compressed representation
    (regexp_count over seq).

    Scale note: the per-user sequence string is bounded by that user's
    event count — the same hottest-key bound as every sort-based
    per-user operator here (sessionize, as-of); the skew fixture
    (tests/test_skew.py) covers the family."""
    ev = T(spark, sf_dir, "events")
    ordered = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
            .alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["c"]
                ),
                "",
            ).alias("seq")
        )
    )
    return ordered.select(
        "user_id",
        F.length("seq").cast("long").alias("n_events"),
        (
            (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit("vcp"), F.lit(""))))
            / 3
        )
        .cast("long")
        .alias("n_vcp"),
    )


@query(
    "c_qoq_growth",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS seg,
             date_trunc('quarter', o_orderdate) AS quarter,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
               AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    g AS (SELECT seg, quarter, rev,
                 lag(rev) OVER (PARTITION BY seg ORDER BY quarter)
                   AS prev
          FROM q)
    SELECT seg, quarter, rev, round(rev / prev - 1.0, 6) AS qoq_growth
    FROM g WHERE prev IS NOT NULL
    """,
)
def c_qoq_growth(spark, sf_dir):
    """Quarter-over-quarter revenue growth per market segment — the
    growth-analysis window-over-aggregate shape (rev and its lag are
    exact decimal sums cast to double; growth is one per-row IEEE
    division). One keyed agg + one segment-partitioned lag."""
    from pyspark.sql.window import Window as W

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    q = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_trunc("quarter", "o_orderdate").alias("quarter"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
            .cast("double")
            .alias("rev")
        )
    )
    w = W.partitionBy("seg").orderBy("quarter")
    return (
        q.withColumn("prev", F.lag("rev").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "seg",
            "quarter",
            "rev",
            F.round(F.col("rev") / F.col("prev") - F.lit(1.0), 6).alias(
                "qoq_growth"
            ),
        )
    )


@query(
    "c_pareto_8020",
    oracle="""
    WITH per_cust AS (
      SELECT c_mktsegment AS seg, o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    tot AS (SELECT seg, SUM(rev) AS total,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM per_cust GROUP BY 1),
    ranked AS (
      SELECT p.seg,
             SUM(p.rev) OVER (PARTITION BY p.seg
                              ORDER BY p.rev DESC, p.o_custkey) AS cum,
             t.total, t.n_customers
      FROM per_cust p JOIN tot t ON t.seg = p.seg)
    SELECT seg, n_customers,
           CAST(sum(CASE WHEN CAST(cum AS DOUBLE)
                              < CAST(0.8 AS DOUBLE) * CAST(total AS DOUBLE)
                         THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_top80,
           round((CAST(sum(CASE WHEN CAST(cum AS DOUBLE)
                              < CAST(0.8 AS DOUBLE) * CAST(total AS DOUBLE)
                         THEN 1 ELSE 0 END) + 1 AS DOUBLE))
                 / n_customers, 6) AS top80_frac
    FROM ranked GROUP BY seg, n_customers
    """,
)
def c_pareto_8020(spark, sf_dir):
    """Revenue concentration (the 80/20 check): per market segment, how
    many customers (ranked by spend) cover 80% of revenue, and what
    fraction of the customer base that is. The cumulative sum runs in
    exact decimals over a segment-partitioned window with a unique
    (rev desc, custkey) order; the 0.8·total threshold compares in
    doubles, identically associated on both engines. n_top80 = customers
    strictly below the threshold + the one that crosses it."""
    from pyspark.sql.window import Window as W

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("rev")
        )
    )
    tot = per_cust.groupBy("seg").agg(
        F.sum("rev").alias("total"),
        F.count("*").cast("long").alias("n_customers"),
    )
    w = (
        W.partitionBy("seg")
        .orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = per_cust.join(tot, "seg").select(
        "seg",
        "n_customers",
        F.sum("rev").over(w).alias("cum"),
        "total",
    )
    below = (
        F.col("cum").cast("double")
        < F.lit(0.8) * F.col("total").cast("double")
    ).cast("long")
    return ranked.groupBy("seg", "n_customers").agg(
        (F.sum(below) + 1).cast("long").alias("n_top80"),
        F.round(
            (F.sum(below) + 1).cast("double") / F.col("n_customers"), 6
        ).alias("top80_frac"),
    )


@query(
    "c_cohort_ltv",
    oracle="""
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY 1),
    sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
              FROM cohort GROUP BY 1),
    wk AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week,
                            date_trunc('week', e.ts)) // 7 AS BIGINT)
               AS weeks_since,
             SUM(CAST(e.value AS DECIMAL(20,4))) AS rev
      FROM events e JOIN cohort c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= c.cohort_week
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort_week, weeks_since,
             SUM(rev) OVER (PARTITION BY cohort_week ORDER BY weeks_since)
               AS cum_rev
      FROM wk)
    SELECT c.cohort_week, c.weeks_since, s.n_users,
           round(CAST(c.cum_rev AS DOUBLE) / s.n_users, 6)
             AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
    """,
)
def c_cohort_ltv(spark, sf_dir):
    """Cohort LTV curves: cumulative purchase revenue per signup-cohort
    user, by weeks since signup — the growth-accounting companion to
    c_retention_cohort (that one counts actives; this one accumulates
    value). Revenue accumulates in exact decimals through the
    cohort-partitioned cumulative window; per-user LTV is one final
    double division, 6dp."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("n_users")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    wk = (
        pur.join(cohort, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", "ts"), F.col("cohort_week")
                )
                / 7
            )
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("rev"))
    )
    w = W.partitionBy("cohort_week").orderBy("weeks_since")
    cum = wk.withColumn("cum_rev", F.sum("rev").over(w))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "weeks_since",
        "n_users",
        F.round(
            F.col("cum_rev").cast("double") / F.col("n_users"), 6
        ).alias("ltv_per_user"),
    )


@query(
    "c_session_funnel",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM flagged),
    s0 AS (SELECT user_id, sess, min(ts) AS t FROM numbered
           WHERE event_type = 'view' GROUP BY 1, 2),
    s1 AS (SELECT n.user_id, n.sess, min(n.ts) AS t
           FROM numbered n JOIN s0 ON s0.user_id = n.user_id
                                  AND s0.sess = n.sess
           WHERE n.event_type = 'click' AND n.ts > s0.t GROUP BY 1, 2),
    s2 AS (SELECT n.user_id, n.sess, min(n.ts) AS t
           FROM numbered n JOIN s1 ON s1.user_id = n.user_id
                                  AND s1.sess = n.sess
           WHERE n.event_type = 'purchase' AND n.ts > s1.t GROUP BY 1, 2)
    SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
           CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_sessions
    UNION ALL
    SELECT 1, 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
    UNION ALL
    SELECT 2, 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
    """,
)
def c_session_funnel(spark, sf_dir):
    """Session-scoped ordered funnel: within each 30-minute-gap session,
    did view → click → purchase happen in strict time order? Counts
    SESSIONS per step (the per-user funnel c_funnel asks "ever"; this
    asks "in one sitting" — the conversion-quality version).

    Plan: gaps-and-islands sessionization (one user-keyed window), then
    the generic min-time funnel (operators/eventseq.py:funnel) keyed on
    the composite user#session string — the funnel machinery is
    key-agnostic, so session scoping is pure composition."""
    from pyspark.sql.window import Window as W

    from popelines_spark.operators.eventseq import funnel

    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    numbered = flagged.select(
        "ts",
        "event_type",
        F.concat_ws(
            "#",
            F.col("user_id"),
            F.sum("is_new")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("string"),
        ).alias("sk"),
    )
    return funnel(
        numbered, "sk", "ts", "event_type",
        steps=["view", "click", "purchase"],
    ).select("step_idx", "step", F.col("n_users").alias("n_sessions"))


@query(
    "c_feature_scale",
    oracle="""
    WITH ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings),
    stats AS (SELECT pos,
                     list_sum(list(val ORDER BY vec_id)) AS s,
                     list_sum(list(val * val ORDER BY vec_id)) AS s2,
                     CAST(count(*) AS BIGINT) AS n
              FROM ex GROUP BY pos),
    z AS (SELECT e.vec_id,
                 (e.val - st.s / st.n)
                   / sqrt(st.s2 / st.n - (st.s / st.n) * (st.s / st.n))
                   AS z
          FROM ex e JOIN stats st USING (pos))
    SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_extreme
    FROM z GROUP BY vec_id
    """,
)
def c_feature_scale(spark, sf_dir):
    """Per-dimension feature standardization (z-scoring) of the embedding
    corpus — the ML-prep step before distance-based models — surfaced as
    an integer invariant per vector (count of |z| > 2 dimensions), so the
    hash check needs no float rounding at all.

    Determinism: per-dim Σx and Σx² fold in vec_id order (the
    c_class_centroids pattern); the z expression is per-row IEEE with
    identical association on both engines, and only integer counts are
    emitted. Scale note: the ordered fold trades reassociation freedom
    for bit-exactness — at real corpus scale swap the fold for plain
    sums and accept last-ulp drift, or quantize; the 64-row stats dim
    broadcasts either way."""
    ex = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "valf")
    ).select("vec_id", "pos", F.col("valf").cast("double").alias("val"))
    stats = ex.groupBy("pos").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("vec_id", "val"))),
            F.lit(0.0),
            lambda a, x: a + x["val"],
        ).alias("s"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("vec_id", "val"))),
            F.lit(0.0),
            lambda a, x: a + x["val"] * x["val"],
        ).alias("s2"),
        F.count("*").cast("long").alias("n"),
    )
    z = ex.join(F.broadcast(stats), "pos").select(
        "vec_id",
        (
            (F.col("val") - F.col("s") / F.col("n"))
            / F.sqrt(
                F.col("s2") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
            )
        ).alias("z"),
    )
    return z.groupBy("vec_id").agg(
        F.count("*").cast("long").alias("n_dims"),
        F.sum((F.abs("z") > 2.0).cast("long")).alias("n_extreme"),
    )


@query(
    "c_ri_check",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'events.user_id->customer',
           CAST((SELECT count(*) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = e.user_id))
                AS BIGINT)
    """,
)
def c_ri_check(spark, sf_dir):
    """Referential-integrity audit: orphan-row counts for the star
    schema's four foreign keys — the cross-table half of c_dq_checks
    (which audits within one table). Each check is one LEFT ANTI join
    (keyed; dimension side broadcast when small) feeding a count — at
    100 TB this is the standard post-load constraint validation, since
    parquet tables enforce nothing."""
    checks = [
        ("lineitem.l_orderkey->orders",
         T(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k")),
         T(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))),
        ("lineitem.l_partkey->part",
         T(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k")),
         T(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))),
        ("orders.o_custkey->customer",
         T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")),
         T(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))),
        ("events.user_id->customer",
         T(spark, sf_dir, "events").select(F.col("user_id").alias("k")),
         T(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))),
    ]
    out = None
    for name, child, parent in checks:
        orphans = child.join(parent, "k", "left_anti").agg(
            F.count("*").cast("long").alias("n_orphans")
        ).select(F.lit(name).alias("fk"), "n_orphans")
        out = orphans if out is None else out.unionByName(orphans)
    return out


@query(
    "c_user_lifecycle",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
                 FROM events),
    lag_w AS (
      SELECT user_id, week,
             lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
      FROM act),
    cls AS (
      SELECT week,
             CASE WHEN prev IS NULL THEN 'new'
                  WHEN week = prev + INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS state
      FROM lag_w),
    churn AS (
      SELECT week + INTERVAL 7 DAY AS week, 'churned' AS state
      FROM lag_w l
      WHERE NOT EXISTS (SELECT 1 FROM act a
                        WHERE a.user_id = l.user_id
                          AND a.week = l.week + INTERVAL 7 DAY)
        AND l.week + INTERVAL 7 DAY <=
            (SELECT max(week) FROM act)),
    allrows AS (SELECT week, state FROM cls
                UNION ALL SELECT week, state FROM churn)
    SELECT CAST(week AS TIMESTAMP) AS week, state,
           CAST(count(*) AS BIGINT) AS n_users
    FROM allrows GROUP BY 1, 2
    """,
)
def c_user_lifecycle(spark, sf_dir):
    """Growth accounting: per week, users classified new (first week
    ever), retained (active previous week too), resurrected (returning
    after a gap), churned (active last week, absent this week — counted
    into the week they went missing, bounded by the last observed week).
    The standard DAU-decomposition framework behind "net growth = new +
    resurrected − churned".

    Plan: distinct (user, week) grid, one user-partitioned lag for the
    state classification, an anti-join-free churn derivation (lead-less:
    churn for week w+1 = rows whose next active week ≠ w+1, checked via
    the same lag relation on the other side), one final keyed count."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("week")
    lag_w = act.select(
        "user_id", "week", F.lag("week").over(w).alias("prev"),
        F.lead("week").over(w).alias("next"),
    )
    wk = F.col("week") + F.expr("INTERVAL 7 DAY")
    cls = lag_w.select(
        "week",
        F.when(F.col("prev").isNull(), "new")
        .when(
            F.col("week") == F.col("prev") + F.expr("INTERVAL 7 DAY"),
            "retained",
        )
        .otherwise("resurrected")
        .alias("state"),
    )
    maxw = act.agg(F.max("week").alias("mx"))
    churn = (
        lag_w.crossJoin(F.broadcast(maxw))
        .filter(
            (F.col("next").isNull() | (F.col("next") != wk)) & (wk <= F.col("mx"))
        )
        .select(wk.alias("week"), F.lit("churned").alias("state"))
    )
    return (
        cls.unionByName(churn)
        .groupBy("week", "state")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@query(
    "c_dup_cluster_sizes",
    oracle="""
    WITH cl AS (SELECT text, CAST(count(*) AS BIGINT) AS sz
                FROM documents GROUP BY text)
    SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM cl GROUP BY sz
    """,
)
def c_dup_cluster_sizes(spark, sf_dir):
    """Duplicate-cluster-size distribution: how many exact-duplicate
    clusters of each size the corpus holds and how many documents they
    account for — the observability readout a dedup pass publishes
    before deleting anything (size-1 rows = unique docs; the tail shows
    duplication severity). Two keyed counts; at scale group on
    xxhash64(text) instead of the text itself (c_dedup_exact's caveat)."""
    d = T(spark, sf_dir, "documents")
    cl = d.groupBy("text").agg(F.count("*").cast("long").alias("sz"))
    return cl.groupBy("sz").agg(
        F.count("*").cast("long").alias("n_clusters"),
        (F.col("sz") * F.count("*")).cast("long").alias("n_docs"),
    )


@query(
    "c_ab_srm",
    oracle="""
    WITH arms AS (
      SELECT CASE WHEN ((user_id % 1000003) * 2654435761) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             user_id
      FROM (SELECT DISTINCT user_id FROM events)),
    c AS (SELECT arm, CAST(count(*) AS BIGINT) AS n FROM arms GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT arm, n,
           (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) / 2.0)
             * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) / 2.0)
             / (CAST(total AS DOUBLE) / 2.0) AS chi2_term
    FROM c CROSS JOIN t
    """,
)
def c_ab_srm(spark, sf_dir):
    """Sample-ratio-mismatch screen for the A/B harness: per-arm user
    counts under the same deterministic id-hash assignment as c_ab_test,
    plus each arm's chi-square term against the expected 50/50 split
    (sum the terms, compare to the chi2(1) critical value — terms are
    emitted so the oracle needs no distribution function). SRM is the
    first validity check any experimentation platform runs."""
    ev = T(spark, sf_dir, "events")
    arms = ev.select("user_id").distinct().select(
        F.when(
            ((F.col("user_id") % 1000003) * 2654435761) % 2 == 0, "A"
        )
        .otherwise("B")
        .alias("arm")
    )
    c = arms.groupBy("arm").agg(F.count("*").cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    exp = F.col("total").cast("double") / F.lit(2.0)
    return c.crossJoin(F.broadcast(t)).select(
        "arm",
        "n",
        (
            (F.col("n").cast("double") - exp)
            * (F.col("n").cast("double") - exp)
            / exp
        ).alias("chi2_term"),
    )


@query(
    "c_interpurchase_time",
    oracle="""
    WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey FROM orders),
    gaps AS (
      SELECT c.c_mktsegment AS seg,
             CAST(date_diff('day',
                            lag(o.o_orderdate)
                              OVER (PARTITION BY o.o_custkey
                                    ORDER BY o.o_orderdate, o.o_orderkey),
                            o.o_orderdate) AS BIGINT) AS gap_days
      FROM o JOIN customer c ON c.c_custkey = o.o_custkey)
    SELECT seg, CAST(count(gap_days) AS BIGINT) AS n_gaps,
           median(CAST(gap_days AS DOUBLE)) AS median_days,
           quantile_cont(CAST(gap_days AS DOUBLE), 0.9) AS p90_days
    FROM gaps WHERE gap_days IS NOT NULL GROUP BY seg
    """,
)
def c_interpurchase_time(spark, sf_dir):
    """Inter-purchase cadence: per market segment, the exact median and
    p90 of day-gaps between a customer's consecutive orders — the
    repurchase-cycle metric behind replenishment campaigns. One
    customer-partitioned lag (unique orderkey tie-break), one grouped
    exact-percentile agg over integer day gaps."""
    from pyspark.sql.window import Window as W

    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("prev", F.lag("o_orderdate").over(w))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.datediff("o_orderdate", "prev").cast("long").alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("seg").agg(
        F.count("gap_days").cast("long").alias("n_gaps"),
        F.median(F.col("gap_days").cast("double")).alias("median_days"),
        F.percentile(F.col("gap_days").cast("double"), F.lit(0.9)).alias(
            "p90_days"
        ),
    )


@query(
    "c_new_vs_repeat",
    oracle="""
    WITH firsts AS (SELECT o_custkey, min(o_orderdate) AS first_dt
                    FROM orders GROUP BY 1)
    SELECT date_trunc('quarter', o.o_orderdate) AS quarter,
           CASE WHEN o.o_orderdate = f.first_dt THEN 'new'
                ELSE 'repeat' END AS buyer_type,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def c_new_vs_repeat(spark, sf_dir):
    """New-vs-repeat revenue split per quarter: an order is 'new' when
    it falls on its customer's first order date — the acquisition-vs-
    retention revenue decomposition. One keyed min-agg joined back, one
    grouped decimal-exact rollup."""
    o = T(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    return (
        o.join(firsts, "o_custkey")
        .groupBy(
            F.date_trunc("quarter", "o_orderdate").alias("quarter"),
            F.when(F.col("o_orderdate") == F.col("first_dt"), "new")
            .otherwise("repeat")
            .alias("buyer_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "c_hhi_supplier",
    oracle="""
    WITH ps AS (SELECT l_partkey, l_suppkey,
                       SUM(CAST(l_quantity AS DECIMAL(18,4))) AS q
                FROM lineitem GROUP BY 1, 2),
    agg AS (SELECT l_partkey,
                   SUM(CAST(q AS DECIMAL(19,4)) * CAST(q AS DECIMAL(19,4)))
                     AS sq2,
                   SUM(q) AS qt,
                   CAST(count(*) AS BIGINT) AS n_suppliers
            FROM ps GROUP BY 1)
    SELECT l_partkey, n_suppliers,
           CAST(sq2 AS DOUBLE)
             / (CAST(qt AS DOUBLE) * CAST(qt AS DOUBLE)) AS hhi
    FROM agg
    """,
)
def c_hhi_supplier(spark, sf_dir):
    """Supplier-concentration HHI per part (procurement risk): with
    quantity shares s_i, HHI = Σs_i² — 1.0 means single-sourced.
    Computed WITHOUT summing float shares (order-dependent): since
    HHI = Σq_i² / (Σq_i)², both sums accumulate as exact decimals and
    one final double division lands the ratio — the same
    exactness-by-algebra move as the corr/autocorr moments. Multiplicands
    cast to DECIMAL(19) for DuckDB's INT64-physical-type multiply (the
    c_autocorr trap)."""
    li = T(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q")
    )
    return (
        ps.groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("q").cast("decimal(19,4)")
                * F.col("q").cast("decimal(19,4)")
            ).alias("sq2"),
            F.sum("q").alias("qt"),
            F.count("*").cast("long").alias("n_suppliers"),
        )
        .select(
            "l_partkey",
            "n_suppliers",
            (
                F.col("sq2").cast("double")
                / (F.col("qt").cast("double") * F.col("qt").cast("double"))
            ).alias("hhi"),
        )
    )


@query(
    "c_seasonality_dow",
    oracle="""
    WITH d AS (SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
                      o_totalprice
               FROM orders),
    agg AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS rev
            FROM d GROUP BY 1),
    t AS (SELECT SUM(rev) AS total FROM agg)
    SELECT dow, n_orders, CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) AS rev_share
    FROM agg CROSS JOIN t
    """,
)
def c_seasonality_dow(spark, sf_dir):
    """Day-of-week seasonality profile: order count, revenue, and
    revenue share per weekday — the seasonality readout that decides
    whether a forecast needs a weekly component (pair with c_autocorr's
    lag-7). Exact decimal revenue, share = one double division against
    the broadcast total. DuckDB dayofweek is 0=Sunday; Spark's
    dayofweek() is 1=Sunday, so the engine side subtracts 1."""
    o = T(spark, sf_dir, "orders")
    agg = o.groupBy(
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("rev"),
    )
    t = agg.agg(F.sum("rev").alias("total"))
    return agg.crossJoin(F.broadcast(t)).select(
        "dow",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.col("total").cast("double")).alias(
            "rev_share"
        ),
    )


@query(
    "c_gini_revenue",
    oracle="""
    WITH per_cust AS (
      SELECT c_mktsegment AS seg, o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT seg, CAST(rev * 10000 AS DECIMAL(19,0)) AS rev_u,
             CAST(row_number() OVER (PARTITION BY seg
                                     ORDER BY rev, o_custkey) AS BIGINT)
               AS i
      FROM per_cust),
    agg AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(i AS DECIMAL(19,0)) * rev_u) AS si,
             SUM(rev_u) AS s
      FROM ranked GROUP BY seg)
    SELECT seg, n,
           2.0 * CAST(si AS DOUBLE) / (n * CAST(s AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / n AS gini
    FROM agg
    """,
)
def c_gini_revenue(spark, sf_dir):
    """Gini coefficient of customer revenue per segment — the
    inequality summary behind c_pareto_8020's point estimate, computed
    by the rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over
    ascending-sorted revenues (unique custkey tie-break). Σ(i·x_i) and
    Σx accumulate as exact decimals (rank × revenue widens to a decimal
    product — order-free), so the only floats are one final expression.
    One keyed agg, one segment-partitioned rank, one grouped rollup."""
    from pyspark.sql.window import Window as W

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("rev")
        )
    )
    w = W.partitionBy("seg").orderBy("rev", "o_custkey")
    # scale-0 units (rev × 10⁴, exact): the rank-weighted sum's unscaled
    # value passes 2^53 at sf1.0, where a scale-4 decimal→double converts
    # with TWO roundings in DuckDB but one in Spark (README rule, caught
    # by the sf1.0 sweep); scale-0 converts with one rounding on both,
    # and the 10⁴ factors cancel in si/s.
    ranked = per_cust.select(
        "seg",
        (F.col("rev") * 10000).cast("decimal(19,0)").alias("rev_u"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    agg = ranked.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("i").cast("decimal(19,0)") * F.col("rev_u")).alias("si"),
        F.sum("rev_u").alias("s"),
    )
    return agg.select(
        "seg",
        "n",
        (
            F.lit(2.0) * F.col("si").cast("double")
            / (F.col("n") * F.col("s").cast("double"))
            - (F.col("n").cast("double") + F.lit(1.0)) / F.col("n")
        ).alias("gini"),
    )


@query(
    "c_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT max(o_orderdate) AS today FROM orders),
    rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate),
                            (SELECT today FROM anchor)) AS BIGINT) AS r,
             CAST(count(*) AS BIGINT) AS f,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS m
      FROM orders GROUP BY 1),
    q AS (SELECT
            quantile_cont(CAST(r AS DOUBLE), 0.2) AS r1,
            quantile_cont(CAST(r AS DOUBLE), 0.4) AS r2,
            quantile_cont(CAST(r AS DOUBLE), 0.6) AS r3,
            quantile_cont(CAST(r AS DOUBLE), 0.8) AS r4,
            quantile_cont(CAST(f AS DOUBLE), 0.2) AS f1,
            quantile_cont(CAST(f AS DOUBLE), 0.4) AS f2,
            quantile_cont(CAST(f AS DOUBLE), 0.6) AS f3,
            quantile_cont(CAST(f AS DOUBLE), 0.8) AS f4,
            quantile_cont(m, 0.2) AS m1, quantile_cont(m, 0.4) AS m2,
            quantile_cont(m, 0.6) AS m3, quantile_cont(m, 0.8) AS m4
          FROM rfm),
    scored AS (
      SELECT o_custkey,
             CAST(6 - (1 + (CAST(r AS DOUBLE) > r1)::INT
                         + (CAST(r AS DOUBLE) > r2)::INT
                         + (CAST(r AS DOUBLE) > r3)::INT
                         + (CAST(r AS DOUBLE) > r4)::INT) AS BIGINT)
               AS r_score,
             CAST(1 + (CAST(f AS DOUBLE) > f1)::INT
                    + (CAST(f AS DOUBLE) > f2)::INT
                    + (CAST(f AS DOUBLE) > f3)::INT
                    + (CAST(f AS DOUBLE) > f4)::INT AS BIGINT) AS f_score,
             CAST(1 + (m > m1)::INT + (m > m2)::INT + (m > m3)::INT
                    + (m > m4)::INT AS BIGINT) AS m_score
      FROM rfm CROSS JOIN q)
    SELECT o_custkey, r_score, f_score, m_score,
           r_score || '-' || f_score || '-' || m_score AS rfm_code
    FROM scored
    """,
)
def c_rfm_segments(spark, sf_dir):
    """RFM segmentation: per customer, recency (days since last order,
    anchored at the corpus max date), frequency, monetary — each scored
    1-5 against the EXACT corpus quintiles. No global ntile (that would
    serialize through one partition): the twelve quantile thresholds
    compute in one scalar aggregate, broadcast, and scoring is four
    per-row comparisons per metric. Recency scores invert (recent =
    5). Thresholds and comparisons are identical doubles on both
    engines; quintile ties bucket identically because the compared
    values are bit-equal."""
    o = T(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("today"))
    rfm = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("today"), F.max("o_orderdate"))
            .cast("long")
            .alias("r"),
            F.count("*").cast("long").alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
            .cast("double")
            .alias("m"),
        )
    )
    qaggs = []
    for col, pfx in (("r", "r"), ("f", "f"), ("m", "m")):
        src = F.col(col).cast("double") if col != "m" else F.col("m")
        for i, p in enumerate((0.2, 0.4, 0.6, 0.8), 1):
            qaggs.append(F.percentile(src, F.lit(p)).alias(f"{pfx}{i}"))
    q = rfm.agg(*qaggs)

    def bucket(val, pfx):
        e = F.lit(1).cast("long")
        for i in (1, 2, 3, 4):
            e = e + (val > F.col(f"{pfx}{i}")).cast("long")
        return e

    scored = rfm.crossJoin(F.broadcast(q)).select(
        "o_custkey",
        (F.lit(6) - bucket(F.col("r").cast("double"), "r"))
        .cast("long")
        .alias("r_score"),
        bucket(F.col("f").cast("double"), "f").cast("long").alias("f_score"),
        bucket(F.col("m"), "m").cast("long").alias("m_score"),
    )
    return scored.select(
        "o_custkey",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm_code"),
    )


@query(
    "c_cart_abandonment",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM flagged),
    sessions AS (
      SELECT user_id, sess,
             date_trunc('week', min(ts)) AS week,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM numbered GROUP BY 1, 2)
    SELECT week,
           CAST(sum(v) AS BIGINT) AS n_view_sessions,
           CAST(sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_abandoned,
           CAST(sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END)
                AS DOUBLE) / sum(v) AS abandonment_rate
    FROM sessions GROUP BY week HAVING sum(v) > 0
    """,
)
def c_cart_abandonment(spark, sf_dir):
    """Cart abandonment by week: sessions (30-min gap) that contain a
    view but convert to no purchase, as a fraction of view-sessions —
    the funnel-leak KPI at session grain. Same sessionization window as
    c_session_funnel; per-session flags collapse in one keyed agg;
    integer counts + one final division."""
    from pyspark.sql.window import Window as W

    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id", "ts", "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
        "event_id",
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "event_type",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("sess"),
    )
    sessions = numbered.groupBy("user_id", "sess").agg(
        F.date_trunc("week", F.min("ts")).alias("week"),
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    ab = ((F.col("v") == 1) & (F.col("p") == 0)).cast("long")
    return (
        sessions.groupBy("week")
        .agg(
            F.sum("v").cast("long").alias("n_view_sessions"),
            F.sum(ab).alias("n_abandoned"),
        )
        .filter(F.col("n_view_sessions") > 0)
        .select(
            "week",
            "n_view_sessions",
            "n_abandoned",
            (
                F.col("n_abandoned").cast("double")
                / F.col("n_view_sessions")
            ).alias("abandonment_rate"),
        )
    )


@query(
    "c_shipping_delay",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
               AS delay_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT priority, CAST(count(*) AS BIGINT) AS n_items,
           median(CAST(delay_days AS DOUBLE)) AS median_days,
           quantile_cont(CAST(delay_days AS DOUBLE), 0.95) AS p95_days,
           CAST(max(delay_days) AS BIGINT) AS max_days
    FROM d GROUP BY priority
    """,
)
def c_shipping_delay(spark, sf_dir):
    """Order-to-ship latency distribution per order priority — the
    logistics SLA readout (does 1-URGENT actually ship faster?). One
    keyed join + one grouped exact-percentile agg over integer day
    gaps."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias(
            "delay_days"
        ),
    )
    return d.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.median(F.col("delay_days").cast("double")).alias("median_days"),
        F.percentile(F.col("delay_days").cast("double"), F.lit(0.95)).alias(
            "p95_days"
        ),
        F.max("delay_days").cast("long").alias("max_days"),
    )


@query(
    "c_simpson_diversity",
    oracle="""
    WITH words AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w
                   FROM documents),
    cnt AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
            FROM words GROUP BY 1, 2),
    agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(c * (c - 1)) AS BIGINT) AS rep
            FROM cnt GROUP BY 1)
    SELECT doc_id, n,
           CAST(rep AS DOUBLE) / (n * (n - 1.0)) AS simpson_d
    FROM agg WHERE n >= 2
    """,
)
def c_simpson_diversity(spark, sf_dir):
    """Simpson's diversity index per document: D = Σc_i(c_i−1)/(n(n−1))
    — the probability two random tokens coincide; 0 = maximally diverse
    vocabulary, →1 = one word repeated. A single-number lexical-richness
    complement to c_repetition_stats, and an exact rational of two
    BIGINTs (one final IEEE division — no rounding anywhere)."""
    d = T(spark, sf_dir, "documents")
    cnt = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("rep"),
    )
    return agg.filter(F.col("n") >= 2).select(
        "doc_id",
        "n",
        (
            F.col("rep").cast("double")
            / (F.col("n") * (F.col("n") - F.lit(1.0)))
        ).alias("simpson_d"),
    )


@query(
    "c_activity_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def c_activity_heatmap(spark, sf_dir):
    """Weekday × hour activity heatmap (events + distinct users per
    cell) — the load-profile grid behind capacity planning and send-time
    optimization. One grouped scan; DuckDB dayofweek is 0=Sunday vs
    Spark's 1=Sunday, so the engine side subtracts 1."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )


@query(
    "c_returns_rate",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS return_rate,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                         THEN CAST(l.l_extendedprice AS DECIMAL(20,4))
                         ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
             AS returned_value
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
)
def c_returns_rate(spark, sf_dir):
    """Return rate and returned value per brand (l_returnflag = 'R') —
    the product-quality KPI merchandising watches. Broadcast part dim
    into the fact scan, one grouped conditional aggregate;
    decimal-exact returned value, integer-ratio rate."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice"
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ret = (F.col("l_returnflag") == "R").cast("long")
    zero = F.lit(0).cast("decimal(20,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(ret).cast("long").alias("n_returned"),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.col("l_extendedprice").cast("decimal(20,4)"),
                ).otherwise(zero)
            )
            .cast("double")
            .alias("returned_value"),
        )
        .select(
            "brand",
            "n_items",
            "n_returned",
            (F.col("n_returned").cast("double") / F.col("n_items")).alias(
                "return_rate"
            ),
            "returned_value",
        )
    )


@query(
    "c_vocab_growth",
    oracle="""
    WITH words AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w
                   FROM documents),
    firsts AS (SELECT w, min(doc_id) AS fd FROM words GROUP BY 1),
    mx AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
    sliced AS (SELECT least(CAST(floor(fd * 10.0 / n_docs) AS BIGINT), 9)
                 AS slice, count(*) AS new_terms
               FROM firsts CROSS JOIN mx GROUP BY 1),
    cum AS (SELECT a.slice,
                   CAST(sum(b.new_terms) AS BIGINT) AS vocab_size
            FROM sliced a JOIN sliced b ON b.slice <= a.slice
            GROUP BY a.slice)
    SELECT slice, vocab_size FROM cum
    """,
)
def c_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth: distinct vocabulary size after each
    tenth of the corpus (by doc_id) — the curve that says whether more
    data still buys new tokens (flattening = diminishing vocabulary
    returns; the readout that sizes tokenizer vocabularies). Each term
    attributes to the corpus slice of its FIRST occurrence; cumulative
    vocab per slice comes from a ≤-self-join over the 10-row slice frame
    (the skyline-staircase trick — no global window)."""
    d = T(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    firsts = words.groupBy("w").agg(F.min("doc_id").alias("fd"))
    mx = d.agg((F.max("doc_id") + 1).alias("n_docs"))
    sliced = (
        firsts.crossJoin(F.broadcast(mx))
        .groupBy(
            F.least(
                F.floor(F.col("fd") * 10.0 / F.col("n_docs")).cast("long"),
                F.lit(9).cast("long"),
            ).alias("slice")
        )
        .agg(F.count("*").alias("new_terms"))
    )
    a = sliced.select(F.col("slice"), F.col("new_terms").alias("_na"))
    b = sliced.select(
        F.col("slice").alias("_sb"), F.col("new_terms").alias("_nb")
    )
    return (
        a.join(F.broadcast(b), F.col("_sb") <= F.col("slice"))
        .groupBy("slice")
        .agg(F.sum("_nb").cast("long").alias("vocab_size"))
    )
