"""Round-7 statistics family — rank/association statistics, concentration
curves, two-sample tests, resampling inference, chain/survival models,
and embedding curation screens.

Reference basis: the reference's ``bq_query`` passthrough surface
(popelines/main.py:208-216) delegates arbitrary analyst SQL to BigQuery;
these registry entries re-express the recurring statistics-on-SQL idioms
(rank correlation, independence tests, concentration curves) as native
Spark plans with DuckDB oracle twins.

Determinism per registry rules (queries/_util.py + memory notes):
 - integer pair/tie counting stays in BIGINT end-to-end; the single final
   division (and sqrt) runs on doubles that are exact images of those
   integers — per-row IEEE arithmetic, no multi-row double accumulation;
 - chi² terms are per-row doubles rounded to 9dp, accumulated in DECIMAL
   (order-free), cast to double at the end;
 - cumulative shares use the broadcast ≤-staircase join (c_skyline /
   c_cusum_revenue pattern), never a partition-less window;
 - any frame feeding ≥2 join legs is checkpointed (Spark) and
   MATERIALIZED (DuckDB) so both engines compute it exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.operators.par import spread
from popelines_spark.plans.inspect import checkpoint
from popelines_spark.registry import query
from popelines_spark.queries._util import T, dsum, sql_dsum


@query(
    "c_kendall_tau",
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CAST(floor(l.l_extendedprice / 10000) AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2, 3),
    pairs AS (
      SELECT a.brand,
             CAST(SUM(CASE WHEN a.y < b.y THEN a.cnt * b.cnt ELSE 0 END)
                  AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN a.y > b.y THEN a.cnt * b.cnt ELSE 0 END)
                  AS BIGINT) AS disc
      FROM cells a JOIN cells b ON a.brand = b.brand AND a.x < b.x
      GROUP BY a.brand),
    tx AS (
      SELECT brand, CAST(SUM(g * (g - 1) / 2) AS BIGINT) AS n1
      FROM (SELECT brand, x, SUM(cnt) AS g FROM cells GROUP BY 1, 2)
      GROUP BY brand),
    ty AS (
      SELECT brand, CAST(SUM(g * (g - 1) / 2) AS BIGINT) AS n2
      FROM (SELECT brand, y, SUM(cnt) AS g FROM cells GROUP BY 1, 2)
      GROUP BY brand),
    tot AS (
      SELECT brand, CAST(SUM(cnt) AS BIGINT) AS n FROM cells GROUP BY brand)
    SELECT t.brand, t.n, p.conc, p.disc,
           round((p.conc - p.disc) /
                 sqrt(CAST(t.n * (t.n - 1) / 2 - x.n1 AS DOUBLE) *
                      CAST(t.n * (t.n - 1) / 2 - y.n2 AS DOUBLE)),
                 6) AS tau_b
    FROM tot t JOIN pairs p USING (brand)
               JOIN tx x USING (brand) JOIN ty y USING (brand)
    """,
)
def c_kendall_tau(spark, sf_dir):
    """Tie-corrected Kendall's tau-b per brand between price magnitude
    (10k-dollar bucket) and quantity — the rank-association twin of
    `c_spearman_brand` that is robust to the value ties rank averaging
    has to correct for.

    Scale shape: raw lineitem is collapsed FIRST to (brand, x, y, cnt)
    cells — the cell count is bounded by the bucket design (~10 price
    buckets × ~50 integer quantities per brand), NOT by row count, so
    the pair self-join is constant-size at any corpus scale and the
    broadcast side stays tiny. Concordant/discordant/tie counts are
    exact BIGINT sums of cnt products; only the final tau ratio touches
    doubles (exact integer images, one IEEE sqrt + divide per brand)."""
    li = T(spark, sf_dir, "lineitem")
    pt = T(spark, sf_dir, "part")
    cells = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.floor(F.col("l_extendedprice") / 10000).cast("long").alias("x"),
            F.col("l_quantity").cast("long").alias("y"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # Four downstream legs (pairs, x-ties, y-ties, totals) — compute once.
    cells = checkpoint(cells, "kendall-cells", eager=False)
    b = cells.select(
        F.col("brand").alias("brand2"), F.col("x").alias("x2"),
        F.col("y").alias("y2"), F.col("cnt").alias("cnt2"),
    )
    pairs = (
        cells.join(
            F.broadcast(b),
            (F.col("brand") == F.col("brand2")) & (F.col("x") < F.col("x2")),
        )
        .groupBy("brand")
        .agg(
            F.sum(
                F.when(F.col("y") < F.col("y2"),
                       F.col("cnt") * F.col("cnt2")).otherwise(F.lit(0))
            ).cast("long").alias("conc"),
            F.sum(
                F.when(F.col("y") > F.col("y2"),
                       F.col("cnt") * F.col("cnt2")).otherwise(F.lit(0))
            ).cast("long").alias("disc"),
        )
    )
    tx = (
        cells.groupBy("brand", "x").agg(F.sum("cnt").alias("g"))
        .groupBy("brand")
        .agg(
            F.sum(F.col("g") * (F.col("g") - 1) / 2).cast("long").alias("n1")
        )
    )
    ty = (
        cells.groupBy("brand", "y").agg(F.sum("cnt").alias("g"))
        .groupBy("brand")
        .agg(
            F.sum(F.col("g") * (F.col("g") - 1) / 2).cast("long").alias("n2")
        )
    )
    tot = cells.groupBy("brand").agg(F.sum("cnt").cast("long").alias("n"))
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return (
        tot.join(pairs, "brand").join(tx, "brand").join(ty, "brand")
        .select(
            "brand", "n", "conc", "disc",
            F.round(
                (F.col("conc") - F.col("disc"))
                / F.sqrt(
                    (n0 - F.col("n1")).cast("double")
                    * (n0 - F.col("n2")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


@query(
    "c_chi2_independence",
    oracle="""
    WITH joint AS MATERIALIZED (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS obs
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    rt AS (SELECT segment, CAST(SUM(obs) AS BIGINT) AS row_tot
           FROM joint GROUP BY segment),
    ct AS (SELECT priority, CAST(SUM(obs) AS BIGINT) AS col_tot
           FROM joint GROUP BY priority),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS total FROM joint),
    terms AS (
      -- FULL row x column cross, not just observed cells: an EMPTY
      -- contingency cell still contributes its expected count to the
      -- chi-squared sum (obs=0 -> term = expected); joining through
      -- observed cells only understates the statistic on sparse data
      SELECT r.segment,
             COALESCE(j.obs, 0) AS obs,
             round(pow(COALESCE(j.obs, 0)
                       - CAST(r.row_tot * c.col_tot AS DOUBLE) / n.total,
                       2)
                   / (CAST(r.row_tot * c.col_tot AS DOUBLE) / n.total),
                   9) AS term
      FROM rt r CROSS JOIN ct c CROSS JOIN n
           LEFT JOIN joint j
             ON j.segment = r.segment AND j.priority = c.priority)
    SELECT segment,
           CAST(SUM(obs) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(term AS DECIMAL(24,9))) AS DOUBLE) AS chi2_part
    FROM terms GROUP BY segment
    """,
)
def c_chi2_independence(spark, sf_dir):
    """Chi-squared independence screen for market segment × order
    priority, reported as per-segment partial statistics (their sum is
    the full χ² — the classic contingency drift/dependence check a
    curation pipeline runs on categorical metadata).

    Scale shape: one keyed join + one (segment, priority) rollup; the
    contingency table itself is category-bounded (5×5), so the expected
    counts and χ² terms are computed over a constant-size frame. Each
    term is a per-row double (exact integer inputs, two IEEE divides)
    rounded to 9dp, accumulated order-free in DECIMAL."""
    cu = T(spark, sf_dir, "customer")
    od = T(spark, sf_dir, "orders")
    joint = (
        cu.join(od, od.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").cast("long").alias("obs"))
    )
    joint = checkpoint(joint, "chi2-joint", eager=False)
    rt = joint.groupBy("segment").agg(
        F.sum("obs").cast("long").alias("row_tot")
    )
    ct = joint.groupBy("priority").agg(
        F.sum("obs").cast("long").alias("col_tot")
    )
    n = joint.agg(F.sum("obs").cast("long").alias("total"))
    expected = (
        (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("total")
    )
    term = F.round(
        F.pow(F.col("obs") - expected, F.lit(2)) / expected, 9
    )
    # FULL row x column cross (category-bounded, broadcast), not just
    # observed cells: an empty contingency cell still contributes its
    # expected count (obs=0 -> term = expected) — joining through
    # observed cells only understates chi-squared on sparse data
    return (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(joint), ["segment", "priority"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
        .select("segment", "obs", term.alias("term"))
        .groupBy("segment")
        .agg(
            F.sum("obs").cast("long").alias("n_orders"),
            F.sum(F.col("term").cast("decimal(24,9)"))
            .cast("double")
            .alias("chi2_part"),
        )
    )


@query(
    "c_lorenz_points",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey, {dsum} AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT seg, s,
             row_number() OVER (PARTITION BY seg
                                ORDER BY s, o_custkey) AS rn,
             count(*) OVER (PARTITION BY seg) AS n
      FROM spend),
    bands AS MATERIALIZED (
      SELECT seg, CAST((rn - 1) * 10 // n AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             SUM(CAST(s AS DECIMAL(20,4))) AS band_spend
      FROM ranked GROUP BY 1, 2),
    tot AS (SELECT seg, CAST(SUM(band_spend) AS DECIMAL(20,4)) AS total
            FROM bands GROUP BY seg)
    SELECT a.seg, a.decile, a.n_customers,
           CAST(a.band_spend AS DOUBLE) AS band_spend,
           round(CAST(SUM(b.band_spend) AS DOUBLE) / CAST(t.total AS DOUBLE),
                 6) AS cum_share
    FROM bands a JOIN bands b ON b.seg = a.seg AND b.decile <= a.decile
         JOIN tot t ON t.seg = a.seg
    GROUP BY a.seg, a.decile, a.n_customers, a.band_spend, t.total
    """.format(dsum=sql_dsum("o.o_totalprice")),
)
def c_lorenz_points(spark, sf_dir):
    """Lorenz curve of customer spend per market segment: per
    spend-decile cumulative revenue share — the curve behind
    `c_gini_revenue`'s scalar, giving the full inequality profile
    ("bottom 50% of this segment's customers hold 8% of its revenue").

    Scale shape: per-customer rollup, segment-partitioned rank (the
    c_gini_revenue window — no global window), decile assignment via
    exact integer band arithmetic ((rn-1)*10 // n — the proven
    c_percentile_bands shape, no engine-specific ntile), then the
    seg×10-row band table broadcast through a ≤-staircase join for the
    cumulative sums. Spend stays in DECIMAL until the single share
    division."""
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    from pyspark.sql.window import Window as W

    spend = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(dsum("o_totalprice").alias("s"))
    )
    w = W.partitionBy("seg").orderBy("s", "o_custkey")
    ranked = spend.select(
        "seg",
        "s",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("seg")).alias("n"),
    )
    bands = (
        ranked.groupBy(
            "seg",
            ((F.col("rn") - 1) * 10 / F.col("n"))
            .cast("long")
            .alias("decile"),
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(F.col("s").cast("decimal(20,4)")).alias("band_spend"),
        )
    )
    bands = checkpoint(bands, "lorenz-bands", eager=False)
    tot = bands.groupBy("seg").agg(
        F.sum("band_spend").cast("decimal(20,4)").alias("total")
    )
    b2 = bands.select(
        F.col("seg").alias("seg2"),
        F.col("decile").alias("decile2"),
        F.col("band_spend").alias("band_spend2"),
    )
    return (
        bands.join(
            F.broadcast(b2),
            (F.col("seg2") == F.col("seg"))
            & (F.col("decile2") <= F.col("decile")),
        )
        .join(F.broadcast(tot), "seg")
        .groupBy("seg", "decile", "n_customers", "band_spend", "total")
        .agg(F.sum("band_spend2").cast("decimal(20,4)").alias("cum"))
        .select(
            "seg",
            "decile",
            "n_customers",
            F.col("band_spend").cast("double").alias("band_spend"),
            F.round(
                F.col("cum").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("cum_share"),
        )
    )


@query(
    "c_heavy_hitters",
    oracle="""
    WITH w AS (SELECT unnest(str_split(text, ' ')) AS term FROM documents),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
    SELECT term, cnt, total FROM c CROSS JOIN tot
    WHERE cnt * 40 > total
    """,
)
def c_heavy_hitters(spark, sf_dir):
    """Exact frequent terms (frequency > 1/40 of the token stream) via
    the two-pass Misra-Gries shape: a shuffle-free per-partition sketch
    pass yields a bounded candidate superset, then ONLY the broadcast
    candidates are exact-counted and thresholded by integer
    cross-multiplication — the output is the exact heavy-hitter set, so
    the DuckDB oracle is the plain full-vocabulary HAVING query.

    At 100 TB the full-vocab groupBy the oracle runs would shuffle every
    distinct term; the sketch path shuffles ≤ capacity×n_partitions
    candidate rows and one broadcast. llm/sketch.py:heavy_hitters
    carries the guarantee math (capacity 2·denom ≥ the N/(capacity+1)
    survival bar)."""
    from popelines_spark.llm.sketch import heavy_hitters

    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return heavy_hitters(toks, "term", denom=40)


@query(
    "c_pmi_bigrams",
    oracle="""
    WITH arrs AS (SELECT str_split(text, ' ') AS arr FROM documents
                  WHERE len(str_split(text, ' ')) >= 2),
    bgr AS (SELECT unnest(list_transform(range(len(arr) - 1),
                          i -> arr[i+1])) AS w1,
                   unnest(list_transform(range(len(arr) - 1),
                          i -> arr[i+2])) AS w2
            FROM arrs),
    bgc AS MATERIALIZED (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
      FROM bgr GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM bgc GROUP BY 1),
    c2 AS (SELECT w2, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM bgc GROUP BY 1),
    n AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n_bg FROM bgc),
    scored AS (
      SELECT w1, w2, c_xy,
             CAST(c_xy AS DOUBLE) * n_bg / (c_x * CAST(c_y AS DOUBLE))
               AS ratio
      FROM bgc JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
      WHERE c_xy >= 5)
    SELECT w1, w2, c_xy, round(ln(ratio), 6) AS pmi
    FROM scored
    ORDER BY ratio DESC, w1, w2 LIMIT 50
    """,
)
def c_pmi_bigrams(spark, sf_dir):
    """Top-50 collocations by pointwise mutual information: bigrams
    whose joint frequency most exceeds the independence expectation of
    their first/second-position marginals (c_xy ≥ 5 noise floor) — the
    classic phrase-mining signal over a pretraining corpus.

    Determinism: the RANKING key is the rational ratio c_xy·N/(c_x·c_y)
    computed with per-row IEEE arithmetic on exact integers (identical
    doubles on both engines, unique (w1,w2) tie-break) — ln() touches
    only the REPORTED pmi, rounded to 6dp, so a 1-ulp libm divergence
    cannot reorder the result set. Scale shape: one bigram rollup
    (vocab²-bounded), two marginal rollups of the rollup, broadcast
    joins — corpus size only enters the first keyed agg."""
    docs = T(spark, sf_dir, "documents")
    arr = docs.select(F.split(F.col("text"), " ").alias("arr")).where(
        F.size("arr") >= 2
    )
    bgr = arr.select(
        "arr", F.posexplode(F.slice("arr", 1, F.size("arr") - 1))
    ).select(
        F.col("col").alias("w1"),
        F.expr("arr[pos + 1]").alias("w2"),
    )
    bgc = bgr.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c_xy")
    )
    bgc = checkpoint(bgc, "pmi-bigram-counts", eager=False)
    c1 = bgc.groupBy("w1").agg(F.sum("c_xy").cast("long").alias("c_x"))
    c2 = bgc.groupBy("w2").agg(F.sum("c_xy").cast("long").alias("c_y"))
    n = bgc.agg(F.sum("c_xy").cast("long").alias("n_bg"))
    ratio = (
        F.col("c_xy").cast("double")
        * F.col("n_bg")
        / (F.col("c_x") * F.col("c_y").cast("double"))
    )
    return (
        bgc.where(F.col("c_xy") >= 5)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c_xy", ratio.alias("ratio"))
        .orderBy(F.col("ratio").desc(), "w1", "w2")
        .limit(50)
        .select(
            "w1", "w2", "c_xy", F.round(F.log("ratio"), 6).alias("pmi")
        )
    )


@query(
    "c_km_curve",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders),
    anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    life AS (
      SELECT f.o_custkey,
             CAST(CASE WHEN s.d IS NOT NULL
                       THEN date_diff('day', f.d, s.d)
                       ELSE date_diff('day', f.d, a.maxd) END AS BIGINT)
               AS dur,
             CASE WHEN s.d IS NOT NULL THEN 1 ELSE 0 END AS evt
      FROM (SELECT * FROM ranked WHERE rn = 1) f
      LEFT JOIN (SELECT * FROM ranked WHERE rn = 2) s USING (o_custkey)
      CROSS JOIN anchor a),
    grain AS MATERIALIZED (
      SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
             CAST(SUM(evt) AS BIGINT) AS d_evt
      FROM life GROUP BY dur),
    ev AS MATERIALIZED (
      SELECT t.dur AS t, t.d_evt AS d_t,
             CAST(SUM(g.n_all) AS BIGINT) AS n_risk
      FROM grain t JOIN grain g ON g.dur >= t.dur
      WHERE t.d_evt > 0
      GROUP BY t.dur, t.d_evt),
    terms AS (
      SELECT t, d_t, n_risk,
             round(-ln(1 - CAST(d_t AS DOUBLE) / n_risk), 9) AS term
      FROM ev WHERE d_t < n_risk)
    SELECT a.t, a.d_t, a.n_risk,
           round(CAST(SUM(CAST(b.term AS DECIMAL(20,9))) AS DOUBLE), 6)
             AS km_nls
    FROM terms a JOIN terms b ON b.t <= a.t
    GROUP BY a.t, a.d_t, a.n_risk
    """,
)
def c_km_curve(spark, sf_dir):
    """Kaplan-Meier curve for time-to-second-order (repeat purchase):
    one-order customers are right-censored at the corpus horizon, and
    the curve is reported as the cumulative hazard km_nls = -ln S(t) at
    each event time — survival itself is exp(-km_nls), but the product
    is kept in log space so the cumulative is an order-free DECIMAL sum
    of per-row 9dp-rounded hazard terms, not a float product chain.

    Scale shape: per-customer first/second-order rollup (one keyed
    window), then everything runs on the day-grain life table — a
    calendar-bounded frame (thousands of rows at ANY corpus size) walked
    with broadcast ≥/≤ staircase joins for risk sets and cumulative
    hazards; no global window, no O(N²) anywhere past the rollup."""
    from pyspark.sql.window import Window as W

    od = T(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = od.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    ranked = checkpoint(ranked, "km-ranked", eager=False)
    anchor = od.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    f = ranked.where(F.col("rn") == 1).select("o_custkey", "d")
    s = ranked.where(F.col("rn") == 2).select(
        "o_custkey", F.col("d").alias("d2")
    )
    life = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d")
            )
            .otherwise(F.datediff("maxd", "d"))
            .cast("long")
            .alias("dur"),
            F.when(F.col("d2").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("evt"),
        )
    )
    grain = life.groupBy("dur").agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("evt").cast("long").alias("d_evt"),
    )
    grain = checkpoint(grain, "km-grain", eager=False)
    g2 = grain.select(
        F.col("dur").alias("dur2"), F.col("n_all").alias("n_all2")
    )
    ev = (
        grain.where(F.col("d_evt") > 0)
        .join(F.broadcast(g2), F.col("dur2") >= F.col("dur"))
        .groupBy(F.col("dur").alias("t"), F.col("d_evt").alias("d_t"))
        .agg(F.sum("n_all2").cast("long").alias("n_risk"))
    )
    terms = ev.where(F.col("d_t") < F.col("n_risk")).select(
        "t", "d_t", "n_risk",
        F.round(
            -F.log(F.lit(1) - F.col("d_t").cast("double") / F.col("n_risk")),
            9,
        ).alias("term"),
    )
    terms = checkpoint(terms, "km-terms", eager=False)
    b = terms.select(F.col("t").alias("t2"), F.col("term").alias("term2"))
    return (
        terms.join(F.broadcast(b), F.col("t2") <= F.col("t"))
        .groupBy("t", "d_t", "n_risk")
        .agg(
            F.round(
                F.sum(F.col("term2").cast("decimal(20,9)")).cast("double"),
                6,
            ).alias("km_nls")
        )
    )


@query(
    "c_max_concurrent",
    oracle="""
    WITH spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
      FROM events GROUP BY 1, 2),
    deltas AS (
      SELECT day, t, CAST(SUM(d) AS BIGINT) AS net,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_starts
      FROM (SELECT day, s AS t, 1 AS d FROM spans
            UNION ALL
            SELECT day, e + 1, -1 FROM spans)
      GROUP BY day, t),
    walked AS (
      SELECT day, n_starts,
             SUM(net) OVER (PARTITION BY day ORDER BY t) AS cur
      FROM deltas)
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(max(cur) AS BIGINT) AS max_concurrent,
           CAST(SUM(n_starts) AS BIGINT) AS n_spans
    FROM walked GROUP BY day
    """,
)
def c_max_concurrent(spark, sf_dir):
    """Peak concurrency per day: each user's daily activity span
    [first event, last event] is an interval; the classic ±1 sweep-line
    (ends applied one µs AFTER the endpoint, so touching intervals
    count as concurrent) gives the running active-user count and its
    daily max — the capacity-planning number behind session stores and
    rate limits.

    Determinism: deltas are pre-aggregated per (day, µs-timestamp), so
    the cumulative window's ORDER BY key is unique — no tie ordering
    for engines to disagree on; all integers. Scale shape: one keyed
    rollup to spans, one to net deltas, then a DAY-partitioned ordered
    window (bounded by distinct active µs per day; the partition key
    spreads days across the cluster)."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min(F.unix_micros("ts")).alias("s"),
        F.max(F.unix_micros("ts")).alias("e"),
    )
    starts = spans.select("day", F.col("s").alias("t"), F.lit(1).alias("d"))
    ends = spans.select(
        "day", (F.col("e") + 1).alias("t"), F.lit(-1).alias("d")
    )
    deltas = (
        starts.unionAll(ends)
        .groupBy("day", "t")
        .agg(
            F.sum("d").cast("long").alias("net"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_starts"),
        )
    )
    walked = deltas.select(
        "day",
        "n_starts",
        F.sum("net").over(W.partitionBy("day").orderBy("t")).alias("cur"),
    )
    return walked.groupBy("day").agg(
        F.max("cur").cast("long").alias("max_concurrent"),
        F.sum("n_starts").cast("long").alias("n_spans"),
    ).select(
        # DATE round-trips as midnight Timestamp through pandas on the
        # DuckDB side — emit TIMESTAMP on both engines (repo convention,
        # c_time_to_convert)
        F.col("day").cast("timestamp").alias("day"),
        "max_concurrent",
        "n_spans",
    )


@query(
    "c_theilsen_trend",
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT CAST(date_diff('day',
                   (SELECT min(CAST(l_shipdate AS DATE)) FROM lineitem),
                   CAST(l_shipdate AS DATE)) AS BIGINT) AS t,
             SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS rev
      FROM lineitem GROUP BY 1),
    slopes AS (
      SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.t - a.t) AS slope
      FROM d a JOIN d b ON b.t > a.t)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6) AS theil_slope
    FROM slopes
    """,
)
def c_theilsen_trend(spark, sf_dir):
    """Theil-Sen estimator of the daily-revenue trend: the median of
    all pairwise day-to-day slopes — the robust regression line a
    single promotional spike cannot drag (the complement of
    c_forecast_smape's point forecasts and c_cusum_revenue's
    change-points).

    Scale shape: the corpus collapses to the calendar-bounded day grain
    FIRST; the O(days²) pair set (~3M pairs on a 7-year calendar —
    constant in corpus size) is produced by a broadcast self-join and
    reduced by one exact interpolated median. Each slope is a per-row
    IEEE divide of an exact decimal difference by an exact integer —
    identical doubles on both engines; Spark's percentile() and
    DuckDB's quantile_cont share the same interpolation."""
    li = T(spark, sf_dir, "lineitem")
    t0 = li.agg(
        F.min(F.col("l_shipdate").cast("date")).alias("d0")
    )
    d = (
        li.crossJoin(F.broadcast(t0))
        .groupBy(
            F.datediff(F.col("l_shipdate").cast("date"), F.col("d0"))
            .cast("long")
            .alias("t")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).alias(
                "rev"
            )
        )
    )
    d = checkpoint(d, "theilsen-days", eager=False)
    b = d.select(F.col("t").alias("t2"), F.col("rev").alias("rev2"))
    slopes = d.join(F.broadcast(b), F.col("t2") > F.col("t")).select(
        (
            (F.col("rev2") - F.col("rev")).cast("double")
            / (F.col("t2") - F.col("t"))
        ).alias("slope")
    )
    n_days = d.agg(F.count("*").cast("long").alias("n_days"))
    return slopes.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_slope"),
    ).crossJoin(F.broadcast(n_days)).select(
        "n_days", "n_pairs", "theil_slope"
    )


@query(
    "c_heaps_law",
    oracle="""
    WITH arrs AS (SELECT doc_id, str_split(text, ' ') AS arr FROM documents
                  WHERE len(str_split(text, ' ')) >= 2),
    mx AS (SELECT max(doc_id) AS m FROM documents),
    bgr AS MATERIALIZED (
      SELECT CAST(doc_id * 10 // (m + 1) AS BIGINT) AS bucket,
             unnest(list_transform(range(len(arr) - 1),
                    i -> arr[i+1] || ' ' || arr[i+2])) AS bg
      FROM arrs CROSS JOIN mx),
    per_bucket AS (SELECT bucket, CAST(count(*) AS BIGINT) AS toks
                   FROM bgr GROUP BY bucket),
    first_seen AS (SELECT bg, CAST(min(bucket) AS BIGINT) AS fb
                   FROM bgr GROUP BY bg),
    vocab_new AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS fresh
                  FROM first_seen GROUP BY fb)
    SELECT a.bucket,
           CAST(SUM(b.toks) AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(v.fresh, 0)) AS BIGINT) AS cum_vocab,
           round(ln(CAST(SUM(COALESCE(v.fresh, 0)) AS DOUBLE))
                 / ln(CAST(SUM(b.toks) AS DOUBLE)), 6) AS heaps_beta
    FROM per_bucket a
    JOIN per_bucket b ON b.bucket <= a.bucket
    LEFT JOIN vocab_new v ON v.bucket = b.bucket
    GROUP BY a.bucket
    """,
)
def c_heaps_law(spark, sf_dir):
    """Heaps-law vocabulary-growth curve over the bigram vocabulary:
    cumulative distinct bigrams vs cumulative bigram tokens across ten
    corpus-order buckets, with the empirical exponent
    β = ln V / ln N per point — the saturation diagnostic that tells a
    corpus curator whether more data still buys new language (the
    growth-side complement of c_zipf_fit's frequency side).

    Cumulative DISTINCT counting is made distributable by the
    first-occurrence trick: each term contributes exactly once, at its
    MINIMUM bucket (one keyed agg), so cumulative vocabulary is a plain
    SUM over the 10-row bucket table's staircase — no windowed
    count-distinct anywhere. Bucket assignment is exact integer
    arithmetic on doc_id against a broadcast max."""
    docs = T(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("m"))
    arr = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("arr")
    ).where(F.size("arr") >= 2)
    bgr = (
        arr.crossJoin(F.broadcast(mx))
        .select(
            (F.col("doc_id") * 10 / (F.col("m") + 1))
            .cast("long")
            .alias("bucket"),
            "arr",
        )
        .select(
            "bucket",
            "arr",
            F.posexplode(F.slice("arr", 1, F.size("arr") - 1)),
        )
        .select(
            "bucket",
            F.concat_ws(
                " ", F.col("col"), F.expr("arr[pos + 1]")
            ).alias("bg"),
        )
    )
    bgr = checkpoint(bgr, "heaps-bigrams", eager=False)
    per_bucket = bgr.groupBy("bucket").agg(
        F.count("*").cast("long").alias("toks")
    )
    vocab_new = (
        bgr.groupBy("bg")
        .agg(F.min("bucket").cast("long").alias("fb"))
        .groupBy(F.col("fb").alias("bucket"))
        .agg(F.count("*").cast("long").alias("fresh"))
    )
    per_bucket = checkpoint(per_bucket, "heaps-buckets", eager=False)
    b = per_bucket.select(
        F.col("bucket").alias("bucket2"), F.col("toks").alias("toks2")
    ).join(
        F.broadcast(
            vocab_new.select(
                F.col("bucket").alias("bucket2"), "fresh"
            )
        ),
        "bucket2",
        "left",
    )
    return (
        per_bucket.join(
            F.broadcast(b), F.col("bucket2") <= F.col("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.sum("toks2").cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("fresh"), F.lit(0)))
            .cast("long")
            .alias("cum_vocab"),
        )
        .select(
            "bucket",
            "cum_tokens",
            "cum_vocab",
            F.round(
                F.log(F.col("cum_vocab").cast("double"))
                / F.log(F.col("cum_tokens").cast("double")),
                6,
            ).alias("heaps_beta"),
        )
    )


@query(
    "c_ks_source",
    oracle="""
    WITH grain AS MATERIALIZED (
      SELECT source, CAST(n_chars AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    support AS MATERIALIZED (SELECT DISTINCT v FROM grain),
    all_g AS MATERIALIZED (
      SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM grain GROUP BY v),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM grain),
    src_n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n1
              FROM grain GROUP BY source),
    cdf_src AS (
      -- FULL source x support grid: a support point BELOW a source's
      -- minimum value has cum1 = 0 but the rest-of-corpus CDF there can
      -- be large — the inner-join staircase dropped those points and
      -- understated the KS max whenever it occurred below the source's
      -- min (review r12: caught by an independent numpy third engine,
      -- invisible to DuckDB parity because both sides colluded)
      SELECT src.source, s.v, CAST(COALESCE(SUM(g.c), 0) AS BIGINT) AS cum1
      FROM support s
      CROSS JOIN (SELECT DISTINCT source FROM grain) src
      LEFT JOIN grain g ON g.source = src.source AND g.v <= s.v
      GROUP BY src.source, s.v),
    cdf_all AS (
      SELECT s.v, CAST(SUM(a.c) AS BIGINT) AS cum
      FROM support s JOIN all_g a ON a.v <= s.v
      GROUP BY s.v)
    SELECT c.source, sn.n1, (t.n - sn.n1) AS n2,
           CAST(max(abs(c.cum1 * (t.n - sn.n1)
                        - (ca.cum - c.cum1) * sn.n1)) AS BIGINT)
             AS ks_scaled,
           round(CAST(max(abs(c.cum1 * (t.n - sn.n1)
                              - (ca.cum - c.cum1) * sn.n1)) AS DOUBLE)
                 / (sn.n1 * CAST(t.n - sn.n1 AS DOUBLE)), 6) AS ks
    FROM cdf_src c
    JOIN cdf_all ca ON ca.v = c.v
    JOIN src_n sn ON sn.source = c.source
    CROSS JOIN tot t
    GROUP BY c.source, sn.n1, t.n
    """,
)
def c_ks_source(spark, sf_dir):
    """Per-source Kolmogorov-Smirnov distance between a source's
    doc-length distribution and the REST of the corpus — the
    distribution-drift screen that flags a crawler or extractor whose
    output stopped looking like everyone else's (one rung above
    c_drift_psi's binned divergence: KS needs no bin design).

    Exactness: the statistic is computed in cross-multiplied integers
    (|cum₁·n₂ − cum₂·n₁|, max over the support) — the division by n₁·n₂
    happens once per source on exact integer images, so there is no
    float CDF anywhere. Scale shape: corpus → (source, length) grain in
    one keyed agg; every staircase runs on the value support, which is
    bounded by the length domain, not the corpus."""
    docs = T(spark, sf_dir, "documents")
    grain = docs.groupBy(
        "source", F.col("n_chars").cast("long").alias("v")
    ).agg(F.count("*").cast("long").alias("c"))
    grain = checkpoint(grain, "ks-grain", eager=False)
    support = grain.select("v").distinct()
    all_g = grain.groupBy("v").agg(F.sum("c").cast("long").alias("ca"))
    tot = grain.agg(F.sum("c").cast("long").alias("n"))
    src_n = grain.groupBy("source").agg(
        F.sum("c").cast("long").alias("n1")
    )
    g2 = grain.select(
        F.col("source").alias("src2"), F.col("v").alias("v2"),
        F.col("c").alias("c2"),
    )
    # FULL source x support grid (both sides bounded: support by the
    # length domain, sources by the corpus design): a support point
    # BELOW a source's minimum has cum1 = 0 while the rest-of-corpus
    # CDF there can be large — the inner-join staircase dropped those
    # points and understated the KS max whenever it occurred below the
    # source's min (review r12, numpy third-engine find)
    cdf_src = (
        support.crossJoin(F.broadcast(grain.select("source").distinct()))
        .join(
            F.broadcast(g2),
            (F.col("src2") == F.col("source")) & (F.col("v2") <= F.col("v")),
            "left",
        )
        .groupBy("source", "v")
        .agg(F.coalesce(F.sum("c2"), F.lit(0)).cast("long").alias("cum1"))
    )
    a2 = all_g.select(F.col("v").alias("va"), F.col("ca").alias("ca2"))
    cdf_all = (
        support.join(F.broadcast(a2), F.col("va") <= F.col("v"))
        .groupBy("v")
        .agg(F.sum("ca2").cast("long").alias("cum"))
    )
    d_scaled = F.abs(
        F.col("cum1") * (F.col("n") - F.col("n1"))
        - (F.col("cum") - F.col("cum1")) * F.col("n1")
    )
    return (
        cdf_src.join(F.broadcast(cdf_all), "v")
        .join(F.broadcast(src_n), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n1", "n")
        .agg(F.max(d_scaled).cast("long").alias("ks_scaled"))
        .select(
            "source",
            "n1",
            (F.col("n") - F.col("n1")).alias("n2"),
            "ks_scaled",
            F.round(
                F.col("ks_scaled").cast("double")
                / (F.col("n1") * (F.col("n") - F.col("n1")).cast("double")),
                6,
            ).alias("ks"),
        )
    )


@query(
    "c_mannwhitney",
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT c.c_mktsegment AS seg,
             CAST(floor(o.o_totalprice / 100) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    all_b AS MATERIALIZED (
      SELECT b, CAST(SUM(cnt) AS BIGINT) AS ca FROM cells GROUP BY b),
    cum_all AS (
      SELECT s.b, CAST(COALESCE(SUM(a.ca), 0) AS BIGINT) AS cal
      FROM all_b s LEFT JOIN all_b a ON a.b < s.b GROUP BY s.b),
    cum_seg AS (
      SELECT c.seg, c.b, c.cnt,
             CAST(COALESCE(SUM(c2.cnt), 0) AS BIGINT) AS csl
      FROM cells c LEFT JOIN cells c2 ON c2.seg = c.seg AND c2.b < c.b
      GROUP BY c.seg, c.b, c.cnt),
    segs AS (SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n1
             FROM cells GROUP BY seg),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells)
    SELECT cs.seg, sg.n1, (t.n - sg.n1) AS n2,
           CAST(SUM(cs.cnt * (ca.cal - cs.csl)) * 2
                + SUM(cs.cnt * (ab.ca - cs.cnt)) AS BIGINT) AS u2,
           round(CAST(SUM(cs.cnt * (ca.cal - cs.csl)) * 2
                      + SUM(cs.cnt * (ab.ca - cs.cnt)) AS DOUBLE)
                 / (2 * sg.n1 * CAST(t.n - sg.n1 AS DOUBLE)), 6) AS auc
    FROM cum_seg cs
    JOIN cum_all ca ON ca.b = cs.b
    JOIN all_b ab ON ab.b = cs.b
    JOIN segs sg ON sg.seg = cs.seg
    CROSS JOIN tot t
    GROUP BY cs.seg, sg.n1, t.n
    """,
)
def c_mannwhitney(spark, sf_dir):
    """Mann-Whitney U (reported as the doubled-integer U2 and the AUC
    effect size) for each market segment's order values against the
    REST of the corpus — the nonparametric "does this segment spend
    differently" test, on $100 value buckets (the documented
    discretization that bounds the cell space).

    Exactness: greater-than pairs come from the cumulative-staircase
    identity Σ cnt_S(b)·(CumAll(b⁻) − CumS(b⁻)), ties from
    cnt_S(b)·(all(b) − cnt_S(b)); U2 = 2·gt + eq stays BIGINT, AUC =
    U2/(2·n₁·n₂) is one per-segment division of exact integers. Scale
    shape: corpus → (seg, bucket) cells in one keyed agg; both
    staircases run on the bounded bucket table."""
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("o_totalprice") / 100).cast("long").alias("b"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cells = checkpoint(cells, "mw-cells", eager=False)
    all_b = cells.groupBy("b").agg(F.sum("cnt").cast("long").alias("ca"))
    all_b = checkpoint(all_b, "mw-allb", eager=False)
    a2 = all_b.select(F.col("b").alias("b2"), F.col("ca").alias("ca2"))
    cum_all = (
        all_b.join(F.broadcast(a2), F.col("b2") < F.col("b"), "left")
        .groupBy("b")
        .agg(
            F.coalesce(F.sum("ca2"), F.lit(0)).cast("long").alias("cal")
        )
    )
    c2 = cells.select(
        F.col("seg").alias("seg2"), F.col("b").alias("b2"),
        F.col("cnt").alias("cnt2"),
    )
    cum_seg = (
        cells.join(
            F.broadcast(c2),
            (F.col("seg2") == F.col("seg")) & (F.col("b2") < F.col("b")),
            "left",
        )
        .groupBy("seg", "b", "cnt")
        .agg(
            F.coalesce(F.sum("cnt2"), F.lit(0)).cast("long").alias("csl")
        )
    )
    segs = cells.groupBy("seg").agg(F.sum("cnt").cast("long").alias("n1"))
    tot = cells.agg(F.sum("cnt").cast("long").alias("n"))
    u2 = (
        F.sum(F.col("cnt") * (F.col("cal") - F.col("csl"))) * 2
        + F.sum(F.col("cnt") * (F.col("ca") - F.col("cnt")))
    ).cast("long")
    return (
        cum_seg.join(F.broadcast(cum_all), "b")
        .join(F.broadcast(all_b), "b")
        .join(F.broadcast(segs), "seg")
        .crossJoin(F.broadcast(tot))
        .groupBy("seg", "n1", "n")
        .agg(u2.alias("u2"))
        .select(
            "seg",
            "n1",
            (F.col("n") - F.col("n1")).alias("n2"),
            "u2",
            F.round(
                F.col("u2").cast("double")
                / (
                    2
                    * F.col("n1")
                    * (F.col("n") - F.col("n1")).cast("double")
                ),
                6,
            ).alias("auc"),
        )
    )


#: Poisson(1) pmf cumulative thresholds (literal constants shared by the
#: Spark expression and the DuckDB oracle — both engines compare the SAME
#: Lehmer-derived uniform against the SAME doubles, so resample weights
#: are bit-identical): P(X<=k) for k = 0..4; weights cap at 5.
_POIS = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
)
_POIS_W_SQL = (
    "CASE WHEN u < {p0} THEN 0 WHEN u < {p1} THEN 1 WHEN u < {p2} THEN 2 "
    "WHEN u < {p3} THEN 3 WHEN u < {p4} THEN 4 ELSE 5 END"
).format(p0=_POIS[0], p1=_POIS[1], p2=_POIS[2], p3=_POIS[3], p4=_POIS[4])


@query(
    "c_bootstrap_ci",
    oracle="""
    WITH base AS (
      SELECT c.c_mktsegment AS seg, o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(20,4)) * 10000 AS BIGINT)
               AS price_u
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    expanded AS (
      SELECT seg, price_u,
             (48271 * ((16807 * (o_orderkey * 100 + b.b + 1))
                       % 2147483647)) % 2147483647
               / 2147483647.0 AS u,
             b.b
      FROM base CROSS JOIN (SELECT unnest(range(100)) AS b) b),
    weighted AS (
      SELECT seg, b, {w} AS w, price_u FROM expanded),
    means AS (
      SELECT seg, b,
             CAST(SUM(w * price_u) AS DOUBLE) / (10000.0 * SUM(w)) AS m
      FROM weighted GROUP BY seg, b HAVING SUM(w) > 0)
    SELECT seg,
           CAST(count(*) AS BIGINT) AS n_resamples,
           round(quantile_cont(m, 0.025), 6) AS ci_lo,
           round(quantile_cont(m, 0.975), 6) AS ci_hi
    FROM means GROUP BY seg
    """.format(w=_POIS_W_SQL),
)
def c_bootstrap_ci(spark, sf_dir):
    """95% bootstrap confidence interval for mean order value per
    segment, via the DISTRIBUTED bootstrap: 100 Poisson(1) resamples
    (the streaming/map-reduce bootstrap — per-row independent weights
    instead of a shared with-replacement draw, so no resample ever
    needs global coordination). Weights are deterministic inverse-CDF
    draws from a two-step Lehmer LCG on (orderkey, b) — pure integer
    mod-2³¹−1 arithmetic that both engines compute identically (and ~10×
    cheaper than the sketch family's md5 device at this 100× fan-out),
    making the whole Monte-Carlo procedure replayable and
    hash-checkable.

    Scale shape: the ×100 fan-out is the documented cost knob (B is a
    constant; at 100 TB run B per-partition partial sums — the weighted
    sums are decimal-exact and order-free, so resample means are
    bit-identical under ANY partitioning). One keyed agg per (seg, b),
    one exact percentile over B means per segment."""
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = od.join(cu, od.o_custkey == cu.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        "o_orderkey",
        # scale-0 integer units (price × 10⁴, exact): keeps the ×100
        # fan-out's weighted sums in pure BIGINT codegen — the decimal
        # accumulator here measured ~3.5× slower over 15M rows (bench
        # noop-write path; count() silently pruned it). Magnitude: w≤5 ×
        # price_u≤5e9 × 3e5 rows/resample ≈ 7.5e15 < 2^63 with 100×
        # headroom; the exact sum < 2^53 so the double image is exact.
        (F.col("o_totalprice").cast("decimal(20,4)") * 10000)
        .cast("long")
        .alias("price_u"),
    )
    # r13: the ×100 resample fan-out + partial aggregate fuse onto the
    # scan (single-row-group input = one task) — spread first.
    base = spread(base)
    m31 = F.lit(2147483647)
    u = (
        (F.lit(48271) * ((F.lit(16807)
         * (F.col("o_orderkey") * 100 + F.col("b") + 1)) % m31)) % m31
    ) / F.lit(2147483647.0)
    w = (
        F.when(F.col("u") < float(_POIS[0]), 0)
        .when(F.col("u") < float(_POIS[1]), 1)
        .when(F.col("u") < float(_POIS[2]), 2)
        .when(F.col("u") < float(_POIS[3]), 3)
        .when(F.col("u") < float(_POIS[4]), 4)
        .otherwise(5)
    )
    means = (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(99))).alias("b")
        )
        .withColumn("u", u)
        .withColumn("w", w)
        .groupBy("seg", "b")
        .agg(
            (
                F.sum(F.col("w") * F.col("price_u")).cast("double")
                / (F.lit(10000.0) * F.sum("w"))
            ).alias("m"),
            F.sum("w").alias("wsum"),
        )
        .where(F.col("wsum") > 0)
    )
    return means.groupBy("seg").agg(
        F.count("*").cast("long").alias("n_resamples"),
        F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
    )


def _markov_sql(n_iter: int = 8) -> str:
    """Loop-unrolled DuckDB mirror of c_markov_steady. Same decimal-state
    discipline as _pagerank_sql: 12dp-rounded per-edge contributions
    (round() is HALF_UP on both engines; decimal CAST is not), DECIMAL
    accumulation so every iteration is order-independent."""
    sql = """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS MATERIALIZED (
      SELECT event_type AS src, nxt AS dst,
             CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    out_c AS (SELECT src, CAST(SUM(c) AS BIGINT) AS oc
              FROM trans GROUP BY src),
    types AS (SELECT DISTINCT t FROM (
                SELECT src AS t FROM trans
                UNION SELECT dst FROM trans)),
    k AS (SELECT CAST(count(*) AS DOUBLE) AS kk FROM types),
    p AS (SELECT t.src, t.dst,
                 CAST(round(CAST(t.c AS DOUBLE) / o.oc, 12)
                      AS DECIMAL(14,12)) AS pij
          FROM trans t JOIN out_c o ON o.src = t.src),
    r0 AS (SELECT t AS node,
                  CAST(round(1.0 / (SELECT kk FROM k), 12)
                       AS DECIMAL(14,12)) AS v
           FROM types)
    """
    for i in range(n_iter):
        sql += f"""
    , c{i} AS (SELECT p.dst AS node,
                      CAST(round(r.v * p.pij, 12) AS DECIMAL(14,12))
                        AS contrib
               FROM r{i} r JOIN p ON r.node = p.src),
    r{i + 1} AS (SELECT t.t AS node,
                        CAST(COALESCE(s.v, 0) AS DECIMAL(14,12)) AS v
                 FROM types t LEFT JOIN (
                   SELECT node, CAST(SUM(contrib) AS DECIMAL(16,12)) AS v
                   FROM c{i} GROUP BY node) s ON s.node = t.t)
    """
    return sql + f"""
    SELECT r.node AS event_type,
           CAST(COALESCE(o.oc, 0) AS BIGINT) AS out_transitions,
           CAST(r.v AS DOUBLE) AS steady
    FROM r{n_iter} r LEFT JOIN out_c o ON o.src = r.node
    """


@query("c_markov_steady", oracle=_markov_sql(8))
def c_markov_steady(spark, sf_dir):
    """Steady-state distribution of the event-type Markov chain (8
    power iterations from uniform over the row-normalized transition
    matrix) — "where do user journeys spend their time", the chain-level
    summary above c_event_transitions' raw counts.

    Exactness mirrors the PageRank discipline: transition probabilities
    and state vectors live in DECIMAL(14,12); every per-edge product is
    rounded to 12dp (HALF_UP round() on both engines) before the
    order-free decimal sum, so all 8 iterations are bit-identical under
    any partitioning. Scale shape: ONE corpus-scale pass (the user-keyed
    lead window + (src,dst) rollup); the chain itself is
    type-cardinality-bounded, so iterations cost K² rows each —
    broadcast-sized forever."""
    from pyspark.sql.window import Window as W

    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count("*").cast("long").alias("c"))
    trans = checkpoint(trans, "markov-trans", eager=False)
    out_c = trans.groupBy("src").agg(F.sum("c").cast("long").alias("oc"))
    types = (
        trans.select(F.col("src").alias("t"))
        .union(trans.select(F.col("dst").alias("t")))
        .distinct()
    )
    types = checkpoint(types, "markov-types", eager=False)
    k = types.agg(F.count("*").cast("double").alias("kk"))
    p = trans.join(F.broadcast(out_c), "src").select(
        "src",
        "dst",
        F.round(F.col("c").cast("double") / F.col("oc"), 12)
        .cast("decimal(14,12)")
        .alias("pij"),
    )
    v = types.crossJoin(F.broadcast(k)).select(
        F.col("t").alias("node"),
        F.round(F.lit(1.0) / F.col("kk"), 12)
        .cast("decimal(14,12)")
        .alias("v"),
    )
    for _ in range(8):
        contrib = v.join(
            F.broadcast(p), v.node == p.src
        ).select(
            F.col("dst").alias("node"),
            F.round(F.col("v") * F.col("pij"), 12)
            .cast("decimal(14,12)")
            .alias("contrib"),
        )
        s = contrib.groupBy("node").agg(
            F.sum("contrib").cast("decimal(16,12)").alias("sv")
        )
        v = types.join(
            F.broadcast(s), types.t == s.node, "left"
        ).select(
            F.col("t").alias("node"),
            F.coalesce(F.col("sv"), F.lit(0))
            .cast("decimal(14,12)")
            .alias("v"),
        )
    return v.join(F.broadcast(out_c), v.node == out_c.src, "left").select(
        F.col("node").alias("event_type"),
        F.coalesce(F.col("oc"), F.lit(0))
        .cast("long")
        .alias("out_transitions"),
        F.col("v").cast("double").alias("steady"),
    )


@query(
    "c_percentile_approx_err",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_totalprice AS price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    SELECT seg, CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(price, 0.5), 6) AS exact_p50,
           round(quantile_cont(price, 0.9), 6) AS exact_p90,
           TRUE AS rank_ok_p50, TRUE AS rank_ok_p90
    FROM j GROUP BY seg
    """,
)
def c_percentile_approx_err(spark, sf_dir):
    """Builtin percentile sketch next to its exact twin, with the FORMAL
    guarantee stamped: approx_percentile(accuracy=1000) promises an
    element whose rank is within n/accuracy of the target; the query
    re-ranks each estimate (count of values ≤ estimate) and asserts
    |rank − q·n| ≤ 2·n/1000 + 1. The hash-checkable output is the exact
    interpolated percentiles plus the two booleans (the b_agg_
    approx_distinct pattern — the estimate itself is algorithm-specific
    and can never hash-match an oracle).

    Scale note: at 100 TB the exact percentile exists only for this
    invariant; production callers keep the one-pass mergeable sketch
    (map-side partial, no sort, no full shuffle of values)."""
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = od.join(cu, od.o_custkey == cu.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("price"),
    )
    j = checkpoint(j, "pctl-base", eager=False)
    agg = j.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.expr("percentile(price, 0.5)"), 6).alias("exact_p50"),
        F.round(F.expr("percentile(price, 0.9)"), 6).alias("exact_p90"),
        F.expr("approx_percentile(price, 0.5, 1000)").alias("__e50"),
        F.expr("approx_percentile(price, 0.9, 1000)").alias("__e90"),
    )
    ranks = (
        j.join(F.broadcast(agg.select("seg", "__e50", "__e90")), "seg")
        .groupBy("seg")
        .agg(
            F.sum(
                F.when(F.col("price") <= F.col("__e50"), 1).otherwise(0)
            ).cast("long").alias("r50"),
            F.sum(
                F.when(F.col("price") <= F.col("__e90"), 1).otherwise(0)
            ).cast("long").alias("r90"),
        )
    )
    tol = F.col("n") / 1000 * 2 + 1
    return agg.join(ranks, "seg").select(
        "seg",
        "n",
        "exact_p50",
        "exact_p90",
        (F.abs(F.col("r50") - 0.5 * F.col("n")) <= tol).alias(
            "rank_ok_p50"
        ),
        (F.abs(F.col("r90") - 0.9 * F.col("n")) <= tol).alias(
            "rank_ok_p90"
        ),
    )


@query(
    "c_permutation_test",
    oracle="""
    WITH base AS (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(20,4)) * 10000 AS BIGINT)
               AS price_u,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS ingrp
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    obs AS (
      SELECT CAST(SUM(ingrp) AS BIGINT) AS n_in,
             CAST(count(*) - SUM(ingrp) AS BIGINT) AS n_out,
             CAST(SUM(CASE WHEN ingrp = 1 THEN price_u ELSE 0 END)
                  AS DOUBLE) / (10000.0 * SUM(ingrp))
             - CAST(SUM(CASE WHEN ingrp = 0 THEN price_u ELSE 0 END)
                    AS DOUBLE) / (10000.0 * (count(*) - SUM(ingrp)))
               AS diff_obs,
             CAST(SUM(ingrp) AS DOUBLE) / count(*) AS ratio
      FROM base),
    perm AS (
      SELECT b.b,
             CASE WHEN (48271 * ((16807 * (o_orderkey * 200 + b.b + 7))
                                 % 2147483647)) % 2147483647
                       / 2147483647.0 < o.ratio
                  THEN 1 ELSE 0 END AS pin,
             price_u
      FROM base CROSS JOIN (SELECT unnest(range(200)) AS b) b
      CROSS JOIN obs o),
    diffs AS (
      SELECT b,
             CAST(SUM(CASE WHEN pin = 1 THEN price_u ELSE 0 END)
                  AS DOUBLE) / (10000.0 * SUM(pin))
             - CAST(SUM(CASE WHEN pin = 0 THEN price_u ELSE 0 END)
                    AS DOUBLE) / (10000.0 * (count(*) - SUM(pin)))
               AS d
      FROM perm GROUP BY b
      HAVING SUM(pin) > 0 AND SUM(pin) < count(*))
    SELECT o.n_in, o.n_out,
           round(o.diff_obs, 6) AS diff_obs,
           CAST(count(*) AS BIGINT) AS b_effective,
           round(CAST(1 + SUM(CASE WHEN abs(d.d) >= abs(o.diff_obs)
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                 / (count(*) + 1), 6) AS p_two
    FROM diffs d CROSS JOIN obs o
    GROUP BY o.n_in, o.n_out, o.diff_obs
    """,
)
def c_permutation_test(spark, sf_dir):
    """Randomization test for "does the BUILDING segment spend
    differently": 200 deterministic label reshuffles (Lehmer-LCG
    per-(order, b) draws at the observed group fraction — the
    binomial-label form of the permutation test, the one that
    distributes: each resample is a per-row independent decision, no
    global without-replacement draw to coordinate), two-sided p-value
    with the +1 correction. The inference twin of c_bootstrap_ci: that
    one bounds the estimate, this one tests the null.

    Determinism: group sums are exact scale-0 integers; each resample
    diff is two IEEE divisions of exact images; the p-value is an
    integer count over 200 such doubles — bit-identical on both
    engines. Scale: the ×200 fan-out is one projection + one keyed agg
    (map-side partial), nothing driver-side."""
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = od.join(cu, od.o_custkey == cu.c_custkey).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(20,4)") * 10000)
        .cast("long")
        .alias("price_u"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("ingrp"),
    )
    # r13: same scan-parallelism repair as c_bootstrap_ci — the ×200
    # fan-out runs on the checkpoint's partitioning, so spread BEFORE
    # the checkpoint or the whole Monte-Carlo pass is one task.
    base = checkpoint(spread(base), "perm-base", eager=False)
    in_sum = F.sum(F.when(F.col("ingrp") == 1, F.col("price_u")).otherwise(0))
    out_sum = F.sum(F.when(F.col("ingrp") == 0, F.col("price_u")).otherwise(0))
    obs = base.agg(
        F.sum("ingrp").cast("long").alias("n_in"),
        (F.count("*") - F.sum("ingrp")).cast("long").alias("n_out"),
        (
            in_sum.cast("double") / (F.lit(10000.0) * F.sum("ingrp"))
            - out_sum.cast("double")
            / (F.lit(10000.0) * (F.count("*") - F.sum("ingrp")))
        ).alias("diff_obs"),
        (F.sum("ingrp").cast("double") / F.count("*")).alias("ratio"),
    )
    m31 = F.lit(2147483647)
    u = (
        (F.lit(48271) * ((F.lit(16807)
         * (F.col("o_orderkey") * 200 + F.col("b") + 7)) % m31)) % m31
    ) / F.lit(2147483647.0)
    pin_sum = F.sum(F.when(F.col("pin") == 1, F.col("price_u")).otherwise(0))
    pout_sum = F.sum(F.when(F.col("pin") == 0, F.col("price_u")).otherwise(0))
    diffs = (
        base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(199))).alias("b")
        )
        .crossJoin(F.broadcast(obs.select("ratio")))
        .withColumn("pin", F.when(u < F.col("ratio"), 1).otherwise(0))
        .groupBy("b")
        .agg(
            (
                pin_sum.cast("double") / (F.lit(10000.0) * F.sum("pin"))
                - pout_sum.cast("double")
                / (F.lit(10000.0) * (F.count("*") - F.sum("pin")))
            ).alias("d"),
            F.sum("pin").alias("np"),
            F.count("*").alias("nt"),
        )
        .where((F.col("np") > 0) & (F.col("np") < F.col("nt")))
    )
    return (
        diffs.crossJoin(F.broadcast(obs))
        .groupBy("n_in", "n_out", "diff_obs")
        .agg(
            F.count("*").cast("long").alias("b_effective"),
            F.round(
                (
                    F.lit(1)
                    + F.sum(
                        F.when(
                            F.abs(F.col("d")) >= F.abs(F.col("diff_obs")), 1
                        ).otherwise(0)
                    )
                ).cast("double")
                / (F.count("*") + 1),
                6,
            ).alias("p_two"),
        )
        .select(
            "n_in", "n_out",
            F.round("diff_obs", 6).alias("diff_obs"),
            "b_effective", "p_two",
        )
    )


@query(
    "c_embedding_norms",
    oracle="""
    WITH norms AS MATERIALIZED (
      SELECT vec_id, label,
             CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS norm2
      FROM (SELECT vec_id, label, unnest(embedding) AS x
            FROM embeddings)
      GROUP BY vec_id, label),
    med AS (SELECT label, median(norm2) AS med FROM norms GROUP BY label),
    dev AS (SELECT n.label, abs(n.norm2 - m.med) AS ad, m.med
            FROM norms n JOIN med m USING (label)),
    mad AS (SELECT label, median(ad) AS mad FROM dev GROUP BY label)
    SELECT CAST(d.label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d.ad > m2.mad * 4.4478 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out,
           round(min(d.med), 6) AS med_norm2,
           round(min(m2.mad), 6) AS mad_norm2
    FROM dev d JOIN mad m2 USING (label)
    GROUP BY d.label
    """,
)
def c_embedding_norms(spark, sf_dir):
    """Embedding-quality screen: per-label squared-norm distribution
    with median/MAD outlier flags — the vector-side curation gate that
    catches zero vectors, exploding norms, and mis-normalized batches
    before they poison ANN indexes or centroid statistics (the vector
    twin of c_mad_outliers).

    Exactness: each x² term is a per-row IEEE double rounded to 9dp and
    summed in DECIMAL (order-free; the unscaled sum stays < 2^53, so
    the double image is exact — float inputs cast to double BEFORE the
    multiply on both engines, or DuckDB would square in float32).
    Scale shape: one explode + keyed agg (map-side partial collapses
    the ×dim fan-out), two broadcast-scalar medians per label, one
    shuffle-free flagging pass."""
    em = T(spark, sf_dir, "embeddings")
    norms = (
        em.select(
            "vec_id", "label", F.explode("embedding").alias("x")
        )
        .select(
            "vec_id",
            "label",
            F.round(
                F.col("x").cast("double") * F.col("x").cast("double"), 9
            )
            .cast("decimal(20,9)")
            .alias("t"),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("t").cast("double").alias("norm2"))
    )
    norms = checkpoint(norms, "emb-norms", eager=False)
    med = norms.groupBy("label").agg(F.median("norm2").alias("med"))
    dev = norms.join(F.broadcast(med), "label").select(
        "label",
        "med",
        F.abs(F.col("norm2") - F.col("med")).alias("ad"),
    )
    dev = checkpoint(dev, "emb-dev", eager=False)
    mad = dev.groupBy("label").agg(F.median("ad").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "label")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                (F.col("ad") > F.col("mad") * F.lit(4.4478)).cast("long")
            ).alias("n_out"),
            F.round(F.min("med"), 6).alias("med_norm2"),
            F.round(F.min("mad"), 6).alias("mad_norm2"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n", "n_out", "med_norm2", "mad_norm2",
        )
    )


@query(
    "c_label_margin",
    oracle="""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, label AS own,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cent AS MATERIALIZED (
      SELECT own AS clabel, pos,
             CAST(SUM(CAST(round(x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               / count(*) AS c
      FROM ex GROUP BY own, pos),
    vnorm AS MATERIALIZED (
      SELECT vec_id,
             CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS n2v
      FROM ex GROUP BY vec_id),
    cnorm AS (
      SELECT clabel,
             CAST(SUM(CAST(round(c * c, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS n2c
      FROM cent GROUP BY clabel),
    dots AS (
      SELECT e.vec_id, e.own, c.clabel,
             CAST(SUM(CAST(round(e.x * c.c, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS dot
      FROM ex e JOIN cent c ON c.pos = e.pos
      GROUP BY e.vec_id, e.own, c.clabel),
    cos AS (
      SELECT d.vec_id, d.own, d.clabel,
             d.dot / sqrt(v.n2v * n.n2c) AS cs
      FROM dots d JOIN vnorm v ON v.vec_id = d.vec_id
                  JOIN cnorm n ON n.clabel = d.clabel),
    margins AS (
      SELECT vec_id, own,
             round(max(CASE WHEN clabel = own THEN cs END)
                   - max(CASE WHEN clabel <> own THEN cs END), 9)
               AS margin
      FROM cos GROUP BY vec_id, own)
    SELECT CAST(own AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mislabel_candidates,
           round(CAST(SUM(CAST(margin AS DECIMAL(20,9))) AS DOUBLE)
                 / count(*), 6) AS avg_margin
    FROM margins GROUP BY own
    """,
)
def c_label_margin(spark, sf_dir):
    """Prototype-classifier margin per label: each vector's cosine to
    its OWN label centroid minus its best OTHER-label cosine. Negative
    margin = the vector sits closer to another class's prototype — the
    standard mislabel/boundary screen run before training on labeled
    embeddings (downstream of c_class_centroids; the curation action is
    auditing the negative-margin rows).

    Exactness: centroids, norms, and dot products are all DECIMAL sums
    of 9dp-rounded per-row double terms (order-free — the float inputs
    are cast to double BEFORE any multiply); cosines and the final
    margin are per-row IEEE on those exact images; margins round to 9dp
    before the per-label decimal average. Scale shape: explode → three
    keyed aggs; the ×K centroid fan-out is label-bounded and the
    centroid table broadcasts."""
    # r13: the ×dim explode, the decimal round/cast terms and the ×K
    # centroid fan-out all fuse onto the scan (one task on an unsplittable
    # single-row-group input) — spread across the cores first; the lazy
    # checkpoint then keeps that parallelism for all three consumers.
    em = spread(T(spark, sf_dir, "embeddings"))
    ex = em.select(
        "vec_id",
        F.col("label").alias("own"),
        F.posexplode("embedding"),
    ).select(
        "vec_id",
        "own",
        F.col("pos").cast("long").alias("pos"),
        F.col("col").cast("double").alias("x"),
    )
    ex = checkpoint(ex, "margin-ex", eager=False)
    cent = ex.groupBy(F.col("own").alias("clabel"), "pos").agg(
        (
            F.sum(F.round(F.col("x"), 9).cast("decimal(20,9)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("c")
    )
    cent = checkpoint(cent, "margin-cent", eager=False)
    vnorm = ex.groupBy("vec_id").agg(
        F.sum(
            F.round(F.col("x") * F.col("x"), 9).cast("decimal(20,9)")
        )
        .cast("double")
        .alias("n2v")
    )
    cnorm = cent.groupBy("clabel").agg(
        F.sum(
            F.round(F.col("c") * F.col("c"), 9).cast("decimal(20,9)")
        )
        .cast("double")
        .alias("n2c")
    )
    dots = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "own", "clabel")
        .agg(
            F.sum(
                F.round(F.col("x") * F.col("c"), 9).cast("decimal(20,9)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    cos = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "clabel")
        .select(
            "vec_id",
            "own",
            "clabel",
            (F.col("dot") / F.sqrt(F.col("n2v") * F.col("n2c"))).alias(
                "cs"
            ),
        )
    )
    margins = cos.groupBy("vec_id", "own").agg(
        F.round(
            F.max(
                F.when(F.col("clabel") == F.col("own"), F.col("cs"))
            )
            - F.max(
                F.when(F.col("clabel") != F.col("own"), F.col("cs"))
            ),
            9,
        ).alias("margin")
    )
    return margins.groupBy(F.col("own").cast("long").alias("label")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("margin") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_mislabel_candidates"),
        F.round(
            F.sum(F.col("margin").cast("decimal(20,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_margin"),
    )


@query(
    "c_label_margin_fast",
    oracle="""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, label AS own,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cent AS MATERIALIZED (
      SELECT own AS clabel, pos,
             CAST(SUM(CAST(round(x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               / count(*) AS c
      FROM ex GROUP BY own, pos),
    vnorm AS MATERIALIZED (
      SELECT vec_id,
             CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS n2v
      FROM ex GROUP BY vec_id),
    cnorm AS (
      SELECT clabel,
             CAST(SUM(CAST(round(c * c, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS n2c
      FROM cent GROUP BY clabel),
    dots AS (
      SELECT e.vec_id, e.own, c.clabel,
             CAST(SUM(CAST(round(e.x * c.c, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS dot
      FROM ex e JOIN cent c ON c.pos = e.pos
      GROUP BY e.vec_id, e.own, c.clabel),
    cos AS (
      SELECT d.vec_id, d.own, d.clabel,
             d.dot / sqrt(v.n2v * n.n2c) AS cs
      FROM dots d JOIN vnorm v ON v.vec_id = d.vec_id
                  JOIN cnorm n ON n.clabel = d.clabel),
    margins AS (
      SELECT vec_id, own,
             round(max(CASE WHEN clabel = own THEN cs END)
                   - max(CASE WHEN clabel <> own THEN cs END), 9)
               AS margin
      FROM cos GROUP BY vec_id, own)
    SELECT CAST(own AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mislabel_candidates,
           CAST(1 AS BIGINT) AS margins_agree
    FROM margins GROUP BY own
    """,
)
def c_label_margin_fast(spark, sf_dir):
    """Invariant gate for the PUBLIC label-margin operator
    (llm/similarity.py:label_margin = label_margin_fast — the
    fan-out-free literal-projection form, the c_ivf_cells_scale
    pattern): its exact-integer outputs (n, mislabel count per label)
    must equal the oracle-checked explode-join twin's, and the two
    forms' 6dp average margins must agree within rounding distance
    (margins_agree ≡ 1 for every label). The fast form scores all K
    prototypes in ONE projection — no explode, no join (plan-asserted
    in tests/test_statistics_props.py); this entry pins its RESULTS to
    the checked algebra."""
    from popelines_spark.llm.similarity import label_margin
    from popelines_spark.tables import load

    fast = label_margin(load(spark, sf_dir, "embeddings"))
    slow = c_label_margin(spark, sf_dir).select(
        "label", F.col("avg_margin").alias("avg_slow")
    )
    return fast.join(slow, "label").select(
        "label",
        "n",
        "n_mislabel_candidates",
        (F.abs(F.col("avg_margin") - F.col("avg_slow")) < 1e-5)
        .cast("long")
        .alias("margins_agree"),
    )
