"""SURVEY.md §2 Part C — round-8 analytics batch: experiment analysis
and classical statistics the delegated-SQL surface reaches in BigQuery
(ANOVA, association strength, CUPED variance reduction, seasonal
decomposition, rolling correlation, per-group OLS, score calibration,
SAX symbolization).

Determinism discipline (SURVEY.md §5 / _util.py): money and event values
are exact 2dp doubles — single-row products stay exactly representable
(or at worst per-row IEEE, identical on both engines); every MULTI-ROW
accumulation goes through a per-row round → DECIMAL sum, so no result
depends on accumulation order. Divisions/sqrt happen per-row on exact
aggregate images.

Scale notes: every query collapses to a bounded frame (day grain ≤
calendar days, group grain ≤ label cardinality, decile grain = 10)
before any cross-term arithmetic; the only shuffles are the initial
keyed aggregations with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import T, dsum, sql_dsum


@query(
    "c_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS s_g,
             CAST(SUM(CAST(round(o_totalprice * o_totalprice, 4)
                           AS DECIMAL(38,4))) AS DOUBLE) AS ss_g
      FROM orders GROUP BY 1),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(CAST(s_g AS DECIMAL(20,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(ss_g AS DECIMAL(38,4))) AS DOUBLE) AS ss
      FROM g),
    b AS (
      SELECT CAST(SUM(CAST(round(
               n_g * (s_g / n_g - t.s / t.n) * (s_g / n_g - t.s / t.n), 6)
               AS DECIMAL(30,6))) AS DOUBLE) AS ssb
      FROM g, t GROUP BY t.k, t.n, t.s, t.ss)
    SELECT t.k, t.n,
           round((b.ssb / (t.k - 1))
                 / (((t.ss - t.n * (t.s / t.n) * (t.s / t.n)) - b.ssb)
                    / (t.n - t.k)), 6) AS f_stat,
           round(b.ssb / (t.ss - t.n * (t.s / t.n) * (t.s / t.n)), 6)
             AS eta2
    FROM t, b
    """,
)
def c_anova_oneway(spark, sf_dir):
    """One-way ANOVA of order value across priority classes: F statistic
    and effect size (eta-squared) from the sum decomposition
    SST = SSB + SSW. Group sums and sums-of-squares accumulate in exact
    DECIMAL (2dp prices → squares exact at 4dp); the 5 between-group
    terms fold through a 6dp round → DECIMAL sum so the K-row
    accumulation is order-free too. Scale: one keyed agg with map-side
    partials → a K-row frame; everything after is arithmetic on
    broadcastable scalars."""
    o = T(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
        .cast("double")
        .alias("s_g"),
        F.sum(
            F.round(F.col("o_totalprice") * F.col("o_totalprice"), 4).cast(
                "decimal(38,4)"
            )
        )
        .cast("double")
        .alias("ss_g"),
    )
    t = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.col("s_g").cast("decimal(20,4)")).cast("double").alias("s"),
        F.sum(F.col("ss_g").cast("decimal(38,4)")).cast("double").alias("ss"),
    )
    withtot = g.crossJoin(F.broadcast(t))
    b = withtot.groupBy("k", "n", "s", "ss").agg(
        F.sum(
            F.round(
                F.col("n_g")
                * (F.col("s_g") / F.col("n_g") - F.col("s") / F.col("n"))
                * (F.col("s_g") / F.col("n_g") - F.col("s") / F.col("n")),
                6,
            ).cast("decimal(30,6)")
        )
        .cast("double")
        .alias("ssb")
    )
    sst = F.col("ss") - F.col("n") * (F.col("s") / F.col("n")) * (
        F.col("s") / F.col("n")
    )
    return b.select(
        "k",
        "n",
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / ((sst - F.col("ssb")) / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(F.col("ssb") / sst, 6).alias("eta2"),
    )


@query(
    "c_cramers_v",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS p, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2),
    rowt AS (SELECT p, CAST(SUM(obs) AS BIGINT) AS rn FROM cell GROUP BY 1),
    colt AS (SELECT st, CAST(SUM(obs) AS BIGINT) AS cn FROM cell GROUP BY 1),
    t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                 CAST(count(DISTINCT p) AS BIGINT) AS k,
                 CAST(count(DISTINCT st) AS BIGINT) AS m
          FROM cell),
    chi AS (
      -- FULL row x column cross (an EMPTY cell still contributes its
      -- expected count; observed-cells-only understates chi2 on sparse
      -- categoricals — same hardening as c_chi2_independence, r12)
      SELECT CAST(SUM(CAST(round(
               (COALESCE(c.obs, 0) - CAST(r.rn AS DOUBLE) * ct.cn / t.n)
               * (COALESCE(c.obs, 0) - CAST(r.rn AS DOUBLE) * ct.cn / t.n)
               / (CAST(r.rn AS DOUBLE) * ct.cn / t.n), 9)
               AS DECIMAL(24,9))) AS DOUBLE) AS chi2
      FROM rowt r CROSS JOIN colt ct CROSS JOIN t
           LEFT JOIN cell c ON c.p = r.p AND c.st = ct.st
      GROUP BY t.n, t.k, t.m)
    SELECT t.n, t.k, t.m, round(chi.chi2, 6) AS chi2,
           round(sqrt(chi.chi2 / (t.n * (least(t.k, t.m) - 1))), 6)
             AS cramers_v
    FROM t, chi
    """,
)
def c_cramers_v(spark, sf_dir):
    """Cramér's V association strength between order priority and order
    status: the chi-squared statistic of the K×M contingency table,
    normalized to [0, 1]. Observed/expected cells come from exact integer
    counts; the ≤ K·M per-cell terms fold through the 9dp-round → DECIMAL
    sum. Scale: one keyed count → a K·M-row frame; the margins join
    broadcast."""
    o = T(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.col("o_orderpriority").alias("p"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count("*").cast("long").alias("obs"))
    rowt = cell.groupBy("p").agg(F.sum("obs").cast("long").alias("rn"))
    colt = cell.groupBy("st").agg(F.sum("obs").cast("long").alias("cn"))
    t = cell.agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("p").cast("long").alias("k"),
        F.countDistinct("st").cast("long").alias("m"),
    )
    exp = F.col("rn").cast("double") * F.col("cn") / F.col("n")
    # FULL row x column cross (category-bounded, broadcast): an empty
    # cell still contributes its expected count — observed-cells-only
    # understates chi2 on sparse categoricals (same hardening as
    # c_chi2_independence, review r12)
    chi = (
        rowt.crossJoin(F.broadcast(colt))
        .crossJoin(F.broadcast(t))
        .join(F.broadcast(cell), ["p", "st"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
        .groupBy("n", "k", "m")
        .agg(
            F.sum(
                F.round(
                    (F.col("obs") - exp) * (F.col("obs") - exp) / exp, 9
                ).cast("decimal(24,9)")
            )
            .cast("double")
            .alias("chi2")
        )
    )
    return chi.select(
        "n",
        "k",
        "m",
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least(F.col("k"), F.col("m")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "c_ab_cuped",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(o_custkey % 2 AS BIGINT) AS variant,
             CAST(COALESCE(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
               THEN CAST(o_totalprice AS DECIMAL(20,4)) END), 0) AS DOUBLE)
               AS pre,
             CAST(COALESCE(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
               THEN CAST(o_totalprice AS DECIMAL(20,4)) END), 0) AS DOUBLE)
               AS post
      FROM orders GROUP BY 1, 2),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(pre AS DECIMAL(20,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(post AS DECIMAL(20,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(pre * pre, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(round(pre * post, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) AS sxy
      FROM cust),
    th AS (
      SELECT n, sx,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta
      FROM t)
    SELECT c.variant,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(c.post AS DECIMAL(20,4))) AS DOUBLE)
                 / count(*), 6) AS mean_post,
           round(CAST(SUM(CAST(round(
               c.post - th.theta * (c.pre - th.sx / th.n), 6)
               AS DECIMAL(30,6))) AS DOUBLE) / count(*), 6) AS mean_adj,
           round(th.theta, 6) AS theta
    FROM cust c, th
    GROUP BY c.variant, th.theta, th.sx, th.n
    """,
)
def c_ab_cuped(spark, sf_dir):
    """CUPED variance-reduced A/B readout: customers split by key parity
    into variants; pre-period (pre-1998) spend is the covariate, post
    spend the metric. theta = cov(pre, post)/var(pre) is pooled (the
    standard estimator), each variant reports raw and adjusted means —
    the adjustment removes covariate imbalance without touching the
    expectation. All moments are decimal-exact or per-row-rounded folds;
    theta/means divide exact aggregate images per-row. Scale: one keyed
    customer rollup, one scalar broadcast, one K=2 group agg."""
    o = T(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    cust = o.groupBy("o_custkey").agg(
        (F.col("o_custkey") % 2).cast("long").alias("variant"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderdate") < cut,
                    F.col("o_totalprice").cast("decimal(20,4)"),
                )
            ),
            F.lit(0).cast("decimal(20,4)"),
        )
        .cast("double")
        .alias("pre"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderdate") >= cut,
                    F.col("o_totalprice").cast("decimal(20,4)"),
                )
            ),
            F.lit(0).cast("decimal(20,4)"),
        )
        .cast("double")
        .alias("post"),
    )
    t = cust.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("pre").cast("decimal(20,4)")).cast("double").alias("sx"),
        F.sum(F.col("post").cast("decimal(20,4)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("pre") * F.col("pre"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("pre") * F.col("post"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
    )
    th = t.select(
        "n",
        "sx",
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("theta"),
    )
    return (
        cust.crossJoin(F.broadcast(th))
        .groupBy("variant", "theta", "sx", "n")
        .agg(
            F.count("*").cast("long").alias("n_v"),
            F.round(
                F.sum(F.col("post").cast("decimal(20,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_post"),
            F.round(
                F.sum(
                    F.round(
                        F.col("post")
                        - F.col("theta")
                        * (F.col("pre") - F.col("sx") / F.col("n")),
                        6,
                    ).cast("decimal(30,6)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_adj"),
        )
        .select(
            "variant",
            F.col("n_v").alias("n"),
            "mean_post",
            "mean_adj",
            F.round(F.col("theta"), 6).alias("theta"),
        )
    )


@query(
    "c_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1),
    ma AS (
      SELECT d, rev,
             CAST(SUM(CAST(rev AS DECIMAL(20,4))) OVER w AS DOUBLE) / 7
               AS trend,
             count(*) OVER w AS wn
      FROM daily
      WINDOW w AS (PARTITION BY date_trunc('year', d) ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
    SELECT CAST(dayofweek(d) AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(SUM(CAST(round(rev - trend, 6) AS DECIMAL(24,6)))
                      AS DOUBLE) / count(*), 6) AS seasonal
    FROM ma WHERE wn = 7
    GROUP BY 1
    """,
)
def c_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition of daily order revenue:
    trend = centered 7-day moving average (full windows only), seasonal
    = day-of-week mean of the detrended series. The 7-term MA sums in
    exact DECIMAL; detrended values fold through the 6dp round → DECIMAL
    day-of-week sum. Scale: day-grain frame (≤ calendar days); the MA
    window PARTITIONS BY YEAR (≤366 rows per partition — the registry's
    no-unpartitioned-window rule; trend windows don't cross year
    boundaries and the 3 edge days per year-end drop with the full-
    window filter), then one K=7 agg."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(dsum("o_totalprice").alias("rev"))
    w = (
        W.partitionBy(F.date_trunc("year", "d"))
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "d",
        "rev",
        (
            F.sum(F.col("rev").cast("decimal(20,4)")).over(w).cast("double")
            / 7
        ).alias("trend"),
        F.count("*").over(w).alias("wn"),
    ).where(F.col("wn") == 7)
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday
    return ma.groupBy(
        (F.dayofweek("d") - 1).cast("long").alias("dow")
    ).agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.sum(
                F.round(F.col("rev") - F.col("trend"), 6).cast(
                    "decimal(24,6)"
                )
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("seasonal"),
    )


@query(
    "c_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS x,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
               AS y
      FROM events GROUP BY 1),
    win AS (
      SELECT d,
             count(*) OVER w AS wn,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
             CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY date_trunc('month', d) ORDER BY d
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT d,
           round((wn * sxy - sx * sy)
                 / sqrt(CAST(wn * sxx - sx * sx AS DOUBLE)
                        * (wn * syy - sy * sy)), 6) AS r
    FROM win
    WHERE wn = 14 AND (wn * sxx - sx * sx) > 0 AND (wn * syy - sy * sy) > 0
    """,
)
def c_rolling_corr(spark, sf_dir):
    """14-day rolling Pearson correlation between daily click and view
    volumes — the co-movement monitor behind engagement dashboards. All
    five moments are INTEGER window sums (exact); r is one per-row IEEE
    expression on them. Windows partition by month (bounded partitions,
    no global window; a window never crosses a month boundary), emit
    only full 14-day frames, and zero-variance frames are filtered on
    the exact integer compare, not left to NaN."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("long")
        .alias("y"),
    )
    w = (
        W.partitionBy(F.date_trunc("month", "d"))
        .orderBy("d")
        .rowsBetween(-13, W.currentRow)
    )
    win = daily.select(
        "d",
        F.count("*").over(w).alias("wn"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
    )
    vx = F.col("wn") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("wn") * F.col("syy") - F.col("sy") * F.col("sy")
    cxy = F.col("wn") * F.col("sxy") - F.col("sx") * F.col("sy")
    return win.where(
        (F.col("wn") == 14) & (vx > 0) & (vy > 0)
    ).select(
        "d",
        F.round(cxy / F.sqrt(vx.cast("double") * vy), 6).alias("r"),
    )


@query(
    "c_groupwise_ols",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS x,
             value AS y
      FROM events),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(20,4))) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CAST(round(x * y, 4) AS DECIMAL(30,4))) AS DOUBLE)
               AS sxy,
             CAST(SUM(CAST(round(y * y, 4) AS DECIMAL(30,4))) AS DOUBLE)
               AS syy
      FROM pts GROUP BY 1)
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                 * (CAST(sx AS DOUBLE) / n), 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
)
def c_groupwise_ols(spark, sf_dir):
    """Per-group ordinary-least-squares trend: for each event type, the
    closed-form OLS slope/intercept/R² of value against day index — the
    parametric twin of c_theilsen_trend (which is robust but O(n²) per
    group; OLS is the one-pass screen you run first). x is an exact
    integer, y an exact 2dp double: x·y and y² round per-row (IEEE,
    identical both engines) then accumulate in DECIMAL, so every moment
    is order-free. One keyed agg with map-side partials; the regression
    itself is arithmetic on the K-row frame."""
    ev = T(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("x"),
        F.col("value").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,4)")).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast("decimal(30,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("y") * F.col("y"), 4).cast("decimal(30,4)"))
        .cast("double")
        .alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cxy / vx
    return m.where((vx > 0) & (vy > 0)).select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            F.col("sy") / F.col("n")
            - slope * (F.col("sx").cast("double") / F.col("n")),
            6,
        ).alias("intercept"),
        F.round(cxy * cxy / (vx * vy), 6).alias("r2"),
    )


@query(
    "c_calibration_bins",
    oracle="""
    WITH ranked AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit,
             ntile(10) OVER (ORDER BY value, event_id) AS decile
      FROM events)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE)
                 / count(*), 6) AS mean_score,
           round(CAST(SUM(hit) AS DOUBLE) / count(*), 6) AS purchase_rate
    FROM ranked GROUP BY 1
    """,
)
def c_calibration_bins(spark, sf_dir):
    """Reliability/calibration table: events ranked into score deciles
    (value as the score, unique (value, event_id) total order so the
    binning is deterministic), each bin reporting mean score and the
    observed purchase rate — flat rate across rising score = the score
    carries no signal; the standard pre-deployment check for any model
    score column. Mean scores accumulate in exact DECIMAL; rates are
    integer/integer per-row divisions."""
    ev = T(spark, sf_dir, "events")
    # ntile over a global order: partition by a constant bucket of the
    # pre-aggregated frame is not possible for exact decile semantics —
    # instead rank via percent_rank-free two-pass: total count + row
    # number per 1/10 slice. Spark's ntile needs ONE partition; to honor
    # the no-unpartitioned-window rule we compute the decile from the
    # exact row_number within value-ordered SALT partitions... simpler
    # and still exact: row_number is computable per value-range bucket
    # only with known counts. Use the direct spelling: a global ntile is
    # exactly what the oracle runs — so compute rank arithmetic from an
    # EXACT global row_number built as (count of rows strictly before
    # this (value, event_id)) + 1 via a self-agg-free window partitioned
    # by a 32-bucket value range with cumulative offsets.
    b = 32
    bucketed = ev.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("hit"),
        "event_id",
        F.least(
            F.lit(b - 1), F.floor(F.col("value") / F.lit(500.0 / b)).cast("int")
        ).alias("vb"),
    )
    # offsets of each value-range bucket in the global order: the bucket
    # count frame is ≤32 rows — materialize it (bounded-frame collect,
    # the sanctioned scalar pattern) and prefix-sum driver-side instead
    # of a partition-less window
    bn = {
        r["vb"]: r["bn"]
        for r in bucketed.groupBy("vb").agg(F.count("*").alias("bn")).collect()
    }
    acc, offs, tot_n = 0, {}, sum(bn.values())
    for vb_key in sorted(bn):
        offs[vb_key] = acc
        acc += bn[vb_key]
    counts = bucketed.sparkSession.createDataFrame(
        [(k, offs[k]) for k in sorted(offs)], "vb int, off long"
    )
    total = bucketed.agg(F.count("*").alias("tot"))
    rn = (
        bucketed.join(F.broadcast(counts), "vb")
        .crossJoin(F.broadcast(total))
        .select(
            "value",
            "hit",
            "tot",
            (
                F.row_number().over(
                    W.partitionBy("vb").orderBy("value", "event_id")
                )
                + F.col("off")
            ).alias("rn"),
        )
    )
    # ntile(10) over n rows: tile t has ceil sizes — rank r (1-based) maps
    # to floor((r-1) * 10 / n) + 1 ONLY for equal tiles; SQL ntile gives
    # the first (n % 10) tiles one extra row. Closed form below matches.
    n_ = F.col("tot")
    r_ = F.col("rn") - 1
    big = (n_ % 10) * (F.floor(n_ / 10) + 1)
    decile = F.when(
        r_ < big, F.floor(r_ / (F.floor(n_ / 10) + 1))
    ).otherwise((n_ % 10) + F.floor((r_ - big) / F.floor(n_ / 10))) + 1
    return (
        rn.select("value", "hit", decile.cast("long").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(20,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_score"),
            F.round(
                F.sum("hit").cast("double") / F.count("*"), 6
            ).alias("purchase_rate"),
        )
    )


@query(
    "c_sax_symbolize",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(20,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(round(rev * rev, 4) AS DECIMAL(38,4)))
                  AS DOUBLE) AS ss
      FROM daily),
    z AS (
      SELECT d, (rev - t.s / t.n)
                / sqrt((t.ss - t.n * (t.s / t.n) * (t.s / t.n)) / (t.n - 1))
                  AS z
      FROM daily, t)
    SELECT CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0 THEN 'b'
                WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS symbol,
           CAST(count(*) AS BIGINT) AS n_days,
           round(min(z), 6) AS z_min,
           round(max(z), 6) AS z_max
    FROM z GROUP BY 1
    """,
)
def c_sax_symbolize(spark, sf_dir):
    """SAX (symbolic aggregate approximation) of the daily revenue
    series: z-normalize against the exact global mean/std, then map each
    day into the 4-symbol gaussian-equiprobable alphabet (breakpoints
    ±0.6745, 0) — the discretization behind symbolic motif/anomaly
    mining on time series. Mean/variance come from exact decimal
    moments; each z is one per-row IEEE expression, so the symbol
    boundaries compare identically on both engines. Scale: day-grain
    frame + one scalar broadcast."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(dsum("o_totalprice").alias("rev"))
    t = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("rev").cast("decimal(20,4)")).cast("double").alias("s"),
        F.sum(F.round(F.col("rev") * F.col("rev"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("ss"),
    )
    m = F.col("s") / F.col("n")
    std = F.sqrt((F.col("ss") - F.col("n") * m * m) / (F.col("n") - 1))
    z = daily.crossJoin(F.broadcast(t)).select(
        "d", ((F.col("rev") - m) / std).alias("z")
    )
    sym = (
        F.when(F.col("z") < -0.6745, "a")
        .when(F.col("z") < 0, "b")
        .when(F.col("z") < 0.6745, "c")
        .otherwise("d")
    )
    return z.groupBy(sym.alias("symbol")).agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.min("z"), 6).alias("z_min"),
        F.round(F.max("z"), 6).alias("z_max"),
    )


@query(
    "c_welch_ttest",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(round(value * value, 4) AS DECIMAL(38,4)))
                  AS DOUBLE) AS ss
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY 1),
    v AS (
      SELECT event_type, n, s / n AS mean,
             (ss - n * (s / n) * (s / n)) / (n - 1) AS var
      FROM m),
    pair AS (
      SELECT a.n AS n1, b.n AS n2, a.mean AS m1, b.mean AS m2,
             a.var / a.n AS va, b.var / b.n AS vb
      FROM v a, v b
      WHERE a.event_type = 'purchase' AND b.event_type = 'view')
    SELECT n1, n2,
           round((m1 - m2) / sqrt(va + vb), 6) AS t_stat,
           round((va + vb) * (va + vb)
                 / (va * va / (n1 - 1) + vb * vb / (n2 - 1)), 6) AS df
    FROM pair
    """,
)
def c_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t statistic (purchase vs view event
    values) with the Welch–Satterthwaite effective degrees of freedom —
    the parametric twin of c_mannwhitney. Means and variances come from
    exact decimal moments (2dp values, 4dp squares); t and df are single
    per-row IEEE expressions on them. Scale: one K=2 keyed agg."""
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("s"),
        F.sum(F.round(F.col("value") * F.col("value"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    v = m.select(
        "event_type",
        "n",
        mean.alias("mean"),
        ((F.col("ss") - F.col("n") * mean * mean) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a = v.where("event_type = 'purchase'").select(
        F.col("n").alias("n1"),
        F.col("mean").alias("m1"),
        (F.col("var") / F.col("n")).alias("va"),
    )
    b = v.where("event_type = 'view'").select(
        F.col("n").alias("n2"),
        F.col("mean").alias("m2"),
        (F.col("var") / F.col("n")).alias("vb"),
    )
    pair = a.crossJoin(F.broadcast(b))
    return pair.select(
        "n1",
        "n2",
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(F.col("va") + F.col("vb")), 6
        ).alias("t_stat"),
        F.round(
            (F.col("va") + F.col("vb")) * (F.col("va") + F.col("vb"))
            / (
                F.col("va") * F.col("va") / (F.col("n1") - 1)
                + F.col("vb") * F.col("vb") / (F.col("n2") - 1)
            ),
            6,
        ).alias("df"),
    )


@query(
    "c_levene_test",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority AS grp,
             median(o_totalprice) AS med
      FROM orders GROUP BY 1),
    z AS (
      SELECT o.o_orderpriority AS grp,
             abs(o.o_totalprice - m.med) AS z
      FROM orders o JOIN med m ON m.grp = o.o_orderpriority),
    g AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(round(z, 4) AS DECIMAL(20,4))) AS DOUBLE) AS s_g,
             CAST(SUM(CAST(round(z * z, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS ss_g
      FROM z GROUP BY 1),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(CAST(s_g AS DECIMAL(20,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(ss_g AS DECIMAL(38,6))) AS DOUBLE) AS ss
      FROM g),
    b AS (
      SELECT CAST(SUM(CAST(round(
               n_g * (s_g / n_g - t.s / t.n) * (s_g / n_g - t.s / t.n), 6)
               AS DECIMAL(30,6))) AS DOUBLE) AS ssb
      FROM g, t GROUP BY t.k, t.n, t.s, t.ss)
    SELECT t.k, t.n,
           round((b.ssb / (t.k - 1))
                 / (((t.ss - t.n * (t.s / t.n) * (t.s / t.n)) - b.ssb)
                    / (t.n - t.k)), 6) AS w_stat
    FROM t, b
    """,
)
def c_levene_test(spark, sf_dir):
    """Brown-Forsythe (median-centered Levene) homogeneity-of-variance
    test across order priorities: ANOVA's F machinery applied to the
    absolute deviations from each group's MEDIAN — the robust
    pre-check before trusting c_anova_oneway's pooled variance. Group
    medians are exact percentiles (both engines interpolate the
    midpoint of even counts identically on exact 2dp inputs); the
    deviations round per-row then fold in DECIMAL. Scale: one exact-
    percentile agg (K groups), one broadcast join, then the K-row
    ANOVA arithmetic."""
    o = T(spark, sf_dir, "orders")
    med = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    z = (
        o.join(
            F.broadcast(med), o["o_orderpriority"] == med["grp"]
        ).select(
            "grp",
            F.abs(F.col("o_totalprice") - F.col("med")).alias("z"),
        )
    )
    g = z.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.round(F.col("z"), 4).cast("decimal(20,4)"))
        .cast("double")
        .alias("s_g"),
        F.sum(F.round(F.col("z") * F.col("z"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("ss_g"),
    )
    t = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.col("s_g").cast("decimal(20,4)")).cast("double").alias("s"),
        F.sum(F.col("ss_g").cast("decimal(38,6)")).cast("double").alias("ss"),
    )
    b = (
        g.crossJoin(F.broadcast(t))
        .groupBy("k", "n", "s", "ss")
        .agg(
            F.sum(
                F.round(
                    F.col("n_g")
                    * (F.col("s_g") / F.col("n_g") - F.col("s") / F.col("n"))
                    * (F.col("s_g") / F.col("n_g") - F.col("s") / F.col("n")),
                    6,
                ).cast("decimal(30,6)")
            )
            .cast("double")
            .alias("ssb")
        )
    )
    sst = F.col("ss") - F.col("n") * (F.col("s") / F.col("n")) * (
        F.col("s") / F.col("n")
    )
    return b.select(
        "k",
        "n",
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / ((sst - F.col("ssb")) / (F.col("n") - F.col("k"))),
            6,
        ).alias("w_stat"),
    )


@query(
    "c_ndcg_eval",
    oracle="""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    nrm AS MATERIALIZED (
      SELECT vec_id,
             CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS n2
      FROM ex GROUP BY 1),
    lab AS (SELECT DISTINCT vec_id, label FROM ex),
    dots AS (
      SELECT p.vec_id AS q, e.vec_id AS c,
             CAST(SUM(CAST(round(p.x * e.x, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS dot
      FROM ex p JOIN ex e ON e.pos = p.pos AND e.vec_id <> p.vec_id
      WHERE p.vec_id < 8
      GROUP BY 1, 2),
    cos AS (
      SELECT d.q, d.c,
             round(d.dot / sqrt(nq.n2 * nc.n2), 9) AS cs,
             CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END AS rel
      FROM dots d
      JOIN nrm nq ON nq.vec_id = d.q
      JOIN nrm nc ON nc.vec_id = d.c
      JOIN lab lq ON lq.vec_id = d.q
      JOIN lab lc ON lc.vec_id = d.c),
    top AS (
      SELECT q, rel, rk FROM (
        SELECT q, rel,
               row_number() OVER (PARTITION BY q ORDER BY cs DESC, c) AS rk
        FROM cos) WHERE rk <= 10),
    dcg AS (
      SELECT q,
             CAST(SUM(CAST(round(rel / log2(rk + 1), 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS dcg,
             CAST(SUM(rel) AS BIGINT) AS n_rel
      FROM top GROUP BY 1),
    -- the IDEAL ranking places min(TOTAL relevant candidates, 10) ones
    -- at the top — normalizing by the relevance RETRIEVED in the top 10
    -- (the old n_rel) inflated the score whenever recall < 1 and turned
    -- NDCG into a pure within-top-10 ordering metric (review r12,
    -- third-engine find; standard NDCG@k convention)
    reltot AS (
      SELECT lq.vec_id AS q, CAST(count(*) AS BIGINT) AS r_tot
      FROM lab lq JOIN lab lc
        ON lc.label = lq.label AND lc.vec_id <> lq.vec_id
      WHERE lq.vec_id < 8 GROUP BY 1),
    ideal AS (
      SELECT rt.q,
             CAST(SUM(CAST(round(1.0 / log2(r.r + 1), 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS idcg
      FROM reltot rt JOIN range(1, 11) r(r) ON r.r <= least(rt.r_tot, 10)
      GROUP BY 1)
    SELECT d.q AS probe_id, d.n_rel,
           round(COALESCE(d.dcg / i.idcg, 0.0), 6) AS ndcg10
    FROM dcg d LEFT JOIN ideal i ON i.q = d.q
    """,
)
def c_ndcg_eval(spark, sf_dir):
    """NDCG@10 of cosine retrieval against label relevance — the
    standard IR metric for the similarity stack (llm/similarity.py):
    for each of 8 probe vectors, rank every other vector by exact
    cosine (the c_label_margin decimal-dot discipline, 9dp-rounded
    before ranking with a vec_id tie-break), relevance = same label,
    and score DCG against the ideal ordering. DCG/IDCG terms fold
    through 9dp-round → DECIMAL sums on both engines, so no log2 chain
    depends on accumulation order. Scale: probes are a fixed constant —
    the scoring join is O(probes · N), the bounded-candidate pattern;
    the production path swaps in the LSH/IVF candidate sets."""
    em = T(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "xf")
    ).select(
        "vec_id", "label", "pos", F.col("xf").cast("double").alias("x")
    )
    nrm = ex.groupBy("vec_id").agg(
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(20,9)"))
        .cast("double")
        .alias("n2")
    )
    lab = em.select("vec_id", "label")
    probe = ex.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q"), "pos", F.col("x").alias("px")
    )
    dots = (
        probe.join(ex, "pos")
        .where(F.col("vec_id") != F.col("q"))
        .groupBy("q", F.col("vec_id").alias("c"))
        .agg(
            F.sum(
                F.round(F.col("px") * F.col("x"), 9).cast("decimal(20,9)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    cos = (
        dots.join(
            F.broadcast(nrm.select(F.col("vec_id").alias("q"), F.col("n2").alias("n2q"))),
            "q",
        )
        .join(nrm.select(F.col("vec_id").alias("c"), F.col("n2").alias("n2c")), "c")
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("q"), F.col("label").alias("lq"))),
            "q",
        )
        .join(lab.select(F.col("vec_id").alias("c"), F.col("label").alias("lc")), "c")
        .select(
            "q",
            "c",
            F.round(
                F.col("dot") / F.sqrt(F.col("n2q") * F.col("n2c")), 9
            ).alias("cs"),
            F.when(F.col("lq") == F.col("lc"), 1).otherwise(0).alias("rel"),
        )
    )
    w = W.partitionBy("q").orderBy(F.col("cs").desc(), "c")
    top = cos.select("q", "rel", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= 10
    )
    dcg = top.groupBy("q").agg(
        F.sum(
            F.round(F.col("rel") / F.log2(F.col("rk") + 1), 9).cast(
                "decimal(20,9)"
            )
        )
        .cast("double")
        .alias("dcg"),
        F.sum("rel").cast("long").alias("n_rel"),
    )
    # the IDEAL ranking places min(TOTAL relevant candidates, 10) ones
    # at the top — normalizing by the relevance retrieved in the top 10
    # inflated the score whenever recall < 1 (review r12, third-engine
    # find; standard NDCG@k convention)
    lq = lab.select(F.col("vec_id").alias("q"), F.col("label").alias("lq"))
    lc = lab.select(F.col("vec_id").alias("c2"), F.col("label").alias("lc2"))
    reltot = (
        lq.where(F.col("q") < 8)
        .join(
            F.broadcast(lc),
            (F.col("lc2") == F.col("lq")) & (F.col("c2") != F.col("q")),
        )
        .groupBy("q")
        .agg(F.count("*").cast("long").alias("r_tot"))
    )
    ranks = spark.range(1, 11).select(F.col("id").alias("r"))
    ideal = (
        reltot.join(
            F.broadcast(ranks), F.col("r") <= F.least(F.col("r_tot"), F.lit(10))
        )
        .groupBy("q")
        .agg(
            F.sum(
                F.round(F.lit(1.0) / F.log2(F.col("r") + 1), 9).cast(
                    "decimal(20,9)"
                )
            )
            .cast("double")
            .alias("idcg")
        )
    )
    return dcg.join(ideal, "q", "left").select(
        F.col("q").alias("probe_id"),
        "n_rel",
        F.round(
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)), 6
        ).alias("ndcg10"),
    )
