"""SURVEY.md §2 Part C — round-8 batch 3: model-evaluation and
classical-diagnostics operators a training-data pipeline runs over its
labels and scores (ROC-AUC, Kruskal-Wallis, Cohen's kappa,
Brier/log-loss, Wilson intervals, odds ratios, lagged cross-correlation,
decision-stump information gain, stratified k-fold manifests, BPE
merge-pair statistics).

Reference parity: the reference delegates all of this to BigQuery SQL
(`popelines/main.py:236-243`); each entry here is the Spark-native form
with a DuckDB oracle twin.

Determinism discipline (SURVEY.md §5 / _util.py):
 - ranks come from the bounded-bucket cumulative staircase (the
   c_mannwhitney pattern) — average ranks are exact multiples of 0.5
   carried in DECIMAL, so rank sums are order-free;
 - every multi-row double accumulation is per-row round → DECIMAL sum;
 - ln/exp appear only per-row, followed by a 4-6dp round before any
   accumulation or emission (the established psi/tfidf pattern);
 - sqrt is IEEE-correctly-rounded, safe per-row;
 - z critical values are shared double literals on both engines.

Scale notes: every operator collapses the corpus to a bounded frame
(price buckets ≤ 6k cells, day grain, group grain ≤ label cardinality,
vocab grain for char pairs) in ONE keyed aggregation with map-side
partials before any staircase/cross-term arithmetic; staircases run as
broadcast theta-joins on the bounded cell table, never on rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.plans.inspect import checkpoint
from popelines_spark.registry import query
from popelines_spark.queries._util import T

#: z for a 95% two-sided interval — shared literal, both engines.
_Z95 = "1.959963984540054"


@query(
    "c_auc_roc",
    oracle="""
    WITH s AS (SELECT CAST(floor(o_totalprice / 100) AS BIGINT) AS b,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
               FROM orders),
    cells AS MATERIALIZED (
      SELECT b, CAST(count(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM s GROUP BY 1),
    cum AS (SELECT c.b, c.cnt, c.pos,
                   CAST(COALESCE(SUM(c2.cnt), 0) AS BIGINT) AS below
            FROM cells c LEFT JOIN cells c2 ON c2.b < c.b
            GROUP BY 1, 2, 3),
    r AS (SELECT pos,
                 CAST(below + (cnt + 1) / 2.0 AS DECIMAL(20,1)) AS ar
          FROM cum),
    a AS (SELECT CAST(SUM(pos * ar) AS DOUBLE) AS s1 FROM r),
    t AS (SELECT CAST(SUM(pos) AS BIGINT) AS n1,
                 CAST(SUM(cnt) AS BIGINT) AS n FROM cells)
    SELECT t.n1, t.n - t.n1 AS n0,
           round((a.s1 - t.n1 * (t.n1 + 1) / 2.0)
                 / (t.n1 * CAST(t.n - t.n1 AS DOUBLE)), 6) AS auc
    FROM a, t
    """,
)
def c_auc_roc(spark, sf_dir):
    """ROC-AUC of order value as a score for the 'F' status label, via
    the rank-sum identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) with average
    (mid) ranks for ties — the label-quality screen run before using a
    heuristic score as a training filter. Ranks come from the $100
    value-bucket staircase (documented discretization, bounds the cell
    table); average ranks are exact .5 multiples in DECIMAL so the rank
    sum is order-free. Scale: one keyed agg → ≤6k cells; the staircase
    is a broadcast theta-join on cells."""
    o = T(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") / 100).cast("long").alias("b"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = o.groupBy("b").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    cells = checkpoint(cells, "auc-cells", eager=False)
    c2 = cells.select(F.col("b").alias("b2"), F.col("cnt").alias("cnt2"))
    cum = (
        cells.join(F.broadcast(c2), F.col("b2") < F.col("b"), "left")
        .groupBy("b", "cnt", "pos")
        .agg(F.coalesce(F.sum("cnt2"), F.lit(0)).cast("long").alias("below"))
    )
    r = cum.select(
        "pos",
        (F.col("below") + (F.col("cnt") + F.lit(1)) / F.lit(2.0))
        .cast("decimal(20,1)")
        .alias("ar"),
    )
    a = r.agg(F.sum(F.col("pos") * F.col("ar")).cast("double").alias("s1"))
    t = cells.agg(
        F.sum("pos").cast("long").alias("n1"),
        F.sum("cnt").cast("long").alias("n"),
    )
    return (
        a.crossJoin(F.broadcast(t))
        .select(
            "n1",
            (F.col("n") - F.col("n1")).alias("n0"),
            F.round(
                (F.col("s1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0))
                / (
                    F.col("n1")
                    * (F.col("n") - F.col("n1")).cast("double")
                ),
                6,
            ).alias("auc"),
        )
    )


@query(
    "c_kruskal_wallis",
    oracle="""
    WITH s AS (SELECT o_orderpriority AS g,
                      CAST(floor(o_totalprice / 100) AS BIGINT) AS b
               FROM orders),
    cells AS MATERIALIZED (
      SELECT g, b, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY 1, 2),
    allb AS MATERIALIZED (
      SELECT b, CAST(SUM(cnt) AS BIGINT) AS ca FROM cells GROUP BY 1),
    cum AS (SELECT a.b, a.ca,
                   CAST(COALESCE(SUM(a2.ca), 0) AS BIGINT) AS below
            FROM allb a LEFT JOIN allb a2 ON a2.b < a.b GROUP BY 1, 2),
    ar AS (SELECT b, CAST(below + (ca + 1) / 2.0 AS DECIMAL(20,1)) AS ar
           FROM cum),
    grp AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g,
                   CAST(SUM(cnt * ar) AS DOUBLE) AS r_g
            FROM cells JOIN ar USING (b) GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k FROM grp),
    ss AS (SELECT CAST(SUM(CAST(round(r_g * r_g / n_g, 6)
                                AS DECIMAL(38,6))) AS DOUBLE) AS rss
           FROM grp),
    tie AS (SELECT CAST(SUM(ca * ca * ca - ca) AS BIGINT) AS t3
            FROM allb)
    SELECT tot.k, tot.n,
           round(12.0 * ss.rss / (tot.n * (tot.n + 1.0))
                 - 3.0 * (tot.n + 1), 6) AS h,
           round((12.0 * ss.rss / (tot.n * (tot.n + 1.0))
                  - 3.0 * (tot.n + 1))
                 / (1.0 - tie.t3
                    / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n)),
                 6) AS h_tie
    FROM tot, ss, tie
    """,
)
def c_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis rank ANOVA of order value across priority classes
    (H and its tie-corrected form) — the nonparametric k-group extension
    of c_mannwhitney, on the same $100 bucket staircase. Group rank sums
    are exact .5-multiple DECIMALs; the k per-group R²/n terms fold
    through a 6dp round → DECIMAL sum; the tie term Σ(t³−t) stays
    BIGINT. Scale: one keyed agg to (group, bucket) cells; staircase on
    the bounded bucket table; everything after is k-row arithmetic."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") / 100).cast("long").alias("b"),
    )
    cells = o.groupBy("g", "b").agg(F.count("*").cast("long").alias("cnt"))
    cells = checkpoint(cells, "kw-cells", eager=False)
    allb = cells.groupBy("b").agg(F.sum("cnt").cast("long").alias("ca"))
    allb = checkpoint(allb, "kw-allb", eager=False)
    a2 = allb.select(F.col("b").alias("b2"), F.col("ca").alias("ca2"))
    ar = (
        allb.join(F.broadcast(a2), F.col("b2") < F.col("b"), "left")
        .groupBy("b", "ca")
        .agg(F.coalesce(F.sum("ca2"), F.lit(0)).cast("long").alias("below"))
        .select(
            "b",
            (F.col("below") + (F.col("ca") + F.lit(1)) / F.lit(2.0))
            .cast("decimal(20,1)")
            .alias("ar"),
        )
    )
    grp = (
        cells.join(F.broadcast(ar), "b")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(F.col("cnt") * F.col("ar")).cast("double").alias("r_g"),
        )
    )
    grp = checkpoint(grp, "kw-grp", eager=False)
    tot = grp.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    ss = grp.agg(
        F.sum(
            F.round(F.col("r_g") * F.col("r_g") / F.col("n_g"), 6).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("rss")
    )
    tie = allb.agg(
        F.sum(
            F.col("ca") * F.col("ca") * F.col("ca") - F.col("ca")
        )
        .cast("long")
        .alias("t3")
    )
    h = 12.0 * F.col("rss") / (F.col("n") * (F.col("n") + F.lit(1.0))) - 3.0 * (
        F.col("n") + 1
    )
    corr = F.lit(1.0) - F.col("t3") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return (
        tot.crossJoin(F.broadcast(ss))
        .crossJoin(F.broadcast(tie))
        .select(
            "k",
            "n",
            F.round(h, 6).alias("h"),
            F.round(h / corr, 6).alias("h_tie"),
        )
    )


@query(
    "c_cohens_kappa",
    oracle="""
    WITH c AS (SELECT o_custkey,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                           AS DOUBLE) AS spend,
                      CAST(count(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY 1),
    flags AS (SELECT CASE WHEN spend >= 2500000.0 THEN 1 ELSE 0 END AS ra,
                     CASE WHEN n_orders >= 10 THEN 1 ELSE 0 END AS rb
              FROM c),
    cell AS (SELECT CAST(SUM(ra * rb) AS BIGINT) AS n11,
                    CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
                    CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
                    CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00,
                    CAST(count(*) AS BIGINT) AS n
             FROM flags)
    SELECT n11, n10, n01, n00,
           round(((n11 + n00) / CAST(n AS DOUBLE)
                  - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                     + (n01 + n00) * CAST(n10 + n00 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0
                    - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                       + (n01 + n00) * CAST(n10 + n00 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * n)),
                 6) AS kappa
    FROM cell
    """,
)
def c_cohens_kappa(spark, sf_dir):
    """Cohen's kappa agreement between two high-value-customer rules
    (lifetime spend ≥ 2.5M vs order count ≥ 10) — the label-agreement
    check run before trusting a cheap heuristic as a training label.
    Spend accumulates in exact DECIMAL so the threshold comparison is
    engine-identical; the 2×2 table is exact BIGINT; kappa is per-row
    double arithmetic on those ints. Scale: one keyed agg per customer
    → one conditional-sum agg to a single row."""
    o = T(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
        .cast("double")
        .alias("spend"),
        F.count("*").cast("long").alias("n_orders"),
    )
    flags = c.select(
        F.when(F.col("spend") >= 2500000.0, 1).otherwise(0).alias("ra"),
        F.when(F.col("n_orders") >= 10, 1).otherwise(0).alias("rb"),
    )
    cell = flags.agg(
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("long").alias("n00"),
        F.count("*").cast("long").alias("n"),
    )
    nd = F.col("n").cast("double")
    pe = (
        (F.col("n11") + F.col("n10"))
        * (F.col("n11") + F.col("n01")).cast("double")
        + (F.col("n01") + F.col("n00"))
        * (F.col("n10") + F.col("n00")).cast("double")
    ) / (nd * F.col("n"))
    po = (F.col("n11") + F.col("n00")) / nd
    return cell.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@query(
    "c_brier_logloss",
    oracle="""
    WITH s AS (
      SELECT least(greatest(o_totalprice / 500000.0, 0.01), 0.99) AS p,
             CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
      FROM orders),
    t AS (SELECT CAST(round((p - y) * (p - y), 6) AS DECIMAL(30,6)) AS bt,
                 CAST(round(-(y * ln(p) + (1.0 - y) * ln(1.0 - p)), 6)
                      AS DECIMAL(30,6)) AS lt
          FROM s)
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(CAST(SUM(bt) AS DOUBLE) / count(*), 6) AS brier,
           round(CAST(SUM(lt) AS DOUBLE) / count(*), 6) AS logloss
    FROM t
    """,
)
def c_brier_logloss(spark, sf_dir):
    """Brier score and log-loss of a clamped linear price score as a
    probability forecast for the 'F' label — the two proper scoring
    rules a calibration pipeline (c_calibration_bins) reports next to
    its reliability table. p is a per-row clamp (no transcendentals
    until ln in the per-row log-loss term); both per-row terms fold
    through a 6dp round → DECIMAL sum so the corpus accumulation is
    order-free. Scale: one pass, one scalar agg with map-side
    partials."""
    o = T(spark, sf_dir, "orders")
    s = o.select(
        F.least(
            F.greatest(F.col("o_totalprice") / 500000.0, F.lit(0.01)),
            F.lit(0.99),
        ).alias("p"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    )
    t = s.select(
        F.round((F.col("p") - F.col("y")) * (F.col("p") - F.col("y")), 6)
        .cast("decimal(30,6)")
        .alias("bt"),
        F.round(
            -(
                F.col("y") * F.log(F.col("p"))
                + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - F.col("p"))
            ),
            6,
        )
        .cast("decimal(30,6)")
        .alias("lt"),
    )
    return t.agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("bt").cast("double") / F.count("*"), 6).alias("brier"),
        F.round(F.sum("lt").cast("double") / F.count("*"), 6).alias(
            "logloss"
        ),
    )


@query(
    "c_wilson_ci",
    oracle=f"""
    WITH g AS (SELECT c_mktsegment AS seg,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                           AS BIGINT) AS s
               FROM customer GROUP BY 1)
    SELECT seg, n, s,
           round(((s / CAST(n AS DOUBLE)
                   + {_Z95} * {_Z95} / (2.0 * n))
                  - {_Z95} * sqrt((s / CAST(n AS DOUBLE))
                                  * (1.0 - s / CAST(n AS DOUBLE)) / n
                                  + {_Z95} * {_Z95} / (4.0 * n * n)))
                 / (1.0 + {_Z95} * {_Z95} / n), 6) AS lo,
           round(((s / CAST(n AS DOUBLE)
                   + {_Z95} * {_Z95} / (2.0 * n))
                  + {_Z95} * sqrt((s / CAST(n AS DOUBLE))
                                  * (1.0 - s / CAST(n AS DOUBLE)) / n
                                  + {_Z95} * {_Z95} / (4.0 * n * n)))
                 / (1.0 + {_Z95} * {_Z95} / n), 6) AS hi
    FROM g
    """,
)
def c_wilson_ci(spark, sf_dir):
    """Wilson 95% score interval for the positive-balance proportion
    per market segment — the small-sample-safe binomial CI a data-quality
    dashboard reports instead of the Wald interval. Counts are exact;
    the interval is per-row double arithmetic (sqrt is correctly
    rounded) with a shared z literal, so both engines emit identical
    doubles. Scale: one keyed agg → segment-cardinality frame."""
    z = F.lit(float(_Z95))
    cu = T(spark, sf_dir, "customer")
    g = cu.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )
    nd = F.col("n").cast("double")
    ph = F.col("s") / nd
    z2 = z * z
    denom = F.lit(1.0) + z2 / F.col("n")
    center = ph + z2 / (F.lit(2.0) * F.col("n"))
    half = z * F.sqrt(
        ph * (F.lit(1.0) - ph) / F.col("n")
        + z2 / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    return g.select(
        "seg",
        "n",
        "s",
        F.round((center - half) / denom, 6).alias("lo"),
        F.round((center + half) / denom, 6).alias("hi"),
    )


@query(
    "c_odds_ratio",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS e,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    cell AS (SELECT CAST(SUM(e * y) AS BIGINT) AS a,
                    CAST(SUM(e * (1 - y)) AS BIGINT) AS b,
                    CAST(SUM((1 - e) * y) AS BIGINT) AS c,
                    CAST(SUM((1 - e) * (1 - y)) AS BIGINT) AS d
             FROM s),
    h AS (SELECT a, b, c, d,
                 (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)) AS orr,
                 sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                      + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)) AS se
          FROM cell)
    SELECT a, b, c, d, round(orr, 4) AS odds_ratio,
           round(exp(ln(orr) - {_Z95} * se), 4) AS lo,
           round(exp(ln(orr) + {_Z95} * se), 4) AS hi
    FROM h
    """,
)
def c_odds_ratio(spark, sf_dir):
    """Haldane-corrected odds ratio (with 95% log-normal CI) of order
    completion ('F') given high priority — the effect-size companion to
    c_chi2_independence for 2×2 screens. Cell counts are exact BIGINT;
    the +0.5 correction, ln/exp and sqrt are per-row on one row, rounded
    4dp (established psi/tfidf transcendental discipline). Scale: one
    conditional-sum agg to a single row."""
    z = F.lit(float(_Z95))
    o = T(spark, sf_dir, "orders")
    s = o.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("e"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cell = s.agg(
        F.sum(F.col("e") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("e") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("e")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("y"))).cast("long").alias("d"),
    )
    orr = (
        (F.col("a") + 0.5)
        * (F.col("d") + 0.5)
        / ((F.col("b") + 0.5) * (F.col("c") + 0.5))
    )
    se = F.sqrt(
        1.0 / (F.col("a") + 0.5)
        + 1.0 / (F.col("b") + 0.5)
        + 1.0 / (F.col("c") + 0.5)
        + 1.0 / (F.col("d") + 0.5)
    )
    return cell.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 4).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - z * se), 4).alias("lo"),
        F.round(F.exp(F.log(orr) + z * se), 4).alias("hi"),
    )


@query(
    "c_cross_corr_lag",
    oracle="""
    WITH x AS (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
               FROM events WHERE event_type = 'view' GROUP BY 1),
    y AS (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
    lags AS (SELECT unnest(range(0, 8)) AS lag),
    j AS (SELECT l.lag, x.x, y.y
          FROM lags l
          JOIN x ON true
          JOIN y ON y.d = x.d + CAST(l.lag AS INTEGER)),
    a AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM j GROUP BY 1)
    SELECT CAST(lag AS BIGINT) AS lag, n_days,
           round((n_days * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n_days * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n_days * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * sy)), 6) AS r
    FROM a
    """,
)
def c_cross_corr_lag(spark, sf_dir):
    """Lagged cross-correlation of daily view volume against purchase
    volume at lags 0..7 days — the lead-indicator scan behind
    'do views predict purchases k days out'. Day sums and all five
    moment sums are exact BIGINT; Pearson r per lag is per-row double
    arithmetic on those exact images. Scale: corpus → day grain in one
    keyed agg; the lag fan-out is a ×8 broadcast over the bounded day
    table."""
    ev = T(spark, sf_dir, "events")
    x = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("x"))
    )
    y = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    lags = spark.range(0, 8).select(F.col("id").alias("lag"))
    j = (
        x.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(y.select(F.col("d").alias("d2"), "y")),
            F.col("d2")
            == F.date_add(F.col("d"), F.col("lag").cast("int")),
        )
    )
    a = j.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n_days") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = F.sqrt(
        (
            F.col("n_days") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * (
            F.col("n_days") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    return a.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        F.round(num / den, 6).alias("r"),
    )


@query(
    "c_info_gain_split",
    oracle="""
    WITH s AS (SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS b,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
               FROM orders),
    cells AS MATERIALIZED (
      SELECT b, CAST(count(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM s GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(pos) AS BIGINT) AS p FROM cells),
    thr AS (SELECT unnest(range(1, 20)) AS t),
    lft AS (SELECT t, CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS nl,
                   CAST(COALESCE(SUM(pos), 0) AS BIGINT) AS pl
            FROM thr LEFT JOIN cells ON cells.b < thr.t GROUP BY t),
    g AS (SELECT t, nl, pl, tot.n, tot.p, tot.n - nl AS nr,
                 tot.p - pl AS pr
          FROM lft, tot WHERE nl > 0 AND tot.n - nl > 0)
    SELECT CAST(t * 25000 AS BIGINT) AS threshold, nl AS n_left,
           nr AS n_right,
           round(
             (CASE WHEN p = 0 OR p = n THEN 0.0
                   ELSE -(p / CAST(n AS DOUBLE)) * ln(p / CAST(n AS DOUBLE))
                        - ((n - p) / CAST(n AS DOUBLE))
                          * ln((n - p) / CAST(n AS DOUBLE)) END)
             - (nl / CAST(n AS DOUBLE))
               * (CASE WHEN pl = 0 OR pl = nl THEN 0.0
                       ELSE -(pl / CAST(nl AS DOUBLE))
                              * ln(pl / CAST(nl AS DOUBLE))
                            - ((nl - pl) / CAST(nl AS DOUBLE))
                              * ln((nl - pl) / CAST(nl AS DOUBLE)) END)
             - (nr / CAST(n AS DOUBLE))
               * (CASE WHEN pr = 0 OR pr = nr THEN 0.0
                       ELSE -(pr / CAST(nr AS DOUBLE))
                              * ln(pr / CAST(nr AS DOUBLE))
                            - ((nr - pr) / CAST(nr AS DOUBLE))
                              * ln((nr - pr) / CAST(nr AS DOUBLE)) END),
             6) AS gain
    FROM g
    """,
)
def c_info_gain_split(spark, sf_dir):
    """Decision-stump training: information gain of every $25k
    price-threshold split for predicting the 'F' label — the
    one-feature tree-split scan (the building block of feature-quality
    ranking over a label). The corpus collapses to ≤20 bucket cells in
    one agg; the 19-threshold staircase is a broadcast theta-join on
    those cells; entropies are per-row ln on exact integer ratios,
    rounded 6dp at emission. Scale: bounded after one pass."""
    o = T(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") / 25000).cast("long").alias("b"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = o.groupBy("b").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    cells = checkpoint(cells, "gain-cells", eager=False)
    tot = cells.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    thr = spark.range(1, 20).select(F.col("id").alias("t"))
    lft = (
        thr.join(F.broadcast(cells), F.col("b") < F.col("t"), "left")
        .groupBy("t")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("nl"),
            F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("pl"),
        )
    )
    g = (
        lft.crossJoin(F.broadcast(tot))
        .withColumn("nr", F.col("n") - F.col("nl"))
        .withColumn("pr", F.col("p") - F.col("pl"))
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
    )

    def ent(s, n):
        sd = s / n.cast("double")
        return F.when((s == 0) | (s == n), 0.0).otherwise(
            -sd * F.log(sd)
            - ((n - s) / n.cast("double")) * F.log((n - s) / n.cast("double"))
        )

    gain = (
        ent(F.col("p"), F.col("n"))
        - (F.col("nl") / F.col("n").cast("double"))
        * ent(F.col("pl"), F.col("nl"))
        - (F.col("nr") / F.col("n").cast("double"))
        * ent(F.col("pr"), F.col("nr"))
    )
    return g.select(
        (F.col("t") * 25000).cast("long").alias("threshold"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        F.round(gain, 6).alias("gain"),
    )


@query(
    "c_kfold_assign",
    oracle="""
    WITH r AS (SELECT lang, n_chars,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY doc_id) AS rn
               FROM documents)
    SELECT lang, CAST((rn - 1) % 5 AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM r GROUP BY 1, 2
    """,
)
def c_kfold_assign(spark, sf_dir):
    """Stratified 5-fold assignment manifest over the document corpus:
    deterministic round-robin within each language stratum (row_number
    by doc_id, mod 5), reporting per-(stratum, fold) document and
    character volumes — the split bookkeeping an eval pipeline checks
    for balance before training. Scale: the window partitions by
    stratum (no global ordering); one keyed agg after."""
    d = T(spark, sf_dir, "documents")
    r = d.select(
        "lang",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("doc_id"))
        .alias("rn"),
    )
    return r.groupBy(
        "lang", ((F.col("rn") - 1) % 5).cast("long").alias("fold")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@query(
    "c_bpe_pair_stats",
    oracle="""
    WITH w AS (SELECT unnest(str_split(text, ' ')) AS w FROM documents),
    wc AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE regexp_matches(w, '^[a-z]{2,}$') GROUP BY 1),
    pairs AS (SELECT substr(wc.w, CAST(i AS INTEGER), 2) AS pair, wc.c
              FROM wc, unnest(range(1, length(wc.w))) AS t(i)),
    pc AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt
           FROM pairs GROUP BY 1)
    SELECT pair, cnt FROM pc ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def c_bpe_pair_stats(spark, sf_dir):
    """BPE merge-candidate statistics: the 20 most frequent adjacent
    character pairs across the corpus (the first merge a byte-pair
    tokenizer trainer would pick, with its runner-up queue). The corpus
    collapses to the VOCABULARY first (one keyed agg over words); the
    character fan-out then runs over distinct words weighted by their
    counts — vocab-bounded, not corpus-bounded, which is what makes a
    tokenizer-training pass feasible at 100 TB. Ties break on pair text;
    counts stay BIGINT."""
    d = T(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]{2,}$"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pairs = wc.select(
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        "w",
        "c",
    ).select(F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"), "c")
    pc = pairs.groupBy("pair").agg(F.sum("c").cast("long").alias("cnt"))
    return pc.orderBy(F.col("cnt").desc(), F.col("pair")).limit(20)
