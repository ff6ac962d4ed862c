"""Round-7 batch 2 — rank/association statistics and concentration curves.

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
      SELECT j.segment,
             j.obs,
             round(pow(j.obs - CAST(r.row_tot * c.col_tot AS DOUBLE) / n.total,
                       2)
                   / (CAST(r.row_tot * c.col_tot AS DOUBLE) / n.total),
                   9) AS term
      FROM joint j JOIN rt r USING (segment) JOIN ct c USING (priority)
           CROSS JOIN n)
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
    return (
        joint.join(F.broadcast(rt), "segment")
        .join(F.broadcast(ct), "priority")
        .crossJoin(F.broadcast(n))
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
