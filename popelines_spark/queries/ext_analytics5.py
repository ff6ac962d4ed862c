"""Round-7 analytics batch — retail mix/decay, text field analysis,
sketch-accuracy and two-level-IVF invariants.

Determinism per registry rules: integer-exact bucket arithmetic, decimal
accumulation for multi-row double sums, per-row rounding to ≤4dp on
magnitudes near 10⁵ (the 12-significant-digit round() stability rule,
ARCHITECTURE.md), correctly-rounded int/int double division (exact on
both engines), unique window tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.plans.inspect import checkpoint
from popelines_spark.registry import query
from popelines_spark.queries._util import T, dsum, sql_dsum


@query(
    "c_session_dwell",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events)
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
    """,
)
def c_session_dwell(spark, sf_dir):
    """Dwell-time profile: integer-MICROsecond gaps between a user's
    consecutive events, aggregated per the event type that ENDED the gap
    — the input signal for choosing a sessionization gap threshold.
    One user-keyed window + one keyed agg; integer microseconds
    end-to-end (unix_micros / epoch_us — whole-second truncation would
    diverge on sub-second timestamps), so sums are exact on both
    engines."""
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).cast("long").alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap_us").cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )


@query(
    "c_percentile_bands",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, c.c_nationkey,
             {dsum} AS total_spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey),
    ranked AS (
      SELECT c_nationkey, total_spend,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY total_spend, c_custkey) AS rn,
             count(*) OVER (PARTITION BY c_nationkey) AS n
      FROM spend)
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST((rn - 1) * 4 // n AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_customers,
           {dsum2} AS band_spend
    FROM ranked GROUP BY 1, 2
    """.format(
        dsum=sql_dsum("o.o_totalprice"), dsum2=sql_dsum("total_spend")
    ),
)
def c_percentile_bands(spark, sf_dir):
    """Spend quartiles WITHOUT a global window (the plan audit bans
    partition-less WindowExec): banding runs inside each nation partition
    and the band index is INTEGER arithmetic — (rn-1)*4 div n — not
    cume_dist()*4 (a double ratio whose boundary cases round differently
    per engine). Unique tie-break (spend, custkey) makes rn
    deterministic."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(dsum("o_totalprice").alias("total_spend"))
    )
    w = W.partitionBy("c_nationkey").orderBy("total_spend", "c_custkey")
    ranked = spend.select(
        "c_nationkey",
        "total_spend",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("c_nationkey")).alias("n"),
    )
    return ranked.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.expr("div((rn - 1) * 4, n)").cast("long").alias("band"),
    ).agg(
        F.count("*").cast("long").alias("n_customers"),
        dsum("total_spend").alias("band_spend"),
    )


@query(
    "c_order_priority_mix",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
               AS month,
             o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    tot AS (SELECT month, CAST(SUM(n) AS BIGINT) AS total
            FROM m GROUP BY month)
    SELECT m.month, m.priority, m.n,
           CAST(m.n AS DOUBLE) / tot.total AS share
    FROM m JOIN tot USING (month)
    """,
)
def c_order_priority_mix(spark, sf_dir):
    """Monthly priority mix: two keyed aggs + one broadcastable join on
    month. share = n/total is int/int double division — correctly
    rounded, hence bit-identical on both engines, no rounding guard
    needed."""
    o = T(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").cast("long").alias("n"))
    tot = m.groupBy("month").agg(F.sum("n").cast("long").alias("total"))
    return m.join(F.broadcast(tot), "month").select(
        "month", "priority", "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
    )


@query(
    "c_clv_decay",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS anchor FROM orders),
    t AS (
      SELECT o_custkey,
             CAST(o_totalprice AS DECIMAL(20,4))
               * ([CAST(1.0 AS DECIMAL(14,10)), CAST(0.5 AS DECIMAL(14,10)),
                   CAST(0.25 AS DECIMAL(14,10)),
                   CAST(0.125 AS DECIMAL(14,10)),
                   CAST(0.0625 AS DECIMAL(14,10)),
                   CAST(0.03125 AS DECIMAL(14,10)),
                   CAST(0.015625 AS DECIMAL(14,10)),
                   CAST(0.0078125 AS DECIMAL(14,10)),
                   CAST(0.00390625 AS DECIMAL(14,10)),
                   CAST(0.001953125 AS DECIMAL(14,10)),
                   CAST(0.0009765625 AS DECIMAL(14,10))]
                  )[CAST(least(date_diff('day', o_orderdate, anchor) // 365,
                               10) AS INT) + 1] AS term
      FROM orders, mx)
    SELECT CAST(o_custkey AS BIGINT) AS custkey,
           CAST(round(SUM(term), 4) AS DOUBLE) AS decayed_value
    FROM t GROUP BY 1
    """,
)
def c_clv_decay(spark, sf_dir):
    """Exponentially-decayed customer value: each order contributes
    totalprice · 2^-(age_years), age = integer day-diff div 365 capped
    at 10. The decay factor is looked up from an 11-entry EXACT decimal
    table (2^-k terminates at k decimal digits; 10dp covers k ≤ 10), so
    every term is an exact DECIMAL(20,4)×DECIMAL(14,10) product and the
    sum is order-free and engine-identical — no double round() anywhere
    (a first cut with round(term, 4) diverged on exact half-way digits,
    91/1500 rows). The exact scale-14 sum is rounded to 4dp IN DECIMAL
    before the double cast: DuckDB converts wide decimals to double via
    int128/10^scale double arithmetic (two roundings, last-ulp drift at
    scale 14), while a scale-4 unscaled value is float-exact. The anchor
    (max order date) attaches as a one-row broadcast, the sanctioned
    scalar pattern."""
    o = T(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    decay = F.array(*[
        F.lit(f"{0.5 ** k:.10f}").cast("decimal(14,10)") for k in range(11)
    ])
    k = F.least(
        F.floor(
            F.datediff(F.to_date("anchor"), F.to_date("o_orderdate")) / 365
        ),
        F.lit(10),
    ).cast("int")
    t = o.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        (
            F.col("o_totalprice").cast("decimal(20,4)")
            * F.element_at(decay, k + 1)
        ).alias("term"),
    )
    return t.groupBy(F.col("o_custkey").cast("long").alias("custkey")).agg(
        F.round(F.sum("term"), 4).cast("double").alias("decayed_value")
    )


@query(
    "c_text_compress_ratio",
    oracle="""
    WITH g AS (
      SELECT doc_id, length(text) AS len,
             CASE WHEN length(text) >= 4 THEN
               len(list_distinct(list_transform(
                 range(1, length(text) - 2),
                 i -> substr(text, CAST(i AS INT), 4))))
             ELSE 0 END AS n_grams
      FROM documents)
    SELECT doc_id, CAST(len AS BIGINT) AS len,
           CAST(n_grams AS BIGINT) AS distinct_4grams,
           CASE WHEN len >= 4
                THEN CAST(n_grams AS DOUBLE) / (len - 3)
                ELSE CAST(0 AS DOUBLE) END AS compress_proxy
    FROM g
    """,
)
def c_text_compress_ratio(spark, sf_dir):
    """Compressibility proxy: distinct character 4-grams over total
    4-gram positions — low ratio = repetitive text (the cheap SQL-side
    stand-in for a zlib-ratio quality gate; both engines can compute it,
    which is what makes it oracle-checkable — a real DEFLATE ratio lives
    Python-side only). Whole computation is per-row HOF expressions; the
    ratio is int/int double division (exact both engines)."""
    d = T(spark, sf_dir, "documents")
    ln = F.length("text")
    grams = F.size(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), ln - 3),
                lambda i: F.col("text").substr(i, F.lit(4)),
            )
        )
    )
    out = d.select(
        "doc_id",
        ln.cast("long").alias("len"),
        F.when(ln >= 4, grams).otherwise(F.lit(0))
        .cast("long")
        .alias("distinct_4grams"),
    )
    return out.withColumn(
        "compress_proxy",
        F.when(
            F.col("len") >= 4,
            F.col("distinct_4grams").cast("double") / (F.col("len") - 3),
        ).otherwise(F.lit(0.0)),
    )


@query(
    "c_delim_fields",
    oracle="""
    WITH f AS (
      SELECT l[CAST(i AS INT) + 1] AS token, CAST(i AS BIGINT) AS pos
      FROM (SELECT string_split(text, ' ') AS l FROM documents),
           unnest(range(least(len(l), 5))) AS t(i))
    SELECT pos, token, CAST(count(*) AS BIGINT) AS n
    FROM f WHERE token <> '' GROUP BY pos, token
    """,
)
def c_delim_fields(spark, sf_dir):
    """Positional field analysis of delimited text: token frequencies at
    each of the first 5 field positions (the profiling step before
    writing a parser for column-like text). posexplode keeps the
    position JVM-side; one keyed agg."""
    d = T(spark, sf_dir, "documents")
    f = d.select(
        F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias(
            "pos", "token"
        )
    )
    return (
        f.filter(F.col("token") != "")
        .groupBy(F.col("pos").cast("long").alias("pos"), "token")
        .agg(F.count("*").cast("long").alias("n"))
    )


@query(
    "c_minhash_est_vs_true",
    oracle="""
    WITH pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             string_split(a.text, ' ') AS la, string_split(b.text, ' ') AS lb
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 25 = 0)
    SELECT a_id, b_id,
           round(CAST(len(list_distinct(list_intersect(la, lb)))
                      AS DOUBLE)
                 / len(list_distinct(list_concat(la, lb))), 9)
             AS true_jaccard,
           TRUE AS est_within_tol
    FROM pairs
    """,
)
def c_minhash_est_vs_true(spark, sf_dir):
    """Sketch-accuracy invariant: for a deterministic probe set of
    adjacent-document pairs, the 64-permutation MinHash ESTIMATE of word
    Jaccard must sit within ±0.30 of the true value (64 hashes → σ =
    √(J(1-J)/64) ≤ 0.0625, so 0.30 is ≥4.8σ; observed max deviation
    ~0.15 across SFs). True Jaccard is computed on BOTH engines
    (distinct-word set ops, rounded 9dp into decimal); the estimate —
    min-xxhash64 per seed, fraction of agreeing components — exists only
    Spark-side, so its accuracy is stamped as the boolean the driver
    hash-checks. A broken sketch (seed reuse, min over wrong grouping)
    flips stamps and fails the hash."""
    d = T(spark, sf_dir, "documents")
    words = F.array_distinct(F.split("text", " "))
    sig = F.array(*[
        F.array_min(
            F.transform(
                words, lambda w: F.xxhash64(w, F.lit(k))
            )
        ).alias(f"h{k}")
        for k in range(64)
    ])
    # pre-filter to the pair members BEFORE computing the 64-hash
    # signatures: Spark can't derive (doc_id-1)%25==0 through the join,
    # so without this ~24/25 of the signature work is computed and
    # discarded (code-review r7)
    probe = d.filter(
        (F.col("doc_id") % 25 == 0) | (F.col("doc_id") % 25 == 1)
    )
    docs = probe.select("doc_id", words.alias("w"), sig.alias("sig"))
    a = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("a_id"),
        F.col("w").alias("wa"),
        F.col("sig").alias("sa"),
    )
    b = docs.select(
        (F.col("doc_id") - 1).alias("a_id"),
        F.col("doc_id").alias("b_id"),
        F.col("w").alias("wb"),
        F.col("sig").alias("sb"),
    )
    j = a.join(b, "a_id")
    true_j = F.size(F.array_intersect("wa", "wb")) / F.size(
        F.array_union("wa", "wb")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sa", "sb", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(64.0)
    )
    return j.select(
        "a_id",
        "b_id",
        F.round(true_j, 9).alias("true_jaccard"),
        (F.abs(est - true_j) <= 0.30).alias("est_within_tol"),
    )


@query(
    "c_part_margin_rank",
    oracle="""
    WITH sold AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
               AS avg_unit_price,
             CAST(count(*) AS BIGINT) AS n_sales
      FROM lineitem GROUP BY l_partkey),
    m AS (
      SELECT p.p_brand, p.p_partkey,
             p.p_retailprice - s.avg_unit_price AS margin,
             s.n_sales
      FROM part p JOIN sold s ON s.l_partkey = p.p_partkey),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY p_brand
                                   ORDER BY margin DESC, p_partkey) AS rnk
      FROM m)
    SELECT p_brand, CAST(p_partkey AS BIGINT) AS partkey,
           CAST(margin AS DOUBLE) AS margin, n_sales,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def c_part_margin_rank(spark, sf_dir):
    """Top-3 margin parts per brand: margin = list price minus the
    QUANTITY-WEIGHTED average unit price — total revenue over total
    units, a ratio of two exact decimal sums cast to double, so the
    whole chain is one correctly-rounded division + one subtraction and
    bit-identical across engines. (A first cut rounded the per-row
    l_extendedprice/l_quantity quotient to 4dp; with 2dp prices and
    power-of-two quantities the quotient lands EXACTLY on the 5th
    decimal digit constantly, and Spark's exact-BigDecimal round vs
    DuckDB's float-scaled round split those half-way cases — 8/75 output
    rows.) Window is brand-partitioned with a unique tie-break."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    sold = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)"))
            .cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(20,4)"))
            .cast("double")
        ).alias("avg_unit_price"),
        F.count("*").cast("long").alias("n_sales"),
    )
    m = p.join(sold, sold.l_partkey == p.p_partkey).select(
        "p_brand",
        "p_partkey",
        (F.col("p_retailprice") - F.col("avg_unit_price")).alias("margin"),
        "n_sales",
    )
    w = W.partitionBy("p_brand").orderBy(F.col("margin").desc(), "p_partkey")
    return (
        m.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand",
            F.col("p_partkey").cast("long").alias("partkey"),
            F.col("margin").cast("double").alias("margin"),
            "n_sales",
            "rnk",
        )
    )


@query(
    "c_cold_start_items",
    oracle="""
    WITH sales AS (
      SELECT l.l_partkey,
             strftime(date_trunc('month', o.o_orderdate), '%Y-%m-%d')
               AS month,
             l.l_extendedprice
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    first_m AS (
      SELECT l_partkey, min(month) AS first_month FROM sales GROUP BY 1),
    monthly AS (
      SELECT month, {rev} AS total_rev FROM sales GROUP BY month),
    new_rev AS (
      SELECT s.month, CAST(count(DISTINCT s.l_partkey) AS BIGINT)
               AS n_new_parts,
             {rev2} AS new_rev
      FROM sales s JOIN first_m f
        ON f.l_partkey = s.l_partkey AND f.first_month = s.month
      GROUP BY s.month)
    SELECT m.month, n.n_new_parts, n.new_rev,
           n.new_rev / m.total_rev AS new_share
    FROM monthly m JOIN new_rev n USING (month)
    """.format(
        rev=sql_dsum("l_extendedprice"), rev2=sql_dsum("s.l_extendedprice")
    ),
)
def c_cold_start_items(spark, sf_dir):
    """Cold-start item tracking: per month, how many parts made their
    FIRST-ever sale and what revenue share they carried — the assortment
    freshness metric. Two keyed aggs + keyed joins; revenue in decimal;
    the share is a ratio of two decimal-exact doubles (one correctly-
    rounded division)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    sales = li.join(o, o.o_orderkey == li.l_orderkey).select(
        "l_partkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("month"),
        "l_extendedprice",
    )
    first_m = sales.groupBy("l_partkey").agg(
        F.min("month").alias("first_month")
    ).select(
        F.col("l_partkey").alias("fm_partkey"), "first_month"
    )
    monthly = sales.groupBy("month").agg(
        dsum("l_extendedprice").alias("total_rev")
    )
    new_rev = (
        sales.join(
            first_m,
            (sales.l_partkey == first_m.fm_partkey)
            & (sales.month == first_m.first_month),
        )
        .groupBy("month")
        .agg(
            F.countDistinct("l_partkey").cast("long").alias("n_new_parts"),
            dsum("l_extendedprice").alias("new_rev"),
        )
    )
    return monthly.join(new_rev, "month").select(
        "month",
        "n_new_parts",
        "new_rev",
        (F.col("new_rev") / F.col("total_rev")).alias("new_share"),
    )


@query(
    "c_ivf_cells_scale",
    oracle="""
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           TRUE AS exact_match_ok, TRUE AS approx_floor_ok
    FROM embeddings
    """,
)
def c_ivf_cells_scale(spark, sf_dir):
    """Two-level cell assignment invariants (VERDICT r6 next #10) as a
    registered, driver-checked query: with a full coarse probe the
    two-level path must agree with the flat literal argmax on EVERY row
    (they are provably the same function), and with a bounded probe
    (1 of 4 coarse groups) agreement must beat the probed-mass chance
    baseline by ≥2× (observed ≥0.5 vs 0.25 chance on the isotropic
    embeddings). Both stamps ride every row, so an approximation
    regression or a coarse-grouping bug hash-fails. Centroids come from
    the deterministic trainer (16 cells, 1 Lloyd iteration)."""
    from popelines_spark.llm.ivf import (
        assign_cells,
        assign_cells_two_level,
        train_centroids,
    )

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = train_centroids(
        emb, "embedding", n_cells=16, iterations=1, id_col="vec_id"
    )
    flat = assign_cells(emb, "embedding", "vec_id", cents).select(
        "vec_id", F.col("__cell").alias("flat_cell")
    )
    full = assign_cells_two_level(
        emb, "embedding", "vec_id", cents, n_coarse=4, coarse_probe=4
    ).select("vec_id", F.col("__cell").alias("full_cell"))
    approx = assign_cells_two_level(
        emb, "embedding", "vec_id", cents, n_coarse=4, coarse_probe=1
    ).select("vec_id", F.col("__cell").alias("approx_cell"))
    j = flat.join(full, "vec_id").join(approx, "vec_id")
    per_row = j.select(
        "vec_id",
        (F.col("flat_cell") == F.col("full_cell")).alias("__exact"),
        (F.col("flat_cell") == F.col("approx_cell")).cast("int")
        .alias("__hit"),
    )
    per_row = checkpoint(per_row, "ivf two-level per_row", eager=False)
    agg = per_row.agg(
        F.min("__exact").alias("exact_match_ok"),
        (F.avg("__hit") >= 0.5).alias("approx_floor_ok"),
    )
    return per_row.select(
        F.col("vec_id").cast("long").alias("vec_id")
    ).join(F.broadcast(agg))


@query(
    "c_repetition_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    base AS (
      SELECT doc_id, len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct
      FROM w),
    bg AS (
      SELECT doc_id,
             words[CAST(i AS INT) + 1] || ' ' || words[CAST(i AS INT) + 2]
               AS bigram
      FROM w, unnest(range(len(words) - 1)) AS t(i)),
    bgc AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id, max(c) AS top_bigram_n, SUM(c) AS n_bigrams
      FROM bgc GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n_words AS BIGINT) AS n_words,
           CAST(1 AS DOUBLE)
             - CAST(b.n_distinct AS DOUBLE) / b.n_words AS dup_word_frac,
           CAST(coalesce(t.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           CASE WHEN t.n_bigrams > 0
                THEN CAST(t.top_bigram_n AS DOUBLE) / t.n_bigrams
                ELSE CAST(0 AS DOUBLE) END AS top_bigram_frac,
           (CAST(1 AS DOUBLE) - CAST(b.n_distinct AS DOUBLE) / b.n_words
              > CAST(0.6 AS DOUBLE))
           OR coalesce(t.n_bigrams > 0 AND
               CAST(t.top_bigram_n AS DOUBLE) / t.n_bigrams
                 > CAST(0.18 AS DOUBLE), FALSE) AS flagged
    FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id
    """,
)
def c_repetition_filter(spark, sf_dir):
    """Gopher-style repetition quality gates: duplicate-word fraction and
    most-common-bigram fraction per document, with the standard
    flag-if-repetitive decision. Bigram counting goes through keyed aggs
    (explode → count → max), NOT an O(n²) per-row HOF mode search, so
    per-doc cost is linear and the shuffle is keyed on doc_id. All
    ratios are int/int double divisions (exact on both engines);
    threshold literals are CAST AS DOUBLE in the oracle (the DuckDB
    decimal-literal trap)."""
    d = T(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    base = w.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
    )
    bg = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("words", 1, F.size("words") - 1),
                lambda x, i: F.concat_ws(
                    " ", x, F.element_at(F.col("words"), i + 2)
                ),
            )
        ).alias("bigram"),
    )
    bgc = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    top = bgc.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams")
    )
    j = base.join(top, "doc_id", "left")
    dup_frac = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col(
        "n_words"
    )
    top_frac = F.when(
        F.col("n_bigrams") > 0,
        F.col("top_bigram_n").cast("double") / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    return j.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0))
        .cast("long")
        .alias("top_bigram_n"),
        top_frac.alias("top_bigram_frac"),
        (
            (dup_frac > 0.6)
            # coalesce: a 0/1-word doc has NULL n_bigrams, and
            # NULL & FALSE / NULL AND NULL differ between the engines'
            # three-valued-logic shortcuts (code-review r7) — pin the
            # missing-bigram case to FALSE on BOTH sides
            | F.coalesce(
                (F.col("n_bigrams") > 0) & (top_frac > 0.18), F.lit(False)
            )
        ).alias("flagged"),
    )


@query(
    "c_dup_inflation",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, source, n_chars FROM documents
      WHERE doc_id % 3 = 0),
    per_text AS (
      SELECT source, text, CAST(count(*) AS BIGINT) AS n_copies,
             CAST(min(n_chars) AS BIGINT) AS chars_unique
      FROM corpus GROUP BY source, text)
    SELECT source,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_unique_texts,
           CAST(SUM(n_copies * chars_unique) AS BIGINT) AS chars_total,
           CAST(SUM(chars_unique) AS BIGINT) AS chars_unique_total,
           CAST(SUM(n_copies * chars_unique) AS DOUBLE)
             / SUM(chars_unique) AS inflation
    FROM per_text GROUP BY source
    """,
)
def c_dup_inflation(spark, sf_dir):
    """Token(char)-weighted duplication inflation per source — the
    before/after-dedup budget number a training-data pipeline reports
    (storage and compute scale with chars_total; the model only sees
    chars_unique worth of signal). Every third doc gets a planted exact
    copy so inflation is nontrivial; grouping is (source, text) keyed —
    at 100 TB substitute xxhash64(text) as the group key to shuffle
    64-bit keys instead of full texts (same counts; the text key keeps
    the oracle engine-portable here). Integer char sums; one final
    int/int division."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text", "source", "n_chars",
        )
    )
    per_text = corpus.groupBy("source", "text").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min("n_chars").cast("long").alias("chars_unique"),
    )
    return per_text.groupBy("source").agg(
        F.sum("n_copies").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_unique_texts"),
        F.sum(F.col("n_copies") * F.col("chars_unique"))
        .cast("long")
        .alias("chars_total"),
        F.sum("chars_unique").cast("long").alias("chars_unique_total"),
        (
            F.sum(F.col("n_copies") * F.col("chars_unique")).cast("double")
            / F.sum("chars_unique")
        ).alias("inflation"),
    )


@query(
    "c_winsorized_mean",
    oracle="""
    WITH r AS (
      SELECT p_brand, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice, p_partkey) AS rn,
             count(*) OVER (PARTITION BY p_brand) AS n
      FROM part),
    cuts AS (
      SELECT p_brand, p_retailprice, rn, n,
             max(CASE WHEN rn = n // 10 + 1 THEN p_retailprice END)
               OVER (PARTITION BY p_brand) AS cut_lo,
             max(CASE WHEN rn = n - n // 10 THEN p_retailprice END)
               OVER (PARTITION BY p_brand) AS cut_hi
      FROM r)
    SELECT p_brand, CAST(max(n) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(least(greatest(p_retailprice, cut_lo), cut_hi)
                         AS DECIMAL(20,4))) AS DOUBLE) / max(n)
             AS winsorized_mean_price
    FROM cuts GROUP BY p_brand
    """,
)
def c_winsorized_mean(spark, sf_dir):
    """Winsorized mean price per brand: clamp each value to the exact
    RANK-based 10th/90th cut rows (integer rank arithmetic — NOT
    percentile interpolation, whose fractional-index math differs per
    engine), then the usual exact decimal mean. The cut values attach
    via conditional window maxes inside the brand partition — no join,
    one partitioned sort reused by all three windows."""
    p = T(spark, sf_dir, "part")
    wb = W.partitionBy("p_brand")
    r = p.select(
        "p_brand",
        "p_retailprice",
        F.row_number()
        .over(wb.orderBy("p_retailprice", "p_partkey"))
        .alias("rn"),
        F.count("*").over(wb).alias("n"),
    )
    k = F.expr("div(n, 10)")
    cuts = r.select(
        "p_brand",
        "p_retailprice",
        "n",
        F.max(F.when(F.col("rn") == k + 1, F.col("p_retailprice")))
        .over(wb)
        .alias("cut_lo"),
        F.max(F.when(F.col("rn") == F.col("n") - k, F.col("p_retailprice")))
        .over(wb)
        .alias("cut_hi"),
    )
    clamped = F.least(
        F.greatest(F.col("p_retailprice"), F.col("cut_lo")), F.col("cut_hi")
    )
    return cuts.groupBy("p_brand").agg(
        F.max("n").cast("long").alias("n_parts"),
        (
            F.sum(clamped.cast("decimal(20,4)")).cast("double")
            / F.max("n")
        ).alias("winsorized_mean_price"),
    )


@query(
    "c_record_linkage",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS dirty_id,
             substr(c_name, 1, 9 + (c_custkey % 9))
               || 'X'
               || substr(c_name, 11 + (c_custkey % 9)) AS dirty_name
      FROM customer),
    dmask AS (
      SELECT dirty_id, dirty_name, CAST(p AS INT) AS p,
             substr(dirty_name, 1, 9 + CAST(p AS INT))
               || '_' || substr(dirty_name, 11 + CAST(p AS INT)) AS masked
      FROM dirty, unnest(range(9)) AS t(p)),
    cmask AS (
      SELECT c_custkey AS clean_id, c_name, CAST(p AS INT) AS p,
             substr(c_name, 1, 9 + CAST(p AS INT))
               || '_' || substr(c_name, 11 + CAST(p AS INT)) AS masked
      FROM customer, unnest(range(9)) AS t(p)),
    cand AS (
      SELECT DISTINCT d.dirty_id, d.dirty_name, c.clean_id, c.c_name
      FROM dmask d JOIN cmask c ON c.p = d.p AND c.masked = d.masked),
    scored AS (
      SELECT dirty_id, clean_id,
             CAST(levenshtein(dirty_name, c_name) AS BIGINT) AS lev,
             row_number() OVER (PARTITION BY dirty_id
                                ORDER BY levenshtein(dirty_name, c_name),
                                         clean_id) AS rn
      FROM cand)
    SELECT dirty_id, CAST(clean_id AS BIGINT) AS matched_id, lev,
           dirty_id = clean_id AS true_match
    FROM scored WHERE rn = 1
    """,
)
def c_record_linkage(spark, sf_dir):
    """Record linkage (fuzzy entity matching) with deletion-neighborhood
    blocking: each customer name gets one deterministic character
    corruption, and the linker recovers matches by generating 9
    one-position-masked variants per name and equi-joining on
    (position, masked) — the SymSpell blocking identity: two strings at
    substitution distance 1 agree on EXACTLY the variant that masks the
    corrupted position, so candidate generation is a keyed join with no
    cross product and provably total recall for substitution-1 noise.
    Exact levenshtein then ranks candidates (both engines implement the
    same DP, integer-exact); winner = min (distance, id) per dirty row —
    a dirty_id-partitioned window, never a global one. true_match is
    honest: a corrupted digit is ambiguous against sibling keys differing
    only at that digit, so the deterministic winner is not always the
    true twin — exactly the ambiguity a production linker reports."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pos = F.col("c_custkey") % 9
    dirty = c.select(
        F.col("c_custkey").alias("dirty_id"),
        F.concat(
            F.expr("substr(c_name, 1, 9 + c_custkey % 9)"),
            F.lit("X"),
            F.expr("substr(c_name, 11 + c_custkey % 9)"),
        ).alias("dirty_name"),
    )

    def masked(df, name_col, id_alias, id_col):
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(name_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(8)),
                    lambda p: F.concat(
                        F.substring(F.col(name_col), F.lit(1), 9 + p),
                        F.lit("_"),
                        F.substring(
                            F.col(name_col), 11 + p, F.lit(99)
                        ),
                    ),
                )
            ).alias("p", "masked"),
        )

    dmask = masked(dirty, "dirty_name", "dirty_id", "dirty_id")
    cmask = masked(c, "c_name", "clean_id", "c_custkey")
    cand = dmask.join(cmask, ["p", "masked"]).select(
        "dirty_id", "dirty_name", "clean_id", "c_name"
    ).distinct()
    scored = cand.select(
        "dirty_id",
        "clean_id",
        F.levenshtein("dirty_name", "c_name").cast("long").alias("lev"),
    )
    w = W.partitionBy("dirty_id").orderBy("lev", "clean_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dirty_id",
            F.col("clean_id").cast("long").alias("matched_id"),
            "lev",
            (F.col("dirty_id") == F.col("clean_id")).alias("true_match"),
        )
    )


@query(
    "c_histogram2d",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor(l_quantity / 10) AS BIGINT), 4) AS qty_bucket,
             least(CAST(floor(l_extendedprice / 20000) AS BIGINT), 4)
               AS price_bucket,
             l_extendedprice
      FROM lineitem)
    SELECT qty_bucket, price_bucket,
           CAST(count(*) AS BIGINT) AS n,
           {rev} AS revenue
    FROM b GROUP BY 1, 2
    """.format(rev=sql_dsum("l_extendedprice")),
)
def c_histogram2d(spark, sf_dir):
    """2-D equi-width histogram (quantity × price heat grid) — the
    density backend for a scatter-heatmap over a table too big to plot
    row-wise. Bucket index = floor(value / width) — floor on the raw
    double, NEVER a double→BIGINT cast first (Spark truncates, DuckDB
    rounds: the registry's banned pattern; the first cut moved one
    boundary row per engine) — capped into a fixed 5×5 grid; one keyed
    agg, no joins."""
    li = T(spark, sf_dir, "lineitem")
    qb = F.least(
        F.floor(F.col("l_quantity") / 10), F.lit(4)
    ).cast("long")
    pb = F.least(
        F.floor(F.col("l_extendedprice") / 20000), F.lit(4)
    ).cast("long")
    return li.groupBy(
        qb.alias("qty_bucket"), pb.alias("price_bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        dsum("l_extendedprice").alias("revenue"),
    )


@query(
    "c_spearman_brand",
    oracle="""
    WITH j AS (
      SELECT p.p_brand, l.l_quantity AS x, l.l_extendedprice AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    r AS (
      SELECT p_brand,
             2 * rank() OVER (PARTITION BY p_brand ORDER BY x)
               + count(*) OVER (PARTITION BY p_brand, x) - 1 AS rx2,
             2 * rank() OVER (PARTITION BY p_brand ORDER BY y)
               + count(*) OVER (PARTITION BY p_brand, y) - 1 AS ry2
      FROM j),
    s AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(rx2 AS DECIMAL(38,0))) AS sx,
             SUM(CAST(ry2 AS DECIMAL(38,0))) AS sy,
             SUM(CAST(rx2 * rx2 AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(ry2 * ry2 AS DECIMAL(38,0))) AS syy,
             SUM(CAST(rx2 * ry2 AS DECIMAL(38,0))) AS sxy
      FROM r GROUP BY p_brand)
    SELECT p_brand, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 9)
             AS spearman_rho
    FROM s
    WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def c_spearman_brand(spark, sf_dir):
    """Spearman rank correlation between quantity and price per brand —
    the monotone-dependence screen that is robust where Pearson is not.

    TIE-CORRECT by construction: ranks are AVERAGE ranks over VALUES
    (doubled to stay integer: 2·avg_rank = 2·min_rank + tie_count − 1),
    which depend only on the value multiset — NOT on row identity. The
    first cut paired per-row row_numbers with a "(orderkey, linenumber)
    unique tie-break"… which this synthetic lineitem does NOT satisfy
    (719 duplicate key pairs), so the rx↔ry pairing was plan-dependent
    and the two engines disagreed. With value ranks, rho = Pearson on
    the rank variables: all five moment sums are scale-0-decimal exact
    (magnitudes < 2^53, so the double casts are exact on both engines),
    then one sqrt + one division — correctly rounded, identical."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    j = li.join(p, p.p_partkey == li.l_partkey).select(
        "p_brand",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def rank2(col):
        return (
            2 * F.rank().over(W.partitionBy("p_brand").orderBy(col))
            + F.count("*").over(W.partitionBy("p_brand", col))
            - 1
        )

    r = j.select(
        "p_brand", rank2("x").alias("rx2"), rank2("y").alias("ry2")
    )
    dec = "decimal(38,0)"
    s = r.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("rx2").cast(dec)).alias("sx"),
        F.sum(F.col("ry2").cast(dec)).alias("sy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast(dec)).alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast(dec)).alias("syy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast(dec)).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        s.filter((F.col("n") >= 2) & (varx > 0) & (vary > 0))
        .select(
            "p_brand",
            "n",
            F.round(
                num.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double")),
                9,
            ).alias("spearman_rho"),
        )
    )


@query(
    "c_cdf_points",
    oracle="""
    WITH pts AS (SELECT unnest([1.0, 10.0, 25.0, 40.0, 50.0]) AS x),
    seg AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1)
    SELECT s.l_returnflag, CAST(p.x AS DOUBLE) AS x,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_returnflag = s.l_returnflag
                   AND l.l_quantity <= p.x) AS DOUBLE) / s.n AS cdf
    FROM seg s, pts p
    """,
)
def c_cdf_points(spark, sf_dir):
    """Empirical CDF of quantity evaluated at 5 fixed probe points per
    return flag — the shape summary behind QQ/CDF plots without moving
    raw rows. ONE scan: conditional counts per probe point fold into the
    same keyed aggregate (sum of <=x indicators), then divide by the
    segment count — int/int double division, exact both engines. The
    oracle spells it as correlated counts; the engine computes all five
    points in a single pass."""
    li = T(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    pts = [1.0, 10.0, 25.0, 40.0, 50.0]
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        *[
            F.sum((F.col("l_quantity") <= x).cast("long")).alias(f"c{i}")
            for i, x in enumerate(pts)
        ],
    )
    stacked = agg.select(
        "l_returnflag",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(x).alias("x"),
                    (F.col(f"c{i}").cast("double") / F.col("n"))
                    .alias("cdf"),
                )
                for i, x in enumerate(pts)
            ])
        ).alias("s"),
    )
    return stacked.select(
        "l_returnflag", F.col("s.x").alias("x"), F.col("s.cdf").alias("cdf")
    )
