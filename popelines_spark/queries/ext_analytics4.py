"""Round-6 extension batch: association rules, change detection, forecast
backtesting, text readability, burst/ordering observability, and mixture
entropy — warehouse + training-data-pipeline shapes the earlier families
don't cover.

Determinism rules are the registry's (registry.py docstring): integer
ratios divide once in double (bit-exact both engines); multi-row double
accumulation goes through bounded-scale decimals; the only ordered double
folds are per-group lists sorted on a unique key before folding (the
c_class_centroids / rank.py pattern). Reference grounding: these extend
the delegated-SQL surface of popelines/main.py:236-249 (copy_table /
query passthrough) the same way as queries/ext_analytics3.py — the
reference user writes this SQL against BigQuery; here it is a native
operator with a DuckDB-checked contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "c_basket_lift",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
    ic AS (SELECT pk, count(*) AS n_item FROM li GROUP BY 1),
    pc AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_pair
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2)
    SELECT part_a, part_b, CAST(n_pair AS BIGINT) AS n_pair,
           CAST(n_pair AS DOUBLE) / n_orders AS support,
           CAST(n_pair AS DOUBLE) / ia.n_item AS confidence,
           CAST(n_pair * n_orders AS DOUBLE) / (ia.n_item * ib.n_item)
             AS lift
    FROM pc
    JOIN ic ia ON ia.pk = part_a
    JOIN ic ib ON ib.pk = part_b
    CROSS JOIN n
    WHERE n_pair >= 2
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def c_basket_lift(spark, sf_dir):
    """Association-rule mining over co-ordered parts: support, confidence
    and lift for every pair bought together in ≥2 orders, top-20 by lift.
    The metric companion to c_also_bought's raw top-k counts — lift > 1
    is the actual 'bought together more than chance' signal a
    recommender thresholds on.

    Scale shape: the pair generation is the order-bounded self-join
    (pairs per order ≤ items²/2, items/order is bounded by the data
    model, so fan-out is linear in orders); everything after is keyed
    aggregation plus two broadcast-size dimension joins. All three
    metrics are single double divisions of exact BIGINT products
    (n_pair·n_orders ≤ ~1e9 at sf0.1 — far under 2^53), so no rounding
    is needed for hash parity."""
    li = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = li.agg(F.count_distinct("ok").alias("n_orders"))
    ic = li.groupBy("pk").agg(F.count("*").alias("n_item"))
    b = li.select(F.col("ok"), F.col("pk").alias("pk2"))
    pc = (
        li.join(b, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .groupBy(F.col("pk").alias("part_a"), F.col("pk2").alias("part_b"))
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    ia = ic.select(F.col("pk").alias("part_a"), F.col("n_item").alias("na"))
    ib = ic.select(F.col("pk").alias("part_b"), F.col("n_item").alias("nb"))
    return (
        pc.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            (F.col("n_pair").cast("double") / F.col("n_orders")).alias(
                "support"
            ),
            (F.col("n_pair").cast("double") / F.col("na")).alias("confidence"),
            (
                (F.col("n_pair") * F.col("n_orders")).cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "c_cusum_revenue",
    oracle="""
    WITH d AS (SELECT l_shipdate AS day,
                      SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS rev
               FROM lineitem GROUP BY 1),
    c AS (SELECT day,
                 CAST(SUM(rev) OVER (ORDER BY day) AS DECIMAL(20,4)) AS cum,
                 CAST(row_number() OVER (ORDER BY day) AS DECIMAL(10,0))
                   AS t
          FROM d),
    g AS (SELECT CAST(count(*) AS DECIMAL(10,0)) AS n,
                 CAST(SUM(rev) AS DECIMAL(20,4)) AS total
          FROM d)
    SELECT day,
           CAST(round(n * cum - t * total, 0) AS BIGINT) AS dev_scaled
    FROM c CROSS JOIN g
    ORDER BY abs(n * cum - t * total) DESC, day
    LIMIT 5
    """,
)
def c_cusum_revenue(spark, sf_dir):
    """CUSUM change-point screen on daily shipped revenue: the five days
    where the cumulative revenue path deviates most from the
    constant-rate line. The classic drift detector, made EXACT by
    clearing the mean's division: dev_t = n·cum_t − t·total (all
    decimal/integer arithmetic — n·cum ≤ ~5e13 unscaled at sf0.1, inside
    int64/int128 on both engines), so the flagged set and the reported
    deviation are integers, not float-accumulated residuals.

    Scale shape: one keyed daily rollup, then the cumulative path via a
    broadcast ≤-staircase join (the c_skyline pattern) instead of a
    GLOBAL ordered window — the day-grain table is calendar-bounded
    (thousands of rows at any corpus size), so broadcasting it keeps the
    prefix sums partition-parallel where a partition-less window would
    funnel everything to one task (the WindowExec warning class the plan
    audit bans)."""
    li = T(spark, sf_dir, "lineitem")
    d = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).alias("rev")
    )
    d2 = d.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    c = (
        d.join(F.broadcast(d2), F.col("day2") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.sum("rev2").cast("decimal(20,4)").alias("cum"),
            F.count("*").cast("decimal(10,0)").alias("t"),
        )
    )
    g = d.agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        F.sum("rev").cast("decimal(20,4)").alias("total"),
    )
    dev = F.col("n") * F.col("cum") - F.col("t") * F.col("total")
    return (
        c.crossJoin(F.broadcast(g))
        .select(
            "day",
            F.round(dev, 0).cast("long").alias("dev_scaled"),
            F.abs(dev).alias("__a"),
        )
        .orderBy(F.col("__a").desc(), "day")
        .limit(5)
        .select("day", "dev_scaled")
    )


@query(
    "c_forecast_smape",
    oracle="""
    WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                      count(*) AS n
               FROM events GROUP BY 1, 2),
    j AS (SELECT a.event_type, a.n AS actual, f.n AS fc
          FROM d a JOIN d f
            ON f.event_type = a.event_type
           AND f.day = a.day - INTERVAL 7 DAY)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(SUM(CAST(round(2.0 * abs(actual - fc) / (actual + fc), 9)
                         AS DECIMAL(16,9))) AS DOUBLE) / count(*) AS smape
    FROM j GROUP BY 1
    """,
)
def c_forecast_smape(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's per-type event
    count with the count 7 days earlier and report sMAPE per type — the
    baseline every forecasting deployment must beat, and the
    backtest-evaluation operator itself. Per-day terms are single double
    divisions of small integers (bit-exact both engines), rounded to 9dp
    and accumulated in decimal so the mean is order-independent; 9dp
    terms of magnitude ≤ 2 can never land on a cross-engine rounding tie
    (a dyadic rational with exactly 10 decimal digits needs a 5^10
    denominator — impossible for count sums ≤ 1e5)."""
    ev = T(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    f = d.select(
        F.col("event_type"),
        (F.col("day") + F.expr("INTERVAL 7 DAY")).alias("day"),
        F.col("n").alias("fc"),
    )
    j = d.withColumnRenamed("n", "actual").join(f, ["event_type", "day"])
    term = 2.0 * F.abs(F.col("actual") - F.col("fc")) / (
        F.col("actual") + F.col("fc")
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        (
            F.sum(F.round(term, 9).cast("decimal(16,9)")).cast("double")
            / F.count("*")
        ).alias("smape"),
    )


@query(
    "c_readability",
    oracle="""
    WITH s AS (SELECT doc_id,
                      len(regexp_extract_all(text, '[A-Za-z]+')) AS words,
                      greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                        AS sentences,
                      len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                        AS vowel_groups
               FROM documents)
    SELECT doc_id, CAST(words AS BIGINT) AS words,
           CAST(sentences AS BIGINT) AS sentences,
           CAST(vowel_groups AS BIGINT) AS vowel_groups,
           206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
                   - 84.6 * (CAST(vowel_groups AS DOUBLE) / words)
             AS flesch
    FROM s WHERE words >= 1
    """,
)
def c_readability(spark, sf_dir):
    """Flesch-style readability per document with a vowel-group syllable
    proxy (the standard library-free approximation) — the text-quality
    scorer a curation pipeline uses to bucket prose vs boilerplate.
    Pure JVM regexp_count expressions (no Python); the score is a fixed
    chain of per-row double ops on integer counts, bit-identical across
    engines, so it ships unrounded. Regex classes are literal
    character-class + '+' only — identical semantics in Java regex and
    RE2."""
    d = T(spark, sf_dir, "documents")
    words = F.regexp_count(F.col("text"), F.lit("[A-Za-z]+"))
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    )
    vowels = F.regexp_count(F.col("text"), F.lit("[aeiouyAEIOUY]+"))
    return (
        d.select(
            "doc_id",
            words.cast("long").alias("words"),
            sentences.cast("long").alias("sentences"),
            vowels.cast("long").alias("vowel_groups"),
        )
        .filter(F.col("words") >= 1)
        .select(
            "doc_id",
            "words",
            "sentences",
            "vowel_groups",
            (
                F.lit(206.835)
                - F.lit(1.015)
                * (F.col("words").cast("double") / F.col("sentences"))
                - F.lit(84.6)
                * (F.col("vowel_groups").cast("double") / F.col("words"))
            ).alias("flesch"),
        )
    )


@query(
    "c_activity_burst",
    oracle="""
    WITH e AS (SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec
               FROM events),
    w AS (SELECT user_id,
                 count(*) OVER (PARTITION BY user_id ORDER BY sec
                                RANGE BETWEEN 3599 PRECEDING
                                          AND CURRENT ROW) AS in_hour
          FROM e)
    SELECT user_id, CAST(max(in_hour) AS BIGINT) AS max_burst
    FROM w GROUP BY 1 HAVING max(in_hour) >= 3
    """,
)
def c_activity_burst(spark, sf_dir):
    """Burst detection: each user's maximum number of events inside any
    trailing 60-minute window, keeping users who ever burst ≥3 — the
    alerting/abuse primitive behind rate-limit forensics. One user-keyed
    RANGE-frame window over epoch seconds (count only — no floats); the
    trailing-window-ending-at-an-event formulation is exact for burst
    detection because the densest window can always be slid to end on an
    event."""
    ev = T(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3599, 0)
    )
    return (
        ev.select("user_id", F.count("*").over(w).alias("in_hour"))
        .groupBy("user_id")
        .agg(F.max("in_hour").cast("long").alias("max_burst"))
        .filter(F.col("max_burst") >= 3)
    )


@query(
    "c_lang_entropy",
    oracle="""
    WITH cl AS (SELECT source, lang, count(*) AS c
                FROM documents GROUP BY 1, 2),
    t AS (SELECT source, SUM(c) AS n FROM cl GROUP BY 1)
    SELECT cl.source, CAST(max(t.n) AS BIGINT) AS n_docs,
           CAST(-SUM(CAST(round(
                  (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
                AS DECIMAL(16,9))) AS DOUBLE) AS entropy
    FROM cl JOIN t ON cl.source = t.source
    GROUP BY cl.source
    """,
)
def c_lang_entropy(spark, sf_dir):
    """Shannon entropy of each source's language mix — the
    mixture-diversity readout a corpus curator tracks per provider (the
    log-scale companion of c_simpson_diversity, over sources rather than
    tokens). Each p·ln(p) term is per-row double arithmetic (bit-exact),
    rounded to 9dp and accumulated in DECIMAL so the sum is
    order-INDEPENDENT — an ordered double fold is not enough here because
    DuckDB's list_sum is not a strict left fold (1-ulp pairwise-summation
    drift surfaced at sf0.1); transcendental ln values never terminate at
    exactly 9 decimals, so the rounding has no cross-engine tie."""
    d = T(spark, sf_dir, "documents")
    cl = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    tot = cl.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(p * F.log(p), 9).cast("decimal(16,9)")
    return (
        cl.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            (-F.sum(term)).cast("double").alias("entropy"),
        )
    )


@query(
    "c_props_value_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                         AS DECIMAL(20,4))) AS DOUBLE) / count(*) AS avg_k
    FROM events GROUP BY 1
    """,
)
def c_props_value_stats(spark, sf_dir):
    """Semi-structured payload analytics: the events table carries a JSON
    ``props`` string (the reference's rows are arbitrary JSON dicts —
    popelines/main.py:83 fix_values — and this is the query-side
    counterpart: extract typed fields from the payload at read time and
    aggregate). JSON path extraction runs JVM-side (get_json_object, no
    Python); the mean goes through the exact-decimal-sum / one-division
    pattern."""
    ev = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("__k")).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.min("__k").cast("long").alias("min_k"),
        F.max("__k").cast("long").alias("max_k"),
        (
            F.sum(F.col("__k").cast("decimal(20,4)")).cast("double")
            / F.count("*")
        ).alias("avg_k"),
    )


@query(
    "c_degree_distribution",
    oracle="""
    WITH pk AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS node
                FROM lineitem),
    und AS (SELECT DISTINCT a.node AS src, b.node AS dst
            FROM pk a JOIN pk b ON a.ok = b.ok AND a.node < b.node),
    deg AS (SELECT node, count(*) AS d FROM (
              SELECT src AS node FROM und
              UNION ALL SELECT dst FROM und) GROUP BY 1)
    SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS degree_bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_deg,
           CAST(max(d) AS BIGINT) AS max_deg
    FROM deg GROUP BY 1
    """,
)
def c_degree_distribution(spark, sf_dir):
    """Log2-bucketed degree histogram of the co-purchase graph — the
    first thing to look at before choosing a graph algorithm's skew
    strategy (it is how the power-law trap c_triangle_count_skew
    stresses would be DETECTED in production). Keyed aggs only; the
    bucket index is computed INTEGER-EXACTLY as length(bin(d)) - 1 ==
    floor(log2(d)) on both engines (ADVICE r6: floor(ln d / ln 2) on raw
    doubles risks a 1-ulp libm divergence at power-of-2 degrees flipping
    a bucket on one engine only)."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pk = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("node")
    ).distinct()
    b = pk.select(F.col("ok"), F.col("node").alias("node2"))
    und = (
        pk.join(b, "ok")
        .filter(F.col("node") < F.col("node2"))
        .select(F.col("node").alias("src"), F.col("node2").alias("dst"))
        .distinct()
    )
    deg = (
        und.select(F.col("src").alias("node"))
        .unionByName(und.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    return deg.groupBy(
        (F.length(F.bin("d")) - 1)
        .cast("long")
        .alias("degree_bucket")
    ).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.min("d").cast("long").alias("min_deg"),
        F.max("d").cast("long").alias("max_deg"),
    )


@query(
    "c_zipf_fit",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents),
    freq AS (SELECT token, count(*) AS f FROM tok
             WHERE token <> '' GROUP BY 1),
    top AS (SELECT token, f FROM freq
            ORDER BY f DESC, token LIMIT 100),
    ranked AS (SELECT a.token, a.f, count(*) AS r
               FROM top a JOIN top b
                 ON b.f > a.f OR (b.f = a.f AND b.token <= a.token)
               GROUP BY a.token, a.f),
    terms AS (SELECT CAST(round(ln(CAST(r AS DOUBLE)), 9)
                          AS DECIMAL(16,9)) AS x,
                     CAST(round(ln(CAST(f AS DOUBLE)), 9)
                          AS DECIMAL(16,9)) AS y
              FROM ranked),
    s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(SUM(x) AS DOUBLE) AS sx,
                 CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(round(SUM(x * y), 9) AS DOUBLE) AS sxy,
                 CAST(round(SUM(x * x), 9) AS DOUBLE) AS sxx
          FROM terms)
    SELECT CAST(n AS BIGINT) AS n_tokens,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope
    FROM s
    """,
)
def c_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary: least-squares slope of
    ln(freq) vs ln(rank) for the top-100 tokens — the canonical
    token-distribution health check (natural text sits near −1; heavily
    deduplicated or templated corpora drift). Ranks come from a
    broadcast ≤-staircase over the 100-row top table (no partition-less
    window); the four regression sums accumulate 9dp-rounded decimals
    (order-free — ln terms are transcendental, no rounding ties), and
    the closed-form slope is a fixed chain of double ops on the four
    exact sums."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(F.count("*").alias("f"))
    top = freq.orderBy(F.col("f").desc(), "token").limit(100)
    b2 = top.select(F.col("token").alias("t2"), F.col("f").alias("f2"))
    ranked = (
        top.join(
            F.broadcast(b2),
            (F.col("f2") > F.col("f"))
            | ((F.col("f2") == F.col("f")) & (F.col("t2") <= F.col("token"))),
        )
        .groupBy("token", "f")
        .agg(F.count("*").alias("r"))
    )
    x = F.round(F.log(F.col("r").cast("double")), 9).cast("decimal(16,9)")
    y = F.round(F.log(F.col("f").cast("double")), 9).cast("decimal(16,9)")
    s = ranked.select(x.alias("x"), y.alias("y")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        # round the scale-18 product sums back to 9dp BEFORE the double
        # cast: their unscaled value crosses 2^53 and DuckDB's
        # decimal→double conversion double-rounds there (last-ulp drift
        # observed at sf0.1); at scale 9 the conversion is exact, and
        # round() is HALF_UP on both engines so even exact ties agree.
        F.round(F.sum(F.col("x") * F.col("y")), 9).cast("double").alias(
            "sxy"
        ),
        F.round(F.sum(F.col("x") * F.col("x")), 9).cast("double").alias(
            "sxx"
        ),
    )
    return s.select(
        F.col("n").cast("long").alias("n_tokens"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("zipf_slope"),
    )


@query(
    "c_jaccard_topk",
    oracle="""
    WITH sh0 AS MATERIALIZED (
                SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
                FROM documents,
                     unnest(range(1, len(text) - 3)) AS t(i)
                WHERE n_chars >= 5),
    nd AS (SELECT count(*) AS n_docs FROM documents WHERE n_chars >= 5),
    rare AS (SELECT g FROM sh0 CROSS JOIN nd GROUP BY g, n_docs
             HAVING count(*) <= greatest(20, n_docs / 100)),
    sh AS MATERIALIZED (
          SELECT sh0.doc_id, sh0.g FROM sh0 JOIN rare ON rare.g = sh0.g),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    probes AS (SELECT doc_id FROM documents
               WHERE doc_id % 97 = 0 AND n_chars >= 5),
    common AS (SELECT p.doc_id AS probe_id, c.doc_id AS neighbor_id,
                      count(*) AS com
               FROM sh p JOIN sh c ON p.g = c.g AND p.doc_id <> c.doc_id
               JOIN probes ON probes.doc_id = p.doc_id
               GROUP BY 1, 2),
    scored AS (SELECT probe_id, neighbor_id,
                      CAST(com AS DOUBLE) / (sp.n + sc.n - com) AS jaccard
               FROM common
               JOIN sz sp ON sp.doc_id = probe_id
               JOIN sz sc ON sc.doc_id = neighbor_id)
    SELECT probe_id, CAST(rk AS BIGINT) AS rank, neighbor_id, jaccard
    FROM (SELECT probe_id, neighbor_id, jaccard,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY jaccard DESC, neighbor_id)
                   AS rk
          FROM scored)
    WHERE rk <= 3
    """,
)
def c_jaccard_topk(spark, sf_dir):
    """Exact lexical similar-document search: for each probe doc (every
    97th id), the top-3 corpus docs by exact 5-gram character-shingle
    Jaccard over DISCRIMINATIVE shingles — shingles appearing in more
    than max(20, 1%) of documents are dropped from the metric on both
    engines (the IR stopword-shingle rule). The filter is what makes the
    inverted-index join scale: ubiquitous shingles contribute
    Σ df² ≈ |probes|·N candidate pairs (measured 15× slope on 10× data
    before the cap on this tiny-vocabulary corpus) while carrying zero
    discriminative signal; with the df cap, per-shingle fan-out is
    bounded and candidates track true lexical overlap. The lexical twin
    of c_knn_cosine, and the exact evaluator a near-dup pipeline's
    MinHash estimates are judged against. |A∪B| = |A|+|B|−common clears
    the union without a second pass; Jaccard values are exact integer
    ratios (one double division), so rank order is engine-identical even
    among near-ties; the length guard keeps Spark's descending-sequence
    edge case out (SURVEY §5 / sequence trap)."""
    from pyspark.sql.window import Window as W2

    d = T(spark, sf_dir, "documents").filter(F.col("n_chars") >= 5)
    # substring with a dynamic start needs the SQL form — F.substring's
    # column API takes literal positions only.
    sh0 = (
        d.selectExpr(
            "doc_id",
            "explode(transform(sequence(1, length(text) - 4),"
            " i -> substring(text, i, 5))) AS g",
        )
        .distinct()
    )
    nd = d.agg(F.count("*").alias("n_docs"))
    rare = (
        sh0.groupBy("g")
        .agg(F.count("*").alias("__df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("__df") <= F.greatest(F.lit(20), F.col("n_docs") / 100))
        .select("g")
    )
    # sh feeds three legs (sizes, probe side, corpus side) — materialize
    # once or the shingle build re-executes through each (CTE-inlining
    # rule; the oracle mirrors with AS MATERIALIZED).
    from popelines_spark.plans.inspect import checkpoint

    sh = checkpoint(sh0.join(rare, "g"), "jaccard-shingles", eager=False)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    probes = d.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("probe_id")
    )
    p = sh.join(
        probes, sh.doc_id == probes.probe_id
    ).select("probe_id", "g")
    c = sh.select(F.col("doc_id").alias("neighbor_id"), "g")
    common = (
        p.join(c, "g")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .groupBy("probe_id", "neighbor_id")
        .agg(F.count("*").alias("com"))
    )
    sp = sz.select(F.col("doc_id").alias("probe_id"), F.col("n").alias("np"))
    sc = sz.select(
        F.col("doc_id").alias("neighbor_id"), F.col("n").alias("nc")
    )
    scored = (
        common.join(sp, "probe_id")
        .join(sc, "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            (
                F.col("com").cast("double")
                / (F.col("np") + F.col("nc") - F.col("com"))
            ).alias("jaccard"),
        )
    )
    w = W2.partitionBy("probe_id").orderBy(
        F.col("jaccard").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "rank", "neighbor_id", "jaccard")
    )


@query(
    "c_revenue_bridge",
    oracle="""
    WITH pp AS (SELECT p_brand, year(l_shipdate) AS yr,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)))
                            AS DOUBLE) AS rev,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)))
                            AS DOUBLE) AS vol
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE year(l_shipdate) IN (1996, 1997)
                GROUP BY 1, 2)
    SELECT a.p_brand,
           a.rev AS rev_1996, b.rev AS rev_1997,
           (b.rev / b.vol - a.rev / a.vol) * b.vol AS price_effect,
           (a.rev / a.vol) * (b.vol - a.vol) AS volume_effect
    FROM pp a JOIN pp b
      ON a.p_brand = b.p_brand AND a.yr = 1996 AND b.yr = 1997
    """,
)
def c_revenue_bridge(spark, sf_dir):
    """Revenue bridge (price/volume decomposition), 1996 → 1997 per
    brand: Δrev = (p̄₂−p̄₁)·vol₂ + p̄₁·(vol₂−vol₁) — the finance
    waterfall that answers 'did we sell more, or just charge more'. The
    identity makes the two effects sum exactly to Δrev. Sums accumulate
    in DECIMAL (cast to double exactly — unscaled < 2^53), and the
    effects are fixed chains of double ops on those exact sums —
    bit-identical cross-engine with no rounding."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1996, 1997)
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)"))
            .cast("double")
            .alias("rev"),
            F.sum(F.col("l_quantity").cast("decimal(20,4)"))
            .cast("double")
            .alias("vol"),
        )
    )
    a = pp.filter(F.col("yr") == 1996).select(
        "p_brand", F.col("rev").alias("rev_1996"), F.col("vol").alias("v1")
    )
    b = pp.filter(F.col("yr") == 1997).select(
        "p_brand", F.col("rev").alias("rev_1997"), F.col("vol").alias("v2")
    )
    return a.join(b, "p_brand").select(
        "p_brand",
        "rev_1996",
        "rev_1997",
        (
            (F.col("rev_1997") / F.col("v2") - F.col("rev_1996") / F.col("v1"))
            * F.col("v2")
        ).alias("price_effect"),
        (
            (F.col("rev_1996") / F.col("v1")) * (F.col("v2") - F.col("v1"))
        ).alias("volume_effect"),
    )


@query(
    "c_price_elasticity",
    oracle="""
    WITH pts AS (SELECT p_brand,
                        CAST(round(ln(l_extendedprice / l_quantity), 9)
                             AS DECIMAL(16,9)) AS x,
                        CAST(round(ln(l_quantity), 9)
                             AS DECIMAL(16,9)) AS y
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE l_quantity > 0 AND l_extendedprice > 0),
    s AS (SELECT p_brand, CAST(count(*) AS DOUBLE) AS n,
                 CAST(round(SUM(x), 6) AS DOUBLE) AS sx,
                 CAST(round(SUM(y), 6) AS DOUBLE) AS sy,
                 CAST(round(SUM(x * y), 6) AS DOUBLE) AS sxy,
                 CAST(round(SUM(x * x), 6) AS DOUBLE) AS sxx
          FROM pts GROUP BY 1)
    SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS elasticity
    FROM s
    """,
)
def c_price_elasticity(spark, sf_dir):
    """Log-log price elasticity of demand per brand: least-squares slope
    of ln(quantity) on ln(unit price) over every line item — the retail
    econometrics primitive behind promotion planning (on this synthetic
    data the slope hovers near its null, which is itself the honest
    readout). Same determinism scheme as c_zipf_fit, scaled for per-brand
    row counts: per-row double terms → 9dp decimals; the four regression
    sums rounded to 6dp before the double cast so their unscaled value
    stays below 2^53 at sf1.0+ (the zipf trap, one SF earlier)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.round(
        F.log(F.col("l_extendedprice") / F.col("l_quantity")), 9
    ).cast("decimal(16,9)")
    y = F.round(F.log(F.col("l_quantity")), 9).cast("decimal(16,9)")
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_brand", x.alias("x"), y.alias("y"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.round(F.sum("x"), 6).cast("double").alias("sx"),
            F.round(F.sum("y"), 6).cast("double").alias("sy"),
            F.round(F.sum(F.col("x") * F.col("y")), 6)
            .cast("double")
            .alias("sxy"),
            F.round(F.sum(F.col("x") * F.col("x")), 6)
            .cast("double")
            .alias("sxx"),
        )
    )
    return s.select(
        "p_brand",
        F.col("n").cast("long").alias("n_lines"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("elasticity"),
    )


@query(
    "c_discount_lift",
    oracle="""
    WITH g AS (SELECT p_brand,
                      CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS d,
                      l_quantity AS q
               FROM lineitem JOIN part ON l_partkey = p_partkey),
    s AS (SELECT p_brand,
                 CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_disc,
                 CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_full,
                 CAST(SUM(CASE WHEN d = 1
                               THEN CAST(q AS DECIMAL(20,4))
                               ELSE CAST(0 AS DECIMAL(20,4)) END)
                      AS DOUBLE) AS q_disc,
                 CAST(SUM(CASE WHEN d = 0
                               THEN CAST(q AS DECIMAL(20,4))
                               ELSE CAST(0 AS DECIMAL(20,4)) END)
                      AS DOUBLE) AS q_full
          FROM g GROUP BY 1)
    SELECT p_brand, n_disc, n_full,
           q_disc / n_disc AS avg_qty_disc,
           q_full / n_full AS avg_qty_full,
           (q_disc / n_disc) / (q_full / n_full) AS lift
    FROM s WHERE n_disc > 0 AND n_full > 0
    """,
)
def c_discount_lift(spark, sf_dir):
    """Promotion lift: average quantity on discounted (≥5%) vs
    full-price lines per brand, and their ratio — the first-order
    question of any markdown program. Conditional exact-decimal sums +
    integer counts; the three outputs are single/chained double
    divisions of exact values (no rounding needed)."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)
    qd = F.when(
        F.col("l_discount") >= 0.05, F.col("l_quantity").cast("decimal(20,4)")
    ).otherwise(F.lit(0).cast("decimal(20,4)"))
    qf = F.when(
        F.col("l_discount") < 0.05, F.col("l_quantity").cast("decimal(20,4)")
    ).otherwise(F.lit(0).cast("decimal(20,4)"))
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(d).cast("long").alias("n_disc"),
            F.sum(1 - d).cast("long").alias("n_full"),
            F.sum(qd).cast("double").alias("q_disc"),
            F.sum(qf).cast("double").alias("q_full"),
        )
        .filter((F.col("n_disc") > 0) & (F.col("n_full") > 0))
    )
    return s.select(
        "p_brand",
        "n_disc",
        "n_full",
        (F.col("q_disc") / F.col("n_disc")).alias("avg_qty_disc"),
        (F.col("q_full") / F.col("n_full")).alias("avg_qty_full"),
        (
            (F.col("q_disc") / F.col("n_disc"))
            / (F.col("q_full") / F.col("n_full"))
        ).alias("lift"),
    )


@query(
    "c_runs_test",
    oracle="""
    WITH d AS MATERIALIZED (
               SELECT date_trunc('month', l_shipdate) AS mon,
                      l_shipdate AS day,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)))
                           AS DECIMAL(20,4)) AS rev
               FROM lineitem GROUP BY 1, 2),
    m AS (SELECT CAST(SUM(rev) AS DECIMAL(20,4)) AS tot,
                 CAST(count(*) AS DECIMAL(10,0)) AS nd FROM d),
    sg AS (SELECT mon, day,
                  CASE WHEN rev * (SELECT nd FROM m) > (SELECT tot FROM m)
                       THEN 1 ELSE 0 END AS s
           FROM d),
    runs AS (SELECT mon, s,
                    CASE WHEN lag(s) OVER (PARTITION BY mon ORDER BY day)
                              IS DISTINCT FROM s
                         THEN 1 ELSE 0 END AS brk
             FROM sg)
    SELECT mon, CAST(count(*) AS BIGINT) AS n_days,
           CAST(SUM(s) AS BIGINT) AS n_above,
           CAST(SUM(brk) AS BIGINT) AS n_runs
    FROM runs GROUP BY 1
    """,
)
def c_runs_test(spark, sf_dir):
    """Wald–Wolfowitz-style runs screen on daily revenue: per month, the
    number of maximal runs of days above/below the GLOBAL daily mean —
    too few runs = trending/autocorrelated, too many = oscillating
    (pairs with c_autocorr's lag view and c_cusum_revenue's level view).
    The above-mean test is division-free: rev·n_days > total compares
    exact decimals, so the sign sequence — and therefore every count —
    is integer-exact. Runs are counted per month so the lag window is
    month-partitioned (no global window)."""
    li = T(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("mon"),
        F.col("l_shipdate").alias("day"),
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(20,4)"))
        .cast("decimal(20,4)")
        .alias("rev")
    )
    m = d.agg(
        F.sum("rev").cast("decimal(20,4)").alias("tot"),
        F.count("*").cast("decimal(10,0)").alias("nd"),
    )
    sg = d.crossJoin(F.broadcast(m)).select(
        "mon",
        "day",
        F.when(F.col("rev") * F.col("nd") > F.col("tot"), 1)
        .otherwise(0)
        .alias("s"),
    )
    w = W.partitionBy("mon").orderBy("day")
    runs = sg.select(
        "mon",
        "s",
        F.when(
            ~F.lag("s").over(w).eqNullSafe(F.col("s")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    return runs.groupBy("mon").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("s").cast("long").alias("n_above"),
        F.sum("brk").cast("long").alias("n_runs"),
    )


@query(
    "c_incremental_join",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
             AS total_rev,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def c_incremental_join(spark, sf_dir):
    """Incremental JOIN-view maintenance: the join companion of
    c_incremental_agg's partial-merge refresh. The materialized view
    rev-by-nation(orders ⋈ customer ⋈ nation) is refreshed as
    merge(stored partials of the BASE epoch, partials of ΔA ⋈ B) — the
    standard delta-join algebra (ΔA⋈B; B is the slowly-changing dim) —
    so a daily load touches only the delta's join work, never rescanning
    the base fact. The oracle recomputes the view FROM SCRATCH: the
    hash-match IS the refresh-equivalence proof. Base partials are
    materialized once (at scale: the stored MV table); decimal partials
    make merge order irrelevant."""
    from popelines_spark.plans.inspect import checkpoint

    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    split = "1997-01-01"

    def partials(o):
        return (
            o.join(cust, o.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias(
                    "__rev"
                ),
                F.count("*").alias("__n"),
            )
        )

    base_mv = checkpoint(
        partials(orders.filter(F.col("o_orderdate") < split)),
        "incr-join-base-mv",
        eager=False,
    )
    delta_mv = partials(orders.filter(F.col("o_orderdate") >= split))
    return (
        base_mv.unionByName(delta_mv)
        .groupBy("n_name")
        .agg(
            F.sum("__rev").cast("double").alias("total_rev"),
            F.sum("__n").cast("long").alias("n_orders"),
        )
    )


@query(
    "c_rolling_dau_hll",
    oracle="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
    SELECT day, TRUE AS within_5pct FROM days
    """,
)
def c_rolling_dau_hll(spark, sf_dir):
    """The HLL twin BASELINE.md §Round 5 documented for c_rolling_dau:
    trailing-7-day distinct actives via approx_count_distinct (HLL++,
    rsd=0.02) instead of the exact distinct — the path for extreme user
    cardinality, where the exact per-window distinct's shuffle width is
    the bottleneck and a mergeable 1.5 KB sketch per day is not. Output
    is the hash-checkable invariant: per day, the HLL estimate sits
    within ±5% of the exact count (HLL++ at rsd 0.02 is deterministic
    for fixed data, so the booleans are stable engine-side; the oracle
    pins the day set + the expected verdict)."""
    ev = T(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    # bounded 7× fan-out: each (day, user) row serves the 7 windows
    # ending on day..day+6 (same shape as c_rolling_dau)
    fan = ev.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("__off"),
        "day",
        "user_id",
    ).select(
        (F.col("day") + F.make_interval(days=F.col("__off"))).alias("win_end"),
        "user_id",
    )
    est = fan.groupBy("win_end").agg(
        F.approx_count_distinct("user_id", 0.02).alias("__est"),
        F.count_distinct("user_id").alias("__exact"),
    )
    days = ev.select("day").distinct()
    return (
        days.join(est, days.day == est.win_end)
        .select(
            "day",
            (
                F.abs(F.col("__est") - F.col("__exact"))
                <= 0.05 * F.col("__exact")
            ).alias("within_5pct"),
        )
    )


@query(
    "c_customer_migration",
    oracle="""
    WITH spend AS MATERIALIZED (
            SELECT o_custkey AS ck, year(o_orderdate) AS yr,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                        AS DECIMAL(20,4)) AS s
            FROM orders
            WHERE year(o_orderdate) IN (1996, 1997)
            GROUP BY 1, 2),
    m AS (SELECT yr, CAST(SUM(s) AS DECIMAL(20,4)) AS tot,
                 CAST(count(*) AS DECIMAL(10,0)) AS n
          FROM spend GROUP BY 1),
    cls AS (SELECT ck, spend.yr,
                   CASE WHEN s * n > tot THEN 'high' ELSE 'low' END AS seg
            FROM spend JOIN m ON m.yr = spend.yr)
    SELECT a.seg AS seg_1996, b.seg AS seg_1997,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM cls a JOIN cls b ON a.ck = b.ck AND a.yr = 1996 AND b.yr = 1997
    GROUP BY 1, 2
    """,
)
def c_customer_migration(spark, sf_dir):
    """Segment migration matrix: customers classified high/low spender
    per year (above/below that year's mean spend — division-free:
    s·n > total compares exact decimals) and the 2×2 transition counts
    1996 → 1997 — the churn-risk movement table behind every lifecycle
    deck (the year-over-year companion of c_user_lifecycle's weekly
    flow). Keyed aggs + one self-join on customer key; every number is
    integer-exact."""
    o = T(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    spend = o.groupBy(
        F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("yr")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(20,4)"))
        .cast("decimal(20,4)")
        .alias("s")
    )
    m = spend.groupBy("yr").agg(
        F.sum("s").cast("decimal(20,4)").alias("tot"),
        F.count("*").cast("decimal(10,0)").alias("n"),
    )
    cls = spend.join(F.broadcast(m), "yr").select(
        "ck",
        "yr",
        F.when(F.col("s") * F.col("n") > F.col("tot"), "high")
        .otherwise("low")
        .alias("seg"),
    )
    a = cls.filter(F.col("yr") == 1996).select(
        "ck", F.col("seg").alias("seg_1996")
    )
    b = cls.filter(F.col("yr") == 1997).select(
        "ck", F.col("seg").alias("seg_1997")
    )
    return (
        a.join(b, "ck")
        .groupBy("seg_1996", "seg_1997")
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


@query(
    "c_order_size_hist",
    oracle="""
    WITH sz AS (SELECT l_orderkey, count(*) AS n_lines
                FROM lineitem GROUP BY 1)
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(count(*)) OVER () AS BIGINT) AS total_orders
    FROM sz GROUP BY 1
    """,
)
def c_order_size_hist(spark, sf_dir):
    """Order-size (lines per order) histogram with the grand total on
    every row — the fan-out profile that calibrates pair-join cost
    models (c_basket_lift / c_also_bought scale exactly with these
    counts). Two keyed aggs; the windowed grand total over the ≤7-row
    histogram mirrors as a broadcast scalar engine-side (no global
    window)."""
    li = T(spark, sf_dir, "lineitem")
    sz = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    hist = sz.groupBy("n_lines").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    tot = hist.agg(F.sum("n_orders").cast("long").alias("total_orders"))
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("n_lines").cast("long").alias("n_lines"),
        "n_orders",
        "total_orders",
    )


@query(
    "c_weighted_percentile",
    oracle="""
    WITH cell AS MATERIALIZED (
            SELECT l_returnflag AS rf, l_quantity AS q,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)))
                        AS DECIMAL(20,4)) AS w
            FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT rf, CAST(SUM(w) AS DECIMAL(20,4)) AS tw
            FROM cell GROUP BY 1),
    cum AS (SELECT a.rf, a.q, CAST(SUM(b.w) AS DECIMAL(20,4)) AS cw
            FROM cell a JOIN cell b ON b.rf = a.rf AND b.q <= a.q
            GROUP BY 1, 2)
    SELECT cum.rf AS l_returnflag,
           CAST(min(CASE WHEN 2 * cw >= tw THEN q END) AS BIGINT)
             AS wp50_qty,
           CAST(min(CASE WHEN 10 * cw >= 9 * tw THEN q END) AS BIGINT)
             AS wp90_qty
    FROM cum JOIN tot ON tot.rf = cum.rf
    GROUP BY 1
    """,
)
def c_weighted_percentile(spark, sf_dir):
    """Revenue-WEIGHTED quantity percentiles per return flag: the
    smallest quantity at which the cumulative revenue crosses 50% / 90%
    of the flag's total — 'half our money sits on orders of ≤N units',
    which a plain (count-weighted) percentile gets wrong whenever value
    concentrates in large lines. Exact and division-free: quantity has a
    bounded integer domain, so the cumulative weight is a broadcast
    ≤-staircase over the (flag, quantity) cells, and the crossings
    compare 2·cw ≥ tw / 10·cw ≥ 9·tw in exact decimals."""
    li = T(spark, sf_dir, "lineitem")
    cell = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.col("l_quantity").alias("q"),
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(20,4)"))
        .cast("decimal(20,4)")
        .alias("w")
    )
    tot = cell.groupBy("rf").agg(
        F.sum("w").cast("decimal(20,4)").alias("tw")
    )
    b = cell.select(
        F.col("rf").alias("rf2"), F.col("q").alias("q2"), F.col("w").alias("w2")
    )
    cum = (
        cell.join(
            F.broadcast(b),
            (F.col("rf2") == F.col("rf")) & (F.col("q2") <= F.col("q")),
        )
        .groupBy("rf", "q")
        .agg(F.sum("w2").cast("decimal(20,4)").alias("cw"))
    )
    return (
        cum.join(F.broadcast(tot), "rf")
        .groupBy(F.col("rf").alias("l_returnflag"))
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("q")))
            .cast("long")
            .alias("wp50_qty"),
            F.min(F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("q")))
            .cast("long")
            .alias("wp90_qty"),
        )
    )


@query(
    "c_mutual_info",
    oracle="""
    WITH xy AS MATERIALIZED (
            SELECT event_type AS x, dayofweek(ts) AS y, count(*) AS c
            FROM events GROUP BY 1, 2),
    mx AS (SELECT x, SUM(c) AS cx FROM xy GROUP BY 1),
    my AS (SELECT y, SUM(c) AS cy FROM xy GROUP BY 1),
    n AS (SELECT SUM(c) AS nt FROM xy)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(SUM(CAST(round(
                 (CAST(c AS DOUBLE) / nt)
                 * ln(CAST(c * nt AS DOUBLE) / (cx * cy)), 9)
               AS DECIMAL(16,9))) AS DOUBLE) AS mi_nats
    FROM xy JOIN mx ON mx.x = xy.x JOIN my ON my.y = xy.y CROSS JOIN n
    """,
)
def c_mutual_info(spark, sf_dir):
    """Mutual information between event type and weekday (nats) — the
    dependence screen that says whether behavior differs by day at all,
    before any per-day breakdown is worth reading (pairs with
    c_seasonality_dow's magnitudes and c_ab_srm's chi-square). Each of
    the ≤|types|·7 cell terms is per-row double arithmetic on exact
    integer ratios (c·N and cx·cy stay far under 2^53), rounded to 9dp
    and decimal-summed — order-free, tie-free (ln values are
    transcendental)."""
    ev = T(spark, sf_dir, "events")
    xy = ev.groupBy(
        F.col("event_type").alias("x"), F.dayofweek("ts").alias("y")
    ).agg(F.count("*").alias("c"))
    mx = xy.groupBy("x").agg(F.sum("c").alias("cx"))
    my = xy.groupBy("y").agg(F.sum("c").alias("cy"))
    n = xy.agg(F.sum("c").alias("nt"))
    term = F.round(
        (F.col("c").cast("double") / F.col("nt"))
        * F.log(
            (F.col("c") * F.col("nt")).cast("double")
            / (F.col("cx") * F.col("cy"))
        ),
        9,
    ).cast("decimal(16,9)")
    return (
        xy.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(n))
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum(term).cast("double").alias("mi_nats"),
        )
    )


@query(
    "c_late_arrival",
    oracle="""
    WITH o AS (SELECT event_type, ts,
                      max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) AS prior_max
               FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS ooo_rate
    FROM o GROUP BY 1
    """,
)
def c_late_arrival(spark, sf_dir):
    """Out-of-order-arrival profile: treating event_id as arrival order,
    the fraction of events per type whose timestamp regresses below the
    user's prior running maximum — the measurement that sizes a streaming
    pipeline's watermark delay (s_watermark_late is the policy; this is
    the data evidence for choosing it). One user-keyed running-max
    window; integer counts and a single final division."""
    ev = T(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    o = ev.select(
        "event_type",
        (F.col("ts") < F.max("ts").over(w)).cast("int").alias("__ooo"),
    )
    return o.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.coalesce("__ooo", F.lit(0))).cast("long").alias(
            "n_out_of_order"
        ),
        (
            F.sum(F.coalesce("__ooo", F.lit(0))).cast("double") / F.count("*")
        ).alias("ooo_rate"),
    )
