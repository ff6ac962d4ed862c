"""Event-sequence + ranking analytics queries (round 4).

Product-analytics operators (funnel, cohort retention, time rollup,
anomaly/drift monitoring) and lexical ranking (TF-IDF, BM25) — the query
surface a reference user composes in delegated SQL (popelines/main.py:236),
made first-class with 100 TB-safe plans (operators/eventseq.py,
llm/rank.py, operators/zorder.py docstrings carry the scale audits).

Float determinism per SURVEY.md §5: exact decimal/integer accumulation
everywhere; the only libm calls (ln in TF-IDF / BM25 / PSI) are per-row
single calls rounded to 6dp on both engines, with integer or lexicographic
tie-breaks wherever ordering feeds row selection.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.llm import rank
from popelines_spark.operators import eventseq, zorder
from popelines_spark.plans.inspect import checkpoint
from popelines_spark.registry import query
from popelines_spark.queries._util import T

_FUNNEL_STEPS = ("signup", "click", "purchase")


@query(
    "c_funnel",
    oracle="""
    WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
         s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
                WHERE e.event_type = 'click' GROUP BY e.user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
                WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST(0 AS BIGINT) AS step_idx, 'signup' AS step,
           CAST(count(*) AS BIGINT) AS n_users FROM s0
    UNION ALL SELECT CAST(1 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s1
    UNION ALL SELECT CAST(2 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s2
    """,
)
def c_funnel(spark, sf_dir):
    """signup → click → purchase ordered funnel (strictly-increasing ts,
    min-time chaining — exact, not greedy). operators/eventseq.py:funnel."""
    return eventseq.funnel(
        T(spark, sf_dir, "events"), "user_id", "ts", "event_type", _FUNNEL_STEPS
    )


@query(
    "c_retention_cohort",
    oracle="""
    WITH first AS (SELECT user_id, min(ts) AS first_ts
                   FROM events GROUP BY user_id)
    SELECT CAST(date_trunc('week', first_ts) AS TIMESTAMP) AS cohort_week,
           CAST(floor((epoch_us(ts) - epoch_us(first_ts)) / 604800000000)
                AS BIGINT) AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
)
def c_retention_cohort(spark, sf_dir):
    """Weekly cohort retention matrix. operators/eventseq.py:retention —
    offsets from exact integer microsecond math, no calendar arithmetic."""
    return eventseq.retention(T(spark, sf_dir, "events"), "user_id", "ts")


@query(
    "c_rollup_multi",
    oracle="""
    SELECT 'hour' AS grain, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
           CAST(count(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE)
    FROM events GROUP BY 2
    """,
)
def c_rollup_multi(spark, sf_dir):
    """Hypertable-style multi-grain rollup: the day grain aggregates the
    hour grain's decimal partials (one raw scan total); the oracle recomputes
    each grain from raw — exact decimal accumulation makes them identical.
    operators/eventseq.py:time_rollup."""
    return eventseq.time_rollup(
        T(spark, sf_dir, "events"), "ts", "value", grains=("hour", "day")
    )


@query(
    "c_sample_per_group",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (SELECT e.*, row_number() OVER (
            PARTITION BY user_id
            ORDER BY ((event_id % 1000003) * 2654435761) % 1000000007, event_id
          ) AS rn FROM events e)
    WHERE rn <= 3
    """,
)
def c_sample_per_group(spark, sf_dir):
    """Deterministic 3-per-user reservoir sample via multiplicative id-hash
    order (no RNG — identical rows under retries/AQE and in the oracle).
    operators/eventseq.py:sample_per_group."""
    return eventseq.sample_per_group(
        T(spark, sf_dir, "events"), "user_id", "event_id", k=3
    ).select("event_id", "user_id", "event_type")


@query(
    "c_anomaly_zscore",
    oracle="""
    WITH st AS (SELECT event_type,
            CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS s,
            CAST(SUM(CAST(value AS DECIMAL(12,4))
                     * CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS s2,
            CAST(count(value) AS DOUBLE) AS n
        FROM events GROUP BY event_type)
    SELECT event_id, e.event_type, value,
           round((value - s/n) / sqrt(s2/n - (s/n)*(s/n)), 6) AS zscore
    FROM events e JOIN st USING (event_type)
    WHERE CASE WHEN s2/n - (s/n)*(s/n) > 0
               THEN abs((value - s/n) / sqrt(s2/n - (s/n)*(s/n))) > 2.5
               ELSE FALSE END
    """,
)
def c_anomaly_zscore(spark, sf_dir):
    """Per-group z-score outliers: moments from decimal-exact sums, so the
    threshold comparison is bit-identical cross-engine (division and sqrt
    are IEEE-correctly-rounded). operators/eventseq.py:zscore_outliers."""
    return (
        eventseq.zscore_outliers(
            T(spark, sf_dir, "events"), "event_type", "value", threshold=2.5
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("zscore", 6).alias("zscore"),
        )
    )


@query(
    "c_drift_psi",
    oracle="""
    WITH observed AS (
      SELECT event_type,
             CAST(least(greatest(floor(value / 50.0), 0), 9) AS BIGINT) AS bucket,
             CAST(count_if(event_id % 2 = 0) AS BIGINT) AS n_ref,
             CAST(count_if(event_id % 2 = 1) AS BIGINT) AS n_cmp
      FROM events GROUP BY 1, 2),
    -- FULL group x bucket grid: +1 smoothing runs over the DECLARED 10
    -- buckets, not just observed ones (review r12 — observed-only
    -- dropped the empty buckets' nonzero terms and skewed every
    -- denominator; both engines colluded so parity never saw it)
    counted AS (
      SELECT g.event_type, b.bucket,
             COALESCE(o.n_ref, 0) AS n_ref,
             COALESCE(o.n_cmp, 0) AS n_cmp
      FROM (SELECT DISTINCT event_type FROM observed) g
      CROSS JOIN (SELECT CAST(unnest(range(10)) AS BIGINT) AS bucket) b
      LEFT JOIN observed o
        ON o.event_type = g.event_type AND o.bucket = b.bucket),
    tot AS (SELECT *,
            sum(n_ref + 1) OVER (PARTITION BY event_type) AS tr,
            sum(n_cmp + 1) OVER (PARTITION BY event_type) AS tc
            FROM counted)
    SELECT event_type, bucket, n_ref, n_cmp,
           (n_ref + 1) / tr AS p_ref,
           (n_cmp + 1) / tc AS p_cmp,
           round(((n_ref+1)/tr - (n_cmp+1)/tc)
                 * ln(((n_ref+1)/tr) / ((n_cmp+1)/tc)), 6) AS psi_term
    FROM tot
    """,
)
def c_drift_psi(spark, sf_dir):
    """Population-stability drift between even/odd event-id halves, per
    (event_type, value bucket) — attributable per-bucket PSI terms, +1
    smoothing. operators/eventseq.py:psi_terms."""
    t = eventseq.psi_terms(
        T(spark, sf_dir, "events"),
        "event_type",
        "value",
        split=F.col("event_id") % 2 == 1,
        n_buckets=10,
        bucket_width=50.0,
    )
    return t.withColumn("psi_term", F.round("psi_term", 6))


@query(
    "c_tfidf_topk",
    oracle="""
    WITH tf AS (SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS tf
                FROM documents, UNNEST(str_split(text, ' ')) AS u(term)
                GROUP BY doc_id, u.term),
         dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         scored AS (SELECT doc_id, term, tf, df,
                           round(tf * ln((n + 1) / (df + 1)), 6) AS score
                    FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, score, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def c_tfidf_topk(spark, sf_dir):
    """Top-3 keywords per document by smoothed TF-IDF; ranking runs on the
    ROUNDED score with a term tie-break so rank order is engine-independent.
    llm/rank.py:tfidf_topk."""
    return rank.tfidf_topk(T(spark, sf_dir, "documents"), "doc_id", "text", k=3)


_BM25_TERMS = ("spark", "join", "stream")


@query(
    "c_bm25",
    oracle=f"""
    WITH tf AS (SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS tf
                FROM documents, UNNEST(str_split(text, ' ')) AS u(term)
                WHERE u.term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
                GROUP BY doc_id, u.term),
         dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
         stats AS (SELECT doc_id,
                          CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
                   FROM documents),
         consts AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(dl) AS DOUBLE) AS dlsum FROM stats),
         perterm AS (SELECT tf.doc_id, tf.term,
                 ln(1 + (n - df + 0.5) / (df + 0.5))
                 * (tf * (1.2 + 1)
                    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (dlsum / n)))) AS c
             FROM tf JOIN dfreq USING (term)
                     JOIN stats USING (doc_id) CROSS JOIN consts)
    SELECT doc_id,
           round(list_sum(list(c ORDER BY term)), 6) AS bm25
    FROM perterm GROUP BY doc_id
    """,
)
def c_bm25(spark, sf_dir):
    """BM25 relevance vs a fixed query bag; per-term float contributions
    summed in term order on BOTH engines (sort_array + fold / list ORDER BY)
    so the sum is bit-stable. llm/rank.py:bm25."""
    return rank.bm25(
        T(spark, sf_dir, "documents"), "doc_id", "text", _BM25_TERMS
    )


@query(
    "c_unigram_xent",
    oracle="""
    WITH tf AS (SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS tf
                FROM documents, UNNEST(str_split(text, ' ')) AS u(term)
                GROUP BY doc_id, u.term),
         vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt
                   FROM tf GROUP BY term),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM vocab),
         perterm AS (SELECT doc_id, term, tf, tf * ln(cnt / t) AS c
                     FROM tf JOIN vocab USING (term) CROSS JOIN tot)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
           round(-list_sum(list(c ORDER BY term)) / sum(tf), 6) AS xent
    FROM perterm GROUP BY doc_id
    """,
)
def c_unigram_xent(spark, sf_dir):
    """Per-doc cross-entropy under the corpus unigram LM — the cheap LM
    quality signal (both tails are curation filter candidates). Term-order
    float summation on both engines. llm/rank.py:unigram_xent."""
    return rank.unigram_xent(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "c_time_to_convert",
    oracle="""
    WITH f0 AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
         f1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'purchase' GROUP BY user_id),
         gaps AS (SELECT CAST(date_trunc('week', t0) AS TIMESTAMP) AS cohort_week,
                         (epoch_us(t1) - epoch_us(t0)) / 1e6 AS gap_s
                  FROM f0 JOIN f1 USING (user_id) WHERE t1 > t0)
    SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(gap_s, 0.5), 6) AS median_s,
           round(quantile_cont(gap_s, 0.9), 6) AS p90_s
    FROM gaps GROUP BY cohort_week
    """,
)
def c_time_to_convert(spark, sf_dir):
    """Signup→purchase conversion-latency distribution per weekly cohort:
    exact interpolated median/p90 over integer-µs gaps.
    operators/eventseq.py:time_to_convert."""
    return eventseq.time_to_convert(
        T(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        from_type="signup", to_type="purchase",
    )


@query(
    "b_join_asof_tolerance",
    oracle="""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
         pur AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT err.event_id, err.user_id,
           CAST(max(pur.ts) AS TIMESTAMP) AS last_purchase_ts
    FROM err LEFT JOIN pur
      ON err.user_id = pur.user_id AND pur.ts <= err.ts
         AND pur.ts >= err.ts - INTERVAL 7 DAY
    GROUP BY err.event_id, err.user_id
    """,
)
def b_join_asof_tolerance(spark, sf_dir):
    """As-of join with a 7-day lookback bound (pandas merge_asof tolerance
    semantics) — same single-shuffle union+running-last plan as b_join_asof,
    one extra post-window predicate. operators/asof.py."""
    from popelines_spark.operators.asof import asof_join

    ev = T(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    return asof_join(
        err,
        pur,
        left_on="user_id",
        right_on="p_user_id",
        left_ts="ts",
        right_ts="p_ts",
        tolerance_us=7 * 86400 * 1_000_000,
    ).select("event_id", "user_id", F.col("p_ts").alias("last_purchase_ts"))


@query(
    "c_event_transitions",
    oracle="""
    WITH t AS (SELECT lag(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS prev,
               event_type AS next
               FROM events)
    SELECT prev, next, CAST(count(*) AS BIGINT) AS n,
           count(*) / (sum(count(*)) OVER (PARTITION BY prev)) AS p
    FROM t WHERE prev IS NOT NULL
    GROUP BY prev, next
    """,
)
def c_event_transitions(spark, sf_dir):
    """Markov path analysis: per-user consecutive event-type transition
    counts and conditional probabilities. One keyed window (user) for the
    lag, one keyed agg on the (prev, next) pair, one tiny keyed window for
    the row-normalization — p is an exact rational of two BIGINTs so the
    double is identical cross-engine."""
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            F.lag("event_type").over(w).alias("prev"),
            F.col("event_type").alias("next"),
        )
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "next")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return trans.withColumn(
        "p", F.col("n") / F.sum("n").over(W.partitionBy("prev"))
    )


from popelines_spark.queries.ext_text import QUALITY_SQL, _lang_case_sql  # noqa: E402


@query(
    "c_ab_test",
    oracle="""
    WITH u AS (SELECT user_id,
                      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS conv,
                      user_id % 2 = 1 AS b
               FROM events GROUP BY user_id),
         agg AS (SELECT CAST(count_if(NOT b) AS BIGINT) AS n_a,
                        CAST(count_if(b) AS BIGINT) AS n_b,
                        CAST(sum(CASE WHEN NOT b THEN conv END) AS BIGINT)
                          AS conv_a,
                        CAST(sum(CASE WHEN b THEN conv END) AS BIGINT) AS conv_b
                 FROM u)
    SELECT n_a, n_b, conv_a, conv_b,
           conv_a / n_a AS p_a, conv_b / n_b AS p_b,
           round(CASE WHEN (conv_a + conv_b) / (n_a + n_b) > 0
                       AND (conv_a + conv_b) / (n_a + n_b) < 1
                      THEN (conv_a / n_a - conv_b / n_b)
                           / sqrt((conv_a + conv_b) / (n_a + n_b)
                                  * (1 - (conv_a + conv_b) / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b))
                 END, 6) AS z
    FROM agg
    """,
)
def c_ab_test(spark, sf_dir):
    """Experimentation primitive: two-proportion z-test of purchase
    conversion between deterministic user-id arms.
    operators/eventseq.py:ab_test."""
    e = T(spark, sf_dir, "events")
    return eventseq.ab_test(
        e, "user_id", "event_type", "purchase", variant=F.col("user_id") % 2 == 1
    )


@query(
    "c_stickiness",
    oracle="""
    WITH d AS (SELECT date_trunc('week', ts) AS week,
                      date_trunc('day', ts) AS day,
                      CAST(count(DISTINCT user_id) AS BIGINT) AS dau
               FROM events GROUP BY 1, 2),
         w AS (SELECT date_trunc('week', ts) AS week,
                      CAST(count(DISTINCT user_id) AS BIGINT) AS wau
               FROM events GROUP BY 1)
    SELECT CAST(d.week AS TIMESTAMP) AS week,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(dau) AS BIGINT) AS sum_dau,
           any_value(wau) AS wau,
           (sum(dau) / count(*)) / any_value(wau) AS stickiness
    FROM d JOIN w USING (week)
    GROUP BY d.week
    """,
)
def c_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per week — the classic engagement ratio. Exact
    integer distinct counts; stickiness = (sum_dau/n_days)/wau is pure
    rational arithmetic so the double matches bit-for-bit. Two keyed
    distinct aggs (day grain, week grain) + one keyed join."""
    e = T(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count_distinct("user_id").cast("long").alias("dau"))
    w = e.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )
    return (
        d.join(w, "week")
        .groupBy("week")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("dau").cast("long").alias("sum_dau"),
            F.any_value("wau").alias("wau"),
            (
                (F.sum("dau") / F.count("*")) / F.any_value("wau")
            ).alias("stickiness"),
        )
    )


@query(
    "c_lang_confusion",
    oracle=f"""
    SELECT lang, {_lang_case_sql()} AS pred_lang,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def c_lang_confusion(spark, sf_dir):
    """Labeled-vs-predicted language confusion matrix — the eval op for the
    lang-ID heuristic (llm/text.py): one keyed agg over (label, prediction).
    Reuses ext_text's shared CASE spelling so the heuristic can't diverge
    between c_lang_id and this matrix."""
    from popelines_spark.llm import text as X

    d = T(spark, sf_dir, "documents")
    return (
        d.select("lang", X.lang_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n"))
    )


@query(
    "c_quality_deciles",
    oracle=f"""
    WITH scored AS (SELECT doc_id, lang, {QUALITY_SQL} AS quality
                    FROM documents),
         binned AS (SELECT lang, quality,
                           ntile(10) OVER (PARTITION BY lang
                                           ORDER BY quality, doc_id) AS decile
                    FROM scored)
    SELECT lang, CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(quality) AS min_q, max(quality) AS max_q
    FROM binned GROUP BY lang, decile
    """,
)
def c_quality_deciles(spark, sf_dir):
    """Curriculum/quality binning: per-language decile thresholds of the
    quality score (llm/text.py) via a lang-partitioned ntile — the binning
    step of quality-curriculum sampling. Window ordering ends in doc_id so
    tie assignment is total-ordered; min/max per bin are order-insensitive
    exact doubles."""
    from popelines_spark.llm import text as X

    d = T(spark, sf_dir, "documents")
    scored = d.select("doc_id", "lang", X.quality_score("text").alias("quality"))
    w = W.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("quality").alias("min_q"),
            F.max("quality").alias("max_q"),
        )
    )


@query(
    "c_class_centroids",
    oracle="""
    WITH ex AS (SELECT label, vec_id,
                       unnest(embedding) AS val,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings)
    SELECT label, CAST(pos - 1 AS BIGINT) AS pos,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(list_sum(list(CAST(val AS DOUBLE) ORDER BY vec_id))
                 / count(*), 6) AS mean_val
    FROM ex GROUP BY label, pos
    """,
)
def c_class_centroids(spark, sf_dir):
    """Per-class mean embedding (prototype classifier primitive) as
    (label, dimension) rows; id-order float folding on both engines.
    llm/similarity.py:class_centroids."""
    from popelines_spark.llm.similarity import class_centroids

    return class_centroids(
        T(spark, sf_dir, "embeddings"), "label", "vec_id", "embedding"
    )


@query(
    "b_join_asof_forward",
    oracle="""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
         pur AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT err.event_id, err.user_id,
           CAST(min(pur.ts) AS TIMESTAMP) AS next_purchase_ts
    FROM err LEFT JOIN pur
      ON err.user_id = pur.user_id AND pur.ts >= err.ts
    GROUP BY err.event_id, err.user_id
    """,
)
def b_join_asof_forward(spark, sf_dir):
    """Forward as-of: for each error event, the EARLIEST purchase at
    ts >= error ts — the descending-traversal twin of b_join_asof, same
    join-free union+window plan. operators/asof.py (direction='forward')."""
    from popelines_spark.operators.asof import asof_join

    ev = T(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    return asof_join(
        err,
        pur,
        left_on="user_id",
        right_on="p_user_id",
        left_ts="ts",
        right_ts="p_ts",
        direction="forward",
    ).select("event_id", "user_id", F.col("p_ts").alias("next_purchase_ts"))


@query(
    "c_dq_checks",
    oracle="""
    SELECT 'orderkey_not_null' AS check_name,
           CAST(count_if(o_orderkey IS NULL) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(coalesce(sum(n) FILTER (n > 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'totalprice_range',
           CAST(count_if(o_totalprice < 0 OR o_totalprice > 1000000) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orderdate_not_null',
           CAST(count_if(o_orderdate IS NULL) AS BIGINT)
    FROM orders
    """,
)
def c_dq_checks(spark, sf_dir):
    """Data-quality expectations (the Deequ/Great-Expectations staple):
    null, range and uniqueness constraints emitted as one row per check
    with the violation count. The scalar checks share ONE scan via a
    single conditional aggregate; uniqueness is its own keyed count.
    At 100 TB this shape holds: scalar checks stay one pass, uniqueness
    is one groupBy on the candidate key."""
    o = T(spark, sf_dir, "orders")
    scalars = o.agg(
        F.count_if(F.col("o_orderkey").isNull()).cast("long").alias("nn"),
        F.count_if(
            (F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 1_000_000)
        )
        .cast("long")
        .alias("rng"),
        F.count_if(F.col("o_orderdate").isNull()).cast("long").alias("dn"),
    )
    scalars = checkpoint(  # one scan feeds three output branches
        scalars, "dq_checks scalars", eager=False
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .agg(
            F.coalesce(F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0))
            .cast("long")
            .alias("v")
        )
    )
    return (
        scalars.select(
            F.lit("orderkey_not_null").alias("check_name"),
            F.col("nn").alias("n_violations"),
        )
        .unionByName(
            dups.select(
                F.lit("orderkey_unique").alias("check_name"),
                F.col("v").alias("n_violations"),
            )
        )
        .unionByName(
            scalars.select(
                F.lit("totalprice_range").alias("check_name"),
                F.col("rng").alias("n_violations"),
            )
        )
        .unionByName(
            scalars.select(
                F.lit("orderdate_not_null").alias("check_name"),
                F.col("dn").alias("n_violations"),
            )
        )
    )


@query(
    "c_zorder_key",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           {zorder.zorder_sql('o_custkey', 'o_orderkey')} AS zkey
    FROM orders
    """,
)
def c_zorder_key(spark, sf_dir):
    """Morton (Z-order) interleave of (custkey, orderkey) — the clustering
    key for two-dimensional min/max file pruning; pure shift/AND integer
    arithmetic, identical expression emitted for both engines
    (operators/zorder.py:zorder_sql is the single source of truth)."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        zorder.zorder_key(F.col("o_custkey"), F.col("o_orderkey")).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# Round 5 — TPC-DS-flavored window-over-aggregate analytics (VERDICT r4 #7).
#
# The pattern these three exercise is the one the registry lacked: a window
# function whose INPUT is itself a grouped aggregate (TPC-DS q47/q57
# same-store-sales, q75 year-over-year, ratio_to_report-style shares).
# Determinism: the aggregate is accumulated in exact DECIMAL and STAYS
# decimal through the window (window sums of doubles are order-dependent);
# only the final projection casts to double. Plan shape: broadcast dims,
# partial+final hash agg, then ONE window exchange partitioned by the
# grouping key — never an unpartitioned window (tests/test_plans.py covers
# every registered plan).

_REV_DEC = (
    "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))"
)


@query(
    "c_yoy_brand",
    oracle=f"""
    WITH agg AS (
        SELECT p_brand, CAST(year(o_orderdate) AS BIGINT) AS sale_year,
               SUM({_REV_DEC}) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2)
    SELECT p_brand, sale_year,
           CAST(r AS DOUBLE) AS revenue,
           CAST(lag(r) OVER (PARTITION BY p_brand ORDER BY sale_year)
                AS DOUBLE) AS prev_revenue,
           ROUND(CAST(r AS DOUBLE)
                 / CAST(lag(r) OVER (PARTITION BY p_brand ORDER BY sale_year)
                        AS DOUBLE), 6) AS yoy_ratio
    FROM agg
    """,
)
def c_yoy_brand(spark, sf_dir):
    """TPC-DS q75-style year-over-year: revenue per (brand, year), then a
    lag window over the aggregate gives each year its predecessor and the
    YoY ratio. The window partitions by brand — at 100 TB the post-agg
    relation is |brands|x|years| rows, so the window exchange is tiny."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    p = F.broadcast(T(spark, sf_dir, "part"))
    agg = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand", F.year("o_orderdate").cast("long").alias("sale_year")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(20,4)"
                )
            ).alias("__r")
        )
    )
    w = W.partitionBy("p_brand").orderBy("sale_year")
    prev = F.lag("__r").over(w)
    return agg.select(
        "p_brand",
        "sale_year",
        F.col("__r").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        F.round(
            F.col("__r").cast("double") / prev.cast("double"), 6
        ).alias("yoy_ratio"),
    )


@query(
    "c_nation_share",
    oracle=f"""
    WITH agg AS (
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS sale_year,
               SUM({_REV_DEC}) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
    SELECT n_name, sale_year,
           CAST(r AS DOUBLE) AS revenue,
           ROUND(CAST(r AS DOUBLE)
                 / CAST(sum(r) OVER (PARTITION BY sale_year) AS DOUBLE),
                 6) AS year_share,
           CAST(rank() OVER (PARTITION BY sale_year
                             ORDER BY r DESC, n_name) AS BIGINT) AS rk
    FROM agg
    """,
)
def c_nation_share(spark, sf_dir):
    """ratio_to_report-style market share: each nation's slice of the year
    total (unordered-frame window sum over the aggregate, exact in decimal)
    plus its rank within the year (n_name tie-break — deterministic row
    set). TPC-H q8's market-share question as a window, not a re-join."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = F.broadcast(T(spark, sf_dir, "nation"))
    agg = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("sale_year")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(20,4)"
                )
            ).alias("__r")
        )
    )
    wy = W.partitionBy("sale_year")
    wr = W.partitionBy("sale_year").orderBy(F.col("__r").desc(), "n_name")
    return agg.select(
        "n_name",
        "sale_year",
        F.col("__r").cast("double").alias("revenue"),
        F.round(
            F.col("__r").cast("double")
            / F.sum("__r").over(wy).cast("double"),
            6,
        ).alias("year_share"),
        F.rank().over(wr).cast("long").alias("rk"),
    )


@query(
    "c_moving_monthly",
    oracle=f"""
    WITH agg AS (
        SELECT n_name,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_ts,
               SUM({_REV_DEC}) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
    SELECT n_name, month_ts,
           CAST(r AS DOUBLE) AS revenue,
           CAST(sum(r) OVER (PARTITION BY n_name ORDER BY month_ts
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS mov3_sum,
           CAST(CAST(sum(r) OVER (PARTITION BY n_name ORDER BY month_ts
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                     AS DOUBLE)
                / count(*) OVER (PARTITION BY n_name ORDER BY month_ts
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS mov3_avg
    FROM agg
    """,
)
def c_moving_monthly(spark, sf_dir):
    """TPC-DS q53/q63-style moving window over a monthly aggregate: 3-month
    rolling revenue per nation. The moving sum accumulates DECIMAL partials
    (exact, order-free) and the average divides the exact sum by the frame
    count — bit-identical on both engines without rounding."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = F.broadcast(T(spark, sf_dir, "nation"))
    agg = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name", F.date_trunc("month", "o_orderdate").alias("month_ts")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(20,4)"
                )
            ).alias("__r")
        )
    )
    wf = (
        W.partitionBy("n_name")
        .orderBy("month_ts")
        .rowsBetween(-2, W.currentRow)
    )
    mov_sum = F.sum("__r").over(wf).cast("double")
    return agg.select(
        "n_name",
        "month_ts",
        F.col("__r").cast("double").alias("revenue"),
        mov_sum.alias("mov3_sum"),
        (mov_sum / F.count(F.lit(1)).over(wf)).cast("double").alias("mov3_avg"),
    )


@query(
    "c_skew_sessionize",
    oracle="""
    WITH skewed AS (
      SELECT CASE WHEN event_id % 5 = 0 THEN 7 ELSE user_id END AS user_id,
             ts, event_id
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM skewed
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM flagged)
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(ts) AS TIMESTAMP) AS session_last
    FROM numbered GROUP BY user_id, sess
    """,
)
def c_skew_sessionize(spark, sf_dir):
    """Hot-key stress twin of c_sessionize (VERDICT r4 #4): every 5th event
    (exactly 20% of the table) is remapped to ONE user before sessionizing,
    so the user_id shuffle carries a key holding a fifth of all rows. The
    sort-based gaps-and-islands plan cannot salt (order within the key is
    the semantics); this entry proves the answer stays exact under that
    skew, and bench.py times the same query at sf0.1 to measure the
    hot-key wall-time cost (ARCHITECTURE.md §"Skewed-key stress")."""
    e = T(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 5 == 0, F.lit(7))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "ts",
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
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
        F.sum("is_new")
        .over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("sess"),
    )
    return (
        numbered.groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").cast("long").alias("n_events"),
            F.max("ts").alias("session_last"),
        )
        .drop("sess")
    )
