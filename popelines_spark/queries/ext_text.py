"""SURVEY.md §2 Part C — text analysis over `documents`.

Driver-mandated extension ops (BASELINE.json:6): token stats, frequency,
filtering, language-ID heuristic, quality scoring, fingerprinting, BPE-ish
token counting. Implementations in popelines_spark/llm/text.py; every oracle
mirrors the exact arithmetic so doubles stay bit-identical (counts →
single divisions → fixed-order weighted sums).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.llm import text as X
from popelines_spark.registry import query
from popelines_spark.queries._util import T

_WS = "str_split(text, ' ')"


@query(
    "c_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_WS}) AS BIGINT) AS n_toks,
           CAST(len(list_distinct({_WS})) AS BIGINT) AS n_distinct,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len({_WS}) AS avg_tok_len
    FROM documents
    """,
)
def c_text_stats(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.n_tokens("text").alias("n_toks"),
        X.n_distinct_tokens("text").alias("n_distinct"),
        X.avg_token_len("text").alias("avg_tok_len"),
    )


@query(
    "c_token_freq",
    oracle=f"""
    SELECT u.word, CAST(count(*) AS BIGINT) AS cnt
    FROM documents, UNNEST({_WS}) AS u(word)
    GROUP BY u.word
    ORDER BY cnt DESC, u.word
    LIMIT 50
    """,
)
def c_token_freq(spark, sf_dir):
    """Corpus token frequency: explode → groupBy → top-k. At 100 TB this is
    the canonical skew case (Zipf): map-side partial counts absorb the hot
    tokens before the shuffle."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(X.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(50)
    )


@query(
    "c_text_filter",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang IN ('en', 'de') AND n_chars BETWEEN 100 AND 900
    """,
)
def c_text_filter(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.filter(
        F.col("lang").isin("en", "de") & F.col("n_chars").between(100, 900)
    ).select("doc_id", "lang", "n_chars")


def _marker_sql(markers: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{m}'" for m in markers)
    return f"CAST(len(list_filter({_WS}, w -> w IN ({quoted}))) AS BIGINT)"


def _lang_case_sql() -> str:
    codes = list(X.LANG_MARKERS)
    scores = {c: _marker_sql(X.LANG_MARKERS[c]) for c in codes}
    branches = []
    for i, c in enumerate(codes):
        conds = [f"{scores[c]} > 0"] + [
            f"{scores[c]} >= {scores[later]}" for later in codes[i + 1 :]
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{c}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


@query(
    "c_lang_id",
    oracle=f"""
    SELECT doc_id, {_lang_case_sql()} AS pred_lang
    FROM documents
    """,
)
def c_lang_id(spark, sf_dir):
    """Marker-vocabulary language ID (n-gram heuristic): argmax of per-lang
    stopword counts, fixed tie-break. The heuristic itself is the operator
    under test — not agreement with the `lang` column."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", X.lang_id("text").alias("pred_lang"))


#: DuckDB mirror of llm/text.py quality_score — THE shared spelling; every
#: oracle that scores quality (here and ext_analytics.c_quality_deciles)
#: must use this constant so the formula can't silently diverge.
QUALITY_SQL = f"""
    least(len({_WS}) / 100.0, 1.0) * 0.4
    + (CAST(len(list_distinct({_WS})) AS DOUBLE) / len({_WS})) * 0.4
    + (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                  AS DOUBLE) / length(text)) * 0.2
"""


@query(
    "c_quality_score",
    oracle=f"""
    SELECT doc_id, {QUALITY_SQL} AS quality
    FROM documents
    """,
)
def c_quality_score(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", X.quality_score("text").alias("quality"))


@query(
    "c_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_WS} AS ws, text FROM documents)
    SELECT doc_id,
           coalesce(
             list_sort([md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                        FOR i IN generate_series(1, len(ws) - 2)])[1],
             md5(text)) AS fp
    FROM t
    """,
)
def c_fingerprint(spark, sf_dir):
    """Document fingerprint: min-MD5 over 3-token shingles (1-hash MinHash;
    rolling over the token stream)."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", X.fingerprint("text", k=3).alias("fp"))


@query(
    "c_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{X.BPE_ISH_PATTERN}')) AS BIGINT)
             AS n_bpe_toks
    FROM documents
    """,
)
def c_token_count(spark, sf_dir):
    """BPE-ish token counting (GPT-2-style pre-tokenizer regex, ASCII form)."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", X.bpe_ish_token_count("text").alias("n_bpe_toks"))


@query(
    "c_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
    WHERE rn <= 20
    """,
)
def c_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: fixed quota per language stratum
    (the training-data curation pattern: cap each source/language). Uses
    rank-by-unique-key rather than rand() so every run, engine and
    partitioning draws the same sample."""
    from pyspark.sql.window import Window as W

    d = T(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@query(
    "c_profile",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(text) AS BIGINT) AS n_text,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CAST(n_chars AS DECIMAL(20,4))) AS DOUBLE) / count(*)
             AS mean_chars
    FROM documents
    """,
)
def c_profile(spark, sf_dir):
    """Dataset profiling (null rates, cardinalities, length moments) — the
    first thing a 100 TB ingest runs; one pass, map-side combined."""
    d = T(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.count("text").alias("n_text"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum(F.col("n_chars").cast("decimal(20,4)")).cast("double") / F.count("*")).alias("mean_chars"),
    )


@query(
    "c_pii_redact",
    oracle="""
    WITH t AS (SELECT doc_id,
                      text || ' contact ' || source || '_' ||
                      CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
                      CAST(1000 + doc_id % 9000 AS VARCHAR) AS body
               FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(body,
               '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\- ]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(body,
               '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails
    FROM t
    """,
)
def c_pii_redact(spark, sf_dir):
    """PII redaction (emails/phones → placeholder tokens) — standard
    training-data scrubbing. The fixture plants one deterministic email +
    phone per doc so recall is measurable; pure regexp_replace (codegen'd,
    identical pattern both engines)."""
    d = T(spark, sf_dir, "documents")
    body = F.concat(
        "text", F.lit(" contact "), "source", F.lit("_"),
        F.col("doc_id").cast("string"), F.lit("@example.com or +1-555-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
    )
    email_re = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    phone_re = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
    redacted = F.regexp_replace(
        F.regexp_replace(body, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(body, F.lit(email_re), 0)).cast("long").alias(
            "n_emails"
        ),
    )


@query(
    "c_pack_sequences",
    oracle="""
    WITH sized AS (
      SELECT doc_id, len(str_split(text, ' ')) AS n_toks,
             doc_id % 64 AS shard
      FROM documents),
    cum AS (
      SELECT doc_id, n_toks, shard,
             sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS toks_before
      FROM sized)
    SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
           CAST(shard AS BIGINT) AS shard,
           CAST(coalesce(toks_before, 0) // 2048 AS BIGINT) AS bin_id
    FROM cum
    """,
)
def c_pack_sequences(spark, sf_dir):
    """Sequence packing: assign docs to fixed-token-budget bins (2048) by
    cumulative token count, packed WITHIN a 64-way shard of doc_id — the
    pack-short-documents-into-context-windows step of a training pipeline.

    Scale note (VERDICT r2 #2): packing is per shard, so the cumulative-sum
    window is ``partitionBy(shard)`` — 64 independent partitions instead of
    one global total order.  A packed bin is identified by (shard, bin_id);
    at 100 TB raise the shard count to match executor parallelism.  The
    shard key ``doc_id % 64`` is deterministic and expressible identically
    in the DuckDB oracle, so the query stays hash-checkable."""
    from pyspark.sql.window import Window as W

    d = T(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        (F.col("doc_id") % 64).cast("long").alias("shard"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return sized.select(
        "doc_id",
        "n_toks",
        "shard",
        F.floor(F.coalesce(F.sum("n_toks").over(w), F.lit(0)) / 2048)
        .cast("long")
        .alias("bin_id"),
    )


@query(
    "c_repetition_stats",
    oracle="""
    WITH arrs AS (
      SELECT doc_id, str_split(text, ' ') AS arr FROM documents),
    words AS (
      SELECT doc_id, unnest(arr) AS w FROM arrs),
    per_word AS (
      SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
    wagg AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_distinct_words,
             CAST(max(c) AS BIGINT) AS top_w
      FROM per_word GROUP BY doc_id),
    bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(len(arr) - 1),
                                   i -> arr[i + 1] || ' ' || arr[i + 2]))
               AS bg
      FROM arrs),
    per_bg AS (
      SELECT doc_id, bg, count(*) AS c FROM bigrams GROUP BY doc_id, bg),
    bagg AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
             CAST(max(c) AS BIGINT) AS top_bg
      FROM per_bg GROUP BY doc_id)
    SELECT w.doc_id, n_words, n_distinct_words,
           CAST(n_words - n_distinct_words AS DOUBLE) / n_words
             AS dup_word_frac,
           CAST(top_w AS DOUBLE) / n_words AS top_word_frac,
           CAST(top_bg AS DOUBLE) / n_bg AS top_bigram_frac
    FROM wagg w JOIN bagg b ON w.doc_id = b.doc_id
    """,
)
def c_repetition_stats(spark, sf_dir):
    """Within-document repetition quality signals (Gopher/RefinedWeb-style
    boilerplate filters): duplicate-word / top-word / top-bigram fractions
    per doc (llm/text.py repetition_stats). Ratios are single IEEE double
    divisions of exact BIGINTs — bit-identical across engines."""
    from popelines_spark.llm.text import repetition_stats

    d = T(spark, sf_dir, "documents")
    return repetition_stats(d, id_col="doc_id", text_col="text")


@query(
    "c_mix_domains",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE ((doc_id % 1000003) * 2654435761) % 10000 <
          CASE lang WHEN 'en' THEN 10000.0 WHEN 'es' THEN 5000.0
                    WHEN 'de' THEN 2500.0 ELSE 1000.0 END
    """,
)
def c_mix_domains(spark, sf_dir):
    """Training-mixture sampling: per-language keep-rates (en 100%, es 50%,
    de 25%, rest 10%) decided by a multiplicative id-hash — deterministic,
    partition-independent, shuffle-free (llm/mix.py)."""
    from popelines_spark.llm.mix import sample_to_mixture

    docs = T(spark, sf_dir, "documents")
    return sample_to_mixture(
        docs, group_col="lang", id_col="doc_id",
        keep_rates={"en": 1.0, "es": 0.5, "de": 0.25}, default_rate=0.1,
    ).select("doc_id", "lang")
