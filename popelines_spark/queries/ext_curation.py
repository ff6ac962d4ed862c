"""Corpus-curation operators beyond SURVEY §2 Part C: leakage-safe
splitting, corpus-level n-gram statistics, markup stripping, incremental
ingestion dedup. Each is a standard step of a web-scale training-data
pipeline, expressed as declarative DataFrame plans with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "c_split_holdout",
    oracle="""
    WITH anchors AS (
      SELECT source, min(doc_id) AS a FROM documents GROUP BY source),
    tagged AS (
      SELECT source,
             CASE WHEN (a % 1000003) * 2654435761 % 2147483647
                         * 2246822519 % 10000 < 8000
                    THEN 'train'
                  WHEN (a % 1000003) * 2654435761 % 2147483647
                         * 2246822519 % 10000 < 9000
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM anchors)
    SELECT d.doc_id, d.source, t.split
    FROM documents d JOIN tagged t
      ON d.source IS NOT DISTINCT FROM t.source
    """,
)
def c_split_holdout(spark, sf_dir):
    """Leakage-safe 80/10/10 split: assignment is per SOURCE (all docs of
    one domain share a split — near-dups within a site can never straddle
    train/eval), decided by the bounded Knuth hash of the group's min
    doc_id (llm/split.py). Deterministic, append-stable, shuffle-light:
    one keyed groupBy + one keyed join back."""
    from popelines_spark.llm.split import assign_split

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_split(docs, group_col="source", id_col="doc_id").select(
        "doc_id", "source", "split"
    )


@query(
    "c_ngram_topk",
    oracle="""
    WITH bg AS (
      SELECT lang, unnest([ws[i] || ' ' || ws[i+1]
                           FOR i IN generate_series(1, len(ws) - 1)]) AS bigram
      FROM (SELECT lang, str_split(text, ' ') AS ws FROM documents)),
    cnt AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
            FROM bg GROUP BY lang, bigram)
    SELECT lang, bigram, n, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY n DESC, bigram) AS rn
          FROM cnt)
    WHERE rn <= 5
    """,
)
def c_ngram_topk(spark, sf_dir):
    """Corpus-level top-5 bigrams per language — the global n-gram
    frequency pass behind vocabulary construction and boilerplate
    detection. Explode + one keyed count (map-side combined); the top-k
    window runs on the per-(lang,bigram) rollup, orders of magnitude
    smaller than the corpus, partitioned by lang."""
    from popelines_spark.llm.text import shingles

    docs = T(spark, sf_dir, "documents")
    bg = docs.select(
        "lang", F.explode(shingles(F.col("text"), 2)).alias("bigram")
    )
    cnt = bg.groupBy("lang", "bigram").agg(
        F.count("*").cast("long").alias("n")
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "bigram")
    return (
        cnt.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("lang", "bigram", "n", "rank")
    )


@query(
    "c_html_strip",
    oracle="""
    WITH wrapped AS (
      SELECT doc_id,
             '<html><body data-doc="' || CAST(doc_id AS VARCHAR)
               || '"><p>' || replace(text, ' ', '</p> <p>')
               || '</p> &amp; <br/>trailer&lt;end&gt;</body></html>' AS body
      FROM documents)
    SELECT doc_id,
           replace(replace(replace(
               regexp_replace(body, '<[^>]*>', '', 'g'),
               '&amp;', '&'), '&lt;', '<'), '&gt;', '>') AS clean
    FROM wrapped
    """,
)
def c_html_strip(spark, sf_dir):
    """Markup stripping: the corpus has no raw HTML, so each doc is first
    WRAPPED in deterministic markup (tags around every token + entities),
    then cleaned by the strip chain — tag removal via one regexp pass,
    entity decode via literal replaces. The wrap is the fixture; the
    strip chain is the operator (pure JVM string expressions, no UDF).
    Round-trip property: clean == text + the decoded trailer."""
    docs = T(spark, sf_dir, "documents")
    body = F.concat(
        F.lit('<html><body data-doc="'),
        F.col("doc_id").cast("string"),
        F.lit('"><p>'),
        F.regexp_replace("text", " ", "</p> <p>"),
        F.lit("</p> &amp; <br/>trailer&lt;end&gt;</body></html>"),
    )
    clean = F.regexp_replace(body, "<[^>]*>", "")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">")):
        clean = F.replace(clean, F.lit(ent), F.lit(ch))
    return docs.select("doc_id", clean.alias("clean"))


@query(
    "c_dedup_incremental",
    oracle="""
    WITH batch AS (
      SELECT doc_id + 300000 AS doc_id, text FROM documents
      WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 400000 AS doc_id, text || ' fresh content'
      FROM documents WHERE doc_id % 3 = 1)
    SELECT b.doc_id FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = b.text)
    """,
)
def c_dedup_incremental(spark, sf_dir):
    """Incremental-ingest dedup: a new batch (exact copies of every 3rd
    doc + genuinely new docs) is deduplicated AGAINST the existing corpus
    — the daily-crawl shape, distinct from within-corpus c_dedup_exact.
    One left-anti join on content; at 100 TB both sides join on
    xxhash64(text) instead of raw text (24-byte shuffle rows) with an
    equality re-check — the raw-text join here keeps the oracle trivially
    mirrorable."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    fresh = docs.filter(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat("text", F.lit(" fresh content")).alias("text"),
    )
    batch = copies.unionByName(fresh)
    return batch.join(docs.select("text"), "text", "left_anti").select(
        "doc_id"
    )


@query(
    "c_fuzzy_match",
    oracle="""
    SELECT a.s_name AS name_a, b.s_name AS name_b
    FROM supplier a JOIN supplier b
      ON a.s_name < b.s_name
     AND levenshtein(a.s_name, b.s_name) = 1
    """,
)
def c_fuzzy_match(spark, sf_dir):
    """Entity resolution by edit distance, with SymSpell-style
    masked-position blocking: every name emits one key per masked digit
    position, and an equi-join on (position, masked key) finds EXACTLY
    the pairs at levenshtein distance 1 (equal length + equal everywhere
    but the masked slot ⇒ one substitution) — complete by construction,
    no pairwise n² comparison anywhere. The oracle brute-forces the same
    pair set with DuckDB's levenshtein, so the hash match proves the
    blocking loses nothing. At 100 TB each side generates k keys and the
    join stays keyed — the standard trick for fuzzy key matching at
    scale; wider distances use k-choose-d mask combinations."""
    names = T(spark, sf_dir, "supplier").select("s_name")
    # Mask EVERY position (1..len): complete for one-substitution pairs of
    # any name shape. (Round 4 masked the fixed digit tail 10..18 of
    # 'Supplier#000000000'; the sf1.0 replication sweep prefixed names and
    # silently moved the digits out of that range — a hardcoded-layout trap.
    # ~2.4x more keys than digit-only masking; the join stays keyed.)
    masked = names.select(
        "s_name",
        F.explode(F.sequence(F.lit(1), F.length("s_name"))).alias("pos"),
    ).select(
        "s_name",
        "pos",
        F.concat(
            F.expr("substring(s_name, 1, pos - 1)"),
            F.lit("#"),
            F.expr("substring(s_name, pos + 1, 999)"),
        ).alias("key"),
    )
    a = masked.select(F.col("s_name").alias("name_a"), "pos", "key")
    b = masked.select(F.col("s_name").alias("name_b"), "pos", "key")
    pairs = (
        a.join(b, ["pos", "key"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    # levenshtein re-check: a no-op by construction (asserted cheaply so a
    # blocking regression fails loudly rather than emitting bad pairs)
    return pairs.filter(
        F.levenshtein("name_a", "name_b") == 1
    ).select("name_a", "name_b")
