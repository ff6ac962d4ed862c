"""Round-5 text/curation additions (second batch).

Two corpus-level novelty signals real LLM-data pipelines run between
exact dedup and MinHash (both are CCNet/RefinedWeb-family filters):

 - ``c_dedup_chunk``    — stride-10 word-chunk novelty: what fraction of
   a document's fixed-size chunks already appeared in an earlier doc
   (paragraph-level dedup for a corpus without paragraph breaks)
 - ``c_bigram_novelty`` — boilerplate signal: what fraction of a doc's
   distinct bigrams are corpus-common (appear in ≥ 3 documents)

Both are integer counting + one final IEEE division — nothing to drift
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "c_dedup_chunk",
    oracle="""
    WITH arrs AS (SELECT doc_id, str_split(text, ' ') AS arr
                  FROM documents),
    ch AS (SELECT doc_id,
                  unnest(list_transform(range(len(arr) // 10),
                         i -> array_to_string(arr[i*10+1 : i*10+10], ' ')))
                    AS chunk
           FROM arrs),
    fst AS (SELECT chunk, min(doc_id) AS fd FROM ch GROUP BY 1),
    per AS (SELECT c.doc_id, count(*) AS n_chunks,
                   sum(CASE WHEN f.fd < c.doc_id THEN 1 ELSE 0 END) AS dup
            FROM ch c JOIN fst f USING (chunk) GROUP BY 1)
    SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(dup AS DOUBLE) / n_chunks AS dup_chunk_frac
    FROM per
    """,
)
def c_dedup_chunk(spark, sf_dir):
    """Chunk-level novelty: split each doc into consecutive 10-word
    chunks (trailing partial chunk dropped), attribute each distinct
    chunk to its lowest doc_id, and report per doc the fraction of its
    chunks first seen elsewhere — the "paragraph dedup" filter, stride
    form (llm/dedup.py line-dedup family; refs RefinedWeb §3.3).

    Scale shape: chunks reduce to 8-byte xxhash64 keys before the
    first-owner shuffle (the oracle groups the strings themselves —
    identical answers modulo 2⁻⁶⁴ collisions, same caveat as
    c_dedup_exact), then one keyed agg + one equi-join back. Chunking is
    a shuffle-free higher-order-function projection — no Python."""
    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("arr"))
        .filter(F.size("arr") >= 10)  # oracle: range(0) drops them too
    )
    n_chunks = F.floor(F.size("arr") / 10).cast("long")
    ch = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.xxhash64(
                    F.array_join(F.slice("arr", i * 10 + 1, 10), " ")
                ),
            )
        ).alias("h"),
    )
    fst = ch.groupBy("h").agg(F.min("doc_id").alias("fd"))
    return (
        ch.join(fst, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("fd") < F.col("doc_id")).cast("long")).alias("_d"),
        )
        .select(
            "doc_id",
            "n_chunks",
            (F.col("_d").cast("double") / F.col("n_chunks")).alias(
                "dup_chunk_frac"
            ),
        )
    )


@query(
    "c_bigram_novelty",
    oracle="""
    WITH arrs AS (SELECT doc_id, str_split(text, ' ') AS arr
                  FROM documents WHERE len(str_split(text, ' ')) >= 2),
    bg AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(len(arr) - 1),
                         i -> arr[i+1] || ' ' || arr[i+2])) AS b
           FROM arrs),
    df AS (SELECT b, count(*) AS n_docs FROM bg GROUP BY 1)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bg,
           CAST(sum(CASE WHEN n_docs >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS common_frac
    FROM bg JOIN df USING (b)
    GROUP BY doc_id
    """,
)
def c_bigram_novelty(spark, sf_dir):
    """Boilerplate-bigram fraction: share of each doc's DISTINCT bigrams
    that occur in ≥ 3 documents corpus-wide. High values mark templated
    or scraped-navigation text (the cheap complement of c_containment's
    shingle containment).

    Scale shape: bigrams shingle via a higher-order projection (no
    Python), reduce to xxhash64 keys, distinct per (doc, bigram), one
    keyed doc-frequency agg, one equi-join back. Same 2⁻⁶⁴ hash-collision
    caveat as c_dedup_chunk; the oracle carries the strings."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    ).filter(F.size("arr") >= 2)
    bg = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("arr") - 2),
                lambda i: F.xxhash64(
                    F.concat(
                        F.element_at("arr", i + 1),
                        F.lit(" "),
                        F.element_at("arr", i + 2),
                    )
                ),
            )
        ).alias("b"),
    ).distinct()
    df = bg.groupBy("b").agg(F.count("*").alias("n_docs"))
    return (
        bg.join(df, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bg"),
            F.sum((F.col("n_docs") >= 3).cast("long")).alias("_c"),
        )
        .select(
            "doc_id",
            "n_bg",
            (F.col("_c").cast("double") / F.col("n_bg")).alias("common_frac"),
        )
    )


@query(
    "c_bigram_xent",
    oracle="""
    WITH arrs AS (SELECT doc_id, str_split(text, ' ') AS arr
                  FROM documents WHERE len(str_split(text, ' ')) >= 2),
    bgr AS (SELECT doc_id,
                   unnest(list_transform(range(len(arr) - 1),
                          i -> arr[i+1])) AS w1,
                   unnest(list_transform(range(len(arr) - 1),
                          i -> arr[i+2])) AS w2
            FROM arrs),
    bf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS bf
           FROM bgr GROUP BY 1, 2, 3),
    bgc AS (SELECT w1, w2, CAST(sum(bf) AS BIGINT) AS cbg
            FROM bf GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(sum(cbg) AS BIGINT) AS cw1 FROM bgc GROUP BY 1),
    per AS (SELECT doc_id, w1, w2, bf, bf * ln(cbg / cw1) AS c
            FROM bf JOIN bgc USING (w1, w2) JOIN ctx USING (w1))
    SELECT doc_id, CAST(sum(bf) AS BIGINT) AS n_bg,
           round(-list_sum(list(c ORDER BY w1, w2)) / sum(bf), 6) AS xent
    FROM per GROUP BY doc_id
    """,
)
def c_bigram_xent(spark, sf_dir):
    """Per-doc cross-entropy under the corpus bigram LM — the sequence-
    probability quality signal one rung above c_unigram_xent (word salad
    scores high even when every word is common). llm/rank.py:bigram_xent
    carries the exactness (ordered fold) and shuffle notes."""
    from popelines_spark.llm.rank import bigram_xent

    return bigram_xent(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "c_vocab_coverage",
    oracle="""
    WITH words AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w
                   FROM documents),
    cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY 1),
    vocab AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT 100)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS oov_frac
    FROM words LEFT JOIN vocab v USING (w)
    GROUP BY doc_id
    """,
)
def c_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage: build the top-100 corpus vocabulary
    (count-desc, term tie-break — total order) and report each doc's
    out-of-vocabulary token fraction, the coverage check run before
    freezing a tokenizer vocab.

    Plan: term counts are one keyed agg (Zipf head absorbed map-side);
    top-100 is orderBy+limit → TakeOrderedAndProject (per-partition
    heads, no global sort); the tiny vocab broadcasts into a left join
    over the token stream — per-doc aggregation is the only other
    shuffle. Integer counts + one final division."""
    d = T(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    cnt = words.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    vocab = cnt.orderBy(F.col("c").desc(), "w").limit(100).select(
        "w", F.lit(True).alias("_in")
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.sum(F.col("_in").isNull().cast("long")).alias("_oov"),
        )
        .select(
            "doc_id",
            "n_toks",
            (F.col("_oov").cast("double") / F.col("n_toks")).alias(
                "oov_frac"
            ),
        )
    )
