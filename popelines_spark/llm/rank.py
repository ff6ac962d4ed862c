"""Lexical ranking / keyword extraction: TF-IDF and BM25 over `documents`.

Training-data curation uses these as quality and topicality signals
(keyword extraction per doc, corpus-level relevance scoring for targeted
subsetting) — the lexical complement of embedding similarity
(llm/similarity.py).

Scale shapes:
 - Document frequencies are a corpus-wide term aggregate (one shuffle on
   term) — at 100 TB the term dictionary after aggregation is tiny relative
   to the corpus and the hot (Zipf-head) terms are absorbed by map-side
   partial aggregation, the same skew argument as c_token_freq.
 - Corpus constants (N, avgdl) are one-row aggregates crossed in — scalar
   broadcast, not collected to Python.
 - Per-(doc, term) scoring is then a single keyed join of the tf frame
   against the df dictionary; BM25's query-side variant semi-joins the
   dictionary down to |query terms| first, so the scoring join is
   broadcast-sized.

Cross-engine determinism: tf/df/N/avgdl are exact integers; each score is
ONE per-row float expression (a handful of IEEE ops + one ln), emitted
rounded to 6dp with the term as a sort tie-break, so rank order and hashes
match DuckDB (see queries/ext_analytics.py oracles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.plans.inspect import checkpoint


def _term_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term) → tf, from whitespace tokenization (llm/text.py rules)."""
    return (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def tfidf_topk(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    score = tf · ln((N + 1) / (df + 1)); ties broken lexicographically on
    the term so top-k is total-ordered. Score emitted rounded to 6dp — the
    SAME rounded value is the ranking key, so cross-engine rank flips can
    only happen inside an exact tie, where the term tie-break pins them.
    """
    # tf feeds both the df aggregate and the scoring join — barrier it so
    # the explode+agg over the raw corpus runs once (no cross-branch CSE).
    tf = checkpoint(_term_freqs(docs, id_col, text_col), "rank-term-freqs", eager=False)
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.agg(F.count("*").cast("long").alias("__n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("__n") + 1) / (F.col("df") + 1)), 6
            ).alias("score"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, "term", "tf", "score", F.col("__rn").cast("long").alias("rank"))
    )


def unigram_xent(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document cross-entropy under the corpus unigram LM:
    H(doc) = -(1/n_doc) · Σ_tokens ln p(w),  p(w) = count(w) / total_tokens.

    The classic cheap LM quality signal for corpus curation: low H = the
    doc is made of globally common tokens (boilerplate-ish), high H = rare
    vocabulary; both tails are filter candidates. (KenLM-style n-gram
    models slot into the same shape — the unigram dictionary join below
    becomes an n-gram table join.)

    Exactness: p(w) is an exact rational (two BIGINTs); per-(doc,term)
    contribution tf·ln(p) is one ln; contributions are summed in term
    order via the sort_array+fold trick so the float sum is bit-stable
    cross-engine; output rounded to 6dp.

    Scale: the unigram dictionary is a corpus-wide term agg (map-side
    combine absorbs the Zipf head); the scoring pass is one keyed join of
    the (doc, term, tf) frame against it — same shuffle profile as TF-IDF.
    """
    tf = checkpoint(_term_freqs(docs, id_col, text_col), "rank-term-freqs", eager=False)
    vocab = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("__t"))
    per_term = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.struct(
                F.col("term"),
                (F.col("tf") * F.log(F.col("cnt") / F.col("__t"))).alias("c"),
            ).alias("__tc"),
            F.col("tf"),
        )
    )
    return (
        per_term.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("__tc")).alias("__tcs"),
            F.sum("tf").cast("long").alias("n_toks"),
        )
        .select(
            F.col(id_col),
            "n_toks",
            F.round(
                -F.aggregate("__tcs", F.lit(0.0), lambda a, x: a + x["c"])
                / F.col("n_toks"),
                6,
            ).alias("xent"),
        )
    )


def bigram_xent(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document cross-entropy under the corpus BIGRAM LM:
    H(doc) = -(1/n_bg) · Σ_bigrams bf · ln p(w2|w1),
    p(w2|w1) = c(w1 w2) / c(w1 ·) — the maximum-likelihood conditional
    (no smoothing needed for scoring members of the training corpus:
    every doc bigram contributes to its own counts, so p > 0).

    The step up from unigram_xent on the quality-signal ladder: unigram
    H flags rare VOCABULARY, bigram H flags improbable SEQUENCES (word
    salad scores high even when every word is common; templated text
    scores near zero). KenLM-style higher orders slot into the same
    dictionary-join shape.

    Exactness: p is an exact rational (two BIGINTs), one ln per distinct
    (doc, bigram), contributions summed in (w1, w2) order via the
    sort_array+fold trick — bit-stable cross-engine; 6dp output.

    Scale: two corpus aggs (bigram counts; context counts = their
    groupBy(w1) rollup) + two keyed joins of the (doc, w1, w2, bf)
    frame. Same shuffle profile as unigram_xent with a wider key; the
    Zipf head is absorbed map-side. The per-doc fold state is the doc's
    distinct-bigram list — bounded by doc length, never corpus-sized.
    """
    pairs = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__arr")
    ).filter(F.size("__arr") >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__arr") - 2),
                lambda i: F.struct(
                    F.element_at("__arr", i + 1).alias("w1"),
                    F.element_at("__arr", i + 2).alias("w2"),
                ),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    bf = checkpoint(
        pairs.groupBy(id_col, "w1", "w2").agg(
            F.count("*").cast("long").alias("bf")
        ),
        "rank-bigram-freqs",
        eager=False,
    )
    bgc = bf.groupBy("w1", "w2").agg(F.sum("bf").cast("long").alias("cbg"))
    ctx = bgc.groupBy("w1").agg(F.sum("cbg").cast("long").alias("cw1"))
    per = (
        bf.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .select(
            F.col(id_col),
            F.struct(
                "w1",
                "w2",
                (F.col("bf") * F.log(F.col("cbg") / F.col("cw1"))).alias("c"),
            ).alias("__bc"),
            "bf",
        )
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("__bc")).alias("__bcs"),
            F.sum("bf").cast("long").alias("n_bg"),
        )
        .select(
            F.col(id_col),
            "n_bg",
            F.round(
                -F.aggregate("__bcs", F.lit(0.0), lambda a, x: a + x["c"])
                / F.col("n_bg"),
                6,
            ).alias("xent"),
        )
    )


def bm25(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms.

    Classic Robertson/Sparck-Jones BM25 with the non-negative idf variant
    ln(1 + (N - df + 0.5)/(df + 0.5)). dl/avgdl from exact token counts.
    Per-term contributions are summed with a fixed (term-order) summation:
    sort_array on (term, contribution) structs + HOF aggregate, so the
    floating-point sum order is engine-independent (SURVEY.md §5 rule 1 —
    same trick as array_join determinism, applied to doubles).

    Only documents containing ≥1 query term appear (score > 0 set); the
    query-term filter lands on the tf frame BEFORE the df join, so the
    scoring join carries |docs_with_hits| · |query_terms| rows at most.
    """
    tf = checkpoint(
        _term_freqs(docs, id_col, text_col).filter(
            F.col("term").isin(*query_terms)
        ),
        "bm25-term-freqs",  # feeds df agg + scoring join
        eager=False,
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    stats = checkpoint(
        docs.select(
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("__dl"),
            F.col(id_col),
        ),
        "bm25-doc-stats",  # feeds the consts agg + per-doc join
        eager=False,
    )
    consts = stats.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__dl").cast("double").alias("__dlsum"),
    )
    idf = F.log(
        1
        + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("__dlsum") / F.col("__n")
    contrib = idf * (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("__dl") / avgdl))
    )
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(stats, id_col)
        .crossJoin(F.broadcast(consts))
        .select(F.col(id_col), F.struct(F.col("term"), contrib.alias("c")).alias("__tc"))
    )
    # Fixed-order float sum: collect the per-term structs, sort by term,
    # then fold — both engines add in identical order.
    return (
        per_term.groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__tc")).alias("__tcs"))
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(
                    "__tcs",
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ),
                6,
            ).alias("bm25"),
        )
    )
