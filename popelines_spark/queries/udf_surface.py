"""SURVEY.md §2 B.10 — the UDF/UDAF/UDTF surface.

Reference basis: per-value callback contract of fix_json_values
(popelines/main.py:264-286 — callback(value, key, **kwargs)), per-key rename
callback of fix_json_keys (popelines/main.py:245-262), grouped ETL shape
(popelines/main.py:208-223), list-expansion + UNNEST emission
(popelines/copy_table.py:63-65).

All Python rides the Arrow path (pandas_udf / applyInPandas / mapInPandas) —
vectorized batches, never row-at-a-time pickling. At 100 TB these stay
partition-parallel; the grouped-map shuffles once on the group key.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as sqlt

from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "u_scalar_udf",
    oracle="""
    SELECT event_id, value * 2.0 + 1.0 AS boosted
    FROM events WHERE event_type = 'purchase'
    """,
)
def u_scalar_udf(spark, sf_dir):
    """fix_json_values-style per-value callback as a vectorized pandas_udf
    (Arrow batches; ~10-100x over row-at-a-time)."""

    @F.pandas_udf(sqlt.DoubleType())
    def boost(s: pd.Series) -> pd.Series:
        return s * 2.0 + 1.0

    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.select("event_id", boost("value").alias("boosted"))


@query(
    "u_key_udf",
    oracle="""
    SELECT n_nationkey AS nationkey, n_name AS name, n_regionkey AS regionkey
    FROM nation
    """,
)
def u_key_udf(spark, sf_dir):
    """fix_json_keys-style per-key rename: a pure driver-side schema
    transform — NO executor UDF runs (rename is metadata)."""
    from popelines_spark.nested import rename_fields

    return rename_fields(
        T(spark, sf_dir, "nation"), lambda k: k.removeprefix("n_")
    )


@query(
    "u_grouped_map",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(row_number() OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_rank
    FROM customer
    """,
)
def u_grouped_map(spark, sf_dir):
    """Arbitrary per-group pandas transform (applyInPandas): rank customers
    by balance within nation. Deterministic tie-break on custkey."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["bal_rank"] = pdf.index + 1
        return pdf[["c_custkey", "c_nationkey", "bal_rank"]]

    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .applyInPandas(
            rank_group, schema="c_custkey long, c_nationkey int, bal_rank long"
        )
    )


@query(
    "u_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents
               WHERE doc_id <= 40)
    SELECT doc_id, u.bigram
    FROM t, UNNEST([ws[i] || ' ' || ws[i+1]
                    FOR i IN generate_series(1, len(ws) - 1)]) AS u(bigram)
    """,
)
def u_udtf(spark, sf_dir):
    """One-row→many-rows expansion (UDTF shape): a pandas_udf builds the
    bigram array, explode produces the rows (copy_table.py:63-65 list
    handling → UNNEST)."""

    @F.pandas_udf(sqlt.ArrayType(sqlt.StringType()))
    def bigrams(texts: pd.Series) -> pd.Series:
        def make(t: str) -> list[str]:
            ws = t.split(" ")
            return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

        return texts.map(make)

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") <= 40)
    return d.select("doc_id", F.explode(bigrams("text")).alias("bigram"))


@query(
    "u_grouped_agg",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer)
    SELECT c_mktsegment,
           (max(CASE WHEN rn = (n + 1) // 2 THEN c_acctbal END)
            + max(CASE WHEN rn = n // 2 + 1 THEN c_acctbal END)) / 2
             AS med_bal
    FROM ranked GROUP BY c_mktsegment
    """,
)
def u_grouped_agg(spark, sf_dir):
    """Grouped-AGGREGATE pandas UDF (one Arrow batch per group -> one
    scalar): the fourth Python-surface shape next to scalar / grouped-map /
    UDTF. Median: numpy computes (lo + hi) / 2 at the middle order stats,
    and the oracle spells the SAME expression over row_number order
    statistics — bit-identical, unlike QUANTILE_CONT's lo + (hi-lo)*0.5
    interpolation."""
    import numpy as np

    @F.pandas_udf("double")
    def np_median(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(np_median("c_acctbal").alias("med_bal"))
    )
