"""Shared helpers for registered queries.

Cross-engine float determinism (SURVEY.md §5 rule 1, refined):
 - Per-row double arithmetic is IEEE-deterministic → no rounding needed.
 - Multi-row double accumulation (sum/avg/windowed sum) is order-dependent →
   accumulate EXACTLY in decimal, then cast the exact result to double.
   Both engines then emit bit-identical doubles.
 - Counts / integer sums: always BIGINT on both sides (DuckDB widens integer
   SUM to HUGEINT; oracles cast back).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from popelines_spark.session import tune_for_oracle
from popelines_spark.tables import load

#: Exact accumulator type for money/quantity doubles (≤4 decimal digits in
#: the testdata; 20 digits ≫ any sf0.1 sum magnitude).
DEC = "decimal(20,4)"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_for_oracle(spark)
    return load(spark, sf_dir, name)


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: str | Column) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    return F.sum(_col(c).cast(DEC)).cast("double")


def davg(c: str | Column) -> Column:
    """avg as exact-sum / count — bit-identical across engines."""
    return (F.sum(_col(c).cast(DEC)).cast("double") / F.count(_col(c))).cast(
        "double"
    )


#: DuckDB-side equivalents (same names, same math).
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(20,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(20,4))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
