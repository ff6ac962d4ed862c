"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementation lives in ``popelines_spark``; this module is the
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from popelines_spark import registry  # noqa: E402
from popelines_spark.session import tune_for_oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-way star join + group agg.

    Revenue by market segment and order priority over
    lineitem ⋈ orders ⋈ customer — proves scan → broadcast/SMJ join →
    partial+final hash agg → sort end to end (SURVEY.md §7 step 1).
    """
    registry.load_all()
    tune_for_oracle(spark)
    return registry.SPARK_QUERIES["flagship_star_revenue"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return dict(registry.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checked query."""
    registry.load_all()
    return dict(registry.ORACLE_SQL)
