"""popelines_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``popelines`` BigQuery ETL library
(reference: InfusionsoftAnalytics/popelines v0.1.22), re-grounded on
Spark SQL / DataFrame / Structured Streaming.

Design stance (SURVEY.md §7): declarative DataFrame plans everywhere, Catalyst
does the optimizing; Pandas UDFs only where built-ins can't express the
semantics; every operator is partition-parallel and designed for the 100 TB
scale point (no driver-side collect inside operators).
"""

from popelines_spark.session import get_spark, tune_for_oracle
from popelines_spark.pipeline import Popeline

__all__ = ["get_spark", "tune_for_oracle", "Popeline"]
__version__ = "0.1.0"
