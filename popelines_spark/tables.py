"""Testdata table loaders.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under an sf dir.

Scale note: ``load`` is a plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning; never cache or
collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Dimension tables small enough to broadcast at ANY scale factor (region=5,
#: nation=25 rows by construction — TPC-H fixed dims).
ALWAYS_BROADCAST = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (see session._RUNTIME_CONFS); convert
        # to microsecond timestamp with integer division — truncation matches
        # DuckDB's ns→us cast. `div` keeps it in 64-bit integer math.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _ntz_to_ltz(df)


def _ntz_to_ltz(df: DataFrame):
    """Cast any TIMESTAMP_NTZ column to session-tz TIMESTAMP.

    Defensive twin of session's ``parquet.inferTimestampNTZ.enabled=false``:
    if the driver's session was built before our conf applied (reader confs
    are captured per-read, but a cached relation keeps its schema), the
    loader still hands every consumer LTZ. Under the UTC session timezone
    the naive→instant cast is value-identical to what DuckDB reads, and
    watermarks / unix_micros / window ranges all require LTZ.
    """
    ntz = [n for n, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    from pyspark.sql import functions as F

    return df.withColumns({n: F.col(n).cast("timestamp") for n in ntz})


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for SQL-path queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
