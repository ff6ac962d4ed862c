"""Column-expression form of the BigQuery identifier sanitizer.

The driver-side string version lives in schemas.sanitize_identifier
(popelines/main.py:184-191). This is the same 3-rule chain as a Spark Column
expression (JVM-side, codegen'd — no UDF), so identifier-style cleaning can
run over data columns at scale:

 1. prefix ``_`` when the first character is a digit;
 2. ``.`` and space → ``_``;
 3. strip every other ``[^a-zA-Z0-9_]`` character.

SQL-checkable: ``SANITIZE_SQL`` is the identical chain in ANSI/DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_col(c: Column) -> Column:
    prefixed = F.when(
        F.substring(c, 1, 1).rlike("^[0-9]$"), F.concat(F.lit("_"), c)
    ).otherwise(c)
    underscored = F.regexp_replace(prefixed, r"[. ]", "_")
    return F.regexp_replace(underscored, r"[^a-zA-Z0-9_]", "")


def sanitize_sql(expr: str) -> str:
    """The same chain in DuckDB SQL (oracle mirror)."""
    return (
        "regexp_replace(regexp_replace("
        f"CASE WHEN substring({expr}, 1, 1) BETWEEN '0' AND '9' "
        f"THEN '_' || {expr} ELSE {expr} END, "
        "'[. ]', '_', 'g'), '[^a-zA-Z0-9_]', '', 'g')"
    )
