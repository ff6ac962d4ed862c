"""Z-order (Morton) interleaving for multi-dimensional data layout.

At 100 TB, range queries over TWO correlated dimensions (e.g. time ×
tenant, custkey × orderkey) defeat single-column sort layouts: files sorted
by dim A give no min/max pruning on dim B. Interleaving the bits of both
dimensions into one Morton key and range-partitioning + sorting on it gives
every file a tight bounding BOX in (A, B) space, so parquet min/max stats
prune on either predicate — the standard Z-ORDER table-layout optimization.

Each dimension contributes its low 31 bits (values above 2^31-1 are masked
— interleaving 31+31 bits tops out at bit 62, keeping the BIGINT key
non-negative so signed ordering IS Morton ordering). For wider or heavily
skewed domains, rank-normalize first (ntile/dense_rank per dimension) —
the standard Z-order recipe — then interleave the ranks.

The bit-spread is the classic magic-mask doubling, expressed as plain
shift/AND/OR integer arithmetic: runs in whole-stage codegen, and the
identical expression is emitted as ANSI SQL for the DuckDB oracle
(``zorder_sql``) — one source of truth for both engines.

``layout_by_zorder`` is the write-path: repartitionByRange on the key (a
range shuffle driven by sampled split points) + sortWithinPartitions, the
exact recipe for producing the pruned layout at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) doubling schedule spreading 31 bits over 62 (64-bit masks,
#: sign bit never touched).
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

#: Per-dimension input mask: low 31 bits.
_DIM_MASK = 0x7FFFFFFF


def _spread31(c: Column) -> Column:
    """Spread the low 31 bits of ``c`` to the even bit positions of 62."""
    x = c.cast("long").bitwiseAND(F.lit(_DIM_MASK))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """Morton key interleaving the low 31 bits of ``a`` (even positions)
    and ``b`` (odd positions) into one non-negative BIGINT."""
    return _spread31(a).bitwiseOR(F.shiftleft(_spread31(b), 1)).cast("long")


def _sql_spread31(expr: str) -> str:
    # CAST to BIGINT mirrors the Spark twin's .cast('long'): DuckDB
    # overflow-checks << at the operand's width, so an INT32-typed parquet
    # column (physical types have drifted between rounds) would raise
    # "Overflow in left shift" for values >= 2^15 without the widening.
    x = f"(CAST({expr} AS BIGINT) & {_DIM_MASK})"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zorder_sql(a_expr: str, b_expr: str) -> str:
    """The identical Morton-key arithmetic as ANSI SQL (oracle mirror)."""
    return (
        f"CAST(({_sql_spread31(a_expr)} | ({_sql_spread31(b_expr)} << 1)) AS BIGINT)"
    )


def layout_by_zorder(
    df: DataFrame, a: str, b: str, n_files: int | None = None
) -> DataFrame:
    """Cluster ``df`` for write: range-partition + sort on the Morton key of
    (a, b). Each output partition (→ parquet file) then covers a compact
    rectangle of (a, b) space, giving min/max pruning on both columns.
    Columns wider than 31 bits (or heavily skewed) should be
    rank-normalized before calling (see module docstring)."""
    keyed = df.withColumn("__z", zorder_key(F.col(a), F.col(b)))
    parted = (
        keyed.repartitionByRange(n_files, "__z")
        if n_files
        else keyed.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
