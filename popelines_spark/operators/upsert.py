"""Upsert (MERGE INTO emulation) — source-wins merge by key.

The reference's load path offers only append/truncate
(popelines/main.py:135-139); the delegated SQL surface (BigQuery MERGE)
includes keyed upsert. Without a transactional table format in this
container (Delta/Iceberg jars absent — stubbed per SURVEY §7), the
engine emulates MERGE as: full-outer join on the key, source wins per
column, then an atomic overwrite of the target.

Scale: one keyed shuffle (the full-outer join). With the target bucketed
by the merge key the join co-locates shuffle-free; with Delta/Iceberg this
function's callers switch to native MERGE and keep the same signature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from popelines_spark.operators.keyed import keep_first


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    dedup_source_order: list[str | Column] | None = None,
) -> DataFrame:
    """Rows matched on ``keys`` take the source's values; unmatched rows
    from both sides survive (insert-new + keep-old). Column set = union of
    both schemas (missing side → NULL).

    Duplicate SOURCE keys would fan the full-outer join out and silently
    multiply target rows (ADVICE r1), where BigQuery/Delta MERGE raises.
    Matching that: by default the plan raises at execution time when a
    source key occurs twice; pass ``dedup_source_order`` to instead keep
    the first source row per key under that order (operators/keyed,
    deterministic iff the order is total). The guard's count-window
    partitions on the same keys the join shuffles on, so it adds a sort
    within the existing exchange, not an extra shuffle."""
    if dedup_source_order is not None:
        source = keep_first(source, keys, dedup_source_order)
        marker = F.lit(True)
    else:
        # raise_error is woven into the presence marker (a column the join
        # output actually reads) so Catalyst cannot prune it away; it fires
        # lazily, at execution, only when a duplicate exists.
        marker = F.when(
            F.count("*").over(W.partitionBy(*keys)) > 1,
            F.raise_error(
                F.concat_ws(
                    "",
                    F.lit("upsert: duplicate source rows for key ["),
                    F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
                    F.lit(
                        "]; MERGE requires unique source keys — pass "
                        "dedup_source_order to keep-first instead"
                    ),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    # Qualified string refs ("t.x"/"s.x") rather than DataFrame attribute
    # refs: target and source often share lineage (updates derived from the
    # target), and attribute refs trip the ambiguous-self-join check.
    t = target.alias("__upsert_t")
    # Presence marker distinguishes "source row absent" from "source value
    # NULL" — a matched source NULL must win (true MERGE semantics), so a
    # bare coalesce(s.col, t.col) would be wrong.
    s = source.withColumn("__s_present", marker).alias("__upsert_s")
    tc = lambda n: F.col(f"__upsert_t.{n}")  # noqa: E731
    sc = lambda n: F.col(f"__upsert_s.{n}")  # noqa: E731
    cond = None
    for k in keys:
        c = tc(k).eqNullSafe(sc(k))
        cond = c if cond is None else cond & c
    joined = t.join(s, cond, "full")
    present = sc("__s_present").isNotNull()
    cols = []
    t_cols = set(target.columns)
    s_cols = set(source.columns)
    for name in list(dict.fromkeys(target.columns + source.columns)):
        if name in keys:
            cols.append(F.coalesce(sc(name), tc(name)).alias(name))
        elif name in t_cols and name in s_cols:
            cols.append(F.when(present, sc(name)).otherwise(tc(name)).alias(name))
        elif name in s_cols:
            cols.append(sc(name).alias(name))
        else:
            cols.append(tc(name).alias(name))
    return joined.select(*cols)
