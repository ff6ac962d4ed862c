"""Leakage-safe train/val/test splitting for LLM corpora.

The split must be decided at the GROUP level (domain, source, site): if two
near-identical documents from one site land in different splits, eval
leaks training data. So the unit of assignment is the group, and every row
inherits its group's split.

Determinism contract (same as llm/mix.py): the decision derives from a
multiplicative hash of a per-group integer anchor — no RNG, no state,
identical on re-runs/retries, and mirrorable in plain SQL for the oracle.
The anchor is min(id) within the group: stable under appends of new rows
with larger ids (a growing domain keeps its split), unlike hashing the
row id (row-level leakage) or count-based anchors (reshuffle on append).

Scale: one keyed groupBy over (group, id) pairs — the only shuffle — then
a keyed join back; group cardinality ≪ row count, so the join's build
side is small (AQE broadcasts it when it fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from popelines_spark.llm.mix import _FOLD, _KNUTH

#: Mersenne prime 2^31-1: the non-linear intermediate reduction that
#: decorrelates the split hash from the mixture hash (see assign_split).
_SPLIT_PRIME = 2147483647

#: xxhash prime2 — the second-round multiplier; odd and coprime to 10000.
_KNUTH2 = 2246822519


def assign_split(
    df: DataFrame,
    group_col: str,
    id_col: str,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """df + ``split`` column, constant within each ``group_col`` value.

    ``fractions`` maps split names to fractions summing to ≤ 1 (ordered:
    first name takes the lowest hash range); default 80/10/10
    train/val/test. Groups hash into [0, 10000) via the bounded Knuth
    multiply (fold by 1000003 first — BIGINT-overflow-safe, ADVICE r2)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    from popelines_spark.llm.mix import _require_integral_id

    _require_integral_id(df, id_col, "assign_split")
    anchors = df.groupBy(group_col).agg(F.min(id_col).alias("__anchor"))
    # SECOND hash round through a different prime modulus: the split
    # decision must be INDEPENDENT of sample_to_mixture's keep decision.
    # One shared affine hash mod 10000 made them perfectly correlated —
    # every surviving singleton group landed in 'train', starving val/
    # test (review r12) — and any same-modulus affine variant stays
    # fully determined by the mix bucket, so independence needs the
    # non-linear mod-2^31-1 reduction between the two multiplies. Still
    # plain-SQL mirrorable; max operand ≈ 2.1e9 * 2.2e9 ≈ 4.8e18 < 2^63.
    bucket = F.pmod(
        F.pmod(
            F.pmod(F.col("__anchor").cast("long"), F.lit(_FOLD))
            * F.lit(_KNUTH),
            F.lit(_SPLIT_PRIME),
        )
        * F.lit(_KNUTH2),
        F.lit(10000),
    )
    split = None
    hi = 0.0
    for name, frac in fractions.items():
        hi += frac
        cond = bucket < F.lit(int(round(hi * 10000)))
        split = (
            F.when(cond, F.lit(name))
            if split is None
            else split.when(cond, F.lit(name))
        )
    split = split.otherwise(F.lit("holdout"))
    # null-safe join back: rows whose group is NULL form a real group
    # (groupBy keeps them) but a plain equi-join drops them — silent
    # data loss in a function whose contract is TOTAL assignment
    # (review r12)
    tagged = anchors.select(
        F.col(group_col).alias("__g"), split.alias("split")
    )
    return df.join(
        tagged, F.col(group_col).eqNullSafe(F.col("__g"))
    ).drop("__g")
