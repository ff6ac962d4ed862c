"""Domain-mixture sampling for LLM training corpora.

Training mixes are specified as per-domain keep-rates ("keep 100% of en,
25% of de, ..."); the sampler must be deterministic (re-runs and retries
keep the SAME rows), partition-independent, and shuffle-free. Both follow
from deciding membership per row from a multiplicative hash of the id —
no RNG, no state, mirrorable in plain SQL for the oracle.

Scale: a narrow map over the corpus — no shuffle, no driver data. At
100 TB this runs at scan speed and composes with any downstream op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative constant — fixed salt, same literal in oracle SQL.
_KNUTH = 2654435761

#: Prime fold modulus applied to the id before the multiply so the product
#: never exceeds BIGINT (~1e6 * ~2.65e9 ≈ 2.7e15); prime to avoid aliasing
#: with strided id spaces.
_FOLD = 1000003


def _require_integral_id(df: DataFrame, id_col: str, fn: str) -> None:
    """The bucket hash needs an integral id: a non-numeric id column
    cast('long') yields NULL under non-ANSI Spark, the bucket goes NULL,
    and the filter silently drops EVERY row (review r12) — fail at plan
    time instead."""
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    if not isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"{fn}: id column {id_col!r} is {dt.simpleString()}, not an "
            "integral type — the deterministic bucket hash would cast it "
            "to NULL and silently keep zero rows; derive a surrogate "
            "(e.g. xxhash64(id)) and pass that column"
        )


def sample_to_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    keep_rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash(id) mod 10000 < rate(group) * 10000.

    ``keep_rates`` maps group values to [0, 1] keep fractions; unlisted
    groups fall back to ``default_rate``. Exact-rate guarantee is per-id
    (fractions converge by the hash's uniformity); determinism is exact.

    The id is folded into [0, 1000003) BEFORE the Knuth multiply (ADVICE
    r2): a bare ``id * 2654435761`` overflows BIGINT for ids above ~3.47e9
    — Spark (non-ANSI) wraps silently while an ANSI engine raises, so the
    plain-SQL mirror would diverge exactly at the 100 TB id scales this
    sampler targets. Bounded operand: max ≈ 1e6 * 2.65e9 ≈ 2.7e15 ≪ 2^63.
    """
    _require_integral_id(df, id_col, "sample_to_mixture")
    folded = F.pmod(F.col(id_col).cast("long"), F.lit(_FOLD))
    bucket = F.pmod(folded * F.lit(_KNUTH), F.lit(10000))
    rate = None
    for val, r in keep_rates.items():
        cond = F.col(group_col) == val
        rate = (
            F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
        )
    rate = (
        rate.otherwise(F.lit(default_rate))
        if rate is not None
        else F.lit(default_rate)
    )
    return df.filter(bucket < rate * 10000)
