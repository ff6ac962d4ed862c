"""Interleaved A/B timing harness, contention-aware.

The host shows hypervisor contention episodes (BASELINE.md round 4/11
notes) that inflate identical code 1.5-4x for minutes at a time, so a
sequential before/after comparison is meaningless. This harness runs the
variants INTERLEAVED for R rounds with the bench's data-independent
calibration probe bracketing each round, and reports per-variant minima
(the standard estimator under asymmetric scheduling noise) plus the probe
minimum so the host state during the experiment is part of the record.

Usage: import from an experiment script; see tools/exp_*.py.
"""

from __future__ import annotations

import time


def run_ab(spark, variants: dict, rounds: int = 4, probe=None) -> dict:
    """variants: name -> zero-arg callable returning a DataFrame to drain
    through the noop sink. Returns {name: [times...], "_probe": [...]}."""
    if probe is None:
        import bench

        probe = lambda: bench.calibration_probe(spark)  # noqa: E731
    out: dict[str, list] = {name: [] for name in variants}
    out["_probe"] = []
    for r in range(rounds):
        out["_probe"].append(probe())
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab {name} r{r}")
            t0 = time.time()
            df = fn()
            if df is not None:
                df.write.mode("overwrite").format("noop").save()
            out[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    return out


def summarize(result: dict) -> str:
    lines = []
    for name, ts in result.items():
        lines.append(
            f"{name:>28}: min={min(ts):6.3f}  all={ts}"
        )
    return "\n".join(lines)
