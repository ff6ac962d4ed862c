"""Single source of truth for proof-state counts (VERDICT r12 next #7).

Rounds 10-12 each left THREE different test counts in the tree
(BASELINE.md said 428, SURVEY said 495+, the tree had 503) because each
doc restated the number at a different moment. This tool COUNTS instead
of restating: it regenerates ``PROOFSTATE.json`` from the tree itself —
pytest collection, the imported registry, oracle coverage — and records
the latest parity result when one is supplied. README/SURVEY/BASELINE
reference the artifact; they no longer carry their own copies of the
numbers.

Usage:
    python tools/proofstate.py                      # recount, keep parity
    python tools/proofstate.py --parity 345,0,0,0.01  # pass,fail,rows,sf
    python tools/proofstate.py --round 13           # stamp the round
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "PROOFSTATE.json")


def count_tests() -> int:
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    m = re.search(r"(\d+) tests collected", p.stdout)
    if not m:
        m = re.search(r"(\d+)/(\d+) tests collected", p.stdout)
    if not m:
        raise RuntimeError(
            f"could not parse pytest collection output:\n{p.stdout[-800:]}"
        )
    return int(m.group(1))


def registry_counts() -> tuple[int, int]:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return len(qs), len([q for q in qs if q in oracles])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", help="pass,fail,rows_only,sf")
    ap.add_argument("--round", type=int, default=None)
    args = ap.parse_args()

    prev = {}
    if os.path.exists(OUT):
        prev = json.load(open(OUT))

    n_q, n_oracle = registry_counts()
    doc = {
        "round": args.round if args.round is not None else prev.get("round"),
        "generated": datetime.date.today().isoformat(),
        "tests_collected": count_tests(),
        "registry_queries": n_q,
        "oracle_covered": n_oracle,
        "parity": prev.get("parity"),
    }
    if args.parity:
        p, f, r, sf = args.parity.split(",")
        doc["parity"] = {
            "pass": int(p),
            "fail": int(f),
            "rows_only": int(r),
            "sf": float(sf),
            "date": doc["generated"],
        }
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
