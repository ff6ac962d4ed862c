"""Compute the canonical driver correctness window for THIS round.

The driver's t2 gate scores the first 50 registry entries per round
(CORRECTNESS_r{N}.json), so `popelines_spark.registry._DRIVER_WINDOW_FIRST`
must rotate every round: entries the driver has NEVER scored go first,
then the stalest driver-green entries fill the remaining slots. Round 9
forgot this rotation and burned a round re-proving 50 already-green
entries (VERDICT r9 #1) — this script makes the rotation mechanical and
`tests/test_driver_window.py` fails at round start until it's applied.

Canonical rule (also enforced by the test):
  1. every registered id with NO row in any CORRECTNESS_r*.json, in
     registry order;
  2. then driver-green ids ascending by (latest round scored, id) until
     the window holds WINDOW_SIZE entries.

Usage:
    python tools/rotate_window.py            # print the canonical tuple
    python tools/rotate_window.py --check    # exit 1 if registry is stale
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WINDOW_SIZE = 50


def scored_rounds(repo: str = REPO) -> dict[str, int]:
    """id -> latest driver round that scored it (any verdict)."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        for qid in json.load(open(f)):
            latest[qid] = max(latest.get(qid, 0), rnd)
    return latest


def canonical_window(registry_ids: list[str], latest: dict[str, int]) -> list[str]:
    never = [q for q in registry_ids if q not in latest]
    greens = sorted(
        (q for q in registry_ids if q in latest),
        key=lambda q: (latest[q], q),
    )
    return (never + greens)[:WINDOW_SIZE]


def main() -> int:
    import __spark_entry__ as e

    from popelines_spark.registry import _DRIVER_WINDOW_FIRST

    ids = list(e.queries())
    want = canonical_window(ids, scored_rounds())
    if "--check" in sys.argv:
        if list(_DRIVER_WINDOW_FIRST) == want:
            print("window is canonical")
            return 0
        print("window is STALE — paste the tuple below into "
              "popelines_spark/registry.py:_DRIVER_WINDOW_FIRST")
    for q in want:
        print(f'    "{q}",')
    return 0 if list(_DRIVER_WINDOW_FIRST) == want else 1


if __name__ == "__main__":
    sys.exit(main())
