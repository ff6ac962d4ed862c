"""PROOFSTATE.json freshness guard (VERDICT r12 next #7).

The artifact is the single source of truth for proof-state counts; the
docs reference it instead of restating. This pin catches the one way it
can silently rot: registering new queries without re-running
``python tools/proofstate.py``. (The test count is deliberately NOT
pinned here — asserting it would make every test addition a two-step
edit; the tool recounts it at round end.)
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_proofstate_matches_live_registry():
    doc = json.load(open(os.path.join(REPO, "PROOFSTATE.json")))
    import __spark_entry__ as e

    assert doc["registry_queries"] == len(e.queries()), (
        "registry grew/shrank since PROOFSTATE.json was generated — "
        "run `python tools/proofstate.py`"
    )
    assert doc["oracle_covered"] == len(e.oracle_sql())
    assert doc["parity"] is not None and doc["parity"]["fail"] == 0
