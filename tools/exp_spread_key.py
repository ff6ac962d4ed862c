"""A/B: round-robin spread() vs hash spread_by(id) at the dedup-family
compute fan-outs (r13 batch 6 candidate, guide §2.4/§2.5).

Hypothesis: minhash_signatures / simhash / _shingle_hash_rows explode a
text column and immediately aggregate or window BY THE DOC ID. Round-
robin spread (batch 1) repaired the single-task scan but (a) pays the
sortBeforeRepartition local sort and (b) scatters each id across all
partitions, so the keyed partial aggregate emits ~n_partitions partial
states per id into the next exchange. Hash-spreading by the id instead
skips the sort AND lets Catalyst reuse hashpartitioning(id) for the
groupBy/window — one less Exchange, full local collapse of the partial
aggregate (guide §2.3 "aggregate before you shuffle", §2.4 "share one
exchange").

The toggle is POPELINES_SPREAD_KEYED, read inside the operators at call
time, so variants interleave in one session.

DECISION (r13 batch 6): keyed SHIPPED. 7 interleaved rounds total —
minima c_dedup_fuzzy 2.745/2.806 (rr) vs 2.410/2.533 (keyed), ~0.9x;
c_dedup_ngram 2.441 (rr) vs 1.739 (keyed), ~0.72x; keyed won most
individual rounds on a mildly contended host (spin 1.13-1.25). Plan
diff: minhash_signatures and _shingle_hash_rows each drop one Exchange
(2 -> 1) — the keyed groupBy/window/distinct reuse hashpartitioning(id).
dedup.py now calls spread_by(id) directly, so this script's two
variants are identical post-change; it is kept as the experiment
record.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from popelines_spark.session import get_spark

    import __spark_entry__ as entrymod
    from tools.ab_harness import run_ab

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    queries = (sys.argv[2].split(",") if len(sys.argv) > 2
               else ["c_dedup_fuzzy", "c_dedup_ngram"])

    spark = get_spark(app_name="exp_spread_key")
    spark.range(1000).count()
    qs = entrymod.queries()

    out = {}
    for qname in queries:
        fn = qs[qname]

        def rr(fn=fn):
            os.environ["POPELINES_SPREAD_KEYED"] = "0"
            return fn(spark, sf_dir)

        def keyed(fn=fn):
            os.environ["POPELINES_SPREAD_KEYED"] = "1"
            return fn(spark, sf_dir)

        res = run_ab(spark, {"roundrobin": rr, "keyed": keyed},
                     rounds=rounds)
        out[qname] = {k: v for k, v in res.items()}
        print(qname, json.dumps(out[qname]))
    os.environ.pop("POPELINES_SPREAD_KEYED", None)
    print("SUMMARY",
          json.dumps({q: {k: min(v) for k, v in r.items() if k != "_probe"}
                      for q, r in out.items()}))


if __name__ == "__main__":
    main()
