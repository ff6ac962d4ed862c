"""The round-13 routed facade under multi-process contention: racing
`write_to_table` appenders (exactly-once batch_ids) against routed
`update_rows` + `delete_rows` on ONE manifest table, all through the
PUBLIC Popeline surface. The underlying linearization (StaleParentError
rebase/retry, post-commit heal) is drilled by tools/stress_manifest and
tools/chaos_concurrent at the manifest-function level; this pins that
the round-13 ROUTING layer (layout detection + delegation) composes
with it — a layout probe racing a commit must never misroute or
corrupt.

Determinism under races: the DML targets only the seeded base rows
(id < 100); appenders write disjoint id ranges ≥ 1000. Whatever the
interleaving, the converged table must be exactly
base-after-update-and-delete ∪ all appended batches, each exactly once.
"""

import os
import subprocess
import sys

APPENDER = """
import sys
from popelines_spark.session import get_spark
from popelines_spark.pipeline import Popeline
wh, w = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name=f"facade_appender_{w}", cpus=2,
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
p = Popeline(warehouse=wh, spark=spark)
for b in range(2):
    lo = 10_000 + 1000 * (10 * w + b)
    df = spark.range(lo, lo + 50).selectExpr(
        "id", "CAST(id % 7 AS LONG) AS v"
    )
    # retried on purpose: the second call must be a no-op (exactly-once)
    p.write_to_table("t", df=df, append=True, batch_id=f"w{w}b{b}")
    p.write_to_table("t", df=df, append=True, batch_id=f"w{w}b{b}")
print("APPENDER_OK", w)
"""


def test_routed_dml_races_facade_appenders(spark, scratch):
    from popelines_spark.manifest import (
        append_manifest_table,
        heal_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.pipeline import Popeline

    base = spark.range(0, 100).selectExpr(
        "id", "CAST(id % 7 AS LONG) AS v"
    )
    append_manifest_table(spark, scratch, "t", base, batch_id="base")
    env = dict(os.environ)
    env["POPELINES_LOCK_STALE_SEC"] = "30"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", APPENDER, scratch, str(w)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for w in range(3)
    ]
    p = Popeline(warehouse=scratch, spark=spark)
    # routed DML racing the appenders, base rows only
    assert p.update_rows("t", {"v": "v + 100"}, "id < 100") == 100
    assert p.delete_rows("t", "id >= 90 AND id < 100") == 10
    for pr in procs:
        out, err = pr.communicate(timeout=600)
        assert pr.returncode == 0, err.decode()[-2000:]
        assert b"APPENDER_OK" in out
    assert heal_manifest_table(spark, scratch, "t") == 0
    got = read_manifest_table(spark, scratch, "t")
    # base: 100 seeded, 10 deleted, every survivor updated exactly once
    base_rows = got.where("id < 100")
    assert base_rows.count() == 90
    assert base_rows.where("v <> id % 7 + 100").count() == 0
    # appends: 3 workers x 2 batches x 50 rows, exactly once each
    app_rows = got.where("id >= 1000")
    assert app_rows.count() == 300
    assert app_rows.select("id").distinct().count() == 300
    assert app_rows.where("v <> id % 7").count() == 0
