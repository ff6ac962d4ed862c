"""One facade, three table layouts (round-12 surface).

The reference's users call ``write_to_bq`` without knowing how BigQuery
stores the table server-side. ``Popeline`` keeps that contract across
this engine's three layouts:

  1. the SAME ``write_to_table`` append lands on a plain path table, a
     snapshot-versioned table, and an ACID manifest table;
  2. ``batch_id`` makes a retried manifest load exactly-once;
  3. truncate on a snapshot table is a reader-isolated replace — a
     reader pinned to the old version is untouched;
  4. in-place rewrites REFUSE versioned layouts with the right tool's
     name instead of corrupting them;
  5. ``vacuum_table`` reclaims each layout's crash debris.

Run:  python examples/layout_transparent_facade.py [warehouse_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="pls_facade_"
    )
    from popelines_spark import io
    from popelines_spark.manifest import append_manifest_table
    from popelines_spark.pipeline import Popeline
    from popelines_spark.session import get_spark

    spark = get_spark(app_name="facade_example", cpus=4,
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    p = Popeline(warehouse=wh, spark=spark)

    def batch(b: int):
        return spark.range(b * 10, (b + 1) * 10).selectExpr(
            "id", f"{b} AS batch"
        )

    # --- three layouts, one call shape -------------------------------
    p.write_to_table("plain", df=batch(0), append=True)        # path
    io.write_table_snapshot(spark, wh, "versioned", batch(0))  # snapshot
    append_manifest_table(spark, wh, "acid", batch(0))         # manifest
    for t in ("plain", "versioned", "acid"):
        p.write_to_table(t, df=batch(1), append=True)
        n = io.read_table_auto(spark, wh, t).count()
        assert n == 20, (t, n)
        print(f"append on {t!r:12}: 20 rows ✓")

    # --- exactly-once manifest loads ----------------------------------
    p.write_to_table("acid", df=batch(2), append=True, batch_id="job-2")
    p.write_to_table("acid", df=batch(2), append=True, batch_id="job-2")
    assert io.read_table_auto(spark, wh, "acid").count() == 30
    print("retried batch_id load: still 30 rows (exactly-once) ✓")

    # --- reader-isolated snapshot truncate ----------------------------
    pinned = io.read_table_snapshot(spark, wh, "versioned", version=1)
    p.write_to_table("versioned", df=batch(9), append=False)
    assert io.read_table_snapshot(spark, wh, "versioned").count() == 10
    assert pinned.count() == 10  # v1 still fully readable
    print("snapshot truncate: new tip live, pinned reader untouched ✓")

    # --- versioned layouts refuse in-place rewrites --------------------
    for call in (
        lambda: p.delete_rows("acid", "id = 0"),
        lambda: p.update_rows("acid", {"id": "id + 1"}, "id = 0"),
        lambda: io.compact_table(spark, wh, "versioned"),
    ):
        try:
            call()
            raise AssertionError("guard did not fire")
        except ValueError as e:
            print(f"refused with the right tool's name ✓  ({e})"[:100])

    # --- per-layout debris vacuum --------------------------------------
    print("vacuum plain    :", p.vacuum_table("plain"))      # None (no-op)
    print("vacuum versioned:", p.vacuum_table("versioned"))  # debris dict
    print("vacuum acid     :", p.vacuum_table("acid"), "orphan files")
    print(f"\nwarehouse: {wh}")


if __name__ == "__main__":
    main()
