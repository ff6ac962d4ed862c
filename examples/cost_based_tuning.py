"""Cost-based tuning lifecycle on popelines_spark (round-10 planner).

The reference outsourced every physical decision to BigQuery's
optimizer (popelines/main.py:240 delegates whole queries); this engine
makes the same decisions from at-rest statistics and SHOWS ITS WORK.
The example walks the full lifecycle a production warehouse runs:

  ANALYZE every table (one scan each, stats land in _stats.json) →
  EXPLAIN a 2-way join (broadcast? bloom? salt? — reasons, no execution) →
  EXPLAIN an N-dim star join (leg order from NDV ratios) →
  size the exchange (suggest_shuffle_partitions, pre-AQE upper bound) →
  append a batch with update_stats=True (stats fold in O(batch),
  no re-scan; the skew profile is flagged as a lower bound) →
  execute the planned star join and check it equals the plain join.

Every decision here reads JSON metadata, never the tables — which is
what lets the same calls run in constant time against 100 TB.

Run:  python examples/cost_based_tuning.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def tune(spark, sf_dir: str, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from popelines_spark import io
    from popelines_spark.pipeline import Popeline
    from popelines_spark.tables import load

    p = Popeline(warehouse=out_dir, spark=spark)

    # -- land a small star schema: fact + three dims, shared key names
    fact = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_orderkey").alias("ok"),
        "l_extendedprice",
    )
    io.write_table(fact, out_dir, "fact", append=False)
    io.write_table(
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("pk"), "p_brand"),
        out_dir, "dim_part", append=False,
    )
    io.write_table(
        load(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").alias("sk"), "s_nationkey"
        ),
        out_dir, "dim_supp", append=False,
    )
    io.write_table(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("ok"), "o_orderpriority"
        ),
        out_dir, "dim_ord", append=False,
    )

    # -- ANALYZE: one scan per table; the fact also records a skew
    #    profile for its join keys (one groupBy per named key)
    p.analyze_table("fact", key_columns=["pk", "sk", "ok"])
    for t in ("dim_part", "dim_supp", "dim_ord"):
        p.analyze_table(t)

    # -- EXPLAIN a 2-way join: metadata only, full reasons
    two_way = p.explain_join(
        "fact", "dim_part", on="pk", runtime_filter="auto", skew="auto"
    )

    # -- EXPLAIN the star: leg order from dim-NDV / fact-NDV ratios,
    #    described in deliberately bad user order
    star = p.explain_star_join(
        "fact",
        [
            {"table": "dim_ord", "on": "ok", "how": "left"},
            {"table": "dim_supp", "on": "sk"},
            {"table": "dim_part", "on": "pk"},
        ],
    )

    # -- size the exchange these tables would feed
    exchange = p.suggest_shuffle_partitions("fact", "dim_ord")

    # -- append a batch, stats fold in O(batch): rows/NDV current
    #    without a re-scan, skew profile flagged as a lower bound
    before = p.table_stats("fact")
    batch = fact.limit(500).withColumn(
        "pk", F.col("pk") + F.lit(10_000_000)  # new keys grow the NDV
    )
    io.write_table(batch, out_dir, "fact", append=True, update_stats=True)
    after = p.table_stats("fact")

    # -- execute the planned star join; the rewrite is invisible
    planned = p.star_join(
        "fact",
        [
            {"table": "dim_ord", "on": "ok", "how": "left"},
            {"table": "dim_supp", "on": "sk"},
            {"table": "dim_part", "on": "pk"},
        ],
    )
    plain = (
        io.read_table_evolved(spark, out_dir, "fact")
        .join(io.read_table_evolved(spark, out_dir, "dim_ord"), "ok", "left")
        .join(io.read_table_evolved(spark, out_dir, "dim_supp"), "sk")
        .join(io.read_table_evolved(spark, out_dir, "dim_part"), "pk")
    )
    # -- the same star through the PAVED path: join_tables with a list
    #    of dims routes through the planner automatically — leg order
    #    and broadcast from stats alone, bloom/salt still opt-in
    paved = p.join_tables(
        "fact", ["dim_ord", "dim_supp", "dim_part"],
        on=["ok", "sk", "pk"], how=["left", "inner", "inner"],
    )
    return {
        "two_way_broadcast": two_way["broadcast"],
        "two_way_reasons": two_way["reasons"],
        "star_order": star["order"],
        "star_reasons": star["reasons"],
        "exchange_partitions": exchange["partitions"],
        "rows_before": before["rows"],
        "rows_after": after["rows"],
        "pk_ndv_before": before["columns"]["pk"]["approx_ndv"],
        "pk_ndv_after": after["columns"]["pk"]["approx_ndv"],
        "stats_stale_after_append": after.get("stale", False),
        "keys_flagged_lower_bound": after.get("keys_stale", False),
        "planned_rows": planned.count(),
        "plain_rows": plain.count(),
        "paved_join_tables_rows": paved.count(),
    }


if __name__ == "__main__":
    from popelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/popelines_tuning"
    spark = get_spark(app_name="cost_based_tuning", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    stats = tune(spark, sf_dir, out_dir)
    for k, v in stats.items():
        print(f"{k}: {v}")
