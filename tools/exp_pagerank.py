"""Experiment: pagerank per-iteration overhead (broadcast-build jobs).

A: current operator (2 broadcast-join builds per iteration = ~20 tiny
   driver-scheduled jobs for 10 iterations).
B: broadcast the K²-bounded EDGE relation once (ReuseExchange dedups the
   10 references into one build) and replace the init⋈inflow broadcast
   join with a union + keyed re-aggregate (a tiny shuffle stage inside
   the one main job instead of a per-iteration broadcast build job).
   Arithmetic identical: decimal sums are exact/order-free and
   round(0.85*0)=0 matches the coalesce(zero) branch.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from popelines_spark.session import get_spark  # noqa: E402
from popelines_spark.plans.inspect import checkpoint  # noqa: E402
from tools.ab_harness import run_ab, summarize  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_DEC = "decimal(14,12)"


def pagerank_b(edges, nodes, src="src", dst="dst", node_col="node",
               n_iter=10, damping=0.85):
    damping_dec = F.lit(Decimal(str(damping))).cast("decimal(3,2)")
    base_lit = 1.0 - damping
    n = nodes.agg(F.count("*").cast("double").alias("__n"))
    init = nodes.crossJoin(F.broadcast(n)).select(
        F.col(node_col),
        (F.lit(1.0) / F.col("__n")).cast(_DEC).alias("pr"),
        (F.lit(base_lit) / F.col("__n")).cast(_DEC).alias("__base"),
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("__d"))
    e = checkpoint(
        edges.join(deg, src).select(
            F.col(src), F.col(dst),
            (F.lit(1.0) / F.col("__d")).cast("decimal(13,12)").alias("__recip"),
        ),
        "pagerank-edges", eager=False,
    )
    init = checkpoint(init, "pagerank-init", eager=False)
    ranks = init
    zero = F.lit(Decimal(0)).cast(_DEC)
    sum_t = "decimal(24,12)"
    for i in range(n_iter):
        contrib = ranks.join(F.broadcast(e), ranks[node_col] == e[src]).select(
            F.col(dst).alias(node_col),
            (F.col("pr") * F.col("__recip")).cast(_DEC).alias("__c"),
        )
        inflow = contrib.groupBy(node_col).agg(
            F.sum("__c").cast(sum_t).alias("__in")
        )
        merged = (
            init.select(
                node_col, "__base",
                F.lit(None).cast(sum_t).alias("__in"),
            )
            .unionByName(
                inflow.select(
                    node_col,
                    F.lit(None).cast(_DEC).alias("__base"),
                    "__in",
                )
            )
            .groupBy(node_col)
            .agg(
                F.max("__base").alias("__base"),
                F.max("__in").alias("__in"),
            )
        )
        ranks = merged.select(
            node_col,
            (
                F.col("__base")
                + F.coalesce(
                    (damping_dec * F.col("__in").cast(_DEC)).cast(_DEC),
                    zero,
                )
            )
            .cast(_DEC)
            .alias("pr"),
            "__base",
        )
        if i % 3 == 2 and i < n_iter - 1:
            ranks = checkpoint(ranks, f"pagerank-iter{i}", eager=False)
    return ranks.select(node_col, "pr")


def build_inputs(spark, sf_dir):
    from popelines_spark.queries._util import T

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cnt = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    thr = cnt.agg(F.avg(F.col("w").cast("double")).alias("t"))
    edges = (
        cnt.crossJoin(F.broadcast(thr))
        .filter(F.col("w").cast("double") > F.col("t"))
        .select("src", "dst")
    )
    return edges, nation


def main() -> None:
    spark = get_spark(app_name="exp_pagerank")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    qs["c_pagerank_nations"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite").format("noop").save()

    def variant_b():
        edges, nation = build_inputs(spark, SF)
        ranks = pagerank_b(
            edges, nation.select(F.col("n_nationkey").alias("node")))
        return ranks.join(
            F.broadcast(nation), ranks.node == nation.n_nationkey
        ).select("n_name", F.col("pr").cast("double").alias("pr"))

    variants = {
        "pagerank_A": lambda: qs["c_pagerank_nations"](spark, SF),
        "pagerank_B": variant_b,
    }
    res = run_ab(spark, variants, rounds=4)
    print(summarize(res))

    pa = qs["c_pagerank_nations"](spark, SF).toPandas().sort_values("n_name").reset_index(drop=True)
    pb = variant_b().toPandas().sort_values("n_name").reset_index(drop=True)
    print("identical:", pa.equals(pb))


if __name__ == "__main__":
    main()
