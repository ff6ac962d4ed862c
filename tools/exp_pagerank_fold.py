"""r14 A/B for the pagerank base-fold (VERDICT r13 next #3): the r13
iteration (init⋈inflow broadcast join per iteration, planner-chosen
contrib join) — reconstructed inline below, byte-for-byte the shipped
r13 form — vs the shipped r14 operator (zero rows folded into the one
per-iteration aggregate + broadcast_edges pinning the static side).

Identity gate first (exceptAll both ways on the full c_pagerank_nations
output), then interleaved calm-gated wall times.

Usage: python tools/exp_pagerank_fold.py [rounds]
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _pagerank_r13(edges, nodes, node_col="node", n_iter=10, damping=0.85,
                  src="src", dst="dst"):
    """The r13-shipped iteration, verbatim (git 3360416 graph.py)."""
    from pyspark.sql import functions as F

    from popelines_spark.plans.inspect import checkpoint

    _DEC = "decimal(14,12)"
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
            F.col(src),
            F.col(dst),
            (F.lit(1.0) / F.col("__d")).cast("decimal(13,12)").alias("__recip"),
        ),
        "pagerank-edges-r13",
        eager=False,
    )
    ranks = init
    zero = F.lit(Decimal(0)).cast(_DEC)
    for i in range(n_iter):
        contrib = ranks.join(e, ranks[node_col] == e[src]).select(
            F.col(dst).alias(node_col),
            (F.col("pr") * F.col("__recip")).cast(_DEC).alias("__c"),
        )
        inflow = contrib.groupBy(node_col).agg(F.sum("__c").alias("__in"))
        ranks = init.join(inflow, node_col, "left").select(
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
            ranks = checkpoint(ranks, f"pagerank-r13-iter{i}", eager=False)
    return ranks.select(node_col, "pr")


def _query(spark, sf_dir, impl):
    """c_pagerank_nations with the iteration swapped in."""
    from pyspark.sql import functions as F

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
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    thr = cnt.agg(F.avg(F.col("w").cast("double")).alias("t"))
    edges = (
        cnt.crossJoin(F.broadcast(thr))
        .filter(F.col("w").cast("double") > F.col("t"))
        .select("src", "dst")
    )
    ranks = impl(edges, nation.select(F.col("n_nationkey").alias("node")))
    return ranks.join(
        F.broadcast(nation), ranks.node == nation.n_nationkey
    ).select("n_name", F.col("pr").cast("double").alias("pr"))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from popelines_spark.operators.graph import pagerank
    from popelines_spark.session import get_spark
    from tools.ab_harness import run_ab, summarize

    spark = get_spark(app_name="exp_pagerank_fold")
    spark.range(1000).count()

    def new_impl(edges, nodes):
        return pagerank(edges, nodes, node_col="node", broadcast_edges=True)

    old = _query(spark, sf_dir, _pagerank_r13).cache()
    new = _query(spark, sf_dir, new_impl).cache()
    n_old, n_new = old.count(), new.count()
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print(f"rows old={n_old} new={n_new} exceptAll-diff={diff}")
    assert diff == 0 and n_old == n_new, "variants disagree — DO NOT SHIP"
    old.unpersist(), new.unpersist()

    res = run_ab(
        spark,
        {
            "r13_join": lambda: _query(spark, sf_dir, _pagerank_r13),
            "r14_fold": lambda: _query(spark, sf_dir, new_impl),
        },
        rounds=rounds,
    )
    print(summarize(res))


if __name__ == "__main__":
    main()
