"""Graph analytics over the nation trade graph — BFS reachability and
triangle counting.

Round-5 additions rounding out ``operators/graph.py`` (PageRank landed
earlier this round): the two other classic distributed-graph primitives a
warehouse user reaches for — "what can I reach in k hops" (lineage /
blast-radius queries) and "how clustered is this node" (community
cohesion). A reference user runs these by exporting to a graph tool
(popelines/main.py:236 delegated SQL can't iterate); here they are native
DataFrame loops that run where the data lives.

Graph construction is shared with ``c_pagerank_nations``
(queries/ext_analytics2.py): nation src→dst when supplier-nation src
ships to customer-nation dst in strictly more line items than the average
ordered pair — a sparsifier that yields varied degrees at every SF.

Oracle strategy: the BFS mirror is a bounded WITH RECURSIVE expansion
(DuckDB explores every ≤ max_hops path; min(hop) per node collapses it),
the triangle mirror is the same oriented 3-join the Spark side runs.
Integer-only state — nothing to drift cross-engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.registry import query
from popelines_spark.queries._util import T

#: Directed trade edges (src, dst) — identical to c_pagerank_nations.
#: MATERIALIZED: the oracles below reference edges through 3-4 join legs
#: and DuckDB inlines plain CTEs, so without it the 4-table lineitem
#: aggregation would recompute once per reference.
_EDGES_CTE = """
    cnt AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2),
    thr AS (SELECT avg(CAST(w AS DOUBLE)) AS t FROM cnt),
    edges AS MATERIALIZED (
              SELECT src, dst FROM cnt CROSS JOIN thr
              WHERE CAST(w AS DOUBLE) > t)
"""


def _trade_edges(spark, sf_dir):
    """Spark twin of ``_EDGES_CTE`` (shared with c_pagerank_nations)."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
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
    return (
        cnt.crossJoin(F.broadcast(thr))
        .filter(F.col("w").cast("double") > F.col("t"))
        .select("src", "dst")
    )


@query(
    "c_graph_bfs",
    oracle=f"""
    WITH RECURSIVE {_EDGES_CTE},
    seeds AS (SELECT n_nationkey AS node FROM nation
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
    bfs AS (
      SELECT node, 0 AS hop FROM seeds
      UNION ALL
      SELECT e.dst AS node, b.hop + 1 AS hop
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.hop < 4)
    SELECT n_name, CAST(min(hop) AS BIGINT) AS hops
    FROM bfs JOIN nation ON n_nationkey = node
    GROUP BY n_name
    """,
)
def c_graph_bfs(spark, sf_dir):
    """Multi-source BFS: minimum hops from any EUROPE nation through the
    trade graph, bounded at 4. operators/graph.py:bfs_hops carries the
    frontier-expansion scale notes (per-round work is frontier-adjacent
    edges only; the oracle's recursive CTE explores every path and
    collapses with min — same answer, exponentially more work, which is
    exactly why the engine side is the frontier algorithm)."""
    from popelines_spark.operators.graph import bfs_hops

    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    seeds = (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("n_nationkey").alias("node"))
    )
    hops = bfs_hops(_trade_edges(spark, sf_dir), seeds, max_hops=4)
    return hops.join(
        F.broadcast(nation), hops.node == nation.n_nationkey
    ).select("n_name", "hops")


@query(
    "c_triangle_count",
    oracle=f"""
    WITH {_EDGES_CTE},
    und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS src,
                   greatest(src, dst) AS dst
            FROM edges WHERE src <> dst),
    tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
            FROM und e1
            JOIN und e2 ON e2.src = e1.dst
            JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst),
    corners AS (SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri),
    per_node AS (SELECT node, count(*) AS n_tri FROM corners GROUP BY 1)
    SELECT n_name, CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri
    FROM nation LEFT JOIN per_node ON node = n_nationkey
    """,
)
def c_triangle_count(spark, sf_dir):
    """Per-nation triangle participation in the undirected trade graph
    (each triangle a<b<c enumerated once via oriented wedge join + closing
    probe — operators/graph.py:triangle_counts has the sum(deg²) fan-out
    bound). Nodes in no triangle report 0."""
    from popelines_spark.operators.graph import triangle_counts

    edges = _trade_edges(spark, sf_dir)
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    nation = T(spark, sf_dir, "nation")
    tri = triangle_counts(
        und, nation.select(F.col("n_nationkey").alias("node"))
    )
    return tri.join(
        F.broadcast(nation), tri.node == nation.n_nationkey
    ).select("n_name", "n_tri")


@query(
    "c_triangle_count_skew",
    oracle="""
    WITH pk AS MATERIALIZED (
        SELECT l_orderkey AS ok,
               CASE WHEN l_partkey % 5 = 0 THEN 0 ELSE l_partkey END AS node
        FROM lineitem),
    und AS MATERIALIZED (
        SELECT DISTINCT a.node AS src, b.node AS dst
        FROM pk a JOIN pk b ON a.ok = b.ok AND a.node < b.node),
    tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
            FROM und e1
            JOIN und e2 ON e2.src = e1.dst
            JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst),
    corners AS (SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri),
    per_node AS (SELECT node, count(*) AS n_tri FROM corners GROUP BY 1),
    nodes AS (SELECT DISTINCT node FROM pk)
    SELECT n.node, CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri
    FROM nodes n LEFT JOIN per_node p ON p.node = n.node
    """,
)
def c_triangle_count_skew(spark, sf_dir):
    """Triangle counts on a deliberately hub-skewed co-purchase graph:
    parts co-ordered in the same order are linked, and every 5th part key
    is collapsed into node 0 — one mega-hub holding ~20% of all edge
    endpoints (the same hot-key construction as c_skew_sessionize). This
    is the power-law stress for operators/graph.py:triangle_counts'
    degree-then-id orientation: the hub has the highest degree, so every
    one of its edges is oriented TOWARD it and its out-degree — the wedge
    fan-out term — is ~0; the deg² blowup the oracle's id-oriented 3-join
    does pay (node 0 is the minimum id) never materializes engine-side. Exact-count parity proves the orientation change
    is answer-preserving."""
    from popelines_spark.operators.graph import triangle_counts

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pk = li.select(
        F.col("l_orderkey").alias("ok"),
        F.when(F.col("l_partkey") % 5 == 0, F.lit(0))
        .otherwise(F.col("l_partkey"))
        .alias("node"),
    )
    b = pk.select(F.col("ok"), F.col("node").alias("node2"))
    und = (
        pk.join(b, "ok")
        .filter(F.col("node") < F.col("node2"))
        .select(F.col("node").alias("src"), F.col("node2").alias("dst"))
        .distinct()
    )
    nodes = pk.select("node").distinct()
    return triangle_counts(und, nodes)


def _pagerank_rd_sql(n_iter: int = 10) -> str:
    """Loop-unrolled DuckDB mirror of
    operators/graph.py:pagerank_redistributed over the src<dst-restricted
    trade graph (the restriction guarantees dangling nations: the
    max-key nation can never be a src). Same decimal-state discipline as
    queries/ext_analytics2.py:_pagerank_sql — round() explicitly before
    every narrowing cast (Spark decimal CAST is HALF_UP, DuckDB CAST is
    HALF_EVEN, DuckDB round() is HALF_UP). r{i} feeds TWO legs per
    iteration (contributions + dangling mass) so every rank CTE is
    MATERIALIZED — plain CTEs inline and the recompute chain doubles per
    iteration."""
    base_lit = repr(1.0 - 0.85)
    sql = f"""
    WITH cnt AS MATERIALIZED (
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2),
    thr AS (SELECT avg(CAST(w AS DOUBLE)) AS t FROM cnt),
    edges AS MATERIALIZED (
              SELECT src, dst FROM cnt CROSS JOIN thr
              WHERE CAST(w AS DOUBLE) > t AND src < dst),
    deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
    rn AS (SELECT CAST(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn)
                       AS DECIMAL(13,12)) AS recip_n),
    nodes AS MATERIALIZED (
              SELECT n_nationkey AS node, n_name,
                     CAST(CAST({base_lit} AS DOUBLE) / (SELECT n FROM nn)
                          AS DECIMAL(14,12)) AS base
              FROM nation),
    dang AS MATERIALIZED (
              SELECT node FROM nodes
              WHERE node NOT IN (SELECT src FROM deg)),
    er AS MATERIALIZED (
           SELECT e.src, e.dst,
                  CAST(CAST(1.0 AS DOUBLE) / d.d AS DECIMAL(13,12)) AS recip
           FROM edges e JOIN deg d ON d.src = e.src),
    r0 AS MATERIALIZED (
           SELECT node,
                  CAST(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn)
                       AS DECIMAL(14,12)) AS pr
           FROM nodes)
    """
    for i in range(n_iter):
        sql += f"""
    , c{i} AS (SELECT er.dst AS node,
                      CAST(round(r.pr * er.recip, 12) AS DECIMAL(14,12))
                        AS contrib
               FROM r{i} r JOIN er ON r.node = er.src),
    s{i} AS (SELECT node, SUM(contrib) AS infl FROM c{i} GROUP BY 1),
    d{i} AS (SELECT CAST(COALESCE(SUM(r.pr), 0) AS DECIMAL(14,12)) AS dm
             FROM r{i} r JOIN dang ON dang.node = r.node),
    sh{i} AS (SELECT CAST(round(
                       CAST(round(0.85 * dm, 12) AS DECIMAL(14,12))
                       * (SELECT recip_n FROM rn), 12)
                     AS DECIMAL(14,12)) AS share
              FROM d{i}),
    r{i + 1} AS MATERIALIZED (
               SELECT n.node,
                 CAST(n.base + COALESCE(
                        CAST(round(0.85 * CAST(s.infl AS DECIMAL(14,12)),
                                   12) AS DECIMAL(14,12)),
                        CAST(0 AS DECIMAL(14,12)))
                      + (SELECT share FROM sh{i})
                      AS DECIMAL(14,12)) AS pr
               FROM nodes n LEFT JOIN s{i} s ON n.node = s.node)
        """
    sql += f"""
    SELECT n.n_name, CAST(r.pr AS DOUBLE) AS pr
    FROM r{n_iter} r JOIN nodes n ON n.node = r.node
    """
    return sql


@query("c_pagerank_redistribute", oracle=_pagerank_rd_sql(10))
def c_pagerank_redistribute(spark, sf_dir):
    """Mass-conserving PageRank (10 iterations, d=0.85) over the trade
    graph restricted to src < dst — an acyclic-ish sparsifier under which
    the highest-key nation (and typically several others) has no
    out-edges, so the plain variant would leak their rank mass every
    iteration. operators/graph.py:pagerank_redistributed folds the
    dangling mass back in as one broadcast decimal scalar per iteration;
    ranks sum to ~1 regardless of graph shape."""
    from popelines_spark.operators.graph import pagerank_redistributed

    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = _trade_edges(spark, sf_dir).filter(F.col("src") < F.col("dst"))
    ranks = pagerank_redistributed(
        edges,
        nation.select(F.col("n_nationkey").alias("node")),
        node_col="node",
        n_iter=10,
        damping=0.85,
    )
    return ranks.join(
        F.broadcast(nation), ranks.node == nation.n_nationkey
    ).select("n_name", F.col("pr").cast("double").alias("pr"))
