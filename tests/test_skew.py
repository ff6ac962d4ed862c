"""Skewed-key stress (VERDICT r4 #4): one user holding ~20% of all events.

The sort-based per-key family (sessionize, funnel, event transitions, as-of)
shuffles on user_id; ARCHITECTURE.md concedes the skew bound is "total rows
of the hottest key". These tests prove the RESULTS stay exactly right under
that skew — each operator is re-scored against its own DuckDB oracle on the
skewed data, and the as-of join against the quadratic reference — so the
hot key costs wall-time only, never correctness. The wall-time side is
measured by bench.py's `skew_sessionize` entry (numbers in ARCHITECTURE.md
§"Skewed-key stress").
"""

import datetime as dt
import importlib.util
import os

import duckdb
import pytest

from popelines_spark.registry import ORACLE_SQL, SPARK_QUERIES, load_all
from popelines_spark.tables import load

load_all()

_PARITY = None


def _parity():
    global _PARITY
    if _PARITY is None:
        spec = importlib.util.spec_from_file_location(
            "parity",
            os.path.join(os.path.dirname(__file__), "..", "tools", "parity.py"),
        )
        _PARITY = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_PARITY)
    return _PARITY


HOT_USER = 7


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    """events table where event_id % 5 == 0 rows (exactly 20%) are remapped
    to one hot user — deterministic, so Spark and DuckDB see identical data."""
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("skew") / "sfskew")
    os.makedirs(out, exist_ok=True)
    e = load(spark, "/root/testdata/sf0.001", "events")
    skewed = e.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(HOT_USER)).otherwise(
            F.col("user_id")
        ),
    )
    skewed.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


@pytest.mark.parametrize(
    "qname", ["c_sessionize", "c_funnel", "c_event_transitions", "c_stickiness"]
)
def test_events_operators_exact_under_skew(spark, skew_dir, qname):
    """Each user_id-shuffled operator must hash-match its DuckDB oracle on
    the skewed table — same compare the driver runs (rowcount + columns +
    order-insensitive canonical values)."""
    spark_pdf = SPARK_QUERIES[qname](spark, skew_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet/*.parquet')"
    )
    duck_pdf = con.execute(ORACLE_SQL[qname]).df()
    problems = _parity().compare(qname, spark_pdf, duck_pdf, verbose=True)
    assert not problems, problems
    # sanity: the hot user actually dominates
    import pandas as pd  # noqa: F401
    n_hot = con.execute(
        f"SELECT count(*) FROM events WHERE user_id = {HOT_USER}"
    ).fetchone()[0]
    n_all = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert n_hot / n_all >= 0.20


def test_triangle_counts_hub_graph(spark):
    """Degree-then-id orientation on a power-law-shaped fixture: one hub
    (node 0) adjacent to everything, so id-orientation would pay deg(hub)²
    wedges while degree-orientation gives the hub out-degree 0. Counts are
    checked against a brute-force triple loop."""
    from itertools import combinations

    from popelines_spark.operators.graph import triangle_counts

    edges = (
        [(0, k) for k in range(1, 21)]            # hub star: 20 edges
        + [(1, 2), (3, 4), (5, 6)]                # close 3 hub triangles
        + [(7, 8), (8, 9), (7, 9)]                # one hub-free triangle
    )
    eset = set(edges)
    nodes = sorted({n for e in edges for n in e})
    expected = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= eset:
            expected[a] += 1
            expected[b] += 1
            expected[c] += 1
    edf = spark.createDataFrame(edges, "src INT, dst INT")
    ndf = spark.createDataFrame([(n,) for n in nodes], "node INT")
    got = {r.node: r.n_tri for r in triangle_counts(edf, ndf).collect()}
    assert got == expected
    # the hub closes a triangle with EVERY non-star edge among its
    # neighbors: (1,2),(3,4),(5,6) plus all three {7,8,9} edges
    assert got[0] == 6


def test_pagerank_redistributed_conserves_mass(spark):
    """With danglers (chain 1→2→3, 3 dangles) the redistributed variant's
    ranks must sum to ~1; the plain variant must leak mass. On a
    dangler-free cycle both variants agree exactly (share term is 0)."""
    from decimal import Decimal

    from popelines_spark.operators.graph import (
        pagerank,
        pagerank_redistributed,
    )

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node INT")
    chain = spark.createDataFrame([(1, 2), (2, 3)], "src INT, dst INT")
    leaky = sum(r.pr for r in pagerank(chain, nodes, n_iter=5).collect())
    kept = sum(
        r.pr for r in pagerank_redistributed(chain, nodes, n_iter=5).collect()
    )
    assert leaky < Decimal("0.90")
    assert abs(kept - Decimal(1)) < Decimal("1e-10")

    cycle = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src INT, dst INT")
    a = {r.node: r.pr for r in pagerank(cycle, nodes, n_iter=5).collect()}
    b = {
        r.node: r.pr
        for r in pagerank_redistributed(cycle, nodes, n_iter=5).collect()
    }
    assert a == b


def test_asof_join_exact_under_skew(spark, skew_dir):
    """asof_join with a hot key: 20%-of-rows key must produce exactly the
    quadratic-reference answer (greatest right_ts <= left_ts per key)."""
    from popelines_spark.operators.asof import asof_join

    e = load(spark, skew_dir, "events")
    left = e.selectExpr(
        "event_id AS lid", "user_id AS lk", "ts AS lts"
    ).limit(400)
    right = e.selectExpr(
        "event_id AS rid", "user_id AS rk", "ts AS rts", "value AS rv"
    )
    got = {
        r.lid: r.rid
        for r in asof_join(left, right, "lk", "rk", "lts", "rts").collect()
    }
    lrows = left.collect()
    rrows = right.collect()
    by_key = {}
    for r in rrows:
        by_key.setdefault(r.rk, []).append(r)
    for lr in lrows:
        cands = [r for r in by_key.get(lr.lk, []) if r.rts <= lr.lts]
        if not cands:
            assert got[lr.lid] is None
        else:
            best_ts = max(r.rts for r in cands)
            # tie-break is xxhash64 of the right payload — just assert the
            # chosen row carries the winning timestamp
            chosen = got[lr.lid]
            assert chosen in {r.rid for r in cands if r.rts == best_ts}


def test_aqe_skew_join_splits_hot_partition(spark):
    """Runtime skew handling (SURVEY.md §4 / ARCHITECTURE skew notes):
    beside the manual salting operators, the session must be able to let
    AQE's OptimizeSkewedJoin split an oversized shuffle partition at
    runtime. Thresholds are lowered for the test fixture (half the fact
    rows on ONE key); the assertion is the final executed plan carries
    the SortMergeJoin(skew=true) annotation and the skewed AQEShuffleRead
    — and the join result is still exact."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(0, 200000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id") % 3000 + 10)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(0, 4000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("d")
        )
        j = hot.join(dim, "k")
        rows = j.collect()  # executes THIS dataset → AQE final plan
        assert len(rows) == 200000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
