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
