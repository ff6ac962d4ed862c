"""Closed-form sanity properties for the round-7 statistics family —
the unit complement of the DuckDB parity gate (which proves engine
equivalence, not statistical correctness). Each test builds a tiny
synthetic table layout under tmp_path and drives the REGISTERED query
against it, asserting the textbook value."""

import datetime as dt
import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def _write(spark, tmp_path, name, df):
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _q(name):
    return entrymod.queries()[name]


def test_kendall_tau_perfect_monotone_is_one(spark, tmp_path):
    """Strictly increasing (price bucket, quantity) pairs, no ties →
    tau_b = 1 exactly."""
    li = spark.createDataFrame(
        [(i, i, 1, i, 10000.0 * i + 5.0, float(i), 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 1))
         for i in range(1, 6)],
        "l_orderkey long, l_partkey long, l_linenumber int, l_suppkey long,"
        " l_extendedprice double, l_quantity double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(i, f"part{i}", "BrandX", "t", 1, 1.0) for i in range(1, 6)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    _write(spark, tmp_path, "lineitem", li)
    _write(spark, tmp_path, "part", part)
    row = _q("c_kendall_tau")(spark, str(tmp_path)).collect()[0]
    assert row["tau_b"] == 1.0 and row["n"] == 5
    assert row["disc"] == 0


def test_chi2_exact_independence_is_zero(spark, tmp_path):
    """Counts exactly proportional across the contingency table →
    every χ² term is 0."""
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "S1" if i < 30 else "S2")
         for i in range(60)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    # each customer: one P1 and two P2 orders → within-segment priority
    # mix identical → independent
    rows = []
    oid = 0
    for i in range(60):
        for pr, k in (("P1", 1), ("P2", 2)):
            for _ in range(k):
                rows.append(
                    (oid, i, "O", 10.0, dt.datetime(2024, 1, 1), pr)
                )
                oid += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    _write(spark, tmp_path, "customer", cust)
    _write(spark, tmp_path, "orders", orders)
    out = _q("c_chi2_independence")(spark, str(tmp_path)).collect()
    assert {r["segment"] for r in out} == {"S1", "S2"}
    assert all(r["chi2_part"] == 0.0 for r in out)


def test_mannwhitney_identical_groups_auc_half(spark, tmp_path):
    """Two segments with the same value multiset → AUC exactly 0.5."""
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "A" if i % 2 == 0 else "B")
         for i in range(40)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(i, i, "O", 100.0 * (1 + (i // 2) % 5), dt.datetime(2024, 1, 1),
          "P") for i in range(40)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    _write(spark, tmp_path, "customer", cust)
    _write(spark, tmp_path, "orders", orders)
    out = _q("c_mannwhitney")(spark, str(tmp_path)).collect()
    assert all(r["auc"] == 0.5 for r in out)


def test_ks_identical_distributions_is_zero(spark, tmp_path):
    """Every source shares one length distribution → KS = 0 for all."""
    docs = spark.createDataFrame(
        [(s * 100 + i, "w " * 3, "en", f"src{s}", 100 + (i % 4) * 10)
         for s in range(3) for i in range(8)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _write(spark, tmp_path, "documents", docs)
    out = _q("c_ks_source")(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert all(r["ks"] == 0.0 and r["ks_scaled"] == 0 for r in out)


def test_markov_symmetric_two_state_steady_half(spark, tmp_path):
    """A↔B alternating chains → doubly stochastic 2-state matrix →
    steady state (0.5, 0.5) regardless of start."""
    rows = []
    eid = 0
    for u in range(10):
        for i in range(6):
            rows.append(
                (eid, dt.datetime(2024, 1, 1, 0, i), u,
                 "A" if (i + u) % 2 == 0 else "B", 0.0, None)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(spark, tmp_path, "events", ev)
    out = {r["event_type"]: r["steady"]
           for r in _q("c_markov_steady")(spark, str(tmp_path)).collect()}
    assert out == {"A": 0.5, "B": 0.5}


def test_km_curve_no_censoring_matches_empirical(spark, tmp_path):
    """Every customer repeats (no censoring) → KM survival equals the
    plain empirical survival of the duration distribution: with
    durations {1,1,2}, S(1) = 1/3 → km_nls(1) = -ln(1/3). The t=2 step
    (d=n) is excluded by the d<n guard."""
    rows = []
    oid = 0
    durs = [1, 1, 2]
    for cid, d in enumerate(durs):
        rows.append((oid, cid, "O", 1.0, dt.datetime(2024, 1, 1), "P"))
        oid += 1
        rows.append(
            (oid, cid, "O", 1.0, dt.datetime(2024, 1, 1 + d), "P")
        )
        oid += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    _write(spark, tmp_path, "orders", orders)
    out = _q("c_km_curve")(spark, str(tmp_path)).collect()
    assert len(out) == 1  # only t=1 (t=2 has d_t == n_risk)
    row = out[0]
    assert row["t"] == 1 and row["d_t"] == 2 and row["n_risk"] == 3
    assert abs(row["km_nls"] - (-math.log(1 / 3))) < 1e-5


def test_lorenz_equal_spend_is_uniform(spark, tmp_path):
    """All customers spend the same → cumulative share at decile d is
    exactly the cumulative customer fraction."""
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "S") for i in range(20)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(i, i, "O", 50.0, dt.datetime(2024, 1, 1), "P")
         for i in range(20)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    _write(spark, tmp_path, "customer", cust)
    _write(spark, tmp_path, "orders", orders)
    out = _q("c_lorenz_points")(spark, str(tmp_path)).collect()
    for r in out:
        assert r["cum_share"] == round((r["decile"] + 1) / 10, 6)


def test_label_margin_flags_planted_mislabel(spark, tmp_path):
    """Two well-separated clusters; one vector carries the wrong label →
    exactly that label reports one negative-margin candidate."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(20):
        base = [1.0, 0.0] if i < 10 else [0.0, 1.0]
        vec = [base[0] + rng.uniform(-0.05, 0.05),
               base[1] + rng.uniform(-0.05, 0.05)]
        label = 0 if i < 10 else 1
        rows.append((i, vec, label))
    # plant: vector 19 (cluster B) labeled 0
    rows[19] = (19, rows[19][1], 0)
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _write(spark, tmp_path, "embeddings", em)
    out = {r["label"]: r
           for r in _q("c_label_margin")(spark, str(tmp_path)).collect()}
    assert out[0]["n_mislabel_candidates"] == 1
    assert out[1]["n_mislabel_candidates"] == 0


def test_embedding_norms_flags_planted_zero_vector(spark, tmp_path):
    """Unit-norm corpus with one zero vector → exactly one outlier."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(30):
        a = rng.uniform(0, 6.28)
        rows.append((i, [math.cos(a), math.sin(a)], 0))
    rows[0] = (0, [0.0, 0.0], 0)
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _write(spark, tmp_path, "embeddings", em)
    row = _q("c_embedding_norms")(spark, str(tmp_path)).collect()[0]
    assert row["n"] == 30 and row["n_out"] == 1
    assert abs(row["med_norm2"] - 1.0) < 1e-5


def test_label_margin_fast_matches_registered(spark):
    """The fan-out-free projection form must agree with the
    oracle-checked explode-join form: identical mislabel counts, margins
    within rounding distance, and a plan with no join in the scoring
    pass."""
    from popelines_spark.llm.similarity import label_margin_fast
    from popelines_spark.plans.inspect import physical_plan
    from popelines_spark.tables import load
    from tests.conftest import SF_DIR

    em = load(spark, SF_DIR, "embeddings")
    fast = {r["label"]: r for r in label_margin_fast(em).collect()}
    slow = {
        r["label"]: r
        for r in _q("c_label_margin")(spark, SF_DIR).collect()
    }
    assert set(fast) == set(slow)
    for lbl in slow:
        assert fast[lbl]["n"] == slow[lbl]["n"]
        assert (
            fast[lbl]["n_mislabel_candidates"]
            == slow[lbl]["n_mislabel_candidates"]
        )
        assert abs(fast[lbl]["avg_margin"] - slow[lbl]["avg_margin"]) < 1e-5
    plan = physical_plan(label_margin_fast(em))
    # the scoring pass is a projection: no join operator anywhere
    assert "Join" not in plan, plan


def test_theilsen_exact_linear_slope(spark, tmp_path):
    """Daily revenue exactly 100 + 5·t dollars → every pairwise slope is
    exactly 5.0, so the median is too."""
    li = spark.createDataFrame(
        [(t, 1, 1, t, 100.0 + 5.0 * t, 1.0, 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 1) + dt.timedelta(days=t))
         for t in range(10)],
        "l_orderkey long, l_partkey long, l_linenumber int, l_suppkey long,"
        " l_extendedprice double, l_quantity double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    _write(spark, tmp_path, "lineitem", li)
    row = _q("c_theilsen_trend")(spark, str(tmp_path)).collect()[0]
    assert row["n_days"] == 10 and row["n_pairs"] == 45
    assert row["theil_slope"] == 5.0


def test_bootstrap_ci_degenerate_distribution(spark, tmp_path):
    """Every order costs exactly 250 → every resample mean is exactly
    250 → the CI collapses to a point."""
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "S") for i in range(50)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(i, i, "O", 250.0, dt.datetime(2024, 1, 1), "P")
         for i in range(50)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    _write(spark, tmp_path, "customer", cust)
    _write(spark, tmp_path, "orders", orders)
    row = _q("c_bootstrap_ci")(spark, str(tmp_path)).collect()[0]
    assert row["ci_lo"] == row["ci_hi"] == 250.0
    assert row["n_resamples"] == 100
