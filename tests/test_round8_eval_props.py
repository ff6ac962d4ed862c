"""Closed-form sanity properties for the round-8 evaluation batch
(ext_analytics8) — the unit complement of the DuckDB parity gate.
Each test builds a tiny synthetic table layout under tmp_path and
drives the REGISTERED query against it, asserting the textbook value."""

import datetime as dt
import math

import __spark_entry__ as entrymod


def _write(spark, tmp_path, name, df):
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _q(name):
    return entrymod.queries()[name]


_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)

_TS = dt.datetime(2024, 1, 1)


def _orders(spark, rows):
    return spark.createDataFrame(rows, _ORDERS_SCHEMA)


def test_auc_perfect_separation_is_one(spark, tmp_path):
    """All positives score strictly above all negatives → AUC = 1."""
    rows = [
        (i, 1, "F", 400000.0 + 100 * i, _TS, "5-LOW") for i in range(10)
    ] + [(100 + i, 1, "O", 1000.0 + 100 * i, _TS, "5-LOW") for i in range(10)]
    _write(spark, tmp_path, "orders", _orders(spark, rows))
    row = _q("c_auc_roc")(spark, str(tmp_path)).collect()[0]
    assert row["n1"] == 10 and row["n0"] == 10
    assert row["auc"] == 1.0


def test_auc_all_tied_is_half(spark, tmp_path):
    """Every score in the same bucket → mid-rank AUC = 0.5 exactly."""
    rows = [(i, 1, "F" if i < 5 else "O", 150.0, _TS, "5-LOW")
            for i in range(10)]
    _write(spark, tmp_path, "orders", _orders(spark, rows))
    row = _q("c_auc_roc")(spark, str(tmp_path)).collect()[0]
    assert row["auc"] == 0.5


def test_kruskal_identical_group_distributions_h_zero(spark, tmp_path):
    """Three groups with the same value multiset → all mean ranks equal
    → H = 0 (and the tie-corrected form too)."""
    rows = []
    k = 0
    for prio in ("1-URGENT", "2-HIGH", "5-LOW"):
        for v in (150.0, 250.0, 350.0):
            rows.append((k, 1, "O", v, _TS, prio))
            k += 1
    _write(spark, tmp_path, "orders", _orders(spark, rows))
    row = _q("c_kruskal_wallis")(spark, str(tmp_path)).collect()[0]
    assert row["k"] == 3 and row["n"] == 9
    assert row["h"] == 0.0 and row["h_tie"] == 0.0


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    """Both rules fire on exactly the same customers → kappa = 1."""
    rows = []
    # customers 1-5: 12 orders of 300k (both rules true);
    # customers 6-10: 2 orders of 1k (both rules false).
    k = 0
    for c in range(1, 6):
        for _ in range(12):
            rows.append((k, c, "O", 300000.0, _TS, "5-LOW"))
            k += 1
    for c in range(6, 11):
        for _ in range(2):
            rows.append((k, c, "O", 1000.0, _TS, "5-LOW"))
            k += 1
    _write(spark, tmp_path, "orders", _orders(spark, rows))
    row = _q("c_cohens_kappa")(spark, str(tmp_path)).collect()[0]
    assert row["n11"] == 5 and row["n00"] == 5
    assert row["n10"] == 0 and row["n01"] == 0
    assert row["kappa"] == 1.0


def test_brier_logloss_known_single_row(spark, tmp_path):
    """One positive row at the 0.99 clamp → Brier = (0.99−1)²,
    log-loss = −ln(0.99), both at 6dp."""
    _write(
        spark, tmp_path, "orders",
        _orders(spark, [(1, 1, "F", 500000.0, _TS, "5-LOW")]),
    )
    row = _q("c_brier_logloss")(spark, str(tmp_path)).collect()[0]
    assert row["n"] == 1
    assert row["brier"] == round(round((0.99 - 1.0) ** 2, 6) / 1, 6)
    assert row["logloss"] == round(round(-math.log(0.99), 6) / 1, 6)


def test_wilson_matches_formula(spark, tmp_path):
    """Wilson bounds equal the textbook formula computed in Python."""
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 10.0 if i < 30 else -5.0, "S1")
         for i in range(40)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    _write(spark, tmp_path, "customer", cust)
    row = _q("c_wilson_ci")(spark, str(tmp_path)).collect()[0]
    n, s, z = 40, 30, 1.959963984540054
    ph = s / n
    denom = 1 + z * z / n
    center = ph + z * z / (2 * n)
    half = z * math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
    assert row["n"] == n and row["s"] == s
    assert row["lo"] == round((center - half) / denom, 6)
    assert row["hi"] == round((center + half) / denom, 6)


def test_odds_ratio_symmetric_table_is_one(spark, tmp_path):
    """a = b = c = d → OR = 1 and the CI straddles 1."""
    rows = []
    k = 0
    for prio, status in (
        ("1-URGENT", "F"), ("1-URGENT", "O"), ("5-LOW", "F"), ("5-LOW", "O")
    ):
        for _ in range(10):
            rows.append((k, 1, status, 100.0, _TS, prio))
            k += 1
    _write(spark, tmp_path, "orders", _orders(spark, rows))
    row = _q("c_odds_ratio")(spark, str(tmp_path)).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (10, 10, 10, 10)
    assert row["odds_ratio"] == 1.0
    assert row["lo"] < 1.0 < row["hi"]


def test_cross_corr_planted_lag_is_one(spark, tmp_path):
    """Purchases are views shifted by exactly 3 days → r(lag=3) = 1."""
    rows = []
    eid = 0
    pattern = [3, 1, 4, 1, 5, 9, 2, 6]
    for d, cnt in enumerate(pattern):
        for _ in range(cnt):
            rows.append(
                (eid, _TS + dt.timedelta(days=d), 1, "view", 1.0, "{}")
            )
            eid += 1
        for _ in range(cnt):
            rows.append(
                (eid, _TS + dt.timedelta(days=d + 3), 1, "purchase", 1.0,
                 "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(spark, tmp_path, "events", ev)
    out = {
        r["lag"]: r for r in _q("c_cross_corr_lag")(spark, str(tmp_path))
        .collect()
    }
    assert out[3]["r"] == 1.0 and out[3]["n_days"] == 8


def test_info_gain_perfect_split_equals_parent_entropy(spark, tmp_path):
    """Label flips exactly at $100k with balanced classes → the 100k
    threshold recovers the full parent entropy ln 2."""
    rows = [(i, 1, "F", 30000.0 + i, _TS, "5-LOW") for i in range(5)]
    rows += [(50 + i, 1, "F", 60000.0 + i, _TS, "5-LOW") for i in range(5)]
    rows += [(100 + i, 1, "O", 300000.0 + i, _TS, "5-LOW")
             for i in range(10)]
    _write(spark, tmp_path, "orders", _orders(spark, rows))
    out = {r["threshold"]: r
           for r in _q("c_info_gain_split")(spark, str(tmp_path)).collect()}
    assert out[100000]["n_left"] == 10 and out[100000]["n_right"] == 10
    assert out[100000]["gain"] == round(math.log(2.0), 6)
    # a split inside the F class's own range is strictly worse
    assert out[50000]["n_left"] == 5
    assert out[50000]["gain"] < out[100000]["gain"]


def test_kfold_round_robin_balance(spark, tmp_path):
    """10 docs in one stratum → every fold holds exactly 2."""
    docs = spark.createDataFrame(
        [(i, "hello world", "en", "web", 11) for i in range(10)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _write(spark, tmp_path, "documents", docs)
    out = _q("c_kfold_assign")(spark, str(tmp_path)).collect()
    assert sorted(r["fold"] for r in out) == [0, 1, 2, 3, 4]
    assert all(r["n_docs"] == 2 for r in out)


def test_bpe_pairs_weighted_by_word_frequency(spark, tmp_path):
    """'zz' appearing in 3 word tokens beats 'ab'/'ba' from one 'abab'
    token; pair counts weight the VOCAB by term frequency."""
    docs = spark.createDataFrame(
        [(1, "zz zz abab", "en", "web", 10), (2, "zz", "en", "web", 2)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _write(spark, tmp_path, "documents", docs)
    out = _q("c_bpe_pair_stats")(spark, str(tmp_path)).collect()
    got = {r["pair"]: r["cnt"] for r in out}
    assert got["zz"] == 3          # 3 word tokens contain one 'zz' pair
    assert got["ab"] == 2          # 'abab' → ab, ba, ab
    assert got["ba"] == 1
    assert out[0]["pair"] == "zz"  # top-1 by count
