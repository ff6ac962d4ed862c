"""Ground-truth semantics for the round-4 analytics operators
(operators/eventseq.py, llm/rank.py, operators/zorder.py, asof tolerance).

Each test pins behavior against hand-computed expectations on data small
enough to verify by eye — the parity suite (tools/parity.py) then re-proves
the same operators against DuckDB at sf scale.
"""

import datetime as dt
import math

from pyspark.sql import functions as F

from popelines_spark.llm import rank
from popelines_spark.operators import eventseq, zorder
from popelines_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


# --- funnel ---------------------------------------------------------------


def test_funnel_requires_strict_order(spark):
    ev = _events(
        spark,
        [
            # u1 completes all three in order
            (1, _ts(0), "signup", 0.0),
            (1, _ts(1), "click", 0.0),
            (1, _ts(2), "purchase", 0.0),
            # u2: click at the SAME instant as signup — not strictly after
            (2, _ts(0), "signup", 0.0),
            (2, _ts(0), "click", 0.0),
            # u3: purchase BEFORE click — reaches click, not purchase
            (3, _ts(0), "signup", 0.0),
            (3, _ts(5), "purchase", 0.0),
            (3, _ts(6), "click", 0.0),
            # u4 never signs up
            (4, _ts(0), "click", 0.0),
            (4, _ts(1), "purchase", 0.0),
        ],
    )
    out = {
        r.step: r.n_users
        for r in eventseq.funnel(
            ev, "user_id", "ts", "event_type", ("signup", "click", "purchase")
        ).collect()
    }
    assert out == {"signup": 3, "click": 2, "purchase": 1}


def test_funnel_uses_earliest_completion(spark):
    """Min-time chaining is exact: a user with (signup t0, click t1,
    purchase t2) qualifies even when a LATER signup (t3) exists."""
    ev = _events(
        spark,
        [
            (1, _ts(0), "signup", 0.0),
            (1, _ts(1), "click", 0.0),
            (1, _ts(2), "purchase", 0.0),
            (1, _ts(3), "signup", 0.0),
        ],
    )
    out = {
        r.step: r.n_users
        for r in eventseq.funnel(
            ev, "user_id", "ts", "event_type", ("signup", "click", "purchase")
        ).collect()
    }
    assert out == {"signup": 1, "click": 1, "purchase": 1}


# --- retention ------------------------------------------------------------


def test_retention_week_offsets_exact_7day_periods(spark):
    d0 = dt.datetime(2024, 1, 3, 12, 0)  # a Wednesday
    ev = _events(
        spark,
        [
            (1, d0, "view", 0.0),
            (1, d0 + dt.timedelta(days=6, hours=23), "view", 0.0),  # offset 0
            (1, d0 + dt.timedelta(days=7), "view", 0.0),  # offset 1
            (2, d0 + dt.timedelta(days=14), "view", 0.0),  # own cohort, offset 0
        ],
    )
    rows = eventseq.retention(ev, "user_id", "ts").collect()
    # cohort_week truncates to the ISO Monday
    monday = dt.datetime(2024, 1, 1)
    got = {(r.cohort_week, r.week_offset): r.n_users for r in rows}
    assert got == {
        (monday, 0): 1,
        (monday, 1): 1,
        (dt.datetime(2024, 1, 15), 0): 1,
    }


# --- rollup ---------------------------------------------------------------


def test_time_rollup_day_equals_sum_of_hours(spark):
    ev = _events(
        spark,
        [
            (1, dt.datetime(2024, 5, 1, 10, 15), "view", 1.25),
            (1, dt.datetime(2024, 5, 1, 10, 45), "view", 2.50),
            (1, dt.datetime(2024, 5, 1, 23, 0), "view", 4.00),
            (1, dt.datetime(2024, 5, 2, 0, 0), "view", 8.00),
        ],
    )
    rows = eventseq.time_rollup(ev, "ts", "value", grains=("hour", "day")).collect()
    hours = {r.bucket_ts: (r.n_events, r.sum_value) for r in rows if r.grain == "hour"}
    days = {r.bucket_ts: (r.n_events, r.sum_value) for r in rows if r.grain == "day"}
    assert hours[dt.datetime(2024, 5, 1, 10, 0)] == (2, 3.75)
    assert days[dt.datetime(2024, 5, 1)] == (3, 7.75)
    assert days[dt.datetime(2024, 5, 2)] == (1, 8.00)
    assert sum(n for n, _ in days.values()) == sum(n for n, _ in hours.values())


# --- deterministic per-group sample --------------------------------------


def test_sample_per_group_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(g, g * 100 + i) for g in (1, 2) for i in range(50)], "g long, id long"
    )
    a = eventseq.sample_per_group(df, "g", "id", k=5)
    b = eventseq.sample_per_group(df, "g", "id", k=5)
    got_a = sorted((r.g, r.id) for r in a.collect())
    got_b = sorted((r.g, r.id) for r in b.collect())
    assert got_a == got_b  # retry/replan determinism
    per_g = {}
    for g, _ in got_a:
        per_g[g] = per_g.get(g, 0) + 1
    assert per_g == {1: 5, 2: 5}
    # k >= group size keeps everything
    assert eventseq.sample_per_group(df, "g", "id", k=100).count() == 100


# --- zscore ---------------------------------------------------------------


def test_zscore_flags_exact_outlier(spark):
    # group 'a': nine 10.0s and one 20.0 → mean 11, var 9, std 3;
    # z(20) = 3.0 — the only |z| > 2.5 row.
    rows = [(1, _ts(i), "a", 10.0) for i in range(9)] + [(1, _ts(9), "a", 20.0)]
    ev = _events(spark, rows)
    out = eventseq.zscore_outliers(ev, "event_type", "value", threshold=2.5).collect()
    assert len(out) == 1
    assert out[0].value == 20.0
    assert abs(out[0].zscore - 3.0) < 1e-12


# --- PSI ------------------------------------------------------------------


def test_psi_terms_zero_when_distributions_match(spark):
    # identical ref/cmp populations → p == q → every term exactly 0.
    rows = []
    for i in range(20):
        rows.append((i, _ts(i % 50), "a", float(25 + 50 * (i % 3))))
    ev = _events(spark, rows).withColumn("event_id", F.col("user_id"))
    out = eventseq.psi_terms(
        ev, "event_type", "value", split=F.col("event_id") % 2 == 1
    ).collect()
    # ids 0..19: even/odd halves see the same value multiset (i%3 pattern
    # repeats with period 6 → 10 ids each side hit each residue class
    # equally? verify via the operator's own counts instead of assuming)
    for r in out:
        if r.n_ref == r.n_cmp:
            assert r.psi_term == 0.0
        assert r.p_ref > 0 and r.p_cmp > 0  # smoothing keeps terms finite


def test_psi_smoothed_proportions_sum_to_one(spark):
    rows = [(i, _ts(i % 50), "a", float((i * 37) % 500)) for i in range(40)]
    ev = _events(spark, rows).withColumn("event_id", F.col("user_id"))
    out = eventseq.psi_terms(
        ev, "event_type", "value", split=F.col("event_id") % 2 == 1
    ).collect()
    assert abs(sum(r.p_ref for r in out) - 1.0) < 1e-12
    assert abs(sum(r.p_cmp for r in out) - 1.0) < 1e-12


# --- TF-IDF / BM25 --------------------------------------------------------


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join spark"),
            (2, "join stream"),
            (3, "stream stream stream"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_scores_and_ranks(spark):
    out = rank.tfidf_topk(_docs(spark), "doc_id", "text", k=2).collect()
    # N=3; df: spark=1, join=2, stream=2
    exp_spark = round(2 * math.log((3 + 1) / (1 + 1)), 6)  # doc1 'spark' tf=2
    got = {(r.doc_id, r.term): (r.score, r.rank) for r in out}
    assert got[(1, "spark")] == (exp_spark, 1)
    exp_join1 = round(1 * math.log(4 / 3), 6)
    assert got[(1, "join")] == (exp_join1, 2)
    # doc3: only 'stream' (tf=3) — a single row, rank 1
    assert got[(3, "stream")][1] == 1
    assert len([k for k in got if k[0] == 3]) == 1


def test_bm25_matches_reference_formula(spark):
    out = {r.doc_id: r.bm25 for r in rank.bm25(
        _docs(spark), "doc_id", "text", ("spark", "stream"), k1=1.2, b=0.75
    ).collect()}
    # hand BM25: N=3, dl = {1:3, 2:2, 3:3}, avgdl = 8/3
    def score(tf, df, dl):
        idf = math.log(1 + (3 - df + 0.5) / (df + 0.5))
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (8 / 3)))

    assert out[1] == round(score(2, 1, 3), 6)  # spark only
    assert out[3] == round(score(3, 2, 3), 6)  # stream only
    assert out[2] == round(score(1, 2, 2), 6)  # stream only (no spark)
    # docs without any query term are absent
    assert set(out) == {1, 2, 3}


# --- as-of tolerance ------------------------------------------------------


def test_asof_tolerance_boundary(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L")], "k long, lts timestamp, lpay string"
    )
    right = spark.createDataFrame(
        [(1, _ts(4), "old"), (1, _ts(8), "near")],
        "rk long, rts timestamp, rpay string",
    )
    # tolerance 2 min: 'near' (gap 2:00 exactly) matches — inclusive bound
    out = asof_join(
        left, right, "k", "rk", "lts", "rts", tolerance_us=2 * 60 * 1_000_000
    ).collect()
    assert out[0].rpay == "near"
    # tolerance 1 min: best candidate 'near' is too old → NULL (NOT a
    # fallback to 'old' — tolerance nulls, it doesn't re-search)
    out = asof_join(
        left, right, "k", "rk", "lts", "rts", tolerance_us=60 * 1_000_000
    ).collect()
    assert out[0].rpay is None


# --- z-order --------------------------------------------------------------


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 5), (0xFFFF, 0), (1 << 16, 0), (0, 1 << 30)],
        "a long, b long",
    )
    out = [
        r.z
        for r in df.select(
            zorder.zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    # a → even bit positions, b → odd
    assert out[0] == 1
    assert out[1] == 2
    # a=3 (bits 0,1 → positions 0,2), b=5 (bits 0,2 → positions 1,5)
    assert out[2] == 0b100111
    assert out[3] == 0x55555555
    # beyond 16 bits: bit 16 of a lands at even position 32 (no silent
    # truncation below 2^31), bit 30 of b at odd position 61 — still a
    # non-negative BIGINT so signed ordering is Morton ordering
    assert out[4] == 1 << 32
    assert out[5] == 1 << 61


def test_zorder_sql_matches_column_expr(spark):
    df = spark.createDataFrame([(i, i * 7 % 97) for i in range(200)], "a long, b long")
    df.createOrReplaceTempView("zt")
    via_sql = spark.sql(
        f"SELECT {zorder.zorder_sql('a', 'b')} AS z FROM zt ORDER BY a"
    ).collect()
    via_col = (
        df.orderBy("a")
        .select(zorder.zorder_key(F.col("a"), F.col("b")).alias("z"))
        .collect()
    )
    assert [r.z for r in via_sql] == [r.z for r in via_col]


def test_layout_by_zorder_clusters_ranges(spark):
    df = spark.createDataFrame(
        [(i % 64, (i * 31) % 64) for i in range(512)], "a long, b long"
    )
    parts = (
        zorder.layout_by_zorder(df, "a", "b", n_files=4)
        .withColumn("z", zorder.zorder_key(F.col("a"), F.col("b")))
        .withColumn("pid", F.spark_partition_id())
    )
    rows = parts.select("pid", "z").collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.z)
    # Range partitioning: per-partition z ranges must not overlap.
    spans = sorted((min(v), max(v)) for v in by_pid.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_unigram_xent_hand_computed(spark):
    # corpus: "a a b" + "b" → counts a=2, b=2, T=4; p(a)=p(b)=0.5
    docs = spark.createDataFrame([(1, "a a b"), (2, "b")], "doc_id long, text string")
    out = {r.doc_id: (r.n_toks, r.xent) for r in rank.unigram_xent(
        docs, "doc_id", "text"
    ).collect()}
    ln2 = round(math.log(2), 6)  # -ln(0.5) per token, every token p=0.5
    assert out[1] == (3, ln2)
    assert out[2] == (1, ln2)


def test_time_to_convert_percentiles(spark):
    base = dt.datetime(2024, 1, 1)  # a Monday → its own cohort week
    rows = []
    # users 1..5 sign up at base, convert after 10,20,30,40,100 seconds
    for u, gap in zip((1, 2, 3, 4, 5), (10, 20, 30, 40, 100)):
        rows.append((u, base, "signup", 0.0))
        rows.append((u, base + dt.timedelta(seconds=gap), "purchase", 0.0))
    # user 6 purchases BEFORE signing up — excluded
    rows.append((6, base + dt.timedelta(seconds=5), "signup", 0.0))
    rows.append((6, base, "purchase", 0.0))
    ev = _events(spark, rows)
    out = eventseq.time_to_convert(
        ev, "user_id", "ts", "event_type", "signup", "purchase"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cohort_week == base and r.n_converted == 5
    assert r.median_s == 30.0
    # p90 over [10,20,30,40,100]: idx 0.9*4=3.6 → 40 + 0.6*60 = 76
    assert r.p90_s == 76.0


def test_class_centroids_hand_computed(spark):
    from popelines_spark.llm.similarity import class_centroids

    emb = spark.createDataFrame(
        [
            (1, 0, [1.0, 2.0]),
            (2, 0, [3.0, 6.0]),
            (3, 1, [10.0, 20.0]),
        ],
        "vec_id long, label int, embedding array<float>",
    )
    out = {
        (r.label, r.pos): (r.n_vecs, r.mean_val)
        for r in class_centroids(emb, "label", "vec_id", "embedding").collect()
    }
    assert out == {
        (0, 0): (2, 2.0),
        (0, 1): (2, 4.0),
        (1, 0): (1, 10.0),
        (1, 1): (1, 20.0),
    }


def test_zscore_zero_variance_group_emits_nothing(spark):
    """Regression: one-pass variance lands an ulp below zero for constant
    and single-row groups; sqrt(neg)=NaN and Spark's NaN-high ordering
    would flag EVERY row. Guarded var>0 must emit zero outliers."""
    rows = [(1, _ts(i), "const", 719.2) for i in range(5)] + [
        (2, _ts(0), "single", 42.37)
    ]
    ev = _events(spark, rows)
    out = eventseq.zscore_outliers(ev, "event_type", "value", threshold=2.5)
    assert out.count() == 0


def test_time_rollup_rejects_bad_grains(spark):
    import pytest

    ev = _events(spark, [(1, _ts(0), "view", 1.0)])
    with pytest.raises(ValueError, match="fine→coarse"):
        eventseq.time_rollup(ev, "ts", "value", grains=("day", "hour"))
    with pytest.raises(ValueError, match="unknown grain"):
        eventseq.time_rollup(ev, "ts", "value", grains=("fortnight",))


# --- z-order property: the key is a true bijective interleave ------------


def _deinterleave(z):
    a = b = 0
    for i in range(62):
        bit = (z >> i) & 1
        if i % 2 == 0:
            a |= bit << (i // 2)
        else:
            b |= bit << (i // 2)
    return a, b


def test_zorder_key_bijective_on_31_bits(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pairs = []

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=(1 << 31) - 1),
        st.integers(min_value=0, max_value=(1 << 31) - 1),
    )
    def collect(a, b):
        pairs.append((a, b))

    collect()
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", zorder.zorder_key(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in rows:
        assert r.z >= 0  # sign bit untouched → signed order = Morton order
        assert _deinterleave(r.z) == (r.a, r.b)


def test_ab_test_hand_computed_z(spark):
    # arm a (even ids): users 2,4 both convert; arm b (odd): 1 of 3 converts
    rows = []
    for u, conv in ((1, True), (2, True), (3, False), (4, True), (5, False)):
        rows.append((u, _ts(0), "signup", 0.0))
        if conv:
            rows.append((u, _ts(1), "purchase", 0.0))
    ev = _events(spark, rows)
    out = eventseq.ab_test(
        ev, "user_id", "event_type", "purchase", variant=F.col("user_id") % 2 == 1
    ).collect()[0]
    assert (out.n_a, out.n_b, out.conv_a, out.conv_b) == (2, 3, 2, 1)
    assert out.p_a == 1.0 and abs(out.p_b - 1 / 3) < 1e-15
    pool = 3 / 5
    z = (1.0 - 1 / 3) / math.sqrt(pool * (1 - pool) * (1 / 2 + 1 / 3))
    assert out.z == round(z, 6)


def test_ab_test_degenerate_pool_gives_null_z(spark):
    rows = [(u, _ts(0), "signup", 0.0) for u in (1, 2, 3, 4)]  # nobody converts
    ev = _events(spark, rows)
    out = eventseq.ab_test(
        ev, "user_id", "event_type", "purchase", variant=F.col("user_id") % 2 == 1
    ).collect()[0]
    assert out.z is None and out.conv_a == 0 and out.conv_b == 0
