"""Hand-verifiable properties for the round-6 operator batch — the unit
complement of the DuckDB parity gate (which checks engine equivalence, not
statistical sanity)."""

import datetime as dt

from pyspark.sql import functions as F


def test_basket_lift_independent_items_near_one(spark):
    """Two items in every basket → pair count = item counts = n_orders →
    support = confidence = lift = 1 exactly. A third item in half the
    baskets lifts with the others at exactly 1 as well (independence in
    this degenerate design); the formula must reproduce these closed
    forms."""
    # build via the registered callable's internals is overkill here —
    # replicate the metric on a tiny frame through SQL-equivalent ops
    rows = []
    for ok in range(10):
        rows += [(ok, 1), (ok, 2)]
        if ok % 2 == 0:
            rows.append((ok, 3))
    li = spark.createDataFrame(rows, "ok INT, pk INT").distinct()
    n = li.select("ok").distinct().count()
    ic = {r.pk: r.n for r in li.groupBy("pk").agg(F.count("*").alias("n")).collect()}
    b = li.select(F.col("ok"), F.col("pk").alias("pk2"))
    pairs = (
        li.join(b, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .groupBy("pk", "pk2")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    got = {(r.pk, r.pk2): r.c * n / (ic[r.pk] * ic[r.pk2]) for r in pairs}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 1.0 and got[(2, 3)] == 1.0


def test_cusum_flags_step_change(spark):
    """A flat revenue series with one step up must put the maximum
    |n·cum − t·total| deviation exactly at the step day (the CUSUM path
    bends there)."""
    days = [dt.date(2024, 1, d + 1) for d in range(20)]
    df = spark.createDataFrame(
        [(d, 100.0 if i < 10 else 200.0) for i, d in enumerate(days)],
        "l_shipdate DATE, l_extendedprice DOUBLE",
    )
    # test the math inline with the registered query's exact expressions
    d = df.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).alias("rev")
    )
    d2 = d.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    c = (
        d.join(F.broadcast(d2), F.col("day2") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.sum("rev2").cast("decimal(20,4)").alias("cum"),
            F.count("*").cast("decimal(10,0)").alias("t"),
        )
    )
    g = d.agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        F.sum("rev").cast("decimal(20,4)").alias("total"),
    )
    dev = F.col("n") * F.col("cum") - F.col("t") * F.col("total")
    top = (
        c.crossJoin(F.broadcast(g))
        .select("day", F.abs(dev).alias("a"))
        .orderBy(F.col("a").desc(), "day")
        .limit(1)
        .collect()[0]
    )
    assert top.day == days[9]  # last flat day = the CUSUM extremum


def test_smape_zero_on_perfect_weekly_repeat(spark):
    """A series that exactly repeats every 7 days has sMAPE 0 under the
    seasonal-naive forecast."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(28):
        for _ in range((day % 7) + 1):  # weekly-periodic daily counts
            rows.append(("t", base + dt.timedelta(days=day)))
    ev = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    f = d.select(
        F.col("event_type"),
        (F.col("day") + F.expr("INTERVAL 7 DAY")).alias("day"),
        F.col("n").alias("fc"),
    )
    j = d.withColumnRenamed("n", "actual").join(f, ["event_type", "day"])
    term = 2.0 * F.abs(F.col("actual") - F.col("fc")) / (
        F.col("actual") + F.col("fc")
    )
    got = j.agg(F.sum(term)).collect()[0][0]
    assert got == 0.0
    assert j.count() == 21  # 28 days − 7 without a lag


def test_late_arrival_zero_when_ts_follows_id(spark):
    """Events whose ts strictly increases with event_id per user have no
    out-of-order arrivals; reversing the id order flips every non-first
    row."""
    from pyspark.sql.window import Window as W

    base = dt.datetime(2024, 1, 1)
    rows = [
        (uid * 100 + i, uid, base + dt.timedelta(minutes=i))
        for uid in range(3)
        for i in range(5)
    ]
    ev = spark.createDataFrame(rows, "event_id LONG, user_id LONG, ts TIMESTAMP")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ooo = ev.select(
        (F.col("ts") < F.max("ts").over(w)).cast("int").alias("o")
    ).agg(F.sum(F.coalesce("o", F.lit(0)))).collect()[0][0]
    assert ooo == 0
    rev = ev.withColumn("event_id", -F.col("event_id"))
    ooo_rev = rev.select(
        (F.col("ts") < F.max("ts").over(w)).cast("int").alias("o")
    ).agg(F.sum(F.coalesce("o", F.lit(0)))).collect()[0][0]
    assert ooo_rev == 3 * 4  # every non-first row per user


def test_zipf_staircase_rank_matches_row_number(spark):
    """The broadcast ≤-staircase rank must equal the window row_number it
    replaces (ties broken by token) — checked on a frequency table with
    deliberate ties."""
    freq = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 3), ("d", 3), ("e", 1)], "token STRING, f INT"
    )
    b2 = freq.select(F.col("token").alias("t2"), F.col("f").alias("f2"))
    ranked = {
        r.token: r.r
        for r in freq.join(
            F.broadcast(b2),
            (F.col("f2") > F.col("f"))
            | ((F.col("f2") == F.col("f")) & (F.col("t2") <= F.col("token"))),
        )
        .groupBy("token")
        .agg(F.count("*").alias("r"))
        .collect()
    }
    assert ranked == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}


def test_jaccard_topk_df_cap_drops_ubiquitous_shingles(spark):
    """A shingle present in every document must not create candidate
    pairs once the df cap applies; docs sharing only rare shingles
    still match. (Cap = max(20, 1%) — with 30 docs the floor 20 governs,
    so the ubiquitous shingle df=30 is dropped, rare df=2 kept.)"""
    docs = []
    for i in range(30):
        # all docs share 'COMMON'; docs 0 and 1 also share 'RAREXY'
        extra = " RAREXY" if i < 2 else f" uniq{i:02d}"
        docs.append((i, "COMMON" + extra, len("COMMON" + extra)))
    d = spark.createDataFrame(docs, "doc_id LONG, text STRING, n_chars LONG")
    sh0 = d.selectExpr(
        "doc_id",
        "explode(transform(sequence(1, length(text) - 4),"
        " i -> substring(text, i, 5))) AS g",
    ).distinct()
    nd = d.agg(F.count("*").alias("n_docs"))
    rare = (
        sh0.groupBy("g")
        .agg(F.count("*").alias("__df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("__df") <= F.greatest(F.lit(20), F.col("n_docs") / 100))
        .select("g")
    )
    sh = sh0.join(rare, "g")
    # shingles of COMMON itself (df=30 > 20) must be gone
    kept = {r.g for r in sh.select("g").distinct().collect()}
    assert "COMMO" not in kept and "OMMON" not in kept
    p = sh.filter(F.col("doc_id") == 0).select("g")
    c = sh.select(F.col("doc_id").alias("nb"), "g")
    cands = {
        r.nb
        for r in p.join(c, "g").filter(F.col("nb") != 0).select("nb").collect()
    }
    assert cands == {1}  # only the rare-shingle partner survives
