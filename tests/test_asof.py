"""asof_join semantics: backward match, strict mode, inner mode, ties."""

import datetime as dt

from popelines_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2020, 1, 1, 0, m)


def test_backward_latest_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "k", _ts(5)), (3, "other", _ts(10))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts(4), "r4"), ("k", _ts(9), "r9"), ("k", _ts(11), "r11")],
        "rk string, rts timestamp, tag string",
    )
    out = {r.lid: r.tag for r in asof_join(
        left, right, "k", "rk", "ts", "rts").collect()}
    assert out == {1: "r9", 2: "r4", 3: None}


def test_inclusive_vs_strict(spark):
    left = spark.createDataFrame([(1, "k", _ts(5))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(5), "same"), ("k", _ts(3), "older")],
        "rk string, rts timestamp, tag string",
    )
    inc = asof_join(left, right, "k", "rk", "ts", "rts").collect()[0]
    assert inc.tag == "same"  # <= matches equal ts (DuckDB ASOF parity)
    strict = asof_join(left, right, "k", "rk", "ts", "rts", strict=True).collect()[0]
    assert strict.tag == "older"


def test_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "nomatch", _ts(10))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts(1), "r")], "rk string, rts timestamp, tag string"
    )
    out = asof_join(left, right, "k", "rk", "ts", "rts", how="inner").collect()
    assert [r.lid for r in out] == [1]


def test_asof_matches_bruteforce_on_random_inputs(spark):
    """Property check: the union+window as-of join must equal the
    quadratic reference semantics (greatest right_ts <= left_ts per key)
    on adversarial inputs — duplicate timestamps, keys with no matches,
    right rows after every left row, multi-row keys."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(4):
        keys = ["a", "b", "c", "d"]
        left = [
            (i, rng.choice(keys), _ts(rng.randrange(0, 30)))
            for i in range(25)
        ]
        right = [
            (rng.choice(keys), _ts(rng.randrange(0, 30)), f"r{j}")
            for j in range(25)
        ]
        ldf = spark.createDataFrame(left, "lid long, k string, ts timestamp")
        rdf = spark.createDataFrame(right, "rk string, rts timestamp, tag string")
        got = {
            r.lid: r.rts
            for r in asof_join(ldf, rdf, "k", "rk", "ts", "rts").collect()
        }
        want = {}
        for lid, k, ts in left:
            cands = [rts for (rk, rts, _) in right if rk == k and rts <= ts]
            want[lid] = max(cands) if cands else None
        assert got == want, f"trial {trial}"


def test_asof_forward_picks_earliest_at_or_after(spark):
    import datetime as dt

    from popelines_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "L"), (1, t(50), "L2")], "k long, lts timestamp, lpay string"
    )
    right = spark.createDataFrame(
        [(1, t(5), "past"), (1, t(10), "now"), (1, t(20), "soon"), (1, t(30), "later")],
        "rk long, rts timestamp, rpay string",
    )
    out = {r.lpay: r.rpay for r in asof_join(
        left, right, "k", "rk", "lts", "rts", direction="forward"
    ).collect()}
    assert out == {"L": "now", "L2": None}  # inclusive >=; nothing after t50
    # strict: rts > lts skips the equal-ts row
    out = {r.lpay: r.rpay for r in asof_join(
        left, right, "k", "rk", "lts", "rts", direction="forward", strict=True
    ).collect()}
    assert out["L"] == "soon"
    # forward tolerance: within 10 min keeps 'soon' for L at t10? gap=10min
    out = {r.lpay: r.rpay for r in asof_join(
        left, right, "k", "rk", "lts", "rts", direction="forward", strict=True,
        tolerance_us=10 * 60 * 1_000_000,
    ).collect()}
    assert out["L"] == "soon"
    out = {r.lpay: r.rpay for r in asof_join(
        left, right, "k", "rk", "lts", "rts", direction="forward", strict=True,
        tolerance_us=9 * 60 * 1_000_000,
    ).collect()}
    assert out["L"] is None


def test_asof_null_left_ts_never_matches(spark):
    """SQL NULL semantics: a left row with NULL ts can satisfy neither
    right_ts <= NULL nor right_ts >= NULL, so it must come back unmatched in
    BOTH directions (ADVICE r4: plain desc ordering put NULL-ts left rows
    after every right row in forward mode, handing them a spurious match)."""
    import datetime as dt

    from popelines_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "ok"), (2, None, "nullts")], "k long, lts timestamp, lpay string"
    )
    right = spark.createDataFrame(
        [(1, t(5), "r5"), (2, t(5), "r5b"), (2, t(50), "r50")],
        "rk long, rts timestamp, rpay string",
    )
    for direction, ok_expect in (("backward", "r5"), ("forward", None)):
        out = {r.lpay: r.rpay for r in asof_join(
            left, right, "k", "rk", "lts", "rts", direction=direction
        ).collect()}
        assert out["nullts"] is None, direction
        assert out["ok"] == ok_expect, direction
    # inner mode drops the NULL-ts row entirely
    out = asof_join(
        left, right, "k", "rk", "lts", "rts", direction="forward", how="inner"
    ).collect()
    assert [r.lpay for r in out] == []
