"""io.py: write_to_bq-equivalent semantics (popelines/main.py:100-166)."""

import os

import pytest
from pyspark.sql import functions as F

from popelines_spark import io as pio
from popelines_spark.sources import rest


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_normalize_table_name():
    assert pio.normalize_table_name("My-Table") == "my_table"  # main.py:109
    assert pio.normalize_table_name("UPPER-case-X") == "upper_case_x"


def test_ndjson_roundtrip(spark, scratch):
    df = _df(spark, [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double")
    pio.write_ndjson(df, f"{scratch}/nd")
    back = pio.read_ndjson(spark, f"{scratch}/nd", schema="id long, s string, v double")
    assert sorted(back.collect()) == sorted(df.collect())


def test_read_ndjson_explicit_schema_drops_unknown(spark, scratch):
    # ignore_unknown_values load path (main.py:141-142)
    with open(f"{scratch}/x.ndjson", "w") as f:
        f.write('{"id": 1, "known": "k", "unknown": 99}\n')
    back = pio.read_ndjson(spark, f"{scratch}/x.ndjson", schema="id long, known string")
    assert back.columns == ["id", "known"]
    assert back.collect()[0].known == "k"


def test_append_evolution_null_fills(spark, scratch):
    v1 = _df(spark, [(1, "a")], "id long, name string")
    v2 = _df(spark, [(2, "b", 9.5)], "id long, name string, extra double")
    pio.write_table(v1, scratch, "t", append=False)
    pio.write_table(v2, scratch, "t", append=True)
    back = pio.read_table_evolved(spark, scratch, "t")
    rows = {r.id: r for r in back.collect()}
    assert rows[1].extra is None and rows[2].extra == 9.5


def test_append_evolution_nested_add(spark, scratch):
    v1 = spark.read.json(spark.sparkContext.parallelize(
        ['{"id": 1, "meta": {"x": 1}}']))
    v2 = spark.read.json(spark.sparkContext.parallelize(
        ['{"id": 2, "meta": {"x": 2, "y": "new"}}']))
    pio.write_table(v1, scratch, "t", append=False)
    pio.write_table(v2, scratch, "t", append=True)
    back = pio.read_table_evolved(spark, scratch, "t")
    rows = {r.id: r for r in back.collect()}
    assert rows[1].meta.x == 1 and rows[1].meta.asDict().get("y") is None
    assert rows[2].meta.y == "new"


def test_ignore_unknown_values_drops_new_columns(spark, scratch):
    v1 = _df(spark, [(1, "a")], "id long, name string")
    v2 = _df(spark, [(2, "b", 9.5)], "id long, name string, extra double")
    pio.write_table(v1, scratch, "t", append=False)
    pio.write_table(v2, scratch, "t", append=True, ignore_unknown_values=True)
    back = pio.read_table_evolved(spark, scratch, "t")
    assert set(back.columns) == {"id", "name"}


def test_overwrite_truncates(spark, scratch):
    a = _df(spark, [(1,)], "id long")
    b = _df(spark, [(2,)], "id long")
    pio.write_table(a, scratch, "t", append=False)
    pio.write_table(b, scratch, "t", append=False)
    assert [r.id for r in pio.read_table(spark, scratch, "t").collect()] == [2]


def test_put_object_local(spark, scratch):
    src = f"{scratch}/src.txt"
    with open(src, "w") as f:
        f.write("payload")
    pio.put_object(spark, src, f"{scratch}/store/dest.txt")
    assert open(f"{scratch}/store/dest.txt").read() == "payload"


def test_fetch_json_file_url_and_parse_failure(scratch, caplog):
    import json as _json

    good = f"{scratch}/good.json"
    with open(good, "w") as f:
        _json.dump({"ok": 1}, f)
    assert rest.fetch_json(f"file://{good}") == {"ok": 1}
    bad = f"{scratch}/bad.json"
    with open(bad, "w") as f:
        f.write("not json {")
    # logged fallthrough, returns None (main.py:205-206)
    assert rest.fetch_json(f"file://{bad}") is None


def test_append_casts_conflicting_primitive_to_live_type(spark, scratch):
    """ADVICE r1: a primitive column whose type conflicts with the live
    schema must be cast to the live type at write time — never appended
    un-cast (which poisons the table for mergeSchema reads)."""
    wh = f"{scratch}/wh_cast"
    pio.write_table(
        _df(spark, [(1, "s1")], "id long, tag string"), wh, "t", append=True
    )
    # second append carries tag as LONG: live type (string) must win
    pio.write_table(
        _df(spark, [(2, 7)], "id long, tag long"), wh, "t", append=True
    )
    back = pio.read_table_evolved(spark, wh, "t")
    assert dict(back.dtypes)["tag"] == "string"
    assert {r.tag for r in back.collect()} == {"s1", "7"}


def test_compact_table_shrinks_files_preserves_rows(spark, scratch):
    df = spark.range(0, 10000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(f"{scratch}/wh_c/t")
    before, after = pio.compact_table(
        spark, f"{scratch}/wh_c", "t", target_file_bytes=1 << 30
    )
    assert before >= 40 and after == 1
    back = spark.read.parquet(f"{scratch}/wh_c/t")
    assert back.count() == 10000
    assert back.selectExpr("sum(v)").collect()[0][0] == df.selectExpr(
        "sum(v)"
    ).collect()[0][0]


def test_ntz_columns_cast_to_session_tz(spark):
    """tables._ntz_to_ltz: TIMESTAMP_NTZ columns become session-tz (UTC)
    timestamps with identical wall-clock values — the defensive twin of the
    session's inferTimestampNTZ=false (testdata switched encodings once
    already; the loader must absorb either)."""
    import datetime as dt

    from popelines_spark.tables import _ntz_to_ltz

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 12, 30, 45))], "id long, ts timestamp_ntz"
    )
    out = _ntz_to_ltz(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.collect()[0].ts == dt.datetime(2024, 3, 1, 12, 30, 45)
    # idempotent on already-LTZ frames (no-op, same plan object)
    assert _ntz_to_ltz(out) is out


def test_put_object_file_scheme_uri(spark, scratch):
    """put_object routes EVERY scheme through the Hadoop FS API (VERDICT r4
    gap #1); an explicit file: URI exercises the identical call sequence an
    s3a://gs:// destination would take."""
    src = f"{scratch}/src2.txt"
    with open(src, "w") as f:
        f.write("remote-path payload")
    pio.put_object(spark, src, f"file:{scratch}/store2/deep/dest.txt")
    assert open(f"{scratch}/store2/deep/dest.txt").read() == "remote-path payload"


def test_compact_table_file_scheme_uri(spark, scratch):
    """compact_table's list/rename/delete dance runs on the Hadoop FS API —
    a file:-scheme warehouse proves the remote code path end-to-end."""
    df = spark.range(0, 5000).selectExpr("id", "id * 3 AS v")
    df.repartition(16).write.parquet(f"{scratch}/wh_h/t")
    before, after = pio.compact_table(
        spark, f"file:{scratch}/wh_h", "t", target_file_bytes=1 << 30
    )
    assert before >= 16 and after == 1
    back = spark.read.parquet(f"{scratch}/wh_h/t")
    assert back.count() == 5000
    assert back.selectExpr("sum(v)").collect()[0][0] == 5000 * 4999 * 3 // 2
    # backup/staging dirs are gone
    import os as _os
    assert not _os.path.exists(f"{scratch}/wh_h/t.__old")
    assert not _os.path.exists(f"{scratch}/wh_h/t.__compacting")


def test_analyze_table_stats_roundtrip(spark, scratch):
    """analyze_table writes _stats.json beside the table (underscore
    prefix = invisible to parquet scans), read_table_stats round-trips
    it, and the numbers are right."""
    from popelines_spark import io

    df = spark.range(500).selectExpr(
        "id", "id % 7 AS k", "CAST(NULL AS STRING) AS s"
    )
    io.write_table(df, scratch, "stats_t", append=False)
    st = io.analyze_table(spark, scratch, "stats_t")
    assert st["rows"] == 500
    assert st["columns"]["k"]["min"] == "0"
    assert st["columns"]["k"]["max"] == "6"
    assert st["columns"]["s"]["nulls"] == 500
    assert 6 <= st["columns"]["k"]["approx_ndv"] <= 8
    assert st["suggest_broadcast"] is True  # tiny table
    assert io.read_table_stats(spark, scratch, "stats_t") == st
    # the stats file must not leak into table reads
    assert io.read_table_evolved(spark, scratch, "stats_t").count() == 500
    # absent stats -> None
    io.write_table(df, scratch, "stats_u", append=False)
    assert io.read_table_stats(spark, scratch, "stats_u") is None


def test_read_table_auto_handles_snapshot_layout(spark, scratch):
    """Spark hides _-prefixed dirs, so a root read of the snapshot
    layout sees nothing — read_table_auto must route to the committed
    tip instead of crashing (review r11)."""
    df = _df(spark, [(1, "a"), (2, "b")], "id long, s string")
    pio.write_table_snapshot(spark, scratch, "snap", df)
    assert pio.is_snapshot_table(spark, scratch, "snap")
    assert pio.read_table_auto(spark, scratch, "snap").count() == 2
    # analyze_table profiles the tip through the same detection
    st = pio.analyze_table(spark, scratch, "snap")
    assert st["rows"] == 2


def test_compact_snapshot_retracts_when_append_raced(spark, scratch,
                                                     monkeypatch):
    """An append committing between the compaction's tip read and its
    commit must NOT be shadowed by the compacted pre-append rewrite:
    the compaction retracts its own version and raises (review r11)."""
    df = _df(spark, [(1, "a"), (2, "b")], "id long, s string")
    pio.write_table_snapshot(spark, scratch, "cr", df)
    real = pio.write_table_snapshot
    hit = []

    def racy(spark_, wh, name, frame, n_files=None):
        if not hit:  # the racing append sneaks in before OUR commit
            hit.append(1)
            real(spark_, wh, name,
                 _df(spark_, [(3, "c")], "id long, s string")
                 .unionByName(pio.read_table_snapshot(spark_, wh, name)))
        return real(spark_, wh, name, frame, n_files=n_files)

    monkeypatch.setattr(pio, "write_table_snapshot", racy)
    with pytest.raises(pio.ConcurrentSnapshotWriteError):
        pio.compact_table_snapshot(spark, scratch, "cr")
    # the appended row survives at the tip; the torn compact is gone
    assert pio.read_table_snapshot(spark, scratch, "cr").count() == 3


def test_stats_fold_loser_marks_stale_not_races(spark, scratch):
    """A concurrent fold (fresh lock held) must not read-modify-write
    over the holder: the loser marks stats stale and bows out."""
    df = _df(spark, [(1, "a"), (2, "b")], "id long, s string")
    pio.write_table(df, scratch, "st", append=False)
    pio.analyze_table(spark, scratch, "st")
    lock = f"{pio.table_path(scratch, 'st')}/_stats.json.__lock"
    open(lock, "w").close()  # fresh: a live holder
    out = pio.update_stats_increment(
        spark, scratch, "st", _df(spark, [(3, "c")], "id long, s string")
    )
    assert out is None
    assert pio.read_table_stats(spark, scratch, "st").get("stale") is True
    os.remove(lock)
    # an over-age lock (dead holder) is broken and the fold proceeds
    pio.analyze_table(spark, scratch, "st")
    open(lock, "w").close()
    import time as _t

    past = _t.time() - 3600
    os.utime(lock, (past, past))
    out2 = pio.update_stats_increment(
        spark, scratch, "st", _df(spark, [(3, "c")], "id long, s string")
    )
    assert out2 is not None and out2["rows"] == 3
    assert not os.path.exists(lock)


def test_append_evolved_column_survives_ignore_unknown(spark, scratch):
    """The live schema for append evolution must be the MERGED schema:
    a one-footer sample can predate an evolved column, and
    ignore_unknown_values would then silently drop it (review r11)."""
    pio.write_table(_df(spark, [(1, "a")], "id long, s string"),
                    scratch, "ev2", append=False)
    pio.write_table(_df(spark, [(2, "b", 9)], "id long, s string, x long"),
                    scratch, "ev2", append=True)
    pio.write_table(_df(spark, [(3, "c", 7)], "id long, s string, x long"),
                    scratch, "ev2", append=True, ignore_unknown_values=True)
    got = pio.read_table_evolved(spark, scratch, "ev2")
    assert got.where("id = 3").select("x").collect()[0][0] == 7


def test_align_nested_struct_by_name_not_position(spark, scratch):
    """Struct alignment is BY NAME: reordered subfields must not swap
    values, a missing subfield NULL-fills instead of crashing, and a
    NULL struct row stays NULL (review r11)."""
    pio.write_table(
        spark.createDataFrame(
            [(1, {"a": "A1", "b": "B1"})],
            "id long, meta struct<a string, b string>",
        ),
        scratch, "nst", append=False,
    )
    # batch 1: same subfields, swapped declaration order
    pio.write_table(
        spark.createDataFrame(
            [(2, {"b": "B2", "a": "A2"})],
            "id long, meta struct<b string, a string>",
        ),
        scratch, "nst", append=True,
    )
    # batch 2: missing subfield b + a NULL struct row
    pio.write_table(
        spark.createDataFrame(
            [(3, {"a": "A3"}), (4, None)],
            "id long, meta struct<a string>",
        ),
        scratch, "nst", append=True,
    )
    got = {
        r["id"]: (r["meta"]["a"] if r["meta"] else None,
                  r["meta"]["b"] if r["meta"] else None)
        for r in pio.read_table_evolved(spark, scratch, "nst").collect()
    }
    assert got == {1: ("A1", "B1"), 2: ("A2", "B2"),
                   3: ("A3", None), 4: (None, None)}


def test_align_array_of_struct_elements(spark, scratch):
    """Array element structs align recursively too."""
    pio.write_table(
        spark.createDataFrame(
            [(1, [{"x": 1, "y": 2}])],
            "id long, pts array<struct<x long, y long>>",
        ),
        scratch, "ast", append=False,
    )
    pio.write_table(
        spark.createDataFrame(
            [(2, [{"y": 20, "x": 10}])],
            "id long, pts array<struct<y long, x long>>",
        ),
        scratch, "ast", append=True,
    )
    got = {
        r["id"]: [(e["x"], e["y"]) for e in r["pts"]]
        for r in pio.read_table_evolved(spark, scratch, "ast").collect()
    }
    assert got == {1: [(1, 2)], 2: [(10, 20)]}


def test_map_key_cast_lossy_raises_descriptive(spark, scratch):
    """Review r12: a lossy map-KEY cast ('1' and '01' both → int 1, or a
    non-numeric key → NULL) must fail with a message naming the align
    step and the type pair — not Spark's bare duplicate-map-key error at
    write time. A lossless key cast still appends fine."""
    live = spark.createDataFrame([(1, {1: 10})], "id long, m map<int,long>")
    pio.write_table(live, scratch, "mk", append=False)
    good = spark.createDataFrame(
        [(2, {"7": 70})], "id long, m map<string,long>"
    )
    pio.write_table(good, scratch, "mk", append=True)
    assert pio.read_table_evolved(spark, scratch, "mk").count() == 2

    bad = spark.createDataFrame(
        [(3, {"1": 1, "01": 2})], "id long, m map<string,long>"
    )
    with pytest.raises(Exception, match="casting map keys"):
        pio.write_table(bad, scratch, "mk", append=True)

    nullkey = spark.createDataFrame(
        [(4, {"not-a-number": 5})], "id long, m map<string,long>"
    )
    with pytest.raises(Exception, match="casting map keys"):
        pio.write_table(nullkey, scratch, "mk", append=True)


def test_lossless_key_casts_skip_probe_and_append_fine(spark, scratch):
    """Review r12: statically injective+total key casts (int widening,
    integral→string, float→double) bypass the per-row validation probe —
    pin the predicate and that such appends still work end-to-end."""
    from pyspark.sql import types as T

    from popelines_spark.io import _lossless_cast

    assert _lossless_cast(T.IntegerType(), T.LongType())
    assert _lossless_cast(T.ByteType(), T.ShortType())
    assert _lossless_cast(T.IntegerType(), T.StringType())
    assert _lossless_cast(T.BooleanType(), T.StringType())
    assert _lossless_cast(T.FloatType(), T.DoubleType())
    # lossy or unprovable: keep the probe
    assert not _lossless_cast(T.LongType(), T.IntegerType())
    assert not _lossless_cast(T.StringType(), T.IntegerType())
    assert not _lossless_cast(T.DoubleType(), T.FloatType())
    assert not _lossless_cast(T.DoubleType(), T.StringType())

    live = spark.createDataFrame([(1, {7: 70})], "id long, m map<long,long>")
    pio.write_table(live, scratch, "mkl", append=False)
    batch = spark.createDataFrame([(2, {8: 80})], "id long, m map<int,long>")
    pio.write_table(batch, scratch, "mkl", append=True)
    got = {
        r["id"]: r["m"]
        for r in pio.read_table_evolved(spark, scratch, "mkl").collect()
    }
    assert got == {1: {7: 70}, 2: {8: 80}}


def test_snapshot_default_output_is_rebalance_sized(spark, scratch):
    """r13 guide §6: write_table_snapshot's default path sizes output by
    bytes (REBALANCE) instead of carrying the input partitioning — a
    16-partition small frame lands as few files; explicit n_files wins;
    append_table_snapshot reads back the exact union."""
    import glob

    from pyspark.sql import functions as F

    wide = spark.range(50_000).repartition(16).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    pio.write_table_snapshot(spark, scratch, "szd", wide)
    v1 = glob.glob(f"{scratch}/szd/_versions/v*/*.parquet")
    assert 1 <= len(v1) <= 2, f"expected coalesced output, got {len(v1)}"
    pio.append_table_snapshot(
        spark, scratch, "szd", spark.range(50_000, 50_100).select(
            F.col("id"), (F.col("id") % 7).alias("g")
        )
    )
    assert pio.read_table_snapshot(spark, scratch, "szd").count() == 50_100
    pio.write_table_snapshot(spark, scratch, "szd2", wide, n_files=3)
    assert len(glob.glob(f"{scratch}/szd2/_versions/v*/*.parquet")) == 3
