"""Round-12 facade review pins (pipeline.py / io.py layout guards).

The path-layout DML facade (write_table, delete_rows, update_rows,
upsert_table, copy_and_replace_keys, compact_table, relayout_table) used
to accept manifest/snapshot tables and silently corrupt them: an
overwrite clobbered committed versions, an autodetect append landed
files no snapshot reader returns, and compact_table would sweep every
version dir into one flat rewrite. Each now refuses with the right
tool's name. Plus: update_rows casts SET expressions back to the
column's declared type (same BigQuery-UPDATE coercion manifest_dml
applies).
"""

import pytest

from popelines_spark import io
from popelines_spark.manifest import append_manifest_table
from popelines_spark.pipeline import Popeline


def _manifest_table(spark, scratch, name):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    append_manifest_table(spark, scratch, name, df)
    return df


def _snapshot_table(spark, scratch, name):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    io.write_table_snapshot(spark, scratch, name, df)
    return df


def test_write_table_refuses_manifest_layout(spark, scratch):
    df = _manifest_table(spark, scratch, "m1")
    with pytest.raises(ValueError, match="append_manifest_table"):
        io.write_table(df, scratch, "m1", append=True)
    with pytest.raises(ValueError, match="manifest"):
        io.write_table(df, scratch, "m1", append=False)


def test_write_table_refuses_snapshot_layout(spark, scratch):
    df = _snapshot_table(spark, scratch, "s1")
    # autodetect=True used to append files NO snapshot reader returns
    with pytest.raises(ValueError, match="append_table_snapshot"):
        io.write_table(df, scratch, "s1", append=True, autodetect=True)
    with pytest.raises(ValueError, match="snapshot"):
        io.write_table(df, scratch, "s1", append=False)


def test_facade_dml_routes_manifest_layout(spark, scratch):
    """Round 13 upgraded the r12 refusal to full routing (the same
    layout-transparency rule write_to_table follows): the facade DML
    trio now delegates to the manifest CoW machinery instead of naming
    it in an error. Non-routed ops (copy_and_replace_keys) still
    refuse loudly."""
    from popelines_spark.manifest import read_manifest_table

    _manifest_table(spark, scratch, "m2")
    p = Popeline(warehouse=scratch, spark=spark)
    assert p.delete_rows("m2", "id = 1") == 1
    assert p.update_rows("m2", {"v": "upper(v)"}, "id = 2") == 1
    rows = {
        (r.id, r.v)
        for r in read_manifest_table(spark, scratch, "m2").collect()
    }
    assert rows == {(2, "B")}
    p.upsert_table(
        "m2",
        spark.createDataFrame([(2, "z"), (3, "c")], "id long, v string"),
        ["id"],
    )
    rows = {
        (r.id, r.v)
        for r in read_manifest_table(spark, scratch, "m2").collect()
    }
    assert rows == {(2, "z"), (3, "c")}
    with pytest.raises(ValueError, match="manifest"):
        p.copy_and_replace_keys("m2", str.upper)


def test_facade_dml_routes_snapshot_layout(spark, scratch):
    """Snapshot-layout DML commits a NEW version; the pre-DML version
    stays time-travel readable."""
    _snapshot_table(spark, scratch, "s2")
    p = Popeline(warehouse=scratch, spark=spark)
    assert p.delete_rows("s2", "id = 1") == 1
    assert p.update_rows("s2", {"v": "upper(v)"}, "id = 2") == 1
    tip = {
        (r.id, r.v)
        for r in io.read_table_snapshot(spark, scratch, "s2").collect()
    }
    assert tip == {(2, "B")}
    # version 1 was the original write; both DML versions stack above it
    v1 = {
        (r.id, r.v)
        for r in io.read_table_snapshot(
            spark, scratch, "s2", version=1
        ).collect()
    }
    assert v1 == {(1, "a"), (2, "b")}


def test_compact_table_refuses_snapshot_layout(spark, scratch):
    _snapshot_table(spark, scratch, "s3")
    # used to flat-rewrite every version dir, destroying the layout
    with pytest.raises(ValueError, match="compact_table_snapshot"):
        io.compact_table(spark, scratch, "s3")


def test_relayout_table_refuses_snapshot_layout(spark, scratch):
    _snapshot_table(spark, scratch, "s4")
    p = Popeline(warehouse=scratch, spark=spark)
    with pytest.raises(ValueError, match="snapshot"):
        p.relayout_table("s4", ["id"])


def test_path_table_writes_still_work(spark, scratch):
    """The guard must not tax the plain layout: append + overwrite on a
    path table are unchanged."""
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    io.write_table(df, scratch, "p1", append=False)
    io.write_table(df, scratch, "p1", append=True)
    assert io.read_table_evolved(spark, scratch, "p1").count() == 2


def test_update_rows_casts_set_expressions_to_declared_type(spark, scratch):
    """'cnt/2' on a LONG column returns DOUBLE in Spark SQL; the UPDATE
    must coerce back to LONG so the column's at-rest type never drifts
    under readers (mirrors manifest_dml's review-r12 fix)."""
    df = spark.createDataFrame([(1, 10), (2, 11)], "id long, cnt long")
    io.write_table(df, scratch, "u1", append=False)
    p = Popeline(warehouse=scratch, spark=spark)
    n = p.update_rows("u1", {"cnt": "cnt / 2"}, "id = 1")
    assert n == 1
    out = io.read_table_evolved(spark, scratch, "u1")
    assert dict(out.dtypes)["cnt"] == "bigint"
    got = {r["id"]: r["cnt"] for r in out.collect()}
    assert got == {1: 5, 2: 11}


def test_write_to_table_appends_route_by_layout(spark, scratch):
    """The reference's write_to_bq appends regardless of server-side
    storage; the facade append must work on all three layouts."""
    from popelines_spark.manifest import read_manifest_table

    p = Popeline(warehouse=scratch, spark=spark)
    batch = spark.createDataFrame([(3, "c")], "id long, v string")

    _manifest_table(spark, scratch, "wm")
    p.write_to_table("wm", df=batch, append=True)
    assert read_manifest_table(spark, scratch, "wm").count() == 3

    _snapshot_table(spark, scratch, "ws")
    p.write_to_table("ws", df=batch, append=True)
    assert io.read_table_snapshot(spark, scratch, "ws").count() == 3

    p.write_to_table("wp", df=batch, append=True)  # first write, path
    p.write_to_table("wp", df=batch, append=True)
    assert io.read_table_evolved(spark, scratch, "wp").count() == 2


def test_write_to_table_truncate_on_snapshot_is_reader_isolated(spark, scratch):
    """Truncate on a snapshot table = a NEW committed version; a reader
    pinned to the old version still sees the old rows."""
    _snapshot_table(spark, scratch, "wt")  # v1: 2 rows
    p = Popeline(warehouse=scratch, spark=spark)
    p.write_to_table(
        "wt",
        df=spark.createDataFrame([(9, "z")], "id long, v string"),
        append=False,
    )
    assert io.read_table_snapshot(spark, scratch, "wt").count() == 1
    assert io.read_table_snapshot(spark, scratch, "wt", version=1).count() == 2


def test_write_to_table_truncate_on_manifest_refuses(spark, scratch):
    _manifest_table(spark, scratch, "wr")
    p = Popeline(warehouse=scratch, spark=spark)
    with pytest.raises(ValueError, match="delete_manifest_rows"):
        p.write_to_table(
            "wr",
            df=spark.createDataFrame([(9, "z")], "id long, v string"),
            append=False,
        )


def test_write_to_table_versioned_layouts_refuse_path_only_knobs(spark, scratch):
    _manifest_table(spark, scratch, "wk")
    p = Popeline(warehouse=scratch, spark=spark)
    batch = spark.createDataFrame([(3, "c")], "id long, v string")
    with pytest.raises(ValueError, match="partition_by"):
        p.write_to_table("wk", df=batch, append=True, partition_by=["v"])
    with pytest.raises(ValueError, match="update_stats"):
        p.write_to_table("wk", df=batch, append=True, update_stats=True)


def test_write_to_table_batch_id_is_idempotent_on_manifest(spark, scratch):
    """batch_id through the facade: replaying a committed load is a
    no-op (exactly-once for retried ingestion jobs); layouts without a
    commit log refuse the knob."""
    from popelines_spark.manifest import read_manifest_table

    _manifest_table(spark, scratch, "bi")
    p = Popeline(warehouse=scratch, spark=spark)
    batch = spark.createDataFrame([(7, "g")], "id long, v string")
    p.write_to_table("bi", df=batch, append=True, batch_id="load-1")
    p.write_to_table("bi", df=batch, append=True, batch_id="load-1")
    assert read_manifest_table(spark, scratch, "bi").count() == 3

    io.write_table(batch, scratch, "bp", append=False)
    with pytest.raises(ValueError, match="batch_id"):
        p.write_to_table("bp", df=batch, append=True, batch_id="load-1")


def test_vacuum_table_routes_by_layout(spark, scratch):
    """The facade's maintenance vacuum routes like the write path:
    snapshot debris through vacuum_snapshot_debris, manifest orphans
    through cleanup_orphan_files, path tables are a no-op None."""
    import os
    import time

    p = Popeline(warehouse=scratch, spark=spark)

    _snapshot_table(spark, scratch, "vs")
    # fabricate after_flip debris: a committed version's leftover marker
    vdir = os.path.join(scratch, "vs", "_versions")
    marker = os.path.join(vdir, "v00000001.__reserved")
    open(marker, "w").close()
    past = time.time() - 7200
    os.utime(marker, (past, past))
    cleaned = p.vacuum_table("vs")
    assert cleaned["markers"] == [1]

    _manifest_table(spark, scratch, "vm")
    assert p.vacuum_table("vm") == 0  # no orphans on a healthy table

    io.write_table(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        scratch, "vp", append=False,
    )
    assert p.vacuum_table("vp") is None


def test_delete_rows_null_predicate_rows_survive(spark, scratch):
    """SQL DELETE semantics through the audited-checkpoint path: rows
    where the predicate is NULL survive, and the deleted count is
    exact."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 3)], "id long, cnt long"
    )
    io.write_table(df, scratch, "d1", append=False)
    p = Popeline(warehouse=scratch, spark=spark)
    n = p.delete_rows("d1", "cnt > 5")
    assert n == 1
    assert sorted(
        r["id"] for r in io.read_table_evolved(spark, scratch, "d1").collect()
    ) == [2, 3]
