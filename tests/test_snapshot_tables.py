"""Snapshot-versioned tables (io.py; VERDICT r6 next #6): a reader racing
a compaction sees exactly the old or the new file set — never a mix, never
a missing path — via the commit-marker protocol on the same Hadoop FS code
path used for s3a/gs."""

import os

from pyspark.sql import functions as F

from popelines_spark.io import (
    compact_table_snapshot,
    read_table_snapshot,
    snapshot_version_path,
    table_path,
    write_table_snapshot,
)


def _mk(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_uncommitted_version_is_invisible(spark, scratch):
    """A torn (marker-less) version dir — the mid-compaction state — must
    not be resolvable; readers keep getting the last committed version."""
    wh = f"{scratch}/wh"
    v1 = write_table_snapshot(spark, wh, "t", _mk(spark, 20, "v1"))
    assert v1 == 1
    got = read_table_snapshot(spark, wh, "t")
    assert got.count() == 20
    # simulate a compaction in flight: v2 data fully written, NOT committed
    v2_path = snapshot_version_path(wh, "t", 2)
    _mk(spark, 99, "v2").write.parquet(v2_path)
    assert os.path.exists(v2_path)  # the bytes exist...
    df = read_table_snapshot(spark, wh, "t")
    assert df.count() == 20  # ...but readers still resolve v1
    assert set(r.tag for r in df.select("tag").distinct().collect()) == {"v1"}
    # committing flips visibility atomically (one marker-file creation)
    open(os.path.join(v2_path, "_COMMITTED"), "w").close()
    df2 = read_table_snapshot(spark, wh, "t")
    assert df2.count() == 99
    assert set(r.tag for r in df2.select("tag").distinct().collect()) == {"v2"}


def test_compaction_preserves_rows_and_shrinks_files(spark, scratch):
    wh = f"{scratch}/wh"
    # many small files: repartition(8) at write
    write_table_snapshot(spark, wh, "t", _mk(spark, 1000, "a"), n_files=8)
    before, after = compact_table_snapshot(
        spark, wh, "t", target_file_bytes=1 << 30
    )
    assert before == 8 and after == 1
    df = read_table_snapshot(spark, wh, "t")
    assert df.count() == 1000
    assert df.agg(F.sum("id")).collect()[0][0] == 999 * 1000 // 2


def test_reader_snapshot_survives_compaction_and_gc(spark, scratch):
    """A reader that resolved version N can still collect its DataFrame
    after a compaction commits N+1, because committed version dirs are
    immutable and GC retention (keep_versions=2) covers the in-flight
    reader."""
    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 500, "old"), n_files=4)
    reader_df = read_table_snapshot(spark, wh, "t")  # resolves v1
    compact_table_snapshot(spark, wh, "t", target_file_bytes=1 << 30,
                           keep_versions=2)
    # the old snapshot is still fully readable mid-"query"
    assert reader_df.count() == 500
    # and new readers get the compacted version
    assert read_table_snapshot(spark, wh, "t").count() == 500


def test_gc_drops_versions_beyond_retention(spark, scratch):
    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 10, "a"))
    for _ in range(3):
        compact_table_snapshot(spark, wh, "t", keep_versions=2)
    vroot = os.path.join(table_path(wh, "t"), "_versions")
    alive = sorted(os.listdir(vroot))
    assert len(alive) == 2, alive  # retention holds
    assert read_table_snapshot(spark, wh, "t").count() == 10


def test_concurrent_writers_get_distinct_versions(spark, scratch):
    """The create-no-overwrite reservation serializes id assignment: two
    writers never land on the same version dir."""
    wh = f"{scratch}/wh"
    a = write_table_snapshot(spark, wh, "t", _mk(spark, 5, "a"))
    b = write_table_snapshot(spark, wh, "t", _mk(spark, 6, "b"))
    assert a != b
    assert read_table_snapshot(spark, wh, "t").count() == 6  # latest wins


def test_time_travel_reads_pinned_version(spark, scratch):
    """An explicit version= reads the table exactly as committed then;
    a GC'd or never-committed version fails with the available window in
    the message."""
    import pytest

    write_table_snapshot(spark, scratch, "tt", _mk(spark, 10, "v1"))
    write_table_snapshot(spark, scratch, "tt", _mk(spark, 20, "v2"))
    latest = read_table_snapshot(spark, scratch, "tt")
    assert latest.count() == 20
    old = read_table_snapshot(spark, scratch, "tt", version=1)
    assert old.count() == 10
    assert old.select("tag").distinct().collect()[0][0] == "v1"
    with pytest.raises(FileNotFoundError, match="not available"):
        read_table_snapshot(spark, scratch, "tt", version=99)


def test_register_table_snapshot_time_travel_sql(spark, scratch):
    """Time travel reaches the SQL surface: register a pinned version
    and query it next to the live one."""
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=scratch, spark=spark)
    write_table_snapshot(spark, scratch, "ttsql", _mk(spark, 5, "v1"))
    write_table_snapshot(spark, scratch, "ttsql", _mk(spark, 9, "v2"))
    p.register_table("ttsql", snapshot=True)
    assert p.query("SELECT count(*) AS n FROM ttsql")[0]["n"] == 9
    p.register_table("ttsql", version=1)
    assert p.query("SELECT count(*) AS n FROM ttsql")[0]["n"] == 5


def test_append_snapshot_evolves_and_preserves_history(spark, scratch):
    """Append with a new column: the new version holds old+new rows with
    the evolved schema; the prior version still reads exactly as it was
    (no in-place mutation anywhere)."""
    from popelines_spark.io import append_table_snapshot

    v1 = write_table_snapshot(spark, scratch, "ap", _mk(spark, 4, "v1"))
    batch = _mk(spark, 3, "v2").withColumn("extra", F.lit(7))
    v2 = append_table_snapshot(spark, scratch, "ap", batch)
    assert v2 == v1 + 1
    now = read_table_snapshot(spark, scratch, "ap")
    assert now.count() == 7
    assert "extra" in now.columns
    # old rows carry NULL extra; new rows carry 7
    assert now.where(F.col("extra").isNull()).count() == 4
    # pinned history unchanged
    old = read_table_snapshot(spark, scratch, "ap", version=v1)
    assert old.count() == 4 and "extra" not in old.columns


def test_compaction_detects_in_flight_reservation(spark, scratch):
    """Review r12 TOCTOU close: an append that RESERVED a lower version
    before the compaction committed — but hasn't flipped _COMMITTED yet —
    must still retract the compaction (the committed-versions listing
    alone misses it)."""
    import pytest

    from popelines_spark.io import ConcurrentSnapshotWriteError

    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 100, "a"), n_files=4)
    # simulate the racer: reservation for v2 exists, commit not yet flipped
    vdir = os.path.dirname(snapshot_version_path(wh, "t", 2))
    open(os.path.join(vdir, "v00000002.__reserved"), "w").close()
    with pytest.raises(ConcurrentSnapshotWriteError):
        compact_table_snapshot(spark, wh, "t", target_file_bytes=1 << 30)
    # the compacted version was retracted: tip is still v1, rows intact
    df = read_table_snapshot(spark, wh, "t")
    assert df.count() == 100
    assert not os.path.exists(snapshot_version_path(wh, "t", 3))


def test_compaction_ignores_stale_crash_debris_reservation(spark, scratch):
    """A .__reserved marker older than the staleness horizon is a dead
    writer, not an in-flight commit — compaction must proceed (else one
    crash livelocks every future compaction)."""
    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 100, "a"), n_files=4)
    vdir = os.path.dirname(snapshot_version_path(wh, "t", 2))
    marker = os.path.join(vdir, "v00000002.__reserved")
    open(marker, "w").close()
    old = 3_600  # 1h ago — well past _STALE_RESERVATION_SEC
    import time

    os.utime(marker, (time.time() - old, time.time() - old))
    before, after = compact_table_snapshot(
        spark, wh, "t", target_file_bytes=1 << 30
    )
    assert (before, after) == (4, 1)
    assert read_table_snapshot(spark, wh, "t").count() == 100
    # the presumed-dead marker was BROKEN, not just ignored: if its
    # holder resurfaces, its flip guard finds the lease gone and
    # retracts instead of committing blind (review r12)
    assert not os.path.exists(marker)


def test_flip_guard_retracts_when_reservation_was_broken(spark, scratch):
    """Review r12: a writer whose .__reserved marker was BROKEN by a
    compaction that presumed it dead must NOT flip _COMMITTED — its base
    may be superseded; it retracts the written dir and raises for the
    caller to retry. With the marker intact the flip proceeds."""
    import pytest

    from popelines_spark.io import (
        ConcurrentSnapshotWriteError,
        _flip_snapshot_commit,
        _hadoop_fs,
    )

    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 10, "a"))
    fs, _, jvm = _hadoop_fs(spark, table_path(wh, "t"))
    HPath = jvm.org.apache.hadoop.fs.Path

    vpath = snapshot_version_path(wh, "t", 2)
    os.makedirs(vpath)
    open(f"{vpath}/part-00000.parquet", "wb").close()
    # marker intact: flip succeeds and releases the reservation
    reserved = HPath(vpath + ".__reserved")
    fs.create(reserved, False).close()
    _flip_snapshot_commit(fs, vpath, reserved, jvm)
    assert os.path.exists(f"{vpath}/_COMMITTED")
    assert not os.path.exists(vpath + ".__reserved")

    # marker broken mid-write: flip must retract and raise
    vpath3 = snapshot_version_path(wh, "t", 3)
    os.makedirs(vpath3)
    open(f"{vpath3}/part-00000.parquet", "wb").close()
    reserved3 = HPath(vpath3 + ".__reserved")  # never created = broken
    with pytest.raises(ConcurrentSnapshotWriteError, match="retracted"):
        _flip_snapshot_commit(fs, vpath3, reserved3, jvm)
    assert not os.path.exists(vpath3)
    # the committed v2 (fabricated dir) is untouched by the retraction
    assert os.path.exists(f"{vpath}/_COMMITTED")


def test_reservation_recheck_moves_past_committed_versions(
    spark, scratch, monkeypatch
):
    """Review r12: a writer whose committed-versions listing went stale
    (another commit landed and released its reservation in the gap) must
    NOT claim — and then mode('overwrite') — the already-committed id.
    The claim rechecks the tip and moves past it."""
    from popelines_spark import io as pio

    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 10, "a"))
    write_table_snapshot(spark, wh, "t", _mk(spark, 20, "b"))

    real = pio._committed_versions
    calls = {"n": 0}

    def stale_once(fs, root, jvm):
        calls["n"] += 1
        if calls["n"] == 1:
            return [1]  # stale: v2 already committed but not yet seen
        return real(fs, root, jvm)

    monkeypatch.setattr(pio, "_committed_versions", stale_once)
    v2_files = sorted(os.listdir(snapshot_version_path(wh, "t", 2)))
    v = write_table_snapshot(spark, wh, "t", _mk(spark, 30, "c"))
    assert v == 3  # not 2 — the recheck moved past the committed tip
    assert sorted(os.listdir(snapshot_version_path(wh, "t", 2))) == v2_files
    assert read_table_snapshot(spark, wh, "t", version=2).count() == 20
    assert read_table_snapshot(spark, wh, "t", version=3).count() == 30
