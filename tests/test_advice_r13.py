"""Regression pins for the five ADVICE r12 findings (round 13).

1. io.py — the snapshot reservation lease carries OWNER IDENTITY
   (claim-time mtime): a flip whose marker was broken and re-claimed by
   another writer/vacuum must neither flip nor touch the new owner's
   marker or dir.
2. streaming/manifest_sink.py — upgrade replay: a pipeline restarting
   on an existing checkpoint after app_id namespacing landed must not
   re-append the epoch it committed under the legacy bare id.
3. streaming/changefeed.py — the retraction-vs-GC older-survivor test
   runs against a FRESH version listing, so a concurrent GC cannot
   convert the loud replay failure into silent row loss.
4. io.py — _release_verified_lock skips the delete when ownership is
   unknowable instead of deleting a possible successor's lock.
5. manifest_dml/pipeline UPDATE — a SET expression whose value would be
   silently truncated by the cast back to the declared column type
   raises; explicit CAST spells intended truncation.
"""

import os

import pytest

from popelines_spark import io
from popelines_spark.io import (
    ConcurrentSnapshotWriteError,
    _flip_snapshot_commit,
    _hadoop_fs,
    _release_verified_lock,
    snapshot_version_path,
    table_path,
    write_table_snapshot,
)


def _mk(spark, n, tag):
    return spark.range(n).selectExpr("id", f"'{tag}' AS tag")


# -- 1. snapshot lease owner identity --------------------------------


def test_flip_refuses_reclaimed_reservation(spark, scratch):
    """ADVICE r12 (io.py:1293): marker present but with a DIFFERENT
    mtime than recorded at claim ⇒ it belongs to a new claimant — the
    flip must raise WITHOUT flipping, without deleting the marker, and
    without retracting the dir (the new owner may be mid-overwrite)."""
    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 10, "a"))
    fs, _, jvm = _hadoop_fs(spark, table_path(wh, "t"))
    HPath = jvm.org.apache.hadoop.fs.Path

    vpath = snapshot_version_path(wh, "t", 2)
    os.makedirs(vpath)
    open(f"{vpath}/part-00000.parquet", "wb").close()
    marker = vpath + ".__reserved"
    reserved = HPath(marker)
    fs.create(reserved, False).close()
    own = fs.getFileStatus(reserved).getModificationTime()
    # simulate break + re-claim by another writer: same path, new mtime
    os.utime(marker, (1_000_000, 1_000_000))
    with pytest.raises(ConcurrentSnapshotWriteError, match="RE-CLAIMED"):
        _flip_snapshot_commit(fs, vpath, reserved, jvm, own_mtime=own)
    assert os.path.exists(marker), "new claimant's marker was deleted"
    assert os.path.exists(f"{vpath}/part-00000.parquet"), (
        "new claimant's dir was retracted"
    )
    assert not os.path.exists(f"{vpath}/_COMMITTED"), "flip happened anyway"


def test_flip_succeeds_with_matching_identity(spark, scratch):
    wh = f"{scratch}/wh"
    write_table_snapshot(spark, wh, "t", _mk(spark, 10, "a"))
    fs, _, jvm = _hadoop_fs(spark, table_path(wh, "t"))
    HPath = jvm.org.apache.hadoop.fs.Path
    vpath = snapshot_version_path(wh, "t", 2)
    os.makedirs(vpath)
    open(f"{vpath}/part-00000.parquet", "wb").close()
    reserved = HPath(vpath + ".__reserved")
    fs.create(reserved, False).close()
    own = fs.getFileStatus(reserved).getModificationTime()
    _flip_snapshot_commit(fs, vpath, reserved, jvm, own_mtime=own)
    assert os.path.exists(f"{vpath}/_COMMITTED")
    assert not os.path.exists(vpath + ".__reserved")


def test_write_table_snapshot_records_and_checks_identity(
    spark, scratch, monkeypatch
):
    """End-to-end: the writer records its claim mtime and passes it to
    the flip — a marker swapped mid-write (break + re-claim) makes the
    whole write raise instead of committing into the new owner's dir."""
    wh = f"{scratch}/wh"
    real_flip = io._flip_snapshot_commit

    def swap_then_flip(fs, vpath, reserved, jvm, own_mtime=None):
        marker = vpath + ".__reserved"
        os.utime(marker, (1_000_000, 1_000_000))
        return real_flip(fs, vpath, reserved, jvm, own_mtime=own_mtime)

    monkeypatch.setattr(io, "_flip_snapshot_commit", swap_then_flip)
    with pytest.raises(ConcurrentSnapshotWriteError, match="RE-CLAIMED"):
        write_table_snapshot(spark, wh, "t", _mk(spark, 10, "a"))
    monkeypatch.undo()
    vpath = snapshot_version_path(wh, "t", 1)
    assert not os.path.exists(f"{vpath}/_COMMITTED")


# -- 4. verified lock release with unknowable ownership --------------


class _FakeStatus:
    def __init__(self, mtime):
        self._m = mtime

    def getModificationTime(self):
        return self._m


class _FakeFs:
    def __init__(self, mtime=None, stat_exc=None):
        self.mtime = mtime
        self.stat_exc = stat_exc
        self.deleted = []

    def getFileStatus(self, p):
        if self.stat_exc is not None:
            raise self.stat_exc
        return _FakeStatus(self.mtime)

    def delete(self, p, recursive):
        self.deleted.append(str(p))


def test_release_skips_delete_when_ownership_unknowable():
    fs = _FakeFs(mtime=123)
    _release_verified_lock(fs, "lock", own_mtime=None)
    assert fs.deleted == [], (
        "deleted a lock whose ownership was never established — could "
        "be a successor's live lock (ADVICE r12)"
    )


def test_release_deletes_only_matching_identity():
    fs = _FakeFs(mtime=123)
    _release_verified_lock(fs, "lock", own_mtime=123)
    assert fs.deleted == ["lock"]
    fs2 = _FakeFs(mtime=456)
    _release_verified_lock(fs2, "lock", own_mtime=123)
    assert fs2.deleted == []


def test_release_tolerates_absence_and_surfaces_faults():
    fs = _FakeFs(stat_exc=RuntimeError("FileNotFoundException: gone"))
    _release_verified_lock(fs, "lock", own_mtime=123)  # no raise
    assert fs.deleted == []
    fs2 = _FakeFs(stat_exc=RuntimeError("connection reset"))
    with pytest.raises(RuntimeError, match="connection reset"):
        _release_verified_lock(fs2, "lock", own_mtime=123)


# -- 2. sink legacy bare-epoch dual lookup ----------------------------


def test_sink_upgrade_replay_dedups_legacy_bare_epoch(spark, scratch):
    """ADVICE r12 (manifest_sink.py:71): a table written pre-namespacing
    recorded bare epoch ids; the first batch after the upgrade restart
    replays that epoch under the new 'app:N' id and must no-op."""
    from popelines_spark.manifest import (
        append_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.streaming.manifest_sink import manifest_sink_writer

    batch = _mk(spark, 25, "a")
    # legacy pipeline committed epoch 7 under the bare id
    append_manifest_table(spark, scratch, "lg", batch, batch_id=7)
    assert read_manifest_table(spark, scratch, "lg").count() == 25

    write = manifest_sink_writer(scratch, "lg", app_id="newapp")
    write(batch, 7)  # upgrade replay of the SAME epoch
    assert read_manifest_table(spark, scratch, "lg").count() == 25, (
        "replayed epoch re-appended under the namespaced id"
    )
    # the NEXT epoch is genuinely new and lands under the namespaced id
    write(_mk(spark, 5, "b"), 8)
    assert read_manifest_table(spark, scratch, "lg").count() == 30


def test_sink_legacy_lookup_scoped_to_first_batch(spark, scratch):
    """Only the first batch a writer instance sees can be a restart
    replay — later epochs colliding with foreign bare ids must append."""
    from popelines_spark.manifest import (
        append_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.streaming.manifest_sink import manifest_sink_writer

    # a FOREIGN query's legacy bare ids 0 and 1 live in the table
    append_manifest_table(spark, scratch, "lg2", _mk(spark, 10, "x"),
                          batch_id=0)
    append_manifest_table(spark, scratch, "lg2", _mk(spark, 10, "y"),
                          batch_id=1)
    write = manifest_sink_writer(scratch, "lg2", app_id="mine")
    write(_mk(spark, 5, "a"), 0)   # first batch: legacy hit → no-op
    write(_mk(spark, 5, "b"), 1)   # later epoch: appends despite bare 1
    got = read_manifest_table(spark, scratch, "lg2").count()
    assert got == 25, got


def test_sink_legacy_lookup_can_be_disabled(spark, scratch):
    from popelines_spark.manifest import (
        append_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.streaming.manifest_sink import manifest_sink_writer

    append_manifest_table(spark, scratch, "lg3", _mk(spark, 10, "x"),
                          batch_id=0)
    write = manifest_sink_writer(
        scratch, "lg3", app_id="mine", dedup_legacy_epoch=False
    )
    write(_mk(spark, 5, "a"), 0)  # brand-new pipeline: must append
    assert read_manifest_table(spark, scratch, "lg3").count() == 15


# -- 3. changefeed fresh re-list on FileNotFoundError -----------------


def _cf_table(spark, scratch, name, n_versions):
    from popelines_spark.manifest import append_manifest_table

    for i in range(n_versions):
        append_manifest_table(spark, scratch, name, _mk(spark, 10, f"v{i}"))


def test_changefeed_relists_before_skipping_missing_version(
    spark, scratch, monkeypatch
):
    """ADVICE r12 (changefeed.py:135): version v vanishes AND a
    concurrent GC prunes every older version between the reader's
    listing and the manifest read. The stale listing still shows an
    older sibling (⇒ old code silently skipped v — row loss); the fresh
    listing does not ⇒ must fail loud."""
    import shutil

    from popelines_spark.streaming import changefeed as cf

    _cf_table(spark, scratch, "cfa", 3)
    root, vroot = cf._table_paths(scratch, "cfa")
    reader = cf.ManifestChangefeedReader(
        spark.read.parquet(f"{vroot}/../data/v1").schema.add(
            cf._META_COL, "long"
        ),
        {"warehouse": scratch, "table": "cfa"},
    )

    real_read = cf._read_manifest

    def gc_races_read(vr, version):
        if version == 3:
            # concurrent GC: drop v3 (the one being read) AND the older
            # prefix, so the FRESH listing has no older survivor
            for v in (1, 2, 3):
                shutil.rmtree(f"{vr}/{v}", ignore_errors=True)
            raise FileNotFoundError(f"{vr}/3/manifest.json")
        return real_read(vr, version)

    monkeypatch.setattr(cf, "_read_manifest", gc_races_read)
    with pytest.raises(RuntimeError, match="GC'd"):
        reader.partitions({"version": 2}, {"version": 3})


def test_changefeed_still_skips_true_self_retract(
    spark, scratch, monkeypatch
):
    """A missing version whose older siblings survive the FRESH listing
    is a self-retract — skipped, not fatal (review r12 behavior kept)."""
    from popelines_spark.streaming import changefeed as cf

    _cf_table(spark, scratch, "cfb", 3)
    _, vroot = cf._table_paths(scratch, "cfb")
    reader = cf.ManifestChangefeedReader(
        spark.read.parquet(f"{vroot}/../data/v1").schema.add(
            cf._META_COL, "long"
        ),
        {"warehouse": scratch, "table": "cfb"},
    )
    real_read = cf._read_manifest

    def retracted(vr, version):
        if version == 3:
            raise FileNotFoundError(f"{vr}/3/manifest.json")
        return real_read(vr, version)

    monkeypatch.setattr(cf, "_read_manifest", retracted)
    parts = reader.partitions({"version": 1}, {"version": 3})
    # v2's contribution planned; v3 skipped as a retraction
    assert all(p.version != 3 or p.path == "" for p in parts)


# -- 5. UPDATE SET lossless-coercion validation -----------------------


def test_update_manifest_raises_on_lossy_set_value(spark, scratch):
    from popelines_spark.manifest import (
        append_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.manifest_dml import update_manifest_rows

    df = spark.createDataFrame([(1, 11), (2, 20)], "id long, cnt long")
    append_manifest_table(spark, scratch, "lv", df)
    # 11/2 = 5.5 — floor-writing 5 is silent corruption (ADVICE r12)
    with pytest.raises(ValueError, match="losslessly"):
        update_manifest_rows(spark, scratch, "lv",
                             {"cnt": "cnt / 2"}, "id = 1")
    # table untouched
    got = {r["id"]: r["cnt"]
           for r in read_manifest_table(spark, scratch, "lv").collect()}
    assert got == {1: 11, 2: 20}
    # explicit CAST spells the intended truncation and is honored
    v, n = update_manifest_rows(
        spark, scratch, "lv",
        {"cnt": "CAST(cnt / 2 AS BIGINT)"}, "id = 1",
    )
    assert n == 1
    got = {r["id"]: r["cnt"]
           for r in read_manifest_table(spark, scratch, "lv").collect()}
    assert got == {1: 5, 2: 20}


def test_update_manifest_lossless_drift_still_allowed(spark, scratch):
    """Even-value division round-trips — the data-dependent probe keeps
    the review-r12 coercion behavior for genuinely lossless values."""
    from popelines_spark.manifest import (
        append_manifest_table,
        read_manifest_table,
    )
    from popelines_spark.manifest_dml import update_manifest_rows

    df = spark.createDataFrame([(1, 10), (2, 21)], "id long, cnt long")
    append_manifest_table(spark, scratch, "ld", df)
    # only id=1 matches; its value 10/2=5.0 round-trips — no raise,
    # and the unmatched odd row is NOT validated
    _, n = update_manifest_rows(spark, scratch, "ld",
                                {"cnt": "cnt / 2"}, "id = 1")
    assert n == 1
    got = {r["id"]: r["cnt"]
           for r in read_manifest_table(spark, scratch, "ld").collect()}
    assert got == {1: 5, 2: 21}
    assert dict(
        read_manifest_table(spark, scratch, "ld").dtypes
    )["cnt"] == "bigint"


def test_update_manifest_raises_on_overflow_not_ansi_error(spark, scratch):
    """An overflowing SET value must surface as the probe's friendly
    ValueError, not a raw ANSI ArithmeticException from inside the
    validation aggregation (the session runs ANSI-on)."""
    from popelines_spark.manifest import append_manifest_table
    from popelines_spark.manifest_dml import update_manifest_rows

    df = spark.createDataFrame([(1, 100)], "id long, cnt int")
    append_manifest_table(spark, scratch, "ov", df)
    with pytest.raises(ValueError, match="losslessly"):
        update_manifest_rows(
            spark, scratch, "ov",
            {"cnt": "CAST(3000000000 AS BIGINT)"},  # > int32 max
            "id = 1",
        )


def test_pipeline_update_rows_raises_on_lossy_set_value(spark, scratch):
    from popelines_spark.pipeline import Popeline

    df = spark.createDataFrame([(1, 11), (2, 20)], "id long, cnt long")
    io.write_table(df, scratch, "pv", append=False)
    p = Popeline(warehouse=scratch, spark=spark)
    with pytest.raises(ValueError, match="losslessly"):
        p.update_rows("pv", {"cnt": "cnt / 2"}, "id = 1")
    got = {r["id"]: r["cnt"]
           for r in io.read_table_evolved(spark, scratch, "pv").collect()}
    assert got == {1: 11, 2: 20}
