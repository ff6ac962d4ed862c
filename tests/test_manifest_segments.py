"""Segmented manifest file lists (manifest.py::_write_segments /
_expand_files): above a threshold the file list is split into
content-addressed chunks shared structurally across versions, so a
commit writes O(batch) metadata instead of rewriting the whole
O(live files) list. The in-memory ``files`` contract is unchanged —
every consumer (read, prune, DML, heal, GC, changefeed) sees the
expanded list.

Tests force tiny thresholds via the documented env overrides.
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from popelines_spark.manifest import (
    append_manifest_table,
    compact_manifest_table,
    gc_manifest_table,
    heal_manifest_table,
    manifest_file_list,
    read_manifest_table,
)
from popelines_spark.manifest_dml import delete_manifest_rows


@pytest.fixture
def tiny_segments(monkeypatch):
    monkeypatch.setenv("POPELINES_SEGMENT_THRESHOLD", "5")
    monkeypatch.setenv("POPELINES_SEGMENT_TARGET", "4")


def _append(spark, scratch, lo, n=40, n_files=4, **kw):
    return append_manifest_table(
        spark, scratch, "t",
        spark.range(lo, lo + n).select(
            F.col("id"), F.lit(f"b{lo}").alias("tag")
        ),
        n_files=n_files, **kw,
    )


def _raw(scratch, v):
    return json.load(open(f"{scratch}/t/versions/{v}/manifest.json"))


def test_segmented_at_rest_inline_below_threshold(
    spark, scratch, tiny_segments
):
    _append(spark, scratch, 0)  # 4 files < threshold 5: stays inline
    _append(spark, scratch, 100)  # 8 files: segments
    r1, r2 = _raw(scratch, 1), _raw(scratch, 2)
    assert "files" in r1 and "files_segments" not in r1
    assert "files_segments" in r2 and "files" not in r2
    segs = glob.glob(f"{scratch}/t/versions/_segments/*.json")
    assert len(segs) >= 1
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 80
    assert read_manifest_table(spark, scratch, "t", version=1).count() == 40


def test_commit_reuses_parents_segments(spark, scratch, tiny_segments):
    """Structural sharing: appending a batch to a segmented table
    carries most of the parent's chunks by reference — only the
    insertion neighborhood changes (content-defined boundaries)."""
    _append(spark, scratch, 0, n_files=12)
    _append(spark, scratch, 100, n_files=4)
    _append(spark, scratch, 200, n_files=4)
    s2, s3 = _raw(scratch, 2)["files_segments"], \
        _raw(scratch, 3)["files_segments"]
    shared = set(s2) & set(s3)
    assert shared, "no structural sharing between consecutive commits"
    # the batch added 4 paths; with target 4 that is ~1-2 new chunks
    # plus the disturbed insertion neighbor — not a full rewrite
    assert len(set(s3) - set(s2)) < len(s3)
    assert read_manifest_table(spark, scratch, "t").count() == 120


def test_stats_prune_on_segmented_manifest(spark, scratch, tiny_segments):
    for lo in (0, 1000, 2000):
        _append(spark, scratch, lo, n=50, n_files=3, stats_cols=["id"])
    raw = _raw(scratch, 3)
    assert "files_segments" in raw
    idx = (
        [i for i, n in raw["stats_idx_rle"] for _ in range(n)]
        if "stats_idx_rle" in raw else raw["stats_idx"]
    )
    assert len(idx) == 9
    assert len(manifest_file_list(
        spark, scratch, "t", prune=[("id", 1010, 1020)]
    )) == 3
    assert manifest_file_list(
        spark, scratch, "t", prune=[("id", 9000, 9999)]
    ) == []


def test_dml_heal_compact_gc_on_segmented_table(
    spark, scratch, tiny_segments
):
    for lo in (0, 100, 200):
        _append(spark, scratch, lo)
    delete_manifest_rows(spark, scratch, "t", "id >= 200")
    got = read_manifest_table(spark, scratch, "t")
    assert got.count() == 80 and got.agg(F.max("id")).collect()[0][0] == 139
    assert heal_manifest_table(spark, scratch, "t") == 0
    compact_manifest_table(spark, scratch, "t", n_files=2)
    assert read_manifest_table(spark, scratch, "t").count() == 80
    before = set(glob.glob(f"{scratch}/t/versions/_segments/*.json"))
    dropped, deleted = gc_manifest_table(
        spark, scratch, "t", keep_versions=1, min_file_age_sec=0
    )
    after = set(glob.glob(f"{scratch}/t/versions/_segments/*.json"))
    assert dropped >= 1 and deleted >= 1
    assert after < before, "cold segments not swept"
    # the survivor still reads through its (possibly segmented) tip
    assert read_manifest_table(spark, scratch, "t").count() == 80


def test_segments_materialize_outside_the_commit_lock(
    spark, scratch, tiny_segments, monkeypatch
):
    """The lock's contract is ~2 metadata ops; chunk uploads are
    content-addressed and parent-independent, so they must run BEFORE
    lock acquisition (a long hold risks a stale-break mid-commit)."""
    import popelines_spark.manifest as M

    calls = []
    orig = M._write_segments

    def spy(fs, vroot, listed, jvm):
        calls.append(os.path.exists(f"{vroot}/.__commit_lock"))
        return orig(fs, vroot, listed, jvm)

    monkeypatch.setattr(M, "_write_segments", spy)
    _append(spark, scratch, 0)
    _append(spark, scratch, 100)
    assert calls, "segmentation never engaged"
    assert not any(calls), "segments written while the lock was held"


def test_missing_segment_is_loud_corruption_not_retraction(
    spark, scratch, tiny_segments
):
    """A committed manifest whose chunk vanished must raise
    SegmentLossError — NOT read as 'version retracted', which would let
    GC silently drop the version's contribution and delete data files a
    retained version still references."""
    import popelines_spark.manifest as M

    _append(spark, scratch, 0)
    _append(spark, scratch, 100)
    assert "files_segments" in _raw(scratch, 2)
    # kill one chunk of the TIP and purge the in-process cache
    victim = glob.glob(f"{scratch}/t/versions/_segments/*.json")[0]
    os.remove(victim)
    M._SEGMENT_CACHE.clear()
    with pytest.raises(M.SegmentLossError):
        read_manifest_table(spark, scratch, "t").count()
    with pytest.raises(M.SegmentLossError):
        gc_manifest_table(spark, scratch, "t", keep_versions=1,
                          min_file_age_sec=0)
    # no data files were deleted by the refused GC
    assert len(glob.glob(f"{scratch}/t/data/v*/*.parquet")) == 8


def test_gc_segment_sweep_fences_on_fresh_reservation(
    spark, scratch, tiny_segments
):
    """A fresh reservation marker = a writer between reserve and commit
    (possibly re-adopting a cold chunk): the segment sweep must abort,
    exactly like cleanup_orphan_files' fence."""
    for lo in (0, 100, 200):
        _append(spark, scratch, lo)
    compact_manifest_table(spark, scratch, "t", n_files=2)
    open(f"{scratch}/t/versions/99.__reserved", "w").close()  # fresh
    before = set(glob.glob(f"{scratch}/t/versions/_segments/*.json"))
    gc_manifest_table(spark, scratch, "t", keep_versions=1,
                      min_file_age_sec=3600)
    after = set(glob.glob(f"{scratch}/t/versions/_segments/*.json"))
    assert before == after, "sweep ran through the writer fence"
    os.remove(f"{scratch}/t/versions/99.__reserved")


def test_changefeed_reads_segmented_manifests(
    spark, scratch, tiny_segments, tmp_path
):
    from popelines_spark.streaming.changefeed import read_changefeed

    _append(spark, scratch, 0)
    _append(spark, scratch, 100)
    feed = read_changefeed(spark, scratch, "t")
    q = (
        feed.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 80


def test_chunk_reuse_rematerializes_vanished_or_unrefreshable_chunks(
    spark, scratch, tiny_segments
):
    """ADVICE r11 pass-1 pin (was prose-only): chunk reuse must fall
    back to a fresh write when the chunk VANISHED since the parent
    commit, and when the vacuum-lease refresh (setTimes) fails — a
    commit must never reference a chunk that is not durably on disk."""
    from popelines_spark.io import _hadoop_fs
    from popelines_spark.manifest import _write_segments

    _append(spark, scratch, 0)
    vroot = f"{scratch}/t/versions"
    fs, _, jvm = _hadoop_fs(spark, vroot)
    listed = sorted(
        f"{scratch}/t/data/v1/{os.path.basename(p)}"
        for p in glob.glob(f"{scratch}/t/data/v1/*.parquet")
    )
    refs = _write_segments(fs, vroot, listed, jvm)
    chunk_files = [f"{vroot}/_segments/{sha}.json" for sha in refs]
    assert all(os.path.exists(c) for c in chunk_files)

    # 1) chunk vanished (GC'd between commits): reuse must rewrite it
    os.remove(chunk_files[0])
    refs2 = _write_segments(fs, vroot, listed, jvm)
    assert refs2 == refs
    assert all(os.path.exists(c) for c in chunk_files)

    # 2) lease refresh fails (object stores where setTimes is a no-op /
    # raises): reuse must still leave a durable chunk behind
    class NoSetTimesFS:
        def __init__(self, real):
            self._real = real

        def __getattr__(self, name):
            return getattr(self._real, name)

        def setTimes(self, *a):
            raise RuntimeError("setTimes unsupported on this store")

    refs3 = _write_segments(NoSetTimesFS(fs), vroot, listed, jvm)
    assert refs3 == refs
    assert all(os.path.exists(c) for c in chunk_files)


def test_gc_sweep_restats_chunk_before_delete(spark, scratch, tiny_segments, monkeypatch):
    """ADVICE r11 pass-1 pin (was prose-only): a lease refresh landing
    AFTER the GC's directory listing must be honored — the sweep
    re-stats each doomed chunk immediately before deleting. Simulated
    by an fs shim whose listStatus reports every segment chunk as
    epoch-old while the files on disk are fresh: without the re-stat
    the sweep would delete unreferenced-but-fresh chunks."""
    from popelines_spark import manifest as m

    _append(spark, scratch, 0)
    _append(spark, scratch, 40)
    compact_manifest_table(spark, scratch, "t", n_files=2)
    seg_dir = f"{scratch}/t/versions/_segments"
    before = set(os.listdir(seg_dir))

    class ColdListingFS:
        def __init__(self, real):
            self._real = real

        def __getattr__(self, name):
            return getattr(self._real, name)

        def listStatus(self, path):
            sts = list(self._real.listStatus(path))
            if "_segments" not in path.toString():
                return sts

            class ColdStatus:
                def __init__(self, st):
                    self._st = st

                def getPath(self):
                    return self._st.getPath()

                def getModificationTime(self):
                    return 0  # listed as epoch-old

                def __getattr__(self, name):
                    return getattr(self._st, name)

            return [
                ColdStatus(st)
                if st.getPath().getName().endswith(".json")
                else st
                for st in sts
            ]

    real_hfs = m._hadoop_fs

    def shimmed(spark_, path):
        fs, root, jvm = real_hfs(spark_, path)
        return ColdListingFS(fs), root, jvm

    monkeypatch.setattr(m, "_hadoop_fs", shimmed)
    # keep only the tip: older versions' unique chunks become
    # unreferenced — but every chunk on disk is FRESH, so the re-stat
    # must spare all of them despite the cold listing
    gc_manifest_table(spark, scratch, "t", keep_versions=1,
                      min_file_age_sec=3600.0)
    assert set(os.listdir(seg_dir)) == before
    assert read_manifest_table(spark, scratch, "t").count() == 80
