"""io.update_stats_increment — O(batch) stats maintenance across appends
(round 10; the incremental half of the analyze → append lifecycle).

Every merged field has an exact or mergeable-summary rule; these tests
pin each rule against a full re-ANALYZE of the same table.
"""

import pytest

from popelines_spark import io
from popelines_spark.io import (
    _merge_minmax,
    analyze_table,
    read_table_stats,
    update_stats_increment,
    write_table,
)


def _mk(spark, rows, schema="k int, v double, s string"):
    return spark.createDataFrame(rows, schema)


def test_merge_minmax_numeric_vs_lexicographic():
    # "9" > "10" lexicographically — the numeric path must not fall for it
    assert _merge_minmax("bigint", "9", "10") == ("9", "10")
    assert _merge_minmax("string", "9", "10") == ("10", "9")
    assert _merge_minmax("double", "-2.5", "1.0") == ("-2.5", "1.0")
    # ISO date/timestamp strings order correctly as strings
    assert _merge_minmax("date", "2024-01-10", "2024-01-02") == (
        "2024-01-02", "2024-01-10")
    assert _merge_minmax("int", None, "3") == ("3", "3")
    assert _merge_minmax("int", None, None) == (None, None)


def test_increment_matches_full_analyze(spark, tmp_path):
    wh = str(tmp_path)
    base = _mk(spark, [(i, float(i) / 2, f"s{i % 7}") for i in range(9)])
    write_table(base, wh, "t", append=False)
    s0 = analyze_table(spark, wh, "t")
    assert all(c["ndv_sketch"] for c in s0["columns"].values())

    # batch crosses the lexicographic min/max trap (k: 9 -> 12) and adds
    # new distincts + nulls
    batch = _mk(spark, [(i, None, f"s{i % 11}") for i in range(9, 13)])
    write_table(batch, wh, "t", append=True, update_stats=True)
    inc = read_table_stats(spark, wh, "t")
    assert "stale" not in inc
    assert inc["incremental_appends"] == 1

    full = analyze_table(spark, wh, "t")
    assert inc["rows"] == full["rows"] == 13
    for c in ("k", "v", "s"):
        assert inc["columns"][c]["nulls"] == full["columns"][c]["nulls"], c
        assert inc["columns"][c]["min"] == full["columns"][c]["min"], c
        assert inc["columns"][c]["max"] == full["columns"][c]["max"], c
        # HLL is exact at these cardinalities; allow the two estimators
        # (sketch union vs approx_count_distinct) a whisker of slack
        assert inc["columns"][c]["approx_ndv"] == pytest.approx(
            full["columns"][c]["approx_ndv"], rel=0.05), c
    assert inc["columns"]["k"]["max"] == "12"  # not "9"
    # getContentSummary counts _stats.json itself, which grew between the
    # two measurements — equal up to the metadata file's own size
    assert abs(inc["total_bytes"] - full["total_bytes"]) < 2048
    assert inc["suggest_broadcast"] == full["suggest_broadcast"]


def test_increment_schema_evolution_adds_column(spark, tmp_path):
    wh = str(tmp_path)
    write_table(_mk(spark, [(1, 1.0, "a"), (2, 2.0, "b")]), wh, "t",
                append=False)
    analyze_table(spark, wh, "t")
    batch = spark.createDataFrame(
        [(3, 3.0, "c", "new")], "k int, v double, s string, extra string"
    )
    write_table(batch, wh, "t", append=True, update_stats=True)
    st = read_table_stats(spark, wh, "t")
    # pre-existing rows read NULL for the evolved column
    assert st["columns"]["extra"]["nulls"] == 2
    assert st["columns"]["extra"]["approx_ndv"] == 1
    assert st["rows"] == 3


def test_increment_flags_keys_profile_as_lower_bound(spark, tmp_path):
    wh = str(tmp_path)
    write_table(_mk(spark, [(1, 1.0, "a")] * 6 + [(2, 2.0, "b")]), wh, "t",
                append=False)
    analyze_table(spark, wh, "t", key_columns=["k"])
    write_table(_mk(spark, [(1, 9.0, "z")] * 3), wh, "t", append=True,
                update_stats=True)
    st = read_table_stats(spark, wh, "t")
    assert st["keys_stale"] is True
    # the profile itself is kept — a lower bound still steers plan_skew_salt
    assert st["keys"]["k"]["max_key_rows"] == 6
    # a full re-ANALYZE refreshes it and clears the flag
    st2 = analyze_table(spark, wh, "t")
    assert st2["keys"]["k"]["max_key_rows"] == 9


def test_plain_append_still_marks_stale(spark, tmp_path):
    wh = str(tmp_path)
    write_table(_mk(spark, [(1, 1.0, "a")]), wh, "t", append=False)
    analyze_table(spark, wh, "t")
    write_table(_mk(spark, [(2, 2.0, "b")]), wh, "t", append=True)
    assert read_table_stats(spark, wh, "t")["stale"] is True


def test_pre_sketch_stats_fall_back_to_stale(spark, tmp_path):
    wh = str(tmp_path)
    write_table(_mk(spark, [(1, 1.0, "a")]), wh, "t", append=False)
    stats = analyze_table(spark, wh, "t")
    for c in stats["columns"].values():
        c.pop("ndv_sketch", None)  # simulate a pre-round-10 stats file
    path = io.table_path(wh, "t")
    fs, _, jvm = io._hadoop_fs(spark, path)
    io._write_stats(fs, jvm, path, stats)
    assert update_stats_increment(
        spark, wh, "t", _mk(spark, [(2, 2.0, "b")])
    ) is None
    write_table(_mk(spark, [(2, 2.0, "b")]), wh, "t", append=True,
                update_stats=True)
    assert read_table_stats(spark, wh, "t")["stale"] is True


def test_analyze_manifest_table_profiles_live_tip(spark, tmp_path):
    """Copy-on-write DML leaves dead files on disk until GC: ANALYZE
    must profile the manifest's live tip, not the directory glob (which
    double-counts every rewritten row and overstates bytes)."""
    from popelines_spark import manifest
    from popelines_spark.manifest_dml import delete_manifest_rows

    wh = str(tmp_path)
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    manifest.append_manifest_table(spark, wh, "m", df)
    delete_manifest_rows(spark, wh, "m", "k < 50")

    st = analyze_table(spark, wh, "m")
    assert st["rows"] == 50  # live rows, not 100 dead+live (or 150 glob)
    assert st["columns"]["k"]["min"] == "50"
    # bytes = live files only; the dir still holds the v1 originals
    fs, root, jvm = io._hadoop_fs(spark, io.table_path(wh, "m"))
    dir_bytes = int(fs.getContentSummary(root).getLength())
    assert st["total_bytes"] < dir_bytes
    assert st["total_bytes"] == manifest.live_file_bytes(spark, wh, "m")


def test_manifest_mutations_mark_stats_stale(spark, tmp_path):
    """Every commit path (append / replace-DML) goes through
    _commit_manifest, which ages the ANALYZE stats like write_table
    appends do."""
    from popelines_spark import manifest
    from popelines_spark.manifest_dml import update_manifest_rows

    wh = str(tmp_path)
    manifest.append_manifest_table(
        spark, wh, "m", spark.range(10).selectExpr("id AS k", "id AS v")
    )
    analyze_table(spark, wh, "m")
    assert "stale" not in read_table_stats(spark, wh, "m")
    manifest.append_manifest_table(
        spark, wh, "m", spark.range(10, 12).selectExpr("id AS k", "id AS v")
    )
    assert read_table_stats(spark, wh, "m")["stale"] is True
    st = analyze_table(spark, wh, "m")  # re-ANALYZE clears it
    assert "stale" not in st and st["rows"] == 12
    update_manifest_rows(spark, wh, "m", {"v": "99"}, "k = 0")
    assert read_table_stats(spark, wh, "m")["stale"] is True


def test_increment_refuses_stale_stats(spark, tmp_path):
    """A plain append marked the stats stale; folding a LATER batch in
    and clearing the flag would claim freshness while the earlier
    append's rows are missing forever. The merge must refuse."""
    wh = str(tmp_path)
    write_table(_mk(spark, [(1, 1.0, "a")]), wh, "t", append=False)
    analyze_table(spark, wh, "t")
    write_table(_mk(spark, [(2, 2.0, "b")]), wh, "t", append=True)  # stale
    write_table(_mk(spark, [(3, 3.0, "c")]), wh, "t", append=True,
                update_stats=True)
    st = read_table_stats(spark, wh, "t")
    assert st["stale"] is True  # still stale, NOT silently "fresh"
    assert st["rows"] == 1  # untouched ANALYZE numbers, not a partial merge


def test_increment_counts_nulls_for_columns_absent_from_batch(spark, tmp_path):
    """autodetect appends skip alignment, so the written files can lack
    live columns; mergeSchema reads NULL for them — the null counts must
    grow by the batch size."""
    wh = str(tmp_path)
    write_table(_mk(spark, [(1, 1.0, "a"), (2, 2.0, "b")]), wh, "t",
                append=False)
    analyze_table(spark, wh, "t")
    narrow = spark.createDataFrame([(3,), (4,), (5,)], "k int")
    write_table(narrow, wh, "t", append=True, autodetect=True,
                update_stats=True)
    st = read_table_stats(spark, wh, "t")
    assert st["rows"] == 5
    assert st["columns"]["v"]["nulls"] == 3
    assert st["columns"]["s"]["nulls"] == 3
    assert st["columns"]["v"]["max"] == "2.0"  # untouched by NULL rows
    full = analyze_table(spark, wh, "t")
    assert st["columns"]["v"]["nulls"] == full["columns"]["v"]["nulls"]


def test_increment_profiles_written_files_not_lineage(spark, tmp_path):
    """The profiled batch is read back from the files the write created
    (basePath recovers partition columns); a nondeterministic input
    lineage therefore cannot desynchronize stats from table contents."""
    from pyspark.sql import functions as F

    wh = str(tmp_path)
    write_table(_mk(spark, [(1, 1.0, "a")]), wh, "t", append=False,
                partition_by="s")
    analyze_table(spark, wh, "t")
    # a limit over a repartitioned frame — the classic unstable lineage
    batch = (
        _mk(spark, [(i, float(i), f"p{i % 3}") for i in range(2, 30)])
        .repartition(4)
        .limit(5)
    )
    write_table(batch, wh, "t", append=True, update_stats=True)
    inc = read_table_stats(spark, wh, "t")
    full = analyze_table(spark, wh, "t")
    assert inc["rows"] == full["rows"] == 6
    for c in ("k", "v", "s"):
        assert inc["columns"][c]["min"] == full["columns"][c]["min"], c
        assert inc["columns"][c]["max"] == full["columns"][c]["max"], c
        assert inc["columns"][c]["nulls"] == full["columns"][c]["nulls"], c
    # the partition column was recovered from directory names, not
    # treated as absent-from-batch
    assert inc["columns"]["s"]["nulls"] == 0


def test_find_last_entry_reads_manifest_tip(spark, tmp_path):
    """The incremental-extraction watermark works on manifest tables:
    the read resolves the live tip, so a copy-on-write DELETE of the
    latest rows moves the watermark back (a directory glob would either
    fail or keep reporting the deleted maximum)."""
    from popelines_spark import manifest
    from popelines_spark.manifest_dml import delete_manifest_rows
    from popelines_spark.pipeline import Popeline

    wh = str(tmp_path)
    p = Popeline(warehouse=wh, spark=spark)
    manifest.append_manifest_table(
        spark, wh, "m",
        spark.range(10).selectExpr("id AS k", "CAST(id AS LONG) AS ts"),
    )
    assert p.find_last_entry("m", "ts") == 9
    delete_manifest_rows(spark, wh, "m", "ts >= 5")
    assert p.find_last_entry("m", "ts") == 4


def test_path_maintenance_refuses_manifest_tables(spark, tmp_path):
    """compact_table / relayout_table are path-layout tools; on a
    manifest table they must fail with the right tool's name, not a
    schema-inference error from globbing versions/ JSON."""
    from popelines_spark import manifest
    from popelines_spark.pipeline import Popeline

    wh = str(tmp_path)
    manifest.append_manifest_table(
        spark, wh, "m", spark.range(5).selectExpr("id AS k")
    )
    with pytest.raises(ValueError, match="compact_manifest_table"):
        io.compact_table(spark, wh, "m")
    with pytest.raises(ValueError, match="compact_manifest_table"):
        Popeline(warehouse=wh, spark=spark).relayout_table("m", ["k"])


def test_merge_minmax_interval_is_not_numeric():
    """'interval day to second' contains the substring 'int' but its
    min/max strings are not float()-parseable — type detection must be
    anchored, not substring containment."""
    from popelines_spark.io import _merge_minmax

    lo = "INTERVAL '1 00:00:00' DAY TO SECOND"
    hi = "INTERVAL '2 00:00:00' DAY TO SECOND"
    assert _merge_minmax("interval day to second", hi, lo) == (lo, hi)
    # numerics still compare as numbers, not lexicographically
    assert _merge_minmax("bigint", "9", "10") == ("9", "10")
    assert _merge_minmax("INT", "9", "10") == ("9", "10")
    assert _merge_minmax("decimal(10,2)", "9.5", "10.25") == ("9.5", "10.25")


def test_lock_release_is_identity_verified(spark, tmp_path, monkeypatch):
    """Review r12: the holder's finally-delete must not remove a lock a
    breaker recreated mid-hold — else a third writer enters while the
    second still folds, cascading last-write-wins undercounts. Simulate
    the breaker by swapping the lock file during the locked section and
    assert the successor's lock survives the holder's release."""
    import os
    import time

    wh = str(tmp_path)
    base = _mk(spark, [(i, float(i), f"s{i}") for i in range(5)])
    write_table(base, wh, "t", append=False)
    analyze_table(spark, wh, "t")

    lock = os.path.join(wh, "t", "_stats.json.__lock")
    real = io._update_stats_locked

    def swap_then_fold(*a, **kw):
        out = real(*a, **kw)
        # breaker fires: deletes the holder's lock, claims its own
        os.remove(lock)
        open(lock, "w").close()
        # mtime resolution guard: make the successor's mtime distinct
        t = time.time() + 2
        os.utime(lock, (t, t))
        return out

    monkeypatch.setattr(io, "_update_stats_locked", swap_then_fold)
    batch = _mk(spark, [(9, 9.0, "x")])
    assert update_stats_increment(spark, wh, "t", batch) is not None
    # the successor's lock must still be there after the holder released
    assert os.path.exists(lock)
    os.remove(lock)


def test_batch_profile_runs_before_lock_claim(spark, tmp_path, monkeypatch):
    """The O(batch) aggregation must happen BEFORE the lock claim so the
    hold is metadata-op-scale (review r12). Pin the ordering: by the
    time _claim_path is first called for the stats lock, _profile_batch
    has already run."""
    from popelines_spark import manifest as m

    wh = str(tmp_path)
    base = _mk(spark, [(i, float(i), f"s{i}") for i in range(5)])
    write_table(base, wh, "t", append=False)
    analyze_table(spark, wh, "t")

    order = []
    real_profile = io._profile_batch
    real_claim = m._claim_path

    def profile_spy(df):
        order.append("profile")
        return real_profile(df)

    def claim_spy(fs, path, jvm):
        if path.endswith("_stats.json.__lock"):
            order.append("claim")
        return real_claim(fs, path, jvm)

    monkeypatch.setattr(io, "_profile_batch", profile_spy)
    monkeypatch.setattr(m, "_claim_path", claim_spy)
    batch = _mk(spark, [(9, 9.0, "x")])
    assert update_stats_increment(spark, wh, "t", batch) is not None
    assert order and order[0] == "profile"
    assert "claim" in order and order.index("profile") < order.index("claim")
