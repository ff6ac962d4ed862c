"""Layout-transparent facade DML (round 13): delete_rows / update_rows /
upsert_table route by the table's live layout — path (truncate-rewrite),
manifest (CoW file-granularity commit), snapshot (new committed
version) — with IDENTICAL SQL semantics on every layout:

- DELETE removes only predicate-TRUE rows (NULL keeps the row);
- UPDATE evaluates every SET expression against the PRE-update row and
  runs the per-matched-row lossless-coercion probe (ADVICE r12) before
  writing;
- MERGE takes source values for matched keys, keeps both sides'
  unmatched rows, and honors dedup_source_order.

The r12 refusal tests this supersedes live in test_facade_review_r12
(rewritten there as routing assertions); this file pins the semantics
matrix plus the snapshot layouts' no-op discipline (a DML that matches
nothing must NOT commit a new version).
"""

import pytest

from popelines_spark import io
from popelines_spark.manifest import append_manifest_table
from popelines_spark.pipeline import Popeline

ROWS = [(1, "a", 10), (2, "b", 20), (3, None, 30)]
SCHEMA = "id long, v string, cnt long"
LAYOUTS = ("path", "manifest", "snapshot")


def _make(spark, wh, layout, name):
    df = spark.createDataFrame(ROWS, SCHEMA)
    if layout == "manifest":
        append_manifest_table(spark, wh, name, df)
    elif layout == "snapshot":
        io.write_table_snapshot(spark, wh, name, df)
    else:
        io.write_table(df, wh, name, append=False)


def _read(spark, wh, name):
    return {
        (r.id, r.v, r.cnt)
        for r in io.read_table_auto(spark, wh, name).collect()
    }


@pytest.mark.parametrize("layout", LAYOUTS)
def test_delete_null_predicate_semantics(spark, scratch, layout):
    """v = 'a' is NULL for the (3, None) row — SQL DELETE keeps it."""
    _make(spark, scratch, layout, "t")
    p = Popeline(warehouse=scratch, spark=spark)
    assert p.delete_rows("t", "v = 'a'") == 1
    assert _read(spark, scratch, "t") == {(2, "b", 20), (3, None, 30)}


@pytest.mark.parametrize("layout", LAYOUTS)
def test_update_pre_row_swap_semantics(spark, scratch, layout):
    """SET id=cnt, cnt=id must swap (both read the PRE-update row)."""
    _make(spark, scratch, layout, "t")
    p = Popeline(warehouse=scratch, spark=spark)
    assert p.update_rows("t", {"id": "cnt", "cnt": "id"}, "id = 2") == 1
    assert _read(spark, scratch, "t") == {
        (1, "a", 10), (20, "b", 2), (3, None, 30)
    }


@pytest.mark.parametrize("layout", LAYOUTS)
def test_update_lossy_set_raises_on_every_layout(spark, scratch, layout):
    """cnt/2 on an odd LONG would truncate — the coercion probe raises
    the same friendly error regardless of layout, and nothing is
    written."""
    _make(spark, scratch, layout, "t")
    p = Popeline(warehouse=scratch, spark=spark)
    with pytest.raises(ValueError, match="losslessly"):
        p.update_rows("t", {"cnt": "cnt / 4"}, "id = 1")  # 10/4 = 2.5
    assert _read(spark, scratch, "t") == set(ROWS)


@pytest.mark.parametrize("layout", LAYOUTS)
def test_upsert_routes_and_dedups(spark, scratch, layout):
    """Matched key takes source values, unmatched survive both ways;
    duplicate source keys are resolved by dedup_source_order's
    keep-first on every layout."""
    src = spark.createDataFrame(
        [(2, "new", 99), (2, "dup", 0), (4, "d", 40)], SCHEMA
    )
    _make(spark, scratch, layout, "t")
    p = Popeline(warehouse=scratch, spark=spark)
    p.upsert_table("t", src, ["id"], dedup_source_order=["cnt"])
    # keep-first under cnt asc: (2,'dup',0) wins over (2,'new',99)
    assert _read(spark, scratch, "t") == {
        (1, "a", 10), (2, "dup", 0), (3, None, 30), (4, "d", 40)
    }


def test_snapshot_dml_is_versioned_and_noop_free(spark, scratch):
    """Each effective DML = one new committed version; a no-match DML
    commits nothing; every prior version stays time-travel readable."""
    _make(spark, scratch, "snapshot", "t")
    p = Popeline(warehouse=scratch, spark=spark)
    fs, root, jvm = io._hadoop_fs(spark, io.table_path(scratch, "t"))
    v0 = io._committed_versions(fs, root, jvm)
    assert p.delete_rows("t", "id = 99") == 0  # no match
    assert p.update_rows("t", {"cnt": "cnt + 1"}, "id = 99") == 0
    assert io._committed_versions(fs, root, jvm) == v0, "no-op committed"
    assert p.delete_rows("t", "id = 1") == 1
    assert p.update_rows("t", {"cnt": "cnt + 1"}, "id = 2") == 1
    vs = io._committed_versions(fs, root, jvm)
    assert len(vs) == len(v0) + 2
    pre = io.read_table_snapshot(spark, scratch, "t", version=v0[-1])
    assert {(r.id, r.cnt) for r in pre.collect()} == {
        (1, 10), (2, 20), (3, 30)
    }
    tip = io.read_table_snapshot(spark, scratch, "t")
    assert {(r.id, r.cnt) for r in tip.collect()} == {(2, 21), (3, 30)}


def test_compact_routes_manifest_layout(spark, scratch):
    """Facade compaction on a manifest table commits a compaction
    version (rows unchanged, fewer files, history intact)."""
    df = spark.createDataFrame([(i, f"v{i}") for i in range(40)], "id long, v string")
    for lo in range(0, 40, 10):
        append_manifest_table(
            spark, scratch, "t",
            df.filter(f"id >= {lo} AND id < {lo + 10}").repartition(4),
        )
    p = Popeline(warehouse=scratch, spark=spark)
    before, after = p.compact_table("t")
    assert before > after >= 1
    got = io.read_table_auto(spark, scratch, "t")
    assert got.count() == 40
    assert got.select("id").distinct().count() == 40


def test_compact_manifest_noops_when_already_compact(spark, scratch):
    """A manifest table already at/below the target file count must not
    pay the O(table) rewrite — no new version, same counts back."""
    from popelines_spark.manifest import _committed_manifest_versions

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    append_manifest_table(spark, scratch, "t", df.coalesce(1))
    p = Popeline(warehouse=scratch, spark=spark)
    vroot = io.table_path(scratch, "t") + "/versions"
    fs, _, jvm = io._hadoop_fs(spark, vroot)
    before_versions = _committed_manifest_versions(fs, vroot, jvm)
    assert p.compact_table("t") == (1, 1)
    assert _committed_manifest_versions(fs, vroot, jvm) == before_versions


def test_compact_routes_snapshot_layout(spark, scratch):
    """Facade compaction on a snapshot table = new version + GC, rows
    unchanged."""
    df = spark.createDataFrame([(i, f"v{i}") for i in range(40)], "id long, v string")
    io.write_table_snapshot(spark, scratch, "t", df, n_files=16)
    p = Popeline(warehouse=scratch, spark=spark)
    before, after = p.compact_table("t")
    assert before == 16 and after < before
    assert io.read_table_snapshot(spark, scratch, "t").count() == 40


def test_replace_keys_routes_snapshot_layout(spark, scratch):
    """fix_table_keys on a snapshot table commits a renamed NEW version;
    the pre-rename schema stays time-travel readable. Manifest tables
    still refuse with the rebuild recipe."""
    df = spark.createDataFrame([(1, "a")], "`user id` long, v string")
    io.write_table_snapshot(spark, scratch, "t", df)
    p = Popeline(warehouse=scratch, spark=spark)
    p.copy_and_replace_keys("t", lambda k: k.replace(" ", "_"))
    tip = io.read_table_snapshot(spark, scratch, "t")
    assert tip.columns == ["user_id", "v"]
    assert io.read_table_snapshot(spark, scratch, "t", version=1).columns \
        == ["user id", "v"]
    append_manifest_table(spark, scratch, "m", df)
    with pytest.raises(ValueError, match="rebuild explicitly"):
        p.copy_and_replace_keys("m", str.upper)


def test_manifest_dml_routing_preserves_exactly_once_lineage(
    spark, scratch
):
    """The routed manifest DML keeps the table a fully healthy manifest
    table: version advances, heal finds nothing, changefeed-visible
    history intact."""
    from popelines_spark.manifest import (
        _committed_manifest_versions,
        heal_manifest_table,
    )

    _make(spark, scratch, "manifest", "t")
    p = Popeline(warehouse=scratch, spark=spark)
    assert p.update_rows("t", {"cnt": "cnt * 2"}, "cnt >= 20") == 2
    assert p.delete_rows("t", "id = 1") == 1
    assert heal_manifest_table(spark, scratch, "t") == 0
    vroot = io.table_path(scratch, "t") + "/versions"
    fs, _, jvm = io._hadoop_fs(spark, vroot)
    assert len(_committed_manifest_versions(fs, vroot, jvm)) == 3
    assert _read(spark, scratch, "t") == {(2, "b", 40), (3, None, 60)}
