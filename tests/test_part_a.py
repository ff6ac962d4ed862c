"""Part A driver-side semantics: chunk_date_range exact port, fix_json_keys/
values contracts, incremental append, Popeline composite (§3.4)."""

import datetime as dt

from pyspark.sql import functions as F

from popelines_spark.incremental import chunk_date_range, incremental_append, max_watermark
from popelines_spark.pipeline import Popeline
from popelines_spark.schemas import sanitize_identifier


class TestChunkDateRange:
    def test_exact_windows_and_clamp(self):
        # popelines/main.py:208-223: 7-day chunks over 10 days, end clamped
        s, e = dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 11)
        got = list(chunk_date_range(s, e, 7))
        assert got == [
            (dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 8)),
            (dt.datetime(2020, 1, 8), e),
        ]

    def test_exact_multiple_includes_terminal_chunk(self):
        # reference quirk: range(days+1) yields a final (e, e) window when
        # the period divides evenly — preserved faithfully
        s, e = dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 15)
        got = list(chunk_date_range(s, e, 7))
        assert got[-1] == (e, e)
        assert len(got) == 3


class TestFixJson:
    def test_fix_keys_recursive(self, spark):
        p = Popeline(warehouse="/tmp/pls_test_wh", spark=spark)
        obj = [{"1st": 1, "nested rec": {"9lives": "y"}, "l": [{"a.b": 2}]}]
        out = p.fix_json_keys(obj, sanitize_identifier)
        assert out == [{"_1st": 1, "nested_rec": {"_9lives": "y"},
                        "l": [{"a_b": 2}]}]

    def test_fix_values_callback_sees_key(self, spark):
        p = Popeline(warehouse="/tmp/pls_test_wh", spark=spark)
        seen = []

        def cb(value, key, **kw):
            seen.append(key)
            return value * 2 if isinstance(value, int) else value

        out = p.fix_json_values({"a": 1, "n": {"b": 3}}, cb)
        assert out == {"a": 2, "n": {"b": 6}}
        assert set(seen) >= {"a", "b"}

    def test_fix_values_kwargs_passthrough(self, spark):
        p = Popeline(warehouse="/tmp/pls_test_wh", spark=spark)

        def cb(value, key, scale=1, **kw):
            return value * scale if isinstance(value, int) else value

        assert p.fix_json_values({"a": 2}, cb, scale=10) == {"a": 20}


class TestIncremental:
    def test_watermark_and_incremental_append(self, spark, scratch):
        base = spark.createDataFrame(
            [(1, dt.datetime(2020, 1, 1)), (2, dt.datetime(2020, 1, 5))],
            "id long, ts timestamp",
        )
        from popelines_spark.io import write_table, read_table

        write_table(base, scratch, "t", append=False)
        assert max_watermark(read_table(spark, scratch, "t"), "ts") == dt.datetime(2020, 1, 5)

        newer = spark.createDataFrame(
            [(2, dt.datetime(2020, 1, 5)),   # duplicate of watermark: skipped
             (3, dt.datetime(2020, 1, 9))],
            "id long, ts timestamp",
        )
        n = incremental_append(newer, scratch, "t", ts_column="ts")
        assert n == 1
        assert read_table(spark, scratch, "t").count() == 3

    def test_incremental_append_routes_to_manifest_layout(self, spark, scratch):
        """Review r12: a layout-aware read + root write silently looped —
        appended rows were invisible to the manifest reader so the
        watermark never advanced. The write must route by layout too."""
        from popelines_spark.manifest import (
            append_manifest_table, read_manifest_table,
        )

        base = spark.createDataFrame(
            [(1, dt.datetime(2020, 1, 1)), (2, dt.datetime(2020, 1, 5))],
            "id long, ts timestamp",
        )
        append_manifest_table(spark, scratch, "mt", base)
        newer = spark.createDataFrame(
            [(2, dt.datetime(2020, 1, 5)), (3, dt.datetime(2020, 1, 9))],
            "id long, ts timestamp",
        )
        assert incremental_append(newer, scratch, "mt", ts_column="ts") == 1
        # visible through the manifest reader → watermark advanced →
        # the SAME batch re-run appends nothing (the r12 loop is closed)
        assert read_manifest_table(spark, scratch, "mt").count() == 3
        assert incremental_append(newer, scratch, "mt", ts_column="ts") == 0
        assert read_manifest_table(spark, scratch, "mt").count() == 3

    def test_incremental_append_routes_to_snapshot_layout(self, spark, scratch):
        from popelines_spark.io import read_table_snapshot, write_table_snapshot

        base = spark.createDataFrame(
            [(1, dt.datetime(2020, 1, 1)), (2, dt.datetime(2020, 1, 5))],
            "id long, ts timestamp",
        )
        write_table_snapshot(spark, scratch, "st", base)
        newer = spark.createDataFrame(
            [(3, dt.datetime(2020, 1, 9))], "id long, ts timestamp"
        )
        assert incremental_append(newer, scratch, "st", ts_column="ts") == 1
        assert read_table_snapshot(spark, scratch, "st").count() == 3
        assert incremental_append(newer, scratch, "st", ts_column="ts") == 0
        assert read_table_snapshot(spark, scratch, "st").count() == 3


def test_composite_pipeline_end_to_end(spark, scratch):
    """README.md:26-58 shape: messy JSON → sanitize → write → evolve-append
    → query back (SURVEY.md §3.4)."""
    p = Popeline(warehouse=scratch, spark=spark)
    p.write_to_json(
        f"{scratch}/batch1.ndjson",
        [{"1st field": 1, "user name": "ann"},
         {"1st field": 2, "user name": "bob"}],
        prep_for_BQ=True,
    )
    p.write_to_table("Users-Table", file_name=f"{scratch}/batch1.ndjson", append=False)
    p.write_to_json(
        f"{scratch}/batch2.ndjson",
        [{"1st field": 3, "user name": "cee", "new col": 4.5}],
        prep_for_BQ=True,
    )
    p.write_to_table("Users-Table", file_name=f"{scratch}/batch2.ndjson", append=True)
    p.register_table("Users-Table")
    rows = sorted(p.query("SELECT * FROM users_table"), key=lambda r: r._1st_field)
    assert [r.user_name for r in rows] == ["ann", "bob", "cee"]
    assert rows[0].new_col is None and rows[2].new_col == 4.5
    assert p.find_last_entry("Users-Table", "_1st_field") == 3


def test_query_named_parameters(spark, tmp_path):
    """query/query_df bind :name parameters (the injection-safe spelling
    of the reference's f-string SQL assembly)."""
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path / "wh"), spark=spark)
    p.write_to_table("t_params", df=spark.range(10).withColumnRenamed("id", "v"))
    p.register_table("t_params")
    rows = p.query(
        "SELECT count(*) AS n FROM t_params WHERE v >= :lo AND v < :hi",
        args={"lo": 2, "hi": 7},
    )
    assert rows[0]["n"] == 5


def test_upsert_table_merges_into_warehouse(spark, tmp_path):
    """MERGE semantics through the facade: matched keys updated,
    unmatched source rows inserted, unmatched target rows kept."""
    from pyspark.sql import functions as F

    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path / "wh"), spark=spark)
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    p.write_to_table("t_up", df=base)
    delta = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"
    )
    p.upsert_table("t_up", delta, keys=["k"])
    p.register_table("t_up")
    rows = {r["k"]: r["v"] for r in p.query("SELECT k, v FROM t_up")}
    assert rows == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_delete_rows_predicate(spark, tmp_path):
    """DELETE WHERE through the facade: matching rows gone, count
    returned, others intact."""
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path / "wh"), spark=spark)
    p.write_to_table(
        "t_del", df=spark.range(10).withColumnRenamed("id", "v")
    )
    n = p.delete_rows("t_del", "v % 2 = 0")
    assert n == 5
    p.register_table("t_del")
    vals = sorted(r["v"] for r in p.query("SELECT v FROM t_del"))
    assert vals == [1, 3, 5, 7, 9]


def test_update_rows_set_where(spark, tmp_path):
    """UPDATE SET ... WHERE through the facade: matched rows rewritten
    (expressions see the row's own columns), others untouched."""
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path / "wh"), spark=spark)
    p.write_to_table(
        "t_upd", df=spark.range(6).selectExpr("id AS k", "id * 10 AS v")
    )
    n = p.update_rows("t_upd", {"v": "v + 1"}, "k >= 4")
    assert n == 2
    p.register_table("t_upd")
    rows = {r["k"]: r["v"] for r in p.query("SELECT k, v FROM t_upd")}
    assert rows == {0: 0, 1: 10, 2: 20, 3: 30, 4: 41, 5: 51}


def test_delete_rows_null_predicate_keeps_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    are NOT deleted (only TRUE deletes) — the naive NOT(p) filter would
    drop them."""
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path / "wh"), spark=spark)
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 3), (4, None)], "k long, v long"
    )
    p.write_to_table("t_del_null", df=df)
    n = p.delete_rows("t_del_null", "v > 5")
    assert n == 1  # only k=1 (v=10) matches TRUE; NULL v rows survive
    p.register_table("t_del_null")
    ks = sorted(r["k"] for r in p.query("SELECT k FROM t_del_null"))
    assert ks == [2, 3, 4]


def test_update_rows_swap_sees_pre_update_row(spark, tmp_path):
    """SQL UPDATE semantics: SET a=b, b=a swaps because every SET
    expression is evaluated against the pre-update row."""
    from popelines_spark.pipeline import Popeline

    p = Popeline(warehouse=str(tmp_path / "wh"), spark=spark)
    df = spark.createDataFrame([(1, 10, 20), (2, 30, 40)], "k long, a long, b long")
    p.write_to_table("t_swap", df=df)
    n = p.update_rows("t_swap", {"a": "b", "b": "a"}, "k = 1")
    assert n == 1
    p.register_table("t_swap")
    rows = {r["k"]: (r["a"], r["b"]) for r in p.query("SELECT * FROM t_swap")}
    assert rows == {1: (20, 10), 2: (30, 40)}


def test_update_rows_unknown_column_raises(spark, tmp_path):
    from popelines_spark.pipeline import Popeline
    import pytest as _pytest

    p = Popeline(warehouse=str(tmp_path / "wh"), spark=spark)
    p.write_to_table("t_badcol", df=spark.range(3).selectExpr("id AS k"))
    with _pytest.raises(ValueError, match="non-existent"):
        p.update_rows("t_badcol", {"nope": "1"}, "k = 0")
