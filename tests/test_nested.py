"""Deep rename + flatten semantics (FIXTURES.md §2.3 shapes):
depth-3 nesting, repeated records at two levels, empty/null arrays
(LEFT JOIN UNNEST parity, popelines/copy_table.py:63-65)."""

import json

from pyspark.sql import types as T

from popelines_spark.nested import flatten, flatten_all, rename_fields
from popelines_spark.schemas import sanitize_identifier

NESTED_ROWS = [
    {"order id": 1, "cust": {"cust name": "a", "tags": ["x", "y"],
                             "addr": {"zip code": "85001"}},
     "line items": [
         {"sku id": "s1", "qty": 2,
          "discounts": [{"disc type": "pct", "amt": 0.1}]},
         {"sku id": "s2", "qty": 1, "discounts": []}]},
    {"order id": 2, "cust": {"cust name": "b", "tags": [],
                             "addr": {"zip code": "85002"}},
     "line items": []},
    {"order id": 3, "cust": None, "line items": None},
]


def _df(spark):
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in NESTED_ROWS])
    )


def test_rename_depth3_including_arrays(spark):
    out = rename_fields(_df(spark), sanitize_identifier)
    s = out.schema
    assert set(s.names) == {"order_id", "cust", "line_items"}
    cust = s["cust"].dataType
    assert set(cust.names) == {"addr", "cust_name", "tags"}
    assert cust["addr"].dataType.names == ["zip_code"]
    li = s["line_items"].dataType.elementType
    assert set(li.names) == {"discounts", "qty", "sku_id"}
    assert set(li["discounts"].dataType.elementType.names) == {"amt", "disc_type"}
    # values survive the rebuild
    rows = {r.order_id: r for r in out.collect()}
    assert rows[1].cust.cust_name == "a"
    assert rows[1].line_items[0].discounts[0].disc_type == "pct"
    assert rows[3].cust is None and rows[3].line_items is None


def test_rename_drops_fields_at_depth(spark):
    out = rename_fields(
        _df(spark),
        lambda k: "" if k == "qty" else sanitize_identifier(k),
    )
    li = out.schema["line_items"].dataType.elementType
    assert set(li.names) == {"discounts", "sku_id"}


def test_flatten_outer_keeps_empty_and_null(spark):
    df = rename_fields(_df(spark), sanitize_identifier)
    flat = flatten(df.select("order_id", "line_items"), "line_items", alias="li")
    got = {(r.order_id, r.li_sku_id) for r in flat.collect()}
    # empty array (order 2) and null array (order 3) keep their parent row
    assert got == {(1, "s1"), (1, "s2"), (2, None), (3, None)}
    inner = flatten(
        df.select("order_id", "line_items"), "line_items", alias="li", outer=False
    )
    assert {r.order_id for r in inner.collect()} == {1}


def test_flatten_all_reaches_leaves(spark):
    df = rename_fields(_df(spark), sanitize_identifier)
    flat = flatten_all(df)
    for f in flat.schema.fields:
        assert not isinstance(f.dataType, (T.ArrayType, T.StructType)), f
    rows = [r for r in flat.collect() if r.order_id == 1]
    assert {r.line_items_discounts_disc_type for r in rows} >= {"pct", None}


def test_roundtrip_write_read_preserves_schema(spark, scratch):
    df = rename_fields(_df(spark), sanitize_identifier)
    df.write.parquet(f"{scratch}/nested")
    back = spark.read.parquet(f"{scratch}/nested")
    assert back.schema == df.schema
    assert back.count() == 3


def test_rename_fields_dotted_column_is_not_a_struct_path(spark):
    """A top-level column literally named 'a.b' must be renamed from its
    OWN data — unquoted F.col('a.b') reads the struct path a.b instead
    (review r11, confirmed corruption repro)."""
    from popelines_spark.nested import rename_fields
    from popelines_spark.schemas import sanitize_identifier

    df = spark.createDataFrame(
        [(1, {"b": 99})], "`a.b` long, a struct<b long>"
    )
    out = rename_fields(df, sanitize_identifier)
    row = out.collect()[0]
    assert row["a_b"] == 1, "renamed column read the struct path's data"


def test_rename_fields_collision_fails_fast(spark):
    from popelines_spark.nested import rename_fields
    from popelines_spark.schemas import sanitize_identifier

    df = spark.createDataFrame([(1, 2)], "`x y` long, x_y long")
    import pytest

    with pytest.raises(ValueError, match="both"):
        rename_fields(df, sanitize_identifier)


def test_flatten_all_collision_fails_at_cause(spark):
    from popelines_spark.nested import flatten_all

    df = spark.createDataFrame(
        [({"b": 1}, 9)], "a struct<b long>, a_b long"
    )
    import pytest

    with pytest.raises(ValueError, match="already exist"):
        flatten_all(df)
