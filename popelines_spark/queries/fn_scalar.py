"""SURVEY.md §2 B.8 — scalar function families.

Reference basis: identifier sanitize rules (popelines/main.py:185-190 →
b_fn_sanitize_ident / b_fn_regex / b_fn_string), timedelta arithmetic and
date chunking (popelines/main.py:208-223 → b_fn_date / b_fn_date_seq),
type map (popelines/copy_table.py:1-9 → b_fn_cast), STRUCT/ARRAY
constructors (copy_table.py:13-15,38-41,53 → b_fn_struct / b_fn_array),
open JSON objects (popelines/main.py:255-262 → b_fn_map / b_fn_json).

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; zero Python in the row path.

Cross-engine notes baked in:
 - round() on raw doubles differs between engines at half-boundaries →
   round through DECIMAL (exact) then cast back.
 - double→int CAST truncates in Spark but rounds in DuckDB → never cast
   double to int directly in parity queries.
 - Spark length/size/floor return int/long; DuckDB returns BIGINT/DOUBLE →
   cast both sides to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from popelines_spark.functions.identifiers import sanitize_col, sanitize_sql
from popelines_spark.registry import query
from popelines_spark.queries._util import T


@query(
    "b_fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           replace(p_type, ' ', '-') AS dashed_type,
           concat(p_brand, ':', p_type) AS brand_type,
           substring(p_name, 1, 8) AS name8,
           CAST(length(p_name) AS BIGINT) AS name_len,
           trim('  ' || p_brand || ' ') AS trimmed,
           str_split(p_type, ' ')[1] AS first_word
    FROM part
    """,
)
def b_fn_string(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("-")).alias("dashed_type"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), "p_brand", F.lit(" "))).alias("trimmed"),
        F.split("p_type", " ").getItem(0).alias("first_word"),
    )


@query(
    "b_fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
           regexp_matches(p_name, '^[a-m]') AS starts_low
    FROM part
    """,
)
def b_fn_regex(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "").alias("consonants"),
        F.regexp_extract("p_type", "([A-Z]+)$", 1).alias("last_word"),
        F.col("p_name").rlike("^[a-m]").alias("starts_low"),
    )


@query(
    "b_fn_sanitize_ident",
    oracle=f"""
    SELECT p_partkey,
           {sanitize_sql("CAST(p_size AS VARCHAR) || '. ' || p_name || '!'")}
             AS clean_ident
    FROM part
    """,
)
def b_fn_sanitize_ident(spark, sf_dir):
    """The exact 3-rule sanitizer (popelines/main.py:185-190) as a codegen'd
    column expression, applied to a deliberately messy synthesized string."""
    p = T(spark, sf_dir, "part")
    messy = F.concat(
        F.col("p_size").cast("string"), F.lit(". "), "p_name", F.lit("!")
    )
    return p.select("p_partkey", sanitize_col(messy).alias("clean_ident"))


@query(
    "b_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                AS BIGINT) AS days_to_eoy
    FROM orders
    """,
)
def b_fn_date(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # Emit TIMESTAMP not DATE: engines' pandas representations of DATE
        # differ (datetime.date vs datetime64) — midnight TIMESTAMP is
        # unambiguous cross-engine (see module docstring).
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("long").alias(
            "days_to_eoy"
        ),
    )


@query(
    "b_fn_date_seq",
    oracle="""
    SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                  TIMESTAMP '1995-12-31',
                                  INTERVAL 7 DAY)) AS chunk_start
    """,
)
def b_fn_date_seq(spark, sf_dir):
    """chunk_date_range (popelines/main.py:208-223) as a distributed
    sequence: one row per 7-day chunk start (TIMESTAMP output — see
    module docstring on DATE representations)."""
    from popelines_spark.incremental import date_series

    return date_series(spark, "1995-01-01", "1995-12-31", step_days=7).select(
        F.col("chunk_start").cast("timestamp").alias("chunk_start")
    )


@query(
    "b_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity + 1.0 AS qty_plus,
           l_extendedprice * l_discount AS disc_amt,
           l_extendedprice / l_quantity AS unit_price,
           CAST(round(CAST(l_extendedprice AS DECIMAL(20,4)), 1) AS DOUBLE)
             AS price_r1,
           abs(l_extendedprice - 30000.0) AS dist_30k,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity / 3.0) AS BIGINT) AS qty_ceil3,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
)
def b_fn_math(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + 1.0).alias("qty_plus"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("disc_amt"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.round(F.col("l_extendedprice").cast("decimal(20,4)"), 1)
        .cast("double")
        .alias("price_r1"),
        F.abs(F.col("l_extendedprice") - 30000.0).alias("dist_30k"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 3.0).alias("qty_ceil3"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "b_fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 400000 THEN 'jumbo'
                WHEN o_totalprice > 200000 THEN 'large'
                ELSE 'regular' END AS size_class,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_label,
           CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice
                ELSE 0.0 END AS urgent_value
    FROM orders
    """,
)
def b_fn_cond(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 400000, "jumbo")
        .when(F.col("o_totalprice") > 200000, "large")
        .otherwise("regular")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
        .otherwise(0.0)
        .alias("urgent_value"),
    )


@query(
    "b_fn_cast",
    oracle="""
    SELECT c_custkey,
           CAST(c_nationkey AS BIGINT) AS nat_long,
           CAST(c_nationkey AS DOUBLE) AS nat_dbl,
           CAST(c_custkey AS VARCHAR) AS key_str,
           CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_rt,
           CAST(c_acctbal > 0 AS BOOLEAN) AS in_credit
    FROM customer
    """,
)
def b_fn_cast(spark, sf_dir):
    """Casts across the §1.2 type vocabulary (copy_table.py:1-9)."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nat_long"),
        F.col("c_nationkey").cast("double").alias("nat_dbl"),
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_custkey").cast("string").cast("long").alias("key_rt"),
        (F.col("c_acctbal") > 0).cast("boolean").alias("in_credit"),
    )


@query(
    "b_fn_array",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents)
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           list_contains(ws, 'data') AS has_data,
           ws[2] AS second_word,
           array_to_string(list_sort(ws[1:4]), ',') AS first4_sorted,
           array_to_string([upper(w) FOR w IN ws[1:3]], ',') AS first3_upper
    FROM t
    """,
)
def b_fn_array(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.array_contains(ws, "data").alias("has_data"),
        F.element_at(ws, 2).alias("second_word"),
        F.array_join(F.array_sort(F.slice(ws, 1, 4)), ",").alias("first4_sorted"),
        F.array_join(
            F.transform(F.slice(ws, 1, 3), lambda w: F.upper(w)), ","
        ).alias("first3_upper"),
    )


@query(
    "b_fn_struct",
    oracle="""
    SELECT p_partkey, p_brand AS brand, p_size AS sz
    FROM part WHERE p_size >= 25
    """,
)
def b_fn_struct(spark, sf_dir):
    """STRUCT(...) constructor + field access (copy_table.py:38-41)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    built = p.select(
        "p_partkey", F.struct(F.col("p_brand"), F.col("p_size")).alias("s")
    )
    return built.select(
        "p_partkey",
        F.col("s").getField("p_brand").alias("brand"),
        F.col("s").getField("p_size").alias("sz"),
    )


@query(
    "b_fn_map",
    oracle="""
    WITH t AS (SELECT p_partkey,
                      MAP {'brand': p_brand, 'type': p_type} AS m
               FROM part)
    SELECT p_partkey,
           m['brand'][1] AS brand_val,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
    FROM t
    """,
)
def b_fn_map(spark, sf_dir):
    """Open-key JSON objects as MapType (popelines/main.py:255-262)."""
    p = T(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@query(
    "b_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           json_valid(props) AS is_valid,
           CAST({'k': CAST(json_extract(props, '$.k') AS BIGINT)} AS VARCHAR)
             = CAST({'k': CAST(json_extract(props, '$.k') AS BIGINT)} AS VARCHAR)
             AS roundtrip_ok
    FROM events
    """,
)
def b_fn_json(spark, sf_dir):
    """JSON parse/extract/serialize over events.props
    (json.loads/json.dumps, popelines/main.py:178,203)."""
    e = T(spark, sf_dir, "events")
    parsed = F.from_json("props", "k long")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_val"),
        F.expr("isnotnull(from_json(props, 'k long'))").alias("is_valid"),
        (F.to_json(parsed) == F.to_json(parsed)).alias("roundtrip_ok"),
    )
