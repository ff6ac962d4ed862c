"""plan_star_join / star_join / estimate_stats — the multi-way star
planner (SURVEY.md §2 round-10 appendix; VERDICT r9 "auto-optimizer
path" direction).

Split like the other planner suites: pure decision-function tests (no
Spark) + execution/plan-shape tests on the shared session.
"""

from hypothesis import given, strategies as st
import pytest

from popelines_spark.planner import estimate_stats, plan_star_join
from popelines_spark.operators.star import star_join
from tests.conftest import SF_DIR


def _stats(ndv_k=None, rows=10_000, broadcast=False, key="k"):
    s = {
        "rows": rows,
        "est_memory_bytes": 1 << 30,
        "suggest_broadcast": broadcast,
        "columns": {},
    }
    if ndv_k is not None:
        s["columns"][key] = {"approx_ndv": ndv_k}
    return s


FACT = {
    "rows": 10**9,
    "suggest_broadcast": False,
    "columns": {
        "a": {"approx_ndv": 1000},
        "b": {"approx_ndv": 1000},
        "c": {"approx_ndv": 1000},
    },
}


def test_inner_legs_ordered_most_selective_first():
    plan = plan_star_join(
        FACT,
        [
            {"name": "wide", "on": "a", "stats": _stats(900, key="a")},
            {"name": "narrow", "on": "b", "stats": _stats(10, key="b")},
            {"name": "mid", "on": "c", "stats": _stats(400, key="c")},
        ],
    )
    assert plan["order"] == ["narrow", "mid", "wide"]
    assert plan["legs"]["narrow"]["selectivity"] == pytest.approx(0.01)
    assert plan["legs"]["wide"]["selectivity"] == pytest.approx(0.9)


def test_left_legs_run_last_in_user_order():
    plan = plan_star_join(
        FACT,
        [
            {"name": "l1", "on": "a", "how": "left",
             "stats": _stats(1, key="a")},
            {"name": "i1", "on": "b", "stats": _stats(500, key="b")},
            {"name": "l2", "on": "c", "how": "left",
             "stats": _stats(2, key="c")},
        ],
    )
    # left legs keep user order AFTER every inner leg, however selective
    # their key stats look — a left join never filters the fact
    assert plan["order"] == ["i1", "l1", "l2"]
    assert plan["legs"]["l1"]["selectivity"] == 1.0


def test_unknown_stats_assume_nonselective_and_keep_user_order():
    plan = plan_star_join(
        FACT,
        [
            {"name": "x", "on": "a", "stats": None},
            {"name": "sel", "on": "b", "stats": _stats(10, key="b")},
            {"name": "y", "on": "c", "stats": _stats(None, key="c")},
        ],
    )
    assert plan["order"] == ["sel", "x", "y"]


def test_right_full_legs_refused():
    for how in ("right", "full", "full_outer", "left_anti"):
        with pytest.raises(ValueError, match="star"):
            plan_star_join(FACT, [{"name": "d", "on": "a", "how": how}])
    with pytest.raises(ValueError, match="duplicate"):
        plan_star_join(
            FACT,
            [{"name": "d", "on": "a"}, {"name": "d", "on": "b"}],
        )


def test_leg_strategies_match_plan_join():
    plan = plan_star_join(
        FACT,
        runtime_filter="auto",
        dims=[
            # broadcastable dim → broadcast, bloom short-circuited
            {"name": "bc", "on": "a",
             "stats": _stats(10, broadcast=True, key="a")},
            # selective non-broadcastable inner dim → bloom prefilter
            {"name": "bl", "on": "b", "stats": _stats(10, key="b")},
            # LEFT leg: bloom must NEVER fire (would drop unmatched rows)
            {"name": "lf", "on": "c", "how": "left",
             "stats": _stats(10, key="c")},
        ],
    )
    assert plan["legs"]["bc"]["broadcast"] is True
    assert plan["legs"]["bc"]["bloom_m_bits"] is None
    assert plan["legs"]["bl"]["broadcast"] is False
    assert plan["legs"]["bl"]["bloom_m_bits"] is not None
    assert plan["legs"]["lf"]["bloom_m_bits"] is None
    # bloom is OPT-IN (join_tables contract): the default plan only orders
    default = plan_star_join(
        FACT, [{"name": "bl", "on": "b", "stats": _stats(10, key="b")}]
    )
    assert default["legs"]["bl"]["bloom_m_bits"] is None


@given(
    ndvs=st.lists(st.integers(1, 2000), min_size=1, max_size=8),
    hows=st.data(),
)
def test_plan_star_join_properties(ndvs, hows):
    dims = []
    for i, n in enumerate(ndvs):
        how = hows.draw(st.sampled_from(["inner", "left"]), label=f"how{i}")
        dims.append(
            {"name": f"d{i}", "on": "a", "how": how,
             "stats": _stats(n, key="a")}
        )
    plan = plan_star_join(FACT, dims)
    # order is a permutation of the legs
    assert sorted(plan["order"]) == sorted(d["name"] for d in dims)
    inner = [n for n in plan["order"]
             if plan["legs"][n]["how"] == "inner"]
    left = [n for n in plan["order"] if plan["legs"][n]["how"] == "left"]
    # every inner leg precedes every left leg
    assert plan["order"] == inner + left
    # inner selectivities are non-decreasing along the planned order
    sels = [plan["legs"][n]["selectivity"] for n in inner]
    assert sels == sorted(sels)
    # left legs keep user order
    user_left = [d["name"] for d in dims if d["how"] == "left"]
    assert left == user_left


# --- execution on the shared session ---------------------------------


def _frames(spark):
    from pyspark.sql import functions as F

    from popelines_spark.tables import load

    fact = load(spark, SF_DIR, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        "l_extendedprice",
    )
    part_d = (
        load(spark, SF_DIR, "part")
        .filter(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("pk"), "p_brand")
    )
    supp_d = load(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_nationkey"
    )
    return fact, part_d, supp_d


def test_estimate_stats_shape(spark):
    _, part_d, _ = _frames(spark)
    s = estimate_stats(part_d, keys=["pk"])
    assert s["rows"] == part_d.count()
    assert 0 < s["columns"]["pk"]["approx_ndv"] <= s["rows"] * 1.1
    assert s["suggest_broadcast"] is True  # tiny dim at sf0.001
    tight = estimate_stats(part_d, keys=["pk"], broadcast_threshold_bytes=1)
    assert tight["suggest_broadcast"] is False
    assert tight["est_memory_bytes"] > part_d.count() * 4  # > key width


def test_star_join_matches_sequential_joins(spark):
    fact, part_d, supp_d = _frames(spark)
    legs = [
        {"name": "part", "df": part_d, "on": "pk"},
        {"name": "supplier", "df": supp_d, "on": "sk"},
    ]
    plan = plan_star_join(
        estimate_stats(fact, keys=["pk", "sk"]),
        [
            {"name": "part", "on": "pk",
             "stats": estimate_stats(part_d, keys=["pk"])},
            {"name": "supplier", "on": "sk",
             "stats": estimate_stats(supp_d, keys=["sk"])},
        ],
    )
    got = star_join(fact, legs, plan)
    want = fact.join(part_d, "pk").join(supp_d, "sk")
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    assert (
        sorted(map(tuple, got.select(*cols).collect()))
        == sorted(map(tuple, want.select(*cols).collect()))
    )


def test_star_join_executes_planned_rewrites(spark):
    """Broadcast legs show up as BroadcastHashJoin; a bloom leg puts the
    xxhash64 probe below the join — forced via a synthetic plan so the
    non-broadcastable regime is exercised at test scale."""
    from popelines_spark.plans.inspect import physical_plan, plan_report

    fact, part_d, supp_d = _frames(spark)
    legs = [
        {"name": "part", "df": part_d, "on": "pk"},
        {"name": "supplier", "df": supp_d, "on": "sk"},
    ]
    plan = {
        "order": ["part", "supplier"],
        "legs": {
            "part": {"broadcast": False, "bloom_m_bits": 1 << 14,
                     "how": "inner"},
            "supplier": {"broadcast": True, "bloom_m_bits": None,
                         "how": "inner"},
        },
        "reasons": [],
    }
    got = star_join(fact, legs, plan)
    phys = physical_plan(got)
    assert "xxhash64" in phys
    assert plan_report(got)["broadcast_joins"] >= 1
    # the rewrites stay semantically invisible
    want = fact.join(part_d, "pk").join(supp_d, "sk")
    assert got.count() == want.count()
    with pytest.raises(ValueError, match="unknown legs"):
        star_join(fact, [{"name": "part", "df": part_d, "on": "pk"}], plan)


def test_registered_query_planner_picks_expected_order(spark):
    """In b_join_star_planned's setting the planner must reorder the
    deliberately-suboptimal user order (orders-left, supplier, part)
    to part → supplier → orders."""
    from pyspark.sql import functions as F

    from popelines_spark.tables import load

    fact = load(spark, SF_DIR, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_orderkey").alias("ok"),
    )
    part_d = (
        load(spark, SF_DIR, "part")
        .filter(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("pk"))
    )
    supp_d = (
        load(spark, SF_DIR, "supplier")
        .filter(F.col("s_nationkey") < 10)
        .select(F.col("s_suppkey").alias("sk"))
    )
    ord_d = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("ok")
    )
    plan = plan_star_join(
        estimate_stats(fact, keys=["pk", "sk", "ok"]),
        [
            {"name": "orders", "on": "ok", "how": "left",
             "stats": estimate_stats(ord_d, keys=["ok"])},
            {"name": "supplier", "on": "sk",
             "stats": estimate_stats(supp_d, keys=["sk"])},
            {"name": "part", "on": "pk",
             "stats": estimate_stats(part_d, keys=["pk"])},
        ],
    )
    assert plan["order"] == ["part", "supplier", "orders"]


def test_skew_auto_salts_inner_legs_only():
    fact = dict(FACT)
    fact["rows"] = 10**9
    fact["keys"] = {
        "a": {"max_key_rows": 5 * 10**8, "mean_key_rows": 10**6,
              "skew_ratio": 500.0},
        "c": {"max_key_rows": 5 * 10**8, "mean_key_rows": 10**6,
              "skew_ratio": 500.0},
    }
    plan = plan_star_join(
        fact,
        [
            {"name": "hot", "on": "a", "stats": _stats(500, key="a")},
            {"name": "cold", "on": "b", "stats": _stats(500, key="b")},
            {"name": "hotleft", "on": "c", "how": "left",
             "stats": _stats(500, key="c")},
        ],
        skew="auto",
        shuffle_partitions=32,
    )
    assert plan["legs"]["hot"]["salt_buckets"] is not None
    assert plan["legs"]["cold"]["salt_buckets"] is None  # no keys profile
    # a left leg never salts, however hot its key: salted_join replicates
    # the dim ×buckets, which a left join would double-count
    assert plan["legs"]["hotleft"]["salt_buckets"] is None
    # default is off, like join_tables
    off = plan_star_join(
        fact, [{"name": "hot", "on": "a", "stats": _stats(500, key="a")}]
    )
    assert off["legs"]["hot"]["salt_buckets"] is None


def test_star_join_executes_salted_leg(spark):
    fact, part_d, supp_d = _frames(spark)
    plan = {
        "order": ["part", "supplier"],
        "legs": {
            "part": {"broadcast": False, "bloom_m_bits": None,
                     "salt_buckets": 4, "how": "inner"},
            "supplier": {"broadcast": True, "bloom_m_bits": None,
                         "how": "inner"},
        },
        "reasons": [],
    }
    legs = [
        {"name": "part", "df": part_d, "on": "pk"},
        {"name": "supplier", "df": supp_d, "on": "sk"},
    ]
    got = star_join(fact, legs, plan)
    want = fact.join(part_d, "pk").join(supp_d, "sk")
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    assert (
        sorted(map(tuple, got.select(*cols).collect()))
        == sorted(map(tuple, want.select(*cols).collect()))
    )


def test_empty_dim_is_most_selective_not_statless():
    """NDV 0 (empty / filtered-to-empty dim) is the MOST selective leg;
    a truthiness check would misfile it as no-stats and order it last."""
    plan = plan_star_join(
        FACT,
        [
            {"name": "wide", "on": "a", "stats": _stats(900, key="a")},
            {"name": "empty", "on": "b", "stats": _stats(0, key="b")},
        ],
    )
    assert plan["order"] == ["empty", "wide"]
    assert plan["legs"]["empty"]["selectivity"] == 0.0


def test_estimate_stats_empty_frame_broadcasts(spark):
    from pyspark.sql import functions as F

    from popelines_spark.tables import load

    empty = load(spark, SF_DIR, "supplier").filter(F.lit(False)).select(
        F.col("s_suppkey").alias("sk")
    )
    s = estimate_stats(empty, keys=["sk"])
    assert s["rows"] == 0
    assert s["suggest_broadcast"] is True  # empty build side ships free
    assert s["columns"]["sk"]["approx_ndv"] == 0


def test_popeline_star_join_reads_manifest_tables(spark, tmp_path):
    """star_join/join_tables route through read_table_auto: a manifest
    dim reads its live tip (post-DML), not the directory glob."""
    from pyspark.sql import functions as F

    from popelines_spark import io, manifest
    from popelines_spark.manifest_dml import delete_manifest_rows
    from popelines_spark.pipeline import Popeline
    from popelines_spark.tables import load

    wh = str(tmp_path)
    p = Popeline(warehouse=wh, spark=spark)
    fact = load(spark, SF_DIR, "lineitem").select(
        F.col("l_suppkey").alias("sk"), "l_extendedprice"
    )
    io.write_table(fact, wh, "fact", append=False)
    dim = load(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_nationkey"
    )
    manifest.append_manifest_table(spark, wh, "dim", dim)
    delete_manifest_rows(spark, wh, "dim", "s_nationkey >= 10")
    p.analyze_table("fact")
    p.analyze_table("dim")
    got = p.star_join("fact", [{"table": "dim", "on": "sk"}])
    want = fact.join(
        dim.filter(F.col("s_nationkey") < 10), "sk"
    )
    assert got.count() == want.count()
    two = p.join_tables("fact", "dim", on="sk")
    assert two.count() == want.count()


def test_join_tables_list_routes_three_dim_star(spark, tmp_path):
    """The paved path (VERDICT r10 #4): join_tables with a LIST of dims
    composes the full decision matrix automatically — leg order and
    broadcast planned from at-rest stats alone — and (VERDICT r10 #6)
    the planned ORDER is actually APPLIED: the analyzed plan must nest
    the most selective dim innermost even though the user passed it
    LAST. Fails if star_join stops consuming plan['order']."""
    import json

    from pyspark.sql import functions as F

    from popelines_spark import io
    from popelines_spark.pipeline import Popeline
    from popelines_spark.tables import load

    wh = str(tmp_path)
    p = Popeline(warehouse=wh, spark=spark)
    li = load(spark, SF_DIR, "lineitem")
    fact = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        "l_extendedprice",
    )
    io.write_table(fact, wh, "fact3", append=False)
    # selectivity gradient (TPC-H dims otherwise join totally): orders
    # keeps every fact key, part keeps ~half, supplier ~a fifth — the
    # stats-only plan must therefore run supplier first, orders last
    io.write_table(
        load(spark, SF_DIR, "orders").select(
            F.col("o_orderkey").alias("ok"), "o_orderstatus"
        ),
        wh, "d_orders",
    )
    io.write_table(
        load(spark, SF_DIR, "part")
        .filter(F.col("p_partkey") % 2 == 0)
        .select(F.col("p_partkey").alias("pk"), "p_brand"),
        wh, "d_part",
    )
    io.write_table(
        load(spark, SF_DIR, "supplier")
        .filter(F.col("s_suppkey") % 5 == 0)
        .select(F.col("s_suppkey").alias("sk"), "s_acctbal"),
        wh, "d_supp",
    )
    for t in ("fact3", "d_orders", "d_part", "d_supp"):
        stats = p.analyze_table(t)
        # tiny SF makes everything broadcastable; pin suppliers as the
        # one broadcast dim so the plan exercises both strategies
        if t != "d_supp":
            stats["suggest_broadcast"] = False
            (tmp_path / t / "_stats.json").write_text(json.dumps(stats))
            (tmp_path / t / "._stats.json.crc").unlink(missing_ok=True)
    # user order: least selective first (orders ~ every fact key keeps
    # everything; supplier is the most selective non-trivial key)
    plan = p.explain_star_join(
        "fact3",
        [
            {"table": "d_orders", "on": "ok"},
            {"table": "d_part", "on": "pk"},
            {"table": "d_supp", "on": "sk"},
        ],
    )
    assert plan["order"][0] == "d_supp"          # planned from stats alone
    assert plan["legs"]["d_supp"]["broadcast"]
    assert not plan["legs"]["d_orders"]["broadcast"]
    got = p.join_tables(
        "fact3", ["d_orders", "d_part", "d_supp"], on=["ok", "pk", "sk"]
    )
    # ORDER APPLIED: in the analyzed (pre-optimizer) plan tree the first
    # joined leg sits deepest, printed before later legs' subtrees — so
    # s_acctbal (planned first) must appear before p_brand, and p_brand
    # before o_orderstatus, reversing the user's order
    analyzed = got._jdf.queryExecution().analyzed().toString()
    assert (
        analyzed.index("s_acctbal")
        < analyzed.index("p_brand")
        < analyzed.index("o_orderstatus")
    )
    # result invariance vs the plain user-order join
    want = (
        fact.join(spark.read.parquet(f"{wh}/d_orders"), "ok")
        .join(spark.read.parquet(f"{wh}/d_part"), "pk")
        .join(spark.read.parquet(f"{wh}/d_supp"), "sk")
    )
    assert got.count() == want.count()
    assert got.agg(F.sum("l_extendedprice")).collect()[0][0] == pytest.approx(
        want.agg(F.sum("l_extendedprice")).collect()[0][0]
    )
