"""Count-min / bloom sketch properties: CMS never undercounts and is exact
for keys with no collisions; bloom has zero false negatives; both plans stay
broadcast-probe shaped (no shuffle of the probed side on sketch keys)."""

from pyspark.sql import functions as F

from popelines_spark.llm import sketch as K


def _vals(spark):
    # key i appears i+1 times, i in [0, 20)
    rows = [(i,) for i in range(20) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "k long")


def test_cms_never_undercounts_and_bounds_width(spark):
    df = _vals(spark)
    grid = K.cms_build(df, "k", depth=4, width=512)
    assert grid.count() <= 4 * 512
    probes = spark.createDataFrame([(i,) for i in range(25)], "k long")
    est = {
        r.k: r.cms_est
        for r in K.cms_estimate(grid, probes, "k", depth=4, width=512).collect()
    }
    for i in range(20):
        assert est[i] >= i + 1  # CMS one-sided error
    # 20 keys in a 4x512 grid: collisions are possible but the min over 4
    # independent rows is exact with overwhelming margin at this load.
    assert sum(est[i] == i + 1 for i in range(20)) >= 18
    # unseen keys may collide but never go negative
    for i in range(20, 25):
        assert est[i] >= 0


def test_cms_merge_is_partitioning_invariant(spark):
    df = _vals(spark)
    a = K.cms_build(df.repartition(1), "k", depth=2, width=64)
    b = K.cms_build(df.repartition(7, "k"), "k", depth=2, width=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 50, 2)], "k long")
    bitmap = K.bloom_build(members, "k", m_bits=4096, k=3)
    assert bitmap.count() <= 4096 // K.WORD_BITS
    probes = spark.createDataFrame([(i,) for i in range(50)], "k long")
    got = {
        r.k: r.bloom_pass
        for r in K.bloom_probe(bitmap, probes, "k", m_bits=4096, k=3).collect()
    }
    for i in range(0, 50, 2):
        assert got[i] is True  # membership guarantee
    # false-positive rate at n=25, m=4096, k=3 is ~1e-4: the odd keys
    # should essentially all be rejected (allow 2 collisions for slack).
    assert sum(got[i] for i in range(1, 50, 2)) <= 2


def test_probe_plans_broadcast_the_sketch(spark):
    df = _vals(spark)
    grid = K.cms_build(df, "k", depth=2, width=64)
    plan = K.cms_estimate(grid, df, "k", depth=2, width=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    bitmap = K.bloom_build(df, "k", m_bits=1024, k=2)
    plan2 = K.bloom_probe(bitmap, df, "k", m_bits=1024, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2
