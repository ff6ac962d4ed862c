"""Third-engine audit, round 13 batch C — distribution shapes, growth
and engagement metrics. Completes the formula-bearing `c_*` sweep begun
in r12: after this batch the statistics family has ~69 independent
numpy recomputations.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run(spark):
    from popelines_spark import registry

    registry.load_all()

    def _run(name):
        return registry.SPARK_QUERIES[name](spark, SF).toPandas()

    return _run


def _orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _li():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _cust():
    return pd.read_parquet(f"{SF}/customer.parquet")


def test_cdf_points_matches_numpy(run):
    got = run("c_cdf_points").set_index(["l_returnflag", "x"]).sort_index()
    li = _li()
    for rf, g in li.groupby("l_returnflag"):
        q = g.l_quantity.to_numpy()
        for x in (1.0, 10.0, 25.0, 40.0, 50.0):
            cdf = (q <= x).mean()
            assert abs(got.loc[(rf, x), "cdf"] - cdf) < 1e-12, (rf, x)


def test_pareto_8020_matches_numpy(run):
    got = run("c_pareto_8020").set_index("seg").sort_index()
    o = _orders()
    cu = _cust()[["c_custkey", "c_mktsegment"]]
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    rev = (
        j.groupby(["c_mktsegment", "o_custkey"]).o_totalprice.sum()
        .reset_index()
    )
    for seg, g in rev.groupby("c_mktsegment"):
        g = g.sort_values(
            ["o_totalprice", "o_custkey"], ascending=[False, True]
        )
        cum = g.o_totalprice.cumsum().to_numpy()
        total = g.o_totalprice.sum()
        n_top = int((cum < 0.8 * total).sum()) + 1
        row = got.loc[seg]
        assert row["n_customers"] == len(g), seg
        assert row["n_top80"] == n_top, seg
        assert abs(row["top80_frac"] - n_top / len(g)) < 1e-6, seg


def test_stickiness_matches_numpy(run):
    got = run("c_stickiness").set_index("week").sort_index()
    ev = _events()
    # Spark date_trunc('week') is ISO Monday-start
    week = (
        ev.ts.dt.normalize()
        - pd.to_timedelta(ev.ts.dt.dayofweek, unit="D")
    )
    day = ev.ts.dt.floor("D")
    df = pd.DataFrame(
        {"week": week, "day": day, "user_id": ev.user_id}
    )
    for wk, g in df.groupby("week"):
        dau = g.groupby("day").user_id.nunique()
        wau = g.user_id.nunique()
        stick = (dau.sum() / len(dau)) / wau
        row = got.loc[wk]
        assert row["n_days"] == len(dau), wk
        assert row["sum_dau"] == int(dau.sum()), wk
        assert row["wau"] == wau, wk
        assert abs(row["stickiness"] - stick) < 1e-9, wk


def test_qoq_growth_matches_numpy(run):
    got = run("c_qoq_growth").set_index(["seg", "quarter"]).sort_index()
    o = _orders()
    cu = _cust()[["c_custkey", "c_mktsegment"]]
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["quarter"] = j.o_orderdate.dt.to_period("Q").dt.start_time
    q = (
        j.groupby(["c_mktsegment", "quarter"]).o_totalprice.sum()
        .reset_index()
    )
    n_checked = 0
    for seg, g in q.groupby("c_mktsegment"):
        g = g.sort_values("quarter").reset_index(drop=True)
        for i in range(1, len(g)):
            growth = g.o_totalprice[i] / g.o_totalprice[i - 1] - 1.0
            row = got.loc[(seg, g.quarter[i])]
            assert abs(row["qoq_growth"] - growth) < 1e-5, (seg, i)
            n_checked += 1
    assert n_checked == len(got)


def test_clv_decay_matches_numpy(run):
    got = run("c_clv_decay").set_index("custkey").sort_index()
    o = _orders()
    anchor = o.o_orderdate.max()
    k = np.minimum(
        ((anchor - o.o_orderdate).dt.days // 365).to_numpy(), 10
    )
    term = o.o_totalprice.to_numpy() * (0.5 ** k)
    ref = pd.DataFrame({"c": o.o_custkey, "t": term}).groupby("c").t.sum()
    assert set(got.index) == set(ref.index)
    for ck in ref.index:
        assert abs(got.loc[ck, "decayed_value"] - ref[ck]) < 1e-3, ck


def test_percentile_bands_matches_numpy(run):
    got = run("c_percentile_bands").set_index(
        ["nationkey", "band"]
    ).sort_index()
    o = _orders()
    cu = _cust()[["c_custkey", "c_nationkey"]]
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    spend = (
        j.groupby(["c_nationkey", "c_custkey"]).o_totalprice.sum()
        .reset_index()
    )
    for nk, g in spend.groupby("c_nationkey"):
        g = g.sort_values(["o_totalprice", "c_custkey"]).reset_index(
            drop=True
        )
        n = len(g)
        g["band"] = (np.arange(n) * 4) // n
        ref = g.groupby("band").agg(
            n_customers=("c_custkey", "size"),
            band_spend=("o_totalprice", "sum"),
        )
        for b in ref.index:
            row = got.loc[(nk, b)]
            assert row["n_customers"] == ref.loc[b, "n_customers"], (nk, b)
            assert abs(
                row["band_spend"] - ref.loc[b, "band_spend"]
            ) < 1e-2, (nk, b)


def test_hist_equiwidth_matches_numpy(run):
    got = run("c_hist_equiwidth").set_index("bin").sort_index()
    o = _orders()
    v = o.o_totalprice.to_numpy()
    mn, mx = v.min(), v.max()
    bins = np.minimum(np.floor((v - mn) * 20.0 / (mx - mn)), 19).astype(int)
    ref = pd.Series(bins).value_counts().sort_index()
    assert list(got.index) == list(ref.index)
    for b in ref.index:
        row = got.loc[b]
        assert row["n"] == ref[b], b
        assert abs(row["lo"] - (mn + b * (mx - mn) / 20.0)) < 1e-9
        assert abs(row["hi"] - (mn + (b + 1) * (mx - mn) / 20.0)) < 1e-9


def test_histogram2d_matches_numpy(run):
    got = run("c_histogram2d").set_index(
        ["qty_bucket", "price_bucket"]
    ).sort_index()
    li = _li()
    qb = np.minimum(np.floor(li.l_quantity.to_numpy() / 10), 4).astype(int)
    pb = np.minimum(
        np.floor(li.l_extendedprice.to_numpy() / 20000), 4
    ).astype(int)
    ref = pd.DataFrame(
        {"q": qb, "p": pb, "rev": li.l_extendedprice}
    ).groupby(["q", "p"]).agg(n=("rev", "size"), revenue=("rev", "sum"))
    assert set(got.index) == set(ref.index)
    for ix in ref.index:
        assert got.loc[ix, "n"] == ref.loc[ix, "n"], ix
        assert abs(got.loc[ix, "revenue"] - ref.loc[ix, "revenue"]) < 1e-2


def test_seasonality_dow_matches_numpy(run):
    got = run("c_seasonality_dow").set_index("dow").sort_index()
    o = _orders()
    dow = (o.o_orderdate.dt.dayofweek + 1) % 7  # Sunday=0 convention
    ref = o.groupby(dow).agg(
        n_orders=("o_orderkey", "size"), revenue=("o_totalprice", "sum")
    )
    total = o.o_totalprice.sum()
    assert set(got.index) == set(ref.index)
    for d in ref.index:
        row = got.loc[d]
        assert row["n_orders"] == ref.loc[d, "n_orders"], d
        assert abs(row["revenue"] - ref.loc[d, "revenue"]) < 1e-2, d
        assert abs(
            row["rev_share"] - ref.loc[d, "revenue"] / total
        ) < 1e-9, d


def test_interpurchase_time_matches_numpy(run):
    got = run("c_interpurchase_time").set_index("seg").sort_index()
    o = _orders()
    cu = _cust()[["c_custkey", "c_mktsegment"]]
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    o["prev"] = o.groupby("o_custkey").o_orderdate.shift(1)
    o["gap"] = (o.o_orderdate - o.prev).dt.days
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j = j[j.gap.notna()]
    for seg, g in j.groupby("c_mktsegment"):
        gaps = g.gap.to_numpy(float)
        row = got.loc[seg]
        assert row["n_gaps"] == len(gaps), seg
        assert abs(row["median_days"] - np.percentile(gaps, 50)) < 1e-9
        assert abs(row["p90_days"] - np.percentile(gaps, 90)) < 1e-9


def test_streaks_matches_numpy(run):
    got = run("c_streaks").set_index("user_id").sort_index()
    ev = _events()
    days = (
        pd.DataFrame({"u": ev.user_id, "d": ev.ts.dt.floor("D")})
        .drop_duplicates()
    )
    for u, g in days.groupby("u"):
        d = np.sort(g.d.to_numpy())
        gaps = np.diff(d) / np.timedelta64(1, "D")
        breaks = int((gaps != 1).sum())
        n_streaks = breaks + 1
        # longest run of consecutive days
        runs, cur = [], 1
        for gp in gaps:
            if gp == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        row = got.loc[u]
        assert row["n_streaks"] == n_streaks, u
        assert row["longest_streak"] == max(runs), u


def test_session_dwell_matches_numpy(run):
    got = run("c_session_dwell").set_index("event_type").sort_index()
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    # events.parquet timestamps are datetime64[us]: int64 view IS µs
    ev["gap_us"] = (
        ev.ts.astype("int64") - ev.groupby("user_id").ts.shift(1).astype(
            "int64", errors="ignore"
        )
    )
    ev.loc[ev.groupby("user_id").cumcount() == 0, "gap_us"] = np.nan
    g = ev[ev.gap_us.notna()]
    ref = g.groupby("event_type").agg(
        n_gaps=("gap_us", "size"),
        total_gap_us=("gap_us", "sum"),
        max_gap_us=("gap_us", "max"),
    )
    assert set(got.index) == set(ref.index)
    for et in ref.index:
        row = got.loc[et]
        assert row["n_gaps"] == ref.loc[et, "n_gaps"], et
        assert row["total_gap_us"] == int(ref.loc[et, "total_gap_us"]), et
        assert row["max_gap_us"] == int(ref.loc[et, "max_gap_us"]), et
