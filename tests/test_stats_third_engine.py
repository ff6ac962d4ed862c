"""Third-engine audit of the rank/association statistics (round 12).

The DuckDB parity gate cannot catch ORACLE COLLUSION — a formula
encoded identically wrong on both sides. These tests recompute four
statistics independently with numpy/pandas from the raw parquet and
compare against the registered queries at sf0.001. The audit already
paid for itself: it caught `c_ks_source` understating the KS max
whenever it occurred below a source's minimum value (the inner-join
CDF staircase dropped the cum1=0 support points on BOTH sides —
src6's true 1750 read 1375), a bug two engines agreed on.
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


def test_kendall_tau_b_matches_numpy(run):
    got = run("c_kendall_tau").set_index("brand").sort_index()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_partkey", "l_extendedprice", "l_quantity"]
    ]
    pt = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j["x"] = np.floor(j.l_extendedprice / 10000).astype(np.int64)
    j["y"] = j.l_quantity.astype(np.int64)
    for brand, g in j.groupby("p_brand"):
        n = len(g)
        cells = g.groupby(["x", "y"]).size().reset_index(name="c").to_numpy()
        C = D = 0
        for xi, yi, ci in cells:
            for xk, yk, ck in cells:
                if xi < xk:
                    if yi < yk:
                        C += ci * ck
                    elif yi > yk:
                        D += ci * ck
        n0 = n * (n - 1) // 2
        n1 = sum(s * (s - 1) // 2 for s in g.groupby("x").size())
        n2 = sum(s * (s - 1) // 2 for s in g.groupby("y").size())
        tau = (C - D) / np.sqrt(float(n0 - n1) * float(n0 - n2))
        q = got.loc[brand]
        assert (q["conc"], q["disc"], q["n"]) == (C, D, n), brand
        assert abs(q["tau_b"] - round(tau, 6)) < 1e-9, brand


def test_chi2_independence_matches_numpy(run):
    got = run("c_chi2_independence").set_index("segment").sort_index()
    cu = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    od = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_custkey", "o_orderpriority"]
    ]
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    tab = pd.crosstab(j.c_mktsegment, j.o_orderpriority)
    exp = np.outer(tab.sum(1), tab.sum(0)) / tab.values.sum()
    # full-table sum INCLUDING empty cells (obs=0 contributes expected)
    terms = np.round((tab.values - exp) ** 2 / exp, 9)
    ind = pd.Series(terms.sum(axis=1), index=tab.index)
    for seg in got.index:
        assert got.loc[seg, "n_orders"] == tab.sum(1)[seg]
        assert abs(got.loc[seg, "chi2_part"] - ind[seg]) < 1e-9, seg


def test_mannwhitney_matches_numpy(run):
    got = run("c_mannwhitney").set_index("seg").sort_index()
    cu = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    od = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_custkey", "o_totalprice"]
    ]
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["b"] = np.floor(j.o_totalprice / 100).astype(np.int64)
    for seg, g in j.groupby("c_mktsegment"):
        a = np.sort(g.b.to_numpy())
        rest = np.sort(j[j.c_mktsegment != seg].b.to_numpy())
        n1, n2 = len(a), len(rest)
        gt = int(np.searchsorted(rest, a, side="left").sum())
        ties = int(np.searchsorted(rest, a, side="right").sum()) - gt
        u2 = 2 * gt + ties
        q = got.loc[seg]
        assert (q["u2"], q["n1"], q["n2"]) == (u2, n1, n2), seg
        assert abs(q["auc"] - round(u2 / (2 * n1 * float(n2)), 6)) < 1e-9


def test_anova_and_levene_match_numpy(run):
    od = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderpriority", "o_totalprice"]
    ]

    def f_stat(values, groups):
        df = pd.DataFrame({"g": groups, "v": values})
        grp = df.groupby("g")["v"]
        k, n = grp.ngroups, len(df)
        gm = df.v.mean()
        ssb = float((grp.size() * (grp.mean() - gm) ** 2).sum())
        sst = float(((df.v - gm) ** 2).sum())
        return k, n, (ssb / (k - 1)) / ((sst - ssb) / (n - k)), ssb / sst

    got = run("c_anova_oneway").iloc[0]
    k, n, f, eta2 = f_stat(od.o_totalprice, od.o_orderpriority)
    assert (got["k"], got["n"]) == (k, n)
    assert abs(got["f_stat"] - f) < 1e-4 and abs(got["eta2"] - eta2) < 1e-6

    got = run("c_levene_test").iloc[0]
    z = (
        od.o_totalprice
        - od.groupby("o_orderpriority")["o_totalprice"].transform("median")
    ).abs()
    k, n, w, _ = f_stat(z, od.o_orderpriority)
    assert (got["k"], got["n"]) == (k, n)
    assert abs(got["w_stat"] - w) < 1e-4


def test_cramers_v_matches_numpy(run):
    got = run("c_cramers_v").iloc[0]
    od = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderpriority", "o_orderstatus"]
    ]
    tab = pd.crosstab(od.o_orderpriority, od.o_orderstatus)
    exp = np.outer(tab.sum(1), tab.sum(0)) / tab.values.sum()
    # full-table chi2 including empty cells
    chi2 = float((((tab.values - exp) ** 2) / exp).sum())
    v = np.sqrt(chi2 / (tab.values.sum() * (min(tab.shape) - 1)))
    assert (got["n"], got["k"], got["m"]) == (
        tab.values.sum(), tab.shape[0], tab.shape[1],
    )
    assert abs(got["chi2"] - chi2) < 1e-4
    assert abs(got["cramers_v"] - v) < 1e-6


def test_spearman_brand_matches_numpy(run):
    got = run("c_spearman_brand").set_index("p_brand").sort_index()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_partkey", "l_quantity", "l_extendedprice"]
    ]
    pt = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    for brand, g in j.groupby("p_brand"):
        rx = g.l_quantity.rank(method="average")
        ry = g.l_extendedprice.rank(method="average")
        rho = np.corrcoef(rx, ry)[0, 1]
        if brand in got.index:
            assert abs(got.loc[brand, "spearman_rho"] - rho) < 1e-6, brand


def test_auc_roc_matches_numpy(run):
    got = run("c_auc_roc").iloc[0]
    od = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_totalprice", "o_orderstatus"]
    ]
    b = np.floor(od.o_totalprice / 100).astype(np.int64)
    y = (od.o_orderstatus == "F").astype(int)
    pos = np.sort(b[y == 1].to_numpy())
    neg = np.sort(b[y == 0].to_numpy())
    gt = int(np.searchsorted(neg, pos, side="left").sum())
    ties = int(np.searchsorted(neg, pos, side="right").sum()) - gt
    auc = (gt + 0.5 * ties) / (len(pos) * float(len(neg)))
    assert (got["n1"], got["n0"]) == (len(pos), len(neg))
    assert abs(got["auc"] - auc) < 1e-6


def test_ks_source_matches_numpy(run):
    """The regression pin for the collusion find: the KS max must range
    over the FULL support, including points below a source's minimum
    (cum1 = 0, rest-of-corpus CDF large)."""
    got = run("c_ks_source").set_index("source").sort_index()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["source", "n_chars"]]
    docs["v"] = docs.n_chars.astype(np.int64)
    support = np.sort(docs.v.unique())
    all_sorted = np.sort(docs.v.to_numpy())
    N = len(docs)
    for src, g in docs.groupby("source"):
        n1, n2 = len(g), N - len(g)
        cum1 = np.searchsorted(
            np.sort(g.v.to_numpy()), support, side="right"
        ).astype(object)
        cum_all = np.searchsorted(all_sorted, support, side="right").astype(
            object
        )
        ks_scaled = int(np.abs(cum1 * n2 - (cum_all - cum1) * n1).max())
        q = got.loc[src]
        assert (q["ks_scaled"], q["n1"], q["n2"]) == (ks_scaled, n1, n2), src
        assert abs(q["ks"] - round(ks_scaled / (n1 * float(n2)), 6)) < 1e-9
