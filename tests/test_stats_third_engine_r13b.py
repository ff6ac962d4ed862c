"""Third-engine audit, round 13 batch B — effect sizes, intervals,
diversity/entropy and time-series screens not named in VERDICT r12's
list but carrying the same oracle-collusion risk shape (a formula both
engines could encode identically wrong).

Method identical to tests/test_stats_third_engine*.py: recompute from
raw parquet with numpy/pandas following the DECLARED semantics, compare
to the registered query at sf0.001.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
Z95 = 1.959963984540054


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


def test_ab_srm_matches_numpy(run):
    got = run("c_ab_srm").set_index("arm").sort_index()
    ev = _events()
    users = ev.user_id.drop_duplicates().to_numpy(object)  # exact ints
    arm_a = np.array(
        [((int(u) % 1000003) * 2654435761) % 2 == 0 for u in users]
    )
    na, nb = int(arm_a.sum()), int((~arm_a).sum())
    exp = (na + nb) / 2.0
    assert (got.loc["A", "n"], got.loc["B", "n"]) == (na, nb)
    assert abs(got.loc["A", "chi2_term"] - (na - exp) ** 2 / exp) < 1e-9
    assert abs(got.loc["B", "chi2_term"] - (nb - exp) ** 2 / exp) < 1e-9


def test_anomaly_zscore_matches_numpy(run):
    got = run("c_anomaly_zscore")
    ev = _events()
    expect = {}
    for et, g in ev.groupby("event_type"):
        v = g.value.to_numpy()
        m, sd = v.mean(), v.std(ddof=0)  # population moments
        if sd == 0:
            continue
        z = (v - m) / sd
        for eid, zi in zip(g.event_id[np.abs(z) > 2.5], z[np.abs(z) > 2.5]):
            expect[int(eid)] = zi
    assert set(got.event_id) == set(expect)
    for _, r in got.iterrows():
        assert abs(r["zscore"] - expect[int(r["event_id"])]) < 1e-5


def test_brier_logloss_matches_numpy(run):
    got = run("c_brier_logloss").iloc[0]
    o = _orders()
    p = np.clip(o.o_totalprice.to_numpy() / 500000.0, 0.01, 0.99)
    y = (o.o_orderstatus == "F").to_numpy(float)
    brier = ((p - y) ** 2).mean()
    logloss = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    assert got["n"] == len(o)
    assert abs(got["brier"] - brier) < 1e-5
    assert abs(got["logloss"] - logloss) < 1e-5


def test_cohens_kappa_matches_numpy(run):
    got = run("c_cohens_kappa").iloc[0]
    o = _orders()
    c = o.groupby("o_custkey").agg(
        spend=("o_totalprice", "sum"), n_orders=("o_orderkey", "size")
    )
    ra = (c.spend >= 2500000.0).to_numpy()
    rb = (c.n_orders >= 10).to_numpy()
    n11 = int((ra & rb).sum())
    n10 = int((ra & ~rb).sum())
    n01 = int((~ra & rb).sum())
    n00 = int((~ra & ~rb).sum())
    n = len(c)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
    kappa = (po - pe) / (1 - pe)
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (
        n11, n10, n01, n00,
    )
    assert abs(got["kappa"] - kappa) < 1e-6


def test_cross_corr_lag_matches_numpy(run):
    got = run("c_cross_corr_lag").set_index("lag").sort_index()
    ev = _events()
    day = ev.ts.dt.floor("D")
    x = ev[ev.event_type == "view"].groupby(
        day[ev.event_type == "view"]
    ).size()
    y = ev[ev.event_type == "purchase"].groupby(
        day[ev.event_type == "purchase"]
    ).size()
    for lag in got.index:
        # y at day d+lag joined to x at day d (views lead purchases)
        pairs = [
            (int(x[d]), int(y[d + pd.Timedelta(days=int(lag))]))
            for d in x.index
            if d + pd.Timedelta(days=int(lag)) in y.index
        ]
        xs = np.array([p[0] for p in pairs], float)
        ys = np.array([p[1] for p in pairs], float)
        assert got.loc[lag, "n_days"] == len(pairs), lag
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(got.loc[lag, "r"] - r) < 1e-6, lag


def test_ewma_daily_matches_numpy(run):
    got = run("c_ewma_daily").set_index(["n_name", "day"]).sort_index()
    o = _orders()
    cu = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    na = pd.read_parquet(f"{SF}/nation.parquet")[["n_nationkey", "n_name"]]
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey").merge(
        na, left_on="c_nationkey", right_on="n_nationkey"
    )
    daily = (
        j.groupby(["n_name", j.o_orderdate.dt.floor("D")])
        .o_totalprice.sum()
        .reset_index()
    )
    alpha, n_lags = 0.3, 8
    checked = 0
    for name, g in daily.groupby("n_name"):
        rev = g.sort_values("o_orderdate").o_totalprice.to_numpy()
        days = g.sort_values("o_orderdate").o_orderdate.to_numpy()
        for t in range(len(rev)):
            num = den = 0.0
            for i in range(min(n_lags, t + 1)):
                w = alpha * (1 - alpha) ** i
                num += w * rev[t - i]
                den += w
            q = got.loc[(name, pd.Timestamp(days[t]))]
            assert abs(q["ewma_rev"] - num / den) < 1e-2  # query rounds 2dp
            checked += 1
    assert checked == len(got)


def test_hhi_supplier_matches_numpy(run):
    got = run("c_hhi_supplier").set_index("l_partkey").sort_index()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    ps = (
        li.groupby(["l_partkey", "l_suppkey"])
        .l_quantity.sum()
        .reset_index()
    )
    for pk, g in ps.groupby("l_partkey"):
        q = g.l_quantity.to_numpy(float)
        hhi = (q**2).sum() / q.sum() ** 2
        row = got.loc[pk]
        assert row["n_suppliers"] == len(g), pk
        assert abs(row["hhi"] - hhi) < 1e-9, pk


def test_info_gain_split_matches_numpy(run):
    got = run("c_info_gain_split").set_index("threshold").sort_index()
    o = _orders()
    b = np.floor(o.o_totalprice.to_numpy() / 25000).astype(int)
    y = (o.o_orderstatus == "F").to_numpy(int)
    n, p = len(y), int(y.sum())

    def ent(s, m):
        if s == 0 or s == m:
            return 0.0
        q = s / m
        return -q * np.log(q) - (1 - q) * np.log(1 - q)

    seen = set()
    for t in range(1, 20):
        left = b < t
        nl, pl = int(left.sum()), int(y[left].sum())
        nr, pr = n - nl, p - pl
        if nl == 0 or nr == 0:
            continue
        gain = (
            ent(p, n) - (nl / n) * ent(pl, nl) - (nr / n) * ent(pr, nr)
        )
        row = got.loc[t * 25000]
        seen.add(t * 25000)
        assert (row["n_left"], row["n_right"]) == (nl, nr), t
        assert abs(row["gain"] - gain) < 1e-6, t
    assert seen == set(got.index)


def test_kruskal_wallis_matches_scipy_convention(run):
    """Recompute H with textbook average ranks over the SAME $100
    bucketing the query declares (ranks within bucket are tied)."""
    got = run("c_kruskal_wallis").iloc[0]
    o = _orders()
    b = np.floor(o.o_totalprice.to_numpy() / 100).astype(np.int64)
    g = o.o_orderpriority.to_numpy()
    # average (mid) ranks of the bucketed values
    order = np.argsort(b, kind="stable")
    ranks = np.empty(len(b), float)
    sb = b[order]
    i = 0
    pos = 1
    while i < len(sb):
        j = i
        while j < len(sb) and sb[j] == sb[i]:
            j += 1
        ranks[order[i:j]] = (pos + pos + (j - i) - 1) / 2.0
        pos += j - i
        i = j
    n = len(b)
    rss = 0.0
    k = 0
    for _, idx in pd.Series(range(n)).groupby(pd.Series(g)).groups.items():
        rg = ranks[np.array(idx)]
        rss += rg.sum() ** 2 / len(rg)
        k += 1
    h = 12.0 * rss / (n * (n + 1)) - 3 * (n + 1)
    _, counts = np.unique(b, return_counts=True)
    corr = 1.0 - float((counts.astype(np.int64) ** 3 - counts).sum()) / (
        float(n) ** 3 - n
    )
    assert (got["k"], got["n"]) == (k, n)
    assert abs(got["h"] - h) < 1e-4
    assert abs(got["h_tie"] - h / corr) < 1e-4


def test_lang_entropy_matches_numpy(run):
    got = run("c_lang_entropy").set_index("source").sort_index()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    for src, g in d.groupby("source"):
        p = g.lang.value_counts(normalize=True).to_numpy()
        ent = -(p * np.log(p)).sum()
        row = got.loc[src]
        assert row["n_docs"] == len(g), src
        assert abs(row["entropy"] - ent) < 1e-6, src


def test_mad_outliers_matches_numpy(run):
    got = run("c_mad_outliers").set_index("event_type").sort_index()
    ev = _events()
    for et, g in ev.groupby("event_type"):
        v = g.value.to_numpy()
        med = np.median(v)
        ad = np.abs(v - med)
        mad = np.median(ad)
        n_out = int((ad > mad * 4.4478).sum())
        row = got.loc[et]
        assert row["n"] == len(v), et
        assert row["n_out"] == n_out, et
        assert abs(row["med"] - med) < 1e-9 and abs(row["mad"] - mad) < 1e-9


def test_odds_ratio_matches_numpy(run):
    got = run("c_odds_ratio").iloc[0]
    o = _orders()
    e = o.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).to_numpy()
    y = (o.o_orderstatus == "F").to_numpy()
    a = int((e & y).sum())
    b = int((e & ~y).sum())
    c = int((~e & y).sum())
    d = int((~e & ~y).sum())
    orr = (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))
    se = np.sqrt(
        1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5)
    )
    assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
    assert abs(got["odds_ratio"] - orr) < 1e-3
    assert abs(got["lo"] - np.exp(np.log(orr) - Z95 * se)) < 1e-3
    assert abs(got["hi"] - np.exp(np.log(orr) + Z95 * se)) < 1e-3


def test_runs_test_matches_numpy(run):
    got = run("c_runs_test").set_index("mon").sort_index()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    # exact integer cents so the division-free above-mean compare
    # (rev*nd > tot) reproduces bit-for-bit
    li["rev_u"] = np.round(li.l_extendedprice * 10000).astype(np.int64)
    li["mon"] = li.l_shipdate.dt.to_period("M")
    li["day"] = li.l_shipdate
    d = li.groupby(["mon", "day"]).rev_u.sum().reset_index()
    tot = int(d.rev_u.sum())
    nd = len(d)
    d["s"] = (d.rev_u.astype(object) * nd > tot).astype(int)
    for mon, g in d.groupby("mon"):
        g = g.sort_values("day")
        s = g.s.to_numpy()
        n_runs = int((s[1:] != s[:-1]).sum()) + (1 if len(s) else 0)
        # the query counts breaks where lag differs, first row lag NULL
        # → brk=1, so n_runs = sum(brk) = transitions + 1
        row = got.loc[pd.Timestamp(mon.start_time)]
        assert row["n_days"] == len(g), mon
        assert row["n_above"] == int(s.sum()), mon
        assert row["n_runs"] == n_runs, mon


def test_simpson_diversity_matches_numpy(run):
    got = run("c_simpson_diversity").set_index("doc_id").sort_index()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    expect = {}
    for _, r in d.iterrows():
        toks = pd.Series(r.text.split(" "))
        n = len(toks)
        if n < 2:
            continue
        c = toks.value_counts().to_numpy(np.int64)
        expect[r.doc_id] = (int((c * (c - 1)).sum()), n)
    assert set(got.index) == set(expect)
    for did, (rep, n) in expect.items():
        row = got.loc[did]
        assert row["n"] == n, did
        assert abs(row["simpson_d"] - rep / (n * (n - 1))) < 1e-12, did


def test_wilson_ci_matches_numpy(run):
    got = run("c_wilson_ci").set_index("seg").sort_index()
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    for seg, g in cu.groupby("c_mktsegment"):
        n = len(g)
        s = int((g.c_acctbal > 0).sum())
        ph = s / n
        z2 = Z95**2
        denom = 1 + z2 / n
        center = ph + z2 / (2 * n)
        half = Z95 * np.sqrt(ph * (1 - ph) / n + z2 / (4 * n * n))
        row = got.loc[seg]
        assert (row["n"], row["s"]) == (n, s), seg
        assert abs(row["lo"] - (center - half) / denom) < 1e-6, seg
        assert abs(row["hi"] - (center + half) / denom) < 1e-6, seg


def test_bigram_xent_matches_numpy(run):
    got = run("c_bigram_xent").set_index("doc_id").sort_index()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    # corpus bigram counts
    from collections import Counter, defaultdict

    bg_count = Counter()
    doc_bgs = {}
    for _, r in d.iterrows():
        toks = r.text.split(" ")
        if len(toks) < 2:
            continue
        bgs = list(zip(toks[:-1], toks[1:]))
        doc_bgs[r.doc_id] = bgs
        bg_count.update(bgs)
    ctx = defaultdict(int)
    for (w1, _w2), c in bg_count.items():
        ctx[w1] += c
    assert set(got.index) == set(doc_bgs)
    for did, bgs in doc_bgs.items():
        h = -sum(
            np.log(bg_count[bg] / ctx[bg[0]]) for bg in bgs
        ) / len(bgs)
        row = got.loc[did]
        assert row["n_bg"] == len(bgs), did
        assert abs(row["xent"] - h) < 1e-5, did
