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


def test_mutual_info_matches_numpy(run):
    got = run("c_mutual_info").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "ts"]]
    # MI is invariant to the weekday labeling, so pandas' Monday=0
    # convention vs Spark's Sunday=1 doesn't matter
    tab = pd.crosstab(ev.event_type, ev.ts.dt.dayofweek).values.astype(float)
    pxy = tab / tab.sum()
    px = pxy.sum(1, keepdims=True)
    py = pxy.sum(0, keepdims=True)
    nz = pxy > 0
    mi = float((pxy[nz] * np.log(pxy[nz] / (px @ py)[nz])).sum())
    assert got["n_cells"] == int(nz.sum())
    assert abs(got["mi_nats"] - mi) < 1e-5


def test_groupwise_ols_matches_numpy(run):
    got = run("c_groupwise_ols").set_index("event_type").sort_index()
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["event_type", "ts", "value"]
    ]
    x = (ev.ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    df = pd.DataFrame(
        {"g": ev.event_type, "x": x.astype(np.int64), "y": ev.value}
    )
    for g_, gg in df.groupby("g"):
        n = len(gg)
        sx, sy = gg.x.sum(), gg.y.sum()
        sxx, sxy, syy = (gg.x ** 2).sum(), (gg.x * gg.y).sum(), (gg.y ** 2).sum()
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            continue
        slope = (n * sxy - sx * sy) / vx
        q = got.loc[g_]
        assert abs(q["slope"] - slope) < 1e-4, g_
        assert abs(q["intercept"] - (sy / n - slope * (sx / n))) < 1e-3, g_
        assert abs(q["r2"] - (n * sxy - sx * sy) ** 2 / (vx * vy)) < 1e-4, g_


def test_km_curve_matches_numpy(run):
    """Kaplan-Meier in log space: risk sets, event-time hazards, and
    the cumulative -ln S(t), recomputed from the raw life table."""
    got = run("c_km_curve").set_index("t").sort_index()
    od = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_custkey", "o_orderdate", "o_orderkey"]
    ]
    od["d"] = pd.to_datetime(od.o_orderdate).dt.floor("D")
    od = od.sort_values(["o_orderdate", "o_orderkey"])
    od["rn"] = od.groupby("o_custkey").cumcount()
    f = od[od.rn == 0].set_index("o_custkey")["d"]
    sec = od[od.rn == 1].set_index("o_custkey")["d"]
    maxd = od.d.max()
    life = pd.DataFrame({"first": f}).join(pd.DataFrame({"second": sec}))
    life["dur"] = np.where(
        life.second.notna(),
        (life.second - life["first"]).dt.days,
        (maxd - life["first"]).dt.days,
    )
    life["evt"] = life.second.notna().astype(int)
    gr = (
        life.groupby("dur")
        .agg(n_all=("evt", "size"), d_evt=("evt", "sum"))
        .reset_index()
        .sort_values("dur")
    )
    total, below, cum, rows = int(gr.n_all.sum()), 0, 0.0, []
    for _, r in gr.iterrows():
        n_risk = total - below
        if r.d_evt > 0 and r.d_evt < n_risk:
            cum += -np.log(1 - r.d_evt / float(n_risk))
            rows.append((int(r.dur), int(r.d_evt), int(n_risk), cum))
        below += int(r.n_all)
    ind = pd.DataFrame(
        rows, columns=["t", "d_t", "n_risk", "km_nls"]
    ).set_index("t")
    assert len(got) == len(ind)
    for t in got.index:
        q, i = got.loc[t], ind.loc[t]
        assert (q["d_t"], q["n_risk"]) == (i["d_t"], i["n_risk"]), t
        assert abs(q["km_nls"] - i["km_nls"]) < 1e-4, t


def test_drift_psi_matches_numpy_full_grid(run):
    """Regression pin for the second collusion find: +1 smoothing must
    run over the DECLARED 10-bucket grid — observed-buckets-only dropped
    the empty buckets' nonzero terms and skewed every present bucket's
    denominator (21 of 50 cells missing, 27 of 29 present terms wrong at
    sf0.001), identically in Spark and the DuckDB oracle."""
    got = run("c_drift_psi")
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["event_type", "value", "event_id"]
    ]
    ev["bucket"] = np.clip(np.floor(ev.value / 50.0), 0, 9).astype(np.int64)
    ev["half"] = (ev.event_id % 2).astype(int)
    assert len(got) == ev.event_type.nunique() * 10  # the full grid
    for t in ev.event_type.unique():
        g = ev[ev.event_type == t]
        nref = g[g.half == 0].groupby("bucket").size().reindex(
            range(10), fill_value=0
        )
        ncmp = g[g.half == 1].groupby("bucket").size().reindex(
            range(10), fill_value=0
        )
        tr, tc = (nref + 1).sum(), (ncmp + 1).sum()
        pr, pc = (nref + 1) / tr, (ncmp + 1) / tc
        term = (pr - pc) * np.log(pr / pc)
        sub = got[got.event_type == t].set_index("bucket")
        for b in range(10):
            assert b in sub.index, (t, b)
            assert abs(sub.loc[b, "psi_term"] - term[b]) < 2e-6, (t, b)
            assert sub.loc[b, "n_ref"] == nref[b] and (
                sub.loc[b, "n_cmp"] == ncmp[b]
            ), (t, b)


def test_pagerank_nations_matches_numpy_power_iteration(run):
    """The oracle is a loop-unrolled twin of the same algorithm, so it
    can't catch an algorithmic error both encode; this float power
    iteration is structurally independent."""
    got = run("c_pagerank_nations").set_index("n_name").sort_index()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    sup = pd.read_parquet(f"{SF}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    od = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    cu = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    na = pd.read_parquet(f"{SF}/nation.parquet")[["n_nationkey", "n_name"]]
    j = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
    )
    cnt = j.groupby(["s_nationkey", "c_nationkey"]).size().reset_index(
        name="w"
    )
    edges = cnt[cnt.w.astype(float) > cnt.w.astype(float).mean()][
        ["s_nationkey", "c_nationkey"]
    ].to_numpy()
    N, d = len(na), 0.85
    deg = {}
    for src, _ in edges:
        deg[src] = deg.get(src, 0) + 1
    pr = {n: 1.0 / N for n in na.n_nationkey}
    for _ in range(10):
        infl = {n: 0.0 for n in na.n_nationkey}
        for src, dst in edges:
            infl[dst] += pr[src] / deg[src]
        pr = {n: (1 - d) / N + d * infl[n] for n in na.n_nationkey}
    names = na.set_index("n_nationkey").n_name
    for k, v in pr.items():
        assert abs(got.loc[names[k], "pr"] - v) < 1e-8, names[k]


def test_ab_test_matches_numpy(run):
    got = run("c_ab_test").iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "event_type"]]
    u = (
        ev.assign(conv=(ev.event_type == "purchase").astype(int))
        .groupby("user_id")
        .conv.max()
    )
    b = u.index % 2 == 1
    n_a, n_b = int((~b).sum()), int(b.sum())
    conv_a, conv_b = int(u[~b].sum()), int(u[b].sum())
    assert (got["n_a"], got["n_b"], got["conv_a"], got["conv_b"]) == (
        n_a, n_b, conv_a, conv_b,
    )
    p = (conv_a + conv_b) / (n_a + n_b)
    if 0 < p < 1:
        z = (conv_a / n_a - conv_b / n_b) / np.sqrt(
            p * (1 - p) * (1 / n_a + 1 / n_b)
        )
        assert abs(got["z"] - z) < 1e-6
    else:
        # pooled rate degenerate (p=1 on this testdata: every user has a
        # purchase): the z statistic is undefined and must be NULL
        assert pd.isna(got["z"])


def test_theilsen_trend_matches_numpy(run):
    got = run("c_theilsen_trend").iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_shipdate", "l_extendedprice"]
    ]
    days = pd.to_datetime(li.l_shipdate).dt.floor("D")
    t = (days - days.min()).dt.days
    rev = li.groupby(t).l_extendedprice.sum()
    ts_, rv = rev.index.to_numpy(), rev.to_numpy()
    i, k = np.triu_indices(len(ts_), 1)
    slopes = (rv[k] - rv[i]) / (ts_[k] - ts_[i])
    assert (got["n_days"], got["n_pairs"]) == (len(ts_), len(slopes))
    assert abs(got["theil_slope"] - np.median(slopes)) < 1e-4


def test_benford_matches_numpy(run):
    got = run("c_benford").set_index("digit").sort_index()
    od = pd.read_parquet(f"{SF}/orders.parquet")["o_totalprice"]
    cnt = np.floor(od).astype(np.int64).astype(str).str[0].value_counts()
    for dg in got.index:
        assert got.loc[dg, "n"] == cnt[dg], dg
        assert abs(got.loc[dg, "frac"] - cnt[dg] / float(cnt.sum())) < 1e-12
        assert (
            abs(got.loc[dg, "benford_expected"] - np.log10(1 + 1 / float(dg)))
            < 1e-12
        )


def test_markov_steady_matches_numpy_power_iteration(run):
    """Like PageRank, the oracle is loop-unrolled — this matrix power
    iteration is the structurally independent check."""
    got = run("c_markov_steady").set_index("event_type").sort_index()
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"])
    ev["nxt"] = ev.groupby("user_id").event_type.shift(-1)
    seq = ev.dropna(subset=["nxt"])
    trans = seq.groupby(["event_type", "nxt"]).size().reset_index(name="c")
    types = sorted(set(trans.event_type) | set(trans.nxt))
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((len(types), len(types)))
    outc = trans.groupby("event_type").c.sum()
    for _, r in trans.iterrows():
        P[idx[r.event_type], idx[r.nxt]] = r.c / outc[r.event_type]
    v = np.full(len(types), 1.0 / len(types))
    for _ in range(8):
        v = v @ P
    for t in got.index:
        assert got.loc[t, "out_transitions"] == int(outc.get(t, 0)), t
        assert abs(got.loc[t, "steady"] - v[idx[t]]) < 1e-9, t


def test_unigram_xent_matches_numpy(run):
    from collections import Counter

    got = run("c_unigram_xent").set_index("doc_id").sort_index()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    vocab, per_doc = Counter(), {}
    for _, r in docs.iterrows():
        c = Counter(r.text.split(" "))  # engines split on the literal ' '
        per_doc[r.doc_id] = c
        vocab.update(c)
    total = sum(vocab.values())
    for did, c in per_doc.items():
        n = sum(c.values())
        xent = -sum(tf * np.log(vocab[t] / total) for t, tf in c.items()) / n
        q = got.loc[did]
        assert q["n_toks"] == n, did
        assert abs(q["xent"] - xent) < 1e-4, did


def test_ndcg_eval_matches_numpy_standard_convention(run):
    """Regression pin for the third collusion find: IDCG must come from
    min(TOTAL relevant candidates, 10) — normalizing by the relevance
    retrieved in the top 10 inflated the score whenever recall < 1."""
    got = run("c_ndcg_eval").set_index("probe_id").sort_index()
    em = pd.read_parquet(f"{SF}/embeddings.parquet")[
        ["vec_id", "label", "embedding"]
    ]
    M = np.vstack(em.embedding.to_numpy()).astype(float)
    ids, labels = em.vec_id.to_numpy(), em.label.to_numpy()
    nrm = np.sqrt((M * M).sum(1))
    for q in range(8):
        qi = int(np.where(ids == q)[0][0])
        cs = (M @ M[qi]) / (nrm * nrm[qi])
        mask = ids != q
        order = sorted(zip(np.round(-cs[mask], 9), ids[mask]))
        top = [int(v) for _, v in order[:10]]
        rel = [
            1 if labels[np.where(ids == v)[0][0]] == labels[qi] else 0
            for v in top
        ]
        dcg = sum(r / np.log2(i + 2) for i, r in enumerate(rel))
        R = int((labels[mask] == labels[qi]).sum())
        idcg = sum(1 / np.log2(i + 2) for i in range(min(R, 10)))
        g = got.loc[q]
        assert g["n_rel"] == sum(rel), q
        assert abs(g["ndcg10"] - (dcg / idcg if idcg > 0 else 0.0)) < 1e-4, q


def test_bm25_matches_numpy(run):
    from collections import Counter

    got = run("c_bm25").set_index("doc_id").sort_index()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    terms, k1, b = ("spark", "join", "stream"), 1.2, 0.75
    tf, dl = {}, {}
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        dl[r.doc_id] = len(toks)
        c = Counter(t for t in toks if t in terms)
        if c:
            tf[r.doc_id] = c
    df_ = Counter()
    for c in tf.values():
        for t in c:
            df_[t] += 1
    N, avgdl = len(docs), sum(dl.values()) / len(docs)
    assert len(got) == len(tf)
    for did, c in tf.items():
        score = sum(
            np.log(1 + (N - df_[t] + 0.5) / (df_[t] + 0.5))
            * (tfi * (k1 + 1) / (tfi + k1 * (1 - b + b * dl[did] / avgdl)))
            for t, tfi in c.items()
        )
        assert abs(got.loc[did, "bm25"] - score) < 1e-5, did


def test_pmi_bigrams_matches_numpy(run):
    from collections import Counter

    got = run("c_pmi_bigrams")
    docs = pd.read_parquet(f"{SF}/documents.parquet")["text"]
    bg = Counter()
    for t in docs:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    c1, c2 = Counter(), Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        c2[b] += c
    N = sum(bg.values())
    scored = sorted(
        (
            (c * N / (c1[a] * float(c2[b])), a, b, c)
            for (a, b), c in bg.items()
            if c >= 5
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:50]
    assert len(got) == len(scored)
    for i, (ratio, a, b, c) in enumerate(scored):
        q = got.iloc[i]
        assert (q["w1"], q["w2"], q["c_xy"]) == (a, b, c), i
        assert abs(q["pmi"] - np.log(ratio)) < 1e-6, i


def test_cusum_revenue_matches_exact_integer_recomputation(run):
    from decimal import ROUND_HALF_UP, Decimal

    got = run("c_cusum_revenue")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_shipdate", "l_extendedprice"]
    ]
    d = li.groupby("l_shipdate").l_extendedprice.sum().sort_index()
    rev = (d * 10000).round().astype(object)  # exact 4dp units
    cum, n, total = rev.cumsum(), len(d), rev.sum()
    t = pd.Series(range(1, n + 1), index=d.index, dtype=object)
    dev = n * cum - t * total
    cand = sorted(
        ((int(abs(v)), k) for k, v in dev.items()), key=lambda x: (-x[0], x[1])
    )[:5]
    for i, (_, k) in enumerate(cand):
        q = got.iloc[i]
        assert str(q["day"])[:10] == str(k)[:10], i
        # both engines round(dev, 0) HALF_UP on the 4dp value
        want = int(
            (Decimal(int(dev[k])) / Decimal(10000)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        assert int(q["dev_scaled"]) == want, (i, k)


def test_forecast_smape_matches_numpy(run):
    """Observed-join convention: a (type, day) pair scores only when
    both the actual and the 7-day-earlier count exist."""
    got = run("c_forecast_smape").set_index("event_type").sort_index()
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "ts"]]
    d = (
        ev.groupby(["event_type", ev.ts.dt.floor("D")])
        .size()
        .rename("n")
        .reset_index()
    )
    d.columns = ["event_type", "day", "n"]
    f = d.copy()
    f["day"] = f.day + pd.Timedelta(days=7)
    j = d.merge(f.rename(columns={"n": "fc"}), on=["event_type", "day"])
    for t_, g in j.groupby("event_type"):
        sm = (2.0 * np.abs(g.n - g.fc) / (g.n + g.fc)).mean()
        q = got.loc[t_]
        assert q["n_days"] == len(g), t_
        assert abs(q["smape"] - sm) < 1e-6, t_


def test_readability_matches_numpy(run):
    import re

    got = run("c_readability").set_index("doc_id").sort_index()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    for _, r in docs.iterrows():
        w = len(re.findall(r"[A-Za-z]+", r.text))
        if w < 1:
            continue
        sent = max(len(re.findall(r"[.!?]+", r.text)), 1)
        vg = len(re.findall(r"[aeiouyAEIOUY]+", r.text))
        fl = 206.835 - 1.015 * (w / sent) - 84.6 * (vg / w)
        q = got.loc[r.doc_id]
        assert (q["words"], q["sentences"], q["vowel_groups"]) == (
            w, sent, vg,
        ), r.doc_id
        assert abs(q["flesch"] - fl) < 1e-9, r.doc_id


def test_lorenz_points_match_numpy(run):
    got = run("c_lorenz_points").set_index(["seg", "decile"]).sort_index()
    od = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_totalprice"]]
    cu = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    spend = (
        j.groupby(["c_mktsegment", "o_custkey"]).o_totalprice.sum()
        .reset_index()
    )
    for seg, g in spend.groupby("c_mktsegment"):
        g = g.sort_values(["o_totalprice", "o_custkey"]).reset_index(drop=True)
        g["decile"] = g.index * 10 // len(g)
        bands = g.groupby("decile").agg(
            n_customers=("o_custkey", "size"),
            band_spend=("o_totalprice", "sum"),
        )
        cum, total = bands.band_spend.cumsum(), bands.band_spend.sum()
        for dec in bands.index:
            q = got.loc[(seg, dec)]
            assert q["n_customers"] == bands.loc[dec, "n_customers"], (seg, dec)
            assert abs(q["band_spend"] - bands.loc[dec, "band_spend"]) < 1e-2
            assert abs(q["cum_share"] - cum[dec] / total) < 1e-5, (seg, dec)


def test_retention_cohort_matches_numpy(run):
    got = run("c_retention_cohort").set_index(
        ["cohort_week", "week_offset"]
    ).sort_index()
    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "ts"]]
    first = ev.groupby("user_id").ts.min().rename("first_ts")
    j = ev.join(first, on="user_id")
    j["week_offset"] = (
        (j.ts - j.first_ts) // pd.Timedelta(weeks=1)
    ).astype(np.int64)
    j["cohort_week"] = j.first_ts.dt.to_period("W-SUN").dt.start_time
    ind = j.groupby(["cohort_week", "week_offset"]).user_id.nunique()
    assert len(got) == len(ind)
    for k in got.index:
        assert k in ind.index and got.loc[k, "n_users"] == ind[k], k


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
