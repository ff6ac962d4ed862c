"""Third-engine audit, round 13 batch E — the formula-bearing queries
whose Spark and DuckDB sides share a SINGLE SPELLING of the formula
(QUALITY_SQL, zorder_sql, the dp-noise hash expression, the pagerank
mirror ...), i.e. exactly the shape where two-engine parity is
structurally blind to a wrong formula. Each test recomputes the
declared semantics from FIRST PRINCIPLES in numpy / pure Python
(bit-loop Morton instead of the magic-mask schedule, hashlib md5
instead of SQL md5, textbook inverse-CDF Laplace, dense float
PageRank instead of the decimal-disciplined iteration) and compares
against the registered query's output.

Closes the "every formula-bearing c_* statistic" criterion of VERDICT
r12 next #1 — after this batch the unaudited c_* remainder is
relational/set-operation queries whose DuckDB oracle is an
independent implementation, not a shared formula.
"""

import hashlib
import math
from collections import Counter

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


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def test_quality_score_matches_python(run):
    """min(n_tokens/100, 1)*0.4 + distinct_ratio*0.4 + (1-punct_ratio)*0.2,
    tokens split on single space (Spark split semantics: keeps empties)."""
    got = run("c_quality_score").set_index("doc_id")["quality"]
    for _, r in _docs().iterrows():
        ws = r.text.split(" ")
        n = len(ws)
        punct = sum(
            1
            for ch in r.text
            if not (ch.isascii() and (ch.isalnum() or ch == " "))
        )
        ref = (
            min(n / 100.0, 1.0) * 0.4
            + (len(set(ws)) / n) * 0.4
            + (1.0 - punct / len(r.text)) * 0.2
        )
        assert abs(got[r.doc_id] - ref) < 1e-9, r.doc_id


def test_fingerprint_matches_hashlib(run):
    """Min MD5 over 3-token shingles; md5(text) fallback for <3 tokens."""
    got = run("c_fingerprint").set_index("doc_id")["fp"]
    for _, r in _docs().iterrows():
        ws = r.text.split(" ")
        if len(ws) >= 3:
            ref = min(
                hashlib.md5(
                    " ".join(ws[i : i + 3]).encode()
                ).hexdigest()
                for i in range(len(ws) - 2)
            )
        else:
            ref = hashlib.md5(r.text.encode()).hexdigest()
        assert got[r.doc_id] == ref, r.doc_id


def test_zorder_key_matches_bit_loop(run):
    """Morton interleave recomputed bit-by-bit (custkey → even positions,
    orderkey → odd), NOT via the magic-mask doubling the operator and its
    SQL twin both use."""
    got = run("c_zorder_key")

    def morton(a: int, b: int) -> int:
        a &= 0x7FFFFFFF
        b &= 0x7FFFFFFF
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for _, r in got.iterrows():
        assert int(r.zkey) == morton(int(r.o_custkey), int(r.o_orderkey)), (
            r.o_orderkey
        )


def test_tfidf_topk_matches_python(run):
    """Smoothed TF-IDF tf*ln((N+1)/(df+1)) rounded 6dp, top-3 per doc with
    term tie-break — full independent recompute of scores AND ranking."""
    got = run("c_tfidf_topk")
    docs = _docs()
    n_docs = len(docs)
    tf: dict = {}
    df_counter: Counter = Counter()
    for _, r in docs.iterrows():
        c = Counter(r.text.split(" "))
        tf[r.doc_id] = c
        df_counter.update(c.keys())
    expect = {}
    for doc_id, c in tf.items():
        scored = sorted(
            (
                (
                    -round(
                        t_n * math.log((n_docs + 1) / (df_counter[t] + 1)), 6
                    ),
                    t,
                    t_n,
                )
                for t, t_n in c.items()
            ),
        )[:3]
        for rank, (neg_s, t, t_n) in enumerate(scored, start=1):
            expect[(doc_id, rank)] = (t, t_n, -neg_s)
    assert len(got) == len(expect)
    for _, r in got.iterrows():
        t, t_n, s = expect[(r.doc_id, int(r["rank"]))]
        assert r.term == t and int(r.tf) == t_n, (r.doc_id, r["rank"])
        assert abs(r.score - s) < 1e-9, (r.doc_id, r.term)


def test_sax_symbols_match_numpy(run):
    """Gaussian-equiprobable 4-symbol SAX over z-normalized daily revenue
    (sample std): symbol counts and z extrema recomputed in float64."""
    got = run("c_sax_symbolize").set_index("symbol").sort_index()
    o = _orders()
    daily = (
        o.groupby(pd.to_datetime(o.o_orderdate).dt.normalize())
        .o_totalprice.sum()
        .astype(np.float64)
    )
    z = (daily - daily.mean()) / daily.std(ddof=1)
    sym = np.where(
        z < -0.6745, "a", np.where(z < 0, "b", np.where(z < 0.6745, "c", "d"))
    )
    ref = pd.DataFrame({"z": z.values, "s": sym}).groupby("s").z
    assert dict(zip(got.index, got.n_days)) == ref.size().to_dict()
    for s in got.index:
        assert abs(got.loc[s, "z_min"] - ref.min()[s]) < 2e-5, s
        assert abs(got.loc[s, "z_max"] - ref.max()[s]) < 2e-5, s


def test_percentile_exact_matches_numpy(run):
    """The exact interpolated p50/p90 per segment (the hash-checkable half
    of c_percentile_approx_err) vs np.percentile(method='linear'); the
    sketch-rank stamps must all hold."""
    got = run("c_percentile_approx_err").set_index("seg")
    o = _orders()
    c = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for seg, g in j.groupby("c_mktsegment"):
        assert int(got.loc[seg, "n"]) == len(g)
        p50, p90 = np.percentile(
            g.o_totalprice.to_numpy(np.float64), [50, 90], method="linear"
        )
        assert abs(got.loc[seg, "exact_p50"] - round(p50, 6)) < 1e-6, seg
        assert abs(got.loc[seg, "exact_p90"] - round(p90, 6)) < 1e-6, seg
    assert got.rank_ok_p50.all() and got.rank_ok_p90.all()


def test_dp_counts_matches_python(run):
    """Seeded Laplace release: u from the multiplicative hash of the group
    key, noise = -sign(u) * ln(1 - 2|u|) (inverse CDF, b = 1/epsilon = 1),
    recomputed with pure-Python integer arithmetic + math.log."""
    got = run("c_dp_counts").set_index("event_type")["noisy_n"]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    counts = ev.event_type.value_counts()
    for et, n in counts.items():
        u = ((ord(et[0]) * 31 + ord(et[1])) * 2654435761) % 1000000007
        u = u / 1000000007.0 - 0.5
        noise = 0.0 if u == 0 else -math.copysign(1, u) * math.log(1 - 2 * abs(u))
        assert abs(got[et] - round(n + noise, 2)) < 1e-9, et


def test_minhash_true_jaccard_matches_sets(run):
    """True word-set Jaccard per probe pair vs Python set ops; every
    64-permutation estimate stamp must hold."""
    got = run("c_minhash_est_vs_true")
    docs = _docs().set_index("doc_id")["text"]
    assert len(got) > 0
    for _, r in got.iterrows():
        wa = set(docs[r.a_id].split(" "))
        wb = set(docs[r.b_id].split(" "))
        ref = round(len(wa & wb) / len(wa | wb), 9)
        assert abs(r.true_jaccard - ref) < 1e-9, (r.a_id, r.b_id)
    assert got.est_within_tol.all()


def test_feature_scale_matches_numpy(run):
    """Per-dimension z-scores (population variance) over the embedding
    matrix; per-vector count of |z| > 2 recomputed with numpy matrix ops."""
    got = run("c_feature_scale").set_index("vec_id").sort_index()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    z = (m - m.mean(axis=0)) / m.std(axis=0)  # population std, ddof=0
    n_extreme = (np.abs(z) > 2.0).sum(axis=1)
    ref = pd.Series(n_extreme, index=emb.vec_id).sort_index()
    assert (got.n_dims == m.shape[1]).all()
    assert got.n_extreme.to_numpy().tolist() == ref.to_numpy().tolist()


def test_pagerank_redistribute_matches_numpy(run):
    """Dense float64 mass-conserving PageRank (10 iters, d=0.85, dangling
    mass folded back uniformly) over the src<dst trade graph — fully
    independent of the decimal-disciplined keyed-join iteration AND its
    loop-unrolled SQL mirror."""
    got = run("c_pagerank_redistribute").set_index("n_name")["pr"]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    sup = pd.read_parquet(f"{SF}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    o = _orders()[["o_orderkey", "o_custkey"]]
    cu = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    j = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
    )
    cnt = j.groupby(["s_nationkey", "c_nationkey"]).size()
    thr = cnt.astype(np.float64).mean()
    edges = [
        (s, d) for (s, d), w in cnt.items() if float(w) > thr and s < d
    ]
    n = len(nation)
    idx = {k: i for i, k in enumerate(sorted(nation.n_nationkey))}
    deg = Counter(s for s, _ in edges)
    d_f = 0.85
    pr = np.full(n, 1.0 / n)
    for _ in range(10):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[idx[d]] += pr[idx[s]] / deg[s]
        dangling = sum(
            pr[idx[k]] for k in nation.n_nationkey if k not in deg
        )
        pr = (1 - d_f) / n + d_f * inflow + d_f * dangling / n
    assert abs(pr.sum() - 1.0) < 1e-9
    names = nation.set_index("n_nationkey").n_name
    for k, i in idx.items():
        assert abs(got[names[k]] - pr[i]) < 1e-8, names[k]
