"""Third-engine audit, round 13 batch D — association/lift metrics,
text-quality ratios and the co-purchase degree histogram. Final batch
of the round-13 formula sweep.
"""

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


def _li():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_basket_lift_matches_numpy(run):
    got = run("c_basket_lift")
    li = _li()[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = li.l_orderkey.nunique()
    item = li.l_partkey.value_counts()
    pair = Counter()
    for _, g in li.groupby("l_orderkey"):
        pks = sorted(g.l_partkey)
        for i in range(len(pks)):
            for jj in range(i + 1, len(pks)):
                if pks[i] != pks[jj]:
                    pair[(pks[i], pks[jj])] += 1
    ref = {
        (a, b): c for (a, b), c in pair.items() if c >= 2
    }
    # the query returns top-20 by lift — every returned row must match
    # the independent support/confidence/lift arithmetic
    for _, r in got.iterrows():
        key = (int(r.part_a), int(r.part_b))
        assert key in ref, key
        np_ = ref[key]
        na, nb = int(item[key[0]]), int(item[key[1]])
        assert r.n_pair == np_, key
        assert abs(r.support - np_ / n_orders) < 1e-12, key
        assert abs(r.confidence - np_ / na) < 1e-12, key
        assert abs(r.lift - (np_ * n_orders) / (na * nb)) < 1e-9, key
    # and the top-20-by-lift SET is the independent one
    lifts = sorted(
        ((c * n_orders) / (item[a] * item[b]), a, b)
        for (a, b), c in ref.items()
    )[::-1][: len(got)]
    assert {(a, b) for _, a, b in lifts} == {
        (int(r.part_a), int(r.part_b)) for _, r in got.iterrows()
    }


def test_discount_lift_matches_numpy(run):
    got = run("c_discount_lift").set_index("p_brand").sort_index()
    li = _li()
    pt = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    disc = j.l_discount >= 0.05
    for brand, g in j.groupby("p_brand"):
        d = g[disc.loc[g.index]]
        f = g[~disc.loc[g.index]]
        if len(d) == 0 or len(f) == 0:
            assert brand not in got.index
            continue
        row = got.loc[brand]
        assert (row["n_disc"], row["n_full"]) == (len(d), len(f)), brand
        ad, af = d.l_quantity.mean(), f.l_quantity.mean()
        assert abs(row["avg_qty_disc"] - ad) < 1e-9, brand
        assert abs(row["avg_qty_full"] - af) < 1e-9, brand
        assert abs(row["lift"] - ad / af) < 1e-9, brand


def test_bigram_novelty_matches_numpy(run):
    got = run("c_bigram_novelty").set_index("doc_id").sort_index()
    docs = _docs()
    doc_bg = {}
    df_count = Counter()
    for _, r in docs.iterrows():
        t = r.text.split(" ")
        if len(t) < 2:
            continue
        bgs = set(zip(t[:-1], t[1:]))
        doc_bg[r.doc_id] = bgs
        df_count.update(bgs)
    assert set(got.index) == set(doc_bg)
    for did, bgs in doc_bg.items():
        common = sum(1 for bg in bgs if df_count[bg] >= 3)
        row = got.loc[did]
        assert row["n_bg"] == len(bgs), did
        assert abs(row["common_frac"] - common / len(bgs)) < 1e-12, did


def test_repetition_stats_matches_numpy(run):
    got = run("c_repetition_stats").set_index("doc_id").sort_index()
    docs = _docs()
    expect = {}
    for _, r in docs.iterrows():
        t = r.text.split(" ")
        if len(t) < 2:
            continue  # docs without bigrams are dropped
        wc = Counter(t)
        bg = Counter(zip(t[:-1], t[1:]))
        expect[r.doc_id] = (
            len(t),
            len(wc),
            (len(t) - len(wc)) / len(t),
            max(wc.values()) / len(t),
            max(bg.values()) / (len(t) - 1),
        )
    assert set(got.index) == set(expect)
    for did, (nw, ndw, dupf, topw, topbg) in expect.items():
        row = got.loc[did]
        assert (row["n_words"], row["n_distinct_words"]) == (nw, ndw), did
        assert abs(row["dup_word_frac"] - dupf) < 1e-12, did
        assert abs(row["top_word_frac"] - topw) < 1e-12, did
        assert abs(row["top_bigram_frac"] - topbg) < 1e-12, did


def test_text_compress_ratio_matches_numpy(run):
    got = run("c_text_compress_ratio").set_index("doc_id").sort_index()
    docs = _docs()
    for _, r in docs.iterrows():
        n = len(r.text)
        if n >= 4:
            grams = len({r.text[i : i + 4] for i in range(n - 3)})
            proxy = grams / (n - 3)
        else:
            grams, proxy = 0, 0.0
        row = got.loc[r.doc_id]
        assert row["len"] == n, r.doc_id
        assert row["distinct_4grams"] == grams, r.doc_id
        assert abs(row["compress_proxy"] - proxy) < 1e-12, r.doc_id


def test_vocab_coverage_matches_numpy(run):
    got = run("c_vocab_coverage").set_index("doc_id").sort_index()
    docs = _docs()
    all_toks = Counter()
    per_doc = {}
    for _, r in docs.iterrows():
        t = r.text.split(" ")
        per_doc[r.doc_id] = t
        all_toks.update(t)
    top = sorted(all_toks.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    vocab = {w for w, _ in top}
    for did, t in per_doc.items():
        oov = sum(1 for w in t if w not in vocab)
        row = got.loc[did]
        assert row["n_toks"] == len(t), did
        assert abs(row["oov_frac"] - oov / len(t)) < 1e-12, did


def test_dup_inflation_matches_numpy(run):
    got = run("c_dup_inflation").set_index("source").sort_index()
    docs = _docs()
    corpus = pd.concat(
        [docs, docs[docs.doc_id % 3 == 0].assign(
            doc_id=lambda d: d.doc_id + 100000
        )]
    )
    per = corpus.groupby(["source", "text"]).agg(
        n_copies=("doc_id", "size"), chars_unique=("n_chars", "min")
    ).reset_index()
    for src, g in per.groupby("source"):
        total = int((g.n_copies * g.chars_unique).sum())
        uniq = int(g.chars_unique.sum())
        row = got.loc[src]
        assert row["n_docs"] == int(g.n_copies.sum()), src
        assert row["n_unique_texts"] == len(g), src
        assert row["chars_total"] == total, src
        assert row["chars_unique_total"] == uniq, src
        assert abs(row["inflation"] - total / uniq) < 1e-12, src


def test_degree_distribution_matches_numpy(run):
    got = run("c_degree_distribution").set_index("degree_bucket").sort_index()
    li = _li()[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        pks = sorted(set(g.l_partkey))
        for i in range(len(pks)):
            for jj in range(i + 1, len(pks)):
                edges.add((pks[i], pks[jj]))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    buckets = {}
    for _node, d in deg.items():
        bkt = int(np.floor(np.log2(d)))  # == len(bin(d)) - 1 for d >= 1
        buckets.setdefault(bkt, []).append(d)
    assert set(got.index) == set(buckets)
    for bkt, ds in buckets.items():
        row = got.loc[bkt]
        assert row["n_nodes"] == len(ds), bkt
        assert (row["min_deg"], row["max_deg"]) == (min(ds), max(ds)), bkt
