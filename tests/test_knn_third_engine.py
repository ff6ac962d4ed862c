"""Third-engine audit of the kNN family (VERDICT r12 audit list tail:
'the IVF recall invariants').

The registered c_knn_* queries emit hash-checkable invariants (exact
top-k triples; mean-recall@5 booleans), and their DuckDB oracles verify
the OUTPUT SHAPE — but the recall arithmetic itself (hits/k averaged
over queries vs threshold) lives only in Spark, exactly the collusion
shape the third-engine sweeps target. Recompute with numpy from the raw
embeddings: exact cosine top-5 per query, recall of each probe result,
and the mean-vs-threshold decision.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in df.embedding])
    ids = df.vec_id.to_numpy(np.int64)
    return ids, mat


def _numpy_exact_top5(ids, mat):
    """Exact cosine top-5 per query (vec_id % 50 == 0), self excluded."""
    norms = np.linalg.norm(mat, axis=1)
    qmask = ids % 50 == 0
    out = {}
    for qi in np.where(qmask)[0]:
        sims = mat @ mat[qi] / (norms * norms[qi])
        sims[qi] = -np.inf
        top = np.argsort(-sims, kind="stable")[:5]
        out[int(ids[qi])] = [int(ids[t]) for t in top]
    return out


def test_knn_cosine_matches_numpy(spark, emb):
    from popelines_spark import registry

    registry.load_all()
    got = registry.SPARK_QUERIES["c_knn_cosine"](spark, SF).toPandas()
    ids, mat = emb
    exact = _numpy_exact_top5(ids, mat)
    grouped = got.sort_values(["q_id", "rank"]).groupby("q_id")
    assert set(grouped.groups) == set(exact)
    for q, g in grouped:
        assert list(g.neighbor_id) == exact[int(q)], q


@pytest.mark.parametrize(
    "qname,probe,threshold",
    [("c_knn_ivf", "ivf", 0.32), ("c_knn_lsh", "lsh", 0.08)],
)
def test_ann_recall_invariant_matches_numpy(
    spark, emb, qname, probe, threshold
):
    """Recompute mean recall@5 of the ACTUAL probe output against
    numpy's exact neighbors and assert the registered query's boolean
    equals the independent decision."""
    from popelines_spark import registry
    from popelines_spark.queries.ext_similarity import (
        _queries_and_corpus,
        ensure_ivf_index,
        ensure_lsh_index,
    )

    registry.load_all()
    ids, mat = emb
    exact = _numpy_exact_top5(ids, mat)

    queries, _corpus = _queries_and_corpus(spark, SF)
    if probe == "ivf":
        from popelines_spark.llm.ivf import probe_ivf_index

        approx = probe_ivf_index(
            ensure_ivf_index(spark, SF), queries, k=5, n_probe=2
        ).toPandas()
    else:
        from popelines_spark.llm import similarity as S

        approx = S.probe_lsh_index(
            ensure_lsh_index(spark, SF), queries, k=5
        ).toPandas()

    recalls = []
    hit_lists = approx.groupby("q_id").neighbor_id.apply(list)
    for q in exact:
        hits = set(hit_lists.get(q, [])) & set(exact[q])
        recalls.append(len(hits) / 5.0)
    mean_recall = float(np.mean(recalls))

    got = registry.SPARK_QUERIES[qname](spark, SF).toPandas()
    assert set(got.q_id) == set(exact)
    flags = got.mean_recall_ok.unique()
    assert len(flags) == 1  # stamped uniformly on every row
    assert bool(flags[0]) == (mean_recall >= threshold), (
        f"{qname}: Spark's threshold decision disagrees with numpy's "
        f"independent mean recall {mean_recall:.4f} vs {threshold}"
    )
    # the invariant must also be TRUE on this SF (the registered claim)
    assert bool(flags[0]) is True, f"{qname} recall fell below threshold"
