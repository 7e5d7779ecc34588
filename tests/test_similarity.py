"""Similarity search: brute-force top-k vs numpy oracle; LSH recall."""

from __future__ import annotations

import numpy as np
import pytest

from turboxsl_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(17)
    dim, n_clusters, per = 32, 8, 30
    centers = rng.standard_normal((n_clusters, dim)) * 3
    vecs = []
    for ci in range(n_clusters):
        vecs.append(centers[ci] + rng.standard_normal((per, dim)) * 0.3)
    arr = np.vstack(vecs).astype(np.float32)
    return arr


@pytest.fixture(scope="module")
def corpus(spark, vectors):
    rows = [(i, vectors[i].tolist()) for i in range(len(vectors))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def _numpy_topk(vectors, q_idx, k):
    q = vectors[q_idx].astype(np.float64)
    m = vectors.astype(np.float64)
    sims = m @ q / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(m)), -sims))
    return [i for i in order if i != q_idx][:k]


def test_brute_force_matches_numpy(spark, corpus, vectors):
    queries = corpus.where("vec_id IN (0, 35, 111)").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    got = brute_force_topk(
        corpus.where("vec_id NOT IN (0, 35, 111)"), queries, k=5
    ).toPandas()
    for q in (0, 35, 111):
        want = [i for i in _numpy_topk(vectors, q, 8) if i not in (0, 35, 111)][:5]
        mine = got[got.q_id == q].sort_values("rank")["vec_id"].tolist()
        assert mine == want, f"query {q}: {mine} != {want}"


def test_lsh_topk_recall(spark, corpus, vectors):
    """Clustered data: LSH with multiprobe must recover most of the true
    top-5 (same-cluster points agree on most hyperplane signs)."""
    queries = corpus.where("vec_id IN (10, 70, 130)").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    approx = lsh_topk(
        corpus, queries, k=5, nbits=8, dim=32, multiprobe=1
    ).toPandas()
    hits = total = 0
    for q in (10, 70, 130):
        true = set(_numpy_topk(vectors, q, 6)[:5])
        got = set(approx[approx.q_id == q]["vec_id"]) - {q}
        hits += len(true & got)
        total += 5
    assert hits / total >= 0.6, f"recall {hits}/{total}"
