"""Quantitative recall gates for the approximate-similarity family
(s03 LSH / s05 IVF / s07 PQ are rows-only in the oracle gate — these
tests give them a measured quality bar against the exact twin).

Clustered data, not the random testdata embeddings: random vectors
suffer concentration of measure (all pairwise distances nearly equal),
so "recall" against them measures noise. A seeded 8-cluster Gaussian
mixture has real neighbor structure, which is the regime ANN indexes
exist for."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

N_CLUSTERS = 8
PER_CLUSTER = 150
DIM = 32
K = 10


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.concatenate(
        [c + 0.08 * rng.normal(size=(PER_CLUSTER, DIM)) for c in centers]
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id long, embedding array<float>",
    ).cache()
    df.count()
    queries = [
        pts[i] + 0.05 * rng.normal(size=DIM)
        for i in (0, 151, 345, 590, 777, 901, 1050, 1180)
    ]
    yield df, pts, queries
    df.unpersist()


def _exact_top(pts: np.ndarray, q: np.ndarray, k: int = K) -> set:
    cos = pts @ q / (np.linalg.norm(pts, axis=1) * np.linalg.norm(q))
    return set(np.argsort(-cos)[:k])


def _recalls(pts, queries, retrieve) -> list[float]:
    out = []
    for q in queries:
        got = retrieve([float(x) for x in q])
        out.append(len(_exact_top(pts, q) & got) / K)
    return out


def test_lsh_multitable_recall(clustered):
    from gfw_data_api_spark.llmops.similarity import ann_topk

    df, pts, queries = clustered
    rec = _recalls(
        pts,
        queries,
        lambda q: {
            r.vec_id
            for r in ann_topk(
                df, q, k=K, planes=10, probe_hamming=2, tables=4
            ).collect()
        },
    )
    assert np.mean(rec) >= 0.9, rec
    assert min(rec) >= 0.8, rec


def test_ivf_recall(clustered):
    from gfw_data_api_spark.llmops.ivf import build_ivf_index, ivf_topk, train_ivf

    df, pts, queries = clustered
    centroids = train_ivf(df, nlist=N_CLUSTERS, iters=5)
    indexed = build_ivf_index(df, centroids).cache()
    indexed.count()
    try:
        rec = _recalls(
            pts,
            queries,
            lambda q: {
                r.vec_id
                for r in ivf_topk(indexed, centroids, q, k=K, nprobe=2).collect()
            },
        )
    finally:
        indexed.unpersist()
    assert np.mean(rec) >= 0.95, rec


def test_pq_refined_recall(clustered):
    """Raw 8-byte ADC ranks coarsely by design; the deployment shape is
    candidate generation + exact refine, and THAT carries the bar."""
    from gfw_data_api_spark.llmops.pq import encode_pq, pq_topk_refined, train_pq

    df, pts, queries = clustered
    books = train_pq(df, m=8, ksub=16)
    enc = encode_pq(df, books).cache()
    enc.count()
    try:
        rec = _recalls(
            pts,
            queries,
            lambda q: {
                r.vec_id
                for r in pq_topk_refined(
                    enc, df, books, q, k=K, refine_factor=10
                ).collect()
            },
        )
    finally:
        enc.unpersist()
    assert np.mean(rec) >= 0.85, rec
    assert min(rec) >= 0.6, rec
