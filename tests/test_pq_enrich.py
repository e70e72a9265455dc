"""Tests for product quantization (llmops/pq.py) and the stream-static
enrichment join (streaming/enrich.py) — gate entries s07, st05."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.pq import encode_pq, pq_topk, train_pq
from gfw_data_api_spark.sources.tabular import load_table
from gfw_data_api_spark.streaming.enrich import stream_static_enrich


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def pq_setup(embeddings):
    books = train_pq(embeddings, m=8, ksub=16, seed=42)
    encoded = encode_pq(embeddings, books).select("vec_id", "pq_codes").cache()
    return books, encoded


def test_pq_shapes_and_determinism(embeddings, pq_setup):
    books, encoded = pq_setup
    dim = len(embeddings.select("embedding").first()[0])
    assert books.shape == (8, 16, dim // 8)
    rows = encoded.limit(5).collect()
    assert all(len(r.pq_codes) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.pq_codes)
    # retraining with the same seed reproduces the codebooks exactly
    books2 = train_pq(embeddings, m=8, ksub=16, seed=42)
    assert np.array_equal(books, books2)
    # ...even on a repartitioned copy (sample is content-hash-ordered,
    # not partition-order-dependent)
    books3 = train_pq(embeddings.repartition(7), m=8, ksub=16, seed=42)
    assert np.array_equal(books, books3)


def test_pq_and_ivf_reject_undersized_samples(embeddings):
    import pytest

    from gfw_data_api_spark.llmops.ivf import train_ivf

    tiny = embeddings.limit(3)
    with pytest.raises(ValueError, match="ksub"):
        train_pq(tiny, m=8, ksub=16)
    with pytest.raises(ValueError, match="nlist"):
        train_ivf(tiny, nlist=16)


def test_pq_quantization_error_beats_mean(embeddings, pq_setup):
    """PQ reconstruction must beat the trivial 1-centroid quantizer."""
    books, encoded = pq_setup
    m, ksub, dsub = books.shape
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in embeddings.limit(200).collect()
    }
    codes = {
        r.vec_id: r.pq_codes
        for r in encoded.filter(F.col("vec_id").isin(list(vecs))).collect()
    }
    x = np.stack([vecs[i] for i in sorted(vecs)])
    recon = np.stack(
        [
            np.concatenate([books[j][codes[i][j]] for j in range(m)])
            for i in sorted(vecs)
        ]
    )
    mse_pq = ((x - recon) ** 2).mean()
    mse_mean = ((x - x.mean(axis=0)) ** 2).mean()
    # near-isotropic testdata: 16 centroids per 8-dim subspace buys ~2×
    # (measured 0.54×); on clustered real embeddings the gain is larger
    assert mse_pq < 0.7 * mse_mean


def test_pq_adc_matches_numpy(pq_setup):
    """ADC scoring in Catalyst equals the NumPy table-lookup sum."""
    books, encoded = pq_setup
    m, ksub, dsub = books.shape
    q = [0.1] * (m * dsub)
    qv = np.asarray(q)
    table = np.stack(
        [
            ((books[j] - qv[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
            for j in range(m)
        ]
    )
    got = {r.vec_id: r.adc_dist for r in pq_topk(encoded, books, q, k=5).collect()}
    codes = {
        r.vec_id: r.pq_codes
        for r in encoded.filter(F.col("vec_id").isin(list(got))).collect()
    }
    for vid, dist in got.items():
        expect = sum(table[j][codes[vid][j]] for j in range(m))
        assert dist == pytest.approx(expect, rel=1e-12)


def test_pq_recall_vs_brute_force(embeddings, pq_setup):
    books, encoded = pq_setup
    all_vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in embeddings.collect()
    }
    ids = sorted(all_vecs)
    x = np.stack([all_vecs[i] for i in ids])
    q = x[0] + 0.01  # near an existing vector
    true_top = [ids[i] for i in np.argsort(((x - q) ** 2).sum(axis=1))[:10]]
    got = [r.vec_id for r in pq_topk(encoded, books, list(q), k=10).collect()]
    # the planted near-duplicate is findable through 8-byte codes; the
    # rest of the testdata's "top-10" are concentration-of-measure noise
    # (all pairwise distances nearly equal), so only overlap ≥1 is stable
    assert true_top[0] in got
    assert len(set(true_top) & set(got)) >= 1


def test_pq_plan_no_python_in_search(spark, tmp_path, pq_setup):
    """The ADC scan is pure Catalyst — no Python eval in the search plan.

    Codes are persisted and re-read (the at-scale deployment shape: encode
    once, store the 8-byte column, drop the floats) so the search plan is
    measured on its own, not on top of the encode UDF's lineage."""
    books, encoded = pq_setup
    m, _, dsub = books.shape
    path = str(tmp_path / "pq_codes")
    encoded.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    plan = (
        pq_topk(stored, books, [0.0] * (m * dsub), k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_stream_static_enrich_batch_twin(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(500)
    dim = events.groupBy("event_type").agg(F.count("*").alias("n_of_type"))
    out = stream_static_enrich(events, dim, "event_type")
    plain = events.join(dim, "event_type")
    assert out.count() == events.count()
    assert (
        out.select("event_id", "n_of_type")
        .exceptAll(plain.select("event_id", "n_of_type"))
        .count()
        == 0
    )
    # the fact side must not shuffle: broadcast join, no hash exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_stream_static_enrich_streaming_equals_batch(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(300)
    dim = events.groupBy("event_type").agg(F.count("*").alias("n_of_type"))
    src = str(tmp_path / "facts")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stream_static_enrich(stream, dim, "event_type", how="inner")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(sink)
    batch = stream_static_enrich(events, dim, "event_type", how="inner")
    assert streamed.count() == batch.count()
    assert (
        streamed.select("event_id", "n_of_type")
        .exceptAll(batch.select("event_id", "n_of_type"))
        .count()
        == 0
    )


def test_ivfpq_composition(spark, embeddings, pq_setup):
    from gfw_data_api_spark.llmops.ivf import build_ivf_index, train_ivf
    from gfw_data_api_spark.llmops.pq import ivfpq_topk

    books, _ = pq_setup
    from gfw_data_api_spark.llmops.pq import encode_pq

    cents = train_ivf(embeddings, nlist=8, seed=1)
    indexed = encode_pq(build_ivf_index(embeddings, cents), books)
    q = [float(v) for v in embeddings.select("embedding").first()[0]]
    got = ivfpq_topk(indexed, cents, books, q, k=5, nprobe=8)
    rows = got.collect()
    assert len(rows) == 5
    # probing ALL cells must equal plain PQ search over the whole set
    from gfw_data_api_spark.llmops.pq import pq_topk

    full = pq_topk(indexed, books, q, k=5).collect()
    assert [r.vec_id for r in rows] == [r.vec_id for r in full]
    # fewer probes search a subset: their best can't beat the global best
    some = ivfpq_topk(indexed, cents, books, q, k=5, nprobe=2).collect()
    assert len(some) == 5
    assert min(r.adc_dist for r in full) <= min(r.adc_dist for r in some)


def test_ivfpq_topk_batch_matches_per_query(embeddings, pq_setup):
    """One batched probe plan must return per-query results
    IEEE-identical to the single-query ivfpq_topk path."""
    from gfw_data_api_spark.llmops.ivf import build_ivf_index, train_ivf
    from gfw_data_api_spark.llmops.pq import encode_pq, ivfpq_topk, ivfpq_topk_batch

    books, _ = pq_setup
    cents = train_ivf(embeddings, nlist=8, seed=1)
    indexed = encode_pq(build_ivf_index(embeddings, cents), books).cache()
    queries = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in embeddings.filter(F.col("vec_id") < 3).collect()
    ]
    batch = ivfpq_topk_batch(indexed, cents, books, queries, k=5, nprobe=3).collect()
    for qid, qvec in queries:
        single = ivfpq_topk(indexed, cents, books, qvec, k=5, nprobe=3).collect()
        got = sorted(
            [(r.rank, r.vec_id, r.adc_dist) for r in batch if r.query_id == qid]
        )
        want = [(i + 1, r.vec_id, r.adc_dist) for i, r in enumerate(single)]
        assert got == want


def test_ivfpq_topk_batch_excludes_query_id(embeddings, pq_setup):
    from gfw_data_api_spark.llmops.ivf import build_ivf_index, train_ivf
    from gfw_data_api_spark.llmops.pq import encode_pq, ivfpq_topk_batch

    books, _ = pq_setup
    cents = train_ivf(embeddings, nlist=8, seed=1)
    indexed = encode_pq(build_ivf_index(embeddings, cents), books)
    queries = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in embeddings.filter(F.col("vec_id") < 2).collect()
    ]
    rows = ivfpq_topk_batch(
        indexed, cents, books, queries, k=5, nprobe=8, exclude_query_id=True
    ).collect()
    assert all(r.vec_id != r.query_id for r in rows)
    with pytest.raises(ValueError, match="at least one"):
        ivfpq_topk_batch(indexed, cents, books, [], k=5)


def test_ivfpq_refined_batch_reranks_exact(embeddings, pq_setup):
    """Refine must (a) return k cosine-ranked rows per query and (b) at
    full probe width + full refine width equal the exact brute-force
    cosine ranking — the ADC stage then only generates candidates."""
    from gfw_data_api_spark.llmops.ivf import build_ivf_index, train_ivf
    from gfw_data_api_spark.llmops.pq import (
        encode_pq,
        ivfpq_topk_refined_batch,
        train_pq,
    )
    from gfw_data_api_spark.llmops.similarity import brute_force_topk

    books, _ = pq_setup
    cents = train_ivf(embeddings, nlist=8, seed=1)
    indexed = encode_pq(build_ivf_index(embeddings, cents), books).cache()
    n = embeddings.count()
    queries = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in embeddings.filter(F.col("vec_id") < 2).collect()
    ]
    out = ivfpq_topk_refined_batch(
        indexed, embeddings, cents, books, queries, k=3, nprobe=8,
        refine_factor=(n + 2) // 3,
    ).collect()
    for qid, qvec in queries:
        got = [
            r.vec_id
            for r in sorted(
                (r for r in out if r.query_id == qid), key=lambda r: r.rank
            )
        ]
        want = [r.vec_id for r in brute_force_topk(embeddings, qvec, k=3).collect()]
        assert got == want
