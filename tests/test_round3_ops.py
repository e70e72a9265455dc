"""Round-3 operator additions: stream-stream interval join, Gopher rule
filter, containment pairs, temperature mixture, semantic dedup."""

import datetime

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.sources.tabular import load_table


# ---------------------------------------------------------------------------
# stream-stream interval join
# ---------------------------------------------------------------------------


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def click_purchase(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(40), 101), (2, _ts(5), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    purchases = spark.createDataFrame(
        [
            (1, _ts(10), 200),   # joins click 100 (within 30m) only
            (1, _ts(45), 201),   # joins click 101; 45m after click 100 → out
            (2, _ts(4), 202),    # BEFORE click 102 → no join (lower bound)
            (3, _ts(7), 203),    # no matching user
        ],
        "user_id long, ts timestamp, event_id long",
    )
    return clicks, purchases


def test_interval_join_semantics(spark, click_purchase):
    from gfw_data_api_spark.streaming.join import stream_stream_interval_join

    clicks, purchases = click_purchase
    out = stream_stream_interval_join(clicks, purchases, keys="user_id", upper="30 minutes")
    pairs = {(r.event_id, r.right_event_id) for r in out.collect()}
    assert pairs == {(100, 200), (101, 201)}


def test_interval_join_streaming_equals_batch(spark, tmp_path, sf_dir):
    from gfw_data_api_spark.streaming.join import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "purchases")
    views.write.parquet(vsrc)
    purchases.write.parquet(psrc)
    vstream = spark.readStream.schema(views.schema).parquet(vsrc)
    pstream = spark.readStream.schema(purchases.schema).parquet(psrc)
    out = stream_stream_interval_join(vstream, pstream, keys="user_id", upper="30 minutes")
    assert out.isStreaming
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
    streamed = spark.read.parquet(sink).select("event_id", "right_event_id")
    batch = stream_stream_interval_join(
        views, purchases, keys="user_id", upper="30 minutes"
    ).select("event_id", "right_event_id")
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0


# ---------------------------------------------------------------------------
# Gopher rule battery
# ---------------------------------------------------------------------------


def test_gopher_rules_verdicts(spark):
    from gfw_data_api_spark.llmops.text import gopher_quality_rules

    good = "the quick brown fox jumps with energy and that is fine to be of note " * 5
    too_short = "the end"
    symbol_soup = ("# " * 40) + "the of and be to that have with words here"
    long_words = ("pneumonoultramicroscopic " * 60) + "the of and"
    docs = spark.createDataFrame(
        [(1, good), (2, too_short), (3, symbol_soup), (4, long_words)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_rules(docs, min_words=30).collect()}
    assert out[1].keep
    assert not out[2].keep          # below word-count floor
    assert not out[3].keep          # symbol/word ratio blown
    assert out[3].symbol_word_ratio > 0.1
    assert not out[4].keep          # mean word length above ceiling
    assert out[4].mean_word_chars > 10
    assert out[1].stopword_hits >= 2


def test_gopher_rules_bullets_and_ellipsis(spark):
    from gfw_data_api_spark.llmops.text import gopher_quality_rules

    filler = "the of and that have with be to " * 8
    bullets = "\n".join(["- item one of the list"] * 9 + [filler])
    ellipsis = "\n".join(["so it goes on and on..."] * 5 + [filler] * 5)
    docs = spark.createDataFrame(
        [(1, bullets), (2, ellipsis)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_quality_rules(docs, min_words=10).collect()}
    assert out[1].bullet_line_fraction == 0.9
    assert not out[1].keep is None
    assert out[2].ellipsis_line_fraction == 0.5
    assert not out[2].keep          # above the 0.3 ellipsis-line cap


# ---------------------------------------------------------------------------
# containment pairs
# ---------------------------------------------------------------------------


def test_containment_catches_quotes_jaccard_misses(spark):
    from gfw_data_api_spark.llmops.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "to be or not to be that is the question"
    article = (
        "in the famous soliloquy the prince says "
        + quote
        + " and the audience reflects on mortality and the play proceeds "
        + "with many other lines entirely of its own invention number "
        + " ".join(f"line{i} of filler text keeps going" for i in range(30))
    )
    docs = spark.createDataFrame(
        [(1, article), (2, quote)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(docs, shingle_n=3, threshold=0.8).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.containment == 1.0          # every quote shingle is in the article
    assert row.containment_b == 1.0
    assert row.containment_a < 0.2         # article is mostly its own text
    # jaccard at the same strictness finds nothing
    assert ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.8).count() == 0


# ---------------------------------------------------------------------------
# temperature mixture
# ---------------------------------------------------------------------------


def test_temperature_mixture_limits(spark):
    from gfw_data_api_spark.llmops.mixture import temperature_mixture_weights

    docs = spark.createDataFrame(
        [("big", "w " * 900), ("small", "w " * 90), ("tiny", "w " * 10)],
        "source string, text string",
    )
    # alpha=1 keeps raw shares; alpha=0 is uniform
    raw = {r.domain: r for r in temperature_mixture_weights(docs, alpha=1.0).collect()}
    assert abs(raw["big"].temp_frac - raw["big"].token_frac) < 1e-12
    assert abs(raw["big"].sample_weight - 1.0) < 1e-12
    uni = {r.domain: r for r in temperature_mixture_weights(docs, alpha=0.0).collect()}
    assert abs(uni["tiny"].temp_frac - 1 / 3) < 1e-12
    # 0<alpha<1 flattens: small domains upsampled, big downsampled
    mid = {r.domain: r for r in temperature_mixture_weights(docs, alpha=0.3).collect()}
    assert mid["tiny"].sample_weight > 1.0 > mid["big"].sample_weight
    assert abs(sum(r.temp_frac for r in mid.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted_dups(spark):
    import numpy as np

    from gfw_data_api_spark.llmops.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
    # plant near-dups of vectors 3 and 7 (tiny perturbation → cosine ≈ 1)
    for j, src in ((100, 3), (101, 7)):
        v = base[src] + rng.normal(scale=1e-4, size=8)
        rows.append((j, [float(x) for x in v], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = semantic_dedup(df, threshold=0.99, nlist=4)
    ids = {r.vec_id for r in out.collect()}
    # the planted copies (higher ids) are dropped, originals survive
    assert 100 not in ids and 101 not in ids
    assert 3 in ids and 7 in ids
    assert len(ids) == 40


def test_semantic_dedup_single_cluster_equals_exact(spark, sf_dir):
    """nlist=1 removes the clustering recall loss: survivors must equal
    the exact all-pairs keep-lowest-id policy."""
    from gfw_data_api_spark.llmops.similarity import (
        blocked_cosine_pairs,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200).cache()
    thr = 0.4
    approx = {r.vec_id for r in semantic_dedup(emb, threshold=thr, nlist=1).collect()}
    exact_pairs = blocked_cosine_pairs(
        emb.withColumn("_one", F.lit(1)),
        block_col="_one",
        threshold=thr,
        max_block_size=None,
        guard="plan",
    )
    dropped = {r.id_b for r in exact_pairs.select("id_b").distinct().collect()}
    exact = {r.vec_id for r in emb.select("vec_id").collect()} - dropped
    assert approx == exact
    emb.unpersist()


def test_semantic_dedup_recall_on_planted_dups(spark, sf_dir):
    """Clustering loses only CROSS-cluster pairs, and true near-dups
    (cosine → 1) land in the same cell by construction — so recall on
    planted duplicates must be perfect even with real clustering, while
    weakly-similar pairs (the cosine≈0.35 tail) are allowed to escape.
    No false positives either way: every drop must be a planted copy."""
    import numpy as np

    from gfw_data_api_spark.llmops.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.limit(200).collect()
    rng = np.random.default_rng(11)
    planted = []
    originals = rng.choice(len(base), size=20, replace=False)
    for j, idx in enumerate(originals):
        row = base[idx]
        v = np.asarray(row.embedding, dtype=np.float64)
        v = v + rng.normal(scale=1e-4, size=v.shape)
        planted.append((1_000_000 + j, [float(x) for x in v], int(row.label)))
    dup_df = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>, label int"
    )
    full = emb.unionByName(dup_df).cache()
    survivors = {
        r.vec_id for r in semantic_dedup(full, threshold=0.99, nlist=8).collect()
    }
    planted_ids = {p[0] for p in planted}
    all_ids = {r.vec_id for r in full.select("vec_id").collect()}
    dropped = all_ids - survivors
    assert dropped == planted_ids  # perfect recall, zero false positives
    full.unpersist()
