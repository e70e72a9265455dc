"""Incremental MinHash dedup (llmops/incremental.py): batch-vs-state
screening must find exactly what the one-shot run finds."""

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.dedup import minhash_lsh_candidates, minhash_signatures
from gfw_data_api_spark.llmops.incremental import (
    append_dedup,
    incremental_minhash_candidates,
)
from gfw_data_api_spark.sources.tabular import load_table

H, B, N = 64, 16, 3


@pytest.fixture(scope="module")
def split_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 3 != 0).cache()
    new = docs.filter(F.col("doc_id") % 3 == 0).cache()
    return old, new


def test_incremental_equals_one_shot(spark, split_corpus):
    old, new = split_corpus
    state = minhash_signatures(old, num_hashes=H, shingle_n=N)
    pairs, _ = incremental_minhash_candidates(
        new, state, num_hashes=H, bands=B, shingle_n=N
    )
    got = {
        (min(r.id_new, r.id_old), max(r.id_new, r.id_old)): r.est_jaccard
        for r in pairs.collect()
    }
    full = minhash_lsh_candidates(
        old.unionByName(new), num_hashes=H, bands=B, shingle_n=N
    )
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in full.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    }
    assert got == want  # same pairs AND same estimates


def test_append_dedup_drops_planted_dup(spark, split_corpus):
    old, new = split_corpus
    state = minhash_signatures(old, num_hashes=H, shingle_n=N)
    # plant: an exact copy of a historical doc + one clearly novel doc
    copied = old.limit(1).select(F.lit(10_000_000).alias("doc_id"), "text")
    novel = spark.createDataFrame(
        [(10_000_001, "entirely novel zebra quantum paperclip text " * 5)],
        "doc_id long, text string",
    )
    batch = new.unionByName(copied).unionByName(novel)
    clean, state2 = append_dedup(batch, state, threshold=0.8, num_hashes=H, bands=B, shingle_n=N)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert 10_000_000 not in kept  # exact dup of history → dropped
    assert 10_000_001 in kept  # novel → kept
    # state grows by exactly the kept docs
    assert state2.count() == state.count() + len(kept)


def test_first_run_empty_state(spark, split_corpus):
    _old, new = split_corpus
    empty = minhash_signatures(new.limit(0), num_hashes=H, shingle_n=N)
    pairs, sigs = incremental_minhash_candidates(
        new, empty, num_hashes=H, bands=B, shingle_n=N
    )
    # no history: only within-batch pairs possible, and signatures cover
    # every doc that produced shingles
    assert pairs.filter(F.col("id_new") == F.col("id_old")).count() == 0
    assert sigs.count() == new.filter(F.length("text") >= 3).count()


def test_leakage_free_split_keeps_clusters_together(spark):
    from gfw_data_api_spark.llmops.sampling import hash_split, leakage_free_split

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    # near-dup chains: (0,1),(1,2) one cluster; (10,11); (500,501) ...
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (500, 501), (502, 503), (503, 504)],
        "id_a long, id_b long",
    )
    out = leakage_free_split(docs, pairs, eval_fraction=0.2, seed=3)
    split = {r.doc_id: r.split for r in out.collect()}
    assert len(split) == 1000
    for cluster in [(0, 1, 2), (10, 11), (500, 501), (502, 503, 504)]:
        assert len({split[i] for i in cluster}) == 1, cluster
    # unpaired docs get exactly their plain hash_split assignment
    plain = {
        r.doc_id: r.split
        for r in hash_split(docs, eval_fraction=0.2, seed=3).collect()
    }
    paired = {0, 1, 2, 10, 11, 500, 501, 502, 503, 504}
    assert all(split[i] == plain[i] for i in range(1000) if i not in paired)
    # both splits are populated at this fraction
    assert {"train", "eval"} == set(split.values())


def test_leakage_free_split_empty_pairs_equals_hash_split(spark):
    from gfw_data_api_spark.llmops.sampling import hash_split, leakage_free_split

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    empty = spark.createDataFrame([], "id_a long, id_b long")
    a = {r.doc_id: r.split for r in leakage_free_split(docs, empty, seed=5).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, seed=5).collect()}
    assert a == b


def test_remove_repeated_spans_any_alignment(spark):
    from gfw_data_api_spark.llmops.clean import remove_repeated_spans

    # the duplicated 4-token phrase sits at DIFFERENT offsets in each doc
    # (a segment-boundary-straddling case stride-3 segmentation misses)
    phrase = "the cookie banner text"
    rows = [
        (1, f"alpha {phrase} beta"),
        (2, f"one two {phrase} three"),
        (3, "totally unique content here stays put"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.cleaned
        for r in remove_repeated_spans(df, window_tokens=4, max_count=1).collect()
    }
    assert out[1] == "alpha beta"
    assert out[2] == "one two three"
    assert out[3] == "totally unique content here stays put"


def test_remove_repeated_spans_long_run_fully_covered(spark):
    from gfw_data_api_spark.llmops.clean import remove_repeated_spans

    # a 6-token duplicate with window 4: every token of the run is inside
    # some repeated window, so the WHOLE run disappears
    run = "a b c d e f"
    df = spark.createDataFrame(
        [(1, f"x {run} y"), (2, f"p q {run}")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.cleaned
        for r in remove_repeated_spans(df, window_tokens=4, max_count=1).collect()
    }
    assert out[1] == "x y"
    assert out[2] == "p q"


def test_remove_repeated_spans_short_docs_survive(spark):
    from gfw_data_api_spark.llmops.clean import remove_repeated_spans

    # docs shorter than the window can never be flagged
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.cleaned
        for r in remove_repeated_spans(df, window_tokens=4).collect()
    }
    assert out == {1: "tiny doc", 2: "tiny doc", 3: ""}
