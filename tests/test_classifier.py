"""Hashed-n-gram linear classifier tests (llmops/classifier.py, gate
t24): feature construction, canonical-hash bucketing, exact integer
scoring, trained-weight path, and the zero-shuffle plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.classifier import hashed_linear_score, ngram_features


def _bucket(feature: str, dim: int, seed: int) -> int:
    h = hashlib.md5((feature + "\x1f" + str(seed)).encode()).hexdigest()
    return int(h[:15], 16) % dim


def _pseudo_w(bucket: int) -> int:
    h = hashlib.md5(("w:" + str(bucket)).encode()).hexdigest()
    return int(h[:15], 16) % 2001 - 1000


def _expected(text: str, dim: int = 1024, seed: int = 0, weights=None):
    toks = text.strip().lower().split()
    if not toks:
        toks = [""]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    score = sum(
        (weights[_bucket(f, dim, seed)] if weights else _pseudo_w(_bucket(f, dim, seed)))
        for f in feats
    )
    return len(feats), score


def test_features_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([("The quick  brown Fox",)], "text string")
    feats = df.select(ngram_features(F.col("text")).alias("f")).collect()[0].f
    assert feats == [
        "the", "quick", "brown", "fox",
        "the quick", "quick brown", "brown fox",
    ]


def test_single_token_has_no_bigrams(spark):
    df = spark.createDataFrame([("Word",)], "text string")
    feats = df.select(ngram_features(F.col("text")).alias("f")).collect()[0].f
    assert feats == ["word"]


def test_pseudo_weight_scores_match_independent_replay(spark):
    rows = [(1, "the cat sat on the mat"), (2, "x"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in hashed_linear_score(df).collect()}
    for doc_id, text in rows:
        n, score = _expected(text)
        assert got[doc_id].n_features == n, text
        assert got[doc_id].score_milli == score, text


def test_trained_weights_path(spark):
    dim = 8
    weights = [5, -3, 11, 0, -7, 2, 9, -1]
    rows = [(1, "a b a"), (2, "q")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r
        for r in hashed_linear_score(df, dim=dim, seed=3, weights=weights).collect()
    }
    for doc_id, text in rows:
        n, score = _expected(text, dim=dim, seed=3, weights=weights)
        assert got[doc_id].n_features == n
        assert got[doc_id].score_milli == score


def test_weight_table_validation():
    import pandas as pd  # noqa: F401  (spark-free construction below)

    class _Fake:
        pass

    with pytest.raises(ValueError, match="entries for dim"):
        hashed_linear_score(_Fake(), dim=4, weights=[1, 2])
    with pytest.raises(ValueError, match="INTEGER milli-units"):
        hashed_linear_score(_Fake(), dim=2, weights=[1, 0.5])


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = hashed_linear_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
