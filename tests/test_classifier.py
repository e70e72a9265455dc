"""Quality classifiers (llmops/classifier.py): MLlib LR over the
engine's native quality signals, and the hashed-n-gram linear scorer
(gate t24) — feature construction, canonical-hash bucketing, exact
integer scoring, trained-weight path, and the zero-shuffle plan."""

import hashlib

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.classifier import (
    FEATURE_COLS,
    featurize,
    filter_by_quality,
    hashed_linear_score,
    ngram_features,
    score_quality,
    train_quality_classifier,
)

GOOD = [
    "The quick brown fox jumps over the lazy dog near the quiet river bank.",
    "She walked to the market in the morning and bought fresh bread for the family.",
    "A gentle rain fell over the hills while the children played in the old barn.",
    "He wrote a long letter to his brother about the harvest and the coming winter.",
    "The library was quiet except for the soft turning of pages in the reading room.",
]
BAD = [
    "$$$ CLICK HERE!!! >>> %%% ### @@@ !!! ***** $$$ >>> !!!",
    "buy buy buy buy buy buy buy buy buy buy buy buy buy buy",
    "@@## $$%% ^^&& **(( ))__ ++== [[]] {{}} ||\\\\ ;;:: ''\"\"",
    "zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz",
    "!!! win $$$ win !!! win $$$ win !!! win $$$ win !!! win",
]


@pytest.fixture(scope="module")
def seed(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0.0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double").cache()


def test_featurize_columns(seed):
    out = featurize(seed)
    for c in FEATURE_COLS:
        assert c in out.columns
    assert "features" in out.columns
    row = out.filter(F.col("doc_id") == 0).first()
    assert len(row.features) == len(FEATURE_COLS)


def test_classifier_separates_good_from_bad(spark, seed):
    model = train_quality_classifier(seed)
    scored = score_quality(model, seed)
    probs = {r.doc_id: r.quality_prob for r in scored.collect()}
    good_p = [probs[i] for i in range(len(GOOD))]
    bad_p = [probs[100 + i] for i in range(len(BAD))]
    assert min(good_p) > max(bad_p)  # perfect separation on the seed
    # generalizes to held-out lookalikes
    held = spark.createDataFrame(
        [
            (1000, "The old man sat by the window and watched the evening light fade away."),
            (1001, "### $$$ ### $$$ ### $$$ ### $$$ ### $$$ ### $$$"),
        ],
        "doc_id long, text string",
    )
    hp = {r.doc_id: r.quality_prob for r in score_quality(model, held).collect()}
    assert hp[1000] > hp[1001]


def test_filter_by_quality(spark, seed):
    model = train_quality_classifier(seed)
    kept = filter_by_quality(model, seed.drop("label"), threshold=0.5)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids == set(range(len(GOOD)))


def test_scoring_plan_no_python(seed):
    model = train_quality_classifier(seed)
    plan = (
        score_quality(model, seed)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # native signals + MLlib JVM transform: no Python eval anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# hashed-n-gram linear scorer (gate t24)
# ---------------------------------------------------------------------------


def _bucket(feature: str, dim: int, seed: int) -> int:
    h = hashlib.md5((feature + "\x1f" + str(seed)).encode()).hexdigest()
    return int(h[:15], 16) % dim


def _pseudo_w(bucket: int) -> int:
    h = hashlib.md5(f"w:{bucket}\x1f0".encode()).hexdigest()
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
    class _Fake:
        pass

    with pytest.raises(ValueError, match="entries for dim"):
        hashed_linear_score(_Fake(), dim=4, weights=[1, 2])
    with pytest.raises(ValueError, match="INTEGER milli-units"):
        hashed_linear_score(_Fake(), dim=2, weights=[1, 0.5])


def test_hashed_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = hashed_linear_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
