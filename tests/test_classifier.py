"""Learned quality classifier (llmops/classifier.py): MLlib LR over the
engine's native quality signals."""

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.classifier import (
    FEATURE_COLS,
    featurize,
    filter_by_quality,
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
