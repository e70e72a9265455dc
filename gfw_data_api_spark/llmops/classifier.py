"""Learned quality filtering: logistic regression over quality signals.

The heuristic ``text.quality_signals`` score is hand-weighted; the
production recipe (GPT-3's WebText-vs-CommonCrawl filter, CCNet,
RefinedWeb) LEARNS the weights from a labeled seed set (curated = 1,
raw = 0) and scores the whole corpus with the trained model. Spark MLlib
makes both halves distributed: training is L-BFGS over the cluster
(each iteration one pass of gradient partial-aggregation — no driver
sample cap, unlike the k-means recipes that only need tiny models), and
scoring is one narrow map.

Features are the engine's own native quality signals (alpha/punct/
stopword ratios, lengths, Gopher repetition fractions) — cheap JVM
expressions, so the only per-row Python anywhere is none at all:
MLlib's LR transform is JVM-side too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.text import quality_signals, repetition_signals

#: native signal columns fed to the classifier
FEATURE_COLS = [
    "n_chars_sig",
    "n_tokens_sig",
    "alpha_ratio",
    "punct_ratio",
    "stopword_ratio",
    "mean_word_len",
    "top_word_frac",
    "top_bigram_frac",
]


def featurize(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach FEATURE_COLS (all native expressions) + an MLlib vector.

    Per-row signals come from ``quality_signals``; the Gopher repetition
    fractions are per-doc aggregates joined back on ``id_col``.
    """
    from pyspark.ml.feature import VectorAssembler

    sig = quality_signals(df, text_col)
    rep = repetition_signals(df, text_col=text_col, id_col=id_col).select(
        id_col, "top_word_frac", "top_bigram_frac"
    )
    sig = (
        sig.join(rep, id_col, "left")
        .na.fill({"top_word_frac": 0.0, "top_bigram_frac": 0.0})
        .withColumn("n_chars_sig", F.col("n_chars_sig").cast("double"))
        .withColumn("n_tokens_sig", F.col("n_tokens_sig").cast("double"))
    )
    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features", handleInvalid="keep"
    )
    return assembler.transform(sig)


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit LR on a labeled seed set (1 = curated/good, 0 = raw/bad).

    Returns the fitted MLlib model. Training distributes (per-iteration
    gradient aggregation), so the seed set can be arbitrarily large.
    """
    from pyspark.ml.classification import LogisticRegression

    feats = featurize(labeled, text_col, id_col)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=True,
    )
    return lr.fit(feats)


def score_quality(
    model,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """P(good) per document; JVM-side end to end."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(featurize(df, text_col, id_col))
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("features", "rawPrediction", "probability", "prediction")


def filter_by_quality(
    model,
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents the model scores at or above ``threshold``."""
    return (
        score_quality(model, df, text_col, id_col)
        .filter(F.col("quality_prob") >= threshold)
        .drop("quality_prob")
    )
