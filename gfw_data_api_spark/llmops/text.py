"""Text analysis operators: tokenization, quality signals, language ID,
fingerprinting. All native column expressions — at 100 TB these run inside
whole-stage codegen with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A compact function-word list per language: enough signal for the n-gram
# heuristic on whitespace-tokenized text (public, standard stopword sets).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por", "un"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ein", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "du", "que", "une", "dans"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored token estimate: split on word boundaries and
    punctuation runs (the regex analog of a byte-pair pre-tokenizer)."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[^\w])|(?<=[^\w])"),
            lambda t: F.trim(t) != "",
        )
    ).cast("bigint")


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword signals + a composite quality score
    in [0,1]. Everything derives from native expressions."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    en_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS["en"])))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))

    df = (
        df.withColumn("n_chars_sig", n_chars.cast("bigint"))
        .withColumn("n_tokens_sig", n_tokens.cast("bigint"))
        .withColumn("alpha_ratio", (alpha_chars / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("punct_ratio", (punct_chars / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("stopword_ratio", (en_stop / F.greatest(n_tokens, F.lit(1))).cast("double"))
        .withColumn("mean_word_len", mean_word_len.cast("double"))
    )
    # composite: reward alpha text with sane word lengths and some function
    # words; penalize punctuation soup (heuristic, monotone, bounded)
    score = (
        F.least(F.col("alpha_ratio") * 1.2, F.lit(1.0)) * 0.5
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10), 0.2).otherwise(0.0)
        - F.least(F.col("punct_ratio") * 2.0, F.lit(0.2))
    )
    return df.withColumn("quality_score", F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)))


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """n-gram/function-word language heuristic.

    Scores each language by function-word hits per token; CJK codepoint
    density short-circuits to zh. The argmax is a chain of native
    comparisons — no UDF, no shuffle.
    """
    text = F.col(text_col)
    toks = tokens_col(F.lower(text))
    n_tokens = F.greatest(F.size(toks), F.lit(1))

    def _hits(words: list[str]):
        # NB: the lambda must take exactly one parameter — PySpark infers
        # the higher-order-function arity from the signature. (A single
        # aggregate() with a struct accumulator was measured 2× slower
        # than these per-language filters: struct rebuild per token costs
        # more than the repeated split.)
        return lambda t: t.isin(words)

    scores = {
        lang: F.size(F.filter(toks, _hits(words))) / n_tokens
        for lang, words in STOPWORDS.items()
    }
    cjk_chars = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    cjk_ratio = cjk_chars / F.greatest(F.length(text), F.lit(1))

    best = F.lit("unknown")
    best_score = F.lit(0.015)  # floor: below this we don't claim a language
    for lang, score in scores.items():
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    pred = F.when(cjk_ratio > 0.05, F.lit("zh")).otherwise(best)
    return df.withColumn(out_col, pred)


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Document fingerprint: 64-bit hash of the first-k-token prefix plus a
    length bucket — a cheap rolling-hash-style signature for candidate
    grouping."""
    toks = tokens_col(F.col(text_col))
    prefix = F.concat_ws(" ", F.slice(toks, 1, k))
    bucket = F.floor(F.log2(F.greatest(F.length(F.col(text_col)), F.lit(1)) + 1))
    return df.withColumn(
        "fingerprint", F.concat_ws(":", F.xxhash64(prefix).cast("string"), bucket.cast("string"))
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """TF-IDF scores for each document's ``top_k`` most frequent terms.

    Shape at scale: one explode + two hash aggregations (term frequency
    per doc, document frequency per term), a broadcast-sized term-df
    join, and a per-doc window for the top-k. N_docs is one count() job
    (a scalar). Ranking is by INTEGER term frequency (ties by term), so
    result membership is exact across engines; the float only appears in
    the reported score.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))  # (doc,term) rows are distinct
    w = Window.partitionBy("_id").orderBy(F.desc("tf"), F.asc("term"))
    return (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .join(docfreq, "term")
        .select(
            F.col("_id").alias(id_col),
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
