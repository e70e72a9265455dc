"""Tokenizer-training statistics: adjacent-pair frequency (the BPE inner
loop's counting step).

Byte-pair encoding repeatedly merges the most frequent adjacent symbol
pair. The expensive, data-parallel part of training is the pair count
over the corpus; the merge itself is a tiny driver-side decision. This
module provides the corpus-scale counting step as a declarative plan:
explode every adjacent character pair, count, rank. Iterating
count→merge→re-segment is then a driver loop over cheap Spark jobs
(the same shape as the IVF k-means recipe in llmops/ivf.py).

Scale shape: explode is a narrow map (one row per character — the same
cost class as shingling in llmops/dedup.py); the count is a hash
aggregate on a key space capped by |alphabet|² with full map-side
combine, so the shuffle carries at most a few thousand rows per
partition regardless of corpus size. Top-k uses TakeOrdered — no global
sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def char_pair_stats(
    df: DataFrame, text_col: str = "text", top_k: int | None = None
) -> DataFrame:
    """(pair, cnt) for every adjacent character pair in ``text_col``.

    Ties in ``top_k`` mode break lexicographically on the pair so the
    result is deterministic across engines and partitionings.
    """
    pairs = (
        df.filter(F.length(F.col(text_col)) >= 2)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length(F.col(text_col)) - 1)
            ).alias("_i"),
            F.col(text_col).alias("_t"),
        )
        .select(F.expr("substring(_t, _i, 2)").alias("pair"))
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    if top_k is not None:
        counts = counts.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(top_k)
    return counts


def train_bpe_merges(
    df: DataFrame,
    num_merges: int = 100,
    text_col: str = "text",
    sample_size: int = 2_000,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list on a driver-side text sample.

    The same sample-driver/apply-distributed split as PQ and IVF
    training (llmops/pq.py, llmops/ivf.py): merge rules are a tiny
    model (``num_merges`` string pairs) that converges on a corpus
    sample, while APPLYING the tokenizer is the distributed job
    (:func:`apply_bpe`, one Arrow-batched pass). Training distributes
    naturally too when needed — each iteration is one
    :func:`char_pair_stats` job — but per-iteration job overhead
    dominates below ~GB-scale samples, so the driver loop on a sample
    is the right default (and what sentencepiece/HF tokenizers do).

    Deterministic: ties on pair frequency break lexicographically, and
    the sample is drawn by content hash (llmops/sampling.py
    deterministic_sample), so the learned merges are identical across
    runs and repartitionings of the same data.
    """
    from gfw_data_api_spark.llmops.sampling import deterministic_sample

    texts = deterministic_sample(df, text_col, sample_size)
    words: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.split():
            key = tuple(w)
            if key:
                words[key] = words.get(key, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, n in words.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        ab = best[0] + best[1]
        for seq, n in words.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + n
        words = merged
    return merges


def apply_bpe_catalyst(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    sep: str = "\x1f",
) -> DataFrame:
    """Tokenize with a merge list WITHOUT leaving the JVM: the whole
    encode is a chain of native ``replace`` expressions, so token
    analytics (counts, vocab stats) run inside whole-stage codegen with
    zero Python and zero shuffle.

    Encoding: words become ``sep``-delimited symbol strings
    (``\\x1fa\\x1fb\\x1f``), and each merge ``(a, b)`` in rank order is one
    ``replace(sep+a+sep+b+sep → sep+ab+sep)``. Sequential replace-all in
    rank order is exact BPE (a later merge can never create an
    earlier-rank pair, because earlier pairs' symbols predate it) —
    EXCEPT inside immediately repeated occurrences of the same pair
    (``abab``, ``aaa``): non-overlapping left-to-right replace consumes
    the shared boundary separator and skips the follow-on occurrence
    that true BPE would merge on its rescan. Natural-language words
    almost never hit this (pytest pins equality with :func:`apply_bpe`
    on the corpus vocabulary); use :func:`apply_bpe` when exact
    semantics matter more than staying JVM-side. The chain also bounds
    the practical vocabulary: each merge is one pass over the string, so
    this path fits analytic merge lists (tens to hundreds), not 50k-merge
    production vocabs — that is :func:`apply_bpe`'s job.

    ``sep`` (default U+001F) is stripped from the input first; merges
    containing ``sep`` or whitespace raise.
    """
    for a, b in merges:
        if sep in a or sep in b:
            raise ValueError(f"merge symbol contains the separator: {(a, b)!r}")
        if any(ch.isspace() for ch in a + b):
            raise ValueError(f"merge symbols must not contain whitespace: {(a, b)!r}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    cleaned = F.replace(text, F.lit(sep), F.lit(""))
    # '\x1fa\x1fb\x1f \x1fc\x1f...': every char gains a trailing sep, the
    # leading sep is prepended, and each whitespace char's own trailing
    # sep doubles as the next word's leading sep. Merges can never cross
    # a word boundary: the pattern requires sep-contiguity and any
    # whitespace char (its own sep-wrapped symbol) breaks it.
    s = F.concat(F.lit(sep), F.regexp_replace(cleaned, r"(?s)(.)", "$1" + sep))
    for a, b in merges:
        s = F.replace(s, F.lit(sep + a + sep + b + sep), F.lit(sep + a + b + sep))
    # all whitespace (not just space) is a boundary, matching the
    # pandas-UDF twin's str.split(); whitespace chars inside the encoded
    # string keep their own separators, so merges can never cross them.
    # (?U) makes Java's \s Unicode-aware (NBSP, U+2028, NEL, ...) like
    # Python's str.split(); the residual divergence is U+001C-U+001E
    # (FS/GS/RS), which Python treats as whitespace but Unicode does
    # not mark White_Space — documented, pinned in tests.
    tokens = F.filter(
        F.split(s, f"(?U)[{sep}\\s]"), lambda t: t != F.lit("")
    )
    return df.withColumn(out_col, tokens)


DEFAULT_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def bpe_vocab(
    merges: list[tuple[str, str]], alphabet: str = DEFAULT_ALPHABET
) -> dict[str, int]:
    """Token→id table derived from the merge list alone — the GPT-2
    construction: base symbols get ids in alphabet order, then each
    merge's output token gets the next id in RANK order. No corpus scan
    is needed (or wanted): the id space is a pure function of the
    tokenizer, so two pipelines sharing a merge list agree on ids
    without exchanging anything."""
    vocab = {c: i for i, c in enumerate(alphabet)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def encode_token_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "token_ids",
    alphabet: str = DEFAULT_ALPHABET,
    oov_id: int = -1,
    sep: str = "\x1f",
) -> DataFrame:
    """Text → BPE token-id arrays entirely JVM-side: the
    :func:`apply_bpe_catalyst` replace chain produces tokens, and a
    LITERAL ``create_map`` over the merge-derived vocabulary
    (:func:`bpe_vocab`) maps them to ids — no join, no shuffle, no
    Python. Symbols outside the alphabet (and thus outside every merge)
    encode as ``oov_id``; pipelines that must not lose bytes should
    normalize/strip before encoding and treat ``oov_id`` counts as a
    data-quality signal."""
    tmp = "_toks"
    while tmp in df.columns or tmp == out_col:
        tmp += "_"
    out = apply_bpe_catalyst(df, merges, text_col=text_col, out_col=tmp, sep=sep)
    vocab = bpe_vocab(merges, alphabet)
    m = F.create_map(*[F.lit(x) for kv in vocab.items() for x in kv])
    ids = F.transform(
        F.col(tmp), lambda t: F.coalesce(m[t], F.lit(oov_id)).cast("bigint")
    )
    return out.withColumn(out_col, ids).drop(tmp)


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (distributed).

    One Arrow-batched pandas UDF pass; merge application is the
    standard greedy lowest-rank-first loop per word. Whitespace splits
    words; merges never cross word boundaries (matching training).
    """
    rank = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        seq = list(word)
        while len(seq) > 1:
            pairs = [(rank.get((a, b)), i) for i, (a, b) in enumerate(zip(seq, seq[1:]))]
            cands = [(r, i) for r, i in pairs if r is not None]
            if not cands:
                break
            _, i = min(cands)
            seq = seq[:i] + [seq[i] + seq[i + 1]] + seq[i + 2:]
        cache[word] = seq
        return seq

    @pandas_udf(T.ArrayType(T.StringType()))
    def tokenize(batch: pd.Series) -> pd.Series:
        cache: dict = {}
        return batch.map(
            lambda t: [tok for w in (t or "").split() for tok in encode_word(w, cache)]
        )

    return df.withColumn(out_col, tokenize(F.col(text_col)))
