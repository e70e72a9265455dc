"""Tests for the JVM-side BPE encode (llmops/bpe.apply_bpe_catalyst, gate b02)."""

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.bpe import apply_bpe, apply_bpe_catalyst, train_bpe_merges

MERGES = [
    ("e", "r"),
    ("i", "n"),
    ("o", "r"),
    ("o", "w"),
    ("s", "t"),
    ("m", "er"),
    ("p", "a"),
    ("pa", "r"),
]


def _tok(spark, text, merges=MERGES, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return apply_bpe_catalyst(df, merges, **kw).collect()[0].bpe_tokens


def test_basic_encode_matches_hand_bpe(spark):
    assert _tok(spark, "merge order") == ["mer", "g", "e", "or", "d", "er"]
    assert _tok(spark, "part") == ["par", "t"]
    assert _tok(spark, "sort in store") == ["s", "or", "t", "in", "st", "or", "e"]


def test_catalyst_equals_pandas_path_on_corpus_vocab(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = train_bpe_merges(df, num_merges=30)
    assert len(merges) >= 8
    a = apply_bpe(df, merges).select("doc_id", "bpe_tokens")
    b = apply_bpe_catalyst(df, merges).select("doc_id", "bpe_tokens")
    rows_a = {r.doc_id: r.bpe_tokens for r in a.collect()}
    rows_b = {r.doc_id: r.bpe_tokens for r in b.collect()}
    assert rows_a == rows_b


def test_documented_divergence_on_repeated_pairs(spark):
    # 'aaaa': true BPE -> [aa, aa]; the replace chain consumes the shared
    # boundary and leaves [aa, a, a]. This is the documented boundary.
    merges = [("a", "a")]
    df = spark.createDataFrame([(1, "aaaa")], "doc_id bigint, text string")
    true_bpe = apply_bpe(df, merges).collect()[0].bpe_tokens
    fast = apply_bpe_catalyst(df, merges).collect()[0].bpe_tokens
    assert true_bpe == ["aa", "aa"]
    assert fast == ["aa", "a", "a"]


def test_multichar_merge_does_not_false_match_inside_symbols(spark):
    # symbol 'pa' + symbol 'r' merges; but 'par' inside an unmerged word
    # like 'spar' must first form 'pa' before 'par' can apply
    assert _tok(spark, "spar") == ["s", "par"]
    # 'opar': 'pa' forms, then 'par'
    assert _tok(spark, "opar") == ["o", "par"]


def test_empty_null_and_sep_stripping(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "in\x1fdata")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.bpe_tokens for r in apply_bpe_catalyst(df, MERGES).collect()}
    assert got[1] == []
    assert got[2] == []
    # embedded separators are stripped BEFORE encoding: 'indata'
    assert got[3] == ["in", "d", "a", "t", "a"]


def test_invalid_merges_raise(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="separator"):
        apply_bpe_catalyst(df, [("a", "\x1f")])
    with pytest.raises(ValueError, match="whitespace"):
        apply_bpe_catalyst(df, [("a ", "b")])
    with pytest.raises(ValueError, match="whitespace"):
        apply_bpe_catalyst(df, [("a", "\tb")])


def test_all_whitespace_is_a_word_boundary_matching_pandas_twin(spark):
    df = spark.createDataFrame([(1, "in\nstore\tin part")], "doc_id bigint, text string")
    fast = apply_bpe_catalyst(df, MERGES).collect()[0].bpe_tokens
    slow = apply_bpe(df, MERGES).collect()[0].bpe_tokens
    assert fast == slow
    assert "\n" not in fast and "\t" not in fast


def test_bpe_vocab_is_merge_derived():
    from gfw_data_api_spark.llmops.bpe import bpe_vocab

    vocab = bpe_vocab([("a", "b"), ("ab", "c"), ("a", "b")], alphabet="abc")
    # base symbols first in alphabet order, then merge outputs in rank
    # order, duplicates skipped
    assert vocab == {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}


def test_encode_token_ids_and_oov(spark):
    from gfw_data_api_spark.llmops.bpe import bpe_vocab, encode_token_ids

    vocab = bpe_vocab(MERGES)
    df = spark.createDataFrame(
        [(1, "merge order"), (2, "naïve")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.token_ids for r in encode_token_ids(df, MERGES).collect()}
    # tokens: mer g e or d er
    assert got[1] == [
        vocab["mer"], vocab["g"], vocab["e"], vocab["or"], vocab["d"], vocab["er"]
    ]
    # 'ï' is outside the alphabet -> oov id
    assert -1 in got[2]
    assert [t for t in got[2] if t >= 0] == [vocab["n"], vocab["a"], vocab["v"], vocab["e"]]


def test_encode_token_ids_temp_column_collision_safe(spark):
    from gfw_data_api_spark.llmops.bpe import encode_token_ids

    df = spark.createDataFrame([(1, "in", "keepme")], "doc_id bigint, text string, _toks string")
    out = encode_token_ids(df, MERGES).collect()[0]
    assert out._toks == "keepme"  # caller's column survives
    assert out.token_ids == [MERGES.index(("i", "n")) + 26]
    # out_col named '_toks' must also work (output, not dropped)
    out2 = encode_token_ids(df.drop("_toks"), MERGES, out_col="_toks").collect()[0]
    assert out2._toks == [MERGES.index(("i", "n")) + 26]


def test_encode_token_ids_plan_is_shuffle_and_python_free(spark):
    from gfw_data_api_spark.llmops.bpe import encode_token_ids

    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        encode_token_ids(df, MERGES)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        apply_bpe_catalyst(df, MERGES)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unicode_whitespace_is_a_boundary_matching_pandas_twin(spark):
    """ADVICE r5: Java \\s is ASCII-only without (?U) -- NBSP/U+2028 in
    ordinary web text must split exactly like the pandas twin's
    str.split(), not surface as spurious symbol tokens."""
    df = spark.createDataFrame(
        [(1, "ab\xa0cd"), (2, "ab cd"), (3, "abcd　ef")],
        "doc_id bigint, text string",
    )
    fast = {r.doc_id: r.bpe_tokens for r in apply_bpe_catalyst(df, MERGES).collect()}
    slow = {r.doc_id: r.bpe_tokens for r in apply_bpe(df, MERGES).collect()}
    assert fast == slow
    for toks in fast.values():
        assert all(not t.isspace() for t in toks)


def test_documented_divergence_on_python_only_whitespace(spark):
    """U+001C-U+001E are isspace() in Python but not Unicode White_Space:
    the catalyst path keeps them as symbol chars while the pandas twin
    splits -- the residual divergence the (?U) docstring pins."""
    df = spark.createDataFrame([(1, "ab\x1ccd")], "doc_id bigint, text string")
    fast = apply_bpe_catalyst(df, MERGES).collect()[0].bpe_tokens
    slow = apply_bpe(df, MERGES).collect()[0].bpe_tokens
    assert "\x1c" in "".join(fast)  # catalyst: FS is an ordinary symbol
    assert "\x1c" not in "".join(slow)  # twin: FS is a word boundary
