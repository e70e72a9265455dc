"""Tests for Unicode script profiling (llmops/text.script_signals, gate t22)."""

import pytest

from gfw_data_api_spark.llmops.text import SCRIPT_RANGES, script_signals


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return script_signals(df).collect()[0]


def test_counts_mixed_scripts(spark):
    r = _one(spark, "hello мир 中文 αβ 42!")
    assert r.n_latin == 5
    assert r.n_cyrillic == 3
    assert r.n_cjk == 2
    assert r.n_greek == 2
    assert r.n_digit == 2
    assert r.n_space == 4
    assert r.n_other == 1  # the '!'
    assert r.dominant_script == "latin"


def test_dominant_tie_breaks_by_range_order(spark):
    # 3 latin vs 3 cyrillic: latin is first in SCRIPT_RANGES, so it wins
    r = _one(spark, "abcмир")
    assert r.n_latin == 3 and r.n_cyrillic == 3
    assert r.dominant_script == "latin"
    # strictly more cyrillic flips it
    assert _one(spark, "abмир").dominant_script == "cyrillic"


def test_no_script_evidence_is_none_even_for_nonempty_text(spark):
    # 'none' means "no script-range characters", not "empty document"
    assert _one(spark, "123 456!").dominant_script == "none"


def test_empty_text_is_none_with_zero_ratios(spark):
    r = _one(spark, "")
    assert r.dominant_script == "none"
    assert r.n_other == 0
    for name, _ in SCRIPT_RANGES:
        assert getattr(r, f"n_{name}") == 0
        assert getattr(r, f"{name}_ratio") == 0.0


def test_ratios_sum_and_value(spark):
    r = _one(spark, "abcd мир")  # 4 latin, 3 cyr, 1 space => len 8
    assert r.latin_ratio == pytest.approx(0.5)
    assert r.cyrillic_ratio == pytest.approx(0.375)


def test_extended_blocks_count(spark):
    # é (latin-1 supplement), ｱ is HALFWIDTH katakana (U+FF71) -> other
    r = _one(spark, "éÿ가한ｱ")
    assert r.n_latin == 2
    assert r.n_hangul == 2
    assert r.n_other == 1


def test_hebrew_arabic_devanagari(spark):
    r = _one(spark, "שלום سلام नमस्ते")
    assert r.n_hebrew == 4
    assert r.n_arabic == 4
    assert r.n_devanagari == 6
    assert r.n_latin == 0


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("x",)], "text string")
    plan = script_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
