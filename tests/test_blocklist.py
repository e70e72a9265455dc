"""Tests for keyword blocklist screening (llmops/clean.py, gate c06)."""

import pytest

from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals


def _one(spark, text, keywords, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return keyword_blocklist_signals(df, keywords, **kw).collect()[0]


def test_counts_and_blocked_flag(spark):
    r = _one(spark, "spam here and SPAM there, plus scam", ["spam", "scam"])
    assert r.n_blocklist_hits == 3  # case-insensitive by default
    assert r.is_blocked is True
    clean = _one(spark, "all fine here", ["spam", "scam"])
    assert (clean.n_blocklist_hits, clean.is_blocked) == (0, False)


def test_whole_word_boundaries(spark):
    r = _one(spark, "badwords are not badword matches", ["badword"])
    assert r.n_blocklist_hits == 1  # 'badwords' must NOT match
    loose = _one(spark, "badwords", ["badword"], whole_word=False)
    assert loose.n_blocklist_hits == 1


def test_overlapping_keywords_count_longest(spark):
    r = _one(spark, "foobar foo", ["foo", "foobar"])
    assert r.n_blocklist_hits == 2  # foobar once (not foo+bar), foo once


def test_case_sensitive_mode(spark):
    r = _one(spark, "Spam spam", ["spam"], case_insensitive=False)
    assert r.n_blocklist_hits == 1


def test_regex_metachars_are_literal(spark):
    r = _one(spark, "price is $9.99 (sale)", ["$9.99", "(sale)"], whole_word=False)
    assert r.n_blocklist_hits == 2


def test_punctuated_keywords_match_in_whole_word_mode(spark):
    # FlashText semantics: \b only where the keyword edge is a word char,
    # so '$9.99' and '18+' are matchable with whole_word=True
    r = _one(spark, "price $9.99 now, rated 18+ ok", ["$9.99", "18+"])
    assert r.n_blocklist_hits == 2
    # the word-char edge still gets a boundary: '18+' inside '318+' no,
    # wait — leading '1' is a word char so \b blocks the superstring
    sup = _one(spark, "item 318+ listed", ["18+"])
    assert sup.n_blocklist_hits == 0


def test_alternation_order_is_deterministic():
    import re

    from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals  # noqa: F401

    # equal-length keywords must tie-break lexicographically, not by set
    # iteration order — rebuild the parts list the way the function does
    ks = {"spam", "scam", "exam"}
    parts = sorted(set(ks), key=lambda k: (-len(k), k))
    assert parts == ["exam", "scam", "spam"]


def test_validation(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="non-empty"):
        keyword_blocklist_signals(df, [])
    with pytest.raises(ValueError, match="Aho-Corasick"):
        keyword_blocklist_signals(df, [f"kw{i:05d}" for i in range(4000)])


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        keyword_blocklist_signals(df, ["spam"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Aho-Corasick large-blocklist path (llmops/clean.py, gate c08)
# ---------------------------------------------------------------------------


def test_ac_matches_regexp_path_on_disjoint_blocklists(spark):
    from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals_ac

    texts = [
        "spam here and SPAM there, plus scam",
        "badwords are not badword matches",
        "price $9.99 now, rated 18+ ok",
        "all clean text",
        "",
    ]
    kws = ["spam", "scam", "badword", "$9.99", "18+"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i bigint, text string")
    for ci in (True, False):
        a = {r.i: (r.n_blocklist_hits, r.is_blocked)
             for r in keyword_blocklist_signals(df, kws, case_insensitive=ci).collect()}
        b = {r.i: (r.n_blocklist_hits, r.is_blocked)
             for r in keyword_blocklist_signals_ac(df, kws, case_insensitive=ci).collect()}
        assert a == b


def test_ac_scales_past_the_regexp_guard(spark):
    from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals_ac

    kws = [f"kw{i:05d}" for i in range(4000)] + ["needle"]
    df = spark.createDataFrame(
        [(1, "hay kw00042 hay needle"), (2, "nothing")], "i bigint, text string"
    )
    got = {r.i: r.n_blocklist_hits for r in keyword_blocklist_signals_ac(df, kws).collect()}
    assert got == {1: 2, 2: 0}


def test_ac_documented_overlap_divergence():
    from gfw_data_api_spark.llmops.clean import AhoCorasick

    ac = AhoCorasick(["foo", "foobar"])
    # AC reports every match; the regexp path would count foobar once
    assert ac.count_hits("foobar", whole_word=False) == 2
    # suffix-via-failure-link matches count too
    ac2 = AhoCorasick(["she", "he"])
    assert ac2.count_hits("she", whole_word=False) == 2


def test_ac_ascii_parity_with_java_regex_on_unicode(spark):
    from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals_ac

    # probed Java semantics: \b is UNICODE-aware ('spamé' has NO boundary
    # after 'm', so 'spam' must not match) while (?i) folds ASCII only
    # ('CAFÉ' does not match keyword 'café'); both paths must agree
    df = spark.createDataFrame(
        [(1, "spamé here"), (2, "CAFÉ time"), (3, "spam café")], "i bigint, text string"
    )
    for fn in (keyword_blocklist_signals, keyword_blocklist_signals_ac):
        got = {r.i: r.n_blocklist_hits for r in fn(df, ["spam", "café"]).collect()}
        assert got == {1: 0, 2: 0, 3: 2}, fn.__name__


def test_ac_null_text_propagates_like_regexp_path(spark):
    from gfw_data_api_spark.llmops.clean import keyword_blocklist_signals_ac

    df = spark.createDataFrame([(1, None), (2, "")], "i bigint, text string")
    for fn in (keyword_blocklist_signals, keyword_blocklist_signals_ac):
        got = {r.i: (r.n_blocklist_hits, r.is_blocked) for r in fn(df, ["x"]).collect()}
        assert got == {1: (None, None), 2: (0, False)}, fn.__name__


def test_empty_keyword_rejected_both_paths(spark):
    from gfw_data_api_spark.llmops.clean import (
        AhoCorasick,
        keyword_blocklist_signals_ac,
    )

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="non-empty strings"):
        keyword_blocklist_signals(df, ["ok", ""])
    with pytest.raises(ValueError, match="non-empty strings"):
        keyword_blocklist_signals_ac(df, ["ok", ""])
    with pytest.raises(ValueError, match="non-empty strings"):
        AhoCorasick([""])


def test_ac_whole_word_edges():
    from gfw_data_api_spark.llmops.clean import AhoCorasick

    ac = AhoCorasick(["badword", "18+"])
    assert ac.count_hits("badword ok") == 1
    assert ac.count_hits("badwords") == 0
    assert ac.count_hits("xbadword") == 0
    assert ac.count_hits("rated 18+ here") == 1
    assert ac.count_hits("318+") == 0  # word-char leading edge blocked


# ---------------------------------------------------------------------------
# mojibake repair (llmops/clean.py, gate c07)
# ---------------------------------------------------------------------------


def test_mojibake_repair_roundtrip(spark):
    from gfw_data_api_spark.llmops.clean import _cp1252ish, repair_mojibake

    originals = ["café", "naïve—right’s “quote”", "10°C … €5", "touché über"]
    rows = [(i, _cp1252ish(t.encode("utf-8"))) for i, t in enumerate(originals)]
    # the mangled strings really are mojibake, not the originals
    assert all(m != o for (_, m), o in zip(rows, originals))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.text for r in repair_mojibake(df).collect()}
    assert got == dict(enumerate(originals))


def test_mojibake_repair_leaves_clean_text_alone(spark):
    from gfw_data_api_spark.llmops.clean import repair_mojibake

    clean = "plain ascii text and real café already fine"
    df = spark.createDataFrame([(1, clean)], "doc_id bigint, text string")
    assert repair_mojibake(df).collect()[0].text == clean


def test_mojibake_longest_first_ordering():
    from gfw_data_api_spark.llmops.clean import MOJIBAKE_TABLE

    lens = [len(bad) for bad, _ in MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)
    assert all(len(bad) >= 2 for bad, _ in MOJIBAKE_TABLE)
