"""Tests for cross-document paragraph dedup (llmops/dedup.paragraph_dedup,
gate d14) and HTML text extraction (llmops/html.py, gate c04)."""

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.dedup import paragraph_dedup
from gfw_data_api_spark.llmops.html import extract_html_text, strip_html_col


def _rows(df):
    return {r.doc_id: r for r in df.collect()}


# ---------------------------------------------------------------------------
# paragraph_dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_keeps_global_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon paragraph\ngamma"),
            (2, "common paragraph\ndelta"),
            (3, "delta\ncommon paragraph\nepsilon"),
        ],
        "doc_id bigint, text string",
    )
    got = _rows(paragraph_dedup(df))
    assert got[1].text == "alpha beta\ncommon paragraph\ngamma"
    assert got[1].n_paras_dropped == 0
    # doc 2 owns the first 'delta' (pos 1 in doc 2 beats pos 0 in doc 3)
    assert got[2].text == "delta"
    assert (got[2].n_paras_kept, got[2].n_paras_dropped) == (1, 1)
    assert got[3].text == "epsilon"
    assert got[3].n_paras_dropped == 2


def test_paragraph_dedup_all_dropped_doc_becomes_empty(spark):
    df = spark.createDataFrame(
        [(1, "same para"), (2, "same para")], "doc_id bigint, text string"
    )
    got = _rows(paragraph_dedup(df))
    assert got[1].text == "same para"
    assert got[2].text == ""
    assert (got[2].n_paras_kept, got[2].n_paras_dropped) == (0, 1)


def test_paragraph_dedup_min_chars_exempts_short_paragraphs(spark):
    df = spark.createDataFrame(
        [(1, "aa\n\nlong paragraph one"), (2, "aa\n\nlong paragraph two")],
        "doc_id bigint, text string",
    )
    # empty lines and 'aa' are exempt below min_chars=3: kept in BOTH docs
    got = _rows(paragraph_dedup(df, min_chars=3))
    assert got[1].text == "aa\n\nlong paragraph one"
    assert got[2].text == "aa\n\nlong paragraph two"
    # with the floor at 1, 'aa' dedups but empty lines still survive
    got2 = _rows(paragraph_dedup(df, min_chars=1))
    assert got2[2].text == "\nlong paragraph two"
    with pytest.raises(ValueError, match="min_chars"):
        paragraph_dedup(df, min_chars=-1)


def test_paragraph_dedup_within_doc_repeats_collapse(spark):
    df = spark.createDataFrame(
        [(7, "dup line\nmiddle\ndup line")], "doc_id bigint, text string"
    )
    got = _rows(paragraph_dedup(df))
    assert got[7].text == "dup line\nmiddle"
    assert (got[7].n_paras_kept, got[7].n_paras_dropped) == (2, 1)


def test_paragraph_dedup_custom_separator_is_literal(spark):
    # '||' must be treated literally, not as a regex alternation
    df = spark.createDataFrame(
        [(1, "a b||c d"), (2, "c d||e f")], "doc_id bigint, text string"
    )
    got = _rows(paragraph_dedup(df, sep="||"))
    assert got[1].text == "a b||c d"
    assert got[2].text == "e f"


# ---------------------------------------------------------------------------
# extract_html_text
# ---------------------------------------------------------------------------


def _strip(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(strip_html_col(F.col("html")).alias("t")).collect()[0].t


def test_html_basic_tags_entities_whitespace(spark):
    html = "<html><body><p>Hello   <b>world</b></p><p>Tom &amp; Jerry &lt;3</p></body></html>"
    assert _strip(spark, html) == "Hello world Tom & Jerry <3"


def test_html_drops_boilerplate_blocks_with_content(spark):
    html = (
        "<head><title>SEO title</title><style>p{color:red}</style></head>"
        "<body><NAV class='m'>Home | About</NAV>real content"
        "<script>var x = '<p>fake</p>';</script>"
        "<footer>© corp</footer><aside>ads</aside></body>"
    )
    assert _strip(spark, html) == "real content"


def test_html_comments_and_double_escaped_entities(spark):
    html = "a<!-- hidden <p>markup</p> -->b &amp;lt; stays-literal"
    # &amp;lt; is the AUTHOR writing '&lt;' — must not double-decode to '<'
    assert _strip(spark, html) == "a b &lt; stays-literal"


def test_paragraph_dedup_null_text_stays_null_with_zero_counts(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "real para")], "doc_id bigint, text string"
    )
    got = _rows(paragraph_dedup(df))
    assert got[1].text is None
    assert (got[1].n_paras_kept, got[1].n_paras_dropped) == (0, 0)
    assert got[2].text == "real para"


def test_html_comment_opener_inside_script_does_not_swallow_content(spark):
    # the browser-tokenizer rule: '<!--' inside script data is script
    # text, so the script block (opened first) wins and real content
    # after it survives
    html = '<script>var s = "<!--";</script><p>text</p><!-- note --><p>more</p>'
    assert _strip(spark, html) == "text more"
    # and the mirror case: a <script> inside a comment is inert markup
    assert _strip(spark, "a<!-- <script>x</script> -->b") == "a b"


def test_html_tags_become_word_boundaries(spark):
    assert _strip(spark, "one<br>two<div>three</div>four") == "one two three four"


def test_html_nbsp_and_numeric_apostrophe(spark):
    assert _strip(spark, "it&#39;s a&nbsp;gap") == "it's a gap"


def test_extract_html_text_dataframe_api(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id bigint, html string")
    out = extract_html_text(df)
    assert out.columns == ["doc_id", "html", "text"]
    assert out.collect()[0].text == "x"


def test_html_extraction_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id bigint, html string")
    plan = extract_html_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
