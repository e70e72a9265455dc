"""HTML → text extraction for crawl-derived corpora.

Every web-scale training pipeline starts from HTML (Common Crawl WARC/WET
lineage); the extraction step strips markup and boilerplate down to the
running text that every downstream operator (dedup, quality, lang-id)
consumes. This module implements that step as a PURE CATALYST chain of
``regexp_replace`` expressions — JVM-side, whole-stage-codegen'd, zero
shuffle, zero Python — so at 100 TB it pipelines with the scan exactly
like the PII scrubber (``llmops/clean.py``).

What it does, in contract order (the gate's oracle mirrors the observable
result, and unit tests pin each step):

1. drop ``<!-- comments -->`` and non-content blocks WITH their
   contents (``script``, ``style``, ``head``, ``nav``, ``header``,
   ``footer``, ``aside``, ``noscript``, ``template``) in ONE
   left-to-right pass — whichever construct opens first wins, the same
   disambiguation a browser tokenizer applies when a ``<!--`` appears
   inside script data or a ``<script>`` inside a comment;
   case-insensitive, attribute-safe,
2. strip every remaining tag to a single space (block boundaries must
   not glue words together),
3. decode the six entities that dominate real text (``&amp; &lt; &gt;
   &quot; &#39; &nbsp;``) — ``&amp;`` LAST so ``&amp;lt;`` decodes to the
   literal ``&lt;`` the author wrote, not to ``<``,
4. collapse all whitespace runs to single spaces and trim.

Documented boundaries (loud in tests, fine for corpus work): this is a
regex extractor, not an HTML5 tree parser — a literal ``>`` inside a
quoted attribute value ends the tag early, and mis-nested non-content
blocks fall back to tag-stripping (their text leaks through rather than
being dropped). CDATA sections are treated as text. Pipelines needing
DOM-exact extraction decode in ``mapInPandas`` with a real parser; this
operator is the fast path that covers the overwhelming majority of crawl
pages without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block elements whose CONTENT is boilerplate, not text.
NON_CONTENT_TAGS = (
    "script",
    "style",
    "head",
    "nav",
    "header",
    "footer",
    "aside",
    "noscript",
    "template",
)

# ONE alternation for comments and non-content blocks, scanned left to
# right: whichever construct OPENS first consumes the other — the same
# winner a browser tokenizer picks ('<!--' inside <script> is script
# data; '<script>' inside a comment is inert markup). Two sequential
# passes would let either construct hide unterminated forms of the
# other and swallow real content. (?is): dotall + case-insensitive;
# [^>]* tolerates attributes; the closing tag allows whitespace before
# '>'; non-greedy bodies.
_BOILERPLATE_RE = (
    r"(?is)(?:<!--.*?-->|<("
    + "|".join(NON_CONTENT_TAGS)
    + r")\b[^>]*>.*?</\1\s*>)"
)
_TAG_RE = r"(?s)<[^>]+>"

# Entity decode order is part of the contract: &amp; must be LAST.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html_col(html: Column) -> Column:
    """Extracted running text of an HTML column (see module contract)."""
    out = F.regexp_replace(html, _BOILERPLATE_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, repl in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def extract_html_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Append ``out_col`` with the extracted text of ``html_col``."""
    return df.withColumn(out_col, strip_html_col(F.col(html_col)))
