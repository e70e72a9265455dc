"""PII scrubbing for training corpora: detect + redact emails, phone
numbers, and IPv4 addresses with native regexp expressions.

The patterns are deliberately conservative and RE2-compatible (no
backreferences/lookaround) so the same pattern string runs identically
on Spark (Java regex) and DuckDB (RE2) — which is what lets the gate
hash-compare redacted output across engines. Redaction is a chained
``regexp_replace`` — JVM-side, codegen'd, no Python in the loop; at
100 TB this is a pure map stage that pipelines with the scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

REDACTIONS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


# Typographic normalization tables (public Unicode ranges). translate()
# maps 1:1 where both strings have a char and DELETES source chars with
# no counterpart — identical semantics in Spark and DuckDB/Postgres, so
# the zero-width set sits at the tail of _TRANSLATE_FROM with no
# counterpart in _TRANSLATE_TO.
_CURLY_SINGLE = "\u2018\u2019\u201a\u201b\u2032"
_CURLY_DOUBLE = "\u201c\u201d\u201e\u201f\u2033"
_DASHES = "\u2010\u2011\u2012\u2013\u2014\u2015\u2212"
_UNI_SPACES = (
    "\u00a0\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008"
    "\u2009\u200a\u202f\u205f\u3000"
)
_ZERO_WIDTH = "\u200b\u200c\u200d\u2060\ufeff\u00ad"
_TRANSLATE_FROM = _CURLY_SINGLE + _CURLY_DOUBLE + _DASHES + _UNI_SPACES + _ZERO_WIDTH
_TRANSLATE_TO = (
    "'" * len(_CURLY_SINGLE) + '"' * len(_CURLY_DOUBLE) + "-" * len(_DASHES) + " " * len(_UNI_SPACES)
)
# C0/C1 controls minus \t \n \r (which the whitespace squeeze handles)
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_text_col(
    text: Column, collapse_whitespace: bool = True, nfc: bool = True
) -> Column:
    """Unicode + typographic text normalization.

    Steps, in order (the order is part of the contract — the gate's
    DuckDB oracle mirrors it function-for-function):

    1. ``translate``: curly quotes → ASCII quotes, en/em/figure dashes →
       ``-``, Unicode spaces → ASCII space, zero-width chars deleted.
    2. Strip remaining C0/C1 control chars (keeping tab/newline/CR,
       which step 3 owns). Removing \\x0b/\\x0c here also keeps the
       later ``\\s`` classes identical between Java regex and RE2.
    3. Optionally collapse whitespace runs to single spaces and trim.
    4. Optionally NFC-normalize (combining sequences → precomposed) —
       the one step that needs Python (Arrow-batched pandas_udf over
       ``Series.str.normalize``); everything before is JVM codegen.
    """
    t = F.translate(text, _TRANSLATE_FROM, _TRANSLATE_TO)
    t = F.regexp_replace(t, _CONTROL_RE, "")
    if collapse_whitespace:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if nfc:
        from pyspark.sql.types import StringType

        @F.pandas_udf(StringType())
        def _nfc(s):
            return s.str.normalize("NFC")

        t = _nfc(t)
    return t


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    collapse_whitespace: bool = True,
    nfc: bool = True,
) -> DataFrame:
    """DataFrame wrapper for :func:`normalize_text_col`; adds ``out_col``."""
    return df.withColumn(
        out_col, normalize_text_col(F.col(text_col), collapse_whitespace, nfc)
    )


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pattern, _ in REDACTIONS
    ]


def redact_col(text: Column) -> Column:
    """Chained redaction. Order matters: emails first so alphanumeric
    hosts are consumed whole before later passes see their dotted parts;
    phones before IPs so dotted phone numbers (555.123.4567) redact as
    phones. A numeric-host address (user@1.2.3.4) is not an email by
    the TLD rule — its host redacts as an IP."""
    out = text
    for _, pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, per-class counts, redacted text) for every document."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        *pii_counts(text),
        redact_col(text).alias("redacted"),
    )


# Curated repair set for the dominant mojibake class in web crawls:
# UTF-8 bytes mis-decoded as cp1252/latin-1 ("cafÃ©" for café,
# "â€™" for ’). The ftfy core cases, kept to unambiguous
# multi-char sequences so a repair can never fire on legitimate text of
# the same shape (the sequences contain 'Ã'/'â€'-class junk that real
# prose doesn't produce).
_MOJIBAKE_CHARS = "éèêëáàâäçíìîïñóòôöúùûüýÿ–—‘’“”…°€™•"


def _cp1252ish(raw: bytes) -> str:
    """Decode bytes the way a confused cp1252 consumer does: cp1252
    where defined, latin-1 control chars for the five undefined bytes."""
    out = []
    for byte in raw:
        try:
            out.append(bytes([byte]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


MOJIBAKE_TABLE: list[tuple[str, str]] = sorted(
    ((_cp1252ish(ch.encode("utf-8")), ch) for ch in _MOJIBAKE_CHARS),
    key=lambda kv: len(kv[0]),
    reverse=True,
)


def repair_mojibake_col(text: Column) -> Column:
    """Undo UTF-8-read-as-cp1252 double encoding for the curated char
    set — chained literal ``replace`` (longest sequences first so
    3-byte repairs never leave 2-byte fragments), pure codegen, no
    regex. A full ftfy does iterative chardet-style inference; this is
    the deterministic 95% case a corpus pipeline wants on the hot path."""
    out = text
    for bad, good in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def repair_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(text_col, repair_mojibake_col(F.col(text_col)))


def keyword_blocklist_signals(
    df: DataFrame,
    keywords: list[str],
    text_col: str = "text",
    case_insensitive: bool = True,
    whole_word: bool = True,
) -> DataFrame:
    """Blocklist screening (the FlashText/banned-word pass every corpus
    pipeline runs for NSFW/spam/doc-type filters): append
    ``n_blocklist_hits`` (total occurrences across all keywords) and
    ``is_blocked`` (any hit).

    One compiled alternation evaluated by native ``regexp_count`` — a
    single codegen map over the scan, no UDF, no shuffle. Keywords are
    regex-quoted (treated as literals) and sorted longest-first so an
    overlapping pair like ``foo``/``foobar`` counts the longer term at
    each site, and ``whole_word`` wraps the alternation in ``\\b`` so
    substrings inside larger words don't match. The alternation scales
    to the hundreds-of-terms blocklists these filters actually use; a
    pattern over 20k chars raises — beyond that an Aho-Corasick trie in
    ``mapInPandas`` is the right tool, and the loud error says so.
    """
    if not keywords:
        raise ValueError("keywords must be non-empty")
    if any(not k for k in keywords):
        raise ValueError("blocklist keywords must be non-empty strings")
    import re as _re

    def _wrap(k: str) -> str:
        esc = _re.escape(k)
        if not whole_word:
            return esc
        # FlashText semantics: a \b boundary is only meaningful next to
        # a word character — wrapping a punctuated keyword like '$9.99'
        # or '(sale)' in \b..\b would make it unmatchable, so each edge
        # gets a boundary only when its own character is a word char
        word = _re.compile(r"[A-Za-z0-9_]")
        pre = r"\b" if word.match(k[0]) else ""
        suf = r"\b" if word.match(k[-1]) else ""
        return pre + esc + suf

    # longest-first, then lexicographic: the tie-break keeps the compiled
    # pattern byte-identical across processes (set order is hash-seeded)
    parts = [_wrap(k) for k in sorted(set(keywords), key=lambda k: (-len(k), k))]
    pattern = "(?:" + "|".join(parts) + ")"
    if case_insensitive:
        pattern = "(?i)" + pattern
    if len(pattern) > 20_000:
        raise ValueError(
            f"blocklist pattern is {len(pattern)} chars (>20000); "
            "use an Aho-Corasick mapInPandas pass for blocklists this large"
        )
    hits = F.regexp_count(F.col(text_col), F.lit(pattern)).cast("bigint")
    return df.withColumn("n_blocklist_hits", hits).withColumn(
        "is_blocked", F.col("n_blocklist_hits") > 0
    )


class AhoCorasick:
    """Multi-pattern string matcher (Aho–Corasick automaton): build once
    driver-side over the blocklist, scan each text in O(len) regardless
    of keyword count — the scale path the regexp alternation's 20k-char
    guard points at. Pure Python, small state (goto/fail/output tables),
    pickles cleanly into Spark task closures."""

    def __init__(self, keywords: list[str], case_insensitive: bool = True):
        if not keywords:
            raise ValueError("keywords must be non-empty")
        if any(not k for k in keywords):
            raise ValueError("blocklist keywords must be non-empty strings")
        self.case_insensitive = case_insensitive
        kws = sorted({_ascii_lower(k) if case_insensitive else k for k in keywords})
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[int]] = [[]]
        self._kw_len: list[int] = []
        for kw in kws:
            state = 0
            for ch in kw:
                nxt = self._goto[state].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    nxt = len(self._goto) - 1
                    self._goto[state][ch] = nxt
                state = nxt
            self._out[state].append(len(self._kw_len))
            self._kw_len.append(len(kw))
        # BFS failure links
        from collections import deque

        self._fail = [0] * len(self._goto)
        q = deque(self._goto[0].values())
        while q:
            s = q.popleft()
            for ch, t in self._goto[s].items():
                q.append(t)
                f = self._fail[s]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[t] = self._goto[f].get(ch, 0) if self._goto[f].get(ch, 0) != t else 0
                self._out[t] = self._out[t] + self._out[self._fail[t]]

    def count_hits(self, text: str, whole_word: bool = True) -> int:
        """Occurrences of any keyword; with ``whole_word``, a hit whose
        word-character edge touches another word character is rejected
        (the FlashText rule the regexp path applies via \\b)."""
        if not text:
            return 0
        if self.case_insensitive:
            text = _ascii_lower(text)
        hits = 0
        state = 0
        for i, ch in enumerate(text):
            while state and ch not in self._goto[state]:
                state = self._fail[state]
            state = self._goto[state].get(ch, 0)
            for kw_idx in self._out[state]:
                if whole_word:
                    start = i - self._kw_len[kw_idx] + 1
                    first, last = text[start], text[i]
                    if _is_word(first) and start > 0 and _is_word(text[start - 1]):
                        continue
                    if _is_word(last) and i + 1 < len(text) and _is_word(text[i + 1]):
                        continue
                hits += 1
        return hits


# Parity with the regexp twin, PROBED against Spark's actual Java
# regex (not assumed): Java's \b is UNICODE-aware ('spamé' has no
# boundary after 'm' — é is a word char) while (?i) folds ASCII only
# ('café' does not match 'CAFÉ'). So the AC path uses Unicode
# isalnum() for word edges and an ASCII-scoped fold for case.
_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _ascii_lower(s: str) -> str:
    return s.translate(_ASCII_FOLD)


def _is_word(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


def keyword_blocklist_signals_ac(
    df: DataFrame,
    keywords: list[str],
    text_col: str = "text",
    case_insensitive: bool = True,
    whole_word: bool = True,
) -> DataFrame:
    """Large-blocklist twin of :func:`keyword_blocklist_signals`: same
    output columns and matching semantics, but the matcher is an
    Aho–Corasick automaton scanned in Arrow batches — O(text length)
    per row independent of keyword count, so 100k-term blocklists cost
    the same scan as 10-term ones. Equality with the regexp path on
    shared inputs is pinned in tests; NOTE one deliberate divergence:
    overlapping keywords count EVERY match (AC reports all), while the
    regexp path consumes text left-to-right — on blocklists (disjoint
    vocabulary) the two agree."""
    from pyspark.sql import types as _T
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    ac = AhoCorasick(keywords, case_insensitive=case_insensitive)

    @_pandas_udf(_T.LongType())
    def _hits(batch: pd.Series) -> pd.Series:
        # NULL text propagates as NULL, matching the regexp twin's
        # regexp_count(NULL) semantics ('' still counts as 0)
        return batch.map(
            lambda t: None if t is None else ac.count_hits(t, whole_word)
        )

    return df.withColumn("n_blocklist_hits", _hits(F.col(text_col))).withColumn(
        "is_blocked", F.col("n_blocklist_hits") > 0
    )


# ---------------------------------------------------------------------------
# URL canonicalization (web-corpus dedup prep)
# ---------------------------------------------------------------------------

# tracking params stripped by every major crawl-dedup pipeline
_TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonicalize_url_col(url: Column) -> Column:
    """Normalize a URL for dedup keying, all native regexp ops:

    1. lowercase scheme+host (path stays case-sensitive per RFC 3986),
    2. drop the fragment,
    3. strip tracking params (utm_*, fbclid, gclid, ref),
    4. drop default ports (:80 http, :443 https),
    5. collapse a now-empty query ("?", "?&") and trailing "&",
    6. drop a bare trailing slash on the path.

    RE2-compatible patterns throughout — the DuckDB oracle runs the
    same strings.
    """
    # 1: lowercase everything before the first "/" after "//"
    out = F.concat(
        F.lower(F.regexp_extract(url, r"^([a-zA-Z]+://[^/?#]*)", 1)),
        F.regexp_replace(url, r"^[a-zA-Z]+://[^/?#]*", ""),
    )
    out = F.regexp_replace(out, r"#.*$", "")                         # 2
    out = F.regexp_replace(out, _TRACKING_PARAM_RE, "")              # 3
    out = F.regexp_replace(out, r"^(http://[^/?#]*):80(/|\?|$)", r"$1$2")   # 4
    out = F.regexp_replace(out, r"^(https://[^/?#]*):443(/|\?|$)", r"$1$2")
    out = F.regexp_replace(out, r"\?&+", "?")                        # 5
    out = F.regexp_replace(out, r"[?&]+$", "")
    out = F.regexp_replace(out, r"&&+", "&")
    out = F.regexp_replace(out, r"^([a-z]+://[^/?#]+)/$", r"$1")     # 6
    return out


def url_dedup_keys(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, canonical_url) — groupBy(canonical_url) is the web-corpus
    exact-URL dedup; the canonical form is also the right partitioning
    key for per-site pipelines (host prefix groups a site's pages)."""
    return df.select(
        F.col(id_col),
        canonicalize_url_col(F.col(url_col)).alias("canonical_url"),
    )


def remove_repeated_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_tokens: int | None = None,
    delimiter: str = "\n",
    max_count: int = 1,
) -> DataFrame:
    """Corpus-level repeated-segment removal — the C4/MassiveText "line
    dedup" pass: segments whose exact text occurs more than
    ``max_count`` times across the whole corpus are dropped from every
    document (boilerplate navigation, cookie banners, license headers),
    and each document is reassembled from its surviving segments in
    order.

    Segmentation: ``delimiter``-split lines by default, or fixed
    non-overlapping ``segment_tokens``-token windows (for corpora with
    no line structure); token mode reassembles with a single space.
    Note this drops ALL copies of a hot segment (MassiveText semantics),
    not all-but-one (C4): keeping "one canonical copy" of corpus-scale
    boilerplate still poisons the survivor document.

    Scale shape: one posexplode (narrow), one count aggregation on the
    segment text (map-side combine absorbs hot segments), one anti-join
    of segments↔hot-set on the same key, one per-doc reassembly
    aggregation ordered by position. Documents losing every segment
    come back as empty text (left join keeps the id).
    """
    if max_count < 1:
        raise ValueError(f"max_count must be >= 1, got {max_count}")
    if segment_tokens is not None:
        if segment_tokens < 1:
            raise ValueError(f"segment_tokens must be >= 1, got {segment_tokens}")
        toks = df.select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
        ).withColumn("_n", F.size("_t"))
        segs = (
            toks.select(
                id_col,
                "_t",
                F.posexplode(
                    F.expr(f"sequence(1, greatest(_n, 1), {segment_tokens})")
                ).alias("_pos", "_start"),
            )
            .select(
                id_col,
                "_pos",
                F.array_join(
                    F.expr(f"slice(_t, _start, {segment_tokens})"), " "
                ).alias("_seg"),
            )
        )
        join_delim = " "
    else:
        # \Q..\E: treat the delimiter literally (split's pattern is regex)
        segs = df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.col(text_col), "\\Q" + delimiter + "\\E", -1)
            ).alias("_pos", "_seg"),
        )
        join_delim = delimiter
    hot = (
        segs.groupBy("_seg")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > max_count)
        .select("_seg")
    )
    kept = segs.join(hot, "_seg", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_seg"))),
                lambda x: x["_seg"],
            ),
            join_delim,
        ).alias("cleaned")
    )
    return df.select(id_col).join(rebuilt, id_col, "left").select(
        id_col, F.coalesce("cleaned", F.lit("")).alias("cleaned")
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 10,
    max_count: int = 1,
) -> DataFrame:
    """Substring-level corpus dedup — the Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better") EXACT-SUBSTRING pass,
    approximated at token granularity with stride-1 windows instead of a
    suffix array: every ``window_tokens``-token window is hashed; windows
    whose exact text occurs more than ``max_count`` times corpus-wide
    mark ALL tokens they cover, and covered tokens are removed from
    every document (surviving tokens reassemble in order).

    Unlike :func:`remove_repeated_segments` (fixed non-overlapping
    segments, so a duplicated passage straddling a segment boundary
    escapes), stride-1 windows catch repeated spans at ANY alignment —
    any duplicated run of ≥ ``window_tokens`` tokens is fully covered.

    Scale shape: the window explode is one row per token (same cost
    class as shingling — d03's inverted index does the identical
    explode); the hot-window set comes from one map-side-combined count
    (hot windows are hot GROUPS, never join fan-out); coverage expands
    window flags to token flags with ONE per-doc sliding-window max over
    positions (no self-join); reassembly is one ordered aggregation.
    Everything partitions by doc id after the corpus-wide count.
    """
    if window_tokens < 1:
        raise ValueError(f"window_tokens must be >= 1, got {window_tokens}")
    if max_count < 1:
        raise ValueError(f"max_count must be >= 1, got {max_count}")
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_i", "_w"),
    )
    k = window_tokens
    # window starting at token i = hash of tokens [i, i+k); tokens within
    # k-1 of the end start no (full) window
    win = W.partitionBy(id_col).orderBy("_i")
    windowed = toks.withColumn(
        "_wtext",
        F.concat_ws(
            " ", F.collect_list("_w").over(win.rowsBetween(0, k - 1))
        ),
    ).withColumn(
        "_is_start",
        F.lead("_w", k - 1).over(win).isNotNull(),
    )
    starts = windowed.withColumn(
        "_h", F.when(F.col("_is_start"), F.xxhash64("_wtext"))
    )
    hot = (
        starts.filter(F.col("_is_start"))
        .groupBy("_h")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > max_count)
        .select("_h")
    )
    # NO broadcast hint: the corpus-wide hot-window set is unbounded
    # (web boilerplate is pervasive) — let the planner pick; AQE
    # broadcasts it only when it measures small
    flagged = starts.join(hot, "_h", "left_semi").select(
        id_col, F.col("_i").alias("_hot_start")
    )
    # token j is covered iff some hot window starts in [j-k+1, j]:
    # sliding max over start flags — one window pass, no range join
    with_flags = (
        toks.join(
            flagged.withColumnRenamed("_hot_start", "_i").withColumn(
                "_hit", F.lit(1)
            ),
            [id_col, "_i"],
            "left",
        )
        .withColumn(
            "_covered",
            F.max(F.coalesce(F.col("_hit"), F.lit(0))).over(
                win.rowsBetween(-(k - 1), 0)
            ),
        )
    )
    # collect_list(struct(pos, token)) + array_sort guarantees order
    # independent of aggregation arrival order
    rebuilt = (
        with_flags.filter(F.col("_covered") == 0)
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "_w"))),
                    lambda s: s["_w"],
                ),
            ).alias("cleaned")
        )
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce("cleaned", F.lit("")).alias("cleaned"))
    )
