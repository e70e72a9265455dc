"""robots.txt compliance for crawl-derived corpora.

Responsible web-corpus pipelines re-check robots rules before keeping a
page (the Common Crawl terms + every serious curation recipe): parse
each host's robots.txt, select the rule group that applies to your
user-agent, and apply longest-match path precedence. This module does
both halves as DataFrame operators:

- :func:`parse_robots` — one robots.txt body per host → exploded
  ``(host, rule, path_prefix)`` rows for the chosen agent. Group
  semantics per the public REP spec (RFC 9309): consecutive
  ``User-agent`` lines stack onto the group that follows; the most
  specific matching agent token wins (exact product token beats ``*``);
  ``Allow``/``Disallow`` with an empty path are no-ops; comments and
  unknown directives are ignored. Parsing is a per-row linear scan in
  an Arrow-batched UDF (robots bodies are small — the spec caps
  meaningful size at 500 KiB) that then EXPLODES to relational rows, so
  everything downstream is a plain join.
- :func:`robots_filter` — join URLs to their host's rules and apply
  RFC 9309 precedence: the longest matching ``path_prefix`` decides;
  ``allow`` wins length ties; no matching rule (or no rules for the
  host at all) means allowed.

Scale shape: rules are one row per (host, rule) — a corpus-scale join
keyed by host with the usual skew answer (AQE; hot hosts are exactly
the hosts with many URLs, and the rule side per host is tiny). The
winner-per-URL step is a ``max_by`` aggregation over the joined
matches — combine-friendly, no window over the URL key.

``$`` and ``*`` wildcards inside paths (a Google extension, also in
RFC 9309) are supported by translating the prefix to a match length:
``*`` matches any run, ``$`` anchors the end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_RULES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("rule", T.StringType()),
            T.StructField("path_prefix", T.StringType()),
        ]
    )
)


def _parse_body(body: str, agent: str) -> list[tuple[str, str]]:
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_group_rules = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, sep, value = line.partition(":")
        if not sep:
            continue
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if in_group_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_rules = False
            cur_agents.append(value.lower())
        elif name in ("allow", "disallow"):
            in_group_rules = True
            if value:
                cur_rules.append((name, value))
        # unknown directives (crawl-delay, sitemap, ...) are ignored but
        # still close the agent-stacking run per RFC 9309
        elif cur_agents and not in_group_rules:
            in_group_rules = True
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))
    # most specific agent token wins: exact match beats '*'
    exact = [r for agents, r in groups if agent in agents]
    if exact:
        return [rule for rules in exact for rule in rules]
    starred = [r for agents, r in groups if "*" in agents]
    return [rule for rules in starred for rule in rules]


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Explode robots.txt bodies into ``(host, rule, path_prefix)`` rows
    for the group matching ``agent`` (see module docstring)."""

    @pandas_udf(_RULES_TYPE)
    def _rules(bodies: pd.Series) -> pd.Series:
        return bodies.map(lambda b: _parse_body(b, agent))

    return (
        df.select(F.col(host_col).alias("host"), _rules(F.col(body_col)).alias("_r"))
        .select("host", F.explode("_r").alias("_e"))
        .select("host", F.col("_e.rule").alias("rule"), F.col("_e.path_prefix").alias("path_prefix"))
    )


def _prefix_pattern(prefix: Column) -> Column:
    """Anchored regex pattern for an RFC 9309 path prefix: literal spans
    regex-quoted, '*' -> any-run, a TRAILING '$' -> end anchor (mid-string
    '$' stays literal). Built as a COLUMN so it is projected onto the tiny
    rules side ONCE PER RULE before the join -- only the rlike itself runs
    per (url x rule) candidate row."""
    quoted = F.regexp_replace(prefix, r"([.\\+?\[\]^$(){}|])", r"\\$1")
    pat = F.regexp_replace(quoted, r"\*", ".*")
    pat = F.when(
        pat.endswith("\\$"), F.concat(F.substring(pat, 0, F.length(pat) - 2), F.lit("$"))
    ).otherwise(pat)
    return F.concat(F.lit("^"), pat)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Append ``robots_allowed`` to ``urls`` by RFC 9309 precedence.

    The longest matching rule's ``path_prefix`` decides; ``allow`` wins
    ties; URLs whose host has no matching rule are allowed.

    The verdict is a function of ``(host, path)`` alone, so it is
    computed once per DISTINCT pair and joined back -- duplicate URL rows
    (the same page discovered via several referrers) keep their
    multiplicity and every other ``urls`` column passes through
    untouched. The per-rule regex pattern is projected onto the rules
    side BEFORE the join, so the join evaluates one ``rlike`` per
    candidate row and nothing else.
    """
    if "robots_allowed" in urls.columns:
        raise ValueError("urls already has a robots_allowed column")
    r = rules.select(
        F.col("host").alias("_rb_host"),
        F.col("rule").alias("_rb_rule"),
        F.length("path_prefix").alias("_rb_len"),
        _prefix_pattern(F.col("path_prefix")).alias("_rb_pat"),
    )
    pairs = urls.select(
        F.col(host_col).alias("_rb_h"), F.col(path_col).alias("_rb_p")
    ).distinct()
    matches = (
        pairs.join(r, pairs["_rb_h"] == r["_rb_host"], "left")
        .withColumn(
            "_rb_hit",
            F.col("_rb_pat").isNotNull() & F.rlike(F.col("_rb_p"), F.col("_rb_pat")),
        )
        .withColumn(
            # ties: allow > disallow, encoded in the max_by key as
            # (match_len, is_allow); non-matches get a NULL key, which
            # max_by ignores
            "_rb_key",
            F.when(
                F.col("_rb_hit"),
                F.struct(
                    F.col("_rb_len").alias("l"),
                    (F.col("_rb_rule") == "allow").cast("int").alias("a"),
                ),
            ),
        )
    )
    verdicts = (
        matches.groupBy("_rb_h", "_rb_p")
        .agg(F.max_by("_rb_rule", "_rb_key").alias("_rb_winner"))
        .select(
            "_rb_h",
            "_rb_p",
            F.coalesce(F.col("_rb_winner") != "disallow", F.lit(True)).alias(
                "robots_allowed"
            ),
        )
    )
    # null-safe keys: verdicts is built from urls' own DISTINCT
    # (host, path) pairs — groupBy keeps NULL keys as a group, so a
    # null-unsafe == here would orphan NULL-host/path URLs with a NULL
    # verdict instead of the documented "no matching rule means
    # allowed" default
    joined = urls.join(
        verdicts,
        urls[host_col].eqNullSafe(verdicts["_rb_h"])
        & urls[path_col].eqNullSafe(verdicts["_rb_p"]),
        "left",
    )
    return joined.select(*[urls[c] for c in urls.columns], "robots_allowed")
