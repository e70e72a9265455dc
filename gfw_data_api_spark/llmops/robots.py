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


def _prefix_matches(path: Column, prefix: Column) -> Column:
    """RFC 9309 path matching: literal prefix, '*' any-run, '$' end anchor.

    Implemented by regex-quoting the literal spans (native ``rlike`` on a
    per-row built pattern is not available pre-Spark-3.2 style — here we
    build the pattern as a COLUMN and use rlike's column form)."""
    quoted = F.regexp_replace(prefix, r"([.\\+?\[\]^$(){}|])", r"\\$1")
    # after quoting, '$' became '\$' — restore a TRAILING anchor only
    pat = F.regexp_replace(quoted, r"\*", ".*")
    pat = F.when(
        pat.endswith("\\$"), F.concat(F.substring(pat, 0, F.length(pat) - 2), F.lit("$"))
    ).otherwise(pat)
    return F.rlike(path, F.concat(F.lit("^"), pat))


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Append ``robots_allowed`` to ``urls`` by RFC 9309 precedence.

    The longest matching rule's ``path_prefix`` decides; ``allow`` wins
    ties; URLs whose host has no matching rule are allowed.
    """
    matches = (
        urls.join(rules, urls[host_col] == rules["host"], "left")
        .withColumn(
            "_hit",
            F.col("path_prefix").isNotNull()
            & _prefix_matches(F.col(path_col), F.col("path_prefix")),
        )
        .withColumn(
            # ties: allow > disallow, encoded in the max_by key as
            # (match_len, is_allow); non-matches sort below everything
            "_key",
            F.when(
                F.col("_hit"),
                F.struct(
                    F.length("path_prefix").alias("l"),
                    (F.col("rule") == "allow").cast("int").alias("a"),
                ),
            ),
        )
    )
    urls_cols = urls.columns
    return (
        matches.groupBy(*[urls[c].alias(c) for c in urls_cols])
        .agg(F.max_by("rule", "_key").alias("_winner"))
        .withColumn(
            "robots_allowed",
            F.coalesce(F.col("_winner") != "disallow", F.lit(True)),
        )
        .drop("_winner")
    )
