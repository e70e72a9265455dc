"""Tests for robots.txt compliance (llmops/robots.py, gate c05)."""

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.robots import parse_robots, robots_filter

ROBOTS = """\
# comment line
User-agent: megabot
Disallow: /private/
Allow: /private/ok/

User-agent: *
Disallow: /tmp/
Disallow: /draft*.html
Allow: /tmp/shared/
Disallow:
"""


def _rules(spark, body, agent="*"):
    df = spark.createDataFrame([("h", body)], "host string, robots_txt string")
    return {(r.rule, r.path_prefix) for r in parse_robots(df, agent=agent).collect()}


def test_parse_star_group_and_empty_rule_ignored(spark):
    got = _rules(spark, ROBOTS)
    assert got == {
        ("disallow", "/tmp/"),
        ("disallow", "/draft*.html"),
        ("allow", "/tmp/shared/"),
    }


def test_parse_specific_agent_beats_star(spark):
    got = _rules(spark, ROBOTS, agent="MegaBot")
    assert got == {("disallow", "/private/"), ("allow", "/private/ok/")}


def test_parse_stacked_user_agents_share_a_group(spark):
    body = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert _rules(spark, body, agent="b") == {("disallow", "/x/")}
    assert _rules(spark, body, agent="a") == {("disallow", "/x/")}
    # an agent in no group gets no rules (everything allowed)
    assert _rules(spark, body, agent="c") == set()


def test_parse_empty_or_null_body(spark):
    df = spark.createDataFrame(
        [("h1", ""), ("h2", None)], "host string, robots_txt string"
    )
    assert parse_robots(df).count() == 0


def _filter(spark, rules_body, urls):
    hosts = spark.createDataFrame([("h", rules_body)], "host string, robots_txt string")
    rules = parse_robots(hosts)
    udf = spark.createDataFrame([("h", p, i) for i, p in enumerate(urls)], "host string, path string, uid bigint")
    got = robots_filter(udf, rules)
    return {r.path: r.robots_allowed for r in got.collect()}


def test_filter_longest_match_precedence(spark):
    got = _filter(
        spark,
        "User-agent: *\nDisallow: /tmp/\nAllow: /tmp/shared/\n",
        ["/tmp/a", "/tmp/shared/b", "/other"],
    )
    assert got == {"/tmp/a": False, "/tmp/shared/b": True, "/other": True}


def test_filter_allow_wins_length_ties(spark):
    got = _filter(
        spark,
        "User-agent: *\nDisallow: /a/\nAllow: /b/\n",
        ["/a/x", "/b/x"],
    )
    assert got == {"/a/x": False, "/b/x": True}
    # exact same prefix both ways: allow wins
    got2 = _filter(
        spark,
        "User-agent: *\nDisallow: /p/\nAllow: /p/\n",
        ["/p/x"],
    )
    assert got2 == {"/p/x": True}


def test_filter_wildcard_and_anchor(spark):
    got = _filter(
        spark,
        "User-agent: *\nDisallow: /draft*.html\nDisallow: /exact$\n",
        ["/draft-v2.html", "/drafts/x", "/exact", "/exact/sub"],
    )
    assert got == {
        "/draft-v2.html": False,
        "/drafts/x": True,
        "/exact": False,
        "/exact/sub": True,
    }


def test_filter_host_without_rules_is_allowed(spark):
    hosts = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /\n")], "host string, robots_txt string"
    )
    rules = parse_robots(hosts)
    urls = spark.createDataFrame(
        [("h1", "/x"), ("h2", "/x")], "host string, path string"
    )
    got = {(r.host, r.path): r.robots_allowed for r in robots_filter(urls, rules).collect()}
    assert got == {("h1", "/x"): False, ("h2", "/x"): True}


def test_filter_preserves_duplicate_url_rows_and_extra_columns(spark):
    hosts = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /x/\n")], "host string, robots_txt string"
    )
    rules = parse_robots(hosts)
    # same (host, path) twice via different referrers + a 'rule' column
    # name that used to collide with the rules side
    urls = spark.createDataFrame(
        [("h", "/x/a", "ref1", "r0"), ("h", "/x/a", "ref2", "r1"), ("h", "/ok", "ref3", "r2")],
        "host string, path string, referrer string, rule string",
    )
    got = robots_filter(urls, rules).collect()
    assert len(got) == 3  # multiplicity preserved
    by_ref = {r.referrer: (r.robots_allowed, r.rule) for r in got}
    assert by_ref == {"ref1": (False, "r0"), "ref2": (False, "r1"), "ref3": (True, "r2")}
    with pytest.raises(ValueError, match="robots_allowed"):
        robots_filter(urls.withColumn("robots_allowed", F.lit(True)), rules)


def test_regex_metachars_in_prefix_are_literal(spark):
    got = _filter(
        spark,
        "User-agent: *\nDisallow: /a(b)/c+d/\n",
        ["/a(b)/c+d/e", "/ab/cd/e"],
    )
    assert got == {"/a(b)/c+d/e": False, "/ab/cd/e": True}


def test_null_host_or_path_defaults_to_allowed(spark):
    """ADVICE r5: the final join is null-safe -- URLs with NULL host or
    path get the documented 'no matching rule means allowed' default,
    never a NULL verdict."""
    hosts = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /x/\n")], "host string, robots_txt string"
    )
    rules = parse_robots(hosts)
    urls = spark.createDataFrame(
        [(None, "/x/a"), ("h", None), (None, None), ("h", "/x/a")],
        "host string, path string",
    )
    got = [(r.host, r.path, r.robots_allowed) for r in robots_filter(urls, rules).collect()]
    assert len(got) == 4
    assert (None, "/x/a", True) in got
    assert ("h", None, True) in got
    assert (None, None, True) in got
    assert ("h", "/x/a", False) in got
    assert all(v is not None for _, _, v in got)
