"""Property tests for the WARC framing and robots.txt grammar — the
same hypothesis strategy the repo applies to the SQL guard and codecs:
adversarial payloads must roundtrip exactly or fail loudly, never
silently corrupt."""

from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_data_api_spark.llmops.robots import _parse_body
from gfw_data_api_spark.sources.warc import build_warc_bytes, iter_warc_records

# payloads deliberately include CRLF runs, WARC/ magic, and header-like
# bytes — Content-Length framing must make the parser immune to all of it
_payloads = st.binary(max_size=400) | st.sampled_from(
    [
        b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n",
        b"HTTP/1.1 200 OK\r\n\r\nbody",
        b"WARC-Type: response\r\n",
        b"\r\n" * 10,
    ]
)

_records = st.lists(
    st.fixed_dictionaries(
        {
            "warc_type": st.sampled_from(["response", "request", "metadata", "warcinfo"]),
            "payload": _payloads,
            "target_uri": st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=40
            ),
        }
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=120, deadline=None)
@given(records=_records, gz=st.booleans())
def test_warc_roundtrip_is_exact_under_hostile_payloads(records, gz):
    data = build_warc_bytes(records, gzip_per_record=gz)
    parsed = list(iter_warc_records(data))
    assert len(parsed) == len(records)
    for rec, (headers, body) in zip(records, parsed):
        assert headers["warc-type"] == rec["warc_type"]
        assert body == rec["payload"]
        assert int(headers["content-length"]) == len(rec["payload"])
        if rec["target_uri"]:
            assert headers["warc-target-uri"] == rec["target_uri"]


@settings(max_examples=150, deadline=None)
@given(body=st.text(max_size=600))
def test_robots_parser_never_crashes_and_yields_valid_rules(body):
    rules = _parse_body(body, "anybot")
    for rule, prefix in rules:
        assert rule in ("allow", "disallow")
        assert prefix != ""


_directive_lines = st.lists(
    st.one_of(
        st.builds(lambda a: f"User-agent: {a}", st.sampled_from(["*", "megabot", "x"])),
        st.builds(lambda p: f"Disallow: /{p}", st.text("abc/", max_size=6)),
        st.builds(lambda p: f"Allow: /{p}", st.text("abc/", max_size=6)),
        st.just("Crawl-delay: 5"),
        st.just("# comment"),
        st.just(""),
    ),
    max_size=20,
)


@settings(max_examples=150, deadline=None)
@given(lines=_directive_lines)
def test_robots_specific_agent_rules_superset_property(lines):
    """An agent named in NO group falls back to '*' — so its rules must
    equal the star rules exactly; and every returned prefix must appear
    verbatim in the body."""
    body = "\n".join(lines)
    star = _parse_body(body, "*")
    unknown = _parse_body(body, "nobody-ever-names-this-bot")
    assert unknown == star
    for _, prefix in _parse_body(body, "megabot"):
        assert prefix in body
