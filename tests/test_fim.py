"""Fill-in-the-middle transform (llmops/fim.py, gate t25): canonical
hash-derived cut points, PSM reassembly, rate selection, map-only plan."""

import hashlib

import pytest

from gfw_data_api_spark.llmops.fim import fim_transform


def _h60(payload: str, seed: int = 0) -> int:
    return int(
        hashlib.md5(f"{payload}\x1f{seed}".encode()).hexdigest()[:15], 16
    )


def _expected(doc_id: int, text: str, rate: int, seed: int) -> tuple[bool, str]:
    if _h60(f"{doc_id}:fim", seed) % 100 >= rate:
        return False, text
    n = len(text)
    c1 = _h60(f"{doc_id}:1", seed) % (n + 1)
    c2 = _h60(f"{doc_id}:2", seed) % (n + 1)
    lo, hi = min(c1, c2), max(c1, c2)
    return True, f"<PRE>{text[:lo]}<SUF>{text[hi:]}<MID>{text[lo:hi]}"


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "short"),
    (3, ""),
    (4, "naïve café résumé"),  # multibyte: codepoint splits
    (5, "0123456789" * 8),
]


def test_matches_independent_replay(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    got = {r.doc_id: r for r in fim_transform(df, rate_pct=60, seed=7).collect()}
    for doc_id, text in ROWS:
        applied, fim = _expected(doc_id, text, 60, 7)
        assert got[doc_id].fim_applied == applied, doc_id
        assert got[doc_id].fim_text == fim, doc_id


def test_rate_bounds(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    all_rows = fim_transform(df, rate_pct=100).collect()
    assert all(r.fim_applied for r in all_rows)
    assert all(r.fim_text.startswith("<PRE>") for r in all_rows)
    none_rows = fim_transform(df, rate_pct=0).collect()
    assert not any(r.fim_applied for r in none_rows)
    texts = dict(ROWS)
    assert all(r.fim_text == texts[r.doc_id] for r in none_rows)
    with pytest.raises(ValueError, match="rate_pct"):
        fim_transform(df, rate_pct=101)


def test_content_is_a_permutation(spark):
    # the three segments must cover the document exactly once
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    got = {r.doc_id: r for r in fim_transform(df, rate_pct=100, seed=3).collect()}
    for doc_id, text in ROWS:
        body = got[doc_id].fim_text
        assert body.startswith("<PRE>")
        rest = body[len("<PRE>"):]
        prefix, rest = rest.split("<SUF>", 1)
        suffix, middle = rest.split("<MID>", 1)
        assert prefix + middle + suffix == text, doc_id


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    plan = fim_transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
