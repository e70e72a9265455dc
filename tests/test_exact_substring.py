"""Cross-doc exact-substring dedup (llmops/dedup.py
exact_substring_dedup, gate d16): sliding-window keep-first semantics,
hand-computed fixtures."""

from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.dedup import exact_substring_dedup


def _run(spark, rows, window):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r.doc_id: r
        for r in exact_substring_dedup(df, window=window).collect()
    }


def test_shared_run_removed_from_non_keeper_only(spark):
    shared = "a b c d"  # 4 tokens, window 3 → 2 inside windows
    got = _run(
        spark,
        [(1, f"x1 y1 {shared} z1"), (2, f"x2 {shared} z2 w2")],
        window=3,
    )
    # doc 1 is the global first occurrence of every shared window → intact
    assert got[1].text_dedup == "x1 y1 a b c d z1"
    assert got[1].n_tokens_before == 7 and got[1].n_tokens_after == 7
    # doc 2 loses exactly the shared run; its unique neighbors survive
    assert got[2].text_dedup == "x2 z2 w2"
    assert got[2].n_tokens_before == 7 and got[2].n_tokens_after == 3


def test_straddling_windows_do_not_overcut(spark):
    # the windows straddling the run boundary mix unique tokens, so
    # they are not duplicated and must not expand the cut
    got = _run(
        spark,
        [(1, "u1 p q r v1"), (2, "u2 p q r v2")],
        window=3,
    )
    assert got[1].text_dedup == "u1 p q r v1"
    assert got[2].text_dedup == "u2 v2"


def test_within_doc_repeat_keeps_first(spark):
    got = _run(spark, [(5, "a b c k a b c")], window=3)
    assert got[5].text_dedup == "a b c k"
    assert got[5].n_tokens_after == 4


def test_short_docs_pass_through(spark):
    got = _run(spark, [(1, "a b"), (2, "a b")], window=3)
    assert got[1].text_dedup == "a b" and got[2].text_dedup == "a b"


def test_fully_duplicated_doc_survives_as_empty_row(spark):
    got = _run(spark, [(1, "a b c"), (2, "a b c")], window=3)
    assert got[1].text_dedup == "a b c"
    assert got[2].text_dedup == "" and got[2].n_tokens_after == 0
    assert got[2].n_tokens_before == 3


def test_plan_has_no_python_stages(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    plan = exact_substring_dedup(df, window=3)._jdf.queryExecution().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
