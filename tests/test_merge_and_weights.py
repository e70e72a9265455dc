"""Tests for merge_upsert, domain mixture stats, DSIR importance, and BPE
pair counting (gate entries e04, t11, w01, b01)."""

import math

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.bpe import char_pair_stats
from gfw_data_api_spark.llmops.importance import (
    hashed_count_features,
    importance_scores,
)
from gfw_data_api_spark.llmops.mixture import domain_mixture_stats
from gfw_data_api_spark.operators.merge import merge_upsert


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_insert_update_carryover(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, n int"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k int, v string, n int"
    )
    out = {r.k: (r.v, r.n) for r in merge_upsert(base, updates, "k").collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_merge_order_by_version_wins(spark):
    base = spark.createDataFrame([(1, "old", 5)], "k int, v string, ver int")
    updates = spark.createDataFrame([(1, "stale", 3)], "k int, v string, ver int")
    # base has the HIGHER version: it must survive a stale update
    out = merge_upsert(base, updates, "k", order_by="ver").collect()
    assert out[0].v == "old"
    # exact version tie → the update wins
    tie = spark.createDataFrame([(1, "fresh", 5)], "k int, v string, ver int")
    out2 = merge_upsert(base, tie, "k", order_by="ver").collect()
    assert out2[0].v == "fresh"


def test_merge_null_order_by_policy(spark):
    """Explicit NULL semantics: an unversioned row loses to any versioned
    row from either source; among all-NULL rows source priority decides."""
    base = spark.createDataFrame([(1, "versioned", 5)], "k int, v string, ver int")
    null_update = spark.createDataFrame(
        [(1, "unversioned", None)], "k int, v string, ver int"
    )
    # NULL-version update loses to a versioned base row
    assert merge_upsert(base, null_update, "k", order_by="ver").collect()[0].v == "versioned"
    # ...and a NULL-version base row loses to a versioned update
    null_base = spark.createDataFrame([(2, "old", None)], "k int, v string, ver int")
    vers_update = spark.createDataFrame([(2, "new", 1)], "k int, v string, ver int")
    assert merge_upsert(null_base, vers_update, "k", order_by="ver").collect()[0].v == "new"
    # all-NULL tie: source priority still applies (update beats base)
    null_vs_null = spark.createDataFrame([(2, "newer", None)], "k int, v string, ver int")
    assert merge_upsert(null_base, null_vs_null, "k", order_by="ver").collect()[0].v == "newer"


def test_merge_composite_keys(spark):
    base = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], "a int, b string, v double")
    updates = spark.createDataFrame([(1, "y", 9.0)], "a int, b string, v double")
    out = {(r.a, r.b): r.v for r in merge_upsert(base, updates, ["a", "b"]).collect()}
    assert out == {(1, "x"): 1.0, (1, "y"): 9.0}


def test_merge_plan_single_shuffle(spark):
    base = spark.range(100).withColumn("v", F.lit("b"))
    updates = spark.range(10).withColumn("v", F.lit("u"))
    plan = merge_upsert(base, updates, "id")._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window partition; no join operator anywhere
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# domain_mixture_stats
# ---------------------------------------------------------------------------


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "one two three four", "web", "en"),
        (2, "five six", "web", "en"),
        (3, "a b c d e f", "code", "en"),
        (4, "x y", "papers", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")


def test_mixture_uniform_weights(corpus):
    out = {r.domain: r for r in domain_mixture_stats(corpus, "source", "text").collect()}
    # token masses: web=6, code=6, papers=2; total=14, 3 domains
    assert out["web"].n_docs == 2 and out["web"].n_tokens == 6
    assert out["code"].n_tokens == 6 and out["papers"].n_tokens == 2
    assert math.isclose(out["web"].token_frac, 6 / 14)
    # uniform target ⇒ weight = (total/nd)/n_tokens
    assert math.isclose(out["papers"].sample_weight, (14 / 3) / 2)
    # expected token mass after weighting is equal per domain
    masses = [out[d].sample_weight * out[d].n_tokens for d in out]
    assert all(math.isclose(m, masses[0]) for m in masses)


def test_mixture_explicit_target(corpus):
    out = {
        r.domain: r
        for r in domain_mixture_stats(
            corpus, "source", "text", target={"web": 0.9, "code": 0.1}
        ).collect()
    }
    assert math.isclose(out["web"].sample_weight, (14 * 0.9) / 6)
    assert math.isclose(out["code"].sample_weight, (14 * 0.1) / 6)
    # unlisted domain → zero weight (dropped from the target mixture)
    assert out["papers"].sample_weight == 0.0


# ---------------------------------------------------------------------------
# DSIR importance
# ---------------------------------------------------------------------------


def test_hashed_count_features_self_target_ratio_one(corpus):
    # target == whole corpus ⇒ sum_target == sum_raw ⇒ ratio exactly 1
    out = hashed_count_features(corpus, F.lit(True), num_buckets=64).collect()
    assert len(out) == 4
    for r in out:
        assert r.sum_target == r.sum_raw
        assert r.target_ratio == 1.0


def test_hashed_count_features_subset_monotone(corpus):
    out = {
        r.doc_id: r
        for r in hashed_count_features(
            corpus, F.col("lang") == "en", num_buckets=64
        ).collect()
    }
    for r in out.values():
        assert 0 <= r.sum_target <= r.sum_raw
        assert 0 < r.target_ratio <= 1.0
    # the German doc shares no tokens with the target set: its buckets get
    # target mass only via hash collisions, so its ratio is the smallest
    assert out[4].target_ratio == min(r.target_ratio for r in out.values())


def test_importance_scores_golden(spark):
    # hand-checkable: 2 docs, bucket space large enough that the 3 distinct
    # tokens land in distinct buckets (verified by the distinct count below)
    df = spark.createDataFrame(
        [(1, "aa aa", "tgt"), (2, "bb cc", "raw")], "doc_id long, text string, kind string"
    )
    B, alpha = 4096, 1.0
    out = {
        r.doc_id: r
        for r in importance_scores(
            df, F.col("kind") == "tgt", num_buckets=B, alpha=alpha
        ).collect()
    }
    # distributions: raw totals 4 tokens (aa:2, bb:1, cc:1); target: aa:2
    def lr(tc, rc, tt=2, rt=4):
        return math.log((tc + alpha) / (tt + alpha * B)) - math.log(
            (rc + alpha) / (rt + alpha * B)
        )

    assert math.isclose(out[1].log_importance, 2 * lr(2, 2), rel_tol=1e-12)
    assert math.isclose(out[2].log_importance, lr(0, 1) + lr(0, 1), rel_tol=1e-12)
    # in-domain doc scores higher than out-of-domain
    assert out[1].log_importance > out[2].log_importance


# ---------------------------------------------------------------------------
# BPE pair stats
# ---------------------------------------------------------------------------


def test_char_pairs_counts(spark):
    df = spark.createDataFrame([("abab",), ("z",), ("",)], "text string")
    out = {r.pair: r.cnt for r in char_pair_stats(df, "text").collect()}
    # "abab" → ab, ba, ab; single-char and empty docs contribute nothing
    assert out == {"ab": 2, "ba": 1}


def test_char_pairs_topk_tiebreak(spark):
    df = spark.createDataFrame([("aa",), ("bb",), ("cc",)], "text string")
    out = char_pair_stats(df, "text", top_k=2).collect()
    # all counts tie at 1 → lexicographic pair order decides
    assert [(r.pair, r.cnt) for r in out] == [("aa", 1), ("bb", 1)]


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------


def test_scd2_collapses_runs(spark):
    from gfw_data_api_spark.operators.scd import scd2_history

    rows = [
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
        (2, 15, "X"),
    ]
    df = spark.createDataFrame(rows, "k int, t int, v string")
    out = sorted(
        scd2_history(df, "k", "v", ts_col="t").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    got = [(r.k, r.v, r.valid_from, r.valid_to, r.n_events) for r in out]
    assert got == [
        (1, "A", 10, 30, 2),   # run of two A's
        (1, "B", 30, 40, 1),
        (1, "A", 40, None, 1),  # A returns → NEW interval, open-ended
        (2, "X", 15, None, 1),
    ]


def test_scd2_tiebreak_total_order(spark):
    from gfw_data_api_spark.operators.scd import scd2_history

    # two changes at the same timestamp: the tiebreak column decides
    rows = [(1, 10, 100, "A"), (1, 10, 101, "B"), (1, 20, 102, "B")]
    df = spark.createDataFrame(rows, "k int, t int, eid int, v string")
    out = sorted(
        scd2_history(df, "k", "v", ts_col="t", tiebreak_col="eid").collect(),
        key=lambda r: r.valid_from is None,
    )
    assert [(r.v, r.n_events) for r in out] == [("A", 1), ("B", 2)]


def test_scd2_feeds_asof_join(spark):
    """The intervals answer 'state at time T' via the as-of join."""
    from gfw_data_api_spark.operators.scd import scd2_history
    from gfw_data_api_spark.operators.timeseries import asof_join

    events = spark.createDataFrame(
        [(1, 10, "bronze"), (1, 30, "silver"), (1, 50, "gold")],
        "k int, t int, tier string",
    )
    hist = scd2_history(events, "k", "tier", ts_col="t").select(
        "k", F.col("valid_from").alias("t"), "tier"
    )
    probes = spark.createDataFrame([(1, 25), (1, 55)], "k int, t int")
    joined = asof_join(probes, hist, on="t", by=["k"], values=["tier"])
    got = {r.t: r.tier for r in joined.collect()}
    assert got == {25: "bronze", 55: "gold"}


# ---------------------------------------------------------------------------
# BPE trainer + apply
# ---------------------------------------------------------------------------


def test_bpe_trainer_golden(spark):
    from gfw_data_api_spark.llmops.bpe import apply_bpe, train_bpe_merges

    # "ab" dominates → first merge; then "abc" from ("ab","c")
    df = spark.createDataFrame(
        [("abc abc abc",), ("abd abd",), ("xy",)], "text string"
    )
    merges = train_bpe_merges(df, num_merges=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "c")
    # sample is content-hash-ordered → identical merges on any layout
    assert train_bpe_merges(df.repartition(5), num_merges=2) == merges
    toks = {
        r.text: r.bpe_tokens
        for r in apply_bpe(df, merges).collect()
    }
    assert toks["abc abc abc"] == ["abc", "abc", "abc"]
    assert toks["abd abd"] == ["ab", "d", "ab", "d"]
    assert toks["xy"] == ["x", "y"]  # no applicable merges


def test_bpe_more_merges_fewer_tokens(spark, sf_dir):
    from gfw_data_api_spark.llmops.bpe import apply_bpe, train_bpe_merges
    from gfw_data_api_spark.sources.tabular import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100).cache()
    m_few = train_bpe_merges(docs, num_merges=5)
    m_many = train_bpe_merges(docs, num_merges=60)
    assert m_many[:5] == m_few  # merge lists are prefix-stable
    n_few = (
        apply_bpe(docs, m_few)
        .select(F.sum(F.size("bpe_tokens")).alias("n"))
        .first()
        .n
    )
    n_many = (
        apply_bpe(docs, m_many)
        .select(F.sum(F.size("bpe_tokens")).alias("n"))
        .first()
        .n
    )
    assert n_many < n_few  # more merges compress further


def test_bpe_deterministic(spark, sf_dir):
    from gfw_data_api_spark.llmops.bpe import train_bpe_merges
    from gfw_data_api_spark.sources.tabular import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    assert train_bpe_merges(docs, num_merges=20) == train_bpe_merges(
        docs, num_merges=20
    )


def test_scd2_null_value_runs_collapse(spark):
    from gfw_data_api_spark.operators.scd import scd2_history

    rows = [(1, 10, None), (1, 20, None), (1, 30, "A")]
    df = spark.createDataFrame(rows, "k int, t int, v string")
    out = sorted(scd2_history(df, "k", "v", ts_col="t").collect(), key=lambda r: r.valid_from)
    assert [(r.v, r.valid_from, r.valid_to, r.n_events) for r in out] == [
        (None, 10, 30, 2),  # one collapsed NULL run, properly closed
        ("A", 30, None, 1),
    ]


def test_scd2_tied_timestamp_interval_order(spark):
    from gfw_data_api_spark.operators.scd import scd2_history

    # A then B at the SAME ts: A's interval must close at 10, B stays open
    rows = [(1, 10, 100, "A"), (1, 10, 101, "B"), (1, 20, 102, "B")]
    df = spark.createDataFrame(rows, "k int, t int, eid int, v string")
    out = {r.v: r for r in scd2_history(df, "k", "v", ts_col="t", tiebreak_col="eid").collect()}
    assert out["A"].valid_from == 10 and out["A"].valid_to == 10
    assert out["B"].valid_from == 10 and out["B"].valid_to is None
    assert out["B"].n_events == 2


def test_evolve_smallint_widening_allowed(spark, tmp_path):
    from gfw_data_api_spark.sources.tabular import append_with_evolution

    path = str(tmp_path / "tbl_small")
    spark.createDataFrame([(1, 5)], "id int, v smallint").write.parquet(path)
    out = append_with_evolution(
        spark, path, spark.createDataFrame([(2, 70000)], "id int, v int")
    )
    assert dict(out.dtypes)["v"] == "int"
    assert {r.v for r in out.collect()} == {5, 70000}


def test_importance_empty_target_not_null(spark):
    from gfw_data_api_spark.llmops.importance import importance_scores

    df = spark.createDataFrame(
        [(1, "aa bb", "x")], "doc_id long, text string, lang string"
    )
    out = importance_scores(df, F.col("lang") == "nope", num_buckets=64).collect()
    assert len(out) == 1
    assert out[0].log_importance is not None  # prior, not NULL poison
