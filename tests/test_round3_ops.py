"""Round-3 operator additions: stream-stream interval join, Gopher rule
filter, containment pairs, temperature mixture, semantic dedup."""

import datetime

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.sources.tabular import load_table


# ---------------------------------------------------------------------------
# stream-stream interval join
# ---------------------------------------------------------------------------


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def click_purchase(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(40), 101), (2, _ts(5), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    purchases = spark.createDataFrame(
        [
            (1, _ts(10), 200),   # joins click 100 (within 30m) only
            (1, _ts(45), 201),   # joins click 101; 45m after click 100 → out
            (2, _ts(4), 202),    # BEFORE click 102 → no join (lower bound)
            (3, _ts(7), 203),    # no matching user
        ],
        "user_id long, ts timestamp, event_id long",
    )
    return clicks, purchases


def test_interval_join_semantics(spark, click_purchase):
    from gfw_data_api_spark.streaming.join import stream_stream_interval_join

    clicks, purchases = click_purchase
    out = stream_stream_interval_join(clicks, purchases, keys="user_id", upper="30 minutes")
    pairs = {(r.event_id, r.right_event_id) for r in out.collect()}
    assert pairs == {(100, 200), (101, 201)}


def test_interval_join_streaming_equals_batch(spark, tmp_path, sf_dir):
    from gfw_data_api_spark.streaming.join import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "purchases")
    views.write.parquet(vsrc)
    purchases.write.parquet(psrc)
    vstream = spark.readStream.schema(views.schema).parquet(vsrc)
    pstream = spark.readStream.schema(purchases.schema).parquet(psrc)
    out = stream_stream_interval_join(vstream, pstream, keys="user_id", upper="30 minutes")
    assert out.isStreaming
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(sink).select("event_id", "right_event_id")
    batch = stream_stream_interval_join(
        views, purchases, keys="user_id", upper="30 minutes"
    ).select("event_id", "right_event_id")
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0


# ---------------------------------------------------------------------------
# Gopher rule battery
# ---------------------------------------------------------------------------


def test_gopher_rules_verdicts(spark):
    from gfw_data_api_spark.llmops.text import gopher_quality_rules

    good = "the quick brown fox jumps with energy and that is fine to be of note " * 5
    too_short = "the end"
    symbol_soup = ("# " * 40) + "the of and be to that have with words here"
    long_words = ("pneumonoultramicroscopic " * 60) + "the of and"
    docs = spark.createDataFrame(
        [(1, good), (2, too_short), (3, symbol_soup), (4, long_words)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_rules(docs, min_words=30).collect()}
    assert out[1].keep
    assert not out[2].keep          # below word-count floor
    assert not out[3].keep          # symbol/word ratio blown
    assert out[3].symbol_word_ratio > 0.1
    assert not out[4].keep          # mean word length above ceiling
    assert out[4].mean_word_chars > 10
    assert out[1].stopword_hits >= 2


def test_gopher_rules_bullets_and_ellipsis(spark):
    from gfw_data_api_spark.llmops.text import gopher_quality_rules

    filler = "the of and that have with be to " * 8
    bullets = "\n".join(["- item one of the list"] * 9 + [filler])
    ellipsis = "\n".join(["so it goes on and on..."] * 5 + [filler] * 5)
    docs = spark.createDataFrame(
        [(1, bullets), (2, ellipsis)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_quality_rules(docs, min_words=10).collect()}
    assert out[1].bullet_line_fraction == 0.9
    assert not out[1].keep is None
    assert out[2].ellipsis_line_fraction == 0.5
    assert not out[2].keep          # above the 0.3 ellipsis-line cap


# ---------------------------------------------------------------------------
# containment pairs
# ---------------------------------------------------------------------------


def test_containment_catches_quotes_jaccard_misses(spark):
    from gfw_data_api_spark.llmops.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "to be or not to be that is the question"
    article = (
        "in the famous soliloquy the prince says "
        + quote
        + " and the audience reflects on mortality and the play proceeds "
        + "with many other lines entirely of its own invention number "
        + " ".join(f"line{i} of filler text keeps going" for i in range(30))
    )
    docs = spark.createDataFrame(
        [(1, article), (2, quote)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(docs, shingle_n=3, threshold=0.8).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.containment == 1.0          # every quote shingle is in the article
    assert row.containment_b == 1.0
    assert row.containment_a < 0.2         # article is mostly its own text
    # jaccard at the same strictness finds nothing
    assert ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.8).count() == 0


# ---------------------------------------------------------------------------
# temperature mixture
# ---------------------------------------------------------------------------


def test_temperature_mixture_limits(spark):
    from gfw_data_api_spark.llmops.mixture import temperature_mixture_weights

    docs = spark.createDataFrame(
        [("big", "w " * 900), ("small", "w " * 90), ("tiny", "w " * 10)],
        "source string, text string",
    )
    # alpha=1 keeps raw shares; alpha=0 is uniform
    raw = {r.domain: r for r in temperature_mixture_weights(docs, alpha=1.0).collect()}
    assert abs(raw["big"].temp_frac - raw["big"].token_frac) < 1e-12
    assert abs(raw["big"].sample_weight - 1.0) < 1e-12
    uni = {r.domain: r for r in temperature_mixture_weights(docs, alpha=0.0).collect()}
    assert abs(uni["tiny"].temp_frac - 1 / 3) < 1e-12
    # 0<alpha<1 flattens: small domains upsampled, big downsampled
    mid = {r.domain: r for r in temperature_mixture_weights(docs, alpha=0.3).collect()}
    assert mid["tiny"].sample_weight > 1.0 > mid["big"].sample_weight
    assert abs(sum(r.temp_frac for r in mid.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted_dups(spark):
    import numpy as np

    from gfw_data_api_spark.llmops.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
    # plant near-dups of vectors 3 and 7 (tiny perturbation → cosine ≈ 1)
    for j, src in ((100, 3), (101, 7)):
        v = base[src] + rng.normal(scale=1e-4, size=8)
        rows.append((j, [float(x) for x in v], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = semantic_dedup(df, threshold=0.99, nlist=4)
    ids = {r.vec_id for r in out.collect()}
    # the planted copies (higher ids) are dropped, originals survive
    assert 100 not in ids and 101 not in ids
    assert 3 in ids and 7 in ids
    assert len(ids) == 40


def test_semantic_dedup_single_cluster_equals_exact(spark, sf_dir):
    """nlist=1 removes the clustering recall loss: survivors must equal
    the exact all-pairs keep-lowest-id policy."""
    from gfw_data_api_spark.llmops.similarity import (
        blocked_cosine_pairs,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200).cache()
    thr = 0.4
    approx = {r.vec_id for r in semantic_dedup(emb, threshold=thr, nlist=1).collect()}
    exact_pairs = blocked_cosine_pairs(
        emb.withColumn("_one", F.lit(1)),
        block_col="_one",
        threshold=thr,
        max_block_size=None,
        guard="plan",
    )
    dropped = {r.id_b for r in exact_pairs.select("id_b").distinct().collect()}
    exact = {r.vec_id for r in emb.select("vec_id").collect()} - dropped
    assert approx == exact
    emb.unpersist()


def test_semantic_dedup_recall_on_planted_dups(spark, sf_dir):
    """Clustering loses only CROSS-cluster pairs, and true near-dups
    (cosine → 1) land in the same cell by construction — so recall on
    planted duplicates must be perfect even with real clustering, while
    weakly-similar pairs (the cosine≈0.35 tail) are allowed to escape.
    No false positives either way: every drop must be a planted copy."""
    import numpy as np

    from gfw_data_api_spark.llmops.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.limit(200).collect()
    rng = np.random.default_rng(11)
    planted = []
    originals = rng.choice(len(base), size=20, replace=False)
    for j, idx in enumerate(originals):
        row = base[idx]
        v = np.asarray(row.embedding, dtype=np.float64)
        v = v + rng.normal(scale=1e-4, size=v.shape)
        planted.append((1_000_000 + j, [float(x) for x in v], int(row.label)))
    dup_df = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>, label int"
    )
    full = emb.unionByName(dup_df).cache()
    survivors = {
        r.vec_id for r in semantic_dedup(full, threshold=0.99, nlist=8).collect()
    }
    planted_ids = {p[0] for p in planted}
    all_ids = {r.vec_id for r in full.select("vec_id").collect()}
    dropped = all_ids - survivors
    assert dropped == planted_ids  # perfect recall, zero false positives
    full.unpersist()


# ---------------------------------------------------------------------------
# skew hybrid join
# ---------------------------------------------------------------------------


def test_skew_hybrid_join_equals_plain_join(spark, sf_dir):
    from gfw_data_api_spark.operators.skew import skew_hybrid_join

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    hybrid = skew_hybrid_join(li, supp, keys="l_suppkey", hot_keys=[1, 2, 3])
    plain = li.join(supp, on="l_suppkey")
    assert hybrid.count() == plain.count()
    assert hybrid.exceptAll(plain).count() == 0
    # hot branch is a broadcast join; the plan carries BOTH join strategies
    plan = hybrid._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_skew_hybrid_join_left_and_autodetect(spark):
    from gfw_data_api_spark.operators.skew import skew_hybrid_join

    facts = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold1", 1), ("cold2", 2), ("nomatch", 3)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold2", "C2")], "k string, name string"
    )
    # auto-detect: 'hot' exceeds the threshold, others don't
    out = skew_hybrid_join(facts, dim, keys="k", hot_key_threshold=10, how="left")
    plain = facts.join(dim, on="k", how="left")
    assert out.count() == plain.count() == 53
    assert out.exceptAll(plain).count() == 0
    # unmatched left rows survive with nulls
    assert out.filter("k = 'nomatch'").collect()[0].name is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        skew_hybrid_join(facts, dim, keys="k", how="full")


def test_runtime_bloom_filter_injects_at_scale_thresholds(spark, sf_dir):
    """Spark's runtime bloom-filter join reduction (enabled in session.py
    via the 3.4+ default) stays off for toy scans (application side must
    exceed 10 GB) and injects once the thresholds reflect 100 TB reality
    — asserting the engine-native path we rely on instead of a
    hand-rolled bloom."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter("o_totalprice > 400000")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert "bloom" not in j._jdf.queryExecution().optimizedPlan().toString().lower()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        j2 = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert "bloom" in j2._jdf.queryExecution().optimizedPlan().toString().lower()
        assert j2.count() == j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


# ---------------------------------------------------------------------------
# blocked fuzzy match
# ---------------------------------------------------------------------------


def test_blocked_fuzzy_match_semantics(spark):
    from gfw_data_api_spark.operators.linkage import blocked_fuzzy_match

    df = spark.createDataFrame(
        [
            (1, "Acme Corp"),
            (2, "Acme Corp."),      # distance 1 after raw compare, same block
            (3, "Acme Group"),      # same block, distance 5 → filtered
            (4, "Zenith Ltd"),      # different block
            (5, "acme corp"),       # case differs → block matches, distance 2 raw
        ],
        "id long, name string",
    )
    out = blocked_fuzzy_match(df, "id", "name", max_distance=2)
    pairs = {(r.id_a, r.id_b): r.distance for r in out.collect()}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 5)] == 2      # 'A'→'a', 'C'→'c'
    assert (1, 3) not in pairs
    assert all(4 not in p for p in pairs)


def test_blocked_fuzzy_match_block_guard(spark):
    from gfw_data_api_spark.operators.linkage import blocked_fuzzy_match

    df = spark.createDataFrame(
        [(i, f"same{i % 2}") for i in range(40)], "id long, name string"
    )
    guarded = blocked_fuzzy_match(df, "id", "name", max_block_size=5)
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_block_size"):
        guarded.count()
    # within bounds it runs
    assert blocked_fuzzy_match(df, "id", "name", max_block_size=50).count() > 0


# ---------------------------------------------------------------------------
# data-quality audit
# ---------------------------------------------------------------------------


def test_audit_counts_each_violation_kind(spark):
    from gfw_data_api_spark.operators.quality import (
        audit,
        check_accepted_values,
        check_not_null,
        check_predicate,
        check_range,
    )

    child = spark.createDataFrame(
        [
            (1, 10, "ok", 100),
            (2, -5, "ok", 100),      # range violation
            (None, 10, "ok", 200),   # null id; FK skips nulls
            (4, 10, "BAD", 999),     # accepted_values + FK orphan
            (4, 10, "ok", 100),      # duplicate id=4
        ],
        "id long, qty int, status string, parent_id long",
    )
    parent = spark.createDataFrame([(100,), (200,)], "pid long")
    out = {
        r.check: (r.violations, r.passed)
        for r in audit(
            child,
            checks=[
                check_not_null("id"),
                check_range("qty", 0, 50),
                check_accepted_values("status", ["ok", "meh"]),
                check_predicate("qty_even", F.col("qty") % 2 != 0),
            ],
            unique_keys=[["id"]],
            foreign_keys=[(["parent_id"], parent, ["pid"])],
        ).collect()
    }
    assert out["not_null(id)"] == (1, 0)
    assert out["range(qty)"] == (1, 0)
    assert out["accepted_values(status)"] == (1, 0)
    assert out["qty_even"] == (1, 0)           # only -5 is odd
    assert out["unique(id)"] == (1, 0)         # one extra row for id=4
    assert out["foreign_key(parent_id)"] == (1, 0)  # 999 orphaned; NULL skipped
    # clean table passes everything
    clean = audit(parent.withColumnRenamed("pid", "id"), checks=[check_not_null("id")])
    assert all(r.passed == 1 for r in clean.collect())


def test_audit_row_checks_single_pass(spark, sf_dir):
    """All row-level checks must compile into ONE aggregate over one
    scan — a 40-check battery cannot become 40 jobs."""
    from gfw_data_api_spark.operators.quality import audit, check_not_null, check_range

    li = load_table(spark, sf_dir, "lineitem")
    checks = [check_not_null(c) for c in li.columns] + [
        check_range("l_quantity", 1, 50)
    ]
    out = audit(li, checks=checks)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one partial+final aggregate pair
    assert plan.count("Scan parquet") == 1


def test_audited_observation_zero_extra_scan(spark, sf_dir):
    from gfw_data_api_spark.operators.quality import (
        audited,
        check_not_null,
        check_range,
    )

    li = load_table(spark, sf_dir, "lineitem")
    observed, obs = audited(
        li, [check_not_null("l_orderkey"), check_range("l_quantity", 1, 10)]
    )
    n = observed.count()  # the caller's own action
    metrics = obs.get
    assert metrics["total"] == n
    assert metrics["not_null(l_orderkey)"] == 0
    expected_viol = li.filter("l_quantity > 10").count()
    assert metrics["range(l_quantity)"] == expected_viol > 0


# ---------------------------------------------------------------------------
# streaming event dedup
# ---------------------------------------------------------------------------


def test_stream_dedup_drops_redeliveries(spark, tmp_path, sf_dir):
    from gfw_data_api_spark.streaming.dedup import dedup_events

    events = load_table(spark, sf_dir, "events").limit(500)
    # simulate at-least-once redelivery: every event arrives twice
    doubled = events.unionByName(events)
    src = str(tmp_path / "src")
    doubled.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = dedup_events(stream, ["event_id"], ts_col="ts", watermark="2 hours")
    assert out.isStreaming
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(sink)
    assert streamed.count() == events.count()            # each id exactly once
    assert streamed.select("event_id").distinct().count() == events.count()


def test_batch_dedup_keeps_deterministic_first(spark):
    import datetime

    from gfw_data_api_spark.streaming.dedup import dedup_events

    t0 = datetime.datetime(2024, 1, 1, 9)
    rows = [
        (1, "click", t0, 30),
        (1, "click", t0, 10),                              # same ts → lower id wins
        (1, "click", t0 + datetime.timedelta(minutes=5), 5),  # later ts loses
        (2, "view", t0, 7),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = {(r.user_id, r.event_type): r.event_id
           for r in dedup_events(df, ["user_id", "event_type"], tiebreak_col="event_id").collect()}
    assert out == {(1, "click"): 10, (2, "view"): 7}


def test_group_cap_sample_properties(spark):
    from gfw_data_api_spark.llmops.sampling import group_cap_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 95 else "small") for i in range(100)],
        "doc_id long, src string",
    )
    out = group_cap_sample(df, "src", 10, seed=1)
    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["big"] == 10
    assert counts["small"] == 5  # under the cap → untouched
    # deterministic across repartitionings
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in group_cap_sample(df.repartition(13), "src", 10, seed=1).collect()}
    assert a == b
    # different seed → different survivors (with high probability)
    c = {r.doc_id for r in group_cap_sample(df, "src", 10, seed=2).collect()}
    assert a != c
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_per_group"):
        group_cap_sample(df, "src", 0)


# ---------------------------------------------------------------------------
# review-finding regressions (round 3 self-review)
# ---------------------------------------------------------------------------


def test_skew_hybrid_join_null_keys_survive_left_join(spark):
    from gfw_data_api_spark.operators.skew import skew_hybrid_join

    facts = spark.createDataFrame(
        [("hot", 1), (None, 2), ("cold", 3)], "k string, v int"
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, name string")
    out = skew_hybrid_join(facts, dim, keys="k", hot_keys=["hot"], how="left")
    plain = facts.join(dim, on="k", how="left")
    assert out.count() == plain.count() == 3
    assert out.exceptAll(plain).count() == 0
    null_row = [r for r in out.collect() if r.k is None]
    assert len(null_row) == 1 and null_row[0].name is None
    # inner join: NULL keys match nothing in both shapes
    inner = skew_hybrid_join(facts, dim, keys="k", hot_keys=["hot"], how="inner")
    assert inner.count() == facts.join(dim, on="k").count() == 2


def test_update_task_rejected_patch_leaves_no_trace(spark, tmp_path):
    from gfw_data_api_spark.catalog.registry import Registry, RegistryError

    registry = Registry(str(tmp_path / "cat"))
    registry.ensure_dataset("ds")
    registry.create_version("ds", "v1")
    asset = registry.create_asset("ds", "v1", "database_table")
    registry.create_task("t-1", asset.asset_id)
    with pytest.raises(RegistryError):
        registry.update_task("t-1", [{"status": "running", "message": "…"}])
    # the invalid entries must NOT linger in memory or survive a reload
    assert registry.get_task("t-1").change_log == []
    registry.save()
    assert Registry(str(tmp_path / "cat")).get_task("t-1").change_log == []



def test_update_task_last_status_wins(spark, tmp_path):
    """Reference (routes/tasks/task.py:112-127) keys propagation off the
    LAST change-log entry's status, breaking early only on `failed`:
    [success, pending] is a 400, [pending, success] completes, and
    [failed, success] fails (advice r3)."""
    from gfw_data_api_spark.catalog.registry import Registry, RegistryError

    def fresh(name):
        registry = Registry(str(tmp_path / name))
        registry.ensure_dataset("ds")
        registry.create_version("ds", "v1")
        asset = registry.create_asset("ds", "v1", "database_table")
        registry.create_task("t-1", asset.asset_id)
        return registry, asset

    # trailing non-terminal entry -> 400, nothing propagates
    registry, asset = fresh("a")
    with pytest.raises(RegistryError, match="success.*failed"):
        registry.update_task("t-1", [
            {"status": "success", "message": "done"},
            {"status": "pending", "message": "more to come"},
        ])
    assert registry.get_task("t-1").change_log == []
    assert registry.get_asset(asset.asset_id).status != "saved"

    # success last -> completes
    registry, asset = fresh("b")
    registry.update_task("t-1", [
        {"status": "pending", "message": "…"},
        {"status": "success", "message": "done"},
    ])
    assert registry.get_asset(asset.asset_id).status == "saved"

    # failed anywhere short-circuits, even with a later success
    registry, asset = fresh("c")
    registry.update_task("t-1", [
        {"status": "failed", "message": "boom"},
        {"status": "success", "message": "ignored"},
    ])
    assert registry.get_asset(asset.asset_id).status == "failed"

def test_datamart_search_malformed_dataset_version_422(spark, tmp_path):
    from gfw_data_api_spark.api import create_app
    from gfw_data_api_spark.catalog.registry import Registry

    app = create_app(spark, Registry(str(tmp_path / "cat")))
    for q in ("dataset_version=not-json", "dataset_version=5", "dataset_version=%5B1%5D"):
        out = _call(app, "GET", "/datamart/tree_cover_loss_by_driver", query=q)
        assert out["status"] == 422, q


def _call(app, method, path, query="", body=None, headers=None):
    import io
    import json as _json

    raw = _json.dumps(body).encode() if body is not None else b""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_LENGTH": str(len(raw)),
        "wsgi.input": io.BytesIO(raw),
    }
    for name, value in (headers or {}).items():
        environ["HTTP_" + name.upper().replace("-", "_")] = value
    captured = {}

    def start_response(status, hdrs):
        captured["status"] = int(status.split()[0])

    chunks = app(environ, start_response)
    payload = b"".join(chunks)
    try:
        captured["body"] = _json.loads(payload)
    except ValueError:
        captured["body"] = payload.decode(errors="replace")
    return captured


def test_batch_dedup_default_tiebreak_is_deterministic(spark):
    import datetime

    from gfw_data_api_spark.streaming.dedup import dedup_events

    t0 = datetime.datetime(2024, 1, 1, 9)
    # two rows tie on (key, ts); NO explicit tiebreak given — the full
    # remaining-column ordering must pick the same survivor regardless
    # of partitioning
    rows = [(1, t0, 99), (1, t0, 11), (2, t0, 5)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    expected = {(1, 11), (2, 5)}
    for parts in (1, 7):
        out = {
            (r.user_id, r.event_id)
            for r in dedup_events(df.repartition(parts), ["user_id"]).collect()
        }
        assert out == expected, parts


def test_gopher_oracle_includes_line_rules(spark):
    """t12's Spark/oracle pair must agree on documents that trip the
    bullet/ellipsis line rules (the previously omitted keep terms)."""
    import duckdb

    from gfw_data_api_spark import inventory

    filler = "the of and that have with be to more words here now " * 5
    tricky = "\n".join(["going on and on..."] * 7 + [filler] * 3)  # 0.7 ellipsis lines
    docs = spark.createDataFrame([(1, tricky)], "doc_id long, text string")

    from gfw_data_api_spark.llmops.text import gopher_quality_rules

    spark_keep = gopher_quality_rules(docs, min_words=30).collect()[0].keep
    assert spark_keep is False

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    sql = inventory.SPECS["t12_gopher_rules"].oracle
    oracle_keep = {r[0]: r[6] for r in con.execute(sql).fetchall()}[1]
    assert oracle_keep == 0


def test_portable_minhash_agrees_with_xxhash_family(spark):
    """The portable (md5-affine) and throughput (xxhash64) MinHash
    families are different hash families over the same algorithm — on
    planted exact/near dups they must agree: exact copies at est 1.0 in
    both, unrelated docs absent from both."""
    from gfw_data_api_spark.llmops.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_candidates_portable,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    rows = [
        (1, base),
        (2, base),  # exact dup
        (3, base.replace("lazy", "sleepy")),  # near dup
        (4, "completely different text about query engines and columnar formats today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {(r.id_a, r.id_b): r.est_jaccard
            for r in minhash_lsh_candidates(docs, num_hashes=64, bands=16).collect()}
    portable = {(r.id_a, r.id_b): r.est_jaccard
                for r in minhash_lsh_candidates_portable(docs, num_hashes=64, bands=16).collect()}
    assert fast[(1, 2)] == portable[(1, 2)] == 1.0
    assert (1, 3) in fast and (1, 3) in portable
    assert portable[(1, 3)] > 0.5
    assert all(4 not in pair for pair in fast) and all(4 not in pair for pair in portable)


# ---------------------------------------------------------------------------
# training-sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_respects_budget_and_covers_all_docs(spark, sf_dir):
    from gfw_data_api_spark.llmops.packing import pack_sequences, packing_efficiency

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, max_tokens=256, buckets=16).cache()
    rows = packed.collect()
    # every sequence within budget unless it holds a single long doc
    for r in rows:
        assert r.n_tokens <= 256 or r.n_docs == 1
    # exact cover: every doc appears exactly once
    all_ids = [i for r in rows for i in r.doc_ids]
    assert len(all_ids) == len(set(all_ids)) == docs.count()
    # packing beats one-doc-per-sequence
    eff = packing_efficiency(packed, max_tokens=256).collect()[0]
    assert eff.n_sequences < docs.count()
    assert 0 < eff.mean_fill <= 1.0
    # deterministic across partitionings
    again = {r.seq_id: r.doc_ids
             for r in pack_sequences(docs.repartition(7), max_tokens=256, buckets=16).collect()}
    assert {r.seq_id: r.doc_ids for r in rows} == again
    packed.unpersist()


def test_pack_sequences_separator_accounting(spark):
    from gfw_data_api_spark.llmops.packing import pack_sequences

    # 3 docs of 10 tokens; budget 21 fits two with one separator
    # (10+1+10) but not three (10+1+10+1+10=32)
    docs = spark.createDataFrame(
        [(i, "w " * 10) for i in range(3)], "doc_id long, text string"
    )
    rows = pack_sequences(docs, max_tokens=21, buckets=1, sep_tokens=1).collect()
    sizes = sorted(r.n_docs for r in rows)
    assert sizes == [1, 2]
    two = [r for r in rows if r.n_docs == 2][0]
    assert two.n_tokens == 21


def test_pack_sequences_property(spark):
    """Random corpora: every sequence within budget (or singleton),
    exact cover, no empty sequences — across several seeds/budgets."""
    import random

    from gfw_data_api_spark.llmops.packing import pack_sequences

    rng = random.Random(13)
    for trial in range(3):
        n_docs = rng.randint(5, 60)
        budget = rng.choice([16, 64, 256])
        rows = [
            (i, "w " * rng.randint(1, budget * 2 // 3 + 5)) for i in range(n_docs)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        packed = pack_sequences(docs, max_tokens=budget, buckets=4).collect()
        ids = [i for r in packed for i in r.doc_ids]
        assert sorted(ids) == list(range(n_docs)), (trial, budget)
        for r in packed:
            assert r.n_docs >= 1
            assert r.n_tokens <= budget or r.n_docs == 1, (trial, budget, r)


def test_pack_sequences_string_ids_and_null_rejection(spark):
    """String/uuid doc ids must pack carrying their native type (the old
    cast('long') silently nulled every one — advice r3), NULL ids must
    raise, and unsupported id types must be rejected up front."""
    import pytest as _pytest

    from gfw_data_api_spark.llmops.packing import pack_sequences

    docs = spark.createDataFrame(
        [("uuid-a", "one two three"), ("uuid-b", "four five"), ("uuid-c", "six")],
        "doc_id string, text string",
    )
    rows = pack_sequences(docs, max_tokens=8, buckets=2).collect()
    packed_ids = sorted(i for r in rows for i in r.doc_ids)
    assert packed_ids == ["uuid-a", "uuid-b", "uuid-c"]
    assert all(isinstance(i, str) for i in packed_ids)

    with_null = spark.createDataFrame(
        [("uuid-a", "one"), (None, "two")], "doc_id string, text string"
    )
    with _pytest.raises(Exception, match="NULL values in id column"):
        pack_sequences(with_null, max_tokens=8, buckets=1).collect()

    bad_type = spark.createDataFrame([(1.5, "one")], "doc_id double, text string")
    with _pytest.raises(ValueError, match="integral or string id"):
        pack_sequences(bad_type, max_tokens=8)


def test_pack_sequences_auto_bucket_scaling(spark):
    """buckets=None sizes buckets from the corpus so per-bucket FFD work
    stays bounded: bucket count grows with n_docs / target_bucket_docs
    (floor 32) and the packing still exactly covers the corpus."""
    from gfw_data_api_spark.llmops.packing import pack_sequences

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma").alias("text")
    )
    packed = pack_sequences(docs, max_tokens=64, target_bucket_docs=100).cache()
    n_buckets = packed.select("pack_bucket").distinct().count()
    # ceil(500/100)=5 requested, floored to 32 — membership is hashed so
    # not every bucket need be non-empty, but spread must exceed 5
    assert 5 < n_buckets <= 32
    assert sorted(i for r in packed.collect() for i in r.doc_ids) == list(range(500))
    packed.unpersist()


# ---------------------------------------------------------------- sketches


def test_misra_gries_bounds_random():
    import numpy as np

    from gfw_data_api_spark.operators.sketches import misra_gries

    rng = np.random.default_rng(5)
    # zipf-ish stream: heavy head + long tail
    stream = list(rng.zipf(1.5, size=5000) % 500)
    capacity = 32
    summary = misra_gries(iter(stream), capacity)
    assert len(summary) <= capacity
    n = len(stream)
    from collections import Counter

    true = Counter(stream)
    for v, est in summary.items():
        assert est <= true[v]                        # never overcounts
        assert true[v] - est <= n // (capacity + 1)  # bounded undercount
    # survival: every value heavier than the bound is in the summary
    for v, c in true.items():
        if c > n // (capacity + 1):
            assert v in summary


def test_heavy_hitters_spark_exact_on_candidates(spark):
    from gfw_data_api_spark.operators.sketches import heavy_hitters

    rows = [(v,) for v in ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"] * 2 + [None] * 3]
    df = spark.createDataFrame(rows, "k string")
    out = heavy_hitters(df, "k", capacity=8, top_k=3).collect()
    got = [(r["value"], r["exact_count"]) for r in out]
    assert got[:2] == [("a", 50), ("b", 30)]
    for r in out:
        assert r["est_count"] <= r["exact_count"]
        assert r["exact_count"] - r["est_count"] <= 87 // 9


def test_heavy_hitters_capacity_validation(spark):
    import pytest as _pytest

    from gfw_data_api_spark.operators.sketches import heavy_hitter_candidates

    df = spark.createDataFrame([("x",)], "k string")
    with _pytest.raises(ValueError):
        heavy_hitter_candidates(df, "k", capacity=0)


def test_epoch_shuffle_deterministic_permutation(spark):
    from gfw_data_api_spark.llmops.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = [r["doc_id"] for r in epoch_shuffle(df, seed=1).collect()]
    b = [r["doc_id"] for r in epoch_shuffle(df, seed=1).collect()]
    c = [r["doc_id"] for r in epoch_shuffle(df, seed=2).collect()]
    assert a == b                      # same epoch → same order
    assert a != c                      # different epoch → different order
    assert sorted(a) == list(range(40))  # a permutation, nothing lost
    assert a != list(range(40))        # actually shuffled
