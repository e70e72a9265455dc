"""Snapshot-isolated tables (sources/snapshots.py): atomic commits, time
travel, rollback, vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.sources.snapshots import (
    snapshot_commit,
    snapshot_history,
    snapshot_read,
    snapshot_rollback,
    vacuum,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_commit_read_time_travel(spark, table):
    v0 = snapshot_commit(spark.range(10), table, note="initial")
    v1 = snapshot_commit(spark.range(25), table, note="reload")
    assert (v0, v1) == (0, 1)
    assert snapshot_read(spark, table).count() == 25  # current
    assert snapshot_read(spark, table, version=0).count() == 10  # time travel
    notes = [v["note"] for v in snapshot_history(table)]
    assert notes == ["initial", "reload"]


def test_rollback_is_o1_and_revertible(spark, table):
    snapshot_commit(spark.range(5), table)
    snapshot_commit(spark.range(50), table)
    snapshot_rollback(table, 0)
    assert snapshot_read(spark, table).count() == 5
    # the newer version is still there: rollback of the rollback
    snapshot_rollback(table, 1)
    assert snapshot_read(spark, table).count() == 50


def test_crashed_write_invisible_to_readers(spark, table):
    snapshot_commit(spark.range(7), table)
    # simulate a writer that died after writing data, before committing:
    # an orphan v= dir that no manifest references
    spark.range(999).write.parquet(os.path.join(table, "v=1"))
    assert snapshot_read(spark, table).count() == 7  # reader never sees it
    with pytest.raises(ValueError):
        snapshot_read(spark, table, version=1)  # not a committed version
    # a retrying writer skips past the orphan instead of colliding
    v = snapshot_commit(spark.range(3), table)
    assert v == 2
    assert snapshot_read(spark, table).count() == 3
    # the orphan is reclaimable once past the grace period (grace exists
    # because a young orphan may be an in-flight writer's reservation)
    assert 1 not in vacuum(table, keep_last=2)  # still within grace
    assert 1 in vacuum(table, keep_last=2, orphan_grace_seconds=0, retention_seconds=0)


def test_vacuum_reclaims_old_and_orphans(spark, table):
    for n in (3, 6, 9, 12):
        snapshot_commit(spark.range(n), table)
    removed = vacuum(table, keep_last=2, orphan_grace_seconds=0, retention_seconds=0)
    assert removed == [0, 1]
    assert not os.path.exists(os.path.join(table, "v=0"))
    assert snapshot_read(spark, table).count() == 12
    assert snapshot_read(spark, table, version=2).count() == 9
    with pytest.raises(ValueError):
        snapshot_read(spark, table, version=0)


def test_missing_table_errors(spark, table):
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, table)


def test_readers_isolated_from_concurrent_commit(spark, table):
    snapshot_commit(spark.range(100).withColumn("x", F.lit(1)), table)
    reader = snapshot_read(spark, table)  # resolves the manifest NOW
    snapshot_commit(spark.range(7).withColumn("x", F.lit(2)), table)
    # the in-flight reader still sees its immutable snapshot
    assert reader.count() == 100
    assert snapshot_read(spark, table).count() == 7


def test_snapshot_sink_exactly_once(spark, tmp_path, sf_dir):
    from gfw_data_api_spark.sources.tabular import load_table
    from gfw_data_api_spark.streaming.snapshot_sink import (
        committed_batch_ids,
        read_stream_table,
        snapshot_sink,
    )

    events = load_table(spark, sf_dir, "events").limit(300)
    src = str(tmp_path / "src")
    # three source files → availableNow processes them (possibly batched)
    events.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    table = str(tmp_path / "snap_table")
    q = (
        stream.writeStream.foreachBatch(snapshot_sink(table))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert read_stream_table(spark, table).count() == 300
    ids = committed_batch_ids(table)
    assert ids  # at least one batch committed
    # REDELIVERY: calling the sink again with an already-committed batch
    # id must be a no-op (the at-least-once recovery case)
    sink = snapshot_sink(table)
    sink(events.limit(50), batch_id=min(ids))
    assert read_stream_table(spark, table).count() == 300
    # a genuinely new batch id commits
    sink(events.limit(50), batch_id=max(ids) + 1)
    assert read_stream_table(spark, table).count() == 350


def test_vacuum_keep_last_validated(spark, table):
    snapshot_commit(spark.range(1), table)
    with pytest.raises(ValueError, match="keep_last"):
        vacuum(table, keep_last=0)


def test_sink_app_id_isolation(spark, tmp_path):
    from gfw_data_api_spark.streaming.snapshot_sink import (
        read_stream_table,
        snapshot_sink,
    )

    table = str(tmp_path / "two_apps")
    a, b = snapshot_sink(table, app_id="query_a"), snapshot_sink(table, app_id="query_b")
    a(spark.range(10), batch_id=0)
    # DIFFERENT app, same batch id: must NOT be treated as redelivery
    b(spark.range(5), batch_id=0)
    assert read_stream_table(spark, table).count() == 15
    # same app, same id: skipped
    a(spark.range(99), batch_id=0)
    assert read_stream_table(spark, table).count() == 15


def test_stream_compaction_preserves_content_and_dedup(spark, tmp_path):
    from gfw_data_api_spark.streaming.snapshot_sink import (
        committed_batch_ids,
        compact_stream_table,
        read_stream_table,
        snapshot_sink,
    )

    table = str(tmp_path / "compacted")
    sink = snapshot_sink(table, app_id="q")
    for bid, n in enumerate((10, 20, 30)):
        sink(spark.range(n), batch_id=bid)
    assert read_stream_table(spark, table).count() == 60
    compact_stream_table(spark, table)
    # content identical through the compact
    assert read_stream_table(spark, table).count() == 60
    # the covered delta dirs are now reclaimable; content survives
    removed = vacuum(table, keep_last=1, orphan_grace_seconds=0, retention_seconds=0)
    assert removed  # the three batch versions
    assert read_stream_table(spark, table).count() == 60
    # redelivery dedup SURVIVES the vacuum (ids live in the compact entry)
    assert committed_batch_ids(table, "q") == {0, 1, 2}
    sink(spark.range(1000), batch_id=1)
    assert read_stream_table(spark, table).count() == 60


def test_commit_precondition_under_lock(spark, table):
    from gfw_data_api_spark.sources.snapshots import snapshot_commit as commit

    v = commit(spark.range(4), table, precondition=lambda m: True)
    assert v == 0
    # a failing precondition abandons the commit: no manifest entry,
    # data left as an orphan for vacuum
    v2 = commit(spark.range(9), table, precondition=lambda m: False)
    assert v2 is None
    assert snapshot_read(spark, table).count() == 4
    assert [e["id"] for e in snapshot_history(table)] == [0]
    assert 1 in vacuum(table, keep_last=1, orphan_grace_seconds=0, retention_seconds=0)


def test_compact_tolerates_midfold_batch_but_not_double_compact(spark, tmp_path):
    """A batch landing mid-fold does not abort the compact (it stays an
    uncovered live delta); a racing second compact DOES abort."""
    import json

    from gfw_data_api_spark.sources import snapshots as snap
    from gfw_data_api_spark.streaming import snapshot_sink as ss

    table = str(tmp_path / "racing")
    sink = ss.snapshot_sink(table, app_id="q")
    sink(spark.range(5), batch_id=0)
    live_before = ss._live_stream_versions(table)

    def fold_commit(live):
        """What compact_stream_table commits for a captured live set."""
        return snap.snapshot_commit(
            ss._read_versions(spark, table, live),
            table,
            note=ss.STREAM_COMPACT_PREFIX
            + json.dumps(
                {"covers": [v["id"] for v in live], "batch_ids": {"q": [0]}}
            ),
            precondition=lambda m: {v["id"] for v in live}
            <= {v["id"] for v in ss._live_from_manifest(m)},
        )

    # race 1: a new batch lands after the fold captured its live set —
    # the compact still commits, and the new batch is NOT double-counted
    sink(spark.range(7), batch_id=1)
    assert fold_commit(live_before) is not None
    assert ss.read_stream_table(spark, table).count() == 12
    # race 2: a second compact captured the SAME (now covered) live set —
    # its precondition fails and it abandons
    assert fold_commit(live_before) is None
    assert ss.read_stream_table(spark, table).count() == 12
    # the public API folds the rest; an already-compacted table no-ops
    v = ss.compact_stream_table(spark, table)
    assert v is not None
    assert ss.compact_stream_table(spark, table) == v  # idempotent no-op
    assert ss.read_stream_table(spark, table).count() == 12


def test_commit_abandons_when_vacuum_reclaimed_reservation(spark, table):
    """A writer stalled past orphan_grace_seconds whose reserved dir was
    vacuumed must abandon its commit (never publish an entry whose data
    is gone)."""
    from gfw_data_api_spark.sources import snapshots as snap

    snapshot_commit(spark.range(4), table, note="base")
    # the stalled writer: data fully written, manifest append not yet run
    vid, vdir = snap._reserve_version_dir(table)
    spark.range(9).write.mode("append").parquet(vdir)
    # vacuum with zero grace judges the reservation an idle orphan
    assert vid in vacuum(table, keep_last=1, orphan_grace_seconds=0, retention_seconds=0)
    assert not os.path.exists(vdir)
    # the writer wakes up and tries to finish
    assert snap._commit_reserved(table, vid, vdir, note="stalled") is None
    # manifest untouched: still one version, current unchanged
    assert [e["id"] for e in snapshot_history(table)] == [0]
    assert snapshot_read(spark, table).count() == 4


def test_vacuum_keeps_compact_while_covered_delta_pinned(spark, tmp_path):
    """Removing a compact entry whose covered delta survives (pinned by
    rollback) would surface the delta as uncovered and double-count its
    rows; vacuum must keep the compact's covers metadata alive."""
    from gfw_data_api_spark.streaming.snapshot_sink import (
        compact_stream_table,
        read_stream_table,
        snapshot_sink,
    )

    table = str(tmp_path / "pinned")
    sink = snapshot_sink(table, app_id="q")
    for bid, n in enumerate((10, 20)):
        sink(spark.range(n), batch_id=bid)
    c1 = compact_stream_table(spark, table)  # covers {0, 1}
    sink(spark.range(5), batch_id=2)
    c2 = compact_stream_table(spark, table)  # covers {c1, 2}
    assert read_stream_table(spark, table).count() == 35
    # pin covered delta v0 via rollback: keep = {current=0, last compact}
    snapshot_rollback(table, 0)
    removed = vacuum(table, keep_last=1, orphan_grace_seconds=0, retention_seconds=0)
    # c1 covers {0,1}: v0 is pinned, so c1's entry must survive even if
    # v1's dir is reclaimed; c2 covers {c1,2} and c1 survives, so c2
    # stays live too
    history_ids = [e["id"] for e in snapshot_history(table)]
    assert c1 in history_ids and c2 in history_ids
    assert c1 not in removed and c2 not in removed
    # the stream read still counts every row exactly once
    assert read_stream_table(spark, table).count() == 35


# ---------------------------------------------------------------------------
# property test: random commit/compact/vacuum/rollback schedules
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# op alphabet: (kind, arg) — arg picks the batch id / rollback slot
_OPS = st.lists(
    st.tuples(
        st.sampled_from(["sink", "redeliver", "compact", "vacuum", "rollback"]),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=3,
    max_size=10,
)


@given(ops=_OPS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_schedule_invariants(spark, tmp_path_factory, ops):
    """Under ANY schedule of sink/compact/vacuum/rollback, the stream
    table must (1) never have a manifest entry whose data directory is
    missing, and (2) read back exactly one copy of every delivered
    batch's rows — the module's two core guarantees."""
    import json as _json

    from gfw_data_api_spark.sources.snapshots import (
        _read_manifest,
        snapshot_rollback,
    )
    from gfw_data_api_spark.streaming.snapshot_sink import (
        committed_batch_ids,
        compact_stream_table,
        read_stream_table,
        snapshot_sink,
    )

    table = str(tmp_path_factory.mktemp("sched") / "tbl")
    sink = snapshot_sink(table, app_id="p")
    delivered: dict[int, int] = {}  # batch_id -> row count
    next_bid = 0
    for kind, arg in ops:
        if kind == "sink":
            n = (next_bid % 3) + 1
            sink(spark.range(n), batch_id=next_bid)
            delivered[next_bid] = n
            next_bid += 1
        elif kind == "redeliver" and delivered:
            bid = sorted(delivered)[arg % len(delivered)]
            sink(spark.range(50), batch_id=bid)  # must be a no-op
        elif kind == "compact" and delivered:
            compact_stream_table(spark, table)
        elif kind == "vacuum":
            vacuum(table, keep_last=1, orphan_grace_seconds=3600,
                   retention_seconds=0)
        elif kind == "rollback":
            manifest = _read_manifest(table)
            if manifest["versions"]:
                ids = [v["id"] for v in manifest["versions"]]
                snapshot_rollback(table, ids[arg % len(ids)])

        # invariant 1: every manifest entry's directory exists
        manifest = _read_manifest(table)
        for v in manifest["versions"]:
            vdir = os.path.join(table, f"v={v['id']}")
            assert os.path.isdir(vdir), (
                f"manifest references missing {vdir}; note={v.get('note')}"
            )
        # invariant 2: exactly-once content
        if delivered:
            assert read_stream_table(spark, table).count() == sum(
                delivered.values()
            ), _json.dumps(manifest, indent=1)
            assert committed_batch_ids(table, "p") == set(delivered)


def test_concurrent_sinks_compact_vacuum_threads(spark, tmp_path):
    """Real thread interleaving: three sink writers, a compactor, and a
    vacuum loop share one table; every batch must land exactly once and
    the manifest must never point at deleted data."""
    import threading

    from gfw_data_api_spark.sources.snapshots import _read_manifest
    from gfw_data_api_spark.streaming.snapshot_sink import (
        committed_batch_ids,
        compact_stream_table,
        read_stream_table,
        snapshot_sink,
    )

    table = str(tmp_path / "conc")
    sink = snapshot_sink(table, app_id="t")
    errors: list[BaseException] = []

    def writer(offset: int):
        try:
            for i in range(4):
                # overlapping ids across writers: redeliveries must dedup
                sink(spark.range(3), batch_id=offset + i)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def maintainer(fn):
        try:
            for _ in range(3):
                fn()
        except FileNotFoundError:
            pass  # maintenance before the first commit is fine
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(0,)),
        threading.Thread(target=writer, args=(2,)),   # overlaps ids 2,3
        threading.Thread(target=writer, args=(4,)),   # overlaps ids 4,5
        threading.Thread(target=maintainer, args=(
            lambda: compact_stream_table(spark, table),)),
        threading.Thread(target=maintainer, args=(
            lambda: vacuum(table, keep_last=1, orphan_grace_seconds=3600,
                           retention_seconds=0),)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    # ids 0..7 delivered (with overlaps) — exactly one copy of each
    assert committed_batch_ids(table, "t") == set(range(8))
    assert read_stream_table(spark, table).count() == 8 * 3
    manifest = _read_manifest(table)
    for v in manifest["versions"]:
        assert os.path.isdir(os.path.join(table, f"v={v['id']}"))
