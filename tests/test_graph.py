"""Tests for link-graph centrality (llmops/graph.py) — gate entry g01."""

import numpy as np
import pytest

from gfw_data_api_spark.llmops.graph import pagerank


def _reference_pagerank(out: dict[int, list[int]], damping: float, iters: int):
    """Dense NumPy reference with uniform dangling redistribution."""
    n = len(out)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1.0 - damping) / n)
        dangling = sum(r[u] for u in range(n) if not out[u])
        for u in range(n):
            for v in out[u]:
                new[v] += damping * r[u] / len(out[u])
        new += damping * dangling / n
        r = new
    return r


def test_pagerank_matches_dense_reference_with_dangling(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(df, 0.85, 10).collect()}
    out = {0: [1, 2], 1: [2], 2: [0, 4], 3: [2], 4: []}
    want = _reference_pagerank(out, 0.85, 10)
    assert set(got) == set(range(5))
    for u in range(5):
        assert got[u] == pytest.approx(want[u], abs=1e-12)
    # dangling redistribution keeps total mass at exactly 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_collapses_duplicate_edges_and_ignores_nulls(spark):
    base = [(0, 1), (1, 0)]
    df1 = spark.createDataFrame(base, "src bigint, dst bigint")
    df2 = spark.createDataFrame(
        base + [(0, 1), (0, 1), (None, 1), (0, None)], "src bigint, dst bigint"
    )
    r1 = {r.node: r.rank for r in pagerank(df1, 0.85, 5).collect()}
    r2 = {r.node: r.rank for r in pagerank(df2, 0.85, 5).collect()}
    assert r1 == r2
    # symmetric 2-cycle: both nodes at exactly 1/2
    assert r1[0] == pytest.approx(0.5, abs=1e-15)


def test_pagerank_zero_iters_is_uniform_and_validation(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(df, 0.85, 0).collect()}
    assert got == {0: 1.0 / 3, 1: 1.0 / 3, 2: 1.0 / 3}
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(df, checkpoint_every=0)
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="at least one edge"):
        pagerank(empty)


def test_pagerank_checkpoint_interval_does_not_change_values(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    base = {r.node: r.rank for r in pagerank(df, 0.85, 7, checkpoint_every=1).collect()}
    for k in (2, 3, 7):
        got = {r.node: r.rank for r in pagerank(df, 0.85, 7, checkpoint_every=k).collect()}
        assert got == base


def test_pagerank_sink_heavy_graph_ranks_sink_highest(spark):
    # star into node 9: everyone links to 9, 9 dangles
    edges = [(u, 9) for u in range(9)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(df, 0.85, 15).collect()}
    assert max(got, key=got.get) == 9
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
