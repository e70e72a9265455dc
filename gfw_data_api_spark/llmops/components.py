"""Connected components over near-duplicate pair graphs.

Near-dup detection (MinHash/SimHash/Jaccard — llmops/dedup.py) emits
*pairs*; deduplication needs *clusters*: if A~B and B~C, one canonical
document should survive for {A, B, C} even though (A, C) was never
emitted as a pair. That grouping is connected components on the pair
graph.

Scale design — the alternating algorithm of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC 2014), which converges in
O(log n) rounds on any graph (vs O(diameter) for naive label
propagation, which degenerates on chain-shaped duplicate runs such as
shingled crawl snapshots):

- **large-star**: every node connects its strictly-greater neighbors to
  the minimum of its neighborhood;
- **small-star**: every node connects its smaller-or-equal neighbors to
  that minimum.

Both steps are expressed as joins against a per-node min aggregation —
never a ``collect_list`` of neighborhoods, so a hub node with millions
of neighbors becomes a big *group*, handled by map-side partial min
aggregation, not a giant in-memory array. Per round: 2 shuffles
(groupBy min + join) on the node id. Each round's edge set is
``localCheckpoint``-ed to truncate lineage (iterative DataFrame loops
otherwise re-execute the whole history every round).

The reference has no graph operator at all (its dedup surface stops at
unique-constraint ``ON CONFLICT`` upserts — batch/scripts/
load_tabular_data.sh); this is part of the beyond-reference LLM-pipeline
family (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def _canon_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected pair list → canonical (hi, lo) directed edges."""
    return (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-greater neighbor to the neighborhood min.

    Works on the symmetrized edge list: for center u with neighbor set
    Γ(u), m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
    """
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionAll(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", "u").alias("m"))
    # No .distinct() here (optimization round 12, guide §2.4): the only
    # consumer is _small_star, whose min aggregation is duplicate-
    # insensitive and whose own final .distinct() canonicalizes the
    # round's output — the dedup exchange on (hi, lo) every round bought
    # nothing. Duplicate (v, m) rows (same edge reached via different
    # centers) ride two map-side-combined aggregations instead.
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and the center) to the min.

    Input edges are canonical (hi, lo) with lo < hi: for center u = hi
    with smaller-neighbor set N = {lo…}, m = min(N); emit (u, m) and
    (v, m) for v ∈ N, v ≠ m.
    """
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    relink = (
        edges.join(mins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    center = mins.select(F.col("hi"), F.col("m").alias("lo"))
    return relink.unionAll(center).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent checksum) of an edge set."""
    # bit_xor: order-independent and overflow-free under ANSI mode (the
    # edge set is distinct, so xor never cancels duplicates)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0)).alias("sig"),
    ).collect()[0]
    return int(row["n"]), int(row["sig"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Resolve a pair graph to components: ``(node, component)`` where
    ``component`` is the minimum node id in the node's component.

    Every node that appears in ``pairs`` gets a row — including each
    component's own minimum (mapped to itself). Alternates
    large-star/small-star until the edge set is stable (count and
    order-independent hash both unchanged), which on the converged
    star graph means every node points directly at its component min.
    """
    # LAZY localCheckpoint (optimization round 12): the signature
    # aggregate right below is the round's ONE driver action — it
    # materializes and caches the checkpointed RDD as a side effect, so
    # each round pays a single job instead of an eager checkpoint job
    # PLUS a signature job over the same data. The empty-graph test
    # rides the same aggregate (count == 0) instead of a head(1) action.
    edges = _canon_edges(pairs, src, dst).localCheckpoint(eager=False)
    sig = _signature(edges)
    if sig[0] == 0:
        schema = edges.schema
        return pairs.sparkSession.createDataFrame([], schema).select(
            F.col("hi").alias("node"), F.col("lo").alias("component")
        )
    for _ in range(max_iterations):
        # no explicit repartition between rounds: AQE's partition
        # coalescing already right-sizes each round's shuffles from
        # runtime statistics (the old fixed repartition(width) was an
        # EXTRA round-robin exchange — plus its sort-before-repartition
        # pass — per round, guide §2.4/§2.5)
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        nxt_sig = _signature(nxt)
        edges, prev_sig, sig = nxt, sig, nxt_sig
        if nxt_sig == prev_sig:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    members = edges.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    roots = edges.select(F.col("lo").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every document its dedup cluster and canonical flag.

    Returns ``docs``'s id column plus ``component`` (cluster id = min
    doc id in the near-dup cluster; singletons are their own cluster)
    and ``keep`` (true for the one canonical row per cluster). Dropping
    ``keep = false`` rows is the standard one-survivor-per-cluster
    dedup. No broadcast hint on the components side: on web-scale
    corpora 30-50% of docs sit in some near-dup cluster, so the map is
    unbounded — a forced broadcast would OOM the driver at 100 TB. AQE
    sizes the join at runtime and still broadcasts when the map really
    is small.
    """
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "node", id_col
    )
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )
