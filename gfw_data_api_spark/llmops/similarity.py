"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Dot products are native ``zip_with``/``aggregate`` expressions; the
  top-k is a single ``orderBy(...).limit(k)`` (Spark runs TakeOrdered —
  per-partition heaps + a driver merge, no global sort shuffle).
- ``hyperplane_lsh_buckets`` / ``ann_topk``: the scale path — random
  hyperplane signs (seeded, deterministic) bucket vectors; a query probes
  its own bucket (optionally hamming-1 neighbors) and scores only those
  candidates. At 100 TB the bucket column is written with the table and
  pruned at scan time.
- ``embedding_near_dups``: cosine near-dup pairs within LSH buckets.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_with_lit(emb: Column, vec: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(emb.cast("array<double>"), lit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(emb: Column) -> Column:
    cast = emb.cast("array<double>")
    return F.sqrt(
        F.aggregate(F.zip_with(cast, cast, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_to_query(emb: Column, query: list[float]) -> Column:
    qnorm = math.sqrt(sum(float(x) ** 2 for x in query)) or 1.0
    return _dot_with_lit(emb, query) / (norm_col(emb) * F.lit(qnorm))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    return (
        df.select(id_col, cosine_to_query(F.col(emb_col), query).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim))


def hyperplane_bucket_col(emb: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket key from ``planes`` random hyperplanes (bigint)."""
    bits = [
        F.when(_dot_with_lit(emb, plane.tolist()) >= 0, F.shiftleft(F.lit(1).cast("bigint"), i))
        .otherwise(F.lit(0).cast("bigint"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseXOR(b)
    return out


def hyperplane_lsh_buckets(
    df: DataFrame,
    emb_col: str = "embedding",
    planes: int = 12,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Attach the LSH bucket column (deterministic given seed)."""
    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    hp = _hyperplanes(dim, planes, seed)
    return df.withColumn("lsh_bucket", hyperplane_bucket_col(F.col(emb_col), hp))


def ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 12,
    probe_hamming: int = 1,
    seed: int = 42,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's bucket (and
    hamming ≤ ``probe_hamming`` neighbor buckets).

    ``tables`` > 1 uses that many independent hyperplane sets (seeds
    ``seed..seed+tables-1``) and unions their candidate sets — the
    standard recall lever for sign-random-projection LSH (a neighbor
    split from the query by one table's hyperplanes is co-bucketed in
    another). The candidate predicate stays an OR of per-table isin
    filters evaluated in ONE scan — no extra pass, no shuffle; with a
    stored ``lsh_bucket`` column (single-table layout) the filter prunes
    at scan time instead."""

    def _probes(hp: np.ndarray) -> list[int]:
        qvec = np.asarray(query, dtype=np.float64)
        qbits = int(
            sum(1 << i for i, plane in enumerate(hp) if float(plane @ qvec) >= 0)
        )
        out = {qbits}
        if probe_hamming >= 1:
            out |= {qbits ^ (1 << i) for i in range(planes)}
        if probe_hamming >= 2:
            out |= {
                qbits ^ (1 << i) ^ (1 << j)
                for i in range(planes)
                for j in range(i + 1, planes)
            }
        return list(out)

    if tables > 1:
        pred = None
        for t in range(tables):
            hp = _hyperplanes(len(query), planes, seed + t)
            bucket = hyperplane_bucket_col(F.col(emb_col), hp)
            p = bucket.isin(_probes(hp))
            pred = p if pred is None else (pred | p)
        candidates = df.filter(pred)
    else:
        hp = _hyperplanes(len(query), planes, seed)
        if "lsh_bucket" not in df.columns:
            df = hyperplane_lsh_buckets(df, emb_col, planes, len(query), seed)
        candidates = df.filter(F.col("lsh_bucket").isin(_probes(hp)))
    return (
        candidates.select(id_col, cosine_to_query(F.col(emb_col), query).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup pairs: bucket by hyperplane signs, pair within
    buckets, verify exact cosine ≥ threshold. Bounded-quadratic per
    bucket, like the MinHash band join."""
    with_buckets = hyperplane_lsh_buckets(df, emb_col, planes, seed=seed).select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        "lsh_bucket",
        norm_col(F.col(emb_col)).alias("_norm"),
    )
    pairs = (
        with_buckets.alias("a")
        .join(
            with_buckets.alias("b"),
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (
                F.aggregate(
                    F.zip_with(
                        F.col("a._emb").cast("array<double>"),
                        F.col("b._emb").cast("array<double>"),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("a._norm") * F.col("b._norm"))
            ).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


def blocked_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    block_col: str = "label",
    emb_col: str = "embedding",
    threshold: float = 0.35,
    max_block_size: int | None = 100_000,
    guard: str = "eager",
) -> DataFrame:
    """Exact cosine pairs within blocks — the verification stage that
    LSH/IVF candidate generation feeds (gate twin: inventory s04).

    The pair space is quadratic IN THE BLOCK: a block of n vectors emits
    n(n−1)/2 candidate rows, so a 10⁶-vector block is 5·10¹¹ pairs —
    blocking only helps when blocks are bounded. ``max_block_size``
    enforces that bound; ``None`` skips it. Production paths over
    unbounded blocks should generate candidates with LSH
    (hyperplane_lsh_buckets) or IVF first and use this only on the
    candidate pairs.

    ``guard`` picks how the bound is enforced:

    - ``"eager"`` — a separate block-count action up front; raises
      ``ValueError`` naming the offending blocks before any join plan is
      built (the API-friendly default).
    - ``"plan"`` — the bound is asserted inside the returned plan
      (block counts broadcast back onto the build side), so the caller's
      single action pays no extra driver round-trip; an oversized block
      aborts the job at its first scanned row with the same message.
    """
    if max_block_size is not None and guard == "eager":
        oversized = (
            df.groupBy(block_col)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_block_size)
            .limit(5)
            .collect()
        )
        if oversized:
            names = {r[block_col]: r["_n"] for r in oversized}
            raise ValueError(
                f"blocks exceed max_block_size={max_block_size}: {names} — "
                "use LSH/IVF candidate generation for unbounded blocks"
            )
    cast = F.col(emb_col).cast("array<double>")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_block"),
        cast.alias("_e"),
        norm_col(F.col(emb_col)).alias("_n"),
    )
    if max_block_size is not None and guard == "plan":
        counts = df.groupBy(F.col(block_col).alias("_block")).agg(
            F.count("*").alias("_bn")
        )
        # assert_true returns NULL on success; routing the norm through it
        # keeps the check in the plan (a free-standing dropped column would
        # be pruned by the optimizer and never evaluate)
        checked_norm = F.coalesce(
            F.assert_true(
                F.col("_bn") <= F.lit(max_block_size),
                F.concat(
                    F.lit(f"blocks exceed max_block_size={max_block_size}: "),
                    F.col("_block").cast("string"),
                    F.lit(" — use LSH/IVF candidate generation for "
                          "unbounded blocks"),
                ),
            ).cast("double"),
            F.col("_n"),
        )
        base = (
            base.join(F.broadcast(counts), "_block")
            .withColumn("_n", checked_norm)
            .drop("_bn")
        )
    return (
        base.alias("a")
        .join(
            base.alias("b"),
            (F.col("a._block") == F.col("b._block"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (
                F.aggregate(
                    F.zip_with(F.col("a._e"), F.col("b._e"), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("a._n") * F.col("b._n"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    nlist: int = 16,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-cluster near-duplicate
    removal — cluster with k-means, compare pairs WITHIN each cluster,
    drop all but one of each high-cosine pair.

    Returns the surviving rows of ``df`` (duplicates removed). Keep
    policy: within a pair above ``threshold`` the lower id survives —
    deterministic and order-independent, so the result is stable across
    partitionings (the paper keeps a random or farthest-from-centroid
    member; lowest-id is the reproducible choice and makes the exact
    twin comparable in tests).

    Scale shape: the quadratic pair space exists only WITHIN a cluster
    (the paper's point — clustering makes semantic dedup tractable), so
    the cost is Σ_c n_c², not N². Centroids train on a driver-side
    sample (train_ivf); assignment is one pandas-UDF pass; pair
    generation reuses blocked_cosine_pairs on the cell column, keeping
    the plan-asserted no-nested-loop property. Documents in different
    clusters are never compared — that is the (documented) recall trade
    every IVF-style method makes.
    """
    from gfw_data_api_spark.llmops.ivf import build_ivf_index, train_ivf

    centroids = train_ivf(df, nlist=nlist, emb_col=emb_col, seed=seed)
    # NOT persisted although three plan branches read it (pair join ×2 +
    # survivor anti-join): an optimization-round A/B measured persist()
    # 36% SLOWER here (d11 3.75 s → 5.09 s) — columnar-caching the
    # 64-float embedding column costs more than re-running the Arrow
    # assignment pass per branch at every tested scale
    indexed = build_ivf_index(df, centroids, emb_col=emb_col)
    pairs = blocked_cosine_pairs(
        indexed,
        id_col=id_col,
        block_col="ivf_cell",
        emb_col=emb_col,
        threshold=threshold,
        max_block_size=None,  # cells are corpus/nlist-sized by construction
        guard="plan",
    )
    # id_a < id_b in every pair → dropping all id_b keeps exactly one
    # representative (the minimum id) of every duplicate chain. The
    # anti-join probes ``df`` rather than ``indexed``: the survivor rows
    # never need the cell column (it was dropped on return), and probing
    # the pre-assignment table removes a whole Arrow assignment pass
    # from the plan (optimization round 12, guide §4.1 — the third
    # ArrowEvalPython branch existed only to compute a column that was
    # immediately discarded).
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def reciprocal_rank_fusion(
    lists: list[tuple[str, DataFrame, str, str]],
    rrf_k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Hybrid retrieval fusion (Cormack et al. 2009): combine N already
    bounded candidate lists — e.g. BM25 lexical top-N and cosine semantic
    top-N — by Reciprocal Rank Fusion, ``score = Σ_src 1/(rrf_k + rank)``.

    ``lists``: ``(source_tag, df, id_col, score_col)`` per retriever;
    each df must already be a TOP-N candidate list (the retrievers own
    the corpus-scale work — BM25's map-side term filter, ANN's bucket
    probe). Fusion then touches only ``N × len(lists)`` rows: ranks come
    from a window PARTITIONED by source (never an unpartitioned window
    over the corpus), ranked by (score desc, id asc) so ties are
    deterministic, and the fused top-k is one TakeOrdered.

    Cross-engine float note: a document appears in ≤ len(lists) sources,
    so the fused sum adds at most a handful of ``1/(rrf_k + rank)`` terms
    — commutative additions of identical doubles, bit-stable in any
    accumulation order for the 2-source case the gate pins.
    """
    if not lists:
        raise ValueError("reciprocal_rank_fusion: need at least one list")
    from pyspark.sql import Window

    parts = [
        # keep the retriever's NATIVE id type: an unconditional
        # cast('long') would silently NULL string doc ids and collapse
        # every such doc into one bogus NULL group. Mixed numeric
        # widths across lists are reconciled by union's type coercion;
        # genuinely incompatible id types fail loudly there.
        df.select(
            F.lit(tag).alias("_src"),
            F.col(id_col).alias("doc_id"),
            F.col(score_col).cast("double").alias("_score"),
        )
        for tag, df, id_col, score_col in lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("_src").orderBy(F.desc("_score"), F.asc("doc_id"))
    return (
        u.withColumn("_rank", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("_rank"))), 9
            ).alias("rrf_score"),
            F.count("*").alias("n_sources"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(top_k)
    )


def hard_negative_mining(
    candidates: DataFrame,
    positives: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "cosine",
) -> DataFrame:
    """Mine hard negatives for contrastive retrieval training: per
    query, the top-``k`` highest-scoring candidates that are NOT known
    positives (the standard in-batch-plus-mined-negatives recipe —
    e.g. DPR, Karpukhin et al. 2020, and the sentence-transformers
    mining loop).

    ``candidates``: an already BOUNDED per-query candidate list with
    scores — the output of ``ivf_topk_batch`` / ``ann_topk`` / a BM25
    top-N. Candidate generation owns the corpus-scale work (bucket
    probes, never all-pairs); mining then touches only Q × N rows.
    ``positives``: (query_col, id_col) pairs to exclude.

    Plan shape: one left-anti join on (query, id) — positives per
    query are few, and the anti-join shuffles only the bounded
    candidate rows — then a window PARTITIONED by query (never
    unpartitioned), ranked (score desc, id asc) so ties are
    deterministic. Returns (query_col, id_col, score_col, rank) with
    rank 1..k.
    """
    from pyspark.sql import Window

    cand = candidates.select(query_col, id_col, score_col)
    pos = positives.select(query_col, id_col)
    w = Window.partitionBy(query_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        cand.join(pos, [query_col, id_col], "left_anti")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
