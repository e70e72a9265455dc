"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for embedding search beside hyperplane LSH
(similarity.py): a coarse k-means quantizer partitions vectors into
``nlist`` cells; a query scores only the ``nprobe`` nearest cells'
vectors. Standard IVF-Flat (as in FAISS), expressed Spark-first:

- training: Lloyd's iterations as DataFrame jobs — assignment is a
  native min-by-distance over broadcast centroids, the update is one
  groupBy(avg) per iteration. Centroids stay tiny (nlist × dim) and
  live driver-side between iterations.
- index: the cell id is a stored column (like the LSH bucket); at scale
  the table is partitioned by cell so a probe prunes at scan time.
- search: candidate cells chosen driver-side (centroid math is
  nlist × dim flops), then one filtered scan + TakeOrdered top-k.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gfw_data_api_spark.llmops.similarity import cosine_to_query


def _assign_cell(emb: Column, centroids: np.ndarray) -> Column:
    """Index of the nearest centroid.

    Arrow-batched NumPy argmin over a batch×nlist distance matrix — one
    BLAS matmul per batch. (A native chain of nlist zip_with/aggregate
    distance expressions was measured ~10× slower at nlist=8, dim=64:
    dense linear algebra is the one hot path where the vectorized pandas
    UDF beats codegen.)

    CONTRACT (ADVICE r12): the returned expression is marked
    ``asNondeterministic()`` (see below), which Catalyst only accepts
    inside Project/Filter/Aggregate/Window operators. Consume the cell
    through a projected COLUMN (``build_ivf_index`` does exactly this);
    never inline ``_assign_cell(...)`` directly in a join condition,
    sort key, or grouping expression — that raises an
    AnalysisException. tests/test_plans.py pins the single-evaluation
    plan shape so a refactor can't silently reintroduce the double
    Arrow pass.
    """
    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    @pandas_udf(T.IntegerType())
    def nearest(batch: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in batch])
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; ||x||^2 constant in argmin
        scores = -2.0 * (x @ c.T) + c_sq
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    # The function is pure, but letting the optimizer treat it as
    # deterministic makes it DUPLICATE the evaluation whenever a filter
    # references the cell column (join-key isnotnull constraints, probe
    # cell pruning): the filter is pushed below the projection with its
    # own ArrowEvalPython copy, so every row pays the BLAS pass twice
    # (guide §4.4 — observed in the d11/d15/s05/s08 plans). Marking it
    # non-deterministic pins a single evaluation; results are unchanged.
    return nearest.asNondeterministic()(emb)


def train_ivf(
    df: DataFrame,
    nlist: int = 16,
    iters: int = 5,
    emb_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 10_000,
) -> np.ndarray:
    """Lloyd's k-means on a driver-side sample; returns centroids.

    The coarse quantizer is trained on ≤``sample_size`` vectors collected
    once — the standard IVF recipe (FAISS trains its quantizer on a
    sample, never the full corpus): at 100 TB the index ASSIGNMENT is the
    distributed job (build_ivf_index — one pandas-UDF pass over every
    vector), while nlist centroids only need enough sample to converge.
    The earlier all-data distributed Lloyd spent its wall-clock
    recompiling a fresh 1-job plan per iteration for identical math.
    """
    from gfw_data_api_spark.llmops.sampling import deterministic_sample

    sample = np.asarray(
        [list(map(float, v)) for v in deterministic_sample(df, emb_col, sample_size)],
        dtype=np.float64,
    )
    if sample.ndim != 2 or sample.shape[0] < nlist:
        raise ValueError(
            f"IVF training needs at least nlist={nlist} sample vectors, "
            f"got {0 if sample.ndim != 2 else sample.shape[0]}"
        )
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=nlist, replace=False)]

    sample_sq = (sample * sample).sum(axis=1)[:, None]
    for _ in range(iters):
        d2 = sample_sq - 2.0 * (sample @ centroids.T) + (centroids * centroids).sum(axis=1)
        cells = np.argmin(d2, axis=1)
        updated = centroids.copy()
        for c in range(len(centroids)):
            members = sample[cells == c]
            if len(members):
                updated[c] = members.mean(axis=0)  # empty cells keep previous
        if np.allclose(updated, centroids, atol=1e-9):
            centroids = updated
            break
        centroids = updated
    return centroids


def build_ivf_index(
    df: DataFrame, centroids: np.ndarray, emb_col: str = "embedding"
) -> DataFrame:
    """Attach the IVF cell column (store/partition by it at scale)."""
    return df.withColumn("ivf_cell", _assign_cell(F.col(emb_col), centroids))


def _probe_cells(centroids: np.ndarray, query: list[float], nprobe: int) -> list[int]:
    qvec = np.asarray(query, dtype=np.float64)
    dists = ((centroids - qvec) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(dists)[:nprobe]]


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search the ``nprobe`` nearest cells for the top-k cosine matches."""
    candidates = indexed.filter(
        F.col("ivf_cell").isin(_probe_cells(centroids, query, nprobe))
    )
    return (
        candidates.select(id_col, cosine_to_query(F.col(emb_col), query).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def ivf_topk_batch(
    indexed: DataFrame,
    centroids: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_query_id: bool = False,
) -> DataFrame:
    """Batched multi-query IVF probe: ONE plan for any number of query
    vectors (the R10 batch-list pattern applied to ANN — raster/batch.py
    precedent; replaces Q independent ``ivf_topk`` plans with Q scans).
    ``exclude_query_id=True`` drops the candidate whose id equals the
    query id before ranking — the standard self-match exclusion when
    query vectors come from the corpus itself (recall evaluation).

    Driver-side: cell selection per query (Q × nlist flops). Plan-side:
    a (query_id, cell, qvec, qnorm) probe table — bounded at Q × nprobe
    rows by construction — equi-joins the index on the cell id, so the
    scan stays pruned to probed cells and AQE broadcasts the tiny probe
    side without a hint; the per-query top-k is a cosine-ranked window
    PARTITIONED by query_id (never unpartitioned).

    Per-query results are IEEE-identical to ``ivf_topk`` (same
    zip_with/aggregate expression shape, query vector delivered as an
    array column instead of inlined literals).

    Returns (query_id, vec_id, cosine, rank) with rank 1..k.
    """
    from gfw_data_api_spark.llmops.similarity import norm_col

    if not queries:
        raise ValueError("ivf_topk_batch needs at least one (query_id, vector)")
    spark = indexed.sparkSession
    probe_rows = []
    for qid, query in queries:
        qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
        for cell in _probe_cells(centroids, query, nprobe):
            probe_rows.append((int(qid), cell, [float(x) for x in query], qnorm))
    probes = spark.createDataFrame(
        probe_rows, "query_id bigint, ivf_cell int, _qvec array<double>, _qnorm double"
    )
    dot = F.aggregate(
        F.zip_with(F.col(emb_col).cast("array<double>"), F.col("_qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = indexed.join(probes, "ivf_cell")
    if exclude_query_id:
        scored = scored.filter(F.col(id_col) != F.col("query_id"))
    scored = scored.select(
        "query_id",
        F.col(id_col),
        (dot / (norm_col(F.col(emb_col)) * F.col("_qnorm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
