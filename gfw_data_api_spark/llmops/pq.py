"""Product quantization (PQ) for embedding compression + ADC search.

The third leg of the vector-search family (similarity.py LSH, ivf.py
IVF-Flat, quantize.py int8): split each d-dim vector into ``m``
subvectors, k-means each subspace to ``ksub`` centroids, and store each
vector as ``m`` byte codes — a d·4-byte float vector becomes ``m``
bytes (e.g. 64-dim → 8 bytes at m=8). Search uses asymmetric distance
computation (ADC): per query, precompute the m×ksub table of
query-subvector ↔ centroid distances driver-side, then score every code
row with pure column math (table lookups + sum) — no per-row Python.
This is the FAISS PQ/IVFPQ recipe re-expressed as DataFrame ops.

Scale shape: training collects only a ≤sample_size driver-side sample
(same argument as ivf.train_ivf — codebooks are tiny, assignment is the
distributed job); encoding is one Arrow-batched pandas UDF pass (m BLAS
matmuls per batch); search is a scan with a JVM-side expression over a
broadcast literal table + TakeOrdered — no shuffle, no UDF in the
query path. Compose with the IVF cell column for IVFPQ: partition
prune by cell, then ADC-score the survivors.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def train_pq(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    emb_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 10_000,
) -> np.ndarray:
    """k-means each of the ``m`` subspaces on a driver-side sample.

    Returns codebooks of shape (m, ksub, d/m). Dimension must divide
    evenly by ``m`` (FAISS's constraint too). The sample is drawn by
    content hash (llmops/sampling.py deterministic_sample), so the
    codebooks reproduce across runs and repartitionings.
    """
    from gfw_data_api_spark.llmops.sampling import deterministic_sample

    sample = np.asarray(
        [list(map(float, v)) for v in deterministic_sample(df, emb_col, sample_size)],
        dtype=np.float64,
    )
    if sample.ndim != 2 or sample.shape[0] < ksub:
        raise ValueError(
            f"PQ training needs at least ksub={ksub} sample vectors, "
            f"got {0 if sample.ndim != 2 else sample.shape[0]}"
        )
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        x = sample[:, j * dsub : (j + 1) * dsub]
        cents = x[rng.choice(n, size=ksub, replace=False)]
        x_sq = (x * x).sum(axis=1)[:, None]
        for _ in range(iters):
            d2 = x_sq - 2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)
            cells = np.argmin(d2, axis=1)
            nxt = cents.copy()
            for c in range(ksub):
                members = x[cells == c]
                if len(members):
                    nxt[c] = members.mean(axis=0)
            if np.allclose(nxt, cents, atol=1e-9):
                cents = nxt
                break
            cents = nxt
        books[j] = cents
    return books


def encode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    emb_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Attach the m-byte PQ code array (store it; drop the raw vector at
    scale — that IS the compression)."""
    books = codebooks.astype(np.float64)
    m, ksub, dsub = books.shape
    books_sq = (books * books).sum(axis=2)  # (m, ksub)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(batch: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in batch])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            d2 = -2.0 * (sub @ books[j].T) + books_sq[j]
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return df.withColumn(code_col, encode(F.col(emb_col)))


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query: list[float],
    k: int = 10,
    code_col: str = "pq_codes",
    id_col: str = "vec_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """ADC top-k: smallest approximate squared L2 distance to ``query``.

    The per-query m×ksub distance table is computed driver-side and
    inlined as a nested array literal; scoring is
    ``sum_j table[j][code_j]`` — `aggregate` over a sequence, pure
    Catalyst, whole-stage-codegen'd, no Python in the scan.

    ``carry_cols`` rides extra columns of ``encoded`` through the
    TakeOrdered (k rows, so the width is driver-bounded): a caller that
    needs a payload column of the winners selects it here instead of
    re-joining the corpus — re-attaching by id re-runs the whole encode
    subtree for k rows (optimization round 12, guide §2.3/§3.3).
    """
    clashes = [c for c in (carry_cols or []) if c in (id_col, "adc_dist")]
    if clashes:
        raise ValueError(
            f"carry_cols {clashes} collide with the result columns "
            f"({id_col!r}, 'adc_dist') — pick distinct source columns"
        )
    books = codebooks.astype(np.float64)
    m, ksub, dsub = books.shape
    q = np.asarray(query, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != {m * dsub}")
    table = np.stack(
        [((books[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1) for j in range(m)]
    )  # (m, ksub)
    adc = F.array(*[F.array(*[F.lit(float(v)) for v in row]) for row in table])
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.element_at(adc, j + 1), F.element_at(F.col(code_col), j + 1) + 1),
    )
    return (
        encoded.select(id_col, dist.alias("adc_dist"), *(carry_cols or []))
        .orderBy(F.asc("adc_dist"), id_col)
        .limit(k)
    )


def pq_topk_refined(
    encoded: DataFrame,
    vectors: DataFrame,
    codebooks: np.ndarray,
    query: list[float],
    k: int = 10,
    refine_factor: int = 10,
    code_col: str = "pq_codes",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ADC candidate generation + exact re-rank (FAISS's IndexRefine).

    8-byte codes rank coarsely — quantization error is on the order of
    within-cluster distances — so the deployment shape is: ADC top
    ``k*refine_factor`` over the compressed table (cheap, codes-only
    scan), then exact distance on just those candidates against the
    full-precision vectors. The candidate set is k·refine_factor rows,
    so the refine join broadcasts."""
    from gfw_data_api_spark.llmops.similarity import cosine_to_query

    candidates = pq_topk(
        encoded, codebooks, query, k=k * refine_factor, code_col=code_col,
        id_col=id_col,
    ).select(id_col)
    return (
        vectors.join(F.broadcast(candidates), id_col)
        .select(
            id_col,
            cosine_to_query(F.col(emb_col), [float(x) for x in query]).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def ivfpq_topk(
    indexed_encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 3,
    code_col: str = "pq_codes",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """IVFPQ: coarse-cell pruning (ivf.build_ivf_index) + ADC scoring.

    ``indexed_encoded`` carries both the IVF cell column and the PQ code
    column; at scale it is partitioned by cell, so the ``nprobe`` filter
    prunes at scan time and the ADC aggregate touches only the probed
    cells' 8-byte codes — the full FAISS IVFPQ read path, with Catalyst
    doing both the pruning and the scoring.
    """
    q = np.asarray(query, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2)[:nprobe]]
    return pq_topk(
        indexed_encoded.filter(F.col(cell_col).isin(probe)),
        codebooks,
        query,
        k=k,
        code_col=code_col,
        id_col=id_col,
    )


def ivfpq_topk_batch(
    indexed_encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    code_col: str = "pq_codes",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    exclude_query_id: bool = False,
) -> DataFrame:
    """Batched multi-query IVFPQ probe: ONE plan for any number of query
    vectors (ivf.ivf_topk_batch's shape applied to the ADC read path;
    replaces Q independent ``ivfpq_topk`` plans with Q scans).

    Driver-side per query: cell selection (nprobe argsort) plus the
    m×ksub ADC table — both tiny. Plan-side: a (query_id, cell,
    adc_table) probe table bounded at Q × nprobe rows equi-joins the
    index on the cell id, so the scan stays pruned to probed cells and
    AQE broadcasts the probe side without a hint; scoring is the same
    ``sum_j table[j][code_j]`` aggregate as ``pq_topk`` with the table
    delivered as an array column instead of inlined literals (per-query
    ADC distances are IEEE-identical); the per-query top-k is a window
    PARTITIONED by query_id (never unpartitioned).

    ``exclude_query_id=True`` drops the candidate whose id equals the
    query id before ranking — the standard self-match exclusion when
    query vectors come from the corpus itself (recall evaluation).

    Returns (query_id, vec_id, adc_dist, rank) with rank 1..k.
    """
    from pyspark.sql import Window

    from gfw_data_api_spark.llmops.ivf import _probe_cells

    if not queries:
        raise ValueError("ivfpq_topk_batch needs at least one (query_id, vector)")
    books = codebooks.astype(np.float64)
    m, ksub, dsub = books.shape
    spark = indexed_encoded.sparkSession
    probe_rows = []
    for qid, query in queries:
        q = np.asarray(query, dtype=np.float64)
        if q.shape[0] != m * dsub:
            raise ValueError(f"query dim {q.shape[0]} != {m * dsub}")
        table = [
            [float(v) for v in ((books[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)]
            for j in range(m)
        ]
        for cell in _probe_cells(centroids, query, nprobe):
            probe_rows.append((int(qid), cell, table))
    probes = spark.createDataFrame(
        probe_rows,
        f"query_id bigint, {cell_col} int, _adc array<array<double>>",
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("_adc"), j + 1), F.element_at(F.col(code_col), j + 1) + 1
        ),
    )
    scored = indexed_encoded.join(probes, cell_col)
    if exclude_query_id:
        scored = scored.filter(F.col(id_col) != F.col("query_id"))
    scored = scored.select("query_id", F.col(id_col), dist.alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "adc_dist", "rank")
    )


def ivfpq_topk_refined_batch(
    indexed_encoded: DataFrame,
    vectors: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    refine_factor: int = 10,
    code_col: str = "pq_codes",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    emb_col: str = "embedding",
    exclude_query_id: bool = False,
) -> DataFrame:
    """Batched IVFPQ + exact re-rank: the deployment read path
    (``pq_topk_refined``'s candidate-generation + refine) as ONE plan
    for any number of query vectors.

    Stage 1 (codes-only scan): ``ivfpq_topk_batch`` ranks
    ``k·refine_factor`` ADC candidates per query over the probed cells.
    Stage 2 (refine): the candidate set — bounded at
    Q·k·refine_factor rows by construction — joins the full-precision
    vector table on the id, and exact cosine against the query vector
    (delivered as an array column on the candidate row) re-ranks the
    top ``k`` per query. Both joins are equi-joins on bounded build
    sides; AQE broadcasts without hints.

    Returns (query_id, vec_id, cosine, rank) with rank 1..k.
    """
    from pyspark.sql import Window

    from gfw_data_api_spark.llmops.similarity import norm_col

    spark = indexed_encoded.sparkSession
    cands = ivfpq_topk_batch(
        indexed_encoded,
        centroids,
        codebooks,
        queries,
        k=k * refine_factor,
        nprobe=nprobe,
        code_col=code_col,
        id_col=id_col,
        cell_col=cell_col,
        exclude_query_id=exclude_query_id,
    ).select("query_id", id_col)
    qdf = spark.createDataFrame(
        [
            (int(qid), [float(x) for x in vec], math.sqrt(sum(float(x) ** 2 for x in vec)) or 1.0)
            for qid, vec in queries
        ],
        "query_id bigint, _qvec array<double>, _qnorm double",
    )
    cast = F.col(emb_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(cast, F.col("_qvec"), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        cands.join(qdf, "query_id")
        .join(vectors.select(id_col, emb_col), id_col)
        .select(
            "query_id",
            F.col(id_col),
            (dot / (norm_col(F.col(emb_col)) * F.col("_qnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
