"""Skew-mitigation operators.

AQE's skew-join splitting handles JOIN skew automatically (session.py),
but a groupBy on a low-cardinality / hot-key column still funnels every
row of a hot key through one reducer before map-side partials kick in —
and for high-cardinality aggregation states (collect-like, exact
percentile buffers) partial aggregation alone may not save it. The
classic fix is SALTING: append a random bucket to the key, aggregate
(key, salt) partials in parallel, then combine the ≤``salt_buckets``
partial rows per key. Implemented for the decomposable aggregates
(count/sum/min/max): phase 1 shuffles on the salted key, phase 2
combines B small rows per key — the hot key's work spreads over B
reducers by construction, independent of AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# agg kind → (phase-1 partial over rows, phase-2 combine over partials)
_DECOMPOSABLE = {
    "count": (lambda c: F.count("*"), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    # exact money/metric sums: accumulate in DECIMAL, emit DOUBLE
    "sum_decimal": (
        lambda c: F.sum(F.col(c).cast("decimal(18,2)")),
        F.sum,
    ),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation matching ``df.groupBy(keys).agg(...)``.

    ``aggs`` maps output column name → (kind, input column), with kind in
    count | sum | sum_decimal | min | max (input ignored for count).

    Exactness: count/min/max/sum-over-integers are value-identical to the
    single-phase aggregation. Plain ``sum`` over FLOATS re-associates the
    addition across salt buckets, so low bits can differ from single-phase
    (and between runs with different ``salt_buckets``) — float addition is
    not associative. For bit-identical float/money sums use ``sum_decimal``,
    which accumulates in DECIMAL(18,2) (order-independent) and emits DOUBLE.
    """
    unknown = {kind for kind, _ in aggs.values()} - set(_DECOMPOSABLE)
    if unknown:
        raise ValueError(f"non-decomposable aggregate kinds: {sorted(unknown)}")

    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial_cols = [
        _DECOMPOSABLE[kind][0](col).alias(f"_p_{out}")
        for out, (kind, col) in aggs.items()
    ]
    partials = salted.groupBy(*keys, "_salt").agg(*partial_cols)

    final_cols = []
    for out, (kind, _col) in aggs.items():
        combined = _DECOMPOSABLE[kind][1](F.col(f"_p_{out}"))
        if kind == "sum_decimal":
            combined = combined.cast("double")
        final_cols.append(combined.alias(out))
    return partials.groupBy(*keys).agg(*final_cols)


def skew_hybrid_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str] | str,
    hot_key_threshold: int = 1_000_000,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-split join: hot keys go through a broadcast join, the cold
    remainder through the ordinary shuffled join, results unioned.

    AQE's skew-join splitting subdivides oversized partitions AFTER the
    shuffle has moved a hot key's rows; this operator keeps hot-key rows
    from shuffling at all — each executor joins its resident hot rows
    against a broadcast of the dim's matching slice, which is the right
    shape when one key holds a double-digit percent of a 100 TB fact
    table (the shuffle itself is the bottleneck, not the reducer).

    ``hot_keys`` pins the split explicitly (cheap, production path:
    derived from yesterday's stats). When ``None``, keys whose fact
    count exceeds ``hot_key_threshold`` are detected with one
    aggregation over the fact side's key column — a narrow count
    pre-pass that scans only the key column.

    Exactness: the two branches partition the key space, so the union
    equals the single join for inner/left joins (asserted by the
    q24 oracle twin).
    """
    if isinstance(keys, str):
        keys = [keys]
    if how not in ("inner", "left"):
        raise ValueError("skew_hybrid_join supports inner/left joins")
    if hot_keys is None:
        hot_rows = (
            facts.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > hot_key_threshold)
            .select(*keys)
            .limit(10_000)
            .collect()
        )
        hot_keys = [tuple(r[k] for k in keys) for r in hot_rows]
    else:
        hot_keys = [k if isinstance(k, tuple) else (k,) for k in hot_keys]

    if not hot_keys:
        return facts.join(dim, on=keys, how=how)

    key_struct = F.struct(*[F.col(k) for k in keys])
    hot_lits = F.array(
        *[
            F.struct(*[F.lit(v).alias(k) for k, v in zip(keys, tup)])
            for tup in hot_keys
        ]
    )
    # NULL-safe split: array_contains yields NULL for a NULL key, which
    # would drop the row from BOTH branches; coalesce routes NULL keys
    # to the cold shuffled join, which handles them exactly like the
    # plain join (no match; left joins keep the row with null dim cols)
    is_hot = F.coalesce(F.array_contains(hot_lits, key_struct), F.lit(False))

    hot_facts = facts.filter(is_hot)
    cold_facts = facts.filter(~is_hot)
    hot_dim = dim.filter(is_hot)

    hot_joined = hot_facts.join(F.broadcast(hot_dim), on=keys, how=how)
    cold_joined = cold_facts.join(dim, on=keys, how=how)
    return hot_joined.unionByName(cold_joined)
