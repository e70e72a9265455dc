"""Time-series joins the reference dialect lacks (SURVEY §2.7 lists
as-of and range/interval joins as explicitly absent), built as
shuffle-bounded DataFrame compositions — the operators a training-data
pipeline needs for event attribution and windowed enrichment.

- ``asof_join``: for every left row, the closest right row at-or-before
  (or at-or-after) it on the ordering column, per key. Implemented as
  the union-merge pattern: tag both sides, one shuffle on the key, one
  sort within the key, then an ``ignorenulls`` last() carry-forward
  window. Cost is O(n log n) per key partition and exactly ONE shuffle
  — never the naive inequality join (which Spark can only execute as a
  broadcast-nested-loop scan per row).
- ``interval_join``: match point events to irregular, overlapping
  [start, end] intervals WITHOUT an equi-key. Both sides explode to
  coarse time buckets (native column math), pair on a bucket equi-join
  (ordinary hash shuffle), then the exact range predicate prunes in
  whole-stage codegen — same shape as the spatial grid join
  (operators/spatial_join.py), with bucket width as the explode/fan-in
  knob. A naive ``l.ts BETWEEN r.s AND r.e`` join has no equi-condition
  and degenerates to BroadcastNestedLoop at scale; this never does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_is_left"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    values: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join: each ``left`` row gains the ``values`` columns of
    the closest ``right`` row with ``right.on <= left.on`` (backward, the
    default) or ``>=`` (forward), matching on the ``by`` key columns.
    Unmatched left rows keep nulls (left-join semantics, same contract as
    DuckDB/pandas ASOF LEFT JOIN). Ties on ``on`` count as matches.

    ``tolerance_us``: optional max |left.on - right.on| in microseconds;
    matches farther than that revert to null.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by or [])
    if values is None:
        values = [c for c in right.columns if c != on and c not in by]
    out_cols = [f"{c}{suffix}" if c in left.columns else c for c in values]

    # Tag and union: right rows carry the payload struct, left rows null.
    payload = F.struct(F.col(on).alias("__on"), *[F.col(c).alias(c) for c in values])
    r = right.select(*by, F.col(on).alias(on), F.lit(False).alias(_MARK), payload.alias(_PAYLOAD))
    l_payload = F.lit(None).cast(r.schema[_PAYLOAD].dataType)
    l = left.select("*", F.lit(True).alias(_MARK), l_payload.alias(_PAYLOAD))
    l = l.select(*by, on, _MARK, _PAYLOAD, F.struct(*left.columns).alias("__row"))
    r = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType))
    merged = l.unionByName(r)

    # At equal `on`, right rows must precede left rows so ties match:
    # ascending marker (False < True) does that for backward; for forward
    # we scan time descending, and the same marker order keeps right
    # rows first within the tie.
    order: list[Column] = [F.col(on).asc() if direction == "backward" else F.col(on).desc()]
    order.append(F.col(_MARK).asc())
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = merged.withColumn("__match", F.last(_PAYLOAD, ignorenulls=True).over(w))

    result = carried.filter(F.col(_MARK)).select("__row.*", F.col("__match"))
    if tolerance_us is not None:
        gap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col("__match.__on")))
        result = result.withColumn(
            "__match", F.when(gap <= F.lit(int(tolerance_us)), F.col("__match"))
        )
    picked = [F.col(f"__match.{c}").alias(o) for c, o in zip(values, out_cols)]
    return result.select(*[F.col(c) for c in left.columns], *picked)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Pair each event with every interval whose [start, end] contains it
    (inclusive bounds). Intervals may overlap and need no shared key with
    the events. Returns events columns + intervals columns.

    ``bucket_s`` is the time-grid width (seconds): intervals explode to
    the buckets they touch (an interval spanning W seconds lands in
    ~W/bucket_s + 1 rows), events map to exactly one bucket, and the
    pair-up is an equi-join on the bucket id. Pick it near the median
    interval width — same tuning rule as the spatial grid cell.

    ``how="left"`` keeps unmatched events with null interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = [c for c in events.columns if c in intervals.columns]
    if overlap:
        raise ValueError(f"events/intervals column collision: {overlap}")

    # Distinct bucket names on each side: the two inputs may share lineage
    # (e.g. intervals derived from the same table), and a same-named
    # derived column would make the self-join condition ambiguous.
    bucket = F.lit(int(bucket_s) * 1_000_000)
    ev = events.withColumn("__ev_bucket", F.floor(F.unix_micros(F.col(ts_col)) / bucket))
    iv = intervals.withColumn(
        "__iv_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / bucket),
                F.floor(F.unix_micros(F.col(end_col)) / bucket),
            )
        ),
    )
    cond = (
        (F.col("__ev_bucket") == F.col("__iv_bucket"))
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    joined = ev.join(iv, cond, how)
    return joined.select(*events.columns, *intervals.columns)


def _gapfill_grid(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_col: str | None,
    unit: str,
) -> DataFrame:
    """Shared gap-fill scaffolding for both fill modes (LOCF and linear
    interpolation): bucket collapse (per-bucket survivor = greatest
    ``order_col``), per-key span aggregation, native ``sequence()`` grid
    over each key's observed lifetime, and the (key, bucket) left join.
    Returns the densified frame with ``_obs`` NULL in gap rows."""
    order = order_col or ts_col
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    obs = df.groupBy(*key_cols, bucket).agg(
        F.max_by(F.col(value_col), F.col(order)).alias("_obs")
    )
    spans = obs.groupBy(*key_cols).agg(
        F.min("bucket").alias("_first"), F.max("bucket").alias("_last")
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence("_first", "_last", F.expr(f"INTERVAL 1 {unit}"))
        ).alias("bucket"),
    )
    return grid.join(obs, [*key_cols, "bucket"], "left")


def resample_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
    unit: str = "hour",
) -> DataFrame:
    """Densify a sparse series to a regular ``unit`` grid per key, filling
    gaps by carrying the last observation forward (LOCF).

    The gap-fill operator of time-series stores (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``; the reference has no analog —
    SURVEY §2.7): monitoring-style queries need a row for every bucket
    even when nothing was observed. Semantics:

    - bucket = ``date_trunc(unit, ts)``; within a bucket the surviving
      observation is the one with the greatest ``order_col`` (default:
      the ts column itself — pass an id column to break timestamp ties
      deterministically);
    - each key's grid spans its own [first, last] observed bucket (no
      rows invented outside a key's lifetime);
    - buckets with no observation carry the most recent earlier value.

    Scale shape: one groupBy (bucket collapse), one per-key span
    aggregation whose grid explodes with native ``sequence()`` (rows
    proportional to output, never materialized on the driver), one
    shuffle join grid↔observations on (key, bucket), one window sort per
    key for the carry-forward. All narrow/native — no UDFs, no driver
    loops; each stage partitions on the key columns so a 100 TB series
    spreads by key.
    """
    joined = _gapfill_grid(df, key_cols, ts_col, value_col, order_col, unit)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "bucket",
        F.last("_obs", ignorenulls=True).over(w).alias(value_col),
        F.col("_obs").isNull().alias("filled"),
    )


def resample_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
    unit: str = "hour",
) -> DataFrame:
    """Densify a sparse series to a regular ``unit`` grid per key, filling
    gaps by LINEAR INTERPOLATION between the neighboring observations —
    the ``interpolate`` companion to :func:`resample_locf`'s LOCF (the
    other TimescaleDB ``time_bucket_gapfill`` fill mode; no reference
    analog — SURVEY §2.7).

    Bucketing and grid semantics are identical to :func:`resample_locf`
    (per-bucket survivor by greatest ``order_col``, each key's grid spans
    its own observed lifetime, so every gap is interior and always has
    both neighbors). The interpolation fraction is computed from BUCKET
    POSITIONS (row indexes on the regular grid), not from timestamp
    arithmetic — positions are exact small integers, so the float math
    is three IEEE ops in a fixed order and reproduces bit-for-bit across
    engines and timezones (no epoch/DST dependence).

    Scale shape: same as locf — bucket collapse, native sequence() grid,
    one (key, bucket) join — plus ONE window sort per key that feeds all
    four neighbor columns (Catalyst computes them in a single Window
    exec over one exchange).
    """
    joined = _gapfill_grid(df, key_cols, ts_col, value_col, order_col, unit)
    w_ord = Window.partitionBy(*key_cols).orderBy("bucket")
    w_back = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    idx = (F.row_number().over(w_ord) - 1).cast("bigint")
    with_idx = joined.withColumn("_i", idx)
    obs_i = F.when(F.col("_obs").isNotNull(), F.col("_i"))
    pv = F.last("_obs", ignorenulls=True).over(w_back)
    pi = F.last(obs_i, ignorenulls=True).over(w_back)
    nv = F.first("_obs", ignorenulls=True).over(w_fwd)
    ni = F.first(obs_i, ignorenulls=True).over(w_fwd)
    frac = (F.col("_i") - pi).cast("double") / (ni - pi).cast("double")
    interp = pv + (nv - pv) * frac
    return with_idx.select(
        *key_cols,
        "bucket",
        F.when(F.col("_obs").isNotNull(), F.col("_obs"))
        .when(pv.isNull() | nv.isNull(), F.lit(None).cast("double"))
        .otherwise(interp)
        .alias(value_col),
        F.col("_obs").isNull().alias("filled"),
    )


def interarrival_stats(
    events: DataFrame,
    key_cols: list[str] | str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key inter-arrival gap statistics: n_events, min/max/mean gap
    (seconds) between consecutive events.

    The session-analytics primitive (bot detection by too-regular gaps,
    churn by growing gaps, SLA by max gap). One window pass for the lag
    delta + one aggregation — both shuffle on the SAME key, so Catalyst
    reuses the exchange: one shuffle total at any scale.

    Determinism: gaps are computed on integer epoch microseconds with
    ``tiebreak_col`` breaking timestamp ties in the ordering, and the
    mean is a single integer-sum division — reproducible across
    engines and partitionings.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    micros = F.unix_micros(F.col(ts_col))
    gap = micros - F.lag(micros).over(w)
    with_gap = events.withColumn("_gap_us", gap)
    return (
        with_gap.groupBy(*key_cols)
        .agg(
            F.count("*").alias("n_events"),
            (F.min("_gap_us") / F.lit(1_000_000)).cast("double").alias("min_gap_s"),
            (F.max("_gap_us") / F.lit(1_000_000)).cast("double").alias("max_gap_s"),
            (
                (F.sum("_gap_us") / F.count("_gap_us")) / F.lit(1_000_000)
            ).cast("double").alias("mean_gap_s"),
        )
    )
