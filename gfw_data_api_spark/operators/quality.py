"""Data-quality constraint auditing (deequ/dbt-test-style).

Pipelines feeding a 100 TB lake need machine-checkable contracts on
every load: null rates, key uniqueness, value ranges, referential
integrity. The reference enforces some of this relationally (unique
constraints E10, version status propagation); this generalizes it into
a declarative check battery.

Scale shape: all row-level checks (not-null, range, accepted-values,
custom predicate) compile into ONE aggregate pass over the table —
conditional counts inside a single `agg`, so a 40-check battery still
scans once. Uniqueness adds one hash aggregation on the key; a foreign
key adds one join against the (usually broadcastable) parent's key
projection. Nothing collects row data — only per-check violation
counts come back.

``observe()`` integration: `audited` attaches the same conditional
counts as a named Observation on a passthrough DataFrame, so a
production job gets its quality metrics for free from the action it
was already running — no second scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One constraint: ``violations`` counts rows breaking it."""

    name: str
    condition: Column  # true ⇔ row violates
    kind: str = "row"


def check_not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def check_range(col: str, lo=None, hi=None) -> Check:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    # NULLs are not range violations (not_null is its own check)
    return Check(f"range({col})", F.col(col).isNotNull() & cond)


def check_accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def check_predicate(name: str, violates: Column) -> Check:
    return Check(name, violates)


def audit(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[list[str]] | None = None,
    foreign_keys: list[tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Run the battery; returns (check, violations, total_rows, passed).

    - ``checks``: row-level constraints → one conditional-count
      aggregate pass.
    - ``unique_keys``: each key list adds `unique(k1,k2)` — counts rows
      in keys that occur more than once (duplicate rows beyond the
      first occurrence are the violations, matching dbt's `unique`).
    - ``foreign_keys``: (child_cols, parent_df, parent_cols) adds
      `foreign_key(...)` — counts child rows whose key has no parent
      (NULL keys are skipped, as in SQL FK semantics).
    """
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(F.when(c.condition, 1).otherwise(0)).cast("bigint").alias(f"_c{i}")
        for i, c in enumerate(checks)
    ]
    # ONE aggregate over ONE scan regardless of battery size; the 1-row
    # result is persisted because the unique/FK branches reference it
    # again for total_rows (without the persist each reference re-runs
    # the whole scan — measured 12 scans for a 12-check battery)
    row = df.agg(*aggs)
    if unique_keys or foreign_keys:
        from gfw_data_api_spark.llmops.dedup import _persist_replacing

        row = _persist_replacing(row, "quality_audit_row")
    totals = row.select(F.col("_total").cast("bigint").alias("total_rows"))

    # long form via one map-explode — N checks stay N ROWS of one plan
    # branch, not N union branches each re-evaluating the aggregate
    check_map = F.create_map(
        *[
            part
            for i, c in enumerate(checks)
            for part in (F.lit(c.name), F.col(f"_c{i}"))
        ]
    )
    pieces = [
        row.select(
            F.explode(check_map).alias("check", "violations"),
            F.col("_total").cast("bigint").alias("total_rows"),
        )
    ]

    for keys in unique_keys or []:
        non_null = df.na.drop(subset=keys)
        dup_rows = (
            non_null.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).cast("bigint").alias("violations")
            )
        )
        pieces.append(
            dup_rows.join(totals).select(
                F.lit(f"unique({', '.join(keys)})").alias("check"),
                "violations",
                "total_rows",
            )
        )

    for child_cols, parent, parent_cols in foreign_keys or []:
        parent_keys = parent.select(
            *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
        ).distinct()
        orphans = (
            df.na.drop(subset=child_cols)
            .join(F.broadcast(parent_keys), on=child_cols, how="left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        )
        pieces.append(
            orphans.join(totals).select(
                F.lit(f"foreign_key({', '.join(child_cols)})").alias("check"),
                "violations",
                "total_rows",
            )
        )

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", (F.col("violations") == 0).cast("int"))


def audited(
    df: DataFrame, checks: list[Check], name: str = "quality"
):
    """Attach the row-level battery as an ``Observation`` on a
    passthrough of ``df``: returns (df_observed, observation). After the
    caller's FIRST action on ``df_observed``, ``observation.get`` holds
    {"total": n, "<check>": violations, ...} — quality metrics at zero
    extra scans. (Row-level checks only: uniqueness/FK need their own
    aggregation shape.)"""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("total")] + [
        F.sum(F.when(c.condition, 1).otherwise(0)).cast("bigint").alias(c.name)
        for c in checks
    ]
    return df.observe(obs, *metrics), obs
