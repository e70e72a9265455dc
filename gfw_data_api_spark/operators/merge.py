"""Keyed merge / upsert (SCD-1 latest-wins) operator.

The batch analog of ``INSERT ... ON CONFLICT (key) DO UPDATE`` — the
reference's tabular loader relies on exactly that Postgres path for
re-runs of a load job (batch/scripts/load_tabular_data.sh writes through
psql COPY into a table whose unique index resolves collisions;
app/tasks/table_source_assets.py:229- wires the unique constraint).
Spark has no in-place update, so the operator expresses the merge as a
declarative latest-wins reduction over ``base ∪ updates``.

Scale shape: ONE shuffle on the merge keys (the window partition);
both inputs stream through a single sort-based window — no driver
collect, no join. At 100 TB: bucket both sides on the keys so the
exchange disappears (bucketed scan feeds the window sort directly), and
AQE skew-split handles hot keys. A Delta-style MERGE would instead
rewrite whole files; the window form is the engine-neutral core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# internal column names namespaced to avoid colliding with user schemas
_PRI = "__merge_pri"
_RN = "__merge_rn"


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str] | str,
    order_by: str | None = None,
) -> DataFrame:
    """Return ``base`` with same-key rows replaced by ``updates`` rows.

    - ``keys``: merge key column(s); a key present only in ``updates`` is an
      insert, only in ``base`` a carry-over, in both → the update wins.
    - ``order_by``: optional version/timestamp column; among rows sharing a
      key the highest ``order_by`` wins, with ``updates`` beating ``base``
      on exact ties. Without it, source priority alone decides.

    NULL ``order_by`` policy (explicit — don't rely on engine NULL sort
    defaults): a NULL version means "no version information", so such a
    row loses to ANY versioned row for the same key, from either source
    (``desc_nulls_last``); when all rows for a key are NULL-versioned,
    the NULLs tie and source priority decides — an unversioned update
    still beats an unversioned base row.

    ``updates`` should hold at most one row per key per ``order_by`` value;
    otherwise the survivor among those exact duplicates is unspecified
    (same contract as Delta MERGE's "multiple source rows matched" error,
    relaxed to last-writer-wins).
    """
    if isinstance(keys, str):
        keys = [keys]
    merged = base.withColumn(_PRI, F.lit(0)).unionByName(
        updates.withColumn(_PRI, F.lit(1))
    )
    ordering = [F.col(order_by).desc_nulls_last()] if order_by else []
    ordering.append(F.col(_PRI).desc())
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        merged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN, _PRI)
    )
