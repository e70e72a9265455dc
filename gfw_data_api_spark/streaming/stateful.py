"""Custom stateful streaming operator: first-occurrence dedup.

The reference's NRT append path dedups by unique-constraint anti-join per
batch file (SURVEY §1.4, load_tabular_data.sh ON CONFLICT DO NOTHING).
The streaming-native upgrade is keyed state: remember which keys have
been seen and emit only each key's first event — the
``applyInPandasWithState`` pattern the built-in operators can't express
(the emitted row depends on per-key history, not a window).

``first_occurrence`` dispatches: on a batch DataFrame it is the
closed-form window (row_number = 1 by event time); on a streaming
DataFrame it runs the stateful operator, whose per-key state is ONE
boolean — bounded regardless of stream length, the property that makes
it safe on an unbounded source. Batch/stream results agree whenever
arrival order respects event order per key (one availableNow batch, or
an ordered source); that equivalence is what the tests assert.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_occurrence(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Keep each key's earliest event (ties broken by ``tiebreak_col``)."""
    if not df.isStreaming:
        w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    columns = df.columns

    def dedup(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values([ts_col, tiebreak_col]).head(1)
            if best is None or (
                (cand.iloc[0][ts_col], cand.iloc[0][tiebreak_col])
                < (best.iloc[0][ts_col], best.iloc[0][tiebreak_col])
            ):
                best = cand
        if best is not None:
            state.update((True,))
            yield best[columns]

    return df.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
