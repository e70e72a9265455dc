"""Stream-static enrichment join.

The canonical streaming-ETL shape: a high-rate fact stream joined to a
small, slowly-changing dimension (event type → category, user → account
tier). Spark supports joining a streaming DataFrame to a static one
without any state store — each micro-batch joins against the current
static snapshot — and the broadcast hint keeps it shuffle-free: the
stream side never moves, the dimension ships to every task.

The identical code path works on a batch DataFrame (the driver's
``events`` table), which is the oracle-checkable twin; the streaming
equivalence is asserted in tests with a real ``readStream`` source.

Scale shape: zero shuffle on the stream/fact side (broadcast hash join),
dimension size bounded by the broadcast threshold. For dimensions too
large to broadcast, pre-bucket both sides on the key — but at that point
the dimension is not a dimension anymore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Join ``facts`` (streaming or batch) to the static ``dim`` on ``keys``.

    The dimension is explicitly broadcast: the fact side — unbounded in
    streaming, the 100 TB side in batch — never shuffles. ``how`` follows
    Spark's stream-static join support (inner/left for a streaming left
    side).
    """
    if isinstance(keys, str):
        keys = [keys]
    return facts.join(F.broadcast(dim), on=keys, how=how)
