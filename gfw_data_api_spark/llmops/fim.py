"""Fill-in-the-middle (FIM) training-data transformation.

Infilling-capable models (code models especially) train on documents
rearranged PSM-style — ``<PRE> prefix <SUF> suffix <MID> middle`` —
so the model learns to generate the middle conditioned on both sides
(Bavarian et al. 2022, "Efficient Training of Language Models to Fill
in the Middle"; the OpenAI FIM recipe, also used by StarCoder /
Code Llama). The transformation itself is trivial string surgery; what
matters at corpus scale is that it is DETERMINISTIC (reproducible
shuffles/resumes) and map-only.

Spark-first shape: the two split points and the apply/skip decision
derive from the repo's one canonical portable 60-bit md5 hash
(llmops/sampling.py), so the same document always splits the same way
on any engine — the t25 gate replays the whole transform
(selection, cut points, reassembly) in DuckDB — and the entire pass is
one projection: zero shuffles, zero Python, zero UDFs.

Character positions are Unicode codepoints (Spark ``substring`` /
``length`` semantics, matching DuckDB's ``substr`` / ``length``), so
multibyte text never splits mid-codepoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.sampling import _portable_hash60, hash_bucket


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate_pct: int = 50,
    seed: int = 0,
    pre: str = "<PRE>",
    suf: str = "<SUF>",
    mid: str = "<MID>",
) -> DataFrame:
    """Append ``fim_applied`` and ``fim_text`` to ``df``.

    A deterministic ``rate_pct``% of documents (canonical-hash
    selection on ``id_col``) are rearranged PSM:
    ``pre + text[:lo] + suf + text[hi:] + mid + text[lo:hi]`` with
    ``lo ≤ hi`` two hash-derived codepoint offsets in ``[0, len]``;
    the rest pass through unchanged (``fim_text = text``), matching
    the paper's recommendation to mix FIM and plain left-to-right
    documents in one corpus.
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    ids = F.col(id_col).cast("string")
    n = F.length(text_col)
    cut1 = F.pmod(_portable_hash60(F.concat(ids, F.lit(":1")), seed), n + 1)
    cut2 = F.pmod(_portable_hash60(F.concat(ids, F.lit(":2")), seed), n + 1)
    lo = F.least(cut1, cut2)
    hi = F.greatest(cut1, cut2)
    selected = hash_bucket(F.concat(ids, F.lit(":fim")), seed, 100) < rate_pct
    psm = F.concat(
        F.lit(pre),
        F.substring(F.col(text_col), 1, lo),
        F.lit(suf),
        F.substring(F.col(text_col), hi + 1, n - hi),
        F.lit(mid),
        F.substring(F.col(text_col), lo + 1, hi - lo),
    )
    return df.withColumn("fim_applied", selected).withColumn(
        "fim_text", F.when(selected, psm).otherwise(F.col(text_col))
    )
