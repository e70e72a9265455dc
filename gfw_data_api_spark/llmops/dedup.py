"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the point of running these on Spark at all):

- Everything pre-verification is native column math / higher-order
  functions: shingling, MinHash signatures, banding, SimHash bit packing
  all run in whole-stage codegen. xxhash64 with per-function salt gives
  the hash family.
- Candidate generation is the standard band-bucket shuffle: explode B
  band keys per doc → groupBy band key. At 100 TB that is B small rows
  per doc, shuffled once on a high-cardinality key (no skew: bucket keys
  are hashes).
- Pair verification joins only within buckets — quadratic work is bounded
  per bucket, never global.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.text import tokens_col

# One persisted intermediate per operator family PER THREAD, replaced on
# the next call: the signature/shingle indexes feed 3-4 plan branches
# (persist measured ~1.7× faster than recompute; exchange reuse does not
# cover the replicated aggregate), but an unscoped persist() would pin
# one table per CALL for the session's lifetime. Bounded instead: at
# most one pinned table per (thread, slot), the previous one unpersisted
# lazily (an uncollected earlier result simply recomputes). Keying by
# thread id matters because the API spawns datamart compute threads on
# the SAME SparkSession — without it, two concurrent pipelines in the
# same family would unpersist each other's in-flight intermediates
# (forced recomputes + racing dict mutation); the lock covers the
# remaining dict/unpersist races (advice r3).
_PERSIST_SLOTS: dict[tuple[int, str], DataFrame] = {}
_PERSIST_LOCK = threading.Lock()


def _persist_replacing(df: DataFrame, slot: str) -> DataFrame:
    key = (threading.get_ident(), slot)
    with _PERSIST_LOCK:
        prev = _PERSIST_SLOTS.pop(key, None)
        # evict slots owned by DEAD threads: the API spawns short-lived
        # datamart/job threads, and without this sweep each one would
        # leave a permanently pinned table behind (the unscoped-persist
        # problem the slot design exists to bound)
        alive = {t.ident for t in threading.enumerate()}
        stale = [k for k in _PERSIST_SLOTS if k[0] not in alive]
        dead = [_PERSIST_SLOTS.pop(k) for k in stale]
        _PERSIST_SLOTS[key] = df.persist()
    if prev is not None:
        prev.unpersist()
    for d in dead:
        d.unpersist()
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: keep the smallest id per md5(text).

    One hash-shuffle; at scale this is the cheapest possible dedup and the
    reason it's the first pass before any near-dup method.
    """
    return (
        df.withColumn("_h", F.md5(F.col(text_col)))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("copies"))
        .drop("_h")
    )


def exact_substring_dedup(
    df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document exact-substring dedup at ARBITRARY alignment (Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — the ExactSubstr pass, re-expressed Spark-first).

    Every sliding ``window``-token sequence is a unit: a sequence that
    occurs at more than one (doc, position) keeps its GLOBAL first
    occurrence (smallest ``(doc_id, position)``) and every other
    occurrence's tokens are cut; documents are reassembled from the
    surviving tokens in order. Because windows slide at stride 1, a
    shared run of ANY length ≥ window is removed in full from the
    non-keeper documents while the keeper document is untouched (its
    windows are all keepers of their own sequences) — the suffix-array
    semantics of the paper without the suffix array.

    Distinct from :func:`repeated_segment_removal` (corpus-frequency
    filter over ALIGNED non-overlapping segments, drops every copy) and
    :func:`paragraph_dedup` (separator-delimited units).

    Scale shape: windows are hashed map-side (``xxhash64``, 8 bytes)
    so the duplicate-detection shuffle moves hashes, never window
    text; only duplicated hashes join back. Reassembly never shuffles
    tokens: duplicate window POSITIONS (ints, only docs that lost
    something) aggregate to one per-doc array, and the cut is pure
    per-doc array math — ``array_except(sequence(0, n-1), removed)``
    then ``element_at`` — so the second shuffle is per-DOC rows, not
    per-token rows. No Python anywhere.

    Returns ``(id_col, n_tokens_before, n_tokens_after, text_dedup)``.
    """
    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    toks = _persist_replacing(toks, "essd_toks")
    # (doc, pos, hash) for every sliding window; pos is 0-based
    wins = toks.filter(F.col("_n") >= window).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_n") - window),
                lambda i: F.xxhash64(F.array_join(F.slice("_t", i + 1, window), "\x1f")),
            )
        ).alias("_pos", "_wh"),
    )
    wins = _persist_replacing(wins, "essd_wins")
    seqs = wins.groupBy("_wh").agg(
        F.count("*").alias("_c"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("_pos").alias("p"))).alias("_keep"),
    )
    dup_wins = (
        wins.join(seqs.filter(F.col("_c") > 1), "_wh")
        .filter(
            ~((F.col(id_col) == F.col("_keep.d")) & (F.col("_pos") == F.col("_keep.p")))
        )
        .select(id_col, "_pos")
    )
    # one row per doc that lost windows, carrying the duplicate window
    # positions; the removed token-index SET is per-doc array math
    # (bounded by doc length), never an exploded per-token relation
    removed = dup_wins.groupBy(id_col).agg(F.collect_list("_pos").alias("_ps"))
    rm_idx = F.array_distinct(
        F.flatten(F.transform("_ps", lambda p: F.sequence(p, p + window - 1)))
    )
    kept = F.when(F.col("_ps").isNull(), F.col("_t")).otherwise(
        F.transform(
            F.array_except(F.sequence(F.lit(0), F.col("_n") - 1), rm_idx),
            lambda i: F.element_at(F.col("_t"), i + 1),
        )
    )
    # left join from the full doc list: a document whose every token was
    # cut still gets a row (empty, zero tokens) instead of vanishing
    return toks.join(removed, id_col, "left").select(
        id_col,
        F.col("_n").cast("bigint").alias("n_tokens_before"),
        F.size(kept).cast("bigint").alias("n_tokens_after"),
        F.array_join(kept, " ").alias("text_dedup"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Cross-document paragraph-level dedup (the Dolma/RefinedWeb pass):
    split every document on ``sep``, keep only the GLOBAL first occurrence
    of each repeated paragraph (first = smallest ``(id, position)``), and
    reassemble documents from their surviving paragraphs in original order.

    Paragraphs shorter than ``min_chars`` are exempt (kept everywhere) —
    with the default 1 this preserves empty lines, and raising it mirrors
    the published pipelines' length floor. Exemption also kills the skew
    hazard: the hottest paragraph keys in a crawl are the trivial ones.

    Scale shape: one explode (map-side), one hash aggregation on the
    paragraph key (``min(struct(id, pos))`` — partial-aggregatable, so
    map-side combine collapses hot keys BEFORE the shuffle, unlike a
    window over the key which would sort every copy in one partition),
    one join back on the key (AQE skew-split applies), and one final
    aggregation by document id to reassemble. No Python anywhere.

    Returns (id_col, text_col, n_paras_kept, n_paras_dropped).
    """
    if min_chars < 0:
        raise ValueError(f"min_chars must be >= 0, got {min_chars}")
    import re as _re

    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias("_pos", "_para"),
    )
    eligible = F.length("_para") >= min_chars
    keepers = (
        paras.filter(eligible)
        .groupBy("_para")
        .agg(F.min(F.struct("_id", "_pos")).alias("_keeper"))
    )
    kept = paras.join(keepers, "_para", "left").filter(
        ~eligible | (F.struct("_id", "_pos") == F.col("_keeper"))
    )
    out = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                    lambda x: x.getField("_para"),
                ),
                sep,
            ).alias(text_col),
            F.count("*").alias("n_paras_kept"),
        )
        .withColumnRenamed("_id", id_col)
    )
    # NULL text stays NULL with zero counts (posexplode of NULL emits no
    # rows, so such docs never enter the dedup at all — preserve that)
    totals = df.select(
        F.col(id_col).alias(id_col),
        F.col(text_col).isNull().alias("_was_null"),
        F.coalesce(
            F.size(F.split(F.col(text_col), _re.escape(sep), -1)), F.lit(0)
        ).alias("_n_total"),
    )
    return (
        totals.join(out, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_was_null"), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col(text_col), F.lit("")))
            .alias(text_col),
            F.coalesce("n_paras_kept", F.lit(0)).alias("n_paras_kept"),
            (F.col("_n_total") - F.coalesce("n_paras_kept", F.lit(0))).alias(
                "n_paras_dropped"
            ),
        )
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles as an array column (native sliding window)."""
    toks = tokens_col(text)
    count = F.size(toks) - F.lit(n - 1)
    # guard: F.sequence(1, 0) would generate a DESCENDING [1, 0], so short
    # documents must short-circuit to an empty shingle set
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures as ``(_id, _sig array<bigint>)``.

    Formulation matters at scale: explode shingles once, hash each shingle
    string once, then ``num_hashes`` static ``min(xxhash64(h, i))``
    aggregations with map-side partial aggregation — one shuffle on the doc
    id. (A nested higher-order-function version re-evaluates the shingle
    expression per hash function: measured ~60× slower.) Documents with no
    shingles disappear (no rows to aggregate), so they never collide."""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), shingle_n))).alias("_s"),
    ).withColumn("_h", F.xxhash64("_s"))
    # F.expr strings: one py4j call per aggregate (see simhash note)
    aggs = [F.expr(f"min(xxhash64(_h, {i})) AS _m{i}") for i in range(num_hashes)]
    sig = F.expr("array(" + ", ".join(f"_m{i}" for i in range(num_hashes)) + ") AS _sig")
    return ex.groupBy("_id").agg(*aggs).select("_id", sig)


def minhash_band_buckets(
    sig: DataFrame, num_hashes: int = 64, bands: int = 16, portable: bool = False
) -> DataFrame:
    """(_id, _band, _bucket) LSH band keys from a signature table.

    Factored out so the banded index can be PERSISTED as dedup state and
    probed incrementally (llmops/incremental.py): at scale the bucket
    table, partitioned by (_band, _bucket), is the thing you keep
    between pipeline runs — not the raw corpus.

    ``portable=True`` keeps the bucket key as the comma-joined band
    slice itself (reproducible in any engine, for the oracle family);
    the default compresses it through xxhash64 (narrower shuffle key).
    """
    rows_per_band = num_hashes // bands

    def band_key(b):
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
        )
        return joined if portable else F.xxhash64(joined)

    return sig.select(
        "_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("_band", "_bucket"),
    )


def _banded_candidate_pairs(banded: DataFrame) -> DataFrame:
    """Distinct (id_a, id_b) pairs sharing ≥1 band bucket."""
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def _signature_agreement(pairs: DataFrame, sig: DataFrame, num_hashes: int) -> DataFrame:
    """Attach est_jaccard = fraction of agreeing signature positions."""
    return (
        pairs.join(sig.withColumnRenamed("_id", "id_a").withColumnRenamed("_sig", "_sig_a"), "id_a")
        .join(sig.withColumnRenamed("_id", "id_b").withColumnRenamed("_sig", "_sig_b"), "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y), lambda v: v))
            / F.lit(float(num_hashes)),
        )
        .select("id_a", "id_b", F.col("est_jaccard").cast("double"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash.

    Returns (id_a, id_b, est_jaccard) for pairs sharing ≥1 band bucket,
    with the signature-estimated Jaccard for thresholding. ``bands``
    divides ``num_hashes``; rows-per-band r = H/B sets the S-curve.
    """
    sig = _persist_replacing(
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_n),
        "minhash_sig",
    )
    pairs = _banded_candidate_pairs(minhash_band_buckets(sig, num_hashes, bands))
    return _signature_agreement(pairs, sig, num_hashes)


# portable MinHash: universal hashing over a Mersenne-ish prime small
# enough that a*h + b stays inside BIGINT in ANY engine (31-bit h,
# products < 2^62). Constants derive from the hash index with Knuth's
# multiplicative constant so both engines can inline identical literals.
_PORTABLE_P = (1 << 31) - 1


def portable_hash_params(num_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) affine coefficients for the portable MinHash family."""
    params = []
    for i in range(num_hashes):
        a = (i * 2654435761 + 1) % _PORTABLE_P
        if a == 0:
            a = 1
        b = (i * 40503 + 7) % _PORTABLE_P
        params.append((a, b))
    return params


def minhash_signatures_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures whose every step reproduces bit-identically in
    an external engine: base shingle hash = md5's first 60 bits mod
    2³¹−1 (the portable construction llmops/sampling.hash_bucket uses),
    then ``num_hashes`` affine permutations ``(a_i·h + b_i) mod 2³¹−1``
    — the textbook universal-hash MinHash family. Same one-shuffle
    static-aggregate plan shape as :func:`minhash_signatures`; the
    xxhash64 variant stays the throughput default (one native hash call
    vs md5-hex string math), this one buys a full DuckDB oracle for the
    d04 gate."""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), shingle_n))).alias("_s"),
    ).withColumn(
        "_h",
        F.pmod(
            F.conv(F.substring(F.md5("_s"), 1, 15), 16, 10).cast("bigint"),
            F.lit(_PORTABLE_P),
        ),
    )
    aggs = [
        F.expr(f"min(({a}L * _h + {b}L) % {_PORTABLE_P}L) AS _m{i}")
        for i, (a, b) in enumerate(portable_hash_params(num_hashes))
    ]
    sig = F.expr("array(" + ", ".join(f"_m{i}" for i in range(num_hashes)) + ") AS _sig")
    return ex.groupBy("_id").agg(*aggs).select("_id", sig)


def minhash_lsh_candidates_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded-MinHash candidates on the portable signature family.

    Band bucket keys are the comma-joined band slice itself (no
    engine-specific bucket hash), so the whole pipeline — signatures,
    banding, pair join, est_jaccard — is reproducible externally. The
    banding/join/estimate machinery is SHARED with
    :func:`minhash_lsh_candidates` (only the signature family and the
    bucket-key encoding differ), so the two variants cannot drift.
    """
    sig = _persist_replacing(
        minhash_signatures_portable(df, text_col, id_col, num_hashes, shingle_n),
        "minhash_sig_portable",
    )
    pairs = _banded_candidate_pairs(
        minhash_band_buckets(sig, num_hashes, bands, portable=True)
    )
    return _signature_agreement(pairs, sig, num_hashes)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_frequency: int | None = 5000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle index.

    explode(shingles) → self-join per shingle → |A∩B| per pair →
    |A∪B| = |A|+|B|−|A∩B|. The join key is the shingle
    hash (high cardinality, no skew); work is proportional to true
    overlap, the standard exact alternative to MinHash at moderate
    shingle counts.

    ``max_doc_frequency`` bounds the self-join: a shingle appearing in n
    documents contributes n(n−1)/2 join rows, so one common phrase in a
    corpus-scale dataset goes quadratic. Shingles with document
    frequency above the cap are dropped from BOTH the intersection and
    the union (they rank documents the way stopwords rank text — not at
    all), making the result the exact Jaccard over the ≤cap-df shingle
    vocabulary. ``None`` disables the cap (true exact Jaccard; only safe
    when no shingle is hot).
    """
    sh = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(shingles_col(F.col(text_col), shingle_n))).alias("_s"),
        )
        .withColumn("_s", F.xxhash64("_s"))
    )
    sh = _persist_replacing(sh, "jaccard_sh")  # feeds df-cap scan + sizes + both join sides
    if max_doc_frequency is not None:
        # The hot set is small by construction (few shingles exceed a
        # corpus-scale df cap — they are the stopword phrases), so resolve
        # it once from the persisted index and push it down as a map-side
        # filter: the usual empty case costs nothing in the downstream
        # plans, and the explode is never recomputed.
        hot_df = (
            sh.groupBy("_s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_doc_frequency)
            .select("_s")
        )
        hot = [r["_s"] for r in hot_df.limit(10_001).collect()]
        if len(hot) > 10_000:
            # degenerate corpus (huge hot vocabulary): keep it distributed
            sh = sh.join(F.broadcast(hot_df), "_s", "left_anti")
        elif hot:
            sh = sh.filter(~F.col("_s").isin(hot))
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("_shared"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn("jaccard", (F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared"))).cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ppjoin_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via PPJoin prefix filtering (Xiao et
    al., WWW 2008) — the scale upgrade of :func:`ngram_jaccard_pairs`.

    The inverted-index join there touches EVERY shared shingle (df-cap
    required to stay sub-quadratic, trading exactness on hot phrases).
    PPJoin keeps exactness AND boundedness: order shingles globally by
    ascending document frequency, keep only each document's
    ``n − ceil(t·n) + 1`` RAREST shingles (the prefix), and join on
    prefix shingles alone — any pair with Jaccard ≥ t provably shares a
    prefix shingle, and prefixes are dominated by rare shingles, so hot
    phrases never drive the join. Candidates are then verified with an
    exact native ``array_intersect`` against each document's full
    shingle set (bounded by document length).

    Shape at scale: one persisted shingle explode (index + sizes +
    sets + doc-frequency all read it), a per-doc window (PARTITIONED by
    doc — no global sort), a prefix-only bucket join, and a
    candidates×2 set join. No tuning knob, no approximation.
    """
    from pyspark.sql import Window

    sh = _persist_replacing(
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array_distinct(shingles_col(F.col(text_col), shingle_n))
            ).alias("_s"),
        ).withColumn("_s", F.xxhash64("_s")),
        "ppjoin_sh",
    )
    dfreq = sh.groupBy("_s").agg(F.count("*").alias("_df"))
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_s"))
    prefix = (
        sh.join(dfreq, "_s")
        .withColumn("_rn", F.row_number().over(w))
        .join(sizes, "_id")
        .filter(
            F.col("_rn")
            <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + F.lit(1)
        )
        .select("_id", "_s")
    )
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sets = sh.groupBy("_id").agg(F.collect_list("_s").alias("_set"))
    verified = (
        cands.join(
            sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("_sa")), "id_a"
        )
        .join(
            sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("_sb")), "id_b"
        )
        .withColumn("_shared", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            (
                F.col("_shared")
                / (F.size("_sa") + F.size("_sb") - F.col("_shared"))
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_doc_frequency: int | None = 5000,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: |A∩B| / min(|A|, |B|).

    Jaccard misses asymmetric duplication — a tweet-sized document fully
    quoted inside a long article has tiny Jaccard but containment 1.0.
    Containment over the smaller side is the standard detector for
    quote/subset/expansion relationships (Broder's resemblance vs
    containment distinction). Same inverted-index plan shape as
    :func:`ngram_jaccard_pairs` — shingle-hash join key, pair work
    proportional to true overlap, df-capped against hot phrases — with
    the union denominator swapped for ``min(|A|, |B|)`` and both
    directional containments emitted for diagnosis.
    """
    sh = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(shingles_col(F.col(text_col), shingle_n))).alias("_s"),
        )
        .withColumn("_s", F.xxhash64("_s"))
    )
    sh = _persist_replacing(sh, "containment_sh")
    if max_doc_frequency is not None:
        hot_df = (
            sh.groupBy("_s")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_doc_frequency)
            .select("_s")
        )
        hot = [r["_s"] for r in hot_df.limit(10_001).collect()]
        if len(hot) > 10_000:
            sh = sh.join(F.broadcast(hot_df), "_s", "left_anti")
        elif hot:
            sh = sh.filter(~F.col("_s").isin(hot))
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("_shared"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn(
            "containment",
            (F.col("_shared") / F.least(F.col("_na"), F.col("_nb"))).cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            "containment",
            (F.col("_shared") / F.col("_na")).cast("double").alias("containment_a"),
            (F.col("_shared") / F.col("_nb")).cast("double").alias("containment_b"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    use_md5: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    k-gram rolling hashes, then the minimum hash of every ``window`` of
    consecutive k-grams; the distinct set of window-minima fingerprints
    the document, guaranteeing shared substrings of length ≥ k+window-1
    produce a shared fingerprint.

    ZERO-shuffle shape: the rolling window min and the per-doc distinct
    never need state from another row, so both compute map-side — the
    k-gram hashes as one ``transform`` (materialized once per row so the
    sliding mins read an attribute, not a re-evaluated hash), each
    position's min as ``array_min(slice(...))`` (slice truncates at the
    end exactly like the old ROWS BETWEEN CURRENT AND window-1 FOLLOWING
    frame), and the dedup as ``array_distinct`` before the single output
    explode. Replaces the explode → per-doc window → distinct plan (two
    exchanges over the full gram table; each input row is one document,
    the per-doc operator convention).
    """
    if use_md5:
        # md5-derived 60-bit hash: slower than xxhash64 but computable in
        # external engines too (used by the DuckDB oracle pair)
        gram_hash = lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(  # noqa: E731
            "bigint"
        )
    else:
        gram_hash = lambda g: F.xxhash64(g)  # noqa: E731 — HOF needs 1-arg fn
    hashes = F.transform(shingles_col(F.col(text_col), k), gram_hash)
    base = df.select(F.col(id_col).alias("_id"), hashes.alias("_h"))
    mins = F.transform(
        F.col("_h"),
        lambda x, i: F.array_min(F.slice(F.col("_h"), i + F.lit(1), F.lit(window))),
    )
    return base.select(
        F.col("_id").alias(id_col),
        F.explode(F.array_distinct(mins)).alias("fingerprint"),
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash per document: explode tokens, per bit b sum ±1 by the
    token-hash's bit b, pack the sign vector into one bigint.

    One explode + one groupBy(id) with ``bits`` static sum aggregations —
    map-side partial aggregation makes this a single cheap shuffle on the
    doc id regardless of document length.
    """
    tok = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens_col(F.col(text_col))).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    # sum of ±1 per bit ≡ 2·(count of ones) − n: sum the raw bit — no
    # conditional inside the 64 hot aggregate expressions — and recover
    # the majority sign against n/2 when packing. The expressions are
    # F.expr STRINGS, not Column-method chains: building 64×~5 Column ops
    # through py4j costs more wall-clock than executing the query at
    # moderate scale (measured ~1.4 s of pure plan construction per call).
    aggs = [F.expr(f"sum(shiftright(_h, {b}) & 1) AS _b{b}") for b in range(bits)]
    aggs.append(F.expr("count(*) AS _n"))
    counts = tok.groupBy("_id").agg(*aggs)
    # shiftleft(1L, 63) wraps to the two's-complement top bit natively
    packed = " ^ ".join(
        f"IF(_b{b} * 2 > _n, shiftleft(1L, {b}), 0L)" for b in range(bits)
    )
    return counts.select(
        F.col("_id").alias(id_col), F.expr(packed).alias("simhash")
    )


def simhash_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash on the portable md5 base hash (cf.
    minhash_signatures_portable): identical one-shuffle static-aggregate
    plan as :func:`simhash`, but every step — token hash, per-bit
    majority, packing — reproduces bit-identically in an external
    engine, buying the d05 gate a full oracle. 60 bits because md5's
    first 15 hex chars convert losslessly into a positive BIGINT in any
    engine (no two's-complement top-bit games)."""
    bits = 60
    tok = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens_col(F.col(text_col))).alias("_t")
    ).withColumn(
        "_h", F.conv(F.substring(F.md5("_t"), 1, 15), 16, 10).cast("bigint")
    )
    aggs = [F.expr(f"sum(shiftright(_h, {b}) & 1) AS _b{b}") for b in range(bits)]
    aggs.append(F.expr("count(*) AS _n"))
    counts = tok.groupBy("_id").agg(*aggs)
    packed = " + ".join(
        f"IF(_b{b} * 2 > _n, shiftleft(1L, {b}), 0L)" for b in range(bits)
    )
    return counts.select(
        F.col("_id").alias(id_col), F.expr(packed).alias("simhash")
    )


def _simhash_banded_pairs(
    sim: DataFrame, total_bits: int, bands: int, max_hamming: int
) -> DataFrame:
    """Shared pigeonhole machinery for both SimHash families: band the
    fingerprint into ``bands`` equal chunks (hamming ≤ bands−1 ⇒ some
    chunk equal), bucket-join, verify exact Hamming via bit_count."""
    width = total_bits // bands
    chunk_cols = [
        F.shiftrightunsigned(F.col("_sh"), b * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"_c{b}")
        for b in range(bands)
    ]
    banded = sim.select("_id", "_sh", F.posexplode(F.array(*chunk_cols)).alias("_band", "_chunk"))
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._chunk") == F.col("b._chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("_sha"),
            F.col("b._sh").alias("_shb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_sha").bitwiseXOR(F.col("_shb")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_dups_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Banded near-dup pairs on the portable 60-bit SimHash — the
    band/verify machinery is shared with :func:`simhash_near_dups`
    (15-bit chunks with the default 4 bands)."""
    sim = simhash_portable(df, text_col, id_col).select(
        F.col(id_col).alias("_id"), F.col("simhash").alias("_sh")
    )
    return _simhash_banded_pairs(sim, 60, bands, max_hamming)


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit hash into ``bands``
    chunks (pigeonhole: hamming ≤ bands−1 ⇒ some chunk equal),
    bucket-join, then verify the exact Hamming distance via bit_count
    (machinery shared with the portable family)."""
    sim = simhash(df, text_col, id_col).select(
        F.col(id_col).alias("_id"), F.col("simhash").alias("_sh")
    )
    return _simhash_banded_pairs(sim, 64, bands, max_hamming)
