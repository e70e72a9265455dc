"""LLM-pipeline operator tests: dedup, similarity, text analysis,
multimodal plumbing."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    near = base.replace("lazy", "sleepy")  # 1 of 16 tokens differs
    rows = [
        (1, base),
        (2, near),
        (3, "completely unrelated text about spark query engines and parquet files"),
        (4, base),  # exact duplicate of 1
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r["copies"] for r in dedup.exact_dedup(docs).collect()}
    assert out == {1: 2, 2: 1, 3: 1}


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    row = df.select(dedup.shingles_col(F.col("text"), 2).alias("s")).collect()[0]
    assert row["s"] == ["a b", "b c", "c d"]


def test_minhash_lsh_candidates(docs):
    pairs = dedup.minhash_lsh_candidates(docs, num_hashes=64, bands=16).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert by_pair[(1, 4)] == 1.0  # exact dup: identical signatures
    assert (1, 2) in by_pair and by_pair[(1, 2)] > 0.5  # near dup
    assert (1, 3) not in by_pair and (2, 3) not in by_pair  # unrelated


def test_ngram_jaccard_exact_value(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.1).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert by_pair[(1, 4)] == 1.0

    def shingle_set(s, n=3):
        toks = s.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    near = base.replace("lazy", "sleepy")
    a, b = shingle_set(base), shingle_set(near)
    expected = len(a & b) / len(a | b)
    assert by_pair[(1, 2)] == pytest.approx(expected)


def test_simhash_near_dups(docs):
    pairs = dedup.simhash_near_dups(docs, max_hamming=10).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert by_pair[(1, 4)] == 0  # identical docs, identical simhash
    assert (1, 2) in by_pair  # near dup within 10 bits
    assert (1, 3) not in by_pair


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8))
    vecs[10] = vecs[0] * 1.5  # same direction as 0 → cosine 1
    vecs[11] = vecs[0] + rng.standard_normal(8) * 0.05  # near dup
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"), vecs


def test_brute_force_topk_matches_numpy(embeddings):
    df, vecs = embeddings
    query = vecs[0].tolist()
    got = [r["vec_id"] for r in similarity.brute_force_topk(df, query, k=5).collect()]
    cos = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    golden = list(np.lexsort((np.arange(len(cos)), -cos))[:5])
    assert got == [int(g) for g in golden]
    assert got[0] in (0, 10)  # exact-direction matches rank first


def test_ann_topk_finds_near_neighbors(embeddings):
    df, vecs = embeddings
    query = vecs[0].tolist()
    got = [r["vec_id"] for r in similarity.ann_topk(df, query, k=5, planes=8).collect()]
    # the identical-direction and near-dup vectors must be retrieved
    assert 0 in got and 10 in got


def test_lsh_buckets_deterministic(embeddings):
    df, _ = embeddings
    a = similarity.hyperplane_lsh_buckets(df, planes=8, seed=7).collect()
    b = similarity.hyperplane_lsh_buckets(df, planes=8, seed=7).collect()
    assert {r["vec_id"]: r["lsh_bucket"] for r in a} == {r["vec_id"]: r["lsh_bucket"] for r in b}


def test_embedding_near_dups(embeddings):
    df, _ = embeddings
    pairs = similarity.embedding_near_dups(df, threshold=0.98, planes=6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 10) in found  # colinear pair


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world foo",), ("one",)], "text string")
    counts = [r[0] for r in df.select(text.token_count(F.col("text"))).collect()]
    assert counts == [3, 1]
    bpe = df.select(text.bpe_ish_token_count(F.col("text"))).collect()[0][0]
    assert bpe >= 3


def test_quality_signals(spark):
    rows = [
        (1, "The cat and the dog played in the garden with a ball of yarn."),
        (2, "@@@@ #### !!!! %%%% ^^^^ &&&&"),
    ]
    df = text.quality_signals(spark.createDataFrame(rows, "id int, text string"))
    scores = {r["id"]: r["quality_score"] for r in df.collect()}
    assert scores[1] > 0.6
    assert scores[2] < 0.2
    assert all(0.0 <= s <= 1.0 for s in scores.values())


def test_language_id(spark):
    rows = [
        (1, "the cat and the dog is in the house with a mouse"),
        (2, "el perro y la casa que en los campos de la ciudad"),
        (3, "der hund und die katze von dem haus mit einem ball"),
        (4, "le chat et le chien dans la maison des champs une fois"),
        (5, "这是一个中文句子 关于猫和狗"),
    ]
    df = text.language_id(spark.createDataFrame(rows, "id int, text string"))
    preds = {r["id"]: r["lang_pred"] for r in df.collect()}
    assert preds == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh"}


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h i j")], "id int, text string")
    f1 = text.fingerprint(df).collect()[0]["fingerprint"]
    f2 = text.fingerprint(df).collect()[0]["fingerprint"]
    assert f1 == f2 and ":" in f1


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, bytearray(b"fake-image-bytes-1"), ("image", "png", 640, 480, None, None)),
        (2, bytearray(b"fake-image-bytes-1"), ("image", "png", 640, 480, None, None)),
        (3, bytearray(b"fake-video-bytes"), ("video", "mp4", 1920, 1080, 10_000, 300)),
    ]
    return spark.createDataFrame(
        rows,
        "media_id int, payload binary, media_meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:int,n_frames:int>",
    )


def test_decode_raises_for_codecless_formats():
    # compressed audio (here: an MP3-ish ID3 header) still hits the
    # clear codec-boundary error
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"ID3\x04\x00\x00\x00\x00\x00\x00", "audio", fake=False)
    # WAV/JPEG-sniffed payloads now route to the real codecs; truncated
    # bytes are a malformed-file error, not a missing-codec error
    with pytest.raises(ValueError):
        multimodal.decode_media(b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio", fake=False)
    with pytest.raises(ValueError):
        multimodal.decode_media(b"\xff\xd8\xff\xe0jpeg-ish", "image", fake=False)


def test_png_roundtrip_all_color_types():
    import numpy as np

    rng = np.random.default_rng(7)
    for channels in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, channels), dtype=np.uint8)
        data = multimodal.encode_png(img)
        out = multimodal.decode_media(data, "image", fake=False)
        assert out.shape == img.shape
        assert (out == img).all()


def test_png_decode_all_filter_types():
    """Hand-built IDAT exercising filters 1-4 (our encoder only emits 0)."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    height, width, channels = img.shape
    stride = width * channels

    scanlines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, filt in zip(range(height), [0, 1, 2, 3, 4]):
        recon = img[y].reshape(-1).astype(np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = recon[x - channels] if x >= channels else 0
            up = prev[x]
            ul = prev[x - channels] if x >= channels else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = left
            elif filt == 2:
                pred = up
            elif filt == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            line[x] = (recon[x] - pred) & 0xFF
        scanlines += bytes([filt]) + line.astype(np.uint8).tobytes()
        prev = recon

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">2I5B", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + chunk(b"IEND", b"")
    )
    out = multimodal.decode_png(data)
    assert (out == img).all()


def test_png_paletted_decode():
    import struct
    import zlib

    import numpy as np

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    scanlines = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">2I5B", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )
    out = multimodal.decode_png(data)
    assert out.shape == (2, 3, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 0].tolist() == [0, 0, 255]


def test_bmp_decode():
    import struct

    import numpy as np

    img = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]], dtype=np.uint8
    )
    height, width, _ = img.shape
    row_bytes = (width * 3 + 3) & ~3
    pixel_data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB → BGR
        pixel_data += row + b"\x00" * (row_bytes - len(row))
    data_off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(pixel_data), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    out = multimodal.decode_media(header + bytes(pixel_data), "image", fake=False)
    assert (out == img).all()


def test_extract_features_real_png_decode(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(2)]
    rows = [
        (i, bytearray(multimodal.encode_png(img)), ("image", "png", 8, 8, None, None))
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows,
        "media_id int, payload binary, media_meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:int,n_frames:int>",
    )
    out = {r["media_id"]: r for r in multimodal.extract_features(df, fake=False).collect()}
    assert len(out[0]["features"]) == multimodal.FEATURE_DIM
    expected = np.pad(imgs[0].astype(np.float64).ravel(), (0, 0))
    expected = expected.reshape(multimodal.FEATURE_DIM, -1).mean(axis=1)
    assert np.allclose(out[0]["features"], expected, atol=1e-4)
    assert out[0]["features"] != out[1]["features"]


def test_extract_features_deterministic(media_df):
    out = multimodal.extract_features(media_df).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[1]["features"]) == multimodal.FEATURE_DIM
    # same payload → same features + same content hash
    assert by_id[1]["features"] == by_id[2]["features"]
    assert by_id[1]["content_sha256"] == by_id[2]["content_sha256"]
    assert by_id[1]["content_sha256"] != by_id[3]["content_sha256"]


def test_resize_rewrites_meta(media_df):
    out = multimodal.resize_images(media_df, 224, 224).collect()[0]["media_meta"]
    assert out["width"] == 224 and out["height"] == 224


def test_sample_frames(media_df):
    rows = {r["media_id"]: r["sampled_frames"] for r in multimodal.sample_frames(media_df, 100).collect()}
    assert rows[3] == [0, 100, 200]
    assert rows[1] == []


def test_media_dedup_keys(media_df):
    rows = multimodal.media_dedup_keys(media_df).collect()
    expected = hashlib.sha256(b"fake-image-bytes-1").hexdigest()
    by_id = {r["media_id"]: r["media_key"] for r in rows}
    assert by_id[1] == expected == by_id[2]


def test_ivf_train_and_search(spark, sf_dir):
    from gfw_data_api_spark.llmops import ivf, similarity
    from gfw_data_api_spark.sources.tabular import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf.train_ivf(emb, nlist=8, iters=3)
    assert centroids.shape[0] == 8
    indexed = ivf.build_ivf_index(emb, centroids)
    # every vector lands in a cell
    assert indexed.filter(F.col("ivf_cell").isNull()).count() == 0
    cells = indexed.groupBy("ivf_cell").count().collect()
    assert len(cells) >= 4  # clustering is non-degenerate

    query = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    got = [r["vec_id"] for r in ivf.ivf_topk(indexed, centroids, query, k=5, nprobe=3).collect()]
    # the query's own vector is always retrieved (its cell is the nearest)
    assert 0 in got
    # decent recall vs brute force with nprobe=3 of 8 cells
    brute = [r["vec_id"] for r in similarity.brute_force_topk(emb, query, k=5).collect()]
    assert len(set(got) & set(brute)) >= 2


def test_ivf_topk_batch_matches_single_query(spark, sf_dir):
    """The batched probe must reproduce each per-query ivf_topk result
    EXACTLY (ids, ranks, and bit-equal cosines) while scanning the index
    once — not once per query."""
    from gfw_data_api_spark.llmops import ivf
    from gfw_data_api_spark.sources.tabular import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf.train_ivf(emb, nlist=8, iters=3)
    indexed = ivf.build_ivf_index(emb, centroids).persist()
    try:
        qids = [0, 1, 2]
        queries = [
            (qid, [float(x) for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]])
            for qid in qids
        ]
        batch = ivf.ivf_topk_batch(indexed, centroids, queries, k=5, nprobe=3)
        got = {}
        for r in batch.collect():
            got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
        assert set(got) == set(qids)
        for qid, qvec in queries:
            single = ivf.ivf_topk(indexed, centroids, qvec, k=5, nprobe=3).collect()
            want = [(i + 1, r.vec_id, r.cosine) for i, r in enumerate(single)]
            assert sorted(got[qid]) == want, f"query {qid} diverged"
        # one batched plan regardless of Q: a single probe join, never a
        # union of per-query subplans (the r4 s08 shape this replaces).
        # Assert on the optimized logical plan — physical toString
        # repeats AQE stages and is sensitive to what earlier tests
        # left in the block-manager cache.
        optimized = batch._jdf.queryExecution().optimizedPlan().toString()
        assert "Union" not in optimized
        assert optimized.count("Join") == 1
    finally:
        indexed.unpersist()


def test_ivf_topk_batch_rejects_empty(spark):
    from gfw_data_api_spark.llmops import ivf

    with pytest.raises(ValueError, match="at least one"):
        ivf.ivf_topk_batch(None, np.zeros((2, 2)), [], k=3)


def test_ivf_deterministic(spark, sf_dir):
    from gfw_data_api_spark.llmops import ivf
    from gfw_data_api_spark.sources.tabular import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    c1 = ivf.train_ivf(emb, nlist=4, iters=2, seed=7)
    c2 = ivf.train_ivf(emb, nlist=4, iters=2, seed=7)
    assert np.allclose(c1, c2)


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """Docs sharing a ≥(k+window-1)-token run must share a fingerprint;
    disjoint docs share none."""
    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "one two three " + common + " four five"),
        (2, "six seven " + common + " eight nine ten"),
        (3, "totally different words everywhere here now and forever more again"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = dedup.winnowing_fingerprints(df, k=5, window=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]  # shared run → shared fingerprints
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_tfidf_top_terms_golden(spark):
    from gfw_data_api_spark.llmops.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana cherry"),
            (2, "banana banana cherry"),
            (3, "cherry date date date date"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"], r["df"]))
    for v in by_doc.values():
        v.sort()
    # rank by tf desc then term asc; df counts docs containing the term
    assert by_doc[1] == [(1, "apple", 3, 1), (2, "banana", 1, 2)]
    assert by_doc[2] == [(1, "banana", 2, 2), (2, "cherry", 1, 3)]
    assert by_doc[3] == [(1, "date", 4, 1), (2, "cherry", 1, 3)]
    # idf: apple in 1 of 3 docs -> 3*ln(3); cherry in all 3 -> ln(1) = 0
    import math

    scores = {(r["doc_id"], r["term"]): r["tfidf"] for r in out}
    assert scores[(1, "apple")] == pytest.approx(3 * math.log(3.0), abs=1e-6)
    assert scores[(2, "cherry")] == 0.0


def test_bm25_search_golden(spark):
    import math

    from gfw_data_api_spark.llmops.text import bm25_search

    corpus = [
        (1, "spark join spark filter"),
        (2, "join join join scan"),
        (3, "filter scan merge"),
        (4, "spark"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = bm25_search(docs, ["spark", "join"], k1=1.2, b=0.75, top_k=10).collect()
    got = {r["doc_id"]: r["bm25"] for r in out}

    # independent reference computation
    toks = {i: t.split() for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {q: sum(1 for v in toks.values() if q in v) for q in ("spark", "join")}
    expected = {}
    for i, v in toks.items():
        s = 0.0
        for q in ("spark", "join"):
            tf = v.count(q)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(v) / avgdl)))
        if s:
            expected[i] = round(s, 6)
    assert got == pytest.approx(expected, abs=2e-6)
    # doc 3 has no query term and must be absent; ranking deterministic
    assert 3 not in got
    ranked = [r["doc_id"] for r in out]
    assert ranked == sorted(expected, key=lambda i: (-expected[i], i))


def test_bm25_empty_corpus_raises(spark):
    from gfw_data_api_spark.llmops.text import bm25_search

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_search(empty, ["x"])


def test_decontamination_flags_planted_overlap(spark):
    from gfw_data_api_spark.llmops.decontaminate import (
        contamination_matches,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over the lazy dog tonight suffix"),
            (2, "completely unrelated sentence about spark partitions and shuffles here"),
            (3, "the quick brown cat naps all day long in the warm sun today"),
        ],
        "doc_id long, text string",
    )
    matches = contamination_matches(corpus, bench, shingle_n=5, min_shared=2)
    got = {(r["corpus_id"], r["bench_id"]) for r in matches.collect()}
    assert got == {(1, 100)}  # doc 3 shares <2 five-grams, doc 2 none
    clean = decontaminate(corpus, bench, shingle_n=5, min_shared=2)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}


def test_ngram_jaccard_df_cap_bounds_candidates(spark):
    """A corpus-wide common phrase must not go quadratic: with the df cap,
    hot shingles are dropped from intersection AND union, so unrelated
    docs sharing only the hot phrase produce ZERO pairs."""
    boiler = "click here to subscribe to our newsletter today please"
    rows = [(i, f"unique document body number {i} alpha{i} beta{i} gamma{i} " + boiler)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.ngram_jaccard_pairs(
        df, shingle_n=3, threshold=0.05, max_doc_frequency=100
    )
    assert capped.count() == 0  # only the planted phrase is shared

    # candidate volume is bounded: the intersection join on the capped
    # index can emit at most sum over kept shingles of df^2 pairs; with
    # the hot phrase dropped, no shared shingles remain at all.  Without
    # the cap the same corpus yields ~1000^2/2 * 8 shingle join rows —
    # assert the capped plan prunes them by checking a sampled uncapped
    # run on a subset still finds the phrase pairs (sanity: the cap, not
    # the threshold, is what removed them).
    subset = df.limit(40)
    uncapped = dedup.ngram_jaccard_pairs(
        subset, shingle_n=3, threshold=0.05, max_doc_frequency=None
    )
    assert uncapped.count() == 40 * 39 / 2  # every pair shares the phrase


def test_ngram_jaccard_cap_above_df_is_exact(docs):
    """Cap above every shingle's df → identical to the uncapped result."""
    capped = dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.1,
                                       max_doc_frequency=5000)
    uncapped = dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.1,
                                         max_doc_frequency=None)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_contamination_bench_df_cap(spark):
    """Benchmark boilerplate shared by every bench doc must not pair the
    whole corpus with the whole benchmark."""
    from gfw_data_api_spark.llmops.decontaminate import contamination_matches

    boiler = "answer the following question carefully and show your work"
    bench = spark.createDataFrame(
        [(i, boiler + f" real bench content item {i} question{i} topic{i}")
         for i in range(50)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(100 + i, f"corpus doc {i} with text " + (boiler if i == 0 else f"body{i} filler{i} words{i}"))
         for i in range(200)],
        "doc_id long, text string",
    )
    # leaked doc: corpus doc 300 contains bench item 7 verbatim
    leaked = spark.createDataFrame(
        [(300, boiler + " real bench content item 7 question7 topic7")],
        "doc_id long, text string",
    )
    corpus = corpus.unionByName(leaked)

    hits = contamination_matches(
        corpus, bench, shingle_n=3, min_shared=2, max_bench_frequency=10
    ).collect()
    # boilerplate-only matches are gone; the true leak survives via its
    # non-boilerplate shingles
    assert {(r["corpus_id"], r["bench_id"]) for r in hits} == {(300, 7)}


def test_blocked_cosine_pairs_block_guard(spark):
    from gfw_data_api_spark.llmops.similarity import blocked_cosine_pairs

    rows = [(i, "big", [1.0, 0.0]) for i in range(50)] + [(100, "ok", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    with pytest.raises(ValueError, match="max_block_size"):
        blocked_cosine_pairs(df, max_block_size=10).count()
    # within bounds: identical vectors in a block pair at cosine 1
    out = blocked_cosine_pairs(df, max_block_size=100).collect()
    assert len(out) == 50 * 49 / 2
    assert all(abs(r["cosine"] - 1.0) < 1e-9 for r in out)


def test_blocked_cosine_pairs_plan_guard(spark):
    """guard="plan" embeds the bound in the plan: no extra driver action,
    same results in bounds, and an oversized block aborts the job."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from gfw_data_api_spark.llmops.similarity import blocked_cosine_pairs

    rows = [(i, "big", [1.0, 0.0]) for i in range(50)] + [(100, "ok", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = blocked_cosine_pairs(df, max_block_size=100, guard="plan").collect()
    assert len(out) == 50 * 49 / 2
    assert all(abs(r["cosine"] - 1.0) < 1e-9 for r in out)
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="max_block_size"):
        blocked_cosine_pairs(df, max_block_size=10, guard="plan").count()


def test_scrub_pii_planted(spark):
    from gfw_data_api_spark.llmops.clean import scrub_pii

    rows = [
        (1, "reach me at jane.doe+x@mail.example.org or 555-123-4567 ok"),
        (2, "server at 10.0.0.1 and 192.168.1.254 no mail"),
        (3, "mail user@1.2.3.4 tel 555.987.6543"),
        (4, "clean text with nothing to hide"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "<EMAIL>" in out[1]["redacted"] and "<PHONE>" in out[1]["redacted"]
    assert "jane" not in out[1]["redacted"]
    assert out[2]["n_ip"] == 2
    assert out[2]["redacted"].count("<IP>") == 2
    # numeric-host "email" is NOT an email (no alphabetic TLD) — the
    # host is redacted as an IP; dotted phone redacts as phone, not IP
    assert out[3]["n_email"] == 0 and out[3]["n_phone"] == 1 and out[3]["n_ip"] == 1
    assert out[3]["redacted"] == "mail user@<IP> tel <PHONE>"
    assert out[4]["redacted"] == rows[3][1]
    assert out[4]["n_email"] == out[4]["n_phone"] == out[4]["n_ip"] == 0


def test_repetition_signals_known_values(spark):
    from gfw_data_api_spark.llmops.text import repetition_signals

    rows = [
        (1, "spam spam spam spam"),            # top word 4/4, top bigram 3/3
        (2, "a b c d"),                         # all distinct: 1/4, 1/3
        (3, "one"),                             # single word, no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["top_word_frac"] == 1.0 and out[1]["top_bigram_frac"] == 1.0
    assert out[2]["top_word_frac"] == 0.25
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[3]["n_words"] == 1 and out[3]["top_bigram_frac"] == 0.0


def test_chunk_documents_boundaries(spark):
    from gfw_data_api_spark.llmops.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    out = chunk_documents(df, window=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    # starts 0, 48, 96 → lengths 64, 52, 4
    assert [c["chunk_tokens"] for c in chunks] == [64, 52, 4]
    assert chunks[0]["chunk_text"].split()[0] == "w0"
    assert chunks[1]["chunk_text"].split()[0] == "w48"
    # overlap: tokens 48-63 appear in both chunk 0 and chunk 1
    assert set(chunks[0]["chunk_text"].split()[48:]) <= set(chunks[1]["chunk_text"].split())
    assert by_doc[2][0]["chunk_tokens"] == 2

    with pytest.raises(ValueError):
        chunk_documents(df, window=0)


def test_curate_corpus_planted(spark):
    from gfw_data_api_spark.llmops.curate import curate_corpus

    good = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [
        (1, good, "en"),                                  # survives
        (2, good, "en"),                                  # exact dup of 1 → dropped
        (3, "spam spam spam spam spam spam spam spam spam spam", "en"),  # repetitive
        (4, good.replace("alpha", "zulu"), "fr"),          # wrong language
        (5, "too short", "en"),                            # under min_tokens
        (6, "secret bench question one two three four five six seven eight nine", "en"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    bench = spark.createDataFrame(
        [(100, "secret bench question one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    kept = curate_corpus(corpus, bench, min_tokens=10, keep_langs=("en",))
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1]
    row = kept.collect()[0]
    assert row["n_tokens"] == 12
    assert row["top_word_frac"] == pytest.approx(1 / 12, abs=1e-6)


def test_quantization_roundtrip_error_bound(spark):
    from gfw_data_api_spark.llmops.quantize import (
        quantization_report,
        quantize_embeddings,
    )

    rows = [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert q[1]["qvec"] == [127, -63, 32, 0]  # floor(x/scale + .5)
    assert q[2]["qvec"] == [0, 0, 0, 0] and q[2]["scale"] == 1.0
    rep = {r["vec_id"]: r for r in quantization_report(df).collect()}
    # reconstruction error bounded by scale/2
    assert rep[1]["recon_err"] <= rep[1]["scale"] / 2 + 1e-9
    assert rep[2]["recon_err"] == 0.0


def test_url_canonicalization_cases(spark):
    from gfw_data_api_spark.llmops.clean import url_dedup_keys

    cases = [
        (1, "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=7#frag",
            "https://www.example.com/Path/?id=7"),
        (2, "http://Site.org:80/a?b=1&utm_campaign=z",
            "http://site.org/a?b=1"),
        (3, "https://host.com/", "https://host.com"),
        (4, "http://host.com/p?utm_medium=email", "http://host.com/p"),
        (5, "https://h.com/x?a=1&ref=tw&b=2", "https://h.com/x?a=1&b=2"),
        (6, "https://h.com:8443/x", "https://h.com:8443/x"),  # non-default port kept
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases],
                               "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"] for r in url_dedup_keys(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


# ---------------------------------------------------------------------------
# connected components / dedup clusters
# ---------------------------------------------------------------------------


def _union_find_reference(pairs):
    """Simple driver-side union-find for cross-checking small graphs."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(i, i + 1) for i in range(1, 12)],  # worst case for naive propagation: a chain
        [(20, 21), (21, 22), (20, 22), (30, 31)],  # triangle + pair
        [(5, 1), (5, 2), (5, 3), (5, 4)],  # star centered off-min
        [(9, 2), (7, 2), (9, 4), (3, 8), (8, 1)],  # arbitrary tangles
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    from gfw_data_api_spark.llmops.components import connected_components

    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        (r["node"], r["component"]) for r in connected_components(pairs).collect()
    }
    want = set(_union_find_reference(edges).items())
    assert got == want


def test_connected_components_empty(spark):
    from gfw_data_api_spark.llmops.components import connected_components

    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(empty).collect() == []


def test_dedup_clusters_keeps_one_per_cluster(spark):
    from gfw_data_api_spark.llmops.components import dedup_clusters

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id bigint"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    rows = {r["doc_id"]: (r["component"], r["keep"]) for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        10: (10, True),
        11: (10, False),
        99: (99, True),  # singleton: its own canonical cluster
    }
    kept = [d for d, (_, keep) in rows.items() if keep]
    assert sorted(kept) == [1, 10, 99]


# ---------------------------------------------------------------------------
# deterministic sampling / splits
# ---------------------------------------------------------------------------


def test_hash_split_deterministic_and_partition_stable(spark):
    from gfw_data_api_spark.llmops.sampling import hash_split

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, seed=3).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(17), seed=3).collect()
    }
    assert a == b  # assignment is a pure function of (id, seed)
    frac = sum(1 for v in a.values() if v == "eval") / len(a)
    assert 0.07 < frac < 0.13  # ~10% by construction


def test_hash_split_append_stable(spark):
    from gfw_data_api_spark.llmops.sampling import hash_split

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small, seed=9).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, seed=9).collect()}
    assert all(b[k] == v for k, v in a.items())  # growing the corpus never flips a split


def test_hash_split_seed_changes_assignment(spark):
    from gfw_data_api_spark.llmops.sampling import hash_split

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, seed=1).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, seed=2).collect()}
    assert a != b


def test_stratified_sample_fractions(spark):
    from gfw_data_api_spark.llmops.sampling import stratified_sample
    from pyspark.sql import functions as F

    docs = spark.range(0, 6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("zh")
        .alias("lang"),
    )
    kept = stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.2}, default_fraction=0.0, seed=4
    )
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("zh", 0) == 0  # default fraction drops unlisted strata
    assert 0.4 < counts["en"] / 2000 < 0.6
    assert 0.12 < counts["de"] / 2000 < 0.28


def test_stratified_sample_validates_fractions(spark):
    from gfw_data_api_spark.llmops.sampling import stratified_sample

    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        stratified_sample(docs.withColumn("lang", F.lit("en")), "lang", {"en": 1.5})


def test_bigram_lm_scores_hand_computed(spark):
    import math

    from gfw_data_api_spark.llmops.text import bigram_lm_scores

    # corpus: "a b" x2 and "a c" → bigram counts: ab=2, ac=1; context a=3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert rows[1]["n_bigrams"] == 1 and rows[1]["df_sum"] == 2
    assert rows[3]["df_sum"] == 1
    assert rows[1]["avg_logprob"] == pytest.approx(math.log(2 / 3))
    assert rows[3]["avg_logprob"] == pytest.approx(math.log(1 / 3))
    # corpus-typical doc scores higher than the rare one
    assert rows[1]["avg_bigram_df"] > rows[3]["avg_bigram_df"]


def test_bigram_lm_short_docs_dropped(spark):
    from gfw_data_api_spark.llmops.text import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"] for r in bigram_lm_scores(docs).collect()}
    assert rows == {3}  # <2-token docs have no bigrams, hence no score


def test_remove_repeated_segments_line_mode(spark):
    from gfw_data_api_spark.llmops.clean import remove_repeated_segments

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique intro\n{boiler}\nreal content one"),
            (2, f"{boiler}\nreal content two"),
            (3, f"other text\n{boiler}"),
            (4, boiler),  # document that is ONLY boilerplate
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["cleaned"] for r in remove_repeated_segments(docs).collect()}
    assert out == {
        1: "unique intro\nreal content one",
        2: "real content two",
        3: "other text",
        4: "",  # every segment dropped, id survives with empty text
    }


def test_remove_repeated_segments_token_mode(spark):
    from gfw_data_api_spark.llmops.clean import remove_repeated_segments

    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "a b c q r s"),
            (3, "a b c"),
        ],
        "doc_id bigint, text string",
    )
    # "a b c" occurs 3× > max_count=2 → dropped everywhere
    out = {
        r["doc_id"]: r["cleaned"]
        for r in remove_repeated_segments(
            docs, segment_tokens=3, max_count=2
        ).collect()
    }
    assert out == {1: "x y z", 2: "q r s", 3: ""}


def test_remove_repeated_segments_validates(spark):
    from gfw_data_api_spark.llmops.clean import remove_repeated_segments

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        remove_repeated_segments(docs, max_count=0)
    with pytest.raises(ValueError):
        remove_repeated_segments(docs, segment_tokens=0)


def test_png_roundtrip_property():
    """Random sizes/channels survive encode→decode bit-exactly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        c=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def roundtrip(h, w, c, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        out = multimodal.decode_png(multimodal.encode_png(img))
        assert out.shape == img.shape and (out == img).all()

    roundtrip()


# ---------------------------------------------------------------------------
# JPEG codec (round 4: last stubbed image format made real)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_solid_and_gradient():
    """Solid blocks must round-trip exactly (DC-only spectra survive any
    quality); smooth gradients within ~1 level mean error at q90."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import decode_jpeg, encode_jpeg

    solid = np.zeros((24, 17, 3), dtype=np.uint8)
    solid[:, :, 0], solid[:, :, 1], solid[:, :, 2] = 200, 50, 90
    out = decode_jpeg(encode_jpeg(solid, quality=95))
    assert out.shape == (24, 17, 3)
    assert int(np.max(np.abs(out.astype(int) - solid.astype(int)))) == 0

    grad = np.tile(np.linspace(0, 255, 64), (32, 1)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad, quality=90))
    assert out.shape == (32, 64, 1)
    assert float(np.mean(np.abs(out[:, :, 0].astype(float) - grad))) < 1.0


def test_jpeg_subsampling_and_restart_intervals():
    """4:2:0 MCU interleave (2x2 luma + subsampled chroma) and DRI/RSTn
    restart handling — the real-world JPEG profiles — must decode."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:41, 0:53]
    img = np.stack(
        [
            (128 + 100 * np.sin(xx / 10.0)).clip(0, 255),
            (128 + 100 * np.cos(yy / 12.0)).clip(0, 255),
            ((xx + yy) * 2 % 256),
        ],
        axis=-1,
    ).astype(np.uint8)
    for kwargs in (
        {"subsampling": "420"},
        {"subsampling": "420", "restart_interval": 2},
        {"subsampling": "444", "restart_interval": 3},
    ):
        out = decode_jpeg(encode_jpeg(img, quality=92, **kwargs))
        assert out.shape == img.shape, kwargs
        err = float(np.mean(np.abs(out.astype(float) - img.astype(float))))
        assert err < 4.0, (kwargs, err)


def test_jpeg_rejects_out_of_subset_profiles():
    import numpy as np
    import pytest as _pytest

    from gfw_data_api_spark.llmops.jpeg import decode_jpeg, encode_jpeg

    img = np.full((8, 8), 100, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    # flip SOF0 (C0) to SOF3 (C3, lossless) in place — SOF2 progressive
    # is supported since round 5, so the boundary moved to SOF3
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC3
    with _pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(data))
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_progressive_decodes_bit_identical_to_baseline():
    """encode_jpeg_progressive emits the SAME quantized coefficients as
    the baseline encoder, so decoding the SOF2 stream must reproduce the
    baseline decode EXACTLY — every spectral-selection band, DC and AC
    successive-approximation refinement, EOB and ZRL-with-corrections
    path has to be right for equality to hold on a dense gradient."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        ("gray-grad", (np.add.outer(np.arange(24) * 7, np.arange(21) * 3) % 256).astype(np.uint8)),
        ("rgb-noise", rng.integers(0, 256, (19, 26, 3)).astype(np.uint8)),
        ("rgb-structured", np.stack([
            (np.add.outer(np.arange(16) * 11, np.arange(16) * 5) % 256),
            np.tile((np.arange(16) * 16) % 256, (16, 1)),
            np.full((16, 16), 200),
        ], axis=-1).astype(np.uint8)),
    ]
    for name, img in cases:
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling="444"))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=85))
        assert (base == prog).all(), f"{name}: progressive decode diverged"


def test_jpeg_progressive_deeper_approximation_levels():
    """Al=2 start with two refinement passes per band (exercises repeated
    refinement and the newly-significant-at-intermediate-level path)."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=70, subsampling="444"))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=70, dc_al=2, ac_al=2, band_split=9)
    )
    assert (base == prog).all()


def test_jpeg_progressive_zrl_before_history_coefficient():
    """Regression (round-5 review): a refinement-scan zero run longer
    than 15 followed by a HISTORY-nonzero coefficient, then a newly
    significant one, must flush the pending ZRLs at the history
    coefficient (libjpeg jcphuff.c order), not at the next newly
    significant one — the old writer emitted the history coefficient's
    correction bit ahead of the ZRL symbol and desynchronized the scan
    (decode raised 'refinement magnitude != 1'). Fixture built by
    inverse-DCT from the exact failing coefficient pattern: band-2
    zigzag positions 6..29 zero, |coef|=2 at 30 (history at the Al=1→0
    refinement), |coef|=1 at 45 (newly significant)."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import (
        QTABLE_LUMA,
        ZIGZAG,
        _idct2,
        _quantize_block,
        _scaled_qtable,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    ql = _scaled_qtable(QTABLE_LUMA, 88)
    nat = np.zeros(64)
    nat[ZIGZAG[30]] = 2.0
    nat[ZIGZAG[45]] = 1.0
    img = np.clip(np.round(_idct2(nat.reshape(8, 8) * ql) + 128.0), 0, 255).astype(
        np.uint8
    )
    # the fixture must actually hit the pattern after re-quantization
    zz = _quantize_block(img.astype(np.float64), ql)
    band = [abs(int(v)) for v in zz[6:64]]
    first_big = next(i for i, v in enumerate(band) if v >= 2)
    assert first_big > 15 and all(v == 0 for v in band[:first_big])
    assert any(v == 1 for v in band[first_big + 1 :])

    base = decode_jpeg(encode_jpeg(img, quality=88, subsampling="444"))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=88, dc_al=1, ac_al=1))
    assert (base == prog).all()


def test_jpeg_progressive_spectral_selection_only():
    """ac_al=0/dc_al=0: pure spectral selection, no refinement scans."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = (np.add.outer(np.arange(12) * 13, np.arange(18) * 9) % 256).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=92, subsampling="444"))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=92, dc_al=0, ac_al=0))
    assert (base == prog).all()


def test_decode_media_sniffs_progressive_jpeg():
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import encode_jpeg_progressive

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = multimodal.decode_media(encode_jpeg_progressive(img), "image", fake=False)
    assert out.shape == (8, 8, 3)
    assert int(np.max(np.abs(out.astype(int) - 77))) == 0


def test_decode_media_sniffs_jpeg():
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import encode_jpeg

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = multimodal.decode_media(encode_jpeg(img), "image", fake=False)
    assert out.shape == (8, 8, 3)
    assert int(np.max(np.abs(out.astype(int) - 77))) == 0


def test_extract_features_real_jpeg_decode(spark):
    """The mapInPandas feature stage runs the real JPEG codec end-to-end
    (no fake), pooling the actual decoded pixels."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:16, 0:16]
    imgs = [
        np.stack([(xx * 16) % 256, (yy * 16) % 256, ((xx + yy + i) * 8) % 256], axis=-1).astype(np.uint8)
        for i in range(2)
    ]
    rows = [
        (i, bytearray(encode_jpeg(img, quality=95)), ("image", "jpeg", 16, 16, None, None))
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows,
        "media_id int, payload binary, media_meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:int,n_frames:int>",
    )
    out = {r["media_id"]: r for r in multimodal.extract_features(df, fake=False).collect()}
    decoded = decode_jpeg(encode_jpeg(imgs[0], quality=95))
    expected = decoded.astype(np.float64).ravel()
    expected = expected.reshape(multimodal.FEATURE_DIM, -1).mean(axis=1)
    assert np.allclose(out[0]["features"], expected, atol=1e-4)
    assert out[0]["features"] != out[1]["features"]


def test_normalize_text_unicode(spark):
    from gfw_data_api_spark.llmops.clean import normalize_text

    rows = [
        (1, "“Hi” — café"),       # quotes, em dash, combining accent
        (2, "a​b  c\x07d"),                   # zero-width, NBSP run, BEL
        (3, "  tabs\tand\nnewlines  "),
        (4, "‘x’ – y−z"),                # curly singles, en dash, minus
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["norm_text"] for r in normalize_text(df).collect()}
    assert out[1] == '"Hi" - café'   # NFC precomposed
    assert out[2] == "ab cd"
    assert out[3] == "tabs and newlines"
    assert out[4] == "'x' - y-z"


def test_normalize_text_no_collapse(spark):
    from gfw_data_api_spark.llmops.clean import normalize_text

    df = spark.createDataFrame([(1, "a\n\nb  c")], "doc_id int, text string")
    out = normalize_text(df, collapse_whitespace=False).collect()[0]["norm_text"]
    assert out == "a\n\nb  c"  # structure preserved when collapse is off


def test_kneser_ney_bigram_scores_golden(spark):
    import math

    from gfw_data_api_spark.llmops.text import kneser_ney_bigram_scores

    corpus = [(1, "a b a b"), (2, "a b c"), (3, "c a")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in kneser_ney_bigram_scores(docs).collect()}

    # independent reference implementation
    from collections import Counter

    bigrams = []
    per_doc = {}
    for i, t in corpus:
        toks = t.split()
        bgs = [f"{toks[j]} {toks[j+1]}" for j in range(len(toks) - 1)]
        per_doc[i] = bgs
        bigrams += bgs
    c2 = Counter(bigrams)
    c1 = Counter()
    n1fw = Counter()
    n1bw = Counter()
    for bg, c in c2.items():
        w1, w2 = bg.split(" ")
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    nt = len(c2)
    D = 0.75

    def p(bg):
        w1, w2 = bg.split(" ")
        return (c2[bg] - D) / c1[w1] + D * n1fw[w1] / c1[w1] * (n1bw[w2] / nt)

    for i, bgs in per_doc.items():
        want = sum(math.log(p(b)) for b in bgs) / len(bgs)
        assert out[i]["n_bigrams"] == len(bgs)
        assert out[i]["distinct_bigrams"] == len(set(bgs))
        assert out[i]["kn_avg_logprob"] == pytest.approx(want, abs=1e-9)
    # probabilities out of each context sum to 1 (interpolated KN invariant)
    for w1 in c1:
        total = sum(p(f"{w1} {w2}") for w2 in n1bw if f"{w1} {w2}" in c2)
        # plus the continuation mass spread over unseen w2 in the vocab:
        # for the invariant restricted to seen bigrams, total ≤ 1
        assert total <= 1.0 + 1e-9


def test_kneser_ney_is_fully_lazy(spark):
    """Building the KN plan must trigger ZERO Spark jobs: the bigram-type
    total folds in-plan as a 1-row aggregate crossJoin (t18/t19
    convention), not a driver-side count() action."""
    from gfw_data_api_spark.llmops.text import kneser_ney_bigram_scores

    docs = spark.createDataFrame([(1, "a b c"), (2, "b c d")], "doc_id long, text string")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = kneser_ney_bigram_scores(docs)
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "plan construction launched a Spark job"
    # the normalizer is part of the one plan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_ntypes" in plan


def test_perplexity_buckets_thresholds_and_composition(spark):
    """Bucket assignment is a pure threshold function of the rounded KN
    score; every document lands in exactly one bucket and the
    assignment matches recomputing from kneser_ney_bigram_scores."""
    from gfw_data_api_spark.llmops.text import (
        kneser_ney_bigram_scores,
        perplexity_buckets,
    )

    rows = [
        (1, "a b a b a b a b"),   # repetitive: high-probability bigrams
        (2, "a b c d e f g h"),   # all-distinct bigrams
        (3, "a b a b c d c d"),
        (4, "x y z x y z x y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cutoffs = (-0.8, -0.45)
    out = {r.doc_id: r for r in perplexity_buckets(docs, cutoffs=cutoffs).collect()}
    scores = {r.doc_id: r for r in kneser_ney_bigram_scores(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    for doc_id, row in out.items():
        s = round(scores[doc_id].kn_avg_logprob, 4)
        want = "head" if s > cutoffs[1] else ("middle" if s > cutoffs[0] else "tail")
        assert row.bucket == want, (doc_id, s, row.bucket)
        assert row.score_r == pytest.approx(s, abs=1e-9)
        assert row.n_bigrams == scores[doc_id].n_bigrams
    # the planted corpus is spread enough to hit more than one bucket
    assert len({r.bucket for r in out.values()}) >= 2


def test_corpus_report_golden(spark):
    from gfw_data_api_spark.llmops.text import corpus_report

    rows = [
        (1, "a b c d", "en"),
        (2, "a b", "en"),
        (3, "x y z", "es"),
        (4, "q", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["metric"]: r["value"] for r in corpus_report(df).collect()}
    assert got["n_docs"] == 4.0
    assert got["total_tokens"] == 10.0
    assert got["mean_tokens"] == 2.5
    assert got["min_tokens"] == 1.0 and got["max_tokens"] == 4.0
    assert got["distinct_langs"] == 3.0
    assert got["top_lang_share"] == 0.5  # en: 2 of 4
    import math

    want_entropy = -(0.5 * math.log(0.5) + 0.25 * math.log(0.25) * 2)
    assert got["lang_entropy"] == pytest.approx(want_entropy, abs=1e-9)
    # exact interpolated median of [1, 2, 3, 4]
    assert got["p50_tokens"] == 2.5


def test_corpus_report_without_lang(spark):
    from gfw_data_api_spark.llmops.text import corpus_report

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    got = {r["metric"] for r in corpus_report(df, lang_col=None).collect()}
    assert "n_docs" in got and "lang_entropy" not in got


def test_ppjoin_equals_exact_jaccard(spark):
    """PPJoin prefix filtering is EXACT: identical pair set + values to
    the uncapped inverted-index join on a random corpus with planted
    near-dups."""
    import numpy as np

    from gfw_data_api_spark.llmops.dedup import ngram_jaccard_pairs, ppjoin_pairs

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(6, 20))))
        for i in range(50)
    ]
    rows.append((100, rows[3][1] + " tail"))
    rows.append((101, rows[7][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ppjoin_pairs(df, shingle_n=2, threshold=0.3).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(
            df, shingle_n=2, threshold=0.3, max_doc_frequency=None
        ).collect()
    }
    assert got == want
    assert (3, 100) in got and (7, 101) in got


def test_ppjoin_handles_hot_shingles_without_cap(spark):
    """A corpus-wide hot phrase (in EVERY doc) never reaches the prefix
    index, yet Jaccard stays exact (the hot shingle still counts in the
    verify stage)."""
    from gfw_data_api_spark.llmops.dedup import ppjoin_pairs

    rows = [
        (1, "common phrase here alpha beta gamma"),
        (2, "common phrase here alpha beta delta"),
        (3, "common phrase here zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ppjoin_pairs(df, shingle_n=2, threshold=0.5).collect()}
    # docs 1,2: bigram sets of size 5 sharing 4 ("common phrase",
    # "phrase here", "here alpha", "alpha beta") → 4/6
    assert got == {(1, 2): pytest.approx(4 / 6)}


def test_vocabulary_stats_golden(spark):
    from gfw_data_api_spark.llmops.text import vocabulary_stats

    rows = [(1, "a a a b b c"), (2, "a d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = vocabulary_stats(df).collect()[0]
    assert r["total_tokens"] == 8
    assert r["distinct_tokens"] == 4          # a b c d
    assert r["hapax_count"] == 2              # c, d
    assert r["type_token_ratio"] == 0.5
    assert r["top10_share"] == 1.0            # all 4 types fit the head


def test_reciprocal_rank_fusion_semantics(spark):
    """RRF = Σ 1/(k + per-source rank); ranks assigned by (score desc,
    id asc) within each source; docs in both lists outrank docs in one."""
    from gfw_data_api_spark.llmops.similarity import reciprocal_rank_fusion

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0), (4, 1.0)], "doc_id long, s double"
    )
    sem = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7)], "vec_id long, c double"
    )
    out = {
        r.doc_id: r
        for r in reciprocal_rank_fusion(
            [("lex", lex, "doc_id", "s"), ("sem", sem, "vec_id", "c")],
            rrf_k=60,
            top_k=10,
        ).collect()
    }
    # lex ranks: 1→1, 2→2 (score tie broken by id), 3→3, 4→4
    # sem ranks: 3→1, 5→2, 1→3
    expect = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 64,
        5: 1 / 62,
    }
    assert set(out) == set(expect)
    for doc_id, want in expect.items():
        assert out[doc_id].rrf_score == pytest.approx(want, abs=1e-9)
    assert out[1].n_sources == 2 and out[3].n_sources == 2
    assert out[2].n_sources == 1
    # two-source docs 1 and 3 tie exactly; both outrank every single-source doc
    ranked = sorted(out.values(), key=lambda r: (-r.rrf_score, r.doc_id))
    assert [r.doc_id for r in ranked[:2]] == [1, 3]

    with pytest.raises(ValueError):
        reciprocal_rank_fusion([])


def test_reciprocal_rank_fusion_keeps_native_string_ids(spark):
    """ADVICE r5: non-numeric doc ids must keep their native type --
    the old cast('long') NULLed them into one bogus fused group."""
    from gfw_data_api_spark.llmops.similarity import reciprocal_rank_fusion

    lex = spark.createDataFrame(
        [("doc-a", 9.0), ("doc-b", 5.0)], "doc_id string, s double"
    )
    sem = spark.createDataFrame(
        [("doc-b", 0.9), ("doc-c", 0.8)], "vec_id string, c double"
    )
    out = {
        r.doc_id: r
        for r in reciprocal_rank_fusion(
            [("lex", lex, "doc_id", "s"), ("sem", sem, "vec_id", "c")],
            rrf_k=60,
            top_k=10,
        ).collect()
    }
    assert set(out) == {"doc-a", "doc-b", "doc-c"}
    assert out["doc-b"].n_sources == 2
    assert out["doc-b"].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=1e-9)


class TestHardNegativeMining:
    def test_hand_computed_mining(self, spark):
        from gfw_data_api_spark.llmops.similarity import hard_negative_mining

        cands = spark.createDataFrame(
            [
                (1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7), (1, 13, 0.6),
                (2, 20, 0.95), (2, 21, 0.94), (2, 22, 0.5),
            ],
            "query_id bigint, vec_id bigint, cosine double",
        )
        pos = spark.createDataFrame(
            [(1, 11), (2, 20)], "query_id bigint, vec_id bigint"
        )
        got = sorted(
            (r.query_id, r.vec_id, r.rank)
            for r in hard_negative_mining(cands, pos, k=2).collect()
        )
        # q1: positive 11 excluded → 10, 12; q2: positive 20 → 21, 22
        assert got == [(1, 10, 1), (1, 12, 2), (2, 21, 1), (2, 22, 2)]

    def test_tie_breaks_by_id(self, spark):
        from gfw_data_api_spark.llmops.similarity import hard_negative_mining

        cands = spark.createDataFrame(
            [(1, 30, 0.5), (1, 29, 0.5), (1, 31, 0.5)],
            "query_id bigint, vec_id bigint, cosine double",
        )
        pos = spark.createDataFrame([(1, 999)], "query_id bigint, vec_id bigint")
        got = [
            (r.vec_id, r.rank)
            for r in hard_negative_mining(cands, pos, k=3)
            .orderBy("rank")
            .collect()
        ]
        assert got == [(29, 1), (30, 2), (31, 3)]

    def test_window_is_partitioned(self, spark):
        from gfw_data_api_spark.llmops.similarity import hard_negative_mining

        cands = spark.createDataFrame(
            [(1, 10, 0.9)], "query_id bigint, vec_id bigint, cosine double"
        )
        pos = spark.createDataFrame([(1, 999)], "query_id bigint, vec_id bigint")
        plan = (
            hard_negative_mining(cands, pos)
            ._jdf.queryExecution()
            .toString()
        )
        assert "PARTITION BY" not in plan or "query_id" in plan
        assert "EvalPython" not in plan and "InPandas" not in plan
