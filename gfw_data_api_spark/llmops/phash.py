"""Perceptual image hashing: dHash / pHash + banded near-dup pairs.

The image analog of SimHash text dedup: decode each media payload
(llmops/multimodal.py codecs), reduce it to a 64-bit perceptual
fingerprint whose bits survive re-encoding, resizing, and brightness
shifts, then find near-duplicates with the SAME pigeonhole band-join
used for text SimHash (llmops/dedup._simhash_banded_pairs) — bucket on
16-bit chunks, verify exact Hamming with native bit_count. No
all-pairs comparison anywhere.

Hashes implemented (both standard, public algorithms):

- **dHash** (difference hash): bilinear-resize to 9×8 grayscale, emit
  one bit per adjacent-column comparison. Invariant to any uniform
  brightness/contrast-preserving shift (comparisons see differences
  only); robust to small noise when gradients are strong.
- **pHash** (DCT hash): bilinear-resize to 32×32 grayscale, 2-D
  orthonormal DCT-II, keep the low-frequency 8×8 block, threshold each
  coefficient against the median of the 63 AC coefficients (DC bit is
  forced 0). Robust to blur/resize/compression.

Scale shape: hashing is an Arrow-batched mapInPandas over payload
bytes (partition-parallel, no shuffle); pair generation is B band
rows per image → hash-shuffle bucket join → distinct → bit_count
verify, identical cost profile to the text SimHash path at 100 TB.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfw_data_api_spark.llmops.multimodal import (
    DECODE_ERRORS,
    bilinear_resize,
    decode_media,
)

# orthonormal DCT-II basis for the 32-point pHash transform
_DCT_N = 32


def _dct_matrix(n: int = _DCT_N) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _to_gray(img: np.ndarray) -> np.ndarray:
    """Channel-mean grayscale mixdown (uint8 → float64 2-D)."""
    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    if arr.ndim != 2:
        raise ValueError(f"expected (H, W[, C]) image, got shape {arr.shape}")
    return arr


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major bool array → signed 64-bit int (Spark LongType range)."""
    val = 0
    for b in bits.ravel():
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= 1 << 63 else val


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: 9×8 grayscale, adjacent-column compares."""
    g = bilinear_resize(np.clip(_to_gray(img), 0, 255).astype(np.uint8), 9, 8)
    g = g.astype(np.int32)
    return _pack_bits(g[:, 1:] > g[:, :-1])


def phash64(img: np.ndarray) -> int:
    """64-bit DCT hash: 32×32 grayscale, low-freq 8×8 vs AC median."""
    g = bilinear_resize(np.clip(_to_gray(img), 0, 255).astype(np.uint8), _DCT_N, _DCT_N)
    d = _DCT_M @ g.astype(np.float64) @ _DCT_M.T
    block = d[:8, :8].copy()
    ac = np.delete(block.ravel(), 0)
    med = np.median(ac)
    bits = block > med
    bits[0, 0] = False  # DC carries only global brightness — excluded
    return _pack_bits(bits)


def perceptual_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Append ``dhash``/``phash`` (long) per payload via mapInPandas.

    Undecodable or NULL payloads get NULL hashes (the codec-family skip
    convention). ``fake=True`` hashes the deterministic pseudo-decode
    reshaped to 8×8 so pipeline tests run without real image bytes.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("dhash", T.LongType()), T.StructField("phash", T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dh, ph = [], []
            for payload in pdf[payload_col]:
                if payload is None:
                    dh.append(None)
                    ph.append(None)
                    continue
                try:
                    img = decode_media(bytes(payload), "image", fake=fake)
                    if fake:
                        img = (img.reshape(8, 8) * 255).astype(np.uint8)
                    elif img.ndim == 4:
                        # animated decode (frame stack): hash the first
                        # composited frame so animated near-dups pair
                        # instead of silently NULLing
                        img = img[0]
                    dh.append(dhash64(img))
                    ph.append(phash64(img))
                except DECODE_ERRORS:
                    dh.append(None)
                    ph.append(None)
            pdf = pdf.copy()
            pdf["dhash"] = dh
            pdf["phash"] = ph
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def perceptual_neardup_pairs(
    hashed: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "media_id",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs: pigeonhole band join + exact verify.

    ``max_hamming`` must stay below ``bands`` (64/bands-bit chunks) for
    the pigeonhole guarantee — same contract as SimHash text dedup,
    whose banding machinery this reuses verbatim.
    """
    from gfw_data_api_spark.llmops.dedup import _simhash_banded_pairs

    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs at least {max_hamming + 1} bands "
            f"for the pigeonhole guarantee (got bands={bands})"
        )
    sim = hashed.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_sh")
    )
    return _simhash_banded_pairs(sim, 64, bands, max_hamming)
