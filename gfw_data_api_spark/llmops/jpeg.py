"""Pure-Python baseline JPEG (JFIF) codec.

Closes the last stubbed step in the multimodal family: ``decode_media``
previously raised at the JPEG seam because PIL/libjpeg are absent here.
This is an original implementation of the PUBLIC format (ITU-T T.81
baseline sequential DCT, JFIF container) — the reference shells out to
GDAL/PIL for all image handling, so there is nothing to port.

Supported decode subset (the overwhelming majority of real JPEGs):

- baseline sequential DCT (SOF0), 8-bit samples;
- progressive DCT (SOF2): spectral selection AND successive
  approximation (T.81 Annex G.1.2 — EOB runs, ZRL-with-correction-bits
  refinement, interleaved DC scans, non-interleaved AC scans, restarts);
- grayscale (1 component) and YCbCr (3 components);
- any sampling factors that divide the max factor (4:4:4, 4:2:2, 4:2:0);
- restart intervals (DRI / RSTn markers);

Arithmetic coding, hierarchical/lossless SOFs, 12-bit, and CMYK reject
with ``NotImplementedError`` naming the profile — same boundary style as
the PNG and FileGDB codecs.

``encode_jpeg`` is the fixture/export twin (4:4:4 or grayscale, Annex K
quantization tables scaled by ``quality``, Annex K Huffman tables): it
lets tests build REAL JPEG bytes without PIL, and round-trips through
``decode_jpeg`` within lossy tolerance. ``encode_jpeg_progressive`` is
the SOF2 twin: the SAME quantized coefficients emitted as a classic
progressive scan script (DC Al=1 → DC refine; per-component AC bands at
Al=1 → AC refinements to Al=0), so its decode is BIT-IDENTICAL to the
baseline encoding's decode — the equivalence the tests pin.

Performance: this is a per-byte Python bit reader — fine for the
thumbnail/fixture sizes the pipeline decodes in tests, and the Spark
plumbing (Arrow batches via mapInPandas) does not care which codec
fills the array. Swap in a vectorized/libjpeg decode at the same seam
for production throughput.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 — example luminance/chrominance quantization tables
QTABLE_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

QTABLE_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# Annex K.3 — typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _M.T @ block @ _M


def _dct2(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """JPEG canonical Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # pad with 1s past the end (T.81 F.2.2.5 allows it)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn — handled by caller at MCU edge
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:  # a real marker: stop feeding
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            out = (out << 1) | self.read_bit()
        return out

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: Huffman code not in table")

    def align_restart(self) -> None:
        """Consume padding + the RSTn marker at a restart boundary."""
        self.bitbuf = 0
        self.nbits = 0
        # scan forward to the marker
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("invalid JPEG: missing RSTn at restart interval")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a size-bit magnitude."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF decode → uint8 array (H, W, 3) RGB or (H, W, 1) gray."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG: bad SOI signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    coeff_store: dict[int, np.ndarray] | None = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("invalid JPEG: truncated at marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq != 0:
                    raise NotImplementedError("JPEG 16-bit quant tables unsupported")
                t = np.zeros(64)
                t[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, off)
                qtables[tq] = t.reshape(8, 8)
                off += 64
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                bits = list(seg[off : off + 16])
                off += 16
                n = sum(bits)
                vals = list(seg[off : off + n])
                off += n
                table = _build_huffman(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision} unsupported")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"JPEG {ncomp}-component images unsupported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">3B", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": height, "w": width, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                coeff_store = _alloc_coeff_store(frame)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} outside the baseline/progressive subset"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0x0F})
            if frame.get("progressive"):
                ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                pos = _progressive_sos(
                    data, pos + seg_len, frame, scan, ss, se,
                    ahal >> 4, ahal & 0x0F, dc_tables, ac_tables,
                    restart_interval, coeff_store,
                )
                # resync: skip entropy remnants to the next real marker
                while pos + 1 < len(data):
                    if (
                        data[pos] == 0xFF
                        and data[pos + 1] != 0x00
                        and not (0xD0 <= data[pos + 1] <= 0xD7)
                    ):
                        break
                    pos += 1
                continue
            if len(scan) == 1:
                # T.81 A.2.2: a single-component scan is non-interleaved —
                # MCU is ONE data unit in raster order and the declared
                # sampling factors do not apply (grayscale files often
                # keep h=v=2 from a color conversion)
                scan[0] = {**scan[0], "h": 1, "v": 1}
            return _decode_scan(
                data, pos + seg_len, frame, scan, qtables, dc_tables, ac_tables,
                restart_interval,
            )
        pos += seg_len
    if frame is not None and frame.get("progressive"):
        return _reconstruct_progressive(frame, coeff_store, qtables)
    raise ValueError("invalid JPEG: no SOS marker")


def _decode_scan(data, pos, frame, scan, qtables, dc_tables, ac_tables,
                 restart_interval):
    height, width = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    for c in scan:
        if hmax % c["h"] or vmax % c["v"]:
            # the integer-replication upsampler needs factors that divide
            # the max — anything else (e.g. 3:4) would silently produce
            # misaligned chroma, so reject per the module's subset policy
            raise NotImplementedError(
                f"JPEG sampling factors {c['h']}x{c['v']} do not divide "
                f"the max {hmax}x{vmax}; supported: divisor factors "
                "(4:4:4, 4:2:2, 4:2:0 and friends)"
            )
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # per-component plane at its natural (subsampled) resolution
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in scan
    }
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = {c["id"]: 0 for c in scan}
            for c in scan:
                dct = dc_tables[c["dc"]]
                act = ac_tables[c["ac"]]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64)
                        size = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(size), size)
                        preds[c["id"]] += diff
                        coeffs[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            sym = reader.decode_symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("invalid JPEG: bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("invalid JPEG: AC run overflow")
                            coeffs[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = coeffs
                        pixel = _idct2(block.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pixel
            mcu_count += 1
    return _assemble_image(planes, scan, height, width, hmax, vmax)


def _assemble_image(planes, comps, height, width, hmax, vmax) -> np.ndarray:
    """Component planes → uint8 image: chroma upsample (nearest), crop,
    YCbCr→RGB. Shared by the baseline and progressive reconstructions."""
    if len(comps) == 1:
        gray = np.clip(planes[comps[0]["id"]][:height, :width], 0, 255)
        return np.round(gray).astype(np.uint8)[:, :, None]
    full = {}
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full[c["id"]] = p[:height, :width]
    y = full[comps[0]["id"]]
    cb = full[comps[1]["id"]] - 128.0
    cr = full[comps[2]["id"]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.round(np.clip(rgb, 0, 255)).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — T.81 Annex G.1.2
#
# Coefficients accumulate across scans in per-component int32 stores
# (zigzag order); reconstruction dequantizes + IDCTs once at EOI.
# ---------------------------------------------------------------------------


def _frame_geometry(frame) -> tuple[int, int, int, int]:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_coeff_store(frame) -> dict[int, np.ndarray]:
    _, _, mcux, mcuy = _frame_geometry(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _noninterleaved_blocks(frame, comp) -> tuple[int, int]:
    """Raster block grid of one component in a non-interleaved scan
    (T.81 A.1.1: component dims are ceil(X·Hi/Hmax), NOT MCU-padded)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _dc_first_block(reader, dct, pred, coef, al):
    size = reader.decode_symbol(dct)
    diff = _extend(reader.read_bits(size), size)
    pred += diff
    coef[0] = pred << al
    return pred


def _ac_first_block(reader, act, coef, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.decode_symbol(act)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("invalid JPEG: progressive AC run past Se")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, act, coef, ss, se, al, eobrun):
    """Successive-approximation AC refinement (G.1.2.3): correction bits
    for already-nonzero coefficients interleave with newly-significant
    ±1<<Al insertions; an EOB run covers remaining corrections."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.decode_symbol(act)
            r, s = sym >> 4, sym & 0x0F
            s_val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG: refinement magnitude != 1")
                s_val = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            # advance over r still-zero coefficients, emitting a correction
            # bit for every already-nonzero one passed (ZRL: r=15 → skips
            # 16 zeroes, the final one via the post-loop k advance)
            while k <= se:
                if coef[k] != 0:
                    if reader.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val:
                if k > se:
                    raise ValueError("invalid JPEG: refinement insert past Se")
                coef[k] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if reader.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_sos(
    data, pos, frame, scan, ss, se, ah, al,
    dc_tables, ac_tables, restart_interval, coeff_store,
) -> int:
    """Decode one progressive scan into the coefficient store; returns the
    position after the entropy-coded segment."""
    if ss == 0:
        if se != 0:
            raise ValueError("invalid JPEG: DC scan with Se != 0")
    else:
        if len(scan) != 1:
            raise ValueError("invalid JPEG: interleaved AC scan")
        if se > 63 or se < ss:
            raise ValueError("invalid JPEG: bad spectral band")
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in scan}
    eobrun = 0
    count = 0

    def at_restart():
        nonlocal preds, eobrun
        reader.align_restart()
        preds = {c["id"]: 0 for c in scan}
        eobrun = 0

    if len(scan) > 1:  # interleaved DC scan over the MCU grid
        _, _, mcux, mcuy = _frame_geometry(frame)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and count and count % restart_interval == 0:
                    at_restart()
                for c in scan:
                    store = coeff_store[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = store[my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                preds[c["id"]] = _dc_first_block(
                                    reader, dc_tables[c["dc"]], preds[c["id"]], coef, al
                                )
                            elif reader.read_bit():
                                coef[0] |= 1 << al
                count += 1
    else:  # non-interleaved: raster order over the component's blocks
        c = scan[0]
        store = coeff_store[c["id"]]
        nbx, nby = _noninterleaved_blocks(frame, c)
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and count and count % restart_interval == 0:
                    at_restart()
                coef = store[by, bx]
                if ss == 0:
                    if ah == 0:
                        preds[c["id"]] = _dc_first_block(
                            reader, dc_tables[c["dc"]], preds[c["id"]], coef, al
                        )
                    elif reader.read_bit():
                        coef[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first_block(
                        reader, ac_tables[c["ac"]], coef, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        reader, ac_tables[c["ac"]], coef, ss, se, al, eobrun
                    )
                count += 1
    return reader.pos


def _reconstruct_progressive(frame, coeff_store, qtables) -> np.ndarray:
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = {}
    for c in frame["comps"]:
        q = qtables[c["tq"]]
        store = coeff_store[c["id"]]
        nby, nbx = store.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                block = np.zeros(64)
                block[ZIGZAG] = store[by, bx].astype(np.float64)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(block.reshape(8, 8) * q) + 128.0
                )
        planes[c["id"]] = plane
    return _assemble_image(
        planes, frame["comps"], frame["h"], frame["w"], hmax, vmax
    )


# ---------------------------------------------------------------------------
# encoder twin (fixtures / export symmetry)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, size-bit code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _quantize_block(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """One 8×8 block → quantized zigzag coefficients (int64[64]). The ONE
    quantization expression both the baseline and progressive writers use
    — their bit-identical-coefficients contract (m07 gate) is enforced by
    sharing this function, not by keeping two copies in sync."""
    coeffs = _dct2(block - 128.0) / q
    return np.round(coeffs.reshape(64)[ZIGZAG]).astype(np.int64)


def _encode_block(writer, block, q, dc_codes, ac_codes, pred):
    """DCT+quantize+entropy-code one 8×8 block; returns the new DC pred."""
    zz = _quantize_block(block, q)
    diff = int(zz[0]) - pred
    size, code = _magnitude(diff)
    hcode, hlen = dc_codes[size]
    writer.write(hcode, hlen)
    if size:
        writer.write(code, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            hcode, hlen = ac_codes[0x00]  # EOB
            writer.write(hcode, hlen)
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hcode, hlen = ac_codes[0xF0]  # ZRL
            writer.write(hcode, hlen)
            run -= 16
        size, code = _magnitude(v)
        hcode, hlen = ac_codes[(run << 4) | size]
        writer.write(hcode, hlen)
        writer.write(code, size)
        run = 0
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of uint8 (H, W) / (H, W, 1) gray or (H, W, 3)
    RGB; ``subsampling`` is ``"444"`` or ``"420"`` (box-averaged chroma);
    ``restart_interval > 0`` emits DRI + RSTn every that many MCUs.
    Annex K tables scaled by ``quality``."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    if channels not in (1, 3):
        raise ValueError(f"encode_jpeg needs 1 or 3 channels, got {channels}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling}")
    sub = subsampling == "420" and channels == 3
    q_luma = _scaled_qtable(QTABLE_LUMA, quality)
    q_chroma = _scaled_qtable(QTABLE_CHROMA, quality)

    if channels == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128.0
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128.0
        comp_planes = [y, cb, cr]
        comp_q = [q_luma, q_chroma, q_chroma]
    else:
        comp_planes = [arr[:, :, 0].astype(np.float64)]
        comp_q = [q_luma]

    dc_codes = [_encode_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_encode_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # MCU geometry: 4:2:0 packs a 16×16 luma patch (2×2 blocks) + one
    # block of each half-resolution chroma plane per MCU
    mcu_px = 16 if sub else 8
    mcux = -(-width // mcu_px)
    mcuy = -(-height // mcu_px)

    def pad_to(p: np.ndarray, h: int, w: int) -> np.ndarray:
        return np.pad(p, ((0, h - p.shape[0]), (0, w - p.shape[1])), mode="edge")

    if sub:
        luma = pad_to(comp_planes[0], mcuy * 16, mcux * 16)
        # box-average 2×2 → half-resolution chroma
        def half(p: np.ndarray) -> np.ndarray:
            p = pad_to(p, mcuy * 16, mcux * 16)
            return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        chroma = [half(comp_planes[1]), half(comp_planes[2])]
    else:
        luma = pad_to(comp_planes[0], mcuy * 8, mcux * 8)
        chroma = [pad_to(p, mcuy * 8, mcux * 8) for p in comp_planes[1:]]

    writer = _BitWriter()
    preds = [0] * len(comp_planes)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()  # pads to a byte boundary in place
                writer.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                preds = [0] * len(comp_planes)
            if sub:
                for by in range(2):
                    for bx in range(2):
                        y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                        preds[0] = _encode_block(
                            writer, luma[y0 : y0 + 8, x0 : x0 + 8], comp_q[0],
                            dc_codes[0], ac_codes[0], preds[0])
                for ci, plane in enumerate(chroma, start=1):
                    y0, x0 = my * 8, mx * 8
                    preds[ci] = _encode_block(
                        writer, plane[y0 : y0 + 8, x0 : x0 + 8], comp_q[ci],
                        dc_codes[1], ac_codes[1], preds[ci])
            else:
                for ci, plane in enumerate([luma] + chroma):
                    tsel = 0 if ci == 0 else 1
                    y0, x0 = my * 8, mx * 8
                    preds[ci] = _encode_block(
                        writer, plane[y0 : y0 + 8, x0 : x0 + 8], comp_q[ci],
                        dc_codes[tsel], ac_codes[tsel], preds[ci])
            mcu_count += 1

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def qt_body(tq: int, q: np.ndarray) -> bytes:
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = q.reshape(64)[ZIGZAG].astype(np.uint8)
        return bytes([tq]) + zz.tobytes()

    def ht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, qt_body(0, q_luma))
    if channels == 3:
        out += seg(0xDB, qt_body(1, q_chroma))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for i in range(channels):
        hv = 0x22 if (sub and i == 0) else 0x11
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    out += seg(0xC0, sof)
    out += seg(0xC4, ht_body(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += seg(0xC4, ht_body(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if channels == 3:
        out += seg(0xC4, ht_body(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += seg(0xC4, ht_body(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    sos = bytes([channels])
    for i in range(channels):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder twin (SOF2 fixtures)
# ---------------------------------------------------------------------------


def _quantized_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a (padded) plane → quantized zigzag coefficients,
    shape (nby, nbx, 64) int64 — delegates to the SAME ``_quantize_block``
    the baseline ``_encode_block`` uses, so both writers emit identical
    values by construction."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            out[by, bx] = _quantize_block(block, q)
    return out


def _write_dc_first(writer, blocks_by_comp, comp_order, dc_codes, al):
    """Interleaved (4:4:4 / gray: one block per comp per MCU) DC scan at
    successive-approximation level ``al``."""
    preds = [0] * len(comp_order)
    nby, nbx = blocks_by_comp[comp_order[0]].shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            for ci in comp_order:
                v = int(blocks_by_comp[ci][by, bx, 0]) >> al  # arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                size, code = _magnitude(diff)
                hcode, hlen = dc_codes[ci][size]
                writer.write(hcode, hlen)
                if size:
                    writer.write(code, size)


def _write_dc_refine(writer, blocks_by_comp, comp_order, al):
    nby, nbx = blocks_by_comp[comp_order[0]].shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            for ci in comp_order:
                writer.write((int(blocks_by_comp[ci][by, bx, 0]) >> al) & 1, 1)


def _write_ac_first(writer, blocks, ac_codes, ss, se, al):
    """Non-interleaved AC band scan at level ``al`` (point transform
    truncates toward zero, per G.1.2.2); per-block EOB, no cross-block
    EOB runs (EOB0 == an EOB run of 1)."""
    nby, nbx = blocks.shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            zz = blocks[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                v = -((-v) >> al) if v < 0 else v >> al
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    hcode, hlen = ac_codes[0xF0]
                    writer.write(hcode, hlen)
                    run -= 16
                size, code = _magnitude(v)
                hcode, hlen = ac_codes[(run << 4) | size]
                writer.write(hcode, hlen)
                writer.write(code, size)
                run = 0
            if run:
                hcode, hlen = ac_codes[0x00]  # EOB
                writer.write(hcode, hlen)


def _write_ac_refine(writer, blocks, ac_codes, ss, se, al):
    """AC successive-approximation refinement ``al+1 → al``: newly
    significant coefficients (|v|>>al == 1) emit as runs of
    still-zero-history positions; already-nonzero positions contribute
    buffered correction bits that flush after each symbol (mirroring the
    decoder's interleaved read order); per-block EOB covers the tail."""
    nby, nbx = blocks.shape[:2]
    for by in range(nby):
        for bx in range(nbx):
            zz = blocks[by, bx]
            run = 0
            pending: list[int] = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                a = abs(v) >> al
                if a == 0:
                    run += 1
                    continue
                # pending ZRLs flush at ANY nonzero coefficient — history
                # or newly significant — before its bit is handled
                # (libjpeg jcphuff.c encode_mcu_AC_refine: `while (r > 15)`
                # runs ahead of the temp>1 branch). Flushing only at
                # newly-significant coefficients would emit a history
                # coefficient's correction bit ahead of the ZRL symbol the
                # decoder reads first, desynchronizing the scan.
                while run > 15:
                    hcode, hlen = ac_codes[0xF0]
                    writer.write(hcode, hlen)
                    for bit in pending:
                        writer.write(bit, 1)
                    pending = []
                    run -= 16
                if a > 1:  # history-nonzero: buffer its correction bit
                    pending.append(a & 1)
                    continue
                # newly significant at this level
                hcode, hlen = ac_codes[(run << 4) | 1]
                writer.write(hcode, hlen)
                writer.write(1 if v > 0 else 0, 1)
                for bit in pending:
                    writer.write(bit, 1)
                pending = []
                run = 0
            if run or pending:
                hcode, hlen = ac_codes[0x00]  # EOB run of 1
                writer.write(hcode, hlen)
                for bit in pending:
                    writer.write(bit, 1)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    dc_al: int = 1,
    ac_al: int = 1,
    band_split: int = 5,
) -> bytes:
    """Progressive (SOF2) JFIF encode of uint8 gray / RGB, 4:4:4 only —
    the fixture twin of the progressive decoder. Classic scan script:

    1. interleaved DC first scan at Al=``dc_al`` + DC refinements to 0;
    2. per component, AC first scans for bands [1, band_split] and
       [band_split+1, 63] at Al=``ac_al``, then AC refinements to 0.

    Emits the SAME quantized coefficients as ``encode_jpeg(arr, quality,
    "444")``, so both decodes are bit-identical — the equivalence the
    tests pin."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    if channels not in (1, 3):
        raise ValueError(f"encode_jpeg_progressive needs 1 or 3 channels, got {channels}")
    if not (0 < band_split < 63):
        raise ValueError("band_split must split 1..63")
    q_luma = _scaled_qtable(QTABLE_LUMA, quality)
    q_chroma = _scaled_qtable(QTABLE_CHROMA, quality)

    if channels == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128.0
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128.0
        comp_planes = [y, cb, cr]
        comp_q = [q_luma, q_chroma, q_chroma]
    else:
        comp_planes = [arr[:, :, 0].astype(np.float64)]
        comp_q = [q_luma]

    mcux = -(-width // 8)
    mcuy = -(-height // 8)

    def pad_to(p: np.ndarray) -> np.ndarray:
        return np.pad(
            p, ((0, mcuy * 8 - p.shape[0]), (0, mcux * 8 - p.shape[1])), mode="edge"
        )

    blocks = [
        _quantized_blocks(pad_to(p), comp_q[i]) for i, p in enumerate(comp_planes)
    ]
    dc_codes_all = [_encode_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                    _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes_all = [_encode_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                    _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    dc_sel = [0] + [1] * (channels - 1)
    ac_sel = [0] + [1] * (channels - 1)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def qt_body(tq: int, q: np.ndarray) -> bytes:
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = q.reshape(64)[ZIGZAG].astype(np.uint8)
        return bytes([tq]) + zz.tobytes()

    def ht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    def sos_seg(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, (dc_sel[ci] << 4) | ac_sel[ci]])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, qt_body(0, q_luma))
    if channels == 3:
        out += seg(0xDB, qt_body(1, q_chroma))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for i in range(channels):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += seg(0xC2, sof)
    out += seg(0xC4, ht_body(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += seg(0xC4, ht_body(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if channels == 3:
        out += seg(0xC4, ht_body(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += seg(0xC4, ht_body(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))

    comp_order = list(range(channels))
    dc_codes = [dc_codes_all[dc_sel[ci]] for ci in comp_order]
    blocks_by_comp = {ci: blocks[ci] for ci in comp_order}

    # scan 1: DC first at Al=dc_al (interleaved)
    w = _BitWriter()
    _write_dc_first(w, blocks_by_comp, comp_order, dc_codes, dc_al)
    out += sos_seg(comp_order, 0, 0, 0, dc_al)
    out += w.flush()
    # DC refinements dc_al → 0
    for level in range(dc_al - 1, -1, -1):
        w = _BitWriter()
        _write_dc_refine(w, blocks_by_comp, comp_order, level)
        out += sos_seg(comp_order, 0, 0, level + 1, level)
        out += w.flush()
    # AC first scans per component, two spectral bands, at Al=ac_al
    bands = [(1, band_split), (band_split + 1, 63)]
    for ci in comp_order:
        codes = ac_codes_all[ac_sel[ci]]
        for ss, se in bands:
            w = _BitWriter()
            _write_ac_first(w, blocks[ci], codes, ss, se, ac_al)
            out += sos_seg([ci], ss, se, 0, ac_al)
            out += w.flush()
    # AC refinements ac_al → 0
    for level in range(ac_al - 1, -1, -1):
        for ci in comp_order:
            codes = ac_codes_all[ac_sel[ci]]
            for ss, se in bands:
                w = _BitWriter()
                _write_ac_refine(w, blocks[ci], codes, ss, se, level)
                out += sos_seg([ci], ss, se, level + 1, level)
                out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)
