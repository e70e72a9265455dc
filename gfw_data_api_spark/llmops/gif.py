"""Pure-Python GIF decoder (GIF87a/89a) + minimal encoder twin.

Closes the GIF corner of the multimodal codec seam
(llmops/multimodal.py): static and animated GIFs decode natively —
variable-width LZW, global/local color tables, interlacing,
transparency, and frame composition with disposal methods 0/1
(draw-over) and 2 (restore to background). Animated GIFs surface the
same frame model as MJPEG-AVI, so the video frame-sampling operators
work on them unchanged.

The encoder twin writes valid single- or multi-frame GIFs using the
classic minimal-LZW scheme (emit every pixel index as a literal code
with a clear code each 2^width-2 symbols — spec-conformant, no
compression), which is all fixtures and tests need.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


class _BitReader:
    """LSB-first bit reader over concatenated data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            out |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF variable-width LZW → index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _BitReader(data)
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1, None

    table, width, prev = reset()
    next_code = eoi + 1
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == clear:
            table, width, prev = reset()
            next_code = eoi + 1
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW: invalid code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode a GIF → ``(frames, delays_ms)``.

    Frames are composited (H, W, 3) uint8 canvases in screen
    coordinates; transparency within a frame shows the pixels beneath
    (disposal 0/1) or the background (disposal 2).
    """
    if data[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("not a GIF: truncated logical screen descriptor")
    width, height, flags, bg_index, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    delays: list[int] = []
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if global_table is not None:
        canvas[:, :] = global_table[bg_index % len(global_table)]
    background = canvas.copy()
    transparent: int | None = None
    delay_ms = 0
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("GIF sub-blocks truncated")
            n = data[p]
            p += 1
            if n == 0:
                break
            chunks.append(data[p : p + n])
            p += n
        return b"".join(chunks), p

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gflags, delay_cs, tindex = struct.unpack_from("<BHB", body, 0)
                transparent = tindex if gflags & 1 else None
                delay_ms = delay_cs * 10
                disposal = (gflags >> 2) & 0x7
                if disposal == 3:
                    # restore-to-previous needs a frame-history stack we
                    # don't keep; compositing it as draw-over would hash
                    # and render WRONG pixels — reject per module policy
                    raise NotImplementedError(
                        "GIF disposal method 3 (restore to previous) outside "
                        "subset; supported: 0/1 (draw over), 2 (background)"
                    )
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = np.frombuffer(
            _lzw_decode(lzw, min_code, fw * fh), np.uint8
        ).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        rgb = table[np.minimum(idx, len(table) - 1)]
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore the painted region to background
            canvas[top : top + fh, left : left + fw] = background[
                top : top + fh, left : left + fw
            ]
        # GIF89a: a Graphic Control Extension governs only the single
        # rendering block that follows — reset ALL of its state, not
        # just transparency, so GCE-less frames get the spec defaults
        transparent = None
        disposal = 0
        delay_ms = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames, delays


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delays_ms: list[int] | None = None,
) -> bytes:
    """Minimal GIF writer — fixture/export twin of :func:`decode_gif`.

    Accepts one (H, W, 3) frame or a list of same-shape frames (each
    quantized to its own ≤256-color local table built from unique
    colors — fixture images must stay under 256 distinct colors).
    Multi-frame inputs get an animation loop with per-frame delays.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if delays_ms is None:
        delays_ms = [100] * len(frames)
    if len(delays_ms) != len(frames):
        raise ValueError(
            f"delays_ms has {len(delays_ms)} entries for {len(frames)} frames"
        )
    height, width = frames[0].shape[:2]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0, 0, 0)  # no global table
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever

    for frame, delay in zip(frames, delays_ms):
        arr = np.asarray(frame, dtype=np.uint8)
        if arr.shape[:2] != (height, width) or arr.ndim != 3:
            raise ValueError("all GIF frames must be (H, W, 3) of equal size")
        colors, inverse = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("encode_gif supports up to 256 distinct colors per frame")
        bits = max(1, int(len(colors) - 1).bit_length())
        table_n = 1 << bits
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay // 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0x80 | (bits - 1))
        table = np.zeros((table_n, 3), dtype=np.uint8)
        table[: len(colors)] = colors
        out += table.tobytes()
        # minimal LZW: literal codes with periodic clear so the width
        # never has to grow
        min_code = max(2, bits)
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        codes: list[int] = [clear]
        budget = (1 << (min_code + 1)) - eoi - 2  # literals before next clear
        count = 0
        for v in inverse:
            codes.append(int(v))
            count += 1
            if count >= budget:
                codes.append(clear)
                count = 0
        codes.append(eoi)
        # pack LSB-first at fixed width min_code+1
        w = min_code + 1
        acc = n_acc = 0
        packed = bytearray()
        for c in codes:
            acc |= c << n_acc
            n_acc += w
            while n_acc >= 8:
                packed.append(acc & 0xFF)
                acc >>= 8
                n_acc -= 8
        if n_acc:
            packed.append(acc & 0xFF)
        out.append(min_code)
        for i in range(0, len(packed), 255):
            chunk = packed[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
