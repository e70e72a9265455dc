"""P5: Cloud-Optimized GeoTIFF assembly — a real writer, not a stub.

The reference's COG job shells out to ``gdalbuildvrt`` + ``gdal_translate
-of COG`` (batch/scripts/cogify.sh, app/tasks/cog_assets.py:36-117). No
GDAL exists in this environment, so the COG container is written directly
from its public specs (TIFF 6.0 + the OGC COG layout + GeoTIFF keys):

- classic little-endian TIFF, tiled, deflate-compressed;
- IFD chain at the FILE FRONT (full resolution first, then 2× reduced
  overviews flagged ``NewSubfileType=1``) — the property that makes a
  GeoTIFF "cloud-optimized": one ranged read fetches all metadata;
- tile data ordered smallest-overview-first, full resolution last, so a
  zoomed-out client reads only the file head;
- GeoTIFF georeferencing (ModelPixelScale + ModelTiepoint + EPSG:4326
  GeoKeys) and GDAL's nodata tag.

``read_cog`` is a minimal reader for the written subset — round-trip
tests prove the container parses without GDAL.

Scale note: tile COMPUTATION is distributed (the pixel tables, band
algebra, pyramids are Spark jobs); container ASSEMBLY is a driver-side
stream of compressed tiles, same as the reference's single gdal_translate
process — a COG is one file; writing it is inherently one writer.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

_TIFF_TYPES = {"SHORT": 3, "LONG": 4, "DOUBLE": 12, "ASCII": 2}
_TYPE_SIZE = {3: 2, 4: 4, 12: 8, 2: 1}

# numpy dtype → (BitsPerSample, SampleFormat); SampleFormat 1=uint 2=int 3=float
_DTYPES = {
    np.dtype("uint8"): (8, 1),
    np.dtype("uint16"): (16, 1),
    np.dtype("int16"): (16, 2),
    np.dtype("int32"): (32, 2),
    np.dtype("uint32"): (32, 1),
    np.dtype("float32"): (32, 3),
    np.dtype("float64"): (64, 3),
}


def _downsample2x(a: np.ndarray, nodata) -> np.ndarray:
    """2× reduction, GDAL-default NEAREST (top-left pixel of each 2×2)."""
    return a[::2, ::2]


def _tile_blobs(a: np.ndarray, tile: int, nodata) -> tuple[list[bytes], int, int]:
    h, w = a.shape
    tiles_down = math.ceil(h / tile)
    tiles_across = math.ceil(w / tile)
    blobs = []
    for ty in range(tiles_down):
        for tx in range(tiles_across):
            block = np.full((tile, tile), nodata, dtype=a.dtype)
            ys, xs = ty * tile, tx * tile
            piece = a[ys : ys + tile, xs : xs + tile]
            block[: piece.shape[0], : piece.shape[1]] = piece
            blobs.append(zlib.compress(block.tobytes(), 6))
    return blobs, tiles_across, tiles_down


def _entry(tag: int, ttype: str, values, data_area: bytearray, data_base: int) -> bytes:
    """One 12-byte IFD entry; spills >4-byte payloads into data_area."""
    code = _TIFF_TYPES[ttype]
    if ttype == "ASCII":
        payload = values.encode("ascii") + b"\x00"
        count = len(payload)
    else:
        fmt = {"SHORT": "<H", "LONG": "<I", "DOUBLE": "<d"}[ttype]
        payload = b"".join(struct.pack(fmt, v) for v in values)
        count = len(values)
    if len(payload) <= 4:
        return struct.pack("<HHI", tag, code, count) + payload.ljust(4, b"\x00")
    offset = data_base + len(data_area)
    data_area.extend(payload)
    if len(data_area) % 2:
        data_area.extend(b"\x00")
    return struct.pack("<HHII", tag, code, count, offset)


def write_cog(
    path: str,
    array: np.ndarray,
    *,
    nw_lon: float,
    nw_lat: float,
    pixel_size: float,
    nodata: float | int = 0,
    tile_size: int = 256,
    min_overview_size: int = 256,
) -> dict:
    """Write ``array`` (rows north→south) as a Cloud-Optimized GeoTIFF.

    Returns a summary dict (levels, tile counts, file size).
    """
    if array.dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {array.dtype}")
    bits, sample_format = _DTYPES[array.dtype]

    # pyramid: full res + 2× overviews down to min_overview_size
    levels = [array]
    while min(levels[-1].shape) > min_overview_size:
        levels.append(_downsample2x(levels[-1], nodata))

    per_level = [_tile_blobs(a, tile_size, nodata) for a in levels]

    # ---- layout ----------------------------------------------------------
    # header | IFDs (full-res, ov1, ov2, ...) | out-of-line values | tile
    # data (smallest overview first, full-res last)
    n_entries = []
    for i, a in enumerate(levels):
        n = 11  # width,length,bits,compression,photometric,samples,tilew,tileh,offsets,counts,sampleformat
        if i == 0:
            n += 3  # pixelscale, tiepoint, geokeys
            n += 1  # nodata
        if i > 0:
            n += 1  # NewSubfileType
        n_entries.append(n)

    pos = 8
    ifd_offsets = []
    for n in n_entries:
        ifd_offsets.append(pos)
        pos += 2 + 12 * n + 4
    data_base = pos  # out-of-line value area starts here

    # lay out the out-of-line value area: per-level tile offset/count
    # arrays first (their positions go into IFD entries), geo payloads
    # after
    tile_array_slots = []  # (offsets_pos, counts_pos) per level
    probe = 0
    for i, (blobs, _, _) in enumerate(per_level):
        n_tiles = len(blobs)
        off_pos = data_base + probe
        probe += 4 * n_tiles if n_tiles > 1 else 0
        cnt_pos = data_base + probe
        probe += 4 * n_tiles if n_tiles > 1 else 0
        tile_array_slots.append((off_pos, cnt_pos))
    # geo payload area comes after the tile arrays
    geo_area_start = data_base + probe

    # tile data region: after out-of-line values (geo area sized later);
    # compute geo payload sizes exactly by serializing into a scratch area
    scratch = bytearray()
    geo_entries_scratch: list[bytes] = []
    gd_nodata = f"{nodata:g}"
    geokeys = [
        1, 1, 0, 3,  # version, rev, minor, number of keys
        1024, 0, 1, 2,  # GTModelType = geographic
        1025, 0, 1, 1,  # GTRasterType = PixelIsArea
        2048, 0, 1, 4326,  # GeographicType = EPSG:4326
    ]
    geo_entries_scratch.append(
        _entry(33550, "DOUBLE", [pixel_size, pixel_size, 0.0], scratch, geo_area_start)
    )
    geo_entries_scratch.append(
        _entry(
            33922, "DOUBLE", [0.0, 0.0, 0.0, nw_lon, nw_lat, 0.0], scratch, geo_area_start
        )
    )
    geo_entries_scratch.append(_entry(34735, "SHORT", geokeys, scratch, geo_area_start))
    geo_entries_scratch.append(_entry(42113, "ASCII", gd_nodata, scratch, geo_area_start))
    geo_area = bytes(scratch)

    tile_data_start = geo_area_start + len(geo_area)
    if tile_data_start % 2:
        tile_data_start += 1

    # assign tile offsets: smallest overview first, full-res last
    tile_offsets: list[list[int]] = [[] for _ in levels]
    tile_counts: list[list[int]] = [[len(b) for b in blobs] for blobs, _, _ in per_level]
    cursor = tile_data_start
    for i in reversed(range(len(levels))):
        for blob in per_level[i][0]:
            tile_offsets[i].append(cursor)
            cursor += len(blob) + (len(blob) % 2)

    # ---- serialize -------------------------------------------------------
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_offsets[0])
    tile_value_area = bytearray()
    for i, a in enumerate(levels):
        blobs, across, down = per_level[i]
        n_tiles = len(blobs)
        entries = []
        if i > 0:
            entries.append(_entry(254, "LONG", [1], tile_value_area, 0))
        entries.append(_entry(256, "LONG", [a.shape[1]], tile_value_area, 0))
        entries.append(_entry(257, "LONG", [a.shape[0]], tile_value_area, 0))
        entries.append(_entry(258, "SHORT", [bits], tile_value_area, 0))
        entries.append(_entry(259, "SHORT", [8], tile_value_area, 0))  # deflate
        entries.append(_entry(262, "SHORT", [1], tile_value_area, 0))
        entries.append(_entry(277, "SHORT", [1], tile_value_area, 0))
        entries.append(_entry(322, "LONG", [tile_size], tile_value_area, 0))
        entries.append(_entry(323, "LONG", [tile_size], tile_value_area, 0))
        off_pos, cnt_pos = tile_array_slots[i]
        if n_tiles == 1:
            entries.append(
                struct.pack("<HHII", 324, 4, 1, tile_offsets[i][0])
            )
            entries.append(struct.pack("<HHII", 325, 4, 1, tile_counts[i][0]))
        else:
            entries.append(struct.pack("<HHII", 324, 4, n_tiles, off_pos))
            entries.append(struct.pack("<HHII", 325, 4, n_tiles, cnt_pos))
        entries.append(_entry(339, "SHORT", [sample_format], tile_value_area, 0))
        if i == 0:
            entries.extend(geo_entries_scratch)
        entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])  # TIFF: ascending tag order
        next_ifd = ifd_offsets[i + 1] if i + 1 < len(levels) else 0
        out += struct.pack("<H", len(entries))
        out += b"".join(entries)
        out += struct.pack("<I", next_ifd)

    assert len(out) == data_base, (len(out), data_base)
    # out-of-line tile offset/count arrays
    for i in range(len(levels)):
        if len(per_level[i][0]) > 1:
            out += b"".join(struct.pack("<I", v) for v in tile_offsets[i])
            out += b"".join(struct.pack("<I", v) for v in tile_counts[i])
    out += geo_area
    if len(out) % 2:
        out += b"\x00"
    assert len(out) == tile_data_start, (len(out), tile_data_start)
    for i in reversed(range(len(levels))):
        for blob in per_level[i][0]:
            out += blob
            if len(blob) % 2:
                out += b"\x00"

    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return {
        "levels": len(levels),
        "shape": array.shape,
        "tiles": [len(b[0]) for b in per_level],
        "bytes": len(out),
    }


# ---------------------------------------------------------------------------
# minimal reader (round-trip verification without GDAL)
# ---------------------------------------------------------------------------


def read_cog(path: str) -> list[dict]:
    """Parse every IFD of a COG written by :func:`write_cog`; returns one
    dict per level with the reassembled array and geo metadata."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:2] != b"II" or struct.unpack_from("<H", buf, 2)[0] != 42:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    levels = []
    while ifd_off:
        (n,) = struct.unpack_from("<H", buf, ifd_off)
        tags: dict[int, list] = {}
        for i in range(n):
            tag, ttype, count = struct.unpack_from("<HHI", buf, ifd_off + 2 + 12 * i)
            raw_off = ifd_off + 2 + 12 * i + 8
            size = _TYPE_SIZE[ttype] * count
            if size <= 4:
                src = raw_off
            else:
                (src,) = struct.unpack_from("<I", buf, raw_off)
            if ttype == 2:
                tags[tag] = [buf[src : src + count - 1].decode("ascii")]
            else:
                fmt = {3: "<H", 4: "<I", 12: "<d"}[ttype]
                step = _TYPE_SIZE[ttype]
                tags[tag] = [
                    struct.unpack_from(fmt, buf, src + j * step)[0] for j in range(count)
                ]
        width, height = tags[256][0], tags[257][0]
        tile_w, tile_h = tags[322][0], tags[323][0]
        bits, sfmt = tags[258][0], tags[339][0]
        dtype = {
            (8, 1): "uint8", (16, 1): "uint16", (16, 2): "int16",
            (32, 2): "int32", (32, 1): "uint32", (32, 3): "float32", (64, 3): "float64",
        }[(bits, sfmt)]
        across = math.ceil(width / tile_w)
        down = math.ceil(height / tile_h)
        full = np.zeros((down * tile_h, across * tile_w), dtype=dtype)
        for idx, (toff, tcnt) in enumerate(zip(tags[324], tags[325])):
            block = np.frombuffer(
                zlib.decompress(buf[toff : toff + tcnt]), dtype=dtype
            ).reshape(tile_h, tile_w)
            ty, tx = divmod(idx, across)
            full[ty * tile_h : (ty + 1) * tile_h, tx * tile_w : (tx + 1) * tile_w] = block
        level = {
            "array": full[:height, :width],
            "reduced": bool(tags.get(254, [0])[0] & 1),
            "nodata": float(tags[42113][0]) if 42113 in tags else None,
            "pixel_scale": tags.get(33550),
            "tiepoint": tags.get(33922),
            "compression": tags[259][0],
        }
        levels.append(level)
        (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n)
    return levels


# ---------------------------------------------------------------------------
# tile-set → COG assembly (the P5 job)
# ---------------------------------------------------------------------------


def tile_array(pixel_ids, values, n: int, nodata=0, dtype="float32") -> np.ndarray:
    """Long-format (pixel_id, value) rows → the n×n tile array.

    THE one place that knows the pixel layout (pixel_id = row·n + col);
    shared by the COG assembly's executor-side pack and the per-tile
    GeoTIFF download route.
    """
    arr = np.full((n, n), nodata, dtype=dtype)
    pid = np.asarray(pixel_ids)
    arr[pid // n, pid % n] = np.asarray(values).astype(dtype)
    return arr


def cog_from_tile_set(
    spark,
    tile_set_path: str,
    grid,
    out_path: str,
    nodata: float | int = 0,
    dtype: str = "float32",
    tile_size: int = 256,
):
    """Assemble a COG from a long-format pixel tile set (pixels.py layout).

    Reads the (tile_id, pixel_id, value) parquet, packs each tile to ONE
    deflate-compressed blob on the executors (groupBy(tile_id) →
    applyInPandas), and collects only the blobs — the driver never holds
    per-pixel Rows, so memory there is O(tiles × compressed tile), not
    O(pixels). Mosaicking + container write stay driver-side (a COG is
    one file — same single-writer step as the reference's gdal_translate).
    Distributed work (rasterize, band algebra, pyramids for QUERYING)
    stays in Spark; this is the export leg.
    """
    import pandas as pd

    from gfw_data_api_spark.raster.grid import Grid  # noqa: F401 (doc link)

    df = spark.read.parquet(tile_set_path).select("tile_id", "pixel_id", "value")
    n = grid.pixels_per_side

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        arr = tile_array(
            pdf["pixel_id"].to_numpy(), pdf["value"].to_numpy(), n, nodata, dtype
        )
        return pd.DataFrame(
            [{"tile_id": key[0], "blob": zlib.compress(arr.tobytes(), 6)}]
        )

    packed = (
        df.groupBy("tile_id")
        .applyInPandas(pack, "tile_id string, blob binary")
        .collect()
    )
    if not packed:
        raise ValueError("empty tile set")
    tiles: dict[str, np.ndarray] = {
        r["tile_id"]: np.frombuffer(zlib.decompress(bytes(r["blob"])), dtype=dtype)
        .reshape(n, n)
        .copy()
        for r in packed
    }
    corners = {t: grid.parse_tile_id(t) for t in tiles}
    # full geographic ranges between the extreme tiles — a sparse tile set
    # (ocean gaps etc.) must NOT compact, or tiles land at wrong coords
    step = grid.tile_deg
    lat_max = max(c[0] for c in corners.values())
    lat_min = min(c[0] for c in corners.values())
    lon_min = min(c[1] for c in corners.values())
    lon_max = max(c[1] for c in corners.values())
    lats = [lat_max - i * step for i in range(int(round((lat_max - lat_min) / step)) + 1)]
    lons = [lon_min + i * step for i in range(int(round((lon_max - lon_min) / step)) + 1)]
    mosaic = np.full((n * len(lats), n * len(lons)), nodata, dtype=dtype)
    for t, (lat, lon) in corners.items():
        yi = int(round((lat_max - lat) / step))
        xi = int(round((lon - lon_min) / step))
        mosaic[yi * n : (yi + 1) * n, xi * n : (xi + 1) * n] = tiles[t]
    info = write_cog(
        out_path,
        mosaic,
        nw_lon=lons[0],
        nw_lat=lats[0],
        pixel_size=grid.pixel_size,
        nodata=nodata,
        tile_size=tile_size,
    )
    return info
