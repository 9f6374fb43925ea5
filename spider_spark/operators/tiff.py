"""Stdlib baseline-TIFF / GeoTIFF writer and read-back parser.

The reference mosaics crawled tiles into a georeferenced GTiff with GDAL
(/root/reference/merge_tiles.py:66-129: per-tile WriteRaster placement,
then gdal.Translate with a 4-GCP list). A baseline uncompressed striped
TIFF is TIFF 6.0: an 8-byte header, pixel strips, and one IFD — writable
with ``struct.pack`` alone; georeferencing is three GeoTIFF tags
(ModelPixelScaleTag 33550, ModelTiepointTag 33922 carrying the GCPs, and a
minimal GeoKeyDirectoryTag 34735). No GDAL required.

The writer streams strips from an iterator (the mosaic feeds it tile-rows
assembled in executors), so the driver never holds the whole canvas.
``read_tiff`` parses the result back — header, IFD, geo tags, pixels — for
the round-trip tests.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable, Iterator

import numpy as np

_SHORT, _LONG, _DOUBLE = 3, 4, 12
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8}

TAG_NEW_SUBFILE_TYPE = 254
TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PLANAR_CONFIG = 284
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_GEO_KEY_DIRECTORY = 34735

# GeoKeyDirectory: version 1.1.0, 2 keys — GTModelType=2 (geographic
# lat/lon, the reference's tile CRS after its WGS-84 GCPs) and
# GTRasterType=1 (RasterPixelIsArea).
_GEO_KEYS = (1, 1, 0, 2, 1024, 0, 1, 2, 1025, 0, 1, 1)


def write_baseline_tiff(
    path: str,
    width: int,
    height: int,
    samples_per_pixel: int,
    rows_per_strip: int,
    strips: Iterable[bytes],
    pixel_scale: tuple[float, float, float] | None = None,
    tiepoints: list[tuple[float, float, float, float]] | None = None,
) -> None:
    """Write an uncompressed striped little-endian TIFF.

    ``strips`` yields strip payloads in order (each ``rows_per_strip``
    scanlines of ``width*spp`` bytes; the last may be shorter).
    ``tiepoints`` are GCPs as (pixel, line, geoX, geoY) — the reference's
    gdal.GCP list (/root/reference/merge_tiles.py:100-109)."""
    n_strips = -(-height // rows_per_strip)
    offsets: list[int] = []
    counts: list[int] = []
    with open(path, "wb") as f:
        f.write(b"II*\x00\x00\x00\x00\x00")  # IFD offset patched below
        for strip in strips:
            offsets.append(f.tell())
            counts.append(len(strip))
            f.write(strip)
        if len(offsets) != n_strips:
            raise ValueError(
                f"expected {n_strips} strips for height {height} at "
                f"{rows_per_strip} rows/strip, got {len(offsets)}"
            )
        ifd_offset = f.tell()
        if ifd_offset % 2:  # word-align the IFD
            f.write(b"\x00")
            ifd_offset += 1

        entries: list[tuple[int, int, int, object]] = [
            (TAG_WIDTH, _LONG, 1, width),
            (TAG_HEIGHT, _LONG, 1, height),
            (TAG_BITS_PER_SAMPLE, _SHORT, samples_per_pixel, (8,) * samples_per_pixel),
            (TAG_COMPRESSION, _SHORT, 1, 1),
            (TAG_PHOTOMETRIC, _SHORT, 1, 1 if samples_per_pixel == 1 else 2),
            (TAG_STRIP_OFFSETS, _LONG, n_strips, tuple(offsets)),
            (TAG_SAMPLES_PER_PIXEL, _SHORT, 1, samples_per_pixel),
            (TAG_ROWS_PER_STRIP, _LONG, 1, rows_per_strip),
            (TAG_STRIP_BYTE_COUNTS, _LONG, n_strips, tuple(counts)),
            (TAG_PLANAR_CONFIG, _SHORT, 1, 1),
        ]
        if pixel_scale is not None:
            entries.append((TAG_MODEL_PIXEL_SCALE, _DOUBLE, 3, tuple(pixel_scale)))
        if tiepoints:
            flat = tuple(
                v for (px, ln, gx, gy) in tiepoints for v in (px, ln, 0.0, gx, gy, 0.0)
            )
            entries.append((TAG_MODEL_TIEPOINT, _DOUBLE, len(flat), flat))
            entries.append(
                (TAG_GEO_KEY_DIRECTORY, _SHORT, len(_GEO_KEYS), _GEO_KEYS)
            )
        f.write(_pack_ifd(entries, ifd_offset))
        f.seek(4)
        f.write(struct.pack("<I", ifd_offset))


def _pack_ifd(
    entries: list[tuple[int, int, int, object]], ifd_offset: int,
    next_ifd: int = 0,
) -> bytes:
    """Serialize one IFD (sorted entries, out-of-line values right after
    the entry table, ``next_ifd`` chain pointer)."""
    entries = sorted(entries, key=lambda e: e[0])
    data_offset = ifd_offset + 2 + 12 * len(entries) + 4
    ifd = struct.pack("<H", len(entries))
    extra = b""
    fmt = {_SHORT: "H", _LONG: "I", _DOUBLE: "d"}
    for tag, typ, count, value in entries:
        vals = value if isinstance(value, tuple) else (value,)
        packed = struct.pack(f"<{count}{fmt[typ]}", *vals)
        if len(packed) <= 4:
            ifd += struct.pack("<HHI", tag, typ, count) + packed.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<HHII", tag, typ, count, data_offset + len(extra))
            extra += packed
    ifd += struct.pack("<I", next_ifd)
    return ifd + extra


def _parse_ifd(data: bytes, ifd_offset: int) -> tuple[dict[int, tuple], int]:
    """One IFD → (tags, next_ifd_offset). next == 0 means end of chain."""
    (n,) = struct.unpack("<H", data[ifd_offset : ifd_offset + 2])
    tags: dict[int, tuple] = {}
    fmt = {1: "B", 3: "H", 4: "I", 12: "d"}
    for i in range(n):
        off = ifd_offset + 2 + 12 * i
        tag, typ, count = struct.unpack("<HHI", data[off : off + 8])
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            raw = data[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack("<I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        tags[tag] = struct.unpack(f"<{count}{fmt[typ]}", raw)
    (nxt,) = struct.unpack(
        "<I", data[ifd_offset + 2 + 12 * n : ifd_offset + 2 + 12 * n + 4]
    )
    return tags, nxt


def _ifd_pixels(data: bytes, tags: dict[int, tuple]) -> np.ndarray:
    width = tags[TAG_WIDTH][0]
    height = tags[TAG_HEIGHT][0]
    spp = tags.get(TAG_SAMPLES_PER_PIXEL, (1,))[0]
    if tags.get(TAG_COMPRESSION, (1,))[0] != 1:
        raise ValueError("only uncompressed TIFF supported")
    buf = bytearray()
    for off, cnt in zip(tags[TAG_STRIP_OFFSETS], tags[TAG_STRIP_BYTE_COUNTS]):
        buf += data[off : off + cnt]
    pixels = np.frombuffer(bytes(buf), dtype=np.uint8)
    return (
        pixels.reshape(height, width, spp)
        if spp > 1
        else pixels.reshape(height, width)
    )


def read_tiff(path: str) -> dict:
    """Parse an (uncompressed, chunky) TIFF written by
    :func:`write_baseline_tiff` — or any compatible baseline file — into
    ``{"tags": {tag: value-tuple}, "pixels": ndarray, "gcps": [...],
    "overviews": [{"tags": ..., "pixels": ...}, ...]}``. Chained IFDs
    beyond the first (the :func:`append_overviews` pyramid) come back in
    ``overviews``, full-resolution first."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"II" or struct.unpack("<H", data[2:4])[0] != 42:
        raise ValueError("not a little-endian TIFF")
    (ifd_offset,) = struct.unpack("<I", data[4:8])
    tags, nxt = _parse_ifd(data, ifd_offset)
    pixels = _ifd_pixels(data, tags)

    overviews = []
    while nxt:
        otags, nxt = _parse_ifd(data, nxt)
        overviews.append({"tags": otags, "pixels": _ifd_pixels(data, otags)})

    gcps = []
    for j in range(0, len(tags.get(TAG_MODEL_TIEPOINT, ())), 6):
        px, ln, _, gx, gy, _ = tags[TAG_MODEL_TIEPOINT][j : j + 6]
        gcps.append((px, ln, gx, gy))
    return {"tags": tags, "pixels": pixels, "gcps": gcps, "overviews": overviews}


def _block_mean(a: np.ndarray, k: int) -> np.ndarray:
    """Rounded k×k block mean with partial edge blocks (GDAL 'AVERAGE'
    overview semantics) — (H, W, C) uint8 → (ceil(H/k), ceil(W/k), C)."""
    h, w, _ = a.shape
    ridx = np.arange(0, h, k)
    cidx = np.arange(0, w, k)
    s = np.add.reduceat(
        np.add.reduceat(a.astype(np.float64), ridx, axis=0), cidx, axis=1
    )
    rh = np.minimum(k, h - ridx)[:, None, None]
    cw = np.minimum(k, w - cidx)[None, :, None]
    return np.floor(s / (rh * cw) + 0.5).astype(np.uint8)


def append_overviews(path: str, levels: Iterable[int] = (2, 4)) -> None:
    """Append a reduced-resolution overview pyramid to an existing
    baseline TIFF — the stdlib counterpart of the reference's
    ``ds.BuildOverviews('AVERAGE', levels)`` post-pass on the merged
    mosaic (/root/reference/merge_tiles.py:124-129). Each level is a
    block-mean downsample of the BASE image by factor ``k``, written as
    its own chained IFD flagged NewSubfileType=1 (reduced-resolution
    subfile, TIFF 6.0 §8) with the whole level as one strip.

    Like GDAL's, this is a per-file post-pass on one mosaic (the mosaic
    itself is assembled distributed; overview math is local raster work
    on the finished artifact). The base IFD, pixels, and geo tags are
    untouched — only the next-IFD chain pointer is patched."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"II" or struct.unpack("<H", data[2:4])[0] != 42:
        raise ValueError("not a little-endian TIFF")
    base = read_tiff(path)
    px = base["pixels"]
    px3 = px[:, :, None] if px.ndim == 2 else px
    spp = px3.shape[2]

    # find the tail of the IFD chain (last IFD's next-pointer position)
    (ifd_offset,) = struct.unpack("<I", data[4:8])
    while True:
        (n,) = struct.unpack("<H", data[ifd_offset : ifd_offset + 2])
        next_ptr_pos = ifd_offset + 2 + 12 * n
        (nxt,) = struct.unpack("<I", data[next_ptr_pos : next_ptr_pos + 4])
        if not nxt:
            break
        ifd_offset = nxt

    with open(path, "r+b") as f:
        f.seek(0, 2)
        for k in levels:
            ov = _block_mean(px3, int(k))
            ov_h, ov_w = ov.shape[0], ov.shape[1]
            payload = ov.tobytes()
            if f.tell() % 2:
                f.write(b"\x00")
            strip_off = f.tell()
            f.write(payload)
            this_ifd = f.tell()
            if this_ifd % 2:
                f.write(b"\x00")
                this_ifd += 1
            entries = [
                (TAG_NEW_SUBFILE_TYPE, _LONG, 1, 1),
                (TAG_WIDTH, _LONG, 1, ov_w),
                (TAG_HEIGHT, _LONG, 1, ov_h),
                (TAG_BITS_PER_SAMPLE, _SHORT, spp, (8,) * spp),
                (TAG_COMPRESSION, _SHORT, 1, 1),
                (TAG_PHOTOMETRIC, _SHORT, 1, 1 if spp == 1 else 2),
                (TAG_STRIP_OFFSETS, _LONG, 1, strip_off),
                (TAG_SAMPLES_PER_PIXEL, _SHORT, 1, spp),
                (TAG_ROWS_PER_STRIP, _LONG, 1, ov_h),
                (TAG_STRIP_BYTE_COUNTS, _LONG, 1, len(payload)),
                (TAG_PLANAR_CONFIG, _SHORT, 1, 1),
            ]
            f.write(_pack_ifd(entries, this_ifd))
            f.seek(next_ptr_pos)
            f.write(struct.pack("<I", this_ifd))
            # this level becomes the chain tail for the next one
            next_ptr_pos = this_ifd + 2 + 12 * len(entries)
            f.seek(0, 2)


def tile_rows_to_strips(
    rows: Iterator[tuple[int, bytes]],
    min_row: int,
    max_row: int,
    width_px: int,
    tilesize: int,
    channels: int,
) -> Iterator[bytes]:
    """Turn an ordered (tile_row, strip_bytes) iterator into a dense strip
    stream, zero-filling tile rows with no tiles."""
    blank = bytes(tilesize * width_px * channels)
    expect = min_row
    for row, strip in rows:
        while expect < row:
            yield blank
            expect += 1
        yield strip
        expect = row + 1
    while expect <= max_row:
        yield blank
        expect += 1
