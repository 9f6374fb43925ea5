"""Stdlib PNG codec (zlib + struct + numpy) — no Pillow/opencv needed.

The reference's tile crawler downloads PNG map tiles
(/root/reference/suplicmap_tilemap.py:136-145) and the mosaic step
(/root/reference/merge_tiles.py:66-129) decodes them onto a canvas. A
non-interlaced 8-bit PNG is zlib-compressed scanlines with one of five
per-scanline byte filters (spec: PNG ISO/IEC 15948 §9), so decode is
``zlib.decompress`` plus a filter-undo pass — all standard library.

Coverage: 8-bit greyscale (color type 0), RGB (2), palette (3), grey+alpha
(4), RGBA (6); filters 0-4; both non-interlaced and Adam7-interlaced
(spec §8.2: seven sub-image passes, each filtered independently, scattered
back on the 8×8 pattern grid). The encoder writes non-interlaced filter-0
scanlines, enough for fixtures and tile sinks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters; returns (height, stride) uint8."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        cur = line.astype(np.intp)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _deinterlace(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Adam7: the decompressed stream is seven concatenated sub-images,
    each with its own per-scanline filters (undone per pass — filters
    never cross pass boundaries), scattered back on the pass grid."""
    out = np.zeros((height, width, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        w_p = (width - x0 + dx - 1) // dx
        h_p = (height - y0 + dy - 1) // dy
        if w_p <= 0 or h_p <= 0:
            continue
        stride = w_p * channels
        seg = (stride + 1) * h_p
        sub = _unfilter(raw[pos : pos + seg], h_p, stride, channels)
        pos += seg
        out[y0:height:dy, x0:width:dx, :] = sub.reshape(h_p, w_p, channels)
    if pos != len(raw):
        raise ValueError("PNG interlaced data has wrong length")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) for greyscale, (h, w, c) otherwise."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {bit_depth}")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    channels = _CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        img = _deinterlace(raw, width, height, channels).reshape(
            height, width * channels
        )
    else:
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG scanline data has wrong length")
        img = _unfilter(raw, height, stride, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[img.reshape(height, width)]
    if channels == 1:
        return img.reshape(height, width)
    return img.reshape(height, width, channels)


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array ((h,w) grey, (h,w,3) RGB, or (h,w,4) RGBA) → PNG bytes,
    filter-0 scanlines."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        channels = arr.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[channels]
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    flat = arr.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )
