"""Minimal pure-stdlib PNG codec — the real-decode fallback for the
multimodal seam when PIL is absent (this sandbox has no pillow and no
network/pip). Implements the public PNG spec (RFC 2083 / ISO 15948)
with zlib from the stdlib:

- metadata: IHDR parse (width, height, mode) — no decompression;
- decode: zlib-inflate IDAT, undo scanline filters 0-4, 8-bit depth,
  color types 0 (L), 2 (RGB), 4 (LA), 6 (RGBA);
- encode: filter-0 scanlines, one IDAT, CRC32 chunks;
- resize: nearest-neighbor over decoded pixels.

Not a general image library — just enough for decode_image /
resize_image to run their REAL branch on genuine PNGs without
third-party codecs. Palette (type 3), 16-bit depth and interlacing
raise ValueError (the operator treats that like any undecodable
payload: stub fallback, or an error under strict mode).
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
_MODES = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {v: k for k, v in _MODES.items()}


def png_meta(data: bytes) -> tuple[int, int, str]:
    """(width, height, mode) from the IHDR chunk — no inflate."""
    if len(data) < 33 or data[:8] != _MAGIC:
        raise ValueError("not a PNG image (bad signature)")
    length, ctype = struct.unpack(">I4s", data[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("not a PNG image (missing IHDR)")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29])
    if color not in _MODES:
        raise ValueError(f"unsupported PNG color type {color}")
    mode = _MODES[color]
    if depth == 16:
        mode = f"{mode};16"
    return w, h, mode


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, bytearray]:
    """(width, height, channels, pixels) — pixels row-major, 8-bit."""
    w, h, mode = png_meta(data)
    if ";16" in mode:
        raise ValueError("16-bit PNG not supported by the stdlib codec")
    depth, color, interlace = struct.unpack(">BBB", data[24:26] + data[28:29])
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if interlace:
        raise ValueError("interlaced PNG not supported by the stdlib codec")
    ch = _CHANNELS[color]
    # walk chunks, concatenate IDAT
    pos, idat = 8, []
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has unexpected length")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return w, h, ch, out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def png_encode(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    """Filter-0 PNG from 8-bit row-major pixels."""
    color = _COLOR_TYPE[{1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[channels]]
    stride = w * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride:(y + 1) * stride]) for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def png_resize(data: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor resize, re-encoded as filter-0 PNG."""
    w, h, ch, px = png_decode(data)
    out = bytearray(tw * th * ch)
    for ty in range(th):
        sy = min(h - 1, (ty * h) // th)
        src_row = sy * w * ch
        dst_row = ty * tw * ch
        for tx in range(tw):
            sx = min(w - 1, (tx * w) // tw)
            s = src_row + sx * ch
            d = dst_row + tx * ch
            out[d:d + ch] = px[s:s + ch]
    return png_encode(tw, th, ch, out)
