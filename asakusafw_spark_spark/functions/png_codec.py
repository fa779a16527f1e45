"""Minimal pure-stdlib PNG codec (8-bit RGB) + multimodal adapters.

The container ships no image library, so the multimodal operators
(:mod:`.multimodal`) default to an honest ``NotImplementedError``.  This
module closes the gap for PNG specifically: a spec-compliant encoder
(filter 0, zlib) and decoder (all five PNG filter types) over 8-bit RGB
— enough to exercise the distributed decode/resize/feature plumbing
with GENUINE image bytes (VERDICT r04 Next #7), and a usable fallback
codec for real PNG payloads when Pillow is absent.

Scope is deliberately narrow: 8-bit/channel truecolor (color type 2),
non-interlaced.  Anything else raises ``ValueError`` — swap in Pillow
for production corpora with mixed formats.  Pure Python per-pixel
loops: fine for fixtures and small assets, not a throughput path.

Reference parity note: the reference has no media handling at all
(SURVEY §1: no binary type); this is north-star extension surface.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: rows = list of scanlines; each scanline a list of (r, g, b) ints.
Rows = "list[list[tuple[int, int, int]]]"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rows) -> bytes:
    """Encode RGB scanlines → PNG bytes (filter 0, one IDAT)."""
    height = len(rows)
    if height == 0 or len(rows[0]) == 0:
        raise ValueError("encode_png: empty image")
    width = len(rows[0])
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in rows
    )
    return (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """Decode PNG bytes → ``(width, height, rows)``.

    Handles all five scanline filters (None/Sub/Up/Average/Paeth) so it
    reads PNGs from ANY conformant encoder (Pillow output included),
    not just :func:`encode_png`'s filter-0 stream.
    """
    if bytes(data[:8]) != _SIG:
        raise ValueError("decode_png: not a PNG signature")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError(
                    "decode_png: only 8-bit non-interlaced RGB supported "
                    f"(got depth={depth} color_type={ctype} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += bytes(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("decode_png: missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_png: truncated pixel data")
    prev = bytearray(stride)
    rows = []
    pos = 0
    for _ in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"decode_png: bad filter type {ftype}")
        prev = line
        rows.append(
            [(line[i], line[i + 1], line[i + 2]) for i in range(0, stride, 3)]
        )
    return w, h, rows


def resize_nearest(rows, new_w: int, new_h: int):
    """Nearest-neighbor resample of RGB scanlines."""
    h = len(rows)
    w = len(rows[0])
    return [
        [rows[(y * h) // new_h][(x * w) // new_w] for x in range(new_w)]
        for y in range(new_h)
    ]


def png_resizer(payload: bytes, width: int, height: int) -> bytes:
    """``resize_images(..., resizer=png_resizer)`` adapter: decode →
    nearest-neighbor resample → re-encode."""
    _, _, rows = decode_png(payload)
    return encode_png(resize_nearest(rows, width, height))


def png_feature_decoder(payload: bytes, kind: str):
    """``extract_features(..., decoder=png_feature_decoder)`` adapter:
    luma (BT.601) of a 4×4 nearest-neighbor thumbnail, scaled to [0, 1]
    — 16 floats, matching :data:`..multimodal.FEATURE_DIM`."""
    if payload is None:
        return [0.0] * 16
    _, _, rows = decode_png(payload)
    thumb = resize_nearest(rows, 4, 4)
    return [
        (299 * r + 587 * g + 114 * b) / 1000.0 / 255.0
        for row in thumb
        for (r, g, b) in row
    ]
