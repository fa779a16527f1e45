"""Minimal pure-stdlib AVI (RIFF) container codec — a SECOND real
temporal container format for ``sample_frames`` (VERDICT r08 Next #8;
the first is :mod:`.apng_codec`), proving the frame-sampling plumbing
generalizes beyond one chunk grammar.

AVI is the classic MJPEG transport: a ``RIFF('AVI ')`` file holding a
``LIST('hdrl')`` with the main header (``avih``, carrying
``dwMicroSecPerFrame``) and one video-stream header pair
(``strh``/``strf``, carrying the authoritative ``dwScale``/``dwRate``
frame clock), then a ``LIST('movi')`` whose ``00dc`` chunks each hold
one compressed frame verbatim, then an optional ``idx1`` index.  The
splitter only parses the CONTAINER — frame payloads pass through
opaque, so it works for real MJPEG bytes unchanged; the tests encode
Motion-PNG (fourcc ``MPNG``, a registered VfW codec) so every sampled
frame is pixel-exactly decodable with the vendored
:func:`.png_codec.decode_png` and the path is verified end-to-end on
real bytes with zero external libraries.

Scope, like the PNG/APNG codecs: one video stream, no interleaved
audio, no OpenDML extensions; unknown chunks are SKIPPED (RIFF's
forward-compat contract), structural corruption raises ``ValueError``.
Swap in pyav/ffmpeg for production corpora.

Reference parity note: the reference has no media handling at all
(SURVEY §1: no binary type); this is north-star extension surface.
"""

from __future__ import annotations

import struct

__all__ = ["encode_avi", "avi_frame_sampler"]


def _chunk(tag: bytes, data: bytes) -> bytes:
    """One RIFF chunk: tag + little-endian size + data + pad to even."""
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(
    frames, fps: int = 10, width: int = 0, height: int = 0,
    fourcc: bytes = b"MPNG",
) -> bytes:
    """Encode ``[frame_payload_bytes, ...]`` into a single-video-stream
    AVI at ``fps`` frames/second.  Payloads are stored verbatim in
    ``00dc`` chunks (MJPEG layout); pass PNG bytes with the default
    ``MPNG`` fourcc for a self-decodable file, or JPEG bytes with
    ``MJPG``."""
    if not frames:
        raise ValueError("encode_avi: no frames")
    if fps <= 0:
        raise ValueError("encode_avi: fps must be positive")
    frames = [bytes(f) for f in frames]
    max_size = max(len(f) for f in frames)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame (informational)
        0,                 # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_size,          # dwSuggestedBufferSize
        width, height,     # dwWidth, dwHeight
        0, 0, 0, 0,        # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", fourcc,
        0, 0, 0, 0,        # dwFlags, wPriority, wLanguage, dwInitialFrames
        1, fps,            # dwScale, dwRate  (rate/scale = fps — authoritative)
        0, len(frames),    # dwStart, dwLength (in frames)
        max_size,          # dwSuggestedBufferSize
        0xFFFFFFFF,        # dwQuality (default)
        0,                 # dwSampleSize (0 = variable, one sample per chunk)
        0, 0, 0, 0,        # rcFrame
    )
    # BITMAPINFOHEADER with biCompression = fourcc
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, fourcc, 0, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", f) for f in frames]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1: one entry per chunk, offsets relative to the 'movi' fourcc
    idx_entries, off = [], 4
    for f, ck in zip(frames, movi_chunks):
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(ck)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, payload_start, payload_size) for each chunk in
    [pos, end); LISTs yield their kind as tag with inner body bounds."""
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError(
                f"avi: chunk {tag!r} at {pos} overruns container "
                f"({payload + size} > {end})"
            )
        yield tag, payload, size
        pos = payload + size + (size % 2)  # chunks are even-aligned


def _parse_avi(data: bytes):
    """Return (frames, frame_ms): raw ``00dc``/``00db`` payloads in
    stream order and the per-frame duration in milliseconds (from the
    stream header's dwRate/dwScale, falling back to avih's
    dwMicroSecPerFrame)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    raw_frames: list[tuple[int, bytes]] = []  # (stream no, payload)
    frame_ms: float | None = None
    usec_per_frame: float | None = None
    strh_seen = 0
    vids_stream: int | None = None  # stream index = strh order in hdrl

    def scan(pos: int, stop: int) -> None:
        nonlocal frame_ms, usec_per_frame, strh_seen, vids_stream
        for tag, p, size in _walk(data, pos, stop):
            if tag == b"LIST":
                kind = data[p:p + 4]
                if kind in (b"hdrl", b"strl", b"movi", b"rec "):
                    scan(p + 4, p + size)
                # unknown LIST kinds skipped (forward compat)
            elif tag == b"avih" and size >= 4:
                (uspf,) = struct.unpack_from("<I", data, p)
                if uspf > 0:
                    usec_per_frame = float(uspf)
            elif tag == b"strh":
                # EVERY strh occupies a stream number in the NNdc/NNwb
                # chunk ids — counting only well-formed ones would
                # desynchronize vids_stream from the chunk prefixes and
                # silently drop video (or keep audio) whenever an
                # earlier stream's strh is short/malformed.  Only the
                # vids PARSING is gated on the 32-byte minimum.
                if size >= 32 and data[p:p + 4] == b"vids":
                    # a second video stream would silently interleave
                    # two timelines into one — corrupt by our contract
                    if vids_stream is not None:
                        raise ValueError("avi: multiple 'vids' streams")
                    vids_stream = strh_seen
                    scale, rate = struct.unpack_from("<II", data, p + 20)
                    if rate > 0 and scale > 0:
                        frame_ms = 1000.0 * scale / rate
                strh_seen += 1
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                raw_frames.append((int(tag[:2]), data[p:p + size]))
            # everything else (idx1, JUNK, audio '01wb'…) skipped

    scan(12, end)
    if frame_ms is None:
        if usec_per_frame is None:
            raise ValueError("avi: no video stream header (strh 'vids')")
        frame_ms = usec_per_frame / 1000.0
    # keep only the video stream's chunks (audio/extra streams carry
    # their own NN prefix); headerless fallback keeps everything
    frames = [
        f for sn, f in raw_frames if vids_stream is None or sn == vids_stream
    ]
    return frames, frame_ms


def avi_frame_sampler(payload: bytes, every_ms: int):
    """``sample_frames(..., sampler=avi_frame_sampler)`` adapter —
    identical sampling semantics to :func:`.apng_codec.
    apng_frame_sampler`: emit the frame VISIBLE at each instant
    ``t = 0, every_ms, 2·every_ms, …`` strictly before the video's
    total duration.  Returns ``[(ts_ms, frame_bytes), ...]`` with
    payloads verbatim from the ``00dc`` chunks (PNG bytes for MPNG
    files, JPEG bytes for MJPG)."""
    if payload is None:
        return []
    if every_ms <= 0:
        raise ValueError("avi_frame_sampler: every_ms must be positive")
    frames, frame_ms = _parse_avi(bytes(payload))
    if not frames:
        return []
    total_ms = frame_ms * len(frames)
    out = []
    t = 0.0
    while t < total_ms:
        idx = min(int(t // frame_ms), len(frames) - 1)
        out.append((int(t), frames[idx]))
        t += every_ms
    return out
