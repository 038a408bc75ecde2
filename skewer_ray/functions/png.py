"""Dependency-free PNG codec (PNG spec / RFC 2083, public knowledge).

Supports 8-bit greyscale (color type 0) and RGB (color type 2),
non-interlaced, with ALL five scanline filter types on both sides:
the encoder cycles filters 0..4 across rows precisely so the decoder's
unfilter paths (None/Sub/Up/Average/Paeth) are exercised by every
image larger than four rows — a decode bug cannot hide behind
filter-0-only round trips.

This backs the multimodal stage (functions/media.py): the reference has
no media pipeline (builder brief requires the plumbing); real images
are synthesized at generation time and REALLY decoded in the actor-pool
stage, with features checked against closed-form oracles.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc_:
        return a
    if pb <= pc_:
        return b
    return c


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) greyscale or (h, w, 3) RGB uint8 array.

    Row r uses filter type r % 5, so all five filters appear."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        channels, color_type = 1, 0
        flat = px
    else:
        h, w, channels = px.shape
        if channels != 3:
            raise ValueError("only grey or RGB supported")
        color_type = 2
        flat = px.reshape(h, w * 3)
    bpp = channels
    stride = w * channels
    out = bytearray()
    prior = np.zeros(stride, np.int16)
    for r in range(h):
        raw = flat[r].astype(np.int16)
        ftype = r % 5
        if ftype == 0:
            filt = raw
        elif ftype == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int16), raw[:-bpp]])
            filt = raw - left
        elif ftype == 2:  # Up
            filt = raw - prior
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int16), raw[:-bpp]])
            filt = raw - ((left + prior) >> 1)
        else:  # Paeth
            filt = np.empty(stride, np.int16)
            for i in range(stride):
                a = int(raw[i - bpp]) if i >= bpp else 0
                b = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                filt[i] = raw[i] - _paeth(a, b, c)
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes, offset: int = 0):
    """Decode one PNG stream starting at ``offset``.

    Returns (pixels, end_offset): pixels is a (h, w) or (h, w, 3)
    uint8 array; end_offset points just past the IEND chunk (so
    concatenated-PNG containers can walk frame by frame)."""
    if data[offset:offset + 8] != SIGNATURE:
        raise ValueError("bad PNG signature")
    pos = offset + 8
    width = height = None
    color_type = None
    idat = bytearray()
    while True:
        if pos + 8 > len(data):
            raise ValueError("truncated PNG")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, inter = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color_type not in (0, 2) or inter != 0:
                raise ValueError("unsupported PNG variant")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or color_type is None:
        # a stream without (or with only a post-IEND) IHDR must fail
        # the documented ValueError contract, not TypeError below
        raise ValueError("missing IHDR")
    channels = 1 if color_type == 0 else 3
    bpp = channels
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline size mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    recon = np.zeros((height, stride), np.uint8)
    prior = np.zeros(stride, np.int32)
    for r in range(height):
        ftype = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prior) & 0xFF
        elif ftype == 1:  # Sub — per-channel cumulative sum mod 256
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        recon[r] = cur.astype(np.uint8)
        prior = cur
    px = recon if channels == 1 else recon.reshape(height, width, 3)
    return px, pos


def png_frame_offsets(data: bytes) -> list[int]:
    """Byte offset of each concatenated PNG frame (container index for
    the MJPEG-style video payload) — walks chunk lengths, never scans
    pixel bytes. Truncated or corrupt containers raise ValueError (the
    same contract as decode_png)."""
    offs, pos = [], 0
    while pos < len(data):
        if data[pos:pos + 8] != SIGNATURE:
            raise ValueError("bad frame boundary")
        offs.append(pos)
        pos += 8
        while True:
            if pos + 8 > len(data):
                raise ValueError("truncated PNG container")
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            ctype = data[pos + 4:pos + 8]
            pos += 12 + length
            if pos > len(data):
                raise ValueError("truncated PNG container")
            if ctype == b"IEND":
                break
    return offs


def png_stream_count(data: bytes) -> int:
    """Number of concatenated PNG streams (container probe)."""
    return len(png_frame_offsets(data))


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16 mono) — stdlib-only encode/parse for the audio column
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE container around little-endian PCM16 mono samples."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Parse a RIFF/WAVE PCM16 mono payload.

    Returns (sample_rate, samples as int16 array)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant")
        elif ctype == b"data":
            samples = np.frombuffer(body, "<i2")
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, samples
