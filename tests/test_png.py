"""functions/png.py — the dependency-free PNG/WAV codec that backs the
multimodal stage. Round-trips exercise ALL five scanline filters (the
encoder cycles them per row), both color types, the concatenated-PNG
container walk, and the RIFF parser."""

from __future__ import annotations

import numpy as np
import pytest

from skewer_ray.functions.png import (decode_png, decode_wav, encode_png,
                                      encode_wav, png_frame_offsets,
                                      png_stream_count)


@pytest.mark.parametrize("shape", [(1, 1), (3, 1), (4, 4, 3), (7, 5),
                                   (12, 9, 3), (25, 17, 3), (6, 31)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_png(px)
    out, end = decode_png(data)
    assert end == len(data)
    assert np.array_equal(out, px)


def test_png_all_filters_appear():
    """≥5 rows ⇒ every filter type 0..4 is present in the stream, so a
    round-trip proves every unfilter path."""
    import struct
    import zlib
    px = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    data = encode_png(px)
    # pull the IDAT payload back out and check the filter bytes
    pos = 8
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        if ctype == b"IDAT":
            idat += data[pos + 8:pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 6 * 3 + 1
    filters = {raw[r * stride] for r in range(8)}
    assert filters == {0, 1, 2, 3, 4}
    out, _ = decode_png(data)
    assert np.array_equal(out, px)


def test_png_container_walk():
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (5 + i, 4), dtype=np.uint8)
              for i in range(6)]
    blob = b"".join(encode_png(f) for f in frames)
    assert png_stream_count(blob) == 6
    offs = png_frame_offsets(blob)
    assert offs[0] == 0 and len(offs) == 6
    for o, f in zip(offs, frames):
        got, _ = decode_png(blob, o)
        assert np.array_equal(got, f)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated inside IHDR/IDAT


def test_wav_roundtrip():
    rng = np.random.default_rng(11)
    s = rng.integers(-2048, 2048, 1234).astype(np.int16)
    rate, got = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(got, s)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


def test_media_synth_decodes_to_closed_form():
    """The synthesized payloads decode back to the closed-form pixel /
    sample rules the DuckDB oracle recomputes."""
    import pyarrow as pa

    from skewer_ray.functions.media import (MediaDecodeStage,
                                            _audio_samples, _image_pixels,
                                            _video_frame, synth_media_batch,
                                            video_frame_count)
    ids = list(range(12))
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(["x"] * len(ids))})
    media = synth_media_batch(batch)
    stage = MediaDecodeStage()
    out = stage(media)
    for r in out.to_pylist():
        d = r["doc_id"]
        if r["media_type"] == "image":
            px = _image_pixels(d)
            assert (r["height"], r["width"]) == px.shape[:2]
            assert r["px_sum"] == int(px.sum())
        elif r["media_type"] == "audio":
            s = _audio_samples(d)
            assert r["duration_ms"] == len(s) * 1000 // 8000
            assert r["px_sum"] == int(s.astype(np.int64).sum())
        else:
            f0 = _video_frame(d, 0)
            assert (r["height"], r["width"]) == f0.shape
            assert r["px_sum"] == int(f0.sum())
            assert r["duration_ms"] == video_frame_count(d) * 100


def test_png_roundtrip_property():
    """Property: ANY uint8 image (grey or RGB, 1..40 × 1..40)
    round-trips bit-exactly through encode/decode across all five
    filter types."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40),
           st.sampled_from([1, 3]), st.integers(0, 2**32 - 1))
    def check(h, w, ch, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, 3)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        out, end = decode_png(encode_png(px))
        assert end == len(encode_png(px))
        assert np.array_equal(out, px)

    check()


def test_wav_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 5000), st.integers(0, 2**32 - 1))
    def check(n, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        rate, got = decode_wav(encode_wav(s, 8000))
        assert rate == 8000 and np.array_equal(got, s)

    check()


def test_decode_png_missing_ihdr_is_value_error():
    """A signature+IEND stream with no IHDR raises the documented
    ValueError, not a TypeError from width arithmetic (ADVICE r03)."""
    import struct
    import zlib as _z

    import pytest

    from skewer_ray.functions.png import SIGNATURE, decode_png

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", _z.crc32(ctype + body)))

    stream = SIGNATURE + chunk(b"IDAT", b"") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing IHDR"):
        decode_png(stream)
