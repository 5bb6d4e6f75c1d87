"""Real (non-stub) media decode: the pure-stdlib PNG codec, the optional
PIL path, and the Spark-side decode plumbing with allow_stub=False."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from jetstream_spark.operators.png import _chunk, _SIG, decode_png, encode_png
from jetstream_spark.queries.multimodal import decode_media


def _gradient(w: int, h: int, c: int) -> bytes:
    return bytes((x * 7 + y * 13 + ch * 29) & 0xFF for y in range(h) for x in range(w) for ch in range(c))


@pytest.mark.parametrize("w,h,c", [(5, 4, 1), (7, 3, 3), (4, 4, 4), (1, 1, 1)])
def test_png_round_trip(w, h, c):
    px = _gradient(w, h, c)
    data = encode_png(px, w, h, c)
    assert data[:8] == _SIG
    got = decode_png(data)
    assert got == (w, h, c, px)


def _encode_filtered(px: bytes, w: int, h: int, c: int, ftype: int) -> bytes:
    """Apply one PNG filter type to every scanline — exercises the decoder's
    unfilter paths, which real encoders (PIL included) pick per line."""
    stride = w * c
    prev = bytearray(stride)
    raw = bytearray()
    for y in range(h):
        line = bytearray(px[y * stride : (y + 1) * stride])
        out = bytearray(line)
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            upleft = prev[i - c] if i >= c else 0
            if ftype == 1:
                out[i] = (line[i] - left) & 0xFF
            elif ftype == 2:
                out[i] = (line[i] - up) & 0xFF
            elif ftype == 3:
                out[i] = (line[i] - ((left + up) >> 1)) & 0xFF
            elif ftype == 4:
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else upleft)
                out[i] = (line[i] - pred) & 0xFF
        raw += bytes([ftype]) + out
        prev = line
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c", [1, 3])
def test_png_unfilters_all_types(ftype, c):
    w, h = 6, 5
    px = _gradient(w, h, c)
    assert decode_png(_encode_filtered(px, w, h, c, ftype)) == (w, h, c, px)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    # 16-bit depth must refuse, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)


def test_decode_media_png_without_stub():
    """allow_stub=False succeeds for PNG even with no imaging libs — the
    stdlib codec is the fallback."""
    px = _gradient(8, 8, 1)
    data = encode_png(px, 8, 8, 1)
    assert decode_media(data, "image/png", allow_stub=False) == px


def test_decode_media_stub_contract():
    assert decode_media(b"abc", "image/fake") == b"abc"
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", "image/fake", allow_stub=False)
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", "video/mp4", allow_stub=False)
    assert decode_media(b"abc", "video/mp4") == b"abc"  # stub passthrough
    # audio/wav now has a real decoder: corrupt payloads fail loudly (same
    # contract as image/png), they don't silently fall back to the stub
    from jetstream_spark.operators.wav import WavError

    with pytest.raises(WavError):
        decode_media(b"abc", "audio/wav", allow_stub=False)
    with pytest.raises(WavError):
        decode_media(b"abc", "audio/wav")


def test_decode_media_prefers_pil_when_installed():
    PIL = pytest.importorskip("PIL")  # noqa: F841 — absent in this container
    px = _gradient(8, 4, 3)
    data = encode_png(px, 8, 4, 3)
    assert decode_media(data, "image/png", allow_stub=False) == px


def test_spark_side_real_decode_pipeline(spark):
    """The full multimodal plumbing with REAL decode: binary PNG payloads in
    a DataFrame, decoded per Arrow batch with allow_stub=False, pixel stats
    checked against numpy."""
    import pandas as pd

    rows = []
    for doc_id in range(6):
        w, h = 4 + doc_id, 3 + (doc_id % 2)
        px = _gradient(w, h, 1)
        rows.append((doc_id, encode_png(px, w, h, 1), "image/png", px))
    df = spark.createDataFrame(
        [(d, bytearray(p), mt) for d, p, mt, _ in rows],
        "doc_id long, payload binary, media_type string",
    )

    def stats(batches):
        for pdf in batches:
            out = []
            for doc_id, payload, mt in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                pixels = np.frombuffer(
                    decode_media(bytes(payload), mt, allow_stub=False), dtype=np.uint8
                )
                out.append((int(doc_id), len(pixels), int(pixels.sum())))
            yield pd.DataFrame(out, columns=["doc_id", "n_pixels", "pixel_sum"])

    got = {
        r["doc_id"]: (r["n_pixels"], r["pixel_sum"])
        for r in df.mapInPandas(stats, schema="doc_id long, n_pixels long, pixel_sum long").collect()
    }
    want = {
        d: (len(px), int(np.frombuffer(px, dtype=np.uint8).sum())) for d, _, _, px in rows
    }
    assert got == want


# --- WAV decoder (operators/wav.py) -----------------------------------------


def _wav_bytes(frames: bytes, channels=1, width=2, rate=8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_wav_decode_roundtrip_mono16():
    import struct

    from jetstream_spark.operators.wav import wav_samples

    samples = [0, 1, -1, 32767, -32768, 12345]
    pcm = struct.pack("<6h", *samples)
    n_ch, rate, got = wav_samples(_wav_bytes(pcm, channels=1, width=2, rate=16000))
    assert (n_ch, rate, got) == (1, 16000, samples)


def test_wav_decode_stereo_and_8bit():
    import struct

    from jetstream_spark.operators.wav import wav_samples

    pcm = struct.pack("<4h", 10, -10, 20, -20)  # 2 frames x 2 channels
    n_ch, rate, got = wav_samples(_wav_bytes(pcm, channels=2, width=2, rate=44100))
    assert (n_ch, rate, got) == (2, 44100, [10, -10, 20, -20])

    # 8-bit WAV is unsigned bytes
    n_ch, rate, got = wav_samples(_wav_bytes(bytes([0, 128, 255]), channels=1, width=1))
    assert (n_ch, rate, got) == (1, 8000, [0, 128, 255])


def test_wav_decode_skips_unknown_chunks():
    import struct

    from jetstream_spark.operators.wav import wav_samples

    payload = _wav_bytes(struct.pack("<2h", 7, -7))
    # splice a LIST chunk (odd size -> pad byte) between fmt and data
    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    assert wav_samples(spliced)[2] == [7, -7]


def test_wav_decode_malformed_raises():
    import struct

    import pytest

    from jetstream_spark.operators.wav import WavError, decode_wav

    good = _wav_bytes(struct.pack("<2h", 1, 2))
    for bad in (
        b"",
        b"RIFF" + b"\x00" * 8,            # not WAVE
        good[:20],                          # truncated inside fmt
        good.replace(b"data", b"dat@"),     # missing data chunk
        good.replace(b"\x01\x00\x01\x00", b"\x03\x00\x01\x00", 1),  # float fmt
    ):
        with pytest.raises(WavError):
            decode_wav(bad)


def test_decode_media_audio_no_stub():
    import struct

    from jetstream_spark.queries.multimodal import decode_media

    pcm = struct.pack("<3h", 5, -5, 9)
    frames = decode_media(_wav_bytes(pcm), "audio/wav", allow_stub=False)
    assert frames == pcm


def test_wav_decode_fuzz_never_crashes():
    """Arbitrary bytes → WavError or a valid parse, never IndexError /
    struct.error (the carcbor fuzz contract, applied to RIFF)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jetstream_spark.operators.wav import WavError, decode_wav

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=128))
    def run(payload):
        try:
            decode_wav(payload)
        except WavError:
            pass
        try:  # prefixing the magic must not change the error contract
            decode_wav(b"RIFF\x10\x00\x00\x00WAVE" + payload)
        except WavError:
            pass

    run()


def test_phash_dedup_matches_pure_python(spark):
    """multimodal_phash_dedup groups == a pure-Python aHash recompute over
    the raw text bytes (PNG round-trip must be lossless, and the
    exact-integer threshold must agree bit-for-bit)."""
    from collections import Counter

    from jetstream_spark.queries.multimodal import (
        PHASH_CELLS,
        PHASH_W,
        q_multimodal_phash_dedup,
    )
    from jetstream_spark.tables import table
    from tests.conftest import SF_DIR

    def ref_hash(text: str) -> str:
        raw = text.encode("utf-8")
        n = max(PHASH_CELLS, -(-len(raw) // PHASH_W) * PHASH_W)
        px = list(raw.ljust(n, b"\x00"))
        total = sum(px)
        bits = []
        for c in range(PHASH_CELLS):
            lo = -(-(c * n) // PHASH_CELLS)
            hi = -(-((c + 1) * n) // PHASH_CELLS)
            s = sum(px[lo:hi])
            bits.append("1" if s * n > total * (hi - lo) else "0")
        return "".join(bits)

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    expect = Counter(ref_hash(r["text"]) for r in docs)
    groups = {h: c for h, c in expect.items() if c >= 2}
    got = {r["phash"]: r for r in q_multimodal_phash_dedup(spark, SF_DIR).collect()}
    assert {h: r["n_docs"] for h, r in got.items()} == groups
    assert groups, "fixture lost its perceptual-dup structure"
    by_hash: dict = {}
    for r in docs:
        by_hash.setdefault(ref_hash(r["text"]), []).append(r["doc_id"])
    for h, r in got.items():
        assert r["min_doc_id"] == min(by_hash[h]) and r["max_doc_id"] == max(by_hash[h])
