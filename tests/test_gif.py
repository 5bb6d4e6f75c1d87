"""GIF codec: spec-golden decode (hand-assembled bytes, independent of the
in-repo encoder), LZW round trips across table-growth regimes, malformed
inputs, and fuzz."""

from __future__ import annotations

import random
import struct

import pytest

from jetstream_spark.operators.gif import GifError, decode_gif, encode_gif

PALETTE = bytes(range(256)) * 3


def test_golden_gif_decodes_per_spec():
    """3×1 image, pixels [1,1,0], 4-color table, min code size 2 — LZW
    codes (CLEAR,1,1,0,EOI) = (4,1,1,0,5) hand-packed LSB-first into
    bytes [76, 80]. Assembled from the GIF89a spec, NOT from encode_gif."""
    golden = (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 1, 0x81, 0, 0)  # GCT, 4 entries
        + b"\x00\x00\x00\x40\x40\x40\x80\x80\x80\xc0\xc0\xc0"
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + b"\x02"          # LZW min code size
        + b"\x02\x4c\x50"  # one sub-block: [76, 80]
        + b"\x00\x3b"
    )
    w, h, pal, frames = decode_gif(golden)
    assert (w, h) == (3, 1)
    assert pal == b"\x00\x00\x00\x40\x40\x40\x80\x80\x80\xc0\xc0\xc0"
    assert frames == [bytes([1, 1, 0])]


def test_round_trip_all_regimes():
    rnd = random.Random(7)
    for w, h in [(200, 120), (64, 64), (3, 2), (1, 1), (255, 7)]:
        frames = [
            bytes(rnd.randrange(256) for _ in range(w * h)),  # re-clear path at 200x120
            bytes((i * 31) % 256 for i in range(w * h)),
            bytes(rnd.choice(b"abcd") for _ in range(w * h)),
            bytes(w * h),  # constant: long-run table growth
        ]
        g = encode_gif(frames, w, h, PALETTE)
        assert decode_gif(g) == (w, h, PALETTE, frames)


def test_multi_frame_animation_order_preserved():
    frames = [bytes([i] * 12) for i in range(10)]
    assert decode_gif(encode_gif(frames, 4, 3, PALETTE))[3] == frames


def test_malformed_raises():
    good = encode_gif([bytes(6)], 3, 2, PALETTE)
    for bad in (
        b"",
        b"GIF89a",
        good[:-1],                      # missing trailer
        good[:20],                      # truncated in palette
        # bad block marker at the image-descriptor offset (header 13 + GCT 768)
        good[:781] + b"\x2d" + good[782:],
    ):
        with pytest.raises(GifError):
            decode_gif(bad)


def test_gif_fuzz_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=160))
    def run(payload):
        for p in (payload, b"GIF89a" + payload):
            try:
                decode_gif(p)
            except GifError:
                pass

    run()


def test_decode_media_gif_no_stub():
    from jetstream_spark.queries.multimodal import decode_media

    frames = [bytes([7] * 8), bytes([9] * 8)]
    g = encode_gif(frames, 4, 2, PALETTE)
    assert decode_media(g, "image/gif", allow_stub=False) == b"".join(frames)


def test_lzw_adversarial_reclear_round_trips():
    """Alphabet sizes and lengths engineered to cross the 4096-entry
    re-clear boundary at varying widths."""
    import random

    from jetstream_spark.operators.gif import _lzw_compress, _lzw_decompress

    rnd = random.Random(1234)
    for trial in range(30):
        n = rnd.randrange(3000, 40000)
        alphabet = rnd.randrange(2, 256)
        data = bytes(rnd.randrange(alphabet) for _ in range(n))
        assert _lzw_decompress(_lzw_compress(data, 8), 8, n) == data, (trial, n, alphabet)
