"""Minimal WAV (RIFF/PCM) decoder — pure stdlib (struct), no audio libraries.

The multimodal decode kernel (queries/multimodal.py::decode_media) resolves
`audio/wav` through this module so `allow_stub=False` performs a REAL
container parse even in dependency-free containers (the PNG codec's
rationale, applied to audio). Scope is canonical PCM: RIFF/WAVE with fmt
chunk audio_format=1 (integer PCM), 8/16/32-bit, any channel count and
rate; chunk walking skips unknown chunks (LIST/INFO etc.) like any
compliant reader. Compressed formats (float, ADPCM, extensible) raise —
they don't mis-decode.

Encoding is deliberately NOT reimplemented: fixtures and queries write
WAV through the stdlib `wave` module, so the decoder is exercised against
an independent encoder implementation.
"""

from __future__ import annotations

import struct


class WavError(ValueError):
    pass


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a RIFF/WAVE PCM payload → (n_channels, sample_rate,
    bits_per_sample, frame_bytes). Bounds-checked: malformed input raises
    WavError, never IndexError/struct.error."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise WavError("not a RIFF/WAVE payload")
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + size > len(payload):
                raise WavError(f"chunk {tag!r} overruns payload")
            if tag == b"fmt ":
                if size < 16:
                    raise WavError("fmt chunk too short")
                audio_format, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                    "<HHIIHH", payload, body_start
                )
                if audio_format != 1:
                    raise WavError(f"unsupported audio format {audio_format} (PCM only)")
                if bits not in (8, 16, 32):
                    raise WavError(f"unsupported bit depth {bits}")
                if n_channels == 0:
                    raise WavError("zero channels")
                fmt = (n_channels, sample_rate, bits)
            elif tag == b"data":
                data = payload[body_start : body_start + size]
            # chunks are word-aligned: odd sizes carry a pad byte
            pos = body_start + size + (size & 1)
        if fmt is None:
            raise WavError("missing fmt chunk")
        if data is None:
            raise WavError("missing data chunk")
        n_channels, sample_rate, bits = fmt
        frame_size = n_channels * (bits // 8)
        if len(data) % frame_size:
            raise WavError("data chunk is not frame-aligned")
        return n_channels, sample_rate, bits, data
    except struct.error as e:  # pragma: no cover - guarded by length checks
        raise WavError(str(e)) from e


def wav_samples(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode to integer samples (interleaved): (n_channels, sample_rate,
    samples). 8-bit WAV is unsigned per spec; 16/32-bit signed LE."""
    n_channels, sample_rate, bits, data = decode_wav(payload)
    if bits == 8:
        samples = list(data)
    elif bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    else:
        samples = list(struct.unpack(f"<{len(data) // 4}i", data))
    return n_channels, sample_rate, samples
