"""Minimal animated-GIF codec — pure stdlib, no imaging libraries.

Completes the multimodal decode matrix (PNG: operators/png.py, WAV:
operators/wav.py) with the VIDEO-shaped case: a multi-frame container
whose frames must be LZW-decompressed — so frame sampling over `video/*`
payloads exercises a real parse under `decode_media(allow_stub=False)`,
not the deterministic fake.

Scope is the GIF89a baseline an animation encoder emits: global color
table, 8-bit color-table indices, one image descriptor per frame with
optional Graphic Control Extensions, full variable-width LZW with table
growth to 4096 and clear/EOI codes. Local color tables and interlacing
raise — they don't mis-decode. The encoder exists so tests can round-trip
arbitrary frame data; it emits REAL compressed LZW (growing table), and a
hand-assembled golden GIF in the tests pins the decoder against the spec
independent of the encoder.
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    pass


_HEADER = b"GIF89a"


# --- LZW ----------------------------------------------------------------------


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """Variable-width LZW per the GIF spec: emit CLEAR, build the table to
    4095 then re-CLEAR, finish with EOI. Little-endian bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh_table():
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits.append((clear, width))
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        out_bits.append((table[prefix], width))
        table[cand] = next_code
        next_code += 1
        # Width convention (GIF's "deferred" change): the decoder's table
        # additions LAG emissions by one (its j-th add happens while
        # reading emission j+1), and it bumps when its count hits 2^w —
        # so the encoder must bump one addition later: after the added
        # code itself equals 2^w. Bumping when count==2^w here desyncs
        # the streams (verified by the round-trip stress test).
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            out_bits.append((clear, width))
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        out_bits.append((table[prefix], width))
    out_bits.append((eoi, width))

    # pack LSB-first
    acc = 0
    nbits = 0
    packed = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _lzw_decompress(data: bytes, min_code_size: int, expect: int) -> bytes:
    """Inverse of the above, bounds-checked; stops at EOI or when `expect`
    bytes are produced."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise GifError(f"invalid first code {code}")
            entry = table[code]
        elif code < len(table) and (code < clear or table[code]):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"invalid LZW code {code}")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return bytes(out)


# --- container ------------------------------------------------------------------


def _blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF sub-blocks starting at pos; returns (data, new_pos)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise GifError("unterminated sub-block sequence")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise GifError("sub-block overruns payload")
        out += payload[pos : pos + n]
        pos += n


def encode_gif(frames: list[bytes], width: int, height: int, palette: bytes) -> bytes:
    """GIF89a from raw 8-bit color-index frames + a 256-entry RGB palette."""
    if len(palette) != 256 * 3:
        raise ValueError("palette must be 256 RGB entries")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size mismatch")
    out = bytearray(_HEADER)
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    out += palette
    for f in frames:
        out += b"\x21\xf9\x04\x00\x02\x00\x00\x00"  # GCE: delay 2, no transparency
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW min code size
        lzw = _lzw_compress(f, 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes, list[bytes]]:
    """→ (width, height, palette, frames as raw index bytes). Bounds-checked:
    malformed input raises GifError."""
    try:
        if len(payload) < 13 or payload[:6] not in (b"GIF89a", b"GIF87a"):
            raise GifError("not a GIF payload")
        width, height, flags, _, _ = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        palette = b""
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            if pos + 3 * n > len(payload):
                raise GifError("global color table overruns payload")
            palette = payload[pos : pos + 3 * n]
            pos += 3 * n
        frames: list[bytes] = []
        while True:
            if pos >= len(payload):
                raise GifError("missing trailer")
            marker = payload[pos]
            pos += 1
            if marker == 0x3B:  # trailer
                break
            if marker == 0x21:  # extension: label + sub-blocks, skipped
                if pos >= len(payload):
                    raise GifError("truncated extension")
                pos += 1
                _, pos = _blocks(payload, pos)
                continue
            if marker != 0x2C:
                raise GifError(f"unexpected block marker 0x{marker:02x}")
            if pos + 9 > len(payload):
                raise GifError("truncated image descriptor")
            left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if iflags & 0x80:
                raise GifError("local color tables unsupported")
            if iflags & 0x40:
                raise GifError("interlaced frames unsupported")
            if pos >= len(payload):
                raise GifError("missing LZW code size")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                raise GifError(f"bad LZW min code size {min_code}")
            lzw, pos = _blocks(payload, pos)
            frames.append(_lzw_decompress(lzw, min_code, fw * fh))
        if not frames:
            raise GifError("no frames")
        return width, height, palette, frames
    except struct.error as e:  # pragma: no cover — guarded by length checks
        raise GifError(str(e)) from e
