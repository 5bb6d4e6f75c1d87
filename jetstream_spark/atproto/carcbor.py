"""S5/S8 — pure-Python DAG-CBOR + CAR v1 decode (no external libs).

Reference semantics (pkg/consumer/consumer.go:177-181, 234-243):
a commit frame carries `blocks`, a CAR v1 archive; the consumer reads the
repo from the CAR, resolves each op's record block, verifies the record
CID against the op's CID, and transcodes the CBOR record to JSON
(data.UnmarshalCBOR → json.Marshal). That is exactly what this module
does, implemented from the public specs:

  - DAG-CBOR: RFC 8949 subset — definite lengths only, tag 42 = CID link
    (byte string with a 0x00 identity-multibase prefix);
  - CID v1: 0x01 + codec varint (0x71 dag-cbor) + multihash
    (0x12 sha2-256 + length + digest), rendered as 'b' + lowercase
    base32 (the familiar "bafy…" form) — CIDs here are COMPUTED, not
    faked, so verification is real;
  - CAR v1: varint-framed blocks, each `varint(len) | cid | data`, with a
    DAG-CBOR header {version: 1, roots: [...]}.

Simplification vs the reference: records are resolved by the op's record
CID against the block index rather than walking the repo MST by path —
the op carries the CID of the record it references, so the lookup lands
on the same block (the MST walk matters only for path queries without a
CID, which the firehose ops always have). JSON mapping follows the
atproto data model: bytes → {"$bytes": base64}, links → {"$link": cid}.

The decoder runs inside DataSource partitions / mapInPandas — the Python
boundary the transport already owns — so it adds no new serialization
seam, and every partition decodes its own frames independently (S2).
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct

# --- varint (unsigned LEB128) --------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# --- CID -----------------------------------------------------------------------

_DAG_CBOR_CODEC = 0x71
_SHA2_256 = 0x12


def cid_for_block(data: bytes, codec: int = _DAG_CBOR_CODEC) -> bytes:
    """CID v1 bytes for a block: version + codec + sha2-256 multihash."""
    digest = hashlib.sha256(data).digest()
    return bytes([0x01]) + _write_varint(codec) + bytes([_SHA2_256, len(digest)]) + digest


def cid_str(cid: bytes) -> str:
    """Multibase base32-lower rendering ('b' prefix) — the canonical CIDv1
    text form the reference compares (op.Cid.String())."""
    return "b" + base64.b32encode(cid).decode().lower().rstrip("=")


def _cid_byte_len(buf: bytes, pos: int) -> int:
    """Length of the CID starting at pos (CID v0 or v1)."""
    start = pos
    if buf[pos] == 0x12 and buf[pos + 1] == 0x20:  # CIDv0: bare sha256 multihash
        return 34
    _, pos = _read_varint(buf, pos)  # version
    _, pos = _read_varint(buf, pos)  # codec
    _, pos = _read_varint(buf, pos)  # hash fn
    size, pos = _read_varint(buf, pos)  # digest size
    return pos + size - start


# --- DAG-CBOR decode ------------------------------------------------------------


class CborError(ValueError):
    pass


def _decode_item(buf: bytes, pos: int):
    initial = buf[pos]
    pos += 1
    mt, info = initial >> 5, initial & 0x1F
    if info < 24:
        arg = info
    elif info == 24:
        arg = buf[pos]
        pos += 1
    elif info == 25:
        arg = int.from_bytes(buf[pos : pos + 2], "big")
        pos += 2
    elif info == 26:
        arg = int.from_bytes(buf[pos : pos + 4], "big")
        pos += 4
    elif info == 27:
        arg = int.from_bytes(buf[pos : pos + 8], "big")
        pos += 8
    else:
        raise CborError("indefinite lengths are not DAG-CBOR")

    if mt == 0:  # unsigned int
        return arg, pos
    if mt == 1:  # negative int
        return -1 - arg, pos
    if mt == 2:  # bytes
        return bytes(buf[pos : pos + arg]), pos + arg
    if mt == 3:  # text
        return buf[pos : pos + arg].decode("utf-8"), pos + arg
    if mt == 4:  # array
        out = []
        for _ in range(arg):
            v, pos = _decode_item(buf, pos)
            out.append(v)
        return out, pos
    if mt == 5:  # map (string keys in DAG-CBOR)
        m = {}
        for _ in range(arg):
            k, pos = _decode_item(buf, pos)
            v, pos = _decode_item(buf, pos)
            m[k] = v
        return m, pos
    if mt == 6:  # tag — DAG-CBOR allows only 42 (CID link)
        if arg != 42:
            raise CborError(f"unexpected CBOR tag {arg}")
        inner, pos = _decode_item(buf, pos)
        if not isinstance(inner, bytes) or inner[:1] != b"\x00":
            raise CborError("tag 42 payload must be identity-multibase CID bytes")
        return _Link(inner[1:]), pos
    if mt == 7:
        if info == 20:
            return False, pos
        if info == 21:
            return True, pos
        if info == 22:
            return None, pos
        if info == 26:  # float32 (accepted on read)
            return struct.unpack(">f", buf[pos - 4 : pos])[0], pos
        if info == 27:  # float64 (the DAG-CBOR float encoding)
            return struct.unpack(">d", buf[pos - 8 : pos])[0], pos
    raise CborError(f"unsupported CBOR item: major={mt} info={info}")


class _Link:
    """A decoded tag-42 CID link."""

    __slots__ = ("cid",)

    def __init__(self, cid: bytes):
        self.cid = cid

    def __str__(self) -> str:
        return cid_str(self.cid)


def cbor_decode(buf: bytes):
    value, pos = _decode_item(buf, 0)
    if pos != len(buf):
        raise CborError(f"{len(buf) - pos} trailing bytes after CBOR item")
    return value


def cbor_decode_prefix(buf: bytes, pos: int = 0):
    """Decode one CBOR item starting at pos → (value, next_pos). The XRPC
    event-stream framing is two concatenated CBOR items (header, body)."""
    return _decode_item(buf, pos)


# --- DAG-CBOR encode (tests + CAR headers) --------------------------------------


def _encode_head(mt: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(mt << 5) | arg])
    for info, size in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if arg < (1 << (8 * size)):
            return bytes([(mt << 5) | info]) + arg.to_bytes(size, "big")
    raise CborError("argument too large")


def cbor_encode(value) -> bytes:
    if value is False:
        return b"\xf4"
    if value is True:
        return b"\xf5"
    if value is None:
        return b"\xf6"
    if isinstance(value, _Link):
        inner = b"\x00" + value.cid
        return _encode_head(6, 42) + _encode_head(2, len(inner)) + inner
    if isinstance(value, int):
        return _encode_head(0, value) if value >= 0 else _encode_head(1, -1 - value)
    if isinstance(value, float):
        return b"\xfb" + struct.pack(">d", value)
    if isinstance(value, bytes):
        return _encode_head(2, len(value)) + value
    if isinstance(value, str):
        b = value.encode("utf-8")
        return _encode_head(3, len(b)) + b
    if isinstance(value, list):
        return _encode_head(4, len(value)) + b"".join(cbor_encode(v) for v in value)
    if isinstance(value, dict):
        # DAG-CBOR map key order: length-first then lexicographic over utf-8
        items = sorted(value.items(), key=lambda kv: (len(kv[0].encode()), kv[0].encode()))
        return _encode_head(5, len(items)) + b"".join(
            cbor_encode(k) + cbor_encode(v) for k, v in items
        )
    raise CborError(f"cannot encode {type(value).__name__}")


def link(cid: bytes) -> _Link:
    return _Link(cid)


# --- atproto JSON mapping -------------------------------------------------------


def to_json_value(value):
    """Decoded CBOR → the atproto JSON data model (data.UnmarshalCBOR →
    json.Marshal): bytes become {"$bytes": base64}, links {"$link": cid}."""
    if isinstance(value, _Link):
        return {"$link": str(value)}
    if isinstance(value, bytes):
        return {"$bytes": base64.b64encode(value).decode()}
    if isinstance(value, list):
        return [to_json_value(v) for v in value]
    if isinstance(value, dict):
        return {k: to_json_value(v) for k, v in value.items()}
    return value


# --- CAR v1 ---------------------------------------------------------------------


def encode_car(blocks: list[bytes], roots: list[bytes] | None = None) -> bytes:
    """CAR v1 from raw DAG-CBOR blocks; CIDs are computed (sha2-256)."""
    if roots is None:
        roots = [cid_for_block(blocks[0])] if blocks else []
    header = cbor_encode({"version": 1, "roots": [link(r) for r in roots]})
    out = bytearray(_write_varint(len(header)) + header)
    for data in blocks:
        cid = cid_for_block(data)
        section = cid + data
        out += _write_varint(len(section)) + section
    return bytes(out)


def decode_car(buf: bytes) -> tuple[dict, dict[str, bytes]]:
    """→ (header, {cid_str: block_bytes}). Every block's CID is REVERIFIED
    against its content (sha2-256) — a corrupted block never enters the
    index, which is the S7 integrity contract at the transport layer."""
    pos = 0
    hlen, pos = _read_varint(buf, pos)
    header = cbor_decode(buf[pos : pos + hlen])
    pos += hlen
    index: dict[str, bytes] = {}
    while pos < len(buf):
        slen, pos = _read_varint(buf, pos)
        section = buf[pos : pos + slen]
        pos += slen
        clen = _cid_byte_len(section, 0)
        cid, data = section[:clen], section[clen:]
        if cid[:1] == b"\x01" and cid_for_block(data, codec=_read_varint(cid, 1)[0]) != cid:
            continue  # content does not hash to the claimed CID — drop
        index[cid_str(cid)] = data
    return header, index


# --- XRPC event-stream frame decode (the real upstream framing) -----------------


def decode_xrpc_frame(data: bytes) -> dict | None:
    """One `com.atproto.sync.subscribeRepos` websocket BINARY frame → the
    engine's RAW_FRAME_SCHEMA dict. The wire is two concatenated DAG-CBOR
    items: header {op, t} then the typed body (the indigo
    events.XRPCStreamEvent layout the reference consumes via
    HandleRepoStream, cmd/jetstream/main.go:328). Commit bodies carry the
    CAR in `blocks`; ops' `cid` are tag-42 links — the op's record is
    resolved from the CAR by that CID and transcoded to JSON (S5/S8), with
    the CID string kept for the S7 verify filter downstream. Unknown event
    types (e.g. #info) return None and are skipped; an error header
    (op = -1) raises, matching the reference's stream-failure propagation
    (consumer.go:156-159)."""
    header, pos = cbor_decode_prefix(data, 0)
    body, _ = cbor_decode_prefix(data, pos)
    if header.get("op") == -1:
        raise RuntimeError(f"error frame from firehose: {body.get('error')}: {body.get('message')}")
    t = header.get("t")
    if t == "#commit":
        _, index = decode_car(body.get("blocks") or b"")
        ops = []
        for op in body.get("ops") or []:
            cid = str(op["cid"]) if op.get("cid") is not None else None
            record_json = None
            if cid is not None and cid in index:
                record_json = json.dumps(to_json_value(cbor_decode(index[cid])), separators=(",", ":"))
            ops.append(
                {
                    "action": op.get("action"),
                    "path": op.get("path"),
                    "cid": cid,
                    "record_json": record_json,
                    "record_cid": cid,
                }
            )
        return {
            "kind": "commit",
            "did": body.get("repo"),
            "seq": body.get("seq"),
            "rev": body.get("rev"),
            "too_big": bool(body.get("tooBig", False)),
            "ops": ops,
            "account": None,
            "identity": None,
        }
    if t == "#account":
        return {
            "kind": "account",
            "did": body.get("did"),
            "seq": body.get("seq"),
            "rev": None,
            "too_big": False,
            "ops": None,
            "account": {
                "active": body.get("active"),
                "did": body.get("did"),
                "seq": body.get("seq"),
                "time": body.get("time"),
                "status": body.get("status"),
            },
            "identity": None,
        }
    if t == "#identity":
        return {
            "kind": "identity",
            "did": body.get("did"),
            "seq": body.get("seq"),
            "rev": None,
            "too_big": False,
            "ops": None,
            "account": None,
            "identity": {
                "did": body.get("did"),
                "handle": body.get("handle"),
                "seq": body.get("seq"),
                "time": body.get("time"),
            },
        }
    return None  # unknown/info frame — skipped, like the reference's default case


# --- frame decode (the S5/S8 slot in the firehose read path) --------------------


def decode_frame(frame: dict) -> dict:
    """Resolve a commit frame's ops against its CAR `blocks_b64`: for each
    op carrying a record CID, decode the block to JSON (S8 transcode) and
    splice it as `record_json` — the exact HandleRepoCommit record path
    (consumer.go:223-243). Frames without blocks pass through unchanged
    (the pre-decoded JSONL transport)."""
    blocks_b64 = frame.get("blocks_b64")
    if not blocks_b64 or frame.get("kind") != "commit":
        return frame
    _, index = decode_car(base64.b64decode(blocks_b64))
    frame = dict(frame)
    ops = []
    for op in frame.get("ops") or []:
        op = dict(op)
        rcid = op.get("record_cid")
        if op.get("record_json") is None and rcid in index:
            record = cbor_decode(index[rcid])
            op["record_json"] = json.dumps(to_json_value(record), separators=(",", ":"))
        ops.append(op)
    frame["ops"] = ops
    frame.pop("blocks_b64", None)
    return frame
