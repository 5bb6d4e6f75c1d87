"""Shared RFC 6455 client-side frame writer (stdlib only).

Client-to-server frames MUST be masked (RFC 6455 §5.1: a server closes the
connection on an unmasked client frame). Both stdlib websocket clients — the
firehose ws transport (streaming/firehose.py) and the subscriber client
library (client.py) — use this to answer server pings with masked pongs and
to echo close frames, so a spec-conforming upstream that pings idle clients
(the real relay does) keeps the connection alive instead of timing it out.
"""

from __future__ import annotations

import os


def send_masked_frame(sock, opcode: int, payload: bytes = b"") -> None:
    """One masked, FIN-flagged client frame. opcode: 0x1 text, 0x2 binary,
    0x8 close, 0x9 ping, 0xA pong."""
    mask = os.urandom(4)
    n = len(payload)
    head = bytearray([0x80 | (opcode & 0x0F)])
    if n < 126:
        head.append(0x80 | n)
    elif n < 1 << 16:
        head.append(0x80 | 126)
        head += n.to_bytes(2, "big")
    else:
        head.append(0x80 | 127)
        head += n.to_bytes(8, "big")
    head += mask
    sock.sendall(bytes(head) + bytes(b ^ mask[i & 3] for i, b in enumerate(payload)))
