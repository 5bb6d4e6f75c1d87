"""S5/S8: pure-Python DAG-CBOR + CAR v1 codec — round-trips, CID
verification, the atproto JSON mapping, and the full firehose path with
CAR-carrying frames (decode inside DataSource partitions)."""

from __future__ import annotations

import base64
import json

import pytest

from jetstream_spark.atproto.carcbor import (
    cbor_decode,
    cbor_encode,
    cid_for_block,
    cid_str,
    decode_car,
    decode_frame,
    encode_car,
    link,
    to_json_value,
)


def test_cbor_scalar_roundtrip():
    cases = [
        0, 1, 23, 24, 255, 256, 65535, 65536, 2**32, -1, -24, -25, -(2**31),
        True, False, None, 1.5, -2.75, "", "hello", "héllo ✓", b"", b"\x00\xff",
        "x" * 300, b"y" * 70000,
    ]
    for v in cases:
        assert cbor_decode(cbor_encode(v)) == v, repr(v)


def test_cbor_nested_and_links():
    cid = cid_for_block(b"some block")
    value = {
        "text": "hi",
        "n": 42,
        "tags": ["a", "b"],
        "embed": {"ref": link(cid), "blob": b"\x01\x02"},
        "nested": [{"deep": [1, [2, [3]]]}],
    }
    out = cbor_decode(cbor_encode(value))
    assert out["text"] == "hi" and out["tags"] == ["a", "b"]
    assert str(out["embed"]["ref"]) == cid_str(cid)
    j = to_json_value(out)
    assert j["embed"]["ref"] == {"$link": cid_str(cid)}
    assert j["embed"]["blob"] == {"$bytes": base64.b64encode(b"\x01\x02").decode()}


def test_cid_form():
    cid = cid_for_block(cbor_encode({"a": 1}))
    s = cid_str(cid)
    assert s.startswith("baf"), "CIDv1 dag-cbor sha256 renders as baf…"
    assert s == s.lower()


def test_car_roundtrip_and_verification():
    records = [cbor_encode({"i": i, "body": "r" * i}) for i in range(1, 4)]
    car = encode_car(records)
    header, index = decode_car(car)
    assert header["version"] == 1
    assert len(index) == 3
    for rec in records:
        assert index[cid_str(cid_for_block(rec))] == rec

    # corrupt one block's payload: its claimed CID no longer matches the
    # content hash, so it must be dropped from the index
    bad = bytearray(car)
    bad[-1] ^= 0xFF
    _, index2 = decode_car(bytes(bad))
    assert len(index2) == 2, "corrupted block must fail CID verification"


def test_decode_frame_resolves_records():
    record = {"$type": "app.bsky.feed.post", "text": "hello from CAR"}
    block = cbor_encode(record)
    rcid = cid_str(cid_for_block(block))
    frame = {
        "kind": "commit",
        "did": "did:plc:cartest",
        "seq": 1,
        "rev": "rev1",
        "too_big": False,
        "blocks_b64": base64.b64encode(encode_car([block])).decode(),
        "ops": [
            {"action": "create", "path": "app.bsky.feed.post/rkey1", "cid": rcid,
             "record_json": None, "record_cid": rcid},
            {"action": "delete", "path": "app.bsky.feed.post/rkey2", "cid": None,
             "record_json": None, "record_cid": None},
        ],
    }
    out = decode_frame(frame)
    assert "blocks_b64" not in out
    assert json.loads(out["ops"][0]["record_json"]) == record
    assert out["ops"][1]["record_json"] is None, "deletes carry no record"
    # non-commit and no-blocks frames pass through untouched
    acct = {"kind": "account", "seq": 2}
    assert decode_frame(acct) is acct


@pytest.mark.timeout(300)
def test_firehose_replay_with_car_blocks(spark, tmp_path):
    """End-to-end S1+S5+S8: JSONL frames carrying CAR archives (no
    pre-decoded records) stream through the DataSource, which decodes the
    blocks per partition; normalize sees ordinary record JSON."""
    import os

    from jetstream_spark.atproto.normalize import normalize_frames
    from jetstream_spark.streaming.firehose import FirehoseDataSource
    from pyspark.sql import functions as F

    spark.dataSource.register(FirehoseDataSource)
    replay_dir = str(tmp_path / "replay")
    os.makedirs(replay_dir)
    frames = []
    for i in range(1, 21):
        record = {"$type": "app.bsky.feed.post", "text": f"post {i}"}
        block = cbor_encode(record)
        rcid = cid_str(cid_for_block(block))
        frames.append({
            "kind": "commit",
            "did": f"did:plc:user{i % 3}",
            "seq": i,
            "rev": f"rev{i}",
            "too_big": False,
            "blocks_b64": base64.b64encode(encode_car([block])).decode(),
            "ops": [{"action": "create", "path": f"app.bsky.feed.post/rk{i}",
                     "cid": rcid, "record_json": None, "record_cid": rcid}],
        })
    with open(os.path.join(replay_dir, f"frames_{len(frames)}.jsonl"), "w") as f:
        for fr in frames:
            f.write(json.dumps(fr) + "\n")

    stream = (
        spark.readStream.format("atproto_firehose")
        .option("replay_dir", replay_dir)
        .load()
    )
    out_dir = str(tmp_path / "out")
    q = (
        normalize_frames(stream).writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    df = spark.read.parquet(out_dir)
    assert df.count() == 20
    texts = {
        json.loads(r["record"])["text"]
        for r in df.select(F.col("commit.record").alias("record")).collect()
    }
    assert texts == {f"post {i}" for i in range(1, 21)}, "decoded records must flow through"
