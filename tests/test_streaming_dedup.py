"""Streaming incremental dedup e2e: cross-batch near-dups, history growth,
and exactly-once replay of the pair output."""

from __future__ import annotations

import json
import os

from jetstream_spark.streaming.dedup_stream import (
    init_dedup_state,
    read_pairs,
    start_streaming_dedup,
)

NOVEL = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa doc {i}",
    "one small step over the shuffle boundary and into codegen land {i}",
    "partition pruning keeps the scan honest at any scale factor {i}",
    "watermarks close sessions when the event time horizon moves {i}",
]


def _write_batch(docs_dir: str, tag: str, docs: list[tuple[int, str]]) -> None:
    with open(os.path.join(docs_dir, f"{tag}.json"), "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _drain(spark, docs_dir, state_dir, ckpt) -> None:
    q = start_streaming_dedup(spark, docs_dir, state_dir, str(ckpt))
    q.processAllAvailable()
    q.stop()


def test_cross_batch_near_dup_detected_and_history_grows(spark, tmp_path):
    docs_dir, state_dir = str(tmp_path / "drop"), str(tmp_path / "state")
    os.makedirs(docs_dir)
    init_dedup_state(spark, state_dir)

    ck = tmp_path / "ck"  # ONE checkpoint: each drain resumes the file source
    batch1 = [(i, NOVEL[i % 4].format(i=i) * 3) for i in range(1, 5)]
    _write_batch(docs_dir, "b1", batch1)
    _drain(spark, docs_dir, state_dir, ck)
    # first batch has no history to match against
    assert read_pairs(spark, state_dir).count() == 0

    # batch 2: one near-copy of doc 2 (same text + tiny suffix), one novel
    dup_of_2 = batch1[1][1] + " xx"
    _write_batch(docs_dir, "b2", [(10, dup_of_2), (11, "completely different words here" * 4)])
    _drain(spark, docs_dir, state_dir, ck)
    pairs = {(r["base_doc_id"], r["new_doc_id"]) for r in read_pairs(spark, state_dir).collect()}
    assert pairs == {(2, 10)}
    got = read_pairs(spark, state_dir).collect()[0]
    assert got["jaccard"] >= 0.7

    # batch 3 matches a BATCH-2 doc: history grew past the initial corpus
    _write_batch(docs_dir, "b3", [(20, dup_of_2 + " y")])
    _drain(spark, docs_dir, state_dir, ck)
    pairs = {(r["base_doc_id"], r["new_doc_id"]) for r in read_pairs(spark, state_dir).collect()}
    assert (10, 20) in pairs and (2, 20) in pairs


def test_replay_is_exactly_once_on_pairs(spark, tmp_path):
    docs_dir, state_dir = str(tmp_path / "drop"), str(tmp_path / "state")
    os.makedirs(docs_dir)
    init_dedup_state(spark, state_dir)

    ck = tmp_path / "ck"
    base = NOVEL[0].format(i=0) * 3
    _write_batch(docs_dir, "b1", [(1, base)])
    _drain(spark, docs_dir, state_dir, ck)
    _write_batch(docs_dir, "b2", [(2, base + " z")])
    _drain(spark, docs_dir, state_dir, ck)
    first = sorted(map(tuple, read_pairs(spark, state_dir).collect()))
    assert len(first) == 1

    # a fresh checkpoint replays the whole drop directory from scratch; the
    # batch-id markers and delete-before-rewrite keep outputs single-copy
    _drain(spark, docs_dir, state_dir, tmp_path / "ck_replay")
    assert sorted(map(tuple, read_pairs(spark, state_dir).collect())) == first
