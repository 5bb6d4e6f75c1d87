"""Streaming CMS: merged per-batch sketch == one-shot sketch (additivity),
heavy hitters surface, exactly-once replay."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from jetstream_spark.queries.sketches import _cms_bucket  # noqa: F401 (parity path)
from jetstream_spark.streaming.sketch_stream import (
    _batch_sketch,
    heavy_hitters,
    init_sketch_state,
    read_sketch,
    start_streaming_sketch,
)


def _write_batch(docs_dir: str, tag: str, docs: list[tuple[int, str]]) -> None:
    with open(os.path.join(docs_dir, f"{tag}.json"), "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _drain(spark, docs_dir, state_dir, ckpt) -> None:
    q = start_streaming_sketch(spark, docs_dir, state_dir, str(ckpt))
    q.processAllAvailable()
    q.stop()


BATCH1 = [(1, "alpha alpha alpha beta gamma"), (2, "alpha beta delta epsilon zeta")]
BATCH2 = [(3, "alpha alpha eta theta beta"), (4, "iota kappa alpha beta beta")]


def test_merged_sketch_equals_one_shot_and_heavy_hitters(spark, tmp_path):
    docs_dir, state_dir = str(tmp_path / "drop"), str(tmp_path / "state")
    os.makedirs(docs_dir)
    init_sketch_state(state_dir)
    ck = tmp_path / "ck"

    _write_batch(docs_dir, "b1", BATCH1)
    _drain(spark, docs_dir, state_dir, ck)
    _write_batch(docs_dir, "b2", BATCH2)
    _drain(spark, docs_dir, state_dir, ck)

    # CMS additivity: merged streaming sketch == sketch of all docs at once
    all_docs = spark.createDataFrame(BATCH1 + BATCH2, "doc_id long, text string")
    from jetstream_spark.queries.text import _tokens

    one_shot = {
        (r["j"], r["b"]): r["bucket_count"]
        for r in _batch_sketch(all_docs.select(F.explode(_tokens()).alias("term"))).collect()
    }
    merged = {
        (r["j"], r["b"]): r["bucket_count"] for r in read_sketch(spark, state_dir).collect()
    }
    assert merged == one_shot

    hh = heavy_hitters(spark, state_dir).collect()
    by_term = {r["term"]: r["cms_estimate"] for r in hh}
    # alpha appears 7x, beta 5x — CMS never undercounts
    assert by_term["alpha"] >= 7 and by_term["beta"] >= 5
    assert hh[0]["term"] == "alpha"


def test_replay_is_exactly_once_on_sketch(spark, tmp_path):
    docs_dir, state_dir = str(tmp_path / "drop"), str(tmp_path / "state")
    os.makedirs(docs_dir)
    init_sketch_state(state_dir)

    _write_batch(docs_dir, "b1", BATCH1)
    _drain(spark, docs_dir, state_dir, tmp_path / "ck")
    first = sorted(map(tuple, read_sketch(spark, state_dir).collect()))

    # fresh checkpoint replays the drop dir; markers + delete-before-rewrite
    # keep the sketch single-copy (no double counting)
    _drain(spark, docs_dir, state_dir, tmp_path / "ck_replay")
    assert sorted(map(tuple, read_sketch(spark, state_dir).collect())) == first
