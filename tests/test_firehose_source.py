"""The custom firehose data source (S1): offset progression, resume, and
composition with the normalize→sequence→log pipeline."""

from __future__ import annotations

import json
import os

import pytest

from jetstream_spark.atproto import log as eventlog
from jetstream_spark.atproto.normalize import normalize_frames
from jetstream_spark.streaming.firehose import FirehoseDataSource
from tests.fixtures import make_frames


def _write_replay_files(replay_dir: str, frames: list[dict], per_file: int = 25) -> None:
    os.makedirs(replay_dir, exist_ok=True)
    for i in range(0, len(frames), per_file):
        chunk = frames[i : i + per_file]
        hi = max(f["seq"] for f in chunk)
        with open(os.path.join(replay_dir, f"frames_{hi}.jsonl"), "w") as f:
            for fr in chunk:
                f.write(json.dumps(fr) + "\n")


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(FirehoseDataSource)
    return spark


@pytest.mark.timeout(300)
def test_firehose_source_end_to_end(registered, tmp_path):
    spark = registered
    replay_dir = str(tmp_path / "replay")
    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    frames = make_frames()
    _write_replay_files(replay_dir, frames)

    stream = (
        spark.readStream.format("atproto_firehose")
        .option("replay_dir", replay_dir)
        .option("numPartitions", "4")
        .load()
    )
    assert stream.isStreaming
    normalized = normalize_frames(stream)

    def handle(batch_df, batch_id):
        if not batch_df.isEmpty():
            eventlog.ingest_batch(batch_df, log_dir, wall_clock_us=1_000_000)

    q = (
        normalized.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    valid = [f for f in frames if f["did"] not in ("did:plc:toobig", "did:plc:badcid")]
    expected = sum(len(f["ops"] or []) if f["kind"] == "commit" else 1 for f in valid)
    log_df = eventlog.read_log(spark, log_dir)
    assert log_df.count() == expected
    times = [r["time_us"] for r in log_df.select("time_us").collect()]
    assert len(set(times)) == len(times)


@pytest.mark.timeout(300)
def test_firehose_source_resume_from_checkpoint(registered, tmp_path):
    """New replay files after restart are picked up from the checkpointed
    seq offset — no reprocessing (the S12 cursor-resume contract)."""
    spark = registered
    replay_dir = str(tmp_path / "replay")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    frames = make_frames()
    half = len(frames) // 2
    _write_replay_files(replay_dir, frames[:half])

    def run_until_drained():
        stream = (
            spark.readStream.format("atproto_firehose")
            .option("replay_dir", replay_dir)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_drained()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == half

    _write_replay_files(replay_dir, frames[half:])
    run_until_drained()
    df = spark.read.parquet(out_dir)
    assert df.count() == len(frames), "resume must process exactly the new frames"
    assert df.select("seq").distinct().count() == len(frames), "no duplicate seqs"
