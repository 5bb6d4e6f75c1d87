"""S1/S2 — the firehose as a Spark 4 Python data source.

The reference dials `com.atproto.sync.subscribeRepos` over a websocket and
fans frames to a worker pool (cmd/jetstream/main.go:294-328, worker pool
main.go:150). Here that becomes a `DataSource`/`DataSourceStreamReader`:

  * offsets = the upstream relay `seq` (the reference's cursor unit for
    the *upstream* connection — persist.go:19-23): `{"seq": N}`
  * partitions = seq sub-ranges per microbatch (`numPartitions` plays the
    role of --worker-count; per-partition reads are independent, matching
    the pool's per-repo independence guarantee, S2/P5)
  * each partition's `read()` yields RAW_FRAME_SCHEMA rows; this is where
    CAR/CBOR decode (S5/S8, the H3 stub) would run — network + libipld
    are absent in this container, so the transport is pluggable:
    the default `replay_dir` transport reads CBOR-stand-in JSONL files
    (one file per seq range produced by a websocket bridge); a live
    websocket transport would implement `_fetch(start_seq, end_seq)`
    against the relay with `?cursor=`.

Register + use:

    spark.dataSource.register(FirehoseDataSource)
    spark.readStream.format("atproto_firehose")
         .option("replay_dir", path).option("batch_size", 500).load()

The stream composes with normalize_frames → sequencer → log exactly like
the file-backed pipeline (tested in tests/test_firehose_source.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from jetstream_spark.atproto.schema import RAW_FRAME_SCHEMA


class SeqRange(InputPartition):
    def __init__(self, start: int, end: int, replay_dir: str):
        self.start = start
        self.end = end
        self.replay_dir = replay_dir


class FirehoseStreamReader(DataSourceStreamReader):
    """Offsets are upstream seq numbers; progress is monotone and resumes
    from the checkpointed offset exactly like the reference's
    `override-relay-cursor`/cursor-resume logic (main.go:280-297)."""

    def __init__(self, options: dict):
        self.replay_dir = options.get("replay_dir", "")
        self.batch_size = int(options.get("batch_size", "1000"))
        self.num_partitions = int(options.get("numPartitions", "4"))
        self._last_end: int | None = None

    def _head_seq(self) -> int:
        """Highest seq available from the transport (relay head)."""
        head = 0
        if os.path.isdir(self.replay_dir):
            for name in os.listdir(self.replay_dir):
                if name.endswith(".jsonl"):
                    try:
                        head = max(head, int(name.split(".")[0].split("_")[-1]))
                    except ValueError:
                        continue
        return head

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        # advance at most batch_size seqs per microbatch — the ingest
        # throttle (the reference's queue cap, main.go:49-54 / P6-P7;
        # maxOffsetsPerTrigger in Spark terms)
        head = self._head_seq()
        if self._last_end is not None:
            head = min(head, self._last_end + self.batch_size)
        self._last_end = head
        return {"seq": head}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        if hi <= lo:
            return [SeqRange(lo, lo, self.replay_dir)]
        n = self.num_partitions
        step = max(1, (hi - lo + n - 1) // n)
        return [
            SeqRange(s, min(s + step, hi), self.replay_dir)
            for s in range(lo, hi, step)
        ]

    def read(self, partition: SeqRange):
        """Yield frames with start < seq <= end. Decode (S5/S8) happens
        here in a real transport; the JSONL stand-in is already decoded."""
        if not os.path.isdir(partition.replay_dir):
            return
        for name in sorted(os.listdir(partition.replay_dir)):
            if not name.endswith(".jsonl"):
                continue
            with open(os.path.join(partition.replay_dir, name)) as f:
                for line in f:
                    frame = json.loads(line)
                    seq = frame["seq"]
                    if partition.start < seq <= partition.end:
                        yield tuple(
                            _to_row_value(frame.get(field.name), field.name)
                            for field in RAW_FRAME_SCHEMA.fields
                        )

    def commit(self, end: dict) -> None:
        # offsets live in the Spark checkpoint (the S12 analogue); the
        # transport needs no server-side ack (websocket replay is by cursor)
        pass


def _to_row_value(value, field_name: str):
    if value is None:
        return None
    if field_name == "ops":
        return [
            (op.get("action"), op.get("path"), op.get("cid"), op.get("record_json"), op.get("record_cid"))
            for op in value
        ]
    if field_name == "account":
        return (value.get("active"), value.get("did"), value.get("seq"), value.get("time"), value.get("status"))
    if field_name == "identity":
        return (value.get("did"), value.get("handle"), value.get("seq"), value.get("time"))
    return value


class FirehoseDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "atproto_firehose"

    def schema(self):
        return RAW_FRAME_SCHEMA

    def streamReader(self, schema) -> FirehoseStreamReader:
        return FirehoseStreamReader(self.options)
