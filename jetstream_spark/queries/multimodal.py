"""Multimodal-column plumbing (SURVEY.md §2.3).

Images/audio/video are opaque `binary` columns plus a typed metadata struct.
The decode libraries aren't in this container, so the *decode kernel* is
stubbed (deterministic fake derived from metadata, or NotImplementedError
when a real decode is requested) — but everything Spark-side is real:
schema, binary columns, Arrow batch shape, mapInPandas signatures,
partitioning. The `documents` table provides deterministic bytes
(utf-8 of text, ASCII-only) so byte-level kernels are oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table

FRAME_STEP = 16  # "video frame sampling": one frame per 16 bytes


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table: opaque binary payload + typed metadata.
    This is the canonical multimodal layout: payload BINARY, meta STRUCT."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over binary media columns — the pure
    built-in layer (no Python)."""
    media = _media_df(spark, sf_dir)
    return media.select(
        "doc_id",
        F.octet_length("payload").alias("payload_bytes"),
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        (F.col("meta.width") * F.col("meta.height")).alias("n_pixels"),
    )


# text is ASCII-only by construction (see module docstring), so byte length ==
# char length; avoids encode(), which older DuckDB releases don't ship.
Q_MM_META_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS INT) AS payload_bytes,
       'image/fake' AS media_type,
       CAST(n_chars % 64 + 1 AS INT) AS width,
       CAST(doc_id % 48 + 1 AS INT) AS height,
       CAST((n_chars % 64 + 1) * (doc_id % 48 + 1) AS INT) AS n_pixels
FROM documents
"""


def _pil_decode(payload: bytes):
    """PIL path (optional dependency): decoded pixel bytes, or None when
    PIL isn't installed."""
    try:
        from io import BytesIO

        from PIL import Image  # noqa: PLC0415 — optional dep, probed at call
    except ImportError:
        return None
    with Image.open(BytesIO(payload)) as img:
        return img.tobytes()


def decode_media(payload: bytes, media_type: str, *, allow_stub: bool = True):
    """The decode kernel: scanline-major pixel bytes for images.

    Resolution order: PIL when installed (any format it knows), else the
    in-repo pure-stdlib PNG codec (operators/png.py) for `image/png`, else
    — only with allow_stub=True — the deterministic fake used by the
    oracle-checked byte-stat queries (`image/fake`: the payload bytes ARE
    the pixels). allow_stub=False on an undecodable type raises instead of
    silently faking, so pipelines can insist on real decode."""
    if media_type == "image/fake":
        if allow_stub:
            return payload
        raise NotImplementedError("image/fake is the stub type; real decode refused")
    if media_type == "image/gif":
        # before the generic image/ path: ALL frames concatenated is the
        # contract here (PIL's tobytes would silently keep frame 1 only)
        from jetstream_spark.operators.gif import decode_gif

        _, _, _, frames = decode_gif(payload)
        return b"".join(frames)
    if media_type.startswith("image/"):
        pixels = _pil_decode(payload)
        if pixels is not None:
            return pixels
        if media_type == "image/png":
            from jetstream_spark.operators.png import decode_png

            _, _, _, pixels = decode_png(payload)
            return pixels
    if media_type == "audio/wav":
        from jetstream_spark.operators.wav import decode_wav

        _, _, _, frames = decode_wav(payload)
        return frames
    if allow_stub:
        return payload
    raise NotImplementedError(
        f"no decoder for {media_type!r}: PIL not installed and no stdlib codec"
    )


def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over decoded media via mapInPandas — vectorized
    per Arrow batch, the real shape of an image-embedding/resize kernel.
    Stats are over the stub-decoded bytes (ASCII text ⇒ oracle-checkable)."""
    import numpy as np

    media = _media_df(spark, sf_dir)

    def extract(batches):
        for pdf in batches:
            stats = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                pixels = np.frombuffer(decode_media(bytes(payload), mt), dtype=np.uint8)
                # no rounding here: Python rounds half-to-even, SQL rounds
                # half-up — rounding happens in Spark below to match DuckDB
                stats.append((len(pixels), float(pixels.mean()), int(pixels.min()), int(pixels.max())))
            out = pd.DataFrame(stats, columns=["n_bytes", "mean_byte", "min_byte", "max_byte"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    flat = media.select("doc_id", "payload", F.col("meta.media_type").alias("media_type"))
    raw = flat.mapInPandas(
        extract, schema="doc_id long, n_bytes long, mean_byte double, min_byte int, max_byte int"
    )
    return raw.withColumn("mean_byte", F.round("mean_byte", 4))


Q_MM_BYTES_ORACLE = """
WITH c AS (
  SELECT doc_id, ascii(substr(text, i, 1)) AS code
  FROM documents, unnest(generate_series(1, len(text))) AS u(i)
)
SELECT doc_id,
       count(*) AS n_bytes,
       round(avg(code), 4) AS mean_byte,
       CAST(min(code) AS INT) AS min_byte,
       CAST(max(code) AS INT) AS max_byte
FROM c GROUP BY doc_id
"""


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 16th byte of the payload is a "frame"; emits
    per-doc frame count + first/last frame values. mapInPandas keeps one
    Arrow batch per task — the same shape as real video frame extraction."""
    import numpy as np

    media = _media_df(spark, sf_dir)

    def sample(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(payload), dtype=np.uint8)
                frames = px[::FRAME_STEP]
                rows.append((int(doc_id), len(frames), int(frames[0]), int(frames[-1])))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "first_frame", "last_frame"])

    return media.select("doc_id", "payload").mapInPandas(
        sample, schema="doc_id long, n_frames int, first_frame int, last_frame int"
    )


Q_MM_FRAMES_ORACLE = f"""
SELECT doc_id,
       CAST(ceil(len(text) / {FRAME_STEP}.0) AS INT) AS n_frames,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_frame,
       CAST(ascii(substr(text, (CAST(ceil(len(text) / {FRAME_STEP}.0) AS INT) - 1) * {FRAME_STEP} + 1, 1)) AS INT) AS last_frame
FROM documents
"""


# --- audio: real WAV container round-trip ----------------------------------------
AUDIO_RATE = 8_000


def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction with a REAL container parse end-to-end:
    each doc's payload is a PCM16 WAV (written by the stdlib `wave`
    encoder; samples derive deterministically from the text bytes), and
    the kernel decodes it with `decode_media(..., allow_stub=False)` —
    the pure-stdlib RIFF parser in operators/wav.py, no stub anywhere.
    Encoder and decoder are independent implementations, so the round
    trip genuinely exercises the container format; the oracle recomputes
    the stats straight from the text characters.

    Scale shape: one mapInPandas pass, encode+decode+reduce per Arrow
    batch — the partitioning/batching contract a real audio-feature
    (fbank/embedding) kernel would inherit unchanged."""
    import io
    import struct as _struct
    import wave

    import numpy as np

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def extract(batches):
        from jetstream_spark.operators.wav import wav_samples

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = text.encode("utf-8")  # ascii by fixture construction
                pcm = _struct.pack(f"<{len(codes)}h", *((c - 96) * 256 for c in codes))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(AUDIO_RATE)
                    w.writeframes(pcm)
                payload = buf.getvalue()

                frames = decode_media(payload, "audio/wav", allow_stub=False)
                n_ch, rate, samples = wav_samples(payload)
                assert n_ch == 1 and rate == AUDIO_RATE and len(frames) == len(pcm)
                s = np.asarray(samples, dtype=np.float64)
                rows.append(
                    (
                        int(doc_id),
                        len(samples),
                        float(len(samples) * 1000.0 / AUDIO_RATE),
                        float(np.abs(s).mean()),
                        int(s.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "duration_ms", "mean_abs", "peak"]
            )

    raw = docs.mapInPandas(
        extract,
        schema="doc_id long, n_samples long, duration_ms double, mean_abs double, peak int",
    )
    return raw.select(
        "doc_id",
        "n_samples",
        F.round("duration_ms", 4).alias("duration_ms"),
        F.round("mean_abs", 4).alias("mean_abs"),
        "peak",
    )


Q_MM_AUDIO_ORACLE = f"""
WITH c AS (
  SELECT doc_id, (ascii(substr(text, i, 1)) - 96) * 256 AS sample
  FROM documents, unnest(generate_series(1, len(text))) AS u(i)
)
SELECT doc_id,
       count(*) AS n_samples,
       round(count(*) * 1000.0 / {AUDIO_RATE}, 4) AS duration_ms,
       round(avg(abs(sample)), 4) AS mean_abs,
       CAST(max(sample) AS INT) AS peak
FROM c GROUP BY doc_id
"""


# --- video: real multi-frame container (animated GIF) -----------------------------
VID_W, VID_H = 6, 4  # frame geometry; frame = 24 pixels
_VID_PIXELS = VID_W * VID_H


def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame extraction from a REAL multi-frame container: each doc's
    payload is an animated GIF (frames = text bytes chunked into 6×4
    index frames, zero-padded tail; built with the in-repo LZW encoder),
    and the kernel decodes it with `decode_media(..., allow_stub=False)`
    — the full variable-width LZW + container walk in operators/gif.py.
    Unlike the WAV round trip the encoder is in-repo too, so the decoder
    is additionally pinned by a hand-assembled spec-golden GIF in
    tests/test_gif.py. The oracle recomputes the stats from the text
    characters; `multimodal_frame_sample` keeps the stub-byte variant.

    Scale shape: one mapInPandas pass (encode+decode+reduce per Arrow
    batch) — the batching contract of a real video frame-sampling kernel."""
    import numpy as np

    from jetstream_spark.operators.gif import decode_gif, encode_gif

    palette = bytes(range(256)) * 3
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = text.encode("utf-8")
                n_frames = max(1, -(-len(codes) // _VID_PIXELS))
                padded = codes.ljust(n_frames * _VID_PIXELS, b"\x00")
                frames = [
                    padded[i * _VID_PIXELS : (i + 1) * _VID_PIXELS]
                    for i in range(n_frames)
                ]
                payload = encode_gif(frames, VID_W, VID_H, palette)

                pixels = decode_media(payload, "image/gif", allow_stub=False)
                w, h, _, dframes = decode_gif(payload)
                assert (w, h) == (VID_W, VID_H) and len(pixels) == len(padded)
                first = np.frombuffer(dframes[0], dtype=np.uint8)
                last = np.frombuffer(dframes[-1], dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        len(dframes),
                        float(first.mean()),
                        int(last.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "first_frame_mean", "last_frame_max"]
            )

    raw = docs.mapInPandas(
        extract,
        schema="doc_id long, n_frames int, first_frame_mean double, last_frame_max int",
    )
    return raw.select(
        "doc_id",
        "n_frames",
        F.round("first_frame_mean", 4).alias("first_frame_mean"),
        "last_frame_max",
    )


Q_MM_VIDEO_ORACLE = f"""
WITH c AS (
  SELECT doc_id, len(text) AS n,
         CAST(greatest(1, ceil(len(text) / {_VID_PIXELS}.0)) AS INT) AS n_frames
  FROM documents
), firstf AS (
  SELECT doc_id,
         sum(ascii(substr(text, i, 1))) AS s   -- pad zeros add nothing
  FROM documents, unnest(generate_series(1, least(len(text), {_VID_PIXELS}))) AS u(i)
  GROUP BY doc_id
), lastf AS (
  SELECT c.doc_id,
         max(ascii(substr(d.text, (c.n_frames - 1) * {_VID_PIXELS} + CAST(i AS INT), 1))) AS m
  FROM c JOIN documents d USING (doc_id),
       unnest(generate_series(1, c.n - (c.n_frames - 1) * {_VID_PIXELS})) AS u(i)
  GROUP BY c.doc_id
)
SELECT c.doc_id, c.n_frames,
       round(firstf.s / {_VID_PIXELS}.0, 4) AS first_frame_mean,
       CAST(greatest(lastf.m, 0) AS INT) AS last_frame_max
FROM c JOIN firstf USING (doc_id) JOIN lastf ON lastf.doc_id = c.doc_id
"""


# --- resize: decode → nearest-neighbor resample -----------------------------------
DST_W, DST_H = 4, 3  # thumbnail geometry


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize kernel of the extension brief, end-to-end REAL: each
    doc's payload is an 8-bit greyscale PNG (per-doc geometry, pixels =
    text bytes zero-padded), decoded with `decode_media(allow_stub=False)`
    (pure-stdlib codec) and nearest-neighbor resampled to a fixed
    {DST_W}×{DST_H} thumbnail — the shape of an image-preprocessing stage
    before feature extraction. Nearest-neighbor index arithmetic
    (src = ⌊dst·src_extent/dst_extent⌋) is integer-deterministic, so the
    oracle recomputes the thumbnail straight from the text characters.

    Scale shape: one mapInPandas pass; encode/decode/resample stay inside
    the Arrow batch kernel, nothing shuffles before the final projection."""
    import numpy as np

    from jetstream_spark.operators.png import encode_png

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = 6 + int(doc_id) % 5
                h = 4 + int(doc_id) % 3
                codes = text.encode("utf-8")[: w * h].ljust(w * h, b"\x00")
                payload = encode_png(codes, w, h, 1)
                px = np.frombuffer(
                    decode_media(payload, "image/png", allow_stub=False), dtype=np.uint8
                ).reshape(h, w)
                rs = np.arange(DST_H) * h // DST_H
                cs = np.arange(DST_W) * w // DST_W
                thumb = px[np.ix_(rs, cs)].astype(np.float64)
                rows.append((int(doc_id), w, h, float(thumb.mean()), int(thumb.max())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_w", "src_h", "thumb_mean", "thumb_max"]
            )

    raw = docs.mapInPandas(
        extract,
        schema="doc_id long, src_w int, src_h int, thumb_mean double, thumb_max int",
    )
    return raw.select(
        "doc_id",
        "src_w",
        "src_h",
        F.round("thumb_mean", 4).alias("thumb_mean"),
        "thumb_max",
    )


Q_MM_RESIZE_ORACLE = f"""
WITH geo AS (
  SELECT doc_id, text,
         CAST(6 + doc_id % 5 AS INT) AS w,
         CAST(4 + doc_id % 3 AS INT) AS h
  FROM documents
), thumb AS (
  SELECT g.doc_id,
         CASE WHEN (r * g.h // {DST_H}) * g.w + (c * g.w // {DST_W}) + 1 <= len(g.text)
              THEN ascii(substr(g.text, CAST((r * g.h // {DST_H}) * g.w + (c * g.w // {DST_W}) + 1 AS INT), 1))
              ELSE 0 END AS px
  FROM geo g,
       unnest(generate_series(0, {DST_H - 1})) AS ur(r),
       unnest(generate_series(0, {DST_W - 1})) AS uc(c)
)
SELECT geo.doc_id, geo.w AS src_w, geo.h AS src_h,
       round(t.s / {DST_W * DST_H}.0, 4) AS thumb_mean,
       CAST(t.m AS INT) AS thumb_max
FROM geo JOIN (
  SELECT doc_id, sum(px) AS s, max(px) AS m FROM thumb GROUP BY doc_id
) t USING (doc_id)
"""


PHASH_W = 32  # scanline width of the encoded image
PHASH_CELLS = 64  # 8x8 aHash grid, flattened


def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) image dedup — the image-side member of the
    dedup family: exact text dedup misses re-encoded/resized variants of
    the same picture, but block-mean hashes collide for perceptually-close
    images. Each doc's bytes become a real 8-bit greyscale PNG
    ({PHASH_W}-wide, zero-padded to full rows, ≥{PHASH_CELLS} pixels),
    round-trip through the in-repo codec, and hash to {PHASH_CELLS} bits:
    bit_c = (mean of cell c) > (global pixel mean), cells = contiguous
    64ths of the flattened image. Groups sharing a hash are perceptual
    duplicates (on this corpus: near-dup texts whose 64-cell luminance
    profile coincides).

    The threshold is computed in EXACT integer arithmetic
    (sum_c·N > S·cnt_c clears both denominators), so the oracle rebuilds
    the identical hash from text characters with no float divergence. At
    scale: one map-only Arrow pass (encode+decode+hash inside the batch
    kernel), then ONE hash-key shuffle — the md5-groupBy shape of
    dedup_exact; hamming-near grouping would reuse dedup_simhash's
    pigeonhole banding over the same bit string.
    """
    import numpy as np

    from jetstream_spark.operators.png import encode_png

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def phash(batches):
        for pdf in batches:
            out_ids, out_bits = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                n = max(PHASH_CELLS, -(-len(raw) // PHASH_W) * PHASH_W)
                codes = raw.ljust(n, b"\x00")
                payload = encode_png(codes, PHASH_W, n // PHASH_W, 1)
                px = np.frombuffer(
                    decode_media(payload, "image/png", allow_stub=False), dtype=np.uint8
                ).astype(np.int64)
                # ceil(c*n/64) start offsets partition [0,n) into the cells
                starts = -(-(np.arange(PHASH_CELLS) * n) // PHASH_CELLS)
                sums = np.add.reduceat(px, starts)
                cnts = np.diff(np.append(starts, n))
                total = int(px.sum())
                bits = (sums * n) > (total * cnts)
                out_ids.append(int(doc_id))
                out_bits.append("".join("1" if b else "0" for b in bits))
            yield pd.DataFrame({"doc_id": out_ids, "phash": out_bits})

    hashed = docs.mapInPandas(phash, schema="doc_id long, phash string")
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "phash")
    )


Q_MM_PHASH_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS L,
         greatest({PHASH_CELLS}, CAST(ceil(length(text)/{PHASH_W}.0)*{PHASH_W} AS INT)) AS N
  FROM documents
),
px AS (
  SELECT doc_id, N,
         CASE WHEN i < L THEN ascii(substr(text, CAST(i+1 AS INT), 1)) ELSE 0 END AS v,
         CAST(i * {PHASH_CELLS} // N AS INT) AS cell
  FROM d, unnest(generate_series(0, N-1)) AS u(i)
),
cells AS (SELECT doc_id, N, cell, sum(v) AS s_c, count(*) AS n_c FROM px GROUP BY 1, 2, 3),
tot AS (SELECT doc_id, sum(s_c) AS S FROM cells GROUP BY 1),
bits AS (
  SELECT c.doc_id,
         string_agg(CASE WHEN c.s_c * c.N > t.S * c.n_c THEN '1' ELSE '0' END, ''
                    ORDER BY c.cell) AS phash
  FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id
)
SELECT phash, count(*) AS n_docs, min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM bits GROUP BY phash HAVING count(*) >= 2
ORDER BY n_docs DESC, phash
"""


QUERIES = [
    QuerySpec("multimodal_phash_dedup", q_multimodal_phash_dedup, Q_MM_PHASH_ORACLE, "perceptual-hash (aHash) image dedup over real PNG round-trips", ("multimodal",)),
    QuerySpec("multimodal_resize", q_multimodal_resize, Q_MM_RESIZE_ORACLE, "real PNG decode -> nearest-neighbor thumbnail resample", ("multimodal",)),
    QuerySpec("multimodal_video_frames", q_multimodal_video_frames, Q_MM_VIDEO_ORACLE, "real animated-GIF frame extraction (in-repo LZW, spec-golden-pinned)", ("multimodal",)),
    QuerySpec("multimodal_audio_stats", q_multimodal_audio_stats, Q_MM_AUDIO_ORACLE, "real WAV container round-trip (stdlib wave encode, in-repo RIFF decode)", ("multimodal",)),
    QuerySpec("multimodal_metadata", q_multimodal_metadata, Q_MM_META_ORACLE, "binary payload + typed metadata projection", ("multimodal",)),
    QuerySpec("multimodal_byte_stats", q_multimodal_byte_stats, Q_MM_BYTES_ORACLE, "mapInPandas feature extraction over decoded media", ("multimodal",)),
    QuerySpec("multimodal_frame_sample", q_multimodal_frame_sample, Q_MM_FRAMES_ORACLE, "frame sampling over binary payloads", ("multimodal",)),
]
