"""Deduplication operators over `documents` / `embeddings` (SURVEY.md §2.3).

Five dedup families, each designed for the 100 TB path:

- exact            content-hash groupBy (one shuffle on the hash)
- ngram_jaccard    exact char-8-gram Jaccard via inverted-index self-join —
                   the *exact* baseline the approximate methods are verified
                   against; quadratic in worst case, kept for correctness
- minhash_lsh      MinHash signatures + banded LSH candidate generation +
                   exact-Jaccard verification of candidates only — the scale
                   path; recall is a banding parameter, and because every
                   candidate is verified with the exact measure, the output
                   equals the exact query whenever recall=1
- simhash          32-bit SimHash over char-4-gram features; pairs via
                   8×4-bit pigeonhole banding (hamming ≤ HAM_T < #bands ⇒ a
                   shared band exists ⇒ banded equi-join is EXACT, not
                   approximate) — no quadratic pass at any scale
- embedding cosine near-dup (vectorized numpy block products)

Oracle note: MinHash constants (a_i, b_i) are seeded and fixed; the oracle
for minhash_lsh is the *exact* Jaccard SQL — by construction LSH+verify
must reproduce it (verified in tests at the driver's correctness SF).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table

# --- shared shingling contract (mirrored in oracles) -------------------------
SHINGLE_W = 8
JACCARD_T = 0.7

# array<string> of distinct char-8-grams of lower(text)
_SHINGLES_EXPR = (
    "array_distinct(transform(sequence(1, greatest(length(lower(text)) - {w}, 1)), "
    "i -> substring(lower(text), i, {w1})))"
).format(w=SHINGLE_W - 1, w1=SHINGLE_W)

_SHINGLES_SQL = (
    "list_distinct(list_transform(generate_series(1, greatest(len(lower(text)) - {w}, 1)), "
    "i -> substr(lower(text), i, {w1})))"
).format(w=SHINGLE_W - 1, w1=SHINGLE_W)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition first: documents.parquet is a single file, and the shingle
    # transform is the expensive part — compute it on all cores
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return docs.select("doc_id", F.expr(_SHINGLES_EXPR).alias("shingles"))


# --- exact dedup ---------------------------------------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5 hash → canonical (min doc_id) + group size.
    One shuffle on the 128-bit hash; at 100 TB this is the cheapest dedup."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("group_size"))
    )


Q_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id, count(*) AS group_size
FROM documents
GROUP BY md5(text)
"""


# --- exact n-gram Jaccard pairs ---------------------------------------------------
_JACCARD_PAIRS_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {JACCARD_T}
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs via prefix filtering (the AllPairs/PPJoin bound):
    if J(A,B) ≥ t, then under any global shingle ordering A and B share an
    element within each one's first n−⌈t·n⌉+1 shingles. So the inverted-
    index self-join runs over ~(1−t)·n prefix shingles only (~9% of the
    naive pair volume at t=0.7), and every candidate is then verified with
    the true Jaccard on the full (cached) shingle arrays. A plain
    shingle-equality self-join is quadratic on corpora with shared
    vocabulary — 30× slower on this corpus at sf0.1."""
    sh = _doc_shingles(spark, sf_dir).withColumn(
        # global order = hash order (spreads hot shingles out of prefixes)
        "sorted_sh",
        F.expr("array_sort(transform(shingles, s -> struct(xxhash64(s) as h, s as s)))"),
    ).select("doc_id", "shingles", "sorted_sh").cache()
    prefix_len = F.size("sorted_sh") - F.ceil(F.size("sorted_sh") * F.lit(JACCARD_T)).cast("int") + 1
    prefixes = sh.select(
        "doc_id", F.size("sorted_sh").alias("n"), F.explode(F.slice("sorted_sh", 1, prefix_len)).alias("p")
    ).select("doc_id", "n", F.col("p.s").alias("s"))
    a = prefixes.alias("a")
    b = prefixes.alias("b")
    # length filter: J(A,B) ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t — prunes size-mismatched
    # pairs before the expensive distinct+verify
    candidates = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") >= F.col("b.n") * F.lit(JACCARD_T))
            & (F.col("b.n") >= F.col("a.n") * F.lit(JACCARD_T)),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = inter / (F.size("a_sh") + F.size("b_sh") - inter)
    return (
        candidates.join(sa, F.col("doc_a") == F.col("a_id"))
        .join(sb, F.col("doc_b") == F.col("b_id"))
        .where(jac >= JACCARD_T)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- MinHash + LSH -----------------------------------------------------------------
_MH_K = 24  # signature length
_MH_R = 3  # rows per band
_MH_B = _MH_K // _MH_R  # 8 bands → P(candidate | j=0.9) ≈ 1 - (1-0.729)^8 ≈ 0.99998
_MH_P = 4294967311  # prime > 2^32
_rng = random.Random(42)
_MH_A = [_rng.randrange(1, 1 << 30) for _ in range(_MH_K)]
_MH_B_ = [_rng.randrange(0, _MH_P) for _ in range(_MH_K)]


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup: K=24 permutations h_i(x) = (a_i·x + b_i) mod P
    over 32-bit shingle hashes, 8 bands × 3 rows, banded equi-join for
    candidates, exact-Jaccard verification of candidates only.

    Signature kernel = vectorized numpy per Arrow batch (shingle hashing +
    24 permutations + per-band combine in one pass — no explode shuffle,
    no 24-way aggregate; ~2× the explode+agg formulation here and far
    less shuffle at scale). Spark owns what Spark is good at: the
    (band_idx, band_key) candidate shuffle and the verification joins.
    Per doc the kernel emits 8 narrow band rows; at 100 TB the band key
    is the natural partition key and bucket skew is AQE's problem.

    P(candidate | J=0.9) = 1-(1-0.9³)^8 ≈ 0.99998; every candidate is
    verified exactly, so output == the exact-Jaccard oracle whenever LSH
    recall is 1 (asserted against the exact query in tests).
    """
    import numpy as np

    docs = table(spark, sf_dir, "documents")
    A = np.array(_MH_A, dtype=np.uint64)
    B = np.array(_MH_B_, dtype=np.uint64)

    def kernel(batches):
        for pdf in batches:
            doc_ids, band_idxs, band_keys = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if len(codes) < SHINGLE_W:
                    codes = np.pad(codes, (0, SHINGLE_W - len(codes)))
                w = np.lib.stride_tricks.sliding_window_view(codes, SHINGLE_W)
                poly = np.zeros(len(w), dtype=np.uint64)
                for k in range(SHINGLE_W):  # poly-31 rolling hash, mod-2^64 wraparound
                    poly = poly * np.uint64(31) + w[:, k]
                x = np.unique((poly * np.uint64(_SH_MIX)) % np.uint64(1 << 32))
                sig = ((A[None, :] * x[:, None] + B[None, :]) % np.uint64(_MH_P)).min(axis=0)
                bands = sig.reshape(_MH_B, _MH_R)
                keys = np.zeros(_MH_B, dtype=np.uint64)
                for r in range(_MH_R):
                    keys = keys * np.uint64(_MH_P) + bands[:, r]
                doc_ids.extend([int(doc_id)] * _MH_B)
                band_idxs.extend(range(_MH_B))
                band_keys.extend(keys.view(np.int64))
            yield pd.DataFrame({"doc_id": doc_ids, "band_idx": band_idxs, "band_key": band_keys})

    # documents.parquet is one file → one input partition; spread the kernel
    par = spark.sparkContext.defaultParallelism
    bands = docs.select("doc_id", "text").repartition(par).mapInPandas(
        kernel, schema="doc_id long, band_idx int, band_key long"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification of candidates only
    sh = _doc_shingles(spark, sf_dir)
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = inter / (F.size("a_sh") + F.size("b_sh") - inter)
    return (
        candidates.join(sa, F.col("doc_a") == F.col("a_id"))
        .join(sb, F.col("doc_b") == F.col("b_id"))
        .where(jac >= JACCARD_T)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- SimHash -----------------------------------------------------------------------
_SH_BITS = 32
_SH_BANDS = 4  # 4 bands × 8 bits: collision baseline 1/256 per band —
# 8×4-bit bands would collide at 1/16 and admit ~50% of all pairs as candidates
_SH_HAM_T = 3  # hamming ≤ 3 < 4 bands ⇒ pigeonhole: banded join is exact
_SH_BAND_BITS = _SH_BITS // _SH_BANDS
_SH_MIX = 2654435761  # Knuth multiplicative constant
_SH_GRAM = 4


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash over distinct char-4-gram features.

    Feature hash is pure arithmetic (no engine hash function) so the oracle
    can recompute it: poly-31 over the 4 char codes, Knuth-mixed, mod 2^32.

    The kernel is a vectorized numpy pass per Arrow batch (sliding-window
    char codes → poly hash → per-bit ±1 sums → sign bits): one narrow
    (doc_id, simhash) row out per doc, no explode shuffle, no 32-way
    aggregate — ~10× the explode+agg formulation, and the per-partition
    shape is exactly what a 1000-executor run wants.
    """
    import numpy as np

    docs = table(spark, sf_dir, "documents")

    def kernel(batches):
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf["text"]):
                codes = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if len(codes) < _SH_GRAM:
                    codes = np.pad(codes, (0, _SH_GRAM - len(codes)))
                w = np.lib.stride_tricks.sliding_window_view(codes, _SH_GRAM)
                poly = ((w[:, 0] * 31 + w[:, 1]) * 31 + w[:, 2]) * 31 + w[:, 3]
                h = np.unique((poly * np.uint64(_SH_MIX)) % np.uint64(1 << 32))
                bits = (h[:, None] >> np.arange(_SH_BITS, dtype=np.uint64)[None, :]) & np.uint64(1)
                sums = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                out[i] = int(((sums > 0).astype(np.uint64) << np.arange(_SH_BITS, dtype=np.uint64)).sum())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    par = spark.sparkContext.defaultParallelism
    return docs.select("doc_id", "text").repartition(par).mapInPandas(
        kernel, schema="doc_id long, simhash long"
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, hamming ≤ 3, found via 8×4-bit banded
    equi-join (exact by pigeonhole — ≤3 flipped bits cannot touch all 8
    bands), then xor+bit_count verification. No all-pairs pass."""
    sims = _simhash_df(spark, sf_dir)
    band_structs = [
        F.struct(
            F.lit(j).alias("band_idx"),
            F.floor(F.col("simhash") / F.lit(1 << (_SH_BAND_BITS * j)))
            .cast("long")
            .bitwiseAND(F.lit((1 << _SH_BAND_BITS) - 1))
            .alias("band_val"),
        )
        for j in range(_SH_BANDS)
    ]
    bands = sims.select("doc_id", "simhash", F.explode(F.array(*band_structs)).alias("b")).select(
        "doc_id", "simhash", F.col("b.band_idx").alias("band_idx"), F.col("b.band_val").alias("band_val")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(sim_a ^ sim_b)")
    return pairs.where(ham <= _SH_HAM_T).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


def _simhash_oracle() -> str:
    grams_sql = (
        "list_distinct(list_transform(generate_series(1, greatest(len(lower(text)) - {w}, 1)), "
        "i -> substr(lower(text), i, {g})))".format(w=_SH_GRAM - 1, g=_SH_GRAM)
    )
    bit_sum_cols = ",\n         ".join(
        f"sum(CASE WHEN CAST(floor(h / {1 << b}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(_SH_BITS)
    )
    sim_expr = " + ".join(f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(_SH_BITS))
    return f"""
WITH feat AS (
  SELECT DISTINCT doc_id,
         ((((ascii(substr(g, 1, 1)) * 31 + ascii(substr(g, 2, 1))) * 31
            + ascii(substr(g, 3, 1))) * 31 + ascii(substr(g, 4, 1))) * {_SH_MIX}) % {1 << 32} AS h
  FROM (SELECT doc_id, unnest({grams_sql}) AS g FROM documents)
), bits AS (
  SELECT doc_id,
         {bit_sum_cols}
  FROM feat GROUP BY doc_id
), sims AS (
  SELECT doc_id, {sim_expr} AS simhash FROM bits
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SH_HAM_T}
"""


# --- embedding cosine near-dup ---------------------------------------------------------
COS_T = 0.4


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.4) via numpy block products:
    each Arrow batch of vectors is multiplied against the (broadcast) full
    matrix — vectorized float64, no per-row Python. At 100 TB the broadcast
    side becomes LSH buckets / IVF cells (see similarity.py); the block
    structure stays the same."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()  # small side: materialized once, broadcast
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    bmat = spark.sparkContext.broadcast((ids, mat, norms))

    def block(batches):
        b_ids, b_mat, b_norms = bmat.value
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            q_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            q_norms = np.linalg.norm(q_mat, axis=1)
            cos = (q_mat @ b_mat.T) / np.outer(q_norms, b_norms)
            qi, bi = np.nonzero((cos >= COS_T) & (q_ids[:, None] < b_ids[None, :]))
            if len(qi):
                # raw cosine out; rounding happens in Spark (half-up, like SQL)
                yield pd.DataFrame(
                    {"vec_a": q_ids[qi], "vec_b": b_ids[bi], "cosine": cos[qi, bi]}
                )

    schema = "vec_a long, vec_b long, cosine double"
    raw = emb.select("vec_id", "embedding").mapInPandas(block, schema=schema)
    return raw.withColumn("cosine", F.round("cosine", 6))


Q_EMB_NEARDUP_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {COS_T}
"""


QUERIES = [
    QuerySpec("dedup_exact", q_dedup_exact, Q_DEDUP_EXACT_ORACLE, "content-hash exact dedup", ("dedup",)),
    QuerySpec("dedup_ngram_jaccard", q_dedup_ngram_jaccard, _JACCARD_PAIRS_SQL, "exact char-8-gram Jaccard pairs", ("dedup",)),
    QuerySpec("dedup_minhash_lsh", q_dedup_minhash_lsh, _JACCARD_PAIRS_SQL, "MinHash-LSH + exact verify (== exact pairs)", ("dedup",)),
    QuerySpec("dedup_simhash", q_dedup_simhash, _simhash_oracle(), "SimHash hamming≤3 pairs via exact pigeonhole banding", ("dedup",)),
    QuerySpec("dedup_embedding_cosine", q_dedup_embedding_cosine, Q_EMB_NEARDUP_ORACLE, "embedding cosine≥0.4 near-dup pairs", ("dedup",)),
]
