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
    docs = table(spark, sf_dir, "documents")
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
    """Exact near-dup pairs: inverted index (shingle → docs) self-join,
    intersection counts, Jaccard ≥ 0.7. The shuffle key is the shingle;
    hot shingles (stopword-ish 8-grams) are the skew risk at scale — AQE
    skew-join handles moderate skew, MinHash-LSH is the real scale answer."""
    sh = _doc_shingles(spark, sf_dir).select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("inter") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
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
    """MinHash-LSH near-dup: shingle → 32-bit universe via xxhash64,
    K=24 permutations h_i(x) = (a_i·x + b_i) mod P, 8 bands × 3 rows,
    banded equi-join for candidates, exact-Jaccard verification.

    Scale shape: signatures are one narrow row per doc (24 longs); the
    candidate join shuffles only (band_idx, band_key); verification touches
    candidate pairs only. a_i·x ≤ 2^30·2^32 = 2^62 — no ANSI overflow.
    """
    sh = _doc_shingles(spark, sf_dir)
    x = F.pmod(F.xxhash64(F.col("s")), F.lit(1 << 32))
    exploded = sh.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", x.alias("x")
    )
    sig_aggs = [
        F.min(F.pmod(F.col("x") * F.lit(_MH_A[i]) + F.lit(_MH_B_[i]), F.lit(_MH_P))).alias(f"h{i}")
        for i in range(_MH_K)
    ]
    sigs = exploded.groupBy("doc_id").agg(*sig_aggs)
    band_structs = [
        F.struct(
            F.lit(j).alias("band_idx"),
            F.xxhash64(*[F.col(f"h{j * _MH_R + r}") for r in range(_MH_R)]).alias("band_key"),
        )
        for j in range(_MH_B)
    ]
    bands = sigs.select("doc_id", F.explode(F.array(*band_structs)).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
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
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    verified = (
        candidates.join(sa, F.col("doc_a") == F.col("a_id"))
        .join(sb, F.col("doc_b") == F.col("b_id"))
        .withColumn("inter", F.size(F.array_intersect("a_sh", "b_sh")))
        .withColumn("uni", F.size("a_sh") + F.size("b_sh") - F.col("inter"))
        .withColumn("jac", F.col("inter") / F.col("uni"))
        .where(F.col("jac") >= JACCARD_T)
    )
    return verified.select("doc_a", "doc_b", F.round("jac", 6).alias("jaccard"))


# --- SimHash -----------------------------------------------------------------------
_SH_BITS = 32
_SH_BANDS = 8  # 8 bands × 4 bits
_SH_HAM_T = 3  # hamming ≤ 3 < 8 bands ⇒ pigeonhole: banded join is exact
_SH_MIX = 2654435761  # Knuth multiplicative constant
_SH_GRAM = 4


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash over distinct char-4-gram features.

    Feature hash is pure arithmetic (no engine hash function) so the oracle
    can recompute it: poly-31 over the 4 char codes, Knuth-mixed, mod 2^32.
    Max intermediate ≈ 3.6e6 · 2.65e9 < 2^63 — ANSI-safe.
    """
    docs = table(spark, sf_dir, "documents")
    grams = F.expr(
        "array_distinct(transform(sequence(1, greatest(length(lower(text)) - {w}, 1)), "
        "i -> substring(lower(text), i, {g})))".format(w=_SH_GRAM - 1, g=_SH_GRAM)
    )
    feat = docs.select("doc_id", F.explode(grams).alias("g"))
    poly = (
        ((F.ascii(F.substring("g", 1, 1)) * 31 + F.ascii(F.substring("g", 2, 1))) * 31
         + F.ascii(F.substring("g", 3, 1))) * 31
        + F.ascii(F.substring("g", 4, 1))
    ).cast("long")
    h = F.pmod(poly * F.lit(_SH_MIX), F.lit(1 << 32))
    feat = feat.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.floor(F.col("h") / F.lit(1 << b)) % 2 == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(_SH_BITS)
    ]
    agg = feat.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for b in range(_SH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    return agg.select("doc_id", simhash.alias("simhash"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, hamming ≤ 3, found via 8×4-bit banded
    equi-join (exact by pigeonhole — ≤3 flipped bits cannot touch all 8
    bands), then xor+bit_count verification. No all-pairs pass."""
    sims = _simhash_df(spark, sf_dir)
    band_structs = [
        F.struct(
            F.lit(j).alias("band_idx"),
            F.floor(F.col("simhash") / F.lit(1 << (4 * j))).cast("long").bitwiseAND(F.lit(15)).alias("band_val"),
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
