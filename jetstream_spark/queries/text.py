"""Text-analysis operators over the `documents` table (SURVEY.md §2.3).

All hot-path expressions are JVM-side built-ins (split/filter/aggregate
higher-order functions, regexp) — no Python UDFs — so they stay inside
whole-stage codegen and scale linearly with input splits. Each query's oracle
recomputes the identical arithmetic in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table

# Tokenization contract shared by every text op (and mirrored in oracles):
# lowercase, split on runs of non-alphanumerics, drop empties.
_TOKEN_RE = "[^a-z0-9]+"


def _tokens(col: str = "text") -> Column:
    return F.filter(F.split(F.lower(F.col(col)), _TOKEN_RE), lambda x: x != F.lit(""))


_TOKENS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


# --- token counting -----------------------------------------------------------
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/punct token count + a BPE-ish subword estimate
    (~chars/4 per word-piece convention) per document."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        # BPE-ish: every token contributes ceil(len/4) subword units
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.ceil(F.length(x) / F.lit(4.0)).cast("int")
        ).alias("n_subwords"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


Q_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       len({_TOKENS_SQL}) AS n_tokens,
       CAST(list_aggregate(list_transform({_TOKENS_SQL}, x -> CAST(ceil(len(x) / 4.0) AS INT)), 'sum') AS INT) AS n_subwords,
       len(list_distinct({_TOKENS_SQL})) AS n_distinct_tokens
FROM documents
"""


# --- quality scoring ------------------------------------------------------------
_STOPWORDS = ("the", "a", "and", "of", "to", "is", "in", "it")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: length, mean token length, stopword ratio,
    alphanumeric ratio — the standard pre-training quality-filter features."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    char_len = F.length("text")
    alnum_len = F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
    mean_tok_len = F.when(
        n_tok > 0, F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tok
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    alnum_ratio = F.when(char_len > 0, alnum_len.cast("double") / char_len).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        # composite score: long-enough, not stopword-soup, mostly-alnum
        F.round(
            F.least(n_tok / F.lit(50.0), F.lit(1.0)) * (1 - stop_ratio) * alnum_ratio, 6
        ).alias("quality_score"),
    )


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"
Q_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_tok,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop,
         length(text) AS char_len,
         length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alnum_len,
         CASE WHEN len(toks) > 0
              THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT)
              ELSE 0 END AS tok_chars
  FROM t
)
SELECT doc_id,
       n_tok AS n_tokens,
       round(CASE WHEN n_tok > 0 THEN tok_chars * 1.0 / n_tok ELSE 0.0 END, 6) AS mean_token_len,
       round(CASE WHEN n_tok > 0 THEN n_stop * 1.0 / n_tok ELSE 0.0 END, 6) AS stopword_ratio,
       round(CASE WHEN char_len > 0 THEN alnum_len * 1.0 / char_len ELSE 0.0 END, 6) AS alnum_ratio,
       round(least(n_tok / 50.0, 1.0)
             * (1 - CASE WHEN n_tok > 0 THEN n_stop * 1.0 / n_tok ELSE 0.0 END)
             * CASE WHEN char_len > 0 THEN alnum_len * 1.0 / char_len ELSE 0.0 END, 6) AS quality_score
FROM m
"""


# --- language identification (n-gram/stopword heuristic) ---------------------------
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "les", "des", "et", "une"),
    "de": ("der", "die", "und", "das", "nicht"),
}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: count per-language marker hits, argmax
    with fixed precedence (en > es > fr > de), 'und' when no hits."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens()
    def marker_hits(markers: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        # single-arg lambda: a 2-arg lambda would be read as (element, index)
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    hit_cols = {lang: marker_hits(markers) for lang, markers in _LANG_MARKERS.items()}
    hits = [hit_cols[lg].alias(f"hits_{lg}") for lg in _LANG_MARKERS]
    base = docs.select("doc_id", *hits)
    h = {lg: F.col(f"hits_{lg}") for lg in _LANG_MARKERS}
    best = F.greatest(*h.values())
    guess = (
        F.when(best == 0, "und")
        .when(h["en"] == best, "en")
        .when(h["es"] == best, "es")
        .when(h["fr"] == best, "fr")
        .otherwise("de")
    )
    return base.select("doc_id", *[f"hits_{lg}" for lg in _LANG_MARKERS], guess.alias("lang_guess"))


def _marker_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({_TOKENS_SQL}, x -> list_contains({arr}, x)))"


Q_LANG_ID_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         {_marker_sql('en')} AS hits_en,
         {_marker_sql('es')} AS hits_es,
         {_marker_sql('fr')} AS hits_fr,
         {_marker_sql('de')} AS hits_de
  FROM documents
)
SELECT doc_id, hits_en, hits_es, hits_fr, hits_de,
       CASE WHEN greatest(hits_en, hits_es, hits_fr, hits_de) = 0 THEN 'und'
            WHEN hits_en = greatest(hits_en, hits_es, hits_fr, hits_de) THEN 'en'
            WHEN hits_es = greatest(hits_en, hits_es, hits_fr, hits_de) THEN 'es'
            WHEN hits_fr = greatest(hits_en, hits_es, hits_fr, hits_de) THEN 'fr'
            ELSE 'de' END AS lang_guess
FROM h
"""


# --- document fingerprinting ---------------------------------------------------------
_POLY_MOD = 1_000_000_007
_POLY_MUL = 31


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two fingerprints per doc: md5 of whitespace-normalized text, and a
    31-polynomial rolling hash over its characters mod 1e9+7 (the classic
    Rabin-Karp shape; multiplications stay < 2^35 so ANSI long arithmetic
    never overflows)."""
    docs = table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
    chars = F.filter(F.split(norm, ""), lambda x: x != F.lit(""))
    poly = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(_POLY_MUL) + F.ascii(x)) % F.lit(_POLY_MOD),
    )
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("md5_fingerprint"),
        poly.alias("poly_fingerprint"),
    )


# Rolling hash as a vanilla recursive CTE (one fold step per character) —
# no list_reduce/list_prepend, which older DuckDB releases don't ship. Depth
# is max doc length (<600 here); each step is a scan of the live rows only.
Q_FINGERPRINT_ORACLE = f"""
WITH RECURSIVE n AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
), fold AS (
  SELECT doc_id, norm, len(norm) AS n_len, 1 AS i, CAST(0 AS BIGINT) AS acc FROM n
  UNION ALL
  SELECT doc_id, norm, n_len, i + 1,
         (acc * {_POLY_MUL} + ascii(substr(norm, i, 1))) % {_POLY_MOD}
  FROM fold WHERE i <= n_len
)
SELECT doc_id, md5(norm) AS md5_fingerprint, acc AS poly_fingerprint
FROM fold WHERE i = n_len + 1
"""


# --- repetition / boilerplate signal --------------------------------------------------
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition features (the C4/Gopher-style boilerplate filters):
    duplicate-token ratio, most-frequent-token share, and char-bigram
    diversity — all nested HOF arithmetic, JVM-side (the inner quadratic
    is per-document over ~10² tokens, not over the corpus)."""
    docs = table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    top_freq = F.array_max(
        F.transform(F.array_distinct(toks), lambda t: F.size(F.filter(toks, lambda x: x == t)))
    )
    bigrams = F.expr(
        "transform(sequence(1, greatest(length(lower(text)) - 1, 1)), i -> substring(lower(text), i, 2))"
    )
    bi_total = F.size(bigrams)
    bi_uniq = F.size(F.array_distinct(bigrams))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(F.when(n_tok > 0, 1 - n_uniq / n_tok.cast("double")).otherwise(0.0), 6).alias("dup_token_ratio"),
        F.round(F.when(n_tok > 0, top_freq / n_tok.cast("double")).otherwise(0.0), 6).alias("top_token_share"),
        F.round(bi_uniq / bi_total.cast("double"), 6).alias("bigram_diversity"),
    )


_BIGRAMS_SQL = "list_transform(generate_series(1, greatest(length(lower(text)) - 1, 1)), i -> substr(lower(text), i, 2))"
Q_REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks, {_BIGRAMS_SQL} AS bis FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(CASE WHEN len(toks) > 0 THEN 1 - len(list_distinct(toks)) * 1.0 / len(toks) ELSE 0.0 END, 6) AS dup_token_ratio,
       round(CASE WHEN len(toks) > 0 THEN
         list_aggregate(list_transform(list_distinct(toks), t -> len(list_filter(toks, x -> x = t))), 'max') * 1.0 / len(toks)
         ELSE 0.0 END, 6) AS top_token_share,
       round(len(list_distinct(bis)) * 1.0 / len(bis), 6) AS bigram_diversity
FROM t
"""


# --- corpus vocabulary ----------------------------------------------------------
VOCAB_TOP_N = 100


def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary: explode tokens, one shuffle on term for
    count + document frequency, then distributed top-100 (orderBy+limit →
    TakeOrderedAndProject, no single-partition global sort). The
    tokenize→count→truncate shape of building a training vocab."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("term_count"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("term_count"), "term")
        .limit(VOCAB_TOP_N)
    )


Q_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
), agg AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS term_count,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM toks GROUP BY term
)
SELECT term, term_count, doc_freq
FROM agg ORDER BY term_count DESC, term LIMIT {VOCAB_TOP_N}
"""


# --- PII scrubbing ---------------------------------------------------------------
# POSIX-simple patterns only: must mean the same thing to Java regex (Spark)
# and RE2 (DuckDB).
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_LONGNUM_RE = r"[0-9]{6,}"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """The scrubbing transform on any (doc_id, text) frame — separated from
    the query wrapper so real-PII fixtures can drive it directly in tests
    (the synthetic corpus contains no PII-shaped spans)."""
    low = F.lower(F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(low, _EMAIL_RE, "<email>"), _LONGNUM_RE, "<num>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(low, F.lit(_LONGNUM_RE), F.lit(0))).alias("n_long_numbers"),
        F.length(scrubbed).alias("scrubbed_len"),
        scrubbed.alias("scrubbed_text"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count email-shaped and long-digit-run spans and
    report the post-scrub length (emails → <email>, digit runs → <num>).
    Pure JVM regexp — the per-document shape of a corpus scrubbing job."""
    return pii_scrub(table(spark, sf_dir, "documents")).drop("scrubbed_text")


Q_PII_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(lower(text), '{_LONGNUM_RE}')) AS n_long_numbers,
       CAST(length(regexp_replace(regexp_replace(lower(text), '{_EMAIL_RE}', '<email>', 'g'),
                                  '{_LONGNUM_RE}', '<num>', 'g')) AS INT) AS scrubbed_len
FROM documents
"""


# --- TF-IDF -----------------------------------------------------------------------
TFIDF_TOP_N = 50


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: tf = term count / doc tokens, idf = ln(N / df),
    top-50 (doc, term) pairs by score — the relevance-weighting shape of
    quality filtering and topic probes over a training corpus.

    Shuffle shape — r14 (guide §6/§2.4): tf, doc length, and df used to be
    THREE independent aggregates over the exploded corpus (three regex
    tokenize passes). All three are exact functions of the ONE
    (doc_id, term) count frame: doc_tokens = sum(term_count) per doc_id
    and doc_freq = row count per term (tf rows are distinct (doc, term)
    pairs, so count(*) == the old countDistinct(doc_id)). tf is lazily
    checkpointed in-run (the basket/fuzzy pattern) and doc_len/df
    re-aggregate the checkpointed pair frame — corpus tokenized ONCE,
    hash aggregates and the broadcast df join preserved (a first cut
    rode two whole-partition windows over tf instead, but WindowExec
    sorts the pair frame twice and A/B'd 1.28x AGAINST — the sorts cost
    more than the saved tokenizes at bench SF). Then distributed top-k
    (TakeOrderedAndProject, no global sort). N is a scalar agg folded in
    via a literal-free cross join of one row (kept a separate count-only
    scan: N counts ALL docs, including zero-token docs the explode
    drops).

    Ties: equal (tf, df) pairs produce bit-identical scores in both
    engines (same IEEE ops, same order), broken by (doc_id, term)."""
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .localCheckpoint(eager=False)
    )
    doc_len = tf.groupBy("doc_id").agg(F.sum("term_count").alias("doc_tokens"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    scored = (
        tf.join(doc_len, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("term_count") / F.col("doc_tokens"))
            * F.log(F.col("n_docs") / F.col("doc_freq")),
        )
    )
    return (
        scored.orderBy(F.desc("score"), "doc_id", "term")
        .limit(TFIDF_TOP_N)
        .select(
            "doc_id",
            "term",
            "term_count",
            "doc_freq",
            F.round("score", 6).alias("tfidf"),
        )
    )


Q_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_tokens FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS term_count FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq FROM toks GROUP BY term
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.term_count, df.doc_freq,
         (CAST(tf.term_count AS DOUBLE) / dl.doc_tokens) * ln(n.n_docs / df.doc_freq) AS score
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN df ON tf.term = df.term, n
)
SELECT doc_id, term, term_count, doc_freq, round(score, 6) AS tfidf
FROM scored ORDER BY score DESC, doc_id, term LIMIT {TFIDF_TOP_N}
"""


# --- BPE pair statistics --------------------------------------------------------
BPE_TOP_N = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE trainer's inner loop as relational operators: corpus-wide
    counts of adjacent character pairs (the statistic a byte-pair-encoding
    tokenizer maximizes at each merge), top-N candidates.

    Scale shape — the crucial reduction happens FIRST: one explode+count
    shuffle collapses the corpus to its distinct-word frequency table
    (vocabulary-sized, Heaps-law sublinear), and the character-pair
    explosion runs over that table, not the corpus. A second shuffle
    aggregates pair counts (≤ alphabet², trivially small), then
    TakeOrdered. This is exactly how a distributed BPE trainer scales:
    per-merge cost is O(vocab), corpus scanned once."""
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    words = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.concat(
            F.col("word").substr(i, F.lit(1)),
            F.lit(" "),
            F.col("word").substr(i + 1, F.lit(1)),
        ),
    )
    return (
        words.where(F.length("word") >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(BPE_TOP_N)
    )


Q_BPE_ORACLE = f"""
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS word
  FROM documents
), v AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w GROUP BY word
), p AS (
  SELECT substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair, freq
  FROM v, unnest(generate_series(1, len(word) - 1)) AS u(i)
  WHERE len(word) >= 2
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
FROM p GROUP BY pair
ORDER BY pair_count DESC, pair LIMIT {BPE_TOP_N}
"""


# --- BM25 retrieval --------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20
# one rare discriminative term ("dup": df≈25/500) + two common ones, so the
# IDF contrast actually orders the result
BM25_QUERY = ("dup", "spark", "join")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson/Okapi, Lucene IDF form) of the
    corpus against a fixed query — the classic sparse-retrieval counterpart
    of the ANN dense tier, and the scoring core of a BM25 hard-negative
    miner for retrieval training data.

    Scale shape: the corpus side is MAP-ONLY — per-doc term frequencies for
    the |Q| query terms come from higher-order functions on the token array
    (no explode, no per-term shuffle), so scoring streams through the scan.
    The only aggregation is the 1-row corpus-statistics frame (N, avgdl,
    df per query term — |Q|+2 numbers) which joins back as a broadcast
    nested-loop with no shuffle of the corpus. Top-k is
    TakeOrderedAndProject (per-partition heaps), not a global sort.
    At 100 TB the stats row is computed once and cached/persisted; probing a
    new query re-uses it.

    The token array is projected ONCE (``toks`` below) and both consumers
    (stats agg, per-doc scoring) reference the alias: split+filter is a
    non-cheap expression referenced ~8x, so CollapseProject keeps the
    projection as its own node and the tokenization runs once per row per
    consumer instead of once per reference (VERDICT r5 #2)."""
    docs = table(spark, sf_dir, "documents")
    tokd = docs.select("doc_id", _tokens().alias("toks"))
    # 1-row stats: N, avgdl, df_t for each query term
    stats = tokd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
        *[
            F.sum(F.array_contains("toks", t).cast("long")).alias(f"df_{t}")
            for t in BM25_QUERY
        ],
    )
    def tf_of(term: str):
        return F.size(
            F.filter(F.col("toks"), lambda x: x == F.lit(term))
        ).alias(f"tf_{term}")

    scored = tokd.select(
        "doc_id", F.size("toks").alias("dl"), *[tf_of(t) for t in BM25_QUERY]
    ).crossJoin(F.broadcast(stats))
    score = None
    for t in BM25_QUERY:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"tf_{t}").cast("double")
        part = idf * tf * F.lit(BM25_K1 + 1.0) / (
            tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    return (
        scored.select("doc_id", "dl", F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(BM25_TOP_K)
    )


def _bm25_oracle() -> str:
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN list_contains({_TOKENS_SQL}, '{t}') THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_QUERY
    )
    tf_cols = ",\n         ".join(
        f"len(list_filter({_TOKENS_SQL}, x -> x = '{t}')) AS tf_{t}" for t in BM25_QUERY
    )
    parts = " + ".join(
        f"(ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * CAST(tf_{t} AS DOUBLE) * {BM25_K1 + 1.0}"
        f" / (CAST(tf_{t} AS DOUBLE) + {BM25_K1} * ({round(1.0 - BM25_B, 6)} + {BM25_B} * dl / avgdl)))"
        for t in BM25_QUERY
    )
    return f"""
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         avg(len({_TOKENS_SQL})) AS avgdl,
         {df_cols}
  FROM documents
), perdoc AS (
  SELECT doc_id, len({_TOKENS_SQL}) AS dl,
         {tf_cols}
  FROM documents
)
SELECT doc_id, dl, round({parts}, 6) AS bm25
FROM perdoc, stats
WHERE {parts} > 0
ORDER BY round({parts}, 6) DESC, doc_id
LIMIT {BM25_TOP_K}
"""


# --- positional phrase search -------------------------------------------------
PHRASE = ("table", "table")  # repeated token exercises the position alignment


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search via a positional inverted index — the search
    shape LIKE scans can't give you at corpus scale: postings for the
    phrase's terms are joined on (doc_id, pos + offset), so only the
    matching terms' posting lists move, never the corpus text. A
    repeated-token phrase ({PHRASE}) pins the alignment logic (naive
    same-term grouping would overcount). first_pos is 1-based.

    100 TB shape: postings are built once (term-partitioned parquet, the
    ann_index pattern); a phrase probe touches |phrase| posting lists —
    each pre-filtered to one term — and joins them on the doc co-key.
    Here the postings build inlines into the query for oracle parity."""
    docs = table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "term")
    )
    out = pos.filter(F.col("term") == PHRASE[0]).select("doc_id", "pos")
    for k, w in enumerate(PHRASE[1:], 1):
        nxt = pos.filter(F.col("term") == w).select(
            "doc_id", (F.col("pos") - k).alias("pos")
        )
        out = out.join(nxt, ["doc_id", "pos"])
    return out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        (F.min("pos") + 1).alias("first_pos"),
    )


def _phrase_oracle() -> str:
    joins = []
    for k, w in enumerate(PHRASE[1:], 1):
        joins.append(
            f"JOIN pos m{k} ON m{k}.doc_id = m0.doc_id"
            f" AND m{k}.pos = m0.pos + {k} AND m{k}.term = '{w}'"
        )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS arr FROM documents
), pos AS (
  SELECT doc_id,
         unnest(generate_series(1, len(arr))) AS pos,
         unnest(arr) AS term
  FROM toks
)
SELECT m0.doc_id, count(*) AS n_matches, min(m0.pos) AS first_pos
FROM pos m0 {' '.join(joins)}
WHERE m0.term = '{PHRASE[0]}'
GROUP BY m0.doc_id
"""


# --- winnowing fingerprints (MOSS) ---------------------------------------------------
# Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
# Fingerprinting" (SIGMOD 2003) — the MOSS plagiarism-detector core. Each
# k-gram gets a hash; every full window of W consecutive gram hashes
# selects its minimum; the distinct selected hashes are the doc's
# fingerprint set (expected density 2/(W+1)). The paper's rightmost-min
# tie rule only disambiguates which POSITION is recorded — the selected
# hash VALUE is the window min either way, and similarity pairing uses
# the position-free hash set, so each window's selection reduces to a
# sliding-window min. Pairing is the MOSS step: an inverted index over
# fingerprint hashes, with hashes appearing in more than DF_CAP docs
# dropped as boilerplate (exactly MOSS's common-code suppression, and
# the same df-ceiling bound dedup_containment uses) so corpus-common
# spans cannot quadratically pair the corpus.
#
# Scale (100 TB): ONE frame window (ROWS CURRENT..W-1 FOLLOWING) per doc
# computes every window's min in a single doc-partitioned pass — no
# gram→window explode, no (doc, window) shuffle (a first cut exploded
# each gram into its W member windows: 8× the rows through the exchange,
# 29 s vs 4 s at sf0.1). The pair join is bounded by the df ceiling
# (≤ DF_CAP² pairs per surviving hash). No window over an unbounded
# partition (frames are W rows, partitions are one doc), no driver loop,
# no UDF.

_WIN_K = 8  # gram length (chars, over the whitespace-normalized text)
_WIN_W = 8  # winnowing window (consecutive grams)
_WIN_DF_CAP = 10  # fingerprint df ceiling (boilerplate suppression)
_WIN_MIN_SHARED = 3  # report pairs sharing at least this many fingerprints


def q_fingerprint_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing: sliding-window-min fingerprint selection (one frame
    window per doc), then df-capped inverted-index pairing with a
    winnowing-Jaccard score over the capped fingerprint universe."""
    docs = table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
    base = docs.select("doc_id", norm.alias("norm")).select(
        "doc_id",
        "norm",
        (F.length("norm") - F.lit(_WIN_K - 1)).alias("m"),  # gram count
    )
    grams = (
        base.filter(F.col("m") >= _WIN_W)  # docs with at least one full window
        .select(
            "doc_id",
            "m",
            F.explode(F.sequence(F.lit(1), F.col("m"))).alias("i"),
            "norm",
        )
        .select(
            "doc_id",
            "m",
            "i",
            F.conv(
                F.substring(
                    F.md5(F.expr(f"substr(norm, i, {_WIN_K})").cast("binary")), 1, 8
                ),
                16,
                10,
            )
            .cast("long")
            .alias("gh"),
        )
    )
    from pyspark.sql import Window

    # window j (start position) selects min(gh) over grams j..j+W-1; rows
    # past the last full window start contribute no window of their own
    wsel = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    # selected fingerprints are the winnowing guarantee's small frame
    # (≥1 per window, ≤ grams/W per doc after distinct) and are consumed
    # by the df filter, the per-doc sizes, and BOTH sides of the pair
    # join — the eager checkpoint pins the gram explode + window-min pass
    # to ONE run (r8 plan audit: 8 corpus scans -> 1)
    winners = (
        grams.select(
            "doc_id",
            "m",
            "i",
            F.min("gh").over(wsel).alias("sel"),
        )
        .filter(F.col("i") <= F.col("m") - F.lit(_WIN_W - 1))
        .select("doc_id", F.col("sel").alias("gh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    df_ok = (
        winners.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _WIN_DF_CAP)
        .select("gh")
    )
    fps = winners.join(df_ok, "gh")
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    pairs = (
        fps.alias("a")
        .join(fps.alias("b"), F.col("a.gh") == F.col("b.gh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= _WIN_MIN_SHARED)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_fp", "fp_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_fp", "fp_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            "fp_a",
            "fp_b",
            F.round(
                F.col("shared_fp")
                / (F.col("fp_a") + F.col("fp_b") - F.col("shared_fp")),
                4,
            ).alias("winnow_sim"),
        )
    )


Q_WINNOW_ORACLE = f"""
WITH base AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
), sized AS (
  SELECT doc_id, norm, len(norm) - {_WIN_K - 1} AS m FROM base
  WHERE len(norm) - {_WIN_K - 1} >= {_WIN_W}
), grams AS (
  SELECT doc_id, m, i,
         (
           (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 1, 1)) - 1) * {16 ** 7}
         + (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 2, 1)) - 1) * {16 ** 6}
         + (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 3, 1)) - 1) * {16 ** 5}
         + (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 4, 1)) - 1) * {16 ** 4}
         + (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 5, 1)) - 1) * {16 ** 3}
         + (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 6, 1)) - 1) * {16 ** 2}
         + (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 7, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(substr(norm, i, {_WIN_K})), 8, 1)) - 1)
         ) AS gh
  FROM sized, LATERAL (SELECT unnest(generate_series(1, m)) AS i)
), winners AS (
  SELECT DISTINCT doc_id, sel AS gh FROM (
    SELECT doc_id, m, i,
           min(gh) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS sel
    FROM grams
  ) WHERE i <= m - {_WIN_W - 1}
), df_ok AS (
  SELECT gh FROM winners GROUP BY gh HAVING count(*) <= {_WIN_DF_CAP}
), fps AS (
  SELECT w.doc_id, w.gh FROM winners w JOIN df_ok USING (gh)
), sizes AS (
  SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fp
  FROM fps a JOIN fps b ON a.gh = b.gh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {_WIN_MIN_SHARED}
)
SELECT p.doc_a, p.doc_b, p.shared_fp, sa.n_fp AS fp_a, sb.n_fp AS fp_b,
       round(p.shared_fp / (sa.n_fp + sb.n_fp - p.shared_fp), 4) AS winnow_sim
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
"""


# --- TextRank keyword extraction -----------------------------------------------------
# Mihalcea/Tarau, "TextRank: Bringing Order into Text" (EMNLP 2004):
# build the word co-occurrence graph (adjacent-token edges) and rank
# words with weighted PageRank; top-ranked words are the corpus
# keywords. The graph-over-text composition: the token pipeline feeds
# the same iterative rank shape pagerank_copurchase pins.
#
# Determinism: edge weights are exact co-occurrence counts; each round's
# rank sums are float (identical-value, different-order — pagerank
# precedent: final round rounds to 9); vocabulary bounded by length ≥ 4
# + corpus count ≥ TR_MIN_COUNT, tie-breaks on the word.
#
# Scale (100 TB): adjacent pairs are generated MAP-SIDE from each doc's
# token array (HOF transform over sequence — no posexplode self-join),
# collapse to the vocabulary-pair key space in one shuffle (Heaps-law
# sublinear); each rank round is the pagerank shape — broadcast
# node-scale rank frame + one groupBy(dst) shuffle over the word graph.

TR_MIN_COUNT = 5
TR_MIN_LEN = 4
TR_DAMP = 0.85
TR_ROUNDS = 3
TR_TOP_N = 20


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(_tokens().alias("toks"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(2, size(toks)), i -> struct(toks[i-2] AS w1, toks[i-1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    vocab = (
        toks.select(F.explode("toks").alias("w"))
        .filter(F.length("w") >= TR_MIN_LEN)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= TR_MIN_COUNT)
        .select("w")
    )
    # undirected: keep both orientations of each kept pair
    kept = (
        pairs.join(vocab.withColumnRenamed("w", "w1"), "w1")
        .join(vocab.withColumnRenamed("w", "w2"), "w2")
        .filter(F.col("w1") != F.col("w2"))
    )
    edges = (
        kept.select(F.col("w1").alias("s"), F.col("w2").alias("t"))
        .unionAll(kept.select(F.col("w2").alias("s"), F.col("w1").alias("t")))
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("wt"))
        .localCheckpoint()
    )
    # out-weights are static across rounds: cut once (lazy — the first
    # round's broadcast build materializes it) instead of re-aggregating
    # the edge frame every round (r13)
    outw = edges.groupBy("s").agg(F.sum("wt").alias("outw")).localCheckpoint(eager=False)
    nodes = outw.select(F.col("s").alias("node"))  # outw keys = distinct sources
    n_nodes = nodes.groupBy().agg(F.count(F.lit(1)).alias("n"))
    rank = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(TR_ROUNDS):
        # EXPLICIT broadcast of the vocab-scale rank/outw frames (the LPA
        # r7 precedent, r13 here): AQE cannot size checkpointed ExistingRDD
        # sides, so without the hint each round pays a sort-merge shuffle
        # of the edge frame; both build sides are Heaps-law vocab-bounded
        contrib = (
            edges.join(F.broadcast(rank.withColumnRenamed("node", "s")), "s")
            .join(F.broadcast(outw), "s")
            .select(F.col("t").alias("node"), (F.col("wt") / F.col("outw") * F.col("rank")).alias("c"))
        )
        rank = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("inflow"))
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(TR_DAMP)) / F.col("n")
                    + F.lit(TR_DAMP) * F.col("inflow")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        rank.select(F.col("node").alias("word"), F.round("rank", 9).alias("textrank"))
        .orderBy(F.col("textrank").desc(), "word")
        .limit(TR_TOP_N)
    )


def _textrank_oracle() -> str:
    rounds = []
    for k in range(TR_ROUNDS):
        rounds.append(
            f"r{k + 1} AS (\n"
            f"  SELECT e.t AS node,\n"
            f"         (CAST(1 AS DOUBLE) - CAST({TR_DAMP} AS DOUBLE)) / (SELECT n FROM nn)\n"
            f"         + CAST({TR_DAMP} AS DOUBLE) * sum(e.wt / o.outw * r.rank) AS rank\n"
            f"  FROM edges e JOIN r{k} r ON r.node = e.s JOIN outw o ON o.s = e.s\n"
            f"  GROUP BY e.t\n)"
        )
    return (
        f"WITH toks AS (\n"
        f"  SELECT {_TOKENS_SQL} AS toks FROM documents\n"
        f"), pairs AS (\n"
        f"  SELECT p.w1, p.w2 FROM toks, LATERAL (\n"
        f"    SELECT unnest(list_transform(generate_series(2, len(toks)),\n"
        f"                  i -> struct_pack(w1 := toks[i-1], w2 := toks[i]))) AS p\n"
        f"  )\n"
        f"), vocab AS (\n"
        f"  SELECT w FROM (SELECT unnest(toks) AS w FROM toks)\n"
        f"  WHERE len(w) >= {TR_MIN_LEN} GROUP BY w HAVING count(*) >= {TR_MIN_COUNT}\n"
        f"), kept AS (\n"
        f"  SELECT p.w1, p.w2 FROM pairs p\n"
        f"  JOIN vocab v1 ON v1.w = p.w1 JOIN vocab v2 ON v2.w = p.w2\n"
        f"  WHERE p.w1 <> p.w2\n"
        f"), edges AS (\n"
        f"  SELECT s, t, count(*) AS wt FROM (\n"
        f"    SELECT w1 AS s, w2 AS t FROM kept UNION ALL SELECT w2, w1 FROM kept\n"
        f"  ) GROUP BY s, t\n"
        f"), outw AS (\n"
        f"  SELECT s, sum(wt) AS outw FROM edges GROUP BY s\n"
        f"), nodes AS (SELECT DISTINCT s AS node FROM edges\n"
        f"), nn AS (SELECT count(*) AS n FROM nodes\n"
        f"), r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes),\n"
        + ",\n".join(rounds)
        + f"\nSELECT node AS word, round(rank, 9) AS textrank FROM r{TR_ROUNDS}\n"
        f"ORDER BY textrank DESC, word LIMIT {TR_TOP_N}"
    )


# --- PMI collocations ------------------------------------------------------------
# Pointwise-mutual-information bigram collocations: adjacent-token pairs
# whose co-occurrence beats the independence expectation — the classic
# phrase-mining signal (Church & Hanks 1990) a tokenizer-training or
# phrase-vocabulary step runs before merging multi-word units. Distinct
# from textrank_keywords (window-2 UNDIRECTED graph feeding PageRank):
# this is the ADJACENT ordered-pair statistic with exact counts.
#
# PMI = ln(c12 · N / (c1 · c2)) over exact integer counts: c12 = count
# of the adjacent ordered pair, c1/c2 = unigram occurrence counts as a
# LEFT token / RIGHT token of any adjacent pair (so the marginals sum
# to N = total adjacent pairs and PMI is a true log-ratio of one joint
# and two marginal distributions). Low-frequency pairs are noise-pruned
# at c12 >= {PMI_MIN_PAIR}; output is the top-{PMI_TOP_N} by PMI.
#
# Scale shape (100 TB): bigram extraction is a map-only zip of each
# token array with its own tail (no self-join); ONE (w1, w2) exchange of
# corpus-bigram-distinct rows; the marginal tables derive from the SAME
# aggregated pair frame (Heaps-law bounded) so nothing re-reads the
# corpus; the PMI join runs pair-table × two vocab-scale marginals
# (broadcast at corpus scale, since marginals are vocabulary-sized).

PMI_MIN_PAIR = 5
PMI_TOP_N = 50


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = _tokens()
    pairs_arr = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = docs.select(F.explode(pairs_arr).alias("p")).select("p.w1", "p.w2")
    # eager checkpoint (the naive_bayes_domain tokenize-once posture):
    # total/left/right marginals and the scored join all derive from this
    # ONE materialized pair frame — without it each marginal branch
    # re-explodes the corpus (the plan showed 3 corpus scans)
    pc = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    n = pc.agg(F.sum("c12").alias("n"))
    left = pc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    right = pc.groupBy("w2").agg(F.sum("c12").alias("c2"))
    scored = (
        pc.where(F.col("c12") >= PMI_MIN_PAIR)
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("n")
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(PMI_TOP_N)


Q_PMI_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 2
), pc AS (
  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2
), n AS (SELECT sum(c12) AS n FROM pc),
l AS (SELECT w1, sum(c12) AS c1 FROM pc GROUP BY 1),
r AS (SELECT w2, sum(c12) AS c2 FROM pc GROUP BY 1)
SELECT pc.w1, pc.w2, pc.c12,
       round(ln(CAST(pc.c12 AS DOUBLE) * n.n / (CAST(l.c1 AS DOUBLE) * r.c2)), 6) AS pmi
FROM pc JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
WHERE pc.c12 >= {PMI_MIN_PAIR}
ORDER BY pmi DESC, w1, w2 LIMIT {PMI_TOP_N}
"""


QUERIES = [
    QuerySpec("pmi_collocations", q_pmi_collocations, Q_PMI_ORACLE, "PMI bigram collocations: adjacent-pair log-ratio over exact counts (top-50, min-count pruned)", ("text",)),
    QuerySpec("textrank_keywords", q_textrank_keywords, _textrank_oracle(), "TextRank corpus keywords: co-occurrence graph + weighted PageRank (unrolled oracle)", ("text", "graph")),
    QuerySpec("fingerprint_winnowing", q_fingerprint_winnowing, Q_WINNOW_ORACLE, "MOSS winnowing fingerprints: rightmost-min window selection + df-capped pair similarity", ("text", "dedup")),
    QuerySpec("phrase_search", q_phrase_search, _phrase_oracle(), "positional-postings exact phrase search (repeated-token alignment)", ("text", "search")),
    QuerySpec("text_token_count", q_token_count, Q_TOKEN_COUNT_ORACLE, "token + subword counting", ("text",)),
    QuerySpec("bm25_topk", q_bm25_topk, _bm25_oracle(), "BM25 lexical retrieval top-k (map-only scoring, 1-row stats broadcast)", ("text",)),
    QuerySpec("bpe_pair_counts", q_bpe_pair_counts, Q_BPE_ORACLE, "BPE merge-candidate pair counts over the vocab table", ("text",)),
    QuerySpec("text_repetition", q_repetition, Q_REPETITION_ORACLE, "repetition/boilerplate features", ("text",)),
    QuerySpec("text_quality_score", q_quality_score, Q_QUALITY_ORACLE, "quality-filter features", ("text",)),
    QuerySpec("text_lang_id", q_lang_id, Q_LANG_ID_ORACLE, "stopword-marker language ID", ("text",)),
    QuerySpec("text_fingerprint", q_fingerprint, Q_FINGERPRINT_ORACLE, "md5 + rolling-hash fingerprints", ("text",)),
    QuerySpec("vocab_top_terms", q_vocab_top_terms, Q_VOCAB_ORACLE, "corpus vocabulary top-terms (explode + distributed top-k)", ("text",)),
    QuerySpec("text_pii_scrub", q_pii_scrub, Q_PII_ORACLE, "PII span counting + redacted length", ("text",)),
    QuerySpec("tfidf_top_terms", q_tfidf_top_terms, Q_TFIDF_ORACLE, "corpus TF-IDF top (doc, term) pairs", ("text",)),
]
