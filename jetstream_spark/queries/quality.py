"""Corpus-curation operators (SURVEY.md §2.3 extensions): the filter /
score / mix decisions a pre-training data pipeline makes between raw
crawl and tokenizer handoff.

- quality_gopher_rules: the Gopher-style rule bundle (word-count bounds,
  mean word length, alphabetic-word fraction, stopword presence) as
  per-document boolean verdicts. Pure codegen HOFs — one scan, no shuffle.
- unigram_perplexity: CCNet-style quality scoring — fit a unigram LM on
  the train split (same md5 bucket assignment as `sample_split`), score
  held-out docs by average negative log-likelihood, bucket into
  head/middle/tail terciles per language.
- domain_mix_weights: per-source token shares and temperature-scaled
  (alpha=0.5) multinomial sampling weights — the data-mixing table a
  multi-source training run consumes.
- importance_weights_dsir: DSIR-shaped importance weights — hashed
  unigram features (md5 fold mod 256, engine-independent), per-bucket
  log-ratio of a target distribution (lang='en') vs the raw corpus,
  summed per document.

Scale notes (100 TB): gopher rules are map-only. The perplexity and DSIR
models are aggregates whose size is bounded by vocab/bucket cardinality —
vocabulary counts and 256-bucket ratio tables broadcast to every executor,
so scoring is one map-side join pass over the corpus (no fact-fact
shuffle). domain_mix_weights reduces to one row per source. Every
expression is JVM-side; no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jetstream_spark.queries.sampling import _BUCKET_SQL, TRAIN_PCT, VAL_PCT, _bucket_expr
from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.queries.text import _STOPWORDS, _TOKENS_SQL, _tokens
from jetstream_spark.tables import table

# --- Gopher-style rule bundle -------------------------------------------------
# Thresholds follow the published Gopher filters, scaled to this corpus's
# short synthetic docs only where noted.
GOPHER_MIN_WORDS = 20      # Gopher uses 50 on web pages; docs here are 10-120 words
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.80
GOPHER_MIN_STOP_HITS = 2


def _gopher_parts() -> tuple[Column, Column, Column, Column, Column, Column, Column, Column]:
    """(n_words, mean_len, alpha_frac, n_stop, p_count, p_mean, p_alpha,
    p_stop) over the `text` column — shared by the verdict query and the
    curation pipeline so both filter on the identical arithmetic."""
    toks = _tokens()
    n_words = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long"))
    mean_len = F.when(n_words > 0, tok_chars / n_words.cast("double")).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.when(n_words > 0, n_alpha / n_words.cast("double")).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    p_count = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    p_mean = (mean_len >= GOPHER_MIN_MEAN_LEN) & (mean_len <= GOPHER_MAX_MEAN_LEN)
    p_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    p_stop = n_stop >= GOPHER_MIN_STOP_HITS
    return n_words, mean_len, alpha_frac, n_stop, p_count, p_mean, p_alpha, p_stop


def gopher_pass() -> Column:
    """The conjunction of all Gopher rules as one boolean Column."""
    _, _, _, _, p_count, p_mean, p_alpha, p_stop = _gopher_parts()
    return p_count & p_mean & p_alpha & p_stop


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Per-document Gopher rule verdicts over any (doc_id, text) frame.
    Each rule is computed on exact integer/rational arithmetic (identical
    in both engines) and reported both as the raw feature and the boolean
    verdict; `pass_gopher` is the conjunction. Map-only."""
    n_words, mean_len, alpha_frac, n_stop, p_count, p_mean, p_alpha, p_stop = _gopher_parts()
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.alias("n_stopword_hits"),
        p_count.alias("pass_word_count"),
        p_mean.alias("pass_mean_word_len"),
        p_alpha.alias("pass_alpha_frac"),
        p_stop.alias("pass_stopwords"),
        (p_count & p_mean & p_alpha & p_stop).alias("pass_gopher"),
    )


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_rules(table(spark, sf_dir, "documents"))


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"

Q_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CASE WHEN len(toks) > 0
              THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) * 1.0 / len(toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(toks)
              ELSE 0.0 END AS alpha_frac,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop
  FROM t
)
SELECT doc_id,
       n_words,
       round(mean_len, 6) AS mean_word_len,
       round(alpha_frac, 6) AS alpha_word_frac,
       n_stop AS n_stopword_hits,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS pass_word_count,
       (mean_len >= {GOPHER_MIN_MEAN_LEN} AND mean_len <= {GOPHER_MAX_MEAN_LEN}) AS pass_mean_word_len,
       (alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}) AS pass_alpha_frac,
       (n_stop >= {GOPHER_MIN_STOP_HITS}) AS pass_stopwords,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND mean_len >= {GOPHER_MIN_MEAN_LEN} AND mean_len <= {GOPHER_MAX_MEAN_LEN}
        AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
        AND n_stop >= {GOPHER_MIN_STOP_HITS}) AS pass_gopher
FROM m
"""


# --- unigram-LM perplexity scoring (CCNet shape) ------------------------------
def unigram_perplexity_scores(train_docs: DataFrame, eval_docs: DataFrame) -> DataFrame:
    """Fit add-one-smoothed unigram LM on `train_docs`, score every
    `eval_docs` row: avg_nll = mean over tokens of -ln((cnt+1)/(T+V)),
    ppl = exp(avg_nll), then CCNet head/middle/tail terciles per language
    (ntile over the ROUNDED score + doc_id so the ordering is engine-exact).

    Scale: the model is a vocabulary-sized count table — broadcast — so
    scoring is a map-side join over exploded tokens; the only corpus-wide
    shuffle is the per-doc aggregation."""
    train_terms = train_docs.select(F.explode(_tokens()).alias("term"))
    vocab = train_terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("long").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )
    eval_terms = eval_docs.select("doc_id", "lang", F.explode(_tokens()).alias("term"))
    scored = eval_terms.join(F.broadcast(vocab), "term", "left").join(F.broadcast(totals))
    nll = -F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
        / (F.col("t_total") + F.col("v_size")).cast("double")
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(nll), 6).alias("avg_nll"),
        F.round(F.exp(F.avg(nll)), 6).alias("ppl"),
    )
    tercile = F.ntile(3).over(Window.partitionBy("lang").orderBy("avg_nll", "doc_id"))
    bucket_name = (
        F.when(tercile == 1, "head").when(tercile == 2, "middle").otherwise("tail")
    )
    return per_doc.select(
        "doc_id", "lang", "n_tokens", "avg_nll", "ppl", bucket_name.alias("ppl_bucket")
    )


def q_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval membership is the exact `sample_split` md5 assignment
    (bucket < TRAIN_PCT trains the LM; the held-out 20% is scored)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text", _bucket_expr())
    return unigram_perplexity_scores(
        docs.filter(F.col("bucket") < TRAIN_PCT),
        docs.filter(F.col("bucket") >= TRAIN_PCT),
    )


Q_UNIGRAM_PPL_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang, text, {_BUCKET_SQL} AS bucket FROM documents
), tr AS (
  SELECT unnest({_TOKENS_SQL}) AS term FROM b WHERE bucket < {TRAIN_PCT}
), vocab AS (
  SELECT term, count(*) AS cnt FROM tr GROUP BY term
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t_total, count(*) AS v_size FROM vocab
), ev AS (
  SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS term FROM b WHERE bucket >= {TRAIN_PCT}
), sc AS (
  SELECT ev.doc_id, ev.lang,
         -ln((coalesce(vocab.cnt, 0) + 1) * 1.0 / (tot.t_total + tot.v_size)) AS nll
  FROM ev LEFT JOIN vocab USING (term) CROSS JOIN tot
), pd AS (
  SELECT doc_id, lang, count(*) AS n_tokens,
         round(avg(nll), 6) AS avg_nll,
         round(exp(avg(nll)), 6) AS ppl
  FROM sc GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_tokens, avg_nll, ppl,
       CASE ntile(3) OVER (PARTITION BY lang ORDER BY avg_nll, doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
FROM pd
"""


# --- domain mixing weights ----------------------------------------------------
def domain_mix(docs: DataFrame) -> DataFrame:
    """Per-source corpus stats + multinomial sampling weights with a 0.5
    temperature (w_s ∝ sqrt(token_share), renormalized) — the standard
    smoothing that upweights small domains. One aggregation to |sources|
    rows; the normalizing window runs over that tiny result."""
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens())).cast("long").alias("n_tokens"),
    )
    everything = Window.partitionBy()
    shared = per_src.withColumn(
        "share", F.col("n_tokens") / F.sum("n_tokens").over(everything)
    )
    weight = F.sqrt("share") / F.sum(F.sqrt("share")).over(everything)
    return shared.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("share", 6).alias("token_share"),
        F.round(weight, 6).alias("mix_weight"),
    )


def q_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_mix(table(spark, sf_dir, "documents"))


Q_DOMAIN_MIX_ORACLE = f"""
WITH s AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({_TOKENS_SQL})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), sh AS (
  SELECT source, n_docs, n_tokens,
         n_tokens * 1.0 / sum(n_tokens) OVER () AS share
  FROM s
)
SELECT source, n_docs, n_tokens,
       round(share, 6) AS token_share,
       round(sqrt(share) / sum(sqrt(share)) OVER (), 6) AS mix_weight
FROM sh
"""


# --- DSIR importance weights --------------------------------------------------
DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"


def _term_bucket() -> Column:
    # first 4 hex chars of md5(term) -> 16-bit int -> mod DSIR_BUCKETS;
    # engine-independent arithmetic, same device as sample_split's bucket
    h = F.md5(F.col("term").cast("binary"))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % DSIR_BUCKETS)


_TERM_BUCKET_SQL = (
    "(("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(term), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    + f") % {DSIR_BUCKETS})"
)


def dsir_weights(docs: DataFrame, target_lang: str = DSIR_TARGET_LANG) -> DataFrame:
    """DSIR-shaped importance weights: hashed-unigram features (md5 fold mod
    DSIR_BUCKETS), per-bucket add-one log-ratio ln(p_target/p_raw) between
    the target distribution (lang=target_lang) and the raw corpus, summed
    over each document's tokens. Docs that look like the target get
    positive weight — the resampling score of Xie et al.'s data selection.

    Scale (r5 restructure — the pre-r5 shape tokenized the corpus FOUR
    times: raw counts, target counts, totals, and the scoring join): the
    feature model is ONE tokenize+explode pass partial-aggregated to
    DSIR_BUCKETS rows carrying both raw and target counts — the totals are
    the sums of those 256 rows, so no separate totals pass exists. The
    256 log-ratios come back to the driver (bounded collect, the CMS /
    IVF-centroid precedent) and scoring is a MAP-ONLY projection: an
    `aggregate` fold over each doc's token array looking each token's
    bucket up in a 256-element array literal — no scoring join, no
    per-doc groupBy shuffle, docs never explode a second time. Total plan
    cost: two tokenization passes, one 256-row shuffle, zero scoring
    shuffles (was: four passes + two scoring shuffles)."""
    spark = docs.sparkSession
    stats = (
        docs.select("lang", F.explode(_tokens()).alias("term"))
        .withColumn("b", _term_bucket())
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cnt_raw"),
            F.sum((F.col("lang") == target_lang).cast("long")).alias("cnt_tgt"),
        )
        .collect()
    )
    tot_raw = sum(r["cnt_raw"] for r in stats)
    tot_tgt = sum(r["cnt_tgt"] for r in stats)
    import math

    log_ratio = [
        math.log(1.0 / (tot_tgt + DSIR_BUCKETS)) - math.log(1.0 / (tot_raw + DSIR_BUCKETS))
    ] * DSIR_BUCKETS  # unseen bucket: add-one smoothing on both sides
    for r in stats:
        log_ratio[r["b"]] = math.log(
            (r["cnt_tgt"] + 1) / (tot_tgt + DSIR_BUCKETS)
        ) - math.log((r["cnt_raw"] + 1) / (tot_raw + DSIR_BUCKETS))
    lr = F.array(*[F.lit(v) for v in log_ratio])

    def tok_bucket(t: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(t.cast("binary")), 1, 4), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).cast("int")

    toks = _tokens()
    score = F.aggregate(
        F.col("toks"),
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(lr, tok_bucket(t) + 1),
    )
    return (
        docs.select("doc_id", "lang", toks.alias("toks"))
        .where(F.size("toks") >= 1)  # tokenless docs never produced terms rows
        .select(
            "doc_id",
            "lang",
            F.size("toks").cast("long").alias("n_tokens"),
            F.round(score, 6).alias("dsir_logweight"),
        )
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_weights(table(spark, sf_dir, "documents"))


Q_DSIR_ORACLE = f"""
WITH terms AS (
  SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS term FROM documents
), tb AS (
  SELECT doc_id, lang, {_TERM_BUCKET_SQL} AS b FROM terms
), raw AS (
  SELECT b, count(*) AS cnt_raw FROM tb GROUP BY b
), tgt AS (
  SELECT b, count(*) AS cnt_tgt FROM tb WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
), tot AS (
  SELECT count(*) AS tot_raw,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS tot_tgt
  FROM tb
), ratios AS (
  SELECT raw.b,
         ln((coalesce(tgt.cnt_tgt, 0) + 1) * 1.0 / (tot.tot_tgt + {DSIR_BUCKETS}))
         - ln((raw.cnt_raw + 1) * 1.0 / (tot.tot_raw + {DSIR_BUCKETS})) AS log_ratio
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
)
SELECT tb.doc_id, tb.lang, count(*) AS n_tokens,
       round(sum(log_ratio), 6) AS dsir_logweight
FROM tb JOIN ratios USING (b)
GROUP BY tb.doc_id, tb.lang
"""


# --- end-to-end curation pipeline ---------------------------------------------
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operators composed the way a real curation run chains them:
    exact-dedup survivors (min doc_id per md5(text)) → Gopher rule filter →
    md5 train/val/test assignment → per-split corpus stats. One declarative
    plan: Catalyst collapses the dedup window, the filter, and the split
    arithmetic into a single pass over the scan plus one window shuffle on
    the content hash — proof the curation operators compose without
    materialization barriers."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    survivors = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    kept = survivors.filter(gopher_pass())
    split = (
        F.when(F.col("bucket") < TRAIN_PCT, "train")
        .when(F.col("bucket") < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        kept.select("doc_id", F.size(_tokens()).alias("n_tokens"), _bucket_expr())
        .withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


Q_CURATION_ORACLE = f"""
WITH surv AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
), feats AS (
  SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM surv
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CASE WHEN len(toks) > 0
              THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) * 1.0 / len(toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(toks)
              ELSE 0.0 END AS alpha_frac,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop,
         len(toks) AS n_tokens
  FROM feats
), kept AS (
  SELECT doc_id, n_tokens, {_BUCKET_SQL} AS bucket FROM m
  WHERE n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
    AND mean_len >= {GOPHER_MIN_MEAN_LEN} AND mean_len <= {GOPHER_MAX_MEAN_LEN}
    AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
    AND n_stop >= {GOPHER_MIN_STOP_HITS}
), s AS (
  SELECT doc_id, n_tokens,
         CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
              WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM kept
)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM s GROUP BY split ORDER BY split
"""


# --- bigram LM with stupid backoff -------------------------------------------------
BACKOFF_ALPHA = 0.4  # stupid backoff (Brants et al.) — no discounting math


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM held-out scoring with stupid backoff: p(w|v) = c(v,w)/c(v)
    when the bigram was seen in training, else α·p_add1_unigram(w). Same
    md5 train/eval membership as the unigram op; tokens 2..n of each eval
    doc are scored given their predecessor.

    The scale-shape CONTRAST with unigram_perplexity is the point: the
    unigram model is vocabulary-sized and broadcasts, but the bigram table
    grows with observed bigram types — at 100 TB it is NOT broadcastable,
    so scoring joins the exploded eval bigrams against the model ON THE
    BIGRAM KEY (a shuffle join whose build side is the model table; AQE
    picks broadcast at bench SFs and degrades to shuffle-hash safely, the
    same no-hint policy as the fact joins). The unigram backoff and the
    two scalar totals stay broadcast-sized."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", _bucket_expr()
    )
    train = docs.filter(F.col("bucket") < TRAIN_PCT)
    ev = docs.filter(F.col("bucket") >= TRAIN_PCT)

    def bigrams(frame: DataFrame, keep_doc: bool) -> DataFrame:
        toks = _tokens()
        pairs = F.transform(
            F.sequence(F.lit(2), F.size("toks")),
            lambda i: F.struct(
                F.element_at("toks", i - 1).alias("w1"),
                F.element_at("toks", i).alias("w2"),
            ),
        )
        base = frame.select(
            "doc_id", "lang", toks.alias("toks")
        ).where(F.size("toks") >= 2)
        cols = ["doc_id", "lang"] if keep_doc else []
        return base.select(*cols, F.explode(pairs).alias("p")).select(
            *cols, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )

    big_counts = bigrams(train, keep_doc=False).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    # vocab-sized, consumed THREE times (totals + both scoring joins):
    # without the eager checkpoint each consumer re-tokenizes the train
    # corpus (the r8 plan audit counted 5 corpus scans; now 3 — train
    # bigrams, this build, eval bigrams)
    uni = (
        train.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    totals = uni.agg(
        F.sum("cnt").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )

    scored = (
        bigrams(ev, keep_doc=True)
        .join(big_counts, ["w1", "w2"], "left")
        .join(uni.select(F.col("term").alias("w1"), F.col("cnt").alias("c1")), "w1", "left")
        .join(uni.select(F.col("term").alias("w2"), F.col("cnt").alias("cnt2")), "w2", "left")
        .crossJoin(totals)
    )
    p_backoff = (
        F.lit(BACKOFF_ALPHA)
        * (F.coalesce("cnt2", F.lit(0)) + 1)
        / (F.col("t_total") + F.col("v_size"))
    )
    nll = F.when(
        F.col("c2").isNotNull(), -F.log(F.col("c2") / F.col("c1"))
    ).otherwise(-F.log(p_backoff))
    return (
        scored.select("doc_id", "lang", nll.alias("nll"), F.col("c2").isNotNull().cast("int").alias("seen"))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.avg("nll")), 6).alias("ppl"),
            F.round(F.avg("seen"), 6).alias("seen_rate"),
        )
    )


Q_BIGRAM_PPL_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang, {_TOKENS_SQL} AS toks, {_BUCKET_SQL} AS bucket FROM documents
), trb AS (
  SELECT toks[i - 1] AS w1, toks[i] AS w2
  FROM b, unnest(generate_series(2, len(toks))) AS u(i)
  WHERE bucket < {TRAIN_PCT} AND len(toks) >= 2
), bc AS (
  SELECT w1, w2, count(*) AS c2 FROM trb GROUP BY w1, w2
), tru AS (
  SELECT unnest(toks) AS term FROM b WHERE bucket < {TRAIN_PCT}
), uni AS (
  SELECT term, count(*) AS cnt FROM tru GROUP BY term
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t_total, count(*) AS v_size FROM uni
), evb AS (
  SELECT doc_id, lang, toks[i - 1] AS w1, toks[i] AS w2
  FROM b, unnest(generate_series(2, len(toks))) AS u(i)
  WHERE bucket >= {TRAIN_PCT} AND len(toks) >= 2
), sc AS (
  SELECT evb.doc_id, evb.lang,
         CASE WHEN bc.c2 IS NOT NULL THEN -ln(bc.c2 * 1.0 / u1.cnt)
              ELSE -ln({BACKOFF_ALPHA} * (coalesce(u2.cnt, 0) + 1) * 1.0 / (tot.t_total + tot.v_size))
         END AS nll,
         CASE WHEN bc.c2 IS NOT NULL THEN 1 ELSE 0 END AS seen
  FROM evb
  LEFT JOIN bc ON evb.w1 = bc.w1 AND evb.w2 = bc.w2
  LEFT JOIN uni u1 ON evb.w1 = u1.term
  LEFT JOIN uni u2 ON evb.w2 = u2.term
  CROSS JOIN tot
)
SELECT doc_id, lang,
       count(*) AS n_bigrams,
       round(avg(nll), 6) AS avg_nll,
       round(exp(avg(nll)), 6) AS ppl,
       round(avg(seen), 6) AS seen_rate
FROM sc GROUP BY doc_id, lang
"""


# --- trained quality classifier (logistic regression, full-batch GD) -----------
_LR_ROUNDS = 3
_LR_RATE = 1.0


def q_quality_classifier_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: train a logistic-regression quality
    classifier with {_LR_ROUNDS} full-batch gradient-descent rounds over
    the heuristic feature set (capped length, stopword ratio, alnum
    ratio), labels from the composite heuristic score (≥ 0.5). The
    GPT-3-style 'train a cheap classifier on a gold proxy, score the
    corpus with it' pipeline stage, here end-to-end in the engine.

    Returns one row per round (weights after the update + training
    accuracy and log-loss under those weights) so the trajectory itself
    is asserted, like the PageRank/k-means round oracles.

    Scale shape: the feature frame is map-only over documents; each round
    is ONE distributed avg-aggregate producing a 4-float gradient (the
    k-means partial-reduction pattern — driver traffic is 4 doubles per
    round, never rows); scoring under the final weights is again map-only.
    Rounds are driver-coordinated like every iterative operator here
    (MLlib shape); features are rounded to 6 decimals first so both
    engines fit over bit-identical inputs, and reported floats are
    rounded so cross-engine accumulation-order ulps cannot flip the hash.
    """
    from jetstream_spark.queries.text import q_quality_score

    q = q_quality_score(spark, sf_dir)
    feat = q.select(
        "doc_id",
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)).alias("x1"),
        F.col("stopword_ratio").alias("x2"),
        F.col("alnum_ratio").alias("x3"),
        (F.col("quality_score") >= 0.5).cast("double").alias("y"),
    ).localCheckpoint()  # features reused every round — cut the re-scan

    def round_agg(w: list[float]):
        """ONE corpus pass per round: the gradient AT w (drives the next
        update) and the metrics OF w share the same dot product, so
        fusing them halves the passes (4 per 3 rounds incl. the final
        metrics-only pass, vs 6 with separate gradient/metric aggs)."""
        dot = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2") + F.lit(w[3]) * F.col("x3")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
        return feat.agg(
            F.avg(F.col("y") - p).alias("g0"),
            F.avg(F.col("x1") * (F.col("y") - p)).alias("g1"),
            F.avg(F.col("x2") * (F.col("y") - p)).alias("g2"),
            F.avg(F.col("x3") * (F.col("y") - p)).alias("g3"),
            F.avg(((dot >= 0).cast("double") == F.col("y")).cast("double")).alias("acc"),
            F.avg(-(F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p))).alias("loss"),
        ).first()

    w = [0.0, 0.0, 0.0, 0.0]
    out_rows = []
    r = round_agg(w)
    for rnd in range(1, _LR_ROUNDS + 1):
        w = [w[i] + _LR_RATE * r[f"g{i}"] for i in range(4)]
        r = round_agg(w)  # metrics of the NEW w + gradient for the next round
        out_rows.append(
            (rnd, round(w[0], 6), round(w[1], 6), round(w[2], 6), round(w[3], 6),
             round(r["acc"], 6), round(r["loss"], 6))
        )
    return spark.createDataFrame(
        out_rows, "round int, w_bias double, w_len double, w_stop double, w_alnum double, accuracy double, log_loss double"
    )


def _lr_oracle() -> str:
    from jetstream_spark.queries.text import Q_QUALITY_ORACLE

    rounds_sql = []
    prev_w = "w0"
    for r in range(1, _LR_ROUNDS + 1):
        rounds_sql.append(f"""
g{r} AS (
  SELECT avg(y - p) AS g0, avg(x1 * (y - p)) AS g1,
         avg(x2 * (y - p)) AS g2, avg(x3 * (y - p)) AS g3
  FROM (SELECT f.*, 1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2 + b3 * x3))) AS p
        FROM feat f, {prev_w})
), w{r} AS (
  SELECT b0 + {_LR_RATE} * g0 AS b0, b1 + {_LR_RATE} * g1 AS b1,
         b2 + {_LR_RATE} * g2 AS b2, b3 + {_LR_RATE} * g3 AS b3
  FROM {prev_w}, g{r}
), m{r} AS (
  SELECT avg(CASE WHEN (CASE WHEN d >= 0 THEN 1.0 ELSE 0.0 END) = y THEN 1.0 ELSE 0.0 END) AS acc,
         avg(-(y * ln(1.0 / (1.0 + exp(-d))) + (1 - y) * ln(1 - 1.0 / (1.0 + exp(-d))))) AS loss
  FROM (SELECT f.y, b0 + b1 * x1 + b2 * x2 + b3 * x3 AS d FROM feat f, w{r})
)""")
        prev_w = f"w{r}"
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, round(b0, 6) AS w_bias, round(b1, 6) AS w_len, "
        f"round(b2, 6) AS w_stop, round(b3, 6) AS w_alnum, "
        f"round(acc, 6) AS accuracy, round(loss, 6) AS log_loss FROM w{r}, m{r}"
        for r in range(1, _LR_ROUNDS + 1)
    )
    return f"""
WITH q AS ({Q_QUALITY_ORACLE}), feat AS (
  SELECT doc_id, least(n_tokens / 50.0, 1.0) AS x1, stopword_ratio AS x2,
         alnum_ratio AS x3,
         CASE WHEN quality_score >= 0.5 THEN 1.0 ELSE 0.0 END AS y
  FROM q
), w0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3),{",".join(rounds_sql)}
{selects} ORDER BY round
"""


# --- multinomial Naive Bayes domain classifier ----------------------------------
# The closed-form sibling of the GD-trained LR classifier above: train a
# multinomial NB model (Laplace-smoothed per-class token likelihoods +
# class priors) on the documents' source labels and score the corpus
# with it, reporting the confusion matrix — the fastText-style "cheap
# supervised domain/provenance classifier" a curation pipeline trains to
# route or re-label crawl shards. Training is pure aggregation (no
# rounds), so unlike LR there is zero driver coordination.
#
# Cross-engine determinism: per-(token, class) log-likelihoods and class
# priors are quantized to integer micro-nats (round(ln·1e6) → BIGINT)
# BEFORE scoring, so per-doc class scores are exact integer sums —
# accumulation order cannot flip an argmax tie anywhere (the
# dedup_embedding_lsh integer-dot pattern). Ties break on the smaller
# source string via a struct-min argmax, no window.
#
# Scale shape (100 TB): the corpus is tokenized and exploded ONCE — the
# (doc, source, token, cnt) frame is a lazy localCheckpoint (the
# tokenize-once posture bm25 uses) and every training aggregate (vocab
# size, per-class token totals, (token, class) counts) plus the scoring
# join derive from it, so the plan pays one explode + one
# corpus-token-distinct exchange instead of five (r8: the
# naive_bayes_domain sf1 fan-out fix — the pre-restructure plan re-read
# and re-tokenized documents 16 times). The smoothed model is
# vocab × |classes| rows (Heaps-law bounded); scoring joins the
# checkpointed (doc, token, cnt) rows against the model on token
# (fan-out |classes| rows per distinct doc-token AFTER the join's map
# side) and reduces per (doc, class); the argmax is a struct-min
# aggregate. Priors/vocab-size/class frames are 1-to-|classes|-row
# broadcasts. Zero-token docs drop out of scoring in both engines
# (absence of evidence — the curation pipeline routes them to the
# length filter, not the classifier).

def q_naive_bayes_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    dt = (
        docs.select("doc_id", "source", F.explode(_tokens("text")).alias("token"))
        .groupBy("doc_id", "source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    classes = docs.select(F.col("source").alias("csrc")).distinct()
    vocab = dt.select("token").distinct().agg(F.count(F.lit(1)).alias("v"))
    tot = dt.groupBy(F.col("source").alias("csrc")).agg(F.sum("cnt").alias("t"))
    tc = dt.groupBy("token", F.col("source").alias("csrc")).agg(
        F.sum("cnt").alias("c")
    )
    model = (
        dt.select("token")
        .distinct()
        .crossJoin(F.broadcast(classes))
        .join(F.broadcast(tot), "csrc")
        .join(tc, ["token", "csrc"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "token",
            "csrc",
            F.round(
                F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / (F.col("t") + F.col("v")))
                * 1e6
            )
            .cast("long")
            .alias("ll"),
        )
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    prior = (
        docs.groupBy(F.col("source").alias("csrc"))
        .agg(F.count(F.lit(1)).alias("dc"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "csrc",
            F.round(F.log(F.col("dc") / F.col("nd")) * 1e6).cast("long").alias("pr"),
        )
    )
    sc = (
        # the model is vocab × |classes| rows (Heaps-law bounded) but its
        # size estimate flows from the checkpointed corpus frame, so the
        # optimizer can pick BuildLeft and broadcast the CORPUS side — the
        # r8 sf1 fan-out root cause (35.9 s → 6.3 s; at 100 TB, an OOM).
        # The explicit hint pins the build side to the model.
        dt.join(F.broadcast(model), "token")
        .groupBy("doc_id", F.col("source").alias("true_source"), "csrc")
        .agg(F.sum(F.col("cnt") * F.col("ll")).alias("s"))
        .join(F.broadcast(prior), "csrc")
        .select("doc_id", "true_source", "csrc", (F.col("s") + F.col("pr")).alias("score"))
    )
    pred = sc.groupBy("doc_id", "true_source").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("csrc").alias("ps"))).alias("m")
    )
    return pred.groupBy(
        "true_source", F.col("m.ps").alias("pred_source")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


Q_NAIVE_BAYES_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest({_TOKENS_SQL}) AS token FROM documents
), dt AS (
  SELECT doc_id, source, token, count(*) AS cnt FROM tok GROUP BY 1, 2, 3
), vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
tot AS (SELECT source AS csrc, count(*) AS t FROM tok GROUP BY 1),
tc AS (SELECT token, source AS csrc, count(*) AS c FROM tok GROUP BY 1, 2),
model AS (
  SELECT td.token, cl.csrc,
         CAST(round(ln((coalesce(tc.c, 0) + 1.0) / (tot.t + vocab.v)) * 1e6) AS BIGINT) AS ll
  FROM (SELECT DISTINCT token FROM tok) td
  CROSS JOIN (SELECT DISTINCT source AS csrc FROM documents) cl
  JOIN tot USING (csrc)
  LEFT JOIN tc ON tc.token = td.token AND tc.csrc = cl.csrc, vocab
),
prior AS (
  SELECT source AS csrc,
         CAST(round(ln(count(*) * 1.0 / (SELECT count(*) FROM documents)) * 1e6) AS BIGINT) AS pr
  FROM documents GROUP BY 1
),
sc AS (
  SELECT dt.doc_id, dt.source AS true_source, m.csrc,
         sum(dt.cnt * m.ll) + any_value(p.pr) AS score
  FROM dt JOIN model m ON m.token = dt.token JOIN prior p ON p.csrc = m.csrc
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, true_source, csrc AS pred_source,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, csrc) AS rn
  FROM sc
)
SELECT true_source, pred_source, CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1 GROUP BY 1, 2
"""


# --- HBOS histogram-based outlier score ------------------------------------------
# Goldstein & Dengel (2012): per-feature equal-width histograms, outlier
# score = Σ_f ln(1/density_f(x)) — the linear-time unsupervised outlier
# detector for tabular features, here over the document quality-feature
# space (token count, stopword ratio, alnum ratio). The corpus-triage
# complement of the Mahalanobis operator (embedding_outliers): HBOS
# assumes feature independence and needs no matrix inverse, so it is
# the first pass a curation pipeline runs on BILLIONS of docs; docs it
# surfaces are empty-ish shells, symbol soup, or stopword floods.
#
# Scale shape: one min/max stats aggregate (1 row, broadcast back), one
# (feature, bin) count aggregate (3·B rows, broadcast back as three
# ≤B-row joins), map-only scoring, TakeOrdered(top-N). Bin formula is
# the engine-identical profile_histogram arithmetic; score is a fixed
# 3-term expression over exact count/N rationals — no accumulation
# order anywhere.

HBOS_BINS = 10
HBOS_TOP = 20


def q_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jetstream_spark.queries.text import q_quality_score

    # the tokenize-heavy feature frame is consumed FIVE times (stats, the
    # binning pass, three per-feature bin counts): the eager checkpoint
    # pins it to one corpus tokenization (r8 plan audit: 7 text scans -> 1;
    # the checkpoint is N x 4 narrow columns — the tokenize-once trade)
    q = q_quality_score(spark, sf_dir).select(
        "doc_id",
        F.col("n_tokens").cast("double").alias("f1"),
        F.col("stopword_ratio").alias("f2"),
        F.col("alnum_ratio").alias("f3"),
    ).localCheckpoint(eager=True)
    stats = q.agg(
        F.count(F.lit(1)).alias("nn"),
        *[m(f"f{i}").alias(f"{n}{i}") for i in (1, 2, 3) for n, m in (("lo", F.min), ("hi", F.max))],
    )
    binned = q.crossJoin(F.broadcast(stats))
    bins = {}
    for i in (1, 2, 3):
        lo, hi = F.col(f"lo{i}"), F.col(f"hi{i}")
        raw = F.floor((F.col(f"f{i}") - lo) / (hi - lo) * HBOS_BINS)
        bins[i] = F.when(hi > lo, F.least(F.lit(HBOS_BINS - 1), raw)).otherwise(F.lit(0)).cast("long")
    binned = binned.select(
        "doc_id", "nn", *[bins[i].alias(f"b{i}") for i in (1, 2, 3)]
    )
    # r14 (guide §6/§3.1): the three per-feature groupBy(b_i) count tables
    # each re-derived `binned` (and its stats aggregate), so the
    # checkpointed feature frame was scanned 8x per run. With B=10 fixed
    # bins, all three count tables fit in ONE 30-column conditional
    # aggregate (a single 1-row broadcast); scoring looks the counts up
    # with element_at instead of three broadcast joins. Rows whose bin is
    # NULL are filtered to mirror the old inner joins (a NULL key never
    # matched), so the output is row-identical.
    cnts = binned.agg(
        *[
            F.count(F.when(F.col(f"b{i}") == k, 1)).alias(f"c{i}_{k}")
            for i in (1, 2, 3)
            for k in range(HBOS_BINS)
        ]
    )
    out = binned.where(
        F.col("b1").isNotNull() & F.col("b2").isNotNull() & F.col("b3").isNotNull()
    ).crossJoin(F.broadcast(cnts))
    score = None
    for i in (1, 2, 3):
        c_i = F.element_at(
            F.array(*[F.col(f"c{i}_{k}") for k in range(HBOS_BINS)]),
            (F.col(f"b{i}") + 1).cast("int"),
        )
        term = -F.log(c_i / F.col("nn"))
        score = term if score is None else score + term
    return (
        out.select("doc_id", "b1", "b2", "b3", F.round(score, 6).alias("hbos_score"))
        .orderBy(F.col("hbos_score").desc(), "doc_id")
        .limit(HBOS_TOP)
    )


def _hbos_oracle() -> str:
    from jetstream_spark.queries.text import Q_QUALITY_ORACLE

    def bin_expr(i: int) -> str:
        return (
            f"CASE WHEN hi{i} > lo{i} THEN least({HBOS_BINS - 1}, "
            f"CAST(floor((f{i} - lo{i}) / (hi{i} - lo{i}) * {HBOS_BINS}) AS BIGINT)) "
            f"ELSE 0 END AS b{i}"
        )

    return f"""
WITH qual AS ({Q_QUALITY_ORACLE}),
q AS (
  SELECT doc_id, CAST(n_tokens AS DOUBLE) AS f1, stopword_ratio AS f2,
         alnum_ratio AS f3
  FROM qual
), stats AS (
  SELECT count(*) AS nn,
         min(f1) AS lo1, max(f1) AS hi1, min(f2) AS lo2, max(f2) AS hi2,
         min(f3) AS lo3, max(f3) AS hi3
  FROM q
), binned AS (
  SELECT doc_id, nn, {bin_expr(1)}, {bin_expr(2)}, {bin_expr(3)}
  FROM q, stats
), c1 AS (SELECT b1, count(*) AS c1 FROM binned GROUP BY 1),
c2 AS (SELECT b2, count(*) AS c2 FROM binned GROUP BY 1),
c3 AS (SELECT b3, count(*) AS c3 FROM binned GROUP BY 1)
SELECT doc_id, b1, b2, b3,
       round(-ln(CAST(c1 AS DOUBLE) / nn) - ln(CAST(c2 AS DOUBLE) / nn)
             - ln(CAST(c3 AS DOUBLE) / nn), 6) AS hbos_score
FROM binned JOIN c1 USING (b1) JOIN c2 USING (b2) JOIN c3 USING (b3)
ORDER BY hbos_score DESC, doc_id LIMIT {HBOS_TOP}
"""


# --- Kneser-Ney bigram LM ----------------------------------------------------------
KN_D = 0.75  # absolute discount


def q_kneser_ney_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the LM ladder's serious
    smoother next to add-1 (unigram op) and stupid backoff (bigram op):
    p(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·) + (D·N₁₊(w₁·)/c(w₁·))·p_cont(w₂),
    with the CONTINUATION distribution p_cont(w₂) = (N₁₊(·w₂)+1)/(B+V)
    (+1-smoothed so held-out novel words stay finite) and unseen
    predecessors falling back to p_cont directly. Same md5 train/eval
    membership as its siblings; per-doc avg NLL and perplexity.

    Scale shape: identical to bigram_perplexity — the bigram model
    tables join the exploded eval stream ON THE BIGRAM/PREDECESSOR KEYS
    (never broadcast at corpus scale; AQE threshold-picks at bench SF);
    the continuation table is vocab-sized; the two scalars broadcast.
    Per-doc avg over ≤doc-length round-trip-rounded doubles, round-6
    output (the bigram-op float contract)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", _bucket_expr()
    )
    train = docs.filter(F.col("bucket") < TRAIN_PCT)
    ev = docs.filter(F.col("bucket") >= TRAIN_PCT)

    def bigrams(frame: DataFrame, keep_doc: bool) -> DataFrame:
        toks = _tokens()
        pairs = F.transform(
            F.sequence(F.lit(2), F.size("toks")),
            lambda i: F.struct(
                F.element_at("toks", i - 1).alias("w1"),
                F.element_at("toks", i).alias("w2"),
            ),
        )
        base = frame.select("doc_id", "lang", toks.alias("toks")).where(
            F.size("toks") >= 2
        )
        cols = ["doc_id", "lang"] if keep_doc else []
        return base.select(*cols, F.explode(pairs).alias("p")).select(
            *cols, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )

    # bigram-type-bounded (Heaps law), consumed FOUR times (predecessor
    # and continuation marginals, the type totals, and the scoring join):
    # the eager checkpoint keeps the plan at ONE train tokenization
    # instead of four (r8 plan audit: 6 corpus scans -> 3)
    bc = (
        bigrams(train, keep_doc=False)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    pred = bc.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n2")
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("nc"))
    vocab = train.select(F.explode(_tokens()).alias("term")).select("term").distinct()
    totals = bc.agg(F.count(F.lit(1)).alias("b_types")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("v_size"))
    )
    scored = (
        bigrams(ev, keep_doc=True)
        .join(bc, ["w1", "w2"], "left")
        .join(pred, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    p_cont = (F.coalesce("nc", F.lit(0)) + 1) / (F.col("b_types") + F.col("v_size"))
    p_kn = F.when(
        F.col("c1").isNotNull(),
        F.greatest(F.coalesce("c2", F.lit(0)) - F.lit(KN_D), F.lit(0.0)) / F.col("c1")
        + (F.lit(KN_D) * F.col("n2") / F.col("c1")) * p_cont,
    ).otherwise(p_cont)
    return (
        scored.select(
            "doc_id",
            "lang",
            (-F.log(p_kn)).alias("nll"),
            F.col("c2").isNotNull().cast("int").alias("seen"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.avg("nll")), 6).alias("ppl"),
            F.round(F.avg("seen"), 6).alias("seen_rate"),
        )
    )


Q_KN_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang, {_TOKENS_SQL} AS toks, {_BUCKET_SQL} AS bucket FROM documents
), trb AS (
  SELECT toks[i - 1] AS w1, toks[i] AS w2
  FROM b, unnest(generate_series(2, len(toks))) AS u(i)
  WHERE bucket < {TRAIN_PCT} AND len(toks) >= 2
), bc AS (
  SELECT w1, w2, count(*) AS c2 FROM trb GROUP BY w1, w2
), pred AS (
  SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS n2 FROM bc GROUP BY w1
), cont AS (
  SELECT w2, count(*) AS nc FROM bc GROUP BY w2
), tot AS (
  SELECT (SELECT count(*) FROM bc) AS b_types,
         (SELECT count(DISTINCT term)
          FROM (SELECT unnest(toks) AS term FROM b WHERE bucket < {TRAIN_PCT})) AS v_size
), evb AS (
  SELECT doc_id, lang, toks[i - 1] AS w1, toks[i] AS w2
  FROM b, unnest(generate_series(2, len(toks))) AS u(i)
  WHERE bucket >= {TRAIN_PCT} AND len(toks) >= 2
), s AS (
  SELECT e.doc_id, e.lang,
         CASE WHEN p.c1 IS NOT NULL THEN
           greatest(coalesce(m.c2, 0) - CAST({KN_D} AS DOUBLE), CAST(0 AS DOUBLE)) / p.c1
           + (CAST({KN_D} AS DOUBLE) * p.n2 / p.c1)
             * (CAST(coalesce(c.nc, 0) + 1 AS DOUBLE) / (t.b_types + t.v_size))
         ELSE CAST(coalesce(c.nc, 0) + 1 AS DOUBLE) / (t.b_types + t.v_size) END AS p_kn,
         CASE WHEN m.c2 IS NOT NULL THEN 1 ELSE 0 END AS seen
  FROM evb e
  LEFT JOIN bc m ON m.w1 = e.w1 AND m.w2 = e.w2
  LEFT JOIN pred p ON p.w1 = e.w1
  LEFT JOIN cont c ON c.w2 = e.w2
  CROSS JOIN tot t
)
SELECT doc_id, lang, count(*) AS n_bigrams,
       round(avg(-ln(p_kn)), 6) AS avg_nll,
       round(exp(avg(-ln(p_kn))), 6) AS ppl,
       round(avg(CAST(seen AS DOUBLE)), 6) AS seen_rate
FROM s GROUP BY doc_id, lang
"""


# --- weak-supervision labeling-function analysis ----------------------------------
# The Snorkel-style LF diagnostic table (Ratner et al., VLDB 2018): three
# deterministic labeling functions vote {1, 0, abstain} on every doc;
# per LF the table reports coverage (voted), overlaps (voted alongside
# another LF), conflicts (voted AGAINST another LF), and empirical
# accuracy vs the heuristic gold (quality_score >= 0.5, the LR/NB label
# convention) — the sheet a weak-supervision pipeline reads before
# fitting a label model. One map-only vote pass + ONE wide aggregate;
# the 3-row output unpivots from the 1-row aggregate (the k-anonymity
# lattice pattern). All ratios are integer-count rationals rounded at 6.

_WL_LFS = ("lf_wordcount", "lf_stopword", "lf_alnum")


def _wl_votes():
    """Per-doc votes per LF: 1 / 0 / -1 (abstain) — thresholds chosen so
    each LF covers a different slice and abstains elsewhere."""
    n, stop, aln = F.col("n_tokens"), F.col("stopword_ratio"), F.col("alnum_ratio")
    return {
        "lf_wordcount": F.when((n >= 20) & (n <= 200), 1).when(n < 5, 0).otherwise(-1),
        "lf_stopword": F.when((stop >= 0.1) & (stop <= 0.6), 1).when(stop > 0.8, 0).otherwise(-1),
        "lf_alnum": F.when(aln >= 0.6, 1).when(aln < 0.3, 0).otherwise(-1),
    }


def q_weak_label_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jetstream_spark.queries.text import q_quality_score

    q = q_quality_score(spark, sf_dir)
    votes = _wl_votes()
    voted = q.select(
        (F.col("quality_score") >= 0.5).cast("int").alias("gold"),
        *[v.alias(name) for name, v in votes.items()],
    )
    n_docs = F.count(F.lit(1))
    aggs = [n_docs.alias("n_docs")]
    for name in _WL_LFS:
        others = [o for o in _WL_LFS if o != name]
        v = F.col(name)
        active = v != -1
        any_other = None
        conflict = None
        for o in others:
            ov = F.col(o)
            oa = ov != -1
            any_other = oa if any_other is None else (any_other | oa)
            c = oa & (ov != v)
            conflict = c if conflict is None else (conflict | c)
        aggs += [
            F.sum(active.cast("long")).alias(f"{name}_votes"),
            F.sum((active & any_other).cast("long")).alias(f"{name}_overlap"),
            F.sum((active & conflict).cast("long")).alias(f"{name}_conflict"),
            F.sum((active & (v == F.col("gold"))).cast("long")).alias(f"{name}_correct"),
        ]
    wide = voted.agg(*aggs)
    # r14 (guide §6): the 3-row output was a union whose every branch
    # re-executed the wide aggregate — and with it the corpus-scale
    # tokenize pass — three times per run. Exploding an array of structs
    # over the ONE 1-row aggregate emits the same rows from one pass.
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("lf"),
                F.col(f"{name}_votes").alias("n_votes"),
                F.round(F.col(f"{name}_votes") / F.col("n_docs"), 6).alias(
                    "coverage"
                ),
                F.round(F.col(f"{name}_overlap") / F.col("n_docs"), 6).alias(
                    "overlaps"
                ),
                F.round(F.col(f"{name}_conflict") / F.col("n_docs"), 6).alias(
                    "conflicts"
                ),
                F.round(
                    F.col(f"{name}_correct") / F.col(f"{name}_votes"), 6
                ).alias("accuracy"),
            )
            for name in _WL_LFS
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def _wl_oracle() -> str:
    from jetstream_spark.queries.text import Q_QUALITY_ORACLE

    votes_sql = {
        "lf_wordcount": "CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 1 WHEN n_tokens < 5 THEN 0 ELSE -1 END",
        "lf_stopword": "CASE WHEN stopword_ratio >= 0.1 AND stopword_ratio <= 0.6 THEN 1 WHEN stopword_ratio > 0.8 THEN 0 ELSE -1 END",
        "lf_alnum": "CASE WHEN alnum_ratio >= 0.6 THEN 1 WHEN alnum_ratio < 0.3 THEN 0 ELSE -1 END",
    }
    vote_cols = ",\n         ".join(f"{sql} AS {n}" for n, sql in votes_sql.items())
    selects = []
    for name in _WL_LFS:
        others = [o for o in _WL_LFS if o != name]
        any_other = " OR ".join(f"{o} <> -1" for o in others)
        conflict = " OR ".join(f"({o} <> -1 AND {o} <> {name})" for o in others)
        selects.append(f"""
SELECT '{name}' AS lf,
       CAST(sum(CASE WHEN {name} <> -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_votes,
       round(CAST(sum(CASE WHEN {name} <> -1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS coverage,
       round(CAST(sum(CASE WHEN {name} <> -1 AND ({any_other}) THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS overlaps,
       round(CAST(sum(CASE WHEN {name} <> -1 AND ({conflict}) THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS conflicts,
       round(CAST(sum(CASE WHEN {name} <> -1 AND {name} = gold THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN {name} <> -1 THEN 1 ELSE 0 END), 6) AS accuracy
FROM voted""")
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH qual AS ({Q_QUALITY_ORACLE}),
voted AS (
  SELECT CASE WHEN quality_score >= 0.5 THEN 1 ELSE 0 END AS gold,
         {vote_cols}
  FROM qual
)
{body}
"""


QUERIES = [
    QuerySpec("weak_label_analysis", q_weak_label_analysis, _wl_oracle(), "Snorkel-style labeling-function diagnostics (coverage/overlap/conflict/accuracy)", ("quality",)),
    QuerySpec("hbos_outliers", q_hbos_outliers, _hbos_oracle(), "HBOS histogram-based outlier docs over quality features (top-20)", ("quality", "monitoring")),
    QuerySpec("kneser_ney_perplexity", q_kneser_ney_perplexity, Q_KN_ORACLE, "interpolated Kneser-Ney bigram LM scoring (continuation-smoothed, held-out)", ("text", "quality")),
    QuerySpec("naive_bayes_domain", q_naive_bayes_domain, Q_NAIVE_BAYES_ORACLE, "multinomial Naive Bayes domain classifier (integer micro-nat scores, confusion matrix)", ("quality",)),
    QuerySpec("quality_classifier_lr", q_quality_classifier_lr, _lr_oracle(), "trained logistic-regression quality classifier (3 GD rounds, per-round weights + metrics)", ("quality",)),
    QuerySpec("bigram_perplexity", q_bigram_perplexity, Q_BIGRAM_PPL_ORACLE, "bigram stupid-backoff LM: model-as-table join scoring", ("text", "quality")),
    QuerySpec("quality_gopher_rules", q_gopher_rules, Q_GOPHER_ORACLE, "Gopher rule-bundle verdicts per doc", ("text", "quality")),
    QuerySpec("curation_pipeline", q_curation_pipeline, Q_CURATION_ORACLE, "dedup → Gopher filter → split: composed curation pipeline", ("quality", "pipeline")),
    QuerySpec("unigram_perplexity", q_unigram_perplexity, Q_UNIGRAM_PPL_ORACLE, "unigram-LM perplexity + CCNet terciles", ("text", "quality")),
    QuerySpec("domain_mix_weights", q_domain_mix_weights, Q_DOMAIN_MIX_ORACLE, "per-source token shares + temperature mixing weights", ("quality",)),
    QuerySpec("importance_weights_dsir", q_dsir_weights, Q_DSIR_ORACLE, "DSIR hashed-ngram importance weights", ("quality",)),
]
