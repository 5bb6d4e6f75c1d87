"""Distributed BPE tokenizer training and encoding (SURVEY.md §2.3 —
tokenizer preparation, the step between curation and training).

`bpe_pair_counts` (text.py) is ONE round of the trainer's statistic; here
the full iterative trainer runs: N_MERGES rounds of

    argmax over corpus-weighted adjacent-symbol-pair counts
    → merge that pair left-to-right in every vocab word

and an encoder that applies the learned ranks to the corpus.

Scale design — the invariant that makes BPE training distributable:
after the first explode+count shuffle the corpus NEVER participates
again. The working set is the distinct-word frequency table (Heaps-law
sublinear in corpus size: ~10^6-10^7 rows at 100 TB vs 10^13 tokens),
held as a DataFrame with one `symbols: array<string>` column. Per merge:

- pair statistics: one vocabulary-sized explode + partial-agg shuffle to
  ≤ |alphabet ∪ merges|² rows;
- argmax: a 1-row collect (count desc, pair asc tie-break → fully
  deterministic), the same bounded-state driver action as the CMS /
  IVF-centroid / budget-histogram collects;
- merge application: a map-only codegen `aggregate` fold over each
  word's symbol array (left-to-right, non-overlapping — the BPE scan);
- `localCheckpoint` cuts the per-round lineage so round R's plan does
  not replay rounds 1..R-1 (the components.py iterative pattern).

Encoding joins the corpus's exploded words against the final vocab's
(word → n_symbols) — a vocabulary-sized build side, so the planner
broadcasts it under threshold; per-doc stats come from one groupBy.

No SQL oracle: the trainer is genuinely iterative (argmax → transform →
argmax dependency chain), the case the driver records as rows-only.
Correctness is pinned by tests/test_bpe.py: exact equality of learned
merges and encoded lengths with an independent pure-Python BPE reference
(dict-based, Sennrich et al. algorithm) on the same corpus, plus
monotonicity invariants (token count non-increasing per merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetstream_spark.queries.spec import QuerySpec
from jetstream_spark.tables import table

N_MERGES = 24


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(col: F.Column) -> F.Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: col.substr(i, F.lit(1))
    )


def _merge_fold(left: str, right: str) -> F.Column:
    """Left-to-right non-overlapping replacement of (left, right) with
    left||right in the symbols array, as a codegen aggregate fold: the
    accumulator is the rewritten prefix; a step either fuses the incoming
    symbol into the accumulator's tail or appends it."""
    merged = F.lit(left + right)

    def step(acc: F.Column, x: F.Column) -> F.Column:
        tail_is_left = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(left))
        return F.when(
            tail_is_left & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("symbols"), F.array().cast("array<string>"), step
    )


def learn_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run the trainer; returns (merges as [(left, right, weighted_count)]
    in learned order, final vocab DataFrame (word, freq, symbols))."""
    vocab = _word_freq(spark, sf_dir).select(
        "word", "freq", _chars(F.col("word")).alias("symbols")
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = F.transform(
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at("symbols", i).alias("left"),
                F.element_at("symbols", i + F.lit(1)).alias("right"),
            ),
        )
        top = (
            vocab.where(F.size("symbols") >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, count = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((left, right, int(count)))
        vocab = vocab.select(
            "word", "freq", _merge_fold(left, right).alias("symbols")
        ).localCheckpoint(eager=True)
    return merges, vocab


def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table (rank, left, right, pair_count) — the
    artifact a BPE tokenizer ships. See module docstring for the
    distributed shape; rows-only driver check (iterative)."""
    merges, _ = learn_bpe(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )


def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics after applying the learned merges:
    (doc_id, n_words, n_bpe_tokens, compression = chars/bpe_tokens). The
    corpus explodes to words ONCE and joins the vocabulary's final
    symbol counts (broadcast-sized build side); encoding never re-runs
    the merge scan per document."""
    merges, vocab = learn_bpe(spark, sf_dir)
    word_len = vocab.select(
        "word", F.size("symbols").alias("n_sym"), F.length("word").alias("n_chr")
    )
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    words = docs.select("doc_id", F.explode(toks).alias("word"))
    return (
        words.join(word_len, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            F.round(F.sum("n_chr") / F.sum("n_sym"), 6).alias("compression"),
        )
    )


QUERIES = [
    QuerySpec("bpe_learn_merges", q_bpe_learn_merges, None, "iterative distributed BPE trainer over the vocab table", ("tokenizer",)),
    QuerySpec("bpe_encode_stats", q_bpe_encode_stats, None, "per-doc BPE token stats via vocab-encoded join", ("tokenizer",)),
]
