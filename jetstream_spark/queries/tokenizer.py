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

SQL oracle (the kmeans_train unrolled-CTE pattern): the merge count is
fixed, so the whole trainer unrolls as N_MERGES generated DuckDB CTE
rounds. The vocabulary's symbol sequence is kept as a pipe-delimited
string where EVERY symbol is individually wrapped — "hello" starts as
'|h||e||l||l||o|' — because then BPE's merge step (replace all
non-overlapping adjacent (l, r) occurrences, scanning left-to-right) is
EXACTLY SQL replace(pstr, '|l||r|', '|lr|'): symbols never contain '|',
so the pattern only matches whole adjacent symbols, and because each
symbol carries its own delimiters, adjacent matches share no characters
(the '|a a a a|' pitfall of space-joined encodings, where the shared
separator breaks the second match, cannot occur). Per round: pair counts
explode the split symbol list, the argmax CTE is ORDER BY count DESC,
left, right LIMIT 1 (the Spark tie-break), and the merge CTE is one
cross join against that 1-row argmax. CTEs are AS MATERIALIZED so the
24-round chain evaluates each vocabulary state once.

Correctness is additionally pinned by tests/test_bpe.py: exact equality
of learned merges and encoded lengths with an independent pure-Python
BPE reference (dict-based, Sennrich et al. algorithm) on the same
corpus, plus monotonicity invariants (token count non-increasing per
merge).
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


def _pair_argmax_frame(vocab: DataFrame) -> DataFrame:
    """ONE trainer round's statistic as a frame (pre-collect): explode the
    vocabulary's adjacent symbol pairs, partial-agg to pair counts, and
    TakeOrdered the deterministic argmax (count desc, pair asc). Extracted
    so the per-round physical plan is test-assertable — the engine-wide
    plan sweep only sees final frames, not loop bodies."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("symbols") - 1),
        lambda i: F.struct(
            F.element_at("symbols", i).alias("left"),
            F.element_at("symbols", i + F.lit(1)).alias("right"),
        ),
    )
    return (
        vocab.where(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
        .limit(1)
    )


def learn_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run the trainer; returns (merges as [(left, right, weighted_count)]
    in learned order, final vocab DataFrame (word, freq, symbols))."""
    vocab = _word_freq(spark, sf_dir).select(
        "word", "freq", _chars(F.col("word")).alias("symbols")
    )
    # lazy checkpoints (r13; was eager): each round's merge fold
    # materializes INSIDE the next round's argmax job instead of paying a
    # dedicated checkpoint job first — the TakeOrdered argmax covers every
    # partition, so the checkpoint is complete after it, later readers hit
    # the stored blocks, and the lineage cut is unchanged. Halves the
    # per-round job count (2 → 1); the trainer that returns only `merges`
    # additionally never materializes the LAST round's fold.
    vocab = vocab.localCheckpoint(eager=False)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = _pair_argmax_frame(vocab).collect()
        if not top:
            break
        left, right, count = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((left, right, int(count)))
        vocab = vocab.select(
            "word", "freq", _merge_fold(left, right).alias("symbols")
        ).localCheckpoint(eager=False)
    return merges, vocab


def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table (rank, left, right, pair_count) — the
    artifact a BPE tokenizer ships. See module docstring for the
    distributed shape and the unrolled replace-CTE oracle that
    hash-checks the full trajectory."""
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


def _bpe_rounds_sql(n_merges: int = N_MERGES) -> str:
    """The shared CTE chain: tokenized vocab v0, then per round r a pair
    explode p{r}, a 1-row argmax t{r}, and the merged vocab v{r}."""
    parts = [
        """w AS MATERIALIZED (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS word
  FROM documents)""",
        r"""v0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         regexp_replace(word, '(.)', '|\1|', 'g') AS pstr
  FROM w GROUP BY word)""",
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(
            f"""p{r} AS (
  SELECT s.syms[u.i] AS lft, s.syms[u.i + 1] AS rgt, s.freq
  FROM (SELECT freq, str_split(trim(pstr, '|'), '||') AS syms FROM v{p}) s,
       unnest(generate_series(1, len(s.syms) - 1)) AS u(i))"""
        )
        parts.append(
            f"""t{r} AS MATERIALIZED (
  SELECT {r} AS rank, lft, rgt, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM p{r} GROUP BY lft, rgt
  ORDER BY pair_count DESC, lft, rgt LIMIT 1)"""
        )
        parts.append(
            f"""v{r} AS MATERIALIZED (
  SELECT v.word, v.freq,
         replace(v.pstr, '|' || t.lft || '||' || t.rgt || '|',
                         '|' || t.lft || t.rgt || '|') AS pstr
  FROM v{p} v, t{r} t)"""
        )
    return ",\n".join(parts)


def _bpe_learn_oracle(n_merges: int = N_MERGES) -> str:
    union = "\nUNION ALL\n".join(f"SELECT * FROM t{r}" for r in range(1, n_merges + 1))
    return f"""
WITH {_bpe_rounds_sql(n_merges)}
SELECT rank, lft AS "left", rgt AS "right", pair_count
FROM ({union})
"""


def _bpe_encode_oracle(n_merges: int = N_MERGES) -> str:
    return f"""
WITH {_bpe_rounds_sql(n_merges)},
wl AS (
  SELECT word, len(str_split(trim(pstr, '|'), '||')) AS n_sym, len(word) AS n_chr
  FROM v{n_merges}),
dw AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS word
  FROM documents)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(wl.n_sym) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(wl.n_chr) AS DOUBLE) / sum(wl.n_sym), 6) AS compression
FROM dw JOIN wl USING (word)
GROUP BY doc_id
"""


QUERIES = [
    QuerySpec("bpe_learn_merges", q_bpe_learn_merges, _bpe_learn_oracle(), "iterative distributed BPE trainer, hash-checked against unrolled replace-CTE SQL", ("tokenizer",)),
    QuerySpec("bpe_encode_stats", q_bpe_encode_stats, _bpe_encode_oracle(), "per-doc BPE token stats via vocab-encoded join (unrolled-CTE oracle)", ("tokenizer",)),
]


def q_wordpiece_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style GREEDY encoding against the BPE-learned piece
    inventory: at each position take the LONGEST piece that prefixes the
    remaining word; an unmatched character consumes one UNK token. The
    same piece inventory under greedy longest-match segments differently
    from merge-order BPE — shipping tokenizers (BERT WordPiece) use
    exactly this decode rule, and the delta between the two encoders'
    token counts is a real tokenizer-selection signal.

    Scale shape: the piece inventory is tokenizer-artifact-sized
    (|alphabet| + N_MERGES here; ~30k in production — always broadcast),
    and the greedy matcher runs over the DISTINCT-WORD table (Heaps-law
    sublinear), never the corpus: one Arrow-batch kernel over the word
    table, then the corpus joins the (word → counts) result exactly like
    bpe_encode_stats — the segmentation never touches the corpus. The
    oracle re-derives the pieces from the unrolled BPE CTEs and replays
    the greedy scan as a recursive CTE, so both engines walk the
    identical longest-match trajectory."""
    import pandas as pd

    _, vocab = learn_bpe(spark, sf_dir)
    pieces = {
        r["s"]
        for r in vocab.select(F.explode("symbols").alias("s")).distinct().collect()
    }  # bounded: <= |alphabet| + N_MERGES (the IVF-centroid collect precedent)
    max_len = max(len(p) for p in pieces)
    bc = spark.sparkContext.broadcast((pieces, max_len))

    def encode(batches):
        ps, top = bc.value
        for pdf in batches:
            n_wp, n_unk = [], []
            for word in pdf["word"]:
                pos, toks, unks = 0, 0, 0
                while pos < len(word):
                    k = min(top, len(word) - pos)
                    while k > 0 and word[pos : pos + k] not in ps:
                        k -= 1
                    if k == 0:
                        unks += 1
                        pos += 1
                    else:
                        pos += k
                    toks += 1
                n_wp.append(toks)
                n_unk.append(unks)
            yield pd.DataFrame(
                {"word": pdf["word"], "n_wp": n_wp, "n_unk": n_unk}
            )

    words_tbl = _word_freq(spark, sf_dir).select("word")
    encoded = words_tbl.mapInPandas(encode, schema="word string, n_wp long, n_unk long")
    word_len = encoded.withColumn("n_chr", F.length("word"))

    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    words = docs.select("doc_id", F.explode(toks).alias("word"))
    return (
        words.join(word_len, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_wp").alias("n_wp_tokens"),
            F.sum("n_unk").alias("n_unk_tokens"),
            F.round(F.sum("n_chr") / F.sum("n_wp"), 6).alias("compression"),
        )
    )


def _wordpiece_oracle(n_merges: int = N_MERGES) -> str:
    """Pieces from the unrolled trainer's final vocab; the greedy
    longest-match scan replayed as a recursive CTE (one step per emitted
    token; a piece longer than the remainder can't false-match because
    substr clamps, so equality with the full piece fails)."""
    return f"""
WITH RECURSIVE {_bpe_rounds_sql(n_merges)},
pieces AS MATERIALIZED (
  SELECT DISTINCT unnest(str_split(trim(pstr, '|'), '||')) AS p FROM v{n_merges}),
uw AS MATERIALIZED (SELECT DISTINCT word FROM w),
seg AS (
  -- the piece list rides along as a column: a correlated subquery over a
  -- chain-derived CTE evaluates EMPTY inside DuckDB's recursive member
  -- (verified), so the base case snapshots the bounded list once and the
  -- recursion references nothing outside its own rows
  SELECT word, 1 AS pos, 0 AS ntok, 0 AS nunk,
         (SELECT list(p) FROM pieces) AS ps
  FROM uw
  UNION ALL
  SELECT word, pos + greatest(bk, 1) AS pos, ntok + 1 AS ntok,
         nunk + CASE WHEN bk = 0 THEN 1 ELSE 0 END AS nunk, ps
  FROM (
    SELECT word, pos, ntok, nunk, ps,
           coalesce(list_max(list_transform(
             list_filter(ps, q -> q = substr(word, pos, len(q))),
             q -> len(q))), 0) AS bk
    FROM seg WHERE pos <= len(word))
),
wl AS MATERIALIZED (
  SELECT word, ntok AS n_wp, nunk AS n_unk, len(word) AS n_chr
  FROM seg WHERE pos = len(word) + 1),
dw AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS word
  FROM documents)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(wl.n_wp) AS BIGINT) AS n_wp_tokens,
       CAST(sum(wl.n_unk) AS BIGINT) AS n_unk_tokens,
       round(CAST(sum(wl.n_chr) AS DOUBLE) / sum(wl.n_wp), 6) AS compression
FROM dw JOIN wl USING (word)
GROUP BY doc_id
"""


QUERIES.append(
    QuerySpec("wordpiece_encode_stats", q_wordpiece_encode_stats, _wordpiece_oracle(), "greedy longest-match (WordPiece) encoding of the BPE piece inventory (recursive-CTE oracle)", ("tokenizer",))
)
