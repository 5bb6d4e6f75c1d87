"""BPE trainer correctness: the distributed trainer must reproduce an
independent pure-Python implementation of the Sennrich et al. algorithm
(dict-based, no Spark) exactly — merges, ranks, counts, and encoded
lengths — plus structural invariants."""

from __future__ import annotations

import re
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _reference_bpe(texts: list[str], n_merges: int):
    """Classic BPE on a word-frequency dict. Tie-break: (count desc,
    left asc, right asc) — the trainer's declared contract."""
    freq = Counter(
        w for t in texts for w in re.split(r"[^a-z0-9]+", t.lower()) if w
    )
    vocab = {w: [c for c in w] for w in freq}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        if not counts:
            break
        (left, right), count = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, count))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return freq, vocab, merges


def test_learned_merges_match_reference(spark):
    from jetstream_spark.queries.tokenizer import N_MERGES, q_bpe_learn_merges
    from jetstream_spark.tables import table

    texts = [r["text"] for r in table(spark, SF_DIR, "documents").collect()]
    _, _, expect = _reference_bpe(texts, N_MERGES)

    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in q_bpe_learn_merges(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect
    # sanity on the fixture: composition must occur (some merge consumes a
    # previously merged symbol), or the test proves nothing about ordering
    symbols = {l + r for l, r, _ in got}
    assert any(l in symbols or r in symbols for l, r, _ in got)


def test_encode_stats_match_reference(spark):
    from jetstream_spark.queries.tokenizer import N_MERGES, q_bpe_encode_stats
    from jetstream_spark.tables import table

    rows = table(spark, SF_DIR, "documents").collect()
    _, vocab, _ = _reference_bpe([r["text"] for r in rows], N_MERGES)

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in q_bpe_encode_stats(spark, SF_DIR).collect()
    }
    for r in rows:
        words = [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w]
        if not words:
            assert r["doc_id"] not in got
            continue
        expect = (len(words), sum(len(vocab[w]) for w in words))
        assert got[r["doc_id"]] == expect, r["doc_id"]


def test_merges_shrink_token_count(spark):
    """Each merge can only reduce (or keep) the corpus token count, and the
    final count must be strictly below the character count: compression
    really happened."""
    from jetstream_spark.queries.tokenizer import learn_bpe

    merges, vocab = learn_bpe(spark, SF_DIR)
    assert len(merges) > 0
    # the argmax count sequence is non-increasing: pairs created by a merge
    # inherit at most the merged pair's weighted count
    counts = [c for _, _, c in merges]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    from pyspark.sql import functions as F

    agg = vocab.select(
        F.sum(F.size("symbols") * F.col("freq")).alias("tokens"),
        F.sum(F.length("word") * F.col("freq")).alias("chars"),
    ).collect()[0]
    assert agg["tokens"] < agg["chars"]


def test_wordpiece_greedy_matches_pure_python(spark):
    """wordpiece_encode_stats == a pure-Python greedy longest-match over
    the same BPE piece inventory; and UNK never fires on this corpus
    (every single char survives as a piece)."""
    from jetstream_spark.queries.tokenizer import (
        learn_bpe,
        q_wordpiece_encode_stats,
    )
    from jetstream_spark.tables import table
    from tests.conftest import SF_DIR

    import re

    _, vocab = learn_bpe(spark, SF_DIR)
    pieces = {s for r in vocab.select("symbols").collect() for s in r["symbols"]}
    top = max(len(p) for p in pieces)

    def greedy(word):
        pos, toks, unks = 0, 0, 0
        while pos < len(word):
            k = min(top, len(word) - pos)
            while k > 0 and word[pos : pos + k] not in pieces:
                k -= 1
            pos += max(k, 1)
            unks += k == 0
            toks += 1
        return toks, unks

    expect = {}
    for r in table(spark, SF_DIR, "documents").select("doc_id", "text").collect():
        words = [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w]
        stats = [greedy(w) for w in words]
        n_wp = sum(t for t, _ in stats)
        expect[r["doc_id"]] = (
            len(words),
            n_wp,
            sum(u for _, u in stats),
            round(sum(len(w) for w in words) / n_wp, 6),
        )
    got = {
        r["doc_id"]: (r["n_words"], r["n_wp_tokens"], r["n_unk_tokens"], r["compression"])
        for r in q_wordpiece_encode_stats(spark, SF_DIR).collect()
    }
    assert got == expect
    assert all(u == 0 for _, _, u, _ in got.values())
