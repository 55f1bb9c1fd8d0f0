"""Unigram-LM tokenizer (Kudo 2018, arXiv:1804.10959 — the SentencePiece
default): EM-trained piece probabilities + Viterbi encoding. The third
member of the tokenizer family, completing the production set: BPE
(frequency merges, bpe.py), WordPiece (likelihood merges + greedy
longest-match, wordpiece.py), Unigram (probabilistic lattice).

Split of labor (the family pattern):

- **Corpus-scale pass (distributed)**: the word-frequency table
  (``bpe.word_counts``) — the sufficient statistic; shuffle carries
  (word, count), never documents.
- **Seed + EM + prune (driver, bounded)**: seed vocabulary = the
  ``seed_size`` highest ``count x length`` substrings of the count
  table (plus every single character, which is never pruned — the
  coverage floor); then alternate EM rounds (E: forward-backward
  expected piece counts over each word's segmentation lattice;
  M: renormalize) with prune rounds (drop the lowest-expected-count
  multi-char pieces, ``prune_frac`` at a time) until ``vocab_size``
  pieces remain, then a final EM polish.
- **Encode (distributed)**: per-word Viterbi (max log-prob
  segmentation) via Arrow-batched ``mapInPandas`` with the (piece →
  logp) dict broadcast and a per-batch word cache.

Determinism: EM iterates words and pieces in sorted order, so the
float accumulation order is fixed; Viterbi ties break toward the
LONGER piece ending at the position (then the DP is unique because
earlier positions resolved deterministically). Characters unseen in
training encode as themselves with a floor log-prob — coverage never
drops a word.

Oracle note: Viterbi is a max-sum DP with per-state argmax; DuckDB
1.0's recursive CTEs cannot carry a per-state aggregate (no USING KEY),
and enumerating all segmentations is exponential — so unlike
BPE-ENCODE (rank-order rewrite) and WP-ENCODE (single-path greedy
walk), UNIGRAM-ENCODE is checked rows-only by the driver and pinned
instead by pure-Python reference parity + property tests
(tests/test_unigram.py), the same tier as the xxhash/kmeans internals.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import word_counts

#: log-prob floor for characters unseen in training (coverage fallback)
UNSEEN_LOGP = -20.0


def _seed_vocab(
    counts: dict[str, int], seed_size: int, max_piece_len: int
) -> set[str]:
    """Seed pieces: every single char, plus the ``seed_size`` best
    multi-char substrings by count x length (the standard
    suffix-array-free approximation of SentencePiece's seeding)."""
    sub_score: Counter[str] = Counter()
    chars: set[str] = set()
    for w, n in counts.items():
        chars.update(w)
        L = len(w)
        for i in range(L):
            for j in range(i + 2, min(i + max_piece_len, L) + 1):
                sub = w[i:j]
                sub_score[sub] += n * len(sub)
    best = sorted(sub_score.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    return chars | {s for s, _ in best}


def _em_round(
    counts: dict[str, int], logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """One EM round: forward-backward expected piece counts over every
    word's lattice, then renormalized log-probs. Pieces and words are
    visited in sorted order — fixed float accumulation order."""
    expected: dict[str, float] = {}
    for w in sorted(counts):
        n = counts[w]
        L = len(w)
        # forward[i] = total prob of prefixes w[:i]; log-space sum
        fwd = [float("-inf")] * (L + 1)
        fwd[0] = 0.0
        for i in range(1, L + 1):
            for j in range(max(0, i - max_piece_len), i):
                p = logp.get(w[j:i])
                if p is not None and fwd[j] != float("-inf"):
                    fwd[i] = _logadd(fwd[i], fwd[j] + p)
        if fwd[L] == float("-inf"):
            continue  # word not coverable by current vocab (no chars?)
        bwd = [float("-inf")] * (L + 1)
        bwd[L] = 0.0
        for i in range(L - 1, -1, -1):
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                p = logp.get(w[i:j])
                if p is not None and bwd[j] != float("-inf"):
                    bwd[i] = _logadd(bwd[i], p + bwd[j])
        total = fwd[L]
        for i in range(L):
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                piece = w[i:j]
                p = logp.get(piece)
                if p is None:
                    continue
                if fwd[i] == float("-inf") or bwd[j] == float("-inf"):
                    continue
                gamma = math.exp(fwd[i] + p + bwd[j] - total)
                expected[piece] = expected.get(piece, 0.0) + n * gamma
    tot = sum(expected[k] for k in sorted(expected))
    return {k: math.log(v / tot) for k, v in expected.items() if v > 0}


def _logadd(a: float, b: float) -> float:
    if a == float("-inf"):
        return b
    if b == float("-inf"):
        return a
    hi, lo = (a, b) if a >= b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def unigram_train(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    seed_size: int = 1000,
    max_piece_len: int = 8,
    prune_frac: float = 0.25,
    min_count: int = 1,
    max_words: int = 1_000_000,
) -> list[tuple[str, float]]:
    """Train a Unigram-LM vocabulary → sorted ``[(piece, logp), ...]``.
    Single characters are never pruned (coverage floor); multi-char
    pieces are pruned lowest-expected-count-first, ``prune_frac`` per
    round, with EM re-estimation between rounds."""
    counts = {
        r["word"]: r["n"]
        for r in word_counts(df, text_col, min_count, max_words).collect()
        if r["word"]
    }
    return vocab_from_counts(
        counts, vocab_size, seed_size, max_piece_len, prune_frac
    )


def vocab_from_counts(
    counts: dict[str, int],
    vocab_size: int,
    seed_size: int = 1000,
    max_piece_len: int = 8,
    prune_frac: float = 0.25,
) -> list[tuple[str, float]]:
    """The bounded driver-side seed/EM/prune loop (see unigram_train)."""
    pieces = _seed_vocab(counts, seed_size, max_piece_len)
    # uniform init over the seed
    logp = {p: -math.log(len(pieces)) for p in pieces}
    logp = _em_round(counts, logp, max_piece_len) or logp
    while len(logp) > vocab_size:
        multi = sorted(
            (p for p in logp if len(p) > 1), key=lambda p: (logp[p], p)
        )
        n_drop = min(
            max(1, int(len(multi) * prune_frac)),
            max(0, len(logp) - vocab_size),
        )
        if not multi or n_drop == 0:
            break
        for p in multi[:n_drop]:
            del logp[p]
        logp = _em_round(counts, logp, max_piece_len) or logp
    logp = _em_round(counts, logp, max_piece_len) or logp
    return sorted(logp.items())


def viterbi_word(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> tuple[str, ...]:
    """Max-log-prob segmentation of one word. Unseen characters fall
    back to themselves at ``UNSEEN_LOGP``. Score ties break toward the
    LONGER piece ending at each position (deterministic)."""
    L = len(word)
    best = [float("-inf")] * (L + 1)
    back = [0] * (L + 1)
    best[0] = 0.0
    for i in range(1, L + 1):
        for k in range(1, min(i, max_piece_len) + 1):
            j = i - k
            piece = word[j:i]
            p = logp.get(piece)
            if p is None and k == 1:
                p = UNSEEN_LOGP
            if p is None or best[j] == float("-inf"):
                continue
            s = best[j] + p
            # strictly-greater keeps the longest k (scanned ascending)
            # only when it strictly wins; ties prefer the longer piece,
            # so use >= for larger k: scan k ascending and accept ties
            if s > best[i] or (s == best[i] and k > i - back[i]):
                best[i] = s
                back[i] = j
    out: list[str] = []
    i = L
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return tuple(reversed(out))


UNIGRAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ug_tokens", T.ArrayType(T.StringType())),
        T.StructField("n_ug_tokens", T.LongType()),
    ]
)


def unigram_encode(
    df: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
    parallelism: int | None = None,
) -> DataFrame:
    """Viterbi-encode documents with a trained vocabulary →
    ``(doc_id, ug_tokens, n_ug_tokens)``. Arrow-batched ``mapInPandas``;
    the (piece → logp) dict broadcasts once per executor; a per-batch
    word cache collapses the Zipf head (family pattern)."""
    from .text import tokens

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(F.lower(F.trim(F.col(text_col)))).alias("_toks"),
    )
    if parallelism:
        src = src.repartition(parallelism, "doc_id")
    bc = df.sparkSession.sparkContext.broadcast(dict(pieces))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        lp = bc.value
        cache: dict[str, tuple[str, ...]] = {}
        for pdf in batches:
            out = []
            for did, toks in zip(pdf["doc_id"], pdf["_toks"]):
                syms: list[str] = []
                for w in toks if toks is not None else []:
                    enc = cache.get(w)
                    if enc is None:
                        enc = viterbi_word(w, lp, max_piece_len)
                        cache[w] = enc
                    syms.extend(enc)
                out.append((did, syms, len(syms)))
            yield pd.DataFrame(
                out, columns=["doc_id", "ug_tokens", "n_ug_tokens"]
            )

    return src.mapInPandas(run, UNIGRAM_SCHEMA)
