"""Text-analysis operators for training-data pipelines — all native Columns.

Language-ID, quality scoring, token counting, and fingerprinting over a text
column. Everything here is a pure Column expression (regex + higher-order
functions) — no Python UDFs — so a 100 TB documents scan stays inside
whole-stage codegen with filters pushed to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Deliberately small: the operator's job is the *Spark shape* of language
#: scoring (per-language token-hit counts → argmax), swap in real lexicons
#: for production.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "del"],
    "de": ["der", "die", "das", "und", "nicht", "ein", "eine", "ist", "zu", "mit"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for empty text).

    ``split(trim(x))`` can only emit an empty-string element when the input
    is all-whitespace (split("") → [""]), so ``array_remove(…, "")`` gives
    the empty-array-on-empty-text rule without a conditional branch — the
    ``when(length==0, …).otherwise(split(…))`` formulation measured ~7×
    slower at sf0.1 (both branches' trees evaluated per row)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: words + digits + punctuation as separate
    tokens (a BPE-flavored regex segmentation, cheap proxy for tokenizer
    budgeting at corpus scale)."""
    c = F.col(text) if isinstance(text, str) else text
    seg = F.regexp_replace(c, r"([0-9]|[^\sA-Za-z0-9])", r" $1 ")
    return F.size(tokens(seg)).cast("long")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (0.0 for empty text)."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )


def punct_ratio(text: Column | str) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    c = F.col(text) if isinstance(text, str) else text
    no_space = F.regexp_replace(c, r"\s", "")
    punct = F.regexp_replace(no_space, r"[A-Za-z0-9]", "")
    return F.when(F.length(no_space) == 0, F.lit(0.0)).otherwise(
        F.length(punct).cast("double") / F.length(no_space).cast("double")
    )


def mean_word_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks).cast("double")
    )


def quality_score(text: Column | str, lang: str = "en") -> Column:
    """Composite [0, 1] quality score: length, punctuation, stopword signals.

    A Gopher-rules-flavored heuristic: reasonable length (saturating at 200
    tokens), low punctuation density, and a healthy stopword ratio indicate
    natural prose. Weights are illustrative; the operator contract is the
    signal plumbing, not the constants.
    """
    n = token_count(text).cast("double")
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text, lang) * F.lit(4.0), F.lit(1.0))
    return (length_score * F.lit(0.4) + punct_score * F.lit(0.3) + stop_score * F.lit(0.3))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID via stopword-hit argmax + CJK detection.

    Scores each candidate language by stopword hits; a document whose
    characters are predominantly CJK short-circuits to ``zh``. Ties and
    zero-hit documents fall back to ``und``. Pure Column expr: the argmax is
    ``array_max`` over (score, lang) structs — struct comparison orders by
    score first, then lang, making ties deterministic.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.lower(c))
    scored = []
    for lang, words in LANG_STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
        scored.append(F.struct(hits.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    total_chars = F.length(F.regexp_replace(c, r"\s", ""))
    # cjk/total > 0.3 phrased multiplicatively: `&` does not short-circuit,
    # so a division here would throw under ANSI mode when total_chars = 0
    return (
        F.when(
            (total_chars > 0)
            & (cjk.cast("double") > F.lit(0.3) * total_chars.cast("double")),
            F.lit("zh"),
        )
        .when(best["score"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, punctuation stripped, whitespace collapsed). Stable across
    runs and engines — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm.cast("binary"))
