"""Hashed-n-gram linear text classifier — model-based quality/domain
filtering, the fastText-shaped signal (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification") trained with the
log-count-ratio weights of Wang & Manning 2012 (the "NBSVM" linear
baseline, closed-form — no SGD, so the whole TRAIN pass is two
relational aggregations and every run is bit-deterministic).

Pipeline role: LLM corpora are routinely gated by a *linear classifier
over hashed word n-grams* — CCNet/fastText language filters, the
GPT-3/LLaMA "looks like the reference corpus" quality classifiers, and
domain routers all share this exact shape. A trained-embedding fastText
(dense dim-d vectors + softmax, SGD) is out of scope for a pure engine;
the hashing-trick log-odds model exercises the identical distributed
dataflow — feature explosion, bounded weight table, broadcast scoring —
with closed-form training the DuckDB oracle can replay bit-for-bit.

Model (binary, label ∈ {0,1}):

- Features of a document: lowercase-free whitespace tokens (the family
  tokenizer) plus adjacent word bigrams (fastText ``wordNgrams=2``),
  WITH multiplicity, each hashed to one of ``num_buckets`` buckets via
  the engine-portable md5-prefix hash (the corpus-family idiom: first 8
  hex chars as a 32-bit integer, mod B).
- TRAIN: per bucket, count feature occurrences in positive vs negative
  documents; the weight is the Laplace-smoothed log-count-ratio

      w_b = ln((pos_b + a) / (POS + a*B)) - ln((neg_b + a) / (NEG + a*B))

  with ``a = 1``, POS/NEG the total feature mass per class. Buckets
  never seen in training score the shared default weight (pos_b =
  neg_b = 0 in the same formula); the bias is the document-count prior
  ``ln((n_pos + a) / (n_neg + a))``.
- SCORE: logit(doc) = bias + sum over feature occurrences of w_b;
  predict positive when logit >= 0 (sigmoid >= 0.5).

Determinism / oracle contract: every weight is rounded to nano units
(``*1e9 -> BIGINT``) at the point it leaves ``ln`` — the only float
surface, 1-ulp absorbed by the rounding (the LM-SCORE precedent) — and
per-document logits are exact BIGINT sums of those integers, so the
result is independent of partitioning and join order and hash-matches
the DuckDB replay.

100 TB posture:
- TRAIN shuffles ``(bucket, partial counts)`` — map-side combined,
  bounded by B buckets after the combine; documents never shuffle.
- The weight table is ≤ B rows by construction → broadcast; scoring is
  explode → broadcast-join → per-doc sum, whose shuffle carries one
  ``(doc_id, partial_sum)`` row per document per map partition. No
  corpus-wide wide rows, no skew surface (bucket skew lands in the
  map-side combine).
- The 1-row constant frame (totals/bias) attaches by the allowlisted
  1-row broadcast cross join, once per document row, after the per-doc
  aggregate.

The k-class one-vs-rest router (``train_router`` / ``route_score``)
extends the same machinery to language-ID / domain-routing: one feature
explosion trains all k models (the (bucket, class) count table yields
every class's pos/neg counts by complement), the dense ≤B×k weight
table broadcasts, and scoring argmaxes k exact integer logits per doc
with a margin (winner − runner-up) as the abstain signal.

Reference parity: the reference engine has no classifier layer (its
text handling is field mapping, /root/reference/etl.js:127-199); this
extends the training-pipeline mandate alongside LM-SCORE and DSIR.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: Laplace smoothing mass per bucket (Wang & Manning 2012 use 1).
ALPHA = 1.0

#: nano scale for ln() outputs (LM-SCORE precedent: exact BIGINT sums).
_SCALE = 1_000_000_000


class LinearTextModel(NamedTuple):
    """A trained hashed-n-gram log-odds model.

    ``weights``: (bucket long, w_e9 long) — ≤ num_buckets rows, broadcast
    range by construction. ``consts``: ONE row (bias_e9 long,
    w_default_e9 long, num_buckets int, word_ngrams int) — the scoring
    constants plus the feature-space shape scoring must reuse.
    ``num_buckets``/``word_ngrams`` ride as plain ints too (same values
    as the consts row, set by the trainer) so scoring can resolve the
    feature space LAZILY — no 1-row collect at plan-build time — and
    fail fast on a caller-supplied mismatch instead of silently
    re-hashing into a different space.

    REHYDRATION: a model rebuilt from persisted frames must come through
    :meth:`from_frames`, which reads the true training shape out of the
    consts row — constructing the tuple directly from loaded frames
    leaves the ints at their defaults and silently scores in the wrong
    hashed feature space when training used a non-default shape."""

    weights: DataFrame
    consts: DataFrame
    num_buckets: int = 4096
    word_ngrams: int = 2

    @classmethod
    def from_frames(cls, weights: DataFrame, consts: DataFrame):
        """Rehydrate from persisted (weights, consts) frames, populating
        the feature-space ints from the consts row (ONE driver-side
        collect of a 1-row frame — load time, not plan-build time)."""
        return cls(
            weights=weights,
            consts=consts,
            **_shape_from_consts(consts),
        )


def _shape_from_consts(consts: DataFrame) -> dict:
    """Training shape out of a persisted consts frame (the authoritative
    record — the trainer stamps num_buckets/word_ngrams into every row).
    Raises when the frame predates the shape columns or is empty: a
    guessed default is exactly the silent feature-space mismatch this
    loader exists to prevent."""
    if not {"num_buckets", "word_ngrams"} <= set(consts.columns):
        raise ValueError(
            "consts frame carries no num_buckets/word_ngrams columns — "
            "retrain, or construct the model with the training shape "
            "passed explicitly"
        )
    rows = consts.select("num_buckets", "word_ngrams").limit(1).collect()
    if not rows:
        raise ValueError("consts frame is empty; cannot resolve the "
                         "training feature-space shape")
    return {
        "num_buckets": int(rows[0]["num_buckets"]),
        "word_ngrams": int(rows[0]["word_ngrams"]),
    }


def _resolve_shape(
    model_buckets: int,
    model_ngrams: int,
    num_buckets: int | None,
    word_ngrams: int | None,
) -> tuple[int, int]:
    """The scoring feature space is the MODEL's; an explicit caller value
    is only accepted when it agrees (mismatch = meaningless logits)."""
    if num_buckets is not None and num_buckets != model_buckets:
        raise ValueError(
            f"num_buckets={num_buckets} disagrees with the model's "
            f"training shape ({model_buckets}); scoring in a different "
            "hashed feature space produces plausible-looking garbage"
        )
    if word_ngrams is not None and word_ngrams != model_ngrams:
        raise ValueError(
            f"word_ngrams={word_ngrams} disagrees with the model's "
            f"training shape ({model_ngrams})"
        )
    return model_buckets, model_ngrams


def hash_bucket(col: Column, num_buckets: int) -> Column:
    """Engine-portable feature hash: first 8 md5 hex chars as a 32-bit
    integer, mod ``num_buckets`` (the corpus-family md5-prefix idiom —
    DuckDB replays it as ``CAST(('0x' || substr(md5(f),1,8)) AS
    BIGINT)``). Uniform enough for feature hashing and, unlike
    xxhash64, available bit-identically in both engines."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(num_buckets).cast("long")
    )


def _features(ws_name: str, word_ngrams: int) -> Column:
    """array<string> of unigrams + adjacent word n-grams up to
    ``word_ngrams`` over the token-array column ``ws_name``,
    multiplicity preserved (fastText's feature bag)."""
    out = F.col(ws_name)
    for n in range(2, word_ngrams + 1):
        if n == 2:
            # two staggered slices zipped; greatest(...,0) keeps the
            # slice length legal for 0/1-token docs (empty result)
            grams = F.expr(
                f"zip_with(slice({ws_name}, 1, greatest(size({ws_name}) - 1, 0)), "
                f"slice({ws_name}, 2, greatest(size({ws_name}) - 1, 0)), "
                "(a, b) -> concat(a, ' ', b))"
            )
        else:
            # guard the sequence: sequence(1, stop) DESCENDS when
            # stop < 1, so short docs must short-circuit to empty
            grams = F.when(
                F.size(F.col(ws_name)) >= n,
                F.expr(
                    f"transform(sequence(1, size({ws_name}) - {n - 1}), "
                    f"i -> array_join(slice({ws_name}, i, {n}), ' '))"
                ),
            ).otherwise(F.expr("array()").cast("array<string>"))
        out = F.concat(out, grams)
    return out


def _exploded(
    docs: DataFrame, text_col: str, id_col: str, word_ngrams: int, extra: list[str]
) -> DataFrame:
    """(id, *extra, feature string), one row per feature OCCURRENCE —
    zero-feature docs vanish here and are settled by the caller."""
    return docs.select(
        id_col, *extra, tokens(text_col).alias("_cfws")
    ).select(id_col, *extra, F.explode(_features("_cfws", word_ngrams)).alias("f"))


def train_log_odds(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    word_ngrams: int = 2,
    cache=None,
) -> LinearTextModel:
    """Closed-form training pass: two aggregations over the labeled
    frame. ``label_col`` must be int/boolean-ish (1/true = positive).

    The bucket shuffle carries map-side-combined partial counts (≤ B
    rows per map partition); totals and the bias reduce to one row.

    ``cache`` (a ``plans.compose.StageCache``) persists the per-bucket
    count table — ≤ B rows, trivially cached — so the training feature
    explosion runs ONCE: ``weights`` and ``consts`` both re-reference
    the counts subtree, and Spark shares no common subplans, so the
    uncached plan re-explodes the labeled corpus three times (measured:
    4 Generate nodes → 2 with the cache). Callers own the release —
    tie it to their terminal frame via ``release_when_unreachable``."""
    lab = F.col(label_col).cast("int")
    feats = _exploded(
        docs.withColumn("_cflab", lab), text_col, id_col, word_ngrams, ["_cflab"]
    ).withColumn("bucket", hash_bucket(F.col("f"), num_buckets))

    counts = feats.groupBy("bucket").agg(
        F.sum("_cflab").cast("long").alias("pos_c"),
        (F.count(F.lit(1)) - F.sum("_cflab")).cast("long").alias("neg_c"),
    )
    if cache is not None:
        counts = cache(counts)
    totals = counts.agg(
        F.coalesce(F.sum("pos_c"), F.lit(0)).cast("long").alias("pos_tot"),
        F.coalesce(F.sum("neg_c"), F.lit(0)).cast("long").alias("neg_tot"),
    )
    docs_tot = docs.agg(
        F.sum(lab).cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum(lab)).cast("long").alias("n_neg"),
    )

    aB = float(ALPHA) * num_buckets

    def w_expr(pos_c: Column, neg_c: Column) -> Column:
        return F.round(
            (
                F.log((pos_c + F.lit(ALPHA)) / (F.col("pos_tot") + F.lit(aB)))
                - F.log((neg_c + F.lit(ALPHA)) / (F.col("neg_tot") + F.lit(aB)))
            )
            * _SCALE
        ).cast("long")

    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket", w_expr(F.col("pos_c"), F.col("neg_c")).alias("w_e9")
    )
    consts = totals.crossJoin(F.broadcast(docs_tot)).select(
        F.round(
            F.log(
                (F.col("n_pos") + F.lit(ALPHA)) / (F.col("n_neg") + F.lit(ALPHA))
            )
            * _SCALE
        )
        .cast("long")
        .alias("bias_e9"),
        w_expr(F.lit(0), F.lit(0)).alias("w_default_e9"),
        F.lit(num_buckets).alias("num_buckets"),
        F.lit(word_ngrams).alias("word_ngrams"),
    )
    return LinearTextModel(
        weights=weights, consts=consts,
        num_buckets=num_buckets, word_ngrams=word_ngrams,
    )


def classifier_score(
    docs: DataFrame,
    model: LinearTextModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    word_ngrams: int | None = None,
) -> DataFrame:
    """Score every document: (id, n_feat, logit_e9, logit, pred).

    The feature space (``num_buckets``/``word_ngrams``) is read from
    the MODEL; passing explicit values is allowed only when they agree
    with training (a silent mismatch re-hashes into a different space
    and produces meaningless logits — ValueError instead). Docs with no
    features score the bare bias. ``logit_e9`` is the exact BIGINT
    nano-logit; ``logit`` the derived double; ``pred`` true at
    logit >= 0 (sigmoid ≥ 0.5)."""
    num_buckets, word_ngrams = _resolve_shape(
        model.num_buckets, model.word_ngrams, num_buckets, word_ngrams
    )
    feats = _exploded(docs, text_col, id_col, word_ngrams, []).withColumn(
        "bucket", hash_bucket(F.col("f"), num_buckets)
    )
    # unseen-bucket occurrences count as _miss and settle against the
    # default weight AFTER the per-doc fold — keeps the broadcast join
    # side ≤ B rows and the constant row out of the per-feature path
    per_doc = (
        feats.join(F.broadcast(model.weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feat"),
            F.coalesce(F.sum("w_e9"), F.lit(0)).cast("long").alias("_s_known"),
            F.sum(F.when(F.col("w_e9").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("_n_miss"),
        )
    )
    out = (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(model.consts.select("bias_e9", "w_default_e9")))
        .select(
            id_col,
            F.coalesce(F.col("n_feat"), F.lit(0)).cast("long").alias("n_feat"),
            (
                F.coalesce(F.col("_s_known"), F.lit(0))
                + F.coalesce(F.col("_n_miss"), F.lit(0)) * F.col("w_default_e9")
                + F.col("bias_e9")
            )
            .cast("long")
            .alias("logit_e9"),
        )
        .withColumn("logit", F.col("logit_e9").cast("double") / _SCALE)
        .withColumn("pred", F.col("logit_e9") >= 0)
    )
    return out


class RouterModel(NamedTuple):
    """A trained k-class one-vs-rest router over the same hashed
    feature space.

    ``dense``: (bucket long, cls string, w_e9 long) — one weight per
    TRAINING-SEEN bucket per class, ≤ num_buckets × k rows → broadcast
    range for the small class counts routers serve (languages, domains,
    source registries). ``consts``: k rows (cls, bias_e9, w_def_e9,
    num_buckets, word_ngrams) — per-class prior, unseen-bucket weight,
    and the training feature-space shape stamped into every row. The
    shape rides as plain ints too (see :class:`LinearTextModel`);
    rehydrate persisted frames through :meth:`from_frames`."""

    dense: DataFrame
    consts: DataFrame
    num_buckets: int = 4096
    word_ngrams: int = 2

    @classmethod
    def from_frames(cls, dense: DataFrame, consts: DataFrame):
        """Rehydrate from persisted (dense, consts) frames, populating
        the feature-space ints from the consts rows (k-row frame, one
        driver-side collect at load time)."""
        return cls(dense=dense, consts=consts, **_shape_from_consts(consts))


def train_router(
    docs: DataFrame,
    class_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    word_ngrams: int = 2,
    cache=None,
) -> RouterModel:
    """One-vs-rest log-count-ratio training for a k-class router
    (language ID / domain routing / source attribution — the fastText
    supervised setting with k labels, Joulin et al. 2016 §2).

    ONE feature explosion feeds every class: the (bucket, class) count
    table gives, for class c, pos = cnt(b,c) and neg = bucket_total(b)
    - cnt(b,c), with class/complement feature masses from the same
    aggregate — k models for the price of one shuffle. ``cache``
    persists that count table (≤ B×k rows) so the dense-weight,
    per-class-total, and grand-total branches don't re-explode the
    corpus (the binary trainer's lesson).

    Rows with NULL ``class_col`` are excluded from training (no class
    to credit); NULL never becomes a routable label."""
    labeled = docs.where(F.col(class_col).isNotNull()).withColumn(
        "_cfcls", F.col(class_col).cast("string")
    )
    feats = _exploded(labeled, text_col, id_col, word_ngrams, ["_cfcls"]).withColumn(
        "bucket", hash_bucket(F.col("f"), num_buckets)
    )
    cnt = feats.groupBy("bucket", "_cfcls").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    if cache is not None:
        cnt = cache(cnt)
    from pyspark.sql import Window

    btot = cnt.groupBy("bucket").agg(F.sum("c").cast("long").alias("bt"))
    # grand totals ride as unpartitioned window sums over the k-row
    # class frames instead of separate aggregate branches — Spark shares
    # no common subplans, so a dedicated .agg() branch would re-derive
    # (and re-scan) its whole subtree
    wall = Window.partitionBy()
    ctot = cnt.groupBy("_cfcls").agg(
        F.sum("c").cast("long").alias("tc")
    ).withColumn("al", F.sum("tc").over(wall).cast("long"))
    classes = labeled.groupBy("_cfcls").agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    ).withColumn("n_all", F.sum("n_c").over(wall).cast("long"))

    aB = float(ALPHA) * num_buckets
    cls = (
        classes.join(ctot, "_cfcls", "left")
        .withColumn("tc", F.coalesce("tc", F.lit(0)))
        # a class whose docs have no features misses ctot's al too:
        # backfill from any sibling row (al is constant across rows)
        .withColumn(
            "al", F.coalesce(F.max("al").over(wall), F.lit(0)).cast("long")
        )
    )
    consts = cls.select(
        F.col("_cfcls").alias("cls"),
        F.round(
            F.log(
                (F.col("n_c") + F.lit(ALPHA))
                / (F.col("n_all") - F.col("n_c") + F.lit(ALPHA))
            )
            * _SCALE
        )
        .cast("long")
        .alias("bias_e9"),
        F.round(
            (
                F.log(F.lit(ALPHA) / (F.col("tc") + F.lit(aB)))
                - F.log(F.lit(ALPHA) / (F.col("al") - F.col("tc") + F.lit(aB)))
            )
            * _SCALE
        )
        .cast("long")
        .alias("w_def_e9"),
        F.lit(num_buckets).alias("num_buckets"),
        F.lit(word_ngrams).alias("word_ngrams"),
    )
    # dense grid: every training-seen bucket × every class, missing
    # (bucket, class) pairs scoring cnt=0 through the same formula —
    # a ≤B-row × k-row product (broadcast the class table), then a
    # hash left join back to the real counts
    dense = (
        btot.crossJoin(F.broadcast(cls.select("_cfcls", "tc", "al")))
        .join(cnt, ["bucket", "_cfcls"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .select(
            "bucket",
            F.col("_cfcls").alias("cls"),
            F.round(
                (
                    F.log(
                        (F.col("c") + F.lit(ALPHA)) / (F.col("tc") + F.lit(aB))
                    )
                    - F.log(
                        (F.col("bt") - F.col("c") + F.lit(ALPHA))
                        / (F.col("al") - F.col("tc") + F.lit(aB))
                    )
                )
                * _SCALE
            )
            .cast("long")
            .alias("w_e9"),
        )
    )
    return RouterModel(
        dense=dense, consts=consts,
        num_buckets=num_buckets, word_ngrams=word_ngrams,
    )


def route_score(
    docs: DataFrame,
    router: RouterModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    word_ngrams: int | None = None,
) -> DataFrame:
    """Route every document to its argmax class:
    (id, n_feat, cls, logit_e9, margin_e9).

    Per doc per class, logit = bias_c + Σ_known w_c(bucket) +
    n_miss × w_def_c; the winner is max logit with class-asc
    tie-break. ``margin_e9`` = winner minus runner-up (NULL for a
    single-class router) — the abstain/confidence signal a routing
    gate thresholds on. The dense table (≤ B×k rows) and the k-row
    constants broadcast; the only corpus-sized shuffles are keyed by
    (id) and (id, class).

    ONE feature explosion: every training-seen bucket matches all k
    dense rows, so the per-(id, class) aggregate's occurrence count is
    the per-doc SEEN count for free, and the total feature count is
    analytic in the token count (Σ_n max(|tokens|−n+1, 0)) — no second
    explode-and-count pass over the corpus.

    Feature-space shape resolves from the ROUTER (explicit values must
    agree with training — see :func:`classifier_score`)."""
    num_buckets, word_ngrams = _resolve_shape(
        router.num_buckets, router.word_ngrams, num_buckets, word_ngrams
    )
    feats = _exploded(docs, text_col, id_col, word_ngrams, []).withColumn(
        "bucket", hash_bucket(F.col("f"), num_buckets)
    )
    known = (
        feats.join(F.broadcast(router.dense), "bucket")
        .groupBy(id_col, "cls")
        .agg(
            F.coalesce(F.sum("w_e9"), F.lit(0)).cast("long").alias("_s_known"),
            F.count(F.lit(1)).cast("long").alias("_n_seen"),
        )
    )
    sz = F.coalesce(F.size(tokens(text_col)), F.lit(0))
    n_feat = sum(
        (F.greatest(sz - F.lit(n - 1), F.lit(0)) for n in range(1, word_ngrams + 1)),
        F.lit(0),
    )
    grid = (
        docs.select(id_col, n_feat.cast("long").alias("n_feat"))
        .crossJoin(
            F.broadcast(router.consts.select("cls", "bias_e9", "w_def_e9"))
        )
        .join(known, [id_col, "cls"], "left")
        .select(
            id_col,
            "cls",
            "n_feat",
            (
                F.coalesce(F.col("_s_known"), F.lit(0))
                + (F.col("n_feat") - F.coalesce(F.col("_n_seen"), F.lit(0)))
                * F.col("w_def_e9")
                + F.col("bias_e9")
            )
            .cast("long")
            .alias("logit_e9"),
        )
    )
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.desc("logit_e9"), F.asc("cls"))
    ranked = grid.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_next", F.lead("logit_e9").over(w)
    )
    return ranked.where(F.col("_rn") == 1).select(
        id_col,
        "n_feat",
        "cls",
        "logit_e9",
        (F.col("logit_e9") - F.col("_next")).cast("long").alias("margin_e9"),
    )
