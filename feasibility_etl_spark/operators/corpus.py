"""Corpus-management operators: deterministic splits, shard packing,
benchmark decontamination.

The last mile of a training-data pipeline (after dedup/quality/near-dup
pruning): carve the corpus into train/val/test, pack documents into
token-budgeted shards for the data loader, and strip anything that overlaps
the evaluation benchmarks. All pure DataFrame/Column formulations chosen
for the 100 TB posture:

- **split**: stateless per-row hash — no shuffle at all, embarrassingly
  parallel, stable across runs and engines.
- **packing**: cumulative sums windowed *within hash buckets*, never a
  global single-partition sort; shards are bucket-local so the window
  shuffle spreads over ``num_buckets`` × executors.
- **decontamination**: the n-gram semi-join broadcasts the (small) eval
  side; the corpus-sized exploded shingle stream never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import shingles

#: Affine-hash parameters for the deterministic split. A Knuth-style
#: multiplicative mix mod a prime — NOT for adversarial inputs, but
#: well-mixed for sequential ids and (unlike xxhash64) computable verbatim
#: by any ANSI-SQL oracle: ((id % M) * A + B) % M stays under 2^63.
SPLIT_MOD = 1_000_000_007
SPLIT_MUL = 2_654_435_761 % SPLIT_MOD
SPLIT_ADD = 104_729


def split_bucket(id_col: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic [0, buckets) bucket for a numeric id column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    mixed = (c.cast("long") % SPLIT_MOD) * F.lit(SPLIT_MUL) + F.lit(SPLIT_ADD)
    return (mixed % SPLIT_MOD) % buckets


def split_corpus(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Assign every row to a named split by deterministic id hash.

    ``weights`` maps split name → fraction (must sum to ~1; the last split
    absorbs rounding). Hash-based, so membership is stable under corpus
    growth — adding documents never moves an existing document between
    splits, which re-sampling by row_number cannot guarantee. Zero shuffle:
    the plan is a scan + project.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_bucket(id_col, buckets)
    names = list(weights)
    expr: Column | None = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)


def pack_shards(
    df: DataFrame,
    token_col: str,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> DataFrame:
    """Greedy token-budget shard assignment → adds ``shard_id``.

    Documents are routed to ``num_buckets`` hash buckets (stateless), then
    greedily packed in deterministic id order within each bucket: a doc
    joins the shard its first token lands in (shards may overflow by at
    most one document — the standard data-loader contract). The running
    token sum is a window over (bucket, id) — the only shuffle, and it
    carries bucket-sized partitions, never a global sort. Shard ids are
    ``bucket * 2^40 + local`` so they are globally unique and reveal their
    bucket for debugging.
    """
    bucket = (F.col(id_col).cast("long") % num_buckets).alias("_bucket")
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    local = F.floor((cum - F.col(token_col)) / tokens_per_shard)
    return (
        df.withColumn("_bucket", bucket)
        .withColumn("shard_id", F.col("_bucket") * F.lit(1 << 40) + local)
        .drop("_bucket")
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Remove training documents that share any word ``ngram``-gram with the
    evaluation set (and the eval docs themselves) — benchmark-contamination
    scrubbing.

    Both sides shingle with the dedup normalization (documents shorter than
    ``ngram`` words contribute their whole text, so verbatim short overlaps
    still count). The eval side is benchmark-sized → its distinct shingles
    are broadcast; the corpus-side exploded shingles stream through the
    broadcast semi-join without shuffling, and the final anti-join carries
    only contaminated ids. ``ngram`` = 8 is the common LM-eval convention
    (e.g. GPT-3 appendix C uses 13-grams on sub-words; 8 words ≈ same
    horizon).
    """
    sh = F.explode(F.array_distinct(shingles(F.col(text_col), n=ngram))).alias("sh")
    eval_sh = eval_docs.select(sh).distinct()
    doc_sh = docs.select(F.col(id_col), sh)
    contaminated = (
        doc_sh.join(F.broadcast(eval_sh), "sh", "left_semi").select(id_col).distinct()
    )
    eval_ids = eval_docs.select(id_col)
    return docs.join(contaminated, id_col, "left_anti").join(
        eval_ids, id_col, "left_anti"
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    token_col: str,
    source_col: str = "source",
    id_col: str = "doc_id",
    shuffle: bool = True,
) -> DataFrame:
    """Domain-weighted subsample to a token budget — training-data mixing.

    Given target mixture ``weights`` (e.g. ``{"web": 0.6, "code": 0.3,
    "wiki": 0.1}``) and a ``total_tokens`` budget, keep documents so each
    listed source contributes ``weight/sum(weights) * total_tokens`` tokens
    (sources not listed are dropped — weight 0). Selection is the doc whose
    *cumulative-before* token count is still under the source's budget, so
    each source overshoots by at most one document — the same boundary
    contract as :func:`pack_shards`. A source smaller than its budget
    contributes everything it has (undersampling only; epoch-style
    upsampling is the data loader's job).

    ``shuffle=True`` (default) orders selection by ``md5(id)`` — a
    deterministic, engine-portable shuffle so the kept subset is an
    unbiased sample of the source rather than a temporal prefix (ids
    usually correlate with crawl time). ``False`` keeps plain id order
    (reproducing a prefix snapshot). Either way the plan is one broadcast
    of the tiny budget table plus ONE window shuffle partitioned by
    source; per-source skew is bounded because the window carries only
    that source's rows.
    """
    spark = df.sparkSession
    total_w = sum(weights.values())
    budgets = spark.createDataFrame(
        [(s, total_tokens * w / total_w) for s, w in weights.items()],
        f"{source_col} string, _budget double",
    )
    order = F.md5(F.col(id_col).cast("string")) if shuffle else F.col(id_col)
    w_cum = (
        Window.partitionBy(source_col)
        .orderBy(order, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(F.col(token_col)).over(w_cum) - F.col(token_col)
    return (
        df.join(F.broadcast(budgets), source_col)
        .withColumn("_cum_before", cum_before)
        .where(F.col("_cum_before") < F.col("_budget"))
        .drop("_cum_before", "_budget")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float | dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exact-fraction stratified sample: within each stratum,
    order rows by ``md5(id)`` (a seedless, engine-portable shuffle) and
    keep the first ``ceil(fraction * n)`` — so every stratum is represented
    at exactly its target rate, unlike ``df.sample`` whose per-stratum
    counts are binomial noise. ``fraction`` is one rate, or a per-stratum
    dict (unlisted strata → dropped).

    Plan shape: ONE window shuffle partitioned by stratum serves both the
    stratum count and the rank — no second pass, no driver-side count map.
    Scale note: the per-stratum sort bounds throughput on mega-strata; when
    exactness isn't required at that size, ``df.sampleBy`` (hash-based,
    approximate) is the cheaper tier — this operator is the reproducible /
    auditable one (re-runs and engines agree row-for-row).
    """
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w_rank = Window.partitionBy(strata_col).orderBy(*order)
    w_all = Window.partitionBy(strata_col)
    if isinstance(fraction, dict):
        frac = F.create_map(
            *[F.lit(x) for kv in fraction.items() for x in kv]
        )[F.col(strata_col)]
    else:
        frac = F.lit(float(fraction))
    return (
        df.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .where(F.col("_rn") <= F.ceil(frac * F.col("_n")))
        .drop("_rn", "_n")
    )


def _spfhp_strategies(
    hist: dict[int, int], max_seq_len: int
) -> list[tuple[tuple[int, ...], int]]:
    """Shortest-pack-first histogram-packing (Krell et al. 2021,
    arXiv:2107.02027 §4.1): given ``length → count``, return
    ``[(pattern, n_occurrences)]`` where each pattern is a descending
    tuple of lengths with ``sum(pattern) <= max_seq_len``. Operates on
    the histogram only — cost is O(max_seq_len²) regardless of corpus
    size, which is what makes a driver-side solve legitimate at 100 TB.
    """
    # open pack groups: (remaining, pattern) -> count
    open_groups: dict[tuple[int, tuple[int, ...]], int] = {}
    closed: dict[tuple[int, ...], int] = {}
    for length in sorted(hist, reverse=True):
        n = hist[length]
        while n > 0:
            fits = [
                (rem, pat)
                for (rem, pat) in open_groups
                if length <= rem
            ]
            if fits:
                rem, pat = min(fits)  # shortest remaining space first
                take = min(n, open_groups[(rem, pat)])
                _shrink(open_groups, (rem, pat), take)
                new_key = (rem - length, pat + (length,))
                if new_key[0] == 0:
                    closed[new_key[1]] = closed.get(new_key[1], 0) + take
                else:
                    open_groups[new_key] = open_groups.get(new_key, 0) + take
                n -= take
            else:
                # No open pack fits, so every remaining sequence of this
                # length lands in fresh packs of the same shape; the bulk
                # formula below is exactly what placing them one at a
                # time (fill the freshest pack until full, then open the
                # next) would produce, in O(1) instead of O(n).
                per = max_seq_len // length
                full, part = divmod(n, per)
                if full:
                    key = (max_seq_len - per * length, (length,) * per)
                    if key[0] == 0:
                        closed[key[1]] = closed.get(key[1], 0) + full
                    else:
                        open_groups[key] = open_groups.get(key, 0) + full
                if part:
                    key = (max_seq_len - part * length, (length,) * part)
                    open_groups[key] = open_groups.get(key, 0) + 1
                n = 0
    for (rem, pat), cnt in open_groups.items():
        closed[pat] = closed.get(pat, 0) + cnt
    return sorted(closed.items())


def _shrink(groups: dict, key: tuple, by: int) -> None:
    left = groups[key] - by
    if left:
        groups[key] = left
    else:
        del groups[key]


def pack_sequences(
    df: DataFrame,
    token_col: str,
    max_seq_len: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Padding-minimizing training-sequence packing → adds ``pack_id``
    (long) and ``pack_slot`` (int): which fixed-length training sequence
    each document lands in, such that each pack's token total stays
    ≤ ``max_seq_len`` and the number of packs (and thus padding) is near
    the bin-packing optimum — Krell et al. 2021 report ≥99% of optimal
    for shortest-pack-first histogram-packing vs ~80% efficiency for
    greedy packing.

    Unlike :func:`pack_shards` (token-BUDGET sharding where overflow by
    one doc is fine), training packs are HARD-capped: a transformer
    batch row has exactly ``max_seq_len`` positions and every unused one
    is padding compute. Documents longer than ``max_seq_len`` count as
    ``max_seq_len`` and therefore get a dedicated pack each — chunk them
    first (``chunk_documents``) if they should be split instead.

    Scale shape: the packing problem is solved ONCE, driver-side, on the
    length histogram (≤ ``max_seq_len`` rows — a bounded collect, the
    same tier as a broadcast-dim read); documents then route to their
    pack arithmetically: rank within length (one window shuffle) + a
    broadcast slot-range table → ``pack_id`` with no further shuffle. No
    assignment state ever lives on the driver.
    """
    l_eff = F.least(F.col(token_col), F.lit(max_seq_len)).cast("int")
    with_len = df.withColumn("_l", l_eff)
    hist = {
        r._l: r.n
        for r in with_len.groupBy("_l").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    strategies = _spfhp_strategies(hist, max_seq_len)
    # Per-pattern occurrence ranges → per-(length, slot) rank windows:
    # docs of length l, ranked deterministically within l, fill the slot
    # list [(pattern, slot)] in fixed pattern order; pack_id = the
    # pattern's pack base + (rank - slot range start).
    spark = df.sparkSession
    rows = []
    pack_base = 0
    rank_cursor: dict[int, int] = {}
    for pat, n_occ in strategies:
        for slot, length in enumerate(pat):
            lo = rank_cursor.get(length, 0)
            rows.append((length, slot, lo, lo + n_occ, pack_base))
            rank_cursor[length] = lo + n_occ
        pack_base += n_occ
    slots = spark.createDataFrame(
        rows, "_l int, pack_slot int, _lo long, _hi long, _base long"
    )
    w = Window.partitionBy("_l").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    ranked = with_len.withColumn("_r", F.row_number().over(w) - 1)
    return (
        ranked.join(
            F.broadcast(slots),
            (ranked["_l"] == slots["_l"])
            & (F.col("_r") >= F.col("_lo"))
            & (F.col("_r") < F.col("_hi")),
        )
        .withColumn("pack_id", F.col("_base") + (F.col("_r") - F.col("_lo")))
        .drop("_l", "_r", "_lo", "_hi", "_base")
    )


#: DSIR hashed-feature space size. 2^12 buckets keeps the weight table
#: broadcast-sized at ANY corpus scale (the table has one row per bucket,
#: not per gram) while the paper reports diminishing returns past ~10^4.
DSIR_BUCKETS = 4096

#: Per-bucket log10 weights are rounded to nano units and summed as exact
#: BIGINTs (the emb_centroids / LM precedent) — per-doc totals are
#: independent of partitioning and float order.
_DSIR_SCALE = 1_000_000_000


def _hashed_gram_features(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Bag of hashed word uni+bigrams → ``(id_col, bucket)`` with
    multiplicity. The hash is md5-prefix-based so any ANSI engine
    reproduces it verbatim (xxhash64 would be Spark-only)."""
    from .text import tokens

    toks = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_ws")
    )
    unis = toks.select(id_col, F.explode("_ws").alias("f"))
    bis = toks.where(F.size("_ws") >= 2).select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("_ws"), 1, F.size("_ws") - 1),
                F.slice(F.col("_ws"), 2, F.size("_ws") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("f"),
    )
    feats = unis.unionByName(bis)
    bucket = (
        F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("long") % DSIR_BUCKETS
    )
    return feats.select(id_col, bucket.alias("bucket"))


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every raw document by how target-like its hashed n-gram
    feature distribution is → ``(id_col, n_feats, logw_e9, avg_logw)``.

    Per bucket ``b`` of the hashed uni+bigram space, the importance
    log-ratio is ``log10(p_target(b) / p_raw(b))`` with add-one
    smoothing; a document's log-weight is the sum over its feature bag.
    Documents with no tokens have no features and are absent from the
    output. ``logw_e9`` (exact nano-BIGINT sum) is the deterministic
    record; ``avg_logw`` normalizes by feature count (the paper
    resamples by raw weight — length-biased; the mean is the
    length-neutral variant. Both derive from exact sums). Select by
    thresholding — at scale, take the threshold from a KLL sketch of
    ``logw_e9`` (see ``sketches.quantile_sketches``) instead of a
    global sort.

    100 TB posture: both corpora stream once through the feature hash
    (no shuffle until the count agg, which carries ≤``DSIR_BUCKETS``
    partials per task); the finished weight table is ``DSIR_BUCKETS``
    rows → broadcast to the scoring join, so the raw corpus is never
    shuffled to score it. Feature totals fold out of the bounded count
    table itself (a window over its ≤4096 rows) — no second corpus pass
    and no duplicated aggregation subtree.

    Train/serve split: :func:`dsir_model` returns the weight table alone
    — persist it (it is 4096 rows) and score later increments with
    :func:`dsir_score` without re-deriving the distributions (the
    ivf_build/ivf_search pattern; served == inline pinned in tests).
    """
    return dsir_score(docs, dsir_model(docs, target, text_col, id_col),
                      text_col, id_col)


def dsir_model(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the DSIR importance model → the ``(bucket, lw_e9)`` weight
    table (≤``DSIR_BUCKETS`` rows — trivially persistable; see
    :func:`dsir_weights` for semantics and scale shape)."""
    raw_f = _hashed_gram_features(docs, text_col, id_col)
    tgt_f = _hashed_gram_features(target, text_col, id_col)
    raw_c = raw_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_c = tgt_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt"))
    # Totals come from a window over the ≤DSIR_BUCKETS-row joined count
    # table — zero extra passes and zero subtree duplication (a separate
    # totals aggregate re-evaluates its whole input subtree: Spark does
    # not exchange-reuse under differing parent aggregates, verified on
    # the executed plan). The single-partition window is bounded at 4096
    # rows.
    # One log10 over one ratio-of-ratios — the exact expression shape the
    # DuckDB oracle states; smoothing +1 per bucket, +DSIR_BUCKETS per
    # total, so empty buckets on either side stay finite.
    p_tgt = (F.col("c_tgt") + 1).cast("double") / (
        F.col("t_tgt") + DSIR_BUCKETS
    ).cast("double")
    p_raw = (F.col("c_raw") + 1).cast("double") / (
        F.col("t_raw") + DSIR_BUCKETS
    ).cast("double")
    # bucket % 1 ≡ 0 but is non-foldable, so the one-partition spec
    # survives optimization and WindowExec's no-partition warning stays
    # out of the logs (lit(0) gets constant-folded away).
    w_all = Window.partitionBy(F.col("bucket") % 1)
    return (
        raw_c.join(tgt_c, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
        .withColumn("t_raw", F.sum("c_raw").over(w_all))
        .withColumn("t_tgt", F.sum("c_tgt").over(w_all))
        .select(
            "bucket",
            F.round(F.log10(p_tgt / p_raw) * _DSIR_SCALE).cast("long").alias("lw_e9"),
        )
    )


def dsir_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a trained ``(bucket, lw_e9)`` DSIR weight
    table (from :func:`dsir_model`, possibly read back from storage) →
    ``(id_col, n_feats, logw_e9, avg_logw)``. One featurizing pass over
    ``docs`` through the broadcast table; exact nano-BIGINT sums."""
    feats = _hashed_gram_features(docs, text_col, id_col)
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lw_e9").alias("logw_e9"),
        )
        .withColumn(
            "avg_logw",
            F.col("logw_e9").cast("double")
            / _DSIR_SCALE
            / F.col("n_feats").cast("double"),
        )
    )


def epoch_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    prefix_len: int = 2,
) -> DataFrame:
    """Deterministic global training order: ``epoch_pos`` = the row's rank
    in the ``md5(seed:id)``-shuffled permutation of the corpus — what a
    data loader consumes to stream one epoch in a reproducible random
    order (new ``seed`` → new permutation).

    The naive formulation — ``row_number() OVER (ORDER BY hash)`` — is the
    classic single-partition trap: one task sorts the universe. Here the
    rank is computed distributed, exploiting that a string's hex prefix
    orders consistently with the string: bucket rows by the first
    ``prefix_len`` hex chars of the hash (256 / 4096 buckets), rank within
    each bucket (one bounded window shuffle), then add per-bucket offsets
    from a tiny cumulative count that broadcasts back. Global order is
    exactly ``ORDER BY md5, id`` — same rows, same positions, any cluster
    size. Raise ``prefix_len`` to 3 at 100 TB so the window shuffle fans
    over 4096 tasks.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    withb = df.withColumn("_h", h).withColumn("_b", F.substring("_h", 1, prefix_len))
    w_rank = Window.partitionBy("_b").orderBy("_h", id_col)
    ranked = withb.withColumn("_rn", F.row_number().over(w_rank))
    counts = withb.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn("epoch_pos", (F.col("_off") + F.col("_rn") - 1).cast("long"))
        .drop("_h", "_b", "_rn", "_off")
    )


def novelty_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Cross-document n-gram novelty per doc → ``(id_col, n_grams,
    n_shared, novelty)`` — the corpus-redundancy quality signal
    (RefinedWeb-style): how much of a document's content appears verbatim
    elsewhere. ``n_grams`` counts the doc's DISTINCT word ``ngram``-grams,
    ``n_shared`` the subset occurring in ≥2 documents corpus-wide, and
    ``novelty = (n_grams - n_shared) / n_grams`` (1.0 = fully original,
    0.0 = every gram duplicated somewhere). Compose with
    ``sketches.threshold_filter`` or a plain cut to drop boilerplate-heavy
    docs that per-doc repetition signals (TEXT-REPETITION) cannot see.

    Scale shape: grams hash to md5 at the scan so the two gram-scale
    shuffles (per-gram window count, per-doc rollup) carry (id, hash)
    pairs — never gram text; the hash rides as the 16-byte
    ``unhex(md5)`` BINARY, not the 32-char hex string (§2.3 narrower
    types, the same key line_dedup ships — identical grams ⇒ identical
    hashes ⇒ identical counts either way, the hex surface is pure
    overhead). The per-gram document count is a WINDOW over
    the hash (one shuffle) rather than a groupBy + self-join back (which
    re-shuffles the gram stream a second time to meet its own count
    table — measured 2x slower at sf0.1); both shapes co-locate a hot
    gram's rows on one partition, so the window costs no extra skew,
    only a per-partition sort. Unlike ``dedup.line_dedup`` the
    duplicated-gram set is never broadcast (shared grams are unbounded
    at corpus scale — a boilerplate-heavy crawl can have most grams
    duplicated somewhere).
    """
    sh = F.array_distinct(shingles(F.col(text_col), n=ngram))
    grams = df.select(F.col(id_col), F.explode(sh).alias("_g")).select(
        id_col, F.unhex(F.md5("_g")).alias("_h")
    )
    w = Window.partitionBy("_h")
    return (
        grams.withColumn("_nd", F.count(F.lit(1)).over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_nd") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            id_col,
            "n_grams",
            "n_shared",
            (
                (F.col("n_grams") - F.col("n_shared")).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )


def sample_k(
    df: DataFrame,
    strata_col: str,
    k: int | dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exact-COUNT stratified sample: keep exactly
    ``min(k, n)`` rows per stratum — the fixed-budget companion to
    ``stratified_sample``'s fixed-rate (eval-set carving, per-domain
    annotation budgets, balanced few-shot pools all want "K per group",
    not a fraction). Selection order is the same seedless ``md5(id)``
    permutation, so the two samplers draw NESTED subsets (the k-sample
    is a prefix of any larger sample of the same stratum) and re-runs
    and engines agree row-for-row. ``k`` is one budget or a per-stratum
    dict (unlisted strata → dropped). One window shuffle, same shape
    and scale note as stratified_sample."""
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w_rank = Window.partitionBy(strata_col).orderBy(*order)
    if isinstance(k, dict):
        cap = F.create_map(*[F.lit(x) for kv in k.items() for x in kv])[
            F.col(strata_col)
        ]
    else:
        cap = F.lit(int(k))
    return (
        df.withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def contamination_scores(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Per-document contamination FRACTION against the eval set →
    ``(id_col, n_grams, n_contaminated, contamination)`` — the scoring
    form of :func:`decontaminate`'s binary drop. Pipelines that must
    keep borderline documents (a quote of a benchmark question inside
    organic discussion) threshold on the fraction instead of dropping
    on any single shared gram; the binary operator is this with
    ``contamination > 0``.

    Same scale shape as the exact decontam: eval's distinct grams
    broadcast, the corpus gram stream left-semi-tags against them
    in-flow (here a left join + count), one per-doc rollup shuffle
    carrying (id, counts).
    """
    sh = F.array_distinct(shingles(F.col(text_col), n=ngram))
    eval_sh = eval_docs.select(F.explode(sh).alias("_g")).distinct()
    grams = docs.select(F.col(id_col), F.explode(sh).alias("_g"))
    tagged = grams.join(
        F.broadcast(eval_sh.withColumn("_hit", F.lit(1))), "_g", "left"
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias(
                "n_contaminated"
            ),
        )
        .select(
            id_col, "n_grams", "n_contaminated",
            (F.col("n_contaminated").cast("double")
             / F.col("n_grams").cast("double")).alias("contamination"),
        )
    )
