from __future__ import annotations

import os

from ._shared import DataFrame, F, SparkSession, _cents, _scratch_dir, _sum_cents_sql, bpe_ish_token_count, cosine_topk, cosine_topk_lsh, embedding_near_dups, fingerprint, ivf_topk, ivfpq_topk, lang_id, load, mean_word_length, multilevel_agg, pq_topk, punct_ratio, quality_score, salted_agg, salted_join, stopword_ratio, token_count
from .views_dedup_corpus import _COS_SQL


def _parquet_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata (pyarrow, driver-side, no
    Spark job) — for data-dependent plan-shape switches that must not
    cost an action at query-construction time."""
    import glob

    import pyarrow.parquet as pq

    files = (
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        # an empty glob means the layout assumption broke (non-local
        # path, renamed parts) — returning 0 here would SILENTLY flip
        # data-dependent plan shapes to their small-corpus branch
        raise FileNotFoundError(
            f"no parquet part files found under {path!r}; cannot size "
            "the table for the plan-shape switch"
        )
    return sum(pq.read_metadata(f).num_rows for f in files)



def q_sim_topk(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-TOPK: brute-force cosine top-10 for 5 query vectors against the
    corpus. Dot products are sequential double folds on both engines —
    bit-equal, so raw cosines hash-match."""
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb, queries, k=10)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))


ORACLE_SIM_TOPK = _COS_SQL


def q_emb_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """EMB-NEARDUP: embedding near-duplicate pairs, union-tagged by method —
    'lsh' (hyperplane self-join + exact verify) and 'semdedup' (SemDeDup:
    k-means cluster-scoped exact verify, the semantic-redundancy pruning
    recipe). Rows-only: LSH banding / k-means cells have engine-specific
    candidate sets an all-pairs SQL oracle would flag; precision-1 and
    recall pinned in tests/test_similarity.py."""
    from ..operators.similarity import semantic_dedup_pairs

    emb = load(spark, sf, "embeddings")
    # candidate structures must scale with the corpus (the sf1 sweep's
    # measured lesson — fixed 2^8 buckets / 16 cells give Σ|group|² pair
    # counts that grow quadratically with n): past 50k vectors, deepen
    # the LSH to r=12 planes recovering recall with b=6 bands (higher
    # recall than r=8/b=1 at every cos ≥ ~0.45, ~40× fewer candidates)
    # and hold k-means cells at ~1k vectors each. Below that the
    # historical shapes are kept so small-SF records stay comparable.
    # The scale switch reads n from the parquet FOOTERS (driver-side
    # metadata, microseconds) — every other builder is lazy, and an
    # eager emb.count() action here landed inside bench's timed window
    # and ran on every plan audit.
    n = _parquet_rows(os.path.join(sf, "embeddings.parquet"))
    big = n > 50_000
    lsh = embedding_near_dups(
        emb, threshold=0.3, dim=64,
        n_planes=12 if big else 8, n_bands=6 if big else 1,
    ).select(F.lit("lsh").alias("method"), "id_a", "id_b", "cos_sim")
    sem = semantic_dedup_pairs(
        emb, threshold=0.3, n_cells=max(16, n // 1000) if big else 16,
        train_fraction=0.5,
    ).select(F.lit("semdedup").alias("method"), "id_a", "id_b", "cos_sim")
    return lsh.unionByName(sem).orderBy("method", "id_a", "id_b")


def q_sim_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-LSH: hyperplane-LSH-bucketed approximate top-k (rows-only check;
    recall vs brute force asserted in tests)."""
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # planes=10/radius=4 (r12, VERDICT r11 item 5): recall@10 0.70 vs the
    # old planes=8/radius=3's 0.60 at the same measured scan fraction
    # (386/1024 = 0.377 nominal vs 93/256 = 0.363 — swept in-session,
    # PERF-NOTES 62; more planes cut per-bucket collisions, the extra
    # radius restores coverage where bench-corpus margins are noisy)
    out = cosine_topk_lsh(emb, queries, k=10, dim=64, n_planes=10, multiprobe=4)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))


def q_sim_lsh_qd(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-LSH-QD: query-directed multi-probe LSH top-k (Lv et al., VLDB
    2007) — each query flips every subset of its 5 lowest-|margin| planes
    (32 probes of 256 buckets = 12.5% of the key space) instead of blind
    Hamming-radius probing. Rows-only check (hyperplane internals have no
    SQL twin); recall vs brute force and vs radius probing at equal probe
    budget is asserted in tests, and the sf1 serving curve carries the
    qd=8/12-plane point (tools/ann_curve_sf1.py)."""
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk_lsh(emb, queries, k=10, dim=64, n_planes=8, probe_lowmargin=5)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))


# ----------------------------------------------------------- text analysis

def q_sim_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-IVF: IVF approximate top-k — k-means coarse quantizer (pyspark.ml,
    fixed seed), nprobe-cell probing, exact cosine within probed cells.
    Iterative training has no SQL twin → rows-only check; recall vs brute
    force is asserted in tests (SURVEY §7.4 scale path)."""
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(emb, queries, k=10, n_cells=16, nprobe=6, train_fraction=0.5, max_iter=8)
    return out.select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


def q_sim_ivf_append(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-IVF-APPEND: the index-maintenance serve path (VERDICT r9 item
    5) — train + build on the even-id half, ivf_append the odd-id half
    (map-only assignment at the frozen centroids, no retrain), then
    serve from the grown index; the one-row staleness signal unions in
    as part='staleness'. Rows-only like every k-means entry; served ==
    rebuilt-at-same-centroids is pinned in tests/test_similarity.py."""
    from ..operators.similarity import ivf_append, ivf_build, ivf_search, ivf_staleness

    emb = load(spark, sf, "embeddings")
    # per-call unique index dir (reaped at exit): a second construction
    # must not delete the parquet index under the first frame's lazy reader
    path = _scratch_dir("feasibility_etl_spark_ivf_append")
    ivf_build(emb.where(F.col("vec_id") % 2 == 0), path, n_cells=16, seed=42,
              train_fraction=0.5, max_iter=8)
    ivf_append(spark, path, emb.where(F.col("vec_id") % 2 == 1))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    served = ivf_search(spark, path, queries, k=10, nprobe=6).select(
        F.lit("topk").alias("part"), "query_id", "vec_id",
        F.col("rank").cast("long").alias("rank"),
    )
    stale = ivf_staleness(spark, path).select(
        F.lit("staleness").alias("part"),
        F.col("n_cells").cast("long").alias("query_id"),
        F.col("n_vectors").alias("vec_id"),
        F.when(F.col("recluster_recommended"), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("rank"),
    )
    return served.unionByName(stale).orderBy("part", "query_id", "rank")


def q_sim_ivf_recluster(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-IVF-RECLUSTER: the targeted index remedy end-to-end (VERDICT
    r10 item 6) — build on the even-id half, append a deterministically
    SKEWED drop (the odd-id vectors squashed toward a corner:
    ``x*0.05 + 0.8`` per component, so they pile into the few cells
    nearest that corner), watch ``ivf_staleness`` trip, re-split the
    hottest cell at frozen siblings with :func:`ivf_recluster_cell`, and
    serve from the repaired index. Output parts: ``staleness_before`` /
    ``staleness_after`` one-row signals (imbalance must drop — asserted
    in tests, visible in the rows) + the post-recluster ``topk``.
    Rows-only like every k-means entry; recall-vs-full-rebuild parity is
    pinned in tests/test_similarity.py."""
    from ..operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_recluster_cell,
        ivf_search,
        ivf_staleness,
    )

    emb = load(spark, sf, "embeddings")
    path = _scratch_dir("feasibility_etl_spark_ivf_recluster")
    ivf_build(emb.where(F.col("vec_id") % 2 == 0), path, n_cells=16, seed=42,
              train_fraction=0.5, max_iter=8)
    skewed = emb.where(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: (x * F.lit(0.05) + F.lit(0.8)).cast("float")
        ).alias("embedding"),
    )
    ivf_append(spark, path, skewed, drop_id="skewed")

    def stale_row(tag: str) -> DataFrame:
        # materialize NOW — the recluster below mutates the index files a
        # lazy frame would otherwise re-read post-repair
        r = ivf_staleness(spark, path).collect()[0]
        return spark.createDataFrame(
            [(tag, int(r.n_cells), int(r.max_cell), int(r.recluster_recommended))],
            "part string, query_id long, vec_id long, rank long",
        )

    before = stale_row("staleness_before")
    hot = (
        spark.read.parquet(f"{path}/assigned")
        .groupBy("_cell").count().orderBy(F.col("count").desc(), "_cell")
        .first()["_cell"]
    )
    ivf_recluster_cell(spark, path, int(hot), n_splits=4, seed=42, max_iter=8)
    after = stale_row("staleness_after")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    served = ivf_search(spark, path, queries, k=10, nprobe=6).select(
        F.lit("topk").alias("part"), "query_id", "vec_id",
        F.col("rank").cast("long").alias("rank"),
    )
    return before.unionByName(after).unionByName(served).orderBy(
        "part", "query_id", "rank"
    )


def q_sim_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-IVFPQ: fused IVF-PQ top-k — coarse k-means cells + per-cell
    residual PQ codes in one index (rows-only; recall vs standalone PQ at a
    fraction of the scanned code bytes pinned in tests)."""
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivfpq_topk(
        emb, queries, k=10, n_cells=16, nprobe=8, n_subspaces=8, n_codes=16,
        train_fraction=0.5, max_iter=4, refine=32,
    )
    return out.select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


def q_sim_pq(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-PQ: product-quantization top-k — per-subspace k-means codebooks
    (pyspark.ml, fixed seeds), ADC over the compressed code table, exact
    cosine re-rank of the top k·refine. Iterative training has no SQL twin
    → rows-only check; recall vs brute force is asserted in tests."""
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq_topk(
        emb, queries, k=10, n_subspaces=8, n_codes=16,
        train_fraction=0.5, max_iter=4, refine=16,
    )
    return out.select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


def q_sim_ivfbq(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-IVFBQ (granular singleton): fused IVF + binary quantization —
    k-means cells prune WHICH rows are read, 1-bit Hamming prunes which
    of those pay a float dot product, exact cosine re-ranks the
    shortlist (the memory-light serving recipe; see similarity.py
    ivfbq_topk for the scale shape). Rows-only like the other trained
    ANN tiers (seeded k-means); recall is pinned on clustered fixtures
    in tests/test_similarity.py and tracked per round on the bench
    corpus via bench.run_ann_recall (ann_recall_ivfbq)."""
    from ..operators.similarity import ivfbq_topk

    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivfbq_topk(
        emb, queries, k=10, n_cells=16, nprobe=8, shortlist=120,
        train_fraction=0.5, max_iter=8,
    )
    return out.select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


def q_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """TEXT-TOKENS: token + char counting over documents."""
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


ORACLE_TEXT_TOKENS = r"""
WITH seg AS (
  SELECT doc_id, text,
         regexp_replace(text, '([0-9]|[^\sA-Za-z0-9])', ' \1 ', 'g') AS bpe_text
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(CASE WHEN length(trim(bpe_text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(bpe_text), '\s+')) END AS BIGINT)
         AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_calc
FROM seg
"""


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """TEXT-QUALITY: length/punct/stopword quality signals + composite score."""
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text").alias("stop_ratio"),
        mean_word_length("text").alias("mean_word_len"),
        quality_score("text").alias("quality"),
    )


_QUALITY_SQL_FRAGMENTS = r"""
  toks AS (
    SELECT doc_id, text,
           CASE WHEN length(trim(text)) = 0 THEN []
                ELSE string_split_regex(trim(text), '\s+') END AS t,
           CASE WHEN length(trim(lower(text))) = 0 THEN []
                ELSE string_split_regex(trim(lower(text)), '\s+') END AS tl
    FROM documents
  ), sig AS (
    SELECT doc_id,
      CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0.0
           ELSE CAST(length(regexp_replace(regexp_replace(text, '\s', '', 'g'),
                                           '[A-Za-z0-9]', '', 'g')) AS DOUBLE)
                / CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      END AS punct_ratio,
      CASE WHEN len(tl) = 0 THEN 0.0
           ELSE CAST(len(list_filter(tl, x -> list_contains(
                  ['the','and','of','to','a','in','is','that','it','for'], x)))
                  AS DOUBLE) / CAST(len(tl) AS DOUBLE)
      END AS stop_ratio,
      CASE WHEN len(t) = 0 THEN 0.0
           ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                / CAST(len(t) AS DOUBLE)
      END AS mean_word_len,
      CAST(len(t) AS DOUBLE) AS n_tok
    FROM toks
  )
"""

ORACLE_TEXT_QUALITY = (
    "WITH "
    + _QUALITY_SQL_FRAGMENTS
    + """
SELECT doc_id, punct_ratio, stop_ratio, mean_word_len,
       LEAST(n_tok / 200.0, 1.0) * 0.4
         + (1.0 - LEAST(punct_ratio * 4.0, 1.0)) * 0.3
         + LEAST(stop_ratio * 4.0, 1.0) * 0.3 AS quality
FROM sig
"""
)


def q_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """TEXT-LANGID: stopword-argmax + CJK-detection language ID, with the
    corpus's labeled lang for accuracy eyeballing."""
    docs = load(spark, sf, "documents")
    return docs.select("doc_id", "lang", lang_id("text").alias("pred_lang"))


# The argmax is encoded as max over 'NNNNNNlang' strings: a zero-padded
# numeric prefix followed by the language code orders exactly like the
# (score, lang) struct comparison Spark does.
ORACLE_TEXT_LANGID = r"""
WITH toks AS (
  SELECT doc_id, lang, text,
         CASE WHEN length(trim(lower(text))) = 0 THEN []
              ELSE string_split_regex(trim(lower(text)), '\s+') END AS tl
  FROM documents
), hits AS (
  SELECT doc_id, lang, text,
    len(list_filter(tl, x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) AS h_en,
    len(list_filter(tl, x -> list_contains(['el','la','de','que','y','en','un','una','los','del'], x))) AS h_es,
    len(list_filter(tl, x -> list_contains(['der','die','das','und','nicht','ein','eine','ist','zu','mit'], x))) AS h_de,
    len(list_filter(tl, x -> list_contains(['le','la','les','de','des','et','un','une','est','dans'], x))) AS h_fr
  FROM toks
), best AS (
  SELECT doc_id, lang,
    GREATEST(lpad(CAST(h_en AS VARCHAR), 10, '0') || 'en',
             lpad(CAST(h_es AS VARCHAR), 10, '0') || 'es',
             lpad(CAST(h_de AS VARCHAR), 10, '0') || 'de',
             lpad(CAST(h_fr AS VARCHAR), 10, '0') || 'fr') AS enc,
    length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk_chars,
    length(regexp_replace(text, '\s', '', 'g')) AS total_chars
  FROM hits
)
SELECT doc_id, lang,
  CASE WHEN total_chars > 0
        AND CAST(cjk_chars AS DOUBLE) / CAST(total_chars AS DOUBLE) > 0.3 THEN 'zh'
       WHEN CAST(substr(enc, 1, 10) AS BIGINT) > 0 THEN substr(enc, 11, 2)
       ELSE 'und' END AS pred_lang
FROM best
"""


def q_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """TEXT-FINGERPRINT: per-document stable content fingerprint."""
    return load(spark, sf, "documents").select("doc_id", fingerprint("text").alias("fp"))


ORACLE_TEXT_FINGERPRINT = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fp
FROM documents
"""


# ------------------------------------------------------------- registries

# ------------------------------------------------------- skew-safe variants

_FLAG_ROWS = [("A", "async"), ("N", "none"), ("R", "returned")]


def q_j_salted(spark: SparkSession, sf: str) -> DataFrame:
    """J-SALTED: salted equi-join on an extremely skewed key (3 distinct
    values of l_returnflag over the whole lineitem table). The salt changes
    only task routing, never the result set — so the oracle is the plain
    SQL join."""
    li = load(spark, sf, "lineitem")
    flags = spark.createDataFrame(_FLAG_ROWS, "l_returnflag string, flag_desc string")
    out = salted_join(li, flags, "l_returnflag", salt_col="l_orderkey", n_salts=16)
    return out.select("l_orderkey", "l_linenumber", "l_returnflag", "flag_desc")


ORACLE_J_SALTED = """
SELECT l_orderkey, l_linenumber, l_returnflag, flag_desc
FROM lineitem
JOIN (VALUES ('A', 'async'), ('N', 'none'), ('R', 'returned'))
  AS flags(l_returnflag, flag_desc) USING (l_returnflag)
"""


def q_a_salted(spark: SparkSession, sf: str) -> DataFrame:
    """A-SALTED: the beyond-plain-groupBy aggregation strategies
    union-tagged — part='salted' covers the two-stage salted aggregation
    over the skewed key (algebraic partial/final split → identical to the
    one-shot groupBy); part='rollup'/'cube' cover A-MULTILEVEL (OLAP
    grouping sets: hierarchy / all-subsets totals in ONE Expand-based
    pass, levels tagged with grouping_id — same bitmask convention as
    DuckDB GROUPING())."""
    li = load(spark, sf, "lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        partial_aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum(_cents("l_extendedprice")).alias("pc"),
        ],
        final_aggs=[
            F.sum("pn").alias("n_items"),
            F.sum("pc").cast("long").alias("price_cents"),
        ],
        salt_col="l_orderkey",
        n_salts=16,
    ).select(
        F.lit("salted").alias("part"),
        "l_returnflag",
        F.lit(None).cast("string").alias("l_linestatus"),
        F.lit(None).cast("long").alias("gid"),
        "n_items",
        "price_cents",
    )
    lvl_aggs = [
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_cents("l_extendedprice")).cast("long").alias("price_cents"),
    ]
    levels = [
        multilevel_agg(li, ["l_returnflag", "l_linestatus"], lvl_aggs, mode=m).select(
            F.lit(m).alias("part"), "l_returnflag", "l_linestatus", "gid",
            "n_items", "price_cents",
        )
        for m in ("rollup", "cube")
    ]
    # part='pivot': A-PIVOT/A-UNPIVOT round trip — explicit-values pivot
    # to the wide form, stack-based multi-measure unpivot back to long;
    # all-null cells drop, so the round trip IS the plain GROUP BY (the
    # oracle) while exercising both operators end-to-end
    from ..operators.aggregates import pivot_agg, unpivot_groups

    piv = pivot_agg(
        li, ["l_returnflag"], "l_linestatus", ["F", "O"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("l_extendedprice")).cast("long").alias("c"),
        ],
    )
    unpiv = unpivot_groups(
        piv, ["l_returnflag"],
        {"F": ["F_n", "F_c"], "O": ["O_n", "O_c"]},
        "l_linestatus", ["n_items", "price_cents"],
    ).select(
        F.lit("pivot").alias("part"), "l_returnflag", "l_linestatus",
        F.lit(None).cast("long").alias("gid"), "n_items", "price_cents",
    )
    return (
        salted.unionByName(levels[0]).unionByName(levels[1]).unionByName(unpiv)
    )


def _multilevel_sql(mode: str) -> str:
    return f"""
SELECT '{mode}' AS part, l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_items,
       {_sum_cents_sql("l_extendedprice", "price_cents")}
FROM lineitem GROUP BY {mode.upper()} (l_returnflag, l_linestatus)"""


ORACLE_A_SALTED = f"""
SELECT 'salted' AS part, l_returnflag, CAST(NULL AS VARCHAR) AS l_linestatus,
       CAST(NULL AS BIGINT) AS gid, COUNT(*) AS n_items,
       {_sum_cents_sql("l_extendedprice", "price_cents")}
FROM lineitem GROUP BY l_returnflag
UNION ALL {_multilevel_sql("rollup")}
UNION ALL {_multilevel_sql("cube")}
UNION ALL
SELECT 'pivot' AS part, l_returnflag, l_linestatus,
       CAST(NULL AS BIGINT) AS gid, COUNT(*) AS n_items,
       {_sum_cents_sql("l_extendedprice", "price_cents")}
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_a_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """A-PIVOT (granular singleton): the WIDE pivot form — explicit
    pivot values (one conditional-agg pass, no distinct scan of the
    pivot column), count + exact-cents sum per (returnflag, linestatus)
    cell. Empty cells are NULL (the FILTER-aggregate convention; the
    oracle mirrors count's 0 with NULLIF)."""
    from ..operators.aggregates import pivot_agg

    return pivot_agg(
        load(spark, sf, "lineitem"),
        ["l_returnflag"], "l_linestatus", ["F", "O"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("l_extendedprice")).cast("long").alias("c"),
        ],
    ).orderBy("l_returnflag")


ORACLE_A_PIVOT = f"""
SELECT l_returnflag,
       NULLIF(COUNT(*) FILTER (WHERE l_linestatus = 'F'), 0) AS F_n,
       {_sum_cents_sql("CASE WHEN l_linestatus = 'F' THEN l_extendedprice END", "F_c")},
       NULLIF(COUNT(*) FILTER (WHERE l_linestatus = 'O'), 0) AS O_n,
       {_sum_cents_sql("CASE WHEN l_linestatus = 'O' THEN l_extendedprice END", "O_c")}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_sim_bq(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-BQ (granular singleton): the 1-bit ANN tier — binary-quantized
    codes (32 sign bits per long), Hamming top-10 for 3 query vectors via
    XOR+popcount. Integer-exact distances ⇒ ranks are engine-identical
    and the oracle hash-matches (the oracle counts sign mismatches
    directly, which equals popcount-of-XOR over the packed codes)."""
    from ..operators.similarity import binary_quantize, hamming_topk

    bq = binary_quantize(load(spark, sf, "embeddings"))
    q = bq.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("bq").alias("query_bq")
    )
    return hamming_topk(bq, q, k=10)


ORACLE_SIM_BQ = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
d AS (
  SELECT q.qid, c.vec_id AS cid,
    CAST(len(list_filter(range(1, len(c.embedding) + 1),
      i -> (CAST(c.embedding[i] AS DOUBLE) >= 0)
           != (CAST(q.qv[i] AS DOUBLE) >= 0))) AS BIGINT) AS hamming
  FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.qid
)
SELECT qid AS query_id, cid AS vec_id, hamming,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, cid) AS BIGINT)
         AS rank
FROM d QUALIFY rank <= 10
"""


def q_sim_bqrr(spark: SparkSession, sf: str) -> DataFrame:
    """SIM-BQRR (granular singleton): the BQ SERVING tier — 1-bit Hamming
    shortlist (k·refine=80 per query) + exact cosine re-rank. FULL oracle:
    the sign quantizer is seedless and Hamming ties break on vec_id, so
    the shortlist is engine-identical, and the cosine re-rank is the same
    sequential double fold SIM-TOPK hash-matches. This is the tier
    bench.run_ann_recall tracks as ``bq`` (recall@10 0.60 at bench SF vs
    0.20 un-reranked; the Hamming stage still reads only packed longs —
    32× fewer bytes than the float corpus — and full vectors are touched
    for 80 rows per query)."""
    from ..operators.similarity import bq_rerank_topk

    emb = load(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return bq_rerank_topk(emb, q, k=10, refine=8).select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


ORACLE_SIM_BQRR = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
d AS (
  SELECT q.qid, c.vec_id AS cid, c.embedding AS cv, q.qv,
    CAST(len(list_filter(range(1, len(c.embedding) + 1),
      i -> (CAST(c.embedding[i] AS DOUBLE) >= 0)
           != (CAST(q.qv[i] AS DOUBLE) >= 0))) AS BIGINT) AS hamming
  FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.qid
),
short AS (
  SELECT qid, cid, cv, qv FROM d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, cid) <= 80
),
scored AS (
  SELECT qid, cid,
    list_sum(list_transform(range(1, len(cv) + 1),
      i -> CAST(cv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
    (sqrt(list_sum(list_transform(range(1, len(cv) + 1),
       i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))) *
     sqrt(list_sum(list_transform(range(1, len(qv) + 1),
       i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))) AS cos_sim
  FROM short
)
SELECT qid AS query_id, cid AS vec_id, cos_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS BIGINT)
         AS rank
FROM scored QUALIFY rank <= 10
"""


def q_text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """TEXT-NORMALIZE (granular singleton): Unicode NFC normalization +
    encoding-anomaly signals over deterministically dirtied text (every
    row gains a decomposed e+COMBINING-ACUTE and i+COMBINING-DIAERESIS,
    a U+FFFD replacement char, and a BEL control char, so the
    normalization and both counters provably fire on every row). FULL
    oracle: DuckDB's nfc_normalize is the same Unicode NFC (verified
    char-identical to Python's unicodedata), and the counters are plain
    length/replace arithmetic. The NFKC/NFD forms share the operator and
    are pinned by semantic tests (no SQL twin for compatibility
    folding)."""
    from ..operators.text import (
        control_char_count,
        normalize_text,
        replacement_char_count,
    )

    docs = load(spark, sf, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" cafe\u0301 nai\u0308ve \ufffd bel\u0007l"),
        ).alias("text"),
    )
    out = normalize_text(dirty, form="NFC")
    return out.select(
        "doc_id",
        F.col("text_norm"),
        (F.col("text_norm") != F.col("text")).alias("changed"),
        F.length("text").cast("long").alias("n_before"),
        F.length("text_norm").cast("long").alias("n_after"),
        replacement_char_count("text").alias("n_repl"),
        control_char_count("text").alias("n_ctl"),
    )


ORACLE_TEXT_NORMALIZE = r"""
WITH dirty AS (
  SELECT doc_id,
         text || ' cafe' || chr(769) || ' nai' || chr(776) || 've ' ||
         chr(65533) || ' bel' || chr(7) || 'l' AS text
  FROM documents
)
SELECT doc_id,
       nfc_normalize(text) AS text_norm,
       nfc_normalize(text) <> text AS changed,
       CAST(length(text) AS BIGINT) AS n_before,
       CAST(length(nfc_normalize(text)) AS BIGINT) AS n_after,
       CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT)
         AS n_repl,
       CAST(length(text)
            - length(regexp_replace(text,
                     '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')) AS BIGINT)
         AS n_ctl
FROM dirty
"""
