from __future__ import annotations

from ._shared import DataFrame, F, SparkSession, _sum_cents, _sum_cents_sql, blocked_jaccard_pairs, clean_text, connected_components, decontaminate, exact_dup_groups, load, near_dup_pairs, pack_shards, prune_components, register_views, session_agg, simhash_candidates, sliding_agg, split_corpus, token_count, tumbling_agg
from ..operators.dedup import shingles
from ..operators.sketches import bloom_decontaminate



# ------------------------------------------------------------- view plans

_VIEW_CTE_SQL = """
WITH cte_cust AS (
  SELECT o.o_orderkey, c.c_name
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
), cte_nat AS (
  SELECT o.o_orderkey, n.n_name
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
), cte_seg AS (
  SELECT o.o_orderkey, c.c_mktsegment
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT o.o_orderkey, o.o_orderstatus, cc.c_name AS cust_name,
       cn.n_name AS nation_name, cs.c_mktsegment AS segment
FROM orders o
LEFT JOIN cte_cust cc ON o.o_orderkey = cc.o_orderkey
LEFT JOIN cte_nat cn ON o.o_orderkey = cn.o_orderkey
LEFT JOIN cte_seg cs ON o.o_orderkey = cs.o_orderkey
"""


def q_view_cte(spark: SparkSession, sf: str) -> DataFrame:
    """VIEW-CTE: the reference-faithful view shape (schema.sql:66-94): three
    CTEs each re-scanning the fact to attach one attribute, re-joined on the
    key. Catalyst's CTE inlining removes PG ≤11's materialization fences and
    broadcasts every dim join, but it does NOT deduplicate the repeated fact
    scans — this plan still reads orders 4× (8 parquet scans total). Kept
    verbatim for reference fidelity; VIEW-IDIOMATIC below is the production
    default (1 fact scan, benched side by side)."""
    register_views(spark, sf, ["orders", "customer", "nation"])
    return spark.sql(_VIEW_CTE_SQL)


ORACLE_VIEW_CTE = _VIEW_CTE_SQL


def q_view_idiomatic(spark: SparkSession, sf: str) -> DataFrame:
    """VIEW-IDIOMATIC: the single-pass production twin of VIEW-CTE — one
    orders scan + two broadcast joins, identical rows (same oracle). At
    100 TB the faithful CTE shape pays 4× the fact-scan IO for the same
    result; this is the default read path."""
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    return (
        orders.join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"], "left"
        )
        .join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left"
        )
        .select(
            orders["o_orderkey"],
            "o_orderstatus",
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation_name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


ORACLE_VIEW_IDIOMATIC = _VIEW_CTE_SQL


# ------------------------------------------------------------- windowing

def q_win_tumble(spark: SparkSession, sf: str) -> DataFrame:
    """WIN-TUMBLE: tumbling event-time windows (batch = streaming semantics)."""
    ev = load(spark, sf, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "1 day",
        [F.count(F.lit(1)).alias("n_events"), _sum_cents("value", "value_cents")],
        keys=["event_type"],
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "value_cents",
    )


ORACLE_WIN_TUMBLE = f"""
SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events, {_sum_cents_sql("value", "value_cents")}
FROM events GROUP BY 1, 2
"""


def q_win_slide(spark: SparkSession, sf: str) -> DataFrame:
    """WIN-SLIDE: sliding windows (1h window / 30m slide → every event lands
    in exactly 2 windows)."""
    ev = load(spark, sf, "events")
    out = sliding_agg(
        ev, "ts", "1 hour", "30 minutes", [F.count(F.lit(1)).alias("n_events")]
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
    )


ORACLE_WIN_SLIDE = """
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                 - i * INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events
FROM events CROSS JOIN (VALUES (0), (1)) offsets(i)
GROUP BY 1
"""


def q_win_session(spark: SparkSession, sf: str) -> DataFrame:
    """WIN-SESSION: per-user session windows with a 10-minute gap
    (F.session_window; oracle = gaps-and-islands with the same gap rule:
    session end = last event + gap)."""
    ev = load(spark, sf, "events")
    out = session_agg(
        ev, "ts", "10 minutes", [F.count(F.lit(1)).alias("n_events")], keys=["user_id"]
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        "n_events",
    )


ORACLE_WIN_SESSION = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), grouped AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events
FROM grouped GROUP BY user_id, session_id
"""


# ------------------------------------------------------------ dedup family

def q_dedup_exact_doc(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-EXACT (granular singleton): hash-groupBy exact dedup report
    (keeper + group size per normalized-text fingerprint)."""
    return exact_dup_groups(load(spark, sf, "documents"))


ORACLE_DEDUP_EXACT_DOC = r"""
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fp,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS group_size
FROM documents GROUP BY 1
"""


def _structured_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Line-structured documents synthesized in-plan: the flat synthetic
    texts get a per-doc-class cookie banner, a line break after every 7
    whitespace-separated words, and a shared footer — deterministic Column
    exprs the DuckDB oracle reproduces verbatim (``$1``/``\\1`` rewrite
    syntax differs per engine; semantics verified identical)."""
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("cookie notice variant "),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("\n"),
            F.regexp_replace(F.col("text"), r"((\S+\s+){7})", "$1\n"),
            F.lit("\n"),
            F.lit("(c) example corp all rights reserved"),
        ).alias("text"),
    )


_STRUCTURED_SQL = r"""
  SELECT doc_id,
         'cookie notice variant ' || CAST(doc_id % 3 AS VARCHAR) || chr(10) ||
         regexp_replace(text, '((\S+\s+){7})', '\1' || chr(10), 'g') || chr(10) ||
         '(c) example corp all rights reserved' AS text
  FROM documents
"""


def q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """LINE-DEDUP: CCNet/RefinedWeb-style line-level boilerplate removal
    (operators.dedup.line_dedup, mode='drop_common') over line-structured
    docs — banners/footers repeat across ≥2 docs and are dropped
    everywhere; unique body lines survive and the doc text is rebuilt in
    original line order. Full oracle: explode + md5 line-frequency +
    ordered string_agg are all ANSI-expressible."""
    from ..operators.dedup import line_dedup

    return line_dedup(_structured_docs(spark, sf))


def _line_oracle(mode_pred: str) -> str:
    return rf"""
WITH structured AS ({_STRUCTURED_SQL}),
ex AS (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS ln, ls[CAST(u.i AS INT)] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM structured),
       unnest(range(1, len(ls) + 1)) AS u(i)
), fp AS (
  SELECT doc_id, ln, line,
         CASE WHEN lower(trim(line)) = '' THEN NULL
              ELSE md5(lower(trim(line))) END AS f
  FROM ex
), freq AS (
  SELECT f, MIN(doc_id) AS keeper FROM fp WHERE f IS NOT NULL
  GROUP BY f HAVING COUNT(DISTINCT doc_id) >= 2
), marked AS (
  SELECT p.doc_id, p.ln, p.line, ({mode_pred}) AS keep
  FROM fp p LEFT JOIN freq q ON p.f = q.f
)
SELECT doc_id,
       COALESCE(string_agg(line, chr(10) ORDER BY ln) FILTER (WHERE keep), '')
         AS text,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM marked GROUP BY doc_id ORDER BY doc_id
"""


ORACLE_LINE_DEDUP = _line_oracle("q.f IS NULL")


def q_line_dedup_keepfirst(spark: SparkSession, sf: str) -> DataFrame:
    """LINE-DEDUP-KEEPFIRST: CCNet-style exact line dedup — a shared line
    survives only in the lowest-doc_id document containing it."""
    from ..operators.dedup import line_dedup

    return line_dedup(_structured_docs(spark, sf), mode="keep_first")


ORACLE_LINE_DEDUP_KEEPFIRST = _line_oracle("q.f IS NULL OR p.doc_id = q.keeper")


def q_dedup_substring(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-SUBSTRING (granular singleton): exact substring dedup (Lee
    et al. 2022, arXiv:2107.06499 — the RefinedWeb exact-substring pass)
    at k=8 tokens: duplicated spans are removed from every non-canonical
    occurrence (first (doc, pos) keeps; intra-doc repeats count) and the
    documents rebuild from surviving tokens. Full oracle: gram counts,
    the min-occurrence keys (MIN over (doc, pos) structs — both engines
    order structs lexicographically), the k-1-preceding coverage window,
    and the ordered rebuild are all ANSI-expressible."""
    from ..operators.dedup import substring_dedup

    return substring_dedup(load(spark, sf, "documents"), k=8)


ORACLE_DEDUP_SUBSTRING = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS tl
  FROM documents WHERE trim(text) <> ''
), z AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, t[CAST(u.i AS INT)] AS tok,
         CASE WHEN u.i + 7 <= len(tl)
              THEN array_to_string(tl[u.i:u.i+7], ' ') END AS g,
         ROW(doc_id, CAST(u.i - 1 AS BIGINT)) AS okv
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
), gs AS (
  SELECT g, MIN(okv) AS mokv FROM z WHERE g IS NOT NULL
  GROUP BY g HAVING COUNT(*) > 1
), m AS (
  SELECT z.doc_id, z.pos, z.tok,
         CASE WHEN gs.g IS NOT NULL AND z.okv <> gs.mokv THEN 1 ELSE 0 END AS dup
  FROM z LEFT JOIN gs USING (g)
), c AS (
  SELECT doc_id, pos, tok,
         MAX(dup) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cov
  FROM m
)
SELECT doc_id,
       COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE cov = 0), '')
         AS text,
       COUNT(*) AS n_tok,
       CAST(SUM(cov) AS BIGINT) AS n_removed
FROM c GROUP BY doc_id
"""


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-EXACT: the exact-dedup family union-tagged — part='doc' covers
    document-level hash-groupBy dedup (keeper + group size per normalized
    fingerprint); part='line' covers LINE-DEDUP (CCNet/RefinedWeb
    line-level boilerplate removal with rebuilt doc text, full oracle —
    see q_line_dedup for the line-structuring construction); part='substr'
    covers DEDUP-SUBSTRING (Lee-et-al exact substring dedup: duplicated
    k-token spans removed from non-canonical occurrences, doc rebuilt —
    n_lines carries n_tok, n_kept carries n_tok - n_removed)."""
    doc = exact_dup_groups(load(spark, sf, "documents")).select(
        F.lit("doc").alias("part"),
        "fp",
        "keep_id",
        "group_size",
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("long").alias("n_lines"),
        F.lit(None).cast("long").alias("n_kept"),
        F.lit(None).cast("string").alias("text"),
    )
    line = q_line_dedup(spark, sf).select(
        F.lit("line").alias("part"),
        F.lit(None).cast("string").alias("fp"),
        F.lit(None).cast("long").alias("keep_id"),
        F.lit(None).cast("long").alias("group_size"),
        "doc_id",
        "n_lines",
        "n_kept",
        "text",
    )
    substr = q_dedup_substring(spark, sf).select(
        F.lit("substr").alias("part"),
        F.lit(None).cast("string").alias("fp"),
        F.lit(None).cast("long").alias("keep_id"),
        F.lit(None).cast("long").alias("group_size"),
        "doc_id",
        F.col("n_tok").alias("n_lines"),
        (F.col("n_tok") - F.col("n_removed")).alias("n_kept"),
        "text",
    )
    return doc.unionByName(line).unionByName(substr)


ORACLE_DEDUP_EXACT = rf"""
SELECT 'doc' AS part, fp, keep_id, group_size,
       CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_lines,
       CAST(NULL AS BIGINT) AS n_kept, CAST(NULL AS VARCHAR) AS text
FROM ({ORACLE_DEDUP_EXACT_DOC})
UNION ALL
SELECT 'line' AS part, CAST(NULL AS VARCHAR) AS fp,
       CAST(NULL AS BIGINT) AS keep_id, CAST(NULL AS BIGINT) AS group_size,
       doc_id, n_lines, n_kept, text
FROM ({ORACLE_LINE_DEDUP})
UNION ALL
SELECT 'substr' AS part, CAST(NULL AS VARCHAR) AS fp,
       CAST(NULL AS BIGINT) AS keep_id, CAST(NULL AS BIGINT) AS group_size,
       doc_id, n_tok AS n_lines, n_tok - n_removed AS n_kept, text
FROM ({ORACLE_DEDUP_SUBSTRING})
"""


def q_dedup_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-NGRAM: token-set Jaccard near-dup pairs with blocking on
    (lang, source) — the exact-verify stage of the near-dup pipeline,
    computed relationally (exploded-token self-join + pair counts; no
    per-pair array intersects), with a full SQL oracle (MinHash candidates
    are checked rows-only)."""
    return blocked_jaccard_pairs(
        load(spark, sf, "documents"), ["lang", "source"], threshold=0.2,
        broadcast_routing=True,  # (lang, source): ~10^2 blocks by construction
        branch_gate=True,
    )


ORACLE_DEDUP_NGRAM = r"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CASE WHEN len(list_distinct(a.t || b.t)) = 0 THEN 0.0
            ELSE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) END AS jaccard_sim
FROM toks a JOIN toks b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE CASE WHEN len(list_distinct(a.t || b.t)) = 0 THEN 0.0
           ELSE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) END >= 0.2
"""


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-MINHASH: MinHash+LSH near-dup pairs (xxhash64 signatures — no
    DuckDB twin, driver records rows-only). Verified against the exact
    Jaccard in tests."""
    return near_dup_pairs(load(spark, sf, "documents"), threshold=0.5).orderBy("id_a", "id_b")


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-SIMHASH: banded SimHash candidate pairs (rows-only check)."""
    return simhash_candidates(load(spark, sf, "documents")).orderBy("id_a", "id_b")


def _sqrt_banded(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic, oracle-expressible bucket frame for the hot-bucket
    cap entries: band_hash = floor(sqrt(doc_id)), so bucket k holds ids
    [k², (k+1)²) — sizes 2k+1 grow without bound, which means a FIXED cap
    exercises both keep (small k) and drop (large k) at EVERY SF. IEEE
    sqrt is correctly rounded (exact on perfect squares < 2^52) and FLOOR
    runs before the cast per the repo's oracle-parity rules."""
    return load(spark, sf, "documents").select(
        F.col("doc_id").alias("id"),
        F.lit(0).alias("band"),
        F.floor(F.sqrt(F.col("doc_id").cast("double"))).cast("long").alias(
            "band_hash"
        ),
    )


def q_dedup_capped(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-CAPPED: hot-bucket-cap semantics FULL-oracle (VERDICT r9
    item 2). Runs :func:`capped_bucket_pairs` — the exact pairing core
    ``minhash_candidates(max_bucket_size=...)`` uses — over deterministic
    sqrt buckets instead of seeded xxhash64 bands, so DuckDB can replay
    the cap bit-for-bit (the seeded-band variant stays rows-only like
    every xxhash entry)."""
    from ..operators.dedup import capped_bucket_pairs

    return capped_bucket_pairs(
        _sqrt_banded(spark, sf), "id", max_bucket_size=40
    ).orderBy("id_a", "id_b")


ORACLE_DEDUP_CAPPED = """
WITH banded AS (
  SELECT doc_id AS id, 0 AS band,
         CAST(FLOOR(SQRT(CAST(doc_id AS DOUBLE))) AS BIGINT) AS band_hash
  FROM documents
), sized AS (
  SELECT id, band, band_hash,
         COUNT(*) OVER (PARTITION BY band, band_hash) AS bn
  FROM banded
), kept AS (
  SELECT id, band, band_hash FROM sized WHERE bn <= 40
)
SELECT a.id AS id_a, b.id AS id_b
FROM kept a JOIN kept b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
"""


def q_dedup_capped_audit(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-CAPPED-AUDIT: the no-silent-caps surface — every bucket the
    DEDUP-CAPPED cap drops, with member count and un-emitted pair mass.
    FULL-oracle over the same deterministic sqrt buckets."""
    from ..operators.dedup import hot_buckets

    return hot_buckets(_sqrt_banded(spark, sf), 40).orderBy("band", "band_hash")


ORACLE_DEDUP_CAPPED_AUDIT = """
WITH banded AS (
  SELECT doc_id AS id, 0 AS band,
         CAST(FLOOR(SQRT(CAST(doc_id AS DOUBLE))) AS BIGINT) AS band_hash
  FROM documents
)
SELECT band, band_hash, COUNT(*) AS bucket_size,
       (COUNT(*) * (COUNT(*) - 1)) // 2 AS n_dropped_pairs
FROM banded GROUP BY band, band_hash
HAVING COUNT(*) > 40
"""


def q_dedup_starprune(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-STARPRUNE: the component-grain dedup COMPOSITION hash-green
    end-to-end (VERDICT r10 item 4) — bucket star edges (linear grain,
    hot-bucket cap 40) → connected components → keep each component's
    min-id representative. Runs the exact operators the clique-safe LSH
    path uses (:func:`bucket_star_edges` → :func:`connected_components`
    → :func:`prune_by_components`), over the same deterministic sqrt
    buckets as DEDUP-CAPPED so DuckDB replays every stage bit-for-bit
    (seeded-minhash banding stays rows-only via DEDUP-MINHASH-COMP;
    cross-bucket component chaining is pinned against the pair grain in
    tests/test_dedup.py)."""
    from ..operators.dedup import (
        bucket_star_edges,
        connected_components,
        prune_by_components,
    )

    edges = bucket_star_edges(_sqrt_banded(spark, sf), "id", max_bucket_size=40)
    comps = connected_components(edges)
    docs = load(spark, sf, "documents")
    return (
        prune_by_components(docs, comps)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# sqrt buckets are disjoint (one per id), so star-edge components equal
# the buckets and the min-id representative IS the bucket min — the oracle
# states that closed form; the Spark side still runs the full star-edge →
# component-loop → prune composition against it
ORACLE_DEDUP_STARPRUNE = """
WITH sized AS (
  SELECT doc_id AS id,
         COUNT(*) OVER w AS bn,
         MIN(doc_id) OVER w AS bmin
  FROM documents
  WINDOW w AS (PARTITION BY CAST(FLOOR(SQRT(CAST(doc_id AS DOUBLE))) AS BIGINT))
), dropped AS (
  SELECT id FROM sized WHERE bn <= 40 AND id != bmin
)
SELECT d.doc_id, d.lang, d.source
FROM documents d LEFT JOIN dropped ON d.doc_id = dropped.id
WHERE dropped.id IS NULL
ORDER BY d.doc_id
"""


def q_dedup_minhash_comp(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-MINHASH-COMP: component-grain LSH output (rows-only —
    xxhash64 bands, like DEDUP-MINHASH). Star edges keep the grain
    linear in bucket size, so this is the scale path for clique-heavy
    corpora where DEDUP-MINHASH's pair grain goes quadratic
    (PERF-NOTES 43). Pinned equal to connected components over the pair
    grain in tests/test_dedup.py."""
    from ..operators.dedup import minhash_components

    return minhash_components(load(spark, sf, "documents")).orderBy("doc_id")


# ------------------------------------------------------- similarity search

_COS_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.qid, c.vec_id AS cid,
    list_sum(list_transform(range(1, len(c.embedding) + 1),
      i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) /
    (sqrt(list_sum(list_transform(range(1, len(c.embedding) + 1),
       i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))) *
     sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
       i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))) AS cos_sim
  FROM embeddings c CROSS JOIN q
  WHERE q.qid != c.vec_id
)
SELECT qid AS query_id, cid AS vec_id, cos_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS BIGINT)
         AS rank
FROM scored QUALIFY rank <= 10
"""


def q_dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-COMPONENTS: near-dup pairs → transitive dedup groups via
    iterative min-label propagation (similarity isn't transitive; groups
    are the connected components of the pair graph). Fed from the blocked
    n-gram pairs so the DuckDB oracle can recompute the same graph with a
    recursive CTE + min-over-reachable-set."""
    pairs = blocked_jaccard_pairs(
        load(spark, sf, "documents"), ["lang", "source"], threshold=0.2,
        broadcast_routing=True,  # (lang, source): ~10^2 blocks by construction
    )
    return connected_components(pairs)


ORACLE_DEDUP_COMPONENTS = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, source,
         list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE CASE WHEN len(list_distinct(a.t || b.t)) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                  / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) END >= 0.2
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT e.src AS node, reach.r AS r
  FROM edges e JOIN reach ON e.dst = reach.node
)
SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component_id
FROM reach GROUP BY node
"""


def q_dedup_prune(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-PRUNE: the deduplicated corpus itself — every doc except
    non-representative members of near-dup components (min doc_id kept per
    component, unpaired docs untouched). Composes blocked n-gram pairs →
    connected components → anti-join, all with DuckDB-recomputable math."""
    docs = load(spark, sf, "documents")
    pairs = blocked_jaccard_pairs(docs, ["lang", "source"], threshold=0.2,
                                  broadcast_routing=True)
    return prune_components(docs, pairs).select("doc_id", "lang", "source")


ORACLE_DEDUP_PRUNE = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, source,
         list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE CASE WHEN len(list_distinct(a.t || b.t)) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                  / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) END >= 0.2
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT e.src AS node, reach.r AS r
  FROM edges e JOIN reach ON e.dst = reach.node
), dropped AS (
  SELECT node FROM reach GROUP BY node HAVING MIN(r) <> node
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM dropped)
"""


def q_dedup_prune_best(spark: SparkSession, sf: str) -> DataFrame:
    """DEDUP-PRUNE-BEST (granular singleton): component prune keeping the
    HIGHEST-QUALITY member per near-dup cluster (score = n_chars, i.e.
    the longest document; min id on ties) — the RefinedWeb/FineWeb
    representative policy, vs DEDUP-PRUNE's metadata-free min-id. Full
    oracle: the same recursive component search plus a per-component
    argmax window."""
    docs = load(spark, sf, "documents")
    pairs = blocked_jaccard_pairs(docs, ["lang", "source"], threshold=0.2,
                                  broadcast_routing=True)
    return prune_components(docs, pairs, score_col="n_chars").select(
        "doc_id", "lang", "source", "n_chars"
    )


ORACLE_DEDUP_PRUNE_BEST = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, source,
         list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS t
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE CASE WHEN len(list_distinct(a.t || b.t)) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                  / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) END >= 0.2
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT e.src AS node, reach.r AS r
  FROM edges e JOIN reach ON e.dst = reach.node
), comps AS (
  SELECT node AS doc_id, MIN(r) AS component_id FROM reach GROUP BY node
), ranked AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.component_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
  FROM comps c JOIN documents d USING (doc_id)
), dropped AS (
  SELECT doc_id FROM ranked WHERE rn > 1
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def q_text_clean(spark: SparkSession, sf: str) -> DataFrame:
    """TEXT-CLEAN: pre-tokenization normalization over a deterministically
    dirtied document body (wrapped in tags + entities + a control char, so
    the transformation provably fires on every row): strip HTML, decode
    entities, drop control chars, collapse whitespace."""
    docs = load(spark, sf, "documents")
    dirty = F.concat(
        F.lit('<p id="x">'), F.col("text"), F.lit("</p> &amp; &lt;b&gt; \t")
    )
    cleaned = clean_text(dirty)
    return docs.select(
        "doc_id",
        cleaned.alias("clean"),
        F.length(dirty).cast("long").alias("n_dirty"),
        F.length(cleaned).cast("long").alias("n_clean"),
    )


ORACLE_TEXT_CLEAN = r"""
WITH dirty AS (
  SELECT doc_id, '<p id="x">' || text || '</p> &amp; &lt;b&gt; ' || chr(9) AS d
  FROM documents
), cleaned AS (
  SELECT doc_id, d,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(d, '<[^>]*>', ' ', 'g'),
                  '&nbsp;', ' ', 'g'),
                '&lt;', '<', 'g'),
              '&gt;', '>', 'g'),
            '&quot;', '"', 'g'),
          '&#39;', '''', 'g'),
        '&amp;', '&', 'g'),
      '[\x00-\x1f\x7f]', ' ', 'g'),
    '\s+', ' ', 'g')) AS c
  FROM dirty
)
SELECT doc_id, c AS clean,
       CAST(len(d) AS BIGINT) AS n_dirty,
       CAST(len(c) AS BIGINT) AS n_clean
FROM cleaned
"""


def q_corpus_split(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-SPLIT: deterministic 90/5/5 train/val/test assignment by
    affine-hash bucket — stable under corpus growth, zero shuffle (the plan
    is scan + project), and computable verbatim by the oracle (xxhash64
    would be rows-only)."""
    return split_corpus(
        load(spark, sf, "documents"),
        {"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("doc_id", "split")


ORACLE_CORPUS_SPLIT = r"""
SELECT doc_id,
       CASE WHEN b < 9000 THEN 'train'
            WHEN b < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         ((doc_id % 1000000007) * 654435747 + 104729) % 1000000007 % 10000 AS b
  FROM documents
)
"""


def q_corpus_pack(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-PACK: greedy token-budget shard packing (2000 whitespace
    tokens/shard) within 8 hash buckets — the cumulative sum windows over
    bucket-sized partitions, never a global sort."""
    docs = load(spark, sf, "documents").withColumn("n_tok", token_count("text"))
    return pack_shards(docs, "n_tok", 2000, num_buckets=8).select(
        "doc_id", "n_tok", "shard_id"
    )


ORACLE_CORPUS_PACK = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok,
         doc_id % 8 AS b
  FROM documents
)
SELECT doc_id, n_tok,
       b * 1099511627776
         + CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY b ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - n_tok)
                      / 2000.0) AS BIGINT) AS shard_id
FROM t
"""


def q_win_resample(spark: SparkSession, sf: str) -> DataFrame:
    """WIN-RESAMPLE (granular singleton): hourly resampling of events per
    event_type with gap fill — empty buckets become explicit rows
    (n_events filled 0, value_cents honestly NULL); each key's spine
    spans its own [min, max] bucket. Oracle: DuckDB time_bucket +
    generate_series spine, identical left join."""
    from ..streaming.windows import resample

    ev = load(spark, sf, "events")
    out = resample(
        ev, "ts", "1 hour",
        [F.count(F.lit(1)).alias("n_events"), _sum_cents("value", "value_cents")],
        keys=["event_type"], fill={"n_events": 0},
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "value_cents",
    )


ORACLE_WIN_RESAMPLE = f"""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS ws,
         COUNT(*) AS n_events, {_sum_cents_sql("value", "value_cents")}
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(ws) AS lo, MAX(ws) AS hi FROM b GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS ws
  FROM bounds
)
SELECT strftime(s.ws, '%Y-%m-%d %H:%M:%S') AS window_start, s.event_type,
       COALESCE(b.n_events, 0) AS n_events, b.value_cents
FROM spine s LEFT JOIN b ON b.event_type = s.event_type AND b.ws = s.ws
"""


def q_corpus_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-DECONTAM: scrub training docs sharing any word 8-gram with a
    held-out eval set (doc_id % 97 == 0 stands in for the benchmark). The
    eval shingle set is broadcast; the corpus-side shingle stream semi-joins
    without a shuffle."""
    docs = load(spark, sf, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, eval_docs).select("doc_id", "lang", "source")


ORACLE_CORPUS_DECONTAM = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+7], ' ') FOR i IN range(1, len(t) - 6)]
         END AS s
  FROM toks
), eval_sh AS (
  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0
), contaminated AS (
  SELECT DISTINCT sh.doc_id
  FROM sh, unnest(sh.s) AS u(g)
  WHERE u.g IN (SELECT g FROM eval_sh)
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND d.doc_id % 97 <> 0
"""


def q_corpus_decontam_combined(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-DECONTAM (driver combined entry): the exact broadcast
    semi-join scrub (``part='exact'``) UNION the Bloom-prefiltered scale
    path (``part='bloom'``, sketches.bloom_decontaminate) — the contract
    is that both parts are row-identical, so ONE oracle SELECT serves
    both with only the part literal changing. The bloom path's 100 TB
    win: the clean crowd answers an in-row membership probe against a
    ~64 KB broadcast filter instead of exploding its shingles through
    the eval-gram semi-join; only flagged suspects (true hits + ~1e-4
    false positives) pay the exact join."""
    docs = load(spark, sf, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    cols = ["doc_id", "lang", "source"]
    exact = decontaminate(docs, eval_docs).select(*cols)
    fast = bloom_decontaminate(docs, eval_docs).select(*cols)
    return exact.withColumn("part", F.lit("exact")).unionByName(
        fast.withColumn("part", F.lit("bloom"))
    )


_DECONTAM_PART_SQL = r"""
  SELECT d.doc_id, d.lang, d.source, '{part}' AS part
  FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND d.doc_id % 97 <> 0
"""

ORACLE_CORPUS_DECONTAM_COMBINED = (
    ORACLE_CORPUS_DECONTAM.rsplit("SELECT d.doc_id", 1)[0]
    + _DECONTAM_PART_SQL.format(part="exact")
    + "UNION ALL"
    + _DECONTAM_PART_SQL.format(part="bloom")
)


def q_corpus_decontam_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-DECONTAM-BLOOM (granular singleton): the Bloom-prefiltered
    decontamination path alone — same oracle as the exact operator (the
    no-false-negative guarantee makes the outputs bit-identical); kept
    separate in the bench so the prefilter's cost delta vs the exact
    broadcast semi-join is measured, not asserted."""
    docs = load(spark, sf, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    return bloom_decontaminate(docs, eval_docs).select("doc_id", "lang", "source")


def q_sketch_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """SKETCH-BLOOM (granular): the dense word table of the Bloom filter
    over the eval slice's distinct word-8-grams (m=16 Kbit, k=5) — every
    one of the 512 words, zeros included, so the oracle pins the md5
    double-hash probe positions, the bit_or packing, AND the dense-array
    assembly verbatim."""
    from ..operators.sketches import bloom_build

    docs = load(spark, sf, "documents")
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    sh = F.array_distinct(shingles(F.col("text"), n=8))
    grams = eval_docs.select(F.explode(sh).alias("g")).distinct()
    bloom = bloom_build(grams, "g", m_bits=1 << 14, n_hashes=5)
    return (
        bloom.select(F.posexplode("bloom").alias("w", "word"))
        .select(F.col("w").cast("long").alias("w"), "word")
        .orderBy("w")
    )


ORACLE_SKETCH_BLOOM = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
  WHERE doc_id % 97 = 0
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+7], ' ') FOR i IN range(1, len(t) - 6)]
         END AS s
  FROM toks
), g AS (
  SELECT DISTINCT unnest(s) AS g FROM sh
), hx AS (
  SELECT CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(g), 9, 8)) AS BIGINT) * 2 + 1 AS h2
  FROM g
), pos AS (
  SELECT ((h1 + r.i * h2) & 16383) AS p FROM hx, range(5) r(i)
), wt AS (
  SELECT (p >> 5) AS w,
         bit_or(CAST(1 AS BIGINT) << CAST((p & 31) AS INT)) AS word
  FROM pos GROUP BY 1
)
SELECT r.i AS w, COALESCE(wt.word, 0) AS word
FROM range(512) r(i) LEFT JOIN wt ON wt.w = r.i
ORDER BY w
"""


def q_corpus_samplek(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-SAMPLEK (granular singleton): exact-count stratified
    sampling — exactly min(7, n) docs per source via the seedless
    md5(id) permutation (corpus.sample_k); full oracle (row_number over
    the identical ordering)."""
    from ..operators.corpus import sample_k

    return sample_k(load(spark, sf, "documents"), "source", 7).select(
        "doc_id", "source"
    ).orderBy("doc_id")


ORACLE_CORPUS_SAMPLEK = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 7 ORDER BY doc_id
"""


def q_corpus_contamscore(spark: SparkSession, sf: str) -> DataFrame:
    """CORPUS-CONTAMSCORE (granular singleton): per-doc contamination
    fraction vs the doc_id%97 eval slice (corpus.contamination_scores) —
    the scoring form of CORPUS-DECONTAM's binary drop; exact integer
    counts + one IEEE division ⇒ full oracle."""
    from ..operators.corpus import contamination_scores

    docs = load(spark, sf, "documents")
    return contamination_scores(
        docs, docs.where(F.col("doc_id") % 97 == 0)
    ).orderBy("doc_id")


ORACLE_CORPUS_CONTAMSCORE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+7], ' ') FOR i IN range(1, len(t) - 6)]
         END AS s
  FROM toks
), eval_sh AS (
  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0
), g AS (
  SELECT DISTINCT doc_id, g FROM (SELECT doc_id, unnest(s) AS g FROM sh)
)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       COUNT(*) FILTER (WHERE e.g IS NOT NULL) AS n_contaminated,
       CAST(COUNT(*) FILTER (WHERE e.g IS NOT NULL) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS contamination
FROM g LEFT JOIN eval_sh e USING (g)
GROUP BY g.doc_id ORDER BY g.doc_id
"""
