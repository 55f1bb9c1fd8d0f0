"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shape: every variant here avoids the O(n²) all-pairs comparison.

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle on the
  hash, keeper chosen deterministically (min doc_id).
- **MinHash+LSH**: shingle → k minhashes → band buckets → self-join only
  within buckets → exact Jaccard verify on candidates. The self-join is on
  (band, band_hash), so the shuffle carries bucket-sized groups, not the
  corpus.
- **SimHash**: 64-bit signature per doc via HOF bit-vote, banded into 16-bit
  quarters for candidate generation (two signatures within Hamming distance
  3 must share one of 4 bands).
- **n-gram Jaccard**: the verify step, exposed standalone.

All pure Column expressions (xxhash64 is Spark's JVM-side 64-bit hash) — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct normalized text (lowest id wins).

    groupBy on the md5 fingerprint — the only shuffle is on the 16-byte
    hash, not the document body; map-side partial agg keeps it cheap.
    """
    h = fingerprint(text_col).alias("fp")
    keepers = df.select(h, F.col(id_col)).groupBy("fp").agg(F.min(id_col).alias(id_col))
    return df.join(keepers, id_col, "left_semi")


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group report: fingerprint → keeper id + group size."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text → array<string>.

    Documents shorter than ``n`` words yield their whole text as the single
    shingle (so short docs still dedup exactly).
    """
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """Array of ``num_hashes`` minhash values over the shingle set.

    Hash family: ``xxhash64(seed_i, shingle)`` — xxhash64 mixes the extra
    literal column in, giving independent-enough families without Python.
    Empty shingle arrays yield nulls (filtered by callers).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(seed, s))
        ),
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) sharing ≥1 minhash band.

    rows/band = num_hashes/bands; with 32 hashes in 8 bands the bucket
    probability is ``1-(1-j^4)^8`` — steep around Jaccard ~0.5. The
    explode is ``bands`` rows per doc; the self-join key is (band index,
    band hash), so co-grouped data is bucket-local.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(text_col, shingle_n), num_hashes)
    banded = (
        df.select(F.col(id_col), sig.alias("sig"))
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ),
                )
            ).alias("band", "band_hash"),
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard similarity between two shingle arrays (as sets)."""
    sa, sb = F.array_distinct(shingles_a), F.array_distinct(shingles_b)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs verified with exact Jaccard.

    Candidates from ``minhash_candidates`` (bucket-local), then a broadcast-
    friendly join back to the shingle arrays and an exact Jaccard filter —
    false positives from banding die here; false negatives are governed by
    the (num_hashes, bands) curve.
    """
    cands = minhash_candidates(df, text_col, id_col, num_hashes, bands, shingle_n)
    sh = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("sh")
    )
    return (
        cands.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash64(text: Column | str, shingle_n: int = 2) -> Column:
    """64-bit SimHash as an unsigned-decimal string.

    Classic bit-vote: each shingle hashes to 64 bits; each bit position
    accumulates +1/−1; the sign vector is the signature. The vote runs as a
    HOF fold over a 64-slot int array — row-local, no shuffle. Returned via
    ``conv(bits, 2, 10)`` as a decimal string (Spark longs are signed;
    string form keeps banding/equality clean).
    """
    sh = shingles(text, shingle_n)
    zeros = F.array_repeat(F.lit(0), 64)
    # bit i extracted with a literal shift (shiftright needs an int, not a
    # Column) — 64 expressions built Python-side, MSB first
    votes = F.aggregate(
        sh,
        zeros,
        lambda acc, s: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(F.xxhash64(s), i).bitwiseAND(F.lit(1))
                    for i in range(63, -1, -1)
                ]
            ),
            lambda a, bit: a + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    bits = F.concat_ws(
        "", F.transform(votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0")))
    )
    return F.conv(bits, 2, 10)


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
) -> DataFrame:
    """Candidate pairs sharing ≥1 of 4 16-bit SimHash bands.

    Pigeonhole: Hamming distance ≤3 across 64 bits ⇒ at least one clean
    16-bit quarter matches. Same banded self-join shape as MinHash LSH.
    """
    sig = simhash64(text_col, shingle_n)
    # re-derive the bitstring from the decimal string for banding
    bits = F.lpad(F.conv(sig, 10, 2), 64, "0")
    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[F.substring(bits, 1 + 16 * i, 16) for i in range(4)])
        ).alias("band", "band_bits"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
