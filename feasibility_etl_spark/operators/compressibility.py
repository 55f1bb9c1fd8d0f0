"""Compression-ratio quality signals — the classic cheap detector for
repetitive/boilerplate text (used alongside the Gopher rules: highly
compressible documents are template farms, keyword stuffing, or
generated spam; incompressible ones are often binary junk in a text
field). Complements TEXT-REPETITION (exact n-gram repetition mass) with
a signal that catches LONG-RANGE redundancy n-gram windows miss.

Python tier: DEFLATE has no JVM-side Column function, so this is
Arrow-batched ``mapInPandas`` (the sanctioned boundary, same as the
codecs and tokenizer encodes) over stdlib ``zlib`` — deterministic for
a fixed level and zlib build, which is why the checks are
reference-parity tests against the same interpreter's zlib rather than
a cross-engine SQL oracle (DuckDB has no DEFLATE either → rows-only).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COMPRESS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_compressed", T.LongType()),
        T.StructField("compress_ratio", T.DoubleType()),
    ]
)


def compression_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-doc ``(doc_id, n_bytes, n_compressed, compress_ratio)`` where
    ``compress_ratio = n_compressed / n_bytes`` over the UTF-8 bytes
    (lower = more redundant; typical prose lands ~0.3-0.6, template spam
    far below, random bytes near/above 1.0). Empty documents get NULL
    ratio. ``parallelism`` pre-repartitions ahead of the CPU-bound
    Python stage (the family convention)."""
    src = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    if parallelism:
        src = src.repartition(parallelism, "doc_id")

    def run(batches: Iterator) -> Iterator:
        import zlib

        import pandas as pd

        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                n = len(raw)
                c = len(zlib.compress(raw, level)) if n else 0
                out.append((did, n, c, (c / n) if n else None))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_bytes", "n_compressed", "compress_ratio"],
            )

    return src.mapInPandas(run, COMPRESS_SCHEMA)
