"""CSV source/sink — the remaining interchange format next to
``jsonl.py`` (parquet/JSONL/CSV/JDBC/REST complete the S-* surface).
Same design stance as the JSONL twin:

- **Explicit schema always** — CSV inference is a full extra pass AND
  type-unstable (a column of ids that happens to look numeric in one
  sample infers differently in another).
- **Malformed rows are data**: PERMISSIVE mode lands them in a corrupt
  column via the same text + ``from_csv`` formulation (the native CSV
  source shares the JSON source's corrupt-only-projection restriction);
  DROPMALFORMED / FAILFAST opt-in.
- **Quoting/escaping are explicit options** with RFC-4180 defaults
  (quote ``"``, escape ``"`` doubled), because silently-different quote
  conventions are the classic cross-tool CSV corruption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
    keep_corrupt_col: bool = False,
    header: bool = True,
    sep: str = ",",
    quote: str = '"',
    escape: str = '"',
    **options: str,
) -> DataFrame:
    """Read CSV with an EXPLICIT schema. With ``keep_corrupt_col`` the
    malformed raw lines ride along in ``_corrupt_record`` (text source +
    ``from_csv`` — fully prunable, no caching workaround).

    ``keep_corrupt_col`` limitations (the text-source formulation trades
    them for prunable corrupt capture; use the native path — default —
    when they matter):

    - **Header is excluded by VALUE, not position** (the text source has
      no header notion): both the bare and the fully-``quote``-wrapped
      renderings of the schema's field names (with the configured
      ``sep``) are dropped — so a header written by a quoting writer is
      recognized — but a header using a DIFFERENT separator/quoting
      convention lands as a corrupt record, and a legitimate data line
      that exactly equals the header rendering is silently dropped.
      A positional first-line-per-file exclusion would need a per-file
      row index, which the distributed text source cannot provide
      without an RDD zipWithIndex pass.
    - **Multiline quoted records are unsupported**: the text source
      splits on newlines before ``from_csv`` parses, so a quoted field
      containing a newline arrives as two corrupt fragments. The native
      reader (``keep_corrupt_col=False`` + ``multiLine=true``) handles
      them.
    """
    if keep_corrupt_col:
        full = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        opts = {
            "columnNameOfCorruptRecord": CORRUPT_COL,
            "mode": "PERMISSIVE",
            "sep": sep,
            "quote": quote,
            "escape": escape,
            **options,
        }
        raw = spark.read.text(path).where(F.trim("value") != "")
        if header:
            names = [f.name for f in schema.fields]
            header_bare = sep.join(names)
            header_quoted = sep.join(f"{quote}{n}{quote}" for n in names)
            raw = raw.where(
                (F.col("value") != F.lit(header_bare))
                & (F.col("value") != F.lit(header_quoted))
            )
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in full.fields)
        parsed = raw.select(F.from_csv("value", ddl, opts).alias("_r"))
        return parsed.select("_r.*")
    reader = (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", escape)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    sep: str = ",",
    quote: str = '"',
    escape: str = '"',
    compression: str | None = None,
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write CSV (one file per task; hive-style dirs with
    ``partition_by``). RFC-4180 quoting defaults; same gzip-
    splittability caveat as the JSONL writer."""
    writer = (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", escape)
    )
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)
