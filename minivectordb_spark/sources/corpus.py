"""Text-corpus sources: JSONL / CSV / raw-text ingestion into the canonical
``documents`` shape (doc_id, text, lang, source, n_chars) the dedup / text /
embedding operators consume.

The reference has no corpus loader (its unit of ingest is a single text via
``store_embedding``); at pipeline scale the unit is a corpus file set, so
these are thin, declarative readers — Spark's own json/csv/text data sources
(distributed, pushdown-capable) plus column normalization:

- missing columns materialize as typed NULLs (lang/source) or are derived
  (n_chars from text),
- ``doc_id`` is taken from the file when present, else assigned via
  ``monotonically_increasing_id`` (unique, stable within a read; documented
  as NOT contiguous — contiguity would need a global sort or zipWithIndex,
  an O(N) shuffle no corpus pipeline should pay at ingest).

Everything stays a lazy DataFrame: readers compose directly with
``clean_corpus``-style pipelines without materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def _normalize(df: DataFrame, text_col: str, id_col: str | None, source: str | None) -> DataFrame:
    if text_col != "text":
        df = df.withColumnRenamed(text_col, "text")
    df = df.withColumn("text", F.coalesce(F.col("text").cast("string"), F.lit("")))
    if id_col and id_col in df.columns:
        if id_col != "doc_id":
            df = df.withColumnRenamed(id_col, "doc_id")
        # non-numeric ids must never become silent NULLs (they'd corrupt
        # every downstream id join/ordering): numeric ids cast through,
        # string ids map to a stable md5-derived long, NULL ids fall back
        # to a per-read unique id
        from minivectordb_spark.operators.hashing import md5i32

        df = df.withColumn(
            "doc_id",
            F.coalesce(
                # try_cast: under ANSI mode a plain cast THROWS on
                # non-numeric strings instead of yielding NULL
                F.col("doc_id").try_cast("long"),
                md5i32(F.col("doc_id").cast("string")),
                F.monotonically_increasing_id(),
            ),
        )
    else:
        df = df.withColumn("doc_id", F.monotonically_increasing_id())
    if "lang" not in df.columns:
        df = df.withColumn("lang", F.lit(None).cast("string"))
    if "source" not in df.columns:
        df = df.withColumn("source", F.lit(source).cast("string"))
    df = df.withColumn("n_chars", F.length("text").cast("long"))
    return df.select(*DOC_COLUMNS)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    source: str | None = None,
) -> DataFrame:
    """One JSON object per line -> documents frame.  Schema is inferred by
    the json source (pass a partitioned directory for parallel reads);
    malformed lines surface in the standard ``_corrupt_record`` column and
    are dropped here (count them upstream if ingest QA needs it)."""
    df = spark.read.json(path)
    if "_corrupt_record" in df.columns:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return _normalize(df, text_col, id_col, source)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    source: str | None = None,
    **reader_options,
) -> DataFrame:
    """CSV with header -> documents frame (quoting/escaping/multiline are
    the csv source's options, pass them through ``reader_options``)."""
    opts = {"header": "true", "inferSchema": "true", **reader_options}
    df = spark.read.options(**opts).csv(path)
    return _normalize(df, text_col, id_col, source)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    source: str | None = None,
    whole_file: bool = False,
) -> DataFrame:
    """Raw text -> documents frame: one doc per LINE by default, or one doc
    per FILE with ``whole_file`` (wholetext mode — each file must fit an
    executor; for big single files prefer the line mode)."""
    # NB: wholetext must be the reader kwarg — .option("wholetext", ...) is
    # silently ignored by the text source
    df = spark.read.text(path, wholetext=whole_file)
    df = df.withColumnRenamed("value", "text")
    return _normalize(df, "text", None, source)
