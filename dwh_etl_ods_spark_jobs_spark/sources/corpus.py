"""Corpus file sources/sinks for the training-data pipeline surface.

The reference ingests only JDBC extracts; a 100 TB corpus pipeline ingests
web-crawl-style files — JSONL (one document object per line), CSV manifests,
and raw text — and exports curated documents as token-budgeted training
shards. These wrappers pin the options that matter at scale:

- **Explicit schema always.** Schema inference is a full extra pass over
  the data (and nondeterministic under corrupt rows) — at 100 TB it doubles
  the ingest cost. Callers pass the DDL string.
- **PERMISSIVE + corrupt-record capture for JSONL.** A crawl shard with a
  few malformed lines must not kill a 1000-executor job; bad lines land in
  ``_corrupt_record`` for quarantine instead (``badRecordsPath`` is
  Databricks-only, the capture column is the portable form).
- **Line-granular splitting.** JSONL/CSV/text are splittable when
  uncompressed or block-compressed; a single gzip file is ONE task no
  matter its size. The readers accept directories/globs so upstream shards
  parallelize naturally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON documents with an explicit schema.

    With ``quarantine=True`` the returned frame carries ``_corrupt_record``
    (NULL for clean rows; the raw line for malformed ones) so the caller
    can split clean/dirty with one filter instead of failing the job —
    ``mode=PERMISSIVE`` is the only mode that is safe on a multi-TB crawl
    where FAILFAST aborts everything and DROPMALFORMED silently loses data
    with no audit trail.
    """
    full = f"{schema}, {CORRUPT_COL} STRING" if quarantine else schema
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_capture_column, corrupt_rows).

    The dirty half keeps the full schema with the capture column renamed to
    ``raw_line`` — Spark refuses any query over a raw JSON/CSV scan whose
    referenced columns prune down to ONLY the internal corrupt-record
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); keeping
    the data columns (all NULL on corrupt rows) sidesteps that without
    caching or re-reading the files.
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dirty = df.filter(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(
        CORRUPT_COL, "raw_line"
    )
    return clean, dirty


def read_csv_manifest(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV manifest reader (shard lists, URL seed lists): explicit schema,
    no inference pass, RFC-4180 quoting defaults."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_text_docs(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text ingest: one row per line (splittable, the default), or one
    row per FILE with ``wholetext`` — the latter for small-doc-per-file
    layouts only (a whole file must fit one task's memory)."""
    df = spark.read.text(path, wholetext=whole_file)
    return df.select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source_file"),
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    fmt: str = "json",
    mode: str = "error",
) -> None:
    """Write curated documents as one directory per training shard
    (``shard=N/part-*``), the layout downstream dataloaders list and read
    per shard.

    Composes with ``curation.pack_token_shards``: shard ids are assigned by
    token budget there, and this sink repartitions BY the shard column
    first so each shard directory is written by the tasks that own it —
    without it, every task appends to every shard directory
    (tasks × shards small files, the classic partitioned-write explosion).
    """
    (
        df.repartition(F.col(shard_col))
        .write.mode(mode)
        .partitionBy(shard_col)
        .format(fmt)
        .save(path)
    )
