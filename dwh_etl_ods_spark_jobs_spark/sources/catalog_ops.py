"""Catalog maintenance helpers — the Spark-native form of the reference's
raw-JDBC side channel.

The reference ships three tiny utilities every job main can call:

- ``DatabaseUtils.runQuery(String)`` (``Core/.../DatabaseUtils.java:31-36``)
  — execute arbitrary DDL/DML on the sink over plain JDBC;
- ``DatabaseUtils.renameTable(old, new)`` / ``dropTable(t)``
  (``DatabaseUtils.java:38-52``) — the stage-and-swap pattern (load into
  ``stg_X``, drop ``X``, rename ``stg_X`` → ``X``);
- ``FileUtils.loadTextFromFile(Class, String)``
  (``Core/.../FileUtils.java:11-18``) — load a job's SQL text from the
  classpath.

Engine-native equivalents operate on the **Spark catalog** (warehouse /
lakehouse tables), not a remote RDBMS: at 100 TB the engine owns its
tables, and metadata ops are instant catalog calls rather than data moves.
``run_sql`` is deliberately thin — it exists so a reference job's migration
is mechanical; new code should express logic as DataFrame plans instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def run_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute one SQL statement against the Spark catalog and return its
    result frame (``DatabaseUtils.runQuery`` analog; SELECTs return rows,
    DDL/DML return an empty frame)."""
    return spark.sql(sql)


def _q(name: str) -> str:
    """Backtick-quote each identifier part (dbo.CT_Patient -> `dbo`.`CT_Patient`)."""
    return ".".join("`" + p.strip("`") + "`" for p in name.split("."))


def rename_table(spark: SparkSession, old: str, new: str) -> None:
    """``ALTER TABLE old RENAME TO new`` — the swap half of the reference's
    stage-and-swap (``DatabaseUtils.renameTable``, ``sp_rename`` analog).
    A catalog metadata operation: no data is rewritten at any scale."""
    spark.sql(f"ALTER TABLE {_q(old)} RENAME TO {_q(new)}")


def drop_table(spark: SparkSession, table: str) -> None:
    """``DROP TABLE IF EXISTS`` (``DatabaseUtils.dropTable`` analog; the
    reference also guards with an existence check)."""
    spark.sql(f"DROP TABLE IF EXISTS {_q(table)}")


def load_sql_resource(path: str | os.PathLike) -> str:
    """Read a job's SQL text from a file (``FileUtils.loadTextFromFile``
    analog; the reference loads from the jar classpath, we load from a
    path — package SQL next to the job module and join from ``__file__``)."""
    with open(path, encoding="utf-8") as f:
        return f.read()


def stage_and_swap(
    spark: SparkSession, df: DataFrame, table: str, staging_suffix: str = "_stg"
) -> None:
    """The reference's full-refresh pattern as one helper: write ``df`` to a
    staging table, then swap it in — ``LoadFacilities.main``'s shape
    (SURVEY §3.3). On a transactional catalog (Delta/Iceberg) prefer
    ``replaceWhere``/``CREATE OR REPLACE``; this helper keeps the
    reference's semantics for plain warehouse tables.

    Swap order is crash-safe: the live table is renamed ASIDE
    (``table_old``) before the staging table is renamed in, and the aside
    copy is dropped only after the new generation is live. A failure (or a
    dead driver) between the two renames leaves the previous generation
    recoverable as ``table_old`` — a naive drop-then-rename would have
    already destroyed it, leaving readers with no table at all."""
    stg = table + staging_suffix
    aside = table + "_old"
    drop_table(spark, stg)
    df.write.saveAsTable(stg)
    # Recover from a crashed prior swap FIRST: live slot empty + aside
    # present means the previous run died between its two renames. Restore
    # aside into the live slot before any destructive step — dropping
    # aside while the live slot is empty would destroy the only surviving
    # generation if THIS run also fails before its rename.
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(aside):
        rename_table(spark, aside, table)
    drop_table(spark, aside)
    had_live = spark.catalog.tableExists(table)
    if had_live:
        rename_table(spark, table, aside)
    try:
        rename_table(spark, stg, table)
    except Exception:
        # Roll the previous generation back into place (best effort: only
        # when the slot is actually free).
        if had_live and not spark.catalog.tableExists(table):
            rename_table(spark, aside, table)
        raise
    if had_live:
        drop_table(spark, aside)
