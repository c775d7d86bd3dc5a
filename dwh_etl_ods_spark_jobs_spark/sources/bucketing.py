"""Bucketed-table helpers: shuffle-free co-located joins.

Two fact tables bucketed by the same key into the same bucket count join
WITHOUT an Exchange on either side — the decisive optimization for the
repeated big-big joins of a 100 TB warehouse (e.g. lineitem⋈orders on
orderkey every night). Bucketing pre-pays the shuffle once at write time.

Spark requires a catalog table (``saveAsTable``) for bucket metadata; the
local warehouse dir works the same as a production metastore.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within buckets, letting sort-merge
    joins skip their sort too.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: Sequence[str], how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. When both
    sides were written with ``write_bucketed`` over the same key and bucket
    count, the physical plan contains no Exchange (verify with
    ``.explain``; tests/test_plans.py pins this)."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
