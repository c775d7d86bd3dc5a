"""Vocabulary normalization via broadcast lookup joins.

Reference pattern (``LoadCTPatients.java:144-157``): left-join the fact to a
tiny 2-column ``(source_name, target_name)`` lookup, then fold —
``when(lkp.target.isNotNull(), lkp.target).otherwise(col(c))``, i.e.
``coalesce(target_name, original)``. Some jobs alias the same dim 3x for
different columns (``LoadARTPatients.java:88-90,140-153``).

Scale: lookups are 20-50 rows; always broadcast — the join is a
BroadcastHashJoin with zero shuffle regardless of fact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_fold(
    col: str,
    lookup: DataFrame,
    source_col: str = "source_name",
    target_col: str = "target_name",
    case_insensitive: bool = False,
) -> "callable":
    """Map ``col`` through ``lookup``; unmatched values keep the original."""

    def _apply(df: DataFrame) -> DataFrame:
        # Deduplicate lookup keys defensively: a duplicated source_name would
        # fan out fact rows (the reference relies on clean lookup content).
        # Under case_insensitive the JOIN key is the case-folded source, so
        # dedupe must fold too — 'Married' and 'MARRIED' are ONE join key,
        # and keeping both would still fan out.
        src = F.col(source_col)
        lkp = (
            lookup.select(
                (F.upper(src) if case_insensitive else src).alias("__lkp_src"),
                F.col(target_col).alias("__lkp_tgt"),
            ).dropDuplicates(["__lkp_src"])
        )
        left = F.upper(df[col]) if case_insensitive else df[col]
        out = df.join(F.broadcast(lkp), left == F.col("__lkp_src"), "left")
        return out.withColumn(col, F.coalesce(F.col("__lkp_tgt"), F.col(col))).drop(
            "__lkp_src", "__lkp_tgt"
        )

    return _apply
