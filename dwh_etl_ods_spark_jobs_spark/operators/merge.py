"""Full-outer merge with per-side coalesce.

Reference: the Historical-ART-Outcomes script combines the latest clinical
visit with the latest pharmacy dispense per patient via FULL JOIN then
COALESCE on every shared key/column
(``LoadHistoricalARTOutcomes.sql:158-182``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_outer_coalesce(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    null_safe: bool = True,
) -> DataFrame:
    """Full outer join on ``keys``; key columns are coalesced into one;
    non-key columns keep their side's name (caller resolves collisions by
    renaming upstream)."""
    # Rename key columns on each side before joining: avoids self-join
    # lineage ambiguity when both sides derive from the same base DataFrame.
    lft = left
    rgt = right
    for k in keys:
        lft = lft.withColumnRenamed(k, f"__l_{k}")
        rgt = rgt.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in keys:
        lc, rc = F.col(f"__l_{k}"), F.col(f"__r_{k}")
        c = lc.eqNullSafe(rc) if null_safe else lc == rc
        cond = c if cond is None else cond & c
    joined = lft.join(rgt, cond, "full")
    out_cols = [F.coalesce(F.col(f"__l_{k}"), F.col(f"__r_{k}")).alias(k) for k in keys]
    out_cols += [F.col(c) for c in left.columns if c not in keys]
    out_cols += [F.col(c) for c in right.columns if c not in keys]
    return joined.select(*out_cols)
