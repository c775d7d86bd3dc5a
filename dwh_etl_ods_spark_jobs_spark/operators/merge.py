"""Full-outer merge with per-side coalesce, and MERGE-INTO (upsert) apply.

Reference: the Historical-ART-Outcomes script combines the latest clinical
visit with the latest pharmacy dispense per patient via FULL JOIN then
COALESCE on every shared key/column
(``LoadHistoricalARTOutcomes.sql:158-182``). The reference's load jobs are
append-only (stage-and-swap full refresh or anti-join increments);
``merge_upsert`` extends the engine with the third standard load mode —
ANSI ``MERGE INTO`` / SCD Type-1 semantics (update matched, insert new,
delete tombstoned) — expressed as ONE full-outer join, which is exactly
the physical plan engines lower MERGE to.
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


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Apply a changeset to a target table with ANSI MERGE semantics:

    - key matched, tombstone            → row deleted
    - key matched, no tombstone         → row replaced by the change row
    - key only in changes, no tombstone → row inserted
    - key only in changes, tombstone    → no-op (delete of absent row)
    - key only in target                → row kept unchanged

    ``changes`` must share the target's schema (plus the optional BOOLEAN
    ``tombstone_col``) and hold at most one row per key — enforce upstream
    with ``dedupe_latest`` (classic CDC compaction) since "multiple source
    rows match one target row" is an error state in ANSI MERGE too.

    Plan: one null-safe full-outer join on ``keys`` — the same shape
    Delta/Iceberg lower MERGE INTO to — then a per-row arbitration select.
    Both sides shuffle once on the (uniform) key; no second pass, no
    driver-side diffing. At 100 TB the join is the cost floor of any merge;
    AQE handles a small changeset by broadcasting it.

    Returns the post-merge table (target schema, no tombstone column).
    """
    non_keys = [c for c in target.columns if c not in keys]
    chg = changes
    tomb = F.lit(False)
    if tombstone_col is not None:
        tomb = F.coalesce(F.col(f"__c_{tombstone_col}"), F.lit(False))
        chg = chg.withColumnRenamed(tombstone_col, f"__c_{tombstone_col}")
    for c in list(keys) + non_keys:
        chg = chg.withColumnRenamed(c, f"__c_{c}")
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__c_{k}"))
        cond = c if cond is None else cond & c
    # Matched-ness must be judged on a non-nullable marker, not a key
    # column (keys may legitimately hold NULL under eqNullSafe).
    tgt = target.withColumn("__t", F.lit(True))
    joined = tgt.join(
        chg.withColumn("__c", F.lit(True)), cond, "full"
    )
    in_target = F.col("__t").isNotNull()
    in_changes = F.col("__c").isNotNull()
    keep = (in_target & ~in_changes) | (in_changes & ~tomb)
    out = [
        F.when(in_changes, F.col(f"__c_{c}")).otherwise(F.col(c)).alias(c)
        for c in list(keys) + non_keys
    ]
    return joined.filter(keep).select(*out)


def apply_change_feed(
    target: DataFrame,
    feed: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_ops: Sequence[str] = ("d",),
) -> DataFrame:
    """Apply a CDC change feed (Debezium-style envelope: payload columns +
    an op code + a total-order position) to a snapshot:

    1. compact the feed to the LATEST change per key by ``order_cols``
       (ts, log offset — the standard CDC compaction; interleaved
       insert/update/delete generations resolve to whatever came last);
    2. map ``delete_ops`` codes to tombstones;
    3. one :func:`merge_upsert` (null-safe full-outer join) applies
       inserts, updates, and deletes in a single pass.

    ``feed`` must carry the target's payload columns plus ``op_col`` and
    ``order_cols``; op codes other than ``delete_ops`` (Debezium 'c',
    'u', 'r') all mean "this payload is the row's new state" — SCD1
    apply does not care which. Scale: one bounded window over the feed
    (keyed by the natural key) + the single merge join; a day's feed vs a
    100 TB snapshot broadcasts or AQE-skews like any merge changeset.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.dedupe import dedupe_latest

    latest = feed.transform(
        dedupe_latest(list(keys), [F.col(c).desc() for c in order_cols])
    )
    chg = latest.withColumn(
        "__tomb", F.col(op_col).isin(*[str(o) for o in delete_ops])
    ).drop(op_col, *order_cols)
    return merge_upsert(target, chg, keys, tombstone_col="__tomb")
