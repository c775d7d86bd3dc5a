"""Incremental-new-records detection: the null-safe left anti join.

THE core operator of the reference — every one of its 51 Spark jobs ends in
``SELECT s.* FROM source s LEFT ANTI JOIN target t ON s.k1 <=> t.k1 AND ...``
(``LoadCTPatients.java:182-183`` and the key catalog in SURVEY.md §2.4).
Null-safe equality matters: a NULL source key must match a NULL target key
(and NOT be re-appended), which plain ``=`` would break.

Scale notes:
- Catalyst plans ``eqNullSafe`` keys as hashable join keys -> a normal
  BroadcastHashJoin / SortMergeJoin, not a nested-loop join.
- The target side only needs its key columns: we project them before the
  join so the "full read of the ODS target" (reference step 8) prunes to
  the key columns at the parquet/JDBC scan.
- At 100 TB the anti-join shuffles both sides on the key; feeding it a
  source already partitioned by the same key (dedupe_latest upstream) lets
  AQE reuse the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_new(
    target: DataFrame,
    keys: Sequence[str] | Sequence[tuple[str, str]],
    target_key_exprs: dict[str, "F.Column"] | None = None,
) -> "callable":
    """Return only source rows whose key tuple is absent from ``target``.

    ``keys`` entries are either a column name used on both sides, or a
    ``(source_col, target_col)`` pair. ``target_key_exprs`` lets a key be an
    expression on the target side (the reference's
    ``cast(s.VisitDate as date) <=> t.VisitDate``,
    ``LoadAdverseEvents.java:145-146`` — pass the cast on the source side
    via a withColumn upstream, or here for the target).
    """
    norm_keys = [(k, k) if isinstance(k, str) else (k[0], k[1]) for k in keys]
    tgt_cols = []
    for _, tk in norm_keys:
        expr = (target_key_exprs or {}).get(tk, F.col(tk))
        tgt_cols.append(expr.alias(f"__tgt_{tk}"))

    def _apply(source: DataFrame) -> DataFrame:
        # Project target to key columns only: column pruning reaches the scan.
        tgt = target.select(*tgt_cols)
        cond = None
        for sk, tk in norm_keys:
            c = source[sk].eqNullSafe(tgt[f"__tgt_{tk}"])
            cond = c if cond is None else cond & c
        return source.join(tgt, cond, "left_anti")

    return _apply


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """Incremental view maintenance for mergeable aggregates: fold a
    delta's partial aggregates into a stored state frame so the view is
    maintained per batch instead of recomputed from the full fact.

    Both inputs carry the SAME aggregate columns (counts, sums, mins,
    maxs over their own slice of the fact); the merge is
    ``union → one groupBy(keys)`` re-combining each column with its own
    combiner (sum+sum, min-of-min, max-of-max) — exactly Spark's own
    partial-aggregation contract, lifted to cross-batch granularity.
    Merging is associative and commutative, so any batch arrival order
    yields the identical view, and merging N deltas costs O(state) per
    batch, never O(full fact) (the oracle proves merged == recomputed).
    """
    combined = state.unionByName(delta)
    aggs = [F.sum(count_col).cast("long").alias(count_col)]
    aggs += [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.min(c).alias(c) for c in min_cols]
    aggs += [F.max(c).alias(c) for c in max_cols]
    return combined.groupBy(*keys).agg(*aggs)
