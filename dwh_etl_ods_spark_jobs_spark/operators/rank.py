"""Distributed global rank and equal-frequency (quantile) binning.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole table through ONE task — the canonical Spark straggler. This module
gives the scale-safe equivalent: range-repartition on the sort key (the
same reservoir-sampled boundaries ``write_range_sorted`` uses, so skewed
keys still split evenly), count per range, fold the per-range counts into
exclusive offsets over a tiny ``n_ranges``-row window (the only global
step), and ``row_number`` INSIDE each bounded range. The result is the
exact global rank, independent of where the sampled boundaries land
(offsets absorb them) — cf. ``curation.epoch_shuffle``, which does the
same decomposition on uniform md5 keys; this one works for ARBITRARY
sort columns because the ranges come from the data's own distribution.

Equal-frequency binning (``quantile_bin``) is the ML feature-prep
consumer: bin k of B holds ranks [k·n/B, (k+1)·n/B) — exact integer
arithmetic, no percentile floats, identical in any SQL engine as
``(row_number - 1) * B // n``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_rank", "quantile_bin"]


def global_rank(
    order_cols: Sequence[str],
    out_col: str = "rank",
    n_ranges: int = 64,
    with_total: str | None = None,
):
    """Transform adding the 0-based exact global rank under
    ``ORDER BY order_cols``.

    ``order_cols`` MUST form a total order (include a unique tie-break
    key) — otherwise ties rank non-deterministically within a range.
    ``with_total`` optionally adds the total row count column (free: it
    is the last range's offset + count, already in the tiny offsets
    frame). Scale: one range shuffle of the data + one bounded-partition
    window; never a single-partition sort.
    """
    cols = [F.col(c) for c in order_cols]

    def apply(df: DataFrame) -> DataFrame:
        ranged = (
            df.repartitionByRange(n_ranges, *cols)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=False)  # referenced twice below
        )
        counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
        w = Window.orderBy("_pid")  # n_ranges rows — bounded
        offsets = counts.select(
            "_pid",
            F.coalesce(
                F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long").alias("_off"),
            F.sum("_n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).cast("long").alias("_total"),
        )
        within = Window.partitionBy("_pid").orderBy(*cols)
        out = ranged.join(F.broadcast(offsets), "_pid").withColumn(
            out_col,
            (F.col("_off") + F.row_number().over(within) - F.lit(1)).cast("long"),
        )
        if with_total:
            out = out.withColumn(with_total, F.col("_total"))
        return out.drop("_pid", "_off", "_total")

    return apply


def quantile_bin(
    value_cols: Sequence[str],
    n_bins: int,
    out_col: str = "bin",
    n_ranges: int = 64,
):
    """Transform adding the exact equal-frequency bin (0..n_bins-1) under
    ``ORDER BY value_cols`` (unique tie-break required, as
    :func:`global_rank`): ``bin = rank0 * n_bins div n`` — bins differ in
    size by at most 1 row, bit-identical to the SQL rendering
    ``(row_number() OVER (ORDER BY ...) - 1) * n_bins // count(*)``.
    """

    def apply(df: DataFrame) -> DataFrame:
        ranked = df.transform(
            global_rank(value_cols, out_col="_rk", with_total="_n", n_ranges=n_ranges)
        )
        return ranked.withColumn(
            out_col,
            F.expr(f"CAST((_rk * {n_bins}) div _n AS INT)"),
        ).drop("_rk", "_n")

    return apply
