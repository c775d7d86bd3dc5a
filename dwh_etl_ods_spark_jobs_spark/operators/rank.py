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

__all__ = ["global_rank", "quantile_bin", "weighted_quantile", "weighted_quantile_sql"]


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


def weighted_quantile(
    value_cols: Sequence[str],
    weight_col: str,
    quantiles: Sequence[tuple[int, int]],
    n_ranges: int = 64,
):
    """Exact weighted quantiles at scale: for each ``(num, den)`` quantile
    the SMALLEST value (by ``value_cols`` order, unique tie-break
    required) whose cumulative integer weight w satisfies
    ``w·den >= num·total`` — the standard left-continuous weighted
    quantile, in pure integer arithmetic (no fraction ever
    materializes)::

        (q_num, q_den, <value_cols...>)

    Same decomposition as :func:`global_rank`, but the offsets fold
    per-range WEIGHT sums instead of counts: range-repartition on the
    sort key, per-range weight totals -> exclusive weight offsets (tiny
    window), within-range running weight, then one filter + min per
    quantile. Weights must be non-negative BIGINTs. Scale: one range
    shuffle + a bounded window; never a single-partition sort.
    """
    cols = [F.col(c) for c in value_cols]

    def apply(df_in: DataFrame) -> DataFrame:
        ranged = (
            df_in.repartitionByRange(n_ranges, *cols)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=False)  # referenced twice below
        )
        wsums = ranged.groupBy("_pid").agg(
            F.sum(F.col(weight_col)).cast("long").alias("_w")
        )
        w = Window.orderBy("_pid")  # n_ranges rows — bounded
        offsets = wsums.select(
            "_pid",
            F.coalesce(
                F.sum("_w").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long").alias("_off"),
            F.sum("_w").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).cast("long").alias("_total"),
        )
        within = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = (
            ranged.join(F.broadcast(offsets), "_pid")
            .withColumn(
                "_cw",
                F.col("_off")
                + F.sum(F.col(weight_col)).over(within).cast("long"),
            )
        )
        # SINGLE PASS over the cum frame: one conditional min per quantile
        # in ONE aggregation job (was one filter+agg job per quantile).
        # min() ignores NULLs, so min(when(crossed, struct)) is the
        # smallest qualifying value; a quantile no row qualifies for
        # (empty input / zero total weight) yields a NULL struct, which is
        # DROPPED — matching the SQL rendering's 'ORDER BY ... LIMIT 1'
        # subquery emitting zero rows on the degenerate input (ADVICE r8).
        row = cum.groupBy().agg(
            *[
                F.min(
                    F.when(
                        F.col("_cw") * F.lit(den) >= F.lit(num) * F.col("_total"),
                        F.struct(*cols),
                    )
                ).alias(f"_v{i}")
                for i, (num, den) in enumerate(quantiles)
            ]
        )
        stacked = row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(num).alias("q_num"),
                            F.lit(den).alias("q_den"),
                            F.col(f"_v{i}").alias("_v"),
                        )
                        for i, (num, den) in enumerate(quantiles)
                    ]
                )
            ).alias("_q")
        )
        return stacked.filter(F.col("_q._v").isNotNull()).select(
            F.col("_q.q_num").alias("q_num"),
            F.col("_q.q_den").alias("q_den"),
            *[F.col(f"_q._v.{c}").alias(c) for c in value_cols],
        )

    return apply


def weighted_quantile_sql(
    table_expr: str,
    value_cols: Sequence[str],
    weight_expr: str,
    quantiles: Sequence[tuple[int, int]],
) -> str:
    """DuckDB rendering of :func:`weighted_quantile` (window cumulative
    weight + per-quantile first-crossing pick)."""
    vlist = ", ".join(value_cols)
    picks = [
        f"""SELECT {num} AS q_num, {den} AS q_den, {vlist}
FROM (SELECT {vlist} FROM cum
      WHERE cw * {den} >= {num} * total
      ORDER BY {vlist} LIMIT 1)"""
        for num, den in quantiles
    ]
    return f"""
WITH cum AS (
  SELECT {vlist},
         sum({weight_expr}) OVER (ORDER BY {vlist}
                                  ROWS UNBOUNDED PRECEDING) AS cw,
         sum({weight_expr}) OVER () AS total
  FROM {table_expr}
)
""" + "\nUNION ALL\n".join(picks)
