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

__all__ = [
    "global_rank",
    "quantile_bin",
    "weighted_quantile",
    "weighted_quantile_sql",
    "systematic_weighted_sample",
    "systematic_weighted_sample_sql",
    "grouped_global_rank",
    "grouped_weighted_quantile",
    "grouped_weighted_quantile_sql",
    "quantile_normalize",
    "quantile_normalize_sql",
]


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
            # r14: checkpoint BEFORE the range exchange — range
            # partitioning samples its whole input first, so the raw
            # input pipeline used to execute twice (sampling pass +
            # shuffle); both passes now read one materialization.
            df.localCheckpoint(eager=False)
            .repartitionByRange(n_ranges, *cols)
            .withColumn("_pid", F.spark_partition_id())
            # ...and checkpoint AFTER it too: the offsets branch and the
            # rank join below MUST see the SAME sampled range boundaries.
            # Exchange reuse is not guaranteed (the offsets side executes
            # inside a broadcast build under AQE), and a re-run range
            # exchange re-samples boundaries with a fresh seed — ranks
            # would then mix two boundary sets (caught as an intermittent
            # pr_threshold_sweep oracle mismatch at sf0.01, r14).
            .localCheckpoint(eager=False)
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
            # r14: checkpoint BEFORE the range exchange — range
            # partitioning samples its whole input first, so the raw
            # input pipeline used to execute twice (sampling pass +
            # shuffle); both passes now read one materialization.
            df_in.localCheckpoint(eager=False)
            .repartitionByRange(n_ranges, *cols)
            .withColumn("_pid", F.spark_partition_id())
            # ...and checkpoint AFTER it too: the offsets branch and the
            # rank join below MUST see the SAME sampled range boundaries.
            # Exchange reuse is not guaranteed (the offsets side executes
            # inside a broadcast build under AQE), and a re-run range
            # exchange re-samples boundaries with a fresh seed — ranks
            # would then mix two boundary sets (caught as an intermittent
            # pr_threshold_sweep oracle mismatch at sf0.01, r14).
            .localCheckpoint(eager=False)
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


def systematic_weighted_sample(
    order_cols: Sequence[str],
    weight_col: str,
    n_picks: int,
    n_ranges: int = 64,
):
    """Transform implementing DETERMINISTIC weight-proportional
    (PPS) systematic sampling — the reproducible sampler a training-mix
    builder needs (draw n documents proportional to token count, same
    draw on every cluster, no ``rand()`` anywhere).

    Classic systematic sampling over the cumulative-weight axis: lay the
    rows on [0, total) in ``order_cols`` order (pass a hash key, e.g.
    ``md5_long(id)``, plus a unique tie-break for a deterministic
    pseudo-random order), then walk the axis in strides of total/n — row
    r is picked once per stride boundary inside its weight interval
    ``(cum_w - w, cum_w]``::

        picks(r) = floor(cum_w·n/total) - floor((cum_w - w)·n/total)

    Exactly ``n`` picks are distributed in total (the n-th boundary lands
    at ``total`` exactly — pure integer arithmetic, no float strides);
    a row heavier than one stride is picked multiple times (standard PPS
    multiplicity), zero-weight rows are never picked. Emits the input
    columns + ``n_picks > 0`` rows with their multiplicity.

    Scale: the :func:`global_rank` decomposition on the weight axis —
    range-repartition + per-range weight offsets via the tiny
    ``n_ranges``-row window + a bounded within-range running sum. Never
    a single-partition sort. ``total·n_picks`` must stay inside signed
    64-bit (document weights, not byte counts, as the weight).
    """
    cols = [F.col(c) for c in order_cols]

    def apply(df_in: DataFrame) -> DataFrame:
        ranged = (
            # r14: checkpoint BEFORE the range exchange — range
            # partitioning samples its whole input first, so the raw
            # input pipeline used to execute twice (sampling pass +
            # shuffle); both passes now read one materialization.
            df_in.localCheckpoint(eager=False)
            .repartitionByRange(n_ranges, *cols)
            .withColumn("_pid", F.spark_partition_id())
            # ...and checkpoint AFTER it too: the offsets branch and the
            # rank join below MUST see the SAME sampled range boundaries.
            # Exchange reuse is not guaranteed (the offsets side executes
            # inside a broadcast build under AQE), and a re-run range
            # exchange re-samples boundaries with a fresh seed — ranks
            # would then mix two boundary sets (caught as an intermittent
            # pr_threshold_sweep oracle mismatch at sf0.01, r14).
            .localCheckpoint(eager=False)
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
        picks = F.expr(
            f"CAST((_cw * {n_picks}L) div _total"
            f" - ((_cw - {weight_col}) * {n_picks}L) div _total AS BIGINT)"
        )
        return (
            cum.withColumn("n_picks", picks)
            .filter(F.col("n_picks") > 0)
            .drop("_pid", "_off", "_total", "_cw")
        )

    return apply


def systematic_weighted_sample_sql(
    table_expr: str,
    select_cols: Sequence[str],
    order_exprs: Sequence[str],
    weight_expr: str,
    n_picks: int,
) -> str:
    """DuckDB rendering of :func:`systematic_weighted_sample` (one
    cumulative window over the same total order — the single-node
    collapse of the range decomposition, value-identical)."""
    sel = ", ".join(select_cols)
    order = ", ".join(order_exprs)
    return f"""
WITH cum AS (
  SELECT {sel}, {weight_expr} AS w,
         CAST(sum({weight_expr}) OVER (ORDER BY {order}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cw,
         CAST(sum({weight_expr}) OVER () AS BIGINT) AS total
  FROM {table_expr}
)
SELECT {sel},
       CAST((cw * {n_picks}) // total
            - ((cw - w) * {n_picks}) // total AS BIGINT) AS n_picks
FROM cum
WHERE (cw * {n_picks}) // total - ((cw - w) * {n_picks}) // total > 0
"""


def grouped_global_rank(
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "rank",
    n_ranges: int = 64,
    with_total: str | None = None,
):
    """Exact per-group global rank for the FEW-HUGE-GROUPS regime, where
    ``row_number() OVER (PARTITION BY grp ORDER BY ...)`` funnels each
    giant group through one task (5 order priorities × 20 B rows = 5
    stragglers).

    Same decomposition as :func:`global_rank`, carried per group: one
    range-repartition on ``(group_cols..., order_cols...)`` (so a group's
    rows land in contiguous ranges and each range holds bounded rows
    regardless of group size), per-``(range, group)`` counts, exclusive
    offsets via a window over the tiny ``n_ranges × n_groups`` frame,
    and ``row_number`` inside the bounded ``(range, group)`` cell.
    ``out_col`` is the 0-based rank within the row's group under
    ``ORDER BY order_cols`` (unique tie-break required); ``with_total``
    optionally attaches the group's row count (free from the offsets
    frame).

    Scale: intended for BOUNDED group cardinality (the offsets frame and
    its broadcast are O(n_ranges·n_groups)); with millions of small
    groups use a plain partitioned window instead — each group already
    fits a task. NULL group keys are legitimate (null-safe offset join).
    """
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]

    def apply(df_in: DataFrame) -> DataFrame:
        ranged = (
            # r14: checkpoint BEFORE the range exchange — range
            # partitioning samples its whole input first, so the raw
            # input pipeline used to execute twice (sampling pass +
            # shuffle); both passes now read one materialization.
            df_in.localCheckpoint(eager=False)
            .repartitionByRange(n_ranges, *gcols, *ocols)
            .withColumn("_pid", F.spark_partition_id())
            # ...and checkpoint AFTER it too: the offsets branch and the
            # rank join below MUST see the SAME sampled range boundaries.
            # Exchange reuse is not guaranteed (the offsets side executes
            # inside a broadcast build under AQE), and a re-run range
            # exchange re-samples boundaries with a fresh seed — ranks
            # would then mix two boundary sets (caught as an intermittent
            # pr_threshold_sweep oracle mismatch at sf0.01, r14).
            .localCheckpoint(eager=False)
        )
        counts = ranged.groupBy("_pid", *gcols).agg(
            F.count(F.lit(1)).alias("_n")
        )
        w = Window.partitionBy(*gcols).orderBy("_pid")  # ranges/group — bounded
        offsets = counts.select(
            "_pid",
            *gcols,
            F.coalesce(
                F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long").alias("_off"),
            F.sum("_n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).cast("long").alias("_gtotal"),
        )
        r, o = ranged.alias("_r"), offsets.alias("_o")
        cond = F.col("_r._pid") == F.col("_o._pid")
        for g in group_cols:
            cond = cond & F.col(f"_r.{g}").eqNullSafe(F.col(f"_o.{g}"))
        within = Window.partitionBy(
            F.col("_r._pid"), *[F.col(f"_r.{g}") for g in group_cols]
        ).orderBy(*[F.col(f"_r.{c}") for c in order_cols])
        out = (
            r.join(F.broadcast(o), cond)
            .select(
                "_r.*",
                F.col("_o._off").alias("_off"),
                F.col("_o._gtotal").alias("_gtotal"),
            )
            .withColumn(
                out_col,
                (F.col("_off") + F.row_number().over(within) - F.lit(1)).cast(
                    "long"
                ),
            )
        )
        if with_total:
            out = out.withColumn(with_total, F.col("_gtotal"))
        return out.drop("_pid", "_off", "_gtotal")

    return apply


def grouped_weighted_quantile(
    group_cols: Sequence[str],
    value_cols: Sequence[str],
    weight_col: str,
    quantiles: Sequence[tuple[int, int]],
    n_ranges: int = 64,
):
    """Exact weighted quantiles PER GROUP at scale — the grouped
    completion of :func:`weighted_quantile` (which is global-only): for
    each group and each ``(num, den)`` quantile, the smallest value (by
    ``value_cols`` order, unique tie-break required) whose cumulative
    integer weight w within the group satisfies ``w·den ≥ num·total_g``::

        (group..., q_num, q_den, <value_cols...>)

    The :func:`grouped_global_rank` decomposition carried onto the
    weight axis: range-repartition on ``(group..., value...)``, weight
    sums per (range, group), exclusive offsets + group totals over the
    tiny ranges×groups window, within-cell running weight, then ONE
    aggregation with a conditional min per quantile. Degenerate groups
    (zero total weight) emit no row for unreachable quantiles — matching
    the SQL rendering. Intended for BOUNDED group cardinality (few huge
    groups); millions of tiny groups should use a plain per-group window.
    """
    gcols = [F.col(c) for c in group_cols]
    vcols = [F.col(c) for c in value_cols]

    def apply(df_in: DataFrame) -> DataFrame:
        ranged = (
            # r14: checkpoint BEFORE the range exchange — range
            # partitioning samples its whole input first, so the raw
            # input pipeline used to execute twice (sampling pass +
            # shuffle); both passes now read one materialization.
            df_in.localCheckpoint(eager=False)
            .repartitionByRange(n_ranges, *gcols, *vcols)
            .withColumn("_pid", F.spark_partition_id())
            # ...and checkpoint AFTER it too: the offsets branch and the
            # rank join below MUST see the SAME sampled range boundaries.
            # Exchange reuse is not guaranteed (the offsets side executes
            # inside a broadcast build under AQE), and a re-run range
            # exchange re-samples boundaries with a fresh seed — ranks
            # would then mix two boundary sets (caught as an intermittent
            # pr_threshold_sweep oracle mismatch at sf0.01, r14).
            .localCheckpoint(eager=False)
        )
        wsums = ranged.groupBy("_pid", *gcols).agg(
            F.sum(F.col(weight_col)).cast("long").alias("_w")
        )
        w = Window.partitionBy(*gcols).orderBy("_pid")  # ranges/group
        offsets = wsums.select(
            "_pid",
            *gcols,
            F.coalesce(
                F.sum("_w").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long").alias("_off"),
            F.sum("_w").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).cast("long").alias("_total"),
        )
        r, o = ranged.alias("_r"), offsets.alias("_o")
        cond = F.col("_r._pid") == F.col("_o._pid")
        for g in group_cols:
            cond = cond & F.col(f"_r.{g}").eqNullSafe(F.col(f"_o.{g}"))
        within = Window.partitionBy(
            F.col("_r._pid"), *[F.col(f"_r.{g}") for g in group_cols]
        ).orderBy(*[F.col(f"_r.{c}") for c in value_cols]).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = (
            r.join(F.broadcast(o), cond)
            .select(
                "_r.*",
                F.col("_o._off").alias("_off"),
                F.col("_o._total").alias("_total"),
            )
            .withColumn(
                "_cw",
                F.col("_off")
                + F.sum(F.col(weight_col)).over(within).cast("long"),
            )
        )
        row = cum.groupBy(*group_cols).agg(
            *[
                F.min(
                    F.when(
                        F.col("_cw") * F.lit(den) >= F.lit(num) * F.col("_total"),
                        F.struct(*vcols),
                    )
                ).alias(f"_v{i}")
                for i, (num, den) in enumerate(quantiles)
            ]
        )
        stacked = row.select(
            *group_cols,
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
            ).alias("_q"),
        )
        return stacked.filter(F.col("_q._v").isNotNull()).select(
            *group_cols,
            F.col("_q.q_num").alias("q_num"),
            F.col("_q.q_den").alias("q_den"),
            *[F.col(f"_q._v.{c}").alias(c) for c in value_cols],
        )

    return apply


def grouped_weighted_quantile_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    value_cols: Sequence[str],
    weight_expr: str,
    quantiles: Sequence[tuple[int, int]],
) -> str:
    """DuckDB rendering of :func:`grouped_weighted_quantile` (per-group
    cumulative window + one first-crossing pick per quantile, UNION ALL
    across quantiles — the single-node collapse, value-identical)."""
    g = ", ".join(group_exprs)
    vlist = ", ".join(value_cols)
    picks = []
    for num, den in quantiles:
        picks.append(f"""
SELECT {g}, {num} AS q_num, {den} AS q_den, {vlist}
FROM (
  SELECT {g}, {vlist},
         row_number() OVER (PARTITION BY {g} ORDER BY {vlist}) AS rn
  FROM cum WHERE cw * {den} >= {num} * total
) WHERE rn = 1""")
    body = "\nUNION ALL\n".join(picks)
    return f"""
WITH cum AS (
  SELECT {g}, {vlist},
         CAST(sum({weight_expr}) OVER (PARTITION BY {g} ORDER BY {vlist}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cw,
         CAST(sum({weight_expr}) OVER (PARTITION BY {g}) AS BIGINT) AS total
  FROM {table_expr}
)
{body}
"""



def quantile_normalize(
    value_cols: Sequence[str],
    ref: DataFrame,
    ref_value_cols: Sequence[str],
    out_col: str = "norm",
    n_ranges: int = 64,
):
    """Map every row's value onto the REFERENCE distribution's value at
    the same quantile — classic quantile normalization (the batch-effect
    / score-calibration workhorse: after it, the column's distribution
    IS the reference's). The row at 0-based rank r of n gets the
    reference row at rank ``floor(r·ref_n / n)``; the first element of
    ``ref_value_cols`` comes back as ``out_col``.

    Pure integer rank arithmetic. Both rankings come from the
    :func:`global_rank` range decomposition (neither side ever funnels
    through a single-partition sort); the reference row count attaches
    as a constant-key broadcast scalar; the mapping itself is ONE
    equi-join on the computed reference index (uniform by construction,
    each ref rank matched by ~n/ref_n rows). ``value_cols`` /
    ``ref_value_cols`` must each form a total order (unique tie-break
    last, as :func:`global_rank`).
    """

    def apply(df_in: DataFrame) -> DataFrame:
        ranked = df_in.transform(
            global_rank(value_cols, out_col="_r", with_total="_n",
                        n_ranges=n_ranges)
        )
        ranked_ref = ref.transform(
            global_rank(ref_value_cols, out_col="_rr", with_total="_rn",
                        n_ranges=n_ranges)
        ).select("_rr", "_rn", F.col(ref_value_cols[0]).alias(out_col))
        one = F.pmod(F.hash(F.lit(1)), F.lit(1))
        rn = ranked_ref.groupBy().agg(
            F.max("_rn").cast("long").alias("_rn")
        ).withColumn("_one", one)
        base = (
            ranked.withColumn("_one", one)
            .join(F.broadcast(rn), "_one")
            .withColumn("_idx", F.expr("CAST((_r * _rn) div _n AS BIGINT)"))
        )
        return (
            base.join(
                ranked_ref.select("_rr", out_col),
                base["_idx"] == F.col("_rr"),
            )
            .drop("_r", "_n", "_rn", "_one", "_idx", "_rr")
        )

    return apply


def quantile_normalize_sql(
    table_expr: str,
    select_cols: Sequence[str],
    value_exprs: Sequence[str],
    ref_expr: str,
    ref_value_exprs: Sequence[str],
    out_col: str = "norm",
) -> str:
    """DuckDB rendering of :func:`quantile_normalize` (two plain rank
    windows + the same floored index join — the single-node collapse,
    value-identical)."""
    sel = ", ".join(f"b.{c}" for c in select_cols)
    vorder = ", ".join(value_exprs)
    rorder = ", ".join(ref_value_exprs)
    return f"""
WITH base0 AS (
  SELECT *, CAST(row_number() OVER (ORDER BY {vorder}) - 1 AS BIGINT) AS r,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM {table_expr}
),
ref_ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY {rorder}) - 1 AS BIGINT) AS rr,
         {ref_value_exprs[0]} AS {out_col}
  FROM {ref_expr}
),
ref_n AS (SELECT CAST(count(*) AS BIGINT) AS rn FROM ({ref_expr})),
base AS (
  SELECT b.*, (b.r * ref_n.rn) // b.n AS idx FROM base0 b CROSS JOIN ref_n
)
SELECT {sel}, rf.{out_col}
FROM base b JOIN ref_ranked rf ON b.idx = rf.rr
"""


def salted_grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Exact top-``k`` rows per group by ``(value desc, id asc)`` —
    skew-safe::

        (group..., <value_col>, <id_col>, rank)

    The naive ``row_number() OVER (PARTITION BY group)`` puts every row
    of a hot group through ONE task; this runs two bounded phases
    instead: a pre-rank partitioned by ``(group, salt)`` (salt =
    ``md5(id) % n_salts``, deterministic — never ``rand()``) keeps k
    rows per salt, then the final rank runs over ≤ k·n_salts rows per
    group.  Correct because a group's true top-k is contained in the
    union of its per-salt top-ks (each true top-k row is top-k within
    its own salt a fortiori).  Identical output to the single-window
    form — the oracle IS that form.

    Interplay with Catalyst: Spark ≥3.5 plans a ``row_number ≤ k``
    filter as ``WindowGroupLimit`` (partial per-mapper top-k below the
    shuffle), which already removes most of the naive form's skew pain
    ON SPARK.  The salted phase keeps the per-partition bound explicit
    (k·n_salts rows per group regardless of optimizer version or
    engine) — plan-pinned so both shapes coexist.
    """
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    order = [F.col(value_col).desc(), F.col(id_col).asc()]
    salt = F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_salts))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(*group_cols, value_col, id_col, F.col("rank").cast("long"))
    )


def salted_grouped_topk_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    value_expr: str,
    id_expr: str,
    k: int,
) -> str:
    """DuckDB rendering of :func:`salted_grouped_topk` — deliberately
    the SINGLE-window form (the semantic definition), so parity also
    proves the two-phase salted decomposition loses no row."""
    g = ", ".join(group_exprs)
    return f"""
SELECT {g}, {value_expr}, {id_expr}, CAST(rank AS BIGINT) AS rank FROM (
  SELECT {g}, {value_expr}, {id_expr},
         row_number() OVER (PARTITION BY {g}
             ORDER BY {value_expr} DESC, {id_expr} ASC) AS rank
  FROM {table_expr}
) WHERE rank <= {k}
"""


def weighted_reservoir_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: str,
    n_salts: int = 16,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis–Spirakis A-ES reservoir (each row's inclusion
    probability proportional to its weight, no row twice), fully
    deterministic::

        (group..., aes_key_micro, <id_col>, rank)

    Per row, ``u = (md5(seed:id) + 1)/(2⁶⁰ + 1)`` (seed-keyed md5,
    NEVER ``rand()`` — re-run with the same seed → bit-identical
    sample, new seed → fresh draws) and the A-ES order key is
    ``u^(1/w)``, carried monotonically as ``round(ln(u)/w · 10⁶)``
    (one IEEE ln + one division on exact integers — the PMI float
    discipline; micro-quantization ties break by id, documented).
    Rows with ``weight ≤ 0`` or NULL leave the draw domain.

    Scale: the key is a scan-side expression; the per-group top-k is
    :func:`salted_grouped_topk` (two bounded phases — no hot-group
    single-task window). The SQL oracle is the naive single-window
    form over the same keys.
    """
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    h = md5_long(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**60 + 1))
    key = F.round(
        F.log(u) / F.col(weight_col).cast("double") * F.lit(1000000.0)
    ).cast("long")
    base = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            *[F.col(c) for c in group_cols],
            key.alias("aes_key_micro"),
            F.col(id_col),
        )
    )
    return salted_grouped_topk(
        base, list(group_cols), "aes_key_micro", id_col, k, n_salts=n_salts
    )


def weighted_reservoir_sample_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    id_expr: str,
    weight_expr: str,
    k: int,
    seed: str,
) -> str:
    """DuckDB rendering of :func:`weighted_reservoir_sample` — the naive
    single-window form over the same md5-derived keys."""
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    h = md5_long_sql(f"concat_ws(':', '{seed}', CAST({id_expr} AS VARCHAR))")
    return f"""
WITH keyed AS (
  SELECT {gsel}
         CAST(round(ln((CAST({h} AS DOUBLE) + 1.0) / {float(2**60 + 1)!r})
                    / CAST({weight_expr} AS DOUBLE) * 1000000.0) AS BIGINT)
           AS aes_key_micro,
         {id_expr} AS id_out
  FROM {table_expr}
  WHERE {weight_expr} IS NOT NULL AND {weight_expr} > 0
),
ranked AS (
  SELECT *, row_number() OVER ({part}ORDER BY aes_key_micro DESC, id_out)
           AS rank
  FROM keyed
)
SELECT {gsel}aes_key_micro, id_out AS {id_expr}, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
