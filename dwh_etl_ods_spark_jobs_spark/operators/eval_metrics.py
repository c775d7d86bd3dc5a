"""Classifier-evaluation metrics as exact-integer distributed folds.

A training-data pipeline that fits quality/toxicity/language classifiers
needs the evaluation side in the SAME engine as the data: AUC of a score
against binary labels (Mann-Whitney rank-sum form, tie-corrected) and the
calibration (reliability) curve over equal-frequency score bins. Both are
exact-integer end-to-end — rank sums and counts, no floats — so Spark and
the DuckDB oracle agree bit-for-bit.

Scale design: AUC never sorts globally — the distinct-score frame is
range-repartitioned and prefix sums attach via the bounded offsets-window
decomposition (operators/rank.py discipline). Calibration reuses
:func:`operators.rank.quantile_bin` (same range decomposition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def auc_mann_whitney(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_ranges: int = 64,
) -> DataFrame:
    """Exact ROC-AUC of integer ``score_col`` against 0/1 ``label_col``
    via the Mann-Whitney U statistic, tie-corrected::

        (n_pos, n_neg, n_scores, auc_ppm)

    ``AUC = (R1 - n1(n1+1)/2) / (n1·n0)`` where ``R1`` is the positive
    class's rank sum under midrank ties. Everything stays integral by
    carrying ``2·R1``: for each distinct score ``s`` with ``c`` rows
    (``p`` positive) and ``b`` rows strictly below,
    ``2·Σranks(s) = p·(2b + c + 1)``; then
    ``auc_ppm = (2R1 − n1(n1+1))·10⁶ div (2·n1·n0)``.

    Scale: one groupBy(score) (map-side combinable), then the ENTIRE
    prefix-sum runs on the distinct-score frame via range repartition +
    bounded offsets window — never a single-partition ORDER BY. BIGINT
    bound: ``2·R1 ≤ 2n²`` caps n at ~2·10⁹ rows per call; shard by
    stratum and average above that.
    """
    lbl = F.col(label_col).cast("long")
    g = df.groupBy(F.col(score_col).cast("long").alias("_s")).agg(
        F.sum(lbl).alias("_np"),
        F.sum(F.lit(1) - lbl).alias("_nn"),
    )
    ranged = (
        g.repartitionByRange(n_ranges, F.col("_s"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # offsets + prefix read it twice
    )
    part_tot = ranged.groupBy("_pid").agg(
        F.sum(F.col("_np") + F.col("_nn")).alias("_cnt")
    )
    w = Window.orderBy("_pid")  # n_ranges rows — bounded
    offsets = part_tot.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long").alias("_off"),
    )
    within = Window.partitionBy("_pid").orderBy("_s")
    cum_before = F.col("_off") + F.coalesce(
        F.sum(F.col("_np") + F.col("_nn")).over(
            within.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    scored = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("_b", cum_before)
        .withColumn(
            "_r2",
            F.col("_np")
            * (F.lit(2) * F.col("_b") + F.col("_np") + F.col("_nn") + F.lit(1)),
        )
    )
    return scored.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        F.expr(
            f"CAST((sum(_r2) - sum(_np) * (sum(_np) + 1)) * {PPM}"
            " div (2 * sum(_np) * sum(_nn)) AS BIGINT)"
        ).alias("auc_ppm"),
    )


def auc_mann_whitney_sql(
    table_expr: str, score_expr: str, label_expr: str
) -> str:
    """DuckDB rendering of :func:`auc_mann_whitney` — same grouped
    midrank identity, same integer fold."""
    return f"""
WITH g AS (
  SELECT CAST({score_expr} AS BIGINT) AS s,
         CAST(sum(CAST({label_expr} AS BIGINT)) AS BIGINT) AS np,
         CAST(sum(1 - CAST({label_expr} AS BIGINT)) AS BIGINT) AS nn
  FROM {table_expr} GROUP BY 1
),
pre AS (
  SELECT np, nn,
         CAST(coalesce(sum(np + nn) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
  FROM g
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nn) AS BIGINT) AS n_neg,
       CAST(count(*) AS BIGINT) AS n_scores,
       CAST((sum(np * (2 * b + np + nn + 1)) - sum(np) * (sum(np) + 1))
            * {PPM} // (2 * sum(np) * sum(nn)) AS BIGINT) AS auc_ppm
FROM pre
"""


def calibration_bins(
    df: DataFrame,
    score_cols: Sequence[str],
    label_col: str,
    n_bins: int = 10,
    n_ranges: int = 64,
) -> DataFrame:
    """Reliability curve over exact equal-frequency score bins::

        (bin, n, n_pos, pos_rate_ppm, score_lo, score_hi)

    ``score_cols`` must total-order (unique tie-break last, the
    :func:`operators.rank.quantile_bin` contract); the first entry is
    the score whose lo/hi bounds are reported. A well-calibrated score
    has ``pos_rate_ppm`` monotone in ``bin`` and near the bin's mean
    score — the standing check for every quality-classifier refresh.

    Scale: the binning is the range-decomposed exact rank (no global
    sort); the per-bin fold is an ordinary n_bins-group aggregation.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_bin

    lbl = F.col(label_col).cast("long")
    binned = df.transform(
        quantile_bin(list(score_cols), n_bins, out_col="_bin", n_ranges=n_ranges)
    )
    s0 = F.col(score_cols[0]).cast("long")
    return (
        binned.groupBy(F.col("_bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(lbl).cast("long").alias("n_pos"),
            F.min(s0).cast("long").alias("score_lo"),
            F.max(s0).cast("long").alias("score_hi"),
        )
        .withColumn(
            "pos_rate_ppm",
            F.expr(f"CAST(n_pos * {PPM} div n AS BIGINT)"),
        )
        .select("bin", "n", "n_pos", "pos_rate_ppm", "score_lo", "score_hi")
    )


def calibration_bins_sql(
    table_expr: str,
    score_exprs: Sequence[str],
    label_expr: str,
    n_bins: int = 10,
) -> str:
    """DuckDB rendering of :func:`calibration_bins` (same
    ``(row_number-1)·n_bins // n`` exact bin formula)."""
    order = ", ".join(score_exprs)
    return f"""
WITH src AS (
  SELECT CAST({score_exprs[0]} AS BIGINT) AS s,
         CAST({label_expr} AS BIGINT) AS y,
         CAST((row_number() OVER (ORDER BY {order}) - 1) * {n_bins}
              // (count(*) OVER ()) AS BIGINT) AS bin
  FROM {table_expr}
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(sum(y) * {PPM} // count(*) AS BIGINT) AS pos_rate_ppm,
       CAST(min(s) AS BIGINT) AS score_lo,
       CAST(max(s) AS BIGINT) AS score_hi
FROM src GROUP BY bin
"""
