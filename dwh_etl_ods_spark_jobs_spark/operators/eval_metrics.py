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
    return auc_from_score_counts(g, "_s", "_np", "_nn", n_ranges=n_ranges)


def auc_from_score_counts(
    counts: DataFrame,
    score_col: str = "score",
    pos_col: str = "n_pos",
    neg_col: str = "n_neg",
    n_ranges: int = 64,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC from per-distinct-score class counts
    ``(score, n_pos, n_neg)`` — the MERGEABLE-STATE form of
    :func:`auc_mann_whitney` (which delegates here after its groupBy).

    The per-score count grid is a plain integer aggregation on
    deterministic keys, so it is exactly what a streaming
    ``groupBy(score)`` maintains (``streaming.streaming_score_counts``)
    and what two shards' AUC states merge into by adding cells: feed
    any snapshot here and the result is BIT-IDENTICAL to the batch AUC
    over the same rows (pytest-pinned stream==batch).

    Scale: the prefix-sum runs on the distinct-score frame via range
    repartition + bounded offsets windows — never a single-partition
    ORDER BY.
    """
    g = counts.select(
        F.col(score_col).cast("long").alias("_s"),
        F.col(pos_col).cast("long").alias("_np"),
        F.col(neg_col).cast("long").alias("_nn"),
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
        # single-class input leaves AUC 0/0-undefined: explicit NULL on
        # BOTH engines (Spark ANSI `div 0` throws; DuckDB `// 0` nulls)
        F.expr(
            f"CAST(CASE WHEN sum(_np) = 0 OR sum(_nn) = 0 THEN NULL"
            f" ELSE (sum(_r2) - sum(_np) * (sum(_np) + 1)) * {PPM}"
            " div (2 * sum(_np) * sum(_nn)) END AS BIGINT)"
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
       CAST(CASE WHEN sum(np) = 0 OR sum(nn) = 0 THEN NULL
            ELSE (sum(np * (2 * b + np + nn + 1)) - sum(np) * (sum(np) + 1))
                 * {PPM} // (2 * sum(np) * sum(nn)) END AS BIGINT) AS auc_ppm
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


# --- precision/recall/F1 threshold sweep -----------------------------------


def pr_threshold_sweep(
    df: DataFrame,
    score_cols: Sequence[str],
    label_col: str,
    n_bins: int = 10,
    n_ranges: int = 64,
) -> DataFrame:
    """Precision/recall/F1 at every equal-frequency score-decile
    threshold, one pass::

        (bin, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm)

    Row ``bin`` = the operating point "predict positive when the score
    falls in bin ``bin`` or above".  The bin assignment is the SAME
    range-decomposed exact rank as :func:`calibration_bins`; the sweep
    itself is a cumulative fold over the n_bins-row summary (a bounded
    unpartitioned window — never over the data).  Everything integral:
    ``f1_ppm = 2·P·R div (P+R)`` in ppm.

    ``score_cols`` must total-order (unique tie-break last).
    """
    bins = calibration_bins(
        df, score_cols, label_col, n_bins=n_bins, n_ranges=n_ranges
    ).select("bin", "n", "n_pos")
    return pr_sweep_from_counts(bins)


def pr_sweep_from_counts(bins: DataFrame) -> DataFrame:
    """PR/F1 sweep from an ALREADY-AGGREGATED ``(bin, n, n_pos)`` count
    grid — the MERGEABLE-STATE form of :func:`pr_threshold_sweep`
    (which delegates here after its rank-decile binning). The grid is
    exactly what a streaming per-bucket label counter maintains
    (``streaming.streaming_bucket_label_counts``: ``n = n_good +
    n_bad``, ``n_pos = n_bad``) and what shards merge by cell addition
    — so live precision/recall/F1 operating points come from counters
    alone, no score-log re-read (pytest-pinned stream==batch). One
    contract difference from the batch battery entry: the live form's
    bins are FIXED score thresholds (a per-row expression a counter can
    key on); the batch entry's equal-FREQUENCY rank deciles are
    snapshot-relative — an exact rank is not incrementally maintainable
    under inserts, so a decile readout over a stream means re-binning a
    snapshot, the standard trade documented in COVERAGE.md.

    NON-NULL-BIN CONTRACT (same as :func:`isotonic_from_counts`): a
    NULL bin (NULL score upstream of the counter) has no place on the
    ordered threshold axis — it would enter the descending cumulative
    fold at an engine-dependent position and silently skew tp/fp/
    recall. NULL bins are dropped HERE so every caller (batch decile
    path, streaming bucket grid, merged shards) gets the same axis."""
    bins = bins.where(F.col("bin").isNotNull())
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )  # n_bins rows — bounded
    cum = bins.select(
        "bin",
        F.sum("n").over(w).cast("long").alias("_pred"),
        F.sum("n_pos").over(w).cast("long").alias("tp"),
        F.sum(F.col("n_pos")).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("_allpos"),
    )
    prec = F.expr(f"CAST(tp * {PPM} div _pred AS BIGINT)")
    # zero positives anywhere -> recall undefined: explicit NULL (Spark
    # ANSI `div 0` throws; DuckDB `// 0` nulls — unified)
    rec = F.expr(
        f"CAST(CASE WHEN _allpos = 0 THEN NULL"
        f" ELSE tp * {PPM} div _allpos END AS BIGINT)"
    )
    return (
        cum.withColumn("fp", (F.col("_pred") - F.col("tp")).cast("long"))
        .withColumn("fn", (F.col("_allpos") - F.col("tp")).cast("long"))
        .withColumn("precision_ppm", prec)
        .withColumn("recall_ppm", rec)
        .withColumn(
            "f1_ppm",
            F.expr(
                "CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0"
                " ELSE 2 * precision_ppm * recall_ppm"
                " div (precision_ppm + recall_ppm) END AS BIGINT)"
            ),
        )
        .select(
            "bin", "tp", "fp", "fn", "precision_ppm", "recall_ppm", "f1_ppm"
        )
    )


def pr_threshold_sweep_sql(
    table_expr: str,
    score_exprs: Sequence[str],
    label_expr: str,
    n_bins: int = 10,
) -> str:
    """DuckDB rendering of :func:`pr_threshold_sweep`."""
    bins = calibration_bins_sql(
        table_expr, score_exprs, label_expr, n_bins=n_bins
    )
    return f"""
WITH bins AS ({bins}),
cum AS (
  SELECT bin,
         CAST(sum(n) OVER (ORDER BY bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS pred,
         CAST(sum(n_pos) OVER (ORDER BY bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS tp,
         CAST(sum(n_pos) OVER () AS BIGINT) AS allpos
  FROM bins
)
SELECT bin, tp,
       CAST(pred - tp AS BIGINT) AS fp,
       CAST(allpos - tp AS BIGINT) AS fn,
       CAST(tp * {PPM} // pred AS BIGINT) AS precision_ppm,
       CAST(tp * {PPM} // allpos AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN tp * {PPM} // pred + tp * {PPM} // allpos = 0 THEN 0
            ELSE 2 * (tp * {PPM} // pred) * (tp * {PPM} // allpos)
                 // (tp * {PPM} // pred + tp * {PPM} // allpos) END
            AS BIGINT) AS f1_ppm
FROM cum
"""


# --- Cohen's kappa ----------------------------------------------------------


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Inter-annotator agreement between two categorical label columns::

        (n, po_ppm, pe_ppm, kappa_ppm)

    ``po`` = observed agreement, ``pe`` = chance agreement from the two
    marginal distributions, ``kappa = (po − pe) / (1 − pe)``.  The
    marginals are ppm-quantized BEFORE the chance product (``pe_ppm =
    Σ_k pa_ppm·pb_ppm div PPM``) so every intermediate stays inside
    BIGINT at ANY row count — the unquantized ``Σ na·nb · PPM`` form
    overflows past ~3·10⁶ rows.  One data pass (the confusion-matrix
    groupBy); everything after runs on the bounded labels² frame.
    """
    cm = df.groupBy(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    return cohens_kappa_from_cm(cm)


def cohens_kappa_from_cm(cm: DataFrame) -> DataFrame:
    """Kappa from an ALREADY-AGGREGATED confusion matrix ``(_a, _b,
    _c)`` — the mergeable-state form: a streaming
    ``groupBy(a, b).count`` snapshot (bounded labels² state) or any
    union of per-shard matrices feeds the same fold, so agreement can
    be MONITORED without re-reading rows (same state-not-rows binding
    as the drift monitors)."""
    tot = cm.agg(
        F.sum("_c").cast("long").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c")).otherwise(0))
        .cast("long")
        .alias("_agree"),
    )
    ma = cm.groupBy(F.col("_a").alias("_k")).agg(
        F.sum("_c").cast("long").alias("_na")
    )
    mb = cm.groupBy(F.col("_b").alias("_k")).agg(
        F.sum("_c").cast("long").alias("_nb")
    )
    m = ma.join(mb, "_k", "full_outer").select(
        F.coalesce(F.col("_na"), F.lit(0)).alias("_na"),
        F.coalesce(F.col("_nb"), F.lit(0)).alias("_nb"),
    )
    # bounded labels-frame × 1-row totals — scalar anchor broadcast
    pe = (
        m.join(F.broadcast(tot))
        .select(
            F.expr(f"CAST(_na * {PPM} div n AS BIGINT)").alias("_pa"),
            F.expr(f"CAST(_nb * {PPM} div n AS BIGINT)").alias("_pb"),
        )
        .agg(
            F.expr(f"CAST(sum(_pa * _pb) div {PPM} AS BIGINT)").alias(
                "pe_ppm"
            )
        )
    )
    return (
        tot.join(F.broadcast(pe))
        .withColumn("po_ppm", F.expr(f"CAST(_agree * {PPM} div n AS BIGINT)"))
        .withColumn(
            "kappa_ppm",
            # pe == 1 (single shared label) leaves kappa 0/0-undefined:
            # explicit NULL on BOTH engines (Spark ANSI `div 0` THROWS,
            # DuckDB `// 0` nulls — the guard unifies them)
            F.expr(
                f"CAST(CASE WHEN pe_ppm = {PPM} THEN NULL"
                f" ELSE (po_ppm - pe_ppm) * {PPM}"
                f" div ({PPM} - pe_ppm) END AS BIGINT)"
            ),
        )
        .select("n", "po_ppm", "pe_ppm", "kappa_ppm")
    )


def cohens_kappa_sql(table_expr: str, a_expr: str, b_expr: str) -> str:
    """DuckDB rendering of :func:`cohens_kappa` — same ppm-quantized
    marginals, same integer folds."""
    return f"""
WITH cm AS (
  SELECT CAST({a_expr} AS VARCHAR) AS a, CAST({b_expr} AS VARCHAR) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM {table_expr} GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
  FROM cm
),
ma AS (SELECT a AS k, CAST(sum(c) AS BIGINT) AS na FROM cm GROUP BY 1),
mb AS (SELECT b AS k, CAST(sum(c) AS BIGINT) AS nb FROM cm GROUP BY 1),
m AS (
  SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
  FROM ma FULL OUTER JOIN mb USING (k)
),
pe AS (
  SELECT CAST(sum((na * {PPM} // n) * (nb * {PPM} // n)) // {PPM}
              AS BIGINT) AS pe_ppm
  FROM m, tot
)
SELECT n,
       CAST(agree * {PPM} // n AS BIGINT) AS po_ppm,
       pe_ppm,
       CAST(CASE WHEN pe_ppm = {PPM} THEN NULL
            ELSE (agree * {PPM} // n - pe_ppm) * {PPM}
                 // ({PPM} - pe_ppm) END AS BIGINT) AS kappa_ppm
FROM tot, pe
"""


# --- NDCG (rerank form) -----------------------------------------------------

#: Integer micro-weights 10⁶/log₂(position+1) for positions 1..20 —
#: identical literals on both engines, so DCG is an exact-integer fold.
NDCG_L_MICRO = [
    round(1_000_000 / __import__("math").log2(i + 1)) for i in range(1, 21)
]


def ndcg_rerank(
    runs: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query NDCG@k of a retrieved list against graded relevance,
    rerank form: the ideal is the best permutation OF THE RETRIEVED
    list (the rerank-evaluation convention — no global relevance rank
    needed)::

        (<query_col>, n_run, dcg_micro, idcg_micro, ndcg_ppm)

    Positions weight by the fixed integer micro-table
    :data:`NDCG_L_MICRO` (``10⁶/log₂(pos+1)``), so DCG/IDCG are exact
    integer sums and the ratio is exact ppm.  Both windows partition by
    query over ≤k rows — bounded.  Queries with zero total relevance
    emit ``ndcg_ppm = 0``.  ``k`` is bounded by the micro-table length
    (a larger k would index past the weight array — ANSI throw on
    Spark, silent NULL gains on DuckDB): extend :data:`NDCG_L_MICRO`
    to raise the ceiling.
    """
    if k > len(NDCG_L_MICRO):
        raise ValueError(
            f"ndcg_rerank: k={k} exceeds the NDCG_L_MICRO weight table "
            f"({len(NDCG_L_MICRO)} positions); extend the table to rank deeper"
        )
    ltab = F.array(*[F.lit(v) for v in NDCG_L_MICRO[:k]])
    run_w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    ideal_w = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col)
    )
    rel = F.col(rel_col).cast("long")
    ranked = (
        runs.withColumn("_rr", F.row_number().over(run_w))
        .withColumn("_ri", F.row_number().over(ideal_w))
        .filter((F.col("_rr") <= k) | (F.col("_ri") <= k))
    )
    gains = ranked.select(
        F.col(query_col),
        F.when(F.col("_rr") <= k, rel * F.element_at(ltab, F.col("_rr")))
        .otherwise(0)
        .cast("long")
        .alias("_g"),
        F.when(F.col("_ri") <= k, rel * F.element_at(ltab, F.col("_ri")))
        .otherwise(0)
        .cast("long")
        .alias("_ig"),
        F.when(F.col("_rr") <= k, 1).otherwise(0).alias("_inrun"),
    )
    return (
        gains.groupBy(query_col)
        .agg(
            F.sum("_inrun").cast("long").alias("n_run"),
            F.sum("_g").cast("long").alias("dcg_micro"),
            F.sum("_ig").cast("long").alias("idcg_micro"),
        )
        .withColumn(
            "ndcg_ppm",
            F.expr(
                f"CAST(CASE WHEN idcg_micro = 0 THEN 0"
                f" ELSE dcg_micro * {PPM} div idcg_micro END AS BIGINT)"
            ),
        )
    )


def ndcg_rerank_sql(
    table_expr: str,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> str:
    """DuckDB rendering of :func:`ndcg_rerank` (1-based list indexing
    over the same micro-weight literals; same k ceiling)."""
    if k > len(NDCG_L_MICRO):
        raise ValueError(
            f"ndcg_rerank_sql: k={k} exceeds the NDCG_L_MICRO weight table "
            f"({len(NDCG_L_MICRO)} positions); extend the table to rank deeper"
        )
    lits = ", ".join(str(v) for v in NDCG_L_MICRO[:k])
    return f"""
WITH ranked AS (
  SELECT {query_col} AS q, CAST({rel_col} AS BIGINT) AS rel,
         row_number() OVER (PARTITION BY {query_col}
             ORDER BY {score_col} DESC, {id_col}) AS rr,
         row_number() OVER (PARTITION BY {query_col}
             ORDER BY {rel_col} DESC, {id_col}) AS ri
  FROM {table_expr}
),
gains AS (
  SELECT q,
         CASE WHEN rr <= {k} THEN rel * ([{lits}])[rr] ELSE 0 END AS g,
         CASE WHEN ri <= {k} THEN rel * ([{lits}])[ri] ELSE 0 END AS ig,
         CASE WHEN rr <= {k} THEN 1 ELSE 0 END AS inrun
  FROM ranked WHERE rr <= {k} OR ri <= {k}
)
SELECT q AS {query_col},
       CAST(sum(inrun) AS BIGINT) AS n_run,
       CAST(sum(g) AS BIGINT) AS dcg_micro,
       CAST(sum(ig) AS BIGINT) AS idcg_micro,
       CAST(CASE WHEN sum(ig) = 0 THEN 0
            ELSE sum(g) * {PPM} // sum(ig) END AS BIGINT) AS ndcg_ppm
FROM gains GROUP BY q
"""


# --- quantile-band coverage -------------------------------------------------


def quantile_coverage_eval(
    df: DataFrame,
    group_cols: Sequence[str],
    value_cols: Sequence[str],
    lo: tuple[int, int] = (1, 10),
    hi: tuple[int, int] = (9, 10),
) -> DataFrame:
    """Empirical coverage of a per-group quantile band — fit the
    ``[q_lo, q_hi]`` band with the exact grouped weighted quantile, then
    measure the fraction of rows actually inside it::

        (group..., n, band_lo, band_hi, n_inside, coverage_ppm)

    This is the conformal-style sanity check for every per-segment
    "normal range" a monitoring pipeline publishes: a q10–q90 band
    should cover ≈ 800 000 ppm; a group far off signals a skewed or
    discrete-valued segment whose band is lying.  The band frame is
    bounded (one row per group), so it attaches back via broadcast —
    the data is scanned twice (fit + eval), shuffled once each.

    ``value_cols``: quantile ordering columns, unique tie-break last;
    ``value_cols[0]`` is the measured value.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile,
    )

    qs = df.transform(
        lambda d: grouped_weighted_quantile(
            list(group_cols), list(value_cols), "_w", [lo, hi]
        )(d.withColumn("_w", F.lit(1)))
    )
    v0 = value_cols[0]
    bands = qs.groupBy(*group_cols).agg(
        F.min(
            F.when(
                (F.col("q_num") == lo[0]) & (F.col("q_den") == lo[1]),
                F.col(v0),
            )
        ).cast("long").alias("band_lo"),
        F.min(
            F.when(
                (F.col("q_num") == hi[0]) & (F.col("q_den") == hi[1]),
                F.col(v0),
            )
        ).cast("long").alias("band_hi"),
    )
    val = F.col(v0).cast("long")
    return (
        df.join(F.broadcast(bands), list(group_cols))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("band_lo").alias("band_lo"),
            F.min("band_hi").alias("band_hi"),
            F.sum(
                F.when(
                    (val >= F.col("band_lo")) & (val <= F.col("band_hi")), 1
                ).otherwise(0)
            ).cast("long").alias("n_inside"),
        )
        .withColumn(
            "coverage_ppm",
            F.expr(f"CAST(n_inside * {PPM} div n AS BIGINT)"),
        )
    )


def quantile_coverage_eval_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    value_cols: Sequence[str],
    lo: tuple[int, int] = (1, 10),
    hi: tuple[int, int] = (9, 10),
) -> str:
    """DuckDB rendering of :func:`quantile_coverage_eval` (wraps the
    grouped-weighted-quantile rendering with weight 1)."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile_sql,
    )

    g = ", ".join(group_exprs)
    v0 = value_cols[0]
    inner = grouped_weighted_quantile_sql(
        f"(SELECT *, 1 AS _w FROM {table_expr})",
        list(group_exprs),
        list(value_cols),
        "_w",
        [lo, hi],
    )
    return f"""
WITH qs AS ({inner}),
bands AS (
  SELECT {g},
         CAST(min(CASE WHEN q_num = {lo[0]} AND q_den = {lo[1]}
                  THEN {v0} END) AS BIGINT) AS band_lo,
         CAST(min(CASE WHEN q_num = {hi[0]} AND q_den = {hi[1]}
                  THEN {v0} END) AS BIGINT) AS band_hi
  FROM qs GROUP BY {g}
)
SELECT {g}, CAST(count(*) AS BIGINT) AS n, min(band_lo) AS band_lo,
       min(band_hi) AS band_hi,
       CAST(sum(CASE WHEN CAST({v0} AS BIGINT) BETWEEN band_lo AND band_hi
                THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
       CAST(sum(CASE WHEN CAST({v0} AS BIGINT) BETWEEN band_lo AND band_hi
                THEN 1 ELSE 0 END) * {PPM} // count(*) AS BIGINT)
         AS coverage_ppm
FROM {table_expr} JOIN bands USING ({g})
GROUP BY {g}
"""


# --- pinball (quantile) loss ------------------------------------------------


def pinball_loss(
    df: DataFrame,
    group_cols: Sequence[str],
    actual_col: str,
    pred_col: str,
    q_num: int,
    q_den: int,
) -> DataFrame:
    """Pinball (quantile) loss of a per-group quantile prediction —
    THE proper scoring rule for quantile forecasts (coverage says how
    often the band holds; pinball says how GOOD the quantile estimate
    is, penalizing over/under-prediction asymmetrically at q)::

        (group..., q_num, q_den, n, mean_pinball_milli)

    ``loss = q·(y−ŷ)`` when ``y ≥ ŷ`` else ``(q−1)·(y−ŷ)`` — carried as
    the exact integer ``max(q_num·err, (q_num−q_den)·err)`` and divided
    once at the end (``·1000 div (q_den·n)``), so the fold is pure
    BIGINT arithmetic on any engine.  One grouped pass.
    """
    err = F.col(actual_col).cast("long") - F.col(pred_col).cast("long")
    contrib = F.greatest(
        F.lit(q_num) * err, F.lit(q_num - q_den) * err
    ).cast("long")
    return (
        df.select(*group_cols, contrib.alias("_pl"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_pl").alias("_sum"),
        )
        .select(
            *group_cols,
            F.lit(q_num).cast("long").alias("q_num"),
            F.lit(q_den).cast("long").alias("q_den"),
            "n",
            F.expr(
                f"CAST(_sum * 1000 div ({q_den} * n) AS BIGINT)"
            ).alias("mean_pinball_milli"),
        )
    )


def pinball_loss_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    actual_expr: str,
    pred_expr: str,
    q_num: int,
    q_den: int,
) -> str:
    """DuckDB rendering of :func:`pinball_loss`."""
    g = ", ".join(group_exprs)
    err = f"(CAST({actual_expr} AS BIGINT) - CAST({pred_expr} AS BIGINT))"
    return f"""
SELECT {g}, CAST({q_num} AS BIGINT) AS q_num, CAST({q_den} AS BIGINT) AS q_den,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(greatest({q_num} * {err}, ({q_num} - {q_den}) * {err}))
            * 1000 // ({q_den} * count(*)) AS BIGINT) AS mean_pinball_milli
FROM {table_expr}
GROUP BY {g}
"""


# --- split-conformal prediction interval + validity -----------------------------


def conformal_interval_eval(
    cal: DataFrame,
    test: DataFrame,
    score_col: str,
    id_col: str,
    alpha_ppm: int,
    n_ranges: int = 64,
) -> DataFrame:
    """Split-conformal prediction interval (Vovk; the
    distribution-free UQ primitive) with its validity check::

        (n_cal, k_rank, qhat, n_test, n_covered, coverage_ppm,
         target_ppm)

    ``qhat`` is the ``k = ⌈(n_cal+1)·(1−α)⌉``-th smallest calibration
    nonconformity score — the finite-sample-corrected quantile whose
    interval ``score ≤ qhat`` covers a fresh exchangeable point with
    probability ≥ 1−α. Both the rank pick and the ceil run as exact
    integers (``k = ((n+1)·(10⁶−α_ppm) + 10⁶ − 1) div 10⁶``); the k-th
    order-statistic VALUE is tie-order invariant, so the ``id_col``
    tie-break only serves the rank's determinism. When ``k > n_cal``
    the guarantee needs an infinite interval: ``qhat`` NULL, every test
    point covered (standard small-calibration degeneracy, explicit on
    both engines).

    Scale: the rank pick is :func:`operators.rank.global_rank`
    (range-decomposed — never a single-partition sort); k is computed
    FROM the attached total, so no driver round-trip; the coverage side
    is one broadcast of the single qhat row.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import global_rank

    ranked = cal.select(
        F.col(score_col).cast("long").alias("_s"),
        F.col(id_col).alias("_tb"),
    ).transform(
        global_rank(["_s", "_tb"], out_col="_r", n_ranges=n_ranges,
                    with_total="_n")
    )
    k_expr = F.expr(
        f"CAST(((_n + 1) * (1000000 - {int(alpha_ppm)}) + 999999)"
        f" div 1000000 AS BIGINT)"
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    # exactly one row: the k-th smallest (rank k-1) — or the n_cal/k
    # bookkeeping row with NULL qhat when k > n (agg keeps it one-row)
    qhat = (
        ranked.withColumn("_k", k_expr)
        .agg(
            F.max("_n").cast("long").alias("n_cal"),
            F.max("_k").cast("long").alias("k_rank"),
            F.max(
                F.when(F.col("_r") == F.col("_k") - 1, F.col("_s"))
            ).cast("long").alias("qhat"),
        )
        .withColumn(
            "qhat",
            F.when(F.col("k_rank") <= F.col("n_cal"), F.col("qhat")),
        )
        .withColumn("_one", one)
    )
    cov = (
        test.select(F.col(score_col).cast("long").alias("_ts"))
        .withColumn("_one", one)
        .join(F.broadcast(qhat), "_one")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.max("k_rank").alias("k_rank"),
            F.max("qhat").alias("qhat"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.col("qhat").isNull() | (F.col("_ts") <= F.col("qhat")), 1
                ).otherwise(0)
            ).cast("long").alias("n_covered"),
        )
    )
    return cov.select(
        "n_cal",
        "k_rank",
        "qhat",
        "n_test",
        "n_covered",
        F.expr(
            "CAST(CASE WHEN n_test = 0 THEN NULL"
            " ELSE n_covered * 1000000 div n_test END AS BIGINT)"
        ).alias("coverage_ppm"),
        F.lit(1000000 - int(alpha_ppm)).cast("long").alias("target_ppm"),
    )


def conformal_interval_eval_sql(
    cal_expr: str,
    test_expr: str,
    score_expr: str,
    id_expr: str,
    alpha_ppm: int,
) -> str:
    """DuckDB rendering of :func:`conformal_interval_eval` — same exact
    ceil rank, same order-statistic pick, same infinite-interval
    degeneracy."""
    return f"""
WITH ranked AS (
  SELECT CAST({score_expr} AS BIGINT) AS s,
         row_number() OVER (ORDER BY CAST({score_expr} AS BIGINT),
                            {id_expr}) - 1 AS r,
         count(*) OVER () AS n
  FROM {cal_expr}
),
q AS (
  SELECT CAST(max(n) AS BIGINT) AS n_cal,
         CAST(max(((n + 1) * (1000000 - {int(alpha_ppm)}) + 999999)
                  // 1000000) AS BIGINT) AS k_rank,
         CAST(max(CASE WHEN r = ((n + 1) * (1000000 - {int(alpha_ppm)})
                                 + 999999) // 1000000 - 1
                  THEN s END) AS BIGINT) AS qhat_raw
  FROM ranked
),
q2 AS (
  SELECT n_cal, k_rank,
         CASE WHEN k_rank <= n_cal THEN qhat_raw END AS qhat
  FROM q
),
cov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN q2.qhat IS NULL
                       OR CAST({score_expr} AS BIGINT) <= q2.qhat
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM {test_expr}, q2
)
SELECT q2.n_cal, q2.k_rank, q2.qhat, cov.n_test, cov.n_covered,
       CAST(CASE WHEN cov.n_test = 0 THEN NULL
            ELSE cov.n_covered * 1000000 // cov.n_test END AS BIGINT)
         AS coverage_ppm,
       CAST({1000000 - int(alpha_ppm)} AS BIGINT) AS target_ppm
FROM q2, cov
"""


def isotonic_calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Isotonic (PAV) calibration of a score against binary labels over
    equal-WIDTH score bins — the monotone recalibration map behind
    "turn my classifier's score into a probability" (Zadrozny & Elkan,
    KDD'02; the binned form is what a 100-TB pipeline actually fits)::

        (bin, n, n_pos, rate_ppm, iso_rate_ppm)

    Instead of the sequential pool-adjacent-violators sweep, the fit
    uses PAV's CLOSED minimax form (Robertson/Wright/Dykstra 1988,
    Thm 1.4.4): ``iso_b = max_{j<=b} min_{k>=b} rate(j..k)`` with
    ``rate(j..k)`` the pooled positive rate over bins j..k from exact
    integer prefix sums — a bounded B³/6-row relational expansion
    (B = n_bins ≤ ~30), NOT an iterative driver loop; every frame after
    the one count pass is bounded by the bin domain. Empty bins simply
    don't appear (isotonic over the observed ordered bins). Pooled
    rates are single IEEE divisions on exact integers — bit-identical
    both engines — and only the SELECTED rate rounds to ppm.

    ``score_col`` is integer ppm in [0, 10⁶]; bin = ``score·B div
    (10⁶+1)``. Scale: one (bin) count shuffle over the rows; the
    prefix/pair/triple frames ride constant-key broadcasts of the
    bounded bin frame (the Markov scenario-grid pattern).
    """
    b_lit = int(n_bins)
    lbl = F.col(label_col).cast("long")
    binned = df.groupBy(
        F.expr(
            f"CAST({score_col} AS BIGINT) * {b_lit} div 1000001"
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(lbl).cast("long").alias("n_pos"),
    )
    return isotonic_from_counts(binned)


def isotonic_from_counts(binned: DataFrame) -> DataFrame:
    """Isotonic fit from a ``(bin, n, n_pos)`` count grid — the
    MERGEABLE-STATE form of :func:`isotonic_calibration_bins` (which
    delegates here after its groupBy). The grid is exactly what a
    streaming per-bucket label counter maintains
    (``streaming.streaming_bucket_label_counts``: ``n = n_good +
    n_bad``, ``n_pos = n_bad``) and what shards merge by cell addition
    — so ONE maintained count state serves both the WOE/IV screen and
    a live recalibration map (pytest-pinned stream==batch).

    NON-NULL-BIN CONTRACT: a NULL bin (NULL score upstream) has no
    place on the ordered bin axis — Spark windows sort NULLs first
    while the DuckDB oracle's ORDER BY sorts them last, so a NULL bin
    would silently skew the prefix sums differently per engine. NULL
    bins are dropped HERE, identically on both engines (the SQL
    renderers carry the same filter)."""
    binned = binned.where(F.col("bin").isNotNull())
    w = Window.orderBy("bin")  # bounded bin frame (<= n_bins rows)
    pre = binned.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("_cn"),
        F.sum("n_pos").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("_cp"),
    ).withColumn("_one", F.pmod(F.hash(F.lit(1)), F.lit(1)))
    pre = pre.localCheckpoint(eager=False)  # three bounded branches
    lo = pre.select(
        F.col("_one"),
        F.col("bin").alias("_j"),
        (F.col("_cn") - F.col("n")).alias("_cn_jm1"),
        (F.col("_cp") - F.col("n_pos")).alias("_cp_jm1"),
    )
    hi = pre.select(
        F.col("_one").alias("_o2"),
        F.col("bin").alias("_k"),
        F.col("_cn").alias("_cn_k"),
        F.col("_cp").alias("_cp_k"),
    )
    pairs = lo.join(
        F.broadcast(hi), (F.col("_one") == F.col("_o2")) & (F.col("_j") <= F.col("_k"))
    ).select(
        "_one",
        "_j",
        "_k",
        (
            (F.col("_cp_k") - F.col("_cp_jm1")).cast("double")
            / (F.col("_cn_k") - F.col("_cn_jm1")).cast("double")
        ).alias("_rate"),
    )
    mids = pre.select(F.col("_one").alias("_o3"), F.col("bin").alias("_b"))
    triple = pairs.join(
        F.broadcast(mids),
        (F.col("_one") == F.col("_o3"))
        & (F.col("_j") <= F.col("_b"))
        & (F.col("_b") <= F.col("_k")),
    )
    inner_min = triple.groupBy("_b", "_j").agg(F.min("_rate").alias("_m"))
    iso = inner_min.groupBy("_b").agg(
        F.round(F.max("_m") * F.lit(1000000.0)).cast("long").alias("iso_rate_ppm")
    )
    return (
        binned.join(iso, binned["bin"] == iso["_b"])
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("n_pos * 1000000L div n").alias("rate_ppm"),
            "iso_rate_ppm",
        )
    )


def isotonic_calibration_bins_sql(
    table_expr: str, score_expr: str, label_expr: str, n_bins: int = 10
) -> str:
    """DuckDB rendering of :func:`isotonic_calibration_bins` — same
    prefix sums, same bounded minimax expansion, same single-division
    rates and final ppm rounding."""
    b = int(n_bins)
    return f"""
WITH binned AS (
  SELECT CAST({score_expr} AS BIGINT) * {b} // 1000001 AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST({label_expr} AS BIGINT)) AS BIGINT) AS n_pos
  FROM {table_expr}
  WHERE (CAST({score_expr} AS BIGINT) * {b} // 1000001) IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT bin, n, n_pos,
         CAST(sum(n) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cn,
         CAST(sum(n_pos) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cp
  FROM binned
),
pairs AS (
  SELECT l.bin AS j, h.bin AS k,
         CAST(h.cp - (l.cp - l.n_pos) AS DOUBLE)
         / CAST(h.cn - (l.cn - l.n) AS DOUBLE) AS rate
  FROM pre l JOIN pre h ON l.bin <= h.bin
),
triple AS (
  SELECT m.bin AS b, p.j, min(p.rate) AS mrate
  FROM pairs p JOIN pre m ON p.j <= m.bin AND m.bin <= p.k
  GROUP BY m.bin, p.j
),
iso AS (
  SELECT b, CAST(round(max(mrate) * 1000000.0) AS BIGINT) AS iso_rate_ppm
  FROM triple GROUP BY b
)
SELECT bi.bin, bi.n, bi.n_pos,
       CAST(bi.n_pos * 1000000 // bi.n AS BIGINT) AS rate_ppm,
       iso.iso_rate_ppm
FROM binned bi JOIN iso ON bi.bin = iso.b
"""


def stump_split_gain(
    df: DataFrame, feature_col: str, bin_col: str, label_col: str
) -> DataFrame:
    """Best single-split (decision-stump) Gini gain per feature — the
    CART-style screen "which feature, cut where, separates the label
    best" (Breiman et al. 1984), the step beyond WOE/IV's per-bucket
    view because it commits to an actionable threshold::

        (feature, n, n_pos, best_split_bin, best_gain_ppm)

    Input is the UNPIVOTED ``(feature, bin, label)`` grid (the caller
    bins each feature to an ordered integer — the isotonic/WOE
    convention). For every candidate split "left = bins ≤ b": ``gain =
    Gini(parent) − w_L·Gini(L) − w_R·Gini(R)`` from exact integer
    prefix counts, ONE fixed IEEE sequence per candidate rounded to
    ppm; the best split is ``max(struct(gain, −bin))`` (ties to the
    smaller bin). Features with a single observed bin have no
    candidate and emit no row (a constant feature has no split).

    Scale: one (feature, bin) count pass; prefix sums and the argmax
    run on the bounded per-feature bin frame. No join wider than the
    bin grid, no window over raw rows.
    """
    lbl = F.col(label_col).cast("long")
    binned = df.groupBy(
        F.col(feature_col).alias("feature"),
        F.col(bin_col).cast("long").alias("bin"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(lbl).cast("long").alias("_p"),
    )
    return stump_from_counts(binned)


def stump_from_counts(binned: DataFrame) -> DataFrame:
    """Best-split screen from a ``(feature, bin, _n, _p)`` count grid —
    the MERGEABLE-STATE form of :func:`stump_split_gain` (which
    delegates here after its groupBy). The grid is the per-bucket label
    counters a streaming groupBy maintains (compose
    ``streaming.streaming_bucket_label_counts`` per feature: ``_n =
    n_good + n_bad``, ``_p = n_bad``), so the live threshold screen
    runs from counters alone (pytest-pinned stream==batch).

    NON-NULL-BIN CONTRACT: NULL bins (NULL feature value upstream)
    are dropped here on both engines — Spark sorts NULL bins first,
    DuckDB last, so a NULL bin would silently diverge the prefix
    counts and the candidate-split set (the isotonic_from_counts
    contract; the SQL renderer carries the same filter)."""
    binned = binned.where(F.col("bin").isNotNull())
    w = Window.partitionBy("feature").orderBy("bin")  # bounded bin frame
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pre = binned.select(
        "feature",
        "bin",
        F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("_cn"),
        F.sum("_p").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("_cp"),
        F.sum("_n").over(full).cast("long").alias("_N"),
        F.sum("_p").over(full).cast("long").alias("_P"),
    )
    cand = pre.where(F.col("_cn") < F.col("_N"))  # split must leave a right side

    def gini(p: Column, n: Column) -> Column:
        q = p.cast("double") / n.cast("double")
        return F.lit(1.0) - q * q - (F.lit(1.0) - q) * (F.lit(1.0) - q)

    n_d = F.col("_N").cast("double")
    gain = (
        gini(F.col("_P"), F.col("_N"))
        - (F.col("_cn").cast("double") / n_d) * gini(F.col("_cp"), F.col("_cn"))
        - ((F.col("_N") - F.col("_cn")).cast("double") / n_d)
        * gini(F.col("_P") - F.col("_cp"), F.col("_N") - F.col("_cn"))
    )
    scored = cand.select(
        "feature",
        "_N",
        "_P",
        "bin",
        F.round(gain * F.lit(1000000.0)).cast("long").alias("_gain_ppm"),
    )
    return (
        scored.groupBy("feature")
        .agg(
            F.max("_N").alias("n"),
            F.max("_P").alias("n_pos"),
            F.max(
                F.struct(F.col("_gain_ppm"), (-F.col("bin")).alias("_nb"))
            ).alias("_m"),
        )
        .select(
            "feature",
            "n",
            "n_pos",
            (-F.col("_m._nb")).cast("long").alias("best_split_bin"),
            F.col("_m._gain_ppm").alias("best_gain_ppm"),
        )
    )


def stump_split_gain_sql(
    table_expr: str, feature_expr: str, bin_expr: str, label_expr: str
) -> str:
    """DuckDB rendering of :func:`stump_split_gain` — same prefix
    grid, same fixed Gini sequence, same smaller-bin tie-break."""
    return f"""
WITH binned AS (
  SELECT {feature_expr} AS feature, CAST({bin_expr} AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST({label_expr} AS BIGINT)) AS BIGINT) AS p
  FROM {table_expr} WHERE ({bin_expr}) IS NOT NULL GROUP BY 1, 2
),
pre AS (
  SELECT feature, bin,
         CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
         CAST(sum(p) OVER (PARTITION BY feature ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
         CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nn,
         CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS pp
  FROM binned
),
scored AS (
  SELECT feature, nn, pp, bin,
         CAST(round((
           (1.0 - (CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))
                  * (CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))
                - (1.0 - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))
                  * (1.0 - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)))
           - (CAST(cn AS DOUBLE) / CAST(nn AS DOUBLE))
             * (1.0 - (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
                      * (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
                    - (1.0 - CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
                      * (1.0 - CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE)))
           - (CAST(nn - cn AS DOUBLE) / CAST(nn AS DOUBLE))
             * (1.0 - (CAST(pp - cp AS DOUBLE) / CAST(nn - cn AS DOUBLE))
                      * (CAST(pp - cp AS DOUBLE) / CAST(nn - cn AS DOUBLE))
                    - (1.0 - CAST(pp - cp AS DOUBLE) / CAST(nn - cn AS DOUBLE))
                      * (1.0 - CAST(pp - cp AS DOUBLE) / CAST(nn - cn AS DOUBLE)))
         ) * 1000000.0) AS BIGINT) AS gain_ppm
  FROM pre WHERE cn < nn
)
SELECT feature, nn AS n, pp AS n_pos,
       CAST(bin AS BIGINT) AS best_split_bin,
       CAST(gain_ppm AS BIGINT) AS best_gain_ppm
FROM (SELECT *, row_number() OVER (PARTITION BY feature
                                   ORDER BY gain_ppm DESC, bin ASC) AS rn
      FROM scored)
WHERE rn = 1
"""
