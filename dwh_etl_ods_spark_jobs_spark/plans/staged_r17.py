"""r17-STAGED battery queries: operators landed in round 11 (fourth
wave) with query + DuckDB oracle fully wired, held OUT of
``__spark_entry__`` until their window rotation.

Wave theme: the screening/forecasting layer — Mann-Kendall trend
significance (the companion of Theil-Sen's slope), MASE seasonal
forecast backtesting, difference-in-differences, and the CART
decision-stump split screen.

Until registration, ``tests/test_staged_r17_surfaces.py`` runs the
exact driver-gate comparison on every entry at sf0.001 and sf0.01.

One-in/one-out retirement CANDIDATES created by the r15-r17 waves (for
the registration rounds to confirm, extending the r12 shortlist in
plans/staged_r12.py — each retirement moves to its module's
RETIRED_QUERIES with the pytest oracle gate):
  calibration_price_returns  vs length_isotonic_calibration at r16
                             registration: the isotonic readout
                             carries the per-bin reliability table AND
                             the monotone fit — same bin physiology,
                             strictly wider surface.
  km_user_retention (r14)    vs user_hazard_cohorts at r15
                             registration: same count grid, proven
                             identical risk sets
                             (test_nelson_aalen_matches_km_risk_sets);
                             keep ONE in the battery, the other stays
                             pytest-oracle-gated.
  theil_sen_daily_trend (r14) vs daily_value_mann_kendall at r17
                             registration: same bounded pair frame;
                             slope and significance are different
                             readouts — keep both UNLESS the battery
                             needs the slot (the MK tie census is the
                             superset physiology).
  seasonal_weekday_outliers  vs weekly_seasonality_mase: overlapping
                             weekly-pattern surfaces; the MASE readout
                             is the decision-grade one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}

RETIRED_QUERIES: dict = {}
RETIRED_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_DAILY_CENTS = """
(SELECT event_type,
        date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
        CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT))
             AS BIGINT) AS cents
 FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
 GROUP BY 1, 2)
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * F.lit(100.0)).cast("long"))
        .cast("long")
        .alias("cents")
    )


# --- Mann-Kendall trend significance per event type ---------------------------


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each event type's daily revenue TRENDING, or just wiggling?
    Mann-Kendall S, the exact tie-corrected 18·Var integer, and the
    continuity-corrected z in ppm (operators/stats.mann_kendall_trend;
    C(days,2) pair frame on the bounded rollup — the Theil-Sen
    contract)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        mann_kendall_trend,
    )

    return mann_kendall_trend(
        _daily_cents(spark, sf_dir), ["event_type"], "day", "cents"
    ).orderBy("event_type")


def _sql_mann_kendall() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        mann_kendall_trend_sql,
    )

    return (
        mann_kendall_trend_sql(
            _DAILY_CENTS + " d", ["event_type"], "day", "cents"
        )
        + " ORDER BY event_type"
    )


STAGED_QUERIES["daily_value_mann_kendall"] = q_mann_kendall
STAGED_ORACLES["daily_value_mann_kendall"] = _sql_mann_kendall()


# --- MASE: does the weekly pattern beat naive? ---------------------------------

MASE_SEASON = 7


def q_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does knowing the weekly pattern forecast daily revenue better
    than "tomorrow = today"? Seasonal-naive vs naive MASE per event
    type (operators/timeseries.mase_backtest; positional lags over the
    bounded rollup, integer SAE sums, one div)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        mase_backtest,
    )

    daily = _daily_cents(spark, sf_dir).select(
        "event_type",
        "day",
        (F.col("cents") / F.lit(100.0)).alias("val"),
    )
    return mase_backtest(
        daily, ["event_type"], "day", "val", season=MASE_SEASON
    ).orderBy("event_type")


def _sql_mase() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        mase_backtest_sql,
    )

    daily = (
        "(SELECT event_type, day, cents / 100.0 AS val FROM "
        + _DAILY_CENTS
        + " d0) d"
    )
    return (
        mase_backtest_sql(
            daily, ["event_type"], "day", "val", season=MASE_SEASON
        )
        + " ORDER BY event_type"
    )


STAGED_QUERIES["weekly_seasonality_mase"] = q_mase
STAGED_ORACLES["weekly_seasonality_mase"] = _sql_mase()


# --- Difference-in-differences: machinery segment after the 1998 split ---------

DID_SPLIT = "1998-01-01"  # post-period boundary
DID_SEGMENT = "MACHINERY"  # the "treated" segment


def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did MACHINERY customers' order values move differently after
    1998 than everyone else's? The 2x2 difference-in-differences
    readout (operators/stats.diff_in_diff; four exact cell means, one
    fixed double sequence, one rounding)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import diff_in_diff

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    base = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        (F.col("c_mktsegment") == DID_SEGMENT).cast("long").alias("tr"),
        (F.col("o_orderdate") >= F.lit(DID_SPLIT).cast("timestamp"))
        .cast("long")
        .alias("post"),
        "o_totalprice",
    )
    return diff_in_diff(base, "tr", "post", "o_totalprice").orderBy(
        "treated", "period"
    )


def _sql_did() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import diff_in_diff_sql

    base = f"""
(SELECT CAST(c.c_mktsegment = '{DID_SEGMENT}' AS BIGINT) AS tr,
        CAST(o.o_orderdate >= TIMESTAMP '{DID_SPLIT} 00:00:00' AS BIGINT)
          AS post,
        o.o_totalprice
 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) b
"""
    return (
        diff_in_diff_sql(base, "tr", "post", "o_totalprice")
        + " ORDER BY treated, period"
    )


STAGED_QUERIES["machinery_did_1998"] = q_did
STAGED_ORACLES["machinery_did_1998"] = _sql_did()


# --- Decision-stump screen: which document feature separates English? ----------


def q_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which document feature — length band or token-count band —
    best separates English docs, and where is the cut? CART stump
    Gini gain per feature (operators/eval_metrics.stump_split_gain;
    exact prefix counts over bounded bins, one fixed Gini sequence per
    candidate)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        stump_split_gain,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"),
        (F.col("lang") == "en").cast("long").alias("lbl"),
    )
    grid = docs.select(
        F.lit("chars_x50").alias("feature"),
        F.expr("n_chars div 50").alias("bin"),
        "lbl",
    ).unionByName(
        docs.select(
            F.lit("tokens_x10").alias("feature"),
            F.expr("n_toks div 10").alias("bin"),
            "lbl",
        )
    )
    return stump_split_gain(grid, "feature", "bin", "lbl").orderBy("feature")


def _sql_stump() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        stump_split_gain_sql,
    )

    grid = """
(SELECT 'chars_x50' AS feature, n_chars // 50 AS bin,
        CAST(lang = 'en' AS BIGINT) AS lbl
 FROM documents
 UNION ALL
 SELECT 'tokens_x10' AS feature,
        len(string_split(text, ' ')) // 10 AS bin,
        CAST(lang = 'en' AS BIGINT) AS lbl
 FROM documents) g
"""
    return (
        stump_split_gain_sql(grid, "feature", "bin", "lbl")
        + " ORDER BY feature"
    )


STAGED_QUERIES["doc_feature_stump_screen"] = q_stump
STAGED_ORACLES["doc_feature_stump_screen"] = _sql_stump()
