"""r14-STAGED battery queries: operators landed in round 11 with query +
DuckDB oracle fully wired, held OUT of ``__spark_entry__`` until the r14
window rotation (the staged -> parity-pinned -> probed -> registered
lifecycle; see the committed window plans in ``__spark_entry__.py``).

Wave theme: the decision layer OVER the pipeline's measurements —
inequality/concentration (Gini), feature screening (WOE/IV), experiment
readouts (CUPED), robust trends (Theil-Sen), retention survival
(Kaplan-Meier), multi-objective curation cuts (Pareto frontier),
corpus freshness (n-gram novelty), and link prediction (Adamic-Adar).

Until registration, ``tests/test_staged_r14_surfaces.py`` runs the exact
driver-gate comparison (sorted-column value equality + scalar-output
rule) on every entry at sf0.001 and sf0.01.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}

# Battery consolidation slots (empty until an r14 retirement earns one).
RETIRED_QUERIES: dict = {}
RETIRED_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_PRICE_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
_VALUE_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"


# --- Gini concentration of order value per market segment --------------------


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is order revenue within each market segment? —
    exact Gini per segment (operators/stats.gini_concentration; the
    rank is the range-decomposed grouped_global_rank, never a per-group
    single-task sort)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import gini_concentration

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr(_PRICE_CENTS).alias("cents"),
    )
    base = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("c_mktsegment", "cents", "o_orderkey")
    return gini_concentration(
        base, ["c_mktsegment"], "cents", ["o_orderkey"]
    ).orderBy("c_mktsegment")


def _sql_gini() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        gini_concentration_sql,
    )

    base = f"""
(SELECT c.c_mktsegment, {_PRICE_CENTS} AS cents, o.o_orderkey
 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) b
"""
    return (
        gini_concentration_sql(base, ["c_mktsegment"], "cents", ["o_orderkey"])
        + " ORDER BY c_mktsegment"
    )


STAGED_QUERIES["revenue_gini_by_segment"] = q_gini
STAGED_ORACLES["revenue_gini_by_segment"] = _sql_gini()


# --- WOE / IV screen of order priority against delinquent accounts -----------


def q_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order priority separate delinquent (negative-balance)
    customers? WOE per priority bucket + per-bucket IV, micro-nats
    (operators/stats.woe_iv_screen; one count pass + constant-key
    broadcast totals)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import woe_iv_screen

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_acctbal") < 0).cast("long").alias("bad")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    base = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(F.col("o_orderpriority").alias("bucket"), "bad")
    return woe_iv_screen(base, "bucket", "bad").orderBy("bucket")


def _sql_woe() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import woe_iv_screen_sql

    base = """
(SELECT o.o_orderpriority AS bucket,
        CAST(c.c_acctbal < 0 AS BIGINT) AS bad
 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) b
"""
    return woe_iv_screen_sql(base, "bucket", "bad") + " ORDER BY bucket"


STAGED_QUERIES["woe_iv_priority_screen"] = q_woe
STAGED_ORACLES["woe_iv_priority_screen"] = _sql_woe()


# --- CUPED experiment readout over event value --------------------------------

CUPED_SPLIT = "2024-01-15"  # pre-period X < split <= experiment period Y


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-reduced A/B readout: per-user pre-period revenue (X)
    adjusts experiment-period revenue (Y), variant = user_id parity —
    the CUPED primitive every experimentation platform runs
    (operators/stats.cuped_adjusted_readout; one per-user fold, exact
    decimal moments, fixed IEEE closed forms)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        cuped_adjusted_readout,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    per_user = ev.groupBy(F.col("user_id")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("ts").cast("date") < F.lit(CUPED_SPLIT).cast("date"),
                    F.expr(_VALUE_CENTS),
                )
            ),
            F.lit(0),
        ).alias("x"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("ts").cast("date") >= F.lit(CUPED_SPLIT).cast("date"),
                    F.expr(_VALUE_CENTS),
                )
            ),
            F.lit(0),
        ).alias("y"),
    ).select(
        F.expr("CAST(pmod(user_id, 2) AS STRING)").alias("variant"), "x", "y"
    )
    return cuped_adjusted_readout(per_user, "variant", "x", "y").orderBy(
        "variant"
    )


def _sql_cuped() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        cuped_adjusted_readout_sql,
    )

    base = f"""
(SELECT CAST(user_id % 2 AS VARCHAR) AS variant,
        coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_SPLIT}'
                 THEN {_VALUE_CENTS} END), 0) AS x,
        coalesce(sum(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_SPLIT}'
                 THEN {_VALUE_CENTS} END), 0) AS y
 FROM events WHERE ts IS NOT NULL
 GROUP BY user_id) u
"""
    return cuped_adjusted_readout_sql(base, "variant", "x", "y") + " ORDER BY variant"


STAGED_QUERIES["cuped_event_value"] = q_cuped
STAGED_ORACLES["cuped_event_value"] = _sql_cuped()


# --- Theil-Sen robust daily-revenue trend -------------------------------------


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type revenue trend: the lower-median pairwise slope of
    the daily rollup — one corrupt day cannot move it, unlike the OLS
    slope (operators/stats.theil_sen_trend; C(days,2) pair frame on the
    ROLLUP only, the acf_lags bounded-frame contract)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import theil_sen_trend
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    ).agg(F.sum(F.expr(_VALUE_CENTS)).cast("long").alias("rev"))
    return theil_sen_trend(daily, ["event_type"], "day", "rev").orderBy(
        "event_type"
    )


def _sql_theil_sen() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import theil_sen_trend_sql

    base = f"""
(SELECT event_type,
        CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
          AS day,
        CAST(sum({_VALUE_CENTS}) AS BIGINT) AS rev
 FROM events WHERE ts IS NOT NULL
 GROUP BY 1, 2) d
"""
    return (
        theil_sen_trend_sql(base, ["event_type"], "day", "rev")
        + " ORDER BY event_type"
    )


# r14 consolidation retirement (the staged_r17.py shortlist, confirmed
# at the r17-wave registration per VERDICT r13 #2): daily_value_mann_
# kendall (staged_r17) runs the superset physiology over the SAME
# bounded daily pair frame (the MK tie census + significance readout
# subsumes the pairwise-slope scan); the Theil-Sen slope readout stays
# oracle-gated here (tests/test_retired_surfaces.py), one-in/one-out.
RETIRED_QUERIES["theil_sen_daily_trend"] = q_theil_sen
RETIRED_ORACLES["theil_sen_daily_trend"] = _sql_theil_sen()


# --- Kaplan-Meier user retention curve ----------------------------------------

KM_CHURN_GAP_DAYS = 7  # inactive this long before the horizon = churned


def q_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User retention as a Kaplan-Meier curve with right-censoring:
    duration = days between a user's first and last event; users still
    active within KM_CHURN_GAP_DAYS of the data horizon are CENSORED,
    not churned — the estimator every retention dashboard needs once
    "still here" stops meaning "retained forever"
    (operators/timeseries.kaplan_meier; log-survival in exact integer
    micro-nats)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import kaplan_meier
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    per_user = days.groupBy("user_id").agg(
        F.min("day").alias("_first"), F.max("day").alias("_last")
    )
    horizon = days.agg(F.max("day").alias("_maxd")).withColumn(
        "_one", F.pmod(F.hash(F.lit(1)), F.lit(1))
    )
    subjects = (
        per_user.withColumn("_one", F.pmod(F.hash(F.lit(1)), F.lit(1)))
        .join(F.broadcast(horizon), "_one")
        .select(
            (F.col("_last") - F.col("_first")).alias("duration"),
            (F.col("_last") < F.col("_maxd") - F.lit(KM_CHURN_GAP_DAYS))
            .cast("long")
            .alias("event"),
        )
    )
    return kaplan_meier(subjects, [], "duration", "event").orderBy("t")


def _sql_km() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        kaplan_meier_sql,
    )

    base = f"""
(SELECT CAST(max(d) - min(d) AS BIGINT) AS duration,
        CAST(max(d) < (SELECT max(date_diff('day', DATE '2024-01-01',
                                            CAST(ts AS DATE)))
                       FROM events WHERE ts IS NOT NULL)
             - {KM_CHURN_GAP_DAYS} AS BIGINT) AS event
 FROM (SELECT user_id,
              date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
       FROM events WHERE ts IS NOT NULL)
 GROUP BY user_id) s
"""
    return kaplan_meier_sql(base, [], "duration", "event") + " ORDER BY t"


# r12 pre-registration retirement (staged_r17.py shortlist, VERDICT r11
# #1/#2): same count grid as user_hazard_cohorts (staged_r15) with proven
# identical risk sets (tests/test_r15_ops.py::
# test_nelson_aalen_matches_km_risk_sets) — the Nelson-Aalen hazard
# cohorts carry the wider surface into the battery; the KM readout stays
# oracle-gated here (tests/test_retired_surfaces.py), shrinking the
# never-hard-gated staged tail instead of growing the battery.
RETIRED_QUERIES["km_user_retention"] = q_km
RETIRED_ORACLES["km_user_retention"] = _sql_km()


# --- Pareto frontier: document quality vs token cost ---------------------------


def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-objective curation cut: which (quality, token-cost)
    points dominate the corpus — keep a doc only if nothing scores at
    least as high for at most its cost
    (curation.pareto_frontier_2d; corpus collapses to the distinct-
    score frame before any window)."""
    from dwh_etl_ods_spark_jobs_spark import text as TX
    from dwh_etl_ods_spark_jobs_spark.curation import pareto_frontier_2d

    docs = _t(spark, sf_dir, "documents").select(
        # quality_score is a 6-dp double in [0,1]: quantize to exact ppm
        # BEFORE the frontier (double->BIGINT casts round in DuckDB but
        # truncate in Spark — never hand the cast a raw double)
        F.round(TX.quality_score(F.col("text")) * F.lit(1000000.0))
        .cast("long")
        .alias("q"),
        TX.token_count(F.col("text")).alias("cost"),
    )
    return pareto_frontier_2d(docs, "q", "cost").orderBy(F.desc("score"))


def _sql_pareto() -> str:
    from dwh_etl_ods_spark_jobs_spark import text as TX
    from dwh_etl_ods_spark_jobs_spark.curation import pareto_frontier_2d_sql

    base = f"""
(SELECT CAST(round(({TX.quality_score_sql('text')}) * 1000000) AS BIGINT) AS q,
        CAST(len({TX.tokens_sql('text')}) AS BIGINT) AS cost
 FROM documents) d
"""
    return pareto_frontier_2d_sql(base, "q", "cost") + " ORDER BY score DESC"


STAGED_QUERIES["pareto_quality_cost"] = q_pareto
STAGED_ORACLES["pareto_quality_cost"] = _sql_pareto()


# --- n-gram novelty of one source slice vs the rest ----------------------------

NOVELTY_NEW_SOURCE = "src0"


def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness triage for a corpus refresh: per-doc fraction of
    w-shingles unseen in the REST of the corpus, folded to a decile
    census (curation.ngram_novelty_census; both sides collapse to
    distinct hashed postings — one membership join, no pair join)."""
    from dwh_etl_ods_spark_jobs_spark.curation import ngram_novelty_census

    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("source") == NOVELTY_NEW_SOURCE)
    ref = docs.filter(F.col("source") != NOVELTY_NEW_SOURCE)
    return ngram_novelty_census(new, ref, "text", "doc_id").orderBy(
        "novelty_decile"
    )


def _sql_novelty() -> str:
    from dwh_etl_ods_spark_jobs_spark.curation import ngram_novelty_census_sql

    return (
        ngram_novelty_census_sql(
            f"(SELECT * FROM documents WHERE source = '{NOVELTY_NEW_SOURCE}') n",
            f"(SELECT * FROM documents WHERE source <> '{NOVELTY_NEW_SOURCE}') r",
            "text",
            "doc_id",
        )
        + " ORDER BY novelty_decile"
    )


STAGED_QUERIES["ngram_novelty_census"] = q_novelty
STAGED_ORACLES["ngram_novelty_census"] = _sql_novelty()


# --- Adamic-Adar link prediction on the co-purchase graph ----------------------

AA_TOP_K = 50
AA_MAX_CENTER_DEG = 64


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Parts likely to be bought together NEXT": top-50 non-adjacent
    part pairs by Adamic-Adar over the co-purchase graph — rare mutual
    co-purchases outweigh hub parts (graph.adamic_adar_topk; wedge
    fan-out bounded by the center-degree cap, the triangle-census
    edge derivation reused verbatim)."""
    from dwh_etl_ods_spark_jobs_spark.graph import adamic_adar_topk
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _copurchase_edges

    return adamic_adar_topk(
        _copurchase_edges(spark, sf_dir),
        top_k=AA_TOP_K,
        max_center_degree=AA_MAX_CENTER_DEG,
    )


def _sql_adamic_adar() -> str:
    from dwh_etl_ods_spark_jobs_spark.graph import adamic_adar_topk_sql
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _COPURCHASE_EDGES_SQL

    return adamic_adar_topk_sql(
        _COPURCHASE_EDGES_SQL, AA_TOP_K, AA_MAX_CENTER_DEG
    )


STAGED_QUERIES["adamic_adar_parts"] = q_adamic_adar
STAGED_ORACLES["adamic_adar_parts"] = _sql_adamic_adar()


# --- sample-ratio-mismatch over event-type "experiments" -----------------------

SRM_THRESHOLD_MICRO = 10_830_000  # chi2 critical, 1 df, alpha = 0.001


def q_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-hygiene gate: per event-type "experiment", does the
    user-parity assignment hold its designed 50/50 split? Exact-integer
    chi2 with one truncated division (operators/stats.srm_check; the
    check every A/B readout runs BEFORE reading any metric)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import srm_check
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", F.expr("CAST(pmod(user_id, 2) AS STRING)").alias("arm")
    )
    return srm_check(
        ev, "event_type", "arm", threshold_micro=SRM_THRESHOLD_MICRO
    ).orderBy("experiment")


def _sql_srm() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import srm_check_sql

    return (
        srm_check_sql(
            "(SELECT event_type, CAST(user_id % 2 AS VARCHAR) AS arm"
            " FROM events) e",
            "event_type",
            "arm",
            SRM_THRESHOLD_MICRO,
        )
        + " ORDER BY experiment"
    )


STAGED_QUERIES["srm_assignment_check"] = q_srm
STAGED_ORACLES["srm_assignment_check"] = _sql_srm()


# --- A-ES weighted reservoir sample ---------------------------------------------

WRS_K, WRS_SEED = 3, "r14"


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement: 3 parts per
    brand, inclusion probability proportional to size — the
    Efraimidis-Spirakis reservoir with seed-keyed md5 draws (re-run →
    bit-identical sample; operators/rank.weighted_reservoir_sample,
    skew-safe two-phase top-k underneath)."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        weighted_reservoir_sample,
    )

    parts = _t(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_size")
    return weighted_reservoir_sample(
        parts, ["p_brand"], "p_partkey", "p_size", WRS_K, seed=WRS_SEED
    ).orderBy("p_brand", "rank")


def _sql_weighted_sample() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        weighted_reservoir_sample_sql,
    )

    return (
        weighted_reservoir_sample_sql(
            "part", ["p_brand"], "p_partkey", "p_size", WRS_K, WRS_SEED
        )
        + " ORDER BY p_brand, rank"
    )


STAGED_QUERIES["weighted_sample_parts"] = q_weighted_sample
STAGED_ORACLES["weighted_sample_parts"] = _sql_weighted_sample()


# --- Markov removal-effect attribution over user-day journeys -------------------

# Value iteration is monotone FROM BELOW, so a fixed budget gives a
# deterministic lower bound: at sf0.01 the 15-iteration base sits 53 ppm
# (0.01%) under the converged value (measured vs 25 iters) — both
# engines iterate identically so parity is exact; raise for longer
# journey chains.
MK_ITERS = 15


def q_markov_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven attribution: which event channels actually CARRY
    conversion probability, by Markov removal effect — the model-based
    answer first/last/linear clicks can't give (a channel that only
    appears alongside others gets credit exactly proportional to what
    disappears when it is removed). Journeys = user-day sessions,
    channels = non-purchase event types ordered by (ts, event_id),
    conversion = the session contains a purchase
    (operators/timeseries.markov_removal_attribution; the value
    iteration runs on the bounded channels² frame)."""
    from pyspark.sql import Window

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        MARKOV_CONV,
        MARKOV_NULL,
        MARKOV_START,
        markov_removal_attribution,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "event_type",
        "ts",
        "event_id",
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "day")
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    path = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    steps = (
        path.withColumn("_nxt", F.lead("event_type").over(w))
        .withColumn("_rn", F.row_number().over(w))
        .join(conv, ["user_id", "day"], "left")
    )
    mid = steps.select(
        F.col("event_type").alias("src"),
        F.coalesce(
            F.col("_nxt"),
            F.when(F.col("_conv") == 1, F.lit(MARKOV_CONV)).otherwise(
                F.lit(MARKOV_NULL)
            ),
        ).alias("dst"),
    )
    starts = steps.filter(F.col("_rn") == 1).select(
        F.lit(MARKOV_START).alias("src"), F.col("event_type").alias("dst")
    )
    # purchase-only sessions: the journey is START -> CONV directly
    direct = (
        conv.join(
            path.select("user_id", "day").distinct(),
            ["user_id", "day"],
            "left_anti",
        ).select(
            F.lit(MARKOV_START).alias("src"), F.lit(MARKOV_CONV).alias("dst")
        )
    )
    trans = mid.unionByName(starts).unionByName(direct)
    return markov_removal_attribution(trans, iterations=MK_ITERS).orderBy(
        "channel"
    )


def _sql_markov_attr() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_removal_attribution_sql,
    )

    trans = """(
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts, event_id
  FROM events WHERE ts IS NOT NULL
),
conv AS (
  SELECT DISTINCT user_id, day FROM ev WHERE event_type = 'purchase'
),
steps AS (
  SELECT e.user_id, e.day, e.event_type,
         lead(e.event_type) OVER w AS nxt,
         row_number() OVER w AS rn,
         (c.user_id IS NOT NULL) AS is_conv
  FROM ev e LEFT JOIN conv c ON c.user_id = e.user_id AND c.day = e.day
  WHERE e.event_type <> 'purchase'
  WINDOW w AS (PARTITION BY e.user_id, e.day ORDER BY e.ts, e.event_id)
)
SELECT event_type AS src,
       coalesce(nxt, CASE WHEN is_conv THEN '_CONV_' ELSE '_NULL_' END) AS dst
FROM steps
UNION ALL
SELECT '_START_', event_type FROM steps WHERE rn = 1
UNION ALL
SELECT '_START_', '_CONV_'
FROM conv c
WHERE NOT EXISTS (
  SELECT 1 FROM ev e
  WHERE e.user_id = c.user_id AND e.day = c.day
    AND e.event_type <> 'purchase'
)
) tr"""
    return (
        markov_removal_attribution_sql(trans, MK_ITERS) + " ORDER BY channel"
    )


STAGED_QUERIES["markov_attribution_channels"] = q_markov_attr
STAGED_ORACLES["markov_attribution_channels"] = _sql_markov_attr()


# --- leave-one-source-out influence on corpus quality ---------------------------


def q_loo_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data valuation for the corpus mix: which SOURCE, if dropped,
    moves mean document quality most — the exact one-pass
    leave-one-group-out closed form (operators/stats.loo_group_influence;
    positive influence = the source drags quality down). The triage
    report a mixing/refresh decision starts from."""
    from dwh_etl_ods_spark_jobs_spark import text as TX
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        loo_group_influence,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.round(TX.quality_score(F.col("text")) * F.lit(1000000.0))
        .cast("long")
        .alias("q_ppm"),
    )
    return loo_group_influence(docs, ["source"], "q_ppm").orderBy("source")


def _sql_loo_influence() -> str:
    from dwh_etl_ods_spark_jobs_spark import text as TX
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        loo_group_influence_sql,
    )

    base = f"""
(SELECT source,
        CAST(round(({TX.quality_score_sql('text')}) * 1000000) AS BIGINT)
          AS q_ppm
 FROM documents) d
"""
    return loo_group_influence_sql(base, ["source"], "q_ppm") + " ORDER BY source"


STAGED_QUERIES["loo_source_influence"] = q_loo_influence
STAGED_ORACLES["loo_source_influence"] = _sql_loo_influence()


# --- split-conformal interval over order-value residuals -------------------------

CONF_ALPHA_PPM = 100_000  # 90% target coverage


def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free uncertainty: calibrate the 90% conformal bound
    for |order value − segment mean| on odd order keys, check its
    finite-sample coverage guarantee on even keys
    (operators/eval_metrics.conformal_interval_eval; the quantile rank
    is exact and data-derived — no driver round-trip)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        conformal_interval_eval,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.expr(_PRICE_CENTS).alias("cents"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    seg_mean = orders.groupBy("c_mktsegment").agg(
        F.expr("CAST(sum(cents) div count(1) AS BIGINT)").alias("_pred")
    )
    scored = orders.join(F.broadcast(seg_mean), "c_mktsegment").select(
        "o_orderkey",
        F.abs(F.col("cents") - F.col("_pred")).alias("score"),
    )
    cal = scored.filter(F.col("o_orderkey") % 2 == 1)
    tst = scored.filter(F.col("o_orderkey") % 2 == 0)
    return conformal_interval_eval(
        cal, tst, "score", "o_orderkey", alpha_ppm=CONF_ALPHA_PPM
    )


def _sql_conformal() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        conformal_interval_eval_sql,
    )

    scored = f"""
(SELECT o.o_orderkey,
        abs({_PRICE_CENTS} - sm.pred) AS score
 FROM orders o
 JOIN customer c ON o.o_custkey = c.c_custkey
 JOIN (
   SELECT c2.c_mktsegment,
          CAST(sum({_PRICE_CENTS.replace('o_totalprice', 'o2.o_totalprice')})
               // count(*) AS BIGINT) AS pred
   FROM orders o2 JOIN customer c2 ON o2.o_custkey = c2.c_custkey
   GROUP BY 1
 ) sm ON sm.c_mktsegment = c.c_mktsegment)"""
    return conformal_interval_eval_sql(
        f"(SELECT * FROM {scored} s WHERE o_orderkey % 2 = 1) calv",
        f"(SELECT * FROM {scored} s WHERE o_orderkey % 2 = 0) tstv",
        "score",
        "o_orderkey",
        CONF_ALPHA_PPM,
    )


STAGED_QUERIES["conformal_order_value"] = q_conformal
STAGED_ORACLES["conformal_order_value"] = _sql_conformal()


# --- covariate balance (SMD) between assignment arms -----------------------------


def q_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-analysis covariate balance for the user-parity assignment:
    standardized mean differences of account balance and order count
    between arms — the |SMD| > 0.1 screen that must pass BEFORE any
    effect readout (operators/stats.smd_balance_check; covariates melt
    into one grouped moment pass)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import smd_balance_check

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").alias("acct_cents"),
    )
    ords = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    base = (
        cust.join(ords, cust["c_custkey"] == ords["o_custkey"], "left")
        .select(
            F.expr("CAST(pmod(c_custkey, 2) AS STRING)").alias("arm"),
            "acct_cents",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )
    return smd_balance_check(
        base, "arm", ["acct_cents", "n_orders"]
    ).orderBy("covariate")


def _sql_smd() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        smd_balance_check_sql,
    )

    base = """
(SELECT CAST(c.c_custkey % 2 AS VARCHAR) AS arm,
        CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS acct_cents,
        coalesce(o.n_orders, 0) AS n_orders
 FROM customer c
 LEFT JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey) b
"""
    return (
        smd_balance_check_sql(base, "arm", ["acct_cents", "n_orders"])
        + " ORDER BY covariate"
    )


STAGED_QUERIES["smd_balance_arms"] = q_smd
STAGED_ORACLES["smd_balance_arms"] = _sql_smd()


# --- beyond-accuracy recommendation-list eval ------------------------------------


def q_rec_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-accuracy recommender eval over the exact-cosine top-5
    lists: intra-list diversity, catalog coverage, and exposure Gini in
    one row — the three numbers that catch a relevance-perfect but
    monocultural recommender (similarity.rec_list_eval; bounded k²
    pair stage, full-catalog exposure Gini via the rank decomposition)."""
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        _emb,
        q_ann_bruteforce,
    )
    from dwh_etl_ods_spark_jobs_spark.similarity import rec_list_eval

    runs = q_ann_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    catalog = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return rec_list_eval(
        runs, catalog, "query_id", "neighbor_id", "vec_id", "v"
    )


def _sql_rec_eval() -> str:
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        EMB_DIM,
        SQL_ANN_BRUTEFORCE,
    )
    from dwh_etl_ods_spark_jobs_spark.similarity import rec_list_eval_sql

    return rec_list_eval_sql(
        SQL_ANN_BRUTEFORCE,
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings",
        "query_id",
        "neighbor_id",
        "vec_id",
        "v",
        EMB_DIM,
    )


STAGED_QUERIES["rec_list_quality_eval"] = q_rec_eval
STAGED_ORACLES["rec_list_quality_eval"] = _sql_rec_eval()
