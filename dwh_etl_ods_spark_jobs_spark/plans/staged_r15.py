"""r15-STAGED battery queries: operators landed in round 11 (second
wave) with query + DuckDB oracle fully wired, held OUT of
``__spark_entry__`` until their window rotation (the staged →
parity-pinned → probed → registered lifecycle; see the committed window
plans in ``__spark_entry__.py``).

Wave theme: the physiologies the battery did not have yet —
a SPATIAL grid-bucketed radius self-join, an ITERATIVE greedy
farthest-point selection (k-center coreset), probabilistic record
linkage (Fellegi-Sunter), distribution-level privacy (t-closeness),
covariate-shift reweighting (binned density ratio + ESS), sequence
predictability (conditional transition entropy), symbolic time-series
motifs (SAX), graph mixing structure (degree assortativity), and the
additive survival readout (Nelson-Aalen).

Until registration, ``tests/test_staged_r15_surfaces.py`` runs the
exact driver-gate comparison (sorted-column value equality +
scalar-output rule) on every entry at sf0.001 and sf0.01.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}

# Battery consolidation slots (empty until an r15 retirement earns one).
RETIRED_QUERIES: dict = {}
RETIRED_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- Nelson-Aalen cumulative hazard by signup cohort --------------------------

NA_CHURN_GAP_DAYS = 7  # inactive this long before the horizon = churned
NA_COHORT_DAYS = 90  # quarter-of-first-activity cohorts


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn HAZARD accumulation by activity-quarter cohort — the
    additive companion of the r14 Kaplan-Meier retention curve: are
    later cohorts accumulating churn risk faster?
    (operators/timeseries.nelson_aalen; per-step d/n micro terms on
    exact integer counts, windows over the bounded duration frame)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import nelson_aalen
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
            (F.col("_first") / F.lit(NA_COHORT_DAYS))
            .cast("long")
            .alias("cohort"),
            (F.col("_last") - F.col("_first")).alias("duration"),
            (F.col("_last") < F.col("_maxd") - F.lit(NA_CHURN_GAP_DAYS))
            .cast("long")
            .alias("event"),
        )
    )
    return nelson_aalen(subjects, ["cohort"], "duration", "event").orderBy(
        "cohort", "t"
    )


def _sql_nelson_aalen() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        nelson_aalen_sql,
    )

    base = f"""
(SELECT CAST(min(d) // {NA_COHORT_DAYS} AS BIGINT) AS cohort,
        CAST(max(d) - min(d) AS BIGINT) AS duration,
        CAST(max(d) < (SELECT max(date_diff('day', DATE '2024-01-01',
                                            CAST(ts AS DATE)))
                       FROM events WHERE ts IS NOT NULL)
             - {NA_CHURN_GAP_DAYS} AS BIGINT) AS event
 FROM (SELECT user_id,
              date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
       FROM events WHERE ts IS NOT NULL)
 GROUP BY user_id) s
"""
    return (
        nelson_aalen_sql(base, ["cohort"], "duration", "event")
        + " ORDER BY cohort, t"
    )


STAGED_QUERIES["user_hazard_cohorts"] = q_nelson_aalen
STAGED_ORACLES["user_hazard_cohorts"] = _sql_nelson_aalen()


# --- t-closeness of order priority within (segment, nation) classes ----------

TC_T_MAX_PPM = 200_000  # flag classes whose EMD exceeds t = 0.2


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would publishing (segment, nation)-grouped order data leak order
    urgency? t-closeness census: EMD between each class's priority
    distribution and the global one, deciled
    (operators/quality.t_closeness_census; the V-row value grid attaches
    by constant-key broadcast, exact integer prefix products)."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        t_closeness_census,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.substring(F.col("o_orderpriority"), 1, 1).cast("long").alias("prio"),
    )
    base = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("c_mktsegment", "c_nationkey", "prio")
    return t_closeness_census(
        base, ["c_mktsegment", "c_nationkey"], "prio", TC_T_MAX_PPM
    ).orderBy("emd_decile")


def _sql_t_closeness() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        t_closeness_census_sql,
    )

    base = """
(SELECT c.c_mktsegment, c.c_nationkey,
        CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS prio
 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) b
"""
    return (
        t_closeness_census_sql(
            base, ["c_mktsegment", "c_nationkey"], "prio", TC_T_MAX_PPM
        )
        + " ORDER BY emd_decile"
    )


STAGED_QUERIES["t_closeness_priority"] = q_t_closeness
STAGED_ORACLES["t_closeness_priority"] = _sql_t_closeness()


# --- Degree assortativity of the co-purchase graph ----------------------------


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do popular parts co-sell with popular parts? Newman degree
    assortativity of the co-purchase projection — the one-number "will
    degree skew bite" diagnostic (graph.degree_assortativity; exact
    decimal moment sums over edge stubs, one closed Pearson form)."""
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _copurchase_edges

    return G.degree_assortativity(_copurchase_edges(spark, sf_dir))


def _sql_assortativity() -> str:
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import (
        _COPURCHASE_EDGES_SQL,
    )

    return G.degree_assortativity_sql(_COPURCHASE_EDGES_SQL)


STAGED_QUERIES["copurchase_assortativity"] = q_assortativity
STAGED_ORACLES["copurchase_assortativity"] = _sql_assortativity()


# --- Density-ratio reweighting of the crawl toward the curated slice ----------

DR_TARGET_SOURCE = "src0"  # the "curated" slice the mix should match


def q_density_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reweight the whole corpus so its language mix matches the
    curated ``src0`` slice: per-language importance weight (ppm,
    clipped) + the Kish effective-sample-size fraction
    (curation.density_ratio_weights; two count passes + a bin join,
    exact-count ppm weights)."""
    from dwh_etl_ods_spark_jobs_spark.curation import density_ratio_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == DR_TARGET_SOURCE)
    return density_ratio_weights(docs, target, "lang").orderBy("bin")


def _sql_density_ratio() -> str:
    from dwh_etl_ods_spark_jobs_spark.curation import (
        density_ratio_weights_sql,
    )

    return (
        density_ratio_weights_sql(
            "documents",
            f"(SELECT * FROM documents WHERE source = '{DR_TARGET_SOURCE}')",
            "lang",
        )
        + " ORDER BY bin"
    )


STAGED_QUERIES["corpus_density_ratio"] = q_density_ratio
STAGED_ORACLES["corpus_density_ratio"] = _sql_density_ratio()


# --- Conditional transition entropy of user event streams ---------------------


def q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How predictable is a user's NEXT action given the current one,
    by time of day? Conditional next-event entropy vs the marginal,
    per 6-hour band (operators/stats.transition_entropy; count grids
    only, per-term micro-nat rounding)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        transition_entropy,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.expr("hour(ts) div 6").cast("long").alias("hour_band"),
        F.col("event_type").alias("src"),
        F.lead("event_type", 1).over(w).alias("dst"),
    )
    return transition_entropy(
        trans, ["hour_band"], "src", "dst"
    ).orderBy("hour_band")


def _sql_transition_entropy() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        transition_entropy_sql,
    )

    base = """
(SELECT CAST(hour(ts) // 6 AS BIGINT) AS hour_band,
        event_type AS src,
        lead(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
 FROM events WHERE ts IS NOT NULL) tr
"""
    return (
        transition_entropy_sql(base, ["hour_band"], "src", "dst")
        + " ORDER BY hour_band"
    )


STAGED_QUERIES["event_transition_entropy"] = q_transition_entropy
STAGED_ORACLES["event_transition_entropy"] = _sql_transition_entropy()


# --- Spatial grid radius join over hashed customer coordinates ----------------

GEO_GRID_SIZE = 10_000  # synthetic 10k x 10k planar world
GEO_RADIUS = 300  # cell width == radius: neighbors live in the 3x3 hood


def q_geo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within planar distance 300 on the synthetic
    md5-derived coordinate grid, censused by squared-distance band —
    the grid-bucketed spatial self-join (operators/spatial.
    grid_radius_pairs; x9 bounded replication + ONE uniform cell-key
    shuffle, each pair discovered exactly once, pure integers)."""
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 6),
                16,
                10,
            ).cast("long"),
            F.lit(GEO_GRID_SIZE),
        ).alias("x"),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 7, 6),
                16,
                10,
            ).cast("long"),
            F.lit(GEO_GRID_SIZE),
        ).alias("y"),
    )
    pairs = grid_radius_pairs(cust, "c_custkey", "x", "y", GEO_RADIUS)
    return (
        pairs.groupBy(
            (F.col("dist2") / F.lit(10_000)).cast("long").alias("dist_band")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("dist_band")
    )


def _sql_geo_pairs() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs_sql,
    )

    pts = f"""
(SELECT c_custkey,
        CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 6)
             AS BIGINT) % {GEO_GRID_SIZE} AS x,
        CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 7, 6)
             AS BIGINT) % {GEO_GRID_SIZE} AS y
 FROM customer) pts0
"""
    inner = grid_radius_pairs_sql(pts, "c_custkey", "x", "y", GEO_RADIUS)
    return f"""
SELECT CAST(dist2 // 10000 AS BIGINT) AS dist_band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM ({inner})
GROUP BY 1 ORDER BY dist_band
"""


STAGED_QUERIES["customer_geo_pairs"] = q_geo_pairs
STAGED_ORACLES["customer_geo_pairs"] = _sql_geo_pairs()


# --- SAX motif census of daily revenue shapes per event type -------------------


def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which 3-day revenue SHAPES recur across event types? SAX
    alphabet-4 words over z-normalized daily value series
    (operators/timeseries.sax_motif_census; exact integer moments, one
    fixed IEEE z sequence, ≤64-word output)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        sax_motif_census,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
        )
        .agg(
            (
                F.sum(F.round(F.col("value") * F.lit(100.0)).cast("long"))
                / F.lit(100.0)
            ).alias("val")
        )
    )
    return sax_motif_census(
        daily, ["event_type"], "day", "val", word_len=3
    ).orderBy("word")


def _sql_sax_motifs() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        sax_motif_census_sql,
    )

    daily = """
(SELECT event_type,
        date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
        sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT)) / 100.0
          AS val
 FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
 GROUP BY 1, 2) d
"""
    return (
        sax_motif_census_sql(daily, ["event_type"], "day", "val", word_len=3)
        + " ORDER BY word"
    )


STAGED_QUERIES["daily_value_sax_motifs"] = q_sax_motifs
STAGED_ORACLES["daily_value_sax_motifs"] = _sql_sax_motifs()


# --- Fellegi-Sunter linkage score census over nation-blocked customers --------

FS_FIELDS = [("seg", "_seg"), ("bal", "_bal")]


def q_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic duplicate-customer evidence: Fellegi-Sunter
    agreement weights (frequency-exact u, micro-bits) over
    nation-blocked pairs, censused by (fields agreeing, score band)
    (dedup.fellegi_sunter_scores; ONE-row weight frame broadcast to the
    blocked self-join)."""
    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_mktsegment").alias("_seg"),
        F.floor(
            F.round(F.col("c_acctbal") * F.lit(100.0)).cast("long")
            / F.lit(100000.0)
        )
        .cast("long")
        .alias("_bal"),
    )
    pairs = fellegi_sunter_scores(
        cust, "c_custkey", "c_nationkey", FS_FIELDS
    )
    return (
        pairs.groupBy(
            "n_agree",
            F.floor(F.col("score_micro") / F.lit(1000000.0))
            .cast("long")
            .alias("score_band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("n_agree", "score_band")
    )


def _sql_linkage_scores() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores_sql

    table = """
(SELECT c_custkey, c_nationkey, c_mktsegment AS _seg,
        CAST(floor(CAST(round(CAST(c_acctbal AS DOUBLE) * 100.0) AS BIGINT)
                   / 100000.0) AS BIGINT) AS _bal
 FROM customer)
"""
    inner = fellegi_sunter_scores_sql(
        table, "c_custkey", "c_nationkey", FS_FIELDS
    )
    return f"""
SELECT n_agree,
       CAST(floor(score_micro / 1000000.0) AS BIGINT) AS score_band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM ({inner})
GROUP BY 1, 2 ORDER BY n_agree, score_band
"""


STAGED_QUERIES["customer_linkage_scores"] = q_linkage_scores
STAGED_ORACLES["customer_linkage_scores"] = _sql_linkage_scores()


# --- Greedy k-center coreset over quantized embeddings ------------------------

KC_K = 6


def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 6 most MUTUALLY DISTANT embedding points (farthest-point
    coreset) + the coverage-radius curve — the diverse-sample picker
    (similarity.kcenter_greedy_select over quantize_embeddings codes;
    k rounds of broadcast-center min-distance updates, pure BIGINT
    distances, no pairwise join)."""
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        kcenter_greedy_select,
        quantize_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = quantize_embeddings(emb, "vec_id", "embedding")
    return kcenter_greedy_select(q, "vec_id", "q", KC_K).orderBy("sel_round")


def _sql_kcenter() -> str:
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        kcenter_greedy_select_sql,
        quantize_embeddings_sql,
    )

    pts = (
        "("
        + quantize_embeddings_sql(
            "(SELECT * FROM embeddings WHERE embedding IS NOT NULL) e",
            "vec_id",
            "embedding",
        )
        + ") qpts"
    )
    return (
        "SELECT * FROM ("
        + kcenter_greedy_select_sql(pts, "vec_id", "q", KC_K)
        + ") ORDER BY sel_round"
    )


STAGED_QUERIES["embedding_kcenter_coreset"] = q_kcenter
STAGED_ORACLES["embedding_kcenter_coreset"] = _sql_kcenter()
