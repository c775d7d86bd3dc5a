"""r11-STAGED battery queries: operators landed in round 10 with query +
DuckDB oracle fully wired, held OUT of ``__spark_entry__`` until the r11
window rotation (the staged -> parity-pinned -> probed -> registered
lifecycle of ``plans/staged.py`` (r8) / ``staged_r9.py`` (r9) /
``staged_r10.py`` (r10) — see the committed r11 window plan in
``__spark_entry__.py``).

r11 registration: ``q.update(staged_r11.STAGED_QUERIES)`` and slot into
``_HEAD``. Until then ``tests/test_staged_r11_surfaces.py`` runs the exact
driver-gate comparison (sorted-column value equality + scalar-output rule)
on every entry at sf0.001 and sf0.01.

Wave theme: the evaluation/monitoring layer a training-data pipeline runs
ON ITS OWN artifacts — classifier AUC + calibration, sketch-error evals
(HLL, MinHash), corpus geometry (pair-distance histogram), content-aware
dedup (IDF-weighted Jaccard), bootstrap uncertainty, FD discovery, OHLC
downsampling, nearest-in-time matching, and multi-source BFS reach.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}

# Battery consolidation slots (empty until an r11 retirement earns one).
RETIRED_QUERIES: dict = {}
RETIRED_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_CENTS_PRICE = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
_IS_RETURN = "CAST(l_returnflag = 'R' AS BIGINT)"


# --- exact AUC (Mann-Whitney) of price vs return flag ----------------------


def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does line price predict returns? Exact tie-corrected ROC-AUC of
    extended price (cents) against l_returnflag='R' — the
    quality-classifier evaluation primitive run where the data lives
    (operators/eval_metrics.auc_mann_whitney; rank sums via the range
    decomposition, never a global sort)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        auc_mann_whitney,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.expr(_CENTS_PRICE).alias("score"),
        F.expr("CAST(l_returnflag = 'R' AS BIGINT)").alias("label"),
    )
    return auc_mann_whitney(li, "score", "label")


def _sql_auc() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        auc_mann_whitney_sql,
    )

    return auc_mann_whitney_sql("lineitem", _CENTS_PRICE, _IS_RETURN)


STAGED_QUERIES["auc_price_returns"] = q_auc
STAGED_ORACLES["auc_price_returns"] = _sql_auc()


# --- calibration / reliability bins ----------------------------------------

CAL_BINS = 10


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve of price (as a return-probability score) over
    10 exact equal-frequency bins — monotone pos_rate_ppm across bins is
    the standing calibration check for every scorer refresh. Binning via
    the range-decomposed exact rank (no global sort)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        calibration_bins,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.expr(_CENTS_PRICE).alias("score"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("long").alias("k2"),
        F.expr("CAST(l_returnflag = 'R' AS BIGINT)").alias("label"),
    )
    return calibration_bins(
        li, ["score", "k1", "k2"], "label", n_bins=CAL_BINS
    ).orderBy("bin")


def _sql_calibration() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        calibration_bins_sql,
    )

    return (
        calibration_bins_sql(
            f"(SELECT {_CENTS_PRICE} AS score, l_orderkey AS k1,"
            f" CAST(l_linenumber AS BIGINT) AS k2, {_IS_RETURN} AS label"
            " FROM lineitem) t",
            ["score", "k1", "k2"],
            "label",
            n_bins=CAL_BINS,
        )
        + " ORDER BY bin"
    )


# r14 consolidation retirement (the staged_r17.py shortlist, confirmed
# at the r16-wave registration per VERDICT r13 #2): length_isotonic_
# calibration (staged_r16) carries the SAME equal-frequency bin
# physiology (calibration_bins delegates the binning) PLUS the monotone
# PAV fit — strictly wider surface; the plain reliability curve stays
# oracle-gated here (tests/test_retired_surfaces.py), one-in/one-out.
RETIRED_QUERIES["calibration_price_returns"] = q_calibration
RETIRED_ORACLES["calibration_price_returns"] = _sql_calibration()


# --- IDF-weighted Jaccard near-dup -----------------------------------------

WJ_THRESHOLD_PPM = 300_000


def q_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-aware near-dup pairs on the synthetic near-dup corpus:
    IDF-weighted Jaccard ≥ 0.3, so shared rare content outweighs shared
    boilerplate (dedup.weighted_jaccard_pairs — posting equi-join with a
    hard df_max fan-in bound, micro-idf fixed per shingle)."""
    from dwh_etl_ods_spark_jobs_spark.dedup import weighted_jaccard_pairs
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import _corpus

    return weighted_jaccard_pairs(
        _corpus(spark, sf_dir), "text", "doc_id",
        threshold_ppm=WJ_THRESHOLD_PPM,
    ).orderBy("id_a", "id_b")


def _sql_weighted_jaccard() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import weighted_jaccard_pairs_sql
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import CORPUS_CTE

    inner = weighted_jaccard_pairs_sql(
        "corpus", "text", "doc_id", threshold_ppm=WJ_THRESHOLD_PPM
    )
    # splice the corpus CTE in front of the operator's own WITH chain
    body = inner.strip()
    assert body.startswith("WITH ")
    return f"WITH {CORPUS_CTE},\n{body[len('WITH '):]}\nORDER BY id_a, id_b"


STAGED_QUERIES["dedup_weighted_jaccard"] = q_weighted_jaccard
STAGED_ORACLES["dedup_weighted_jaccard"] = _sql_weighted_jaccard()


# --- MinHash estimate-error eval -------------------------------------------

MH_EVAL_THRESHOLD = 0.5


def q_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-error monitor for the MinHash signatures: mean/max |est −
    exact| Jaccard (ppm) over the banding's own candidate pairs — a k
    too small for the corpus shows up here before it costs recall
    (dedup.minhash_estimate_eval; exact side re-scores candidates only)."""
    from dwh_etl_ods_spark_jobs_spark.dedup import minhash_estimate_eval
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import _corpus

    return minhash_estimate_eval(
        _corpus(spark, sf_dir), "text", "doc_id", threshold=MH_EVAL_THRESHOLD
    )


def _sql_minhash_eval() -> str:
    import dwh_etl_ods_spark_jobs_spark.dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        CORPUS_CTE,
        SQL_DEDUP_MINHASH,
    )
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    return f"""
WITH {CORPUS_CTE},
cand AS (
  SELECT id_a, id_b,
         CAST(round(est_jaccard * 1000000) AS BIGINT) AS est_ppm
  FROM ({SQL_DEDUP_MINHASH})
),
in_play AS (
  SELECT id_a AS doc_id FROM cand UNION SELECT id_b FROM cand
),
posting AS (
  SELECT doc_id, {md5_long_sql('shingle')} AS sh_h
  FROM (
    SELECT doc_id, unnest({D.shingles_sql('text', D.SHINGLE_W)}) AS shingle
    FROM corpus SEMI JOIN in_play USING (doc_id)
  )
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM posting GROUP BY 1),
inter AS (
  SELECT p1.doc_id AS id_a, p2.doc_id AS id_b, CAST(count(*) AS BIGINT) AS c
  FROM posting p1 JOIN posting p2
    ON p1.sh_h = p2.sh_h AND p1.doc_id < p2.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT cand.est_ppm,
         coalesce(i.c, 0) * 1000000 // (a.n + b.n - coalesce(i.c, 0))
           AS true_ppm
  FROM cand
  LEFT JOIN inter i ON i.id_a = cand.id_a AND i.id_b = cand.id_b
  JOIN sizes a ON a.doc_id = cand.id_a
  JOIN sizes b ON b.doc_id = cand.id_b
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN count(*) = 0 THEN 0
            ELSE sum(abs(est_ppm - true_ppm)) // count(*) END AS BIGINT)
         AS mean_abs_err_ppm,
       CAST(coalesce(max(abs(est_ppm - true_ppm)), 0) AS BIGINT)
         AS max_abs_err_ppm
FROM scored
"""


STAGED_QUERIES["minhash_estimate_eval"] = q_minhash_eval
STAGED_ORACLES["minhash_estimate_eval"] = _sql_minhash_eval()


# --- OHLC daily downsampling -----------------------------------------------


def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC of event value (cents) per event type — ordered
    endpoint aggregation via min_by/max_by over a composite (ms,
    event_id) order key: ONE map-side-combinable fold, never a per-key
    sorted window (operators/timeseries.ohlc_agg)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import ohlc_agg
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = (
        read_events(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.unix_millis(F.col("ts")).alias("ms"),
            F.col("event_id"),
            F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        )
        .withColumn("day", F.expr("CAST(ms div 86400000 AS BIGINT)"))
    )
    return ohlc_agg(
        ev, ["event_type", "day"], "ms", "event_id", "cents"
    ).orderBy("event_type", "day")


def _sql_ohlc() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import ohlc_agg_sql

    return (
        ohlc_agg_sql(
            "(SELECT event_type,"
            " CAST(epoch_ms(ts) AS BIGINT) AS ms, event_id,"
            " CAST(round(value * 100, 0) AS BIGINT) AS cents,"
            " CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day"
            " FROM events WHERE ts IS NOT NULL) t",
            ["event_type", "day"],
            "ms",
            "event_id",
            "cents",
        )
        + " ORDER BY event_type, day"
    )


STAGED_QUERIES["ohlc_daily_value"] = q_ohlc
STAGED_ORACLES["ohlc_daily_value"] = _sql_ohlc()


# --- nearest-in-time join ---------------------------------------------------

NEAREST_TOL_MS = 6 * 3600 * 1000


def q_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's nearest click within ±6 h — either
    side, ties to the earlier event (operators/timeseries.
    nearest_event_join: ONE per-user ordered window over the tagged
    union, no inequality self-join)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        nearest_event_join,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = (
        read_events(spark, sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_millis(F.col("ts")).alias("ms"),
            "event_id",
            "event_type",
        )
    )
    needles = ev.filter(F.col("event_type") == "purchase")
    hay = ev.filter(F.col("event_type") == "click")
    return nearest_event_join(
        needles, hay, ["user_id"], "ms", "event_id", NEAREST_TOL_MS
    ).orderBy("user_id", "needle_id")


def _sql_nearest() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        nearest_event_join_sql,
    )

    def side(tp: str) -> str:
        return (
            "SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts,"
            " event_id AS id FROM events"
            f" WHERE ts IS NOT NULL AND user_id IS NOT NULL"
            f" AND event_type = '{tp}'"
        )

    return (
        nearest_event_join_sql(
            side("purchase"), side("click"), ["user_id"], NEAREST_TOL_MS
        )
        + " ORDER BY user_id, needle_id"
    )


STAGED_QUERIES["nearest_click_join"] = q_nearest
STAGED_ORACLES["nearest_click_join"] = _sql_nearest()


# --- functional-dependency violation census --------------------------------

_FDS = [
    (["l_partkey"], "l_suppkey"),
    (["l_orderkey"], "l_returnflag"),
    (["l_partkey", "l_suppkey"], "l_returnflag"),
]


def q_fd_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-FD violation census over lineitem (key inference /
    derivability check; operators/quality.fd_violations — one grouped
    count-distinct per declared FD, NULL counts as a value)."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import fd_violations

    return fd_violations(_t(spark, sf_dir, "lineitem"), _FDS).orderBy("fd")


def _sql_fd_census() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        fd_violations_sql,
    )

    return (
        "SELECT * FROM ("
        + fd_violations_sql("lineitem", _FDS)
        + ") ORDER BY fd"
    )


STAGED_QUERIES["fd_violation_census"] = q_fd_census
STAGED_ORACLES["fd_violation_census"] = _sql_fd_census()


# --- pair-distance histogram ------------------------------------------------


def q_pair_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-geometry probe: HDR histogram of pairwise quantized L2²
    over deterministic hash-bucket pair samples (similarity.
    pair_distance_histogram — linear pair budget, never a cross join)."""
    from dwh_etl_ods_spark_jobs_spark.similarity import pair_distance_histogram

    return pair_distance_histogram(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    ).orderBy("bucket_lo")


def _sql_pair_dist() -> str:
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        pair_distance_histogram_sql,
    )

    return (
        pair_distance_histogram_sql("embeddings", "vec_id", "embedding")
        + " ORDER BY bucket_lo"
    )


STAGED_QUERIES["embedding_distance_histogram"] = q_pair_dist
STAGED_ORACLES["embedding_distance_histogram"] = _sql_pair_dist()


# --- Poisson bootstrap CI ---------------------------------------------------


def q_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5th/95th-percentile Poisson-bootstrap band around the mean order
    value (cents) — deterministic hash-derived replicate weights, no
    rand() (operators/stats.poisson_bootstrap_ci; shuffle carries B
    partial sums, not B× rows)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        poisson_bootstrap_ci,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return poisson_bootstrap_ci(orders, "o_orderkey", "cents")


def _sql_bootstrap() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        poisson_bootstrap_ci_sql,
    )

    return poisson_bootstrap_ci_sql(
        "(SELECT o_orderkey,"
        " CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents"
        " FROM orders)",
        "o_orderkey",
        "cents",
    )


STAGED_QUERIES["bootstrap_order_value_ci"] = q_bootstrap
STAGED_ORACLES["bootstrap_order_value_ci"] = _sql_bootstrap()


# --- multi-source BFS hop census --------------------------------------------

BFS_SRC_MOD = 128
BFS_MAX_HOPS = 3


def q_bfs_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reach census of the supplier↔customer graph: nodes by exact
    minimum hop distance (≤3) from the deterministic seed set
    (node % 128 == 0) — frontier-expansion BFS, per-hop equi-joins on
    the frontier only (graph.bfs_hops)."""
    from dwh_etl_ods_spark_jobs_spark.graph import bfs_hops
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _sc_edges

    # r14: checkpoint the edge pipeline BEFORE deriving sources from it.
    # bfs_hops checkpoints its own edge input, but `sources` previously
    # entered with the raw lineitem⋈orders lineage and is folded into
    # `settled`, which doubles per hop — the 3-hop plan embedded the
    # full edge derivation 168 times (4,141 plan lines → ~300).
    edges = _sc_edges(spark, sf_dir).localCheckpoint(eager=False)
    sources = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") % BFS_SRC_MOD == 0)
        .distinct()
    )
    return (
        bfs_hops(edges, sources, max_hops=BFS_MAX_HOPS)
        .groupBy("hops")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("hops")
    )


def _sql_bfs_census() -> str:
    from dwh_etl_ods_spark_jobs_spark.graph import bfs_hops_sql
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _SC_EDGES_SQL

    sources = (
        f"SELECT DISTINCT src AS node FROM ({_SC_EDGES_SQL})"
        f" WHERE src % {BFS_SRC_MOD} = 0"
    )
    inner = bfs_hops_sql(_SC_EDGES_SQL, sources, max_hops=BFS_MAX_HOPS)
    return (
        f"SELECT hops, CAST(count(*) AS BIGINT) AS n_nodes FROM ({inner})"
        " GROUP BY hops ORDER BY hops"
    )


STAGED_QUERIES["graph_bfs_reach"] = q_bfs_census
STAGED_ORACLES["graph_bfs_reach"] = _sql_bfs_census()


# --- HLL estimate-error eval ------------------------------------------------


def q_hll_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-error monitor for the HLL distinct counter: per event
    type, the estimate vs the exact distinct-user count with the error
    in exact ppm over milli-units — the cardinality twin of
    minhash_estimate_eval (estimate already engine-identical; the eval
    makes its accuracy a standing number instead of a one-off check)."""
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events
    from dwh_etl_ods_spark_jobs_spark.sketches import hll_distinct

    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    est = ev.transform(hll_distinct(["event_type"], "user_id")).select(
        "event_type",
        F.expr("CAST(round(est_distinct * 1000) AS BIGINT)").alias("est_milli"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .withColumn(
            "err_ppm",
            F.expr(
                "CAST(abs(est_milli - exact_distinct * 1000) * 1000000"
                " div (exact_distinct * 1000) AS BIGINT)"
            ),
        )
        .select("event_type", "est_milli", "exact_distinct", "err_ppm")
        .orderBy("event_type")
    )


def _sql_hll_eval() -> str:
    from dwh_etl_ods_spark_jobs_spark.sketches import hll_distinct_sql

    est = hll_distinct_sql(
        "(SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL) t",
        ["event_type"],
        "user_id",
    )
    return f"""
WITH est AS (
  SELECT event_type,
         CAST(round(est_distinct * 1000) AS BIGINT) AS est_milli
  FROM ({est})
),
exact AS (
  SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT e.event_type, e.est_milli, x.exact_distinct,
       CAST(abs(e.est_milli - x.exact_distinct * 1000) * 1000000
            // (x.exact_distinct * 1000) AS BIGINT) AS err_ppm
FROM est e JOIN exact x USING (event_type)
ORDER BY event_type
"""


STAGED_QUERIES["hll_error_eval"] = q_hll_eval
STAGED_ORACLES["hll_error_eval"] = _sql_hll_eval()
