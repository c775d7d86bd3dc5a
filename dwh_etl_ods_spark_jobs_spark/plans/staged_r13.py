"""r13-STAGED battery queries: operators landed in round 10, held OUT of
``__spark_entry__`` until the r13 window rotation (the staged →
parity-pinned → probed → registered lifecycle; see the committed window
plans in ``__spark_entry__.py``).

Wave theme: the operational-infrastructure layer — stable sharding
(rendezvous assignment + resize-churn census), skew-safe grouped top-k,
Merkle-style bandwidth-efficient reconciliation, UCB experiment
monitoring, and DAU growth accounting.
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


# --- rendezvous resize churn ------------------------------------------------

RV_OLD = [f"shard{i}" for i in range(7)]
RV_NEW = RV_OLD + ["shard7"]


def q_rendezvous_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customer keys move when the shard ring grows 7 → 8?
    Rendezvous hashing bounds this at ≈ 1/8 of keys (vs ~7/8 under
    modulo sharding) — measured here BEFORE any stateful store resize
    (operators/sharding.rendezvous_churn; pure per-row expression +
    one scalar fold)."""
    from dwh_etl_ods_spark_jobs_spark.operators.sharding import (
        rendezvous_churn,
    )

    return rendezvous_churn(
        _t(spark, sf_dir, "customer"), "c_custkey", RV_OLD, RV_NEW
    )


def _sql_rendezvous_churn() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.sharding import (
        rendezvous_churn_sql,
    )

    return rendezvous_churn_sql("customer", "c_custkey", RV_OLD, RV_NEW)


STAGED_QUERIES["rendezvous_shard_churn"] = q_rendezvous_churn
STAGED_ORACLES["rendezvous_shard_churn"] = _sql_rendezvous_churn()


# --- skew-safe grouped top-k ------------------------------------------------

TOPK_K = 5


def q_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 events by value per event type — 5 hot groups, each holding
    a fifth of the table: exactly where a naive per-group window funnels
    everything through 5 tasks.  The salted two-phase decomposition
    keeps every window partition bounded
    (operators/rank.salted_grouped_topk; oracle = the single-window
    semantic form, so parity proves no row is lost)."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        salted_grouped_topk,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        F.col("event_id").cast("long").alias("eid"),
    )
    return salted_grouped_topk(
        ev, ["event_type"], "cents", "eid", TOPK_K
    ).orderBy("event_type", "rank")


def _sql_salted_topk() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        salted_grouped_topk_sql,
    )

    return (
        "SELECT * FROM ("
        + salted_grouped_topk_sql(
            "(SELECT event_type,"
            " CAST(round(value * 100, 0) AS BIGINT) AS cents,"
            " CAST(event_id AS BIGINT) AS eid FROM events) t",
            ["event_type"],
            "cents",
            "eid",
            TOPK_K,
        )
        + ") ORDER BY event_type, rank"
    )


STAGED_QUERIES["salted_topk_per_type"] = q_salted_topk
STAGED_ORACLES["salted_topk_per_type"] = _sql_salted_topk()


# --- Merkle bucket reconciliation -------------------------------------------

MRD_BUCKETS = 64
# deterministic synthetic drift: ~0.05% of keys dropped, ~0.1% modified
# (sparse — the regime the digest pre-filter exists for)
MRD_DROP_MOD, MRD_EDIT_MOD = 1999, 1009


def _orders_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % MRD_DROP_MOD != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % MRD_EDIT_MOD == 0,
            F.col("o_totalprice") + 1.0,
        ).otherwise(F.col("o_totalprice")),
    )


_MRD_VALS = ["o_totalprice", "o_orderstatus", "o_orderdate"]


def q_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE do two order snapshots differ?  Per-bucket digest compare
    first, row diffs only inside disagreeing buckets — the anti-entropy
    reconciliation that ships digest frames instead of tables
    (operators/reconcile.merkle_range_diff; the oracle diffs the full
    table directly, so parity proves the digest pre-filter drops no
    bucket)."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff,
    )

    return merkle_range_diff(
        _t(spark, sf_dir, "orders"),
        _orders_new(spark, sf_dir),
        "o_orderkey",
        _MRD_VALS,
        n_buckets=MRD_BUCKETS,
    ).orderBy("bucket")


def _sql_merkle_diff() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff_sql,
    )

    new_cte = (
        "SELECT * REPLACE (CASE WHEN o_orderkey % "
        f"{MRD_EDIT_MOD} = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END"
        " AS o_totalprice) FROM orders WHERE o_orderkey % "
        f"{MRD_DROP_MOD} <> 0"
    )
    return (
        "SELECT * FROM ("
        + merkle_range_diff_sql(
            "SELECT * FROM orders",
            new_cte,
            "o_orderkey",
            _MRD_VALS,
            n_buckets=MRD_BUCKETS,
        )
        + ") ORDER BY bucket"
    )


STAGED_QUERIES["merkle_bucket_diff"] = q_merkle_diff
STAGED_ORACLES["merkle_bucket_diff"] = _sql_merkle_diff()


# --- UCB arm monitoring -----------------------------------------------------


def q_ucb_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 explore/exploit scores treating each event type as an
    experiment arm with value-cents reward — the standing monitor for
    any deterministic A/B/n rollout (operators/stats.ucb_arm_scores;
    one grouped pass + one-row anchors)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import ucb_arm_scores
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    return ucb_arm_scores(ev, "event_type", "cents").orderBy("arm")


def _sql_ucb_arms() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        ucb_arm_scores_sql,
    )

    return (
        "SELECT * FROM ("
        + ucb_arm_scores_sql(
            "(SELECT event_type,"
            " CAST(round(value * 100, 0) AS BIGINT) AS cents"
            " FROM events) t",
            "event_type",
            "cents",
        )
        + ") ORDER BY arm"
    )


STAGED_QUERIES["ucb_event_arms"] = q_ucb_arms
STAGED_ORACLES["ucb_event_arms"] = _sql_ucb_arms()


# --- growth accounting ------------------------------------------------------


def q_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active/new/returning/cumulative user decomposition of the
    event log — the DAU growth-accounting standard, computed with two
    user-keyed shuffles and a bounded day-frame window, never a
    distinct-over-window (operators/timeseries.growth_accounting)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        growth_accounting,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("user_id", F.col("ts").cast("date").alias("day"))
    return growth_accounting(ev, "user_id", "day").orderBy("day")


def _sql_growth() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        growth_accounting_sql,
    )

    return (
        "SELECT * FROM ("
        + growth_accounting_sql(
            "(SELECT user_id, CAST(ts AS DATE) AS day FROM events"
            " WHERE user_id IS NOT NULL AND ts IS NOT NULL) t",
            "user_id",
            "day",
        )
        + ") ORDER BY day"
    )


STAGED_QUERIES["user_growth_accounting"] = q_growth
STAGED_ORACLES["user_growth_accounting"] = _sql_growth()


# --- co-purchase projection --------------------------------------------------
# Registered as copurchase_lift_pairs: "copurchase_pairs" is a RETIRED
# name (plans/coverage.py — the unweighted co-occurrence census this
# lift-annotated projection subsumes) and retired names must stay out of
# the battery (tests/test_retired_surfaces.py).

COP_MIN_SUPPORT = 2
COP_TOP_K = 50
COP_MAX_BASKET = 16  # in-operator heavy-tail cap (VERDICT r10 #4);
# the synthetic orders top out at 17 items so the cap is LIVE in the
# parity check (one 17-item basket loses its last item on both engines).


def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 'bought together' part pairs by order co-occurrence — the
    bipartite basket→item projection whose edge list feeds the graph
    operators (graph.copurchase_projection; one bounded-fan-out equi
    self-join on the order key, per-basket first-m cap, top-k via
    TakeOrdered)."""
    from dwh_etl_ods_spark_jobs_spark.graph import copurchase_projection

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return copurchase_projection(
        li, "l_orderkey", "l_partkey",
        min_support=COP_MIN_SUPPORT, top_k=COP_TOP_K,
        max_basket=COP_MAX_BASKET,
    )


def _sql_copurchase() -> str:
    from dwh_etl_ods_spark_jobs_spark.graph import copurchase_projection_sql

    return copurchase_projection_sql(
        "lineitem", "l_orderkey", "l_partkey",
        min_support=COP_MIN_SUPPORT, top_k=COP_TOP_K,
        max_basket=COP_MAX_BASKET,
    )


STAGED_QUERIES["copurchase_lift_pairs"] = q_copurchase
STAGED_ORACLES["copurchase_lift_pairs"] = _sql_copurchase()


# --- daily-revenue autocorrelation ------------------------------------------

ACF_MAX_LAG = 7


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event revenue at lags 1..7 — the
    which-period-is-it seasonality probe behind the weekday operators
    (operators/timeseries.acf_lags over the BOUNDED 30-day rollup;
    exact moment sums, one rounded division per lag)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import acf_lags
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    daily = (
        read_events(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias(
                "cents"
            )
        )
    )
    return acf_lags(daily, "day", "cents", max_lag=ACF_MAX_LAG).orderBy("lag")


def _sql_acf() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import acf_lags_sql

    return (
        "SELECT * FROM ("
        + acf_lags_sql(
            "(SELECT CAST(ts AS DATE) AS day,"
            " sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents"
            " FROM events WHERE ts IS NOT NULL GROUP BY 1) t",
            "day",
            "cents",
            max_lag=ACF_MAX_LAG,
        )
        + ") ORDER BY lag"
    )


STAGED_QUERIES["daily_revenue_acf"] = q_acf
STAGED_ORACLES["daily_revenue_acf"] = _sql_acf()


# --- pinball loss of the published band --------------------------------------


def q_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How GOOD are each event type's q10/q90 band edges as quantile
    forecasts?  The pinball-loss companion to quantile_band_coverage
    (coverage says how often the band holds; pinball is the proper
    scoring rule that also penalizes a too-wide band).  Band fitted by
    the exact grouped weighted quantile, then one grouped loss pass per
    edge (operators/eval_metrics.pinball_loss — pure BIGINT fold)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pinball_loss,
    )
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        F.col("event_id").cast("long").alias("eid"),
    )
    qs = grouped_weighted_quantile(
        ["event_type"], ["cents", "eid"], "_w", [(1, 10), (9, 10)]
    )(ev.withColumn("_w", F.lit(1)))
    bands = qs.groupBy("event_type").agg(
        F.min(F.when(F.col("q_num") == 1, F.col("cents")))
        .cast("long")
        .alias("band_lo"),
        F.min(F.when(F.col("q_num") == 9, F.col("cents")))
        .cast("long")
        .alias("band_hi"),
    )
    scored = ev.join(F.broadcast(bands), "event_type")
    lo = pinball_loss(scored, ["event_type"], "cents", "band_lo", 1, 10)
    hi = pinball_loss(scored, ["event_type"], "cents", "band_hi", 9, 10)
    return lo.unionByName(hi).orderBy("event_type", "q_num")


def _sql_pinball() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pinball_loss_sql,
    )
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile_sql,
    )

    src = (
        "(SELECT event_type,"
        " CAST(round(value * 100, 0) AS BIGINT) AS cents,"
        " CAST(event_id AS BIGINT) AS eid FROM events)"
    )
    gwq = grouped_weighted_quantile_sql(
        f"(SELECT *, 1 AS _w FROM {src})",
        ["event_type"],
        ["cents", "eid"],
        "_w",
        [(1, 10), (9, 10)],
    )
    arms = []
    for q_num, edge in ((1, "band_lo"), (9, "band_hi")):
        arms.append(
            pinball_loss_sql(
                f"(SELECT s.event_type, s.cents, b.{edge} AS pred"
                f" FROM {src} s JOIN bands b USING (event_type)) t{q_num}",
                ["event_type"],
                "cents",
                "pred",
                q_num,
                10,
            ).strip()
        )
    body = "\nUNION ALL\n".join(f"({a})" for a in arms)
    return f"""
WITH qs AS ({gwq}),
bands AS (
  SELECT event_type,
         CAST(min(CASE WHEN q_num = 1 THEN cents END) AS BIGINT) AS band_lo,
         CAST(min(CASE WHEN q_num = 9 THEN cents END) AS BIGINT) AS band_hi
  FROM qs GROUP BY event_type
)
SELECT * FROM ({body}) ORDER BY event_type, q_num
"""


STAGED_QUERIES["pinball_band_loss"] = q_pinball
STAGED_ORACLES["pinball_band_loss"] = _sql_pinball()


# --- personalized PageRank ---------------------------------------------------

PPR_SEED_MOD = 128
PPR_ITERS = 3
PPR_TOP_K = 25


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-walk-with-restart influence of the deterministic seed
    cohort (node % 128 == 0 — the BFS census's seed set) over the
    supplier↔customer graph: top-25 nodes by personalized rank — the
    related-entities / recommendation primitive
    (graph.personalized_pagerank; uniform PageRank's exact physiology
    with the restart mass pinned to the seeds)."""
    from dwh_etl_ods_spark_jobs_spark.graph import personalized_pagerank
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _sc_edges

    # Checkpoint the edge build ONCE so the seed derivation and the
    # operator's degree/edge branches share one materialization (the
    # graph_bfs_reach r14 fix; the operator's own raw-edge checkpoint
    # then copies the materialized rows instead of replaying the build).
    edges = _sc_edges(spark, sf_dir).localCheckpoint(eager=False)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") % PPR_SEED_MOD == 0)
        .distinct()
    )
    return (
        personalized_pagerank(edges, seeds, iterations=PPR_ITERS)
        .orderBy(F.desc("rank_micro"), "node")
        .limit(PPR_TOP_K)
    )


def _sql_ppr() -> str:
    from dwh_etl_ods_spark_jobs_spark.graph import personalized_pagerank_sql
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _SC_EDGES_SQL

    seeds = (
        f"SELECT DISTINCT src AS node FROM ({_SC_EDGES_SQL})"
        f" WHERE src % {PPR_SEED_MOD} = 0"
    )
    inner = personalized_pagerank_sql(
        _SC_EDGES_SQL, seeds, iterations=PPR_ITERS
    )
    return (
        f"SELECT * FROM ({inner})"
        f" ORDER BY rank_micro DESC, node LIMIT {PPR_TOP_K}"
    )


STAGED_QUERIES["personalized_pagerank_topk"] = q_ppr
STAGED_ORACLES["personalized_pagerank_topk"] = _sql_ppr()
