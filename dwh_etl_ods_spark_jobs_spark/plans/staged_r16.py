"""r16-STAGED battery queries: operators landed in round 11 (third
wave) with query + DuckDB oracle fully wired, held OUT of
``__spark_entry__`` until their window rotation.

Wave theme: the calibration/valuation layer — isotonic (PAV)
recalibration in closed minimax form, MMR diversity reranking,
stratified-ATE causal readout, corpus vocabulary-richness (Chao1 /
Good-Turing), and count-series burstiness (Fano factor).

Until registration, ``tests/test_staged_r16_surfaces.py`` runs the
exact driver-gate comparison on every entry at sf0.001 and sf0.01.
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


# --- Corpus vocabulary richness ------------------------------------------------


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much vocabulary is still UNSEEN if we keep crawling? Chao1
    lower-bound richness + Good-Turing unseen mass over the documents
    corpus (curation.vocab_richness; frequency-of-frequencies fold on
    the token-count grid)."""
    from dwh_etl_ods_spark_jobs_spark.curation import vocab_richness

    return vocab_richness(_t(spark, sf_dir, "documents"), "text")


def _sql_vocab() -> str:
    from dwh_etl_ods_spark_jobs_spark.curation import vocab_richness_sql

    return vocab_richness_sql("documents", "text")


STAGED_QUERIES["corpus_vocab_richness"] = q_vocab
STAGED_ORACLES["corpus_vocab_richness"] = _sql_vocab()


# --- Stratified ATE: does high priority raise order value? ---------------------


def q_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observational effect of HIGH priority on order value,
    subclassified on the customer segment confounder — per-stratum
    treated/control diffs + the support-weighted ATE
    (operators/stats.stratified_ate; per-bin rounded micro diffs, pure
    integer weighted fold, off-support strata reported not imputed)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import stratified_ate

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("hi"),
        "o_totalprice",
    )
    base = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(F.col("c_mktsegment").alias("seg"), "hi", "o_totalprice")
    return stratified_ate(base, "seg", "hi", "o_totalprice").orderBy("bin")


def _sql_ate() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        stratified_ate_sql,
    )

    base = """
(SELECT c.c_mktsegment AS seg,
        CAST(o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT) AS hi,
        o.o_totalprice
 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) b
"""
    return stratified_ate_sql(base, "seg", "hi", "o_totalprice") + " ORDER BY bin"


STAGED_QUERIES["priority_order_ate"] = q_ate
STAGED_ORACLES["priority_order_ate"] = _sql_ate()


# --- Burstiness of daily event counts per type ----------------------------------


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types arrive in BURSTS vs a steady Poisson-like
    stream? Fano factor of the daily count series per type
    (operators/stats.dispersion_index over the observed-day rollup;
    exact integer moments, one rounded division)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import dispersion_index
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("_day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return dispersion_index(daily, ["event_type"], "cnt").orderBy(
        "event_type"
    )


def _sql_burstiness() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        dispersion_index_sql,
    )

    daily = """
(SELECT event_type, CAST(ts AS DATE) AS _day,
        CAST(count(*) AS BIGINT) AS cnt
 FROM events WHERE ts IS NOT NULL GROUP BY 1, 2) d
"""
    return (
        dispersion_index_sql(daily, ["event_type"], "cnt")
        + " ORDER BY event_type"
    )


STAGED_QUERIES["event_burstiness"] = q_burstiness
STAGED_ORACLES["event_burstiness"] = _sql_burstiness()


# --- Isotonic calibration: does length predict English? -------------------------

ISO_BINS = 10
ISO_SCORE = "least(n_chars * 1666, 1000000)"  # chars -> ppm-ish score


def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone recalibration of a crude length score against the
    is-English label: raw per-bin rates + the PAV fit in closed minimax
    form (operators/eval_metrics.isotonic_calibration_bins; bounded
    B³/6 relational expansion, no iterative sweep)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_calibration_bins,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.expr(ISO_SCORE).alias("score"),
        (F.col("lang") == "en").cast("long").alias("lbl"),
    )
    return isotonic_calibration_bins(docs, "score", "lbl", ISO_BINS).orderBy(
        "bin"
    )


def _sql_isotonic() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_calibration_bins_sql,
    )

    base = f"""
(SELECT {ISO_SCORE} AS score,
        CAST(lang = 'en' AS BIGINT) AS lbl
 FROM documents) d
"""
    return (
        isotonic_calibration_bins_sql(base, "score", "lbl", ISO_BINS)
        + " ORDER BY bin"
    )


STAGED_QUERIES["length_isotonic_calibration"] = q_isotonic
STAGED_ORACLES["length_isotonic_calibration"] = _sql_isotonic()


# --- MMR diversified rerank of cluster members ----------------------------------

MMR_K = 4
MMR_CANDS = 8  # candidate list bound per label (the retrieval top-m)


def q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pick a relevant-but-diverse 4 of each embedding cluster's first
    8 members: relevance = exact integer code dot-product with the
    cluster's min-id anchor, diversity = MMR with min-L2² blending
    (similarity.mmr_rerank; all-BIGINT scores, k parallel rounds, no
    per-query loop)."""
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        mmr_rerank,
        quantize_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.col("vec_id") % 50 < MMR_CANDS)
    )
    # one materialization shared by the anchor argmin and both sides of
    # the anchor-code join (the silhouette-wrapper r14 pattern)
    q = quantize_embeddings(emb, "vec_id", "embedding").join(
        _t(spark, sf_dir, "embeddings").select("vec_id", "label"), "vec_id"
    ).localCheckpoint(eager=False)
    anchor = q.groupBy("label").agg(F.min("vec_id").alias("_aid"))
    anchored = (
        q.join(anchor, "label")
        .join(
            q.select(
                F.col("vec_id").alias("_aid"), F.col("q").alias("_aq"),
                F.col("label").alias("_albl"),
            ),
            ["_aid"],
        )
        .where(F.col("label") == F.col("_albl"))
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("q"),
            F.col("_aq"),
            lambda x, y: x.cast("long") * y.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cands = anchored.select(
        "label", "vec_id", dot.alias("rel"), F.col("q").alias("v")
    )
    return mmr_rerank(
        cands, "label", "vec_id", "rel", "v", MMR_K
    ).orderBy("query", "sel_round")


def _sql_mmr() -> str:
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        mmr_rerank_sql,
        quantize_embeddings_sql,
    )

    qcte = quantize_embeddings_sql(
        f"(SELECT * FROM embeddings WHERE embedding IS NOT NULL "
        f"AND vec_id % 50 < {MMR_CANDS}) e0",
        "vec_id",
        "embedding",
    )
    dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, len(qq.q) + 1), "
        "j -> CAST(qq.q[j] AS BIGINT) * CAST(aq.q[j] AS BIGINT))), "
        "(x, y) -> x + y)"
    )
    cands = f"""
(WITH qz AS ({qcte}),
 ql AS (SELECT qz.vec_id, qz.q, e.label
        FROM qz JOIN embeddings e ON qz.vec_id = e.vec_id),
 anchor AS (SELECT label, min(vec_id) AS aid FROM ql GROUP BY label)
 SELECT qq.label, qq.vec_id, {dot} AS rel, qq.q AS v
 FROM ql qq
 JOIN anchor a ON qq.label = a.label
 JOIN ql aq ON aq.vec_id = a.aid) c
"""
    return (
        mmr_rerank_sql(cands, "label", "vec_id", "rel", "v", MMR_K)
        + " ORDER BY query, sel_round"
    )


STAGED_QUERIES["cluster_mmr_rerank"] = q_mmr
STAGED_ORACLES["cluster_mmr_rerank"] = _sql_mmr()


# --- Modularity of the co-purchase LPA communities ------------------------------

MOD_LPA_ROUNDS = 2


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did label propagation actually find structure in the co-purchase
    graph? Newman-Girvan modularity of the 2-round LPA partition —
    per-community diagnostics + the one-number Q
    (graph.community_modularity; exact decimal folds, ONE rounded
    division)."""
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _copurchase_edges

    # the co-purchase derivation (lineitem self-join + support filter)
    # feeds the symmetrized LPA input twice AND the modularity edge set:
    # checkpoint it once (the LPA/triangle discipline)
    cop = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    sym = cop.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        cop.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    labels = G.label_propagation(sym, rounds=MOD_LPA_ROUNDS)
    return G.community_modularity(cop, labels).orderBy("label")


def _sql_modularity() -> str:
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import (
        _COPURCHASE_EDGES_SQL,
    )

    sym = (
        f"SELECT u AS src, v AS dst FROM ({_COPURCHASE_EDGES_SQL}) _e1 "
        f"UNION ALL SELECT v AS src, u AS dst FROM ({_COPURCHASE_EDGES_SQL}) _e2"
    )
    labels = G.label_propagation_sql(sym, rounds=MOD_LPA_ROUNDS)
    return (
        G.community_modularity_sql(_COPURCHASE_EDGES_SQL, labels)
        + " ORDER BY label"
    )


STAGED_QUERIES["copurchase_modularity"] = q_modularity
STAGED_ORACLES["copurchase_modularity"] = _sql_modularity()


# --- Simplified silhouette of the embedding labels vs per-label anchors ---------


def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How separated are the embedding clusters? Simplified silhouette
    of every vector against the per-label anchor points (each label's
    min-id member as its center — the medoid-anchor form; the centroid
    form plugs kmeans_step output into the same operator)
    (similarity.simplified_silhouette; one bounded-centroid broadcast,
    exact BIGINT distances, fixed sqrt sequence)."""
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        quantize_embeddings,
        simplified_silhouette,
    )

    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    # one materialization shared by the anchor argmin, the anchor-code
    # join and the silhouette point scan (the PPR-wrapper r14 pattern —
    # the quantize transform otherwise re-runs per branch)
    q = quantize_embeddings(emb, "vec_id", "embedding").join(
        emb.select("vec_id", "label"), "vec_id"
    ).localCheckpoint(eager=False)
    anchor = q.groupBy("label").agg(F.min("vec_id").alias("_aid"))
    cen = (
        anchor.join(
            q.select(F.col("vec_id").alias("_aid"), F.col("q").alias("_q0")),
            "_aid",
        )
        .select(F.col("label").cast("long").alias("cid"), F.col("_q0").alias("q"))
    )
    return simplified_silhouette(q, cen, "vec_id", "q").orderBy("cid")


def _sql_silhouette() -> str:
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        quantize_embeddings_sql,
        simplified_silhouette_sql,
    )

    qz = quantize_embeddings_sql(
        "(SELECT * FROM embeddings WHERE embedding IS NOT NULL) e0",
        "vec_id",
        "embedding",
    )
    pts = f"""
(WITH qz AS ({qz})
 SELECT qz.vec_id, qz.q AS v, e.label
 FROM qz JOIN embeddings e ON qz.vec_id = e.vec_id) p0
"""
    cen = f"""
(WITH qz AS ({qz}),
 ql AS (SELECT qz.vec_id, qz.q, e.label
        FROM qz JOIN embeddings e ON qz.vec_id = e.vec_id),
 anchor AS (SELECT label, min(vec_id) AS aid FROM ql GROUP BY label)
 SELECT CAST(a.label AS BIGINT) AS cid, ql.q
 FROM anchor a JOIN ql ON ql.vec_id = a.aid) c0
"""
    return (
        simplified_silhouette_sql(pts, cen, "vec_id", "v") + " ORDER BY cid"
    )


STAGED_QUERIES["embedding_label_silhouette"] = q_silhouette
STAGED_ORACLES["embedding_label_silhouette"] = _sql_silhouette()
