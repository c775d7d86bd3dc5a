"""r10-STAGED battery queries: operators landed in round 9 with query +
DuckDB oracle fully wired, held OUT of ``__spark_entry__`` until the r10
window rotation (same staged -> parity-pinned -> registered lifecycle as
``plans/staged.py`` (r8) and ``plans/staged_r9.py`` (r9) — see the window
plan in ``__spark_entry__.py``).

r10 registration: ``q.update(staged_r10.STAGED_QUERIES)`` and slot into
``_HEAD``. Until then ``tests/test_staged_r10_surfaces.py`` runs the exact
driver-gate comparison (sorted-column value equality + scalar-output rule)
on every entry at sf0.001 and sf0.01.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.dedup import (
    sorted_neighborhood_pairs,
    sorted_neighborhood_pairs_sql,
)
from dwh_etl_ods_spark_jobs_spark.operators.stats import (
    robust_outlier_census,
    robust_outlier_census_sql,
)
from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
    decay_halving_agg,
    decay_halving_agg_sql,
)
from dwh_etl_ods_spark_jobs_spark.similarity import jl_project, jl_project_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}

# Battery consolidation slots (empty until an r10 retirement earns one).
# r10 retirement EXECUTED at registration: battery 120 + 28 - 9 = 139;
# all nine candidates below were retired into their defining modules'
# RETIRED_QUERIES (pipeline: text_stats_tokens, text_filter_pipeline,
# dedup_ngram_jaccard, ann_lsh_multiprobe, ann_ivf_nprobe2; staged:
# tpch_q5_local_volume, tpch_q14_promo_share; showcase:
# full_outer_coalesce; coverage: sessionize_gap) — zero coverage loss,
# every one still oracle-gated by tests/test_retired_surfaces.py.
# Original candidate rationale: (a) single-parameter ANN variants
# whose physiology ann_recall_eval now exercises end-to-end
# (ann_lsh_multiprobe, ann_ivf_nprobe2 — the recall eval RUNS both the
# brute-force truth and the IVF candidate list); (b) TPC-H shapes whose
# plan pattern duplicates a sibling (tpch_q5_local_volume ~ q3 shape,
# tpch_q14_promo_share ~ q19 disjunctive-filter shape); (c) per-op text
# queries subsumed by corpus_prep_pipeline (text_stats_tokens,
# text_filter_pipeline); (d) dedup_ngram_jaccard subsumed by
# dedup_blocking_quality (which runs it as the TRUTH side) and
# dedup_prefix_filter_jaccard (same semantics, scale-path candidate
# generation); (e) full_outer_coalesce subsumed by cdc_feed_apply's
# merge; (f) sessionize_gap subsumed by session_path_trigrams's
# sessionize stage. Final pick happens at registration against the
# r10 gate-window arithmetic in __spark_entry__.py.
RETIRED_QUERIES: dict = {}
RETIRED_ORACLES: dict = {}


# --- recency-decayed segment value (exact halving decay) ---

DECAY_HALF_LIFE_DAYS = 180


def q_decayed_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted revenue per customer market segment: order value
    halves every 180 days of age relative to the corpus's own latest
    order date (data-derived anchor attached by constant-key broadcast —
    no collect). The decay is an integer right-shift
    (operators/timeseries.decay_halving_agg), so the fold is exact and
    engine-portable; segments join in via a broadcast of the small
    customer dim projection."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    anchor = orders.groupBy().agg(F.max("d").alias("_anchor")).withColumn("_one", one)
    aged = (
        orders.withColumn("_one", one)
        .join(F.broadcast(anchor), "_one")
        .withColumn("age_days", F.datediff(F.col("_anchor"), F.col("d")))
        .join(cust, "o_custkey")
    )
    return aged.transform(
        decay_halving_agg(
            ["c_mktsegment"], F.col("cents"), F.col("age_days"),
            DECAY_HALF_LIFE_DAYS,
        )
    ).orderBy("c_mktsegment")


SQL_DECAYED_SEGMENT_VALUE = (
    decay_halving_agg_sql(
        """(
  SELECT c.c_mktsegment,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST((SELECT max(CAST(o_orderdate AS DATE)) FROM orders)
              - CAST(o.o_orderdate AS DATE) AS BIGINT) AS age_days
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
) t""",
        ["c_mktsegment"],
        "cents",
        "age_days",
        DECAY_HALF_LIFE_DAYS,
    )
    + " ORDER BY c_mktsegment"
)

STAGED_QUERIES["decayed_segment_value"] = q_decayed_segment_value
STAGED_ORACLES["decayed_segment_value"] = SQL_DECAYED_SEGMENT_VALUE


# --- sorted-neighborhood linkage candidates ---

SN_WINDOW, SN_MAX_LEV = 2, 4


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking over customer names: each record
    compares only to its 2 successors in name order, pairs within edit
    distance 4 survive — the classic O(n·w) linkage candidate generator
    (typo-close names that LSH shingle bands miss). Rank is the
    distributed global_rank; output census per edit distance keeps the
    battery frame compact while pinning every pair through the hash."""
    cust = _t(spark, sf_dir, "customer")
    pairs = sorted_neighborhood_pairs(
        cust, "c_custkey", "c_name", window=SN_WINDOW, max_distance=SN_MAX_LEV
    )
    return (
        pairs.groupBy("lev")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("a_id").cast("long").alias("min_a_id"),
            F.max("b_id").cast("long").alias("max_b_id"),
            F.sum(F.col("a_id") + F.col("b_id")).cast("long").alias("id_sum"),
        )
        .orderBy("lev")
    )


SQL_SORTED_NEIGHBORHOOD = f"""
WITH pairs AS ({sorted_neighborhood_pairs_sql(
    "customer", "c_custkey", "c_name", window=SN_WINDOW, max_distance=SN_MAX_LEV
)})
SELECT lev,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(a_id) AS BIGINT) AS min_a_id,
       CAST(max(b_id) AS BIGINT) AS max_b_id,
       CAST(sum(CAST(a_id AS BIGINT) + b_id) AS BIGINT) AS id_sum
FROM pairs GROUP BY lev ORDER BY lev
"""

STAGED_QUERIES["sorted_neighborhood_linkage"] = q_sorted_neighborhood
STAGED_ORACLES["sorted_neighborhood_linkage"] = SQL_SORTED_NEIGHBORHOOD


# --- Johnson-Lindenstrauss embedding projection ---

JL_IN_DIM, JL_OUT_DIM, JL_SEED = 64, 8, "jl-r10"


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±1 Johnson-Lindenstrauss projection of the 64-dim embedding column
    to 8 exact-integer components (similarity.jl_project — plan-literal
    signs, scan-side, zero shuffles besides the final order). The
    narrow-space feeder for banding/ANN when embeddings are too wide to
    shuffle whole."""
    emb = _t(spark, sf_dir, "embeddings")
    return jl_project(
        emb, "vec_id", "embedding", JL_IN_DIM, JL_OUT_DIM, JL_SEED
    ).orderBy("vec_id")


SQL_JL_PROJECTION = (
    jl_project_sql(
        "embeddings", "vec_id", "embedding", JL_IN_DIM, JL_OUT_DIM, JL_SEED
    )
    + " ORDER BY vec_id"
)

STAGED_QUERIES["embedding_jl_projection"] = q_jl_projection
STAGED_ORACLES["embedding_jl_projection"] = SQL_JL_PROJECTION


# --- weekday-seasonal residual anomalies ---

SW_K = 3


def q_seasonal_weekday_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly census: daily event revenue compared to
    its OWN weekday's median/MAD (Monday compares to Mondays) — the
    robust residual screen that CUSUM (mean-shift) and a global MAD
    census both miss when the series has a weekly cycle. Composes the
    daily rollup with robust_outlier_census grouped by weekday; exact
    integer medians (2x/4x carry)."""
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        (F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")) / F.lit(100.0))
        .alias("revenue")
    )
    # weekday: Monday=0 .. Sunday=6 in BOTH engines (Spark weekday() ==
    # DuckDB isodow - 1)
    dowd = daily.withColumn("dow", F.weekday("day").cast("int"))
    return dowd.transform(
        robust_outlier_census(["dow"], "revenue", k=SW_K)
    ).orderBy("dow")


def _sql_seasonal() -> str:
    inner = robust_outlier_census_sql(
        """(
  SELECT CAST(isodow(day) - 1 AS INT) AS dow, revenue
  FROM (
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0
             AS revenue
    FROM events GROUP BY 1
  )
) t""",
        ["dow"],
        "revenue",
        k=SW_K,
    )
    return inner + " ORDER BY dow"


SQL_SEASONAL_WEEKDAY = _sql_seasonal()

# r14 consolidation retirement (the staged_r17.py shortlist, confirmed
# at the r17-wave registration per VERDICT r13 #2): weekly_seasonality_
# mase (staged_r17) carries the decision-grade weekly-pattern readout
# (seasonal-naive forecast backtest) over the same daily rollup; the
# weekday median/MAD residual screen stays oracle-gated here
# (tests/test_retired_surfaces.py), one-in/one-out.
RETIRED_QUERIES["seasonal_weekday_outliers"] = q_seasonal_weekday_outliers
RETIRED_ORACLES["seasonal_weekday_outliers"] = SQL_SEASONAL_WEEKDAY


# --- tokenizer fertility by language ---


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per detected language: chars/token and
    tokens/word in exact ppm — the curation metric that decides whether a
    tokenizer under-serves a language slice (high fertility = more tokens
    per word = costlier training). Composes langid + whitespace tokens +
    the BPE-approximating count; scan-side expressions, one groupBy."""
    from dwh_etl_ods_spark_jobs_spark import text as T

    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        T.langid(F.col("text")).alias("lang"),
        F.length("text").cast("long").alias("chars"),
        T.token_count(F.col("text")).cast("long").alias("words"),
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("btok"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("chars").cast("long").alias("chars"),
        F.sum("words").cast("long").alias("words"),
        F.sum("btok").cast("long").alias("bpe_ish_tokens"),
    )
    ppm = lambda num, den: F.expr(  # noqa: E731
        f"CAST((({num}) * 1000000 - pmod(({num}) * 1000000, {den})) div ({den}) AS BIGINT)"
    )
    # a language slice of only empty/whitespace docs has zero tokens —
    # exclude it rather than divide by zero (both engines would error
    # under ANSI semantics)
    return agg.filter(
        (F.col("bpe_ish_tokens") > 0) & (F.col("words") > 0)
    ).select(
        "lang", "n_docs", "chars", "words", "bpe_ish_tokens",
        ppm("chars", "bpe_ish_tokens").alias("chars_per_token_ppm"),
        ppm("bpe_ish_tokens", "words").alias("fertility_ppm"),
    ).orderBy("lang")


def _sql_fertility() -> str:
    from dwh_etl_ods_spark_jobs_spark import text as T

    return f"""
WITH per_doc AS (
  SELECT {T.langid_sql('text')} AS lang,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(len({T.tokens_sql('text')}) AS BIGINT) AS words,
         CAST({T.bpe_ish_token_count_sql('text')} AS BIGINT) AS btok
  FROM documents
),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(chars) AS BIGINT) AS chars,
         CAST(sum(words) AS BIGINT) AS words,
         CAST(sum(btok) AS BIGINT) AS bpe_ish_tokens
  FROM per_doc GROUP BY lang
)
SELECT lang, n_docs, chars, words, bpe_ish_tokens,
       CAST((chars * 1000000) // bpe_ish_tokens AS BIGINT) AS chars_per_token_ppm,
       CAST((bpe_ish_tokens * 1000000) // words AS BIGINT) AS fertility_ppm
FROM agg
WHERE bpe_ish_tokens > 0 AND words > 0
ORDER BY lang
"""


SQL_TOKENIZER_FERTILITY = _sql_fertility()

STAGED_QUERIES["tokenizer_fertility_by_lang"] = q_tokenizer_fertility
STAGED_ORACLES["tokenizer_fertility_by_lang"] = SQL_TOKENIZER_FERTILITY


# --- shingle-containment near-dup pairs (asymmetric) ---

CONT_THRESHOLD_PPM = 300000  # keep pairs where either side is >=30% contained


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs over documents: catches
    subset/superset relationships (doc swallowed by another) that the
    symmetric Jaccard under-scores. Census per containment decile of the
    dominant direction keeps the battery frame compact while pinning
    every pair through the hash."""
    from dwh_etl_ods_spark_jobs_spark.dedup import ngram_containment_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_containment_pairs(
        docs, "text", "doc_id", threshold_ppm=CONT_THRESHOLD_PPM
    )
    decile = (
        F.expr(
            "CAST((greatest(cont_a_ppm, cont_b_ppm) * 10"
            " - pmod(greatest(cont_a_ppm, cont_b_ppm) * 10, 1000000))"
            " div 1000000 AS BIGINT)"
        )
    )
    return (
        pairs.groupBy(decile.alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_sum"),
            F.sum("inter").cast("long").alias("inter_sum"),
            F.min(F.col("cont_a_ppm")).cast("long").alias("min_cont_a_ppm"),
            F.max(F.col("cont_b_ppm")).cast("long").alias("max_cont_b_ppm"),
        )
        .orderBy("decile")
    )


def _sql_containment() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import ngram_containment_pairs_sql

    pairs = ngram_containment_pairs_sql(
        "documents", "text", "doc_id", threshold_ppm=CONT_THRESHOLD_PPM
    )
    return f"""
WITH pairs AS ({pairs})
SELECT (greatest(cont_a_ppm, cont_b_ppm) * 10) // 1000000 AS decile,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(id_a + id_b) AS BIGINT) AS id_sum,
       CAST(sum(inter) AS BIGINT) AS inter_sum,
       CAST(min(cont_a_ppm) AS BIGINT) AS min_cont_a_ppm,
       CAST(max(cont_b_ppm) AS BIGINT) AS max_cont_b_ppm
FROM pairs GROUP BY 1 ORDER BY 1
"""


STAGED_QUERIES["dedup_containment_census"] = q_ngram_containment
STAGED_ORACLES["dedup_containment_census"] = _sql_containment()


# --- k-core of the supplier-customer graph ---

K_CORE_K = 8


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-core of the supplier↔customer transaction graph (iterative
    peel): the dense kernel where every surviving node keeps ≥8
    within-core neighbors. Census per side and degree keeps the frame
    compact; the oracle unrolls the peel 12 rounds (idempotent past the
    fixpoint)."""
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _sc_edges

    core = G.k_core(_sc_edges(spark, sf_dir), k=K_CORE_K)
    side = F.when(F.col("node") % 2 == 0, F.lit("supp")).otherwise(F.lit("cust"))
    return (
        core.groupBy(side.alias("side"), F.col("degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("node").cast("long").alias("node_sum"),
        )
        .orderBy("side", "degree")
    )


def _sql_k_core() -> str:
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _SC_EDGES_SQL

    core = G.k_core_sql(
        f"SELECT src, dst FROM ({_SC_EDGES_SQL}) _sym_", k=K_CORE_K, iters=12
    )
    return f"""
WITH core AS ({core})
SELECT CASE WHEN node % 2 = 0 THEN 'supp' ELSE 'cust' END AS side,
       degree,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(node) AS BIGINT) AS node_sum
FROM core GROUP BY 1, 2 ORDER BY 1, 2
"""


STAGED_QUERIES["graph_k_core_census"] = q_k_core
STAGED_ORACLES["graph_k_core_census"] = _sql_k_core()


# --- Kolmogorov-Smirnov drift statistic ---


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Old-vs-new load drift as the KS statistic (max CDF gap in exact
    ppm) over the shared HDR bucketing — the same %3 price-inflation
    scenario as the TVD and W1 monitors; KS is the classical two-sample
    test statistic a monitoring threshold maps onto."""
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_ks_drift

    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    orders = _t(spark, sf_dir, "orders")
    old = orders.select(cents.alias("cents"))
    new = orders.select(
        F.when(
            F.col("o_orderkey") % 3 == 0, (cents * 26) - ((cents * 26) % 10)
        ).otherwise(cents * 10).alias("scaled")
    ).select((F.col("scaled") / 10).cast("long").alias("cents"))
    return hdr_ks_drift(old, new, "cents")


def _sql_ks_drift() -> str:
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_ks_drift_sql

    base = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
    return hdr_ks_drift_sql(
        f"SELECT {base} AS cents FROM orders",
        f"SELECT CAST((CASE WHEN o_orderkey % 3 = 0"
        f" THEN ({base} * 26) - (({base} * 26) % 10)"
        f" ELSE {base} * 10 END) / 10 AS BIGINT) AS cents FROM orders",
        "cents",
    )


STAGED_QUERIES["ks_drift_stat"] = q_ks_drift
STAGED_ORACLES["ks_drift_stat"] = _sql_ks_drift()


# --- reciprocal-rank fusion of lexical + semantic retrieval ---

RRF_K, RRF_LIST_K = 60, 10


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-free hybrid retrieval: fuse the BM25 top-10 (lexical) and
    the exact-cosine top-10 (semantic, vs the vec_id=0 query embedding)
    by reciprocal-rank fusion — no score calibration, only ranks enter.
    Contrast with hybrid_retrieval_rerank (a CASCADE: BM25 gates, cosine
    decides); RRF treats both lists as peers, so a doc missed by BM25
    can still win on its semantic rank. Both list windows are
    ≤10-row frames; fusion is one bounded groupBy."""
    from pyspark.sql import Window

    from dwh_etl_ods_spark_jobs_spark import curation as C
    from dwh_etl_ods_spark_jobs_spark import similarity as S
    from dwh_etl_ods_spark_jobs_spark.plans.staged_r9 import HY_QUERY_ID, HY_TERMS

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    wb = Window.orderBy(F.col("bm25_micro").desc(), F.col("doc_id").asc())
    lexical = (
        docs.transform(C.bm25_topk("doc_id", "text", HY_TERMS, k=RRF_LIST_K))
        .withColumn("rank", F.row_number().over(wb))  # <=10-row frame
        .select("doc_id", "rank")
    )
    semantic = S.ann_bruteforce_topk(
        emb.filter(F.col("vec_id") == HY_QUERY_ID), emb, "vec_id", "v",
        k=RRF_LIST_K,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    fused = S.reciprocal_rank_fusion(
        [lexical, semantic], "doc_id", "rank", k=RRF_K
    )
    return fused.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())


def _sql_rrf() -> str:
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark import similarity as S
    from dwh_etl_ods_spark_jobs_spark.plans.curation import _sql_bm25
    from dwh_etl_ods_spark_jobs_spark.plans.staged_r9 import HY_DIM, HY_QUERY_ID

    cos = D.cosine_sql("q.v", "c.v", HY_DIM)
    lexical = f"""
SELECT doc_id,
       row_number() OVER (ORDER BY bm25_micro DESC, doc_id ASC) AS rank
FROM ({_sql_bm25(k=RRF_LIST_K)})
"""
    semantic = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT * FROM emb WHERE vec_id = {HY_QUERY_ID}),
ranked AS (
  SELECT c.vec_id AS doc_id,
         row_number() OVER (ORDER BY round({cos}, 6) DESC, c.vec_id ASC)
           AS rank
  FROM q JOIN emb c ON q.vec_id <> c.vec_id
)
SELECT doc_id, rank FROM ranked WHERE rank <= {RRF_LIST_K}
"""
    fused = S.reciprocal_rank_fusion_sql(
        [lexical, semantic], "doc_id", "rank", k=RRF_K
    )
    return f"{fused}\nORDER BY rrf_micro DESC, doc_id ASC"


STAGED_QUERIES["rrf_hybrid_fusion"] = q_rrf_fusion
STAGED_ORACLES["rrf_hybrid_fusion"] = _sql_rrf()


# --- l-diversity privacy census ---

LDIV_L = 3


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over documents: quasi-identifier = (lang,
    source), sensitive attribute = the document's length bucket (chars
    div 100). A (lang, source) class whose members all share one length
    bucket leaks that bucket for every member even when the class is
    k-anonymous — the census counts classes below l=3 distinct sensitive
    values."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import l_diversity_census

    docs = _t(spark, sf_dir, "documents").select(
        "lang", "source",
        F.expr("(n_chars - pmod(n_chars, 100)) div 100").alias("len_bucket"),
    )
    return l_diversity_census(
        docs, ["lang", "source"], "len_bucket", l_min=LDIV_L
    ).orderBy("diversity")


def _sql_l_diversity() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.quality import l_diversity_census_sql

    return (
        l_diversity_census_sql(
            "(SELECT lang, source, n_chars // 100 AS len_bucket"
            " FROM documents) t",
            ["lang", "source"],
            "len_bucket",
            l_min=LDIV_L,
        )
        + " ORDER BY diversity"
    )


STAGED_QUERIES["l_diversity_census"] = q_l_diversity
STAGED_ORACLES["l_diversity_census"] = _sql_l_diversity()


# --- prefix-filtered Jaccard similarity join (AllPairs/PPJoin family) ---

PFJ_THRESHOLD_PPM = 500000


def q_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard≥0.5 near-dup pairs over documents via PREFIX
    FILTERING: only each document's rarest-first shingle prefix enters
    the self-join (recall stays exact by the prefix-filtering lemma), so
    hot shingles generate zero candidates — the scale path for
    similarity self-joins where the plain posting join's hot-key C(d,2)
    blowup bites. Both engines run the same filtered plan, so parity
    pins the exact-recall claim."""
    from dwh_etl_ods_spark_jobs_spark.dedup import prefix_filter_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        docs, "text", "doc_id", threshold_ppm=PFJ_THRESHOLD_PPM
    ).orderBy("id_a", "id_b")


def _sql_prefix_filter_jaccard() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import prefix_filter_jaccard_pairs_sql

    return (
        prefix_filter_jaccard_pairs_sql(
            "documents", "text", "doc_id", threshold_ppm=PFJ_THRESHOLD_PPM
        )
        + " ORDER BY id_a, id_b"
    )


STAGED_QUERIES["dedup_prefix_filter_jaccard"] = q_prefix_filter_jaccard
STAGED_ORACLES["dedup_prefix_filter_jaccard"] = _sql_prefix_filter_jaccard()


# --- mutual information between document language and source ---


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI(lang; source) over documents in exact micro-nats — the
    information-units companion to the chi² independence monitor
    (chi2_lang_source): feature-selection and leakage screens threshold
    on MI directly. Count-exact terms, per-term micro rounding (the
    entropy/PMI float discipline)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import mutual_information

    return mutual_information(_t(spark, sf_dir, "documents"), "lang", "source")


def _sql_mutual_information() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import mutual_information_sql

    return mutual_information_sql("documents", "lang", "source")


STAGED_QUERIES["mutual_info_lang_source"] = q_mutual_information
STAGED_ORACLES["mutual_info_lang_source"] = _sql_mutual_information()


# --- KL unigram drift between the old and new source mixes ---

KL_P_PRED = "CAST(substr(source, 4) AS INT) < 10"


def q_kl_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P‖Q) in exact micro-nats between the unigram distributions of
    the src0-src9 slice (current mix) and the src10-src19 slice
    (incoming mix) — the token-space drift monitor that complements the
    bucketed-numeric TVD/W1/KS family. Laplace-smoothed over the union
    vocabulary so private tokens stay finite."""
    from dwh_etl_ods_spark_jobs_spark.curation import kl_token_drift

    docs = _t(spark, sf_dir, "documents")
    pred = F.expr(KL_P_PRED)
    return kl_token_drift(docs.filter(pred), docs.filter(~pred), "text")


def _sql_kl_token_drift() -> str:
    from dwh_etl_ods_spark_jobs_spark.curation import kl_token_drift_sql

    return kl_token_drift_sql(
        f"(SELECT * FROM documents WHERE {KL_P_PRED}) p",
        f"(SELECT * FROM documents WHERE NOT ({KL_P_PRED})) q",
        "text",
    )


STAGED_QUERIES["kl_unigram_drift"] = q_kl_token_drift
STAGED_ORACLES["kl_unigram_drift"] = _sql_kl_token_drift()


# --- deterministic PPS systematic sample of the corpus ---

PPS_N = 40


def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible weight-proportional systematic sample: 40 picks over
    documents with probability ∝ n_chars, laid out on a deterministic
    md5(doc_id) axis — the no-rand() sampler a training-mix builder
    replays identically on any cluster. Heavy documents may carry
    multiplicity (standard PPS); pick counts are exact integers."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        systematic_weighted_sample,
    )
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .withColumn("_h", md5_long(F.col("doc_id").cast("string")))
    )
    return (
        docs.transform(
            systematic_weighted_sample(["_h", "doc_id"], "n_chars", PPS_N)
        )
        .select("doc_id", "n_chars", "n_picks")
        .orderBy("doc_id")
    )


def _sql_pps_sample() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        systematic_weighted_sample_sql,
    )
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    h = md5_long_sql("CAST(doc_id AS VARCHAR)")
    inner = systematic_weighted_sample_sql(
        "documents", ["doc_id", "n_chars"], [f"{h}", "doc_id"],
        "n_chars", PPS_N,
    )
    return inner + " ORDER BY doc_id"


STAGED_QUERIES["pps_systematic_sample"] = q_pps_sample
STAGED_ORACLES["pps_systematic_sample"] = _sql_pps_sample()


# --- winsorized / trimmed order-value stats per priority ---


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-winsorized and trimmed order-value sums (exact cents) per order
    priority: the robust aggregates that survive fat-finger rows. Ranks
    come from the grouped range decomposition — five giant priority
    groups never funnel through five window tasks."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import winsorized_stats

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return winsorized_stats(
        orders, ["o_orderpriority"], "cents", "o_orderkey", trim_pct=5
    ).orderBy("o_orderpriority")


def _sql_winsorized_stats() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import winsorized_stats_sql

    return (
        winsorized_stats_sql(
            "(SELECT o_orderpriority, o_orderkey,"
            " CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents"
            " FROM orders) t",
            ["o_orderpriority"],
            "cents",
            "o_orderkey",
            trim_pct=5,
        )
        + " ORDER BY o_orderpriority"
    )


STAGED_QUERIES["winsorized_priority_stats"] = q_winsorized_stats
STAGED_ORACLES["winsorized_priority_stats"] = _sql_winsorized_stats()


# --- linear-interpolation gap fill of daily per-cohort spend ---


def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily spend series per user cohort (user_id mod 10) with
    exact floored linear interpolation across days no event landed on —
    the lerp companion to the LOCF fill. Observation days carry
    is_obs=1 and reproduce the daily sum exactly."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        gap_fill_interpolate,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    daily = (
        read_events(spark, sf_dir)
        .groupBy(
            (F.col("user_id") % 10).alias("cohort"),
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    return gap_fill_interpolate(daily, ["cohort"], "day", "cents").orderBy(
        "cohort", "day"
    )


def _sql_gap_fill_interpolate() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        gap_fill_interpolate_sql,
    )

    daily = """
(SELECT user_id % 10 AS cohort,
        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
 FROM events GROUP BY 1, 2) daily
"""
    return (
        gap_fill_interpolate_sql(daily, ["cohort"], "day", "cents")
        + " ORDER BY cohort, day"
    )


STAGED_QUERIES["gap_fill_lerp_daily"] = q_gap_fill_interpolate
STAGED_ORACLES["gap_fill_lerp_daily"] = _sql_gap_fill_interpolate()


# --- mutual k-nearest-neighbor pairs over embeddings ---

MKNN_K, MKNN_PLANES = 3, 6


def q_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal top-3 neighbor pairs among LSH bucket-mates (6
    hyperplanes → 64 buckets): the precision filter semantic-dedup
    applies before trusting an ANN edge — hub vectors that appear in
    everyone's list but reciprocate nothing drop out."""
    from dwh_etl_ods_spark_jobs_spark.dedup import mutual_knn_pairs
    from dwh_etl_ods_spark_jobs_spark.plans.staged_r9 import HY_DIM

    emb = _t(spark, sf_dir, "embeddings")
    return mutual_knn_pairs(
        emb, "embedding", "vec_id", k=MKNN_K, dim=HY_DIM, n_planes=MKNN_PLANES
    ).orderBy("id_a", "id_b")


def _sql_mutual_knn() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import mutual_knn_pairs_sql
    from dwh_etl_ods_spark_jobs_spark.plans.staged_r9 import HY_DIM

    return (
        mutual_knn_pairs_sql(
            "embeddings", "embedding", "vec_id",
            k=MKNN_K, dim=HY_DIM, n_planes=MKNN_PLANES,
        )
        + " ORDER BY id_a, id_b"
    )


STAGED_QUERIES["mutual_knn_pairs"] = q_mutual_knn
STAGED_ORACLES["mutual_knn_pairs"] = _sql_mutual_knn()


# --- positional phrase-match census ---

PHRASES = [("table", "scan"), ("sort", "merge"), ("hash", "join")]


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact adjacent-phrase counts ("table scan" as a PHRASE) from
    positional postings — the retrieval primitive bag-of-words BM25
    can't express. Postings are IN-filtered to phrase words before the
    adjacency join touches them."""
    from dwh_etl_ods_spark_jobs_spark.curation import phrase_match_census

    return phrase_match_census(
        _t(spark, sf_dir, "documents"), "doc_id", "text", PHRASES
    ).orderBy("w1", "w2")


def _sql_phrase_match() -> str:
    from dwh_etl_ods_spark_jobs_spark.curation import phrase_match_census_sql

    return (
        phrase_match_census_sql("documents", "doc_id", "text", PHRASES)
        + " ORDER BY w1, w2"
    )


STAGED_QUERIES["phrase_match_census"] = q_phrase_match
STAGED_ORACLES["phrase_match_census"] = _sql_phrase_match()


# --- label-propagation communities on the supplier-customer graph ---

LPA_ROUNDS = 3


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (3 rounds, min-label
    tie-break) over the supplier↔customer transaction graph; census per
    community SIZE keeps the frame compact while node_sum pins every
    membership through the hash."""
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _sc_edges

    labels = G.label_propagation(_sc_edges(spark, sf_dir), rounds=LPA_ROUNDS)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("size"),
        F.sum("node").cast("long").alias("node_sum"),
    )
    return (
        sizes.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum("node_sum").cast("long").alias("node_sum"),
        )
        .orderBy("size")
    )


def _sql_label_propagation() -> str:
    from dwh_etl_ods_spark_jobs_spark import graph as G
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _SC_EDGES_SQL

    lp = G.label_propagation_sql(
        f"SELECT src, dst FROM ({_SC_EDGES_SQL}) _sym_", rounds=LPA_ROUNDS
    )
    return f"""
WITH lp AS ({lp}),
sizes AS (
  SELECT label, CAST(count(*) AS BIGINT) AS size,
         CAST(sum(node) AS BIGINT) AS node_sum
  FROM lp GROUP BY 1
)
SELECT size, CAST(count(*) AS BIGINT) AS n_communities,
       CAST(sum(node_sum) AS BIGINT) AS node_sum
FROM sizes GROUP BY 1 ORDER BY 1
"""


STAGED_QUERIES["graph_label_prop_census"] = q_label_propagation
STAGED_ORACLES["graph_label_prop_census"] = _sql_label_propagation()


# --- ANN recall@5 evaluation: IVF(nprobe=2) vs exact brute force ---


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF nprobe=2 candidate list against the exact
    brute-force ground truth, as a standing pipeline query (not just a
    pytest floor) — reruns on every corpus refresh so an embedding or
    codebook drift that silently craters recall shows up in the gate."""
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        q_ann_bruteforce,
        q_ann_ivf_nprobe2,
    )
    from dwh_etl_ods_spark_jobs_spark.similarity import ann_recall_eval

    return ann_recall_eval(
        q_ann_bruteforce(spark, sf_dir),
        q_ann_ivf_nprobe2(spark, sf_dir),
        k=5,
    )


def _sql_ann_recall() -> str:
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        SQL_ANN_BRUTEFORCE,
        SQL_ANN_IVF_NPROBE2,
    )
    from dwh_etl_ods_spark_jobs_spark.similarity import ann_recall_eval_sql

    return ann_recall_eval_sql(SQL_ANN_BRUTEFORCE, SQL_ANN_IVF_NPROBE2, k=5)


STAGED_QUERIES["ann_recall_eval"] = q_ann_recall
STAGED_ORACLES["ann_recall_eval"] = _sql_ann_recall()


# --- salted-join revenue census (skew operator, oracle-verified) ---

SALT_N = 8


def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part brand through the EXPLICIT salted join
    (operators/skew.salted_join): the big side salts deterministically,
    the dim replicates once per salt, hot part keys spread over 8
    reducers. The oracle is the PLAIN join — parity pins the salting's
    result-equivalence claim on real data (the pytest already pins it on
    synthetic rows)."""
    from dwh_etl_ods_spark_jobs_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber",
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias("_c"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li,
        part.withColumnRenamed("p_partkey", "l_partkey"),
        ["l_partkey"],
        n_salts=SALT_N,
        salt_from=["l_orderkey", "l_linenumber"],
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("_c").cast("long").alias("revenue_cents"),
        )
        .orderBy("p_brand")
    )


SQL_SALTED_JOIN_REVENUE = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1
"""


STAGED_QUERIES["salted_join_revenue"] = q_salted_join_revenue
STAGED_ORACLES["salted_join_revenue"] = SQL_SALTED_JOIN_REVENUE


# --- one oracle-checkable Lloyd iteration over quantized embeddings ---


def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One integer-exact k-means step seeded from the stored labels:
    floored centroid means + exact-L2² reassignment (tie → smaller
    label). The engine-portable twin of train_ivf_centroids' float
    Lloyd loop — this one sits fully under the cross-engine gate."""
    from dwh_etl_ods_spark_jobs_spark.plans.staged_r9 import HY_DIM
    from dwh_etl_ods_spark_jobs_spark.similarity import kmeans_step_quantized

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_step_quantized(
        emb, "vec_id", "embedding", "label", dim=HY_DIM
    ).orderBy("vec_id")


def _sql_kmeans_step() -> str:
    from dwh_etl_ods_spark_jobs_spark.plans.staged_r9 import HY_DIM
    from dwh_etl_ods_spark_jobs_spark.similarity import kmeans_step_quantized_sql

    return (
        kmeans_step_quantized_sql(
            "embeddings", "vec_id", "embedding", "label", dim=HY_DIM
        )
        + " ORDER BY vec_id"
    )


STAGED_QUERIES["kmeans_step_exact"] = q_kmeans_step
STAGED_ORACLES["kmeans_step_exact"] = _sql_kmeans_step()


# --- blocking quality: MinHash banding vs exact-Jaccard ground truth ---


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair completeness of the MinHash/LSH banding (banded for
    Jaccard≥0.5 on w=3 shingles) against the exact ngram-Jaccard truth
    at Jaccard≥0.8 on w=5 shingles — a deliberately STRICTER truth set
    than the banding's tuning point, so completeness measures whether
    the loose banding still recovers every tight near-dup pair (ADVICE
    r9: the two sides intentionally differ in threshold and shingle
    width). The record-linkage evaluation as a standing query (the
    ann_recall_eval twin for the dedup family): a banding config whose
    recall drifts on a corpus refresh fails the gate, not a notebook."""
    from dwh_etl_ods_spark_jobs_spark.dedup import blocking_quality_eval
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        q_dedup_jaccard,
        q_dedup_minhash,
    )

    return blocking_quality_eval(
        q_dedup_minhash(spark, sf_dir), q_dedup_jaccard(spark, sf_dir)
    )


def _sql_blocking_quality() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import blocking_quality_eval_sql
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        SQL_DEDUP_JACCARD,
        SQL_DEDUP_MINHASH,
    )

    return blocking_quality_eval_sql(SQL_DEDUP_MINHASH, SQL_DEDUP_JACCARD)


STAGED_QUERIES["dedup_blocking_quality"] = q_blocking_quality
STAGED_ORACLES["dedup_blocking_quality"] = _sql_blocking_quality()


# --- time-weighted average event value per type ---


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP of event value (cents) per event type over the irregular
    event timeline — hold-forward weighting, so burst minutes don't
    over-weight the mean the way a plain AVG does. Exact integers
    end-to-end (epoch seconds × cents)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        time_weighted_avg,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        # unix_millis, not a cast-to-long: sub-second truncation must be
        # identical in both engines (DuckDB epoch_ms is the exact twin)
        F.unix_millis(F.col("ts")).alias("ms"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    return time_weighted_avg(ev, ["event_type"], "ms", "cents").orderBy(
        "event_type"
    )


def _sql_twap() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        time_weighted_avg_sql,
    )

    return (
        time_weighted_avg_sql(
            "(SELECT event_type, CAST(epoch_ms(ts) AS BIGINT) AS ms,"
            " CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events) t",
            ["event_type"],
            "ms",
            "cents",
        )
        + " ORDER BY event_type"
    )


STAGED_QUERIES["twap_event_value"] = q_twap
STAGED_ORACLES["twap_event_value"] = _sql_twap()


# --- grouped weighted quantiles: price deciles per segment ---

GWQ_QUANTILES = [(1, 4), (1, 2), (3, 4)]


def q_grouped_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quartiles per market segment, weighted by line count
    — exact integer weighted quantiles computed PER GROUP through the
    grouped range decomposition (five giant segments never funnel
    through five window tasks)."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    li_w = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    base = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li_w, orders["o_orderkey"] == li_w["l_orderkey"])
        .select("c_mktsegment", "cents", "o_orderkey", "w")
    )
    return base.transform(
        grouped_weighted_quantile(
            ["c_mktsegment"], ["cents", "o_orderkey"], "w", GWQ_QUANTILES
        )
    ).orderBy("c_mktsegment", "q_num", "q_den")


def _sql_grouped_weighted_quantile() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile_sql,
    )

    base = """
(SELECT c.c_mktsegment, CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
        o.o_orderkey, w.w
 FROM orders o
 JOIN customer c ON o.o_custkey = c.c_custkey
 JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS w
       FROM lineitem GROUP BY 1) w ON o.o_orderkey = w.l_orderkey) base
"""
    return (
        grouped_weighted_quantile_sql(
            base, ["c_mktsegment"], ["cents", "o_orderkey"], "w", GWQ_QUANTILES
        )
        + " ORDER BY c_mktsegment, q_num, q_den"
    )


STAGED_QUERIES["grouped_weighted_quantiles"] = q_grouped_weighted_quantile
STAGED_ORACLES["grouped_weighted_quantiles"] = _sql_grouped_weighted_quantile()


# --- feature relevance ranking by mutual information with the label ---

# explicit floor() before the bigint cast: DuckDB CAST(double AS BIGINT)
# ROUNDS (half-even) while Spark's truncates — floor is the shared form
IG_FEATURES = [
    ("user_bucket", "user_id % 7", "pmod(user_id, 7)"),
    ("value_band", "CAST(floor(value) AS BIGINT) % 5",
     "pmod(CAST(floor(value) AS BIGINT), 5)"),
    ("props_len_band", "length(props) % 4", "pmod(length(props), 4)"),
]


def q_feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-relevance screen: MI(feature; event_type) in exact
    micro-nats for each candidate feature, unioned into one ranking
    frame — the per-feature composition the MI operator exists for
    (leakage screens threshold on exactly this table)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import mutual_information
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir)
    parts = []
    for name, _, spark_expr in IG_FEATURES:
        mi = mutual_information(
            ev.select(F.expr(spark_expr).alias("_f"), "event_type"),
            "_f",
            "event_type",
        ).select(F.lit(name).alias("feature"), "n_rows", "n_cells", "mi_micro")
        parts.append(mi)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("feature")


def _sql_feature_mi_ranking() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import mutual_information_sql

    selects = [
        f"SELECT '{name}' AS feature, * FROM ("
        + mutual_information_sql("events", duck_expr, "event_type")
        + ")"
        for name, duck_expr, _ in IG_FEATURES
    ]
    return "\nUNION ALL\n".join(selects) + "\nORDER BY feature"


STAGED_QUERIES["feature_mi_ranking"] = q_feature_mi_ranking
STAGED_ORACLES["feature_mi_ranking"] = _sql_feature_mi_ranking()


# --- leakage-safe cluster-aware train/valid/test split ---


def q_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware corpus split: documents are assigned to
    train/valid/test by the md5 of their near-dup CLUSTER representative
    (connected components over the MinHash pair graph), so near-dups can
    NEVER straddle a split boundary — the leakage mode a row-wise random
    split invites and temporal_split_embargo doesn't address. 80/10/10
    by hash bucket; census per split pins every assignment through the
    doc-id sum."""
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import _corpus
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    corpus = _corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.5)
    nodes = corpus.select(F.col("doc_id").alias("id"))
    cc = D.connected_components(pairs, nodes)
    bucket = F.pmod(md5_long(F.col("canonical_id").cast("string")), F.lit(10))
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        cc.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("canonical_id").cast("long").alias("n_clusters"),
            F.sum("id").cast("long").alias("doc_id_sum"),
        )
        .orderBy("split")
    )


def _sql_cluster_aware_split() -> str:
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import SQL_DEDUP_CC
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    h = md5_long_sql("CAST(canonical_id AS VARCHAR)")
    return f"""
WITH cc AS ({SQL_DEDUP_CC})
SELECT CASE WHEN {h} % 10 < 8 THEN 'train'
            WHEN {h} % 10 < 9 THEN 'valid'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_clusters,
       CAST(sum(id) AS BIGINT) AS doc_id_sum
FROM cc GROUP BY 1 ORDER BY 1
"""


STAGED_QUERIES["cluster_aware_split"] = q_cluster_aware_split
STAGED_ORACLES["cluster_aware_split"] = _sql_cluster_aware_split()


# --- quantile normalization: view-event values onto the purchase scale ---


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize 'view' event values onto the 'purchase' value
    distribution — the score-calibration workhorse (after it, the view
    column's distribution IS the purchase distribution): exact rank
    arithmetic through the global_rank decomposition on BOTH sides,
    one uniform equi-join on the mapped reference index."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_normalize
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    views = ev.filter(F.col("event_type") == "view").select("event_id", "cents")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "cents", "event_id"
    )
    return (
        views.transform(
            quantile_normalize(
                ["cents", "event_id"], purch, ["cents", "event_id"],
                out_col="norm_cents",
            )
        )
        .select("event_id", "cents", "norm_cents")
        .orderBy("event_id")
    )


def _sql_quantile_normalize() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_normalize_sql

    ev = (
        "(SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents"
        " FROM events WHERE event_type = '{t}')"
    )
    return (
        quantile_normalize_sql(
            ev.format(t="view"),
            ["event_id", "cents"],
            ["cents", "event_id"],
            ev.format(t="purchase"),
            ["cents", "event_id"],
            out_col="norm_cents",
        )
        + " ORDER BY event_id"
    )


STAGED_QUERIES["quantile_normalize_views"] = q_quantile_normalize
STAGED_ORACLES["quantile_normalize_views"] = _sql_quantile_normalize()
