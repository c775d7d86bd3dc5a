"""r12-STAGED battery queries: operators landed in round 10 with query +
DuckDB oracle fully wired, held OUT of ``__spark_entry__`` until the r12
window rotation (the staged → parity-pinned → probed → registered
lifecycle of ``plans/staged.py`` (r8) / ``staged_r9.py`` / ``staged_r10.py``
/ ``staged_r11.py`` — see the committed window plans in
``__spark_entry__.py``).

r12 registration: ``q.update(staged_r12.STAGED_QUERIES)`` and slot into
``_HEAD``.  Until then ``tests/test_staged_r12_surfaces.py`` runs the
exact driver-gate comparison (sorted-column value equality +
scalar-output rule) on every entry at sf0.001 and sf0.01.

Wave theme: corpus-quality filters and the second evaluation tranche —
intra-document repetition (the Gopher rule), the PR-curve threshold
sweep and rerank-NDCG companions to r11's AUC/calibration, Cohen's
kappa, the one-pass correlation matrix, sketch-based join-size
estimation, FastSS edit-distance-1 linkage, Zipf exponent fitting, and
quantile-band coverage evaluation.

r12 one-in/one-out retirement CANDIDATES (the r11-session shortlist for
the registration round to confirm, VERDICT r10 #2 discipline — each
would move to its module's RETIRED_QUERIES with the pytest oracle gate):
  bm25_topk_retrieval      ⊂ ndcg_bm25_eval (the eval RUNS the BM25
                             retrieval as its run lists — the
                             ann_recall_eval pattern)
  corr_regression_stats    mostly ⊂ corr_matrix_onepass (pairwise corr;
                             slope/stderr also live in zipf_alpha's OLS
                             physiology) — confirm no unique surface
  text_repetition_gopher   vs intra_doc_repetition: overlapping
                             intra-doc duplicate-mass signals; keep the
                             one with the wider rule set, retire the
                             other
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}

# Battery consolidation slots (empty until an r12 retirement earns one).
RETIRED_QUERIES: dict = {}
RETIRED_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- intra-document repetition census ---------------------------------------

REP_FLAG_PPM = 2_000


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screen: per source, the mean duplicate
    trigram fraction and how many docs exceed the flag threshold
    (text.dup_ngram_ppm — one expression pass over the materialized
    token array, no explode)."""
    from dwh_etl_ods_spark_jobs_spark.text import dup_ngram_ppm

    docs = _t(spark, sf_dir, "documents").select(
        "source", dup_ngram_ppm(F.col("text")).alias("_rep")
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("CAST(sum(_rep) div count(*) AS BIGINT)").alias(
                "mean_rep_ppm"
            ),
            F.sum(F.when(F.col("_rep") >= REP_FLAG_PPM, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


def _sql_repetition() -> str:
    from dwh_etl_ods_spark_jobs_spark.text import dup_ngram_ppm_sql

    rep = dup_ngram_ppm_sql("text")
    return f"""
WITH scored AS (SELECT source, {rep} AS rep FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(rep) // count(*) AS BIGINT) AS mean_rep_ppm,
       CAST(sum(CASE WHEN rep >= {REP_FLAG_PPM} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged
FROM scored GROUP BY source ORDER BY source
"""


STAGED_QUERIES["intra_doc_repetition"] = q_repetition
STAGED_ORACLES["intra_doc_repetition"] = _sql_repetition()


# --- precision/recall threshold sweep ---------------------------------------

_CENTS_PRICE = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
_IS_RETURN = "CAST(l_returnflag = 'R' AS BIGINT)"


def q_pr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at every price-decile operating point — the
    threshold-picking companion to r11's AUC/calibration over the same
    score (operators/eval_metrics.pr_threshold_sweep; the sweep is a
    bounded 10-row cumulative fold after the range-decomposed bin)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pr_threshold_sweep,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.expr(_CENTS_PRICE).alias("score"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("long").alias("k2"),
        F.expr(_IS_RETURN).alias("label"),
    )
    return pr_threshold_sweep(li, ["score", "k1", "k2"], "label").orderBy(
        "bin"
    )


def _sql_pr_sweep() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pr_threshold_sweep_sql,
    )

    return (
        "SELECT * FROM ("
        + pr_threshold_sweep_sql(
            f"(SELECT {_CENTS_PRICE} AS score, l_orderkey AS k1,"
            " CAST(l_linenumber AS BIGINT) AS k2,"
            f" {_IS_RETURN} AS label FROM lineitem) t",
            ["score", "k1", "k2"],
            "label",
        )
        + ") ORDER BY bin"
    )


STAGED_QUERIES["pr_threshold_sweep"] = q_pr_sweep
STAGED_ORACLES["pr_threshold_sweep"] = _sql_pr_sweep()


# --- rerank NDCG of BM25 -----------------------------------------------------

NDCG_K = 10
NDCG_QUERIES: dict[str, list[str]] = {
    "q_infra": ["spark", "vector", "stream"],
    "q_ops": ["window", "merge", "batch"],
    "q_sales": ["customer", "filter", "hash"],
}


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rerank-NDCG@10 of the BM25 retriever per query, against a graded
    frequency relevance (``rel = least(3, Σtf div 3)``) computed
    INDEPENDENTLY of the score — so a retriever that ranks high-idf
    one-term hits above broadly-matching docs actually loses NDCG
    (operators/eval_metrics.ndcg_rerank over integer micro log-weights;
    windows are per-query over ≤k rows; the rel join broadcasts the
    ≤k-row run list back onto the corpus scan)."""
    from dwh_etl_ods_spark_jobs_spark.curation import bm25_topk
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        ndcg_rerank,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.curation import _docs

    docs = _docs(spark, sf_dir)
    # ONE tokenize pass shared by all three query arms AND the rel join
    # (r14: each arm re-tokenized the corpus ~4x — inside bm25's
    # postings/stats branches plus this rel join; the shared lazy
    # checkpoint replaces ~12 passes with one materialization)
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("_ts")
    ).localCheckpoint(eager=False)
    runs = None
    for qname, terms in sorted(NDCG_QUERIES.items()):
        tf_total = None
        for t in terms:
            tf = F.size(F.filter(F.col("_ts"), lambda x: x == F.lit(t)))
            tf_total = tf if tf_total is None else tf_total + tf
        r = (
            toks.transform(
                bm25_topk("doc_id", "text", terms, k=NDCG_K, tokens_col="_ts")
            )
            .join(toks, "doc_id")
            .select(
                F.lit(qname).alias("query"),
                "doc_id",
                "bm25_micro",
                F.least(F.lit(3), (tf_total.cast("long") / F.lit(3)).cast("long"))
                .cast("long")
                .alias("rel"),
            )
        )
        runs = r if runs is None else runs.unionByName(r)
    return ndcg_rerank(
        runs, "query", "doc_id", "bm25_micro", "rel", k=NDCG_K
    ).orderBy("query")


def _sql_ndcg() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        ndcg_rerank_sql,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.curation import _sql_bm25

    def rel_expr(terms: list[str]) -> str:
        tf = " + ".join(
            f"len(list_filter(string_split(d.text, ' '), x -> x = '{t}'))"
            for t in terms
        )
        return f"least(3, CAST(({tf}) AS BIGINT) // 3)"

    arms = "\nUNION ALL\n".join(
        f"SELECT '{qname}' AS query, r.doc_id, r.bm25_micro,"
        f" {rel_expr(terms)} AS rel"
        f" FROM ({_sql_bm25(k=NDCG_K, terms=terms)}) r"
        f" JOIN documents d ON d.doc_id = r.doc_id"
        for qname, terms in sorted(NDCG_QUERIES.items())
    )
    inner = ndcg_rerank_sql(
        f"({arms}) runs", "query", "doc_id", "bm25_micro", "rel",
        k=NDCG_K,
    )
    return f"SELECT * FROM ({inner}) ORDER BY query"


STAGED_QUERIES["ndcg_bm25_eval"] = q_ndcg
STAGED_ORACLES["ndcg_bm25_eval"] = _sql_ndcg()


# --- Cohen's kappa -----------------------------------------------------------

def q_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement between the order-status label and a
    deterministic second annotator that copies it on 3 of every 4 keys
    and answers 'O' on the rest (the standard simulated-noisy-rater
    harness — kappa lands well above chance but below 1, exercising
    both the agreement and the chance-correction arms).  The operator
    is the point: one confusion-matrix pass over the data, everything
    after on bounded frames (operators/eval_metrics.cohens_kappa)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        cohens_kappa,
    )

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("rater_a"),
        F.when(F.col("o_orderkey") % 4 < 3, F.col("o_orderstatus"))
        .otherwise("O")
        .alias("rater_b"),
    )
    return cohens_kappa(orders, "rater_a", "rater_b")


def _sql_kappa() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        cohens_kappa_sql,
    )

    return cohens_kappa_sql(
        "(SELECT o_orderstatus AS rater_a,"
        " CASE WHEN o_orderkey % 4 < 3 THEN o_orderstatus"
        " ELSE 'O' END AS rater_b FROM orders) t",
        "rater_a",
        "rater_b",
    )


STAGED_QUERIES["cohens_kappa_agreement"] = q_kappa
STAGED_ORACLES["cohens_kappa_agreement"] = _sql_kappa()


# --- one-pass correlation matrix --------------------------------------------

_CORR_COLS_SPARK = {
    "qty_c": "CAST(round(l_quantity * 100, 0) AS BIGINT)",
    "price_c": "CAST(round(l_extendedprice * 100, 0) AS BIGINT)",
    "disc_bp": "CAST(round(l_discount * 10000, 0) AS BIGINT)",
    "tax_bp": "CAST(round(l_tax * 10000, 0) AS BIGINT)",
}


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 6 pairwise Pearson correlations of the lineitem measures in
    ONE aggregation pass (operators/stats.corr_matrix — exact decimal
    moment sums; the pair fan-out is a literal projection on the single
    result row, so k columns never mean k passes)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import corr_matrix

    li = _t(spark, sf_dir, "lineitem").select(
        *[F.expr(e).alias(n) for n, e in _CORR_COLS_SPARK.items()]
    )
    return corr_matrix(li, list(_CORR_COLS_SPARK)).orderBy("col_a", "col_b")


def _sql_corr_matrix() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import corr_matrix_sql

    sel = ", ".join(f"{e} AS {n}" for n, e in _CORR_COLS_SPARK.items())
    return (
        "SELECT * FROM ("
        + corr_matrix_sql(
            f"(SELECT {sel} FROM lineitem) t", list(_CORR_COLS_SPARK)
        )
        + ") ORDER BY col_a, col_b"
    )


STAGED_QUERIES["corr_matrix_onepass"] = q_corr_matrix
STAGED_ORACLES["corr_matrix_onepass"] = _sql_corr_matrix()


# --- count-min join-size estimate -------------------------------------------


def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle join-cardinality estimation: the CM-sketch
    inner-product estimate of |clicks ⋈ purchases on user_id| next to
    the exact size and its error (sketches.countmin_join_size — the
    sketch⋈sketch stage touches ≤ DEPTH·WIDTH cells; the exact side is
    the per-key-counts equi-join, never a row join)."""
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events
    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_join_size

    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return countmin_join_size(clicks, purchases, "user_id")


def _sql_cms_join_size() -> str:
    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_join_size_sql

    def side(tp: str) -> str:
        return (
            "(SELECT user_id FROM events WHERE user_id IS NOT NULL"
            f" AND event_type = '{tp}') {tp}_side"
        )

    return countmin_join_size_sql(side("click"), side("purchase"), "user_id")


STAGED_QUERIES["cms_join_size_estimate"] = q_cms_join_size
STAGED_ORACLES["cms_join_size_estimate"] = _sql_cms_join_size()


# --- FastSS edit-distance-1 linkage -----------------------------------------


def q_edit1_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spelling-variant linkage census over part names via the FastSS
    deletion-neighborhood equi-join (dedup.edit1_linkage_census —
    distinct names + multiplicity arithmetic, len+1 posting keys,
    levenshtein verify; the ORACLE brute-forces the same census, so
    parity proves the candidate set complete)."""
    from dwh_etl_ods_spark_jobs_spark.dedup import edit1_linkage_census

    return edit1_linkage_census(_t(spark, sf_dir, "part"), "p_name")


def _sql_edit1_linkage() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import edit1_linkage_census_sql

    return edit1_linkage_census_sql("part", "p_name")


STAGED_QUERIES["edit1_name_linkage"] = q_edit1_linkage
STAGED_ORACLES["edit1_name_linkage"] = _sql_edit1_linkage()


# --- Zipf exponent per source -----------------------------------------------

ZIPF_HEAD_K = 64


def q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of each source's token-frequency head — the
    corpus-health diagnostic (natural text ⇒ α ≈ 1; template spam and
    synthetic filler bend it).  Vocab via one wordcount pass; rank
    within source via the grouped range decomposition, micro-quantized
    log points, exact OLS moments (operators/stats.zipf_alpha)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import zipf_alpha
    from dwh_etl_ods_spark_jobs_spark.text import tokens

    vocab = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select("source", "cnt", "term")
    )
    return zipf_alpha(vocab, ["source"], "cnt", head_k=ZIPF_HEAD_K).orderBy(
        "source"
    )


def _sql_zipf() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import zipf_alpha_sql
    from dwh_etl_ods_spark_jobs_spark.text import tokens_sql

    toks = tokens_sql("text")
    vocab = (
        f"(SELECT source, term, count(*) AS cnt FROM"
        f" (SELECT source, unnest({toks}) AS term FROM documents)"
        " GROUP BY 1, 2) v"
    )
    return (
        "SELECT * FROM ("
        + zipf_alpha_sql(vocab, ["source"], "term", "cnt", head_k=ZIPF_HEAD_K)
        + ") ORDER BY source"
    )


STAGED_QUERIES["zipf_alpha_by_source"] = q_zipf
STAGED_ORACLES["zipf_alpha_by_source"] = _sql_zipf()


# --- quantile-band coverage eval --------------------------------------------


def q_band_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does each event type's published q10–q90 value band actually
    cover ~80% of its traffic?  The conformal-style band-health eval
    (operators/eval_metrics.quantile_coverage_eval — exact grouped
    weighted quantiles fit the band, a broadcast join scores it)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        quantile_coverage_eval,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        F.col("event_id").cast("long").alias("eid"),
    )
    return quantile_coverage_eval(
        ev, ["event_type"], ["cents", "eid"]
    ).orderBy("event_type")


def _sql_band_coverage() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        quantile_coverage_eval_sql,
    )

    return (
        "SELECT * FROM ("
        + quantile_coverage_eval_sql(
            "(SELECT event_type,"
            " CAST(round(value * 100, 0) AS BIGINT) AS cents,"
            " CAST(event_id AS BIGINT) AS eid FROM events) t",
            ["event_type"],
            ["cents", "eid"],
        )
        + ") ORDER BY event_type"
    )


STAGED_QUERIES["quantile_band_coverage"] = q_band_coverage
STAGED_ORACLES["quantile_band_coverage"] = _sql_band_coverage()
