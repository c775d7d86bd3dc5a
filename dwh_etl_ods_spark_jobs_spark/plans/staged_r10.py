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
        .join(F.broadcast(cust), "o_custkey")
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

STAGED_QUERIES["seasonal_weekday_outliers"] = q_seasonal_weekday_outliers
STAGED_ORACLES["seasonal_weekday_outliers"] = SQL_SEASONAL_WEEKDAY


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
