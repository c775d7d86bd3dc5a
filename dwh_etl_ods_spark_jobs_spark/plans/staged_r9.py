"""r9-STAGED battery queries: operators landed in round 8 with query +
DuckDB oracle fully wired, held OUT of ``__spark_entry__`` because the r8
50-entry gate window is fully claimed by the 26 just-registered staged
entries + rotation (see the window plan in ``__spark_entry__.py``).

r9 registration: ``q.update(staged_r9.STAGED_QUERIES)`` and slot into
``_HEAD``. Until then ``tests/test_staged_r9_surfaces.py`` runs the exact
driver-gate comparison (sorted-column value equality + scalar-output
rule) on every entry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.curation import temporal_split_census
from dwh_etl_ods_spark_jobs_spark.curation import temporal_split_census_sql
from dwh_etl_ods_spark_jobs_spark.operators.quality import (
    json_field_audit,
    json_field_audit_sql,
)
from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_bin
from dwh_etl_ods_spark_jobs_spark.operators.stats import (
    key_skew_profile,
    key_skew_profile_sql,
    target_encoding,
    target_encoding_sql,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}

# Battery consolidation slots (r11, VERDICT r10 #2) — entries retired from
# the driver battery, still DuckDB-verified by tests/test_retired_surfaces.py.
RETIRED_QUERIES: dict = {}
RETIRED_ORACLES: dict = {}


# --- equal-frequency quantile binning (feature prep) ---

QB_BINS = 8


def q_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equal-frequency binning of lineitem price cents into 8 bins
    via the distributed two-phase global rank (operators/rank.py — never a
    single-partition ORDER BY window); census per bin."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    binned = li.transform(
        quantile_bin(["cents", "l_orderkey", "l_linenumber"], QB_BINS)
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("bin")
    )


SQL_QUANTILE_BINNING = f"""
WITH li AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber) - 1
           AS rk,
         count(*) OVER () AS n
  FROM li
)
SELECT CAST((rk * {QB_BINS}) // n AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM r GROUP BY 1 ORDER BY bin
"""
STAGED_QUERIES["quantile_binning_census"] = q_quantile_binning
STAGED_ORACLES["quantile_binning_census"] = SQL_QUANTILE_BINNING


# --- m-estimate target encoding (feature prep) ---

TE_M = 20


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of order priority against the
    'big order' label (totalprice > 150k) in exact micro-units."""
    orders = _t(spark, sf_dir, "orders")
    return target_encoding(
        orders,
        "o_orderpriority",
        (F.col("o_totalprice") > 150000.0).cast("int"),
        TE_M,
    ).orderBy("category")


SQL_TARGET_ENCODING = (
    target_encoding_sql(
        "orders", "o_orderpriority", "o_totalprice > 150000.0", TE_M
    )
    + " ORDER BY category"
)
STAGED_QUERIES["target_encoding_priority"] = q_target_encoding
STAGED_ORACLES["target_encoding_priority"] = SQL_TARGET_ENCODING


# --- key-skew diagnostic (pre-shuffle salting decision) ---

def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew profile of events keyed by (user_id, event_type) —
    the exact diagnostic run before committing a 100 TB shuffle to that
    key (skew_x_micro >= ~10e6 would trigger operators/skew salting)."""
    ev = _t(spark, sf_dir, "events")
    return key_skew_profile(ev, ["user_id", "event_type"])


SQL_KEY_SKEW = key_skew_profile_sql("events", ["user_id", "event_type"])
STAGED_QUERIES["key_skew_diagnostics"] = q_key_skew
STAGED_ORACLES["key_skew_diagnostics"] = SQL_KEY_SKEW


# --- embedded-JSON parse audit with deterministic corruption ---

def q_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse audit of events.props with every 7th row's JSON truncated
    (the crawl-shard reality: a few malformed cells must be counted and
    quarantined, never fail the job or silently vanish); salvages the
    integer field sum from the valid rows."""
    ev = _t(spark, sf_dir, "events").select(
        F.when(
            F.col("event_id") % 7 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        )
        .otherwise(F.col("props"))
        .alias("props")
    )
    return json_field_audit(
        ev, "props", fields=[("k", "$.k")], numeric_sums=[("k", "$.k")]
    )


SQL_JSON_MALFORMED = json_field_audit_sql(
    "(SELECT CASE WHEN event_id % 7 = 0"
    " THEN substring(props, 1, length(props) - 1)"
    " ELSE props END AS props FROM events)",
    "props",
    fields=[("k", "$.k")],
    numeric_sums=[("k", "$.k")],
)
STAGED_QUERIES["json_malformed_census"] = q_json_malformed
STAGED_ORACLES["json_malformed_census"] = SQL_JSON_MALFORMED


# --- temporal split with embargo (time-series leakage hygiene) ---

TS_TRAIN_END, TS_TEST_START = "1996-01-01", "1996-04-01"


def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged temporal split of orders (3-month embargo) with the
    entity-overlap census — the leakage an embargo cannot remove, made
    explicit per split."""
    orders = _t(spark, sf_dir, "orders")
    return temporal_split_census(
        orders, "o_orderdate", "o_custkey", TS_TRAIN_END, TS_TEST_START
    ).orderBy("split")


SQL_TEMPORAL_SPLIT = (
    temporal_split_census_sql(
        "orders", "o_orderdate", "o_custkey", TS_TRAIN_END, TS_TEST_START
    )
    + " ORDER BY split"
)
STAGED_QUERIES["temporal_split_embargo"] = q_temporal_split
STAGED_ORACLES["temporal_split_embargo"] = SQL_TEMPORAL_SPLIT


# --- multi-touch attribution over the events stream ---

AT_LOOKBACK = 7
AT_TOUCHES = ["view", "click", "signup"]


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last/linear attribution of purchases to view/click/signup
    touches in a strict 7-day lookback, exact-integer linear credits."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        attribution_credits,
    )
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir)
    return attribution_credits(
        ev, "user_id", "event_type", "ts", "event_id",
        conversion_type="purchase",
        touch_types=AT_TOUCHES,
        lookback_days=AT_LOOKBACK,
    ).orderBy("channel")


def _sql_attribution() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        attribution_credits_sql,
    )

    return (
        attribution_credits_sql(
            "events", "user_id", "event_type", "ts", "event_id",
            conversion_type="purchase",
            touch_types=AT_TOUCHES,
            lookback_days=AT_LOOKBACK,
        )
        + " ORDER BY channel"
    )


SQL_ATTRIBUTION = _sql_attribution()
STAGED_QUERIES["attribution_touchpoints"] = q_attribution
STAGED_ORACLES["attribution_touchpoints"] = SQL_ATTRIBUTION


# --- RFM quintile features (rank-op composition) ---

def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM quintiles over orders — three exact equal-
    frequency cuts via the distributed global rank, anchor date
    data-derived."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import rfm_quintiles

    orders = _t(spark, sf_dir, "orders")
    return rfm_quintiles(
        orders,
        "o_custkey",
        "o_orderdate",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"),
    ).orderBy("entity")


def _sql_rfm() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import rfm_quintiles_sql

    return (
        rfm_quintiles_sql(
            "orders",
            "o_custkey",
            "CAST(o_orderdate AS DATE)",
            "CAST(round(o_totalprice * 100, 0) AS BIGINT)",
        )
        + " ORDER BY entity"
    )


SQL_RFM = _sql_rfm()
STAGED_QUERIES["rfm_quintile_features"] = q_rfm
STAGED_ORACLES["rfm_quintile_features"] = SQL_RFM


# --- CUSUM change-point flags over monthly revenue ---

CUSUM_THR_MICRO = 2000


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM over monthly order revenue, exact-integer scaled
    deviations; months where the cumulative drift exceeds the envelope
    threshold are flagged."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import cusum_flags

    orders = _t(spark, sf_dir, "orders").select(
        F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    return cusum_flags(orders, "month", "cents", CUSUM_THR_MICRO).orderBy("day")


def _sql_cusum() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import cusum_flags_sql

    return (
        cusum_flags_sql(
            "orders",
            "CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)",
            "CAST(round(o_totalprice * 100, 0) AS BIGINT)",
            CUSUM_THR_MICRO,
        )
        + " ORDER BY day"
    )


SQL_CUSUM = _sql_cusum()
STAGED_QUERIES["cusum_changepoint_flags"] = q_cusum
STAGED_ORACLES["cusum_changepoint_flags"] = SQL_CUSUM


# --- golden-record survivorship over synthetic entity clusters ---

GR_MOD = 97


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Master-data survivorship: customers hash-clustered (%97 synthetic
    entity resolution stand-in), per cluster the mode of market segment
    and nation key — the canonical-attribute write after CC."""
    from dwh_etl_ods_spark_jobs_spark.dedup import golden_record

    cust = _t(spark, sf_dir, "customer").select(
        F.pmod(F.col("c_custkey"), F.lit(GR_MOD)).alias("cluster_id"),
        "c_mktsegment",
        "c_nationkey",
    )
    return golden_record(
        cust, "cluster_id", ["c_mktsegment", "c_nationkey"]
    ).orderBy("cluster_id")


def _sql_golden() -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import golden_record_sql

    return (
        golden_record_sql(
            "customer",
            f"c_custkey % {GR_MOD}",
            {"c_mktsegment": "c_mktsegment", "c_nationkey": "c_nationkey"},
            cluster_name="cluster_id",
        )
        + " ORDER BY cluster_id"
    )


SQL_GOLDEN_RECORD = _sql_golden()
STAGED_QUERIES["golden_record_mode"] = q_golden_record
STAGED_ORACLES["golden_record_mode"] = SQL_GOLDEN_RECORD


# --- token co-occurrence PMI (collocation mining) ---

PMI_MIN_DF, PMI_MAX_DF, PMI_TOPK = 3, 5000, 50


def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations in documents by PMI (doc-frequency floored and
    hot-token capped); deterministic (pmi desc, pair asc) rank."""
    from dwh_etl_ods_spark_jobs_spark.curation import token_pmi

    docs = _t(spark, sf_dir, "documents")
    return (
        token_pmi(docs, "text", "doc_id", min_df=PMI_MIN_DF, max_df=PMI_MAX_DF)
        .orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOPK)
    )


def _sql_pmi() -> str:
    from dwh_etl_ods_spark_jobs_spark.curation import token_pmi_sql

    return (
        token_pmi_sql(
            "documents", "text", "doc_id",
            min_df=PMI_MIN_DF, max_df=PMI_MAX_DF,
        )
        + f" ORDER BY pmi_micro DESC, w1 ASC, w2 ASC LIMIT {PMI_TOPK}"
    )


SQL_TOKEN_PMI = _sql_pmi()
STAGED_QUERIES["token_pmi_topk"] = q_token_pmi
STAGED_ORACLES["token_pmi_topk"] = SQL_TOKEN_PMI


# --- file provenance census over a range-sorted layout ---

def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage audit composed with the layout op: lineitem rewritten
    range-sorted on l_orderkey into 6 files, then censused per source
    file with the key range — the oracle reads the SAME written files
    (DuckDB filename=true), proving both the provenance expression and
    the writer's per-file key disjointness end-to-end.

    Ordering contract: the write executes EAGERLY inside this function
    (mode=overwrite), so by the time any comparison harness evaluates the
    oracle the files exist and are current — valid as long as the harness
    obtains the Spark DataFrame (calling this) before running the oracle
    SQL, which is how both tools/check_oracle.py and the staged-surface
    pytest behave."""
    import tempfile

    from dwh_etl_ods_spark_jobs_spark.sources.tables import (
        provenance_census,
        write_range_sorted,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    path = os.path.join(tempfile.gettempdir(), "spark_graft_provenance")
    write_range_sorted(li, path, ["l_orderkey"], n_files=6)
    back = spark.read.parquet(path)
    return provenance_census(back, "l_orderkey").orderBy("file_name")


def _sql_provenance() -> str:
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "spark_graft_provenance")
    return f"""
SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_orderkey) AS BIGINT) AS min_l_orderkey,
       CAST(max(l_orderkey) AS BIGINT) AS max_l_orderkey
FROM read_parquet('{path}/*.parquet', filename = true)
GROUP BY 1 ORDER BY file_name
"""


SQL_FILE_PROVENANCE = _sql_provenance()
STAGED_QUERIES["file_provenance_ranges"] = q_file_provenance
STAGED_ORACLES["file_provenance_ranges"] = SQL_FILE_PROVENANCE


# --- deterministic negative edge sampling (graph contrastive training) ---

NEG_K, NEG_SEED = 5, "r8seed"


def q_negative_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction negatives over the supplier->part supply graph:
    5 seed-keyed draws per supplier from the part domain, true edges and
    self-loops removed — bit-identical on re-run, never rand()."""
    from dwh_etl_ods_spark_jobs_spark.graph import negative_edge_samples

    edges = (
        _t(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
    )
    return negative_edge_samples(
        edges, "l_suppkey", "l_partkey", NEG_K, NEG_SEED
    ).orderBy("l_suppkey", "draw")


def _sql_negative_edges() -> str:
    from dwh_etl_ods_spark_jobs_spark.graph import negative_edge_samples_sql

    return (
        negative_edge_samples_sql(
            "SELECT DISTINCT l_suppkey, l_partkey FROM lineitem",
            "l_suppkey",
            "l_partkey",
            NEG_K,
            NEG_SEED,
        )
        + " ORDER BY l_suppkey, draw"
    )


SQL_NEGATIVE_EDGES = _sql_negative_edges()
STAGED_QUERIES["negative_edge_samples"] = q_negative_edges
STAGED_ORACLES["negative_edge_samples"] = SQL_NEGATIVE_EDGES


# --- Wasserstein-1 drift (magnitude-aware, integer-exact) ---

def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Old-vs-new load drift as earth-mover distance over the shared HDR
    bucketing — the same %3 price-inflation scenario as the TVD monitor,
    but W1 also sees HOW FAR the mass moved."""
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_wasserstein_drift

    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    orders = _t(spark, sf_dir, "orders")
    old = orders.select(cents.alias("cents"))
    new = orders.select(
        F.when(
            F.col("o_orderkey") % 3 == 0, (cents * 26) - ((cents * 26) % 10)
        ).otherwise(cents * 10).alias("scaled")
    ).select((F.col("scaled") / 10).cast("long").alias("cents"))
    return hdr_wasserstein_drift(old, new, "cents")


SQL_WASSERSTEIN = None  # built below


def _sql_wasserstein() -> str:
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_wasserstein_drift_sql

    base = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
    return hdr_wasserstein_drift_sql(
        f"SELECT {base} AS cents FROM orders",
        f"SELECT CAST((CASE WHEN o_orderkey % 3 = 0"
        f" THEN ({base} * 26) - (({base} * 26) % 10)"
        f" ELSE {base} * 10 END) / 10 AS BIGINT) AS cents FROM orders",
        "cents",
    )


SQL_WASSERSTEIN = _sql_wasserstein()
# r11 consolidation: W1 (CDF area) rides the same bucketed cumulative-
# distribution fold as ks_drift_stat (CDF sup) — one numeric-drift probe
# stays in the battery, the other keeps its pytest oracle gate.
RETIRED_QUERIES["wasserstein_drift"] = q_wasserstein
RETIRED_ORACLES["wasserstein_drift"] = SQL_WASSERSTEIN


# --- Benford first-digit audit over order amounts ---

def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricated-data tripwire: first-digit census of order totals (in
    cents, pre-rounded identically on both engines) vs Benford's constant
    integer expectations."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        benford_first_digit_audit,
    )

    orders = _t(spark, sf_dir, "orders").select(
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents")
    )
    return benford_first_digit_audit(orders, "cents").orderBy("digit")


def _sql_benford() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        benford_first_digit_audit_sql,
    )

    return (
        benford_first_digit_audit_sql(
            "(SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents"
            " FROM orders)",
            "cents",
        )
        + " ORDER BY digit"
    )


SQL_BENFORD = _sql_benford()
STAGED_QUERIES["benford_digit_audit"] = q_benford
STAGED_ORACLES["benford_digit_audit"] = SQL_BENFORD


# --- CDC change-feed apply (Debezium-envelope compaction + merge) ---

def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yesterday's orders snapshot + a synthetic multi-generation change
    feed (inserts for the %11 keys the snapshot lacks, TWO update
    generations for %5 keys — the later must win — and deletes for %13
    keys) applied in one compact+merge pass."""
    from dwh_etl_ods_spark_jobs_spark.operators.merge import apply_change_feed

    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderstatus").alias("status"), cents.alias("cents")
    )
    snapshot = base.filter(F.col("o_orderkey") % 11 != 0)
    inserts = base.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey", "status", "cents",
        F.lit("c").alias("op"), F.lit(1).alias("seq"),
    )
    upd1 = base.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "status", (F.col("cents") + 1).alias("cents"),
        F.lit("u").alias("op"), F.lit(2).alias("seq"),
    )
    upd2 = base.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "status", (F.col("cents") + 2).alias("cents"),
        F.lit("u").alias("op"), F.lit(3).alias("seq"),
    )
    dels = base.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", "status", "cents",
        F.lit("d").alias("op"), F.lit(4).alias("seq"),
    )
    feed = inserts.unionByName(upd1).unionByName(upd2).unionByName(dels)
    return apply_change_feed(
        snapshot, feed, ["o_orderkey"], ["seq"]
    ).orderBy("o_orderkey")


SQL_CDC_APPLY = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
snapshot AS (SELECT * FROM base WHERE o_orderkey % 11 != 0),
feed AS (
  SELECT o_orderkey, status, cents, 'c' AS op, 1 AS seq
  FROM base WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT o_orderkey, status, cents + 1, 'u', 2 FROM base WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, status, cents + 2, 'u', 3 FROM base WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, status, cents, 'd', 4 FROM base WHERE o_orderkey % 13 = 0
),
latest AS (
  SELECT o_orderkey, status, cents, op
  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC) AS rn FROM feed)
  WHERE rn = 1
)
SELECT coalesce(s.o_orderkey, l.o_orderkey) AS o_orderkey,
       CASE WHEN l.o_orderkey IS NOT NULL THEN l.status ELSE s.status END
         AS status,
       CASE WHEN l.o_orderkey IS NOT NULL THEN l.cents ELSE s.cents END
         AS cents
FROM snapshot s FULL OUTER JOIN latest l ON s.o_orderkey = l.o_orderkey
WHERE NOT (l.o_orderkey IS NOT NULL AND l.op = 'd')
ORDER BY o_orderkey
"""
STAGED_QUERIES["cdc_feed_apply"] = q_cdc_apply
STAGED_ORACLES["cdc_feed_apply"] = SQL_CDC_APPLY


# --- exact weighted quantiles (quantity-weighted price points) ---

WQ_QUANTILES = [(1, 4), (1, 2), (9, 10)]


def q_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles/p90 over lineitem via the
    weighted two-phase rank — "the price point below which half the UNITS
    (not lines) ship", exact integers, no single-partition sort."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import weighted_quantile

    li = _t(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias("cents"),
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(round(l_quantity, 0) AS BIGINT)").alias("qty"),
    )
    return li.transform(
        weighted_quantile(
            ["cents", "l_orderkey", "l_linenumber"], "qty", WQ_QUANTILES
        )
    ).orderBy("q_num", "q_den")


def _sql_weighted_quantile() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import weighted_quantile_sql

    return (
        weighted_quantile_sql(
            "(SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,"
            " l_orderkey, l_linenumber,"
            " CAST(round(l_quantity, 0) AS BIGINT) AS qty FROM lineitem)",
            ["cents", "l_orderkey", "l_linenumber"],
            "qty",
            WQ_QUANTILES,
        )
        + " ORDER BY q_num, q_den"
    )


SQL_WEIGHTED_QUANTILE = _sql_weighted_quantile()
# r11 consolidation: ungrouped weighted quantiles ⊂ grouped_weighted_quantiles
# (same rank decomposition, group-key parameterization).
RETIRED_QUERIES["weighted_price_quantiles"] = q_weighted_quantile
RETIRED_ORACLES["weighted_price_quantiles"] = SQL_WEIGHTED_QUANTILE


# --- categorical entropy (class-balance monitor) ---

def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation entropy of customer market segments — the class-balance
    signal a training-mix monitor tracks per stratum (micro-nats, exact
    per-term rounding)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import categorical_entropy

    cust = _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment")
    return categorical_entropy(
        cust, ["c_nationkey"], "c_mktsegment"
    ).orderBy("c_nationkey")


def _sql_entropy() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        categorical_entropy_sql,
    )

    return (
        categorical_entropy_sql("customer", ["c_nationkey"], "c_mktsegment")
        + " ORDER BY c_nationkey"
    )


SQL_ENTROPY = _sql_entropy()
STAGED_QUERIES["mktsegment_entropy"] = q_entropy
STAGED_ORACLES["mktsegment_entropy"] = SQL_ENTROPY


# --- largest-remainder mix allocation ---

MIX_BUDGET = 1_000_003  # prime: every source carries a nontrivial remainder


def q_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget apportionment across corpus sources by character
    mass: exact Hare-Niemeyer largest-remainder, allocations sum to the
    budget to the unit."""
    from dwh_etl_ods_spark_jobs_spark.curation import (
        largest_remainder_allocation,
    )

    docs = _t(spark, sf_dir, "documents")
    return largest_remainder_allocation(
        docs, "source", "n_chars", MIX_BUDGET
    ).orderBy("key")


def _sql_mix() -> str:
    from dwh_etl_ods_spark_jobs_spark.curation import (
        largest_remainder_allocation_sql,
    )

    return (
        largest_remainder_allocation_sql(
            "documents", "source", "n_chars", MIX_BUDGET
        )
        + " ORDER BY key"
    )


SQL_MIX_ALLOCATION = _sql_mix()
STAGED_QUERIES["mix_allocation_exact"] = q_mix_allocation
STAGED_ORACLES["mix_allocation_exact"] = SQL_MIX_ALLOCATION


# --- hybrid retrieval: BM25 sparse candidates -> exact dense rerank ---

HY_TERMS = ["spark", "vector", "stream"]
# candidate depth defaults to plans/curation.BM25_TOPK but is threaded as
# a PARAMETER through both renderers (VERDICT r8 #6 — no hidden
# cross-module LIMIT coupling); final rerank keeps 5
HY_FINAL_K, HY_QUERY_ID, HY_DIM = 5, 0, 64


def q_hybrid_retrieval(
    spark: SparkSession, sf_dir: str, k_candidates: int | None = None
) -> DataFrame:
    """The standard two-tier RAG retrieval: BM25 takes the top-k sparse
    candidates (cheap, index-shaped), then the exact cosine against a
    query embedding reranks just those candidates (the expensive metric touches
    only candidates, never the corpus) — top-5 out. Composes bm25_topk,
    the embeddings table, and the fixed-fold cosine; query vector
    attaches by constant-key broadcast."""
    from dwh_etl_ods_spark_jobs_spark import curation as C
    from dwh_etl_ods_spark_jobs_spark.dedup import cosine
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    from dwh_etl_ods_spark_jobs_spark.plans.curation import BM25_TOPK

    k_cand = BM25_TOPK if k_candidates is None else k_candidates
    cands = docs.transform(
        C.bm25_topk("doc_id", "text", HY_TERMS, k=k_cand)
    ).select("doc_id", "bm25_micro")
    qv = emb.filter(F.col("vec_id") == HY_QUERY_ID).select(
        F.col("embedding").alias("_qv"),
        F.pmod(F.hash(F.lit(1)), F.lit(1)).alias("_one"),
    )
    scored = (
        cands.filter(F.col("doc_id") != HY_QUERY_ID)
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
        .withColumn("_one", F.pmod(F.hash(F.lit(1)), F.lit(1)))
        .join(F.broadcast(qv), "_one")
        .withColumn("cos", F.round(cosine(F.col("embedding"), F.col("_qv")), 6))
    )
    w = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())  # 25 rows
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HY_FINAL_K)
        .select("rank", "doc_id", "bm25_micro", "cos")
        .orderBy("rank")
    )


def _sql_hybrid(k_candidates: int | None = None) -> str:
    from dwh_etl_ods_spark_jobs_spark.dedup import cosine_sql
    from dwh_etl_ods_spark_jobs_spark.plans.curation import BM25_TOPK, _sql_bm25

    k_cand = BM25_TOPK if k_candidates is None else k_candidates
    bm25 = _sql_bm25(k=k_cand).strip()
    cos = cosine_sql("e.embedding", "q.embedding", HY_DIM)
    return f"""
WITH cands AS (
  SELECT doc_id, bm25_micro FROM ({bm25})
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {HY_QUERY_ID}),
scored AS (
  SELECT c.doc_id, c.bm25_micro, round({cos}, 6) AS cos
  FROM cands c
  JOIN embeddings e ON e.vec_id = c.doc_id, q
  WHERE c.doc_id != {HY_QUERY_ID}
)
SELECT CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS INT) AS rank,
       doc_id, bm25_micro, cos
FROM scored
QUALIFY rank <= {HY_FINAL_K}
ORDER BY rank
"""


SQL_HYBRID = None
def _late_bind_hybrid():
    global SQL_HYBRID
    SQL_HYBRID = _sql_hybrid()
    STAGED_QUERIES["hybrid_retrieval_rerank"] = q_hybrid_retrieval
    STAGED_ORACLES["hybrid_retrieval_rerank"] = SQL_HYBRID
_late_bind_hybrid()
