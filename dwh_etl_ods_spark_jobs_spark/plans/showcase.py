"""Driver-gated showcase queries: one per core operator (SURVEY.md §2).

Each entry pairs a PySpark implementation (built from the operator library)
with an ANSI-SQL oracle DuckDB runs over the same parquet tables. Column
names are aliased identically on both sides; double-typed aggregates go
through exact DECIMAL arithmetic and a final ROUND so both engines produce
bit-identical values regardless of accumulation order.

The driver's tables are TPC-H-ish (region nation customer supplier part
orders lineitem events documents embeddings); reference-specific operators
are exercised on them by deterministically synthesizing the dirty-data
shapes the reference cleans (NULL keys, duplicate generations, mixed-format
date strings) from stable key arithmetic — identical logic in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.plans.art_outcomes import (
    SQL_ART_OUTCOMES,
    SQL_ART_OUTCOMES_MONTHLY,
)
from dwh_etl_ods_spark_jobs_spark.operators import (
    anti_join_new,
    apply_rules,
    date_clamp,
    dedupe_latest,
    full_outer_coalesce,
    hash_pii,
    lookup_fold,
    month_spine,
    range_sentinel,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing ``ts`` to session-TZ TIMESTAMP.

    The driver's parquet footer has varied across environments:
    TIMESTAMP(NANOS) (readable only as long via the legacy nanosAsLong
    conf) vs TIMESTAMP(MICROS, isAdjustedToUTC=false) (read back as
    TIMESTAMP_NTZ). Branch on the dtype that actually arrives so every
    downstream operator sees a plain TIMESTAMP column; the session TZ is
    UTC so the NTZ cast is value-preserving vs the DuckDB oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":  # nanos read as long: rebuild (values are us-aligned)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _c100(col) -> "F.Column":
    """Double with exactly 2 decimal digits -> exact integer (x100).

    TPC-H money/discount/tax columns carry 2-decimal values stored as
    double; ``round(x*100)`` can never hit a .5 tie (the true value is an
    integer), so Spark and DuckDB round identically and all downstream
    arithmetic is exact BIGINT — bit-identical across engines regardless of
    accumulation order. (Decimal-cast sums are NOT portable: double->decimal
    cast rounding differs between engines on near-tie values.)"""
    return F.round(col * 100, 0).cast("long")


# --- 1. null-safe incremental anti-join (reference LoadCTPatients.java:182) ---

def q_incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Synthesize NULL keys (~5%) to exercise <=> semantics, then simulate a
    # target that already holds 70% of the key space.
    src = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 20 == 0, F.lit(None)).otherwise(F.col("user_id")),
    )
    tgt = src.filter(F.col("event_id") % 10 < 7).select("user_id", "event_type", "event_id")
    delta = src.transform(anti_join_new(tgt, ["user_id", "event_type", "event_id"]))
    return delta.select("event_id", "user_id", "event_type", "value")


SQL_INCREMENTAL_ANTIJOIN = """
WITH src AS (
  SELECT CASE WHEN event_id % 20 = 0 THEN NULL ELSE user_id END AS user_id,
         event_type, event_id, value
  FROM events
), tgt AS (
  SELECT user_id, event_type, event_id FROM src WHERE event_id % 10 < 7
)
SELECT s.event_id, s.user_id, s.event_type, s.value
FROM src s
WHERE NOT EXISTS (
  SELECT 1 FROM tgt t
  WHERE s.user_id IS NOT DISTINCT FROM t.user_id
    AND s.event_type IS NOT DISTINCT FROM t.event_type
    AND s.event_id IS NOT DISTINCT FROM t.event_id
)
"""


# --- 2. greatest-per-key dedup, window form (LoadSourceCTPatients.sql:10-17) ---

def q_dedupe_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    latest = ev.transform(
        dedupe_latest(["user_id", "event_type"], [F.col("ts").desc(), F.col("event_id").desc()])
    )
    return latest.select("user_id", "event_type", "event_id", "ts", "value")


SQL_DEDUPE_LATEST = """
SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --- 3. greatest-per-key dedup, GROUP BY MAX form (the reference's literal shape) ---

def q_groupby_max_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("max_event_id"),
        F.max(F.to_date("ts")).alias("last_seen"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_GROUPBY_MAX_DEDUP = """
SELECT user_id, max(event_id) AS max_event_id,
       max(CAST(ts AS DATE)) AS last_seen, count(*) AS n_rows
FROM events GROUP BY user_id
"""


# --- 4. broadcast lookup fold (LoadCTPatients.java:144-157) ---

def q_lookup_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumn(
        "nation_label", F.col("c_nationkey").cast("string")
    )
    lkp = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 20)  # leave 20..24 unmatched: fold keeps original
        .select(
            F.col("n_nationkey").cast("string").alias("source_name"),
            F.col("n_name").alias("target_name"),
        )
    )
    out = cust.transform(lookup_fold("nation_label", lkp))
    return out.select("c_custkey", "nation_label")


SQL_LOOKUP_FOLD = """
WITH lkp AS (
  SELECT CAST(n_nationkey AS VARCHAR) AS source_name, n_name AS target_name
  FROM nation WHERE n_nationkey < 20
)
SELECT c_custkey,
       COALESCE(l.target_name, CAST(c_nationkey AS VARCHAR)) AS nation_label
FROM customer c LEFT JOIN lkp l ON CAST(c_nationkey AS VARCHAR) = l.source_name
"""


# --- 5. cleaning rules: date clamp + range sentinel (LoadARTPatients.java:94-137) ---

def q_clean_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date")
    )
    cleaned = orders.transform(
        apply_rules(
            [
                date_clamp("o_orderdate", lo="1995-06-01", hi="1997-06-30",
                           sentinel="1900-01-01"),
                range_sentinel("o_totalprice", 1000.0, 200000.0, 999.0,
                               cast_to="double"),
            ]
        )
    )
    return cleaned.select("o_orderkey", "o_orderdate", "o_totalprice")


SQL_CLEAN_RULES = """
SELECT o_orderkey,
       CASE WHEN CAST(o_orderdate AS DATE) < DATE '1995-06-01'
              OR CAST(o_orderdate AS DATE) > DATE '1997-06-30'
            THEN DATE '1900-01-01' ELSE CAST(o_orderdate AS DATE) END AS o_orderdate,
       CASE WHEN o_totalprice < 1000.0 OR o_totalprice > 200000.0
            THEN 999.0 ELSE o_totalprice END AS o_totalprice
FROM orders
"""


# --- 6. empty-string -> NULL + value canonicalization (LoadHtsEligibility.java:83-97,
#        LoadHtsClientTests.java:81-112) ---

def q_value_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # Synthesize dirty category values deterministically, then canonicalize.
    dirty = orders.withColumn(
        "priority_raw",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(""))
        .when(F.col("o_orderkey") % 7 == 0, F.upper(F.col("o_orderpriority")))
        .otherwise(F.col("o_orderpriority")),
    )
    out = dirty.withColumn(
        "priority_clean",
        F.when(F.col("priority_raw") == "", F.lit(None))
        .when(F.upper(F.col("priority_raw")).isin("1-URGENT", "2-HIGH"), F.lit("HighPriority"))
        .when(F.upper(F.col("priority_raw")).isin("5-LOW", "4-NOT SPECIFIED"), F.lit("LowPriority"))
        .otherwise(F.col("priority_raw")),
    )
    return out.select("o_orderkey", "priority_clean")


SQL_VALUE_CANON = """
WITH dirty AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN ''
              WHEN o_orderkey % 7 = 0 THEN UPPER(o_orderpriority)
              ELSE o_orderpriority END AS priority_raw
  FROM orders
)
SELECT o_orderkey,
       CASE WHEN priority_raw = '' THEN NULL
            WHEN UPPER(priority_raw) IN ('1-URGENT','2-HIGH') THEN 'HighPriority'
            WHEN UPPER(priority_raw) IN ('5-LOW','4-NOT SPECIFIED') THEN 'LowPriority'
            ELSE priority_raw END AS priority_clean
FROM dirty
"""


# --- 7. PII SHA2-256 uppercase-hex hashing (DatabaseUtils.java:54-69) ---

def q_pii_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumn(
        "custkey_str", F.col("c_custkey").cast("string")
    )
    hashed = cust.transform(hash_pii({"c_name": "NameHash", "custkey_str": "KeyHash"}))
    return hashed.select("c_custkey", "NameHash", "KeyHash")


SQL_PII_HASH = """
SELECT c_custkey,
       UPPER(sha256(c_name)) AS NameHash,
       UPPER(sha256(CAST(c_custkey AS VARCHAR))) AS KeyHash
FROM customer
"""


# --- 8. star join + aggregation (pushed-down source query analog,
#        LoadSourceCTPatients.sql:7-9; TPC-H Q3 shape) ---

def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    joined = (
        li.filter(F.to_date("l_shipdate") > F.lit("1995-03-15").cast("date"))
        .join(orders.filter(F.to_date("o_orderdate") < F.lit("1995-03-15").cast("date")),
              li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    # revenue in 1e-4 dollars: cents(price) * (100 - bp(discount)) — exact ints
    return joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_c100(F.col("l_extendedprice")) * (100 - _c100(F.col("l_discount")))).alias(
            "revenue_e4"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_STAR_JOIN = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
"""


# --- 9. month-end spine (LoadHistoricalARTOutcomes.sql:4-19, recursive CTE + cursor
#        replaced by sequence+explode) ---

def q_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return month_spine(spark, "2017-01-01", "2023-03-31")


SQL_MONTH_SPINE = """
SELECT last_day(CAST(m AS DATE)) AS as_of_date
FROM (SELECT unnest(generate_series(DATE '2017-01-01', DATE '2023-03-01',
                                    INTERVAL 1 MONTH)) AS m)
"""


# --- 10. full outer join + coalesce (LoadHistoricalARTOutcomes.sql:158-182) ---

def q_full_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn("od", F.to_date("o_orderdate"))
    left = (
        orders.filter(F.year("od") == 1995)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("orders_1995"), F.max("od").alias("last_1995"))
    )
    right = (
        orders.filter(F.year("od") == 1996)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("orders_1996"), F.max("od").alias("last_1996"))
    )
    return full_outer_coalesce(left, right, ["o_custkey"])


SQL_FULL_OUTER_COALESCE = """
WITH l AS (
  SELECT o_custkey, count(*) AS orders_1995, max(CAST(o_orderdate AS DATE)) AS last_1995
  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995 GROUP BY o_custkey
), r AS (
  SELECT o_custkey, count(*) AS orders_1996, max(CAST(o_orderdate AS DATE)) AS last_1996
  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996 GROUP BY o_custkey
)
SELECT COALESCE(l.o_custkey, r.o_custkey) AS o_custkey,
       l.orders_1995, l.last_1995, r.orders_1996, r.last_1996
FROM l FULL OUTER JOIN r ON l.o_custkey = r.o_custkey
"""


# --- 11. union-dedup of two string-date repair paths (CleanTestKits.sql:1-50:
#         TRY_CAST path UNION CONVERT(...,103) path) ---

def q_union_date_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # Deterministically mangle dates into two string formats (ISO / dd/MM/yyyy).
    dirty = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "dd/MM/yyyy"))
        .alias("date_str"),
    )
    path_a = dirty.select(
        "o_orderkey", F.try_to_timestamp(F.col("date_str")).cast("date").alias("repaired")
    ).filter(F.col("repaired").isNotNull())
    path_b = dirty.select(
        "o_orderkey",
        F.try_to_timestamp(F.col("date_str"), F.lit("dd/MM/yyyy")).cast("date").alias("repaired"),
    ).filter(F.col("repaired").isNotNull())
    return path_a.union(path_b).distinct()


SQL_UNION_DATE_REPAIR = """
WITH dirty AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
              ELSE strftime(o_orderdate, '%d/%m/%Y') END AS date_str
  FROM orders
), a AS (
  SELECT o_orderkey, CAST(try_strptime(date_str, '%Y-%m-%d') AS DATE) AS repaired
  FROM dirty WHERE try_strptime(date_str, '%Y-%m-%d') IS NOT NULL
), b AS (
  SELECT o_orderkey, CAST(try_strptime(date_str, '%d/%m/%Y') AS DATE) AS repaired
  FROM dirty WHERE try_strptime(date_str, '%d/%m/%Y') IS NOT NULL
)
SELECT o_orderkey, repaired FROM a UNION SELECT o_orderkey, repaired FROM b
"""


# --- 12. pricing summary (distinct/agg coverage; TPC-H Q1 shape) ---

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"),
            F.sum(_c100(F.col("l_extendedprice"))).alias("sum_base_price_c"),
            F.sum(
                _c100(F.col("l_extendedprice")) * (100 - _c100(F.col("l_discount")))
            ).alias("sum_disc_price_e4"),
            F.sum(
                _c100(F.col("l_extendedprice"))
                * (100 - _c100(F.col("l_discount")))
                * (100 + _c100(F.col("l_tax")))
            ).alias("sum_charge_e6"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
      * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
  count(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- 13. historical ART outcomes — the reference's analytical T-SQL script
#         rebuilt set-based (plans/art_outcomes.py) ---

def q_art_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dwh_etl_ods_spark_jobs_spark.plans.art_outcomes import art_outcomes

    return art_outcomes(spark, sf_dir)


def q_art_outcomes_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dwh_etl_ods_spark_jobs_spark.plans.art_outcomes import art_outcomes_monthly

    return art_outcomes_monthly(spark, sf_dir)


QUERIES = {
    "incremental_antijoin_nullsafe": q_incremental_antijoin,
    "dedupe_latest_window": q_dedupe_latest,
    "groupby_max_dedup": q_groupby_max_dedup,
    "lookup_fold_broadcast": q_lookup_fold,
    "clean_date_clamp_range_sentinel": q_clean_rules,
    "clean_value_canonicalization": q_value_canon,
    "pii_hash_sha256": q_pii_hash,
    "star_join_agg": q_star_join,
    "month_spine": q_month_spine,
    "union_date_repair": q_union_date_repair,
    "pricing_summary": q_pricing_summary,
    "art_outcomes_asof": q_art_outcomes,
    "art_outcomes_monthly": q_art_outcomes_monthly,
}

ORACLES = {
    "incremental_antijoin_nullsafe": SQL_INCREMENTAL_ANTIJOIN,
    "dedupe_latest_window": SQL_DEDUPE_LATEST,
    "groupby_max_dedup": SQL_GROUPBY_MAX_DEDUP,
    "lookup_fold_broadcast": SQL_LOOKUP_FOLD,
    "clean_date_clamp_range_sentinel": SQL_CLEAN_RULES,
    "clean_value_canonicalization": SQL_VALUE_CANON,
    "pii_hash_sha256": SQL_PII_HASH,
    "star_join_agg": SQL_STAR_JOIN,
    "month_spine": SQL_MONTH_SPINE,
    "union_date_repair": SQL_UNION_DATE_REPAIR,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "art_outcomes_asof": SQL_ART_OUTCOMES,
    "art_outcomes_monthly": SQL_ART_OUTCOMES_MONTHLY,
}

# Battery consolidation (VERDICT r9 #1): full-outer-join + per-side
# coalesce is the merge core that cdc_feed_apply exercises end-to-end;
# retired from the driver battery, still DuckDB-verified by
# tests/test_retired_surfaces.py (candidate (e) in plans/staged_r10.py).
RETIRED_QUERIES = {
    "full_outer_coalesce": q_full_outer_coalesce,  # ⊂ cdc_feed_apply's merge stage
}
RETIRED_ORACLES = {
    "full_outer_coalesce": SQL_FULL_OUTER_COALESCE,
}
