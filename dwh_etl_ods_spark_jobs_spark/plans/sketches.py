"""Sketch queries (HyperLogLog distinct, count-min heavy hitters) with
DuckDB oracles.

Sketches are usually excluded from exact-match testing because their
estimates depend on engine-private hash functions; this repo's sketches
(`sketches/`) are built on the portable 60-bit md5 hash and exact BIGINT
accumulators, so the SAME sketch computed by DuckDB hash-matches the
Spark result bit-for-bit — the estimate itself is the oracle-gated value,
not just the row count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import sketches as SK
from dwh_etl_ods_spark_jobs_spark.text import tokens, tokens_sql

CM_TOPK = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type
# ---------------------------------------------------------------------------

def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, estimated with one fixed-width
    register pass instead of shuffling every (type, user) pair — the
    sketch shuffle is O(types × 4096) regardless of user count."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_type", "user_id"
    )
    return ev.transform(SK.hll_distinct(["event_type"], "user_id"))


SQL_HLL_USERS = SK.hll_distinct_sql("events", ["event_type"], "user_id")


# ---------------------------------------------------------------------------
# Count-min heavy hitters over the token stream
# ---------------------------------------------------------------------------

def q_countmin_hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's exact top-K tokens annotated with their count-min
    estimate — (tok, exact_count, cm_estimate), estimate ≥ exact by
    construction. Exact side is TakeOrdered (per-partition top-K, no
    global sort); sketch side is the DEPTH×WIDTH grid, broadcast."""
    toks = _docs(spark, sf_dir).select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    # one token aggregation feeds BOTH the sketch (weighted build — the
    # DEPTH-way fan-out runs over distinct tokens, not the raw stream)
    # and the exact top-K; the two aggregate subtrees are identical so
    # the shuffle is reused
    tok_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    sketch = SK.countmin_counts(tok_counts, "tok", weight_col="exact_count")
    exact = tok_counts.orderBy(F.desc("exact_count"), F.asc("tok")).limit(CM_TOPK)
    est = SK.countmin_estimate(sketch, exact.select("tok"), "tok")
    return exact.join(est, "tok").select("tok", "exact_count", "cm_estimate")


SQL_COUNTMIN_HH = f"""
WITH tok AS (
  SELECT t.tok FROM documents, unnest({tokens_sql('text')}) AS t(tok)
),
sketch AS (
  SELECT r, {SK.countmin_col_sql('tok')} AS c, count(*) AS cnt
  FROM tok CROSS JOIN {SK.CM_ROWS_SQL}
  GROUP BY 1, 2
),
exact AS (
  SELECT tok, count(*) AS exact_count FROM tok GROUP BY 1
  ORDER BY exact_count DESC, tok LIMIT {CM_TOPK}
),
probe AS (
  SELECT e.tok, e.exact_count, r, {SK.countmin_col_sql('e.tok')} AS c
  FROM exact e CROSS JOIN {SK.CM_ROWS_SQL}
)
SELECT p.tok, p.exact_count, CAST(min(s.cnt) AS BIGINT) AS cm_estimate
FROM probe p JOIN sketch s USING (r, c)
GROUP BY p.tok, p.exact_count
"""


# ---------------------------------------------------------------------------
# One-pass table profile (events extract pre-flight)
# ---------------------------------------------------------------------------

PROFILE_COLS = ["event_id", "user_id", "event_type", "props"]


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.transform(SK.profile_columns(PROFILE_COLS))


SQL_PROFILE = SK.profile_columns_sql("events", PROFILE_COLS)


# ---------------------------------------------------------------------------
# Bloom-pruned join (semi-join pushdown via a 65536-bit membership filter)
# ---------------------------------------------------------------------------

VIP_BAL = 5000.0


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prune the orders fact to (possibly-)VIP customers through a Bloom
    filter built from the high-balance customer set, then aggregate.
    ``n_true_members`` exposes the false-positive rows the filter admits
    (≥ 0 by design; false negatives impossible). Both engines compute the
    IDENTICAL filter, so even the FP rows hash-match."""
    vip = (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .filter(F.col("c_acctbal") > VIP_BAL)
        .select("c_custkey")
    )
    bits = SK.bloom_build(vip, "c_custkey")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    pruned = SK.bloom_filter_keys(orders, bits, "o_custkey")
    return (
        pruned.join(
            vip.select(F.col("c_custkey").alias("o_custkey")).withColumn(
                "_true", F.lit(1)
            ),
            "o_custkey",
            "left",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.coalesce("_true", F.lit(0))).cast("long").alias("n_true_members"),
        )
    )


SQL_BLOOM_PRUNE = f"""
WITH vip AS (SELECT c_custkey FROM customer WHERE c_acctbal > {VIP_BAL!r}),
bits AS ({SK.bloom_bits_sql('vip', 'c_custkey')}),
probe_keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
hits AS (
  SELECT k FROM (
    SELECT k,
           (CAST('0x' || substring(md5('bf' || CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 15) AS BIGINT)) % {SK.BLOOM_BITS} AS pos
    FROM probe_keys CROSS JOIN (SELECT unnest(range({SK.BLOOM_K})) AS r) bf_rows
  ) p JOIN bits USING (pos)
  GROUP BY k HAVING count(*) = {SK.BLOOM_K}
),
pruned AS (
  SELECT o.o_orderpriority, o.o_custkey FROM orders o JOIN hits h ON o.o_custkey = h.k
)
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM vip)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_true_members
FROM pruned GROUP BY 1
"""


# ---------------------------------------------------------------------------
# HDR quantile sketch over order totals
# ---------------------------------------------------------------------------

QH_QUANTILES = [("p50", 50, 100), ("p90", 90, 100), ("p99", 99, 100)]


def q_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of order totals (cents) per order-priority via the
    integer HDR histogram: the only full-data shuffle is the (group,
    bucket) count — O(groups × ~2k) rows — vs a per-group sort for exact
    quantiles. Bucket math is integer-only, so the estimate is
    deterministic and engine-portable (rel. error ≤ 2^-5)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    hist = orders.transform(SK.hdr_histogram(["o_orderpriority"], "cents"))
    return SK.hdr_quantiles(hist, ["o_orderpriority"], QH_QUANTILES)


SQL_HDR_QUANTILES = SK.hdr_quantile_sql(
    "orders",
    ["o_orderpriority"],
    "round(o_totalprice * 100, 0)",
    QH_QUANTILES,
)


QUERIES = {
    "countmin_heavy_hitters": q_countmin_hh,
    "table_profile_sweep": q_profile,
    "bloom_pruned_join": q_bloom_prune,
}
ORACLES = {
    "countmin_heavy_hitters": SQL_COUNTMIN_HH,
    "table_profile_sweep": SQL_PROFILE,
    "bloom_pruned_join": SQL_BLOOM_PRUNE,
}

# Battery consolidation (VERDICT r8 #2): subsumed by the registered staged
# entries built on the same sketch cores — hll_set_algebra (same HLL
# registers, plus merge algebra) and hdr_percentile_calibrate (same HDR
# buckets, plus inverse lookup). Oracle-gated by tests/test_retired_surfaces.py.
RETIRED_QUERIES = {
    "hll_distinct_users": q_hll_users,       # ⊂ hll_set_algebra
    "hdr_quantile_sketch": q_hdr_quantiles,  # ⊂ hdr_percentile_calibrate
}
RETIRED_ORACLES = {
    "hll_distinct_users": SQL_HLL_USERS,
    "hdr_quantile_sketch": SQL_HDR_QUANTILES,
}
