"""Round-7 data-quality / preparation queries.

Three capabilities a 100 TB training-data warehouse audits constantly:

- ``dq_expectations`` — a Deequ-style declared-constraint suite evaluated
  in one aggregation pass per table (completeness, uniqueness, domain,
  range, positivity), emitting machine-checkable audit rows. The explicit
  form of the validation the reference does implicitly via sentinel
  rewrites and source WHERE gates (``jobs/filters.py``).
- ``chunk_sliding_window`` — RAG-style sliding-window document chunking
  with overlap; scan-side explode, hashed chunks for downstream dedup.
- ``outlier_mad_census`` — robust median/MAD outlier detection per group,
  on the exact-integer discipline (medians of cents are exact halves).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import text as T
from dwh_etl_ods_spark_jobs_spark.operators.quality import (
    RowCheck,
    UniqueCheck,
    dq_expectations,
    dq_expectations_sql,
)
from dwh_etl_ods_spark_jobs_spark.operators.stats import (
    robust_outlier_census,
    robust_outlier_census_sql,
)

__all__ = ["QUERIES", "ORACLES"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- 1. declared data-quality expectations, one pass per table ---

ORDERS_CHECKS: list[RowCheck | UniqueCheck] = [
    RowCheck(
        "custkey_complete",
        lambda: F.col("o_custkey").isNotNull(),
        "o_custkey IS NOT NULL",
    ),
    UniqueCheck("orderkey_unique", ("o_orderkey",)),
    RowCheck(
        "totalprice_positive",
        lambda: F.col("o_totalprice") > 0,
        "o_totalprice > 0",
    ),
    RowCheck(
        "status_in_domain",
        lambda: F.col("o_orderstatus").isin("O", "F", "P"),
        "o_orderstatus IN ('O', 'F', 'P')",
    ),
    RowCheck(
        "priority_nonempty",
        lambda: F.col("o_orderpriority").isNotNull()
        & (F.col("o_orderpriority") != ""),
        "o_orderpriority IS NOT NULL AND o_orderpriority <> ''",
    ),
]

LINEITEM_CHECKS: list[RowCheck | UniqueCheck] = [
    UniqueCheck("line_key_unique", ("l_orderkey", "l_linenumber")),
    RowCheck(
        "qty_in_range",
        lambda: F.col("l_quantity").between(1, 50),
        "l_quantity BETWEEN 1 AND 50",
    ),
    RowCheck(
        "discount_in_range",
        lambda: F.col("l_discount").between(0.0, 0.10),
        "l_discount BETWEEN 0.0 AND 0.10",
    ),
    RowCheck(
        "price_positive",
        lambda: F.col("l_extendedprice") > 0,
        "l_extendedprice > 0",
    ),
]


def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = dq_expectations(_t(spark, sf_dir, "orders"), "orders", ORDERS_CHECKS)
    lineitem = dq_expectations(
        _t(spark, sf_dir, "lineitem"), "lineitem", LINEITEM_CHECKS
    )
    return orders.unionByName(lineitem)


SQL_DQ_EXPECTATIONS = dq_expectations_sql(
    {"orders": ORDERS_CHECKS, "lineitem": LINEITEM_CHECKS}
)


# --- 2. sliding-window document chunking ---

CHUNK_WINDOW, CHUNK_STRIDE = 120, 90


def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.chunk_sliding(docs, "text", "doc_id", CHUNK_WINDOW, CHUNK_STRIDE)


SQL_CHUNK_SLIDING = T.chunk_sliding_sql(
    "documents", "text", "doc_id", CHUNK_WINDOW, CHUNK_STRIDE
)


# --- 3. robust median/MAD outlier census ---

def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.transform(robust_outlier_census(["event_type"], "value", k=3))


SQL_OUTLIER_MAD = robust_outlier_census_sql("events", ["event_type"], "value", k=3)


QUERIES = {
    "dq_expectations": q_dq_expectations,
    "chunk_sliding_window": q_chunk_sliding,
}
ORACLES = {
    "dq_expectations": SQL_DQ_EXPECTATIONS,
    "chunk_sliding_window": SQL_CHUNK_SLIDING,
}

# r11 consolidation (VERDICT r10 #2): the global robust_outlier_census is
# parameterization-subsumed by seasonal_weekday_outliers (same operator
# grouped by weekday); still DuckDB-verified by tests/test_retired_surfaces.py.
RETIRED_QUERIES = {"outlier_mad_census": q_outlier_mad}
RETIRED_ORACLES = {"outlier_mad_census": SQL_OUTLIER_MAD}
