"""Driver-gated query for the per-job source WHERE predicates.

``job_source_filters`` synthesizes boundary rows from ``orders`` (every
predicate's pass / fail / NULL / edge values, cycled with decorrelated
offsets) and pushes them through the ACTUAL filter chains the catalog
wires (``CATALOG[job].filters`` — jobs/filters.py census, reference
provenance there). One tagged UNION ALL branch per representative job, so
the DuckDB oracle hash-checks every predicate's three-valued-logic
behavior on both engines:

- ``ct_patients``  — Gender IS NOT NULL AND Gender != 'Unknown' AND
  SiteCode > 0 (LoadSourceCTPatients.sql:18)
- ``ct_patient_labs`` — Gender != 'Unknown' only (LoadSourceCTPatientLabs.sql)
- ``hts_clients``  — DateExtracted > '2019-09-08' (LoadHtsClients.sql:35)
- ``hts_client_tracing`` — TracingType/TracingOutcome IS NOT NULL
  (LoadHtsClientTracing.sql:14)
- ``facilities``   — MFL_Code != '' (LoadSites.sql:6)

The SQL oracle is rendered from the same ``FilterSpec.sql`` strings the
catalog carries, so the data being verified IS the data being shipped.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.jobs.catalog import CATALOG

# Boundary value cycles. Every list carries at least one pass, one fail,
# and one NULL probe for its predicate(s).
_GENDER = ["Male", "Female", "Unknown", None, ""]
_SITECODE = [-5, 0, 1, 700, None]
_DATE_EXTRACTED = ["2019-09-07", "2019-09-08", "2019-09-09", None, "2023-06-01"]
_TRACING_TYPE = ["home", None, "phone"]
_TRACING_OUTCOME = ["found", None]
_MFL = ["", "12345", None, "00042"]

# (column, values, spark cast type, sql literal renderer, offset) — offsets
# decorrelate the cycles so rows exercise mixed pass/fail combinations.
def _sql_str(v):
    return "NULL" if v is None else "'" + str(v).replace("'", "''") + "'"


def _sql_int(v):
    return "NULL" if v is None else str(v)


def _sql_date(v):
    return "NULL" if v is None else f"DATE '{v}'"


_DIRTY = [
    ("Gender", _GENDER, "string", _sql_str, 0),
    ("SiteCode", _SITECODE, "int", _sql_int, 1),
    ("DateExtracted", _DATE_EXTRACTED, "date", _sql_date, 2),
    ("TracingType", _TRACING_TYPE, "string", _sql_str, 3),
    ("TracingOutcome", _TRACING_OUTCOME, "string", _sql_str, 4),
    ("MFL_Code", _MFL, "string", _sql_str, 5),
]

_JOBS = [
    "ct_patients",
    "ct_patient_labs",
    "hts_clients",
    "hts_client_tracing",
    "facilities",
]

_OUT_COLS = [c for c, *_ in _DIRTY]


def _pick(values, cast_type: str, offset: int) -> Column:
    arr = F.array(*[F.lit(v).cast(cast_type) for v in values])
    idx = ((F.col("o_orderkey") + offset) % len(values)).cast("int") + 1
    return F.element_at(arr, idx)


def q_job_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    dirty = orders.select(
        "o_orderkey",
        *[_pick(vals, t, off).alias(col) for col, vals, t, _r, off in _DIRTY],
    )
    out: DataFrame | None = None
    for name in _JOBS:
        branch = dirty
        for fs in CATALOG[name].filters:
            branch = branch.filter(fs.make())
        tagged = branch.select(
            F.lit(name).alias("job"), "o_orderkey", *_OUT_COLS
        )
        out = tagged if out is None else out.unionAll(tagged)
    assert out is not None
    return out


def _oracle() -> str:
    dirty_cols = []
    for col, vals, _t, render, off in _DIRTY:
        lst = "[" + ", ".join(render(v) for v in vals) + "]"
        dirty_cols.append(
            f"({lst})[CAST((o_orderkey + {off}) % {len(vals)} AS INT) + 1]"
            f" AS {col}"
        )
    branches = []
    for name in _JOBS:
        preds = [fs.sql for fs in CATALOG[name].filters]
        where = " AND ".join(preds) if preds else "TRUE"
        branches.append(
            f"SELECT '{name}' AS job, o_orderkey, "
            + ", ".join(_OUT_COLS)
            + f" FROM dirty WHERE {where}"
        )
    return (
        "WITH dirty AS (SELECT o_orderkey, "
        + ", ".join(dirty_cols)
        + " FROM orders)\n"
        + "\nUNION ALL\n".join(branches)
    )


SQL_JOB_FILTERS = _oracle()

QUERIES = {"job_source_filters": q_job_filters}
ORACLES = {"job_source_filters": SQL_JOB_FILTERS}
