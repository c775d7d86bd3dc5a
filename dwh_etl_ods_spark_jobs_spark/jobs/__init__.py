"""Declarative job catalog: the reference's 48+ Spark jobs as data.

The reference is one pattern instantiated ~48 times (SURVEY.md §7):
``scan(source) -> dedupe_latest -> clean -> normalize(lookups) ->
anti_join_new(target) -> hash_pii -> append``. Each Java main differs only
in configuration — source system, pushdown query, natural-key set, cleaning
rules, lookup tables, PII columns. Here that configuration IS the job.
"""

from dwh_etl_ods_spark_jobs_spark.jobs.catalog import CATALOG, job
from dwh_etl_ods_spark_jobs_spark.jobs.spec import JobSpec, LookupSpec, run_incremental_load

__all__ = ["CATALOG", "JobSpec", "LookupSpec", "job", "run_incremental_load"]
