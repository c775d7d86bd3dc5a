"""Core ETL operator library.

Each operator is a pure ``DataFrame -> DataFrame`` function (or a small
factory returning one) so pipelines compose with ``df.transform(...)``.
All operators stay JVM-side (built-in Catalyst expressions) — no Python
UDFs anywhere in this package.
"""

from dwh_etl_ods_spark_jobs_spark.operators.clean import (
    CleaningRule,
    apply_rules,
    date_clamp,
    empty_to_null,
    presence_flag,
    range_sentinel,
    value_map,
    values_to_null,
)
from dwh_etl_ods_spark_jobs_spark.operators.dedupe import (
    dedupe_latest,
    dedupe_latest_agg,
)
from dwh_etl_ods_spark_jobs_spark.operators.enrich import (
    enrich_patient_facility,
    star_enrich,
)
from dwh_etl_ods_spark_jobs_spark.operators.hashing import hash_pii
from dwh_etl_ods_spark_jobs_spark.operators.incremental import (
    anti_join_new,
    merge_agg_state,
)
from dwh_etl_ods_spark_jobs_spark.operators.layout import morton_code, morton_code_sql
from dwh_etl_ods_spark_jobs_spark.operators.merge import (
    full_outer_coalesce,
    merge_upsert,
)
from dwh_etl_ods_spark_jobs_spark.operators.normalize import lookup_fold
from dwh_etl_ods_spark_jobs_spark.operators.rank import global_rank, quantile_bin
from dwh_etl_ods_spark_jobs_spark.operators.skew import (
    salted_agg,
    salted_join,
    with_salt,
)
from dwh_etl_ods_spark_jobs_spark.operators.spine import (
    day_spine,
    entity_day_grid,
    entity_month_grid,
    month_spine,
)
from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
    asof_join,
    sessionize,
    tumbling_rollup,
)

__all__ = [
    "CleaningRule",
    "merge_agg_state",
    "morton_code",
    "morton_code_sql",
    "anti_join_new",
    "global_rank",
    "quantile_bin",
    "apply_rules",
    "asof_join",
    "date_clamp",
    "dedupe_latest",
    "dedupe_latest_agg",
    "empty_to_null",
    "enrich_patient_facility",
    "full_outer_coalesce",
    "merge_upsert",
    "hash_pii",
    "lookup_fold",
    "day_spine",
    "entity_day_grid",
    "entity_month_grid",
    "month_spine",
    "presence_flag",
    "range_sentinel",
    "salted_agg",
    "salted_join",
    "sessionize",
    "star_enrich",
    "tumbling_rollup",
    "value_map",
    "values_to_null",
    "with_salt",
]
