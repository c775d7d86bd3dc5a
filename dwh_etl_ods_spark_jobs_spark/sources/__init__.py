"""Source/sink abstractions.

The reference reads everything over JDBC with whole queries pushed into SQL
Server (``LoadCTPatients.java:49-57``) and appends over JDBC
(``LoadCTPatients.java:205-215``). The engine abstracts the *location* of a
table away from the operator pipeline: a TableSpec resolves to a DataFrame
from parquet (tests/bench and lakehouse deployments) or JDBC (drop-in for
the reference's databases).
"""

from dwh_etl_ods_spark_jobs_spark.sources.catalog_ops import (
    drop_table,
    load_sql_resource,
    rename_table,
    run_sql,
    stage_and_swap,
)
from dwh_etl_ods_spark_jobs_spark.sources.tables import (
    JdbcSpec,
    ParquetSpec,
    TableSpec,
    read_table,
    tpch_tables,
    write_append,
)

__all__ = [
    "JdbcSpec",
    "ParquetSpec",
    "TableSpec",
    "drop_table",
    "load_sql_resource",
    "read_table",
    "rename_table",
    "run_sql",
    "stage_and_swap",
    "tpch_tables",
    "write_append",
]
