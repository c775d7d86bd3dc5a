"""Catalog maintenance helpers (DatabaseUtils/FileUtils analogs):
stage-and-swap full refresh, rename/drop, SQL-resource loading."""

from __future__ import annotations

import pytest

from dwh_etl_ods_spark_jobs_spark.sources import (
    drop_table,
    load_sql_resource,
    rename_table,
    run_sql,
    stage_and_swap,
)


@pytest.fixture()
def clean_tables(spark):
    names = ["t_swap", "t_swap_stg", "t_a", "t_b"]
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    yield
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_rename_and_drop(spark, clean_tables):
    spark.createDataFrame([(1,)], "x int").write.saveAsTable("t_a")
    rename_table(spark, "t_a", "t_b")
    assert not spark.catalog.tableExists("t_a")
    assert spark.table("t_b").collect()[0].x == 1
    drop_table(spark, "t_b")
    assert not spark.catalog.tableExists("t_b")
    drop_table(spark, "t_b")  # IF EXISTS: idempotent like the reference's guard


def test_stage_and_swap_full_refresh(spark, clean_tables):
    """LoadFacilities-style full refresh (SURVEY §3.3): new extract replaces
    the table; no staging residue remains."""
    spark.createDataFrame([(1, "old")], "id int, v string").write.saveAsTable("t_swap")
    new = spark.createDataFrame([(1, "new"), (2, "new")], "id int, v string")
    stage_and_swap(spark, new, "t_swap")
    rows = {r.id: r.v for r in spark.table("t_swap").collect()}
    assert rows == {1: "new", 2: "new"}
    assert not spark.catalog.tableExists("t_swap_stg")


def test_run_sql_select_and_ddl(spark, clean_tables):
    run_sql(spark, "CREATE TABLE t_a (x INT) USING parquet")
    run_sql(spark, "INSERT INTO t_a VALUES (41), (1)")
    assert run_sql(spark, "SELECT sum(x) AS s FROM t_a").collect()[0].s == 42


def test_load_sql_resource(tmp_path):
    p = tmp_path / "LoadSomething.sql"
    p.write_text("SELECT 1 AS one\n", encoding="utf-8")
    assert load_sql_resource(p) == "SELECT 1 AS one\n"
