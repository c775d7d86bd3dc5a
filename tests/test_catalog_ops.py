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
    names = ["t_swap", "t_swap_stg", "t_swap_old", "t_a", "t_b"]
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
    assert not spark.catalog.tableExists("t_swap_old")  # aside copy cleaned


def test_stage_and_swap_first_run_creates(spark, clean_tables):
    """No live table yet: the swap degrades to a plain create."""
    new = spark.createDataFrame([(7, "v")], "id int, v string")
    stage_and_swap(spark, new, "t_swap")
    assert spark.table("t_swap").collect()[0].id == 7


def test_stage_and_swap_keeps_previous_generation_recoverable(
    spark, clean_tables, monkeypatch
):
    """Crash-safety: if the swap-in rename fails, the previous generation
    must still exist (rolled back into place) — a drop-then-rename order
    would have destroyed it before the failure."""
    import dwh_etl_ods_spark_jobs_spark.sources.catalog_ops as CO

    spark.createDataFrame([(1, "old")], "id int, v string").write.saveAsTable("t_swap")
    real_rename = CO.rename_table

    def failing_rename(spark_, old, new_):
        if old.endswith("_stg"):
            raise RuntimeError("injected swap failure")
        return real_rename(spark_, old, new_)

    monkeypatch.setattr(CO, "rename_table", failing_rename)
    with pytest.raises(RuntimeError, match="injected"):
        CO.stage_and_swap(
            spark, spark.createDataFrame([(2, "new")], "id int, v string"), "t_swap"
        )
    monkeypatch.undo()
    # previous generation rolled back into the live slot
    assert {r.v for r in spark.table("t_swap").collect()} == {"old"}


def test_run_sql_select_and_ddl(spark, clean_tables):
    run_sql(spark, "CREATE TABLE t_a (x INT) USING parquet")
    run_sql(spark, "INSERT INTO t_a VALUES (41), (1)")
    assert run_sql(spark, "SELECT sum(x) AS s FROM t_a").collect()[0].s == 42


def test_load_sql_resource(tmp_path):
    p = tmp_path / "LoadSomething.sql"
    p.write_text("SELECT 1 AS one\n", encoding="utf-8")
    assert load_sql_resource(p) == "SELECT 1 AS one\n"


def test_stage_and_swap_rerun_recovers_crashed_swap(spark, clean_tables):
    """Crash state = live slot empty, t_swap_old holding the last good
    generation (the window between the two renames). A re-run must
    RESTORE that generation before any destructive step — the old order
    dropped t_swap_old first, so a second failure lost every generation."""
    spark.createDataFrame([(1, "gen1")], "id int, v string").write.saveAsTable("t_swap")
    rename_table(spark, "t_swap", "t_swap_old")  # simulate the crash window
    assert not spark.catalog.tableExists("t_swap")

    new = spark.createDataFrame([(2, "gen2")], "id int, v string")
    stage_and_swap(spark, new, "t_swap")
    rows = {r.id: r.v for r in spark.table("t_swap").collect()}
    assert rows == {2: "gen2"}
    assert not spark.catalog.tableExists("t_swap_old")
    assert not spark.catalog.tableExists("t_swap_stg")


def test_read_csv_audited_counts_corrupt_rows(spark, tmp_path):
    from dwh_etl_ods_spark_jobs_spark.sources.tables import read_csv_audited

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,v\n"
        "1,alice,10.5\n"
        "2,bob,not_a_number\n"   # malformed double -> corrupt
        "3,carol,30.25\n"
        "4,dave\n"               # missing column -> corrupt
    )
    clean, audit = read_csv_audited(
        spark, str(p), "id int, name string, v double"
    )
    rows = {r.id: (r.name, r.v) for r in clean.collect()}
    assert rows == {1: ("alice", 10.5), 3: ("carol", 30.25)}
    a = audit.collect()[0]
    assert (a.n_rows, a.n_clean, a.n_corrupt, a.corrupt_ppm) == (4, 2, 2, 500_000)


def test_read_csv_audited_clean_file_is_zero_ppm(spark, tmp_path):
    from dwh_etl_ods_spark_jobs_spark.sources.tables import read_csv_audited

    p = tmp_path / "ok.csv"
    p.write_text("id,name,v\n1,a,1.0\n2,b,2.0\n")
    clean, audit = read_csv_audited(
        spark, str(p), "id int, name string, v double"
    )
    assert clean.count() == 2
    a = audit.collect()[0]
    assert (a.n_corrupt, a.corrupt_ppm) == (0, 0)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from dwh_etl_ods_spark_jobs_spark.sources.tables import compact_parquet

    path = str(tmp_path / "frag")
    # simulate micro-batch fragmentation: 12 tiny appends
    for i in range(12):
        spark.range(i * 10, i * 10 + 10).selectExpr(
            "id", "CAST(id AS STRING) AS s"
        ).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path)
    n_before = before.count()
    checksum_before = before.agg({"id": "sum"}).collect()[0][0]

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] >= 12
    assert stats["files_after"] == 1  # everything fits one target file

    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert after.agg({"id": "sum"}).collect()[0][0] == checksum_before
    # no staging/aside residue
    import os

    assert not os.path.exists(path + "__stg")
    assert not os.path.exists(path + "__old")


def test_write_range_sorted_files_are_disjoint_and_ordered(spark, tmp_path):
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.sources.tables import write_range_sorted

    path = str(tmp_path / "sorted")
    df = spark.range(10_000).selectExpr(
        "pmod(hash(id), 100000) AS k", "id AS payload"
    )
    write_range_sorted(df, path, ["k"], n_files=8)

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    # per-file key ranges must not overlap: global order across files
    ranges = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) == 8
    for a, b in zip(ranges, ranges[1:]):
        assert a.hi <= b.lo  # disjoint, ascending
