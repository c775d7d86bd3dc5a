"""Live JDBC disposition: read/write against embedded Derby.

The reference runs every job over SQL Server JDBC; the sandbox has no
RDBMS server, but Spark ships embedded Apache Derby (its Hive-metastore
backend), which exercises the real JDBC code paths in
``sources/tables.py`` — DriverManager handshake, dialect-mediated DDL on
first append, ``write_partitions`` connection fan-out, full-table scans
and range-partitioned parallel reads (``JDBCRelation`` stride planning).

Two pushdown shapes stay Derby-untestable and are covered by pytest-level
option assertions instead: Spark wraps ``query``/``dbtable``-subselect
reads as ``(...) SPARK_GEN_SUBQ_n`` — an AS-less derived-table alias that
Derby's parser rejects but SQL Server (the reference's dialect,
``LoadHtsClientTests.java:66,76``) accepts.
"""

from __future__ import annotations

import pytest

from dwh_etl_ods_spark_jobs_spark.sources import JdbcSpec, read_table, write_append

URL = "jdbc:derby:memory:ods_live_test;create=true"


@pytest.fixture(scope="module")
def seeded(spark):
    df = spark.createDataFrame(
        [(i, f"p{i}", float(i)) for i in range(100)], "id int, name string, v double"
    )
    write_append(df, JdbcSpec(url=URL, table="APP.SMOKE"), write_partitions=2)
    return df


def test_jdbc_write_then_full_read(spark, seeded):
    back = read_table(spark, JdbcSpec(url=URL, table="APP.SMOKE"))
    assert back.count() == 100
    assert {c.upper() for c in back.columns} == {"ID", "NAME", "V"}


def test_jdbc_append_is_append(spark, seeded):
    spec = JdbcSpec(url=URL, table="APP.SMOKE2")
    one = spark.createDataFrame([(1, "a", 1.0)], "id int, name string, v double")
    write_append(one, spec)
    write_append(
        spark.createDataFrame([(2, "b", 2.0)], "id int, name string, v double"), spec
    )
    assert read_table(spark, spec).count() == 2


def test_jdbc_range_partitioned_read(spark, seeded):
    spec = JdbcSpec(
        url=URL, table="APP.SMOKE",
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    df = read_table(spark, spec)
    assert df.count() == 100  # stride planning loses no rows at the bounds
    assert df.rdd.getNumPartitions() == 4  # the read is actually parallel


def test_jdbc_query_options_reach_the_reader(spark):
    """The query / subselect pushdown forms: Derby's parser rejects Spark's
    AS-less generated alias, so assert the option plumbing instead — the
    reader must carry the exact pushdown text for dialects that accept it
    (SQL Server does; this is the reference's own read shape)."""
    q = "select id, name from APP.SMOKE where id < 10"
    with pytest.raises(Exception) as ei:
        read_table(spark, JdbcSpec(url=URL, query=q)).count()
    # Failure must come from Derby's SQL parser receiving our query text,
    # not from option routing (which would raise a Python/analysis error
    # before ever reaching the database).
    assert "SPARK_GEN_SUBQ" in str(ei.value) or "42X01" in str(ei.value)


def test_jdbc_spec_rejects_partitioning_without_bounds():
    """The reference passes lowercase `numpartitions` with no
    partitionColumn and Spark silently single-threads the read
    (LoadCTPatients.java:56, fixed quirk): our spec requires the full
    partition contract instead."""
    spec = JdbcSpec(url=URL, table="APP.SMOKE", partition_column="id")
    # bounds missing -> reader raises at load time rather than degrading
    with pytest.raises(Exception):
        from dwh_etl_ods_spark_jobs_spark.session import get_spark

        read_table(get_spark("jdbc-neg"), spec).count()


def test_jdbc_upsert_batch_merge_and_bootstrap(spark):
    from dwh_etl_ods_spark_jobs_spark.sources.tables import jdbc_upsert_batch

    spec = JdbcSpec(url=URL, table="APP.UPS")
    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id int, name string, v double"
    )
    jdbc_upsert_batch(b1, spec, ["id"])  # bootstrap: plain append
    assert read_table(spark, spec).count() == 2

    # batch 2: update id=2, insert id=3 — one server-side MERGE.
    # Assert COUNT, not just a dict (dicts collapse duplicate keys — a
    # plain-append regression would pass the dict check; ADVICE r8).
    b2 = spark.createDataFrame(
        [(2, "b2", 99.0), (3, "c", 30.0)], "id int, name string, v double"
    )
    jdbc_upsert_batch(b2, spec, ["id"])
    assert read_table(spark, spec).count() == 3
    rows = {r.id: (r.name, r.v) for r in read_table(spark, spec).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0)}

    # idempotent: replaying batch 2 merges to the same state, same count
    jdbc_upsert_batch(b2, spec, ["id"])
    assert read_table(spark, spec).count() == 3
    rows = {r.id: (r.name, r.v) for r in read_table(spark, spec).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0)}


def test_jdbc_table_exists_schema_qualified_and_wildcards(spark):
    """The metadata probe must split 'SCHEMA.TABLE' (getTables matches the
    table-name component only) and escape LIKE wildcards so 'UP_' does not
    match 'UPS' (ADVICE r8 — the unsplit spec made every existing table
    probe False, turning every MERGE into a duplicate-append bootstrap)."""
    from dwh_etl_ods_spark_jobs_spark.sources.tables import (
        _jdbc_table_exists,
        write_append,
    )

    write_append(
        spark.createDataFrame([(1,)], "id int"),
        JdbcSpec(url=URL, table="APP.EXISTS_PROBE"),
    )
    assert _jdbc_table_exists(spark, JdbcSpec(url=URL, table="APP.EXISTS_PROBE"))
    # case-fold candidates cover unquoted-DDL storage case
    assert _jdbc_table_exists(spark, JdbcSpec(url=URL, table="app.exists_probe"))
    # unqualified name still resolves (schemaPattern=None -> any schema)
    assert _jdbc_table_exists(spark, JdbcSpec(url=URL, table="EXISTS_PROBE"))
    assert not _jdbc_table_exists(spark, JdbcSpec(url=URL, table="APP.EXISTS_PROBX"))
    # '_' must be escaped: 'EXISTS_PROB_' would LIKE-match EXISTS_PROBE
    assert not _jdbc_table_exists(spark, JdbcSpec(url=URL, table="APP.EXISTS_PROB_"))


def test_jdbc_upsert_sink_streams_scd1_state(spark, tmp_path):
    import os

    from dwh_etl_ods_spark_jobs_spark import streaming as ST
    from dwh_etl_ods_spark_jobs_spark.sources.tables import jdbc_upsert_sink

    src = os.path.join(str(tmp_path), "landing")
    spec = JdbcSpec(url=URL, table="APP.UPS_STREAM")
    schema = "id int, name string, gen int"

    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (2, "b-later", 2)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    q = jdbc_upsert_sink(
        ST.file_stream(spark, src, spark.read.parquet(src).schema),
        spec, ["id"],
        os.path.join(str(tmp_path), "ckpt"),
        dedupe_order=["gen"],
    )
    ST.run_to_completion(q)
    rows = {r.id: (r.name, r.gen) for r in read_table(spark, spec).collect()}
    # within-batch dedupe kept the latest generation for id=2
    assert rows == {1: ("a", 1), 2: ("b-later", 2)}

    # second drop: update id=1, add id=9; stream continues via checkpoint
    spark.createDataFrame([(1, "a2", 2), (9, "z", 1)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = jdbc_upsert_sink(
        ST.file_stream(spark, src, spark.read.parquet(src).schema),
        spec, ["id"],
        os.path.join(str(tmp_path), "ckpt"),
        dedupe_order=["gen"],
    )
    ST.run_to_completion(q)
    rows = {r.id: (r.name, r.gen) for r in read_table(spark, spec).collect()}
    assert rows == {1: ("a2", 2), 2: ("b-later", 2), 9: ("z", 1)}
