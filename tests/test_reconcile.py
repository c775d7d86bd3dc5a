"""Reconciliation operators (operators/reconcile.py) — r8-staged:
snapshot diff between table versions and FK orphan census."""

from __future__ import annotations

import pytest

from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
    fk_orphan_census,
    fk_orphan_census_sql,
    snapshot_diff,
    snapshot_diff_sql,
)

OLD = [
    (1, "alice", 10),
    (2, "bob", 20),
    (3, "carol", 30),
    (None, "nullkey", 40),   # null-safe key handling
    (5, None, 50),           # NULL value column
]
NEW = [
    (1, "alice", 10),        # same
    (2, "bob", 99),          # changed
    (4, "dave", 40),         # added (3 removed)
    (None, "nullkey", 41),   # changed under a NULL key
    (5, "", 50),             # NULL -> empty string MUST read as changed
]
SCHEMA = "id int, name string, amount int"


def test_snapshot_diff_classifies_all_keys(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    got = {r.id: r.change for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {
        1: "same",
        2: "changed",
        3: "removed",
        4: "added",
        None: "changed",
        5: "changed",  # NULL vs '' distinguished by the sentinel
    }


def test_snapshot_diff_hash_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    spdf = (
        snapshot_diff(old, new, ["id"])
        .toPandas()
        .sort_values("id", na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("old_t", pd.DataFrame(OLD, columns=["id", "name", "amount"]))
    con.register("new_t", pd.DataFrame(NEW, columns=["id", "name", "amount"]))
    ddf = (
        con.execute(
            snapshot_diff_sql(
                "SELECT * FROM old_t",
                "SELECT * FROM new_t",
                ["id"],
                ["name", "amount"],
            )
        )
        .df()
        .sort_values("id", na_position="first")
        .reset_index(drop=True)
    )
    assert list(spdf["change"]) == list(ddf["change"])
    assert [
        None if pd.isna(v) else int(v) for v in spdf["id"]
    ] == [None if pd.isna(v) else int(v) for v in ddf["id"]]


def test_snapshot_diff_rejects_column_mismatch(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame([(1, "x")], "id int, name string")
    with pytest.raises(ValueError, match="column mismatch"):
        snapshot_diff(old, new, ["id"])


def test_snapshot_diff_ships_hashes_not_payload(spark):
    """Plan shape: the full-outer exchange carries (key, 32-char md5)
    regardless of how wide the table is — payload columns are pruned
    before the shuffle."""
    wide = spark.range(100).selectExpr(
        "id", *[f"CAST(id * {i} AS STRING) AS c{i}" for i in range(12)]
    )
    plan = (
        snapshot_diff(wide, wide, ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no raw payload column crosses the exchange
    assert "c7" not in plan.split("Exchange")[-1]


def test_fk_orphan_census_counts_and_ppm(spark):
    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c"), (None, "d")], "fk int, payload string"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = fk_orphan_census(child, parent, [("fk", "pk")]).collect()[0]
    # 9 has no parent; NULL references nothing -> 2 orphans of 4
    assert (r.n_child, r.n_orphans, r.orphan_ppm) == (4, 2, 500_000)


def test_fk_orphan_census_hash_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    child_rows = [(i % 7, f"p{i}") for i in range(40)] + [(None, "pn")]
    parent_rows = [(i,) for i in range(5)]
    child = spark.createDataFrame(child_rows, "fk int, payload string")
    parent = spark.createDataFrame(parent_rows, "pk int")
    got = fk_orphan_census(child, parent, [("fk", "pk")]).collect()[0]

    con = duckdb.connect()
    con.register("child_t", pd.DataFrame(child_rows, columns=["fk", "payload"]))
    con.register("parent_t", pd.DataFrame(parent_rows, columns=["pk"]))
    duck = con.execute(
        fk_orphan_census_sql(
            "SELECT * FROM child_t", "SELECT * FROM parent_t", [("fk", "pk")]
        )
    ).fetchone()
    assert (got.n_child, got.n_orphans, got.orphan_ppm) == duck


def test_fk_orphan_census_empty_child(spark):
    child = spark.createDataFrame([], "fk int, payload string")
    parent = spark.createDataFrame([(1,)], "pk int")
    r = fk_orphan_census(child, parent, [("fk", "pk")]).collect()[0]
    assert (r.n_child, r.n_orphans, r.orphan_ppm) == (0, 0, 0)


def test_table_checksum_order_insensitive_and_detects_change(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import table_checksum

    df = spark.createDataFrame(OLD, SCHEMA)
    a = table_checksum(df).collect()[0]
    b = table_checksum(df.repartition(7).orderBy(F_desc())).collect()[0]
    assert (a.n_rows, a.xor_hash) == (b.n_rows, b.xor_hash)

    changed = spark.createDataFrame(
        [(1, "alice", 11)] + OLD[1:], SCHEMA  # one cell changed
    )
    c = table_checksum(changed).collect()[0]
    assert c.xor_hash != a.xor_hash

    empty = spark.createDataFrame([], SCHEMA)
    e = table_checksum(empty).collect()[0]
    assert (e.n_rows, e.xor_hash, e.sum_hash) == (0, 0, 0)


def test_table_checksum_detects_even_multiplicity_swap(spark):
    """XOR alone self-cancels on duplicated pairs ({R,R} -> {S,S} keeps
    xor_hash); the mod-2^63 sum fold must still differ (ADVICE r7)."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import table_checksum

    rr = spark.createDataFrame([(1, "r", 1), (1, "r", 1)], SCHEMA)
    ss = spark.createDataFrame([(2, "s", 2), (2, "s", 2)], SCHEMA)
    a = table_checksum(rr).collect()[0]
    b = table_checksum(ss).collect()[0]
    assert a.xor_hash == 0 and b.xor_hash == 0  # the self-cancel mode
    assert a.sum_hash != b.sum_hash  # the sum fold catches it


def test_row_hash_field_boundaries_unambiguous(spark):
    """('a|b','c') vs ('a','b|c') and NUL-vs-NULL must hash differently
    (per-field md5 fingerprint, ADVICE r7)."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import snapshot_diff

    old = spark.createDataFrame([(1, "a|b", "c"), (2, "\x00", "x")],
                                "id INT, u STRING, v STRING")
    new = spark.createDataFrame([(1, "a", "b|c"), (2, None, "x")],
                                "id INT, u STRING, v STRING")
    got = {r.id: r.change for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def F_desc():
    from pyspark.sql import functions as F

    return F.desc("name")


def test_table_checksum_matches_duckdb(spark):
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        table_checksum,
        table_checksum_sql,
    )

    got = table_checksum(spark.createDataFrame(OLD, SCHEMA)).collect()[0]
    con = duckdb.connect()
    # typed table, not a pandas register: a None in an int column would
    # float-promote and render '1.0' vs Spark's '1'
    con.execute("CREATE TABLE t (id INTEGER, name VARCHAR, amount INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", OLD)
    duck = con.execute(
        table_checksum_sql("t", ["id", "name", "amount"])
    ).fetchone()
    assert (got.n_rows, got.xor_hash, got.sum_hash) == duck
