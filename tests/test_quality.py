"""Unit tests for the r7 data-quality / preparation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.operators.quality import (
    PPM,
    RowCheck,
    UniqueCheck,
    dq_expectations,
)
from dwh_etl_ods_spark_jobs_spark.operators.stats import robust_outlier_census
from dwh_etl_ods_spark_jobs_spark.text import chunk_sliding


def test_dq_expectations_exact_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "A"),     # fails positive
            (3, None, "B"),     # fails not-null (NULL pred -> failed)
            (3, 7.0, "Z"),      # duplicate id, fails domain
        ],
        "id long, v double, s string",
    )
    checks = [
        RowCheck("v_not_null", lambda: F.col("v").isNotNull(), "v IS NOT NULL"),
        RowCheck("v_positive", lambda: F.col("v") > 0, "v > 0"),
        RowCheck(
            "s_in_domain", lambda: F.col("s").isin("A", "B"), "s IN ('A','B')"
        ),
        UniqueCheck("id_unique", ("id",)),
        RowCheck(
            "v_mostly_positive",
            lambda: F.col("v") > 0,
            "v > 0",
            min_ppm=500_000,  # >= 50% passes
        ),
    ]
    rows = {r.check_name: r for r in dq_expectations(df, "t", checks).collect()}
    assert all(r.table_name == "t" and r.n_rows == 4 for r in rows.values())
    assert (rows["v_not_null"].n_ok, rows["v_not_null"].passed) == (3, 0)
    assert rows["v_not_null"].metric_ppm == 750_000
    assert (rows["v_positive"].n_ok, rows["v_positive"].passed) == (2, 0)
    assert rows["v_positive"].metric_ppm == 500_000
    assert (rows["s_in_domain"].n_ok, rows["s_in_domain"].passed) == (3, 0)
    assert (rows["id_unique"].n_ok, rows["id_unique"].passed) == (3, 0)
    # threshold check: 50% >= 50% -> passes
    assert rows["v_mostly_positive"].passed == 1


def test_dq_expectations_all_green_on_clean_table(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 6)], "id long, v double")
    checks = [
        RowCheck("v_positive", lambda: F.col("v") > 0, "v > 0"),
        UniqueCheck("id_unique", ("id",)),
    ]
    rows = dq_expectations(df, "t", checks).collect()
    assert all(r.passed == 1 and r.metric_ppm == PPM for r in rows)


def test_chunk_sliding_boundaries(spark):
    # non-periodic 250 chars (a periodic string would make distinct
    # stride-aligned chunks literally equal)
    text = "".join(chr(ord("a") + (i * 7 + i // 13) % 26) for i in range(250))
    df = spark.createDataFrame([(1, text), (2, "short"), (3, "")], "doc_id long, text string")
    out = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_sliding(df, "text", "doc_id", window=120, stride=90).collect()
    }
    # doc 1: n = ceil(250/90) = 3 chunks at starts 0, 90, 180
    assert {(1, 0), (1, 1), (1, 2), (2, 0)} == set(out)
    assert [out[(1, i)].chunk_start for i in range(3)] == [0, 90, 180]
    # middle chunks are full-width; the last clamps at the end (250-180=70)
    assert [out[(1, i)].chunk_len for i in range(3)] == [120, 120, 70]
    # a doc shorter than the window is one clamped chunk; empty docs drop
    assert out[(2, 0)].chunk_len == 5
    # overlap: window 120 > stride 90 means 30 shared chars between chunks
    assert out[(1, 0)].chunk_h != out[(1, 1)].chunk_h


def test_chunk_sliding_exact_stride_multiple(spark):
    # len == 2*stride exactly -> 2 chunks, no phantom third
    df = spark.createDataFrame([(1, "x" * 180)], "doc_id long, text string")
    rows = chunk_sliding(df, "text", "doc_id", window=120, stride=90).collect()
    assert [r.chunk_start for r in sorted(rows, key=lambda r: r.chunk_idx)] == [0, 90]
    assert [r.chunk_len for r in sorted(rows, key=lambda r: r.chunk_idx)] == [120, 90]


def test_robust_outlier_census_known_values(spark):
    # group g: values 1..9 (median 5, MAD 2) plus one wild outlier 100
    vals = [float(v) for v in range(1, 10)] + [100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    row = df.transform(robust_outlier_census(["g"], "v", k=3)).collect()[0]
    assert row.n == 10
    # median of cents {100..900, 10000} = (500+600)/2 = 550 -> med_c2 = 1100
    assert row.med_c2 == 1100
    # |c - 550|: {450,350,250,150,50,50,150,250,350,9450}; median = 250
    # cents -> MAD = 2.5 in original units -> mad_c4 = 4*250 = 1000
    assert row.mad_c4 == 1000
    # outlier rule |x - med| > 3*MAD: |100 - 5.5| = 94.5 > 7.5 -> only 100;
    # |1 - 5.5| = 4.5 and |9 - 5.5| = 3.5 keep the bulk inside
    assert row.n_outliers == 1


def test_robust_outlier_census_partitioning_invariant(spark):
    vals = [float(v % 17) + 0.25 for v in range(200)] + [1e4, -1e4]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    one = df.coalesce(1).transform(robust_outlier_census(["g"], "v")).collect()[0]
    many = df.repartition(13).transform(robust_outlier_census(["g"], "v")).collect()[0]
    assert one == many
    assert one.n_outliers == 2


def test_k_anonymity_census_known_values(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.quality import k_anonymity_census

    rows = (
        [("us", "a")] * 5      # class of 5 (safe at k=3)
        + [("us", "b")] * 2    # class of 2 (risky)
        + [("fr", "a")] * 2    # class of 2 (risky)
        + [("de", None)]       # NULL groups as a value: class of 1 (risky)
    )
    df = spark.createDataFrame(rows, "nation string, segment string")
    out = {
        r.class_size: (r.n_classes, r.n_rows, r.at_risk)
        for r in k_anonymity_census(df, ["nation", "segment"], k=3).collect()
    }
    assert out == {5: (1, 5, 0), 2: (2, 4, 1), 1: (1, 1, 1)}
    # table's k-anonymity = min class size; exposure = risky rows / rows
    assert min(out) == 1
    assert sum(n for s, (_, n, r) in out.items() if r) == 5


def test_k_anonymity_census_hash_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        k_anonymity_census,
        k_anonymity_census_sql,
    )

    pdf = pd.DataFrame(
        {
            "nation": ["us"] * 7 + ["fr"] * 3 + ["de"] * 2,
            "segment": ["a", "a", "a", "b", "b", "c", "c", "a", "a", "b", "c", "c"],
        }
    )
    spdf = (
        k_anonymity_census(spark.createDataFrame(pdf), ["nation", "segment"], 3)
        .toPandas()
        .sort_values("class_size")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    ddf = (
        con.execute(k_anonymity_census_sql("t", ["nation", "segment"], 3))
        .df()
        .sort_values("class_size")
        .reset_index(drop=True)
    )
    for c in ddf.columns:
        ddf[c] = ddf[c].astype("int64")
        spdf[c] = spdf[c].astype("int64")
    assert spdf.equals(ddf)


def test_k_anonymity_census_single_shuffle_on_rows(spark):
    """Plan shape: exactly one exchange touches row-sized data (the
    quasi-tuple count); the census aggregation exchanges class rows only."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import k_anonymity_census

    df = spark.range(10_000).selectExpr(
        "CAST(id % 7 AS STRING) AS nation", "CAST(id % 13 AS STRING) AS segment"
    )
    out = k_anonymity_census(df, ["nation", "segment"], 100)
    assert out.count() == 2  # 10000 over 91 classes -> sizes 109 and 110
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3  # quasi shuffle + class shuffle (+AQE read)


def test_quarantine_split_routes_rows_with_reasons(spark):
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        RowCheck,
        quarantine_split,
    )

    checks = [
        RowCheck("id_positive", lambda: F.col("id") > 0, "id > 0"),
        RowCheck("name_present", lambda: F.col("name") != "", "name != ''"),
    ]
    df = spark.createDataFrame(
        [(1, "a"), (0, "b"), (2, ""), (-1, ""), (3, None)],
        "id int, name string",
    )
    passed, quarantined = quarantine_split(df, checks)
    assert sorted(r.id for r in passed.collect()) == [1]
    q = {r.id: r.failed_checks for r in quarantined.collect()}
    assert q == {
        0: "id_positive",
        2: "name_present",
        -1: "id_positive,name_present",   # declaration order
        3: "name_present",                # NULL predicate = violation
    }
    # shared scan, zero shuffle on either branch
    plan = passed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quarantine_reason_matches_duckdb(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        RowCheck,
        quarantine_split,
        quarantine_split_sql_reason,
    )

    checks = [
        RowCheck("id_positive", lambda: F.col("id") > 0, "id > 0"),
        RowCheck("v_in_range", lambda: F.col("v") < 100, "v < 100"),
    ]
    pdf = pd.DataFrame(
        {"id": [1, -2, 3, -4], "v": [50.0, 150.0, None, 99.0]}
    )
    _, quarantined = quarantine_split(spark.createDataFrame(pdf), checks)
    got = sorted(
        (r.id, r.failed_checks) for r in quarantined.collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    expr = quarantine_split_sql_reason(checks)
    duck = sorted(
        (int(r[0]), r[1])
        for r in con.execute(
            f"SELECT id, {expr} AS fc FROM t WHERE {expr} != ''"
        ).fetchall()
    )
    assert got == duck


def test_unique_check_null_keys_match_duckdb(spark):
    """NULL-bearing multi-column keys: Spark count_distinct(a, b) skips
    any-NULL rows while DuckDB count(DISTINCT (a, b)) counts them — the
    sentinel rendering must make both engines agree (ADVICE r7)."""
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        UniqueCheck,
        dq_expectations,
        dq_expectations_sql,
    )

    pdf = pd.DataFrame(
        {
            "a": [1, 1, None, None, 2],
            "b": ["x", "x", "y", "y", None],
        }
    )
    checks = [UniqueCheck("key_unique", ("a", "b"))]
    got = dq_expectations(
        spark.createDataFrame(pdf), "t", checks
    ).collect()[0]
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute(dq_expectations_sql({"t": checks})).fetchone()
    assert (got.n_rows, got.n_ok, got.metric_ppm, got.passed) == duck[2:]
    # and the distinct count itself treats each NULL-bearing tuple as a
    # key value: {(1,x), (NULL,y), (2,NULL)} -> 3
    assert got.n_ok == 3


def test_dq_expectations_empty_table_fails_loudly(spark):
    """n = 0 must yield metric_ppm 0 / passed 0 on BOTH engines, not NULL
    rows that passed-gating silently skips (ADVICE r7)."""
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        RowCheck,
        UniqueCheck,
        dq_expectations,
        dq_expectations_sql,
    )

    checks = [
        RowCheck("v_pos", lambda: F.col("v") > 0, "v > 0"),
        UniqueCheck("id_unique", ("id",)),
    ]
    empty = spark.createDataFrame([], "id INT, v DOUBLE")
    rows = dq_expectations(empty, "t", checks).collect()
    assert [(r.n_rows, r.metric_ppm, r.passed) for r in rows] == [(0, 0, 0)] * 2
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INTEGER, v DOUBLE)")
    duck = con.execute(dq_expectations_sql({"t": checks})).fetchall()
    assert [(r[2], r[4], r[5]) for r in duck] == [(0, 0, 0)] * 2


def test_json_field_audit_known_values(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.quality import json_field_audit

    df = spark.createDataFrame(
        [
            ('{"k": 5}',),
            ('{"k": 7, "x": "y"}',),
            ('{"x": 1}',),        # valid, field missing
            ('{"k": 5',),         # malformed
            (None,),              # NULL cell -> malformed
        ],
        "props string",
    )
    r = json_field_audit(
        df, "props", fields=[("k", "$.k")], numeric_sums=[("k", "$.k")]
    ).collect()[0]
    assert (r.n_rows, r.n_valid, r.n_malformed) == (5, 3, 2)
    assert r.nn_k == 2
    assert r.sum_k == 12


def test_benford_audit_known_distribution(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        BENFORD_PPM,
        benford_first_digit_audit,
    )

    # 1000 values of 1xx, 500 of 2xx, zero/negative/NULL excluded
    rows = (
        [(100 + i % 100,) for i in range(1000)]
        + [(200 + i % 100,) for i in range(500)]
        + [(0,), (-5,), (None,)]
    )
    df = spark.createDataFrame(rows, "v long")
    got = {
        r.digit: (r.n, r.share_ppm, r.benford_ppm, r.dev_ppm)
        for r in benford_first_digit_audit(df, "v").collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == (
        1000, 666666, BENFORD_PPM[1], abs(666666 - BENFORD_PPM[1])
    )
    assert got[2] == (
        500, 333333, BENFORD_PPM[2], abs(333333 - BENFORD_PPM[2])
    )


def test_l_diversity_census_null_and_risk(spark):
    """count(DISTINCT sensitive) ignores NULL in both engines: an
    all-NULL class reports diversity 0 (maximally exposed); classes below
    l flag at_risk."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import l_diversity_census

    rows = [
        ("a", "x", 1), ("a", "x", 2), ("a", "x", 3),   # diversity 3
        ("b", "x", 1), ("b", "x", 1),                  # diversity 1
        ("c", "x", None), ("c", "x", None),            # diversity 0
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 string, s int")
    got = {
        r.diversity: (r.n_classes, r.n_rows, r.at_risk)
        for r in l_diversity_census(df, ["q1", "q2"], "s", l_min=2).collect()
    }
    assert got == {3: (1, 3, 0), 1: (1, 2, 1), 0: (1, 2, 1)}
