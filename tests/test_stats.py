"""Exact bivariate statistics: agreement with the textbook formulas,
partitioning invariance (the property Spark's float corr() lacks)."""

from __future__ import annotations

import math

import pytest

from dwh_etl_ods_spark_jobs_spark.operators.stats import bivariate_stats


def _py_ref(pairs):
    n = len(pairs)
    xs = [round(x * 100) for x, _ in pairs]
    ys = [round(y * 100) for _, y in pairs]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    syy = sum(a * a for a in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    cov = float(n * sxy - sx * sy)
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    return {
        "mean_x": round(sx / n / 100.0, 6),
        "stddev_x": round(math.sqrt(vx / (n * (n - 1.0))) / 100.0, 6),
        "corr_xy": round(cov / (math.sqrt(vx) * math.sqrt(vy)), 6),
        "slope": round(cov / vx, 6),
        "intercept": round((sy - (cov / vx) * sx) / n / 100.0, 6),
    }


def test_bivariate_matches_reference_formulas(spark):
    pairs = [(1.00, 2.10), (2.00, 3.90), (3.00, 6.10), (4.00, 7.90), (5.50, 11.20)]
    df = spark.createDataFrame([("g", x, y) for x, y in pairs], "g string, x double, y double")
    row = df.transform(bivariate_stats(["g"], "x", "y")).collect()[0]
    ref = _py_ref(pairs)
    assert row.n == 5
    for k, v in ref.items():
        assert getattr(row, k) == pytest.approx(v, abs=1e-9), k
    # near-linear data: corr close to 1, slope close to 2
    assert row.corr_xy > 0.999 and row.slope == pytest.approx(2.0, abs=0.05)


def test_bivariate_partitioning_invariant(spark):
    rows = [("g", float(i % 97) + 0.25, float((i * 7) % 89) + 0.5) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = df.transform(bivariate_stats(["g"], "x", "y")).collect()[0]
    b = df.repartition(17).transform(bivariate_stats(["g"], "x", "y")).collect()[0]
    assert a == b  # bit-identical, not approximately equal


def test_bivariate_survives_values_beyond_bigint_product(spark):
    """Per-row moment products now multiply in decimal(38,0): cents above
    ~3.03e9 (values > ~$30M) would overflow BIGINT x*x — the ADVICE r6
    finding. Pin exactness at $50M-scale inputs."""
    pairs = [(5.0e7, 1.0e8), (5.2e7, 1.04e8), (4.8e7, 0.96e8), (5.1e7, 1.02e8)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pairs], "g string, x double, y double"
    )
    row = df.transform(bivariate_stats(["g"], "x", "y")).collect()[0]
    ref = _py_ref(pairs)
    assert row.n == 4
    for k, v in ref.items():
        assert getattr(row, k) == pytest.approx(v, rel=1e-12), k
    # y = 2x exactly -> perfect correlation and slope 2
    assert row.corr_xy == pytest.approx(1.0)
    assert row.slope == pytest.approx(2.0)


def test_chi2_association_known_value(spark):
    """2x2 table with a textbook chi2: obs [[20,10],[10,20]] ->
    chi2 = 60*(sum obs^2/(rt*ct) - 1) = 60*( (400+100+100+400)/900 - 1 )
         = 60*(1000/900 - 1) = 6.666... -> 6_666_6xx micro."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import chi2_association

    rows = (
        [("x", "p")] * 20 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 20
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_association(df, "a", "b").collect()[0]
    assert (r.n, r.n_cells, r.dof) == (60, 4, 1)
    assert abs(r.chi2_micro - 6_666_667) <= 300  # nano-floor bias only


def test_chi2_association_independent_is_zero(spark):
    # perfectly independent 2x2 -> chi2 exactly 0 (clamped floor)
    from dwh_etl_ods_spark_jobs_spark.operators.stats import chi2_association

    rows = (
        [("x", "p")] * 12 + [("x", "q")] * 6
        + [("y", "p")] * 4 + [("y", "q")] * 2
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_association(df, "a", "b").collect()[0]
    assert r.chi2_micro == 0
    assert r.dof == 1


def test_chi2_association_hash_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        chi2_association,
        chi2_association_sql,
    )

    rows = [(f"a{i % 5}", f"b{(i * 7 + i // 3) % 4}") for i in range(500)]
    pdf = pd.DataFrame(rows, columns=["a", "b"])
    got = chi2_association(spark.createDataFrame(pdf), "a", "b").collect()[0]
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute(chi2_association_sql("t", "a", "b")).fetchone()
    assert (got.n, got.n_cells, got.dof, got.chi2_micro) == duck


def test_chi2_association_null_categories_group(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import chi2_association

    rows = [("x", "p"), ("x", None), (None, "p"), (None, None)] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_association(df, "a", "b").collect()[0]
    assert (r.n, r.n_cells, r.dof) == (20, 4, 1)
    assert r.chi2_micro == 0  # independent by construction


def test_target_encoding_known_values(spark):
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.stats import target_encoding

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0), ("c", 1)],
        "cat string, y int",
    )
    out = {
        r.category: (r.n, r.sum_y, r.enc_micro)
        for r in target_encoding(df, "cat", F.col("y") == 1, m=2).collect()
    }
    gm = (3 * 1_000_000) // 6  # 500000
    assert out["a"] == (3, 2, (2_000_000 + 2 * gm) // 5)
    assert out["b"] == (2, 0, (0 + 2 * gm) // 4)
    assert out["c"] == (1, 1, (1_000_000 + 2 * gm) // 3)


def test_key_skew_profile_known_values(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import key_skew_profile

    df = spark.createDataFrame(
        [("hot",)] * 6 + [("w1",), ("w2",), ("w3",), ("w4",)], "k string"
    )
    r = key_skew_profile(df, ["k"]).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_per_key) == (10, 5, 6)
    assert r.skew_x_micro == (6 * 5 * 1_000_000) // 10  # 3.0x uniform
    assert r.top_key == "hot"


def test_key_skew_profile_tie_breaks_to_min_key(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import key_skew_profile

    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("z",)], "k string"
    )
    assert key_skew_profile(df, ["k"]).collect()[0].top_key == "a"


def test_rfm_quintiles_known_values(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.stats import rfm_quintiles

    # 5 customers, one order each on distinct days with distinct amounts:
    # every quintile cut is a clean 1-per-bin split
    rows = [
        (f"c{i}", dt.date(2024, 1, 1 + i), float(100 * (i + 1)))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "cust string, d date, amt double")
    out = {
        r.entity: (r.recency_days, r.n_orders, r.cents, r.r_q, r.f_q, r.m_q)
        for r in rfm_quintiles(
            df, "cust", "d", F.expr("CAST(round(amt * 100, 0) AS BIGINT)")
        ).collect()
    }
    # anchor = 2024-01-05 (c4). c0 is oldest (recency 4 -> worst r_q=1)
    # and cheapest (m_q=1); c4 newest (r_q=5) and dearest (m_q=5).
    assert out["c0"] == (4, 1, 10000, 1, 1, 1)
    assert out["c4"] == (0, 1, 50000, 5, 5, 5)
    # frequency all equal 1: f_q is then rank-by-entity tiebreak (1..5)
    assert sorted(v[4] for v in out.values()) == [1, 2, 3, 4, 5]


def test_cusum_flags_known_values(spark):
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.stats import cusum_flags

    # series 10, 10, 40: total=60, n=3, mean=20
    # dev_scaled = c*3 - 60 -> -30, -30, +60; cusum -> -30, -60, 0
    rows = [
        (dt.date(2024, 1, 1), 10),
        (dt.date(2024, 2, 1), 10),
        (dt.date(2024, 3, 1), 40),
    ]
    df = spark.createDataFrame(rows, "day date, cents long")
    out = {
        str(r.day): (r.cents, r.cusum_scaled, r.flagged)
        for r in cusum_flags(df, "day", "cents", 250_000).collect()
    }
    # envelope = thr_micro * |total| * n / 1e6 = 0.25 * 60 * 3 = 45
    assert out["2024-01-01"] == (10, -30, 0)
    assert out["2024-02-01"] == (10, -60, 1)
    assert out["2024-03-01"] == (40, 0, 0)


def test_categorical_entropy_known_values(spark):
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import categorical_entropy

    # group g1: uniform over 4 cats -> ln(4) nats; g2: single cat -> 0
    rows = [("g1", c) for c in "abcd" * 3] + [("g2", "z")] * 5
    df = spark.createDataFrame(rows, "g string, c string")
    got = {
        r.g: (r.n_rows, r.n_cats, r.entropy_micro)
        for r in categorical_entropy(df, ["g"], "c").collect()
    }
    # per-term rounding: 4 * round((1/4)*ln(4)*1e6)
    expect_g1 = 4 * round(0.25 * math.log(4) * 1e6)
    assert got["g1"] == (12, 4, expect_g1)
    assert got["g2"] == (5, 1, 0)


def test_categorical_entropy_global_and_nulls_match_duckdb(spark):
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        categorical_entropy,
        categorical_entropy_sql,
    )

    pdf = pd.DataFrame({"c": ["a", "a", "b", None, None, "c", "a", None]})
    got = categorical_entropy(spark.createDataFrame(pdf), [], "c").collect()[0]
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute(categorical_entropy_sql("t", [], "c")).fetchone()
    assert (got.n_rows, got.n_cats, got.entropy_micro) == duck
    assert got.n_cats == 4  # NULL is a category


def test_categorical_entropy_null_group_key_matches_duckdb(spark):
    """A NULL grouping key is a legitimate group: the Spark totals join
    must be null-safe (eqNullSafe) like the SQL's IS NOT DISTINCT FROM —
    a plain equi-join silently drops the NULL group (ADVICE r8)."""
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        categorical_entropy,
        categorical_entropy_sql,
    )

    pdf = pd.DataFrame(
        {
            "g": ["x", "x", None, None, None, "y"],
            "c": ["a", "b", "a", "a", "b", "a"],
        }
    )
    got = {
        r.g: (r.n_rows, r.n_cats, r.entropy_micro)
        for r in categorical_entropy(spark.createDataFrame(pdf), ["g"], "c").collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(categorical_entropy_sql("t", ["g"], "c")).fetchall()
    }
    assert got == duck
    assert None in got and got[None][0] == 3  # NULL group present, 3 rows
