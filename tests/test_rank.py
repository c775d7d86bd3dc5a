"""operators/rank.py: distributed global rank + equal-frequency binning."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.operators.rank import global_rank, quantile_bin


def _df(spark, n=1000, parts=None):
    df = spark.range(n).select(
        F.col("id"),
        # non-monotonic, duplicate-heavy sort value with unique (v, id) order
        F.pmod(F.col("id") * 37 + 11, F.lit(101)).alias("v"),
    )
    return df.repartition(parts) if parts else df


def test_global_rank_matches_single_partition_row_number(spark):
    got = (
        _df(spark)
        .transform(global_rank(["v", "id"], out_col="rk", n_ranges=8))
        .select("id", "rk")
        .toPandas()
        .set_index("id")["rk"]
        .to_dict()
    )
    rows = _df(spark).orderBy("v", "id").select("id").collect()
    expected = {r.id: i for i, r in enumerate(rows)}
    assert got == expected


def test_global_rank_invariant_under_input_partitioning(spark):
    a = (
        _df(spark)
        .transform(global_rank(["v", "id"], out_col="rk"))
        .orderBy("id")
        .collect()
    )
    b = (
        _df(spark, parts=13)
        .transform(global_rank(["v", "id"], out_col="rk", n_ranges=4))
        .orderBy("id")
        .collect()
    )
    assert [(r.id, r.rk) for r in a] == [(r.id, r.rk) for r in b]


def test_global_rank_with_total(spark):
    out = _df(spark, n=50).transform(
        global_rank(["v", "id"], out_col="rk", with_total="n")
    )
    rows = out.collect()
    assert all(r.n == 50 for r in rows)
    assert sorted(r.rk for r in rows) == list(range(50))


def test_quantile_bin_sizes_differ_by_at_most_one(spark):
    out = _df(spark, n=1003).transform(quantile_bin(["v", "id"], 8))
    sizes = {
        r.bin: r.cnt
        for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == 1003


def test_quantile_bin_is_order_consistent(spark):
    """Every row in bin k has (v, id) <= every row in bin k+1."""
    out = _df(spark, n=500).transform(quantile_bin(["v", "id"], 4)).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin, []).append((r.v, r.id))
    for k in range(3):
        assert max(by_bin[k]) < min(by_bin[k + 1])


def test_weighted_quantile_known_values(spark):
    """Weighted median/p90: first value whose cumulative weight crosses
    the threshold, exact integers."""
    from pyspark.sql import functions as F  # noqa: F401

    from dwh_etl_ods_spark_jobs_spark.operators.rank import weighted_quantile

    # values 1..4 with weights 1,1,6,2 (total 10):
    # median (cw*2 >= 10 -> cw >= 5): value 3 (cw=8); p90 (cw*10 >= 90): 4
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 6), (4, 2)], "v int, w long"
    )
    got = {
        (r.q_num, r.q_den): r.v
        for r in df.transform(
            weighted_quantile(["v"], "w", [(1, 2), (9, 10)], n_ranges=3)
        ).collect()
    }
    assert got == {(1, 2): 3, (9, 10): 4}


def test_weighted_quantile_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.rank import weighted_quantile

    df = spark.range(1000).select(
        F.pmod(F.col("id") * 37, F.lit(101)).alias("v"),
        F.col("id").alias("u"),
        (F.pmod(F.col("id"), F.lit(9)) + 1).alias("w"),
    )
    a = df.transform(
        weighted_quantile(["v", "u"], "w", [(1, 2)], n_ranges=8)
    ).collect()
    b = df.repartition(13).transform(
        weighted_quantile(["v", "u"], "w", [(1, 2)], n_ranges=2)
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_weighted_quantile_degenerate_inputs_emit_zero_rows(spark):
    """Empty input (and any quantile no row qualifies for) must emit ZERO
    rows, matching the SQL rendering's 'ORDER BY ... LIMIT 1' subquery —
    not one all-NULL row per quantile (ADVICE r8)."""
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        weighted_quantile,
        weighted_quantile_sql,
    )

    empty = spark.createDataFrame([], "v int, w long")
    got = empty.transform(
        weighted_quantile(["v"], "w", [(1, 2), (9, 10)], n_ranges=3)
    ).collect()
    assert got == []
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": pd.Series([], dtype="int64"),
                                    "w": pd.Series([], dtype="int64")}))
    duck = con.execute(
        weighted_quantile_sql("t", ["v"], "w", [(1, 2), (9, 10)])
    ).fetchall()
    assert duck == []

    # all-zero weights: every row qualifies (0 >= 0) -> min value, both engines
    pdf = pd.DataFrame({"v": [5, 3, 7], "w": [0, 0, 0]})
    got = spark.createDataFrame(pdf).transform(
        weighted_quantile(["v"], "w", [(1, 2)], n_ranges=2)
    ).collect()
    con.register("t0", pdf)
    duck = con.execute(weighted_quantile_sql("t0", ["v"], "w", [(1, 2)])).fetchall()
    assert [(r.q_num, r.q_den, r.v) for r in got] == [tuple(r) for r in duck] == [
        (1, 2, 3)
    ]


def test_weighted_quantile_is_single_pass(spark):
    """The per-quantile picks fold into ONE aggregation over the cum
    frame — Q quantiles must not fan out into Q filter+agg jobs
    (VERDICT r8 #7)."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import weighted_quantile

    df = spark.createDataFrame([(i, 1) for i in range(100)], "v int, w long")
    plan = df.transform(
        weighted_quantile(["v"], "w", [(i, 10) for i in range(1, 10)], n_ranges=4)
    )._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate over the cumulative frame (plus nothing per-quantile):
    # a per-quantile fan would show 9 Aggregates + Union
    assert plan.count("Aggregate") <= 2  # cum-side none; offsets agg + final
    assert "Union" not in plan
