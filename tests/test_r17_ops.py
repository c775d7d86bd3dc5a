"""Unit tests for the r17 operator wave: Mann-Kendall, MASE backtest,
difference-in-differences, decision-stump split gain — hand-checked
values and degenerate guards (oracle parity lives in
tests/test_staged_r17_surfaces.py)."""

from __future__ import annotations

import math


# --- Mann-Kendall ---------------------------------------------------------------


def test_mann_kendall_monotone_and_tied(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        mann_kendall_trend,
    )

    rows = (
        [("up", t, 10 * t) for t in range(1, 6)]  # strictly increasing
        + [("flat", t, 7) for t in range(1, 6)]  # all tied
        + [("sym", 1, 5), ("sym", 2, 9), ("sym", 3, 5)]  # S = 0
    )
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = {r.g: r for r in mann_kendall_trend(df, ["g"], "t", "v").collect()}
    assert out["up"].s_stat == 10  # C(5,2) concordant pairs
    assert out["up"].var_s_x18 == 5 * 4 * 15  # no ties
    assert out["up"].z_ppm == round(9 / math.sqrt(300 / 18.0) * 1_000_000)
    assert out["flat"].s_stat == 0 and out["flat"].var_s_x18 == 0
    assert out["flat"].z_ppm is None  # all-tied: variance 0
    assert out["sym"].s_stat == 0 and out["sym"].z_ppm == 0


def test_mann_kendall_single_point_emits_no_row(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        mann_kendall_trend,
    )

    df = spark.createDataFrame([("solo", 1, 5)], "g string, t long, v long")
    assert mann_kendall_trend(df, ["g"], "t", "v").count() == 0


# --- MASE backtest --------------------------------------------------------------


def test_mase_perfect_seasonal_pattern(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        mase_backtest,
    )

    rows = [("s", t, [1.0, 2.0][t % 2]) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    r = mase_backtest(df, ["g"], "t", "v", season=2).collect()[0]
    # seasonal forecast is exact; naive misses by $1 at every scored step
    assert r.n_scored == 4
    assert r.sae_seasonal == 0 and r.sae_naive == 400
    assert r.mase_ppm == 0


def test_mase_constant_series_is_null(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        mase_backtest,
    )

    df = spark.createDataFrame(
        [("c", t, 5.0) for t in range(8)], "g string, t long, v double"
    )
    r = mase_backtest(df, ["g"], "t", "v", season=2).collect()[0]
    assert r.sae_naive == 0 and r.mase_ppm is None


# --- Difference-in-differences ----------------------------------------------------


def test_did_hand_value(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import diff_in_diff

    rows = (
        [(0, 0, 10.0)] * 3 + [(0, 1, 12.0)] * 3  # control +2
        + [(1, 0, 20.0)] * 2 + [(1, 1, 25.0)] * 2  # treated +5
    )
    df = spark.createDataFrame(rows, "tr long, p long, y double")
    out = diff_in_diff(df, "tr", "p", "y").collect()
    assert len(out) == 4
    assert all(r.did_micro == 3_000_000 for r in out)  # 5 - 2 = $3.00
    cell = {(r.treated, r.period): r for r in out}
    assert cell[(1, 1)].mean_micro == 25_000_000 // 1  # $25.00 in micro/10? no:
    # mean_micro is micro-currency: 25.00 -> 25_000_000? cents*1e4: 2500*1e4
    assert cell[(1, 1)].mean_micro == 25_000_000


def test_did_missing_cell_is_null(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import diff_in_diff

    rows = [(0, 0, 10.0), (0, 1, 12.0), (1, 1, 25.0)]  # no treated-pre
    df = spark.createDataFrame(rows, "tr long, p long, y double")
    assert all(
        r.did_micro is None for r in diff_in_diff(df, "tr", "p", "y").collect()
    )


# --- Decision-stump split gain ----------------------------------------------------


def test_stump_perfect_split_and_constant_feature(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        stump_split_gain,
    )

    rows = (
        [("good", 0, 0)] * 10 + [("good", 1, 1)] * 10  # perfect split at 0
        + [("const", 3, lbl) for lbl in ([0] * 10 + [1] * 10)]  # one bin
    )
    df = spark.createDataFrame(rows, "f string, b long, l long")
    out = {r.feature: r for r in stump_split_gain(df, "f", "b", "l").collect()}
    assert "const" not in out  # no candidate split on a constant feature
    r = out["good"]
    assert r.best_split_bin == 0
    assert r.best_gain_ppm == 500_000  # parent gini .5 -> children 0
    assert r.n == 20 and r.n_pos == 10


def test_stump_prefers_more_separating_cut(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        stump_split_gain,
    )

    # rates by bin: 0%, 10%, 90% -> the best cut is after bin 1
    rows = []
    for b, pos in [(0, 0), (1, 1), (2, 9)]:
        rows += [("f", b, 1)] * pos + [("f", b, 0)] * (10 - pos)
    df = spark.createDataFrame(rows, "f string, b long, l long")
    r = stump_split_gain(df, "f", "b", "l").collect()[0]
    assert r.best_split_bin == 1


def test_mann_kendall_same_t_group_emits_s_zero(spark):
    """ADVICE r11 fix: a group whose rows all share one t has zero
    comparable pairs (the strict t_i < t_j frame) and emits S = 0 via
    the LEFT-joined S frame — not a silently dropped row."""
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        mann_kendall_trend,
        mann_kendall_trend_sql,
    )

    rows = [
        ("same_t", 1, 5),
        ("same_t", 1, 9),
        ("mix", 1, 1),
        ("mix", 1, 2),
        ("mix", 2, 3),
    ]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = {r.g: r for r in mann_kendall_trend(df, ["g"], "t", "v").collect()}
    # same_t: 2 points, no comparable pair -> S = 0; v's distinct so
    # var_s_x18 = 2*1*9 = 18, z = 0
    assert out["same_t"].n_points == 2
    assert out["same_t"].s_stat == 0
    assert out["same_t"].var_s_x18 == 18
    assert out["same_t"].z_ppm == 0
    # mix: duplicate-t pair (1,1)-(1,2) excluded; two comparable pairs
    assert out["mix"].s_stat == 2
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        r[0]: r
        for r in con.execute(
            mann_kendall_trend_sql("t", ["g"], "t", "v")
        ).fetchall()
    }
    for g in ("same_t", "mix"):
        assert (
            out[g].n_points,
            out[g].s_stat,
            out[g].var_s_x18,
            out[g].z_ppm,
        ) == want[g][1:]


def test_stump_null_bins_dropped_both_engines(spark):
    """ADVICE r11 fix: NULL bins are filtered at stump entry on both
    engines (NULL-first vs NULL-last window sort order would otherwise
    diverge the prefix counts and candidate splits)."""
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (  # noqa: F401
        mann_kendall_trend,
    )
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        stump_split_gain,
        stump_split_gain_sql,
    )

    rows = []
    for b, pos in [(0, 0), (1, 1), (2, 9)]:
        rows += [("f", b, 1)] * pos + [("f", b, 0)] * (10 - pos)
    rows += [("f", None, 1), ("f", None, 0)]  # NULL-binned rows
    df = spark.createDataFrame(rows, "f string, b long, l long")
    got = stump_split_gain(df, "f", "b", "l").collect()[0]
    assert got.best_split_bin == 1
    assert got.n == 30  # the two NULL-bin rows are excluded from counts
    con = duckdb.connect()
    con.execute("CREATE TABLE t (f VARCHAR, b BIGINT, l BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(stump_split_gain_sql("t", "f", "b", "l")).fetchall()[0]
    assert (got.feature, got.n, got.n_pos, got.best_split_bin,
            got.best_gain_ppm) == want
