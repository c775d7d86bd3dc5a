"""Unit tests for the r14 operator wave: Gini, WOE/IV, CUPED,
Theil-Sen, Kaplan-Meier, Pareto frontier, n-gram novelty, Adamic-Adar,
PCM silence segmentation — hand-checked values, degenerate guards, and
brute-force cross-checks (oracle parity lives in
tests/test_staged_r14_surfaces.py)."""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F


# --- Gini ---------------------------------------------------------------------


def test_gini_uniform_is_zero_and_extreme_is_high(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import gini_concentration

    rows = (
        [("u", i, 10) for i in range(20)]  # uniform -> 0
        + [("e", i, 0) for i in range(19)]
        + [("e", 99, 1000)]  # one holder -> (n-1)/n
    )
    df = spark.createDataFrame(rows, "g string, id long, x long")
    out = {
        r.g: r for r in gini_concentration(df, ["g"], "x", ["id"]).collect()
    }
    assert out["u"].gini_ppm == 0
    assert out["e"].gini_ppm == 950_000  # (n-1)/n = 19/20
    assert out["e"].n == 20 and out["e"].total_value == 1000


def test_gini_all_zero_group_is_null(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import gini_concentration

    df = spark.createDataFrame(
        [("z", 1, 0), ("z", 2, 0)], "g string, id long, x long"
    )
    assert gini_concentration(df, ["g"], "x", ["id"]).collect()[0].gini_ppm is None


def test_gini_partitioning_invariant(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import gini_concentration

    rows = [("a", i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, x long")
    a = gini_concentration(df, ["g"], "x", ["id"]).collect()[0].gini_ppm
    b = gini_concentration(
        df.repartition(13), ["g"], "x", ["id"]
    ).collect()[0].gini_ppm
    assert a == b


# --- WOE / IV -----------------------------------------------------------------


def test_woe_iv_hand_values_and_zero_cell_guard(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import woe_iv_screen

    # bucket A: 30 good / 10 bad; bucket B: 10 good / 30 bad;
    # bucket Z: 5 good / 0 bad (zero cell -> NULL)
    rows = (
        [("A", 0)] * 30 + [("A", 1)] * 10
        + [("B", 0)] * 10 + [("B", 1)] * 30
        + [("Z", 0)] * 5
    )
    df = spark.createDataFrame(rows, "b string, y long")
    out = {r.bucket: r for r in woe_iv_screen(df, "b", "y").collect()}
    G, B = 45, 40
    woe_a = round(math.log((30 / G) / (10 / B)) * 1e6)
    assert out["A"].woe_micro == woe_a
    assert out["A"].iv_micro == round(
        (30 / G - 10 / B) * math.log((30 / G) / (10 / B)) * 1e6
    )
    assert out["B"].woe_micro < 0  # bad-heavy bucket
    assert out["Z"].woe_micro is None and out["Z"].iv_micro is None


# --- CUPED --------------------------------------------------------------------


def test_cuped_theta_one_identity_and_lift(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        cuped_adjusted_readout,
    )

    # Properly randomized: consecutive (A, B) pairs share the same x
    # (covariate independent of assignment), y = x + 5 for A. Then
    # theta == 1 exactly, the adjustment centers both variants on the
    # global x mean, and the adjusted diff equals the true +5 lift.
    rows = [
        ("A" if i % 2 == 0 else "B",
         ((i // 2) * 13) % 50,
         ((i // 2) * 13) % 50 + (5 if i % 2 == 0 else 0))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "v string, x long, y long")
    out = {r.variant: r for r in cuped_adjusted_readout(df, "v", "x", "y").collect()}
    adj_diff = (out["A"].adj_mean_y_micro - out["B"].adj_mean_y_micro) / 1e6
    assert abs(adj_diff - 5.0) < 1e-9
    # adjusted == raw here (x balanced across variants): the adjustment
    # must not INVENT a shift when there is nothing to correct
    assert out["A"].adj_mean_y_micro == out["A"].mean_y_micro
    assert out["A"].rho2_ppm > 900_000  # x explains almost all variance


def test_cuped_zero_variance_covariate_falls_back_to_raw_mean(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        cuped_adjusted_readout,
    )

    rows = [("A", 7, 10), ("A", 7, 20), ("B", 7, 30), ("B", 7, 40)]
    df = spark.createDataFrame(rows, "v string, x long, y long")
    out = {r.variant: r for r in cuped_adjusted_readout(df, "v", "x", "y").collect()}
    assert out["A"].adj_mean_y_micro == out["A"].mean_y_micro == 15_000_000
    assert out["A"].rho2_ppm is None


# --- Theil-Sen ----------------------------------------------------------------


def test_theil_sen_immune_to_single_outlier(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import theil_sen_trend

    rows = [("s", t, 100 + 7 * t + (5000 if t == 13 else 0)) for t in range(30)]
    rows += [("d", t, 1000 - 3 * t) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = {r.g: r for r in theil_sen_trend(df, ["g"], "t", "v").collect()}
    assert out["s"].slope_ppm == 7_000_000  # outlier at t=13 ignored
    assert out["d"].slope_ppm == -3_000_000  # negative slopes engine-safe
    assert out["s"].n_points == 30 and out["s"].n_pairs == 435


def test_theil_sen_single_point_group_emits_nothing(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import theil_sen_trend

    df = spark.createDataFrame([("solo", 1, 10)], "g string, t long, v long")
    assert theil_sen_trend(df, ["g"], "t", "v").collect() == []


# --- Kaplan-Meier -------------------------------------------------------------


def test_kaplan_meier_hand_curve_with_censoring(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import kaplan_meier

    rows = [
        ("c", 1, 1), ("c", 2, 1), ("c", 2, 0), ("c", 3, 1),
        ("c", 4, 0), ("c", 5, 1), ("c", 6, 0),
    ]
    df = spark.createDataFrame(rows, "g string, dur long, ev long")
    out = {r.t: r for r in kaplan_meier(df, ["g"], "dur", "ev").collect()}
    assert out[1].n_at_risk == 7 and out[1].n_events == 1
    assert out[1].cum_log_surv_micro == round(math.log(6 / 7) * 1e6)
    # t=2: one event + one censor among 6 at risk; censor does NOT enter
    # the hazard, only shrinks the next risk set
    t2 = round(math.log(6 / 7) * 1e6) + round(math.log(5 / 6) * 1e6)
    assert out[2].cum_log_surv_micro == t2
    assert out[3].n_at_risk == 4
    # t=4 is censor-only: survival unchanged
    assert out[4].cum_log_surv_micro == out[3].cum_log_surv_micro


def test_kaplan_meier_absorbing_step_nulls_log_survival(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import kaplan_meier

    rows = [("z", 2, 1), ("z", 5, 1), ("z", 5, 1)]
    df = spark.createDataFrame(rows, "g string, dur long, ev long")
    out = {r.t: r for r in kaplan_meier(df, ["g"], "dur", "ev").collect()}
    assert out[2].cum_log_surv_micro == round(math.log(2 / 3) * 1e6)
    assert out[5].cum_log_surv_micro is None  # survival exactly 0


# --- Pareto frontier ----------------------------------------------------------


def test_pareto_frontier_matches_brute_force(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import pareto_frontier_2d

    rows = [(i, (i * 7) % 50, (i * 13) % 100 + 5) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, q long, c long")
    got = sorted(
        (r.score, r.frontier_cost)
        for r in pareto_frontier_2d(df, "q", "c").collect()
    )
    pts = [(q, c) for _, q, c in rows]

    def dominated(q, c):
        return any(
            q2 >= q and c2 <= c and (q2 > q or c2 < c) for q2, c2 in pts
        )

    brute = sorted(
        {
            (q, min(c2 for q2, c2 in pts if q2 == q))
            for q, c in pts
            if not dominated(q, min(c2 for q2, c2 in pts if q2 == q))
        }
    )
    assert got == brute
    # frontier invariant: better quality costs strictly more — sorted by
    # score ascending, frontier_cost strictly increases
    costs = [c for _, c in got]
    assert all(a < b for a, b in zip(costs, costs[1:]))


# --- n-gram novelty -----------------------------------------------------------


def test_ngram_novelty_extremes(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import ngram_novelty_census

    new = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # fully seen -> decile 0
            (2, "one two three four five six"),     # fully novel -> top decile
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = {
        r.novelty_decile: r
        for r in ngram_novelty_census(new, ref, "text", "doc_id").collect()
    }
    assert out[0].n_docs == 1 and out[0].novel_shingles == 0
    assert out[9].n_docs == 1 and out[9].novel_shingles == out[9].total_shingles


# --- Adamic-Adar --------------------------------------------------------------


def test_adamic_adar_hand_graph_and_center_cap(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import adamic_adar_topk

    # hub 0 — deg 5, over the cap of 4 -> contributes nothing;
    # node 6 — deg 2 -> wedge (3,4) with weight 1e6/ln(2);
    # (1,2) are adjacent -> excluded even as a candidate
    base = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2), (3, 6), (4, 6)]
    df = spark.createDataFrame(base, "u long, v long")
    out = {
        (r.node_a, r.node_b): r
        for r in adamic_adar_topk(df, top_k=10, max_center_degree=4).collect()
    }
    w2 = round(1e6 / math.log(2))
    assert out[(3, 4)].aa_micro == w2 and out[(3, 4)].common_neighbors == 1
    assert out[(0, 6)].aa_micro == 2 * w2  # centers 3 and 4, both deg 2
    assert (1, 2) not in out


def test_adamic_adar_isolated_and_deg1_centers_contribute_nothing(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import adamic_adar_topk

    # path 1-2-3: center 2 has deg 2 -> (1,3); leaves have deg 1
    df = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    out = adamic_adar_topk(df, top_k=10).collect()
    assert [(r.node_a, r.node_b) for r in out] == [(1, 3)]


# --- PCM silence segmentation ---------------------------------------------------


def _pcm(vals):
    return struct.pack(f"<{len(vals)}h", *vals)


def test_pcm_silence_segments_runs_and_energy(spark):
    from dwh_etl_ods_spark_jobs_spark.multimodal import pcm_silence_segments

    loud, quiet = [3000, -3000, 2500, -2500], [1, -1, 2, 0]
    payload = _pcm(loud + quiet + quiet + loud)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    out = sorted(
        (r.is_active, r.seg_start_win, r.seg_end_win, r.n_windows)
        for r in pcm_silence_segments(
            df, window_samples=4, silence_energy_per_sample=100
        ).collect()
    )
    assert out == [(0, 1, 2, 2), (1, 0, 0, 1), (1, 3, 3, 1)]


def test_pcm_silence_segments_partitioning_invariant(spark):
    from dwh_etl_ods_spark_jobs_spark.multimodal import pcm_silence_segments

    docs = [
        (i, _pcm([(3000 if (i + w) % 3 else 1) for w in range(64)]))
        for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, payload binary")
    a = sorted(map(tuple, pcm_silence_segments(df, 8, 100).collect()))
    b = sorted(map(tuple, pcm_silence_segments(df.repartition(7), 8, 100).collect()))
    assert a == b and len(a) > 0


# --- SRM check ------------------------------------------------------------------


def test_srm_hand_values_and_flag(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import srm_check

    rows = (
        [("e1", "a")] * 100 + [("e1", "b")] * 100   # perfect split
        + [("e2", "a")] * 130 + [("e2", "b")] * 70  # chi2 = 18 exactly
        + [("e3", "x")] * 50                         # single arm
    )
    df = spark.createDataFrame(rows, "e string, v string")
    out = {r.experiment: r for r in srm_check(df, "e", "v", 10_830_000).collect()}
    assert out["e1"].chi2_micro == 0 and out["e1"].srm_flag == 0
    # chi2 = ((130-100)^2 + (70-100)^2)/100 = 18
    assert out["e2"].chi2_micro == 18_000_000 and out["e2"].srm_flag == 1
    assert out["e3"].chi2_micro == 0  # nothing to mismatch against itself


# --- A-ES weighted reservoir ------------------------------------------------------


def test_weighted_reservoir_determinism_and_domain(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        weighted_reservoir_sample,
    )

    rows = [("g", i, (i * 7) % 20 + 1) for i in range(200)]
    rows += [("g", 998, 0), ("g", 999, None)]  # out of the draw domain
    df = spark.createDataFrame(rows, "g string, id long, w long")
    a = sorted(map(tuple, weighted_reservoir_sample(df, ["g"], "id", "w", 5, "s1").collect()))
    b = sorted(map(tuple, weighted_reservoir_sample(df, ["g"], "id", "w", 5, "s1").collect()))
    c = sorted(map(tuple, weighted_reservoir_sample(df, ["g"], "id", "w", 5, "s2").collect()))
    assert a == b and a != c  # seed-keyed, never rand()
    assert len(a) == 5
    assert not any(r[2] in (998, 999) for r in a)


def test_weighted_reservoir_weight_dominance(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        weighted_reservoir_sample,
    )

    # one row with overwhelming weight must always be sampled: its A-ES
    # key ln(u)/w ~ 0 beats every weight-1 key with probability
    # 1 - ~1e-9; with this fixed seed the property is deterministic
    rows = [("g", i, 1) for i in range(100)] + [("g", 777, 10**9)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    out = weighted_reservoir_sample(df, ["g"], "id", "w", 3, "seed").collect()
    assert any(r.id == 777 for r in out)


def test_weighted_reservoir_partitioning_invariant(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        weighted_reservoir_sample,
    )

    rows = [("g%d" % (i % 4), i, (i * 13) % 9 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    a = sorted(map(tuple, weighted_reservoir_sample(df, ["g"], "id", "w", 4, "z").collect()))
    b = sorted(map(tuple, weighted_reservoir_sample(df.repartition(11), ["g"], "id", "w", 4, "z").collect()))
    assert a == b and len(a) == 16


# --- Markov removal-effect attribution -------------------------------------------


def test_markov_attribution_hand_journeys(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_removal_attribution,
    )

    # journeys: S->a->C x3, S->a->b->C x1, S->b->N x2, S->b->C x1, S->c->N x2
    paths = (
        [["a", "_CONV_"]] * 3
        + [["a", "b", "_CONV_"]]
        + [["b", "_NULL_"]] * 2
        + [["b", "_CONV_"]]
        + [["c", "_NULL_"]] * 2
    )
    rows = []
    for p in paths:
        seq = ["_START_"] + p
        rows += list(zip(seq, seq[1:]))
    df = spark.createDataFrame(rows, "src string, dst string")
    out = {r.channel: r for r in markov_removal_attribution(df, 12).collect()}
    # base P(conv) = 4/9*7/8 + 3/9*1/2 = 5/9 -> 555555 ppm truncated
    assert out["a"].base_conv_ppm == 555_555
    # remove a: only S->b (1/3)*1/2 = 1/6; remove b: 4/9*3/4 = 1/3
    assert out["a"].removed_conv_ppm == 166_666
    assert out["b"].removed_conv_ppm == 333_333
    assert out["c"].removal_effect_ppm == 0 and out["c"].attribution_ppm == 0
    # attribution shares the removal mass
    assert out["a"].attribution_ppm > out["b"].attribution_ppm > 0


def test_markov_attribution_no_conversions_all_null(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_removal_attribution,
    )

    rows = [("_START_", "a"), ("a", "_NULL_"), ("_START_", "b"), ("b", "_NULL_")]
    df = spark.createDataFrame(rows, "src string, dst string")
    out = markov_removal_attribution(df, 8).collect()
    assert all(r.base_conv_ppm == 0 and r.removal_effect_ppm == 0 for r in out)
    assert all(r.attribution_ppm is None for r in out)  # 0/0 -> explicit NULL


# --- leave-one-group-out influence -------------------------------------------


def test_loo_influence_hand_values_and_whole_input_guard(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        loo_group_influence,
    )

    # groups: a = {10, 20}, b = {70}; mean_all = 100/3
    rows = [("a", 10), ("a", 20), ("b", 70)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in loo_group_influence(df, ["g"], "v").collect()}
    assert out["a"].mean_all_micro == 33_333_333
    assert out["a"].mean_without_micro == 70_000_000  # only b remains
    assert out["a"].influence_micro == 36_666_667  # dropping a RAISES mean
    assert out["b"].mean_without_micro == 15_000_000
    assert out["b"].influence_micro == 15_000_000 - 33_333_333
    # single-group input: no leave-out complement
    solo = spark.createDataFrame([("x", 5), ("x", 7)], "g string, v long")
    r = loo_group_influence(solo, ["g"], "v").collect()[0]
    assert r.mean_without_micro is None and r.influence_micro is None


# --- conformal interval ---------------------------------------------------------


def test_conformal_exact_rank_and_coverage(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        conformal_interval_eval,
    )

    cal = spark.createDataFrame([(i, i) for i in range(1, 101)], "id long, s long")
    tst = spark.createDataFrame(
        [(i + 1000, s) for i, s in enumerate([5, 50, 91, 92, 200, 30])],
        "id long, s long",
    )
    r = conformal_interval_eval(cal, tst, "s", "id", alpha_ppm=100_000).collect()[0]
    # k = ceil(101 * 0.9) = 91 -> qhat = 91st smallest = 91
    assert (r.n_cal, r.k_rank, r.qhat) == (100, 91, 91)
    assert (r.n_test, r.n_covered) == (6, 4)  # 5, 50, 91, 30 covered
    assert r.coverage_ppm == 666_666 and r.target_ppm == 900_000


def test_conformal_small_calibration_gives_infinite_interval(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        conformal_interval_eval,
    )

    cal = spark.createDataFrame([(1, 10), (2, 20)], "id long, s long")
    tst = spark.createDataFrame([(9, 999)], "id long, s long")
    r = conformal_interval_eval(cal, tst, "s", "id", alpha_ppm=10_000).collect()[0]
    # k = ceil(3 * 0.99) = 3 > n_cal = 2: the guarantee needs +inf
    assert r.qhat is None and r.n_covered == 1 and r.coverage_ppm == 1_000_000


# --- SMD balance ---------------------------------------------------------------


def test_smd_hand_shift_and_constant_covariate(spark):
    import math as _m

    from dwh_etl_ods_spark_jobs_spark.operators.stats import smd_balance_check

    rows = [("A", (i * 13) % 50, 7) for i in range(100)]
    rows += [("B", (i * 13) % 50 + 10, 7) for i in range(100)]
    df = spark.createDataFrame(rows, "arm string, x long, z long")
    out = {r.covariate: r for r in smd_balance_check(df, "arm", ["x", "z"]).collect()}
    # identical distributions shifted by exactly -10 for arm A
    xs = [(i * 13) % 50 for i in range(100)]
    mean = sum(xs) / len(xs)
    var = sum((v - mean) ** 2 for v in xs) / (len(xs) - 1)
    expect = round(-10 / _m.sqrt(var) * 1e6)
    assert out["x"].smd_micro == expect and out["x"].imbalance_flag == 1
    # constant covariate: zero pooled variance -> NULL, unflagged
    assert out["z"].smd_micro is None and out["z"].imbalance_flag == 0


def test_smd_multi_arm_pairs(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import smd_balance_check

    rows = [(a, v) for a in ("A", "B", "C") for v in range(10)]
    df = spark.createDataFrame(rows, "arm string, x long")
    out = smd_balance_check(df, "arm", ["x"]).collect()
    pairs = sorted((r.arm_a, r.arm_b) for r in out)
    assert pairs == [("A", "B"), ("A", "C"), ("B", "C")]
    assert all(r.smd_micro == 0 for r in out)  # identical arms balance


# --- recommendation-list quality eval --------------------------------------------


def test_rec_list_eval_hand_lists(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import rec_list_eval

    vecs = {
        1: [1.0, 0.0], 2: [0.0, 1.0], 3: [1.0, 0.0],
        4: [0.7071, 0.7071], 5: [1.0, 0.0], 6: [0.0, 1.0],
    }
    runs = [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5), (30, 6)]
    rdf = spark.createDataFrame(runs, "q long, item long")
    cdf = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "id long, v array<double>"
    )
    r = rec_list_eval(rdf, cdf, "q", "item", "id", "v").collect()[0]
    # q10 pair distances: (1,2)=1e6, (1,3)=0, (2,3)=1e6 -> ild 666666;
    # q20: cos(.7071) -> ~292893; q30 single item joins no pair
    assert r.n_queries == 3 and r.n_rec_rows == 6
    assert r.coverage_ppm == 1_000_000  # every catalog item recommended
    assert r.mean_ild_ppm == (666_666 + 292_893) // 2
    assert r.exposure_gini_ppm == 0  # every item exposed exactly once


def test_rec_list_eval_monoculture_flags(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import rec_list_eval

    # every query gets the SAME two identical-vector items out of a
    # 6-item catalog: diversity 0, coverage 2/6, high exposure gini
    vecs = [(i, [1.0, 0.0]) for i in range(1, 7)]
    runs = [(q, i) for q in range(5) for i in (1, 2)]
    rdf = spark.createDataFrame(runs, "q long, item long")
    cdf = spark.createDataFrame(vecs, "id long, v array<double>")
    r = rec_list_eval(rdf, cdf, "q", "item", "id", "v").collect()[0]
    assert r.mean_ild_ppm == 0
    assert r.coverage_ppm == 333_333
    assert r.exposure_gini_ppm > 600_000  # exposure concentrated on 2 of 6


def test_mergeable_state_shards_merge_by_cell_addition(spark):
    """The r14 eval bindings all claim 'shards merge by cell addition'
    — this pins the CONTRACT, not just stream==batch: two half-corpus
    state grids, merged by summing every accumulator cell per key,
    feed the _from_counts readout bit-identically to the whole-corpus
    batch operator. A future non-linear accumulator (a max, a distinct,
    a float mean) in any of these states breaks this test."""
    from pyspark.sql import functions as F

    import dwh_etl_ods_spark_jobs_spark.streaming as ST
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        loo_from_counts,
        loo_group_influence,
        smd_balance_check,
        smd_from_moments,
        stratified_ate,
        stratified_ate_from_counts,
    )
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_attribution_from_counts,
        markov_removal_attribution,
    )

    def merged(state_a, state_b, keys):
        cells = [c for c in state_a.columns if c not in keys]
        return (
            state_a.unionAll(state_b)
            .groupBy(*keys)
            .agg(*[F.sum(c).alias(c) for c in cells])
        )

    rows = [
        ("web", "A", 1, 0, 10 + i % 7, 100 + 3 * (i % 11)) for i in range(40)
    ] + [
        ("app", "B", 0, 1, 20 + i % 5, 90 + 2 * (i % 13)) for i in range(35)
    ] + [
        ("feed", "A", 1, 1, 15 + i % 3, 70 + 5 * (i % 4)) for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "source string, arm string, t long, p long, age long, y long"
    )
    half_a = df.filter(F.col("age") % 2 == 0)
    half_b = df.filter(F.col("age") % 2 == 1)

    # loo: (n_g, sum_g) per source
    got = loo_from_counts(
        merged(
            ST.streaming_group_sums(half_a, ["source"], "y"),
            ST.streaming_group_sums(half_b, ["source"], "y"),
            ["source"],
        ),
        ["source"],
    )
    want = loo_group_influence(df, ["source"], "y")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # smd: (_n, _sx, _sxx) per (covariate, arm)
    got = smd_from_moments(
        merged(
            ST.streaming_arm_covariate_moments(half_a, "arm", ["age", "y"]),
            ST.streaming_arm_covariate_moments(half_b, "arm", ["age", "y"]),
            ["_cov", "_arm"],
        )
    )
    want = smd_balance_check(df, "arm", ["age", "y"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # stratified ATE: 4 accumulators per stratum
    got = stratified_ate_from_counts(
        merged(
            ST.streaming_strata_outcome_sums(half_a, "source", "t", "y"),
            ST.streaming_strata_outcome_sums(half_b, "source", "t", "y"),
            ["bin"],
        )
    )
    want = stratified_ate(df, "source", "t", "y")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # markov: (_c) per (src, dst) transition cell — rows split by index
    # parity so the SAME cell appears in both shards (true cell
    # addition, not a disjoint-cell union)
    base = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") < 30, F.lit("_START_"))
        .otherwise(
            F.concat(F.lit("c"), (F.col("id") % 3).cast("string"))
        )
        .alias("src"),
        F.when(F.col("id") < 30,
               F.concat(F.lit("c"), (F.col("id") % 3).cast("string")))
        .when(F.col("id") % 5 == 0, F.lit("_CONV_"))
        .when(F.col("id") % 5 == 1, F.lit("_NULL_"))
        .otherwise(
            F.concat(F.lit("c"), ((F.col("id") * 7 + 1) % 3).cast("string"))
        )
        .alias("dst"),
    )
    tr = base.select("src", "dst")
    ta = base.filter(F.col("id") % 2 == 0).select("src", "dst")
    tb = base.filter(F.col("id") % 2 == 1).select("src", "dst")

    def tcounts(frame):
        return ST.streaming_transition_counts(frame, [], "src", "dst").select(
            "_s", F.col("_t").alias("_d"), F.col("_n_st").alias("_c")
        )

    got = markov_attribution_from_counts(
        merged(tcounts(ta), tcounts(tb), ["_s", "_d"])
    )
    want = markov_removal_attribution(tr)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_decimal_moment_overflow_fails_loud(spark):
    """The exact-moment envelope contract (SCALING.md r14 overflow
    note): sum(decimal(38,0)) past 1e38 must FAIL LOUDLY (ANSI
    NUMERIC_VALUE_OUT_OF_RANGE), never return a silent NULL or wrapped
    value — a future engine default flip to non-ANSI (silent-NULL)
    semantics breaks every moment operator's exactness story and must
    be caught here."""
    import pytest
    from pyspark.sql import functions as F

    big = 9 * 10**18
    df = spark.createDataFrame([(big,), (big,)], "x long")
    dec = F.col("x").cast("decimal(38,0)")
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        df.agg(F.sum(dec * dec).alias("s")).collect()
