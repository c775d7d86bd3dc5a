"""Unit tests for the r15 operator wave: Nelson-Aalen, t-closeness,
degree assortativity, density-ratio weights, transition entropy, grid
radius pairs, Fellegi-Sunter, SAX motifs, k-center selection —
hand-checked values, degenerate guards, and brute-force cross-checks
(oracle parity lives in tests/test_staged_r15_surfaces.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- Nelson-Aalen -------------------------------------------------------------


def test_nelson_aalen_hand_curve(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import nelson_aalen

    # durations: two events at t=1 (of 4 at risk), censor at t=2,
    # event at t=3 (1 at risk)
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (3, 1)], "duration long, event long"
    )
    out = {r.t: r for r in nelson_aalen(df, [], "duration", "event").collect()}
    assert out[1].n_at_risk == 4 and out[1].n_events == 2
    assert out[1].cum_hazard_micro == 500_000  # 2/4
    assert out[2].cum_hazard_micro == 500_000  # censoring adds nothing
    assert out[3].n_at_risk == 1
    assert out[3].cum_hazard_micro == 1_500_000  # + 1/1 (total curve)


def test_nelson_aalen_matches_km_risk_sets(spark):
    """NA and KM must see identical (t, n_at_risk, d, c) grids — only
    the per-step transform differs."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        kaplan_meier,
        nelson_aalen,
    )

    rows = [(("g%d" % (i % 2)), (i * 7) % 20, i % 3 != 0) for i in range(200)]
    df = spark.createDataFrame(
        [(g, d, int(e)) for g, d, e in rows], "g string, dur long, ev long"
    )
    na = {
        (r.g, r.t): (r.n_at_risk, r.n_events, r.n_censored)
        for r in nelson_aalen(df, ["g"], "dur", "ev").collect()
    }
    km = {
        (r.g, r.t): (r.n_at_risk, r.n_events, r.n_censored)
        for r in kaplan_meier(df, ["g"], "dur", "ev").collect()
    }
    assert na == km


# --- t-closeness --------------------------------------------------------------


def test_t_closeness_hand_emd(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        t_closeness_census,
    )

    # global: value 1 x2, value 2 x2; class A all-1s, class B all-2s.
    # EMD(A) = |cumC_1*N - cumG_1*n| / (n*N*(V-1)) = |2*4-2*2|/(2*4*1)
    #        = 0.5 -> both classes 500000 ppm -> decile 5.
    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 2), ("B", 2)], "qa string, s long"
    )
    rows = t_closeness_census(df, ["qa"], "s", 400_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.emd_decile == 5 and r.n_classes == 2 and r.n_rows == 4
    assert r.n_at_risk == 2  # both exceed t = 0.4


def test_t_closeness_single_value_domain_is_zero(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        t_closeness_census,
    )

    df = spark.createDataFrame(
        [("A", 7), ("A", 7), ("B", 7)], "qa string, s long"
    )
    r = t_closeness_census(df, ["qa"], "s", 100_000).collect()[0]
    assert r.emd_decile == 0 and r.n_at_risk == 0  # V = 1 -> EMD 0


def test_t_closeness_null_sensitive_excluded(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        t_closeness_census,
    )

    df = spark.createDataFrame(
        [("A", 1), ("A", None), ("B", 2), ("B", 1)], "qa string, s long"
    )
    rows = t_closeness_census(df, ["qa"], "s", 900_000).collect()
    assert sum(r.n_rows for r in rows) == 3  # the NULL row is gone


# --- Degree assortativity -----------------------------------------------------


def test_assortativity_star_and_path_are_minus_one(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import degree_assortativity

    star = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "u long, v long")
    r = degree_assortativity(star).collect()[0]
    assert r.n_edges == 3 and r.n_nodes == 4
    assert r.r_ppm == -1_000_000  # pure hub-and-spoke

    path = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    assert degree_assortativity(path).collect()[0].r_ppm == -1_000_000


def test_assortativity_regular_graph_is_null(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import degree_assortativity

    tri = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "u long, v long")
    assert degree_assortativity(tri).collect()[0].r_ppm is None


# --- Density-ratio weights ----------------------------------------------------


def test_density_ratio_hand_weights_and_ess(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import density_ratio_weights

    src = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "bin string"
    )
    tgt = spark.createDataFrame(
        [("a",)] * 75 + [("b",)] * 25, "bin string"
    )
    out = {r.bin: r for r in density_ratio_weights(src, tgt, "bin").collect()}
    assert out["a"].weight_ppm == 1_500_000  # 0.75/0.50
    assert out["b"].weight_ppm == 500_000
    # Kish ESS = (50*1.5 + 50*0.5)^2 / (100 * (50*2.25 + 50*0.25)) = 0.8
    assert out["a"].ess_ppm == 800_000 and out["b"].ess_ppm == 800_000


def test_density_ratio_support_rules_and_clip(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import density_ratio_weights

    src = spark.createDataFrame(
        [("a",)] * 99 + [("rare",)], "bin string"
    )
    tgt = spark.createDataFrame(
        [("rare",)] * 50 + [("tgt_only",)] * 50, "bin string"
    )
    out = {
        r.bin: r
        for r in density_ratio_weights(
            src, tgt, "bin", w_max_ppm=5_000_000
        ).collect()
    }
    assert "tgt_only" not in out  # target-only bin dropped
    assert out["a"].weight_ppm == 0  # source-only bin
    assert out["rare"].weight_ppm == 5_000_000  # raw 50x clipped to 5x


# --- Transition entropy -------------------------------------------------------


def test_transition_entropy_deterministic_and_coinflip(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        transition_entropy,
    )

    det = [("g", "a", "b")] * 10
    coin = [("h", "a", "b")] * 5 + [("h", "a", "c")] * 5
    df = spark.createDataFrame(det + coin, "g string, s string, t string")
    out = {r.g: r for r in transition_entropy(df, ["g"], "s", "t").collect()}
    assert out["g"].cond_entropy_micro == 0
    assert out["g"].marginal_entropy_micro == 0
    ln2_micro = round(math.log(2.0) * 1_000_000)
    # two equal halves: each term rounds from 0.5*ln2
    half = round(0.5 * math.log(2.0) * 1_000_000)
    assert out["h"].cond_entropy_micro == 2 * half
    assert out["h"].marginal_entropy_micro == 2 * half
    assert abs(out["h"].cond_entropy_micro - ln2_micro) <= 1
    assert out["h"].n_transitions == 10 and out["h"].n_src_states == 1


def test_transition_entropy_requires_group(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        transition_entropy,
    )

    df = spark.createDataFrame([("a", "b")], "s string, t string")
    with pytest.raises(ValueError):
        transition_entropy(df, [], "s", "t")


# --- Grid radius pairs --------------------------------------------------------


def _brute_pairs(pts, radius):
    out = set()
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1:]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= radius * radius:
                a, b = sorted((ia, ib))
                out.add((a, b, (xa - xb) ** 2 + (ya - yb) ** 2))
    return out


def test_grid_radius_pairs_matches_brute_force(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    # negative coordinates included: floor-division cell indexing
    pts = [(i, (i * 37) % 50 - 25, (i * 91) % 50 - 25) for i in range(60)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (r.id_a, r.id_b, r.dist2)
        for r in grid_radius_pairs(df, "id", "x", "y", 7).collect()
    }
    assert got == _brute_pairs(pts, 7)


def test_grid_radius_pairs_no_duplicate_discovery(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    pts = [(i, i % 9, i // 9) for i in range(81)]  # dense 9x9 lattice
    df = spark.createDataFrame(pts, "id long, x long, y long")
    rows = grid_radius_pairs(df, "id", "x", "y", 3).collect()
    keys = [(r.id_a, r.id_b) for r in rows]
    assert len(keys) == len(set(keys))
    assert keys and all(a < b for a, b in keys)


# --- Fellegi-Sunter -----------------------------------------------------------


def test_fellegi_sunter_hand_weights(spark):
    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores

    # one field, values x,x,y,y -> u = (4+4)/16 = 0.5
    df = spark.createDataFrame(
        [(1, "b", "x"), (2, "b", "x"), (3, "b", "y"), (4, "b", "y")],
        "id long, blk string, f string",
    )
    rows = fellegi_sunter_scores(df, "id", "blk", [("f", "f")]).collect()
    assert len(rows) == 6
    w_agree = round(math.log(0.9 / 0.5) / math.log(2.0) * 1_000_000)
    w_dis = round(math.log(0.1 / 0.5) / math.log(2.0) * 1_000_000)
    for r in rows:
        if (r.id_a, r.id_b) in {(1, 2), (3, 4)}:
            assert r.n_agree == 1 and r.score_micro == w_agree
        else:
            assert r.n_agree == 0 and r.score_micro == w_dis


def test_fellegi_sunter_null_field_is_no_evidence(spark):
    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores

    df = spark.createDataFrame(
        [(1, "b", "x", "p"), (2, "b", None, "p"), (3, "b", "x", "q")],
        "id long, blk string, f string, g string",
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in fellegi_sunter_scores(
            df, "id", "blk", [("f", "f"), ("g", "g")]
        ).collect()
    }
    # pair (1,2): f NULL on one side -> only g contributes
    r12 = rows[(1, 2)]
    r13 = rows[(1, 3)]
    assert r12.n_agree == 1
    # f agrees on (1,3), g disagrees; both fields contribute there
    assert r13.n_agree == 1


def test_fellegi_sunter_single_valued_field_degenerates_null(spark):
    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores

    df = spark.createDataFrame(
        [(1, "b", "same"), (2, "b", "same"), (3, "b", "same")],
        "id long, blk string, f string",
    )
    rows = fellegi_sunter_scores(df, "id", "blk", [("f", "f")]).collect()
    # u = 1 -> disagreement weight undefined; agreement weight is
    # log2(0.9) (defined), pairs all agree -> finite scores
    w_agree = round(math.log(0.9) / math.log(2.0) * 1_000_000)
    assert all(r.score_micro == w_agree for r in rows)


# --- SAX motifs ---------------------------------------------------------------


def test_sax_motif_hand_word(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        sax_motif_census,
    )

    df = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 2, 2.0), ("k", 3, 3.0), ("k", 4, 4.0)],
        "key string, t long, v double",
    )
    out = {
        r.word: r for r in sax_motif_census(df, ["key"], "t", "v").collect()
    }
    # z of 1,2,3,4 = -1.34, -0.447, 0.447, 1.34 -> a b c d
    assert set(out) == {"abc", "bcd"}
    assert out["abc"].n_occurrences == 1 and out["abc"].n_keys == 1


def test_sax_constant_series_is_all_c(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        sax_motif_census,
    )

    df = spark.createDataFrame(
        [("k", t, 5.0) for t in range(5)], "key string, t long, v double"
    )
    out = sax_motif_census(df, ["key"], "t", "v").collect()
    assert len(out) == 1 and out[0].word == "ccc" and out[0].n_occurrences == 3


# --- k-center greedy ----------------------------------------------------------


def test_kcenter_hand_trace_1d(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import kcenter_greedy_select

    pts = [(0, [0]), (1, [1]), (2, [10]), (3, [11]), (4, [20])]
    df = spark.createDataFrame(pts, "id long, q array<int>")
    rows = sorted(
        kcenter_greedy_select(df, "id", "q", 4).collect(),
        key=lambda r: r.sel_round,
    )
    assert [(r.sel_round, r.doc_id, r.radius2) for r in rows] == [
        (0, 0, None),  # seed = min id
        (1, 4, 400),  # farthest from 0 is 20
        (2, 2, 100),  # 10 vs 11: tie on distance would pick smaller id;
        # here 10 is strictly farther (min(100,100) vs min(121,81))
        (3, 1, 1),
    ]


def test_kcenter_never_repicks_duplicates(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import kcenter_greedy_select

    pts = [(0, [0, 0]), (1, [0, 0]), (2, [5, 5]), (3, [5, 5]), (4, [9, 1])]
    df = spark.createDataFrame(pts, "id long, q array<int>")
    rows = kcenter_greedy_select(df, "id", "q", 3).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert 1 not in ids  # exact duplicate of the seed is never picked


def test_kcenter_radius_curve_non_increasing(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import kcenter_greedy_select

    pts = [(i, [(i * 37) % 100, (i * 91) % 100]) for i in range(50)]
    df = spark.createDataFrame(pts, "id long, q array<int>")
    rows = sorted(
        kcenter_greedy_select(df, "id", "q", 6).collect(),
        key=lambda r: r.sel_round,
    )
    radii = [r.radius2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_kcenter_exhaustion_degrades_gracefully(spark):
    """k larger than the distinct-point count: once every point sits at
    distance 0 from a chosen center, later rounds pick nothing — the
    output simply stops short of k rows (documented contract: k <=
    distinct points; no crash, no duplicate picks)."""
    from dwh_etl_ods_spark_jobs_spark.similarity import kcenter_greedy_select

    pts = [(0, [0]), (1, [0]), (2, [7])]
    df = spark.createDataFrame(pts, "id long, q array<int>")
    rows = kcenter_greedy_select(df, "id", "q", 10).collect()
    ids = [r.doc_id for r in rows]
    assert sorted(ids) == [0, 2]  # seed + the one distinct remaining
    assert len(ids) == len(set(ids))


def test_grid_radius_pairs_hot_cell_cap(spark):
    """The in-operator dense-cell cap: a pathological all-one-cell
    blob leaves the pair domain entirely (stated semantics), while
    spread points are untouched — and the capped result equals brute
    force over the SURVIVING points."""
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    blob = [(i, 2, 3) for i in range(50)]  # 50 coincident points
    ring = [(100 + i, 20 + 7 * i, 20) for i in range(6)]
    df = spark.createDataFrame(blob + ring, "id long, x long, y long")
    rows = grid_radius_pairs(df, "id", "x", "y", 7, max_per_cell=10).collect()
    got = {(r.id_a, r.id_b, r.dist2) for r in rows}
    assert got == _brute_pairs(ring, 7)  # blob gone, ring intact
    # uncapped: the blob contributes C(50,2) coincident pairs
    full = grid_radius_pairs(df, "id", "x", "y", 7).count()
    assert full == len(got) + 50 * 49 // 2
