"""Unit/property tests for the r12-wave operators on hand-built frames
with independently computed expectations (the staged_r12 surface tests
cover engine parity; these pin the math itself on inputs where the
answer is checkable by hand)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- NDCG ------------------------------------------------------------------


def test_ndcg_rerank_reversed_list_matches_hand_formula(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        NDCG_L_MICRO,
        ndcg_rerank,
    )

    # run ranks docs in EXACTLY reversed relevance order: rels 0,1,2,3
    # at run positions 1..4 (scores descending), ideal is 3,2,1,0
    rows = [("q", i, 100 - i, i - 1) for i in range(1, 5)]  # rel 0..3
    df = spark.createDataFrame(rows, "query string, id int, score int, rel int")
    out = ndcg_rerank(df, "query", "id", "score", "rel", k=4).collect()[0]
    dcg = sum(rel * NDCG_L_MICRO[pos] for pos, rel in enumerate([0, 1, 2, 3]))
    idcg = sum(rel * NDCG_L_MICRO[pos] for pos, rel in enumerate([3, 2, 1, 0]))
    assert out.dcg_micro == dcg
    assert out.idcg_micro == idcg
    assert out.ndcg_ppm == dcg * 1_000_000 // idcg
    assert out.ndcg_ppm < 1_000_000  # a reversed list must lose


def test_ndcg_rerank_perfect_and_zero_relevance(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import ndcg_rerank

    rows = [
        ("good", 1, 9, 3), ("good", 2, 8, 2), ("good", 3, 7, 1),
        ("none", 1, 9, 0), ("none", 2, 8, 0),
    ]
    df = spark.createDataFrame(rows, "query string, id int, score int, rel int")
    out = {r.query: r for r in ndcg_rerank(df, "query", "id", "score", "rel").collect()}
    assert out["good"].ndcg_ppm == 1_000_000  # run order == ideal order
    assert out["none"].ndcg_ppm == 0          # zero relevance -> defined 0


def test_ndcg_rerank_counts_ideal_items_outside_topk(spark):
    """A relevant doc the run buried BELOW position k still enters the
    IDEAL side (that is what makes NDCG@k penalize the burial)."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        NDCG_L_MICRO,
        ndcg_rerank,
    )

    # k=2; run order: ids 1,2 (rel 0) then id 3 (rel 3) buried at pos 3
    rows = [("q", 1, 9, 0), ("q", 2, 8, 0), ("q", 3, 7, 3)]
    df = spark.createDataFrame(rows, "query string, id int, score int, rel int")
    out = ndcg_rerank(df, "query", "id", "score", "rel", k=2).collect()[0]
    assert out.n_run == 2
    assert out.dcg_micro == 0
    assert out.idcg_micro == 3 * NDCG_L_MICRO[0]
    assert out.ndcg_ppm == 0


# --- Cohen's kappa ----------------------------------------------------------


def test_cohens_kappa_hand_confusion_matrix(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import cohens_kappa

    # classic 2x2: a=yes 60 (50 agree), a=no 40 (25 agree)
    rows = (
        [("y", "y")] * 50 + [("y", "n")] * 10
        + [("n", "n")] * 25 + [("n", "y")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = cohens_kappa(df, "a", "b").collect()[0]
    assert out.n == 100
    assert out.po_ppm == 750_000
    # marginals: a: y 60/n 40; b: y 65/n 35 -> pe = .6*.65+.4*.35 = .53
    assert out.pe_ppm == 530_000
    assert out.kappa_ppm == (750_000 - 530_000) * 1_000_000 // (1_000_000 - 530_000)


def test_cohens_kappa_perfect_and_disjoint(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import cohens_kappa

    same = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 7, "a string, b string"
    )
    out = cohens_kappa(same, "a", "b").collect()[0]
    assert out.po_ppm == 1_000_000 and out.kappa_ppm == 1_000_000
    # rater b uses labels a never uses: agreement 0, pe 0 -> kappa 0
    disj = spark.createDataFrame(
        [("x", "p"), ("y", "q"), ("x", "q")], "a string, b string"
    )
    out = cohens_kappa(disj, "a", "b").collect()[0]
    assert out.po_ppm == 0 and out.pe_ppm == 0 and out.kappa_ppm == 0


# --- PR threshold sweep -----------------------------------------------------


def test_pr_sweep_two_bins_hand_counts(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pr_threshold_sweep,
    )

    # scores 1..10 unique; labels: positives are scores 6..10 plus 2
    rows = [(s, 1 if (s >= 6 or s == 2) else 0) for s in range(1, 11)]
    df = spark.createDataFrame(rows, "score int, label int")
    out = {
        r.bin: r
        for r in pr_threshold_sweep(df, ["score"], "label", n_bins=2).collect()
    }
    # bin 1 = scores 6..10 (5 rows, 5 pos); bin 0 adds 1..5 (1 pos)
    assert out[1].tp == 5 and out[1].fp == 0 and out[1].fn == 1
    assert out[1].precision_ppm == 1_000_000
    assert out[1].recall_ppm == 5 * 1_000_000 // 6
    assert out[0].tp == 6 and out[0].fp == 4 and out[0].fn == 0
    assert out[0].recall_ppm == 1_000_000
    assert out[0].precision_ppm == 600_000


def test_pr_sweep_from_counts_drops_null_bins(spark):
    """ADVICE r13 fix: a NULL bucket in the mergeable (bin, n, n_pos)
    grid (NULL score upstream of a streaming counter) must not enter
    the descending cumulative fold — its placement under
    Window.orderBy(bin desc) is engine-dependent and would silently
    skew tp/fp/recall. The operator drops NULL bins at entry, the same
    NON-NULL-BIN CONTRACT isotonic_from_counts enforces."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pr_sweep_from_counts,
    )

    clean = [(1, 5, 5), (0, 5, 1)]
    grid = spark.createDataFrame(
        clean + [(None, 3, 2)], "bin int, n long, n_pos long"
    )
    got = sorted(map(tuple, pr_sweep_from_counts(grid).collect()))
    want = sorted(
        map(
            tuple,
            pr_sweep_from_counts(
                spark.createDataFrame(clean, "bin int, n long, n_pos long")
            ).collect(),
        )
    )
    assert got == want
    assert len(got) == 2 and all(r[0] is not None for r in got)
    # the NULL bucket's counts are excluded everywhere, including the
    # all-positives denominator: tp + fn stays at the non-NULL total 6
    assert all(r[1] + r[3] == 6 for r in got)


# --- duplicate n-gram ratio -------------------------------------------------


def test_dup_ngram_ppm_hand_cases(spark):
    from dwh_etl_ods_spark_jobs_spark.text import dup_ngram_ppm

    rows = [
        ("ab", "a b a b a b"),      # 4 trigrams, 2 distinct -> 500000
        ("uniq", "a b c d e"),      # 3 trigrams, all distinct -> 0
        ("short", "a b"),           # < n tokens -> 0
        ("empty", None),            # NULL -> 0
        ("rep", "x x x x"),         # trigrams: xxx, xxx -> 500000
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    got = {
        r.k: r.rep
        for r in df.select("k", dup_ngram_ppm(F.col("text")).alias("rep")).collect()
    }
    assert got == {"ab": 500_000, "uniq": 0, "short": 0, "empty": 0, "rep": 500_000}


# --- corr matrix ------------------------------------------------------------


def test_corr_matrix_known_correlations(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import corr_matrix

    rows = [(i, 2 * i, -3 * i, 7) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "x long, y long, z long, w long")
    out = {(r.col_a, r.col_b): r for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")].corr_6 == 1.0
    assert out[("x", "z")].corr_6 == -1.0
    assert out[("y", "z")].corr_6 == -1.0
    assert all(r.n == 20 for r in out.values())


# --- count-min join size ----------------------------------------------------


def test_countmin_join_size_exact_side_and_overcount(spark):
    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_join_size

    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3]], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 4]], "k long"
    )
    out = countmin_join_size(left, right, "k").collect()[0]
    # exact: 3*1 + 2*2 = 7 (key 3 and 4 unmatched)
    assert out.exact_size == 7
    assert out.est_size >= out.exact_size  # CM never undercounts
    assert out.err_ppm >= 0


def test_countmin_join_size_empty_intersection(spark):
    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_join_size

    left = spark.createDataFrame([(1,), (2,)], "k long")
    right = spark.createDataFrame([(3,), (4,)], "k long")
    out = countmin_join_size(left, right, "k").collect()[0]
    assert out.exact_size == 0 and out.err_ppm == 0
    # a CM row with no overlapping cells contributes ip=0 to the min:
    # est_size is a real number (>= 0), never NULL
    assert out.est_size is not None and out.est_size >= 0


def test_countmin_join_size_disjoint_collision_free_is_zero(spark):
    """With key sets whose CM cells happen not to collide on some row,
    the min-of-inner-products must see that row's 0 — est_size == 0
    exactly (the pre-fix inner join dropped the row and returned the
    min of the OVERLAPPING rows only, overstating)."""
    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_join_size

    left = spark.createDataFrame([(10,)], "k long")
    right = spark.createDataFrame([(20,)], "k long")
    out = countmin_join_size(left, right, "k").collect()[0]
    assert out.exact_size == 0
    # single-key sides: any row where h_r(10) != h_r(20) has ip 0;
    # with 4 independent rows a full 4-row collision is vanishingly
    # unlikely, and the estimator must then report exactly 0
    assert out.est_size == 0


# --- edit-distance-1 linkage ------------------------------------------------


def _brute_ed1_pairs(names: list[str]) -> int:
    def lev1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        # a shorter by one: must equal b minus one char
        return any(b[:i] + b[i + 1 :] == a for i in range(lb))

    uniq = sorted(set(names))
    return sum(
        1
        for i, x in enumerate(uniq)
        for y in uniq[i + 1 :]
        if lev1(x, y) and x != y
    )


def test_edit1_linkage_census_matches_brute_force(spark):
    from dwh_etl_ods_spark_jobs_spark.dedup import edit1_linkage_census

    names = [
        "abc", "abd", "ab", "abcd", "xyz", "abc",  # abc twice
        "hello", "hallo", "hell", "shell", "",
    ]
    rows = [(n,) for n in names] + [(None,)]
    df = spark.createDataFrame(rows, "name string")
    out = edit1_linkage_census(df, "name").collect()[0]
    non_null = [n for n in names]
    assert out.n_records == len(non_null)
    assert out.n_names == len(set(non_null))
    assert out.dup_name_groups == 1  # only "abc" repeats
    assert out.ed0_record_pairs == 1  # C(2,2 copies of abc)=1
    assert out.ed1_name_pairs == _brute_ed1_pairs(non_null)
    # record pairs: multiplicity-weighted; abc appears twice so every
    # ed1 partner of abc counts twice
    abc_partners = sum(
        1 for n in set(non_null) if n != "abc" and _brute_ed1_pairs(["abc", n]) == 1
    )
    assert out.ed1_record_pairs == out.ed1_name_pairs + abc_partners


def test_edit1_deletion_neighborhood_is_complete_radius1(spark):
    """Property: for EVERY pair of distinct names at levenshtein ≤ 1,
    the deletion-neighborhood join must produce it — cross-check the
    census pair count against brute force on a varied name pool."""
    from dwh_etl_ods_spark_jobs_spark.dedup import edit1_linkage_census

    pool = [
        "spark", "spork", "spar", "sparks", "stark", "shark",
        "park", "parks", "mark", "marks", "arks", "ark",
        "a", "b", "", "ab", "ba", "aa", "bb",
    ]
    df = spark.createDataFrame([(n,) for n in pool], "name string")
    out = edit1_linkage_census(df, "name").collect()[0]
    assert out.ed1_name_pairs == _brute_ed1_pairs(pool)


# --- Zipf alpha -------------------------------------------------------------


def test_zipf_alpha_recovers_power_law_exponent(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import zipf_alpha

    # exact power law cnt = round(1e6 / r^1.2): fitted alpha ~ 1.2
    rows = [
        ("g", round(1_000_000 / (r ** 1.2)), f"t{r:04d}") for r in range(1, 65)
    ]
    df = spark.createDataFrame(rows, "source string, cnt long, term string")
    out = zipf_alpha(df, ["source"], "cnt", head_k=64).collect()[0]
    assert out.n_points == 64
    assert 1.15 <= out.alpha_6 <= 1.25
    # and a flat (non-Zipfian) vocab fits ~0
    flat = spark.createDataFrame(
        [("g", 100, f"t{r:04d}") for r in range(1, 65)],
        "source string, cnt long, term string",
    )
    out = zipf_alpha(flat, ["source"], "cnt", head_k=64).collect()[0]
    assert abs(out.alpha_6) < 0.01


# --- quantile band coverage -------------------------------------------------


def test_quantile_coverage_uniform_band(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        quantile_coverage_eval,
    )

    rows = [("g", v, v) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v long, tie long")
    out = quantile_coverage_eval(df, ["g"], ["v", "tie"]).collect()[0]
    # first-crossing weighted quantiles on 1..100: q10=10, q90=90
    assert out.band_lo == 10 and out.band_hi == 90
    assert out.n == 100 and out.n_inside == 81
    assert out.coverage_ppm == 810_000


def test_cohens_kappa_degenerate_single_label_is_null(spark):
    """Both raters emitting one identical label: po = pe = 1 and kappa is
    0/0 — both engines return NULL (Spark `div 0` == DuckDB `// 0`), so
    the degenerate case is consistent, not divergent."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import cohens_kappa

    df = spark.createDataFrame([("x", "x")] * 9, "a string, b string")
    out = cohens_kappa(df, "a", "b").collect()[0]
    assert out.po_ppm == 1_000_000 and out.pe_ppm == 1_000_000
    assert out.kappa_ppm is None
