"""Property tests for the r11-staged wave (beyond oracle parity):
AUC identities, calibration bin structure, weighted-Jaccard identity/
disjoint cases, OHLC tie determinism, nearest-join tie/tolerance rules,
FD census on a clean FD, bootstrap layout-invariance, and BFS distances
on a handcrafted graph."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_auc_perfect_separation_and_ties(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        auc_mann_whitney,
    )

    # perfect separation: every positive scores above every negative
    rows = [(i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "s long, y long")
    r = auc_mann_whitney(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_ppm) == (50, 50, 1_000_000)
    # all-tied scores: AUC is exactly 1/2 (midrank correction)
    df2 = spark.createDataFrame([(7, i % 2) for i in range(100)], "s long, y long")
    r2 = auc_mann_whitney(df2, "s", "y").collect()[0]
    assert (r2.n_scores, r2.auc_ppm) == (1, 500_000)
    # anti-predictive score: AUC == 0
    rows3 = [(100 - i, 1 if i >= 50 else 0) for i in range(100)]
    r3 = auc_mann_whitney(
        spark.createDataFrame(rows3, "s long, y long"), "s", "y"
    ).collect()[0]
    assert r3.auc_ppm == 0


def test_auc_layout_invariant(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        auc_mann_whitney,
    )

    rows = [((i * 37) % 23, 1 if (i * 13) % 3 == 0 else 0) for i in range(500)]
    df = spark.createDataFrame(rows, "s long, y long")
    a = auc_mann_whitney(df, "s", "y").collect()[0]
    b = auc_mann_whitney(df.repartition(13), "s", "y", n_ranges=7).collect()[0]
    assert tuple(a) == tuple(b)


def test_calibration_bin_structure(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        calibration_bins,
    )

    rows = [(i, i, 1 if i % 3 == 0 else 0) for i in range(103)]
    df = spark.createDataFrame(rows, "s long, k long, y long")
    out = calibration_bins(df, ["s", "k"], "y", n_bins=10).collect()
    sizes = {r.bin: r.n for r in out}
    assert sum(sizes.values()) == 103
    assert max(sizes.values()) - min(sizes.values()) <= 1  # equal-frequency
    for r in out:
        assert 0 <= r.pos_rate_ppm <= 1_000_000
        assert r.score_lo <= r.score_hi
    # bins ordered by score: lo of bin b+1 > hi of bin b
    ordered = sorted(out, key=lambda r: r.bin)
    for lo, hi in zip(ordered[1:], ordered[:-1]):
        assert lo.score_lo > hi.score_hi


def test_weighted_jaccard_identity_and_disjoint(spark):
    from dwh_etl_ods_spark_jobs_spark.dedup import weighted_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # identical -> 1.0
            (3, "one two three four five six seven"),    # disjoint
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.jw_ppm
        for r in weighted_jaccard_pairs(
            docs, "text", "doc_id", threshold_ppm=1
        ).collect()
    }
    assert pairs[(1, 2)] == 1_000_000
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ohlc_composite_tiebreak(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import ohlc_agg

    rows = [
        ("a", 10, 2, 300),  # same ts as the next row: id decides open
        ("a", 10, 1, 100),
        ("a", 20, 3, 900),
        ("a", 20, 4, 50),   # same ts: id=4 is close
    ]
    df = spark.createDataFrame(rows, "k string, t long, id long, v long")
    r = ohlc_agg(df, ["k"], "t", "id", "v").collect()[0]
    assert (r.n, r.open_v, r.high_v, r.low_v, r.close_v) == (4, 100, 900, 50, 50)


def test_nearest_event_join_rules(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        nearest_event_join,
    )

    needles = spark.createDataFrame(
        [(1, 100, 10), (1, 500, 11), (2, 100, 12)],
        "u long, ts long, id long",
    )
    hay = spark.createDataFrame(
        [(1, 90, 20), (1, 110, 21), (1, 5000, 22)],
        "u long, ts long, id long",
    )
    out = {
        r.needle_id: (r.matched_id, r.dist)
        for r in nearest_event_join(
            needles, hay, ["u"], "ts", "id", tolerance=50
        ).collect()
    }
    # equidistant (10 before vs 10 after): earlier (backward) wins
    assert out[10] == (20, 10)
    # nearest hay (5000) is beyond tolerance on both sides -> NULL
    assert out[11] == (None, None)
    # user 2 has no hay at all -> NULL
    assert out[12] == (None, None)


def test_fd_census_clean_dependency(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.quality import fd_violations

    rows = [(i, i % 5, (i % 5) * 10, i % 3) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    out = {r.fd: r for r in fd_violations(df, [(["a"], "b"), (["a"], "c")]).collect()}
    clean = out["a->b"]  # b is a function of a
    assert (clean.n_violating_groups, clean.n_violating_rows) == (0, 0)
    assert clean.max_distinct_rhs == 1
    dirty = out["a->c"]
    assert dirty.n_violating_groups == 5
    assert dirty.n_violating_rows == 100


def test_bootstrap_layout_invariant_and_band_contains_mean(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import poisson_bootstrap_ci

    rows = [(i, 1000 + (i * 37) % 500) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = poisson_bootstrap_ci(df, "id", "v").collect()[0]
    b = poisson_bootstrap_ci(df.repartition(17), "id", "v").collect()[0]
    assert tuple(a) == tuple(b)  # hash weights: layout cannot perturb
    assert a.n_replicates == 40
    assert a.mean_lo <= a.mean_all <= a.mean_hi


def test_bfs_hops_handcrafted(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import bfs_hops

    # path 0-1-2-3-4 plus isolated 9; symmetrize
    base = [(0, 1), (1, 2), (2, 3), (3, 4), (8, 9)]
    edges = spark.createDataFrame(
        base + [(b, a) for a, b in base], "src long, dst long"
    )
    sources = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, sources, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 beyond budget; 8/9 unreachable


def test_pair_distance_histogram_layout_invariant(spark, sf_dir):
    from dwh_etl_ods_spark_jobs_spark.similarity import pair_distance_histogram

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(
        (r.bucket_lo, r.n)
        for r in pair_distance_histogram(emb, "vec_id", "embedding").collect()
    )
    b = sorted(
        (r.bucket_lo, r.n)
        for r in pair_distance_histogram(
            emb.repartition(11), "vec_id", "embedding"
        ).collect()
    )
    assert a == b
    assert sum(n for _, n in a) > 0


# --- r11 ADVICE regression pins ----------------------------------------------


def test_weighted_jaccard_all_zero_idf_pair_is_dropped_not_div0(spark):
    """Corpus of exactly 2 identical docs: every shared shingle has
    df == n_docs, so idf == 0 and wa + wb - w_inter == 0 — Spark 4
    ANSI `div 0` used to THROW here while the DuckDB oracle nulled.
    The guard makes both engines emit NULL, which the threshold
    filter then drops."""
    from dwh_etl_ods_spark_jobs_spark.dedup import weighted_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "alpha beta gamma delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    got = weighted_jaccard_pairs(docs, "text", "doc_id", threshold_ppm=1).collect()
    assert got == []  # degenerate pair: similarity undefined, no throw


def test_weighted_jaccard_all_zero_idf_oracle_agrees(spark, sf_dir):
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.dedup import weighted_jaccard_pairs_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW twins AS SELECT * FROM (VALUES"
        " (1, 'alpha beta gamma delta epsilon zeta eta'),"
        " (2, 'alpha beta gamma delta epsilon zeta eta'))"
        " t(doc_id, text)"
    )
    sql = weighted_jaccard_pairs_sql("twins", "text", "doc_id", threshold_ppm=1)
    assert con.execute(sql).df().empty


def test_minhash_estimate_eval_zero_candidates_explicit(spark):
    """No banding candidates (fully dissimilar corpus at a high
    threshold) must emit (0, 0, 0) — explicit values, not the
    NULL-div-0 fold."""
    from dwh_etl_ods_spark_jobs_spark.dedup import minhash_estimate_eval

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "red orange yellow green blue indigo violet pink"),
        ],
        "doc_id long, text string",
    )
    r = minhash_estimate_eval(docs, "text", "doc_id", threshold=0.95).collect()[0]
    assert (r.n_pairs, r.mean_abs_err_ppm, r.max_abs_err_ppm) == (0, 0, 0)


def test_ndcg_rerank_rejects_k_past_weight_table(spark):
    import pytest as _pytest

    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        NDCG_L_MICRO,
        ndcg_rerank,
        ndcg_rerank_sql,
    )

    df = spark.createDataFrame(
        [("q1", 1, 0.9, 2)], "q string, id long, score double, rel long"
    )
    with _pytest.raises(ValueError, match="NDCG_L_MICRO"):
        ndcg_rerank(df, "q", "id", "score", "rel", k=len(NDCG_L_MICRO) + 1)
    with _pytest.raises(ValueError, match="NDCG_L_MICRO"):
        ndcg_rerank_sql("t", "q", "id", "score", "rel", k=len(NDCG_L_MICRO) + 1)
    # the full table is still a legal k
    assert ndcg_rerank(df, "q", "id", "score", "rel", k=len(NDCG_L_MICRO))
