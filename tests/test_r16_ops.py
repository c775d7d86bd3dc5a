"""Unit tests for the r16 operator wave: vocabulary richness,
stratified ATE, dispersion index, isotonic calibration (minimax PAV),
MMR rerank — hand-checked values, a classic-PAV cross-check, and
degenerate guards (oracle parity lives in
tests/test_staged_r16_surfaces.py)."""

from __future__ import annotations


# --- Vocabulary richness --------------------------------------------------------


def test_vocab_richness_hand_values(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import vocab_richness

    # tokens: a x3, b x2, c x1, d x1 -> N=7, V=4, f1=2, f2=1
    df = spark.createDataFrame(
        [("a b c",), ("a b a d",)], "text string"
    )
    r = vocab_richness(df, "text").collect()[0]
    assert (r.n_tokens, r.vocab_size, r.f1, r.f2) == (7, 4, 2, 1)
    assert r.chao1_est == 4 + 2  # V + f1^2/(2 f2) = 4 + 2
    assert r.unseen_mass_ppm == 2 * 1_000_000 // 7


def test_vocab_richness_f2_zero_guard(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import vocab_richness

    df = spark.createDataFrame([("x y z",)], "text string")
    r = vocab_richness(df, "text").collect()[0]
    assert r.f2 == 0 and r.chao1_est is None
    assert r.unseen_mass_ppm == 1_000_000  # every token a singleton


# --- Stratified ATE -------------------------------------------------------------


def test_stratified_ate_hand_value_and_support(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import stratified_ate

    rows = (
        # stratum A: treated mean 10, control mean 7 -> diff 3.00
        [("A", 1, 10.0)] * 2 + [("A", 0, 7.0)] * 2
        # stratum B: treated mean 5, control mean 1 -> diff 4.00
        + [("B", 1, 5.0)] * 3 + [("B", 0, 1.0)]
        # stratum C: no controls -> off support, excluded
        + [("C", 1, 100.0)] * 5
    )
    df = spark.createDataFrame(rows, "b string, t long, y double")
    out = {r.bin: r for r in stratified_ate(df, "b", "t", "y").collect()}
    assert out["A"].diff_micro == 3_000_000
    assert out["B"].diff_micro == 4_000_000
    assert out["C"].supported == 0 and out["C"].diff_micro is None
    # ATE = (4*3.00 + 4*4.00) / 8 = 3.50 over the 8 supported units
    assert out["A"].n_supported_units == 8
    assert out["A"].ate_micro == 3_500_000
    assert out["C"].ate_micro == 3_500_000  # readout repeats on every row


def test_stratified_ate_all_off_support_is_null(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import stratified_ate

    df = spark.createDataFrame(
        [("A", 1, 5.0), ("B", 0, 3.0)], "b string, t long, y double"
    )
    rows = stratified_ate(df, "b", "t", "y").collect()
    assert all(r.ate_micro is None for r in rows)
    assert all(r.supported == 0 for r in rows)


# --- Dispersion index -----------------------------------------------------------


def test_dispersion_index_hand_values(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import dispersion_index

    df = spark.createDataFrame(
        [("flat", c) for c in (2, 2, 2)]
        + [("bursty", c) for c in (0, 4)]
        + [("dead", 0), ("dead", 0)],
        "g string, c long",
    )
    out = {r.g: r for r in dispersion_index(df, ["g"], "c").collect()}
    assert out["flat"].fano_ppm == 0 and out["flat"].overdispersed == 0
    # mean 2, population var 4 -> fano 2
    assert out["bursty"].fano_ppm == 2_000_000
    assert out["bursty"].overdispersed == 1
    assert out["dead"].fano_ppm is None and out["dead"].overdispersed is None


# --- Isotonic calibration -------------------------------------------------------


def _classic_pav(bins):
    """Reference pool-adjacent-violators sweep over (n, n_pos) bins."""
    stack = []
    for n, p in bins:
        stack.append([n, p, 1])
        while (
            len(stack) > 1
            and stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):
            n2, p2, c2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
            stack[-1][2] += c2
    out = []
    for n, p, c in stack:
        out += [round(p / n * 1_000_000)] * c
    return out


def test_isotonic_minimax_equals_classic_pav(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_calibration_bins,
    )

    # deliberately NON-monotone bin rates: .1 .6 .2 .5 .05 .9
    spec = [(0, 4), (1, 24), (2, 8), (3, 20), (4, 2), (5, 36)]
    rows = []
    for b, pos in spec:
        for i in range(40):
            rows.append((b * 166667 + 1000 + i, 1 if i < pos else 0))
    df = spark.createDataFrame(rows, "score long, lbl long")
    got = sorted(
        isotonic_calibration_bins(df, "score", "lbl", 6).collect(),
        key=lambda r: r.bin,
    )
    assert [r.iso_rate_ppm for r in got] == _classic_pav(
        [(40, p) for _, p in spec]
    )
    # the violating middle pools to (24+8+20+2)/160 = 0.3375
    assert got[1].iso_rate_ppm == 337_500
    iso = [r.iso_rate_ppm for r in got]
    assert iso == sorted(iso)  # monotone by construction


def test_isotonic_monotone_input_is_identity(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_calibration_bins,
    )

    rows = []
    for b, pos in [(0, 0), (3, 10), (6, 20), (9, 39)]:
        for i in range(40):
            rows.append((b * 100001 + i, 1 if i < pos else 0))
    df = spark.createDataFrame(rows, "score long, lbl long")
    got = sorted(
        isotonic_calibration_bins(df, "score", "lbl", 10).collect(),
        key=lambda r: r.bin,
    )
    for r in got:
        # already-monotone rates: iso == rounded raw rate
        assert r.iso_rate_ppm == round(r.n_pos / r.n * 1_000_000)


# --- MMR rerank -----------------------------------------------------------------


def test_mmr_hand_trace_diversity_beats_relevance(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import mmr_rerank

    cands = spark.createDataFrame(
        [("g", 0, 100, [0]), ("g", 1, 90, [1]), ("g", 2, 80, [10])],
        "q string, d long, rel long, v array<int>",
    )
    rows = sorted(
        mmr_rerank(cands, "q", "d", "rel", "v", 3).collect(),
        key=lambda r: r.sel_round,
    )
    # round 0: best relevance (d0). round 1: d2 wins on diversity
    # (80*.7M + 100*.3M = 86e6 > 90*.7M + 1*.3M = 63.3e6). round 2: d1.
    assert [r.doc for r in rows] == [0, 2, 1]
    assert rows[0].mmr_score == 100 * 700_000
    assert rows[1].mmr_score == 80 * 700_000 + 100 * 300_000
    assert rows[2].mmr_score == 90 * 700_000 + 1 * 300_000


def test_mmr_parallel_queries_and_tie_break(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import mmr_rerank

    rows = []
    for q in ("a", "b", "c"):
        rows += [(q, 10, 50, [0]), (q, 11, 50, [0]), (q, 12, 50, [9])]
    cands = spark.createDataFrame(rows, "q string, d long, rel long, v array<int>")
    out = mmr_rerank(cands, "q", "d", "rel", "v", 2).collect()
    assert len(out) == 6  # every query advanced in the same rounds
    for q in ("a", "b", "c"):
        picks = {r.sel_round: r.doc for r in out if r.query == q}
        assert picks[0] == 10  # relevance tie -> smaller doc id
        assert picks[1] == 12  # then the far point


# --- Community modularity -------------------------------------------------------


def test_modularity_two_triangles_bridge(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import community_modularity

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "u long, v long",
    )
    labels = spark.createDataFrame(
        [(n, 1 if n <= 3 else 4) for n in range(1, 7)], "node long, label long"
    )
    rows = {r.label: r for r in community_modularity(edges, labels).collect()}
    # classic two-triangles-plus-bridge: Q = 70/196
    assert rows[1].modularity_ppm == 357143
    assert rows[1].intra_edges == 3 and rows[1].degree_sum == 7
    assert rows[4].intra_edges == 3 and rows[4].degree_sum == 7


def test_modularity_single_community_is_zero(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import community_modularity

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    labels = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "node long, label long"
    )
    r = community_modularity(edges, labels).collect()[0]
    # everything in one community: L/m = 1, (D/2m)^2 = 1 -> Q = 0
    assert r.modularity_ppm == 0


# --- Simplified silhouette ------------------------------------------------------


def test_silhouette_hand_values(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import simplified_silhouette

    pts = spark.createDataFrame(
        [(0, [0]), (1, [1]), (10, [10]), (11, [11])], "id long, q array<int>"
    )
    cen = spark.createDataFrame([(0, [0]), (1, [10])], "cid long, q array<int>")
    rows = {r.cid: r for r in simplified_silhouette(pts, cen, "id", "q").collect()}
    # cluster 0: s(0)=1.0, s(1)=(9-1)/9 -> mean (1000000+888889) div 2
    assert rows[0].mean_silhouette_ppm == 944444
    # cluster 1: s(10)=1.0, s(11)=(11-1)/11 -> 909091
    assert rows[1].mean_silhouette_ppm == 954545
    assert rows[0].overall_silhouette_ppm == (1000000 + 888889 + 1000000 + 909091) // 4


def test_silhouette_duplicate_centroids_zero(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import simplified_silhouette

    pts = spark.createDataFrame([(0, [5]), (1, [5])], "id long, q array<int>")
    cen = spark.createDataFrame([(0, [5]), (1, [5])], "cid long, q array<int>")
    rows = simplified_silhouette(pts, cen, "id", "q").collect()
    # both centroids on top of the points: b = 0 -> s = 0, assigned to cid 0
    assert len(rows) == 1 and rows[0].cid == 0
    assert rows[0].mean_silhouette_ppm == 0 and rows[0].n_points == 2


def test_silhouette_custom_centroid_columns(spark):
    """ADVICE r11 fix: the centroid frame's columns are parameterized
    (cid_col/centroid_code_col), not hardcoded to cid/q."""
    from dwh_etl_ods_spark_jobs_spark.similarity import simplified_silhouette

    pts = spark.createDataFrame(
        [(0, [0]), (1, [1]), (10, [10]), (11, [11])], "id long, q array<int>"
    )
    cen = spark.createDataFrame(
        [(0, [0]), (1, [10])], "cluster long, center array<int>"
    )
    rows = {
        r.cid: r
        for r in simplified_silhouette(
            pts, cen, "id", "q", cid_col="cluster", centroid_code_col="center"
        ).collect()
    }
    assert rows[0].mean_silhouette_ppm == 944444
    assert rows[1].mean_silhouette_ppm == 954545


def test_isotonic_null_score_bins_dropped_both_engines(spark):
    """ADVICE r11 fix: NULL bins (NULL score) are filtered at operator
    entry on BOTH engines — Spark windows sort NULLs first, DuckDB's
    ORDER BY sorts them last, so a surviving NULL bin would silently
    skew the prefix sums differently per engine."""
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_calibration_bins,
        isotonic_calibration_bins_sql,
    )

    rows = []
    for b, pos in [(0, 4), (1, 24), (2, 8)]:
        for i in range(40):
            rows.append((b * 333334 + 1000 + i, 1 if i < pos else 0))
    rows += [(None, 1), (None, 0), (None, 0)]  # unscored rows
    df = spark.createDataFrame(rows, "score long, lbl long")
    got = sorted(
        map(tuple, isotonic_calibration_bins(df, "score", "lbl", 3).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (score BIGINT, lbl BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                isotonic_calibration_bins_sql("t", "score", "lbl", 3)
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) == 3 and all(r[0] is not None for r in got)
