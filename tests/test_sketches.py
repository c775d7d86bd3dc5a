"""Sketch operators: HLL accuracy, count-min upper-bound property, plan
shapes (sketch probes must broadcast the tiny grid side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import sketches as SK


def test_hll_estimate_tracks_exact_distinct(spark):
    # 3 groups with very different cardinalities; m=4096 registers keeps
    # all three in the (near-exact) linear-counting regime, and the
    # relative error bound 1.04/sqrt(m) ~ 1.6% covers the raw regime too.
    rows = [(g, f"u{g}-{i % n}") for g, n in [("a", 10), ("b", 700), ("c", 3000)]
            for i in range(2 * n)]
    df = spark.createDataFrame(rows, "grp string, user string")
    out = {r["grp"]: r for r in df.transform(SK.hll_distinct(["grp"], "user")).collect()}
    for grp, n in [("a", 10), ("b", 700), ("c", 3000)]:
        assert out[grp].est_distinct == pytest.approx(n, rel=0.05)
    # duplicates must not move the estimate: HLL is insensitive to repeats
    dup = df.union(df).transform(SK.hll_distinct(["grp"], "user")).collect()
    assert {r["grp"]: r.est_distinct for r in dup} == {
        g: r.est_distinct for g, r in out.items()
    }


def test_hll_register_fold_is_single_aggregation_pair(spark):
    df = spark.createDataFrame([("a", "x")], "grp string, user string")
    plan = (
        df.transform(SK.hll_distinct(["grp"], "user"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two HashAggregate pairs (register max, group fold) and nothing else —
    # no sort, no join, no window
    assert "SortAggregate" not in plan
    assert "Join" not in plan


def test_countmin_never_underestimates(spark):
    rows = [(f"k{i % 50}",) for i in range(5000)] + [("hot",)] * 400
    df = spark.createDataFrame(rows, "k string")
    sketch = SK.countmin_counts(df, "k")
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = SK.countmin_estimate(sketch, exact.select("k"), "k")
    joined = exact.join(est, "k").collect()
    assert len(joined) == 51
    for r in joined:
        assert r.cm_estimate >= r.exact
    # 51 keys across 4x1024 cells: collisions are possible but the hot
    # key's estimate must still be dominated by its own mass
    hot = {r.k: r for r in joined}["hot"]
    assert hot.exact == 400 and hot.cm_estimate < 600


def test_countmin_sketch_is_bounded_and_probe_broadcasts(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "k string")
    sketch = SK.countmin_counts(df, "k")
    assert sketch.count() <= SK.CM_DEPTH * SK.CM_WIDTH
    est = SK.countmin_estimate(sketch, df.limit(5), "k")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id long, s string"
    )
    out = {r.col_name: r for r in df.transform(
        SK.profile_columns(["id", "s"])
    ).collect()}
    assert (out["id"].n_rows, out["id"].n_null) == (4, 0)
    assert (out["s"].n_rows, out["s"].n_null) == (4, 1)
    assert out["id"].est_distinct == pytest.approx(4, rel=0.01)
    assert out["s"].est_distinct == pytest.approx(2, rel=0.01)


def test_profile_all_null_column_reports_zero_distinct(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    out = {r.col_name: r for r in df.transform(SK.profile_columns(["s"])).collect()}
    assert (out["s"].n_null, out["s"].est_distinct) == (2, 0.0)


def test_bloom_no_false_negatives_and_bounded_bits(spark):
    members = spark.createDataFrame([(f"m{i}",) for i in range(500)], "k string")
    others = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "k string")
    bits = SK.bloom_build(members, "k")
    assert bits.count() <= min(500 * SK.BLOOM_K, SK.BLOOM_BITS)
    # every true member must survive the filter (no false negatives)
    kept_members = SK.bloom_filter_keys(members, bits, "k").count()
    assert kept_members == 500
    # non-members are mostly rejected; FP rate at 500*4/65536 load ~ (0.03)^4
    kept_others = SK.bloom_filter_keys(others, bits, "k").count()
    assert kept_others < 50


def test_bloom_filter_preserves_payload_rows(spark):
    members = spark.createDataFrame([("a",), ("b",)], "k string")
    probe = spark.createDataFrame(
        [("a", 1), ("a", 2), ("zzz", 3)], "k string, payload int"
    )
    bits = SK.bloom_build(members, "k")
    out = SK.bloom_filter_keys(probe, bits, "k").collect()
    assert sorted((r.k, r.payload) for r in out if r.k == "a") == [("a", 1), ("a", 2)]


def test_countmin_absent_key_reports_zero_or_collision_floor(spark):
    """Probing keys NOT in the stream: a key with any empty cell answers
    0 (left-join semantics — an inner join would inflate or drop it);
    a fully-collided key answers the collision mass, never a missing row."""
    df = spark.createDataFrame([("present",)] * 10, "k string")
    sketch = SK.countmin_counts(df, "k")
    probes = spark.createDataFrame(
        [("present",), ("absent-1",), ("absent-2",), ("absent-3",)], "k string"
    )
    out = {r.k: r.cm_estimate for r in SK.countmin_estimate(sketch, probes, "k").collect()}
    assert set(out) == {"present", "absent-1", "absent-2", "absent-3"}
    assert out["present"] == 10
    # with one key occupying 4 of 4096 cells, an absent key almost surely
    # misses at least one cell -> exact 0 (and never > the full mass)
    for k in ("absent-1", "absent-2", "absent-3"):
        assert out[k] == 0


def test_hdr_quantiles_within_relative_error_of_exact(spark):
    # deterministic skewed values spanning 5 orders of magnitude
    vals = [(i % 3, (i * i * 37 + i) % 100_000 + 1) for i in range(4000)]
    df = spark.createDataFrame(vals, "g int, v long")
    hist = df.transform(SK.hdr_histogram(["g"], "v"))
    got = {
        (r.g, r.quantile): r.approx_value
        for r in SK.hdr_quantiles(
            hist, ["g"], [("p50", 50, 100), ("p99", 99, 100)]
        ).collect()
    }
    import math

    by_g: dict[int, list[int]] = {}
    for g, v in vals:
        by_g.setdefault(g, []).append(v)
    rel = 2.0 ** -(SK.QH_SIG_BITS - 1)
    for g, xs in by_g.items():
        xs.sort()
        for lbl, q in (("p50", 0.50), ("p99", 0.99)):
            exact = xs[math.ceil(q * len(xs)) - 1]
            approx = got[(g, lbl)]
            # bucket lower bound: under-estimates only, by <= rel error
            assert approx <= exact
            assert exact - approx <= rel * exact + 1


def test_hdr_histogram_is_mergeable_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, (i * 7919) % 1_000_000 + 1) for i in range(3000)], "g int, v long"
    )
    whole = df.transform(SK.hdr_histogram(["g"], "v"))
    # split -> histogram each half -> add counts == histogram of the whole
    h1 = df.filter(F.col("v") % 2 == 0).transform(SK.hdr_histogram(["g"], "v"))
    h2 = df.filter(F.col("v") % 2 == 1).transform(SK.hdr_histogram(["g"], "v"))
    folded = (
        h1.unionAll(h2)
        .groupBy("g", "bucket_lo")
        .agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, whole.collect()))
    # bounded: top-6-bit buckets over a 20-bit range -> well under 2k
    assert whole.count() < 2000


def test_hdr_histogram_zero_and_small_values_are_exact(spark):
    # v < 2^QH_SIG_BITS keeps ALL its bits: bucket_lo == v, error 0
    df = spark.createDataFrame([(1, v) for v in (0, 1, 2, 63)], "g int, v long")
    hist = {r.bucket_lo: r.n for r in df.transform(SK.hdr_histogram(["g"], "v")).collect()}
    assert hist == {0: 1, 1: 1, 2: 1, 63: 1}


def test_hll_set_algebra_union_is_bit_identical_to_merged_sketch(spark):
    """The subtraction trick (shared-register join + per-set totals) must
    reproduce EXACTLY the estimate of physically max-merging the two
    sets' registers — i.e. hll_distinct over the concatenated rows."""
    from dwh_etl_ods_spark_jobs_spark import sketches as SK
    from pyspark.sql import functions as F

    rows = [("A", f"u{i}") for i in range(900)] + [
        ("B", f"u{i + 600}") for i in range(900)  # overlap u600..u899 (300)
    ]
    df = spark.createDataFrame(rows, "s string, v string")
    pair = SK.hll_set_algebra(df, "s", "v").collect()[0]

    merged = (
        df.select(F.lit("all").alias("g"), "v")
        .transform(SK.hll_distinct(["g"], "v"))
        .collect()[0]
    )
    assert pair.est_union == merged.est_distinct  # bit-identical, not approx

    # and the estimates are actually good (true: |A|=|B|=900, |A∪B|=1500,
    # |A∩B|=300, J=0.2); HLL at p=12 is ~1.6% rel. error
    assert pair.est_a == pytest.approx(900, rel=0.05)
    assert pair.est_b == pytest.approx(900, rel=0.05)
    assert pair.est_union == pytest.approx(1500, rel=0.05)
    assert pair.est_intersect == pytest.approx(300, rel=0.20)
    assert pair.jaccard_micro == pytest.approx(200_000, rel=0.20)


def test_hll_set_algebra_all_pairs_and_disjoint_clamp(spark):
    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    rows = (
        [("A", f"a{i}") for i in range(400)]
        + [("B", f"a{i}") for i in range(400)]          # B == A
        + [("C", f"c{i}") for i in range(400)]           # C disjoint
    )
    df = spark.createDataFrame(rows, "s string, v string")
    out = {(r.set_a, r.set_b): r for r in SK.hll_set_algebra(df, "s", "v").collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab.est_union == ab.est_a == ab.est_b  # identical sets
    assert ab.jaccard_micro == 1_000_000
    for k in (("A", "C"), ("B", "C")):
        assert out[k].est_intersect >= 0.0  # clamped, never negative
        assert out[k].jaccard_micro < 150_000


def test_hdr_percentile_calibrate_tracks_exact_percent_rank(spark):
    """pct_micro must equal the exact fraction-strictly-below for values
    in distinct buckets, and stay within the histogram's bucket error in
    general; every input row survives with its payload."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    # geometric spread -> each value lands in its own bucket
    vals = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    df = spark.createDataFrame(
        [("g", v, f"p{v}") for v in vals], "g string, v long, payload string"
    )
    out = {r.v: r for r in SK.hdr_percentile_calibrate(df, ["g"], "v").collect()}
    assert len(out) == len(vals)
    for i, v in enumerate(sorted(vals)):
        assert out[v].pct_micro == (i * 1_000_000) // len(vals), v
        assert out[v].payload == f"p{v}"

    # dense integers share buckets above 2^sig_bits: pct is a lower bound
    # within one bucket width and monotone across buckets
    dense = spark.createDataFrame(
        [("g", v) for v in range(1, 2001)], "g string, v long"
    )
    got = SK.hdr_percentile_calibrate(dense, ["g"], "v")
    rows = got.groupBy("v").agg(F.max("pct_micro").alias("p")).collect()
    by_v = {r.v: r.p for r in rows}
    assert by_v[1] == 0
    assert 400_000 <= by_v[1000] <= 500_000   # true rank ~0.4995
    assert 950_000 <= by_v[1999] <= 999_500
    mono = sorted(by_v.items())
    assert all(a[1] <= b[1] for a, b in zip(mono, mono[1:]))


def test_hdr_percentile_calibrate_is_broadcast_join(spark):
    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    df = spark.range(10_000).selectExpr("'g' AS g", "id AS v")
    plan = (
        SK.hdr_percentile_calibrate(df, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_staged_operators_hash_match_duckdb(spark):
    """The two r8-staged operators already hash-match their DuckDB
    renderings over the same rows — battery registration in r8 is then a
    pure wiring step."""
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    rows = [("A", f"u{i}") for i in range(700)] + [
        ("B", f"u{i + 400}") for i in range(700)
    ] + [("C", f"w{i}" if i % 3 else f"u{i}") for i in range(500)]
    pdf = pd.DataFrame(rows, columns=["s", "v"])
    con = duckdb.connect()
    con.register("t", pdf)

    sdf = (
        SK.hll_set_algebra(
            spark.createDataFrame(pdf, "s string, v string"), "s", "v"
        )
        .toPandas()
        .sort_values(["set_a", "set_b"])
        .reset_index(drop=True)
    )
    ddf = (
        con.execute(SK.hll_set_algebra_sql("t", "s", "v"))
        .df()
        .sort_values(["set_a", "set_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sdf, ddf.astype(sdf.dtypes.to_dict()))

    vals = pd.DataFrame(
        [("g", (7 * i * i + 3) % 5000 + 1) for i in range(2000)],
        columns=["g", "x"],
    )
    con.register("vals", vals)
    s2 = (
        SK.hdr_percentile_calibrate(
            spark.createDataFrame(vals, "g string, x long"), ["g"], "x"
        )
        .selectExpr("g", "x AS v", "pct_micro")
        .toPandas()
        .sort_values(["g", "v", "pct_micro"])
        .reset_index(drop=True)
    )
    d2 = (
        con.execute(SK.hdr_percentile_calibrate_sql("vals", ["g"], "x"))
        .df()
        .sort_values(["g", "v", "pct_micro"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(s2, d2.astype(s2.dtypes.to_dict()))


def test_hdr_distribution_drift_zero_for_identical_and_positive_for_shift(spark):
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_distribution_drift

    base = spark.range(5000).selectExpr("(id % 997) * 100 AS v")
    r0 = hdr_distribution_drift(base, base, "v").collect()[0]
    assert (r0.n_old, r0.n_new, r0.tvd_ppm) == (5000, 5000, 0)

    shifted = spark.range(5000).selectExpr("((id % 997) * 100) * 3 AS v")
    r1 = hdr_distribution_drift(base, shifted, "v").collect()[0]
    assert r1.tvd_ppm > 500_000  # 3x scale moves most mass across buckets

    # mild drift: 20% of rows shifted -> small but nonzero
    mild = spark.range(5000).selectExpr(
        "CASE WHEN id % 5 = 0 THEN (id % 997) * 260 ELSE (id % 997) * 100 END AS v"
    )
    r2 = hdr_distribution_drift(base, mild, "v").collect()[0]
    assert 0 < r2.tvd_ppm < r1.tvd_ppm


def test_hdr_distribution_drift_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.sketches import (
        hdr_distribution_drift,
        hdr_distribution_drift_sql,
    )

    old = pd.DataFrame({"v": [(i % 37) * 50 for i in range(800)]})
    new = pd.DataFrame({"v": [(i % 41) * 70 for i in range(1100)]})
    got = hdr_distribution_drift(
        spark.createDataFrame(old), spark.createDataFrame(new), "v"
    ).collect()[0]
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    duck = con.execute(
        hdr_distribution_drift_sql("SELECT v FROM o", "SELECT v FROM n", "v")
    ).fetchone()
    assert (got.n_old, got.n_new, got.n_buckets, got.tvd_ppm) == duck


def test_wasserstein_sees_shift_distance_tvd_does_not(spark):
    """Two shifted copies with equal TVD but different shift magnitude:
    W1 must rank the far shift higher; identical inputs -> 0."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_wasserstein_drift

    base = spark.range(2000).select((F.col("id") % 100 + 100).alias("v"))
    near = spark.range(2000).select((F.col("id") % 100 + 228).alias("v"))
    far = spark.range(2000).select((F.col("id") % 100 + 5100).alias("v"))

    zero = hdr_wasserstein_drift(base, base, "v").collect()[0]
    assert zero.emd_ppm_units == 0 and zero.n_old == 2000

    w_near = hdr_wasserstein_drift(base, near, "v").collect()[0].emd_ppm_units
    w_far = hdr_wasserstein_drift(base, far, "v").collect()[0].emd_ppm_units
    assert 0 < w_near < w_far


def test_hdr_ks_drift_known_shift(spark):
    """Identical distributions -> ks_ppm == 0; a disjoint shift -> the
    full mass gap (1e6) at some bucket boundary."""
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_ks_drift

    a = spark.range(1, 1001).selectExpr("id AS v")
    same = hdr_ks_drift(a, a, "v").collect()[0]
    assert same.ks_ppm == 0 and same.n_old == 1000 == same.n_new
    b = spark.range(1, 1001).selectExpr("id + 1000000 AS v")
    far = hdr_ks_drift(a, b, "v").collect()[0]
    assert far.ks_ppm == 1000000
