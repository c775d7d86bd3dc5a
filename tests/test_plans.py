"""Physical-plan shape tests: the scale properties SURVEY.md §4 and the
build brief promise (filter/column pushdown to the scan, broadcast of small
dims, map-side partial aggregation, whole-stage codegen) are asserted
against ``explain`` output so regressions that silently de-optimize plans
fail CI, not the 100 TB run."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    q = li.filter(F.col("l_quantity") > 49).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan
    # ReadSchema must carry only the two projected columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_lookup_fold_broadcasts_small_dim(spark, sf_dir):
    from dwh_etl_ods_spark_jobs_spark.operators import lookup_fold

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).withColumn(
        "nk", F.col("c_nationkey").cast("string")
    )
    lkp = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        F.col("n_nationkey").cast("string").alias("source_name"),
        F.col("n_name").alias("target_name"),
    )
    plan = _plan(cust.transform(lookup_fold("nk", lkp)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_join_is_hash_join_not_cartesian(spark, sf_dir):
    from dwh_etl_ods_spark_jobs_spark.operators import anti_join_new

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    tgt = orders.select("o_orderkey", "o_custkey").limit(100)
    plan = _plan(orders.transform(anti_join_new(tgt, ["o_orderkey", "o_custkey"])))
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_aggregation_has_partial_phase_and_codegen(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _plan(q)
    # map-side combine: a partial HashAggregate before the exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    # codegen explain mode reports the compiled subtrees; under AQE they only
    # exist after execution, so run the query first
    q.collect()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    codegen = q._jdf.queryExecution().explainString(mode)
    assert "Found" in codegen and "WholeStageCodegen subtree" in codegen
    assert "Found 0 WholeStageCodegen" not in codegen


def test_text_operators_stay_jvm_side(spark, sf_dir):
    """No BatchEvalPython / ArrowEvalPython in the text-analysis plans —
    the hot path must be pure Catalyst expressions."""
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import (
        q_text_quality,
        q_text_stats,
    )

    for q in (q_text_stats, q_text_quality):
        plan = _plan(q(spark, sf_dir))
        assert "EvalPython" not in plan, "Python UDF leaked into a text operator"


def test_multimodal_uses_arrow_batching(spark, sf_dir):
    """The multimodal decode IS the sanctioned Python boundary — but it must
    be Arrow-batched mapInPandas, not row-at-a-time BatchEvalPython."""
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import q_multimodal_meta

    plan = _plan(q_multimodal_meta(spark, sf_dir))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_minhash_aggregation_is_single_pass(spark, sf_dir):
    """The MinHash signature plan must contain exactly one shuffle
    (the groupBy) over the exploded shingle stream, with a partial phase."""
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import _corpus

    sigs = D.minhash_signatures(_corpus(spark, sf_dir), "text", "doc_id")
    plan = _plan(sigs)
    assert "partial_min" in plan
    # one exchange for the repartition spread + one for the groupBy — but no
    # join-induced exchanges
    assert "Join" not in plan


def test_filter_pipeline_is_single_scan_window(spark, sf_dir):
    """Survivor selection must be a window over the scored frame — ONE
    parquet scan, ONE shuffle, NO self-join. The groupBy+join-back form
    evaluates the regex-heavy scoring chain once per join branch whenever
    exchange reuse fails (the r4 10x regression)."""
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import q_filter_pipeline

    plan = _plan(q_filter_pipeline(spark, sf_dir))
    assert "Join" not in plan, "survivor selection regressed to a self-join"
    assert "Window" in plan
    # formatted explain lists each scan node twice (tree + details)
    assert plan.count("Scan parquet") <= 2, "scoring chain scanned twice"


def test_top_tokens_is_take_ordered(spark, sf_dir):
    """Global top-k must plan as TakeOrderedAndProject (partitions ship
    their local top-k), never a full global Sort."""
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import q_text_top_tokens

    plan = _plan(q_text_top_tokens(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_retention_cohorts_semantics(spark, tmp_path):
    """A user's cohort is their first active month; offsets count months
    since, distinct per user regardless of event volume."""
    import datetime as dt

    rows = [
        # user 1: jan + mar -> offsets 0 and 2
        (1, dt.datetime(2024, 1, 5), 10),
        (1, dt.datetime(2024, 1, 20), 11),   # same month, still one unit
        (1, dt.datetime(2024, 3, 2), 12),
        # user 2: feb only -> offset 0
        (2, dt.datetime(2024, 2, 14), 13),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    df.write.parquet(str(tmp_path / "events.parquet"))
    from dwh_etl_ods_spark_jobs_spark.plans.coverage import q_retention

    out = {
        (r.cohort_month.isoformat(), r.month_offset): r.n_users
        for r in q_retention(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-02-01", 0): 1,
    }


def test_funnel_requires_strict_temporal_order(spark, tmp_path):
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1 completes in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2 clicks BEFORE viewing: stops at step 1
        (2, t(2), "view"), (2, t(1), "click"),
        # user 3 views+clicks, purchase exactly AT click time -> not strictly after
        (3, t(1), "view"), (3, t(2), "click"), (3, t(2), "purchase"),
        # user 4 never views: counts nowhere
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, ts, et, i) for i, (u, ts, et) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    from dwh_etl_ods_spark_jobs_spark.plans.coverage import q_funnel

    out = {r.step_name: r.n_users for r in q_funnel(spark, str(tmp_path)).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_rolling_revenue_averages_present_days_only(spark, tmp_path):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 10.00),
        (2, dt.datetime(2024, 1, 2), 30.00),
        (3, dt.datetime(2024, 1, 20), 50.00),  # far gap: window restarts
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double")
    df.write.parquet(str(tmp_path / "orders.parquet"))
    from dwh_etl_ods_spark_jobs_spark.plans.coverage import q_rolling_revenue

    out = {r.d.isoformat(): r for r in q_rolling_revenue(spark, str(tmp_path)).collect()}
    assert out["2024-01-01"].avg7_revenue == 10.0
    assert out["2024-01-02"].avg7_revenue == 20.0   # (10+30)/2
    assert out["2024-01-20"].avg7_revenue == 50.0   # gap > 6 days: alone


def test_locf_gap_fill_semantics(spark, tmp_path):
    """Missing calendar days inherit the last observed value; observed
    flags mark real measurements; leading days before any observation
    cannot exist (spine starts at the user's first observation)."""
    import datetime as dt

    rows = [
        (50, dt.datetime(2024, 1, 1, 12), 1.5, 1),
        (50, dt.datetime(2024, 1, 4, 9), 7.25, 2),   # 3-day gap
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    df.write.parquet(str(tmp_path / "events.parquet"))
    from dwh_etl_ods_spark_jobs_spark.plans.coverage import q_locf_gap_fill

    out = sorted(q_locf_gap_fill(spark, str(tmp_path)).collect(), key=lambda r: r.d)
    assert [(r.d.isoformat(), r.observed, r.value_locf) for r in out] == [
        ("2024-01-01", True, 1.5),
        ("2024-01-02", False, 1.5),
        ("2024-01-03", False, 1.5),
        ("2024-01-04", True, 7.25),
    ]


def test_copurchase_join_stays_order_keyed(spark, sf_dir):
    """The pair generator must join on the order key (bounded fan-out),
    never build a part-level cross product."""
    from dwh_etl_ods_spark_jobs_spark.plans.coverage import q_copurchase

    plan = _plan(q_copurchase(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_buckets_bound_both_dimension_envelopes(spark, sf_dir):
    """Morton bucketing must bound BOTH dimensions per bucket — the
    file-skipping property a single-column sort lacks."""
    import statistics

    from dwh_etl_ods_spark_jobs_spark.plans.coverage import q_zorder_locality

    rows = q_zorder_locality(spark, sf_dir).collect()
    assert len(rows) > 5
    # envelope widths per bucket are far below the global ranges
    assert statistics.mean(r.x_range for r in rows) < 300
    assert statistics.mean(r.y_range for r in rows) < 300


def test_morton_code_roundtrip_bits(spark):
    from dwh_etl_ods_spark_jobs_spark.operators import morton_code
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 65535) for y in (0, 2, 7, 65535)], "x long, y long"
    )
    out = df.select("x", "y", morton_code(F.col("x"), F.col("y")).alias("z")).collect()
    for r in out:
        # deinterleave in python and compare
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x, y) == (r.x, r.y)


def test_merge_agg_state_is_order_insensitive_and_exact(spark):
    from dwh_etl_ods_spark_jobs_spark.operators import merge_agg_state
    from pyspark.sql import functions as F

    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )

    rows = [("a", i) for i in range(100)] + [("b", -i) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, v long")
    full = {r.k: r for r in agg(df).collect()}
    s1, s2 = agg(df.filter(F.col("v") % 3 == 0)), agg(df.filter(F.col("v") % 3 != 0))
    kw = dict(sum_cols=["sum_v"], min_cols=["min_v"], max_cols=["max_v"], count_col="n")
    ab = {r.k: r for r in merge_agg_state(s1, s2, ["k"], **kw).collect()}
    ba = {r.k: r for r in merge_agg_state(s2, s1, ["k"], **kw).collect()}
    assert ab == full == ba


def test_interval_overlap_join_matches_naive_predicate(spark):
    """Chunked-equi rewrite == the naive O(n^2) predicate on adversarial
    intervals: zero-length, chunk-straddling, touching endpoints."""
    from dwh_etl_ods_spark_jobs_spark.operators.intervals import interval_overlap_join

    ivs = [
        (1, 0, 0),     # zero-length at origin
        (2, 9, 10),    # touches chunk boundary (chunk=10)
        (3, 10, 29),   # spans 3 chunks
        (4, 30, 30),   # zero-length on boundary
        (5, 5, 6),
        (6, 100, 140), # long interval
        (7, 139, 141),
    ]
    left = spark.createDataFrame(ivs, "key long, s long, e long")
    right = spark.createDataFrame(ivs, "key long, s long, e long")
    got = {
        (r.a_key, r.b_key)
        for r in interval_overlap_join(left, right, "s", "e", chunk=10).collect()
    }
    expect = {
        (a, b)
        for a, sa, ea in ivs
        for b, sb, eb in ivs
        if sa <= eb and sb <= ea
    }
    assert got == expect


def test_interval_overlap_plan_has_no_nested_loop(spark, sf_dir):
    from dwh_etl_ods_spark_jobs_spark.plans.coverage import q_interval_overlap

    plan = _plan(q_interval_overlap(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_fuzz_matches_naive(spark):
    """Property fuzz: on random interval sets and chunk widths, the
    chunked-equi rewrite equals the O(n^2) predicate exactly."""
    import random

    from dwh_etl_ods_spark_jobs_spark.operators.intervals import interval_overlap_join

    rng = random.Random(20260814)
    for chunk in (3, 10, 50):
        ivs = []
        for i in range(60):
            s = rng.randrange(0, 200)
            ivs.append((i, s, s + rng.randrange(0, 40)))
        df = spark.createDataFrame(ivs, "key long, s long, e long")
        got = {
            (r.a_key, r.b_key)
            for r in interval_overlap_join(df, df, "s", "e", chunk=chunk).collect()
        }
        expect = {
            (a, b)
            for a, sa, ea in ivs
            for b, sb, eb in ivs
            if sa <= eb and sb <= ea
        }
        assert got == expect, f"chunk={chunk}"


def test_merge_agg_state_fuzz_any_partition_of_batches(spark):
    """Property fuzz: merging ANY random partition of the fact into
    batches — in any order — reproduces the full recompute exactly."""
    import random

    from functools import reduce

    from dwh_etl_ods_spark_jobs_spark.operators import merge_agg_state
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [(f"k{i % 7}", rng.randrange(-1000, 1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v long")

    def agg(frame):
        return frame.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )

    full = {r.k: r for r in agg(df).collect()}
    n_batches = 4
    tags = [rng.randrange(n_batches) for _ in rows]
    batches = [
        agg(spark.createDataFrame(
            [r for r, t in zip(rows, tags) if t == b], "k string, v long"
        ))
        for b in range(n_batches)
        if any(t == b for t in tags)
    ]
    rng.shuffle(batches)
    kw = dict(sum_cols=["sum_v"], min_cols=["min_v"], max_cols=["max_v"], count_col="n")
    merged = reduce(lambda a, b: merge_agg_state(a, b, ["k"], **kw), batches)
    assert {r.k: r for r in merged.collect()} == full

def test_interval_overlap_join_sc_collision_and_negative_starts(spark):
    """ADVICE r6: helper columns must not collide with a user column
    literally named 'sc', and chunk ids must floor-divide exactly for
    negative starts (pmod-adjusted integer div, not double division)."""
    from dwh_etl_ods_spark_jobs_spark.operators.intervals import interval_overlap_join

    ivs = [
        (1, -25, -11, "x1"),   # fully negative, straddles chunk boundary
        (2, -10, 5, "x2"),     # crosses zero
        (3, -1, -1, "x3"),     # zero-length negative
        (4, 4, 9, "x4"),
        (5, -30, -26, "x5"),
    ]
    df = spark.createDataFrame(ivs, "key long, s long, e long, sc string")
    out = interval_overlap_join(df, df, "s", "e", chunk=10)
    # the payload column 'sc' survives on both sides, un-clobbered
    assert "a_sc" in out.columns and "b_sc" in out.columns
    rows = out.collect()
    got = {(r.a_key, r.b_key) for r in rows}
    expect = {
        (a, b)
        for a, sa, ea, _ in ivs
        for b, sb, eb, _ in ivs
        if sa <= eb and sb <= ea
    }
    assert got == expect
    assert all(r.a_sc == f"x{r.a_key}" and r.b_sc == f"x{r.b_key}" for r in rows)
