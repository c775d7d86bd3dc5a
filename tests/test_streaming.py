"""Streaming extension tests: micro-batch incremental load equals the batch
anti-join result, is idempotent under replay, and windowed aggregation
matches a batch groupBy over the same data."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import streaming as ST
from dwh_etl_ods_spark_jobs_spark.operators import anti_join_new


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _write_source_files(spark, path: str, rows, schema: str):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("append").parquet(path)
    return df


def test_incremental_stream_matches_batch_and_is_idempotent(spark, workdir):
    src = os.path.join(workdir, "landing")
    tgt = os.path.join(workdir, "target")
    ckpt = os.path.join(workdir, "ckpt")
    schema = "site int, pk string, v double"

    _write_source_files(spark, src, [(1, "a", 1.0), (2, "b", 2.0)], schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema
    )
    q = ST.incremental_sink(stream, tgt, keys=["site", "pk"], checkpoint_dir=ckpt)
    ST.run_to_completion(q)
    got1 = {(r.site, r.pk) for r in spark.read.parquet(tgt).collect()}
    assert got1 == {(1, "a"), (2, "b")}

    # New file arrives with one overlapping and one new key.
    _write_source_files(spark, src, [(2, "b", 9.0), (3, "c", 3.0)], schema)
    stream2 = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q2 = ST.incremental_sink(stream2, tgt, keys=["site", "pk"], checkpoint_dir=ckpt)
    ST.run_to_completion(q2)
    rows = spark.read.parquet(tgt).collect()
    assert {(r.site, r.pk) for r in rows} == {(1, "a"), (2, "b"), (3, "c")}
    assert len(rows) == 3  # overlap NOT re-appended (anti-join idempotency)

    # Replay from scratch (fresh checkpoint, same files): still 3 rows.
    shutil.rmtree(ckpt)
    stream3 = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q3 = ST.incremental_sink(
        stream3, tgt, keys=["site", "pk"],
        checkpoint_dir=os.path.join(workdir, "ckpt2"),
    )
    ST.run_to_completion(q3)
    assert len(spark.read.parquet(tgt).collect()) == 3


def test_incremental_stream_dedupes_within_batch(spark, workdir):
    src = os.path.join(workdir, "landing")
    tgt = os.path.join(workdir, "target")
    schema = "site int, pk string, seq int, value double"
    _write_source_files(
        spark, src,
        [(1, "a", 1, 10.0), (1, "a", 2, 20.0), (2, "b", 1, 1.0)],
        schema,
    )
    stream = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q = ST.incremental_sink(
        stream, tgt, keys=["site", "pk"],
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        dedupe_order=["seq"],
    )
    ST.run_to_completion(q)
    rows = {(r.site, r.pk): r.value for r in spark.read.parquet(tgt).collect()}
    assert rows == {(1, "a"): 20.0, (2, "b"): 1.0}  # latest seq wins


def test_windowed_counts_custom_aggs_without_value_column(spark, workdir):
    # A stream with NO `value` column used to crash on the hardcoded
    # F.sum("value"); passing aggs= makes the rollup generic.
    src = os.path.join(workdir, "src")
    _write_source_files(
        spark, src,
        [("2024-01-01 00:01:00", "a", 5), ("2024-01-01 00:02:00", "a", 7)],
        "ts_s string, k string, amount int",
    )
    base = spark.read.parquet(src)
    stream = (
        ST.file_stream(spark, src, base.schema)
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    agg = ST.windowed_counts(
        stream, "ts", window="1 hour", watermark="0 seconds",
        group_cols=["k"], aggs={"max_amount": F.max("amount")},
    )
    assert set(agg.columns) == {"window_start", "window_end", "k", "n_events", "max_amount"}
    out = os.path.join(workdir, "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)
    # With watermark 0 the single window may or may not seal in append mode;
    # schema-level behavior (no crash, correct columns) is the contract here.
    got = spark.read.parquet(out)
    assert set(got.columns) == {"window_start", "window_end", "k", "n_events", "max_amount"}


def test_incremental_stream_recovers_from_empty_target_dir(spark, workdir):
    """A failed/partial first write leaves target_path existing with no
    committed parquet data files; the sink must treat that as first batch
    instead of wedging on 'Unable to infer schema' forever."""
    src = os.path.join(workdir, "landing")
    tgt = os.path.join(workdir, "target")
    schema = "site int, pk string, v double"
    _write_source_files(spark, src, [(1, "a", 1.0), (2, "b", 2.0)], schema)
    # simulate the commit-protocol residue: dir + _temporary, zero data files
    os.makedirs(os.path.join(tgt, "_temporary"))

    stream = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q = ST.incremental_sink(
        stream, tgt, keys=["site", "pk"],
        checkpoint_dir=os.path.join(workdir, "ckpt"),
    )
    ST.run_to_completion(q)
    got = {(r.site, r.pk) for r in spark.read.parquet(tgt).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_incremental_stream_fails_on_corrupt_target(spark, workdir):
    """A target dir whose data files cannot be read must FAIL the
    micro-batch (so it retries), never fall back to appending the whole
    batch undeduplicated — only the no-committed-data-files shape may take
    the first-batch path."""
    src = os.path.join(workdir, "landing")
    tgt = os.path.join(workdir, "target")
    schema = "site int, pk string, v double"
    _write_source_files(spark, src, [(1, "a", 1.0)], schema)
    os.makedirs(tgt)
    with open(os.path.join(tgt, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    stream = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q = ST.incremental_sink(
        stream, tgt, keys=["site", "pk"],
        checkpoint_dir=os.path.join(workdir, "ckpt"),
    )
    with pytest.raises(Exception, match="(?i)footer|parquet|corrupt"):
        ST.run_to_completion(q)
    # nothing appended: the corrupt residue is still the only file
    assert os.listdir(tgt) == ["part-00000.parquet"]


def test_dedupe_within_watermark_drops_stream_duplicates(spark, workdir):
    """Watermarked streaming dedup: redelivered rows inside the watermark
    are dropped with key state that expires, instead of a forever-growing
    dropDuplicates state."""
    import datetime as dt

    src = os.path.join(workdir, "landing")
    out = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    schema = "site int, pk string, ts timestamp, v double"
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    _write_source_files(
        spark, src,
        [
            (1, "a", t0, 1.0),
            (1, "a", t0 + dt.timedelta(minutes=5), 99.0),  # dup within watermark
            (2, "b", t0, 2.0),
        ],
        schema,
    )
    stream = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    deduped = ST.dedupe_within_watermark(stream, ["site", "pk"], "ts", "1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    ST.run_to_completion(q)
    rows = {(r.site, r.pk): r.v for r in spark.read.parquet(out).collect()}
    assert rows == {(1, "a"): 1.0, (2, "b"): 2.0}  # first-seen survives


def test_stateful_sessionize_closes_on_gap_and_expires_state(spark, workdir):
    """applyInPandasWithState sessionization: a gap > gap_seconds closes the
    running session (emitted); the trailing open session expires via
    EventTimeTimeout once the watermark passes last_event + gap — emitted
    AND its key's state removed, so total state never grows with users who
    never return."""
    import datetime as dt

    src = os.path.join(workdir, "landing")
    ckpt = os.path.join(workdir, "ckpt")
    out = os.path.join(workdir, "out")
    schema = "user string, ts timestamp"

    def t(minute):
        return dt.datetime(2024, 1, 1, 10, minute)

    # user a: events at 10:00,10:05 | gap | 10:40 (open); NaT row dropped.
    # user b: single event 10:00 (open)
    _write_source_files(
        spark, src,
        [("a", t(0)), ("a", t(5)), ("a", t(40)), ("a", None), ("b", t(0))],
        schema,
    )
    stream = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    sessions = ST.stateful_sessionize(stream, "user", "ts", gap_seconds=600)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    ST.run_to_completion(q)
    rows = {(r.user, r.session_start): r for r in spark.read.parquet(out).collect()}
    # a's first session closed by the 10:40 gap; b's single-event session
    # expired by EventTimeTimeout (watermark reached 10:40 > 10:00 + gap).
    assert set(rows) == {("a", t(0)), ("b", t(0))}
    a1 = rows[("a", t(0))]
    assert a1.session_end == t(5) and a1.n_events == 2

    # Second batch: b returns after its state expired -> fresh session.
    _write_source_files(spark, src, [("b", t(55))], schema)
    stream2 = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q2 = (
        ST.stateful_sessionize(stream2, "user", "ts", gap_seconds=600)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    ST.run_to_completion(q2)
    rows = {(r.user, r.session_start): r for r in spark.read.parquet(out).collect()}
    assert (("b", t(0))) in rows, f"b's session not closed: {sorted(rows)}"
    b = rows[("b", t(0))]
    assert b.session_end == t(0) and b.n_events == 1
    # b's state was removed at expiry: the 10:55 event opened a NEW session
    # rather than folding into the dead one.
    assert ("b", t(5)) not in rows

    # Third batch: an unrelated user's event advances the watermark past
    # a's last event (10:40) + gap (10 min) -> a's open session expires via
    # EventTimeTimeout: emitted AND its state removed (state stays bounded
    # even for users who never return).
    _write_source_files(spark, src, [("z", dt.datetime(2024, 1, 1, 11, 30))], schema)
    stream3 = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q3 = (
        ST.stateful_sessionize(stream3, "user", "ts", gap_seconds=600)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    ST.run_to_completion(q3)
    rows = {(r.user, r.session_start): r for r in spark.read.parquet(out).collect()}
    assert ("a", t(40)) in rows, f"a's open session not expired: {sorted(rows)}"
    a_open = rows[("a", t(40))]
    assert a_open.session_end == t(40) and a_open.n_events == 1


def test_windowed_counts_rejects_reserved_alias_collisions(spark, workdir):
    src = os.path.join(workdir, "src")
    _write_source_files(
        spark, src, [("2024-01-01 00:01:00", "a", 5)], "ts_s string, k string, amount int"
    )
    stream = (
        ST.file_stream(spark, src, spark.read.parquet(src).schema)
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    for bad in ("n_events", "window_start", "window_end", "k"):
        with pytest.raises(ValueError, match="collide"):
            ST.windowed_counts(
                stream, "ts", group_cols=["k"], aggs={bad: F.max("amount")}
            )


def test_windowed_counts_matches_batch_aggregation(spark, workdir):
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = read_events(spark, sf_dir).select("ts", "event_type", "value")
    src = os.path.join(workdir, "events")
    events.coalesce(1).write.parquet(src)

    stream = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    agg = ST.windowed_counts(
        stream, "ts", window="1 day", watermark="0 seconds",
        group_cols=["event_type"],
    )
    out = os.path.join(workdir, "agg_out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)
    got = (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.sum("n_events").alias("n"))
        .collect()
    )
    expect = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # append mode only emits windows sealed by the watermark; with watermark 0
    # and availableNow, all-but-the-last event-time window seal. Compare only
    # emitted groups, and require near-total coverage.
    got_map = {r.event_type: r.n for r in got}
    assert got_map, "no windows emitted"
    total_expected = sum(expect.values())
    total_got = sum(got_map.values())
    assert total_got >= 0.8 * total_expected
    for et, n in got_map.items():
        assert n <= expect[et]


def test_streaming_curation_filter_matches_batch(spark, workdir):
    """The curation operators are stateless Catalyst expressions (plus
    doc-grained aggs), so the same transform chain runs unchanged on a
    file stream: per-micro-batch weighted sampling + repetition scoring in
    foreachBatch equals the batch run over the union of all files."""
    from dwh_etl_ods_spark_jobs_spark.curation import (
        repetition_signals,
        weighted_sample,
    )

    src = os.path.join(workdir, "docs")
    out = os.path.join(workdir, "curated")
    schema = "doc_id long, text string, lang string"
    batch1 = [(1, "a a a a", "en"), (2, "a b c d", "fr"), (3, "x y", "en")]
    batch2 = [(4, "p q p q", "fr"), (5, "solo", "en")]

    def curate(df):
        return df.transform(
            weighted_sample("doc_id", "lang", {"en": 0.6}, default=1.0)
        ).transform(repetition_signals("doc_id", "text"))

    _write_source_files(spark, src, batch1, schema)
    _write_source_files(spark, src, batch2, schema)

    stream = ST.file_stream(spark, src, spark.read.parquet(src).schema)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: curate(b).write.mode("append").parquet(out)
        )
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    streamed = {
        (r.doc_id, r.n_tok, r.dup_word_frac, r.top_bigram_frac)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.doc_id, r.n_tok, r.dup_word_frac, r.top_bigram_frac)
        for r in curate(spark.read.parquet(src)).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_streaming_hll_registers_fold_to_exact_batch_estimate(spark, workdir):
    """The streaming register frame, snapshotted after draining two
    micro-batch file drops, folds to the BIT-IDENTICAL estimate a batch
    hll_distinct computes over the union of the same rows."""
    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    src = os.path.join(workdir, "landing")
    schema = "grp string, user string"
    _write_source_files(
        spark, src, [("a", f"u{i}") for i in range(300)], schema
    )
    _write_source_files(
        # overlap: u150..u299 repeat, u300..u449 are new
        spark, src, [("a", f"u{i + 150}") for i in range(300)], schema
    )

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    regs = ST.streaming_hll(stream, ["grp"], "user")
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    snapshot = spark.table("hll_regs")
    got = snapshot.transform(SK.hll_fold(["grp"])).collect()[0]
    expect = (
        spark.read.parquet(src)
        .transform(SK.hll_distinct(["grp"], "user"))
        .collect()[0]
    )
    assert (got.grp, got.empty_registers, got.est_distinct) == (
        expect.grp,
        expect.empty_registers,
        expect.est_distinct,
    )
    # and the estimate is actually good: 450 true distincts
    assert got.est_distinct == pytest.approx(450, rel=0.05)


def test_streaming_countmin_snapshot_equals_batch_sketch(spark, workdir):
    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    src = os.path.join(workdir, "landing")
    schema = "k string"
    _write_source_files(spark, src, [(f"k{i % 20}",) for i in range(400)], schema)
    _write_source_files(spark, src, [(f"k{i % 50}",) for i in range(300)], schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_countmin(stream, "k")
        .writeStream.format("memory")
        .queryName("cm_grid")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    snap = {(r.r, r.c): r.cnt for r in spark.table("cm_grid").collect()}
    batch = {
        (r.r, r.c): r.cnt
        for r in SK.countmin_counts(spark.read.parquet(src), "k").collect()
    }
    assert snap == batch and len(snap) > 0


def test_streaming_hdr_histogram_snapshot_equals_batch(spark, workdir):
    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    src = os.path.join(workdir, "landing")
    schema = "g string, v long"
    _write_source_files(
        spark, src, [("a", (i * i * 37) % 90_000 + 1) for i in range(300)], schema
    )
    _write_source_files(
        spark, src, [("b", (i * 7919) % 500 + 1) for i in range(200)], schema
    )

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_hdr_histogram(stream, ["g"], "v")
        .writeStream.format("memory")
        .queryName("hdr_hist")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    snap = spark.table("hdr_hist")
    batch = spark.read.parquet(src).transform(SK.hdr_histogram(["g"], "v"))
    assert sorted(map(tuple, snap.collect())) == sorted(map(tuple, batch.collect()))
    # and the folded estimates agree too (the monitor's actual read path)
    sq = {
        (r.g, r.quantile): r.approx_value
        for r in SK.hdr_quantiles(snap, ["g"], [("p50", 50, 100)]).collect()
    }
    bq = {
        (r.g, r.quantile): r.approx_value
        for r in SK.hdr_quantiles(batch, ["g"], [("p50", 50, 100)]).collect()
    }
    assert sq == bq and len(sq) == 2


def test_streaming_dq_counts_snapshot_equals_batch_audit(spark, workdir):
    """Live DQ monitoring: expectation counters maintained across two
    micro-batch file drops fold to BIT-IDENTICAL audit rows vs a batch
    dq_expectations over the union of the same rows."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        RowCheck,
        UniqueCheck,
        dq_audit_from_counts,
        dq_expectations,
        streaming_dq_counts,
    )

    src = os.path.join(workdir, "landing")
    schema = "id long, v double, s string"
    _write_source_files(
        spark, src, [(1, 10.0, "A"), (2, -1.0, "B"), (3, None, "A")], schema
    )
    _write_source_files(
        spark, src, [(4, 5.0, "Z"), (5, 0.5, "A")], schema
    )

    checks = [
        RowCheck("v_not_null", lambda: F.col("v").isNotNull(), "v IS NOT NULL"),
        RowCheck("v_positive", lambda: F.col("v") > 0, "v > 0", min_ppm=600_000),
        RowCheck("s_in_domain", lambda: F.col("s").isin("A", "B"), "s IN ('A','B')"),
    ]
    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        streaming_dq_counts(stream, checks)
        .writeStream.format("memory")
        .queryName("dq_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        dq_audit_from_counts(spark.table("dq_counts"), "t", checks).collect()
    )
    expect = sorted(
        dq_expectations(spark.read.parquet(src), "t", checks).collect()
    )
    assert got == expect
    by_name = {r.check_name: r for r in got}
    assert by_name["v_positive"].n_ok == 3  # 10.0, 5.0, 0.5
    assert by_name["v_positive"].metric_ppm == 600_000
    assert by_name["v_positive"].passed == 1

    # uniqueness checks are refused loudly: their state is unbounded
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RowChecks only"):
        streaming_dq_counts(stream, checks + [UniqueCheck("u", ("id",))])


def test_stream_stream_interval_join_matches_batch(spark, workdir):
    """Watermarked stream-stream inner join == the same operator applied
    to batch frames (withWatermark is a no-op there): every (impression,
    click-within-5min) pair, attribution-style."""
    import datetime as dt

    def t(minute, second=0):
        return dt.datetime(2024, 1, 1, 10, minute, second)

    imp_rows = [("u1", t(0), "ad_a"), ("u1", t(20), "ad_b"),
                ("u2", t(1), "ad_c"), ("u3", t(2), "ad_d")]
    clk_rows = [("u1", t(3), "home"),    # joins ad_a (within 5m)
                ("u1", t(22), "cart"),   # joins ad_b
                ("u2", t(30), "home"),   # too late for ad_c
                ("u4", t(4), "promo")]   # no impression
    imp_schema = "user string, imp_ts timestamp, ad string"
    clk_schema = "user string, clk_ts timestamp, page string"

    imp_src = os.path.join(workdir, "imps")
    clk_src = os.path.join(workdir, "clks")
    out = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    _write_source_files(spark, imp_src, imp_rows, imp_schema)
    _write_source_files(spark, clk_src, clk_rows, clk_schema)

    joined = ST.stream_stream_interval_join(
        ST.file_stream(spark, imp_src, spark.read.parquet(imp_src).schema),
        ST.file_stream(spark, clk_src, spark.read.parquet(clk_src).schema),
        key="user", left_ts="imp_ts", right_ts="clk_ts",
        within_seconds=300,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    ST.run_to_completion(q)
    got = sorted(
        (r.user, r.imp_ts, r.ad, r.clk_ts, r.page)
        for r in spark.read.parquet(out).collect()
    )
    expected = sorted(
        (r.user, r.imp_ts, r.ad, r.clk_ts, r.page)
        for r in ST.stream_stream_interval_join(
            spark.createDataFrame(imp_rows, imp_schema),
            spark.createDataFrame(clk_rows, clk_schema),
            key="user", left_ts="imp_ts", right_ts="clk_ts",
            within_seconds=300,
        ).collect()
    )
    assert got == expected
    assert [(u, a) for u, _, a, _, _ in got] == [
        ("u1", "ad_a"), ("u1", "ad_b")
    ]


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, workdir):
    """left_outer: unmatched impressions surface with NULL click columns —
    but only after the watermark passes their join window (a later batch
    advances it), proving state is evicted rather than held forever."""
    import datetime as dt

    def t(minute):
        return dt.datetime(2024, 1, 1, 10, minute)

    imp_schema = "user string, imp_ts timestamp, ad string"
    clk_schema = "user string, clk_ts timestamp, page string"
    imp_src = os.path.join(workdir, "imps")
    clk_src = os.path.join(workdir, "clks")
    out = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")

    # batch 1: one matched and one unmatched impression
    _write_source_files(
        spark, imp_src, [("u1", t(0), "ad_a"), ("u9", t(0), "ad_x")], imp_schema
    )
    _write_source_files(spark, clk_src, [("u1", t(3), "home")], clk_schema)

    def run_once():
        joined = ST.stream_stream_interval_join(
            ST.file_stream(spark, imp_src, spark.read.parquet(imp_src).schema),
            ST.file_stream(spark, clk_src, spark.read.parquet(clk_src).schema),
            key="user", left_ts="imp_ts", right_ts="clk_ts",
            within_seconds=300, watermark="1 minutes", how="left_outer",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        ST.run_to_completion(q)
        return {
            (r.user, r.ad): (r.clk_ts, r.page)
            for r in spark.read.parquet(out).collect()
        }

    first = run_once()
    assert first.get(("u1", "ad_a")) is not None  # match emits immediately

    # batch 2: far-future rows on BOTH sides push the watermark past
    # ad_x's join window -> the unmatched left row must now emit with NULLs
    _write_source_files(spark, imp_src, [("zz", t(59), "ad_z")], imp_schema)
    _write_source_files(spark, clk_src, [("zz", t(59), "late")], clk_schema)
    second = run_once()
    assert second[("u9", "ad_x")] == (None, None)
    assert ("u1", "ad_a") in second


def test_incremental_dedup_sink_loop_and_replay(spark, workdir):
    """The corpus-ingest loop: batch 1 seeds the signature store; batch 2's
    cross-batch duplicate is caught via the PERSISTED store (no text
    rescan); replaying batch 2 changes nothing (row-level idempotency)."""
    src = os.path.join(workdir, "landing")
    flags = os.path.join(workdir, "flags")
    store = os.path.join(workdir, "store")
    ck1 = os.path.join(workdir, "ck1")

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different document about arrow batches and state stores"
    text_c = "yet another unrelated text mentioning watermarks and exchanges"
    _write_source_files(
        spark, src, [(1, text_a), (2, text_b)], "doc_id long, text string"
    )

    def run(ckpt):
        q = ST.incremental_dedup_sink(
            ST.file_stream(spark, src, spark.read.parquet(src).schema),
            "text", "doc_id", flags, store, ckpt,
        )
        ST.run_to_completion(q)

    run(ck1)
    out = {r.doc_id: r for r in spark.read.parquet(flags).collect()}
    assert out[1].is_new == 1 and out[2].is_new == 1
    assert spark.read.parquet(store).count() == 2  # both seeded

    # batch 2: doc 10 duplicates doc 1's text; doc 11 is fresh
    _write_source_files(
        spark, src, [(10, text_a), (11, text_c)], "doc_id long, text string"
    )
    run(ck1)  # same checkpoint: the stream continues, sees only new files
    out = {r.doc_id: r for r in spark.read.parquet(flags).collect()}
    assert len(out) == 4
    assert out[10].store_dup_of == 1 and out[10].is_new == 0
    assert out[11].is_new == 1
    # store holds survivors only: 1, 2, 11 — never the duplicate 10
    store_ids = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert store_ids == {1, 2, 11}

    # replay ALL landing data with a fresh checkpoint (lost-checkpoint
    # disaster drill): the target anti-joins make it a no-op
    run(os.path.join(workdir, "ck2"))
    assert spark.read.parquet(flags).count() == 4
    assert {r.doc_id for r in spark.read.parquet(store).collect()} == {1, 2, 11}
    # and the replayed docs were NOT re-flagged as dups of themselves
    out = {r.doc_id: r for r in spark.read.parquet(flags).collect()}
    assert out[1].is_new == 1


def test_streaming_windowed_hll_matches_batch_hopping(spark, workdir):
    """The staged hopping_hll_distinct claim, pinned: the SAME
    explode-to-window-membership + HLL register aggregation runs as a
    streaming stateful agg, and its snapshot folds bit-identical to the
    batch sliding-window distinct over the same rows."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    W_MS, H_MS = 30 * 60 * 1000, 10 * 60 * 1000
    src = os.path.join(workdir, "landing")
    schema = "etype string, ts timestamp, user string"
    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def t(minute):
        return dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=minute)

    rows1 = [("click", t(m), f"u{m % 7}") for m in range(0, 25, 2)]
    rows2 = [("click", t(m), f"u{m % 11}") for m in range(25, 55, 3)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    def windowed(df):
        ev = df.select(
            "etype",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("_ems"),
            "user",
        )
        return ev.withColumn(
            "_m",
            F.explode(
                F.expr(
                    f"sequence((_ems - {W_MS}) div {H_MS} + 1, _ems div {H_MS})"
                )
            ),
        ).select(
            "etype", (F.col("_m") * F.lit(H_MS)).alias("win_ms"), "user"
        )

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    regs = ST.streaming_hll(windowed(stream), ["etype", "win_ms"], "user")
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_win_regs")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = {
        (r.etype, r.win_ms): (r.empty_registers, r.est_distinct)
        for r in spark.table("hll_win_regs")
        .transform(SK.hll_fold(["etype", "win_ms"]))
        .collect()
    }
    expect = {
        (r.etype, r.win_ms): (r.empty_registers, r.est_distinct)
        for r in windowed(spark.read.parquet(src))
        .transform(SK.hll_distinct(["etype", "win_ms"], "user"))
        .collect()
    }
    assert got == expect
    assert len(got) >= 5  # multiple overlapping windows actually formed


def test_streaming_histogram_snapshot_feeds_drift_monitor(spark, workdir):
    """Live drift monitoring: the streaming HDR histogram snapshot plugs
    straight into sketches.hdr_drift_from_hists against a batch reference
    — same TVD as batch-vs-batch over the same rows."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    src = os.path.join(workdir, "landing")
    # reference distribution vs a drifted live stream
    ref_rows = [((i % 97) * 100,) for i in range(3000)]
    live_rows = [((i % 97) * 100 * (3 if i % 4 == 0 else 1),) for i in range(3000)]
    ref = spark.createDataFrame(ref_rows, "v long")
    _write_source_files(spark, src, live_rows, "v long")

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    hist = ST.streaming_hdr_histogram(stream, [], "v")
    q = (
        hist.writeStream.format("memory")
        .queryName("hdr_live")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    ho = ref.transform(SK.hdr_histogram([], "v")).select(
        "bucket_lo", F.col("n").alias("n_old")
    )
    hn = spark.table("hdr_live").select("bucket_lo", F.col("n").alias("n_new"))
    live = SK.hdr_drift_from_hists(ho, hn).collect()[0]

    batch = SK.hdr_distribution_drift(
        ref, spark.read.parquet(src), "v"
    ).collect()[0]
    assert (live.n_old, live.n_new, live.tvd_ppm) == (
        batch.n_old, batch.n_new, batch.tvd_ppm,
    )
    assert live.tvd_ppm > 0  # the drift is real and detected


def test_streaming_json_audit_snapshot_equals_batch(spark, workdir):
    """json_field_audit is a pure scan-side aggregation, so it binds to a
    stream unchanged: the complete-mode snapshot after two micro-batch
    drops is bit-identical to the batch audit over the union."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import json_field_audit

    src = os.path.join(workdir, "landing_json")
    schema = "id long, props string"
    _write_source_files(
        spark, src,
        [(1, '{"k": 5}'), (2, '{"k": 7'), (3, '{"x": 1}')], schema,
    )
    _write_source_files(spark, src, [(4, '{"k": 3}'), (5, None)], schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        json_field_audit(
            stream, "props", fields=[("k", "$.k")], numeric_sums=[("k", "$.k")]
        )
        .writeStream.format("memory")
        .queryName("json_audit")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_json"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = spark.table("json_audit").collect()
    expect = json_field_audit(
        spark.read.parquet(src), "props",
        fields=[("k", "$.k")], numeric_sums=[("k", "$.k")],
    ).collect()
    assert got == expect
    r = got[0]
    assert (r.n_rows, r.n_valid, r.n_malformed, r.nn_k, r.sum_k) == (5, 3, 2, 2, 8)


def test_streaming_quarantine_split_matches_batch(spark, workdir):
    """quarantine_split is scan-side routing (zero shuffle), so it binds
    to a stream unchanged: the quarantined side written per micro-batch
    equals the batch split over the union, reasons included."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        RowCheck,
        quarantine_split,
    )

    src = os.path.join(workdir, "landing_q")
    schema = "id long, v double"
    _write_source_files(spark, src, [(1, 5.0), (2, -1.0), (3, None)], schema)
    _write_source_files(spark, src, [(4, 0.0), (5, 9.0)], schema)

    checks = [
        RowCheck("v_pos", lambda: F.col("v") > 0, "v > 0"),
        RowCheck("v_not_null", lambda: F.col("v").isNotNull(), "v IS NOT NULL"),
    ]
    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    _, quarantined = quarantine_split(stream, checks)
    q = (
        quarantined.writeStream.format("memory")
        .queryName("quarantined_rows")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_q"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        (r.id, r.failed_checks) for r in spark.table("quarantined_rows").collect()
    )
    _, batch_quarantined = quarantine_split(spark.read.parquet(src), checks)
    expect = sorted((r.id, r.failed_checks) for r in batch_quarantined.collect())
    assert got == expect
    assert got == [(2, "v_pos"), (3, "v_pos,v_not_null"), (4, "v_pos")]


def test_stateful_sequence_monotonic_across_batches(spark, workdir):
    """Per-key sequence numbers continue across micro-batches (state
    carries the high-water mark), are dense from 0 per key, and order by
    the declared columns within each batch."""
    from dwh_etl_ods_spark_jobs_spark.streaming import stateful_sequence

    src = os.path.join(workdir, "landing_seq")
    schema = "id long, k string, ord long"
    # batch 1: two keys, interleaved arrival order vs ord
    _write_source_files(
        spark, src,
        [(10, "a", 2), (11, "a", 1), (12, "b", 5)], schema,
    )
    # batch 2: key a continues -> seq must resume at 2
    _write_source_files(spark, src, [(13, "a", 9), (14, "b", 1)], schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        stateful_sequence(stream, "k", ["ord", "id"], "id")
        .writeStream.format("memory")
        .queryName("seq_rows")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_seq"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = {
        (r.key, r.row_id): r.seq for r in spark.table("seq_rows").collect()
    }
    # batch 1 key a: ord 1 (id 11) -> seq 0, ord 2 (id 10) -> seq 1
    # batch 2 key a: id 13 -> seq 2 (resumed, NOT reset)
    # key b: id 12 -> 0 (batch 1), id 14 -> 1 (batch 2, later arrival wins
    # later seq even with smaller ord — arrival order across batches)
    assert got == {
        ("a", 11): 0, ("a", 10): 1, ("a", 13): 2,
        ("b", 12): 0, ("b", 14): 1,
    }


def test_streaming_snapshot_feeds_wasserstein_drift(spark, workdir):
    """The W1 monitor's sketch-native path: a LIVE streaming HDR
    histogram snapshot vs a persisted reference histogram through
    hdr_wasserstein_from_hists equals the batch-vs-batch computation —
    drift between the stream and a reference never rereads rows."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    src = os.path.join(workdir, "landing_w1")
    schema = "v long"
    _write_source_files(
        spark, src, [((i * i * 37) % 9_000 + 100,) for i in range(300)], schema
    )
    _write_source_files(
        spark, src, [((i * 7919) % 900 + 5_000,) for i in range(200)], schema
    )

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_hdr_histogram(stream, [], "v")
        .writeStream.format("memory")
        .queryName("w1_hist")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_w1"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    ref = spark.range(500).select(
        (F.pmod(F.col("id") * 13, F.lit(9_000)) + 50).alias("v")
    ).transform(SK.hdr_histogram([], "v")).select(
        "bucket_lo", F.col("n").alias("n_old")
    )
    live = spark.table("w1_hist").select("bucket_lo", F.col("n").alias("n_new"))
    got = SK.hdr_wasserstein_from_hists(ref, live).collect()[0]

    batch_hist = spark.read.parquet(src).transform(
        SK.hdr_histogram([], "v")
    ).select("bucket_lo", F.col("n").alias("n_new"))
    expect = SK.hdr_wasserstein_from_hists(ref, batch_hist).collect()[0]
    assert tuple(got) == tuple(expect)
    assert got.emd_ppm_units > 0  # the shifted stream HAS drifted


def test_cdc_apply_sink_folds_stream_to_batch_state_and_replays(spark, workdir):
    """Streaming CDC apply (VERDICT r8 #5): a change stream folded through
    cdc_apply_sink micro-batches must land bit-identically on batch
    apply_change_feed over the SAME envelope rows, and a full replay of
    the stream (fresh checkpoint, same files) must merge to the same
    state (idempotent)."""
    from dwh_etl_ods_spark_jobs_spark.operators.merge import apply_change_feed

    feed_dir = os.path.join(workdir, "cdc_feed")
    tgt = os.path.join(workdir, "cdc_snapshot")
    schema = "id int, status string, cents long, op string, seq int"

    # seed snapshot: ids 1..4
    spark.createDataFrame(
        [(i, "s0", 100 * i) for i in range(1, 5)], "id int, status string, cents long"
    ).write.parquet(tgt)

    # batch 1: update id=2 twice (seq 2 must win), insert id=9, delete id=3
    b1 = [
        (2, "u1", 201, "u", 1), (2, "u2", 202, "u", 2),
        (9, "new", 900, "c", 1), (3, "x", 0, "d", 1),
    ]
    # batch 2: re-insert id=3, delete id=9, update id=1
    b2 = [(3, "back", 333, "c", 3), (9, "x", 0, "d", 4), (1, "u", 111, "u", 5)]

    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(feed_dir)
    q = ST.cdc_apply_sink(
        ST.file_stream(spark, feed_dir, spark.read.parquet(feed_dir).schema,
                       max_files_per_trigger=1),
        tgt, ["id"], ["seq"], os.path.join(workdir, "ckpt1"),
    )
    ST.run_to_completion(q)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(feed_dir)
    q = ST.cdc_apply_sink(
        ST.file_stream(spark, feed_dir, spark.read.parquet(feed_dir).schema,
                       max_files_per_trigger=1),
        tgt, ["id"], ["seq"], os.path.join(workdir, "ckpt1"),
    )
    ST.run_to_completion(q)

    streamed = sorted(
        tuple(r) for r in spark.read.parquet(tgt).select("id", "status", "cents").collect()
    )
    # expected: 1->u/111, 2->u2/202, 3->back/333, 4 untouched, 9 deleted
    assert streamed == [(1, "u", 111), (2, "u2", 202), (3, "back", 333), (4, "s0", 400)]

    # batch equivalence: ONE apply_change_feed over the full envelope.
    # NOTE the stream applied b1's delete of id=3 BEFORE b2's re-insert;
    # single-batch compaction resolves to the same final row because the
    # re-insert has the higher seq.
    snap0 = spark.createDataFrame(
        [(i, "s0", 100 * i) for i in range(1, 5)], "id int, status string, cents long"
    )
    full_feed = spark.createDataFrame(b1 + b2, schema)
    batch = sorted(
        tuple(r)
        for r in apply_change_feed(snap0, full_feed, ["id"], ["seq"])
        .select("id", "status", "cents")
        .collect()
    )
    assert streamed == batch

    # replay: same files, fresh checkpoint -> same state, no duplicates
    q = ST.cdc_apply_sink(
        ST.file_stream(spark, feed_dir, spark.read.parquet(feed_dir).schema),
        tgt, ["id"], ["seq"], os.path.join(workdir, "ckpt_replay"),
    )
    ST.run_to_completion(q)
    replayed = sorted(
        tuple(r) for r in spark.read.parquet(tgt).select("id", "status", "cents").collect()
    )
    assert replayed == streamed


def test_cdc_apply_sink_bootstraps_empty_snapshot_and_recovers_swap(spark, workdir):
    """First batch with NO existing snapshot folds the feed into an empty
    target; a swap crashed between delete and rename (staging present,
    target missing) is finished by the next batch's recovery preamble."""
    import shutil as _sh

    feed_dir = os.path.join(workdir, "cdc_feed_b")
    tgt = os.path.join(workdir, "cdc_snap_b")
    schema = "id int, status string, cents long, op string, seq int"
    spark.createDataFrame(
        [(1, "a", 10, "c", 1), (2, "b", 20, "c", 1), (2, "b2", 22, "u", 2)], schema
    ).coalesce(1).write.mode("append").parquet(feed_dir)
    q = ST.cdc_apply_sink(
        ST.file_stream(spark, feed_dir, spark.read.parquet(feed_dir).schema),
        tgt, ["id"], ["seq"], os.path.join(workdir, "ckpt_b"),
    )
    ST.run_to_completion(q)
    assert sorted(
        tuple(r) for r in spark.read.parquet(tgt).select("id", "status", "cents").collect()
    ) == [(1, "a", 10), (2, "b2", 22)]

    # simulate the crash window: move the snapshot to the staging path
    _sh.move(tgt, tgt + ".cdc-staging")
    spark.createDataFrame([(3, "c", 30, "c", 3)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(feed_dir)
    q = ST.cdc_apply_sink(
        ST.file_stream(spark, feed_dir, spark.read.parquet(feed_dir).schema),
        tgt, ["id"], ["seq"], os.path.join(workdir, "ckpt_b"),
    )
    ST.run_to_completion(q)
    assert sorted(
        tuple(r) for r in spark.read.parquet(tgt).select("id", "status", "cents").collect()
    ) == [(1, "a", 10), (2, "b2", 22), (3, "c", 30)]


def test_streaming_token_counts_feed_kl_drift(spark, workdir):
    """KL drift's sketch-native streaming path: the live token-count
    snapshot vs a batch reference through kl_from_token_counts equals
    the batch kl_token_drift over the same rows — the token-space twin
    of the W1/TVD histogram-snapshot bindings."""
    from dwh_etl_ods_spark_jobs_spark import curation as C

    src = os.path.join(workdir, "landing_kl")
    schema = "doc_id long, text string"
    words = ["sort", "merge", "join", "scan", "agg"]
    rows1 = [(i, " ".join(words[(i + j) % 5] for j in range(6))) for i in range(40)]
    rows2 = [(100 + i, "drifted token " + words[i % 2]) for i in range(30)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_token_counts(stream, "text")
        .writeStream.format("memory")
        .queryName("kl_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_kl"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    ref = spark.createDataFrame(
        [(i, " ".join(words[(i * 3 + j) % 5] for j in range(6))) for i in range(50)],
        schema,
    )
    live = C.kl_from_token_counts(
        C.token_counts(ref, "text"), spark.table("kl_counts")
    ).collect()[0]
    batch = C.kl_token_drift(ref, spark.read.parquet(src), "text").collect()[0]
    assert tuple(live) == tuple(batch)
    assert live.kl_micro > 0  # the drifted tokens ARE detected


def test_streaming_snapshot_feeds_ks_drift(spark, workdir):
    """KS drift's sketch-native streaming path (VERDICT r9 #6): a LIVE
    streaming HDR histogram snapshot vs a persisted reference through
    hdr_ks_from_hists equals the batch-vs-batch computation — the
    worst-CDF-gap monitor never rereads rows, same binding as W1/TVD."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark import sketches as SK

    src = os.path.join(workdir, "landing_ks")
    schema = "v long"
    _write_source_files(
        spark, src, [((i * i * 37) % 9_000 + 100,) for i in range(300)], schema
    )
    _write_source_files(
        spark, src, [((i * 7919) % 900 + 5_000,) for i in range(200)], schema
    )

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_hdr_histogram(stream, [], "v")
        .writeStream.format("memory")
        .queryName("ks_hist")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_ks"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    ref = spark.range(500).select(
        (F.pmod(F.col("id") * 13, F.lit(9_000)) + 50).alias("v")
    ).transform(SK.hdr_histogram([], "v")).select(
        "bucket_lo", F.col("n").alias("n_old")
    )
    live = spark.table("ks_hist").select("bucket_lo", F.col("n").alias("n_new"))
    got = SK.hdr_ks_from_hists(ref, live).collect()[0]

    batch_hist = spark.read.parquet(src).transform(
        SK.hdr_histogram([], "v")
    ).select("bucket_lo", F.col("n").alias("n_new"))
    expect = SK.hdr_ks_from_hists(ref, batch_hist).collect()[0]
    assert tuple(got) == tuple(expect)
    assert got.ks_ppm > 0  # the shifted stream HAS drifted


def test_streaming_confusion_counts_feed_cohens_kappa(spark, workdir):
    """Agreement monitoring without rereading rows (r12 eval binding):
    a LIVE streaming confusion-matrix snapshot through
    cohens_kappa_from_cm equals the batch cohens_kappa over the same
    rows — bit-identical, across micro-batch boundaries."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        cohens_kappa,
        cohens_kappa_from_cm,
    )

    src = os.path.join(workdir, "landing_kappa")
    schema = "a string, b string"
    labels = ["x", "y", "z"]
    rows1 = [
        (labels[i % 3], labels[i % 3 if i % 4 else (i + 1) % 3])
        for i in range(120)
    ]
    rows2 = [
        (labels[i % 3], labels[(i + (0 if i % 5 else 1)) % 3])
        for i in range(80)
    ]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_confusion_counts(stream, "a", "b")
        .writeStream.format("memory")
        .queryName("kappa_cm")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_kappa"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = cohens_kappa_from_cm(spark.table("kappa_cm")).collect()[0]
    expect = cohens_kappa(spark.read.parquet(src), "a", "b").collect()[0]
    assert tuple(got) == tuple(expect)
    assert got.n == 200 and 0 < got.kappa_ppm < 1_000_000


def test_streaming_score_counts_feed_auc(spark, workdir):
    """AUC monitoring without rereading rows (r11 eval binding, VERDICT
    r10 #6): a LIVE streaming per-score count snapshot through
    auc_from_score_counts equals the batch auc_mann_whitney over the
    same rows — bit-identical, across micro-batch boundaries, ties and
    both classes present in every score bucket."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        auc_from_score_counts,
        auc_mann_whitney,
    )

    src = os.path.join(workdir, "landing_auc")
    schema = "score long, label long"
    # heavy ties (21 distinct scores), label correlated with score but
    # noisy, split across two files = two micro-batches
    rows1 = [(i % 21, 1 if (i * 7 + i % 21) % 3 == 0 else 0) for i in range(150)]
    rows2 = [(i % 21, 1 if (i % 21) > 9 and i % 2 == 0 else 0) for i in range(110)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_score_counts(stream, "score", "label")
        .writeStream.format("memory")
        .queryName("auc_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_auc"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = auc_from_score_counts(spark.table("auc_counts")).collect()[0]
    expect = auc_mann_whitney(
        spark.read.parquet(src), "score", "label"
    ).collect()[0]
    assert tuple(got) == tuple(expect)
    assert got.n_pos + got.n_neg == 260 and got.n_scores == 21
    assert got.auc_ppm is not None


def test_streaming_bucket_counts_feed_woe_iv(spark, workdir):
    """Feature-screen monitoring without rereading rows (r14 eval
    binding): a LIVE streaming per-bucket label-count snapshot through
    woe_iv_from_counts equals the batch woe_iv_screen over the same
    rows — bit-identical, across micro-batch boundaries, including a
    zero-cell bucket (NULL WOE on both paths)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        woe_iv_from_counts,
        woe_iv_screen,
    )

    src = os.path.join(workdir, "landing_woe")
    schema = "b string, y long"
    rows1 = [("A", 0)] * 20 + [("A", 1)] * 5 + [("B", 0)] * 5 + [("B", 1)] * 15
    rows2 = [("A", 1)] * 5 + [("B", 0)] * 5 + [("Z", 0)] * 7  # Z: zero bads
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_bucket_label_counts(stream, "b", "y")
        .writeStream.format("memory")
        .queryName("woe_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_woe"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(tuple, woe_iv_from_counts(spark.table("woe_counts")).collect())
    )
    expect = sorted(
        map(tuple, woe_iv_screen(spark.read.parquet(src), "b", "y").collect())
    )
    assert got == expect
    z = [r for r in got if r[0] == "Z"][0]
    assert z[3] is None and z[4] is None  # zero-cell guard held live


def test_streaming_duration_counts_feed_kaplan_meier(spark, workdir):
    """Survival monitoring without rereading rows (r14 eval binding): a
    LIVE streaming per-duration count snapshot through
    kaplan_meier_from_counts equals the batch kaplan_meier over the same
    completed subjects — bit-identical, across micro-batch boundaries,
    censoring included."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        kaplan_meier,
        kaplan_meier_from_counts,
    )

    src = os.path.join(workdir, "landing_km")
    schema = "dur long, ev long"
    rows1 = [(d % 9 + 1, 1 if d % 3 else 0) for d in range(80)]
    rows2 = [(d % 12 + 1, 1 if d % 4 else 0) for d in range(60)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_duration_counts(stream, "dur", "ev")
        .writeStream.format("memory")
        .queryName("km_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_km"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(tuple, kaplan_meier_from_counts(spark.table("km_counts")).collect())
    )
    expect = sorted(
        map(tuple, kaplan_meier(spark.read.parquet(src), [], "dur", "ev").collect())
    )
    assert got == expect and len(got) == 12


def test_streaming_band_coverage_matches_batch_eval(spark, workdir):
    """The production split of the band eval: band fitted OFFLINE by the
    exact grouped quantile, coverage monitored ONLINE by a stream-static
    broadcast join + counters — the snapshot's coverage equals the batch
    quantile_coverage_eval over the same rows."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        quantile_coverage_eval,
    )
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile,
    )

    src = os.path.join(workdir, "landing_band")
    schema = "g string, v long, tie long"
    rows1 = [("a" if i % 2 else "b", (i * 37) % 1000, i) for i in range(300)]
    rows2 = [
        ("a" if i % 2 else "b", (i * 91) % 1000, 1000 + i) for i in range(200)
    ]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    batch = spark.read.parquet(src)
    qs = grouped_weighted_quantile(["g"], ["v", "tie"], "_w", [(1, 10), (9, 10)])(
        batch.withColumn("_w", F.lit(1))
    )
    bands = qs.groupBy("g").agg(
        F.min(F.when((F.col("q_num") == 1), F.col("v"))).cast("long").alias(
            "band_lo"
        ),
        F.min(F.when((F.col("q_num") == 9), F.col("v"))).cast("long").alias(
            "band_hi"
        ),
    )

    stream = ST.file_stream(
        spark, src, batch.schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_band_coverage(stream, bands, ["g"], "v")
        .writeStream.format("memory")
        .queryName("band_cov")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_band"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    live = {
        r.g: (r.n, r.n_inside) for r in spark.table("band_cov").collect()
    }
    expect = {
        r.g: (r.n, r.n_inside)
        for r in quantile_coverage_eval(batch, ["g"], ["v", "tie"]).collect()
    }
    assert live == expect
    assert set(live) == {"a", "b"}


def test_growth_accounting_sink_matches_batch_and_replays_clean(spark, workdir):
    """Streaming DAU state == batch growth accounting bit-for-bit —
    including a user whose FIRST activity arrives in a later micro-batch
    with an EARLIER day (out-of-order first-seen), and a replayed batch
    adds nothing."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        growth_accounting,
    )

    d = dt.date
    src = os.path.join(workdir, "landing_growth")
    schema = "u long, day date"
    batch1 = [(1, d(2024, 1, 2)), (2, d(2024, 1, 2)), (1, d(2024, 1, 3))]
    batch2 = [
        (3, d(2024, 1, 3)),
        (2, d(2024, 1, 1)),  # out-of-order: user 2's true first day
        (1, d(2024, 1, 2)),  # duplicate across batches
    ]
    _write_source_files(spark, src, batch1, schema)
    _write_source_files(spark, src, batch2, schema)

    activity = os.path.join(workdir, "activity_state")
    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = ST.growth_accounting_sink(
        stream, "u", "day", activity, os.path.join(workdir, "ckpt_growth")
    )
    ST.run_to_completion(q)

    got = sorted(
        tuple(r)
        for r in growth_accounting(
            spark.read.parquet(activity), "u", "day"
        ).collect()
    )
    expect = sorted(
        tuple(r)
        for r in growth_accounting(
            spark.read.parquet(src), "u", "day"
        ).collect()
    )
    assert got == expect
    # user 2's first day correctly moved to Jan 1 despite arriving late
    by_day = {str(r[0]): r for r in got}
    assert by_day["2024-01-01"][2] == 1  # new on Jan 1

    # replay the whole source through a FRESH checkpoint: state unchanged
    n_before = spark.read.parquet(activity).count()
    q = ST.growth_accounting_sink(
        stream, "u", "day", activity, os.path.join(workdir, "ckpt_growth2")
    )
    ST.run_to_completion(q)
    assert spark.read.parquet(activity).count() == n_before


def test_native_session_window_matches_batch_sessionize(spark, workdir):
    """The built-in session_window streaming aggregation groups events
    into the SAME sessions as the batch window-pass sessionize (away
    from the exact-gap boundary), across micro-batch splits."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: (t0 + dt.timedelta(seconds=sec))  # noqa: E731
    gap_s = 60
    rows1 = [
        (1, s(0)), (1, s(30)), (1, s(50)),       # session A (3 events)
        (2, s(10)),                               # session C starts
    ]
    rows2 = [
        (1, s(200)), (1, s(230)),                 # session B (2 events)
        (2, s(45)), (2, s(300)),                  # C grows; session D
    ]
    src = os.path.join(workdir, "landing_sess")
    schema = "u long, ts timestamp"
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_session_windows(stream, ["u"], "ts", gap=f"{gap_s} seconds")
        .writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    live = {
        (r.u, r.session_start): r.n_events
        for r in spark.table("native_sessions").collect()
    }
    batch = sessionize(
        spark.read.parquet(src), ["u"], "ts", gap_micros=gap_s * 1_000_000
    )
    expect = {
        (r.u, r.session_start): r.n
        for r in batch.groupBy(
            "u", "session_seq"
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    }
    assert live == expect
    assert live[(1, t0)] == 3  # the split-across-batches session merged


def test_streaming_arm_counters_feed_ucb(spark, workdir):
    """Bandit monitoring without rereading rows: a LIVE streaming
    per-arm counter snapshot (count/sum/max — all mergeable) through
    ucb_from_arm_state equals the batch ucb_arm_scores over the same
    rows, across micro-batch boundaries."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        ucb_arm_scores,
        ucb_from_arm_state,
    )

    src = os.path.join(workdir, "landing_ucb")
    schema = "arm string, r long"
    rows1 = [("a", (i * 7) % 100) for i in range(60)] + [("b", 50)] * 5
    rows2 = [("b", (i * 13) % 90) for i in range(40)] + [("c", 99)] * 3
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        stream.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("r").cast("long")).alias("reward_sum"),
            F.max(F.col("r").cast("long")).alias("reward_max"),
        )
        .writeStream.format("memory")
        .queryName("ucb_arms")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_ucb"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        tuple(r) for r in ucb_from_arm_state(spark.table("ucb_arms")).collect()
    )
    expect = sorted(
        tuple(r)
        for r in ucb_arm_scores(spark.read.parquet(src), "arm", "r").collect()
    )
    assert got == expect and len(got) == 3


def test_streaming_transition_counts_feed_entropy(spark, workdir):
    """Live next-event predictability (r15 eval binding): a streaming
    per-(group, src, dst) count snapshot through
    transition_entropy_from_counts equals the batch transition_entropy
    over the same transitions — bit-identical across micro-batch
    boundaries, NULL heads/tails excluded on both paths."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        transition_entropy,
        transition_entropy_from_counts,
    )

    src = os.path.join(workdir, "landing_trans")
    schema = "g string, s string, t string"
    rows1 = [
        ("d", "a", ["b", "c", "b"][i % 3]) for i in range(30)
    ] + [("d", "b", "a")] * 10 + [("n", "a", None)] * 5
    rows2 = [("n", "x", "y")] * 8 + [("n", "y", ["x", "y"][i % 2]) for i in range(12)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_transition_counts(stream, ["g"], "s", "t")
        .writeStream.format("memory")
        .queryName("trans_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_trans"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(
            tuple,
            transition_entropy_from_counts(
                spark.table("trans_counts"), ["g"]
            ).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            transition_entropy(
                spark.read.parquet(src), ["g"], "s", "t"
            ).collect(),
        )
    )
    assert got == expect and len(got) == 2


def test_streaming_bin_counts_feed_density_ratio(spark, workdir):
    """Live covariate-shift weights (r15 binding): a live SOURCE
    stream's bin counters against a FROZEN target count grid through
    density_ratio_from_counts equal the batch density_ratio_weights
    over the same rows — weights AND ESS bit-identical."""
    from dwh_etl_ods_spark_jobs_spark.curation import (
        density_ratio_from_counts,
        density_ratio_weights,
    )

    src = os.path.join(workdir, "landing_bins")
    schema = "bin string"
    rows1 = [(b,) for b in ["en"] * 30 + ["de"] * 10 + ["fr"] * 5]
    rows2 = [(b,) for b in ["en"] * 10 + ["de"] * 20 + ["zz"] * 3]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)
    target = spark.createDataFrame(
        [("en", 10), ("de", 30), ("fr", 10), ("tgt_only", 7)],
        "bin string, n_target long",
    )

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_bin_counts(stream, "bin", "n_source")
        .writeStream.format("memory")
        .queryName("bin_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_bins"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(
            tuple,
            density_ratio_from_counts(
                spark.table("bin_counts"), target
            ).collect(),
        )
    )
    # batch path: rebuild the SAME target multiset as rows
    tgt_rows = spark.createDataFrame(
        [(b,) for b, n in [("en", 10), ("de", 30), ("fr", 10), ("tgt_only", 7)]
         for _ in range(n)],
        "bin string",
    )
    expect = sorted(
        map(
            tuple,
            density_ratio_weights(
                spark.read.parquet(src), tgt_rows, "bin"
            ).collect(),
        )
    )
    assert got == expect
    assert {r[0] for r in got} == {"en", "de", "fr", "zz"}  # zz src-only


def test_streaming_duration_counts_feed_nelson_aalen(spark, workdir):
    """The SAME maintained duration-count state that feeds Kaplan-Meier
    also feeds the Nelson-Aalen hazard (r15 binding) — one streaming
    grid, two survival readouts, both bit-identical to batch."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        nelson_aalen,
        nelson_aalen_from_counts,
    )

    src = os.path.join(workdir, "landing_na")
    schema = "dur long, ev long"
    rows1 = [(d % 9 + 1, 1 if d % 3 else 0) for d in range(80)]
    rows2 = [(d % 12 + 1, 1 if d % 4 else 0) for d in range(60)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_duration_counts(stream, "dur", "ev")
        .writeStream.format("memory")
        .queryName("na_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_na"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(tuple, nelson_aalen_from_counts(spark.table("na_counts")).collect())
    )
    expect = sorted(
        map(
            tuple,
            nelson_aalen(spark.read.parquet(src), [], "dur", "ev").collect(),
        )
    )
    assert got == expect and len(got) == 12


def test_streaming_bucket_counts_feed_isotonic(spark, workdir):
    """One maintained per-bucket label-count state, TWO readouts: the
    same streaming grid that feeds the WOE/IV screen recalibrates a
    score via the isotonic fit (r16 binding) — snapshot through
    isotonic_from_counts equals the batch isotonic_calibration_bins
    over the same rows, bit-identical."""
    from pyspark.sql import functions as F
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_calibration_bins,
        isotonic_from_counts,
    )

    src = os.path.join(workdir, "landing_iso")
    schema = "score long, lbl long"
    rows1 = [((i * 2003) % 1000001, 1 if (i % 7) < 3 else 0) for i in range(150)]
    rows2 = [((i * 104729) % 1000001, i % 2) for i in range(120)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    # the bucket key IS the isotonic bin: score*B div 1e6+1
    bucketed = stream.withColumn(
        "bucket", F.expr("CAST(score AS BIGINT) * 10 div 1000001")
    )
    q = (
        ST.streaming_bucket_label_counts(bucketed, "bucket", "lbl")
        .writeStream.format("memory")
        .queryName("iso_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_iso"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    grid = spark.table("iso_counts").select(
        F.col("bucket").alias("bin"),
        (F.col("n_good") + F.col("n_bad")).cast("long").alias("n"),
        F.col("n_bad").cast("long").alias("n_pos"),
    )
    got = sorted(map(tuple, isotonic_from_counts(grid).collect()))
    expect = sorted(
        map(
            tuple,
            isotonic_calibration_bins(
                spark.read.parquet(src), "score", "lbl", 10
            ).collect(),
        )
    )
    assert got == expect and len(got) == 10


def test_streaming_token_counts_feed_vocab_richness(spark, workdir):
    """The SAME maintained unigram state that feeds KL drift also
    answers the corpus-coverage question (r16 binding): a streaming
    token-count snapshot through vocab_richness_from_counts equals the
    batch vocab_richness over the same documents, bit-identical."""
    from dwh_etl_ods_spark_jobs_spark.curation import (
        vocab_richness,
        vocab_richness_from_counts,
    )

    src = os.path.join(workdir, "landing_vocab")
    schema = "text string"
    rows1 = [("alpha beta gamma alpha",), ("beta delta",)]
    rows2 = [("epsilon zeta beta",), ("alpha theta theta",)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_token_counts(stream, "text")
        .writeStream.format("memory")
        .queryName("vocab_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_vocab"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(
            tuple,
            vocab_richness_from_counts(spark.table("vocab_counts")).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            vocab_richness(spark.read.parquet(src), "text").collect(),
        )
    )
    assert got == expect and len(got) == 1


def test_streaming_bucket_counts_feed_stump_screen(spark, workdir):
    """A third readout from the SAME per-bucket label-count state
    (after WOE/IV and isotonic, r17 binding): the decision-stump best
    split from streaming counters equals the batch screen over the
    same rows, bit-identical."""
    from pyspark.sql import functions as F
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        stump_from_counts,
        stump_split_gain,
    )

    src = os.path.join(workdir, "landing_stump")
    schema = "f string, b long, l long"
    rows1 = [("len", i % 5, 1 if i % 5 >= 3 else 0) for i in range(90)]
    rows2 = [("len", i % 6, i % 2) for i in range(60)] + [
        ("toks", i % 4, 1 if i % 4 == 3 else 0) for i in range(40)
    ]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    bucketed = stream.withColumn(
        "bucket", F.concat_ws(":", F.col("f"), F.col("b").cast("string"))
    )
    q = (
        ST.streaming_bucket_label_counts(bucketed, "bucket", "l")
        .writeStream.format("memory")
        .queryName("stump_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_stump"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    grid = spark.table("stump_counts").select(
        F.split(F.col("bucket"), ":")[0].alias("feature"),
        F.split(F.col("bucket"), ":")[1].cast("long").alias("bin"),
        (F.col("n_good") + F.col("n_bad")).cast("long").alias("_n"),
        F.col("n_bad").cast("long").alias("_p"),
    )
    got = sorted(map(tuple, stump_from_counts(grid).collect()))
    expect = sorted(
        map(
            tuple,
            stump_split_gain(
                spark.read.parquet(src), "f", "b", "l"
            ).collect(),
        )
    )
    assert got == expect and len(got) == 2


def test_streaming_assignment_counts_feed_srm(spark, workdir):
    """Live randomizer health gate (r14 eval binding, VERDICT r11 #5): a
    streaming per-(experiment, variant) count snapshot through
    srm_from_counts equals the batch srm_check over the same exposure
    rows — chi2 and flag bit-identical across micro-batch boundaries."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        srm_check,
        srm_from_counts,
    )

    src = os.path.join(workdir, "landing_assign")
    schema = "exp string, variant string"
    # exp_ok: near-equal 3-way split; exp_bad: 2-way split badly skewed
    rows1 = [("exp_ok", ["a", "b", "c"][i % 3]) for i in range(60)] + [
        ("exp_bad", "t") for _ in range(40)
    ]
    rows2 = [("exp_bad", "c") for _ in range(10)] + [
        ("exp_ok", ["a", "b", "c"][i % 3]) for i in range(21)
    ]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_assignment_counts(stream, "exp", "variant")
        .writeStream.format("memory")
        .queryName("assign_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_assign"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    thr = 13_816_000  # chi2 crit 0.001 at 2 df, micro-units
    got = sorted(
        map(
            tuple,
            srm_from_counts(spark.table("assign_counts"), thr).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            srm_check(
                spark.read.parquet(src), "exp", "variant", thr
            ).collect(),
        )
    )
    assert got == expect and len(got) == 2
    by_exp = {r[0]: r for r in got}
    assert by_exp["exp_bad"][4] == 1  # 40/10 split: flagged
    assert by_exp["exp_ok"][4] == 0


def test_streaming_period_counts_feed_dispersion(spark, workdir):
    """Live burstiness (r12 eval binding): a streaming per-(group,
    period) count snapshot fed straight into dispersion_index (whose
    input contract IS a per-period count frame) equals the batch Fano
    readout over the same rows — bit-identical across micro-batch
    boundaries, including the bursty flag."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.stats import dispersion_index

    src = os.path.join(workdir, "landing_periods")
    schema = "g string, day long"
    # steady: one event per day over 30 days; bursty: 40 events on one
    # day plus singletons
    rows1 = [("steady", d) for d in range(30)] + [("bursty", 0)] * 25
    rows2 = [("bursty", 0)] * 15 + [("bursty", d) for d in range(1, 6)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_period_counts(stream, ["g"], "day")
        .writeStream.format("memory")
        .queryName("period_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_periods"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(
            tuple,
            dispersion_index(
                spark.table("period_counts"), ["g"], "n"
            ).collect(),
        )
    )
    batch_rollup = (
        spark.read.parquet(src)
        .groupBy("g", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    expect = sorted(
        map(tuple, dispersion_index(batch_rollup, ["g"], "n").collect())
    )
    assert got == expect and len(got) == 2
    by_g = {r[0]: r for r in got}
    assert by_g["bursty"][4] == 1  # overdispersed
    assert by_g["steady"][4] == 0  # Fano 0 for the all-ones series


def test_streaming_confusion_counts_feed_kappa(spark, workdir):
    """Live inter-annotator agreement (r13 eval binding, VERDICT r12
    #6): a streaming per-(label_a, label_b) confusion-cell snapshot
    through cohens_kappa_from_cm equals the batch cohens_kappa over the
    same label-pair rows — po/pe/kappa bit-identical across micro-batch
    boundaries."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        cohens_kappa,
        cohens_kappa_from_cm,
    )

    src = os.path.join(workdir, "landing_kappa")
    schema = "a string, b string"
    labels = ["cat", "dog", "bird"]
    # mostly-agreeing raters with a deterministic disagreement stripe
    rows1 = [
        (labels[i % 3], labels[(i % 3) if i % 5 else (i + 1) % 3])
        for i in range(90)
    ]
    rows2 = [
        (labels[(i * 7) % 3], labels[((i * 7) % 3) if i % 4 else (i + 2) % 3])
        for i in range(60)
    ]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_confusion_counts(stream, "a", "b")
        .writeStream.format("memory")
        .queryName("kappa_cells")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_kappa"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(
            tuple,
            cohens_kappa_from_cm(spark.table("kappa_cells")).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            cohens_kappa(spark.read.parquet(src), "a", "b").collect(),
        )
    )
    assert got == expect and len(got) == 1
    n, po_ppm, pe_ppm, kappa_ppm = got[0]
    assert n == 150 and kappa_ppm > 0  # agreement above chance


def test_streaming_bucket_counts_feed_pr_sweep(spark, workdir):
    """Live precision/recall operating points (r13 eval binding,
    VERDICT r12 #6): the SAME per-bucket label-count state that feeds
    WOE/IV, isotonic, and the stump screen snapshots through
    pr_sweep_from_counts into a live PR/F1 sweep — bit-identical to the
    batch groupBy over the same scored rows. The live bins are FIXED
    ppm-score thresholds (a per-row expression a counter can key on);
    the battery entry's equal-frequency rank deciles are
    snapshot-relative (an exact rank cannot be maintained
    incrementally), the trade documented on pr_sweep_from_counts."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pr_sweep_from_counts,
    )

    src = os.path.join(workdir, "landing_pr")
    schema = "score long, lbl long"
    # higher scores enriched for positives, so the sweep is non-trivial
    rows1 = [
        ((i * 2003) % 1000001, 1 if ((i * 2003) % 1000001) > 600000 and i % 3 else i % 7 == 0)
        for i in range(140)
    ]
    rows1 = [(s, int(l)) for s, l in rows1]
    rows2 = [((i * 104729) % 1000001, int(i % 2 == 0)) for i in range(110)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    bucketed = stream.withColumn(
        "bucket", F.expr("CAST(score AS BIGINT) * 10 div 1000001")
    )
    q = (
        ST.streaming_bucket_label_counts(bucketed, "bucket", "lbl")
        .writeStream.format("memory")
        .queryName("pr_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_pr"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    grid = spark.table("pr_counts").select(
        F.col("bucket").alias("bin"),
        (F.col("n_good") + F.col("n_bad")).cast("long").alias("n"),
        F.col("n_bad").cast("long").alias("n_pos"),
    )
    got = sorted(map(tuple, pr_sweep_from_counts(grid).collect()))
    batch_grid = (
        spark.read.parquet(src)
        .groupBy(
            F.expr("CAST(score AS BIGINT) * 10 div 1000001").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("lbl").cast("long")).cast("long").alias("n_pos"),
        )
    )
    expect = sorted(map(tuple, pr_sweep_from_counts(batch_grid).collect()))
    assert got == expect and len(got) == 10
    # cumulative-from-the-top invariants: recall monotone nonincreasing
    # in bin, tp+fn constant at the positive total
    by_bin = sorted(got)
    allpos = by_bin[0][1] + by_bin[0][3]
    assert all(r[1] + r[3] == allpos for r in by_bin)
    recalls = [r[5] for r in sorted(got, reverse=True)]
    assert recalls == sorted(recalls)  # rises as threshold drops


def test_streaming_transition_counts_feed_markov_attribution(spark, workdir):
    """Live removal-effect attribution (r14 eval binding, VERDICT r13
    #6): the SAME per-(src, dst) transition-count state that feeds the
    transition-entropy readout snapshots through
    markov_attribution_from_counts into the full Markov removal-effect
    attribution — bit-identical to the batch
    markov_removal_attribution over the same journey transitions. ONE
    maintained counter grid, two decision readouts, no journey-log
    re-read."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_attribution_from_counts,
        markov_removal_attribution,
    )

    src = os.path.join(workdir, "landing_markov")
    schema = "src string, dst string"
    rows1 = (
        [("_START_", "ads")] * 12
        + [("_START_", "email")] * 8
        + [("ads", "email")] * 6
        + [("ads", "_CONV_")] * 4
        + [("ads", "_NULL_")] * 2
    )
    rows2 = (
        [("email", "ads")] * 3
        + [("email", "_CONV_")] * 9
        + [("email", "_NULL_")] * 4
        + [("_START_", "social")] * 5
        + [("social", "_CONV_")] * 2
        + [("social", "_NULL_")] * 3
    )
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_transition_counts(stream, [], "src", "dst")
        .writeStream.format("memory")
        .queryName("markov_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_markov"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    grid = spark.table("markov_counts").select(
        "_s", F.col("_t").alias("_d"), F.col("_n_st").alias("_c")
    )
    got = sorted(map(tuple, markov_attribution_from_counts(grid).collect()))
    expect = sorted(
        map(
            tuple,
            markov_removal_attribution(spark.read.parquet(src)).collect(),
        )
    )
    assert got == expect and len(got) == 3  # ads, email, social
    # every channel's removal effect is nonnegative (value iteration
    # from below) and the base conversion is shared across rows
    assert all(r[3] >= 0 for r in got) and len({r[1] for r in got}) == 1


def test_streaming_group_sums_feed_loo_influence(spark, workdir):
    """Live data-valuation readout (r14 eval binding, VERDICT r13 #6):
    per-group (n_g, sum_g) counters snapshot through loo_from_counts
    into the leave-one-group-out influence table — bit-identical to the
    batch loo_group_influence over the same rows. The global totals
    fold FROM the state, so the live form needs no second data pass."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        loo_from_counts,
        loo_group_influence,
    )

    src = os.path.join(workdir, "landing_loo")
    schema = "source string, v long"
    rows1 = [("web", 10)] * 20 + [("app", 50)] * 5 + [("feed", 30)] * 8
    rows2 = [("web", 20)] * 10 + [("feed", 90)] * 2 + [("app", 40)] * 6
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_group_sums(stream, ["source"], "v")
        .writeStream.format("memory")
        .queryName("loo_sums")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_loo"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(
            tuple,
            loo_from_counts(spark.table("loo_sums"), ["source"]).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            loo_group_influence(
                spark.read.parquet(src), ["source"], "v"
            ).collect(),
        )
    )
    assert got == expect and len(got) == 3


def test_streaming_arm_moments_feed_smd_balance(spark, workdir):
    """Live covariate-balance table (r14 eval binding, VERDICT r13 #6):
    per-(covariate, arm) exact-moment state snapshots through
    smd_from_moments into the standardized-mean-difference balance
    table — bit-identical to the batch smd_balance_check over the same
    exposures, so imbalance flags fire DURING enrollment (the SRM
    posture)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        smd_balance_check,
        smd_from_moments,
    )

    src = os.path.join(workdir, "landing_smd")
    schema = "arm string, age long, spend long"
    rows1 = [("A", 30 + i % 7, 100 + 3 * (i % 11)) for i in range(40)]
    rows2 = [("B", 33 + i % 5, 90 + 2 * (i % 13)) for i in range(35)]
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_arm_covariate_moments(stream, "arm", ["age", "spend"])
        .writeStream.format("memory")
        .queryName("smd_moments")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_smd"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(tuple, smd_from_moments(spark.table("smd_moments")).collect())
    )
    expect = sorted(
        map(
            tuple,
            smd_balance_check(
                spark.read.parquet(src), "arm", ["age", "spend"]
            ).collect(),
        )
    )
    assert got == expect and len(got) == 2  # one row per covariate


def test_streaming_strata_sums_feed_stratified_ate(spark, workdir):
    """Live observational effect estimate (r14 eval binding #2): the
    per-stratum arm-count + cents-sum state snapshots through
    stratified_ate_from_counts into the subclassification ATE readout —
    bit-identical to the batch stratified_ate over the same rows,
    INCLUDING the common-support exclusion (the 'lo' stratum below has
    no control arm and must be reported unsupported on both paths)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        stratified_ate,
        stratified_ate_from_counts,
    )

    src = os.path.join(workdir, "landing_ate")
    schema = "bin string, t long, y double"
    rows1 = (
        [("mid", 1, 12.5)] * 8 + [("mid", 0, 10.0)] * 12
        + [("hi", 1, 30.0)] * 5 + [("lo", 1, 4.0)] * 6
    )
    rows2 = [("hi", 0, 26.0)] * 7 + [("mid", 1, 13.0)] * 4
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    q = (
        ST.streaming_strata_outcome_sums(stream, "bin", "t", "y")
        .writeStream.format("memory")
        .queryName("ate_sums")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_ate"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    got = sorted(
        map(
            tuple,
            stratified_ate_from_counts(spark.table("ate_sums")).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            stratified_ate(spark.read.parquet(src), "bin", "t", "y").collect(),
        )
    )
    assert got == expect and len(got) == 3
    by_bin = {r[0]: r for r in got}
    assert by_bin["lo"][4] == 0  # no control arm: unsupported, reported
    assert by_bin["mid"][4] == 1 and by_bin["hi"][4] == 1


def test_streaming_group_sums_feed_diff_in_diff(spark, workdir):
    """Live parallel-trends contrast (r14 eval binding #2): the generic
    per-(treated, period) group-sum counters over a cents-folded
    outcome stream snapshot through did_from_cells into the DiD
    readout — bit-identical to the batch diff_in_diff over the same
    rows. No dedicated state shape needed: the 2x2 grid IS
    streaming_group_sums on two keys."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        did_from_cells,
        diff_in_diff,
    )

    src = os.path.join(workdir, "landing_did")
    schema = "treated long, period long, y double"
    rows1 = (
        [(1, 0, 10.0)] * 10 + [(0, 0, 9.0)] * 12
        + [(1, 1, 16.0)] * 9
    )
    rows2 = [(0, 1, 11.5)] * 11 + [(1, 1, 15.0)] * 3
    _write_source_files(spark, src, rows1, schema)
    _write_source_files(spark, src, rows2, schema)

    stream = ST.file_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    ).withColumn(
        "cents", F.round(F.col("y").cast("double") * F.lit(100.0)).cast("long")
    )
    q = (
        ST.streaming_group_sums(stream, ["treated", "period"], "cents")
        .writeStream.format("memory")
        .queryName("did_sums")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_did"))
        .trigger(availableNow=True)
        .start()
    )
    ST.run_to_completion(q)

    cells = spark.table("did_sums").select(
        "treated",
        "period",
        F.col("n_g").alias("n"),
        F.col("sum_g").alias("_s"),
    )
    got = sorted(map(tuple, did_from_cells(cells).collect()))
    expect = sorted(
        map(
            tuple,
            diff_in_diff(
                spark.read.parquet(src), "treated", "period", "y"
            ).collect(),
        )
    )
    assert got == expect and len(got) == 4
    # hand DiD: (15.75-10) - (11.5-9) = 3.25 dollars > 0
    assert got[0][4] > 0 and len({r[4] for r in got}) == 1
