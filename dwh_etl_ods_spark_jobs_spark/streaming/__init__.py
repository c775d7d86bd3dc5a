"""Structured Streaming surface: micro-batch incremental loads + windowed
aggregation.

The reference is a scheduled batch ETL with zero streaming (SURVEY.md
§2.10); its incremental-ness is the null-safe anti-join re-run per schedule
(``LoadCTPatients.java:182``). This module is the scale-path extension: the
same operator pipeline (dedupe -> clean -> normalize -> anti-join -> hash)
driven by ``readStream``/``foreachBatch`` so new source files (the
object-storage landing zone of a 100 TB pipeline) load continuously with
exactly-once sink semantics from checkpointing + the anti-join's natural
idempotency — re-delivered rows are filtered against the target again, so
the pipeline is safe under micro-batch replay.

Why ``foreachBatch`` and not a stateful streaming join: the "is this row
already in the target" predicate needs the *whole* target relation, which
is a batch table, not a stream; per-batch batch-joins against it are the
idiomatic Spark pattern (and let Catalyst pick broadcast vs SMJ per batch).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dwh_etl_ods_spark_jobs_spark.operators import anti_join_new, dedupe_latest


def _error_condition(e: AnalysisException) -> str:
    """The exception's error condition name (getCondition on Spark 4;
    getErrorClass — deprecated there — on older runtimes)."""
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(e, attr, None)
        if fn is not None:
            return fn() or ""
    return ""


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """True if ``path`` exists, via the JVM Hadoop FileSystem API (works for
    any Hadoop-supported scheme, not just local files).

    Requires a classic (JVM-gateway) session; under Spark Connect there is
    no ``_jvm``, so fall back to probing the path with a parquet read and
    classifying the AnalysisException — PATH_NOT_FOUND means absent,
    schema-inference failure means present-but-empty."""
    jvm = getattr(spark, "_jvm", None)
    if jvm is None:  # Spark Connect session
        try:
            spark.read.format("parquet").load(path).schema
            return True
        except AnalysisException as e:
            msg = f"{_error_condition(e)} {e}"
            if "PATH_NOT_FOUND" in msg:
                return False
            if "UNABLE_TO_INFER_SCHEMA" in msg:
                return True
            raise
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """A file-source stream over a landing directory. Schema must be
    explicit (streaming sources cannot infer)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def incremental_sink(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    dedupe_order: Sequence[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Micro-batch incremental append: per batch, (optionally) transform,
    dedupe within the batch, anti-join the current target, append the delta.

    The anti-join makes every batch idempotent — replaying a batch after a
    crash appends nothing new, which upgrades file-sink at-least-once to
    effective exactly-once at the row level.
    """
    spark = stream.sparkSession

    def _process(batch: DataFrame, batch_id: int) -> None:
        df = transform(batch) if transform is not None else batch
        if dedupe_order:
            df = df.transform(
                dedupe_latest(list(keys), [F.col(c).desc() for c in dedupe_order])
            )
        else:
            df = df.dropDuplicates(list(keys))
        # Existence is checked explicitly via the Hadoop FS API rather than
        # a bare except around the read: a bare except would treat a
        # transient storage error or corrupt target as "first batch" and
        # append the whole batch undeduplicated, silently breaking the
        # idempotency guarantee exactly when a batch replays after a fault.
        # One legitimate first-batch shape remains behind the existence
        # check: a failed/partial first write leaves the directory existing
        # but with NO readable parquet data files (the commit protocol
        # creates the dir and _temporary before committing), so the target
        # read throws schema-inference AnalysisException on every retry and
        # the stream could never recover. That specific failure falls back
        # to delta=df; IO/runtime errors still propagate so the micro-batch
        # fails and retries.
        if _hadoop_path_exists(spark, target_path):
            try:
                target = spark.read.parquet(target_path)
            except AnalysisException as e:
                # Only the dir-exists-but-no-committed-data-files shape may
                # fall back to first-batch semantics; any other analysis
                # failure (corrupt footer, incompatible schema, ...) must
                # fail the micro-batch rather than append undeduplicated.
                msg = f"{_error_condition(e)} {e}"
                if "UNABLE_TO_INFER_SCHEMA" not in msg and "PATH_NOT_FOUND" not in msg:
                    raise
                target = None
            delta = (
                df.transform(anti_join_new(target, list(keys)))
                if target is not None
                else df
            )
        else:  # first batch: target does not exist yet
            delta = df
        delta.write.mode("append").parquet(target_path)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "1 hour",
    group_cols: Sequence[str] = (),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream — the
    late-data-tolerant rollup a monitoring pipeline runs next to the loads.
    State is bounded by the watermark; counts finalize once event time
    passes window_end + watermark.

    ``aggs`` maps output alias -> aggregate Column (like ``tumbling_rollup``);
    the default keeps the historical ``sum(value) AS sum_value`` so streams
    without a ``value`` column pass their own aggregates instead of crashing.
    Aliases colliding with the reserved output columns (``n_events``,
    ``window_start``, ``window_end``) or with a group column are rejected —
    they would produce duplicate/ambiguous output columns downstream."""
    if aggs is None:
        aggs = {"sum_value": F.sum("value")}
    reserved = {"n_events", "window_start", "window_end", *group_cols}
    clash = sorted(reserved & set(aggs))
    if clash:
        raise ValueError(
            f"windowed_counts: aggs aliases {clash} collide with reserved "
            f"output columns or group_cols"
        )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *[expr.alias(name) for name, expr in aggs.items()],
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            *aggs.keys(),
        )
    )


def dedupe_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """At-source streaming dedup with bounded state:
    ``withWatermark(ts).dropDuplicatesWithinWatermark(keys)`` keeps one row
    per key among events whose timestamps fall within the watermark of the
    first-seen row, then EXPIRES that key's state — unlike a plain
    ``dropDuplicates`` on a stream, whose key state grows forever. The
    upstream half of the incremental sink's idempotency story: duplicates
    from at-least-once sources (Kafka redelivery, file re-lands) die here
    cheaply; replays older than the watermark still die at the sink's
    anti-join."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stateful_sessionize(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Custom stateful streaming operator: per-user gap sessionization via
    ``applyInPandasWithState`` — the escape hatch for semantics the built-in
    windowed aggregates can't express (a session closes ``gap_seconds``
    after its last event, whenever that is).

    Per micro-batch and user, events fold into (session_start, last_ts,
    n_events) state; a gap larger than ``gap_seconds`` CLOSES the running
    session (emitted downstream, output mode append) and opens a new one.
    The trailing open session closes via EVENT-TIME TIMEOUT: a watermark
    (``withWatermark(ts_col, watermark_delay)``) drives
    ``GroupStateTimeout.EventTimeTimeout``, so once the watermark passes
    ``last_event + gap`` the open session is emitted and the key's state
    REMOVED — without this, a user who never returns would pin three
    scalars of state forever and total state would grow unboundedly with
    distinct users. State per live key is three scalars and every key
    expires — bounded regardless of stream length or user churn. Events
    are sorted within the batch; cross-batch reordering is the source's
    responsibility (the watermark bounds how late data can arrive).

    Returns a streaming DataFrame (user, session_start, session_end,
    n_events); attach your own sink.
    """
    out_schema = StructType(
        [
            StructField("user", StringType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        (user,) = key
        if state.hasTimedOut:
            # Watermark passed last_event + gap with no new events: the
            # open session is final. Emit it and drop the key's state.
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user": [str(user)],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
            return
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        # The group's batch arrives as MULTIPLE Arrow chunks in arbitrary
        # order — drain them all and sort ONCE, or a later chunk's earlier
        # events would be absorbed into the wrong session. NaT timestamps
        # carry no event time and are dropped.
        all_ts = pd.concat(
            [pd.to_datetime(pdf[ts_col]) for pdf in pdfs], ignore_index=True
        ).dropna()
        for t in sorted(all_ts):
            tus = t.value // 1000  # ns -> us
            if last is None:
                start, last, n = tus, tus, 1
            elif tus - last > gap_us:
                closed.append((str(user), start, last, n))
                start, last, n = tus, tus, 1
            else:
                last = max(last, tus)
                n += 1
        if last is not None:
            state.update((int(start), int(last), int(n)))
            # Expire once the watermark passes last + gap. A late batch can
            # fold events older than the current watermark into state; the
            # timeout timestamp must still be strictly beyond the watermark
            # (Spark rejects earlier values), so clamp up by 1 ms.
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last // 1000 + gap_ms, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    gap_ms = int(gap_seconds) * 1_000

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_hll(
    stream: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Continuously-maintained HyperLogLog registers over a stream —
    live distinct-count monitoring (distinct users per event type, right
    now) with state bounded at ``groups × 2^p`` register rows regardless
    of how many distinct values flow past; an exact streaming
    ``dropDuplicates`` would grow state per distinct key, forever.

    Returns the register frame (``group..., _reg, _m``) as a streaming
    stateful max-aggregation (run in update/complete mode); fold any
    snapshot of it with ``sketches.hll_fold`` for the estimate — which is
    BIT-IDENTICAL to a batch ``hll_distinct`` over the same rows
    (register max-merge is order-insensitive; pytest-pinned), so batch
    backfill and live monitor can never disagree.
    """
    from dwh_etl_ods_spark_jobs_spark.sketches import hll_registers

    return stream.transform(hll_registers(list(group_cols), value_col))


def streaming_countmin(stream: DataFrame, key_col: str) -> DataFrame:
    """Continuously-maintained count-min grid over a key stream — live
    frequency monitoring with state bounded at DEPTH×WIDTH counter rows
    no matter how many distinct keys flow past. Run in update/complete
    mode; probe any snapshot with ``sketches.countmin_estimate`` — the
    grid is a plain sum aggregation, so a snapshot is BIT-IDENTICAL to a
    batch ``countmin_counts`` over the same rows (pytest-pinned)."""
    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_counts

    return countmin_counts(stream, key_col)


def streaming_hdr_histogram(
    stream: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Continuously-maintained HDR quantile histogram over a stream —
    live latency/size percentiles with state bounded at groups × ~2k
    bucket rows regardless of how many values flow past (an exact
    streaming percentile would have to retain every row). Run in
    update/complete mode; feed any snapshot to ``sketches.hdr_quantiles``
    for the estimates — the histogram is a plain count aggregation over
    deterministic integer buckets, so a snapshot is BIT-IDENTICAL to a
    batch ``hdr_histogram`` over the same rows (pytest-pinned), and
    micro-batch boundaries can never perturb an estimate."""
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_histogram

    return stream.transform(hdr_histogram(list(group_cols), value_col))


def run_to_completion(query: StreamingQuery, timeout_s: float = 120.0) -> None:
    """Await an availableNow-triggered stream (drains all pending input then
    stops)."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within_seconds: int,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair each left row with right rows
    sharing ``key`` whose ``right_ts`` falls in ``[left_ts, left_ts +
    within_seconds]`` — the impressions⋈clicks attribution shape.

    Both sides carry the same event-time watermark and the join condition
    bounds the two event times against each other, which is exactly what
    lets Spark compute a state-eviction horizon for BOTH join buffers:
    state is bounded by (watermark + within_seconds) of data per side,
    independent of total stream length. Without the time-range condition a
    stream-stream join would buffer both sides forever.

    ``how='left_outer'`` additionally emits unmatched left rows — but only
    once the watermark passes their join window (a row can't be declared
    unmatched while a matching right row could still arrive), so outer
    results trail the watermark by design; the right-side columns are NULL.

    The right side's ``key`` column is dropped from the output (it equals
    the left's on matches and is NULL on outer rows). Works identically on
    batch frames (``withWatermark`` is a no-op there) — the
    batch-equivalence tests rely on that.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    rk = "__ssj_rk"
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = (
        right.withColumnRenamed(key, rk)
        .withWatermark(right_ts, watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{rk}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
        )
    )
    return l.join(r, cond, how).drop(rk)


def incremental_dedup_sink(
    stream: DataFrame,
    text_col: str,
    id_col: str,
    flags_path: str,
    store_path: str,
    checkpoint_dir: str,
    threshold_micro: int = 500_000,
    available_now: bool = True,
) -> StreamingQuery:
    """The production corpus-ingest loop as one micro-batch pipeline: per
    batch, flag documents against the PERSISTED MinHash signature store
    (``dedup.incremental_lsh_dedup`` — corpus text never rescanned),
    append the flag rows to ``flags_path``, and append the SURVIVORS'
    (is_new = 1) signatures to ``store_path`` so the next batch dedupes
    against them too.

    Replay-idempotent at the row level, the ``incremental_sink``
    discipline: both writes anti-join their target on ``doc_id`` first, and
    the store is filtered of the batch's own ids before flagging, so a
    replayed batch neither flags its docs against themselves nor
    double-appends. Store bootstrap: a missing/empty ``store_path`` means
    an empty store (first batch seeds it).
    """
    from dwh_etl_ods_spark_jobs_spark.dedup import (
        incremental_lsh_dedup,
        minhash_signatures,
    )

    spark = stream.sparkSession

    def _read_or_none(path: str):
        if not _hadoop_path_exists(spark, path):
            return None
        try:
            return spark.read.parquet(path)
        except AnalysisException as e:
            msg = f"{_error_condition(e)} {e}"
            if "UNABLE_TO_INFER_SCHEMA" not in msg and "PATH_NOT_FOUND" not in msg:
                raise
            return None

    def _process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).dropDuplicates(["doc_id"])
        ids = batch.select("doc_id")
        store = _read_or_none(store_path)
        store_sigs = (
            store.join(F.broadcast(ids), "doc_id", "left_anti")
            if store is not None
            else minhash_signatures(batch.limit(0), "text", "doc_id")
        )
        flags = incremental_lsh_dedup(
            batch, store_sigs, "text", "doc_id",
            threshold_micro=threshold_micro,
        ).localCheckpoint()  # eager: both writes below reuse the result
        prev_flags = _read_or_none(flags_path)
        delta_flags = (
            flags.join(prev_flags.select("doc_id"), "doc_id", "left_anti")
            if prev_flags is not None
            else flags
        )
        delta_flags.write.mode("append").parquet(flags_path)
        survivors = flags.filter(F.col("is_new") == 1).select("doc_id")
        new_sigs = minhash_signatures(
            batch.join(F.broadcast(survivors), "doc_id"), "text", "doc_id"
        )
        if store is not None:
            new_sigs = new_sigs.join(
                store.select("doc_id"), "doc_id", "left_anti"
            )
        new_sigs.write.mode("append").parquet(store_path)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_sequence(
    stream: DataFrame,
    key_col: str,
    order_cols: list[str],
    id_col: str,
) -> DataFrame:
    """Custom stateful operator #2: per-key MONOTONIC sequence numbers
    that survive across micro-batches — the ordered-ingestion primitive a
    CDC/merge consumer needs (``apply_change_feed``'s ``order_cols``) when
    the source carries no log offset of its own.

    State per key is ONE counter (the next sequence number). Each batch's
    rows for a key are sorted by ``order_cols`` (total order within the
    key — include a unique tie-break) and numbered from the stored
    counter; the counter advances and persists. Emits
    ``(key, <id_col>, seq)``; join back to the payload on the id.
    ProcessingTimeTimeout is deliberately NOT set: a sequence fountain
    must never forget a key's high-water mark (re-issuing seq 0 would
    corrupt downstream ordering), so state is one long per key FOREVER —
    size it accordingly (keys × 8 bytes; prune retired keys out-of-band
    if the key space churns).

    Cross-batch arrival order is the source's responsibility: within a
    key, whatever arrives in a later batch gets later sequence numbers
    (arrival order IS the order a log-less source can promise).
    """
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("row_id", LongType()),
            StructField("seq", LongType()),
        ]
    )
    state_schema = StructType([StructField("next_seq", LongType())])

    def fn(key, pdfs, state):
        import pandas as pd

        (k,) = key
        next_seq = state.get[0] if state.exists else 0
        cols = list(dict.fromkeys([*order_cols, id_col]))  # id may tie-break
        frames = [pdf[cols] for pdf in pdfs]
        if not frames:
            return
        allf = pd.concat(frames, ignore_index=True)
        if not len(allf):
            return
        allf = allf.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        seqs = list(range(next_seq, next_seq + len(allf)))
        state.update((next_seq + len(allf),))
        yield pd.DataFrame(
            {
                "key": [str(k)] * len(allf),
                "row_id": allf[id_col].astype("int64"),
                "seq": seqs,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(F.col(key_col)).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def cdc_apply_sink(
    feed_stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    checkpoint_dir: str,
    op_col: str = "op",
    delete_ops: Sequence[str] = ("d",),
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC apply: a Debezium-style change stream folds into a
    parquet snapshot, one micro-batch at a time (VERDICT r8 #5 — the
    streaming binding of ``operators.merge.apply_change_feed``).

    Per batch: compact the envelope to the latest change per key, read the
    current snapshot, apply inserts/updates/deletes in ONE merge
    (``apply_change_feed`` — null-safe full-outer join), and swap the new
    snapshot in atomically (write to a staging dir, then rename): a batch
    that crashes mid-write leaves the live snapshot untouched, and the
    recovery preamble finishes a swap that crashed between delete and
    rename. Replaying a batch re-merges the same envelope rows into the
    same state — the standard foreachBatch exactly-once upgrade.

    Scale: the merge join is the cost floor of any CDC apply (the same
    full-outer shape Delta/Iceberg lower MERGE INTO to); the snapshot
    rewrite is the parquet-files tradeoff — at 100 TB one would partition
    the snapshot and rewrite only partitions with changed keys, which this
    operator's swap protocol extends to per-partition staging unchanged.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.merge import apply_change_feed

    spark = feed_stream.sparkSession
    staging_path = target_path + ".cdc-staging"

    def _fs(path: str):
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath

    def _swap_in(new_state: DataFrame) -> None:
        fs, stg = _fs(staging_path)
        tgt = _fs(target_path)[1]
        new_state.write.mode("overwrite").parquet(staging_path)
        if fs.exists(tgt):
            fs.delete(tgt, True)
        if not fs.rename(stg, tgt):
            raise IOError(f"CDC snapshot swap failed: {staging_path} -> {target_path}")

    def _recover_crashed_swap() -> None:
        # Crash window: staging written, target deleted, rename pending.
        fs, stg = _fs(staging_path)
        tgt = _fs(target_path)[1]
        if fs.exists(stg) and not fs.exists(tgt):
            if not fs.rename(stg, tgt):
                raise IOError(f"CDC swap recovery failed: {staging_path}")

    def _process(batch: DataFrame, batch_id: int) -> None:
        _recover_crashed_swap()
        payload_cols = [
            c for c in batch.columns if c != op_col and c not in order_cols
        ]
        if _hadoop_path_exists(spark, target_path):
            target = spark.read.parquet(target_path)
        else:
            # first batch: fold the feed into an empty snapshot of the
            # payload schema
            target = batch.select(*payload_cols).limit(0)
        new_state = apply_change_feed(
            target, batch, keys, list(order_cols),
            op_col=op_col, delete_ops=delete_ops,
        )
        # The merge plan lazily READS the snapshot it is about to replace:
        # materialize before the swap or the overwrite would consume its
        # own input mid-scan.
        _swap_in(new_state.localCheckpoint(eager=True))

    writer = feed_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_token_counts(stream: DataFrame, text_col: str) -> DataFrame:
    """Continuously-maintained unigram token counts over a document
    stream — the KL-drift feeder: state is bounded at O(vocab) count
    rows regardless of corpus flow. Run in update/complete mode; a
    snapshot is BIT-IDENTICAL to the batch ``curation.token_counts``
    over the same rows (plain integer count aggregation over
    deterministic keys — micro-batch boundaries cannot perturb it,
    pytest-pinned), so ``curation.kl_from_token_counts`` folds live
    drift against a batch reference without rereading any row."""
    from dwh_etl_ods_spark_jobs_spark.curation import token_counts

    return stream.transform(lambda df: token_counts(df, text_col))


def streaming_score_counts(
    stream: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Continuously-maintained per-distinct-score class counts over a
    scored stream — the ROC-AUC feeder (r11 eval binding): state is
    bounded at O(distinct scores) count rows regardless of flow.  Run
    in update/complete mode; a snapshot is BIT-IDENTICAL to the batch
    ``groupBy(score)`` the AUC starts from (plain integer counts on
    deterministic keys — micro-batch boundaries cannot perturb it), so
    ``operators.eval_metrics.auc_from_score_counts`` folds a live exact
    tie-corrected AUC without rereading any row.  Two shards' states
    merge by adding cells — the same state-not-rows binding as the
    drift/agreement monitors.

    (Equal-frequency ``calibration_bins`` deliberately has NO such
    binding: a bin boundary can split a tied score group by its
    row-level tie-break, which bounded per-score state cannot retain —
    see COVERAGE.md.)
    """
    lbl = F.col(label_col).cast("long")
    return stream.groupBy(
        F.col(score_col).cast("long").alias("score")
    ).agg(
        F.sum(lbl).cast("long").alias("n_pos"),
        F.sum(F.lit(1) - lbl).cast("long").alias("n_neg"),
    )


def streaming_bucket_label_counts(
    stream: DataFrame, bucket_col: str, label_col: str
) -> DataFrame:
    """Continuously-maintained per-bucket binary-label counts over a
    feature stream — the WOE/IV feeder (r14 eval binding): state is
    bounded at O(buckets) count rows regardless of flow.  Run in
    update/complete mode; a snapshot is BIT-IDENTICAL to the batch
    ``groupBy(bucket)`` the screen starts from (plain integer counts on
    deterministic keys), so ``operators.stats.woe_iv_from_counts``
    folds a live feature-drift screen (a bucket whose WOE flips sign
    between snapshots is a shifting segment) without rereading any row.
    Shards merge by cell addition — the same state-not-rows binding as
    the AUC/kappa/drift monitors."""
    lbl = F.col(label_col).cast("long")
    return stream.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.sum(F.lit(1) - lbl).cast("long").alias("n_good"),
        F.sum(lbl).cast("long").alias("n_bad"),
    )


def streaming_confusion_counts(
    stream: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Continuously-maintained confusion-matrix cell counts between two
    categorical label columns — the Cohen's-kappa feeder (r13 eval
    binding, VERDICT r12 #6): state is bounded at O(labels²) count rows
    regardless of flow. Run in update/complete mode; a snapshot is
    BIT-IDENTICAL to the batch ``groupBy(a, b)`` the agreement readout
    starts from, so ``operators.eval_metrics.cohens_kappa_from_cm``
    folds a live inter-annotator (or model-vs-model) agreement monitor
    without rereading any row — drifting kappa between snapshots IS the
    "annotator pool diverging / model regressing" alarm. Shards merge
    by cell addition — the same state-not-rows binding as the
    AUC/WOE/SRM/drift monitors. Output columns (_a, _b, _c) match the
    ``cohens_kappa_from_cm`` input contract exactly."""
    return stream.groupBy(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("_c"))


def streaming_duration_counts(
    stream: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Continuously-maintained per-duration event/censor counts over a
    stream of COMPLETED subjects — the Kaplan-Meier feeder (r14 eval
    binding): state is bounded at O(distinct durations [× cohorts])
    count rows regardless of flow.  Run in update/complete mode; a
    snapshot is BIT-IDENTICAL to the batch ``groupBy(t)`` the curve
    starts from, so ``operators.timeseries.kaplan_meier_from_counts``
    folds a live retention/survival curve without rereading any row.
    Shards merge by cell addition — the same state-not-rows binding as
    the AUC/WOE/kappa/drift monitors.  (A subject's censor/event row
    enters the stream when its observation completes; re-classifying a
    previously-censored subject is an upstream retraction concern, the
    standard survival-stream contract.)"""
    ev = F.col(event_col).cast("long")
    g = [F.col(c) for c in (group_cols or [])]
    return stream.groupBy(
        *g, F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.sum(ev).cast("long").alias("n_events"),
        F.sum(F.lit(1) - ev).cast("long").alias("n_censored"),
    )


def streaming_band_coverage(
    stream: DataFrame,
    bands: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Live coverage of a BATCH-FITTED quantile band over a value
    stream: stream-static broadcast join onto the bounded ``(group...,
    band_lo, band_hi)`` frame (the exact grouped-weighted-quantile fit
    from ``operators.eval_metrics.quantile_coverage_eval``'s batch
    side), then a per-group (n, n_inside) count aggregation — bounded
    state, coverage_ppm derivable from any snapshot.  This is the
    production split of the band eval: fit offline where the exact
    rank decomposition is affordable, monitor online where only
    counters are."""
    val = F.col(value_col).cast("long")
    return (
        stream.join(F.broadcast(bands), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    (val >= F.col("band_lo")) & (val <= F.col("band_hi")), 1
                ).otherwise(0)
            ).cast("long").alias("n_inside"),
        )
    )


def growth_accounting_sink(
    stream: DataFrame,
    user_col: str,
    day_col: str,
    activity_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming DAU growth accounting, exact: maintain the DISTINCT
    ``(user, day)`` activity state per micro-batch (anti-join append —
    the ``incremental_sink`` discipline, so replays add nothing), and
    read the growth table off the state with the batch operator::

        growth_accounting(spark.read.parquet(activity_path), ...)

    The state is the distinct activity matrix — the true information
    content of an exact new/returning decomposition (any smaller state
    either approximates or forgets out-of-order days; stream==batch
    bit-equality is pinned in pytest, including first-seen days arriving
    late).  For retention-window deployments, prune state older than the
    window after each batch — the decomposition for days inside the
    window stays exact.
    """
    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        pairs = batch.select(
            F.col(user_col).alias("u"), F.col(day_col).alias("day")
        ).dropDuplicates(["u", "day"])
        if _hadoop_path_exists(spark, activity_path):
            try:
                prev = spark.read.parquet(activity_path)
                pairs = pairs.join(prev, ["u", "day"], "left_anti")
            except AnalysisException as e:
                msg = f"{_error_condition(e)} {e}"
                if (
                    "UNABLE_TO_INFER_SCHEMA" not in msg
                    and "PATH_NOT_FOUND" not in msg
                ):
                    raise
        pairs.write.mode("append").parquet(activity_path)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_session_windows(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap sessionization via the BUILT-IN ``session_window`` aggregate —
    the native counterpart of :func:`stateful_sessionize` (which remains
    the escape hatch for dynamic gaps / custom emission)::

        (key..., session_start, session_end, n_events)

    Spark merges events whose ``[ts, ts+gap)`` windows overlap, evicting
    closed-session state at the watermark — bounded per-key state, JVM
    native, no Python boundary.  Boundary convention: an event exactly
    ``gap`` after its predecessor starts a NEW session here (window end
    exclusive) but continues the session in the batch
    :func:`operators.timeseries.sessionize` (strict ``>`` test) — the
    equality pytest pins both the match away from the boundary and this
    documented divergence at it.
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            *key_cols,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_transition_counts(
    stream: DataFrame,
    group_cols: list[str],
    src_col: str,
    dst_col: str,
) -> DataFrame:
    """Continuously-maintained per-(group, src, dst) transition counts
    over an event-transition stream — the conditional-entropy feeder
    (r15 eval binding): state is bounded at O(state-pair domain [x
    groups]) count rows regardless of flow. Run in update/complete
    mode; a snapshot through
    ``operators.stats.transition_entropy_from_counts`` is BIT-IDENTICAL
    to the batch readout over the same transitions (pytest-pinned),
    so "how predictable is the next event" becomes a live dashboard
    number. Shards merge by cell addition. NULL src/dst rows (sequence
    heads/tails from the upstream lag) are excluded here, matching the
    batch operator's entry filter; the upstream sessionizer owns
    emitting one (prev, cur) row per arrival."""
    g = [F.col(c) for c in group_cols]
    return (
        stream.where(
            F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
        )
        .groupBy(
            *g,
            F.col(src_col).alias("_s"),
            F.col(dst_col).alias("_t"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_n_st"))
    )


def streaming_group_sums(
    stream: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Continuously-maintained per-group ``(n_g, sum_g)`` counters over
    a valued stream — the leave-one-group-out influence feeder (r14
    eval binding, VERDICT r13 #6): state is bounded at O(groups) rows
    regardless of flow. Run in update/complete mode; a snapshot through
    ``operators.stats.loo_from_counts`` is BIT-IDENTICAL to the batch
    :func:`operators.stats.loo_group_influence` over the same rows
    (pytest-pinned) — the global totals FOLD FROM THE STATE, so "which
    source drags the corpus metric most" updates live without a second
    data pass. Shards merge by cell addition."""
    return stream.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("sum_g"),
    )


def streaming_strata_outcome_sums(
    stream: DataFrame, bin_col: str, treat_col: str, y_col: str
) -> DataFrame:
    """Continuously-maintained per-stratum arm counts + exact cents
    outcome sums ``(bin, n_treated, n_control, _s1, _s0)`` over an
    observational outcome stream — the stratified-ATE feeder (r14 eval
    binding #2): state is bounded at O(strata) rows regardless of
    volume. Run in update/complete mode; a snapshot through
    ``operators.stats.stratified_ate_from_counts`` is BIT-IDENTICAL to
    the batch :func:`operators.stats.stratified_ate` over the same rows
    (pytest-pinned) — including the common-support exclusions, so the
    overlap warning fires as soon as a stratum loses an arm. Shards
    merge by cell addition of all four accumulators."""
    t = F.col(treat_col).cast("long")
    y = F.round(F.col(y_col).cast("double") * F.lit(100.0)).cast("long")
    return stream.groupBy(F.col(bin_col).alias("bin")).agg(
        F.sum(t).cast("long").alias("n_treated"),
        F.sum(F.lit(1) - t).cast("long").alias("n_control"),
        F.sum(t * y).cast("long").alias("_s1"),
        F.sum((F.lit(1) - t) * y).cast("long").alias("_s0"),
    )


def streaming_arm_covariate_moments(
    stream: DataFrame, arm_col: str, covariate_cols: list[str]
) -> DataFrame:
    """Continuously-maintained per-(covariate, arm) exact moments
    ``(_n, _sx, _sxx)`` over an exposure stream — the covariate-balance
    feeder (r14 eval binding, VERDICT r13 #6): covariates melt into ONE
    grouped state bounded at O(covariates x arms) rows regardless of
    exposure volume. Run in update/complete mode; a snapshot through
    ``operators.stats.smd_from_moments`` is BIT-IDENTICAL to the batch
    :func:`operators.stats.smd_balance_check` over the same rows
    (pytest-pinned) — the standardized-mean-difference balance table
    updates DURING enrollment, the same live-health posture as the SRM
    gate. ``_sxx`` accumulates as decimal(38,0) — exact within the
    Σx² ≤ 10³⁸ envelope, and Spark fails LOUDLY past it (ANSI
    NUMERIC_VALUE_OUT_OF_RANGE, never a silent wrap — measured,
    SCALING.md r14 overflow note; at 10¹² rows that admits |x| up to
    ~10¹³). Shards merge by cell addition of all three moments."""
    melted = stream.select(
        F.col(arm_col).cast("string").alias("_arm"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_cov"),
                        F.col(c).cast("long").alias("_x"),
                    )
                    for c in covariate_cols
                ]
            )
        ).alias("_cx"),
    ).select(
        "_arm", F.col("_cx._cov").alias("_cov"), F.col("_cx._x").alias("_x")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return melted.groupBy("_cov", "_arm").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum(dec(F.col("_x")) * dec(F.col("_x"))).alias("_sxx"),
    )


def streaming_assignment_counts(
    stream: DataFrame, experiment_col: str, variant_col: str
) -> DataFrame:
    """Continuously-maintained per-(experiment, variant) assignment
    counts over an exposure stream — the SRM feeder (r14 eval binding,
    VERDICT r11 #5): state is bounded at O(experiments x variants)
    count rows regardless of exposure volume. Run in update/complete
    mode; a snapshot through ``operators.stats.srm_from_counts`` is
    BIT-IDENTICAL to the batch :func:`operators.stats.srm_check` over
    the same assignments (pytest-pinned), so the randomizer health
    gate fires DURING the experiment, not at readout time. Shards
    merge by cell addition."""
    return stream.groupBy(
        F.col(experiment_col).alias("experiment"),
        F.col(variant_col).alias("variant"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))


def streaming_period_counts(
    stream: DataFrame, group_cols: list[str], period_col: str
) -> DataFrame:
    """Continuously-maintained per-(group, period) event counts — the
    burstiness feeder (r12 extension of the r14/r15 eval-binding
    pattern): state is bounded at O(groups x observed periods) count
    rows regardless of event volume. Run in update/complete mode; a
    snapshot fed STRAIGHT into ``operators.stats.dispersion_index``
    (whose input contract IS a per-period count frame) is BIT-IDENTICAL
    to the batch Fano readout over the same rows (pytest-pinned), so
    "did this event type turn bursty" becomes a live dashboard number.
    Shards merge by cell addition. The caller owns spine completion,
    same as batch — zero-count periods enter the variance only if an
    upstream spine emits their rows."""
    g = [F.col(c) for c in group_cols]
    return stream.groupBy(
        *g, F.col(period_col).alias("period")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def streaming_bin_counts(
    stream: DataFrame, bin_col: str, count_alias: str
) -> DataFrame:
    """Continuously-maintained per-bin row counts — the density-ratio
    feeder (r15 binding): a live SOURCE stream's bin counters snapshot
    into ``curation.density_ratio_from_counts`` against a FROZEN target
    count grid, giving live covariate-shift weights + ESS without
    rereading any row. ``count_alias`` names the count column for the
    consumer's side ("n_source" / "n_target")."""
    return stream.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias(count_alias)
    )
