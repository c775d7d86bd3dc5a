"""Table specs: parquet and JDBC readers/writers.

JDBC specifics mirror the reference's runtime-config pattern
(``spark.<system>.url/user/password/numpartitions`` read via RuntimeConfig,
``LoadCTPatients.java:32,51-56``) but fix its latent bug: the reference
passes lowercase ``numpartitions`` with no ``partitionColumn`` so Spark
silently does single-partition reads (SURVEY §4 / BASELINE.md). Here a
partitioned read requires explicit column+bounds and actually takes effect.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ParquetSpec:
    """A parquet table under a scale-factor directory."""

    name: str
    path: str | None = None  # default: <sf_dir>/<name>.parquet


@dataclass(frozen=True)
class JdbcSpec:
    """A JDBC table or pushdown query.

    ``partition_column``/``lower``/``upper``/``num_partitions`` enable a
    range-partitioned parallel read (reference
    ``LoadPatientVisits.java:47-52`` — the only job that did it right).
    """

    url: str
    table: str | None = None
    query: str | None = None
    user: str | None = None
    password: str | None = None
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    options: dict[str, str] = field(default_factory=dict)


TableSpec = ParquetSpec | JdbcSpec


def read_table(spark: SparkSession, spec: TableSpec, sf_dir: str | None = None) -> DataFrame:
    if isinstance(spec, ParquetSpec):
        path = spec.path or os.path.join(sf_dir or _default_sf_dir(), f"{spec.name}.parquet")
        return spark.read.parquet(path)
    reader = spark.read.format("jdbc").option("url", spec.url)
    if spec.query:
        reader = reader.option("query", spec.query)
    else:
        reader = reader.option("dbtable", spec.table)
    if spec.user:
        reader = reader.option("user", spec.user)
    if spec.password:
        reader = reader.option("password", spec.password)
    if spec.partition_column:
        reader = (
            reader.option("partitionColumn", spec.partition_column)
            .option("lowerBound", str(spec.lower_bound))
            .option("upperBound", str(spec.upper_bound))
            .option("numPartitions", str(spec.num_partitions or 16))
        )
    for k, v in spec.options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_append(
    df: DataFrame,
    spec: TableSpec,
    sf_dir: str | None = None,
    write_partitions: int | None = None,
) -> None:
    """Append rows to the sink.

    ``write_partitions`` bounds concurrent JDBC insert connections —
    the reference's ``repartition(50)`` before write
    (``LoadCTPatients.java:206``). Irrelevant for parquet sinks.
    """
    if isinstance(spec, ParquetSpec):
        path = spec.path or os.path.join(sf_dir or _default_sf_dir(), f"{spec.name}.parquet")
        df.write.mode("append").parquet(path)
        return
    if write_partitions:
        df = df.repartition(write_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", spec.url)
        .option("dbtable", spec.table)
        .mode("append")
    )
    if spec.user:
        writer = writer.option("user", spec.user)
    if spec.password:
        writer = writer.option("password", spec.password)
    writer.save()


def _default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def tpch_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver's test tables as a name->DataFrame dict."""
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Hive-style partitioned sink (``.../col=value/`` directories).

    The layout every date-ranged 100 TB table should use: queries filtering
    on the partition columns scan only matching directories (partition
    pruning — ``PartitionFilters`` in explain; pinned by
    tests/test_scale_ops.py). Pick low-cardinality columns (load date,
    source system); never a high-cardinality key, which would explode the
    file count.
    """
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def run_jdbc_update(
    spark: SparkSession, url: str, sql: str,
    user: str | None = None, password: str | None = None,
) -> int:
    """Execute a single DDL/DML statement over a RAW JDBC connection from
    the driver — the true side-channel of the reference's
    ``DatabaseUtils.runQuery`` (raw ``DriverManager`` handshake, not the
    Spark catalog). Returns the update count. Used for the statements the
    DataFrame writer cannot express: MERGE, DROP, index DDL."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    if user:
        props.setProperty("user", user)
    if password:
        props.setProperty("password", password)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def _jdbc_table_exists(spark: SparkSession, spec: "JdbcSpec") -> bool:
    """Definitive existence probe via JDBC ``DatabaseMetaData.getTables``.

    Deliberately NOT a SELECT-and-catch: swallowing every exception would
    turn a transient connection drop into "table missing", sending
    :func:`jdbc_upsert_batch` down the first-load plain-append branch and
    silently duplicating a replayed micro-batch (ADVICE r7). Here only the
    catalog's own answer decides; connection/transient errors propagate so
    the micro-batch fails and retries.
    """
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    if spec.user:
        props.setProperty("user", spec.user)
    if spec.password:
        props.setProperty("password", spec.password)
    conn = jvm.java.sql.DriverManager.getConnection(spec.url, props)
    try:
        meta = conn.getMetaData()
        # getTables matches the TABLE NAME only — a schema-qualified spec
        # ('APP.UPS', 'dbo.CT_X') must be split into (schemaPattern,
        # tableNamePattern) or it never matches and every upsert would take
        # the bootstrap plain-append branch, duplicating replays (ADVICE r8).
        # Both patterns are LIKE patterns and escape support is
        # dialect-dependent (Derby's getSearchStringEscape() is ''): let the
        # pattern over-match ('CT_X' also hits CTAX) and exact-compare the
        # returned names instead — portable across every driver.
        schema, _, table = spec.table.rpartition(".")
        # Unquoted DDL identifiers case-fold per dialect (Derby/Oracle up,
        # Postgres down) — probe the stored-case candidates.
        for t in dict.fromkeys((table, table.upper(), table.lower())):
            for s in dict.fromkeys(
                (schema, schema.upper(), schema.lower())
            ) if schema else (None,):
                rs = meta.getTables(None, s if s else None, t, None)
                try:
                    while rs.next():
                        if rs.getString("TABLE_NAME") == t and (
                            s is None or rs.getString("TABLE_SCHEM") == s
                        ):
                            return True
                finally:
                    rs.close()
        return False
    finally:
        conn.close()


def jdbc_upsert_batch(
    df: DataFrame, spec: "JdbcSpec", keys: list[str],
    staging_table: str | None = None,
) -> None:
    """MERGE a batch into a JDBC target: stage the rows in a side table
    (overwrite), then one set-based ANSI ``MERGE INTO`` on the server —
    the standard exactly-once JDBC upsert (per-row upserts from executors
    would need driver-side row loops and row-at-a-time latency).

    Bootstrap: a missing target becomes a plain append (first load).
    Naturally idempotent: replaying the same batch MERGEs to the same
    state. Keys must be non-NULL (MERGE's ON uses plain equality).
    """
    spark = df.sparkSession
    stg = staging_table or f"{spec.table}_STG"
    df.write.format("jdbc").option("url", spec.url).option(
        "dbtable", stg
    ).mode("overwrite").save()
    if not _jdbc_table_exists(spark, spec):
        write_append(df, spec)
        return
    cols = df.columns
    # Spark's JDBC writer creates QUOTED, case-exact column names; an
    # unquoted reference would case-fold (Derby: to upper) and miss them —
    # quote every identifier with the DataFrame's exact case. Derby also
    # rejects a qualified target column on the SET left side.
    q = lambda c: '"' + c.replace('"', '""') + '"'  # noqa: E731
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in cols if c not in keys)
    ins_cols = ", ".join(q(c) for c in cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
    run_jdbc_update(
        spark, spec.url,
        f"MERGE INTO {spec.table} t USING {stg} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})",
        user=spec.user, password=spec.password,
    )


def jdbc_upsert_sink(
    stream: DataFrame, spec: "JdbcSpec", keys: list[str],
    checkpoint_dir: str,
    dedupe_order: list[str] | None = None,
    available_now: bool = True,
):
    """Streaming JDBC upsert: per micro-batch, dedupe to the latest row
    per key, then :func:`jdbc_upsert_batch`. foreachBatch + server-side
    MERGE upgrades the at-least-once file-source replay to effective
    exactly-once at the row level (a replayed batch merges to the same
    state), which is what the reference's append-only JDBC loads cannot
    do without a delete-window preamble."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators import dedupe_latest

    def _process(batch: DataFrame, batch_id: int) -> None:
        if dedupe_order:
            batch = batch.transform(
                dedupe_latest(keys, [F.col(c).desc() for c in dedupe_order])
            )
        else:
            batch = batch.dropDuplicates(keys)
        jdbc_upsert_batch(batch, spec, keys)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_csv_audited(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    **options: str,
):
    """PERMISSIVE CSV ingestion with corrupt-record accounting: returns
    ``(clean_df, audit_df)`` where clean rows parsed fully and
    ``audit_df`` is one row ``(n_rows, n_clean, n_corrupt, corrupt_ppm)``.

    A malformed row never kills the load (the reference's T-SQL BULK
    paths die or silently truncate); it lands in the internal corrupt
    column and is counted. The parsed frame is localCheckpointed before
    the corrupt-column filter — Spark disallows/mis-evaluates predicates
    on ``_corrupt_record`` over a raw file scan (documented CSV-parser
    behavior), and the checkpoint also keeps the two derived frames to
    one parse pass.
    """
    from pyspark.sql import functions as F

    corrupt = "_corrupt_record"
    full_schema = schema + f", {corrupt} string"
    df = (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .options(**options)
        .csv(path)
        .localCheckpoint(eager=False)
    )
    clean = df.filter(F.col(corrupt).isNull()).drop(corrupt)
    audit = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(corrupt).isNull().cast("long")).alias("n_clean"),
        F.sum(F.col(corrupt).isNotNull().cast("long")).alias("n_corrupt"),
    ).select(
        "n_rows", "n_clean", "n_corrupt",
        F.expr(
            "CASE WHEN n_rows = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (n_corrupt * 1000000) div n_rows END"
        ).alias("corrupt_ppm"),
    )
    return clean, audit


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction for a parquet directory — the maintenance op
    every long-lived 100 TB table needs (micro-batch appends and
    per-partition writers accumulate thousands of KB-sized files; footer
    planning and open() overhead then dominate scans).

    Reads the directory, rewrites it as ``ceil(total_bytes /
    target_file_bytes)`` files, and swaps crash-safely: write to
    ``path__stg``, rename the live dir ASIDE, rename staging in, drop the
    aside — the ``stage_and_swap`` rename-aside discipline, so a crash
    between renames leaves the previous generation recoverable at
    ``path__old``. Returns {files_before, files_after, bytes}.
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)

    def _data_files(p):
        it, out = fs.listFiles(p, True), []
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if not name.startswith(("_", ".")):
                out.append((str(f.getPath()), f.getLen()))
        return out

    aside = jvm.org.apache.hadoop.fs.Path(path + "__old")
    if fs.exists(aside) and not fs.exists(hpath):
        # a previous compaction died between its two renames: recover
        fs.rename(aside, hpath)
    files = _data_files(hpath)
    total = sum(b for _, b in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    stg = jvm.org.apache.hadoop.fs.Path(path + "__stg")
    if fs.exists(stg):
        fs.delete(stg, True)
    df = spark.read.parquet(path)
    # repartition(n) — not coalesce — so the rewrite redistributes evenly
    # instead of concatenating skewed input partitions
    df.repartition(n_out).write.mode("overwrite").parquet(str(stg))
    if fs.exists(aside):
        fs.delete(aside, True)
    fs.rename(hpath, aside)
    try:
        fs.rename(stg, hpath)
    except Exception:
        fs.rename(aside, hpath)  # restore the previous generation
        raise
    fs.delete(aside, True)
    return {
        "files_before": len(files),
        "files_after": len(_data_files(hpath)),
        "bytes": total,
    }


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write a GLOBALLY ordered parquet layout: range-partition into
    ``n_files`` key ranges, sort within each, one file per range — file k's
    keys all precede file k+1's. Downstream merge readers, binary-search
    point lookups, and min/max footer pruning on the sort key all get the
    strongest possible layout (a plain sorted write per-partition gives
    only LOCAL order; a global orderBy().coalesce(1) gives one giant
    file). Range boundaries come from Spark's reservoir sampling of the
    key distribution — skewed keys still split evenly."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def provenance_census(df: DataFrame, *agg_cols: str) -> DataFrame:
    """Per-source-file row census of a file-backed DataFrame::

        (file_name, n_rows [, min_<c>, max_<c> ...])

    ``file_name`` is the basename of ``input_file_name()`` — the lineage
    view that answers "which shard produced these rows" when one bad
    upstream file skews a load (row counts wildly off per file) or a
    layout op must be audited (after :func:`write_range_sorted`, each
    file's [min, max] key range must be disjoint). Scale: scan-side
    expression + one aggregation keyed by file — cardinality = file
    count, never row count.
    """
    from pyspark.sql import functions as F

    base = F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in agg_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(base.alias("file_name")).agg(*aggs)
