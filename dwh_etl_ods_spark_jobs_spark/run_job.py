"""Operational entry point: run one catalog job the way the reference runs
its Java mains.

The reference launches each job as
``spark-submit --class org.kenyahmis.loadctpatients.LoadCTPatients
--conf spark.dwapicentral.url=... --conf spark.ods.url=... job.jar``
reading connection config from ``RuntimeConfig`` at startup
(``LoadCTPatients.java:27-56``). This runner keeps that exact contract —
``spark.<system>.*`` / ``spark.ods.*`` conf keys — over the declarative
catalog, so an operator of the reference can switch by replacing
``--class …Load<X> job.jar`` with ``run_job.py <job_name>``:

    spark-submit run_job.py ct_patients \
        --conf spark.dwapicentral.url=jdbc:sqlserver://... \
        --conf spark.dwapicentral.user=... \
        --conf spark.dwapicentral.password=... \
        --conf spark.ods.url=jdbc:sqlserver://... \
        --conf spark.ods.numpartitions=50

Without JDBC conf (local/dev), ``--source-path/--target-path`` run the same
job over parquet directories.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.jobs.catalog import CATALOG
from dwh_etl_ods_spark_jobs_spark.jobs.spec import JobSpec, run_incremental_load
from dwh_etl_ods_spark_jobs_spark.sources import (
    JdbcSpec,
    ParquetSpec,
    read_table,
    write_append,
)


def _conf(spark: SparkSession, key: str, default: str | None = None) -> str | None:
    try:
        return spark.conf.get(key)
    except Exception:
        return default


def _jdbc_spec(spark: SparkSession, system: str, table: str | None = None,
               query: str | None = None) -> JdbcSpec:
    url = _conf(spark, f"spark.{system}.url")
    if url is None:
        raise SystemExit(
            f"missing --conf spark.{system}.url (reference contract: "
            "connection config rides in RuntimeConfig)"
        )
    return JdbcSpec(
        url=url,
        table=_render_table(url, table) if table else table,
        query=query,
        user=_conf(spark, f"spark.{system}.user"),
        password=_conf(spark, f"spark.{system}.password"),
    )


def _render_table(url: str, table: str) -> str:
    """Catalog table names are recorded in the reference's T-SQL spelling
    (``[DWAPICentral].[dbo].[PatientExtract]``). SQL Server takes them
    verbatim; any other dialect (Derby in tests, Postgres, ...) gets the
    brackets stripped and the cross-database catalog prefix dropped —
    three-part names are a T-SQL-ism."""
    if url.startswith("jdbc:sqlserver") or "[" not in table:
        return table
    parts = [p.strip("[]") for p in table.split(".")]
    return ".".join(parts[-2:]) if len(parts) >= 3 else ".".join(parts)


def run(spark: SparkSession, spec: JobSpec, args: argparse.Namespace):
    patient = facility = None
    if args.source_path:
        if not args.target_path:
            raise SystemExit("--source-path (dev mode) also requires --target-path")
        if spec.lookups and not args.lookup_dir:
            raise SystemExit(
                f"job {spec.name} uses lookup tables "
                f"({', '.join(lk.table for lk in spec.lookups)}) — pass --lookup-dir"
            )
        source = spark.read.parquet(args.source_path)
        target = spark.read.parquet(args.target_path)
        lookups = {
            lk.table: spark.read.parquet(f"{args.lookup_dir}/{lk.table}.parquet")
            for lk in spec.lookups
        }
        if spec.enrich is not None and bool(args.patient_path) != bool(args.facility_path):
            # Half-specified dims silently skipped enrichment (and its
            # dim-side Gender/Voided filters) before; fail loudly like
            # every other missing-input path in this file.
            raise SystemExit(
                f"job {spec.name} enriches against patient AND facility dims — "
                "pass both --patient-path and --facility-path (or neither to "
                "load a pre-joined extract)"
            )
        if spec.enrich is not None and args.patient_path and args.facility_path:
            patient = spark.read.parquet(args.patient_path)
            facility = spark.read.parquet(args.facility_path)
        sink = ParquetSpec(name="target", path=args.target_path) if args.write else None
    else:
        src_table = args.source_table or spec.source_table
        if not src_table:
            raise SystemExit(
                f"job {spec.name} records no default source table — pass "
                "--source-table (staging table or '(SELECT ...) s' subquery)"
            )
        source = read_table(
            spark, _jdbc_spec(spark, spec.source_system, table=src_table)
        )
        if spec.enrich is not None and not args.source_table:
            # Default raw-extract scan: read the star dims and join
            # engine-side (the reference's pushed-down T-SQL join,
            # operators/enrich.py). An explicit --source-table is treated
            # as a pushed-down subquery that already carries the dims.
            e = spec.enrich
            patient = read_table(
                spark, _jdbc_spec(spark, spec.source_system, table=e.patient_table)
            )
            facility = read_table(
                spark, _jdbc_spec(spark, spec.source_system, table=e.facility_table)
            )
        ods = _jdbc_spec(spark, "ods", table=spec.target)
        target = read_table(spark, ods)
        lookups = {
            lk.table: read_table(spark, _jdbc_spec(spark, "ods", table=f"dbo.{lk.table}"))
            for lk in spec.lookups
        }
        sink = ods if args.write else None
    n_parts = _conf(spark, "spark.ods.numpartitions")
    if args.backfill:
        # Chunked idempotent backfill (jobs/spec.run_backfill): each slice
        # re-runs the anti-join load, so overlapping live data or a
        # crashed previous attempt re-appends nothing.
        from dwh_etl_ods_spark_jobs_spark.jobs.spec import run_backfill

        start, end = args.backfill
        # sink=None: the write happens HERE, with the count observed on the
        # write job itself. Passing the sink through run_backfill would
        # append each chunk eagerly and leave the returned deltas lazy —
        # a later d.count() re-evaluates the anti-join against the
        # now-updated target and prints 0 for every chunk (ADVICE r8),
        # computing each plan twice.
        deltas = run_backfill(
            spark, spec, source, target,
            args.backfill_date_col, start, end,
            chunk_days=args.chunk_days,
            lookups=lookups, patient=patient, facility=facility,
            sink=None,
        )
        total = 0
        for i, d in enumerate(deltas):
            if sink is not None:
                obs = Observation(f"ods-backfill-{spec.name}-{i}")
                observed = d.observe(obs, F.count(F.lit(1)).alias("n_appended"))
                write_append(
                    observed, sink,
                    write_partitions=int(n_parts) if n_parts else None,
                )
                n = obs.get["n_appended"]
            else:
                n = d.count()
            total += n
            print(f"{spec.name}: backfill chunk {i}: {n} records"
                  f"{' appended' if sink is not None else ' (dry run)'}")
        print(f"{spec.name}: backfill total {total} records over "
              f"{len(deltas)} chunks")
        return deltas
    delta = run_incremental_load(
        spark, spec, source, target, lookups, sink=None,
        patient=patient, facility=facility,
    )
    if sink is not None:
        # The reference logs the delta count with a SEPARATE count() action
        # before its JDBC append — a full second evaluation of the plan
        # (LoadCTPatients.java:170; SURVEY §3.4). observe() rides the write
        # job itself, so the count is free.
        obs = Observation(f"ods-load-{spec.name}")
        observed = delta.observe(obs, F.count(F.lit(1)).alias("n_appended"))
        write_append(
            observed, sink, write_partitions=int(n_parts) if n_parts else None
        )
        print(f"{spec.name}: {obs.get['n_appended']} records appended")
    else:
        n = delta.count()
        print(f"{spec.name}: {n} new records (dry run, not written)")
    return delta


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("jobs", nargs="+", choices=sorted(CATALOG), metavar="job",
                   help="catalog job name(s) — ONE Spark app runs them all, "
                        "vs the reference's one spark-submit per job")
    p.add_argument("--source-table", default=None,
                   help="override source table/subquery for the JDBC read")
    p.add_argument("--source-path", default=None, help="parquet source (dev mode)")
    p.add_argument("--target-path", default=None, help="parquet target (dev mode)")
    p.add_argument("--lookup-dir", default=None, help="parquet lookup tables dir")
    p.add_argument("--patient-path", default=None,
                   help="parquet PatientExtract dim (dev mode, enrich jobs)")
    p.add_argument("--facility-path", default=None,
                   help="parquet Facility dim (dev mode, enrich jobs)")
    p.add_argument("--write", action="store_true",
                   help="append the delta to the sink (default: dry-run count)")
    p.add_argument("--backfill", nargs=2, metavar=("START", "END"),
                   default=None,
                   help="reprocess [START, END) ISO dates in chunked, "
                        "idempotent slices instead of one incremental run")
    p.add_argument("--backfill-date-col", default="DateExtracted",
                   help="source date column the backfill window slices on")
    p.add_argument("--chunk-days", type=int, default=30,
                   help="backfill slice width in days")
    p.add_argument("--parallel", type=int, default=1,
                   help="concurrent job submissions into this one app "
                        "(FAIR scheduler pools). The catalog jobs are "
                        "independent; 8 threads collapse the 51-job wall "
                        "~3x (SCALING.md r9 probe)")
    args = p.parse_args(argv)

    if len(args.jobs) > 1 and (
        args.source_path or args.source_table or args.backfill
    ):
        raise SystemExit(
            "multi-job mode reads each job's own catalog source over JDBC: "
            "--source-path/--source-table/--backfill apply to a single job"
        )
    builder = SparkSession.builder.appName(f"ods-load-{'-'.join(args.jobs)}")
    if args.parallel > 1:
        # FAIR mode must exist before the session does; concurrently
        # submitted jobs then share task slots round-robin instead of
        # FIFO head-of-line blocking.
        builder = builder.config("spark.scheduler.mode", "FAIR")
    spark = builder.getOrCreate()
    if args.parallel > 1:
        from concurrent.futures import ThreadPoolExecutor

        def _worker(name: str) -> None:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"job-{name}"
            )
            run(spark, CATALOG[name], args)

        with ThreadPoolExecutor(max_workers=args.parallel) as pool:
            # list() drains the iterator so a failed job raises here
            list(pool.map(_worker, args.jobs))
    else:
        for name in args.jobs:
            run(spark, CATALOG[name], args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
