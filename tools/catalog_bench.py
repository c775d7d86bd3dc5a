"""Per-job wall-clock of the FULL 51-job catalog at scale (VERDICT r7 #5).

The parity surface the reference actually IS — all 51 JobSpecs through
``run_incremental_load`` — gets a tracked bench at an events-sf0.1-sized
source (100k rows/job, 10% duplicated keys carrying a second generation,
30% of keys preloaded in the target), so regressions in the catalog
pipeline are visible per job, not just in the single-job
``catalog_job_pipeline`` battery entry.

Usage::

    python tools/catalog_bench.py [n_rows] [out_json] [--parallel N]

Prints a per-job table (slowest first) + total, and writes the JSON
record (default ``tools/catalog_bench_sf01.json``).

``--parallel N`` (VERDICT r8 #3) submits jobs from an N-thread pool into
ONE Spark app under a FAIR scheduler: the 51 jobs are independent, so
concurrent submission overlaps each job's driver-side planning and
scheduling gaps with other jobs' task execution and collapses the wall
toward the slowest job. Per-job row counts are recorded either way, so a
sequential-vs-parallel diff proves no cross-job interference.

Source synthesis mirrors tests/test_jobs.py::_spec_columns — columns are
derived from each spec's own keys/dedupe/rules/lookups/PII/filters
metadata, with values that PASS the spec's filters, so every stage of
every job executes (nothing short-circuits to empty).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def spec_columns(spec) -> dict[str, str]:
    """(name -> kind) for every column the spec touches (same derivation
    as the generic e2e test, case-insensitively deduped)."""
    cols: dict[str, str] = {}
    lower_seen: dict[str, str] = {}

    def add(name: str, kind: str, force: bool = False) -> None:
        existing = lower_seen.get(name.lower())
        if existing is None:
            cols[name] = kind
            lower_seen[name.lower()] = name
        elif force:
            cols[existing] = kind

    for k in spec.keys:
        add(k, "string")
    for k in spec.dedupe_keys or ():
        add(k, "string")
    for k in spec.dedupe_order:
        add(k, "date" if "Date" in k else "numeric")
    for rule in spec.rules:
        for c in getattr(rule, "columns", ()):
            add(c, getattr(rule, "kind", "string"), force=True)
    for lk in spec.lookups:
        add(lk.column, "string")
    for src_col in spec.pii:
        add(src_col, "string")
    for c in spec.key_exprs:
        add(c, "date", force=True)
    for f in spec.filters:
        add(f.column, f.kind, force=True)
    return cols


def synth_source(spark, spec, n_rows: int):
    """Distributed source at ``n_rows`` scale: keys unique per row id,
    except 1-in-10 ids which carry a SECOND generation (later date gate,
    higher ID) that the greatest-per-key dedupe must pick."""
    cols = spec_columns(spec)
    keyish = {c.lower() for c in spec.keys} | {
        c.lower() for c in (spec.dedupe_keys or ())
    }
    base = spark.range(n_rows).withColumn("__gen", F.lit(1))
    dup = (
        spark.range(n_rows)
        .filter(F.col("id") % 10 == 0)
        .withColumn("__gen", F.lit(2))
    )
    un = base.unionByName(dup)
    i, g = F.col("id"), F.col("__gen")
    exprs = []
    for n, kind in cols.items():
        if n == "ID":
            exprs.append((i * F.lit(10) + g).cast("int").alias(n))
        elif kind == "numeric":
            exprs.append(
                (F.lit(50.0) + F.pmod(i, F.lit(1000))).cast("double").alias(n)
            )
        elif kind == "date":
            exprs.append(
                F.date_add(
                    F.lit("2023-01-01").cast("date"),
                    (F.pmod(i, F.lit(27)) + g).cast("int"),
                ).alias(n)
            )
        elif n.lower() in keyish:
            exprs.append(
                F.concat(F.lit(n.lower() + "_"), i.cast("string")).alias(n)
            )
        else:
            exprs.append(
                F.concat(
                    F.lit(n.lower() + "_"),
                    F.pmod(i, F.lit(1000)).cast("string"),
                ).alias(n)
            )
    return un.select(*exprs)


def run_one(spark, spec, n_rows: int) -> int:
    """One catalog job end-to-end (synth source -> incremental load ->
    delta count); returns the delta row count."""
    from dwh_etl_ods_spark_jobs_spark.jobs import run_incremental_load

    source = synth_source(spark, spec, n_rows)
    # ID = row_id*10 + generation, so ID % 100 < 30 <=> row_id % 10 in
    # {0,1,2}: 30% of keys preloaded, 70% should survive the anti-join
    target = source.filter(F.col("ID") % 100 < 30).select(*spec.keys)
    lookups = {
        lk.table: spark.createDataFrame(
            [(f"{lk.column.lower()}_1", "Mapped")],
            f"`{lk.source_col}` string, `{lk.target_col}` string",
        )
        for lk in spec.lookups
    }
    delta = run_incremental_load(spark, spec, source, target, lookups)
    return delta.count()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    parallel = 0
    if "--parallel" in args:
        i = args.index("--parallel")
        parallel = int(args[i + 1])
        del args[i:i + 2]
    n_rows = int(args[0]) if len(args) > 0 else 100_000
    out_path = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "catalog_bench_sf01.json"
    )
    from dwh_etl_ods_spark_jobs_spark.jobs import CATALOG
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    # FAIR mode so concurrently submitted jobs share task slots round-robin
    # instead of FIFO head-of-line blocking (only matters with --parallel,
    # harmless otherwise; must be set before the session exists).
    spark = get_spark(
        "catalog-bench",
        extra_conf={"spark.scheduler.mode": "FAIR"} if parallel else None,
    )
    # JVM/codegen warm-up, untimed
    spark.range(1000).selectExpr("sum(id)").collect()

    walls: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    t_all = time.time()
    if parallel:
        from concurrent.futures import ThreadPoolExecutor

        def worker(name: str) -> None:
            # per-thread pool name -> per-job FAIR share (PySpark pinned
            # thread mode maps Python threads onto JVM threads, so the
            # local property scopes to this job's stages)
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"job-{name}"
            )
            t0 = time.time()
            rows_out[name] = run_one(spark, CATALOG[name], n_rows)
            walls[name] = round(time.time() - t0, 2)
            print(f"{name:35s} {walls[name]:7.2f}s  {rows_out[name]:>8d} rows")

        with ThreadPoolExecutor(max_workers=parallel) as pool:
            list(pool.map(worker, sorted(CATALOG)))
    else:
        for name in sorted(CATALOG):
            t0 = time.time()
            rows_out[name] = run_one(spark, CATALOG[name], n_rows)
            walls[name] = round(time.time() - t0, 2)
            print(f"{name:35s} {walls[name]:7.2f}s  {rows_out[name]:>8d} rows")
    total = round(time.time() - t_all, 1)
    ranked = sorted(walls.items(), key=lambda kv: kv[1], reverse=True)
    mode = f" ({parallel} concurrent)" if parallel else " (sequential)"
    print(f"\nTOTAL {total}s for {len(walls)} jobs @ {n_rows} rows/job{mode}")
    print("slowest 5:", ranked[:5])
    with open(out_path, "w") as fh:
        json.dump(
            {
                "n_rows_per_job": n_rows,
                "parallel": parallel,
                "total_sec": total,
                "n_jobs": len(walls),
                "per_job_sec": walls,
                "rows_out": rows_out,
            },
            fh,
            indent=1,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
