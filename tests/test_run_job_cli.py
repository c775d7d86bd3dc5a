"""run_job.py zero-flag contract: the catalog carries each job's default
source table (``JobSpec.source_table`` — the FROM of the reference's
source-SQL resource), so JDBC mode needs only the connection conf, exactly
like the reference's ``spark-submit --class LoadX --conf spark.*.url=…``.

Derby stands in for SQL Server (same live-JDBC rationale as
tests/test_jdbc_live.py); ``_render_table`` de-T-SQL-ifies the bracketed
three-part names for non-sqlserver dialects.
"""

from __future__ import annotations

import pytest

import dwh_etl_ods_spark_jobs_spark.run_job as RJ
from dwh_etl_ods_spark_jobs_spark.jobs.catalog import CATALOG
from dwh_etl_ods_spark_jobs_spark.sources import JdbcSpec, read_table, write_append

URL = "jdbc:derby:memory:run_job_cli;create=true"


def test_every_job_records_a_source_table():
    for name, spec in CATALOG.items():
        assert spec.source_table, f"{name} has no default source table"
        assert spec.source_table.startswith("["), name  # reference spelling


def test_render_table_dialects():
    sqlsrv = "jdbc:sqlserver://host;database=DWAPICentral"
    t = "[DWAPICentral].[dbo].[PatientExtract]"
    assert RJ._render_table(sqlsrv, t) == t  # verbatim for the reference dialect
    assert RJ._render_table(URL, t) == "dbo.PatientExtract"
    assert RJ._render_table(URL, "dbo.Plain") == "dbo.Plain"


def test_run_job_jdbc_default_source_table_derby(spark, capsys):
    """`run_job ct_facility_manifest --conf spark.dwapicentral.url=…` with
    ZERO table flags: source read from the spec's default table, dry-run
    count, then --write appends the delta to the ODS target."""
    spec = CATALOG["ct_facility_manifest"]
    src = spark.createDataFrame(
        [(1, "m1"), (2, "m2"), (3, "m3")], "ID int, ManifestData string"
    )
    write_append(src, JdbcSpec(url=URL, table="dbo.FacilityManifest"))
    # target pre-seeded with ID=1 -> delta is {2, 3}. The target carries the
    # job's reference-DDL projection columns (delta shape: ID int from the
    # source, NULL-filled strings elsewhere).
    tgt_schema = ", ".join(
        f"`{c}` int" if c.lower() == "id" else f"`{c}` string"
        for c in spec.select
    )
    write_append(
        spark.createDataFrame(
            [(1,) + (None,) * (len(spec.select) - 1)], tgt_schema
        ),
        JdbcSpec(url=URL, table="dbo.CT_FacilityManifest"),
    )
    spark.conf.set("spark.dwapicentral.url", URL)
    spark.conf.set("spark.ods.url", URL)
    try:
        assert RJ.main(["ct_facility_manifest"]) == 0
        assert "2 new records" in capsys.readouterr().out
        assert RJ.main(["ct_facility_manifest", "--write"]) == 0
        assert "2 records appended" in capsys.readouterr().out
        # idempotent: rerun finds nothing new
        assert RJ.main(["ct_facility_manifest"]) == 0
        assert "0 new records" in capsys.readouterr().out
        ods = read_table(spark, JdbcSpec(url=URL, table=RJ._render_table(URL, spec.target)))
        assert ods.count() == 3
    finally:
        spark.conf.unset("spark.dwapicentral.url")
        spark.conf.unset("spark.ods.url")


def test_run_job_parquet_enrich_dims(spark, tmp_path, capsys):
    """Dev-mode CLI for a star job: raw fact + dim parquet paths; the
    enrich join, Voided gate, and gender/code filters all run in-engine."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "v1"), (2, "v2"), (3, "v3"), (9, "v9")],
        "PatientId int, VisitID string",
    ).write.parquet(f"{d}/src")
    spark.createDataFrame(
        [
            (1, "p1", "pid1", 10, "Male"),
            (2, "p2", "pid2", 10, "Unknown"),   # gender gate
            (3, "p3", "pid3", 20, "Female"),    # voided facility
        ],
        "Id int, PatientPK string, PatientID string, FacilityId int, Gender string",
    ).write.parquet(f"{d}/patient")
    spark.createDataFrame(
        [(10, 700, "A", 0), (20, 800, "B", 1)],
        "Id int, SiteCode int, FacilityName string, Voided int",
    ).write.parquet(f"{d}/facility")
    spark.createDataFrame(
        [], "SiteCode int, PatientPK string, VisitID string"
    ).write.parquet(f"{d}/tgt")
    assert RJ.main([
        "ct_defaulter_tracing",
        "--source-path", f"{d}/src", "--target-path", f"{d}/tgt",
        "--patient-path", f"{d}/patient", "--facility-path", f"{d}/facility",
    ]) == 0
    # p1 survives; p2 Unknown gender, p3 voided facility, FK 9 unmatched
    assert "1 new records" in capsys.readouterr().out


def test_run_job_cli_backfill_dev_mode(spark, tmp_path, capsys):
    """--backfill START END: chunked idempotent reprocess through the CLI
    (dev parquet mode) — per-chunk counts printed, --write appends once,
    replay appends zero."""
    import datetime as dt

    spec = CATALOG["ct_facility_manifest"]
    d = str(tmp_path)
    rows = [
        (i, f"m{i}", dt.date(2023, 1, 1) + dt.timedelta(days=7 * i))
        for i in range(10)
    ]
    spark.createDataFrame(
        rows, "ID int, ManifestData string, DateExtracted date"
    ).write.parquet(f"{d}/src")
    tgt_schema = ", ".join(
        f"`{c}` int" if c.lower() == "id" else f"`{c}` string"
        for c in spec.select
    )
    spark.createDataFrame([], tgt_schema).write.parquet(f"{d}/tgt")

    base = [
        "ct_facility_manifest", "--source-path", f"{d}/src",
        "--target-path", f"{d}/tgt",
        "--backfill", "2023-01-01", "2023-03-01",
        "--backfill-date-col", "DateExtracted", "--chunk-days", "30",
    ]
    assert RJ.main(base) == 0
    out = capsys.readouterr().out
    assert "backfill chunk 0" in out and "backfill chunk 1" in out
    # window [jan1, mar1) covers rows with DateExtracted < 2023-03-01:
    # days 0,7,...,56 -> 9 rows within window
    assert "backfill total 9 records over 2 chunks" in out

    assert RJ.main(base + ["--write"]) == 0
    assert spark.read.parquet(f"{d}/tgt").count() == 9
    assert RJ.main(base + ["--write"]) == 0
    assert spark.read.parquet(f"{d}/tgt").count() == 9  # idempotent replay


def test_run_job_cli_backfill_jdbc_derby(spark, capsys):
    """--backfill over the LIVE JDBC path (Derby): chunk slicing on the
    source date column, per-chunk appends to the ODS target, idempotent
    replay."""
    import datetime as dt

    url = "jdbc:derby:memory:run_job_backfill;create=true"
    spec = CATALOG["ct_facility_manifest"]
    rows = [
        (i, f"m{i}", dt.date(2023, 1, 1) + dt.timedelta(days=10 * i))
        for i in range(6)
    ]
    write_append(
        spark.createDataFrame(
            rows, "ID int, ManifestData string, DateExtracted date"
        ),
        JdbcSpec(url=url, table="dbo.FacilityManifest"),
    )
    tgt_schema = ", ".join(
        f"`{c}` int" if c.lower() == "id" else f"`{c}` string"
        for c in spec.select
    )
    # seed one row so the target table exists with the DDL projection
    write_append(
        spark.createDataFrame(
            [(999,) + (None,) * (len(spec.select) - 1)], tgt_schema
        ),
        JdbcSpec(url=url, table="dbo.CT_FacilityManifest"),
    )
    spark.conf.set("spark.dwapicentral.url", url)
    spark.conf.set("spark.ods.url", url)
    base = [
        "ct_facility_manifest",
        "--backfill", "2023-01-01", "2023-02-20", "--chunk-days", "25",
    ]
    try:
        assert RJ.main(base) == 0
        out = capsys.readouterr().out
        # window [jan1, feb20): days 0,10,20,30,40 -> 5 rows in 2 chunks
        assert "backfill total 5 records over 2 chunks" in out
        assert RJ.main(base + ["--write"]) == 0
        out = capsys.readouterr().out
        # the PRINTED per-chunk counts must reflect what the write appended
        # (ADVICE r8: a lazy post-write count re-evaluates the anti-join
        # against the updated target and prints 0 for every chunk)
        assert "backfill chunk 0: 3 records appended" in out
        assert "backfill chunk 1: 2 records appended" in out
        assert "backfill total 5 records over 2 chunks" in out
        ods = read_table(
            spark,
            JdbcSpec(url=url, table=RJ._render_table(url, spec.target)),
        )
        assert ods.count() == 6  # seed + 5 backfilled
        assert RJ.main(base + ["--write"]) == 0
        out = capsys.readouterr().out
        assert "backfill total 0 records over 2 chunks" in out
        assert ods.count() == 6  # idempotent replay appends nothing
    finally:
        spark.conf.unset("spark.dwapicentral.url")
        spark.conf.unset("spark.ods.url")


def test_run_job_cli_multi_job_parallel_derby(spark, capsys):
    """Several catalog jobs in ONE app (vs the reference's one
    spark-submit per job): each reads its own catalog source over JDBC;
    --parallel submits them from a thread pool into FAIR pools. Dry-run
    counts print per job, and --write appends each delta to its own
    target exactly once."""
    url = "jdbc:derby:memory:run_job_multi;create=true"
    # two non-enrich, no-lookup jobs: multi-job JDBC mode reads each
    # spec's own source table only
    names = ["ct_facility_manifest", "hts_test_kits"]
    for name in names:
        spec = CATALOG[name]
        src_table = RJ._render_table(url, spec.source_table)
        cols = {c.lower() for c in spec.select}
        # minimal source: ID + every column a rule/dedupe/key touches, as
        # in the catalog bench synthesis — here two plain rows suffice
        import dwh_etl_ods_spark_jobs_spark.run_job  # noqa: F401
        from tools.catalog_bench import spec_columns, synth_source

        write_append(synth_source(spark, spec, 5).limit(20),
                     JdbcSpec(url=url, table=src_table))
        tgt_schema = ", ".join(
            f"`{c}` int" if c.lower() == "id" else f"`{c}` string"
            for c in spec.select
        )
        write_append(
            spark.createDataFrame([], tgt_schema),
            JdbcSpec(url=url, table=RJ._render_table(url, spec.target)),
        )
    # each job's own source system conf (ct_* -> dwapicentral,
    # hts_* -> htscentral), one shared ODS
    for system in {CATALOG[n].source_system for n in names}:
        spark.conf.set(f"spark.{system}.url", url)
    spark.conf.set("spark.ods.url", url)
    try:
        assert RJ.main(names + ["--parallel", "2"]) == 0
        out = capsys.readouterr().out
        for name in names:
            assert f"{name}:" in out and "new records (dry run" in out
        assert RJ.main(names + ["--parallel", "2", "--write"]) == 0
        counts = {
            name: read_table(
                spark,
                JdbcSpec(url=url, table=RJ._render_table(url, CATALOG[name].target)),
            ).count()
            for name in names
        }
        assert all(c > 0 for c in counts.values()), counts
        # replay appends nothing (anti-join idempotency per job)
        assert RJ.main(names + ["--parallel", "2", "--write"]) == 0
        counts2 = {
            name: read_table(
                spark,
                JdbcSpec(url=url, table=RJ._render_table(url, CATALOG[name].target)),
            ).count()
            for name in names
        }
        assert counts2 == counts
    finally:
        for system in {CATALOG[n].source_system for n in names}:
            spark.conf.unset(f"spark.{system}.url")
        spark.conf.unset("spark.ods.url")


def test_run_job_cli_multi_job_rejects_single_job_flags():
    with pytest.raises(SystemExit):
        RJ.main(["ct_allergies", "ct_covid", "--source-path", "/tmp/x"])
