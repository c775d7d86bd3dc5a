"""Per-job source WHERE predicates (jobs/filters.py census).

Boundary rows pushed through WIRED catalog jobs (run_incremental_load),
not bare predicates — proving the filters field actually gates the
pipeline at the reference's position (post-enrich, pre-dedupe).
Reference provenance in jobs/filters.py.
"""

from __future__ import annotations

import dataclasses
import datetime as dt

import pytest

from dwh_etl_ods_spark_jobs_spark.jobs import CATALOG, run_incremental_load
from dwh_etl_ods_spark_jobs_spark.jobs.filters import (
    CT_GATE,
    GENDER_NOT_NULL,
    GENDER_NOT_UNKNOWN,
    HTS_EXTRACT_CUTOFF,
    MFL_CODE_NOT_EMPTY,
    SITECODE_POSITIVE,
    TRACING_OUTCOME_NOT_NULL,
    TRACING_TYPE_NOT_NULL,
)


def _delta(spark, spec, rows, schema):
    src = spark.createDataFrame(rows, schema)
    target = src.select(*spec.keys).limit(0)
    return run_incremental_load(spark, spec, src, target)


def test_ct_gate_boundary(spark):
    """gender != 'Unknown' AND F.code > 0 (LoadCTDefaulterTracing.sql) on a
    raw source that carries the dim columns: Unknown / NULL gender and
    zero / negative / NULL site codes are all dropped."""
    spec = CATALOG["ct_defaulter_tracing"]
    assert spec.filters == CT_GATE
    rows = [
        ("Male", 700, "p1", "v1", "pid1"),
        ("Unknown", 700, "p2", "v2", "pid2"),   # gender literal
        (None, 700, "p3", "v3", "pid3"),        # NULL gender: != is unknown
        ("Female", 0, "p4", "v4", "pid4"),      # boundary code
        ("Female", -3, "p5", "v5", "pid5"),
        ("Female", None, "p6", "v6", "pid6"),
        ("Female", 9, "p7", "v7", "pid7"),
    ]
    schema = ("Gender string, SiteCode int, PatientPK string, VisitID string, "
              "PatientID string")
    got = {r.PatientPK for r in _delta(spark, spec, rows, schema).collect()}
    assert got == {"p1", "p7"}


def test_hts_extract_cutoff_boundary(spark):
    """DateExtracted > '2019-09-08' (LoadHtsClients.sql:35) is STRICT: the
    boundary day itself is dropped, as are NULLs."""
    spec = dataclasses.replace(
        CATALOG["hts_clients"], rules=(), lookups=(), select=None
    )
    assert CATALOG["hts_clients"].filters == (HTS_EXTRACT_CUTOFF,)
    rows = [
        (dt.date(2019, 9, 7), 1, dt.date(2020, 1, 1), 1, "p1", "n1"),
        (dt.date(2019, 9, 8), 1, dt.date(2020, 1, 1), 2, "p2", "n2"),  # boundary
        (dt.date(2019, 9, 9), 1, dt.date(2020, 1, 1), 3, "p3", "n3"),
        (None, 1, dt.date(2020, 1, 1), 4, "p4", "n4"),
        (dt.date(2023, 6, 1), 1, dt.date(2020, 1, 1), 5, "p5", "n5"),
    ]
    schema = ("DateExtracted date, SiteCode int, DateCreated date, ID int, "
              "PatientPK string, NUPI string")
    got = {r.PatientPK for r in _delta(spark, spec, rows, schema).collect()}
    assert got == {"p3", "p5"}


def test_facilities_mfl_not_empty(spark):
    """MFL_Code != '' (LoadSites.sql:6): empty AND NULL codes dropped
    (NULL != '' is unknown in three-valued logic, exactly T-SQL)."""
    spec = CATALOG["facilities"]
    assert spec.filters == (MFL_CODE_NOT_EMPTY,)
    rows = [("",), (None,), ("12345",), ("00042",)]
    got = {
        r.MFL_Code
        for r in _delta(spark, spec, rows, "MFL_Code string").collect()
    }
    assert got == {"12345", "00042"}


def test_tracing_not_null_gates(spark):
    """TracingType/TracingOutcome IS NOT NULL (LoadHtsClientTracing.sql:14)."""
    spec = CATALOG["hts_client_tracing"]
    assert spec.filters == (TRACING_TYPE_NOT_NULL, TRACING_OUTCOME_NOT_NULL)
    rows = [
        ("home", "found", "p1", 1, "h1"),
        (None, "found", "p2", 1, "h2"),
        ("phone", None, "p3", 1, "h3"),
    ]
    schema = ("TracingType string, TracingOutcome string, PatientPK string, "
              "SiteCode int, HtsNumber string")
    got = {r.PatientPK for r in _delta(spark, spec, rows, schema).collect()}
    assert got == {"p1"}


def test_fact_side_missing_filter_column_raises(spark):
    """A fact-side filter column the extract does not carry is a loud
    contract error (same policy as cleaning-rule columns)."""
    spec = CATALOG["hts_client_tracing"]
    rows = [("found", "p1", 1, "h1")]
    schema = "TracingOutcome string, PatientPK string, SiteCode int, HtsNumber string"
    with pytest.raises(ValueError, match="source filters"):
        _delta(spark, spec, rows, schema).collect()


def test_dim_side_missing_filter_column_skips(spark):
    """Dim-side filters (Gender) skip silently when absent: a source read
    through the reference's pushed-down SQL applied them upstream and does
    not SELECT the column (jobs/filters.py)."""
    spec = CATALOG["ct_defaulter_tracing"]
    rows = [(700, "p1", "v1", "pid1"), (9, "p2", "v2", "pid2")]
    schema = "SiteCode int, PatientPK string, VisitID string, PatientID string"
    got = {r.PatientPK for r in _delta(spark, spec, rows, schema).collect()}
    assert got == {"p1", "p2"}  # no Gender column -> gender gate skipped


def test_filter_census_matches_reference():
    """The per-job census (jobs/filters.py module docstring)."""
    gate = {n for n, s in CATALOG.items() if s.filters == CT_GATE}
    assert gate == {
        "ct_art_patients", "ct_patient_visits", "ct_patient_pharmacy",
        "ct_patient_status", "ct_patient_baselines", "ct_allergies",
        "ct_covid", "ct_depression_screening", "ct_drug_alcohol_screening",
        "ct_enhanced_adherence_counselling", "ct_gbv_screening", "ct_ipt",
        "ct_otz", "ct_ovc", "ct_contact_listing", "ct_defaulter_tracing",
        "ct_iit_risk_scores",
    }
    assert CATALOG["ct_patients"].filters == (
        GENDER_NOT_NULL, GENDER_NOT_UNKNOWN, SITECODE_POSITIVE,
    )
    for name in ("ct_cervical_screening", "ct_cancer_screening",
                 "ct_patient_labs"):
        assert CATALOG[name].filters == (GENDER_NOT_UNKNOWN,)
    assert CATALOG["ct_adverse_events"].filters == (SITECODE_POSITIVE,)
    assert CATALOG["hts_client_linkages"].filters == (HTS_EXTRACT_CUTOFF,)
    # Every filtered job's SQL text is DuckDB-parseable (the oracle uses it)
    import duckdb

    for s in CATALOG.values():
        for f in s.filters:
            duckdb.connect().execute(
                f"SELECT 1 WHERE {f.sql.replace(f.column, 'NULL')} IS NOT DISTINCT FROM TRUE"
            )


def test_gender_filter_lands_at_parquet_scan(spark, tmp_path):
    """The declarative filter survives to the scan: PushedFilters carries
    the gender predicates so a 100 TB extract is pruned at the source."""
    p = str(tmp_path / "src")
    spark.createDataFrame(
        [("Male", 1, "p1", "v", "i")],
        "Gender string, SiteCode int, PatientPK string, VisitID string, "
        "PatientID string",
    ).write.parquet(p)
    spec = CATALOG["ct_defaulter_tracing"]
    src = spark.read.parquet(p)
    out = src
    for fs in spec.filters:
        out = out.filter(fs.make())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "IsNotNull(Gender)" in plan
    assert "Not(EqualTo(Gender,Unknown))" in plan


def test_plan_filters_exact_skip_sets(spark):
    """Strict skip accounting (VERDICT r6 #4): the exact skip set per job
    is pinned for a source WITH the enrich columns (nothing skips) and one
    WITHOUT them (exactly the dim-side gates skip) — a typo'd FilterSpec
    column would change these sets and fail here."""
    from dwh_etl_ods_spark_jobs_spark.jobs.spec import plan_filters

    spec = CATALOG["ct_defaulter_tracing"]
    enriched_cols = ["Gender", "SiteCode", "PatientPK", "VisitID", "PatientID"]
    applied, skipped = plan_filters(spec, enriched_cols)
    assert [f.column for f in applied] == ["Gender", "SiteCode"]
    assert skipped == []

    bare_cols = ["PatientPK", "VisitID", "PatientID"]
    applied, skipped = plan_filters(spec, bare_cols)
    assert applied == []
    assert [f.column for f in skipped] == ["Gender", "SiteCode"]

    # ct_patients has the extra GENDER_NOT_NULL arm; same accounting
    spec = CATALOG["ct_patients"]
    _, skipped = plan_filters(spec, ["PatientPK", "SiteCode"])
    assert [f.column for f in skipped] == ["Gender", "Gender"]

    # fact-side filters never skip: they raise
    spec = CATALOG["hts_client_tracing"]
    with pytest.raises(ValueError, match="source filters"):
        plan_filters(spec, ["PatientPK"])


def test_dim_side_skip_is_logged(spark, caplog):
    """The skip is surfaced, not silent: run_incremental_load logs which
    dim-side FilterSpecs it skipped and why."""
    import logging

    spec = CATALOG["ct_defaulter_tracing"]
    rows = [(700, "p1", "v1", "pid1")]
    schema = "SiteCode int, PatientPK string, VisitID string, PatientID string"
    with caplog.at_level(logging.INFO, logger="dwh_etl_ods_spark_jobs_spark.jobs.spec"):
        _delta(spark, spec, rows, schema).collect()
    msgs = [r.message for r in caplog.records if "skipped" in r.message]
    assert msgs and "Gender" in msgs[0] and "ct_defaulter_tracing" in msgs[0]
