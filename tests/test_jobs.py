"""End-to-end job tests (SURVEY.md §5 item 3) + catalog sanity."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.jobs import CATALOG, run_incremental_load


def test_catalog_covers_all_reference_jobs():
    # 24 CT + 1 HIS + 8 HTS + 12 MNCH + 7 PrEP = 52 Spark jobs in §2.4
    # (the 53rd reference module, Historical ART Outcome Base, is the pure
    # T-SQL job rebuilt natively in plans/art_outcomes.py).
    by_system = {}
    for s in CATALOG.values():
        by_system.setdefault(s.source_system, []).append(s)
        assert s.keys, s.name
        assert s.target.startswith("dbo."), s.name
    assert len(by_system["dwapicentral"]) == 23
    assert len(by_system["his"]) == 1
    assert len(by_system["htscentral"]) == 8
    assert len(by_system["mnchcentral"]) == 12
    assert len(by_system["prepcentral"]) == 7


def test_ct_patients_job_end_to_end(spark):
    """Synthetic 'Load CT Patients': source with duplicate generations +
    dirty dates + lookup vocabulary, target holding some rows already.
    Asserts the exact appended delta, then idempotency."""
    spec = CATALOG["ct_patients"]

    source = spark.createDataFrame(
        [
            # (SiteCode, PatientPK, ID, DateExtracted, DOB, RegistrationAtCCC,
            #  NUPI, PatientID, MaritalStatus, EducationLevel, PatientSource)
            # p1: two generations -> dedupe keeps ID 11
            (100, "p1", 10, dt.date(2023, 1, 1), dt.date(1990, 5, 1),
             dt.date(2015, 3, 1), "n1", "pid1", "single", "primary", "vct"),
            (100, "p1", 11, dt.date(2023, 6, 1), dt.date(1990, 5, 1),
             dt.date(2015, 3, 1), "n1", "pid1", "Married Monogamous", "primary", "vct"),
            # p2: dirty DOB (pre-1900) -> clamped to sentinel; empty NUPI -> NULL
            (100, "p2", 20, dt.date(2023, 6, 1), dt.date(1850, 1, 1),
             dt.date(2016, 1, 1), "", "pid2", "unknown", "secondary", "opd"),
            # p3: already in target -> anti-joined away
            (200, "p3", 30, dt.date(2023, 6, 1), dt.date(1985, 2, 2),
             dt.date(2017, 1, 1), "n3", "pid3", "single", "none", "vct"),
        ],
        "SiteCode int, PatientPK string, ID int, DateExtracted date, DOB date, "
        "RegistrationAtCCC date, NUPI string, PatientID string, "
        "MaritalStatus string, EducationLevel string, PatientSource string",
    )
    target = spark.createDataFrame([(200, "p3")], "SiteCode int, PatientPK string")
    lookups = {
        "lkp_MaritalStatus": spark.createDataFrame(
            [("single", "Single"), ("married monogamous", "Married")],
            "Source_MaritalStatus string, Target_MaritalStatus string",
        ),
        "Lkp_EducationLevel": spark.createDataFrame(
            [("primary", "Primary School")], "source_name string, target_name string"
        ),
        "lkp_patient_source": spark.createDataFrame(
            [("vct", "VCT")], "source_name string, target_name string"
        ),
    }

    delta = run_incremental_load(spark, spec, source, target, lookups)
    rows = {r.PatientPK: r for r in delta.collect()}

    assert set(rows) == {"p1", "p2"}  # p3 already in target
    p1, p2 = rows["p1"], rows["p2"]
    assert p1.ID == 11  # dedupe kept the latest extract generation
    assert p1.MaritalStatus == "Married"  # case-insensitive lookup fold
    assert p1.PatientSource == "VCT"
    assert p2.DOB == dt.date(1900, 1, 1)  # pre-1900 clamped to sentinel
    assert p2.NUPI is None  # empty string -> NULL
    assert p2.MaritalStatus == "unknown"  # unmatched keeps original
    assert p1.NupiHash == hashlib.sha256(b"n1").hexdigest().upper()
    assert p1.PatientPKHash == hashlib.sha256(b"p1").hexdigest().upper()
    assert p2.NupiHash is None  # NULL stays NULL through sha2

    # Idempotency: append the delta's keys, re-run -> zero new rows.
    target2 = target.union(delta.select("SiteCode", "PatientPK"))
    delta2 = run_incremental_load(spark, spec, source, target2, lookups)
    assert delta2.count() == 0


def test_adverse_events_key_expr(spark):
    """The cast(VisitDate as date) anti-join key (LoadAdverseEvents.java:145)."""
    spec = CATALOG["ct_adverse_events"]
    source = spark.createDataFrame(
        [
            (1, "p1", dt.datetime(2023, 5, 1, 14, 30), "pid1", "rash"),
            (1, "p2", dt.datetime(2023, 5, 2, 9, 0), "pid2", "nausea"),
        ],
        "SiteCode int, PatientPK string, VisitDate timestamp, PatientID string, "
        "AdverseEvent string",
    )
    # Target stores the visit DATE; the 14:30 timestamp must still match.
    target = spark.createDataFrame(
        [(1, "p1", dt.date(2023, 5, 1))], "SiteCode int, PatientPK string, VisitDate date"
    )
    lookups = {
        "lkp_adverse_events": spark.createDataFrame(
            [("rash", "Skin Rash")], "source_name string, target_name string"
        )
    }
    delta = run_incremental_load(spark, spec, source, target, lookups)
    rows = delta.collect()
    assert [r.PatientPK for r in rows] == ["p2"]
