"""Boundary-value tests for the round-4 cleaning chains, wired per-job.

Each test feeds reference-cited boundary literals through the FULL
``run_incremental_load`` pipeline (dedupe -> rules -> lookups -> anti-join
-> PII hash) of the catalog job that owns the chain, proving the rules are
attached to the JobSpec — not just defined in ``jobs/rules.py``.

Reference provenance per chain is in ``jobs/rules.py`` docstrings
(e.g. LoadPatientPharmacy.java:90-102, LoadCTOTZ.java:59-67,
LoadPrepPharmacy.java:56-63, LoadHtsClients.java:82-92).
"""

from __future__ import annotations

import datetime as dt

from dwh_etl_ods_spark_jobs_spark.jobs import CATALOG, run_incremental_load


def _lookups(spark, spec):
    """Non-matching single-row lookup tables for every LookupSpec."""
    return {
        lk.table: spark.createDataFrame(
            [("<no-match>", "<mapped>")],
            f"`{lk.source_col}` string, `{lk.target_col}` string",
        )
        for lk in spec.lookups
    }


def _run(spark, spec, source, key="ID"):
    """Run the job on an empty target; rows keyed by ``key`` (a column the
    job's reference projection retains — ID is dropped by some DDLs)."""
    target = source.select(*spec.keys).limit(0)
    delta = run_incremental_load(spark, spec, source, target, _lookups(spark, spec))
    rows = delta.collect()
    have = {c.lower(): c for c in delta.columns}
    key = have.get(key.lower()) or have[spec.keys[0].lower()]
    out = {r[key]: r for r in rows}
    assert len(out) == len(rows), "key column did not uniquely identify rows"
    return out


def test_ct_patient_pharmacy_rules_wired(spark):
    """LoadPatientPharmacy.java:90-102: Duration<0 -> 999, PeriodTaken<=0
    -> 999, ExpectedReturn floor 1900, Emr/Project maps; the I-TECH source
    rewrite runs first."""
    spec = CATALOG["ct_patient_pharmacy"]
    schema = (
        "SiteCode string, PatientPK string, VisitID string, ID int, "
        "DateExtracted date, PatientID string, Duration double, "
        "PeriodTaken double, ExpectedReturn date, Emr string, "
        "Project string, Drug string, TreatmentType string, "
        "ProphylaxisType string"
    )
    d = dt.date(2023, 1, 1)
    rows = {
        r["ID"]: r
        for r in _run(
            spark, spec,
            spark.createDataFrame(
                [
                    ("100", "p1", "v1", 1, d, "pid1", -1.0, 0.0,
                     dt.date(1899, 12, 31), "Ampath AMRS", "I-TECH",
                     "d", "t", "x"),
                    ("100", "p2", "v1", 2, d, "pid2", 5.0, 3.0,
                     dt.date(2023, 6, 1), "keepme", "AMPATH", "d", "t", "x"),
                ],
                schema,
            ),
        ).values()
    }
    r1, r2 = rows[1], rows[2]
    assert r1.Duration == 999.0 and r2.Duration == 5.0
    assert r1.PeriodTaken == 999.0 and r2.PeriodTaken == 3.0  # <=0 is bad
    assert r1.ExpectedReturn == dt.date(1900, 1, 1)
    assert r2.ExpectedReturn == dt.date(2023, 6, 1)
    assert r1.Emr == "AMRS" and r2.Emr == "keepme"
    assert r1.Project == "Kenya HMIS II"  # source-SQL rewrite, not the map
    assert r2.Project == "Ampath Plus"    # Java-side map
    assert len(r1.PatientIDHash) == 64


def test_ct_otz_rules_wired(spark):
    """LoadCTOTZ.java:59-67: enrollment floor is 2012 (program start), the
    two Yes/No maps expand 1/0."""
    spec = CATALOG["ct_otz"]
    schema = (
        "SiteCode string, PatientPK string, VisitID string, ID int, "
        "PatientID string, OTZEnrollmentDate date, TransferInStatus string, "
        "SupportGroupInvolvement string, Project string"
    )
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("100", "p1", "v1", 1, "pid1", dt.date(2011, 12, 31), "1", "0", "HMIS"),
                ("100", "p2", "v1", 2, "pid2", dt.date(2013, 5, 1), "Yes", "No", "keep"),
            ],
            schema,
        ),
    )
    r1, r2 = rows[1], rows[2]
    assert r1.OTZEnrollmentDate == dt.date(1900, 1, 1)  # below 2012 floor
    assert r2.OTZEnrollmentDate == dt.date(2013, 5, 1)
    assert r1.TransferInStatus == "Yes" and r1.SupportGroupInvolvement == "No"
    assert r2.TransferInStatus == "Yes" and r2.SupportGroupInvolvement == "No"
    assert r1.Project == "Kenya HMIS II" and r2.Project == "keep"


def test_ct_covid_rules_wired(spark):
    """LoadCTCovid.java:61-73: three 1980-floor clamps + the vaccination
    status collapse."""
    spec = CATALOG["ct_covid"]
    schema = (
        "SiteCode string, PatientPK string, VisitID string, ID int, "
        "PatientID string, Covid19AssessmentDate date, "
        "DateGivenFirstDose date, DateGivenSecondDose date, "
        "VaccinationStatus string"
    )
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("100", "p1", "v1", 1, "pid1", dt.date(1979, 12, 31),
                 dt.date(2021, 3, 1), dt.date(2099, 1, 1), "Partial"),
                ("100", "p2", "v1", 2, "pid2", dt.date(2021, 6, 1),
                 None, None, "Fully - Details not Available"),
            ],
            schema,
        ),
    )
    r1, r2 = rows[1], rows[2]
    assert r1.Covid19AssessmentDate == dt.date(1900, 1, 1)
    assert r1.DateGivenFirstDose == dt.date(2021, 3, 1)
    assert r1.DateGivenSecondDose == dt.date(1900, 1, 1)  # future -> sentinel
    assert r1.VaccinationStatus == "Partially Vaccinated"
    assert r2.Covid19AssessmentDate == dt.date(2021, 6, 1)
    assert r2.VaccinationStatus == "Fully Vaccinated"


def test_ct_patient_baselines_rules_wired(spark):
    """LoadPatientBaselines.java:57-64: bCD4 < 0 -> 999 + two 1980-floor
    clamps; dedupe rides the (Created, ID) order."""
    spec = CATALOG["ct_patient_baselines"]
    schema = (
        "SiteCode string, PatientPK string, Voided string, ID int, "
        "Created date, PatientID string, bCD4 double, bWHODate date, "
        "bCD4Date date, Project string"
    )
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("100", "p1", "0", 1, dt.date(2023, 1, 1), "pid1", -5.0,
                 dt.date(1979, 1, 1), dt.date(2020, 1, 1), "I-TECH"),
                ("100", "p2", "0", 2, dt.date(2023, 1, 1), "pid2", 350.0,
                 dt.date(2020, 1, 1), None, "keep"),
            ],
            schema,
        ),
    )
    r1, r2 = rows[1], rows[2]
    assert r1.bCD4 == 999.0 and r2.bCD4 == 350.0
    assert r1.bWHODate == dt.date(1900, 1, 1)
    assert r1.bCD4Date == dt.date(2020, 1, 1)
    assert r1.Project == "Kenya HMIS II" and r2.Project == "keep"


def test_hts_clients_rules_wired(spark):
    """LoadHtsClients.java:82-92: Dob outside [1910, today] -> NULL (not
    sentinel), Gender M/F expansion, PatientDisabled ternary."""
    spec = CATALOG["hts_clients"]
    schema = (
        "SiteCode string, PatientPK string, ID int, DateCreated date, "
        "DateExtracted date, NUPI string, Dob date, Gender string, "
        "PatientDisabled string"
    )
    # DateExtracted sits past the 2019-09-08 cutoff filter
    # (LoadHtsClients.sql:35 — jobs/filters.py HTS_EXTRACT_CUTOFF).
    dx = dt.date(2023, 1, 1)
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("100", "p1", 1, dt.date(2023, 1, 1), dx, "n1",
                 dt.date(1905, 1, 1), "M", "blind"),
                ("100", "p2", 2, dt.date(2023, 1, 1), dx, "n2",
                 dt.date(1990, 5, 1), "F", "No"),
                ("100", "p3", 3, dt.date(2023, 1, 1), dx, "n3",
                 None, "Female", None),
            ],
            schema,
        ),
    )
    r1, r2, r3 = rows["p1"], rows["p2"], rows["p3"]
    assert r1.Dob is None  # below 1910 floor -> NULL, no sentinel
    assert r2.Dob == dt.date(1990, 5, 1)
    assert r1.Gender == "Male" and r2.Gender == "Female" and r3.Gender == "Female"
    assert r1.PatientDisabled == "Yes"  # any non-'No' value collapses
    assert r2.PatientDisabled == "No"
    assert r3.PatientDisabled is None


def test_hts_client_linkages_rules_wired(spark):
    """LoadHtsClientLinkages.java:61-66: three 1980-floor-only clamps -> NULL."""
    spec = CATALOG["hts_client_linkages"]
    schema = (
        "PatientPK string, SiteCode string, ID int, DateExtracted date, "
        "HtsNumber string, ReferralDate date, DateEnrolled date, "
        "DatePrefferedToBeEnrolled date"
    )
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("p1", "100", 1, dt.date(2023, 1, 1), "h1",
                 dt.date(1975, 1, 1), dt.date(2021, 2, 3), dt.date(1979, 12, 31)),
            ],
            schema,
        ),
    )
    r = rows["p1"]
    assert r.ReferralDate is None
    assert r.DateEnrolled == dt.date(2021, 2, 3)
    assert r.DatePrefferedToBeEnrolled is None


def test_hts_partner_notification_rules_wired(spark):
    """LoadPartnerNotificationServices.java:58-74: '' -> NULL, the three
    referral/linkage maps, 'N/A' IPV screen -> NULL, Age outside [0,100]
    -> NULL."""
    spec = CATALOG["hts_partner_notification_services"]
    schema = (
        "PatientPk string, PartnerPatientPk string, SiteCode string, "
        "ID int, HtsNumber string, FacilityLinkedTo string, "
        "PnsApproach string, LinkedToCare string, PnsConsent string, "
        "ScreenedForIpv string, Age int, CccNumber string"
    )
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("p1", "pp1", "100", 1, "h1", "", "D: Dual Referral", "Y",
                 "0", "N/A", 150, ""),
                ("p2", "pp2", "100", 2, "h2", "Fac X", "Cr: Passive Referral",
                 "N", "Yes", "Yes", 34, "ccc2"),
            ],
            schema,
        ),
    )
    r1, r2 = rows[1], rows[2]
    assert r1.FacilityLinkedTo is None and r2.FacilityLinkedTo == "Fac X"
    assert r1.PnsApproach == "Provider Referral"
    assert r2.PnsApproach == "Passive Referral"
    assert r1.LinkedToCare == "Yes" and r2.LinkedToCare == "No"
    assert r1.PnsConsent == "No" and r2.PnsConsent == "Yes"
    assert r1.ScreenedForIpv is None and r2.ScreenedForIpv == "Yes"
    assert r1.Age is None and r2.Age == 34


def test_prep_pharmacy_rules_wired(spark):
    """LoadPrepPharmacy.java:56-63: Duration > 12 -> NULL (12 itself kept),
    DispenseDate < 1980 -> NULL, RegimenPrescribed '' -> NULL."""
    spec = CATALOG["prep_pharmacy"]
    schema = (
        "PatientPk string, SiteCode string, ID int, DateExtracted date, "
        "Created date, PrepNumber string, Duration double, "
        "DispenseDate date, RegimenPrescribed string"
    )
    d = dt.date(2023, 1, 1)
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("p1", "100", 1, d, d, "pn1", 13.0, dt.date(1975, 1, 1), ""),
                ("p2", "100", 2, d, d, "pn2", 12.0, dt.date(2022, 1, 1), "TDF/FTC"),
                ("p3", "100", 3, d, d, "pn3", 0.0, None, "x"),
            ],
            schema,
        ),
    )
    assert rows[1].Duration is None and rows[2].Duration == 12.0
    assert rows[3].Duration == 0.0  # no lower bound in the reference
    assert rows[1].DispenseDate is None
    assert rows[2].DispenseDate == dt.date(2022, 1, 1)
    assert rows[1].RegimenPrescribed is None
    assert rows[2].RegimenPrescribed == "TDF/FTC"


def test_prep_behaviour_risk_sweep_wired(spark):
    """LoadPrepBehaviourRisk.java:57-82: the 13-column '' -> NULL sweep
    runs inside the job (spot-checked on 3 + count of NULLed columns)."""
    from dwh_etl_ods_spark_jobs_spark.jobs.rules import PREP_BR_EMPTY_TO_NULL_COLS

    spec = CATALOG["prep_behaviour_risk"]
    base = "PatientPk string, SiteCode string, ID int, DateExtracted date, Created date, PrepNumber string"
    sweep = ", ".join(f"`{c}` string" for c in PREP_BR_EMPTY_TO_NULL_COLS)
    d = dt.date(2023, 1, 1)
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("p1", "100", 1, d, d, "pn1", *[""] * len(PREP_BR_EMPTY_TO_NULL_COLS)),
                ("p2", "100", 2, d, d, "pn2",
                 *[f"v{i}" for i in range(len(PREP_BR_EMPTY_TO_NULL_COLS))]),
            ],
            base + ", " + sweep,
        ),
    )
    r1, r2 = rows["p1"], rows["p2"]
    assert all(r1[c] is None for c in PREP_BR_EMPTY_TO_NULL_COLS)
    assert all(r2[c] is not None for c in PREP_BR_EMPTY_TO_NULL_COLS)


def test_prep_adverse_events_sweep_wired(spark):
    """LoadPrepAdverseEvents.java:55-71: the 8-column '' -> NULL sweep."""
    from dwh_etl_ods_spark_jobs_spark.jobs.rules import PREP_AE_EMPTY_TO_NULL_COLS

    spec = CATALOG["prep_adverse_events"]
    base = "PatientPk string, SiteCode string, ID int, Created date, PrepNumber string"
    sweep = ", ".join(f"`{c}` string" for c in PREP_AE_EMPTY_TO_NULL_COLS)
    d = dt.date(2023, 1, 1)
    rows = _run(
        spark, spec,
        spark.createDataFrame(
            [
                ("p1", "100", 1, d, "pn1", *[""] * len(PREP_AE_EMPTY_TO_NULL_COLS)),
                ("p2", "100", 2, d, "pn2",
                 *["Severe"] * len(PREP_AE_EMPTY_TO_NULL_COLS)),
            ],
            base + ", " + sweep,
        ),
    )
    r1, r2 = rows[1], rows[2]
    assert all(r1[c] is None for c in PREP_AE_EMPTY_TO_NULL_COLS)
    assert all(r2[c] == "Severe" for c in PREP_AE_EMPTY_TO_NULL_COLS)
