"""The 51-job catalog: every reference Spark job as a declarative JobSpec.

Key sets are the null-safe LEFT ANTI JOIN keys from each job's main class
(full citation table in SURVEY.md §2.4). PII hash maps are the per-job
``hashPIIColumns`` maps (``Core/.../DatabaseUtils.java:54-69`` call sites).
Cleaning rules encode the documented withColumn/when chains for the jobs
whose rules SURVEY.md §2.2 traces; remaining jobs are pure
dedupe->anti-join->hash loads.

Reference quirks intentionally fixed (SURVEY.md §7 "what's hard" item 2):
- LoadCancerScreening.java:64 anti-joins against CT_CervicalCancerScreening
  but writes CT_CancerScreening — we anti-join against the job's own target.
- The lowercase-`numpartitions`-without-partitionColumn JDBC reads that
  Spark silently ignores (LoadCTPatients.java:56) — our JdbcSpec requires
  explicit bounds for partitioned reads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.jobs.spec import JobSpec, LookupSpec
from dwh_etl_ods_spark_jobs_spark.operators import (
    date_clamp,
    empty_to_null,
    range_sentinel,
)

# ---------------------------------------------------------------------------
# Rule sets for the jobs whose cleaning logic the survey traces.
# ---------------------------------------------------------------------------

# LoadCTPatients.java:112-141 — clamp DOB / registration dates to
# [1900-01-01, today]; empty-string -> NULL on identifier columns.
_CT_PATIENTS_RULES = (
    date_clamp("DOB", lo="1900-01-01", hi_is_current_date=True, sentinel="1900-01-01"),
    date_clamp(
        "RegistrationAtCCC", lo="1900-01-01", hi_is_current_date=True, sentinel="1900-01-01"
    ),
    empty_to_null(["NUPI", "PatientID"]),
)

# LoadARTPatients.java:94-137 — date clamps (1980 floor for ART events) and
# 999 sentinels: AgeEnrollment/AgeARTStart/AgeLastVisit ∉ [0,120] -> 999.
_ART_PATIENTS_RULES = (
    date_clamp("StartARTDate", lo="1980-01-01", hi_is_current_date=True, sentinel="1900-01-01"),
    date_clamp("LastARTDate", lo="1980-01-01", hi_is_current_date=True, sentinel="1900-01-01"),
    range_sentinel("AgeEnrollment", 0, 120, 999.0),
    range_sentinel("AgeARTStart", 0, 120, 999.0),
    range_sentinel("AgeLastVisit", 0, 120, 999.0),
)

# LoadPatientVisits.java:78-85,103-105 — vitals sentinels and the
# appointment-date clamp with a today+1-year upper bound.
_PATIENT_VISITS_RULES = (
    range_sentinel("Weight", 0, 200, 999.0),
    range_sentinel("Height", 0, 259, 999.0),
    date_clamp("VisitDate", lo="1900-01-01", hi_is_current_date=True, sentinel="1900-01-01"),
    date_clamp(
        "NextAppointmentDate",
        lo="1900-01-01",
        hi_is_current_date=True,
        hi_offset_years=1,
        sentinel="1900-01-01",
    ),
)

# LoadHtsEligibility.java:83-100 — empty-string -> NULL sweep, out-of-range
# dates -> NULL (not sentinel).
_HTS_ELIGIBILITY_RULES = (
    empty_to_null(["HtsNumber", "Disability"]),
    date_clamp("VisitDate", lo="1900-01-01", hi_is_current_date=True, sentinel=None),
)

# LoadHtsClientTests.java:111-112 — MonthsSinceLastTest > 1540 -> NULL.
_HTS_CLIENT_TESTS_RULES = (
    range_sentinel("MonthsSinceLastTest", 0, 1540, None, cast_to="int"),
)


def _visitdate_as_date():
    # LoadAdverseEvents.java:145-146: key includes cast(VisitDate as date).
    return F.col("VisitDate").cast("date")


# ---------------------------------------------------------------------------
# Catalog
# ---------------------------------------------------------------------------

_PII_CT = {"PatientID": "PatientIDHash", "PatientPK": "PatientPKHash"}
_PII_HTS = {"PatientPK": "PatientPKHash", "HtsNumber": "HtsNumberHash"}
_PII_MNCH = {"PatientPK": "PatientPKHash", "PatientMnchID": "PatientMnchIDHash"}
_PII_PREP = {"PatientPK": "PatientPKHash", "PrepNumber": "PrepNumberHash"}


def job(name, system, target, keys, pii=None, **kw) -> JobSpec:
    return JobSpec(
        name=name,
        source_system=system,
        target=target,
        keys=tuple(keys),
        pii=pii or {},
        **kw,
    )


CATALOG: dict[str, JobSpec] = {
    s.name: s
    for s in [
        # --- DWAPICentral (CT) — SURVEY §2.4 rows 1-24 -----------------------
        job(
            "ct_patients", "dwapicentral", "dbo.CT_Patient",
            ["SiteCode", "PatientPK"],
            {**_PII_CT, "NUPI": "NupiHash"},
            dedupe_keys=("SiteCode", "PatientPK"),
            rules=_CT_PATIENTS_RULES,
            lookups=(
                LookupSpec("MaritalStatus", "lkp_MaritalStatus",
                           "Source_MaritalStatus", "Target_MaritalStatus"),
                LookupSpec("EducationLevel", "Lkp_EducationLevel"),
                LookupSpec("PatientSource", "lkp_patient_source"),
            ),
            notes="LoadCTPatients.java:27-228",
        ),
        job(
            "ct_art_patients", "dwapicentral", "dbo.CT_ARTPatients",
            ["PatientPK", "SiteCode"], _PII_CT,
            dedupe_keys=("PatientPK", "SiteCode"),
            rules=_ART_PATIENTS_RULES,
            lookups=(
                LookupSpec("PreviousARTRegimen", "lkp_regimen"),
                LookupSpec("StartRegimen", "lkp_regimen"),
                LookupSpec("LastRegimen", "lkp_regimen"),
                LookupSpec("ExitReason", "lkp_exit_reason"),
            ),
            notes="LoadARTPatients.java:59-181; fixes the PreviousARTRegimen "
                  "fold that falls back to ExitReason (:148-149)",
        ),
        job(
            "ct_patient_visits", "dwapicentral", "dbo.CT_PatientVisits",
            ["PatientPK", "SiteCode", "VisitID"], _PII_CT,
            dedupe_keys=("PatientPK", "SiteCode", "VisitID"),
            rules=_PATIENT_VISITS_RULES,
            lookups=(
                LookupSpec("FamilyPlanningMethod", "lkp_family_planning_method"),
                LookupSpec("PwP", "lkp_pwp"),
            ),
            notes="LoadPatientVisits.java:47-135; the one job with a real "
                  "range-partitioned JDBC read (SiteCode bounds)",
        ),
        job(
            "ct_patient_pharmacy", "dwapicentral", "dbo.CT_PatientPharmacy",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            dedupe_keys=("SiteCode", "PatientPK", "VisitID"),
            lookups=(
                LookupSpec("Drug", "lkp_regimen"),
                LookupSpec("TreatmentType", "lkp_treatment_type"),
                LookupSpec("ProphylaxisType", "lkp_prophylaxis_type"),
            ),
            notes="LoadPatientPharmacy.java:60-142",
        ),
        job(
            "ct_patient_labs", "dwapicentral", "dbo.CT_PatientLabs",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            lookups=(LookupSpec("TestName", "lkp_test_name"),),
            notes="LoadPatientLabs.java:111",
        ),
        job("ct_patient_status", "dwapicentral", "dbo.CT_PatientStatus",
            ["SiteCode", "PatientPK"], _PII_CT,
            lookups=(LookupSpec("ExitReason", "lkp_exit_reason"),),
            notes="LoadPatientStatus.java:92"),
        job("ct_patient_baselines", "dwapicentral", "dbo.CT_PatientBaselines",
            ["SiteCode", "PatientPK"], _PII_CT, notes="LoadPatientBaselines.java:92"),
        job(
            "ct_adverse_events", "dwapicentral", "dbo.CT_AdverseEvents",
            ["SiteCode", "PatientPK", "VisitDate"], _PII_CT,
            key_exprs={"VisitDate": _visitdate_as_date},
            lookups=(LookupSpec("AdverseEvent", "lkp_adverse_events"),),
            notes="LoadAdverseEvents.java:60-154; key includes "
                  "cast(VisitDate as date) (:145-146)",
        ),
        job("ct_allergies", "dwapicentral", "dbo.CT_AllergiesChronicIllness",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            lookups=(
                LookupSpec("AllergicReaction", "lkp_allergic_reaction"),
                LookupSpec("AllergyCausativeAgent", "lkp_allergy_causative_agent"),
                LookupSpec("ChronicIllness", "lkp_chronic_illness"),
            ),
            notes="LoadCTAllergies.java:136"),
        job("ct_covid", "dwapicentral", "dbo.CT_Covid",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT, notes="LoadCTCovid.java:97"),
        job("ct_defaulter_tracing", "dwapicentral", "dbo.CT_DefaulterTracing",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            notes="LoadCTDefaulterTracing.java:81"),
        job("ct_depression_screening", "dwapicentral", "dbo.CT_DepressionScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            notes="LoadDepressionScreening.java:80"),
        job("ct_drug_alcohol_screening", "dwapicentral", "dbo.CT_DrugAlcoholScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            notes="LoadDrugAlcoholScreening.java:87"),
        job("ct_enhanced_adherence_counselling", "dwapicentral",
            "dbo.CT_EnhancedAdherenceCounselling",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            notes="LoadEnhancedAdherenceCounselling.java:89"),
        job("ct_gbv_screening", "dwapicentral", "dbo.CT_GbvScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            notes="LoadCTGBVScreening.java:76"),
        job("ct_ipt", "dwapicentral", "dbo.CT_Ipt",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT, notes="LoadCTIPT.java:91"),
        job("ct_otz", "dwapicentral", "dbo.CT_Otz",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT, notes="LoadCTOTZ.java:92"),
        job("ct_ovc", "dwapicentral", "dbo.CT_Ovc",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT, notes="LoadCTOVC.java:79"),
        job("ct_contact_listing", "dwapicentral", "dbo.CT_ContactListing",
            ["SiteCode", "PatientPK"],
            {**_PII_CT, "ContactPatientPK": "ContactPatientPKHash"},
            notes="LoadCTContactListing.java:103"),
        job("ct_cervical_screening", "dwapicentral", "dbo.CT_CervicalCancerScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            notes="LoadCervicalScreening.java:77"),
        job("ct_cancer_screening", "dwapicentral", "dbo.CT_CancerScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            notes="LoadCancerScreening.java:78; FIXED QUIRK — reference "
                  "anti-joins CT_CervicalCancerScreening (:64) but writes "
                  "CT_CancerScreening (:110); we anti-join the real target"),
        job("ct_iit_risk_scores", "dwapicentral", "dbo.CT_IITRiskScores",
            ["ID"], _PII_CT, notes="LoadIITRiskScores.java:78"),
        job("ct_facility_manifest", "dwapicentral", "dbo.CT_FacilityManifest",
            ["ID"], notes="LoadFacilityManifest.java:69"),
        # --- HIS facility registry ------------------------------------------
        job("facilities", "his", "dbo.ALL_EMRSites", ["MFL_Code"],
            notes="LoadFacilities.java:17-87; minimal job shape (SURVEY §3.3)"),
        # --- HTSCentral -------------------------------------------------------
        job("hts_clients", "htscentral", "dbo.HTS_clients",
            ["PatientPK", "SiteCode"],
            {"PatientPK": "PatientPKHash", "NUPI": "NupiHash"},
            notes="LoadHtsClients.java:120"),
        job("hts_client_tests", "htscentral", "dbo.HTS_ClientTests",
            ["PatientPK", "SiteCode", "EncounterId"],
            {"PatientPK": "PatientPKHash"},
            rules=_HTS_CLIENT_TESTS_RULES,
            lookups=(LookupSpec("Strategy", "lkp_htsStrategy",
                                "Source_htsStrategy", "Target_htsStrategy"),),
            notes="LoadHtsClientTests.java:59-141"),
        job("hts_client_linkages", "htscentral", "dbo.HTS_ClientLinkages",
            ["PatientPK", "SiteCode"], _PII_HTS, notes="LoadHtsClientLinkages.java:84"),
        job("hts_client_tracing", "htscentral", "dbo.HTS_ClientTracing",
            ["PatientPK", "SiteCode", "HtsNumber", "TracingOutcome"], _PII_HTS,
            notes="LoadHtsClientTracing.java:74"),
        job("hts_eligibility", "htscentral", "dbo.HTS_EligibilityExtract",
            ["PatientPk", "SiteCode"], _PII_HTS,
            rules=_HTS_ELIGIBILITY_RULES,
            lookups=(LookupSpec("Disability", "lkp_htsDisability"),),
            notes="LoadHtsEligibility.java:83-117"),
        job("hts_partner_notification_services", "htscentral",
            "dbo.HTS_PartnerNotificationServices",
            ["PatientPk", "PartnerPatientPk", "SiteCode"], _PII_HTS,
            notes="LoadPartnerNotificationServices.java:92"),
        job("hts_partner_tracing", "htscentral", "dbo.HTS_PartnerTracings",
            ["PatientPk", "SiteCode", "HtsNumber"], _PII_HTS,
            notes="LoadHtsPartnerTracing.java:75"),
        job("hts_test_kits", "htscentral", "dbo.HTS_TestKits",
            ["PatientPk", "SiteCode"], _PII_HTS,
            notes="LoadHtsTestKits.java:42-88; dormant dd/MM/yyyy regex date "
                  "repair lives in plans (union_date_repair)"),
        # --- MNCHCentral ------------------------------------------------------
        job("mnch_anc_visits", "mnchcentral", "dbo.MNCH_AncVisits",
            ["PatientPk", "SiteCode", "VisitID", "ANCClinicNumber"], _PII_MNCH,
            notes="LoadMnchAncVisits.java:73"),
        job("mnch_arts", "mnchcentral", "dbo.MNCH_Arts",
            ["PatientPk", "SiteCode"], _PII_MNCH, notes="LoadMnchArts.java:73"),
        job("mnch_cwc_enrolments", "mnchcentral", "dbo.MNCH_CwcEnrolments",
            ["PatientPk", "SiteCode"],
            {"PatientPK": "PatientPKHash", "MothersPkv": "MothersPkvHash",
             "MothersCCCNo": "MothersCCCNoHash"},
            notes="LoadMnchCwcEnrolments.java:73"),
        job("mnch_cwc_visits", "mnchcentral", "dbo.MNCH_CwcVisits",
            ["PatientPk", "SiteCode"], _PII_MNCH, notes="LoadMnchCwcVisits.java:71"),
        job("mnch_enrolments", "mnchcentral", "dbo.MNCH_Enrolments",
            ["PatientPk", "SiteCode"], _PII_MNCH, notes="LoadMNCHEnrolments.java:73"),
        job("mnch_heis", "mnchcentral", "dbo.MNCH_HEIs",
            ["PatientPk", "SiteCode"], _PII_MNCH, notes="LoadMNCHHeis.java:72"),
        job("mnch_immunization", "mnchcentral", "dbo.MNCH_Immunization",
            ["PatientPK", "SiteCode", "PatientMnchID"], _PII_MNCH,
            notes="LoadMNCHImmunization.java:67"),
        job("mnch_labs", "mnchcentral", "dbo.MNCH_Labs",
            ["PatientPk", "SiteCode"],
            {"PatientPK": "PatientPKHash", "PatientMnch_ID": "PatientMnchIDHash"},
            notes="LoadMnchLabs.java:71"),
        job("mnch_mat_visits", "mnchcentral", "dbo.MNCH_MatVisits",
            ["PatientPk", "SiteCode"], _PII_MNCH, notes="LoadMnchMatVisits.java:68"),
        job("mnch_mother_baby_pairs", "mnchcentral", "dbo.MNCH_MotherBabyPairs",
            ["PatientPk", "SiteCode"],
            {"PatientPK": "PatientPKHash", "MotherPatientPK": "MotherPatientPKHash",
             "BabyPatientPK": "BabyPatientPKHash",
             "MotherPatientMncHeiID": "MotherPatientMncHeiIDHash"},
            notes="LoadMnchMotherBabyPairs.java:72"),
        job("mnch_patients", "mnchcentral", "dbo.MNCH_Patient",
            ["PatientPk", "SiteCode"],
            {**_PII_MNCH, "NUPI": "NupiHash"},
            notes="LoadMnchPatients.java:73"),
        job("mnch_pnc_visits", "mnchcentral", "dbo.MNCH_PncVisits",
            ["PatientPk", "SiteCode"], _PII_MNCH, notes="LoadMnchPncVisits.java:70"),
        # --- PrepCentral ------------------------------------------------------
        job("prep_patient", "prepcentral", "dbo.PrEP_Patient",
            ["PatientPk", "SiteCode"], _PII_PREP,
            notes="LoadPrepPatient.java:103-132; county canonicalization maps"),
        job("prep_visits", "prepcentral", "dbo.PrEP_Visits",
            ["PatientPk", "SiteCode"], _PII_PREP, notes="LoadPrepVisits.java:73"),
        job("prep_pharmacy", "prepcentral", "dbo.PrEP_Pharmacy",
            ["PatientPk", "SiteCode"], _PII_PREP, notes="LoadPrepPharmacy.java:81"),
        job("prep_behaviour_risk", "prepcentral", "dbo.PrEP_BehaviourRisk",
            ["PatientPk", "SiteCode"], _PII_PREP, notes="LoadPrepBehaviourRisk.java:100"),
        job("prep_care_termination", "prepcentral", "dbo.PrEP_CareTermination",
            ["PatientPk", "SiteCode"], _PII_PREP, notes="LoadPrepCareTermination.java:77"),
        job("prep_adverse_events", "prepcentral", "dbo.PrEP_AdverseEvent",
            ["PatientPk", "SiteCode"], _PII_PREP, notes="LoadPrepAdverseEvents.java:89"),
        job("prep_lab", "prepcentral", "dbo.PrEP_Lab",
            ["PatientPk", "SiteCode", "PrepNumber"], _PII_PREP,
            notes="LoadPrepLab.java:79"),
    ]
}
