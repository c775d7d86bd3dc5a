"""The 51-job catalog: every reference Spark job as a declarative JobSpec.

Key sets are the null-safe LEFT ANTI JOIN keys from each job's main class
(full citation table in SURVEY.md §2.4). PII hash maps are the per-job
``hashPIIColumns`` maps (``Core/.../DatabaseUtils.java:54-69`` call sites).
Cleaning rules encode the withColumn/when chains of every job the survey
traces — the four literal-heavy jobs plus the ten mid-tier chains, all in
``jobs/rules.py`` — plus the per-job date/range/empty rules and the
I-TECH/HMIS Project rewrite on all 15 CT jobs whose source SQL carries it;
dedupe key sets mirror each source query's ``GROUP BY key -> MAX(ID),
MAX(cast(date))`` self-join (census: 30 of the 51 source queries carry one).

Reference quirks intentionally fixed (SURVEY.md §7 "what's hard" item 2):
- LoadCancerScreening.java:64 anti-joins against CT_CervicalCancerScreening
  but writes CT_CancerScreening — we anti-join against the job's own target.
- The lowercase-`numpartitions`-without-partitionColumn JDBC reads that
  Spark silently ignores (LoadCTPatients.java:56) — our JdbcSpec requires
  explicit bounds for partitioned reads.
- The PrEP visits/pharmacy/behaviour/termination source queries dedupe via
  TWO inner-join gates (latest Created AND latest DateExtracted, e.g.
  ``LoadPrepVisits.sql:69-77``) — when the two winners differ the reference
  silently drops the key entirely; our single window orders by
  (DateExtracted, Created, ID) and always keeps exactly one row.
- ``LoadSourceCTPatientLabs.sql:1`` reads ``SELECT distinct top 10`` — a
  debug leftover that caps the national labs extract at 10 rows. Not
  reproduced: ct_patient_labs reads the full extract (see its ``notes=``).
- ``LoadPatientPharmacy.java:91,95`` — the Duration / PeriodTaken ``when``
  chains have no ``.otherwise`` arm, so the reference nulls every IN-range
  value. Not reproduced: we keep in-range values, matching the sibling ART
  rule (``LoadARTPatients.java:127-128``) and the clear intent
  (``jobs/rules.py:ct_patient_pharmacy_rules``).
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.jobs.rules import (
    adverse_events_value_rules,
    art_value_rules,
    ct_covid_rules,
    ct_otz_rules,
    ct_patient_baselines_rules,
    ct_patient_pharmacy_rules,
    hts_client_linkages_rules,
    hts_client_tests_value_rules,
    hts_clients_rules,
    hts_eligibility_rules,
    hts_partner_notification_rules,
    prep_adverse_events_rules,
    prep_behaviour_risk_rules,
    prep_patient_value_rules,
    prep_pharmacy_rules,
)
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
from dwh_etl_ods_spark_jobs_spark.jobs.projections import PROJECTIONS
from dwh_etl_ods_spark_jobs_spark.jobs.spec import EnrichSpec, JobSpec, LookupSpec
from dwh_etl_ods_spark_jobs_spark.operators import (
    date_clamp,
    empty_to_null,
    range_sentinel,
    value_map,
)

# ---------------------------------------------------------------------------
# Rule sets for the jobs whose cleaning logic the survey traces.
# ---------------------------------------------------------------------------

# LoadCTPatients.java:111-142 — the full ten-clamp chain: DOB floors at
# 1910 (everything else at 1980), all clamp to the 1900-01-01 sentinel.
# The trailing empty_to_null is an engine-native addition: '' on an
# identifier would otherwise hash to a real-looking PII digest.
_CT_PATIENTS_RULES = (
    date_clamp("DOB", lo="1910-01-01", hi_is_current_date=True, sentinel="1900-01-01"),
    *(
        date_clamp(c, lo="1980-01-01", hi_is_current_date=True, sentinel="1900-01-01")
        for c in (
            "RegistrationDate", "RegistrationAtCCC", "RegistrationAtPMTCT",
            "RegistrationAtTBClinic", "PreviousARTStartDate", "LastVisit",
            "DateConfirmedHIVPositive", "TransferInDate",
        )
    ),
    empty_to_null(["NUPI", "PatientID"]),
)

# LoadCTPatients.java:194-200 — the job's final SELECT column list, plus
# the in-flight hash columns (the reference hashes post-write via
# DatabaseUtils.hashPIIColumns, :221; engine-native they ride in-row).
_CT_PATIENTS_SELECT = (
    "ID", "PatientID", "PatientPK", "SiteCode", "FacilityName", "Gender",
    "DOB", "RegistrationDate", "RegistrationAtCCC", "RegistrationAtPMTCT",
    "RegistrationAtTBClinic", "PatientSource", "Region", "District",
    "Village", "ContactRelation", "LastVisit", "MaritalStatus",
    "EducationLevel", "DateConfirmedHIVPositive", "PreviousARTExposure",
    "PreviousARTStartDate", "Emr", "Project", "Orphan", "Inschool",
    "PatientType", "PopulationType", "KeyPopulationType",
    "PatientResidentCounty", "PatientResidentSubCounty",
    "PatientResidentLocation", "PatientResidentSubLocation",
    "PatientResidentWard", "PatientResidentVillage", "TransferInDate",
    "Occupation", "NUPI", "Pkv", "Date_Created", "Date_Last_Modified",
    "recorduuid", "voided",
    "PatientIDHash", "PatientPKHash", "NupiHash",
)

# LoadARTPatients.java:93-137, in reference order: DOB (1900 floor), eight
# ART-event dates (1980 floor, 1900 sentinel), Emr/Project literal maps
# (:121-126), Duration < 0 -> 999 (:127-128), age sentinels (:129-137).
_ART_PATIENTS_RULES = (
    date_clamp("DOB", lo="1900-01-01", hi_is_current_date=True, sentinel="1900-01-01"),
    *(
        date_clamp(c, lo="1980-01-01", hi_is_current_date=True, sentinel="1900-01-01")
        for c in (
            "StartARTDate", "StartARTAtThisFacility", "LastARTDate",
            "RegistrationDate", "PreviousARTStartDate", "ExpectedReturn",
            "LastVisit", "ExitDate",
        )
    ),
    *art_value_rules(),
    range_sentinel("Duration", 0, None, 999.0),
    range_sentinel("AgeARTStart", 0, 120, 999.0),
    range_sentinel("AgeLastVisit", 0, 120, 999.0),
    range_sentinel("AgeEnrollment", 0, 120, 999.0),
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

# LoadAdverseEvents.java:79-109 — event-date clamps then the four literal
# canonicalization maps (Severity / ActionTaken / Cause / ClinicalOutcome).
_ADVERSE_EVENTS_RULES = (
    date_clamp(
        "AdverseEventStartDate", lo="1980-01-01", hi_is_current_date=True,
        sentinel="1900-01-01",
    ),
    date_clamp(
        "AdverseEventEndDate", lo="1980-01-01", hi_is_current_date=True,
        sentinel="1900-01-01",
    ),
    *adverse_events_value_rules(),
)

# LoadHtsEligibility.java:61-99 — the FULL chain: five 0/1 -> No/Yes flags,
# PatientType collapse, 7-column '' -> NULL sweep, DateTestedProvider 1980
# floor -> NULL, VisitDate 2019 floor -> NULL (jobs/rules.py).
_HTS_ELIGIBILITY_RULES = hts_eligibility_rules()

# LoadHtsClientTests.java:80-112 — the eight category-collapse maps
# (incl. TbScreening's otherwise('Not Done')), then MonthsSinceLastTest
# > 1540 -> NULL (:111-112; upper bound only — the reference keeps
# negative months, so lo=None).
_HTS_CLIENT_TESTS_RULES = (
    *hts_client_tests_value_rules(),
    range_sentinel("MonthsSinceLastTest", None, 1540, None, cast_to="int"),
)

# LoadPrepPatient.java:55-114 — '' -> NULL sweep + KeyPopulationType /
# Inschool / MaritalStatus / County maps.
_PREP_PATIENT_RULES = prep_patient_value_rules()

# The CASE P.[Project] WHEN 'I-TECH'/'HMIS' THEN 'Kenya HMIS II' rewrite
# embedded in 15 CT source queries (census: grep -rl "I-TECH" over the
# reference resources — ART patients, Allergies, ContactListing,
# DepressionScreening, DrugAlcoholScreening, EnhancedAdherenceCounselling,
# GBVScreening, IPT, OTZ, OVC, PatientBaselines, PatientLabs,
# PatientPharmacy, PatientStatus, PatientVisits; e.g.
# LoadSourcePatientStatus.sql:11, LoadCTIPT.sql:5-9). Engine-native it is
# a plain value map, applied BEFORE each job's Java-side chain — the SQL
# ran in the source database, upstream of the Spark cleaning.
_PROJECT_SOURCE_RULES = (
    value_map("Project", {"Kenya HMIS II": ["I-TECH", "HMIS"]}),
)


def _visitdate_as_date():
    # LoadAdverseEvents.java:145-146: key includes cast(VisitDate as date).
    # try_cast: a malformed string VisitDate becomes a NULL key (handled by
    # the null-safe anti-join) instead of an ANSI cast crash.
    return F.col("VisitDate").try_cast("date")


# ---------------------------------------------------------------------------
# CT_PatientVisits target DDL — the final projection column order
# (Load CT Patient Visits/src/main/resources/PatientVisitsDDL.sql:1-78).
# ---------------------------------------------------------------------------

_CT_PATIENT_VISITS_DDL = (
    "PatientID", "FacilityName", "SiteCode", "PatientPK", "VisitID",
    "VisitDate", "SERVICE", "VisitType", "WHOStage", "WABStage", "Pregnant",
    "LMP", "EDD", "Height", "Weight", "BP", "OI", "OIDate", "Adherence",
    "AdherenceCategory", "FamilyPlanningMethod", "PwP", "GestationAge",
    "NextAppointmentDate", "SubstitutionFirstlineReg",
    "SubstitutionFirstLineRegReason", "SubstitutionSecondLineReg",
    "SubstitutionSecondLineRegReason", "SecondLineRegChange",
    "SecondLineRegChangeReason", "Emr", "Project", "DateImported",
    "DeletedFlag", "DifferentiatedCare", "StabilityAssessment",
    "KeyPopulationType", "PopulationType", "VisitBy", "Temp", "PulseRate",
    "RespiratoryRate", "OxygenSaturation", "Muac", "NutritionalStatus",
    "EverHadMenses", "Breastfeeding", "Menopausal", "NoFPReason",
    "ProphylaxisUsed", "CTXAdherence", "CurrentRegimen", "HCWConcern",
    "TCAReason", "ClinicalNotes", "GeneralExamination", "SystemExamination",
    "Skin", "Eyes", "ENT", "Chest", "CVS", "Abdomen", "CNS",
    "Genitourinary", "PatientPKHash", "PatientIDHash", "ZScore",
    "ZScoreAbsolute", "RefillDate", "PaedsDisclosure", "Date_Last_Modified",
    "Date_Created", "LoadDate", "RecordUUID", "voided",
)

# The DDL's non-varchar column types (PatientVisitsDDL.sql:1-78), so
# NULL-filled projection columns carry the target's type — a first JDBC
# append that auto-creates the table must not emit VARCHAR for these.
_CT_PATIENT_VISITS_TYPES = {
    "VisitDate": "date", "OIDate": "date", "NextAppointmentDate": "date",
    "DateImported": "date",
    "DeletedFlag": "boolean", "voided": "boolean",
    "Temp": "decimal(18,2)", "OxygenSaturation": "decimal(18,2)",
    "PulseRate": "int", "RespiratoryRate": "int", "Muac": "int",
    "RefillDate": "timestamp", "Date_Last_Modified": "timestamp",
    "Date_Created": "timestamp", "LoadDate": "timestamp",
}


# ---------------------------------------------------------------------------
# Catalog
# ---------------------------------------------------------------------------

_PII_CT = {"PatientID": "PatientIDHash", "PatientPK": "PatientPKHash"}
_PII_HTS = {"PatientPK": "PatientPKHash", "HtsNumber": "HtsNumberHash"}
_PII_MNCH = {"PatientPK": "PatientPKHash", "PatientMnchID": "PatientMnchIDHash"}
_PII_PREP = {"PatientPK": "PatientPKHash", "PrepNumber": "PrepNumberHash"}

# Dedupe orders: the MAX(...) columns of each source query's self-join gate.
_BY_EXTRACTED = ("DateExtracted", "ID")   # max(cast(DateExtracted as date)), max(ID)
_BY_CREATED = ("Created", "ID")           # max(cast(Created as date)), max(ID)
_BY_DATECREATED = ("DateCreated", "ID")   # max(cast(datecreated as date)), max(ID)
# PrEP dual-gate queries (see module docstring, fixed quirk).
_BY_BOTH = ("DateExtracted", "Created", "ID")


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
                LookupSpec("EducationLevel", "Lkp_EducationLevel",
                           "SourceEducationLevel", "TargetEducationLevel"),
                LookupSpec("PatientSource", "lkp_patient_source"),
                LookupSpec("PreviousARTExposure", "lkp_RegimenLineMap",
                           "Source_Regimen", "Target_Regimen"),
            ),
            select=_CT_PATIENTS_SELECT,
            enrich=EnrichSpec(),
            filters=(GENDER_NOT_NULL, *CT_GATE),
            source_table="[DWAPICentral].[dbo].[PatientExtract]",
            notes="LoadCTPatients.java:27-228; clean chain :111-142; "
                  "PreviousARTExposure folds via lkp_RegimenLineMap "
                  "(:82-89,147,154); education lookup uses Source/Target"
                  "EducationLevel columns (:79); final projection :194-200; "
                  "source star join LoadSourceCTPatients.sql:7-9",
        ),
        job(
            "ct_art_patients", "dwapicentral", "dbo.CT_ARTPatients",
            ["PatientPK", "SiteCode"], _PII_CT,
            dedupe_keys=("PatientPK", "SiteCode"),
            rules=(*_PROJECT_SOURCE_RULES, *_ART_PATIENTS_RULES),
            lookups=(
                LookupSpec("PreviousARTRegimen", "lkp_regimen"),
                LookupSpec("StartRegimen", "lkp_regimen"),
                LookupSpec("LastRegimen", "lkp_regimen"),
                LookupSpec("ExitReason", "lkp_exit_reason"),
            ),
            enrich=EnrichSpec(),
            filters=CT_GATE,
            source_table="[DWAPICentral].[dbo].[PatientArtExtract]",
            notes="LoadARTPatients.java:59-181; full clean chain :93-137 incl "
                  "Emr/Project maps (:121-126); fixes the PreviousARTRegimen "
                  "fold that falls back to ExitReason (:148-149); source star "
                  "join LoadSourceARTPatients.sql:19-21",
        ),
        job(
            "ct_patient_visits", "dwapicentral", "dbo.CT_PatientVisits",
            ["PatientPK", "SiteCode", "VisitID"], _PII_CT,
            dedupe_keys=("PatientPK", "SiteCode", "VisitID"),
            rules=(*_PROJECT_SOURCE_RULES, *_PATIENT_VISITS_RULES),
            lookups=(
                LookupSpec("FamilyPlanningMethod", "lkp_family_planning_method"),
                LookupSpec("PwP", "lkp_pwp"),
            ),
            select=_CT_PATIENT_VISITS_DDL,
            select_types=_CT_PATIENT_VISITS_TYPES,
            enrich=EnrichSpec(),
            filters=CT_GATE,
            source_table="[DWAPICentral].[dbo].[PatientVisitExtract]",
            notes="LoadPatientVisits.java:47-135; the one job with a real "
                  "range-partitioned JDBC read (SiteCode bounds); final "
                  "projection = PatientVisitsDDL.sql:1-78 order",
        ),
        job(
            "ct_patient_pharmacy", "dwapicentral", "dbo.CT_PatientPharmacy",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            dedupe_keys=("SiteCode", "PatientPK", "VisitID"),
            rules=(*_PROJECT_SOURCE_RULES, *ct_patient_pharmacy_rules()),
            lookups=(
                LookupSpec("Drug", "lkp_regimen"),
                LookupSpec("TreatmentType", "lkp_treatment_type"),
                LookupSpec("ProphylaxisType", "lkp_prophylaxis_type"),
            ),
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[PatientPharmacyExtract]",
            notes="LoadPatientPharmacy.java:60-142; clean chain :90-102 "
                  "(jobs/rules.py:ct_patient_pharmacy_rules); Project "
                  "rewrite in source SQL",
        ),
        job(
            "ct_patient_labs", "dwapicentral", "dbo.CT_PatientLabs",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            dedupe_keys=("SiteCode", "PatientPK", "TestResult", "TestName",
                         "OrderedbyDate", "Voided"),
            dedupe_order=_BY_CREATED,
            rules=_PROJECT_SOURCE_RULES,
            lookups=(LookupSpec("TestName", "lkp_test_name"),),
            filters=(GENDER_NOT_UNKNOWN,),
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[PatientLaboratoryExtract]",
            notes="LoadPatientLabs.java:111; source dedupe "
                  "LoadSourceCTPatientLabs.sql:18-27 (GROUP BY code, "
                  "PatientPID, TestResult, TestName, OrderedbyDate, voided)",
        ),
        job("ct_patient_status", "dwapicentral", "dbo.CT_PatientStatus",
            ["SiteCode", "PatientPK"], _PII_CT,
            dedupe_keys=("SiteCode", "PatientPK", "ExitDate", "Voided"),
            dedupe_order=_BY_CREATED,
            rules=_PROJECT_SOURCE_RULES,
            lookups=(LookupSpec("ExitReason", "lkp_exit_reason"),),
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[PatientStatusExtract]",
            notes="LoadPatientStatus.java:92; source dedupe "
                  "LoadSourcePatientStatus.sql:29-53; Project rewrite :11"),
        job("ct_patient_baselines", "dwapicentral", "dbo.CT_PatientBaselines",
            ["SiteCode", "PatientPK"], _PII_CT,
            dedupe_keys=("SiteCode", "PatientPK", "Voided"),
            dedupe_order=_BY_CREATED,
            rules=(*_PROJECT_SOURCE_RULES, *ct_patient_baselines_rules()),
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[PatientBaselinesExtract]",
            notes="LoadPatientBaselines.java:92; clean chain :57-64 "
                  "(jobs/rules.py:ct_patient_baselines_rules); source dedupe "
                  "LoadPatientBaselines.sql:17-22"),
        job(
            "ct_adverse_events", "dwapicentral", "dbo.CT_AdverseEvents",
            ["SiteCode", "PatientPK", "VisitDate"], _PII_CT,
            key_exprs={"VisitDate": _visitdate_as_date},
            rules=_ADVERSE_EVENTS_RULES,
            lookups=(
                LookupSpec("AdverseEvent", "lkp_adverse_events"),
                LookupSpec("AdverseEventRegimen", "lkp_regimen"),
            ),
            filters=(SITECODE_POSITIVE,),
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[PatientAdverseEventExtract]",
            notes="LoadAdverseEvents.java:60-154; key includes "
                  "cast(VisitDate as date) (:145-146); clean chain :79-109",
        ),
        job("ct_allergies", "dwapicentral", "dbo.CT_AllergiesChronicIllness",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=_PROJECT_SOURCE_RULES,
            lookups=(
                LookupSpec("AllergicReaction", "lkp_allergic_reaction"),
                LookupSpec("AllergyCausativeAgent", "lkp_allergy_causative_agent"),
                LookupSpec("ChronicIllness", "lkp_chronic_illness"),
            ),
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[AllergiesChronicIllnessExtract]",
            notes="LoadCTAllergies.java:136"),
        job("ct_covid", "dwapicentral", "dbo.CT_Covid",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=ct_covid_rules(),
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[CovidExtract]",
            notes="LoadCTCovid.java:97; clean chain :61-73 "
                  "(jobs/rules.py:ct_covid_rules)"),
        job("ct_defaulter_tracing", "dwapicentral", "dbo.CT_DefaulterTracing",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[DefaulterTracingExtract]",
            notes="LoadCTDefaulterTracing.java:81"),
        job("ct_depression_screening", "dwapicentral", "dbo.CT_DepressionScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=_PROJECT_SOURCE_RULES,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[DepressionScreeningExtract]",
            notes="LoadDepressionScreening.java:80"),
        job("ct_drug_alcohol_screening", "dwapicentral", "dbo.CT_DrugAlcoholScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=_PROJECT_SOURCE_RULES,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[DrugAlcoholScreeningExtract]",
            notes="LoadDrugAlcoholScreening.java:87"),
        job("ct_enhanced_adherence_counselling", "dwapicentral",
            "dbo.CT_EnhancedAdherenceCounselling",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=_PROJECT_SOURCE_RULES,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[EnhancedAdherenceCounsellingExtract]",
            notes="LoadEnhancedAdherenceCounselling.java:89"),
        job("ct_gbv_screening", "dwapicentral", "dbo.CT_GbvScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=_PROJECT_SOURCE_RULES,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[GbvScreeningExtract]",
            notes="LoadCTGBVScreening.java:76"),
        job("ct_ipt", "dwapicentral", "dbo.CT_Ipt",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=_PROJECT_SOURCE_RULES,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[IptExtract]",
            notes="LoadCTIPT.java:91; Project rewrite LoadCTIPT.sql:5-9"),
        job("ct_otz", "dwapicentral", "dbo.CT_Otz",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=(*_PROJECT_SOURCE_RULES, *ct_otz_rules()),
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[OtzExtract]",
            notes="LoadCTOTZ.java:92; clean chain :59-67 "
                  "(jobs/rules.py:ct_otz_rules, 2012 enrollment floor)"),
        job("ct_ovc", "dwapicentral", "dbo.CT_Ovc",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            rules=_PROJECT_SOURCE_RULES,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[OvcExtract]",
            notes="LoadCTOVC.java:79"),
        job("ct_contact_listing", "dwapicentral", "dbo.CT_ContactListing",
            ["SiteCode", "PatientPK"],
            {**_PII_CT, "ContactPatientPK": "ContactPatientPKHash"},
            dedupe_keys=("SiteCode", "PatientPK", "ContactAge"),
            dedupe_order=_BY_CREATED,
            rules=_PROJECT_SOURCE_RULES,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[ContactListingExtract]",
            notes="LoadCTContactListing.java:103 (anti-join key SiteCode+"
                  "PatientPK only); the source query dedupes at the FINER "
                  "(SiteCode, PatientPK, ContactAge) grain with max(created) "
                  "(LoadCTContactListing.sql:23-31) and rewrites Project "
                  "(:5-9); ContactPatientPK hashed"),
        job("ct_cervical_screening", "dwapicentral", "dbo.CT_CervicalCancerScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            filters=(GENDER_NOT_UNKNOWN,),
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[CervicalCancerScreeningExtract]",
            notes="LoadCervicalScreening.java:77"),
        job("ct_cancer_screening", "dwapicentral", "dbo.CT_CancerScreening",
            ["SiteCode", "PatientPK", "VisitID"], _PII_CT,
            filters=(GENDER_NOT_UNKNOWN,),
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[CancerScreeningExtract]",
            notes="LoadCancerScreening.java:78; FIXED QUIRK — reference "
                  "anti-joins CT_CervicalCancerScreening (:64) but writes "
                  "CT_CancerScreening (:110); we anti-join the real target"),
        job("ct_iit_risk_scores", "dwapicentral", "dbo.CT_IITRiskScores",
            ["ID"], _PII_CT,
            filters=CT_GATE,
            enrich=EnrichSpec(),
            source_table="[DWAPICentral].[dbo].[IITRiskScoresExtract]",
            notes="LoadIITRiskScores.java:78; gender/code gate "
                  "LoadIITRiskScores.sql"),
        job("ct_facility_manifest", "dwapicentral", "dbo.CT_FacilityManifest",
            ["ID"],
            source_table="[DWAPICentral].[dbo].[FacilityManifest]",
            notes="LoadFacilityManifest.java:69"),
        # --- HIS facility registry ------------------------------------------
        job("facilities", "his", "dbo.ALL_EMRSites", ["MFL_Code"],
            filters=(MFL_CODE_NOT_EMPTY,),
            source_table="[HIS_Implementation].[dbo].[All_EMRSites]",
            notes="LoadFacilities.java:17-87; minimal job shape (SURVEY §3.3)"),
        # --- HTSCentral -------------------------------------------------------
        job("hts_clients", "htscentral", "dbo.HTS_clients",
            ["PatientPK", "SiteCode"],
            {"PatientPK": "PatientPKHash", "NUPI": "NupiHash"},
            dedupe_keys=("SiteCode", "PatientPK"),
            dedupe_order=_BY_DATECREATED,
            rules=hts_clients_rules(),
            filters=(HTS_EXTRACT_CUTOFF,),
            source_table="[HTSCentral].[dbo].[Clients]",
            notes="LoadHtsClients.java:120; clean chain :82-92 "
                  "(jobs/rules.py:hts_clients_rules); source dedupe "
                  "LoadHtsClients.sql:26-31 (max ID, max datecreated)"),
        job("hts_client_tests", "htscentral", "dbo.HTS_ClientTests",
            ["PatientPK", "SiteCode", "EncounterId"],
            {"PatientPK": "PatientPKHash"},
            dedupe_keys=("SiteCode", "PatientPK", "FinalTestResult",
                         "TestDate", "EncounterId"),
            rules=_HTS_CLIENT_TESTS_RULES,
            lookups=(
                LookupSpec("EntryPoint", "lkp_patient_source"),
                LookupSpec("TestStrategy", "lkp_htsStrategy",
                           "Source_htsStrategy", "Target_htsStrategy"),
            ),
            source_table="[HTSCentral].[dbo].[HtsClientTests]",
            notes="LoadHtsClientTests.java:59-141 (EntryPoint :116-120, "
                  "TestStrategy :117-123); source dedupe "
                  "LoadHtsClientTests.sql:42-50"),
        job("hts_client_linkages", "htscentral", "dbo.HTS_ClientLinkages",
            ["PatientPK", "SiteCode"], _PII_HTS,
            dedupe_keys=("SiteCode", "PatientPK"),
            rules=hts_client_linkages_rules(),
            filters=(HTS_EXTRACT_CUTOFF,),
            source_table="[HTSCentral].[dbo].[ClientLinkages]",
            notes="LoadHtsClientLinkages.java:84; clean chain :61-66 "
                  "(jobs/rules.py:hts_client_linkages_rules); source dedupe "
                  "LoadHtsClientLinkages.sql:19-24"),
        job("hts_client_tracing", "htscentral", "dbo.HTS_ClientTracing",
            ["PatientPK", "SiteCode", "HtsNumber", "TracingOutcome"], _PII_HTS,
            filters=(TRACING_TYPE_NOT_NULL, TRACING_OUTCOME_NOT_NULL),
            source_table="[HTSCentral].[dbo].[HtsClientTracing]",
            notes="LoadHtsClientTracing.java:74"),
        job("hts_eligibility", "htscentral", "dbo.HTS_EligibilityExtract",
            ["PatientPk", "SiteCode"], _PII_HTS,
            dedupe_keys=("SiteCode", "PatientPk", "EncounterID", "VisitID"),
            rules=_HTS_ELIGIBILITY_RULES,
            lookups=(LookupSpec("Disability", "lkp_htsDisability"),),
            source_table="[HTSCentral].[dbo].[HtsEligibilityExtract]",
            notes="LoadHtsEligibility.java:83-117; dual dedupe gates "
                  "(DateCreated + DateExtracted) collapsed to one window "
                  "(fixed quirk, module docstring)"),
        job("hts_partner_notification_services", "htscentral",
            "dbo.HTS_PartnerNotificationServices",
            ["PatientPk", "PartnerPatientPk", "SiteCode"], _PII_HTS,
            rules=hts_partner_notification_rules(),
            source_table="[HTSCentral].[dbo].[HtsPartnerNotificationServices]",
            notes="LoadPartnerNotificationServices.java:92; clean chain "
                  ":58-74 (jobs/rules.py:hts_partner_notification_rules)"),
        job("hts_partner_tracing", "htscentral", "dbo.HTS_PartnerTracings",
            ["PatientPk", "SiteCode", "HtsNumber"], _PII_HTS,
            dedupe_keys=("SiteCode", "PatientPk", "HtsNumber", "TraceType",
                         "BookingDate", "TraceDate", "TraceOutcome"),
            source_table="[HTSCentral].[dbo].[HtsPartnerTracings]",
            notes="LoadHtsPartnerTracing.java:75; source dedupe "
                  "LoadHtsPartnerTracing.sql:13-18"),
        job("hts_test_kits", "htscentral", "dbo.HTS_TestKits",
            ["PatientPk", "SiteCode"], _PII_HTS,
            dedupe_keys=("SiteCode", "PatientPk", "EncounterId",
                         "TestKitName1", "TestResult2", "TestKitLotNumber1"),
            source_table="[HTSCentral].[dbo].[HtsTestKits]",
            notes="LoadHtsTestKits.java:42-88; source dedupe "
                  "LoadHtsTestKits.sql:19-28; dormant dd/MM/yyyy regex date "
                  "repair lives in plans (union_date_repair)"),
        # --- MNCHCentral ------------------------------------------------------
        job("mnch_anc_visits", "mnchcentral", "dbo.MNCH_AncVisits",
            ["PatientPk", "SiteCode", "VisitID", "ANCClinicNumber"], _PII_MNCH,
            dedupe_keys=("PatientPk", "SiteCode", "VisitDate"),
            source_table="[MNCHCentral].[dbo].[AncVisits]",
            notes="LoadMnchAncVisits.java:73; source dedupe "
                  "LoadMnchAncVisits.sql:11-15"),
        job("mnch_arts", "mnchcentral", "dbo.MNCH_Arts",
            ["PatientPk", "SiteCode"], _PII_MNCH,
            dedupe_keys=("PatientPk", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[MnchArts]",
            notes="LoadMnchArts.java:73; source dedupe LoadMnchArts.sql"),
        job("mnch_cwc_enrolments", "mnchcentral", "dbo.MNCH_CwcEnrolments",
            ["PatientPk", "SiteCode"],
            {"PatientPK": "PatientPKHash", "MothersPkv": "MothersPkvHash",
             "MothersCCCNo": "MothersCCCNoHash"},
            dedupe_keys=("PatientPk", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[CwcEnrolments]",
            notes="LoadMnchCwcEnrolments.java:73; source dedupe "
                  "LoadMnchCwcEnrolments.sql"),
        job("mnch_cwc_visits", "mnchcentral", "dbo.MNCH_CwcVisits",
            ["PatientPk", "SiteCode"], _PII_MNCH,
            dedupe_keys=("PatientPk", "SiteCode", "VisitDate"),
            source_table="[MNCHCentral].[dbo].[CwcVisits]",
            notes="LoadMnchCwcVisits.java:71; source dedupe "
                  "LoadMnchCwcVisits.sql"),
        job("mnch_enrolments", "mnchcentral", "dbo.MNCH_Enrolments",
            ["PatientPk", "SiteCode"], _PII_MNCH,
            dedupe_keys=("PatientPk", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[MnchEnrolments]",
            notes="LoadMNCHEnrolments.java:73; source dedupe "
                  "LoadMNCHEnrolments.sql"),
        job("mnch_heis", "mnchcentral", "dbo.MNCH_HEIs",
            ["PatientPk", "SiteCode"], _PII_MNCH,
            dedupe_keys=("PatientPk", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[Heis]",
            notes="LoadMNCHHeis.java:72; source dedupe LoadMNCHHeis.sql:5-8"),
        job("mnch_immunization", "mnchcentral", "dbo.MNCH_Immunization",
            ["PatientPK", "SiteCode", "PatientMnchID"], _PII_MNCH,
            dedupe_keys=("PatientPK", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[MnchImmunizations]",
            notes="LoadMNCHImmunization.java:67; source dedupe "
                  "LoadMNCHImmunization.sql"),
        job("mnch_labs", "mnchcentral", "dbo.MNCH_Labs",
            ["PatientPk", "SiteCode"],
            {"PatientPK": "PatientPKHash", "PatientMnch_ID": "PatientMnchIDHash"},
            dedupe_keys=("PatientPk", "SiteCode", "OrderedbyDate"),
            source_table="[MNCHCentral].[dbo].[MnchLabs]",
            notes="LoadMnchLabs.java:71; source dedupe LoadMnchLabs.sql:5-8"),
        job("mnch_mat_visits", "mnchcentral", "dbo.MNCH_MatVisits",
            ["PatientPk", "SiteCode"], _PII_MNCH,
            dedupe_keys=("PatientPk", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[MatVisits]",
            notes="LoadMnchMatVisits.java:68; source dedupe "
                  "LoadMnchMatVisits.sql"),
        job("mnch_mother_baby_pairs", "mnchcentral", "dbo.MNCH_MotherBabyPairs",
            ["PatientPk", "SiteCode"],
            {"PatientPK": "PatientPKHash", "MotherPatientPK": "MotherPatientPKHash",
             "BabyPatientPK": "BabyPatientPKHash",
             "MotherPatientMncHeiID": "MotherPatientMncHeiIDHash"},
            dedupe_keys=("PatientPk", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[MotherBabyPairs]",
            notes="LoadMnchMotherBabyPairs.java:72; source dedupe "
                  "LoadMnchMotherBabyPairs.sql"),
        job("mnch_patients", "mnchcentral", "dbo.MNCH_Patient",
            ["PatientPk", "SiteCode"],
            {**_PII_MNCH, "NUPI": "NupiHash"},
            dedupe_keys=("PatientPk", "SiteCode"),
            source_table="[MNCHCentral].[dbo].[MnchPatients]",
            notes="LoadMnchPatients.java:73; source dedupe "
                  "LoadMnchPatients.sql"),
        job("mnch_pnc_visits", "mnchcentral", "dbo.MNCH_PncVisits",
            ["PatientPk", "SiteCode"], _PII_MNCH,
            dedupe_keys=("SiteCode", "PatientPk", "VisitDate", "VisitID"),
            source_table="[MNCHCentral].[dbo].[PncVisits]",
            notes="LoadMnchPncVisits.java:70; source dedupe "
                  "LoadMnchPncVisits.sql"),
        # --- PrepCentral ------------------------------------------------------
        job("prep_patient", "prepcentral", "dbo.PrEP_Patient",
            ["PatientPk", "SiteCode"], _PII_PREP,
            dedupe_keys=("PatientPk", "SiteCode"),
            dedupe_order=_BY_CREATED,
            rules=_PREP_PATIENT_RULES,
            source_table="[PREPCentral].[dbo].[PrepPatients]",
            notes="LoadPrepPatient.java:55-132 — '' -> NULL sweep + "
                  "KeyPopulationType/Inschool/MaritalStatus/County maps; "
                  "source dedupe LoadPrepPatient.sql"),
        job("prep_visits", "prepcentral", "dbo.PrEP_Visits",
            ["PatientPk", "SiteCode"], _PII_PREP,
            dedupe_keys=("PatientPk", "SiteCode"),
            dedupe_order=_BY_BOTH,
            source_table="[PREPCentral].[dbo].[PrepVisits]",
            notes="LoadPrepVisits.java:73; dual dedupe gates "
                  "LoadPrepVisits.sql:69-77 (fixed quirk)"),
        job("prep_pharmacy", "prepcentral", "dbo.PrEP_Pharmacy",
            ["PatientPk", "SiteCode"], _PII_PREP,
            dedupe_keys=("PatientPk", "SiteCode"),
            dedupe_order=_BY_BOTH,
            rules=prep_pharmacy_rules(),
            source_table="[PREPCentral].[dbo].[PrepPharmacys]",
            notes="LoadPrepPharmacy.java:81; clean chain :56-63 "
                  "(jobs/rules.py:prep_pharmacy_rules); dual dedupe gates "
                  "(fixed quirk)"),
        job("prep_behaviour_risk", "prepcentral", "dbo.PrEP_BehaviourRisk",
            ["PatientPk", "SiteCode"], _PII_PREP,
            dedupe_keys=("PatientPk", "SiteCode"),
            dedupe_order=_BY_BOTH,
            rules=prep_behaviour_risk_rules(),
            source_table="[PREPCentral].[dbo].[PrepBehaviourRisks]",
            notes="LoadPrepBehaviourRisk.java:100; '' -> NULL sweep :57-82 "
                  "(jobs/rules.py:prep_behaviour_risk_rules); dual dedupe "
                  "gates (fixed quirk)"),
        job("prep_care_termination", "prepcentral", "dbo.PrEP_CareTermination",
            ["PatientPk", "SiteCode"], _PII_PREP,
            dedupe_keys=("PatientPk", "SiteCode"),
            dedupe_order=_BY_BOTH,
            source_table="[PREPCentral].[dbo].[PrepCareTerminations]",
            notes="LoadPrepCareTermination.java:77; dual dedupe gates "
                  "(fixed quirk)"),
        job("prep_adverse_events", "prepcentral", "dbo.PrEP_AdverseEvent",
            ["PatientPk", "SiteCode"], _PII_PREP,
            dedupe_keys=("PatientPk", "SiteCode"),
            dedupe_order=_BY_CREATED,
            rules=prep_adverse_events_rules(),
            source_table="[PREPCentral].[dbo].[PrepAdverseEvents]",
            notes="LoadPrepAdverseEvents.java:89; '' -> NULL sweep :55-71 "
                  "(jobs/rules.py:prep_adverse_events_rules); source dedupe "
                  "LoadPrepAdverseEvents.sql"),
        job("prep_lab", "prepcentral", "dbo.PrEP_Lab",
            ["PatientPk", "SiteCode", "PrepNumber"], _PII_PREP,
            dedupe_keys=("PatientPk", "SiteCode", "PrepNumber"),
            dedupe_order=_BY_CREATED,
            source_table="[PREPCentral].[dbo].[PrepLabs]",
            notes="LoadPrepLab.java:79; source dedupe LoadPrepLab.sql"),
    ]
}


def _attach_projection(spec: JobSpec) -> JobSpec:
    """Default every job's final projection to its reference column list
    (jobs/projections.py), appending the in-flight PII hash columns the
    reference added post-write. Curated selects (ct_patients,
    ct_patient_visits) win over the extracted list."""
    if spec.select is not None or spec.name not in PROJECTIONS:
        return spec
    # The reference lists mix casings for what is one column (Patientpk vs
    # PatientPK); normalize to the spec's canonical key/PII casing so
    # downstream key selects see one spelling. Keys come LAST so the
    # anti-join key spelling wins over a PII-map spelling when the shared
    # _PII_* dict spells the same column differently (e.g. _PII_MNCH's
    # PatientPK vs mnch_heis's key PatientPk).
    canon = {k.lower(): k for k in (*spec.pii.values(), *spec.pii, *spec.keys)}
    cols = tuple(canon.get(c.lower(), c) for c in PROJECTIONS[spec.name])
    have = {c.lower() for c in cols}
    hashes = tuple(h for h in spec.pii.values() if h.lower() not in have)
    return dataclasses.replace(spec, select=cols + hashes)


CATALOG = {name: _attach_projection(spec) for name, spec in CATALOG.items()}
