"""Per-job literal canonicalization maps from the reference's Java mains.

The reference hard-codes 100+-literal ``when(col.isin(...)) -> label``
chains inside four job classes; here each map is DATA (a dict of
``canonical_label -> [source literals]``), consumed twice:

- :func:`~dwh_etl_ods_spark_jobs_spark.operators.value_map` compiles it to
  one Catalyst CASE expression (codegen'd, zero shuffle) for the job specs
  in ``jobs/catalog.py``;
- :func:`value_map_sql` emits the equivalent ANSI CASE for the DuckDB
  oracle, so the driver's correctness gate hash-checks the SAME constants
  through both engines (``plans/job_rules.py``).

Provenance (full chains, in reference order):

- ART Emr/Project         -- ``Load CT ART Patients/.../LoadARTPatients.java:121-126``
- AdverseEvents Severity / ActionTaken / Cause / ClinicalOutcome
                          -- ``Load CT Adverse Events/.../LoadAdverseEvents.java:86-109``
- PrepPatient empty-string sweep + KeyPopulationType / Inschool /
  MaritalStatus / County  -- ``Load Prep Patient/.../LoadPrepPatient.java:55-114``
- HtsClientTests ClientTestedAs / TbScreening / ClientSelfTested /
  CoupleDiscordant / TestType / Consent / Setting / Approach
                          -- ``Load HTS Client Tests/.../LoadHtsClientTests.java:80-112``

Round-4 additions — the remaining mid-tier job chains, in reference order:

- CT PatientPharmacy      -- ``Load CT Patient Pharmacy/.../LoadPatientPharmacy.java:90-102``
- Prep BehaviourRisk sweep -- ``Load Prep Behaviour Risk/.../LoadPrepBehaviourRisk.java:57-82``
- PrEP AdverseEvents sweep -- ``Load PrEP Adverse Events/.../LoadPrepAdverseEvents.java:55-71``
- HTS PartnerNotificationServices
                          -- ``Load HTS Partner Notification Services/.../LoadPartnerNotificationServices.java:58-74``
- HTS Clients             -- ``Load HTS Clients/.../LoadHtsClients.java:82-92``
- CT OTZ                  -- ``Load CT OTZ/.../LoadCTOTZ.java:59-67``
- CT Covid                -- ``Load CT Covid/.../LoadCTCovid.java:61-73``
- CT PatientBaselines     -- ``Load CT Patient Baselines/.../LoadPatientBaselines.java:57-64``
- Prep Pharmacy           -- ``Load Prep Pharmacy/.../LoadPrepPharmacy.java:56-63``
- HTS ClientLinkages      -- ``Load HTS Client Linkages/.../LoadHtsClientLinkages.java:61-66``
- HTS Eligibility (full)  -- ``Load HTS Eligibility/.../LoadHtsEligibility.java:61-99``

All maps are case-SENSITIVE: the reference compares these in Spark (Java
``Column.isin``), not under SQL Server collation — unlike the lookup-table
folds, which are CI (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from dwh_etl_ods_spark_jobs_spark.operators import (
    date_clamp,
    empty_to_null,
    presence_flag,
    range_sentinel,
    value_map,
    values_to_null,
)

# --------------------------------------------------------------------------
# Load CT ART Patients — LoadARTPatients.java:121-126
# --------------------------------------------------------------------------

ART_EMR_MAP: dict[str, list[str]] = {
    "OpenMRS": ["Open Medical Records System - OpenMRS"],
    "AMRS": ["Ampath AMRS"],
}

ART_PROJECT_MAP: dict[str, list[str]] = {
    "Ampath Plus": ["Ampathplus", "AMPATH"],
    "Kenya HMIS II": ["UCSF Clinical Kisumu", "CHAP Uzima", "DREAM", "IRDO"],
}

# --------------------------------------------------------------------------
# Load CT Adverse Events — LoadAdverseEvents.java:86-109
# --------------------------------------------------------------------------

AE_SEVERITY_MAP: dict[str, list[str]] = {
    "Mild": ["Mild", "Mild|Mild|Mild"],
    "Moderate": ["Moderate", "Moderate|Moderate", "Moderate|Moderate|Moderate"],
    "Severe": ["Severe", "Fatal", "Severe|Severe", "Severe|Severe|Severe"],
    "Unknown": ["Mild|Moderate", "Moderate|Mild", "Severe|Moderate",
                "Unknown|Moderate", "Moderate|Severe"],
}

AE_ACTION_MAP: dict[str, list[str]] = {
    "Drug not Changed": ["Medicine not changed", "CONTINUE REGIMEN",
                         "CONTINUE REGIMEN|CONTINUE REGIMEN"],
    "Drug Reduced": ["Dose reduced"],
    "Drug Substituted": ["SUBSTITUTED DRUG"],
    "Drug Withdrawn": ["Medicine causing AE substituted/withdrawn", "STOP",
                       "STOP|STOP", "All drugs stopped", "STOP|STOP|STOP",
                       "Other|STOP", "NONE|STOP"],
    "OTHER": ["Other", "NONE", "Select", "SUBSTITUTED DRUG|STOP", "Other|Other"],
    "Regimen Switched": ["SWITCHED REGIMEN"],
}

AE_CAUSE_MAP: dict[str, list[str]] = {
    "ARV": [
        "3TC/D4T", "3TC/TDF/NVP", "ABACAVIR", "abacavirwhen she was using",
        "ABC", "ABC+3TC", "abc/3tc/efv", "AF2B", "af2b- avonza", "ALL ARV",
        "ALUVIA", "art", "ARV", "arvs", "atanzanavir", "atavanavir",
        "ataz/rit", "atazanavir", "Atazanavir/Rironavir",
        "atazanavir/ritonavir", "ATV", "ATV/r", "ATVr", "AZT", "AZT+3TC+EFV",
        "AZT/3TC/NVP", "AZT/ATV", "AZT/KALETRA", "ctx/3tc/tdf/efv", "D4T",
        "D4T / 3TC / NVP", "D4T/3TC", "D4T/AZT", "DDI", "Dolotegravir",
        "doluteglavir", "dolutegravir", "DTG", "DTG Aurobindo", "dultegravir",
        "EFARIRENZ", "EFAVIRENCE", "Efavirens", "efavirenz", "efavirenze",
        "efavirez", "efervirence", "efervirenz", "efevurence", "EFV",
        "EFV 600MG", "EFV/NVP", "efv/rhze", "HAART", "KALETRA", "lopinanavir",
        "LOPINAVIR", "LPV", "LPV/r", "lpvr", "NVP", "NVP/ABC", "pep", "TDF",
        "tdf dtg", "TDF/3TC/", "tdf/3tc/dtg", "tdf/3tc/efv", "Tenoforvir",
        "tenofovir", "TLD", "TLE ", "TLE 400", "TRIMUNE", "ZIDOVUDINE",
        "? NVP", "? TLD", "?ATV/r", "3TC", "3TC/3TC", "EFAVIRENZ",
    ],
    "ARV + OTHER DRUGS": [
        "ART/TB", "ARVS, CTX , IPT", "CTX OR EFV", "D4T/INH", "INH/NVP",
        "isoniazid and nevirapine", "isoniazid efavirenz", "NVP/CTX",
        "tdf dtg ctx 3tc", "inh, tdf,3tc,dtg, ctx",
    ],
    "NON-ARVS": [
        "ANT TB", "ANTI TB", "anti TBs", "ANTI-TB", "Co-trimoxazole",
        "CONTRIMAZOLE", "cotrimoxasole", "cotrimoxazole",
        "cotrimoxazole 960mg", "Cotrimoxazole-", "CTX", "CTX /ANTI TB",
        "Dapson", "fluconazole", "IHN", "INH", "INH (IPT)", "INH/CTX", "IPT",
        "ipt in 2016", "ipt side effect ", "IRIS", "Isiniazid", "isiniazide",
        "isonaizid", "isoniaizid", "isoniasid", "isoniazid",
        "Isoniazid - November 2017", "isoniazide", "isoniazin", "isonizid",
        "Isonizide and Pyridoxine", "IZONIAZID", "IZONIAZIDE", "pyrazinamid",
        "pyrazinamide", "PYRIDOXINE", "RH", "RHE", "RHZE", "septin",
        "SEPTRIN", "septrine", "Streptomycin", "sulfa", "sulphonamides",
        "SULPHONOMIDES", "SULPHUR", "TB", "TB DRUGS", "tb meds",
        "2RHZ/4RH(children)", "2RHZE/10RH", "2RHZE/4RH", "2SRHZE/1RHZE/",
        "INH, SEPTRIN",
    ],
}

AE_OUTCOME_MAP: dict[str, list[str]] = {
    "Recovered": ["Recovered/Resolved"],
    "Recovering": ["Recovering/Resolving"],
    "OTHER": ["Requires intervention to prevent permanent damage"],
}

# --------------------------------------------------------------------------
# Load Prep Patient — LoadPrepPatient.java:55-114
# --------------------------------------------------------------------------

# The '' -> NULL withColumn sweep (:55-85).
PREP_EMPTY_TO_NULL_COLS: tuple[str, ...] = (
    "DateLastUsedPrev", "PrevPrepReg", "ClientPreviouslyonPrep",
    "DateStartedPrEPattransferringfacility", "TransferFromFacility",
    "TransferInDate", "Refferedfrom", "PopulationType", "ReferralPoint",
    "ClientType", "Ward", "LandMark", "SubCounty", "CountyofBirth", "Sex",
)

PREP_KEY_POP_MAP: dict[str, list[str]] = {
    "FSW": ["160579"],
    "MSM": ["160578"],
    "MSW": ["165084"],
    "PWID": ["105"],
}

PREP_INSCHOOL_MAP: dict[str, list[str]] = {"Yes": ["1"], "No": ["2"]}

PREP_MARITAL_MAP: dict[str, list[str]] = {
    "Married Monogamous": ["Married"],
    "Single": ["Never married"],
    "Cohabiting": ["Living with partner"],
    "Married Polygamous": ["Polygamous"],
    "Unknown": ["OTHER NON-CODED"],
    "Divorced": ["Separated"],
}

PREP_COUNTY_MAP: dict[str, list[str]] = {
    "Tharaka Nithi": ["THARAKA - NITHI", "Tharaka-Nithi"],
    "Siaya": ["North Alego", "West Sakwa", "Ugunja", "North Ugenya",
              "Ugenya West", "Ukwala", "West Alego"],
    "Homa Bay": ["Kabuoch South/Pala", "Gwassi North", "Homa Bay Arunjo",
                 "HOMABAY", "Kendu Bay Town", "Kwabwai", "Homa Bay East"],
    "Murang'a": ["Kamahuha", "Kambiti", "Nginda", "Muranga"],
    "Kiambu": ["KIAMBU''"],
    "Kisii": ["Majoge"],
    "Busia": ["Nangina"],
    "Nyandarua": ["Shamata"],
    "NOT DOCUMENTED": ["Kagen", "..."],
}

# --------------------------------------------------------------------------
# Load HTS Client Tests — LoadHtsClientTests.java:80-112
# Each entry: column -> (map, otherwise_keep, default).
# otherwise(null) chains become otherwise_keep=False; the TbScreening
# otherwise("Not Done") becomes default="Not Done".
# --------------------------------------------------------------------------

HTS_CLIENT_TESTS_MAPS: dict[str, tuple[dict[str, list[str]], bool, str | None]] = {
    "ClientTestedAs": (
        {"Couple": ["C: Couple (includes polygamous)", "Couple"],
         "Individual": ["I: Individual", "Individual"]},
        False, None,
    ),
    "TbScreening": (
        {"No Signs": ["No Signs", "No TB", "No TB signs", "Yes"],
         "On TB Treatment": ["On TB Treatment", "INH", "TB Rx", "TBRx"],
         "Presumed TB": ["Presumed TB", "PrTB"],
         "TB Confirmed": ["TB Confirmed"]},
        True, "Not Done",
    ),
    "ClientSelfTested": (
        {"Yes": ["1", "Yes"], "No": ["0", "No"], "NA": ["NA"]},
        False, None,
    ),
    "CoupleDiscordant": (
        {"Yes": ["Yes"], "No": ["No"]},
        False, None,
    ),
    "TestType": (
        {"Initial Test": ["Initial", "Initial Test"],
         "Repeat Test": ["Repeat", "Repeat Test"],
         "Retest": ["Retest"]},
        False, None,
    ),
    "Consent": (
        {"No": ["No"], "Yes": ["Yes"]},
        False, None,
    ),
    "Setting": (
        {"Facility": ["Facility", "Tent"],
         "Community": ["Community", "Medical Camp"]},
        False, None,
    ),
    "Approach": (
        {"Client Initiated Testing (CITC)": ["CITC", "Client Initiated Testing (CITC)"],
         "Provider Initiated Testing(PITC)": ["PITC", "Provider Initiated Testing(PITC)"]},
        False, None,
    ),
}


# --------------------------------------------------------------------------
# Load Prep Behaviour Risk — LoadPrepBehaviourRisk.java:57-82
# (13 '' -> NULL withColumns, in reference order)
# --------------------------------------------------------------------------

PREP_BR_EMPTY_TO_NULL_COLS: tuple[str, ...] = (
    "NumberofchildrenWithPartner", "SexWithoutCondom",
    "MonthsknownHIVSerodiscordant", "HIVPartnerARTStartDate",
    "PartnerEnrolledtoCCC", "ReferralToOtherPrevServices",
    "RiskReductionEducationOffered", "PrEPDeclineReason",
    "ClientWillingToTakePrep", "ClientRisk", "IsPartnerHighrisk",
    "IsHIVPositivePartnerCurrentonART", "SexPartnerHIVStatus",
)

# --------------------------------------------------------------------------
# Load PrEP Adverse Events — LoadPrepAdverseEvents.java:55-71
# --------------------------------------------------------------------------

PREP_AE_EMPTY_TO_NULL_COLS: tuple[str, ...] = (
    "AdverseEventRegimen", "AdverseEventIsPregnant",
    "AdverseEventClinicalOutcome", "AdverseEventActionTaken", "Severity",
    "AdverseEventEndDate", "AdverseEventStartDate", "AdverseEvent",
)

# --------------------------------------------------------------------------
# Load HTS Partner Notification Services
# — LoadPartnerNotificationServices.java:58-74
# --------------------------------------------------------------------------

PNS_APPROACH_MAP: dict[str, list[str]] = {
    "Provider Referral": ["Pr: Provider Referral", "D: Dual Referral"],
    "Passive Referral": ["Cr: Passive Referral"],
}

PNS_LINKED_MAP: dict[str, list[str]] = {"Yes": ["Y"], "No": ["N"]}

PNS_CONSENT_MAP: dict[str, list[str]] = {"No": ["0"]}

# --------------------------------------------------------------------------
# Load HTS Clients — LoadHtsClients.java:82-92
# --------------------------------------------------------------------------

HTS_GENDER_MAP: dict[str, list[str]] = {"Male": ["M"], "Female": ["F"]}

# --------------------------------------------------------------------------
# Load CT OTZ — LoadCTOTZ.java:62-67
# --------------------------------------------------------------------------

OTZ_YES_NO_MAP: dict[str, list[str]] = {"Yes": ["Yes", "1"], "No": ["No", "0"]}

# --------------------------------------------------------------------------
# Load CT Covid — LoadCTCovid.java:70-73
# --------------------------------------------------------------------------

COVID_VACCINATION_MAP: dict[str, list[str]] = {
    "Fully Vaccinated": ["Fully - Details not Available"],
    "Partially Vaccinated": ["Partial", "Partial - Details not Available"],
}

# --------------------------------------------------------------------------
# Load HTS Eligibility — LoadHtsEligibility.java:61-99
# --------------------------------------------------------------------------

ELIGIBILITY_FLAG_MAP: dict[str, list[str]] = {"No": ["0"], "Yes": ["1"]}

ELIGIBILITY_FLAG_COLS: tuple[str, ...] = (
    "WeightLoss", "NightSweats", "Pregnant", "Cough", "IsHealthWorker",
)

ELIGIBILITY_PATIENT_TYPE_MAP: dict[str, list[str]] = {
    "Hospital Patient": ["HP:Hospital Patient"],
    "Non-Hospital Patient": ["NP:Non-Hospital Patient"],
}

ELIGIBILITY_EMPTY_TO_NULL_COLS: tuple[str, ...] = (
    "TypeGBV", "ReceivedServices", "ResultOfHIVSelf",
    "ReasonsForIneligibility", "ChildReasonsForIneligibility",
    "PartnerHIVStatus", "RelationshipWithContact",
)


# --------------------------------------------------------------------------
# Rule-set builders for jobs/catalog.py
# --------------------------------------------------------------------------

def art_value_rules():
    """Emr + Project canonicalization (LoadARTPatients.java:121-126)."""
    return (
        value_map("Emr", ART_EMR_MAP),
        value_map("Project", ART_PROJECT_MAP),
    )


def adverse_events_value_rules():
    """Severity/ActionTaken/Cause/ClinicalOutcome (LoadAdverseEvents.java:86-109).

    The reference's trailing ``when(col == '', null)`` arms are expressed as
    an ``empty_to_null`` pre-pass: '' matches no map literal, so the two
    forms produce identical CASE results.
    """
    cols = ["Severity", "AdverseEventActionTaken", "AdverseEventCause",
            "AdverseEventClinicalOutcome"]
    return (
        empty_to_null(cols),
        value_map("Severity", AE_SEVERITY_MAP),
        value_map("AdverseEventActionTaken", AE_ACTION_MAP),
        value_map("AdverseEventCause", AE_CAUSE_MAP),
        value_map("AdverseEventClinicalOutcome", AE_OUTCOME_MAP),
    )


def prep_patient_value_rules():
    """Empty-string sweep + 4 canonicalization maps (LoadPrepPatient.java:55-114)."""
    return (
        empty_to_null(PREP_EMPTY_TO_NULL_COLS),
        value_map("KeyPopulationType", PREP_KEY_POP_MAP),
        value_map("Inschool", PREP_INSCHOOL_MAP),
        value_map("MaritalStatus", PREP_MARITAL_MAP),
        empty_to_null(["County"]),
        value_map("County", PREP_COUNTY_MAP),
    )


def hts_client_tests_value_rules():
    """The 8 category-collapse maps (LoadHtsClientTests.java:80-112)."""
    return tuple(
        value_map(col, mapping, otherwise_keep=keep, default=default)
        for col, (mapping, keep, default) in HTS_CLIENT_TESTS_MAPS.items()
    )


def ct_patient_pharmacy_rules():
    """LoadPatientPharmacy.java:90-102, in reference order.

    FIXED QUIRK: the reference's Duration / PeriodTaken ``when`` chains have
    NO ``.otherwise`` arm, so every in-range value is nulled — unlike the
    sibling ART rule (``LoadARTPatients.java:127-128``) which keeps them.
    We keep in-range values (sentinel-only-when-bad), matching the clear
    intent and the ART precedent. ExpectedReturn has a lower clamp only.
    Emr/Project literals are identical to the ART maps (:96-102).
    """
    return (
        range_sentinel("Duration", 0, None, 999.0),
        date_clamp("ExpectedReturn", lo="1900-01-01", sentinel="1900-01-01"),
        range_sentinel("PeriodTaken", 0, None, 999.0, bad_at_lo=True),
        value_map("Emr", ART_EMR_MAP),
        value_map("Project", ART_PROJECT_MAP),
    )


def prep_behaviour_risk_rules():
    """The 13-column '' -> NULL sweep (LoadPrepBehaviourRisk.java:57-82)."""
    return (empty_to_null(PREP_BR_EMPTY_TO_NULL_COLS),)


def prep_adverse_events_rules():
    """The 8-column '' -> NULL sweep (LoadPrepAdverseEvents.java:55-71)."""
    return (empty_to_null(PREP_AE_EMPTY_TO_NULL_COLS),)


def hts_partner_notification_rules():
    """LoadPartnerNotificationServices.java:58-74, in reference order."""
    return (
        empty_to_null(["FacilityLinkedTo"]),
        value_map("PnsApproach", PNS_APPROACH_MAP),
        value_map("LinkedToCare", PNS_LINKED_MAP),
        value_map("PnsConsent", PNS_CONSENT_MAP),
        values_to_null("ScreenedForIpv", ["N/A"]),
        empty_to_null(["CccNumber"]),
        range_sentinel("Age", 0, 100, None, cast_to="int"),
    )


def hts_clients_rules():
    """LoadHtsClients.java:82-92: Dob window -> NULL (not sentinel),
    Gender M/F expansion, PatientDisabled ternary collapse."""
    return (
        date_clamp("Dob", lo="1910-01-01", hi_is_current_date=True, sentinel=None),
        value_map("Gender", HTS_GENDER_MAP),
        presence_flag("PatientDisabled", negative="No", positive="Yes"),
    )


def ct_otz_rules():
    """LoadCTOTZ.java:59-67: enrollment-date floor is 2012 (OTZ program
    start), not the usual 1980."""
    return (
        date_clamp("OTZEnrollmentDate", lo="2012-01-01",
                   hi_is_current_date=True, sentinel="1900-01-01"),
        value_map("TransferInStatus", OTZ_YES_NO_MAP),
        value_map("SupportGroupInvolvement", OTZ_YES_NO_MAP),
    )


def ct_covid_rules():
    """LoadCTCovid.java:61-73: three 1980-floor date clamps + the
    vaccination-status collapse."""
    return (
        date_clamp("Covid19AssessmentDate", lo="1980-01-01",
                   hi_is_current_date=True, sentinel="1900-01-01"),
        date_clamp("DateGivenFirstDose", lo="1980-01-01",
                   hi_is_current_date=True, sentinel="1900-01-01"),
        date_clamp("DateGivenSecondDose", lo="1980-01-01",
                   hi_is_current_date=True, sentinel="1900-01-01"),
        value_map("VaccinationStatus", COVID_VACCINATION_MAP),
    )


def ct_patient_baselines_rules():
    """LoadPatientBaselines.java:57-64: bCD4 < 0 -> 999 plus two
    1980-floor date clamps."""
    return (
        range_sentinel("bCD4", 0, None, 999.0),
        date_clamp("bWHODate", lo="1980-01-01",
                   hi_is_current_date=True, sentinel="1900-01-01"),
        date_clamp("bCD4Date", lo="1980-01-01",
                   hi_is_current_date=True, sentinel="1900-01-01"),
    )


def prep_pharmacy_rules():
    """LoadPrepPharmacy.java:56-63: Duration > 12 -> NULL, DispenseDate
    ('' or < 1980) -> NULL (the '' arm falls out of the date cast),
    RegimenPrescribed '' -> NULL."""
    return (
        range_sentinel("Duration", None, 12, None),
        date_clamp("DispenseDate", lo="1980-01-01", sentinel=None),
        empty_to_null(["RegimenPrescribed"]),
    )


def hts_client_linkages_rules():
    """LoadHtsClientLinkages.java:61-66: three 1980-floor-only date
    clamps -> NULL."""
    return tuple(
        date_clamp(c, lo="1980-01-01", sentinel=None)
        for c in ("ReferralDate", "DateEnrolled", "DatePrefferedToBeEnrolled")
    )


def hts_eligibility_rules():
    """The FULL LoadHtsEligibility.java:61-99 chain, in reference order:
    five 0/1 -> No/Yes flags, the PatientType collapse, the 7-column
    '' -> NULL sweep, DateTestedProvider 1980 floor -> NULL, VisitDate
    2019 floor -> NULL (HTS eligibility screening began 2019)."""
    return (
        *(value_map(c, ELIGIBILITY_FLAG_MAP) for c in ELIGIBILITY_FLAG_COLS),
        value_map("PatientType", ELIGIBILITY_PATIENT_TYPE_MAP),
        empty_to_null(ELIGIBILITY_EMPTY_TO_NULL_COLS),
        date_clamp("DateTestedProvider", lo="1980-01-01", sentinel=None),
        date_clamp("VisitDate", lo="2019-01-01", sentinel=None),
    )


# --------------------------------------------------------------------------
# Oracle-side SQL generator (DuckDB dialect == ANSI here)
# --------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def value_map_sql(
    expr: str,
    mapping: Mapping[str, Sequence[str]],
    otherwise_keep: bool = True,
    default: str | None = None,
) -> str:
    """The exact CASE expression :func:`value_map` compiles to, in SQL."""
    arms = []
    for target, sources in mapping.items():
        vals = ", ".join(_sql_quote(s) for s in sources)
        arms.append(f"WHEN {expr} IN ({vals}) THEN {_sql_quote(target)}")
    if default is not None:
        tail = _sql_quote(default)
    else:
        tail = expr if otherwise_keep else "NULL"
    return "CASE " + " ".join(arms) + f" ELSE {tail} END"


def empty_to_null_sql(expr: str) -> str:
    return f"CASE WHEN {expr} = '' THEN NULL ELSE {expr} END"
