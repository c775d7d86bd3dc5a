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

All maps are case-SENSITIVE: the reference compares these in Spark (Java
``Column.isin``), not under SQL Server collation — unlike the lookup-table
folds, which are CI (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from dwh_etl_ods_spark_jobs_spark.operators import empty_to_null, value_map

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
