"""Per-job source-SQL WHERE predicates as catalog data.

The reference pushes row filters into its source queries; engine-native
they are declarative ``FilterSpec`` entries on each ``JobSpec``, applied
right after star enrichment (the position the pushed-down SQL evaluated
them: after the fact ⋈ Patient ⋈ Facility join, before the dedupe
self-join and the Java cleaning chain).

Census (reference file:line):

- ``P.Gender IS NOT NULL AND P.Gender != 'Unknown' AND F.code > 0`` —
  LoadSourceCTPatients.sql:18 (the IS NOT NULL arm is ct_patients-only).
- ``gender != 'Unknown' AND F.code > 0`` — 17 more CT jobs
  (LoadSourceARTPatients.sql:27, LoadPatientVisits.sql,
  LoadSourcePatientPharmacy.sql, LoadSourcePatientStatus.sql,
  LoadPatientBaselines.sql, LoadCTAllergies.sql, LoadCTCovid.sql,
  LoadDepressionScreening.sql, LoadDrugAlcoholScreening.sql,
  LoadEnhancedAdherenceCounselling.sql, LoadCTGBVScreening.sql,
  LoadCTIPT.sql:45, LoadCTOTZ.sql, LoadCTOVC.sql,
  LoadCTContactListing.sql, LoadCTDefaulterTracing.sql,
  LoadIITRiskScores.sql).
- ``gender != 'Unknown'`` only — LoadSourceCervicalScreening.sql,
  LoadCancerScreening.sql, LoadSourceCTPatientLabs.sql.
- ``F.code > 0`` only — LoadSourceAdverseEvents.sql:35 (its ``F.voided=0``
  arm, :34, is the enrich-stage facility gate: operators/enrich.py).
- ``a.DateExtracted > '2019-09-08'`` — LoadHtsClients.sql:35,
  LoadHtsClientLinkages.sql:30.
- ``a.TracingType IS NOT NULL AND a.TracingOutcome IS NOT NULL`` —
  LoadHtsClientTracing.sql:14.
- ``MFL_Code != ''`` — LoadSites.sql:6.

Each FilterSpec carries BOTH a Spark ``Column`` factory and the ANSI-SQL
predicate text so the driver's DuckDB oracle
(plans/job_filters.py) and ``run_job.py``'s rendered source queries use
the same data.

``dim_side=True`` filters reference a column that only exists after star
enrichment (``Gender`` rides the PatientExtract dim; ``SiteCode`` is
``F.code``). A source read through the reference's pushed-down SQL has
already had those filters applied upstream — and does not even SELECT the
column — so dim-side filters skip silently when the column is absent.
Fact-side filters (``DateExtracted``, ``MFL_Code``, ``TracingType``)
always exist in the extract and fail loudly when missing, like cleaning
rules (jobs/spec.py run_incremental_load).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FilterSpec:
    """One WHERE predicate: Spark column factory + ANSI-SQL text.

    ``kind`` is the synthesis hint for the generic catalog e2e test
    (string | numeric | date). ``dim_side`` — see module docstring.
    """

    column: str
    make: Callable[[], Column]
    sql: str
    kind: str = "string"
    dim_side: bool = False
    note: str = ""


def neq_lit(column: str, value: str, **kw) -> FilterSpec:
    """``col != 'value'`` — NULLs compare unknown and are dropped, exactly
    the T-SQL / ANSI behavior (NULL gender does NOT survive != 'Unknown')."""
    return FilterSpec(
        column=column,
        make=lambda: F.col(column) != F.lit(value),
        sql=f"{column} != '{value}'",
        **kw,
    )


def not_null(column: str, **kw) -> FilterSpec:
    return FilterSpec(
        column=column,
        make=lambda: F.col(column).isNotNull(),
        sql=f"{column} IS NOT NULL",
        **kw,
    )


def not_empty(column: str, **kw) -> FilterSpec:
    return FilterSpec(
        column=column,
        make=lambda: F.col(column) != F.lit(""),
        sql=f"{column} != ''",
        **kw,
    )


def positive(column: str, **kw) -> FilterSpec:
    """``col > 0`` via try_cast: the reference compares an int column, but
    raw extracts sometimes carry varchar codes — a malformed value becomes
    NULL (dropped) instead of an ANSI cast crash."""
    return FilterSpec(
        column=column,
        make=lambda: F.col(column).try_cast("bigint") > F.lit(0),
        sql=f"TRY_CAST({column} AS BIGINT) > 0",
        kind=kw.pop("kind", "numeric"),
        **kw,
    )


def date_after(column: str, cutoff: str, **kw) -> FilterSpec:
    """``col > DATE 'cutoff'`` — strict, boundary date excluded
    (LoadHtsClients.sql:35 keeps only rows extracted AFTER 2019-09-08)."""
    return FilterSpec(
        column=column,
        make=lambda: F.col(column) > F.lit(cutoff).cast("date"),
        sql=f"{column} > DATE '{cutoff}'",
        kind=kw.pop("kind", "date"),
        **kw,
    )


# ---------------------------------------------------------------------------
# The named predicates the catalog wires (jobs/catalog.py).
# ---------------------------------------------------------------------------

GENDER_NOT_UNKNOWN = neq_lit(
    "Gender", "Unknown", dim_side=True,
    note="LoadSourceCTPatients.sql:18 p.gender!='Unknown' (20 CT jobs)",
)
GENDER_NOT_NULL = not_null(
    "Gender", dim_side=True,
    note="LoadSourceCTPatients.sql:18 P.[Gender] is NOT NULL (ct_patients only)",
)
SITECODE_POSITIVE = positive(
    "SiteCode", dim_side=True,
    note="LoadSourceCTPatients.sql:18 F.code > 0 (19 CT jobs; "
         "F.code is SELECTed AS SiteCode)",
)
HTS_EXTRACT_CUTOFF = date_after(
    "DateExtracted", "2019-09-08",
    note="LoadHtsClients.sql:35, LoadHtsClientLinkages.sql:30",
)
TRACING_TYPE_NOT_NULL = not_null(
    "TracingType", note="LoadHtsClientTracing.sql:14",
)
TRACING_OUTCOME_NOT_NULL = not_null(
    "TracingOutcome", note="LoadHtsClientTracing.sql:14",
)
MFL_CODE_NOT_EMPTY = not_empty(
    "MFL_Code", note="LoadSites.sql:6 WHERE MFL_Code != ''",
)

# Shared CT gate: the overwhelmingly common pair.
CT_GATE = (GENDER_NOT_UNKNOWN, SITECODE_POSITIVE)
