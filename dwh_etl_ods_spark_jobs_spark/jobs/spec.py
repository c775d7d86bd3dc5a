"""JobSpec + the canonical incremental-load pipeline.

Reproduces the reference's job shape (``LoadCTPatients.java:27-228``,
traced in SURVEY.md §3.1) as one config-driven function:

  1. source scan            (JDBC pushdown there; TableSpec here)
  2. greatest-per-key dedupe (their GROUP BY MAX subquery, our window top-1)
  3. cleaning rules          (withColumn/when chains -> rule data)
  4. lookup normalization    (broadcast left join + coalesce fold)
  5. target scan + null-safe LEFT ANTI JOIN on the natural key
  6. in-flight PII hashing   (their post-write JDBC UPDATE, our Project)
  7. final projection + append

IO is injectable so the same spec runs against parquet fixtures in tests
and JDBC in production.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.operators import (
    anti_join_new,
    apply_rules,
    dedupe_latest,
    hash_pii,
    lookup_fold,
)
from dwh_etl_ods_spark_jobs_spark.jobs.filters import FilterSpec
from dwh_etl_ods_spark_jobs_spark.operators.enrich import enrich_patient_facility
from dwh_etl_ods_spark_jobs_spark.sources import TableSpec, read_table, write_append

_LOG = logging.getLogger(__name__)


@dataclass(frozen=True)
class LookupSpec:
    """One vocabulary-normalization join (``LoadCTPatients.java:144-157``).

    ``table`` is the lookup's name in the catalog of lookup tables handed to
    the pipeline; ``source_col``/``target_col`` default to the reference's
    ``(source_name, target_name)`` shape, overridden by e.g.
    ``lkp_MaritalStatus (Source_MaritalStatus, Target_MaritalStatus)``.
    """

    column: str
    table: str
    source_col: str = "source_name"
    target_col: str = "target_name"
    case_insensitive: bool = True  # SQL Server default collation is CI (SURVEY §4)


@dataclass(frozen=True)
class EnrichSpec:
    """Source-side star enrichment: fact ⋈ PatientExtract ⋈ Facility.

    Every CT source query performs this join inside the pushed-down T-SQL
    (``LoadSourceCTPatients.sql:7-9``, ``LoadSourceARTPatients.sql:19-21``);
    engine-native mode reads the raw fact extract plus the two dimension
    tables and runs the same join as a Spark stage — broadcast facility,
    hash-join patient (operators/enrich.py).
    """

    fact_patient_key: str = "PatientId"
    # Gender rides along so the post-enrich WHERE gate (jobs/filters.py
    # GENDER_NOT_UNKNOWN — the reference filters on P.gender without
    # SELECTing it) has its column; the final projection drops it again.
    patient_cols: tuple[str, ...] = ("PatientPK", "PatientID", "Gender")
    facility_cols: tuple[str, ...] = ("SiteCode", "FacilityName")
    # Every reference facility join carries ``AND F.Voided = 0`` in its ON
    # clause (LoadSourceCTPatients.sql:9, LoadSourceAdverseEvents.sql:34);
    # the gate is applied to the facility dim pre-join (operators/enrich.py).
    facility_voided_gate: bool = True
    # Dimension source tables (run_job.py JDBC mode reads these alongside
    # the raw fact extract and joins engine-side — the reference pushed the
    # same join into its source T-SQL).
    patient_table: str = "[DWAPICentral].[dbo].[PatientExtract]"
    facility_table: str = "[DWAPICentral].[dbo].[Facility]"


@dataclass(frozen=True)
class JobSpec:
    """Everything that distinguishes one reference job from another."""

    name: str
    source_system: str  # dwapicentral | htscentral | mnchcentral | prepcentral | his
    target: str  # ODS table, e.g. "dbo.CT_Patient"
    keys: tuple[str, ...]  # null-safe anti-join natural key (SURVEY §2.4)
    # Greatest-per-key dedupe of the source extract (the reference pushes
    # this into T-SQL: GROUP BY keys -> MAX(created), MAX(id)).
    dedupe_keys: tuple[str, ...] | None = None
    dedupe_order: tuple[str, ...] = ("DateExtracted", "ID")
    # Source-SQL WHERE predicates (jobs/filters.py census), applied right
    # after enrichment — the position the reference's pushed-down SQL
    # evaluated them (post star join, pre dedupe self-join).
    filters: tuple[FilterSpec, ...] = ()
    rules: tuple[Callable[[DataFrame], DataFrame], ...] = ()
    lookups: tuple[LookupSpec, ...] = ()
    pii: Mapping[str, str] = field(default_factory=dict)  # src col -> hash col
    # Key columns that need a source-side expression before the anti-join,
    # e.g. cast(VisitDate as date) (LoadAdverseEvents.java:145-146).
    key_exprs: Mapping[str, Callable[[], Column]] = field(default_factory=dict)
    # Final projection in target-DDL column order; columns the delta does not
    # carry are filled with typed NULL (an INSERT's unnamed columns).
    select: tuple[str, ...] | None = None
    # Spark types for NULL-filled projection columns (target-DDL types, e.g.
    # PatientVisitsDDL.sql); unlisted columns fill as string. Without this a
    # first JDBC append that auto-creates the target would emit VARCHAR DDL
    # for int/date/decimal columns.
    select_types: Mapping[str, str] = field(default_factory=dict)
    # Star enrichment of the raw fact extract (None when the source is read
    # through the reference's pushed-down SQL, which already joins the dims).
    enrich: EnrichSpec | None = None
    # The reference's raw source extract table (the FROM of each job's
    # source-SQL resource, e.g. LoadSourceCTPatients.sql) — run_job.py's
    # JDBC default when --source-table is not given. The star join /
    # dedupe / filters that the reference pushed into T-SQL run
    # engine-native instead, so the raw table IS the right default scan.
    source_table: str | None = None
    notes: str = ""  # reference quirks we intentionally fix (SURVEY §7)

    def __post_init__(self) -> None:
        # A projection that drops an anti-join key would NULL it on the next
        # run's target and silently break incremental idempotency.
        if self.select is not None:
            have = {c.lower() for c in self.select}
            missing = [k for k in self.keys if k.lower() not in have]
            if missing:
                raise ValueError(
                    f"job {self.name}: select drops anti-join keys {missing}"
                )


def plan_filters(
    spec: "JobSpec", columns: list[str]
) -> tuple[list[FilterSpec], list[FilterSpec]]:
    """Split a job's FilterSpecs into ``(applied, skipped)`` for a source
    with the given columns.

    Fact-side filters fail loudly when their column is missing (same
    contract as cleaning rules). Dim-side filters (Gender, SiteCode) are
    ALLOWED to skip — a source read through the reference's pushed-down SQL
    applied them upstream and does not SELECT the column — but the skip is
    returned (and logged by run_incremental_load) so a typo'd column name
    can never silently disable a row gate: the catalog e2e test pins each
    job's exact expected skip set (VERDICT r6 #4).
    """
    have = {c.lower() for c in columns}
    missing_fact = [
        f.column for f in spec.filters
        if not f.dim_side and f.column.lower() not in have
    ]
    if missing_fact:
        raise ValueError(
            f"job {spec.name}: source extract is missing columns "
            f"{missing_fact} required by its source filters — the "
            f"reference's source SQL reads them; include them in the "
            f"extract"
        )
    applied = [f for f in spec.filters if f.column.lower() in have]
    skipped = [f for f in spec.filters if f.column.lower() not in have]
    return applied, skipped


def run_incremental_load(
    spark: SparkSession,
    spec: JobSpec,
    source: DataFrame | TableSpec,
    target: DataFrame | TableSpec,
    lookups: Mapping[str, DataFrame] | None = None,
    sink: TableSpec | None = None,
    write_partitions: int | None = None,
    patient: DataFrame | None = None,
    facility: DataFrame | None = None,
) -> DataFrame:
    """Run one incremental load; returns the appended delta (lazily).

    When ``sink`` is None the delta DataFrame is returned un-written — the
    caller owns the action (tests assert on it; production passes a sink).

    ``patient``/``facility`` are the star-enrichment dimensions; they are
    joined first (before dedupe — SiteCode itself comes from Facility in the
    reference source SQL) when ``spec.enrich`` is set AND both are given.
    A source already carrying the dim columns (pushed-down SQL) omits them.
    """
    src = source if isinstance(source, DataFrame) else read_table(spark, source)
    tgt = target if isinstance(target, DataFrame) else read_table(spark, target)

    if spec.enrich is not None and patient is not None and facility is not None:
        e = spec.enrich
        src = enrich_patient_facility(
            src, patient, facility,
            fact_patient_key=e.fact_patient_key,
            patient_cols=e.patient_cols,
            facility_cols=e.facility_cols,
            facility_voided_gate=e.facility_voided_gate,
        )

    if spec.filters:
        applied, skipped = plan_filters(spec, src.columns)
        if skipped:
            _LOG.info(
                "job %s: dim-side filters skipped (column absent — "
                "pushed-down-SQL source applied them upstream): %s",
                spec.name,
                [f"{f.column}: {f.sql}" for f in skipped],
            )
        for f in applied:
            src = src.filter(f.make())

    if spec.key_exprs:
        for col, make_expr in spec.key_exprs.items():
            src = src.withColumn(col, make_expr())

    if spec.dedupe_keys:
        missing = [c for c in spec.dedupe_order if c not in src.columns]
        if missing:
            raise ValueError(
                f"job {spec.name}: dedupe_order columns {missing} absent from "
                f"the source — silently dropping them would change which "
                f"duplicate generation survives (reference selects by "
                f"MAX(date) then MAX(ID))"
            )
        # The reference's survivor gate is MAX(cast(col AS date)) then
        # MAX(ID) (LoadSourceCTPatients.sql:10-17): two same-DAY generations
        # resolve by highest ID, not latest time-of-day. Cast timestamp- and
        # string-typed gate columns to date in the ordering so the ID
        # tiebreak decides within a day, matching the reference's survivor.
        # try_* casts: dedupe runs BEFORE cleaning, so string gate columns
        # see raw dirty data ('' / non-ISO dates) — under ANSI mode a plain
        # cast would kill the job; malformed values sort as NULL (last).
        dtypes = dict(src.dtypes)
        order = []
        for c in spec.dedupe_order:
            t = dtypes.get(c, "")
            if c != "ID" and t.startswith("timestamp"):
                order.append(F.col(c).cast("date").desc())
            elif c != "ID" and t == "string":
                order.append(F.try_to_timestamp(F.col(c)).cast("date").desc())
            else:
                order.append(F.col(c).desc())
        src = src.transform(dedupe_latest(list(spec.dedupe_keys), order))

    if spec.rules:
        # Cleaning rules reference their columns unconditionally (a silent
        # skip would hide typos and un-cleaned loads); fail with the source
        # contract spelled out instead of an UNRESOLVED_COLUMN deep in a rule.
        have = {c.lower() for c in src.columns}
        wanted = {
            c for rule in spec.rules for c in getattr(rule, "columns", ())
        }
        missing = sorted(c for c in wanted if c.lower() not in have)
        if missing:
            raise ValueError(
                f"job {spec.name}: source extract is missing columns "
                f"{missing} required by its cleaning rules — the reference's "
                f"source SQL selects them; include them in the extract"
            )
    # r15: apply_rules fuses runs of expression rules into single
    # withColumns projections — one plan analysis instead of one per rule
    # (identical expressions, identical output; the catalog's rule-heavy
    # jobs spent more time re-analyzing plans than executing them).
    src = apply_rules(spec.rules)(src)

    for lk in spec.lookups:
        lkp_df = (lookups or {}).get(lk.table)
        if lkp_df is None:
            raise KeyError(f"job {spec.name}: lookup table {lk.table!r} not provided")
        src = src.transform(
            lookup_fold(
                lk.column,
                lkp_df,
                source_col=lk.source_col,
                target_col=lk.target_col,
                case_insensitive=lk.case_insensitive,
            )
        )

    delta = src.transform(anti_join_new(tgt, list(spec.keys)))

    if spec.pii:
        delta = delta.transform(hash_pii(dict(spec.pii)))

    if spec.select:
        # DDL-ordered projection (e.g. PatientVisitsDDL.sql:1-78): absent
        # columns become typed NULLs, present ones keep their type. Name
        # resolution is case-insensitive like Spark's own resolver.
        have = {c.lower(): c for c in delta.columns}
        fill_types = {k.lower(): v for k, v in spec.select_types.items()}
        delta = delta.select(
            *[
                F.col(have[c.lower()]).alias(c)
                if c.lower() in have
                else F.lit(None).cast(fill_types.get(c.lower(), "string")).alias(c)
                for c in spec.select
            ]
        )

    if sink is not None:
        write_append(delta, sink, write_partitions=write_partitions)
    return delta


def run_backfill(
    spark: SparkSession,
    spec: JobSpec,
    source: DataFrame | TableSpec,
    target: DataFrame | TableSpec,
    date_col: str,
    start: str,
    end: str,
    chunk_days: int = 30,
    **load_kwargs,
) -> list[DataFrame]:
    """Reprocess a historical window in bounded chunks: the source is
    filtered to ``[start, end)`` on ``date_col`` and re-run through
    :func:`run_incremental_load` one ``chunk_days`` slice at a time.

    The anti-join makes every chunk idempotent — rows the target already
    holds append nothing, so a backfill can overlap live data, be
    re-run after a crash, or cover a window that was partially loaded,
    with no delete-window preamble (the reference's scripts DELETE the
    window first and re-insert — a non-idempotent two-step that loses
    rows if the insert dies). Chunking bounds each run's shuffle and
    lets a scheduler checkpoint progress between slices.

    Returns the per-chunk delta DataFrames (lazily). Passing ``sink`` in
    ``load_kwargs`` writes each chunk eagerly inside the loop — the
    returned deltas then RE-evaluate their anti-join against the
    already-updated target if acted on (count() would print 0 per chunk;
    ADVICE r8). Callers who need per-chunk counts should keep sink=None
    and ride an ``Observation`` on their own write (run_job.py does).
    """
    import datetime as _dt

    from pyspark.sql import functions as F

    src = source if isinstance(source, DataFrame) else read_table(spark, source)
    s = _dt.date.fromisoformat(start)
    e = _dt.date.fromisoformat(end)
    if not (s < e):
        raise ValueError(f"empty backfill window: {start!r} .. {end!r}")
    if chunk_days < 1:
        raise ValueError(f"chunk_days must be >= 1, got {chunk_days}")
    deltas: list[DataFrame] = []
    lo = s
    while lo < e:
        hi = min(lo + _dt.timedelta(days=chunk_days), e)
        chunk = src.filter(
            (F.col(date_col) >= F.lit(lo.isoformat()))
            & (F.col(date_col) < F.lit(hi.isoformat()))
        )
        deltas.append(
            run_incremental_load(spark, spec, chunk, target, **load_kwargs)
        )
        lo = hi
    return deltas
