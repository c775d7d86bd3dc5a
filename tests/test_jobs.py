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

    clamp_fill = (dt.date(2016, 1, 1),) * 7  # RegistrationDate..TransferInDate
    source = spark.createDataFrame(
        [
            # (SiteCode, PatientPK, ID, DateExtracted, DOB, RegistrationAtCCC,
            #  NUPI, PatientID, MaritalStatus, EducationLevel, PatientSource,
            #  PreviousARTExposure, <7 more clamped date columns>)
            # p1: two generations -> dedupe keeps ID 11
            (100, "p1", 10, dt.date(2023, 1, 1), dt.date(1990, 5, 1),
             dt.date(2015, 3, 1), "n1", "pid1", "single", "primary", "vct",
             "tdf", *clamp_fill),
            (100, "p1", 11, dt.date(2023, 6, 1), dt.date(1990, 5, 1),
             dt.date(2015, 3, 1), "n1", "pid1", "Married Monogamous", "primary",
             "vct", "tdf", *clamp_fill),
            # p2: dirty DOB (pre-1910) -> clamped to sentinel; empty NUPI -> NULL
            (100, "p2", 20, dt.date(2023, 6, 1), dt.date(1850, 1, 1),
             dt.date(2016, 1, 1), "", "pid2", "unknown", "secondary", "opd",
             "xyz", *clamp_fill),
            # p3: already in target -> anti-joined away
            (200, "p3", 30, dt.date(2023, 6, 1), dt.date(1985, 2, 2),
             dt.date(2017, 1, 1), "n3", "pid3", "single", "none", "vct",
             "tdf", *clamp_fill),
        ],
        "SiteCode int, PatientPK string, ID int, DateExtracted date, DOB date, "
        "RegistrationAtCCC date, NUPI string, PatientID string, "
        "MaritalStatus string, EducationLevel string, PatientSource string, "
        "PreviousARTExposure string, RegistrationDate date, "
        "RegistrationAtPMTCT date, RegistrationAtTBClinic date, "
        "PreviousARTStartDate date, LastVisit date, "
        "DateConfirmedHIVPositive date, TransferInDate date",
    )
    target = spark.createDataFrame([(200, "p3")], "SiteCode int, PatientPK string")
    lookups = {
        "lkp_MaritalStatus": spark.createDataFrame(
            [("single", "Single"), ("married monogamous", "Married")],
            "Source_MaritalStatus string, Target_MaritalStatus string",
        ),
        "Lkp_EducationLevel": spark.createDataFrame(
            [("primary", "Primary School")],
            "SourceEducationLevel string, TargetEducationLevel string",
        ),
        "lkp_patient_source": spark.createDataFrame(
            [("vct", "VCT")], "source_name string, target_name string"
        ),
        "lkp_RegimenLineMap": spark.createDataFrame(
            [("tdf", "TDF/3TC/DTG")], "Source_Regimen string, Target_Regimen string"
        ),
    }

    delta = run_incremental_load(spark, spec, source, target, lookups)
    rows = {r.PatientPK: r for r in delta.collect()}

    assert set(rows) == {"p1", "p2"}  # p3 already in target
    p1, p2 = rows["p1"], rows["p2"]
    assert p1.ID == 11  # dedupe kept the latest extract generation
    assert p1.MaritalStatus == "Married"  # case-insensitive lookup fold
    assert p1.PatientSource == "VCT"
    assert p1.PreviousARTExposure == "TDF/3TC/DTG"  # lkp_RegimenLineMap fold
    assert rows["p2"].PreviousARTExposure == "xyz"  # unmatched keeps original
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
            (1, "p1", dt.datetime(2023, 5, 1, 14, 30), "pid1", "rash",
             dt.date(2023, 4, 1), dt.date(2023, 5, 1), "Mild|Mild|Mild",
             "STOP", "TLD", "Recovered/Resolved", "reg1"),
            (1, "p2", dt.datetime(2023, 5, 2, 9, 0), "pid2", "nausea",
             dt.date(1950, 1, 1), None, "", "Dose reduced", "unmapped-cause",
             "", "reg2"),
        ],
        "SiteCode int, PatientPK string, VisitDate timestamp, PatientID string, "
        "AdverseEvent string, AdverseEventStartDate date, "
        "AdverseEventEndDate date, Severity string, "
        "AdverseEventActionTaken string, AdverseEventCause string, "
        "AdverseEventClinicalOutcome string, AdverseEventRegimen string",
    )
    # Target stores the visit DATE; the 14:30 timestamp must still match.
    target = spark.createDataFrame(
        [(1, "p1", dt.date(2023, 5, 1))], "SiteCode int, PatientPK string, VisitDate date"
    )
    lookups = {
        "lkp_adverse_events": spark.createDataFrame(
            [("rash", "Skin Rash")], "source_name string, target_name string"
        ),
        "lkp_regimen": spark.createDataFrame(
            [("reg2", "TDF/3TC/DTG")], "source_name string, target_name string"
        ),
    }
    delta = run_incremental_load(spark, spec, source, target, lookups)
    rows = delta.collect()
    assert [r.PatientPK for r in rows] == ["p2"]
    p2 = rows[0]
    # LoadAdverseEvents.java:79-109 clean chain on the surviving row
    assert p2.AdverseEventStartDate == dt.date(1900, 1, 1)  # pre-1980 clamped
    assert p2.Severity is None  # '' -> NULL
    assert p2.AdverseEventActionTaken == "Drug Reduced"
    assert p2.AdverseEventCause == "unmapped-cause"  # otherwise keeps original
    assert p2.AdverseEventRegimen == "TDF/3TC/DTG"  # lkp_regimen fold


# ---------------------------------------------------------------------------
# Catalog-wide: every one of the 51 job specs runs end-to-end and is
# idempotent on a generically-synthesized source (columns derived from the
# spec's keys, dedupe order, rule metadata, lookups, and PII map).
# ---------------------------------------------------------------------------

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _spec_columns(spec):
    """(name -> kind) for every column the spec touches; kind drives the
    synthesized type: string | numeric | date. Deduped case-insensitively —
    the reference mixes spellings (PatientPk keys vs PatientPK PII maps) for
    what is one source column, and Spark resolves case-insensitively."""
    cols: dict[str, str] = {}
    lower_seen: dict[str, str] = {}

    def add(name: str, kind: str, force: bool = False):
        existing = lower_seen.get(name.lower())
        if existing is None:
            cols[name] = kind
            lower_seen[name.lower()] = name
        elif force:
            cols[existing] = kind

    for k in spec.keys:
        add(k, "string")
    for k in spec.dedupe_keys or ():
        add(k, "string")
    for k in spec.dedupe_order:
        add(k, "date" if "Date" in k else "numeric")
    for rule in spec.rules:
        for c in getattr(rule, "columns", ()):
            add(c, getattr(rule, "kind", "string"), force=True)
    for lk in spec.lookups:
        add(lk.column, "string")
    for src_col in spec.pii:
        add(src_col, "string")
    for c in spec.key_exprs:
        add(c, "date", force=True)
    # Filter columns: synthesized with the FilterSpec's kind so the
    # generated values PASS the predicate (numeric SiteCode > 0, 2023
    # dates > the 2019 cutoff, gender_N != 'Unknown', ...). Boundary rows
    # that must be DROPPED are covered by tests/test_job_filters.py.
    for f in spec.filters:
        add(f.column, f.kind, force=True)
    return cols


def _synth_source(spark, spec):
    cols = _spec_columns(spec)
    names = list(cols)

    def row(i, gen):
        vals = []
        for n in names:
            kind = cols[n]
            if n == "ID":
                vals.append(i * 10 + gen)
            elif kind == "numeric":
                vals.append(float(50 + i))
            elif kind == "date":
                vals.append(dt.date(2023, 1, 1 + gen))
            else:
                vals.append(f"{n.lower()}_{i}")
        return tuple(vals)

    # rows 0..3 (row 1 has TWO generations -> dedupe must keep gen 2)
    data = [row(0, 1), row(1, 1), row(1, 2), row(2, 1), row(3, 1)]
    fields = []
    for n in names:
        t = {"numeric": "double", "date": "date"}.get(cols[n], "string")
        if n == "ID":
            t = "int"
        fields.append(f"`{n}` {t}")
    return spark.createDataFrame(data, ", ".join(fields)), cols


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_job_end_to_end_generic(spark, name):
    spec = CATALOG[name]
    source, cols = _synth_source(spark, spec)
    target = source.select(*spec.keys).limit(0)
    lookups = {
        lk.table: spark.createDataFrame(
            [(f"{lk.column.lower()}_1", "Mapped")],
            f"`{lk.source_col}` string, `{lk.target_col}` string",
        )
        for lk in spec.lookups
    }

    delta = run_incremental_load(spark, spec, source, target, lookups)
    rows = delta.collect()
    n_keys = 4  # rows 0..3 after greatest-per-key dedupe
    if spec.dedupe_keys:
        assert len(rows) == n_keys, f"{name}: dedupe did not collapse generations"
    else:
        assert len(rows) == 5
    # PII hash columns present and uppercase-hex when source is non-null
    for src_col, hash_col in spec.pii.items():
        if src_col in cols:
            vals = [getattr(r, hash_col) for r in rows]
            assert all(v is None or (len(v) == 64 and v == v.upper()) for v in vals)

    # Idempotency: feed the delta's keys back as the target -> zero rows.
    target2 = delta.select(*spec.keys)
    delta2 = run_incremental_load(spark, spec, source, target2, lookups)
    assert delta2.count() == 0, f"{name}: not idempotent"


def test_run_job_cli_dev_mode(spark, tmp_path):
    """The spark-submit-style runner in parquet dev mode: dry-run delta."""
    import dwh_etl_ods_spark_jobs_spark.run_job as RJ

    d = str(tmp_path)
    src = spark.createDataFrame(
        [(100, "p1", 1, dt.date(2023, 1, 1), dt.date(1990, 1, 1),
          dt.date(2015, 1, 1), "n1", "pid1", "single", "primary", "vct", "tdf",
          *((dt.date(2016, 1, 1),) * 7))],
        "SiteCode int, PatientPK string, ID int, DateExtracted date, DOB date, "
        "RegistrationAtCCC date, NUPI string, PatientID string, "
        "MaritalStatus string, EducationLevel string, PatientSource string, "
        "PreviousARTExposure string, RegistrationDate date, "
        "RegistrationAtPMTCT date, RegistrationAtTBClinic date, "
        "PreviousARTStartDate date, LastVisit date, "
        "DateConfirmedHIVPositive date, TransferInDate date",
    )
    src.write.parquet(f"{d}/src")
    src.limit(0).select("SiteCode", "PatientPK").write.parquet(f"{d}/tgt")
    for t, cols in [
        ("lkp_MaritalStatus", "Source_MaritalStatus string, Target_MaritalStatus string"),
        ("Lkp_EducationLevel", "SourceEducationLevel string, TargetEducationLevel string"),
        ("lkp_patient_source", "source_name string, target_name string"),
        ("lkp_RegimenLineMap", "Source_Regimen string, Target_Regimen string"),
    ]:
        spark.createDataFrame([("single", "Single")], cols).write.parquet(
            f"{d}/lkp/{t}.parquet"
        )
    rc = RJ.main([
        "ct_patients", "--source-path", f"{d}/src",
        "--target-path", f"{d}/tgt", "--lookup-dir", f"{d}/lkp",
    ])
    assert rc == 0

    # --write path: delta appended; the count logs via observe() riding the
    # write job (no second evaluation), and a re-run appends zero.
    rc = RJ.main([
        "ct_patients", "--source-path", f"{d}/src",
        "--target-path", f"{d}/tgt", "--lookup-dir", f"{d}/lkp", "--write",
    ])
    assert rc == 0
    assert spark.read.parquet(f"{d}/tgt").count() == 1
    rc = RJ.main([
        "ct_patients", "--source-path", f"{d}/src",
        "--target-path", f"{d}/tgt", "--lookup-dir", f"{d}/lkp", "--write",
    ])
    assert rc == 0
    assert spark.read.parquet(f"{d}/tgt").count() == 1  # idempotent


def test_mnch_heis_dedupes_source_generations(spark):
    """A previously-undeduped job: two extract generations of the same
    (PatientPk, SiteCode) collapse to the latest (LoadMNCHHeis.sql:5-8 —
    GROUP BY PatientPk, SiteCode -> MAX(ID), MAX(DateExtracted))."""
    spec = CATALOG["mnch_heis"]
    assert spec.dedupe_keys == ("PatientPk", "SiteCode")
    source = spark.createDataFrame(
        [
            ("h1", 10, 1, dt.date(2023, 1, 1), "m1", "old-gen"),
            ("h1", 10, 2, dt.date(2023, 6, 1), "m1", "new-gen"),
            ("h2", 10, 3, dt.date(2023, 6, 1), "m2", "only-gen"),
        ],
        "PatientPk string, SiteCode int, ID int, DateExtracted date, "
        "PatientMnchID string, HEIHIVStatus string",
    )
    target = source.select("PatientPk", "SiteCode").limit(0)
    delta = run_incremental_load(spark, spec, source, target, {})
    rows = {r.PatientPk: r for r in delta.collect()}
    assert set(rows) == {"h1", "h2"}
    assert rows["h1"].HEIHIVStatus == "new-gen"  # latest generation wins


def test_dedupe_same_day_survivor_is_max_id(spark):
    """The reference's dedupe gate is MAX(cast(col AS date)) then MAX(ID)
    (LoadSourceCTPatients.sql:10-17): of two generations on the same DAY,
    the higher ID wins even when its time-of-day is earlier."""
    spec = CATALOG["mnch_heis"]
    source = spark.createDataFrame(
        [
            # same day; later time-of-day but LOWER id -> must lose
            ("h1", 10, 5, dt.datetime(2023, 6, 1, 23, 59), "m1", "low-id-late"),
            ("h1", 10, 9, dt.datetime(2023, 6, 1, 0, 1), "m1", "max-id-early"),
            # different days -> latest day wins regardless of ID
            ("h2", 10, 8, dt.datetime(2023, 5, 1, 12, 0), "m2", "old-day"),
            ("h2", 10, 2, dt.datetime(2023, 6, 2, 1, 0), "m2", "new-day"),
        ],
        "PatientPk string, SiteCode int, ID int, DateExtracted timestamp, "
        "PatientMnchID string, HEIHIVStatus string",
    )
    target = source.select("PatientPk", "SiteCode").limit(0)
    delta = run_incremental_load(spark, spec, source, target, {})
    rows = {r.PatientPk: r for r in delta.collect()}
    assert rows["h1"].HEIHIVStatus == "max-id-early"
    assert rows["h2"].HEIHIVStatus == "new-day"


def test_dedupe_string_gate_column_tolerates_dirty_values(spark):
    """Dedupe runs BEFORE cleaning, so a string-typed date-gate column sees
    raw dirty data; '' / non-ISO values must sort as NULL (last), not kill
    the job under ANSI cast semantics."""
    spec = CATALOG["mnch_heis"]
    source = spark.createDataFrame(
        [
            ("h1", 10, 1, "", "m1", "dirty-gen"),
            ("h1", 10, 2, "2023-06-01 08:00:00", "m1", "clean-gen"),
        ],
        "PatientPk string, SiteCode int, ID int, DateExtracted string, "
        "PatientMnchID string, HEIHIVStatus string",
    )
    target = source.select("PatientPk", "SiteCode").limit(0)
    delta = run_incremental_load(spark, spec, source, target, {})
    rows = {r.PatientPk: r for r in delta.collect()}
    assert rows["h1"].HEIHIVStatus == "clean-gen"  # parseable date wins


def test_missing_rule_columns_raise_contract_error(spark):
    """A source extract lacking a cleaning rule's column must fail with the
    job-level contract error, not an UNRESOLVED_COLUMN deep inside a rule."""
    spec = CATALOG["ct_ovc"]  # carries the Project source rewrite
    source = spark.createDataFrame(
        [("s1", "p1", "v1", "pid")],
        "SiteCode string, PatientPK string, VisitID string, PatientID string",
    )
    target = source.select(*spec.keys).limit(0)
    with pytest.raises(ValueError, match="missing columns.*Project"):
        run_incremental_load(spark, spec, source, target, {})


def test_ct_patients_enrich_stage(spark):
    """JobSpec.enrich: raw fact + PatientExtract + Facility through the spec
    (LoadSourceCTPatients.sql:7-9). Regression guard on the r2 FK-drop fix:
    the dim's PatientID must survive even though the fact's PatientId FK is
    consumed by the join. Round-6 additions: the post-enrich WHERE gate
    (Gender != 'Unknown' — LoadSourceCTPatients.sql:18) and the facility
    Voided=0 join gate (:9) drop their rows."""
    spec = CATALOG["ct_patients"]
    assert spec.enrich is not None
    clamp_fill = (dt.date(2016, 1, 1),) * 7

    def fact_row(fk, i):
        return (fk, fk * 100, dt.date(2023, 6, 1), dt.date(1990 + i, 5, 1),
                dt.date(2015, 3, 1), f"n{fk}", "single", "primary", "vct",
                "tdf", *clamp_fill)

    fact = spark.createDataFrame(
        [fact_row(1, 0), fact_row(2, 1), fact_row(3, 2), fact_row(4, 3),
         fact_row(9, 4)],
        "PatientId int, ID int, DateExtracted date, DOB date, "
        "RegistrationAtCCC date, NUPI string, MaritalStatus string, "
        "EducationLevel string, PatientSource string, PreviousARTExposure string, "
        "RegistrationDate date, RegistrationAtPMTCT date, "
        "RegistrationAtTBClinic date, PreviousARTStartDate date, "
        "LastVisit date, DateConfirmedHIVPositive date, TransferInDate date",
    )
    patient = spark.createDataFrame(
        [
            (1, "p1", "pid1", 10, "Male"),
            (2, "p2", "pid2", 10, "Female"),
            (3, "p3", "pid3", 10, "Unknown"),   # gender gate drops
            (4, "p4", "pid4", 20, "Male"),      # voided facility drops
        ],
        "Id int, PatientPK string, PatientID string, FacilityId int, "
        "Gender string",
    )
    facility = spark.createDataFrame(
        [(10, 700, "Facility A", 0), (20, 800, "Facility B", 1)],
        "Id int, SiteCode int, FacilityName string, Voided int",
    )
    lookups = {
        "lkp_MaritalStatus": spark.createDataFrame(
            [("single", "Single")],
            "Source_MaritalStatus string, Target_MaritalStatus string"),
        "Lkp_EducationLevel": spark.createDataFrame(
            [("primary", "Primary")],
            "SourceEducationLevel string, TargetEducationLevel string"),
        "lkp_patient_source": spark.createDataFrame(
            [("vct", "VCT")], "source_name string, target_name string"),
        "lkp_RegimenLineMap": spark.createDataFrame(
            [("tdf", "TDF")], "Source_Regimen string, Target_Regimen string"),
    }
    target = spark.createDataFrame([], "SiteCode int, PatientPK string")
    delta = run_incremental_load(
        spark, spec, fact, target, lookups, patient=patient, facility=facility
    )
    rows = {r.PatientPK: r for r in delta.collect()}
    # FK 9: no registered patient (inner join); p3: Gender='Unknown'
    # (WHERE gate); p4: its facility is voided (Voided=0 join gate)
    assert set(rows) == {"p1", "p2"}
    assert rows["p1"].PatientID == "pid1"  # the dim's PatientID survived
    assert rows["p1"].SiteCode == 700  # facility join supplied the key
    assert rows["p1"].FacilityName == "Facility A"
    assert "PatientId" not in delta.columns  # the fact FK was consumed
    assert rows["p1"].PatientIDHash is not None


def test_ct_patient_visits_ddl_projection(spark):
    """Delta column order == PatientVisitsDDL.sql:1-78 order; columns the
    source never carried come back as NULL (INSERT-missing semantics)."""
    from dwh_etl_ods_spark_jobs_spark.jobs.catalog import _CT_PATIENT_VISITS_DDL

    spec = CATALOG["ct_patient_visits"]
    source = spark.createDataFrame(
        [("p1", 100, "v1", 1, dt.date(2023, 6, 1), dt.date(2023, 5, 1),
          dt.date(2023, 7, 1), "70.0", "170.0", "fp", "pwp", "pid1",
          "I-TECH")],
        "PatientPK string, SiteCode int, VisitID string, ID int, "
        "DateExtracted date, VisitDate date, NextAppointmentDate date, "
        "Weight string, Height string, "
        "FamilyPlanningMethod string, PwP string, PatientID string, "
        "Project string",
    )
    target = spark.createDataFrame([], "SiteCode int, PatientPK string, VisitID string")
    lookups = {
        "lkp_family_planning_method": spark.createDataFrame(
            [("fp", "FP")], "source_name string, target_name string"),
        "lkp_pwp": spark.createDataFrame(
            [("pwp", "PWP")], "source_name string, target_name string"),
    }
    delta = run_incremental_load(spark, spec, source, target, lookups)
    assert tuple(delta.columns) == _CT_PATIENT_VISITS_DDL
    row = delta.collect()[0]
    assert row.PatientPK == "p1"
    assert row.FamilyPlanningMethod == "FP"
    assert row.WHOStage is None  # never sourced -> NULL-filled
    assert row.Project == "Kenya HMIS II"  # I-TECH/HMIS source rewrite
    assert row.PatientPKHash is not None
    # NULL fills carry the target DDL's types (PatientVisitsDDL.sql), not
    # blanket VARCHAR: a first append must auto-create correct column types.
    dts = dict(delta.dtypes)
    assert dts["PulseRate"] == "int"
    assert dts["Temp"] == "decimal(18,2)"
    assert dts["OIDate"] == "date"
    assert dts["DeletedFlag"] == "boolean"
    assert dts["RefillDate"] == "timestamp"
    assert dts["WHOStage"] == "string"  # varchar in the DDL


def test_every_job_has_reference_projection():
    """All 49 jobs with a reference columnList carry a select projection
    that includes the anti-join keys and the in-flight PII hash columns."""
    from dwh_etl_ods_spark_jobs_spark.jobs.projections import PROJECTIONS

    with_select = [s for s in CATALOG.values() if s.select is not None]
    assert len(with_select) >= 49
    for spec in with_select:
        lower = {c.lower() for c in spec.select}
        for k in spec.keys:
            assert k.lower() in lower, (spec.name, k)
        for h in spec.pii.values():
            assert h.lower() in lower, (spec.name, h)
    # the curated lists win over the extracted ones
    assert CATALOG["ct_patient_visits"].select != PROJECTIONS["ct_patient_visits"]


def test_projection_key_casing_matches_spec_keys_exactly():
    """Regression (round-3 verdict): the projection canon map must preserve
    the anti-join key spelling EXACTLY — a shared _PII_* map spelling
    (PatientPK) must not overwrite a job key spelling (PatientPk), or the
    projected delta columns stop matching the declared keys and every
    downstream `row.<Key>` access dies."""
    for spec in CATALOG.values():
        if spec.select is None:
            continue
        select_exact = set(spec.select)
        for k in spec.keys:
            assert k in select_exact, (
                spec.name, k, [c for c in spec.select if c.lower() == k.lower()])


def test_projection_dropping_key_raises():
    import pytest as _pytest

    from dwh_etl_ods_spark_jobs_spark.jobs.spec import JobSpec

    with _pytest.raises(ValueError, match="drops anti-join keys"):
        JobSpec(name="bad", source_system="x", target="dbo.T",
                keys=("SiteCode", "PatientPK"), select=("SiteCode",))


def test_missing_dedupe_order_column_raises(spark):
    spec = CATALOG["ct_patients"]
    bad_source = spark.createDataFrame(
        [(1, "p1", 2)], "SiteCode int, PatientPK string, ID int"  # no DateExtracted
    )
    target = bad_source.select("SiteCode", "PatientPK").limit(0)
    with pytest.raises(ValueError, match="dedupe_order columns"):
        run_incremental_load(spark, spec, bad_source, target, {})


# ---------------------------------------------------------------------------
# Intentional deviations from the reference (jobs/catalog.py module
# docstring) — each asserted explicitly so the divergence is a tested
# decision, not an accident.
# ---------------------------------------------------------------------------


def test_deviation_labs_not_capped_at_ten_rows(spark):
    """LoadSourceCTPatientLabs.sql:1 reads ``SELECT distinct top 10`` — a
    debug leftover that caps the national labs extract at 10 rows. NOT
    reproduced: ct_patient_labs reads the full extract."""
    spec = CATALOG["ct_patient_labs"]
    assert "top 10" not in (spec.source_table or "").lower()
    n = 25  # > the reference's debug cap
    src = spark.createDataFrame(
        [
            (100 + i, "p%d" % i, "v%d" % i, "Female", 7,
             "pid%d" % i, "res%d" % i, "HB", dt.date(2023, 1, 2), 0,
             dt.date(2023, 1, 1), i, "proj")
            for i in range(n)
        ],
        "SiteCode int, PatientPK string, VisitID string, Gender string, "
        "Code int, PatientID string, TestResult string, TestName string, "
        "OrderedbyDate date, Voided int, Created date, ID int, Project string",
    )
    target = src.select(*spec.keys).limit(0)
    lookups = {"lkp_test_name": spark.createDataFrame(
        [("HB", "Haemoglobin")], "source_name string, target_name string")}
    delta = run_incremental_load(spark, spec, src, target, lookups)
    assert delta.count() == n, "labs extract must NOT be capped at 10 rows"


def test_deviation_pharmacy_keeps_in_range_duration(spark):
    """LoadPatientPharmacy.java:91,95 — the Duration / PeriodTaken ``when``
    chains have no ``.otherwise`` arm, so the reference nulls every
    IN-range value. NOT reproduced: in-range values survive (sentinel only
    when bad), matching the sibling ART rule LoadARTPatients.java:127-128."""
    from dwh_etl_ods_spark_jobs_spark.jobs.rules import ct_patient_pharmacy_rules

    df = spark.createDataFrame(
        [(30.0, 28.0, "x", "y"), (-5.0, 0.0, "x", "y")],
        "Duration double, PeriodTaken double, Emr string, Project string",
    ).withColumn("ExpectedReturn", F.lit(None).cast("date"))
    for rule in ct_patient_pharmacy_rules():
        df = rule(df)
    rows = sorted(df.collect(), key=lambda r: r.Duration)
    # in-range: preserved (the reference would have nulled them)
    assert (rows[0].Duration, rows[0].PeriodTaken) == (30.0, 28.0)
    # out-of-range: sentinel, as in the reference's intent
    assert (rows[1].Duration, rows[1].PeriodTaken) == (999.0, 999.0)


def test_run_job_cli_rejects_half_specified_dims(spark, tmp_path):
    """Passing only one of --patient-path/--facility-path must fail loudly
    — it used to silently skip enrichment AND the dim-side Gender/Voided
    filters, loading rows the reference's source SQL excludes."""
    import dwh_etl_ods_spark_jobs_spark.run_job as RJ

    d = str(tmp_path)
    spark.createDataFrame([(1,)], "x int").write.parquet(f"{d}/src")
    spark.createDataFrame([(1,)], "x int").write.parquet(f"{d}/tgt")
    spark.createDataFrame([(1,)], "x int").write.parquet(f"{d}/pat")
    with pytest.raises(SystemExit, match="patient AND facility"):
        RJ.main([
            "ct_patient_baselines", "--source-path", f"{d}/src",
            "--target-path", f"{d}/tgt", "--patient-path", f"{d}/pat",
        ])


def test_run_backfill_chunks_are_idempotent_and_fill_gaps(spark):
    """Chunked backfill over a 4-month window: only rows the target lacks
    append, chunk boundaries lose nothing, and a second pass appends
    zero (no delete-window preamble needed)."""
    from dwh_etl_ods_spark_jobs_spark.jobs.spec import JobSpec, run_backfill

    spec = JobSpec(
        name="backfill_demo", source_system="dwapicentral",
        target="dbo.BF", keys=("SiteCode", "PatientPK"),
    )
    rows = [
        (100, f"p{i}", i, dt.date(2021, 1 + (i % 4), 1 + i % 27))
        for i in range(40)
    ]
    source = spark.createDataFrame(
        rows, "SiteCode int, PatientPK string, ID int, VisitDate date"
    )
    # target already holds the even patients
    target = source.filter("ID % 2 = 0").select("SiteCode", "PatientPK")

    deltas = run_backfill(
        spark, spec, source, target,
        date_col="VisitDate", start="2021-01-01", end="2021-05-01",
        chunk_days=31,
    )
    assert len(deltas) == 4  # 120 days / 31-day chunks
    appended = set()
    for d in deltas:
        appended |= {r.PatientPK for r in d.collect()}
    expect = {f"p{i}" for i in range(40) if i % 2 == 1}
    assert appended == expect  # gaps filled, nothing duplicated

    # idempotency: target now complete -> second backfill appends nothing
    full_target = source.select("SiteCode", "PatientPK")
    deltas2 = run_backfill(
        spark, spec, source, full_target,
        date_col="VisitDate", start="2021-01-01", end="2021-05-01",
        chunk_days=31,
    )
    assert sum(d.count() for d in deltas2) == 0

    # window validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty backfill window"):
        run_backfill(spark, spec, source, target, date_col="VisitDate",
                     start="2021-05-01", end="2021-05-01")
