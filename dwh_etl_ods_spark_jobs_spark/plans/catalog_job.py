"""Driver-gated + benchable run of a FULL catalog job pipeline.

``catalog_job_pipeline`` pushes a visit-shaped frame synthesized from
``events`` through the REAL ``ct_patient_visits`` JobSpec
(``jobs/catalog.py`` — gender/code WHERE gate, greatest-per-key dedupe,
the LoadPatientVisits.java:78-105 cleaning chain, two CI lookup folds,
null-safe anti-join, in-flight PII hashing, and the 75-column
PatientVisitsDDL.sql projection with typed NULL fills) via
``run_incremental_load`` — the exact production path ``run_job.py``
drives. The 51-job e2e pytests prove the catalog at toy scale; THIS entry
gives the flagship pipeline a driver-checked oracle AND a tracked bench
number at sf0.1 (bench.py times every ``queries()`` entry).

The DuckDB oracle mirrors every stage; the DDL projection half is
generated from the same ``spec.select``/``spec.select_types`` data the
engine uses, so the two cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.jobs.catalog import CATALOG
from dwh_etl_ods_spark_jobs_spark.jobs.spec import run_incremental_load

_SPEC = CATALOG["ct_patient_visits"]

_GENDERS = ["Male", "Female", "Unknown", None]
_PROJECTS = ["I-TECH", "HMIS", "Kenya HMIS II", "CDC"]
_FP = ["condoms", "IUD", "none", None]
_PWP = ["counselled", "screened"]
_FP_LKP = [("Condoms", "Condoms Applied"), ("iud", "IUD Fitted")]
_PWP_LKP = [("counselled", "Counselled")]


def _cycle(values: list, idx_col, cast_type: str = "string"):
    arr = F.array(*[F.lit(v).cast(cast_type) for v in values])
    return F.element_at(arr, (idx_col % len(values)).cast("int") + 1)


def q_catalog_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir)
    i = F.col("event_id")
    src = ev.select(
        i.alias("ID"),
        F.col("user_id").cast("string").alias("PatientPK"),
        F.concat(F.lit("pid"), F.col("user_id").cast("string")).alias("PatientID"),
        F.pmod(F.col("user_id"), F.lit(500)).cast("int").alias("SiteCode"),
        F.pmod(i, F.lit(25)).cast("string").alias("VisitID"),
        F.to_date("ts").alias("DateExtracted"),
        _cycle(_GENDERS, i).alias("Gender"),
        F.when(F.pmod(i, F.lit(7)) == 0, F.lit("1890-05-05").cast("date"))
        .otherwise(F.to_date("ts")).alias("VisitDate"),
        F.date_add(
            F.to_date("ts"), (F.pmod(i, F.lit(9)) * 365).cast("int")
        ).alias("NextAppointmentDate"),
        F.pmod(i, F.lit(250)).cast("double").alias("Weight"),
        F.pmod(i * 7, F.lit(300)).cast("double").alias("Height"),
        _cycle(_PROJECTS, i).alias("Project"),
        _cycle(_FP, i + 1).alias("FamilyPlanningMethod"),
        _cycle(_PWP, i).alias("PwP"),
    )
    target = (
        src.filter(F.col("ID") % 10 < 3)
        .select("PatientPK", "SiteCode", "VisitID")
        .distinct()
    )
    lookups = {
        "lkp_family_planning_method": spark.createDataFrame(
            _FP_LKP, "source_name string, target_name string"
        ),
        "lkp_pwp": spark.createDataFrame(
            _PWP_LKP, "source_name string, target_name string"
        ),
    }
    return run_incremental_load(spark, _SPEC, src, target, lookups)


# --- DuckDB oracle ---------------------------------------------------------

_DUCK_TYPES = {
    "date": "DATE", "boolean": "BOOLEAN", "int": "INTEGER",
    "decimal(18,2)": "DECIMAL(18,2)", "timestamp": "TIMESTAMP",
    "string": "VARCHAR",
}

# Columns the delta actually carries (everything else NULL-fills typed).
_PRESENT = {
    "patientpk", "patientid", "sitecode", "visitid", "visitdate",
    "nextappointmentdate", "weight", "height", "project",
    "familyplanningmethod", "pwp", "patientpkhash", "patientidhash",
}


def _lit_list(vals: list) -> str:
    return "[" + ", ".join(
        "NULL" if v is None else "'" + str(v) + "'" for v in vals
    ) + "]"


def _values(pairs: list[tuple[str, str]]) -> str:
    return ", ".join(f"('{s}', '{t}')" for s, t in pairs)


def _projection() -> str:
    cols = []
    types = {k.lower(): v for k, v in _SPEC.select_types.items()}
    for c in _SPEC.select:
        if c.lower() in _PRESENT:
            cols.append(f"{c}")
        else:
            duck = _DUCK_TYPES[types.get(c.lower(), "string")]
            cols.append(f"CAST(NULL AS {duck}) AS {c}")
    return ",\n       ".join(cols)


def _oracle() -> str:
    g = _lit_list(_GENDERS)
    pj = _lit_list(_PROJECTS)
    fp = _lit_list(_FP)
    pwp = _lit_list(_PWP)
    return f"""
WITH src AS (
  SELECT event_id AS ID,
         CAST(user_id AS VARCHAR) AS PatientPK,
         'pid' || CAST(user_id AS VARCHAR) AS PatientID,
         CAST(user_id % 500 AS INTEGER) AS SiteCode,
         CAST(event_id % 25 AS VARCHAR) AS VisitID,
         CAST(ts AS DATE) AS DateExtracted,
         ({g})[CAST(event_id % 4 AS INT) + 1] AS Gender,
         CASE WHEN event_id % 7 = 0 THEN DATE '1890-05-05'
              ELSE CAST(ts AS DATE) END AS VisitDate,
         CAST(ts AS DATE) + CAST((event_id % 9) * 365 AS INT)
           AS NextAppointmentDate,
         CAST(event_id % 250 AS DOUBLE) AS Weight,
         CAST((event_id * 7) % 300 AS DOUBLE) AS Height,
         ({pj})[CAST(event_id % 4 AS INT) + 1] AS Project,
         ({fp})[CAST((event_id + 1) % 4 AS INT) + 1] AS FamilyPlanningMethod,
         ({pwp})[CAST(event_id % 2 AS INT) + 1] AS PwP
  FROM events
),
filtered AS (
  SELECT * FROM src
  WHERE Gender != 'Unknown' AND TRY_CAST(SiteCode AS BIGINT) > 0
),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY PatientPK, SiteCode, VisitID
      ORDER BY DateExtracted DESC NULLS LAST, ID DESC NULLS LAST) AS __rn
    FROM filtered)
  WHERE __rn = 1
),
cleaned AS (
  SELECT ID, PatientPK, PatientID, SiteCode, VisitID, DateExtracted, Gender,
         CASE WHEN TRY_CAST(Weight AS FLOAT4) IS NOT NULL
                AND (TRY_CAST(Weight AS FLOAT4) < 0 OR TRY_CAST(Weight AS FLOAT4) > 200)
              THEN CAST(999.0 AS FLOAT4) ELSE TRY_CAST(Weight AS FLOAT4) END AS Weight,
         CASE WHEN TRY_CAST(Height AS FLOAT4) IS NOT NULL
                AND (TRY_CAST(Height AS FLOAT4) < 0 OR TRY_CAST(Height AS FLOAT4) > 259)
              THEN CAST(999.0 AS FLOAT4) ELSE TRY_CAST(Height AS FLOAT4) END AS Height,
         CASE WHEN TRY_CAST(VisitDate AS DATE) IS NOT NULL
                AND (TRY_CAST(VisitDate AS DATE) < DATE '1900-01-01'
                     OR TRY_CAST(VisitDate AS DATE) > CURRENT_DATE)
              THEN DATE '1900-01-01' ELSE TRY_CAST(VisitDate AS DATE) END AS VisitDate,
         CASE WHEN TRY_CAST(NextAppointmentDate AS DATE) IS NOT NULL
                AND (TRY_CAST(NextAppointmentDate AS DATE) < DATE '1900-01-01'
                     OR TRY_CAST(NextAppointmentDate AS DATE)
                        > CURRENT_DATE + INTERVAL 12 MONTH)
              THEN DATE '1900-01-01'
              ELSE TRY_CAST(NextAppointmentDate AS DATE) END AS NextAppointmentDate,
         CASE WHEN Project IN ('I-TECH', 'HMIS') THEN 'Kenya HMIS II'
              ELSE Project END AS Project,
         FamilyPlanningMethod, PwP
  FROM dedup
),
looked AS (
  SELECT c.* EXCLUDE (FamilyPlanningMethod, PwP),
         COALESCE(fp.target_name, c.FamilyPlanningMethod) AS FamilyPlanningMethod,
         COALESCE(pw.target_name, c.PwP) AS PwP
  FROM cleaned c
  LEFT JOIN (VALUES {_values(_FP_LKP)}) fp(source_name, target_name)
    ON UPPER(c.FamilyPlanningMethod) = UPPER(fp.source_name)
  LEFT JOIN (VALUES {_values(_PWP_LKP)}) pw(source_name, target_name)
    ON UPPER(c.PwP) = UPPER(pw.source_name)
),
tgt AS (
  SELECT DISTINCT PatientPK, SiteCode, VisitID FROM src WHERE ID % 10 < 3
),
delta AS (
  SELECT * FROM looked d
  WHERE NOT EXISTS (
    SELECT 1 FROM tgt t
    WHERE t.PatientPK IS NOT DISTINCT FROM d.PatientPK
      AND t.SiteCode IS NOT DISTINCT FROM d.SiteCode
      AND t.VisitID IS NOT DISTINCT FROM d.VisitID)
),
hashed AS (
  SELECT *,
         UPPER(sha256(CAST(PatientID AS VARCHAR))) AS PatientIDHash,
         UPPER(sha256(CAST(PatientPK AS VARCHAR))) AS PatientPKHash
  FROM delta
)
SELECT {_projection()}
FROM hashed
"""


SQL_CATALOG_JOB = _oracle()

QUERIES = {"catalog_job_pipeline": q_catalog_job}
ORACLES = {"catalog_job_pipeline": SQL_CATALOG_JOB}
