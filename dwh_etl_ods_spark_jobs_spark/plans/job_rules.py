"""Driver-gated query for the per-job literal canonicalization rule sets.

``job_rules_canonicalization`` synthesizes dirty categorical columns from
``orders`` (cycling every source literal of every map, plus NULL / '' /
unmapped probes) and pushes them through the SAME ``value_map`` rule chains
the catalog wires into ct_art_patients / ct_adverse_events / prep_patient /
hts_client_tests (``jobs/rules.py``, reference provenance there). The
DuckDB oracle is generated from the same dict constants via
:func:`~dwh_etl_ods_spark_jobs_spark.jobs.rules.value_map_sql`, so every
literal of every map is hash-checked through both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.jobs.rules import (
    AE_ACTION_MAP,
    AE_CAUSE_MAP,
    AE_OUTCOME_MAP,
    AE_SEVERITY_MAP,
    ART_EMR_MAP,
    ART_PROJECT_MAP,
    COVID_VACCINATION_MAP,
    ELIGIBILITY_FLAG_MAP,
    ELIGIBILITY_PATIENT_TYPE_MAP,
    HTS_CLIENT_TESTS_MAPS,
    HTS_GENDER_MAP,
    OTZ_YES_NO_MAP,
    PNS_APPROACH_MAP,
    PNS_CONSENT_MAP,
    PNS_LINKED_MAP,
    PREP_COUNTY_MAP,
    empty_to_null_sql,
    value_map_sql,
)
from dwh_etl_ods_spark_jobs_spark.operators import (
    apply_rules,
    empty_to_null,
    value_map,
)


def _samples(mapping: dict[str, list[str]]) -> list[str | None]:
    """Every source literal + NULL + '' + two unmapped probes."""
    vals: list[str | None] = [None, ""]
    for sources in mapping.values():
        vals.extend(sources)
    vals.extend(["unmapped probe A", "unmapped probe B"])
    return vals


# (output column, map, otherwise_keep, default, empty->NULL pre-pass, offset)
# Offsets decorrelate the per-column cycles so rows exercise mixed combos.
_COLUMNS: list[tuple[str, dict[str, list[str]], bool, str | None, bool, int]] = [
    ("Severity", AE_SEVERITY_MAP, True, None, True, 0),
    ("AdverseEventActionTaken", AE_ACTION_MAP, True, None, True, 3),
    ("AdverseEventCause", AE_CAUSE_MAP, True, None, True, 7),
    ("AdverseEventClinicalOutcome", AE_OUTCOME_MAP, True, None, True, 1),
    ("Emr", ART_EMR_MAP, True, None, False, 2),
    ("Project", ART_PROJECT_MAP, True, None, False, 4),
    ("County", PREP_COUNTY_MAP, True, None, True, 5),
    ("TbScreening", *HTS_CLIENT_TESTS_MAPS["TbScreening"], False, 6),
    ("ClientTestedAs", *HTS_CLIENT_TESTS_MAPS["ClientTestedAs"], False, 8),
    ("TestType", *HTS_CLIENT_TESTS_MAPS["TestType"], False, 9),
    # Round-5 wired chains (jobs/rules.py round-4 additions)
    ("PnsApproach", PNS_APPROACH_MAP, True, None, False, 10),
    ("LinkedToCare", PNS_LINKED_MAP, True, None, False, 11),
    ("PnsConsent", PNS_CONSENT_MAP, True, None, False, 12),
    ("Gender", HTS_GENDER_MAP, True, None, False, 13),
    ("TransferInStatus", OTZ_YES_NO_MAP, True, None, False, 14),
    ("VaccinationStatus", COVID_VACCINATION_MAP, True, None, False, 15),
    ("WeightLoss", ELIGIBILITY_FLAG_MAP, True, None, False, 16),
    ("PatientType", ELIGIBILITY_PATIENT_TYPE_MAP, True, None, False, 17),
]


def _pick(vals: list[str | None], offset: int) -> Column:
    arr = F.array(*[F.lit(v).cast("string") for v in vals])
    idx = ((F.col("o_orderkey") + offset) % len(vals)).cast("int") + 1
    return F.element_at(arr, idx)


def q_job_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    df = orders.select(
        "o_orderkey",
        *[
            _pick(_samples(mapping), off).alias(col)
            for col, mapping, _keep, _default, _e2n, off in _COLUMNS
        ],
    )
    # r15: one fused projection for all 18 chains (apply_rules batches the
    # expression rules) — the per-withColumn analysis passes dominated this
    # query's wall time, not execution.
    rules = []
    for col, mapping, keep, default, e2n, _off in _COLUMNS:
        if e2n:
            rules.append(empty_to_null([col]))
        rules.append(value_map(col, mapping, otherwise_keep=keep, default=default))
    return apply_rules(rules)(df)


def _sql_lit(v: str | None) -> str:
    if v is None:
        return "NULL"
    return "'" + v.replace("'", "''") + "'"


def _oracle() -> str:
    dirty_cols = []
    for col, mapping, _keep, _default, _e2n, off in _COLUMNS:
        vals = _samples(mapping)
        lst = "[" + ", ".join(_sql_lit(v) for v in vals) + "]"
        dirty_cols.append(
            f"({lst})[CAST((o_orderkey + {off}) % {len(vals)} AS INT) + 1] AS {col}"
        )
    clean_cols = []
    for col, mapping, keep, default, e2n, _off in _COLUMNS:
        expr = empty_to_null_sql(col) if e2n else col
        clean_cols.append(
            value_map_sql(expr, mapping, otherwise_keep=keep, default=default)
            + f" AS {col}"
        )
    return (
        "WITH dirty AS (SELECT o_orderkey, "
        + ", ".join(dirty_cols)
        + " FROM orders)\nSELECT o_orderkey, "
        + ", ".join(clean_cols)
        + " FROM dirty"
    )


SQL_JOB_RULES = _oracle()

QUERIES = {"job_rules_canonicalization": q_job_rules}
ORACLES = {"job_rules_canonicalization": SQL_JOB_RULES}
