"""Native-Spark rebuild of the Historical ART Outcomes script.

The reference's only analytical query is 251 lines of T-SQL executed over
plain JDBC (``Load Historical ART Outcome Base Table/.../LoadHistoricalARTBase.java:26-41``,
script ``LoadHistoricalARTOutcomes.sql:1-251``): a recursive-CTE date spine
(:4-19), a **cursor loop** over period-ends (:25-46,245-251), and per
iteration: as-of filters (:35-61), ``row_number`` latest-per-patient for
visits and pharmacy (:81-157), a full outer join of the two (:158-182),
appointment-date repair (:183-196), a CASE outcome classifier (:197-232),
and an INSERT with SHA2 PII hashing (:234-243).

Spark-first rewrite — the cursor disappears entirely:

1. spine       = ``explode(sequence(...))``                (operators/spine.py)
2. activity    = one window pass marking each (entity, day) with its latest
                 visit / latest dispense THAT day
3. grid        = entities x spine days (starting at each entity's first
                 activity), left-joined to per-day latest
4. as-of state = ``last(col, ignorenulls=True)`` carry-forward window —
                 the set-based equivalent of "latest record <= period end"
                 for EVERY period at once, one shuffle instead of N loop
                 iterations
5. classifier  = chained ``when`` (:210-220), hash = in-flight SHA2 (:238-239)

Scale: the expensive input (events) is touched twice (daily top-1 window +
grid left join), both shuffled on the same entity key; the grid itself is
|entities| x |days| — tiny relative to the fact table. The reference's
cursor re-scanned the fact once per period (75x).

The testdata's ``events`` span one month, so the month-end spine becomes a
day-end spine (same semantics, finer grain): visits = click/view events,
dispenses = purchase events, patient = user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.operators import dedupe_latest
from dwh_etl_ods_spark_jobs_spark.operators.spine import (
    day_spine,
    entity_day_grid,
    entity_month_grid,
    month_spine,
)

SPINE_START = "2024-01-01"
SPINE_END = "2024-01-30"
ACTIVE_DAYS = 7  # classifier thresholds (reference :210-220 uses 30/90-day bands)
DEFAULT_DAYS = 14

# Month-end variant at the reference's own grain and 30/90-day bands
# (LoadHistoricalARTOutcomes.sql:8-19 builds month-ends; :210-220 classifies
# with 30/90-day windows). The spine brackets the testdata's event range so
# state visibly carries forward and decays across month-ends.
MONTH_SPINE_START = "2023-10-01"
MONTH_SPINE_END = "2024-06-30"
ACTIVE_DAYS_MONTHLY = 30
DEFAULT_DAYS_MONTHLY = 90

# The entities x spine grid has two shapes (operators/spine.py module
# docstring): a broadcast non-equi join (BroadcastNestedLoop on
# as_of_date >= first_d) while the spine stays tiny — true for the real
# ranges (30 days / 9 month-ends here; the reference's full range is 75
# month-ends) — and a per-entity sequence-explode for anything larger,
# which broadcasts nothing and does no join at all. The threshold makes a
# future range edit degrade to the scalable shape instead of silently
# growing the broadcast (or asserting, as rounds <=5 did).
_MAX_SPINE_ROWS = 5000


def _spine_days(start: str, end: str) -> int:
    import datetime as _dt

    return (_dt.date.fromisoformat(end) - _dt.date.fromisoformat(start)).days + 1


def _day_grid(spark, first_seen, start: str, end: str):
    """entities × day spine, entity entering at first_d (grid semantics of
    LoadHistoricalARTOutcomes.sql:25-46)."""
    if _spine_days(start, end) <= _MAX_SPINE_ROWS:
        spine = day_spine(spark, start, end)
        return first_seen.join(
            F.broadcast(spine), F.col("as_of_date") >= F.col("first_d")
        )
    return entity_day_grid(first_seen, "first_d", start, end)


def _month_grid(spark, first_seen, start: str, end: str):
    if _spine_days(start, end) <= _MAX_SPINE_ROWS:
        spine = month_spine(spark, start, end)
        return first_seen.join(
            F.broadcast(spine), F.col("as_of_date") >= F.col("first_m")
        )
    return entity_month_grid(first_seen, "first_m", start, end)


def art_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir)
    visits = ev.filter(F.col("event_type").isin("click", "view"))
    dispenses = ev.filter(F.col("event_type") == "purchase")

    def _daily_latest(df: DataFrame, prefix: str) -> DataFrame:
        # Latest record per (user, day) — reference row_number blocks :81-157.
        day = F.to_date("ts").alias("d")
        latest = df.withColumn("d", day).transform(
            dedupe_latest(["user_id", "d"], [F.col("ts").desc(), F.col("event_id").desc()])
        )
        return latest.select(
            F.col("user_id").alias(f"{prefix}_uid"),
            F.col("d").alias(f"{prefix}_d"),
            F.col("ts").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
        )

    v = _daily_latest(visits, "visit")
    p = _daily_latest(dispenses, "disp")

    # Entities enter the grid at their first activity (reference enrolment
    # as-of filter :35-61); small spine -> broadcast, large -> per-entity
    # explode (_day_grid).
    first_seen = ev.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("first_d"))
    grid = _day_grid(spark, first_seen, SPINE_START, SPINE_END)

    st = (
        grid.join(
            v,
            (F.col("user_id") == F.col("visit_uid")) & (F.col("as_of_date") == F.col("visit_d")),
            "left",
        )
        .join(
            p,
            (F.col("user_id") == F.col("disp_uid")) & (F.col("as_of_date") == F.col("disp_d")),
            "left",
        )
        .drop("visit_uid", "visit_d", "disp_uid", "disp_d")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("as_of_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = st.select(
        "user_id",
        "as_of_date",
        F.last("visit_ts", ignorenulls=True).over(w).alias("last_visit_ts"),
        F.last("disp_ts", ignorenulls=True).over(w).alias("last_disp_ts"),
        F.last("disp_value", ignorenulls=True).over(w).alias("last_disp_value"),
    )

    days_since_visit = F.datediff(F.col("as_of_date"), F.to_date("last_visit_ts"))
    days_since_disp = F.datediff(F.col("as_of_date"), F.to_date("last_disp_ts"))
    # Outcome classifier — reference CASE ladder :210-220 (V / NP / uL / NV).
    outcome = (
        F.when(F.col("last_visit_ts").isNull() & F.col("last_disp_ts").isNull(), "NoContact")
        .when(
            (F.col("last_disp_ts").isNotNull())
            & (F.col("last_visit_ts").isNull() | (F.col("last_disp_ts") > F.col("last_visit_ts"))),
            F.when(days_since_disp <= ACTIVE_DAYS, "ActiveOnDispense").otherwise(
                "DispenseOnly"
            ),
        )
        .when(days_since_visit <= ACTIVE_DAYS, "Active")
        .when(days_since_visit <= DEFAULT_DAYS, "Defaulted")
        .otherwise("LostToFollowUp")
    )
    return st.select(
        "user_id",
        "as_of_date",
        F.to_date("last_visit_ts").alias("last_visit_date"),
        F.to_date("last_disp_ts").alias("last_disp_date"),
        F.col("last_disp_value").alias("last_disp_value"),
        outcome.alias("outcome"),
        # In-flight PII hash (reference INSERT :238-239).
        F.upper(F.sha2(F.col("user_id").cast("string"), 256)).alias("UserHash"),
    )


def art_outcomes_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own grain: month-end periods + 30/90-day outcome
    bands (``LoadHistoricalARTOutcomes.sql:8-19`` spine, ``:210-220``
    classifier). Identical set-based shape to :func:`art_outcomes` — events
    bucket to their month-end, one carry-forward window replaces the
    reference's 75-iteration cursor."""
    from dwh_etl_ods_spark_jobs_spark.plans.showcase import read_events

    ev = read_events(spark, sf_dir)
    visits = ev.filter(F.col("event_type").isin("click", "view"))
    dispenses = ev.filter(F.col("event_type") == "purchase")

    def _monthly_latest(df: DataFrame, prefix: str) -> DataFrame:
        m = F.last_day(F.to_date("ts")).alias("m")
        latest = df.withColumn("m", m).transform(
            dedupe_latest(["user_id", "m"], [F.col("ts").desc(), F.col("event_id").desc()])
        )
        return latest.select(
            F.col("user_id").alias(f"{prefix}_uid"),
            F.col("m").alias(f"{prefix}_m"),
            F.col("ts").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
        )

    v = _monthly_latest(visits, "visit")
    p = _monthly_latest(dispenses, "disp")

    first_seen = ev.groupBy("user_id").agg(
        F.last_day(F.to_date(F.min("ts"))).alias("first_m")
    )
    grid = _month_grid(spark, first_seen, MONTH_SPINE_START, MONTH_SPINE_END)

    st = (
        grid.join(
            v,
            (F.col("user_id") == F.col("visit_uid")) & (F.col("as_of_date") == F.col("visit_m")),
            "left",
        )
        .join(
            p,
            (F.col("user_id") == F.col("disp_uid")) & (F.col("as_of_date") == F.col("disp_m")),
            "left",
        )
        .drop("visit_uid", "visit_m", "disp_uid", "disp_m")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("as_of_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = st.select(
        "user_id",
        "as_of_date",
        F.last("visit_ts", ignorenulls=True).over(w).alias("last_visit_ts"),
        F.last("disp_ts", ignorenulls=True).over(w).alias("last_disp_ts"),
        F.last("disp_value", ignorenulls=True).over(w).alias("last_disp_value"),
    )

    days_since_visit = F.datediff(F.col("as_of_date"), F.to_date("last_visit_ts"))
    days_since_disp = F.datediff(F.col("as_of_date"), F.to_date("last_disp_ts"))
    outcome = (
        F.when(F.col("last_visit_ts").isNull() & F.col("last_disp_ts").isNull(), "NoContact")
        .when(
            (F.col("last_disp_ts").isNotNull())
            & (F.col("last_visit_ts").isNull() | (F.col("last_disp_ts") > F.col("last_visit_ts"))),
            F.when(days_since_disp <= ACTIVE_DAYS_MONTHLY, "ActiveOnDispense").otherwise(
                "DispenseOnly"
            ),
        )
        .when(days_since_visit <= ACTIVE_DAYS_MONTHLY, "Active")
        .when(days_since_visit <= DEFAULT_DAYS_MONTHLY, "Defaulted")
        .otherwise("LostToFollowUp")
    )
    return st.select(
        "user_id",
        "as_of_date",
        F.to_date("last_visit_ts").alias("last_visit_date"),
        F.to_date("last_disp_ts").alias("last_disp_date"),
        F.col("last_disp_value").alias("last_disp_value"),
        outcome.alias("outcome"),
        F.upper(F.sha2(F.col("user_id").cast("string"), 256)).alias("UserHash"),
    )


SQL_ART_OUTCOMES_MONTHLY = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
  FROM events
), spine AS (
  SELECT last_day(unnest(generate_series(DATE '2023-10-01', DATE '2024-06-01',
                                         INTERVAL 1 MONTH))::DATE) AS as_of_date
), first_seen AS (
  SELECT user_id, last_day(CAST(min(ts) AS DATE)) AS first_m FROM ev GROUP BY user_id
), v AS (
  SELECT user_id, last_day(CAST(ts AS DATE)) AS m, ts AS visit_ts
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, last_day(CAST(ts AS DATE))
        ORDER BY ts DESC, event_id DESC) rn
    FROM ev WHERE event_type IN ('click','view')
  ) WHERE rn = 1
), p AS (
  SELECT user_id, last_day(CAST(ts AS DATE)) AS m, ts AS disp_ts, value AS disp_value
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, last_day(CAST(ts AS DATE))
        ORDER BY ts DESC, event_id DESC) rn
    FROM ev WHERE event_type = 'purchase'
  ) WHERE rn = 1
), st AS (
  SELECT g.user_id, g.as_of_date,
    last_value(v.visit_ts IGNORE NULLS) OVER (
        PARTITION BY g.user_id ORDER BY g.as_of_date
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_visit_ts,
    last_value(p.disp_ts IGNORE NULLS) OVER (
        PARTITION BY g.user_id ORDER BY g.as_of_date
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_disp_ts,
    last_value(p.disp_value IGNORE NULLS) OVER (
        PARTITION BY g.user_id ORDER BY g.as_of_date
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_disp_value
  FROM (SELECT f.user_id, s.as_of_date
        FROM first_seen f JOIN spine s ON s.as_of_date >= f.first_m) g
  LEFT JOIN v ON g.user_id = v.user_id AND g.as_of_date = v.m
  LEFT JOIN p ON g.user_id = p.user_id AND g.as_of_date = p.m
)
SELECT user_id, as_of_date,
  CAST(last_visit_ts AS DATE) AS last_visit_date,
  CAST(last_disp_ts AS DATE) AS last_disp_date,
  last_disp_value,
  CASE
    WHEN last_visit_ts IS NULL AND last_disp_ts IS NULL THEN 'NoContact'
    WHEN last_disp_ts IS NOT NULL
         AND (last_visit_ts IS NULL OR last_disp_ts > last_visit_ts) THEN
      CASE WHEN date_diff('day', CAST(last_disp_ts AS DATE), as_of_date) <= 30
           THEN 'ActiveOnDispense' ELSE 'DispenseOnly' END
    WHEN date_diff('day', CAST(last_visit_ts AS DATE), as_of_date) <= 30 THEN 'Active'
    WHEN date_diff('day', CAST(last_visit_ts AS DATE), as_of_date) <= 90 THEN 'Defaulted'
    ELSE 'LostToFollowUp'
  END AS outcome,
  UPPER(sha256(CAST(user_id AS VARCHAR))) AS UserHash
FROM st
"""


SQL_ART_OUTCOMES = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
  FROM events
), spine AS (
  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                INTERVAL 1 DAY))::DATE AS as_of_date
), first_seen AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS first_d FROM ev GROUP BY user_id
), v AS (
  SELECT user_id, CAST(ts AS DATE) AS d, ts AS visit_ts, value AS visit_value
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) rn
    FROM ev WHERE event_type IN ('click','view')
  ) WHERE rn = 1
), p AS (
  SELECT user_id, CAST(ts AS DATE) AS d, ts AS disp_ts, value AS disp_value
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) rn
    FROM ev WHERE event_type = 'purchase'
  ) WHERE rn = 1
), grid AS (
  SELECT f.user_id, s.as_of_date
  FROM first_seen f JOIN spine s ON s.as_of_date >= f.first_d
), st AS (
  SELECT g.user_id, g.as_of_date,
    last_value(v.visit_ts IGNORE NULLS) OVER (
        PARTITION BY g.user_id ORDER BY g.as_of_date
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_visit_ts,
    last_value(p.disp_ts IGNORE NULLS) OVER (
        PARTITION BY g.user_id ORDER BY g.as_of_date
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_disp_ts,
    last_value(p.disp_value IGNORE NULLS) OVER (
        PARTITION BY g.user_id ORDER BY g.as_of_date
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_disp_value
  FROM grid g
  LEFT JOIN v ON g.user_id = v.user_id AND g.as_of_date = v.d
  LEFT JOIN p ON g.user_id = p.user_id AND g.as_of_date = p.d
)
SELECT user_id, as_of_date,
  CAST(last_visit_ts AS DATE) AS last_visit_date,
  CAST(last_disp_ts AS DATE) AS last_disp_date,
  last_disp_value,
  CASE
    WHEN last_visit_ts IS NULL AND last_disp_ts IS NULL THEN 'NoContact'
    WHEN last_disp_ts IS NOT NULL
         AND (last_visit_ts IS NULL OR last_disp_ts > last_visit_ts) THEN
      CASE WHEN date_diff('day', CAST(last_disp_ts AS DATE), as_of_date) <= 7
           THEN 'ActiveOnDispense' ELSE 'DispenseOnly' END
    WHEN date_diff('day', CAST(last_visit_ts AS DATE), as_of_date) <= 7 THEN 'Active'
    WHEN date_diff('day', CAST(last_visit_ts AS DATE), as_of_date) <= 14 THEN 'Defaulted'
    ELSE 'LostToFollowUp'
  END AS outcome,
  UPPER(sha256(CAST(user_id AS VARCHAR))) AS UserHash
FROM st
"""
