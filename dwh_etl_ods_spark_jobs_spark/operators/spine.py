"""Date spines.

The reference generates a month-end spine 2017-01..2023-03 with a recursive
T-SQL CTE and then *iterates* over it with a cursor
(``LoadHistoricalARTOutcomes.sql:4-19,25-46,245-251``). PySpark has no
recursive CTE and needs none: ``explode(sequence(...))`` + ``last_day``
builds the spine in one expression, and the cursor loop becomes a single
set-based join against the spine (see plans/art_outcomes.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def day_spine(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    col: str = "as_of_date",
) -> DataFrame:
    """One row per day in [start, end] — the month-end cursor generalized to
    arbitrary grain (the testdata's events span one month, so the analytical
    rebuild uses day-ends where the reference used month-ends)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(str(start))),
                F.to_date(F.lit(str(end))),
                F.expr("interval 1 day"),
            )
        ).alias(col)
    )


def month_spine(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    col: str = "as_of_date",
) -> DataFrame:
    """One row per month-end date in [start, end] (inclusive by month)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.trunc(F.to_date(F.lit(str(start))), "month"),
                F.trunc(F.to_date(F.lit(str(end))), "month"),
                F.expr("interval 1 month"),
            )
        ).alias("__m")
    ).select(F.last_day(F.col("__m")).alias(col))
