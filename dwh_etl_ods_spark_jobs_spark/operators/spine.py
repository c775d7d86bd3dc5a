"""Date spines and entity-date grids.

The reference generates a month-end spine 2017-01..2023-03 with a recursive
T-SQL CTE and then *iterates* over it with a cursor
(``LoadHistoricalARTOutcomes.sql:4-19,25-46,245-251``). PySpark has no
recursive CTE and needs none: ``explode(sequence(...))`` + ``last_day``
builds the spine in one expression, and the cursor loop becomes a single
set-based join against the spine (see plans/art_outcomes.py).

Two grid strategies for entities × spine (each entity enters at its own
first-activity date):

- small spine (the reference's real range is 75 month-ends): build the
  spine once, ``broadcast`` it into a non-equi join — one
  BroadcastNestedLoop over a tiny build side;
- large spine (daily over decades, minute grains, ...): NO broadcast and
  NO non-equi join — :func:`entity_day_grid` / :func:`entity_month_grid`
  explode each entity's own ``sequence(first, end)`` in place, which
  produces exactly the grid rows with zero shuffle and scales linearly in
  output size. plans/art_outcomes.py picks automatically.

Spine generation itself is chunked over ``spark.range(n_chunks)`` so a
huge spine materializes across tasks instead of inside one
``explode(sequence(...))`` call on a single row.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# One sequence() call per task covers at most this many periods.
_CHUNK = 1000


def _d(x: str | dt.date) -> dt.date:
    return x if isinstance(x, dt.date) else dt.date.fromisoformat(str(x))


def day_spine(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    col: str = "as_of_date",
) -> DataFrame:
    """One row per day in [start, end] — the month-end cursor generalized to
    arbitrary grain (the testdata's events span one month, so the analytical
    rebuild uses day-ends where the reference used month-ends). Generated in
    ``_CHUNK``-day slices across ``spark.range`` tasks: a multi-decade spine
    is parallel, not a single task's explode."""
    s, e = _d(start), _d(end)
    n_days = (e - s).days + 1
    if n_days <= 0:
        return spark.range(0).select(F.lit(None).cast("date").alias(col))
    n_chunks = (n_days + _CHUNK - 1) // _CHUNK
    chunk_start = F.date_add(F.lit(s), (F.col("id") * _CHUNK).cast("int"))
    chunk_end = F.least(
        F.date_add(F.lit(s), ((F.col("id") + 1) * _CHUNK - 1).cast("int")),
        F.lit(e),
    )
    return spark.range(n_chunks).select(
        F.explode(
            F.sequence(chunk_start, chunk_end, F.expr("interval 1 day"))
        ).alias(col)
    )


def month_spine(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    col: str = "as_of_date",
) -> DataFrame:
    """One row per month-end date in [start, end] (inclusive by month).
    Chunked like :func:`day_spine` (``_CHUNK`` months per task)."""
    s = _d(start).replace(day=1)
    e = _d(end).replace(day=1)
    n_months = (e.year - s.year) * 12 + (e.month - s.month) + 1
    if n_months <= 0:
        return spark.range(0).select(F.lit(None).cast("date").alias(col))
    n_chunks = (n_months + _CHUNK - 1) // _CHUNK
    chunk_start = F.add_months(F.lit(s), (F.col("id") * _CHUNK).cast("int"))
    chunk_end = F.least(
        F.add_months(F.lit(s), ((F.col("id") + 1) * _CHUNK - 1).cast("int")),
        F.lit(e),
    )
    return spark.range(n_chunks).select(
        F.explode(
            F.sequence(chunk_start, chunk_end, F.expr("interval 1 month"))
        ).alias("__m")
    ).select(F.last_day(F.col("__m")).alias(col))


def _entity_grid(
    entities: DataFrame,
    first: Column,
    end_lit: Column,
    step: str,
    col: str,
) -> DataFrame:
    # Entities whose window starts after the range end generate no rows
    # (sequence() with a positive step rejects start > stop).
    return entities.filter(first <= end_lit).withColumn(
        col, F.explode(F.sequence(first, end_lit, F.expr(step)))
    )


def entity_day_grid(
    entities: DataFrame,
    first_col: str,
    start: str | dt.date,
    end: str | dt.date,
    col: str = "as_of_date",
) -> DataFrame:
    """entities × daily spine without broadcasting the spine: each row
    explodes its own ``sequence(max(first, start), end)``. Equivalent to
    ``entities ⋈_{as_of_date >= first} day_spine(start, end)`` but with no
    join at all — output size is exactly the grid, work is linear in it,
    and nothing is collected or broadcast. The scale path for >5k-period
    ranges where a broadcast non-equi grid would be a hot loop."""
    first = F.greatest(F.col(first_col), F.lit(_d(start)))
    return _entity_grid(entities, first, F.lit(_d(end)), "interval 1 day", col)


def entity_month_grid(
    entities: DataFrame,
    first_col: str,
    start: str | dt.date,
    end: str | dt.date,
    col: str = "as_of_date",
) -> DataFrame:
    """Month-end variant of :func:`entity_day_grid`: month-ends from the
    entity's first month (clamped to ``start``'s month) through ``end``'s
    month — exactly the rows of the broadcast grid
    ``entities ⋈_{month_end >= first} month_spine(start, end)`` (the first
    month-end ≥ any ``first_col`` date in that month by construction)."""
    first = F.trunc(
        F.greatest(F.col(first_col), F.lit(_d(start))), "month"
    )
    out = _entity_grid(
        entities, first, F.lit(_d(end).replace(day=1)), "interval 1 month", "__m"
    )
    return out.withColumn(col, F.last_day(F.col("__m"))).drop("__m")
