"""Slowly-changing-dimension (SCD Type 2) history building.

The reference loads ODS tables as latest-state snapshots (greatest-per-key
dedupe, `Load CT Patients Job` et al.); a warehouse ALSO needs the other
standard shape — full change history with validity intervals. This
operator derives it from an observation stream (key, ts, tracked
attributes): collapse consecutive observations with unchanged attributes,
then stitch validity intervals.

Plan: both steps are windows PARTITIONED BY the dimension key (uniform,
no global window): one lag() pass marks change points (runs collapse
WITHOUT a groupBy over run ids), one lead() pass closes intervals. Two
shuffles on the same key — AQE/exchange reuse collapses them to one
sort+exchange in practice. Scales: per-key width is the key's change
count, never materialized driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["changes_to_scd2"]


def changes_to_scd2(key_col: str, ts_col: str, attr_cols: list[str]):
    """Build SCD2 validity intervals from an observation stream.

    Returns one row per (key, attribute-state run):
    ``(key, attrs..., effective_from, effective_to, is_current)`` where
    ``effective_to`` is NULL on the open (current) interval and each
    interval ends exactly when the next begins (no gaps, no overlaps —
    pytest-pinned).

    A row is a change point when ANY tracked attribute differs from the
    key's previous observation (NULL-safe comparison: NULL→value and
    value→NULL are changes, NULL→NULL is not). Ties on ``ts`` are broken
    by the attribute tuple so re-runs are deterministic.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc_nulls_first() for c in attr_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)

    def apply(df: DataFrame) -> DataFrame:
        changed = F.lit(False)
        for c in attr_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        # first observation per key: lag(ts) is NULL -> always a change point
        changed = changed | F.lag(ts_col).over(w).isNull()
        points = df.withColumn("_chg", changed).filter(F.col("_chg"))
        return (
            points.withColumn("effective_to", F.lead(ts_col).over(w))
            .select(
                key_col,
                *attr_cols,
                F.col(ts_col).alias("effective_from"),
                "effective_to",
                F.col("effective_to").isNull().alias("is_current"),
            )
        )

    return apply


def changes_to_scd2_sql(
    table: str, key_col: str, ts_col: str, attr_cols: list[str]
) -> str:
    """DuckDB rendering of :func:`changes_to_scd2` (same NULL-safe change
    predicate via IS DISTINCT FROM, same tie-break ordering)."""
    attrs = ", ".join(attr_cols)
    order = f"{ts_col}, " + ", ".join(f"{c} NULLS FIRST" for c in attr_cols)
    chg = " OR ".join(
        f"({c} IS DISTINCT FROM lag({c}) OVER w)" for c in attr_cols
    )
    return f"""
WITH marked AS (
  SELECT {key_col}, {attrs}, {ts_col},
         ({chg} OR lag({ts_col}) OVER w IS NULL) AS chg
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {order})
),
points AS (SELECT * FROM marked WHERE chg)
SELECT {key_col}, {attrs},
       {ts_col} AS effective_from,
       lead({ts_col}) OVER w2 AS effective_to,
       (lead({ts_col}) OVER w2 IS NULL) AS is_current
FROM points
WINDOW w2 AS (PARTITION BY {key_col} ORDER BY {order})
"""
