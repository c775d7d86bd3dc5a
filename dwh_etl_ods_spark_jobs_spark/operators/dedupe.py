"""Greatest-per-key deduplication.

The reference pushes this into every source query as a ``GROUP BY key ->
MAX(ID), MAX(cast(Created as date))`` derived table joined back to the fact
(e.g. reference ``Load CT Patients Job/src/main/resources/LoadSourceCTPatients.sql:10-17``,
``Load MNCH Heis/src/main/resources/LoadMNCHHeis.sql:5-8``). A window top-1 is
the idiomatic Spark equivalent: one shuffle on the natural key instead of an
aggregate + self-join (two shuffles + one join), and Catalyst plans it as a
single WindowGroupLimit at the scan when possible.

Scale note: partitions by the natural key — the same key the downstream
anti-join shuffles on, so AQE can reuse the exchange. Skewed keys are handled
by AQE skew-join config; the window itself is per-key linear.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe_latest(
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> "callable":
    """Keep exactly one row per ``keys``: the first under ``order_by``.

    ``order_by`` should list tie-broken descending order columns, e.g.
    ``[F.col("Created").desc(), F.col("ID").desc()]`` to reproduce the
    reference's MAX(date)-then-MAX(ID) selection.
    """
    order_cols = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]

    def _apply(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_cols)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    return _apply


def dedupe_latest_agg(
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> "callable":
    """Hash-aggregate form of :func:`dedupe_latest`: ``max_by(struct(*), 
    struct(order_cols))`` per key.

    Same semantics when ``order_cols`` is a deterministic (tie-free
    per key, e.g. ending in a unique ID) DESC ordering. The scale
    tradeoff vs the window form: a HashAggregate with map-side partials —
    no per-partition sort — at the cost of carrying whole rows through the
    aggregation buffer. Prefer this form when rows are narrow or the
    dedupe ratio is high (map-side combine drops duplicates early); prefer
    the window form when rows are wide and duplicates are rare.
    """

    def _apply(df: DataFrame) -> DataFrame:
        data_cols = df.columns
        ranked = F.struct(*[F.col(c) for c in order_cols])
        row = F.struct(*[F.col(c) for c in data_cols])
        out = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.max_by(row, ranked).alias("__row")
        )
        return out.select(*[F.col(f"__row.{c}").alias(c) for c in data_cols])

    return _apply
