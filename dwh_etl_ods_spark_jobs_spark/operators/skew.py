"""Skew-mitigation operators: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in :mod:`..session`) handles most skew
at runtime; these operators are the explicit fallback for the two cases AQE
does not cover well at 100 TB:

- a groupBy whose hot key overwhelms a single reducer even after partition
  splitting (``salted_agg``: two-phase aggregate via a synthetic salt);
- a broadcast-ineligible join against a relation with a handful of hot keys
  (``salted_join``: explode the small side per salt so hot keys spread
  across ``n_salts`` reducers).

The salt is ``pmod(hash(random-ish but DETERMINISTIC cols), n)`` — derived
from stable row content, never ``rand()``, so retries/speculative tasks
stay consistent (a ``rand()`` salt breaks exactly-once under task retry).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt_from: Sequence[str], n_salts: int) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) hashed from ``salt_from``
    columns (pick high-cardinality ones uncorrelated with the group key)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot group keys.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    sum/count/min/max (the re-aggregatable functions; avg must be decomposed
    by the caller into sum+count). Phase 1 aggregates per (group, salt) —
    spreading a hot key over ``n_salts`` reducers — phase 2 merges the
    partials. Equivalent to a plain groupBy for these functions.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for out, (col, fn) in aggs.items():
        if fn not in fns:
            raise ValueError(f"salted_agg: non-reaggregatable fn {fn!r} for {out!r}")
    phase1 = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*group_cols, SALT_COL)
        .agg(*[fns[fn](col).alias(out) for out, (col, fn) in aggs.items()])
    )
    return phase1.groupBy(*group_cols).agg(
        *[merge[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side deterministically and
    replicate the small side once per salt value, then join on
    (keys + salt). Hot keys on the big side spread over ``n_salts``
    partitions; the small side grows ``n_salts``× (it must still be small —
    this is for when it exceeds the broadcast threshold but a hot key melts
    a sort-merge join).
    """
    if how not in ("inner", "left", "left_semi", "leftsemi"):
        # right/full would duplicate unmatched small-side rows once per salt
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_cols = list(salt_from) if salt_from else list(big.columns)
    b = with_salt(big, salt_cols, n_salts)
    s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, on=[*on, SALT_COL], how=how)
    return out.drop(SALT_COL)
