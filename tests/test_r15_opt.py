"""Round-15 optimization-round tests: scale guards and invariants added
while tuning existing operators (no new query surfaces)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- markov driver-side bound (VERDICT r14 "What's wrong #4") ----------------

def test_markov_from_counts_rejects_unbounded_state_domain(spark):
    """The driver-side value iteration is O(states^3 * iterations); the
    bounded-state contract is now enforced, not just documented — a caller
    feeding a high-cardinality domain (e.g. user ids as channels) fails
    fast instead of collecting O(C^2) cells."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        _MARKOV_MAX_STATES,
        markov_attribution_from_counts,
    )

    n = _MARKOV_MAX_STATES + 8
    grid = spark.range(n).select(
        F.lit("_START_").alias("_s"),
        F.concat(F.lit("u"), F.col("id")).alias("_d"),
        F.lit(1).alias("_c"),
    )
    with pytest.raises(ValueError, match="distinct journey states"):
        markov_attribution_from_counts(grid, iterations=2)


def test_markov_from_counts_rejects_oversized_grid(spark):
    """The cell guard bounds what the collect can ever pull to the driver
    (limit(max_cells + 1)) — a quadratic grid trips it before the state
    census is even built."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        _MARKOV_MAX_STATES,
        markov_attribution_from_counts,
    )

    side = _MARKOV_MAX_STATES + 2
    cells = (
        spark.range(side)
        .select(F.concat(F.lit("s"), F.col("id")).alias("_s"))
        .crossJoin(
            spark.range(side).select(F.concat(F.lit("d"), F.col("id")).alias("_d"))
        )
        .withColumn("_c", F.lit(1))
    )
    with pytest.raises(ValueError, match="transition grid exceeds"):
        markov_attribution_from_counts(cells, iterations=2)


def test_markov_from_counts_small_grid_unchanged(spark):
    """In-bound domains still compute the exact same attribution (guard is
    a no-op below the cap)."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_attribution_from_counts,
    )

    rows = [
        ("_START_", "a", 2),
        ("a", "_CONV_", 1),
        ("a", "_NULL_", 1),
    ]
    grid = spark.createDataFrame(rows, "_s string, _d string, _c int")
    out = {r.channel: r for r in markov_attribution_from_counts(grid, 8).collect()}
    assert set(out) == {"a"}
    assert out["a"].base_conv_ppm == 500_000
    assert out["a"].removed_conv_ppm == 0
    assert out["a"].attribution_ppm == 1_000_000
