"""Oracle parity for the r11-STAGED battery queries (plans/staged_r11.py)
— the exact driver-gate comparison + scalar-output rule, so r11
registration is pure wiring (same contract as
tests/test_staged_r10_surfaces.py)."""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_etl_ods_spark_jobs_spark.plans import staged_r11

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize("name", sorted(staged_r11.STAGED_QUERIES))
def test_staged_r11_query_matches_duckdb(spark, sf_dir, name):
    con = _connect(sf_dir)
    sdf = staged_r11.STAGED_QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.execute(staged_r11.STAGED_ORACLES[name]).df()
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in ddf.columns]
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} != {len(ddf)}"
    ddf.columns = list(sdf.columns)
    for c in sdf.columns:
        assert not sdf[c].map(
            lambda v: isinstance(v, (list, tuple, dict))
            or type(v).__name__ == "ndarray"
        ).any(), f"{name}.{c}: non-scalar output cell (driver gate would crash)"
    key = list(sdf.columns)
    s = sdf.sort_values(key, na_position="first").reset_index(drop=True)
    d = ddf.sort_values(key, na_position="first").reset_index(drop=True)
    s = s.astype(d.dtypes.to_dict())
    assert s.equals(d), f"{name}: value mismatch\n{s.head()}\n{d.head()}"


def test_staged_r11_names_registered():
    """r11 registration executed (VERDICT r10 #1); the one-time in-window
    assertion was relaxed to registered-only after the r12 rotation (the
    r11 entries hold CORRECTNESS_r11 green rows and now rotate through
    the tail like the r9/r10 blocks)."""
    import __spark_entry__ as entry_mod

    live_q, live_o = entry_mod.queries(), entry_mod.oracle_sql()
    for name, fn in staged_r11.STAGED_QUERIES.items():
        assert live_q.get(name) is fn, f"{name}: not registered (or rebound)"
        assert live_o.get(name) == staged_r11.STAGED_ORACLES[name], name


def test_staged_r11_oracle_keys_align():
    assert set(staged_r11.STAGED_QUERIES) == set(staged_r11.STAGED_ORACLES)


def test_auc_and_calibration_use_range_partitioning(spark, sf_dir):
    """The AUC/calibration queries rank via the range-repartition
    decomposition.  The range exchange itself sits BEHIND the
    localCheckpoint lineage cut (it shows as ``Scan ExistingRDD`` in the
    final plan — same physiology as operators/rank.py), so the pin
    asserts the visible invariants: the checkpoint boundary exists, the
    prefix-sum Window over the data frame is partitioned by the range
    id ``_pid`` (never an unpartitioned Window over the data), the
    offsets frame attaches via broadcast, and nothing degenerates to a
    cartesian/nested-loop join."""
    # calibration_price_returns retired r14 (RETIRED_QUERIES) but keeps
    # its plan-shape pin — the range-rank physiology it exercises is the
    # shared calibration_bins path.
    for name, reg in (
        ("auc_price_returns", staged_r11.STAGED_QUERIES),
        ("calibration_price_returns", staged_r11.RETIRED_QUERIES),
    ):
        plan = (
            reg[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Scan ExistingRDD" in plan, name  # checkpointed range frame
        assert "windowspecdefinition(_pid" in plan, name  # bounded prefix
        assert "BroadcastHashJoin" in plan, name  # offsets broadcast
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_pair_distance_histogram_broadcasts_count_anchor(spark, sf_dir):
    """The bucket self-join is a broadcast HASH join on the bucket key;
    the global-count anchor attaches as a one-row IdentityBroadcastMode
    broadcast (Spark's scalar-attach shape — a nested-loop against a
    single-row build side is O(n), not a pair blowup).  Every
    BroadcastNestedLoopJoin in the plan must be one of those one-row
    anchors, and nothing may degenerate to a CartesianProduct."""
    plan = (
        staged_r11.STAGED_QUERIES["embedding_distance_histogram"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # each nested-loop is a 1-row scalar anchor, never a data-side loop
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "IdentityBroadcastMode"
    )


def test_ohlc_is_single_aggregation_no_window(spark, sf_dir):
    """ohlc must stay ONE hash aggregation with map-side partials —
    no Window (the per-key sorted-window formulation it replaces) and
    no sort before the aggregate."""
    plan = (
        staged_r11.STAGED_QUERIES["ohlc_daily_value"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    body = plan.split("AdaptiveSparkPlan")[-1]
    # the only Sort allowed is the final presentation ORDER BY
    assert "Window" not in body
    assert "partial_min" in body or "partial" in body  # map-side combine
