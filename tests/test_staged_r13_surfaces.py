"""Oracle parity for the r13-STAGED battery queries (plans/staged_r13.py)
— the exact driver-gate comparison + scalar-output rule, so r13
registration is pure wiring (same contract as
tests/test_staged_r12_surfaces.py)."""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_etl_ods_spark_jobs_spark.plans import staged_r13

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


@pytest.mark.parametrize("name", sorted(staged_r13.STAGED_QUERIES))
def test_staged_r13_query_matches_duckdb(spark, sf_dir, name):
    con = _connect(sf_dir)
    sdf = staged_r13.STAGED_QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.execute(staged_r13.STAGED_ORACLES[name]).df()
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


def test_staged_r13_names_registered_and_gated():
    """r12 DOUBLE-wave registration (VERDICT r11 #1): staged_r13 entered
    the battery alongside staged_r12; every entry is bound to the same
    callable/SQL (the one-time in-window assertion for the r12
    double-wave gate window was relaxed to registered-only at the r13
    rotation; freshness is owned by
    test_entry_contract.py::test_tail_freshness_invariant)."""
    import __spark_entry__ as entry_mod

    live_q, live_o = entry_mod.queries(), entry_mod.oracle_sql()
    for name, fn in staged_r13.STAGED_QUERIES.items():
        assert live_q.get(name) is fn, f"{name}: not registered (or rebound)"
        assert live_o.get(name) == staged_r13.STAGED_ORACLES[name], name


def test_staged_r13_oracle_keys_align():
    assert set(staged_r13.STAGED_QUERIES) == set(staged_r13.STAGED_ORACLES)


def _plan(spark, sf_dir, name: str) -> str:
    return (
        staged_r13.STAGED_QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_rendezvous_churn_is_scan_shaped(spark, sf_dir):
    """Assignment is a per-row expression: no join, no window — the only
    exchange is the final one-row fold."""
    plan = _plan(spark, sf_dir, "rendezvous_shard_churn")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("FileScan parquet") == 1


def test_salted_topk_windows_are_salt_bounded(spark, sf_dir):
    """The phase-1 (inner) window must partition by (group, salt), and
    every WindowGroupLimit Spark injects must carry the row_number k
    pushdown — the plan that loses either has lost the skew bound.
    (On Spark ≥3.5 WindowGroupLimit already ships ≤k rows per group per
    mapper even for the naive form; the salted phase keeps the bound
    explicit and portable — both shapes must coexist in this plan.)"""
    plan = _plan(spark, sf_dir, "salted_topk_per_type")
    assert "windowspecdefinition(event_type" in plan
    assert "_salt" in plan.split("WindowGroupLimit")[-1] or any(
        "_salt" in seg.split("\n")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    )
    assert "WindowGroupLimit" in plan  # the rank-limit pushdown survived


def test_merkle_diff_joins_ship_digests_not_payloads(spark, sf_dir):
    """The bucket summaries join on (bucket); the row-level join carries
    (bucket, key, 32-char hash) only — no order payload column may
    survive into any join operator."""
    plan = _plan(spark, sf_dir, "merkle_bucket_diff")
    for line in plan.split("\n"):
        if "Join" in line:
            assert "o_totalprice" not in line and "o_orderdate" not in line
    assert "CartesianProduct" not in plan
