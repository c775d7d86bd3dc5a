"""Oracle parity for the r15-STAGED battery queries (plans/staged_r15.py)
— the exact driver-gate comparison + scalar-output rule, so r15
registration is pure wiring (same contract as
tests/test_staged_r13_surfaces.py)."""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_etl_ods_spark_jobs_spark.plans import staged_r15

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


@pytest.mark.parametrize("name", sorted(staged_r15.STAGED_QUERIES))
def test_staged_r15_query_matches_duckdb(spark, sf_dir, name):
    con = _connect(sf_dir)
    sdf = staged_r15.STAGED_QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.execute(staged_r15.STAGED_ORACLES[name]).df()
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


def test_staged_r15_names_registered_and_gated():
    """r14 registration executed (VERDICT r13 #1): every staged_r15 entry
    is live in the battery, bound to the same callable/SQL, AND inside
    the driver's 50-slot gate window (one-time in-window assertion for
    the r14 gating round — relax to registered-only after the r15
    rotation, as the r9-r14 tests did)."""
    import __spark_entry__ as entry_mod

    live_q, live_o = entry_mod.queries(), entry_mod.oracle_sql()
    window = set(list(live_q)[:50])
    for name, fn in staged_r15.STAGED_QUERIES.items():
        assert live_q.get(name) is fn, f"{name}: not registered (or rebound)"
        assert live_o.get(name) == staged_r15.STAGED_ORACLES[name], name
        assert name in window, (
            f"{name}: outside the r14 gate window (staged_r15)"
        )


def test_staged_r15_oracle_keys_align():
    assert set(staged_r15.STAGED_QUERIES) == set(staged_r15.STAGED_ORACLES)


def _plan(spark, sf_dir, name: str) -> str:
    return (
        staged_r15.STAGED_QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )

