"""Oracle parity for the r9-STAGED battery queries (plans/staged_r9.py) —
the exact driver-gate comparison + scalar-output rule, so r9 registration
is pure wiring (same contract as tests/test_staged_surfaces.py)."""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_etl_ods_spark_jobs_spark.plans import staged_r9

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


@pytest.mark.parametrize("name", sorted(staged_r9.STAGED_QUERIES))
def test_staged_r9_query_matches_duckdb(spark, sf_dir, name):
    con = _connect(sf_dir)
    sdf = staged_r9.STAGED_QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.execute(staged_r9.STAGED_ORACLES[name]).df()
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


def test_staged_r9_names_registered_and_gated():
    """r9 registration executed (VERDICT r8 #1): every staged_r9 entry is
    live in the battery, bound to the same callable/SQL. (The one-time
    in-window assertion applied only to the r9 gating round — all 19 got
    green CORRECTNESS_r09 rows; the r10 rotation moved them to _TAIL, as
    the rotation contract requires.)"""
    import __spark_entry__ as entry_mod

    live_q, live_o = entry_mod.queries(), entry_mod.oracle_sql()
    for name, fn in staged_r9.STAGED_QUERIES.items():
        assert live_q.get(name) is fn, f"{name}: not registered (or rebound)"
        assert live_o.get(name) == staged_r9.STAGED_ORACLES[name], name


def test_staged_r9_oracle_keys_align():
    assert set(staged_r9.STAGED_QUERIES) == set(staged_r9.STAGED_ORACLES)


@pytest.mark.parametrize("depth", [3, 17])
def test_hybrid_rerank_depth_is_a_parameter(spark, sf_dir, depth):
    """Candidate depth threads through BOTH engines (VERDICT r8 #6): the
    Spark query and the SQL rendering take k_candidates explicitly, so
    parity holds at depths other than the module default BM25_TOPK."""
    con = _connect(sf_dir)
    sdf = staged_r9.q_hybrid_retrieval(spark, sf_dir, k_candidates=depth).toPandas()
    ddf = con.execute(staged_r9._sql_hybrid(k_candidates=depth)).df()
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in ddf.columns]
    assert len(sdf) == len(ddf)
    ddf.columns = list(sdf.columns)
    key = list(sdf.columns)
    s = sdf.sort_values(key, na_position="first").reset_index(drop=True)
    d = ddf.sort_values(key, na_position="first").reset_index(drop=True)
    s = s.astype(d.dtypes.to_dict())
    assert s.equals(d)


def test_rank_queries_use_range_partitioning_not_global_sort(spark, sf_dir):
    """The binning/RFM queries must rank via the range-repartition
    decomposition — RangePartitioning present, and the only
    single-partition exchanges feed the tiny offsets/anchor frames, never
    a Window over the data (no Sort+Window directly under an
    Exchange SinglePartition of the fact)."""
    for name in ("quantile_binning_census", "rfm_quintile_features"):
        plan = (
            staged_r9.STAGED_QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "rangepartitioning" in plan.lower(), name
