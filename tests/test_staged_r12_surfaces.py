"""Oracle parity for the r12-STAGED battery queries (plans/staged_r12.py)
— the exact driver-gate comparison + scalar-output rule, so r12
registration is pure wiring (same contract as
tests/test_staged_r11_surfaces.py)."""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_etl_ods_spark_jobs_spark.plans import staged_r12

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


@pytest.mark.parametrize("name", sorted(staged_r12.STAGED_QUERIES))
def test_staged_r12_query_matches_duckdb(spark, sf_dir, name):
    con = _connect(sf_dir)
    sdf = staged_r12.STAGED_QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.execute(staged_r12.STAGED_ORACLES[name]).df()
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


def test_staged_r12_names_registered_and_gated():
    """r12 registration executed (VERDICT r11 #1): every staged_r12 entry
    is live in the battery and bound to the same callable/SQL (the
    one-time in-window assertion was relaxed to registered-only at the
    r13 rotation, as the r9-r11 tests did — freshness is now owned by
    test_entry_contract.py::test_tail_freshness_invariant)."""
    import __spark_entry__ as entry_mod

    live_q, live_o = entry_mod.queries(), entry_mod.oracle_sql()
    for name, fn in staged_r12.STAGED_QUERIES.items():
        assert live_q.get(name) is fn, f"{name}: not registered (or rebound)"
        assert live_o.get(name) == staged_r12.STAGED_ORACLES[name], name


def test_staged_r12_oracle_keys_align():
    assert set(staged_r12.STAGED_QUERIES) == set(staged_r12.STAGED_ORACLES)


def _plan(spark, sf_dir, name: str) -> str:
    return (
        staged_r12.STAGED_QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_corr_matrix_is_one_scan_one_aggregate(spark, sf_dir):
    """The whole 6-pair matrix must come from ONE pass: a single
    lineitem scan, no join, no window — the pair fan-out is a literal
    projection on the one aggregated row."""
    plan = _plan(spark, sf_dir, "corr_matrix_onepass")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_repetition_census_has_no_explode(spark, sf_dir):
    """dup_ngram_ppm is pure expression arithmetic over the token
    array — a Generate (explode) in the plan would mean the n-gram
    multiset got materialized row-wise."""
    plan = _plan(spark, sf_dir, "intra_doc_repetition")
    assert "Generate" not in plan
    assert plan.count("FileScan parquet") == 1


def test_edit1_linkage_joins_are_equi_joins(spark, sf_dir):
    """The deletion-neighborhood candidate join must be a hash/merge
    EQUI-join on the posting key; the only nested-loop allowed is the
    one-row census-anchor attach."""
    plan = _plan(spark, sf_dir, "edit1_name_linkage")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "IdentityBroadcastMode"
    )


def test_cms_join_size_never_joins_rows(spark, sf_dir):
    """Both arms stay aggregated: the sketch arm joins two ≤4096-cell
    grids, the exact arm joins per-key COUNTS — no row-level join, no
    cartesian anywhere."""
    plan = _plan(spark, sf_dir, "cms_join_size_estimate")
    assert "CartesianProduct" not in plan
    # every join in the plan is either an equi-join or a 1-row anchor
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count(
        "IdentityBroadcastMode"
    )
