"""Oracle parity for the r8-STAGED battery queries (plans/staged.py).

Runs the exact driver-gate comparison (sorted-column value equality) on
every staged entry at sf0.001, and pins the hard gate's scalar-output
rule — so r8 registration is pure wiring with zero correctness risk.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_etl_ods_spark_jobs_spark.plans import staged

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


@pytest.mark.parametrize("name", sorted(staged.STAGED_QUERIES))
def test_staged_query_matches_duckdb(spark, sf_dir, name):
    con = _connect(sf_dir)
    sdf = staged.STAGED_QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.execute(staged.STAGED_ORACLES[name]).df()
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in ddf.columns]
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} != {len(ddf)}"
    ddf.columns = list(sdf.columns)
    # hard-gate scalar rule: no array/struct cells anywhere
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


def test_staged_names_registered_in_battery():
    """r8 flipped the invariant: every staged entry IS registered in the
    live battery, bound to the SAME callable/SQL (no shadow copy drift),
    and the registration overwrote nothing (battery grew by exactly the
    staged count)."""
    import __spark_entry__ as entry_mod

    live_q, live_o = entry_mod.queries(), entry_mod.oracle_sql()
    for name, fn in staged.STAGED_QUERIES.items():
        assert live_q.get(name) is fn, f"{name}: not registered (or rebound)"
        assert live_o.get(name) == staged.STAGED_ORACLES[name], name


def test_staged_oracle_keys_align():
    assert set(staged.STAGED_QUERIES) == set(staged.STAGED_ORACLES)


def test_tpch_staged_plans_broadcast_dims(spark, sf_dir):
    """The TPC-H shapes must broadcast every dimension: the only
    exchanges left are the fact-side group-by (and AQE reads), never a
    SortMergeJoin against a dim table."""
    # tpch_q10_returns is battery-retired (⊂ Q3's plan shape) but its
    # broadcast discipline stays pinned here.
    allq = {**staged.STAGED_QUERIES, **staged.RETIRED_QUERIES}
    for name in ("tpch_q3_priority", "tpch_q5_local_volume", "tpch_q10_returns"):
        plan = (
            allq[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


@pytest.mark.parametrize(
    "name",
    ["chi2_lang_source", "k_anonymity_census", "snapshot_diff_orders",
     "bpe_train_merges", "dedup_incremental_lsh"],
)
def test_staged_results_invariant_under_repartition(spark, sf_dir, name, monkeypatch):
    """Physical layout must never leak into results: the same staged query
    over inputs forced through a 7-way repartition hashes identically.
    (Battery-retired members of the list keep the property via their
    RETIRED_QUERIES binding — retirement removes the driver slot, not
    the invariant.)"""
    import dwh_etl_ods_spark_jobs_spark.plans.staged as staged_mod

    q = {**staged_mod.RETIRED_QUERIES, **staged_mod.STAGED_QUERIES}[name]
    base = q(spark, sf_dir).toPandas()

    orig_t = staged_mod._t
    monkeypatch.setattr(
        staged_mod, "_t",
        lambda spark_, sf, tbl: orig_t(spark_, sf, tbl).repartition(7),
    )
    shuffled = q(spark, sf_dir).toPandas()

    key = sorted(base.columns)
    b = base[key].sort_values(key, na_position="first").reset_index(drop=True)
    s = shuffled[key].sort_values(key, na_position="first").reset_index(drop=True)
    assert b.equals(s), name


def test_tpch_self_join_scans_lineitem_once(spark, sf_dir):
    """Q17/Q18 join lineitem to an aggregate of itself; the fact table must
    be scanned at most once per query (Q17: shared slice localCheckpointed;
    Q18: the agg is the only lineitem reference) — VERDICT r7 #4."""
    # Q17 is battery-retired (r11) but keeps the plan property through
    # its RETIRED_QUERIES binding.
    both = {**staged.RETIRED_QUERIES, **staged.STAGED_QUERIES}
    for name in ("tpch_q17_small_qty", "tpch_q18_big_orders"):
        plan = (
            both[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_scans = plan.count("lineitem.parquet")
        assert n_scans <= 1, f"{name}: {n_scans} lineitem scans in plan"
