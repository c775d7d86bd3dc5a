"""Battery-wide driver-gate compatibility guards.

The driver's CORRECTNESS gate canonicalizes each query's output with
pandas ``sort_values`` + hash; array/struct/map cells are unhashable there
(CORRECTNESS_r06: ``embedding_quantize_int8`` red with ``unhashable
type: 'list'``). These tests pin the contract battery-wide so a new query
can't reintroduce the failure mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry_mod


def test_every_query_has_scalar_only_output_schema(spark, sf_dir):
    """No queries() entry may ship an array/struct/map-typed output column
    — the driver gate cannot hash them. Schema is checked via plan
    analysis only (no job is run)."""
    bad: dict[str, list[str]] = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        f"queries with driver-unhashable output columns: {bad}; serialize "
        "them (F.array_join / array_to_string) in the final projection"
    )


def test_queries_and_oracles_align():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    # every oracle refers to a real query, and (current battery policy)
    # every query is oracle-gated — a rows-only entry needs an explicit
    # waiver here.
    assert set(oracles) <= set(qs)
    waived: set[str] = set()
    assert set(qs) - set(oracles) == waived


def test_window_holds_all_head_entries():
    """_HEAD defines the driver's 50-entry correctness window; it must
    reference only real queries and fit the window."""
    qs = entry_mod.queries()
    missing = [n for n in entry_mod._HEAD if n not in qs]
    assert not missing, f"_HEAD references unknown queries: {missing}"
    assert len(entry_mod._HEAD) <= 50, "window overflow: first 50 only"
    stale_tail = [n for n in entry_mod._TAIL if n not in qs]
    assert not stale_tail, f"_TAIL references unknown queries: {stale_tail}"


def test_tail_freshness_invariant():
    """Rotation contract as a test (VERDICT r7 #7): no battery entry may go
    >= 2 recorded rounds without either a driver CORRECTNESS row (all three
    matches green) or a committed tools/check_oracle.py sweep entry
    (tools/sweep_log.json). Entries in the current _HEAD are scheduled for
    the imminent gate run and pass by construction."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    last_green: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rno = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rno)
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last_green[name] = max(last_green.get(name, -1), rno)
    sweep_path = os.path.join(repo, "tools", "sweep_log.json")
    if os.path.exists(sweep_path):
        with open(sweep_path) as fh:
            for entry in json.load(fh):
                for name in entry["queries"]:
                    last_green[name] = max(
                        last_green.get(name, -1), int(entry["round"])
                    )
    assert rounds, "no CORRECTNESS_r*.json committed — cannot check freshness"
    latest = max(rounds)
    head = set(entry_mod._HEAD)
    stale = {
        name: last_green.get(name)
        for name in entry_mod.queries()
        if name not in head and last_green.get(name, -1) < latest - 1
    }
    assert not stale, (
        f"battery entries unverified since round {latest - 1} and not in the "
        f"current gate window: {stale} — rotate them into _HEAD or record a "
        f"check_oracle.py --log-sweep run"
    )


def test_battery_steady_state_regime():
    """Post-drain steady state (VERDICT r13 #3, COVERAGE.md 'Battery
    steady-state regime'): with the staged backlog at 0 the battery is
    CAPPED at 186 entries — a new entry enters only by the one-in/
    one-out trade (a retirement funds it) — and the 50-slot gate window
    is a pure rotation: every entry must hold a green HARD-GATE
    CORRECTNESS row within the last 5 recorded rounds or sit in the
    current _HEAD (sweeps keep per-round freshness, the gate keeps the
    independent driver-side audit; 186/50 -> a full rotation every 4
    rounds, so 5 is one round of slack)."""
    import glob
    import json
    import os
    import re

    qs = entry_mod.queries()
    assert len(qs) <= 186, (
        f"battery grew past the steady-state cap: {len(qs)} > 186 — a new "
        "entry needs a funding retirement (RETIRED_QUERIES, one-in/one-out)"
    )

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    last_gate: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rno = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rno)
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last_gate[name] = max(last_gate.get(name, -1), rno)
    latest = max(rounds)
    head = set(entry_mod._HEAD)
    gate_stale = {
        name: last_gate.get(name)
        for name in qs
        if name not in head and last_gate.get(name, -1) < latest - 4
    }
    assert not gate_stale, (
        f"battery entries without a hard-gate CORRECTNESS row since round "
        f"{latest - 4} and not in the current gate window: {gate_stale} — "
        "the rotation fell behind; schedule them into _HEAD"
    )
