"""Global plan-invariant sweep: build the physical plan of EVERY battery
query (plus every staged wave) at sf0.001 and enforce the scale
discipline mechanically:

- no CartesianProduct, ever;
- every BroadcastNestedLoopJoin is a one-row IdentityBroadcastMode
  scalar anchor (never a data-side nested loop);
- no non-deterministic rand()/randn()/uuid() expression in any plan.

This is the machine form of the anti-pattern audit the round verdicts
run by hand — a new query that degenerates to a cross join or smuggles
in nondeterminism fails HERE, before any gate sees it."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from dwh_etl_ods_spark_jobs_spark.plans import (
    staged_r11,
    staged_r12,
    staged_r13,
    staged_r14,
    staged_r15,
    staged_r16,
    staged_r17,
)


def _all_queries():
    qs = dict(entry_mod.queries())
    for mod in (staged_r11, staged_r12, staged_r13, staged_r14, staged_r15, staged_r16, staged_r17):
        for name, fn in mod.STAGED_QUERIES.items():
            qs[f"staged:{name}"] = fn
    return qs


_QUERIES = _all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_plan_respects_scale_invariants(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    bnlj = plan.count("BroadcastNestedLoopJoin")
    anchors = plan.count("IdentityBroadcastMode")
    assert bnlj <= anchors, (
        f"{name}: {bnlj} nested-loop joins but only {anchors} one-row anchors"
    )
    for bad in ("rand(", "randn(", "uuid()"):
        assert bad not in plan, f"{name}: nondeterministic {bad} in plan"


def test_no_forced_broadcast_of_sf_proportional_tables():
    """VERDICT r11 #3 (What's wrong #3), enforced mechanically: a forced
    ``F.broadcast`` hint in the plan layer is only allowed on frames
    with a BOUNDED contract — one-row anchors/totals, the month spine,
    the 25-row nation dim, per-event-type band frames, per-segment mean
    frames, a single query vector. TPC-H customer/supplier/part/orders/
    lineitem scale linearly with SF, so a forced hint on them exceeds
    any broadcast budget at 100x (it fails loudly, but the right plan is
    to let AQE decide — which still broadcasts at bench scale with zero
    perf cost). New hint targets must be added here WITH their bound."""
    import os
    import re

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dwh_etl_ods_spark_jobs_spark",
        "plans",
    )
    allowed = {
        "anchor",    # one-row global max-date anchor (staged_r10)
        "bands",     # per-event-type quantile bands, <= |event_type| rows (staged_r13)
        "horizon",   # one-row data-horizon frame (staged_r14/r15)
        "nat",       # nation dim: fixed 25 rows at every SF (staged)
        "qv",        # single query embedding vector, one row (staged_r9)
        "seg_mean",  # per-mktsegment means, 5 rows (staged_r14)
        "spine",     # bounded month spine (art_outcomes)
        "stats",     # one-row global stats fold (staged)
        "total",     # one-row corpus total (curation)
    }
    hits: dict[str, set[str]] = {}
    pat = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")
    for fname in sorted(os.listdir(plans_dir)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(plans_dir, fname)) as fh:
            for ident in pat.findall(fh.read()):
                hits.setdefault(ident, set()).add(fname)
    offenders = {k: sorted(v) for k, v in hits.items() if k not in allowed}
    assert not offenders, (
        f"forced F.broadcast on non-allowlisted frames: {offenders} — if the "
        "frame is bounded by contract, add it to the allowlist with its "
        "bound; if it scales with SF, drop the hint and let AQE decide"
    )
