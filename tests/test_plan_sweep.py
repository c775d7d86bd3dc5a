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
