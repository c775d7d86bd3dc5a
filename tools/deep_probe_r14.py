"""Round-14 deep probes (VERDICT r13 #5): extend the 1x/10x/100x
deep-probe ledger to the two heaviest r14-wave registrations that rode
unit pins through their gating round — following the r13 discipline
(measured rungs + the SinglePartition assert on every rung + an
adversarial shape aimed at the operator's stated bound).

Probe A — ``operators.timeseries.markov_removal_attribution`` (battery
``markov_attribution_channels``, 2.6 s isolated r13 floor). Claim
under test: SESSION VOLUME ONLY TOUCHES THE COUNT FOLD — the one
map-side-combinable groupBy over raw transitions; everything after
(20 value-iteration steps x all removal scenarios) runs on the bounded
(channels+3)^2 grid, independent of row count. Transition shape: 12
channels + the 3 reserved markers; every (src, dst) cell count is an
EXACT function of ``pmod(id, 252)`` and the rung size is a multiple of
252, so the ppm transition matrix — and therefore the full attribution
readout — must be BIT-IDENTICAL across 100k -> 1M -> 10M raw
transitions while only the fold scales. The probe asserts that
bit-equality (the strongest possible form of "volume only touches the
fold") plus monotone nonnegative removal effects.

Probe B — ``graph.adamic_adar_topk`` (battery ``adamic_adar_parts``,
1.65 s r13 floor). Claim under test: the ``max_center_degree`` cap
bounds the wedge self-join at C(cap, 2) per key — a HUB hotter than
the cap leaves the scoring domain entirely, generating ZERO wedges
(the hot-shingle discipline). Graph shape per rung (100k -> 1M -> 10M
edges): one hub carrying 10% of all edges (degree 10k/100k/1M — a
naive wedge join would emit C(deg, 2) ~ 5x10^11 pairs at the top
rung), a band of exactly-at-cap centers (deg = 64, each legally
emitting C(64,2) = 2016 wedges), and disjoint 3-leaf stars (3 wedges
each, the top-scoring pairs at round(1e6/ln 3) = 910239 micro). All
leaves are distinct, so the exact pair census is
``3*n_star + 2016*n_cap`` — asserted exactly at the 1x/10x rungs via
the top_k parameterization (census + 10 rows requested, census rows
returned proves zero hub leakage); at the 100x rung the census frame
is driver-side-prohibitive by design, so the probe asserts the exact
top-50 readout (all star pairs, aa_micro = 910239, common = 1) and
the wall ratio carries the bound evidence.

Usage: python tools/deep_probe_r14.py   (markdown rows for SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

N_CHANNELS = 12
CYCLE = 252  # (src, dst) cell is an exact function of pmod(id, 252)


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def synth_transitions(spark, n_rows: int):
    """One row per observed transition; the (src, dst) cell depends only
    on pmod(id, 252): k<72 start->channel, k<216 channel->channel,
    k<240 channel->_CONV_, else channel->_NULL_. n_rows a multiple of
    252 => exact 10x cell scaling between rungs."""
    assert n_rows % CYCLE == 0
    k = F.pmod(F.col("id"), F.lit(CYCLE))
    ch = lambda e: F.concat(F.lit("c"), e.cast("string"))  # noqa: E731
    src = (
        F.when(k < 72, F.lit("_START_"))
        .otherwise(ch(F.pmod(k, F.lit(N_CHANNELS))))
    )
    dst = (
        F.when(k < 72, ch(F.pmod(k, F.lit(N_CHANNELS))))
        .when(k < 216, ch(F.pmod(k * 7 + 5, F.lit(N_CHANNELS))))
        .when(k < 240, F.lit("_CONV_"))
        .otherwise(F.lit("_NULL_"))
    )
    return (
        spark.range(n_rows)
        .repartition(32)
        .select(src.alias("src"), dst.alias("dst"))
    )


def probe_markov(spark, n_rows: int):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_removal_attribution,
    )

    tr = synth_transitions(spark, n_rows)
    t0 = time.time()
    out = markov_removal_attribution(tr)
    rows = sorted(map(tuple, out.collect()))
    wall = time.time() - t0
    return wall, rows, single_partition_exchanges(out)


STAR_AA = 910239  # round(1e6 / ln 3)
CAP = 64
CAP_AA = 240448  # round(1e6 / ln 64)


def synth_hub_graph(spark, n_edges: int):
    """(u, v) u < v, no duplicates: hub 0 -> 10% of edges; n_cap
    at-cap centers (deg 64); the rest disjoint 3-leaf stars. Node id
    ranges are disjoint by construction (offsets), so every leaf has
    degree exactly 1 and the pair census is exact."""
    n_hub = n_edges // 10
    n_cap = n_edges // 1000
    n_star = (n_edges - n_hub - CAP * n_cap) // 3
    base = 10 + n_hub  # first id after the hub block
    hub = spark.range(n_hub).select(
        F.lit(0).cast("long").alias("u"),
        (F.col("id") + 10).alias("v"),
    )
    cap = spark.range(n_cap * CAP).select(
        (F.lit(base) + F.col("id") / CAP).cast("long").alias("u_ctr"),
        (F.lit(base + n_cap) + F.col("id")).alias("leaf"),
    ).select(
        F.least("u_ctr", "leaf").alias("u"),
        F.greatest("u_ctr", "leaf").alias("v"),
    )
    base2 = base + n_cap + n_cap * CAP
    star = spark.range(n_star * 3).select(
        (F.lit(base2) + F.col("id") / 3).cast("long").alias("ctr"),
        (F.lit(base2 + n_star) + F.col("id")).alias("leaf"),
    ).select(
        F.least("ctr", "leaf").alias("u"),
        F.greatest("ctr", "leaf").alias("v"),
    )
    edges = hub.unionAll(cap).unionAll(star).repartition(32)
    return edges, n_cap, n_star, base2 + n_star


def probe_adamic_adar(spark, n_edges: int, census: bool):
    from dwh_etl_ods_spark_jobs_spark.graph import adamic_adar_topk

    edges, n_cap, n_star, star_leaf0 = synth_hub_graph(spark, n_edges)
    expected = 3 * n_star + 2016 * n_cap
    t0 = time.time()
    out = adamic_adar_topk(edges, top_k=50)
    top = out.collect()
    wall = time.time() - t0
    # exact top-50: all 3-leaf-star pairs, rarest-mutual-friend weight
    assert len(top) == 50 and all(
        r.aa_micro == STAR_AA and r.common_neighbors == 1 for r in top
    ), top[:3]
    assert all(r.node_a >= star_leaf0 for r in top), top[:3]
    n_census = None
    if census:
        n_census = adamic_adar_topk(edges, top_k=expected + 10).count()
        assert n_census == expected, (n_census, expected)  # zero hub wedges
    return wall, n_census, expected, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r14", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up

    print("| probe | rows | wall_s | out | SinglePartition |")
    print("|---|---|---|---|---|")
    walls, sps, outs = [], [], []
    for n in (100_800, 1_008_000, 10_080_000):
        wall, rows, sp = probe_markov(spark, n)
        walls.append(wall)
        sps.append(sp)
        outs.append(rows)
        assert len(rows) == N_CHANNELS
        assert all(r[3] >= 0 for r in rows)  # removal effect nonneg
        print(f"| markov_removal_attribution | {n:,} | {wall:.1f} "
              f"| {len(rows)} channels, base {rows[0][1]} ppm | {sp} |")
    assert outs[0] == outs[1] == outs[2], "readout not volume-invariant"
    # SinglePartition exchanges live only on the bounded grid/anchor
    # frames; AQE coalesces MORE of them at the smallest rung (9 vs 2
    # observed), so the volume claim is "never grows with rows", not
    # exact equality across rungs.
    assert sps[-1] <= sps[0], f"SinglePartition grew with volume: {sps}"
    print(f"ratios: 10x {walls[1] / walls[0]:.1f}x, "
          f"100x {walls[2] / walls[0]:.1f}x; readout BIT-IDENTICAL "
          f"across rungs (volume touches only the count fold)")

    walls, sps = [], []
    for n in (100_000, 1_000_000, 10_000_000):
        wall, n_census, expected, sp = probe_adamic_adar(
            spark, n, census=(n <= 1_000_000)
        )
        walls.append(wall)
        sps.append(sp)
        cs = f"census {n_census:,}==" if n_census is not None else "expect "
        print(f"| adamic_adar_topk (hub 10% of edges) | {n:,} | {wall:.1f} "
              f"| {cs}{expected:,} pairs, top-50 exact | {sp} |")
    assert max(sps) == min(sps), f"SinglePartition drifted: {sps}"
    print(f"ratios: 10x {walls[1] / walls[0]:.1f}x, "
          f"100x {walls[2] / walls[0]:.1f}x; hub (deg {10_000_000 // 10:,}) "
          f"excluded by the center cap -> zero wedges")
    spark.stop()


if __name__ == "__main__":
    main()
