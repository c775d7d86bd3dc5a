"""Round-14 exploration: markov_attribution_from_counts variants.

The battery query's heavy stage is the transition-count fold (data-sized,
one map-side-combinable groupBy); everything after runs on the BOUNDED
(channels+3)^2 journey grid, yet costs ~2.4 s of the query's ~2.9 s at
sf0.1 because 20 value-iteration rounds each plan a shuffle join + a
shuffle agg, and four tail branches re-embed the unrolled chain.

Variants (identical output asserted row-for-row vs A):
  A  current: per-round probs JOIN x (shuffle) + groupBy agg + grid LEFT
     join rebuild
  B  in-loop broadcasts: F.broadcast(probs) in the round join and
     F.broadcast(contrib) in the grid rebuild — bounded frames only,
     removes the per-round shuffle of x
  C  driver-side value iteration: collect the bounded count grid ONCE
     (the BPE-vocab discipline: bounded state, documented), replay the
     exact same integer recurrence in Python, return the 5-column result
     via createDataFrame. The data-sized count fold stays distributed;
     only (channels+3)^2 rows ever reach the driver.

Exploration only; committed claims go through tools/ab_r14.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (  # noqa: E402
    MARKOV_CONV,
    MARKOV_NULL,
    MARKOV_START,
    markov_attribution_from_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("base_conv_ppm", T.LongType()),
        T.StructField("removed_conv_ppm", T.LongType()),
        T.StructField("removal_effect_ppm", T.LongType()),
        T.StructField("attribution_ppm", T.LongType()),
    ]
)


def variant_b(counts: DataFrame, iterations: int = 20) -> DataFrame:
    totals = (
        counts.groupBy("_s")
        .agg(F.sum("_c").cast("long").alias("_t"))
        .select(F.col("_s").alias("_ts"), "_t")
    )
    probs = (
        counts.join(totals, F.col("_s") == F.col("_ts"))
        .select(
            "_s", "_d",
            F.expr("CAST(_c * 1000000 div _t AS BIGINT)").alias("_p"),
        )
        .localCheckpoint(eager=False)
    )
    channels = (
        probs.select(F.col("_s").alias("ch"))
        .union(probs.select(F.col("_d")))
        .distinct()
        .filter(~F.col("ch").isin(MARKOV_START, MARKOV_CONV, MARKOV_NULL))
    )
    base_row = probs.agg(F.count(F.lit(1)).alias("_n")).select(
        F.lit("_BASE_").alias("_sc")
    )
    scenarios = (
        channels.select(F.col("ch").alias("_sc"))
        .union(base_row)
        .localCheckpoint(eager=False)
    )
    states = (
        probs.select(F.col("_s").alias("_st"))
        .union(probs.select(F.col("_d")))
        .distinct()
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    sc1 = scenarios.withColumn("_one", one)
    st1 = states.withColumn("_one", one).localCheckpoint(eager=False)
    grid = (
        sc1.join(F.broadcast(st1), "_one")
        .select("_sc", "_st")
        .localCheckpoint(eager=False)
    )
    x = grid.select(
        "_sc", "_st",
        F.when(F.col("_st") == MARKOV_CONV, F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_x"),
    )
    for _ in range(iterations):
        contrib = (
            F.broadcast(probs)
            .join(
                x.select("_sc", F.col("_st").alias("_d"), F.col("_x").alias("_xd")),
                "_d",
            )
            .withColumn(
                "_xd",
                F.when(F.col("_d") == F.col("_sc"), F.lit(0)).otherwise(F.col("_xd")),
            )
            .groupBy("_sc", F.col("_s").alias("_st"))
            .agg(F.expr("CAST(sum(_p * _xd) div 1000000 AS BIGINT)").alias("_nx"))
        )
        x = (
            grid.join(F.broadcast(contrib), ["_sc", "_st"], "left")
            .select(
                "_sc", "_st",
                F.when(F.col("_st") == MARKOV_CONV, F.lit(1000000))
                .when(F.col("_st") == MARKOV_NULL, F.lit(0))
                .when(F.col("_st") == F.col("_sc"), F.lit(0))
                .otherwise(F.coalesce(F.col("_nx"), F.lit(0)))
                .cast("long")
                .alias("_x"),
            )
        )
    start = x.filter(F.col("_st") == MARKOV_START).select(
        "_sc", F.col("_x").alias("_conv")
    )
    base = start.filter(F.col("_sc") == "_BASE_").select(
        F.col("_conv").alias("_base")
    )
    effects = (
        start.filter(F.col("_sc") != "_BASE_")
        .join(F.broadcast(base))
        .select(
            F.col("_sc").alias("channel"),
            F.col("_base").alias("base_conv_ppm"),
            F.col("_conv").alias("removed_conv_ppm"),
            F.greatest(F.col("_base") - F.col("_conv"), F.lit(0))
            .cast("long")
            .alias("removal_effect_ppm"),
        )
    )
    tot_eff = effects.agg(F.sum("removal_effect_ppm").cast("long").alias("_te"))
    return (
        effects.join(F.broadcast(tot_eff))
        .withColumn(
            "attribution_ppm",
            F.expr(
                "CAST(CASE WHEN _te = 0 THEN NULL"
                " ELSE removal_effect_ppm * 1000000 div _te END AS BIGINT)"
            ),
        )
        .select(
            "channel", "base_conv_ppm", "removed_conv_ppm",
            "removal_effect_ppm", "attribution_ppm",
        )
    )


def variant_c(counts: DataFrame, iterations: int = 20) -> DataFrame:
    spark = counts.sparkSession
    rows = counts.groupBy("_s", "_d").agg(
        F.sum("_c").cast("long").alias("_c")
    ).collect()  # bounded: (channels+3)^2 cells max
    cnt: dict[tuple[str, str], int] = {(r["_s"], r["_d"]): r["_c"] for r in rows}
    tot: dict[str, int] = {}
    for (s, _d), c in cnt.items():
        tot[s] = tot.get(s, 0) + c
    probs = {(s, d): (c * 1000000) // tot[s] for (s, d), c in cnt.items()}
    states = sorted({s for s, _ in probs} | {d for _, d in probs})
    channels = [
        s for s in states if s not in (MARKOV_START, MARKOV_CONV, MARKOV_NULL)
    ]
    scenarios = channels + ["_BASE_"]
    # by-destination adjacency for the contribution fold
    by_src: dict[str, list[tuple[str, int]]] = {}
    for (s, d), p in probs.items():
        by_src.setdefault(s, []).append((d, p))
    x = {
        (sc, st): (1000000 if st == MARKOV_CONV else 0)
        for sc in scenarios
        for st in states
    }
    for _ in range(iterations):
        nx = {}
        for sc in scenarios:
            for st in states:
                if st == MARKOV_CONV:
                    nx[(sc, st)] = 1000000
                elif st == MARKOV_NULL or st == sc:
                    nx[(sc, st)] = 0
                else:
                    acc = 0
                    for d, p in by_src.get(st, ()):
                        xd = 0 if d == sc else x[(sc, d)]
                        acc += p * xd
                    nx[(sc, st)] = acc // 1000000
        x = nx
    base_conv = x.get(("_BASE_", MARKOV_START), 0)
    effects = [
        (ch, base_conv, x.get((ch, MARKOV_START), 0)) for ch in channels
    ]
    te = sum(max(b - r, 0) for _, b, r in effects)
    out = [
        (
            ch,
            b,
            r,
            max(b - r, 0),
            (max(b - r, 0) * 1000000) // te if te != 0 else None,
        )
        for ch, b, r in effects
    ]
    return spark.createDataFrame(out, _SCHEMA)


def main() -> None:
    from dwh_etl_ods_spark_jobs_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("exp-markov-r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()

    # Rebuild the battery query's transition counts input (plans/staged_r14).
    from dwh_etl_ods_spark_jobs_spark.plans import staged_r14 as sr14

    counts_of = getattr(sr14, "_markov_counts", None)
    # Fall back: time the full battery query per variant by monkeypatching
    # the operator the wrapper calls.
    import dwh_etl_ods_spark_jobs_spark.operators.timeseries as ts

    q = qs["markov_attribution_channels"]

    def run_with(fn_from_counts, label: str, n: int = 5) -> list[float]:
        orig = ts.markov_attribution_from_counts
        ts.markov_attribution_from_counts = fn_from_counts
        try:
            q(spark, "/root/testdata/sf0.001").count()  # codegen warm-up
            samples = []
            for _ in range(n):
                spark.sparkContext.setJobDescription(f"exp-markov:{label}")
                t0 = time.perf_counter()
                q(spark, SF_DIR).count()
                samples.append(round(time.perf_counter() - t0, 3))
            return samples
        finally:
            ts.markov_attribution_from_counts = orig

    # Equality first (sf0.01: fast, still multi-channel)
    eq_dir = "/root/testdata/sf0.01"
    base_rows = sorted(
        tuple(r) for r in q(spark, eq_dir).collect()
    )
    for fn, label in ((variant_b, "B"), (variant_c, "C")):
        orig = ts.markov_attribution_from_counts
        ts.markov_attribution_from_counts = (
            lambda c, iterations=20, checkpoint_every=25, _f=fn: _f(c, iterations)
        )
        try:
            got = sorted(tuple(r) for r in q(spark, eq_dir).collect())
        finally:
            ts.markov_attribution_from_counts = orig
        assert got == base_rows, f"variant {label} output differs!"
        print(f"variant {label}: output IDENTICAL ({len(got)} rows)")

    res = {}
    order = ["A", "B", "C", "A", "B", "C", "A", "B", "C"]
    fns = {
        "A": markov_attribution_from_counts,
        "B": lambda c, iterations=20, checkpoint_every=25: variant_b(c, iterations),
        "C": lambda c, iterations=20, checkpoint_every=25: variant_c(c, iterations),
    }
    for label in order:
        s = run_with(fns[label], label, n=3)
        res.setdefault(label, []).extend(s)
        print(label, s, flush=True)
    for label, samples in res.items():
        print(f"{label}: min={min(samples)} samples={samples}")


if __name__ == "__main__":
    main()
