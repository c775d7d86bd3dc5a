"""Round-10 scale probes: measured 1x/10x evidence for the r10-staged
operators with non-trivial shuffles, before they hit the driver gate.

1. ``graph.k_core`` — edges grow 10x: each peel round is one
   map-side-combinable degree count + two semi-joins on uniform node ids,
   lineage localCheckpointed per round; rounds are data- (peel-depth-)
   bounded, not row-bounded, so the wall should stay near-linear.
2. ``dedup.sorted_neighborhood_pairs`` — rows grow 10x: the global sort
   is the distributed global_rank (range repartition + offsets), the
   neighbor join is `window` equi-joins on the dense rank.
3. ``dedup.ngram_containment_pairs`` — docs grow 10x with vocabulary
   scaled alongside (constant shingle document-frequency, the realistic
   regime): posting self-equi-join on 60-bit shingle hashes, pair count
   map-side combinable. Same physiology as ngram_jaccard_pairs; this
   probe pins the new scoring tail adds nothing super-linear.

Also prints each plan's Exchange SinglePartition count at both scales —
fails loudly if scale-up INTRODUCES one (an emergent global
sort/collect would be a scale bug).

Usage: python tools/scale_probe_r10.py  (prints a markdown-ready block;
numbers land in SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def probe_k_core(spark, n_edges: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import k_core

    # bipartite-ish graph with a built-in peel gradient: node i of the
    # "customer" side gets (i mod 13) + 2 supplier links, so k=8 peels
    # roughly half the customers and cascades into low-degree suppliers
    n_cust = n_edges // 8
    base = spark.range(n_cust).select(
        F.col("id").alias("c"),
        F.explode(
            F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(13)) + F.lit(1))
        ).alias("j"),
    )
    pairs = base.select(
        (F.col("c") * 2 + 1).alias("s_c"),
        (F.pmod(F.col("c") * 7 + F.col("j") * 31, F.lit(n_cust // 50 + 1)) * 2)
        .alias("s_s"),
    )
    edges = pairs.select(
        F.col("s_c").alias("src"), F.col("s_s").alias("dst")
    ).unionAll(pairs.select(F.col("s_s").alias("src"), F.col("s_c").alias("dst")))
    t0 = time.time()
    out = k_core(edges, k=8)
    n_nodes = out.count()
    wall = time.time() - t0
    return wall, n_nodes, single_partition_exchanges(out)


def probe_sorted_neighborhood(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import sorted_neighborhood_pairs

    df = spark.range(n).select(
        F.col("id"),
        F.concat(
            F.lit("name-"),
            F.lpad(F.pmod(F.col("id") * 2654435761, F.lit(n)).cast("string"), 12, "0"),
        ).alias("key"),
    )
    t0 = time.time()
    out = sorted_neighborhood_pairs(df, "id", "key", window=3, max_distance=6)
    n_pairs = out.count()
    wall = time.time() - t0
    return wall, n_pairs, single_partition_exchanges(out)


def probe_containment(spark, n_docs: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import ngram_containment_pairs

    # ~24 tokens/doc from a vocab scaling with n (constant shingle DF);
    # every doc shares a 6-token prefix with its id//4 "family" so real
    # contained pairs exist at every scale
    vocab = max(n_docs // 5, 100)
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("fam"), (F.col("id") / 4).cast("long").cast("string")),
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") * F.lit(p) + F.lit(i), F.lit(vocab))
                    .cast("string"),
                )
                for i, p in enumerate(
                    [2654435761, 40503, 2246822519, 3266489917, 668265263,
                     374761393, 971, 31, 131, 8191, 127, 524287, 2647, 9176,
                     7919, 104729, 1299709, 15485863, 179424673, 32452843,
                     49979687, 67867967, 86028121]
                )
            ],
        ).alias("text"),
    )
    t0 = time.time()
    out = ngram_containment_pairs(df, "text", "doc_id", threshold_ppm=200000)
    n_pairs = out.count()
    wall = time.time() - t0
    return wall, n_pairs, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r10", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("k_core (peel to fixpoint)", probe_k_core, 1_000_000),
        ("sorted_neighborhood w=3", probe_sorted_neighborhood, 1_000_000),
        ("ngram_containment", probe_containment, 100_000),
    ):
        w1, n1, sp1 = fn(spark, one)
        w10, n10, sp10 = fn(spark, one * 10)
        assert sp10 <= sp1, (
            f"{name}: 10x INTRODUCED SinglePartition exchanges ({sp1}->{sp10})"
        )
        rows.append((name, one, w1, n1, w10, n10, w10 / w1, sp1, sp10))
    print("| probe | 1x input | 1x wall | 1x out | 10x wall | 10x out "
          "| ratio | SinglePartition 1x->10x |")
    print("|---|---|---|---|---|---|---|---|")
    for name, one, w1, n1, w10, n10, r, sp1, sp10 in rows:
        print(
            f"| {name} | {one:,} | {w1:.1f} s | {n1:,} | {w10:.1f} s "
            f"| {n10:,} | {r:.1f}x | {sp1} -> {sp10} |"
        )


if __name__ == "__main__":
    main()
