"""Round-13 deep probes (VERDICT r12 #5): extend the 1x/10x/100x
deep-probe ledger to the two heaviest battery entries that had only
physiology notes — following the PPR / Merkle-diff discipline (measured
rungs + the SinglePartition assert on every rung).

Probe A — ``dedup.prefix_filter_jaccard_pairs`` (battery
``dedup_prefix_filter_jaccard``, 3.3 s sf0.1 floor). Claim under test:
the prefix-filtering lemma bounds the posting self-join — only each
doc's rarest-first shingle prefix enters the join, so HOT shingles
generate zero candidates and wall tracks corpus size ~linearly instead
of the plain posting join's C(df,2) blowup. Corpus shape: docs scale
10k -> 100k -> 1M; each doc carries 24 tokens = 22 3-gram shingles;
documents pair up (2k, 2k+1) sharing a 23-token base + 1 per-doc
unique token (true shingle Jaccard 21/23 = 0.913 >= the battery's 0.5
threshold, exactly n/2 true pairs). The first 4 tokens are one of only
50 HOT 4-token runs shared by n/50 docs each — the 2 all-hot shingles
per doc reach df = n/25, so a naive posting join would generate
C(n/25, 2) candidates per hot shingle (~8e8 at the 1M rung) while the
prefix filter (rarest 12 of 22 shingles) provably never admits them;
the 19-token tail draws from an xxhash64 vocabulary that SCALES with
the corpus (2x docs), so cross-pair shingle collisions are random and
far below threshold.

Probe B — the ``cluster_aware_split`` physiology (battery entry, 3.0 s
sf0.1 floor): MinHash-LSH candidate pairs -> signature verify ->
min-label connected components -> hash-bucket split census, over the
same paired corpus (clusters = the (2k, 2k+1) pairs). Claim under
test: every stage is banded/equi-keyed (LSH band self-join on
(band, band_hash), CC rounds shuffle node-count rows with per-round
localCheckpoint), so the end-to-end split scales ~linearly in docs.

Usage: python tools/deep_probe_r13.py   (markdown rows for SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

HOT_RUNS = 50
DOC_TOKENS = 24


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def synth_corpus(spark, n_docs: int):
    """Paired documents: (2k, 2k+1) share a base 23-token body — tokens
    0-3 one of 50 hot runs (df-heavy shingles), tokens 4-22 an xxhash64
    rare tail (vocab = 2x docs) — plus one per-doc unique token."""
    rare_vocab = 2 * n_docs
    base = F.col("id") - F.pmod(F.col("id"), F.lit(2))
    hot = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda j: F.concat(
            F.lit("h"),
            (F.pmod(base, F.lit(HOT_RUNS)) * 4 + j).cast("string"),
        ),
    )
    rare = F.transform(
        F.sequence(F.lit(4), F.lit(DOC_TOKENS - 2)),
        lambda j: F.concat(
            F.lit("t"),
            F.pmod(F.xxhash64(base, j), F.lit(rare_vocab)).cast("string"),
        ),
    )
    text = F.concat_ws(
        " ",
        F.concat(
            hot, rare,
            F.array(F.concat(F.lit("u"), F.col("id").cast("string"))),
        ),
    )
    return (
        spark.range(n_docs)
        .repartition(32)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
    )


def probe_prefix_filter(spark, n_docs: int):
    from dwh_etl_ods_spark_jobs_spark.dedup import prefix_filter_jaccard_pairs

    docs = synth_corpus(spark, n_docs)
    t0 = time.time()
    out = prefix_filter_jaccard_pairs(docs, "text", "doc_id",
                                      threshold_ppm=500000)
    n_pairs = out.count()
    wall = time.time() - t0
    return wall, n_pairs, single_partition_exchanges(out)


def probe_cluster_split(spark, n_docs: int):
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    docs = synth_corpus(spark, n_docs)
    t0 = time.time()
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    nodes = docs.select(F.col("doc_id").alias("id"))
    cc = D.connected_components(pairs, nodes)
    bucket = F.pmod(md5_long(F.col("canonical_id").cast("string")), F.lit(10))
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    out = (
        cc.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("canonical_id").cast("long").alias("n_clusters"),
        )
    )
    rows = out.collect()
    wall = time.time() - t0
    n_docs_out = sum(r["n_docs"] for r in rows)
    n_clusters = sum(r["n_clusters"] for r in rows)
    return wall, n_docs_out, n_clusters, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r13", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up

    print("| probe | docs | wall_s | out | SinglePartition |")
    print("|---|---|---|---|---|")
    walls, sps = [], []
    for n in (10_000, 100_000, 1_000_000):
        wall, n_pairs, sp = probe_prefix_filter(spark, n)
        walls.append(wall)
        sps.append(sp)
        print(f"| prefix_filter_jaccard | {n:,} | {wall:.1f} "
              f"| {n_pairs:,} pairs | {sp} |")
        assert n_pairs == n // 2, (n_pairs, n)  # exact recall of the pairs
    assert max(sps) == min(sps), f"SinglePartition drifted: {sps}"
    print(f"ratios: 10x {walls[1] / walls[0]:.1f}x, "
          f"100x {walls[2] / walls[0]:.1f}x")

    walls, sps = [], []
    for n in (10_000, 100_000, 1_000_000):
        wall, nd, nc, sp = probe_cluster_split(spark, n)
        walls.append(wall)
        sps.append(sp)
        print(f"| cluster_aware_split | {n:,} | {wall:.1f} "
              f"| {nd:,} docs / {nc:,} clusters | {sp} |")
        # 16-component / 4-band LSH misses ~0.9% of J=0.913 pairs (a
        # missed pair = 2 singleton clusters), so the census sits just
        # above the n/2 true-cluster count — never below (no false merges:
        # cross-pair signature agreement needs >= 8/16 components).
        assert nd == n and n // 2 <= nc <= int(n // 2 * 1.03), (nd, nc, n)
    assert max(sps) == min(sps), f"SinglePartition drifted: {sps}"
    print(f"ratios: 10x {walls[1] / walls[0]:.1f}x, "
          f"100x {walls[2] / walls[0]:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
