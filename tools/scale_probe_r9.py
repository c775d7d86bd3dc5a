"""Round-9 scale probes: measured 1x/10x evidence for the three r9
gate-registered operators that still lacked one (VERDICT r8 #4 — the
other two named there, attribution_credits and golden_record, got theirs
in r8; SCALING.md:346).

1. ``operators.merge.apply_change_feed`` — snapshot and feed both grow
   10x: the wall should track the single full-outer merge join
   (near-linear in rows; the envelope compaction window is keyed by the
   natural key, bounded fan-in per key).
2. ``graph.negative_edge_samples`` — edge table grows 10x: domain
   indexing (distributed global_rank), seed-keyed draws, resolve join and
   anti-join are all linear scans / uniform-key equi-joins.
3. hybrid retrieval rerank shape — corpus grows 10x: the BM25 candidate
   stage is the only part that sees corpus size (scan-shaped posting
   counts); the cosine rerank touches exactly k candidates regardless.

Also prints each plan's Exchange SinglePartition count at both scales —
the probe fails loudly if scale-up INTRODUCES one (an emergent global
sort/collect would be a scale bug).

Usage: python tools/scale_probe_r9.py  (prints a markdown-ready block;
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


def probe_cdc(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.merge import apply_change_feed

    snap = spark.range(n).select(
        F.col("id").alias("k"),
        F.lit("s0").alias("status"),
        (F.col("id") * 3).alias("cents"),
    )
    # feed = 10% of keys: two update generations for half, deletes for the
    # rest, plus 1%-of-n brand-new keys
    upd_keys = spark.range(0, n, 20).select(F.col("id").alias("k"))
    feed = (
        upd_keys.select(
            "k", F.lit("u1").alias("status"), (F.col("k") + 1).alias("cents"),
            F.lit("u").alias("op"), F.lit(1).alias("seq"))
        .unionByName(upd_keys.select(
            "k", F.lit("u2").alias("status"), (F.col("k") + 2).alias("cents"),
            F.lit("u").alias("op"), F.lit(2).alias("seq")))
        .unionByName(spark.range(10, n, 20).select(
            F.col("id").alias("k"), F.lit("x").alias("status"),
            F.lit(0).cast("long").alias("cents"),
            F.lit("d").alias("op"), F.lit(3).alias("seq")))
        .unionByName(spark.range(n, n + n // 100).select(
            F.col("id").alias("k"), F.lit("new").alias("status"),
            F.col("id").alias("cents"),
            F.lit("c").alias("op"), F.lit(4).alias("seq")))
    )
    out = apply_change_feed(snap, feed, ["k"], ["seq"])
    t0 = time.time()
    rows = out.count()
    return time.time() - t0, rows, single_partition_exchanges(out)


def probe_negative_edges(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import negative_edge_samples

    edges = spark.range(n).select(
        F.pmod(F.col("id") * 37, F.lit(n // 10 + 1)).alias("src"),
        F.pmod(F.col("id") * 101, F.lit(n // 10 + 1)).alias("dst"),
    )
    out = negative_edge_samples(edges, "src", "dst", 4, "probe")
    t0 = time.time()
    rows = out.count()
    return time.time() - t0, rows, single_partition_exchanges(out)


def probe_hybrid(spark, n_docs: int) -> tuple[float, int, int]:
    from pyspark.sql import Window

    from dwh_etl_ods_spark_jobs_spark import curation as C
    from dwh_etl_ods_spark_jobs_spark.dedup import cosine

    dim, k_cand, k_final = 16, 10, 5
    words = F.array(*[
        F.concat(F.lit("w"), F.pmod(F.col("id") * (i + 7), F.lit(50)).cast("string"))
        for i in range(12)
    ])
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.when(F.col("id") % 5 == 0, F.lit("spark")).otherwise(F.lit("filler")),
            F.when(F.col("id") % 7 == 0, F.lit("vector")).otherwise(F.lit("pad")),
            F.array_join(words, " "),
        ).alias("text"),
    )
    emb = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        # + (i+1) term keeps every vector nonzero (an all-zero vector would
        # hit cosine's norm division)
        F.array(*[
            (F.pmod(F.col("id") * (i + 3) + i + 1, F.lit(97)) / F.lit(97.0)).cast("float")
            for i in range(dim)
        ]).alias("embedding"),
    )
    cands = docs.transform(
        C.bm25_topk("doc_id", "text", ["spark", "vector"], k=k_cand)
    ).select("doc_id", "bm25_micro")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_qv"),
        F.pmod(F.hash(F.lit(1)), F.lit(1)).alias("_one"),
    )
    scored = (
        cands.filter(F.col("doc_id") != 0)
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
        .withColumn("_one", F.pmod(F.hash(F.lit(1)), F.lit(1)))
        .join(F.broadcast(qv), "_one")
        .withColumn("cos", F.round(cosine(F.col("embedding"), F.col("_qv")), 6))
    )
    w = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_final)
    )
    t0 = time.time()
    rows = out.count()
    return time.time() - t0, rows, single_partition_exchanges(out)


def main() -> int:
    spark = get_spark("scale-probe-r9")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    probes = [
        ("cdc_apply", probe_cdc, 1_000_000),
        ("negative_edges", probe_negative_edges, 1_000_000),
        ("hybrid_rerank", probe_hybrid, 50_000),
    ]
    print("| probe | 1x rows | 1x wall | 10x wall | ratio | SinglePartition 1x->10x |")
    print("|---|---|---|---|---|---|")
    for name, fn, n1 in probes:
        fn(spark, n1 // 10)  # codegen warm-up at small scale, untimed
        w1, r1, sp1 = fn(spark, n1)
        w10, r10, sp10 = fn(spark, n1 * 10)
        ratio = w10 / w1 if w1 else float("inf")
        print(
            f"| {name} | {n1:,} ({r1:,} out) | {w1:.1f} s | {w10:.1f} s "
            f"| {ratio:.1f}x | {sp1} -> {sp10} |"
        )
        if sp10 > sp1:
            print(f"FAIL: {name} grew SinglePartition exchanges at 10x")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
