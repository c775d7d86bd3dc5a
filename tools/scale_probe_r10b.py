"""Second-wave round-10 scale probes: measured 1x/10x evidence for the
r10b-staged operators with non-trivial shuffles, before they hit the
driver gate.

1. ``dedup.prefix_filter_jaccard_pairs`` — docs grow 10x with vocabulary
   scaled alongside, PLUS a deliberately HOT shingle planted in every
   document: the plain posting join would generate C(n,2) candidates off
   that one key; the prefix filter must keep the wall linear because the
   hot (max-DF) shingle sorts to the END of the rarest-first order and
   never enters a prefix at t=0.5.
2. ``operators/stats.winsorized_stats`` (drives
   ``operators/rank.grouped_global_rank``) — n rows across FIVE groups,
   the few-huge-groups regime where a plain partitioned window would
   funnel n/5 rows through single tasks.
3. ``operators/rank.systematic_weighted_sample`` — PPS picks stay exactly
   n while rows grow 10x (output is pick-count-bounded, not row-bounded).
4. ``dedup.mutual_knn_pairs`` — vectors grow 10x with the hyperplane
   count grown by log2(10) alongside (constant expected bucket size, the
   realistic operating point): candidate volume stays ~linear.
5. ``curation.phrase_match_census`` — corpus grows 10x; postings are
   IN-filtered to the phrase vocabulary before the adjacency join.

Also prints each plan's Exchange SinglePartition count at both scales —
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r10b.py  (markdown block for SCALING.md).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def _synth_docs(spark, n_docs: int):
    """~13 tokens/doc: one PLANTED hot token (in EVERY doc), ten
    family-shared tokens (docs come in near-dup families of 4, so real
    Jaccard≥0.5 pairs exist at every scale), and two doc-unique tokens
    drawn from a vocab scaling with n (constant shingle DF)."""
    vocab = max(n_docs // 5, 100)
    fid = (F.col("id") / 4).cast("long")
    fam_toks = [
        F.concat(
            F.lit("f"),
            F.pmod(fid * F.lit(p) + F.lit(i), F.lit(vocab)).cast("string"),
        )
        for i, p in enumerate(
            [2654435761, 40503, 2246822519, 3266489917, 668265263,
             374761393, 971, 8191, 127, 524287]
        )
    ]
    uniq_toks = [
        F.concat(
            F.lit("u"),
            F.pmod(F.col("id") * F.lit(p) + F.lit(i), F.lit(vocab))
            .cast("string"),
        )
        for i, p in enumerate([31, 131])
    ]
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("hot"), *fam_toks, *uniq_toks).alias("text"),
    )


def probe_prefix_jaccard(spark, n_docs: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import prefix_filter_jaccard_pairs

    t0 = time.time()
    out = prefix_filter_jaccard_pairs(
        _synth_docs(spark, n_docs), "text", "doc_id", threshold_ppm=500000
    )
    n_pairs = out.count()
    wall = time.time() - t0
    return wall, n_pairs, single_partition_exchanges(out)


def probe_winsorized(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import winsorized_stats

    df = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(5)).cast("string").alias("g"),
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 2654435761, F.lit(1000000)).alias("v"),
    )
    t0 = time.time()
    out = winsorized_stats(df, ["g"], "v", "k", trim_pct=5)
    n_rows = out.count()
    wall = time.time() - t0
    return wall, n_rows, single_partition_exchanges(out)


def probe_pps_sample(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        systematic_weighted_sample,
    )
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id") * 31, F.lit(997)).alias("w"),
    ).withColumn("_h", md5_long(F.col("id").cast("string")))
    t0 = time.time()
    out = df.transform(systematic_weighted_sample(["_h", "id"], "w", 1000))
    n_rows = out.count()
    wall = time.time() - t0
    return wall, n_rows, single_partition_exchanges(out)


def probe_mutual_knn(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import mutual_knn_pairs

    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    dim = 8
    # planes grow with log2(n) -> constant expected MEAN bucket size
    # (~32); the cap below handles the skewed tail (hyperplane bits are
    # correlated by construction)
    planes = max(round(math.log2(n / 32)), 1)
    # md5-derived components: genuinely scattered vectors (a lattice
    # pattern collapses whole cohorts into identical vectors -> duplicate
    # ties -> degenerate giant buckets, a probe artifact not a data shape)
    vec = F.array(
        *[
            (
                F.pmod(
                    md5_long(F.concat(F.col("id").cast("string"), F.lit(f":{j}"))),
                    F.lit(2001),
                ).cast("double")
                - F.lit(1000.0)
            )
            / F.lit(1000.0)
            for j in range(dim)
        ]
    )
    df = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("v"))
    t0 = time.time()
    out = mutual_knn_pairs(
        df, "v", "vec_id", k=3, dim=dim, n_planes=planes, max_bucket=256
    )
    n_rows = out.count()
    wall = time.time() - t0
    return wall, n_rows, single_partition_exchanges(out)


def probe_phrase_match(spark, n_docs: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.curation import phrase_match_census

    t0 = time.time()
    out = phrase_match_census(
        _synth_docs(spark, n_docs), "doc_id", "text",
        [("hot", "f0"), ("f1", "f2")],
    )
    n_rows = out.count()
    wall = time.time() - t0
    return wall, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r10b", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("prefix_filter_jaccard (hot shingle planted)",
         probe_prefix_jaccard, 100_000),
        ("winsorized_stats / grouped_global_rank (5 groups)",
         probe_winsorized, 1_000_000),
        ("systematic_weighted_sample (n=1000 picks)",
         probe_pps_sample, 1_000_000),
        ("mutual_knn k=3 (planes ∝ log2 n)", probe_mutual_knn, 100_000),
        ("phrase_match_census", probe_phrase_match, 100_000),
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
