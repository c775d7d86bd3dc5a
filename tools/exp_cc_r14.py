"""Round-14 exploration: connected_components variants.

Variants (battery shape = minhash pair graph over the sf0.1 corpus,
the dedup_cc_survivors physiology):
  A  current: unpartitioned persist; per round join+agg+LEFT-join rebuild
  B  edges repartition(dst)+sortWithinPartitions before persist (cached
     plans preserve partitioning -> per-round edges Exchange+Sort gone)
  C  message-union fold: labels_new = (messages tag0 UNION own tag1)
     groupBy(id) -> min(cid) AS new, max(own cid) AS prev in ONE agg —
     drops the LEFT-join rebuild (one join per round instead of two)
  D  B + C

Equality vs A (exact rows) + inline alternating timing. Exploration
only; committed claims go through tools/ab_r14.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cc_variant(
    pairs: DataFrame, nodes: DataFrame, pre_part: bool, union_fold: bool,
    max_iters: int = 20, round1_shortcut: bool = False,
) -> DataFrame:
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    if pre_part:
        edges = edges.repartition(F.col("dst")).sortWithinPartitions("dst")
    edges = edges.persist()
    labels = nodes.select(F.col("id"), F.col("id").alias("canonical_id"))
    for it in range(max_iters):
        if union_fold:
            if round1_shortcut and it == 0:
                # round 1: labels are the identity map, so the
                # neighbor-label join IS the edge list
                messages = edges.select(
                    F.col("src").alias("id"),
                    F.col("dst").cast("long").alias("_cid"),
                    F.lit(None).cast("long").alias("_own"),
                )
            else:
                messages = (
                    edges.join(labels, edges.dst == labels.id)
                    .select(
                        F.col("src").alias("id"),
                        F.col("canonical_id").alias("_cid"),
                        F.lit(None).cast("long").alias("_own"),
                    )
                )
            own = labels.select(
                "id",
                F.col("canonical_id").alias("_cid"),
                F.col("canonical_id").alias("_own"),
            )
            stepped = (
                messages.unionAll(own)
                .groupBy("id")
                .agg(
                    F.min("_cid").alias("canonical_id"),
                    F.max("_own").alias("__prev"),
                )
                .localCheckpoint(eager=False)
            )
        else:
            neighbor_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("canonical_id").alias("nmin"))
            )
            stepped = (
                labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                .select(
                    "id",
                    F.col("canonical_id").alias("__prev"),
                    F.least(
                        F.col("canonical_id"),
                        F.coalesce(F.col("nmin"), F.col("canonical_id")),
                    ).alias("canonical_id"),
                )
                .localCheckpoint(eager=False)
            )
        changed = stepped.filter(F.col("canonical_id") != F.col("__prev")).count()
        labels = stepped.select("id", "canonical_id")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def build(spark, sf_dir: str, pre_part: bool, union_fold: bool, r1: bool = False) -> DataFrame:
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import _corpus

    corpus = _corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.5)
    nodes = corpus.select(F.col("doc_id").alias("id"))
    cc = cc_variant(pairs, nodes, pre_part, union_fold, round1_shortcut=r1)
    return (
        cc.groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("sz"), F.sum("id").alias("idsum"))
        .groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("idsum").alias("s"))
        .orderBy("sz")
    )


def main() -> int:
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("exp-cc-r14")
    spark.range(1000).selectExpr("sum(id)").collect()

    variants = {
        "A_current": (False, False, False),
        "C_unionfold": (False, True, False),
        "E_union_r1": (False, True, True),
    }

    ref = [tuple(r) for r in build(spark, SF_DIR, False, False).collect()]
    for v, (pp, uf, r1) in list(variants.items())[1:]:
        got = [tuple(r) for r in build(spark, SF_DIR, pp, uf, r1).collect()]
        assert got == ref, f"{v} MISMATCH"
        print(f"{v}: rows identical to A ({len(ref)} rows)", flush=True)

    n_alt, n_timed = 4, 3
    mins = {v: [] for v in variants}
    for a in range(n_alt):
        for v, (pp, uf, r1) in variants.items():
            samples = []
            for _ in range(n_timed):
                t0 = time.perf_counter()
                build(spark, SF_DIR, pp, uf, r1).count()
                samples.append(time.perf_counter() - t0)
            mins[v].append(round(min(samples), 3))
            print(f"[{a}] {v}: min={min(samples):.3f}", flush=True)
    print({v: min(m) for v, m in mins.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
