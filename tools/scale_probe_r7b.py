"""Round-7 scale probes, part 2: measured 1x/10x evidence for the two
r8-staged heavyweights added this round.

1. ``dedup.incremental_lsh_dedup`` — a FIXED new batch against a store
   that grows 10x: wall should track the store signature scan (linear,
   cheap — signatures are ~130 B/doc) while the verify work stays
   bounded by the batch's colliding buckets, NOT store size.
2. ``text.bpe.bpe_train`` — a corpus that grows 10x by replication:
   train wall should stay ~flat because every iteration runs on the
   DISTINCT-WORD frame (unchanged under replication); only the single
   word-count scan sees the extra rows.

Usage: python tools/scale_probe_r7b.py  (prints a markdown-ready table;
numbers land in SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark import dedup as D  # noqa: E402
from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402
from dwh_etl_ods_spark_jobs_spark.text.bpe import bpe_train, bpe_word_counts  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe_incremental_dedup(spark) -> list[str]:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    batch = docs.filter(F.col("doc_id") % 10 == 0).localCheckpoint()
    store_base = docs.filter(F.col("doc_id") % 10 != 0)
    rows = []
    for scale, reps in (("1x", 1), ("10x", 10)):
        store_docs = None
        for r in range(reps):
            rep = store_base.select(
                (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                # each replica perturbed so replicas aren't exact dups of
                # each other (distinct signatures, like a real corpus)
                F.concat("text", F.lit(f" replica token r{r}")).alias("text"),
            )
            store_docs = rep if store_docs is None else store_docs.unionAll(rep)
        # the store is PRE-BUILT in the incremental shape: materialize its
        # signature table first so the probe times only the batch run
        store_sigs = D.minhash_signatures(
            store_docs, "text", "doc_id"
        ).localCheckpoint()
        n_store = store_sigs.count()
        t0 = time.monotonic()
        out = D.incremental_lsh_dedup(batch, store_sigs, "text", "doc_id")
        flagged = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(store_dup_of >= 0 AS INT)")).alias("dup"),
        ).collect()[0]
        wall = time.monotonic() - t0
        rows.append(
            f"| incremental_lsh_dedup {scale} | batch 500 vs store "
            f"{n_store:,} sigs | {wall:.1f} s | {flagged.n} rows, "
            f"{flagged.dup} store-dup |"
        )
    return rows


def probe_bpe(spark) -> list[str]:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    rows = []
    for scale, reps in (("1x", 1), ("10x", 10)):
        corpus = None
        for r in range(reps):
            rep = docs.select(
                (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"), "text"
            )
            corpus = rep if corpus is None else corpus.unionAll(rep)
        corpus = corpus.localCheckpoint()  # isolate op cost from the union
        n_rows = corpus.count()
        n_vocab = bpe_word_counts(corpus, "text").count()
        t0 = time.monotonic()
        merges = bpe_train(spark, corpus, "text", 8)
        n_merges = merges.count()
        wall = time.monotonic() - t0
        rows.append(
            f"| bpe_train(8) {scale} | {n_rows:,} docs, {n_vocab:,} distinct "
            f"words | {wall:.1f} s | {n_merges} merges |"
        )
    return rows


def main() -> None:
    spark = get_spark("scale-probe-r7b", shuffle_partitions=32)
    spark.range(1).count()  # warm the JVM before timing anything
    probe_incremental_dedup(spark)  # discard: codegen/compile warm-up pass
    probe_bpe(spark)
    lines = ["| probe | input | wall | output |", "|---|---|---|---|"]
    lines += probe_incremental_dedup(spark)
    lines += probe_bpe(spark)
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
