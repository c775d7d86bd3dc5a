"""Round-14 exploration: LPA variants (plan shape + inline timing).

Variants over the battery's graph_label_prop_census shape (3 rounds):
  A  current label_propagation (struct argmax -> SortAggregate; edges
     checkpointed unpartitioned -> per-round edges Exchange+Sort)
  B  edges pre-partitioned by dst (+ sorted) before the lazy checkpoint
  C  B + hash-aggregable decimal argmax encoding
  D  current + decimal argmax only (isolate the two effects)

For each: Exchange / Sort / SortAggregate counts from explain, then
inline alternating timing (min-of-N per alternation), plus a result
equality assert against A (exact rows). Exploration only — committed
claims go through tools/ab_r14.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# encode (count, label) into ONE decimal(38,0) so the argmax fold stays a
# HashAggregate: enc = c * 2^63 + (2^63 - 1 - label). Monotone in (c asc,
# label desc) -> max(enc) == argmax by (count desc, label asc). Exact for
# c < 2^62 and label in [0, 2^63).
_L = 2 ** 63


def lpa_variant(edges: DataFrame, rounds: int, pre_part: bool, dec_argmax: bool) -> DataFrame:
    if pre_part:
        edges = (
            edges.repartition(F.col("dst"))
            .sortWithinPartitions("dst")
            .localCheckpoint(eager=False)
        )
    else:
        edges = edges.localCheckpoint(eager=False)
    labels = None
    for i in range(rounds):
        if labels is None:
            nbr_labels = edges.select(
                F.col("src").alias("node"), F.col("dst").cast("long").alias("label")
            )
        else:
            nbr_labels = edges.join(labels, edges["dst"] == labels["node"]).select(
                edges["src"].alias("node"), "label"
            )
        nbr = nbr_labels.groupBy("node", "label").agg(F.count(F.lit(1)).alias("_c"))
        if dec_argmax:
            enc = (
                F.col("_c").cast("decimal(38,0)") * F.lit(_L).cast("decimal(38,0)")
                + (F.lit(_L - 1).cast("decimal(38,0)") - F.col("label").cast("decimal(38,0)"))
            )
            labels = (
                nbr.groupBy("node")
                .agg(F.max(enc).alias("_e"))
                .select(
                    "node",
                    (F.lit(_L - 1).cast("decimal(38,0)") - (F.col("_e") % F.lit(_L).cast("decimal(38,0)")))
                    .cast("long")
                    .alias("label"),
                )
            )
        else:
            labels = (
                nbr.groupBy("node")
                .agg(F.max(F.struct(F.col("_c"), (-F.col("label")).alias("_nl"))).alias("_m"))
                .select("node", (-F.col("_m._nl")).cast("long").alias("label"))
            )
    return labels


def census(labels: DataFrame) -> DataFrame:
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("size"),
        F.sum("node").cast("long").alias("node_sum"),
    )
    return (
        sizes.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum("node_sum").cast("long").alias("node_sum"),
        )
        .orderBy("size")
    )


def main() -> int:
    from dwh_etl_ods_spark_jobs_spark.plans.graph import _sc_edges
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("exp-lpa-r14")
    spark.range(1000).selectExpr("sum(id)").collect()

    variants = {
        "A_current": (False, False),
        "B_prepart": (True, False),
        "C_prepart_dec": (True, True),
        "D_dec_only": (False, True),
    }

    def build(v):
        pre, dec = variants[v]
        return census(lpa_variant(_sc_edges(spark, SF_DIR), 3, pre, dec))

    # plan shapes
    for v in variants:
        df = build(v)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(
            f"{v}: lines={txt.count(chr(10))} exch={txt.count('Exchange')} "
            f"sort={txt.count('Sort ')} sortagg={txt.count('SortAggregate')} "
            f"hashagg={txt.count('HashAggregate')} smj={txt.count('SortMergeJoin')}",
            flush=True,
        )
        with open(f"/tmp/lpa_{v}.txt", "w") as fh:
            fh.write(txt)

    # result equality vs A
    ref = [tuple(r) for r in build("A_current").collect()]
    for v in list(variants)[1:]:
        got = [tuple(r) for r in build(v).collect()]
        assert got == ref, f"{v} MISMATCH"
        print(f"{v}: rows identical to A ({len(ref)} rows)", flush=True)

    # inline alternating timing
    n_alt, n_timed = 3, 4
    mins = {v: [] for v in variants}
    for a in range(n_alt):
        for v in variants:
            samples = []
            for _ in range(n_timed):
                t0 = time.perf_counter()
                build(v).count()
                samples.append(time.perf_counter() - t0)
            mins[v].append(round(min(samples), 3))
            print(f"[{a}] {v}: min={min(samples):.3f}", flush=True)
    print({v: min(m) for v, m in mins.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
