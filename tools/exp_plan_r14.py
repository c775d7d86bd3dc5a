"""Round-14 exploration: where does DataFrame-construction time go, and
does spark.sql.constraintPropagation (a known O(n^2) planning hog on
join/filter-heavy trees) pay its way here?

For each query: t_construct (python fn -> DataFrame, includes the
Catalyst passes run by lazy localCheckpoints and any eager actions),
t_count (first count), alternating with constraintPropagation on/off.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "bootstrap_order_value_ci",
    "graph_label_prop_census",
    "markov_attribution_channels",
    "mutual_knn_pairs",
    "personalized_pagerank_topk",
    "graph_k_core_census",
    "adamic_adar_parts",
    "copurchase_modularity",
    "rec_list_quality_eval",
    "dedup_blocking_quality",
]


def main() -> int:
    import __spark_entry__ as entry_mod
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("exp-plan-r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()
    names = sys.argv[1:] or QUERIES
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm).count()
        except Exception:
            pass

    for setting in ("true", "false", "true", "false"):
        spark.conf.set("spark.sql.constraintPropagation.enabled", setting)
        out = []
        for name in names:
            fn = qs[name]
            best = (1e9, 1e9, 1e9)
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                t1 = time.perf_counter()
                df.count()
                t2 = time.perf_counter()
                if t2 - t0 < sum(best[:2]):
                    best = (t1 - t0, t2 - t1, t2 - t0)
            out.append(f"{name}: construct={best[0]:.2f} exec={best[1]:.2f} total={best[2]:.2f}")
        print(f"== constraintPropagation={setting} ==", flush=True)
        for line in out:
            print("  " + line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
