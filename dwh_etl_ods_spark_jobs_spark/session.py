"""SparkSession factory.

Defaults are tuned for correctness-first local runs but scale-aware: AQE on
(runtime re-plan + skew-join handling), Arrow on (fast pandas interchange for
the Pandas-UDF slow path), UTC session timezone (deterministic date
semantics — the reference's T-SQL ran under a fixed server timezone).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dwh-etl-ods-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster, ``master``/memory come from spark-submit; everything
    here is safe to leave in place. Locally, ``SPARK_GRAFT_CPUS`` controls
    parallelism (driver contract).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r14 config experiment, REJECTED: preferSortMergeJoin=false
        # (guide §3.1's shuffled-hash option) measured uniformly SLOWER
        # in an alternating sf0.1 A/B across 8 join-heavy battery
        # queries (1.1-2.4x, worst on minhash_estimate_eval and
        # rec_list_quality_eval) — hash-table builds on the many
        # mid-size self-joins cost more than the sorts they avoid, and
        # several joins lost AQE's runtime broadcast conversion. The
        # default (sort-merge preferred, AQE converting where profitable)
        # stays.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
