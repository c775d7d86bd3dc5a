"""Rendezvous (highest-random-weight) sharding.

The assignment primitive behind stable key→shard routing: every key
scores each shard with a deterministic hash and routes to the argmax.
Its defining property — removing/adding one shard moves ONLY the keys
whose argmax was/becomes that shard (≈ 1/(n+1) of them), while modulo
sharding reshuffles nearly everything — is what makes it the right
partitioner for persisted, co-located state (signature stores, ANN
buckets, CDC state) that must survive cluster resizes.

Portability note: the argmax is encoded into ONE BIGINT per shard —
``(w >> 4) << 4 | shard_idx`` (the low 4 bits of the 60-bit md5 weight
are sacrificed for the tie-break/decoding slot) — because ``greatest``
over plain BIGINTs is the one argmax both engines share (DuckDB's
``greatest`` does not take STRUCTs).  ≤16 shards per call; shard counts
beyond that should use two rendezvous levels (shard-group → shard),
which keeps the per-row expression bounded anyway.

Scale: pure per-row expression — zero shuffles, zero state; the churn
census adds one grouped count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.text import md5_long, md5_long_sql

_STRIDE = 16  # encoding slots -> max shards per rendezvous level


def _enc(key: Column, shard: str, idx: int) -> Column:
    w = md5_long(F.concat(F.lit(f"rv:{shard}|"), key.cast("string")))
    return (w - F.pmod(w, F.lit(_STRIDE))) + F.lit(idx)


def rendezvous_assign(
    df: DataFrame, key_col: str, shards: list[str], out_col: str = "shard"
) -> DataFrame:
    """Add ``out_col`` = the rendezvous shard of ``key_col`` over the
    ordered shard list (≤16 entries)."""
    if not 1 <= len(shards) <= _STRIDE:
        raise ValueError(f"rendezvous_assign supports 1..{_STRIDE} shards")
    key = F.col(key_col)
    encs = [_enc(key, s, i) for i, s in enumerate(shards)]
    best = encs[0] if len(encs) == 1 else F.greatest(*encs)
    names = F.array(*[F.lit(s) for s in shards])
    return df.withColumn(
        out_col, F.element_at(names, (F.pmod(best, F.lit(_STRIDE)) + 1).cast("int"))
    )


def rendezvous_assign_sql(
    key_expr: str, shards: list[str], out_col: str = "shard"
) -> str:
    """DuckDB SELECT-expression for :func:`rendezvous_assign` (same
    encoded-BIGINT argmax, same md5 weights)."""
    if not 1 <= len(shards) <= _STRIDE:
        raise ValueError(f"rendezvous_assign supports 1..{_STRIDE} shards")

    def enc(s: str, i: int) -> str:
        w = md5_long_sql(f"'rv:{s}|' || CAST({key_expr} AS VARCHAR)")
        return f"(({w}) - (({w}) % {_STRIDE}) + {i})"

    encs = [enc(s, i) for i, s in enumerate(shards)]
    best = encs[0] if len(encs) == 1 else f"greatest({', '.join(encs)})"
    names = ", ".join(f"'{s}'" for s in shards)
    return f"([{names}])[CAST(({best}) % {_STRIDE} AS BIGINT) + 1] AS {out_col}"


def rendezvous_churn(
    df: DataFrame, key_col: str, shards_old: list[str], shards_new: list[str]
) -> DataFrame:
    """Resize-impact census: assign every key under BOTH shard lists and
    count movement::

        (n_keys, n_moved, moved_ppm)

    Rendezvous theory says growing n → n+1 shards moves ≈ n_keys/(n+1);
    this makes the guarantee a standing measured number before any
    stateful store is actually resized.  One pass, one scalar fold.
    """
    both = rendezvous_assign(
        rendezvous_assign(df, key_col, shards_old, "_s_old"),
        key_col,
        shards_new,
        "_s_new",
    )
    return both.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        # coalesce: sum over ZERO rows is NULL on both engines, but an
        # empty-census "0 keys moved" is a count, not missing data
        # (caught by the r14 property pin; SQL renderer mirrored)
        F.coalesce(
            F.sum((F.col("_s_old") != F.col("_s_new")).cast("long")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_moved"),
    ).withColumn(
        "moved_ppm",
        # empty input -> 0/0: explicit 0 on both engines (Spark ANSI
        # `div 0` throws; DuckDB `// 0` nulls)
        F.expr(
            "CAST(CASE WHEN n_keys = 0 THEN 0"
            " ELSE n_moved * 1000000 div n_keys END AS BIGINT)"
        ),
    )


def rendezvous_churn_sql(
    table_expr: str,
    key_expr: str,
    shards_old: list[str],
    shards_new: list[str],
) -> str:
    """DuckDB rendering of :func:`rendezvous_churn`."""
    old = rendezvous_assign_sql(key_expr, shards_old, "s_old")
    new = rendezvous_assign_sql(key_expr, shards_new, "s_new")
    return f"""
WITH assigned AS (
  SELECT {old}, {new} FROM {table_expr}
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(coalesce(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_moved,
       CAST(CASE WHEN count(*) = 0 THEN 0
            ELSE sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) * 1000000
                 // count(*) END AS BIGINT) AS moved_ppm
FROM assigned
"""
