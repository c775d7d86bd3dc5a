"""Table reconciliation: snapshot diff and referential-integrity audit.

The reference's load modes (stage-and-swap full refresh, anti-join
increments, MERGE upserts) all need a verification counterpart a
warehouse team actually runs: "what changed between yesterday's snapshot
and today's?" and "do my fact rows still have parents?". Both are
single-shuffle DataFrame ops with exact-integer outputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "snapshot_diff",
    "snapshot_diff_sql",
    "fk_orphan_census",
    "fk_orphan_census_sql",
    "table_checksum",
    "table_checksum_sql",
]

_NULL_SENTINEL = "\x00"  # Spark lit == DuckDB chr(0); cannot occur in data
# 32-char non-hex token for NULL fields: cannot collide with any md5 output
_NULL_MD5 = "n" * 32


def _row_hash(cols: Sequence[str]):
    """Cross-engine row fingerprint: md5 of the concatenation of each
    field's OWN md5 (NULL -> a 32-char non-hex token). Per-field hashes
    are fixed-width, so field boundaries are unambiguous — distinct rows
    like ('a|b','c') vs ('a','b|c') can no longer collide, and a literal
    NUL value is distinguishable from NULL (ADVICE r7). Rendered
    identically by ``snapshot_diff_sql``."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit(_NULL_MD5)) for c in cols
    ]
    return F.md5(F.concat(*parts))


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Classify every key between two table versions::

        (key..., change)   change in {'added','removed','changed','same'}

    One null-safe full-outer join on ``keys``; non-key columns compare by
    md5 row fingerprint (computed scan-side on each side — the join ships
    (keys, 32-char hash), never the payload). Keys must be unique per side
    (pre-dedupe if not). Scale: single shuffle on the key, AQE-skew-safe;
    the fingerprint makes the compare O(1) per row regardless of column
    count.
    """
    keys = list(keys)
    val_cols = [c for c in new.columns if c not in keys]
    old_val_cols = [c for c in old.columns if c not in keys]
    if sorted(val_cols) != sorted(old_val_cols):
        raise ValueError(
            f"column mismatch: old={sorted(old_val_cols)} new={sorted(val_cols)}"
        )
    ordered = sorted(val_cols)  # fixed hash order, independent of projection
    # per-side key renames (the full_outer_coalesce idiom): keeps the join
    # unambiguous even when old and new derive from the SAME DataFrame
    o = old.select(
        *[F.col(k).alias(f"__o_{k}") for k in keys],
        _row_hash(ordered).alias("__h_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__n_{k}") for k in keys],
        _row_hash(ordered).alias("__h_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"__o_{k}"), F.col(f"__n_{k}")).alias(k) for k in keys
    ]
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") == F.col("__h_new"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, change.alias("change"))


def snapshot_diff_sql(
    old_cte: str, new_cte: str, keys: Sequence[str], val_cols: Sequence[str]
) -> str:
    """DuckDB rendering of :func:`snapshot_diff` — same fingerprint (md5 of
    '|'-joined NUL-sentineled strings over sorted ``val_cols``)."""
    keys = list(keys)
    ordered = sorted(val_cols)
    fp = (
        "md5(concat("
        + ", ".join(
            f"coalesce(md5(CAST({c} AS VARCHAR)), repeat('n', 32))" for c in ordered
        )
        + "))"
    )
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in keys)
    key_sel = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys)
    key_list = ", ".join(keys)
    return f"""
WITH old_v AS ({old_cte}),
new_v AS ({new_cte}),
o AS (SELECT {key_list}, {fp} AS h FROM old_v),
n AS (SELECT {key_list}, {fp} AS h FROM new_v)
SELECT {key_sel},
       CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            WHEN o.h = n.h THEN 'same'
            ELSE 'changed' END AS change
FROM o FULL OUTER JOIN n ON {on}
"""


def fk_orphan_census(
    child: DataFrame, parent: DataFrame, fk: Sequence[tuple[str, str]]
) -> DataFrame:
    """Referential-integrity audit: count child rows whose foreign key has
    no parent. ``fk`` maps child column -> parent column. Returns one row::

        (n_child, n_orphans, orphan_ppm)

    NULL foreign keys count as orphans (they reference nothing —
    null-rejecting ``=`` on both engines). Scale: ONE left join against
    the deduplicated parent keyset folded into a single
    map-side-combinable count pass — the parent ships keys only, and a
    wide child row contributes two ints to the aggregation.
    """
    fk = list(fk)
    child_keys = [c for c, _ in fk]
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in fk]
    ).dropDuplicates(child_keys)
    counted = (
        child.join(parent_keys.withColumn("__hit", F.lit(1)), child_keys, "left")
        .agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(
                F.when(F.col("__hit").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_orphans"),
        )
    )
    return counted.select(
        "n_child",
        F.coalesce("n_orphans", F.lit(0)).cast("long").alias("n_orphans"),
        F.expr(
            "CASE WHEN n_child = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (coalesce(n_orphans, 0) * 1000000) div n_child END"
        ).alias("orphan_ppm"),
    )


def fk_orphan_census_sql(
    child_cte: str, parent_cte: str, fk: Sequence[tuple[str, str]]
) -> str:
    """DuckDB rendering of :func:`fk_orphan_census` (LEFT JOIN against the
    deduplicated parent keyset — identical NULL semantics)."""
    fk = list(fk)
    on = " AND ".join(f"c.{cc} = p.{cc}" for cc, _ in fk)
    pk_sel = ", ".join(f"{pc} AS {cc}" for cc, pc in fk)
    return f"""
WITH child_v AS ({child_cte}),
parent_v AS ({parent_cte}),
pkeys AS (SELECT DISTINCT {pk_sel}, 1 AS hit FROM parent_v),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_child,
         CAST(coalesce(sum(CASE WHEN p.hit IS NULL THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_orphans
  FROM child_v c LEFT JOIN pkeys p ON {on}
)
SELECT n_child, n_orphans,
       CASE WHEN n_child = 0 THEN CAST(0 AS BIGINT)
            ELSE (n_orphans * 1000000) // n_child END AS orphan_ppm
FROM stats
"""


_MOD_2_63 = "9223372036854775808"  # 2^63, for the sum-fold modulus


def table_checksum(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Order-insensitive content checksum: one row
    ``(n_rows, xor_hash, sum_hash)``. ``xor_hash`` is the BIGINT bit-XOR
    of every row's 60-bit md5 over the boundary-safe, name-sorted column
    fingerprint (the :func:`snapshot_diff` per-field-md5 fingerprint),
    and ``sum_hash`` the exact sum of the same hashes mod 2^63. XOR alone
    self-cancels on even multiplicities (swapping a duplicated pair
    {R,R} for {S,S} leaves it unchanged — ADVICE r7); the sum fold breaks
    that, so the pair detects any multiset difference with collision
    probability ~2^-60 even on duplicate-bearing tables.

    The cheap pre-check of reconciliation: two replicas/loads with equal
    checksums almost surely match; only on mismatch run the full
    :func:`snapshot_diff`. One scan, one 1-row aggregate — no shuffle of
    row data at any scale. ``keys`` limits the hash to a column subset
    (e.g. keys only, for a fast key-census compare).
    """
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    cols = sorted(keys if keys is not None else df.columns)
    h = md5_long(_row_hash(cols))
    return df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.expr("bit_xor(__h)"), F.lit(0)).cast("long").alias("xor_hash"),
        F.coalesce(
            F.expr(f"CAST(sum(CAST(__h AS DECIMAL(38,0))) % {_MOD_2_63} AS BIGINT)"),
            F.lit(0).cast("long"),
        ).alias("sum_hash"),
    )


def table_checksum_sql(table_expr: str, cols: Sequence[str]) -> str:
    """DuckDB rendering of :func:`table_checksum` (same fingerprint, same
    XOR + mod-2^63 sum folds; pass the name-sorted column list)."""
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    cols = sorted(cols)
    concat = "concat(" + ", ".join(
        f"coalesce(md5(CAST({c} AS VARCHAR)), repeat('n', 32))" for c in cols
    ) + ")"
    h = md5_long_sql(f"md5({concat})")
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(bit_xor({h}), 0) AS BIGINT) AS xor_hash,
       CAST(coalesce(sum({h}) % {_MOD_2_63}, 0) AS BIGINT) AS sum_hash
FROM {table_expr}
"""


def merkle_range_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    val_cols: Sequence[str],
    n_buckets: int = 256,
) -> DataFrame:
    """Bandwidth-efficient reconciliation: find WHERE two table versions
    differ by comparing per-bucket digests first, then diff rows ONLY
    inside the buckets whose digests disagree::

        (bucket, n_added, n_removed, n_changed)   -- differing buckets only

    This is the anti-entropy / Merkle pattern: each side folds to
    ``n_buckets`` rows of ``(count, xor-of-row-digests)`` — order-
    independent, overflow-free, and computable INDEPENDENTLY per side
    (e.g. on different clusters, shipping only the digest frame).  The
    row-level full-outer join then runs over the differing buckets only
    — when drift is sparse (the reconciliation regime), that is a
    vanishing fraction of the data, where :func:`snapshot_diff` always
    pays the full-table shuffle.  Row digests reuse the field-delimited
    md5 fingerprint of :func:`snapshot_diff` (ADVICE r7 discipline).
    A bucket's changes escape the pre-filter only if its (count, 60-bit
    xor) digest collides — P ≈ 2⁻⁶⁰ per bucket; use
    :func:`snapshot_diff` where that bound is not acceptable.
    """
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    ordered = sorted(val_cols)
    key = F.col(key_col).cast("string")
    bucket = F.pmod(md5_long(key), F.lit(n_buckets))

    # r14: each side used to be SCANNED TWICE — once folding to the
    # digest summary, once projecting the row-level (bucket, key, hash)
    # for the diff join. Both passes need exactly that projection, so
    # materialize it once per side (lazy localCheckpoint, ~50 B/row) and
    # derive the summary from it: the per-row digest is a pure function
    # of (key, row-hash), so nothing else was lost. One base-table scan
    # per side; digest frames stay independently computable per side
    # (the anti-entropy contract).
    def side_proj(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            bucket.alias("bucket"),
            F.col(key_col).alias(f"_k_{tag}"),
            _row_hash(ordered).alias(f"_h_{tag}"),
        ).localCheckpoint(eager=False)

    po, pn = side_proj(old, "old"), side_proj(new, "new")

    def summarize(proj: DataFrame, tag: str) -> DataFrame:
        digest = md5_long(
            F.concat(
                F.md5(F.col(f"_k_{tag}").cast("string")), F.col(f"_h_{tag}")
            )
        )
        return (
            proj.select("bucket", digest.alias("_d"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
                F.bit_xor("_d").alias(f"x_{tag}"),
            )
        )

    so, sn = summarize(po, "old"), summarize(pn, "new")
    diff_buckets = (
        so.join(sn, "bucket", "full_outer")
        .filter(
            ~(
                F.col("n_old").eqNullSafe(F.col("n_new"))
                & F.col("x_old").eqNullSafe(F.col("x_new"))
            )
        )
        .select("bucket")
    )
    # per-side bucket rename: both sides join the SAME diff_buckets frame,
    # so a shared `bucket` name would be ambiguous in the outer join below
    o = po.join(F.broadcast(diff_buckets), "bucket").select(
        F.col("bucket").alias("_b_old"), "_k_old", "_h_old"
    )
    n = pn.join(F.broadcast(diff_buckets), "bucket").select(
        F.col("bucket").alias("_b_new"), "_k_new", "_h_new"
    )
    joined = o.join(
        n,
        o["_k_old"].eqNullSafe(n["_k_new"]) & (o["_b_old"] == n["_b_new"]),
        "full_outer",
    )
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        joined.select(
            F.coalesce(o["_b_old"], n["_b_new"]).alias("bucket"),
            change.alias("_c"),
        )
        .groupBy("bucket")
        .agg(
            F.sum((F.col("_c") == "added").cast("long")).cast("long").alias("n_added"),
            F.sum((F.col("_c") == "removed").cast("long")).cast("long").alias("n_removed"),
            F.sum((F.col("_c") == "changed").cast("long")).cast("long").alias("n_changed"),
        )
        .filter(
            (F.col("n_added") + F.col("n_removed") + F.col("n_changed")) > 0
        )
    )


def merkle_range_diff_sql(
    old_cte: str,
    new_cte: str,
    key_expr: str,
    val_cols: Sequence[str],
    n_buckets: int = 256,
) -> str:
    """DuckDB rendering of :func:`merkle_range_diff` — deliberately the
    DIRECT full-table diff aggregated to differing buckets (the semantic
    definition), so parity also proves the digest pre-filter drops no
    bucket."""
    ordered = sorted(val_cols)
    fp = (
        "md5(concat("
        + ", ".join(
            f"coalesce(md5(CAST({c} AS VARCHAR)), repeat('n', 32))" for c in ordered
        )
        + "))"
    )
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    bucket = f"({md5_long_sql(f'CAST({key_expr} AS VARCHAR)')}) % {n_buckets}"
    return f"""
WITH old_v AS ({old_cte}),
new_v AS ({new_cte}),
o AS (SELECT {bucket} AS bucket, {key_expr} AS k, {fp} AS h FROM old_v),
n AS (SELECT {bucket} AS bucket, {key_expr} AS k, {fp} AS h FROM new_v),
d AS (
  SELECT coalesce(o.bucket, n.bucket) AS bucket,
         CASE WHEN o.h IS NULL THEN 'added'
              WHEN n.h IS NULL THEN 'removed'
              WHEN o.h <> n.h THEN 'changed'
              ELSE 'same' END AS c
  FROM o FULL OUTER JOIN n ON o.k IS NOT DISTINCT FROM n.k
)
SELECT bucket,
       CAST(sum(CASE WHEN c = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(sum(CASE WHEN c = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN c = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
FROM d GROUP BY bucket
HAVING sum(CASE WHEN c <> 'same' THEN 1 ELSE 0 END) > 0
"""
