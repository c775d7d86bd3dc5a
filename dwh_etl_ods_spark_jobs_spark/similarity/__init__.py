"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against all candidates, per-pair cosine via ``zip_with`` +
  ``aggregate`` (JVM-side sequential double fold), window ``row_number``
  per query. At 100 TB the candidate scan is embarrassingly parallel and
  the only shuffle is the per-query top-k (tiny: queries × k rows after
  partial ranking).
- **LSH-bucketed ANN** — hyperplane signatures (deterministic md5-derived
  planes shared with :mod:`..dedup`) restrict candidates to the query's
  bucket: the scale path, trading recall for a ~2^planes candidate
  reduction. An IVF variant would swap the signature for a
  nearest-centroid assignment; the join/rank plumbing is identical.

Both are expression-only (no UDFs) and oracle-matched bit-for-bit: cosine
folds accumulate left-to-right in doubles in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.dedup import (
    HYPERPLANES,
    cosine,
    cosine_sql,
    hyperplane_signature,
    hyperplane_signature_sql,
    hyperplanes,
)

__all__ = [
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ivf_assign",
    "cosine",
    "cosine_sql",
    "hyperplane_signature",
    "hyperplane_signature_sql",
    "hyperplanes",
]


def ann_bruteforce_topk(
    queries: DataFrame, candidates: DataFrame,
    id_col: str, vec_col: str, k: int,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); ``candidates``
    streams. Self-matches are excluded. Ties break on neighbor id for
    determinism. Returns (query_id, neighbor_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its max-cosine
    centroid (ties -> lowest centroid id). ``centroids`` is small and
    broadcast; the assignment is one scan × n_centroids — the standard IVF
    build cost, embarrassingly parallel. Returns (id, vec, cell)."""
    c = centroids.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")
    )
    scored = vectors.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vv")
    ).join(F.broadcast(c)).withColumn(
        "_cos", cosine(F.col("_vv"), F.col("_cv"))
    )
    w = Window.partitionBy("_vid").orderBy(F.col("_cos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_vid").alias(id_col),
            F.col("_vv").alias(vec_col),
            F.col("_cid").alias("cell"),
        )
    )


def ann_ivf_topk(
    queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
    id_col: str, vec_col: str, k: int,
) -> DataFrame:
    """IVF(nprobe=1) approximate top-k: rank by exact cosine only within the
    query's cell. The cell equi-join replaces the LSH bucket join of
    :func:`ann_lsh_topk`; swap in a k-means codebook for ``centroids`` and
    the plumbing is production IVF. Returns (query_id, neighbor_id, rank, cos).
    """
    q = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell"
    )
    c = ivf_assign(candidates, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ann_lsh_topk(
    queries: DataFrame, candidates: DataFrame,
    id_col: str, vec_col: str, k: int, dim: int,
    n_planes: int = HYPERPLANES,
) -> DataFrame:
    """Approximate top-k: rank by cosine only within the query's hyperplane
    bucket. Returns (query_id, neighbor_id, rank, cos); recall < 1 by
    design — the candidate set shrinks ~2^n_planes-fold."""
    planes = hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
