"""Similarity search over embedding columns (``array<float>``).

Four retrieval paths (brute-force, LSH, IVF, PQ-ADC) plus storage
compression (:func:`quantize_embeddings`). The first two:

- **brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against all candidates, per-pair cosine via ``zip_with`` +
  ``aggregate`` (JVM-side sequential double fold), then a TWO-PHASE rank:
  a salted local top-k per (query, salt) partition followed by a global
  top-k over the k·n_salts survivors. ``row_number`` windows are not
  partially aggregated, so a single-phase rank would funnel every scored
  candidate of a query into ONE partition — a straggler by construction
  at 100 TB. The salted phase bounds any partition at |corpus|/n_salts
  rows and the global phase ranks only k·n_salts rows per query.
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
    cosine_with_norms,
    hyperplane_signature,
    hyperplane_signature_sql,
    hyperplanes,
    vec_norm,
)

__all__ = [
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "pq_encode",
    "l2sq_sub",
    "l2sq_sub_sql",
    "quantize_embeddings",
    "quantize_embeddings_sql",
    "Q8_LEVELS",
    "ivf_assign",
    "train_ivf_centroids",
    "cosine",
    "cosine_sql",
    "hyperplane_signature",
    "hyperplane_signature_sql",
    "hyperplanes",
    "hard_negative_mining",
]


def _topk_per_query(
    scored: DataFrame, k: int, n_salts: int = 0,
    score_col: str = "cos", ascending: bool = False,
) -> DataFrame:
    """Rank ``scored`` (query_id, neighbor_id, score_col) to top-k per
    query — best score first (``ascending=True`` for distances).

    ``n_salts > 0`` runs the two-phase shape: a deterministic salt
    (``pmod(hash(neighbor_id))`` — retry-safe, never ``rand()``) splits
    each query's candidates across n_salts partitions for a local top-k,
    then a global window ranks the surviving k·n_salts rows. Correct
    because every member of the global top-k is necessarily within the
    top-k of its own salt partition. Both phases break ties identically
    (score, neighbor_id asc)."""
    best = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    order = (best, F.col("neighbor_id").asc())
    final = Window.partitionBy("query_id").orderBy(*order)
    if n_salts > 0:
        local = Window.partitionBy("query_id", "_salt").orderBy(*order)
        scored = (
            scored.withColumn(
                "_salt", F.pmod(F.hash(F.col("neighbor_id")), F.lit(n_salts))
            )
            .withColumn("_lrank", F.row_number().over(local))
            .filter(F.col("_lrank") <= k)
        )
    return (
        scored.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", score_col)
    )


def ann_bruteforce_topk(
    queries: DataFrame, candidates: DataFrame,
    id_col: str, vec_col: str, k: int,
    n_salts: int = 32,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); ``candidates``
    streams. Self-matches are excluded. Ties break on neighbor id for
    determinism. The rank runs two-phase (salted local top-k, then global
    top-k over k·n_salts survivors — :func:`_topk_per_query`) so no
    partition ever receives a query's full scored corpus. Returns
    (query_id, neighbor_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col)).alias("_qn"),  # r14: once per vector
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                cosine_with_norms(
                    F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
    )
    return _topk_per_query(scored, k, n_salts=n_salts)


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str,
    n_cells: int = 1,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its ``n_cells``
    max-cosine centroids (ties -> lowest centroid id). ``centroids`` is
    small and broadcast; the assignment is one scan × n_centroids — the
    standard IVF build cost, embarrassingly parallel. Returns
    (id, vec, cell), one row per assigned cell (candidates build with
    n_cells=1; queries probe with n_cells=nprobe)."""
    c = centroids.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv"),
        vec_norm(F.col(vec_col)).alias("_cvn"),  # r14: once per centroid
    )
    scored = vectors.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vv"),
        vec_norm(F.col(vec_col)).alias("_vvn"),
    ).join(F.broadcast(c)).withColumn(
        "_cos",
        cosine_with_norms(
            F.col("_vv"), F.col("_cv"), F.col("_vvn"), F.col("_cvn")
        ),
    )
    w = Window.partitionBy("_vid").orderBy(F.col("_cos").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_cells)
        .select(
            F.col("_vid").alias(id_col),
            F.col("_vv").alias(vec_col),
            F.col("_cid").alias("cell"),
        )
    )


def train_ivf_centroids(
    vectors: DataFrame, id_col: str, vec_col: str,
    n_centroids: int, iters: int = 5,
) -> DataFrame:
    """Spherical k-means codebook for IVF, trained with DataFrame ops only.

    Seeds deterministically without RNG or a global sort: a hash filter
    thins the corpus to ~8·k candidate rows (so the seeding window ranks a
    tiny frame, never all n), then the first ``n_centroids`` by id become
    the seeds. Lloyd's iterations follow: assign each vector to its
    max-cosine centroid (broadcast join; one scan × n_centroids per round)
    and recompute each centroid as the element-wise mean of its members
    via posexplode → groupBy(cell, pos) → avg → sorted array_agg re-pack.
    Per round that is one narrow scan plus one (cell, pos)-grained shuffle
    of n·dim scalar rows — at 100 TB both are embarrassingly parallel and
    the codebook (k·dim doubles) always fits the driver/broadcast path.
    The trained frame feeds :func:`ann_ivf_topk` / :func:`ivf_assign` as
    ``centroids``.

    Empty cells keep their previous centroid (standard Lloyd's fallback).
    Returns (``id_col``, ``vec_col``) with centroid ids 0..n_centroids-1.
    """
    n = vectors.count()
    if n == 0:
        raise ValueError("train_ivf_centroids: empty input")
    sample_mod = max(1, n // (n_centroids * 8))
    # pmod, not abs(hash) % mod: hash() is a full-range 32-bit int and under
    # ANSI mode abs(Integer.MIN_VALUE) throws ARITHMETIC_OVERFLOW — at
    # billions of rows a hash of INT_MIN is near-certain.
    seeds = vectors.select(F.col(id_col), F.col(vec_col).alias("_cv")).filter(
        F.pmod(F.hash(F.col(id_col)), F.lit(sample_mod)) == 0
    )
    if seeds.count() < n_centroids:  # tiny/unlucky corpus: rank everything
        seeds = vectors.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    w = Window.orderBy(F.col(id_col).asc())
    centroids = (
        seeds.withColumn("_rank", F.row_number().over(w) - 1)
        .filter(F.col("_rank") < n_centroids)
        .select(
            F.col("_rank").cast("long").alias(id_col),
            F.col("_cv").alias(vec_col),
        )
        .localCheckpoint()  # seed once; iterations below replace the plan
    )
    for _ in range(iters):
        assigned = ivf_assign(vectors, centroids, id_col, vec_col)
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
            .groupBy("cell", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_m")))
                ).alias("_pairs")
            )
            .select(
                F.col("cell").alias(id_col),
                F.transform(F.col("_pairs"), lambda p: p._m).alias(vec_col),
            )
        )
        # Keep previous centroids for cells that lost every member.
        centroids = (
            centroids.alias("old")
            .join(means.alias("new"), on=id_col, how="left")
            .select(
                F.col(id_col),
                F.coalesce(F.col(f"new.{vec_col}"), F.col(f"old.{vec_col}")).alias(vec_col),
            )
            .localCheckpoint()  # truncate the iteration's lineage
        )
    return centroids


def ann_ivf_topk(
    queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
    id_col: str, vec_col: str, k: int, nprobe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: rank by exact cosine only within the query's
    ``nprobe`` nearest cells. The cell equi-join replaces the LSH bucket
    join of :func:`ann_lsh_topk`; swap in a k-means codebook for
    ``centroids`` and the plumbing is production IVF. Candidates live in
    exactly one cell and the probed cells are distinct, so no pair is
    scored twice. Returns (query_id, neighbor_id, rank, cos).
    """
    q = ivf_assign(queries, centroids, id_col, vec_col, n_cells=nprobe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell",
        vec_norm(F.col(vec_col)).alias("_qn"),  # r14: once per vector
    )
    c = ivf_assign(candidates, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell",
        vec_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                cosine_with_norms(
                    F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
    )
    # Single-phase rank: the input is already bucket-restricted (a cell's
    # candidates, not the corpus). If cells grow hot, pass the scored frame
    # through _topk_per_query with n_salts > 0 — same contract.
    return _topk_per_query(scored, k, n_salts=0)


def ann_lsh_topk(
    queries: DataFrame, candidates: DataFrame,
    id_col: str, vec_col: str, k: int, dim: int,
    n_planes: int = HYPERPLANES,
    hamming_probes: int = 0,
) -> DataFrame:
    """Approximate top-k: rank by cosine only within the query's hyperplane
    bucket. Returns (query_id, neighbor_id, rank, cos); recall < 1 by
    design — the candidate set shrinks ~2^n_planes-fold.

    ``hamming_probes`` > 0 enables multi-probe: each query also probes the
    buckets reachable by flipping that many of its signature bits one at a
    time (``hamming_probes = n_planes`` is the full Hamming-1 ball),
    trading candidate volume back for recall without rebuilding anything —
    the standard single-probe recall-cliff mitigation. Candidates stay in
    exactly one bucket and the probed buckets are distinct, so no pair is
    scored twice."""
    planes = hyperplanes(dim, n_planes)
    sig = hyperplane_signature(F.col(vec_col), planes)
    if hamming_probes > 0:
        probes = F.array(
            sig, *[sig.bitwiseXOR(F.lit(1 << j).cast("long"))
                   for j in range(min(hamming_probes, n_planes))]
        )
        bucket = F.explode(probes).alias("bucket")
    else:
        bucket = sig.alias("bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        bucket,
        vec_norm(F.col(vec_col)).alias("_qn"),  # r14: once per vector
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
        vec_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                cosine_with_norms(
                    F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
    )
    # Bucket-restricted input — single-phase rank (see ann_ivf_topk note).
    return _topk_per_query(scored, k, n_salts=0)


# --- Product quantization (PQ) with asymmetric distance computation --------

def l2sq_sub(vec_a: Column, vec_b: Column, offset: int, width: int) -> Column:
    """Squared L2 distance over one subvector, fixed left-to-right double
    fold (portable to the oracle, like :func:`cosine`)."""
    return F.aggregate(
        F.zip_with(
            F.slice(vec_a, offset + 1, width),
            F.slice(vec_b, offset + 1, width),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2sq_sub_sql(a: str, b: str, offset: int, width: int) -> str:
    """DuckDB rendering of :func:`l2sq_sub` (same element order, same
    fold)."""
    body = (
        f"(CAST({a}[j] AS DOUBLE) - CAST({b}[j] AS DOUBLE))"
        f" * (CAST({a}[j] AS DOUBLE) - CAST({b}[j] AS DOUBLE))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range({offset + 1}, {offset + width + 1}), j -> {body})), "
        f"(x, y) -> x + y)"
    )


def _one_key(df: DataFrame, any_col: str) -> DataFrame:
    """Data-derived constant join key (the repo's small×small attach
    idiom — keeps the broadcast an equi HASH join, never a nested loop)."""
    return df.withColumn("_one", F.pmod(F.hash(any_col), F.lit(1)))


def _pq_partial_dists(
    vectors: DataFrame, codebook: DataFrame, id_col: str, vec_col: str,
    out_id: str, dim: int, m_sub: int,
) -> DataFrame:
    """Shared PQ distance frame: ``(out_id, cent_id, sub, pd_micro)`` —
    the per-(vector, subspace, centroid) squared-L2 partials in integer
    micro-units, codebook attached via one constant-key broadcast. BOTH
    the encode argmin and the ADC lookup table derive from this single
    helper so the distance discipline (offsets, micro scale, rounding)
    can never drift between the code side and the query side.
    """
    width = dim // m_sub
    cb = _one_key(
        codebook.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("_cbv")),
        "cent_id",
    )
    pd_cols = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.round(
                    l2sq_sub(F.col("_vv"), F.col("_cbv"), s * width, width)
                    * F.lit(1000000.0)
                ).cast("long").alias("pd_micro"),
            )
            for s in range(m_sub)
        ]
    )
    return (
        _one_key(
            vectors.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("_vv")),
            out_id,
        )
        .join(F.broadcast(cb), "_one")
        .select(out_id, "cent_id", F.explode(pd_cols).alias("_p"))
        .select(
            out_id,
            "cent_id",
            F.col("_p.sub").alias("sub"),
            F.col("_p.pd_micro").alias("pd_micro"),
        )
    )


def pq_encode(
    vectors: DataFrame, codebook: DataFrame, id_col: str, vec_col: str,
    dim: int, m_sub: int,
) -> DataFrame:
    """Encode each vector as ``m_sub`` centroid ids — the PQ compression
    step (Jégou et al. 2011): a D-dim float vector becomes m_sub small
    ints, an ~85× footprint cut at D=64/m=4 that lets the search scan
    CODES, not vectors.

    One broadcast attach of the codebook, per-(vector, subspace, centroid)
    partial distances in micro-units, argmin per (vector, subspace) via a
    K-row window (ties break on centroid id). Returns (id, sub, cent_id).
    """
    w = Window.partitionBy(id_col, "sub").orderBy(
        F.col("pd_micro").asc(), F.col("cent_id").asc()
    )
    return (
        _pq_partial_dists(vectors, codebook, id_col, vec_col, id_col, dim, m_sub)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "sub", "cent_id")
    )


def ann_pq_topk(
    queries: DataFrame, vectors: DataFrame, codebook: DataFrame,
    id_col: str, vec_col: str, dim: int, k: int,
    m_sub: int = 4, n_salts: int = 32,
) -> DataFrame:
    """Approximate top-k nearest (squared-L2) neighbors via PQ codes and
    asymmetric distance computation: the query keeps its exact vector, the
    corpus is scanned as codes, and each (query, code) distance is m_sub
    integer table lookups — never a full-dimension float fold per pair.

    The distance table (queries × m_sub × K rows, integer micro partial
    distances) broadcasts; the probe is codes ⋈ table on (sub, cent_id)
    followed by an exact BIGINT sum per (query, neighbor) — map-side
    combinable, deterministic. Returns (query_id, neighbor_id, rank,
    adc_micro); recall < 1 by quantization design.
    """
    codes = pq_encode(vectors, codebook, id_col, vec_col, dim, m_sub)
    table = _pq_partial_dists(
        queries, codebook, id_col, vec_col, "query_id", dim, m_sub
    )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(table), ["sub", "cent_id"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pd_micro").alias("adc_micro"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    return _topk_per_query(
        scored, k, n_salts=n_salts, score_col="adc_micro", ascending=True
    )


# --- int8 embedding quantization -------------------------------------------

Q8_LEVELS = 127


def quantize_embeddings(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: each float becomes
    ``round(x * 127 / max_abs)`` with the per-vector scale kept alongside
    — the 4× (vs float32) / 8× (vs float64) storage cut a 100 TB
    embedding store takes before ANN indexing, at <1% cosine error
    (pytest-pinned on the dequantized vectors).

    Pure expression tree: one ``aggregate`` fold for max|x|, one
    ``transform`` for the codes. Returns (id, scale, q) where
    ``q`` is array<tinyint>-valued codes (int array — Spark has no
    tinyint array literal; values are in [-127, 127]) and
    ``scale = max_abs / 127`` reconstructs ``x ≈ q * scale``.
    All-zero vectors quantize to all-zero codes with scale 0.0.
    """
    v = F.col(vec_col)
    max_abs = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    codes = F.when(max_abs == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.round(
                x.cast("double") * F.lit(float(Q8_LEVELS)) / F.col("_ma")
            ).cast("int"),
        )
    )
    return (
        df.select(F.col(id_col), v.alias(vec_col), max_abs.alias("_ma"))
        .select(
            id_col,
            F.round(F.col("_ma") / F.lit(float(Q8_LEVELS)), 9).alias("scale"),
            codes.alias("q"),
        )
    )


def quantize_embeddings_sql(table: str, id_expr: str, vec_expr: str) -> str:
    """DuckDB rendering of :func:`quantize_embeddings`."""
    ma = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({vec_expr}, x -> abs(CAST(x AS DOUBLE)))), "
        f"(a, b) -> greatest(a, b))"
    )
    return f"""
WITH qin AS (SELECT {id_expr} AS qid, {vec_expr} AS v, {ma} AS ma FROM {table})
SELECT qid AS {id_expr},
       round(ma / {float(Q8_LEVELS)!r}, 9) AS scale,
       CASE WHEN ma = 0.0 THEN list_transform(v, x -> 0)
            ELSE list_transform(v, x -> CAST(round(CAST(x AS DOUBLE) * {float(Q8_LEVELS)!r} / ma) AS INT))
       END AS q
FROM qin
"""


def hard_negative_mining(
    queries: DataFrame, candidates: DataFrame,
    id_col: str, vec_col: str, k: int,
    floor_cos: float, ceil_cos: float,
    n_salts: int = 32,
) -> DataFrame:
    """Top-k similar-but-NOT-near-duplicate candidates per query — the
    hard-negative mining step of contrastive retrieval training: cosine
    in ``[floor_cos, ceil_cos)``. Above the floor the negative is hard
    (confusable); at/above the ceiling it is presumed a positive or a
    near-duplicate and excluded (pairing it as a negative would teach the
    model to split duplicates).

    Same scale shape as :func:`ann_bruteforce_topk`: queries broadcast,
    candidates stream, the band filter runs scan-side BEFORE the
    two-phase salted rank (so the rank sees only in-band rows), cosine
    rounded to 6 decimals with the fixed fold order both engines share.
    Returns (query_id, neighbor_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col)).alias("_qn"),  # r14: once per vector
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                cosine_with_norms(
                    F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
        .filter(
            (F.col("cos") >= F.lit(float(floor_cos)))
            & (F.col("cos") < F.lit(float(ceil_cos)))
        )
    )
    return _topk_per_query(scored, k, n_salts=n_salts)


def jl_signs(out_dim: int, in_dim: int, seed: str = "jl") -> list[list[int]]:
    """Deterministic ±1 Johnson-Lindenstrauss projection matrix from md5
    of (seed, row, col) — computed ONCE in Python and baked into the plan
    as literal coefficients, so both engines evaluate the identical
    expression (no runtime hashing)."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{seed}:{k}:{i}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for k in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    out_dim: int = 8,
    seed: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a ±1
    (Achlioptas 2003) projection, in EXACT integer arithmetic::

        (id, p0..p{K-1})    p_k = Σ_i s_ki · round(vec[i]·10⁶)

    Distances contract by a known factor (·√K after /10⁶ descaling), so
    the projected space feeds the existing ANN/near-dup operators at K/D
    of the shuffle width — the standard recipe for embedding columns too
    wide to band directly. Each component rounds to micro BEFORE the
    signed sum (integer fold — aggregation order can never perturb), and
    the ±1 coefficients are plan literals from :func:`jl_signs`.
    Scan-side expression: zero shuffles, zero UDFs.

    Expression shape matters here: the micro-quantization runs ONCE per
    input component via ``transform`` and each output is an
    ``aggregate(zip_with(micro, sign_literals))`` fold — the naive
    unrolled form (K·D element_at/round terms, 512 nodes at 64→8)
    re-quantized every component K times and measured 5.9× slower
    (bit-identical outputs, pinned by the oracle parity tests).
    """
    signs = jl_signs(out_dim, in_dim, seed)
    micro = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    base = df.select(F.col(id_col), micro.alias("_m"))
    outs = [
        F.aggregate(
            F.zip_with(
                F.col("_m"),
                F.array(*[F.lit(s) for s in signs[k]]),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias(f"p{k}")
        for k in range(out_dim)
    ]
    return base.select(F.col(id_col), *outs)


def jl_project_sql(
    table_expr: str,
    id_expr: str,
    vec_expr: str,
    in_dim: int,
    out_dim: int = 8,
    seed: str = "jl",
) -> str:
    """DuckDB rendering of :func:`jl_project` — identical literal signs,
    identical per-component round-then-sum sequence."""
    signs = jl_signs(out_dim, in_dim, seed)

    def comp(k: int) -> str:
        terms = [
            ("+" if signs[k][i] == 1 else "-")
            + f" CAST(round(CAST({vec_expr}[{i + 1}] AS DOUBLE) * 1000000.0) AS BIGINT) "
            for i in range(in_dim)
        ]
        body = "".join(terms).lstrip("+ ")
        return f"CAST({body} AS BIGINT) AS p{k}"

    comps = ",\n       ".join(comp(k) for k in range(out_dim))
    return f"""
SELECT {id_expr},
       {comps}
FROM {table_expr}
"""


def reciprocal_rank_fusion(
    ranked: list[DataFrame], id_col: str, rank_col: str, k: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    N independent rankings of the same candidate space::

        rrf_micro(d) = Σ_lists  10⁶ div (k + rank_list(d))

    The standard score-free hybrid-retrieval combiner (lexical + semantic
    rankings fuse without any score calibration, since only RANKS enter).
    Each contribution is an EXACT integer (``10⁶ div (k+r)``), so the fold
    is order-independent and engine-portable. Returns
    ``(id, n_lists, rrf_micro)``: ``n_lists`` = how many rankings contain
    the candidate (absent = contributes 0, the conventional treatment).

    Scale: one union of the ranked frames (each already top-k-bounded by
    its producer) + one map-side-combinable groupBy on the id — the fusion
    itself never touches the corpus, only the candidate lists.
    """
    if not ranked:
        raise ValueError("reciprocal_rank_fusion needs >= 1 ranked frame")
    parts = [
        df.select(
            F.col(id_col),
            F.expr(f"CAST(1000000L div ({k} + CAST({rank_col} AS BIGINT)) AS BIGINT)")
            .alias("_contrib"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.sum("_contrib").cast("long").alias("rrf_micro"),
    )


def reciprocal_rank_fusion_sql(
    ranked_ctes: list[str], id_expr: str, rank_expr: str, k: int = 60
) -> str:
    """DuckDB rendering of :func:`reciprocal_rank_fusion`; each CTE body
    must select (id, rank) columns named by ``id_expr``/``rank_expr``."""
    unions = "\nUNION ALL\n".join(
        f"SELECT {id_expr} AS id, CAST(1000000 // ({k} + CAST({rank_expr} AS BIGINT)) AS BIGINT)"
        f" AS contrib FROM ({cte})"
        for cte in ranked_ctes
    )
    return f"""
WITH u AS ({unions})
SELECT id AS {id_expr},
       CAST(count(*) AS BIGINT) AS n_lists,
       CAST(sum(contrib) AS BIGINT) AS rrf_micro
FROM u GROUP BY id
"""


def ann_recall_eval(
    truth: DataFrame, cand: DataFrame,
    query_col: str = "query_id", neighbor_col: str = "neighbor_id",
    k: int = 5,
) -> DataFrame:
    """Recall@k of an ANN candidate list against an exact ground-truth
    list — the evaluation harness that closes the ANN loop (brute force
    is the truth at eval scale; IVF/LSH/PQ are the candidates): a
    recall floor belongs in the pipeline as a QUERY, not just a pytest,
    so the monitor reruns on every corpus refresh::

        (n_queries, recall_sum_ppm, min_recall_ppm, n_perfect)

    Per query ``recall_ppm = |truth ∩ cand|·10⁶ div k`` (exact
    integers; mean = recall_sum_ppm / n_queries, left to the consumer
    to keep the frame integer-only). Queries the candidate list missed
    entirely count at 0 (left join from the truth side).

    Scale: one equi-join on (query, neighbor) between two ≤k·n_queries
    lists + two bounded folds. Never touches the corpus.

    r14 optimization (guide §1.2 — don't compute things twice): the
    original shape referenced the TRUTH pipeline twice (semi-join probe
    + a distinct for the query universe) under incompatible
    partitionings, so an expensive ground-truth generator (the battery
    feeds the full brute-force ANN here) executed two end-to-end
    passes. One LEFT join against the distinct candidate list with a
    membership flag computes per-query hits from a single evaluation of
    each side — identical values (the flag-sum ≡ the semi-join count;
    zero-hit queries coalesce to 0 exactly as the old left join did).
    """
    t = truth.select(
        F.col(query_col).alias("_q"), F.col(neighbor_col).alias("_n")
    )
    c = (
        cand.select(
            F.col(query_col).alias("_q"), F.col(neighbor_col).alias("_n")
        )
        .distinct()  # preserves semi-join semantics under duplicate rows
        .withColumn("_hit", F.lit(1))
    )
    per_q = (
        t.join(c, ["_q", "_n"], "left")
        .groupBy("_q")
        .agg(F.sum("_hit").alias("_h"))
        .select(
            "_q",
            F.expr(
                f"CAST(coalesce(_h, 0) * 1000000L div {k} AS BIGINT)"
            ).alias("_r"),
        )
    )
    return per_q.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("_r").cast("long").alias("recall_sum_ppm"),
        F.min("_r").cast("long").alias("min_recall_ppm"),
        F.sum((F.col("_r") == 1000000).cast("long")).cast("long").alias("n_perfect"),
    )


def ann_recall_eval_sql(
    truth_sql: str, cand_sql: str, k: int = 5,
    query_col: str = "query_id", neighbor_col: str = "neighbor_id",
) -> str:
    """DuckDB rendering of :func:`ann_recall_eval` over two full query
    texts (each may carry its own WITH clause — nested in parenthesized
    subqueries)."""
    return f"""
WITH t AS (SELECT {query_col} AS q, {neighbor_col} AS n FROM ({truth_sql})),
c AS (SELECT {query_col} AS q, {neighbor_col} AS n FROM ({cand_sql})),
hits AS (
  SELECT t.q, count(*) AS h FROM t SEMI JOIN c ON t.q = c.q AND t.n = c.n
  GROUP BY 1
),
per_q AS (
  SELECT tq.q, CAST(coalesce(h.h, 0) * 1000000 // {k} AS BIGINT) AS r
  FROM (SELECT DISTINCT q FROM t) tq LEFT JOIN hits h USING (q)
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(r) AS BIGINT) AS recall_sum_ppm,
       CAST(min(r) AS BIGINT) AS min_recall_ppm,
       CAST(sum(CASE WHEN r = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_perfect
FROM per_q
"""


def kmeans_step_quantized(
    df: DataFrame, id_col: str, vec_col: str, label_col: str,
    dim: int, scale: int = 1000,
) -> DataFrame:
    """One ORACLE-CHECKABLE Lloyd iteration over integer-quantized
    embeddings: centroid = element-wise floored mean of each current
    cluster, reassignment = nearest centroid by exact integer L2², ties
    to the smaller label. :func:`train_ivf_centroids` is the production
    trainer (float means, pytest-pinned); this is the same step made
    engine-portable — quantize to ``round(e·scale)`` BIGINTs and every
    downstream number (centroids, distances, assignment) is exact, so
    the full clustering step sits under the cross-engine gate instead of
    only a recall floor. Emits per vector::

        (id, label, new_label, dist_sq)

    Scale: centroids via posexplode → (label, pos) sum/count (n·dim
    scalar rows, map-side combinable) → floored mean (sign-safe pmod
    div) → sorted re-pack; assignment via constant-key broadcast of the
    k-row codebook + one zip_with/aggregate integer fold per (vector,
    centroid) + min(struct(dist, label)) — no window over the corpus.
    """
    q = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("long").alias("_lbl"),
        F.transform(
            F.col(vec_col),
            lambda e: F.round(e.cast("double") * F.lit(float(scale))).cast("long"),
        ).alias("_q"),
    ).localCheckpoint(eager=False)  # centroid pass + assignment pass
    sums = (
        q.select("_lbl", F.posexplode("_q").alias("_pos", "_x"))
        .groupBy("_lbl", "_pos")
        .agg(
            F.sum("_x").cast("long").alias("_s"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
        .withColumn(
            "_c",
            F.expr("CAST((_s - pmod(_s, _n)) div _n AS BIGINT)"),
        )
    )
    cents = (
        sums.groupBy("_lbl")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), F.col("_c")))
            ).alias("_pairs")
        )
        .select(
            F.col("_lbl").alias("_cl"),
            F.transform(F.col("_pairs"), lambda p: p._c).alias("_cv"),
        )
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    dist = F.aggregate(
        F.zip_with(
            F.col("_q"), F.col("_cv"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        q.withColumn("_one", one)
        .join(F.broadcast(cents.withColumn("_one", one)), "_one")
        .withColumn("_d", dist)
    )
    best = (
        scored.groupBy("_id", "_lbl")
        .agg(F.min(F.struct(F.col("_d"), F.col("_cl"))).alias("_m"))
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("_lbl").alias("label"),
        F.col("_m._cl").cast("long").alias("new_label"),
        F.col("_m._d").cast("long").alias("dist_sq"),
    )


def kmeans_step_quantized_sql(
    table_expr: str, id_expr: str, vec_expr: str, label_expr: str,
    dim: int, scale: int = 1000,
) -> str:
    """DuckDB rendering of :func:`kmeans_step_quantized` (same
    quantization, same floored means, same integer L2² and tie-break)."""
    return f"""
WITH q AS (
  SELECT {id_expr} AS id, CAST({label_expr} AS BIGINT) AS lbl,
         list_transform({vec_expr},
                        e -> CAST(round(CAST(e AS DOUBLE) * {scale}.0) AS BIGINT)) AS qv
  FROM {table_expr}
),
expl AS (
  SELECT lbl, u.i AS pos, qv[u.i] AS x
  FROM q, unnest(range(1, {dim} + 1)) AS u(i)
),
sums AS (
  SELECT lbl, pos, CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM expl GROUP BY 1, 2
),
cents AS (
  SELECT lbl AS cl,
         list((s - ((s % n) + n) % n) // n ORDER BY pos) AS cv
  FROM sums GROUP BY 1
),
scored AS (
  SELECT q.id, q.lbl, c.cl,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, {dim} + 1),
                          j -> (q.qv[j] - c.cv[j]) * (q.qv[j] - c.cv[j]))),
           (a, b) -> a + b) AS d
  FROM q CROSS JOIN cents c
),
best AS (
  SELECT id, lbl, cl, d,
         row_number() OVER (PARTITION BY id ORDER BY d ASC, cl ASC) AS rn
  FROM scored
)
SELECT id AS {id_expr}, lbl AS label, CAST(cl AS BIGINT) AS new_label,
       CAST(d AS BIGINT) AS dist_sq
FROM best WHERE rn = 1
"""


# --- sampled pair-distance histogram (r11): corpus geometry probe ----------

PDH_BUCKET_SIZE = 32


def pair_distance_histogram(
    df: DataFrame, id_col: str, vec_col: str,
    bucket_size: int = PDH_BUCKET_SIZE, scale: int = 1000,
) -> DataFrame:
    """HDR histogram of pairwise squared L2 distances over a
    DETERMINISTIC hash-sampled pair set — the corpus-geometry probe
    behind every ANN/dedup parameter choice (bucket widths, IVF cell
    counts, near-dup thresholds all key off "how far apart are random
    pairs")::

        (bucket_lo, n)

    Pairs are sampled structurally, not with rand(): vectors are hashed
    into ``B = ceil(n / bucket_size)`` buckets (md5 of the id — stable
    across runs and engines) and only same-bucket pairs are scored, an
    expected ``n·(bucket_size−1)/2`` pairs — LINEAR in n with a fixed
    per-bucket bound, never the n² cross join. Distances are exact
    integers over ``round(e·scale)`` quantized components (the
    kmeans_step_quantized discipline), HDR-bucketed by
    :func:`sketches.hdr_histogram` (≤ ~2k output rows ever).

    Scale: one count-anchor broadcast (no collect), one shuffle on the
    hash bucket, bounded self-join fan-in per bucket, and the histogram
    fold's map-side combine. The histogram is mergeable: shard corpora
    fold by adding counts.
    """
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_histogram
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    q = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.transform(
            F.col(vec_col),
            lambda e: F.round(e.cast("double") * F.lit(float(scale))).cast("long"),
        ).alias("_q"),
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    n_rows = q.agg(F.count(F.lit(1)).cast("long").alias("_n")).withColumn(
        "_one", one
    )
    bucketed = (
        q.withColumn("_one", one)
        .join(F.broadcast(n_rows), "_one")
        .withColumn(
            "_nb",
            F.greatest(
                F.expr(f"CAST((_n + {bucket_size} - 1) div {bucket_size} AS BIGINT)"),
                F.lit(1).cast("long"),
            ),
        )
        .withColumn("_bkt", F.pmod(md5_long(F.col("_id").cast("string")), F.col("_nb")))
        .select("_id", "_q", "_bkt")
    )
    dist_sq = F.aggregate(
        F.zip_with("_qa", "_qb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        bucketed.select("_bkt", F.col("_id").alias("_ia"), F.col("_q").alias("_qa"))
        .join(
            bucketed.select(
                "_bkt", F.col("_id").alias("_ib"), F.col("_q").alias("_qb")
            ),
            "_bkt",
        )
        .filter(F.col("_ia") < F.col("_ib"))
        .select(dist_sq.alias("dist_sq"))
    )
    return pairs.transform(hdr_histogram([], "dist_sq"))


def pair_distance_histogram_sql(
    table: str, id_expr: str, vec_expr: str,
    bucket_size: int = PDH_BUCKET_SIZE, scale: int = 1000,
) -> str:
    """DuckDB rendering of :func:`pair_distance_histogram` — same md5
    bucketing, same integer quantization and fold, same HDR buckets."""
    from dwh_etl_ods_spark_jobs_spark.sketches import QH_SIG_BITS
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(range(1, len(a._q) + 1),"
        " j -> (a._q[j] - b._q[j]) * (a._q[j] - b._q[j]))),"
        " (x, y) -> x + y)"
    )
    return f"""
WITH q AS (
  SELECT CAST({id_expr} AS BIGINT) AS _id,
         list_transform({vec_expr},
                        e -> CAST(round(CAST(e AS DOUBLE) * {scale}) AS BIGINT)) AS _q
  FROM {table}
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
bucketed AS (
  SELECT _id, _q,
         {md5_long_sql("CAST(_id AS VARCHAR)")}
           % greatest((n + {bucket_size} - 1) // {bucket_size}, 1) AS _bkt
  FROM q, n
),
pairs AS (
  SELECT {fold} AS dist_sq
  FROM bucketed a JOIN bucketed b ON a._bkt = b._bkt AND a._id < b._id
)
SELECT (dist_sq >> greatest(length(bin(dist_sq)) - {QH_SIG_BITS}, 0))
         << greatest(length(bin(dist_sq)) - {QH_SIG_BITS}, 0) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY 1
"""


def rec_list_eval(
    runs: DataFrame,
    catalog: DataFrame,
    query_col: str,
    item_col: str,
    cat_id_col: str,
    cat_vec_col: str,
) -> DataFrame:
    """Recommendation-list quality beyond relevance — the three standard
    beyond-accuracy numbers every recommender eval reports, in one row::

        (n_queries, n_rec_rows, n_items_recommended, catalog_n,
         coverage_ppm, mean_ild_ppm, exposure_gini_ppm)

    - ``mean_ild_ppm``: intra-list diversity — per query the mean
      pairwise cosine DISTANCE (``10⁶ − cos_ppm``) within its ≤k list
      (C(k,2) pairs, bounded), averaged over queries with ≥ 2 items;
      all-same lists score 0, orthogonal lists 10⁶.
    - ``coverage_ppm``: catalog coverage — distinct recommended items /
      catalog size.
    - ``exposure_gini_ppm``: exposure concentration over the FULL
      catalog (never-recommended items count as zero exposure), via
      :func:`operators.stats.gini_concentration` — 0 = perfectly even
      exposure, →10⁶ = a popularity monoculture.

    Cosines follow the house float discipline (``round(cos, 6)`` then
    exact ppm integers — the ann/dedup parity form); every mean is a
    truncated integer division.

    Scale: the pair stage self-joins ≤k-row lists per query (bounded
    fan-out, the mutual-kNN shape); vectors attach via two equi-joins
    on the item key; exposure is one grouped count + the
    rank-decomposed Gini. No uncapped key anywhere.
    """
    from dwh_etl_ods_spark_jobs_spark.dedup import cosine_with_norms, vec_norm
    from dwh_etl_ods_spark_jobs_spark.operators.stats import gini_concentration

    r = runs.select(
        F.col(query_col).alias("_q"), F.col(item_col).alias("_i")
    ).localCheckpoint(eager=False)  # pairs + exposure + counts
    cat = catalog.select(
        F.col(cat_id_col).alias("_ci"), F.col(cat_vec_col).alias("_cv"),
        vec_norm(F.col(cat_vec_col)).alias("_cn"),  # r14: once per item
    ).localCheckpoint(eager=False)  # two vector joins + universe + count
    a, b = r.alias("_a"), r.alias("_b")
    pairs = (
        a.join(b, (F.col("_a._q") == F.col("_b._q")) & (F.col("_a._i") < F.col("_b._i")))
        .select(F.col("_a._q").alias("_q"), F.col("_a._i").alias("_ia"), F.col("_b._i").alias("_ib"))
        .join(cat.select(F.col("_ci").alias("_ia"), F.col("_cv").alias("_va"), F.col("_cn").alias("_na")), "_ia")
        .join(cat.select(F.col("_ci").alias("_ib"), F.col("_cv").alias("_vb"), F.col("_cn").alias("_nb")), "_ib")
        .withColumn(
            "_dist_ppm",
            F.lit(1000000)
            - F.round(
                F.round(
                    cosine_with_norms(
                        F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
                    ),
                    6,
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    per_q = pairs.groupBy("_q").agg(
        F.expr("CAST(sum(_dist_ppm) div count(1) AS BIGINT)").alias("_ild")
    )
    ild = per_q.agg(
        F.expr(
            "CAST(CASE WHEN count(1) = 0 THEN NULL"
            " ELSE sum(_ild) div count(1) END AS BIGINT)"
        ).alias("mean_ild_ppm")
    )
    exposure = (
        cat.select(F.col("_ci").alias("_i"))
        .join(r.groupBy("_i").agg(F.count(F.lit(1)).cast("long").alias("_cnt")), "_i", "left")
        .select("_i", F.coalesce(F.col("_cnt"), F.lit(0)).alias("_cnt"))
        .withColumn("_g", F.lit(1))
    )
    gini = gini_concentration(exposure, ["_g"], "_cnt", ["_i"]).select(
        F.col("gini_ppm").alias("exposure_gini_ppm")
    )
    counts = r.agg(
        F.countDistinct("_q").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_rec_rows"),
        F.countDistinct("_i").cast("long").alias("n_items_recommended"),
    )
    cat_n = cat.agg(F.count(F.lit(1)).cast("long").alias("catalog_n"))
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    out = (
        counts.withColumn("_one", one)
        .join(F.broadcast(cat_n.withColumn("_one", one)), "_one")
        .join(F.broadcast(ild.withColumn("_one", one)), "_one")
        .join(F.broadcast(gini.withColumn("_one", one)), "_one")
    )
    return out.select(
        "n_queries",
        "n_rec_rows",
        "n_items_recommended",
        "catalog_n",
        F.expr(
            "CAST(n_items_recommended * 1000000 div catalog_n AS BIGINT)"
        ).alias("coverage_ppm"),
        "mean_ild_ppm",
        "exposure_gini_ppm",
    )


def rec_list_eval_sql(
    runs_sql: str,
    catalog_sql: str,
    query_col: str,
    item_col: str,
    cat_id_col: str,
    cat_vec_col: str,
    dim: int,
) -> str:
    """DuckDB rendering of :func:`rec_list_eval` — same rounded-cosine
    ppm distances, same truncated means, same full-catalog Gini."""
    from dwh_etl_ods_spark_jobs_spark.dedup import cosine_sql
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        gini_concentration_sql,
    )

    cos = cosine_sql("ca.v", "cb.v", dim)
    gini_inner = gini_concentration_sql(
        """(SELECT 1 AS g, i, cnt FROM (
  SELECT cat.i, coalesce(e.cnt, 0) AS cnt
  FROM (SELECT id AS i FROM catv) cat
  LEFT JOIN (SELECT item AS i, CAST(count(*) AS BIGINT) AS cnt
             FROM runsv GROUP BY 1) e ON e.i = cat.i
)) ge""",
        ["g"],
        "cnt",
        ["i"],
    )
    return f"""
WITH runsv AS (
  SELECT {query_col} AS q, {item_col} AS item FROM ({runs_sql}) rsrc
),
catv AS (
  SELECT {cat_id_col} AS id, {cat_vec_col} AS v FROM ({catalog_sql}) csrc
),
pairs AS (
  SELECT a.q,
         1000000 - CAST(round(round({cos}, 6) * 1000000.0) AS BIGINT)
           AS dist_ppm
  FROM runsv a
  JOIN runsv b ON a.q = b.q AND a.item < b.item
  JOIN catv ca ON ca.id = a.item
  JOIN catv cb ON cb.id = b.item
),
per_q AS (
  SELECT q, CAST(sum(dist_ppm) // count(*) AS BIGINT) AS ild
  FROM pairs GROUP BY 1
),
ild AS (
  SELECT CAST(CASE WHEN count(*) = 0 THEN NULL
              ELSE sum(ild) // count(*) END AS BIGINT) AS mean_ild_ppm
  FROM per_q
),
gini AS (
  SELECT gini_ppm AS exposure_gini_ppm FROM ({gini_inner}) gv
),
counts AS (
  SELECT CAST(count(DISTINCT q) AS BIGINT) AS n_queries,
         CAST(count(*) AS BIGINT) AS n_rec_rows,
         CAST(count(DISTINCT item) AS BIGINT) AS n_items_recommended
  FROM runsv
),
catn AS (SELECT CAST(count(*) AS BIGINT) AS catalog_n FROM catv)
SELECT counts.n_queries, counts.n_rec_rows, counts.n_items_recommended,
       catn.catalog_n,
       CAST(counts.n_items_recommended * 1000000 // catn.catalog_n
            AS BIGINT) AS coverage_ppm,
       ild.mean_ild_ppm, gini.exposure_gini_ppm
FROM counts, catn, ild, gini
"""


def _int_l2sq(vec_a: Column, vec_b: Column) -> Column:
    """Exact INTEGER squared L2 between two int-code arrays (the
    quantize_embeddings codes): a BIGINT fold, no floats anywhere."""
    return F.aggregate(
        F.zip_with(
            vec_a,
            vec_b,
            lambda x, y: (x.cast("long") - y.cast("long"))
            * (x.cast("long") - y.cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kcenter_greedy_select(
    df: DataFrame, id_col: str, code_col: str, k: int
) -> DataFrame:
    """Greedy k-center (max-min / farthest-point-first) selection over
    quantized embedding codes — the coreset picker behind diverse
    training-sample selection and active-learning batch choice (Gonzalez
    1985 2-approximation; Sener & Savarese, ICLR'18, for the coreset
    framing). Each round adds the point FARTHEST from everything chosen
    so far, so k points cover the corpus with the smallest radius
    achievable within 2x of optimal::

        (sel_round, doc_id, radius2)

    ``radius2`` is the pick's exact INTEGER squared L2 distance to the
    previously selected set (monotonically non-increasing — the
    coverage-radius curve; NULL for the round-0 seed). Codes are
    ``quantize_embeddings`` int arrays; distances are pure BIGINT folds
    — no floats, both engines bit-identical. Seed = minimum id
    (deterministic; farthest-first keeps its bound from any seed); ties
    break toward the smaller id. Points at distance 0 from a chosen
    center (exact duplicates, including the centers themselves) are
    never picked again — coverage there is already perfect. Contract:
    ``k`` ≤ number of distinct points.

    Scale: k rounds, each ONE constant-key broadcast of the single new
    center + a map-side min-distance update + one argmax fold
    (``max(struct(dist, -id))`` — no window, no sort); the running
    frame localCheckpoints per round (the iterative-graph lineage
    discipline). Never a pairwise join: O(k·n) distance evaluations
    total, the textbook bound.
    """
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    state = (
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(code_col).alias("_q"),
        )
        .withColumn("_one", one)
        .localCheckpoint(eager=False)
    )
    seed = state.groupBy("_one").agg(F.min("_id").alias("_cid"))
    picks = [
        seed.select(
            "_one",
            F.lit(0).cast("long").alias("sel_round"),
            F.col("_cid"),
            F.lit(None).cast("long").alias("radius2"),
        )
    ]
    cur = state.withColumn("_mind", F.lit(None).cast("long"))
    for r in range(1, int(k)):
        center = state.join(
            F.broadcast(picks[-1].select(F.col("_one").alias("_co"), "_cid")),
            F.col("_id") == F.col("_cid"),
        ).select("_co", F.col("_q").alias("_cq"))
        cur = (
            cur.join(F.broadcast(center), F.col("_one") == F.col("_co"))
            .select(
                "_one",
                "_id",
                "_q",
                F.least(
                    F.coalesce(F.col("_mind"), F.lit(2**62).cast("long")),
                    _int_l2sq(F.col("_q"), F.col("_cq")),
                ).alias("_mind"),
            )
            .localCheckpoint(eager=False)
        )
        picks.append(
            cur.where(F.col("_mind") > 0)
            .groupBy("_one")
            .agg(
                F.max(
                    F.struct(F.col("_mind"), (-F.col("_id")).alias("_ni"))
                ).alias("_m")
            )
            .select(
                "_one",
                F.lit(r).cast("long").alias("sel_round"),
                (-F.col("_m._ni")).alias("_cid"),
                F.col("_m._mind").alias("radius2"),
            )
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("sel_round"),
        F.col("_cid").cast("long").alias("doc_id"),
        F.col("radius2").cast("long").alias("radius2"),
    )


def kcenter_greedy_select_sql(
    points_cte: str, id_expr: str, code_expr: str, k: int
) -> str:
    """DuckDB rendering of :func:`kcenter_greedy_select` — the k rounds
    unrolled as CTE pairs (min-distance update, then argmax pick), same
    BIGINT fold, same smaller-id tie-break, same mind>0 exclusion."""

    def d2(a: str, b: str) -> str:
        diff = f"(CAST({a}.q[j] AS BIGINT) - CAST({b}.q[j] AS BIGINT))"
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(range(1, len({a}.q) + 1), j -> {diff} * {diff})), "
            f"(x, y) -> x + y)"
        )

    ctes = [
        f"pts AS (SELECT CAST({id_expr} AS BIGINT) AS id, {code_expr} AS q "
        f"FROM {points_cte})",
        "s0 AS (SELECT min(id) AS cid FROM pts)",
    ]
    outs = [
        "SELECT CAST(0 AS BIGINT) AS sel_round, cid AS doc_id, "
        "CAST(NULL AS BIGINT) AS radius2 FROM s0"
    ]
    prev_m, prev_sel = None, "s0"
    for r in range(1, int(k)):
        base = "pts" if prev_m is None else prev_m
        mind_src = "CAST(NULL AS BIGINT)" if prev_m is None else "b.mind"
        ctes.append(
            f"m{r} AS (SELECT b.id, b.q, "
            f"least(coalesce({mind_src}, CAST(4611686018427387904 AS BIGINT)), "
            f"{d2('b', 'c')}) AS mind "
            f"FROM {base} b, "
            f"(SELECT p.q FROM pts p JOIN {prev_sel} ps ON p.id = ps.cid) c)"
        )
        ctes.append(
            f"s{r} AS (SELECT CAST({r} AS BIGINT) AS sel_round, id AS cid, "
            f"mind AS radius2 FROM m{r} WHERE mind > 0 "
            f"ORDER BY mind DESC, id ASC LIMIT 1)"
        )
        outs.append(f"SELECT sel_round, cid AS doc_id, radius2 FROM s{r}")
        prev_m, prev_sel = f"m{r}", f"s{r}"
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(outs)


def mmr_rerank(
    cands: DataFrame,
    query_col: str,
    doc_col: str,
    rel_col: str,
    code_col: str,
    k: int,
    lambda_ppm: int = 700_000,
) -> DataFrame:
    """Maximal Marginal Relevance rerank of per-query candidate lists
    (Carbonell & Goldstein, SIGIR'98) — the standard diversity pass
    between retrieval and a RAG context window: greedily pick the
    candidate with the best blend of relevance and DISTANCE from what's
    already picked::

        (query, sel_round, doc, mmr_score)

    With quantized codes and similarity = −L2², the MMR objective
    ``λ·rel − (1−λ)·max_sim(d, selected)`` becomes the pure-BIGINT
    ``score = λ_ppm·rel_micro + (10⁶−λ_ppm)·min_dist²(d, selected)`` —
    no floats anywhere, ties to the smaller doc id. Round 0 picks the
    most relevant candidate per query (its score carries the relevance
    term only, the MMR convention). A doc is picked at most once
    (explicit selected-flag, so exact-duplicate candidates are still
    eligible — unlike k-center, MMR may legitimately pick a duplicate
    if relevance dominates).

    Contract: candidate lists are CALLER-BOUNDED (≤ m per query — the
    retrieval top-m), as in every rerank op here; ``k`` ≤ m.

    Scale: ALL queries advance in parallel — each of the k rounds is
    one equi-join of the candidate frame with the per-query pick frame
    (uniform query keys, one row per query) + one argmax fold. No
    window, no per-query loop, no cross join; O(k·Σm) distance
    evaluations.
    """
    lam = int(lambda_ppm)
    inv = 1_000_000 - lam
    # NULL-relevance candidates are excluded up front on BOTH engines:
    # a NULL inside the argmax struct would hit engine-specific null
    # ordering — the caller scores every candidate or it isn't one
    state = cands.where(F.col(rel_col).isNotNull()).select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).cast("long").alias("_d"),
        F.col(rel_col).cast("long").alias("_rel"),
        F.col(code_col).alias("_v"),
        F.lit(None).cast("long").alias("_mind"),
        F.lit(0).alias("_sel"),
    ).localCheckpoint(eager=False)
    picks = []
    pick0 = (
        state.groupBy("_q")
        .agg(F.max(F.struct(F.col("_rel"), (-F.col("_d")).alias("_nd"))).alias("_m"))
        .select(
            "_q",
            F.lit(0).cast("long").alias("sel_round"),
            (-F.col("_m._nd")).alias("_pick"),
            (F.col("_m._rel") * F.lit(lam)).cast("long").alias("mmr_score"),
        )
    )
    picks.append(pick0)
    cur = state
    for r in range(1, int(k)):
        prev0 = picks[-1].select(
            F.col("_q").alias("_pq0"), F.col("_pick").alias("_p0")
        )
        center = cur.join(
            prev0,
            (F.col("_q") == F.col("_pq0")) & (F.col("_d") == F.col("_p0")),
        ).select(F.col("_q").alias("_cq"), F.col("_v").alias("_cv"))
        prev_mark = picks[-1].select(
            F.col("_q").alias("_pq"), F.col("_pick").alias("_p")
        )
        cur = (
            cur.join(center, F.col("_q") == F.col("_cq"))
            .join(
                prev_mark,
                (F.col("_q") == F.col("_pq")) & (F.col("_d") == F.col("_p")),
                "left",
            )
            .select(
                "_q",
                "_d",
                "_rel",
                "_v",
                F.least(
                    F.coalesce(F.col("_mind"), F.lit(2**62).cast("long")),
                    _int_l2sq(F.col("_v"), F.col("_cv")),
                ).alias("_mind"),
                F.greatest(
                    F.col("_sel"), F.col("_p").isNotNull().cast("int")
                ).alias("_sel"),
            )
            .localCheckpoint(eager=False)
        )
        score = (
            F.col("_rel") * F.lit(lam) + F.col("_mind") * F.lit(inv)
        ).cast("long")
        picks.append(
            cur.where(F.col("_sel") == 0)
            .groupBy("_q")
            .agg(
                F.max(
                    F.struct(score.alias("_s"), (-F.col("_d")).alias("_nd"))
                ).alias("_m")
            )
            .select(
                "_q",
                F.lit(r).cast("long").alias("sel_round"),
                (-F.col("_m._nd")).alias("_pick"),
                F.col("_m._s").alias("mmr_score"),
            )
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("_q").alias("query"),
        "sel_round",
        F.col("_pick").alias("doc"),
        "mmr_score",
    )


def mmr_rerank_sql(
    cands_cte: str,
    query_expr: str,
    doc_expr: str,
    rel_expr: str,
    code_expr: str,
    k: int,
    lambda_ppm: int = 700_000,
) -> str:
    """DuckDB rendering of :func:`mmr_rerank` — k unrolled CTE rounds,
    same BIGINT blend, same smaller-doc tie-break, per-query argmax via
    a window rank."""
    lam = int(lambda_ppm)
    inv = 1_000_000 - lam

    def d2(a: str, b: str) -> str:
        diff = f"(CAST({a}.v[j] AS BIGINT) - CAST({b}.cv[j] AS BIGINT))"
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(range(1, len({a}.v) + 1), j -> {diff} * {diff})), "
            f"(x, y) -> x + y)"
        )

    ctes = [
        f"cand AS (SELECT {query_expr} AS q, CAST({doc_expr} AS BIGINT) AS d, "
        f"CAST({rel_expr} AS BIGINT) AS rel, {code_expr} AS v FROM {cands_cte} "
        f"WHERE {rel_expr} IS NOT NULL)",
        f"""p0 AS (
  SELECT q, CAST(0 AS BIGINT) AS sel_round, d AS pick,
         CAST(rel * {lam} AS BIGINT) AS mmr_score
  FROM (SELECT q, d, rel,
               row_number() OVER (PARTITION BY q
                                  ORDER BY rel DESC, d ASC) AS rn
        FROM cand) WHERE rn = 1
)""",
    ]
    outs = ["SELECT q, sel_round, pick, mmr_score FROM p0"]
    prev_m, sel_union = None, "SELECT q, pick FROM p0"
    for r in range(1, int(k)):
        base = "cand" if prev_m is None else f"m{r - 1}"
        mind_src = "CAST(NULL AS BIGINT)" if prev_m is None else "b.mind"
        ctes.append(
            f"""m{r} AS (
  SELECT b.q, b.d, b.rel, b.v,
         least(coalesce({mind_src}, CAST(4611686018427387904 AS BIGINT)),
               {d2("b", "c")}) AS mind
  FROM {base} b JOIN (
    SELECT ca.q AS cq, ca.v AS cv
    FROM cand ca JOIN p{r - 1} pk ON ca.q = pk.q AND ca.d = pk.pick
  ) c ON b.q = c.cq
)"""
        )
        ctes.append(
            f"""p{r} AS (
  SELECT q, CAST({r} AS BIGINT) AS sel_round, d AS pick,
         CAST(rel * {lam} + mind * {inv} AS BIGINT) AS mmr_score
  FROM (SELECT m.q, m.d, m.rel, m.mind,
               row_number() OVER (PARTITION BY m.q
                  ORDER BY m.rel * {lam} + m.mind * {inv} DESC, m.d ASC) AS rn
        FROM m{r} m
        WHERE NOT EXISTS (SELECT 1 FROM ({sel_union}) s
                          WHERE s.q = m.q AND s.pick = m.d))
  WHERE rn = 1
)"""
        )
        outs.append(f"SELECT q, sel_round, pick, mmr_score FROM p{r}")
        sel_union = sel_union + f" UNION ALL SELECT q, pick FROM p{r}"
        prev_m = f"m{r}"
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT q AS query, sel_round, "
        "pick AS doc, mmr_score FROM (\n"
        + "\nUNION ALL\n".join(outs)
        + "\n) _mmr_all"
    )


def simplified_silhouette(
    points: DataFrame,
    centroids: DataFrame,
    id_col: str,
    code_col: str,
    cid_col: str = "cid",
    centroid_code_col: str = "q",
) -> DataFrame:
    """Simplified silhouette of a centroid clustering over quantized
    codes — the cluster-quality eval that closes the k-means loop
    (Hruschka et al. 2004: distances to CENTROIDS instead of all
    pairwise, which is what makes silhouette computable at corpus
    scale)::

        (cid, n_points, mean_silhouette_ppm, overall_silhouette_ppm)

    Per point: ``a = dist(point, nearest centroid)``, ``b = dist(point,
    second-nearest)``, ``s = (b − a)/b`` (b ≥ a always, so the classic
    max(a,b) denominator IS b). Distances are sqrt of exact BIGINT
    squared distances — one fixed IEEE sqrt/div sequence per point,
    rounded to ppm BEFORE the per-cluster mean (integer ``sum div n``).
    ``b = 0`` (duplicate centroids on top of the point) → s = 0,
    explicit both engines. Assignment ties break to the smaller cid.
    ``overall`` is the unweighted mean over points (integer div),
    repeated per row (the density_ratio convention).

    The centroid frame's columns are ``cid_col`` (cluster id, default
    ``cid``) and ``centroid_code_col`` (quantized code array, default
    ``q``) — parameterized like the point frame's id/code columns.

    Scale: ONE broadcast of the bounded centroid frame against the
    point scan; the per-point rank window partitions on the point id
    over exactly k rows (uniform keys, bounded frame). No self-join.
    """
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    cen = centroids.select(
        F.col(cid_col).cast("long").alias("_cid"),
        F.col(centroid_code_col).alias("_cq"),
    ).withColumn("_one", one)
    # constant-key BROADCAST HASH join (the Markov scenario-grid
    # pattern) — never an unconditioned nested loop
    pair = (
        points.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(code_col).alias("_v"),
        )
        .withColumn("_one", one)
        .join(F.broadcast(cen), "_one")
    )
    d2 = _int_l2sq(F.col("_v"), F.col("_cq"))
    w = Window.partitionBy("_id").orderBy("_d2", "_cid")  # k-row frame
    ranked = pair.select("_id", "_cid", d2.alias("_d2")).withColumn(
        "_rn", F.row_number().over(w)
    )
    per_point = ranked.where(F.col("_rn") <= 2).groupBy("_id").agg(
        F.max(F.when(F.col("_rn") == 1, F.col("_cid"))).alias("cid"),
        F.max(F.when(F.col("_rn") == 1, F.col("_d2"))).alias("_a2"),
        F.max(F.when(F.col("_rn") == 2, F.col("_d2"))).alias("_b2"),
    )
    s_ppm = F.when(
        F.coalesce(F.col("_b2"), F.lit(0)) == 0, F.lit(0).cast("long")
    ).otherwise(
        F.round(
            (F.sqrt(F.col("_b2").cast("double")) - F.sqrt(F.col("_a2").cast("double")))
            / F.sqrt(F.col("_b2").cast("double"))
            * F.lit(1000000.0)
        ).cast("long")
    )
    scored = per_point.select("cid", s_ppm.alias("_s")).localCheckpoint(
        eager=False
    )  # cluster fold + overall fold
    per_c = scored.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("_s").cast("long").alias("_ss"),
    )
    overall = scored.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_s").cast("long").alias("_st"),
    ).select(
        F.lit(0).alias("_k"),
        F.expr("_st div _n").alias("overall_silhouette_ppm"),
    )
    return (
        per_c.withColumn("_k", F.lit(0))
        .join(F.broadcast(overall), "_k")
        .select(
            "cid",
            "n_points",
            F.expr("_ss div n_points").alias("mean_silhouette_ppm"),
            "overall_silhouette_ppm",
        )
    )


def simplified_silhouette_sql(
    points_cte: str, centroids_cte: str, id_expr: str, code_expr: str
) -> str:
    """DuckDB rendering of :func:`simplified_silhouette` — same rank
    pick, same fixed sqrt/div sequence, same integer means."""
    d2 = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(1, len(p.v) + 1), "
        "j -> (CAST(p.v[j] AS BIGINT) - CAST(c.cq[j] AS BIGINT))"
        " * (CAST(p.v[j] AS BIGINT) - CAST(c.cq[j] AS BIGINT)))), "
        "(x, y) -> x + y)"
    )
    return f"""
WITH pts AS (SELECT CAST({id_expr} AS BIGINT) AS id, {code_expr} AS v
             FROM {points_cte}),
cen AS (SELECT CAST(cid AS BIGINT) AS cid, q AS cq FROM {centroids_cte}),
ranked AS (
  SELECT p.id, c.cid, {d2} AS d2,
         row_number() OVER (PARTITION BY p.id
                            ORDER BY {d2}, c.cid) AS rn
  FROM pts p, cen c
),
per_point AS (
  SELECT id,
         max(CASE WHEN rn = 1 THEN cid END) AS cid,
         max(CASE WHEN rn = 1 THEN d2 END) AS a2,
         max(CASE WHEN rn = 2 THEN d2 END) AS b2
  FROM ranked WHERE rn <= 2 GROUP BY id
),
scored AS (
  SELECT cid,
         CASE WHEN coalesce(b2, 0) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round((sqrt(CAST(b2 AS DOUBLE))
                               - sqrt(CAST(a2 AS DOUBLE)))
                              / sqrt(CAST(b2 AS DOUBLE))
                              * 1000000.0) AS BIGINT) END AS s
  FROM per_point
),
per_c AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_points,
         CAST(sum(s) AS BIGINT) AS ss
  FROM scored GROUP BY cid
),
overall AS (
  SELECT CAST(sum(s) // count(*) AS BIGINT) AS overall_silhouette_ppm
  FROM scored
)
SELECT cid, n_points, CAST(ss // n_points AS BIGINT) AS mean_silhouette_ppm,
       overall_silhouette_ppm
FROM per_c, overall
"""
