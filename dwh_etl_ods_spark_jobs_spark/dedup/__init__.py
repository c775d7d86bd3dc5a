"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all shuffle-conscious and expression-first (no Python
UDFs in any hot path):

- **exact**          — hash-groupBy on the normalized-text md5. One shuffle
                       on a uniformly-distributed 128-bit key: no skew.
- **n-gram Jaccard** — token-shingle blocking (explode + equi-join on the
                       shingle hash) then exact Jaccard on candidate pairs.
                       Never materializes the O(n^2) cross join.
- **MinHash + LSH**  — K portable 60-bit min-hashes over shingles, banded
                       into B bands; candidates = pairs sharing a band key
                       (equi-join on (band_idx, band_hash)); verification =
                       estimated Jaccard from signature agreement.
- **SimHash**        — 60-bit frequency-weighted bit-vote signature via one
                       explode + groupBy pass (map-side partial agg);
                       near-dup pairs via pigeonhole banding (hamming<=3 in
                       4 bands of 15 bits => at least one band equal).
- **embedding near-dup** — deterministic hyperplane-LSH bucketing over an
                       ``array<float>`` column, exact-cosine verification
                       inside buckets only.

Scale notes (100 TB): every strategy's only shuffles are (a) the explode->
equi-join on short keys and (b) a distinct on candidate pairs — both
AQE-coalescible; band/bucket keys are hashes, so partitioning is uniform by
construction. Signature computation is per-row, embarrassingly parallel.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_etl_ods_spark_jobs_spark.text import (
    md5_long,
    md5_long_sql,
    normalize_text,
    normalize_text_sql,
    tokens,
    tokens_sql,
)

# --- shared constants (drive BOTH the Spark exprs and the DuckDB oracles) ---

SHINGLE_W = 3          # tokens per shingle
MINHASH_K = 16         # minhash components
LSH_BANDS = 4          # bands (rows per band = MINHASH_K // LSH_BANDS)
LSH_ROWS = MINHASH_K // LSH_BANDS
SIMHASH_BITS = 60      # bits in the simhash signature (fits signed 64-bit)
SIMHASH_BANDS = 4      # pigeonhole bands -> guarantees recall for hamming <= 3
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
HYPERPLANES = 16       # hyperplane-LSH signature bits for embeddings


# --- token shingles ---

def shingles(text_col: Column, w: int = SHINGLE_W) -> Column:
    """Distinct ``w``-token shingles (array<string>) of a text column."""
    toks = tokens(text_col)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, w), " "),
    )
    return F.array_distinct(sh)


def shingles_of(toks_col: Column, w: int = SHINGLE_W) -> Column:
    """Distinct ``w``-token shingles from a MATERIALIZED token-array
    column. Use this (after ``withColumn("_toks", tokens(text))``) in
    anything that scans a whole corpus: common-subexpression elimination
    does not reach inside higher-order-function lambdas, so
    :func:`shingles` over inline text re-runs the regex tokenizer once
    PER SHINGLE POSITION — O(len²) per document (measured 2.6× on the
    prefix-filter posting scan at sf0.1). Same output, same hashes."""
    n = F.size(toks_col)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks_col, i, w), " "),
    )
    return F.array_distinct(sh)


def shingles_sql(expr: str, w: int = SHINGLE_W) -> str:
    # coalesce: DuckDB's array_to_string([]) is NULL (Spark's array_join
    # is '') and list_distinct then DROPS the NULL — without it a
    # token-less document loses its whole-text '' shingle and silently
    # vanishes from every shingle posting the oracle builds, while the
    # Spark side keeps it (caught by the randomized cross-engine pin;
    # the fixed testdata has no token-less documents).
    toks = tokens_sql(expr)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {w - 1}, 1) + 1),"
        f" i -> coalesce(array_to_string(({toks})[i:i+{w - 1}], ' '), '')))"
    )


# --- 1. exact dedup ---

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by md5(normalized text); keep the minimum id as the canonical
    representative. Returns (fingerprint, keep_id, n_dups)."""
    return (
        df.withColumn("fingerprint", F.md5(normalize_text(F.col(text_col))))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --- 2. n-gram Jaccard near-dup ---

def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str,
    threshold: float, w: int = SHINGLE_W,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Candidate generation by shingle blocking, then exact Jaccard.

    Count-based: explode(distinct shingles) -> hash each to a 60-bit key ->
    self-equi-join on the key -> groupBy(pair).count() gives |A∩B| directly
    -> Jaccard from set sizes, |A∩B| / (|A| + |B| - |A∩B|). No candidate
    `distinct`, no array join-back, no array_intersect: the only wide ops
    are the posting self-join on 8-byte keys and one pair-count aggregation
    (map-side combinable). 60-bit hash collisions are ~n²/2^61 —
    negligible, and the oracle computes identically so results still match.

    Scale discipline:

    - **One linear posting materialization, no long-lived caching.** The
      (doc_id, sh_h) posting is lazily localCheckpointed — 16 B/row,
      smaller than the source text and than the self-join's own shuffle
      files — so the tokenize+shingle+md5 pass runs ONCE for the sizes
      aggregation and both self-join sides (the ngram_containment /
      prefix-filter discipline, measured 1.4× steady on this pipeline
      shape; before r14 this operator relied on ReuseExchange alone,
      which leaves the sizes branch re-tokenizing). The blocks live until
      the caller drops the returned frame (driver GC + ContextCleaner
      reclaim them — bounded residue, pinned by
      test_pair_generators_release_persistent_rdds_on_gc); nothing
      persists across runs.
    - **Size joins are un-hinted.** The (doc_id, n) relation is one row
      per document — O(n_docs), i.e. billions of rows at corpus scale — so
      forcing a broadcast would OOM the driver (and exceed Spark's 8 GB
      broadcast hard cap). Left un-hinted, AQE broadcasts when the
      runtime size actually fits and falls back to a shuffle hash join
      keyed on the already-aggregated (small) candidate pairs otherwise.
    - **Hot-shingle DF cap** (``max_shingle_df``): a stop-shingle with
      document frequency d contributes C(d,2) rows to the self-join — a
      single boilerplate sentence shared by 1M pages is 5·10^11 pairs.
      With a cap, shingles whose DF exceeds it are dropped from candidate
      generation via a left-anti gate (the standard stopword-shingle
      mitigation; trades recall on boilerplate-only overlap for a hard
      bound). Set sizes still count ALL shingles, so Jaccard for surviving
      pairs is a conservative (lower-bound) estimate. Default off to keep
      exact parity with the oracle.
    """
    # two-step tokenize->shingle: materializing the token array keeps the
    # regex tokenizer out of the shingle lambda (inline, CSE cannot reach
    # inside higher-order functions -> O(len^2) retokenization per doc)
    posting = (
        df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", F.explode(shingles_of(F.col("_toks"), w)).alias("shingle"))
        .select("doc_id", md5_long(F.col("shingle")).alias("sh_h"))
        # 16 B/row lazy materialization (r14 — the ngram_containment /
        # prefix-filter discipline, measured 1.4x steady there on the
        # same pipeline shape): sizes + the self-join sides otherwise
        # re-tokenize the corpus per branch. Blocks are reclaimed when the
        # caller drops the result (GC + ContextCleaner; bounded residue).
        .localCheckpoint(eager=False)
    )
    sizes = posting.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joinable = posting
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("sh_h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh_h")
        )
        joinable = posting.join(hot, "sh_h", "left_anti")
    inter = (
        joinable.alias("p1")
        .join(joinable.alias("p2"), on="sh_h")
        .filter(F.col("p1.doc_id") < F.col("p2.doc_id"))
        .groupBy(
            F.col("p1.doc_id").alias("id_a"), F.col("p2.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    b = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- 3. MinHash + LSH ---

def _minhash_salts(k: int) -> list[int]:
    """K fixed 60-bit xor-salts derived from md5 — computed once in Python,
    embedded as literals in both engines' plans."""
    import hashlib as _hl

    return [
        int(_hl.md5(f"minhash-salt-{j}".encode()).hexdigest()[:15], 16)
        for j in range(k)
    ]


def minhash_signature(text_col: Column, k: int = MINHASH_K) -> Column:
    """K-component MinHash signature (array<bigint>).

    One md5 per shingle (the expensive part), then component j = min over
    shingles of ``xor(h, salt_j)`` — the cheap xor permutation family
    (16× fewer digest computations than per-component salting; accuracy is
    ample for near-dup detection). Portable to the DuckDB oracle verbatim.
    """
    sh = shingles(text_col)
    base = F.transform(sh, lambda g: md5_long(g))
    salts = _minhash_salts(k)

    def _perm(salt: int):
        return lambda h: h.bitwiseXOR(F.lit(salt).cast("long"))

    return F.array(
        *[F.array_min(F.transform(base, _perm(s))) for s in salts]
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = MINHASH_K
) -> DataFrame:
    """MinHash as a DataFrame op: explode shingles -> one md5 per shingle ->
    groupBy(doc) with k ``min(xor(h, salt_j))`` aggregates -> array.

    This is the scale path: expression-tree minhash (:func:`minhash_signature`)
    inlines the shingle-hash pass into all k components (projection collapse
    defeats common-subexpression reuse inside higher-order functions), i.e.
    k× the digest work; the aggregate form guarantees one digest per
    (doc, shingle) and combines map-side. Returns (doc_id, sig).
    """
    salts = _minhash_salts(k)
    sh = (
        df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", F.explode(shingles_of(F.col("_toks"))).alias("shingle"))
        .withColumn("h", md5_long(F.col("shingle")))
    )
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.col("h").bitwiseXOR(F.lit(s).cast("long"))).alias(f"m{j}")
            for j, s in enumerate(salts)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{j}") for j in range(k)]).alias("sig")
    )


def _mh_comp_sql(base: str, j: int, k: int = MINHASH_K) -> str:
    salt = _minhash_salts(k)[j]
    return f"list_min(list_transform({base}, h -> xor(h, CAST({salt} AS BIGINT))))"


def minhash_base_sql(expr: str) -> str:
    """Per-shingle base hashes (the shared md5 pass) for the oracle."""
    sh = shingles_sql(expr)
    return f"list_transform({sh}, g -> {md5_long_sql('g')})"


def minhash_sig_sql(expr: str, k: int = MINHASH_K) -> str:
    base = minhash_base_sql(expr)
    return "[" + ", ".join(_mh_comp_sql(base, j, k) for j in range(k)) + "]"


def lsh_band_keys(sig_col: Column, bands: int = LSH_BANDS,
                  rows: int = LSH_ROWS) -> Column:
    """Band the signature: array of (band_idx, band_hash) structs where
    band_hash = md5 of the ','-joined band slice."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(sig_col, b * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float,
    k: int = MINHASH_K, bands: int = LSH_BANDS,
) -> DataFrame:
    """Candidate pairs sharing >=1 LSH band, scored by estimated Jaccard
    (fraction of agreeing signature components)."""
    rows = k // bands
    # Lazy localCheckpoint (r14, measured 0.89x isolated with identical
    # pairs): the banding branch and the verify a/b branches otherwise
    # run the md5-over-shingles signature pass twice (exchange reuse
    # already folds the three reads to two). ~130 B/doc, the same
    # signature-store footprint incremental_lsh_dedup persists; blocks
    # are reclaimed once the caller drops the result (GC + ContextCleaner).
    docs = minhash_signatures(df, text_col, id_col, k).localCheckpoint(
        eager=False
    )
    bands_df = docs.select(
        "doc_id", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash"))
    cand = (
        bands_df.alias("x")
        .join(bands_df.alias("y"), on=["band", "band_hash"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda p, q: (p == q).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("est_jaccard", F.round(agree / F.lit(float(k)), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# --- 4. SimHash ---

def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """60-bit frequency-weighted SimHash per document.

    One explode + one groupBy(doc) with ``bits`` bit-count sums plus one
    token count — a single aggregation with map-side partials; the
    per-token hash is the portable md5_long. The ±1 vote for bit b is
    recovered as ``2·sum(getbit(h, b)) > n`` (ones minus zeros > 0),
    which benches ~20% faster than ``bits`` conditional ±1 sums (the
    when/otherwise branches defeat the sum's tight loop).
    Returns (doc_id, simhash).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok")))
    votes = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.getbit("h", F.lit(b))).alias(f"s{b}") for b in range(bits)],
    )
    sig = None
    for b in range(bits):
        term = F.when(
            F.col(f"s{b}") * 2 > F.col("_n"), F.lit(2 ** b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_sql(table: str, text_expr: str, id_expr: str,
                bits: int = SIMHASH_BITS) -> str:
    """DuckDB oracle for :func:`simhash_signatures`."""
    toks = tokens_sql(text_expr)
    votes = "count(*) AS n, " + ", ".join(
        f"sum((h >> {b}) & 1) AS s{b}" for b in range(bits)
    )
    sig = " + ".join(
        f"CASE WHEN s{b} * 2 > n THEN CAST({2 ** b} AS BIGINT) ELSE 0 END"
        for b in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT {id_expr} AS doc_id, {md5_long_sql('t.tok')} AS h
  FROM {table}, unnest({toks}) AS t(tok)
), votes AS (
  SELECT doc_id, {votes} FROM tok GROUP BY doc_id
)
SELECT doc_id, {sig} AS simhash FROM votes
"""


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3,
    bands: int = SIMHASH_BANDS, band_bits: int = SIMHASH_BAND_BITS,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking: with ``bands`` bands and hamming <= bands-1, at
    least one band is equal — so an equi-join on (band_idx, band_value)
    finds every qualifying pair without a cross join; bit_count(xor)
    verifies exactly. ``sigs`` is (doc_id, simhash).
    """
    mask = (1 << band_bits) - 1
    # Lazy localCheckpoint of the 16 B/row signature frame (r14 — the
    # minhash_lsh_pairs #18 discipline): the banded self-join's branches
    # share one shuffle via ReuseExchange, but the 60-getbit-sum
    # aggregation feeding them still re-ran per consumer job; blocks are
    # reclaimed once the caller drops the result (GC + ContextCleaner).
    sigs = sigs.localCheckpoint(eager=False)
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bv"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- connected-components duplicate-cluster resolution ---

def connected_components(
    pairs: DataFrame, nodes: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Resolve pairwise duplicate edges into clusters: every node gets the
    MINIMUM id reachable through the (symmetric closure of the) pair graph
    as its canonical label — the survivor-selection step after any pairwise
    dedup strategy.

    Iterative min-label propagation: per round, each node takes
    ``min(own label, min of neighbors' labels)``; converges in
    O(graph diameter) rounds (duplicate clusters are near-cliques, so
    typically 2-3). Each round is one equi-join + one aggregation — the
    standard large-graph CC under Spark; at 100 TB persist + checkpoint the
    label frame per round to truncate lineage.

    ``pairs`` needs (id_a, id_b); ``nodes`` a single ``id`` column
    (isolated nodes label themselves) and must cover every pair
    endpoint — the node-universe contract every caller already meets
    (pairs are generated FROM the corpus the nodes project), and which
    the round-1 edge-list shortcut below relies on: with identity seed
    labels, the first neighbor-label join is exactly the edge list, so
    an endpoint outside ``nodes`` would smuggle in an out-of-universe
    label instead of being dropped by the label join. Returns
    (id, canonical_id).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    # The label seed is NOT checkpointed: every battery caller passes a
    # trivial id projection, and round 1 embedding it twice (join probe +
    # rebuild side) is one extra pruned-column scan — cheaper than the
    # checkpoint's own planning pass + materialization job (measured r14:
    # dropping it + the lazy stepped checkpoint below is 0.65x on the
    # semantic-dedup CC at sf0.1, byte-identical labels). A caller whose
    # nodes frame is expensive to derive should checkpoint it upstream.
    labels = nodes.select(F.col("id"), F.col("id").alias("canonical_id"))
    id_type = nodes.schema["id"].dataType
    for it in range(max_iters):
        # r14 (guide §2.4 — remove joins outright): per round, fold the
        # neighbor messages and the node's own label in ONE tagged union
        # + hash aggregation instead of groupBy(src).min + a LEFT-join
        # rebuild — min(_cid) is the new label and max(_own) (non-NULL
        # only on the own-label arm) recovers the previous one for the
        # convergence check, so the rebuild join disappears. Round 1 is
        # cheaper still: the seed label of dst IS dst, so the first
        # neighbor-label join collapses to a projection of the edge
        # list (the label_propagation round-1 idiom). Alternating-A/B
        # measured 0.87x on the minhash-CC battery shape at sf0.1 with
        # byte-identical labels (tools/exp_cc_r14.py).
        if it == 0:
            messages = edges.select(
                F.col("src").alias("id"),
                F.col("dst").cast(id_type).alias("_cid"),
                F.lit(None).cast(id_type).alias("_own"),
            )
        else:
            messages = edges.join(labels, edges.dst == labels.id).select(
                F.col("src").alias("id"),
                F.col("canonical_id").alias("_cid"),
                F.lit(None).cast(id_type).alias("_own"),
            )
        own = labels.select(
            "id",
            F.col("canonical_id").alias("_cid"),
            F.col("canonical_id").alias("_own"),
        )
        # localCheckpoint per round: without lineage truncation each round's
        # plan embeds two copies of the previous one -> exponential plan
        # growth; 10 rounds OOMs the driver on plan strings alone. LAZY
        # (eager=False) + the convergence count right after: the count's job
        # both materializes the checkpoint AND reads the change flag — one
        # job per round instead of the eager checkpoint's
        # materialize-then-count two (measured r14, results identical).
        # Carrying __prev through the checkpoint keeps convergence a scan of
        # the just-materialized partitions, not a second join per round.
        stepped = (
            messages.unionAll(own)
            .groupBy("id")
            .agg(
                F.min("_cid").alias("canonical_id"),
                F.max("_own").alias("__prev"),
            )
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("canonical_id") != F.col("__prev")).count()
        labels = stepped.select("id", "canonical_id")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds — "
            "a component's diameter exceeds max_iters; raise max_iters "
            "(propagation moves the min one hop per round)"
        )
    edges.unpersist()
    return labels


# --- 5. embedding near-dup (hyperplane LSH + exact cosine verify) ---

def hyperplanes(dim: int, n_planes: int = HYPERPLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 — computed
    once in Python (no RNG), embedded as literals in BOTH engines' plans so
    the signatures agree bit-for-bit."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{p},{j}".encode()).hexdigest()[:15], 16)
            row.append(float(h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def hyperplane_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit p = sign of <vec, plane_p>. Sequential
    left-to-right double fold — identical accumulation order in DuckDB."""
    sig = None
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        term = F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return sig


def hyperplane_signature_sql(vec_expr: str, planes: list[list[float]]) -> str:
    terms = []
    for p, plane in enumerate(planes):
        lits = ", ".join(repr(v) for v in plane)
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {len(plane)} + 1), "
            f"j -> CAST({vec_expr}[j] AS DOUBLE) * ([{lits}])[j])), (a, b) -> a + b)"
        )
        terms.append(
            f"CASE WHEN {dot} > 0 THEN CAST({2 ** p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return " + ".join(terms)


def cosine(vec_a: Column, vec_b: Column) -> Column:
    """Exact cosine with fixed fold order: dot / (sqrt(na) * sqrt(nb)).
    Deterministic double arithmetic — portable to the oracle."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda a, v: a + v,
    )
    na = F.aggregate(
        F.transform(vec_a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v,
    )
    nb = F.aggregate(
        F.transform(vec_b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v,
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def vec_norm(vec_col: Column) -> Column:
    """``sqrt(Σ x²)`` with exactly :func:`cosine`'s per-side fold (same
    casts, same accumulation order, then sqrt) — r14: hoist this onto
    the per-VECTOR frame before a pair join so the two norm folds are
    computed once per vector instead of once per candidate pair (the
    HOF folds are interpreted, not codegen'd — at dim=64 they are the
    pair stage's CPU bill). Feeding the hoisted norms to
    :func:`cosine_with_norms` reproduces cosine's IEEE result bit for
    bit because the arithmetic is identical, only evaluated earlier."""
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, v: a + v,
        )
    )


def cosine_with_norms(
    vec_a: Column, vec_b: Column, norm_a: Column, norm_b: Column
) -> Column:
    """:func:`cosine` with the per-side norms precomputed by
    :func:`vec_norm` — same expression tree (``dot / (sqrt(na) *
    sqrt(nb))``), the sqrt folds just live on the pre-join projections."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda a, v: a + v,
    )
    return dot / (norm_a * norm_b)


def cosine_sql(a: str, b: str, dim: int) -> str:
    def fold(body: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {dim} + 1), j -> {body})), (x, y) -> x + y)"
        )

    dot = fold(f"CAST({a}[j] AS DOUBLE) * CAST({b}[j] AS DOUBLE)")
    na = fold(f"CAST({a}[j] AS DOUBLE) * CAST({a}[j] AS DOUBLE)")
    nb = fold(f"CAST({b}[j] AS DOUBLE) * CAST({b}[j] AS DOUBLE)")
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def embedding_neardup_pairs(
    df: DataFrame, vec_col: str, id_col: str,
    threshold: float, dim: int, n_planes: int = HYPERPLANES,
) -> DataFrame:
    """Hyperplane-LSH bucketing then exact-cosine verification within
    buckets. Scale path: the bucket join touches only same-signature pairs;
    signatures are computed per-row with literal plane arrays (broadcast in
    the closure, no shuffle)."""
    planes = hyperplanes(dim, n_planes)
    # Lazy localCheckpoint (r14, measured 0.79x/0.93x on the semantic
    # dedup/decontaminate queries): the n_planes interpreted dot folds
    # re-ran per consumer job otherwise. The frame carries the raw
    # vectors (O(corpus x dim)) — heavier than the 16 B/row posting
    # checkpoints, but the same bytes the bucket self-join's own shuffle
    # ships anyway; blocks are reclaimed once the caller drops the
    # result (GC + ContextCleaner — bounded, not query-scoped).
    sigs = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
        vec_norm(F.col(vec_col)).alias("_nrm"),  # r14: once per vector
    ).localCheckpoint(eager=False)
    pairs = (
        sigs.alias("x")
        .join(sigs.alias("y"), on="bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("id_a"),
            F.col("y.vec_id").alias("id_b"),
            F.col("x.v").alias("va"),
            F.col("y.v").alias("vb"),
            F.col("x._nrm").alias("_na"),
            F.col("y._nrm").alias("_nb"),
        )
    )
    return (
        pairs.withColumn(
            "cos",
            F.round(
                cosine_with_norms(
                    F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
                ),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# --- 6. Incremental dedup against a persisted signature store ---

def incremental_lsh_dedup(
    new_df: DataFrame, store_sigs: DataFrame, text_col: str, id_col: str,
    threshold_micro: int = 500_000, k: int = MINHASH_K, bands: int = LSH_BANDS,
) -> DataFrame:
    """Dedupe a NEW document batch against a persisted corpus signature
    store — the incremental shape a 100 TB pipeline actually runs: the
    historical corpus is never rescanned; only its minhash signature table
    (``store_sigs``: (doc_id, sig array<bigint>) from
    :func:`minhash_signatures`, ~130 B/doc persisted as parquet) joins
    against the day's batch.

    Returns one row per new doc::

        (doc_id, store_dup_of, store_est_micro,
         batch_dup_of, batch_est_micro, is_new)

    - ``store_dup_of``: best-matching store doc at est-Jaccard >=
      ``threshold_micro`` ppm (max estimate, tie -> min store id), else -1.
    - ``batch_dup_of``: best-matching EARLIER-id doc within the batch
      (direct-pair rule; transitive survivor selection is
      :func:`connected_components` composed downstream), else -1.
    - ``is_new`` (int 0/1): matched nowhere — the rows whose signatures
      get appended to the store after the run.

    Estimates are exact integers (``agree * 1e6 div k``) so the output
    hash-matches any engine. Scale: both candidate joins are equi-joins on
    uniform (band, band_hash) keys; the batch signature frame is
    localCheckpointed once and feeds banding + both verify sides; the
    store side only ever ships its colliding bucket rows.
    """
    rows = k // bands
    new_sigs = minhash_signatures(new_df, text_col, id_col, k).localCheckpoint(
        eager=False
    )
    bandify = lambda sigs: sigs.select(  # noqa: E731
        "doc_id", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    ).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.band_hash").alias("band_hash"),
    )
    nb = bandify(new_sigs)
    sb = bandify(store_sigs)

    est_micro = F.expr(f"(CAST(agree AS BIGINT) * 1000000) div {k}")

    def _score(cand: DataFrame, other_sigs: DataFrame) -> DataFrame:
        a = new_sigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sig_a"))
        b = other_sigs.select(
            F.col("doc_id").alias("other_id"), F.col("sig").alias("sig_b")
        )
        agree = F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda p, q: (p == q).cast("int")),
                lambda v: v == 1,
            )
        )
        return (
            cand.join(a, "new_id")
            .join(b, "other_id")
            .withColumn("agree", agree)
            .withColumn("est_micro", est_micro)
            .filter(F.col("est_micro") >= threshold_micro)
            .select("new_id", "other_id", "est_micro")
        )

    def _best(matches: DataFrame) -> DataFrame:
        # two-step argmax (max est -> min id at that est): plain GROUP BYs,
        # deterministic and portable — no engine-specific max_by/arg_max
        top = matches.groupBy("new_id").agg(F.max("est_micro").alias("est_micro"))
        return (
            matches.join(top, ["new_id", "est_micro"])
            .groupBy("new_id", "est_micro")
            .agg(F.min("other_id").alias("dup_of"))
        )

    cand_store = (
        nb.withColumnRenamed("doc_id", "new_id")
        .join(sb.withColumnRenamed("doc_id", "other_id"), ["band", "band_hash"])
        .select("new_id", "other_id")
        .distinct()
    )
    best_store = _best(_score(cand_store, store_sigs)).select(
        "new_id",
        F.col("dup_of").alias("store_dup_of"),
        F.col("est_micro").alias("store_est_micro"),
    )

    cand_batch = (
        nb.alias("x")
        .join(nb.alias("y"), ["band", "band_hash"])
        .filter(F.col("y.doc_id") < F.col("x.doc_id"))  # earlier id only
        .select(
            F.col("x.doc_id").alias("new_id"), F.col("y.doc_id").alias("other_id")
        )
        .distinct()
    )
    best_batch = _best(_score(cand_batch, new_sigs)).select(
        "new_id",
        F.col("dup_of").alias("batch_dup_of"),
        F.col("est_micro").alias("batch_est_micro"),
    )

    ids = new_sigs.select(F.col("doc_id").alias("new_id"))
    return (
        ids.join(best_store, "new_id", "left")
        .join(best_batch, "new_id", "left")
        .select(
            F.col("new_id").alias("doc_id"),
            F.coalesce("store_dup_of", F.lit(-1)).alias("store_dup_of"),
            F.coalesce("store_est_micro", F.lit(0)).alias("store_est_micro"),
            F.coalesce("batch_dup_of", F.lit(-1)).alias("batch_dup_of"),
            F.coalesce("batch_est_micro", F.lit(0)).alias("batch_est_micro"),
            (
                F.col("store_dup_of").isNull() & F.col("batch_dup_of").isNull()
            ).cast("int").alias("is_new"),
        )
    )


def incremental_lsh_dedup_sql(
    new_cte: str, store_cte: str, threshold_micro: int = 500_000,
    k: int = MINHASH_K, bands: int = LSH_BANDS,
) -> str:
    """DuckDB rendering of :func:`incremental_lsh_dedup`. ``new_cte`` /
    ``store_cte`` are subqueries each yielding (doc_id, text); the store
    side re-derives its signatures (the oracle has no persisted table —
    same math, same rows)."""
    rows = k // bands
    comps = ", ".join(_mh_comp_sql("bh", j, k) for j in range(k))
    band_structs = ", ".join(
        "{'band': %d, 'band_hash': md5(array_to_string("
        "list_transform(sig[%d:%d], x -> CAST(x AS VARCHAR)), ','))}"
        % (b, b * rows + 1, b * rows + rows)
        for b in range(bands)
    )
    sig_cte = (
        "SELECT doc_id, [" + comps + "] AS sig FROM "
        "(SELECT doc_id, " + minhash_base_sql("text") + " AS bh FROM {src})"
    )
    est = f"(len(list_filter(range(1, {k} + 1), j -> a.sig[j] = b.sig[j])) * 1000000) // {k}"
    return f"""
WITH new_src AS ({new_cte}),
store_src AS ({store_cte}),
new_sigs AS ({sig_cte.format(src='new_src')}),
store_sigs AS ({sig_cte.format(src='store_src')}),
nb AS (SELECT doc_id, unnest([{band_structs}], recursive := true) FROM new_sigs),
sb AS (SELECT doc_id, unnest([{band_structs}], recursive := true) FROM store_sigs),
cand_store AS (
  SELECT DISTINCT nb.doc_id AS new_id, sb.doc_id AS other_id
  FROM nb JOIN sb USING (band, band_hash)
),
cand_batch AS (
  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS other_id
  FROM nb x JOIN nb y USING (band, band_hash) WHERE y.doc_id < x.doc_id
),
scored_store AS (
  SELECT new_id, other_id, {est} AS est_micro
  FROM cand_store c JOIN new_sigs a ON c.new_id = a.doc_id
                    JOIN store_sigs b ON c.other_id = b.doc_id
),
scored_batch AS (
  SELECT new_id, other_id, {est} AS est_micro
  FROM cand_batch c JOIN new_sigs a ON c.new_id = a.doc_id
                    JOIN new_sigs b ON c.other_id = b.doc_id
),
ms AS (SELECT * FROM scored_store WHERE est_micro >= {threshold_micro}),
mb AS (SELECT * FROM scored_batch WHERE est_micro >= {threshold_micro}),
ts AS (SELECT new_id, max(est_micro) AS est_micro FROM ms GROUP BY 1),
bs AS (
  SELECT new_id, est_micro, min(other_id) AS dup_of
  FROM ms JOIN ts USING (new_id, est_micro) GROUP BY 1, 2
),
tb AS (SELECT new_id, max(est_micro) AS est_micro FROM mb GROUP BY 1),
bb AS (
  SELECT new_id, est_micro, min(other_id) AS dup_of
  FROM mb JOIN tb USING (new_id, est_micro) GROUP BY 1, 2
)
SELECT n.doc_id,
       coalesce(bs.dup_of, -1) AS store_dup_of,
       coalesce(bs.est_micro, 0) AS store_est_micro,
       coalesce(bb.dup_of, -1) AS batch_dup_of,
       coalesce(bb.est_micro, 0) AS batch_est_micro,
       CAST(bs.dup_of IS NULL AND bb.dup_of IS NULL AS INT) AS is_new
FROM new_sigs n LEFT JOIN bs ON n.doc_id = bs.new_id
                LEFT JOIN bb ON n.doc_id = bb.new_id
"""


# ---------------------------------------------------------------------------
# Golden-record survivorship (attribute mode per resolved cluster)
# ---------------------------------------------------------------------------

def golden_record(
    df: DataFrame, cluster_col: str, attr_cols: list[str]
) -> DataFrame:
    """Per-cluster golden record: for every attribute independently, the
    MOST FREQUENT non-NULL value among the cluster's members (ties break
    to the MIN value string — the repo's portable two-step argmax, fully
    deterministic cross-engine). The survivorship step a master-data
    pipeline runs after :func:`connected_components` resolves entities:
    CC names the cluster, this op writes its canonical attributes.

    Returns ``(cluster_col, <attr>...)`` with every attribute as its
    string form (mode is a string-domain operation; cast back at the
    edge). Every cluster appears exactly once — one whose members are
    all-NULL on an attribute yields NULL there, and one all-NULL on EVERY
    attribute still gets its row (hypothesis-caught edge: the melt drops
    NULL values, so the output re-anchors on the distinct cluster set).

    Scale shape: ONE melt (attribute name is data, not plan — attr count
    never widens the shuffle count) -> one (cluster, attr, value) count
    -> per-(cluster, attr) max join -> pivot over the BOUNDED attr-name
    set. Two shuffles total regardless of how many attributes survive.
    """
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("attr"), F.col(a).cast("string").alias("v")
            )
            for a in attr_cols
        ]
    )
    melted = (
        df.select(F.col(cluster_col).alias("_cl"), F.explode(structs).alias("m"))
        .select("_cl", "m.attr", "m.v")
        .filter(F.col("v").isNotNull())
    )
    counts = melted.groupBy("_cl", "attr", "v").agg(
        F.count(F.lit(1)).alias("_n")
    ).localCheckpoint(eager=False)  # feeds the max agg AND the tie filter
    mx = counts.groupBy("_cl", "attr").agg(F.max("_n").alias("_mx"))
    best = (
        counts.join(mx, ["_cl", "attr"])
        .filter(F.col("_n") == F.col("_mx"))
        .groupBy("_cl", "attr")
        .agg(F.min("v").alias("v"))
    )
    pivoted = (
        best.groupBy("_cl")
        .pivot("attr", attr_cols)
        .agg(F.first("v"))  # exactly one row per (cluster, attr) by now
    )
    clusters = df.select(F.col(cluster_col).alias("_cl")).distinct()
    return clusters.join(pivoted, "_cl", "left").withColumnRenamed(
        "_cl", cluster_col
    )


def golden_record_sql(
    table_expr: str, cluster_expr: str, attr_exprs: dict[str, str],
    cluster_name: str = "cl",
) -> str:
    """DuckDB rendering of :func:`golden_record` (same melt + two-step
    argmax + conditional pivot). ``attr_exprs`` maps output name -> SQL
    expression; ``cluster_name`` names the output cluster column."""
    melts = " UNION ALL ".join(
        f"SELECT {cluster_expr} AS cl, '{name}' AS attr,"
        f" CAST({expr} AS VARCHAR) AS v FROM {table_expr}"
        f" WHERE {expr} IS NOT NULL"
        for name, expr in attr_exprs.items()
    )
    pivots = ", ".join(
        f"max(CASE WHEN attr = '{name}' THEN v END) AS {name}"
        for name in attr_exprs
    )
    pivot_names = ", ".join(attr_exprs)
    return f"""
WITH melted AS ({melts}),
counts AS (
  SELECT cl, attr, v, count(*) AS n FROM melted GROUP BY 1, 2, 3
),
mx AS (SELECT cl, attr, max(n) AS mx FROM counts GROUP BY 1, 2),
best AS (
  SELECT counts.cl, counts.attr, min(v) AS v
  FROM counts JOIN mx ON counts.cl = mx.cl AND counts.attr = mx.attr
  WHERE n = mx GROUP BY 1, 2
),
clusters AS (SELECT DISTINCT {cluster_expr} AS cl FROM {table_expr}),
pivoted AS (SELECT cl, {pivots} FROM best GROUP BY cl)
SELECT clusters.cl AS {cluster_name}, {pivot_names}
FROM clusters LEFT JOIN pivoted ON clusters.cl = pivoted.cl
"""


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
    max_distance: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995) — the
    classic non-LSH candidate generator for record linkage: sort by a
    blocking key, compare each record only to its ``window`` successors::

        (a_id, b_id, a_key, b_key, lev)    lev = levenshtein(a_key, b_key)

    Complements the LSH family: catches typo-close keys that share no
    shingle band ('jon smith' / 'john smith') at O(n·w) comparisons,
    never all-pairs. Scale: the global sort is the distributed
    :func:`~dwh_etl_ods_spark_jobs_spark.operators.rank.global_rank`
    (range-repartition + offsets — no single-partition window); the
    neighbor join is ``window`` equi-joins on the dense rank, generated
    as one explode of offsets 1..w. ``max_distance`` optionally keeps
    only pairs within an edit-distance budget (the usual match
    threshold). NULL keys are excluded (they cannot be compared).
    """
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.rank import global_rank

    ranked = (
        df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_key"))
        .filter(F.col("_key").isNotNull())
        .transform(global_rank(["_key", "_id"], out_col="_rk"))
        .localCheckpoint(eager=False)  # both sides of the neighbor join
    )
    left = ranked.select(
        F.col("_id").alias("a_id"), F.col("_key").alias("a_key"),
        F.explode(F.sequence(F.lit(1), F.lit(window))).alias("_off"),
        F.col("_rk"),
    ).withColumn("_rk2", F.col("_rk") + F.col("_off"))
    pairs = left.join(
        ranked.select(
            F.col("_id").alias("b_id"), F.col("_key").alias("b_key"),
            F.col("_rk").alias("_rk2"),
        ),
        "_rk2",
    ).select(
        "a_id", "b_id", "a_key", "b_key",
        F.levenshtein(F.col("a_key"), F.col("b_key")).alias("lev"),
    )
    if max_distance is not None:
        pairs = pairs.filter(F.col("lev") <= max_distance)
    return pairs


def sorted_neighborhood_pairs_sql(
    table_expr: str,
    id_expr: str,
    key_expr: str,
    window: int = 3,
    max_distance: int | None = None,
) -> str:
    """DuckDB rendering of :func:`sorted_neighborhood_pairs` (row_number
    dense rank == global_rank's total order on (key, id))."""
    gate = f"WHERE lev <= {max_distance}" if max_distance is not None else ""
    return f"""
WITH ranked AS (
  SELECT {id_expr} AS id, {key_expr} AS key,
         row_number() OVER (ORDER BY {key_expr}, {id_expr}) - 1 AS rk
  FROM {table_expr} WHERE {key_expr} IS NOT NULL
),
pairs AS (
  SELECT a.id AS a_id, b.id AS b_id, a.key AS a_key, b.key AS b_key,
         CAST(levenshtein(a.key, b.key) AS INT) AS lev
  FROM ranked a
  JOIN (SELECT unnest(range(1, {window + 1})) AS off) o ON TRUE
  JOIN ranked b ON b.rk = a.rk + o.off
)
SELECT * FROM pairs {gate}
"""


def ngram_containment_pairs(
    df: DataFrame, text_col: str, id_col: str,
    threshold_ppm: int, w: int = SHINGLE_W,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT (Broder 1997):

        C(A→B) = |A∩B| / |A|       (how much of A lives inside B)

    Jaccard under-scores subset/superset pairs — a tweet quoted whole
    inside an article has tiny Jaccard but containment ≈ 1 from the
    tweet's side, which is exactly the signal "this document is swallowed
    by that one" that quote/boilerplate/summary dedup needs. Emits, per
    candidate pair sharing ≥1 shingle::

        (id_a, id_b, inter, na, nb, cont_a_ppm, cont_b_ppm)

    with both directions as EXACT ppm integers
    (``inter·10⁶ div n_side`` — no float division anywhere) and the pair
    kept when either direction clears ``threshold_ppm``.

    Scale: identical physiology to :func:`ngram_jaccard_pairs` (same
    posting self-equi-join on 60-bit shingle hashes, same map-side
    combinable pair count, same optional hot-shingle DF cap, no caching,
    un-hinted size joins for AQE) — only the final scoring expression
    differs.
    """
    # two-step tokenize->shingle: materializing the token array keeps the
    # regex tokenizer out of the shingle lambda (inline, CSE cannot reach
    # inside higher-order functions -> O(len^2) retokenization per doc)
    posting = (
        df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", F.explode(shingles_of(F.col("_toks"), w)).alias("shingle"))
        .select("doc_id", md5_long(F.col("shingle")).alias("sh_h"))
        # sizes + hot-DF + both self-join sides read this — one linear
        # 16 B/row materialization beats re-tokenizing the corpus per
        # branch (measured 1.4× steady / 2.7× first-run on the same
        # pipeline shape in prefix_filter_jaccard_pairs)
        .localCheckpoint(eager=False)
    )
    sizes = posting.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joinable = posting
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("sh_h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh_h")
        )
        joinable = posting.join(hot, "sh_h", "left_anti")
    inter = (
        joinable.alias("p1")
        .join(joinable.alias("p2"), on="sh_h")
        .filter(F.col("p1.doc_id") < F.col("p2.doc_id"))
        .groupBy(
            F.col("p1.doc_id").alias("id_a"), F.col("p2.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    a = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    b = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    ppm = lambda num, den: F.expr(  # noqa: E731
        f"CAST((({num}) * 1000000L) div ({den}) AS BIGINT)"
    )
    return (
        inter.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            ppm("inter", "na").alias("cont_a_ppm"),
            ppm("inter", "nb").alias("cont_b_ppm"),
        )
        .filter(
            (F.col("cont_a_ppm") >= threshold_ppm)
            | (F.col("cont_b_ppm") >= threshold_ppm)
        )
    )


def ngram_containment_pairs_sql(
    table_expr: str, text_expr: str, id_expr: str,
    threshold_ppm: int, w: int = SHINGLE_W,
) -> str:
    """DuckDB rendering of :func:`ngram_containment_pairs` (no DF cap —
    parity is checked with the cap off, matching the Jaccard oracle)."""
    return f"""
WITH posting AS (
  SELECT {id_expr} AS doc_id, {md5_long_sql('sh')} AS sh_h
  FROM {table_expr}, unnest({shingles_sql(text_expr, w)}) AS t(sh)
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM posting GROUP BY 1),
inter AS (
  SELECT p1.doc_id AS id_a, p2.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
  FROM posting p1 JOIN posting p2 ON p1.sh_h = p2.sh_h
  WHERE p1.doc_id < p2.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter,
       a.n AS na, b.n AS nb,
       CAST((inter * 1000000) // a.n AS BIGINT) AS cont_a_ppm,
       CAST((inter * 1000000) // b.n AS BIGINT) AS cont_b_ppm
FROM inter
JOIN sizes a ON a.doc_id = id_a
JOIN sizes b ON b.doc_id = id_b
WHERE (inter * 1000000) // a.n >= {threshold_ppm}
   OR (inter * 1000000) // b.n >= {threshold_ppm}
"""


def prefix_filter_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str,
    threshold_ppm: int, w: int = SHINGLE_W,
) -> DataFrame:
    """Exact Jaccard similarity join with PREFIX FILTERING (the
    AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08),
    the standard way to make a similarity self-join survive a corpus
    whose full posting self-join is too hot.

    Reference scope note: the reference engine has no similarity join at
    all; this is part of the training-data-pipeline extension surface
    (same family as :func:`ngram_jaccard_pairs`, different candidate
    physiology).

    Semantics (identical to :func:`ngram_jaccard_pairs` at the same
    threshold): emit ``(id_a, id_b, inter, na, nb, jaccard_ppm)`` for
    every pair of documents whose distinct-shingle Jaccard, as an exact
    ppm integer ``inter·10⁶ div (na+nb-inter)``, reaches
    ``threshold_ppm``.

    Why a different candidate generator: the plain posting self-join
    explodes on EVERY shared shingle — a shingle with document frequency
    d contributes C(d,2) candidate rows regardless of the threshold. With
    a global shingle order (rarest DF first), a pair at Jaccard ≥ t is
    GUARANTEED to share a shingle inside both documents' first
    ``n - ceil(t·n) + 1`` shingles (prefix-filtering lemma: the pair's
    intersection size m ≥ ceil(t·n_side), and the (n-m+1)-prefixes of
    both sides must contain the (m-α+1)-th smallest common shingle), so
    only PREFIXES enter the self-join — the hot high-DF shingles sort to
    the ends of the order and never generate candidates at high
    thresholds. Recall stays EXACT (no cap/approximation), which is why
    this needs no ``max_shingle_df`` escape hatch.

    Pipeline (all integer arithmetic, engine-portable):

    1. posting = distinct (doc, shingle-hash).
    2. global order = (DF asc, hash asc); per-DOC rank AND doc size in
       ONE window shuffle partitioned by doc (bounded by document
       length — never global).
    3. prefix = rows with rank ≤ n - ceil(t·n) + 1, where
       ceil(t·n) = (ppm·n + 10⁶ - 1) div 10⁶.
    4. candidates = prefix ⋈ prefix on hash, id_a < id_b, plus the
       length filter ppm·max(na,nb) ≤ 10⁶·min(na,nb) (a pair failing it
       cannot reach t), deduplicated — CARRYING (na, nb), so scoring
       needs no size join-back.
    5. verify: per-doc shingle ARRAYS attach to each candidate via two
       non-exploding equi-joins; ``size(array_intersect)`` is the EXACT
       intersection (r14 — replaced the posting-explode verify, 0.65×);
       score and filter.

    Scale: the only wide ops are the prefix self-join (rare-token keys by
    construction), the candidate dedup (already-filtered pair set), and
    the verify joins (candidate rows carrying two document-length-bounded
    arrays — the same per-doc bound the rank window already carries). The
    posting list (doc_id, 60-bit hash — 16 B/row, O(corpus shingles)) is
    localCheckpoint'd ONCE: three plan branches read it (DF count, rank,
    array fold), and re-deriving it per branch means three full corpus
    scans + tokenizations — measured 1.4× slower steady-state and 2.7×
    slower first-run at sf0.1, identical output. MEMORY_AND_DISK spills,
    so the materialization stays linear at any corpus size; no separate
    sizes relation exists at all.
    """
    posting = (
        df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", F.explode(shingles_of(F.col("_toks"), w)).alias("shingle"))
        .select("doc_id", md5_long(F.col("shingle")).alias("sh_h"))
        .localCheckpoint(eager=False)  # three branches below read it
    )
    dfreq = posting.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    doc_w = Window.partitionBy("doc_id")
    ranked = (
        posting.join(dfreq, "sh_h")
        .withColumn("rn", F.row_number().over(doc_w.orderBy("df", "sh_h")))
        .withColumn("n", F.count(F.lit(1)).over(doc_w).cast("long"))
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n")
        - F.expr(
            f"CAST(({threshold_ppm}L * n + 999999) div 1000000 AS BIGINT)"
        )
        + F.lit(1)
    ).select("doc_id", "sh_h", "n")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="sh_h")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.lit(threshold_ppm)
                * F.greatest(F.col("a.n"), F.col("b.n"))
                <= F.lit(1000000) * F.least(F.col("a.n"), F.col("b.n"))
            )
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    # r14 verify rewrite (measured 0.65× full-query, output identical):
    # the old verify exploded every candidate by |doc_a|'s postings
    # (~50× row blowup) before the (id_b, sh_h) match + count. Instead
    # fold each doc's postings into ONE array row (bounded by document
    # length — the same per-doc bound the rank window above already
    # carries) and attach the two arrays to each candidate with two
    # NON-exploding equi-joins; the exact intersection is then
    # size(array_intersect) per pair — shingle sets are distinct per
    # doc, so it equals the old per-row match count.
    arrs = posting.groupBy("doc_id").agg(F.collect_list("sh_h").alias("_arr"))
    return (
        cand.join(
            arrs.select(F.col("doc_id").alias("id_a"), F.col("_arr").alias("_aa")),
            "id_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("id_b"), F.col("_arr").alias("_ab")),
            "id_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect("_aa", "_ab")).cast("long")
        )
        .withColumn(
            "jaccard_ppm",
            F.expr("CAST((inter * 1000000L) div (na + nb - inter) AS BIGINT)"),
        )
        .filter(F.col("jaccard_ppm") >= threshold_ppm)
        .select("id_a", "id_b", "inter", "na", "nb", "jaccard_ppm")
    )


def prefix_filter_jaccard_pairs_sql(
    table_expr: str, text_expr: str, id_expr: str,
    threshold_ppm: int, w: int = SHINGLE_W,
) -> str:
    """DuckDB rendering of :func:`prefix_filter_jaccard_pairs` — the SAME
    prefix-filtered candidate generation (not a shortcut oracle), so the
    parity check pins the filter's exact-recall claim too."""
    return f"""
WITH posting AS (
  SELECT {id_expr} AS doc_id, {md5_long_sql('sh')} AS sh_h
  FROM {table_expr}, unnest({shingles_sql(text_expr, w)}) AS t(sh)
),
dfreq AS (SELECT sh_h, count(*) AS df FROM posting GROUP BY 1),
ranked AS (
  SELECT p.doc_id, p.sh_h,
         row_number() OVER (PARTITION BY p.doc_id ORDER BY d.df, p.sh_h) AS rn,
         CAST(count(*) OVER (PARTITION BY p.doc_id) AS BIGINT) AS n
  FROM posting p JOIN dfreq d USING (sh_h)
),
prefix AS (
  SELECT doc_id, sh_h, n FROM ranked
  WHERE rn <= n - ({threshold_ppm} * n + 999999) // 1000000 + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n AS na, b.n AS nb
  FROM prefix a JOIN prefix b USING (sh_h)
  WHERE a.doc_id < b.doc_id
    AND {threshold_ppm} * greatest(a.n, b.n) <= 1000000 * least(a.n, b.n)
),
inter AS (
  SELECT c.id_a, c.id_b, c.na, c.nb, CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN posting pa ON pa.doc_id = c.id_a
  JOIN posting pb ON pb.doc_id = c.id_b AND pb.sh_h = pa.sh_h
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, inter, na, nb,
       CAST((inter * 1000000) // (na + nb - inter) AS BIGINT) AS jaccard_ppm
FROM inter
WHERE (inter * 1000000) // (na + nb - inter) >= {threshold_ppm}
"""


def mutual_knn_pairs(
    df: DataFrame, vec_col: str, id_col: str,
    k: int, dim: int, n_planes: int = 6,
    max_bucket: int | None = None,
) -> DataFrame:
    """Reciprocal (mutual) k-nearest-neighbor pairs over an embedding
    column: keep (a, b) only when b is in a's top-k AND a is in b's
    top-k among their LSH bucket-mates. Mutual-kNN is the standard
    precision filter on top of raw ANN lists — one-directional
    neighbors (a hub vector everyone points at) drop out, which is what
    semantic-dedup and graph-building pipelines want before they trust
    an edge. Emits ``(id_a, id_b, cos, rank_ab, rank_ba)`` with
    ``id_a < id_b``.

    Scale: the SAME hyperplane-bucket physiology as
    :func:`embedding_neardup_pairs` (fewer planes → bigger buckets →
    denser candidate lists; pick n_planes so the expected bucket size
    covers k). Per-node ranking is a window over BUCKET-MATES only
    (bounded by bucket size, never the corpus); the mutuality check is
    one self-equi-join of the ≤k·n directed list on the swapped key.

    Within-bucket work is quadratic in BUCKET SIZE, and hyperplane
    buckets are skewed by construction (correlated bits — that IS the
    locality); ``max_bucket`` is the hot-bucket cap for the tail
    (measured: 10× vectors at constant MEAN bucket size ran 48× without
    a cap, 1.7× with cap=256 — tools/scale_probe_r10b.py): buckets
    larger than the cap are dropped from pair generation via a
    left-anti gate, the max_shingle_df idiom — trading recall inside
    mega-buckets (where rank-k neighbors are least meaningful anyway)
    for a hard per-bucket bound. Default off for exact oracle parity.
    """
    from pyspark.sql.window import Window as W

    planes = hyperplanes(dim, n_planes)
    sigs = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
        vec_norm(F.col(vec_col)).alias("_nrm"),  # r14: once per vector
    )
    if max_bucket is not None:
        hot = (
            sigs.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select("bucket")
        )
        sigs = sigs.join(hot, "bucket", "left_anti")
    directed = (
        sigs.alias("x")
        .join(sigs.alias("y"), on="bucket")
        .filter(F.col("x.vec_id") != F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("src"),
            F.col("y.vec_id").alias("dst"),
            F.round(
                cosine_with_norms(
                    F.col("x.v"), F.col("y.v"),
                    F.col("x._nrm"), F.col("y._nrm"),
                ),
                6,
            ).alias("cos"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("src").orderBy(
                    F.col("cos").desc(), F.col("dst").asc()
                )
            ),
        )
        .filter(F.col("rank") <= k)
        # both sides of the mutual join; dropping this (the
        # weighted-jaccard #16 idea) A/B'd 1.17x SLOWER here — the
        # ranked list is post-window, so exchange reuse cannot share
        # the two sides' recompute (tools/ab_mknn_r14.json, r14)
        .localCheckpoint(eager=False)
    )
    ab, ba = directed.alias("ab"), directed.alias("ba")
    return (
        ab.join(
            ba,
            (F.col("ab.src") == F.col("ba.dst"))
            & (F.col("ab.dst") == F.col("ba.src")),
        )
        .filter(F.col("ab.src") < F.col("ab.dst"))
        .select(
            F.col("ab.src").alias("id_a"),
            F.col("ab.dst").alias("id_b"),
            F.col("ab.cos").alias("cos"),
            F.col("ab.rank").cast("long").alias("rank_ab"),
            F.col("ba.rank").cast("long").alias("rank_ba"),
        )
    )


def mutual_knn_pairs_sql(
    table_expr: str, vec_expr: str, id_expr: str,
    k: int, dim: int, n_planes: int = 6,
) -> str:
    """DuckDB rendering of :func:`mutual_knn_pairs` (same literal
    hyperplanes, same bucket join, same rounded-cosine rank order)."""
    planes = hyperplanes(dim, n_planes)
    sig = hyperplane_signature_sql("v", planes)
    cos = cosine_sql("x.v", "y.v", dim)
    return f"""
WITH sigs AS (
  SELECT {id_expr} AS vec_id,
         list_transform({vec_expr}, e -> CAST(e AS DOUBLE)) AS v
  FROM {table_expr}
),
bucketed AS (SELECT vec_id, v, {sig} AS bucket FROM sigs),
directed AS (
  SELECT src, dst, cos,
         row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC)
           AS rank
  FROM (
    SELECT x.vec_id AS src, y.vec_id AS dst, round({cos}, 6) AS cos
    FROM bucketed x JOIN bucketed y USING (bucket)
    WHERE x.vec_id <> y.vec_id
  )
),
knn AS (SELECT * FROM directed WHERE rank <= {k})
SELECT ab.src AS id_a, ab.dst AS id_b, ab.cos AS cos,
       CAST(ab.rank AS BIGINT) AS rank_ab, CAST(ba.rank AS BIGINT) AS rank_ba
FROM knn ab JOIN knn ba ON ab.src = ba.dst AND ab.dst = ba.src
WHERE ab.src < ab.dst
"""


def blocking_quality_eval(
    cand: DataFrame, truth: DataFrame,
    id_a: str = "id_a", id_b: str = "id_b",
    n_records: int | None = None,
) -> DataFrame:
    """Blocking-scheme quality against a ground-truth pair set — the
    record-linkage evaluation pair (Christen 2012): PAIR COMPLETENESS
    (share of true matches the candidate generator surfaces — blocking
    recall) and, when ``n_records`` is given, REDUCTION RATIO (share of
    the C(n,2) pair space the scheme never scores)::

        (n_cand, n_true, n_found, pair_completeness_ppm[, reduction_ratio_ppm])

    Standing-query twin of ``similarity.ann_recall_eval``: a banding or
    sorted-neighborhood config whose completeness drifts after a corpus
    refresh should fail a gate, not a notebook. Pairs normalize to
    (least, greatest) so orientation never matters; exact ppm integers
    (``n_records`` must keep ``n_cand·10⁶`` and C(n,2) inside signed
    64-bit — at larger n, report completeness only).

    Scale: one equi-join between the two pair lists + one fold; never
    touches the records themselves.

    r14 optimization (guide §1.2 "don't compute things twice"): the
    original shape evaluated BOTH pair generators twice — ``c`` fed a
    global count AND the semi-join, ``t`` likewise, and the two count
    branches exchange to SinglePartition while the semi-join exchanges
    on (_a,_b), so no exchange reuse fired and each generator pipeline
    (here: the full MinHash-banding / ngram-Jaccard doc scans) ran two
    end-to-end passes. One FULL OUTER join on the normalized pair key +
    one global fold computes all three counts from a single evaluation
    of each side: n_cand / n_true / n_found are membership-flag sums,
    identical values, and the plan drops from 5 Exchanges + 2 broadcast
    attaches to 3 Exchanges (two pair-key, one single-row fold).
    """
    def norm(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("_a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("_b"),
        ).distinct()

    c = norm(cand).withColumn("_in_c", F.lit(1))
    t = norm(truth).withColumn("_in_t", F.lit(1))
    both = c.join(t, ["_a", "_b"], "full_outer")
    counts = both.agg(
        F.coalesce(F.sum("_in_c"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.sum("_in_t"), F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(
            F.sum(F.col("_in_c") * F.col("_in_t")), F.lit(0)
        ).cast("long").alias("n_found"),
    )
    out = counts.select(
        "n_cand", "n_true", "n_found",
        F.expr("CAST(n_found * 1000000L div n_true AS BIGINT)").alias(
            "pair_completeness_ppm"
        ),
    )
    if n_records is not None:
        total = n_records * (n_records - 1) // 2
        out = out.withColumn(
            "reduction_ratio_ppm",
            F.expr(f"CAST(1000000L - n_cand * 1000000L div {total}L AS BIGINT)"),
        )
    return out


def blocking_quality_eval_sql(
    cand_sql: str, truth_sql: str,
    id_a: str = "id_a", id_b: str = "id_b",
    n_records: int | None = None,
) -> str:
    """DuckDB rendering of :func:`blocking_quality_eval` over two full
    query texts (each may carry its own WITH clause)."""
    rr = ""
    if n_records is not None:
        total = n_records * (n_records - 1) // 2
        rr = (
            f",\n       CAST(1000000 - n_cand * 1000000 // {total} AS BIGINT)"
            f" AS reduction_ratio_ppm"
        )
    return f"""
WITH c AS (
  SELECT DISTINCT least({id_a}, {id_b}) AS a, greatest({id_a}, {id_b}) AS b
  FROM ({cand_sql})
),
t AS (
  SELECT DISTINCT least({id_a}, {id_b}) AS a, greatest({id_a}, {id_b}) AS b
  FROM ({truth_sql})
),
counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_cand,
         (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_true,
         (SELECT CAST(count(*) AS BIGINT)
          FROM t SEMI JOIN c ON t.a = c.a AND t.b = c.b) AS n_found
)
SELECT n_cand, n_true, n_found,
       CAST(n_found * 1000000 // n_true AS BIGINT) AS pair_completeness_ppm{rr}
FROM counts
"""


# --- IDF-weighted Jaccard near-dup (r11) ---

WJ_DF_MAX = 1000       # shingles hotter than this leave the similarity domain
WJ_IDF_PPM = 1_000_000


def weighted_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str,
    threshold_ppm: int, w: int = SHINGLE_W, df_max: int = WJ_DF_MAX,
) -> DataFrame:
    """IDF-weighted Jaccard near-dup pairs: shared boilerplate counts
    for little, shared RARE content for a lot::

        J_w(A,B) = Σ_{t∈A∩B} idf_t  /  Σ_{t∈A∪B} idf_t

    with ``idf_t = round(ln(N/df_t)·10⁶)`` fixed per shingle (ONE float
    ``ln`` rounded to integer micro-units — the PMI discipline, so the
    fold is exact and engine-portable). ``jw_ppm = inter·10⁶ div
    (W_A + W_B − inter)``. The unweighted Jaccard treats a stop-shingle
    and a rare quote identically; the weighted form is what content-
    aware dedup actually wants.

    Domain semantics (identical in the oracle): shingles with
    ``df > df_max`` are excluded from the similarity domain ENTIRELY
    (numerator and denominator) — they are the near-zero-idf stopword
    band, and each would contribute C(df,2) join rows. df=1 shingles
    stay in the denominators but are provably never joined (they cannot
    be shared), so the join runs only on 2 ≤ df ≤ df_max postings.

    Scale: posting-list equi-join on 60-bit keys with a hard per-key
    fan-in bound (df_max), one pair aggregation (map-side combinable),
    doc totals attach un-hinted (AQE broadcasts when they fit). The
    N-row count attaches to the vocabulary via a constant-key broadcast
    — no collect.
    """
    posting = (
        df.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
        )
        .select("doc_id", F.explode(shingles_of(F.col("_toks"), w)).alias("shingle"))
        .select("doc_id", md5_long(F.col("shingle")).alias("sh_h"))
        .localCheckpoint(eager=False)  # df-counts + weighted postings
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    n_docs = (
        df.select(F.col(id_col).alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("_nd"))
        .withColumn("_one", one)
    )
    vocab = (
        posting.groupBy("sh_h")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .filter(F.col("_df") <= df_max)
        .withColumn("_one", one)
        .join(F.broadcast(n_docs), "_one")
        .withColumn(
            "idf",
            F.round(
                F.log(F.col("_nd").cast("double") / F.col("_df").cast("double"))
                * F.lit(float(WJ_IDF_PPM))
            ).cast("long"),
        )
        .select("sh_h", "_df", "idf")
    )
    # NO checkpoint on `weighted` (r14, measured 0.75x without): the join
    # output keeps sh_h hash-partitioning, which the self-join below
    # reuses directly, and AQE shuffle-stage reuse dedups the totals
    # branch's recompute — a localCheckpoint here DESTROYS the join's
    # outputPartitioning (LogicalRDD carries none), forcing both
    # self-join arms to re-exchange on top of the materialization pass.
    weighted = posting.join(vocab, "sh_h")
    totals = weighted.groupBy("doc_id").agg(
        F.sum("idf").cast("long").alias("w_tot")
    )
    joinable = weighted.filter(F.col("_df") >= 2)
    inter = (
        joinable.alias("p1")
        .join(joinable.alias("p2"), on="sh_h")
        .filter(F.col("p1.doc_id") < F.col("p2.doc_id"))
        .groupBy(
            F.col("p1.doc_id").alias("id_a"), F.col("p2.doc_id").alias("id_b")
        )
        .agg(F.sum(F.col("p1.idf")).cast("long").alias("w_inter"))
    )
    a = totals.select(F.col("doc_id").alias("id_a"), F.col("w_tot").alias("wa"))
    b = totals.select(F.col("doc_id").alias("id_b"), F.col("w_tot").alias("wb"))
    return (
        inter.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jw_ppm",
            # wa + wb - w_inter == 0 iff every shared shingle has idf 0
            # (df == n_docs on a <= df_max corpus): similarity undefined
            # -> NULL on BOTH engines (Spark ANSI `div 0` would throw,
            # DuckDB `// 0` nulls); the threshold filter then drops it.
            F.expr(
                f"CAST(CASE WHEN (wa + wb - w_inter) = 0 THEN NULL"
                f" ELSE w_inter * {WJ_IDF_PPM} div (wa + wb - w_inter) END"
                f" AS BIGINT)"
            ),
        )
        .filter(F.col("jw_ppm") >= threshold_ppm)
        .select("id_a", "id_b", "jw_ppm")
    )


def weighted_jaccard_pairs_sql(
    src: str, text_expr: str, id_expr: str,
    threshold_ppm: int, w: int = SHINGLE_W, df_max: int = WJ_DF_MAX,
) -> str:
    """DuckDB rendering of :func:`weighted_jaccard_pairs` — same md5
    shingle keys, same rounded micro-idf, same df-band domain."""
    return f"""
WITH p0 AS (
  SELECT {id_expr} AS doc_id, unnest({shingles_sql(text_expr, w)}) AS shingle
  FROM {src}
),
posting AS (
  SELECT doc_id, {md5_long_sql('shingle')} AS sh_h FROM p0
),
vocab AS (
  SELECT sh_h, CAST(count(*) AS BIGINT) AS df,
         CAST(round(ln((SELECT CAST(count(*) AS DOUBLE) FROM {src})
                       / CAST(count(*) AS DOUBLE)) * {WJ_IDF_PPM})
              AS BIGINT) AS idf
  FROM posting GROUP BY sh_h
  HAVING count(*) <= {df_max}
),
weighted AS (
  SELECT p.doc_id, p.sh_h, v.df, v.idf
  FROM posting p JOIN vocab v USING (sh_h)
),
totals AS (
  SELECT doc_id, CAST(sum(idf) AS BIGINT) AS w_tot
  FROM weighted GROUP BY doc_id
),
inter AS (
  SELECT p1.doc_id AS id_a, p2.doc_id AS id_b,
         CAST(sum(p1.idf) AS BIGINT) AS w_inter
  FROM weighted p1 JOIN weighted p2 ON p1.sh_h = p2.sh_h
   AND p1.doc_id < p2.doc_id
  WHERE p1.df >= 2 AND p2.df >= 2
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(CASE WHEN (a.w_tot + b.w_tot - i.w_inter) = 0 THEN NULL
            ELSE i.w_inter * {WJ_IDF_PPM}
                 // (a.w_tot + b.w_tot - i.w_inter) END AS BIGINT) AS jw_ppm
FROM inter i
JOIN totals a ON a.doc_id = i.id_a
JOIN totals b ON b.doc_id = i.id_b
WHERE CASE WHEN (a.w_tot + b.w_tot - i.w_inter) = 0 THEN NULL
      ELSE i.w_inter * {WJ_IDF_PPM} // (a.w_tot + b.w_tot - i.w_inter) END
      >= {threshold_ppm}
"""


def minhash_estimate_eval(
    df: DataFrame, text_col: str, id_col: str,
    threshold: float, k: int = MINHASH_K, bands: int = LSH_BANDS,
    w: int = SHINGLE_W,
) -> DataFrame:
    """Sketch-error evaluation for MinHash (the dedup twin of
    ann_recall_eval's recall number): over the banding's candidate
    pairs, compare the signature-agreement Jaccard ESTIMATE to the
    exact shingle Jaccard::

        (n_pairs, mean_abs_err_ppm, max_abs_err_ppm)

    Error in exact ppm (estimate and truth both rationals folded at
    ppm). A k too small for the corpus's similarity profile shows up
    as a rising mean error on refresh — the monitoring hook for the
    sketch-parameter choice.

    Scale: candidate generation is the banded posting join
    (:func:`minhash_lsh_pairs`); the exact side re-scores ONLY the
    candidate pairs through the posting intersection (semi-join down to
    candidate docs first), never all pairs.
    """
    cand = (
        minhash_lsh_pairs(df, text_col, id_col, threshold, k, bands)
        .select(
            "id_a", "id_b",
            F.round(F.col("est_jaccard") * WJ_IDF_PPM).cast("long").alias(
                "est_ppm"
            ),
        )
        # r14: localCheckpoint — the candidate list is read by TWO
        # separated consumers (docs_in_play under the posting
        # checkpoint's job, and the final scored join), and the posting
        # checkpoint boundary defeats exchange reuse between them, so
        # without this pin the ENTIRE minhash pipeline (shingle md5 + k
        # xor-min aggregates + banding self-join) executed twice per
        # run. The frame is the banding's bounded candidate pair list
        # (~pairs, 3 longs/row) — safe to pin at any corpus size.
        .localCheckpoint(eager=False)
    )
    docs_in_play = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b")))
        .distinct()
    )
    posting = (
        df.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
        )
        .join(docs_in_play, "doc_id", "left_semi")
        .select("doc_id", F.explode(shingles_of(F.col("_toks"), w)).alias("shingle"))
        .select("doc_id", md5_long(F.col("shingle")).alias("sh_h"))
        .localCheckpoint(eager=False)
    )
    sizes = posting.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        posting.alias("p1")
        .join(posting.alias("p2"), on="sh_h")
        .filter(F.col("p1.doc_id") < F.col("p2.doc_id"))
        .groupBy(
            F.col("p1.doc_id").alias("id_a"), F.col("p2.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    scored = (
        cand.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .withColumn(
            "true_ppm",
            F.expr(f"CAST(c * {WJ_IDF_PPM} div (na + nb - c) AS BIGINT)"),
        )
        .withColumn("err", F.abs(F.col("est_ppm") - F.col("true_ppm")))
    )
    # Zero banding candidates is a well-defined snapshot (a perfectly
    # dissimilar corpus): explicit 0-error, matching the degenerate-
    # input guard convention elsewhere, not a NULL-div-0 fold.
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            "CAST(CASE WHEN count(1) = 0 THEN 0"
            " ELSE sum(err) div count(1) END AS BIGINT)"
        ).alias("mean_abs_err_ppm"),
        F.coalesce(F.max("err"), F.lit(0)).cast("long").alias("max_abs_err_ppm"),
    )


# --- deletion-neighborhood edit-distance-1 linkage ---------------------------


def _del1_keys(name: Column) -> Column:
    """``{s} ∪ {s minus char i}`` — the FastSS deletion neighborhood for
    edit distance 1 (substitution at i ⇒ both sides share del(i);
    insert/delete ⇒ the shorter string IS a deletion variant of the
    longer).  |keys| = len+1 per string; pure expression arithmetic."""
    dels = F.when(
        F.length(name) >= 1,  # sequence(1, 0) would auto-step DOWN
        F.transform(
            F.sequence(F.lit(1), F.length(name)),
            lambda i: F.concat(
                F.substring(name, F.lit(1), i - 1),
                F.substring(name, i + 1, F.length(name)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(name), dels))


def edit1_linkage_census(
    df: DataFrame, name_col: str, max_len: int = 64
) -> DataFrame:
    """Edit-distance-≤1 record-linkage census over a string column,
    WITHOUT a cross join::

        (n_records, n_names, dup_name_groups,
         ed0_record_pairs, ed1_name_pairs, ed1_record_pairs)

    Physiology (the scale path): the join runs over DISTINCT names with
    multiplicities — identical records collapse BEFORE the pair stage,
    so a million copies of one name cost one row, and duplicate-pair
    counts come from multiplicity arithmetic (``C(m,2)`` within a name,
    ``m_a·m_b`` across), never from joining records.  Candidates come
    from the FastSS deletion-neighborhood equi-join (``len+1`` posting
    keys per name, edit-distance-1 complete by the deletion lemma) and
    are verified with the built-in ``levenshtein`` — exact, no banding
    miss.  Names longer than ``max_len`` are dropped (posting fan-out
    bound; census-visible via n_names vs n_records).
    """
    names = (
        df.select(F.col(name_col).alias("_name"))
        .filter(F.col("_name").isNotNull() & (F.length("_name") <= max_len))
        .groupBy("_name")
        .agg(F.count(F.lit(1)).cast("long").alias("_m"))
    )
    posting = names.select(
        "_name", "_m", F.explode(_del1_keys(F.col("_name"))).alias("_k")
    )
    cand = (
        posting.alias("a")
        .join(posting.alias("b"), "_k")
        .filter(F.col("a._name") < F.col("b._name"))
        .select(
            F.col("a._name").alias("_na"),
            F.col("b._name").alias("_nb"),
            F.col("a._m").alias("_ma"),
            F.col("b._m").alias("_mb"),
        )
        .distinct()
        .filter(F.levenshtein(F.col("_na"), F.col("_nb")) <= 1)
    )
    pair_stats = cand.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("long").alias(
            "ed1_name_pairs"
        ),
        F.coalesce(F.sum(F.col("_ma") * F.col("_mb")), F.lit(0))
        .cast("long")
        .alias("ed1_record_pairs"),
    )
    name_stats = names.agg(
        F.sum("_m").cast("long").alias("n_records"),
        F.count(F.lit(1)).cast("long").alias("n_names"),
        F.sum(F.when(F.col("_m") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("dup_name_groups"),
        F.sum(F.expr("(_m * (_m - 1)) div 2"))
        .cast("long")
        .alias("ed0_record_pairs"),
    )
    return name_stats.join(F.broadcast(pair_stats)).select(
        "n_records",
        "n_names",
        "dup_name_groups",
        "ed0_record_pairs",
        "ed1_name_pairs",
        "ed1_record_pairs",
    )


def edit1_linkage_census_sql(
    table_expr: str, name_expr: str, max_len: int = 64
) -> str:
    """DuckDB rendering of :func:`edit1_linkage_census`.  The oracle
    verifies pairs by brute force over distinct names (length-difference
    prefilter + levenshtein) — deliberately a DIFFERENT algorithm from
    the deletion-neighborhood join, so parity also proves the FastSS
    candidate set is complete at this radius."""
    return f"""
WITH names AS (
  SELECT {name_expr} AS name, CAST(count(*) AS BIGINT) AS m
  FROM {table_expr}
  WHERE {name_expr} IS NOT NULL AND length({name_expr}) <= {max_len}
  GROUP BY 1
),
cand AS (
  SELECT a.m AS ma, b.m AS mb
  FROM names a JOIN names b
    ON a.name < b.name
   AND abs(length(a.name) - length(b.name)) <= 1
   AND levenshtein(a.name, b.name) <= 1
),
pair_stats AS (
  SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS ed1_name_pairs,
         CAST(coalesce(sum(ma * mb), 0) AS BIGINT) AS ed1_record_pairs
  FROM cand
),
name_stats AS (
  SELECT CAST(sum(m) AS BIGINT) AS n_records,
         CAST(count(*) AS BIGINT) AS n_names,
         CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_name_groups,
         CAST(sum(m * (m - 1) // 2) AS BIGINT) AS ed0_record_pairs
  FROM names
)
SELECT n_records, n_names, dup_name_groups, ed0_record_pairs,
       ed1_name_pairs, ed1_record_pairs
FROM name_stats, pair_stats
"""


def fellegi_sunter_scores(
    df: DataFrame,
    id_col: str,
    block_col: str,
    fields: list[tuple[str, str]],
    m_ppm: int = 900_000,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage scores over blocked
    candidate pairs (JASA 64 (1969): the decision-theoretic weights
    behind every production matcher — Splink, dedupe.io, OYS linkage)::

        (id_a, id_b, n_agree, score_micro)

    Per field f the AGREEMENT weight is ``log2(m_f/u_f)`` and the
    disagreement weight ``log2((1−m_f)/(1−u_f))``, where ``u_f`` — the
    chance two RANDOM records agree — is estimated exactly from the
    field's value-frequency table as ``Σ_v n_v² / N_f²`` (the standard
    frequency-based u; rarer values ⇒ smaller u ⇒ stronger evidence),
    and ``m_f`` (agreement probability among TRUE matches) is the
    caller's prior, one shared ``m_ppm`` here (the classic 0.9 default;
    per-field EM fitting is an offline concern). Weights are micro-bits
    rounded ONCE per field from exact count ratios (fixed IEEE ln/div
    sequence), so the pair score is a plain integer sum. Field rules:
    both values non-NULL and equal → agree weight; both non-NULL and
    different → disagree weight; either NULL → 0 (no evidence).
    Degenerate guards, explicit NULL weight on both engines: a
    single-valued field (u = 1 → disagreement impossible) and an
    all-NULL field (N_f = 0).

    ``score_micro`` NULL-propagates if any contributing weight is NULL
    — callers drop degenerate fields rather than score on them.

    Scale: one frequency fold per field (map-side combinable, weight
    frame is ONE row broadcast to the pairs), candidate pairs from the
    block-key self-join (the sorted_neighborhood contract: the caller
    owns block sizing; hot blocks are quadratic in output and need a
    tighter key). No window, no cross join.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(block_col).alias("_blk"),
        *[F.col(c).cast("string").alias(f"_f_{n}") for n, c in fields],
    ).localCheckpoint(eager=False)  # scanned once per field + twice for pairs
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m_d = F.lit(m_ppm / 1_000_000.0)
    weights = None
    for name, _ in fields:
        col = F.col(f"_f_{name}")
        freq = (
            base.where(col.isNotNull())
            .groupBy(col.alias("_v"))
            .agg(F.count(F.lit(1)).cast("long").alias("_n_v"))
        )
        wf = freq.agg(
            F.sum("_n_v").cast("long").alias("_nf"),
            F.sum(dec(F.col("_n_v")) * dec(F.col("_n_v"))).alias("_s2"),
        ).select(
            F.lit(0).alias("_one"),
            F.when(
                F.col("_nf") > 0,
                F.round(
                    F.log(
                        m_d
                        * (dec(F.col("_nf")) * dec(F.col("_nf"))).cast("double")
                        / F.col("_s2").cast("double")
                    )
                    / F.log(F.lit(2.0))
                    * F.lit(1000000.0)
                ).cast("long"),
            ).alias(f"w_agree_{name}"),
            F.when(
                (dec(F.col("_nf")) * dec(F.col("_nf")) - F.col("_s2")).cast("double")
                > F.lit(0.0),
                F.round(
                    F.log(
                        (F.lit(1.0) - m_d)
                        * (dec(F.col("_nf")) * dec(F.col("_nf"))).cast("double")
                        / (dec(F.col("_nf")) * dec(F.col("_nf")) - F.col("_s2")).cast(
                            "double"
                        )
                    )
                    / F.log(F.lit(2.0))
                    * F.lit(1000000.0)
                ).cast("long"),
            ).alias(f"w_disagree_{name}"),
        )
        weights = wf if weights is None else weights.join(wf, "_one")
    a, b = base.alias("_a"), base.alias("_b")
    pairs = (
        a.join(
            b,
            (F.col("_a._blk") == F.col("_b._blk"))
            & (F.col("_a._id") < F.col("_b._id")),
        )
        .withColumn("_one", one)
        .join(F.broadcast(weights), "_one")
    )
    contribs, agrees = [], []
    for name, _ in fields:
        fa, fb = F.col(f"_a._f_{name}"), F.col(f"_b._f_{name}")
        both = fa.isNotNull() & fb.isNotNull()
        agree = both & (fa == fb)
        contribs.append(
            F.when(agree, F.col(f"w_agree_{name}"))
            .when(both, F.col(f"w_disagree_{name}"))
            .otherwise(F.lit(0).cast("long"))
        )
        agrees.append(agree.cast("long"))
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    n_agree = agrees[0]
    for g in agrees[1:]:
        n_agree = n_agree + g
    return pairs.select(
        F.col("_a._id").alias("id_a"),
        F.col("_b._id").alias("id_b"),
        n_agree.cast("long").alias("n_agree"),
        total.cast("long").alias("score_micro"),
    )


def fellegi_sunter_scores_sql(
    table_expr: str,
    id_expr: str,
    block_expr: str,
    fields: list[tuple[str, str]],
    m_ppm: int = 900_000,
) -> str:
    """DuckDB rendering of :func:`fellegi_sunter_scores` — same exact
    frequency-based u, same fixed ln/log2 sequence, same NULL rules."""
    m = m_ppm / 1_000_000.0
    base_cols = ", ".join(
        f"CAST({c} AS VARCHAR) AS f_{n}" for n, c in fields
    )
    w_ctes = []
    for n, _ in fields:
        w_ctes.append(f"""
w_{n} AS (
  SELECT CASE WHEN nf > 0 THEN
           CAST(round(ln({m} * CAST(CAST(nf AS HUGEINT) * nf AS DOUBLE) / CAST(s2 AS DOUBLE))
                      / ln(2.0) * 1000000.0) AS BIGINT) END AS w_agree_{n},
         CASE WHEN CAST(CAST(nf AS HUGEINT) * nf - s2 AS DOUBLE) > 0.0 THEN
           CAST(round(ln((1.0 - {m}) * CAST(CAST(nf AS HUGEINT) * nf AS DOUBLE)
                         / CAST(CAST(nf AS HUGEINT) * nf - s2 AS DOUBLE))
                      / ln(2.0) * 1000000.0) AS BIGINT) END AS w_disagree_{n}
  FROM (
    SELECT CAST(coalesce(sum(n_v), 0) AS BIGINT) AS nf,
           coalesce(sum(CAST(n_v AS HUGEINT) * n_v), 0) AS s2
    FROM (SELECT f_{n}, CAST(count(*) AS BIGINT) AS n_v
          FROM base WHERE f_{n} IS NOT NULL GROUP BY f_{n})
  )
)""")
    contribs = " + ".join(
        f"""CASE WHEN a.f_{n} IS NOT NULL AND b.f_{n} IS NOT NULL
                 THEN CASE WHEN a.f_{n} = b.f_{n} THEN w_agree_{n}
                           ELSE w_disagree_{n} END
                 ELSE 0 END"""
        for n, _ in fields
    )
    agrees = " + ".join(
        f"CASE WHEN a.f_{n} IS NOT NULL AND b.f_{n} IS NOT NULL "
        f"AND a.f_{n} = b.f_{n} THEN 1 ELSE 0 END"
        for n, _ in fields
    )
    w_join = ", ".join(f"w_{n}" for n, _ in fields)
    return f"""
WITH base AS (
  SELECT CAST({id_expr} AS BIGINT) AS id, {block_expr} AS blk, {base_cols}
  FROM {table_expr}
),{",".join(w_ctes)}
SELECT a.id AS id_a, b.id AS id_b,
       CAST({agrees} AS BIGINT) AS n_agree,
       CAST({contribs} AS BIGINT) AS score_micro
FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id, {w_join}
"""
