"""Corpus-curation operators for large-scale training-data pipelines.

These extend the reference's ETL surface (SURVEY.md §2.10 — it has none of
these) with the corpus-level curation stages an LLM-data pipeline runs
after per-document scoring (``text/``) and before dedup (``dedup/``):

- :func:`repetition_signals` — Gopher-style intra-document repetition
  metrics (duplicate-word fraction, top-bigram fraction; Rae et al. 2021
  §A1.2 "repetitious text" filters).
- :func:`ngram_decontaminate` — benchmark decontamination by word n-gram
  overlap (the GPT-3 appendix-C / PaLM-style 13-gram protocol, width
  parameterized).
- :func:`weighted_sample` — deterministic per-stratum downsampling for
  corpus mixing (e.g. cap the dominant language), driven by an md5-hex
  threshold so it is reproducible, seedless, and engine-portable.
- :func:`pack_token_shards` — assign documents to fixed-token-budget
  training shards via a two-phase distributed prefix sum (no global
  single-partition window).
- :func:`cross_source_leakage` — exact-text collisions across corpus
  sources (train/test split leakage census).
- :func:`exact_substring_spans` — duplicated token-window census with
  interval-union coverage (the distributable analogue of Lee et al. 2021
  "Deduplicating Training Data Makes Language Models Better" ExactSubstr:
  their suffix array finds repeated ≥50-token spans; a rolling window of
  hashed W-token shingles finds the same spans as an equi-join on a
  uniform 60-bit key, which shards where a suffix array does not).
- :func:`hash_feature_score` — fastText-style linear quality classifier
  over hashing-trick bag-of-words features (Joulin et al. 2016). Scoring
  is a pure per-row expression (no shuffle, no model server); weights are
  integer-micros so the fold is exact integer arithmetic, bit-identical
  across engines.
- :func:`epoch_shuffle` — deterministic global training-order permutation
  (seed-keyed md5 sort key → dense 0-based position) computed as a
  two-phase distributed rank: per-bucket counts, a tiny bucket-offset
  window, then within-bucket ``row_number`` — never one global
  single-partition sort rank.
- :func:`assign_split` — deterministic train/val/test assignment by
  md5-hex range, the split-before-dedup primitive; pure per-row
  expression, reproducible across engines, re-runs, and retried tasks.
- :func:`tfidf_top_terms` — per-document characteristic terms by tf·idf
  (Spärck Jones 1972): corpus document frequencies + per-doc top-k
  window, all equi-joins on uniform term keys.
- :func:`bigram_lm_score` — CCNet-style (Wenzek et al. 2019) perplexity
  proxy: an add-one-smoothed bigram LM trained on the corpus by two
  count aggregations, documents scored by average negative log-prob with
  the per-term terms rounded to integer micronats so the per-doc sum is
  exact (float-summation-order-proof).
- :func:`drop_boilerplate_paragraphs` — C4/RefinedWeb-style removal of
  paragraphs repeated corpus-wide more than a document-frequency cap,
  with in-order text reconstruction.
- :func:`bm25_topk` — Okapi BM25 (Robertson & Zaragoza 2009) top-k
  retrieval for a fixed term set: per-term partial scores rounded to
  integer micro-units before the per-doc sum (exact BIGINT, the same
  float discipline as the LM score), ranked via orderBy+limit
  (TakeOrderedAndProject — partitions ship local top-k only).

All operators are pure ``pyspark.sql.functions`` expression trees +
equi-join/groupBy shuffles on uniform hashed keys — no Python UDFs, no
driver-side collects, no caching. Each has an exactly-equivalent DuckDB
rendering in ``plans/curation.py`` built from the same constants, so the
driver's oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "repetition_signals",
    "ngram_decontaminate",
    "weighted_sample",
    "weight_threshold_hex",
    "stratified_sample_exact",
    "stratified_sample_exact_sql",
    "pack_token_shards",
    "cross_source_leakage",
    "exact_substring_spans",
    "hash_feature_score",
    "epoch_shuffle",
    "assign_split",
    "tfidf_top_terms",
    "bigram_lm_score",
    "drop_boilerplate_paragraphs",
    "bm25_topk",
    "BM25_K1",
    "BM25_B",
    "temporal_split",
    "temporal_split_census",
    "temporal_split_census_sql",
    "token_pmi",
    "token_pmi_sql",
    "largest_remainder_allocation",
    "largest_remainder_allocation_sql",
    "kl_token_drift",
    "kl_token_drift_sql",
    "token_counts",
    "kl_from_token_counts",
]


def _toks(text_col: str) -> Column:
    """Whitespace tokens. The synthetic corpus is single-space separated;
    a real corpus would normalize first (text.tokens_norm)."""
    return F.split(F.col(text_col), " ")


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the document
    is shorter than ``n`` (guarded: Spark's ``sequence(0, negative)`` would
    otherwise DESCEND and fabricate n-grams from negative indexes).

    ``toks`` MUST reference a MATERIALIZED array column, not an inline
    ``split(...)`` expression: common-subexpression elimination does not
    reach inside higher-order-function lambdas, so an inline split would
    re-tokenize the document once per ``element_at`` — O(len²·n) per doc
    (measured 4× on the decontamination explode at sf0.1)."""
    count = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), count - F.lit(1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j + 1)).cast("int")) for j in range(n)]
        ),
    )
    return F.when(count > 0, grams).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# 1. Intra-document repetition (Gopher quality signals)
# ---------------------------------------------------------------------------

def repetition_signals(id_col: str, text_col: str):
    """Per-document repetition metrics:

    - ``n_tok`` — whitespace token count;
    - ``dup_word_frac`` — ``1 - distinct_tokens / n_tok`` (expression-only,
      ``array_distinct`` is a per-row hash set, no shuffle);
    - ``top_bigram_frac`` — occurrences of the single most frequent word
      bigram divided by total bigrams (0.0 for documents with < 2 tokens).

    Plan: the bigram mode can NOT be a per-row expression without O(len²)
    work, so it rides one explode → two map-side-combinable aggregations
    keyed by (doc, bigram) then (doc) — both shuffles are doc-grained
    (uniform), and the exploded width is bounded by document length.
    Scales: per-doc cost linear, shuffle keys uniform, no caching.
    """

    def apply(df: DataFrame) -> DataFrame:
        toks = F.col("_ts")
        base = df.select(F.col(id_col), _toks(text_col).alias("_ts")).select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_tok"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct(toks)).cast("double")
                / F.size(toks).cast("double")
            ).alias("dup_word_frac"),
            _word_ngrams(toks, 2).alias("_bigrams"),
        )
        bg_counts = (
            base.select(id_col, F.explode("_bigrams").alias("_bg"))
            .groupBy(id_col, "_bg")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .groupBy(id_col)
            .agg(
                (
                    F.max("_cnt").cast("double")
                    / F.sum("_cnt").cast("double")
                ).alias("top_bigram_frac")
            )
        )
        return (
            base.drop("_bigrams")
            .join(bg_counts, id_col, "left")
            .withColumn("top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0)))
        )

    return apply


# ---------------------------------------------------------------------------
# 2. Benchmark decontamination by word n-gram overlap
# ---------------------------------------------------------------------------

def ngram_decontaminate(
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 1,
):
    """Flag corpus documents sharing ≥ ``min_overlap`` distinct word
    ``n``-grams with any benchmark document (the eval-set decontamination
    protocol: GPT-3 used 13-grams; width is a parameter because the
    synthetic docs are short).

    Returns per flagged doc: ``overlap_ngrams`` (distinct shared grams),
    ``total_ngrams`` (distinct grams in the doc), ``overlap_frac``.

    Plan: both sides explode to DISTINCT (id, gram) postings, the gram is
    folded to a 60-bit md5 integer before the shuffle (fixed-width key,
    uniform), the benchmark side collapses to a distinct gram set, and the
    match is a plain equi-join — never doc×doc. A natural-language hot
    gram ("of the and …") inflates only its own posting list, and the
    benchmark side is distinct so the join fan-out per corpus posting is
    at most 1. Scales.
    """
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    def postings(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), _toks(text_col).alias("_ts"))
            .select(
                F.col(id_col),
                F.explode(_word_ngrams(F.col("_ts"), n)).alias("_gram"),
            )
            .select(id_col, md5_long(F.col("_gram")).alias("_g"))
            .distinct()
        )

    def apply(corpus: DataFrame) -> DataFrame:
        # Single pass: LEFT-join the corpus postings against the (small,
        # distinct) benchmark gram set with a hit flag, then ONE doc-grained
        # aggregation computes both the total and the overlap — evaluating
        # the postings frame once. (A totals-branch + overlap-branch pair
        # re-scanned and re-exploded the corpus twice: exchange reuse does
        # not fire across the differing join/agg shapes, and at sf0.1 the
        # two-branch form measured 6.4 s vs 1.6 s for this one.) The join
        # is un-hinted: AQE broadcasts the benchmark side while it is small
        # and falls back to a shuffle join if a benchmark ever is not.
        corp = postings(corpus)
        bench = (
            postings(benchmark)
            .select("_g")
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        return (
            corp.join(bench, "_g", "left")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("total_ngrams"),
                F.count("_hit").alias("overlap_ngrams"),
            )
            .filter(F.col("overlap_ngrams") >= min_overlap)
            .select(
                id_col,
                "overlap_ngrams",
                "total_ngrams",
                (
                    F.col("overlap_ngrams").cast("double")
                    / F.col("total_ngrams").cast("double")
                ).alias("overlap_frac"),
            )
        )

    return apply


# ---------------------------------------------------------------------------
# 3. Deterministic weighted sampling (corpus mixing)
# ---------------------------------------------------------------------------

def weight_threshold_hex(w: float) -> str:
    """8-hex-char threshold such that ``substr(md5(id),1,8) < threshold``
    keeps ~``w`` of rows. md5 hex is uniform in [0, 2^32); ``w >= 1``
    returns ``'g'`` which every hex string sorts below (keep-all without a
    special case in the predicate)."""
    if w >= 1.0:
        return "g"
    if w <= 0.0:
        return "0" * 8
    return format(int(w * 0x1_0000_0000), "08x")


def weighted_sample(id_col: str, strat_col: str, weights: dict[str, float],
                    default: float = 1.0):
    """Keep each row with per-stratum probability ``weights[stratum]``
    (``default`` otherwise), decided by ``substr(md5(id), 1, 8)`` compared
    lexicographically against a precomputed hex threshold.

    Deterministic (re-runs and retried tasks sample identically — never
    ``rand()``), seedless, and engine-portable (DuckDB's md5 hex is
    byte-identical). Pure per-row predicate: no shuffle, pushes to the
    scan. The classic corpus-mixing primitive: down-weight a dominant
    language/domain without materializing per-stratum counts.
    """
    thr = F.lit(weight_threshold_hex(default))
    for stratum, w in sorted(weights.items()):
        thr = F.when(
            F.col(strat_col) == F.lit(stratum), F.lit(weight_threshold_hex(w))
        ).otherwise(thr)

    def apply(df: DataFrame) -> DataFrame:
        draw = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
        return df.filter(draw < thr)

    return apply


def stratified_sample_exact(
    id_col: str, strat_col: str, k: int, n_salts: int = 8
):
    """Take EXACTLY ``min(k, |stratum|)`` rows per stratum, chosen by the
    deterministic hash order ``md5_long(id)`` (ties broken by id) — the
    class-balanced counterpart of :func:`weighted_sample` ("exactly 10k
    examples per language", few-shot pools, eval-set carving). Re-runs,
    retried tasks, and both engines pick the identical rows.

    Plan: two-phase salted top-k (never a single-partition-per-stratum
    window, which at 100 TB funnels a whole stratum through one task —
    cf. similarity's two-phase rank). Phase 1 ranks within
    ``(stratum, pmod(hash(id), n_salts))`` and keeps k per salt; phase 2
    re-ranks the ≤ k·n_salts survivors per stratum — a frame bounded by
    strata·k·n_salts, independent of input size. Exactness: the global
    top-k by any total order is contained in the union of per-salt top-ks.
    """
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    def apply(df: DataFrame) -> DataFrame:
        key = md5_long(F.col(id_col).cast("string"))
        salt = F.pmod(F.hash(F.col(id_col)), F.lit(n_salts))
        w1 = Window.partitionBy(F.col(strat_col), salt).orderBy(
            key.asc(), F.col(id_col).asc()
        )
        local = (
            df.withColumn("_rk", F.row_number().over(w1))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
        w2 = Window.partitionBy(strat_col).orderBy(key.asc(), F.col(id_col).asc())
        return (
            local.withColumn("_rk", F.row_number().over(w2))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )

    return apply


def stratified_sample_exact_sql(
    table: str, id_col: str, strat_col: str, k: int, cols: str
) -> str:
    """DuckDB oracle for :func:`stratified_sample_exact`: a single-phase
    ranked window — exact top-k is plan-independent, so the simple form
    verifies the salted one."""
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    key = md5_long_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {cols} FROM (
  SELECT {cols}, row_number() OVER (
    PARTITION BY {strat_col} ORDER BY {key}, {id_col}
  ) AS _rk
  FROM {table}
) _s WHERE _rk <= {k}
"""


# ---------------------------------------------------------------------------
# 4. Token-budget shard packing (two-phase distributed prefix sum)
# ---------------------------------------------------------------------------

def pack_token_shards(id_col: str, weight_col, shard_size: int,
                      chunk: int = 4096):
    """Assign each document to a fixed-token-budget training shard:
    ``shard = floor(start_offset / shard_size)`` where ``start_offset`` is
    the running token total of all documents before it in ``id_col`` order
    (a document straddling a boundary belongs to the shard it starts in).

    A naive ``sum() OVER (ORDER BY id)`` is a single-partition global
    window — a straggler by construction at 100 TB. This is the two-phase
    distributed prefix sum instead:

    1. per-chunk subtotals (``chunk_id = floor(id / chunk)``) — one
       map-side-combinable aggregation to n/chunk rows;
    2. exclusive prefix over the (tiny) subtotal frame — the only global
       window, over n/chunk rows (at 10^12 docs and chunk=2^20 that is
       ~10^6 rows: fine);
    3. broadcast the offsets back and run the within-chunk window, whose
       partitions are bounded by ``chunk`` rows.

    ``weight_col`` may be a column name or a Column expression (e.g. a
    token count derived from text). All arithmetic is BIGINT — exact, no
    float drift against the oracle.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col

    def apply(df: DataFrame) -> DataFrame:
        base = df.select(
            F.col(id_col),
            w.cast("bigint").alias("n_tok"),
            (F.col(id_col) / F.lit(chunk)).cast("bigint").alias("_chunk"),
        )
        subtotals = base.groupBy("_chunk").agg(F.sum("n_tok").alias("_chunk_tok"))
        offsets = subtotals.select(
            "_chunk",
            F.coalesce(
                F.sum("_chunk_tok").over(
                    Window.orderBy("_chunk").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_offset"),
        )
        within = Window.partitionBy("_chunk").orderBy(id_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return (
            base.join(F.broadcast(offsets), "_chunk")
            .select(
                id_col,
                "n_tok",
                (
                    F.col("_offset") + F.coalesce(F.sum("n_tok").over(within), F.lit(0))
                ).alias("start_offset"),
            )
            .withColumn(
                "shard",
                (F.col("start_offset") / F.lit(shard_size)).cast("bigint"),
            )
        )

    return apply


# ---------------------------------------------------------------------------
# 5. Cross-source exact-duplicate leakage census
# ---------------------------------------------------------------------------

def cross_source_leakage(id_col: str, text_col: str, source_col: str):
    """Exact-text fingerprints present in ≥ 2 distinct sources — the
    train/test-leakage census run before committing a source-level split.

    Returns per leaked fingerprint: ``fp`` (md5 of the text),
    ``n_sources``, ``n_docs``, ``first_doc_id`` (canonical survivor).
    One shuffle on the uniform 128-bit fingerprint; distinct-source count
    is a partial-aggregable ``count(distinct)`` over a low-cardinality
    value set per group. Scales.
    """

    def apply(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.md5(F.col(text_col)).alias("fp"),
                F.col(source_col),
                F.col(id_col),
            )
            .groupBy("fp")
            .agg(
                F.countDistinct(source_col).alias("n_sources"),
                F.count(F.lit(1)).alias("n_docs"),
                F.min(id_col).alias("first_doc_id"),
            )
            .filter(F.col("n_sources") >= 2)
        )

    return apply


# ---------------------------------------------------------------------------
# 6. Duplicated-substring census (rolling-hash ExactSubstr analogue)
# ---------------------------------------------------------------------------

def exact_substring_spans(id_col: str, text_col: str, width: int = 8):
    """Per-document duplicated-span census: which W-token windows occur
    more than once anywhere in the corpus (intra- or cross-document), and
    how many of each document's tokens those duplicated spans cover.

    The distributable analogue of Lee et al. 2021 ExactSubstr: their
    suffix array finds repeated spans in one address space; here every
    W-token rolling window folds to a 60-bit hash, duplicate hashes are a
    partial-aggregable count on a uniform key, and span coverage is the
    interval-union of the surviving windows.

    Returns one row per document: ``n_tok``, ``n_windows``
    (= max(n_tok − W + 1, 0)), ``n_dup_windows``, ``dup_tokens`` (tokens
    covered by ≥1 duplicated window — overlapping windows are unioned,
    not double-counted), ``dup_token_frac``.

    Plan: posexplode (bounded by doc length) → groupBy on the uniform
    window hash (map-side combinable count) → join postings back to the
    duplicated-hash set (fan-out ≤ 1 per posting) → interval union as ONE
    doc-partitioned window pass: sorted by position, each window
    contributes ``min(W, pos − prev_pos)`` new tokens (first contributes
    W), so coverage needs no per-row interval list. Every shuffle key is
    either the 60-bit hash or the doc id — uniform. Scales.
    """

    def apply(df: DataFrame) -> DataFrame:
        from dwh_etl_ods_spark_jobs_spark.text import md5_long

        base = df.select(F.col(id_col), _toks(text_col).alias("_ts"))
        stats = base.select(
            F.col(id_col),
            F.size("_ts").cast("long").alias("n_tok"),
            F.greatest(
                F.size("_ts") - F.lit(width - 1), F.lit(0)
            ).cast("long").alias("n_windows"),
        )
        posting = base.select(
            F.col(id_col),
            F.posexplode(_word_ngrams(F.col("_ts"), width)).alias("pos", "_gram"),
        ).select(id_col, "pos", md5_long(F.col("_gram")).alias("_w"))
        dup = (
            posting.groupBy("_w")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") >= 2)
            .select("_w")
        )
        order = Window.partitionBy(id_col).orderBy("pos")
        cov = (
            posting.join(dup, "_w")
            .withColumn("_prev", F.lag("pos").over(order))
            .withColumn(
                "_inc",
                F.when(F.col("_prev").isNull(), F.lit(width)).otherwise(
                    F.least(F.lit(width), F.col("pos") - F.col("_prev"))
                ),
            )
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_dup_windows"),
                F.sum("_inc").cast("long").alias("dup_tokens"),
            )
        )
        return (
            stats.join(cov, id_col, "left")
            .select(
                id_col,
                "n_tok",
                "n_windows",
                F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias(
                    "n_dup_windows"
                ),
                F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
                (
                    F.coalesce("dup_tokens", F.lit(0)).cast("double")
                    / F.col("n_tok").cast("double")
                ).alias("dup_token_frac"),
            )
        )

    return apply


# ---------------------------------------------------------------------------
# 7. Hashing-trick linear quality classifier (fastText-style scoring)
# ---------------------------------------------------------------------------

def hash_feature_score(
    id_col: str,
    text_col: str,
    weights_micro,
    bias_micro: int = 0,
    threshold: float = 0.0,
):
    """Score each document with a linear bag-of-words classifier over
    hashing-trick features (Joulin et al. 2016 fastText architecture:
    mean-pooled bucket weights + bias), and flag ``keep = score ≥
    threshold``.

    ``weights_micro`` is the trained weight vector in INTEGER MICROS
    (w·10⁶): the per-document fold is then exact BIGINT arithmetic —
    associative, engine-portable, immune to float summation order — and
    only the final mean/bias step divides into a double. Buckets come
    from the portable 60-bit md5 hash (``text.md5_long``), not Murmur3,
    so any engine reproduces the features.

    Pure per-row expression tree: no shuffle, no model server, no UDF —
    the classifier IS the plan, and a 100 TB corpus scores in one
    scan-side pass with the filter pushable on top.
    """
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    n_buckets = len(weights_micro)
    warr = F.array(*[F.lit(int(w)).cast("long") for w in weights_micro])
    bias = float(bias_micro) / 1e6

    def apply(df: DataFrame) -> DataFrame:
        toks = F.col("_ts")
        folded = F.aggregate(
            F.transform(
                toks,
                lambda t: F.element_at(
                    warr, (md5_long(t) % F.lit(n_buckets)).cast("int") + F.lit(1)
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        score = (
            F.col("_s").cast("double")
            / F.col("n_tok").cast("double")
            / F.lit(1000000.0)
            + F.lit(bias)
        )
        return (
            df.select(F.col(id_col), _toks(text_col).alias("_ts"))
            .select(
                F.col(id_col),
                F.size(toks).cast("long").alias("n_tok"),
                folded.alias("_s"),
            )
            .select(
                id_col,
                "n_tok",
                score.alias("score"),
                (score >= F.lit(threshold)).alias("keep"),
            )
        )

    return apply


# ---------------------------------------------------------------------------
# 8. Deterministic epoch shuffle (global training-order permutation)
# ---------------------------------------------------------------------------

def epoch_shuffle(id_col: str, seed: str, buckets: int = 256):
    """Assign each document a dense 0-based position in a deterministic
    pseudo-random global order — the per-epoch corpus shuffle: change
    ``seed`` and the whole order re-permutes, re-run with the same seed
    and it is bit-identical (training resumability; never ``rand()``).

    The sort key is ``md5(seed || ':' || id)`` — uniform hex, so the
    global rank decomposes exactly like :func:`pack_token_shards`'s
    prefix sum: the first hex chars split the keyspace into ``buckets``
    ordered, uniformly-loaded ranges; per-bucket counts fold into
    exclusive offsets over a ``buckets``-row window (the only global
    step), and ``row_number`` inside each bucket is a bounded-partition
    window. A naive ``row_number() OVER (ORDER BY key)`` is one
    single-partition sort of the entire corpus — a straggler by
    construction at 100 TB.

    ``buckets`` must be a power of 16 (each 16× uses one more leading
    hex char of the key; ranking within a bucket by the FULL key keeps
    the global order identical for every choice — property-tested). Size
    it so corpus/buckets rows fit one task comfortably.
    Output: ``(id_col, epoch_pos)``.
    """
    hex_chars = round(math.log(buckets, 16))
    if 16 ** hex_chars != buckets or hex_chars < 1:
        raise ValueError("epoch_shuffle buckets must be a power of 16")

    def apply(df: DataFrame) -> DataFrame:
        key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
        base = df.select(
            F.col(id_col),
            key.alias("_key"),
            F.conv(F.substring(key, 1, hex_chars), 16, 10).cast("int").alias("_b"),
        )
        counts = base.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
        offsets = counts.select(
            "_b",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long").alias("_off"),
        )
        within = Window.partitionBy("_b").orderBy("_key", id_col)
        return base.join(F.broadcast(offsets), "_b").select(
            id_col,
            (F.col("_off") + F.row_number().over(within) - F.lit(1)).alias(
                "epoch_pos"
            ),
        )

    return apply


# ---------------------------------------------------------------------------
# 9. Deterministic train/val/test split assignment
# ---------------------------------------------------------------------------

def assign_split(id_col: str, splits):
    """Label each row with a split name by md5-hex range: ``splits`` is an
    ordered ``(name, fraction)`` mapping (fractions sum to ≤ 1; any
    remainder falls to the LAST split). The draw is
    ``substr(md5(id), 1, 8)`` against cumulative thresholds — the same
    uniform [0, 2^32) draw as :func:`weighted_sample`, so a document's
    split never changes across re-runs, engines, or corpus growth
    (membership depends only on the id, not on other rows).

    Split BEFORE near-dedup and decontamination so eval membership is
    stable, then run :func:`cross_source_leakage` / near-dup ACROSS the
    split boundary to enforce it. Pure per-row expression: no shuffle.
    """
    items = list(splits.items())
    if not items:
        raise ValueError("assign_split needs at least one split")
    cum = 0.0
    arms = []  # (threshold_hex, name) upper-exclusive bounds
    for name, frac in items[:-1]:
        cum += frac
        arms.append((weight_threshold_hex(cum), name))

    def apply(df: DataFrame) -> DataFrame:
        draw = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
        expr = F.lit(items[-1][0])
        for thr, name in reversed(arms):
            expr = F.when(draw < F.lit(thr), F.lit(name)).otherwise(expr)
        return df.withColumn("split", expr)

    return apply


# ---------------------------------------------------------------------------
# 10. Corpus TF-IDF top terms
# ---------------------------------------------------------------------------

def tfidf_top_terms(id_col: str, text_col: str, k: int = 5):
    """Top-``k`` characteristic terms per document by tf·idf (Spärck
    Jones 1972): ``score = tf(d,t) · ln(N / df(t))``, ties broken by term
    text so the cut is deterministic.

    Returns ``(id, term, tf, df, score, rank)`` with ``rank ≤ k``.
    ``score`` is rounded to 6 decimals — it is a SINGLE ln/multiply per
    row (never a float summation), so both engines agree after rounding.

    Plan: explode → (doc, term) count [uniform key] → term document
    frequency [map-side combinable] → idf joined back by term equi-join
    (fan-out 1 per posting) → per-doc top-k window (partition bounded by
    the doc's distinct-term count). The corpus size ``N`` attaches via a
    broadcast single-row frame on a constant key — an equi-join, not a
    cartesian. Scales.
    """

    def apply(df: DataFrame) -> DataFrame:
        postings = (
            df.select(F.col(id_col), F.explode(_toks(text_col)).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        docfreq = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df")
        )
        # Scalar attach: both "_one" keys are data-DERIVED constants
        # (pmod(hash(col), 1) == 0) so constant folding cannot collapse the
        # equi-join condition to `true` — which would demote this 1-row
        # broadcast join to a BroadcastNestedLoopJoin.
        n_docs = df.select(F.countDistinct(id_col).alias("_n")).withColumn(
            "_one", F.pmod(F.hash("_n"), F.lit(1))
        )
        scored = (
            postings.join(docfreq, "term")
            .withColumn("_one", F.pmod(F.hash("tf"), F.lit(1)))
            .join(F.broadcast(n_docs), "_one")
            .select(
                id_col,
                "term",
                "tf",
                "df",
                F.round(
                    F.col("tf")
                    * F.log(F.col("_n").cast("double") / F.col("df").cast("double")),
                    6,
                ).alias("score"),
            )
        )
        rank = Window.partitionBy(id_col).orderBy(
            F.col("score").desc(), F.col("term")
        )
        return (
            scored.withColumn("rank", F.row_number().over(rank))
            .filter(F.col("rank") <= k)
        )

    return apply


# ---------------------------------------------------------------------------
# 11. Bigram language-model score (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------

def bigram_lm_score(id_col: str, text_col: str):
    """Score every document against a bigram language model trained on
    the corpus itself — the in-engine analogue of CCNet's (Wenzek et al.
    2019) KenLM perplexity filter: gibberish and boilerplate score far
    from the corpus mean, and the model is just two count aggregations.

    ``P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁) + V)`` (add-one smoothing over
    vocabulary size ``V``); per document we report ``n_bigrams`` and
    ``avg_neg_logprob`` (natural log; perplexity = e^avg). Documents with
    < 2 tokens report 0.0.

    Float discipline: each bigram's −ln P is rounded to INTEGER
    MICRONATS before the per-doc sum, so the aggregation is exact BIGINT
    (groupBy summation order cannot perturb the result — a raw double
    sum is order-dependent and would break cross-engine parity); only
    the final mean divides back into a double.

    Plan: model = two groupBy counts on uniform gram keys; scoring =
    doc-bigram postings equi-joined to the model (fan-out 1), one
    doc-grained sum. V and the smoothing ride a broadcast single-row
    frame on a constant key. Scales.
    """

    def apply(df: DataFrame) -> DataFrame:
        base = df.select(F.col(id_col), _toks(text_col).alias("_ts"))
        # (doc, w1, w2) posting per bigram occurrence, with per-doc counts
        occ = (
            base.select(
                F.col(id_col),
                F.posexplode(_word_ngrams(F.col("_ts"), 2)).alias("_p", "_bg"),
            )
            .select(id_col, "_bg")
            .groupBy(id_col, "_bg")
            .agg(F.count(F.lit(1)).alias("_occ"))
        )
        # model counts over the whole corpus
        bg_counts = occ.groupBy("_bg").agg(F.sum("_occ").alias("_c12"))
        uni = (
            base.select(F.explode("_ts").alias("_w1"))
            .groupBy("_w1")
            .agg(F.count(F.lit(1)).alias("_c1"))
        )
        # Data-derived constant key (see tfidf_top_terms): keeps the 1-row
        # vocab attach an equi-join, not a BroadcastNestedLoopJoin.
        vocab = uni.select(F.count(F.lit(1)).alias("_v")).withColumn(
            "_one", F.pmod(F.hash("_v"), F.lit(1))
        )
        model = (
            bg_counts.withColumn(
                "_w1", F.substring_index("_bg", " ", 1)
            )
            .join(uni, "_w1")
            .withColumn("_one", F.pmod(F.hash("_c12"), F.lit(1)))
            .join(F.broadcast(vocab), "_one")
            .select(
                "_bg",
                F.round(
                    -F.log(
                        (F.col("_c12") + F.lit(1)).cast("double")
                        / (F.col("_c1") + F.col("_v")).cast("double")
                    )
                    * F.lit(1000000.0)
                ).cast("long").alias("_nlp_micro"),
            )
        )
        scored = (
            occ.join(model, "_bg")
            .groupBy(id_col)
            .agg(
                F.sum("_occ").cast("long").alias("n_bigrams"),
                F.sum(F.col("_occ") * F.col("_nlp_micro")).alias("_s"),
            )
            .select(
                id_col,
                "n_bigrams",
                F.round(
                    F.col("_s").cast("double")
                    / F.col("n_bigrams").cast("double")
                    / F.lit(1000000.0),
                    6,
                ).alias("avg_neg_logprob"),
            )
        )
        all_docs = base.select(F.col(id_col))
        return (
            all_docs.join(scored, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
                F.coalesce("avg_neg_logprob", F.lit(0.0)).alias("avg_neg_logprob"),
            )
        )

    return apply


# ---------------------------------------------------------------------------
# 12. Boilerplate-paragraph removal (C4-style corpus-frequency line dedup)
# ---------------------------------------------------------------------------

def drop_boilerplate_paragraphs(
    id_col: str,
    text_col: str,
    para_tokens: int = 10,
    max_df: int = 5,
):
    """Remove paragraphs that repeat across the corpus more than
    ``max_df`` times and rebuild each document's text — the C4/RefinedWeb
    boilerplate pass (Raffel et al. 2020 drop repeated lines/spans;
    navigation chrome, cookie banners, promo footers) applied to
    fixed-width ``para_tokens`` chunks (the synthetic corpus has no
    newlines; a real corpus would split on them instead).

    Returns ``(id, n_paras, n_dropped, clean_text)`` — ``clean_text`` is
    the surviving paragraphs re-joined in document order ('' when
    everything was dropped).

    Plan: chunking is a per-row expression (slice over the materialized
    token array); corpus paragraph frequency is one map-side-combinable
    count on the uniform md5 key; the verdict joins back with fan-out 1;
    reconstruction is a doc-grained sort-under-aggregation
    (``array_sort(collect_list(struct(pos, para)))``) whose group width
    is bounded by the document's paragraph count. Scales.
    """

    def apply(df: DataFrame) -> DataFrame:
        ts = F.col("_ts")
        n_chunks = F.ceil(F.size(ts) / F.lit(float(para_tokens))).cast("int")
        paras = F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.concat_ws(
                " ",
                F.slice(ts, (i * F.lit(para_tokens) + F.lit(1)).cast("int"),
                        para_tokens),
            ),
        )
        base = df.select(F.col(id_col), _toks(text_col).alias("_ts")).select(
            F.col(id_col), paras.alias("_paras")
        )
        stats = base.select(
            F.col(id_col), F.size("_paras").cast("long").alias("n_paras")
        )
        exploded = base.select(
            F.col(id_col),
            F.posexplode("_paras").alias("pos", "_para"),
        ).withColumn("_h", F.md5("_para"))
        freq = exploded.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
        verdicts = exploded.join(freq, "_h")
        kept = (
            verdicts.filter(F.col("_df") <= max_df)
            .groupBy(id_col)
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "_para"))
                        ),
                        lambda x: x["_para"],
                    ),
                    " ",
                ).alias("clean_text"),
                F.count(F.lit(1)).alias("_n_kept"),
            )
        )
        return (
            stats.join(kept, id_col, "left")
            .select(
                id_col,
                "n_paras",
                (
                    F.col("n_paras") - F.coalesce("_n_kept", F.lit(0))
                ).cast("long").alias("n_dropped"),
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            )
        )

    return apply


# ---------------------------------------------------------------------------
# 13. BM25 top-k retrieval (Okapi BM25, Robertson & Zaragoza 2009)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    id_col: str, text_col: str, terms: list[str], k: int = 10,
    tokens_col: str | None = None,
):
    """Rank documents against a fixed query-term set by Okapi BM25 and
    return the top ``k`` — the retrieval primitive a corpus pipeline uses
    for "find documents about X" sweeps (and the scoring half of a
    sparse-retrieval index).

    Returns ``(id, n_terms_hit, bm25_micro)`` — the score in integer
    micro-units, ranked by (score desc, id asc).

    Float discipline (same as :func:`bigram_lm_score`): each (doc, term)
    partial ``idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` is rounded
    to an integer micro-score BEFORE the per-doc sum, so aggregation
    order cannot perturb the ranking and the DuckDB oracle hash-matches.

    Plan: term-frequency extraction is a per-row expression over the
    materialized token array (no corpus-wide explode — only |terms|
    probes per doc); document frequencies aggregate to |terms| rows and
    BROADCAST back (a term key is maximally skewed — shuffling postings
    by term would put every posting of a hot term on one reducer); the
    corpus scalars (N, avgdl) attach via a data-derived constant-key
    broadcast HASH join (see tfidf_top_terms); the final rank is
    orderBy+limit = TakeOrderedAndProject, partitions ship local top-k
    only. Scales.
    """

    def apply(df: DataFrame) -> DataFrame:
        # r14: lazy-checkpoint the tokenized frame — postings and the
        # corpus scalars each re-ran the tokenizer over the whole corpus
        # otherwise (measured 0.93x / 0.86x on the hybrid/rrf retrieval
        # queries). ``tokens_col`` skips tokenization AND the checkpoint:
        # the caller passes an already-materialized token-array frame
        # (the ndcg eval shares ONE across its per-query arms — a
        # per-arm checkpoint there measured 1.25x, tools/ab_bm25_r14.json).
        if tokens_col is not None:
            base = df.select(
                F.col(id_col),
                F.col(tokens_col).alias("_ts"),
                F.size(tokens_col).cast("long").alias("_dl"),
            )
        else:
            base = df.select(F.col(id_col), _toks(text_col).alias("_ts")).select(
                F.col(id_col),
                F.col("_ts"),
                F.size("_ts").cast("long").alias("_dl"),
            ).localCheckpoint(eager=False)
        # one row per (doc, query-term) with tf > 0; tf via a per-row
        # filtered count of the token array — no explode of non-query terms
        postings = (
            base.select(
                F.col(id_col),
                F.col("_dl"),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).alias("_term"),
                                F.size(
                                    F.filter(F.col("_ts"), lambda x: x == F.lit(t))
                                ).cast("long").alias("_tf"),
                            )
                            for t in terms
                        ]
                    )
                ).alias("_p"),
            )
            .select(id_col, "_dl", F.col("_p._term").alias("_term"), F.col("_p._tf").alias("_tf"))
            .filter(F.col("_tf") > 0)
        )
        dfreq = postings.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
        # corpus scalars on a data-derived constant key (equi-join, so the
        # broadcast stays a HASH join — constant folding would demote a
        # literal key to BroadcastNestedLoopJoin)
        stats = base.agg(
            F.count(F.lit(1)).alias("_n_docs"),
            F.sum("_dl").alias("_sum_dl"),
        ).select(
            "_n_docs",
            F.round(
                F.col("_sum_dl").cast("double")
                * F.lit(1000000.0)
                / F.col("_n_docs").cast("double")
            ).cast("long").alias("_avgdl_micro"),
        ).withColumn("_one", F.pmod(F.hash("_n_docs"), F.lit(1)))
        idf = F.log(
            F.lit(1.0)
            + ((F.col("_n_docs") - F.col("_df")).cast("double") + F.lit(0.5))
            / (F.col("_df").cast("double") + F.lit(0.5))
        )
        dl_norm = (
            F.col("_dl").cast("double") * F.lit(1000000.0)
        ) / F.col("_avgdl_micro").cast("double")
        tf_d = F.col("_tf").cast("double")
        part = idf * (
            (tf_d * F.lit(BM25_K1 + 1.0))
            / (tf_d + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl_norm))
        )
        scored = (
            postings.join(F.broadcast(dfreq), "_term")
            .withColumn("_one", F.pmod(F.hash("_tf"), F.lit(1)))
            .join(F.broadcast(stats), "_one")
            .select(
                F.col(id_col),
                F.round(part * F.lit(1000000.0)).cast("long").alias("_s_micro"),
            )
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_terms_hit"),
                F.sum("_s_micro").alias("bm25_micro"),
            )
        )
        return scored.orderBy(
            F.desc("bm25_micro"), F.asc(id_col)
        ).limit(k)

    return apply


# ---------------------------------------------------------------------------
# 16. Temporal train/test split with embargo (leakage-safe time series)
# ---------------------------------------------------------------------------

def temporal_split(date_col: str, train_end: str, test_start: str):
    """Label rows ``train`` (< train_end) / ``embargo`` ([train_end,
    test_start)) / ``test`` (>= test_start) on a date/timestamp column.

    The embargo gap prevents look-ahead leakage through features computed
    over windows that would straddle the boundary (the purged/embargoed
    split of de Prado, *Advances in Financial ML* ch. 7 — standard
    hygiene for any time-ordered training set). Scan-side expression,
    zero shuffle; requires ``train_end <= test_start``.
    """
    if not (train_end <= test_start):
        raise ValueError(
            f"embargo window inverted: train_end {train_end!r} must be <= "
            f"test_start {test_start!r}"
        )

    def apply(df: DataFrame) -> DataFrame:
        c = F.col(date_col)
        return df.withColumn(
            "split",
            F.when(c < F.lit(train_end), F.lit("train"))
            .when(c < F.lit(test_start), F.lit("embargo"))
            .otherwise(F.lit("test")),
        )

    return apply


def temporal_split_census(
    df: DataFrame,
    date_col: str,
    entity_col: str,
    train_end: str,
    test_start: str,
) -> DataFrame:
    """Audit of a temporal split: per split ``(split, n_rows, n_entities,
    shared_train_entities)`` — the last column counts the split's entities
    that ALSO appear in train (0 for train itself). A non-zero test
    overlap is expected (the same customer exists across time) but must
    be KNOWN: entity-level memorization is the leakage an embargo cannot
    remove, and the census makes the reviewer decide instead of discover.

    Scale: one labeling scan + per-split aggregate; the overlap is a
    semi-join of two distinct-entity keysets (keys only shuffled).
    """
    labeled = (
        df.select(F.col(entity_col).alias("_e"), F.col(date_col).alias("_d"))
        .transform(temporal_split("_d", train_end, test_start))
        .localCheckpoint(eager=False)  # referenced three times below
    )
    per = labeled.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("_e").cast("long").alias("n_entities"),
    )
    train_e = labeled.filter(F.col("split") == "train").select("_e").distinct()
    shared = (
        labeled.filter(F.col("split") != "train")
        .select("split", "_e")
        .distinct()
        .join(train_e, "_e", "left_semi")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("_shared"))
    )
    return (
        per.join(shared, "split", "left")
        .select(
            "split",
            "n_rows",
            "n_entities",
            F.coalesce("_shared", F.lit(0)).cast("long").alias(
                "shared_train_entities"
            ),
        )
    )


def temporal_split_census_sql(
    table_expr: str, date_expr: str, entity_expr: str,
    train_end: str, test_start: str,
) -> str:
    """DuckDB rendering of :func:`temporal_split_census`."""
    return f"""
WITH labeled AS (
  SELECT {entity_expr} AS e,
         CASE WHEN {date_expr} < '{train_end}' THEN 'train'
              WHEN {date_expr} < '{test_start}' THEN 'embargo'
              ELSE 'test' END AS split
  FROM {table_expr}
),
per AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT e) AS BIGINT) AS n_entities
  FROM labeled GROUP BY split
),
train_e AS (SELECT DISTINCT e FROM labeled WHERE split = 'train'),
shared AS (
  SELECT split, CAST(count(*) AS BIGINT) AS shared
  FROM (SELECT DISTINCT split, e FROM labeled WHERE split != 'train') s
  WHERE EXISTS (SELECT 1 FROM train_e t WHERE t.e = s.e)
  GROUP BY split
)
SELECT per.split AS split, n_rows, n_entities,
       CAST(coalesce(shared.shared, 0) AS BIGINT) AS shared_train_entities
FROM per LEFT JOIN shared ON per.split = shared.split
"""


# ---------------------------------------------------------------------------
# 17. Token co-occurrence PMI (collocation mining)
# ---------------------------------------------------------------------------

def token_pmi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Pointwise mutual information of token pairs by document
    co-occurrence (Church & Hanks, CL 1990 — the classic collocation
    signal)::

        (w1, w2, n_ab, n_a, n_b, pmi_micro)

    where ``pmi_micro = round(ln(n_ab·N / (n_a·n_b)) · 10⁶)`` computed as
    a FIXED sequence of single IEEE ops on exact integer counts (the
    ``bigram_lm_score`` float discipline — deterministic on any engine or
    partitioning). Presence-based: counts are documents containing the
    token(s), each pair ordered ``w1 < w2``.

    ``min_df`` drops rare tokens before pairing; ``max_df`` drops
    ubiquitous ones (stopword guard) — both applied to DOCUMENT
    frequency. Scale: the pair generator is a per-document self-join of
    the distinct-token frame — fan-out O(L²) per doc in the retained
    vocabulary, with the hot-token cap (``max_df``) bounding the
    worst-case token's posting list exactly like the n-gram Jaccard
    DF cap. N (total docs) attaches by constant-key broadcast.
    """
    toks = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.explode(F.array_distinct(_toks(text_col))).alias("w"),
        )
        .filter(F.col("w") != "")
        .localCheckpoint(eager=False)  # feeds df-counts AND the pair join
    )
    dfreq = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    dfreq = dfreq.filter(F.col("_df") >= min_df)
    if max_df is not None:
        dfreq = dfreq.filter(F.col("_df") <= max_df)
    kept = toks.join(dfreq, "w").select("_doc", "w", "_df")
    a = kept.select(
        "_doc", F.col("w").alias("w1"), F.col("_df").alias("n_a")
    )
    b = kept.select(
        "_doc", F.col("w").alias("w2"), F.col("_df").alias("n_b")
    )
    pairs = (
        a.join(b, "_doc")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    n_docs = df.select(F.col(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("_n_docs")
    ).withColumn("_one", one)
    return (
        pairs.withColumn("_one", one)
        .join(F.broadcast(n_docs), "_one")
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") * F.col("_n_docs").cast("double"))
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                )
                * F.lit(1000000.0)
            ).cast("long").alias("pmi_micro"),
        )
    )


def token_pmi_sql(
    table_expr: str,
    text_expr: str,
    id_expr: str,
    min_df: int = 2,
    max_df: int | None = None,
) -> str:
    """DuckDB rendering of :func:`token_pmi` (same counts, same single-op
    float sequence)."""
    cap = f"AND df <= {max_df}" if max_df is not None else ""
    return f"""
WITH toks AS (
  SELECT DISTINCT {id_expr} AS doc, w
  FROM (
    SELECT {id_expr}, unnest(string_split({text_expr}, ' ')) AS w
    FROM {table_expr}
  ) t({id_expr}, w)
  WHERE w != ''
),
dfreq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY w
),
kept AS (
  SELECT doc, toks.w, df FROM toks JOIN dfreq USING (w)
  WHERE df >= {min_df} {cap}
),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, a.df AS n_a, b.df AS n_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM kept a JOIN kept b ON a.doc = b.doc AND a.w < b.w
  GROUP BY 1, 2, 3, 4
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM {table_expr})
SELECT w1, w2, n_ab, n_a, n_b,
       CAST(round(ln((CAST(n_ab AS DOUBLE) * CAST(n_docs AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS pmi_micro
FROM pairs, nd
"""


# ---------------------------------------------------------------------------
# 18. Largest-remainder budget allocation (training-mix apportionment)
# ---------------------------------------------------------------------------

def largest_remainder_allocation(
    df: DataFrame, key_col: str, weight_col: str, budget: int
) -> DataFrame:
    """Apportion an integer token/sample ``budget`` across groups
    proportionally to their integer weights, by the Hare–Niemeyer
    largest-remainder method (the house-seat algorithm)::

        (key, weight, alloc)    with  Σ alloc == budget  exactly

    ``alloc_i = floor(budget·w_i / W)`` plus one extra unit for the
    ``budget − Σ floor`` groups with the LARGEST remainders
    (``(budget·w_i) mod W``; ties break to the smaller key — fully
    deterministic, pure integers). The mix-planning primitive that turns
    "sample sources at these ratios" into exact per-source counts that
    sum to the budget — naive independent rounding over- or under-shoots
    by up to n_groups/2.

    Scale: one weight aggregation over the data; everything after runs on
    the GROUP frame (bounded by source/domain count — the remainder rank
    window is over that tiny frame, never rows).
    """
    weights = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.sum(F.col(weight_col)).cast("long").alias("weight"))
        .localCheckpoint(eager=False)  # totals + quotas read it twice
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    tot = weights.agg(F.sum("weight").cast("long").alias("_W")).withColumn(
        "_one", one
    )
    quot = (
        weights.withColumn("_one", one)
        .join(F.broadcast(tot), "_one")
        .select(
            "key",
            "weight",
            F.expr(f"(weight * {budget}L) div _W").alias("_floor"),
            F.expr(f"pmod(weight * {budget}L, _W)").alias("_rem"),
        )
    )
    w = Window.orderBy(F.col("_rem").desc(), F.col("key").asc())  # group frame
    spare = quot.agg(
        (F.lit(budget) - F.sum("_floor")).cast("long").alias("_spare")
    ).withColumn("_one", one)
    return (
        quot.withColumn("_rk", F.row_number().over(w))
        .withColumn("_one", one)
        .join(F.broadcast(spare), "_one")
        .select(
            "key",
            "weight",
            (
                F.col("_floor")
                + (F.col("_rk") <= F.col("_spare")).cast("long")
            ).alias("alloc"),
        )
    )


def largest_remainder_allocation_sql(
    table_expr: str, key_expr: str, weight_expr: str, budget: int
) -> str:
    """DuckDB rendering of :func:`largest_remainder_allocation`."""
    return f"""
WITH weights AS (
  SELECT {key_expr} AS key, CAST(sum({weight_expr}) AS BIGINT) AS weight
  FROM {table_expr} GROUP BY 1
),
t AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM weights),
quot AS (
  SELECT key, weight,
         (weight * {budget}) // W AS fl,
         (weight * {budget}) % W AS rem
  FROM weights, t
),
sp AS (SELECT {budget} - CAST(sum(fl) AS BIGINT) AS spare FROM quot),
ranked AS (
  SELECT key, weight, fl,
         row_number() OVER (ORDER BY rem DESC, key ASC) AS rk
  FROM quot
)
SELECT key, weight,
       CAST(fl + (CASE WHEN rk <= sp.spare THEN 1 ELSE 0 END) AS BIGINT)
         AS alloc
FROM ranked, sp AS sp
"""


def kl_token_drift(
    df_p: DataFrame, df_q: DataFrame, text_col: str
) -> DataFrame:
    """KL divergence (micro-nats) between the unigram token distributions
    of two corpus slices — the language-model-facing drift monitor (TVD /
    W1 / KS watch bucketed numeric marginals; KL watches the TOKEN
    distribution the next training epoch will actually see)::

        (n_tokens_p, n_tokens_q, vocab, kl_micro)

    ``kl_micro = Σ_t round(p_t·ln(p_t/q_t)·10⁶)`` with add-one (Laplace)
    smoothing over the UNION vocabulary V — ``p_t=(c_P(t)+1)/(N_P+|V|)``,
    ``q_t=(c_Q(t)+1)/(N_Q+|V|)`` — so tokens private to either side stay
    finite. Terms are fixed single-IEEE-op sequences on exact integer
    counts, rounded to micro BEFORE the sum (the entropy/PMI float
    discipline).

    Scale: two map-side-combinable token counts, one full-outer equi-join
    on the token key, constant-key broadcast of the three scalar totals
    (N_P, N_Q, |V|). State is O(vocab), row-count independent.
    """
    return kl_from_token_counts(
        token_counts(df_p, text_col), token_counts(df_q, text_col)
    )


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Unigram count frame ``(token, c)`` — the exact-integer snapshot
    :func:`kl_from_token_counts` folds; also the state a streaming
    word-count maintains (``streaming.streaming_token_counts``), so a
    stream snapshot is BIT-IDENTICAL to this batch frame over the same
    rows and drift never rereads the corpus."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def kl_from_token_counts(counts_p: DataFrame, counts_q: DataFrame) -> DataFrame:
    """The counts-level core of :func:`kl_token_drift`: fold KL from two
    ``(token, c)`` frames (batch- or stream-snapshot-produced)."""
    joined = (
        counts_p.select(F.col("token").alias("_t"), F.col("c").alias("_cp"))
        .join(
            counts_q.select(F.col("token").alias("_t"), F.col("c").alias("_cq")),
            "_t",
            "full_outer",
        )
        .select(
            F.coalesce("_cp", F.lit(0)).cast("long").alias("_cp"),
            F.coalesce("_cq", F.lit(0)).cast("long").alias("_cq"),
        )
        .localCheckpoint(eager=False)  # totals + terms read it twice
    )
    tot = joined.groupBy().agg(
        F.sum("_cp").cast("long").alias("_np"),
        F.sum("_cq").cast("long").alias("_nq"),
        F.count(F.lit(1)).cast("long").alias("_v"),
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    j = joined.withColumn("_one", one).join(
        F.broadcast(tot.withColumn("_one", one)), "_one"
    )
    p = (F.col("_cp") + F.lit(1)).cast("double") / (
        F.col("_np") + F.col("_v")
    ).cast("double")
    q = (F.col("_cq") + F.lit(1)).cast("double") / (
        F.col("_nq") + F.col("_v")
    ).cast("double")
    term = F.round(p * F.log(p / q) * F.lit(1000000.0)).cast("long")
    return (
        j.withColumn("_term", term)
        .groupBy("_np", "_nq", "_v")
        .agg(F.sum("_term").cast("long").alias("kl_micro"))
        .select(
            F.col("_np").alias("n_tokens_p"),
            F.col("_nq").alias("n_tokens_q"),
            F.col("_v").alias("vocab"),
            "kl_micro",
        )
    )


def kl_token_drift_sql(p_table: str, q_table: str, text_expr: str) -> str:
    """DuckDB rendering of :func:`kl_token_drift` (same smoothing, same
    single-op float sequence, same per-term rounding)."""
    def counts(table: str, side: str) -> str:
        return (
            f"SELECT t.tok AS tok, CAST(count(*) AS BIGINT) AS c{side}"
            f" FROM {table}, unnest(string_split({text_expr}, ' ')) AS t(tok)"
            f" GROUP BY 1"
        )

    return f"""
WITH cp AS ({counts(p_table, 'p')}),
cq AS ({counts(q_table, 'q')}),
joined AS (
  SELECT CAST(coalesce(cp, 0) AS BIGINT) AS cp,
         CAST(coalesce(cq, 0) AS BIGINT) AS cq
  FROM cp FULL OUTER JOIN cq USING (tok)
),
tot AS (
  SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq,
         CAST(count(*) AS BIGINT) AS v
  FROM joined
),
terms AS (
  SELECT np, nq, v,
         CAST(round(((CAST(cp + 1 AS DOUBLE) / CAST(np + v AS DOUBLE))
              * ln((CAST(cp + 1 AS DOUBLE) / CAST(np + v AS DOUBLE))
                   / (CAST(cq + 1 AS DOUBLE) / CAST(nq + v AS DOUBLE))))
              * 1000000.0) AS BIGINT) AS term
  FROM joined CROSS JOIN tot
)
SELECT np AS n_tokens_p, nq AS n_tokens_q, v AS vocab,
       CAST(sum(term) AS BIGINT) AS kl_micro
FROM terms GROUP BY 1, 2, 3
"""


def phrase_match_census(
    df: DataFrame, id_col: str, text_col: str, phrases: list[tuple[str, str]]
) -> DataFrame:
    """Exact two-word PHRASE match census from positional postings — the
    retrieval primitive BM25's bag-of-words scoring cannot express
    ("sort merge" the phrase, not the two words anywhere)::

        (w1, w2, n_docs, n_hits)

    Builds the positional posting list (doc, position, token), keeps
    only tokens that can start/end a listed phrase (scan-side IN filter
    — the posting list never materializes for the rest of the
    vocabulary), and adjacency-joins on ``(doc, position+1)``.

    Scale: the position join is equi-keyed on (doc, position) over the
    pre-filtered postings (corpus frequency of the phrase words, not
    corpus size); the phrase list attaches by broadcast. A census per
    phrase is two map-side-combinable aggregates.
    """
    spark = df.sparkSession
    phr = F.broadcast(
        spark.createDataFrame(
            [(a, b) for a, b in phrases], schema="w1 string, w2 string"
        )
    )
    w1s = sorted({a for a, _ in phrases})
    w2s = sorted({b for _, b in phrases})
    pos = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_p", "_tok"),
    )
    t1 = pos.filter(F.col("_tok").isin(w1s)).select(
        F.col("_doc"), F.col("_p").alias("_p1"), F.col("_tok").alias("w1")
    )
    t2 = pos.filter(F.col("_tok").isin(w2s)).select(
        F.col("_doc"), F.col("_p").alias("_p2"), F.col("_tok").alias("w2")
    )
    hits = (
        t1.join(phr, "w1")
        .join(
            t2,
            (t1["_doc"] == t2["_doc"])
            & (F.col("_p2") == F.col("_p1") + 1)
            & (phr["w2"] == t2["w2"]),
        )
        .select("w1", t2["w2"].alias("w2"), t1["_doc"].alias("_doc"))
    )
    return hits.groupBy("w1", "w2").agg(
        F.countDistinct("_doc").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
    )


def phrase_match_census_sql(
    table_expr: str, id_expr: str, text_expr: str,
    phrases: list[tuple[str, str]],
) -> str:
    """DuckDB rendering of :func:`phrase_match_census` (same positional
    postings, same adjacency join)."""
    vals = ", ".join(f"('{a}', '{b}')" for a, b in phrases)
    w1s = ", ".join(f"'{a}'" for a, _ in phrases)
    w2s = ", ".join(f"'{b}'" for _, b in phrases)
    return f"""
WITH docs AS (
  SELECT {id_expr} AS doc, string_split({text_expr}, ' ') AS toks
  FROM {table_expr}
),
pos AS (
  SELECT doc, u.s['p'] AS p, u.s['tok'] AS tok
  FROM docs, unnest(list_transform(range(1, len(toks) + 1),
                                   i -> {{'p': i, 'tok': toks[i]}})) AS u(s)
),
phrases(w1, w2) AS (VALUES {vals}),
m AS (
  SELECT ph.w1, ph.w2, t1.doc
  FROM (SELECT * FROM pos WHERE tok IN ({w1s})) t1
  JOIN phrases ph ON t1.tok = ph.w1
  JOIN (SELECT * FROM pos WHERE tok IN ({w2s})) t2
    ON t2.doc = t1.doc AND t2.p = t1.p + 1 AND t2.tok = ph.w2
)
SELECT w1, w2, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_hits
FROM m GROUP BY 1, 2
"""


# --- Pareto frontier (multi-objective curation cut) ---------------------------


def pareto_frontier_2d(
    df: DataFrame, score_col: str, cost_col: str
) -> DataFrame:
    """2-D Pareto frontier of a (maximize score, minimize cost) corpus —
    the multi-objective curation cut (quality vs token budget: a doc is
    worth keeping only if nothing scores at least as high for at most
    its cost)::

        (score, frontier_cost, n_at_point, n_dominated_at_score)

    One frontier row per DISTINCT score value that survives: a score
    survives iff its minimum cost is strictly below every
    higher-scoring value's minimum cost (ties in score: only the
    min-cost rows are non-dominated; ``n_at_point`` counts rows AT the
    frontier point, ``n_dominated_at_score`` the same-score rows it
    dominates).

    Scale: ONE (score → min cost, counts) aggregation collapses the
    corpus to the distinct-score frame, and the running-min scan is a
    window over THAT frame — bounded by the score quantization (a
    quality score is ppm-grained: ≤ ~10⁶ rows) regardless of corpus
    size, the sketch-bucket bounded-frame contract.
    """
    src = df.select(
        F.col(score_col).cast("long").alias("score"),
        F.col(cost_col).cast("long").alias("_cost"),
    ).localCheckpoint(eager=False)  # per-score + at-point read it twice
    per_score = src.groupBy("score").agg(
        F.min("_cost").alias("_min_cost"),
        F.count(F.lit(1)).cast("long").alias("_n_rows"),
    )
    at_point = src.groupBy("score", "_cost").agg(
        F.count(F.lit(1)).cast("long").alias("_n_at_cost")
    )
    merged = (
        per_score.alias("_p")
        .join(
            at_point.alias("_a"),
            (F.col("_p.score") == F.col("_a.score"))
            & (F.col("_p._min_cost") == F.col("_a._cost")),
        )
        .select(
            F.col("_p.score").alias("score"),
            F.col("_p._min_cost").alias("_min_cost"),
            F.col("_a._n_at_cost").alias("_n_at_cost"),
            F.col("_p._n_rows").alias("_n_rows"),
        )
    )
    w = Window.orderBy(F.desc("score"))  # distinct-score frame — bounded
    run_min_above = F.min("_min_cost").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        merged.withColumn("_above", run_min_above)
        .filter(F.col("_above").isNull() | (F.col("_min_cost") < F.col("_above")))
        .select(
            "score",
            F.col("_min_cost").cast("long").alias("frontier_cost"),
            F.col("_n_at_cost").cast("long").alias("n_at_point"),
            (F.col("_n_rows") - F.col("_n_at_cost"))
            .cast("long")
            .alias("n_dominated_at_score"),
        )
    )


def pareto_frontier_2d_sql(
    table_expr: str, score_expr: str, cost_expr: str
) -> str:
    """DuckDB rendering of :func:`pareto_frontier_2d` — same grouped
    collapse, same strict running-min rule."""
    return f"""
WITH src AS (
  SELECT CAST({score_expr} AS BIGINT) AS score,
         CAST({cost_expr} AS BIGINT) AS cost
  FROM {table_expr}
),
per_score AS (
  SELECT score, CAST(min(cost) AS BIGINT) AS min_cost,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM src GROUP BY 1
),
at_point AS (
  SELECT score, cost, CAST(count(*) AS BIGINT) AS n_at_cost
  FROM src GROUP BY 1, 2
),
merged AS (
  SELECT p.score, p.min_cost, a.n_at_cost, p.n_rows,
         min(p.min_cost) OVER (ORDER BY p.score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS above
  FROM per_score p
  JOIN at_point a ON a.score = p.score AND a.cost = p.min_cost
)
SELECT score, CAST(min_cost AS BIGINT) AS frontier_cost,
       CAST(n_at_cost AS BIGINT) AS n_at_point,
       CAST(n_rows - n_at_cost AS BIGINT) AS n_dominated_at_score
FROM merged
WHERE above IS NULL OR min_cost < above
"""


# --- n-gram novelty vs a reference corpus --------------------------------------


def ngram_novelty_census(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str,
    id_col: str,
    w: int = 3,
    n_deciles: int = 10,
) -> DataFrame:
    """How much NEW information does an incoming corpus slice carry
    against the reference corpus? Per new doc, the fraction of its
    DISTINCT w-shingles absent from the reference's shingle vocabulary
    (``novelty_ppm``), folded to a decile census (the refresh-triage
    report: a slice whose mass sits in low deciles is re-crawl/dup
    noise; decontamination flags OVERLAP with eval sets, this scores
    FRESHNESS against what is already owned)::

        (novelty_decile, n_docs, total_shingles, novel_shingles)

    ``novelty_decile = novelty_ppm·n_deciles div (10⁶ + 1)`` (0..n-1;
    the +1 puts exactly-10⁶ in the top decile). Docs shorter than one
    shingle emit novelty 0 (nothing to claim).

    Scale: both sides collapse to DISTINCT md5-hashed shingle postings;
    the membership probe is ONE left join posting⋈ref-vocab on the
    uniform 60-bit key (ref vocab deduplicated — each shingle once, no
    fan-out), then a per-doc fold and the bounded decile census. No
    pair join anywhere.
    """
    from dwh_etl_ods_spark_jobs_spark import text as TX
    from dwh_etl_ods_spark_jobs_spark.dedup import shingles_of

    def posting(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias("_doc"),
                TX.tokens(F.col(text_col)).alias("_toks"),
            )
            .select("_doc", F.explode(shingles_of(F.col("_toks"), w)).alias("_sh"))
            .select("_doc", TX.md5_long(F.col("_sh")).alias("_h"))
            .distinct()
        )
    ref_vocab = posting(ref_docs).select("_h").distinct().withColumn(
        "_seen", F.lit(1)
    )
    scored = (
        posting(new_docs)
        .join(ref_vocab, "_h", "left")
        .groupBy("_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n_sh"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("_n_novel"),
        )
        .withColumn(
            "_nov_ppm",
            F.expr("CAST(_n_novel * 1000000 div _n_sh AS BIGINT)"),
        )
    )
    # docs with no shingle at all never reach the posting — count them
    # into decile 0 via a left join from the doc frame
    all_docs = new_docs.select(F.col(id_col).alias("_doc"))
    full = all_docs.join(scored, "_doc", "left").select(
        F.coalesce(F.col("_n_sh"), F.lit(0)).alias("_n_sh"),
        F.coalesce(F.col("_n_novel"), F.lit(0)).alias("_n_novel"),
        F.coalesce(F.col("_nov_ppm"), F.lit(0)).alias("_nov_ppm"),
    )
    return (
        full.groupBy(
            F.expr(
                f"CAST(_nov_ppm * {n_deciles} div 1000001 AS BIGINT)"
            ).alias("novelty_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_n_sh").cast("long").alias("total_shingles"),
            F.sum("_n_novel").cast("long").alias("novel_shingles"),
        )
    )


def ngram_novelty_census_sql(
    new_expr: str,
    ref_expr: str,
    text_expr: str,
    id_expr: str,
    w: int = 3,
    n_deciles: int = 10,
) -> str:
    """DuckDB rendering of :func:`ngram_novelty_census` — same hashed
    shingle domain, same decile formula."""
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    def posting(src: str) -> str:
        return f"""
  SELECT DISTINCT {id_expr} AS doc, {md5_long_sql('sh')} AS h
  FROM (
    SELECT {id_expr}, unnest({D.shingles_sql(text_expr, w)}) AS sh
    FROM {src}
  )"""

    return f"""
WITH newp AS ({posting(new_expr)}),
refv AS (SELECT DISTINCT h FROM ({posting(ref_expr)})),
scored AS (
  SELECT n.doc, CAST(count(*) AS BIGINT) AS n_sh,
         CAST(sum(CASE WHEN r.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM newp n LEFT JOIN refv r ON n.h = r.h
  GROUP BY 1
),
full_docs AS (
  SELECT coalesce(s.n_sh, 0) AS n_sh, coalesce(s.n_novel, 0) AS n_novel,
         coalesce(s.n_novel * 1000000 // s.n_sh, 0) AS nov_ppm
  FROM (SELECT {id_expr} AS doc FROM {new_expr}) d
  LEFT JOIN scored s ON s.doc = d.doc
)
SELECT CAST(nov_ppm * {n_deciles} // 1000001 AS BIGINT) AS novelty_decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_sh) AS BIGINT) AS total_shingles,
       CAST(sum(n_novel) AS BIGINT) AS novel_shingles
FROM full_docs
GROUP BY 1
"""


def density_ratio_weights(
    source: DataFrame,
    target: DataFrame,
    bin_col: str,
    w_max_ppm: int = 10_000_000,
) -> DataFrame:
    """Covariate-shift reweighting of a SOURCE corpus toward a TARGET
    distribution by binned density ratio — the importance-sampling
    primitive behind "make the crawl look like the curated mix"
    (Shimodaira 2000; the binned estimator is the classifier-free
    special case of density-ratio estimation)::

        (bin, n_source, n_target, weight_ppm, ess_ppm)

    Per bin ``w_b = (n_tgt_b / N_tgt) / (n_src_b / N_src)`` in integer
    ppm (one fixed IEEE sequence on exact counts, rounded per bin),
    CLIPPED at ``w_max_ppm`` (unclipped tails let a handful of rare-bin
    documents dominate the resampled corpus — the standard truncated
    importance weighting). Bins present only in TARGET are dropped
    (nothing in source to up-weight — the support-mismatch census is
    the caller's decontamination report); bins only in SOURCE get
    weight 0. ``ess_ppm`` = Kish effective-sample-size fraction
    ``(Σ n_b w_b)² / (N_src · Σ n_b w_b²)`` (same value on every row):
    how much of the source corpus SURVIVES the reweighting — the
    one-number health check (ppm; exact decimal products on the ppm
    weights, ONE final IEEE division).

    Scale: two grouped count passes + a bin-keyed join + constant-key
    broadcast totals; output is the bounded bin frame. No window.
    """
    src = source.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_source")
    )
    tgt = target.groupBy(F.col(bin_col).alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_target")
    )
    return density_ratio_from_counts(src, tgt, w_max_ppm)


def density_ratio_from_counts(
    src: DataFrame, tgt: DataFrame, w_max_ppm: int = 10_000_000
) -> DataFrame:
    """Weights + ESS from per-bin count grids ``(bin, n_source)`` /
    ``(bin, n_target)`` — the MERGEABLE-STATE form of
    :func:`density_ratio_weights` (which delegates here after its two
    groupBys). Both grids are plain integer counts on deterministic
    keys: exactly what streaming groupBys maintain and what shards
    merge by cell addition, so a live source stream can be reweighted
    against a FROZEN target mix from counters alone (pytest-pinned
    stream==batch)."""
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    j = (
        src.join(tgt, "bin", "left")
        .withColumn("n_target", F.coalesce(F.col("n_target"), F.lit(0)).cast("long"))
        .withColumn("_one", one)
    )
    totals = j.groupBy("_one").agg(
        F.sum("n_source").cast("long").alias("_ns"),
        F.sum("n_target").cast("long").alias("_nt"),
    )
    j = j.join(F.broadcast(totals), "_one")
    w_raw = F.round(
        (F.col("n_target").cast("double") * F.col("_ns").cast("double"))
        / (F.col("_nt").cast("double") * F.col("n_source").cast("double"))
        * F.lit(1000000.0)
    ).cast("long")
    binned = j.select(
        "bin",
        "n_source",
        "n_target",
        F.when(F.col("_nt") == 0, F.lit(None).cast("long"))
        .when(F.col("n_target") == 0, F.lit(0).cast("long"))
        .otherwise(F.least(w_raw, F.lit(int(w_max_ppm)).cast("long")))
        .alias("weight_ppm"),
        F.col("_ns"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ess = (
        binned.groupBy("_ns")
        .agg(
            F.sum(dec(F.col("n_source")) * dec(F.col("weight_ppm"))).alias("_sw"),
            F.sum(
                dec(F.col("n_source"))
                * dec(F.col("weight_ppm"))
                * dec(F.col("weight_ppm"))
            ).alias("_sww"),
        )
        .select(
            F.lit(0).alias("_k"),
            F.when(
                F.col("_sww").cast("double") > F.lit(0.0),
                F.round(
                    F.col("_sw").cast("double")
                    * F.col("_sw").cast("double")
                    / (F.col("_ns").cast("double") * F.col("_sww").cast("double"))
                    * F.lit(1000000.0)
                ).cast("long"),
            ).alias("ess_ppm"),
        )
    )
    return (
        binned.withColumn("_k", F.lit(0))
        .join(F.broadcast(ess), "_k")
        .select("bin", "n_source", "n_target", "weight_ppm", "ess_ppm")
    )


def density_ratio_weights_sql(
    source_table: str,
    target_table: str,
    bin_expr: str,
    w_max_ppm: int = 10_000_000,
) -> str:
    """DuckDB rendering of :func:`density_ratio_weights` — same per-bin
    rounded ppm weights, same exact HUGEINT ESS products."""
    return f"""
WITH src AS (
  SELECT {bin_expr} AS bin, CAST(count(*) AS BIGINT) AS n_source
  FROM {source_table} GROUP BY 1
),
tgt AS (
  SELECT {bin_expr} AS bin, CAST(count(*) AS BIGINT) AS n_target
  FROM {target_table} GROUP BY 1
),
j AS (
  SELECT s.bin, s.n_source, coalesce(t.n_target, 0) AS n_target
  FROM src s LEFT JOIN tgt t ON s.bin = t.bin
),
tot AS (
  SELECT CAST(sum(n_source) AS BIGINT) AS ns,
         CAST(sum(n_target) AS BIGINT) AS nt FROM j
),
binned AS (
  SELECT bin, n_source, n_target,
         CASE WHEN nt = 0 THEN NULL
              WHEN n_target = 0 THEN 0
              ELSE least(CAST(round(CAST(n_target AS DOUBLE) * CAST(ns AS DOUBLE)
                              / (CAST(nt AS DOUBLE) * CAST(n_source AS DOUBLE))
                              * 1000000.0) AS BIGINT),
                         CAST({int(w_max_ppm)} AS BIGINT)) END AS weight_ppm,
         ns
  FROM j, tot
),
ess AS (
  SELECT CASE WHEN CAST(sum(CAST(n_source AS HUGEINT) * weight_ppm * weight_ppm)
                    AS DOUBLE) > 0.0 THEN
    CAST(round(CAST(sum(CAST(n_source AS HUGEINT) * weight_ppm) AS DOUBLE)
               * CAST(sum(CAST(n_source AS HUGEINT) * weight_ppm) AS DOUBLE)
               / (CAST(max(ns) AS DOUBLE)
                  * CAST(sum(CAST(n_source AS HUGEINT) * weight_ppm * weight_ppm)
                         AS DOUBLE))
               * 1000000.0) AS BIGINT) END AS ess_ppm
  FROM binned
)
SELECT bin, n_source, n_target, weight_ppm, ess_ppm
FROM binned, ess
"""


def vocab_richness(df: DataFrame, text_col: str) -> DataFrame:
    """Vocabulary-richness / unseen-mass estimate of a corpus — "how
    much vocabulary have we NOT crawled yet", the coverage question a
    corpus-growth decision asks before buying more data. One row::

        (n_tokens, vocab_size, f1, f2, chao1_est, unseen_mass_ppm)

    ``f1``/``f2`` = tokens seen exactly once/twice (the
    frequency-of-frequencies tail). ``chao1_est`` = Chao1 lower-bound
    richness ``V + f1²/(2·f2)`` (Chao 1984) — how many types the corpus
    plus its unseen tail holds at minimum; ``f2 = 0`` → explicit NULL
    (the bias-corrected variant is a caller choice, documented out).
    ``unseen_mass_ppm`` = Good-Turing missing mass ``f1/N`` (Good 1953)
    in EXACT integer ppm (``f1·10⁶ div N``) — the probability the next
    token drawn is a brand-new type. Chao1 rounds ONE IEEE division on
    exact integer counts.

    Scale: rides :func:`token_counts` (one explode + count shuffle);
    the frequency-of-frequencies fold and the final row are bounded.
    """
    return vocab_richness_from_counts(token_counts(df, text_col))


def vocab_richness_from_counts(counts: DataFrame) -> DataFrame:
    """Richness estimates from a ``(token, c)`` unigram count grid —
    the MERGEABLE-STATE form of :func:`vocab_richness` (which delegates
    here). The grid is exactly what ``streaming.streaming_token_counts``
    maintains for KL drift — so ONE maintained vocabulary state answers
    both "is the mix drifting" and "how much vocabulary is unseen"
    (pytest-pinned stream==batch)."""
    fof = counts.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("_v")
    )
    agg = fof.agg(
        F.sum(F.col("c") * F.col("_v")).cast("long").alias("n_tokens"),
        F.sum("_v").cast("long").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, F.col("_v")).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("_v")).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    return agg.select(
        "n_tokens",
        "vocab_size",
        "f1",
        "f2",
        F.when(
            F.col("f2") > 0,
            F.col("vocab_size")
            + F.round(
                F.col("f1").cast("double")
                * F.col("f1").cast("double")
                / (F.lit(2.0) * F.col("f2").cast("double"))
            ).cast("long"),
        ).alias("chao1_est"),
        F.expr("f1 * 1000000L div n_tokens").alias("unseen_mass_ppm"),
    )


def vocab_richness_sql(table_expr: str, text_expr: str) -> str:
    """DuckDB rendering of :func:`vocab_richness` — same count grids,
    same single rounded division, same integer ppm mass."""
    return f"""
WITH counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split({text_expr}, ' ')) AS token
        FROM {table_expr})
  GROUP BY token
),
fof AS (
  SELECT c, CAST(count(*) AS BIGINT) AS v FROM counts GROUP BY c
),
agg AS (
  SELECT CAST(sum(c * v) AS BIGINT) AS n_tokens,
         CAST(sum(v) AS BIGINT) AS vocab_size,
         CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS f2
  FROM fof
)
SELECT n_tokens, vocab_size, f1, f2,
       CASE WHEN f2 > 0 THEN
         vocab_size + CAST(round(CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
                                 / (2.0 * CAST(f2 AS DOUBLE))) AS BIGINT)
       END AS chao1_est,
       CAST(f1 * 1000000 // n_tokens AS BIGINT) AS unseen_mass_ppm
FROM agg
"""
