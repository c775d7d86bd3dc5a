"""Corpus-curation queries (repetition, decontamination, mixing, sharding,
leakage) with DuckDB oracles.

Extends the LLM-data-pipeline suite (plans/pipeline.py) with the
corpus-level curation stages: each query runs a ``curation/`` operator
over the documents table (or a synthesized variant corpus — identical CTE
in both engines, the established pattern) and is paired with an oracle
generated from the SAME constants, so values hash-match bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import curation as C
from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

DECON_N = 5          # word n-gram width (GPT-3 used 13; synthetic docs are short)
MIX_WEIGHTS = {"en": 0.3, "zh": 0.8}   # down-weight dominant langs
MIX_DEFAULT = 1.0
SHARD_TOKENS = 2000  # token budget per training shard
SHARD_CHUNK = 64     # prefix-sum chunk width (small so sf0.01 exercises >1 chunk)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _ngram_list_sql(n: int) -> str:
    """DuckDB word-n-gram list over ``ts`` (1-based list indexing);
    ``range(len-n+1)`` is empty when the doc is shorter than ``n`` —
    mirroring the Spark-side guard in curation._word_ngrams."""
    parts = " || ' ' || ".join(f"ts[i+{j + 1}]" for j in range(n))
    return f"list_transform(range(len(ts) - {n - 1}), i -> {parts})"


# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------

def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).transform(C.repetition_signals("doc_id", "text"))


SQL_REPETITION = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
base AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
         1.0 - (CAST(len(list_distinct(ts)) AS DOUBLE)
                / CAST(len(ts) AS DOUBLE)) AS dup_word_frac
  FROM toks
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(len(ts) - 1),
                               i -> ts[i+1] || ' ' || ts[i+2])) AS bgram
  FROM toks
),
bgc AS (SELECT doc_id, bgram, count(*) AS cnt FROM bg GROUP BY 1, 2),
top AS (
  SELECT doc_id,
         CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_bigram_frac
  FROM bgc GROUP BY 1
)
SELECT b.doc_id, b.n_tok, b.dup_word_frac,
       coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac
FROM base b LEFT JOIN top t USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (word n-gram overlap)
# ---------------------------------------------------------------------------
# Benchmark = every 20th doc; corpus = the rest PLUS a verbatim copy of each
# benchmark doc under a shifted id (guaranteed contamination at every SF,
# same construction both engines). Natural n-gram collisions between
# unrelated docs also count — deterministically in both engines.

def _decon_frames(spark: SparkSession, sf_dir: str):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0).unionByName(
        bench.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return corpus, bench


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, bench = _decon_frames(spark, sf_dir)
    return corpus.transform(
        C.ngram_decontaminate(bench, "doc_id", "text", n=DECON_N)
    )


SQL_DECONTAMINATE = f"""
WITH bench_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM bench_docs
),
cgrams AS (
  SELECT DISTINCT doc_id, {md5_long_sql('g')} AS gh
  FROM (SELECT doc_id, unnest({_ngram_list_sql(DECON_N)}) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM corpus))
),
bgrams AS (
  SELECT DISTINCT {md5_long_sql('g')} AS gh
  FROM (SELECT unnest({_ngram_list_sql(DECON_N)}) AS g
        FROM (SELECT string_split(text, ' ') AS ts FROM bench_docs))
),
totals AS (SELECT doc_id, count(*) AS total_ngrams FROM cgrams GROUP BY 1),
overlap AS (
  SELECT c.doc_id, count(*) AS overlap_ngrams
  FROM cgrams c JOIN bgrams b USING (gh)
  GROUP BY 1 HAVING count(*) >= 1
)
SELECT o.doc_id, o.overlap_ngrams, t.total_ngrams,
       CAST(o.overlap_ngrams AS DOUBLE) / CAST(t.total_ngrams AS DOUBLE)
         AS overlap_frac
FROM overlap o JOIN totals t USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Deterministic weighted sampling mix
# ---------------------------------------------------------------------------

def q_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .transform(
            C.weighted_sample("doc_id", "lang", MIX_WEIGHTS, MIX_DEFAULT)
        )
        .select("doc_id", "lang", "source")
    )


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN '{C.weight_threshold_hex(w)}'"
        for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"CASE lang {arms} ELSE '{C.weight_threshold_hex(MIX_DEFAULT)}' END"


SQL_SAMPLE_MIX = f"""
SELECT doc_id, lang, source FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_mix_case_sql()}
"""


# ---------------------------------------------------------------------------
# Token-budget shard packing (distributed prefix sum)
# ---------------------------------------------------------------------------

def q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).transform(
        C.pack_token_shards(
            "doc_id",
            F.size(F.split(F.col("text"), " ")),
            SHARD_TOKENS,
            chunk=SHARD_CHUNK,
        )
    )


SQL_SHARD_PACK = f"""
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
cum AS (
  SELECT doc_id, n_tok,
         CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_offset
  FROM toks
)
SELECT doc_id, n_tok, start_offset,
       CAST(floor(start_offset / {SHARD_TOKENS}.0) AS BIGINT) AS shard
FROM cum
"""


# ---------------------------------------------------------------------------
# Cross-source exact-duplicate leakage census
# ---------------------------------------------------------------------------
# The raw table has no cross-source dups; mirror every 9th doc into a
# synthetic 'mirror' source — identical CTE both engines.

def q_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    mirrored = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        "text",
        F.lit("mirror").alias("source"),
    )
    return docs.unionByName(mirrored).transform(
        C.cross_source_leakage("doc_id", "text", "source")
    )


SQL_LEAKAGE = """
WITH leakcorp AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, text, 'mirror' AS source
  FROM documents WHERE doc_id % 9 = 0
)
SELECT md5(text) AS fp,
       count(DISTINCT source) AS n_sources,
       count(*) AS n_docs,
       min(doc_id) AS first_doc_id
FROM leakcorp
GROUP BY 1
HAVING count(DISTINCT source) >= 2
"""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): embedding near-dup clusters -> one
# survivor per cluster
# ---------------------------------------------------------------------------
# Composes two proven primitives: hyperplane-LSH embedding near-dup pairs
# (cos >= threshold, bucket equi-join only) and iterative min-label
# connected components. Output is the cluster census: canonical survivor,
# cluster size, docs dropped. The oracle expresses the same fixpoint as a
# recursive CTE over the identical pair SQL.

SEMANTIC_COS = 0.95


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import EMB_DIM, _emb_corpus

    emb = _emb_corpus(spark, sf_dir)
    pairs = D.embedding_neardup_pairs(
        emb, "v", "vec_id", threshold=SEMANTIC_COS, dim=EMB_DIM
    )
    labels = D.connected_components(
        pairs, emb.select(F.col("vec_id").alias("id"))
    )
    return labels.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
    )


def _sql_semantic_dedup() -> str:
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import EMB_CTE, EMB_DIM

    planes = D.hyperplanes(EMB_DIM, D.HYPERPLANES)
    sig = D.hyperplane_signature_sql("v", planes)
    cos = D.cosine_sql("a.v", "b.v", EMB_DIM)
    return f"""
WITH RECURSIVE {EMB_CTE},
sigs AS (SELECT vec_id, v, {sig} AS bucket FROM emb),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b USING (bucket)
  WHERE a.vec_id < b.vec_id AND round({cos}, 6) >= {SEMANTIC_COS}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
walk(node, label) AS (
  SELECT vec_id, vec_id FROM emb
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON w.node = e.src
),
labels AS (SELECT node, min(label) AS canonical_id FROM walk GROUP BY node)
SELECT canonical_id, count(*) AS cluster_size,
       count(*) - 1 AS n_dropped
FROM labels GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Duplicated-substring census (rolling-hash ExactSubstr analogue)
# ---------------------------------------------------------------------------
# The raw corpus has few natural W-token repeats, so mirror every 15th doc
# under a shifted id (identical CTE both engines) — every window of a
# mirrored doc is then duplicated by construction, plus whatever natural
# repeats exist corpus-wide.

SPAN_W = 8           # duplicated-window width in tokens (Lee et al. used 50)


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 15 == 0).select(
            (F.col("doc_id") + 700000).alias("doc_id"), "text"
        )
    )
    return corpus.transform(
        C.exact_substring_spans("doc_id", "text", width=SPAN_W)
    )


def _span_gram_sql(w: int) -> str:
    return " || ' ' || ".join(f"ts[pos+{j + 1}]" for j in range(w))


SQL_SUBSTRING_SPANS = f"""
WITH spancorp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 700000 AS doc_id, text FROM documents WHERE doc_id % 15 = 0
),
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM spancorp),
wins AS (
  SELECT doc_id, pos, {md5_long_sql(_span_gram_sql(SPAN_W))} AS w
  FROM (SELECT doc_id, ts, unnest(range(len(ts) - {SPAN_W - 1})) AS pos
        FROM toks)
),
dup AS (SELECT w FROM wins GROUP BY 1 HAVING count(*) >= 2),
dp AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM wins JOIN dup USING (w)
),
cov AS (
  SELECT doc_id, count(*) AS n_dup_windows,
         CAST(sum(CASE WHEN prev IS NULL THEN {SPAN_W}
                       ELSE least({SPAN_W}, pos - prev) END) AS BIGINT)
           AS dup_tokens
  FROM dp GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.ts) AS BIGINT) AS n_tok,
       CAST(greatest(len(t.ts) - {SPAN_W - 1}, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / CAST(len(t.ts) AS DOUBLE)
         AS dup_token_frac
FROM toks t LEFT JOIN cov c USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Hashing-trick linear quality classifier (fastText-style scoring)
# ---------------------------------------------------------------------------
# Deterministic stand-in weight vector (a trained model would be loaded
# from artifact storage); integer micros so the per-doc fold is exact
# BIGINT in both engines. The formula spreads positive and negative
# weights across the 64 buckets.

CLF_BUCKETS = 64
CLF_WEIGHTS_MICRO = [
    ((j * 37 + 11) % 101 - 50) * 10_000 for j in range(CLF_BUCKETS)
]
CLF_BIAS_MICRO = 25_000      # +0.025 prior toward keep
CLF_THRESHOLD = 0.0


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).transform(
        C.hash_feature_score(
            "doc_id", "text", CLF_WEIGHTS_MICRO, CLF_BIAS_MICRO, CLF_THRESHOLD
        )
    )


def _clf_sql() -> str:
    warr = "[" + ", ".join(str(w) for w in CLF_WEIGHTS_MICRO) + "]"
    bucket = f"CAST({md5_long_sql('t')} % {CLF_BUCKETS} AS INT) + 1"
    score = (
        f"CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE) / 1000000.0 "
        f"+ {CLF_BIAS_MICRO / 1e6!r}"
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
folded AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
         CAST(list_sum(list_transform(ts,
              t -> list_extract({warr}, {bucket}))) AS BIGINT) AS s
  FROM toks
)
SELECT doc_id, n_tok, {score} AS score,
       ({score}) >= {CLF_THRESHOLD!r} AS keep
FROM folded
"""


SQL_QUALITY_CLASSIFIER = _clf_sql()


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (two-phase distributed rank)
# ---------------------------------------------------------------------------

SHUFFLE_SEED = "epoch-1"


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).transform(
        C.epoch_shuffle("doc_id", SHUFFLE_SEED)
    )


SQL_EPOCH_SHUFFLE = f"""
SELECT doc_id,
       CAST(row_number() OVER (
              ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)),
                       doc_id) - 1 AS BIGINT) AS epoch_pos
FROM documents
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split assignment
# ---------------------------------------------------------------------------

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_assign_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .transform(C.assign_split("doc_id", SPLITS))
        .select("doc_id", "lang", "split")
    )


def _split_case_sql() -> str:
    items = list(SPLITS.items())
    cum, arms = 0.0, []
    for name, frac in items[:-1]:
        cum += frac
        arms.append(
            f"WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
            f"< '{C.weight_threshold_hex(cum)}' THEN '{name}'"
        )
    return "CASE " + " ".join(arms) + f" ELSE '{items[-1][0]}' END"


SQL_ASSIGN_SPLIT = f"""
SELECT doc_id, lang, {_split_case_sql()} AS split FROM documents
"""


# ---------------------------------------------------------------------------
# Corpus TF-IDF top terms
# ---------------------------------------------------------------------------

TFIDF_K = 5


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).transform(
        C.tfidf_top_terms("doc_id", "text", k=TFIDF_K)
    )


SQL_TFIDF = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
postings AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS t FROM toks) GROUP BY 1, 2
),
docfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         round(p.tf * ln(CAST(n.n AS DOUBLE) / CAST(d.df AS DOUBLE)), 6)
           AS score
  FROM postings p JOIN docfreq d USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT *, CAST(row_number() OVER (
              PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
  FROM scored)
WHERE rank <= {TFIDF_K}
"""


# ---------------------------------------------------------------------------
# Bigram LM score (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------

def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).transform(C.bigram_lm_score("doc_id", "text"))


SQL_BIGRAM_LM = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
occ AS (
  SELECT doc_id, bg, count(*) AS occ
  FROM (SELECT doc_id, unnest({_ngram_list_sql(2)}) AS bg FROM toks)
  GROUP BY 1, 2
),
bgc AS (SELECT bg, sum(occ) AS c12 FROM occ GROUP BY 1),
uni AS (
  SELECT t AS w1, count(*) AS c1
  FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1
),
v AS (SELECT count(*) AS v FROM uni),
model AS (
  SELECT b.bg,
         CAST(round(-ln(CAST(b.c12 + 1 AS DOUBLE)
                        / CAST(u.c1 + v.v AS DOUBLE)) * 1000000.0)
              AS BIGINT) AS nlp
  FROM (SELECT bg, c12, split_part(bg, ' ', 1) AS w1 FROM bgc) b
  JOIN uni u USING (w1) CROSS JOIN v
),
scored AS (
  SELECT o.doc_id, CAST(sum(o.occ) AS BIGINT) AS n_bigrams,
         sum(o.occ * m.nlp) AS s
  FROM occ o JOIN model m USING (bg) GROUP BY 1
)
SELECT t.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(round(CAST(s.s AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
                      / 1000000.0, 6), 0.0) AS avg_neg_logprob
FROM toks t LEFT JOIN scored s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Boilerplate-paragraph removal (C4-style corpus-frequency line dedup)
# ---------------------------------------------------------------------------
# Inject a fixed 10-token promo paragraph onto every 3rd doc (identical
# CTE both engines): at any SF its document frequency far exceeds the cap,
# so it is dropped and the doc's remaining (shifted) paragraphs survive.

PARA_TOKENS = 10
BOILER_MAX_DF = 5
PROMO = "promo sale click here now buy cheap deals online today"
assert len(PROMO.split(" ")) == PARA_TOKENS


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit(PROMO + " "), F.col("text"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return docs.transform(
        C.drop_boilerplate_paragraphs(
            "doc_id", "text", para_tokens=PARA_TOKENS, max_df=BOILER_MAX_DF
        )
    )


SQL_BOILERPLATE = f"""
WITH bcorp AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '{PROMO} ' || text ELSE text END AS text
  FROM documents
),
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM bcorp),
paras AS (
  SELECT doc_id, pos,
         array_to_string(ts[pos*{PARA_TOKENS}+1 : (pos+1)*{PARA_TOKENS}], ' ')
           AS para
  FROM (SELECT doc_id, ts,
               unnest(range(CAST(ceil(len(ts) / {PARA_TOKENS}.0) AS BIGINT)))
                 AS pos
        FROM toks)
),
freq AS (SELECT md5(para) AS h, count(*) AS df FROM paras GROUP BY 1),
kept AS (
  SELECT p.doc_id, string_agg(p.para, ' ' ORDER BY p.pos) AS clean_text,
         count(*) AS n_kept
  FROM paras p JOIN freq f ON md5(p.para) = f.h
  WHERE f.df <= {BOILER_MAX_DF}
  GROUP BY 1
),
stats AS (
  SELECT doc_id, CAST(ceil(len(ts) / {PARA_TOKENS}.0) AS BIGINT) AS n_paras
  FROM toks
)
SELECT s.doc_id, s.n_paras,
       CAST(s.n_paras - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped,
       coalesce(k.clean_text, '') AS clean_text
FROM stats s LEFT JOIN kept k USING (doc_id)
"""


# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

BM25_TERMS = ["spark", "vector", "stream"]
BM25_TOPK = 10


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).transform(
        C.bm25_topk("doc_id", "text", BM25_TERMS, k=BM25_TOPK)
    )


def _sql_bm25(k: int = BM25_TOPK, terms: list[str] | None = None) -> str:
    """DuckDB BM25 rendering; ``k`` is the candidate depth (LIMIT) so
    composing queries (hybrid rerank) can thread their own depth instead
    of relying on the module constant (VERDICT r8 #6); ``terms``
    overrides the query-term set (defaults to BM25_TERMS) so eval
    queries (staged_r12 NDCG) can render multiple query arms."""
    k1, b = C.BM25_K1, C.BM25_B
    arms = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, dl, '{t}' AS term,"
        f" CAST(len(list_filter(ts, x -> x = '{t}')) AS BIGINT) AS tf FROM base"
        for t in (BM25_TERMS if terms is None else terms)
    )
    idf = (
        "ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)"
        " / (CAST(df AS DOUBLE) + 0.5))"
    )
    dl_norm = "CAST(dl AS DOUBLE) * 1000000.0 / CAST(avgdl_micro AS DOUBLE)"
    part = (
        f"{idf} * ((CAST(tf AS DOUBLE) * {k1 + 1.0!r})"
        f" / (CAST(tf AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r} * ({dl_norm}))))"
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
base AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS dl FROM toks),
postings_raw AS (
{arms}
),
postings AS (SELECT * FROM postings_raw WHERE tf > 0),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(round(CAST(sum(dl) AS DOUBLE) * 1000000.0
                    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avgdl_micro
  FROM base
),
scored AS (
  SELECT doc_id, count(*) AS n_terms_hit,
         CAST(sum(CAST(round(({part}) * 1000000.0) AS BIGINT))
              AS BIGINT) AS bm25_micro
  FROM postings JOIN dfreq USING (term) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, n_terms_hit, bm25_micro
FROM scored ORDER BY bm25_micro DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Composed corpus-prep pipeline: quality gate -> split -> train shards
# ---------------------------------------------------------------------------

def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-prep DAG end-to-end as ONE Spark plan: classifier
    quality gate → deterministic split assignment → token-budget shard
    packing of the train split → per-shard rollup. Each stage is the
    already-oracle-gated operator; composing them exercises what a real
    pipeline runs — Catalyst fuses the scan-side stages (classifier fold,
    split hash) into the first pass over the corpus."""
    docs = _docs(spark, sf_dir)
    kept = (
        docs.transform(
            C.hash_feature_score(
                "doc_id", "text", CLF_WEIGHTS_MICRO, CLF_BIAS_MICRO, CLF_THRESHOLD
            )
        )
        .filter(F.col("keep"))
        .select("doc_id", "n_tok")
    )
    train = (
        kept.transform(C.assign_split("doc_id", SPLITS))
        .filter(F.col("split") == "train")
    )
    packed = train.transform(
        C.pack_token_shards("doc_id", F.col("n_tok"), SHARD_TOKENS, chunk=SHARD_CHUNK)
    )
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("shard_tokens"),
    )


def _sql_corpus_prep() -> str:
    warr = "[" + ", ".join(str(w) for w in CLF_WEIGHTS_MICRO) + "]"
    bucket = f"CAST({md5_long_sql('t')} % {CLF_BUCKETS} AS INT) + 1"
    score = (
        f"CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE) / 1000000.0 "
        f"+ {CLF_BIAS_MICRO / 1e6!r}"
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
folded AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
         CAST(list_sum(list_transform(ts,
              t -> list_extract({warr}, {bucket}))) AS BIGINT) AS s
  FROM toks
),
kept AS (SELECT doc_id, n_tok FROM folded WHERE ({score}) >= {CLF_THRESHOLD!r}),
train AS (
  SELECT doc_id, n_tok FROM kept
  WHERE ({_split_case_sql()}) = 'train'
),
cum AS (
  SELECT doc_id, n_tok,
         CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_offset
  FROM train
)
SELECT CAST(floor(start_offset / {SHARD_TOKENS}.0) AS BIGINT) AS shard,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS shard_tokens
FROM cum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Semantic decontamination (embedding near-match against a benchmark set)
# ---------------------------------------------------------------------------

DECON_COS = 0.95
# The benchmark set: half the perturbed near-copies (ids >= 100000, even
# tens) — chosen so contaminated pairs STRADDLE the bench/train split
# (a mod-k class of the raw id would be congruent across the +100000
# perturbation offset and never produce a cross-set pair).


def q_semantic_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination (the semantic sibling of the
    n-gram protocol): training vectors whose cosine to ANY benchmark
    vector ≥ threshold, via the bucketed near-dup pair generator — never
    a train×bench cross join. Output: per contaminated training vector,
    how many benchmark items it matches and the worst (max) cosine."""
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import EMB_DIM, _emb_corpus

    emb = _emb_corpus(spark, sf_dir)
    pairs = D.embedding_neardup_pairs(
        emb, "v", "vec_id", threshold=DECON_COS, dim=EMB_DIM
    )
    is_bench = lambda c: (c >= 100000) & (F.pmod(c, F.lit(20)) == 0)  # noqa: E731
    hits = pairs.select(
        F.when(is_bench(F.col("id_a")), F.col("id_b")).otherwise(F.col("id_a")).alias("train_id"),
        F.when(is_bench(F.col("id_a")), F.col("id_a")).otherwise(F.col("id_b")).alias("bench_id"),
        "cos",
    ).filter(is_bench(F.col("bench_id")) & ~is_bench(F.col("train_id")))
    return hits.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.max("cos").alias("max_cos"),
    )


def _sql_semantic_decon() -> str:
    from dwh_etl_ods_spark_jobs_spark import dedup as D
    from dwh_etl_ods_spark_jobs_spark.plans.pipeline import EMB_CTE, EMB_DIM

    planes = D.hyperplanes(EMB_DIM, D.HYPERPLANES)
    sig = D.hyperplane_signature_sql("v", planes)
    cos = D.cosine_sql("a.v", "b.v", EMB_DIM)
    return f"""
WITH {EMB_CTE},
sigs AS (SELECT vec_id, v, {sig} AS bucket FROM emb),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
  FROM sigs a JOIN sigs b USING (bucket)
  WHERE a.vec_id < b.vec_id AND round({cos}, 6) >= {DECON_COS}
),
hits AS (
  SELECT CASE WHEN id_a >= 100000 AND id_a % 20 = 0 THEN id_b ELSE id_a END AS train_id,
         CASE WHEN id_a >= 100000 AND id_a % 20 = 0 THEN id_a ELSE id_b END AS bench_id,
         cos
  FROM pairs
)
SELECT train_id, count(*) AS n_bench_hits, max(cos) AS max_cos
FROM hits
WHERE (bench_id >= 100000 AND bench_id % 20 = 0)
  AND NOT (train_id >= 100000 AND train_id % 20 = 0)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Temperature-based corpus mixture weights
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.7  # multilingual temperature-sampling exponent


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights ∝ n^α (temperature sampling — the
    standard up-weighting of small sources when mixing corpora). Each
    pow() is rounded to integer micro-units BEFORE the normalizing sum
    (exact BIGINT — cross-source sum order can never perturb weights);
    the scalar total attaches on a data-derived constant key."""
    counts = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "_p_micro",
            F.round(
                F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA))
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    total = counts.agg(F.sum("_p_micro").alias("_tot")).withColumn(
        "_one", F.pmod(F.hash("_tot"), F.lit(1))
    )
    return (
        counts.withColumn("_one", F.pmod(F.hash("_p_micro"), F.lit(1)))
        .join(F.broadcast(total), "_one")
        .select(
            "source",
            "n_docs",
            F.round(
                F.col("_p_micro").cast("double") / F.col("_tot").cast("double"), 6
            ).alias("mix_weight"),
        )
    )


SQL_MIX_TEMPERATURE = f"""
WITH counts AS (
  SELECT source, count(*) AS n_docs,
         CAST(round(pow(CAST(count(*) AS DOUBLE), {MIX_ALPHA!r}) * 1000000.0)
              AS BIGINT) AS p_micro
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(p_micro) AS BIGINT) AS t FROM counts)
SELECT source, n_docs,
       round(CAST(p_micro AS DOUBLE) / CAST(t AS DOUBLE), 6) AS mix_weight
FROM counts CROSS JOIN tot
"""


STRAT_K = 10  # exact sample size per source stratum


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly STRAT_K docs per source, picked by deterministic hash order
    (two-phase salted top-k — no single-partition-per-stratum window)."""
    return (
        _docs(spark, sf_dir)
        .transform(C.stratified_sample_exact("doc_id", "source", STRAT_K))
        .select("doc_id", "source", "lang", "n_chars")
    )


SQL_STRATIFIED_SAMPLE = C.stratified_sample_exact_sql(
    "documents", "doc_id", "source", STRAT_K, "doc_id, source, lang, n_chars"
)


QUERIES = {
    "stratified_sample_exact": q_stratified_sample,
    "decontaminate_ngram_overlap": q_decontaminate,
    "cross_source_leakage": q_leakage,
    "semantic_dedup_clusters": q_semantic_dedup,
    "substring_span_census": q_substring_spans,
    "epoch_shuffle_order": q_epoch_shuffle,
    "tfidf_top_terms": q_tfidf,
    "bigram_lm_logprob": q_bigram_lm,
    "boilerplate_para_removal": q_boilerplate,
    "semantic_decontaminate": q_semantic_decon,
    "mix_temperature_weights": q_mix_temperature,
    "corpus_prep_pipeline": q_corpus_prep,
}
ORACLES = {
    "stratified_sample_exact": SQL_STRATIFIED_SAMPLE,
    "decontaminate_ngram_overlap": SQL_DECONTAMINATE,
    "cross_source_leakage": SQL_LEAKAGE,
    "semantic_dedup_clusters": _sql_semantic_dedup(),
    "substring_span_census": SQL_SUBSTRING_SPANS,
    "epoch_shuffle_order": SQL_EPOCH_SHUFFLE,
    "tfidf_top_terms": SQL_TFIDF,
    "bigram_lm_logprob": SQL_BIGRAM_LM,
    "boilerplate_para_removal": SQL_BOILERPLATE,
    "semantic_decontaminate": _sql_semantic_decon(),
    "mix_temperature_weights": SQL_MIX_TEMPERATURE,
    "corpus_prep_pipeline": _sql_corpus_prep(),
}

# Battery consolidation (VERDICT r8 #2): composition-subsumed by
# corpus_prep_pipeline (classifier gate -> split -> shard pack run as one
# plan) and by mix_temperature_weights + stratified_sample_exact. Still
# oracle-verified at pytest level (tests/test_retired_surfaces.py).
RETIRED_QUERIES = {
    "quality_classifier_score": q_quality_classifier,  # ⊂ corpus_prep_pipeline stage 1
    "split_assignment": q_assign_split,                # ⊂ corpus_prep_pipeline stage 2
    "shard_pack_tokens": q_shard_pack,                 # ⊂ corpus_prep_pipeline stage 3
    "sample_mix_weighted": q_sample_mix,  # ⊂ mix_temperature_weights (weights) + stratified_sample_exact (exact-k draw)
    # r12 registration (staged_r12.py shortlist, VERDICT r11 #1):
    "bm25_topk_retrieval": q_bm25,  # ⊂ ndcg_bm25_eval (the eval RUNS bm25_topk as its run lists)
    "text_repetition_gopher": q_repetition,  # vs intra_doc_repetition: trigram dup-mass screen enters the battery; the word/bigram signals (explode physiology) stay gated here
}
RETIRED_ORACLES = {
    "quality_classifier_score": SQL_QUALITY_CLASSIFIER,
    "split_assignment": SQL_ASSIGN_SPLIT,
    "shard_pack_tokens": SQL_SHARD_PACK,
    "sample_mix_weighted": SQL_SAMPLE_MIX,
    "bm25_topk_retrieval": _sql_bm25(),
    "text_repetition_gopher": SQL_REPETITION,
}
