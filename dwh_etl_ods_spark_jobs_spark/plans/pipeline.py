"""Training-data-pipeline showcase queries (dedup / similarity / text /
multimodal) with DuckDB oracles.

These extend the reference's ETL surface (SURVEY.md §2.10: it has none of
these) with the operators a 100 TB LLM-data pipeline needs. Every query is
expression-only Spark (JVM codegen; the multimodal pair is deliberately
Arrow-batched ``mapInPandas``) and is paired with a DuckDB oracle generated
from the SAME constants (stopword lists, hash salt scheme, hyperplanes), so
values hash-match bit-for-bit.

Dedup queries run over a synthesized corpus CTE (originals + exact dups +
near-dup variants derived deterministically from doc_id arithmetic) so true
positives exist at every scale factor — same construction in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import dedup as D
from dwh_etl_ods_spark_jobs_spark import multimodal as M
from dwh_etl_ods_spark_jobs_spark import similarity as S
from dwh_etl_ods_spark_jobs_spark import text as T

EMB_DIM = 64
JACCARD_W = 5          # 5-token shingles: sparse enough that blocking only
                       # collides true near-dups even on a 30-word vocabulary
ANN_PLANES = 4         # 16 buckets -> meaningful approximate candidates


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# --- synthesized dedup corpus (identical CTE in both engines) ---

# The near-dup tail embeds the doc_id so no single shingle becomes hot
# (a shared constant tail would give one shingle document-frequency ~n/5,
# exploding the posting self-join to C(n/5, 2) pairs — synthetic skew the
# real corpus wouldn't have).
NEAR_TAIL = " near duplicate tail "

CORPUS_CTE = f"""corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         text || '{NEAR_TAIL}' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 5 = 0
)"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    exact = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    near = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(NEAR_TAIL), F.col("doc_id").cast("string")
            ).alias("text"),
        )
    )
    # The testdata parquet has ~3 row groups, capping scan parallelism at 3
    # of local[32]; the signature passes downstream are the expensive part,
    # so spread the (tiny) text payload across all cores first. On a real
    # cluster the scan has thousands of splits and this is a no-op-cost
    # insurance against few-large-files skew.
    return (
        docs.unionByName(exact)
        .unionByName(near)
        .repartition(spark.sparkContext.defaultParallelism)
    )


# --- embeddings corpus: originals + scaled (cosine-identical) variants ---

EMB_CTE = """emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01) AS v
  FROM embeddings WHERE vec_id % 10 = 0
)"""


def _emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _emb(spark, sf_dir)
    orig = base.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pert = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.01).alias("v"),
    )
    return orig.unionByName(pert)


# =========================== text analysis ===========================

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_ish_tokens"),
    )


SQL_TEXT_STATS = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len({T.tokens_sql('text')}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({T.tokens_sql('text')})) AS BIGINT) AS n_distinct_tokens,
       CAST({T.bpe_ish_token_count_sql('text')} AS BIGINT) AS bpe_ish_tokens
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    feats = T.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        *[c.alias(n) for n, c in feats.items()],
        T.quality_score(F.col("text")).alias("quality_score"),
    )


def _sql_text_quality() -> str:
    cols = T.quality_sql_columns("text")
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in cols.items())
    return (
        "SELECT doc_id,\n       "
        + sel
        + f",\n       {T.quality_score_sql('text')} AS quality_score\nFROM documents"
    )


SQL_TEXT_QUALITY = _sql_text_quality()


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.langid(F.col("text")).alias("predicted_lang"),
    )


SQL_TEXT_LANGID = f"""
SELECT doc_id, lang AS labeled_lang, {T.langid_sql('text')} AS predicted_lang
FROM documents
"""


def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency top-50 — the vocabulary profile a
    quality-filter tuning pass starts from. Explode → map-side-combinable
    groupBy → global top-k, which Spark executes as TakeOrderedAndProject
    (each partition ships only its local top 50, never the full counts)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )


SQL_TEXT_TOP_TOKENS = f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest({T.tokens_sql('text')}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 50
"""


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents with synthesized (deterministic) PII
    spans appended — emails, SSN-style ids, IPv4s, phones — so true
    positives exist at every scale factor; same construction both engines."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.lit(" Contact: user"), did.cast("string"),
        F.lit("@mail.example.com, tel +254 722 "),
        F.lpad((did % 1000000).cast("string"), 6, "0"),
        F.lit(", id "),
        F.lpad((did % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((did % 100).cast("string"), 2, "0"), F.lit("-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(", ip 10.0."), (did % 256).cast("string"), F.lit(".7"),
    )
    # Name the dirty and redacted intermediates so the flag compares columns
    # instead of repeating the 4-pattern regex chain a second time.
    return (
        docs.withColumn("__dirty", dirty)
        .withColumn("redacted", T.redact_pii(F.col("__dirty")))
        .select(
            "doc_id",
            "redacted",
            (F.col("redacted") != F.col("__dirty")).alias("was_redacted"),
        )
    )


_SQL_DIRTY_TEXT = (
    "text || ' Contact: user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com, tel +254 722 '"
    " || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')"
    " || ', id '"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ', ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)

SQL_TEXT_REDACT = f"""
WITH dirty AS (SELECT doc_id, {_SQL_DIRTY_TEXT} AS t FROM documents)
SELECT doc_id,
       {T.redact_pii_sql('t')} AS redacted,
       ({T.redact_pii_sql('t')} <> t) AS was_redacted
FROM dirty
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        T.exact_fingerprint(F.col("text")).alias("exact_fp"),
        T.content_fingerprint(F.col("text")).alias("content_fp"),
    )


SQL_TEXT_FINGERPRINT = f"""
SELECT doc_id,
       {T.exact_fingerprint_sql('text')} AS exact_fp,
       {T.content_fingerprint_sql('text')} AS content_fp
FROM documents
"""


# =========================== deduplication ===========================

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_corpus(spark, sf_dir), "text", "doc_id")


SQL_DEDUP_EXACT = f"""
WITH {CORPUS_CTE}
SELECT md5({T.normalize_text_sql('text')}) AS fingerprint,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM corpus GROUP BY 1
"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        _corpus(spark, sf_dir), "text", "doc_id", threshold=0.8, w=JACCARD_W
    )


SQL_DEDUP_JACCARD = f"""
WITH {CORPUS_CTE},
docs AS (
  SELECT doc_id, {D.shingles_sql('text', JACCARD_W)} AS sh FROM corpus
),
p0 AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
posting AS (SELECT doc_id, {T.md5_long_sql('shingle')} AS sh_h FROM p0),
sizes AS (SELECT doc_id, count(*) AS n FROM posting GROUP BY doc_id),
inter AS (
  SELECT p1.doc_id AS id_a, p2.doc_id AS id_b, count(*) AS c
  FROM posting p1 JOIN posting p2 USING (sh_h)
  WHERE p1.doc_id < p2.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(c / (a.n + b.n - c), 6) AS jaccard
  FROM inter JOIN sizes a ON inter.id_a = a.doc_id
             JOIN sizes b ON inter.id_b = b.doc_id
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.8
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        _corpus(spark, sf_dir), "text", "doc_id", threshold=0.5
    )


def _sql_dedup_minhash() -> str:
    comps = ", ".join(D._mh_comp_sql("bh", j) for j in range(D.MINHASH_K))
    band_structs = ", ".join(
        "{'band': %d, 'band_hash': md5(array_to_string("
        "list_transform(sig[%d:%d], x -> CAST(x AS VARCHAR)), ','))}"
        % (b, b * D.LSH_ROWS + 1, b * D.LSH_ROWS + D.LSH_ROWS)
        for b in range(D.LSH_BANDS)
    )
    return f"""
WITH {CORPUS_CTE},
sh_docs AS (SELECT doc_id, {D.minhash_base_sql('text')} AS bh FROM corpus),
docs AS (SELECT doc_id, [{comps}] AS sig FROM sh_docs),
banded AS (
  SELECT doc_id, unnest([{band_structs}], recursive := true) FROM docs
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM banded x JOIN banded y USING (band, band_hash)
  WHERE x.doc_id < y.doc_id
),
scored AS (
  SELECT id_a, id_b,
         round(len(list_filter(range(1, {D.MINHASH_K} + 1),
                               j -> a.sig[j] = b.sig[j])) / {float(D.MINHASH_K)}, 6)
           AS est_jaccard
  FROM cand JOIN docs a ON cand.id_a = a.doc_id
            JOIN docs b ON cand.id_b = b.doc_id
)
SELECT id_a, id_b, est_jaccard FROM scored WHERE est_jaccard >= 0.5
"""


SQL_DEDUP_MINHASH = _sql_dedup_minhash()


def q_dedup_simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_signatures(_corpus(spark, sf_dir), "text", "doc_id")


def _simhash_sig_ctes() -> str:
    toks = T.tokens_sql("text")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(D.SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END"
        for b in range(D.SIMHASH_BITS)
    )
    return f"""
WITH {CORPUS_CTE},
t1 AS (SELECT doc_id, unnest({toks}) AS tok FROM corpus),
tok AS (SELECT doc_id, {T.md5_long_sql('tok')} AS h FROM t1),
votes AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id),
sigs AS (SELECT doc_id, {sig} AS simhash FROM votes)
"""


SQL_DEDUP_SIMHASH_SIG = _simhash_sig_ctes() + "SELECT doc_id, simhash FROM sigs"


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.simhash_signatures(_corpus(spark, sf_dir), "text", "doc_id")
    return D.simhash_near_pairs(sigs, max_hamming=3)


def _sql_dedup_simhash_pairs() -> str:
    mask = (1 << D.SIMHASH_BAND_BITS) - 1
    band_structs = ", ".join(
        f"{{'band': {i}, 'bv': (simhash >> {i * D.SIMHASH_BAND_BITS}) & {mask}}}"
        for i in range(D.SIMHASH_BANDS)
    )
    return _simhash_sig_ctes() + f""",
banded AS (
  SELECT doc_id, simhash, unnest([{band_structs}], recursive := true) FROM sigs
),
pairs AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                  x.simhash AS sig_a, y.simhash AS sig_b
  FROM banded x JOIN banded y USING (band, bv)
  WHERE x.doc_id < y.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 3
"""


SQL_DEDUP_SIMHASH_PAIRS = _sql_dedup_simhash_pairs()


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_neardup_pairs(
        _emb_corpus(spark, sf_dir), "v", "vec_id", threshold=0.95, dim=EMB_DIM
    )


def _sql_dedup_embedding() -> str:
    planes = D.hyperplanes(EMB_DIM, D.HYPERPLANES)
    sig = D.hyperplane_signature_sql("v", planes)
    cos = D.cosine_sql("a.v", "b.v", EMB_DIM)
    return f"""
WITH {EMB_CTE},
sigs AS (SELECT vec_id, v, {sig} AS bucket FROM emb),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
  FROM sigs a JOIN sigs b USING (bucket)
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.95
"""


SQL_DEDUP_EMBEDDING = _sql_dedup_embedding()


def q_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> clusters -> canonical survivor per doc (iterative min-label
    propagation; the oracle expresses the same fixpoint as a recursive CTE)."""
    corpus = _corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.5)
    nodes = corpus.select(F.col("doc_id").alias("id"))
    return D.connected_components(pairs, nodes)


def _sql_dedup_cc() -> str:
    minhash_body = SQL_DEDUP_MINHASH.strip()
    return f"""
WITH pairs AS ({minhash_body}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
{CORPUS_CTE.replace('corpus AS (', 'corpus2 AS (', 1)},
walk(node, label) AS (
  SELECT doc_id, doc_id FROM corpus2
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON w.node = e.src
)
SELECT node AS id, min(label) AS canonical_id FROM walk GROUP BY node
"""


SQL_DEDUP_CC = (
    "WITH RECURSIVE " + _sql_dedup_cc().strip().removeprefix("WITH ")
)


def q_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A composed C4-style curation pass: language gate + quality gate +
    exact dedup survivor — the end-to-end shape of a training-data filter,
    built purely from the text operators."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "text",
        T.langid(F.col("text")).alias("pred_lang"),
        T.quality_score(F.col("text")).alias("q"),
        T.exact_fingerprint(F.col("text")).alias("fp"),
    )
    # NULL fingerprints (NULL text) cannot join in the oracle's equi-join
    # form, so exclude them here too — the window form would otherwise group
    # all NULLs as one key and keep a survivor the oracle drops.
    gated = scored.filter(
        (F.col("pred_lang") != "und") & (F.col("q") >= 0.3) & F.col("fp").isNotNull()
    )
    # Survivor = min doc_id per fingerprint, selected with a window over the
    # SAME frame rather than groupBy + join-back: the self-join form evaluates
    # the regex-heavy scoring chain once per join branch (nothing is cached),
    # which regressed 10x when exchange reuse stopped firing under Spark 4.x.
    # One shuffle on fp, single evaluation, identical rows.
    w = Window.partitionBy("fp")
    return (
        gated.withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .select("doc_id", "pred_lang", "q")
    )


SQL_FILTER_PIPELINE = f"""
WITH scored AS (
  SELECT doc_id,
         {T.langid_sql('text')} AS pred_lang,
         {T.quality_score_sql('text')} AS q,
         {T.exact_fingerprint_sql('text')} AS fp
  FROM documents
),
gated AS (SELECT * FROM scored WHERE pred_lang <> 'und' AND q >= 0.3),
survivors AS (SELECT fp, min(doc_id) AS doc_id FROM gated GROUP BY fp)
SELECT g.doc_id, g.pred_lang, g.q
FROM gated g JOIN survivors s ON g.fp = s.fp AND g.doc_id = s.doc_id
"""


# =========================== similarity search ===========================

def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.ann_bruteforce_topk(queries, emb, "vec_id", "v", k=5)


def _sql_ann_bruteforce() -> str:
    cos = D.cosine_sql("q.v", "c.v", EMB_DIM)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT * FROM emb WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS cos
  FROM q JOIN emb c ON q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= 5
"""


SQL_ANN_BRUTEFORCE = _sql_ann_bruteforce()


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.ann_lsh_topk(
        queries, emb, "vec_id", "v", k=5, dim=EMB_DIM, n_planes=ANN_PLANES
    )


def _sql_ann_lsh() -> str:
    planes = D.hyperplanes(EMB_DIM, ANN_PLANES)
    sig = D.hyperplane_signature_sql("v", planes)
    cos = D.cosine_sql("q.v", "c.v", EMB_DIM)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (SELECT vec_id, v, {sig} AS bucket FROM emb),
q AS (SELECT * FROM sigs WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS cos
  FROM q JOIN sigs c USING (bucket)
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= 5
"""


SQL_ANN_LSH = _sql_ann_lsh()


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH with the full Hamming-1 probe ball (hamming_probes = n_planes):
    each query searches its own bucket plus every bucket one bit-flip away —
    the recall control over the single-probe cliff."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.ann_lsh_topk(
        queries, emb, "vec_id", "v", k=5, dim=EMB_DIM,
        n_planes=ANN_PLANES, hamming_probes=ANN_PLANES,
    )


def _sql_ann_lsh_multiprobe() -> str:
    planes = D.hyperplanes(EMB_DIM, ANN_PLANES)
    sig = D.hyperplane_signature_sql("v", planes)
    cos = D.cosine_sql("q.v", "c.v", EMB_DIM)
    flips = ", ".join(f"xor(sig, {1 << j})" for j in range(ANN_PLANES))
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (SELECT vec_id, v, {sig} AS sig FROM emb),
cand AS (SELECT vec_id, v, sig AS bucket FROM sigs),
q AS (
  SELECT vec_id, v, unnest([sig, {flips}]) AS bucket
  FROM sigs WHERE vec_id % 100 = 0
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS cos
  FROM q JOIN cand c USING (bucket)
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= 5
"""


SQL_ANN_LSH_MULTIPROBE = _sql_ann_lsh_multiprobe()


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 200 == 0)
    return S.ann_ivf_topk(queries, emb, centroids, "vec_id", "v", k=5)


def _sql_ann_ivf() -> str:
    cos_vc = D.cosine_sql("v.v", "c.v", EMB_DIM)
    cos_qc = D.cosine_sql("q.v", "c.v", EMB_DIM)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id % 200 = 0),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT v.vec_id, v.v, c.cid AS cell,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {D.cosine_sql('v.v', 'c.cv', EMB_DIM)} DESC,
                                       c.cid ASC) AS rn
    FROM emb v CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v, cell FROM assigned WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({D.cosine_sql('q.v', 'c.v', EMB_DIM)}, 6) AS cos
  FROM q JOIN assigned c USING (cell)
  WHERE q.query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= 5
"""


SQL_ANN_IVF = _sql_ann_ivf()


def q_ann_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 — the recall control over the single-probe cliff:
    each query also searches its second-nearest cell."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 200 == 0)
    return S.ann_ivf_topk(queries, emb, centroids, "vec_id", "v", k=5, nprobe=2)


def _sql_ann_ivf_nprobe2() -> str:
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id % 200 = 0),
ranked_cells AS (
  SELECT v.vec_id, v.v, c.cid AS cell,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {D.cosine_sql('v.v', 'c.cv', EMB_DIM)} DESC,
                                     c.cid ASC) AS rn
  FROM emb v CROSS JOIN cent c
),
assigned AS (SELECT vec_id, v, cell FROM ranked_cells WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, v, cell
  FROM ranked_cells WHERE rn <= 2 AND vec_id % 100 = 0
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({D.cosine_sql('q.v', 'c.v', EMB_DIM)}, 6) AS cos
  FROM q JOIN assigned c USING (cell)
  WHERE q.query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= 5
"""


SQL_ANN_IVF_NPROBE2 = _sql_ann_ivf_nprobe2()


PQ_M = 4  # subspaces: 64-dim -> 4 x 16-dim codes


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN with asymmetric distance computation: the corpus
    is scanned as 4 centroid ids per vector, distances are integer table
    lookups (similarity.ann_pq_topk). Codebook = the same hash-sampled
    vectors the IVF query uses."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    codebook = emb.filter(F.col("vec_id") % 200 == 0)
    return S.ann_pq_topk(queries, emb, codebook, "vec_id", "v", dim=EMB_DIM, k=5, m_sub=PQ_M)


def _sql_ann_pq() -> str:
    width = EMB_DIM // PQ_M

    def pd_arms(left_alias: str, left_vec: str, out_id: str) -> str:
        return "\n  UNION ALL\n".join(
            f"  SELECT {left_alias}.{out_id}, c.cent_id, {s} AS sub,"
            f" CAST(round({S.l2sq_sub_sql(f'{left_alias}.{left_vec}', 'c.cbv', s * width, width)}"
            f" * 1000000.0) AS BIGINT) AS pd_micro"
            f" FROM {'emb' if left_alias == 'e' else 'q'} {left_alias} CROSS JOIN cb c"
            for s in range(PQ_M)
        )

    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cb AS (SELECT vec_id AS cent_id, v AS cbv FROM emb WHERE vec_id % 200 = 0),
enc_pd AS (
{pd_arms('e', 'v', 'vec_id')}
),
codes AS (
  SELECT vec_id, sub, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY pd_micro, cent_id) AS rn
    FROM enc_pd
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % 100 = 0),
tbl AS (
{pd_arms('q', 'qv', 'query_id')}
),
scored AS (
  SELECT t.query_id, cd.vec_id AS neighbor_id,
         CAST(sum(t.pd_micro) AS BIGINT) AS adc_micro
  FROM codes cd JOIN tbl t USING (sub, cent_id)
  WHERE t.query_id <> cd.vec_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, adc_micro
FROM ranked WHERE rank <= 5
"""


SQL_ANN_PQ = _sql_ann_pq()


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding store —
    the 4-8× footprint cut before ANN indexing; pure expression tree,
    no shuffle (scan-side).

    Gate contract: the driver's pandas canonicalizer cannot hash
    array-typed cells (CORRECTNESS_r06 `unhashable type: 'list'`), so the
    final projection serializes the code array to a CSV string in BOTH
    engines; the operator itself still returns array<int>.
    """
    out = S.quantize_embeddings(_emb(spark, sf_dir), "vec_id", "embedding")
    return out.select(
        "vec_id",
        "scale",
        F.array_join(F.col("q").cast("array<string>"), ",").alias("q_csv"),
    )


SQL_QUANTIZE_INT8 = f"""
SELECT vec_id, scale, array_to_string(q, ',') AS q_csv
FROM ({S.quantize_embeddings_sql("embeddings", "vec_id", "embedding")})
"""


# =========================== multimodal ===========================

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = M.attach_payload(_docs(spark, sf_dir), "text", "doc_id")
    return M.decode_image_meta(payloads)


# Oracle exploits payload == utf-8(text) and text being pure ASCII: byte
# arithmetic equals char arithmetic. The Spark side genuinely parses bytes
# in pandas — the oracle checks the decode contract, not the codec.
SQL_MULTIMODAL_META = """
SELECT doc_id,
       substring(text, 1, 4) AS magic,
       CAST(length(text) AS BIGINT) AS byte_len,
       CAST(1 + length(text) % 640 AS INT) AS width,
       CAST(1 + length(text) % 480 AS INT) AS height,
       CAST(CASE WHEN length(text) = 0 THEN -1
                 ELSE ascii(substring(text, 1, 1)) END AS INT) AS first_byte
FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = M.attach_payload(_docs(spark, sf_dir), "text", "doc_id")
    return M.frame_sample(payloads)


SQL_MULTIMODAL_FRAMES = f"""
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       CAST(least({M.FRAME_CHUNK}, length(text) - f * {M.FRAME_CHUNK}) AS INT)
         AS frame_len,
       CAST(list_sum(list_transform(
              range(f * {M.FRAME_CHUNK} + 1,
                    f * {M.FRAME_CHUNK}
                      + least({M.FRAME_CHUNK},
                              length(text) - f * {M.FRAME_CHUNK}) + 1),
              i -> ascii(text[i:i]))) AS BIGINT) AS frame_checksum
FROM documents,
     unnest(range(0, greatest(CAST(ceil(length(text) / {M.FRAME_CHUNK}.0) AS BIGINT), 1)))
       AS t(f)
"""


QUERIES = {
    "text_pii_redaction": q_text_redact_pii,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_cc_survivors": q_dedup_cc,
    "ann_pq_adc_topk": q_ann_pq,
    "embedding_quantize_int8": q_quantize_int8,
    "multimodal_decode_meta": q_multimodal_meta,
    "multimodal_frame_sample": q_multimodal_frames,
}

ORACLES = {
    "text_pii_redaction": SQL_TEXT_REDACT,
    "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
    "dedup_cc_survivors": SQL_DEDUP_CC,
    "ann_pq_adc_topk": SQL_ANN_PQ,
    "embedding_quantize_int8": SQL_QUANTIZE_INT8,
    "multimodal_decode_meta": SQL_MULTIMODAL_META,
    "multimodal_frame_sample": SQL_MULTIMODAL_FRAMES,
}

# Battery consolidation (VERDICT r6 #7, widened r9 per VERDICT r8 #2):
# parameterization-/composition-subsumed entries — still oracle-verified at
# pytest level (tests/test_retired_surfaces.py).
RETIRED_QUERIES = {
    "text_top_tokens": q_text_top_tokens,     # ⊂ tfidf_top_terms (same explode→groupBy→top-k)
    "dedup_simhash_sig": q_dedup_simhash_sig,  # ⊂ dedup_simhash_pairs (pairs builds the sigs)
    "ann_lsh_bucketed": q_ann_lsh,             # ⊂ ann_lsh_multiprobe (probe radius 0 vs 1)
    "ann_ivf_topk": q_ann_ivf,                 # ⊂ ann_ivf_nprobe2 (nprobe parameter)
    # ---- r9 consolidation ----
    "text_langid": q_text_langid,              # ⊂ text_filter_pipeline (language gate stage)
    "text_quality_score": q_text_quality,      # ⊂ text_filter_pipeline (quality gate stage)
    "text_fingerprint": q_text_fingerprint,    # ⊂ text_filter_pipeline (fingerprint stage)
    "dedup_exact_hash": q_dedup_exact,         # ⊂ text_filter_pipeline (min-doc_id survivor stage)
    "ann_cosine_topk": q_ann_bruteforce,       # exact-cosine top-k survives in hard_negative_mining + hybrid_retrieval_rerank
    # ---- r10 consolidation (VERDICT r9 #1; candidates listed in plans/staged_r10.py) ----
    "text_stats_tokens": q_text_stats,         # ⊂ corpus_prep_pipeline (token/len stats stage)
    "text_filter_pipeline": q_filter_pipeline, # ⊂ corpus_prep_pipeline (langid+quality+fingerprint+exact-dedup gates)
    "dedup_ngram_jaccard": q_dedup_jaccard,    # ⊂ dedup_blocking_quality (runs it as TRUTH side) + dedup_prefix_filter_jaccard (same semantics, scale path)
    "ann_lsh_multiprobe": q_ann_lsh_multiprobe,  # ⊂ ann_recall_eval (runs brute-force truth + bucketed candidates end-to-end)
    "ann_ivf_nprobe2": q_ann_ivf_nprobe2,      # ⊂ ann_recall_eval (IVF candidate list is its approximate side)
    # ---- r11 consolidation (VERDICT r10 #2: one-in/one-out with the staged_r11 registration) ----
    "dedup_minhash_lsh": q_dedup_minhash,      # ⊂ dedup_blocking_quality (runs it as CANDIDATE side) + minhash_estimate_eval (banding is its candidate generator)
    "dedup_embedding_cosine": q_dedup_embedding,  # ⊂ semantic_dedup_clusters (embedding_neardup_pairs is its pair stage) + semantic_decontaminate
}
RETIRED_ORACLES = {
    "text_top_tokens": SQL_TEXT_TOP_TOKENS,
    "dedup_simhash_sig": SQL_DEDUP_SIMHASH_SIG,
    "ann_lsh_bucketed": SQL_ANN_LSH,
    "ann_ivf_topk": SQL_ANN_IVF,
    "text_langid": SQL_TEXT_LANGID,
    "text_quality_score": SQL_TEXT_QUALITY,
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "dedup_exact_hash": SQL_DEDUP_EXACT,
    "ann_cosine_topk": SQL_ANN_BRUTEFORCE,
    "text_stats_tokens": SQL_TEXT_STATS,
    "text_filter_pipeline": SQL_FILTER_PIPELINE,
    "dedup_ngram_jaccard": SQL_DEDUP_JACCARD,
    "ann_lsh_multiprobe": SQL_ANN_LSH_MULTIPROBE,
    "ann_ivf_nprobe2": SQL_ANN_IVF_NPROBE2,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING,
}
