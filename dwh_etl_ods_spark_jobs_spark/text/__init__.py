"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's ETL surface (which has no text operators —
SURVEY.md §2.10) with the document-processing stages an LLM-data pipeline
needs: tokenization, token counting, quality scoring, language
identification, and content fingerprinting. All operators are pure
``pyspark.sql.functions`` expression trees (JVM-side, whole-stage codegen;
no Python UDFs) so they vectorize and scale linearly with executors —
per-row cost only, no shuffle.

Cross-engine determinism: every operator here has an exactly-equivalent
DuckDB SQL rendering (``*_sql`` helpers) built from the same constants, so
the driver's DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- shared constants (single source of truth for Spark exprs AND oracle SQL) ---

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Minimal deterministic stopword lists per language for the stopword-vote
# language-ID heuristic. Order of the dict defines tie-break priority.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "que"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"),
    "es": ("el", "la", "y", "los", "las", "un", "una", "es", "del", "que"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]

FINGERPRINT_NGRAM = 5  # char n-gram width for content fingerprinting


def _sql_str_list(words: tuple[str, ...] | list[str]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


# --- portable 60-bit hash (identical in Spark and DuckDB) ---

def md5_long(col: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative BIGINT (60 bits).

    Portable: DuckDB renders as ``('0x' || substring(md5(x),1,15))::BIGINT``
    and produces the identical integer. 60 bits keeps us inside signed-long
    range with no sign games on either engine.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB rendering of :func:`md5_long`."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


# --- tokenization ---

def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by exact
    dedup and fingerprinting. NULL normalizes to '' (so NULL and empty
    documents share one fingerprint group instead of poisoning hashes)."""
    return F.trim(F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"\s+", " "))


def normalize_text_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower(coalesce({expr}, '')), '\\s+', ' ', 'g'))"


def tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens (array<string>), empties removed.

    NULL text tokenizes to an empty array (without the coalesce,
    ``size(split(NULL))`` is -1 and every downstream count goes wrong).
    JVM-side ``split`` + higher-order ``filter`` — no Python boundary.
    """
    safe = F.coalesce(col, F.lit(""))
    return F.filter(F.split(F.lower(safe), TOKEN_SPLIT_RE), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower(coalesce({expr}, '')),"
        f" '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def token_count(col: Column) -> Column:
    """Whitespace/punctuation token count (the "wc -w"-style count every
    data pipeline reports per document)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-approximating token count: alphanumeric runs are charged
    ceil(len/4) tokens (the familiar ~4-chars-per-token heuristic), each
    non-space punctuation char is one token. Pure expression arithmetic.
    """
    toks = tokens(col)
    word_tokens = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return (word_tokens + punct).alias("bpe_ish_tokens")


def bpe_ish_token_count_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    return (
        f"list_sum(list_transform({toks}, t -> CAST(ceil(length(t) / 4.0) AS BIGINT)))"
        f" + length(regexp_replace({expr}, '[A-Za-z0-9\\s]', '', 'g'))"
    )


# --- quality scoring ---

def quality_features(text_col: Column) -> dict[str, Column]:
    """The standard cheap quality signals: char length, token count, mean
    token length, stopword ratio, punctuation ratio, alpha ratio.

    All ratios are IEEE-double divisions of integer counts computed in a
    fixed expression order — bit-identical across engines.
    """
    toks = tokens(text_col)
    n_chars = F.length(text_col)
    n_toks = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    )
    n_punct = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))
    n_alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    safe_toks = F.greatest(n_toks, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_toks.cast("long"),
        "mean_token_len": F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
            / safe_toks,
            6,
        ),
        "stopword_ratio": F.round(n_stop / safe_toks, 6),
        "punct_ratio": F.round(n_punct / safe_chars, 6),
        "alpha_ratio": F.round(n_alpha / safe_chars, 6),
    }


def quality_score(text_col: Column) -> Column:
    """Composite [0,1]-ish quality score: rewards stopword presence and
    mid-length documents, penalizes punctuation soup. Heuristic but
    deterministic; thresholding it reproduces the C4/Gopher-style length +
    symbol filters."""
    f = quality_features(text_col)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_term
        + F.lit(0.4) * F.least(f["stopword_ratio"] * 5, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(f["punct_ratio"] * 10, F.lit(1.0))),
        6,
    )


def quality_sql_columns(expr: str) -> dict[str, str]:
    toks = tokens_sql(expr)
    n_stop = (
        f"len(list_filter({toks}, t -> t IN ({_sql_str_list(EN_STOPWORDS)})))"
    )
    n_punct = f"length(regexp_replace({expr}, '[A-Za-z0-9\\s]', '', 'g'))"
    n_alpha = f"length(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    safe_toks = f"greatest(len({toks}), 1)"
    safe_chars = f"greatest(length({expr}), 1)"
    return {
        "n_chars": f"CAST(length({expr}) AS BIGINT)",
        "n_tokens": f"CAST(len({toks}) AS BIGINT)",
        "mean_token_len": (
            f"round(CAST(list_sum(list_transform({toks}, t -> CAST(length(t) AS BIGINT))) AS BIGINT)"
            f" / {safe_toks}, 6)"
        ),
        "stopword_ratio": f"round({n_stop} / {safe_toks}, 6)",
        "punct_ratio": f"round({n_punct} / {safe_chars}, 6)",
        "alpha_ratio": f"round({n_alpha} / {safe_chars}, 6)",
    }


def quality_score_sql(expr: str) -> str:
    c = quality_sql_columns(expr)
    toks = tokens_sql(expr)
    n_stop = f"len(list_filter({toks}, t -> t IN ({_sql_str_list(EN_STOPWORDS)})))"
    n_punct = f"length(regexp_replace({expr}, '[A-Za-z0-9\\s]', '', 'g'))"
    safe_toks = f"greatest(len({toks}), 1)"
    safe_chars = f"greatest(length({expr}), 1)"
    return (
        "round(0.4 * least(CAST(len(" + toks + ") AS BIGINT) / 100.0, 1.0)"
        f" + 0.4 * least(round({n_stop} / {safe_toks}, 6) * 5, 1.0)"
        f" + 0.2 * (1.0 - least(round({n_punct} / {safe_chars}, 6) * 10, 1.0)), 6)"
    )


# --- language identification (stopword vote) ---

def langid(text_col: Column) -> Column:
    """Stopword-vote language ID over :data:`LANG_STOPWORDS`.

    Per language: count tokens present in its stopword list; predict the
    language with the strictly-highest vote (ties / zero votes -> 'und').
    Pure higher-order-function expressions; a production pipeline would
    swap the lists for fastText — the Spark plumbing is identical.
    """
    toks = tokens(text_col)

    def _in(words: tuple[str, ...]):
        return lambda t: t.isin(*words)

    votes = {
        lang: F.size(F.filter(toks, _in(words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(votes)
    best = F.greatest(*[votes[lg] for lg in langs])
    n_at_best = sum(
        (votes[lg] == best).cast("int") for lg in langs
    )
    pred = F.lit("und")
    expr = F.when((best == 0) | (n_at_best > 1), F.lit("und"))
    first = True
    for lg in langs:
        cond = votes[lg] == best
        if first:
            expr = expr.when(cond, F.lit(lg))
            first = False
        else:
            expr = expr.when(cond, F.lit(lg))
    return expr.otherwise(pred)


def langid_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    vote = {
        lang: f"len(list_filter({toks}, t -> t IN ({_sql_str_list(words)})))"
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(vote)
    best = "greatest(" + ", ".join(vote[lg] for lg in langs) + ")"
    n_at_best = " + ".join(
        f"CASE WHEN {vote[lg]} = {best} THEN 1 ELSE 0 END" for lg in langs
    )
    cases = " ".join(
        f"WHEN {vote[lg]} = {best} THEN '{lg}'" for lg in langs
    )
    return (
        f"CASE WHEN {best} = 0 OR ({n_at_best}) > 1 THEN 'und' {cases} "
        "ELSE 'und' END"
    )


# --- content fingerprinting ---

def exact_fingerprint(text_col: Column) -> Column:
    """md5 of the normalized text — the exact-dedup key."""
    return F.md5(normalize_text(text_col))


def exact_fingerprint_sql(expr: str) -> str:
    return f"md5({normalize_text_sql(expr)})"


def content_fingerprint(text_col: Column, ngram: int = FINGERPRINT_NGRAM) -> Column:
    """Min-sampled rolling fingerprint: minimum 60-bit hash over all char
    n-grams of the normalized text (the winnowing/MinHash-k=1 idea — stable
    under small edits away from the minimizing window).

    Expression-only: ``transform(sequence(...)) -> substring`` generates the
    n-gram stream JVM-side; no shuffle, no UDF.
    """
    norm = normalize_text(text_col)
    n_grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (ngram - 1), F.lit(1))),
        lambda i: F.substring(norm, i, ngram),
    )
    return F.array_min(F.transform(n_grams, lambda g: md5_long(g)))


def content_fingerprint_sql(expr: str, ngram: int = FINGERPRINT_NGRAM) -> str:
    norm = normalize_text_sql(expr)
    grams = (
        f"list_transform(range(1, greatest(length({norm}) - {ngram - 1}, 1) + 1),"
        f" i -> {norm}[i:i+{ngram - 1}])"
    )
    return f"list_min(list_transform({grams}, g -> {md5_long_sql('g')}))"


# --- PII redaction (training-data scrubbing pass) ---

# Patterns restricted to the Java-regex ∩ RE2 common subset (no lookaround,
# no backreferences) so Spark and DuckDB replace identical spans. Order
# matters: the loose phone pattern runs LAST so emails/ids/ips are already
# placeholders when it scans.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("national_id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(text_col: Column) -> Column:
    """Replace email / SSN-style id / IPv4 / phone spans with typed
    placeholders — the standard scrubbing pass before corpus publication.
    Pure chained ``regexp_replace`` (codegen'd, no UDF, no shuffle)."""
    out = text_col
    for _name, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_pii_sql(expr: str) -> str:
    out = expr
    for _name, pat, rep in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


# --- sliding-window chunking (RAG / context-window preparation) ---

def chunk_sliding(
    df, text_col: str, id_col: str, window: int, stride: int
):
    """Split each document into fixed-width character chunks on a sliding
    window — the standard RAG / long-context preparation step (chunk w/
    overlap, hash each chunk for downstream dedup + retrieval indexing).

    Chunk i covers ``[i*stride, i*stride + window)``;
    ``n = (len + stride - 1) div stride`` chunks per document (exact
    integer arithmetic, so the explode fan-out is identical on any
    engine). Empty/NULL documents are dropped — and the guard also keeps
    ``sequence(0, n-1)`` ascending (Spark's sequence DESCENDS when the
    bound is negative, fabricating rows).

    Scale: linear explode bounded by len/stride per row, no shuffle at
    all — chunking is scan-side; the md5 chunk hash gives downstream
    exact-dedup/bucketing a uniform key.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    t = F.col(text_col)
    n_chunks = F.expr(f"(length({text_col}) + {stride - 1}) div {stride}")
    chunk = F.expr(
        f"substring({text_col}, __chunk_idx * {stride} + 1, {window})"
    )
    return (
        df.filter(F.length(t) >= 1)
        .select(
            F.col(id_col),
            t.alias(text_col),
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "__chunk_idx"
            ),
        )
        .select(
            F.col(id_col),
            F.col("__chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("__chunk_idx") * stride).cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            md5_long(chunk).alias("chunk_h"),
        )
    )


def chunk_sliding_sql(
    table: str, text_expr: str, id_expr: str, window: int, stride: int
) -> str:
    """DuckDB rendering of :func:`chunk_sliding`."""
    chunk = f"substring({text_expr}, i * {stride} + 1, {window})"
    return f"""
SELECT {id_expr},
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {stride} AS BIGINT) AS chunk_start,
       CAST(length({chunk}) AS BIGINT) AS chunk_len,
       {md5_long_sql(chunk)} AS chunk_h
FROM {table},
     unnest(range(0, (length({text_expr}) + {stride - 1}) // {stride})) AS t(i)
WHERE length({text_expr}) >= 1
"""


# --- intra-document repetition (duplicate n-gram fraction) ------------------

DUP_NGRAM_N = 3


def dup_ngram_ppm(text_col: Column, n: int = DUP_NGRAM_N) -> Column:
    """Fraction (ppm) of duplicate word ``n``-grams WITHIN a document —
    the Gopher/MassiveText repetition rule (a doc that keeps repeating
    the same trigrams is boilerplate/spam, whatever its other quality
    features say).  ``(total − distinct)·10⁶ div total`` over the
    doc's own n-gram multiset; docs shorter than ``n`` tokens score 0.
    Complements :func:`curation.repetition_signals` (dup WORD fraction +
    top-bigram mode, which needs an explode for the mode): at n ≥ 3 the
    duplicate fraction is computable as a per-row expression, so this
    rule — the one that catches longer boilerplate loops — costs a scan.
    Pure expression arithmetic over the materialized token array (the
    r9 lesson: tokenize ONCE) — no explode, no Python."""
    toks = tokens(text_col)
    total = (F.size(toks) - F.lit(n - 1)).cast("long")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
        lambda i: F.concat_ws(
            " ", *[F.get(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    dup = total - F.size(F.array_distinct(grams)).cast("long")
    # floor(a/b) in double is exact here: a ≤ 10¹² stays under 2⁵³, and a
    # non-integral quotient sits ≥ 1/total ≥ 10⁻⁶ below the next integer —
    # far outside double rounding error (no named columns, so no `div`)
    return (
        F.when(total >= 1, F.floor(dup * F.lit(1_000_000) / total))
        .otherwise(F.lit(0))
        .cast("long")
    )


def dup_ngram_ppm_sql(expr: str, n: int = DUP_NGRAM_N) -> str:
    """DuckDB rendering of :func:`dup_ngram_ppm` (1-based list index)."""
    toks = tokens_sql(expr)
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return (
        f"(WITH t_(t) AS (SELECT {toks})"
        f" SELECT CASE WHEN len(t) >= {n} THEN"
        f" (len(t) - {n - 1}"
        f"  - len(list_distinct(list_transform(range(1, len(t) - {n - 2}),"
        f" i -> {gram})))) * 1000000 // (len(t) - {n - 1})"
        f" ELSE 0 END FROM t_)"
    )
