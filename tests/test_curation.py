"""Corpus-curation operator tests (curation/__init__.py).

Edge cases the sf0.01 oracle pass can't expose: documents shorter than the
n-gram width, weight-1.0 / weight-0.0 strata, shard-boundary straddling,
prefix-sum chunk boundaries, and the plan shapes (broadcast offsets, no
global single-partition window in shard packing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- repetition signals ---

def test_repetition_signals_values(spark):
    out = {
        r["doc_id"]: r
        for r in _docs(
            spark,
            [
                (1, "a a a a"),        # 1 distinct / 4; bigram 'a a' x3 of 3
                (2, "a b c d"),        # all distinct; each bigram once
                (3, "solo"),           # 1 token: no bigrams -> 0.0
            ],
        )
        .transform(C.repetition_signals("doc_id", "text"))
        .collect()
    }
    assert out[1].n_tok == 4
    assert out[1].dup_word_frac == pytest.approx(0.75)
    assert out[1].top_bigram_frac == pytest.approx(1.0)
    assert out[2].dup_word_frac == pytest.approx(0.0)
    assert out[2].top_bigram_frac == pytest.approx(1.0 / 3.0)
    assert out[3].n_tok == 1
    assert out[3].top_bigram_frac == 0.0


def test_word_ngrams_short_doc_guard(spark):
    """A doc shorter than n must produce ZERO n-grams — Spark's
    sequence(0, negative) descends and would fabricate grams from negative
    indexes without the guard."""
    rows = (
        _docs(spark, [(1, "a b c"), (2, "a b c d e f")])
        .select("doc_id", C._word_ngrams(F.split("text", " "), 5).alias("g"))
        .collect()
    )
    by_id = {r["doc_id"]: r["g"] for r in rows}
    assert by_id[1] == []
    assert by_id[2] == ["a b c d e", "b c d e f"]


# --- decontamination ---

def test_ngram_decontaminate_counts(spark):
    bench = _docs(spark, [(100, "w1 w2 w3 w4 w5 w6")])
    corpus = _docs(
        spark,
        [
            (1, "w1 w2 w3 w4 w5 w6"),   # full copy: 2 distinct 5-grams, both hit
            (2, "x w1 w2 w3 w4 w5"),    # shares 1 of its 2 grams
            (3, "a b c d e f g"),       # clean
            (4, "a b c"),               # shorter than n: no grams at all
        ],
    )
    out = {
        r["doc_id"]: r
        for r in corpus.transform(
            C.ngram_decontaminate(bench, "doc_id", "text", n=5)
        ).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1].overlap_ngrams, out[1].total_ngrams) == (2, 2)
    assert out[1].overlap_frac == pytest.approx(1.0)
    assert (out[2].overlap_ngrams, out[2].total_ngrams) == (1, 2)


def test_ngram_decontaminate_repeated_gram_counted_once(spark):
    """Postings are DISTINCT per (doc, gram): a gram repeated inside one
    document must not inflate the overlap count (and the benchmark side
    must not fan out the join)."""
    bench = _docs(spark, [(100, "w1 w2 w3 w4 w5"), (101, "w1 w2 w3 w4 w5 z")])
    corpus = _docs(spark, [(1, "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5")])
    row = corpus.transform(
        C.ngram_decontaminate(bench, "doc_id", "text", n=5)
    ).collect()
    assert len(row) == 1
    # 6 gram positions but 5 DISTINCT grams ('w1 w2 w3 w4 w5' occurs at
    # position 1 and 6); it matches BOTH benchmark docs but counts once.
    assert row[0].overlap_ngrams == 1
    assert row[0].total_ngrams == 5


# --- weighted sampling ---

def test_weighted_sample_extremes_and_determinism(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "drop")
        .when(F.col("id") % 3 == 1, "keep")
        .otherwise("half")
        .alias("lang"),
    )
    picked = df.transform(
        C.weighted_sample("doc_id", "lang", {"drop": 0.0, "keep": 1.0, "half": 0.5})
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in picked.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "drop" not in by_lang          # w=0 keeps nothing
    assert by_lang["keep"] == 667         # w=1 keeps everything (no special-case row loss)
    assert 200 < by_lang.get("half", 0) < 460  # ~333 expected, generous band
    # Deterministic: an identical second run picks the identical rows.
    again = df.transform(
        C.weighted_sample("doc_id", "lang", {"drop": 0.0, "keep": 1.0, "half": 0.5})
    )
    assert picked.exceptAll(again).count() == 0
    assert again.exceptAll(picked).count() == 0


def test_weight_threshold_hex():
    assert C.weight_threshold_hex(1.0) == "g"
    assert C.weight_threshold_hex(0.0) == "00000000"
    assert C.weight_threshold_hex(0.3) == "4ccccccc"
    # every hex digit sorts below 'g' so w>=1 keeps all draws
    assert "ffffffff" < "g"


# --- shard packing ---

def test_pack_token_shards_boundaries(spark):
    # weights 40,40,40: doc 2 STARTS at offset 80 < 100 so it stays in
    # shard 0 even though it straddles the 100-token boundary; doc 3
    # starts at 120 -> shard 1.
    df = spark.createDataFrame(
        [(1, 40), (2, 40), (3, 40), (4, 40)], "doc_id long, w int"
    )
    out = {
        r["doc_id"]: r
        for r in df.transform(C.pack_token_shards("doc_id", "w", 100)).collect()
    }
    assert [out[i].start_offset for i in (1, 2, 3, 4)] == [0, 40, 80, 120]
    assert [out[i].shard for i in (1, 2, 3, 4)] == [0, 0, 0, 1]


def test_pack_token_shards_chunk_boundary_parity(spark):
    """chunk=4 forces multiple prefix-sum chunks over 10 docs with sparse,
    unordered ids; the result must equal the naive global cumsum."""
    rows = [(i * 3 + 1, (i * 7) % 5 + 1) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, w int").repartition(4)
    out = {
        r["doc_id"]: r["start_offset"]
        for r in df.transform(
            C.pack_token_shards("doc_id", "w", 7, chunk=4)
        ).collect()
    }
    expect, acc = {}, 0
    for doc_id, w in sorted(rows):
        expect[doc_id] = acc
        acc += w
    assert out == expect


def test_pack_token_shards_plan_shape(spark):
    """The only global (unpartitioned) window runs over the tiny per-chunk
    subtotal frame, and the offsets join back via broadcast — the full
    fact never passes through a single-partition window."""
    df = spark.range(10000).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("w")
    )
    plan = (
        df.transform(C.pack_token_shards("doc_id", "w", 1000))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the full-fact window is PARTITIONED by _chunk: its spec lists the
    # partition column first, comma-separated, before any ASC order col —
    # an unpartitioned regression would render `windowspecdefinition(_chunk#NL ASC`
    import re

    assert re.search(r"windowspecdefinition\(_chunk#\d+L?, ", plan)
    assert plan.count("Window") >= 2


# --- cross-source leakage ---

def test_cross_source_leakage(spark):
    df = spark.createDataFrame(
        [
            (1, "same text", "a"),
            (2, "same text", "b"),     # leaked across a/b
            (3, "same text", "a"),     # third copy, same source — still 2 sources
            (4, "other", "a"),
            (5, "other", "a"),         # duplicated WITHIN one source: not leakage
        ],
        "doc_id long, text string, source string",
    )
    rows = df.transform(
        C.cross_source_leakage("doc_id", "text", "source")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_sources, r.n_docs, r.first_doc_id) == (2, 3, 1)


# --- duplicated-substring census (ExactSubstr analogue) ---

def test_exact_substring_spans_values(spark):
    # width=3: doc 1 and doc 2 share the span "x y z w" (two overlapping
    # windows: "x y z", "y z w"); doc 3 repeats "p q r" INTRA-doc; doc 4 is
    # clean; doc 5 is shorter than the window width.
    out = {
        r["doc_id"]: r
        for r in _docs(
            spark,
            [
                (1, "x y z w a b"),
                (2, "c d x y z w"),
                (3, "p q r s p q r"),
                (4, "unique tokens only here"),
                (5, "too short"),
            ],
        )
        .transform(C.exact_substring_spans("doc_id", "text", width=3))
        .collect()
    }
    assert len(out) == 5  # clean and too-short docs still report a row
    # doc 1: windows at pos 0,1 dup -> union [0,3)∪[1,4) = 4 tokens
    assert (out[1].n_tok, out[1].n_windows) == (6, 4)
    assert (out[1].n_dup_windows, out[1].dup_tokens) == (2, 4)
    assert out[1].dup_token_frac == pytest.approx(4 / 6)
    # doc 2: same span at pos 2,3 -> 4 of 6 tokens covered
    assert (out[2].n_dup_windows, out[2].dup_tokens) == (2, 4)
    # doc 3: "p q r" at pos 0 and pos 4 — non-overlapping -> 6 tokens
    assert (out[3].n_dup_windows, out[3].dup_tokens) == (2, 6)
    # doc 4: no duplicated windows
    assert (out[4].n_dup_windows, out[4].dup_tokens) == (0, 0)
    assert out[4].dup_token_frac == 0.0
    # doc 5: shorter than width -> zero windows, zero coverage
    assert (out[5].n_windows, out[5].n_dup_windows, out[5].dup_tokens) == (0, 0, 0)


def test_exact_substring_spans_interval_union_not_double_count(spark):
    # One long duplicated run: every window duplicates, but coverage must
    # equal the doc length, not n_windows * width.
    text = " ".join(["t"] * 10)  # every width-4 window is "t t t t"
    out = (
        _docs(spark, [(1, text)])
        .transform(C.exact_substring_spans("doc_id", "text", width=4))
        .collect()[0]
    )
    assert out.n_windows == 7
    assert out.n_dup_windows == 7       # all windows repeat intra-doc
    assert out.dup_tokens == 10         # union covers the doc exactly once
    assert out.dup_token_frac == pytest.approx(1.0)


# --- hashing-trick quality classifier ---

def test_hash_feature_score_exact_fold(spark):
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    weights = [(j * 7 % 19 - 9) * 10_000 for j in range(16)]
    df = _docs(spark, [(1, "alpha beta gamma"), (2, "delta")])
    out = {
        r["doc_id"]: r
        for r in df.transform(
            C.hash_feature_score("doc_id", "text", weights, bias_micro=50_000)
        ).collect()
    }
    # Reproduce the expected score host-side from the same md5 buckets.
    bucket_rows = df.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).select("doc_id", (md5_long(F.col("t")) % 16).alias("b")).collect()
    from collections import defaultdict

    sums = defaultdict(int)
    counts = defaultdict(int)
    for r in bucket_rows:
        sums[r["doc_id"]] += weights[r["b"]]
        counts[r["doc_id"]] += 1
    for doc in (1, 2):
        expect = sums[doc] / counts[doc] / 1e6 + 0.05
        assert out[doc].score == pytest.approx(expect, abs=1e-12)
        assert out[doc].keep == (out[doc].score >= 0.0)
        assert out[doc].n_tok == counts[doc]


def test_hash_feature_score_no_shuffle(spark):
    """Scoring is a scan-side expression: the physical plan must contain
    no Exchange at all."""
    df = _docs(spark, [(1, "a b c")])
    plan = (
        df.transform(C.hash_feature_score("doc_id", "text", [10_000] * 8))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# --- deterministic epoch shuffle ---

def test_epoch_shuffle_is_dense_permutation(spark):
    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    out = df.transform(C.epoch_shuffle("doc_id", "s1")).collect()
    positions = sorted(r.epoch_pos for r in out)
    assert positions == list(range(300))  # dense 0-based, no gaps/dupes


def test_epoch_shuffle_matches_global_rank_and_reseeds(spark):
    from pyspark.sql import Window as W

    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    key = F.md5(F.concat(F.lit("s1:"), F.col("doc_id").cast("string")))
    naive = {
        r.doc_id: r.p
        for r in df.select(
            "doc_id",
            (F.row_number().over(W.orderBy(key, "doc_id")) - 1).alias("p"),
        ).collect()
    }
    two_phase = {
        r.doc_id: r.epoch_pos
        for r in df.transform(C.epoch_shuffle("doc_id", "s1")).collect()
    }
    assert two_phase == naive
    # a different seed re-permutes
    other = {
        r.doc_id: r.epoch_pos
        for r in df.transform(C.epoch_shuffle("doc_id", "s2")).collect()
    }
    assert other != two_phase
    # same seed is bit-identical on re-run
    again = {
        r.doc_id: r.epoch_pos
        for r in df.transform(C.epoch_shuffle("doc_id", "s1")).collect()
    }
    assert again == two_phase


def test_epoch_shuffle_plan_no_global_sort_window(spark):
    """The full-corpus window must be partitioned by bucket; the only
    unpartitioned window runs over the 256-row offsets frame, joined back
    by broadcast."""
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    plan = (
        df.transform(C.epoch_shuffle("doc_id", "s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the full-corpus window is PARTITIONED by _b (see the pack_token_
    # shards plan test for the windowspecdefinition rendering rule)
    import re

    assert re.search(r"windowspecdefinition\(_b#\d+L?, ", plan)


# --- deterministic split assignment ---

def test_assign_split_fractions_and_determinism(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = df.transform(
        C.assign_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert counts["val"] + counts["test"] == 2000 - counts["train"]
    # per-id assignment is stable across invocations
    a = {r.doc_id: r.split for r in out.collect()}
    b = {
        r.doc_id: r.split
        for r in df.transform(
            C.assign_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        ).collect()
    }
    assert a == b


def test_assign_split_membership_independent_of_corpus(spark):
    """A document's split depends only on its id: subsetting the corpus
    must not move anyone."""
    splits = {"train": 0.5, "test": 0.5}
    full = {
        r.doc_id: r.split
        for r in spark.range(0, 500)
        .select(F.col("id").alias("doc_id"))
        .transform(C.assign_split("doc_id", splits))
        .collect()
    }
    subset = {
        r.doc_id: r.split
        for r in spark.range(0, 500, 7)
        .select(F.col("id").alias("doc_id"))
        .transform(C.assign_split("doc_id", splits))
        .collect()
    }
    assert all(full[k] == v for k, v in subset.items())


def test_assign_split_no_shuffle(spark):
    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    plan = (
        df.transform(C.assign_split("doc_id", {"a": 0.3, "b": 0.7}))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# --- corpus tf-idf top terms ---

def test_tfidf_top_terms_values(spark):
    import math

    # 'rare' appears only in doc 1; 'common' in all three docs (idf=0).
    df = _docs(
        spark,
        [
            (1, "common rare rare"),
            (2, "common common other"),
            (3, "common other other"),
        ],
    )
    rows = df.transform(C.tfidf_top_terms("doc_id", "text", k=2)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top1 = {d: min(rs, key=lambda r: r["rank"]) for d, rs in by_doc.items()}
    assert top1[1].term == "rare"
    assert top1[1].tf == 2 and top1[1].df == 1
    assert top1[1].score == pytest.approx(round(2 * math.log(3 / 1), 6))
    # 'common' has df == n_docs -> idf 0 -> score 0; 'other' (df=2) beats it
    assert top1[2].term == "other"
    assert all(r["rank"] <= 2 for r in rows)
    # ties (same score) break by term text ascending
    doc3_terms = [r.term for r in sorted(by_doc[3], key=lambda r: r["rank"])]
    assert doc3_terms[0] == "other"


def test_tfidf_rank_cut_is_deterministic(spark):
    # All terms in this doc have identical tf and df -> identical scores;
    # the k-cut must be alphabetical, twice.
    df = _docs(spark, [(1, "b d a c"), (2, "b d a c")])
    pick = lambda: sorted(
        r.term
        for r in df.transform(C.tfidf_top_terms("doc_id", "text", k=2)).collect()
        if r.doc_id == 1
    )
    first = pick()
    assert first == ["a", "b"]
    assert pick() == first


# --- bigram LM score ---

def test_bigram_lm_score_hand_computed(spark):
    import math

    # Corpus: doc1 "a b a b", doc2 "a b". Bigrams: doc1 {a b:2? no ->
    # windows: (a b),(b a),(a b)}, doc2 {(a b)}. c(a b)=3, c(b a)=1.
    # Unigrams: a:3, b:3 -> V=2.
    df = _docs(spark, [(1, "a b a b"), (2, "a b")])
    out = {
        r["doc_id"]: r
        for r in df.transform(C.bigram_lm_score("doc_id", "text")).collect()
    }
    p_ab = (3 + 1) / (3 + 2)   # P(b|a) add-one smoothed
    p_ba = (1 + 1) / (3 + 2)
    m_ab = round(-math.log(p_ab) * 1e6)
    m_ba = round(-math.log(p_ba) * 1e6)
    assert out[1].n_bigrams == 3
    assert out[1].avg_neg_logprob == pytest.approx(
        round((2 * m_ab + m_ba) / 3 / 1e6, 6)
    )
    assert out[2].n_bigrams == 1
    assert out[2].avg_neg_logprob == pytest.approx(round(m_ab / 1e6, 6))


def test_bigram_lm_score_short_doc_and_ordering(spark):
    # A single-token doc has no bigrams; a doc made of corpus-frequent
    # bigrams scores LOWER (more probable) than a one-off sequence.
    rows = _docs(
        spark,
        [
            (1, "x"),
            (2, "p q p q p q p q"),
            (3, "p q p q p q p q"),
            (4, "z w"),
        ],
    ).transform(C.bigram_lm_score("doc_id", "text")).collect()
    out = {r["doc_id"]: r for r in rows}
    assert len(out) == 4  # no-bigram docs still report
    assert (out[1].n_bigrams, out[1].avg_neg_logprob) == (0, 0.0)
    assert out[2].avg_neg_logprob < out[4].avg_neg_logprob


def test_scalar_attach_joins_stay_hash_joins(spark):
    """The 1-row scalar attach (corpus size N, vocab size V) must remain a
    broadcast HASH join: constant folding would otherwise collapse the
    literal-key condition to `true` and demote it to a nested loop."""
    df = _docs(spark, [(i, "a b c d") for i in range(20)])
    for op in (
        C.tfidf_top_terms("doc_id", "text", k=2),
        C.bigram_lm_score("doc_id", "text"),
    ):
        plan = df.transform(op)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


# --- boilerplate-paragraph removal ---

def test_drop_boilerplate_paragraphs(spark):
    # 'P' = an 8-token-corpus boilerplate para repeated in 3 docs (cap 2);
    # docs are chunked into 2-token paragraphs.
    promo = "buy now"
    df = _docs(
        spark,
        [
            (1, promo + " alpha beta"),
            (2, promo + " gamma delta"),
            (3, promo + " epsilon zeta"),
            (4, "eta theta iota"),     # odd length: last para is 1 token
        ],
    )
    out = {
        r["doc_id"]: r
        for r in df.transform(
            C.drop_boilerplate_paragraphs(
                "doc_id", "text", para_tokens=2, max_df=2
            )
        ).collect()
    }
    assert (out[1].n_paras, out[1].n_dropped) == (2, 1)
    assert out[1].clean_text == "alpha beta"
    assert out[2].clean_text == "gamma delta"
    assert out[3].clean_text == "epsilon zeta"
    # untouched doc reconstructs in order, including the partial tail para
    assert (out[4].n_paras, out[4].n_dropped) == (2, 0)
    assert out[4].clean_text == "eta theta iota"


def test_drop_boilerplate_all_dropped_yields_empty(spark):
    df = _docs(spark, [(i, "spam spam spam spam") for i in range(4)])
    rows = df.transform(
        C.drop_boilerplate_paragraphs("doc_id", "text", para_tokens=4, max_df=2)
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.n_paras, r.n_dropped, r.clean_text) == (1, 1, "")


# --- BM25 top-k retrieval ---

def _bm25_py(tf, df, n_docs, dl, avgdl_micro, k1=1.2, b=0.75):
    import math
    idf = math.log(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
    dl_norm = dl * 1000000.0 / avgdl_micro
    return round(idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl_norm))) * 1e6)


def test_bm25_matches_hand_formula(spark):
    # 3 docs, query terms {"cat", "dog"}; doc 3 has neither.
    df = _docs(
        spark,
        [
            (1, "cat cat dog fish"),          # dl=4
            (2, "cat fish fish fish fish fish"),  # dl=6
            (3, "fish fish"),                 # dl=2
        ],
    )
    out = {r.doc_id: r for r in df.transform(
        C.bm25_topk("doc_id", "text", ["cat", "dog"], k=3)
    ).collect()}
    n, sum_dl = 3, 12
    avgdl_micro = round(sum_dl * 1e6 / n)
    exp1 = _bm25_py(2, 2, n, 4, avgdl_micro) + _bm25_py(1, 1, n, 4, avgdl_micro)
    exp2 = _bm25_py(1, 2, n, 6, avgdl_micro)
    assert set(out) == {1, 2}                      # doc 3 hit no term
    assert (out[1].n_terms_hit, out[1].bm25_micro) == (2, exp1)
    assert (out[2].n_terms_hit, out[2].bm25_micro) == (1, exp2)
    assert out[1].bm25_micro > out[2].bm25_micro


def test_bm25_plan_broadcasts_and_takeordered(spark):
    df = _docs(spark, [(i, "cat dog fish") for i in range(20)])
    plan = (
        df.transform(C.bm25_topk("doc_id", "text", ["cat", "dog"], k=5))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # term-stats and corpus-scalar attaches must broadcast (term keys are
    # maximally skewed; shuffling postings by term would hot-spot), and
    # the rank must be TakeOrdered, never a global sort
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_epoch_shuffle_bucket_count_does_not_change_order(spark):
    """The bucket count is a parallelism knob, not a semantic one: 16,
    256, and 4096 buckets produce the identical global permutation
    (within-bucket ranking uses the full key). Non-power-of-16 rejected."""
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    perms = []
    for b in (16, 256, 4096):
        rows = df.transform(C.epoch_shuffle("doc_id", "s1", buckets=b)).collect()
        perms.append({r.doc_id: r.epoch_pos for r in rows})
    assert perms[0] == perms[1] == perms[2]
    assert sorted(perms[0].values()) == list(range(500))
    with pytest.raises(ValueError):
        C.epoch_shuffle("doc_id", "s1", buckets=100)


def test_stratified_sample_exact_counts_and_salt_invariance(spark):
    # 3 strata of sizes 40 / 7 / 1; k=7 -> take 7 / 7 / 1
    rows = (
        [(i, "big") for i in range(40)]
        + [(100 + i, "mid") for i in range(7)]
        + [(200, "tiny")]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string")
    picks = {}
    for n_salts in (1, 8, 32):
        got = (
            df.transform(C.stratified_sample_exact("doc_id", "src", 7, n_salts=n_salts))
            .collect()
        )
        by_src: dict[str, set] = {}
        for r in got:
            by_src.setdefault(r.src, set()).add(r.doc_id)
        picks[n_salts] = by_src
    # exact counts: min(k, |stratum|)
    assert {s: len(v) for s, v in picks[8].items()} == {"big": 7, "mid": 7, "tiny": 1}
    # the salt count is a parallelism knob, never a semantic one
    assert picks[1] == picks[8] == picks[32]
    # and partitioning doesn't change the picked set either
    rep = (
        df.repartition(13)
        .transform(C.stratified_sample_exact("doc_id", "src", 7))
        .collect()
    )
    assert {r.doc_id for r in rep} == {d for v in picks[8].values() for d in v}


def test_temporal_split_boundaries_and_embargo(spark):
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.curation import temporal_split

    df = spark.createDataFrame(
        [
            (1, dt.date(1995, 12, 31)),
            (2, dt.date(1996, 1, 1)),   # train_end itself -> embargo
            (3, dt.date(1996, 3, 31)),
            (4, dt.date(1996, 4, 1)),   # test_start itself -> test
        ],
        "id int, d date",
    )
    got = {
        r.id: r.split
        for r in df.transform(
            temporal_split("d", "1996-01-01", "1996-04-01")
        ).collect()
    }
    assert got == {1: "train", 2: "embargo", 3: "embargo", 4: "test"}


def test_temporal_split_rejects_inverted_window():
    import pytest as _pytest

    from dwh_etl_ods_spark_jobs_spark.curation import temporal_split

    with _pytest.raises(ValueError):
        temporal_split("d", "1996-04-01", "1996-01-01")


def test_temporal_split_census_overlap_counts(spark):
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.curation import temporal_split_census

    rows = [
        ("c1", dt.date(1995, 6, 1)),
        ("c2", dt.date(1995, 7, 1)),
        ("c1", dt.date(1996, 2, 1)),   # embargo, c1 also in train
        ("c1", dt.date(1996, 6, 1)),   # test, c1 also in train
        ("c3", dt.date(1996, 7, 1)),   # test only
    ]
    df = spark.createDataFrame(rows, "e string, d date")
    got = {
        r.split: (r.n_rows, r.n_entities, r.shared_train_entities)
        for r in temporal_split_census(
            df, "d", "e", "1996-01-01", "1996-04-01"
        ).collect()
    }
    assert got == {
        "train": (2, 2, 0),
        "embargo": (1, 1, 1),
        "test": (2, 2, 1),
    }


def test_largest_remainder_allocation_sums_exactly(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import (
        largest_remainder_allocation,
    )

    # weights 3, 3, 1 over budget 10: quotas 30/7, 30/7, 10/7 ->
    # floors 4, 4, 1 (sum 9), remainders 2, 2, 3 -> spare 1 goes to 'c'
    df = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 1)], "k string, w long"
    )
    got = {
        r.key: r.alloc
        for r in largest_remainder_allocation(df, "k", "w", 10).collect()
    }
    assert got == {"a": 4, "b": 4, "c": 2}
    assert sum(got.values()) == 10


def test_largest_remainder_tie_breaks_to_smaller_key(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import (
        largest_remainder_allocation,
    )

    # equal weights, budget 5 over 2 groups: floors 2,2; equal remainders
    # -> the single spare unit goes to the SMALLER key
    df = spark.createDataFrame([("x", 1), ("m", 1)], "k string, w long")
    got = {
        r.key: r.alloc
        for r in largest_remainder_allocation(df, "k", "w", 5).collect()
    }
    assert got == {"m": 3, "x": 2}
