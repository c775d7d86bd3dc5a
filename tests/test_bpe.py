"""Distributed BPE merge training (text/bpe.py) — r8-staged operator.

Verifies the three-way contract: the Spark trainer, the DuckDB unrolled
rendering, and a pure-Python reference of the SAME merge variant all
produce identical (rank, pair, merged, pair_count) tables, so battery
registration in r8 is a pure wiring step.
"""

from __future__ import annotations

import collections
import re

import pytest

from dwh_etl_ods_spark_jobs_spark.text.bpe import (
    BPE_FIX_PASSES,
    bpe_train,
    bpe_train_sql,
    bpe_word_counts,
)


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Reference implementation of the exact documented variant:
    word-frequency-weighted pair counts, (count DESC, pair ASC) argmax,
    merge applied via repeated leftmost str.replace to BPE_FIX_PASSES."""
    wc: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                wc[w] += 1
    frame = {(" " + " ".join(list(w) + ["_"]) + " "): n for w, n in wc.items()}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pc: collections.Counter = collections.Counter()
        for sym, n in frame.items():
            toks = sym.split()
            for a, b in zip(toks, toks[1:]):
                pc[f"{a} {b}"] += n
        if not pc:
            break
        pair, cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = pair.replace(" ", "")
        merges.append((rank, pair, merged, cnt))
        nxt: collections.Counter = collections.Counter()
        for sym, n in frame.items():
            for _ in range(BPE_FIX_PASSES):
                sym = sym.replace(f" {pair} ", f" {merged} ")
            nxt[sym] += n
        frame = dict(nxt)
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps all day, the lazy cat naps",
    "low lower lowest newer newest widest wide the them then",
] * 3


def test_bpe_word_counts_collapses_corpus(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "body string")
    rows = {r.sym: r.n for r in bpe_word_counts(df, "body").collect()}
    # distinct lowercase words only — the 100 TB corpus reduction
    assert rows[" t h e _ "] == 15  # 'the' across all repeats
    assert all(s.startswith(" ") and s.endswith("_ ") for s in rows)


def test_bpe_train_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "body string")
    got = [
        (r.rank, r.pair, r.merged, r.pair_count)
        for r in bpe_train(spark, df, "body", 8).collect()
    ]
    assert got == _py_bpe(TEXTS, 8)
    # sanity: the most frequent pair in this corpus is 'h e' from 'the'
    assert got[0][1] == "h e" and got[1][2] == "the"


def test_bpe_train_hash_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"body": TEXTS})
    con = duckdb.connect()
    con.register("docs", pdf)
    ddf = con.execute(bpe_train_sql("docs", "body", 8)).df()
    duck = [
        (int(r["rank"]), r["pair"], r["merged"], int(r["pair_count"]))
        for _, r in ddf.iterrows()
    ]
    spark_rows = [
        (r.rank, r.pair, r.merged, r.pair_count)
        for r in bpe_train(
            spark, spark.createDataFrame(pdf), "body", 8
        ).collect()
    ]
    assert duck == spark_rows == _py_bpe(TEXTS, 8)


def test_bpe_self_pair_odd_run_is_deterministic(spark):
    """The documented variant: an odd run of a self-pair ('aaaaa' with
    merge a+a) segments identically in Spark, DuckDB and str.replace —
    leftmost non-overlapping, repeated to fixpoint."""
    texts = ["aaaaa aaaaa aaaaa aaaa"]
    df = spark.createDataFrame([(t,) for t in texts], "body string")
    got = [
        (r.rank, r.pair, r.merged, r.pair_count)
        for r in bpe_train(spark, df, "body", 3).collect()
    ]
    assert got == _py_bpe(texts, 3)
    assert got[0][1] == "a a"


def test_bpe_train_stops_early_when_no_pairs_remain(spark):
    # single 2-symbol word: merge 1 consumes the only pair ('a _'),
    # leaving 1-symbol frames -> early stop regardless of n_merges
    df = spark.createDataFrame([("a",)], "body string")
    out = bpe_train(spark, df, "body", 10).collect()
    assert len(out) == 1
    assert (out[0].pair, out[0].merged) == ("a _", "a_")


def test_bpe_iteration_state_is_word_sized_and_checkpointed(spark):
    """Scale shape: after training the working frame is the distinct-word
    vocabulary (not the corpus), and each iteration's frame is
    localCheckpointed so deep merge counts never re-derive the chain."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "body string")
    wc = bpe_word_counts(df, "body")
    n_words = wc.count()
    assert n_words < sum(len(t.split()) for t in TEXTS)  # collapsed
    # 12 merges: lineage stays bounded because every iteration checkpoints
    out = bpe_train(spark, df, "body", 12)
    assert out.count() <= 12
    ranks = [r.rank for r in out.collect()]
    assert ranks == list(range(1, len(ranks) + 1))


def _py_encode(texts: list[str], merges: list[tuple[str, str]]) -> dict[int, tuple[int, int]]:
    out = {}
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        n_tok = 0
        for w in words:
            sym = " " + " ".join(list(w) + ["_"]) + " "
            for pair, merged in merges:
                for _ in range(BPE_FIX_PASSES):
                    sym = sym.replace(f" {pair} ", f" {merged} ")
            n_tok += len(sym.split())
        out[i] = (len(words), n_tok)
    return out


def test_bpe_encode_counts_matches_python_and_duckdb(spark):
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.text.bpe import (
        bpe_encode_counts,
        bpe_encode_counts_sql,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, body string"
    )
    merges = [
        (r.pair, r.merged) for r in bpe_train(spark, df, "body", 6).collect()
    ]
    ref = _py_encode(TEXTS, merges)

    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_encode_counts(df, "body", "doc_id", merges).collect()
    }
    assert got == ref

    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": range(len(TEXTS)), "body": TEXTS}))
    ddf = con.execute(
        bpe_encode_counts_sql("docs", "body", "doc_id", merges)
    ).df()
    duck = {
        int(r["doc_id"]): (int(r["n_words"]), int(r["n_tokens"]))
        for _, r in ddf.iterrows()
    }
    assert duck == ref


def test_bpe_encode_zero_merges_is_chars_plus_marker(spark):
    from dwh_etl_ods_spark_jobs_spark.text.bpe import bpe_encode_counts

    df = spark.createDataFrame([(0, "ab abc")], "doc_id long, body string")
    r = bpe_encode_counts(df, "body", "doc_id", []).collect()[0]
    # 'ab' -> a b _ (3), 'abc' -> a b c _ (4)
    assert (r.n_words, r.n_tokens) == (2, 7)


def test_bpe_encode_chunked_apply_matches_unchunked(spark):
    """chunk=2 forces multiple checkpointed projections over a 6-merge
    table; the result must be identical to one-shot application."""
    from dwh_etl_ods_spark_jobs_spark.text.bpe import bpe_encode_counts

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, body string"
    )
    merges = [
        (r.pair, r.merged) for r in bpe_train(spark, df, "body", 6).collect()
    ]
    one = sorted(
        (r.doc_id, r.n_words, r.n_tokens)
        for r in bpe_encode_counts(df, "body", "doc_id", merges, chunk=100).collect()
    )
    many = sorted(
        (r.doc_id, r.n_words, r.n_tokens)
        for r in bpe_encode_counts(df, "body", "doc_id", merges, chunk=2).collect()
    )
    assert one == many


def test_local_and_distributed_paths_identical(spark):
    """The driver-side fast path (vocab <= BPE_LOCAL_VOCAB_MAX, VERDICT r7
    #3) must emit the bit-identical merge table to the distributed loop —
    same pairs, same ranks, same counts — including early stop."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "body string")
    local = [
        (r.rank, r.pair, r.merged, r.pair_count)
        for r in bpe_train(spark, df, "body", 12).collect()
    ]
    dist = [
        (r.rank, r.pair, r.merged, r.pair_count)
        for r in bpe_train(spark, df, "body", 12, local_vocab_max=0).collect()
    ]
    assert local == dist and len(local) > 0
