"""Incremental MinHash-LSH dedup against a persisted signature store
(dedup/__init__.py) — r8-staged operator.

The 100 TB shape: the historical corpus is never rescanned; a new batch
joins the persisted (doc_id, sig) table, gets flagged vs store and vs
earlier-id batch rows, and survivors' signatures append to the store.
"""

from __future__ import annotations

import pytest

from dwh_etl_ods_spark_jobs_spark import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "token %d filler words here"
)


@pytest.fixture(scope="module")
def frames(spark):
    store_rows = [(i, BASE % (i // 3)) for i in range(30)]  # near-dup triples
    new_rows = (
        [(100 + i, BASE % (i // 3)) for i in range(12)]  # dups of store
        + [
            (
                200,
                "completely fresh text about distributed query engines "
                "and vectorized execution plans",
            ),
            (
                201,
                "completely fresh text about distributed query engines "
                "and vectorized execution plans",  # batch dup of 200
            ),
            (
                202,
                "another unique document mentioning watermarks state "
                "stores and arrow batches only once",
            ),
        ]
    )
    store_df = spark.createDataFrame(store_rows, "doc_id long, text string")
    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    return store_rows, new_rows, store_df, new_df


def test_incremental_lsh_flags_store_batch_and_fresh(spark, frames):
    _, _, store_df, new_df = frames
    store_sigs = D.minhash_signatures(store_df, "text", "doc_id")
    out = {
        r.doc_id: r
        for r in D.incremental_lsh_dedup(
            new_df, store_sigs, "text", "doc_id"
        ).collect()
    }
    assert len(out) == 15  # every new doc exactly once

    # store dups resolve to the min-id store doc of their triple
    for i in range(12):
        r = out[100 + i]
        assert r.store_dup_of == (i // 3) * 3
        assert r.store_est_micro == 1_000_000
        assert r.is_new == 0
    # within-batch: later ids point at the EARLIEST batch id of the group
    assert out[101].batch_dup_of == 100 and out[102].batch_dup_of == 100
    assert out[100].batch_dup_of == -1  # first of its group: no earlier id
    # fresh rows
    assert out[200].is_new == 1 and out[200].store_dup_of == -1
    assert out[202].is_new == 1
    # 201 is fresh vs store but a batch dup of 200
    assert out[201].store_dup_of == -1
    assert out[201].batch_dup_of == 200
    assert out[201].is_new == 0


def test_incremental_lsh_hash_matches_duckdb(spark, frames):
    import duckdb
    import pandas as pd

    store_rows, new_rows, store_df, new_df = frames
    store_sigs = D.minhash_signatures(store_df, "text", "doc_id")
    spdf = (
        D.incremental_lsh_dedup(new_df, store_sigs, "text", "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("store_t", pd.DataFrame(store_rows, columns=["doc_id", "text"]))
    con.register("new_t", pd.DataFrame(new_rows, columns=["doc_id", "text"]))
    ddf = (
        con.execute(
            D.incremental_lsh_dedup_sql(
                "SELECT doc_id, text FROM new_t",
                "SELECT doc_id, text FROM store_t",
            )
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ddf.columns:
        ddf[c] = ddf[c].astype("int64")
        spdf[c] = spdf[c].astype("int64")
    assert spdf.equals(ddf)


def test_incremental_lsh_store_side_never_rescans_text(spark, frames):
    """The operator consumes only the signature table for the store side —
    the corpus text column must not appear anywhere in the plan (the whole
    point of the incremental shape)."""
    _, _, store_df, new_df = frames
    store_sigs = D.minhash_signatures(store_df, "text", "doc_id").select(
        "doc_id", "sig"
    )
    out = D.incremental_lsh_dedup(new_df, store_sigs, "text", "doc_id")
    # signature store has no text column at all -> structurally impossible
    assert "text" not in [f.name for f in store_sigs.schema.fields]
    assert out.count() == 15


def test_incremental_lsh_empty_store_marks_all_fresh_or_batch(spark, frames):
    _, _, _, new_df = frames
    empty_store = D.minhash_signatures(
        new_df.limit(0), "text", "doc_id"
    )
    out = {
        r.doc_id: r
        for r in D.incremental_lsh_dedup(
            new_df, empty_store, "text", "doc_id"
        ).collect()
    }
    assert all(r.store_dup_of == -1 for r in out.values())
    # batch-internal structure still detected
    assert out[101].batch_dup_of == 100
    assert out[100].is_new == 1


def test_hard_negative_mining_band_and_rank(spark):
    """Band semantics: positives (>= ceil) and dissimilar (< floor) are
    excluded; survivors rank by cosine desc with id tiebreak."""
    from dwh_etl_ods_spark_jobs_spark.similarity import hard_negative_mining

    # 2-d unit-ish vectors with controlled cosines to q=[1,0]
    rows = [
        (0, [1.0, 0.0]),     # query
        (1, [1.0, 0.001]),   # cos ~1.0    -> excluded (>= ceil: near-dup)
        (2, [0.8, 0.6]),     # cos 0.8     -> hard negative
        (3, [0.6, 0.8]),     # cos 0.6     -> hard negative
        (4, [0.0, 1.0]),     # cos 0.0     -> excluded (< floor)
        (5, [-1.0, 0.0]),    # cos -1      -> excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = hard_negative_mining(
        df.filter("vec_id = 0"), df, "vec_id", "v",
        k=5, floor_cos=0.5, ceil_cos=0.95,
    ).collect()
    assert [(r.neighbor_id, r.rank) for r in out] == [(2, 1), (3, 2)]
    assert all(0.5 <= r.cos < 0.95 for r in out)


def test_golden_record_mode_and_ties(spark):
    """Per-cluster attribute mode: frequency wins; ties break to MIN value;
    all-NULL attribute yields NULL."""
    from dwh_etl_ods_spark_jobs_spark.dedup import golden_record

    rows = [
        (1, "gold", "KE"),
        (1, "gold", "UG"),
        (1, "silver", "UG"),   # seg: gold(2) wins; nat: UG(2) wins
        (2, None, "TZ"),
        (2, None, "TZ"),       # seg all-NULL -> NULL; nat TZ
        (3, "b", None),
        (3, "a", None),        # seg b/a tie -> a; nat NULL
    ]
    df = spark.createDataFrame(rows, "cl int, seg string, nat string")
    got = {
        r.cl: (r.seg, r.nat)
        for r in golden_record(df, "cl", ["seg", "nat"]).collect()
    }
    assert got == {1: ("gold", "UG"), 2: (None, "TZ"), 3: ("a", None)}


def test_sorted_neighborhood_pairs_window_and_threshold(spark):
    """Each record pairs with exactly its `window` successors in key
    order; max_distance gates on exact edit distance; NULL keys are
    excluded from the neighborhood entirely."""
    from dwh_etl_ods_spark_jobs_spark.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "anna"), (2, "annab"), (3, "bob"), (4, "bobby"),
        (5, None), (6, "zed"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = {
        (r.a_id, r.b_id): r.lev
        for r in sorted_neighborhood_pairs(df, "id", "name", window=2).collect()
    }
    # name order: anna, annab, bob, bobby, zed (NULL excluded)
    assert set(pairs) == {
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 6), (4, 6),
    }
    assert pairs[(1, 2)] == 1 and pairs[(3, 4)] == 2
    gated = sorted_neighborhood_pairs(
        df, "id", "name", window=2, max_distance=2
    ).collect()
    assert {(r.a_id, r.b_id) for r in gated} == {(1, 2), (3, 4)}


def test_sorted_neighborhood_partitioning_invariant(spark):
    """The pair set is a function of the data's total order, never of the
    physical layout (global_rank decomposition)."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.dedup import sorted_neighborhood_pairs

    df = spark.range(500).select(
        F.col("id"),
        F.concat(F.lit("k"), F.pmod(F.col("id") * 7, F.lit(100)).cast("string"))
        .alias("key"),
    )
    a = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(
            df.repartition(13), "id", "key", window=3
        ).collect()
    )
    assert a == b and len(a) > 0


def test_containment_asymmetric_subset(spark):
    """A doc fully contained in a longer one scores cont_a ~ 1e6 while
    the superset side stays low — the subset signal Jaccard misses."""
    from dwh_etl_ods_spark_jobs_spark.dedup import ngram_containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " eta theta iota kappa " * 4
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally unrelated words here only")],
        "doc_id long, text string",
    )
    rows = ngram_containment_pairs(
        df, "text", "doc_id", threshold_ppm=900000
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.cont_a_ppm == 1000000       # every shingle of 1 is in 2
    assert r.cont_b_ppm < 500000         # 2 is mostly NOT 1
    assert r.inter == r.na
