"""Property-based tests (hypothesis) for the engine's core invariants.

Each example spins Spark jobs, so example counts are kept small; the
properties are the ones the reference's design depends on globally:

- anti-join incrementality: delta ∪ target covers the source keyset exactly
  once, and a second run appends nothing (idempotency) — for ANY key data
  including NULLs and duplicates;
- greatest-per-key dedupe: exactly one survivor per key, and it is the
  order-maximal generation;
- salted aggregation: equal to the plain aggregation for any salt count.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.operators import (
    anti_join_new,
    dedupe_latest,
    salted_agg,
)

key = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
rows = st.lists(st.tuples(key, key), min_size=0, max_size=25)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data, "a int, b int") if data else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("a"), F.lit(None).cast("int").alias("b")
        )
    )


@given(src=rows, tgt=rows)
@SET
def test_anti_join_partitions_keyspace(spark, src, tgt):
    s, t = _df(spark, src), _df(spark, tgt)
    delta = s.transform(anti_join_new(t, ["a", "b"]))
    got = {(r.a, r.b) for r in delta.collect()}
    src_keys = set(src)
    tgt_keys = set(tgt)
    assert got == src_keys - tgt_keys  # null-safe: None == None
    # idempotency: re-run against target ∪ delta -> empty
    t2 = t.union(delta.select("a", "b"))
    assert s.transform(anti_join_new(t2, ["a", "b"])).count() == 0


gen_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 100)),
    min_size=1, max_size=30,
)


@given(data=gen_rows)
@SET
def test_dedupe_latest_keeps_order_maximal(spark, data):
    df = spark.createDataFrame(data, "k int, ts int, id int")
    out = df.transform(
        dedupe_latest(["k"], [F.col("ts").desc(), F.col("id").desc()])
    ).collect()
    got = {r.k: (r.ts, r.id) for r in out}
    expect = {}
    for k, ts, id_ in data:
        if k not in expect or (ts, id_) > expect[k]:
            expect[k] = (ts, id_)
    assert len(out) == len(expect)  # exactly one survivor per key
    assert got == expect


agg_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 1000), st.integers(-50, 50)),
    min_size=1, max_size=40,
)


@given(data=agg_rows, n_salts=st.integers(1, 9))
@SET
def test_salted_agg_matches_plain(spark, data, n_salts):
    df = spark.createDataFrame(data, "k int, rid int, v int")
    plain = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            df, ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"),
             "mn": ("v", "min"), "mx": ("v", "max")},
            salt_from=["rid"], n_salts=n_salts,
        ).collect()
    }
    assert plain == salted


# --- curation invariants (r6) ---

wtok = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),   # sparse doc ids
        st.integers(min_value=0, max_value=500),      # token counts
    ),
    min_size=0, max_size=30, unique_by=lambda t: t[0],
)


@given(data=wtok, chunk=st.sampled_from([1, 3, 7, 4096]))
@SET
def test_pack_token_shards_equals_naive_cumsum(spark, data, chunk):
    """Two-phase distributed prefix sum == the naive global ordered cumsum
    for ANY sparse id set, weight mix, and chunk width (incl. chunk=1:
    every doc its own chunk — pure offset path; and chunk>max_id: one
    chunk — pure window path)."""
    from dwh_etl_ods_spark_jobs_spark.curation import pack_token_shards

    df = (
        spark.createDataFrame(data, "doc_id long, w int")
        if data
        else spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0).alias("w")
        )
    )
    got = {
        r["doc_id"]: (r["start_offset"], r["shard"])
        for r in df.transform(
            pack_token_shards("doc_id", "w", 97, chunk=chunk)
        ).collect()
    }
    acc, expect = 0, {}
    for doc_id, w in sorted(data):
        expect[doc_id] = (acc, acc // 97)
        acc += w
    assert got == expect


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8
    )
)
@SET
def test_repetition_signals_bounds(spark, texts):
    """0 <= dup_word_frac < 1 and 0 <= top_bigram_frac <= 1 for arbitrary
    (even empty / all-space) text; n_tok == whitespace-split length."""
    from dwh_etl_ods_spark_jobs_spark.curation import repetition_signals

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in df.transform(repetition_signals("doc_id", "text")).collect():
        assert r["n_tok"] == len(texts[r["doc_id"]].split(" "))
        assert 0.0 <= r["dup_word_frac"] < 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0


# --- duplicated-substring census: coverage vs brute-force reference ---

span_texts = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=12).map(
        lambda ts: " ".join(ts)
    ),
    min_size=1,
    max_size=8,
)


@given(texts=span_texts, width=st.sampled_from([2, 3]))
@SET
def test_exact_substring_spans_matches_bruteforce(spark, texts, width):
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.curation import exact_substring_spans

    data = [(i, t) for i, t in enumerate(texts) if t]
    if not data:
        return
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tok, r.n_windows, r.n_dup_windows, r.dup_tokens)
        for r in df.transform(
            exact_substring_spans("doc_id", "text", width=width)
        ).collect()
    }
    # brute-force reference on the host
    wins = {}
    for i, t in data:
        toks = t.split(" ")
        wins[i] = [
            tuple(toks[p : p + width]) for p in range(len(toks) - width + 1)
        ]
    counts = Counter(w for ws in wins.values() for w in ws)
    for i, t in data:
        toks = t.split(" ")
        dup_pos = [p for p, w in enumerate(wins[i]) if counts[w] >= 2]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + width))
        assert got[i] == (
            len(toks),
            max(len(toks) - width + 1, 0),
            len(dup_pos),
            len(covered),
        ), (i, t)


# --- epoch shuffle: dense permutation over ARBITRARY id sets ---

@given(
    ids=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1, max_size=40, unique=True,
    ),
    seed=st.sampled_from(["s1", "s2"]),
)
@SET
def test_epoch_shuffle_dense_over_arbitrary_ids(spark, ids, seed):
    from dwh_etl_ods_spark_jobs_spark.curation import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = df.transform(epoch_shuffle("doc_id", seed)).collect()
    assert sorted(r.epoch_pos for r in out) == list(range(len(ids)))
    # order equals the host-side md5 sort of the same keys
    import hashlib

    expect = sorted(
        ids, key=lambda i: (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i)
    )
    got = [r.doc_id for r in sorted(out, key=lambda r: r.epoch_pos)]
    assert got == expect


# --- BPE training: Spark == the pure-Python reference for ANY corpus ---

word = st.text(alphabet="abc", min_size=1, max_size=6)
corpus = st.lists(
    st.lists(word, min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=8,
)

BPE_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(texts=corpus)
@BPE_SET
def test_bpe_train_equals_python_reference_for_any_corpus(spark, texts):
    """The tiny 'abc' alphabet maximizes self-pairs, runs, and argmax
    ties — the exact places a Spark/Python divergence would hide."""
    from dwh_etl_ods_spark_jobs_spark.text.bpe import bpe_train

    from tests.test_bpe import _py_bpe

    df = spark.createDataFrame([(t,) for t in texts], "body string")
    got = [
        (r.rank, r.pair, r.merged, r.pair_count)
        for r in bpe_train(spark, df, "body", 4).collect()
    ]
    assert got == _py_bpe(list(texts), 4)


# --- incremental dedup: flags partition the batch for ANY store/batch ---

doc = st.tuples(
    st.integers(0, 50),
    st.lists(st.sampled_from(["alpha beta gamma delta", "one two three four",
                              "red green blue yellow"]), min_size=1, max_size=2)
    .map(" ".join),
)


@given(store=st.lists(doc, min_size=0, max_size=8, unique_by=lambda d: d[0]),
       batch=st.lists(doc, min_size=1, max_size=8, unique_by=lambda d: d[0]))
@BPE_SET
def test_incremental_dedup_invariants(spark, store, batch):
    from dwh_etl_ods_spark_jobs_spark import dedup as D

    schema = "doc_id long, text string"
    batch_df = spark.createDataFrame(batch, schema)
    store_df = (
        spark.createDataFrame(store, schema)
        if store
        else spark.createDataFrame([], schema)
    )
    sigs = D.minhash_signatures(store_df, "text", "doc_id")
    out = D.incremental_lsh_dedup(batch_df, sigs, "text", "doc_id").collect()

    # every batch doc exactly once
    assert sorted(r.doc_id for r in out) == sorted(d for d, _ in batch)
    store_ids = {d for d, _ in store}
    batch_ids = {d for d, _ in batch}
    for r in out:
        # is_new consistent with the two flags
        assert r.is_new == int(r.store_dup_of == -1 and r.batch_dup_of == -1)
        # dup pointers land in the right id space, batch dup strictly earlier
        assert r.store_dup_of == -1 or r.store_dup_of in store_ids
        assert r.batch_dup_of == -1 or (
            r.batch_dup_of in batch_ids and r.batch_dup_of < r.doc_id
        )
        # identical text MUST be flagged (LSH recall is 1.0 on exact dups)
        texts_by_id = dict(batch)
        if any(t == texts_by_id[r.doc_id] and d < r.doc_id for d, t in batch):
            assert r.batch_dup_of != -1


_rank_rows = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-1000, 1000)),
    min_size=1, max_size=60, unique=True,
)


@given(data=_rank_rows, n_ranges=st.sampled_from([1, 2, 7, 64]))
@SET
def test_global_rank_equals_sorted_enumeration(spark, data, n_ranges):
    """Property: global_rank == enumerate(sorted(rows)) for ANY row set
    and ANY range count (boundaries can never change the answer)."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import global_rank

    df = spark.createDataFrame(data, "v int, u int")
    got = {
        (r.v, r.u): r.rk
        for r in df.transform(
            global_rank(["v", "u"], out_col="rk", n_ranges=n_ranges)
        ).collect()
    }
    expect = {vu: i for i, vu in enumerate(sorted(data))}
    assert got == expect


_gr_rows = st.lists(
    st.tuples(
        st.integers(0, 4),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.sampled_from(["x", "y"])),
    ),
    min_size=1, max_size=40,
)


@given(data=_gr_rows)
@SET
def test_golden_record_matches_python_mode(spark, data):
    """Property: per-cluster attribute mode (max count, tie -> min value,
    all-NULL -> NULL) matches a brute-force Python computation."""
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.dedup import golden_record

    df = spark.createDataFrame(data, "cl int, p string, q string")
    got = {
        r.cl: (r.p, r.q)
        for r in golden_record(df, "cl", ["p", "q"]).collect()
    }

    def mode(vals):
        vals = [v for v in vals if v is not None]
        if not vals:
            return None
        c = Counter(vals)
        mx = max(c.values())
        return min(v for v, n in c.items() if n == mx)

    expect = {}
    for cl in {r[0] for r in data}:
        rows = [r for r in data if r[0] == cl]
        expect[cl] = (mode(r[1] for r in rows), mode(r[2] for r in rows))
    assert got == expect


_at_rows = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user
        st.sampled_from(["t1", "t2", "conv"]),  # type
        st.integers(0, 20),                     # day offset
    ),
    min_size=1, max_size=30,
)


@given(data=_at_rows)
@SET
def test_attribution_matches_python_reference(spark, data):
    """Property: first/last/linear credits match a brute-force Python
    attribution over the same events (unique ids are list indexes)."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        attribution_credits,
    )

    base = dt.datetime(2024, 1, 1)
    events = [
        (i, u, t, base + dt.timedelta(days=d)) for i, (u, t, d) in enumerate(data)
    ]
    df = spark.createDataFrame(
        events, "event_id long, user_id int, event_type string, ts timestamp"
    )
    got = {
        r.channel: (r.first_touch, r.last_touch, r.linear_micro)
        for r in attribution_credits(
            df, "user_id", "event_type", "ts", "event_id",
            conversion_type="conv", touch_types=["t1", "t2"], lookback_days=7,
        ).collect()
    }

    expect: dict[str, list[int]] = {}
    for cid, cu, ct, cts in events:
        if ct != "conv":
            continue
        touches = sorted(
            (ts, i, t)
            for i, u, t, ts in events
            if u == cu and t in ("t1", "t2")
            and ts < cts and ts >= cts - dt.timedelta(days=7)
        )
        if not touches:
            continue
        for pos, (_, _, ch) in enumerate(touches):
            e = expect.setdefault(ch, [0, 0, 0])
            e[0] += int(pos == 0)
            e[1] += int(pos == len(touches) - 1)
            e[2] += 1_000_000 // len(touches)
    assert got == {k: tuple(v) for k, v in expect.items()}


_wq_rows = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 9)),
    min_size=1, max_size=40,
)


@given(data=_wq_rows, num_den=st.sampled_from([(1, 4), (1, 2), (3, 4), (1, 1)]))
@SET
def test_weighted_quantile_matches_python(spark, data, num_den):
    """Property: first value (by (v, idx) order) whose cumulative weight
    crosses num·total/den — matches brute force, for any weights incl. 0.
    Skips the degenerate all-zero-weight case (quantile undefined)."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import weighted_quantile

    total = sum(w for _, w in data)
    if total == 0:
        return
    num, den = num_den
    rows = [(v, i, w) for i, (v, w) in enumerate(data)]
    df = spark.createDataFrame(rows, "v int, i int, w long")
    got = df.transform(
        weighted_quantile(["v", "i"], "w", [(num, den)], n_ranges=4)
    ).collect()
    assert len(got) == 1
    cw = 0
    expect = None
    for v, i, w in sorted(rows):
        cw += w
        if cw * den >= num * total:
            expect = (v, i)
            break
    assert (got[0].v, got[0].i) == expect


# --- r13-wave properties ----------------------------------------------------

name_strat = st.lists(
    st.text(alphabet="ab", min_size=0, max_size=4), min_size=1, max_size=14
)


@given(names=name_strat)
@SET
def test_edit1_linkage_census_equals_brute_force(spark, names):
    """For ANY name pool over a tiny alphabet (maximally dense deletion
    buckets — the adversarial case for FastSS), the deletion-
    neighborhood census equals per-pair brute force at radius 1."""
    from dwh_etl_ods_spark_jobs_spark.dedup import edit1_linkage_census

    def lev_le1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        return any(b[:i] + b[i + 1 :] == a for i in range(lb))

    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = edit1_linkage_census(df, "name").collect()[0]
    uniq = sorted(set(names))
    from collections import Counter

    cnt = Counter(names)
    exp_pairs = [
        (x, y)
        for i, x in enumerate(uniq)
        for y in uniq[i + 1 :]
        if lev_le1(x, y)
    ]
    assert out.ed1_name_pairs == len(exp_pairs)
    assert out.ed1_record_pairs == sum(cnt[x] * cnt[y] for x, y in exp_pairs)
    assert out.ed0_record_pairs == sum(
        m * (m - 1) // 2 for m in cnt.values()
    )


topk_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 10**6)),
    min_size=0,
    max_size=40,
    unique_by=lambda t: t[2],
)


@given(data=topk_rows, k=st.integers(1, 6), n_salts=st.integers(1, 8))
@SET
def test_salted_topk_equals_plain_window_for_any_salt_count(
    spark, data, k, n_salts
):
    from pyspark.sql import Window

    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        salted_grouped_topk,
    )

    if not data:
        return
    df = spark.createDataFrame(data, "g int, v long, id long")
    got = {
        (r.g, r.rank, r.v, r.id)
        for r in salted_grouped_topk(
            df, ["g"], "v", "id", k, n_salts=n_salts
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    expect = {
        (r.g, r.rank, r.v, r.id)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    }
    assert got == expect


merkle_rows = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 3)),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(old=merkle_rows, new=merkle_rows, n_buckets=st.integers(1, 8))
@SET
def test_merkle_diff_totals_equal_set_algebra(spark, old, new, n_buckets):
    """For ANY pair of keyed tables, the merkle diff's total
    added/removed/changed equals plain set algebra on the key/value
    pairs — for any bucket count (including 1, where the pre-filter
    degenerates to a full diff)."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff,
    )

    def mk(rows):
        if rows:
            return spark.createDataFrame(rows, "k long, a long")
        return spark.range(0).select(
            F.col("id").alias("k"), F.col("id").alias("a")
        )

    out = merkle_range_diff(
        mk(old), mk(new), "k", ["a"], n_buckets=n_buckets
    ).collect()
    do, dn = dict(old), dict(new)
    exp_added = len(set(dn) - set(do))
    exp_removed = len(set(do) - set(dn))
    exp_changed = sum(
        1 for k in set(do) & set(dn) if do[k] != dn[k]
    )
    assert sum(r.n_added for r in out) == exp_added
    assert sum(r.n_removed for r in out) == exp_removed
    assert sum(r.n_changed for r in out) == exp_changed


# --- r15/r16: spatial grid join and greedy selections --------------------------

_pt = st.tuples(
    st.integers(min_value=-30, max_value=30),
    st.integers(min_value=-30, max_value=30),
)
_pts = st.lists(_pt, min_size=0, max_size=30)
_radius = st.integers(min_value=1, max_value=12)


@given(pts=_pts, radius=_radius)
@SET
def test_grid_radius_pairs_equals_bruteforce_for_any_points(spark, pts, radius):
    """The grid join must find EXACTLY the brute-force pair set — for
    any point cloud (duplicates, negatives, collinear) and any radius:
    no pair missed across cell borders, none double-discovered."""
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    data = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = (
        spark.createDataFrame(data, "id long, x long, y long")
        if data
        else spark.range(0).selectExpr(
            "id", "CAST(NULL AS LONG) x", "CAST(NULL AS LONG) y"
        )
    )
    got = {
        (r.id_a, r.id_b, r.dist2)
        for r in grid_radius_pairs(df, "id", "x", "y", radius).collect()
    }
    expect = set()
    for ia, (xa, ya) in enumerate(data and [(x, y) for _, x, y in data] or []):
        for ib in range(ia + 1, len(data)):
            xb, yb = data[ib][1], data[ib][2]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= radius * radius:
                expect.add((ia, ib, d2))
    assert got == expect


_codes = st.lists(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=2, max_size=2),
    min_size=1,
    max_size=12,
)


@given(codes=_codes, k=st.integers(min_value=1, max_value=5))
@SET
def test_kcenter_equals_greedy_reference_for_any_codes(spark, codes, k):
    """The distributed farthest-point rounds must reproduce the exact
    sequential greedy (same seed, same smaller-id tie-break, duplicates
    never re-picked) for any code set."""
    from dwh_etl_ods_spark_jobs_spark.similarity import kcenter_greedy_select

    data = [(i, c) for i, c in enumerate(codes)]
    df = spark.createDataFrame(data, "id long, q array<int>")
    got = [
        (r.sel_round, r.doc_id, r.radius2)
        for r in sorted(
            kcenter_greedy_select(df, "id", "q", k).collect(),
            key=lambda r: r.sel_round,
        )
    ]
    # sequential reference
    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    sel = [0]
    expect = [(0, 0, None)]
    mind = {i: None for i, _ in data}
    for rnd in range(1, k):
        c = codes[sel[-1]]
        for i, ci in data:
            d = d2(ci, c)
            mind[i] = d if mind[i] is None else min(mind[i], d)
        cand = [(m, -i) for i, m in mind.items() if m and m > 0]
        if not cand:
            break
        m, ni = max(cand)
        sel.append(-ni)
        expect.append((rnd, -ni, m))
    assert got == expect


_mmr_rel = st.integers(min_value=0, max_value=50)
_mmr_code = st.lists(st.integers(min_value=-4, max_value=4), min_size=2, max_size=2)
_mmr_cands = st.lists(st.tuples(_mmr_rel, _mmr_code), min_size=1, max_size=8)


@given(cands=_mmr_cands, k=st.integers(min_value=1, max_value=4))
@SET
def test_mmr_equals_sequential_reference(spark, cands, k):
    """The parallel MMR rounds must reproduce the exact sequential
    greedy (lambda blend, smaller-doc tie-break, no re-picks) for any
    candidate list."""
    from dwh_etl_ods_spark_jobs_spark.similarity import mmr_rerank

    data = [("q", i, rel, code) for i, (rel, code) in enumerate(cands)]
    df = spark.createDataFrame(data, "q string, d long, rel long, v array<int>")
    got = [
        (r.sel_round, r.doc, r.mmr_score)
        for r in sorted(
            mmr_rerank(df, "q", "d", "rel", "v", k).collect(),
            key=lambda r: r.sel_round,
        )
    ]
    # sequential reference
    lam, inv = 700_000, 300_000
    rels = {i: rel for i, (rel, _) in enumerate(cands)}
    codes = {i: c for i, (_, c) in enumerate(cands)}
    sel = max(rels, key=lambda i: (rels[i], -i))
    expect = [(0, sel, rels[sel] * lam)]
    mind = {}
    chosen = {sel}
    for rnd in range(1, k):
        c = codes[expect[-1][1]]
        for i in rels:
            d = sum((a - b) ** 2 for a, b in zip(codes[i], c))
            mind[i] = d if i not in mind else min(mind[i], d)
        rest = [i for i in rels if i not in chosen]
        if not rest:
            break
        best = max(rest, key=lambda i: (rels[i] * lam + mind[i] * inv, -i))
        expect.append((rnd, best, rels[best] * lam + mind[best] * inv))
        chosen.add(best)
    assert got == expect


_mk_series = st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12)


@given(vals=_mk_series)
@SET
def test_mann_kendall_equals_bruteforce(spark, vals):
    """S, the exact 18-Var integer, and z must match a direct Python
    evaluation of the Mann-Kendall definitions for any series (ties,
    constants, short series included)."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        mann_kendall_trend,
    )

    data = [("g", t, v) for t, v in enumerate(vals)]
    df = (
        spark.createDataFrame(data, "g string, t long, v long")
        if data
        else spark.range(0).selectExpr(
            "CAST('g' AS STRING) g", "id t", "id v"
        )
    )
    rows = mann_kendall_trend(df, ["g"], "t", "v").collect()
    n = len(vals)
    if n < 2:
        assert rows == []
        return
    s = sum(
        (vals[j] > vals[i]) - (vals[j] < vals[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(vals)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        g * (g - 1) * (2 * g + 5) for g in ties.values()
    )
    r = rows[0]
    assert (r.s_stat, r.var_s_x18) == (s, var18)
    if var18 == 0:
        assert r.z_ppm is None
    elif s == 0:
        assert r.z_ppm == 0
    else:
        zn = s - 1 if s > 0 else s + 1
        assert r.z_ppm == round(zn / math.sqrt(var18 / 18.0) * 1_000_000)


lbl = st.integers(min_value=0, max_value=3)


@given(pairs=st.lists(st.tuples(lbl, lbl), min_size=1, max_size=30))
@SET
def test_cohens_kappa_equals_python_reference(spark, pairs):
    """kappa_ppm == an independent Python walk of the SAME quantized
    integer sequence (marginals ppm-quantized before the chance product,
    truncating division throughout, pe==1 -> NULL) for ANY label pairs —
    the newly gate-registered agreement readout."""
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        cohens_kappa,
    )

    PPM = 1_000_000

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    df = spark.createDataFrame(pairs, "a int, b int")
    got = cohens_kappa(df, "a", "b").collect()[0]

    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ca, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    keys = set(ca) | set(cb)
    po = tdiv(agree * PPM, n)
    pe = tdiv(
        sum(tdiv(ca.get(k, 0) * PPM, n) * tdiv(cb.get(k, 0) * PPM, n) for k in keys),
        PPM,
    )
    kappa = None if pe == PPM else tdiv((po - pe) * PPM, PPM - pe)
    assert (got.n, got.po_ppm, got.pe_ppm, got.kappa_ppm) == (n, po, pe, kappa)


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-500, max_value=500),
            st.integers(min_value=-500, max_value=500),
            st.integers(min_value=-500, max_value=500),
        ),
        min_size=2,
        max_size=30,
    )
)
@SET
def test_corr_matrix_matches_numpy(spark, data):
    """The one-pass exact-moment correlation matrix agrees with numpy's
    corrcoef to 6 decimals for ANY integer columns, and emits explicit
    NULL exactly where a column is constant (numpy: NaN) — the newly
    gate-registered corr_matrix_onepass physiology."""
    import math

    import numpy as np

    from dwh_etl_ods_spark_jobs_spark.operators.stats import corr_matrix

    df = spark.createDataFrame(data, "x int, y int, z int")
    got = {
        (r.col_a, r.col_b): r.corr_6
        for r in corr_matrix(df, ["x", "y", "z"]).collect()
    }
    arr = np.array(data, dtype=np.float64)
    want = np.corrcoef(arr, rowvar=False)
    for (i, a), (j, b) in [((0, "x"), (1, "y")), ((0, "x"), (2, "z")), ((1, "y"), (2, "z"))]:
        w = want[i][j]
        g = got[(a, b)]
        if math.isnan(w):
            assert g is None, (a, b, g)
        else:
            assert g is not None and abs(g - w) <= 1.5e-6, (a, b, g, w)


@given(
    rewards=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_ucb_arm_scores_match_python_reference(spark, rewards):
    """UCB1 per-arm scores equal an independent Python walk (global-max
    normalization, sqrt(2 ln N / n) bonus, all-zero-reward NULL guard)
    for ANY arm/reward data — the newly gate-registered bandit monitor."""
    import math
    from collections import defaultdict

    from dwh_etl_ods_spark_jobs_spark.operators.stats import ucb_arm_scores

    df = spark.createDataFrame(rewards, "arm int, r int")
    got = {r.arm: r for r in ucb_arm_scores(df, "arm", "r").collect()}

    per = defaultdict(lambda: [0, 0])
    for a, r in rewards:
        per[a][0] += 1
        per[a][1] += r
    big_n = len(rewards)
    scale = max(r for _, r in rewards)
    assert set(got) == set(per)
    for a, (n, s) in per.items():
        bonus = round(math.sqrt(2.0 * math.log(big_n) / n), 6)
        assert got[a].n == n
        assert got[a].bonus_6 == bonus
        if scale == 0:
            assert got[a].mean_reward_6 is None and got[a].ucb_6 is None
        else:
            mean = s / (n * scale)
            assert abs(got[a].mean_reward_6 - round(mean, 6)) <= 1e-9
            assert abs(got[a].ucb_6 - round(mean + math.sqrt(2.0 * math.log(big_n) / n), 6)) <= 1e-9


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_growth_accounting_matches_python_reference(spark, events):
    """The DAU new/returning/cumulative decomposition equals a Python
    reference for ANY (user, day) activity log, including replayed
    duplicates — the newly gate-registered growth readout."""
    from collections import defaultdict

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        growth_accounting,
    )

    df = spark.createDataFrame(events, "u int, d int")
    got = {
        r.day: (r.active, r.new, r.returning, r.cumulative)
        for r in growth_accounting(df, "u", "d").collect()
    }

    first = {}
    for u, d in events:
        first[u] = min(first.get(u, d), d)
    active = defaultdict(set)
    for u, d in events:
        active[d].add(u)
    cum = 0
    for d in sorted(active):
        new = sum(1 for u, fd in first.items() if fd == d)
        cum += new
        assert got[d] == (len(active[d]), new, len(active[d]) - new, cum), d
    assert set(got) == set(active)


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=-1000, max_value=1000),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=30,
    ),
    q=st.sampled_from([(1, 2), (9, 10), (1, 10), (95, 100)]),
)
@SET
def test_pinball_loss_matches_python_reference(spark, data, q):
    """mean_pinball_milli equals the exact-integer Python walk
    (max(q_num·err, (q_num−q_den)·err) fold, one truncating division)
    for ANY actual/pred pairs and quantile — the newly gate-registered
    quantile-forecast scoring rule."""
    from collections import defaultdict

    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pinball_loss,
    )

    q_num, q_den = q

    def tdiv(a: int, b: int) -> int:
        r = abs(a) // abs(b)
        return r if (a >= 0) == (b >= 0) else -r

    df = spark.createDataFrame(data, "g int, y int, p int")
    got = {
        r.g: (r.n, r.mean_pinball_milli)
        for r in pinball_loss(df, ["g"], "y", "p", q_num, q_den).collect()
    }
    per = defaultdict(list)
    for g, y, p in data:
        per[g].append(max(q_num * (y - p), (q_num - q_den) * (y - p)))
    assert set(got) == set(per)
    for g, losses in per.items():
        want = tdiv(sum(losses) * 1000, q_den * len(losses))
        assert got[g] == (len(losses), want), g


@given(
    left=st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=30),
    right=st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=30),
)
@SET
def test_cms_join_size_upper_bounds_exact(spark, left, right):
    """The count-min join-size estimate is an UPPER bound on the exact
    equi-join cardinality for ANY key multisets (collisions only add),
    exact_size matches the Python Σ fA·fB, and disjoint key sets
    estimate down to a non-negative value with exact 0 — the newly
    gate-registered planner-side sizing primitive."""
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_join_size

    def _df(vals):
        if vals:
            return spark.createDataFrame([(v,) for v in vals], "k int")
        return spark.range(0).select(F.col("id").cast("int").alias("k"))

    got = countmin_join_size(_df(left), _df(right), "k").collect()[0]
    ca, cb = Counter(left), Counter(right)
    exact = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert got.exact_size == exact
    assert got.est_size >= exact  # one-sided CM guarantee
    assert got.est_size >= 0
    if exact > 0:
        assert got.err_ppm == (got.est_size - exact) * 1_000_000 // exact
    else:
        assert got.err_ppm == 0


@given(
    texts=st.lists(
        st.text(
            alphabet="ab c.AB!x ",
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_dup_ngram_ppm_matches_python_reference(spark, texts):
    """The Gopher duplicate-trigram fraction equals a Python walk of the
    same tokenize/ngram/distinct sequence (floor to ppm, short docs 0,
    NULL-safe) for ANY text — the expression behind the newly
    gate-registered intra_doc_repetition screen."""
    import re

    from dwh_etl_ods_spark_jobs_spark.text import dup_ngram_ppm

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r.rep
        for r in df.select(dup_ngram_ppm(F.col("t")).alias("rep")).collect()
    ]

    def ref(text: str, n: int = 3) -> int:
        toks = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        total = len(toks) - (n - 1)
        if total < 1:
            return 0
        grams = [" ".join(toks[i : i + n]) for i in range(total)]
        dup = total - len(set(grams))
        return dup * 1_000_000 // total

    assert got == [ref(t) for t in texts]


@given(
    data=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_gini_concentration_matches_python(spark, data):
    """gini_ppm == an independent Python walk of the SAME exact-integer
    formula (0-based ascending rank under (value, tiebreak), rank-sum
    fold, one truncated ppm division; n·Σx == 0 -> NULL) for ANY
    non-negative values — the newly gate-registered concentration
    census."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        gini_concentration,
    )

    rows = [(g, x, i) for i, (g, x) in enumerate(data)]
    df = spark.createDataFrame(rows, "g int, x long, id long")
    got = {
        r.g: (r.n, r.total_value, r.gini_ppm)
        for r in gini_concentration(df, ["g"], "x", ["id"]).collect()
    }

    expect = {}
    for g in {g for g, _ in data}:
        vals = sorted(
            [(x, i) for i, (gg, x) in enumerate(data) if gg == g]
        )
        n, total = len(vals), sum(x for x, _ in vals)
        s1 = sum((2 * r + 1) * x for r, (x, _) in enumerate(vals))
        gini = None if n * total == 0 else (
            (s1 - n * total) * 1_000_000 // (n * total)
        )
        expect[g] = (n, total, gini)
    assert got == expect


@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-200, 200)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_loo_influence_matches_python(spark, data):
    """Leave-one-group-out influence == the Python closed form with the
    same TRUNCATING (toward-zero) micro divisions, including negative
    values and the whole-input NULL guard — the newly gate-registered
    data-valuation readout."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        loo_group_influence,
    )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    df = spark.createDataFrame(data, "g int, v long")
    got = {
        r.g: (r.n_g, r.sum_g, r.mean_all_micro, r.mean_without_micro,
              r.influence_micro)
        for r in loo_group_influence(df, ["g"], "v").collect()
    }

    N, S = len(data), sum(v for _, v in data)
    mean_all = tdiv(S * 1_000_000, N)
    expect = {}
    for g in {g for g, _ in data}:
        vs = [v for gg, v in data if gg == g]
        n_g, s_g = len(vs), sum(vs)
        if n_g == N:
            expect[g] = (n_g, s_g, mean_all, None, None)
        else:
            mw = tdiv((S - s_g) * 1_000_000, N - n_g)
            expect[g] = (n_g, s_g, mean_all, mw, mw - mean_all)
    assert got == expect


@given(
    arm_a=st.lists(st.integers(0, 1000), min_size=2, max_size=15),
    arm_b=st.lists(st.integers(0, 1000), min_size=2, max_size=15),
)
@SET
def test_smd_matches_python_reference(spark, arm_a, arm_b):
    """smd_micro == the same FIXED IEEE op sequence in Python (exact
    integer moments, float means/variances in identical order, HALF_UP
    micro rounding; zero pooled variance -> NULL, flag 0) for ANY two
    arms — the newly gate-registered balance diagnostic."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        smd_balance_check,
    )

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    rows = [("a", v) for v in arm_a] + [("b", v) for v in arm_b]
    df = spark.createDataFrame(rows, "arm string, c long")
    got = smd_balance_check(df, "arm", ["c"]).collect()
    assert len(got) == 1
    r = got[0]

    def moments(vs):
        n, sx = len(vs), sum(vs)
        sxx = sum(v * v for v in vs)
        var = float(n * sxx - sx * sx) / (float(n) * float(n - 1))
        return n, sx / n, var

    na, ma, va = moments(arm_a)
    nb, mb, vb = moments(arm_b)
    pooled = math.sqrt((va + vb) / 2.0)
    smd = spark_round((ma - mb) / pooled * 1000000.0) if pooled > 0 else None
    flag = 1 if abs(smd or 0) > 100_000 else 0
    assert (r.covariate, r.arm_a, r.arm_b, r.n_a, r.n_b) == (
        "c", "a", "b", na, nb
    )
    assert r.smd_micro == smd and r.imbalance_flag == flag


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=25,
    )
)
@SET
def test_adamic_adar_matches_bruteforce(spark, edges):
    """Adamic-Adar top-k == a Python brute force over the same wedge
    domain (centers 2 <= deg <= cap, per-center micro weight rounded
    BEFORE the sum, adjacent pairs excluded) for ANY small graph — the
    newly gate-registered link predictor."""
    import math
    from collections import defaultdict

    from dwh_etl_ods_spark_jobs_spark.graph import adamic_adar_topk

    def spark_round(x: float) -> int:
        return int(math.floor(x + 0.5))

    cap = 4  # exercise the center cap on 10 nodes
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = [
        (r.node_a, r.node_b, r.common_neighbors, r.aa_micro)
        for r in adamic_adar_topk(df, top_k=1000, max_center_degree=cap)
        .collect()
    ]

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    acc = defaultdict(lambda: [0, 0])
    for c, nbrs in adj.items():
        d = len(nbrs)
        if not (2 <= d <= cap):
            continue
        w = spark_round(1000000.0 / math.log(float(d)))
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cell = acc[(ns[i], ns[j])]
                cell[0] += 1
                cell[1] += w
    expect = sorted(
        (
            (a, b, cn, aa)
            for (a, b), (cn, aa) in acc.items()
            if b not in adj[a]
        ),
        key=lambda t: (-t[3], t[0], t[1]),
    )
    assert got == expect


@given(
    data=st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 50)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t,
    ),
    k=st.integers(1, 4),
)
@SET
def test_weighted_reservoir_matches_python(spark, data, k):
    """The A-ES reservoir == a sequential Python reference replaying the
    SAME md5-derived draws (u from the seed-keyed 60-bit hash, key =
    HALF_UP-rounded ln(u)/w micros, top-k by (key desc, id asc)) for
    ANY weights — the newly gate-registered sampler; determinism and
    exactness, not just distribution shape."""
    import hashlib
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        weighted_reservoir_sample,
    )

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    rows = [(g, f"id{g}_{w}_{i}", w) for i, (g, w) in enumerate(data)]
    df = spark.createDataFrame(rows, "g int, id string, w long")
    got = {
        (r.g, r.aes_key_micro, r.id, r.rank)
        for r in weighted_reservoir_sample(
            df, ["g"], "id", "w", k, seed="pin-seed"
        ).collect()
    }

    expect = set()
    for g in {g for g, _, _ in rows}:
        keyed = []
        for gg, rid, w in rows:
            if gg != g or w <= 0:
                continue
            h = int(
                hashlib.md5(f"pin-seed:{rid}".encode()).hexdigest()[:15], 16
            )
            u = (float(h) + 1.0) / float(2**60 + 1)
            keyed.append((spark_round(math.log(u) / float(w) * 1000000.0),
                          rid))
        keyed.sort(key=lambda t: (-t[0], t[1]))
        for rank, (key, rid) in enumerate(keyed[:k], start=1):
            expect.add((g, key, rid, rank))
    assert got == expect


@given(
    cal=st.lists(st.integers(0, 1000), min_size=1, max_size=25),
    test=st.lists(st.integers(0, 1000), min_size=1, max_size=25),
    alpha_ppm=st.sampled_from([50_000, 100_000, 200_000, 900_000]),
)
@SET
def test_conformal_matches_python_reference(spark, cal, test, alpha_ppm):
    """The split-conformal readout == a Python replay of the SAME exact
    integer arithmetic (ceil rank k = ((n+1)(1e6-a)+999999) div 1e6,
    k-th order statistic, k > n -> infinite interval covering all,
    truncated ppm coverage) for ANY calibration/test scores — the newly
    gate-registered UQ eval."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        conformal_interval_eval,
    )

    cal_df = spark.createDataFrame(
        [(s, i) for i, s in enumerate(cal)], "s long, id long"
    )
    test_df = spark.createDataFrame([(s,) for s in test], "s long")
    r = conformal_interval_eval(cal_df, test_df, "s", "id", alpha_ppm)
    got = r.collect()[0]

    n = len(cal)
    k = ((n + 1) * (1_000_000 - alpha_ppm) + 999_999) // 1_000_000
    qhat = sorted(cal)[k - 1] if k <= n else None
    n_cov = sum(1 for s in test if qhat is None or s <= qhat)
    cov_ppm = n_cov * 1_000_000 // len(test)
    assert (
        got.n_cal, got.k_rank, got.qhat, got.n_test, got.n_covered,
        got.coverage_ppm, got.target_ppm,
    ) == (n, k, qhat, len(test), n_cov, cov_ppm, 1_000_000 - alpha_ppm)


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 1),
            st.integers(0, 500),
            st.integers(0, 500),
        ),
        min_size=2,
        max_size=25,
    )
)
@SET
def test_cuped_matches_python_reference(spark, data):
    """The CUPED readout == the same FIXED IEEE op sequence in Python
    (exact integer moments, pooled theta, per-variant adjusted mean,
    HALF_UP micro rounding; var(X)=0 -> raw-mean fallback + NULL rho2)
    for ANY (variant, covariate, metric) rows — the newly
    gate-registered experiment readout."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        cuped_adjusted_readout,
    )

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    df = spark.createDataFrame(data, "variant int, x long, y long")
    got = {
        r.variant: (r.n, r.mean_y_micro, r.adj_mean_y_micro, r.rho2_ppm)
        for r in cuped_adjusted_readout(df, "variant", "x", "y").collect()
    }

    gn = len(data)
    gsx = sum(x for _, x, _ in data)
    gsy = sum(y for _, _, y in data)
    gsxx = sum(x * x for _, x, _ in data)
    gsxy = sum(x * y for _, x, y in data)
    gsyy = sum(y * y for _, _, y in data)
    varx = float(gn * gsxx - gsx * gsx)
    vary = float(gn * gsyy - gsy * gsy)
    covn = float(gn * gsxy - gsx * gsy)
    expect = {}
    for v in {v for v, _, _ in data}:
        rows = [(x, y) for vv, x, y in data if vv == v]
        n = len(rows)
        mean_y = sum(y for _, y in rows) / n
        mean_x = sum(x for x, _ in rows) / n
        if varx == 0.0:
            adj, rho2 = mean_y, None
        else:
            adj = mean_y - (covn / varx) * (mean_x - gsx / gn)
            rho2 = (
                spark_round((covn * covn) / (varx * vary) * 1000000.0)
                if vary > 0 else None
            )
        expect[v] = (
            n,
            spark_round(mean_y * 1000000.0),
            spark_round(adj * 1000000.0),
            rho2,
        )
    assert got == expect


@given(
    edges=st.lists(
        st.tuples(
            st.sampled_from(["_START_", "A", "B", "C"]),
            st.sampled_from(["A", "B", "C", "_CONV_", "_NULL_"]),
        ),
        min_size=1,
        max_size=18,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_markov_attribution_matches_python_value_iteration(spark, edges):
    """The Markov removal-effect readout == a Python replay of the SAME
    synchronous integer value iteration (ppm transition fold, x(CONV)
    pinned, removal = forcing x(c)=0, one truncation per (scenario,
    state) per step, positive-effect ppm shares) for ANY transition
    multiset — the newly gate-registered attribution model."""
    from collections import Counter, defaultdict

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_removal_attribution,
    )

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.channel: (
            r.base_conv_ppm, r.removed_conv_ppm, r.removal_effect_ppm,
            r.attribution_ppm,
        )
        for r in markov_removal_attribution(df).collect()
    }

    PPM = 1_000_000
    cnt = Counter(edges)
    tot = Counter(s for s, _ in edges)
    p = defaultdict(dict)
    for (s, d), c in cnt.items():
        p[s][d] = c * PPM // tot[s]
    states = {s for s, _ in edges} | {d for _, d in edges}
    channels = sorted(states - {"_START_", "_CONV_", "_NULL_"})
    scenarios = channels + ["_BASE_"]
    x = {
        sc: {st: (PPM if st == "_CONV_" else 0) for st in states}
        for sc in scenarios
    }
    for _ in range(20):
        nxt = {}
        for sc in scenarios:
            row = {}
            for stt in states:
                if stt == "_CONV_":
                    row[stt] = PPM
                elif stt == "_NULL_" or stt == sc:
                    row[stt] = 0
                else:
                    acc = sum(
                        pp * (0 if d == sc else x[sc][d])
                        for d, pp in p.get(stt, {}).items()
                    )
                    row[stt] = acc // PPM
            nxt[sc] = row
        x = nxt
    if "_START_" not in states:
        assert got == {}
        return
    base = x["_BASE_"]["_START_"]
    effects = {
        c: max(base - x[c]["_START_"], 0) for c in channels
    }
    te = sum(effects.values())
    expect = {
        c: (
            base,
            x[c]["_START_"],
            effects[c],
            None if te == 0 else effects[c] * PPM // te,
        )
        for c in channels
    }
    assert got == expect


@given(
    new_texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=6),
        min_size=1,
        max_size=10,
    ),
    ref_texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=6),
        min_size=0,
        max_size=10,
    ),
)
@SET
def test_ngram_novelty_matches_python_reference(spark, new_texts, ref_texts):
    """The novelty census == a Python replay of the SAME shingle
    machinery (regex tokens, w-gram slices incl. the short-doc
    whole-array shingle, per-doc DISTINCT, ref-vocab membership,
    truncated ppm, decile = ppm*10 div 1e6+1) for ANY corpora — the
    newly gate-registered freshness triage."""
    from collections import defaultdict

    from dwh_etl_ods_spark_jobs_spark.curation import ngram_novelty_census

    W = 3

    def shingles(words):
        n = len(words)
        return {
            " ".join(words[i: i + W])
            for i in range(max(n - (W - 1), 1))
        }

    new_rows = [(i, " ".join(ws)) for i, ws in enumerate(new_texts)]
    ref_rows = [(i, " ".join(ws)) for i, ws in enumerate(ref_texts)]
    new_df = spark.createDataFrame(new_rows, "doc_id long, text string")
    ref_df = (
        spark.createDataFrame(ref_rows, "doc_id long, text string")
        if ref_rows
        else spark.range(0).selectExpr(
            "id AS doc_id", "CAST(NULL AS STRING) AS text"
        )
    )
    got = {
        r.novelty_decile: (r.n_docs, r.total_shingles, r.novel_shingles)
        for r in ngram_novelty_census(
            new_df, ref_df, "text", "doc_id", w=W
        ).collect()
    }

    vocab = set()
    for ws in ref_texts:
        vocab |= shingles(ws)
    census = defaultdict(lambda: [0, 0, 0])
    for ws in new_texts:
        sh = shingles(ws)
        n_sh = len(sh)
        novel = sum(1 for s in sh if s not in vocab)
        ppm = novel * 1_000_000 // n_sh
        dec = ppm * 10 // 1_000_001
        cell = census[dec]
        cell[0] += 1
        cell[1] += n_sh
        cell[2] += novel
    assert got == {k: tuple(v) for k, v in census.items()}


@given(
    catalog=st.dictionaries(
        st.integers(0, 7),
        st.tuples(st.integers(-3, 3), st.integers(-3, 3),
                  st.integers(-3, 3)).filter(lambda v: any(v)),
        min_size=2,
        max_size=8,
    ),
    runs_seed=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7)),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t,
    ),
)
@SET
def test_rec_list_eval_matches_python_reference(spark, catalog, runs_seed):
    """The beyond-accuracy readout == a Python replay of the SAME
    integer/IEEE arithmetic (pairwise cosine distance with the fixed
    fold order and double HALF_UP ppm rounding, truncated per-query and
    cross-query ILD means, coverage, full-catalog exposure Gini with
    zero rows for never-recommended items) for ANY runs/catalog — the
    newly gate-registered recommender eval."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from dwh_etl_ods_spark_jobs_spark.similarity import rec_list_eval

    runs = [(q, i) for q, i in runs_seed if i in catalog]
    if not runs:
        runs = [(0, sorted(catalog)[0])]
    cat_rows = [(i, [float(x) for x in v]) for i, v in catalog.items()]
    runs_df = spark.createDataFrame(runs, "q long, item long")
    cat_df = spark.createDataFrame(cat_rows, "item long, vec array<double>")
    got = rec_list_eval(runs_df, cat_df, "q", "item", "item", "vec").collect()
    assert len(got) == 1
    r = got[0]

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    def dist_ppm(va, vb):
        dot = na = nb = 0.0
        for x, y in zip(va, vb):
            dot += x * y
        for x in va:
            na += x * x
        for y in vb:
            nb += y * y
        c = dot / (math.sqrt(na) * math.sqrt(nb))
        q6 = float(
            Decimal(repr(c)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        return 1_000_000 - spark_round(q6 * 1000000.0)

    vec = {i: [float(x) for x in v] for i, v in catalog.items()}
    per_q = {}
    for q in {q for q, _ in runs}:
        items = sorted(i for qq, i in runs if qq == q)
        dists = [
            dist_ppm(vec[items[a]], vec[items[b]])
            for a in range(len(items))
            for b in range(a + 1, len(items))
        ]
        if dists:
            per_q[q] = sum(dists) // len(dists)
    mean_ild = sum(per_q.values()) // len(per_q) if per_q else None

    n_queries = len({q for q, _ in runs})
    n_rows = len(runs)
    rec_items = {i for _, i in runs}
    cat_n = len(catalog)
    coverage = len(rec_items) * 1_000_000 // cat_n

    exposure = {i: sum(1 for _, ri in runs if ri == i) for i in catalog}
    vals = sorted((cnt, i) for i, cnt in exposure.items())
    n, total = len(vals), sum(c for c, _ in vals)
    s1 = sum((2 * rk + 1) * c for rk, (c, _) in enumerate(vals))
    gini = (
        None if n * total == 0
        else (s1 - n * total) * 1_000_000 // (n * total)
    )
    assert (
        r.n_queries, r.n_rec_rows, r.n_items_recommended, r.catalog_n,
        r.coverage_ppm, r.mean_ild_ppm, r.exposure_gini_ppm,
    ) == (n_queries, n_rows, len(rec_items), cat_n, coverage, mean_ild, gini)


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=25,
    )
)
@SET
def test_degree_assortativity_matches_python(spark, edges):
    """Newman's r == the same exact-integer stub moments + fixed IEEE
    Pearson closed form in Python (both stubs per edge, zero-variance
    -> NULL) for ANY simple graph — staged r15, pinned ahead of its
    registration round."""
    import math

    from dwh_etl_ods_spark_jobs_spark.graph import degree_assortativity

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    df = spark.createDataFrame(sorted(edges), "u long, v long")
    r = degree_assortativity(df).collect()[0]

    from collections import Counter
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    m = len(edges)
    sx = sum(deg[u] + deg[v] for u, v in edges)
    sxx = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in edges)
    sxy = sum(2 * deg[u] * deg[v] for u, v in edges)
    big_m = 2 * m
    cov_num = float(big_m * sxy - sx * sx)
    var_num = float(big_m * sxx - sx * sx)
    r_ppm = (
        spark_round(cov_num / var_num * 1000000.0) if var_num > 0 else None
    )
    assert (r.n_edges, r.n_nodes, r.r_ppm) == (m, len(deg), r_ppm)


@given(
    series=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 300)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_mase_backtest_matches_python(spark, series):
    """MASE == a Python walk of the SAME positional-lag scoring (lag-1
    and lag-season absolute cents errors over t-sorted positions,
    truncated ppm ratio, sae_naive=0 -> NULL) for ANY series — staged
    r17, pinned ahead of its registration round."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        mase_backtest,
    )

    SEASON = 3
    rows = [(g, t, v) for t, (g, v) in enumerate(series)]
    df = spark.createDataFrame(rows, "g int, t long, v long")
    got = {
        r.g: (r.n_scored, r.sae_seasonal, r.sae_naive, r.mase_ppm)
        for r in mase_backtest(df, ["g"], "t", "v", season=SEASON).collect()
    }

    expect = {}
    for g in {g for g, _, _ in rows}:
        vs = [v * 100 for gg, _, v in sorted(rows) if gg == g]
        scored = [
            (abs(vs[i] - vs[i - SEASON]), abs(vs[i] - vs[i - 1]))
            for i in range(SEASON, len(vs))
        ]
        if not scored:
            continue  # groups with no scorable point emit no row
        sae_s = sum(s for s, _ in scored)
        sae_n = sum(n for _, n in scored)
        mase = sae_s * 1_000_000 // sae_n if sae_n > 0 else None
        expect[g] = (len(scored), sae_s, sae_n, mase)
    assert got == expect


@given(
    subjects=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 8), st.integers(0, 1)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_nelson_aalen_matches_python(spark, subjects):
    """The Nelson-Aalen curve == a Python replay of the SAME risk-set
    arithmetic (per-step HALF_UP micro term d_t/n_t rounded BEFORE the
    cumulative sum) for ANY censored cohort — staged r15 physiology,
    pinned ahead of its registration round."""
    import math
    from collections import defaultdict

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        nelson_aalen,
    )

    def spark_round(x: float) -> int:
        return int(math.floor(x + 0.5))

    df = spark.createDataFrame(subjects, "g int, dur long, ev int")
    got = {
        (r.g, r.t): (r.n_at_risk, r.n_events, r.n_censored,
                     r.cum_hazard_micro)
        for r in nelson_aalen(df, ["g"], "dur", "ev").collect()
    }

    expect = {}
    for g in {g for g, _, _ in subjects}:
        grid = defaultdict(lambda: [0, 0])
        for gg, d, e in subjects:
            if gg == g:
                grid[d][0] += e
                grid[d][1] += 1 - e
        total = sum(ev + c for ev, c in grid.values())
        before = 0
        cum = 0
        for t in sorted(grid):
            ev, c = grid[t]
            n_risk = total - before
            term = (
                0 if ev == 0
                else spark_round(float(ev) / float(n_risk) * 1000000.0)
            )
            cum += term
            expect[(g, t)] = (n_risk, ev, c, cum)
            before += ev + c
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 1),
                  st.integers(0, 500)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_diff_in_diff_matches_python(spark, rows):
    """The DiD readout == the same 2x2 cell means + fixed IEEE contrast
    in Python (exact cents sums, HALF_UP micro rounding, any missing
    cell -> NULL did) for ANY design occupancy — staged r17, pinned
    ahead of its registration round."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import diff_in_diff

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    df = spark.createDataFrame(rows, "tr int, per int, y long")
    got = {
        (r.treated, r.period): (r.n, r.mean_micro, r.did_micro)
        for r in diff_in_diff(df, "tr", "per", "y").collect()
    }

    cells = {}
    for tv in (0, 1):
        for pv in (0, 1):
            ys = [y * 100 for t, p, y in rows if t == tv and p == pv]
            if ys:
                cells[(tv, pv)] = (len(ys), sum(ys) / len(ys))
    if all(k in cells for k in [(1, 1), (1, 0), (0, 1), (0, 0)]):
        did = spark_round(
            ((cells[(1, 1)][1] - cells[(1, 0)][1])
             - (cells[(0, 1)][1] - cells[(0, 0)][1])) * 10000.0
        )
    else:
        did = None
    expect = {
        k: (n, spark_round(m * 10000.0), did)
        for k, (n, m) in cells.items()
    }
    assert got == expect


@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(1, 6),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_vocab_richness_matches_python(spark, counts):
    """Chao1 + Good-Turing == the same frequency-of-frequencies fold in
    Python (one HALF_UP-rounded IEEE division for Chao1, exact integer
    ppm missing mass, f2=0 -> NULL) for ANY unigram count grid — staged
    r16, pinned ahead of its registration round."""
    import math

    from dwh_etl_ods_spark_jobs_spark.curation import (
        vocab_richness_from_counts,
    )

    def spark_round(x: float) -> int:
        return int(math.floor(x + 0.5))

    df = spark.createDataFrame(
        list(counts.items()), "token string, c long"
    )
    r = vocab_richness_from_counts(df).collect()[0]

    n_tokens = sum(counts.values())
    vocab = len(counts)
    f1 = sum(1 for c in counts.values() if c == 1)
    f2 = sum(1 for c in counts.values() if c == 2)
    chao1 = (
        vocab + spark_round(float(f1) * float(f1) / (2.0 * float(f2)))
        if f2 > 0 else None
    )
    unseen = f1 * 1_000_000 // n_tokens
    assert (r.n_tokens, r.vocab_size, r.f1, r.f2, r.chao1_est,
            r.unseen_mass_ppm) == (n_tokens, vocab, f1, f2, chao1, unseen)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.one_of(st.none(), st.integers(1, 4)),
        ),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_t_closeness_matches_python(spark, rows):
    """The t-closeness census == a Python replay of the SAME exact
    integer ordered-EMD (dense class x value grid, |cumC*N - cumG*n|
    prefix terms, ONE HALF_UP ppm division by n*N*(V-1), V=1 -> 0,
    NULL sensitives excluded) for ANY table — staged r15, pinned ahead
    of its registration round."""
    import math
    from collections import Counter, defaultdict

    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        t_closeness_census,
    )

    T_MAX = 300_000

    def spark_round(x: float) -> int:
        return int(math.floor(x + 0.5))

    df = spark.createDataFrame(rows, "q int, s int")
    got = {
        r.emd_decile: (r.n_classes, r.n_rows, r.n_at_risk)
        for r in t_closeness_census(df, ["q"], "s", T_MAX).collect()
    }

    nn = [(q, v) for q, v in rows if v is not None]
    if not nn:
        assert got == {}
        return
    values = sorted({v for _, v in nn})
    V, N = len(values), len(nn)
    gcnt = Counter(v for _, v in nn)
    cum_g = {}
    acc = 0
    for v in values:
        acc += gcnt[v]
        cum_g[v] = acc
    census = defaultdict(lambda: [0, 0, 0])
    for q in {q for q, _ in nn}:
        ccnt = Counter(v for qq, v in nn if qq == q)
        n = sum(ccnt.values())
        if V > 1:
            num = 0
            cc = 0
            for v in values[:-1]:
                cc += ccnt.get(v, 0)
                num += abs(cc * N - cum_g[v] * n)
            emd = spark_round(
                float(num) / (float(n) * float(N) * float(V - 1))
                * 1000000.0
            )
        else:
            emd = 0
        cell = census[emd // 100_000]
        cell[0] += 1
        cell[1] += n
        cell[2] += 1 if emd > T_MAX else 0
    assert got == {k: tuple(v) for k, v in census.items()}


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1),
                  st.integers(0, 400)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_stratified_ate_matches_python(spark, rows):
    """The stratified-ATE readout == the same per-bin rounded diffs +
    truncated integer weighted fold in Python (off-support bins
    excluded and reported, all-off-support -> NULL) for ANY occupancy —
    staged r16, pinned ahead of its registration round."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import stratified_ate

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    df = spark.createDataFrame(rows, "bin int, t int, y long")
    got = {
        r.bin: (r.n_treated, r.n_control, r.diff_micro, r.supported,
                r.n_supported_units, r.ate_micro)
        for r in stratified_ate(df, "bin", "t", "y").collect()
    }

    per = {}
    for b in {b for b, _, _ in rows}:
        tr = [y * 100 for bb, t, y in rows if bb == b and t == 1]
        co = [y * 100 for bb, t, y in rows if bb == b and t == 0]
        if tr and co:
            diff = spark_round(
                (sum(tr) / len(tr) - sum(co) / len(co)) * 10000.0
            )
            per[b] = (len(tr), len(co), diff, 1)
        else:
            per[b] = (len(tr), len(co), None, 0)
    n_sup = sum(nt + nc for nt, nc, _, s in per.values() if s)
    num = sum(d * (nt + nc) for nt, nc, d, s in per.values() if s)
    ate = tdiv(num, n_sup) if n_sup > 0 else None
    expect = {
        b: (nt, nc, d, s, n_sup, ate) for b, (nt, nc, d, s) in per.items()
    }
    assert got == expect


@given(
    series=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 200)),
        min_size=1,
        max_size=25,
    )
)
@SET
def test_sax_motif_census_matches_python(spark, series):
    """The SAX motif census == a Python replay of the SAME
    z-discretization (exact integer moments, sd = sqrt(var_num)/n as
    literal IEEE ops, the N(0,1) quartile breakpoints, constant series
    -> 'c', tail words skipped) for ANY per-key series — staged r15,
    pinned ahead of its registration round."""
    import math
    from collections import defaultdict

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        sax_motif_census,
    )

    B1, B2, B3 = -0.6744897501960817, 0.0, 0.6744897501960817
    W = 3
    rows = [(g, t, v) for t, (g, v) in enumerate(series)]
    df = spark.createDataFrame(rows, "g int, t long, v long")
    got = {
        r.word: (r.n_occurrences, r.n_keys)
        for r in sax_motif_census(df, ["g"], "t", "v", word_len=W).collect()
    }

    census = defaultdict(lambda: [0, set()])
    for g in {g for g, _, _ in rows}:
        vs = [v * 100 for gg, _, v in sorted(rows) if gg == g]
        n, sx = len(vs), sum(vs)
        sxx = sum(v * v for v in vs)
        var_num = n * sxx - sx * sx
        syms = []
        for v in vs:
            if var_num == 0:
                syms.append("c")
                continue
            sd = math.sqrt(float(var_num)) / float(n)
            z = (float(v) - float(sx) / float(n)) / sd
            syms.append("a" if z < B1 else "b" if z < B2
                        else "c" if z < B3 else "d")
        for i in range(len(syms) - W + 1):
            word = "".join(syms[i: i + W])
            census[word][0] += 1
            census[word][1].add(g)
    assert got == {k: (n, len(ks)) for k, (n, ks) in census.items()}


@given(
    src=st.dictionaries(st.integers(0, 5), st.integers(1, 50),
                        min_size=1, max_size=6),
    tgt=st.dictionaries(st.integers(0, 7), st.integers(1, 50),
                        min_size=0, max_size=6),
)
@SET
def test_density_ratio_matches_python(spark, src, tgt):
    """The density-ratio reweighting == a Python replay of the SAME
    per-bin arithmetic (target totals summed over SOURCE-matched bins
    only, HALF_UP ppm weights with the cap, n_target=0 -> weight 0,
    no target mass anywhere -> NULLs, exact-integer ESS) for ANY count
    grids — staged r15, pinned ahead of its registration round."""
    import math

    from dwh_etl_ods_spark_jobs_spark.curation import (
        density_ratio_from_counts,
    )

    def spark_round(x: float) -> int:
        return int(math.floor(x + 0.5))

    CAP = 10_000_000
    src_df = spark.createDataFrame(
        list(src.items()), "bin int, n_source long"
    )
    tgt_df = (
        spark.createDataFrame(list(tgt.items()), "bin int, n_target long")
        if tgt
        else spark.range(0).selectExpr(
            "CAST(id AS INT) AS bin", "id AS n_target"
        )
    )
    got = {
        r.bin: (r.n_source, r.n_target, r.weight_ppm, r.ess_ppm)
        for r in density_ratio_from_counts(src_df, tgt_df).collect()
    }

    NS = sum(src.values())
    NT = sum(tgt.get(b, 0) for b in src)  # source-matched bins only
    per = {}
    for b, ns in src.items():
        nt = tgt.get(b, 0)
        if NT == 0:
            w = None
        elif nt == 0:
            w = 0
        else:
            w = min(
                spark_round(
                    float(nt) * float(NS) / (float(NT) * float(ns))
                    * 1000000.0
                ),
                CAP,
            )
        per[b] = (ns, nt, w)
    sw = sum(ns * w for ns, _, w in per.values() if w is not None)
    sww = sum(ns * w * w for ns, _, w in per.values() if w is not None)
    has_any = any(w is not None for _, _, w in per.values())
    ess = (
        spark_round(
            float(sw) * float(sw) / (float(NS) * float(sww)) * 1000000.0
        )
        if has_any and sww > 0 else None
    )
    expect = {b: (ns, nt, w, ess) for b, (ns, nt, w) in per.items()}
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_woe_iv_matches_python(spark, rows):
    """The WOE/IV screen == the same fixed IEEE op sequence in Python
    (ln of the exact-count odds ratio, per-bucket HALF_UP micro
    rounding BEFORE any sum, zero-cell buckets -> NULL) for ANY
    bucket/label rows — completing the r14 wave's randomized pin
    coverage."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import woe_iv_screen

    def spark_round(x: float) -> int:
        return (int(math.floor(x + 0.5)) if x >= 0
                else -int(math.floor(-x + 0.5)))

    df = spark.createDataFrame(rows, "bucket int, lbl int")
    got = {
        r.bucket: (r.n_good, r.n_bad, r.woe_micro, r.iv_micro)
        for r in woe_iv_screen(df, "bucket", "lbl").collect()
    }

    G = sum(1 - l for _, l in rows)
    B = sum(l for _, l in rows)
    expect = {}
    for b in {b for b, _ in rows}:
        ng = sum(1 for bb, l in rows if bb == b and l == 0)
        nb = sum(1 for bb, l in rows if bb == b and l == 1)
        if ng > 0 and nb > 0:
            woe_d = math.log(
                (float(ng) * float(B)) / (float(nb) * float(G))
            )
            woe = spark_round(woe_d * 1000000.0)
            iv = spark_round(
                (float(ng) / float(G) - float(nb) / float(B))
                * woe_d * 1000000.0
            )
        else:
            woe = iv = None
        expect[b] = (ng, nb, woe, iv)
    assert got == expect


# --- r14-session pin wave: the newly REGISTERED r15-r17 surfaces that --------
# --- rode hand-value tests through their gating round -------------------------


def _half_up(x: float) -> int:
    import math

    return (int(math.floor(x + 0.5)) if x >= 0
            else -int(math.floor(-x + 0.5)))


_te_pairs = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("abcd")),
    min_size=1,
    max_size=30,
)


@given(pairs=_te_pairs)
@SET
def test_transition_entropy_matches_python(spark, pairs):
    """cond/marginal entropies == the same fixed per-term IEEE sequence
    in Python (HALF_UP micro-nat rounding BEFORE the sum) for ANY
    transition multiset — the newly gate-registered predictability
    readout."""
    import math
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        transition_entropy,
    )

    df = spark.createDataFrame(
        [("g", s, t) for s, t in pairs], "g string, s string, t string"
    )
    rows = transition_entropy(df, ["g"], "s", "t").collect()
    n = len(pairs)
    stc = Counter(pairs)
    sc = Counter(s for s, _ in pairs)
    tc = Counter(t for _, t in pairs)
    cond = sum(
        _half_up(-(c / n) * math.log(c / sc[s]) * 1000000.0)
        for (s, _t), c in stc.items()
    )
    marg = sum(
        _half_up(-(c / n) * math.log(c / n) * 1000000.0)
        for _t, c in tc.items()
    )
    assert len(rows) == 1
    r = rows[0]
    assert (
        r.n_transitions, r.n_src_states,
        r.cond_entropy_micro, r.marginal_entropy_micro,
    ) == (n, len(sc), cond, marg)


_fano_counts = st.lists(st.integers(0, 20), min_size=1, max_size=20)


@given(counts=_fano_counts)
@SET
def test_dispersion_index_matches_python(spark, counts):
    """fano_ppm == the exact-moment Fano factor in Python (integer
    var_num, ONE HALF_UP-rounded IEEE division; all-zero series ->
    NULL) for ANY per-period count series."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        dispersion_index,
    )

    df = spark.createDataFrame(
        [("g", c) for c in counts], "g string, c long"
    )
    r = dispersion_index(df, ["g"], "c").collect()[0]
    n, s = len(counts), sum(counts)
    sxx = sum(c * c for c in counts)
    var_num = n * sxx - s * s
    fano = (
        _half_up(float(var_num) / (float(n) * float(s)) * 1000000.0)
        if s > 0
        else None
    )
    over = None if fano is None else int(fano > 1_000_000)
    assert (r.n_periods, r.total_count, r.fano_ppm, r.overdispersed) == (
        n, s, fano, over
    )


_mod_edges = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1,
    max_size=25,
)
_mod_labels = st.lists(st.integers(0, 2), min_size=10, max_size=10)


@given(edges=_mod_edges, labels=_mod_labels)
@SET
def test_community_modularity_matches_python(spark, edges, labels):
    """Per-community census + the exact (4m·ΣL − ΣD²)/(4m²) Q fold ==
    a direct Python evaluation for ANY small labeled graph (isolated
    nodes carry no degree; intra needs BOTH endpoints in the label)."""
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.graph import community_modularity

    edf = spark.createDataFrame(sorted(edges), "u long, v long")
    ldf = spark.createDataFrame(
        [(i, labels[i]) for i in range(10)], "node long, label long"
    )
    got = {
        r.label: (r.n_nodes, r.intra_edges, r.degree_sum, r.modularity_ppm)
        for r in community_modularity(edf, ldf).collect()
    }
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    per: dict[int, list[int]] = {}
    for node, d in deg.items():
        lab = labels[node]
        e = per.setdefault(lab, [0, 0, 0])
        e[0] += 1
        e[2] += d
    for u, v in edges:
        if labels[u] == labels[v] and u in deg and v in deg:
            per[labels[u]][1] += 1
    m = len(edges)
    sl = sum(e[1] for e in per.values())
    sd2 = sum(e[2] * e[2] for e in per.values())
    q = _half_up((4 * m * sl - sd2) / (4.0 * m * m) * 1000000.0)
    assert got == {
        lab: (e[0], e[1], e[2], q) for lab, e in per.items()
    }


_sil_code = st.lists(st.integers(-4, 4), min_size=2, max_size=2)
_sil_points = st.lists(_sil_code, min_size=1, max_size=12)
_sil_cents = st.lists(_sil_code, min_size=1, max_size=4)


@given(pts=_sil_points, cents=_sil_cents)
@SET
def test_simplified_silhouette_matches_python(spark, pts, cents):
    """Per-cluster and overall silhouette == the same fixed sqrt/div
    sequence in Python (assignment ties to the smaller cid, b=0 or
    k=1 -> s=0, HALF_UP ppm before the integer div means) for ANY
    points/centroids."""
    import math

    from dwh_etl_ods_spark_jobs_spark.similarity import (
        simplified_silhouette,
    )

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "vec_id long, code array<int>"
    )
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid long, q array<int>"
    )
    got = {
        r.cid: (r.n_points, r.mean_silhouette_ppm, r.overall_silhouette_ppm)
        for r in simplified_silhouette(pdf, cdf, "vec_id", "code").collect()
    }
    per: dict[int, list[int]] = {}
    all_s = []
    for p in pts:
        ranked = sorted(
            (sum((a - b) ** 2 for a, b in zip(p, c)), cid)
            for cid, c in enumerate(cents)
        )
        a2, cid1 = ranked[0]
        b2 = ranked[1][0] if len(ranked) >= 2 else None
        if not b2:  # None or 0
            s = 0
        else:
            s = _half_up(
                (math.sqrt(b2) - math.sqrt(a2)) / math.sqrt(b2) * 1000000.0
            )
        e = per.setdefault(cid1, [0, 0])
        e[0] += 1
        e[1] += s
        all_s.append(s)
    overall = sum(all_s) // len(all_s)
    assert got == {
        cid: (e[0], e[1] // e[0], overall) for cid, e in per.items()
    }


_stump_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 1)), min_size=1, max_size=40
)


@given(rows=_stump_rows)
@SET
def test_stump_split_gain_matches_python(spark, rows):
    """best_split_bin / best_gain_ppm == the same prefix-count Gini
    sequence in Python (candidates leave a right side, HALF_UP ppm per
    candidate, argmax ties to the smaller bin, single-bin feature emits
    no row) for ANY (bin, label) multiset."""
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        stump_split_gain,
    )

    df = spark.createDataFrame(
        [("f", b, l) for b, l in rows], "f string, b long, l long"
    )
    got = stump_split_gain(df, "f", "b", "l").collect()

    cnt = Counter()
    pos = Counter()
    for b, l in rows:
        cnt[b] += 1
        pos[b] += l
    bins = sorted(cnt)
    N, P = sum(cnt.values()), sum(pos.values())

    def gini(p: int, n: int) -> float:
        q = p / n
        return 1.0 - q * q - (1.0 - q) * (1.0 - q)

    best = None
    cn = cp = 0
    for b in bins:
        cn += cnt[b]
        cp += pos[b]
        if cn == N:
            break
        gain = (
            gini(P, N)
            - (cn / N) * gini(cp, cn)
            - ((N - cn) / N) * gini(P - cp, N - cn)
        )
        g = _half_up(gain * 1000000.0)
        key = (g, -b)
        if best is None or key > best:
            best = key
    if best is None:
        assert got == []
    else:
        assert len(got) == 1
        r = got[0]
        assert (r.feature, r.n, r.n_pos, r.best_split_bin, r.best_gain_ppm) == (
            "f", N, P, -best[1], best[0]
        )


_geo_pts = st.lists(
    st.tuples(st.integers(-15, 15), st.integers(-15, 15)),
    min_size=1,
    max_size=25,
)


@given(pts=_geo_pts, radius=st.integers(1, 6))
@SET
def test_grid_radius_pairs_matches_bruteforce(spark, pts, radius):
    """The grid-bucketed radius self-join == the O(n²) Python brute
    force (exact integer dist², id_a < id_b, each pair exactly once)
    for ANY point set including negative coordinates and duplicates —
    the newly gate-registered spatial join."""
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist2)
        for r in grid_radius_pairs(df, "id", "x", "y", radius).collect()
    )
    want = sorted(
        (i, j, (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2)
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
        <= radius * radius
    )
    assert got == want


_iso_bins = st.lists(
    st.integers(1, 40).flatmap(
        lambda n: st.tuples(st.just(n), st.integers(0, n))
    ),
    min_size=1,
    max_size=8,
)


@given(bins=_iso_bins)
@SET
def test_isotonic_minimax_matches_sequential_pav(spark, bins):
    """The closed minimax PAV form == the classic sequential
    pool-adjacent-violators sweep in Python (exact integer pooling, ONE
    HALF_UP ppm rounding of each selected pooled rate) for ANY (n,
    n_pos) bin grid — generalizing the fixed-sequence r16 pin to
    hypothesis-randomized grids."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_from_counts,
    )

    df = spark.createDataFrame(
        [(b, n, p) for b, (n, p) in enumerate(bins)],
        "bin long, n long, n_pos long",
    )
    got = sorted(isotonic_from_counts(df).collect(), key=lambda r: r.bin)

    stack = []
    for n, p in bins:
        stack.append([n, p, 1])
        while (
            len(stack) > 1
            and stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):
            n2, p2, c2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
            stack[-1][2] += c2
    iso = []
    for n, p, c in stack:
        iso += [_half_up(p / n * 1000000.0)] * c

    assert [r.iso_rate_ppm for r in got] == iso
    # raw per-bin rate is the truncating integer div (not a rounded
    # double) — only the SELECTED pooled rate HALF_UP-rounds
    assert [
        (r.bin, r.n, r.n_pos, r.rate_ppm) for r in got
    ] == [
        (b, n, p, p * 1_000_000 // n) for b, (n, p) in enumerate(bins)
    ]
    vals = [r.iso_rate_ppm for r in got]
    assert vals == sorted(vals)  # monotone by construction


_fs_val = st.sampled_from([None, "x", "y", "z"])
_fs_rows = st.lists(st.tuples(_fs_val, _fs_val), min_size=2, max_size=12)


@given(rows=_fs_rows)
@SET
def test_fellegi_sunter_matches_python(spark, rows):
    """Pair scores == the same frequency-exact u estimate + fixed
    ln/log2 micro-bit weight sequence + NULL-evidence/degenerate-field
    rules in Python for ANY small record set — the newly
    gate-registered probabilistic linkage."""
    import math

    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores

    recs = [(i, i % 2, a, b) for i, (a, b) in enumerate(rows)]
    df = spark.createDataFrame(
        recs, "id long, blk int, fa string, fb string"
    )
    got = sorted(
        (r.id_a, r.id_b, r.n_agree, r.score_micro)
        for r in fellegi_sunter_scores(
            df, "id", "blk", [("a", "fa"), ("b", "fb")]
        ).collect()
    )

    m = 0.9
    weights = {}
    for fi, name in ((2, "a"), (3, "b")):
        vals = [r[fi] for r in recs if r[fi] is not None]
        nf = len(vals)
        s2 = sum(vals.count(v) ** 2 for v in set(vals))
        wa = (
            _half_up(
                math.log(m * float(nf * nf) / float(s2))
                / math.log(2.0) * 1000000.0
            )
            if nf > 0
            else None
        )
        wd = (
            _half_up(
                math.log((1.0 - m) * float(nf * nf) / float(nf * nf - s2))
                / math.log(2.0) * 1000000.0
            )
            if nf > 0 and nf * nf - s2 > 0
            else None
        )
        weights[name] = (wa, wd)

    want = []
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            if recs[i][1] != recs[j][1]:
                continue
            n_agree, score = 0, 0
            for fi, name in ((2, "a"), (3, "b")):
                va, vb = recs[i][fi], recs[j][fi]
                if va is not None and vb is not None:
                    if va == vb:
                        n_agree += 1
                        c = weights[name][0]
                    else:
                        c = weights[name][1]
                else:
                    c = 0
                score = None if (score is None or c is None) else score + c
            want.append((i, j, n_agree, score))
    assert got == sorted(want)


# --- r14-session pin wave, second tranche: older float-sequence battery -------
# --- entries that had only hand-value/oracle evidence --------------------------


def _round6(x: float):
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


_zipf_counts = st.lists(st.integers(1, 1000), min_size=1, max_size=20)


@given(counts=_zipf_counts)
@SET
def test_zipf_alpha_matches_python(spark, counts):
    """alpha_6 == the same quantized-log OLS in Python (HALF_UP micro
    log points, exact integer moments, one float division, HALF_UP
    6-decimal rounding; 1-point head -> NULL) for ANY vocab counts —
    the range-decomposed rank path included."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.stats import zipf_alpha

    rows = [("g", c, f"t{i:03d}") for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "g string, cnt long, term string")
    r = zipf_alpha(df, ["g"], "cnt").collect()[0]

    order = sorted(range(len(counts)), key=lambda i: (-counts[i], f"t{i:03d}"))
    pts = [
        (
            _half_up(math.log(rk + 1) * 1_000_000.0),
            _half_up(math.log(counts[i]) * 1_000_000.0),
        )
        for rk, i in enumerate(order)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx)
    want = _round6(-(num / den)) if den != 0 else None
    assert r.n_points == n
    assert r.alpha_6 == want


_acf_vals = st.lists(st.integers(0, 50), min_size=0, max_size=15)


@given(vals=_acf_vals)
@SET
def test_acf_lags_matches_python(spark, vals):
    """acf_6 per lag == the exact-moment Pearson over the overlapping
    span in Python (constant/degenerate span -> NULL, empty span -> no
    row) for ANY bounded series."""
    import math

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import acf_lags

    df = (
        spark.createDataFrame(
            [(t, v) for t, v in enumerate(vals)], "t long, v long"
        )
        if vals
        else spark.range(0).selectExpr("id t", "id v")
    )
    got = {r.lag: (r.n, r.acf_6) for r in acf_lags(df, "t", "v").collect()}

    want = {}
    for k in range(1, 8):
        pairs = [(vals[t], vals[t - k]) for t in range(k, len(vals))]
        if not pairs:
            continue
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        num = float(n * sxy - sx * sy)
        dx = float(n * sxx - sx * sx)
        dy = float(n * syy - sy * sy)
        acf = (
            _round6(num / (math.sqrt(dx) * math.sqrt(dy)))
            if dx > 0 and dy > 0
            else None
        )
        want[k] = (n, acf)
    assert got == want


_ndcg_docs = st.lists(
    st.tuples(st.integers(0, 100), st.integers(0, 3)),
    min_size=1,
    max_size=15,
)


@given(docs=_ndcg_docs)
@SET
def test_ndcg_rerank_matches_python(spark, docs):
    """dcg/idcg/ndcg == a direct Python evaluation over the SAME fixed
    integer micro weight table (run order by (score desc, id), ideal =
    best permutation of the retrieved list, zero-relevance query ->
    ndcg 0) for ANY run."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        NDCG_L_MICRO,
        ndcg_rerank,
    )

    rows = [("q", i, s, rel) for i, (s, rel) in enumerate(docs)]
    df = spark.createDataFrame(rows, "q string, id long, score long, rel long")
    r = ndcg_rerank(df, "q", "id", "score", "rel", k=10).collect()[0]

    k = 10
    run = sorted(range(len(docs)), key=lambda i: (-docs[i][0], i))[:k]
    ideal = sorted(range(len(docs)), key=lambda i: (-docs[i][1], i))[:k]
    dcg = sum(docs[i][1] * NDCG_L_MICRO[p] for p, i in enumerate(run))
    idcg = sum(docs[i][1] * NDCG_L_MICRO[p] for p, i in enumerate(ideal))
    ndcg = 0 if idcg == 0 else dcg * 1_000_000 // idcg
    assert (r.n_run, r.dcg_micro, r.idcg_micro, r.ndcg_ppm) == (
        len(run), dcg, idcg, ndcg
    )


_twap_samples = st.lists(
    st.tuples(st.integers(0, 30), st.integers(-50, 50)),
    min_size=1,
    max_size=12,
)


@given(samples=_twap_samples)
@SET
def test_time_weighted_avg_matches_python(spark, samples):
    """TWAP == the piecewise-constant hold-forward fold in Python
    (samples ordered by (t, v), sign-safe floored division, span-0 key
    reports its (t, v)-last value) for ANY irregular sample set
    including duplicate timestamps and negative values."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        time_weighted_avg,
    )

    df = spark.createDataFrame(
        [("k", t, v) for t, v in samples], "k string, t long, v long"
    )
    r = time_weighted_avg(df, ["k"], "t", "v").collect()[0]

    ordered = sorted(samples)
    span = ordered[-1][0] - ordered[0][0]
    vw = sum(
        ordered[i][1] * (ordered[i + 1][0] - ordered[i][0])
        for i in range(len(ordered) - 1)
    )
    if span == 0:
        twap = ordered[-1][1]
    else:
        twap = (vw - (vw % span)) // span  # pmod == Python % for span>0
    assert (r.n_obs, r.span, r.vw_sum, r.twap) == (
        len(samples), span, vw, twap
    )


_mi_pairs = st.lists(
    st.tuples(st.sampled_from(["a", "b", None]), st.sampled_from(["x", "y", "z", None])),
    min_size=1,
    max_size=30,
)


@given(pairs=_mi_pairs)
@SET
def test_mutual_information_matches_python(spark, pairs):
    """mi_micro == the same per-cell HALF_UP micro-nat term sequence in
    Python (NULL categories count as categories) for ANY categorical
    pair multiset — the entropy/PMI float discipline, independently
    replayed."""
    import math
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        mutual_information,
    )

    df = spark.createDataFrame(pairs, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]

    joint = Counter(pairs)
    mx = Counter(x for x, _ in pairs)
    my = Counter(y for _, y in pairs)
    n = len(pairs)
    mi = sum(
        _half_up(
            (c / n) * math.log((c * n) / (mx[x] * my[y])) * 1000000.0
        )
        for (x, y), c in joint.items()
    )
    assert (r.n_rows, r.n_cells, r.mi_micro) == (n, len(joint), mi)


_kl_texts = st.lists(st.sampled_from("abcd"), min_size=1, max_size=25)


@given(toks_p=_kl_texts, toks_q=_kl_texts)
@SET
def test_kl_token_drift_matches_python(spark, toks_p, toks_q):
    """kl_micro == the same add-one-smoothed per-token HALF_UP
    micro-nat sequence in Python over the UNION vocabulary for ANY two
    token multisets (tokens private to either side included)."""
    import math
    from collections import Counter

    from dwh_etl_ods_spark_jobs_spark.curation import kl_token_drift

    dfp = spark.createDataFrame([(" ".join(toks_p),)], "text string")
    dfq = spark.createDataFrame([(" ".join(toks_q),)], "text string")
    r = kl_token_drift(dfp, dfq, "text").collect()[0]

    cp, cq = Counter(toks_p), Counter(toks_q)
    vocab = set(cp) | set(cq)
    np_, nq, v = len(toks_p), len(toks_q), len(vocab)
    kl = 0
    for t in vocab:
        p = (cp.get(t, 0) + 1) / (np_ + v)
        q = (cq.get(t, 0) + 1) / (nq + v)
        kl += _half_up(p * math.log(p / q) * 1000000.0)
    assert (r.n_tokens_p, r.n_tokens_q, r.vocab, r.kl_micro) == (
        np_, nq, v, kl
    )


_wj_doc = st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=10)
_wj_docs = st.lists(_wj_doc, min_size=2, max_size=6)


@given(docs=_wj_docs)
@SET
def test_weighted_jaccard_matches_python(spark, docs):
    """IDF-weighted Jaccard pairs == a full Python replication of the
    pipeline (distinct 3-token shingles incl. the short-doc single
    shingle, HALF_UP micro idf = ln(N/df), df=1 shingles in the
    denominators but never joined, zero-denominator pairs dropped) for
    ANY small corpus — the dedup family's float-touching core."""
    import math

    from dwh_etl_ods_spark_jobs_spark.dedup import weighted_jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = sorted(
        (r.id_a, r.id_b, r.jw_ppm)
        for r in weighted_jaccard_pairs(
            df, "text", "doc_id", threshold_ppm=0
        ).collect()
    )

    def shingles(toks):
        w = 3
        n = len(toks)
        out = {
            " ".join(toks[i:i + w])
            for i in range(max(n - (w - 1), 1))
        }
        return out

    sh = [shingles(t) for t in docs]
    n_docs = len(docs)
    dfreq = {}
    for s in sh:
        for t in s:
            dfreq[t] = dfreq.get(t, 0) + 1
    idf = {
        t: _half_up(math.log(n_docs / c) * 1000000.0)
        for t, c in dfreq.items()
        if c <= 1000
    }
    totals = [sum(idf[t] for t in s if t in idf) for s in sh]
    want = []
    for i in range(n_docs):
        for j in range(i + 1, n_docs):
            shared = {
                t for t in sh[i] & sh[j] if t in idf and dfreq[t] >= 2
            }
            if not shared:
                continue
            w_inter = sum(idf[t] for t in shared)
            denom = totals[i] + totals[j] - w_inter
            if denom == 0:
                continue  # NULL similarity -> dropped by the filter
            want.append((i, j, w_inter * 1_000_000 // denom))
    assert got == sorted(want)


_wins_rows = st.lists(st.integers(-100, 100), min_size=1, max_size=25)


@given(vals=_wins_rows, trim=st.integers(0, 25))
@SET
def test_winsorized_stats_matches_python(spark, vals, trim):
    """winsor/trim sums == the rank-order clamp fold in Python ((value,
    key) unique tie-break, k = n·trim div 100, lo at rank k+1, hi at
    rank n−k) for ANY values and trim pct — the range-decomposed rank
    path, not a window, does the ordering."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        winsorized_stats,
    )

    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = winsorized_stats(df, ["g"], "v", "id", trim_pct=trim).collect()[0]

    ordered = sorted((v, i) for i, v in enumerate(vals))
    n = len(ordered)
    k = n * trim // 100
    lo = ordered[k][0]
    hi = ordered[n - k - 1][0]
    mid = sum(v for v, _ in ordered[k:n - k])
    assert (
        r.n, r.k, r.lo_val, r.hi_val, r.winsor_sum, r.trim_sum, r.n_mid
    ) == (n, k, lo, hi, mid + k * (lo + hi), mid, n - 2 * k)


_rv_keys = st.lists(st.integers(0, 10**6), min_size=0, max_size=20)
_rv_shards = st.lists(
    st.sampled_from(["s0", "s1", "s2", "s3", "s4", "s5"]),
    min_size=1, max_size=6, unique=True,
)


@given(keys=_rv_keys, old=_rv_shards, new=_rv_shards)
@SET
def test_rendezvous_churn_matches_python(spark, keys, old, new):
    """Shard assignment and resize churn == the encoded-BIGINT
    highest-random-weight argmax in Python (md5 60-bit weights, the
    (w>>4)<<4|idx encoding, greatest-wins tie semantics) for ANY keys
    and shard lists — the routing primitive persisted state depends
    on."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.operators.sharding import (
        rendezvous_churn,
    )

    df = (
        spark.createDataFrame([(k,) for k in keys], "k long")
        if keys
        else spark.range(0).selectExpr("id k")
    )
    r = rendezvous_churn(df, "k", old, new).collect()[0]

    def assign(key: int, shards: list[str]) -> str:
        best = None
        for i, s in enumerate(shards):
            w = int(
                hashlib.md5(f"rv:{s}|{key}".encode()).hexdigest()[:15], 16
            )
            enc = (w - w % 16) + i
            if best is None or enc > best:
                best = enc
        return shards[best % 16]

    moved = sum(1 for k in keys if assign(k, old) != assign(k, new))
    ppm = 0 if not keys else moved * 1_000_000 // len(keys)
    assert (r.n_keys, r.n_moved, r.moved_ppm) == (len(keys), moved, ppm)


_auc_rows = st.lists(
    st.tuples(st.integers(-5, 5), st.integers(0, 1)),
    min_size=1, max_size=30,
)


@given(data=_auc_rows)
@SET
def test_auc_matches_python_midranks(spark, data):
    """Tie-corrected Mann-Whitney AUC == the explicit midrank rank-sum
    in Python for ANY scores/labels — heavy ties, single-class (NULL),
    and negative scores all land on the grouped-identity fold, not a
    per-row rank."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        auc_mann_whitney,
    )

    df = spark.createDataFrame(data, "s long, y int")
    r = auc_mann_whitney(df, "s", "y").collect()[0]

    ordered = sorted(data)
    n1 = sum(y for _, y in data)
    n0 = len(data) - n1
    # midranks: rows i..j (1-based) sharing a score all take (i+j)/2;
    # carry 2x to stay integral
    r1_x2 = 0
    i = 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j][0] == ordered[i][0]:
            j += 1
        mid_x2 = (i + 1) + j  # 2 * (first_rank + last_rank) / 2
        r1_x2 += mid_x2 * sum(y for _, y in ordered[i:j])
        i = j
    want = (
        None
        if n1 == 0 or n0 == 0
        else (r1_x2 - n1 * (n1 + 1)) * 1_000_000 // (2 * n1 * n0)
    )
    assert (r.n_pos, r.n_neg, r.n_scores, r.auc_ppm) == (
        n1, n0, len({s for s, _ in data}), want
    )


_cusum_rows = st.lists(
    st.tuples(st.integers(0, 12), st.integers(-1000, 1000)),
    min_size=1, max_size=30,
)


@given(data=_cusum_rows, thr=st.integers(0, 2_000_000))
@SET
def test_cusum_matches_python_sequential(spark, data, thr):
    """Page's CUSUM == the sequential Python fold (running sum of
    cents*n - total over day order, flag on the ppm envelope) for ANY
    series and threshold — the distributed form's ordered window and
    broadcast total reproduce the scan exactly."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import cusum_flags

    df = spark.createDataFrame(data, "d int, c long")
    got = [
        (r.day, r.cents, r.cusum_scaled, r.flagged)
        for r in cusum_flags(df, "d", "c", thr).orderBy("day").collect()
    ]

    daily = {}
    for d, c in data:
        daily[d] = daily.get(d, 0) + c
    days = sorted(daily)
    total = sum(daily.values())
    n = len(days)
    want, run = [], 0
    for d in days:
        run += daily[d] * n - total
        want.append(
            (d, daily[d], run, int(abs(run) * 1_000_000 > thr * abs(total) * n))
        )
    assert got == want


_fun_steps = ["a", "b", "c"]
_fun_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.sampled_from(["a", "b", "c", "x"]),
        st.integers(0, 20),
    ),
    min_size=0, max_size=30,
)


@given(data=_fun_rows)
@SET
def test_funnel_steps_matches_python_greedy(spark, data):
    """Ordered funnel == the greedy earliest-qualifying scan in Python
    for ANY event log — ties on ts (strictly-after matters), repeated
    steps, and users who skip a step all resolve identically."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import funnel_steps

    df = (
        spark.createDataFrame(data, "u int, e string, ts int")
        if data
        else spark.range(0).selectExpr(
            "CAST(id AS INT) u", "CAST(NULL AS STRING) e", "CAST(id AS INT) ts"
        )
    )
    got = [
        (r.step, r.step_name, r.n_users)
        for r in funnel_steps(df, "u", "e", "ts", _fun_steps)
        .orderBy("step")
        .collect()
    ]

    by_user: dict[int, list[tuple[str, int]]] = {}
    for u, e, ts in data:
        by_user.setdefault(u, []).append((e, ts))
    reached = [0] * len(_fun_steps)
    for evs in by_user.values():
        t_prev = None
        for k, step in enumerate(_fun_steps):
            cand = [
                ts for e, ts in evs
                if e == step and (t_prev is None or ts > t_prev)
            ]
            if not cand:
                break
            t_prev = min(cand)
            reached[k] += 1
    want = [(k + 1, s, reached[k]) for k, s in enumerate(_fun_steps)]
    assert got == want


_ret_month = st.tuples(st.integers(2020, 2021), st.integers(1, 12))
_ret_rows = st.lists(
    st.tuples(st.integers(0, 4), _ret_month), min_size=1, max_size=30
)


@given(data=_ret_rows)
@SET
def test_retention_cohorts_matches_python(spark, data):
    """Cohort retention == the per-user min-month + calendar-offset
    census in Python for ANY activity log — year boundaries in the
    month index and duplicate activity months collapse identically."""
    import datetime

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        retention_cohorts,
    )

    rows = [(u, datetime.date(y, m, 1)) for u, (y, m) in data]
    df = spark.createDataFrame(rows, "u int, m date")
    got = {
        (r.cohort_month, r.month_offset): r.n_users
        for r in retention_cohorts(df, "u", "m").collect()
    }

    months: dict[int, set[datetime.date]] = {}
    for u, m in rows:
        months.setdefault(u, set()).add(m)
    want: dict[tuple[datetime.date, int], set[int]] = {}
    for u, ms in months.items():
        cm = min(ms)
        for m in ms:
            off = (m.year * 12 + m.month) - (cm.year * 12 + cm.month)
            want.setdefault((cm, off), set()).add(u)
    assert got == {k: len(v) for k, v in want.items()}


_dec_rows = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(-10_000, 10_000),
        st.integers(-50, 400),
    ),
    min_size=1, max_size=30,
)


@given(data=_dec_rows, half=st.integers(1, 30))
@SET
def test_decay_halving_matches_python(spark, data, half):
    """Integer half-life decay == the Python clamp-shift fold for ANY
    amounts (negative incl.), ages (future-dated incl.), and half-life
    — floor-division and arithmetic-shift semantics line up exactly."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        decay_halving_agg,
    )

    df = spark.createDataFrame(data, "g int, cents long, age long")
    got = {
        r.g: (r.n_rows, r.raw_cents, r.decayed_cents)
        for r in df.transform(
            decay_halving_agg(["g"], F.col("cents"), F.col("age"), half)
        ).collect()
    }

    want: dict[int, list[int]] = {}
    for g, cents, age in data:
        h = min(max(age // half, 0), 62)
        acc = want.setdefault(g, [0, 0, 0])
        acc[0] += 1
        acc[1] += cents
        acc[2] += cents >> h
    assert got == {g: tuple(v) for g, v in want.items()}


@st.composite
def _lerp_series(draw):
    n_keys = draw(st.integers(1, 3))
    out = []
    for k in range(n_keys):
        days = draw(
            st.lists(st.integers(0, 40), min_size=1, max_size=6, unique=True)
        )
        for d in days:
            out.append((k, d, draw(st.integers(-1000, 1000))))
    return out


@given(data=_lerp_series())
@SET
def test_gap_fill_lerp_matches_python(spark, data):
    """Linear gap interpolation == the per-segment floored lerp in
    Python for ANY series (downward slopes, negative values) — the
    pmod-adjusted div reproduces Python's floor //, day by day."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    df = spark.createDataFrame(data, "k int, d long, v long")
    got = sorted(
        (r.k, r.day, r.value, r.is_obs)
        for r in gap_fill_interpolate(df, ["k"], "d", "v").collect()
    )

    series: dict[int, dict[int, int]] = {}
    for k, d, v in data:
        series.setdefault(k, {})[d] = v
    want = []
    for k, obs in series.items():
        pts = sorted(obs.items())
        for (d0, v0), (d1, v1) in zip(pts, pts[1:]):
            for day in range(d0, d1):
                want.append(
                    (k, day, v0 + (v1 - v0) * (day - d0) // (d1 - d0),
                     int(day == d0))
                )
        want.append((k, pts[-1][0], pts[-1][1], 1))
    assert got == sorted(want)


@st.composite
def _ohlc_rows(draw):
    out = []
    for g in range(draw(st.integers(1, 3))):
        n = draw(st.integers(1, 10))
        orders = draw(
            st.lists(st.integers(0, 20), min_size=n, max_size=n)
        )
        for i, o in enumerate(orders):
            out.append((g, o, i, draw(st.integers(-1000, 1000))))
    return out


@given(data=_ohlc_rows())
@SET
def test_ohlc_endpoints_match_python(spark, data):
    """OHLC endpoint aggregation == first/last under the composite
    (order, tiebreak) sort in Python for ANY series — min_by/max_by
    over the struct key picks the same rows a full sort would."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import ohlc_agg

    df = spark.createDataFrame(data, "g int, o long, t long, v long")
    got = {
        r.g: (r.n, r.open_v, r.high_v, r.low_v, r.close_v)
        for r in ohlc_agg(df, ["g"], "o", "t", "v").collect()
    }

    groups: dict[int, list[tuple[int, int, int]]] = {}
    for g, o, t, v in data:
        groups.setdefault(g, []).append((o, t, v))
    want = {}
    for g, rows in groups.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        want[g] = (len(rows), rows[0][2], max(vals), min(vals), rows[-1][2])
    assert got == want


_bfs_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=0, max_size=25,
)
_bfs_srcs = st.lists(st.integers(0, 8), min_size=1, max_size=3)


@given(edges=_bfs_edges, srcs=_bfs_srcs, hops=st.integers(1, 4))
@SET
def test_bfs_hops_matches_python(spark, edges, srcs, hops):
    """Frontier BFS == the layered multi-source scan in Python for ANY
    directed edge list, source set, and hop budget — minimum distances
    and the absent-unreached contract both replicate."""
    from dwh_etl_ods_spark_jobs_spark.graph import bfs_hops

    e = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.range(0).selectExpr("id src", "id dst")
    )
    s = spark.createDataFrame([(x,) for x in srcs], "node long")
    got = {(r.node, r.hops) for r in bfs_hops(e, s, max_hops=hops).collect()}

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {x: 0 for x in srcs}
    frontier = set(srcs)
    for h in range(1, hops + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= dist.keys()
        for v in nxt:
            dist[v] = h
        frontier = nxt
    assert got == set(dist.items())


@st.composite
def _sym_edges(draw):
    pairs = draw(
        st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
                lambda p: p[0] != p[1]
            ),
            min_size=0, max_size=20,
        )
    )
    und = {tuple(sorted(p)) for p in pairs}
    return sorted({(a, b) for a, b in und} | {(b, a) for a, b in und})


@given(edges=_sym_edges(), k=st.integers(1, 4))
@SET
def test_k_core_matches_python_peel(spark, edges, k):
    """Iterative k-core peeling == the sequential delete-recompute loop
    in Python for ANY symmetric graph and k — survivors and their
    within-core degrees agree at the fixpoint."""
    from dwh_etl_ods_spark_jobs_spark.graph import k_core

    e = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.range(0).selectExpr("id src", "id dst")
    )
    got = {(r.node, r.degree) for r in k_core(e, k).collect()}

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    core = set(adj)
    while True:
        drop = {v for v in core if len(adj[v] & core) < k}
        if not drop:
            break
        core -= drop
    assert got == {(v, len(adj[v] & core)) for v in core}


@given(edges=_sym_edges(), rounds=st.integers(1, 4))
@SET
def test_label_propagation_matches_python(spark, edges, rounds):
    """Deterministic synchronous LPA == the Python round-by-round
    majority fold (count desc, label asc tie-break) for ANY symmetric
    graph and round count — the struct-argmax and the explicit sort
    pick identical labels every round."""
    from dwh_etl_ods_spark_jobs_spark.graph import label_propagation

    e = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.range(0).selectExpr("id src", "id dst")
    )
    got = {
        (r.node, r.label)
        for r in label_propagation(e, rounds=rounds).collect()
    }

    nodes = {a for a, _ in edges} | {b for _, b in edges}
    labels = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            counts: dict[int, int] = {}
            for a, b in edges:
                if a == v:
                    lbl = labels[b]
                    counts[lbl] = counts.get(lbl, 0) + 1
            if counts:
                new[v] = min(counts, key=lambda l: (-counts[l], l))
            else:
                new[v] = labels[v]
        labels = new
    assert got == set(labels.items())


@st.composite
def _pps_rows(draw):
    n = draw(st.integers(1, 20))
    ws = draw(
        st.lists(st.integers(0, 50), min_size=n, max_size=n).filter(
            lambda w: sum(w) > 0
        )
    )
    return [(i, w) for i, w in enumerate(ws)]


@given(data=_pps_rows(), n_picks=st.integers(1, 8))
@SET
def test_pps_systematic_matches_python(spark, data, n_picks):
    """Weight-proportional systematic sampling == the Python cumulative
    stride walk for ANY weights (zeros incl.) and pick count — exactly
    n picks distribute, heavy rows take multiplicity, zero-weight rows
    never appear."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        systematic_weighted_sample,
    )

    df = spark.createDataFrame(data, "id long, w long")
    got = {
        r.id: r.n_picks
        for r in df.transform(
            systematic_weighted_sample(["id"], "w", n_picks)
        ).collect()
    }

    total = sum(w for _, w in data)
    want = {}
    cw = 0
    for i, w in sorted(data):
        cw += w
        p = (cw * n_picks) // total - ((cw - w) * n_picks) // total
        if p > 0:
            want[i] = p
    assert got == want
    assert sum(want.values()) == n_picks


@st.composite
def _qn_frames(draw):
    base = draw(
        st.lists(st.integers(-50, 50), min_size=1, max_size=15)
    )
    ref = draw(
        st.lists(st.integers(-50, 50), min_size=1, max_size=15)
    )
    return (
        [(i, v) for i, v in enumerate(base)],
        [(i, v) for i, v in enumerate(ref)],
    )


@given(frames=_qn_frames())
@SET
def test_quantile_normalize_matches_python(spark, frames):
    """Quantile normalization == the Python rank-index mapping for ANY
    base/reference sizes (n != ref_n incl.) — the floored index join
    lands every row on the same reference value as the explicit sort."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_normalize

    base_rows, ref_rows = frames
    base = spark.createDataFrame(base_rows, "id long, v long")
    ref = spark.createDataFrame(ref_rows, "rid long, rv long")
    got = {
        r.id: r.norm
        for r in base.transform(
            quantile_normalize(["v", "id"], ref, ["rv", "rid"])
        ).collect()
    }

    n, rn = len(base_rows), len(ref_rows)
    ref_sorted = sorted((rv, rid) for rid, rv in ref_rows)
    want = {}
    for r, (_, vid) in enumerate(sorted((v, i) for i, v in base_rows)):
        want[vid] = ref_sorted[r * rn // n][0]
    assert got == want


_te_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1)), min_size=1, max_size=30
)


@given(data=_te_rows, m=st.integers(0, 10))
@SET
def test_target_encoding_matches_python(spark, data, m):
    """m-estimate target encoding == the Python integer-micro formula
    for ANY categories, labels, and smoothing — the floored global mean
    and the smoothed blend replicate bit-for-bit."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import target_encoding

    df = spark.createDataFrame(data, "c int, y int")
    got = {
        r.category: (r.n, r.sum_y, r.enc_micro)
        for r in target_encoding(df, "c", F.col("y"), m).collect()
    }

    per: dict[int, list[int]] = {}
    for c, y in data:
        acc = per.setdefault(c, [0, 0])
        acc[0] += 1
        acc[1] += y
    gm = sum(v[1] for v in per.values()) * 1_000_000 // len(data)
    want = {
        c: (n, sy, (sy * 1_000_000 + m * gm) // (n + m))
        for c, (n, sy) in per.items()
    }
    assert got == want


@st.composite
def _rfm_rows(draw):
    n_ent = draw(st.integers(1, 6))
    out = []
    for e in range(n_ent):
        for _ in range(draw(st.integers(1, 4))):
            out.append(
                (e, draw(st.integers(0, 60)), draw(st.integers(0, 10_000)))
            )
    return out


@given(data=_rfm_rows(), n_q=st.integers(2, 5))
@SET
def test_rfm_quintiles_match_python(spark, data, n_q):
    """RFM quantile features == the Python rank-cut build for ANY
    transaction log and bin count — data-derived anchor, per-entity
    rollup, and all three equal-frequency cuts replicate exactly."""
    import datetime

    from dwh_etl_ods_spark_jobs_spark.operators.stats import rfm_quintiles

    epoch = datetime.date(2024, 1, 1)
    rows = [
        (e, epoch + datetime.timedelta(days=d), c) for e, d, c in data
    ]
    df = spark.createDataFrame(rows, "e int, d date, c long")
    got = {
        r.entity: (r.recency_days, r.n_orders, r.cents, r.r_q, r.f_q, r.m_q)
        for r in rfm_quintiles(df, "e", "d", F.col("c"), n_q=n_q).collect()
    }

    per: dict[int, list[int]] = {}
    for e, d, c in data:
        acc = per.setdefault(e, [0, 0, 0])
        acc[0] = max(acc[0], d)
        acc[1] += 1
        acc[2] += c
    anchor = max(v[0] for v in per.values())
    feats = {
        e: (anchor - last, n, cents) for e, (last, n, cents) in per.items()
    }
    n = len(feats)

    def cut(key):
        order = sorted(feats, key=lambda e: (feats[e][key], e))
        return {e: r * n_q // n for r, e in enumerate(order)}

    rb, fb, mb = cut(0), cut(1), cut(2)
    want = {
        e: (rec, cnt, cents, n_q - rb[e], fb[e] + 1, mb[e] + 1)
        for e, (rec, cnt, cents) in feats.items()
    }
    assert got == want


_hll_vals = st.lists(st.integers(0, 500), min_size=1, max_size=40)


@given(vals=_hll_vals)
@SET
def test_hll_register_state_matches_python(spark, vals):
    """HLL register fold == the Python md5 replication (60-bit hash,
    low-p register index, bin()-length rank, exact BIGINT term sum) for
    ANY values; the double estimate agrees to the 3-decimal round (the
    documented ulp-absorption boundary)."""
    import math

    import hashlib

    from dwh_etl_ods_spark_jobs_spark.sketches import (
        HLL_M,
        HLL_P,
        _HLL_EMPTY_TERM,
        _HLL_NUM,
        _HLL_RHO_MAX,
        _HLL_SCALE_POW,
        hll_distinct,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = df.transform(hll_distinct(["g"], "v")).collect()[0]

    regs: dict[int, int] = {}
    for v in set(vals):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        w = h >> HLL_P
        rho = _HLL_RHO_MAX - (w.bit_length() if w else 0)
        reg = h % HLL_M
        regs[reg] = max(regs.get(reg, 0), rho)
    empty = HLL_M - len(regs)
    s = sum(1 << (_HLL_SCALE_POW - m) for m in regs.values())
    s += empty * _HLL_EMPTY_TERM
    est = _HLL_NUM / float(s)
    if est <= 2.5 * HLL_M and empty > 0:
        est = float(HLL_M) * math.log(HLL_M / float(empty))
    assert r.empty_registers == empty
    assert abs(r.est_distinct - round(est, 3)) <= 0.001


_ben_vals = st.lists(
    st.one_of(st.none(), st.integers(-100, 10**6)), min_size=1, max_size=40
).filter(lambda vs: any(v is not None and v > 0 for v in vs))


@given(vals=_ben_vals)
@SET
def test_benford_audit_matches_python(spark, vals):
    """Benford first-digit audit == the Python digit census for ANY
    values — non-positive and NULL rows excluded, integer ppm shares
    and deviations exact."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        BENFORD_PPM,
        benford_first_digit_audit,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.digit: (r.n, r.share_ppm, r.benford_ppm, r.dev_ppm)
        for r in benford_first_digit_audit(df, "v").collect()
    }

    pos = [v for v in vals if v is not None and v > 0]
    counts: dict[int, int] = {}
    for v in pos:
        d = int(str(v)[0])
        counts[d] = counts.get(d, 0) + 1
    t = len(pos)
    want = {}
    for d, n in counts.items():
        share = n * 1_000_000 // t
        want[d] = (n, share, BENFORD_PPM[d], abs(share - BENFORD_PPM[d]))
    assert got == want


_hdr_vals = st.lists(
    st.one_of(
        st.integers(0, 63),
        st.integers(0, 10**6),
        st.integers(0, 2**40),
    ),
    min_size=1,
    max_size=40,
)


def _hdr_bucket(v: int) -> int:
    from dwh_etl_ods_spark_jobs_spark.sketches import QH_SIG_BITS

    s = max(v.bit_length() - QH_SIG_BITS, 0)
    return (v >> s) << s


@given(vals=_hdr_vals)
@SET
def test_hdr_histogram_quantiles_calibrate_match_python(spark, vals):
    """HDR sketch pipeline == the Python integer replication for ANY
    non-negative values across the full 40-bit range: bucket census,
    ceil-threshold lower quantiles, and the strictly-below percentile
    calibration are all integer-exact."""
    from dwh_etl_ods_spark_jobs_spark.sketches import (
        hdr_histogram,
        hdr_percentile_calibrate,
        hdr_quantiles,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    hist = df.transform(hdr_histogram(["g"], "v"))
    got_hist = {r.bucket_lo: r.n for r in hist.collect()}

    want_hist: dict[int, int] = {}
    for v in vals:
        b = _hdr_bucket(v)
        want_hist[b] = want_hist.get(b, 0) + 1
    assert got_hist == want_hist

    qs = [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)]
    got_q = {
        r.quantile: r.approx_value
        for r in hdr_quantiles(hist, ["g"], qs).collect()
    }
    n = len(vals)
    buckets = sorted(want_hist)
    want_q = {}
    for lbl, num, den in qs:
        thr = (n * num + den - 1) // den
        cum = 0
        for b in buckets:
            cum += want_hist[b]
            if cum >= thr:
                want_q[lbl] = b
                break
    assert got_q == want_q

    got_pct = sorted(
        (r.v, r.pct_micro)
        for r in hdr_percentile_calibrate(df, ["g"], "v").collect()
    )
    want_pct = sorted(
        (
            v,
            sum(c for b, c in want_hist.items() if b < _hdr_bucket(v))
            * 1_000_000
            // n,
        )
        for v in vals
    )
    assert got_pct == want_pct


_srm_grids = st.lists(
    st.lists(st.integers(1, 10**6), min_size=1, max_size=5),
    min_size=1,
    max_size=3,
)


@given(grids=_srm_grids, thr=st.integers(0, 20_000_000))
@SET
def test_srm_from_counts_matches_python(spark, grids, thr):
    """SRM chi² from an assignment-count grid == the Python exact-integer
    fold ``Σ(obs·k − n)² · 1e6 div (k·n)`` for ANY counts and threshold
    (single-variant experiments emit chi2 0, never a division artifact)."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import srm_from_counts

    rows = [
        (f"e{i}", f"v{j}", c)
        for i, grid in enumerate(grids)
        for j, c in enumerate(grid)
    ]
    counts = spark.createDataFrame(
        rows, "experiment string, variant string, n_obs long"
    )
    got = {
        r.experiment: (r.n, r.n_variants, r.chi2_micro, r.srm_flag)
        for r in srm_from_counts(counts, thr).collect()
    }

    want = {}
    for i, grid in enumerate(grids):
        n, k = sum(grid), len(grid)
        sq = sum((obs * k - n) ** 2 for obs in grid)
        chi2 = sq * 1_000_000 // (k * n)
        want[f"e{i}"] = (n, k, chi2, int(chi2 > thr))
    assert got == want


_pr_edges = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=25
)


@given(edges=_pr_edges, iters=st.integers(1, 4))
@SET
def test_pagerank_matches_python_power_iteration(spark, edges, iters):
    """Exact-integer PageRank == the Python power iteration for ANY
    directed multigraph (self-loops and duplicate edges honored, the
    src-set node universe, BIGINT truncating divisions replayed
    verbatim) at ANY shallow iteration count."""
    from dwh_etl_ods_spark_jobs_spark.graph import (
        PR_DAMP_PCT,
        PR_MICRO,
        pagerank,
    )

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.rank_micro for r in pagerank(df, iterations=iters).collect()}

    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted(deg)
    base = (PR_MICRO * (100 - PR_DAMP_PCT)) // 100
    rank = {n: PR_MICRO for n in nodes}
    for _ in range(iters):
        contrib: dict[int, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // deg[s]
        rank = {
            n: base + (PR_DAMP_PCT * contrib.get(n, 0)) // 100 for n in nodes
        }
    assert got == rank


_tri_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@given(raw=_tri_edges)
@SET
def test_triangle_census_matches_bruteforce(spark, raw):
    """Degree-ordered triangle census == the brute-force triple scan for
    ANY undirected graph — every triangle found exactly once, per-node
    participation exact, nodes outside any triangle absent."""
    from itertools import combinations

    from dwh_etl_ods_spark_jobs_spark.graph import triangle_census

    eset = sorted({(min(a, b), max(a, b)) for a, b in raw})
    df = spark.createDataFrame(eset, "u int, v int")
    got = {r.node: r.n_triangles for r in triangle_census(df).collect()}

    es = set(eset)
    nodes = sorted({n for e in eset for n in e})
    want: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


_cm_keys = st.lists(st.text("abcde", min_size=1, max_size=3), min_size=1, max_size=30)


@given(keys=_cm_keys, probes=st.lists(st.text("abcdef", min_size=1, max_size=3), min_size=1, max_size=8))
@SET
def test_countmin_sketch_matches_python(spark, keys, probes):
    """Count-min build + probe == the Python md5 replication for ANY key
    stream: the (r, c) grid is cell-exact, and every probe estimate is
    the min over its DEPTH cells (missing cell = 0), always ≥ truth."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.sketches import (
        CM_DEPTH,
        CM_WIDTH,
        countmin_counts,
        countmin_estimate,
    )

    def cell(r: int, k: str) -> int:
        return int(hashlib.md5(f"cm{r}:{k}".encode()).hexdigest()[:15], 16) % CM_WIDTH

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    sketch = countmin_counts(df, "k")
    got_grid = {(r.r, r.c): r.cnt for r in sketch.collect()}
    want_grid: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(CM_DEPTH):
            want_grid[(r, cell(r, k))] = want_grid.get((r, cell(r, k)), 0) + 1
    assert got_grid == want_grid

    kdf = spark.createDataFrame([(p,) for p in set(probes)], "k string")
    got_est = {r.k: r.cm_estimate for r in countmin_estimate(sketch, kdf, "k").collect()}
    want_est = {
        p: min(want_grid.get((r, cell(r, p)), 0) for r in range(CM_DEPTH))
        for p in set(probes)
    }
    assert got_est == want_est
    for p in set(probes):
        assert got_est[p] >= sum(1 for k in keys if k == p)


_boot_rows = st.lists(st.integers(0, 10**6), min_size=1, max_size=30)


@given(vals=_boot_rows, n_rep=st.integers(1, 12))
@SET
def test_poisson_bootstrap_matches_python(spark, vals, n_rep):
    """Deterministic Poisson bootstrap == the Python md5-lane replication
    for ANY values and replicate count: per-replicate weights, floored
    means, empty-replicate drop, and the exact percentile picks all
    replay bit-for-bit."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.operators.stats import (
        BOOT_HI_IDX_PPM,
        BOOT_LO_IDX_PPM,
        BOOT_POISSON_CDF_2_30,
        _BOOT_LANE_MOD,
        _BOOT_LANES,
        poisson_bootstrap_ci,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, v long")
    got = poisson_bootstrap_ci(df, "id", "v", n_replicates=n_rep).collect()[0]

    def weight(u: int) -> int:
        return next((k for k, t in enumerate(BOOT_POISSON_CDF_2_30) if u < t), 6)

    reps = []
    for b in range(n_rep):
        blk, lane = b // _BOOT_LANES, b % _BOOT_LANES
        s = n = 0
        for i, v in rows:
            hx = hashlib.md5(f"{i}:{blk}".encode()).hexdigest()
            h = int(hx[:15], 16) if lane < 2 else int(hx[16:31], 16)
            u = h // _BOOT_LANE_MOD if lane % 2 == 0 else h % _BOOT_LANE_MOD
            w = weight(u)
            s += w * v
            n += w
        if n > 0:
            reps.append((s // n, b))
    reps.sort()
    cnt = len(reps)
    assert got.n_replicates == cnt
    if cnt:
        lo = reps[cnt * BOOT_LO_IDX_PPM // 1_000_000][0]
        hi = reps[cnt * BOOT_HI_IDX_PPM // 1_000_000][0]
        assert (got.mean_lo, got.mean_hi) == (lo, hi)
    assert got.mean_all == sum(vals) // len(vals)


_drift_vals = st.lists(st.integers(0, 2**20), min_size=1, max_size=30)


@given(old=_drift_vals, new=_drift_vals)
@SET
def test_hdr_drift_triptych_matches_python(spark, old, new):
    """TVD, Wasserstein-1, and KS drift over the shared HDR bucketing ==
    the Python integer replication for ANY two samples: ppm shares,
    cumulative-CDF gaps weighted by bucket span, and the max CDF gap are
    all integer-exact."""
    from dwh_etl_ods_spark_jobs_spark.sketches import (
        hdr_distribution_drift,
        hdr_ks_drift,
        hdr_wasserstein_drift,
    )

    o = spark.createDataFrame([(v,) for v in old], "v long")
    n = spark.createDataFrame([(v,) for v in new], "v long")
    tvd = hdr_distribution_drift(o, n, "v").collect()[0]
    w1 = hdr_wasserstein_drift(o, n, "v").collect()[0]
    ks = hdr_ks_drift(o, n, "v").collect()[0]

    ho: dict[int, int] = {}
    hn: dict[int, int] = {}
    for v in old:
        ho[_hdr_bucket(v)] = ho.get(_hdr_bucket(v), 0) + 1
    for v in new:
        hn[_hdr_bucket(v)] = hn.get(_hdr_bucket(v), 0) + 1
    buckets = sorted(set(ho) | set(hn))
    t_o, t_n = len(old), len(new)

    want_tvd = (
        sum(
            abs(hn.get(b, 0) * 1_000_000 // t_n - ho.get(b, 0) * 1_000_000 // t_o)
            for b in buckets
        )
        // 2
    )
    cum_o = cum_n = 0
    cdf = []
    for b in buckets:
        cum_o += ho.get(b, 0)
        cum_n += hn.get(b, 0)
        cdf.append((b, cum_o * 1_000_000 // t_o, cum_n * 1_000_000 // t_n))
    want_w1 = sum(
        abs(co - cn) * (cdf[i + 1][0] - b) for i, (b, co, cn) in enumerate(cdf[:-1])
    )
    want_ks = max(abs(co - cn) for _, co, cn in cdf)

    for r in (tvd, w1, ks):
        assert (r.n_old, r.n_new, r.n_buckets) == (t_o, t_n, len(buckets))
    assert tvd.tvd_ppm == want_tvd
    assert w1.emd_ppm_units == want_w1
    assert ks.ks_ppm == want_ks


_doc_words = st.lists(
    st.lists(st.text("abc", min_size=1, max_size=2), min_size=0, max_size=8),
    min_size=1,
    max_size=8,
)


def _round_half_up(x: float, scale: int) -> float:
    # Spark's round(double, n) rounds the SHORTEST-STRING decimal repr
    # (java BigDecimal.valueOf == Double.toString), not the exact binary
    # expansion — Decimal(repr(x)) mirrors that; Decimal(x) would tip
    # half-way cases the other way.
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-scale) if scale else Decimal(1)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


@given(docs=_doc_words)
@SET
def test_tfidf_top_terms_matches_python(spark, docs):
    """tf·idf top-k == the Python replication for ANY corpus: postings,
    document frequency, the single-ln score under Spark's HALF_UP
    6-decimal round, and the (score desc, term) tie-broken cut."""
    import math

    from dwh_etl_ods_spark_jobs_spark.curation import tfidf_top_terms

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r.id, r.term): (r.tf, r.df, r.score, r.rank)
        for r in df.transform(tfidf_top_terms("id", "text", k=3)).collect()
    }

    toks = {i: t.split(" ") for i, t in rows}
    tf: dict[tuple[int, str], int] = {}
    for i, ts in toks.items():
        for w in ts:
            tf[(i, w)] = tf.get((i, w), 0) + 1
    dfreq: dict[str, int] = {}
    for i, w in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    n_docs = len(docs)
    want = {}
    for i in toks:
        scored = sorted(
            (
                (-_round_half_up(c * math.log(n_docs / dfreq[w]), 6), w, c)
                for (d, w), c in tf.items()
                if d == i
            ),
        )
        for rank, (neg_s, w, c) in enumerate(scored[:3], start=1):
            want[(i, w)] = (c, dfreq[w], -neg_s, rank)
    assert got == want


@given(docs=_doc_words)
@SET
def test_bigram_lm_score_matches_python(spark, docs):
    """Corpus-trained bigram LM score == the Python replication for ANY
    corpus: add-one smoothing over the vocab, per-bigram −ln P rounded
    to integer micronats BEFORE the sum, and the final 6-decimal mean —
    short documents report (0, 0.0)."""
    import math

    from dwh_etl_ods_spark_jobs_spark.curation import bigram_lm_score

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: (r.n_bigrams, r.avg_neg_logprob)
        for r in df.transform(bigram_lm_score("id", "text")).collect()
    }

    toks = {i: t.split(" ") for i, t in rows}
    uni: dict[str, int] = {}
    c12: dict[str, int] = {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c12[f"{a} {b}"] = c12.get(f"{a} {b}", 0) + 1
    vocab = len(uni)
    nlp = {
        bg: int(
            _round_half_up(-math.log((c + 1) / (uni[bg.split(" ")[0]] + vocab)) * 1e6, 0)
        )
        for bg, c in c12.items()
    }
    want = {}
    for i, ts in toks.items():
        bgs = [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        if not bgs:
            want[i] = (0, 0.0)
        else:
            s = sum(nlp[bg] for bg in bgs)
            want[i] = (len(bgs), _round_half_up(s / len(bgs) / 1e6, 6))
    assert got == want


@given(docs=_doc_words, max_df=st.one_of(st.none(), st.integers(1, 6)))
@SET
def test_token_pmi_matches_python(spark, docs, max_df):
    """Document-co-occurrence PMI == the Python replication for ANY
    corpus and DF window: presence-based counts, min_df/max_df vocab
    gates, and the fixed IEEE ln fold rounded to micro-units."""
    import math

    from dwh_etl_ods_spark_jobs_spark.curation import token_pmi

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r.w1, r.w2): (r.n_ab, r.n_a, r.n_b, r.pmi_micro)
        for r in token_pmi(df, "text", "id", min_df=1, max_df=max_df).collect()
    }

    doc_toks = [set(t.split(" ")) - {""} for _, t in rows]
    dfreq: dict[str, int] = {}
    for ts in doc_toks:
        for w in ts:
            dfreq[w] = dfreq.get(w, 0) + 1
    kept = {
        w
        for w, c in dfreq.items()
        if c >= 1 and (max_df is None or c <= max_df)
    }
    n_docs = len(rows)
    pair_n: dict[tuple[str, str], int] = {}
    for ts in doc_toks:
        ws = sorted(ts & kept)
        for i, a in enumerate(ws):
            for b in ws[i + 1 :]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    want = {
        (a, b): (
            n_ab,
            dfreq[a],
            dfreq[b],
            int(
                _round_half_up(
                    math.log(
                        (float(n_ab) * float(n_docs))
                        / (float(dfreq[a]) * float(dfreq[b]))
                    )
                    * 1e6,
                    0,
                )
            ),
        )
        for (a, b), n_ab in pair_n.items()
    }
    assert got == want


@given(edges=_pr_edges, k=st.integers(1, 5), seed=st.text("xyz", min_size=1, max_size=3))
@SET
def test_negative_edge_samples_matches_python(spark, edges, k, seed):
    """Seed-keyed negative sampling == the Python md5 replication for
    ANY graph, draw count, and seed: the dense destination index, the
    modular draws, and the self-loop / true-edge drops replay exactly."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.graph import negative_edge_samples

    df = spark.createDataFrame(edges, "src int, dst int")
    got = sorted(
        (r.src, r.dst, r.draw)
        for r in negative_edge_samples(df, "src", "dst", k=k, seed=seed).collect()
    )

    domain = sorted({d for _, d in edges})
    true = set(edges)
    want = []
    for s in sorted({s for s, _ in edges}):
        for draw in range(k):
            h = int(
                hashlib.md5(f"{seed}:{s}:{draw}".encode()).hexdigest()[:15], 16
            )
            d = domain[h % len(domain)]
            if d != s and (s, d) not in true:
                want.append((s, d, draw))
    assert got == sorted(want)


@given(edges=_pr_edges, iters=st.integers(1, 4), seed_nodes=st.sets(st.integers(0, 6), min_size=1, max_size=3))
@SET
def test_personalized_pagerank_matches_python(spark, edges, iters, seed_nodes):
    """Exact-integer personalized PageRank == the Python random-walk-
    with-restart replication for ANY graph and seed cohort — restart
    mass lands only on seeds, non-universe seeds ignored."""
    from dwh_etl_ods_spark_jobs_spark.graph import (
        PR_DAMP_PCT,
        PR_MICRO,
        personalized_pagerank,
    )

    df = spark.createDataFrame(edges, "src int, dst int")
    sdf = spark.createDataFrame([(s,) for s in seed_nodes], "node int")
    got = {
        r.node: r.rank_micro
        for r in personalized_pagerank(df, sdf, iterations=iters).collect()
    }

    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted(deg)
    base = (PR_MICRO * (100 - PR_DAMP_PCT)) // 100
    is_seed = {n: 1 if n in seed_nodes else 0 for n in nodes}
    rank = {n: is_seed[n] * PR_MICRO for n in nodes}
    for _ in range(iters):
        contrib: dict[int, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // deg[s]
        rank = {
            n: is_seed[n] * base + (PR_DAMP_PCT * contrib.get(n, 0)) // 100
            for n in nodes
        }
    assert got == rank


_vec3 = st.lists(
    st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
    min_size=3,
    max_size=3,
)


@given(vecs=st.lists(_vec3, min_size=1, max_size=10), seed=st.text("pq", min_size=1, max_size=2))
@SET
def test_jl_project_matches_python(spark, vecs, seed):
    """JL ±1 projection == the Python replication for ANY vectors and
    seed: per-component micro quantization under Spark's HALF_UP round,
    then the exact signed integer fold per output dim."""
    from dwh_etl_ods_spark_jobs_spark.similarity import jl_project, jl_signs

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, vec array<double>")
    out_dim = 4
    got = {
        r.id: tuple(r[f"p{k}"] for k in range(out_dim))
        for r in jl_project(df, "id", "vec", in_dim=3, out_dim=out_dim, seed=seed).collect()
    }

    signs = jl_signs(out_dim, 3, seed)
    want = {}
    for i, v in rows:
        micro = [int(_round_half_up(x * 1000000.0, 0)) for x in v]
        want[i] = tuple(
            sum(s * m for s, m in zip(signs[k], micro)) for k in range(out_dim)
        )
    assert got == want


@given(
    pts=st.lists(st.tuples(_vec3, st.integers(0, 3)), min_size=1, max_size=10),
)
@SET
def test_kmeans_step_quantized_matches_python(spark, pts):
    """One quantized Lloyd iteration == the Python replication for ANY
    points and labels: floored integer centroid means, exact L2²
    distances, and nearest-centroid reassignment with ties to the
    smaller label."""
    from dwh_etl_ods_spark_jobs_spark.similarity import kmeans_step_quantized

    rows = [(i, [float(x) for x in v], l) for i, (v, l) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, vec array<double>, lbl int")
    got = {
        r.id: (r.label, r.new_label, r.dist_sq)
        for r in kmeans_step_quantized(df, "id", "vec", "lbl", dim=3).collect()
    }

    q = {i: [int(_round_half_up(x * 1000.0, 0)) for x in v] for i, v, _ in rows}
    by_lbl: dict[int, list[int]] = {}
    for i, _, l in rows:
        by_lbl.setdefault(l, []).append(i)
    cents = {
        l: [
            sum(q[i][p] for i in ids) // len(ids)
            for p in range(3)
        ]
        for l, ids in by_lbl.items()
    }
    want = {}
    for i, _, l in rows:
        best = min(
            (sum((a - b) ** 2 for a, b in zip(q[i], cv)), cl)
            for cl, cv in cents.items()
        )
        want[i] = (l, best[1], best[0])
    assert got == want


_dd_texts = st.lists(
    st.text("ab c.X2", min_size=0, max_size=20), min_size=1, max_size=8
)


def _py_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _py_shingles(toks: list[str], w: int = 3) -> list[str]:
    out = []
    for i in range(max(len(toks) - (w - 1), 1)):
        s = " ".join(toks[i : i + w])
        if s not in out:
            out.append(s)
    return out


@given(texts=_dd_texts)
@SET
def test_minhash_signatures_match_python(spark, texts):
    """MinHash signatures == the Python md5+xor replication for ANY
    corpus: tokenizer, distinct shingles (including the short-document
    whole-text shingle), and every per-salt min."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.dedup import (
        MINHASH_K,
        _minhash_salts,
        minhash_signatures,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.doc_id: list(r.sig) for r in minhash_signatures(df, "text", "id").collect()}

    salts = _minhash_salts(MINHASH_K)
    want = {}
    for i, t in rows:
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in _py_shingles(_py_tokens(t))
        ]
        want[i] = [min(h ^ s for h in hs) for s in salts]
    assert got == want


@given(texts=_dd_texts)
@SET
def test_simhash_signatures_and_pairs_match_python(spark, texts):
    """Frequency-weighted SimHash == the Python bit-vote replication for
    ANY corpus (token-less documents absent), and the pigeonhole banded
    pair join finds EXACTLY the brute-force hamming ≤ 3 pairs."""
    import hashlib
    from itertools import combinations

    from dwh_etl_ods_spark_jobs_spark.dedup import (
        SIMHASH_BITS,
        simhash_near_pairs,
        simhash_signatures,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    sigs = simhash_signatures(df, "text", "id")
    got = {r.doc_id: r.simhash for r in sigs.collect()}

    want = {}
    for i, t in rows:
        toks = _py_tokens(t)
        if not toks:
            continue
        hs = [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in toks]
        sig = 0
        for b in range(SIMHASH_BITS):
            if 2 * sum((h >> b) & 1 for h in hs) > len(hs):
                sig |= 1 << b
        want[i] = sig
    assert got == want

    got_pairs = {
        (r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(sigs).collect()
    }
    want_pairs = {
        (a, b): bin(want[a] ^ want[b]).count("1")
        for a, b in combinations(sorted(want), 2)
        if bin(want[a] ^ want[b]).count("1") <= 3
    }
    assert got_pairs == want_pairs


_pq_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),
        st.one_of(st.none(), st.integers(0, 2)),
        st.one_of(st.none(), st.integers(0, 3)),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_pq_rows, k=st.integers(1, 5))
@SET
def test_k_anonymity_census_matches_python(spark, rows, k):
    """k-anonymity census == the Python equivalence-class fold for ANY
    quasi-identifier data (NULLs group as values) and threshold."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import k_anonymity_census

    df = spark.createDataFrame(rows, "q1 int, q2 int, s int")
    got = {
        r.class_size: (r.n_classes, r.n_rows, r.at_risk)
        for r in k_anonymity_census(df, ["q1", "q2"], k).collect()
    }

    classes: dict[tuple, int] = {}
    for q1, q2, _ in rows:
        classes[(q1, q2)] = classes.get((q1, q2), 0) + 1
    by_size: dict[int, int] = {}
    for sz in classes.values():
        by_size[sz] = by_size.get(sz, 0) + 1
    want = {
        sz: (n, sz * n, int(sz < k)) for sz, n in by_size.items()
    }
    assert got == want


@given(rows=_pq_rows, l_min=st.integers(1, 4))
@SET
def test_l_diversity_census_matches_python(spark, rows, l_min):
    """l-diversity census == the Python fold for ANY data and floor:
    diversity counts DISTINCT NON-NULL sensitive values per class
    (all-NULL class = 0), rows roll up by observed diversity."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import l_diversity_census

    df = spark.createDataFrame(rows, "q1 int, q2 int, s int")
    got = {
        r.diversity: (r.n_classes, r.n_rows, r.at_risk)
        for r in l_diversity_census(df, ["q1", "q2"], "s", l_min).collect()
    }

    cls: dict[tuple, list] = {}
    for q1, q2, s in rows:
        cls.setdefault((q1, q2), []).append(s)
    want: dict[int, tuple] = {}
    for vals in cls.values():
        d = len({v for v in vals if v is not None})
        n_c, n_r, _ = want.get(d, (0, 0, 0))
        want[d] = (n_c + 1, n_r + len(vals), int(d < l_min))
    assert got == want


@given(rows=_pq_rows)
@SET
def test_fd_violations_matches_python(spark, rows):
    """FD violation census == the Python fold for ANY data: NULL rhs
    counts as a distinct value, per-group distinct-rhs counts drive the
    violating-group/row totals and the max fan-out."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import fd_violations

    df = spark.createDataFrame(rows, "q1 int, q2 int, s int")
    fds = [(["q1"], "s"), (["q1", "q2"], "s")]
    got = {
        r.fd: (r.n_groups, r.n_violating_groups, r.n_violating_rows, r.max_distinct_rhs)
        for r in fd_violations(df, fds).collect()
    }

    want = {}
    for lhs_idx, name in (((0,), "q1->s"), ((0, 1), "q1,q2->s")):
        groups: dict[tuple, list] = {}
        for row in rows:
            groups.setdefault(tuple(row[i] for i in lhs_idx), []).append(row[2])
        n_vg = n_vr = 0
        max_d = 0
        for vals in groups.values():
            d = len(set(vals))
            max_d = max(max_d, d)
            if d > 1:
                n_vg += 1
                n_vr += len(vals)
        want[name] = (len(groups), n_vg, n_vr, max_d)
    assert got == want


_vec4 = st.lists(
    st.floats(-4, 4, allow_nan=False, allow_infinity=False, width=32),
    min_size=4,
    max_size=4,
)


@given(
    vecs=st.lists(_vec4, min_size=2, max_size=8),
    cents=st.lists(_vec4, min_size=1, max_size=4),
)
@SET
def test_pq_encode_and_adc_match_python(spark, vecs, cents):
    """PQ encode + ADC top-k == the Python replication for ANY vectors
    and codebook: the left-to-right sub-distance fold rounded to
    micro-units, the smaller-centroid argmin, the exact integer ADC sum,
    and the (distance, neighbor) tie-broken cut."""
    from dwh_etl_ods_spark_jobs_spark.similarity import ann_pq_topk, pq_encode

    vrows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    crows = [(i, [float(x) for x in v]) for i, v in enumerate(cents)]
    vdf = spark.createDataFrame(vrows, "id int, vec array<double>")
    cdf = spark.createDataFrame(crows, "id int, vec array<double>")
    m_sub, width, k = 2, 2, 3

    def pd_micro(v, c, s):
        acc = 0.0
        for j in range(s * width, s * width + width):
            acc = acc + (v[j] - c[j]) * (v[j] - c[j])
        return int(_round_half_up(acc * 1000000.0, 0))

    codes = {}
    for i, v in vrows:
        for s in range(m_sub):
            codes[(i, s)] = min(
                (pd_micro(v, c, s), ci) for ci, c in crows
            )[1]
    got_codes = {
        (r.id, r.sub): r.cent_id
        for r in pq_encode(vdf, cdf, "id", "vec", dim=4, m_sub=m_sub).collect()
    }
    assert got_codes == codes

    got_topk = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_micro)
        for r in ann_pq_topk(
            vdf, vdf, cdf, "id", "vec", dim=4, k=k, m_sub=m_sub
        ).collect()
    }
    want_topk = {}
    for qi, qv in vrows:
        table = {
            (ci, s): pd_micro(qv, c, s) for ci, c in crows for s in range(m_sub)
        }
        scored = sorted(
            (
                sum(table[(codes[(ni, s)], s)] for s in range(m_sub)),
                ni,
            )
            for ni, _ in vrows
            if ni != qi
        )
        for rank, (d, ni) in enumerate(scored[:k], start=1):
            want_topk[(qi, rank)] = (ni, d)
    assert got_topk == want_topk


_rrf_lists = st.lists(
    st.lists(st.integers(0, 9), min_size=1, max_size=6, unique=True),
    min_size=1,
    max_size=3,
)


@given(lists=_rrf_lists)
@SET
def test_reciprocal_rank_fusion_matches_python(spark, lists):
    """RRF == the Python integer fold for ANY ranked lists: each list
    contributes 1e6 div (60 + rank), absent candidates contribute 0,
    n_lists counts containing lists."""
    from dwh_etl_ods_spark_jobs_spark.similarity import reciprocal_rank_fusion

    frames = [
        spark.createDataFrame(
            [(d, r) for r, d in enumerate(lst, start=1)], "id int, rank int"
        )
        for lst in lists
    ]
    got = {
        r.id: (r.n_lists, r.rrf_micro)
        for r in reciprocal_rank_fusion(frames, "id", "rank").collect()
    }

    want: dict[int, tuple[int, int]] = {}
    for lst in lists:
        for r, d in enumerate(lst, start=1):
            n, s = want.get(d, (0, 0))
            want[d] = (n + 1, s + 1_000_000 // (60 + r))
    assert got == want


@given(docs=_doc_words, max_df=st.integers(1, 3))
@SET
def test_drop_boilerplate_paragraphs_matches_python(spark, docs, max_df):
    """Boilerplate removal == the Python replication for ANY corpus and
    DF cap: fixed-width chunking, per-occurrence corpus paragraph
    frequency, and in-order reconstruction ('' when all dropped)."""
    from dwh_etl_ods_spark_jobs_spark.curation import drop_boilerplate_paragraphs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: (r.n_paras, r.n_dropped, r.clean_text)
        for r in df.transform(
            drop_boilerplate_paragraphs("id", "text", para_tokens=2, max_df=max_df)
        ).collect()
    }

    paras = {
        i: [
            " ".join(t.split(" ")[p : p + 2])
            for p in range(0, len(t.split(" ")), 2)
        ]
        for i, t in rows
    }
    freq: dict[str, int] = {}
    for ps in paras.values():
        for p in ps:
            freq[p] = freq.get(p, 0) + 1
    want = {}
    for i, ps in paras.items():
        kept = [p for p in ps if freq[p] <= max_df]
        want[i] = (len(ps), len(ps) - len(kept), " ".join(kept))
    assert got == want


_ivs = st.lists(
    st.tuples(st.integers(-10, 15), st.integers(0, 10)), min_size=1, max_size=12
)


@given(left=_ivs, right=_ivs, chunk=st.integers(1, 7))
@SET
def test_interval_overlap_join_matches_bruteforce(spark, left, right, chunk):
    """Chunked interval overlap join == the brute-force pair scan for
    ANY inclusive integer intervals (negative starts included) and ANY
    chunk width — each overlapping pair emitted exactly once."""
    from dwh_etl_ods_spark_jobs_spark.operators.intervals import (
        interval_overlap_join,
    )

    lrows = [(i, s, s + w) for i, (s, w) in enumerate(left)]
    rrows = [(i, s, s + w) for i, (s, w) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "id int, s long, e long")
    rdf = spark.createDataFrame(rrows, "id int, s long, e long")
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(ldf, rdf, "s", "e", chunk=chunk).collect()
    )

    want = sorted(
        (ai, bi)
        for ai, as_, ae in lrows
        for bi, bs, be in rrows
        if as_ <= be and bs <= ae
    )
    assert got == want


_skew_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 4)), st.one_of(st.none(), st.integers(0, 2))),
    min_size=1,
    max_size=25,
)


@given(rows=_skew_rows)
@SET
def test_key_skew_profile_matches_python(spark, rows):
    """Shuffle-skew diagnostic == the Python fold for ANY key data:
    concat_ws NULL-skipping key render, hottest-key multiple in exact
    ppm, and the min-string argmax tie-break."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import key_skew_profile

    df = spark.createDataFrame(rows, "k1 int, k2 int")
    r = key_skew_profile(df, ["k1", "k2"]).collect()[0]

    counts: dict[str, int] = {}
    for k1, k2 in rows:
        k = "|".join(str(v) for v in (k1, k2) if v is not None)
        counts[k] = counts.get(k, 0) + 1
    n_rows = len(rows)
    mx = max(counts.values())
    top = min(k for k, c in counts.items() if c == mx)
    assert (r.n_rows, r.n_keys, r.max_per_key, r.skew_x_micro, r.top_key) == (
        n_rows,
        len(counts),
        mx,
        mx * len(counts) * 1_000_000 // n_rows,
        top,
    )


_sess_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=25
)


@given(rows=_sess_rows, gap=st.integers(1, 20))
@SET
def test_sessionize_matches_python(spark, rows, gap):
    """Gap sessionization == the Python sequential replication for ANY
    event stream and gap: session breaks strictly-greater-than-gap,
    0-based session and event sequences, (ts, id) tie-break."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import sessionize

    data = [(i, u, t) for i, (u, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "id int, u int, t long").withColumn(
        "ts", F.timestamp_micros(F.col("t"))
    )
    got = {
        r.id: (r.session_seq, r.event_seq)
        for r in sessionize(df, ["u"], "ts", gap_micros=gap, tiebreak_cols=["id"]).collect()
    }

    want = {}
    by_u: dict[int, list] = {}
    for i, u, t in data:
        by_u.setdefault(u, []).append((t, i))
    for u, evs in by_u.items():
        evs.sort()
        sess = -1
        prev_t = None
        ev_seq = 0
        for t, i in evs:
            if prev_t is None or (t - prev_t) > gap:
                sess += 1
                ev_seq = 0
            else:
                ev_seq += 1
            want[i] = (sess, ev_seq)
            prev_t = t
    assert got == want


_hll_sets = st.dictionaries(
    st.sampled_from(["s1", "s2", "s3"]),
    st.lists(st.integers(0, 300), min_size=1, max_size=25),
    min_size=2,
    max_size=3,
)


@given(sets=_hll_sets)
@SET
def test_hll_set_algebra_matches_python(spark, sets):
    """HLL pairwise set algebra == the Python register replication for
    ANY set family: shared-register subtraction recovers the exact union
    register sum, estimates agree to the 3-decimal round, and the
    Jaccard micro ratio to ±1."""
    import hashlib
    import math

    from dwh_etl_ods_spark_jobs_spark.sketches import (
        HLL_M,
        HLL_P,
        _HLL_EMPTY_TERM,
        _HLL_NUM,
        _HLL_RHO_MAX,
        _HLL_SCALE_POW,
        hll_set_algebra,
    )

    rows = [(s, v) for s, vs in sets.items() for v in vs]
    df = spark.createDataFrame(rows, "s string, v long")
    got = {
        (r.set_a, r.set_b): r
        for r in hll_set_algebra(df, "s", "v").collect()
    }

    def regs_of(vals):
        regs: dict[int, int] = {}
        for v in set(vals):
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            w = h >> HLL_P
            rho = _HLL_RHO_MAX - (w.bit_length() if w else 0)
            regs[h % HLL_M] = max(regs.get(h % HLL_M, 0), rho)
        return {r: 1 << (_HLL_SCALE_POW - m) for r, m in regs.items()}

    def est(s, v):
        e = _HLL_NUM / float(s)
        if e <= 2.5 * HLL_M and v > 0:
            return float(HLL_M) * math.log(HLL_M / float(v))
        return e

    terms = {s: regs_of(vs) for s, vs in sets.items()}
    names = sorted(terms)
    want_pairs = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ta, tb = terms[a], terms[b]
            shared = set(ta) & set(tb)
            if not shared:
                continue
            want_pairs.add((a, b))
            s_a, s_b = sum(ta.values()), sum(tb.values())
            hit_a, hit_b, hit_sh = len(ta), len(tb), len(shared)
            s_max = sum(min(ta[r], tb[r]) for r in shared)
            s_a_sh = sum(ta[r] for r in shared)
            s_b_sh = sum(tb[r] for r in shared)
            v_u = HLL_M - (hit_a + hit_b - hit_sh)
            s_u = s_max + (s_a - s_a_sh) + (s_b - s_b_sh) + v_u * _HLL_EMPTY_TERM
            e_a = est(s_a + (HLL_M - hit_a) * _HLL_EMPTY_TERM, HLL_M - hit_a)
            e_b = est(s_b + (HLL_M - hit_b) * _HLL_EMPTY_TERM, HLL_M - hit_b)
            e_u = est(s_u, v_u)
            e_i = max(e_a + e_b - e_u, 0.0)
            r = got[(a, b)]
            assert abs(r.est_a - _round_half_up(e_a, 3)) <= 0.001
            assert abs(r.est_b - _round_half_up(e_b, 3)) <= 0.001
            assert abs(r.est_union - _round_half_up(e_u, 3)) <= 0.001
            assert abs(r.est_intersect - _round_half_up(e_i, 3)) <= 0.001
            assert abs(r.jaccard_micro - int(_round_half_up(e_i / e_u * 1e6, 0))) <= 1
    assert set(got) == want_pairs


@given(vecs=st.lists(_vec4, min_size=1, max_size=8))
@SET
def test_quantize_embeddings_matches_python(spark, vecs):
    """Symmetric int8 quantization == the Python replication for ANY
    vectors: per-vector max-abs fold, HALF_UP codes in [-127, 127], the
    9-decimal scale, and the all-zero contract."""
    from dwh_etl_ods_spark_jobs_spark.similarity import quantize_embeddings

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, vec array<double>")
    got = {r.id: (r.scale, list(r.q)) for r in quantize_embeddings(df, "id", "vec").collect()}

    want = {}
    for i, v in rows:
        ma = 0.0
        for x in v:
            ma = max(ma, abs(x))
        if ma == 0.0:
            want[i] = (0.0, [0] * len(v))
        else:
            want[i] = (
                _round_half_up(ma / 127.0, 9),
                [int(_round_half_up(x * 127.0 / ma, 0)) for x in v],
            )
    assert got == want


_snap_side = st.dictionaries(
    st.one_of(st.none(), st.integers(0, 6)),
    st.one_of(st.none(), st.integers(0, 3)),
    min_size=0,
    max_size=8,
)


@given(old=_snap_side, new=_snap_side)
@SET
def test_snapshot_diff_matches_python(spark, old, new):
    """Snapshot diff == the Python key classification for ANY two
    versions (NULL keys null-safe-joined, NULL values fingerprinted by
    the sentinel): added/removed/changed/same exactly."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import snapshot_diff

    schema = "k int, v int"
    odf = spark.createDataFrame(list(old.items()), schema) if old else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("k"), F.lit(None).cast("int").alias("v")
        )
    )
    ndf = spark.createDataFrame(list(new.items()), schema) if new else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("k"), F.lit(None).cast("int").alias("v")
        )
    )
    got = {r.k: r.change for r in snapshot_diff(odf, ndf, ["k"]).collect()}

    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] == new[k]:
            want[k] = "same"
        else:
            want[k] = "changed"
    assert got == want


@given(
    child=st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=1, max_size=20),
    parent=st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=0, max_size=10),
)
@SET
def test_fk_orphan_census_matches_python(spark, child, parent):
    """FK orphan census == the Python fold for ANY child/parent keysets:
    NULL foreign keys are orphans, matching is null-rejecting equality,
    ppm is the truncated integer ratio."""
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import fk_orphan_census

    cdf = spark.createDataFrame([(c,) for c in child], "fk int")
    pdf = spark.createDataFrame([(p,) for p in parent], "pk int") if parent else (
        spark.range(0).select(F.lit(None).cast("int").alias("pk"))
    )
    r = fk_orphan_census(cdf, pdf, [("fk", "pk")]).collect()[0]

    pset = {p for p in parent if p is not None}
    orphans = sum(1 for c in child if c is None or c not in pset)
    assert (r.n_child, r.n_orphans, r.orphan_ppm) == (
        len(child),
        orphans,
        orphans * 1_000_000 // len(child),
    )


@given(rows=_pq_rows)
@SET
def test_table_checksum_matches_python(spark, rows):
    """Order-insensitive table checksum == the Python md5 replication
    for ANY rows: the boundary-safe name-sorted fingerprint, the 60-bit
    XOR fold, and the mod-2^63 sum fold."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import table_checksum

    df = spark.createDataFrame(rows, "q1 int, q2 int, s int")
    r = table_checksum(df).collect()[0]

    xor_h = 0
    sum_h = 0
    for row in rows:
        parts = ""
        for v in row:  # columns q1, q2, s are already name-sorted
            parts += (
                hashlib.md5(str(v).encode()).hexdigest()
                if v is not None
                else "n" * 32
            )
        # md5_long applies its own md5 on top of the fingerprint string
        fp = hashlib.md5(parts.encode()).hexdigest()
        h = int(hashlib.md5(fp.encode()).hexdigest()[:15], 16)
        xor_h ^= h
        sum_h = (sum_h + h) % (1 << 63)
    assert (r.n_rows, r.xor_hash, r.sum_hash) == (len(rows), xor_h, sum_h)


_baskets = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 6)), min_size=1, max_size=25
)


@given(rows=_baskets, max_basket=st.one_of(st.none(), st.integers(2, 4)), min_support=st.integers(1, 2))
@SET
def test_copurchase_projection_matches_python(spark, rows, max_basket, min_support):
    """Basket co-occurrence projection == the Python replication for ANY
    baskets: distinct membership, the deterministic per-basket cut,
    support floor, (support desc, pair) top-k, and the exact lift ppm."""
    from dwh_etl_ods_spark_jobs_spark.graph import copurchase_projection

    df = spark.createDataFrame(rows, "b int, item int")
    top_k = 5
    got = sorted(
        (r.item_a, r.item_b, r.support, r.lift_ppm)
        for r in copurchase_projection(
            df, "b", "item", min_support=min_support, top_k=top_k,
            max_basket=max_basket,
        ).collect()
    )

    baskets: dict[int, list] = {}
    for b, it in set(rows):
        baskets.setdefault(b, []).append(it)
    if max_basket is not None:
        baskets = {b: sorted(its)[:max_basket] for b, its in baskets.items()}
    support: dict[tuple[int, int], int] = {}
    cnt: dict[int, int] = {}
    for its in baskets.values():
        ws = sorted(its)
        for it in ws:
            cnt[it] = cnt.get(it, 0) + 1
        for i, a in enumerate(ws):
            for b2 in ws[i + 1 :]:
                support[(a, b2)] = support.get((a, b2), 0) + 1
    nb = len(baskets)
    ranked = sorted(
        ((a, b2, s) for (a, b2), s in support.items() if s >= min_support),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:top_k]
    want = sorted(
        (a, b2, s, s * nb * 1_000_000 // (cnt[a] * cnt[b2])) for a, b2, s in ranked
    )
    assert got == want


@given(
    vecs=st.lists(_vec3, min_size=1, max_size=12),
    bucket_size=st.integers(2, 4),
)
@SET
def test_pair_distance_histogram_matches_python(spark, vecs, bucket_size):
    """Hash-sampled pair distance histogram == the Python replication
    for ANY vectors and bucket size: md5 bucket assignment, exact
    quantized L2², and the HDR bucket census."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.similarity import pair_distance_histogram

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, vec array<double>")
    got = {
        r.bucket_lo: r.n
        for r in pair_distance_histogram(
            df, "id", "vec", bucket_size=bucket_size
        ).collect()
    }

    q = {i: [int(_round_half_up(x * 1000.0, 0)) for x in v] for i, v in rows}
    n = len(rows)
    nb = max((n + bucket_size - 1) // bucket_size, 1)
    bkt = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % nb
        for i, _ in rows
    }
    want: dict[int, int] = {}
    for i, _ in rows:
        for j, _ in rows:
            if i < j and bkt[i] == bkt[j]:
                d = sum((a - b) ** 2 for a, b in zip(q[i], q[j]))
                hb = _hdr_bucket(d)
                want[hb] = want.get(hb, 0) + 1
    assert got == want


_nz_vec3 = _vec3.filter(lambda v: any(abs(x) > 0.01 for x in v))


def _py_cos(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    for x in a:
        na = na + x * x
    for y in b:
        nb = nb + y * y
    import math

    return dot / (math.sqrt(na) * math.sqrt(nb))


@given(vecs=st.lists(_nz_vec3, min_size=2, max_size=8))
@SET
def test_ann_bruteforce_and_hard_negatives_match_python(spark, vecs):
    """Brute-force cosine top-k and banded hard-negative mining == the
    Python replication for ANY non-zero vectors: the fixed cosine fold
    rounded to 6 decimals, self-exclusion, the [floor, ceil) band, and
    (score desc, neighbor) tie-breaks."""
    from dwh_etl_ods_spark_jobs_spark.similarity import (
        ann_bruteforce_topk,
        hard_negative_mining,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, vec array<double>")
    k = 3
    got_bf = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in ann_bruteforce_topk(df, df, "id", "vec", k=k).collect()
    }
    floor_c, ceil_c = -0.3, 0.8
    got_hn = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in hard_negative_mining(
            df, df, "id", "vec", k=k, floor_cos=floor_c, ceil_cos=ceil_c
        ).collect()
    }

    want_bf, want_hn = {}, {}
    for qi, qv in rows:
        scored = sorted(
            (-_round_half_up(_py_cos(qv, cv), 6), ni)
            for ni, cv in rows
            if ni != qi
        )
        for rank, (negc, ni) in enumerate(scored[:k], start=1):
            want_bf[(qi, rank)] = (ni, -negc)
        banded = [(c, ni) for c, ni in ((-c, n) for c, n in scored) if floor_c <= c < ceil_c]
        banded.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c, ni) in enumerate(banded[:k], start=1):
            want_hn[(qi, rank)] = (ni, c)
    assert got_bf == want_bf
    assert got_hn == want_hn


@given(vecs=st.lists(_nz_vec3, min_size=2, max_size=8), probes=st.integers(0, 4))
@SET
def test_ann_lsh_topk_matches_python(spark, vecs, probes):
    """Hyperplane-LSH top-k == the Python replication for ANY vectors
    and probe count: the literal plane signatures, Hamming-1 multiprobe
    bucket set, and in-bucket cosine ranking."""
    from dwh_etl_ods_spark_jobs_spark.dedup import hyperplanes
    from dwh_etl_ods_spark_jobs_spark.similarity import ann_lsh_topk

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, vec array<double>")
    n_planes, k = 4, 3
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in ann_lsh_topk(
            df, df, "id", "vec", k=k, dim=3, n_planes=n_planes,
            hamming_probes=probes,
        ).collect()
    }

    planes = hyperplanes(3, n_planes)

    def sig(v):
        s = 0
        for p, plane in enumerate(planes):
            acc = 0.0
            for x, w in zip(v, plane):
                acc = acc + x * w
            if acc > 0:
                s |= 1 << p
        return s

    sigs = {i: sig(v) for i, v in rows}
    want = {}
    for qi, qv in rows:
        buckets = {sigs[qi]}
        for j in range(min(probes, n_planes)):
            buckets.add(sigs[qi] ^ (1 << j))
        cands = [
            (ni, cv) for ni, cv in rows if ni != qi and sigs[ni] in buckets
        ]
        scored = sorted(
            (-_round_half_up(_py_cos(qv, cv), 6), ni) for ni, cv in cands
        )
        for rank, (negc, ni) in enumerate(scored[:k], start=1):
            want[(qi, rank)] = (ni, -negc)
    assert got == want


_truth_lists = st.dictionaries(
    st.integers(0, 4), st.sets(st.integers(0, 9), min_size=1, max_size=5),
    min_size=1, max_size=4,
)


@given(truth=_truth_lists, cand=_truth_lists)
@SET
def test_ann_recall_eval_matches_python(spark, truth, cand):
    """Recall@k eval == the Python fold for ANY truth/candidate lists:
    per-query hit ratios in exact ppm, missed queries at 0, and the
    sum/min/perfect roll-up."""
    from dwh_etl_ods_spark_jobs_spark.similarity import ann_recall_eval

    k = 5
    tdf = spark.createDataFrame(
        [(q, n) for q, ns in truth.items() for n in ns],
        "query_id int, neighbor_id int",
    )
    cdf = spark.createDataFrame(
        [(q, n) for q, ns in cand.items() for n in ns],
        "query_id int, neighbor_id int",
    )
    r = ann_recall_eval(tdf, cdf, k=k).collect()[0]

    per_q = {
        q: len(ns & cand.get(q, set())) * 1_000_000 // k for q, ns in truth.items()
    }
    assert (r.n_queries, r.recall_sum_ppm, r.min_recall_ppm, r.n_perfect) == (
        len(truth),
        sum(per_q.values()),
        min(per_q.values()),
        sum(1 for v in per_q.values() if v == 1_000_000),
    )


_merge_target = st.dictionaries(
    st.one_of(st.none(), st.integers(0, 6)),
    st.integers(0, 5),
    min_size=0,
    max_size=8,
)
_merge_changes = st.dictionaries(
    st.one_of(st.none(), st.integers(0, 6)),
    st.tuples(st.integers(0, 5), st.booleans()),
    min_size=0,
    max_size=8,
)


@given(target=_merge_target, changes=_merge_changes)
@SET
def test_merge_upsert_matches_python(spark, target, changes):
    """ANSI MERGE semantics == the Python replication for ANY target and
    changeset (NULL keys null-safe matched): replace, insert, delete,
    delete-of-absent no-op, and untouched-row keep."""
    from dwh_etl_ods_spark_jobs_spark.operators.merge import merge_upsert

    schema_t = "k int, v int"
    tdf = spark.createDataFrame(list(target.items()), schema_t) if target else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("k"), F.lit(None).cast("int").alias("v")
        )
    )
    crows = [(k, v, t) for k, (v, t) in changes.items()]
    cdf = spark.createDataFrame(crows, "k int, v int, tomb boolean") if crows else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("k"),
            F.lit(None).cast("int").alias("v"),
            F.lit(None).cast("boolean").alias("tomb"),
        )
    )
    got = sorted(
        ((r.k, r.v) for r in merge_upsert(tdf, cdf, ["k"], tombstone_col="tomb").collect()),
        key=repr,
    )

    state = dict(target)
    for k, (v, tomb) in changes.items():
        if tomb:
            state.pop(k, None)
        else:
            state[k] = v
    assert got == sorted(state.items(), key=repr)


_feed_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5), st.sampled_from(["c", "u", "d", "r"])),
    min_size=0,
    max_size=15,
)


@given(target=_merge_target, feed=_feed_rows)
@SET
def test_apply_change_feed_matches_python(spark, target, feed):
    """CDC feed apply == the Python sequential replay for ANY snapshot
    and interleaved feed: per-key compaction to the latest change by
    position, delete ops as tombstones, one-pass merge."""
    from dwh_etl_ods_spark_jobs_spark.operators.merge import apply_change_feed

    tdf = spark.createDataFrame(
        [(k, v) for k, v in target.items() if k is not None], "k int, v int"
    ) if any(k is not None for k in target) else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("k"), F.lit(None).cast("int").alias("v")
        )
    )
    frows = [(k, v, op, pos) for pos, (k, v, op) in enumerate(feed)]
    fdf = spark.createDataFrame(frows, "k int, v int, op string, pos long") if frows else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("k"),
            F.lit(None).cast("int").alias("v"),
            F.lit(None).cast("string").alias("op"),
            F.lit(None).cast("long").alias("pos"),
        )
    )
    got = sorted(
        (r.k, r.v)
        for r in apply_change_feed(tdf, fdf, ["k"], ["pos"]).collect()
    )

    state = {k: v for k, v in target.items() if k is not None}
    latest: dict[int, tuple[int, str]] = {}
    for k, v, op, pos in frows:
        latest[k] = (v, op)
    for k, (v, op) in latest.items():
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == sorted(state.items())


_clamp_dates = st.lists(
    st.one_of(st.none(), st.dates(min_value=__import__("datetime").date(1850, 1, 1), max_value=__import__("datetime").date(2100, 1, 1))),
    min_size=1,
    max_size=20,
)


@given(vals=_clamp_dates, null_sentinel=st.booleans(), offset=st.sampled_from([0, 1]))
@SET
def test_date_clamp_matches_python(spark, vals, null_sentinel, offset):
    """date_clamp == the Python rule for ANY dates, sentinel mode, and
    year offset: out-of-[lo, hi+offset] goes to the sentinel (or NULL),
    NULL passes through."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.clean import date_clamp

    lo, hi = dt.date(1900, 1, 1), dt.date(2030, 12, 31)
    sent = None if null_sentinel else dt.date(1900, 1, 1)
    rule = date_clamp(
        "d", lo=lo, hi=hi, sentinel=sent, hi_offset_years=offset
    )
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, d date")
    got = {r.i: r.d for r in rule(df).collect()}

    hi_eff = dt.date(2030 + offset, 12, 31)
    want = {}
    for i, v in enumerate(vals):
        if v is None:
            want[i] = None
        elif v < lo or v > hi_eff:
            want[i] = sent
        else:
            want[i] = v
    assert got == want


_num_strs = st.lists(
    st.one_of(
        st.none(),
        st.sampled_from(["abc", "", "-5", "0", "0.5", "99.9", "100", "100.1", "1540", "-0.0001"]),
        st.integers(-50, 200).map(str),
    ),
    min_size=1,
    max_size=20,
)


@given(vals=_num_strs, bad_at_lo=st.booleans())
@SET
def test_range_sentinel_matches_python(spark, vals, bad_at_lo):
    """range_sentinel == the Python rule for ANY string numerics:
    try-cast semantics (garbage to NULL), one- and closed-bound modes,
    and the 999 sentinel."""
    from dwh_etl_ods_spark_jobs_spark.operators.clean import range_sentinel

    rule = range_sentinel("v", lo=0.0, hi=100.0, sentinel=999.0, cast_to="double", bad_at_lo=bad_at_lo)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v string")
    got = {r.i: r.v for r in rule(df).collect()}

    want = {}
    for i, s in enumerate(vals):
        try:
            x = float(s) if s is not None else None
        except ValueError:
            x = None
        if x is None:
            want[i] = None
        elif (x <= 0.0 if bad_at_lo else x < 0.0) or x > 100.0:
            want[i] = 999.0
        else:
            want[i] = x
    assert got == want


@given(days=st.integers(-3, 40))
@SET
def test_day_spine_matches_python(spark, days):
    """day_spine emits exactly one row per day of [start, end] for ANY
    range length, and an empty frame for inverted ranges."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.spine import day_spine

    start = dt.date(2020, 2, 25)
    end = start + dt.timedelta(days=days)
    got = sorted(r.as_of_date for r in day_spine(spark, start, end).collect())
    want = [start + dt.timedelta(days=i) for i in range(days + 1)] if days >= 0 else []
    assert got == want


@given(
    texts=st.lists(st.text("abXy 1.", min_size=0, max_size=30), min_size=1, max_size=6),
    window=st.integers(1, 8),
    stride=st.integers(1, 6),
)
@SET
def test_chunk_sliding_matches_python(spark, texts, window, stride):
    """Sliding-window chunking == the Python replication for ANY texts,
    window, and stride: exact fan-out, offsets, chunk lengths, and md5
    chunk hashes; empty documents dropped."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.text import chunk_sliding

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = sorted(
        (r.id, r.chunk_idx, r.chunk_start, r.chunk_len, r.chunk_h)
        for r in chunk_sliding(df, "text", "id", window=window, stride=stride).collect()
    )

    want = []
    for i, t in rows:
        if len(t) < 1:
            continue
        n = (len(t) + stride - 1) // stride
        for ci in range(n):
            chunk = t[ci * stride : ci * stride + window]
            want.append(
                (
                    i,
                    ci,
                    ci * stride,
                    len(chunk),
                    int(hashlib.md5(chunk.encode()).hexdigest()[:15], 16),
                )
            )
    assert got == sorted(want)


_strat_rows = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 2)), min_size=1, max_size=25, unique_by=lambda t: t[0]
)


@given(rows=_strat_rows, k=st.integers(1, 4))
@SET
def test_stratified_sample_exact_matches_python(spark, rows, k):
    """Exact-k stratified sampling == the Python md5-order pick for ANY
    strata and k: exactly min(k, stratum size) rows, chosen by the
    (md5_long(id), id) total order, identical under the salted two-phase
    plan."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.curation import stratified_sample_exact

    df = spark.createDataFrame(rows, "id int, strat int")
    got = sorted(
        (r.strat, r.id)
        for r in df.transform(stratified_sample_exact("id", "strat", k=k)).collect()
    )

    by_s: dict[int, list] = {}
    for i, s in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        by_s.setdefault(s, []).append((h, i))
    want = []
    for s, hs in by_s.items():
        hs.sort()
        want.extend((s, i) for _, i in hs[:k])
    assert got == sorted(want)


_alloc_weights = st.dictionaries(
    st.integers(0, 8), st.integers(1, 100), min_size=1, max_size=8
)


@given(weights=_alloc_weights, budget=st.integers(0, 500))
@SET
def test_largest_remainder_allocation_matches_python(spark, weights, budget):
    """Hare-Niemeyer allocation == the Python replication for ANY
    weights and budget: floors plus largest-remainder toppers with
    smaller-key tie-break, summing exactly to the budget."""
    from dwh_etl_ods_spark_jobs_spark.curation import largest_remainder_allocation

    rows = [(k, w) for k, w in weights.items()]
    df = spark.createDataFrame(rows, "key int, w long")
    got = {
        r.key: (r.weight, r.alloc)
        for r in largest_remainder_allocation(df, "key", "w", budget).collect()
    }

    W = sum(weights.values())
    floors = {k: budget * w // W for k, w in weights.items()}
    rems = {k: (budget * w) % W for k, w in weights.items()}
    spare = budget - sum(floors.values())
    toppers = set(
        sorted(weights, key=lambda k: (-rems[k], k))[:spare]
    )
    want = {
        k: (w, floors[k] + (1 if k in toppers else 0)) for k, w in weights.items()
    }
    assert got == want
    assert sum(a for _, a in got.values()) == budget


_ts_rows = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.dates(
            min_value=__import__("datetime").date(2020, 1, 1),
            max_value=__import__("datetime").date(2020, 3, 1),
        ),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_ts_rows)
@SET
def test_temporal_split_census_matches_python(spark, rows):
    """Temporal split census == the Python fold for ANY entity/date
    data: train/embargo/test labeling at the boundaries, per-split
    row/entity counts, and the shared-with-train entity overlap."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.curation import temporal_split_census

    train_end, test_start = "2020-01-20", "2020-02-10"
    df = spark.createDataFrame(rows, "e int, d date")
    got = {
        r.split: (r.n_rows, r.n_entities, r.shared_train_entities)
        for r in temporal_split_census(df, "d", "e", train_end, test_start).collect()
    }

    te, ts = dt.date.fromisoformat(train_end), dt.date.fromisoformat(test_start)
    lab = [
        (e, "train" if d < te else ("embargo" if d < ts else "test"))
        for e, d in rows
    ]
    train_ents = {e for e, s in lab if s == "train"}
    want = {}
    for split in {s for _, s in lab}:
        ents = {e for e, s in lab if s == split}
        n_rows = sum(1 for _, s in lab if s == split)
        shared = 0 if split == "train" else len(ents & train_ents)
        want[split] = (n_rows, len(ents), shared)
    assert got == want


_artifact_text = st.lists(
    st.sampled_from(["ok", "Ã¼", "â€™", "Â ", " plain ", "Ã¶Ã¤", "â€¦", "x"]),
    min_size=0,
    max_size=10,
).map("".join)


@given(texts=st.lists(_artifact_text, min_size=1, max_size=10))
@SET
def test_encoding_artifact_stats_matches_python(spark, texts):
    """Mojibake census == the Python per-literal occurrence counts for
    ANY text: non-overlapping replace-based counting, exact ppm, empty
    text at 0."""
    from dwh_etl_ods_spark_jobs_spark.text.encoding import (
        ENCODING_ARTIFACTS,
        encoding_artifact_stats,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    stats = encoding_artifact_stats(F.col("text"))
    got = {
        r.id: (r.n_chars, r.n_artifacts, r.artifact_ppm)
        for r in df.select("id", *[v.alias(k) for k, v in stats.items()]).collect()
    }

    want = {}
    for i, t in rows:
        total = sum(t.count(lit) for lit in ENCODING_ARTIFACTS)
        ppm = total * 1_000_000 // len(t) if len(t) > 0 else 0
        want[i] = (len(t), total, ppm)
    assert got == want


_json_cells = st.lists(
    st.sampled_from(
        [
            '{"a": 3, "b": "x"}',
            '{"a": null}',
            '{"b": 7}',
            "not json",
            "",
            "[1, 2]",
            '{"a": -5}',
            None,
            '{"a": 12, "c": {"d": 2}}',
        ]
    ),
    min_size=1,
    max_size=15,
)


@given(cells=_json_cells)
@SET
def test_json_field_audit_matches_python(spark, cells):
    """JSON parse audit == the Python json.loads replication for ANY mix
    of valid/malformed/NULL cells: validity, per-path non-null counts,
    and the numeric salvage sum."""
    import json

    from dwh_etl_ods_spark_jobs_spark.operators.quality import json_field_audit

    df = spark.createDataFrame([(c,) for c in cells], "j string")
    r = json_field_audit(
        df, "j", fields=[("a", "$.a"), ("d", "$.c.d")],
        numeric_sums=[("a", "$.a")],
    ).collect()[0]

    n_valid = n_a = n_d = s_a = 0
    for c in cells:
        if c is None:
            continue
        try:
            doc = json.loads(c)
        except ValueError:
            continue
        n_valid += 1
        a = doc.get("a") if isinstance(doc, dict) else None
        if a is not None:
            n_a += 1
            s_a += a
        d = (
            doc.get("c", {}).get("d")
            if isinstance(doc, dict) and isinstance(doc.get("c"), dict)
            else None
        )
        if d is not None:
            n_d += 1
    assert (r.n_rows, r.n_valid, r.n_malformed, r.nn_a, r.nn_d, r.sum_a) == (
        len(cells),
        n_valid,
        len(cells) - n_valid,
        n_a,
        n_d,
        s_a,
    )



_cov_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-20, 20)), min_size=1, max_size=25
)


@given(rows=_cov_rows)
@SET
def test_quantile_coverage_eval_matches_python(spark, rows):
    """Quantile band coverage == the Python replication for ANY grouped
    values: the exact (cum·den ≥ num·total) band endpoints under the
    (value, tie) order, inclusive membership, and ppm coverage."""
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        quantile_coverage_eval,
    )

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g int, v int, i int")
    got = {
        r.g: (r.n, r.band_lo, r.band_hi, r.n_inside, r.coverage_ppm)
        for r in quantile_coverage_eval(df, ["g"], ["v", "i"]).collect()
    }

    want = {}
    groups: dict[int, list] = {}
    for g, v, i in data:
        groups.setdefault(g, []).append((v, i))
    for g, vs in groups.items():
        vs.sort()
        n = len(vs)

        def q(num, den):
            cw = 0
            for v, _ in vs:
                cw += 1
                if cw * den >= num * n:
                    return v
            return vs[-1][0]

        lo, hi = q(1, 10), q(9, 10)
        inside = sum(1 for v, _ in vs if lo <= v <= hi)
        want[g] = (n, lo, hi, inside, inside * 1_000_000 // n)
    assert got == want


_pii_text = st.lists(
    st.sampled_from(
        [
            "hello world",
            "a.user+x@mail.example.com",
            "123-45-6789",
            "10.0.255.1",
            "+1 (555) 123-4567",
            "no pii here",
            "x@y.io",
            "999.999.999.999",
            "tail",
        ]
    ),
    min_size=0,
    max_size=6,
).map(" ".join)


@given(texts=st.lists(_pii_text, min_size=1, max_size=8))
@SET
def test_redact_pii_matches_python(spark, texts):
    """PII redaction == the Python chained re.sub replication for ANY
    text built from email/ID/IP/phone fragments — identical pattern
    order and replacement spans."""
    import re

    from dwh_etl_ods_spark_jobs_spark.text import PII_PATTERNS, redact_pii

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: r.red
        for r in df.select("id", redact_pii(F.col("text")).alias("red")).collect()
    }

    want = {}
    for i, t in rows:
        out = t
        for _name, pat, rep in PII_PATTERNS:
            out = re.sub(pat, rep, out)
        want[i] = out
    assert got == want


_state_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-100, 100)), min_size=1, max_size=25
)


@given(rows=_state_rows, split_at=st.integers(0, 25))
@SET
def test_merge_agg_state_equals_recompute(spark, rows, split_at):
    """Incremental state merge == recomputing the view from the full
    fact for ANY batch boundary — the mergeable-aggregate contract
    (sum+sum, min-of-min, max-of-max, count) holds at every split."""
    from dwh_etl_ods_spark_jobs_spark.operators.incremental import merge_agg_state

    split_at = min(split_at, len(rows))
    old, new = rows[:split_at], rows[split_at:]

    def agg(part):
        part_df = spark.createDataFrame(part, "k int, v long") if part else (
            spark.range(0).select(
                F.lit(None).cast("int").alias("k"), F.lit(None).cast("long").alias("v")
            )
        )
        return part_df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    merged = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in merge_agg_state(
            agg(old), agg(new), ["k"], sum_cols=["s"], min_cols=["mn"],
            max_cols=["mx"], count_col="n",
        ).collect()
    }

    want: dict[int, tuple] = {}
    for k, v in rows:
        if k not in want:
            want[k] = (1, v, v, v)
        else:
            n, s, mn, mx = want[k]
            want[k] = (n + 1, s + v, min(mn, v), max(mx, v))
    assert merged == want


@given(pts=st.lists(st.tuples(st.integers(0, 2**20), st.integers(0, 2**20)), min_size=1, max_size=20))
@SET
def test_morton_code_matches_python(spark, pts):
    """Morton interleave == the Python bit replication for ANY
    coordinates: low 16 bits of x in even positions, y in odd."""
    from dwh_etl_ods_spark_jobs_spark.operators.layout import morton_code

    df = spark.createDataFrame(pts, "x long, y long")
    got = [r.z for r in df.select(morton_code(F.col("x"), F.col("y")).alias("z")).collect()]

    want = []
    for x, y in pts:
        xm, ym = x & 0xFFFF, y & 0xFFFF
        z = 0
        for i in range(16):
            z |= ((xm >> i) & 1) << (2 * i)
            z |= ((ym >> i) & 1) << (2 * i + 1)
        want.append(z)
    assert got == want


_asof_left = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 2)), st.integers(0, 20)),
    min_size=1,
    max_size=12,
)
_asof_right = st.dictionaries(
    st.tuples(st.integers(0, 2), st.integers(0, 20)),
    st.one_of(st.none(), st.integers(0, 9)),
    min_size=0,
    max_size=12,
)


@given(left=_asof_left, right=_asof_right, inner=st.booleans())
@SET
def test_asof_join_matches_python(spark, left, right, inner):
    """ASOF join == the Python latest-at-or-before pick for ANY streams:
    NULL keys never match, equal timestamps match, NULL as-of values
    return NULL (never an older non-NULL), inner mode drops misses."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import asof_join

    lrows = [(i, k, t) for i, (k, t) in enumerate(left)]
    ldf = spark.createDataFrame(lrows, "i int, k int, lts long")
    rrows = [(k, t, v) for (k, t), v in right.items()]
    rdf = spark.createDataFrame(rrows, "k int, rts long, v int") if rrows else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("k"),
            F.lit(None).cast("long").alias("rts"),
            F.lit(None).cast("int").alias("v"),
        )
    )
    how = "inner" if inner else "left"
    got = {
        r.i: r.v
        for r in asof_join(ldf, rdf, ["k"], "lts", "rts", ["v"], how=how).collect()
    }

    want = {}
    for i, k, t in lrows:
        cands = [
            (rt, v) for (rk, rt), v in right.items() if k is not None and rk == k and rt <= t
        ]
        if cands:
            want[i] = max(cands)[1]
        elif not inner:
            want[i] = None
    assert got == want


@given(texts=st.lists(st.text("abc XY.,9-", min_size=0, max_size=25), min_size=1, max_size=8))
@SET
def test_token_counts_match_python(spark, texts):
    """token_count and the BPE-ish count == the Python replication for
    ANY text: tokenizer parity, ceil(len/4) word charges, one token per
    punctuation char."""
    import math
    import re

    from dwh_etl_ods_spark_jobs_spark.text import bpe_ish_token_count, token_count

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: (r.tc, r.bc)
        for r in df.select(
            "id",
            token_count(F.col("text")).alias("tc"),
            bpe_ish_token_count(F.col("text")).alias("bc"),
        ).collect()
    }

    want = {}
    for i, t in rows:
        toks = _py_tokens(t)
        punct = len(re.sub(r"[A-Za-z0-9\s]", "", t))
        want[i] = (len(toks), sum(math.ceil(len(w) / 4) for w in toks) + punct)
    assert got == want


_langy_text = st.lists(
    st.sampled_from(
        ["the", "and", "of", "le", "la", "les", "der", "und", "die",
         "el", "los", "que", "zebra", "q7", "is", "est", "ist", "es"]
    ),
    min_size=0,
    max_size=12,
).map(" ".join)


@given(texts=st.lists(_langy_text, min_size=1, max_size=8))
@SET
def test_quality_features_and_langid_match_python(spark, texts):
    """Quality features, the composite score, and stopword-vote langid
    == the Python replication for ANY text: fixed-order IEEE ratios
    under the 6-decimal round, strict-majority language vote with the
    'und' tie/zero rule."""
    from dwh_etl_ods_spark_jobs_spark.text import (
        EN_STOPWORDS,
        LANG_STOPWORDS,
        langid,
        quality_features,
        quality_score,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    feats = quality_features(F.col("text"))
    got = {
        r.id: (
            r.n_chars, r.n_tokens, r.mean_token_len, r.stopword_ratio,
            r.punct_ratio, r.alpha_ratio, r.score, r.lang,
        )
        for r in df.select(
            "id",
            *[v.alias(k) for k, v in feats.items()],
            quality_score(F.col("text")).alias("score"),
            langid(F.col("text")).alias("lang"),
        ).collect()
    }

    import re

    want = {}
    for i, t in rows:
        toks = _py_tokens(t)
        n_chars, n_toks = len(t), len(toks)
        st_ratio = _round_half_up(
            sum(1 for w in toks if w in EN_STOPWORDS) / max(n_toks, 1), 6
        )
        p_ratio = _round_half_up(
            len(re.sub(r"[A-Za-z0-9\s]", "", t)) / max(n_chars, 1), 6
        )
        a_ratio = _round_half_up(
            len(re.sub(r"[^A-Za-z]", "", t)) / max(n_chars, 1), 6
        )
        mean_tl = _round_half_up(sum(len(w) for w in toks) / max(n_toks, 1), 6)
        score = _round_half_up(
            0.4 * min(n_toks / 100.0, 1.0)
            + 0.4 * min(st_ratio * 5, 1.0)
            + 0.2 * (1.0 - min(p_ratio * 10, 1.0)),
            6,
        )
        votes = {
            lg: sum(1 for w in toks if w in words)
            for lg, words in LANG_STOPWORDS.items()
        }
        best = max(votes.values())
        leaders = [lg for lg, v in votes.items() if v == best]
        lang = leaders[0] if best > 0 and len(leaders) == 1 else "und"
        want[i] = (n_chars, n_toks, mean_tl, st_ratio, p_ratio, a_ratio, score, lang)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-400, 400)),
        min_size=1,
        max_size=25,
    ),
    k=st.integers(1, 4),
)
@SET
def test_robust_outlier_census_matches_python(spark, rows, k):
    """Median/MAD outlier census == the Python exact-halves replication
    for ANY grouped cents data and k: med_c2/mad_c4 as exact BIGINTs
    and the pure integer 2|2c−med| > k·mad rule."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import robust_outlier_census

    data = [(g, c / 100.0) for g, c in rows]
    df = spark.createDataFrame(data, "g int, x double")
    got = {
        r.g: (r.n, r.med_c2, r.mad_c4, r.n_outliers)
        for r in df.transform(robust_outlier_census(["g"], "x", k=k)).collect()
    }

    def med2(vals):
        s = sorted(vals)
        m = len(s) // 2
        return 2 * s[m] if len(s) % 2 else s[m - 1] + s[m]

    groups: dict[int, list] = {}
    for g, c in rows:
        groups.setdefault(g, []).append(c)
    want = {}
    for g, cs in groups.items():
        m2 = med2(cs)
        abs2 = [abs(2 * c - m2) for c in cs]
        m4 = med2(abs2)
        out = sum(1 for a in abs2 if 2 * a > k * m4)
        want[g] = (len(cs), m2, m4, out)
    assert got == want


_dq_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.one_of(st.none(), st.integers(0, 2))),
    min_size=1,
    max_size=20,
)


@given(rows=_dq_rows, min_ppm=st.sampled_from([500_000, 900_000, 1_000_000]))
@SET
def test_dq_expectations_and_quarantine_match_python(spark, rows, min_ppm):
    """DQ expectations and quarantine routing == the Python replication
    for ANY data and threshold: NULL predicates fail, NULL-bearing key
    tuples count as distinct, ppm gates truncate, and quarantined rows
    carry the declaration-ordered failure list."""
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        RowCheck,
        dq_expectations,
        quarantine_split,
    )

    checks = [
        RowCheck("a_nonnull", lambda: F.col("a").isNotNull(), "a IS NOT NULL", min_ppm),
        RowCheck("a_small", lambda: F.col("a") <= 3, "a <= 3", min_ppm),
    ]
    from dwh_etl_ods_spark_jobs_spark.operators.quality import UniqueCheck

    uniq = UniqueCheck("ab_unique", ("a", "b"), min_ppm)
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        r.check_name: (r.n_rows, r.n_ok, r.metric_ppm, r.passed)
        for r in dq_expectations(df, "t", [*checks, uniq]).collect()
    }

    n = len(rows)
    oks = {
        "a_nonnull": sum(1 for a, _ in rows if a is not None),
        "a_small": sum(1 for a, _ in rows if a is not None and a <= 3),
        "ab_unique": len(set(rows)),
    }
    want = {
        name: (n, ok, ok * 1_000_000 // n, int(ok * 1_000_000 // n >= min_ppm))
        for name, ok in oks.items()
    }
    assert got == want

    passed, quar = quarantine_split(df, checks)
    got_pass = sorted(((r.a, r.b) for r in passed.collect()), key=repr)
    got_quar = sorted(
        ((r.a, r.b, r.failed_checks) for r in quar.collect()), key=repr
    )
    want_pass, want_quar = [], []
    for a, b in rows:
        fails = []
        if a is None:
            fails.append("a_nonnull")
        if not (a is not None and a <= 3):
            fails.append("a_small")
        if fails:
            want_quar.append((a, b, ",".join(fails)))
        else:
            want_pass.append((a, b))
    assert got_pass == sorted(want_pass, key=repr)
    assert got_quar == sorted(want_quar, key=repr)


@given(
    vecs=st.lists(_nz_vec3, min_size=2, max_size=8),
    cents=st.lists(_nz_vec3, min_size=1, max_size=4),
    nprobe=st.integers(1, 3),
)
@SET
def test_ivf_assign_and_topk_match_python(spark, vecs, cents, nprobe):
    """IVF coarse assignment and probe-restricted top-k == the Python
    replication for ANY vectors/codebook/nprobe: max-cosine cells with
    lowest-id ties, exactly-once pair scoring, rounded-cosine ranking."""
    from dwh_etl_ods_spark_jobs_spark.similarity import ann_ivf_topk, ivf_assign

    vrows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    crows = [(i, [float(x) for x in v]) for i, v in enumerate(cents)]
    vdf = spark.createDataFrame(vrows, "id int, vec array<double>")
    cdf = spark.createDataFrame(crows, "id int, vec array<double>")

    def cells_of(v, n):
        scored = sorted((-_py_cos(v, c), ci) for ci, c in crows)
        return [ci for _, ci in scored[:n]]

    got_cells = {
        (r.id, r.cell)
        for r in ivf_assign(vdf, cdf, "id", "vec", n_cells=nprobe).collect()
    }
    want_cells = {
        (i, ci) for i, v in vrows for ci in cells_of(v, nprobe)
    }
    assert got_cells == want_cells

    k = 3
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in ann_ivf_topk(vdf, vdf, cdf, "id", "vec", k=k, nprobe=nprobe).collect()
    }
    cand_cell = {i: cells_of(v, 1)[0] for i, v in vrows}
    want = {}
    for qi, qv in vrows:
        probed = set(cells_of(qv, nprobe))
        scored = sorted(
            (-_round_half_up(_py_cos(qv, cv), 6), ni)
            for ni, cv in vrows
            if ni != qi and cand_cell[ni] in probed
        )
        for rank, (negc, ni) in enumerate(scored[:k], start=1):
            want[(qi, rank)] = (ni, -negc)
    assert got == want


@given(texts=st.lists(st.one_of(st.none(), st.text("aB c\t2.", min_size=0, max_size=20)), min_size=1, max_size=10))
@SET
def test_fingerprints_match_python(spark, texts):
    """Exact and min-sampled content fingerprints == the Python
    replication for ANY text: lowercase/whitespace-collapse
    normalization (NULL to ''), md5 hex, and the min 60-bit hash over
    char n-grams with the short-text whole-string gram."""
    import hashlib
    import re

    from dwh_etl_ods_spark_jobs_spark.text import (
        FINGERPRINT_NGRAM,
        content_fingerprint,
        exact_fingerprint,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: (r.ef, r.cf)
        for r in df.select(
            "id",
            exact_fingerprint(F.col("text")).alias("ef"),
            content_fingerprint(F.col("text")).alias("cf"),
        ).collect()
    }

    want = {}
    for i, t in rows:
        norm = re.sub(r"\s+", " ", (t or "").lower()).strip()
        ef = hashlib.md5(norm.encode()).hexdigest()
        grams = [
            norm[p : p + FINGERPRINT_NGRAM]
            for p in range(max(len(norm) - (FINGERPRINT_NGRAM - 1), 1))
        ]
        cf = min(
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        )
        want[i] = (ef, cf)
    assert got == want


@given(
    corpus=_doc_words,
    bench=_doc_words,
    n=st.integers(1, 3),
    min_overlap=st.integers(1, 2),
)
@SET
def test_ngram_decontaminate_matches_python(spark, corpus, bench, n, min_overlap):
    """Benchmark n-gram decontamination == the Python set replication
    for ANY corpus/benchmark/width: distinct word n-grams per side,
    short documents gram-less, the overlap floor, and the IEEE overlap
    fraction."""
    from dwh_etl_ods_spark_jobs_spark.curation import ngram_decontaminate

    crows = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    brows = [(i, " ".join(ws)) for i, ws in enumerate(bench)]
    cdf = spark.createDataFrame(crows, "id int, text string")
    bdf = spark.createDataFrame(brows, "id int, text string")
    got = {
        r.id: (r.overlap_ngrams, r.total_ngrams, r.overlap_frac)
        for r in cdf.transform(
            ngram_decontaminate(bdf, "id", "text", n=n, min_overlap=min_overlap)
        ).collect()
    }

    def grams(text):
        ts = text.split(" ")
        if len(ts) < n:
            return set()
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}

    bench_grams = set()
    for _, t in brows:
        bench_grams |= grams(t)
    want = {}
    for i, t in crows:
        g = grams(t)
        if not g:
            continue
        ov = len(g & bench_grams)
        if ov >= min_overlap:
            want[i] = (ov, len(g), ov / len(g))
    assert got == want


@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["aa bb", "cc dd", "ee", "aa bb cc"]), st.integers(0, 2)),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_cross_source_leakage_matches_python(spark, docs):
    """Cross-source exact-text leakage census == the Python fold for ANY
    doc/source mix: md5 fingerprint groups, distinct-source floor of 2,
    and the min-id survivor."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.curation import cross_source_leakage

    rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string, src int")
    got = {
        r.fp: (r.n_sources, r.n_docs, r.first_doc_id)
        for r in df.transform(cross_source_leakage("id", "text", "src")).collect()
    }

    groups: dict[str, list] = {}
    for i, t, s in rows:
        groups.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append((i, s))
    want = {}
    for fp, members in groups.items():
        srcs = {s for _, s in members}
        if len(srcs) >= 2:
            want[fp] = (len(srcs), len(members), min(i for i, _ in members))
    assert got == want


_scd_stream = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20), st.one_of(st.none(), st.integers(0, 3))),
    min_size=1,
    max_size=20,
)


@given(stream=_scd_stream)
@SET
def test_changes_to_scd2_matches_python(spark, stream):
    """SCD2 interval build == the Python sequential replication for ANY
    observation stream: NULL-safe change detection, (ts, attr) ordering
    with NULLs first, gap-free intervals, open current row."""
    from dwh_etl_ods_spark_jobs_spark.operators.scd import changes_to_scd2

    df = spark.createDataFrame(stream, "k int, ts long, a int")
    got = sorted(
        ((r.k, r.a, r.effective_from, r.effective_to, r.is_current)
         for r in df.transform(changes_to_scd2("k", "ts", ["a"])).collect()),
        key=repr,
    )

    by_k: dict[int, list] = {}
    for k, ts, a in stream:
        by_k.setdefault(k, []).append((ts, a))
    want = []
    for k, obs in by_k.items():
        obs.sort(key=lambda o: (o[0], o[1] is not None, o[1]))
        points = []
        prev = object()
        first = True
        for ts, a in obs:
            if first or not _nullsafe_eq(a, prev):
                points.append((ts, a))
            prev = a
            first = False
        for i, (ts, a) in enumerate(points):
            to = points[i + 1][0] if i + 1 < len(points) else None
            want.append((k, a, ts, to, to is None))
    assert got == sorted(want, key=repr)


def _nullsafe_eq(a, b):
    return a == b or (a is None and b is None)


@given(
    rows=st.lists(st.integers(-50, 50), min_size=1, max_size=25, unique=True),
    n_bins=st.integers(1, 6),
)
@SET
def test_quantile_bin_matches_python(spark, rows, n_bins):
    """Equal-frequency binning == the Python rank*[n_bins]//n rule for
    ANY unique values and bin count — bins differ by at most one row."""
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_bin

    df = spark.createDataFrame([(v,) for v in rows], "v int")
    got = {r.v: r.bin for r in df.transform(quantile_bin(["v"], n_bins, n_ranges=4)).collect()}

    n = len(rows)
    want = {v: i * n_bins // n for i, v in enumerate(sorted(rows))}
    assert got == want
    sizes = {}
    for b in got.values():
        sizes[b] = sizes.get(b, 0) + 1
    if len(sizes) > 1:
        assert max(sizes.values()) - min(sizes.values()) <= 1


_tsql_dates = st.dates(
    min_value=__import__("datetime").date(1995, 1, 1),
    max_value=__import__("datetime").date(2035, 12, 31),
)


@given(
    pairs=st.lists(st.tuples(_tsql_dates, _tsql_dates), min_size=1, max_size=15),
    n_months=st.integers(-25, 25),
    n_days=st.integers(-40, 40),
)
@SET
def test_tsql_scalar_suite_matches_python(spark, pairs, n_months, n_days):
    """The T-SQL scalar shims == Python datetime replications for ANY
    dates: boundary-crossing DATEDIFF(yy/dd/month), EOMONTH with month
    offsets, DATEADD month-clamping and day arithmetic, DATEFROMPARTS,
    and uppercase-hex HASHBYTES."""
    import calendar
    import datetime as dt
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.functions import (
        dateadd_day,
        dateadd_month,
        datediff_dd,
        datediff_month,
        datediff_yy,
        datefromparts,
        eomonth,
        hashbytes_sha2_256,
    )

    rows = [(i, s, e) for i, (s, e) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i int, s date, e date")
    got = {
        r.i: (r.yy, r.dd, r.mm, r.eom, r.am, r.ad, r.dfp, r.hb)
        for r in df.select(
            "i",
            datediff_yy(F.col("s"), F.col("e")).alias("yy"),
            datediff_dd(F.col("s"), F.col("e")).alias("dd"),
            datediff_month(F.col("s"), F.col("e")).alias("mm"),
            eomonth(F.col("s"), n_months).alias("eom"),
            dateadd_month(n_months, F.col("s")).alias("am"),
            dateadd_day(n_days, F.col("s")).alias("ad"),
            datefromparts(F.year("s"), F.month("s"), F.lit(28)).alias("dfp"),
            hashbytes_sha2_256(F.col("i")).alias("hb"),
        ).collect()
    }

    def add_months(d: dt.date, n: int) -> dt.date:
        y, m = divmod(d.year * 12 + (d.month - 1) + n, 12)
        last = calendar.monthrange(y, m + 1)[1]
        return dt.date(y, m + 1, min(d.day, last))

    want = {}
    for i, s, e in rows:
        shifted = add_months(s, n_months)
        want[i] = (
            e.year - s.year,
            (e - s).days,
            (e.year - s.year) * 12 + (e.month - s.month),
            dt.date(
                shifted.year, shifted.month,
                calendar.monthrange(shifted.year, shifted.month)[1],
            ),
            shifted,
            s + dt.timedelta(days=n_days),
            dt.date(s.year, s.month, 28),
            hashlib.sha256(str(i).encode()).hexdigest().upper(),
        )
    assert got == want


@given(
    cells=st.lists(
        st.one_of(
            st.tuples(st.integers(1, 31), st.integers(1, 12), st.integers(1998, 2032)).map(
                lambda t: f"{t[0]:02d}/{t[1]:02d}/{t[2]}"
            ),
            st.sampled_from(["31/04/2020", "29/02/2019", "00/01/2020", "garbage", "", "2020-01-05"]),
        ),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_convert_103_matches_python(spark, cells):
    """CONVERT(..., 103) == Python strptime dd/MM/yyyy for ANY strings —
    NULL on impossible dates and malformed input, never an error."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.functions import convert_103

    rows = [(i, c) for i, c in enumerate(cells)]
    df = spark.createDataFrame(rows, "i int, c string")
    got = {
        r.i: r.ts
        for r in df.select("i", convert_103(F.col("c")).alias("ts")).collect()
    }

    want = {}
    for i, c in rows:
        try:
            want[i] = dt.datetime.strptime(c, "%d/%m/%Y")
        except ValueError:
            want[i] = None
    assert got == want


@given(texts=_dd_texts, thr=st.sampled_from([0.0, 0.5, 0.9]))
@SET
def test_minhash_lsh_pairs_matches_python(spark, texts, thr):
    """MinHash LSH banding == the Python replication for ANY corpus and
    threshold: candidates are exactly the pairs sharing ≥1 equal band
    slice, scored by the agreeing-component fraction."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.dedup import (
        LSH_BANDS,
        MINHASH_K,
        _minhash_salts,
        minhash_lsh_pairs,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(df, "text", "id", threshold=thr).collect()
    }

    salts = _minhash_salts(MINHASH_K)
    sigs = {}
    for i, t in rows:
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in _py_shingles(_py_tokens(t))
        ]
        sigs[i] = [min(h ^ s for h in hs) for s in salts]
    rows_per = MINHASH_K // LSH_BANDS
    want = {}
    ids = sorted(sigs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            sa, sb = sigs[a], sigs[b]
            shares_band = any(
                sa[bi * rows_per : (bi + 1) * rows_per]
                == sb[bi * rows_per : (bi + 1) * rows_per]
                for bi in range(LSH_BANDS)
            )
            if not shares_band:
                continue
            est = _round_half_up(
                sum(1 for p, q in zip(sa, sb) if p == q) / MINHASH_K, 6
            )
            if est >= thr:
                want[(a, b)] = est
    assert got == want


@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["N/A", "Yes", "No", "x", ""])),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_values_to_null_and_presence_flag_match_python(spark, vals):
    """values_to_null and presence_flag replay the reference's literal
    placeholder and ternary rules for ANY strings, NULL preserved."""
    from dwh_etl_ods_spark_jobs_spark.operators.clean import (
        presence_flag,
        values_to_null,
    )

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v string")
    got_n = {r.i: r.v for r in values_to_null("v", ["N/A", ""])(df).collect()}
    got_p = {r.i: r.v for r in presence_flag("v")(df).collect()}

    want_n = {
        i: (None if v in ("N/A", "") else v) for i, v in enumerate(vals)
    }
    want_p = {
        i: (None if v is None else ("No" if v == "No" else "Yes"))
        for i, v in enumerate(vals)
    }
    assert got_n == want_n
    assert got_p == want_p


_pair_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=15,
)


@given(cand=_pair_lists, truth=_pair_lists, with_n=st.booleans())
@SET
def test_blocking_quality_eval_matches_python(spark, cand, truth, with_n):
    """Blocking quality eval == the Python fold for ANY pair lists:
    orientation-normalized distinct pairs, exact ppm completeness, and
    the C(n,2) reduction ratio."""
    from dwh_etl_ods_spark_jobs_spark.dedup import blocking_quality_eval

    cdf = spark.createDataFrame(cand, "id_a int, id_b int")
    tdf = spark.createDataFrame(truth, "id_a int, id_b int")
    n_rec = 10 if with_n else None
    r = blocking_quality_eval(cdf, tdf, n_records=n_rec).collect()[0]

    cset = {(min(a, b), max(a, b)) for a, b in cand}
    tset = {(min(a, b), max(a, b)) for a, b in truth}
    found = len(tset & cset)
    assert (r.n_cand, r.n_true, r.n_found, r.pair_completeness_ppm) == (
        len(cset), len(tset), found, found * 1_000_000 // len(tset)
    )
    if with_n:
        total = 10 * 9 // 2
        assert r.reduction_ratio_ppm == 1_000_000 - len(cset) * 1_000_000 // total


_payloads = st.lists(
    st.one_of(
        st.none(),
        st.binary(min_size=0, max_size=20),
        st.sampled_from(
            [
                bytes.fromhex("89504E470D0A1A0A") + b"rest",
                b"\xff\xd8\xff\xe0data",
                b"GIF89a..",
                b"BMxxxx",
                b"%PDFxx",
                b"PK\x03\x04zz",
                b"\x1f\x8bgz",
                b"RIFF\x00\x00\x00\x00WAVEfmt ",
                b"RIFF\x00\x00\x00\x00AVI LIST",
                b"RIFFshort",
            ]
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(payloads=_payloads)
@SET
def test_sniff_type_census_matches_python(spark, payloads):
    """Magic-byte sniffing and the type census == the Python replication
    for ANY payloads: signature priority order, RIFF disambiguation at
    offset 8, unknown/NULL/short handling, and byte totals."""
    from dwh_etl_ods_spark_jobs_spark.multimodal import (
        MAGIC_SIGNATURES,
        RIFF_TAGS,
        type_census,
    )

    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {
        r.media_type: (r.n, r.total_bytes)
        for r in type_census(df).collect()
    }

    def sniff(p):
        if p is None:
            return "unknown"
        head = p[:16].hex().upper()
        for name, sig in MAGIC_SIGNATURES:
            if head.startswith(sig):
                return name
        if head.startswith("52494646") and p[8:12].hex().upper() in dict(
            (t, n) for n, t in RIFF_TAGS
        ):
            return {t: n for n, t in RIFF_TAGS}[p[8:12].hex().upper()]
        return "unknown"

    want: dict[str, tuple[int, int]] = {}
    for _, p in rows:
        t = sniff(p)
        n, b = want.get(t, (0, 0))
        want[t] = (n + 1, b + (len(p) if p is not None else 0))
    assert got == want


@given(
    edges=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=15),
    extra_nodes=st.sets(st.integers(0, 9), min_size=1, max_size=6),
)
@SET
def test_connected_components_matches_union_find(spark, edges, extra_nodes):
    """Min-label propagation == a Python union-find for ANY pair graph:
    every node labels with the minimum id reachable through the
    symmetric closure, isolated nodes label themselves."""
    from dwh_etl_ods_spark_jobs_spark.dedup import connected_components

    nodes = sorted(extra_nodes | {n for e in edges for n in e})
    pdf = spark.createDataFrame(edges, "id_a int, id_b int") if edges else (
        spark.range(0).select(
            F.lit(None).cast("int").alias("id_a"),
            F.lit(None).cast("int").alias("id_b"),
        )
    )
    ndf = spark.createDataFrame([(n,) for n in nodes], "id int")
    got = {r.id: r.canonical_id for r in connected_components(pdf, ndf).collect()}

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}
    assert got == want


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    recs=st.lists(
        st.tuples(st.integers(0, 40), st.one_of(st.none(), st.text("abcd", min_size=0, max_size=5))),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    window=st.integers(1, 4),
    max_d=st.one_of(st.none(), st.integers(0, 3)),
)
@SET
def test_sorted_neighborhood_pairs_matches_python(spark, recs, window, max_d):
    """Sorted-neighborhood blocking == the Python replication for ANY
    keys, window, and distance budget: NULL keys excluded, the
    (key, id) total order, exactly the window successors, Levenshtein
    scores."""
    from dwh_etl_ods_spark_jobs_spark.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(recs, "id int, k string")
    got = sorted(
        (r.a_id, r.b_id, r.lev)
        for r in sorted_neighborhood_pairs(
            df, "id", "k", window=window, max_distance=max_d
        ).collect()
    )

    ordered = sorted(((k, i) for i, k in recs if k is not None))
    want = []
    for pos, (ka, ia) in enumerate(ordered):
        for off in range(1, window + 1):
            if pos + off < len(ordered):
                kb, ib = ordered[pos + off]
                lev = _py_lev(ka, kb)
                if max_d is None or lev <= max_d:
                    want.append((ia, ib, lev))
    assert got == sorted(want)


@given(texts=_dd_texts, thr=st.sampled_from([0, 500_000, 900_000]))
@SET
def test_ngram_containment_pairs_matches_python(spark, texts, thr):
    """Shingle containment == the Python set replication for ANY corpus
    and threshold: distinct-shingle intersections, both ppm directions
    exact, either-direction threshold keep."""
    from dwh_etl_ods_spark_jobs_spark.dedup import ngram_containment_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r.id_a, r.id_b): (r.inter, r.na, r.nb, r.cont_a_ppm, r.cont_b_ppm)
        for r in ngram_containment_pairs(df, "text", "id", threshold_ppm=thr).collect()
    }

    sh = {i: set(_py_shingles(_py_tokens(t))) for i, t in rows}
    want = {}
    ids = sorted(sh)
    for xi, a in enumerate(ids):
        for b in ids[xi + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            na, nb = len(sh[a]), len(sh[b])
            ca, cb = inter * 1_000_000 // na, inter * 1_000_000 // nb
            if ca >= thr or cb >= thr:
                want[(a, b)] = (inter, na, nb, ca, cb)
    assert got == want


@given(
    texts=st.lists(
        st.one_of(st.none(), st.sampled_from(["A  b", "a b", "x", "X ", "", "c d e"])),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_exact_dedup_matches_python(spark, texts):
    """Exact dedup == the Python normalize+md5 grouping for ANY texts:
    NULL and empty share one fingerprint, min-id survivor."""
    import hashlib
    import re

    from dwh_etl_ods_spark_jobs_spark.dedup import exact_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.fingerprint: (r.keep_id, r.n_dups)
        for r in exact_dedup(df, "text", "id").collect()
    }

    groups: dict[str, list] = {}
    for i, t in rows:
        norm = re.sub(r"\s+", " ", (t or "").lower()).strip()
        groups.setdefault(hashlib.md5(norm.encode()).hexdigest(), []).append(i)
    want = {fp: (min(ids), len(ids)) for fp, ids in groups.items()}
    assert got == want


@given(vecs=st.lists(_nz_vec3, min_size=2, max_size=10), k=st.integers(1, 3))
@SET
def test_mutual_knn_pairs_matches_python(spark, vecs, k):
    """Mutual kNN == the Python replication for ANY vectors and k:
    hyperplane bucket-mate candidate lists, (cos desc, id) directed
    top-k, and the reciprocal filter with both ranks."""
    from dwh_etl_ods_spark_jobs_spark.dedup import hyperplanes, mutual_knn_pairs

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, vec array<double>")
    n_planes = 3
    got = {
        (r.id_a, r.id_b): (r.cos, r.rank_ab, r.rank_ba)
        for r in mutual_knn_pairs(df, "vec", "id", k=k, dim=3, n_planes=n_planes).collect()
    }

    planes = hyperplanes(3, n_planes)

    def sig(v):
        s = 0
        for p, plane in enumerate(planes):
            acc = 0.0
            for x, w in zip(v, plane):
                acc = acc + x * w
            if acc > 0:
                s |= 1 << p
        return s

    sigs = {i: sig(v) for i, v in rows}
    directed = {}
    for a, av in rows:
        cands = sorted(
            (-_round_half_up(_py_cos(av, bv), 6), b)
            for b, bv in rows
            if b != a and sigs[b] == sigs[a]
        )
        for rank, (negc, b) in enumerate(cands[:k], start=1):
            directed[(a, b)] = (-negc, rank)
    want = {}
    for (a, b), (c, r_ab) in directed.items():
        if a < b and (b, a) in directed:
            want[(a, b)] = (c, r_ab, directed[(b, a)][1])
    assert got == want


@given(texts=_dd_texts, thr=st.sampled_from([0.0, 0.4, 0.8]))
@SET
def test_ngram_jaccard_pairs_matches_python(spark, texts, thr):
    """Shingle-blocked exact Jaccard == the Python set replication for
    ANY corpus and threshold: distinct-shingle intersections, the
    6-decimal rounded ratio, threshold keep."""
    from dwh_etl_ods_spark_jobs_spark.dedup import ngram_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "text", "id", threshold=thr).collect()
    }

    sh = {i: set(_py_shingles(_py_tokens(t))) for i, t in rows}
    want = {}
    ids = sorted(sh)
    for xi, a in enumerate(ids):
        for b in ids[xi + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = _round_half_up(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
            if j >= thr:
                want[(a, b)] = j
    assert got == want


@given(vecs=st.lists(_nz_vec3, min_size=2, max_size=10), thr=st.sampled_from([-1.0, 0.5, 0.9]))
@SET
def test_embedding_neardup_pairs_matches_python(spark, vecs, thr):
    """LSH-bucketed embedding near-dup == the Python replication for ANY
    vectors and threshold: literal-plane signatures gate the candidate
    pairs, exact cosine verifies."""
    from dwh_etl_ods_spark_jobs_spark.dedup import (
        embedding_neardup_pairs,
        hyperplanes,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, vec array<double>")
    n_planes = 3
    got = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_neardup_pairs(
            df, "vec", "id", threshold=thr, dim=3, n_planes=n_planes
        ).collect()
    }

    planes = hyperplanes(3, n_planes)

    def sig(v):
        s = 0
        for p, plane in enumerate(planes):
            acc = 0.0
            for x, w in zip(v, plane):
                acc = acc + x * w
            if acc > 0:
                s |= 1 << p
        return s

    want = {}
    for ai, (a, av) in enumerate(rows):
        for b, bv in rows[ai + 1 :]:
            if sig(av) != sig(bv):
                continue
            c = _round_half_up(_py_cos(av, bv), 6)
            if c >= thr:
                want[(a, b)] = c
    assert got == want


@given(texts=_dd_texts, thr=st.sampled_from([200_000, 500_000, 900_000]))
@SET
def test_prefix_filter_jaccard_matches_bruteforce(spark, texts, thr):
    """Prefix-filtered Jaccard join == the brute-force pair scan at ANY
    threshold — the prefix-filtering lemma loses NO qualifying pair, and
    inter/sizes/ppm are exact."""
    from dwh_etl_ods_spark_jobs_spark.dedup import prefix_filter_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r.id_a, r.id_b): (r.inter, r.na, r.nb, r.jaccard_ppm)
        for r in prefix_filter_jaccard_pairs(df, "text", "id", threshold_ppm=thr).collect()
    }

    sh = {i: set(_py_shingles(_py_tokens(t))) for i, t in rows}
    want = {}
    ids = sorted(sh)
    for xi, a in enumerate(ids):
        for b in ids[xi + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            na, nb = len(sh[a]), len(sh[b])
            ppm = inter * 1_000_000 // (na + nb - inter)
            if ppm >= thr:
                want[(a, b)] = (inter, na, nb, ppm)
    assert got == want


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10**6), st.integers(1, 100)),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_tumbling_rollup_matches_python(spark, events):
    """Tumbling day windows == the Python date_trunc fold for ANY
    events: per-(window, group) counts and sums."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import tumbling_rollup

    rows = [(g, s, v) for g, s, v in events]
    df = spark.createDataFrame(rows, "g int, s long, v long").withColumn(
        "ts", F.timestamp_seconds(F.col("s"))
    )
    got = {
        (r.window_start, r.g): (r.n, r.sv)
        for r in tumbling_rollup(
            df, "ts", "day", ["g"],
            [F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")],
        ).collect()
    }

    want: dict[tuple, tuple] = {}
    for g, s, v in rows:
        d = dt.datetime.fromtimestamp(s).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        n, sv = want.get((d, g), (0, 0))
        want[(d, g)] = (n + 1, sv + v)
    assert got == want


@given(batch=_dd_texts, store=_dd_texts, thr=st.sampled_from([200_000, 500_000]))
@SET
def test_incremental_lsh_dedup_matches_python(spark, batch, store, thr):
    """Incremental store dedup == the Python replication for ANY batch
    and store: band-slice candidate gates on both sides, exact agree
    estimates, (max est, min id) best picks, earlier-id batch rule,
    -1/0 defaults, and the is_new flag."""
    import hashlib

    from dwh_etl_ods_spark_jobs_spark.dedup import (
        LSH_BANDS,
        MINHASH_K,
        _minhash_salts,
        incremental_lsh_dedup,
        minhash_signatures,
    )

    brows = [(i, t) for i, t in enumerate(batch)]
    srows = [(100 + i, t) for i, t in enumerate(store)]
    bdf = spark.createDataFrame(brows, "id int, text string")
    sdf = spark.createDataFrame(srows, "id int, text string")
    store_sigs = minhash_signatures(sdf, "text", "id")
    got = {
        r.doc_id: (
            r.store_dup_of, r.store_est_micro,
            r.batch_dup_of, r.batch_est_micro, r.is_new,
        )
        for r in incremental_lsh_dedup(
            bdf, store_sigs, "text", "id", threshold_micro=thr
        ).collect()
    }

    salts = _minhash_salts(MINHASH_K)

    def sig_of(t):
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in _py_shingles(_py_tokens(t))
        ]
        return [min(h ^ s for h in hs) for s in salts]

    bsigs = {i: sig_of(t) for i, t in brows}
    ssigs = {i: sig_of(t) for i, t in srows}
    rows_per = MINHASH_K // LSH_BANDS

    def shares_band(sa, sb):
        return any(
            sa[bi * rows_per : (bi + 1) * rows_per]
            == sb[bi * rows_per : (bi + 1) * rows_per]
            for bi in range(LSH_BANDS)
        )

    def best(nid, others):
        ms = []
        sa = bsigs[nid]
        for oid, sb in others:
            if not shares_band(sa, sb):
                continue
            est = sum(1 for p, q in zip(sa, sb) if p == q) * 1_000_000 // MINHASH_K
            if est >= thr:
                ms.append((est, oid))
        if not ms:
            return None
        top = max(e for e, _ in ms)
        return (min(o for e, o in ms if e == top), top)

    want = {}
    for nid, _ in brows:
        bs = best(nid, ssigs.items())
        bb = best(nid, [(o, s) for o, s in bsigs.items() if o < nid])
        want[nid] = (
            bs[0] if bs else -1,
            bs[1] if bs else 0,
            bb[0] if bb else -1,
            bb[1] if bb else 0,
            int(bs is None and bb is None),
        )
    assert got == want


@given(
    facts=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 100)),
        min_size=1,
        max_size=15,
    ),
    pat=st.dictionaries(st.integers(0, 5), st.sampled_from(["F", "M"]), min_size=0, max_size=6),
    fac=st.dictionaries(st.integers(0, 3), st.integers(1000, 1010), min_size=0, max_size=4),
    inner=st.booleans(),
)
@SET
def test_star_enrich_matches_python(spark, facts, pat, fac, inner):
    """Star enrichment == the Python dict-join replication for ANY fact
    and dimension data, in both inner and left modes, with the
    authoritative-dim column-collision drop."""
    from dwh_etl_ods_spark_jobs_spark.operators.enrich import star_enrich

    fdf = spark.createDataFrame(facts, "pk int, fk int, v int")
    pdf = spark.createDataFrame(
        list(pat.items()), "patient_id int, gender string"
    ) if pat else spark.range(0).select(
        F.lit(None).cast("int").alias("patient_id"),
        F.lit(None).cast("string").alias("gender"),
    )
    fdf2 = spark.createDataFrame(
        list(fac.items()), "fac_id int, code int"
    ) if fac else spark.range(0).select(
        F.lit(None).cast("int").alias("fac_id"),
        F.lit(None).cast("int").alias("code"),
    )
    how = "inner" if inner else "left"
    got = sorted(
        ((r.pk, r.fk, r.v, r.gender, r.code)
         for r in star_enrich(
             fdf,
             [
                 (pdf, {"pk": "patient_id"}, ["gender"], True),
                 (fdf2, {"fk": "fac_id"}, ["code"], True),
             ],
             how=how,
         ).collect()),
        key=repr,
    )

    want = []
    for pk, fk, v in facts:
        g = pat.get(pk)
        c = fac.get(fk)
        if inner and (pk not in pat or fk not in fac):
            continue
        want.append((pk, fk, v, g, c))
    assert got == sorted(want, key=repr)
