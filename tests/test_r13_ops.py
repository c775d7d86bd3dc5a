"""Unit/property tests for the r13-wave operators on hand-built frames
(the staged_r13 surface tests cover engine parity; these pin semantics
the oracle comparison cannot see — churn bounds, salt-phase containment,
digest-prefilter behavior, UCB monotonicity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- rendezvous -------------------------------------------------------------


def test_rendezvous_assign_is_stable_and_complete(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.sharding import (
        rendezvous_assign,
    )

    df = spark.range(2000).select(F.col("id").alias("k"))
    shards = ["a", "b", "c", "d"]
    out = rendezvous_assign(df, "k", shards).collect()
    by_shard: dict[str, int] = {}
    for r in out:
        by_shard[r.shard] = by_shard.get(r.shard, 0) + 1
    assert set(by_shard) == set(shards)  # every shard gets keys
    # roughly uniform: no shard more than 2x the fair share
    assert max(by_shard.values()) < 2 * 2000 / len(shards)
    # deterministic: second run identical
    out2 = rendezvous_assign(df, "k", shards).collect()
    assert {r.k: r.shard for r in out} == {r.k: r.shard for r in out2}


def test_rendezvous_churn_grow_by_one_moves_about_one_nth(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.sharding import (
        rendezvous_churn,
    )

    df = spark.range(4000).select(F.col("id").alias("k"))
    old = [f"s{i}" for i in range(7)]
    row = rendezvous_churn(df, "k", old, old + ["s7"]).collect()[0]
    # theory: 1/8 = 125000 ppm; allow generous sampling slack
    assert 80_000 <= row.moved_ppm <= 170_000
    # removing no shard and adding none moves nothing
    row = rendezvous_churn(df, "k", old, list(old)).collect()[0]
    assert row.n_moved == 0 and row.moved_ppm == 0


def test_rendezvous_only_movers_go_to_the_new_shard(spark):
    """The defining rendezvous property: growing the ring only moves
    keys INTO the new shard — no key moves between surviving shards."""
    from dwh_etl_ods_spark_jobs_spark.operators.sharding import (
        rendezvous_assign,
    )

    df = spark.range(3000).select(F.col("id").alias("k"))
    old = ["a", "b", "c"]
    o = {r.k: r.shard for r in rendezvous_assign(df, "k", old).collect()}
    n = {
        r.k: r.shard
        for r in rendezvous_assign(df, "k", old + ["d"]).collect()
    }
    for k, s_new in n.items():
        if o[k] != s_new:
            assert s_new == "d", f"key {k} moved {o[k]} -> {s_new}, not to d"


def test_rendezvous_rejects_too_many_shards(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.sharding import (
        rendezvous_assign,
    )

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        rendezvous_assign(df, "k", [f"s{i}" for i in range(17)])


# --- salted grouped top-k ---------------------------------------------------


def test_salted_topk_equals_single_window_form(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        salted_grouped_topk,
    )
    from pyspark.sql import Window

    rows = [(f"g{i % 3}", (i * 37) % 500, i) for i in range(600)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {
        (r.g, r.rank): (r.v, r.id)
        for r in salted_grouped_topk(df, ["g"], "v", "id", 7).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    expect = {
        (r.g, r.rank): (r.v, r.id)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
        .collect()
    }
    assert got == expect


def test_salted_topk_group_smaller_than_k(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        salted_grouped_topk,
    )

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 9, 2), ("h", 1, 3)], "g string, v long, id long"
    )
    out = salted_grouped_topk(df, ["g"], "v", "id", 10).collect()
    assert len(out) == 3  # emits what exists, never pads


# --- merkle range diff ------------------------------------------------------


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


def test_merkle_diff_classifies_added_removed_changed(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff,
    )

    old = _mk(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, "w", 40)])
    new = _mk(spark, [(1, "x", 10), (2, "y", 99), (4, "w", 40), (5, "v", 50)])
    out = merkle_range_diff(old, new, "k", ["a", "b"], n_buckets=4).collect()
    tot = {
        "added": sum(r.n_added for r in out),
        "removed": sum(r.n_removed for r in out),
        "changed": sum(r.n_changed for r in out),
    }
    assert tot == {"added": 1, "removed": 1, "changed": 1}


def test_merkle_diff_identical_tables_emit_nothing(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff,
    )

    t = _mk(spark, [(i, f"s{i}", i * 10) for i in range(50)])
    assert merkle_range_diff(t, t, "k", ["a", "b"], n_buckets=8).count() == 0


def test_merkle_diff_null_values_distinguished(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff,
    )

    old = _mk(spark, [(1, None, 10)])
    new = _mk(spark, [(1, "None", 10)])
    out = merkle_range_diff(old, new, "k", ["a", "b"], n_buckets=2).collect()
    assert sum(r.n_changed for r in out) == 1  # NULL != 'None' (ADVICE r7)


# --- UCB --------------------------------------------------------------------


def test_ucb_bonus_shrinks_with_pulls_and_bounds_mean(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import ucb_arm_scores

    rows = [("few", 100)] * 5 + [("many", 100)] * 500
    df = spark.createDataFrame(rows, "arm string, r long")
    out = {r.arm: r for r in ucb_arm_scores(df, "arm", "r").collect()}
    assert out["few"].bonus_6 > out["many"].bonus_6  # less explored
    # both arms always hit max reward -> normalized mean exactly 1.0
    assert out["few"].mean_reward_6 == 1.0 == out["many"].mean_reward_6
    for r in out.values():
        assert r.ucb_6 == round(r.mean_reward_6 + r.bonus_6, 6)


# --- growth accounting ------------------------------------------------------


def test_growth_accounting_hand_timeline(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        growth_accounting,
    )
    import datetime as dt

    d = dt.date
    rows = [
        (1, d(2024, 1, 1)), (2, d(2024, 1, 1)),
        (1, d(2024, 1, 2)), (3, d(2024, 1, 2)), (3, d(2024, 1, 2)),
        (2, d(2024, 1, 4)),
    ]
    df = spark.createDataFrame(rows, "u long, day date")
    out = {str(r.day): r for r in growth_accounting(df, "u", "day").collect()}
    assert (out["2024-01-01"].active, out["2024-01-01"].new) == (2, 2)
    assert (out["2024-01-02"].active, out["2024-01-02"].new) == (2, 1)
    assert out["2024-01-02"].returning == 1
    assert "2024-01-03" not in out  # silent day emits no row
    assert (out["2024-01-04"].active, out["2024-01-04"].new) == (1, 0)
    assert out["2024-01-04"].cumulative == 3


# --- co-purchase projection -------------------------------------------------


def test_copurchase_projection_hand_baskets(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import copurchase_projection

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"), (4, "d"),
        (5, "a"), (5, "a"),  # duplicate item in basket counts once
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r.item_a, r.item_b): r.support
        for r in copurchase_projection(
            df, "basket", "item", min_support=1, top_k=10
        ).collect()
    }
    assert out[("a", "b")] == 3
    assert out[("a", "c")] == 1 and out[("b", "c")] == 1
    assert out[("c", "d")] == 1
    assert ("a", "a") not in out  # self-pairs excluded, dup item once


def test_copurchase_max_basket_caps_heavy_tail(spark):
    """A pathological basket (bot session) must contribute C(m, 2)
    pairs under max_basket=m, not C(n, 2) — the in-operator hot-key
    cap (VERDICT r10 #4). The cut is the first m items in item order,
    identical on both engines."""
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.graph import (
        copurchase_projection,
        copurchase_projection_sql,
    )

    bot = [(99, f"i{k:03d}") for k in range(40)]  # one 40-item basket
    normal = [(1, "i000"), (1, "i001"), (2, "i000"), (2, "i001")]
    df = spark.createDataFrame(bot + normal, "basket long, item string")
    out = copurchase_projection(
        df, "basket", "item", min_support=1, top_k=1000, max_basket=5
    ).collect()
    # capped basket: C(5,2)=10 pairs among i000..i004; the two normal
    # baskets only add support to (i000, i001)
    assert len(out) == 10
    sup = {(r.item_a, r.item_b): r.support for r in out}
    assert sup[("i000", "i001")] == 3  # bot (capped) + 2 normal baskets
    assert all(a < "i005" and b < "i005" for a, b in sup)
    # DuckDB oracle renders the same cap
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW bk AS SELECT * FROM (VALUES "
        + ", ".join(f"({b}, '{i}')" for b, i in bot + normal)
        + ") t(basket, item)"
    )
    sql = copurchase_projection_sql(
        "bk", "basket", "item", min_support=1, top_k=1000, max_basket=5
    )
    oracle = {
        (a, b): (s, l)
        for a, b, s, l in con.execute(sql).fetchall()
    }
    got = {(r.item_a, r.item_b): (r.support, r.lift_ppm) for r in out}
    assert got == oracle


def test_copurchase_min_support_and_topk(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import copurchase_projection

    rows = [(b, i) for b in range(6) for i in ("x", "y")] + [(9, "p"), (9, "q")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = copurchase_projection(
        df, "basket", "item", min_support=2, top_k=10
    ).collect()
    assert [(r.item_a, r.item_b, r.support) for r in out] == [("x", "y", 6)]


# --- ACF --------------------------------------------------------------------


def test_acf_perfect_period_two(spark):
    """An alternating series has acf(1) = -1 and acf(2) = +1 exactly."""
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import acf_lags

    rows = [(t, 10 if t % 2 == 0 else 20) for t in range(40)]
    df = spark.createDataFrame(rows, "t long, v long")
    out = {r.lag: r for r in acf_lags(df, "t", "v", max_lag=3).collect()}
    assert out[1].acf_6 == -1.0
    assert out[2].acf_6 == 1.0
    assert out[1].n == 39 and out[2].n == 38  # overlap spans
    assert out[3].acf_6 == -1.0


def test_acf_linear_trend_is_near_one(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import acf_lags

    rows = [(t, 100 + 7 * t) for t in range(30)]
    df = spark.createDataFrame(rows, "t long, v long")
    out = {r.lag: r.acf_6 for r in acf_lags(df, "t", "v", max_lag=2).collect()}
    assert out[1] > 0.99 and out[2] > 0.98  # trend dominates


def test_copurchase_lift_flags_independence(spark):
    """Lift separates association from popularity: a pair that co-occurs
    exactly as often as independence predicts reads ~10⁶ ppm; a pair
    that ALWAYS co-occurs reads n_baskets/cnt× higher."""
    from dwh_etl_ods_spark_jobs_spark.graph import copurchase_projection

    # 4 baskets; x,y always together (2 of 4); p in all 4, q in 2 with p
    rows = [
        (1, "x"), (1, "y"), (2, "x"), (2, "y"),
        (1, "p"), (2, "p"), (3, "p"), (4, "p"),
        (3, "q"), (4, "q"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r.item_a, r.item_b): r.lift_ppm
        for r in copurchase_projection(
            df, "basket", "item", min_support=1, top_k=10
        ).collect()
    }
    # x,y: support 2, cnt 2 each, 4 baskets -> 2*4/(2*2) = 2.0
    assert out[("x", "y")] == 2_000_000
    # p,q: support 2, cnt_p 4, cnt_q 2 -> 2*4/(4*2) = 1.0 (independent)
    assert out[("p", "q")] == 1_000_000


# --- pinball loss -----------------------------------------------------------


def test_pinball_loss_hand_values_and_asymmetry(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        pinball_loss,
    )

    # actual 0..9, predict constant 5
    rows = [("g", v, 5) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, y long, p long")
    # q=0.9: sum = 0.9*sum(err+) + 0.1*sum(-err-) over err=y-5
    # err+: 1+2+3+4=10 ; err-: 1+2+3+4+5=15
    # mean = (0.9*10 + 0.1*15)/10 = 1.05 -> 1050 milli
    out = pinball_loss(df, ["g"], "y", "p", 9, 10).collect()[0]
    assert out.mean_pinball_milli == 1050
    # q=0.1 flips the asymmetry: (0.1*10 + 0.9*15)/10 = 1.45
    out = pinball_loss(df, ["g"], "y", "p", 1, 10).collect()[0]
    assert out.mean_pinball_milli == 1450
    # a perfect prediction scores 0
    perfect = spark.createDataFrame(
        [("g", 7, 7)] * 3, "g string, y long, p long"
    )
    assert pinball_loss(perfect, ["g"], "y", "p", 9, 10).collect()[0].mean_pinball_milli == 0


# --- personalized PageRank --------------------------------------------------


def test_ppr_all_seeds_equals_uniform_pagerank(spark):
    """Seeding EVERY node degenerates personalized PageRank to the
    uniform one — bit-identical ranks (same constants, same folds)."""
    from dwh_etl_ods_spark_jobs_spark.graph import (
        pagerank,
        personalized_pagerank,
    )

    base = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(40)], "src long, dst long"
    )
    edges = base.union(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = edges.select(F.col("src").alias("node")).distinct()
    ppr = {r.node: r.rank_micro for r in personalized_pagerank(edges, seeds).collect()}
    pr = {r.node: r.rank_micro for r in pagerank(edges).collect()}
    assert ppr == pr


def test_ppr_concentrates_rank_near_seeds(spark):
    """On two disconnected cliques with seeds only in one, ALL rank mass
    stays in the seeded component; the other reads exactly 0."""
    from dwh_etl_ods_spark_jobs_spark.graph import personalized_pagerank

    def clique(nodes):
        return [
            (a, b) for a in nodes for b in nodes if a != b
        ]

    edges = spark.createDataFrame(
        clique([1, 2, 3]) + clique([10, 11, 12]), "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.rank_micro for r in personalized_pagerank(edges, seeds).collect()}
    assert out[10] == out[11] == out[12] == 0
    assert out[1] > 0 and out[2] > 0 and out[3] > 0
    assert out[1] > out[2] == out[3]  # restart mass pins the seed on top
