"""Property tests for the second r10-staged wave (beyond oracle parity):
prefix-filtered Jaccard's exact-recall claim, PPS sampling invariants,
grouped global rank vs the single-window ground truth, lerp gap-fill
boundary behavior, MI/KL identities, winsorized degenerate cases,
mutual-kNN reciprocity, and phrase matching on a handcrafted corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_prefix_filter_jaccard_equals_posting_join(spark, sf_dir):
    """Exact recall: the prefix-filtered join returns IDENTICAL pairs to
    the unfiltered posting self-join at the same threshold."""
    from dwh_etl_ods_spark_jobs_spark.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fast = {
        (r.id_a, r.id_b, r.jaccard_ppm)
        for r in prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", threshold_ppm=500000
        ).collect()
    }
    brute = {
        (r.id_a, r.id_b, int(r.jaccard * 1000000))
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert {p[:2] for p in fast} == {p[:2] for p in brute}
    assert len(fast) > 0


def test_pps_sample_invariants(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        systematic_weighted_sample,
    )
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    rows = [(i, (i * 7) % 13) for i in range(200)]  # some zero weights
    df = (
        spark.createDataFrame(rows, "id long, w long")
        .withColumn("_h", md5_long(F.col("id").cast("string")))
    )
    out = df.transform(
        systematic_weighted_sample(["_h", "id"], "w", 25)
    ).collect()
    assert sum(r.n_picks for r in out) == 25  # exactly n picks distributed
    assert all(r.w > 0 for r in out)  # zero-weight rows never picked
    # deterministic under physical layout changes
    out2 = (
        df.repartition(7)
        .transform(systematic_weighted_sample(["_h", "id"], "w", 25))
        .collect()
    )
    assert sorted((r.id, r.n_picks) for r in out) == sorted(
        (r.id, r.n_picks) for r in out2
    )


def test_grouped_global_rank_matches_single_window(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import grouped_global_rank

    rows = [(i % 3 if i % 11 else None, (i * 17) % 50, i) for i in range(500)]
    df = spark.createDataFrame(rows, "g int, v int, id int")
    got = {
        (r.g, r.id): (r.rk, r.n)
        for r in df.transform(
            grouped_global_rank(["g"], ["v", "id"], out_col="rk",
                                with_total="n", n_ranges=8)
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r.g, r.id): (r.rk, r.n)
        for r in df.withColumn(
            "rk", (F.row_number().over(w) - 1).cast("long")
        ).withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("g")).cast("long")
        ).collect()
    }
    assert got == want  # NULL group included, exact per-group ranks


def test_gap_fill_lerp_boundaries(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    obs = spark.createDataFrame(
        [("a", 10, 100), ("a", 14, 60), ("b", 5, 7)],
        "k string, d long, v long",
    )
    out = {
        (r.k, r.day): (r.value, r.is_obs)
        for r in gap_fill_interpolate(obs, ["k"], "d", "v").collect()
    }
    # observation days exact; descending lerp floors toward -inf consistently
    assert out[("a", 10)] == (100, 1)
    assert out[("a", 14)] == (60, 1)
    assert out[("a", 11)] == (90, 0)
    assert out[("a", 12)] == (80, 0)
    assert out[("a", 13)] == (70, 0)
    assert out[("b", 5)] == (7, 1)  # single-obs key emits itself
    assert len(out) == 6


def test_gap_fill_lerp_duplicate_day_drops_zero_length_segment(spark):
    """ADVICE r9 (medium): a contract-violating duplicate (key, day) row
    must NOT let F.sequence auto-step backwards into a phantom d0-1 day
    with a NULL value — both engines drop the zero-length segment."""
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        gap_fill_interpolate,
        gap_fill_interpolate_sql,
    )

    # duplicate day carries the SAME value so the tie-order between the
    # two day-10 rows (unspecified in both engines) cannot change output
    rows = [("a", 10, 100), ("a", 10, 100), ("a", 12, 60)]
    obs = spark.createDataFrame(rows, "k string, d long, v long")
    got = sorted(
        (r.k, r.day, r.value, r.is_obs)
        for r in gap_fill_interpolate(obs, ["k"], "d", "v").collect()
    )
    # no day 9, no NULL values; days 10/11/12 present exactly once each
    # except the duplicated obs day 10 (one row per surviving segment)
    assert all(day >= 10 for _, day, _, _ in got)
    assert all(v is not None for _, _, v, _ in got)
    con = duckdb.connect()
    con.execute("CREATE TABLE src(k VARCHAR, d BIGINT, v BIGINT)")
    con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            gap_fill_interpolate_sql("src", ["k"], "d", "v")
        ).fetchall()
    )
    assert got == want


def test_mutual_information_identities(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import mutual_information

    # independent columns -> MI == 0 exactly (every cell factorizes)
    rows = [(i % 4, (i // 4) % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = mutual_information(df, "x", "y").collect()[0]
    assert (r.n_rows, r.n_cells, r.mi_micro) == (200, 20, 0)
    # MI(X; X) == H(X): uniform over 4 -> 4 cells of round(0.25*ln(4)*1e6)
    # (per-TERM micro rounding, the documented discipline)
    r2 = mutual_information(df, "x", "x").collect()[0]
    assert r2.mi_micro == 4 * 346574


def test_kl_self_drift_is_zero(spark, sf_dir):
    from dwh_etl_ods_spark_jobs_spark.curation import kl_token_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = kl_token_drift(docs, docs, "text").collect()[0]
    assert r.kl_micro == 0
    assert r.n_tokens_p == r.n_tokens_q


def test_winsorized_no_trim_equals_plain_sum(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.stats import winsorized_stats

    rows = [("g", i, 10 + i) for i in range(10)]  # n=10, 5% -> k=0
    df = spark.createDataFrame(rows, "g string, id int, v long")
    r = winsorized_stats(df, ["g"], "v", "id", trim_pct=5).collect()[0]
    assert (r.n, r.k) == (10, 0)
    assert r.winsor_sum == r.trim_sum == sum(10 + i for i in range(10))
    # 30% trim on 10 rows: k=3, anchors at ranks 4 and 7
    r3 = winsorized_stats(df, ["g"], "v", "id", trim_pct=30).collect()[0]
    assert (r3.k, r3.lo_val, r3.hi_val) == (3, 13, 16)
    assert r3.trim_sum == 13 + 14 + 15 + 16
    assert r3.winsor_sum == r3.trim_sum + 3 * (13 + 16)


def test_mutual_knn_reciprocity(spark, sf_dir):
    from dwh_etl_ods_spark_jobs_spark.dedup import mutual_knn_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = mutual_knn_pairs(
        emb, "embedding", "vec_id", k=3, dim=64, n_planes=6
    ).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.id_a < r.id_b
        assert 1 <= r.rank_ab <= 3 and 1 <= r.rank_ba <= 3


def test_phrase_match_handcrafted(spark):
    from dwh_etl_ods_spark_jobs_spark.curation import phrase_match_census

    docs = spark.createDataFrame(
        [
            (1, "a table scan and a table scan again"),
            (2, "scan table no phrase here"),
            (3, "one table scan only"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.w1, r.w2): (r.n_docs, r.n_hits)
        for r in phrase_match_census(
            docs, "doc_id", "text", [("table", "scan"), ("no", "match")]
        ).collect()
    }
    assert out[("table", "scan")] == (2, 3)  # doc1 twice, doc3 once
    assert ("no", "match") not in out  # zero-hit phrases emit no row


def test_label_propagation_two_triangles(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import label_propagation

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r.node: r.label for r in label_propagation(edges, rounds=3).collect()
    }
    # hand-traced synchronous schedule with min-label ties: the bridge
    # settles into two communities {1,2,3} -> 1 and {4,5,6} -> 3
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_ann_recall_eval_handcrafted(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import ann_recall_eval

    truth = spark.createDataFrame(
        [(q, n) for q in (1, 2, 3) for n in range(5)],
        "query_id long, neighbor_id long",
    )
    cand = spark.createDataFrame(
        # q1: 3/5 hits; q2: 0 hits; q3: perfect 5/5
        [(1, 0), (1, 1), (1, 2), (1, 99), (1, 98), (2, 50), (2, 51)]
        + [(3, n) for n in range(5)],
        "query_id long, neighbor_id long",
    )
    r = ann_recall_eval(truth, cand, k=5).collect()[0]
    assert r.n_queries == 3
    assert r.recall_sum_ppm == 600000 + 0 + 1000000
    assert r.min_recall_ppm == 0
    assert r.n_perfect == 1


def test_kmeans_step_quantized_handcrafted(spark):
    from dwh_etl_ods_spark_jobs_spark.similarity import kmeans_step_quantized

    # two seed clusters on a line; vector 4 starts mislabeled and must
    # cross over; floored integer means pin the centroid arithmetic
    rows = [
        (1, [0.0, 0.0], 0),
        (2, [0.001, 0.0], 0),   # -> q [1, 0]; centroid0 = [0, 0] (floor 1/2)
        (3, [1.0, 1.0], 1),
        (4, [0.0, 0.001], 1),   # near cluster 0 -> must reassign
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {
        r.vec_id: (r.new_label, r.dist_sq)
        for r in kmeans_step_quantized(
            df, "vec_id", "embedding", "label", dim=2
        ).collect()
    }
    # centroid0 = floor([1,0]/2) = [0,0]; centroid1 = floor([1000,1001]/2)
    # = [500, 500]
    assert out[1] == (0, 0)
    assert out[2] == (0, 1)
    assert out[4][0] == 0  # crossed over: d to c0 = 1 < d to c1 = 499² + 500²
    assert out[4][1] == 1
    assert out[3] == (1, 500 * 500 + 500 * 500)


def test_grouped_weighted_quantile_matches_brute_force(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile,
    )

    rows = [
        (("g%d" % (i % 3)) if i % 13 else None, (i * 29) % 100, i, (i * 7) % 5)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v long, id long, w long")
    qs = [(1, 4), (1, 2), (3, 4)]
    got = {
        (r.g, r.q_num, r.q_den): (r.v, r.id)
        for r in df.transform(
            grouped_weighted_quantile(["g"], ["v", "id"], "w", qs, n_ranges=8)
        ).collect()
    }
    # brute force per group in Python
    from collections import defaultdict

    groups = defaultdict(list)
    for g, v, i, w in rows:
        groups[g].append((v, i, w))
    want = {}
    for g, items in groups.items():
        items.sort()
        total = sum(w for _, _, w in items)
        for num, den in qs:
            cw = 0
            for v, i, w in items:
                cw += w
                if cw * den >= num * total:
                    want[(g, num, den)] = (v, i)
                    break
    assert got == want
    assert any(k[0] is None for k in got)  # NULL group ranked too


def test_quantile_normalize_maps_onto_reference(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_normalize

    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id long, v long"
    )
    ref = spark.createDataFrame([(7, 100), (8, 200)], "rid long, rv long")
    out = {
        r.id: r.norm
        for r in base.transform(
            quantile_normalize(["v", "id"], ref, ["rv", "rid"], out_col="norm")
        ).collect()
    }
    # n=4 onto rn=2: ranks 0,1 -> ref rank 0 (100); ranks 2,3 -> rank 1 (200)
    assert out == {1: 100, 2: 100, 3: 200, 4: 200}


def test_binary_type_sniff_census(spark):
    """Magic-byte sniffing: real signatures (PNG/JPEG/RIFF-WAV/RIFF-AVI/
    gzip), a truncated payload, and NULL all route correctly — pure
    scan-side expression, no codec lib (multimodal discipline)."""
    from dwh_etl_ods_spark_jobs_spark.multimodal import type_census

    rows = [
        (1, bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A]) + b"x" * 8),
        (2, bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"jfif"),
        (3, b"RIFF" + b"\x00\x00\x00\x00" + b"WAVEfmt "),
        (4, b"RIFF" + b"\x00\x00\x00\x00" + b"AVI LIST"),
        (5, bytes([0x1F, 0x8B, 0x08]) + b"z"),
        (6, b"%PDF-1.7 stream"),
        (7, b"PK\x03\x04zipzip"),
        (8, b"RI"),  # truncated: not enough for any signature
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.media_type: (r.n, r.total_bytes)
        for r in type_census(df, "payload").collect()
    }
    assert got["png"] == (1, 16)
    assert got["jpeg"] == (1, 8)
    assert got["wav"] == (1, 16)
    assert got["avi"] == (1, 16)
    assert got["gzip"] == (1, 4)
    assert got["pdf"] == (1, 15)
    assert got["zip"] == (1, 10)
    assert got["unknown"] == (2, 2)  # truncated (2 bytes) + NULL (0 bytes)


def test_r10b_plans_have_no_single_partition_exchange(spark, sf_dir):
    """Plan-shape pins for the new rank-decomposed operators: the
    executed plans must carry NO Exchange SinglePartition beyond the
    documented bounded offsets window (global sorts are the straggler
    these operators exist to avoid), and the offsets frames must attach
    via BroadcastExchange."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.dedup import prefix_filter_jaccard_pairs
    from dwh_etl_ods_spark_jobs_spark.operators.rank import grouped_global_rank
    from dwh_etl_ods_spark_jobs_spark.operators.stats import winsorized_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pf = prefix_filter_jaccard_pairs(docs, "text", "doc_id", threshold_ppm=500000)
    pf.count()
    plan_pf = pf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan_pf

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    ws = winsorized_stats(orders, ["o_orderpriority"], "cents", "o_orderkey")
    ws.count()
    plan_ws = ws._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan_ws
    assert "BroadcastExchange" in plan_ws  # offsets attach by broadcast

    gr = orders.transform(
        grouped_global_rank(["o_orderpriority"], ["cents", "o_orderkey"])
    )
    gr.count()
    plan_gr = gr._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan_gr
    assert "BroadcastExchange" in plan_gr


def test_parse_media_header_real_headers(spark):
    """REAL container headers, struct-packed by the TEST (the
    independent truth), parsed by pure Spark byte expressions — the
    codec-free half of decode that works on any real corpus."""
    import struct

    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.multimodal import parse_media_header

    # genuine PNG: signature + IHDR chunk (len, type, w, h, ...)
    png = (
        bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 1920, 1080)
        + bytes([8, 6, 0, 0, 0])
    )
    # genuine BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER start
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 1000, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 640, -480, 1, 24)  # top-down: h<0
    )
    # genuine WAV: RIFF/WAVE + canonical fmt chunk
    wav = (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
    )
    rows = [(1, png), (2, bmp), (3, wav), (4, b"%PDF-1.7"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", parse_media_header(F.col("payload")).alias("h")
        ).collect()
    }
    assert got[1].media_type == "png"
    assert (got[1].width, got[1].height) == (1920, 1080)
    assert got[1].sample_rate is None and got[1].channels is None
    assert got[2].media_type == "bmp"
    # biHeight is SIGNED: a top-down BMP stores -480 and must report
    # the pixel height 480, not the two's-complement raw 2^32-480
    assert got[2].width == 640
    assert got[2].height == 480
    assert got[3].media_type == "wav"
    assert (got[3].sample_rate, got[3].channels) == (44100, 2)
    assert got[3].width is None and got[3].height is None
    assert got[4].media_type == "pdf"
    assert got[4].width is None
    assert got[5].media_type == "unknown"


def test_parse_media_header_truncated_payloads_yield_nulls(spark):
    """A payload with a valid magic but a short header must NOT read
    garbage fields — type still sniffs, every field NULL."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.multimodal import parse_media_header

    short_png = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A]) + b"IH"
    df = spark.createDataFrame([(1, short_png)], "doc_id long, payload binary")
    h = df.select(parse_media_header(F.col("payload")).alias("h")).collect()[0].h
    assert h.media_type == "png"
    assert h.width is None and h.height is None
