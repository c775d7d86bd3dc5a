"""Unit tests for the core operator library (SURVEY.md §5 item 2).

Each test pins the exact edge-case semantics the reference encodes:
NULL keys under `<=>`, empty-string -> NULL, date-clamp boundaries,
999 sentinels, SHA2 hex case, lookup-fold fallthrough, idempotency.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark.operators import (
    anti_join_new,
    apply_rules,
    date_clamp,
    dedupe_latest,
    empty_to_null,
    full_outer_coalesce,
    hash_pii,
    lookup_fold,
    month_spine,
    range_sentinel,
    value_map,
)


def test_anti_join_null_safe_keys(spark):
    # A NULL source key must MATCH a NULL target key (reference `<=>`,
    # LoadCTPatients.java:182) — the row is NOT re-appended.
    src = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c"), (2, "d")], "site int, pk string"
    )
    tgt = spark.createDataFrame([(1, "a"), (None, "b")], "site int, pk string")
    out = src.transform(anti_join_new(tgt, ["site", "pk"]))
    assert {(r.site, r.pk) for r in out.collect()} == {(2, "d"), (None, "c")}


def test_anti_join_idempotent(spark):
    # Running the load twice appends zero rows the second time — the
    # reference's central invariant (SURVEY.md §5 item 4).
    src = spark.createDataFrame([(i, f"p{i % 3}") for i in range(30)], "site int, pk string")
    tgt = src.limit(0)
    delta1 = src.transform(anti_join_new(tgt, ["site", "pk"]))
    new_target = tgt.union(delta1.select("site", "pk"))
    delta2 = src.transform(anti_join_new(new_target, ["site", "pk"]))
    assert delta1.count() == 30
    assert delta2.count() == 0


def test_anti_join_source_target_col_pairs(spark):
    src = spark.createDataFrame([(1,), (2,)], "k int")
    tgt = spark.createDataFrame([(1,)], "tk int")
    out = src.transform(anti_join_new(tgt, [("k", "tk")]))
    assert [r.k for r in out.collect()] == [2]


def test_dedupe_latest_picks_max_order(spark):
    # Reproduces GROUP BY key -> MAX(created), MAX(ID) + join-back
    # (LoadSourceCTPatients.sql:10-17) as a window top-1.
    df = spark.createDataFrame(
        [
            ("s1", "p1", 1, dt.date(2020, 1, 1)),
            ("s1", "p1", 3, dt.date(2020, 5, 1)),  # winner: latest date
            ("s1", "p1", 2, dt.date(2020, 5, 1)),  # same date, lower ID loses
            ("s2", "p2", 9, dt.date(2019, 1, 1)),
        ],
        "site string, pk string, id int, created date",
    )
    out = df.transform(
        dedupe_latest(["site", "pk"], [F.col("created").desc(), F.col("id").desc()])
    )
    got = {(r.site, r.pk): r.id for r in out.collect()}
    assert got == {("s1", "p1"): 3, ("s2", "p2"): 9}


def test_date_clamp_boundaries(spark):
    # Clamp semantics of LoadARTPatients.java:94-120: strictly-outside
    # [lo, hi] -> sentinel; boundary values pass through.
    df = spark.createDataFrame(
        [
            (1, dt.date(1899, 12, 31)),
            (2, dt.date(1900, 1, 1)),
            (3, dt.date(2020, 6, 15)),
            (4, dt.date(2099, 1, 1)),
            (5, None),
        ],
        "id int, d date",
    )
    out = df.transform(
        apply_rules([date_clamp("d", lo="1900-01-01", hi="2030-12-31", sentinel="1900-01-01")])
    )
    got = {r.id: r.d for r in out.collect()}
    assert got[1] == dt.date(1900, 1, 1)  # below lo -> sentinel
    assert got[2] == dt.date(1900, 1, 1)  # exactly lo passes (same value here)
    assert got[3] == dt.date(2020, 6, 15)
    assert got[4] == dt.date(1900, 1, 1)  # above hi -> sentinel
    assert got[5] is None  # NULL is untouched


def test_date_clamp_to_null(spark):
    # Variant that nulls instead of sentinels (LoadHtsEligibility.java:97-100).
    df = spark.createDataFrame([(1, dt.date(1800, 1, 1))], "id int, d date")
    out = df.transform(apply_rules([date_clamp("d", lo="1900-01-01", hi="2030-01-01", sentinel=None)]))
    assert out.collect()[0].d is None


def test_range_sentinel_999(spark):
    # Weight ∉ [0, 200] -> 999 (LoadPatientVisits.java:78-85), with float cast.
    df = spark.createDataFrame(
        [(1, "70.5"), (2, "-3"), (3, "250"), (4, None), (5, "0"), (6, "200")],
        "id int, w string",
    )
    out = df.transform(apply_rules([range_sentinel("w", 0.0, 200.0, 999.0, cast_to="float")]))
    got = {r.id: r.w for r in out.collect()}
    assert got[1] == 70.5 and got[2] == 999.0 and got[3] == 999.0
    assert got[4] is None and got[5] == 0.0 and got[6] == 200.0


def test_empty_to_null(spark):
    df = spark.createDataFrame([(1, ""), (2, "x"), (3, None)], "id int, s string")
    out = df.transform(apply_rules([empty_to_null(["s"])]))
    got = {r.id: r.s for r in out.collect()}
    assert got == {1: None, 2: "x", 3: None}


def test_clean_rules_survive_malformed_strings_under_ansi(spark):
    """The cleaning rules exist for dirty data; under ANSI mode (Spark 4
    default) a plain cast of '' / '6/1/2023' / 'abc' would crash the job —
    try_cast semantics must null malformed values instead (the reference's
    non-ANSI Spark 3 behavior)."""
    df = spark.createDataFrame(
        [(1, "", "abc"), (2, "6/1/2023", "1e309"), (3, "2023-06-01", "5.5")],
        "id int, d string, x string",
    )
    out = df.transform(apply_rules([
        date_clamp("d", lo="1980-01-01", sentinel="1900-01-01"),
        range_sentinel("x", 0, 10, 999.0),
    ]))
    got = {r.id: (r.d, r.x) for r in out.collect()}
    assert got[1] == (None, None)
    assert got[2][0] is None  # non-ISO date -> NULL, not a crash
    assert got[3] == (dt.date(2023, 6, 1), 5.5)


def test_value_map_isin(spark):
    # Hard-coded isin(...) -> canonical label (LoadHtsClientTests.java:81-112).
    df = spark.createDataFrame(
        [(1, "P1"), (2, "P2"), (3, "Other"), (4, None)], "id int, v string"
    )
    out = df.transform(
        apply_rules([value_map("v", {"Prio": ["P1", "P2"], "Rest": ["Other"]})])
    )
    got = {r.id: r.v for r in out.collect()}
    assert got == {1: "Prio", 2: "Prio", 3: "Rest", 4: None}


def test_hash_pii_matches_hashlib_uppercase(spark):
    # Byte-identical to T-SQL HASHBYTES('SHA2_256', ...) convert(...,2)
    # uppercase hex (DatabaseUtils.java:54-69).
    df = spark.createDataFrame([("abc",), (None,)], "pid string")
    out = df.transform(hash_pii(["pid"])).collect()
    expected = hashlib.sha256(b"abc").hexdigest().upper()
    got = {r.pid: r.pidHash for r in out}
    assert got["abc"] == expected
    assert got[None] is None


def test_hash_pii_int_column_casts_to_string(spark):
    df = spark.createDataFrame([(123,)], "pid int")
    out = df.transform(hash_pii({"pid": "PidHash"})).collect()
    assert out[0].PidHash == hashlib.sha256(b"123").hexdigest().upper()


def test_lookup_fold_unmatched_keeps_original(spark):
    fact = spark.createDataFrame([(1, "old1"), (2, "old2"), (3, None)], "id int, v string")
    lkp = spark.createDataFrame([("old1", "new1")], "source_name string, target_name string")
    out = fact.transform(lookup_fold("v", lkp))
    got = {r.id: r.v for r in out.collect()}
    assert got == {1: "new1", 2: "old2", 3: None}


def test_lookup_fold_duplicate_lookup_rows_no_fanout(spark):
    fact = spark.createDataFrame([(1, "a")], "id int, v string")
    lkp = spark.createDataFrame(
        [("a", "x"), ("a", "x")], "source_name string, target_name string"
    )
    out = fact.transform(lookup_fold("v", lkp))
    assert out.count() == 1


def test_lookup_fold_case_insensitive(spark):
    # SQL Server default collation is case-insensitive (SURVEY.md §4).
    fact = spark.createDataFrame([(1, "ABC")], "id int, v string")
    lkp = spark.createDataFrame([("abc", "X")], "source_name string, target_name string")
    out = fact.transform(lookup_fold("v", lkp, case_insensitive=True))
    assert out.collect()[0].v == "X"


def test_month_spine_endpoints(spark):
    df = month_spine(spark, "2017-01-01", "2017-04-30")
    dates = sorted(r.as_of_date for r in df.collect())
    assert dates == [
        dt.date(2017, 1, 31),
        dt.date(2017, 2, 28),
        dt.date(2017, 3, 31),
        dt.date(2017, 4, 30),
    ]


def test_day_spine_chunked_generation(spark):
    """day_spine slices a long range over spark.range tasks; the rows must
    still be exactly [start, end] with no gap or duplicate at the
    1000-day chunk seams. 20 years of days — the range the old
    broadcast-grid assert rejected outright."""
    from dwh_etl_ods_spark_jobs_spark.operators import day_spine

    df = day_spine(spark, "2004-01-01", "2023-12-31")
    n = (dt.date(2023, 12, 31) - dt.date(2004, 1, 1)).days + 1
    assert df.count() == n
    assert df.distinct().count() == n  # no seam duplicates
    agg = df.agg(F.min("as_of_date"), F.max("as_of_date")).collect()[0]
    assert (agg[0], agg[1]) == (dt.date(2004, 1, 1), dt.date(2023, 12, 31))
    assert df.rdd.getNumPartitions() > 1  # generation is actually parallel


def test_entity_grids_match_broadcast_grid_semantics(spark):
    """entity_day_grid/entity_month_grid produce exactly the rows of the
    broadcast non-equi grid (entities ⋈ spine on as_of_date >= first) —
    the scale path must be a drop-in."""
    from dwh_etl_ods_spark_jobs_spark.operators import (
        day_spine,
        entity_day_grid,
        entity_month_grid,
        month_spine,
    )

    ents = spark.createDataFrame(
        [(1, dt.date(2023, 1, 3)), (2, dt.date(2023, 1, 10)),
         (3, dt.date(2024, 6, 1))],  # starts after the range -> no rows
        "user_id int, first_d date",
    )
    start, end = "2023-01-01", "2023-01-12"
    bcast = ents.join(
        F.broadcast(day_spine(spark, start, end)),
        F.col("as_of_date") >= F.col("first_d"),
    )
    ent = entity_day_grid(ents, "first_d", start, end)
    key = lambda r: (r.user_id, r.as_of_date)  # noqa: E731
    assert sorted(map(key, ent.collect())) == sorted(map(key, bcast.collect()))

    ents_m = ents.withColumnRenamed("first_d", "first_m")
    bcast_m = ents_m.join(
        F.broadcast(month_spine(spark, "2023-01-01", "2023-05-31")),
        F.col("as_of_date") >= F.col("first_m"),
    )
    ent_m = entity_month_grid(ents_m, "first_m", "2023-01-01", "2023-05-31")
    assert sorted(map(key, ent_m.collect())) == sorted(map(key, bcast_m.collect()))


def test_entity_day_grid_20_year_range_no_broadcast(spark):
    """A >5k-day grid runs through the per-entity explode — no broadcast,
    no BroadcastNestedLoop, row count exactly sum of per-entity spans."""
    from dwh_etl_ods_spark_jobs_spark.operators import entity_day_grid

    ents = spark.createDataFrame(
        [(1, dt.date(2004, 1, 1)), (2, dt.date(2023, 12, 1))],
        "user_id int, first_d date",
    )
    grid = entity_day_grid(ents, "first_d", "2004-01-01", "2023-12-31")
    span1 = (dt.date(2023, 12, 31) - dt.date(2004, 1, 1)).days + 1
    span2 = 31
    assert grid.count() == span1 + span2
    plan = grid._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_full_outer_coalesce(spark):
    left = spark.createDataFrame([(1, "l1"), (2, "l2")], "k int, lv string")
    right = spark.createDataFrame([(2, "r2"), (3, "r3")], "k int, rv string")
    out = full_outer_coalesce(left, right, ["k"])
    got = {r.k: (r.lv, r.rv) for r in out.collect()}
    assert got == {1: ("l1", None), 2: ("l2", "r2"), 3: (None, "r3")}


def test_full_outer_coalesce_null_keys_match(spark):
    left = spark.createDataFrame([(None, "l")], "k int, lv string")
    right = spark.createDataFrame([(None, "r")], "k int, rv string")
    out = full_outer_coalesce(left, right, ["k"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].lv == "l" and rows[0].rv == "r"


def test_dedupe_latest_agg_equals_window_form(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.dedupe import dedupe_latest_agg

    rows = [
        (k, ts, k * 100 + ts, f"v{k}_{ts}")
        for k in range(5)
        for ts in range(1, 4 + k % 3)
    ]
    df = spark.createDataFrame(rows, "k int, ts int, id int, payload string")
    via_window = df.transform(
        dedupe_latest(["k"], [F.col("ts").desc(), F.col("id").desc()])
    )
    via_agg = df.transform(dedupe_latest_agg(["k"], ["ts", "id"]))
    assert sorted(map(tuple, via_window.collect())) == sorted(map(tuple, via_agg.collect()))
    # exactly one row per key, and it is the max-ts generation
    got = {r.k: r.ts for r in via_agg.collect()}
    assert all(got[k] == max(ts for kk, ts, *_ in rows if kk == k) for k in got)


def test_asof_join_semantics(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (3, 1, 999.0)], "k int, ts int, v double"
    )
    out = {
        r.tag: r.v
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    # a(ts=10) -> right ts=8; b(ts=20) -> ts=15; c(ts=5) -> none; d(k=2) -> none
    assert out == {"a": 100.0, "b": 200.0, "c": None, "d": None}
    inner = asof_join(left, right, ["k"], "ts", "ts", ["v"], how="inner")
    assert {r.tag for r in inner.collect()} == {"a", "b"}


def test_asof_join_ts_equality_matches(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 10, 7.0)], "k int, ts int, v double")
    assert asof_join(left, right, ["k"], "ts", "ts", ["v"]).first().v == 7.0


def test_sessionize_gaps_and_seqs(spark):
    import datetime as _dt

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import sessionize

    t0 = _dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + _dt.timedelta(minutes=10)),   # same session
        (1, 3, t0 + _dt.timedelta(hours=2)),      # new session (gap > 1h)
        (2, 4, t0),                                # other user
    ]
    df = spark.createDataFrame(rows, "user int, eid int, ts timestamp")
    out = {
        r.eid: (r.session_seq, r.event_seq)
        for r in sessionize(df, ["user"], "ts", 3_600_000_000, ["eid"]).collect()
    }
    assert out == {1: (0, 0), 2: (0, 1), 3: (1, 0), 4: (0, 0)}


def test_enrich_patient_facility_star(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.enrich import enrich_patient_facility

    fact = spark.createDataFrame(
        [(1, "2023-01-01"), (2, "2023-01-02"), (3, "2023-01-03")],
        "PatientId int, VisitDate string",
    )
    patient = spark.createDataFrame(
        [(1, "pk1", "pid1", 10), (2, "pk2", "pid2", 20)],
        "Id int, PatientPK string, PatientID string, FacilityId int",
    )
    facility = spark.createDataFrame(
        [(10, 100, "Clinic A"), (20, 200, "Clinic B")],
        "Id int, SiteCode int, FacilityName string",
    )
    out = enrich_patient_facility(fact, patient, facility)
    # The dim's PatientID must survive: the fact's PatientId FK is dropped
    # via a temp rename, not by (case-insensitive) name, which used to eat
    # the dim column too.
    assert set(out.columns) == {
        "VisitDate", "PatientPK", "PatientID", "SiteCode", "FacilityName"
    }
    rows = {
        r.PatientPK: (r.PatientID, r.SiteCode, r.FacilityName, r.VisitDate)
        for r in out.collect()
    }
    # PatientId=3 has no PatientExtract row -> dropped (inner join, the
    # reference's source-query semantics)
    assert rows == {
        "pk1": ("pid1", 100, "Clinic A", "2023-01-01"),
        "pk2": ("pid2", 200, "Clinic B", "2023-01-02"),
    }


def test_asof_join_null_value_in_matching_row(spark):
    # The true as-of row carries a NULL value: must return NULL, not leak
    # the older non-NULL value (ASOF semantics; was a real bug).
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, 1.0), (1, 8, None)], "k int, ts int, v double"
    )
    assert asof_join(left, right, ["k"], "ts", "ts", ["v"]).first().v is None
    # and inner still counts it as matched (a right row exists)
    assert asof_join(left, right, ["k"], "ts", "ts", ["v"], how="inner").count() == 1


def test_asof_join_rejects_unknown_how(spark):
    import pytest as _pytest

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 5, 1.0)], "k int, ts int, v double")
    with _pytest.raises(ValueError, match="how"):
        asof_join(left, right, ["k"], "ts", "ts", ["v"], how="full")


def test_lookup_fold_ci_duplicate_case_variants_no_fanout(spark):
    # 'Married' and 'MARRIED' are ONE case-insensitive join key; a fact row
    # must fold once, never duplicate (was a real fan-out bug).
    df = spark.createDataFrame([(1, "married")], "id int, status string")
    lkp = spark.createDataFrame(
        [("Married", "M1"), ("MARRIED", "M2")], "source_name string, target_name string"
    )
    out = df.transform(lookup_fold("status", lkp, case_insensitive=True)).collect()
    assert len(out) == 1
    assert out[0].status in ("M1", "M2")


def test_date_clamp_offset_applies_to_explicit_hi(spark):
    df = spark.createDataFrame(
        [(1, dt.date(2024, 6, 1)), (2, dt.date(2025, 6, 1))], "id int, d date"
    )
    rule = date_clamp("d", hi="2024-01-01", hi_offset_years=1, sentinel="1900-01-01")
    out = {r.id: r.d for r in df.transform(rule).collect()}
    # bound is 2024-01-01 + 1y = 2025-01-01: id1 inside, id2 clamped
    assert out == {1: dt.date(2024, 6, 1), 2: dt.date(1900, 1, 1)}


def test_asof_join_null_keys_never_match(spark):
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import asof_join

    left = spark.createDataFrame([(None, 10)], "k string, ts int")
    right = spark.createDataFrame([(None, 5, 1.0)], "k string, ts int, v double")
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert len(out) == 1 and out[0].v is None  # equality-join NULL semantics
    assert asof_join(left, right, ["k"], "ts", "ts", ["v"], how="inner").count() == 0


class TestMergeUpsert:
    def _frames(self, spark):
        target = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (None, "n", 40)],
            "k int, name string, v int",
        )
        changes = spark.createDataFrame(
            [
                (2, "B", 21, False),    # matched update
                (3, "C", 31, True),     # matched tombstone -> delete
                (5, "e", 50, False),    # unmatched insert
                (6, "f", 60, True),     # tombstone of absent key -> no-op
                (None, "N", 41, False),  # NULL key matches null-safely
            ],
            "k int, name string, v int, deleted boolean",
        )
        return target, changes

    def test_all_five_arms(self, spark):
        from dwh_etl_ods_spark_jobs_spark.operators import merge_upsert

        target, changes = self._frames(spark)
        got = {
            r.k: (r.name, r.v)
            for r in merge_upsert(target, changes, ["k"], "deleted").collect()
        }
        assert got == {
            1: ("a", 10),     # target-only: kept
            2: ("B", 21),     # updated
            5: ("e", 50),     # inserted
            None: ("N", 41),  # NULL key updated (null-safe match)
        }  # 3 deleted; 6 never existed

    def test_without_tombstones_is_pure_upsert(self, spark):
        from dwh_etl_ods_spark_jobs_spark.operators import merge_upsert

        target, changes = self._frames(spark)
        got = {
            r.k: r.v
            for r in merge_upsert(
                target, changes.drop("deleted"), ["k"]
            ).collect()
        }
        assert got == {1: 10, 2: 21, 3: 31, 5: 50, 6: 60, None: 41}

    def test_idempotent_reapply(self, spark):
        from dwh_etl_ods_spark_jobs_spark.operators import merge_upsert

        target, changes = self._frames(spark)
        once = merge_upsert(target, changes, ["k"], "deleted")
        twice = merge_upsert(once, changes, ["k"], "deleted")
        key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
        assert sorted(map(tuple, once.collect()), key=key) == sorted(
            map(tuple, twice.collect()), key=key
        )


def test_hopping_window_every_event_lands_in_exactly_three_windows(spark, tmp_path):
    import os
    from dwh_etl_ods_spark_jobs_spark.plans.coverage import (
        HOP_H_MS,
        HOP_W_MS,
        q_hopping_window,
    )

    assert HOP_W_MS == 3 * HOP_H_MS
    sf_dir = "/root/testdata/sf0.001"
    out = q_hopping_window(spark, sf_dir)
    n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    # W/H = 3 memberships per event: window-count mass is exactly 3x
    assert out.agg(F.sum("n_events")).collect()[0][0] == 3 * n_events
    # every window start is hop-aligned and covers its events
    misaligned = out.filter(F.col("window_start_ms") % HOP_H_MS != 0).count()
    assert misaligned == 0


def test_apply_change_feed_multi_generation(spark):
    """CDC envelope apply: later generation wins, deletes remove, inserts
    add, untouched snapshot rows survive; a delete AFTER an update for the
    same key deletes."""
    from dwh_etl_ods_spark_jobs_spark.operators.merge import apply_change_feed

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    feed = spark.createDataFrame(
        [
            (2, "b1", "u", 1),
            (2, "b2", "u", 2),   # later generation wins
            (3, "c", "d", 1),    # delete
            (4, "new", "c", 1),  # insert
            (5, "x1", "u", 1),
            (5, "x1", "d", 2),   # update then delete -> deleted (absent)
        ],
        "k int, v string, op string, seq int",
    )
    got = {
        r.k: r.v
        for r in apply_change_feed(snap, feed, ["k"], ["seq"]).collect()
    }
    assert got == {1: "a", 2: "b2", 4: "new"}


def test_decay_halving_agg_known_values(spark):
    """Weight halves per 30 elapsed days via integer right-shift: exact,
    no pow(); negative ages clamp to full weight, huge ages to shift 62."""
    from pyspark.sql import functions as F

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import decay_halving_agg

    rows = [
        ("a", 1000, 0),     # shift 0 -> 1000
        ("a", 1000, 29),    # still shift 0 -> 1000
        ("a", 1000, 30),    # shift 1 -> 500
        ("a", 1000, 65),    # shift 2 -> 250
        ("a", 1001, 30),    # shift 1 -> 500 (floor)
        ("b", 1000, -5),    # future-dated -> clamp shift 0 -> 1000
        ("b", 1 << 40, 30 * 100),  # 100 halvings -> clamp 62 -> 0
    ]
    df = spark.createDataFrame(rows, "g string, cents long, age long")
    got = {
        r.g: (r.n_rows, r.raw_cents, r.decayed_cents)
        for r in df.transform(
            decay_halving_agg(["g"], F.col("cents"), F.col("age"), 30)
        ).collect()
    }
    assert got["a"] == (5, 5001, 1000 + 1000 + 500 + 250 + 500)
    assert got["b"] == (2, 1000 + (1 << 40), 1000 + 0)
