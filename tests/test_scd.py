"""SCD Type-2 interval builder: run collapsing, interval stitching
invariants (no gaps, no overlaps, one open interval per key), NULL-safe
change detection."""

from __future__ import annotations

import datetime as dt

from dwh_etl_ods_spark_jobs_spark.operators.scd import changes_to_scd2


def _obs(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, attr string")


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_scd2_collapses_runs_and_stitches_intervals(spark):
    df = _obs(
        spark,
        [
            (1, _t(0), "a"),
            (1, _t(1), "a"),   # unchanged: collapses into the first run
            (1, _t(2), "b"),   # change point
            (1, _t(3), "a"),   # change back: a NEW interval (not merged)
            (2, _t(5), "x"),
        ],
    )
    out = sorted(
        df.transform(changes_to_scd2("k", "ts", ["attr"])).collect(),
        key=lambda r: (r.k, r.effective_from),
    )
    got = [(r.k, r.attr, r.effective_from, r.effective_to, r.is_current) for r in out]
    assert got == [
        (1, "a", _t(0), _t(2), False),
        (1, "b", _t(2), _t(3), False),
        (1, "a", _t(3), None, True),
        (2, "x", _t(5), None, True),
    ]
    # invariants: intervals per key tile the timeline end-to-start
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for rows in by_key.values():
        assert sum(1 for r in rows if r.is_current) == 1
        for a, b in zip(rows, rows[1:]):
            assert a.effective_to == b.effective_from


def test_scd2_null_transitions_are_changes_but_null_runs_collapse(spark):
    df = _obs(
        spark,
        [
            (1, _t(0), None),
            (1, _t(1), None),  # NULL -> NULL: NOT a change
            (1, _t(2), "v"),   # NULL -> value: change
            (1, _t(3), None),  # value -> NULL: change
        ],
    )
    out = sorted(
        df.transform(changes_to_scd2("k", "ts", ["attr"])).collect(),
        key=lambda r: r.effective_from,
    )
    assert [(r.attr, r.effective_from) for r in out] == [
        (None, _t(0)),
        ("v", _t(2)),
        (None, _t(3)),
    ]


def test_scd2_multi_attribute_any_change_opens_interval(spark):
    df = spark.createDataFrame(
        [
            (1, _t(0), "a", 10),
            (1, _t(1), "a", 20),  # second attr changed
            (1, _t(2), "b", 20),  # first attr changed
        ],
        "k long, ts timestamp, a1 string, a2 int",
    )
    out = df.transform(changes_to_scd2("k", "ts", ["a1", "a2"])).collect()
    assert len(out) == 3


def test_attribution_credits_known_values(spark):
    """Hand-checked attribution: u1 converts once with touches
    [view@d1, click@d3] (first=view, last=click, linear 500000 each);
    u2 converts with one in-window touch (signup) and one out-of-window
    view (8 days before, excluded)."""
    import datetime as dt

    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        attribution_credits,
    )

    T = dt.datetime
    rows = [
        (1, "u1", "view", T(2024, 1, 1)),
        (2, "u1", "click", T(2024, 1, 3)),
        (3, "u1", "purchase", T(2024, 1, 5)),
        (4, "u2", "view", T(2024, 1, 1)),      # 8 days before -> excluded
        (5, "u2", "signup", T(2024, 1, 7)),
        (6, "u2", "purchase", T(2024, 1, 9)),
        (7, "u3", "purchase", T(2024, 1, 9)),  # zero touches -> nothing
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp"
    )
    got = {
        r.channel: (r.first_touch, r.last_touch, r.linear_micro)
        for r in attribution_credits(
            ev, "user_id", "event_type", "ts", "event_id",
            conversion_type="purchase",
            touch_types=["view", "click", "signup"],
            lookback_days=7,
        ).collect()
    }
    assert got == {
        "view": (1, 0, 500000),
        "click": (0, 1, 500000),
        "signup": (1, 1, 1000000),
    }
