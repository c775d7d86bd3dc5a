"""Event-time operators: as-of join, gap sessionization, tumbling rollup.

The reference's only temporal logic is the as-of *filter* inside the ART
outcomes script (``LoadHistoricalARTOutcomes.sql:35-61``, rebuilt in
plans/art_outcomes.py); these generalize it to the reusable event-pipeline
operators an analytics engine needs.

Scale design: the as-of join is the union+window formulation — tag both
streams, union, one window per key ordered by time carrying the last seen
right-side values forward — a single shuffle on the key, linear in rows,
no range-join explosion. (A broadcast range join would materialize
|left|×|right-per-key|.) Sessionization is the classic lag-gap + running
sum: two window passes over one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same key (ASOF JOIN semantics;
    DuckDB's native ``ASOF JOIN`` is the oracle).

    Implementation: union the tagged streams, sort per key by
    (ts, right-before-left), and carry right values forward with
    ``last(..., ignorenulls=True)``; keep left rows. One shuffle on the
    key; per-key linear scan.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    missing = [k for k in keys if k not in right.columns]
    if missing:
        raise ValueError(f"asof_join: keys {missing} missing on right")
    # Equality-join semantics for NULL keys (= the DuckDB ASOF JOIN oracle):
    # a NULL key never matches, so NULL-key right rows can never be picked.
    # Window.partitionBy would group NULLs together and wrongly match them.
    null_key = None
    for k in keys:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    right = right.filter(~null_key)
    lcols = left.columns
    # Right values ride in ONE struct column: the struct is non-NULL for
    # every right row even when the value fields inside are NULL, so
    # last(..., ignorenulls) matches the latest right ROW — a genuine NULL
    # value in the as-of row is returned as NULL instead of leaking an
    # older non-NULL value (ASOF/DuckDB semantics).
    rstruct = F.struct(*[F.col(c) for c in value_cols])
    null_rstruct = F.lit(None).cast(
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        ) + ">"
    )
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        null_rstruct.alias("__r"),
    )
    tagged_right = right.select(
        *[
            (F.col(k) if k in right.columns
             else F.lit(None).cast(left.schema[k].dataType)).alias(k)
            for k in lcols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__match"),
    )
    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in value_cols],
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_micros: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_micros``. Adds
    ``session_seq`` (0-based per key) and ``event_seq`` (0-based within
    session). Two window passes over one shuffle on the key."""
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    micros = F.unix_micros(F.col(ts_col))
    prev = F.lag(micros).over(w)
    new_session = F.when(
        prev.isNull() | ((micros - prev) > gap_micros), F.lit(1)
    ).otherwise(F.lit(0))
    with_seq = df.withColumn("__new", new_session).withColumn(
        "session_seq",
        (F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("long"),
    )
    w_sess = Window.partitionBy(
        *[F.col(k) for k in key_cols], F.col("session_seq")
    ).orderBy(*order)
    return (
        with_seq.withColumn(
            "event_seq", (F.row_number().over(w_sess) - 1).cast("long")
        ).drop("__new")
    )


def tumbling_rollup(
    df: DataFrame,
    ts_col: str,
    unit: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Tumbling event-time windows via ``date_trunc`` (the batch analog of
    Structured Streaming's windowed aggregation in :mod:`..streaming`)."""
    return (
        df.withColumn("window_start", F.date_trunc(unit, F.col(ts_col)))
        .groupBy("window_start", *group_cols)
        .agg(*aggs)
    )


def attribution_credits(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: list[str],
    lookback_days: int,
) -> DataFrame:
    """Multi-touch marketing attribution: for every conversion event,
    credit the user's touch events in the ``lookback_days`` window
    strictly before it, under the three standard models at once::

        (channel, first_touch, last_touch, linear_micro)

    first/last = count of conversions where the channel was the
    earliest/latest touch in-window (ties broken by ``id_col`` — fully
    deterministic); linear_micro = sum over conversions of
    ``10⁶ div n_touches`` per touch (exact integers; a conversion's
    credits sum to ≤ 10⁶ with the remainder truncated, the price of
    cross-engine exactness).

    Scale: conversions ⋈ touches is an EQUI join on the user (never a
    non-equi time join — the window filter prunes post-join), and the
    ranking windows partition by conversion id, whose fan-in is bounded
    by the user's touch rate × lookback window, not by table size.
    Conversions with zero in-window touches simply contribute nothing
    (standard "unattributed" bucket — count them upstream if needed).
    """
    from pyspark.sql import Window

    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_cid"),
        F.col(ts_col).alias("_cts"),
    )
    touch = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("channel"),
        F.col(ts_col).alias("_tts"),
        F.col(id_col).alias("_tid"),
    )
    pairs = conv.join(touch, "_u").filter(
        (F.col("_tts") < F.col("_cts"))
        & (F.col("_tts") >= F.col("_cts") - F.expr(f"INTERVAL {lookback_days} DAYS"))
    )
    w = Window.partitionBy("_cid")
    asc = w.orderBy(F.col("_tts").asc(), F.col("_tid").asc())
    desc = w.orderBy(F.col("_tts").desc(), F.col("_tid").desc())
    credited = pairs.select(
        "channel",
        (F.row_number().over(asc) == 1).cast("long").alias("_first"),
        (F.row_number().over(desc) == 1).cast("long").alias("_last"),
        F.expr("1000000L").alias("_one_m"),
        F.count(F.lit(1)).over(w).alias("_n_t"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.sum("_first").cast("long").alias("first_touch"),
            F.sum("_last").cast("long").alias("last_touch"),
            F.sum(F.expr("_one_m div _n_t")).cast("long").alias("linear_micro"),
        )
    )


def attribution_credits_sql(
    table_expr: str,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: list[str],
    lookback_days: int,
) -> str:
    """DuckDB rendering of :func:`attribution_credits` (same tie-breaks,
    same integer linear credit)."""
    types = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH conv AS (
  SELECT {user_col} AS u, {id_col} AS cid, {ts_col} AS cts
  FROM {table_expr} WHERE {type_col} = '{conversion_type}'
),
touch AS (
  SELECT {user_col} AS u, {type_col} AS channel, {ts_col} AS tts,
         {id_col} AS tid
  FROM {table_expr} WHERE {type_col} IN ({types})
),
pairs AS (
  SELECT cid, channel, tts, tid
  FROM conv JOIN touch USING (u)
  WHERE tts < cts AND tts >= cts - INTERVAL {lookback_days} DAY
),
credited AS (
  SELECT channel,
         CASE WHEN row_number() OVER
              (PARTITION BY cid ORDER BY tts ASC, tid ASC) = 1
              THEN 1 ELSE 0 END AS first_t,
         CASE WHEN row_number() OVER
              (PARTITION BY cid ORDER BY tts DESC, tid DESC) = 1
              THEN 1 ELSE 0 END AS last_t,
         1000000 // count(*) OVER (PARTITION BY cid) AS lin
  FROM pairs
)
SELECT channel,
       CAST(sum(first_t) AS BIGINT) AS first_touch,
       CAST(sum(last_t) AS BIGINT) AS last_touch,
       CAST(sum(lin) AS BIGINT) AS linear_micro
FROM credited GROUP BY channel
"""


def decay_halving_agg(
    group_cols: Sequence[str],
    amount_cents: Column,
    age_days: Column,
    half_life_days: int,
):
    """Recency-weighted score per group with EXACT integer decay: an
    amount's weight halves every ``half_life_days`` — implemented as a
    right-shift by the elapsed half-life count, so the fold is pure
    integer arithmetic (no ``pow`` call whose libm rounding could differ
    between engines)::

        (group..., n_rows, raw_cents, decayed_cents)
        decayed_cents = Σ  cents >> min(age_days div H, 62)

    The standard feature-store recency weighting (recent activity
    dominates, stale activity fades) in a form that is bit-identical on
    any engine and map-side combinable — one groupBy, no window. Negative
    ages (future-dated rows) clamp to shift 0, i.e. full weight.
    """

    def apply(df: DataFrame) -> DataFrame:
        a = age_days.cast("long")
        # exact floor division (== DuckDB //): (a - pmod(a, H)) div H —
        # plain `/` would be double math
        halvings = (a - F.pmod(a, F.lit(half_life_days))).cast("long") / F.lit(
            half_life_days
        )
        h = F.greatest(
            F.least(halvings.cast("long"), F.lit(62)), F.lit(0)
        )
        # F.shiftright's numBits must be a Python int; the SQL function
        # itself takes an expression — call it directly for a per-row shift
        decayed = F.call_function(
            "shiftright", amount_cents.cast("long"), h.cast("int")
        )
        return df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(amount_cents.cast("long")).cast("long").alias("raw_cents"),
            F.sum(decayed).cast("long").alias("decayed_cents"),
        )

    return apply


def decay_halving_agg_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    cents_expr: str,
    age_days_expr: str,
    half_life_days: int,
) -> str:
    """DuckDB rendering of :func:`decay_halving_agg` (same integer
    shift, same clamps)."""
    g = ", ".join(group_exprs)
    shift = (
        f"greatest(least(CAST(({age_days_expr}) AS BIGINT) // {half_life_days}, 62), 0)"
    )
    return f"""
SELECT {g},
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(({cents_expr}) AS BIGINT)) AS BIGINT) AS raw_cents,
       CAST(sum(CAST(({cents_expr}) AS BIGINT) >> {shift}) AS BIGINT)
         AS decayed_cents
FROM {table_expr}
GROUP BY {g}
"""


def gap_fill_interpolate(
    df: DataFrame, key_cols: list[str], day_col: str, value_col: str
) -> DataFrame:
    """Dense daily series per key with LINEAR interpolation across gaps —
    the companion to LOCF gap-fill (which holds the last value flat;
    this one draws the line a rate/balance series actually follows)::

        (key..., day, value, is_obs)

    One row for every day in [min(day), max(day)] per key. Between
    consecutive observations ``(d0,v0) -> (d1,v1)`` the value is the
    exact floored lerp ``v0 + (v1-v0)·(day-d0) fdiv (d1-d0)`` — computed
    as ``(a - pmod(a, b)) div b`` so the FLOOR semantics are engine-
    portable even when ``v1 < v0`` (Spark ``div`` truncates, DuckDB
    ``//`` floors; on the pmod-adjusted exact multiple they agree).
    Observation days reproduce their value exactly (``is_obs = 1``).
    ``day_col``/``value_col`` must be integers (epoch days / cents).

    PRECONDITION: at most one observation per ``(key, day)`` — dedupe
    upstream (``dedupe_latest``) if the feed can repeat a day. A
    duplicate day produces a zero-length segment; both engines now DROP
    it (Spark emits an empty gap range exactly like DuckDB's
    ``range(d0, d0)``) rather than letting ``F.sequence``'s automatic
    negative step fabricate a spurious ``d0 - 1`` row.

    Scale: per-key lead window (bounded by a key's observation count) +
    one explode of each gap's day range — the same shape as the LOCF
    fill; multi-year gaps would want the month-spine chunked explode
    (operators/spine.py), not a per-segment sequence.
    """
    w = Window.partitionBy(*key_cols).orderBy(day_col)
    seg = (
        df.select(
            *key_cols,
            F.col(day_col).cast("long").alias("_d0"),
            F.col(value_col).cast("long").alias("_v0"),
        )
        .withColumn("_d1", F.lead("_d0").over(
            Window.partitionBy(*key_cols).orderBy("_d0")
        ))
        .withColumn("_v1", F.lead("_v0").over(
            Window.partitionBy(*key_cols).orderBy("_d0")
        ))
    )
    # _d1 <= _d0 only on contract-violating duplicate (key, day) rows:
    # emit an EMPTY range (DuckDB range() semantics) — never let
    # F.sequence auto-step backwards into a phantom d0-1 day.
    days = (
        F.when(F.col("_d1").isNull(), F.array(F.col("_d0")))
        .when(
            F.col("_d1") > F.col("_d0"),
            F.sequence(F.col("_d0"), F.col("_d1") - 1),
        )
        .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
    )
    out = (
        seg.withColumn("day", F.explode(days))
        .withColumn("_num", (F.col("_v1") - F.col("_v0")) * (F.col("day") - F.col("_d0")))
        .withColumn("_den", F.col("_d1") - F.col("_d0"))
        .withColumn(
            "value",
            F.when(F.col("_d1").isNull(), F.col("_v0")).otherwise(
                F.col("_v0")
                + F.expr("CAST((_num - pmod(_num, _den)) div _den AS BIGINT)")
            ).cast("long"),
        )
        .withColumn(
            "is_obs", (F.col("day") == F.col("_d0")).cast("int")
        )
    )
    return out.select(*key_cols, "day", "value", "is_obs")


def gap_fill_interpolate_sql(
    table_expr: str, key_exprs: list[str], day_expr: str, value_expr: str
) -> str:
    """DuckDB rendering of :func:`gap_fill_interpolate` (same floored
    lerp via the sign-safe pmod adjustment)."""
    k = ", ".join(key_exprs)
    return f"""
WITH obs AS (
  SELECT {k}, CAST({day_expr} AS BIGINT) AS d0,
         CAST({value_expr} AS BIGINT) AS v0
  FROM {table_expr}
),
seg AS (
  SELECT *, lead(d0) OVER w AS d1, lead(v0) OVER w AS v1
  FROM obs WINDOW w AS (PARTITION BY {k} ORDER BY d0)
),
days AS (
  SELECT {k}, d0, v0, d1, v1,
         unnest(CASE WHEN d1 IS NULL THEN [d0] ELSE range(d0, d1) END) AS day
  FROM seg
),
lerp AS (
  SELECT {k}, d0, v0, d1, v1, day,
         (v1 - v0) * (day - d0) AS num, d1 - d0 AS den
  FROM days
)
SELECT {k}, day,
       CAST(CASE WHEN d1 IS NULL THEN v0
            ELSE v0 + (num - ((num % den) + den) % den) // den END AS BIGINT)
         AS value,
       CAST(CASE WHEN day = d0 THEN 1 ELSE 0 END AS INT) AS is_obs
FROM lerp
"""


def time_weighted_avg(
    df: DataFrame, key_cols: list[str], ts_col: str, value_col: str
) -> DataFrame:
    """Time-weighted average (TWAP) per key over IRREGULAR samples —
    the correct mean for telemetry/balance/price series where a plain
    AVG over-weights bursts (10 samples in one hot minute ≠ 10 minutes
    at that level). Piecewise-constant holding: each sample holds until
    the next one, so::

        twap = Σ v_i·(t_{i+1} - t_i)  div  (t_last - t_first)

    Emits ``(key..., n_obs, span, vw_sum, twap)`` — pure integers
    (``ts_col``/``value_col`` integer epoch/cents; the div is the
    sign-safe floored ``(a - pmod(a,b)) div b``). A single-sample key
    (span 0) reports its own value as the TWAP.

    Scale: one per-key lead window (bounded by the key's sample count)
    + one map-side-combinable fold. ``value·span`` must stay inside
    signed 64-bit.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, value_col)
    seg = df.select(
        *key_cols,
        F.col(ts_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
    ).withColumn(
        "_dt",
        F.lead(F.col("_t")).over(
            Window.partitionBy(*key_cols).orderBy("_t", "_v")
        )
        - F.col("_t"),
    )
    agg = seg.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        (F.max("_t") - F.min("_t")).cast("long").alias("span"),
        F.sum(F.when(F.col("_dt").isNotNull(), F.col("_v") * F.col("_dt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("vw_sum"),
        F.max(F.when(F.col("_dt").isNull(), F.col("_v"))).cast("long").alias("_last_v"),
    )
    return agg.select(
        *key_cols,
        "n_obs",
        "span",
        "vw_sum",
        F.when(F.col("span") == 0, F.col("_last_v"))
        .otherwise(
            F.expr("CAST((vw_sum - pmod(vw_sum, span)) div span AS BIGINT)")
        )
        .cast("long")
        .alias("twap"),
    )


def time_weighted_avg_sql(
    table_expr: str, key_exprs: list[str], ts_expr: str, value_expr: str
) -> str:
    """DuckDB rendering of :func:`time_weighted_avg` (same hold-forward
    weighting, same sign-safe floored division)."""
    k = ", ".join(key_exprs)
    return f"""
WITH seg AS (
  SELECT {k}, CAST({ts_expr} AS BIGINT) AS t, CAST({value_expr} AS BIGINT) AS v,
         lead(CAST({ts_expr} AS BIGINT)) OVER w - CAST({ts_expr} AS BIGINT) AS dt
  FROM {table_expr}
  WINDOW w AS (PARTITION BY {k} ORDER BY CAST({ts_expr} AS BIGINT),
               CAST({value_expr} AS BIGINT))
),
agg AS (
  SELECT {k},
         CAST(count(*) AS BIGINT) AS n_obs,
         CAST(max(t) - min(t) AS BIGINT) AS span,
         CAST(sum(CASE WHEN dt IS NOT NULL THEN v * dt ELSE 0 END) AS BIGINT)
           AS vw_sum,
         CAST(max(CASE WHEN dt IS NULL THEN v END) AS BIGINT) AS last_v
  FROM seg GROUP BY {k}
)
SELECT {k}, n_obs, span, vw_sum,
       CAST(CASE WHEN span = 0 THEN last_v
            ELSE (vw_sum - ((vw_sum % span) + span) % span) // span END
            AS BIGINT) AS twap
FROM agg
"""


def ohlc_agg(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """Ordered-endpoint aggregation (OHLC downsampling) per key::

        (key..., n, open_v, high_v, low_v, close_v)

    ``open_v``/``close_v`` are the value at the FIRST/LAST position
    under ``ORDER BY (order_col, tiebreak_col)`` — computed as
    ``min_by``/``max_by`` over the composite struct key, i.e. ONE
    aggregation with map-side partials, never a per-key ordered window
    (the window form funnels each key through a sort; the endpoint
    aggregation is a constant-size fold per partition). ``tiebreak_col``
    must make the composite order total, or the endpoints are
    non-deterministic. ``order_col``/``tiebreak_col``/``value_col``
    must be integral (epoch ms / ids / cents).

    The DuckDB rendering encodes the composite order key as a single
    HUGEINT (``order·2⁶⁴ + tiebreak``) because ``arg_min`` takes one
    scalar — same total order, same endpoints. Requires both order
    components non-negative and the tiebreak < 2⁶³.
    """
    okey = F.struct(
        F.col(order_col).cast("long"), F.col(tiebreak_col).cast("long")
    )
    v = F.col(value_col).cast("long")
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min_by(v, okey).cast("long").alias("open_v"),
        F.max(v).cast("long").alias("high_v"),
        F.min(v).cast("long").alias("low_v"),
        F.max_by(v, okey).cast("long").alias("close_v"),
    )


def ohlc_agg_sql(
    table_expr: str,
    key_exprs: list[str],
    order_expr: str,
    tiebreak_expr: str,
    value_expr: str,
) -> str:
    """DuckDB rendering of :func:`ohlc_agg` (HUGEINT-encoded composite
    order key — see the operator docstring)."""
    k = ", ".join(key_exprs)
    okey = (
        f"CAST({order_expr} AS HUGEINT) * 18446744073709551616"
        f" + CAST({tiebreak_expr} AS BIGINT)"
    )
    return f"""
SELECT {k}, CAST(count(*) AS BIGINT) AS n,
       CAST(arg_min(CAST({value_expr} AS BIGINT), {okey}) AS BIGINT) AS open_v,
       CAST(max(CAST({value_expr} AS BIGINT)) AS BIGINT) AS high_v,
       CAST(min(CAST({value_expr} AS BIGINT)) AS BIGINT) AS low_v,
       CAST(arg_max(CAST({value_expr} AS BIGINT), {okey}) AS BIGINT) AS close_v
FROM {table_expr}
GROUP BY {k}
"""


def nearest_event_join(
    needles: DataFrame,
    hay: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    tolerance: int,
) -> DataFrame:
    """Nearest-in-time join within ``±tolerance``: for every needle row,
    the single hay row of the same key minimizing ``|Δts|`` (tie → the
    EARLIER hay event), or NULLs when none lands in the window::

        (key..., needle_id, needle_ts, matched_id, dist)

    The as-of join answers "latest at-or-before"; monitoring/attribution
    regularly needs "closest, either side" — this is that, built as the
    union-window composition: tag both streams, ONE per-key ordered
    window finds the previous and next hay timestamps around each
    needle (``last/first IGNORE NULLS``), then the winner is picked by
    exact integer comparison (backward wins ties: ``prev_dist <=
    next_dist``). ``ts_col`` must be integral (epoch ms) and the
    ``(ts, id)`` pair unique per key.

    Scale: one shuffle on the key, per-key sorted windows (bounded by
    the key's row count — the sessionize/as-of physiology), no
    range-explosion and no self-join on an inequality.
    """
    n = needles.select(
        *key_cols,
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(id_col).cast("long").alias("_nid"),
        F.lit(None).cast("long").alias("_hid"),
        F.lit(1).alias("_is_needle"),
    )
    h = hay.select(
        *key_cols,
        F.col(ts_col).cast("long").alias("_ts"),
        F.lit(None).cast("long").alias("_nid"),
        F.col(id_col).cast("long").alias("_hid"),
        F.lit(0).alias("_is_needle"),
    )
    u = n.unionByName(h)
    # needles sort AFTER hay at equal ts (_is_needle desc? no: asc puts
    # hay (0) first) so an exactly-simultaneous hay event is "previous"
    # — dist 0, matched backward, both engines identically.
    w = Window.partitionBy(*key_cols).orderBy("_ts", "_is_needle", "_hid")
    prev_struct = F.last(
        F.when(
            F.col("_is_needle") == 0,
            F.struct(F.col("_ts").alias("t"), F.col("_hid").alias("i")),
        ),
        ignorenulls=True,
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    nxt_struct = F.first(
        F.when(
            F.col("_is_needle") == 0,
            F.struct(F.col("_ts").alias("t"), F.col("_hid").alias("i")),
        ),
        ignorenulls=True,
    ).over(w.rowsBetween(1, Window.unboundedFollowing))
    scored = (
        u.withColumn("_prev", prev_struct)
        .withColumn("_next", nxt_struct)
        .filter(F.col("_is_needle") == 1)
        .withColumn(
            "_pd",
            F.when(
                F.col("_prev").isNotNull(), F.col("_ts") - F.col("_prev.t")
            ),
        )
        .withColumn(
            "_nd",
            F.when(
                F.col("_next").isNotNull(), F.col("_next.t") - F.col("_ts")
            ),
        )
    )
    take_prev = F.col("_pd").isNotNull() & (F.col("_pd") <= tolerance) & (
        F.col("_nd").isNull()
        | (F.col("_pd") <= F.col("_nd"))
        | (F.col("_nd") > tolerance)
    )
    take_next = (
        ~F.coalesce(take_prev, F.lit(False))
        & F.col("_nd").isNotNull()
        & (F.col("_nd") <= tolerance)
    )
    return scored.select(
        *key_cols,
        F.col("_nid").alias("needle_id"),
        F.col("_ts").alias("needle_ts"),
        F.when(take_prev, F.col("_prev.i"))
        .when(take_next, F.col("_next.i"))
        .cast("long")
        .alias("matched_id"),
        F.when(take_prev, F.col("_pd"))
        .when(take_next, F.col("_nd"))
        .cast("long")
        .alias("dist"),
    )


def nearest_event_join_sql(
    needles_sql: str,
    hay_sql: str,
    key_exprs: list[str],
    tolerance: int,
) -> str:
    """DuckDB rendering of :func:`nearest_event_join`. Both inputs must
    project ``(key..., ts, id)``; same union-window composition, same
    backward-wins-ties pick."""
    k = ", ".join(key_exprs)
    return f"""
WITH needles AS ({needles_sql}),
hay AS ({hay_sql}),
u AS (
  SELECT {k}, CAST(ts AS BIGINT) AS ts, CAST(id AS BIGINT) AS nid,
         CAST(NULL AS BIGINT) AS hid, 1 AS is_needle FROM needles
  UNION ALL
  SELECT {k}, CAST(ts AS BIGINT) AS ts, CAST(NULL AS BIGINT) AS nid,
         CAST(id AS BIGINT) AS hid, 0 AS is_needle FROM hay
),
scored AS (
  SELECT {k}, ts, nid, is_needle,
         last_value(CASE WHEN is_needle = 0 THEN ts END IGNORE NULLS)
           OVER w_prev AS prev_t,
         last_value(CASE WHEN is_needle = 0 THEN hid END IGNORE NULLS)
           OVER w_prev AS prev_i,
         first_value(CASE WHEN is_needle = 0 THEN ts END IGNORE NULLS)
           OVER w_next AS next_t,
         first_value(CASE WHEN is_needle = 0 THEN hid END IGNORE NULLS)
           OVER w_next AS next_i
  FROM u
  WINDOW
    w_prev AS (PARTITION BY {k} ORDER BY ts, is_needle, hid
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    w_next AS (PARTITION BY {k} ORDER BY ts, is_needle, hid
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
),
picked AS (
  SELECT {k}, nid, ts, prev_i, next_i,
         ts - prev_t AS pd, next_t - ts AS nd
  FROM scored WHERE is_needle = 1
)
SELECT {k}, nid AS needle_id, ts AS needle_ts,
       CAST(CASE
         WHEN pd IS NOT NULL AND pd <= {tolerance}
              AND (nd IS NULL OR pd <= nd OR nd > {tolerance})
           THEN prev_i
         WHEN nd IS NOT NULL AND nd <= {tolerance}
           THEN next_i
       END AS BIGINT) AS matched_id,
       CAST(CASE
         WHEN pd IS NOT NULL AND pd <= {tolerance}
              AND (nd IS NULL OR pd <= nd OR nd > {tolerance}) THEN pd
         WHEN nd IS NOT NULL AND nd <= {tolerance} THEN nd
       END AS BIGINT) AS dist
FROM picked
"""


def growth_accounting(
    df: DataFrame, user_col: str, day_col: str
) -> DataFrame:
    """Daily growth accounting over an activity log::

        (day, active, new, returning, cumulative)

    ``new`` = users whose FIRST-ever activity is this day, ``returning``
    = active − new, ``cumulative`` = running distinct-user count — the
    standard DAU decomposition, computed without any distinct-over-
    window: per-user first day is one groupBy(user), daily actives one
    groupBy(user, day)→(day), and the running sum is a window over the
    BOUNDED day frame.  Days with no activity emit no row (spine-join
    downstream if a dense calendar is needed).

    Scale: two user-keyed shuffles + one bounded-frame window; no state
    proportional to users×days.
    """
    user = F.col(user_col)
    day = F.col(day_col)
    active = (
        df.select(user.alias("_u"), day.alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("active"))
    )
    first = (
        df.groupBy(user.alias("_u"))
        .agg(F.min(day).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("new"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(first, "day", "left")
        .select(
            "day",
            "active",
            F.coalesce(F.col("new"), F.lit(0)).cast("long").alias("new"),
        )
        .withColumn("returning", (F.col("active") - F.col("new")).cast("long"))
        .withColumn("cumulative", F.sum("new").over(w).cast("long"))
    )


def growth_accounting_sql(table_expr: str, user_expr: str, day_expr: str) -> str:
    """DuckDB rendering of :func:`growth_accounting`."""
    return f"""
WITH act AS (
  SELECT DISTINCT {user_expr} AS u, {day_expr} AS day FROM {table_expr}
),
daily AS (SELECT day, CAST(count(*) AS BIGINT) AS active FROM act GROUP BY 1),
firsts AS (
  SELECT day, CAST(count(*) AS BIGINT) AS new FROM (
    SELECT u, min(day) AS day FROM act GROUP BY 1
  ) GROUP BY 1
)
SELECT d.day, d.active,
       CAST(coalesce(f.new, 0) AS BIGINT) AS new,
       CAST(d.active - coalesce(f.new, 0) AS BIGINT) AS returning,
       CAST(sum(coalesce(f.new, 0)) OVER (ORDER BY d.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative
FROM daily d LEFT JOIN firsts f USING (day)
"""


def funnel_steps(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel conversion over an event log::

        (step, step_name, n_users)   -- one row per step, count may be 0

    A user counts at step k if a step-k event occurs STRICTLY after
    their chosen (earliest-qualifying) step-(k-1) event; the chosen
    event at step k is the earliest such event, so the match is the
    greedy left-to-right scan of the user's timeline.

    Scale: each step is one filtered min-aggregation plus an equi-join
    on the uniform user key — no per-user event collection, no window
    over the raw stream; the survivor frame shrinks monotonically.
    """
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        F.col(ts_col).alias("_ts"),
    )
    prev = (
        ev.filter(F.col("_e") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_t"))
    )
    stages = [prev]
    for step in steps[1:]:
        prev = (
            ev.filter(F.col("_e") == step)
            .join(prev.select("_u", F.col("_t").alias("_tp")), "_u")
            .filter(F.col("_ts") > F.col("_tp"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
        )
        stages.append(prev)
    counts = [
        s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )
        for i, (name, s) in enumerate(zip(steps, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def retention_cohorts(df: DataFrame, user_col: str, month_col: str) -> DataFrame:
    """Monthly retention cohorts over a (user, activity-month) log::

        (cohort_month, month_offset, n_users)

    ``cohort_month`` is the user's first active month, ``month_offset``
    the calendar-month distance, ``n_users`` the distinct users from
    that cohort active at that offset. ``month_col`` must already be a
    month-truncated DATE (the caller owns the truncation grain).

    Scale: two uniform shuffles — per-user min, then the distinct count
    on the bounded (cohort, offset) grid; no window over the full fact.
    """
    months = df.select(
        F.col(user_col).alias("_u"), F.col(month_col).alias("_m")
    ).distinct()
    cohort = months.groupBy("_u").agg(F.min("_m").alias("_cm"))
    idx = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    return (
        months.join(cohort, "_u")
        .groupBy(
            F.col("_cm").alias("cohort_month"),
            (idx(F.col("_m")) - idx(F.col("_cm"))).alias("month_offset"),
        )
        .agg(F.countDistinct("_u").alias("n_users"))
    )


def acf_lags(
    df: DataFrame, t_col: str, value_col: str, max_lag: int = 7
) -> DataFrame:
    """Exact autocorrelation of an already-aggregated series at lags
    1..``max_lag``::

        (lag, n, acf_6)

    acf(k) = Pearson corr of (x_t, x_{t−k}) over the overlapping span —
    the seasonality probe that tells you WHICH period the weekday
    operators should use.  Intended for BOUNDED series frames (a daily
    rollup — the unpartitioned lag window is over that bounded frame,
    never the raw events; the caller owns the pre-aggregation).  One
    window computes every lag column, one explode reshapes to (lag, x,
    y), exact decimal moment sums per lag, one float division rounded
    to 6 (the bivariate_stats discipline).
    """
    w = Window.orderBy(t_col)  # bounded series frame — documented
    x = F.col(value_col).cast("long")
    lagged = df.select(
        x.alias("_x"),
        *[F.lag(x, k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    pairs = lagged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("_x").alias("x"),
                        F.col(f"_l{k}").alias("y"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("_p")
    ).select("_p.lag", "_p.x", "_p.y").filter(F.col("y").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("_sx"),
        F.sum(dec(F.col("y"))).alias("_sy"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("_sxx"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("_syy"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("_sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    dx = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    dy = (n * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    return agg.select(
        F.col("lag").cast("long"),
        "n",
        # a constant (or single-point) overlap span has no correlation:
        # explicit NULL on both engines (DuckDB double/0 nulls; Spark
        # would emit NaN/Inf)
        F.when(
            (dx > 0) & (dy > 0), F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)
        ).alias("acf_6"),
    )


def acf_lags_sql(
    table_expr: str, t_expr: str, value_expr: str, max_lag: int = 7
) -> str:
    """DuckDB rendering of :func:`acf_lags` — same HUGEINT moments."""
    lag_cols = ", ".join(
        f"lag(CAST({value_expr} AS BIGINT), {k}) OVER (ORDER BY {t_expr})"
        f" AS l{k}"
        for k in range(1, max_lag + 1)
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT {k} AS lag, x, l{k} AS y FROM lagged WHERE l{k} IS NOT NULL"
        for k in range(1, max_lag + 1)
    )
    return f"""
WITH lagged AS (
  SELECT CAST({value_expr} AS BIGINT) AS x, {lag_cols} FROM {table_expr}
),
pairs AS ({arms}),
m AS (
  SELECT lag, CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
  FROM pairs GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
            round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS acf_6
FROM m
"""


# --- Kaplan-Meier survival / churn curve --------------------------------------


def kaplan_meier(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve per cohort with right-censoring —
    the churn/retention-duration estimator (how long do users stay,
    accounting for the ones still active)::

        (group..., t, n_at_risk, n_events, n_censored,
         cum_log_surv_micro)

    Input: ONE ROW PER SUBJECT — integer ``duration_col`` (time
    observed) and ``event_col`` (1 = the event happened at that time,
    0 = right-censored there). The curve is carried in LOG space as
    exact integers: per step ``term_t = round(ln((n_t − d_t)/n_t)·10⁶)``
    (a single IEEE ln on exact integer counts, rounded BEFORE the
    cumulative sum — the PMI/entropy float discipline; survival itself
    is ``exp(cum/10⁶)``, left to the consumer so no engine ever folds
    floats). Steps with ``d_t = 0`` contribute 0. An absorbing step
    (``d_t = n_t``: everyone at risk dies) makes survival exactly 0 —
    log-survival is NULL from that step onward, explicit on both
    engines.

    Scale: one (group, t) count pass (map-side combinable), then all
    windows run over the bounded distinct-duration frame per group
    (day-grained durations — the ``acf_lags`` bounded-frame contract;
    the caller owns the duration quantization).
    """
    gcols = [F.col(c) for c in group_cols]
    ev = F.col(event_col).cast("long")
    per_t = df.groupBy(
        *gcols, F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.sum(ev).cast("long").alias("n_events"),
        F.sum(F.lit(1) - ev).cast("long").alias("n_censored"),
    )
    return kaplan_meier_from_counts(per_t, group_cols)


def kaplan_meier_from_counts(
    per_t: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Kaplan-Meier curve from a per-duration count grid ``(group...,
    t, n_events, n_censored)`` — the MERGEABLE-STATE form of
    :func:`kaplan_meier` (which delegates here after its groupBy).

    The grid is plain integer counts on deterministic keys: exactly
    what a streaming groupBy over COMPLETED subjects maintains
    (``streaming.streaming_duration_counts``) and what shards merge by
    cell addition — a snapshot through here is bit-identical to the
    batch curve over the same subjects (pytest-pinned stream==batch).
    All windows run over the bounded distinct-duration frame.
    """
    gcols = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*group_cols).orderBy("t")  # bounded t frame
    before = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ).cast("long")
    risked = per_t.withColumn("n_at_risk", total - before)
    term = F.when(F.col("n_events") == 0, F.lit(0)).when(
        F.col("n_events") < F.col("n_at_risk"),
        F.round(
            F.log(
                (F.col("n_at_risk") - F.col("n_events")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * F.lit(1000000.0)
        ).cast("long"),
    )  # d == n_at_risk -> NULL (absorbing)
    stepped = risked.withColumn("_term", term).withColumn(
        "_absorbed",
        F.max(
            F.when(F.col("n_events") == F.col("n_at_risk"), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return stepped.select(
        *gcols,
        "t",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.when(
            F.col("_absorbed") == 0,
            F.sum("_term").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .cast("long")
        .alias("cum_log_surv_micro"),
    )


def kaplan_meier_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    duration_expr: str,
    event_expr: str,
) -> str:
    """DuckDB rendering of :func:`kaplan_meier` — same per-step rounded
    micro-nat terms, same absorbing-step NULL."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    # positional GROUP BY: the alias `t` must never collide with a
    # table named t in table_expr
    gby = "GROUP BY " + ", ".join(
        str(i + 1) for i in range(len(group_exprs) + 1)
    )
    return f"""
WITH per_t AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST(sum(CAST({event_expr} AS BIGINT)) AS BIGINT) AS n_events,
         CAST(sum(1 - CAST({event_expr} AS BIGINT)) AS BIGINT) AS n_censored
  FROM {table_expr} {gby}
),
risked AS (
  SELECT *,
         CAST(sum(n_events + n_censored) OVER ({part})
              - coalesce(sum(n_events + n_censored) OVER ({part}ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_at_risk
  FROM per_t
),
stepped AS (
  SELECT *,
         CASE WHEN n_events = 0 THEN 0
              WHEN n_events < n_at_risk THEN
                CAST(round(ln(CAST(n_at_risk - n_events AS DOUBLE)
                              / CAST(n_at_risk AS DOUBLE)) * 1000000.0)
                     AS BIGINT) END AS term,
         max(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END)
           OVER ({part}ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS absorbed
  FROM risked
)
SELECT {gsel}t, n_at_risk, n_events, n_censored,
       CASE WHEN absorbed = 0 THEN
         CAST(sum(term) OVER ({part}ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       END AS cum_log_surv_micro
FROM stepped
"""


def nelson_aalen(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard curve per cohort with
    right-censoring — the additive companion of :func:`kaplan_meier`
    (H(t) = Σ_{t_i<=t} d_i/n_i; preferred when comparing hazards across
    cohorts or feeding a hazard-ratio readout, because sums of rates
    are better behaved than products of survival fractions)::

        (group..., t, n_at_risk, n_events, n_censored,
         cum_hazard_micro)

    Same input contract as Kaplan-Meier: ONE ROW PER SUBJECT, integer
    ``duration_col``, ``event_col`` 1 = event at that time / 0 =
    right-censored there. The curve is exact integers: per step
    ``term_t = round((d_t/n_t)·10⁶)`` (a single IEEE division on exact
    integer counts, rounded BEFORE the cumulative sum — the same float
    discipline as KM's log-survival terms). Unlike KM there is no
    absorbing singularity: ``d_t = n_t`` just contributes the full
    1.0 = 10⁶ micro step, so the curve is total.

    Scale: identical physiology to :func:`kaplan_meier_from_counts` —
    one (group, t) count pass, then windows over the bounded
    distinct-duration frame per group (day-grained durations; the
    caller owns the quantization).
    """
    gcols = [F.col(c) for c in group_cols]
    ev = F.col(event_col).cast("long")
    per_t = df.groupBy(
        *gcols, F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.sum(ev).cast("long").alias("n_events"),
        F.sum(F.lit(1) - ev).cast("long").alias("n_censored"),
    )
    return nelson_aalen_from_counts(per_t, group_cols)


def nelson_aalen_from_counts(
    per_t: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Nelson-Aalen curve from a per-duration count grid ``(group...,
    t, n_events, n_censored)`` — the MERGEABLE-STATE form of
    :func:`nelson_aalen` (delegates like
    :func:`kaplan_meier_from_counts`, and feeds from the SAME streaming
    grid ``streaming.streaming_duration_counts``: one maintained count
    state serves both survival readouts, pytest-pinned stream==batch).
    """
    gcols = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*group_cols).orderBy("t")  # bounded t frame
    before = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ).cast("long")
    risked = per_t.withColumn("n_at_risk", total - before)
    term = F.when(F.col("n_events") == 0, F.lit(0)).otherwise(
        F.round(
            F.col("n_events").cast("double")
            / F.col("n_at_risk").cast("double")
            * F.lit(1000000.0)
        ).cast("long")
    )
    return risked.withColumn("_term", term).select(
        *gcols,
        "t",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.sum("_term")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_hazard_micro"),
    )


def nelson_aalen_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    duration_expr: str,
    event_expr: str,
) -> str:
    """DuckDB rendering of :func:`nelson_aalen` — same per-step rounded
    micro terms, same cumulative integer sum."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    gby = "GROUP BY " + ", ".join(
        str(i + 1) for i in range(len(group_exprs) + 1)
    )
    return f"""
WITH per_t AS (
  SELECT {gsel}CAST({duration_expr} AS BIGINT) AS t,
         CAST(sum(CAST({event_expr} AS BIGINT)) AS BIGINT) AS n_events,
         CAST(sum(1 - CAST({event_expr} AS BIGINT)) AS BIGINT) AS n_censored
  FROM {table_expr} {gby}
),
risked AS (
  SELECT *,
         CAST(sum(n_events + n_censored) OVER ({part})
              - coalesce(sum(n_events + n_censored) OVER ({part}ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_at_risk
  FROM per_t
),
stepped AS (
  SELECT *,
         CASE WHEN n_events = 0 THEN 0
              ELSE CAST(round(CAST(n_events AS DOUBLE)
                              / CAST(n_at_risk AS DOUBLE) * 1000000.0)
                        AS BIGINT) END AS term
  FROM risked
)
SELECT {gsel}t, n_at_risk, n_events, n_censored,
       CAST(sum(term) OVER ({part}ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_micro
FROM stepped
"""


# --- Markov removal-effect attribution ------------------------------------------

MARKOV_START, MARKOV_CONV, MARKOV_NULL = "_START_", "_CONV_", "_NULL_"

# Hard cap on the journey-state domain for the driver-side value iteration
# in markov_attribution_from_counts: the recurrence is
# O(states^3 * iterations) Python work and collects up to states^2 grid
# cells, so "bounded" must be enforced, not just documented. 128 states
# (125 channels + the 3 sentinels) keeps the worst case ~40M int ops;
# real channel taxonomies are tens of values.
_MARKOV_MAX_STATES = 128


def markov_removal_attribution(
    transitions: DataFrame,
    iterations: int = 20,
    checkpoint_every: int = 25,
) -> DataFrame:
    """Data-driven (Markov removal-effect) attribution — the
    model-based complement to first/last/linear credits
    (:func:`attribution_credits`): how much conversion probability
    disappears when each channel is removed from the journey graph::

        (channel, base_conv_ppm, removed_conv_ppm,
         removal_effect_ppm, attribution_ppm)

    Input: ONE ROW PER OBSERVED TRANSITION ``(src, dst)`` over the
    journey states — channels plus the reserved ``_START_`` /
    ``_CONV_`` / ``_NULL_`` markers (the caller derives these from its
    sessions; every path must begin at ``_START_`` and end in one of
    the absorbers). The operator folds counts to ppm transition
    probabilities (``cnt·10⁶ div row_total``), then runs ``iterations``
    synchronous value-iteration steps of the absorption probability
    ``x(s) = Σ_dst p(s,dst)·x(dst)`` with ``x(_CONV_)=10⁶``,
    ``x(_NULL_)=0`` — pure integer arithmetic, one truncation per
    (scenario, state) per step, bit-identical on both engines. Removing
    channel c = forcing ``x(c)=0`` (every visit to c becomes a null-out
    — the standard removal-effect construction). All scenarios (BASE +
    one per channel) iterate TOGETHER as one (scenario, state) frame.
    ``attribution_ppm`` shares the base conversion mass by normalized
    positive removal effects (largest-remainder NOT needed — ppm
    truncation is the documented convention).

    Scale: the journey graph is BOUNDED (channels², typically ≤ 10⁴
    cells) regardless of session volume — the heavy lifting is the
    transition-count fold, which is one map-side-combinable groupBy on
    the raw transitions; everything after runs on (scenarios × states)
    rows with a broadcast transition matrix.

    r14: the value iteration itself runs DRIVER-SIDE on the bounded
    (channels+3)² grid (see :func:`markov_attribution_from_counts`);
    the ONLY distributed stage is the transition-count fold below.
    ``checkpoint_every`` is kept for API compatibility and ignored —
    there is no distributed lineage left to truncate (it was a
    measured no-op at the default horizon even before: r13 cadence
    A/B, every-5 = 3.6-5.5 s vs none = 2.15 s isolated).
    """
    counts = (
        transitions.groupBy(
            F.col("src").cast("string").alias("_s"),
            F.col("dst").cast("string").alias("_d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    return markov_attribution_from_counts(
        counts, iterations=iterations, checkpoint_every=checkpoint_every
    )


def markov_attribution_from_counts(
    counts: DataFrame,
    iterations: int = 20,
    checkpoint_every: int = 25,
) -> DataFrame:
    """Removal-effect attribution from an ALREADY-AGGREGATED
    ``(_s, _d, _c)`` transition-count grid — the MERGEABLE-STATE form
    of :func:`markov_removal_attribution` (which delegates here after
    its one data-sized fold). The grid is exactly what
    ``streaming.streaming_transition_counts`` maintains for the
    transition-entropy readout (rename ``_t``→``_d``, ``_n_st``→``_c``)
    and what shards merge by cell addition — so ONE maintained count
    state serves both "how predictable is the next event" and the live
    attribution dashboard, no journey-log re-read (pytest-pinned
    stream==batch). Everything here runs on the bounded
    (channels+3)² journey grid."""
    # r14 OPTIMIZATION (alternating A/B 0.34x, tools/exp_markov_r14.py,
    # output asserted row-identical): the value iteration runs DRIVER-SIDE.
    # After the caller's one data-sized count fold, EVERY frame here is
    # bounded by the journey-state domain — (channels+3)^2 cells — yet the
    # former distributed loop paid 20 rounds x (shuffle join + shuffle agg)
    # of stage scheduling, plus four tail branches re-embedding the
    # unrolled chain (378 Exchange refs in EXPLAIN text). This is the
    # BPE-vocab discipline: BOUNDED state may cross the driver
    # (documented), data-sized state never does — the collect below moves
    # at most (channels+3)^2 rows regardless of session volume. The Python
    # recurrence replays the former DataFrame semantics EXACTLY in exact
    # ints: the inner probs-totals join dropped NULL `_s` cells (kept);
    # duplicate (_s,_d) cells each truncated their OWN ppm (kept: per-row
    # cells, not merged); one floor-truncation per (scenario, state) per
    # step (kept — values are non-negative, so Spark `div` == Python `//`).
    # ``checkpoint_every`` is retired to a no-op: nothing distributed
    # remains to truncate.
    del checkpoint_every
    spark = counts.sparkSession
    # Scale guard (r15): "bounded" was only a docstring contract — a caller
    # feeding a high-cardinality domain (user ids as "channels") would
    # collect O(C^2) cells and run O(C^3 * iterations) Python. The limit()
    # bounds what can ever reach the driver (the collect pulls at most
    # MAX_STATES^2 + 1 rows, then fails fast); the state-count check below
    # bounds the value-iteration work itself.
    max_cells = _MARKOV_MAX_STATES * _MARKOV_MAX_STATES
    rows = counts.select("_s", "_d", "_c").limit(max_cells + 1).collect()
    if len(rows) > max_cells:
        raise ValueError(
            "markov_attribution_from_counts: transition grid exceeds "
            f"{max_cells} cells ({_MARKOV_MAX_STATES}^2) — the driver-side "
            "value iteration requires a bounded channel domain; aggregate "
            "raw journeys to real channels before calling (the BPE-vocab "
            "bounded-state discipline)."
        )
    tot: dict[str, int] = {}
    for r in rows:
        if r["_s"] is not None:
            tot[r["_s"]] = tot.get(r["_s"], 0) + r["_c"]
    # per-ROW probability cells (duplicates NOT merged, NULL _s dropped —
    # both mirror the former counts-totals inner join exactly)
    probs = [
        (r["_s"], r["_d"], (r["_c"] * 1000000) // tot[r["_s"]])
        for r in rows
        if r["_s"] is not None
    ]
    states = sorted(
        {s for s, _d, _p in probs} | {d for _s, d, _p in probs},
        key=lambda v: (v is None, v),
    )
    if len(states) > _MARKOV_MAX_STATES:
        raise ValueError(
            "markov_attribution_from_counts: "
            f"{len(states)} distinct journey states exceed the documented "
            f"driver-side bound of {_MARKOV_MAX_STATES} — the removal-effect "
            "recurrence is O(states^3 * iterations); map the journey log to "
            "a real channel taxonomy first."
        )
    channels = [
        s
        for s in states
        if s is not None and s not in (MARKOV_START, MARKOV_CONV, MARKOV_NULL)
    ]
    scenarios = channels + ["_BASE_"]
    by_src: dict[str | None, list[tuple[str | None, int]]] = {}
    for s, d, pr in probs:
        by_src.setdefault(s, []).append((d, pr))
    x = {
        (sc, st): (1000000 if st == MARKOV_CONV else 0)
        for sc in scenarios
        for st in states
    }
    for _ in range(iterations):
        nx = {}
        for sc in scenarios:
            for st in states:
                if st == MARKOV_CONV:
                    nx[(sc, st)] = 1000000
                elif st == MARKOV_NULL or st == sc:
                    nx[(sc, st)] = 0
                else:
                    acc = 0
                    for d, pr in by_src.get(st, ()):
                        if d != sc:
                            acc += pr * x.get((sc, d), 0)
                    nx[(sc, st)] = acc // 1000000
        x = nx
    # the former `start` frame only had rows when _START_ is a state
    if MARKOV_START in states:
        base_conv = x[("_BASE_", MARKOV_START)]
        effects = [
            (ch, base_conv, x[(ch, MARKOV_START)]) for ch in channels
        ]
    else:
        effects = []
    te = sum(max(b - r, 0) for _ch, b, r in effects)
    data = [
        (
            ch,
            b,
            r,
            max(b - r, 0),
            ((max(b - r, 0) * 1000000) // te) if te != 0 else None,
        )
        for ch, b, r in effects
    ]
    schema = T.StructType(
        [
            T.StructField("channel", T.StringType()),
            T.StructField("base_conv_ppm", T.LongType()),
            T.StructField("removed_conv_ppm", T.LongType()),
            T.StructField("removal_effect_ppm", T.LongType()),
            T.StructField("attribution_ppm", T.LongType()),
        ]
    )
    return spark.createDataFrame(data, schema)


def markov_removal_attribution_sql(
    transitions_expr: str, iterations: int = 20
) -> str:
    """DuckDB rendering of :func:`markov_removal_attribution` — the same
    unrolled integer value-iteration (materialized CTE per step, the
    bfs/pagerank oracle idiom). ``transitions_expr`` must select
    ``(src, dst)``."""
    ctes = [
        f"""trans AS MATERIALIZED (
  SELECT CAST(src AS VARCHAR) AS s, CAST(dst AS VARCHAR) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM {transitions_expr} GROUP BY 1, 2)""",
        """tot AS (SELECT s, CAST(sum(c) AS BIGINT) AS t FROM trans GROUP BY 1)""",
        """probs AS MATERIALIZED (
  SELECT trans.s, trans.d, CAST(trans.c * 1000000 // tot.t AS BIGINT) AS p
  FROM trans JOIN tot USING (s))""",
        """states AS MATERIALIZED (
  SELECT s AS st FROM probs UNION SELECT d FROM probs)""",
        """scen AS MATERIALIZED (
  SELECT st AS sc FROM states
  WHERE st NOT IN ('_START_', '_CONV_', '_NULL_')
  UNION ALL SELECT '_BASE_')""",
        """x0 AS MATERIALIZED (
  SELECT sc, st,
         CAST(CASE WHEN st = '_CONV_' THEN 1000000 ELSE 0 END AS BIGINT) AS x
  FROM scen, states)""",
    ]
    for i in range(1, iterations + 1):
        ctes.append(f"""x{i} AS MATERIALIZED (
  SELECT g.sc, g.st,
         CAST(CASE WHEN g.st = '_CONV_' THEN 1000000
              WHEN g.st = '_NULL_' THEN 0
              WHEN g.st = g.sc THEN 0
              ELSE coalesce(c.nx, 0) END AS BIGINT) AS x
  FROM (SELECT sc, st FROM scen, states) g
  LEFT JOIN (
    SELECT x.sc, p.s AS st,
           CAST(sum(p.p * CASE WHEN p.d = x.sc THEN 0 ELSE x.x END)
                // 1000000 AS BIGINT) AS nx
    FROM probs p JOIN x{i - 1} x ON x.st = p.d
    GROUP BY 1, 2
  ) c ON c.sc = g.sc AND c.st = g.st)""")
    ctes.append(f"""start AS (
  SELECT sc, x FROM x{iterations} WHERE st = '_START_')""")
    ctes.append("""base AS (SELECT x AS b FROM start WHERE sc = '_BASE_')""")
    ctes.append("""eff AS (
  SELECT sc AS channel, CAST(b AS BIGINT) AS base_conv_ppm,
         CAST(x AS BIGINT) AS removed_conv_ppm,
         CAST(greatest(b - x, 0) AS BIGINT) AS removal_effect_ppm
  FROM start, base WHERE sc <> '_BASE_')""")
    ctes.append(
        """te AS (SELECT CAST(sum(removal_effect_ppm) AS BIGINT) AS t FROM eff)"""
    )
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT channel, base_conv_ppm, removed_conv_ppm, removal_effect_ppm,
       CAST(CASE WHEN te.t = 0 THEN NULL
            ELSE removal_effect_ppm * 1000000 // te.t END AS BIGINT)
         AS attribution_ppm
FROM eff, te
"""


# Gaussian N(0,1) quartile breakpoints — the canonical SAX alphabet-4
# cut points (Lin/Keogh/Lonardi/Chiu, DMKD 2007, Table 3).
_SAX_B1, _SAX_B2, _SAX_B3 = -0.6744897501960817, 0.0, 0.6744897501960817


def sax_motif_census(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    value_col: str,
    word_len: int = 3,
) -> DataFrame:
    """SAX symbolic-motif census over per-key series — discretize each
    (z-normalized) series into the 4-letter SAX alphabet, slide a
    ``word_len`` window, and count motif words across keys (Lin et al.,
    DMKD 2007: the shape vocabulary behind motif discovery / anomaly
    flagging — "spike-then-recover" is a WORD you can GROUP BY)::

        (word, n_occurrences, n_keys)

    The input is a per-key ROLLED-UP series ``(key..., t, value)`` with
    one row per (key, t) — day grains in practice (the ``acf_lags``
    bounded-frame contract; the caller owns the rollup). Values fold to
    cents; per-key mean/variance come from exact integer moments, the
    z-score and the three N(0,1) quartile breakpoints are ONE fixed
    IEEE sequence (``sd = sqrt(var_num)/n`` literally, both engines, so
    the comparisons see bit-identical doubles). A constant series
    (zero variance) reads symbol 'c' everywhere (z = 0 by convention).
    Words at the series tail (fewer than ``word_len`` steps left) are
    skipped on both engines.

    Output is bounded: ≤ 4^word_len distinct words.

    Scale: one (key) moment fold + per-key lead windows over the
    bounded rolled-up frame + one word count — no self-join; the motif
    census is a uniform-key groupBy.
    """
    a = int(word_len)
    cents = F.round(F.col(value_col).cast("double") * F.lit(100.0)).cast("long")
    rows = df.select(
        *[F.col(c) for c in key_cols],
        F.col(t_col).cast("long").alias("_t"),
        cents.alias("_v"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    moms = rows.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_v").cast("long").alias("_sx"),
        F.sum(dec(F.col("_v")) * dec(F.col("_v"))).alias("_sxx"),
    )
    r_al, m_al = rows.alias("_r"), moms.alias("_m")
    cond = None
    for k in key_cols:
        eq = F.col(f"_r.{k}").eqNullSafe(F.col(f"_m.{k}"))
        cond = eq if cond is None else (cond & eq)
    j = r_al.join(m_al, cond).select(
        *[F.col(f"_r.{k}") for k in key_cols],
        F.col("_r._t"),
        F.col("_r._v"),
        F.col("_m._n"),
        F.col("_m._sx"),
        F.col("_m._sxx"),
    )
    var_num = (
        dec(F.col("_n")) * F.col("_sxx") - dec(F.col("_sx")) * dec(F.col("_sx"))
    )
    n_d = F.col("_n").cast("double")
    sd = F.sqrt(var_num.cast("double")) / n_d
    z = (F.col("_v").cast("double") - F.col("_sx").cast("double") / n_d) / sd
    sym = (
        F.when(var_num == F.lit(0).cast("decimal(38,0)"), F.lit("c"))
        .when(z < F.lit(_SAX_B1), F.lit("a"))
        .when(z < F.lit(_SAX_B2), F.lit("b"))
        .when(z < F.lit(_SAX_B3), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    w = Window.partitionBy(*key_cols).orderBy("_t")  # bounded rollup frame
    symed = j.withColumn("_sym", sym)
    word_parts = [F.col("_sym")] + [
        F.lead("_sym", i).over(w) for i in range(1, a)
    ]
    complete = word_parts[0].isNotNull()
    for p in word_parts[1:]:
        complete = complete & p.isNotNull()
    worded = symed.select(
        *[F.col(k) for k in key_cols],
        F.when(complete, F.concat(*word_parts)).alias("_word"),
    ).where(F.col("_word").isNotNull())
    return worded.groupBy(F.col("_word").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.count_distinct(F.struct(*[F.col(k) for k in key_cols]))
        .cast("long")
        .alias("n_keys"),
    )


def sax_motif_census_sql(
    table_expr: str,
    key_exprs: Sequence[str],
    t_expr: str,
    value_expr: str,
    word_len: int = 3,
) -> str:
    """DuckDB rendering of :func:`sax_motif_census` — same exact
    moments, same literal sd/z sequence, same breakpoint CASE order."""
    a = int(word_len)
    k = ", ".join(key_exprs)
    on = " AND ".join(
        f"r.{c} IS NOT DISTINCT FROM m.{c}" for c in key_exprs
    )
    kr = ", ".join(f"r.{c}" for c in key_exprs)
    leads = ", ".join(
        f"lead(sym, {i}) OVER (PARTITION BY {k} ORDER BY t) AS s{i}"
        for i in range(1, a)
    )
    not_null = " AND ".join([f"s{i} IS NOT NULL" for i in range(1, a)]) or "TRUE"
    word = " || ".join(["sym"] + [f"s{i}" for i in range(1, a)])
    return f"""
WITH rows_f AS (
  SELECT {k}, CAST({t_expr} AS BIGINT) AS t,
         CAST(round(CAST({value_expr} AS DOUBLE) * 100.0) AS BIGINT) AS v
  FROM {table_expr}
),
moms AS (
  SELECT {k}, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sx,
         sum(CAST(v AS HUGEINT) * v) AS sxx
  FROM rows_f GROUP BY {k}
),
symed AS (
  SELECT {kr}, r.t,
         CASE WHEN CAST(m.n AS HUGEINT) * m.sxx
                   - CAST(m.sx AS HUGEINT) * m.sx = 0 THEN 'c'
              WHEN (CAST(r.v AS DOUBLE) - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
                   / (sqrt(CAST(CAST(m.n AS HUGEINT) * m.sxx
                                - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE))
                      / CAST(m.n AS DOUBLE)) < {_SAX_B1} THEN 'a'
              WHEN (CAST(r.v AS DOUBLE) - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
                   / (sqrt(CAST(CAST(m.n AS HUGEINT) * m.sxx
                                - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE))
                      / CAST(m.n AS DOUBLE)) < {_SAX_B2} THEN 'b'
              WHEN (CAST(r.v AS DOUBLE) - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
                   / (sqrt(CAST(CAST(m.n AS HUGEINT) * m.sxx
                                - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE))
                      / CAST(m.n AS DOUBLE)) < {_SAX_B3} THEN 'c'
              ELSE 'd' END AS sym
  FROM rows_f r JOIN moms m ON {on}
),
worded AS (
  SELECT {k}, {word} AS word
  FROM (SELECT {k}, sym, {leads} FROM symed)
  WHERE {not_null}
)
SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT row({k})) AS BIGINT) AS n_keys
FROM worded GROUP BY word
"""


def mase_backtest(
    df: DataFrame,
    group_cols: Sequence[str],
    t_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast backtest per series — MASE, the
    scale-free forecast-accuracy standard (Hyndman & Koehler 2006):
    does knowing the weekly pattern beat "tomorrow = today"?::

        (group..., n_scored, sae_seasonal, sae_naive, mase_ppm)

    Over the CONSECUTIVE positions of each rolled-up series (ordered by
    ``t``), every point with both a lag-1 and a lag-``season``
    predecessor scores two absolute errors: the seasonal-naive forecast
    ``v[i−season]`` and the naive ``v[i−1]``. ``mase_ppm =
    sae_seasonal·10⁶ div sae_naive`` — pure integer cents arithmetic
    end-to-end (< 10⁶ means the seasonal pattern carries real signal);
    a perfectly naive-predictable series (``sae_naive = 0``) → explicit
    NULL. Lags are POSITIONAL (the forecasting convention); gaps in
    ``t`` are the caller's spine-completion concern, as everywhere in
    this module.

    Scale: one per-key lag window over the bounded rollup frame + one
    grouped fold. No join, no pair frame.
    """
    cents = F.round(F.col(value_col).cast("double") * F.lit(100.0)).cast("long")
    w = Window.partitionBy(*group_cols).orderBy("_t")
    lagged = df.select(
        *[F.col(c) for c in group_cols],
        F.col(t_col).cast("long").alias("_t"),
        cents.alias("_v"),
    ).select(
        *[F.col(c) for c in group_cols],
        "_v",
        F.lag("_v", 1).over(w).alias("_l1"),
        F.lag("_v", int(season)).over(w).alias("_ls"),
    )
    scored = lagged.where(F.col("_l1").isNotNull() & F.col("_ls").isNotNull())
    agg = scored.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum(F.abs(F.col("_v") - F.col("_ls"))).cast("long").alias("sae_seasonal"),
        F.sum(F.abs(F.col("_v") - F.col("_l1"))).cast("long").alias("sae_naive"),
    )
    return agg.select(
        *[F.col(c) for c in group_cols],
        "n_scored",
        "sae_seasonal",
        "sae_naive",
        F.when(
            F.col("sae_naive") > 0,
            F.expr("sae_seasonal * 1000000L div sae_naive"),
        ).alias("mase_ppm"),
    )


def mase_backtest_sql(
    table_expr: str,
    group_exprs: Sequence[str],
    t_expr: str,
    value_expr: str,
    season: int = 7,
) -> str:
    """DuckDB rendering of :func:`mase_backtest` — same positional
    lags, same integer SAE sums and `div` readout."""
    g = ", ".join(group_exprs)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    return f"""
WITH lagged AS (
  SELECT {gsel}
         CAST(round(CAST({value_expr} AS DOUBLE) * 100.0) AS BIGINT) AS v,
         lag(CAST(round(CAST({value_expr} AS DOUBLE) * 100.0) AS BIGINT), 1)
           OVER ({part}ORDER BY CAST({t_expr} AS BIGINT)) AS l1,
         lag(CAST(round(CAST({value_expr} AS DOUBLE) * 100.0) AS BIGINT),
             {int(season)})
           OVER ({part}ORDER BY CAST({t_expr} AS BIGINT)) AS ls
  FROM {table_expr}
),
agg AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS n_scored,
         CAST(sum(abs(v - ls)) AS BIGINT) AS sae_seasonal,
         CAST(sum(abs(v - l1)) AS BIGINT) AS sae_naive
  FROM lagged WHERE l1 IS NOT NULL AND ls IS NOT NULL
  {gby}
)
SELECT {gsel}n_scored, sae_seasonal, sae_naive,
       CASE WHEN sae_naive > 0 THEN
         CAST(sae_seasonal * 1000000 // sae_naive AS BIGINT) END AS mase_ppm
FROM agg
"""
