"""Breadth-coverage queries: operator classes a complete analytics engine
must expose beyond the reference's own usage (SURVEY.md §2.5-2.8 note the
absences), each oracle-gated: T-SQL scalar shims, global sort+limit,
set operations, ROLLUP aggregation, distinct aggregates, window frames
(lag/lead/running sums), and JSON extraction over semi-structured columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import functions as TS
from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
    funnel_steps,
    retention_cohorts,
)
from dwh_etl_ods_spark_jobs_spark.plans.showcase import _c100, _t


# --- 1. T-SQL scalar function shims (SURVEY §2.8 mapping table) ---

def q_tsql_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn("od", F.to_date("o_orderdate"))
    anchor = F.to_date(F.lit("1998-06-30"))
    # A dd/MM/yyyy rendering of the date, then CONVERT(...,103)-style reparse;
    # odd keys get garbage so TRY_CAST must yield NULL.
    dmy = F.when(
        F.col("o_orderkey") % 2 == 0, F.date_format("od", "dd/MM/yyyy")
    ).otherwise(F.lit("not a date"))
    return orders.select(
        "o_orderkey",
        TS.datediff_yy(F.col("od"), anchor).alias("years_to_anchor"),
        TS.datediff_dd(F.col("od"), anchor).alias("days_to_anchor"),
        TS.datediff_month(F.col("od"), anchor).alias("months_to_anchor"),
        TS.eomonth(F.col("od")).alias("month_end"),
        TS.dateadd_month(3, F.col("od")).alias("plus3m"),
        TS.dateadd_day(-7, F.col("od")).alias("minus7d"),
        TS.try_cast_date(TS.convert_103(dmy)).alias("reparsed_dmy"),
        TS.isnull(
            F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderpriority")),
            F.lit("none"),
        ).alias("priority_or_none"),
        TS.hashbytes_sha2_256(F.col("o_orderkey").cast("string")).alias("key_hash"),
        TS.datefromparts(F.year("od"), F.month("od"), F.lit(1)).alias("month_start"),
    )


SQL_TSQL_FUNCTIONS = """
SELECT o_orderkey,
       CAST(year(DATE '1998-06-30') - year(CAST(o_orderdate AS DATE)) AS INT)
         AS years_to_anchor,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-06-30') AS INT)
         AS days_to_anchor,
       CAST((year(DATE '1998-06-30') - year(CAST(o_orderdate AS DATE))) * 12
            + (6 - month(CAST(o_orderdate AS DATE))) AS INT) AS months_to_anchor,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
       CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS minus7d,
       CAST(try_strptime(CASE WHEN o_orderkey % 2 = 0
                              THEN strftime(CAST(o_orderdate AS DATE), '%d/%m/%Y')
                              ELSE 'not a date' END, '%d/%m/%Y') AS DATE)
         AS reparsed_dmy,
       COALESCE(CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END, 'none')
         AS priority_or_none,
       UPPER(sha256(CAST(o_orderkey AS VARCHAR))) AS key_hash,
       make_date(year(CAST(o_orderdate AS DATE)),
                 month(CAST(o_orderdate AS DATE)), 1) AS month_start
FROM orders
"""


# --- 2. global sort + limit (deterministic top-N) ---

def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", _c100(F.col("o_totalprice")).alias("price_c")
        )
        .orderBy(F.col("price_c").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
FROM orders ORDER BY price_c DESC, o_orderkey ASC LIMIT 100
"""


# --- 3. set operations: EXCEPT / INTERSECT ---

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn("od", F.to_date("o_orderdate"))
    c95 = orders.filter(F.year("od") == 1995).select("o_custkey").distinct()
    c96 = orders.filter(F.year("od") == 1996).select("o_custkey").distinct()
    only95 = c95.exceptAll(c96).withColumn("cohort", F.lit("only_1995"))
    both = c95.intersect(c96).withColumn("cohort", F.lit("both_years"))
    return only95.unionByName(both)


SQL_SET_OPS = """
WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(CAST(o_orderdate AS DATE)) = 1995),
     c96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(CAST(o_orderdate AS DATE)) = 1996)
SELECT o_custkey, 'only_1995' AS cohort FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
UNION ALL
SELECT o_custkey, 'both_years' AS cohort FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
"""


# --- 4. ROLLUP aggregation ---

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"),
    )


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- 5. distinct aggregates ---

def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum_distinct(F.round(F.col("l_quantity"), 0).cast("long")).alias(
            "sum_distinct_qty"
        ),
    )


SQL_DISTINCT_AGG = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       CAST(SUM(DISTINCT CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
         AS sum_distinct_qty
FROM lineitem GROUP BY l_returnflag
"""


# --- 6. window frames: lag / lead / running sum / rank ---

def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        _c100(F.col("o_totalprice")).alias("price_c"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("od").asc(), F.col("o_orderkey").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "od",
        F.lag("price_c", 1).over(w).alias("prev_price_c"),
        F.lead("price_c", 1).over(w).alias("next_price_c"),
        F.sum("price_c").over(run).alias("running_spend_c"),
        F.row_number().over(w).alias("order_seq"),
    )


SQL_WINDOW_FRAMES = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
       lag(price_c, 1) OVER w AS prev_price_c,
       lead(price_c, 1) OVER w AS next_price_c,
       CAST(SUM(price_c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS running_spend_c,
       CAST(row_number() OVER w AS INT) AS order_seq
FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c FROM orders)
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC)
"""


# --- 7. JSON extraction over semi-structured props ---

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_id", "event_type", k.alias("k"))
        .withColumn("k_bucket", F.floor(F.col("k") / 10).cast("int"))
    )


SQL_JSON_EXTRACT = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10.0) AS INT)
         AS k_bucket
FROM events
"""


QUERIES = {
    "tsql_scalar_functions": q_tsql_functions,
    "set_ops_except_intersect": q_set_ops,
    "window_frames": q_window_frames,
    "json_extract": q_json_extract,
}

ORACLES = {
    "tsql_scalar_functions": SQL_TSQL_FUNCTIONS,
    "set_ops_except_intersect": SQL_SET_OPS,
    "window_frames": SQL_WINDOW_FRAMES,
    "json_extract": SQL_JSON_EXTRACT,
}

# Battery consolidation (VERDICT r6 #7): entries whose operator coverage is
# subsumed by a parameterized sibling leave the driver battery but stay
# oracle-verified at pytest level (tests/test_retired_surfaces.py runs each
# pair against DuckDB). COVERAGE.md maps every capability to its survivor.
RETIRED_QUERIES = {
    # also retired, registered where they are defined later in this module:
    #   string_functions (suite ⊂ record_linkage_fuzzy + tsql_scalar_functions),
    #   tumbling_daily_rollup (tumbling = hopping with W == H),
    #   cube_grouping_agg (CUBE ⊂ grouping_sets_agg)
    "sort_limit_topn": q_sort_limit,  # global orderBy+limit ⊂ bm25_topk_retrieval et al.
    "rollup_agg": q_rollup,           # ROLLUP ⊂ grouping_sets_agg (same Expand plan)
    "distinct_agg": q_distinct_agg,   # multi-DISTINCT Expand; pytest-pinned
}
RETIRED_ORACLES = {
    "sort_limit_topn": SQL_SORT_LIMIT,
    "rollup_agg": SQL_ROLLUP,
    "distinct_agg": SQL_DISTINCT_AGG,
}


# --- 8. pivot (wide conditional aggregation) ---

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("cohort", (F.col("user_id") % 10).cast("long"))
        .groupBy("cohort")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "cohort", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES]
        )
    )


SQL_PIVOT = "SELECT CAST(user_id % 10 AS BIGINT) AS cohort, " + ", ".join(
    f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
    for t in EVENT_TYPES
) + " FROM events GROUP BY 1"


# --- 9. semi join / EXISTS ---

def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)
"""


QUERIES["pivot_wide_agg"] = q_pivot
QUERIES["semi_join_exists"] = q_semi_join
ORACLES["pivot_wide_agg"] = SQL_PIVOT
ORACLES["semi_join_exists"] = SQL_SEMI_JOIN


# --- 10-12. event-time operators: as-of join / sessionization / tumbling ---

from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (  # noqa: E402
    asof_join,
    sessionize,
    tumbling_rollup,
)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest click at-or-before each purchase per user — our union+window
    as-of vs DuckDB's native ASOF JOIN. The right side is pre-deduped to
    one row per (user, ts) so the match is well-defined."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(
        purchases, clicks, ["user_id"], "ts", "ts", ["click_event_id"], how="left"
    )
    return out.select("user_id", "purchase_id", "ts", "click_event_id")


SQL_ASOF_JOIN = """
WITH p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  max(event_id) AS click_event_id
           FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.user_id, p.purchase_id, p.ts, c.click_event_id
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


GAP_US = 3_600_000_000  # 1 hour


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    out = sessionize(ev, ["user_id"], "ts", GAP_US, tiebreak_cols=["event_id"])
    return out.select("user_id", "event_id", "session_seq", "event_seq")


SQL_SESSIONIZE = f"""
WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS nw
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, event_id, session_seq,
       CAST(row_number() OVER (PARTITION BY user_id, session_seq
                               ORDER BY ts, event_id) - 1 AS BIGINT) AS event_seq
FROM sessioned
"""


def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return tumbling_rollup(
        ev, "ts", "day", ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.max("event_id").alias("max_event_id"),
        ],
    )


SQL_TUMBLING = """
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       max(event_id) AS max_event_id
FROM events GROUP BY 1, 2
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly retention cohorts: users grouped by first-active month,
    distinct-user counts per months-since-cohort offset. Two uniform
    shuffles (per-user min, then per-(cohort, offset) distinct count) —
    the classic product-analytics rollup, no window over the full fact."""
    monthly = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("month", F.col("ts")).cast("date").alias("m"),
    )
    return retention_cohorts(monthly, "user_id", "m")


SQL_RETENTION = """
WITH months AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS m
  FROM events
),
cohort AS (SELECT user_id, min(m) AS cm FROM months GROUP BY 1)
SELECT c.cm AS cohort_month,
       CAST((year(t.m) * 12 + month(t.m))
            - (year(c.cm) * 12 + month(c.cm)) AS INT) AS month_offset,
       count(DISTINCT t.user_id) AS n_users
FROM months t JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    counts at step k if step k's event occurs strictly after their
    chosen (earliest-qualifying) step-(k−1) event. Each step is one
    filtered min-aggregation plus an equi-join on the uniform user key —
    no per-user event collection, no window over the raw stream."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel_steps(ev, "user_id", "event_type", "ts", FUNNEL_STEPS)


def _sql_funnel() -> str:
    ctes = [
        f"s1 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t FROM events"
        f" WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1)"
    ]
    for i, step in enumerate(FUNNEL_STEPS[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t"
            f" FROM events e JOIN s{i - 1} p USING (user_id)"
            f" WHERE e.event_type = '{step}' AND CAST(e.ts AS TIMESTAMP) > p.t"
            f" GROUP BY 1)"
        )
    arms = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step, '{name}' AS step_name, count(*) AS n_users FROM s{i + 1}"
        for i, name in enumerate(FUNNEL_STEPS)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + arms


def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day order revenue with a 7-day RANGE-interval moving average
    (over days present). The window rides the DAILY frame — one row per
    date, so even 30 years is ~11k rows; the raw fact is reduced by a
    uniform date-keyed aggregation first. Cents-exact sums; the only
    float ops are the two final divisions."""
    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").cast("date").alias("d"),
            _c100(F.col("o_totalprice")).alias("_c"),
        )
        .groupBy("d")
        .agg(F.sum("_c").alias("_day_c"), F.count(F.lit(1)).alias("n_orders"))
        .withColumn("_ed", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")))
    )
    w = Window.orderBy("_ed").rangeBetween(-6, 0)
    return daily.select(
        "d",
        "n_orders",
        F.round(F.col("_day_c").cast("double") / F.lit(100.0), 2).alias("day_revenue"),
        F.round(
            F.sum("_day_c").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
            / F.lit(100.0),
            6,
        ).alias("avg7_revenue"),
    )


SQL_ROLLING_REVENUE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS day_c,
         count(*) AS n_orders
  FROM orders GROUP BY 1
),
e AS (SELECT *, date_diff('day', DATE '1970-01-01', d) AS ed FROM daily)
SELECT d, n_orders,
       round(CAST(day_c AS DOUBLE) / 100.0, 2) AS day_revenue,
       round(CAST(sum(day_c) OVER w AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE) / 100.0, 6) AS avg7_revenue
FROM e
WINDOW w AS (ORDER BY ed RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity intervals for each user's event_type "state":
    consecutive same-state observations collapse, intervals stitch
    end-to-start (operators/scd.py). Key-partitioned windows only."""
    from dwh_etl_ods_spark_jobs_spark.operators.scd import changes_to_scd2

    return (
        _t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
        .transform(changes_to_scd2("user_id", "ts", ["event_type"]))
    )


def _sql_scd2() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.scd import changes_to_scd2_sql

    return changes_to_scd2_sql(
        "(SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events) _ev_",
        "user_id",
        "ts",
        ["event_type"],
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive event types per user
    — one key-partitioned lead() pass + one uniform pair-keyed count."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("_next", F.lead("event_type").over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("_next").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, count(*) AS n_transitions
FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
"""


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via the chunked-equi rewrite
    (operators/intervals.py): order "activity windows" ([orderdate,
    +0..13 days]) from two key-sampled sets, every overlapping pair.
    The ORACLE runs the plain non-equi join — semantics proven, plan
    free to differ."""
    from dwh_etl_ods_spark_jobs_spark.operators.intervals import interval_overlap_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
        ).cast("long").alias("s"),
    ).select(
        "o_orderkey", "s", (F.col("s") + F.col("o_orderkey") % 14).alias("e")
    )
    left = o.filter(F.col("o_orderkey") % 97 == 0).withColumnRenamed(
        "o_orderkey", "key"
    )
    right = o.filter(F.col("o_orderkey") % 89 == 0).withColumnRenamed(
        "o_orderkey", "key"
    )
    return interval_overlap_join(left, right, "s", "e", chunk=14).select(
        F.col("a_key"), F.col("b_key"), F.col("a_s"), F.col("b_s")
    )


SQL_INTERVAL_OVERLAP = """
WITH iv AS (
  SELECT o_orderkey AS key,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS s,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
           + o_orderkey % 14 AS e
  FROM orders
)
SELECT a.key AS a_key, b.key AS b_key,
       CAST(a.s AS BIGINT) AS a_s, CAST(b.s AS BIGINT) AS b_s
FROM (SELECT * FROM iv WHERE key % 97 = 0) a
JOIN (SELECT * FROM iv WHERE key % 89 = 0) b
  ON a.s <= b.e AND b.s <= a.e
"""


TOMBSTONE_MOD = 40  # every 40th user has requested deletion


def q_tombstone_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure propagation census: for each fact table, how many
    rows a tombstoned-user delete touches vs keeps — the audit a pipeline
    runs before rewriting files. Membership is a broadcast-semi/anti pair
    per table; at scale the tombstone list is exactly what
    ``sketches.bloom_filter_keys`` pre-prunes."""
    tombstones = (
        _t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .filter(F.pmod(F.col("user_id"), F.lit(TOMBSTONE_MOD)) == 0)
    )
    ev = _t(spark, sf_dir, "events").select("user_id")
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    parts = []
    for name, frame in [("events", ev), ("customer", cust)]:
        # one pass per table: flag membership, aggregate both counts
        # no forced broadcast: the tombstone list is a 1/MOD slice of an
        # SF-proportional key set (AQE broadcasts it at bench scale; at
        # corpus scale the bloom-pruned path above is the fast lane)
        flagged = frame.join(
            tombstones.withColumn("_t", F.lit(1)), "user_id", "left"
        )
        parts.append(
            flagged.agg(
                F.sum(F.when(F.col("_t").isNotNull(), 1).otherwise(0))
                .cast("long").alias("n_delete"),
                F.sum(F.when(F.col("_t").isNull(), 1).otherwise(0))
                .cast("long").alias("n_keep"),
            ).select(F.lit(name).alias("table_name"), "n_delete", "n_keep")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


SQL_TOMBSTONE_CENSUS = f"""
WITH tomb AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {TOMBSTONE_MOD} = 0
)
SELECT 'events' AS table_name,
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM tomb) THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM tomb) THEN 0 ELSE 1 END) AS BIGINT) AS n_keep
FROM events
UNION ALL
SELECT 'customer',
       CAST(sum(CASE WHEN c_custkey IN (SELECT user_id FROM tomb) THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN c_custkey IN (SELECT user_id FROM tomb) THEN 0 ELSE 1 END) AS BIGINT)
FROM customer
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    per-flag, per-status, and grand-total aggregates in one pass, with
    grouping_id disambiguating the NULL-key rows."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               count(*) AS n_rows,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: the wide lineitem money columns to long
    (metric, cents) rows — ``DataFrame.unpivot`` is Spark's native melt
    (a per-row expression expansion, no shuffle)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        _c100(F.col("l_extendedprice")).alias("extendedprice"),
        _c100(F.col("l_discount")).alias("discount"),
        _c100(F.col("l_tax")).alias("tax"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["extendedprice", "discount", "tax"],
        "metric",
        "cents",
    )


SQL_UNPIVOT = """
WITH w AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS extendedprice,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS discount,
         CAST(round(l_tax * 100, 0) AS BIGINT) AS tax
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, 'extendedprice' AS metric, extendedprice AS cents FROM w
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', discount FROM w
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', tax FROM w
"""


STATE_MERGE_CUTOFF = "2024-01-20"


def q_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the stored pre-cutoff aggregate
    state merged with the new batch's partial aggregates
    (operators.merge_agg_state) — the ORACLE recomputes the same view
    from the full fact, so the gate proves merged == recomputed."""
    from dwh_etl_ods_spark_jobs_spark.operators import merge_agg_state

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("_d"),
        F.round(F.col("value") * 100).cast("long").alias("_c"),
    )

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_c").alias("sum_c"),
            F.min("_c").alias("min_c"),
            F.max("_c").alias("max_c"),
        )

    cutoff = F.lit(STATE_MERGE_CUTOFF).cast("date")
    state = agg(ev.filter(F.col("_d") < cutoff))
    delta = agg(ev.filter(F.col("_d") >= cutoff))
    return merge_agg_state(
        state, delta, ["event_type"],
        sum_cols=["sum_c"], min_cols=["min_c"], max_cols=["max_c"], count_col="n",
    )


SQL_STATE_MERGE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
       min(CAST(round(value * 100) AS BIGINT)) AS min_c,
       max(CAST(round(value * 100) AS BIGINT)) AS max_c
FROM events GROUP BY 1
"""


ZORDER_SHIFT = 16  # 32-bit morton -> 65536 possible z-buckets


def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: bucket orders by the Morton interleave of
    (customer, order-day) and report each bucket's min/max envelope on
    BOTH dimensions — the per-file statistics a z-ordered write would
    give the scanner for file skipping (pytest pins that envelopes are
    far tighter than the global range)."""
    from dwh_etl_ods_spark_jobs_spark.operators import morton_code

    o = _t(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(1 << 16)).alias("_x"),
        F.pmod(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
            ),
            F.lit(1 << 16),
        ).alias("_y"),
    )
    return (
        o.withColumn("zbucket", F.shiftright(morton_code(F.col("_x"), F.col("_y")), ZORDER_SHIFT))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("_x") - F.min("_x")).alias("x_range"),
            (F.max("_y") - F.min("_y")).alias("y_range"),
        )
    )


def _sql_zorder() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators import morton_code_sql

    m = morton_code_sql("x", "y")
    return f"""
WITH dims AS (
  SELECT o_custkey % 65536 AS x,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) % 65536 AS y
  FROM orders
)
SELECT ({m} >> {ZORDER_SHIFT}) AS zbucket, count(*) AS n_rows,
       CAST(max(x) - min(x) AS BIGINT) AS x_range,
       CAST(max(y) - min(y) AS BIGINT) AS y_range
FROM dims GROUP BY 1
"""


COPURCHASE_MIN_SUPPORT = 3


def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in at
    least MIN_SUPPORT orders. The self-join is keyed on the order id, so
    its fan-out is bounded by lines-per-order squared (TPC-H ≤ 7) — never
    a part×part cross; the support count shuffles on the uniform pair
    key."""
    lines = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = lines.alias("a"), lines.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= COPURCHASE_MIN_SUPPORT)
    )


SQL_COPURCHASE = f"""
WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
FROM lines a JOIN lines b USING (l_orderkey)
WHERE a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {COPURCHASE_MIN_SUPPORT}
"""


def q_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap filling with last-observation-carried-forward: each
    user's daily max value, densified onto the full date spine and
    forward-filled. The spine is explode(sequence) per user bounded by
    the user's own active range; LOCF is one key-partitioned
    last(ignoreNulls) window — no driver loops, no self-join."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d"), "value"
    ).filter(F.col("user_id") % 50 == 0)  # keep the densified frame honest but bounded
    daily = ev.groupBy("user_id", "d").agg(
        F.round(F.max("value"), 6).alias("day_value")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("_d0"), F.max("d").alias("_d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(_d0, _d1, interval 1 day)")).alias("d"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            F.col("day_value").isNotNull().alias("observed"),
            F.last("day_value", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


SQL_LOCF_GAP_FILL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d, value
  FROM events WHERE user_id % 50 = 0
),
daily AS (
  SELECT user_id, d, round(max(value), 6) AS day_value
  FROM ev GROUP BY 1, 2
),
spine AS (
  SELECT user_id, unnest(generate_series(min(d), max(d), INTERVAL 1 DAY))::DATE AS d
  FROM daily GROUP BY user_id
)
SELECT s.user_id, s.d,
       (dy.day_value IS NOT NULL) AS observed,
       last_value(dy.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM spine s LEFT JOIN daily dy USING (user_id, d)
"""


def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions over one frame:
    rank/dense_rank/percent_rank/cume_dist/ntile, partitioned by the
    uniform customer segment key."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


SQL_RANK_FUNCTIONS = """
SELECT c_custkey, c_mktsegment,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def q_bivariate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / OLS regression / stddev per return flag with exact-integer
    moments (operators/stats.py) — the engine-portable replacement for
    float-accumulating corr()/regr_slope(), whose results depend on
    partitioning."""
    from dwh_etl_ods_spark_jobs_spark.operators.stats import bivariate_stats

    return _t(spark, sf_dir, "lineitem").transform(
        bivariate_stats(["l_returnflag"], "l_quantity", "l_extendedprice")
    )


def _sql_bivariate_stats() -> str:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import bivariate_stats_sql

    return bivariate_stats_sql(
        "lineitem", ["l_returnflag"], "l_quantity", "l_extendedprice"
    )


QUERIES["asof_join_latest"] = q_asof_join
# r10 retired: gap-sessionize ⊂ session_path_trigrams' sessionize stage
# (VERDICT r9 #1 candidate (f)); still oracle-gated by
# tests/test_retired_surfaces.py.
RETIRED_QUERIES["sessionize_gap"] = q_sessionize
RETIRED_QUERIES["tumbling_daily_rollup"] = q_tumbling
QUERIES["retention_cohorts"] = q_retention
ORACLES["retention_cohorts"] = SQL_RETENTION
# r12 retired (staged_r12.py shortlist, VERDICT r11 #1): the grouped
# Pearson corr ⊂ corr_matrix_onepass (same exact-moment physiology over
# every measure pair) and the OLS slope/stderr ⊂ zipf_alpha_by_source's
# grouped OLS; still oracle-gated by tests/test_retired_surfaces.py.
RETIRED_QUERIES["corr_regression_stats"] = q_bivariate_stats
RETIRED_ORACLES["corr_regression_stats"] = _sql_bivariate_stats()
QUERIES["funnel_conversion"] = q_funnel
ORACLES["funnel_conversion"] = _sql_funnel()
# r9 retired: rolling_window_revenue ⊂ window_frames (same rows/range frames)
RETIRED_QUERIES["rolling_window_revenue"] = q_rolling_revenue
RETIRED_ORACLES["rolling_window_revenue"] = SQL_ROLLING_REVENUE
QUERIES["scd2_state_history"] = q_scd2_history
ORACLES["scd2_state_history"] = _sql_scd2()
# r9 retired: 2-gram transitions ⊂ session_path_trigrams (same lag-window n-grams)
RETIRED_QUERIES["event_transition_matrix"] = q_event_transitions
RETIRED_ORACLES["event_transition_matrix"] = SQL_EVENT_TRANSITIONS
# r9 retired: co-occurrence pair join ⊂ token_pmi_topk (same posting-list equi-join, plus PMI)
RETIRED_QUERIES["copurchase_pairs"] = q_copurchase
RETIRED_ORACLES["copurchase_pairs"] = SQL_COPURCHASE
# r11 consolidation: LOCF ⊂ gap_fill_lerp_daily — same per-key day-spine
# + segment-fill physiology; lerp is the strictly richer fill rule.
RETIRED_QUERIES["locf_gap_fill"] = q_locf_gap_fill
RETIRED_ORACLES["locf_gap_fill"] = SQL_LOCF_GAP_FILL
QUERIES["rank_functions_suite"] = q_rank_functions
ORACLES["rank_functions_suite"] = SQL_RANK_FUNCTIONS
QUERIES["incremental_state_merge"] = q_state_merge
ORACLES["incremental_state_merge"] = SQL_STATE_MERGE
QUERIES["zorder_locality"] = q_zorder_locality
ORACLES["zorder_locality"] = _sql_zorder()
QUERIES["unpivot_melt"] = q_unpivot
ORACLES["unpivot_melt"] = SQL_UNPIVOT
QUERIES["interval_overlap_join"] = q_interval_overlap
ORACLES["interval_overlap_join"] = SQL_INTERVAL_OVERLAP
QUERIES["tombstone_delete_census"] = q_tombstone_census
ORACLES["tombstone_delete_census"] = SQL_TOMBSTONE_CENSUS
QUERIES["grouping_sets_agg"] = q_grouping_sets
ORACLES["grouping_sets_agg"] = SQL_GROUPING_SETS
ORACLES["asof_join_latest"] = SQL_ASOF_JOIN
RETIRED_ORACLES["sessionize_gap"] = SQL_SESSIONIZE
RETIRED_ORACLES["tumbling_daily_rollup"] = SQL_TUMBLING


# --- 13. string-function suite ---

def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_mktsegment").alias("lower_seg"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.substring("c_name", 10, 9).alias("key_digits"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("extracted_digits"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("vowel_lowered"),
        F.levenshtein("c_name", F.lit("Customer#000000001")).alias("edit_dist_to_1"),
        F.length("c_name").cast("int").alias("name_len"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


SQL_STRING_FUNCTIONS = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       lower(c_mktsegment) AS lower_seg,
       trim('  pad  ') AS trimmed,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
       substring(c_name, 10, 9) AS key_digits,
       regexp_extract(c_name, '([0-9]+)$', 1) AS extracted_digits,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS vowel_lowered,
       levenshtein(c_name, 'Customer#000000001') AS edit_dist_to_1,
       CAST(length(c_name) AS INT) AS name_len,
       reverse(c_mktsegment) AS seg_rev
FROM customer
"""


# --- 14. record linkage: blocked fuzzy match (levenshtein) ---

def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate-candidate pairs: block on nation (the standard
    blocking step that keeps the pair space linear), score candidates with
    edit distance, keep near matches. The HMIS analog is patient identity
    matching across facilities."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey", "c_name", F.col("c_nationkey").alias("block")
    )
    pairs = (
        cust.alias("a")
        .join(cust.alias("b"), on="block")
        .filter(F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("edit_dist"),
        )
    )
    return pairs.filter(F.col("edit_dist") <= 2)


SQL_RECORD_LINKAGE = """
WITH c AS (SELECT c_custkey, c_name, c_nationkey AS block FROM customer
           WHERE c_custkey % 5 = 0)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM c a JOIN c b USING (block)
WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 2
"""


RETIRED_QUERIES["string_functions"] = q_string_functions
QUERIES["record_linkage_fuzzy"] = q_record_linkage
RETIRED_ORACLES["string_functions"] = SQL_STRING_FUNCTIONS
ORACLES["record_linkage_fuzzy"] = SQL_RECORD_LINKAGE


# --- 15. exact percentiles / median ---

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_price"),
    )


# Exact (sort-based) percentile with linear interpolation is deterministic
# double arithmetic in both engines — verified bit-identical.
SQL_PERCENTILES = """
SELECT l_returnflag,
       median(l_quantity) AS median_qty,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       quantile_cont(l_extendedprice, 0.5) AS p50_price
FROM lineitem GROUP BY l_returnflag
"""


# r9 retired: unweighted percentiles ⊂ weighted_price_quantiles (weight ≡ 1 case)
RETIRED_QUERIES["percentile_agg"] = q_percentiles
RETIRED_ORACLES["percentile_agg"] = SQL_PERCENTILES


# --- 16. array / higher-order-function ops over vector columns ---

def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    l2 = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, b: a + b)
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_min(v).alias("vmin"),
        F.array_max(v).alias("vmax"),
        F.round(l2, 6).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(F.element_at(v, 1) + F.element_at(v, -1), 6).alias("first_plus_last"),
    )


SQL_ARRAY_OPS = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT vec_id,
       CAST(len(v) AS INT) AS dim,
       list_min(v) AS vmin,
       list_max(v) AS vmax,
       round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(v, x -> x * x)), (a, b) -> a + b)), 6) AS l2_norm,
       CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_positive,
       round(v[1] + v[-1], 6) AS first_plus_last
FROM e
"""


QUERIES["array_vector_ops"] = q_array_ops
ORACLES["array_vector_ops"] = SQL_ARRAY_OPS


# --- 17. CUBE + GROUPING() ---

def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


SQL_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- 18. SQL API surface + NOT IN subquery semantics ---

def q_sql_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the engine's SQL entry point (temp view + spark.sql) with a
    NOT IN subquery — whose NULL semantics (any NULL in the subquery result
    empties the output) both engines must honor identically."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql("""
        SELECT o_orderkey, o_custkey
        FROM v_orders
        WHERE o_custkey NOT IN (
          SELECT c_custkey FROM v_customer WHERE c_mktsegment = 'BUILDING'
        )
    """)


SQL_SQL_NOT_IN = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey NOT IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
"""


RETIRED_QUERIES["cube_grouping_agg"] = q_cube
QUERIES["sql_api_not_in_subquery"] = q_sql_not_in
RETIRED_ORACLES["cube_grouping_agg"] = SQL_CUBE
ORACLES["sql_api_not_in_subquery"] = SQL_SQL_NOT_IN


# --- MERGE INTO / SCD Type-1 upsert apply (operators/merge.merge_upsert) ---

def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changeset to a customer snapshot with ANSI MERGE
    semantics: even custkeys are updated (name upper-cased, balance +777
    cents) or inserted if absent; every 20th custkey is a tombstone
    delete. One null-safe full-outer join — the plan MERGE lowers to."""
    from dwh_etl_ods_spark_jobs_spark.operators import merge_upsert

    cust = _t(spark, sf_dir, "customer")
    target = cust.filter(F.col("c_custkey") % 10 < 8).select(
        "c_custkey", "c_name", _c100(F.col("c_acctbal")).alias("bal_cents")
    )
    changes = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("c_name"),
        (_c100(F.col("c_acctbal")) + F.lit(777)).alias("bal_cents"),
        (F.col("c_custkey") % 20 == 0).alias("deleted"),
    )
    return merge_upsert(target, changes, ["c_custkey"], tombstone_col="deleted")


SQL_MERGE_UPSERT = """
WITH target AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey % 10 < 8
),
chg AS (
  SELECT c_custkey, upper(c_name) AS c_name,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) + 777 AS bal_cents,
         (c_custkey % 20 = 0) AS deleted
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT coalesce(c.c_custkey, t.c_custkey) AS c_custkey,
       CASE WHEN c.c_custkey IS NOT NULL THEN c.c_name ELSE t.c_name END AS c_name,
       CASE WHEN c.c_custkey IS NOT NULL THEN c.bal_cents ELSE t.bal_cents END AS bal_cents
FROM target t FULL JOIN chg c ON t.c_custkey = c.c_custkey
WHERE (t.c_custkey IS NOT NULL AND c.c_custkey IS NULL)
   OR (c.c_custkey IS NOT NULL AND NOT coalesce(c.deleted, FALSE))
"""

QUERIES["merge_upsert_scd1"] = q_merge_upsert
ORACLES["merge_upsert_scd1"] = SQL_MERGE_UPSERT


# --- hopping (sliding) window aggregation ------------------------------------

HOP_W_MS = 30 * 60 * 1000   # 30-minute windows ...
HOP_H_MS = 10 * 60 * 1000   # ... hopping every 10 minutes (3× overlap)


def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (hopping) time windows in batch — the batch rendering
    of Structured Streaming's ``window(ts, '30 minutes', '10 minutes')``:
    each event explodes to exactly W/H = 3 window memberships (bounded
    fan-out, no range join), then one uniform (type, window) count/sum.
    Per-event values go to integer micro-units BEFORE the sum, so
    accumulation order can't perturb a bit."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("_ems"),
        F.expr("CAST(round(value * 1000000, 0) AS BIGINT)").alias("_vmicro"),
    )
    win = ev.withColumn(
        "_m",
        F.explode(
            F.expr(
                f"sequence((_ems - {HOP_W_MS}) div {HOP_H_MS} + 1,"
                f" _ems div {HOP_H_MS})"
            )
        ),
    )
    return win.groupBy(
        "event_type", (F.col("_m") * F.lit(HOP_H_MS)).alias("window_start_ms")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_vmicro").alias("sum_value_micro"),
    )


SQL_HOPPING = f"""
WITH hop_ev AS (
  SELECT event_type,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ems,
         CAST(round(value * 1000000, 0) AS BIGINT) AS vmicro
  FROM events
),
hop_w AS (
  SELECT event_type, vmicro,
         unnest(generate_series((ems - {HOP_W_MS}) // {HOP_H_MS} + 1,
                                ems // {HOP_H_MS})) AS m
  FROM hop_ev
)
SELECT event_type, m * {HOP_H_MS} AS window_start_ms,
       count(*) AS n_events,
       CAST(sum(vmicro) AS BIGINT) AS sum_value_micro
FROM hop_w GROUP BY 1, 2
"""

# r9 retired: hopping expansion ⊂ hopping_hll_distinct (same hop explode, plus sketch fold)
RETIRED_QUERIES["hopping_window_agg"] = q_hopping_window
RETIRED_ORACLES["hopping_window_agg"] = SQL_HOPPING
